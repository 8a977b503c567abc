"""P2 LUT resolution — models reference tests/test_utils.py:37-47
(test_load_var_table + test_lookup): known aliases of every kind resolve
to the full row, unknown names raise."""

import pytest
from pyspark.sql import functions as F

from ecmwf_models_spark.functions import lut as LUT


def test_load_var_table_shape():
    rows = LUT.load_var_table()
    assert len(rows) == 20
    by_short = {r["short_name"]: r for r in rows}
    assert by_short["text_len"]["dl_name"] == "text_length"
    assert by_short["tool_call"]["long_name"] == "Tool call indicator"


def test_resolve_each_alias_kind(spark):
    out = LUT.resolve_names(
        spark, ["text_length", "Tool call indicator", "n_turns"]
    ).toPandas().set_index("requested")
    assert out.loc["text_length", "matched_kind"] == "dl_name"
    assert out.loc["text_length", "short_name"] == "text_len"
    assert out.loc["Tool call indicator", "matched_kind"] == "long_name"
    assert out.loc["Tool call indicator", "short_name"] == "tool_call"
    assert out.loc["n_turns", "matched_kind"] == "short_name"
    assert out.loc["n_turns", "dl_name"] == "turn_count"


def test_resolve_unknown_raises(spark):
    with pytest.raises(ValueError, match="no_such_var"):
        LUT.resolve_names(spark, ["text_length", "no_such_var"])


def test_resolve_col_is_broadcast(spark):
    """The alias join must broadcast — at scale the name column is
    billions of rows and the LUT is 60 aliases."""
    import contextlib
    import io

    req = spark.range(100).select(
        F.when(F.col("id") % 2 == 0, "text_len")
        .otherwise("tool_call")
        .alias("name")
    )
    plan_buf = io.StringIO()
    with contextlib.redirect_stdout(plan_buf):
        LUT.resolve_col(req, "name").explain("simple")
    assert "BroadcastHashJoin" in plan_buf.getvalue()


def test_lut_loads_from_pyfiles_zip(tmp_path):
    """Deploy contract: under `spark-submit --py-files pkg.zip` the
    package is zipimported — load_var_table must read var_lut.csv
    through importlib.resources, not a filesystem open(). Imports the
    package FROM the zip in a subprocess whose sys.path excludes the
    repo dir."""
    import os
    import subprocess
    import sys
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "ecmwf_models_spark")
    zpath = str(tmp_path / "pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _d, files in os.walk(pkg):
            for f in files:
                if f.endswith((".py", ".csv")):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "from ecmwf_models_spark.functions.lut import load_var_table; "
        "rows = load_var_table(); assert len(rows) > 5, rows; "
        "print('ZIP_LUT_OK', len(rows))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, zpath],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # away from the repo: no fallback to local fs
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ZIP_LUT_OK" in out.stdout
