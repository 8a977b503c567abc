"""Request chunking (A4): bound the unit of ingest/backfill work.

The reference splits a download period into chunks that the CDS API can
handle: a chunk never spans a month (or a day with daily_request=True)
and holds at most max_req_size = len(chunk) * n_vars * n_hsteps items
(reference era5/download.py:34-100 `split_chunk`, utils.py:259-278
`split_array`). The graft keeps both forms:

  * plan_request_chunks — driver-side planner returning bounded
    (start, end) windows; the unit of a backfill job. Bounded metadata
    (a list of date pairs), exactly like the reference's request list.
  * with_chunk_id — the ENGINE-NATIVE form: a pure-column chunk id so a
    billion-row backfill can be grouped/partitioned by chunk in one scan
    (`repartition(chunk_id)` -> per-chunk writes with per-chunk lineage).
    No collect, no driver loop over data.

At 100 TB a backfill runs chunk-by-chunk (order-preserving, resumable via
the lineage table, each chunk's shuffle bounded by max_req_size), which is
the reference's retry/resume contract at cluster scale.
"""

from __future__ import annotations

import calendar
import datetime as dt

from pyspark.sql import Column, DataFrame, functions as F


def _max_days(n_vars: int, n_hsteps: int, max_req_size: int) -> int:
    """Days per chunk so that days * n_vars * n_hsteps <= max_req_size
    (the reference's request-size rule)."""
    return max(1, max_req_size // max(1, n_vars * n_hsteps))


def plan_request_chunks(
    start: dt.date,
    end: dt.date,
    n_vars: int = 1,
    n_hsteps: int = 4,
    max_req_size: int = 1000,
    daily: bool = False,
) -> list[tuple[dt.date, dt.date]]:
    """Inclusive (start, end) windows: never spanning a month boundary,
    each at most max_days long (one day each with daily=True). Sub-month
    windows are anchored at day 1 of the month — window k of a month
    covers days [k*step+1, (k+1)*step] — so a backfill starting mid-month
    produces windows that coincide exactly with chunk_id_col's ids (the
    first window is the truncated tail of its anchor window). This keeps
    the planner and the engine-native column bijective for ANY start."""
    step = 1 if daily else _max_days(n_vars, n_hsteps, max_req_size)
    chunks: list[tuple[dt.date, dt.date]] = []
    cur = start
    while cur <= end:
        month_end = dt.date(
            cur.year, cur.month, calendar.monthrange(cur.year, cur.month)[1]
        )
        # end of the day-1-anchored window containing `cur`
        k = (cur.day - 1) // step
        anchor_end = dt.date(cur.year, cur.month, 1) + dt.timedelta(
            days=(k + 1) * step - 1
        )
        chunk_end = min(anchor_end, month_end, end)
        chunks.append((cur, chunk_end))
        cur = chunk_end + dt.timedelta(days=1)
    return chunks


def chunk_id_col(
    ts: Column,
    n_vars: int = 1,
    n_hsteps: int = 4,
    max_req_size: int = 1000,
    daily: bool = False,
) -> Column:
    """Column form of the same rule: 'yyyy-MM/k' where k is the
    fixed-width sub-month sequence (floor((day-1)/max_days)); with
    daily=True the id is simply the date. Rows with equal chunk_id form
    exactly one plan_request_chunks window."""
    if daily:
        return F.date_format(ts, "yyyy-MM-dd")
    step = _max_days(n_vars, n_hsteps, max_req_size)
    seq = F.floor((F.dayofmonth(ts) - 1) / step).cast("int")
    return F.concat_ws("/", F.date_format(ts, "yyyy-MM"), seq.cast("string"))


def with_chunk_id(
    df: DataFrame,
    ts_col: str = "ts",
    n_vars: int = 1,
    n_hsteps: int = 4,
    max_req_size: int = 1000,
    daily: bool = False,
    out: str = "chunk_id",
) -> DataFrame:
    return df.withColumn(
        out,
        chunk_id_col(F.col(ts_col), n_vars, n_hsteps, max_req_size, daily),
    )
