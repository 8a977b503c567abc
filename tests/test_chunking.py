"""A4 request chunking — models reference era5/download.py split_chunk:
chunks never span a month, never exceed the request-size cap, cover the
period exactly, and the column form agrees with the planner."""

import datetime as dt

from pyspark.sql import functions as F

from ecmwf_models_spark.operators.chunking import (
    plan_request_chunks,
    with_chunk_id,
)


def test_chunks_cover_period_without_overlap():
    start, end = dt.date(2010, 1, 15), dt.date(2010, 4, 10)
    chunks = plan_request_chunks(
        start, end, n_vars=10, n_hsteps=4, max_req_size=1000
    )  # 25-day cap
    # seamless cover
    assert chunks[0][0] == start and chunks[-1][1] == end
    for (s0, e0), (s1, _e1) in zip(chunks, chunks[1:]):
        assert s1 == e0 + dt.timedelta(days=1)
    for s, e in chunks:
        assert (s.year, s.month) == (e.year, e.month)  # month-bounded
        assert (e - s).days + 1 <= 25  # request-size cap


def test_daily_chunks():
    chunks = plan_request_chunks(
        dt.date(2010, 2, 26), dt.date(2010, 3, 2), daily=True
    )
    assert len(chunks) == 5
    assert all(s == e for s, e in chunks)


def test_chunk_id_col_matches_planner(spark):
    days = [dt.datetime(2010, 1, 1) + dt.timedelta(days=i) for i in range(90)]
    df = spark.createDataFrame([(d,) for d in days], ["ts"])
    got = (
        with_chunk_id(df, "ts", n_vars=10, n_hsteps=4, max_req_size=1000)
        .groupBy("chunk_id")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
        .collect()
    )
    planned = plan_request_chunks(
        dt.date(2010, 1, 1), dt.date(2010, 3, 31),
        n_vars=10, n_hsteps=4, max_req_size=1000,
    )
    got_windows = sorted((r["s"].date(), r["e"].date()) for r in got)
    assert got_windows == sorted(planned)


def test_midmonth_start_aligns_to_day1_anchors():
    """A backfill starting mid-month must produce windows that coincide
    with chunk_id_col's day-1-anchored ids: Jan 15 with a 25-day cap ends
    its first window at Jan 25 (anchor window k=0 covers days 1-25), not
    Jan 31."""
    chunks = plan_request_chunks(
        dt.date(2010, 1, 15), dt.date(2010, 2, 10),
        n_vars=10, n_hsteps=4, max_req_size=1000,  # 25-day cap
    )
    assert chunks[0] == (dt.date(2010, 1, 15), dt.date(2010, 1, 25))
    assert chunks[1] == (dt.date(2010, 1, 26), dt.date(2010, 1, 31))
    assert chunks[-1][1] == dt.date(2010, 2, 10)


def test_chunk_id_col_matches_planner_midmonth_start(spark):
    days = [
        dt.datetime(2010, 1, 15) + dt.timedelta(days=i) for i in range(40)
    ]
    df = spark.createDataFrame([(d,) for d in days], ["ts"])
    got = (
        with_chunk_id(df, "ts", n_vars=10, n_hsteps=4, max_req_size=1000)
        .groupBy("chunk_id")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
        .collect()
    )
    planned = plan_request_chunks(
        dt.date(2010, 1, 15), dt.date(2010, 2, 23),
        n_vars=10, n_hsteps=4, max_req_size=1000,
    )
    got_windows = sorted((r["s"].date(), r["e"].date()) for r in got)
    assert got_windows == sorted(planned)
