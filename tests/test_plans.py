"""Physical-plan regression tests — the scale story, asserted.

Correctness tests prove the operators work on small data; these prove the
PLANS are the ones that survive 100x scale-up: the transpose is a single
exchange, dedup rides the range partitioning without a second shuffle,
point reads prune to one cell partition with pushed filters, dimension
joins broadcast, and scans prune columns. A regression here is a silent
10-100x slowdown at cluster scale even though every value stays correct.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from ecmwf_models_spark.operators.reshuffle import reshuffle, write_silver
from ecmwf_models_spark.operators.rollup import (
    rollup_cascade,
    rollup_from_raw,
)
from ecmwf_models_spark.plans import entry_queries as EQ


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_reshuffle_is_single_shuffle(bronze):
    """Dedup (groupBy cell,conv,turn) must reuse the range partitioning:
    exactly ONE Exchange in the whole transpose plan."""
    plan = plan_of(reshuffle(bronze), "simple")
    assert plan.count("Exchange") == 1, plan


def test_rollup_cascade_one_exchange_per_tier(bronze):
    """hourly-from-raw + daily + monthly = exactly 3 aggregation shuffles,
    each with map-side partial aggregation (partial_ functions present)."""
    silver = reshuffle(bronze)
    hourly = rollup_from_raw(silver, "hourly")
    daily = rollup_cascade(hourly, "daily")
    monthly = rollup_cascade(daily, "monthly")
    plan = plan_of(monthly, "simple")
    # 1 reshuffle exchange + 3 rollup exchanges
    assert plan.count("Exchange") == 4, plan
    assert "partial_sum" in plan, plan  # map-side combine confirmed


def test_point_read_prunes_partition_and_pushes_filter(bronze, tmp_path):
    """The ERATs.read analogue: cell_id filter must land in PartitionFilters
    (directory pruning — the gpi2cell file routing) and the conv_id filter
    in PushedFilters (row-group pruning)."""
    path = str(tmp_path / "silver")
    write_silver(reshuffle(bronze, n_cells=8), path)
    spark = bronze.sparkSession
    df = spark.read.parquet(path).where(
        (F.col("cell_id") == 3) & (F.col("conv_id") == "conv-000001")
    )
    plan = plan_of(df)
    assert "PartitionFilters: [" in plan and "cell_id" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0], plan
    assert "conv_id" in plan.split("PushedFilters:")[1].split("]")[0], plan


def test_dimension_joins_broadcast(spark, sf_dir):
    """revenue_by_nation: both dim joins must be broadcast, never
    sort-merge (a sort-merge here would shuffle the fact table twice)."""
    plan = plan_of(EQ.q_revenue_by_nation(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_semijoin_broadcast(spark, sf_dir):
    plan = plan_of(EQ.q_semijoin_active(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_scan_prunes_columns(spark, sf_dir):
    """tpch_q1 must not read l_comment/l_shipinstruct — ReadSchema is the
    projection, proving column pruning reached the parquet scan."""
    plan = plan_of(EQ.q_tpch_q1(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema, read_schema
    assert "l_quantity" in read_schema, read_schema


def test_tpch_q1_pushes_date_filter(spark, sf_dir):
    plan = plan_of(EQ.q_tpch_q1(spark, sf_dir))
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "l_shipdate" in pushed, plan


def test_pack_rides_reshuffle_partitioning(bronze):
    """codec.pack_cells groups by (cell_id, conv_id) — exactly the
    reshuffle's range keys, so FlatMapGroupsInPandas must insert NO new
    exchange (and no new sort: silver is already (cell, conv, ...)
    sorted). One shuffle for transpose + pack combined."""
    from ecmwf_models_spark import codec

    packed = codec.pack_cells(reshuffle(bronze))
    plan = plan_of(packed, "simple")
    assert plan.count("Exchange") == 1, plan


def test_bronze_sink_prunes_date_partitions(bronze, tmp_path):
    """S5 stack-splitting sink: bronze is date-partitioned (the YYYY/DOY
    image tree of reference extract.py:110-226), so a ts-range scan must
    prune day directories via PartitionFilters on ds."""
    path = str(tmp_path / "bronze_ds")
    spark = bronze.sparkSession
    bronze.withColumn("ds", F.to_date("ts")).write.mode(
        "overwrite"
    ).partitionBy("ds").parquet(path)
    df = spark.read.parquet(path).where(F.col("ds") == "2010-01-02")
    plan = plan_of(df)
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "ds" in pf, plan


def test_gapfill_reuses_conv_shuffle(bronze):
    """gap_fill: per-bucket agg, span agg, and the left join all key on
    conv_id... — the span branch must reuse the per-bucket aggregate's
    exchange rather than rescanning (ReusedExchange or <=3 exchanges
    total beyond the reshuffle one)."""
    from ecmwf_models_spark.operators.gapfill import gap_fill

    silver = reshuffle(bronze)
    plan = plan_of(gap_fill(silver), "simple")
    # reshuffle(1) + per_bucket agg(1) + spans agg(1) + join alignment(<=2)
    assert plan.count("Exchange") <= 5, plan


def test_ivf_assignment_is_shuffle_free(spark, sf_dir):
    """IVF cell assignment is a pure map over centroid literals (the
    with_lsh_bucket shape): ZERO exchanges — at 100 TB the assignment
    costs one scan, no join, no aggregation."""
    from ecmwf_models_spark.functions.similarity import (
        ivf_seed_centroids,
        with_ivf_cell,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    cents = ivf_seed_centroids(emb, 8)
    plan = plan_of(with_ivf_cell(emb, cents), "simple")
    assert "Exchange" not in plan, plan


def test_rollup_tiers_single_exchange(bronze):
    """Production cascade (rollup_tiers): ONE exchange total for all three
    tiers. HashPartitioning(conv_id) from the single narrow repartition
    satisfies ClusteredDistribution(conv_id, date_trunc(...)) at every
    tier, so hourly->daily->monthly aggregate pipelined in one stage —
    the 100 TB shape (one raw-row shuffle instead of three wide-state
    ones). Also asserts the whole cascade stays on codegen'd
    HashAggregate (no ObjectHashAggregate / SortAggregate fallback)."""
    from ecmwf_models_spark.operators.rollup import rollup_tiers

    silver = reshuffle(bronze).localCheckpoint()  # isolate cascade plan
    monthly = rollup_tiers(silver)["monthly"]
    plan = plan_of(monthly, "simple")
    assert plan.count("Exchange") == 1, plan
    assert plan.count("HashAggregate") == 6, plan  # partial+final x 3
    assert "ObjectHashAggregate" not in plan, plan
    assert "SortAggregate" not in plan, plan
