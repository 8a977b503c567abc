"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship pipeline on sf0.001: bronze(events-as-transcripts)
                -> dedup -> hourly rollup -> exact daily cascade.
queries()     — one entry per implemented operator family (SURVEY.md §2 +
                training-data ops); ORACLES carries the DuckDB SQL twins.
oracle_sql()  — ANSI SQL equivalents (DuckDB) for the value-hash gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecmwf_models_spark.plans import entry_queries as EQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the rollup cascade
    (hourly state -> exact daily re-aggregation), the engine's metric
    query (BASELINE.json: rolled-up turns/sec at retention tiers)."""
    return EQ.q_rollup_daily_from_hourly(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLES)
