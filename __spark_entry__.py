"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: the CDC LWW dedup (the engine's core semantic)
               on sf0.001.
queries()    — every implemented operator from SURVEY.md §2 plus the
               training-data operators (dedup / ANN / text / multimodal)
               and the full-engine replay, from qwery_spark.suite.
oracle_sql() — DuckDB-equivalent SQL per query (None-sql entries are
               omitted => rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from qwery_spark.suite import REGISTRY

    return REGISTRY["cdc_lww_final_state"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from qwery_spark.suite import REGISTRY

    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from qwery_spark.suite import REGISTRY

    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}
