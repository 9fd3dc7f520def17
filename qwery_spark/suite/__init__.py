"""The engine's query suite: every operator surfaced as a named query
with (a) an idiomatic-PySpark implementation and (b) an equivalent
ANSI-SQL oracle string for DuckDB (driver correctness gate).

Registry entries mirror SURVEY.md §2's operator inventory; keys are
stable names consumed by __spark_entry__.queries()/oracle_sql().
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None => non-SQL-expressible, rows-only check
    doc: str = ""


REGISTRY: dict[str, Q] = {}


def register(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = Q(fn=fn, sql=sql, doc=doc)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# import for side effects: populates REGISTRY
from qwery_spark.suite import ann, cdc, core, engine, mm, text  # noqa: E402,F401
