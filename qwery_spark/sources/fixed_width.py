"""Fixed-width text read/write.

Reference: FixedWidthInputSource slices each line into `name^width`
fields (core:sources/FixedWidthInputSource.scala:14-31); the output
side pads/truncates each field to its width
(FixedWidthOutputSource.scala:16-32). Spark-first restatement: a
``text`` scan plus a substring projection (whole-stage codegen; the
line never leaves the JVM), and rpad(substring(...)) concat on write.

Field spec syntax kept from the reference's ideas.txt: "name^width".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_field_spec(spec: str) -> list[tuple[str, int]]:
    """'Symbol^10,Name^40' -> [('Symbol', 10), ('Name', 40)]"""
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, width = part.split("^")
        out.append((name.strip(), int(width)))
    return out


def read_fixed_width(
    spark: SparkSession, path: str, fields: list[tuple[str, int]] | str
) -> DataFrame:
    if isinstance(fields, str):
        fields = parse_field_spec(fields)
    lines = spark.read.text(path)
    cols, pos = [], 1  # substring is 1-based
    for name, width in fields:
        cols.append(F.trim(F.substring("value", pos, width)).alias(name))
        pos += width
    return lines.select(*cols)


def write_fixed_width(
    df: DataFrame, path: str, fields: list[tuple[str, int]] | str, mode: str = "overwrite"
) -> None:
    if isinstance(fields, str):
        fields = parse_field_spec(fields)
    parts = [
        F.rpad(F.substring(F.coalesce(F.col(name).cast("string"), F.lit("")), 1, width), width, " ")
        for name, width in fields
    ]
    df.select(F.concat(*parts).alias("value")).write.mode(mode).text(path)
