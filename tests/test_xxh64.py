"""Pin the pure-Python XXH64 to Spark's own xxhash64: any divergence
would silently route point lookups to the wrong bucket, so this test IS
the safety argument for lake/xxh64.py."""

import random
import string

from pyspark.sql import functions as F

from qwery_spark.lake.xxh64 import spark_bucket, spark_xxhash64


def _spark_hashes(spark, values, coltype):
    df = spark.createDataFrame([(v,) for v in values], f"v {coltype}")
    return [r[0] for r in df.select(F.xxhash64("v")).collect()]


def test_strings_match_spark_all_lengths(spark):
    rng = random.Random(7)
    vals = [""]
    # every length 1..100: covers tail-only (<32B) and 4-lane stripe
    # paths, plus multi-byte UTF-8
    for n in range(1, 101):
        vals.append("".join(rng.choice(string.printable) for _ in range(n)))
    vals += ["doc-000000000042", "émoji-🚀-ünïcode", "a" * 1000]
    expected = _spark_hashes(spark, vals, "string")
    assert [spark_xxhash64(v) for v in vals] == expected


def test_integrals_match_spark(spark):
    vals = [0, 1, -1, 42, -42, 2**31 - 1, -(2**31), 2**63 - 1, -(2**63), 997]
    expected = _spark_hashes(spark, vals, "long")
    assert [spark_xxhash64(v, "bigint") for v in vals] == expected
    # int/smallint/tinyint columns hash via the 4-byte path, NOT widened
    small = [v for v in vals if -(2**31) <= v < 2**31]
    assert [spark_xxhash64(v, "int") for v in small] == _spark_hashes(
        spark, small, "int"
    )
    tiny = [0, 1, -1, 42]
    assert [spark_xxhash64(v, "smallint") for v in tiny] == _spark_hashes(
        spark, tiny, "smallint"
    )


def test_bucket_matches_engine_expr(spark):
    vals = [f"doc-{i:012d}" for i in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    expected = [
        r[0]
        for r in df.select(
            F.pmod(F.xxhash64("v"), F.lit(16)).cast("int")
        ).collect()
    ]
    assert [spark_bucket(v, 16) for v in vals] == expected


def test_unsupported_types_decline():
    assert spark_xxhash64(3.14, "double") is None
    assert spark_bucket(3.14, 16, "double") is None
    assert spark_xxhash64(True, "boolean") is None
