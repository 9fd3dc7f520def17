"""chunk_tokens: window coverage, tail/overlap semantics, null/empty
inputs, and the no-shuffle plan guarantee."""

import pytest
from pyspark.sql import functions as F

from qwery_spark.operators.chunk import chunk_tokens


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_disjoint_chunks_cover_exactly(spark):
    df = _df(spark, [("a", list(range(10)))])
    out = chunk_tokens(df, max_len=4).orderBy("chunk_id").collect()
    assert [(r["chunk_id"], r["start_pos"], r["chunk"]) for r in out] == [
        (0, 0, [0, 1, 2, 3]),
        (1, 4, [4, 5, 6, 7]),
        (2, 8, [8, 9]),  # short tail kept by default
    ]
    assert [r["chunk_len"] for r in out] == [4, 4, 2]


def test_overlapping_stride(spark):
    out = (
        chunk_tokens(_df(spark, [("a", list(range(8)))]), max_len=4, stride=2)
        .orderBy("chunk_id")
        .collect()
    )
    # starts 0,2,4,6 — every token in >=1 chunk, overlap = max_len - stride
    assert [r["chunk"] for r in out] == [
        [0, 1, 2, 3], [2, 3, 4, 5], [4, 5, 6, 7], [6, 7],
    ]


def test_drop_short_and_degenerate_inputs(spark):
    df = _df(spark, [("a", list(range(5))), ("empty", []), ("null", None)])
    kept = chunk_tokens(df, max_len=4, drop_short=True).collect()
    assert [(r["doc_id"], r["chunk"]) for r in kept] == [("a", [0, 1, 2, 3])]
    # empty/null arrays emit nothing even without drop_short
    assert chunk_tokens(df, max_len=4).filter(
        F.col("doc_id") != "a"
    ).count() == 0


def test_passthrough_and_validation(spark):
    df = spark.createDataFrame(
        [("a", "web", [1, 2, 3])], "doc_id string, source string, tokens array<int>"
    )
    out = chunk_tokens(df, max_len=2).collect()
    assert all(r["source"] == "web" for r in out)
    with pytest.raises(ValueError):
        chunk_tokens(df, max_len=0)
    with pytest.raises(ValueError):
        chunk_tokens(df, max_len=4, stride=0)


def test_chunking_plan_has_no_shuffle(spark):
    df = _df(spark, [("a", list(range(100)))])
    plan = chunk_tokens(df, max_len=16, stride=8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
