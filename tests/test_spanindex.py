"""Persisted incremental span index (operators/spanindex.py):
maintenance vs from-scratch recompute, retraction to zero, replay
idempotency, and the day-2 scrub-against-index contract (batch-only
fingerprinting, intra-batch semantics as documented)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwery_spark.lake.merge import append_changes
from qwery_spark.lake.table import LakeTable
from qwery_spark.operators.spandedup import dup_spans, scrub_dup_spans
from qwery_spark.operators.spanindex import (
    build_span_index,
    duplicated_spans,
    scrub_against_index,
    update_span_index,
)

L = 4

SRC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
    ]
)


def _mk_src(spark, path):
    return LakeTable.create(
        path, SRC_SCHEMA, n_buckets=4, key_col="doc_id", write_mode="mor"
    )


def _apply(spark, src, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<int>, op string, ordinal long"
    )
    append_changes(spark, src, df)


def _recompute(spark, src):
    """From-scratch window counts over the live corpus."""
    return sorted(
        tuple(r)
        for r in dup_spans(src.read(spark), "doc_id", "tokens", L, 1)
        .select("span_hash", F.col("n_occ").alias("cnt"), "n_docs")
        .collect()
    )


def _view(spark, idx):
    return sorted(
        tuple(r)
        for r in idx.read(spark).select("span_hash", "cnt", "n_docs").collect()
    )


def test_span_index_matches_recompute_across_windows(spark, tmp_table_dir):
    src = _mk_src(spark, tmp_table_dir + "/src")
    shared = [9, 8, 7, 6]  # a boilerplate window carried by docs 1 and 2
    _apply(spark, src, [
        (1, shared + [1, 2, 3], "U", 1),
        (2, [5] + shared, "U", 2),
        (3, [10, 11, 12, 13, 14], "U", 3),
    ])
    idx = build_span_index(spark, src, tmp_table_dir + "/idx", "tokens", L)
    assert _view(spark, idx) == _recompute(spark, src)
    assert duplicated_spans(spark, idx).count() == 1  # just `shared`

    # window 2: doc 1 loses the boilerplate (update), doc 3 deleted,
    # doc 4 arrives carrying it
    v = src.current_version()
    _apply(spark, src, [
        (1, [1, 2, 3, 4, 5], "U", 10),
        (3, None, "D", 11),
        (4, shared + [20], "U", 12),
    ])
    st = update_span_index(spark, src, idx, "tokens", L, from_version=v)
    assert st.tokens_touched > 0
    assert _view(spark, idx) == _recompute(spark, src)
    # `shared` still duplicated (docs 2 and 4)
    assert duplicated_spans(spark, idx).count() == 1

    # window 3: retire doc 4 -> `shared` drops to one occurrence;
    # doc 3's windows (deleted last round) must be fully gone already
    v = src.current_version()
    _apply(spark, src, [(4, None, "D", 20)])
    update_span_index(spark, src, idx, "tokens", L, from_version=v)
    assert _view(spark, idx) == _recompute(spark, src)
    assert duplicated_spans(spark, idx).count() == 0


def test_span_index_replay_is_noop(spark, tmp_table_dir):
    src = _mk_src(spark, tmp_table_dir + "/src")
    _apply(spark, src, [(1, [1, 2, 3, 4, 5], "U", 1)])
    idx = build_span_index(spark, src, tmp_table_dir + "/idx", "tokens", L)
    v = src.current_version()
    _apply(spark, src, [(2, [1, 2, 3, 4], "U", 10)])
    update_span_index(spark, src, idx, "tokens", L, from_version=v)
    before = (_view(spark, idx), idx.current_version())
    update_span_index(spark, src, idx, "tokens", L, from_version=v)
    assert (_view(spark, idx), idx.current_version()) == before


def test_scrub_against_index_equals_batch_scrub_over_union(
    spark, tmp_table_dir
):
    """Scrubbing a new batch against the advanced index equals running
    the one-shot scrub over (corpus ∪ batch) restricted to the batch —
    the contract that lets day-2 ingest skip the corpus pass."""
    src = _mk_src(spark, tmp_table_dir + "/src")
    boiler = [9, 8, 7, 6]
    _apply(spark, src, [
        (1, boiler + [1, 2, 3], "U", 1),
        (2, [5] + boiler, "U", 2),
    ])
    idx = build_span_index(spark, src, tmp_table_dir + "/idx", "tokens", L)

    # batch: doc 3 carries the corpus boilerplate, doc 4 is clean
    v = src.current_version()
    batch_rows = [(3, boiler + [30, 31], "U", 10), (4, [40, 41, 42, 43, 44], "U", 11)]
    _apply(spark, src, batch_rows)
    update_span_index(spark, src, idx, "tokens", L, from_version=v)

    batch = spark.createDataFrame(
        [(d, t) for d, t, _, _ in batch_rows],
        "doc_id long, tokens array<int>",
    )
    got = {
        r["doc_id"]: (list(r["tokens_clean"]), r["n_dup_windows"])
        for r in scrub_against_index(
            spark, batch, idx, "doc_id", "tokens", L
        ).collect()
    }
    want = {
        r["doc_id"]: (list(r["tokens_clean"]), r["n_dup_windows"])
        for r in scrub_dup_spans(src.read(spark), "doc_id", "tokens", L)
        .join(batch.select("doc_id"), "doc_id", "left_semi")
        .collect()
    }
    assert got == want
    assert got[3][0] == [30, 31]       # boilerplate cut
    assert got[4][0] == [40, 41, 42, 43, 44]  # clean doc untouched
