"""Property-based soundness of the counts-view maintainers
(operators/vocab.py, operators/spanindex.py): for RANDOM op sequences —
inserts, array-changing updates, deletes, repeated tokens, empty and
short arrays — the incrementally maintained vocabulary AND span index
must equal a from-scratch recompute of the live corpus after EVERY
window.

hypothesis drives the generator (derandomized for driver stability;
deadline off — Spark latency is not the property)."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwery_spark.lake.merge import append_changes
from qwery_spark.lake.table import LakeTable
from qwery_spark.operators.spandedup import dup_spans
from qwery_spark.operators.spanindex import build_span_index, update_span_index
from qwery_spark.operators.vocab import build_vocab, update_vocab

L = 3

SRC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
    ]
)


@st.composite
def op_windows(draw):
    """2-4 maintenance windows of random upserts/deletes over a 10-key
    space; token values drawn from a SMALL alphabet so window-hash and
    token collisions (the interesting retraction paths) actually
    happen. Arrays of length 0-6 cover the shorter-than-L edge."""
    n_windows = draw(st.integers(min_value=2, max_value=4))
    rng = np.random.default_rng(
        draw(st.integers(min_value=0, max_value=2**31 - 1))
    )
    windows = []
    live: set[int] = set()
    ordinal = 0
    for _ in range(n_windows):
        rows = []
        for _ in range(int(rng.integers(1, 7))):
            key = int(rng.integers(0, 10))
            if live and rng.random() < 0.25:
                key = int(rng.choice(sorted(live)))
                rows.append(("D", key, None, ordinal))
                live.discard(key)
            else:
                toks = [int(t) for t in rng.integers(0, 5, rng.integers(0, 7))]
                rows.append(("U", key, toks, ordinal))
                live.add(key)
            ordinal += 1
        windows.append(rows)
    return windows


def _recompute_vocab(spark, src):
    return sorted(
        tuple(r)
        for r in src.read(spark)
        .select(F.explode("tokens").alias("token"), "doc_id")
        .groupBy(F.col("token").cast("long").alias("token"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .collect()
    )


def _recompute_spans(spark, src):
    return sorted(
        tuple(r)
        for r in dup_spans(src.read(spark), "doc_id", "tokens", L, 1)
        .select("span_hash", F.col("n_occ").alias("cnt"), "n_docs")
        .collect()
    )


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(windows=op_windows())
def test_counts_views_equal_recompute_after_every_window(
    spark, tmp_path_factory, windows
):
    d = str(tmp_path_factory.mktemp("counts_prop"))
    src = LakeTable.create(
        d + "/src", SRC_SCHEMA, n_buckets=2, key_col="doc_id",
        write_mode="mor",
    )
    first, rest = windows[0], windows[1:]

    def _apply(rows):
        df = spark.createDataFrame(
            [(k, t, op, o) for op, k, t, o in rows],
            "doc_id long, tokens array<int>, op string, ordinal long",
        )
        append_changes(spark, src, df)

    _apply(first)
    vocab = build_vocab(spark, src, d + "/vocab", "tokens", n_buckets=2)
    sidx = build_span_index(
        spark, src, d + "/sidx", "tokens", L, n_buckets=2
    )
    for rows in rest:
        v = src.current_version()
        _apply(rows)
        update_vocab(spark, src, vocab, "tokens", from_version=v)
        update_span_index(spark, src, sidx, "tokens", L, from_version=v)
        got_v = sorted(
            tuple(r)
            for r in vocab.read(spark)
            .select("token", "cnt", "n_docs").collect()
        )
        assert got_v == _recompute_vocab(spark, src)
        got_s = sorted(
            tuple(r)
            for r in sidx.read(spark)
            .select("span_hash", "cnt", "n_docs").collect()
        )
        assert got_s == _recompute_spans(spark, src)


@settings(
    max_examples=4,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(windows=op_windows())
def test_additive_span_index_survives_compaction_fold(
    spark, tmp_path_factory, windows
):
    """The additive-MOR span index folds its delta files on compaction
    (SUM resolution materialized). Compacting after EVERY window — the
    worst-case cadence — must leave counts identical to the recompute,
    and later windows must stack correctly on the folded files."""
    from qwery_spark.lake.merge import compact

    d = str(tmp_path_factory.mktemp("counts_fold"))
    src = LakeTable.create(
        d + "/src", SRC_SCHEMA, n_buckets=2, key_col="doc_id",
        write_mode="mor",
    )

    def _apply(rows):
        df = spark.createDataFrame(
            [(k, t, op, o) for op, k, t, o in rows],
            "doc_id long, tokens array<int>, op string, ordinal long",
        )
        append_changes(spark, src, df)

    _apply(windows[0])
    sidx = build_span_index(spark, src, d + "/sidx", "tokens", L, n_buckets=2)
    for rows in windows[1:]:
        v = src.current_version()
        _apply(rows)
        update_span_index(spark, src, sidx, "tokens", L, from_version=v)
        compact(spark, sidx)  # fold deltas -> materialized sums
        got = sorted(
            tuple(r)
            for r in sidx.read(spark)
            .select("span_hash", "cnt", "n_docs").collect()
        )
        assert got == _recompute_spans(spark, src)
