"""Incremental vocabulary view (operators/vocab.py): multi-window
maintenance vs from-scratch recompute (array-changing updates, deletes,
within-array repeats), replay idempotency, zero-count removal, the
rename rebuild contract, and the plan gate (one partial-aggregated
token shuffle per window)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwery_spark.lake.merge import append_changes
from qwery_spark.lake.table import LakeTable
from qwery_spark.operators.vocab import build_vocab, update_vocab, vocab_deltas

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
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>, op string, ordinal long")
    append_changes(spark, src, df)


def _recompute(spark, src):
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


def _view(spark, vocab):
    return sorted(
        tuple(r)
        for r in vocab.read(spark).select("token", "cnt", "n_docs").collect()
    )


def test_vocab_matches_recompute_across_windows(spark, tmp_table_dir):
    src = _mk_src(spark, tmp_table_dir + "/src")
    # repeats inside one array (token 5 twice in doc 1) exercise
    # cnt > n_docs from the start
    _apply(spark, src, [
        (1, [5, 5, 7], "U", 1),
        (2, [7, 9], "U", 2),
        (3, [11], "U", 3),
    ])
    vocab = build_vocab(spark, src, tmp_table_dir + "/vocab", "tokens")
    assert _view(spark, vocab) == _recompute(spark, src)

    # window 2: array-changing update (doc 1 loses a 5, gains a 13),
    # delete (doc 3 retires token 11 entirely), new doc
    v = src.current_version()
    _apply(spark, src, [
        (1, [5, 7, 13], "U", 10),
        (3, None, "D", 11),
        (4, [5, 9, 9], "U", 12),
    ])
    st = update_vocab(spark, src, vocab, "tokens", from_version=v)
    assert st.tokens_touched > 0
    assert _view(spark, vocab) == _recompute(spark, src)
    # token 11's count hit zero -> its row left the view
    assert vocab.read(spark).filter("token = 11").count() == 0

    # window 3: delete everything that carries token 5
    v = src.current_version()
    _apply(spark, src, [
        (1, None, "D", 20),
        (4, None, "D", 21),
    ])
    update_vocab(spark, src, vocab, "tokens", from_version=v)
    assert _view(spark, vocab) == _recompute(spark, src)
    assert vocab.read(spark).filter("token = 5").count() == 0


def test_vocab_window_replay_is_noop(spark, tmp_table_dir):
    src = _mk_src(spark, tmp_table_dir + "/src")
    _apply(spark, src, [(1, [1, 2], "U", 1), (2, [2, 3], "U", 2)])
    vocab = build_vocab(spark, src, tmp_table_dir + "/vocab", "tokens")
    v = src.current_version()
    _apply(spark, src, [(1, [1, 4], "U", 10)])
    update_vocab(spark, src, vocab, "tokens", from_version=v)
    before = (_view(spark, vocab), vocab.current_version())
    # same window again (crash-and-restart): the epoch key no-ops it
    update_vocab(spark, src, vocab, "tokens", from_version=v)
    assert (_view(spark, vocab), vocab.current_version()) == before


def test_vocab_empty_window_is_noop(spark, tmp_table_dir):
    src = _mk_src(spark, tmp_table_dir + "/src")
    _apply(spark, src, [(1, [1], "U", 1)])
    vocab = build_vocab(spark, src, tmp_table_dir + "/vocab", "tokens")
    v = src.current_version()
    st = update_vocab(spark, src, vocab, "tokens", from_version=v)
    assert st.tokens_touched == 0
    assert vocab.current_version() == 1


def test_vocab_rename_fails_with_rebuild_contract(spark, tmp_table_dir):
    import pytest

    src = _mk_src(spark, tmp_table_dir + "/src")
    _apply(spark, src, [(1, [1, 2], "U", 1)])
    vocab = build_vocab(spark, src, tmp_table_dir + "/vocab", "tokens")
    v = src.current_version()
    src.rename_column("tokens", "toks")
    _apply(spark, src, [(2, [3], "U", 10)])
    with pytest.raises(ValueError, match="rebuild the vocabulary"):
        update_vocab(spark, src, vocab, "tokens", from_version=v)


def test_vocab_deltas_single_partial_agg_shuffle(spark):
    feed = spark.createDataFrame(
        [(1, [1, 2, 2], "insert"), (2, [2, 3], "update_preimage"),
         (2, [2, 4], "update_postimage")],
        "doc_id long, tokens array<int>, _change_type string",
    )
    p = (
        vocab_deltas(feed, "tokens")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" in p
    assert p.count("Exchange") == 1, p


def test_vocab_null_token_elements_are_not_units(spark, tmp_table_dir):
    """NULL elements inside an array are dropped (a null unit is not a
    unit and the view's lake key cannot be null) — same rule as the agg
    maintainer's null groups."""
    src = _mk_src(spark, tmp_table_dir + "/src")
    _apply(spark, src, [(1, [1, None, 2], "U", 1), (2, [None, None], "U", 2)])
    vocab = build_vocab(spark, src, tmp_table_dir + "/vocab", "tokens")
    assert _view(spark, vocab) == [(1, 1, 1), (2, 1, 1)]
    v = src.current_version()
    _apply(spark, src, [(1, [2, None], "U", 10)])
    update_vocab(spark, src, vocab, "tokens", from_version=v)
    assert _view(spark, vocab) == [(2, 1, 1)]
