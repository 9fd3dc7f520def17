"""Incrementally maintained token-frequency (vocabulary) view over a
CDC lake table whose payload is a token array — the live-corpus answer
to "what does the vocabulary look like NOW" (tokenizer health, vocab
drift, frequency-based filtering) without ever rescanning the corpus.

View table (a lake table keyed by token):

  token   bigint   the token id
  cnt     bigint   total occurrences across the live corpus
  n_docs  bigint   number of live documents containing the token

Maintenance works on the feed's preimage/postimage contract
(read_changes(include_preimages=True), Delta-CDF shape) — the same
counting-algorithm IVM as operators/materialize.py, lifted through an
array explode:

  insert            -> +1 cnt per occurrence, +1 n_docs per DISTINCT token
  update_preimage   -> the OLD array's occurrences subtracted
  update_postimage  -> the NEW array's occurrences added
  delete            -> the preimage array subtracted

A token whose cnt reaches 0 is deleted from the view. Each window
commits with ordinal = its end version and epoch key ``vocab:{v}`` so
replays are commit-level no-ops, and windows must be applied in order
(follow_changes' delivery contract) — identical to the agg/SCD2/
sigindex/annindex maintainers, so a follower can share ONE window diff
across all of them.

100-TB shape: the window's arrays explode map-side and PARTIAL-
AGGREGATE before the single token-keyed shuffle, so the shuffle volume
is (distinct tokens in the window), bounded by vocab size — never the
occurrence count, never the corpus. The merge joins those per-token
deltas against the view, and the view itself is int-keyed, so its
bucket files carry tight token ranges (manifest col stats) for probe
reads. A Zipf-hot token (``the``) is exactly one row after the partial
agg — skew-proof by construction, the same argument as the LWW dedup.

Reference anchor: beyond the reference (no array payloads there); the
token-frequency table is what tok_histogram / tok_vocab_stats compute
from scratch, kept incrementally current.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwery_spark.lake.changes import read_changes
from qwery_spark.lake.table import LakeTable


@dataclass
class VocabUpdateStats:
    change_rows: int = 0
    tokens_touched: int = 0
    from_version: int = 0
    to_version: int = 0
    snapshot_version: int | None = None


_VOCAB_SCHEMA = T.StructType(
    [
        T.StructField("token", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("n_docs", T.LongType()),
    ]
)


def _occurrence_units(rows: DataFrame, tokens_col: str, sign) -> DataFrame:
    """(token, d_cnt, d_docs) unit rows for one side of the feed:
    every occurrence counts toward cnt, every distinct token toward
    n_docs. explode (not explode_outer) drops NULL arrays — a delete
    whose preimage payload is null contributes nothing, correctly."""
    c = F.col(f"`{tokens_col}`")
    occ = rows.select(
        F.explode(c).alias("token"), sign.alias("d_cnt"), F.lit(0).alias("d_docs")
    )
    docs = rows.select(
        F.explode(F.array_distinct(c)).alias("token"),
        F.lit(0).alias("d_cnt"),
        sign.alias("d_docs"),
    )
    return occ.unionAll(docs)


def vocab_deltas(feed: DataFrame, tokens_col: str) -> DataFrame:
    """Fold one preimage/postimage window into per-token deltas — the
    explode amplifies rows map-side but the groupBy(token) partial agg
    collapses them BEFORE the one window-sized shuffle (plan-gated)."""
    add = F.col("_change_type").isin("insert", "update_postimage")
    sign = F.when(add, F.lit(1)).otherwise(F.lit(-1))
    return (
        _occurrence_units(feed, tokens_col, sign)
        .groupBy("token")
        .agg(
            F.sum("d_cnt").cast("long").alias("d_cnt"),
            F.sum("d_docs").cast("long").alias("d_docs"),
        )
        .select(F.col("token").cast("long").alias("token"), "d_cnt", "d_docs")
    )


def build_vocab(
    spark: SparkSession,
    src: LakeTable,
    vocab_path: str,
    tokens_col: str,
    n_buckets: int = 8,
    at_version: int | None = None,
) -> LakeTable:
    """Full build from the source's live state (pinned to
    ``at_version`` for followers building at their resume point), with
    ordinal = the reflected source version so incremental windows
    continue the same LWW order. Idempotent: the build merge is epoch-
    keyed, so re-building an existing view no-ops."""
    from qwery_spark.lake.merge import merge_changes
    from qwery_spark.operators.materialize import _reuse_or_create

    version = src.current_version() if at_version is None else at_version
    vocab = _reuse_or_create(
        vocab_path, _VOCAB_SCHEMA, n_buckets, "token", "cow",
        stats_cols=["token"],
    )
    base = src.read(spark, snapshot_version=version)
    rows = (
        _occurrence_units(base, tokens_col, F.lit(1))
        .groupBy("token")
        .agg(
            F.sum("d_cnt").cast("long").alias("cnt"),
            F.sum("d_docs").cast("long").alias("n_docs"),
        )
        .select(
            F.col("token").cast("long").alias("token"),
            "cnt",
            "n_docs",
            F.lit("U").alias("op"),
            F.lit(version).cast("bigint").alias("ordinal"),
        )
    )
    merge_changes(spark, vocab, rows, epoch_id=f"vocab:{version}")
    return vocab


def update_vocab(
    spark: SparkSession,
    src: LakeTable,
    vocab: LakeTable,
    tokens_col: str,
    from_version: int,
    to_version: int | None = None,
    feed: DataFrame | None = None,
) -> VocabUpdateStats:
    """One change-feed window becomes one vocabulary commit: fold the
    window into per-token deltas, add them to the current counts, and
    merge — updated tokens as upserts, zeroed tokens as deletes. Pass
    ``feed`` (a preimage-bearing changelog for the same range) to share
    one endpoint diff with the other view maintainers."""
    from qwery_spark.lake.merge import merge_changes

    to_version = src.current_version() if to_version is None else to_version
    stats = VocabUpdateStats(from_version=from_version, to_version=to_version)
    if to_version <= from_version:
        return stats
    # the view references the tokens column by name; renames/drops
    # cannot be replayed onto it (its content IS that column) — fail
    # with the rebuild contract, same as update_agg
    src_cols = {f["name"] for f in src.snapshot(to_version).fields()}
    if tokens_col not in src_cols:
        raise ValueError(
            f"update_vocab: source {src.path!r} no longer has column "
            f"{tokens_col!r} at v{to_version} (renamed or dropped "
            "mid-stream) — rebuild the vocabulary against the new column "
            "name (build_vocab at the current version) and resume there"
        )
    if feed is None:
        feed = read_changes(
            spark, src, from_version, to_version, granular=False,
            include_preimages=True,
        )
    deltas = vocab_deltas(feed, tokens_col).persist()
    try:
        stats.tokens_touched = deltas.count()
        if stats.tokens_touched == 0:
            return stats
        cur = vocab.read(spark)
        merged = deltas.alias("d").join(cur.alias("c"), "token", "left")
        cnt = (F.coalesce(F.col("c.cnt"), F.lit(0)) + F.col("d.d_cnt")).cast(
            "long"
        )
        nd = (
            F.coalesce(F.col("c.n_docs"), F.lit(0)) + F.col("d.d_docs")
        ).cast("long")
        live = cnt > 0
        batch = merged.select(
            F.col("token"),
            F.when(live, cnt).alias("cnt"),
            F.when(live, nd).alias("n_docs"),
            F.when(live, F.lit("U")).otherwise("D").alias("op"),
            F.lit(to_version).cast("bigint").alias("ordinal"),
        )
        r = merge_changes(spark, vocab, batch, epoch_id=f"vocab:{to_version}")
        stats.snapshot_version = r.snapshot_version
        return stats
    finally:
        deltas.unpersist()
