"""Persisted incremental exact-span (substring) index — the durable,
feed-maintained form of operators/spandedup.py.

The one-shot span dedup re-fingerprints the whole corpus per run; at
10^10 documents that corpus-wide pass cannot run daily. This index
keeps the corpus-wide window inventory CURRENT instead: a lake table
keyed by span_hash

  span_hash  string  md5 of the comma-joined L-token window
  cnt        bigint  live occurrences of that window corpus-wide
  n_docs     bigint  live documents containing it

maintained from the preimage/postimage change feed through the same
counting-algorithm core as the vocabulary view (operators/vocab.py):
a changed document subtracts its OLD windows and adds its NEW ones, a
delete subtracts its preimage's windows, and a window whose count hits
0 leaves the index. Windows are epoch-keyed (``spanidx:{v}``) so
replays no-op, and the maintainer shares the follower's one diff per
window with the other five views.

What the index buys at 100 TB:

  - ``duplicated_spans(index)`` — the live boilerplate inventory
    (cnt >= 2) with zero corpus IO: a filter over the index.
  - ``scrub_against_index(batch, index)`` — scrub a NEW batch against
    the full historical corpus: fingerprint only the batch (map-only),
    semi-join its windows against the index's duplicated spans
    (bucket-shaped on span_hash), cut covered positions. The batch
    never touches the corpus; the join's right side is the index, and
    only its cnt>=2 slice. This is the day-2 shape: incoming documents
    are cleaned against every span the corpus has ever repeated,
    at O(batch) cost.

Per-window maintenance cost: the window's documents explode to their
windows map-side and PARTIAL-AGGREGATE before one span_hash shuffle —
O(window token volume) — and the deltas then APPEND BLINDLY as
(span_hash, +d_cnt, +d_docs) rows with NO read of the current index:
this is the additive-MOR aggregating-payload layout (Hudi's
aggregating-payload design). Resolution is SUM per span_hash at read
time (a zeroed span resolves dead), and compaction folds delta files
into materialized sums on the usual policy cadence. Round 6 measured
the earlier read-merge variant's per-window index scan at 13.9 s/batch
vs 9.05 s for the no-index full rescrub at the 10x bench scale — the
index's key cardinality grows with the CORPUS, so any per-window read
of it is corpus-coupled; the additive layout makes the update a true
O(window) append (tools/spanindex_bench.py measures the flatness).
The read-side API (duplicated_spans / scrub semi-join) is unchanged;
tests/test_counts_property.py pins additive-fold == read-merge over
random op sequences.

Reference anchor: beyond the reference; pairs with sigindex.py (near-
dup MinHash index) as the exact-substring member of the persisted
dedup-index family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwery_spark.lake.table import LakeTable
from qwery_spark.operators.spandedup import _window_hash_array
from qwery_spark.operators.vocab import (
    VocabUpdateStats,
    build_unit_counts,
    update_unit_counts,
)


def build_span_index(
    spark: SparkSession,
    src: LakeTable,
    path: str,
    tokens_col: str,
    length: int,
    n_buckets: int = 8,
    at_version: int | None = None,
) -> LakeTable:
    """Full build from the source's live state; see build_unit_counts
    for the pinning/idempotency contract. The index is ADDITIVE-MOR
    (aggregating payload): it is sized like the corpus's window
    inventory, so a maintenance window must neither rewrite O(index)
    files (COW) nor read the O(index) current counts (read-merge) —
    deltas append blindly and SUM-resolve at read time. Compact it on
    the usual policy cadence (run_follow --auto-compact-views covers
    it); compaction folds deltas into materialized sums."""
    return build_unit_counts(
        spark, src, path, _window_hash_array(tokens_col, length),
        "span_hash", T.StringType(), "string", "spanidx",
        n_buckets=n_buckets, at_version=at_version, additive=True,
    )


def update_span_index(
    spark: SparkSession,
    src: LakeTable,
    index: LakeTable,
    tokens_col: str,
    length: int,
    from_version: int,
    to_version: int | None = None,
    feed: DataFrame | None = None,
) -> VocabUpdateStats:
    """One change-feed window becomes one index commit; O(window token
    volume), the corpus is never re-fingerprinted."""
    return update_unit_counts(
        spark, src, index, _window_hash_array(tokens_col, length),
        "span_hash", "string", "spanidx", [tokens_col], from_version,
        to_version=to_version, feed=feed,
        rebuild_hint="the span index",
    )


def duplicated_spans(spark: SparkSession, index: LakeTable) -> DataFrame:
    """The live boilerplate inventory: every window currently repeated
    corpus-wide — a filter over the index, zero corpus IO."""
    return index.read(spark).filter(F.col("cnt") >= 2)


def scrub_against_index(
    spark: SparkSession,
    batch: DataFrame,
    index: LakeTable,
    id_col: str,
    tokens_col: str,
    length: int,
) -> DataFrame:
    """Scrub a NEW batch against the historical corpus: cut every
    position covered by a window the index knows as duplicated. Returns
    the batch columns + tokens_clean + n_dup_windows (same contract as
    spandedup.scrub_dup_spans, but the dup set comes from the index, so
    only the batch is fingerprinted).

    Note the semantics: the index reflects the corpus AS OF its last
    maintained window. A brand-new span occurring twice WITHIN the
    batch is not yet in the index's cnt>=2 slice — apply the window to
    the source and advance the index first if intra-batch dups must
    count (the lifecycle query does exactly that)."""
    from qwery_spark.operators.spandedup import scrub_with_dup_set

    return scrub_with_dup_set(
        batch, duplicated_spans(spark, index), id_col, tokens_col, length
    )
