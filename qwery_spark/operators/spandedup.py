"""Exact duplicated-span detection and scrubbing over token arrays —
the "exact substring dedup" pass of a training-data pipeline (Lee et
al. 2022, "Deduplicating Training Data Makes Language Models Better"):
any L-token window that occurs more than once in the corpus is
boilerplate (licenses, headers, templated text) and is cut from every
document that carries it.

The published implementation builds a corpus-wide suffix array on one
big machine; this is the distributed-SQL restatement — content-hash
every L-token window (a rolling fingerprint per position), find hashes
with more than one occurrence, and cut the covered positions. All
stages are Catalyst expressions:

  window hashes  map-only HOF: transform(sequence(..), i ->
                 md5(array_join(slice(tokens, i, L)))) — no shuffle,
                 whole-stage codegen
  dup detection  posexplode + ONE groupBy(span_hash) with map-side
                 partial aggregation (the explode amplifies rows by
                 ~n_tok but the partial agg collapses repeats before
                 the shuffle)
  scrub          semi-join window rows against the dup-hash set
                 (bucket-shaped on span_hash), collect the dup start
                 positions per doc (bounded by the doc's own length),
                 and filter the token array with an index lambda

100-TB shape: the only shuffles are keyed on span_hash (high
cardinality, uniform by construction — md5) and doc id; nothing is
ever joined all-pairs and no stage materializes more than the exploded
window-hash stream, which is the same asymptotic volume a suffix-array
build would sort. Hashes are full md5 (128-bit): at 10^10 windows a
64-bit fingerprint would already see birthday collisions, a 128-bit
one does not.

Reference anchor: beyond the reference (no token/array surface there);
the operator family matches SURVEY.md's training-data-pipeline
mandate alongside MinHash/SimHash (operators/dedupe.py), which catch
NEAR-duplicate documents while this pass catches EXACT repeated spans
inside otherwise-distinct documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _window_hash_array(tokens_col: str, length: int) -> Column:
    """Array of md5 fingerprints, one per L-window start (1-based);
    empty when the doc is shorter than L. Pure Catalyst HOFs — the
    guard matters because sequence(1, 0) in Spark yields a DESCENDING
    [1, 0], not an empty array."""
    c = f"`{tokens_col}`"
    # NULL elements inside a window are skipped by array_join, i.e. a
    # null token is hashed as if absent — token arrays are expected
    # null-element-free (the vocab maintainer enforces the same rule by
    # dropping null units)
    return F.expr(
        f"CASE WHEN size({c}) >= {length} THEN "
        f"  transform(sequence(1, size({c}) - {length} + 1), "
        f"    i -> md5(array_join(transform(slice({c}, i, {length}), "
        f"         x -> cast(x AS string)), ','))) "
        f"ELSE array() END"
    )


def span_windows(
    df: DataFrame, id_col: str, tokens_col: str, length: int
) -> DataFrame:
    """One row per L-token window: (id, pos [1-based], span_hash).
    Map-only until consumed (the posexplode is pipelined into whatever
    shuffle the consumer adds)."""
    return df.select(
        F.col(f"`{id_col}`"),
        F.posexplode(_window_hash_array(tokens_col, length)).alias(
            "_pos0", "span_hash"
        ),
    ).select(
        F.col(f"`{id_col}`"),
        (F.col("_pos0") + 1).cast("long").alias("pos"),
        "span_hash",
    )


def dup_spans(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    length: int,
    min_occurrences: int = 2,
) -> DataFrame:
    """Corpus-wide duplicated-window inventory: every L-window content
    hash occurring >= min_occurrences times, with its occurrence and
    document counts. ONE shuffle on span_hash, partial-aggregated
    map-side."""
    return (
        span_windows(df, id_col, tokens_col, length)
        .groupBy("span_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct(f"`{id_col}`").alias("n_docs"),
        )
        .filter(F.col("n_occ") >= min_occurrences)
    )


def scrub_with_dup_set(
    df: DataFrame,
    dup_hashes: DataFrame,
    id_col: str,
    tokens_col: str,
    length: int,
) -> DataFrame:
    """Cut every position of ``df``'s token arrays covered by a window
    whose hash appears in ``dup_hashes`` (a DataFrame with a single
    ``span_hash`` column). Returns the input columns plus:

      tokens_clean   the scrubbed array (order preserved)
      n_dup_windows  how many flagged windows the doc carried

    A position survives iff no flagged window's span [s, s+L-1] covers
    it. The per-doc dup-start list is bounded by the doc's own length,
    so the collect_set and the index-lambda filter are O(doc), never
    O(corpus). Only ``df`` is fingerprinted — the dup set can come from
    this corpus (scrub_dup_spans) or a persisted index
    (spanindex.scrub_against_index)."""
    w = span_windows(df, id_col, tokens_col, length)
    dup_pos = (
        w.join(dup_hashes.select("span_hash"), "span_hash", "left_semi")
        .groupBy(f"`{id_col}`")
        .agg(F.collect_set("pos").alias("_dup_starts"))
    )
    toks = F.col(f"`{tokens_col}`")
    ds = F.col("_dup_starts")
    keep = F.filter(
        toks,
        lambda x, i: ~F.exists(
            ds, lambda s: (s <= i + 1) & (i + 1 <= s + F.lit(length) - 1)
        ),
    )
    return (
        df.join(dup_pos, id_col, "left")
        .select(
            *[F.col(f"`{c}`") for c in df.columns],
            F.when(ds.isNull(), toks).otherwise(keep).alias("tokens_clean"),
            F.coalesce(F.size(ds), F.lit(0)).cast("long").alias(
                "n_dup_windows"
            ),
        )
    )


def scrub_dup_spans(
    df: DataFrame, id_col: str, tokens_col: str, length: int
) -> DataFrame:
    """Cut every position covered by ANY corpus-duplicated L-window
    from each document's token array (one-shot form: the dup set is
    computed from ``df`` itself)."""
    dups = (
        span_windows(df, id_col, tokens_col, length)
        .groupBy("span_hash")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= 2)
        .select("span_hash")
    )
    return scrub_with_dup_set(df, dups, id_col, tokens_col, length)
