"""CDC-semantics queries on the driver's `events` table — the suite's
flagship entries. They run the ENGINE's own operators (lww_dedup) so
the DuckDB oracle directly certifies the CDC core's semantics:
last-writer-wins per key in ordinal order, with deletes.

Mapping: event_id = ordinal (LSN), user_id = key, event_type='error'
treated as a delete op, everything else as an upsert — mirroring the
reference's UPSERT KEYED ON stream-order semantics
(app/jvm/core/.../ops/sql/Upsert.scala:14-33).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qwery_spark.cdc.dedup import lww_dedup
from qwery_spark.suite import load, load_spread, register


def _as_change_stream(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("ordinal"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type"),
        F.col("value"),
    )


@register(
    "cdc_lww_final_state",
    """
    SELECT CAST(user_id AS VARCHAR) AS doc_id,
           event_id AS ordinal,
           event_type,
           round(value, 4) AS value
    FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1 AND event_type <> 'error'
    """,
    doc="THE CDC core semantic: per-key last-writer-wins over the ordinal, "
    "deletes drop the key. Engine path: max_by partial aggregation "
    "(map-side combine bounds hot-key skew); oracle: ranking window.",
)
def cdc_lww_final_state(spark, sf_dir):
    stream = _as_change_stream(spark, sf_dir)
    winners = lww_dedup(stream, key="doc_id", ordinal="ordinal")
    return winners.filter(F.col("op") != "D").select(
        "doc_id", "ordinal", "event_type", F.round("value", 4).alias("value")
    )


@register(
    "cdc_op_mix",
    """
    SELECT CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
           count(*) AS n,
           round(sum(value), 4) AS total_value,
           min(event_id) AS ordinal_min,
           max(event_id) AS ordinal_max
    FROM events GROUP BY 1
    """,
    doc="Change-stream op-mix statistics (reference: per-run Statistics, "
    "core:sources/Statistics.scala).",
)
def cdc_op_mix(spark, sf_dir):
    stream = _as_change_stream(spark, sf_dir)
    return stream.groupBy("op").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.min("ordinal").alias("ordinal_min"),
        F.max("ordinal").alias("ordinal_max"),
    )


@register(
    "cdc_stale_ratio",
    """
    SELECT CAST(user_id AS VARCHAR) AS doc_id,
           count(*) AS n_events,
           count(*) - 1 AS n_superseded,
           max(event_id) AS winning_ordinal
    FROM events GROUP BY user_id HAVING count(*) > 1
    """,
    doc="Per-key churn: how many events each key's LWW winner supersedes — "
    "the quantity the dedup's map-side combine eliminates before shuffle.",
)
def cdc_stale_ratio(spark, sf_dir):
    stream = _as_change_stream(spark, sf_dir)
    return (
        stream.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.count("*") - 1).alias("n_superseded"),
            F.max("ordinal").alias("winning_ordinal"),
        )
        .filter(F.col("n_events") > 1)
    )


@register(
    "cdc_hourly_throughput",
    """
    SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_keys,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1
    """,
    doc="Event-time windowed rollup (streaming-shaped agg; maps to a "
    "window() groupBy under Structured Streaming with watermark).",
)
def cdc_hourly_throughput(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd HH").alias("hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_keys"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "cdc_asof_last_error",
    """
    SELECT l.event_id, l.user_id,
           r.err_id AS last_error_id,
           round(r.value, 4) AS last_error_value
    FROM events l ASOF LEFT JOIN
         (SELECT user_id, event_id, event_id AS err_id, value
          FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id AND l.event_id >= r.event_id
    """,
    doc="As-of join (backward): each event enriched with the latest "
    "error event of the same user at-or-before it — an operator Spark "
    "lacks natively, built as union+window (one shuffle, no join "
    "explosion); DuckDB's native ASOF JOIN is the oracle.",
)
def cdc_asof_last_error(spark, sf_dir):
    from qwery_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    left = ev.select("user_id", "event_id")
    right = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", F.col("event_id").alias("err_id"), "value"
    )
    out = asof_join(left, right, key="user_id", time_col="event_id",
                    right_payload=["err_id", "value"])
    return out.select(
        "event_id",
        "user_id",
        F.col("right_err_id").alias("last_error_id"),
        F.round("right_value", 4).alias("last_error_value"),
    )


@register(
    "cdc_json_props",
    """
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           count(*) AS n
    FROM events GROUP BY 1
    """,
    doc="JSON payload access (reference: JSON flattening, "
    "core:util/JSONSupport.scala:98-107) via get_json_object.",
)
def cdc_json_props(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket")
        )
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"))
    )


def _with_tokens(spark, sf_dir):
    """Deterministic token arrays derived from event_id (same derivation
    as the engine-replay entries — SQL-mirrorable)."""
    ev = load(spark, sf_dir, "events")
    tokens = F.transform(
        F.sequence(F.lit(0), (F.col("event_id") % 7).cast("int")),
        lambda i: ((F.col("event_id") * 37 + i * 13) % 50257).cast("int"),
    )
    return ev.select(F.col("event_id").alias("ordinal"), tokens.alias("tokens"))


_TOKENS_SQL = """
      SELECT event_id AS ordinal,
             list_transform(range(0, CAST(event_id % 7 AS INTEGER) + 1),
                            i -> CAST((event_id * 37 + i * 13) % 50257 AS INTEGER)) AS tokens
      FROM events
"""


@register(
    "tok_histogram",
    f"""
    SELECT token % 100 AS token_bucket, count(*) AS n
    FROM (SELECT unnest(tokens) AS token FROM ({_TOKENS_SQL}) t) u
    GROUP BY 1
    """,
    doc="Token histogram: explode token arrays -> bucketed counts (vocab "
    "frequency analysis; explode+partial-agg, one shuffle on a "
    "100-value key).",
)
def tok_histogram(spark, sf_dir):
    t = _with_tokens(spark, sf_dir)
    return (
        t.select(F.explode("tokens").alias("token"))
        .groupBy((F.col("token") % 100).alias("token_bucket"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "tok_array_stats",
    f"""
    SELECT ordinal,
           len(tokens) AS n_tok,
           CAST(list_sum(tokens) AS BIGINT) AS token_sum,
           list_min(tokens) AS token_min,
           list_max(tokens) AS token_max
    FROM ({_TOKENS_SQL}) t
    """,
    doc="Per-row token-array statistics WITHOUT explode: native array "
    "aggregates (size/aggregate-fold/array_min/array_max) — zero "
    "shuffle, whole-stage codegen over the list buffers.",
)
def tok_array_stats(spark, sf_dir):
    t = _with_tokens(spark, sf_dir)
    return t.select(
        "ordinal",
        F.size("tokens").alias("n_tok"),
        F.aggregate("tokens", F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias(
            "token_sum"
        ),
        F.array_min("tokens").alias("token_min"),
        F.array_max("tokens").alias("token_max"),
    )


@register(
    "tok_bigrams",
    f"""
    SELECT a % 100 AS a_bucket, b % 100 AS b_bucket, count(*) AS n
    FROM (
      SELECT p['a'] AS a, p['b'] AS b FROM (
        SELECT unnest(list_transform(range(1, len(tokens)),
                      i -> struct_pack(a := tokens[i], b := tokens[i + 1]))) AS p
        FROM ({_TOKENS_SQL}) t WHERE len(tokens) >= 2
      )
    )
    GROUP BY 1, 2
    """,
    doc="Token bigram histogram: adjacent-pair extraction via a native "
    "array transform (no self-join, no Python), then a bucketed count — "
    "the n-gram statistics pass of a tokenizer-training pipeline. "
    "Arrays explode to pairs inside the row; one shuffle on the "
    "bounded bucket key.",
)
def tok_bigrams(spark, sf_dir):
    t = _with_tokens(spark, sf_dir).filter(F.size("tokens") >= 2)
    pairs = t.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(tokens) - 1), "
                "i -> struct(tokens[i - 1] AS a, tokens[i] AS b))"
            )
        ).alias("p")
    )
    return pairs.groupBy(
        (F.col("p.a") % 100).alias("a_bucket"), (F.col("p.b") % 100).alias("b_bucket")
    ).agg(F.count("*").alias("n"))


@register(
    "tok_vocab_stats",
    f"""
    SELECT CAST(count(DISTINCT token) AS BIGINT) AS vocab_used,
           CAST(count(*) AS BIGINT) AS total_tokens,
           CAST(min(token) AS INTEGER) AS min_token,
           CAST(max(token) AS INTEGER) AS max_token
    FROM (SELECT unnest(tokens) AS token FROM ({_TOKENS_SQL}) t) u
    """,
    doc="Global vocabulary coverage: distinct-token count + range over "
    "the exploded corpus (partial-agg'd count-distinct; at 100TB the "
    "approx_count_distinct sketch replaces the exact count, same shape).",
)
def tok_vocab_stats(spark, sf_dir):
    t = _with_tokens(spark, sf_dir)
    u = t.select(F.explode("tokens").alias("token"))
    return u.agg(
        F.countDistinct("token").alias("vocab_used"),
        F.count("*").alias("total_tokens"),
        F.min("token").alias("min_token"),
        F.max("token").alias("max_token"),
    )


@register(
    "cdc_scd2_history",
    """
    SELECT user_id, event_id,
           CAST(row_number() OVER w AS INTEGER) AS version_seq,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER w AS valid_to_us,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="SCD-Type-2 history build: every change event becomes a "
    "versioned row with [valid_from, valid_to) effective range and an "
    "is_current flag (lead over the per-key change order) — the other "
    "canonical CDC materialization besides LWW current-state.",
)
def cdc_scd2_history(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("version_seq"),
        us.alias("valid_from_us"),
        F.lead(us).over(w).alias("valid_to_us"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "tok_packing",
    f"""
    SELECT pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
           CAST(min(ordinal) AS BIGINT) AS first_doc
    FROM (
      SELECT ordinal, len(tokens) AS n_tok,
             CAST(FLOOR(CAST((sum(len(tokens)) OVER (ORDER BY ordinal
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - len(tokens)) AS DOUBLE) / 64) AS BIGINT) AS pack_id
      FROM ({_TOKENS_SQL}) t
    ) p
    GROUP BY pack_id
    """,
    doc="Sequence packing: greedy assignment of token sequences into "
    "fixed-budget context windows (budget 64 here) via a running-sum "
    "window over the WAL order — pack_id = floor(prefix_tokens/budget). "
    "The packing pass every pre-training data pipeline runs; one "
    "range-ordered window, no Python. (A global ORDER BY window is "
    "acceptable here only because packing is order-DEFINED; at scale "
    "the order key is (shard, position) so the window partitions by "
    "shard — same expression with a partitionBy added.)",
)
def tok_packing(spark, sf_dir):
    from qwery_spark.operators.packing import with_packing

    t = _with_tokens(spark, sf_dir)
    base = t.select("ordinal", F.size("tokens").alias("n_tok"))
    packed = with_packing(base, 64, "n_tok", ["ordinal"])
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("pack_tokens"),
        F.min("ordinal").cast("bigint").alias("first_doc"),
    )


@register(
    "tok_packing_sharded",
    f"""
    WITH base AS (
      SELECT ordinal, len(tokens) AS n_tok,
             CAST(ordinal % 8 AS INTEGER) AS shard
      FROM ({_TOKENS_SQL}) t
    ),
    p AS (
      SELECT ordinal, n_tok, shard,
             CAST(FLOOR(CAST((sum(n_tok) OVER (PARTITION BY shard ORDER BY ordinal
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - n_tok) AS DOUBLE) / 64) AS BIGINT) AS lp
      FROM base
    ),
    offs AS (
      SELECT shard,
             CAST(COALESCE(sum(n_packs) OVER (ORDER BY shard
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS off
      FROM (SELECT shard, max(lp) + 1 AS n_packs FROM p GROUP BY shard) c
    )
    SELECT CAST(p.lp + o.off AS BIGINT) AS pack_id,
           p.shard AS shard,
           count(*) AS n_docs,
           CAST(sum(p.n_tok) AS BIGINT) AS pack_tokens,
           CAST(min(p.ordinal) AS BIGINT) AS first_doc
    FROM p JOIN offs o ON p.shard = o.shard
    GROUP BY 1, 2
    """,
    doc="SHARDED sequence packing — the 100-TB form of tok_packing: the "
    "running-sum window partitions by shard (parallel across shards, no "
    "Exchange SinglePartition anywhere — plan-asserted in "
    "tests/test_plans.py), then per-shard pack ids are offset by the "
    "pack counts of lower shards (operators/packing.py, the rank.py "
    "offset scheme) so ids stay globally unique and dense. Pack order "
    "is (shard, ordinal) — the order key a real pipeline packs by.",
)
def tok_packing_sharded(spark, sf_dir):
    from qwery_spark.operators.packing import with_packing

    t = _with_tokens(spark, sf_dir)
    base = t.select(
        "ordinal",
        F.size("tokens").alias("n_tok"),
        (F.col("ordinal") % 8).cast("int").alias("shard"),
    )
    packed = with_packing(base, 64, "n_tok", ["ordinal"], partition_col="shard")
    return packed.groupBy("pack_id", "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("pack_tokens"),
        F.min("ordinal").cast("bigint").alias("first_doc"),
    )


@register(
    "cdc_range_join_windows",
    """
    SELECT i.err_id,
           count(*) AS n_events,
           round(sum(p.value), 4) AS window_value
    FROM (SELECT event_id AS pt_id, value FROM events) p
    JOIN (SELECT event_id AS err_id, event_id AS lo, event_id + 199 AS hi
          FROM events WHERE event_type = 'error' AND user_id % 10 = 0) i
      ON p.pt_id BETWEEN i.lo AND i.hi
    GROUP BY i.err_id
    """,
    doc="Range (interval) join: every event joined to the 200-ordinal "
    "window opened by each sampled error event. Spark has no native "
    "range join (a BETWEEN join plans BroadcastNestedLoopJoin — "
    "O(n*m)); operators/rangejoin.py bins intervals to bucket ids and "
    "hash-equi-joins on the bin + exact re-check, the Databricks "
    "range-join-optimization shape (plan-asserted: no nested loop). "
    "Oracle: DuckDB's native BETWEEN join.",
)
def cdc_range_join_windows(spark, sf_dir):
    from qwery_spark.operators.rangejoin import range_join

    ev = load(spark, sf_dir, "events")
    pts = ev.select(F.col("event_id").alias("pt_id"), F.col("value"))
    iv = ev.filter(
        (F.col("event_type") == "error") & (F.col("user_id") % 10 == 0)
    ).select(
        F.col("event_id").alias("err_id"),
        F.col("event_id").alias("lo"),
        (F.col("event_id") + 199).alias("hi"),
    )
    j = range_join(pts, iv, "pt_id", "lo", "hi", bin_width=256)
    return j.groupBy("err_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("window_value"),
    )


@register(
    "cdc_interval_overlap_join",
    """
    SELECT a.l_id, count(*) AS n_overlaps, min(b.r_id) AS first_r
    FROM (SELECT event_id AS l_id, event_id AS l_lo, event_id + 150 AS l_hi
          FROM events WHERE event_id % 101 = 0) a
    JOIN (SELECT event_id AS r_id, event_id AS r_lo, event_id + 80 AS r_hi
          FROM events WHERE event_id % 97 = 0) b
      ON a.l_lo <= b.r_hi AND b.r_lo <= a.l_hi
    GROUP BY a.l_id
    """,
    doc="Interval-OVERLAP join (two interval sets — the time-span "
    "alignment shape, e.g. audio segments x transcript spans): "
    "operators/rangejoin.interval_join bins both sides and emits each "
    "pair from its canonical bin only (one hash join, no distinct, no "
    "nested loop). Oracle: DuckDB's native overlap-predicate join.",
)
def cdc_interval_overlap_join(spark, sf_dir):
    from qwery_spark.operators.rangejoin import interval_join

    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 101 == 0).select(
        F.col("event_id").alias("l_id"),
        F.col("event_id").alias("l_lo"),
        (F.col("event_id") + 150).alias("l_hi"),
    )
    b = ev.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("r_id"),
        F.col("event_id").alias("r_lo"),
        (F.col("event_id") + 80).alias("r_hi"),
    )
    j = interval_join(a, b, "l_lo", "l_hi", "r_lo", "r_hi", bin_width=256)
    return j.groupBy("l_id").agg(
        F.count("*").alias("n_overlaps"),
        F.min("r_id").alias("first_r"),
    )


_LONG_TOKENS_SQL = """
      SELECT event_id AS ordinal,
             list_transform(range(0, CAST(event_id % 37 AS INTEGER) + 1),
                            i -> CAST((event_id * 41 + i * 7) % 50257 AS INTEGER)) AS tokens
      FROM events
"""


@register(
    "tok_chunking",
    f"""
    SELECT ordinal,
           CAST(start // 8 AS INTEGER) AS chunk_id,
           CAST(start AS INTEGER) AS start_pos,
           CAST(len(tokens[start + 1 : start + 16]) AS INTEGER) AS chunk_len,
           md5(array_to_string(tokens[start + 1 : start + 16], ',')) AS chunk_md5
    FROM (
      SELECT ordinal, tokens, unnest(range(0, len(tokens), 8)) AS start
      FROM ({_LONG_TOKENS_SQL}) t
    )
    """,
    doc="Context-length chunking (operators/chunk.py): variable-length "
    "token arrays -> max_len=16 windows at stride 8 (overlapping LM "
    "contexts, short tails kept) — a zero-shuffle map-only generate+slice "
    "stage; per-chunk content value-checked via md5.",
)
def tok_chunking(spark, sf_dir):
    from qwery_spark.operators.chunk import chunk_tokens

    ev = load_spread(spark, sf_dir, "events", "event_id")
    tokens = F.transform(
        F.sequence(F.lit(0), (F.col("event_id") % 37).cast("int")),
        lambda i: ((F.col("event_id") * 41 + i * 7) % 50257).cast("int"),
    )
    docs = ev.select(F.col("event_id").alias("ordinal"), tokens.alias("tokens"))
    return chunk_tokens(docs, max_len=16, stride=8).select(
        "ordinal",
        "chunk_id",
        "start_pos",
        "chunk_len",
        F.md5(F.array_join(F.transform("chunk", lambda x: x.cast("string")), ","))
        .alias("chunk_md5"),
    )
