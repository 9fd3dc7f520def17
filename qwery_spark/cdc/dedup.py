"""Per-key last-writer-wins dedup of a change-event batch.

Reference semantics: qwery applies UPSERTs row-at-a-time in stream
order, so the last event (highest offset/ordinal) for a key wins
(app/jvm/core/.../ops/sql/Upsert.scala:14-33 + the per-record offset in
devices/Record.scala:9). Set-oriented restatement: argmax by ordinal
per key.

Strategy choice (scale rationale):

  * DEFAULT ``lww_dedup``: hash aggregation with ``max_by`` over a
    payload struct. Spark's hash agg does MAP-SIDE PARTIAL COMBINE, so
    a Zipf-hot key (millions of updates for one doc_id in a batch)
    collapses to one row per map task BEFORE the shuffle — the reducer
    receives at most #map_tasks rows per key. Skew is structurally
    bounded; no salting needed. This is the plan you want at 100 TB.

  * ``lww_dedup_window``: row_number() OVER (PARTITION BY key ORDER BY
    ordinal DESC) == 1. Historically the classic skew trap (all rows of
    a key co-located + sorted on one task; AQE skew-join splitting does
    not apply to window partitions). MEASURED FINDING (Spark >= 3.5 /
    4.x): the rank<=1 filter triggers WindowGroupLimitExec with a
    PARTIAL pass before the exchange — a map-side per-key top-1 that
    bounds skew exactly like the agg's partial combine. Verified in
    tests/test_plans.py and tools/skew_bench.py (2.4M-row hot key:
    window 0.86x of max_by). On older Sparks, or for rank>k windows
    where the partial pass keeps k rows per key per task, max_by agg
    remains the safe default — and it fuses with the MOR bucket layout
    into a single shuffle (lake.merge.append_changes).

  * ``lww_dedup_salted_window``: two-phase salted mitigation — only
    needed where WindowGroupLimit is unavailable; measurably slower
    (1.4-1.6x) when it is.

tools/skew_bench.py measures all three; results in BASELINE.md §BENCH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

META_COLS = ("ordinal", "op")


def _payload_cols(df: DataFrame, key: str) -> list[str]:
    return [c for c in df.columns if c != key and c not in META_COLS]


def lww_dedup(events: DataFrame, key: str = "doc_id", ordinal: str = "ordinal") -> DataFrame:
    """One winner row per key: the event with the highest ordinal.

    Input: data events only (op in I/U/D; no DDL rows). Output columns:
    (key, op in {'U','D'}, ordinal, <payload>) — I normalizes to 'U'
    because reference UPSERT makes INSERT-on-existing behave as UPDATE.
    """
    pcols = _payload_cols(events, key)
    winner = F.max_by(
        F.struct(F.col("op"), *[F.col(f"`{c}`") for c in pcols]), F.col(ordinal)
    ).alias("w")
    out = events.groupBy(key).agg(winner, F.max(ordinal).alias(ordinal))
    sel = [
        F.col(key),
        F.when(F.col("w.op") == "D", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col(ordinal),
    ] + [F.col(f"w.`{c}`").alias(c) for c in pcols]
    return out.select(*sel)


def lww_dedup_window(events: DataFrame, key: str = "doc_id", ordinal: str = "ordinal") -> DataFrame:
    """Window formulation (single-phase; skew-prone — bench comparison)."""
    pcols = _payload_cols(events, key)
    w = Window.partitionBy(key).orderBy(F.col(ordinal).desc())
    out = (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    sel = [
        F.col(key),
        F.when(F.col("op") == "D", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col(ordinal),
    ] + [F.col(f"`{c}`") for c in pcols]
    return out.select(*sel)


def lww_dedup_salted_window(
    events: DataFrame, key: str = "doc_id", ordinal: str = "ordinal", n_salts: int = 32
) -> DataFrame:
    """Two-phase salted window: phase 1 reduces each (key, salt) shard to
    its local winner (hot key spread over n_salts tasks), phase 2 picks
    the global winner among <= n_salts shard winners per key."""
    pcols = _payload_cols(events, key)
    salted = events.withColumn("_salt", F.pmod(F.xxhash64(F.col(ordinal)), F.lit(n_salts)))
    w1 = Window.partitionBy(key, "_salt").orderBy(F.col(ordinal).desc())
    phase1 = salted.withColumn("_rn", F.row_number().over(w1)).filter(F.col("_rn") == 1)
    w2 = Window.partitionBy(key).orderBy(F.col(ordinal).desc())
    phase2 = (
        phase1.withColumn("_rn2", F.row_number().over(w2))
        .filter(F.col("_rn2") == 1)
        .drop("_rn", "_rn2", "_salt")
    )
    sel = [
        F.col(key),
        F.when(F.col("op") == "D", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col(ordinal),
    ] + [F.col(f"`{c}`") for c in pcols]
    return phase2.select(*sel)
