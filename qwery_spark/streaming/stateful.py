"""Event-time and custom-stateful streaming operators.

The reference is processing-time-only, at-least-once, no event-time
(SURVEY.md §2.9) — these are the additions a WAL-tail engine needs:

  * ``windowed_counts``: watermark + tumbling-window aggregation (late
    data beyond the watermark dropped deterministically).
  * ``dedup_within_watermark``: streaming exact-once-per-key-event
    dedup via dropDuplicates over (doc_id, ordinal) bounded by the
    watermark — the streaming counterpart of the batch LWW dedup for
    at-least-once sources.
  * ``KeyProgress``: custom stateful operator via applyInPandasWithState
    (Arrow-batched) — per-key running totals that survive across
    micro-batches in the state store. The pattern for anything the
    built-in aggregations can't express (per-key model state, CDC
    session reconstruction, dedup windows larger than memory).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling event-time windows with a watermark (append-mode safe)."""
    keys = [F.window(F.col(ts_col), window).alias("win")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC so
    # the cast is exact
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count("*").alias("n"), F.approx_count_distinct("user_id").alias("n_users"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *(extra_keys or []),
            "n",
            "n_users",
        )
    )


def dedup_within_watermark(
    events: DataFrame, ts_col: str, keys: list[str], watermark: str = "10 minutes"
) -> DataFrame:
    """At-least-once -> effectively-once event stream: drop duplicate
    (key, ordinal) deliveries within the watermark horizon."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(keys + [ts_col])


# ---- custom stateful operator ------------------------------------------
PROGRESS_OUTPUT = (
    "doc_id string, events_seen bigint, tokens_seen bigint, last_ordinal bigint"
)
PROGRESS_STATE = "events_seen bigint, tokens_seen bigint, last_ordinal bigint"


def _progress_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-key running progress: cumulative events/tokens + max ordinal.
    State persists in the state store across micro-batches; Arrow moves
    whole column batches (no per-row Python)."""
    events_seen, tokens_seen, last_ordinal = (
        state.get if state.exists else (0, 0, -1)
    )
    for pdf in pdfs:
        events_seen += len(pdf)
        tokens_seen += int(pdf["n_tok"].fillna(0).sum())
        if len(pdf):
            last_ordinal = max(last_ordinal, int(pdf["ordinal"].max()))
    state.update((events_seen, tokens_seen, last_ordinal))
    yield pd.DataFrame(
        {
            "doc_id": [key[0]],
            "events_seen": [events_seen],
            "tokens_seen": [tokens_seen],
            "last_ordinal": [last_ordinal],
        }
    )


def key_progress(events: DataFrame) -> DataFrame:
    """Streaming per-key progress via applyInPandasWithState."""
    return (
        events.filter(F.col("doc_id").isNotNull())
        .groupBy("doc_id")
        .applyInPandasWithState(
            _progress_fn,
            outputStructType=PROGRESS_OUTPUT,
            stateStructType=PROGRESS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
