"""Benchmark entrypoint (driver contract).

Prints ONE JSON line:
  {"metric": "cdc_replay_sec", "value": <sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>,
   "events_per_sec": ..., "n_events": ...,
   "scaling": {"local8_events_per_sec": ..., "local32_events_per_sec": ...,
               "efficiency_n_to_4n": ...}}

Headline: wall-clock of a deterministic change-event replay (validation
-> LWW dedup -> bucket-pruned MERGE, 4 micro-batches) through the real
engine, at local[$SPARK_GRAFT_CPUS] on $SPARK_GRAFT_SF_DIR-scaled input.

Scaling evidence (BASELINE.md target #5, sandbox proxy for N vs 4N
executors): the same replay at local[8] and local[32]; efficiency =
thr(32) / (4 * thr(8)).

Set SPARK_GRAFT_BENCH_SCALING=0 to skip the two extra sessions.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DO_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") == "1"

# events scale with sf: sf0.1 -> 600k change events
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_EVENTS = max(int(6_000_000 * _SF), 10_000)
N_BATCHES = 4
N_BUCKETS = 64
MAX_LEN = 64

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_segment_revenue",
    "q05_nation_revenue",
    "q_window_top3_per_cust",
    "cdc_lww_final_state",
    "dedup_exact",
    "dedup_minhash_candidates",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "text_quality",
    "mm_binary_features",
]


def _fresh_spark(cpus: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from qwery_spark.session import get_spark

    return get_spark(f"qwery-bench-{cpus}", cpus=cpus, shuffle_partitions=cpus)


def _replay(spark, event_dir: str, n_buckets: int) -> float:
    """Replay all chunks through the engine; returns wall seconds."""
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA

    d = tempfile.mkdtemp(prefix="qwery_bench_tbl_")
    try:
        tbl = LakeTable.create(d + "/t", TARGET_SCHEMA, n_buckets=n_buckets)
        files = sorted(
            os.path.join(event_dir, f) for f in os.listdir(event_dir) if f.endswith(".parquet")
        )
        per_batch = max(len(files) // N_BATCHES, 1)
        t0 = time.monotonic()
        for b in range(N_BATCHES):
            chunk = files[b * per_batch : (b + 1) * per_batch] or files[-1:]
            df = spark.read.schema(EVENT_SCHEMA).parquet(*chunk)
            apply_changes(spark, tbl, df, epoch_id=b, collect_stats=False)
        return time.monotonic() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    from qwery_spark.datagen import make_events, write_event_chunks

    ev_dir = tempfile.mkdtemp(prefix="qwery_bench_events_")
    try:
        events = make_events(N_EVENTS, seed=42, max_len=MAX_LEN)
        write_event_chunks(events, ev_dir, N_BATCHES * 2)

        scaling = {}
        if DO_SCALING:
            spark8 = _fresh_spark(8)
            # warm the JVM/codegen so the scaling ratio measures compute
            _replay(spark8, ev_dir, N_BUCKETS)
            t8 = _replay(spark8, ev_dir, N_BUCKETS)
            spark8.stop()
            spark32 = _fresh_spark(32)
            _replay(spark32, ev_dir, N_BUCKETS)
            t32 = _replay(spark32, ev_dir, N_BUCKETS)
            spark32.stop()
            thr8, thr32 = N_EVENTS / t8, N_EVENTS / t32
            scaling = {
                "local8_events_per_sec": round(thr8, 1),
                "local32_events_per_sec": round(thr32, 1),
                "efficiency_n_to_4n": round(thr32 / (4 * thr8), 4),
            }

        spark = _fresh_spark(CPUS)
        # headline replay at the configured parallelism (warm once)
        _replay(spark, ev_dir, N_BUCKETS)
        replay_sec = _replay(spark, ev_dir, N_BUCKETS)

        from qwery_spark.suite import REGISTRY

        qtimes = {}
        for name in BENCH_QUERIES:
            fn = REGISTRY[name].fn
            fn(spark, SF_DIR).count()  # warm (plan + IO cache)
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            qtimes[name] = round(time.monotonic() - t0, 3)

        out = {
            "metric": "cdc_replay_sec",
            "value": round(replay_sec, 3),
            "unit": "sec",
            "queries": qtimes,
            "sf": _SF,
            "n_events": N_EVENTS,
            "events_per_sec": round(N_EVENTS / replay_sec, 1),
            "scaling": scaling,
        }
        print(json.dumps(out))
        spark.stop()
    finally:
        shutil.rmtree(ev_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
