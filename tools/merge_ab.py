"""Controlled A/B: single-scan COW broadcast merge (round-3 shape,
persist + eager count of the merged join) vs the round-2 double-scan
shape (QWERY_MERGE_TWO_SCAN=1 — no persist; matched keys from a second
left_semi scan of the touched target buckets).

Round-3 verdict task #1: the driver-recorded COW throughput dropped
1.8x in the same round the merge went single-scan, while every MOR
query drifted 1.2-1.6x the same direction (host contention signature).
This tool separates the two explanations: runs are INTERLEAVED
(A,B,A,B,...) inside one session on tmpfs so slow host drift hits both
arms equally, and every run is printed.

Usage: PYTHONPATH=. python tools/merge_ab.py [n_events] [reps]
Prints one JSON line with all runs + best/median per arm.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_BATCHES = 4
N_BUCKETS = 64
FAST_TMP = "/dev/shm" if os.path.isdir("/dev/shm") else None


def _replay_cow(spark, files, tmp_dir):
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA

    d = tempfile.mkdtemp(prefix="qwery_ab_tbl_", dir=tmp_dir)
    try:
        tbl = LakeTable.create(
            d + "/t", TARGET_SCHEMA, n_buckets=N_BUCKETS, write_mode="cow"
        )
        per_batch = max(len(files) // N_BATCHES, 1)
        t0 = time.monotonic()
        for b in range(N_BATCHES):
            chunk = files[b * per_batch : (b + 1) * per_batch] or files[-1:]
            df = spark.read.schema(EVENT_SCHEMA).parquet(*chunk)
            apply_changes(spark, tbl, df, epoch_id=b, collect_stats=True, scan_ddl=False)
        return time.monotonic() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    from qwery_spark.datagen import make_events, write_event_chunks
    from qwery_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp = tempfile.mkdtemp(prefix="qwery_ab_events_", dir=FAST_TMP)
    try:
        ev = make_events(N_EVENTS, seed=42, max_len=64)
        write_event_chunks(ev, tmp + "/ev", N_BATCHES * 2)
        files = sorted(
            os.path.join(tmp + "/ev", f)
            for f in os.listdir(tmp + "/ev")
            if f.endswith(".parquet")
        )
        spark = get_spark("merge-ab", cpus=cpus, shuffle_partitions=max(cpus, 4))
        # warm both arms once (JIT + codegen)
        for env in ("0", "1"):
            os.environ["QWERY_MERGE_TWO_SCAN"] = env
            _replay_cow(spark, files[:2], tmp)
        runs = {"single_scan": [], "two_scan": []}
        for _ in range(REPS):
            for arm, env in (("single_scan", "0"), ("two_scan", "1")):
                os.environ["QWERY_MERGE_TWO_SCAN"] = env
                sec = _replay_cow(spark, files, tmp)
                runs[arm].append(round(N_EVENTS / sec, 1))
        os.environ.pop("QWERY_MERGE_TWO_SCAN", None)
        out = {
            "n_events": N_EVENTS,
            "reps": REPS,
            "cpus": cpus,
            "interleaved": True,
            "runs_ev_per_sec": runs,
            "best": {k: max(v) for k, v in runs.items()},
            "median": {k: statistics.median(v) for k, v in runs.items()},
        }
        out["single_vs_two_best"] = round(
            out["best"]["single_scan"] / out["best"]["two_scan"], 4
        )
        print(json.dumps(out))
        spark.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
