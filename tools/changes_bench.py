"""Changelog-read micro-bench: cost of read_changes vs range length.

Builds one MOR table with N_COMMITS small merges, then times the feed
over ranges of 4 / 16 / all commits (plus the driver-side plan cost of
folding manifest states, which the _HIST_CACHE memo keeps O(range)).

One JSON line. Usage: python tools/changes_bench.py [n_commits] [rows_per_commit]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    from pyspark.sql import functions as F  # noqa: F401

    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.datagen import make_events
    from qwery_spark.lake.changes import read_changes
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA
    from qwery_spark.session import get_spark

    spark = get_spark("changes-bench", cpus=8, shuffle_partitions=8)
    base = tempfile.mkdtemp(
        prefix="qwery_chg_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    try:
        tbl = LakeTable.create(base + "/t", TARGET_SCHEMA, n_buckets=8, write_mode="mor")
        ev = make_events(n_commits * rows, seed=31).to_pandas()
        t0 = time.monotonic()
        for i in range(n_commits):
            df = spark.createDataFrame(
                ev.iloc[i * rows : (i + 1) * rows], schema=EVENT_SCHEMA
            )
            apply_changes(spark, tbl, df, epoch_id=i, collect_stats=False, scan_ddl=False)
        build_sec = round(time.monotonic() - t0, 2)
        head = tbl.current_version()

        out = {"n_commits": n_commits, "rows_per_commit": rows, "build_sec": build_sec}
        for label, lo in (("last4", head - 4), ("last16", head - 16), ("full", 0)):
            t0 = time.monotonic()
            n = read_changes(spark, tbl, max(lo, 0), head).count()
            out[label] = {
                "commits": head - max(lo, 0),
                "rows": n,
                "sec": round(time.monotonic() - t0, 2),
            }
        # coarse catch-up: one endpoint diff regardless of range length
        t0 = time.monotonic()
        n = read_changes(spark, tbl, 0, head, granular=False).count()
        out["full_coarse"] = {
            "commits": head,
            "rows": n,
            "sec": round(time.monotonic() - t0, 2),
        }
        # window-attributed hybrid: ceil(K/W) endpoint diffs with
        # window-end _commit_version labels — the far-behind-follower
        # mode; cost should land near coarse, far under granular
        for w in (8, 16):
            t0 = time.monotonic()
            n = read_changes(spark, tbl, 0, head, window=w).count()
            out[f"full_window{w}"] = {
                "commits": head,
                "windows": -(-head // w),
                "rows": n,
                "sec": round(time.monotonic() - t0, 2),
            }
        # driver-side fold cost alone (no Spark jobs): walk every
        # version's snapshot twice, as the feed's planner does
        t0 = time.monotonic()
        for v in range(1, head + 1):
            tbl.snapshot(v)
            tbl.snapshot(v - 1)
        out["fold_walk_sec"] = round(time.monotonic() - t0, 3)
        print(json.dumps(out))
        spark.stop()
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
