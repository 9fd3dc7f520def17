"""Point-lookup bench: sorted vs unsorted compaction.

compact(sort_cols=['doc_id']) writes each bucket key-sorted so parquet
row-group min/max statistics prune key-range predicates INSIDE a
bucket. Locally a bucket fits one row group (no pruning to see), so
this bench forces small row groups (parquet.block.size) to reproduce
the many-row-groups-per-file layout a 100-TB bucket actually has, then
times the same point lookups against an unsorted and a sorted compact
of the same table.

One JSON line. Usage: python tools/pointlookup_bench.py [n_events]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.datagen import make_events
    from qwery_spark.lake.merge import compact
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA
    from qwery_spark.session import get_spark

    spark = get_spark(
        "pointlookup-bench", cpus=8, shuffle_partitions=8,
        extra_conf={
            # ~64 row groups per bucket file: the 100-TB layout in miniature
            "spark.hadoop.parquet.block.size": str(256 * 1024),
        },
    )
    base = tempfile.mkdtemp(prefix="qwery_ptlk_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    try:
        ev = make_events(n, seed=77)
        df = spark.createDataFrame(ev.to_pandas(), schema=EVENT_SCHEMA)
        step = max(n // 30, 1)
        probe_ids = [f"doc-{10 + k * step:012d}" for k in range(12)]

        results = {}
        sorted_tbl = None
        # ~16 files/bucket so manifest key_min/key_max skipping (the
        # third rung of the pruning stack) has real files to skip
        per_file = max(n // 64, 1)
        # bloom arm: parquet-native bloom filters on the key — the rung
        # for SCATTERED keys, where neither sorting nor min/max applies
        # (e.g. the table can't be kept sorted under a hot update feed).
        # ndv sized to the forced tiny row groups (~8k rows each).
        for label, sort_cols, bloom in (
            ("unsorted", None, False),
            ("unsorted_bloom", None, True),
            ("sorted", ["doc_id"], False),
        ):
            d = os.path.join(base, label)
            kw = dict(bloom_filter_cols=["doc_id"], bloom_ndv=10_000) if bloom else {}
            tbl = LakeTable.create(d, TARGET_SCHEMA, n_buckets=4, write_mode="mor", **kw)
            apply_changes(spark, tbl, df, epoch_id=0, collect_stats=False, scan_ddl=False)
            compact(spark, tbl, sort_cols=sort_cols, max_records_per_file=per_file)
            if sort_cols:
                sorted_tbl = tbl
            live = tbl.read(spark)
            live.filter(F.col("doc_id") == probe_ids[0]).count()  # warm
            t0 = time.monotonic()
            hits = sum(
                live.filter(F.col("doc_id") == pid).count() for pid in probe_ids
            )
            results[label] = {
                "lookup_sec": round(time.monotonic() - t0, 3),
                "hits": hits,
            }
        # cold baseline: a FRESH plan per probe over all files — the
        # fair comparison for lookup(), which also plans per probe.
        # (the warm variants above amortize one FileIndex across all
        # probes; lookup's win is scan pruning, not plan reuse)
        t0 = time.monotonic()
        hits = sum(
            sorted_tbl.read(spark).filter(F.col("doc_id") == pid).count()
            for pid in probe_ids
        )
        results["sorted_cold"] = {
            "lookup_sec": round(time.monotonic() - t0, 3),
            "hits": hits,
        }
        # full pruning stack: bucket hash + manifest file stats +
        # parquet row-group stats (LakeTable.lookup)
        sorted_tbl.lookup(spark, probe_ids[0]).count()  # warm
        t0 = time.monotonic()
        hits = sum(sorted_tbl.lookup(spark, pid).count() for pid in probe_ids)
        results["stats_lookup"] = {
            "lookup_sec": round(time.monotonic() - t0, 3),
            "hits": hits,
        }
        snap = sorted_tbl.snapshot()
        out = {
            "n_events": n,
            "n_probes": len(probe_ids),
            "files_total": len(snap.files()),
            "files_after_stats_prune": len(
                snap.files(key_range=(probe_ids[0], probe_ids[0]))
            ),
            "unsorted": results["unsorted"],
            "unsorted_bloom": results["unsorted_bloom"],
            "sorted": results["sorted"],
            "sorted_cold": results["sorted_cold"],
            "stats_lookup": results["stats_lookup"],
            "speedup_sorted": round(
                results["unsorted"]["lookup_sec"]
                / results["sorted"]["lookup_sec"],
                2,
            ),
            "speedup_bloom_on_scattered": round(
                results["unsorted"]["lookup_sec"]
                / results["unsorted_bloom"]["lookup_sec"],
                2,
            ),
            "speedup_stats_vs_cold": round(
                results["sorted_cold"]["lookup_sec"]
                / results["stats_lookup"]["lookup_sec"],
                2,
            ),
        }
        print(json.dumps(out))
        spark.stop()
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
