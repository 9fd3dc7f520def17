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
        for label, sort_cols in (("unsorted", None), ("sorted", ["doc_id"])):
            d = os.path.join(base, label)
            tbl = LakeTable.create(d, TARGET_SCHEMA, n_buckets=4, write_mode="mor")
            apply_changes(spark, tbl, df, epoch_id=0, collect_stats=False, scan_ddl=False)
            compact(spark, tbl, sort_cols=sort_cols)
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
        out = {
            "n_events": n,
            "n_probes": len(probe_ids),
            "unsorted": results["unsorted"],
            "sorted": results["sorted"],
            "speedup": round(
                results["unsorted"]["lookup_sec"]
                / results["sorted"]["lookup_sec"],
                2,
            ),
        }
        print(json.dumps(out))
        spark.stop()
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
