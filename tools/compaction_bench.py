"""MOR read-cost evidence: resolution cost grows with delta count;
compact() restores flat reads. Run: python tools/compaction_bench.py"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.datagen import make_events
    from qwery_spark.lake.merge import compact
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA
    from qwery_spark.session import get_spark

    spark = get_spark("compaction-bench", cpus=8, shuffle_partitions=8)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="compact_", dir=base)
    tbl = LakeTable.create(d + "/t", TARGET_SCHEMA, n_buckets=32, write_mode="mor")

    n_batches, per_batch = 16, 250_000
    for b in range(n_batches):
        ev = make_events(per_batch, seed=100 + b, max_len=64,
                         start_ordinal=b * per_batch)
        import pyarrow.parquet as pq

        pq.write_table(ev, d + f"/ev{b}.parquet", row_group_size=32000)
        df = spark.read.schema(EVENT_SCHEMA).parquet(d + f"/ev{b}.parquet")
        apply_changes(spark, tbl, df, epoch_id=b, collect_stats=False, scan_ddl=False)

    def timed_read():
        tbl.read(spark).count()  # warm
        t0 = time.monotonic()
        n = tbl.read(spark).count()
        return time.monotonic() - t0, n

    files = len(tbl.snapshot().files())
    t_pre, n_pre = timed_read()
    print(f"pre-compaction : {files:4d} files, read {t_pre:6.2f}s ({n_pre} rows)")

    t0 = time.monotonic()
    compact(spark, tbl)
    t_compact = time.monotonic() - t0
    files = len(tbl.snapshot().files())
    t_post, n_post = timed_read()
    print(f"compact        : {t_compact:6.2f}s")
    print(f"post-compaction: {files:4d} files, read {t_post:6.2f}s ({n_post} rows)")
    assert n_pre == n_post
    print(f"read speedup: {t_pre / t_post:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
