"""Per-epoch cost-flatness evidence: the MOR ingest path's wall time per
batch must NOT grow as the table deepens — the property that makes a
10^10-event replay linear. 16 epochs x 500k events through the real
apply_changes; prints per-epoch wall ms + a first-half/second-half
ratio. Run: python tools/flatcost_bench.py [epochs] [events_per_epoch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.datagen import make_events
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA
    from qwery_spark.session import get_spark

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    per_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    if epochs < 4:
        raise SystemExit("epochs must be >= 4 (first/second-half medians need data)")

    spark = get_spark("flatcost-bench", cpus=32, shuffle_partitions=32)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="flatcost_", dir=base)
    try:
        tbl = LakeTable.create(d + "/t", TARGET_SCHEMA, n_buckets=64,
                               write_mode="mor")
        walls = []
        for e in range(epochs):
            ev = make_events(per_epoch, seed=500 + e, max_len=64,
                             start_ordinal=e * per_epoch)
            df = spark.createDataFrame(ev.to_pandas(), schema=EVENT_SCHEMA)
            res = apply_changes(spark, tbl, df, epoch_id=e, scan_ddl=False)
            walls.append(res.wall_ms)
        half = epochs // 2
        first = sorted(walls[1:half])[len(walls[1:half]) // 2]   # skip epoch 0 (JIT)
        second = sorted(walls[half:])[len(walls[half:]) // 2]
        out = {
            "epochs": epochs,
            "events_per_epoch": per_epoch,
            "wall_ms_per_epoch": walls,
            "median_first_half_ms": first,
            "median_second_half_ms": second,
            "second_over_first": round(second / first, 3),
            "live_files_at_end": len(tbl.snapshot().files()),
            "events_per_sec_overall": round(
                epochs * per_epoch / (sum(walls) / 1000.0), 1
            ),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
