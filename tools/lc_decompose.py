"""Decompose the local-cluster scaling gap (round-6 verdict task #1).

The r6 driver artifact showed the engine's 2x4 -> 8x4 separate-JVM
scaling trailing the raw-Spark control (lc_engine_vs_control 0.674)
while in-process local[n] matched it (0.9996) — pointing at per-epoch
DRIVER-side serial work that in-process dispatch hides. This tool
measures exactly that: the same bench replay at the same two rungs,
with every epoch's wall time split into

  write_job   the Spark parquet write (executor-bound)
  footer      driver-side parquet footer stat reads (_footer_stats)
  commit      manifest build + CAS link (_write_manifest/_commit_record)
  other       residual driver time in apply_changes (validation plan,
              Observation get, epoch bookkeeping)

Arms are interleaved [engine, control] x reps after full-size warms,
mirroring bench.py's contention discipline. Prints one JSON line.

Run: python tools/lc_decompose.py [n_events] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_BUCKETS = 64
FAST_TMP = "/dev/shm" if os.path.isdir("/dev/shm") else None

ACC = {"footer": 0.0, "commit": 0.0, "stage_write": 0.0, "append": 0.0,
       "write_job": 0.0}


def _instrument():
    import qwery_spark.lake.merge as m
    import qwery_spark.lake.table as t

    def timed(mod, name, bucket):
        fn = getattr(mod, name)

        def w(*a, **kw):
            t0 = time.monotonic()
            try:
                return fn(*a, **kw)
            finally:
                ACC[bucket] += time.monotonic() - t0

        setattr(mod, name, w)

    import qwery_spark.cdc.apply as ap

    orig_sw = m._stage_write

    def sw(*a, **kw):
        t0 = time.monotonic()
        try:
            return orig_sw(*a, **kw)
        finally:
            ACC["stage_write"] += time.monotonic() - t0
            # wall-split recorded by the production hook (write job vs
            # threaded footer pass)
            ACC["write_job"] += m.LAST_STAGE_TIMINGS.get("write_sec", 0.0)
            ACC["footer"] += m.LAST_STAGE_TIMINGS.get("footer_sec", 0.0)

    m._stage_write = sw
    timed(m, "append_changes", "append")
    # apply.py bound append_changes at ITS import time — re-point it
    ap.append_changes = m.append_changes
    orig_commit = t.LakeTable._commit_record

    def commit_w(self, *a, **kw):
        t0 = time.monotonic()
        try:
            return orig_commit(self, *a, **kw)
        finally:
            ACC["commit"] += time.monotonic() - t0

    t.LakeTable._commit_record = commit_w


def _replay(spark, files):
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA

    d = tempfile.mkdtemp(prefix="lcdec_tbl_", dir=FAST_TMP)
    try:
        tbl = LakeTable.create(d + "/t", TARGET_SCHEMA, n_buckets=N_BUCKETS,
                               write_mode="mor")
        per = max(len(files) // 4, 1)
        t0 = time.monotonic()
        for b in range(4):
            chunk = files[b * per:(b + 1) * per] or files[-1:]
            df = spark.read.schema(EVENT_SCHEMA).parquet(*chunk)
            apply_changes(spark, tbl, df, epoch_id=b, collect_stats=True,
                          scan_ddl=False)
        return time.monotonic() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _control(spark, files):
    from pyspark.sql import functions as F

    from qwery_spark.schema import EVENT_SCHEMA

    out = tempfile.mkdtemp(prefix="lcdec_raw_", dir=FAST_TMP)
    try:
        t0 = time.monotonic()
        df = spark.read.schema(EVENT_SCHEMA).parquet(*files)
        ded = (
            df.filter(F.col("op") != "DDL")
            .groupBy("doc_id")
            .agg(F.max_by(F.struct("op", "tokens", "n_tok", "source"),
                          "ordinal").alias("w"),
                 F.max("ordinal").alias("o"))
        )
        ded.select("doc_id", "o", "w.*").write.mode("overwrite").parquet(out + "/x")
        return time.monotonic() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _control4(spark, files):
    """The SAME no-engine computation as _control, but forced into the
    engine's batching granularity: one groupBy+write job per chunk,
    sequentially. If this arm scales like the engine (and unlike the
    one-job control), the engine's residual scaling gap is attributable
    to micro-batch granularity — per-epoch stage barriers and task-wave
    tails — not to engine code."""
    from pyspark.sql import functions as F

    from qwery_spark.schema import EVENT_SCHEMA

    out = tempfile.mkdtemp(prefix="lcdec_raw4_", dir=FAST_TMP)
    try:
        t0 = time.monotonic()
        for i, f in enumerate(files):
            df = spark.read.schema(EVENT_SCHEMA).parquet(f)
            ded = (
                df.filter(F.col("op") != "DDL")
                .groupBy("doc_id")
                .agg(F.max_by(F.struct("op", "tokens", "n_tok", "source"),
                              "ordinal").alias("w"),
                     F.max("ordinal").alias("o"))
            )
            ded.select("doc_id", "o", "w.*").write.mode("overwrite").parquet(
                f"{out}/x{i}"
            )
        return time.monotonic() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main():
    from qwery_spark.datagen import make_events, write_event_chunks
    from qwery_spark.session import get_spark

    _instrument()
    tmp = tempfile.mkdtemp(prefix="lcdec_events_")
    try:
        ev = make_events(N_EVENTS, seed=43, max_len=96)
        write_event_chunks(ev, tmp + "/e", 4)
        files = sorted(
            os.path.join(tmp + "/e", f) for f in os.listdir(tmp + "/e")
            if f.endswith(".parquet")
        )
        out = {"n_events": N_EVENTS, "rungs": {}}
        for n_exec in (2, 8):
            from pyspark.sql import SparkSession

            active = SparkSession.getActiveSession()
            if active is not None:
                active.stop()
            spark = get_spark(
                f"lcdec{n_exec}", cpus=n_exec * 4,
                shuffle_partitions=n_exec * 4,
                master=f"local-cluster[{n_exec},4,3072]",
                extra_conf={"spark.executor.memory": "2g"},
            )
            for _ in range(2):
                _replay(spark, files)
            _control(spark, files)
            _control(spark, files)
            _control4(spark, files)
            runs = []
            for _ in range(REPS):
                for k in ACC:
                    ACC[k] = 0.0
                e = _replay(spark, files)
                snap = dict(ACC)
                c = _control(spark, files)
                c4 = _control4(spark, files)
                write_job = snap["write_job"]
                runs.append({
                    "engine_sec": round(e, 3),
                    "ctrl_sec": round(c, 3),
                    "ctrl4_sec": round(c4, 3),
                    "write_job_sec": round(write_job, 3),
                    "footer_sec": round(snap["footer"], 3),
                    "commit_sec": round(snap["commit"], 3),
                    "other_driver_sec": round(
                        e - write_job - snap["footer"] - snap["commit"], 3
                    ),
                })
            out["rungs"][f"execs{n_exec}x4"] = runs
            spark.stop()
        e2 = min(r["engine_sec"] for r in out["rungs"]["execs2x4"])
        e8 = min(r["engine_sec"] for r in out["rungs"]["execs8x4"])
        c2 = min(r["ctrl_sec"] for r in out["rungs"]["execs2x4"])
        c8 = min(r["ctrl_sec"] for r in out["rungs"]["execs8x4"])
        c42 = min(r["ctrl4_sec"] for r in out["rungs"]["execs2x4"])
        c48 = min(r["ctrl4_sec"] for r in out["rungs"]["execs8x4"])
        out["lc_efficiency_n_to_4n"] = round(e2 / (4 * e8), 4)
        out["raw_efficiency_n_to_4n"] = round(c2 / (4 * c8), 4)
        out["ctrl4_efficiency_n_to_4n"] = round(c42 / (4 * c48), 4)
        out["lc_engine_vs_control"] = round(
            out["lc_efficiency_n_to_4n"] / out["raw_efficiency_n_to_4n"], 4
        )
        out["lc_engine_vs_ctrl4"] = round(
            out["lc_efficiency_n_to_4n"] / out["ctrl4_efficiency_n_to_4n"], 4
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
