"""Benchmark entrypoint (driver contract).

Output protocol (round-6: the driver keeps only the LAST ~2000 chars of
stdout, which truncated round-5's single giant JSON line to
unparseability): verbose detail — every headline run with per-epoch
breakdowns, ladder runs, interleave sequences — is printed on EARLIER
``DETAIL`` lines and persisted to ``BENCH_DETAIL.json`` next to this
file; the FINAL printed line is a compact (<1800 char) summary JSON:
  {"metric": "cdc_replay_sec", "value": <sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ..., "n_events": ...,
   "events_per_sec": ..., "cow_events_per_sec": ...,
   "mor_vs_control": ..., "cow_vs_control": ...,
   "efficiency_n_to_4n": ..., "engine_vs_control": ...,
   "lc_efficiency_n_to_4n": ..., "lc_engine_vs_control": ...,
   "detail": "BENCH_DETAIL.json"}

Headline: wall-clock of a deterministic change-event replay (validation
-> fused LWW-dedup+bucket-layout single-shuffle -> merge-on-read delta
append -> final compaction) through the real engine at
local[$SPARK_GRAFT_CPUS] on $SPARK_GRAFT_SF_DIR-scaled input.
The headline runs FIRST (before the scaling ladder heats the host),
best-of-3 for MOR and COW, every run + per-epoch breakdown recorded.

Contention-proofing (round-6): the headline arms are INTERLEAVED —
each cycle runs MOR replay, COW replay, then the no-engine raw-Spark
control back-to-back, three cycles — so host drift (another tenant,
thermal throttling) hits every arm equally and the normalized ratios
``mor_vs_control`` / ``cow_vs_control`` stay comparable across
sessions even when absolute numbers swing. The local-cluster rungs
interleave engine/control the same way. (The r5 driver session's COW
34.5k-vs-clean-50.7k swing was exactly this ambiguity.)

Scaling evidence (BASELINE.md target #5; sandbox proxy for N vs 4N
executors per the driver instruction): the same replay at two
parallelism levels. The headline pair is local[1] -> local[4], the
rungs where this host still has 4 independent physical cores to give;
the ladder + a raw-Spark control (scan->agg->write with no engine code)
shows higher rungs are capped by host SMT / memory bandwidth, not by
the engine: engine efficiency tracks raw-Spark efficiency per rung.

Set SPARK_GRAFT_BENCH_SCALING=0 to skip the scaling section.
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

_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_EVENTS = max(int(6_000_000 * _SF), 10_000)
N_BATCHES = 4
N_BUCKETS = 64
MAX_LEN = 64
SCALING_EVENTS = 4_000_000  # fixed size: scaling needs compute-bound batches
# scaling tables live on tmpfs when available: isolates CPU scaling from
# single-disk write contention (a real cluster has a disk per executor)
FAST_TMP = "/dev/shm" if os.path.isdir("/dev/shm") else None

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
    "q10_returned_revenue",
    "tok_bigrams",
    "tok_packing_sharded",
    "cdc_range_join_windows",
    "cdc_change_feed",
    "tok_chunking",
    "cdc_incremental_agg",
    "cdc_scd2_materialized",
    "dedup_incremental_candidates",
    # round-5: persisted incremental IVF index e2e (build + window
    # update + sorted compaction + probe — construction-dominated by
    # design, like the other incremental-view entries)
    "ann_index_incremental_topk",
    # round-6: write-audit-publish engine loop (branch stage + audit +
    # fast-forward/reject per window) and the zero-shuffle repetition
    # filters
    "cdc_wap_publish",
    "text_repetition_quality",
    # round-6 session D: incremental materialized join view (two-table
    # delta-join maintenance) and distributed BPE training (4 merges,
    # vocab-sized iterations)
    "cdc_incremental_join",
    "tok_bpe_train",
    # round-6 session E: one-shot exact-span scrub (corpus
    # fingerprint + cut), the span-index lifecycle (build + window
    # update + dup inventory), and the vocabulary-view lifecycle
    "tok_span_scrub",
    "tok_span_index_dups",
    "cdc_incremental_vocab",
]


def _fresh_spark(cpus: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from qwery_spark.session import get_spark

    return get_spark(f"qwery-bench-{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 4))


def _fresh_spark_cluster(n_exec: int, cores: int = 4, worker_mb: int = 3072):
    """local-cluster[n,cores,mem]: SEPARATE executor JVMs — the closest
    single-host stand-in for N real executors (isolates the engine from
    the single shared heap / GC the local[N] rungs couple through)."""
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from qwery_spark.session import get_spark

    return get_spark(
        f"qwery-bench-lc{n_exec}",
        cpus=n_exec * cores,
        shuffle_partitions=n_exec * cores,
        master=f"local-cluster[{n_exec},{cores},{worker_mb}]",
        extra_conf={"spark.executor.memory": "2g"},
    )


def _replay(spark, files: list[str], n_buckets: int, n_batches: int,
            mode: str = "mor", compact_at_end: bool = False,
            tmp_dir: str | None = None, breakdown: dict | None = None) -> float:
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.lake.merge import compact
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA

    d = tempfile.mkdtemp(prefix="qwery_bench_tbl_", dir=tmp_dir)
    try:
        tbl = LakeTable.create(d + "/t", TARGET_SCHEMA, n_buckets=n_buckets, write_mode=mode)
        per_batch = max(len(files) // n_batches, 1)
        t0 = time.monotonic()
        for b in range(n_batches):
            tb = time.monotonic()
            chunk = files[b * per_batch : (b + 1) * per_batch] or files[-1:]
            df = spark.read.schema(EVENT_SCHEMA).parquet(*chunk)
            # collect_stats rides the write job via the Observation API —
            # full lineage metrics are free, so the bench keeps them on
            apply_changes(spark, tbl, df, epoch_id=b, collect_stats=True, scan_ddl=False)
            if breakdown is not None:
                breakdown.setdefault("epochs", []).append(
                    round(time.monotonic() - tb, 3)
                )
        if compact_at_end:
            tc = time.monotonic()
            compact(spark, tbl)
            if breakdown is not None:
                breakdown["compact"] = round(time.monotonic() - tc, 3)
        return time.monotonic() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _raw_control(spark, files: list[str]) -> float:
    """No-engine control: scan -> LWW agg -> parquet write. Its scaling
    is the host ceiling; the engine is graded against it."""
    from pyspark.sql import functions as F

    from qwery_spark.schema import EVENT_SCHEMA

    out = tempfile.mkdtemp(prefix="qwery_bench_raw_")
    try:
        t0 = time.monotonic()
        df = spark.read.schema(EVENT_SCHEMA).parquet(*files)
        ded = (
            df.filter(F.col("op") != "DDL")
            .groupBy("doc_id")
            .agg(
                F.max_by(F.struct("op", "tokens", "n_tok", "source"), "ordinal").alias("w"),
                F.max("ordinal").alias("o"),
            )
        )
        ded.select("doc_id", "o", "w.*").write.mode("overwrite").parquet(out + "/x")
        return time.monotonic() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _chunk_paths(ev_dir: str) -> list[str]:
    return sorted(
        os.path.join(ev_dir, f) for f in os.listdir(ev_dir) if f.endswith(".parquet")
    )


def main():
    from qwery_spark.datagen import make_events, write_event_chunks

    tmp = tempfile.mkdtemp(prefix="qwery_bench_events_")
    try:
        events = make_events(N_EVENTS, seed=42, max_len=MAX_LEN)
        write_event_chunks(events, tmp + "/head", N_BATCHES * 2)
        head_files = _chunk_paths(tmp + "/head")

        # ---- headline replay FIRST (before the ~15-min scaling ladder
        # heats the host), instrumented like the ladder rungs: warm,
        # then 3 INTERLEAVED cycles of [MOR replay, COW replay, raw
        # control] so host drift hits every arm equally; all runs and
        # their per-epoch + compact breakdowns recorded, plus the
        # arm sequence in execution order ----
        spark = _fresh_spark(CPUS)
        _replay(spark, head_files, N_BUCKETS, N_BATCHES, tmp_dir=FAST_TMP)  # warm
        _raw_control(spark, head_files)  # warm the control arm too
        mor_runs, cow_runs, ctrl_runs, head_seq = [], [], [], []
        for _ in range(3):
            bd = {}
            t = _replay(spark, head_files, N_BUCKETS, N_BATCHES,
                        compact_at_end=True, tmp_dir=FAST_TMP, breakdown=bd)
            mor_runs.append({"sec": round(t, 3), **bd})
            head_seq.append(["mor", round(t, 3)])
            bd = {}
            t = _replay(spark, head_files, N_BUCKETS, N_BATCHES, mode="cow",
                        tmp_dir=FAST_TMP, breakdown=bd)
            cow_runs.append({"sec": round(t, 3), **bd})
            head_seq.append(["cow", round(t, 3)])
            t = _raw_control(spark, head_files)
            ctrl_runs.append(round(t, 3))
            head_seq.append(["ctrl", round(t, 3)])
        replay_sec = min(r["sec"] for r in mor_runs)
        cow_sec = min(r["sec"] for r in cow_runs)
        ctrl_sec = min(ctrl_runs)
        spark.stop()

        scaling = {}
        if DO_SCALING:
            sev = make_events(SCALING_EVENTS, seed=43, max_len=96)
            write_event_chunks(sev, tmp + "/scale", 4)
            sfiles = _chunk_paths(tmp + "/scale")
            ladder, raw, all_runs = {}, {}, {}
            # best-of-R on the headline N->4N rungs: the shared host has
            # +-30% run-to-run spread (round-1: a single recorded run landed
            # at 0.78 while repeats landed 0.88+); every run is listed so
            # the selection is auditable
            reps = {1: 3, 4: 3, 8: 2, 32: 2}
            for cpus in (1, 4, 8, 32):
                spark = _fresh_spark(cpus)
                # full-pipeline warm on one chunk: JIT/codegen compile must
                # not bias the small-core rungs
                _replay(spark, sfiles[:1], N_BUCKETS, 1, tmp_dir=FAST_TMP)
                ts = [
                    round(SCALING_EVENTS / _replay(spark, sfiles, N_BUCKETS, 4, tmp_dir=FAST_TMP), 1)
                    for _ in range(reps[cpus])
                ]
                all_runs[f"local{cpus}"] = ts
                ladder[f"local{cpus}"] = max(ts)
                tr = _raw_control(spark, sfiles)
                raw[f"local{cpus}"] = round(SCALING_EVENTS / tr, 1)
                spark.stop()
            eff = ladder["local4"] / (4 * ladder["local1"])
            raw_eff = raw["local4"] / (4 * raw["local1"])
            scaling = {
                "n_cores": 1,
                "4n_cores": 4,
                "n_events_per_sec": ladder["local1"],
                "4n_events_per_sec": ladder["local4"],
                "efficiency_n_to_4n": round(eff, 4),
                "selection": f"best_of_{reps[1]} (all runs listed)",
                "runs": all_runs,
                "ladder": ladder,
                "raw_spark_control": raw,
                "raw_efficiency_n_to_4n": round(raw_eff, 4),
                # host-normalized: engine scaling relative to what raw Spark
                # (scan->agg->write, no engine code) achieves on this host —
                # 1.0 means the engine adds zero scaling penalty
                "engine_vs_control": round(eff / raw_eff, 4) if raw_eff else None,
                "eff_8_to_32": round(ladder["local32"] / (4 * ladder["local8"]), 4),
                "raw_eff_8_to_32": round(raw["local32"] / (4 * raw["local8"]), 4),
            }
            # ---- local-cluster rung pair: N vs 4N EXECUTOR JVMs ----
            # (r2 verdict #9: the better instrument for the two-cluster-
            # size criterion — multi-process, per-executor heaps; still
            # one host, so the SMT/disk ceiling above 8 physical cores
            # applies to the 8x4 rung exactly as it does to local[32])
            # Round-4 reconciliation finding (tools/merge_ab.py session):
            # the r3 driver recording warmed each cluster rung with ONE
            # short replay and took 2 runs — but 8 separate executor
            # JVMs JIT-warm slowly, and the first full-size runs land
            # 2-3x below steady state (observed 120k->435k over 7 runs
            # at 8x4). Warm with two full-size replays and take 3 runs,
            # and record a no-engine raw control at the same rungs so
            # the efficiency has a host ceiling to be graded against.
            # Round-6: engine and control arms are INTERLEAVED per rung
            # (E,C,E,C,E,C after warming both) so a contended session
            # drags both arms together and engine_vs_control stays
            # session-comparable; the per-arm sequence is recorded.
            lc, lc_runs, lc_raw, lc_seq = {}, {}, {}, {}
            for n_exec in (2, 8):
                spark = _fresh_spark_cluster(n_exec)
                for _ in range(2):  # full-size warm: 8 JVMs JIT slowly
                    _replay(spark, sfiles, N_BUCKETS, 4, tmp_dir=FAST_TMP)
                # TWO control warms, mirroring the engine's two: the
                # separate executor JVMs JIT the control path slowly
                # too — a single warm left the first recorded ctrl run
                # 2.7x below its steady state at 8x4 (r6 session:
                # 589k -> 1579k), which inflated raw_efficiency past
                # 1.7 and poisoned engine_vs_control
                _raw_control(spark, sfiles)
                _raw_control(spark, sfiles)
                ets, cts, seq = [], [], []
                for _ in range(3):
                    e = round(SCALING_EVENTS / _replay(
                        spark, sfiles, N_BUCKETS, 4, tmp_dir=FAST_TMP), 1)
                    ets.append(e)
                    seq.append(["engine", e])
                    c = round(SCALING_EVENTS / _raw_control(spark, sfiles), 1)
                    cts.append(c)
                    seq.append(["ctrl", c])
                rung = f"execs{n_exec}x4"
                lc_runs[rung] = ets
                lc[n_exec] = max(ets)
                lc_raw[rung] = max(cts)
                lc_seq[rung] = seq
                spark.stop()
            lc_eff = round(lc[8] / (4 * lc[2]), 4)
            lc_raw_eff = round(
                lc_raw["execs8x4"] / (4 * lc_raw["execs2x4"]), 4
            )
            scaling["local_cluster"] = {
                "n_executors": 2,
                "4n_executors": 8,
                "cores_per_executor": 4,
                "n_events_per_sec": lc[2],
                "4n_events_per_sec": lc[8],
                "efficiency_n_to_4n": lc_eff,
                "runs": lc_runs,
                "interleave_sequence": lc_seq,
                "raw_spark_control": lc_raw,
                "raw_efficiency_n_to_4n": lc_raw_eff,
                "engine_vs_control": round(lc_eff / lc_raw_eff, 4)
                if lc_raw_eff else None,
                "note": "separate executor JVMs on one host; engine and "
                        "control arms interleaved E,C,E,C,E,C per rung; "
                        "the 8x4 rung spans the same SMT region as "
                        "local[32], so the raw control sets the "
                        "reachable ceiling",
            }

        spark = _fresh_spark(CPUS)
        from qwery_spark.suite import REGISTRY

        qtimes = {}
        for name in BENCH_QUERIES:
            fn = REGISTRY[name].fn
            fn(spark, SF_DIR).count()  # warm (plan + IO cache)
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            qtimes[name] = round(time.monotonic() - t0, 3)

        # ---- output: verbose detail to DETAIL lines + sidecar file,
        # compact summary as the FINAL line (the only one the driver's
        # 2000-char tail capture reliably keeps) ----
        detail = {
            "headline_selection":
                "best_of_3, arms interleaved mor,cow,ctrl x3",
            "headline_runs": {
                "mor": mor_runs, "cow": cow_runs, "ctrl": ctrl_runs,
            },
            "headline_interleave_sequence": head_seq,
            "scaling": scaling,
            # full per-query timings survive here even when the final
            # line's tail-capture guard sheds to its top-15
            "queries": qtimes,
        }
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        with open(sidecar, "w") as f:
            json.dump(detail, f, indent=1)
        print("DETAIL " + json.dumps(detail))
        out = {
            "metric": "cdc_replay_sec",
            "value": round(replay_sec, 3),
            "unit": "sec",
            "queries": qtimes,
            "sf": _SF,
            "n_events": N_EVENTS,
            "events_per_sec": round(N_EVENTS / replay_sec, 1),
            "mode": "mor+final_compact",
            "cow_replay_sec": round(cow_sec, 3),
            "cow_events_per_sec": round(N_EVENTS / cow_sec, 1),
            # contention-invariant ratios from the interleaved arms:
            # engine throughput / no-engine raw-Spark control
            # throughput on the SAME input in the SAME session
            "ctrl_events_per_sec": round(N_EVENTS / ctrl_sec, 1),
            "mor_vs_control": round(ctrl_sec / replay_sec, 4),
            "cow_vs_control": round(ctrl_sec / cow_sec, 4),
            "interleaved": "headline+local_cluster A/B",
            "detail": "BENCH_DETAIL.json",
        }
        if scaling:
            out["efficiency_n_to_4n"] = scaling["efficiency_n_to_4n"]
            out["raw_efficiency_n_to_4n"] = scaling["raw_efficiency_n_to_4n"]
            out["engine_vs_control"] = scaling["engine_vs_control"]
            out["eff_8_to_32"] = scaling["eff_8_to_32"]
            lcs = scaling["local_cluster"]
            out["lc_efficiency_n_to_4n"] = lcs["efficiency_n_to_4n"]
            out["lc_engine_vs_control"] = lcs["engine_vs_control"]
        line = json.dumps(out)
        if len(line) > 1800:  # driver tail-capture guard: shed the
            out["queries"] = {  # least-critical bulk first
                k: v for k, v in sorted(
                    out["queries"].items(), key=lambda kv: -kv[1]
                )[:15]
            }
            line = json.dumps(out)
        print(line)
        spark.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
