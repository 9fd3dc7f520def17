"""Streaming write-audit-publish: every micro-batch stages on a
branch, the audit_sql runs over the staged live state, and the window
either fast-forwards into main or is dropped wholesale into the
window-level dead-letter dir. The expectation is SIMULATED from the
data (replay_oracle over the accepted prefix at every step), so the
test holds for any seed."""

import os

import numpy as np
import pandas as pd

from qwery_spark.cdc.oracle import replay_oracle
from qwery_spark.datagen import make_events, write_event_chunks
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import TARGET_SCHEMA
from qwery_spark.streaming import run_stream

N_TOK_LIMIT = 1500  # audit invariant: no live row this long
AUDIT = f"SELECT * FROM staged WHERE n_tok >= {N_TOK_LIMIT}"


def _simulate(chunks: list[pd.DataFrame]):
    """Mirror the WAP loop in pandas: publish a chunk iff the LWW state
    of (accepted-so-far + chunk) has no live row with n_tok >= limit."""
    accepted: list[pd.DataFrame] = []
    decisions = []
    for ch in chunks:
        cand = pd.concat(accepted + [ch], ignore_index=True)
        state, _ = replay_oracle(cand)
        bad = int((state["n_tok"].fillna(0) >= N_TOK_LIMIT).sum())
        if bad:
            decisions.append(False)
        else:
            decisions.append(True)
            accepted.append(ch)
    final = (
        pd.concat(accepted, ignore_index=True)
        if accepted
        else pd.DataFrame(columns=chunks[0].columns)
    )
    return decisions, final


def _run(spark, tmp_table_dir, events, n_chunks, rejected_dir=None, ckpt="ckpt"):
    ev_dir = os.path.join(tmp_table_dir, "events")
    write_event_chunks(events, ev_dir, n_chunks)
    tpath = os.path.join(tmp_table_dir, "tbl")
    tbl = (
        LakeTable(tpath)
        if os.path.isdir(os.path.join(tpath, "_manifests"))
        else LakeTable.create(tpath, TARGET_SCHEMA, n_buckets=8)
    )
    run = run_stream(
        spark, tbl, ev_dir, os.path.join(tmp_table_dir, ckpt),
        max_files_per_trigger=1, audit_sql=AUDIT, rejected_dir=rejected_dir,
    )
    run.query.awaitTermination(300)
    return tbl, run


def test_wap_stream_rejects_bad_windows(spark, tmp_table_dir):
    # limit == max_len: only exact-max rows violate, so SOME (not all)
    # chunks carry one (verified non-degenerate below)
    events = make_events(3000, seed=23, max_len=N_TOK_LIMIT)
    pdf = events.to_pandas()
    n_chunks = 6
    per = (len(pdf) + n_chunks - 1) // n_chunks
    chunks = [pdf.iloc[i * per:(i + 1) * per] for i in range(n_chunks)]
    decisions, final = _simulate(chunks)
    assert True in decisions and False in decisions, (
        f"degenerate audit mix {decisions}; adjust seed/limit"
    )

    rej = os.path.join(tmp_table_dir, "rejected")
    tbl, run = _run(spark, tmp_table_dir, events, n_chunks, rejected_dir=rej)

    assert [w["published"] for w in sorted(run.wap, key=lambda w: w["epoch_id"])] == decisions
    # final state equals the accepted-prefix oracle, token arrays included
    exp, _ = replay_oracle(final)
    act = tbl.read(spark).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert list(act["doc_id"]) == list(exp["doc_id"])
    for a, e in zip(act["tokens"], exp["tokens"]):
        if a is None or e is None:
            assert a is None and e is None
        else:
            assert np.array_equal(np.asarray(a), np.asarray(e))

    # window-level dead letters: one epoch dir per rejected window, with
    # the window's full raw row count
    rejected_epochs = [i for i, d in enumerate(decisions) if not d]
    dirs = sorted(os.listdir(rej))
    assert len(dirs) == len(rejected_epochs)
    for i, d in zip(rejected_epochs, dirs):
        n = spark.read.parquet(os.path.join(rej, d)).count()
        assert n == len(chunks[i])

    # rejected epochs stay unapplied; published ones are recorded
    applied = tbl.snapshot().applied_epochs
    assert len(applied) == sum(decisions)
    # no stray branches left behind
    assert tbl.list_branches() == []


def test_wap_stream_restart_is_noop(spark, tmp_table_dir):
    """Crash-replay exactly-once through the WAP path: a same-checkpoint
    restart re-delivers nothing new; if Spark does re-fire a batch, the
    (run, epoch) key makes the re-stage merge-skip, the empty stage is
    dropped, and main's version/state never move."""
    events = make_events(1200, seed=31, max_len=N_TOK_LIMIT)
    tbl, run1 = _run(spark, tmp_table_dir, events, 4, ckpt="ckpt")
    v1 = tbl.snapshot().version
    a = tbl.read(spark).toPandas().sort_values("doc_id").reset_index(drop=True)

    tbl3, run3 = _run(spark, tmp_table_dir, events, 4, ckpt="ckpt")
    assert tbl3.snapshot().version == v1
    assert run3.wap == [] or all(w["skipped"] for w in run3.wap)
    b = tbl3.read(spark).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["doc_id", "n_tok"]], b[["doc_id", "n_tok"]])
    assert tbl3.list_branches() == []


def test_wap_mass_delete_guard_via_staged_changes(spark, tmp_table_dir):
    """The staged_changes view carries the WINDOW's net diff, so a
    mass-delete guard audits the delta, not the full state: windows
    whose net delete count exceeds the bound are rejected."""
    events = make_events(2400, seed=57, p_delete=0.25, max_len=64)
    pdf = events.to_pandas()
    n_chunks = 4
    per = (len(pdf) + n_chunks - 1) // n_chunks
    chunks = [pdf.iloc[i * per:(i + 1) * per] for i in range(n_chunks)]

    # simulate: net deletes of a window = keys live before, dead after
    limit = None
    accepted: list[pd.DataFrame] = []
    net_dels = []
    for ch in chunks:
        before = (
            set(replay_oracle(pd.concat(accepted, ignore_index=True))[0]["doc_id"])
            if accepted else set()
        )
        after = set(
            replay_oracle(pd.concat(accepted + [ch], ignore_index=True))[0]["doc_id"]
        )
        net_dels.append(len(before - after))
        accepted.append(ch)  # provisional: bound chosen below, then re-sim
    limit = sorted(net_dels)[len(net_dels) // 2]  # median splits the windows
    decisions, accepted = [], []
    for ch, _ in zip(chunks, net_dels):
        before = (
            set(replay_oracle(pd.concat(accepted, ignore_index=True))[0]["doc_id"])
            if accepted else set()
        )
        after = set(
            replay_oracle(pd.concat(accepted + [ch], ignore_index=True))[0]["doc_id"]
        )
        ok = len(before - after) <= limit
        decisions.append(ok)
        if ok:
            accepted.append(ch)
    assert True in decisions and False in decisions, (net_dels, limit, decisions)

    ev_dir = os.path.join(tmp_table_dir, "events")
    write_event_chunks(events, ev_dir, n_chunks)
    tbl = LakeTable.create(
        os.path.join(tmp_table_dir, "tbl"), TARGET_SCHEMA, n_buckets=8
    )
    run = run_stream(
        spark, tbl, ev_dir, os.path.join(tmp_table_dir, "ckpt"),
        max_files_per_trigger=1,
        audit_sql=(
            "SELECT 1 FROM staged_changes WHERE _change_type = 'delete' "
            f"HAVING count(*) > {limit}"
        ),
    )
    run.query.awaitTermination(300)
    assert [
        w["published"] for w in sorted(run.wap, key=lambda w: w["epoch_id"])
    ] == decisions
    exp, _ = replay_oracle(
        pd.concat(accepted, ignore_index=True)
        if accepted else chunks[0].iloc[:0]
    )
    act = tbl.read(spark).toPandas()
    assert sorted(act["doc_id"]) == sorted(exp["doc_id"])
