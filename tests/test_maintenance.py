"""State-driven compaction policy (lake/maintenance.py): triggers
exactly at the manifest threshold, is skew-aware (hot buckets compact,
cold buckets are never rewritten), and bounds per-bucket file count —
the MOR read-amplification metric — over a long ingest tail."""

from collections import Counter

from pyspark.sql import functions as F

from qwery_spark.lake.maintenance import CompactionPolicy, maybe_compact
from qwery_spark.lake.merge import append_changes
from qwery_spark.lake.table import LakeTable
from qwery_spark.lake.xxh64 import spark_bucket
from qwery_spark.schema import TARGET_SCHEMA


def _doc_for_bucket(bucket: int, n_buckets: int, salt: int = 0) -> str:
    i = salt
    while True:
        d = f"doc-{bucket}-{i}"
        if spark_bucket(d, n_buckets) == bucket:
            return d
        i += 1


def _append_one(spark, tbl, doc_id, ordinal):
    df = spark.createDataFrame(
        [(doc_id, [1, 2], 2, "web", "U", ordinal)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "op string, ordinal long",
    )
    append_changes(spark, tbl, df)


def _files_per_bucket(tbl):
    return Counter(f["bucket"] for f in tbl.snapshot().files())


def test_policy_triggers_exactly_at_threshold(spark, tmp_table_dir):
    n_buckets = 4
    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=n_buckets, write_mode="mor"
    )
    policy = CompactionPolicy(max_files_per_bucket=3)
    hot = _doc_for_bucket(1, n_buckets)
    # 3 appends -> bucket 1 has exactly 3 files: NOT due
    for i in range(3):
        _append_one(spark, tbl, hot, 100 + i)
        rep = maybe_compact(spark, tbl, policy)
        assert not rep.triggered, f"fired early at {i + 1} files"
    assert _files_per_bucket(tbl)[1] == 3
    # the 4th crosses the bound -> due, compacts back to 1 file
    _append_one(spark, tbl, hot, 200)
    rep = maybe_compact(spark, tbl, policy)
    assert rep.triggered and rep.due_buckets == {1}
    assert _files_per_bucket(tbl)[1] == 1


def test_policy_is_skew_aware(spark, tmp_table_dir):
    """Hot bucket compacts; the cold bucket's single file is never
    rewritten (a fixed epoch cadence would have rewritten everything)."""
    n_buckets = 4
    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=n_buckets, write_mode="mor"
    )
    cold = _doc_for_bucket(0, n_buckets)
    _append_one(spark, tbl, cold, 1)
    cold_file = [f for f in tbl.snapshot().files() if f["bucket"] == 0]
    hot = _doc_for_bucket(2, n_buckets)
    policy = CompactionPolicy(max_files_per_bucket=2)
    for i in range(6):
        _append_one(spark, tbl, hot, 100 + i)
        maybe_compact(spark, tbl, policy)
    # cold bucket file entry byte-identical: untouched across all ticks
    assert [f for f in tbl.snapshot().files() if f["bucket"] == 0] == cold_file
    assert _files_per_bucket(tbl)[2] <= policy.max_files_per_bucket


def test_long_tail_read_amplification_is_bounded(spark, tmp_table_dir):
    """20-epoch skewed tail with a per-epoch policy tick: no bucket ever
    exceeds threshold+1 files (the one new delta that trips the next
    tick), while the unmaintained control grows linearly."""
    n_buckets = 4
    bound = 3
    policy = CompactionPolicy(max_files_per_bucket=bound)
    maintained = LakeTable.create(
        tmp_table_dir + "/m", TARGET_SCHEMA, n_buckets=n_buckets, write_mode="mor"
    )
    control = LakeTable.create(
        tmp_table_dir + "/c", TARGET_SCHEMA, n_buckets=n_buckets, write_mode="mor"
    )
    hot = _doc_for_bucket(3, n_buckets)
    worst = 0
    for e in range(20):
        _append_one(spark, maintained, hot, 1000 + e)
        _append_one(spark, control, hot, 1000 + e)
        worst = max(worst, _files_per_bucket(maintained)[3])
        maybe_compact(spark, maintained, policy)
    assert worst <= bound + 1
    assert _files_per_bucket(control)[3] == 20  # unmaintained: linear
    # state identical either way
    m = maintained.read(spark).collect()
    c = control.read(spark).collect()
    assert sorted(map(tuple, m)) == sorted(map(tuple, c))


def test_policy_noop_on_cow_and_min_due_batching(spark, tmp_table_dir):
    tbl = LakeTable.create(
        tmp_table_dir + "/cow", TARGET_SCHEMA, n_buckets=2, write_mode="cow"
    )
    # threshold 1 would trigger on any MOR table with >1 file per
    # bucket — on a COW table the tick must still no-op entirely
    rep = maybe_compact(spark, tbl, CompactionPolicy(max_files_per_bucket=1))
    assert not rep.triggered
    # min_due_buckets=2 defers a single-bucket trigger
    mor = LakeTable.create(
        tmp_table_dir + "/mor", TARGET_SCHEMA, n_buckets=4, write_mode="mor"
    )
    hot = _doc_for_bucket(1, 4)
    for i in range(4):
        _append_one(spark, mor, hot, i)
    rep = maybe_compact(
        spark, mor, CompactionPolicy(max_files_per_bucket=2, min_due_buckets=2)
    )
    assert not rep.triggered and rep.due_buckets == {1}
    rep = maybe_compact(
        spark, mor, CompactionPolicy(max_files_per_bucket=2, min_due_buckets=1)
    )
    assert rep.triggered


def test_run_stream_with_policy(spark, tmp_path):
    """Policy wired into the streaming ingest loop: per-epoch ticks keep
    the table bounded and report through StreamRun.maintenance."""
    import shutil

    from qwery_spark.datagen import make_events, write_event_chunks
    from qwery_spark.streaming.stream import run_stream

    ev = make_events(2000, seed=5)
    write_event_chunks(ev, str(tmp_path / "events"), 8)
    tbl = LakeTable.create(
        str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4, write_mode="mor"
    )
    run = run_stream(
        spark,
        tbl,
        str(tmp_path / "events"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        compaction_policy=CompactionPolicy(max_files_per_bucket=2),
    )
    run.query.awaitTermination()
    assert len(run.maintenance) == 8  # one tick per epoch
    assert any(r.triggered for r in run.maintenance)
    assert max(_files_per_bucket(tbl).values()) <= 3
    shutil.rmtree(str(tmp_path / "events"), ignore_errors=True)


def test_vacuum_grace_protects_fresh_orphans(spark, tmp_table_dir):
    """vacuum(grace_sec) must not delete a freshly staged (possibly
    commit-in-flight) parquet file; with grace elapsed it is removed."""
    import os
    import time

    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    _append_one(spark, tbl, _doc_for_bucket(0, 2), 1)
    # simulate another writer's staged-but-uncommitted file
    orphan = os.path.join(tbl.path, "data", "snap-inflight", "_bucket=0")
    os.makedirs(orphan)
    staged = os.path.join(orphan, "part-zzz.snappy.parquet")
    open(staged, "wb").write(b"x")
    assert tbl.vacuum(grace_sec=3600) == 0  # fresh: protected
    assert os.path.exists(staged)
    old = time.time() - 7200
    os.utime(staged, (old, old))
    assert tbl.vacuum(grace_sec=3600) == 1  # aged out: reclaimed
    assert not os.path.exists(staged)


def test_mor_replica_accumulates_deltas_and_policy_bounds_them(
    spark, tmp_table_dir
):
    """replicate() into a MOR replica appends deltas (so the follower's
    --auto-compact-files policy has something to bound); a COW replica
    keeps the merge path."""
    from qwery_spark.lake.changes import replicate

    src = LakeTable.create(
        tmp_table_dir + "/src", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    hot = _doc_for_bucket(1, 2)
    for e in range(5):
        _append_one(spark, src, hot, 10 + e)
    dst = LakeTable.create(
        tmp_table_dir + "/dst", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    lo = 0
    for e in range(5):
        hi = lo + 1
        replicate(spark, src, dst, lo, hi, epoch_id=f"w{hi}")
        lo = hi
    # five windows -> five delta files on the hot bucket
    assert _files_per_bucket(dst)[1] == 5
    rep = maybe_compact(spark, dst, CompactionPolicy(max_files_per_bucket=3))
    assert rep.triggered
    assert _files_per_bucket(dst)[1] == 1
    # state still equals source
    assert sorted(map(tuple, dst.read(spark).collect())) == sorted(
        map(tuple, src.read(spark).collect())
    )


def test_policy_applies_clustering_on_trigger(spark, tmp_table_dir):
    """A policy with sort_cols restores the sort order on every
    triggered compaction — per-file key bounds come out disjoint."""
    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=1, write_mode="mor"
    )
    for i in range(8):
        _append_one(spark, tbl, f"doc-{i:03d}", 100 + i)
    rep = maybe_compact(
        spark, tbl,
        CompactionPolicy(max_files_per_bucket=3, sort_cols=["doc_id"],
                         max_records_per_file=2),
    )
    assert rep.triggered
    files = tbl.snapshot().files()
    assert len(files) >= 3  # small max_records_per_file: a REAL multi-
    # file layout, so the disjointness loop below actually executes
    assert all("key_min" in f for f in files)
    spans = sorted((f["key_min"], f["key_max"]) for f in files)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi <= b_lo  # sorted rewrite: non-overlapping key ranges


def test_policy_rejects_bad_clustering_specs(spark, tmp_table_dir):
    import pytest

    with pytest.raises(ValueError, match="exclusive"):
        CompactionPolicy(sort_cols=["a"], zorder_cols=["b"])
    with pytest.raises(ValueError, match="max_files_per_bucket"):
        CompactionPolicy(max_files_per_bucket=0)
    # a non-numeric zorder column surfaces on the FIRST tick, before
    # any threshold is crossed
    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    with pytest.raises(ValueError, match="numeric"):
        maybe_compact(
            spark, tbl, CompactionPolicy(zorder_cols=["source"])
        )


def test_zorder_validator_exact_base_types():
    """startswith('int') would wrongly accept 'interval day to second';
    the shared validator matches exact base types (decimal(10,2) OK)."""
    import pytest

    from qwery_spark.lake.merge import validate_zorder_cols

    class FakeSnap:
        def fields(self):
            return [
                {"name": "iv", "type": "interval day to second"},
                {"name": "d", "type": "decimal(10,2)"},
                {"name": "n", "type": "bigint"},
                {"name": "s", "type": "string"},
            ]

    snap = FakeSnap()
    validate_zorder_cols(snap, ["d", "n"], "t")  # numerics pass
    with pytest.raises(ValueError, match=r"\['iv'\]"):
        validate_zorder_cols(snap, ["iv"], "t")
    with pytest.raises(ValueError, match=r"\['s'\]"):
        validate_zorder_cols(snap, ["s", "n"], "t")
    with pytest.raises(ValueError, match="missing"):
        validate_zorder_cols(snap, ["missing"], "t")


def test_policy_tick_survives_commit_conflict(spark, tmp_table_dir, monkeypatch):
    """A policy daemon beside a live writer loses the commit race on a
    hot bucket: the tick must report conflict=True and return, NOT
    propagate CommitConflict out of the loop."""
    from qwery_spark.lake import merge as merge_mod
    from qwery_spark.lake.table import CommitConflict

    n_buckets = 2
    tbl = LakeTable.create(
        tmp_table_dir + "/c", TARGET_SCHEMA, n_buckets=n_buckets,
        write_mode="mor",
    )
    d = _doc_for_bucket(0, n_buckets)
    for i in range(4):
        _append_one(spark, tbl, d, i)

    def conflicted(*a, **k):
        raise CommitConflict("concurrent overlapping commit (simulated)")

    monkeypatch.setattr(merge_mod, "compact", conflicted)
    policy = CompactionPolicy(max_files_per_bucket=2)
    rep = maybe_compact(spark, tbl, policy)
    assert rep.conflict and not rep.triggered
    assert rep.due_buckets == {0}
    assert rep.files_after == rep.files_before  # nothing committed
    # next tick (no conflict) retries and succeeds against the new head
    monkeypatch.undo()
    rep2 = maybe_compact(spark, tbl, policy)
    assert rep2.triggered and not rep2.conflict
    assert max(_files_per_bucket(tbl).values()) <= 2


def test_cluster_cadence_triggers_and_resets(spark, tmp_table_dir):
    """cluster_every_commits: a full sorted rewrite fires after N data
    commits since the last full matching clustering, then the marker
    resets the cadence; the file-count trigger alone must not fire."""
    n_buckets = 2
    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=n_buckets,
        write_mode="mor",
    )
    policy = CompactionPolicy(
        max_files_per_bucket=50,  # file-count trigger effectively off
        sort_cols=["doc_id"],
        cluster_every_commits=3,
    )
    docs = [_doc_for_bucket(b, n_buckets, salt=s)
            for b in (0, 1) for s in (0, 1)]
    # 2 data commits: not due
    for i in range(2):
        _append_one(spark, tbl, docs[i], 100 + i)
        rep = maybe_compact(spark, tbl, policy)
        assert not rep.triggered and not rep.clustered, f"early at {i+1}"
    # 3rd data commit crosses the cadence -> full clustered rewrite
    _append_one(spark, tbl, docs[2], 200)
    rep = maybe_compact(spark, tbl, policy)
    assert rep.triggered and rep.clustered
    summary = tbl.snapshot().m["summary"]
    assert summary["operation"] == "compact"
    assert summary["sort_cols"] == ["doc_id"]
    assert len(summary["buckets"]) == n_buckets  # FULL rewrite
    # marker planted: the very next tick is a no-op...
    rep = maybe_compact(spark, tbl, policy)
    assert not rep.triggered and not rep.clustered
    # ...and the cadence needs 3 fresh data commits to fire again
    for i in range(2):
        _append_one(spark, tbl, docs[i], 300 + i)
        assert not maybe_compact(spark, tbl, policy).clustered
    _append_one(spark, tbl, docs[3], 400)
    assert maybe_compact(spark, tbl, policy).clustered


def test_cluster_cadence_marker_rules(spark, tmp_table_dir):
    """A partial sorted compact does NOT reset the cadence; a full
    rewrite with different clustering voids the old marker."""
    from qwery_spark.lake.merge import compact

    n_buckets = 2
    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=n_buckets,
        write_mode="mor",
    )
    policy = CompactionPolicy(
        max_files_per_bucket=50, sort_cols=["doc_id"],
        cluster_every_commits=3,
    )
    d0 = _doc_for_bucket(0, n_buckets)
    d1 = _doc_for_bucket(1, n_buckets)
    for i, d in enumerate((d0, d1, d0)):
        _append_one(spark, tbl, d, 100 + i)
    # full matching marker
    assert maybe_compact(spark, tbl, policy).clustered
    # 3 more data commits, then a PARTIAL sorted compact of one bucket:
    # not a marker — the cadence must still be due
    for i, d in enumerate((d0, d1, d0)):
        _append_one(spark, tbl, d, 200 + i)
    compact(spark, tbl, buckets={0}, sort_cols=["doc_id"])
    assert policy.cluster_due(tbl, tbl.snapshot())
    assert maybe_compact(spark, tbl, policy).clustered
    # a full UNSORTED rewrite destroys the ordering: due immediately
    compact(spark, tbl, buckets=set(range(n_buckets)))
    assert policy.cluster_due(tbl, tbl.snapshot())


def test_cluster_cadence_requires_clustering_spec():
    import pytest

    with pytest.raises(ValueError, match="cluster_every_commits"):
        CompactionPolicy(cluster_every_commits=4)
    with pytest.raises(ValueError, match="cluster_every_commits"):
        CompactionPolicy(cluster_every_commits=0, sort_cols=["doc_id"])


def test_expire_older_than_keeps_young_commits(spark, tmp_table_dir):
    """OLDER THAN retention (Iceberg expire older_than): every commit
    is ts-stamped at write; keep_last=1 + a large older_than drops
    nothing (all commits are young), older_than=0 drops everything the
    count rule allows; an artificially backdated prefix is dropped
    while the young suffix survives — and the age walk stops at the
    first young record even if an OLDER one follows (prefix invariant
    across clock skew)."""
    import json
    import os
    import time

    from pyspark.sql import types as T

    from qwery_spark.lake.merge import merge_changes
    from qwery_spark.lake.table import LakeTable

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("v", T.IntegerType()),
    ])
    t = LakeTable.create(tmp_table_dir + "/t", schema, n_buckets=2, write_mode="mor")

    def batch(rows):
        return spark.createDataFrame(rows, "doc_id string, op string, ordinal long, v int")

    for i in range(5):
        merge_changes(spark, t, batch([(f"k{i}", "U", i + 1, i)]), epoch_id=i)

    # all commits stamped with a recent wall clock
    with open(t._manifest_path(3)) as fh:
        ts = json.load(fh).get("ts")
    assert ts is not None and abs(time.time() - ts) < 3600

    assert t.expire_snapshots(keep_last=1, older_than_sec=86400) == 0

    # backdate v0..v2 (simulate week-old commits); v3 stays young
    for v in (0, 1, 2):
        p = t._manifest_path(v)
        with open(p) as fh:
            rec = json.load(fh)
        rec["ts"] = time.time() - 7 * 86400
        os.unlink(p)
        with open(p, "w") as fh:
            json.dump(rec, fh)
    # v4 backdated too — but the walk must STOP at young v3, so v4
    # survives (contiguous-prefix invariant)
    p4 = t._manifest_path(4)
    with open(p4) as fh:
        rec4 = json.load(fh)
    rec4["ts"] = time.time() - 7 * 86400
    os.unlink(p4)
    with open(p4, "w") as fh:
        json.dump(rec4, fh)

    assert t.expire_snapshots(keep_last=1, older_than_sec=3 * 86400) == 3  # v0..v2
    assert t.earliest_version() == 3
    # state is intact and readable at the floor
    assert t.read(spark).count() == 5

    # age-less pure count retention still works on the survivor log
    assert t.expire_snapshots(keep_last=1) == 2
    assert t.earliest_version() == t.current_version()


def test_show_snapshots_committed_at(spark, tmp_table_dir):
    import time

    from pyspark.sql import types as T

    from qwery_spark.compiler.engine import ScriptEngine
    from qwery_spark.lake.table import LakeTable

    schema = T.StructType([T.StructField("doc_id", T.StringType())])
    LakeTable.create(tmp_table_dir + "/t", schema, n_buckets=2)
    rows = ScriptEngine(spark).execute(
        f"SHOW SNAPSHOTS '{tmp_table_dir}/t'"
    ).collect()
    assert rows[0]["committed_at"] is not None
    assert abs(time.time() - rows[0]["committed_at"]) < 3600
