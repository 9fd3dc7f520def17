"""Delta-log manifest: commit metadata cost is O(touched buckets), flat
across epochs — never O(table files). (Round-1 verdict item #3: the old
design rewrote the full live-file list per commit, the known scale
ceiling at 10^10 events / thousands of epochs.)

Pure-metadata tests: commit_rewrite / snapshot / expire / vacuum touch
no Spark, so 100 epochs run in milliseconds.
"""

import json
import os

import pytest

from qwery_spark.lake.table import CKPT_EVERY, LakeTable
from qwery_spark.schema import TARGET_SCHEMA

N_BUCKETS = 8
N_EPOCHS = 100


def _fake_files(epoch: int, buckets=range(N_BUCKETS)):
    return [
        {
            "path": f"data/snap-{epoch:04d}/_bucket={b}/part-0.parquet",
            "bucket": b,
            "schema_version": 0,
        }
        for b in buckets
    ]


@pytest.fixture()
def logged_table(tmp_path):
    tbl = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=N_BUCKETS,
                           write_mode="mor")
    for e in range(N_EPOCHS):
        tbl.commit_rewrite(
            base=tbl.snapshot(),
            new_files=_fake_files(e),
            replaced_buckets=set(),
            append_buckets=set(range(N_BUCKETS)),
            epoch_id=e,
            summary={"operation": "append-delta", "epoch_id": e},
        )
    return tbl


def test_commit_bytes_flat_across_100_epochs(logged_table):
    """The record for epoch 99 must not be bigger than the record for
    epoch 5: per-commit bytes depend on touched buckets, not table size."""
    sizes = [
        os.path.getsize(logged_table._manifest_path(v)) for v in range(1, N_EPOCHS + 1)
    ]
    assert sizes[-1] <= 1.2 * sizes[4]
    # and the table really accumulated O(epochs * buckets) live files
    assert len(logged_table.snapshot().files()) == N_EPOCHS * N_BUCKETS
    # while the newest delta record lists only its own files
    with open(logged_table._manifest_path(N_EPOCHS)) as fh:
        rec = json.load(fh)
    assert "files" not in rec
    assert len(rec["add_files"]) == N_BUCKETS


def test_checkpoints_written_on_cadence(logged_table):
    for v in range(CKPT_EVERY, N_EPOCHS + 1, CKPT_EVERY):
        assert os.path.exists(logged_table._ckpt_path(v)), f"missing ckpt at v{v}"


def test_time_travel_replays_log(logged_table):
    mid = 50
    snap = logged_table.snapshot(mid)
    assert snap.version == mid
    assert len(snap.files()) == mid * N_BUCKETS
    assert snap.applied_epochs == set(range(mid))


def test_cold_read_no_cache(logged_table):
    """A fresh process (empty state cache) must rebuild the head from
    checkpoint + tail deltas."""
    from qwery_spark.lake import table as table_mod

    table_mod._STATE_CACHE.clear()
    tbl2 = LakeTable(logged_table.path)
    snap = tbl2.snapshot()
    assert snap.version == N_EPOCHS
    assert len(snap.files()) == N_EPOCHS * N_BUCKETS
    assert set(range(N_EPOCHS)) <= snap.applied_epochs


def test_epoch_idempotent_after_log_replay(logged_table):
    assert (
        logged_table.commit_rewrite(
            base=logged_table.snapshot(),
            new_files=_fake_files(12),
            replaced_buckets=set(),
            epoch_id=12,  # already applied
        )
        is None
    )


def test_expire_keeps_oldest_reconstructable(logged_table):
    from qwery_spark.lake import table as table_mod

    removed = logged_table.expire_snapshots(keep_last=5)
    assert removed == N_EPOCHS + 1 - 5  # v0..v95 dropped
    table_mod._STATE_CACHE.clear()
    oldest = N_EPOCHS - 4
    snap = logged_table.snapshot(oldest)  # needs the materialized ckpt
    assert len(snap.files()) == oldest * N_BUCKETS
    assert logged_table.snapshot().version == N_EPOCHS


def test_compaction_resets_live_file_count(logged_table):
    """A compact-style commit (replace all buckets) folds the log's
    accumulated files back to one per bucket."""
    logged_table.commit_rewrite(
        base=logged_table.snapshot(),
        new_files=_fake_files(9999),
        replaced_buckets=set(range(N_BUCKETS)),
        epoch_id=None,
        summary={"operation": "compact"},
    )
    snap = logged_table.snapshot()
    assert len(snap.files()) == N_BUCKETS
    assert snap.unresolved_buckets == set()


def test_fold_equals_full_recompute_random_sequences(tmp_path):
    """Property: for a random mix of append / rewrite / schema commits,
    the incrementally folded head equals a cold log replay, and every
    historical version stays reconstructable."""
    import random

    from qwery_spark.lake import table as table_mod

    rng = random.Random(7)
    tbl = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4,
                           write_mode="mor")
    for e in range(60):
        kind = rng.choice(["append", "rewrite", "schema"])
        if kind == "schema":
            tbl.add_column(f"c{e}", "string")
        else:
            buckets = set(rng.sample(range(4), rng.randint(1, 4)))
            tbl.commit_rewrite(
                base=tbl.snapshot(),
                new_files=_fake_files(e, sorted(buckets)),
                replaced_buckets=buckets if kind == "rewrite" else set(),
                append_buckets=buckets if kind == "append" else None,
                epoch_id=e,
                summary={"operation": kind},
            )
    warm = tbl.snapshot().m
    table_mod._STATE_CACHE.clear()
    cold = LakeTable(tbl.path).snapshot().m
    assert warm == cold
    # spot-check historical reconstruction at a few versions
    for v in (1, 17, 33, 59):
        table_mod._STATE_CACHE.clear()
        assert LakeTable(tbl.path).snapshot(v).version == v


def test_recreated_path_does_not_serve_stale_cache(tmp_path):
    """rmtree + create at the same path must yield the fresh table, not
    the previous table's cached folded state."""
    import shutil

    p = str(tmp_path / "t")
    tbl = LakeTable.create(p, TARGET_SCHEMA, n_buckets=2)
    tbl.commit_rewrite(base=tbl.snapshot(), new_files=_fake_files(0, [0]),
                       replaced_buckets=set(), epoch_id=0)
    assert len(tbl.snapshot().files()) == 1  # cache primed at v1
    shutil.rmtree(p)
    tbl2 = LakeTable.create(p, TARGET_SCHEMA, n_buckets=2)
    snap = tbl2.snapshot()
    assert snap.version == 0 and snap.files() == []
