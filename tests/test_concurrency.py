"""Optimistic-concurrency commit protocol with automatic rebase
(Iceberg commit.retry semantics): a writer whose base snapshot went
stale auto-rebases when every interleaved winner touched disjoint
buckets — ingest and compaction daemons running concurrently both
land, no manual retry — and fails loudly (CommitConflict) when the
winner touched the buckets it replaces, never silently clobbering."""

import json
import uuid

import pytest
from pyspark.sql import functions as F

from qwery_spark.cdc.apply import apply_changes
from qwery_spark.cdc.dedup import lww_dedup
from qwery_spark.cdc.validate import split_valid
from qwery_spark.datagen import make_events
from qwery_spark.lake.merge import _stage_write, merge_changes
from qwery_spark.lake.table import CommitConflict, LakeTable
from qwery_spark.lake.xxh64 import spark_bucket
from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA


def _seeded_table(spark, path, n_events=600, write_mode="mor"):
    tbl = LakeTable.create(path, TARGET_SCHEMA, n_buckets=4, write_mode=write_mode)
    pdf = make_events(n_events, seed=91).to_pandas()
    df = spark.createDataFrame(pdf, schema=EVENT_SCHEMA)
    apply_changes(spark, tbl, df, epoch_id=0, scan_ddl=False)
    return tbl, pdf


def _bucket_of(doc_id: str, n_buckets: int = 4) -> int:
    return spark_bucket(doc_id, n_buckets)


def _stage_compaction(spark, tbl, base, buckets):
    """Stage (but do not commit) a compaction rewrite of ``buckets``
    from ``base`` — the real compact() takes its own snapshot, so the
    interleave tests drive the staging + commit steps separately."""
    df = tbl.read_physical(spark, buckets=buckets, resolve=True).withColumn(
        "_bucket", tbl.bucket_expr()
    )
    return _stage_write(
        df, tbl, base.schema_version, len(buckets), 2_000_000, stats_col="doc_id"
    )


def _append_epoch(spark, tbl, pdf, bucket_pred, epoch_id, ordinal_base=100_000):
    """A real ingest append whose keys all hash into ``bucket_pred``."""
    sel = pdf[pdf.doc_id.map(lambda d: bucket_pred(_bucket_of(d)))].copy()
    sel = sel.head(50).copy()
    assert len(sel) > 0
    sel["ordinal"] = range(ordinal_base, ordinal_base + len(sel))
    df = spark.createDataFrame(sel, schema=EVENT_SCHEMA)
    return apply_changes(spark, tbl, df, epoch_id=epoch_id, scan_ddl=False)


def test_interleaved_ingest_and_compact_both_land(spark, tmp_table_dir):
    """The verdict's scenario: a compaction daemon stages a rewrite of
    bucket 0, an ingest epoch lands first touching only buckets 1-3 —
    the compactor's stale-base commit auto-rebases and BOTH commits
    survive, with the final state identical to serial execution."""
    tbl, pdf = _seeded_table(spark, tmp_table_dir + "/t")
    base = tbl.snapshot()
    files = _stage_compaction(spark, tbl, base, {0})
    before = sorted(
        (r["doc_id"], tuple(r["tokens"])) for r in tbl.read(spark).collect()
    )

    # winner: ingest epoch appending ONLY to buckets != 0
    _append_epoch(spark, tbl, pdf, lambda b: b != 0, epoch_id=1)
    v_after_ingest = tbl.snapshot().version

    # loser: compactor commits against the stale base -> auto-rebase
    snap = tbl.commit_rewrite(
        base=base,
        new_files=files,
        replaced_buckets={0},
        epoch_id=None,
        summary={"operation": "compact", "buckets": [0]},
    )
    assert snap is not None and snap.version == v_after_ingest + 1

    # bucket 0 was untouched by the ingest, so its compacted content
    # must equal the pre-interleave resolved state for bucket 0, and
    # the ingest's updates (buckets 1-3) must all survive
    after = {r["doc_id"]: tuple(r["tokens"]) for r in tbl.read(spark).collect()}
    for doc_id, toks in before:
        if _bucket_of(doc_id) == 0:
            assert after[doc_id] == toks
    upd = pdf[pdf.doc_id.map(lambda d: _bucket_of(d) != 0)].head(50).copy()
    upd["ordinal"] = range(100_000, 100_000 + len(upd))
    winners = upd.sort_values("ordinal").groupby("doc_id").last()
    for doc_id, row in winners.iterrows():
        if row.op == "D":
            assert doc_id not in after
        else:
            assert after[doc_id] == tuple(row.tokens)


def test_interleaved_overlapping_buckets_conflict(spark, tmp_table_dir):
    """A winner that appended a delta to the bucket the loser replaces
    must fail the rebase: committing the stale rewrite would silently
    drop the winner's rows."""
    tbl, pdf = _seeded_table(spark, tmp_table_dir + "/t")
    base = tbl.snapshot()
    files = _stage_compaction(spark, tbl, base, {0})

    _append_epoch(spark, tbl, pdf, lambda b: b == 0, epoch_id=1)

    with pytest.raises(CommitConflict, match="touched replaced bucket"):
        tbl.commit_rewrite(
            base=base, new_files=files, replaced_buckets={0}, epoch_id=None
        )


def test_interleaved_rebucket_conflicts_with_everything(spark, tmp_table_dir):
    from qwery_spark.lake.merge import rebucket

    tbl, pdf = _seeded_table(spark, tmp_table_dir + "/t")
    base = tbl.snapshot()
    files = _stage_compaction(spark, tbl, base, {1})
    rebucket(spark, tbl, 8)
    with pytest.raises(CommitConflict, match="rebucket"):
        tbl.commit_rewrite(
            base=base, new_files=files, replaced_buckets={1}, epoch_id=None
        )


def test_append_rebases_over_append(spark, tmp_table_dir):
    """Two MOR ingest writers appending concurrently — even to the SAME
    buckets — both land: read-time LWW ordinal resolution makes delta
    appends commutative per key."""
    tbl, pdf = _seeded_table(spark, tmp_table_dir + "/t")
    base = tbl.snapshot()

    # writer A stages an append batch (files written, commit pending)
    sel = pdf.head(40).copy()
    sel["ordinal"] = range(200_000, 200_000 + len(sel))
    valid, _ = split_valid(
        spark.createDataFrame(sel, schema=EVENT_SCHEMA)
        .filter(F.col("op") != "DDL")
        .drop("ddl")
    )
    from qwery_spark.lake.merge import _align_batch, _user_fields

    ded = lww_dedup(valid)
    aligned = _align_batch(ded, base, "doc_id")
    is_delete = F.col("op") == "D"
    payload = [f for f in _user_fields(base) if f["name"] != "doc_id"]
    rows = aligned.select(
        F.col("doc_id"),
        *[
            F.when(is_delete, F.lit(None).cast(f["type"]))
            .otherwise(F.col(f"`{f['name']}`"))
            .alias(f["name"])
            for f in payload
        ],
        F.col("ordinal").alias("last_ordinal"),
        is_delete.alias("_deleted"),
        F.col("_bucket"),
    )
    files = _stage_write(rows, tbl, base.schema_version, 4, 2_000_000)
    touched = {f["bucket"] for f in files}

    # writer B's append lands first (same key space, same buckets)
    _append_epoch(spark, tbl, pdf, lambda b: True, epoch_id=1,
                  ordinal_base=150_000)
    v1 = tbl.snapshot().version

    snap = tbl.commit_rewrite(
        base=base, new_files=files, replaced_buckets=set(),
        append_buckets=touched, epoch_id=2,
    )
    assert snap is not None and snap.version == v1 + 1
    # writer A's ordinals (200k+) beat writer B's (150k+): A's rows win
    after = {r["doc_id"]: tuple(r["tokens"]) for r in tbl.read(spark).collect()}
    ded_rows = {r["doc_id"]: (r["op"], tuple(r["tokens"] or ()))
                for r in ded.collect()}
    for doc_id, (op, toks) in ded_rows.items():
        if op == "D":
            assert doc_id not in after
        else:
            assert after[doc_id] == toks


def test_lost_link_race_retries_and_lands(spark, tmp_table_dir, monkeypatch):
    """A competitor steals the manifest version between the head check
    and the os.link — the create-exclusive CAS fails, the retry loop
    re-reads the head, re-proves rebase safety, and lands at the next
    version."""
    tbl, pdf = _seeded_table(spark, tmp_table_dir + "/t")
    base = tbl.snapshot()
    files = _stage_compaction(spark, tbl, base, {0})

    orig = tbl._commit_record
    state = {"stolen": False}

    def flaky(rec, folded):
        if not state["stolen"]:
            state["stolen"] = True
            competitor = {
                "version": rec["version"],
                "parent": base.snapshot_id,
                "snapshot_id": uuid.uuid4().hex,
                "epoch_id": None,
                "replace_buckets": [],
                "append_buckets": [2],
                "add_files": [],
                "summary": {"operation": "competitor"},
            }
            tbl._write_manifest(competitor)
        return orig(rec, folded)

    monkeypatch.setattr(tbl, "_commit_record", flaky)
    snap = tbl.commit_rewrite(
        base=base, new_files=files, replaced_buckets={0}, epoch_id=None
    )
    assert snap is not None
    # competitor took base+1; the retried commit landed at base+2
    assert snap.version == base.version + 2
    assert json.load(open(tbl._manifest_path(base.version + 1)))["summary"][
        "operation"
    ] == "competitor"


def test_merge_changes_retry_is_transparent_at_api_level(spark, tmp_table_dir):
    """High-level API: merge_changes captures its base snapshot at
    entry; a commit landing mid-merge on disjoint buckets must not
    surface any error to the caller."""
    tbl, pdf = _seeded_table(spark, tmp_table_dir + "/t", write_mode="cow")
    # batch touching only bucket 3
    sel = pdf[pdf.doc_id.map(lambda d: _bucket_of(d) == 3)].head(20).copy()
    sel["ordinal"] = range(300_000, 300_000 + len(sel))
    valid, _ = split_valid(
        spark.createDataFrame(sel, schema=EVENT_SCHEMA)
        .filter(F.col("op") != "DDL")
        .drop("ddl")
    )

    # interleave: another writer commits to bucket 1 while our batch's
    # snapshot is already captured inside merge_changes — emulate by
    # committing right before; merge_changes then reads a head that
    # moves no further, plus a second merge whose base went stale
    base = tbl.snapshot()
    _append_epoch(spark, tbl, pdf, lambda b: b == 1, epoch_id=7,
                  ordinal_base=250_000)
    # monkey-free staleness: call commit path through merge_changes with
    # a table object whose snapshot was cached pre-interleave
    stats = merge_changes(spark, tbl, lww_dedup(valid), epoch_id=8)
    assert stats.rows_upserted + stats.rows_deleted > 0
    assert tbl.snapshot().version == base.version + 2


def test_manifest_create_exclusive(tmp_table_dir):
    """Two writers racing to the same manifest version: second loses
    (os.link create-exclusive), and the loser's tmp file is cleaned."""
    import os

    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2)
    snap = tbl.snapshot()
    m = dict(snap.m)
    m["version"] = snap.version + 1
    tbl._write_manifest(dict(m))
    with pytest.raises(FileExistsError):
        tbl._write_manifest(dict(m))
    mdir = tbl._mdir()
    assert not [f for f in os.listdir(mdir) if ".tmp-" in f]


def test_concurrent_schema_changes_conflict(spark, tmp_table_dir):
    tbl, pdf = _seeded_table(spark, tmp_table_dir + "/t")
    base_fields = [dict(f) for f in tbl.snapshot().fields()]
    # winner: adds a column
    tbl.add_column("lang", "string")
    # loser computed its field list from the pre-DDL schema; data
    # commits in between would be fine, a schema race is not
    import copy

    stale_fields = copy.deepcopy(base_fields)
    stale_fields.append({"id": 99, "name": "other", "type": "string"})
    base = tbl.snapshot()

    # no interleave since capture -> succeeds
    tbl.commit_schema_change(stale_fields, {"operation": "test"})

    # now force an interleaved schema change between capture and commit
    base2 = tbl.snapshot()

    orig = tbl._commit_record
    state = {"stolen": False}

    def flaky(rec, folded):
        if not state["stolen"]:
            state["stolen"] = True
            competitor = {
                "version": rec["version"],
                "parent": base2.snapshot_id,
                "snapshot_id": uuid.uuid4().hex,
                "epoch_id": None,
                "schema_change": {
                    "schema_version": base2.schema_version + 1,
                    "fields": stale_fields,
                },
                "summary": {"operation": "competitor-ddl"},
            }
            tbl._write_manifest(competitor)
        return orig(rec, folded)

    import pytest as _pytest

    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(tbl, "_commit_record", flaky)
        with pytest.raises(CommitConflict, match="also changed the schema"):
            tbl.commit_schema_change(stale_fields, {"operation": "loser-ddl"})
