"""Changelog (CDC-out) semantics: read_changes must emit exactly the
visible-state transitions between two snapshot versions — inserts,
update postimages, deletes with preimage payload — and nothing for
stale drops, tombstone re-deletes, deletes of absent keys, untouched
rows, or state-preserving commits (compaction)."""

import pandas as pd
import pytest

from qwery_spark.cdc.apply import apply_changes
from qwery_spark.lake.changes import read_changes
from qwery_spark.lake.merge import compact
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA


def _hand_events(rows):
    cols = ["ordinal", "op", "doc_id", "tokens", "n_tok", "source", "ddl"]
    return pd.DataFrame(rows, columns=cols)


def _apply(spark, tbl, rows, epoch):
    df = spark.createDataFrame(_hand_events(rows), schema=EVENT_SCHEMA)
    apply_changes(spark, tbl, df, epoch_id=epoch, collect_stats=False)


def _feed(spark, tbl, lo, hi=None):
    rows = read_changes(spark, tbl, lo, hi).collect()
    return {
        (r["doc_id"], r["_commit_version"]): (
            r["_change_type"],
            r["_ordinal"],
            None if r["tokens"] is None else list(r["tokens"]),
        )
        for r in rows
    }, rows


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_change_feed_transitions(spark, tmp_table_dir, mode):
    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=4, write_mode=mode
    )
    # v1: three inserts
    _apply(spark, tbl, [
        (1, "I", "a", [1], 1, "web", None),
        (2, "I", "b", [2], 1, "web", None),
        (3, "I", "c", [3], 1, "web", None),
    ], 0)
    # v2: update a, delete b, stale straggler on c, delete absent key d
    _apply(spark, tbl, [
        (10, "U", "a", [1, 1], 2, "web", None),
        (11, "D", "b", None, None, "web", None),
        (2, "U", "c", [9], 1, "web", None),   # stale: ordinal 2 < 3
        (12, "D", "d", None, None, "web", None),  # delete of absent key
    ], 1)
    # v3: re-delete b (tombstone on tombstone), reinsert d
    _apply(spark, tbl, [
        (20, "D", "b", None, None, "web", None),
        (21, "I", "d", [4, 4], 2, "code", None),
    ], 2)

    feed, rows = _feed(spark, tbl, 0, 3)
    assert feed == {
        ("a", 1): ("insert", 1, [1]),
        ("b", 1): ("insert", 2, [2]),
        ("c", 1): ("insert", 3, [3]),
        ("a", 2): ("update_postimage", 10, [1, 1]),
        ("b", 2): ("delete", 11, [2]),  # preimage payload, delete ordinal
        ("d", 3): ("insert", 21, [4, 4]),
    }
    # the (from, to] window restricts correctly
    sub, _ = _feed(spark, tbl, 1, 2)
    assert set(sub) == {("a", 2), ("b", 2)}

    # compaction commits are state-preserving: no change rows, and the
    # pre-compaction diffs still read their pinned snapshots correctly
    compact(spark, tbl)
    v = tbl.current_version()
    assert read_changes(spark, tbl, 3, v).count() == 0
    again, _ = _feed(spark, tbl, 0, 3)
    assert again == feed


def test_change_feed_empty_range_schema(spark, tmp_table_dir):
    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2)
    df = read_changes(spark, tbl, 0, 0)
    assert df.count() == 0
    assert {"_change_type", "_commit_version", "_ordinal", "doc_id"} <= set(
        df.columns
    )
    with pytest.raises(ValueError):
        read_changes(spark, tbl, 1, 0)


def test_change_feed_across_schema_evolution(spark, tmp_table_dir):
    """A DDL commit inside the range is skipped scan-free; rows from
    commits before the DDL null-fill the added column."""
    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2)
    _apply(spark, tbl, [(1, "I", "a", [1], 1, "web", None)], 0)       # v1
    tbl.add_column("quality", "double")                                # v2 (ddl)
    _apply(spark, tbl, [(2, "U", "a", [1, 2], 2, "web", None)], 1)     # v3
    rows = read_changes(spark, tbl, 0, 3).collect()
    by_v = {r["_commit_version"]: r for r in rows}
    assert set(by_v) == {1, 3}
    assert by_v[1]["quality"] is None
    assert by_v[1]["_change_type"] == "insert"
    assert by_v[3]["_change_type"] == "update_postimage"


def test_replication_via_change_feed(spark, tmp_table_dir):
    """A replica fed ONLY change rows must converge to the source state
    — incrementally per epoch AND as one full-range catch-up."""
    import numpy as np

    from qwery_spark.datagen import make_events
    from qwery_spark.lake.changes import replicate

    src = LakeTable.create(tmp_table_dir + "/src", TARGET_SCHEMA, n_buckets=4)
    inc = LakeTable.create(tmp_table_dir + "/inc", TARGET_SCHEMA, n_buckets=8)
    events = make_events(3000, seed=23).to_pandas()
    synced = 0
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000), (2000, 3000)]):
        df = spark.createDataFrame(events.iloc[lo:hi], schema=EVENT_SCHEMA)
        apply_changes(spark, src, df, epoch_id=i, collect_stats=False)
        head = src.current_version()
        replicate(spark, src, inc, synced, head, epoch_id=i)
        synced = head

    def state(tbl):
        return {
            (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
            for r in tbl.read(spark).collect()
        }

    assert state(inc) == state(src)

    # one-shot catch-up from scratch (different bucket count on purpose)
    full = LakeTable.create(tmp_table_dir + "/full", TARGET_SCHEMA, n_buckets=2)
    replicate(spark, src, full)
    assert state(full) == state(src)


def test_coarse_feed_matches_lww_reduced_granular(spark, tmp_table_dir):
    """granular=False must equal the net endpoint diff: same keys/types
    as the LWW-reduction of the granular feed, minus keys that appeared
    and vanished entirely inside the range."""
    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=4)
    _apply(spark, tbl, [
        (1, "I", "a", [1], 1, "web", None),
        (2, "I", "b", [2], 1, "web", None),
    ], 0)
    _apply(spark, tbl, [
        (10, "U", "a", [1, 1], 2, "web", None),   # a updated twice in range
        (11, "I", "c", [3], 1, "web", None),      # c inserted then deleted
        (12, "D", "b", None, None, "web", None),
    ], 1)
    _apply(spark, tbl, [
        (20, "U", "a", [1, 1, 1], 3, "web", None),
        (21, "D", "c", None, None, "web", None),
    ], 2)
    coarse = {
        r["doc_id"]: (r["_change_type"], r["_ordinal"], r["_commit_version"])
        for r in read_changes(spark, tbl, 1, 3, granular=False).collect()
    }
    # vs v1: a net-updated (latest ordinal), b deleted, c invisible
    assert coarse == {
        "a": ("update_postimage", 20, 3),
        "b": ("delete", 12, 3),
    }
    # granular over the same range sees the intermediate 'a' update + c
    granular_keys = {
        (r["doc_id"], r["_commit_version"])
        for r in read_changes(spark, tbl, 1, 3).collect()
    }
    assert granular_keys == {("a", 2), ("c", 2), ("b", 2), ("a", 3), ("c", 3)}


def test_coarse_feed_across_ddl_rebucket_and_vacuumed_tombstones(
    spark, tmp_table_dir
):
    """The three coarse-range hazards from the round-3 review: a DDL
    commit mid-range (schema mismatch), a rebucket mid-range (stale
    touched-bucket ids), and a drop-tombstones compaction mid-range
    (vacuumed delete evidence) — each must still yield a correct net
    diff, and replicate() across the range must converge."""
    from qwery_spark.lake.changes import replicate
    from qwery_spark.lake.merge import compact, rebucket

    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2)
    _apply(spark, tbl, [
        (i, "I", f"k{i}", [i], 1, "web", None) for i in range(8)
    ], 0)
    sync = tbl.current_version()

    tbl.add_column("quality", "double")                      # DDL mid-range
    _apply(spark, tbl, [
        (10 + i, "U", f"k{i}", [i, i], 2, "web", None) for i in range(8)
    ], 1)
    _apply(spark, tbl, [(30, "D", "k0", None, None, "web", None)], 2)
    compact(spark, tbl, drop_tombstones=True)                # vacuums k0's tombstone
    rebucket(spark, tbl, 7)                                  # stale bucket ids
    _apply(spark, tbl, [(40, "U", "k1", [9, 9, 9], 3, "web", None)], 3)

    head = tbl.current_version()
    rows = {
        r["doc_id"]: r
        for r in read_changes(spark, tbl, sync, head, granular=False).collect()
    }
    # every key surfaced despite the rebucket; k0's delete survived the
    # tombstone vacuum with a lower-bound ordinal; schema gained quality
    assert set(rows) == {f"k{i}" for i in range(8)}
    assert rows["k0"]["_change_type"] == "delete"
    assert rows["k0"]["_ordinal"] == 1  # preimage ordinal 0 + 1 lower bound
    assert rows["k1"]["_change_type"] == "update_postimage"
    assert rows["k1"]["_ordinal"] == 40
    assert "quality" in rows["k1"].asDict()
    assert all(
        rows[f"k{i}"]["_change_type"] == "update_postimage" for i in range(2, 8)
    )

    # replication across the hazardous range converges
    dst = LakeTable.create(tmp_table_dir + "/dst", TARGET_SCHEMA, n_buckets=3)
    dst.add_column("quality", "double")
    replicate(spark, tbl, dst, 0, head)
    src_state = {
        (r["doc_id"], tuple(r["tokens"])) for r in tbl.read(spark).collect()
    }
    dst_state = {
        (r["doc_id"], tuple(r["tokens"])) for r in dst.read(spark).collect()
    }
    assert dst_state == src_state


def test_windowed_feed_attribution_and_equivalences(spark, tmp_table_dir):
    """window=1 must equal the granular feed exactly; window=K (whole
    range) must equal the coarse feed except for attribution; a middle
    window size nets within windows and orders across them."""
    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=4)
    _apply(spark, tbl, [(1, "I", "a", [1], 1, "web", None),
                        (2, "I", "b", [2], 1, "web", None)], 0)
    _apply(spark, tbl, [(10, "U", "a", [1, 1], 2, "web", None)], 1)
    _apply(spark, tbl, [(20, "D", "b", None, None, "web", None),
                        (21, "I", "c", [3], 1, "web", None)], 2)
    _apply(spark, tbl, [(30, "U", "c", [3, 3], 2, "web", None)], 3)
    head = tbl.current_version()

    def rows(**kw):
        return sorted(
            (r["doc_id"], r["_change_type"], r["_ordinal"], r["_commit_version"])
            for r in read_changes(spark, tbl, 0, head, **kw).collect()
        )

    assert rows(window=1) == rows(granular=True)
    assert rows(window=head) == rows(granular=False)

    # window=2: chunk1 = commits {1,2} netted, chunk2 = {3,4} netted
    w2 = rows(window=2)
    by_doc = {}
    for doc, ct, o, cv in w2:
        by_doc.setdefault(doc, []).append((ct, o, cv))
    # 'a' netted inside chunk1: single insert at final ordinal, v2 label
    assert by_doc["a"] == [("insert", 10, 2)]
    # 'b' appeared and died inside chunk1+2? b inserted v1, deleted v3 ->
    # chunk1 shows the insert (label v2), chunk2 shows the delete (v4)
    assert ("insert", 2, 2) in by_doc["b"] and ("delete", 20, 4) in by_doc["b"]
    # 'c' inserted v3 + updated v4 nets to one insert inside chunk2
    assert by_doc["c"] == [("insert", 30, 4)]


def test_windowed_feed_replication_converges(spark, tmp_table_dir):
    """Applying the windowed feed chunk-by-chunk through replicate()
    converges the replica to the source — the hybrid keeps the feed's
    completeness contract."""
    from qwery_spark.lake.changes import replicate

    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=4)
    for e in range(6):
        _apply(spark, tbl, [
            (100 * e + i, "U" if (e + i) % 5 else "D",
             f"k{i % 7}", None if (e + i) % 5 == 0 else [e, i],
             None if (e + i) % 5 == 0 else 2, "web", None)
            for i in range(10)
        ], e)
    head = tbl.current_version()

    dst = LakeTable.create(tmp_table_dir + "/dst", TARGET_SCHEMA, n_buckets=3)
    w = 2
    lo = 0
    chunk_i = 0
    while lo < head:
        hi = min(lo + w, head)
        feed = read_changes(spark, tbl, lo, hi, window=w)
        replicate(spark, tbl, dst, lo, hi, epoch_id=f"win:{hi}", feed=feed)
        lo = hi
        chunk_i += 1
    src = sorted((r["doc_id"], tuple(r["tokens"]))
                 for r in tbl.read(spark).collect())
    got = sorted((r["doc_id"], tuple(r["tokens"]))
                 for r in dst.read(spark).collect())
    assert got == src


def test_windowed_feed_across_hazard_range(spark, tmp_table_dir):
    """The r3 coarse-range hazards (mid-range DDL, rebucket, tombstone
    vacuum) handled per-window: the rebucket voids bucket pruning only
    for the window containing it."""
    from qwery_spark.lake.merge import compact, rebucket

    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2)
    _apply(spark, tbl, [
        (i, "I", f"k{i}", [i], 1, "web", None) for i in range(6)
    ], 0)
    sync = tbl.current_version()
    tbl.add_column("quality", "double")
    _apply(spark, tbl, [(10, "U", "k1", [7, 7], 2, "web", None)], 1)
    _apply(spark, tbl, [(11, "D", "k2", None, None, "web", None)], 2)
    compact(spark, tbl, drop_tombstones=True)
    rebucket(spark, tbl, 5)
    _apply(spark, tbl, [(20, "U", "k3", [8, 8, 8], 3, "web", None)], 3)
    head = tbl.current_version()

    rows = {
        r["doc_id"]: r
        for r in read_changes(spark, tbl, sync, head, window=2).collect()
    }
    assert rows["k1"]["_change_type"] == "update_postimage"
    assert rows["k2"]["_change_type"] == "delete"
    assert rows["k3"]["_change_type"] == "update_postimage"
    assert rows["k3"]["_ordinal"] == 20
    assert "quality" in rows["k1"].asDict()


# ---------------- key-range-pruned diffs ----------------
def test_added_key_range_soundness_gates(spark, tmp_table_dir):
    """_added_key_range returns the added files' key span for purely
    additive (MOR append) ranges, and None across any file-removing
    commit (compaction) — the condition that makes two-sided pruning
    sound."""
    from qwery_spark.lake.changes import _added_key_range
    from qwery_spark.lake.merge import append_changes

    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )

    def batch(ids, ordinal0):
        return spark.createDataFrame(
            [(f"doc-{i:05d}", [1], 1, "web", "U", ordinal0 + j)
             for j, i in enumerate(ids)],
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "op string, ordinal long",
        )

    append_changes(spark, tbl, batch(range(0, 100), 0))       # v1
    append_changes(spark, tbl, batch(range(500, 510), 100))   # v2
    r = _added_key_range(tbl, 1, 2)
    assert r == ("doc-00500", "doc-00509")
    # the whole additive range v0->v2 spans both batches
    lo, hi = _added_key_range(tbl, 0, 2)
    assert lo == "doc-00000" and hi == "doc-00509"
    compact(spark, tbl)                                        # v3 removes files
    assert _added_key_range(tbl, 2, 3) is None
    assert _added_key_range(tbl, 1, 3) is None
    # additive again after the compaction
    append_changes(spark, tbl, batch(range(900, 905), 200))    # v4
    assert _added_key_range(tbl, 3, 4) == ("doc-00900", "doc-00904")
    # pruning effectiveness: the narrow range skips the compacted
    # bucket-wide files
    snap = tbl.snapshot()
    all_files = snap.files()
    pruned = snap.files(key_range=_added_key_range(tbl, 3, 4))
    assert len(pruned) < len(all_files)


def test_pruned_feed_equals_unpruned(spark, tmp_table_dir, monkeypatch):
    """Every feed mode (granular / coarse / windowed, with and without
    preimages) yields identical rows with key-range pruning on vs
    forced off, on a workload mixing old-key updates, deletes, inserts,
    and an interleaved compaction."""
    import qwery_spark.lake.changes as ch
    from qwery_spark.lake.merge import append_changes

    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=4, write_mode="mor"
    )

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "op string, ordinal long",
        )

    append_changes(spark, tbl, batch(
        [(f"doc-{i:04d}", [i], 1, "web", "U", i) for i in range(50)]))   # v1
    append_changes(spark, tbl, batch(
        [("doc-0003", [99], 1, "web", "U", 100),       # old-key update
         ("doc-0900", [1], 1, "web", "U", 101)]))       # new key      # v2
    compact(spark, tbl)                                                 # v3
    append_changes(spark, tbl, batch(
        [("doc-0001", None, None, None, "D", 200),      # delete old
         ("doc-0950", [2], 1, "books", "U", 201)]))                     # v4
    append_changes(spark, tbl, batch(
        [("doc-0900", [7], 1, "web", "U", 300)]))       # update recent # v5

    def snap_rows(**kw):
        return sorted(
            (tuple((k, str(v)) for k, v in sorted(r.asDict().items())))
            for r in read_changes(spark, tbl, 0, **kw).collect()
        )

    variants = [
        dict(granular=True), dict(granular=False), dict(window=2),
        dict(granular=True, include_preimages=True),
        dict(granular=False, include_preimages=True),
        dict(window=2, include_preimages=True),
    ]
    with_pruning = [snap_rows(**kw) for kw in variants]
    monkeypatch.setattr(ch, "_added_key_range", lambda *a, **k: None)
    without = [snap_rows(**kw) for kw in variants]
    assert with_pruning == without
    # sanity: the pruned runs actually produced content
    assert all(len(v) > 0 for v in with_pruning)


def test_key_set_pruning_fires_and_stays_exact(spark, tmp_table_dir, monkeypatch):
    """A small scattered-update window on a many-file table passes the
    key-set gate: _diff_pruning returns the window's exact keys, and
    the feed equals the unpruned feed."""
    import qwery_spark.lake.changes as ch
    from qwery_spark.lake.changes import _diff_pruning
    from qwery_spark.lake.merge import append_changes

    # the depth floor exists to amortize the key-read job at real scale;
    # drop it so the test table qualifies
    monkeypatch.setattr(ch, "_KEY_SET_MIN_KEPT_ROWS", 0)
    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "op string, ordinal long",
        )

    # 10 seed commits -> ~10 files per bucket, keys doc-0000..doc-0499
    # (>=100x the window's 3 rows so the ratio gate passes)
    for c in range(10):
        append_changes(spark, tbl, batch(
            [(f"doc-{c * 50 + i:04d}", [i], 1, "web", "U", c * 50 + i)
             for i in range(50)]))
    v = tbl.current_version()
    # scattered window: first and last keys (hull spans everything)
    append_changes(spark, tbl, batch(
        [("doc-0000", [91], 1, "web", "U", 900),
         ("doc-0100", [92], 1, "web", "U", 901),
         ("doc-0499", None, None, None, "D", 902)]))

    rng, keys = _diff_pruning(spark, tbl, v, v + 1, "doc_id")
    assert rng == ("doc-0000", "doc-0499")      # hull prunes nothing here
    assert keys == ["doc-0000", "doc-0100", "doc-0499"]

    def rows():
        return sorted(
            tuple(sorted((k, str(x)) for k, x in r.asDict().items()))
            for r in read_changes(
                spark, tbl, v, include_preimages=True
            ).collect()
        )

    pruned = rows()
    monkeypatch.setattr(ch, "_added_key_range", lambda *a, **k: None)
    assert pruned == rows()
    types = {dict(t)["_change_type"] for t in pruned}
    assert types == {"update_preimage", "update_postimage", "delete"}


def test_key_set_pruning_tolerates_null_keys(spark, tmp_table_dir, monkeypatch):
    """A delta file mixing null and non-null keys must not crash the
    key-set collect (sorted() over {None, str}); null keys emit no
    change rows either way, so pruned == unpruned still holds."""
    import qwery_spark.lake.changes as ch
    from qwery_spark.lake.changes import _diff_pruning
    from qwery_spark.lake.merge import append_changes

    monkeypatch.setattr(ch, "_KEY_SET_MIN_KEPT_ROWS", 0)
    monkeypatch.setattr(ch, "_KEY_SET_MIN_RATIO", 0)
    # one bucket so the null-key row shares a delta FILE with a real
    # key: the file's key stats stay non-null (min/max skip nulls), the
    # hull survives, and the key-set collect sees the None
    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=1, write_mode="mor"
    )

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "op string, ordinal long",
        )

    for c in range(3):
        append_changes(spark, tbl, batch(
            [(f"doc-{c * 20 + i:04d}", [i], 1, "web", "U", c * 20 + i)
             for i in range(20)]))
    v = tbl.current_version()
    # window with a NULL key beside real ones
    append_changes(spark, tbl, batch(
        [(None, [7], 1, "web", "U", 900),
         ("doc-0001", [8], 1, "web", "U", 901)]))

    rng, keys = _diff_pruning(spark, tbl, v, v + 1, "doc_id")
    assert keys == ["doc-0001"]  # None discarded, no TypeError

    def rows():
        return sorted(
            tuple(sorted((k, str(x)) for k, x in r.asDict().items()))
            for r in read_changes(spark, tbl, v).collect()
        )

    pruned = rows()
    monkeypatch.setattr(ch, "_added_key_range", lambda *a, **k: None)
    assert pruned == rows()


def test_key_set_layer_skipped_for_many_commit_ranges(
    spark, tmp_table_dir, monkeypatch
):
    """allow_key_set=False (the many-diff catch-up gate) keeps the hull
    but launches no key-collect job; the shared path cache makes the
    adjacent-diff loop reuse each endpoint's path set."""
    import qwery_spark.lake.changes as ch
    from qwery_spark.lake.changes import _diff_pruning
    from qwery_spark.lake.merge import append_changes

    monkeypatch.setattr(ch, "_KEY_SET_MIN_KEPT_ROWS", 0)
    monkeypatch.setattr(ch, "_KEY_SET_MIN_RATIO", 0)
    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "op string, ordinal long",
        )

    for c in range(4):
        append_changes(spark, tbl, batch(
            [(f"doc-{c * 10 + i:04d}", [i], 1, "web", "U", c * 10 + i)
             for i in range(10)]))

    rng, keys = _diff_pruning(
        spark, tbl, 3, 4, "doc_id", allow_key_set=False
    )
    assert rng is not None and keys is None

    cache: dict = {}
    for v in range(1, 5):
        _diff_pruning(spark, tbl, v - 1, v, "doc_id", path_cache=cache)
    # every endpoint version computed exactly once and memoized
    assert set(cache) == {0, 1, 2, 3, 4}
    assert len(cache[4]) == len(tbl.snapshot(4).m["files"])


def test_key_set_gate_pinned_to_parquet_in_pushdown_bound(
    spark, tmp_table_dir, monkeypatch
):
    """Round-6 regression guard: parquet-mr evaluates a pushed exact In
    as a LINEAR OR recursion, one stack frame per value — ~1000 long
    values StackOverflow the scan task (measured: 900 ok / 1000 crash;
    strings crash by 2000, and the boundary moves with surrounding
    stack depth). The key-set gate and the session's inFilterThreshold
    must stay pinned together at a bound with ~4x margin, so NO engine
    path can hand parquet an over-limit exact In; bigger windows must
    degrade to hull-only pruning, never crash."""
    import qwery_spark.lake.changes as ch
    from qwery_spark.lake.changes import _diff_pruning
    from qwery_spark.lake.merge import append_changes

    thresh = int(
        spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold")
    )
    assert ch._KEY_SET_MAX_ROWS <= thresh, (
        "gate admits key lists the scan would degrade or crash on"
    )
    assert thresh <= 400, (
        "inFilterThreshold must keep ~4x stack margin below the "
        "measured ~1000-value parquet OR-chain overflow"
    )

    # an over-limit window degrades to hull-only: keys is None, the
    # feed still reads (and matches the unpruned feed)
    monkeypatch.setattr(ch, "_KEY_SET_MIN_KEPT_ROWS", 0)
    monkeypatch.setattr(ch, "_KEY_SET_MIN_RATIO", 0)
    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )

    def batch(lo, n, base):
        return spark.createDataFrame(
            [(f"doc-{lo + i:05d}", [i], 1, "web", "U", base + i)
             for i in range(n)],
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "op string, ordinal long",
        )

    append_changes(spark, tbl, batch(0, 500, 0))
    v = tbl.current_version()
    over = ch._KEY_SET_MAX_ROWS + 50
    append_changes(spark, tbl, batch(0, over, 10_000))
    rng, keys = _diff_pruning(spark, tbl, v, v + 1, "doc_id")
    assert rng is not None and keys is None
    assert read_changes(spark, tbl, v).count() == over


def test_changelog_resume_past_retention_raises_rebuild_contract(
    spark, tmp_table_dir
):
    """A follower whose resume point expire_snapshots already dropped
    gets VersionExpiredError with the rebuild contract (round 6) —
    not a raw FileNotFoundError from a manifest open mid-plan. A
    retained resume point keeps working, and earliest_version() names
    the floor."""
    from qwery_spark.lake.changes import VersionExpiredError
    from qwery_spark.lake.merge import append_changes

    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    for c in range(6):
        append_changes(spark, tbl, spark.createDataFrame(
            [(f"doc-{c}", [c], 1, "web", "U", c)],
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "op string, ordinal long",
        ))
    assert tbl.earliest_version() == 0
    dropped = tbl.expire_snapshots(keep_last=2)
    assert dropped > 0
    earliest = tbl.earliest_version()
    assert earliest == tbl.current_version() - 1
    with pytest.raises(VersionExpiredError, match="rebuild"):
        read_changes(spark, tbl, earliest - 2)
    # the floor itself still reads (exclusive start: diffs (floor, head])
    assert read_changes(spark, tbl, earliest).count() >= 1
