"""Schema-evolution propagation to derived tables (round 6):
``sync_schema_from_source`` replays the source's DDL over a change
window onto replicas (via replicate) and SCD2 histories (via
update_scd2) — the follower crosses evolution commits with no manual
ALTER. The diff is field-id-aligned inside the source, so renames are
true renames (unchanged replica rows keep their bytes under the new
name), not drop+add."""

import pytest

from qwery_spark.lake.changes import (
    read_changes,
    replicate,
    sync_schema_from_source,
)
from qwery_spark.lake.merge import append_changes
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import TARGET_SCHEMA


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "op string, ordinal long",
    )


def _user_schema(tbl):
    return [
        (f["name"], f["type"])
        for f in tbl.snapshot().fields()
        if f["name"] not in ("last_ordinal", "_deleted")
    ]


def test_replicate_across_add_widen_drop(spark, tmp_table_dir):
    """A replication window spanning add_column + widen_type +
    drop_column lands with zero manual DDL on the replica; final states
    and user schemas match."""
    src = LakeTable.create(
        tmp_table_dir + "/src", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    dst = LakeTable.create(
        tmp_table_dir + "/dst", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    append_changes(spark, src, _batch(spark, [
        ("a", [1], 1, "web", "U", 1), ("b", [2], 1, "web", "U", 2),
    ]))
    v1 = src.current_version()
    replicate(spark, src, dst, 0, v1, epoch_id="w1")

    src.add_column("quality", "double")
    src.widen_type("n_tok", "bigint")
    src.drop_column("source")
    q = spark.createDataFrame(
        [("c", [3], 3, 0.5, "U", 3)],
        "doc_id string, tokens array<int>, n_tok bigint, quality double, "
        "op string, ordinal long",
    )
    append_changes(spark, src, q)
    head = src.current_version()

    replicate(spark, src, dst, v1, head, epoch_id="w2")
    assert _user_schema(dst) == _user_schema(src)
    s = sorted(
        (r["doc_id"], r["n_tok"], r["quality"])
        for r in src.read(spark).collect()
    )
    d = sorted(
        (r["doc_id"], r["n_tok"], r["quality"])
        for r in dst.read(spark).collect()
    )
    assert s == d == [("a", 1, None), ("b", 1, None), ("c", 3, 0.5)]


def test_replicate_rename_preserves_unchanged_rows(spark, tmp_table_dir):
    """The killer rename case: a row the window did NOT touch must keep
    its value under the new name on the replica (true rename via the
    replica's own field-id alignment — a drop+add would null it)."""
    src = LakeTable.create(
        tmp_table_dir + "/src", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    dst = LakeTable.create(
        tmp_table_dir + "/dst", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    append_changes(spark, src, _batch(spark, [
        ("a", [1], 1, "books", "U", 1), ("b", [2], 2, "web", "U", 2),
    ]))
    v1 = src.current_version()
    replicate(spark, src, dst, 0, v1, epoch_id="w1")

    src.rename_column("source", "origin")
    append_changes(spark, src, spark.createDataFrame(
        [("b", [2, 2], 2, "code", "U", 10)],
        "doc_id string, tokens array<int>, n_tok int, origin string, "
        "op string, ordinal long",
    ))
    head = src.current_version()
    replicate(spark, src, dst, v1, head, epoch_id="w2")

    d = {r["doc_id"]: r["origin"] for r in dst.read(spark).collect()}
    # 'a' was untouched by the window: its old bytes surface under the
    # renamed column on the replica
    assert d == {"a": "books", "b": "code"}
    # replay of the same window is a no-op end to end (sync guards +
    # epoch-keyed merge)
    replicate(spark, src, dst, v1, head, epoch_id="w2")
    assert {r["doc_id"]: r["origin"]
            for r in dst.read(spark).collect()} == d


def test_sync_rename_cycle_and_key_guard(spark, tmp_table_dir):
    """A pure rename cycle (source <-> n_tok... via two user columns)
    resolves through a temp name; renaming the key is rejected."""
    src = LakeTable.create(
        tmp_table_dir + "/src", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    dst = LakeTable.create(
        tmp_table_dir + "/dst", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    v0 = src.current_version()
    # swap two column names: source <-> n_tok is illegal (types differ
    # for widen check? no — rename only): use two string-ish steps via
    # a temp on the SOURCE side too
    src.rename_column("source", "__swap")
    src.rename_column("n_tok", "source")
    src.rename_column("__swap", "n_tok")
    ops = sync_schema_from_source(src, dst, v0)
    assert ops >= 2
    names = [n for n, _ in _user_schema(dst)]
    assert "source" in names and "n_tok" in names
    # the swapped columns carried their types with them
    assert dict(_user_schema(dst))["source"] == "int"
    assert dict(_user_schema(dst))["n_tok"] == "string"
    # key rename refuses to replay
    src2 = LakeTable.create(
        tmp_table_dir + "/src2", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    w0 = src2.current_version()
    src2.rename_column("doc_id", "document_id")  # breaks derived sync
    with pytest.raises(ValueError, match="key column rename"):
        sync_schema_from_source(
            src2,
            LakeTable.create(tmp_table_dir + "/dst2", TARGET_SCHEMA,
                             n_buckets=2),
            w0,
        )


def test_scd2_across_add_column(spark, tmp_table_dir):
    """update_scd2 over a window containing add_column: the history
    table gains the column; pre-DDL history rows read NULL, post-DDL
    open rows carry the value."""
    from qwery_spark.operators.materialize import build_scd2, update_scd2

    src = LakeTable.create(
        tmp_table_dir + "/src", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    append_changes(spark, src, _batch(spark, [
        ("a", [1], 1, "web", "U", 1),
    ]))
    v1 = src.current_version()
    build_scd2(spark, src, tmp_table_dir + "/hist", at_version=v1)
    hist = LakeTable(tmp_table_dir + "/hist")

    src.add_column("quality", "double")
    append_changes(spark, src, spark.createDataFrame(
        [("a", [1, 1], 2, "web", 0.9, "U", 10),
         ("b", [5], 1, "code", 0.2, "U", 11)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "quality double, op string, ordinal long",
    ))
    update_scd2(spark, src, hist, v1)

    rows = {
        (r["doc_id"], r["valid_from"]): (r["valid_to"], r["quality"])
        for r in hist.read(spark).collect()
    }
    assert rows[("a", 1)][0] == 10          # old version closed
    assert rows[("a", 10)] == (None, 0.9)   # new open row has quality
    assert rows[("b", 11)] == (None, 0.2)
    # pre-DDL closed row reads NULL for the new column
    assert rows[("a", 1)][1] is None


def test_scd2_structural_collision_raises(spark, tmp_table_dir):
    """A source column evolving onto an SCD2 structural name must raise,
    not corrupt the view."""
    from qwery_spark.operators.materialize import build_scd2, update_scd2

    src = LakeTable.create(
        tmp_table_dir + "/src", TARGET_SCHEMA, n_buckets=2, write_mode="mor"
    )
    append_changes(spark, src, _batch(spark, [("a", [1], 1, "web", "U", 1)]))
    v1 = src.current_version()
    build_scd2(spark, src, tmp_table_dir + "/hist", at_version=v1)
    hist = LakeTable(tmp_table_dir + "/hist")
    src.add_column("valid_from", "bigint")
    append_changes(spark, src, spark.createDataFrame(
        [("b", [2], 1, "web", 7, "U", 5)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "valid_from bigint, op string, ordinal long",
    ))
    with pytest.raises(ValueError, match="structural column"):
        update_scd2(spark, src, hist, v1)
