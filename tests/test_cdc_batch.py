"""End-to-end batch CDC correctness vs the single-threaded replay oracle.

Covers FIXTURES.md §F2 adversarial sub-fixtures: out-of-order within a
batch, low-ordinal stragglers across batches, delete-then-reinsert,
duplicate delivery (epoch idempotency).
"""

import numpy as np
import pandas as pd
import pytest

from qwery_spark.cdc.apply import apply_changes
from qwery_spark.datagen import make_events
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA

from tests.helpers import assert_state_equals_oracle, table_state


def _mk_table(tmp_table_dir, n_buckets=8) -> LakeTable:
    return LakeTable.create(tmp_table_dir + "/tbl", TARGET_SCHEMA, n_buckets=n_buckets)


def _events_df(spark, pa_table):
    return spark.createDataFrame(pa_table.to_pandas(), schema=EVENT_SCHEMA)


def test_single_batch_matches_oracle(spark, tmp_table_dir):
    tbl = _mk_table(tmp_table_dir)
    events = make_events(5000, seed=7)
    df = _events_df(spark, events)
    res = apply_changes(spark, tbl, df, epoch_id=0)
    assert not res.merge.skipped
    assert res.rows_in == 5000
    assert res.rows_rejected > 0  # seeded 0.1% violations
    counters = assert_state_equals_oracle(spark, tbl, events.to_pandas())
    assert counters["rejected"] == res.rows_rejected


def test_multi_batch_matches_oracle(spark, tmp_table_dir):
    tbl = _mk_table(tmp_table_dir)
    events = make_events(6000, seed=11)
    n = events.num_rows
    for i, (lo, hi) in enumerate([(0, 2000), (2000, 4000), (4000, n)]):
        df = _events_df(spark, events.slice(lo, hi - lo))
        apply_changes(spark, tbl, df, epoch_id=i)
    assert_state_equals_oracle(spark, tbl, events.to_pandas())


def test_out_of_order_within_batch(spark, tmp_table_dir):
    """Shuffle event order inside the batch; ordinal stays authoritative."""
    tbl = _mk_table(tmp_table_dir)
    events = make_events(3000, seed=13).to_pandas()
    shuffled = events.sample(frac=1.0, random_state=99).reset_index(drop=True)
    df = spark.createDataFrame(shuffled, schema=EVENT_SCHEMA)
    apply_changes(spark, tbl, df, epoch_id=0)
    assert_state_equals_oracle(spark, tbl, events)


def _hand_events(rows):
    cols = ["ordinal", "op", "doc_id", "tokens", "n_tok", "source", "ddl"]
    return pd.DataFrame(rows, columns=cols)


def test_low_ordinal_straggler_across_batches(spark, tmp_table_dir):
    """An update with a LOWER ordinal arriving in a LATER batch must be
    ignored (last_ordinal guard) — FIXTURES.md adversarial case 2."""
    tbl = _mk_table(tmp_table_dir)
    b1 = _hand_events([
        (1, "I", "doc-a", [1, 2, 3], 3, "web", None),
        (5, "U", "doc-a", [9, 9], 2, "web", None),
    ])
    b2 = _hand_events([
        (3, "U", "doc-a", [7], 1, "web", None),  # straggler: ordinal 3 < 5
        (6, "I", "doc-b", [4], 1, "code", None),
    ])
    apply_changes(spark, tbl, spark.createDataFrame(b1, schema=EVENT_SCHEMA), epoch_id=0)
    apply_changes(spark, tbl, spark.createDataFrame(b2, schema=EVENT_SCHEMA), epoch_id=1)
    state = table_state(spark, tbl)
    row = state[state.doc_id == "doc-a"].iloc[0]
    assert list(row["tokens"]) == [9, 9], "straggler must not clobber newer row"
    assert_state_equals_oracle(spark, tbl, pd.concat([b1, b2]))


def test_delete_then_late_update_stays_deleted(spark, tmp_table_dir):
    """Delete at ordinal k; a straggler update with ordinal < k in a later
    batch must NOT resurrect the row (tombstone guard)."""
    tbl = _mk_table(tmp_table_dir)
    b1 = _hand_events([
        (1, "I", "doc-x", [1], 1, "web", None),
        (10, "D", "doc-x", None, None, None, None),
    ])
    b2 = _hand_events([
        (5, "U", "doc-x", [5, 5], 2, "web", None),  # pre-delete ordinal
    ])
    apply_changes(spark, tbl, spark.createDataFrame(b1, schema=EVENT_SCHEMA), epoch_id=0)
    apply_changes(spark, tbl, spark.createDataFrame(b2, schema=EVENT_SCHEMA), epoch_id=1)
    state = table_state(spark, tbl)
    assert len(state[state.doc_id == "doc-x"]) == 0
    assert_state_equals_oracle(spark, tbl, pd.concat([b1, b2]))


def test_delete_then_reinsert(spark, tmp_table_dir):
    tbl = _mk_table(tmp_table_dir)
    b1 = _hand_events([
        (1, "I", "doc-y", [1], 1, "web", None),
        (2, "D", "doc-y", None, None, None, None),
        (3, "I", "doc-y", [3, 3, 3], 3, "books", None),
    ])
    apply_changes(spark, tbl, spark.createDataFrame(b1, schema=EVENT_SCHEMA), epoch_id=0)
    state = table_state(spark, tbl)
    row = state[state.doc_id == "doc-y"].iloc[0]
    assert list(row["tokens"]) == [3, 3, 3]
    assert_state_equals_oracle(spark, tbl, b1)


def test_duplicate_delivery_is_idempotent(spark, tmp_table_dir):
    """Re-delivering a committed epoch (crash-before-checkpoint replay)
    must be a no-op — FIXTURES.md adversarial case 4."""
    tbl = _mk_table(tmp_table_dir)
    events = make_events(2000, seed=3)
    df = _events_df(spark, events)
    r1 = apply_changes(spark, tbl, df, epoch_id=0)
    v1 = tbl.snapshot().version
    r2 = apply_changes(spark, tbl, df, epoch_id=0)  # duplicate
    assert r2.merge.skipped
    assert tbl.snapshot().version == v1
    assert_state_equals_oracle(spark, tbl, events.to_pandas())


def test_bucket_pruning_rewrites_only_touched_buckets(spark, tmp_table_dir):
    """A batch touching one key must only rewrite that key's bucket."""
    tbl = _mk_table(tmp_table_dir, n_buckets=8)
    events = make_events(4000, seed=5)
    apply_changes(spark, tbl, _events_df(spark, events), epoch_id=0)
    files_before = {f["path"]: f for f in tbl.snapshot().files()}
    buckets_before = {f["bucket"] for f in files_before.values()}
    assert len(buckets_before) == 8  # all buckets populated

    one = _hand_events([(10_000_000, "U", "doc-000000000000", [42], 1, "web", None)])
    res = apply_changes(spark, tbl, spark.createDataFrame(one, schema=EVENT_SCHEMA), epoch_id=1)
    assert res.merge.touched_buckets == 1
    files_after = {f["path"]: f for f in tbl.snapshot().files()}
    changed = set(files_after) ^ set(files_before)
    changed_buckets = {
        (files_after | files_before)[p]["bucket"] for p in changed
    }
    assert len(changed_buckets) == 1, "only one bucket may be rewritten"


def test_validation_arrow_matches_builtin(spark, tmp_table_dir):
    from qwery_spark.cdc.validate import with_reject_reason

    events = make_events(4000, seed=21)
    df = spark.createDataFrame(events.to_pandas(), schema=EVENT_SCHEMA)
    a = with_reject_reason(df, mode="builtin").select("ordinal", "reject_reason")
    b = with_reject_reason(df, mode="arrow").select("ordinal", "reject_reason")
    pa_ = a.toPandas().sort_values("ordinal").reset_index(drop=True)
    pb = b.toPandas().sort_values("ordinal").reset_index(drop=True)
    assert pa_.equals(pb)
    assert pa_["reject_reason"].notna().sum() > 0


def test_shuffle_merge_path_matches_oracle(spark, tmp_table_dir):
    """Force the full-outer shuffle MERGE (broadcast_threshold=0) — the
    big-batch path must stay semantically identical."""
    from pyspark.sql import functions as F

    from qwery_spark.cdc.dedup import lww_dedup
    from qwery_spark.cdc.validate import split_valid
    from qwery_spark.lake.merge import merge_changes

    tbl = _mk_table(tmp_table_dir)
    events = make_events(4000, seed=113)
    for i, (lo, hi) in enumerate([(0, 2000), (2000, 4000)]):
        df = _events_df(spark, events.slice(lo, hi - lo))
        valid, _ = split_valid(df.filter(F.col("op") != "DDL").drop("ddl"))
        merge_changes(spark, tbl, lww_dedup(valid), epoch_id=i, broadcast_threshold=0)
    assert_state_equals_oracle(spark, tbl, events.to_pandas())


def test_bytes_gate_forces_shuffle_merge(spark, tmp_table_dir):
    """broadcast_max_bytes=0 must route even a tiny batch through the
    full-outer shuffle MERGE (the OOM guard for wide token payloads) —
    and the result must stay semantically identical."""
    from pyspark.sql import functions as F

    from qwery_spark.cdc.dedup import lww_dedup
    from qwery_spark.cdc.validate import split_valid
    from qwery_spark.lake.merge import merge_changes

    tbl = _mk_table(tmp_table_dir)
    events = make_events(2000, seed=127)
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000)]):
        df = _events_df(spark, events.slice(lo, hi - lo))
        valid, _ = split_valid(df.filter(F.col("op") != "DDL").drop("ddl"))
        merge_changes(spark, tbl, lww_dedup(valid), epoch_id=i,
                      broadcast_max_bytes=0)
    assert_state_equals_oracle(spark, tbl, events.to_pandas())
