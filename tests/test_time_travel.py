"""Snapshot isolation: reads pinned to an old version see the old state
(time travel); periodic compaction during streaming preserves state."""

import os

from qwery_spark.cdc.apply import apply_changes
from qwery_spark.datagen import make_events, write_event_chunks
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA
from qwery_spark.streaming import run_stream

from tests.helpers import assert_state_equals_oracle


def test_time_travel_reads_old_snapshot(spark, tmp_table_dir):
    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=4)
    e1 = make_events(1000, seed=81)
    apply_changes(spark, tbl, spark.createDataFrame(e1.to_pandas(), schema=EVENT_SCHEMA),
                  epoch_id=0)
    v1 = tbl.snapshot().version
    n1 = tbl.read(spark).count()
    e2 = make_events(1000, seed=83, start_ordinal=1000)
    apply_changes(spark, tbl, spark.createDataFrame(e2.to_pandas(), schema=EVENT_SCHEMA),
                  epoch_id=1)
    assert tbl.read(spark).count() != n1 or tbl.snapshot().version > v1
    # pinned read sees exactly the old state
    assert tbl.read(spark, snapshot_version=v1).count() == n1


def test_stream_with_periodic_compaction(spark, tmp_table_dir):
    events = make_events(3000, seed=89)
    ev_dir = os.path.join(tmp_table_dir, "events")
    write_event_chunks(events, ev_dir, 6)
    tbl = LakeTable.create(os.path.join(tmp_table_dir, "t"), TARGET_SCHEMA,
                           n_buckets=4, write_mode="mor")
    run = run_stream(spark, tbl, ev_dir, os.path.join(tmp_table_dir, "ckpt"),
                     compact_every=2)
    run.query.awaitTermination(300)
    # compaction ran at least once (manifest shows a compact summary in history)
    ops = [tbl.snapshot(v).m["summary"].get("operation")
           for v in range(1, tbl.current_version() + 1)]
    assert "compact" in ops
    assert_state_equals_oracle(spark, tbl, events.to_pandas())
