"""File triggers (constraint matrix ported from
etl:triggers/Constraint.scala), the inbox->work->archive round trip
(etl:actors/FileManagementActor.scala:62-125), scheduled events with an
injected clock (etl:events/ScheduledEvent.scala:25-75), and the offset
seek / replay-from-ordinal surface
(core:devices/KafkaInputDevice.scala:29-31,67-73)."""

import datetime as dt
import json
import os

import pandas as pd
import pytest

from qwery_spark.compiler import ScriptEngine
from qwery_spark.streaming.orchestrate import (
    FileTrigger,
    FileWorkflow,
    ScheduledEvent,
    Scheduler,
    make_constraint,
)


# ---------------- constraint matrix ----------------
@pytest.mark.parametrize(
    "spec,name,want",
    [
        ({"contains": "list"}, "companylist.csv", True),
        ({"contains": "LIST"}, "companylist.csv", False),
        ({"contains": "LIST", "ignoreCase": True}, "companylist.csv", True),
        ({"equals": "companylist.csv"}, "companylist.csv", True),
        ({"equals": "COMPANYLIST.CSV"}, "companylist.csv", False),
        ({"equals": "COMPANYLIST.CSV", "ignoreCase": True}, "companylist.csv", True),
        ({"prefix": "company"}, "companylist.csv", True),
        ({"prefix": "Company"}, "companylist.csv", False),
        ({"prefix": "Company", "ignoreCase": True}, "companylist.csv", True),
        ({"suffix": ".csv"}, "companylist.csv", True),
        ({"suffix": ".CSV"}, "companylist.csv", False),
        ({"suffix": ".CSV", "ignoreCase": True}, "companylist.csv", True),
        ({"regex": "company.*\\.csv"}, "companylist.csv", True),
        # reference uses String.matches = FULL match
        ({"regex": "company"}, "companylist.csv", False),
        ({"prefix": "company", "suffix": ".csv"}, "companylist.csv", True),
        ({"prefix": "company", "suffix": ".json"}, "companylist.csv", False),
    ],
)
def test_constraint_matrix(spec, name, want):
    assert make_constraint(spec)(name) is want


def test_trigger_requires_all_constraints():
    t = FileTrigger("t", [{"prefix": "company"}, {"suffix": ".csv"}], "SELECT 1")
    assert t.accepts("companylist.csv")
    assert not t.accepts("companylist.json")
    assert not t.accepts("otherlist.csv")


# ---------------- inbox -> work -> archive round trip ----------------
def test_file_workflow_round_trip(spark, tmp_path):
    eng = ScriptEngine(spark)
    inbox, work, archive = (str(tmp_path / d) for d in ("inbox", "work", "archive"))
    out = str(tmp_path / "out.json")
    trig = FileTrigger(
        "csv-loader",
        [{"suffix": ".csv"}],
        # the script sees the claimed file through work.file.* variables
        f"SELECT Symbol INTO '{out}' FROM '{{{{ work.file.path }}}}' "
        f"WHERE Symbol <> ''",
    )
    clock = lambda: dt.datetime(2026, 8, 16, 9, 30, 15)  # noqa: E731
    wf = FileWorkflow(eng, inbox, work, archive, [trig], clock=clock)

    pd.DataFrame({"Symbol": ["AAA", "BBB", "CCC"]}).to_csv(
        os.path.join(inbox, "companylist.csv"), index=False
    )
    with open(os.path.join(inbox, "notes.txt"), "w") as fh:
        fh.write("not matched\n")

    processed = wf.poll_once()
    assert [p.file_name for p in processed] == ["companylist.csv"]
    p = processed[0]
    assert p.error is None
    assert p.results[-1].collect()[0]["ROWS_INSERTED"] == 3
    # dated archive layout yyyy/mm/dd/hhmmss/<name>
    assert p.archive_path.endswith("2026/08/16/093015/companylist.csv")
    assert os.path.exists(p.archive_path)
    # inbox keeps only the unmatched file; work dir is drained
    assert os.listdir(inbox) == ["notes.txt"]
    assert os.listdir(os.path.join(work, "0")) == []
    # work.* variables did not leak into the engine scope
    assert "work.file.path" not in eng.variables
    # second poll: nothing left to do
    assert wf.poll_once() == []


def test_file_workflow_script_failure_still_archives(spark, tmp_path):
    eng = ScriptEngine(spark)
    wf = FileWorkflow(
        eng, str(tmp_path / "in"), str(tmp_path / "wk"), str(tmp_path / "ar"),
        [FileTrigger("bad", [{"suffix": ".csv"}], "SELECT * FROM '/nope/missing.csv'")],
        clock=lambda: dt.datetime(2026, 1, 2, 3, 4, 5),
    )
    pd.DataFrame({"a": [1]}).to_csv(tmp_path / "in" / "x.csv", index=False)
    [p] = wf.poll_once()
    assert p.error is not None
    assert os.path.exists(p.archive_path)  # failed files still archive


# ---------------- scheduled events, mocked clock ----------------
def test_scheduler_fires_two_daily_times(spark):
    eng = ScriptEngine(spark)
    ev = ScheduledEvent("daily-drain", ["8:15", "20:15"], "SET @runs = @runs + 1")
    eng.execute("SET @runs = 0")
    start = dt.datetime(2026, 8, 16, 7, 0, 0)
    sched = Scheduler(eng, [ev], start=start)

    assert sched.tick(dt.datetime(2026, 8, 16, 8, 0)) == []          # not yet
    assert sched.tick(dt.datetime(2026, 8, 16, 8, 15)) == ["daily-drain"]
    assert eng.variables["runs"] == 1
    assert sched.tick(dt.datetime(2026, 8, 16, 12, 0)) == []         # between
    assert sched.tick(dt.datetime(2026, 8, 16, 20, 16)) == ["daily-drain"]
    assert eng.variables["runs"] == 2
    # next morning fires the rescheduled 8:15 slot
    assert sched.tick(dt.datetime(2026, 8, 17, 8, 15)) == ["daily-drain"]
    assert eng.variables["runs"] == 3


def test_scheduled_event_rolls_past_times_to_tomorrow():
    ev = ScheduledEvent("e", ["8:15"], "SELECT 1")
    now = dt.datetime(2026, 8, 16, 9, 0)
    [t] = ev.next_run_times(now)
    assert t == dt.datetime(2026, 8, 17, 8, 15)


def test_scheduled_event_rejects_bad_time():
    with pytest.raises(ValueError, match="hh:mm"):
        ScheduledEvent("e", ["8"], "SELECT 1").next_run_times(dt.datetime(2026, 1, 1))


# ---------------- offset seek / replay ----------------
def test_offsets_json_and_seek_helpers():
    from qwery_spark.streaming.stream import fast_forward, offsets_json, rewind

    assert json.loads(offsets_json("changes", {0: 123, 1: 456})) == {
        "changes": {"0": 123, "1": 456}
    }
    assert json.loads(rewind("t", [0, 1])) == {"t": {"0": -2, "1": -2}}
    assert json.loads(fast_forward("t", [2])) == {"t": {"2": -1}}


def test_replay_from_ordinal_file_source(spark, tmp_path):
    """The file-source seek: a stream started at min_ordinal=X delivers
    exactly the events with ordinal >= X (kafka analogue:
    startingOffsets from offsets_json)."""
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.datagen import make_events, write_event_chunks
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import TARGET_SCHEMA
    from qwery_spark.streaming import run_stream

    events = make_events(2000, seed=17)
    ev_dir = str(tmp_path / "events")
    write_event_chunks(events, ev_dir, 4)
    tbl = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4,
                           write_mode="mor")
    run = run_stream(spark, tbl, ev_dir, str(tmp_path / "ckpt"),
                     min_ordinal=1500)
    run.query.awaitTermination(300)
    seen = [r for r in run.results if r.rows_in > 0]
    assert sum(r.rows_in for r in seen) == 500
    assert min(r.ordinal_min for r in seen) == 1500


def test_resume_ordinal_from_lineage(spark, tmp_path):
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.datagen import make_events
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA
    from qwery_spark.streaming.stream import resume_ordinal

    lineage = str(tmp_path / "lineage")
    tbl = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    ev = make_events(300, seed=23)
    apply_changes(
        spark, tbl,
        spark.createDataFrame(ev.to_pandas(), schema=EVENT_SCHEMA),
        epoch_id=0, lineage_dir=lineage,
    )
    assert resume_ordinal(spark, lineage) == 300  # max ordinal 299 + 1
    assert resume_ordinal(spark, str(tmp_path / "absent")) is None


def test_starting_offsets_from_lineage(spark, tmp_path):
    """Kafka resume: per-partition offsets rebuilt from committed lineage
    rows (partition column carried by parse_kafka_events)."""
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.datagen import make_events
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import TARGET_SCHEMA
    from qwery_spark.streaming.stream import starting_offsets_from_lineage

    lineage = str(tmp_path / "lineage")
    tbl = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    ev = make_events(400, seed=29).to_pandas()
    ev["_partition"] = (ev["ordinal"] % 2).astype("int32")
    apply_changes(
        spark, tbl, spark.createDataFrame(ev), epoch_id=0, lineage_dir=lineage
    )
    got = json.loads(starting_offsets_from_lineage(spark, lineage, "changes"))
    assert got == {"changes": {"0": 399, "1": 400}}  # max ordinal per part + 1


# ---------------- review-fix regressions ----------------
def test_scheduler_two_events_same_time(spark):
    """Two events sharing a firing time must both fire (sort must not
    compare ScheduledEvent objects)."""
    eng = ScriptEngine(spark)
    eng.execute("SET @a = 0")
    eng.execute("SET @b = 0")
    evs = [
        ScheduledEvent("ev-a", ["8:15"], "SET @a = @a + 1"),
        ScheduledEvent("ev-b", ["8:15"], "SET @b = @b + 1"),
    ]
    sched = Scheduler(eng, evs, start=dt.datetime(2026, 8, 16, 7, 0))
    fired = sched.tick(dt.datetime(2026, 8, 16, 8, 16))
    assert sorted(fired) == ["ev-a", "ev-b"]
    assert eng.variables["a"] == 1 and eng.variables["b"] == 1


def test_scheduler_no_catch_up_storm_after_downtime(spark):
    """5 days of downtime fires the daily event ONCE, then resumes the
    normal cadence (reference rolls forward to the next future time)."""
    eng = ScriptEngine(spark)
    eng.execute("SET @n = 0")
    sched = Scheduler(
        eng, [ScheduledEvent("daily", ["8:15"], "SET @n = @n + 1")],
        start=dt.datetime(2026, 8, 16, 7, 0),
    )
    assert sched.tick(dt.datetime(2026, 8, 21, 9, 0)) == ["daily"]
    assert eng.variables["n"] == 1
    assert sched.tick(dt.datetime(2026, 8, 21, 23, 0)) == []  # not again today
    assert sched.tick(dt.datetime(2026, 8, 22, 8, 15)) == ["daily"]
    assert eng.variables["n"] == 2


def test_offsets_from_lineage_fills_unseen_partitions(spark, tmp_path):
    """Spark's kafka source requires specific-offset JSON to cover ALL
    partitions: unseen ones fill with -2 (earliest)."""
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.datagen import make_events
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import TARGET_SCHEMA
    from qwery_spark.streaming.stream import starting_offsets_from_lineage

    lineage = str(tmp_path / "lineage")
    tbl = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    ev = make_events(100, seed=31).to_pandas()
    ev["_partition"] = 1  # only partition 1 ever seen
    apply_changes(spark, tbl, spark.createDataFrame(ev), epoch_id=0,
                  lineage_dir=lineage)
    got = json.loads(
        starting_offsets_from_lineage(spark, lineage, "t", n_partitions=4)
    )
    assert got == {"t": {"1": 100, "0": -2, "2": -2, "3": -2}}
