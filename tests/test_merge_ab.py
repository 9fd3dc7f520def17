"""The merge A/B instrument (tools/merge_ab.py): QWERY_MERGE_TWO_SCAN=1
flips the COW broadcast merge to the round-2 double-scan shape. Both
shapes must produce the identical final table state — the A/B is a
pure performance instrument, never a semantics switch."""

import os

import pytest

from qwery_spark.cdc.apply import apply_changes
from qwery_spark.datagen import make_events
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA


@pytest.fixture
def _no_two_scan():
    yield
    os.environ.pop("QWERY_MERGE_TWO_SCAN", None)


def test_two_scan_mode_matches_single_scan(spark, tmp_path, _no_two_scan):
    pdf = make_events(4000, seed=11).to_pandas()
    states = {}
    for env in ("0", "1"):
        os.environ["QWERY_MERGE_TWO_SCAN"] = env
        tbl = LakeTable.create(
            str(tmp_path / f"t{env}"), TARGET_SCHEMA, n_buckets=4, write_mode="cow"
        )
        for e in range(2):
            chunk = pdf.iloc[e * 2000 : (e + 1) * 2000]
            df = spark.createDataFrame(chunk, schema=EVENT_SCHEMA)
            apply_changes(spark, tbl, df, epoch_id=e, scan_ddl=False)
        states[env] = sorted(
            (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
            for r in tbl.read(spark).collect()
        )
    assert states["0"] == states["1"]
    assert len(states["0"]) > 0
