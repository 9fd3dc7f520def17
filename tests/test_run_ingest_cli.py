"""End-to-end smoke of the spark-submit entrypoint (jobs/run_ingest.py)
as a real subprocess — the deploy artifact, not just the library:
create table, drain events with a seek, compact, write lineage, then
resume-from-lineage processes only the tail."""

import json
import os
import subprocess
import sys

import pytest

from qwery_spark.datagen import make_events, write_event_chunks

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_ingest.py"), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def test_run_ingest_cli_drain_seek_and_resume(tmp_path):
    ev_dir = str(tmp_path / "events")
    write_event_chunks(make_events(3000, seed=77), ev_dir, 3)
    table = str(tmp_path / "t")
    lineage = str(tmp_path / "lineage")

    # first run: seek past the first 1000 ordinals, drain, compact
    r = _run([
        "--events", ev_dir, "--table", table, "--create", "--mode", "mor",
        "--buckets", "4", "--checkpoint", str(tmp_path / "ck1"),
        "--lineage", lineage, "--from-ordinal", "1000", "--compact-after",
        "--max-files-per-trigger", "3",
    ])
    assert r.returncode == 0, r.stderr[-2000:]

    from qwery_spark.lake.table import LakeTable

    tbl = LakeTable(table)
    ops = [json.load(open(tbl._manifest_path(v))).get("summary", {}).get("operation")
           for v in range(1, tbl.current_version() + 1)]
    assert "compact" in ops

    from qwery_spark.session import get_spark

    spark = get_spark("cli-check", cpus=4, shuffle_partitions=4)
    lin = spark.read.parquet(lineage)
    lo, hi = lin.selectExpr("min(ordinal_min)", "max(ordinal_max)").collect()[0]
    assert lo == 1000 and hi == 2999  # the seek really skipped the head

    # second run: new tail chunk + resume-from-lineage -> processes ONLY it
    write_event_chunks(make_events(500, seed=78, start_ordinal=3000),
                       str(tmp_path / "events2"), 1)
    r2 = _run([
        "--events", str(tmp_path / "events2"), "--table", table,
        "--checkpoint", str(tmp_path / "ck2"), "--lineage", lineage,
        "--resume-from-lineage",
    ])
    assert r2.returncode == 0, r2.stderr[-2000:]
    lin2 = spark.read.parquet(lineage)
    assert lin2.selectExpr("max(ordinal_max)").collect()[0][0] == 3499


def test_run_ingest_cli_wap_audit(tmp_path):
    """--audit-sql turns the deploy artifact into a WAP loop: windows
    failing the staged-state audit are rejected to --rejected-dir and
    never reach main."""
    ev_dir = str(tmp_path / "events")
    # limit == max_len (cf. tests/test_streaming_wap.py): only
    # exact-max rows violate -> a mix of publish/reject across chunks
    write_event_chunks(make_events(3000, seed=23, max_len=1500), ev_dir, 6)
    table = str(tmp_path / "t")
    rej = str(tmp_path / "rejected")

    r = _run([
        "--events", ev_dir, "--table", table, "--create", "--mode", "mor",
        "--buckets", "4", "--checkpoint", str(tmp_path / "ck"),
        "--max-files-per-trigger", "1",
        "--audit-sql", "SELECT * FROM staged WHERE n_tok >= 1500",
        "--rejected-dir", rej,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    decisions = [
        json.loads(line)["wap"]
        for line in r.stderr.splitlines()
        if line.startswith('{"wap"')
    ]
    assert len(decisions) == 6
    published = [d["published"] for d in sorted(decisions, key=lambda d: d["epoch_id"])]
    assert True in published and False in published, published
    # each rejected window left a dead-letter epoch dir
    assert len(os.listdir(rej)) == published.count(False)

    from qwery_spark.lake.table import LakeTable
    from qwery_spark.session import get_spark

    tbl = LakeTable(table)
    assert tbl.list_branches() == []  # no stray stages
    spark = get_spark("cli-wap-check", cpus=4, shuffle_partitions=4)
    # the audited invariant holds on main
    assert tbl.read(spark).filter("n_tok >= 1500").count() == 0
