"""Persisted MinHash signature index (operators/sigindex.py): built
once, maintained incrementally from the change feed, candidate-join
equivalent to a full recompute — and the incremental path provably
re-shingles ONLY the changed docs."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwery_spark.lake.merge import append_changes
from qwery_spark.lake.table import LakeTable
from qwery_spark.operators.dedupe import minhash_candidates
from qwery_spark.operators.sigindex import (
    build_signature_index,
    incremental_candidates,
    index_candidates,
    update_signature_index,
)

_DOCS_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def _mk_docs(spark, path, rows, n_buckets=4):
    tbl = LakeTable.create(
        path, _DOCS_SCHEMA, n_buckets=n_buckets, key_col="doc_id", write_mode="mor"
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, op string, ordinal long")
    append_changes(spark, tbl, df)
    return tbl


@pytest.fixture
def corpus_rows():
    # deterministic texts with planted near-dups (i and i+100 share
    # most shingles) and one too-short doc
    rows = []
    for i in range(40):
        words = " ".join(f"w{(i * 7 + k) % 23}" for k in range(12))
        rows.append((i, f"doc {i} says {words}", "U", i))
        rows.append((i + 100, f"doc {i} says {words} tail", "U", i + 100))
    rows.append((999, "short", "U", 999))  # < 3 words: empty sketch
    return rows


def test_build_then_update_matches_full_recompute(spark, tmp_path, corpus_rows):
    docs = _mk_docs(spark, str(tmp_path / "docs"), corpus_rows)
    v1 = docs.current_version()
    idx = build_signature_index(spark, docs, str(tmp_path / "idx"))
    # every doc gets an index row, including the unshingleable one
    assert idx.read(spark).count() == len(corpus_rows)
    short = idx.read(spark).filter("doc_id = 999").collect()[0]
    assert short["sigs"] == []

    # window 2: update two docs, add one, delete one
    batch = spark.createDataFrame(
        [
            (0, "totally different content now alpha beta gamma delta", "U", 5000),
            (100, "doc 0 says " + " ".join(f"w{k % 23}" for k in range(12)), "U", 5001),
            (500, "brand new doc alpha beta gamma delta epsilon zeta", "U", 5002),
            (101, None, "D", 5003),
        ],
        "doc_id long, text string, op string, ordinal long",
    )
    append_changes(spark, docs, batch)
    stats = update_signature_index(spark, docs, idx, from_version=v1)

    # ONLY the changed docs re-shingled — the corpus was not rescanned
    assert stats.docs_reshingled == 3
    assert stats.docs_deleted == 1

    got = sorted(tuple(r) for r in index_candidates(spark, idx).collect())
    want = sorted(
        tuple(r)
        for r in minhash_candidates(docs.read(spark), "doc_id", "text").collect()
    )
    assert got == want and len(got) > 0


def test_update_window_is_idempotent(spark, tmp_path, corpus_rows):
    docs = _mk_docs(spark, str(tmp_path / "docs"), corpus_rows)
    v1 = docs.current_version()
    idx = build_signature_index(spark, docs, str(tmp_path / "idx"))
    batch = spark.createDataFrame(
        [(7, "replacement words here one two three four five", "U", 9000),
         (107, None, "D", 9001)],
        "doc_id long, text string, op string, ordinal long",
    )
    append_changes(spark, docs, batch)
    update_signature_index(spark, docs, idx, from_version=v1)
    once = sorted(tuple(r) for r in index_candidates(spark, idx).collect())
    files_once = len(idx.snapshot().files())
    ver_once = idx.current_version()
    # re-apply the same window: the window-keyed epoch makes the replay
    # a COMMIT-level no-op (no new delta files, no new version) — not
    # just an LWW-converging duplicate append
    update_signature_index(spark, docs, idx, from_version=v1)
    twice = sorted(tuple(r) for r in index_candidates(spark, idx).collect())
    assert once == twice
    assert len(idx.snapshot().files()) == files_once
    assert idx.current_version() == ver_once


def test_incremental_candidates_cover_the_delta(spark, tmp_path, corpus_rows):
    docs = _mk_docs(spark, str(tmp_path / "docs"), corpus_rows)
    v1 = docs.current_version()
    idx = build_signature_index(spark, docs, str(tmp_path / "idx"))
    before = {
        (r["doc_a"], r["doc_b"]) for r in index_candidates(spark, idx).collect()
    }
    batch = spark.createDataFrame(
        [(300, "doc 3 says " + " ".join(f"w{(3 * 7 + k) % 23}" for k in range(12)),
          "U", 9100)],
        "doc_id long, text string, op string, ordinal long",
    )
    append_changes(spark, docs, batch)
    update_signature_index(spark, docs, idx, from_version=v1)
    after = {
        (r["doc_a"], r["doc_b"]) for r in index_candidates(spark, idx).collect()
    }
    changed = spark.createDataFrame([(300,)], "doc_id long")
    inc = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_candidates(spark, idx, changed).collect()
    }
    # the incremental join returns exactly the pairs involving the
    # changed doc — which is the full delta of the candidate set
    assert after - before == {p for p in inc if p not in before}
    assert all(300 in p for p in inc)
    # doc 300 is a near-dup of 3/103: candidates must appear
    assert any(300 in p for p in after - before)


def test_build_replay_is_commit_noop(spark, tmp_path, corpus_rows):
    docs = _mk_docs(spark, str(tmp_path / "docs"), corpus_rows)
    idx = build_signature_index(spark, docs, str(tmp_path / "idx"))
    files = len(idx.snapshot().files())
    ver = idx.current_version()
    again = build_signature_index(spark, docs, str(tmp_path / "idx"))
    assert len(again.snapshot().files()) == files
    assert again.current_version() == ver
