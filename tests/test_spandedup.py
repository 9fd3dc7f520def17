"""Exact duplicated-span dedup (operators/spandedup.py): property check
against a plain-Python reference on the suite's synthetic token corpus,
edge cases, and the plan gate (window hashing is map-only; dup
detection is one partial-aggregated shuffle)."""

import hashlib

from pyspark.sql import functions as F

from qwery_spark.operators.spandedup import (
    dup_spans,
    scrub_dup_spans,
    span_windows,
)
from qwery_spark.suite import REGISTRY
from qwery_spark.suite.text import _SPAN_L, _span_docs

SF = "/root/testdata/sf0.001"


def _py_reference(docs: dict[int, list[int]], L: int):
    """Plain-Python exact-substring dedup: window hash counts, dup set,
    per-doc covered positions, kept arrays."""
    occ: dict[str, int] = {}
    for toks in docs.values():
        for i in range(len(toks) - L + 1):
            h = hashlib.md5(
                ",".join(str(x) for x in toks[i : i + L]).encode()
            ).hexdigest()
            occ[h] = occ.get(h, 0) + 1
    dups = {h for h, n in occ.items() if n >= 2}
    kept: dict[int, list[int]] = {}
    n_dup_windows: dict[int, int] = {}
    for d, toks in docs.items():
        starts = []
        for i in range(len(toks) - L + 1):
            h = hashlib.md5(
                ",".join(str(x) for x in toks[i : i + L]).encode()
            ).hexdigest()
            if h in dups:
                starts.append(i + 1)  # 1-based
        covered = set()
        for s in starts:
            covered.update(range(s, s + L))
        kept[d] = [t for p, t in enumerate(toks, start=1) if p not in covered]
        n_dup_windows[d] = len(starts)
    return dups, kept, n_dup_windows


def test_scrub_matches_python_reference(spark):
    docs_df = _span_docs(spark, SF).limit(300)
    docs = {
        r["ordinal"]: list(r["tokens"]) for r in docs_df.collect()
    }
    dups, kept, ndw = _py_reference(docs, _SPAN_L)

    got_dups = {
        r["span_hash"]
        for r in dup_spans(docs_df, "ordinal", "tokens", _SPAN_L).collect()
    }
    assert got_dups == dups

    out = {
        r["ordinal"]: (list(r["tokens_clean"]), r["n_dup_windows"])
        for r in scrub_dup_spans(
            docs_df, "ordinal", "tokens", _SPAN_L
        ).collect()
    }
    assert set(out) == set(docs)
    for d in docs:
        assert out[d][0] == kept[d], f"doc {d}: kept arrays differ"
        assert out[d][1] == ndw[d], f"doc {d}: dup-window count differs"


def test_short_doc_yields_no_windows_and_survives_whole(spark):
    df = spark.createDataFrame(
        [(1, list(range(_SPAN_L - 1))), (2, [])],
        "ordinal long, tokens array<int>",
    )
    assert span_windows(df, "ordinal", "tokens", _SPAN_L).count() == 0
    rows = {
        r["ordinal"]: (list(r["tokens_clean"]), r["n_dup_windows"])
        for r in scrub_dup_spans(df, "ordinal", "tokens", _SPAN_L).collect()
    }
    assert rows[1] == (list(range(_SPAN_L - 1)), 0)
    assert rows[2] == ([], 0)


def test_identical_docs_scrub_to_empty(spark):
    toks = list(range(100, 100 + _SPAN_L + 3))
    df = spark.createDataFrame(
        [(1, toks), (2, toks)], "ordinal long, tokens array<int>"
    )
    rows = {
        r["ordinal"]: list(r["tokens_clean"])
        for r in scrub_dup_spans(df, "ordinal", "tokens", _SPAN_L).collect()
    }
    # every position of both docs is covered by a duplicated window
    assert rows[1] == [] and rows[2] == []


def test_dup_spans_plan_single_partial_agg_shuffle(spark):
    df = REGISTRY["tok_dup_spans"].fn(spark, SF)
    p = df._jdf.queryExecution().executedPlan().toString()
    # map-only window hashing feeding ONE span_hash shuffle with a
    # map-side partial aggregate; the countDistinct adds its expand
    # within the same exchange pair
    assert "HashAggregate" in p
    assert p.count("Exchange") <= 2, p
    assert "Generate explode" in p or "Generate posexplode" in p, p
