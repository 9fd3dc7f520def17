"""Property-based soundness of the changelog diff pruning
(lake/changes._diff_pruning): for RANDOM op sequences — appends,
old/new-key updates, deletes, interleaved compactions (plain, binpack and
key-sorted) — every feed mode must return exactly the same rows with
pruning on as with pruning forced off. Both key-set gate knobs (depth
floor AND kept/added ratio) are dropped so the exact-key path fires on
the tiny tables too.

hypothesis drives the generator (derandomized for driver stability;
deadline off — Spark latency is not the property)."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import qwery_spark.lake.changes as ch
from qwery_spark.lake.changes import read_changes

# captured at import time: the restore target can never be a leaked
# disable-lambda from an earlier failed example
_REAL_ADDED_KEY_RANGE = ch._added_key_range
from qwery_spark.lake.merge import append_changes, binpack, compact
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import TARGET_SCHEMA


@st.composite
def op_sequences(draw):
    n_commits = draw(st.integers(min_value=2, max_value=6))
    rng_seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(rng_seed)
    commits = []
    next_key = 0
    ordinal = 0
    live = []
    for _ in range(n_commits):
        kind = rng.choice(["append", "mixed", "compact", "compact_sorted",
                           "binpack"],
                          p=[0.35, 0.3, 0.15, 0.1, 0.1])
        if kind in ("compact", "compact_sorted", "binpack") and not live:
            kind = "append"
        if kind.startswith("compact") or kind == "binpack":
            commits.append((kind, []))
            continue
        rows = []
        n_new = int(rng.integers(1, 6))
        for _ in range(n_new):
            rows.append(("U", f"doc-{next_key:04d}", ordinal))
            live.append(next_key)
            next_key += 1
            ordinal += 1
        if kind == "mixed" and live:
            for _ in range(int(rng.integers(1, 4))):
                k = int(rng.choice(live))
                op = "D" if rng.random() < 0.4 else "U"
                rows.append((op, f"doc-{k:04d}", ordinal))
                ordinal += 1
        commits.append(("data", rows))
    lo_frac = draw(st.floats(min_value=0.0, max_value=0.8))
    window = draw(st.sampled_from([None, 1, 2]))
    return commits, lo_frac, window, rng_seed


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=op_sequences())
def test_pruned_feed_always_equals_unpruned(spark, tmp_path_factory, seq,
                                            monkeypatch):
    commits, lo_frac, window, _ = seq
    # both gate knobs off so the exact-key-set path actually fires on
    # the tiny generated tables (floor alone leaves the 100x ratio)
    monkeypatch.setattr(ch, "_KEY_SET_MIN_KEPT_ROWS", 0)
    monkeypatch.setattr(ch, "_KEY_SET_MIN_RATIO", 0)
    d = str(tmp_path_factory.mktemp("chprop"))
    tbl = LakeTable.create(d + "/t", TARGET_SCHEMA, n_buckets=2,
                           write_mode="mor")
    for kind, rows in commits:
        if kind == "compact":
            compact(spark, tbl)
            continue
        if kind == "compact_sorted":
            compact(spark, tbl, sort_cols=["doc_id"])
            continue
        if kind == "binpack":
            # partial rewrite: removes files without replacing whole
            # buckets — the pruning layer must detect the non-additive
            # range through remove_paths and fall back soundly
            binpack(spark, tbl, min_files=2)
            continue
        df = spark.createDataFrame(
            [(k, [1, 2] if op == "U" else None,
              2 if op == "U" else None,
              "web" if op == "U" else None, op, o)
             for op, k, o in rows],
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "op string, ordinal long",
        )
        append_changes(spark, tbl, df)

    head = tbl.current_version()
    lo = int(lo_frac * head)

    def feed_rows(**kw):
        return sorted(
            tuple(sorted((c, str(v)) for c, v in r.asDict().items()))
            for r in read_changes(spark, tbl, lo, **kw).collect()
        )

    variants = [
        dict(granular=True, include_preimages=True),
        dict(granular=False, include_preimages=True),
    ]
    if window:
        variants.append(dict(window=window, include_preimages=True))
    on = [feed_rows(**kw) for kw in variants]
    # plain try/finally (NOT the example-spanning monkeypatch fixture):
    # a Spark error mid-'off' must not leave pruning disabled for every
    # later hypothesis example, which would make on == off vacuous
    real = _REAL_ADDED_KEY_RANGE
    try:
        ch._added_key_range = lambda *a, **k: None
        off = [feed_rows(**kw) for kw in variants]
    finally:
        ch._added_key_range = real
    assert on == off
