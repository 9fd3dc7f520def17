"""Property-based soundness of schema-evolution propagation
(lake/changes.sync_schema_from_source): for RANDOM DDL sequences —
adds, renames (including swaps/chains), drops, widens, re-adds of
dropped names — replaying the source's evolution onto a derived table
in arbitrary window splits must land the IDENTICAL user schema (names,
types, order), and replaying any window twice must be a no-op.

Pure metadata: LakeTable DDL commits never touch Spark, so this runs
hundreds of sequences in seconds (derandomized for driver stability).
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qwery_spark.lake.changes import sync_schema_from_source
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import TARGET_SCHEMA

_ENGINE = ("last_ordinal", "_deleted")
_NAMES = [f"c{i}" for i in range(10)]
_ADD_TYPES = ["int", "double", "string"]
_WIDEN = {"int": ["bigint", "double"], "float": ["double"]}


def _user(tbl):
    return [
        (f["name"], f["type"])
        for f in tbl.snapshot().fields()
        if f["name"] not in _ENGINE
    ]


@st.composite
def ddl_walks(draw):
    """A random feasible DDL sequence with one mid-point marker."""
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    n_ops = draw(st.integers(min_value=1, max_value=8))
    cut = draw(st.integers(min_value=0, max_value=n_ops))
    rng = np.random.default_rng(seed)
    # model of the source's user columns, key first (undroppable,
    # unrenameable in this walk)
    model = [("doc_id", "string"), ("tokens", "array<int>"),
             ("n_tok", "int"), ("source", "string")]
    ops = []
    for _ in range(n_ops):
        present = [n for n, _ in model]
        feasible = []
        free = [n for n in _NAMES if n not in present]
        if free:
            feasible.append("add")
        renameable = [n for n in present[1:]]
        if renameable and free:
            feasible.append("rename")
        if len(present) > 1:
            feasible.append("drop")
        widenable = [(n, t) for n, t in model if t in _WIDEN]
        if widenable:
            feasible.append("widen")
        kind = rng.choice(feasible)
        if kind == "add":
            name = free[rng.integers(len(free))]
            typ = _ADD_TYPES[rng.integers(len(_ADD_TYPES))]
            model.append((name, typ))
            ops.append(("add", name, typ))
        elif kind == "rename":
            old = renameable[rng.integers(len(renameable))]
            new = free[rng.integers(len(free))]
            model = [(new if n == old else n, t) for n, t in model]
            ops.append(("rename", old, new))
        elif kind == "drop":
            name = present[1:][rng.integers(len(present) - 1)]
            model = [(n, t) for n, t in model if n != name]
            ops.append(("drop", name, None))
        else:
            name, t = widenable[rng.integers(len(widenable))]
            new_t = _WIDEN[t][rng.integers(len(_WIDEN[t]))]
            model = [(n, new_t if n == name else t2) for n, t2 in model]
            ops.append(("widen", name, new_t))
    return ops, cut, model


def _apply(tbl, op):
    kind, a, b = op
    if kind == "add":
        tbl.add_column(a, b)
    elif kind == "rename":
        tbl.rename_column(a, b)
    elif kind == "drop":
        tbl.drop_column(a)
    else:
        tbl.widen_type(a, b)


@settings(max_examples=60, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(ddl_walks())
def test_random_ddl_replays_exactly_in_any_window_split(tmp_path_factory, walk):
    ops, cut, model = walk
    d = tmp_path_factory.mktemp("sync_prop")
    src = LakeTable.create(str(d / "src"), TARGET_SCHEMA, n_buckets=2,
                           write_mode="mor")
    dst = LakeTable.create(str(d / "dst"), TARGET_SCHEMA, n_buckets=2,
                           write_mode="mor")
    v0 = src.current_version()
    for op in ops[:cut]:
        _apply(src, op)
    v_mid = src.current_version()
    # window 1: replay the first chunk
    sync_schema_from_source(src, dst, v0, v_mid)
    assert _user(dst) == _user(src)
    for op in ops[cut:]:
        _apply(src, op)
    v_end = src.current_version()
    # window 2: replay the rest onto the already-advanced dst
    sync_schema_from_source(src, dst, v_mid, v_end)
    assert _user(dst) == _user(src) == model
    # crash-replay of the last window is a no-op — including the nasty
    # shapes (rename c1->c2 + re-add a new c1 in one window), caught by
    # the window-level already-applied guard, not just per-op guards
    assert sync_schema_from_source(src, dst, v_mid, v_end) == 0
    # full-range replay against the completed state is a no-op too
    assert sync_schema_from_source(src, dst, v0, v_end) == 0
