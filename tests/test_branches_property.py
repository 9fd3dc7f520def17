"""Property-based branch/rollback semantics: random interleavings of
{main commit, branch commit, publish, reject, rollback} execute against
the lake AND a pure-Python LWW model; live states must match after
every publish/reject/rollback and at the end. Publishes attempted
after main moved past the fork must raise CommitConflict and leave
both main and the stage untouched."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from qwery_spark.lake.merge import append_changes
from qwery_spark.lake.table import CommitConflict, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("v", T.IntegerType()),
    ]
)


@st.composite
def op_sequences(draw):
    n_ops = draw(st.integers(min_value=3, max_value=8))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    ops = []
    ordinal = 1
    next_key = 0
    branch_open = False
    main_since_fork = 0
    n_main_commits = 0
    for _ in range(n_ops):
        choices, p = ["main"], [1.0]
        if branch_open:
            choices += ["branch", "publish", "reject"]
            p = [0.3, 0.3, 0.25, 0.15]
        else:
            choices += ["fork"]
            p = [0.55, 0.45]
            if n_main_commits >= 1:
                choices += ["rollback"]
                p = [0.45, 0.4, 0.15]
        kind = rng.choice(choices, p=np.array(p) / sum(p))
        if kind in ("main", "branch"):
            rows = []
            for _ in range(int(rng.integers(1, 4))):
                if next_key and rng.random() < 0.5:
                    k = int(rng.integers(0, next_key))
                    op = "D" if rng.random() < 0.3 else "U"
                else:
                    k, op = next_key, "U"
                    next_key += 1
                rows.append((f"k{k:03d}", op, ordinal, int(rng.integers(0, 100))))
                ordinal += 1
            ops.append((kind, rows))
            if kind == "main":
                n_main_commits += 1
                if branch_open:
                    main_since_fork += 1
        elif kind == "fork":
            ops.append(("fork", None))
            branch_open, main_since_fork = True, 0
        elif kind == "publish":
            # generator records whether this publish MUST conflict
            ops.append(("publish", main_since_fork > 0))
            if main_since_fork == 0:
                branch_open = False
        elif kind == "reject":
            ops.append(("reject", None))
            branch_open = False
        elif kind == "rollback":
            # resolved to a concrete version at execution time
            ops.append(("rollback", float(rng.random())))
            n_main_commits += 1
    return ops, seed


def _model_apply(state: dict, rows):
    for k, op, o, v in rows:
        cur = state.get(k)
        if cur is None or o > cur[0]:
            state[k] = (o, None if op == "D" else v)


def _model_live(state: dict):
    return sorted((k, v) for k, (o, v) in state.items() if v is not None)


def _engine_live(spark, t):
    return sorted(tuple(r) for r in t.read(spark).collect())


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=op_sequences())
def test_branch_ops_match_model(spark, tmp_path_factory, seq):
    ops, _seed = seq
    d = str(tmp_path_factory.mktemp("brprop"))
    t = LakeTable.create(d + "/t", SCHEMA, n_buckets=2, write_mode="mor")

    main_state: dict = {}
    branch_state: dict | None = None
    main_versions: list[dict] = [dict(main_state)]  # model per version
    br = None
    epoch = 0

    def _commit(target, rows):
        nonlocal epoch
        df = spark.createDataFrame(
            rows, "doc_id string, op string, ordinal long, v int"
        )
        append_changes(spark, target, df, epoch_id=epoch)
        epoch += 1

    for kind, arg in ops:
        if kind == "main":
            _commit(t, arg)
            _model_apply(main_state, arg)
            main_versions.append(dict(main_state))
        elif kind == "fork":
            br = t.create_branch("stage")
            branch_state = dict(main_state)
        elif kind == "branch":
            _commit(br, arg)
            _model_apply(branch_state, arg)
        elif kind == "publish":
            must_conflict = arg
            if must_conflict:
                with pytest.raises(CommitConflict):
                    t.publish_branch("stage")
                # refused: main AND the stage are untouched — the stage
                # stays open (matching the generator's bookkeeping; a
                # later reject can still drop it)
                assert _engine_live(spark, t) == _model_live(main_state)
                assert _engine_live(spark, br) == _model_live(branch_state)
            else:
                t.publish_branch("stage")
                main_state = branch_state
                # the publish appended the branch's commits to main's log
                main_versions.append(dict(main_state))
                br, branch_state = None, None
                assert _engine_live(spark, t) == _model_live(main_state)
        elif kind == "reject":
            t.drop_branch("stage")
            br, branch_state = None, None
            assert _engine_live(spark, t) == _model_live(main_state)
        elif kind == "rollback":
            if br is not None:
                continue  # executor guard; generator avoids this anyway
            head = t.current_version()
            target_v = max(1, min(head, int(arg * head) or 1))
            t.rollback(target_v)
            # model: version list indexes data commits; map the lake
            # version to the model by replaying the lake's own manifest
            # summaries is overkill here — instead assert against a
            # fresh read of the time-travel state, which earlier tests
            # pin to the model independently
            expected = sorted(
                tuple(r)
                for r in t.read(spark, snapshot_version=target_v).collect()
            )
            assert _engine_live(spark, t) == expected
            # resync the model to the restored state
            main_state = {}
            rows = t.read_physical(spark).collect()
            for r in rows:
                main_state[r["doc_id"]] = (
                    r["last_ordinal"], None if r["_deleted"] else r["v"]
                )
            main_versions.append(dict(main_state))

    if br is not None:
        assert _engine_live(spark, br) == _model_live(branch_state)
    assert _engine_live(spark, t) == _model_live(main_state)
