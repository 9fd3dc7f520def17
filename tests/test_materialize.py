"""Preimage-bearing change feed (Delta CDF parity) + incrementally
maintained materialized aggregates (operators/materialize.py)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwery_spark.lake.changes import read_changes
from qwery_spark.lake.merge import append_changes
from qwery_spark.lake.table import LakeTable
from qwery_spark.operators.materialize import build_agg, update_agg

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)
_DDL = "doc_id long, lang string, n_chars long, op string, ordinal long"


def _mk_src(spark, path, n=30):
    src = LakeTable.create(path, _SCHEMA, n_buckets=4, key_col="doc_id",
                           write_mode="mor")
    rows = [(i, ["en", "de", "fr"][i % 3], 100 + i, "U", i) for i in range(n)]
    append_changes(spark, src, spark.createDataFrame(rows, _DDL))
    return src


def _recompute(spark, src):
    return sorted(
        tuple(r)
        for r in src.read(spark)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("n_chars").cast("double")).alias("sum_n_chars"),
        )
        .collect()
    )


def _rollup(spark, agg):
    return sorted(
        tuple(r)
        for r in agg.read(spark).select("lang", "n_rows", "sum_n_chars").collect()
    )


def test_feed_emits_preimage_rows_with_old_payload(spark, tmp_table_dir):
    src = _mk_src(spark, tmp_table_dir + "/src")
    v1 = src.current_version()
    append_changes(spark, src, spark.createDataFrame(
        [(0, "de", 999, "U", 100)], _DDL))
    rows = read_changes(spark, src, v1, include_preimages=True).collect()
    by_type = {r["_change_type"]: r for r in rows}
    assert set(by_type) == {"update_preimage", "update_postimage"}
    pre, post = by_type["update_preimage"], by_type["update_postimage"]
    assert (pre["lang"], pre["n_chars"], pre["_ordinal"]) == ("en", 100, 0)
    assert (post["lang"], post["n_chars"], post["_ordinal"]) == ("de", 999, 100)
    # default mode unchanged: no preimage rows
    default = read_changes(spark, src, v1).collect()
    assert [r["_change_type"] for r in default] == ["update_postimage"]


def test_incremental_agg_matches_recompute_across_windows(spark, tmp_table_dir):
    """Three windows applied in order — inserts, group-moving updates,
    deletes, including a group emptied entirely — always equal the
    from-scratch recompute."""
    src = _mk_src(spark, tmp_table_dir + "/src", n=12)
    agg = build_agg(spark, src, tmp_table_dir + "/agg", "lang", ["n_chars"])
    assert _rollup(spark, agg) == _recompute(spark, src)

    windows = [
        # window 1: inserts + a value update
        [(50, "es", 7, "U", 200), (51, "es", 8, "U", 201),
         (1, "de", 5000, "U", 202)],
        # window 2: group moves
        [(0, "fr", 1, "U", 300), (3, "de", 2, "U", 301)],
        # window 3: empty out 'es' entirely + one more delete
        [(50, None, None, "D", 400), (51, None, None, "D", 401),
         (2, None, None, "D", 402)],
    ]
    for batch in windows:
        v = src.current_version()
        append_changes(spark, src, spark.createDataFrame(batch, _DDL))
        update_agg(spark, src, agg, "lang", ["n_chars"], from_version=v)
        assert _rollup(spark, agg) == _recompute(spark, src)
    # 'es' must be GONE from the rollup, not present with count 0
    assert agg.read(spark).filter("lang = 'es'").count() == 0


def test_agg_window_replay_is_idempotent(spark, tmp_table_dir):
    src = _mk_src(spark, tmp_table_dir + "/src", n=9)
    agg = build_agg(spark, src, tmp_table_dir + "/agg", "lang", ["n_chars"])
    v = src.current_version()
    append_changes(spark, src, spark.createDataFrame(
        [(0, "de", 999, "U", 100), (7, None, None, "D", 101)], _DDL))
    update_agg(spark, src, agg, "lang", ["n_chars"], from_version=v)
    once = _rollup(spark, agg)
    # replay the SAME window: epoch key absorbs it, state unchanged
    st = update_agg(spark, src, agg, "lang", ["n_chars"], from_version=v)
    assert _rollup(spark, agg) == once
    assert once == _recompute(spark, src)


def test_agg_empty_window_is_noop(spark, tmp_table_dir):
    src = _mk_src(spark, tmp_table_dir + "/src", n=6)
    agg = build_agg(spark, src, tmp_table_dir + "/agg", "lang", ["n_chars"])
    v = src.current_version()
    st = update_agg(spark, src, agg, "lang", ["n_chars"], from_version=v)
    assert st.groups_touched == 0 and st.snapshot_version is None


def test_scd2_incremental_history(spark, tmp_table_dir):
    """SCD2 maintained from the feed alone: updates close+reopen,
    deletes close at the tombstone ordinal, replays no-op, and a second
    window continues the history (close the reopened version)."""
    from qwery_spark.operators.materialize import build_scd2, update_scd2

    src = _mk_src(spark, tmp_table_dir + "/src", n=5)
    v1 = src.current_version()
    hist = build_scd2(spark, src, tmp_table_dir + "/hist")
    assert hist.read(spark).count() == 5
    assert hist.read(spark).filter("valid_to IS NOT NULL").count() == 0

    append_changes(spark, src, spark.createDataFrame(
        [(0, "de", 777, "U", 100), (1, None, None, "D", 101),
         (9, "fr", 5, "U", 102)], _DDL))
    update_scd2(spark, src, hist, from_version=v1)

    def rows():
        return sorted(
            (r["doc_id"], r["lang"], r["n_chars"], r["valid_from"],
             r["valid_to"])
            for r in hist.read(spark).collect()
        )

    got = rows()
    assert (0, "en", 100, 0, 100) in got          # closed by the update
    assert (0, "de", 777, 100, None) in got       # reopened
    assert (1, "de", 101, 1, 101) in got          # closed by the delete
    assert (9, "fr", 5, 102, None) in got         # fresh insert
    assert len(got) == 7

    # replay no-ops
    v2_state = got
    update_scd2(spark, src, hist, from_version=v1)
    assert rows() == v2_state

    # next window: update the reopened doc 0 again
    v2 = src.current_version()
    append_changes(spark, src, spark.createDataFrame(
        [(0, "es", 1, "U", 200)], _DDL))
    update_scd2(spark, src, hist, from_version=v2)
    got = rows()
    assert (0, "de", 777, 100, 200) in got        # second version closed
    assert (0, "es", 1, 200, None) in got
    # exactly one open version per live key
    import collections

    open_per_key = collections.Counter(
        d for (d, _l, _n, _vf, vt) in got if vt is None
    )
    assert all(v == 1 for v in open_per_key.values())


def test_agg_null_values_match_sql_sum_semantics(spark, tmp_table_dir):
    """NULL sum values must neither wipe the accumulator nor fake a 0
    sum: SQL SUM skips NULLs and is NULL over an all-NULL group — the
    rollup's non-null counters reproduce that exactly."""
    src = _mk_src(spark, tmp_table_dir + "/src", n=6)
    agg = build_agg(spark, src, tmp_table_dir + "/agg", "lang", ["n_chars"])
    # window: a NULL-valued insert into 'en' (sum must stay put) and a
    # brand-new group of only NULL values (sum must be NULL, not 0)
    v = src.current_version()
    append_changes(spark, src, spark.createDataFrame(
        [(60, "en", None, "U", 200),
         (61, "zz", None, "U", 201), (62, "zz", None, "U", 202)], _DDL))
    update_agg(spark, src, agg, "lang", ["n_chars"], from_version=v)
    assert _rollup(spark, agg) == _recompute(spark, src)
    zz = agg.read(spark).filter("lang = 'zz'").collect()[0]
    assert zz["n_rows"] == 2 and zz["sum_n_chars"] is None
    # the all-NULL group gains a real value -> sum appears
    v = src.current_version()
    append_changes(spark, src, spark.createDataFrame(
        [(63, "zz", 41, "U", 300)], _DDL))
    update_agg(spark, src, agg, "lang", ["n_chars"], from_version=v)
    assert _rollup(spark, agg) == _recompute(spark, src)


def _recompute_mm(spark, src):
    return sorted(
        tuple(r)
        for r in src.read(spark)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(F.col("n_chars").cast("double")).alias("min_n_chars"),
            F.max(F.col("n_chars").cast("double")).alias("max_n_chars"),
        )
        .collect()
    )


def _rollup_mm(spark, agg):
    return sorted(
        tuple(r)
        for r in agg.read(spark)
        .select("lang", "n_rows", "min_n_chars", "max_n_chars")
        .collect()
    )


def test_minmax_incremental_with_retraction_fallback(spark, tmp_table_dir):
    """MIN/MAX rollup: additions maintain incrementally (0 recomputes);
    a delete-the-max / update-the-min window recomputes ONLY the
    affected groups from the base — always equal to the from-scratch
    recompute."""
    src = _mk_src(spark, tmp_table_dir + "/src", n=12)
    # en: 100,103,106,109  de: 101,104,107,110  fr: 102,105,108,111
    agg = build_agg(
        spark, src, tmp_table_dir + "/agg", "lang", [],
        min_cols=["n_chars"], max_cols=["n_chars"],
    )
    assert _rollup_mm(spark, agg) == _recompute_mm(spark, src)

    def apply_window(rows):
        v = src.current_version()
        append_changes(spark, src, spark.createDataFrame(rows, _DDL))
        return update_agg(
            spark, src, agg, "lang", [], from_version=v,
            min_cols=["n_chars"], max_cols=["n_chars"],
        )

    # additions only (new group + wider max on en): no base read
    st = apply_window(
        [(50, "es", 7, "U", 200), (9, "en", 5000, "U", 201)]
    )
    # doc 9 update retracts en's old MAX (109)? no — 109 < 5000 was
    # en's max, so the update's preimage (109) DOES reach the stored
    # max => en recomputes; the new 'es' group must not
    assert st.groups_recomputed == 1
    assert _rollup_mm(spark, agg) == _recompute_mm(spark, src)

    # delete-the-max: es loses nothing (7 is both min+max -> emptied
    # group), de loses its max 110
    st = apply_window(
        [(10, None, None, "D", 300), (50, None, None, "D", 301)]
    )
    assert st.groups_recomputed >= 1
    assert _rollup_mm(spark, agg) == _recompute_mm(spark, src)

    # interior delete (fr 105 is neither min nor max): purely
    # incremental, zero recomputes
    st = apply_window([(5, None, None, "D", 400)])
    assert st.groups_recomputed == 0
    assert _rollup_mm(spark, agg) == _recompute_mm(spark, src)

    # update-the-min: fr's min 102 moves up; and NULL values never
    # participate in extrema
    st = apply_window(
        [(2, "fr", 9999, "U", 500), (60, "fr", None, "U", 501)]
    )
    assert st.groups_recomputed == 1
    assert _rollup_mm(spark, agg) == _recompute_mm(spark, src)


def test_minmax_with_sums_combined(spark, tmp_table_dir):
    """min/max ride the same window as count/sum deltas in one
    update_agg call and one rollup commit."""
    src = _mk_src(spark, tmp_table_dir + "/src", n=9)
    agg = build_agg(
        spark, src, tmp_table_dir + "/agg", "lang", ["n_chars"],
        min_cols=["n_chars"], max_cols=["n_chars"],
    )
    v = src.current_version()
    append_changes(spark, src, spark.createDataFrame(
        [(8, None, None, "D", 100), (70, "en", 1, "U", 101)], _DDL))
    update_agg(spark, src, agg, "lang", ["n_chars"], from_version=v,
               min_cols=["n_chars"], max_cols=["n_chars"])
    got = sorted(
        tuple(r) for r in agg.read(spark)
        .select("lang", "n_rows", "sum_n_chars", "min_n_chars", "max_n_chars")
        .collect()
    )
    want = sorted(
        tuple(r) for r in src.read(spark)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("n_chars").cast("double")).alias("sum_n_chars"),
            F.min(F.col("n_chars").cast("double")).alias("min_n_chars"),
            F.max(F.col("n_chars").cast("double")).alias("max_n_chars"),
        )
        .collect()
    )
    assert got == want


def test_update_agg_schema_mismatch_fails_actionably(spark, tmp_table_dir):
    """A rollup built without min/max columns + an update asking for
    them must fail ONCE with the mismatch named — not crash every
    window with an unresolved-column error (the restarted-follower-
    with-new-flags case)."""
    src = _mk_src(spark, tmp_table_dir + "/src", n=9)
    agg = build_agg(spark, src, tmp_table_dir + "/agg", "lang", ["n_chars"])
    v = src.current_version()
    append_changes(spark, src, spark.createDataFrame(
        [(50, "es", 7, "U", 100)], _DDL))
    with pytest.raises(ValueError, match="min_n_chars"):
        update_agg(spark, src, agg, "lang", ["n_chars"], from_version=v,
                   min_cols=["n_chars"])
