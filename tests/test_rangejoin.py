"""range_join: bin-bucketized interval join (no nested-loop plan)."""

from pyspark.sql import functions as F

from qwery_spark.operators.rangejoin import range_join


def _fixtures(spark):
    pts = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 100)], "pt long, val double"
    )
    iv = spark.createDataFrame(
        [(0, 10, 19), (1, 15, 40), (2, 90, 99), (3, 200, 300)],
        "iv_id long, lo long, hi long",
    )
    return pts, iv


def test_range_join_matches_between_semantics(spark):
    pts, iv = _fixtures(spark)
    got = range_join(pts, iv, "pt", "lo", "hi", bin_width=16).collect()
    # reference: brute-force BETWEEN
    exp = {(p, i) for p in range(100) for i, (lo, hi) in
           enumerate([(10, 19), (15, 40), (90, 99), (200, 300)]) if lo <= p <= hi}
    assert {(r["pt"], r["iv_id"]) for r in got} == exp
    # overlapping intervals yield one row per (point, interval) pair
    assert len(got) == len(exp)


def test_range_join_left_keeps_unmatched_points(spark):
    pts, iv = _fixtures(spark)
    out = range_join(pts, iv, "pt", "lo", "hi", bin_width=16, how="left")
    unmatched = out.filter(F.col("iv_id").isNull()).count()
    matched_pts = {r["pt"] for r in out.filter(F.col("iv_id").isNotNull()).collect()}
    exp_matched = {p for p in range(100) if 10 <= p <= 40 or 90 <= p <= 99}
    assert matched_pts == exp_matched
    assert unmatched == 100 - len(exp_matched)


def test_range_join_plan_has_no_nested_loop(spark):
    pts, iv = _fixtures(spark)
    p = (
        range_join(pts, iv, "pt", "lo", "hi", bin_width=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in p and "Cartesian" not in p
    assert "Join" in p


def test_range_join_rejects_overlapping_columns(spark):
    import pytest

    pts = spark.createDataFrame([(1, 2)], "pt long, lo long")
    iv = spark.createDataFrame([(1, 2, 3)], "iv long, lo long, hi long")
    with pytest.raises(ValueError, match="overlapping"):
        range_join(pts, iv, "pt", "lo", "hi", bin_width=8)


def test_range_join_negative_values(spark):
    pts = spark.createDataFrame([(-10,), (-5,), (0,), (5,)], "pt long")
    iv = spark.createDataFrame([(0, -7, 1)], "iv_id long, lo long, hi long")
    got = {r["pt"] for r in range_join(pts, iv, "pt", "lo", "hi", bin_width=4).collect()}
    assert got == {-5, 0}


def test_range_join_guards(spark):
    import pytest

    pts = spark.createDataFrame([(1,)], "pt long")
    iv = spark.createDataFrame([(0, 0, 2)], "iv_id long, lo long, hi long")
    with pytest.raises(ValueError, match="bin_width"):
        range_join(pts, iv, "pt", "lo", "hi", bin_width=0)
    pts_bin = spark.createDataFrame([(1, 9)], "pt long, _bin long")
    with pytest.raises(ValueError, match="reserved"):
        range_join(pts_bin, iv, "pt", "lo", "hi", bin_width=8)


def test_range_join_property_random(spark):
    """Random intervals/points vs a brute-force python oracle across
    several bin widths (boundaries, overlaps, empty intervals sets)."""
    import random

    rng = random.Random(99)
    pts_rows = [(i, rng.randint(-50, 250)) for i in range(120)]
    iv_rows = []
    for j in range(25):
        lo = rng.randint(-60, 240)
        iv_rows.append((j, lo, lo + rng.randint(0, 70)))
    pts = spark.createDataFrame(pts_rows, "pid long, pt long")
    iv = spark.createDataFrame(iv_rows, "iv_id long, lo long, hi long")
    exp = {
        (pid, j)
        for pid, p in pts_rows
        for j, lo, hi in iv_rows
        if lo <= p <= hi
    }
    for bw in (1, 7, 64, 1000):
        got = {
            (r["pid"], r["iv_id"])
            for r in range_join(pts, iv, "pt", "lo", "hi", bin_width=bw).collect()
        }
        assert got == exp, f"bin_width={bw}"


def test_interval_join_overlap_semantics_and_no_duplicates(spark):
    """interval_join: exactly one row per overlapping pair, even when a
    pair shares many bins (canonical-bin emission, no distinct)."""
    from qwery_spark.operators.rangejoin import interval_join

    left = spark.createDataFrame(
        [(0, 0, 100), (1, 50, 60), (2, 200, 210), (3, 95, 105)],
        "l_id long, l_lo long, l_hi long",
    )
    right = spark.createDataFrame(
        [(10, 90, 300), (11, 0, 10), (12, 400, 500)],
        "r_id long, r_lo long, r_hi long",
    )
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_join(left, right, "l_lo", "l_hi", "r_lo", "r_hi",
                               bin_width=16).collect()
    )
    exp = sorted(
        (l, r)
        for l, llo, lhi in [(0, 0, 100), (1, 50, 60), (2, 200, 210), (3, 95, 105)]
        for r, rlo, rhi in [(10, 90, 300), (11, 0, 10), (12, 400, 500)]
        if llo <= rhi and rlo <= lhi
    )
    assert got == exp


def test_interval_join_property_random(spark):
    import random

    from qwery_spark.operators.rangejoin import interval_join

    rng = random.Random(5)
    lrows = [(i, lo := rng.randint(-40, 200), lo + rng.randint(0, 90)) for i in range(40)]
    rrows = [(j, lo := rng.randint(-40, 200), lo + rng.randint(0, 90)) for j in range(35)]
    left = spark.createDataFrame(lrows, "l_id long, l_lo long, l_hi long")
    right = spark.createDataFrame(rrows, "r_id long, r_lo long, r_hi long")
    exp = sorted(
        (l, r)
        for l, llo, lhi in lrows
        for r, rlo, rhi in rrows
        if llo <= rhi and rlo <= lhi
    )
    for bw in (3, 32, 512):
        got = sorted(
            (r["l_id"], r["r_id"])
            for r in interval_join(left, right, "l_lo", "l_hi", "r_lo", "r_hi",
                                   bin_width=bw).collect()
        )
        assert got == exp, f"bin_width={bw}"


def test_interval_join_plan_no_nested_loop(spark):
    from qwery_spark.operators.rangejoin import interval_join

    left = spark.createDataFrame([(0, 0, 10)], "l_id long, l_lo long, l_hi long")
    right = spark.createDataFrame([(1, 5, 15)], "r_id long, r_lo long, r_hi long")
    p = (
        interval_join(left, right, "l_lo", "l_hi", "r_lo", "r_hi", bin_width=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in p and "Cartesian" not in p
