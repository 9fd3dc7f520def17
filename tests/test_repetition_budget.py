"""Unit + plan coverage for the Gopher-style repetition stats (zero
shuffle) and the per-group token-budget sampler (distributed grouped
cumsum — no per-group single-task window)."""

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from qwery_spark.operators.rank import with_group_cumsum
from qwery_spark.operators.text import repetition_stats, token_budget_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_hand_values(spark):
    df = _docs(
        spark,
        [
            # 6 words, all distinct; bigrams all distinct -> top count 1
            (1, "a b c d e f"),
            # "x x x x": dup_frac = 3/4; bigrams [x x, x x, x x] -> top 3
            (2, "x x x x"),
            # alternating: dup 4/6; bigrams: 'a b' x3? -> a b a b a b:
            # bigrams [a b, b a, a b, b a, a b] -> top 3 of 5
            (3, "a b a b a b"),
            (4, "solo"),  # 1 word, no bigrams
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(df, "doc_id", "text").collect()
    }
    assert out[1]["dup_word_frac"] == 0.0
    assert out[1]["top_bigram_count"] == 1
    assert out[2]["dup_word_frac"] == 0.75
    assert out[2]["top_bigram_count"] == 3
    assert out[2]["top_bigram_frac"] == 1.0
    assert out[2]["is_repetitive"]
    assert out[3]["top_bigram_count"] == 3
    assert round(out[3]["top_bigram_frac"], 6) == 0.6
    assert out[4]["n_words"] == 1
    assert out[4]["top_bigram_count"] == 0
    assert out[4]["top_bigram_frac"] == 0.0


def test_repetition_stats_zero_shuffle_plan(spark):
    df = _docs(spark, [(1, "a b c")])
    plan = (
        repetition_stats(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # the whole operator is one map stage


def test_group_cumsum_matches_window(spark):
    # random-ish values over few groups; oracle = plain per-group window
    rows = [
        (i, f"g{i % 3}", (i * 37) % 11 + 1, f"{(i * 2654435761) % 997:04d}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v int, o string")
    got = with_group_cumsum(df, "g", ["o"], "v", cum_col="cum").toPandas()
    w = Window.partitionBy("g").orderBy("o")
    exp = df.withColumn("cum", F.sum("v").over(w).cast("bigint")).toPandas()
    g = got.sort_values(["g", "o"]).reset_index(drop=True)
    e = exp.sort_values(["g", "o"]).reset_index(drop=True)
    pd.testing.assert_series_equal(g["cum"], e["cum"])


def test_group_cumsum_no_single_partition(spark):
    rows = [(i, "only_group", 1, f"{i:05d}") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, g string, v int, o string")
    out = with_group_cumsum(df, "g", ["o"], "v", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # ONE group must still not serialize through a single-task window
    assert "SinglePartition" not in plan
    assert out.count() == 50


def test_token_budget_sample_caps_each_group(spark):
    rows = []
    for g in ("a", "b"):
        for i in range(40):
            did = (0 if g == "a" else 1000) + i
            rows.append((did, g, "w " * 10))  # 10-11 tokens per doc
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = token_budget_sample(df, "doc_id", "text", "source", budget=50).toPandas()
    per = out.groupby("source")["n_tok"].sum()
    # every group cut: kept-total >= budget only via the straddling doc
    for g in ("a", "b"):
        assert 50 <= per[g] <= 50 + 11, per
    # deterministic: same call -> same doc ids
    out2 = token_budget_sample(df, "doc_id", "text", "source", budget=50).toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_token_budget_small_group_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "tiny", "a b c"), (2, "tiny", "d e")],
        "doc_id long, source string, text string",
    )
    out = token_budget_sample(df, "doc_id", "text", "source", budget=100)
    assert out.count() == 2  # under budget: nothing dropped
