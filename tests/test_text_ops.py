"""pii_scrub / decontaminate operator units (the suite oracles check
values at corpus scale; these pin the API edges + the broadcast plan)."""

from pyspark.sql import functions as F

from qwery_spark.operators.text import decontaminate, pii_scrub


def test_pii_scrub_counts_and_replacement(spark):
    df = spark.createDataFrame(
        [
            (1, "reach a@b.co or c.d+x@e.org and call 555-123-4567 now"),
            (2, "no pii here"),
            (3, "only 555-000-1111 and 555-000-2222"),
        ],
        "id int, text string",
    )
    rows = {r["id"]: r for r in pii_scrub(df, "text").collect()}
    assert (rows[1]["n_email"], rows[1]["n_phone"]) == (2, 1)
    assert rows[1]["text_scrubbed"] == "reach <email> or <email> and call <phone> now"
    assert (rows[2]["n_email"], rows[2]["n_phone"]) == (0, 0)
    assert rows[2]["text_scrubbed"] == "no pii here"
    assert rows[3]["n_phone"] == 2 and "<phone> and <phone>" in rows[3]["text_scrubbed"]
    # custom pattern set
    out = pii_scrub(df, "text", {"num": r"\d+"}).collect()[2]
    assert out["n_num"] == 6 and "555" not in out["text_scrubbed"]


def test_decontaminate_counts_and_broadcast_plan(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),   # shares 2 distinct 3-grams
            (2, "zeta eta theta iota"),      # shares none
            (3, "alpha beta gamma"),         # shares 1
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon")], "doc_id int, text string"
    )
    out = decontaminate(corpus, bench, "doc_id", "text", n=3)
    assert {(r["doc_id"], r["n_shared"]) for r in out.collect()} == {(1, 2), (3, 1)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
