"""Event-time windows, watermark dedup, and the applyInPandasWithState
custom stateful operator (state persists across micro-batches)."""

import os

from pyspark.sql import functions as F

from qwery_spark.datagen import make_events, write_event_chunks
from qwery_spark.schema import EVENT_SCHEMA
from qwery_spark.streaming.stateful import key_progress, windowed_counts


def test_windowed_counts_matches_batch(spark):
    sf = "/root/testdata/sf0.001"
    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(sf)
    # only events.parquet lives there? no — the dir has all tables; point
    # at the single file via glob
    stream = spark.readStream.schema(schema).option(
        "pathGlobFilter", "events.parquet"
    ).parquet(sf)
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM win_out")
    batch = spark.read.parquet(f"{sf}/events.parquet")
    exp = batch.groupBy(F.window("ts", "1 hour")).agg(F.count("*").alias("n"))
    # append mode emits only windows closed by the watermark; every
    # emitted window must match the batch computation exactly
    got_rows = {r["window_start"]: r["n"] for r in got.collect()}
    exp_rows = {r["window"]["start"]: r["n"] for r in exp.collect()}
    assert got_rows, "no windows emitted"
    for ws, n in got_rows.items():
        assert exp_rows[ws] == n


def test_key_progress_state_across_batches(spark, tmp_table_dir):
    events = make_events(3000, seed=71)
    ev_dir = os.path.join(tmp_table_dir, "events")
    write_event_chunks(events, ev_dir, 6)
    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(ev_dir)
    q = (
        key_progress(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("progress_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    # last update per key == full-batch totals (state carried across the
    # 6 micro-batches)
    pdf = spark.sql("SELECT * FROM progress_out").toPandas()
    final = pdf.groupby("doc_id").last()  # memory sink appends updates in order
    batch = events.to_pandas()
    batch = batch[batch.doc_id.notna()]
    exp = batch.groupby("doc_id").agg(
        events_seen=("ordinal", "size"),
        tokens_seen=("n_tok", lambda s: int(s.fillna(0).sum())),
        last_ordinal=("ordinal", "max"),
    )
    # spot-check the busiest keys plus totals
    assert final["events_seen"].sum() >= exp["events_seen"].sum()
    hot = exp.sort_values("events_seen", ascending=False).head(5)
    for k, row in hot.iterrows():
        got = final.loc[k]
        assert got["events_seen"] == row["events_seen"], k
        assert got["tokens_seen"] == row["tokens_seen"], k
        assert got["last_ordinal"] == row["last_ordinal"], k
