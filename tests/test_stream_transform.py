"""The qwery-style SELECT-transform stage between stream and MERGE:
a Catalyst-compiled statement rewrites each micro-batch before
validation + upsert (SURVEY §7.0.3 — declarative transform between
source and sink)."""

import os

from pyspark.sql import functions as F

from qwery_spark.cdc.oracle import replay_oracle
from qwery_spark.datagen import make_events, write_event_chunks
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import TARGET_SCHEMA
from qwery_spark.streaming import run_stream


def test_transform_stage_rewrites_batches(spark, tmp_table_dir):
    events = make_events(2000, seed=101)
    ev_dir = os.path.join(tmp_table_dir, "events")
    write_event_chunks(events, ev_dir, 4)
    tbl = LakeTable.create(os.path.join(tmp_table_dir, "t"), TARGET_SCHEMA, n_buckets=4,
                           write_mode="mor")
    # transform: uppercase the source tag + drop all 'books' events
    transform = """
      SELECT ordinal, op, doc_id, tokens, n_tok,
             upper(source) AS source, ddl
      FROM events WHERE source IS NULL OR source <> 'books'
    """
    run = run_stream(spark, tbl, ev_dir, os.path.join(tmp_table_dir, "ckpt"),
                     transform_sql=transform)
    run.query.awaitTermination(300)

    # oracle over the equivalently-transformed event stream
    pdf = events.to_pandas()
    pdf = pdf[(pdf.source.isna()) | (pdf.source != "books")].copy()
    pdf["source"] = pdf["source"].map(lambda s: s.upper() if isinstance(s, str) else s)
    expected, _ = replay_oracle(pdf)
    actual = tbl.read(spark).orderBy("doc_id").toPandas()
    assert list(actual.doc_id) == list(expected.doc_id)
    assert set(actual.source.dropna()) <= {"WEB", "CODE", "WIKI"}
