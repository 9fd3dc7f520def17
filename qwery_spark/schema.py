"""Canonical schemas for the CDC engine.

The target table shape is fixed by BASELINE.json input_hint:
  (doc_id string, tokens array<int32>, n_tok int32, source string)
plus two engine-maintained columns:
  last_ordinal int64  -- highest applied change ordinal per key
                         (cross-batch last-writer-wins guard)
  _deleted boolean    -- tombstone flag; public reads filter it out.
                         Tombstones preserve the LWW guard for keys
                         whose latest applied event was a delete, so a
                         late low-ordinal update cannot resurrect them.

Change-event shape mirrors a binlog/WAL tail (reference analogue:
qwery's Record(data, offset, partition) where every record carries an
offset ordinal — core:devices/Record.scala:9 — and UPSERT KEYED ON's
stream-order last-writer-wins — core:ops/sql/Upsert.scala:14-33).
"""

from __future__ import annotations

from pyspark.sql import types as T

VOCAB_SIZE = 50257  # GPT-2-ish vocab bound used by the validation UDFs

# --- target table (public columns) ------------------------------------
TARGET_FIELDS = [
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), True), True),
    T.StructField("n_tok", T.IntegerType(), True),
    T.StructField("source", T.StringType(), True),
]
TARGET_SCHEMA = T.StructType(TARGET_FIELDS)

# engine-maintained columns (present in physical files, hidden from
# public reads except last_ordinal which lineage queries may use)
ENGINE_FIELDS = [
    T.StructField("last_ordinal", T.LongType(), False),
    T.StructField("_deleted", T.BooleanType(), False),
]
PHYSICAL_SCHEMA = T.StructType(TARGET_FIELDS + ENGINE_FIELDS)

# --- change events (binlog/WAL tail) -----------------------------------
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ordinal", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # I / U / D / DDL
        T.StructField("doc_id", T.StringType(), True),  # null for DDL
        T.StructField("tokens", T.ArrayType(T.IntegerType(), True), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("ddl", T.StringType(), True),  # JSON for op=DDL
    ]
)

# --- quarantine (validation failures; reference analogue: ROWS_REJECTED
# counting without aborting the run, core:ops/ResultSet.scala:26-46) ----
QUARANTINE_SCHEMA = T.StructType(
    list(EVENT_SCHEMA.fields)
    + [
        T.StructField("reject_reason", T.StringType(), False),
        T.StructField("epoch_id", T.LongType(), False),
    ]
)

# --- lineage / metrics table (reference analogue: Statistics — records,
# bytes, failures per run; core:sources/Statistics.scala:17-25) ---------
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        # source partition (kafka partition id; -1 = whole batch when the
        # source carries no partition ordinal). One lineage row per
        # (epoch, partition): offset range + row counts per partition.
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("ordinal_min", T.LongType(), True),
        T.StructField("ordinal_max", T.LongType(), True),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_rejected", T.LongType(), False),
        T.StructField("rows_upserted", T.LongType(), False),
        T.StructField("rows_deleted", T.LongType(), False),
        T.StructField("ddl_applied", T.LongType(), False),
        T.StructField("snapshot_id", T.StringType(), True),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("committed_utc", T.StringType(), False),
    ]
)
