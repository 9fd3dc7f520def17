"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is a
deterministic stub (documented NotImplementedError escape hatch for
real codecs) — but the Spark-side plumbing is real and tested: binary
columns, Arrow-batched mapInPandas with explicit output schema,
partition-sized batches, metadata extraction.

Binary payloads are synthesized from documents.text (utf-8 encode), so
the byte-level results are oracle-checkable in DuckDB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F

from qwery_spark.suite import load, register

MM_OUT_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, content_md5 string, "
    "feat_dim int, decode_status string"
)


def decode_media(payload: bytes, media_type: str):
    """Stub decoder. Real deployments plug PIL/librosa/av here; the
    container ships none of them, so decoding raises — callers must
    treat 'unsupported' as a quarantine-style status, never a crash."""
    raise NotImplementedError(f"no codec for {media_type} in this environment")


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow-batched, vectorized per batch (bulk
    byte-length via pandas str ops; md5 per element is C-speed hashlib)."""
    for pdf in batches:
        payload = pdf["payload"]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payload.map(len).astype("int32"),
                "content_md5": payload.map(lambda b: hashlib.md5(b).hexdigest()),
                "feat_dim": pd.Series([0] * len(pdf), dtype="int32"),
                "decode_status": "unsupported",  # decode_media() stubbed
            }
        )
        yield out


@register(
    "mm_binary_features",
    """
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
           md5(text) AS content_md5,
           0 AS feat_dim,
           'unsupported' AS decode_status
    FROM documents
    """,
    doc="Multimodal plumbing: binary column -> mapInPandas (Arrow batches) "
    "-> typed feature row. Decode itself is stubbed (no codecs in image); "
    "byte metadata is real and oracle-checked.",
)
def mm_binary_features(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    out = d.mapInPandas(_extract_batches, schema=MM_OUT_SCHEMA)
    return out.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "content_md5",
        F.col("feat_dim").cast("int").alias("feat_dim"),
        "decode_status",
    )


@register(
    "mm_metadata_rollup",
    """
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(CAST(text AS BLOB))) AS INTEGER) AS max_bytes
    FROM documents GROUP BY source
    """,
    doc="Typed-metadata rollup over binary payload sizes per source shard.",
)
def mm_metadata_rollup(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "source", F.octet_length(F.encode("text", "UTF-8")).alias("nb")
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("nb").cast("bigint").alias("total_bytes"),
        F.max("nb").cast("int").alias("max_bytes"),
    )


FRAME_BYTES = 64
FRAME_STRIDE = 4  # sample every 4th frame

_FRAME_SQL = f"""
    SELECT doc_id,
           CAST(ceil(length(text) / {FRAME_BYTES}.0) AS INTEGER) AS n_frames,
           CAST(ceil(ceil(length(text) / {FRAME_BYTES}.0) / {FRAME_STRIDE}.0) AS INTEGER) AS n_sampled,
           md5(array_to_string(list_transform(
                 list_filter(range(0, CAST(ceil(length(text) / {FRAME_BYTES}.0) AS INTEGER)),
                             k -> k % {FRAME_STRIDE} = 0),
                 k -> substr(text, 1 + k * {FRAME_BYTES}, {FRAME_BYTES})), '')) AS sample_md5
    FROM documents
"""


def _frame_sample_batches(batches):
    """mapInPandas worker: byte-level frame slicing + strided sampling of
    the opaque binary payload (video frame-sample / audio-chunk shape).
    The corpus is ASCII so the oracle can mirror byte slices with
    VARCHAR substr; real codecs plug into decode_media()."""
    import hashlib

    import pandas as pd

    for pdf in batches:
        n_frames, n_sampled, digests = [], [], []
        for payload in pdf["payload"]:
            frames = [
                payload[k * FRAME_BYTES : (k + 1) * FRAME_BYTES]
                for k in range(0, -(-len(payload) // FRAME_BYTES))
            ]
            sampled = frames[::FRAME_STRIDE]
            n_frames.append(len(frames))
            n_sampled.append(len(sampled))
            digests.append(hashlib.md5(b"".join(sampled)).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_frames": pd.Series(n_frames, dtype="int32"),
                "n_sampled": pd.Series(n_sampled, dtype="int32"),
                "sample_md5": digests,
            }
        )


@register(
    "mm_frame_sample",
    _FRAME_SQL,
    doc="Multimodal frame sampling: binary payload sliced into fixed-size "
    "frames, every 4th sampled, digest of the sampled bytes — the "
    "video/audio frame-sample plumbing (mapInPandas, Arrow batches) "
    "with a byte-exact oracle (ASCII corpus => VARCHAR slices match).",
)
def mm_frame_sample(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return d.mapInPandas(
        _frame_sample_batches,
        schema="doc_id bigint, n_frames int, n_sampled int, sample_md5 string",
    )
