"""Context-length chunking: split per-document token arrays into
fixed-length training windows with a configurable stride (stride <
max_len gives overlapping contexts, the standard LM pretraining
windowing; stride == max_len gives disjoint chunks).

Scale shape: pure per-row generate (posexplode of the start offsets) +
slice — a map-only stage with NO shuffle that preserves the input
partitioning and stays entirely inside whole-stage codegen. At 100 TB
this pipelines with the scan; output row count is sum(ceil(n_i /
stride)) and each output row materializes only its own slice.

The reference engine has no array/chunking surface (its row model is
scalar columns); this operator exists for the training-data pipeline
the engine feeds — turning variable-length documents into model-ready
sequences. Complements operators/packing.py (which packs many SHORT
sequences up to a budget; chunking splits LONG ones).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_tokens(
    df: DataFrame,
    max_len: int,
    stride: int | None = None,
    tokens_col: str = "tokens",
    drop_short: bool = False,
) -> DataFrame:
    """Explode each row into (chunk_id, start_pos, chunk, chunk_len)
    windows over ``tokens_col``.

    Start offsets are 0, stride, 2*stride, ... while < len(tokens), so
    every token lands in at least one chunk and the tail chunk may be
    shorter than ``max_len`` (filtered when ``drop_short`` — the usual
    choice when the model wants only full contexts). Empty arrays and
    NULLs produce no rows. All other input columns pass through.
    """
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    stride = max_len if stride is None else stride
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    n = F.size(F.col(tokens_col))
    passthrough = [c for c in df.columns if c != tokens_col]
    clash = {"chunk_id", "start_pos", "chunk", "chunk_len"} & set(passthrough)
    if clash:
        raise ValueError(
            f"chunk_tokens output names collide with input columns {sorted(clash)};"
            " rename them first"
        )
    out = (
        df.filter(n > 0)
        .select(
            *passthrough,
            F.col(tokens_col),
            F.posexplode(F.sequence(F.lit(0), n - 1, F.lit(stride))).alias(
                "chunk_id", "start_pos"
            ),
        )
        .select(
            *passthrough,
            "chunk_id",
            "start_pos",
            F.slice(F.col(tokens_col), F.col("start_pos") + 1, max_len).alias(
                "chunk"
            ),
        )
        .withColumn("chunk_len", F.size("chunk"))
    )
    if drop_short:
        out = out.filter(F.col("chunk_len") == max_len)
    return out
