"""Embedding-column transforms for the training/serving pipeline:
L2 normalization and symmetric int8 quantization (the standard 4×
storage/bandwidth cut before ANN serving or shipping vectors to a
feature store).

All pure Catalyst array expressions — map-only, zero shuffle, codegen —
and deterministic across engines: quantization uses the half-up
``floor(x * s + 0.5)`` form (identical in Spark and DuckDB; ``round``
differs — Spark half-up, DuckDB half-even) so the suite can md5 the
quantized integer arrays against an oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _check_collisions(df: DataFrame, out_cols: tuple[str, ...]) -> None:
    # same contract as chunk_tokens: never silently clobber an input
    # column with an operator output
    clash = [c for c in out_cols if c in df.columns]
    if clash:
        raise ValueError(
            f"output column(s) {clash} already exist in the input DataFrame"
        )


def l2_normalize(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Append ``norm`` (the L2 norm, double) and ``unit`` (the
    normalized vector). Zero vectors get norm 0 and a NULL unit —
    callers filter or keep them explicitly."""
    _check_collisions(df, ("norm", "unit"))
    v = _as_double(F.col(emb_col))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    # NaN compares GREATER than any double in Spark, so `norm > 0`
    # alone would pass NaN through and emit all-NaN units
    ok = (F.col("norm") > 0) & ~F.isnan(F.col("norm"))
    return df.withColumn("norm", norm).withColumn(
        "unit",
        F.when(ok, F.transform(v, lambda x: x / F.col("norm"))),
    )


def quantize_int8(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = 127 /
    max(|x|)``, ``q_i = floor(x_i * scale + 0.5)`` clamped to
    [-127, 127]. Appends ``scale`` (double) and ``q`` (array<int>).
    Zero vectors get a NULL scale/q. Dequantize as ``q / scale``."""
    _check_collisions(df, ("scale", "q"))
    v = _as_double(F.col(emb_col))
    max_abs = F.array_max(F.transform(v, F.abs))
    # a NaN lane makes max_abs NaN, and NaN > 0 is TRUE in Spark's
    # ordering — gate it out so degenerate vectors null like zeros do
    scale = F.when((max_abs > 0) & ~F.isnan(max_abs), F.lit(127.0) / max_abs)
    return df.withColumn("scale", scale).withColumn(
        "q",
        F.when(
            F.col("scale").isNotNull(),
            F.transform(
                v,
                lambda x: F.least(
                    F.greatest(F.floor(x * F.col("scale") + 0.5), F.lit(-127)),
                    F.lit(127),
                ).cast("int"),
            ),
        ),
    )
