"""Embedding scalar quantization — the storage/bandwidth lever for
billion-vector ANN corpora.

Reference parity: the reference (public serverboards/exosql, Elixir)
has no vector surface at all; this extends the engine's embedding
stack (operators/similarity.py, operators/pq.py) with the OTHER
standard compression: per-vector symmetric int8 scalar quantization
(max-abs scale), the format faiss calls SQ8 and vector stores ship as
"scalar quantization". PQ/ADC compresses 48× for cell-probed search;
int8 compresses exactly 4× while keeping plain dot-product arithmetic
— the right trade for rerank tiers and GPU-friendly exports.

Everything is a pure projection (per-row array math inside the scan):
no shuffle, no UDF, no state — at 100 TB the quantization cost is the
read cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Guard against all-zero vectors: dividing by this instead of 0 maps
#: every component to floor(0 + 0.5) = 0, the correct quantization.
_EPS = 1e-30


def _maxabs(vec: Column) -> Column:
    return F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double")))),
        F.lit(_EPS),
    )


def int8_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_col: str = "scale",
    q_col: str = "q",
    err_col: str = "max_err",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|v_i|``,
    ``q_i = floor(127·v_i/scale + 0.5)`` — every code lands in
    [-127, 127] by construction (|v_i| ≤ scale, and the division is
    exactly 1.0 at the max component, so no clamp branch).

    ``floor(x + 0.5)`` rather than ``round`` because the two engines'
    round() disagree on negative halves (half-away vs half-even);
    floor(+0.5) is ONE deterministic IEEE formula both compute
    bit-identically from the same float32 inputs — which is what makes
    the oracle exact rather than approximate.

    Appends ``scale_col`` (double), ``q_col`` (array<int>) and
    ``err_col`` — the vector's max absolute dequantization error
    ``max|v_i − q_i·scale/127|``, rounded to 6 decimals; by
    construction ≤ scale/254 + rounding, the number a rerank tier
    budgets against.
    """
    out = df.withColumn(scale_col, _maxabs(F.col(vec_col)))
    s = F.col(scale_col)
    out = out.withColumn(
        q_col,
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(F.lit(127.0) * x.cast("double") / s + F.lit(0.5)).cast(
                "int"
            ),
        ),
    )
    return out.withColumn(
        err_col,
        F.round(
            F.array_max(
                F.zip_with(
                    F.col(vec_col),
                    F.col(q_col),
                    lambda x, q: F.abs(
                        x.cast("double") - q.cast("double") * s / F.lit(127.0)
                    ),
                )
            ),
            6,
        ),
    )


def int8_dot(q_a: Column, q_b: Column, scale_a: Column, scale_b: Column) -> Column:
    """Dot product in the quantized domain: ``(s_a·s_b/127²)·Σ q_a·q_b``
    — the integer accumulation is the cheap part (SIMD int8 on real
    hardware; here one ``aggregate`` over the zipped codes), the two
    scales ride outside the sum."""
    acc = F.aggregate(
        F.zip_with(q_a, q_b, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return scale_a * scale_b / F.lit(127.0 * 127.0) * acc.cast("double")
