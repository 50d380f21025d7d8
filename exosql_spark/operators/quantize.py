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


def int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-``k`` retrieval IN THE QUANTIZED DOMAIN:
    both sides int8-quantized, scored with :func:`int8_dot` — the
    memory-bandwidth-bound scan shape (4× less data moved than float32
    brute force, integer multiply-accumulate inner loop) that serves
    as the rerank tier over an IVF shortlist or the whole-corpus
    fallback when no index exists yet.

    Unlike the LSH/IVF entries this is NOT approximate in the
    candidate sense — every corpus vector is scored; the only error is
    quantization itself, which is why the result is exactly
    SQL-oracle-able (integer dots are engine-portable, and the scale
    arithmetic is one shared IEEE formula).  Queries broadcast
    (|Q|·dims int8 + one scale each); per-query top-k via window over
    the scored scan."""
    from pyspark.sql import Window

    qc = int8_quantize(corpus, vec_col=vec_col, scale_col="_sc", q_col="_qc")
    qq = int8_quantize(queries, vec_col=vec_col, scale_col="_sq", q_col="_qq").select(
        F.col(query_id_col), F.col("_sq"), F.col("_qq")
    )
    scored = qc.crossJoin(F.broadcast(qq)).select(
        query_id_col,
        id_col,
        int8_dot(F.col("_qc"), F.col("_qq"), F.col("_sc"), F.col("_sq")).alias(
            "int8_sim"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("int8_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "int8_sim", "rank")
    )


def int8_cosine(q_a: Column, q_b: Column) -> Column:
    """Cosine similarity ENTIRELY in the integer code domain: the
    per-vector scales cancel (cos of the dequantized vectors =
    acc_ab / √(acc_aa·acc_bb)), so the whole computation is three
    integer accumulations and one sqrt — and an exact code copy gives
    EXACTLY 1.0 (acc_ab = acc_aa = acc_bb), which is what lets the
    planted-copy oracle pin the two-stage IVF→int8 rerank closed-form.
    Cauchy–Schwarz holds exactly over integers, so 1.0 is a true upper
    bound, not a float artifact."""

    def _acc(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: (a * b).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).cast("double")

    return _acc(q_a, q_b) / F.sqrt(_acc(q_a, q_a) * _acc(q_b, q_b))
