"""Distributed linear algebra over embedding columns: covariance /
PCA via two-phase moment aggregation.

The 100 TB shape for second-moment statistics is NOT ``posexplode`` to
(row, dim) pairs — that shuffles n·d rows.  It is the classic
partial-aggregation pattern every distributed PCA uses (e.g. Spark
MLlib's ``RowMatrix.computeCovariance``, re-expressed here on the
DataFrame API with Arrow batches):

1. **Map side** (``mapInPandas``): each Arrow batch reduces to ONE row
   of sufficient statistics ``(n, Σx, Σxxᵀ)`` — d + d² doubles.  Data
   volume leaving the scan is O(batches · d²), independent of n.
2. **Shuffle**: the partial rows posexplode to (index, value) and a
   tiny groupBy(index).sum combines them — the only exchange, carrying
   at most batches · (d + d²) rows.
3. **Driver**: the d×d covariance (d²+d+1 values — bounded by the
   declared dimension, a documented bounded collect like
   clustering.py's training sample) is assembled, eigendecomposed
   with numpy (O(d³), d ≤ a few thousand), and the top-k components
   broadcast back as literal arrays.
4. **Projection** is pure column arithmetic (``zip_with`` +
   ``aggregate`` dot products) — whole-stage codegen, no Python.

Reference anchor: exosql has no linear algebra; this extends the
LLM-pipeline tier (SemDeDup-style pipelines whiten/PCA-reduce
embeddings before clustering — Abbas et al. 2023, §3).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_moments(df: DataFrame, col: str, d: int) -> DataFrame:
    """Per-Arrow-batch sufficient statistics for mean/covariance:
    one output row ``(n, s[d], ss[d*d])`` per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[col].to_numpy()).astype(np.float64)
            if x.shape[1] != d:
                # fail loudly at the first batch: a silent mismatch
                # would produce a covariance of the wrong shape only
                # after the collect, far from the cause
                raise ValueError(
                    f"partial_moments: declared d={d} but vectors have "
                    f"{x.shape[1]} components"
                )
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0)],
                    "ss": [(x.T @ x).reshape(-1)],
                }
            )

    return df.select(col).mapInPandas(
        run, schema="n long, s array<double>, ss array<double>"
    )


def covariance_matrix(df: DataFrame, col: str, d: int) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean[d], cov[d,d]) — population covariance.  The partials
    combine through ONE tiny (index → sum) shuffle; the collect is
    d²+d+1 values, bounded by the declared dimension, never by the
    row count."""
    parts = partial_moments(df, col, d)
    combined = (
        parts.select(
            F.posexplode(
                F.concat(F.array(F.col("n").cast("double")), "s", "ss")
            ).alias("idx", "v")
        )
        .groupBy("idx")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    flat = np.zeros(1 + d + d * d)
    for r in combined:
        flat[r.idx] = r.v
    n = int(flat[0])
    if n == 0:
        raise ValueError("covariance_matrix: empty input")
    s, ss = flat[1 : 1 + d], flat[1 + d :].reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def pca_topk(df: DataFrame, col: str, d: int, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(eigvals[k], components[k,d], mean[d]) — top-k principal
    directions of the population covariance, eigensolved on the driver
    (O(d³) on a d×d matrix).  Component signs are fixed so the
    largest-magnitude entry is positive (eigenvectors are otherwise
    sign-ambiguous across LAPACK builds); the top-k SUBSPACE they span
    is what downstream projection should rely on — within-subspace
    rotation is not pinned when eigenvalues tie."""
    _, mean, cov = covariance_matrix(df, col, d)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return vals[order], comps, mean


def project(
    df: DataFrame, col: str, components: np.ndarray, mean: np.ndarray
) -> DataFrame:
    """Append ``proj`` (array<double>, length k: coordinates of the
    centered vector on each component) and ``resid_sq`` (squared
    distance from the vector to its rank-k reconstruction).  Broadcast
    literals + zip_with/aggregate dot products — one projection, no
    shuffle, no Python."""
    mean_c = F.array(*[F.lit(float(v)) for v in mean])
    centered = F.zip_with(F.col(col).cast("array<double>"), mean_c, lambda a, b: a - b)

    def dot(vec, comp):
        return F.aggregate(
            F.zip_with(vec, comp, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    comp_cols = [
        F.array(*[F.lit(float(v)) for v in comp]) for comp in components
    ]
    cent = F.col("__exo_centered")
    proj = F.array(*[dot(cent, c) for c in comp_cols])
    norm_sq = dot(cent, cent)
    proj_sq = F.aggregate(
        F.col("__exo_proj"), F.lit(0.0), lambda acc, v: acc + v * v
    )
    return (
        df.withColumn("__exo_centered", centered)
        .withColumn("__exo_proj", proj)
        .withColumn("proj", F.col("__exo_proj"))
        .withColumn("resid_sq", norm_sq - proj_sq)
        .drop("__exo_centered", "__exo_proj")
    )
