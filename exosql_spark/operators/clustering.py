"""Embedding clustering: Lloyd's k-means over an `array<float>` column.

The iterative workload pattern at 100 TB:

- Centroids are TINY (k × dim doubles) — they live on the driver
  between iterations and enter each assignment pass as *literal
  arrays* folded into the expression tree (an explicit broadcast of
  bounded size, like components.py's edge list). The corpus frame is
  never collected.
- Each iteration is one scan + one k-way partial aggregation: assign
  (argmin over k squared distances, all JVM Column math — zip_with/
  aggregate, no Python in the row path) → groupBy(cluster) partial
  sums → k rows to the driver. Shuffle volume per iteration is
  k × dim × n_partitions partial sums, independent of corpus size.
- Iteration count is a fixed budget (`iters`), not a convergence
  loop over the full corpus: at scale you run a fixed number of
  passes (or test movement on the k×dim centroid matrix driver-side,
  which is free).

Determinism: init takes the k lowest-id vectors (no RNG), ties in
argmin break toward the lower cluster id — rerunning yields identical
assignments, so the operator is reproducible (the catalog entry is
rows-only only because cross-engine float summation order differs,
not because the algorithm is nondeterministic).

Reference: this is an extension beyond serverboards/exosql (no
clustering there); the Spark-side pattern follows the classic MLlib
KMeans shape re-expressed in DataFrame ops.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: F.Column, centroid: list[float]) -> F.Column:
    """Squared L2 distance between an array column and a literal
    centroid — one fused zip_with/aggregate pass, JVM-side."""
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Append `cluster` (argmin of squared distance, ties → lower id)
    and `sq_dist`. Centroids are literals: no join, no shuffle — the
    assignment fuses into the scan. NULL vectors get NULL cluster and
    sq_dist (matching the Arrow twin) — without the guard the NULL
    distances sorted into cluster 0, silently piling every NULL row
    into one cluster (round-7 review find)."""
    vec = F.col(vec_col).cast("array<double>")
    scored = F.array_sort(
        F.array(
            *[
                F.struct(
                    _sq_dist(vec, c).alias("d"), F.lit(i).alias("cluster")
                )
                for i, c in enumerate(centroids)
            ]
        )
    )[0]
    not_null = F.col(vec_col).isNotNull()
    return df.withColumn(
        "cluster", F.when(not_null, scored["cluster"])
    ).withColumn("sq_dist", F.when(not_null, scored["d"]))


def _mean_centroids(assigned: DataFrame, vec_col: str, dim: int, k: int) -> list[list[float]]:
    """Per-cluster mean vectors via posexplode + (cluster, pos) agg —
    k × dim result rows; the only driver-side data is that matrix."""
    rows = (
        assigned.select("cluster", F.posexplode(F.col(vec_col).cast("array<double>")))
        .groupBy("cluster", "pos")
        .agg(F.avg("col").alias("v"))
        .collect()
    )
    out: dict[int, list[float]] = {}
    for r in rows:
        out.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = r["v"]
    # empty clusters keep their previous position implicitly (caller
    # passes previous centroids as fallback)
    return [out.get(i) for i in range(k)]


def kmeans(
    df: DataFrame,
    k: int = 5,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], DataFrame]:
    """Lloyd's algorithm with deterministic lowest-id init. Returns
    (final centroids, assigned frame with cluster/sq_dist columns).

    Each iteration moves k × dim doubles driver→executors (literals)
    and back (partial means) — corpus never leaves the executors."""
    first = df.orderBy(id_col).limit(k).select(F.col(vec_col).cast("array<double>"))
    centroids = [list(r[0]) for r in first.collect()]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = assign_clusters(df, centroids, vec_col)
        new = _mean_centroids(assigned, vec_col, dim, k)
        centroids = [n if n is not None else c for n, c in zip(new, centroids)]
    return centroids, assign_clusters(df, centroids, vec_col)


def _sq_dists(x, c):
    """All-pairs squared distances via the matmul identity
    ‖x−c‖² = ‖x‖² + ‖c‖² − 2·x·c — O(n·k) memory where the naive
    broadcast diff tensor is O(n·k·dim): at k=1600, dim=64 the diff
    form materializes 8 GB per 10k-row Arrow batch and OOM-killed the
    JVM in the 100×-corpus experiment (round 8); this form is 128 MB
    and BLAS-fast. Clamped at 0 (the identity can go epsilon-negative
    for near-identical vectors). Float sums associate differently
    than the diff form, so boundary-straddling points can flip in the
    last ulp — the caveat the pandas paths already document."""
    import numpy as np

    d = (x * x).sum(1)[:, None] + (c * c).sum(1)[None, :] - 2.0 * (x @ c.T)
    return np.maximum(d, 0.0)


def assign_clusters_pandas(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Append `cluster` AND `sq_dist` (same output columns as
    :func:`assign_clusters`) via an Arrow-batched numpy argmin instead
    of the literal-centroid expression tree. Same semantics (argmin
    squared distance, ties → lower cluster id — numpy argmin keeps the
    first occurrence); float sum order differs, so boundary-straddling
    points can flip in the last ulp (the same caveat class as the
    pandas cosine scorer). NULL vectors yield NULL cluster/sq_dist
    (the expression path also yields NULLs there); vectors must be
    fixed-length — ragged rows raise, they don't misassign.

    This is the scale path for large k: the expression tree carries
    k × dim literals through Catalyst analysis on every plan build
    (measured seconds at k=16·dim=64, infeasible at k=10³ for a
    billion-vector corpus), while this closure ships one k × dim numpy
    matrix to the Arrow workers and the per-row work is a vectorized
    argmin."""
    import numpy as np

    cents = np.array(centroids, dtype=np.float64)

    @F.pandas_udf("struct<cluster: int, sq_dist: double>")
    def _assign(v: pd.Series) -> pd.DataFrame:
        import numpy as np

        mask = v.notna().to_numpy()
        if mask.all() and len(v):  # hot path: no nullable machinery
            x = np.stack(v.to_numpy()).astype(np.float64)
            d = _sq_dists(x, cents)
            return pd.DataFrame(
                {"cluster": d.argmin(1).astype("int32"), "sq_dist": d.min(1)}
            )
        out = pd.DataFrame(
            {
                "cluster": pd.array([None] * len(v), dtype="Int32"),
                "sq_dist": pd.array([None] * len(v), dtype="Float64"),
            }
        )
        if mask.any():
            x = np.stack(v[mask].to_numpy()).astype(np.float64)
            d = _sq_dists(x, cents)
            out.loc[mask, "cluster"] = d.argmin(1).astype("int32")
            out.loc[mask, "sq_dist"] = d.min(1)
        return out

    assigned = df.withColumn("_a", _assign(F.col(vec_col)))
    return assigned.withColumn("cluster", F.col("_a.cluster")).withColumn(
        "sq_dist", F.col("_a.sq_dist")
    ).drop("_a")


def train_kmeans_sample(
    sample: DataFrame,
    k: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Driver-side Lloyd on a COLLECTED bounded sample — the
    train-once/assign-everywhere shape: k-means converges on 10⁵-ish
    vectors, so training never needs the cluster, and a numpy loop
    avoids rebuilding the k×dim literal-centroid expression tree every
    iteration (Catalyst analysis of those trees is what dominates
    distributed training on small samples — measured ~5 s of the
    dedup_semantic entry's 6.5 s at k=16, dim=64). Semantics match
    :func:`kmeans`: lowest-id init, argmin ties break to the lower
    cluster (numpy argmin keeps the first occurrence), empty clusters
    keep their previous centroid. The caller bounds the sample; only
    k × dim floats leave the driver afterwards."""
    import numpy as np

    rows = sample.select(id_col, vec_col).orderBy(id_col).collect()
    if not rows:
        raise ValueError("train_kmeans_sample: empty training sample")
    x = np.array([list(r[1]) for r in rows], dtype=np.float64)
    c = x[:k].copy()
    for _ in range(iters):
        a = _sq_dists(x, c).argmin(1)
        for j in range(k):
            members = x[a == j]
            if len(members):
                c[j] = members.mean(0)
    return c.tolist()


def kmeans_summary(
    df: DataFrame,
    k: int = 5,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-cluster size + inertia (sum of squared distances) — the
    catalog/bench surface for :func:`kmeans`."""
    _, assigned = kmeans(df, k, iters, vec_col, id_col)
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.sum("sq_dist"), 2).alias("inertia"),
    )
