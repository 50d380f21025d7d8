"""Incremental (cross-snapshot) dedup: a new document batch against an
existing reference corpus — the primitive a continuously-crawled
training pipeline runs every ingest cycle (dedup the new snapshot
against everything already kept, not just within itself).

Beyond-reference extension (the reference engine has no dedup surface
at all — SURVEY.md §2 extensions); the in-batch/self-join variants live
in :mod:`exosql_spark.operators.dedup`.

Plan shape (two pruning phases, cheapest first):

1. **Exact phase** — md5-of-normalized-text anti-join against the ref
   digest set. Shuffles 16-byte digests only; at scale the ref digests
   are a bucketed parquet table, so the join is shuffle-free on the
   ref side and the (small) batch side is broadcast or repartitioned
   to match.
2. **Near phase** — MinHash band keys of the surviving batch rows
   equi-joined against the reference's band-key index
   (:func:`exosql_spark.operators.dedup.signature_bands` — the
   storable (_id, band, key) shape). Candidates are verified with
   exact shingle Jaccard, so LSH only affects recall, never
   precision. Ref texts are fetched for candidate ids only
   (semi-join reduction) — the full ref corpus is never rescanned.

At 100 TB the critical property: per-batch cost is
O(|batch| + |candidate matches|), NOT O(|ref|). The ref side is a
maintained signature index (digests + band keys, appended each cycle),
never recomputed; nothing in this module scans ref text except the
candidate-id semi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from exosql_spark.cache import managed_persist_disk

from exosql_spark.operators.dedup import (
    _parallelize,
    fingerprint,
    jaccard,
    minhash_signature,
    shingles,
    signature_bands,
)


def incremental_dedup(
    new_docs: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    ref_digests: DataFrame | None = None,
    ref_bands: DataFrame | None = None,
) -> DataFrame:
    """Classify every row of ``new_docs`` against the reference corpus.

    Returns ``new_docs``'s columns plus:

    - ``status``: ``'exact_dup'`` (normalized text already in ref) |
      ``'near_dup'`` (shingle Jaccard ≥ threshold with some ref doc) |
      ``'kept'``
    - ``matched_ref_id``: min ref id that matched (NULL for kept).

    ``ref_digests`` / ``ref_bands``: precomputed index frames (the
    digest set and the ``signature_bands`` output for ref). Pass them
    from your maintained index at scale; when omitted they are derived
    from ``ref`` here (fine for tests / one-shot use). Drop the
    duplicates with ``.filter("status = 'kept'")``.
    """
    newf = _parallelize(
        new_docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    ).transform(managed_persist_disk)

    if ref_digests is None:
        ref_digests = ref.select(
            F.col(id_col).alias("_rid"), fingerprint(text_col).alias("_h")
        )
    # exact phase: min matching ref id per digest (deterministic pick)
    exact = (
        newf.select("_id", fingerprint("_t").alias("_h"))
        .join(
            ref_digests.groupBy("_h").agg(F.min("_rid").alias("_exact_rid")), "_h"
        )
        .select("_id", "_exact_rid")
    )

    # near phase runs only on rows the exact phase didn't claim
    rest = newf.join(exact.select("_id"), "_id", "left_anti")
    new_sig = rest.select("_id", minhash_signature("_t", num_hashes, k).alias("_sig"))
    if ref_bands is None:
        ref_sig = ref.select(
            F.col(id_col).alias("_id"),
            minhash_signature(text_col, num_hashes, k).alias("_sig"),
        )
        ref_bands = signature_bands(ref_sig, num_hashes, bands)
    ref_bands = ref_bands.select(
        F.col("_id").alias("_rid"), "band", "key"
    )
    # persist: three consumers (both semi-join id sets + the verify
    # join) — without the barrier the band join runs three times
    cands = (
        signature_bands(new_sig, num_hashes, bands)
        .join(ref_bands, ["band", "key"])
        .select("_id", "_rid")
        .distinct()
        .transform(managed_persist_disk)
    )
    # verify with exact Jaccard — fetch shingles for candidate ids only
    new_sh = rest.join(cands.select("_id").distinct(), "_id", "left_semi").select(
        "_id", shingles("_t", k).alias("_sh_new")
    )
    ref_sh = (
        ref.select(F.col(id_col).alias("_rid"), F.col(text_col).alias("_rt"))
        .join(cands.select("_rid").distinct(), "_rid", "left_semi")
        .select("_rid", shingles("_rt", k).alias("_sh_ref"))
    )
    near = (
        cands.join(new_sh, "_id")
        .join(ref_sh, "_rid")
        .filter(jaccard(F.col("_sh_new"), F.col("_sh_ref")) >= threshold)
        .groupBy("_id")
        .agg(F.min("_rid").alias("_near_rid"))
    )

    out = (
        new_docs.join(
            exact.withColumnRenamed("_id", id_col), id_col, "left"
        )
        .join(near.withColumnRenamed("_id", id_col), id_col, "left")
        .withColumn(
            "status",
            F.when(F.col("_exact_rid").isNotNull(), F.lit("exact_dup"))
            .when(F.col("_near_rid").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("kept")),
        )
        .withColumn(
            "matched_ref_id", F.coalesce(F.col("_exact_rid"), F.col("_near_rid"))
        )
        .drop("_exact_rid", "_near_rid")
    )
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fingerprint: Column | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-version diff — which documents were ADDED, REMOVED,
    CHANGED, or UNCHANGED between two snapshots of the same table:
    the audit step between crawl/curation releases (what moved
    between corpus v3 and v3.1?), and the input to incremental
    reprocessing (only added+changed rows need re-scoring/re-embedding
    downstream).

    Mechanics: each side reduces to (id, fingerprint) — by default
    ``md5(text_col)``, the same content hash the dedup/export paths
    use — then ONE full outer join on the id classifies every row.
    The shuffle carries 16-byte digests, never document bodies, so the
    diff costs two digest projections + one join regardless of
    document size.  Output: (``id_col``, ``status``) with status in
    {added, removed, changed, unchanged}.

    Side presence is carried by explicit marker columns, NOT by
    fingerprint NULL-ness: a NULL ``text_col`` fingerprints to NULL
    (md5 propagates NULL), so classifying on the fingerprint alone
    would report a NULL-text doc present in both snapshots as
    "added".  With the markers, NULL fingerprints compare via
    null-safe equality — two NULL-text versions of a doc are
    "unchanged", NULL↔non-NULL is "changed"."""
    from exosql_spark.operators.text import fingerprint_md5

    fp = fingerprint if fingerprint is not None else fingerprint_md5(F.col(text_col))
    o = old.select(F.col(id_col), fp.alias("_fp_old"), F.lit(True).alias("_in_old"))
    n = new.select(F.col(id_col), fp.alias("_fp_new"), F.lit(True).alias("_in_new"))
    return o.join(n, id_col, "full_outer").select(
        id_col,
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old").eqNullSafe(F.col("_fp_new")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
