"""Edit-distance (fuzzy) join — EXACT Levenshtein-bounded matching
without a cross join, via symmetric deletion neighborhoods (the
SymSpell candidate trick, Garbe 2012; the classic result that
ed(a, b) ≤ k ⟹ the ≤k-deletion neighborhoods of a and b intersect).

Entity resolution / record linkage is the relational cousin of the
text near-dup operators: join two tables on "names within edit
distance k" . The naive formulation is a cartesian product with a
``levenshtein() ≤ k`` filter — O(|L|·|R|) distance computations, dead
at any scale. Here:

1. **Neighborhood generation** (pure map, fused into the scan): each
   string emits its ≤k-deletion variants — O(|s|^k) short strings per
   row, bounded fan-out (a 20-char name at k=1 emits 21 variants).
2. **Candidate generation**: an equi-join on the variant string.
   Correctness of the candidate set is the SymSpell property: any
   pair within edit distance k (insert/delete/substitute) shares at
   least one common variant, so candidates ⊇ truth. The join key is
   a short string — an ordinary hash shuffle, no all-pairs anywhere.
3. **Exact verify**: ``levenshtein(a, b) ≤ k`` on the deduplicated
   candidate pairs only — the result is EXACT, not approximate, which
   is why the catalog entry carries a full SQL oracle (DuckDB
   levenshtein over the small cross product agrees pair for pair).

At 100 TB the variant join behaves like the LSH band joins: fan-out
is per-row bounded, the shuffle key space is huge (variant strings),
and a pathological key (many identical names) is exactly the exact-dup
case upstream dedup removes first. k is a small constant (1–2): the
neighborhood is O(|s|^k), so k=3+ calls for a different algorithm
(q-gram count filtering), documented deliberately out of scope.

Reference: beyond serverboards/exosql (its fuzzy surface is scalar
string similarity functions; see queries/functions_q.py
fn_fuzzy_strings) — this lifts fuzziness from expressions to a JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _del1(s: F.Column) -> F.Column:
    """All 1-deletion variants of a string column (array<string>);
    empty strings yield an empty array."""
    return F.when(
        F.length(s) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(
                F.substring(s, F.lit(1), i - F.lit(1)),
                F.substring(s, i + F.lit(1), F.length(s)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def deletion_neighborhood(s: F.Column, max_dist: int) -> F.Column:
    """The ≤max_dist-deletion neighborhood of a string (array<string>,
    deduplicated, always containing the string itself)."""
    if not (0 <= max_dist <= 2):
        raise ValueError(
            "deletion_neighborhood supports max_dist in {0, 1, 2}: the "
            "neighborhood is O(|s|^k); larger radii need q-gram count "
            "filtering instead"
        )
    acc = F.array(s)
    frontier = F.array(s)
    for _ in range(max_dist):
        frontier = F.array_distinct(F.flatten(F.transform(frontier, _del1)))
        acc = F.array_distinct(F.concat(acc, frontier))
    return acc


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_dist: int = 1,
    left_id: str = "l_id",
    right_id: str = "r_id",
) -> DataFrame:
    """All (left_id, right_id) pairs with
    ``levenshtein(left_on, right_on) ≤ max_dist`` — exact result,
    no cartesian product. Columns: left_id, right_id, the two joined
    strings, and ``edit_dist``. When the same name is passed for both
    sides (joining two tables each on ``name``), the colliding output
    columns get ``_l``/``_r`` suffixes so every column stays
    addressable by name.

    The matched strings ride through the variant frames so the verify
    step needs no join back to the inputs — one variant equi-join,
    one distinct, one vectorized levenshtein filter."""
    # Disambiguate ANY output-name collision (id/id, on/on, and the
    # cross cases like left_id == right_on): left-side columns get _l,
    # right-side _r, applied to every name that occurs more than once.
    names = [left_id, right_id, left_on, right_on]
    sides = ["_l", "_r", "_l", "_r"]
    dup = {n for n in names if names.count(n) > 1}
    out_lid, out_rid, out_lon, out_ron = (
        n + s if n in dup else n for n, s in zip(names, sides)
    )
    final = [out_lid, out_rid, out_lon, out_ron]
    if len(set(final)) != 4:
        # same-side collision (e.g. left_id == left_on) — suffixing
        # cannot separate these; the caller must rename
        raise ValueError(
            f"fuzzy_join output columns collide even after _l/_r "
            f"suffixing: {final}; rename the input columns"
        )
    lv = left.select(
        F.col(left_id).alias("_lid"), F.col(left_on).alias("_ls")
    ).select(
        "_lid", "_ls", F.explode(deletion_neighborhood(F.col("_ls"), max_dist)).alias("_v")
    )
    rv = right.select(
        F.col(right_id).alias("_rid"), F.col(right_on).alias("_rs")
    ).select(
        "_rid", "_rs", F.explode(deletion_neighborhood(F.col("_rs"), max_dist)).alias("_v")
    )
    cands = lv.join(rv, "_v").select("_lid", "_ls", "_rid", "_rs").distinct()
    return (
        cands.withColumn("edit_dist", F.levenshtein("_ls", "_rs"))
        .filter(F.col("edit_dist") <= max_dist)
        .select(
            F.col("_lid").alias(out_lid),
            F.col("_rid").alias(out_rid),
            F.col("_ls").alias(out_lon),
            F.col("_rs").alias(out_ron),
            "edit_dist",
        )
    )


def fuzzy_self_pairs(
    df: DataFrame,
    on: str,
    id_col: str = "id",
    max_dist: int = 1,
) -> DataFrame:
    """Within-table fuzzy pairs (id_a < id_b, edit_dist ≤ max_dist) —
    the entity-resolution self-join. Columns: id_a, id_b, edit_dist."""
    pairs = fuzzy_join(
        df.select(F.col(id_col).alias("a_id"), F.col(on).alias("a_s")),
        df.select(F.col(id_col).alias("b_id"), F.col(on).alias("b_s")),
        "a_s",
        "b_s",
        max_dist,
        left_id="a_id",
        right_id="b_id",
    )
    return pairs.filter(F.col("a_id") < F.col("b_id")).select(
        F.col("a_id").alias("id_a"), F.col("b_id").alias("id_b"), "edit_dist"
    )
