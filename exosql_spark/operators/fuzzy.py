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


def qgrams(s: F.Column, q: int = 2) -> F.Column:
    """Array of the |s|−q+1 contiguous q-grams of a string (empty
    array when |s| < q)."""
    return F.when(
        F.length(s) >= q,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - F.lit(q - 1)),
            lambda i: F.substring(s, i, q),
        ),
    ).otherwise(F.array().cast("array<string>"))


def fuzzy_self_pairs_qgram(
    df: DataFrame,
    on: str,
    id_col: str = "id",
    max_dist: int = 3,
    q: int = 2,
) -> DataFrame:
    """Within-table fuzzy pairs (id_a < id_b, levenshtein ≤ max_dist)
    via the Q-GRAM COUNT FILTER (Gravano et al., VLDB'01) — the
    documented escape hatch for edit radii the deletion-neighborhood
    join cannot reach (its candidate fan-out is O(|s|^k); see
    deletion_neighborhood). The result is EXACT.

    Filter: one edit operation destroys at most ``q`` of a string's
    q-grams, so ed(a,b) ≤ k ⟹ the BAG intersection of their q-gram
    multisets has size ≥ max(|a|,|b|) − q + 1 − k·q. Bag semantics via
    occurrence numbering: the j-th occurrence of gram g in a matches
    only the j-th occurrence in b, so an equi-join on (gram, occ)
    counts min(cnt_a, cnt_b) per gram — exactly the bag intersection.
    Candidates violating the bound die before the levenshtein verify.

    Exactness residue: a pair whose bound is ≤ 0 (both strings shorter
    than k·q + q, e.g. ≤ 7 chars at q=2, k=3) can satisfy ed ≤ k while
    sharing ZERO q-grams — the index join would silently miss it. Those
    short strings are verified by a dedicated small cross join instead
    (they are few and cheap by construction: post-dedup vocabularies
    have bounded short-string residues; the operator stays exact
    rather than quietly dropping them).

    **Execution contract (not fully lazy)**: COMPOSING this operator
    runs exactly ONE cheap Spark action — ``limit(1).count()`` on the
    short-string length filter (Spark may map it to a couple of
    CollectLimit partition-scan jobs) — to decide whether the
    short-residue nested-loop join belongs in the plan at all. For the common
    post-dedup vocabulary with no short strings this keeps the
    BroadcastNestedLoopJoin out of the PLAN (rather than shipping one
    for AQE to merely collapse); the cost is that composition inside a
    larger lazy pipeline executes that one bounded scan eagerly
    (pinned by a job-count test). Everything else stays lazy.

    Scale anatomy — the jaccard_index_pairs discipline applied to edit
    distance: only each string's kq+1 RAREST tagged grams are indexed
    for candidate generation (prefix filtering under the global
    (df, tag) order — lossless: a true pair needs ≥ max(|Ga|,|Gb|)−kq
    shared tags, so both prefixes of length kq+1 must intersect), and
    the bag-count bound + levenshtein verify run on the candidates'
    full tag arrays. Hot grams (a vocabulary's ubiquitous bigrams)
    have high df and fall OUT of prefixes — the first cut of this
    operator joined on ALL grams and measured 51 s on a 1600-string
    vocabulary purely from hot-gram fan-out; prefix-filtered it is
    sub-second. Candidate cost is Σ df² over the rarest kq+1 tags per
    string. Still a post-exact-dedup VOCABULARY path (the dedup-first
    ordering every fuzzy operator here documents); MinHash-LSH remains
    the designated raw-corpus path at 100 TB."""
    from exosql_spark.cache import managed_persist_disk

    kq = max_dist * q + q - 1  # max length with bound ≤ 0
    prefix_n = max_dist * q + 1  # prefix length under the global order
    base = df.select(F.col(id_col).alias("_id"), F.col(on).alias("_s"))
    long_side = base.filter(F.length("_s") > kq)
    short_side = base.filter(F.length("_s") <= kq)

    # occurrence-TAGGED grams ("gram#occ", occ = count of equal grams
    # before this position): tags are unique within a string, so SET
    # intersection of tag arrays == BAG intersection of gram multisets
    # — computed entirely in array land, no window shuffle.
    tagged = F.transform(
        qgrams(F.col("_s"), q),
        lambda x, i: F.concat(
            x,
            F.lit("#"),
            F.size(F.filter(F.slice(qgrams(F.col("_s"), q), F.lit(1), i), lambda y: y == x)),
        ),
    )
    gr = long_side.select(
        "_id", "_s", F.length("_s").alias("_len"), F.explode(tagged).alias("_t")
    )
    dfreq = gr.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    docs = (
        gr.join(dfreq, "_t")
        .groupBy("_id")
        .agg(
            F.first("_s").alias("_s"),
            F.first("_len").alias("_len"),
            F.array_sort(F.collect_list(F.struct("_df", "_t"))).alias("_sorted"),
        )
        .select(
            "_id", "_s", "_len",
            F.transform("_sorted", lambda s: s["_t"]).alias("_ts"),
        )
        # three consumers: prefix explode + both verification sides
        .transform(managed_persist_disk)
    )
    pref = docs.select(
        "_id", F.explode(F.slice("_ts", F.lit(1), F.lit(prefix_n))).alias("_t")
    )
    a, b = pref.alias("a"), pref.alias("b")
    cands = (
        a.join(b, (F.col("a._t") == F.col("b._t")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    da = docs.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("_sa"),
        F.col("_len").alias("_la"), F.col("_ts").alias("_tsa"),
    )
    db = docs.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("_sb"),
        F.col("_len").alias("_lb"), F.col("_ts").alias("_tsb"),
    )
    long_pairs = (
        cands.join(da, "id_a")
        .join(db, "id_b")
        .filter(
            F.size(F.array_intersect("_tsa", "_tsb"))
            >= F.greatest("_la", "_lb") - F.lit(q - 1) - F.lit(max_dist * q)
        )
        .withColumn("edit_dist", F.levenshtein("_sa", "_sb"))
        .filter(F.col("edit_dist") <= max_dist)
        .select("id_a", "id_b", "edit_dist")
    )
    # Short-string residue: strings with bound ≤ 0 can reach ed ≤ k
    # with zero shared grams, and they are also absent from the index,
    # so every (short, anything) pair needs its own candidate path — a
    # small nested-loop verify against the whole vocabulary. The count
    # gate (one cheap aggregate on the length filter) keeps that
    # nested-loop join OUT of the plan entirely for vocabularies with
    # no short strings — the common post-dedup case — instead of
    # shipping a BroadcastNestedLoopJoin that AQE merely collapses.
    if short_side.limit(1).count() == 0:
        return long_pairs
    sa = short_side.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("_sa")
    )
    other = base.select(F.col("_id").alias("id_b"), F.col("_s").alias("_sb"))
    short_pairs = (
        sa.join(other, F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.levenshtein("_sa", "_sb").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= max_dist)
        .distinct()  # short×short pairs arrive in both orientations
    )
    return long_pairs.unionByName(short_pairs).distinct()
