#!/usr/bin/env python
"""Derive a larger scale point from the driver testdata by key-offset
replication — the second scale point the round-7 verdict asked for
(wall(sf1)/wall(sf0.1) exponents distinguish linear from super-linear
queries, the cheapest real evidence for the 100× claims).

    python tools/gen_scaled.py [--factor 10] [--out .scaled/sf1]

The driver's generator is not available (TESTDATA.md: read-only,
"do NOT regenerate"), so this builds an sf1-EQUIVALENT dataset derived
from sf0.1, explicitly NOT driver testdata — correctness runs never
read it; only the scaling measurement does. Replica construction keeps
each query's input DENSITY constant so wall-clock ratios measure the
engine, not a changed data distribution:

- **Key offsets, per table**: replica ``i`` shifts every primary/
  foreign key by ``i × (max_key + 1)`` consistently (customer 15 000,
  supplier 1 000, part 20 000, orders 150 000, …), so referential
  integrity holds within each replica and join fan-outs are exactly
  those of sf0.1, ten times over. ``region``/``nation`` stay single
  copies (fixed-key dimensions, still broadcast-sized at any SF).
- **Names get a per-replica ``qXq``-style tag** (pairwise levenshtein
  between tags ≥ 3): without it every replica repeats the same 1 000
  supplier names and the k≤2 fuzzy joins degenerate into
  mass-duplicate cross products — the tag keeps within-replica edit
  structure identical and cross-replica distances above every
  catalog threshold.
- **Document text is vowel-rotated per replica** (a→e→i→o→u→a, ``i``
  times, both cases): length, whitespace, punctuation, and token
  boundaries are untouched, so within-replica token/quality/dup
  structure is EXACTLY sf0.1's; across replicas the token sets are
  disjoint for any vowel-bearing word, so exact/Jaccard/MinHash dedup
  outputs scale linearly instead of exploding on 10-way copies.
- **Embeddings get a per-replica sign-flip mask** (flip dim ``j`` of
  replica ``i`` iff ``(i·7 + j) % 11 < 5``): flipping ~half the dims
  of a near-isotropic vector decorrelates it from its source, so
  replicas are fresh vectors, not planted near-dups; within-replica
  geometry (norms, pairwise cosines) is preserved exactly.
  (dedup_semantic still trains k=16 on the replica-0 sample — at 10×
  corpus under fixed k its Σ|cluster|² candidate work grows ~100×/k;
  the measurement is SUPPOSED to show that, k being the documented
  scale knob.)
- **Events** shift ``event_id``/``user_id``; timestamps are untouched
  so the windowed/sessionized per-user series repeat per replica.

Deterministic end to end (no RNG anywhere), so repeated generations
are byte-stable and round-over-round comparisons are meaningful.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")

#: per-replica name/text tags: pairwise levenshtein ≥ 3 (all three
#: chars differ between any two tags), so tagged duplicates never land
#: within any catalog fuzzy threshold (k ≤ 2) across replicas.
_TAGS = [f"{c}{d}{c}" for c, d in zip("abcdefghij", "qrstuvwxyz")]

_VOWELS = "aeiou"


def _rot_vowels(col, i: int):
    """Per-replica text transform, a pure translate: vowel rotation by
    ``i`` (period 5) plus, for i ≥ 5, a consonant shift (b→c→d→f→g→b)
    — the two combined give 10 DISTINCT transforms, so no two replicas
    share text (a bare vowel rotation made replicas i and i+5
    byte-identical: cross-replica exact duplicates that would have
    changed the corpus's dup density, caught by the distinct-text
    sanity check)."""
    from pyspark.sql import functions as F

    if i == 0:
        return col
    src, dst = _VOWELS, _VOWELS[i % 5 :] + _VOWELS[: i % 5]
    if i >= 5:
        src, dst = src + "bcdfg", dst + "cdfgb"
    return F.translate(col, src + src.upper(), dst + dst.upper())


def _replicas(df, n: int, build):
    """Union of build(i) for i in range(n) over the same source frame."""
    out = None
    for i in range(n):
        part = build(df, i)
        out = part if out is None else out.unionByName(part)
    return out


def generate(spark, src: str, out: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from exosql_spark.io import load_table

    def rd(name):
        return load_table(spark, src, name)

    def wr(df, name, parts=None):
        w = df.repartition(parts) if parts else df
        w.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"  wrote {name}")

    # fixed-key dimensions: single copy
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    cust = rd("customer")
    n_cust = cust.count()
    wr(
        _replicas(
            cust,
            factor,
            lambda df, i: df.select(
                (F.col("c_custkey") + i * n_cust).alias("c_custkey"),
                F.concat(F.col("c_name"), F.lit(f" {_TAGS[i]}")).alias("c_name")
                if i
                else F.col("c_name"),
                "c_nationkey",
                "c_acctbal",
                "c_mktsegment",
            ),
        ),
        "customer",
    )

    sup = rd("supplier")
    n_sup = sup.count()
    wr(
        _replicas(
            sup,
            factor,
            lambda df, i: df.select(
                (F.col("s_suppkey") + i * n_sup).alias("s_suppkey"),
                F.concat(F.col("s_name"), F.lit(f" {_TAGS[i]}")).alias("s_name")
                if i
                else F.col("s_name"),
                "s_nationkey",
                "s_acctbal",
            ),
        ),
        "supplier",
    )

    part = rd("part")
    n_part = part.count()
    wr(
        _replicas(
            part,
            factor,
            lambda df, i: df.select(
                (F.col("p_partkey") + i * n_part).alias("p_partkey"),
                F.concat(F.col("p_name"), F.lit(f" {_TAGS[i]}")).alias("p_name")
                if i
                else F.col("p_name"),
                "p_brand",
                "p_type",
                "p_size",
                "p_retailprice",
            ),
        ),
        "part",
    )

    orders = rd("orders")
    n_ord = orders.count()
    wr(
        _replicas(
            orders,
            factor,
            lambda df, i: df.select(
                (F.col("o_orderkey") + i * n_ord).alias("o_orderkey"),
                (F.col("o_custkey") + i * n_cust).alias("o_custkey"),
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            ),
        ),
        "orders",
        parts=32,
    )

    li = rd("lineitem")
    wr(
        _replicas(
            li,
            factor,
            lambda df, i: df.select(
                (F.col("l_orderkey") + i * n_ord).alias("l_orderkey"),
                (F.col("l_partkey") + i * n_part).alias("l_partkey"),
                (F.col("l_suppkey") + i * n_sup).alias("l_suppkey"),
                "l_linenumber",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                "l_shipdate",
            ),
        ),
        "lineitem",
        parts=64,
    )

    ev = rd("events")
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    wr(
        _replicas(
            ev,
            factor,
            lambda df, i: df.select(
                (F.col("event_id") + i * n_ev).alias("event_id"),
                "ts",
                (F.col("user_id") + i * n_users).alias("user_id"),
                "event_type",
                "value",
                "props",
            ),
        ),
        "events",
        parts=32,
    )

    docs = rd("documents")
    n_docs = docs.count()
    wr(
        _replicas(
            docs,
            factor,
            lambda df, i: df.select(
                (F.col("doc_id") + i * n_docs).alias("doc_id"),
                _rot_vowels(F.col("text"), i).alias("text"),
                "lang",
                "source",
                "n_chars",
            ),
        ),
        "documents",
        parts=32,
    )

    emb = rd("embeddings")
    n_emb = emb.count()

    def emb_replica(df, i):
        if i == 0:
            return df.select("vec_id", "embedding", "label")
        # sign-flip mask: flip dim j iff (i*7 + j) % 11 < 5
        flipped = F.transform(
            "embedding",
            lambda x, j: F.when(((F.lit(i * 7) + j) % 11) < 5, -x).otherwise(x),
        ).cast("array<float>")
        return df.select(
            (F.col("vec_id") + i * n_emb).alias("vec_id"),
            flipped.alias("embedding"),
            "label",
        )

    wr(_replicas(emb, factor, emb_replica), "embeddings")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scaled",
            "sf1",
        ),
    )
    args = ap.parse_args()
    if args.factor > len(_TAGS):
        raise SystemExit(f"--factor must be ≤ {len(_TAGS)} (tag alphabet)")

    from exosql_spark.session import get_spark

    spark = get_spark(app_name="gen_scaled")
    generate(spark, SRC, args.out, args.factor)
    print(f"done: {args.out} ({args.factor}× {SRC})")
    spark.stop()


if __name__ == "__main__":
    main()
