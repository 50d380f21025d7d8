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
- **Names get a per-replica tag** from a precomputed code of 130
  length-5 strings with pairwise LEVENSHTEIN ≥ 4 (self-checked at
  startup; raised from ≥ 3 in round 9 — distance exactly 3 made every
  same-name cross-replica pair a TRUE match for the k=3 fuzzy join,
  polluting its scaled-point measurement): without it every replica repeats the same 1 000 supplier
  names and the k≤2 fuzzy joins degenerate into mass-duplicate cross
  products — the tag keeps within-replica edit structure identical
  and cross-replica distances above every catalog threshold.
- **Document text gets a per-replica pure-translate transform** —
  three independent 5-cycles (vowels, b/c/d/f/g, l/m/n/p/r) giving
  125 distinct transforms: length, whitespace, punctuation, and token
  boundaries are untouched, so within-replica token/quality/dup
  structure is EXACTLY sf0.1's; across replicas the token sets are
  disjoint for any cycled-letter word, so exact/Jaccard/MinHash dedup
  outputs scale linearly instead of exploding on N-way copies.
- **Embeddings get a per-replica sign-flip mask** (two coprime
  moduli, pairwise-distinct for factors < 143 — see emb_replica):
  flipping ~half the dims of a near-isotropic vector decorrelates it
  from its source, so replicas are fresh vectors, not planted
  near-dups; within-replica geometry (norms, pairwise cosines) is
  preserved exactly. (dedup_semantic still trains k=16 on the
  replica-0 sample — at N× corpus under fixed k its Σ|cluster|²
  candidate work grows ~N²/k; the measurement is SUPPOSED to show
  that, k being the documented scale knob.)
- **Events** shift ``event_id``/``user_id``; timestamps are untouched
  so the windowed/sessionized per-user series repeat per replica.
  ``user_id`` shifts by ``i * n_cust`` — the same stride as customer
  keys — so replica *i*'s events resolve to replica *i*'s customers
  (referential integrity holds within each replica for events too,
  round-8 advice; per-replica join density is unchanged because the
  base events reference only the low customer-key range).

Deterministic end to end (no RNG anywhere), so repeated generations
are byte-stable and round-over-round comparisons are meaningful.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")

#: Per-replica name tags: 130 length-5 strings with pairwise
#: LEVENSHTEIN distance ≥ 4 (deterministic greedy filter over a
#: structured enumeration, verified in tests/test_tools.py and
#: re-checked at startup — an MDS/Hamming argument is NOT enough
#: here: a [4,2,3] RS code has Hamming distance 3 but measured
#: Levenshtein-2 pairs via shifts; round 8 shipped exactly that bug).
#: Distance ≥ 4 keeps tagged name duplicates outside EVERY catalog
#: fuzzy threshold (k ≤ 3, including the q-gram k=3 join whose
#: scaled-point measurement the old ≥ 3 code polluted with
#: tag-distance-exactly-3 true matches), for factors up to 130.
_TAGS = [
    "aaaaa", "abbcd", "acceg", "addgj", "aeeim", "affkp", "aggms", "ahhov",
    "aiiqy", "ajjsb", "akkue", "allwh", "ammyk", "bcdfh", "befjn", "bfglq",
    "bghnt", "bhipw", "bijrz", "bjktc", "bklvf", "blmxi", "bmnzl", "bnobo",
    "bopdr", "bqrhx", "cbdef", "cegko", "cfhmr", "chjqx", "ciksa", "cjlud",
    "ckmwg", "clnyj", "cmoam", "cnpcp", "cprgv", "cqsiy", "ctvoh", "dehlp",
    "dfins", "dgjpv", "dhkry", "diltb", "dknxh", "dlozk", "dmpbn", "dnqdq",
    "dorft", "dpshw", "dqtjz", "dwzvr", "ecgik", "eimuc", "ejnwf", "ekoyi",
    "elpal", "enrer", "eosgu", "equka", "ervmd", "eswog", "etxqj", "euysm",
    "ezdcb", "fjoxg", "fkpzj", "flqbm", "fmrdp", "fnsfs", "fothv", "fqvlb",
    "frwne", "fsxph", "ftyrk", "fuztn", "fvavq", "gdjmp", "giowe", "gkqak",
    "glrcn", "gmseq", "gntgt", "gouiw", "gpvkz", "grxof", "gtzsl", "guauo",
    "gwcyu", "hlsdo", "hmtfr", "hnuhu", "hovjx", "hpwla", "hqxnd", "hrypg",
    "hszrj", "htatm", "hubvp", "hxeby", "iemqu", "inviv", "ipxmb", "iqyoe",
    "isask", "itbun", "iucwq", "ivdyt", "iweaw", "ixfcz", "izhgf", "jmvht",
    "jpync", "jqzpf", "jrari", "jsbtl", "judxr", "jvezu", "jwfbx", "jxgda",
    "jyhfd", "kfpuz", "kgqwc", "krbsj", "kyige", "kzjih", "leptx", "lvgbw",
    "lwhdz", "mcoqs",
]



def _lev(a: str, b: str) -> int:
    """Levenshtein distance — module-level so tests reuse THIS
    implementation instead of keeping a duplicate in sync (the tag
    code's ≥ 4 guarantee is load-bearing; see _TAGS)."""
    dp = list(range(len(b) + 1))
    for x, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], x
        for y, cb in enumerate(b, 1):
            prev, dp[y] = dp[y], min(dp[y] + 1, dp[y - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


_VOWELS = "aeiou"


def _rot_vowels(col, i: int):
    """Per-replica text transform, a pure translate — three
    independent 5-cycles giving 125 DISTINCT transforms (injective
    for i < 125): vowel rotation by i, a b→c→d→f→g consonant cycle
    raised to (i//5), and an l→m→n→p→r cycle raised to (i//25).
    Distinctness matters: a transform collision makes two replicas
    byte-identical — cross-replica exact duplicates that change the
    corpus's dup density (the first 10× generation hit exactly this
    with a bare vowel rotation at i and i+5; the distinct-text count
    is the sanity check)."""
    from pyspark.sql import functions as F

    if i == 0:
        return col

    def _cyc(alpha: str, power: int) -> str:
        p = power % len(alpha)
        return alpha[p:] + alpha[:p]

    src = _VOWELS + "bcdfg" + "lmnpr"
    dst = _cyc(_VOWELS, i) + _cyc("bcdfg", i // 5) + _cyc("lmnpr", i // 25)
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
    # stride user_id by n_cust (not max(user_id)+1): customer keys
    # offset by i*n_cust, so the same stride keeps replica i's events
    # inside replica i's customer key space — a smaller stride would
    # resolve every i>0 event to a replica-0 customer (round-8 advice)
    wr(
        _replicas(
            ev,
            factor,
            lambda df, i: df.select(
                (F.col("event_id") + i * n_ev).alias("event_id"),
                "ts",
                (F.col("user_id") + i * n_cust).alias("user_id"),
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
        # sign-flip mask: flip dim j iff ((i*7+j) % 11 < 5) XOR
        # ((i*5+j) % 13 < 6). Two coprime moduli make the masks
        # PAIRWISE DISTINCT for all i < 143 (a collision needs
        # i1 ≡ i2 mod 11 AND mod 13); a single modulus repeated every
        # 11 replicas — byte-identical vectors across replicas, the
        # same density bug the text-transform collision had.
        flipped = F.transform(
            "embedding",
            lambda x, j: F.when(
                (((F.lit(i * 7) + j) % 11) < 5)
                != (((F.lit(i * 5) + j) % 13) < 6),
                -x,
            ).otherwise(x),
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
        raise SystemExit(f"--factor must be ≤ {len(_TAGS)} (tag code size)")

    # defensive: the fuzzy-threshold guarantee is load-bearing — verify
    # the tags actually used are pairwise levenshtein ≥ 4 (cheap:
    # factor² short-string DPs).
    used = _TAGS[: args.factor]
    bad = [
        (a, b)
        for idx, a in enumerate(used)
        for b in used[idx + 1 :]
        if _lev(a, b) < 4
    ]
    assert not bad, f"tag code violates levenshtein ≥ 4: {bad[:3]}"

    from exosql_spark.session import get_spark

    spark = get_spark(app_name="gen_scaled")
    generate(spark, SRC, args.out, args.factor)
    print(f"done: {args.out} ({args.factor}× {SRC})")
    spark.stop()


if __name__ == "__main__":
    main()
