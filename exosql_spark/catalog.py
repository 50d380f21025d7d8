"""Query catalog — the single source of truth for operator coverage.

Every implemented operator from SURVEY.md §2 registers here with:
  - a Spark callable ``(spark, sf_dir) -> DataFrame``
  - an equivalent ANSI-SQL oracle string for DuckDB (or None for
    non-SQL-expressible ops → rows-only check)

``__spark_entry__.py``, ``tests/test_oracle.py`` and ``bench.py`` all
derive from this registry, so local tests exercise exactly the driver's
correctness gate.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that define catalog entries (imported lazily by all_queries()).
_QUERY_MODULES = (
    "exosql_spark.queries.core",
    "exosql_spark.queries.joins",
    "exosql_spark.queries.aggregates",
    "exosql_spark.queries.setops",
    "exosql_spark.queries.windows",
    "exosql_spark.queries.functions_q",
    "exosql_spark.queries.events_q",
    "exosql_spark.queries.llm_q",
    "exosql_spark.queries.sources_q",
    "exosql_spark.queries.udx_q",
    "exosql_spark.queries.extensions_q",
    "exosql_spark.queries.tpch_q",
    "exosql_spark.queries.streaming_q",
)

# Driver CORRECTNESS verifies entries in ``queries()`` iteration order
# and truncates after 50 (every round since r05 cut at exactly 50).
# Rounds 1-9 cumulatively blessed all 172 exact-oracle entries (every
# one driver-green, zero failures); the full local gate
# (tests/test_oracle.py) keeps rotated-out entries green between
# windows.  Rows-only bookkeeping (17 entries total): 13 carry an
# exact-oracle anchor driving the same code path or intent
# (curate_corpus_pipeline, dedup_minhash_pairs,
# dedup_minhash_components, similarity_topk_{lsh,lsh_multiprobe,ivf,
# pq,ivfpq,ivfpq_rerank}, embedding_kmeans, dedup_semantic,
# export_training_corpus, sample_stratified -- anchored by the
# deterministic sample_stratified_topn); 4 are unanchorable by nature
# (engine RNG / sketch internals: sample_fraction,
# agg_approx_percentile, fn_nondeterministic, approx_count_distinct).
#
# Since round 10 the verify window is COMPUTED, not hand-maintained
# (round-9 verdict Next #3: the hand tuple plus prose arithmetic
# could not keep the freshness bound honest as the catalog grows ~10
# entries/round against a fixed 50-row window).  FRESHNESS.json at
# the repo root -- regenerated each round by tools/gen_freshness.py
# from the driver's CORRECTNESS_r*.json artifacts -- records every
# entry's last driver-green round, and compute_verify_window() orders
# the window:
#   1. exact-oracle entries with NO driver row yet (new
#      registrations, registration order) -- no entry ever waits a
#      round for its first driver row;
#   2. RESTED streaming-parity entries (tag "streaming", last green
#      before the latest round), oldest first -- the parity block
#      guards the round-4 timestamp-unit bug class, so its members
#      never rest more than one round;
#   3. every other exact-oracle entry, oldest-green first
#      (registration order within the same round).
# The steady-state freshness bound is therefore
# ceil(n_exact / window) rounds, enforced by oldest-first rotation in
# code; tests/test_tools.py asserts the checked-in FRESHNESS.json
# matches a fresh fold of the CORRECTNESS files (no stale window) and
# pins the three-tier policy on the real catalog.

_WINDOW_SIZE = 50



@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, Query] = {}
_LOADED = False


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog entry {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tags, bench)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _LOADED = True


def load_freshness() -> dict | None:
    """The checked-in FRESHNESS.json (see the window policy comment
    above), or None outside a repo checkout — the window then falls
    back to registration order, which only matters for the driver's
    50-entry truncation, never for coverage."""
    import json
    from pathlib import Path

    p = Path(__file__).resolve().parents[1] / "FRESHNESS.json"
    if not p.exists():
        return None
    return json.loads(p.read_text())


def compute_verify_window(
    registry: dict[str, Query],
    freshness: dict,
    size: int = _WINDOW_SIZE,
) -> tuple[str, ...]:
    """The driver-verify window for the NEXT round: the three-tier
    rotation documented above, computed over the exact-oracle entries
    in ``registry`` (registration order) and the last-green rounds in
    ``freshness``."""
    last = freshness["last_green"]
    latest = freshness["latest_round"]
    exact = [n for n, q in registry.items() if q.oracle]
    order = {n: i for i, n in enumerate(exact)}
    new = [n for n in exact if n not in last]
    rested_streaming = sorted(
        (
            n
            for n in exact
            if n in last
            and "streaming" in registry[n].tags
            and last[n] < latest
        ),
        key=lambda n: (last[n], order[n]),
    )
    taken = set(new) | set(rested_streaming)
    oldest_first = sorted(
        (n for n in exact if n in last and n not in taken),
        key=lambda n: (last[n], order[n]),
    )
    return tuple((new + rested_streaming + oldest_first)[:size])


def verify_window() -> tuple[str, ...]:
    _load()
    fresh = load_freshness()
    if not fresh:
        return ()
    return compute_verify_window(_REGISTRY, fresh)


def all_queries() -> dict[str, Query]:
    _load()
    ordered: dict[str, Query] = {}
    for name in verify_window():
        ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}


def bench_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items() if q.bench}
