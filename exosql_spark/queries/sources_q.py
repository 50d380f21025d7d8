"""Source-connector catalog entries (SURVEY.md §2.1): the custom
Python DataSource HTTP connector (S5), env source (S3), CSV source
dynamics (S2) via the all-strings coercion path."""

from __future__ import annotations

from pyspark.sql import functions as F

from exosql_spark.catalog import register
from exosql_spark.queries import _util as _u


@register(
    "source_http_api",
    oracle="""
SELECT CAST(i AS BIGINT) AS id,
       CAST(i // 10 AS BIGINT) AS page,
       'item_' || CAST(i // 10 AS VARCHAR) || '_' || CAST(i % 10 AS VARCHAR) AS name
FROM range(40) t(i)
WHERE i > 17
""",
    tags=("source", "connector"),
)
def source_http_api(spark, sf_dir):
    """HTTP extractor twin (S5): Python DataSource with per-page
    partitions and qual pushdown (id > 17 travels to the transport as
    id_min — the reference's qual contract). The demo transport is
    deterministic, so DuckDB can oracle the exact rows."""
    from exosql_spark.sources.httpapi import http_table

    return http_table(spark, pages=4).filter(F.col("id") > 17)


@register(
    "source_generate_series_ts",
    oracle="""
SELECT ts_hour, CAST(date_part('hour', ts_hour) AS INT) AS hour_of_day
FROM (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-02 00:00:00',
                                INTERVAL 1 HOUR)) AS ts_hour
) t
""",
    tags=("source",),
)
def source_generate_series_ts(spark, sf_dir):
    """Datetime generate_series (S6 datetime variant): sequence() +
    explode — executor-side fan-out, no driver materialization."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
                F.lit("2024-01-02 00:00:00").cast("timestamp_ntz"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("ts_hour")
    ).select("ts_hour", F.hour("ts_hour").cast("int").alias("hour_of_day"))


@register(
    "federation_cross_source_join",
    oracle="""
SELECT n_name, count(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n_name
""",
    tags=("source", "federation"),
)
def federation_cross_source_join(spark, sf_dir):
    """exosql's signature move — ONE SQL over two databases
    (``lib/exosql.ex`` doc example joins a DB table to a CSV): here
    the parquet ``customer`` joins a CSV-served ``nation`` through
    ``Context.sql``'s ``db.table`` rewrite. The CSV side is derived
    on the fly from sf_dir's nation table (25 rows — construction-
    bounded, the documented driver-side edge for building a source,
    not part of the query plan). Schema inference on the CSV restores
    typed join keys; the join itself is broadcast (nation is tiny)."""
    import os
    import tempfile

    from exosql_spark.context import Context

    csv_root = os.path.join(
        tempfile.gettempdir(),
        f"exoquery_csvdb_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    os.makedirs(csv_root, exist_ok=True)
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    nation.toPandas().to_csv(os.path.join(csv_root, "nation.csv"), index=False)
    ctx = Context(spark, {"pq": {"parquet": sf_dir}, "csvdb": {"csv": csv_root}})
    return ctx.sql(
        "SELECT n_name, count(*) AS n_customers "
        "FROM pq.customer JOIN csvdb.nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name"
    )


@register(
    "federation_jsonl_nested",
    oracle="""
SELECT r_name, count(*) AS n_nations,
       CAST(sum(extra_rank) AS BIGINT) AS rank_sum
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
JOIN (SELECT n_nationkey AS k, n_nationkey % 5 AS extra_rank FROM nation) m
  ON n.n_nationkey = m.k
GROUP BY r_name
ORDER BY r_name
""",
    tags=("source", "federation", "json"),
    bench=True,  # plan-novel: multi-format federation, tracked since r12
)
def federation_jsonl_nested(spark, sf_dir):
    """JSON-lines federation: one SQL over parquet tables and a
    JSONL-served side table carrying a NESTED struct — the field shape
    the CSV extractor model (flat strings) cannot express; the dotted
    path reads straight through Spark SQL.  The JSONL side is derived
    on the fly from sf_dir's nation table (25 rows — construction-
    bounded, same documented edge as the CSV federation entry); its
    nested ``meta.rank`` joins and aggregates like a column."""
    import json as _json
    import os
    import tempfile

    from exosql_spark.context import Context

    jl_root = os.path.join(
        tempfile.gettempdir(),
        f"exoquery_jsonldb_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    os.makedirs(jl_root, exist_ok=True)
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    with open(os.path.join(jl_root, "nation_meta.jsonl"), "w") as fh:
        for r in nation.select("n_nationkey").toPandas().itertuples():
            fh.write(
                _json.dumps(
                    {
                        "k": int(r.n_nationkey),
                        "meta": {"rank": int(r.n_nationkey) % 5},
                    }
                )
                + "\n"
            )
    ctx = Context(
        spark, {"pq": {"parquet": sf_dir}, "jdb": {"jsonl": jl_root}}
    )
    return ctx.sql(
        "SELECT r_name, count(*) AS n_nations, sum(m.meta.rank) AS rank_sum "
        "FROM pq.nation n JOIN pq.region r ON n.n_regionkey = r.r_regionkey "
        "JOIN jdb.nation_meta m ON n.n_nationkey = m.k "
        "GROUP BY r_name ORDER BY r_name"
    )


@register(
    "federation_orc_columnar",
    oracle="""
SELECT CAST(m.class AS BIGINT) AS class,
       CAST(count(*) AS BIGINT) AS n_parts,
       min(p.p_retailprice) AS min_price,
       max(p.p_retailprice) AS max_price
FROM part p
JOIN (SELECT p_partkey AS k, p_partkey % 7 AS class FROM part) m
  ON p.p_partkey = m.k
GROUP BY 1 ORDER BY 1
""",
    tags=("source", "federation", "orc"),
)
def federation_orc_columnar(spark, sf_dir):
    """ORC federation: one SQL over parquet tables and an ORC-served
    side table — the second binary columnar format through the same
    extractor model (db dir -> tables), with pushdown/pruning coming
    through Spark's native ORC relation exactly as for parquet.  The
    ORC side is derived on the fly from sf_dir's part table and
    written once per sf_dir (Spark writer, idempotent overwrite);
    the oracle recomputes the same classification from part."""
    import os
    import tempfile

    from exosql_spark.context import Context

    orc_root = os.path.join(
        tempfile.gettempdir(),
        f"exoquery_orcdb_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    os.makedirs(orc_root, exist_ok=True)
    part = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    part.select(
        F.col("p_partkey").alias("k"),
        (F.col("p_partkey") % 7).alias("class"),
    ).write.mode("overwrite").orc(os.path.join(orc_root, "part_class.orc"))
    ctx = Context(spark, {"pq": {"parquet": sf_dir}, "odb": {"orc": orc_root}})
    return ctx.sql(
        "SELECT m.class AS class, count(*) AS n_parts, "
        "min(p.p_retailprice) AS min_price, max(p.p_retailprice) AS max_price "
        "FROM pq.part p JOIN odb.part_class m ON p.p_partkey = m.k "
        "GROUP BY m.class ORDER BY m.class"
    )


@register(
    "source_sys_pinned_suite",
    oracle="""
SELECT * FROM (
  SELECT 'env' AS variant, 'EXOSQL_PROBE_A' AS key, 'alpha-7' AS value,
         CAST(NULL AS BIGINT) AS kb, CAST(NULL AS INTEGER) AS n_cpus,
         CAST(NULL AS BIGINT) AS pid
  UNION ALL SELECT 'env', 'EXOSQL_PROBE_B', 'beta-11', NULL, NULL, NULL
  UNION ALL SELECT 'node', 'MemAvailable', CAST(NULL AS VARCHAR),
         CAST(98304000 AS BIGINT), CAST(32 AS INTEGER), CAST(4242 AS BIGINT)
  UNION ALL SELECT 'node', 'MemTotal', NULL,
         CAST(131072000 AS BIGINT), CAST(32 AS INTEGER), CAST(4242 AS BIGINT)
) ORDER BY variant, key
""",
    tags=("source", "env", "node"),
)
def source_sys_pinned_suite(spark, sf_dir):
    """S3 env + S4 node extractors as tagged variants, both with
    DRIVER-checkable oracles (r15 window-capacity consolidation of
    source_env_pinned + source_node_pinned — the r16 pre-plan's first
    target, executed early; every column of both originals preserved:
    env rows carry ``key``/``value``, node rows ``key``/``kb``/
    ``n_cpus``/``pid``):

    - ``env``: the process environment is nondeterministic, so the
      entry PINS two probe variables before reading and filters the
      env table to exactly those keys — the oracle states their
      values as literals, and what the value hash checks is the
      extractor's mechanics (process env → (key, value) table through
      Context, key-filter pushdown);
    - ``node``: host stats are nondeterministic, so the entry injects
      a PINNED snapshot provider behind the same three table surfaces
      (``{"node": {...}}`` spec → exosql_spark.sources.node_source)
      and the oracle states the snapshot as literals — proving spec
      resolution and registration through Context, the cpu/memory/
      process schemas, and a key-filter + cross-table projection over
      them, everything except the ``/proc`` read itself (reference
      parity: exosql's env and node extractors, SURVEY.md S3/S4)."""
    import os

    from exosql_spark.context import Context

    os.environ["EXOSQL_PROBE_A"] = "alpha-7"
    os.environ["EXOSQL_PROBE_B"] = "beta-11"
    snapshot = {
        "cpu": (32, 1.5, 1.25, 1.0),
        "meminfo": {
            "MemTotal": 131072000,
            "MemFree": 65536000,
            "MemAvailable": 98304000,
            "Buffers": 2048000,
            "Cached": 16384000,
        },
        "process": (4242, 12.5, 3.25, 524288),
    }
    # one federation context, two schemas (the spec resolver selects
    # one source kind per schema)
    ctx = Context(
        spark, {"sysenv": {"env": True}, "sysnode": {"node": snapshot}}
    )
    env = ctx.sql(
        "SELECT 'env' AS variant, key, value, "
        "CAST(NULL AS BIGINT) AS kb, CAST(NULL AS INT) AS n_cpus, "
        "CAST(NULL AS BIGINT) AS pid "
        "FROM sysenv.env "
        "WHERE key IN ('EXOSQL_PROBE_A', 'EXOSQL_PROBE_B')"
    )
    node = ctx.sql(
        "SELECT 'node' AS variant, m.key AS key, "
        "CAST(NULL AS STRING) AS value, m.kb AS kb, "
        "c.n_cpus AS n_cpus, p.pid AS pid "
        "FROM sysnode.memory m CROSS JOIN sysnode.cpu c "
        "CROSS JOIN sysnode.process p "
        "WHERE m.key IN ('MemTotal', 'MemAvailable')"
    )
    return env.unionByName(node).orderBy("variant", "key")


@register(
    "sink_write_read_back",
    oracle=f"""
SELECT o_orderpriority AS priority,
       count(*) AS n_orders,
       {_u.dsum_sql('o_totalprice')} AS total_price,
       CAST(CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS BIGINT) AS prio_rank
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
""",
    tags=("sink", "lifecycle"),
)
def sink_write_read_back(spark, sf_dir):
    """S9 PLAIN-sink lifecycle with a driver-checkable oracle (r13
    verdict Next #4 — the last §2 row without one; reference parity:
    exosql's result surface is ``lib/exosql.ex :: format_result`` plus
    CSV-style export, SURVEY.md §2 S9).  The driver can only verify
    SELECTs, so the entry proves the WRITE paths the way the
    IVF-stored layout entries do — write → re-register → read back →
    aggregate, with the oracle recomputing the same answer from the
    ORIGINAL table: any corruption anywhere in either round-trip
    changes the value hash.

    Two sinks in one lifecycle: (1) :func:`exosql_spark.sinks.
    write_table` writes an orders projection as a parquet dataset
    PARTITIONED BY o_orderpriority — whose values contain spaces
    (``4-NOT SPECIFIED``), so partition-directory escaping round-trips
    — with sortWithinPartitions applied; (2) :func:`exosql_spark.
    sinks.write_csv` exports a 5-row priority→rank mapping (the
    reference's CSV export shape).  Both re-enter through Context
    (parquet-db + csv-db with schema inference) and ONE SQL joins
    them.  Writes land in tempdir once per sf_dir (idempotent
    overwrite, same documented edge as the ORC/CSV federation
    entries)."""
    import os
    import tempfile

    from exosql_spark import sinks
    from exosql_spark.context import Context

    base = os.path.basename(os.path.normpath(sf_dir))
    pq_root = os.path.join(tempfile.gettempdir(), f"exoquery_sinkdb_{base}")
    csv_root = os.path.join(tempfile.gettempdir(), f"exoquery_sinkcsv_{base}")
    os.makedirs(pq_root, exist_ok=True)
    os.makedirs(csv_root, exist_ok=True)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    sinks.write_table(
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority"),
        os.path.join(pq_root, "orders_slim.parquet"),
        partition_by=["o_orderpriority"],
        sorted_within=["o_orderkey"],
    )
    ranks = (
        orders.select(F.col("o_orderpriority").alias("priority"))
        .distinct()
        .withColumn("prio_rank", F.substring("priority", 1, 1).cast("int"))
    )
    sinks.write_csv(ranks, os.path.join(csv_root, "prio_rank.csv"))
    ctx = Context(spark, {"snk": {"parquet": pq_root}, "rcsv": {"csv": csv_root}})
    return ctx.sql(
        "SELECT s.o_orderpriority AS priority, count(*) AS n_orders, "
        f"{_u.dsum_sql('s.o_totalprice')} AS total_price, "
        "CAST(max(r.prio_rank) AS BIGINT) AS prio_rank "
        "FROM snk.orders_slim s "
        "JOIN rcsv.prio_rank r ON s.o_orderpriority = r.priority "
        "GROUP BY s.o_orderpriority ORDER BY priority"
    )
