"""exosql SQL-dialect rewrite tests — queries a reference user would
run verbatim must work through the federation API."""

from __future__ import annotations

from exosql_spark.context import Context
from exosql_spark.dialect import rewrite, rewrite_distinct_on, rewrite_functions


class TestRewriteUnits:
    def test_strftime_literal(self):
        assert (
            rewrite_functions("SELECT strftime(ts, '%Y-%m-%d') FROM t")
            == "SELECT date_format(ts, 'yyyy-MM-dd') FROM t"
        )

    def test_jp_literal(self):
        assert (
            rewrite_functions("SELECT jp(props, '/a/0/b') FROM t")
            == "SELECT get_json_object(props, '$.a[0].b') FROM t"
        )

    def test_to_datetime_with_duration(self):
        out = rewrite_functions("SELECT to_datetime(x, '-1d') FROM t")
        assert "INTERVAL '-1' DAY" in out and "timestamp_seconds" in out

    def test_distinct_on_desugar(self):
        out = rewrite_distinct_on(
            "SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, ts DESC"
        )
        assert "row_number() OVER (PARTITION BY k ORDER BY k, ts DESC)" in out
        assert "__exo_rn = 1" in out

    def test_distinct_on_with_limit(self):
        out = rewrite_distinct_on(
            "SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, v LIMIT 5"
        )
        assert out.endswith("LIMIT 5")

    def test_strftime_quote_escaping(self):
        # Java patterns quote literals with single quotes — they must be
        # escaped for the SQL literal (regression: '%Y-%m-%dT%H' broke)
        out = rewrite_functions("SELECT strftime(ts, '%Y-%m-%dT%H') FROM t")
        assert "date_format(ts, 'yyyy-MM-dd''T''HH')" in out

    def test_plain_sql_untouched(self):
        sql = "SELECT a, count(*) FROM t GROUP BY a ORDER BY a"
        assert rewrite(sql) == sql


class TestDialectEndToEnd:
    def test_strftime_in_federated_sql(self, spark, sf_dir):
        ctx = Context(spark, {"tpch": {"parquet": sf_dir}})
        rows = ctx.sql(
            "SELECT strftime(o_orderdate, '%Y-%m') AS ym "
            "FROM tpch.orders WHERE o_orderkey = 1"
        ).collect()
        assert len(rows) == 1 and len(rows[0].ym) == 7 and "-" in rows[0].ym

    def test_jp_in_federated_sql(self, spark, sf_dir):
        ctx = Context(spark, {"ev": {"parquet": sf_dir}})
        rows = ctx.sql(
            "SELECT jp(props, '/k') AS k FROM ev.events WHERE event_id = 1"
        ).collect()
        assert rows[0].k is not None

    def test_distinct_on_in_federated_sql(self, spark, sf_dir):
        """The reference's DISTINCT ON runs verbatim: latest order per
        customer."""
        from pyspark.sql import functions as F

        ctx = Context(spark, {"tpch": {"parquet": sf_dir}})
        got = ctx.sql(
            "SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey "
            "FROM tpch.orders "
            "ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC"
        )
        # one row per customer, and it's the latest order
        orders = ctx.table("tpch", "orders")
        n_cust = orders.select("o_custkey").distinct().count()
        rows = got.collect()
        assert len(rows) == n_cust
        spot = orders.filter(F.col("o_custkey") == rows[0].o_custkey).orderBy(
            F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
        )
        assert spot.first().o_orderkey == rows[0].o_orderkey

    def test_to_datetime_epoch_in_sql(self, spark, sf_dir):
        ctx = Context(spark, {"tpch": {"parquet": sf_dir}})
        rows = ctx.sql(
            "SELECT to_datetime(0) AS epoch0"
        ).collect()
        assert str(rows[0].epoch0).startswith("1970-01-01")
