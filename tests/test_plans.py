"""Physical-plan assertions — the scale story, checked mechanically:
filters and projections reach the parquet scan, dimension joins
broadcast, orderBy+limit compiles to top-k, aggregates do partial
(map-side) combine. These are the properties that survive a 100×
scale-up; failing them means a plan regression even if results match."""

from __future__ import annotations

from pyspark.sql import functions as F

from exosql_spark.io import Tables


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


class TestPushdown:
    def test_filter_pushed_to_parquet(self, spark, sf_dir):
        t = Tables(spark, sf_dir)
        df = t.lineitem.filter(F.col("l_quantity") >= 45).select("l_orderkey")
        s = formatted(df)
        assert "PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,45.0)]" in s

    def test_column_pruning(self, spark, sf_dir):
        t = Tables(spark, sf_dir)
        df = t.lineitem.select("l_orderkey", "l_quantity")
        s = formatted(df)
        # ReadSchema must not include unprojected columns
        assert "l_extendedprice" not in s.split("ReadSchema:")[1].splitlines()[0]

    def test_timestamp_filter_pushed(self, spark, sf_dir):
        t = Tables(spark, sf_dir)
        df = t.lineitem.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
        ).select("l_orderkey")
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate," in formatted(df)


class TestJoinStrategy:
    def test_dim_join_broadcasts(self, spark, sf_dir):
        t = Tables(spark, sf_dir)
        df = t.orders.join(
            F.broadcast(t.customer),
            t.orders.o_custkey == t.customer.c_custkey,
        )
        assert "BroadcastHashJoin" in plan(df)

    def test_semi_join_type(self, spark, sf_dir):
        t = Tables(spark, sf_dir)
        keys = t.orders.select("o_custkey")
        df = t.customer.join(
            keys, t.customer.c_custkey == keys.o_custkey, "left_semi"
        )
        assert "LeftSemi" in df._jdf.queryExecution().optimizedPlan().toString()


class TestAggAndSort:
    def test_partial_agg_before_exchange(self, spark, sf_dir):
        t = Tables(spark, sf_dir)
        df = t.lineitem.groupBy("l_returnflag").agg(F.sum("l_quantity"))
        p = plan(df)
        # two HashAggregates (partial + final) with the exchange between:
        # final appears first (top of plan text), partial after Exchange
        assert p.count("HashAggregate") >= 2
        assert p.find("HashAggregate", p.find("Exchange")) != -1

    def test_orderby_limit_is_topk(self, spark, sf_dir):
        t = Tables(spark, sf_dir)
        df = t.orders.orderBy(F.col("o_totalprice").desc()).limit(5)
        assert "TakeOrderedAndProject" in plan(df)

    def test_whole_stage_codegen_active(self, spark, sf_dir):
        t = Tables(spark, sf_dir)
        df = t.lineitem.filter(F.col("l_quantity") > 10).groupBy("l_returnflag").count()
        df.collect()  # AQE: codegen markers appear in the final plan
        assert "*(1)" in plan(df)


class TestNoDriverLoops:
    def test_queries_return_lazy_dataframes(self, spark, sf_dir):
        """Every catalog entry must return an unevaluated DataFrame (no
        collect-then-recreate antipattern)."""
        from pyspark.sql import DataFrame

        from exosql_spark.catalog import all_queries

        for name, q in all_queries().items():
            df = q.fn(spark, sf_dir)
            assert isinstance(df, DataFrame), name


class TestNoAccidentalCartesian:
    """Guard: no catalog entry may compile to a cartesian product or
    broadcast nested-loop join unless it is an intentional cross/theta
    join — at 100 TB an accidental BNLJ is a query that never ends."""

    ALLOWED = {
        "join_cross",           # intentional cartesian
        "similarity_topk_cosine",  # intentional broadcast×scan (query set)
        "similarity_topk_lsh",
        "similarity_topk_ivf",
        "events_sliding_window",
        "tpch_q22_dormant_rich_customers",  # 1-row global-avg broadcast scalar
        "tpch_q11_important_stock",  # 1-row global-total broadcast scalar
        "text_tfidf_topk",  # 1-row corpus-size broadcast scalar
        "text_bm25_topk",  # 1-row corpus-stats broadcast scalar
    }

    def test_no_unexpected_cartesian(self, spark, sf_dir):
        from exosql_spark.catalog import all_queries

        bad = []
        for name, q in all_queries().items():
            if name in self.ALLOWED:
                continue
            try:
                df = q.fn(spark, sf_dir)
                p = df._jdf.queryExecution().executedPlan().toString()
            except Exception:
                continue  # streaming/stateful entries can't explain here
            if "CartesianProduct" in p:
                bad.append((name, "CartesianProduct"))
            if "BroadcastNestedLoopJoin" in p and "similarity" not in name:
                bad.append((name, "BroadcastNestedLoopJoin"))
        assert not bad, bad
