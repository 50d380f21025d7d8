"""Sink tests: layout round-trips, partition pruning from written
layout, bucketed join without exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from exosql_spark import sinks
from exosql_spark.io import load_table


class TestParquetSink:
    def test_roundtrip(self, spark, sf_dir, tmp_path):
        p = str(tmp_path / "orders_out")
        orders = load_table(spark, sf_dir, "orders")
        sinks.write_table(orders, p)
        back = spark.read.parquet(p)
        assert back.count() == orders.count()
        assert set(back.columns) == set(orders.columns)

    def test_partitioned_layout_prunes(self, spark, sf_dir, tmp_path):
        p = str(tmp_path / "orders_part")
        orders = load_table(spark, sf_dir, "orders")
        sinks.write_table(orders, p, partition_by=["o_orderstatus"])
        back = spark.read.parquet(p).filter(F.col("o_orderstatus") == "O")
        plan = back._jdf.queryExecution().executedPlan().toString()
        # partition filter must hit the scan, not a post-filter
        assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
        assert back.count() > 0

    def test_ivf_layout_prunes_probed_cells(self, spark, sf_dir, tmp_path):
        """The ANN stored layout (SCALE.md): ivf_encode → write
        partitioned by cell → a probe's cell filter prunes PARTITIONS
        at the scan (PartitionFilters, not a post-scan filter), and
        ivf_topk over the stored layout returns exactly what the
        in-memory path returns."""
        from exosql_spark.operators.similarity import (
            _hyperplanes,
            ivf_encode,
            ivf_topk,
        )

        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        cents = _hyperplanes(64, 8, 7)
        p = str(tmp_path / "ivf_encoded")
        sinks.write_table(ivf_encode(emb, cents), p, partition_by=["cell"])
        stored = spark.read.parquet(p)

        probe = stored.filter(F.col("cell").isin(2, 5))
        plan = probe._jdf.queryExecution().executedPlan().toString()
        # the cell predicate must reach the partition layer of the scan
        assert "PartitionFilters: [cell" in plan
        assert probe.count() > 0

        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        from_mem = ivf_topk(emb, queries, k=5, centroids=cents).collect()
        from_disk = ivf_topk(
            emb, queries, k=5, centroids=cents, encoded=stored
        ).collect()
        assert sorted(map(tuple, from_mem)) == sorted(map(tuple, from_disk))

    def test_ivf_appended_layout_prunes_and_matches_rebuild(
        self, spark, sf_dir, tmp_path
    ):
        """Index maintenance (round-8 verdict Next #7): ivf_append with
        the FROZEN centroids into an existing cell-partitioned layout
        must (a) keep PartitionFilters pruning intact over the appended
        layout and (b) be probe-indistinguishable from a from-scratch
        rebuild of the full corpus."""
        from exosql_spark.operators.similarity import (
            _hyperplanes,
            ivf_append,
            ivf_encode,
            ivf_topk,
        )

        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        base = emb.filter(F.col("vec_id") % 2 == 0)
        increment = emb.filter(F.col("vec_id") % 2 == 1)
        cents = _hyperplanes(64, 8, 7)
        p = str(tmp_path / "ivf_appended")
        sinks.write_table(ivf_encode(base, cents), p, partition_by=["cell"])
        ivf_append(increment, cents, p)
        appended = spark.read.parquet(p)

        # appended rows are all present, assigned with the frozen grid
        assert appended.count() == emb.count()
        probe = appended.filter(F.col("cell").isin(2, 5))
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [cell" in plan

        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        rebuilt = str(tmp_path / "ivf_rebuilt")
        sinks.write_table(ivf_encode(emb, cents), rebuilt, partition_by=["cell"])
        from_append = ivf_topk(
            emb, queries, k=5, centroids=cents,
            encoded=appended,
        ).collect()
        from_rebuild = ivf_topk(
            emb, queries, k=5, centroids=cents,
            encoded=spark.read.parquet(rebuilt),
        ).collect()
        assert sorted(map(tuple, from_append)) == sorted(map(tuple, from_rebuild))

    def test_csv_export(self, spark, sf_dir, tmp_path):
        p = str(tmp_path / "region_csv")
        region = load_table(spark, sf_dir, "region")
        sinks.write_csv(region, p)
        back = spark.read.option("header", "true").csv(p)
        assert back.count() == 5


class TestBucketedSink:
    def test_bucketed_join_no_exchange(self, spark, sf_dir, tmp_path):
        """Two tables bucketed by the same key join without a shuffle —
        the write-time fix for the fact-fact exchange at 100 TB."""
        # managed tables land in ./spark-warehouse (gitignored);
        # warehouse.dir is a static conf and can't be pointed at tmp_path
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        sinks.write_bucketed_table(
            orders.select("o_orderkey", "o_totalprice"),
            "b_orders", ["o_orderkey"], 8, sort_by=["o_orderkey"],
        )
        sinks.write_bucketed_table(
            li, "b_lineitem", ["l_orderkey"], 8, sort_by=["l_orderkey"]
        )
        a = spark.table("b_orders")
        b = spark.table("b_lineitem")
        # disable broadcast so the join strategy decision is about
        # bucketing, not table size
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, a.o_orderkey == b.l_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan
            assert joined.count() == li.count()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestStreamingSink:
    def test_stream_to_parquet(self, spark, sf_dir, tmp_path):
        from exosql_spark import streaming

        s = streaming.read_events_stream(spark, f"{sf_dir}/events.parquet")
        out = str(tmp_path / "events_out")
        ckpt = str(tmp_path / "ckpt")
        q = sinks.write_stream_parquet(
            streaming.tumbling_counts(s), out, ckpt
        )
        q.awaitTermination(120)
        q.stop()
        back = spark.read.parquet(out)
        assert back.count() > 0
        assert "bucket_start" in back.columns
