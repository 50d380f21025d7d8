"""Sink tests: layout round-trips, partition pruning from written
layout, bucketed join without exchange."""

from __future__ import annotations

import pytest
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

    def test_compact_partitioned_one_file_per_cell(self, spark, sf_dir, tmp_path):
        """Append-fragmented layout → compact_partitioned → exactly one
        data file per cell, identical rows, pruning still intact."""
        import glob

        from exosql_spark.operators.similarity import (
            _hyperplanes,
            ivf_append,
            ivf_encode,
        )

        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        cents = _hyperplanes(64, 8, 7)
        p = str(tmp_path / "ivf_frag")
        sinks.write_table(
            ivf_encode(emb.filter(F.col("vec_id") % 3 == 0), cents),
            p, partition_by=["cell"],
        )
        ivf_append(emb.filter(F.col("vec_id") % 3 == 1), cents, p)
        ivf_append(emb.filter(F.col("vec_id") % 3 == 2), cents, p)
        before = spark.read.parquet(p).collect()
        assert any(
            len(glob.glob(f"{d}/*.parquet")) > 1
            for d in glob.glob(f"{p}/cell=*")
        ), "fixture should be fragmented before compaction"

        sinks.compact_partitioned(spark, p, partition_col="cell")
        for d in glob.glob(f"{p}/cell=*"):
            assert len(glob.glob(f"{d}/*.parquet")) == 1, d
        after = spark.read.parquet(p)
        assert sorted(map(tuple, before)) == sorted(map(tuple, after.collect()))
        plan = (
            after.filter(F.col("cell").isin(3, 4))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters: [cell" in plan

    def test_delete_rows_partitioned_rewrites_only_affected_cells(
        self, spark, sf_dir, tmp_path
    ):
        """Targeted delete: doomed keys vanish, survivors are intact,
        and UNAFFECTED partitions keep their files byte-identical
        (mtime+size unchanged) — the whole point at 100 TB."""
        import glob
        import os

        from exosql_spark.operators.similarity import _hyperplanes, ivf_encode

        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        cents = _hyperplanes(64, 8, 7)
        p = str(tmp_path / "ivf_del")
        sinks.write_table(ivf_encode(emb, cents), p, partition_by=["cell"])
        stored = spark.read.parquet(p)
        # doom every key in cell 2, plus a few keys from cell 5
        doomed = stored.filter(
            (F.col("cell") == 2)
            | ((F.col("cell") == 5) & (F.col("vec_id") % 2 == 0))
        ).select("vec_id")
        doomed_ids = {r[0] for r in doomed.collect()}
        untouched_files = {
            f: (os.path.getsize(f), os.path.getmtime(f))
            for f in glob.glob(f"{p}/cell=*/*.parquet")
            if "/cell=2/" not in f and "/cell=5/" not in f
        }

        sinks.delete_rows_partitioned(spark, p, doomed, key_col="vec_id")

        back = spark.read.parquet(p)
        left = {r[0] for r in back.select("vec_id").collect()}
        assert not (left & doomed_ids)
        assert left == {r[0] for r in emb.select("vec_id").collect()} - doomed_ids
        # emptied partition directory is gone entirely
        assert not glob.glob(f"{p}/cell=2"), "emptied cell dir must be removed"
        # unaffected partitions were not rewritten
        for f, sig in untouched_files.items():
            assert os.path.exists(f) and (
                os.path.getsize(f), os.path.getmtime(f)
            ) == sig, f
        # no stage dirs left behind
        assert not glob.glob(f"{p}__*_stage*")

    def test_delete_rows_partitioned_all_affected_cells_emptied(
        self, spark, sf_dir, tmp_path
    ):
        """When the doomed keys empty EVERY affected partition there is
        no survivor row to stage — the op must still remove the emptied
        partition dirs (and not crash on a zero-row staged read)."""
        import glob

        from exosql_spark.operators.similarity import _hyperplanes, ivf_encode

        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        p = str(tmp_path / "ivf_del_empty")
        sinks.write_table(
            ivf_encode(emb, _hyperplanes(64, 8, 7)), p, partition_by=["cell"]
        )
        stored = spark.read.parquet(p)
        doomed = stored.filter(F.col("cell").isin(1, 4)).select("vec_id")
        n_doomed = doomed.count()
        assert n_doomed > 0
        sinks.delete_rows_partitioned(spark, p, doomed, key_col="vec_id")
        assert not glob.glob(f"{p}/cell=1") and not glob.glob(f"{p}/cell=4")
        back = spark.read.parquet(p)
        assert back.count() == emb.count() - n_doomed
        assert not glob.glob(f"{p}__delete_stage*")

    def test_delete_rows_partitioned_escaped_string_partitions(
        self, spark, tmp_path
    ):
        """String partition values that Hive-escape on disk (':' →
        '%3A') and NULL partitions (__HIVE_DEFAULT_PARTITION__) must
        actually be deleted — the naive f'{col}={value}' path silently
        retained the rows (returned success, data still readable)."""
        import glob

        p = str(tmp_path / "esc_del")
        df = spark.createDataFrame(
            [(1, "a:b"), (2, "a:b"), (3, None), (4, None), (5, "ok"), (6, "ok")],
            "vec_id long, cell string",
        )
        sinks.write_table(df, p, partition_by=["cell"])
        # doom all of the escaped partition and half the NULL partition
        doomed = spark.createDataFrame([(1,), (2,), (3,)], "vec_id long")

        sinks.delete_rows_partitioned(spark, p, doomed, key_col="vec_id")

        back = spark.read.parquet(p)
        left = {r[0] for r in back.select("vec_id").collect()}
        assert left == {4, 5, 6}
        # the fully-emptied escaped dir is gone; NULL partition remains
        # (it still holds vec_id 4)
        assert not glob.glob(f"{p}/cell=a%3Ab")
        assert glob.glob(f"{p}/cell=__HIVE_DEFAULT_PARTITION__")

    def test_delete_rows_partitioned_all_escaped_emptied(self, spark, tmp_path):
        """The empty-everything path must also resolve escaped and NULL
        dirs (it deletes directories directly, no staged rewrite)."""
        import glob

        p = str(tmp_path / "esc_del_all")
        df = spark.createDataFrame(
            [(1, "a:b"), (2, None), (3, "keep")], "vec_id long, cell string"
        )
        sinks.write_table(df, p, partition_by=["cell"])
        doomed = spark.createDataFrame([(1,), (2,)], "vec_id long")

        sinks.delete_rows_partitioned(spark, p, doomed, key_col="vec_id")

        back = spark.read.parquet(p)
        assert {r[0] for r in back.select("vec_id").collect()} == {3}
        assert not glob.glob(f"{p}/cell=a%3Ab")
        assert not glob.glob(f"{p}/cell=__HIVE_DEFAULT_PARTITION__")

    def test_hadoop_delete_must_exist_raises(self, spark, tmp_path):
        from exosql_spark.sinks import _hadoop_delete

        missing = str(tmp_path / "nope")
        assert _hadoop_delete(spark, missing) is False  # lenient default
        with pytest.raises(IOError, match="expected path to exist"):
            _hadoop_delete(spark, missing, must_exist=True)

    def test_delete_rows_partitioned_no_match_is_noop(
        self, spark, sf_dir, tmp_path
    ):
        import glob
        import os

        from exosql_spark.operators.similarity import _hyperplanes, ivf_encode

        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        p = str(tmp_path / "ivf_del_noop")
        sinks.write_table(
            ivf_encode(emb, _hyperplanes(64, 8, 7)), p, partition_by=["cell"]
        )
        files = {
            f: os.path.getmtime(f) for f in glob.glob(f"{p}/cell=*/*.parquet")
        }
        ghosts = spark.range(5).select((F.col("id") + 10_000_000).alias("vec_id"))
        sinks.delete_rows_partitioned(spark, p, ghosts, key_col="vec_id")
        assert {
            f: os.path.getmtime(f) for f in glob.glob(f"{p}/cell=*/*.parquet")
        } == files

    def test_ivfpq_layout_maintenance_matches_rebuild(
        self, spark, sf_dir, tmp_path
    ):
        """The maintenance ops are layout-generic: append + compact +
        delete over the IVFADC (vec_id, cell, pq_code) layout probe
        exactly like a from-scratch rebuild of the surviving corpus —
        the compressed-domain symmetry of the IVF lifecycle tests."""
        from exosql_spark.operators import pq
        from exosql_spark.operators.similarity import _hyperplanes

        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        sample = emb.filter(F.col("vec_id") < 300)
        books = pq.train_codebooks(sample, m=8, k=16, iters=2, dim=64)
        cents = _hyperplanes(64, 8, 7)
        base = emb.filter(F.col("vec_id") % 2 == 0)
        increment = emb.filter(F.col("vec_id") % 2 == 1)
        doomed = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")

        p = str(tmp_path / "ivfpq_maint")
        sinks.write_table(
            pq.ivfpq_encode(base, books, cents), p, partition_by=["cell"]
        )
        pq.ivfpq_append(increment, books, cents, p)
        sinks.compact_partitioned(spark, p)
        sinks.delete_rows_partitioned(spark, p, doomed, key_col="vec_id")

        survivors = emb.join(doomed, "vec_id", "left_anti")
        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        maintained = pq.ivfpq_topk(
            survivors, queries, books, k=5, n_cells=8, centroids=cents,
            encoded=spark.read.parquet(p),
        ).collect()
        rebuilt = pq.ivfpq_topk(
            survivors, queries, books, k=5, n_cells=8, centroids=cents,
            encoded=pq.ivfpq_encode(survivors, books, cents),
        ).collect()
        assert sorted(map(tuple, maintained)) == sorted(map(tuple, rebuilt))

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


class TestBatchKeyedExtensions:
    def test_append_batch_keyed_extension_follows_codec(self, spark, tmp_path):
        """File names must carry the codec Spark actually wrote —
        a zstd batch may not masquerade as '.snappy.parquet'."""
        import glob
        import os

        df = spark.createDataFrame(
            [(1, "a"), (2, "b")], "cell int, v string"
        )
        root = str(tmp_path / "layout")
        sinks.append_batch_keyed(df, root, "cell", batch_id=0, compression="zstd")
        sinks.append_batch_keyed(df, root, "cell", batch_id=1)  # default snappy
        files = sorted(
            os.path.basename(p)
            for p in glob.glob(f"{root}/cell=1/ingest-b*.parquet")
        )
        assert files == ["ingest-b0-0.zstd.parquet", "ingest-b1-0.snappy.parquet"]
        # both batches readable together, no duplication
        assert spark.read.parquet(root).count() == 4


class TestReadLayoutAsof:
    def test_asof_reads_prefix_of_batches(self, spark, tmp_path):
        root = str(tmp_path / "layout")
        for b in range(3):
            df = spark.createDataFrame(
                [(b * 10 + i, i % 2) for i in range(4)], "v long, cell int"
            )
            sinks.append_batch_keyed(df, root, "cell", batch_id=b)
        # as of batch 1: batches 0 and 1 only
        got = sorted(
            r.v for r in sinks.read_layout_asof(spark, root, 1, "cell").collect()
        )
        assert got == sorted([i for i in range(4)] + [10 + i for i in range(4)])
        # as of batch 2 == full read
        assert sinks.read_layout_asof(spark, root, 2, "cell").count() == 12
        # partition column recovered from hive paths
        cells = {
            r.cell
            for r in sinks.read_layout_asof(spark, root, 0, "cell")
            .select("cell")
            .distinct()
            .collect()
        }
        assert cells == {0, 1}

    def test_asof_includes_plain_append_base(self, spark, tmp_path):
        root = str(tmp_path / "layout")
        base = spark.createDataFrame([(100, 0), (101, 1)], "v long, cell int")
        base.write.partitionBy("cell").parquet(root)  # part-* base files
        inc = spark.createDataFrame([(200, 0)], "v long, cell int")
        sinks.append_batch_keyed(inc, root, "cell", batch_id=5)
        # as-of an EARLIER batch: base only
        assert sorted(
            r.v for r in sinks.read_layout_asof(spark, root, 4, "cell").collect()
        ) == [100, 101]
        assert sorted(
            r.v for r in sinks.read_layout_asof(spark, root, 5, "cell").collect()
        ) == [100, 101, 200]

    def test_asof_before_any_data_raises(self, spark, tmp_path):
        root = str(tmp_path / "empty_layout")
        df = spark.createDataFrame([(1, 0)], "v long, cell int")
        sinks.append_batch_keyed(df, root, "cell", batch_id=3)
        import pytest as _pt

        with _pt.raises(FileNotFoundError):
            sinks.read_layout_asof(spark, root, 2, "cell")


class TestSchemaEvolutionRead:
    def test_merge_schema_fills_missing_columns(self, spark, tmp_path):
        """A layout whose newer batches carry extra columns must read as
        one table with NULLs backfilled — the schema-evolution shape
        every long-lived ingest layout hits (mergeSchema pays a footer
        scan per file; acceptable for evolving layouts, off by default
        for stable ones)."""
        root = str(tmp_path / "evolving")
        v1 = spark.createDataFrame([(1, "a")], "id long, text string")
        v1.write.parquet(root + "/batch=0")
        v2 = spark.createDataFrame(
            [(2, "b", 0.9)], "id long, text string, quality double"
        )
        v2.write.parquet(root + "/batch=1")
        back = (
            spark.read.option("mergeSchema", "true")
            .option("basePath", root)
            .parquet(root)
        )
        assert set(back.columns) == {"id", "text", "quality", "batch"}
        rows = {r.id: (r.quality, r.batch) for r in back.collect()}
        assert rows[1] == (None, 0)  # old rows: new column backfilled NULL
        assert rows[2] == (0.9, 1)


class TestZOrderLayout:
    def test_zorder_prunes_files_linear_sort_cannot(self, spark, tmp_path):
        """The measurable claim behind Z-ordering: for a 64x64 grid
        written as 8 files, a y-range predicate can skip most z-ordered
        files by their per-file y min/max, while an x-sorted layout
        puts every y value in every file (zero pruning)."""
        import duckdb
        import glob as _glob

        from pyspark.sql import functions as F

        from exosql_spark import sinks

        df = spark.range(4096).select(
            (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
        )
        zdir, ldir = str(tmp_path / "zorder"), str(tmp_path / "linear")
        sinks.write_zordered(df, zdir, [F.col("x"), F.col("y")], bits=6, n_files=8)
        (
            df.repartitionByRange(8, "x")
            .sortWithinPartitions("x")
            .write.parquet(ldir)
        )

        def prunable(d, lo, hi):
            con = duckdb.connect()
            files = sorted(_glob.glob(f"{d}/part-*.parquet"))
            assert len(files) == 8, files
            skipped = 0
            for f in files:
                mn, mx = con.execute(
                    f"SELECT min(y), max(y) FROM read_parquet('{f}')"
                ).fetchone()
                if mx < lo or mn > hi:
                    skipped += 1
            return skipped

        assert prunable(zdir, 0, 7) >= 4   # z-order: file y-extents are 16 wide
        assert prunable(ldir, 0, 7) == 0   # x-sort: every file spans all of y
