"""Streaming extension tests: every streaming transformation must agree
with its batch twin when drained with availableNow (batch-parity — the
strategy SURVEY.md §2.9 prescribes since the reference has no streaming
semantics to copy)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from exosql_spark import streaming
from exosql_spark.io import load_table


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return streaming.read_events_stream(spark, f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def drain(stream_df, name, mode="append"):
    q = streaming.run_to_memory(stream_df, name, mode=mode)
    spark = stream_df.sparkSession
    out = spark.table(name)
    q.stop()
    return out


class TestBatchParity:
    """Append-mode streams only emit windows the final watermark has
    closed (end ≤ max event time − watermark) — parity is asserted on
    that finalized subset, which is exactly the late-data guarantee."""

    def test_tumbling_counts(self, spark, events_stream, events_batch):
        max_ts = events_batch.agg(F.max("ts")).collect()[0][0]
        got = {
            tuple(r)
            for r in drain(streaming.tumbling_counts(events_stream), "t_tumbling")
            .filter(F.col("bucket_start") < F.lit(max_ts) - F.expr("INTERVAL 3 HOURS"))
            .collect()
        }
        want = {
            tuple(r)
            for r in (
                events_batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.round(F.sum("value"), 4).alias("total_value"),
                )
                .select(
                    F.col("w.start").cast("timestamp").alias("bucket_start"),
                    "event_type",
                    "n_events",
                    "total_value",
                )
                .filter(
                    F.col("bucket_start") < F.lit(max_ts) - F.expr("INTERVAL 3 HOURS")
                )
                .collect()
            )
        }
        assert got == want and len(got) > 100

    def test_session_aggregate(self, spark, events_stream, events_batch):
        got = drain(
            streaming.session_aggregate(events_stream), "t_sessions"
        )
        # all but the trailing (unfinalized) sessions are emitted
        emitted = got.agg(F.sum("n_events")).collect()[0][0]
        total = events_batch.count()
        assert total * 0.99 <= emitted <= total
        # sessions are well-formed intervals
        assert got.filter(F.col("session_end") < F.col("session_start")).count() == 0

    def test_dedup_within_watermark(self, spark, events_stream, events_batch):
        got = drain(
            streaming.dedup_within_watermark(events_stream), "t_dedup"
        )
        assert got.count() == events_batch.select("event_id").distinct().count()


class TestStreamingPlan:
    def test_is_streaming(self, events_stream):
        assert events_stream.isStreaming

    def test_watermark_in_plan(self, events_stream):
        agg = streaming.tumbling_counts(events_stream)
        assert "EventTimeWatermark" in agg._jdf.queryExecution().logical().toString()


class TestStatefulOperators:
    """applyInPandasWithState custom operators — drained with
    availableNow, compared against the equivalent batch computation."""

    def test_running_user_stats_parity(self, spark, events_stream, events_batch):
        from exosql_spark.streaming.stateful import running_user_stats

        got = drain(
            running_user_stats(events_stream), "t_stateful_stats", mode="update"
        )
        # update mode: the LAST row per user is the final state
        final = (
            got.groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("total_value").alias("total_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        want = events_batch.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.max("value").alias("max_value"),
        )
        joined = final.alias("a").join(want.alias("b"), "user_id")
        assert joined.count() == want.count()
        mismatch = joined.filter(
            (F.col("a.n_events") != F.col("b.n_events"))
            | (F.abs(F.col("a.total_value") - F.col("b.total_value")) > 0.01)
            | (F.col("a.max_value") != F.col("b.max_value"))
        )
        assert mismatch.count() == 0

    def test_anomaly_flags_monotonic(self, spark, events_stream, events_batch):
        from exosql_spark.streaming.stateful import anomaly_flags

        got = drain(anomaly_flags(events_stream, step=500.0), "t_alerts")
        # every user's crossed thresholds are distinct multiples of 500
        assert got.count() > 0
        assert (
            got.filter(F.col("threshold_crossed") % 500.0 != 0).count() == 0
        )
        dups = (
            got.groupBy("user_id", "threshold_crossed")
            .count()
            .filter(F.col("count") > 1)
        )
        assert dups.count() == 0
        # total alert count == sum over users of floor(total/step)
        want = (
            events_batch.groupBy("user_id")
            .agg(F.floor(F.sum("value") / 500.0).alias("n_alerts"))
            .agg(F.sum("n_alerts"))
            .collect()[0][0]
        )
        assert got.count() == want


class TestStreamStaticJoin:
    def test_enrich_with_dimension(self, spark, events_stream, events_batch, sf_dir):
        from exosql_spark.io import load_table

        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        enriched = streaming.enrich_with_dimension(events_stream, cust)
        assert enriched.isStreaming
        got = drain(
            enriched.select("event_id", "user_id", "c_mktsegment"),
            "t_enriched",
        )
        assert got.count() == events_batch.count()  # left join keeps all
        # users that exist in the dim got a segment
        matched = got.filter(F.col("c_mktsegment").isNotNull()).count()
        want = (
            events_batch.join(
                cust, events_batch.user_id == cust.c_custkey, "inner"
            ).count()
        )
        assert matched == want


class TestStreamingCorpus:
    """The batch curation operators run unchanged on a document stream
    — identical Column expressions, streaming execution."""

    def test_curate_stream_matches_batch(self, spark, sf_dir):
        from exosql_spark.io import load_table
        from exosql_spark.operators.pipeline import CurateConfig, curate_corpus
        from exosql_spark.streaming import corpus

        s = corpus.read_documents_stream(spark, f"{sf_dir}/documents.parquet")
        q = streaming.run_to_memory(
            corpus.curate_stream(s, min_tokens=5, min_quality=0.3), "t_curated"
        )
        got = spark.table("t_curated")
        batch_docs = load_table(spark, sf_dir, "documents")
        # batch pipeline WITHOUT dedup stages = the same per-row curation
        from exosql_spark.operators import text as t_ops

        want = (
            t_ops.quality_score(batch_docs, "text")
            .filter((F.col("q_n_tokens") >= 5) & (F.col("quality") >= 0.3))
        )
        assert got.count() == want.count()
        assert got.filter(F.col("lang_pred").isNull()).count() == 0
        q.stop()

    def test_stream_exact_dedup(self, spark, sf_dir):
        from exosql_spark.streaming import corpus

        s = corpus.read_documents_stream(spark, f"{sf_dir}/documents.parquet")
        q = streaming.run_to_memory(
            corpus.stream_exact_dedup(
                corpus.curate_stream(s, min_tokens=0, min_quality=0.0)
            ),
            "t_dedup_stream",
        )
        got = spark.table("t_dedup_stream")
        n = got.count()
        assert n == got.select("content_hash").distinct().count()
        q.stop()


class TestStreamStreamJoin:
    """Stream-stream interval join (view→purchase attribution):
    inner matches emit regardless of watermark (it only gates state
    cleanup), so the drained stream equals the batch join exactly."""

    def test_attribution_matches_batch(self, spark, events_stream, events_batch):
        sv = events_stream.filter(F.col("event_type") == "view")
        sp = events_stream.filter(F.col("event_type") == "purchase")
        out = drain(
            streaming.attribution_join(sv, sp), "t_attrib"
        ).orderBy("purchase_id", "view_id")

        bv = events_batch.filter(F.col("event_type") == "view")
        bp = events_batch.filter(F.col("event_type") == "purchase")
        expected = streaming.attribution_join(bv, bp).orderBy(
            "purchase_id", "view_id"
        )
        got = [tuple(r) for r in out.collect()]
        want = [tuple(r) for r in expected.collect()]
        assert len(want) > 0  # fixture actually produces matches
        assert got == want

    def test_state_bound_in_plan(self, events_stream):
        sv = events_stream.filter(F.col("event_type") == "view")
        sp = events_stream.filter(F.col("event_type") == "purchase")
        j = streaming.attribution_join(sv, sp)
        assert j.isStreaming
        plan = j._jdf.queryExecution().analyzed().toString()
        assert "watermark" in plan.lower()


class TestLateDataDrop:
    """The actual late-data guarantee, exercised across REAL micro-batch
    boundaries. Spark subtlety pinned here (SPARK-40925 semantics,
    verified empirically on this build): the LATE-EVENT filter for
    batch N uses the watermark as of batch N−1 — one batch behind the
    eviction watermark. A late row arriving in the very next batch
    after its window closed can still merge into state; the drop is
    guaranteed only from the batch after that. Downstream consequence:
    at-least-one-extra-batch of slack when reasoning about
    completeness, exactly why the parity entries use availableNow
    full drains instead of assuming per-batch cutoffs."""

    def test_late_rows_beyond_previous_watermark_dropped(self, spark, tmp_path):
        import glob
        import os
        from datetime import datetime

        src = str(tmp_path / "late_src")
        schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

        def mk(rows, mtime):
            before = set(glob.glob(f"{src}/part-*"))
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            # the file source orders batches by modification time —
            # same-second appends are ambiguous, so pin them apart
            for f in set(glob.glob(f"{src}/part-*")) - before:
                os.utime(f, (mtime, mtime))

        # batch 0: hours 0..11 → watermark after batch = 09:30
        mk(
            [
                (i, datetime(2024, 3, 1, h, 30), 1, "view", 1.0, "{}")
                for i, h in enumerate(range(0, 12))
            ],
            1_000_000,
        )
        # batch 1: fresh row only — promotes 09:30 into the late filter
        mk([(50, datetime(2024, 3, 1, 12, 30), 1, "view", 1.0, "{}")], 2_000_000)
        # batch 2: a row 5 h behind the late filter → MUST be dropped
        mk(
            [
                (100, datetime(2024, 3, 1, 4, 45), 1, "view", 100.0, "{}"),
                (101, datetime(2024, 3, 1, 13, 30), 1, "view", 1.0, "{}"),
            ],
            3_000_000,
        )

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        rows = drain(
            streaming.tumbling_counts(stream), "t_late", mode="update"
        ).collect()
        # update-mode memory sink keeps every emission; a bucket is
        # clean iff NO emission for it ever saw the late row
        by_hour: dict[int, list] = {}
        for r in rows:
            by_hour.setdefault(r.bucket_start.hour, []).append(
                (r.n_events, r.total_value)
            )
        assert (2, 101.0) not in by_hour[4], by_hour
        assert by_hour[4] == [(1, 1.0)], by_hour
        assert all(by_hour[h] == [(1, 1.0)] for h in range(0, 12)), by_hour


class TestCheckpointRestart:
    """Exactly-once across restart: a checkpointed parquet-sink query
    killed mid-stream and restarted from the same checkpoint must
    produce every source row exactly once (offset log + file-sink
    manifest — the guarantee COVERAGE.md claims)."""

    def test_no_dup_no_loss_after_restart(self, spark, sf_dir, tmp_path):
        import time

        src_dir = str(tmp_path / "src")
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        # many small source files → many micro-batches (1 file/trigger)
        events = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        events.repartition(16).write.parquet(src_dir)
        n_src = events.count()

        stream = (
            spark.readStream.schema("event_id long, event_type string, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

        # run 1: stop as soon as at least one batch has committed
        q1 = streaming.start_to_parquet(stream, out_dir, ckpt)
        deadline = time.time() + 60
        while time.time() < deadline:
            if any(p for p in q1.recentProgress):
                break
            time.sleep(0.05)
        q1.stop()
        q1.awaitTermination(30)
        batches_run1 = len(q1.recentProgress)

        # run 2: same sink path + checkpoint → resumes, never re-emits
        q2 = streaming.start_to_parquet(stream, out_dir, ckpt)
        q2.awaitTermination(120)

        out = spark.read.parquet(out_dir)
        assert out.count() == n_src, f"run1 committed {batches_run1} batches"
        assert out.select("event_id").distinct().count() == n_src
        assert (
            out.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0
        )


class TestIndexIngestStream:
    def test_stream_ingest_equals_batch_encode(self, spark, sf_dir, tmp_path):
        """foreachBatch ivf_append over a 3-file stream produces the
        SAME (vec_id, cell) layout as a one-shot batch encode — frozen
        centroids make continuous ingest rebuild-equivalent — and the
        per-batch appends fragment cells (the compaction rationale)."""
        import glob

        from exosql_spark import sinks, streaming
        from exosql_spark.io import load_table
        from exosql_spark.operators.similarity import _hyperplanes, ivf_encode

        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        cents = _hyperplanes(64, 8, 7)
        base = emb.filter(F.col("vec_id") % 4 == 0)
        increment = emb.filter(F.col("vec_id") % 4 != 0)

        path = str(tmp_path / "layout")
        sinks.write_table(ivf_encode(base, cents), path, partition_by=["cell"])
        inc_dir = str(tmp_path / "incoming")
        increment.repartition(3).write.parquet(inc_dir)

        stream = streaming.read_embeddings_stream(spark, inc_dir)
        q = streaming.ivf_ingest_stream(
            stream, cents, path, str(tmp_path / "ckpt")
        )
        drained = q.awaitTermination(120)
        q.stop()
        assert drained, "availableNow drain timed out (harness stall, not an ivf_append bug)"
        assert len(q.recentProgress) >= 3, "expected one micro-batch per file"

        ingested = spark.read.parquet(path).select("vec_id", "cell")
        rebuilt = ivf_encode(emb, cents).select("vec_id", "cell")
        assert sorted(map(tuple, ingested.collect())) == sorted(
            map(tuple, rebuilt.collect())
        )
        # per-batch appends fragment at least one cell
        assert any(
            len(glob.glob(f"{d}/*.parquet")) > 1
            for d in glob.glob(f"{path}/cell=*")
        )

    def test_replayed_batch_is_idempotent(self, spark, sf_dir, tmp_path):
        """Round-10 durability close: a micro-batch re-run with the
        SAME batch id (the crash-between-append-and-offset-commit
        replay) must leave the stored layout and probe results
        byte-identical to a single run — batch-id-keyed file names
        overwrite, never duplicate (sinks.append_batch_keyed)."""
        import glob

        from exosql_spark import sinks
        from exosql_spark.operators.similarity import (
            _hyperplanes,
            ivf_append,
            ivf_encode,
            ivf_topk,
        )
        from exosql_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        cents = _hyperplanes(64, 8, 7)
        base = emb.filter(F.col("vec_id") % 4 == 0)
        batch = emb.filter(F.col("vec_id") % 4 == 1)
        path = str(tmp_path / "layout")
        sinks.write_table(ivf_encode(base, cents), path, partition_by=["cell"])

        def snapshot():
            files = sorted(
                (f, os.path.getsize(f))
                for f in glob.glob(f"{path}/cell=*/*.parquet")
            )
            rows = sorted(
                map(tuple, spark.read.parquet(path).select("vec_id", "cell").collect())
            )
            queries = emb.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            probe = sorted(
                map(
                    tuple,
                    ivf_topk(emb, queries, k=5, centroids=cents, encoded=spark.read.parquet(path))
                    .select("query_id", "vec_id", "rank")
                    .collect(),
                )
            )
            return files, rows, probe

        ivf_append(batch, cents, path, batch_id=7)
        once = snapshot()
        # keyed names present, exactly one per touched cell for this batch
        keyed = glob.glob(f"{path}/cell=*/ingest-b7-*.parquet")
        assert keyed and all(f.endswith("ingest-b7-0.snappy.parquet") for f in keyed)

        ivf_append(batch, cents, path, batch_id=7)  # the replay
        assert snapshot() == once

        # a DIFFERENT batch id still appends (no false dedup)
        ivf_append(
            emb.filter(F.col("vec_id") % 4 == 2), cents, path, batch_id=8
        )
        n_all = spark.read.parquet(path).count()
        assert n_all == len(once[1]) + emb.filter(F.col("vec_id") % 4 == 2).count()


class TestEventTypeProfile:
    """Variable-size (map-shaped) user state packed in array state
    fields — plus the gated transformWithState twin."""

    def test_profile_matches_batch_counts(self, spark, events_stream, events_batch):
        from exosql_spark.streaming.stateful import event_type_profile

        got = drain(
            event_type_profile(events_stream), "t_type_profile", mode="update"
        )
        final = got.groupBy("user_id", "event_type").agg(
            F.max("n_events").alias("n_events")
        )
        want = events_batch.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("n_events")
        )
        joined = final.alias("a").join(want.alias("b"), ["user_id", "event_type"])
        assert joined.count() == want.count() == final.count()
        assert joined.filter(F.col("a.n_events") != F.col("b.n_events")).count() == 0

    def test_state_actually_accumulates_across_batches(self, spark, tmp_path):
        """Two files drained at maxFilesPerTrigger=1 → two micro-batches:
        the shared (user, type) pairs must be emitted twice with growing
        counts — a stateless per-batch count would emit equal ones."""
        from exosql_spark.streaming.stateful import event_type_profile

        src = str(tmp_path / "src")
        rows = [
            (i, f"2024-01-01 00:0{i}:00", i % 3, "view", 1.0, "{}")
            for i in range(6)
        ]
        schema = (
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string"
        )
        for batch in (rows[:3], rows[3:]):
            spark.createDataFrame(batch, schema).withColumn(
                "ts", F.col("ts").cast("timestamp")
            ).coalesce(1).write.mode("append").parquet(src)
        stream = streaming.read_events_stream(spark, src)
        got = drain(
            event_type_profile(stream), "t_type_profile_acc", mode="update"
        )
        multi = (
            got.groupBy("user_id", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_emissions"),
                F.count(F.col("n_events")).alias("_n"),
                F.size(F.collect_set("n_events")).alias("n_distinct_counts"),
            )
            .filter(F.col("n_emissions") > 1)
        )
        assert multi.count() > 0
        # growing, not repeated: every multi-emission pair has as many
        # distinct running counts as emissions (strict monotonicity)
        assert multi.filter(
            F.col("n_distinct_counts") != F.col("n_emissions")
        ).count() == 0

    def test_transform_with_state_twin(self, spark, events_stream):
        from exosql_spark.streaming import stateful

        if not stateful.HAS_TRANSFORM_WITH_STATE:
            import pytest as _pt

            with _pt.raises(ImportError, match="protobuf"):
                stateful.event_type_profile_tws(events_stream)
            _pt.skip(stateful.TWS_UNAVAILABLE_REASON)
        got = drain(
            stateful.event_type_profile_tws(events_stream),
            "t_type_profile_tws",
            mode="update",
        )
        assert got.count() > 0

    def test_tws_skip_reason_is_load_bearing(self):
        """r17 verdict Next #6: the twin's skip (and its ImportError)
        must carry ONE shared reason string that documents exactly
        which environment provides the missing dependency — pin its
        content so neither the raise nor the skip can drift to an
        uninformative message.  The string must name the package, a
        concrete way to get it, and where the coverage lives while
        the twin is gated."""
        from exosql_spark.streaming import stateful

        reason = stateful.TWS_UNAVAILABLE_REASON
        assert "protobuf" in reason
        assert "pip install" in reason  # which environment provides it
        assert "applyInPandasWithState" in reason  # coverage pointer
        if not stateful.HAS_TRANSFORM_WITH_STATE:
            # the gate raises THE SAME string the suite skips with
            import pytest as _pt

            with _pt.raises(ImportError) as exc:
                stateful.event_type_profile_tws(None)
            assert str(exc.value) == reason


class TestGraphIngestStream:
    def test_out_strength_merge_and_replay_idempotent(self, spark, tmp_path):
        """The edge store and the out-degree parts layout must both be
        replay-idempotent (same batch id re-appended → byte-identical
        state, the crash-between-append-and-offset-commit case), and
        read_out_strength's merge-on-read sum must equal a batch
        groupBy over everything ingested."""
        from exosql_spark import sinks, streaming

        edges = spark.createDataFrame(
            [(0, 1), (0, 2), (1, 0), (2, 0), (2, 1)], "src long, dst long"
        )
        b0, b1 = edges.filter("dst <= 1"), edges.filter("dst > 1")
        estore, dstore = str(tmp_path / "e"), str(tmp_path / "d")
        # batch 1 appended TWICE with the same id — the replay case
        for bid, b in ((0, b0), (1, b1), (1, b1)):
            eb = b.select(
                "src", "dst", F.pmod(F.hash("src"), F.lit(8)).alias("bucket")
            )
            sinks.append_batch_keyed(eb, estore, "bucket", bid)
            deg = b.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).cast("long").alias("deg")
            )
            sinks.append_batch_keyed(
                deg.select(
                    "id", "deg", F.pmod(F.hash("id"), F.lit(8)).alias("bucket")
                ),
                dstore,
                "bucket",
                bid,
            )
        got_e = sorted(map(tuple, streaming.read_edges(spark, estore).collect()))
        assert got_e == sorted(map(tuple, edges.collect()))
        got_d = {
            r.id: r.deg
            for r in streaming.read_out_strength(spark, dstore).collect()
        }
        assert got_d == {0: 2, 1: 1, 2: 2}


class TestDecontamIngest:
    def test_gram_set_merge_and_replay_idempotent(self, spark, tmp_path):
        """The contamination gram store must be replay-idempotent
        (same batch id re-appended → same merged set) and the
        read-side distinct must absorb cross-batch duplicates —
        yielding exactly the batch-built gram set."""
        from exosql_spark import sinks, streaming
        from exosql_spark.operators.decontam import ngrams

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta"),
                (2, "beta gamma delta epsilon"),  # overlapping grams
                (3, "zeta eta theta iota"),
            ],
            "doc_id long, text string",
        )
        b0 = docs.filter("doc_id <= 2")
        b1 = docs.filter("doc_id = 3")
        gstore = str(tmp_path / "g")
        # batch 0 appended TWICE with the same id — the replay case
        for bid, b in ((0, b0), (0, b0), (1, b1)):
            grams = (
                b.select(F.explode(ngrams("text", 3)).alias("g"))
                .distinct()
                .select("g", F.pmod(F.hash("g"), F.lit(8)).alias("bucket"))
            )
            sinks.append_batch_keyed(grams, gstore, "bucket", bid)
        streamed = sorted(
            r.g for r in streaming.read_benchmark_grams(spark, gstore).collect()
        )
        batch = sorted(
            r.g
            for r in docs.select(F.explode(ngrams("text", 3)).alias("g"))
            .distinct()
            .collect()
        )
        assert streamed == batch


class TestTriangleIngestStream:
    def test_delta_partition_and_replay_idempotent(self, spark, tmp_path):
        """The triangle delta parts must PARTITION the triangle set
        across batches (sum == batch recompute) even when triangles
        span batch boundaries, and a replayed batch — recomputing its
        delta against a store that ALREADY holds its own rows — must
        leave both layouts byte-identical (the crash-between-append-
        and-offset-commit case)."""
        from exosql_spark import streaming
        from exosql_spark.operators.graph import triangle_stats

        # K4 on {0..3} + a pendant: 4 triangles total.  Split so that
        # triangle (1,2,3) is all-batch-0, (0,1,2)/(0,1,3)/(0,2,3)
        # close only once batch 1's edges arrive — cross-batch closure.
        b0 = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (4, 0)], "src long, dst long"
        )
        b1 = spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3)], "src long, dst long"
        )
        estore, dstore = str(tmp_path / "e"), str(tmp_path / "d")
        streaming.triangle_ingest_batch(b0, 0, estore, dstore)
        streaming.triangle_ingest_batch(b1, 1, estore, dstore)

        inc = streaming.read_triangle_count(spark, dstore).collect()[0]
        assert inc.n_triangles == 4
        batch = triangle_stats(
            streaming.read_canonical_edges(spark, estore)
        ).collect()[0]
        assert batch.n_triangles == 4
        # per-batch deltas partition the set: batch 0 contributes only
        # the all-internal (1,2,3); batch 1 closes the other three
        deltas = spark.read.parquet(dstore).collect()
        assert sorted(r.n_new_triangles for r in deltas) == [1, 3]

        edges_before = sorted(
            map(tuple, streaming.read_canonical_edges(spark, estore).collect())
        )
        # REPLAY batch 1: the store already holds its rows; the delta
        # must recompute to the same value and overwrite its own part
        streaming.triangle_ingest_batch(b1, 1, estore, dstore)
        inc2 = streaming.read_triangle_count(spark, dstore).collect()[0]
        assert inc2.n_triangles == 4
        edges_after = sorted(
            map(tuple, streaming.read_canonical_edges(spark, estore).collect())
        )
        assert edges_after == edges_before

    def test_corrupt_store_fails_batch_instead_of_undercounting(
        self, spark, tmp_path
    ):
        """ADVICE r15 (graph_ingest.py): a read failure on an EXISTING
        store must FAIL the micro-batch (Structured Streaming then
        retries it) — the old bare ``except Exception`` treated any
        failure as 'first batch', durably writing a delta computed
        against an EMPTY prior: a silent undercount the exactly-once
        replay semantics would never revisit.  Only true absence may
        mean first-batch."""
        import pytest

        from exosql_spark import streaming

        estore, dstore = str(tmp_path / "e"), str(tmp_path / "d")
        b0 = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
        streaming.triangle_ingest_batch(b0, 0, estore, dstore)
        # corrupt the store: replace every parquet file with garbage
        import glob as _glob
        import os as _os

        files = _glob.glob(_os.path.join(estore, "**", "*.parquet"), recursive=True)
        assert files
        for p in files:
            with open(p, "wb") as f:
                f.write(b"not a parquet footer")
        b1 = spark.createDataFrame([(2, 0)], "src long, dst long")
        with pytest.raises(Exception):
            streaming.triangle_ingest_batch(b1, 1, estore, dstore)
        # and the failed batch wrote no delta part for batch 1
        deltas = spark.read.parquet(dstore).collect()
        assert len(deltas) == 1

    def test_hub_skew_fallback_agrees_with_broadcast_path(
        self, spark, tmp_path
    ):
        """r16 verdict Next #5: the wedge broadcast's residual
        assumption — |Δ|·d̄ stays driver-sized — breaks when a hub
        vertex carries a 10⁴-neighbor stored adjacency and one new
        edge touches it.  The guard counts the (persisted) wedge
        intermediate and above ``broadcast_wedge_limit`` degrades the
        closing join to a keyed shuffle; both paths must produce the
        SAME delta, and the fallback plan must not broadcast the
        oversized wedge."""
        from pyspark.sql import functions as F

        from exosql_spark import streaming
        from exosql_spark.streaming import graph_ingest as gi

        # store: hub 0 -- {1..10000} \ {5000}, plus (1,5000), (2,5000)
        hub = (
            spark.range(1, 10001)
            .where("id != 5000")
            .select(F.lit(0).cast("long").alias("src"), F.col("id").alias("dst"))
        )
        closers = spark.createDataFrame(
            [(1, 5000), (2, 5000)], "src long, dst long"
        )
        estore, dstore = str(tmp_path / "e"), str(tmp_path / "d")
        streaming.triangle_ingest_batch(
            hub.unionByName(closers), 0, estore, dstore
        )
        # batch 1: the hub edge (0, 5000) — wedge1 inherits deg(0) ≈
        # 10⁴ rows; closes (0,1,5000) and (0,2,5000)
        def make_b():
            return (
                spark.createDataFrame([(0, 5000)], "src long, dst long")
                .select(
                    F.least("src", "dst").alias("a"),
                    F.greatest("src", "dst").alias("b"),
                )
                .distinct()
                .withColumn("batch", F.lit(1).cast("long"))
            )

        def make_prior():
            return (
                spark.read.parquet(estore)
                .select("a", "b", "batch")
                .where(F.col("batch") != F.lit(1).cast("long"))
            )

        bc = gi.batch_triangle_delta(make_b(), make_prior(), None)
        assert "BroadcastHashJoin" in bc._jdf.queryExecution().executedPlan().toString()
        assert bc.collect()[0].n_new_triangles == 2

        shuffled = gi.batch_triangle_delta(
            make_b(), make_prior(), broadcast_wedge_limit=1000
        )
        splan = shuffled._jdf.queryExecution().executedPlan().toString()
        # the closing join degraded to the SPILL-SAFE keyed join (SMJ
        # by the merge hint — a shuffled-hash build of the oversized
        # wedge is non-spillable and can itself OOM, observed live)
        assert "SortMergeJoin" in splan, splan
        assert shuffled.collect()[0].n_new_triangles == 2

        # end-to-end through the ingest body with the tiny limit: the
        # written delta part matches, and the guard's wedge persist is
        # drained at batch close (registry flat across micro-batches)
        from exosql_spark import cache

        mark = cache.registry_mark(spark)
        streaming.triangle_ingest_batch(
            spark.createDataFrame([(0, 5000)], "src long, dst long"),
            1,
            estore,
            dstore,
            broadcast_wedge_limit=1000,
        )
        assert cache.registry_mark(spark) == mark
        inc = streaming.read_triangle_count(spark, dstore).collect()[0]
        # batch 0's internal triangles: none (hub star + two spokes
        # that only meet at 5000, which the hub doesn't reach yet)
        assert inc.n_triangles == 2

    def test_empty_store_directory_replays_as_first_batch(
        self, spark, tmp_path
    ):
        """ADVICE r16: a crash inside append_batch_keyed between
        ``fs.mkdirs`` and the first file move leaves the store
        directory EXISTING but holding zero parquet files.  Under the
        bare directory-existence check that state took the read path
        and ``spark.read.parquet`` threw 'unable to infer schema' on
        EVERY retry — permanently wedging the stream on a state the
        replay itself would repair.  With the data-file glob
        (sinks.store_has_data) it must classify as first-batch and the
        replay must succeed, producing the same result as a clean
        first run."""
        import os as _os

        from exosql_spark import sinks, streaming

        estore, dstore = str(tmp_path / "e"), str(tmp_path / "d")
        # simulate the half-landed mkdirs: directory tree, no files
        _os.makedirs(_os.path.join(estore, "bucket=3"))
        assert sinks.path_exists(spark, estore)
        assert not sinks.store_has_data(spark, estore)

        b0 = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0)], "src long, dst long"
        )
        streaming.triangle_ingest_batch(b0, 0, estore, dstore)
        assert sinks.store_has_data(spark, estore)
        inc = streaming.read_triangle_count(spark, dstore).collect()[0]
        assert inc.n_triangles == 1
