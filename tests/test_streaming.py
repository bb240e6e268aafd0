"""Structured Streaming tests: windowed aggregation parity with the
batch query, and the custom stateful sessionization operator."""

import pytest

import datetime as dt

from delta_lake_experiment_spark.operators.asof import sessionize
from delta_lake_experiment_spark.sources.tables import load_table
from delta_lake_experiment_spark.streaming.sessions import streaming_sessionize
from delta_lake_experiment_spark.streaming.windowed import (
    EVENTS_STREAM_SCHEMA,
    run_available_now,
    windowed_event_counts,
)


def test_streaming_windowed_counts_matches_batch(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = str(tmp_path / "events_src")
    # re-encode events as a standard µs-timestamp parquet stream source
    load_table(spark, "/root/testdata/sf0.001", "events").write.parquet(src)

    stream = windowed_event_counts(spark, src, window="1 hour", watermark="2 hours")
    assert stream.isStreaming
    run_available_now(stream, "win_counts", str(tmp_path))
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("win_counts").collect()
    }

    from delta_lake_experiment_spark.workloads.relational import hourly_event_windows

    expect = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in hourly_event_windows(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == expect


def test_streaming_dedup(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import datetime as dt

    def ts(minute):
        return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)

    rows = [
        (1, ts(0), "fp_a"),
        (2, ts(1), "fp_b"),
        (3, ts(2), "fp_a"),   # dup of 1 within watermark -> dropped
        (4, ts(3), "fp_c"),
        (5, ts(4), "fp_b"),   # dup of 2 -> dropped
    ]
    src = str(tmp_path / "dedup_src")
    spark.createDataFrame(rows, "doc_id long, ts timestamp, fp string").coalesce(
        1
    ).write.parquet(src)

    from delta_lake_experiment_spark.streaming.dedup import streaming_dedup

    stream = spark.readStream.schema("doc_id long, ts timestamp, fp string").parquet(src)
    out = streaming_dedup(stream, ["fp"], "ts", delay="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["doc_id"], r["fp"]) for r in spark.table("dedup_out").collect()}
    assert got == {(1, "fp_a"), (2, "fp_b"), (4, "fp_c")}


def test_streaming_engine_sink_exactly_once(spark, tmp_path, store_dir):
    """Stream into an ACID table; redelivered batches must not double-
    apply (txn markers in the log de-duplicate them)."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.streaming.engine_sink import (
        foreach_batch_writer,
        write_stream_to_table,
    )

    src = str(tmp_path / "sink_src")
    load_table(spark, "/root/testdata/sf0.001", "events").coalesce(1).write.parquet(src)

    boot = DeltaLakeClient(spark, store_dir)
    boot.new_tx()
    schema = spark.read.parquet(src).schema
    boot.create_table("events_sink", schema)
    boot.commit_tx()

    def factory():
        return DeltaLakeClient(spark, store_dir)

    stream = spark.readStream.schema(schema).parquet(src)
    q = write_stream_to_table(
        stream, factory, "events_sink", "app1", str(tmp_path / "ckpt_sink")
    )
    q.awaitTermination()

    n_src = spark.read.parquet(src).count()
    check = factory()
    check.new_tx()
    assert check.scan("events_sink").count() == n_src
    assert check.tx.snapshot.txns.get("app1") is not None
    check.commit_tx()

    # simulate crash-redelivery of the last batch: same batch id again
    redeliver = foreach_batch_writer(factory, "events_sink", "app1")
    batch_df = spark.read.parquet(src)
    committed_batch = DeltaLakeClient(spark, store_dir)
    committed_batch.new_tx()
    bid = committed_batch.tx.snapshot.txns["app1"]
    committed_batch.abort_tx()
    redeliver(batch_df, bid)  # must be skipped
    check2 = factory()
    check2.new_tx()
    assert check2.scan("events_sink").count() == n_src  # unchanged
    # a NEW batch id applies
    redeliver(batch_df, bid + 1)
    check3 = factory()
    check3.new_tx()
    assert check3.scan("events_sink").count() == 2 * n_src
    check3.commit_tx()


def test_streaming_sessionize(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def ts(minute):
        return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)

    rows = [
        (1, ts(0), 1, "click", 1.0, "{}"),
        (2, ts(5), 1, "click", 1.0, "{}"),
        (3, ts(60), 1, "view", 1.0, "{}"),   # gap > 30m closes session 1
        (4, ts(65), 1, "view", 1.0, "{}"),
        (5, ts(300), 1, "click", 1.0, "{}"),  # closes session 2
        (6, ts(0), 2, "click", 1.0, "{}"),
    ]
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(src)

    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(src)
    sessions = streaming_sessionize(stream, gap_minutes=30, watermark="10 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sessions_out").collect()
    )
    # closed by in-batch gaps (user 1): [0,5] and [60,65]; closed by
    # event-time timeout (watermark 300m-10m=290m > 0m+30m): user 2's
    # idle session. User 1's [300,...] session stays open in state.
    assert got == [
        (1, ts(0), ts(5), 2),
        (1, ts(60), ts(65), 2),
        (2, ts(0), ts(0), 1),
    ]
    # batch twin agrees on the closed sessions
    batch = sessionize(
        spark.createDataFrame(
            [(r[2], r[1]) for r in rows], "user_id long, ts timestamp"
        ),
        "user_id",
        "ts",
        gap_minutes=30,
    ).collect()
    batch_closed = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch
    )
    assert got[0] in batch_closed and got[1] in batch_closed


def test_change_feed_reader_incremental_cdc(spark, store_dir):
    """ChangeFeedReader: cursor-driven at-least-once consumption —
    each poll sees exactly the net changes since the cursor, re-polls
    without advance re-deliver, and caught-up polls return None."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.streaming import ChangeFeedReader

    c = DeltaLakeClient(spark, store_dir)
    c.new_tx()
    c.create_table("t", "k BIGINT, v STRING")
    c.write_dataframe("t", spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, v STRING"))
    c.commit_tx()  # v1

    r = ChangeFeedReader(c, "t")
    batch = r.poll()
    assert batch is not None
    df, v = batch
    assert v == 1
    assert {(x["k"], x["_change_type"]) for x in df.select("k", "_change_type").collect()} == {
        (1, "insert"), (2, "insert"),
    }
    # not advanced -> redelivered (at-least-once)
    df2, v2 = r.poll()
    assert v2 == 1 and df2.count() == 2
    r.advance(v2)
    assert r.poll() is None  # caught up

    c.new_tx()
    c.delete_rows("t", "k", 1, 1)
    c.write_dataframe("t", spark.createDataFrame([(3, "c")], "k BIGINT, v STRING"))
    c.commit_tx()  # v2
    df3, v3 = r.poll()
    assert v3 == 2
    assert {(x["k"], x["_change_type"]) for x in df3.select("k", "_change_type").collect()} == {
        (1, "delete"), (3, "insert"),
    }
    r.advance(v3)
    assert r.poll() is None


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (purchases x clicks in
    the preceding hour) must produce exactly the batch join's pairs."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from delta_lake_experiment_spark.streaming.join import stream_interval_join

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    purchases = ev.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    p_src, c_src = str(tmp_path / "p"), str(tmp_path / "c")
    purchases.write.parquet(p_src)
    clicks.write.parquet(c_src)

    sp = spark.readStream.schema(purchases.schema).parquet(p_src)
    sc = spark.readStream.schema(clicks.schema).parquet(c_src)
    joined = stream_interval_join(
        sp, sc, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols={"event_id": "click_id", "ts": "click_ts"},
        lookback="1 hour",
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_id"], r["click_id"])
        for r in spark.table("ssj_out").collect()
    }

    batch = stream_interval_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols={"event_id": "click_id", "ts": "click_ts"},
        lookback="1 hour",
    )
    expect = {(r["event_id"], r["click_id"]) for r in batch.collect()}
    assert got == expect and expect  # non-trivial and exact


@pytest.mark.slow
def test_streaming_incremental_dedup_ingest(spark, tmp_path, store_dir):
    """Continuous incremental ingest: per-batch dedup, against-table
    dedup across MICRO-BATCHES (table-backed, no watermark horizon),
    exactly-once on redelivery, and logical idempotence even without
    the txn marker."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.streaming.ingest import (
        foreach_batch_dedup_writer,
        write_dedup_stream_to_table,
    )

    def factory():
        return DeltaLakeClient(spark, store_dir)

    boot = factory()
    boot.new_tx()
    boot.create_table("corpus", "id bigint, fp string", bloom_columns=["fp"])
    boot.write_dataframe(
        "corpus", spark.createDataFrame([(1, "f1")], "id long, fp string")
    )
    boot.commit_tx()

    # two source files -> maxFilesPerTrigger=1 gives two micro-batches
    # with a cross-batch duplicate (f3) and a seed duplicate (f1)
    src = str(tmp_path / "crawl")
    spark.createDataFrame(
        [(10, "f1"), (11, "f3"), (12, "f3"), (13, "f4")], "id long, fp string"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(20, "f3"), (21, "f5")], "id long, fp string"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("id long, fp string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = write_dedup_stream_to_table(
        stream, factory, "corpus", ["fp"], "id", "crawl1",
        str(tmp_path / "ckpt_inc"),
    )
    q.awaitTermination()

    check = factory()
    check.new_tx()
    fps = sorted(r["fp"] for r in check.scan("corpus", with_stamps=False).collect())
    check.abort_tx()
    # one row per distinct fp, regardless of batch boundaries
    assert fps == ["f1", "f3", "f4", "f5"]

    # redelivered batch id: skipped via the txn marker
    last = factory()
    last.new_tx()
    bid = last.tx.snapshot.txns["crawl1"]
    last.abort_tx()
    writer = foreach_batch_dedup_writer(factory, "corpus", ["fp"], "id", "crawl1")
    writer(spark.createDataFrame([(30, "f6")], "id long, fp string"), bid)
    # logically-duplicate batch under a HIGHER id: anti-join rejects all
    writer(spark.createDataFrame([(31, "f5")], "id long, fp string"), bid + 1)
    check2 = factory()
    check2.new_tx()
    assert check2.scan("corpus", with_stamps=False).count() == 4
    check2.abort_tx()


def test_run_marked_batch_aborts_open_tx_on_failure(spark, store_dir):
    """r15 advisor note: a failing body (or commit) must not leave the
    sink's client mid-transaction — the one-tx-per-client contract
    survives the failure path, so a caller reusing the factory's
    client (or doing post-failure work on it) sees a clean client,
    and nothing staged by the failed body is visible afterwards."""
    import pytest

    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.streaming.engine_sink import (
        run_marked_batch,
    )

    clients = []

    def factory():
        c = DeltaLakeClient(spark, store_dir)
        clients.append(c)
        return c

    boot = DeltaLakeClient(spark, store_dir)
    boot.new_tx()
    boot.create_table("mb", "k BIGINT")
    boot.commit_tx()

    def bad_body(client):
        client.write_row("mb", [1])
        raise RuntimeError("boom mid-batch")

    with pytest.raises(RuntimeError, match="boom mid-batch"):
        run_marked_batch(factory, "mbapp", 0, bad_body)
    failed = clients[-1]
    assert failed.tx is None, "failed batch left the client mid-tx"
    # the client is reusable, and the staged write never landed
    failed.new_tx()
    assert failed.scan("mb", with_stamps=False).count() == 0
    failed.abort_tx()
    # the marker was NOT recorded: the same batch id replays cleanly
    ok = run_marked_batch(
        factory, "mbapp", 0, lambda c: c.write_row("mb", [2])
    )
    assert ok is True
    check = DeltaLakeClient(spark, store_dir)
    check.new_tx()
    assert [r["k"] for r in check.scan("mb", with_stamps=False).collect()] == [2]
    check.abort_tx()


@pytest.mark.slow
def test_streaming_fuzzy_dedup_ingest(spark, tmp_path, store_dir):
    """r15 streaming fuzzy-dedup ingest: each micro-batch is verified
    against the PERSISTED posting index — near-dups of admitted docs
    are rejected across batch boundaries without re-reading corpus
    text, in-batch near-dups keep the smaller id, corpus + postings +
    prefixes land in one commit, redelivery is a marker no-op, and a
    re-sent document under a NEW id is rejected by the fuzzy gate
    itself (content-level idempotence, beyond exact keys)."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.streaming.ingest import (
        foreach_batch_fuzzy_dedup_writer,
        write_fuzzy_dedup_stream_to_table,
    )

    def factory():
        return DeltaLakeClient(spark, store_dir)

    base_words = [f"w{i:03d}" for i in range(120)]
    base = " ".join(base_words)
    near = " ".join(
        ("EDIT" if i % 37 == 0 else w) for i, w in enumerate(base_words)
    )
    near2 = " ".join(
        ("ALTR" if i % 41 == 0 else w) for i, w in enumerate(base_words)
    )
    other = " ".join(f"z{i:03d}" for i in range(120))
    other_near = " ".join(
        ("EDIT" if i == 5 else f"z{i:03d}") for i in range(120)
    )
    boot = factory()
    boot.new_tx()
    boot.create_table("fcorpus", "doc_id BIGINT, text STRING")
    boot.create_table(
        "fpost", "doc_id BIGINT, sh BIGINT", bucket_by=(["sh"], 4)
    )
    boot.create_table("fpfx", "doc_id BIGINT, pfx STRING")
    boot.commit_tx()

    src = str(tmp_path / "fuzzy_crawl")
    # batch 1: base admitted; its near-dup (larger id) rejected
    # in-batch; an unrelated doc admitted
    spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    # batch 2: near-dup of doc 1 rejected VIA THE INDEX; a novel doc
    # admitted; its in-batch near-dup rejected
    spark.createDataFrame(
        [(10, near2), (11, other_near)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = write_fuzzy_dedup_stream_to_table(
        stream, factory, "fcorpus", "fpost", "fpfx",
        "doc_id", "text", "fuzzy1", str(tmp_path / "ckpt_fuzzy"),
        candidate_threshold=0.3, max_postings=64,
        prefix_chars=400, max_edit_ratio=0.2,
    )
    q.awaitTermination()

    check = factory()
    check.new_tx()
    ids = sorted(
        r["doc_id"]
        for r in check.scan("fcorpus", with_stamps=False).collect()
    )
    # wait: doc 11 (other_near) differs from doc 3 (other) by ONE word
    # of 120 — a true near-dup of an ADMITTED doc, rejected via index
    assert ids == [1, 3], ids
    # the index carries exactly the admitted docs' postings
    post_ids = sorted(
        r["doc_id"]
        for r in check.scan("fpost", with_stamps=False)
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert post_ids == [1, 3]
    bid = check.tx.snapshot.txns["fuzzy1"]
    check.abort_tx()

    writer = foreach_batch_fuzzy_dedup_writer(
        factory, "fcorpus", "fpost", "fpfx", "doc_id", "text", "fuzzy1",
        candidate_threshold=0.3, max_postings=64,
        prefix_chars=400, max_edit_ratio=0.2,
    )
    # redelivered batch id: marker no-op
    writer(
        spark.createDataFrame([(40, "novel a b c")], "doc_id long, text string"),
        bid,
    )
    # content re-sent under a NEW id and a NEW batch: the fuzzy gate
    # rejects it — idempotence at the content level
    writer(
        spark.createDataFrame([(41, near)], "doc_id long, text string"),
        bid + 1,
    )
    final = factory()
    final.new_tx()
    assert sorted(
        r["doc_id"]
        for r in final.scan("fcorpus", with_stamps=False).collect()
    ) == [1, 3]
    final.abort_tx()


@pytest.mark.slow
def test_streaming_fuzzy_gate_df_sidecar_lane(spark, tmp_path):
    """r16 (VERDICT r15 item 3): the streaming fuzzy gate with a
    maintained df sidecar (``df_table=``) must admit EXACTLY what the
    computed-df lane admits across multiple micro-batches — the
    sidecar read replaces the per-batch O(index) postings aggregate,
    never changes a verdict — and after the run the sidecar's running
    totals must equal a fresh recount of the posting index (the fold
    rides the same marked commit as the index append, so they can
    never drift)."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.operators.dedup import SHINGLE_DF_DDL
    from delta_lake_experiment_spark.streaming.ingest import (
        write_fuzzy_dedup_stream_to_table,
    )
    from pyspark.sql import functions as F

    base_words = [f"w{i:03d}" for i in range(120)]
    base = " ".join(base_words)
    near = " ".join(
        ("EDIT" if i % 37 == 0 else w) for i, w in enumerate(base_words)
    )
    near2 = " ".join(
        ("ALTR" if i % 41 == 0 else w) for i, w in enumerate(base_words)
    )
    other = " ".join(f"z{i:03d}" for i in range(120))
    other_near = " ".join(
        ("EDIT" if i == 5 else f"z{i:03d}") for i in range(120)
    )

    src = str(tmp_path / "sidecar_crawl")
    spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(10, near2), (11, other_near), (12, "totally novel words here")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)

    def run(root: str, df_table):
        def factory():
            return DeltaLakeClient(spark, root)

        boot = factory()
        boot.new_tx()
        boot.create_table("fc", "doc_id BIGINT, text STRING")
        boot.create_table(
            "fp", "doc_id BIGINT, sh BIGINT", bucket_by=(["sh"], 4)
        )
        boot.create_table("fx", "doc_id BIGINT, pfx STRING")
        if df_table:
            boot.create_table(df_table, SHINGLE_DF_DDL, primary_keys=["sh"])
        boot.commit_tx()
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = write_fuzzy_dedup_stream_to_table(
            stream, factory, "fc", "fp", "fx", "doc_id", "text",
            "sidecar1", str(tmp_path / f"ckpt_{df_table or 'plain'}"),
            candidate_threshold=0.3, max_postings=64,
            prefix_chars=400, max_edit_ratio=0.2, df_table=df_table,
        )
        q.awaitTermination()
        return factory()

    plain = run(str(tmp_path / "store_plain"), None)
    side = run(str(tmp_path / "store_side"), "fdf")

    plain.new_tx()
    want_ids = sorted(
        r["doc_id"] for r in plain.scan("fc", with_stamps=False).collect()
    )
    plain.abort_tx()
    side.new_tx()
    got_ids = sorted(
        r["doc_id"] for r in side.scan("fc", with_stamps=False).collect()
    )
    # both lanes admit the same docs — and the fixture exercises both
    # rejection paths (in-batch and via-index) plus admissions
    assert got_ids == want_ids == [1, 3, 12], (got_ids, want_ids)
    # sidecar totals == fresh recount of the posting index
    recount = (
        side.scan("fp", with_stamps=False)
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    sidecar = side.scan_current("fdf").select("sh", "df")
    assert sidecar.count() == recount.count()
    assert (
        sidecar.join(recount.withColumnRenamed("df", "df2"), "sh")
        .filter(F.col("df") != F.col("df2"))
        .count()
        == 0
    )
    side.abort_tx()


@pytest.mark.slow
def test_streaming_semantic_dedup_ingest(spark, tmp_path, store_dir):
    """r16: the SEMANTIC streaming admission gate — each micro-batch
    assigned under the stored centroids and cosine-verified against
    the persisted embedding index. Pins the full gate lifecycle:
    in-batch near-dup rejected (smaller id wins), cross-batch
    near-dup rejected VIA THE INDEX without re-reading corpus
    embeddings, novel docs admitted, redelivery a marker no-op,
    content re-sent under a NEW id rejected by the gate itself
    (content-level idempotence), corpus and index in lock-step, and
    compact_every maintenance collapsing the index's small files
    within its bucket layout."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.operators.semdedup import (
        deterministic_kmeans,
        incremental_semantic_near_duplicates,
        semantic_index_ddl,
    )
    from delta_lake_experiment_spark.streaming.ingest import (
        foreach_batch_semantic_dedup_writer,
    )
    from pyspark.sql import functions as F

    def vec(axis, eps):
        v = [0.0] * 4
        v[axis] = 1.0
        v[(axis + 1) % 4] = eps
        return v

    def factory():
        return DeltaLakeClient(spark, store_dir)

    seed = spark.createDataFrame(
        [(1, vec(0, 0.0)), (2, vec(1, 0.0)), (3, vec(2, 0.0))],
        "vec_id long, embedding array<double>",
    )
    cents = deterministic_kmeans(
        seed, "vec_id", "embedding", k=2, iters=2, salt="s"
    )
    boot = factory()
    boot.new_tx()
    boot.create_table("sc", "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    boot.create_table(
        "si", semantic_index_ddl("vec_id"), bucket_by=(["cluster"], 2)
    )
    boot.create_table("scent", "j int, pos int, x double")
    boot.write_dataframe(
        "scent",
        spark.createDataFrame(
            [
                (j, p, float(x))
                for j, cv in enumerate(cents)
                for p, x in enumerate(cv)
            ],
            "j int, pos int, x double",
        ),
    )
    # bootstrap the corpus + index with the seed docs
    seed_pairs, seed_rows = incremental_semantic_near_duplicates(
        spark.createDataFrame([], semantic_index_ddl("vec_id")),
        seed, cents, "vec_id", "embedding", threshold=0.9,
    )
    boot.write_dataframe("sc", seed)
    boot.write_dataframe("si", seed_rows)
    boot.commit_tx()
    # honor the operator's cleanup contract (release the bootstrap's
    # batch-sized persist once the writes are committed)
    for df in seed_pairs._cached_inputs:
        df.unpersist()

    writer = foreach_batch_semantic_dedup_writer(
        factory, "sc", "si", "scent", "vec_id", "embedding",
        "semgate", threshold=0.9, compact_every=2,
    )
    # batch 0: near-dup of corpus doc 1 (rejected via index), a novel
    # doc (admitted), and its in-batch near-dup (rejected, larger id)
    writer(
        spark.createDataFrame(
            [(10, vec(0, 0.05)), (11, vec(3, 0.0)), (12, vec(3, 0.04))],
            "vec_id long, embedding array<double>",
        ),
        0,
    )
    # batch 1: near-dup of BATCH-0 admitted doc 11 — rejected via the
    # appended index rows; triggers maintenance (compact_every=2)
    writer(
        spark.createDataFrame(
            [(20, vec(3, 0.03))], "vec_id long, embedding array<double>"
        ),
        1,
    )
    check = factory()
    check.new_tx()
    ids = sorted(
        r["vec_id"] for r in check.scan("sc", with_stamps=False).collect()
    )
    assert ids == [1, 2, 3, 11], ids
    # index in lock-step with the corpus, one row per admitted doc
    assert (
        sorted(
            r["vec_id"]
            for r in check.scan("si", with_stamps=False).collect()
        )
        == ids
    )
    # the bucket layout survived compact_every's maintenance
    agg = (
        check.scan_bucketed("si", with_stamps=False)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert "Exchange" not in agg._jdf.queryExecution().executedPlan().toString()
    bid = check.tx.snapshot.txns["semgate"]
    check.abort_tx()

    # redelivery: marker no-op; content re-sent under a NEW id in a
    # NEW batch: the gate rejects it — content-level idempotence
    writer(
        spark.createDataFrame(
            [(40, vec(1, 0.02))], "vec_id long, embedding array<double>"
        ),
        bid,
    )
    writer(
        spark.createDataFrame(
            [(41, vec(0, 0.05))], "vec_id long, embedding array<double>"
        ),
        bid + 1,
    )
    final = factory()
    final.new_tx()
    assert sorted(
        r["vec_id"] for r in final.scan("sc", with_stamps=False).collect()
    ) == [1, 2, 3, 11]
    final.abort_tx()

    # empty model is a loud error at the first batch, not silence
    import pytest

    empty_root = str(tmp_path / "noc")
    b2 = DeltaLakeClient(spark, empty_root)
    b2.new_tx()
    b2.create_table("sc", "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    b2.create_table("si", semantic_index_ddl("vec_id"))
    b2.create_table("scent", "j int, pos int, x double")
    b2.commit_tx()
    w2 = foreach_batch_semantic_dedup_writer(
        lambda: DeltaLakeClient(spark, empty_root),
        "sc", "si", "scent", "vec_id", "embedding", "semgate2",
    )
    with pytest.raises(Exception, match="centroids"):
        w2(
            spark.createDataFrame(
                [(1, vec(0, 0.0))], "vec_id long, embedding array<double>"
            ),
            0,
        )


@pytest.mark.slow
def test_streaming_lsh_gate_cell_sidecar_lane(spark, tmp_path):
    """r16 review close: the LSH gate's flood-guard sidecar
    (cell_df_table + max_cell) must admit EXACTLY what the
    computed-cell-count lane admits, fold admitted band counts in the
    same marked commit (totals == a fresh recount of the bands
    table), and get collapsed by the same compact_every maintenance —
    the cell transposition of the shingle df-sidecar contract."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.operators.dedup import CELL_DF_DDL
    from delta_lake_experiment_spark.streaming.ingest import (
        foreach_batch_fuzzy_dedup_writer,
    )
    from pyspark.sql import functions as F

    NH, NB = 32, 8
    words = [f"w{i:03d}" for i in range(100)]
    base = " ".join(words)
    near = " ".join(
        ("EDITQ" if i == 9 else w) for i, w in enumerate(words)
    )
    other = " ".join(f"z{i:03d}" for i in range(100))
    batches = [
        [(1, base), (2, other)],
        [(10, near), (11, " ".join(f"q{i}" for i in range(100)))],
    ]

    def run(root, cell_df_table, compact_every=None):
        def factory():
            return DeltaLakeClient(spark, root)

        boot = factory()
        boot.new_tx()
        boot.create_table("cc", "doc_id BIGINT, text STRING")
        boot.create_table(
            "cb", "doc_id BIGINT, band INT, bh BIGINT",
            bucket_by=(["band", "bh"], 4),
        )
        boot.create_table("cx", "doc_id BIGINT, pfx STRING")
        if cell_df_table:
            boot.create_table(
                cell_df_table, CELL_DF_DDL, primary_keys=["band", "bh"]
            )
        boot.commit_tx()
        w = foreach_batch_fuzzy_dedup_writer(
            factory, "cc", "cb", "cx", "doc_id", "text", "cellgate",
            index_kind="lsh", num_hashes=NH, num_bands=NB,
            max_cell=100, cell_df_table=cell_df_table,
            compact_every=compact_every,
        )
        for bid, rows in enumerate(batches):
            w(
                spark.createDataFrame(rows, "doc_id long, text string"),
                bid,
            )
        return factory()

    plain = run(str(tmp_path / "plain"), None)
    side = run(str(tmp_path / "side"), "cdf", compact_every=2)

    plain.new_tx()
    want = sorted(
        r["doc_id"] for r in plain.scan("cc", with_stamps=False).collect()
    )
    plain.abort_tx()
    side.new_tx()
    got = sorted(
        r["doc_id"] for r in side.scan("cc", with_stamps=False).collect()
    )
    # near-dup 10 rejected via index in both lanes; 1, 2, 11 admitted
    assert got == want == [1, 2, 11], (got, want)
    # sidecar totals == fresh recount of the bands table; collapsed
    # (compact_every=2 ran after the final batch)
    recount = (
        side.scan("cb", with_stamps=False)
        .groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("df2"))
    )
    sidecar = side.scan_current("cdf").select("band", "bh", "df")
    assert (
        sidecar.join(recount, ["band", "bh"], "full_outer")
        .filter(
            F.coalesce("df", F.lit(-1)) != F.coalesce("df2", F.lit(-2))
        )
        .count()
        == 0
    )
    assert (
        side.scan("cdf", with_stamps=False).count()
        == side.scan_current("cdf").count()
    )
    side.abort_tx()


@pytest.mark.slow
def test_streaming_fuzzy_gate_auto_maintenance(spark, tmp_path):
    """r16: compact_every=N runs the documented maintenance recipe
    inside the stream — after every Nth committed batch a SEPARATE
    transaction compacts the postings/prefixes tables and collapses
    the df sidecar. Pins: admissions identical to the no-maintenance
    lane; after the final trigger the sidecar holds ONE physical row
    per shingle and its totals equal a fresh recount; the bucketed
    postings table still aggregates with no Exchange; a redelivered
    batch neither re-admits nor re-compacts (version count stable)."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.operators.dedup import SHINGLE_DF_DDL
    from delta_lake_experiment_spark.streaming.ingest import (
        foreach_batch_fuzzy_dedup_writer,
    )
    from pyspark.sql import functions as F

    words = [f"w{i:03d}" for i in range(100)]
    base = " ".join(words)

    def variant(tag, edit_at):
        return " ".join(
            (tag if i == edit_at else w) for i, w in enumerate(words)
        )

    batches = [
        [(1, base), (2, variant("EDITA", 3))],          # 2 rejected in-batch
        [(10, variant("EDITB", 7))],                     # rejected via index
        [(20, " ".join(f"q{i}" for i in range(100)))],   # novel, admitted
        [(30, variant("EDITC", 11))],                    # rejected via index
    ]

    def run(root, compact_every):
        def factory():
            return DeltaLakeClient(spark, root)

        boot = factory()
        boot.new_tx()
        boot.create_table("ac", "doc_id BIGINT, text STRING")
        boot.create_table(
            "ap", "doc_id BIGINT, sh BIGINT", bucket_by=(["sh"], 4)
        )
        boot.create_table("ax", "doc_id BIGINT, pfx STRING")
        boot.create_table("adf", SHINGLE_DF_DDL, primary_keys=["sh"])
        boot.commit_tx()
        w = foreach_batch_fuzzy_dedup_writer(
            factory, "ac", "ap", "ax", "doc_id", "text", "autogate",
            candidate_threshold=0.3, max_postings=64,
            df_table="adf", compact_every=compact_every,
        )
        for bid, rows in enumerate(batches):
            w(
                spark.createDataFrame(rows, "doc_id long, text string"),
                bid,
            )
        return factory(), w

    plain, _ = run(str(tmp_path / "plain"), None)
    auto, w = run(str(tmp_path / "auto"), 2)

    plain.new_tx()
    want = sorted(
        r["doc_id"] for r in plain.scan("ac", with_stamps=False).collect()
    )
    plain.abort_tx()
    auto.new_tx()
    got = sorted(
        r["doc_id"] for r in auto.scan("ac", with_stamps=False).collect()
    )
    assert got == want == [1, 20], (got, want)
    # maintenance after batch 4 (the 2nd trigger): sidecar collapsed
    raw = auto.scan("adf", with_stamps=False).count()
    cur = auto.scan_current("adf").count()
    assert raw == cur
    # totals still equal a fresh recount of the postings table
    recount = (
        auto.scan("ap", with_stamps=False)
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df2"))
    )
    side = auto.scan_current("adf").select("sh", "df")
    assert (
        side.join(recount, "sh", "full_outer")
        .filter(
            F.coalesce("df", F.lit(-1)) != F.coalesce("df2", F.lit(-2))
        )
        .count()
        == 0
    )
    # the bucketed layout survived compaction
    agg = (
        auto.scan_bucketed("ap", with_stamps=False)
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    assert "Exchange" not in agg._jdf.queryExecution().executedPlan().toString()
    auto.abort_tx()

    # redelivery of a trigger batch: marker no-op, and NO re-compaction
    # (the sidecar's physical state is untouched)
    w(
        spark.createDataFrame(batches[3], "doc_id long, text string"),
        3,
    )
    check = DeltaLakeClient(spark, str(tmp_path / "auto"))
    check.new_tx()
    assert check.scan("adf", with_stamps=False).count() == raw
    assert sorted(
        r["doc_id"] for r in check.scan("ac", with_stamps=False).collect()
    ) == [1, 20]
    check.abort_tx()


def test_streaming_fuzzy_gate_accepts_map_columns(spark, store_dir):
    """r16 review catch: the full-row deterministic pick must EXCLUDE
    non-orderable column types (a map cannot appear in a window sort —
    Spark raises) instead of failing every micro-batch of a
    map-carrying stream. Duplicate ids still resolve deterministically
    on the orderable columns; the map column rides through to the
    corpus table untouched."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.streaming.ingest import (
        foreach_batch_fuzzy_dedup_writer,
    )

    def factory():
        return DeltaLakeClient(spark, store_dir)

    boot = factory()
    boot.new_tx()
    boot.create_table(
        "mc", "doc_id BIGINT, text STRING, meta MAP<STRING,STRING>"
    )
    boot.create_table("mp", "doc_id BIGINT, sh BIGINT")
    boot.create_table("mx", "doc_id BIGINT, pfx STRING")
    boot.commit_tx()

    writer = foreach_batch_fuzzy_dedup_writer(
        factory, "mc", "mp", "mx", "doc_id", "text", "mapgate",
        candidate_threshold=0.3, prefix_chars=400, max_edit_ratio=0.2,
    )
    batch = spark.createDataFrame(
        [
            # duplicate id, EQUAL text, different map payloads — the
            # pick must not throw, and exactly one copy must land
            (1, "alpha beta gamma delta", {"src": "a"}),
            (1, "alpha beta gamma delta", {"src": "b"}),
            (2, "omega psi chi phi", {"src": "c"}),
        ],
        "doc_id long, text string, meta map<string,string>",
    )
    writer(batch, 0)
    check = factory()
    check.new_tx()
    rows = check.scan("mc", with_stamps=False).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2]
    assert all(r["meta"] is not None for r in rows)
    check.abort_tx()


@pytest.mark.slow
def test_streaming_fuzzy_gate_lsh_index(spark, tmp_path, store_dir):
    """r16: the streaming fuzzy gate over the BANDED-SIGNATURE index
    (index_kind='lsh') — the continuous form of the LSH incremental
    lane. Same fixture as the shingle-lane sidecar test, so the
    expected admissions are pinned against it: in-batch near-dups,
    via-index near-dups across micro-batches, and novel docs all
    resolve identically; the bands table carries exactly
    num_bands rows per admitted doc; df_table is rejected loudly with
    the LSH index (there is no df cap to feed)."""
    import pytest

    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.streaming.ingest import (
        foreach_batch_fuzzy_dedup_writer,
        write_fuzzy_dedup_stream_to_table,
    )

    NH, NB = 32, 8
    base_words = [f"w{i:03d}" for i in range(120)]
    base = " ".join(base_words)
    near = " ".join(
        ("EDIT" if i % 37 == 0 else w) for i, w in enumerate(base_words)
    )
    near2 = " ".join(
        ("ALTR" if i % 41 == 0 else w) for i, w in enumerate(base_words)
    )
    other = " ".join(f"z{i:03d}" for i in range(120))
    other_near = " ".join(
        ("EDIT" if i == 5 else f"z{i:03d}") for i in range(120)
    )

    def factory():
        return DeltaLakeClient(spark, store_dir)

    boot = factory()
    boot.new_tx()
    boot.create_table("lc", "doc_id BIGINT, text STRING")
    boot.create_table(
        "lb", "doc_id BIGINT, band INT, bh BIGINT",
        bucket_by=(["band", "bh"], 4),
    )
    boot.create_table("lx", "doc_id BIGINT, pfx STRING")
    boot.commit_tx()

    src = str(tmp_path / "lsh_crawl")
    spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(10, near2), (11, other_near), (12, "totally novel words here")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)

    q = write_fuzzy_dedup_stream_to_table(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        factory, "lc", "lb", "lx", "doc_id", "text",
        "lshgate", str(tmp_path / "ckpt_lsh"),
        prefix_chars=400, max_edit_ratio=0.2,
        index_kind="lsh", num_hashes=NH, num_bands=NB,
    )
    q.awaitTermination()

    check = factory()
    check.new_tx()
    ids = sorted(
        r["doc_id"] for r in check.scan("lc", with_stamps=False).collect()
    )
    # identical admissions to the shingle-lane gate on this fixture
    assert ids == [1, 3, 12], ids
    # the bands index carries exactly num_bands rows per admitted doc
    assert check.scan("lb", with_stamps=False).count() == len(ids) * NB
    check.abort_tx()

    # the hot-shingle sidecar has no meaning over a banded index —
    # and every statically-known bad knob combination rejects at
    # CONSTRUCTION, not at the first micro-batch (r16 review catch)
    with pytest.raises(ValueError, match="df_table"):
        foreach_batch_fuzzy_dedup_writer(
            factory, "lc", "lb", "lx", "doc_id", "text", "lshgate",
            index_kind="lsh", df_table="whatever",
        )
    with pytest.raises(ValueError, match="cell_df_table"):
        foreach_batch_fuzzy_dedup_writer(
            factory, "lc", "lb", "lx", "doc_id", "text", "lshgate",
            cell_df_table="whatever",  # shingle mode: wrong sidecar
        )
    with pytest.raises(ValueError, match="max_cell"):
        foreach_batch_fuzzy_dedup_writer(
            factory, "lc", "lb", "lx", "doc_id", "text", "lshgate",
            index_kind="lsh", cell_df_table="cdf",  # sidecar, no cap
        )
    with pytest.raises(ValueError, match="max_cell"):
        foreach_batch_fuzzy_dedup_writer(
            factory, "lc", "lb", "lx", "doc_id", "text", "lshgate",
            index_kind="lsh", max_cell=0,
        )
    with pytest.raises(ValueError, match="max_postings"):
        foreach_batch_fuzzy_dedup_writer(
            factory, "lc", "lb", "lx", "doc_id", "text", "lshgate",
            index_kind="lsh", max_postings=64,
        )
    with pytest.raises(ValueError, match="max_postings"):
        foreach_batch_fuzzy_dedup_writer(
            factory, "lc", "lb", "lx", "doc_id", "text", "lshgate",
            df_table="fdf",  # sidecar without a cap to feed
        )


@pytest.mark.slow
def test_streaming_quality_gated_ingest(spark, tmp_path, store_dir):
    """Batch-trained classifier as a streaming admission gate: spam
    docs are rejected per micro-batch, duplicates of admitted docs are
    rejected across batches, clean novel docs land exactly once."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.operators.classifier import (
        train_hashed_logreg,
    )
    from delta_lake_experiment_spark.streaming.ingest import (
        foreach_batch_quality_dedup_writer,
    )

    good = ["clean prose article history science essay report study news text"]
    bad = ["spam click buy cheap pills win free offer now deal"]
    train_rows = []
    for i in range(40):
        vocab = (good if i % 2 else bad)[0].split()
        import random as _r
        rng = _r.Random(i)
        train_rows.append(
            (i, " ".join(rng.choice(vocab) for _ in range(8)), i % 2)
        )
    tdf = spark.createDataFrame(train_rows, "id int, text string, y int")
    w, b = train_hashed_logreg(tdf, "id", "text", "y", dim=32, iters=6)

    def factory():
        return DeltaLakeClient(spark, store_dir)

    boot = factory()
    boot.new_tx()
    boot.create_table("gated", "id bigint, fp string, text string")
    boot.commit_tx()

    src = str(tmp_path / "gated_crawl")
    spark.createDataFrame(
        [
            (1, "a", "clean prose article history science"),
            (2, "b", "spam click buy cheap pills"),          # gated out
            (3, "c", "report study news text essay"),
        ],
        "id long, fp string, text string",
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [
            (10, "a", "clean prose article history science"),  # dup of fp a
            (11, "d", "essay report study history prose"),
        ],
        "id long, fp string, text string",
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("id long, fp string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_quality_dedup_writer(
                factory, "gated", ["fp"], "id", "gate1", "text", w, b
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_gate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    check = factory()
    check.new_tx()
    rows = {
        r["fp"]: r["id"]
        for r in check.scan("gated", with_stamps=False).collect()
    }
    check.abort_tx()
    # spam doc (fp b) gated out; duplicate fp a admitted once (first id)
    assert set(rows) == {"a", "c", "d"}
    assert rows["a"] == 1


@pytest.mark.slow
def test_streaming_rule_gated_ingest(spark, tmp_path, store_dir):
    """The Gopher rule battery as a streaming admission gate (the
    rules-before-classifier crawl ordering): a doc failing a rule is
    rejected per micro-batch, duplicates of admitted docs are
    rejected across batches, passing novel docs land exactly once."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.streaming.ingest import (
        foreach_batch_rule_gated_writer,
    )

    def factory():
        return DeltaLakeClient(spark, store_dir)

    boot = factory()
    boot.new_tx()
    boot.create_table("rule_gated", "id bigint, fp string, text string")
    boot.commit_tx()

    clean = "the quick brown fox jumps over the lazy dog and runs far away"
    src = str(tmp_path / "rule_crawl")
    spark.createDataFrame(
        [
            (1, "a", clean),
            (2, "b", "the of and"),           # too few words: gated out
            (3, "c", clean + " again today"),
        ],
        "id long, fp string, text string",
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [
            (10, "a", clean),                  # dup of fp a
            (11, "d", clean + " once more with the dog"),
        ],
        "id long, fp string, text string",
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("id long, fp string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_rule_gated_writer(
                factory, "rule_gated", ["fp"], "id", "rgate1", "text",
                min_words=10,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_rgate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    check = factory()
    check.new_tx()
    rows = {
        r["fp"]: r["id"]
        for r in check.scan("rule_gated", with_stamps=False).collect()
    }
    check.abort_tx()
    assert set(rows) == {"a", "c", "d"}
    assert rows["a"] == 1  # duplicate admitted once, first copy wins


@pytest.mark.slow
def test_streaming_hll_sketch(spark, tmp_path, store_dir):
    """Streaming incremental cardinality: per-batch registers append
    through the exactly-once sink, the merged read-time estimate
    EQUALS the batch sketch over everything streamed (stream == batch
    for a deterministic approximate aggregate), and a redelivered
    batch changes nothing (txn marker)."""
    from pyspark.sql import functions as F

    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.operators.sketches import hll_distinct
    from delta_lake_experiment_spark.streaming.sketch import (
        HLL_TABLE_DDL,
        foreach_batch_hll_writer,
        table_sketch_estimate,
        write_hll_stream_to_table,
    )

    def factory():
        return DeltaLakeClient(spark, store_dir)

    boot = factory()
    boot.new_tx()
    boot.create_table("sk", HLL_TABLE_DDL)
    boot.commit_tx()
    # two files -> two micro-batches, with overlapping keys across them
    src = str(tmp_path / "keys")
    spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 600)], "k string"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(f"k{i}",) for i in range(400, 1000)], "k string"
    ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = write_hll_stream_to_table(
        stream, factory, "sk", "hllapp", "k", str(tmp_path / "ck"), p=10
    )
    q.awaitTermination()
    c = factory()
    c.new_tx()
    streamed = table_sketch_estimate(c, "sk", p=10).collect()[0]["est_distinct"]
    batch = (
        hll_distinct(
            spark.createDataFrame([(f"k{i}",) for i in range(1000)], "k string"),
            "k", p=10,
        ).collect()[0]["est_distinct"]
    )
    assert streamed == batch
    # two batches appended register rows independently (no in-place
    # merge needed — max at read time)
    n_rows = c.scan("sk", with_stamps=False).count()
    n_merged = (
        c.scan("sk", with_stamps=False).select("bucket").distinct().count()
    )
    assert n_rows > n_merged  # overlap across batches
    c.abort_tx()
    # redelivered batch id: skipped, estimate unchanged
    last = factory()
    last.new_tx()
    bid = last.tx.snapshot.txns["hllapp"]
    last.abort_tx()
    writer = foreach_batch_hll_writer(factory, "sk", "hllapp", "k", p=10)
    writer(spark.createDataFrame([("other",)], "k string"), bid)
    c2 = factory()
    c2.new_tx()
    again = table_sketch_estimate(c2, "sk", p=10).collect()[0]["est_distinct"]
    assert again == streamed
    c2.abort_tx()
    # fold-compaction: one row per register, estimate unchanged,
    # second run a no-op (VERDICT r7 item 4)
    from delta_lake_experiment_spark.streaming.sketch import (
        compact_sketch_table,
    )

    removed = compact_sketch_table(c2, "sk")
    assert removed == n_rows - n_merged > 0
    c3 = factory()
    c3.new_tx()
    assert c3.scan("sk", with_stamps=False).count() == n_merged
    assert (
        c3.scan("sk", with_stamps=False).select("bucket").distinct().count()
        == n_merged
    )
    folded_est = table_sketch_estimate(c3, "sk", p=10).collect()[0][
        "est_distinct"
    ]
    assert folded_est == streamed
    c3.abort_tx()
    assert compact_sketch_table(c3, "sk") == 0
    c4 = factory()
    c4.new_tx()
    assert c4.scan("sk", with_stamps=False).count() == n_merged
    c4.abort_tx()


@pytest.mark.slow
def test_streaming_cms_sketch(spark, tmp_path, store_dir):
    """Streaming incremental heavy-hitter counts: per-batch CMS
    counter rows append through the exactly-once sink, read-time
    merge (groupBy-SUM) equals the batch sketch over everything
    streamed, a REDELIVERED batch changes nothing (addition is not
    idempotent — the txn marker alone carries exactly-once, the
    documented contrast with HLL's max), and fold-compaction rewrites
    to one row per cell with estimates unchanged."""
    from pyspark.sql import functions as F

    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.operators.sketches import (
        CMS_TABLE_DDL,
        cms_counters,
        cms_estimate,
    )
    from delta_lake_experiment_spark.streaming.sketch import (
        compact_cms_table,
        foreach_batch_cms_writer,
        table_cms_estimate,
        write_cms_stream_to_table,
    )

    d, w = 3, 32

    def factory():
        return DeltaLakeClient(spark, store_dir)

    boot = factory()
    boot.new_tx()
    boot.create_table("cms", CMS_TABLE_DDL)
    boot.commit_tx()
    rows1 = [(f"k{i % 9}",) for i in range(300)]
    rows2 = [("hot",)] * 200 + [(f"k{i % 5}",) for i in range(100)]
    src = str(tmp_path / "ckeys")
    spark.createDataFrame(rows1, "k string").coalesce(1).write.parquet(src)
    spark.createDataFrame(rows2, "k string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = write_cms_stream_to_table(
        stream, factory, "cms", "cmsapp", "k", str(tmp_path / "cck"), d=d, w=w
    )
    q.awaitTermination()
    c = factory()
    c.new_tx()
    all_df = spark.createDataFrame(rows1 + rows2, "k string")
    keys = all_df.select("k").distinct()
    streamed = {
        r["k"]: r["est"]
        for r in table_cms_estimate(c, "cms", keys, "k", d=d, w=w).collect()
    }
    batch = {
        r["k"]: r["est"]
        for r in cms_estimate(
            cms_counters(all_df, "k", d=d, w=w), keys, "k", d=d, w=w
        ).collect()
    }
    assert streamed == batch and streamed["hot"] >= 200
    n_rows = c.scan("cms", with_stamps=False).count()
    n_cells = (
        c.scan("cms", with_stamps=False).select("r", "c").distinct().count()
    )
    assert n_rows > n_cells  # two batches appended independently
    c.abort_tx()
    # redelivered batch id: skipped — counters NOT double-added
    last = factory()
    last.new_tx()
    bid = last.tx.snapshot.txns["cmsapp"]
    last.abort_tx()
    writer = foreach_batch_cms_writer(factory, "cms", "cmsapp", "k", d=d, w=w)
    writer(spark.createDataFrame([("other",)], "k string"), bid)
    c2 = factory()
    c2.new_tx()
    again = {
        r["k"]: r["est"]
        for r in table_cms_estimate(c2, "cms", keys, "k", d=d, w=w).collect()
    }
    assert again == streamed
    c2.abort_tx()
    # fold-compaction: one row per cell, estimates unchanged, no-op twice
    removed = compact_cms_table(c2, "cms")
    assert removed == n_rows - n_cells > 0
    c3 = factory()
    c3.new_tx()
    assert c3.scan("cms", with_stamps=False).count() == n_cells
    folded = {
        r["k"]: r["est"]
        for r in table_cms_estimate(c3, "cms", keys, "k", d=d, w=w).collect()
    }
    assert folded == streamed
    c3.abort_tx()
    assert compact_cms_table(c3, "cms") == 0


@pytest.mark.slow
def test_streaming_merge_upsert_sink(spark, tmp_path, store_dir):
    """MERGE-based exactly-once upsert sink: micro-batches of keyed
    updates upsert into a primary-keyed table (latest-wins), intra-batch
    duplicates collapse by the event-order column, and a redelivered
    batch is a no-op despite MERGE not being idempotent."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.streaming.engine_sink import (
        foreach_batch_upsert,
    )

    boot = DeltaLakeClient(spark, store_dir)
    boot.new_tx()
    boot.create_table(
        "kv", "k BIGINT, v STRING, ts BIGINT", primary_keys=["k"]
    )
    boot.write_dataframe(
        "kv",
        spark.createDataFrame(
            [(i, f"base{i}", 0) for i in range(10)], "k BIGINT, v STRING, ts BIGINT"
        ),
    )
    boot.commit_tx()

    def factory():
        return DeltaLakeClient(spark, store_dir)

    # two source files -> maxFilesPerTrigger=1 -> two micro-batches;
    # batch files carry intra-batch duplicate keys with an order column
    src = str(tmp_path / "upsert_src")
    spark.createDataFrame(
        [(3, "old3", 1), (3, "new3", 2), (100, "ins100", 1)],
        "k BIGINT, v STRING, ts BIGINT",
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(5, "new5", 3), (100, "upd100", 4)],
        "k BIGINT, v STRING, ts BIGINT",
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("k BIGINT, v STRING, ts BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_upsert(factory, "kv", "upsert_app", order_by="ts")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_upsert"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    check = factory()
    check.new_tx()
    cur = {r["k"]: r["v"] for r in check.scan_current("kv").collect()}
    assert cur[3] == "new3"          # intra-batch dup collapsed to ts=2
    assert cur[5] == "new5"
    assert cur[100] in ("upd100", "ins100")  # order across batches
    assert len(cur) == 11
    # file order is lexicographic part files; both batches applied ->
    # whichever ran second won; with two commits the later stamp wins
    bid = check.tx.snapshot.txns["upsert_app"]
    check.commit_tx()

    # redelivery of the last committed batch id: MERGE must NOT re-run
    redeliver = foreach_batch_upsert(factory, "kv", "upsert_app", order_by="ts")
    redeliver(
        spark.createDataFrame([(3, "evil", 99)], "k BIGINT, v STRING, ts BIGINT"),
        bid,
    )
    check2 = factory()
    check2.new_tx()
    cur2 = {r["k"]: r["v"] for r in check2.scan_current("kv").collect()}
    assert cur2[3] == "new3" and len(cur2) == 11  # unchanged
    # the next batch id applies normally
    redeliver(
        spark.createDataFrame([(3, "final", 100)], "k BIGINT, v STRING, ts BIGINT"),
        bid + 1,
    )
    check3 = factory()
    check3.new_tx()
    assert {r["k"]: r["v"] for r in check3.scan_current("kv").collect()}[3] == "final"
    check3.commit_tx()


@pytest.mark.slow
def test_periodic_sketch_compaction_in_stream(spark, tmp_path, store_dir):
    """VERDICT r8 item 7: a long stream with compact_every keeps the
    register table at O(registers) rows WITHOUT anyone calling the
    compaction, and the estimate equals the batch sketch. Same loop
    for the CMS lane, plus the OPTIMIZE SKETCH SQL maintenance entry."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.operators.sketches import hll_distinct
    from delta_lake_experiment_spark.streaming.sketch import (
        CMS_TABLE_DDL,
        HLL_TABLE_DDL,
        table_cms_estimate,
        table_sketch_estimate,
        write_cms_stream_to_table,
        write_hll_stream_to_table,
    )

    def factory():
        return DeltaLakeClient(spark, store_dir)

    boot = factory()
    boot.new_tx()
    boot.create_table("skc", HLL_TABLE_DDL)
    boot.create_table("cmc", CMS_TABLE_DDL)
    boot.commit_tx()
    # 8 files -> 8 micro-batches; every 2nd batch folds the table
    src = str(tmp_path / "keys")
    for b in range(8):
        spark.createDataFrame(
            [(f"k{i % 500}",) for i in range(b * 200, (b + 1) * 200)],
            "k string",
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = write_hll_stream_to_table(
        stream, factory, "skc", "hllc", "k", str(tmp_path / "ck1"),
        p=10, compact_every=2,
    )
    q.awaitTermination()
    c = factory()
    c.new_tx()
    # the LAST fold ran at batch 8 -> table is exactly one row per
    # live register (<= 2^10), not 8 batches' worth
    n_rows = c.scan("skc", with_stamps=False).count()
    n_regs = c.scan("skc", with_stamps=False).select("bucket").distinct().count()
    assert n_rows == n_regs <= 1024
    all_keys = spark.createDataFrame(
        [(f"k{i % 500}",) for i in range(1600)], "k string"
    )
    assert (
        table_sketch_estimate(c, "skc", p=10).collect()[0]["est_distinct"]
        == hll_distinct(all_keys, "k", p=10).collect()[0]["est_distinct"]
    )
    c.abort_tx()

    stream2 = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = write_cms_stream_to_table(
        stream2, factory, "cmc", "cmsc", "k", str(tmp_path / "ck2"),
        d=3, w=256, compact_every=2,
    )
    q2.awaitTermination()
    c = factory()
    c.new_tx()
    n_rows = c.scan("cmc", with_stamps=False).count()
    n_cells = (
        c.scan("cmc", with_stamps=False).select("r", "c").distinct().count()
    )
    assert n_rows == n_cells <= 3 * 256
    probe = spark.createDataFrame([("k7",), ("k400",)], "k string")
    est = {
        r["k"]: r["est"]
        for r in table_cms_estimate(c, "cmc", probe, "k", d=3, w=256).collect()
    }
    # every key k0..k499 appears at least 3x in 1600 draws of i%500;
    # CMS is one-sided: est >= true
    assert est["k7"] >= 3 and est["k400"] >= 3
    c.abort_tx()

    # the SQL maintenance entry folds an appended-to table back down
    c2 = factory()
    c2.new_tx()
    import pyspark.sql.functions as F2

    c2.write_dataframe(
        "skc",
        spark.createDataFrame([(1, 3), (1, 5)], "bucket int, reg int"),
    )
    c2.commit_tx()
    report = c2.execute("OPTIMIZE SKETCH skc").collect()[0]
    assert report["kind"] == "hll" and report["rows_removed"] >= 1
    c2.new_tx()
    assert (
        c2.scan("skc", with_stamps=False).filter(F2.col("bucket") == 1).count()
        == 1
    )
    c2.abort_tx()
