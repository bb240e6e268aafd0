"""Structured-Streaming SOURCE over engine tables
(streaming/engine_source.py): snapshot-then-tail parity with the batch
scan, checkpoint resume, append-only enforcement, skipChangeCommits,
and evolved-table (rename/widen/default/DV) snapshot semantics."""

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_lake_experiment_spark.client import DeltaLakeClient
from delta_lake_experiment_spark.streaming.engine_source import (
    read_table_stream,
)


def _drain(spark, stream, name, checkpoint):
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"select * from {name}")


def _seed(spark, root, n_commits=3, per=10):
    c = DeltaLakeClient(spark, root)
    c.new_tx()
    c.create_table("t", "id BIGINT, v STRING")
    c.commit_tx()
    for i in range(n_commits):
        c.new_tx()
        df = spark.range(i * per, (i + 1) * per).select(
            F.col("id"), F.concat(F.lit("x"), F.col("id")).alias("v")
        )
        c.write_dataframe("t", df)
        c.commit_tx()
    return c


def test_snapshot_stream_equals_batch_scan(spark, tmp_path):
    c = _seed(spark, str(tmp_path))
    got = _drain(
        spark,
        read_table_stream(spark, str(tmp_path), "t"),
        "es_snap",
        str(tmp_path / "ck"),
    )
    c.new_tx()
    want = c.scan("t", with_stamps=False)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    c.abort_tx()


def _drain_collect(spark, root, ck, **kwargs):
    """foreachBatch drain (the memory sink cannot recover from a
    checkpoint): returns the ids delivered by THIS run only."""
    seen: list[int] = []

    def collect(batch_df, _bid):
        seen.extend(r.id for r in batch_df.collect())

    q = (
        read_table_stream(spark, root, "t", **kwargs)
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(seen)


@pytest.mark.slow
def test_resume_from_checkpoint_reads_only_new_commits(spark, tmp_path):
    c = _seed(spark, str(tmp_path))
    ck = str(tmp_path / "ck")
    assert _drain_collect(spark, str(tmp_path), ck) == list(range(30))
    # two more append commits, then resume from the SAME checkpoint
    for i in (3, 4):
        c.new_tx()
        df = spark.range(i * 10, (i + 1) * 10).select(
            F.col("id"), F.concat(F.lit("x"), F.col("id")).alias("v")
        )
        c.write_dataframe("t", df)
        c.commit_tx()
    # only the 20 new rows stream — nothing re-read from the snapshot
    assert _drain_collect(spark, str(tmp_path), ck) == list(range(30, 50))


def test_non_append_commit_raises(spark, tmp_path):
    c = _seed(spark, str(tmp_path))
    ck = str(tmp_path / "ck")
    _drain_collect(spark, str(tmp_path), ck)
    c.new_tx()
    c.delete_rows("t", "id", 5, 14)  # COW: removes + re-adds files
    c.commit_tx()
    with pytest.raises(Exception, match="append-tailing|NonAppendCommit"):
        _drain_collect(spark, str(tmp_path), ck)


def test_skip_change_commits_skips_wholesale(spark, tmp_path):
    c = _seed(spark, str(tmp_path), n_commits=1)
    ck = str(tmp_path / "ck")
    _drain_collect(spark, str(tmp_path), ck, skip_change_commits=True)
    # change commit (delete rewrites a file: remove + add) then an append
    c.new_tx()
    c.delete_rows("t", "id", 0, 4)
    c.commit_tx()
    c.new_tx()
    df = spark.range(100, 110).select(
        F.col("id"), F.concat(F.lit("x"), F.col("id")).alias("v")
    )
    c.write_dataframe("t", df)
    c.commit_tx()
    # the delete commit is skipped WHOLESALE (its rewrite file too);
    # only the clean append streams
    ids = _drain_collect(spark, str(tmp_path), ck, skip_change_commits=True)
    assert ids == list(range(100, 110))


def test_metadata_change_mid_stream_raises(spark, tmp_path):
    """A metadata commit landing AFTER the reader pinned its schema
    raises mid-stream (unit-level: a restarted query constructs a
    FRESH reader that pins the post-ALTER schema and advances — see
    test_stream_restarts_past_metadata_change)."""
    from delta_lake_experiment_spark.plans.snapshot import replay_log
    from delta_lake_experiment_spark.storage.objectstore import (
        LocalObjectStorage,
    )
    from delta_lake_experiment_spark.streaming.engine_source import (
        EngineTableStreamReader,
        SchemaChangedError,
    )

    c = _seed(spark, str(tmp_path), n_commits=1)
    store = LocalObjectStorage(str(tmp_path))
    reader = EngineTableStreamReader(str(tmp_path), {"table": "t"})
    pinned = reader.pinned_version
    c.new_tx()
    c.rename_column("t", "v", "val")
    c.commit_tx()
    latest = replay_log(store).version
    with pytest.raises(SchemaChangedError, match="metadata mid-stream"):
        reader.partitions({"version": pinned}, {"version": latest})


def test_snapshot_applies_rename_widen_default_and_dv(spark, tmp_path):
    """The initial snapshot batch must equal the batch scan on a table
    that exercises every read-time semantic at once: renamed column
    (physical name differs in files), widened type (narrow files under
    a wide read schema), stamp-gated DEFAULT (pre-birth rows read the
    default), and a deletion-vector mask."""
    root = str(tmp_path)
    c = DeltaLakeClient(spark, root)
    c.new_tx()
    c.create_table("t", "id INT, v STRING")
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t",
        spark.range(0, 10).select(
            F.col("id").cast("int"), F.concat(F.lit("a"), F.col("id")).alias("v")
        ),
    )
    c.commit_tx()
    c.new_tx()
    c.rename_column("t", "v", "label")
    c.commit_tx()
    c.new_tx()
    c.widen_column("t", "id", "bigint")
    c.commit_tx()
    c.new_tx()
    c.add_columns("t", "score DOUBLE DEFAULT 1.5")
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t",
        spark.range(10, 20).select(
            F.col("id"),
            F.concat(F.lit("b"), F.col("id")).alias("label"),
            F.lit(2.5).alias("score"),
        ),
    )
    c.commit_tx()
    c.new_tx()
    c.delete_rows("t", "id", 3, 5, use_dv=True)
    c.commit_tx()

    got = _drain(
        spark,
        read_table_stream(spark, root, "t"),
        "es_evolved",
        str(tmp_path / "ck"),
    )
    c.new_tx()
    want = c.scan("t", with_stamps=False)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the gated default actually shows: pre-birth rows read 1.5
    pre = [r for r in got.collect() if r.id < 10]
    assert pre and all(r.score == 1.5 for r in pre)
    c.abort_tx()


def test_source_to_engine_sink_exactly_once(spark, tmp_path):
    """engine-table -> engine-table pipeline: tail the source table
    through the exactly-once MERGE sink; the result equals a batch
    latest-wins aggregate, and a re-run with the same checkpoint is a
    no-op (offsets + txn markers compose)."""
    from delta_lake_experiment_spark.streaming.engine_sink import (
        foreach_batch_writer,
    )

    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    os.makedirs(src_root)
    os.makedirs(dst_root)
    _seed(spark, src_root)

    def dst_factory():
        return DeltaLakeClient(spark, dst_root)

    boot = dst_factory()
    boot.new_tx()
    boot.create_table("out", "id BIGINT, v STRING")
    boot.commit_tx()
    ck = str(tmp_path / "ck")

    def run():
        q = (
            read_table_stream(spark, src_root, "t")
            .writeStream.foreachBatch(
                foreach_batch_writer(dst_factory, "out", "es_pipe")
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    c = dst_factory()
    c.new_tx()
    assert c.scan("out").count() == 30
    c.abort_tx()
    run()  # same checkpoint: nothing new to read -> still 30
    c.new_tx()
    assert c.scan("out").count() == 30
    c.abort_tx()


def test_stream_restarts_past_metadata_change(spark, tmp_path):
    """Review fix (r9): a SchemaChangedError must not WEDGE the
    stream — after the instructed restart, the new reader (which
    pinned the post-ALTER schema) skips metadata commits at or before
    its pinned version and tails on, delivering post-ALTER appends in
    the NEW shape from the same checkpoint."""
    c = _seed(spark, str(tmp_path), n_commits=1)
    ck = str(tmp_path / "ck")
    _drain_collect(spark, str(tmp_path), ck)
    c.new_tx()
    c.rename_column("t", "v", "val")
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t",
        spark.range(50, 55).select(
            F.col("id"), F.concat(F.lit("y"), F.col("id")).alias("val")
        ),
    )
    c.commit_tx()
    # the restart: a FRESH reader pins the renamed schema, SKIPS the
    # metadata commit (it is <= its pinned version), and advances
    seen = []

    def collect(batch_df, _bid):
        assert "val" in batch_df.columns
        seen.extend(r.id for r in batch_df.collect())

    q = (
        read_table_stream(spark, str(tmp_path), "t")
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(seen) == list(range(50, 55))


def test_snapshot_branch_guards_post_pin_metadata(spark, tmp_path):
    """Review fix (r9): a metadata commit landing between reader
    construction and the FIRST batch must raise (the pinned shape
    would read the snapshot wrong), exactly like the tail branch."""
    from delta_lake_experiment_spark.plans.snapshot import (
        LOG_PREFIX,
        replay_log,
    )
    from delta_lake_experiment_spark.storage.objectstore import (
        LocalObjectStorage,
    )
    from delta_lake_experiment_spark.streaming.engine_source import (
        EngineTableStreamReader,
        SchemaChangedError,
    )

    c = _seed(spark, str(tmp_path), n_commits=1)
    reader = EngineTableStreamReader(str(tmp_path), {"table": "t"})
    c.new_tx()
    c.rename_column("t", "v", "val")  # lands AFTER the pin
    c.commit_tx()
    latest = replay_log(LocalObjectStorage(str(tmp_path))).version
    with pytest.raises(SchemaChangedError):
        reader.partitions({"version": -1}, {"version": latest})
    # a reader pinned AFTER the alter reads the same snapshot fine
    reader2 = EngineTableStreamReader(str(tmp_path), {"table": "t"})
    parts = reader2.partitions({"version": -1}, {"version": latest})
    assert parts


def _drain_cdf(spark, root, ck, collect_cols):
    rows = []

    def collect(batch_df, _bid):
        rows.extend(tuple(r[c] for c in collect_cols) for r in batch_df.collect())

    q = (
        read_table_stream(spark, root, "t", read_change_feed=True)
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def test_cdf_stream_folds_to_current_state(spark, tmp_path):
    """readChangeFeed (Delta's option): the streamed insert/delete rows
    per commit fold to EXACTLY the current table state across COW
    delete, append, and DV delete; per-version counts match the commit
    structure; timestamps ride along non-null."""
    from collections import Counter

    root = str(tmp_path)
    c = DeltaLakeClient(spark, root)
    c.new_tx()
    c.create_table("t", "id BIGINT, v DOUBLE")  # v1
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t", spark.range(0, 20).select("id", (F.col("id") * 1.0).alias("v"))
    )
    c.commit_tx()  # v2
    c.new_tx()
    c.delete_rows("t", "id", 5, 9)  # v3 COW
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t", spark.range(100, 105).select("id", F.lit(7.0).alias("v"))
    )
    c.commit_tx()  # v4
    c.new_tx()
    c.delete_rows("t", "id", 0, 1, use_dv=True)  # v5 DV
    c.commit_tx()

    rows = _drain_cdf(
        spark, root, str(tmp_path / "ck"),
        ["_commit_version", "_change_type", "id", "v", "_commit_timestamp"],
    )
    by_ver = Counter((r[0], r[1]) for r in rows)
    assert by_ver == {
        (2, "insert"): 20,
        (3, "delete"): 5,
        (4, "insert"): 5,
        (5, "delete"): 2,
    }
    assert all(r[4] is not None for r in rows)
    net = Counter()
    for r in rows:
        net[(r[2], r[3])] += 1 if r[1] == "insert" else -1
    folded = sorted(k for k, n in net.items() if n > 0 for _ in range(n))
    c.new_tx()
    cur = sorted(
        (r["id"], r["v"]) for r in c.scan("t", with_stamps=False).collect()
    )
    assert folded == cur
    c.abort_tx()


def test_cdf_compaction_nets_zero(spark, tmp_path):
    """Compaction rewrites every row it removes: the per-commit stamp
    anti-join cancels them all — a compaction commit streams ZERO
    change rows (the scan_changes contract, per commit)."""
    root = str(tmp_path)
    c = _seed(spark, root, n_commits=3)
    ck = str(tmp_path / "ck")
    first = _drain_cdf(spark, root, ck, ["_commit_version", "_change_type"])
    assert len(first) == 30
    c.new_tx()
    c.compact("t")
    c.commit_tx()
    resumed = _drain_cdf(spark, root, ck, ["_commit_version", "_change_type"])
    assert resumed == []


def test_cdf_option_validation(spark, tmp_path):
    _seed(spark, str(tmp_path), n_commits=1)
    with pytest.raises(Exception, match="skipChangeCommits contradicts"):
        _drain(
            spark,
            read_table_stream(
                spark, str(tmp_path), "t",
                read_change_feed=True, skip_change_commits=True,
            ),
            "es_cdf_bad",
            str(tmp_path / "ck1"),
        )
    with pytest.raises(Exception, match="mutually exclusive"):
        _drain(
            spark,
            read_table_stream(
                spark, str(tmp_path), "t",
                read_change_feed=True, with_stamps=True,
            ),
            "es_cdf_bad2",
            str(tmp_path / "ck2"),
        )


def test_cdf_prior_dv_masks_not_redelivered(spark, tmp_path):
    """Review fix (r9, pass 2): a row soft-deleted by an EARLIER DV
    commit must not be emitted as a delete AGAIN when a later COW
    rewrite retires its file — removed files are read with their
    prior masks applied, exactly like scan_changes."""
    from collections import Counter

    root = str(tmp_path)
    c = DeltaLakeClient(spark, root)
    c.new_tx()
    c.create_table("t", "id BIGINT, v DOUBLE")  # v1
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t", spark.range(0, 20).select("id", (F.col("id") * 1.0).alias("v"))
    )
    c.commit_tx()  # v2
    c.new_tx()
    c.delete_rows("t", "id", 0, 1, use_dv=True)  # v3: DV mask ids 0,1
    c.commit_tx()
    c.new_tx()
    c.delete_rows("t", "id", 5, 9)  # v4: COW rewrite of the SAME file
    c.commit_tx()

    rows = _drain_cdf(
        spark, root, str(tmp_path / "ck"),
        ["_commit_version", "_change_type", "id", "v"],
    )
    by_ver = Counter((r[0], r[1]) for r in rows)
    assert by_ver == {
        (2, "insert"): 20,
        (3, "delete"): 2,
        (4, "delete"): 5,  # NOT 7: ids 0,1 were already dead
    }
    net = Counter()
    for r in rows:
        net[(r[2], r[3])] += 1 if r[1] == "insert" else -1
    folded = sorted(k for k, n in net.items() if n > 0 for _ in range(n))
    c.new_tx()
    cur = sorted(
        (r["id"], r["v"]) for r in c.scan("t", with_stamps=False).collect()
    )
    assert folded == cur
    c.abort_tx()


def test_cdf_across_type_widening_boundary(spark, tmp_path):
    """Review fix (r9, pass 2): a CDF commit whose files span a
    widening boundary (int32 and int64 physical widths under one
    declared BIGINT) must normalize to the declared types before the
    concat/anti-join instead of crashing."""
    from collections import Counter

    root = str(tmp_path)
    c = DeltaLakeClient(spark, root)
    c.new_tx()
    c.create_table("t", "id INT, v DOUBLE")  # v1
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t",
        spark.range(0, 10).select(
            F.col("id").cast("int"), (F.col("id") * 1.0).alias("v")
        ),
    )
    c.commit_tx()  # v2: int32 file
    c.new_tx()
    c.widen_column("t", "id", "bigint")  # v3: metadata only
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t", spark.range(100, 110).select("id", (F.col("id") * 1.0).alias("v"))
    )
    c.commit_tx()  # v4: int64 file
    c.new_tx()
    c.compact("t")  # v5: removes BOTH eras' files in one commit
    c.commit_tx()

    rows = _drain_cdf(
        spark, root, str(tmp_path / "ck"),
        ["_commit_version", "_change_type", "id"],
    )
    by_ver = Counter((r[0], r[1]) for r in rows)
    # compaction nets to zero; the two inserts stream in declared types
    assert by_ver == {(2, "insert"): 10, (4, "insert"): 10}
    assert all(isinstance(r[2], int) for r in rows)


def test_cdf_vacuumed_history_raises_clearly(spark, tmp_path):
    """Review fix (r9, pass 2): a from-birth change feed over a table
    whose history VACUUM reclaimed must fail at PLANNING time with an
    error naming the remedy, not mid-replay with FileNotFoundError."""
    root = str(tmp_path)
    c = DeltaLakeClient(spark, root)
    c.new_tx()
    c.create_table("t", "id BIGINT, v DOUBLE")
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t", spark.range(0, 10).select("id", (F.col("id") * 1.0).alias("v"))
    )
    c.commit_tx()
    c.new_tx()
    c.delete_rows("t", "id", 0, 4)  # rewrite: the original file dies
    c.commit_tx()
    c.vacuum(retain_versions=0)  # keep only the head: history objects die
    with pytest.raises(Exception, match="VACUUM has reclaimed"):
        _drain_cdf(spark, root, str(tmp_path / "ck"), ["_commit_version"])


@pytest.mark.slow
def test_cdf_drives_streaming_mv_maintenance(spark, tmp_path):
    """The Delta-style streaming-MV composition: tail a table's CHANGE
    FEED and fold each micro-batch's net deltas into a per-key
    aggregate MV through the exactly-once MERGE sink — the MV equals a
    full recompute after inserts, COW deletes, and a resumed run
    (incremental == recompute, maintained by a stream instead of the
    batch refresh)."""
    from pyspark.sql import functions as F2

    from delta_lake_experiment_spark.streaming.engine_sink import (
        foreach_batch_writer,
    )

    src_root = str(tmp_path / "src")
    mv_root = str(tmp_path / "mv")
    os.makedirs(src_root)
    os.makedirs(mv_root)
    c = DeltaLakeClient(spark, src_root)
    c.new_tx()
    c.create_table("t", "grp BIGINT, x DOUBLE")
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t",
        spark.range(0, 40).select(
            (F2.col("id") % 4).alias("grp"), (F2.col("id") * 1.0).alias("x")
        ),
    )
    c.commit_tx()
    c.new_tx()
    c.delete_rows("t", "x", 10.0, 19.0)
    c.commit_tx()

    boot = DeltaLakeClient(spark, mv_root)
    boot.new_tx()
    boot.create_table(
        "mv", "grp BIGINT, n BIGINT, x_sum DOUBLE, ver BIGINT",
        primary_keys=["grp"],
    )
    boot.commit_tx()

    def mv_factory():
        return DeltaLakeClient(spark, mv_root)

    ck = str(tmp_path / "ck")

    def fold(client, batch_df):
        # net per-key delta of this micro-batch, folded onto the MV's
        # current state READ THROUGH THE OPEN TRANSACTION
        delta = batch_df.groupBy("grp").agg(
            F2.sum(
                F2.when(F2.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("dn"),
            F2.sum(
                F2.when(
                    F2.col("_change_type") == "insert", F2.col("x")
                ).otherwise(-F2.col("x"))
            ).alias("dx"),
            F2.max("_commit_version").alias("ver"),
        )
        cur = client.scan_current("mv").select("grp", "n", "x_sum")
        return (
            delta.join(cur, "grp", "left")
            .select(
                "grp",
                (F2.coalesce(F2.col("n"), F2.lit(0)) + F2.col("dn")).alias("n"),
                (
                    F2.coalesce(F2.col("x_sum"), F2.lit(0.0)) + F2.col("dx")
                ).alias("x_sum"),
                "ver",
            )
        )

    def merge_fold(client, batch_df):
        client.merge("mv", fold(client, batch_df))
        # nothing left to append: return an empty frame of mv's shape
        return spark.createDataFrame(
            [], "grp BIGINT, n BIGINT, x_sum DOUBLE, ver BIGINT"
        )

    def run2():
        q = (
            read_table_stream(spark, src_root, "t", read_change_feed=True)
            .writeStream.foreachBatch(
                foreach_batch_writer(mv_factory, "mv", "mv_app", transform=merge_fold)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run2()

    def recompute():
        cc = DeltaLakeClient(spark, src_root)
        cc.new_tx()
        want = {
            (r["grp"]): (r["n"], round(r["x_sum"], 6))
            for r in cc.scan("t", with_stamps=False)
            .groupBy("grp")
            .agg(F2.count(F2.lit(1)).alias("n"), F2.sum("x").alias("x_sum"))
            .collect()
        }
        cc.abort_tx()
        m = mv_factory()
        m.new_tx()
        got = {
            r["grp"]: (r["n"], round(r["x_sum"], 6))
            for r in m.scan_current("mv").filter(F2.col("n") > 0).collect()
        }
        m.abort_tx()
        return want, got

    want, got = recompute()
    assert got == want

    # more commits, resumed run: still equals recompute
    c.new_tx()
    c.write_dataframe(
        "t",
        spark.range(100, 120).select(
            (F2.col("id") % 4).alias("grp"), (F2.col("id") * 1.0).alias("x")
        ),
    )
    c.commit_tx()
    c.new_tx()
    c.delete_rows("t", "x", 100.0, 104.0)
    c.commit_tx()
    run2()
    want, got = recompute()
    assert got == want


def test_tail_replay_over_vacuumed_history_raises_clearly(spark, tmp_path):
    """Tail-mode replay (explicit startingVersion) of a commit whose
    added object was later rewritten and VACUUMed fails at planning
    time with the named remedy — same guard as the change feed. The
    default snapshot mode is immune (it reads only LIVE files)."""
    root = str(tmp_path)
    c = DeltaLakeClient(spark, root)
    c.new_tx()
    c.create_table("t", "id BIGINT, v DOUBLE")
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t", spark.range(0, 10).select("id", (F.col("id") * 1.0).alias("v"))
    )
    c.commit_tx()
    c.new_tx()
    c.delete_rows("t", "id", 0, 4)  # rewrite retires the v2 object
    c.commit_tx()
    c.vacuum(retain_versions=0)
    with pytest.raises(Exception, match="VACUUM has reclaimed"):
        _drain_collect(
            spark, root, str(tmp_path / "ck1"),
            starting_version=0, skip_change_commits=True,
        )
    # the snapshot default reads only live files: unaffected
    assert _drain_collect(spark, root, str(tmp_path / "ck2")) == list(
        range(5, 10)
    )


def _drain_batches(spark, root, ck, **kwargs):
    """One availableNow run; returns [(sorted ids per batch)] for THIS
    run (Python sources run availableNow as a single bounded batch)."""
    batches: list[list[int]] = []

    def collect(batch_df, _bid):
        batches.append(sorted(r.id for r in batch_df.collect()))

    q = (
        read_table_stream(spark, root, "t", **kwargs)
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [b for b in batches if b]


@pytest.mark.slow
def test_bounded_backlog_drains_across_runs(spark, tmp_path):
    """Admission control (VERDICT r9 item 3): a 9-commit backlog with
    maxCommitsPerBatch=3 drains in 3 bounded batches — each run resumes
    the checkpoint mid-backlog — and the union equals the unbounded
    single-batch result."""
    c = _seed(spark, str(tmp_path), n_commits=1)
    ck = str(tmp_path / "ck")
    assert _drain_collect(spark, str(tmp_path), ck) == list(range(10))
    for i in range(1, 10):  # 9 more append commits of 10 rows
        c.new_tx()
        df = spark.range(i * 10, (i + 1) * 10).select(
            F.col("id"), F.concat(F.lit("x"), F.col("id")).alias("v")
        )
        c.write_dataframe("t", df)
        c.commit_tx()
    got: list[list[int]] = []
    for _ in range(5):
        bs = _drain_batches(
            spark, str(tmp_path), ck, max_commits_per_batch=3
        )
        got.extend(bs)
        if not bs:
            break
    # 9 commits / cap 3 = exactly 3 bounded catch-up batches
    assert len(got) == 3, got
    assert all(len(b) == 30 for b in got), [len(b) for b in got]
    assert sorted(x for b in got for x in b) == list(range(10, 100))


@pytest.mark.slow
def test_bounded_backlog_single_run_multiple_batches(spark, tmp_path):
    """The same backlog drains inside ONE continuous query as multiple
    bounded micro-batches (latestOffset advances the cap from the
    position learned at the previous batch)."""
    import time

    c = _seed(spark, str(tmp_path), n_commits=1)
    ck = str(tmp_path / "ck")
    assert _drain_collect(spark, str(tmp_path), ck) == list(range(10))
    for i in range(1, 10):
        c.new_tx()
        df = spark.range(i * 10, (i + 1) * 10).select(
            F.col("id"), F.concat(F.lit("x"), F.col("id")).alias("v")
        )
        c.write_dataframe("t", df)
        c.commit_tx()
    batches: list[list[int]] = []

    def collect(batch_df, _bid):
        ids = sorted(r.id for r in batch_df.collect())
        if ids:
            batches.append(ids)

    q = (
        read_table_stream(
            spark, str(tmp_path), "t", max_commits_per_batch=3
        )
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", ck)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if sum(len(b) for b in batches) >= 90:
            break
        time.sleep(0.25)
    q.stop()
    q.awaitTermination()
    assert len(batches) >= 3, [len(b) for b in batches]
    assert all(len(b) <= 30 for b in batches), [len(b) for b in batches]
    assert sorted(x for b in batches for x in b) == list(range(10, 100))


@pytest.mark.slow
def test_max_files_per_batch_bounds_advance(spark, tmp_path):
    """maxFilesPerBatch advances whole commits while the file budget
    lasts: 6 one-file commits with a 2-file cap drain in 3 batches."""
    c = DeltaLakeClient(spark, str(tmp_path))
    c.new_tx()
    c.create_table("t", "id BIGINT, v STRING")
    c.commit_tx()
    ck = str(tmp_path / "ck")
    assert _drain_collect(spark, str(tmp_path), ck) == []
    for i in range(6):  # one data object per commit (coalesced)
        c.new_tx()
        df = (
            spark.range(i * 10, (i + 1) * 10)
            .coalesce(1)
            .select(F.col("id"), F.lit("x").alias("v"))
        )
        c.write_dataframe("t", df)
        c.commit_tx()
    got: list[list[int]] = []
    for _ in range(6):
        bs = _drain_batches(
            spark, str(tmp_path), ck, max_files_per_batch=2
        )
        got.extend(bs)
        if not bs:
            break
    assert len(got) == 3, [len(b) for b in got]
    assert all(len(b) == 20 for b in got), [len(b) for b in got]
    assert sorted(x for b in got for x in b) == list(range(60))


@pytest.mark.slow
def test_cdf_respects_batch_bounds(spark, tmp_path):
    """CDF + admission control compose (VERDICT r9 item 7): a CDF
    partition is per-commit, so maxCommitsPerBatch bounds how many
    commits' change sets one trigger carries."""
    c = DeltaLakeClient(spark, str(tmp_path))
    c.new_tx()
    c.create_table("t", "id BIGINT, v STRING")
    c.commit_tx()
    for i in range(6):
        c.new_tx()
        df = spark.range(i * 10, (i + 1) * 10).select(
            F.col("id"), F.lit("x").alias("v")
        )
        c.write_dataframe("t", df)
        c.commit_tx()
    ck = str(tmp_path / "ck")
    runs: list[list[tuple]] = []
    for _ in range(6):
        rows: list[tuple] = []

        def collect(batch_df, _bid, rows=rows):
            rows.extend(
                (r.id, r._change_type, r._commit_version)
                for r in batch_df.collect()
            )

        q = (
            read_table_stream(
                spark,
                str(tmp_path),
                "t",
                read_change_feed=True,
                max_commits_per_batch=2,
            )
            .writeStream.foreachBatch(collect)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if not rows:
            break
        runs.append(rows)
    # commits 1..7 (CREATE + 6 data commits) under a 2-commit cap:
    # 4 bounded runs — (1,2) (3,4) (5,6) (7)
    assert len(runs) == 4, [len(r) for r in runs]
    for rows in runs:
        # each bounded batch carries change sets of at most 2 commits
        assert len({v for _, _, v in rows}) <= 2
        assert all(ct == "insert" for _, ct, _ in rows)
    all_ids = sorted(i for rows in runs for i, _, _ in rows)
    assert all_ids == list(range(60))


@pytest.mark.slow
def test_bounded_initial_snapshot_slices(spark, tmp_path):
    """maxFilesPerBatch bounds the INITIAL SNAPSHOT too: it pins one
    consistent version and drains it in file slices across
    checkpoint-resumed runs — commits landing mid-drain tail AFTER the
    snapshot completes, and nothing is re-read or lost."""
    c = DeltaLakeClient(spark, str(tmp_path))
    c.new_tx()
    c.create_table("t", "id BIGINT, v STRING")
    c.commit_tx()
    for i in range(6):  # snapshot = 6 one-file objects
        c.new_tx()
        df = (
            spark.range(i * 10, (i + 1) * 10)
            .coalesce(1)
            .select(F.col("id"), F.lit("x").alias("v"))
        )
        c.write_dataframe("t", df)
        c.commit_tx()
    ck = str(tmp_path / "ck")
    got: list[list[int]] = []
    bs = _drain_batches(spark, str(tmp_path), ck, max_files_per_batch=2)
    got.extend(bs)
    # a commit lands MID-SNAPSHOT: it must not join the pinned
    # snapshot — it tails after the remaining slices
    c.new_tx()
    c.write_dataframe(
        "t",
        spark.range(100, 110).coalesce(1).select(
            F.col("id"), F.lit("x").alias("v")
        ),
    )
    c.commit_tx()
    for _ in range(6):
        bs = _drain_batches(spark, str(tmp_path), ck, max_files_per_batch=2)
        got.extend(bs)
        if not bs:
            break
    # 6 snapshot files / cap 2 = 3 slices; the mid-drain commit rides
    # the finishing batch or its own tail batch
    assert len(got) >= 3, [len(b) for b in got]
    assert all(len(b) <= 30 for b in got), [len(b) for b in got]
    assert sorted(x for b in got for x in b) == sorted(
        list(range(60)) + list(range(100, 110))
    )


def test_bounded_snapshot_single_run(spark, tmp_path):
    """One continuous query drains a file-capped snapshot in multiple
    slices (the latestOffset cursor advances within the run), then
    tails new commits — end state equals the batch scan."""
    import time

    c = DeltaLakeClient(spark, str(tmp_path))
    c.new_tx()
    c.create_table("t", "id BIGINT, v STRING")
    c.commit_tx()
    for i in range(5):
        c.new_tx()
        df = (
            spark.range(i * 10, (i + 1) * 10)
            .coalesce(1)
            .select(F.col("id"), F.lit("x").alias("v"))
        )
        c.write_dataframe("t", df)
        c.commit_tx()
    batches: list[list[int]] = []

    def collect(batch_df, _bid):
        ids = sorted(r.id for r in batch_df.collect())
        if ids:
            batches.append(ids)

    q = (
        read_table_stream(spark, str(tmp_path), "t", max_files_per_batch=2)
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if sum(len(b) for b in batches) >= 50:
            break
        time.sleep(0.25)
    q.stop()
    q.awaitTermination()
    assert len(batches) >= 3, [len(b) for b in batches]  # 5 files / 2
    assert all(len(b) <= 20 for b in batches), [len(b) for b in batches]
    assert sorted(x for b in batches for x in b) == list(range(50))


@pytest.mark.slow
def test_max_bytes_per_batch_bounds_advance(spark, tmp_path):
    """maxBytesPerBatch advances whole commits while the byte budget
    lasts, using the per-object `size` recorded in the log: with the
    cap set to two files' worth of bytes, 6 one-file commits drain in
    3 bounded batches."""
    from delta_lake_experiment_spark.plans.snapshot import replay_log
    from delta_lake_experiment_spark.storage.objectstore import (
        LocalObjectStorage,
    )

    c = DeltaLakeClient(spark, str(tmp_path))
    c.new_tx()
    c.create_table("t", "id BIGINT, v STRING")
    c.commit_tx()
    ck = str(tmp_path / "ck")
    assert _drain_collect(spark, str(tmp_path), ck) == []
    for i in range(6):
        c.new_tx()
        df = (
            spark.range(i * 10, (i + 1) * 10)
            .coalesce(1)
            .select(F.col("id"), F.lit("x").alias("v"))
        )
        c.write_dataframe("t", df)
        c.commit_tx()
    store = LocalObjectStorage(str(tmp_path))
    objs = replay_log(store).live_objects("t")
    sizes = sorted(o.size for o in objs)
    assert all(s > 0 for s in sizes), "size stat missing from adds"
    cap = sizes[-1] * 2  # fits two files, never three
    assert cap < sum(sizes[:3]), "fixture files too uneven for the cap"
    got: list[list[int]] = []
    for _ in range(6):
        bs = _drain_batches(
            spark, str(tmp_path), ck, max_bytes_per_batch=cap
        )
        got.extend(bs)
        if not bs:
            break
    assert len(got) == 3, [len(b) for b in got]
    assert all(len(b) == 20 for b in got), [len(b) for b in got]
    assert sorted(x for b in got for x in b) == list(range(60))


@pytest.mark.slow
def test_max_bytes_per_batch_bounds_snapshot(spark, tmp_path):
    """The byte cap slices the INITIAL SNAPSHOT too (the snapshot IS
    the backlog at scale): 6 one-file objects under a two-file byte
    budget drain as 3 snapshot slices."""
    from delta_lake_experiment_spark.plans.snapshot import replay_log
    from delta_lake_experiment_spark.storage.objectstore import (
        LocalObjectStorage,
    )

    c = DeltaLakeClient(spark, str(tmp_path))
    c.new_tx()
    c.create_table("t", "id BIGINT, v STRING")
    c.commit_tx()
    for i in range(6):
        c.new_tx()
        df = (
            spark.range(i * 10, (i + 1) * 10)
            .coalesce(1)
            .select(F.col("id"), F.lit("x").alias("v"))
        )
        c.write_dataframe("t", df)
        c.commit_tx()
    store = LocalObjectStorage(str(tmp_path))
    sizes = sorted(o.size for o in replay_log(store).live_objects("t"))
    cap = sizes[-1] * 2
    assert cap < sum(sizes[:3])
    ck = str(tmp_path / "ck")
    got: list[list[int]] = []
    for _ in range(6):
        bs = _drain_batches(
            spark, str(tmp_path), ck, max_bytes_per_batch=cap
        )
        got.extend(bs)
        if not bs:
            break
    assert len(got) == 3, [len(b) for b in got]
    assert sorted(x for b in got for x in b) == list(range(60))


@pytest.mark.slow
def test_starting_timestamp_tails_from_bound(spark, tmp_path):
    """startingTimestamp (Delta's option): stream commits recorded AT
    OR AFTER the bound; mutually exclusive with startingVersion; a
    bound past the newest commit tails only future commits."""
    import datetime
    import time

    c = _seed(spark, str(tmp_path), n_commits=1)  # rows 0..9 (before)
    time.sleep(0.05)
    cutoff = datetime.datetime.now(datetime.timezone.utc).isoformat()
    time.sleep(0.05)
    for i in (1, 2):  # rows 10..29 (at/after the bound)
        c.new_tx()
        c.write_dataframe(
            "t",
            spark.range(i * 10, (i + 1) * 10).select(
                F.col("id"), F.concat(F.lit("x"), F.col("id")).alias("v")
            ),
        )
        c.commit_tx()
    got = _drain_collect(
        spark, str(tmp_path), str(tmp_path / "ck1"),
        starting_timestamp=cutoff,
    )
    assert got == list(range(10, 30)), got
    # bound past the newest commit: nothing historical streams, a
    # future commit does
    future = datetime.datetime.now(datetime.timezone.utc).isoformat()
    assert _drain_collect(
        spark, str(tmp_path), str(tmp_path / "ck2"),
        starting_timestamp=future,
    ) == []
    c.new_tx()
    c.write_dataframe(
        "t",
        spark.range(100, 105).select(
            F.col("id"), F.lit("z").alias("v")
        ),
    )
    c.commit_tx()
    assert _drain_collect(
        spark, str(tmp_path), str(tmp_path / "ck2"),
        starting_timestamp=future,
    ) == list(range(100, 105))
    # mutual exclusion raises
    with pytest.raises(Exception, match="mutually exclusive"):
        _drain_collect(
            spark, str(tmp_path), str(tmp_path / "ck3"),
            starting_version=0, starting_timestamp=cutoff,
        )
