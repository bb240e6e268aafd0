"""Column mapping: RENAME/DROP COLUMN as O(1) metadata moves (Delta's
columnMapping.mode=name, simplified). Physical (in-file) names are
assigned at column birth and never change; renames move only the
logical side of the table's column map, drops retire the physical name
so a later re-add can never resurrect old file data. These tests cover
the full funnel: scans, time travel, stats/bloom pruning, bucketed
layout, COW/DV deletes, compaction, checkpoint replay, restore, clone,
and the change feed — none of which may rewrite data for a rename.

The reference has no schema evolution at all (its metadata record is a
create-only DDL string, storage.go); this is roadmap-beyond work in the
spirit of its "primary keys / conditional updates" item (README.md:31).
"""

import pytest
from pyspark.sql import functions as F

from delta_lake_experiment_spark import (
    DeltaLakeClient,
    TypeMismatchError,
)
from delta_lake_experiment_spark.errors import TableNotFoundError

def _no_shuffle(df) -> bool:
    """True when the executed plan contains no shuffle Exchange
    (BroadcastExchange exempt — same helper as test_engine.py)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan.replace("BroadcastExchange", "BX")


@pytest.fixture()
def smj_conf(spark):
    """Pin the planner to sort-merge joins for one test (AQE's
    broadcast rewrite would hide the exchange question)."""
    pairs = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.enabled", "false"),
    ]
    old = {k: spark.conf.get(k, None) for k, _ in pairs}
    for k, v in pairs:
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _live_names(c, table):
    return sorted(o.name for o in c._effective_snapshot(c.tx).live_objects(table))


def test_rename_is_metadata_only(spark, store_dir):
    """RENAME rewrites no data object: the live file set is unchanged,
    values read back under the new name, and post-rename writes land in
    files whose stored column name is the ORIGINAL physical one."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=10)
    c.new_tx()
    c.create_table("t", "id BIGINT, name STRING, score DOUBLE")
    for i in range(20):
        c.write_row("t", [i, f"n{i}", float(i)])
    c.commit_tx()

    c.new_tx()
    before = _live_names(c, "t")
    c.rename_column("t", "name", "label")
    c.commit_tx()

    c.new_tx()
    assert _live_names(c, "t") == before  # no rewrite
    assert [f.name for f in c.table_schema("t").fields] == ["id", "label", "score"]
    rows = sorted(c.scan_iter("t"))
    assert rows[5] == (5, "n5", 5.0)
    # new writes stage under the original PHYSICAL name
    for i in range(20, 25):
        c.write_row("t", [i, f"n{i}", float(i)])
    c.commit_tx()
    c.new_tx()
    import pyarrow.parquet as pq

    newest = [n for n in _live_names(c, "t") if n not in before]
    assert newest
    phys_cols = set()
    for n in newest:
        phys_cols |= set(pq.ParquetFile(c.store.path_of(n)).schema_arrow.names)
    assert "name" in phys_cols and "label" not in phys_cols
    assert sorted(c.scan_iter("t"))[24] == (24, "n24", 24.0)
    c.commit_tx()


def test_rename_time_travel_and_restore(spark, store_dir):
    """Pre-rename versions read under the OLD logical name; restore
    rolls the mapping back along with the data."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=10)
    c.new_tx()
    c.create_table("t", "k BIGINT, v STRING")
    for i in range(5):
        c.write_row("t", [i, f"v{i}"])
    c.commit_tx()
    c.new_tx()
    v_before = c.tx.snapshot.version
    c.rename_column("t", "v", "payload")
    c.commit_tx()

    old = c.scan_as_of("t", version=v_before)
    assert "v" in old.columns and "payload" not in old.columns
    assert old.filter("v = 'v3'").count() == 1
    new = DeltaLakeClient(spark, store_dir)
    new.new_tx()
    assert "payload" in [f.name for f in new.table_schema("t").fields]
    new.restore_table("t", v_before)
    new.commit_tx()
    new.new_tx()
    assert [f.name for f in new.table_schema("t").fields] == ["k", "v"]
    assert sorted(new.scan_iter("t")) == [(i, f"v{i}") for i in range(5)]
    new.commit_tx()


def test_drop_column_never_resurrects(spark, store_dir):
    """DROP retires the physical name: a later add_columns with the
    same logical name maps to a FRESH physical name, so old file data
    reads as NULL — while time travel to a pre-drop version still sees
    the original values."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=10)
    c.new_tx()
    c.create_table("t", "id BIGINT, secret STRING, keep STRING")
    for i in range(8):
        c.write_row("t", [i, f"s{i}", f"k{i}"])
    c.commit_tx()

    c.new_tx()
    v_full = c.tx.snapshot.version
    before = _live_names(c, "t")
    c.drop_column("t", "secret")
    c.commit_tx()
    c.new_tx()
    assert _live_names(c, "t") == before  # no rewrite
    assert [f.name for f in c.table_schema("t").fields] == ["id", "keep"]
    assert sorted(c.scan_iter("t"))[3] == (3, "k3")

    c.add_columns("t", "secret STRING")
    c.commit_tx()
    c.new_tx()
    rows = sorted(c.scan_iter("t"))
    assert all(r[2] is None for r in rows), f"dropped data resurrected: {rows[:3]}"
    # the physical name of the re-added column is fresh
    snap = c._effective_snapshot(c.tx)
    phys = snap.col_maps["t"]["secret"]
    assert phys != "secret" and phys in {p for p in snap.col_maps["t"].values()}
    assert "secret" in snap.retired["t"]
    # time travel still reads the pre-drop values
    old = c.scan_as_of("t", version=v_full)
    assert old.filter("secret = 's5'").count() == 1
    c.commit_tx()


def test_rename_and_drop_guards(spark, store_dir):
    c = DeltaLakeClient(spark, store_dir)
    c.new_tx()
    c.create_table(
        "t",
        "id BIGINT, fp STRING, v DOUBLE",
        primary_keys=["id"],
        bloom_columns=["fp"],
    )
    c.alter_table("t", checks={"v_pos": "v >= 0"})
    with pytest.raises(TableNotFoundError):
        c.rename_column("t", "nope", "x")
    with pytest.raises(TypeMismatchError):
        c.rename_column("t", "fp", "id")  # exists
    with pytest.raises(TypeMismatchError):
        c.rename_column("t", "fp", "_tx_id")  # stamp name
    with pytest.raises(TypeMismatchError):
        c.rename_column("t", "fp", "9bad")  # invalid identifier
    with pytest.raises(TypeMismatchError):
        c.rename_column("t", "v", "val")  # referenced by CHECK
    with pytest.raises(TypeMismatchError):
        c.drop_column("t", "v")  # referenced by CHECK
    with pytest.raises(TypeMismatchError):
        c.drop_column("t", "id")  # declared primary key
    with pytest.raises(TypeMismatchError):
        c.drop_column("t", "fp")  # declared bloom column
    # dropping the check frees both
    c.alter_table("t", checks={})
    c.rename_column("t", "v", "val")
    c.drop_column("t", "val")
    assert [f.name for f in c.table_schema("t").fields] == ["id", "fp"]
    with pytest.raises(TypeMismatchError):
        c.drop_column("t", "fp")  # still bloom-declared
    c.abort_tx()


def test_rename_declarations_follow_and_pruning_survives(spark, store_dir):
    """Bloom + stats pruning keep working across a rename: declared
    bloom columns follow the rename, the prune probe (logical, new
    name) translates to the physical stats/bloom keys in the log."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=10)
    c.new_tx()
    c.create_table("t", "k BIGINT, v STRING", bloom_columns=["k"])
    for i in range(40):
        c.write_row("t", [i, f"v{i}"])
    c.commit_tx()
    c.new_tx()
    c.rename_column("t", "k", "key")
    c.commit_tx()

    c.new_tx()
    snap = c._effective_snapshot(c.tx)
    assert snap.bloom_cols["t"] == ["key"]
    total = snap.live_files("t", c.store)
    assert len(total) == 4
    # range prune on the NEW name hits the old files' physical stats
    pruned = snap.live_files(
        "t", c.store, prune=c._prune_physical(snap, "t", {"key": (12, 14)})
    )
    assert len(pruned) == 1
    assert c.scan("t", prune={"key": (12, 14)}).filter(
        "key between 12 and 14"
    ).count() == 3
    # bloom point-lookup prune on the new name
    point = snap.live_files(
        "t", c.store, prune=c._prune_physical(snap, "t", {"key": (7, 7)})
    )
    assert len(point) == 1
    # post-rename writes keep pruning seamless (same physical key)
    for i in range(40, 50):
        c.write_row("t", [i, f"v{i}"])
    c.commit_tx()
    c.new_tx()
    snap = c._effective_snapshot(c.tx)
    assert len(snap.live_files("t", c.store)) == 5
    assert len(
        snap.live_files(
            "t", c.store, prune=c._prune_physical(snap, "t", {"key": (45, 45)})
        )
    ) == 1
    c.commit_tx()


def test_rename_bucket_column_keeps_shuffle_free_join(spark, store_dir, smj_conf):
    """Renaming the BUCKET column is metadata-only and the engine⋈engine
    join on the new name still plans no shuffle Exchange (the physical
    layout never moved; the catalog table maps physical->logical)."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=1000)
    docs = spark.createDataFrame(
        [(i, f"fp{i % 20}") for i in range(200)], "id long, fp string"
    )
    scores = spark.createDataFrame(
        [(f"fp{i}", float(i)) for i in range(20)], "fp string, score double"
    )
    c.new_tx()
    c.create_table("bd", "id bigint, fp string", bucket_by=(["fp"], 8))
    c.create_table("bs", "fp string, score double", bucket_by=(["fp"], 8))
    c.write_dataframe("bd", docs)
    c.write_dataframe("bs", scores)
    c.commit_tx()
    c.new_tx()
    c.rename_column("bd", "fp", "fingerprint")
    c.commit_tx()

    c2 = DeltaLakeClient(spark, store_dir)
    c2.new_tx()
    snap = c2._effective_snapshot(c2.tx)
    assert snap.bucket_specs["bd"]["cols"] == ["fingerprint"]
    d = c2.scan_bucketed("bd", with_stamps=False)
    s = c2.scan_bucketed("bs", with_stamps=False)
    j = d.join(s, d.fingerprint == s.fp).select("fingerprint", "id", "score")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert _no_shuffle(j), plan
    got = sorted(tuple(r) for r in j.collect())
    exp = sorted(
        tuple(r)
        for r in docs.join(scores, "fp").select("fp", "id", "score").collect()
    )
    assert got == exp
    # writes after the rename stay colocated (bucketize on the logical
    # name, hash identical to pre-rename physical layout)
    c2.write_dataframe(
        "bd",
        spark.createDataFrame(
            [(1000 + i, f"fp{i % 20}") for i in range(40)],
            "id long, fingerprint string",
        ),
    )
    c2.commit_tx()
    c3 = DeltaLakeClient(spark, store_dir)
    c3.new_tx()
    d3 = c3.scan_bucketed("bd", with_stamps=False)
    assert _no_shuffle(d3.groupBy("fingerprint").count())
    assert d3.count() == 240
    c3.commit_tx()


def test_mutations_across_rename(spark, store_dir):
    """COW delete, DV delete, update_rows and compact all operate on the
    renamed (logical) column and land physically-consistent files."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=10)
    c.new_tx()
    c.create_table("t", "k BIGINT, v DOUBLE")
    for i in range(40):
        c.write_row("t", [i, float(i)])
    c.commit_tx()
    c.new_tx()
    c.rename_column("t", "k", "key")
    c.commit_tx()

    live = set(range(40))
    c.new_tx()
    c.delete_rows("t", "key", 0, 4)  # COW (driver fast path)
    c.commit_tx()
    live -= set(range(5))
    c.new_tx()
    assert sorted(r[0] for r in c.scan_iter("t")) == sorted(live)
    c.delete_rows("t", "key", 10, 12, use_dv=True)  # DV path
    c.commit_tx()
    live -= {10, 11, 12}
    c.new_tx()
    assert sorted(r[0] for r in c.scan_iter("t")) == sorted(live)
    c.update_rows("t", "key", 20, 22, {"v": F.lit(-1.0)})
    c.commit_tx()
    c.new_tx()
    assert c.scan("t").filter("v = -1.0").count() == 3
    c.compact("t", target_files=1)
    c.commit_tx()
    c.new_tx()
    assert sorted(r[0] for r in c.scan_iter("t")) == sorted(live)
    assert c.scan("t").filter("v = -1.0").count() == 3
    c.commit_tx()


def test_checkpoint_replay_and_clone_preserve_mapping(spark, store_dir):
    c = DeltaLakeClient(spark, store_dir, dataobject_size=10, checkpoint_interval=2)
    c.new_tx()
    c.create_table("t", "a BIGINT, b STRING")
    for i in range(10):
        c.write_row("t", [i, f"b{i}"])
    c.commit_tx()
    c.new_tx()
    c.rename_column("t", "b", "label")
    c.commit_tx()
    c.new_tx()  # trigger a checkpoint past the mapping change
    c.write_row("t", [100, "b100"])
    c.commit_tx()

    c2 = DeltaLakeClient(spark, store_dir)  # replays through checkpoint
    c2.new_tx()
    assert [f.name for f in c2.table_schema("t").fields] == ["a", "label"]
    assert sorted(c2.scan_iter("t"))[-1] == (100, "b100")
    c2.clone_table("t", "t_clone")
    c2.commit_tx()
    c2.new_tx()
    snap = c2._effective_snapshot(c2.tx)
    assert snap.col_maps.get("t_clone", {}).get("label") == "b"
    assert sorted(c2.scan_iter("t_clone")) == sorted(c2.scan_iter("t"))
    c2.commit_tx()


def test_scan_changes_across_rename(spark, store_dir):
    """The change feed reports rows in the TO-version logical shape even
    when the window spans a rename (old files read under the new map)."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=10)
    c.new_tx()
    c.create_table("t", "k BIGINT, v STRING")
    for i in range(5):
        c.write_row("t", [i, f"v{i}"])
    c.commit_tx()
    c.new_tx()
    v0 = c.tx.snapshot.version
    c.rename_column("t", "v", "val")
    c.commit_tx()
    c.new_tx()
    for i in range(5, 8):
        c.write_row("t", [i, f"v{i}"])
    c.delete_rows("t", "k", 0, 0)
    c.commit_tx()

    feed = c.scan_changes("t", from_version=v0)
    assert "val" in feed.columns and "v" not in feed.columns
    got = sorted(
        (r["k"], r["val"], r["_change_type"]) for r in feed.collect()
    )
    assert got == [
        (0, "v0", "delete"),
        (5, "v5", "insert"),
        (6, "v6", "insert"),
        (7, "v7", "insert"),
    ]


def test_widen_column_metadata_only_mixed_files(spark, store_dir):
    """Type widening rewrites nothing: narrow files stay on disk and
    read under the widened schema; post-widen writes land physically
    wide (values beyond int32 range) and the two coexist in one scan."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=10)
    c.new_tx()
    c.create_table("t", "k INT, v FLOAT, s STRING")
    for i in range(20):
        c.write_row("t", [i, float(i) / 2, f"s{i}"])
    c.commit_tx()

    c.new_tx()
    before = _live_names(c, "t")
    c.widen_column("t", "k", "bigint")
    c.widen_column("t", "v", "double")
    c.commit_tx()
    c.new_tx()
    assert _live_names(c, "t") == before  # no rewrite
    sch = {f.name: f.dataType.simpleString() for f in c.table_schema("t").fields}
    assert sch == {"k": "bigint", "v": "double", "s": "string"}
    rows = sorted(c.scan_iter("t"))
    assert rows[4] == (4, 2.0, "s4")
    # a value only the widened type can hold
    big = 2**40
    c.write_row("t", [big, 1e300, "wide"])
    c.commit_tx()
    c.new_tx()
    rows = sorted(c.scan_iter("t"))
    assert rows[-1] == (big, 1e300, "wide")
    assert len(rows) == 21
    # fresh-client replay sees the widened schema over mixed files
    c2 = DeltaLakeClient(spark, store_dir)
    c2.new_tx()
    assert sorted(c2.scan_iter("t")) == rows
    c2.commit_tx()
    c.commit_tx()


def test_widen_guards(spark, store_dir):
    c = DeltaLakeClient(spark, store_dir)
    c.new_tx()
    c.create_table(
        "t", "k INT, b BIGINT, f DOUBLE, s STRING, fp STRING",
        bucket_by=(["fp"], 4),
    )
    c.create_table("tb", "k INT, fp STRING", bucket_by=(["k"], 4))
    with pytest.raises(TableNotFoundError):
        c.widen_column("t", "nope", "bigint")
    with pytest.raises(TypeMismatchError, match="already"):
        c.widen_column("t", "b", "bigint")
    with pytest.raises(TypeMismatchError, match="not a value-preserving"):
        c.widen_column("t", "b", "int")  # narrowing
    with pytest.raises(TypeMismatchError, match="not a value-preserving"):
        c.widen_column("t", "b", "double")  # lossy (2^53)
    with pytest.raises(TypeMismatchError, match="not a value-preserving"):
        c.widen_column("t", "s", "bigint")  # non-numeric
    with pytest.raises(TypeMismatchError, match="not a value-preserving"):
        c.widen_column("t", "k", "float")  # lossy above 2^24
    with pytest.raises(TypeMismatchError, match="bucket column"):
        c.widen_column("tb", "k", "bigint")  # murmur3 width trap
    c.widen_column("t", "k", "bigint")  # non-bucket column of a bucketed table
    c.abort_tx()


def test_widen_pruning_and_cow_across_mixed_widths(spark, store_dir):
    """Stats pruning and the COW delete (driver pyarrow fast path)
    work over narrow files probed through the widened logical type."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=10)
    c.new_tx()
    c.create_table("t", "k INT, v STRING")
    for i in range(40):
        c.write_row("t", [i, f"v{i}"])
    c.commit_tx()
    c.new_tx()
    c.widen_column("t", "k", "bigint")
    c.commit_tx()

    c.new_tx()
    snap = c._effective_snapshot(c.tx)
    assert len(snap.live_files("t", c.store)) == 4
    # int-footer stats pruned through a (python int) wide-type probe
    assert len(snap.live_files("t", c.store, prune={"k": (12, 14)})) == 1
    c.delete_rows("t", "k", 12, 14)  # COW over int32 files
    c.commit_tx()
    c.new_tx()
    assert sorted(r[0] for r in c.scan_iter("t")) == [
        i for i in range(40) if not 12 <= i <= 14
    ]
    c.commit_tx()


def test_widen_time_travel_restore_and_rename_interplay(spark, store_dir):
    c = DeltaLakeClient(spark, store_dir, dataobject_size=10, checkpoint_interval=2)
    c.new_tx()
    c.create_table("t", "k INT, v STRING")
    for i in range(5):
        c.write_row("t", [i, f"v{i}"])
    c.commit_tx()
    c.new_tx()
    v_narrow = c.tx.snapshot.version
    c.rename_column("t", "k", "key")
    c.widen_column("t", "key", "bigint")
    c.commit_tx()
    c.new_tx()
    c.write_row("t", [2**40, "wide"])
    c.commit_tx()

    # time travel: narrow type AND old name
    old = c.scan_as_of("t", version=v_narrow)
    assert {f.name: f.dataType.simpleString() for f in old.schema.fields if
            f.name == "k"} == {"k": "int"}
    # checkpoint replay keeps the widened shape
    c2 = DeltaLakeClient(spark, store_dir)
    c2.new_tx()
    sch = {f.name: f.dataType.simpleString() for f in c2.table_schema("t").fields}
    assert sch == {"key": "bigint", "v": "string"}
    assert sorted(c2.scan_iter("t"))[-1] == (2**40, "wide")
    # restore: type, name and file set roll back together — the wide
    # file retires with its version, so the narrow schema never reads it
    c2.restore_table("t", v_narrow)
    c2.commit_tx()
    c2.new_tx()
    sch = {f.name: f.dataType.simpleString() for f in c2.table_schema("t").fields}
    assert sch == {"k": "int", "v": "string"}
    assert sorted(c2.scan_iter("t")) == [(i, f"v{i}") for i in range(5)]
    c2.commit_tx()


def test_widen_bucketed_table_nonbucket_column(spark, store_dir, smj_conf):
    """Widening a non-bucket column preserves the shuffle-free bucketed
    scan over mixed-width files."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=1000)
    c.new_tx()
    c.create_table("t", "id INT, fp STRING", bucket_by=(["fp"], 4))
    c.write_dataframe(
        "t",
        spark.createDataFrame(
            [(i, f"fp{i % 10}") for i in range(100)], "id int, fp string"
        ),
    )
    c.commit_tx()
    c.new_tx()
    c.widen_column("t", "id", "bigint")
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t",
        spark.createDataFrame([(2**40, "fp1")], "id long, fp string"),
    )
    c.commit_tx()
    c2 = DeltaLakeClient(spark, store_dir)
    c2.new_tx()
    d = c2.scan_bucketed("t", with_stamps=False)
    agg = d.groupBy("fp").count()
    assert _no_shuffle(agg)
    assert d.count() == 101
    assert d.filter(F.col("id") == 2**40).count() == 1
    c2.commit_tx()


def test_rename_with_buffered_rows_same_tx(spark, store_dir):
    """Buffered (unflushed) rows written before an in-tx rename flush
    correctly under the new mapping; drop removes their value."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=100)
    c.new_tx()
    c.create_table("t", "a BIGINT, b STRING, c DOUBLE")
    c.write_row("t", [1, "x", 1.5])
    c.rename_column("t", "b", "bb")
    c.write_row("t", [2, "y", 2.5])
    c.drop_column("t", "c")
    c.write_row("t", [3, "z"])
    c.commit_tx()
    c.new_tx()
    assert sorted(c.scan_iter("t")) == [(1, "x"), (2, "y"), (3, "z")]
    c.commit_tx()


def test_add_column_default_existing_rows(spark, store_dir):
    """existingDefault: rows stamped before the column's birth read the
    default wherever NULL; post-birth rows read stored values, explicit
    NULL included. The substitution survives COW deletes (which must
    take the distributed path on defaulted predicate columns), compact
    (which materializes the value), and fresh-client replay."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=10)
    c.new_tx()
    c.create_table("t", "k BIGINT, v STRING")
    for i in range(20):
        c.write_row("t", [i, f"v{i}"])
    c.commit_tx()

    c.new_tx()
    c.add_columns("t", "score DOUBLE DEFAULT 2.5, tag STRING DEFAULT 'none'")
    c.commit_tx()
    c.new_tx()
    c.write_row("t", [100, "new", 9.0, "real"])
    c.write_row("t", [101, "new2", None, None])  # explicit NULL, post-birth
    c.commit_tx()

    c.new_tx()
    rows = {r[0]: (r[2], r[3]) for r in c.scan_iter("t")}
    assert rows[5] == (2.5, "none")      # pre-birth -> default
    assert rows[100] == (9.0, "real")    # post-birth explicit
    assert rows[101] == (None, None)     # post-birth NULL stays NULL
    # range delete on the defaulted column hits pre-birth rows too
    c.delete_rows("t", "score", 2.0, 3.0)
    c.commit_tx()
    c.new_tx()
    ks = sorted(r[0] for r in c.scan_iter("t"))
    assert ks == [100, 101], ks  # every pre-birth row read 2.5 and died
    c.compact("t", target_files=1)
    c.commit_tx()
    c2 = DeltaLakeClient(spark, store_dir)
    c2.new_tx()
    rows = {r[0]: (r[2], r[3]) for r in c2.scan_iter("t")}
    assert rows == {100: (9.0, "real"), 101: (None, None)}
    c2.commit_tx()


def test_default_rename_drop_restore_clone_interplay(spark, store_dir):
    c = DeltaLakeClient(spark, store_dir, dataobject_size=10, checkpoint_interval=2)
    c.new_tx()
    c.create_table("t", "k BIGINT")
    for i in range(5):
        c.write_row("t", [i])
    c.commit_tx()
    c.new_tx()
    v_plain = c.tx.snapshot.version
    c.execute("ALTER TABLE t ADD COLUMNS (lang STRING DEFAULT 'en')")
    c.commit_tx()

    c.new_tx()
    assert {r[1] for r in c.scan_iter("t")} == {"en"}
    # rename: the default follows the logical name
    c.rename_column("t", "lang", "language")
    c.commit_tx()
    c.new_tx()
    assert {r[1] for r in c.scan_iter("t")} == {"en"}
    snap = c._effective_snapshot(c.tx)
    assert snap.defaults["t"]["language"]["v"] == "en"
    assert "lang" not in snap.defaults["t"]
    # clone carries the default (checkpoint crossed: interval=2)
    c.clone_table("t", "t2")
    c.commit_tx()
    c2 = DeltaLakeClient(spark, store_dir)
    c2.new_tx()
    assert {r[1] for r in c2.scan_iter("t2")} == {"en"}
    # drop removes the default; re-add without one reads NULL
    c2.drop_column("t", "language")
    c2.add_columns("t", "language STRING")
    c2.commit_tx()
    c2.new_tx()
    assert {r[1] for r in c2.scan_iter("t")} == {None}
    # restore to the pre-default version: column and default both gone
    c2.restore_table("t", v_plain)
    c2.commit_tx()
    c2.new_tx()
    assert [f.name for f in c2.table_schema("t").fields] == ["k"]
    assert c2._effective_snapshot(c2.tx).defaults.get("t", {}) == {}
    c2.commit_tx()


def test_default_guards_and_literal_forms(spark, store_dir):
    c = DeltaLakeClient(spark, store_dir)
    c.new_tx()
    c.create_table("t", "k BIGINT")
    c.write_row("t", [1])
    c.commit_tx()  # defaults apply to rows stamped BEFORE the add tx
    c.new_tx()
    with pytest.raises(TypeMismatchError, match="DEFAULT"):
        c.add_columns("t", "x DOUBLE DEFAULT 'nope'")
    with pytest.raises(TypeMismatchError, match="DEFAULT"):
        c.add_columns("t", "s STRING DEFAULT 3")
    with pytest.raises(TypeMismatchError, match="DEFAULT"):
        c.add_columns("t", "b BOOLEAN DEFAULT 1")
    c.add_columns(
        "t",
        "x DOUBLE DEFAULT -1.5, n BIGINT DEFAULT 42, b BOOLEAN DEFAULT TRUE,"
        " s STRING DEFAULT 'a,''b'''",
    )
    c.commit_tx()
    c.new_tx()
    row = next(iter(c.scan_iter("t")))
    assert row == (1, -1.5, 42, True, "a,'b'")
    c.commit_tx()


def test_default_value_range_validated_at_declaration(spark, store_dir):
    """Review catch: an out-of-range or non-integral default committed
    fine and then poisoned EVERY read of the table at the lit-cast
    (ANSI CAST_OVERFLOW). Value-level validation now rejects it at
    declaration time."""
    c = DeltaLakeClient(spark, store_dir)
    c.new_tx()
    c.create_table("t", "k BIGINT")
    c.write_row("t", [1])
    c.commit_tx()
    c.new_tx()
    with pytest.raises(TypeMismatchError, match="DEFAULT"):
        c.add_columns("t", "c TINYINT DEFAULT 1000")  # overflows int8
    with pytest.raises(TypeMismatchError, match="DEFAULT"):
        c.add_columns("t", "c INT DEFAULT 2.5")  # non-integral
    with pytest.raises(TypeMismatchError, match="DEFAULT"):
        c.add_columns("t", f"c BIGINT DEFAULT {2**63}")  # > int64
    c.add_columns("t", "c TINYINT DEFAULT 100")
    c.commit_tx()
    c.new_tx()
    assert next(iter(c.scan_iter("t")))[1] == 100
    c.commit_tx()


def test_rename_to_reserved_internal_names_blocked(spark, store_dir):
    """Review catch: renaming a column to __obj/__ridx/__dv_obj/
    __dv_ridx/_metadata broke every positional read (with_pos select
    collision / pseudo-column shadowing) AFTER commit. Blocked now,
    for rename and add_columns both."""
    c = DeltaLakeClient(spark, store_dir)
    c.new_tx()
    c.create_table("t", "a BIGINT, b STRING")
    for bad in ("__obj", "__ridx", "__dv_obj", "__dv_ridx", "_metadata"):
        with pytest.raises(TypeMismatchError, match="reserved"):
            c.rename_column("t", "b", bad)
        with pytest.raises(TypeMismatchError, match="reserved"):
            c.add_columns("t", f"{bad} STRING")
    c.abort_tx()


def test_bloom_build_on_pre_evolution_rewrite(spark, store_dir):
    """Review catch: a driver-side COW rewrite of a file that predates
    a later-declared bloom column crashed in _build_blooms (pyarrow
    'No match for FieldRef') — the rewrite copies the OLD physical
    schema. The bloom build now intersects with the file's schema."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=10)
    c.new_tx()
    c.create_table("t", "k BIGINT, v STRING")
    for i in range(10):
        c.write_row("t", [i, f"v{i}"])
    c.commit_tx()
    c.new_tx()
    c.add_columns("t", "u BIGINT")
    c.alter_table("t", bloom_columns=["u"])
    c.commit_tx()
    c.new_tx()
    c.delete_rows("t", "k", 2, 3)  # small: driver COW fast path
    c.commit_tx()
    c.new_tx()
    assert sorted(r[0] for r in c.scan_iter("t")) == [0, 1, 4, 5, 6, 7, 8, 9]
    # new writes (which HAVE the column) still build the bloom
    for i in range(100, 110):
        c.write_row("t", [i, f"v{i}", i * 10])
    c.commit_tx()
    c.new_tx()
    snap = c._effective_snapshot(c.tx)
    assert any("u" in (o.blooms or {}) for o in snap.live_objects("t"))
    c.commit_tx()


def test_merge_schema_auto_widens(spark, store_dir):
    """mergeSchema-on-write widens, not truncates: a frame column
    arriving wider than the table's type (int ids outgrowing int32 —
    crawl-dump schema drift) promotes the table when the widening is
    value-preserving; incompatible or bucket columns keep the old
    cast behavior."""
    c = DeltaLakeClient(spark, store_dir, dataobject_size=100)
    c.new_tx()
    c.create_table("t", "k INT, v FLOAT")
    c.write_row("t", [1, 1.5])
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t",
        spark.createDataFrame(
            [(2**40, 2.5, "x")], "k BIGINT, v DOUBLE, tag STRING"
        ),
        merge_schema=True,
    )
    c.commit_tx()
    c.new_tx()
    sch = {f.name: f.dataType.simpleString() for f in c.table_schema("t").fields}
    assert sch == {"k": "bigint", "v": "double", "tag": "string"}
    rows = sorted(c.scan_iter("t"))
    assert rows[0] == (1, 1.5, None) and rows[1][0] == 2**40
    # bucket columns never auto-widen (the hash layout pins the width)
    c.create_table("b", "k INT, fp STRING", bucket_by=(["k"], 4))
    c.write_dataframe(
        "b",
        spark.createDataFrame([(5, "a")], "k BIGINT, fp STRING"),
        merge_schema=True,
    )
    assert {f.name: f.dataType.simpleString() for f in c.table_schema("b").fields}[
        "k"
    ] == "int"
    c.commit_tx()


def test_evolution_vs_concurrent_writer_occ(spark, store_dir):
    """First-committer-wins applies to schema evolution like any other
    same-table commit: a writer racing a committed RENAME conflicts,
    and its retry on a fresh snapshot lands under the evolved schema
    (same row width). Racing a committed DROP, the stale-width retry
    fails LOUDLY instead of silently misplacing values."""
    from delta_lake_experiment_spark import ConcurrentCommitError

    a = DeltaLakeClient(spark, store_dir, dataobject_size=100)
    b = DeltaLakeClient(spark, store_dir, dataobject_size=100)
    a.new_tx()
    a.create_table("t", "k BIGINT, v STRING")
    a.write_row("t", [1, "x"])
    a.commit_tx()

    # writer A opens first; B renames and wins the race
    a.new_tx()
    a.write_row("t", [2, "y"])
    b.new_tx()
    b.rename_column("t", "v", "label")
    b.commit_tx()
    with pytest.raises(ConcurrentCommitError):
        a.commit_tx()
    a.new_tx()  # fresh snapshot: same width, new logical name
    a.write_row("t", [2, "y"])
    a.commit_tx()
    a.new_tx()
    assert sorted(a.scan_iter("t")) == [(1, "x"), (2, "y")]
    assert [f.name for f in a.table_schema("t").fields] == ["k", "label"]
    a.commit_tx()

    # B drops the column; A's stale-width retry must fail loudly
    a.new_tx()
    a.write_row("t", [3, "z"])
    b.new_tx()
    b.drop_column("t", "label")
    b.commit_tx()
    with pytest.raises(ConcurrentCommitError):
        a.commit_tx()
    a.new_tx()
    with pytest.raises(TypeMismatchError, match="2 values"):
        a.write_row("t", [3, "z"])
    a.write_row("t", [3])
    a.commit_tx()
    a.new_tx()
    assert sorted(a.scan_iter("t")) == [(1,), (2,), (3,)]
    a.commit_tx()
