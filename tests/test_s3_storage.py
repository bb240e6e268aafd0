"""S3ObjectStorage: conditional-PUT OCC semantics against a faithful
in-memory S3 API double (this container has no S3 endpoint / boto3).

The double models the behaviors the backend depends on: PutObject
``IfNoneMatch="*"`` → HTTP 412 on existing keys, ListObjectsV2
ascending-key pagination, GetObject streaming bodies.
"""

import io

import pytest

from delta_lake_experiment_spark.client import DeltaLakeClient
from delta_lake_experiment_spark.errors import ConcurrentCommitError, ObjectExistsError
from delta_lake_experiment_spark.plans.snapshot import replay_log
from delta_lake_experiment_spark.storage.s3 import S3ObjectStorage


class _ApiError(Exception):
    """Shape-compatible with botocore.exceptions.ClientError."""

    def __init__(self, status, code):
        super().__init__(code)
        self.response = {
            "ResponseMetadata": {"HTTPStatusCode": status},
            "Error": {"Code": code},
        }


class FakeS3Client:
    def __init__(self, page_size=2):
        self.objects = {}  # key -> bytes
        self.page_size = page_size  # tiny pages to exercise pagination
        self.put_keys = []  # every key written via PutObject (driver bytes)
        self.copy_keys = []  # every key written via server-side CopyObject

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        if IfNoneMatch is None:
            # unconditional writes are legal ONLY for the advisory
            # _last_checkpoint pointer; everything else must stay
            # behind the conditional-PUT OCC gate
            assert Key.endswith("_last_checkpoint"), (
                "engine must write conditionally except the advisory pointer"
            )
            self.objects[Key] = bytes(Body)
            self.put_keys.append(Key)
            return {"ETag": '"fake"'}
        assert IfNoneMatch == "*", "engine must always write conditionally"
        if Key in self.objects:
            raise _ApiError(412, "PreconditionFailed")
        self.objects[Key] = bytes(Body)
        self.put_keys.append(Key)
        return {"ETag": '"fake"'}

    def copy_object(self, Bucket, Key, CopySource):
        src = CopySource["Key"]
        if src not in self.objects:
            raise _ApiError(404, "NoSuchKey")
        self.objects[Key] = self.objects[src]
        self.copy_keys.append(Key)
        return {"CopyObjectResult": {"ETag": '"fake"'}}

    def get_object(self, Bucket, Key):
        if Key not in self.objects:
            raise _ApiError(404, "NoSuchKey")
        return {"Body": io.BytesIO(self.objects[Key])}

    def list_objects_v2(
        self, Bucket, Prefix="", ContinuationToken=None, StartAfter=None
    ):
        keys = sorted(
            k
            for k in self.objects
            if k.startswith(Prefix) and (StartAfter is None or k > StartAfter)
        )
        start = int(ContinuationToken) if ContinuationToken else 0
        page = keys[start : start + self.page_size]
        truncated = start + self.page_size < len(keys)
        resp = {
            "Contents": [
                {"Key": k, "Size": len(self.objects[k])} for k in page
            ],
            "IsTruncated": truncated,
        }
        if truncated:
            resp["NextContinuationToken"] = str(start + self.page_size)
        return resp

    def delete_object(self, Bucket, Key):
        self.objects.pop(Key, None)


@pytest.fixture
def s3_store():
    return S3ObjectStorage("lake", prefix="tables/t1", client=FakeS3Client())


def test_conditional_put_is_the_occ_gate(s3_store):
    s3_store.put_if_absent("_log_00000000000000000001", b"a")
    with pytest.raises(ObjectExistsError):
        s3_store.put_if_absent("_log_00000000000000000001", b"b")
    # 409 (in-flight conditional-write race) maps the same way
    def racing_put(**kwargs):
        raise _ApiError(409, "ConditionalRequestConflict")

    s3_store.client.put_object = racing_put
    with pytest.raises(ObjectExistsError):
        s3_store.put_if_absent("_log_00000000000000000002", b"c")


def test_list_paginates_and_strips_prefix(s3_store):
    for i in range(5):
        s3_store.put_if_absent(f"_log_{i:020d}", b"x")
    s3_store.put_if_absent("table_t_abc.parquet", b"y")
    logs = s3_store.list_prefix_ordered("_log_")
    assert logs == [f"_log_{i:020d}" for i in range(5)]  # paged (size 2)
    assert s3_store.read("_log_" + "0" * 19 + "3") == b"x"


def test_path_of_is_a_spark_uri(s3_store):
    assert s3_store.path_of("table_t_abc.parquet") == (
        "s3a://lake/tables/t1/table_t_abc.parquet"
    )
    with pytest.raises(ValueError):
        s3_store.path_of("../escape")


class _LocalSyncedStaging:
    """Test double for the S3A leg of remote staging: Spark writes to a
    local dir; list_staged() first absorbs those files into the fake
    bucket under the staging keys (exactly what the executors' S3A
    writes would have done), then the PRODUCTION list/publish/discard
    code runs against the fake S3 API."""

    def __init__(self, store, local_dir):
        from delta_lake_experiment_spark.storage.s3 import S3RemoteStaging

        self._inner = S3RemoteStaging(store)
        self.local_dir = local_dir
        self.uri = local_dir  # Spark's write target
        self.key_prefix = self._inner.key_prefix

    def list_staged(self):
        import os

        for fn in sorted(os.listdir(self.local_dir)):
            p = os.path.join(self.local_dir, fn)
            if os.path.isfile(p):
                with open(p, "rb") as f:
                    self._inner.store.client.objects[self.key_prefix + fn] = f.read()
        return self._inner.list_staged()

    def staged_sizes(self):
        # production code path: exercised so the per-object size lane
        # (AddDataObject.size from the S3 listing) is tested end to end
        return self._inner.staged_sizes()

    def publish(self, staged_key, dest_name):
        self._inner.publish(staged_key, dest_name)

    def discard(self):
        import shutil

        self._inner.discard()
        shutil.rmtree(self.local_dir, ignore_errors=True)


class _TestS3Storage(S3ObjectStorage):
    def begin_remote_staging(self):
        import tempfile

        return _LocalSyncedStaging(self, tempfile.mkdtemp(prefix="fake_s3_staging_"))


def test_bulk_ingest_never_moves_data_through_the_driver(spark):
    """write_dataframe on an S3 store: staged files publish via
    server-side copy_object; no PutObject ever carries data-object
    bytes; distributed stats + blooms land in the add actions; staging
    keys are cleaned up."""
    from delta_lake_experiment_spark.plans.snapshot import replay_log as _replay

    api = FakeS3Client(page_size=3)
    store = _TestS3Storage("lake", prefix="tables/t1", client=api)
    c = DeltaLakeClient(spark, store)
    c.new_tx()
    c.create_table("t", "k BIGINT, v STRING", bloom_columns=["k"])
    df = spark.range(100).selectExpr("id AS k", "CAST(id AS STRING) AS v").repartition(4)
    c.write_dataframe("t", df)
    c.commit_tx()

    assert [k for k in api.put_keys if "table_t_" in k] == []  # no driver bytes
    assert any("table_t_" in k for k in api.copy_keys)  # server-side publish
    assert not [k for k in api.objects if "/.tmp/" in k]  # staging reclaimed

    snap = _replay(store)
    objs = snap.live_objects("t")
    assert len(objs) == 4 and sum(o.num_rows for o in objs) == 100
    assert all(o.stats.get("k") and o.blooms.get("k") for o in objs)
    # per-object sizes come from the staging LISTING (no HEAD storm)
    # and match the published bytes exactly
    for o in objs:
        assert o.size == len(store.read(o.name)), (o.name, o.size)
    # distributed-built blooms prune a point lookup (min/max can't:
    # repartition scatters keys across all four files)
    assert len(snap.live_files("t", store, prune={"k": (7, 7)})) < 4


def test_read_store_parquet_fetches_bytes_on_remote_stores(spark, s3_store, tmp_path):
    """Driver pyarrow fast paths must not hand s3a:// URIs to pyarrow —
    on stores without a local root they read via the storage API."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = tmp_path / "obj.parquet"
    pq.write_table(pa.table({"obj": ["a", "a", "b"], "row_idx": [0, 1, 2]}), p)
    s3_store.put_file_if_absent("dv_t_1.parquet", str(p))
    c = DeltaLakeClient(spark, s3_store)
    t = c._read_store_parquet("dv_t_1.parquet", columns=["obj"])
    assert t["obj"].to_pylist() == ["a", "a", "b"]


class _MirroredS3Client(FakeS3Client):
    """FakeS3 whose bucket contents are mirrored to local files — a
    stand-in for what the S3A connector would serve executors on a real
    cluster, so Spark can actually read the fake bucket. ALL metadata
    traffic (conditional puts, server-side copies, paginated lists)
    still runs through the production S3 client calls."""

    def __init__(self, mirror_root, page_size=2):
        super().__init__(page_size)
        self.mirror_root = mirror_root

    def _sync(self, key):
        import os

        p = os.path.join(self.mirror_root, key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(self.objects[key])

    def put_object(self, **kw):
        r = super().put_object(**kw)
        self._sync(kw["Key"])
        return r

    def copy_object(self, **kw):
        r = super().copy_object(**kw)
        self._sync(kw["Key"])
        return r

    def delete_object(self, Bucket, Key):
        import os

        super().delete_object(Bucket, Key)
        p = os.path.join(self.mirror_root, Key)
        if os.path.exists(p):
            os.unlink(p)


class _SparkReadableS3Storage(_TestS3Storage):
    """path_of / scan-area URIs point at the local mirror (what s3a://
    URIs resolve to on a real cluster); every other code path is the
    production S3 backend against the fake API."""

    def path_of(self, name):
        import os

        return os.path.join(self.client.mirror_root, self._key(name))

    def begin_bucket_scan_area(self):
        import os

        area = super().begin_bucket_scan_area()
        area.uri = os.path.join(self.client.mirror_root, area.key_prefix)
        return area


def test_scan_bucketed_on_remote_store(spark, tmp_path):
    """VERDICT r7 item 2: the shuffle-free bucketed engine⋈engine join
    must work on the S3 backend. The scan area is a key prefix of
    server-side CopyObject copies (no PutObject ever carries data-object
    bytes), the no-Exchange SortMergeJoin plan holds, values equal the
    plain scan, and a superseding registration reclaims the old keys."""
    api = _MirroredS3Client(str(tmp_path / "mirror"), page_size=3)
    store = _SparkReadableS3Storage("lake", prefix="tables/t1", client=api)
    c = DeltaLakeClient(spark, store, dataobject_size=1000)
    c.new_tx()
    c.create_table("bd", "id bigint, fp string", bucket_by=(["fp"], 4))
    c.create_table("bs", "fp string, score double", bucket_by=(["fp"], 4))
    docs = spark.createDataFrame(
        [(i, f"fp{i % 12}") for i in range(120)], "id long, fp string"
    )
    dims = spark.createDataFrame(
        [(f"fp{i}", float(i)) for i in range(12)], "fp string, score double"
    )
    c.write_dataframe("bd", docs)
    c.write_dataframe("bs", dims)
    c.commit_tx()

    pairs = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.enabled", "false"),
    ]
    old = {k: spark.conf.get(k, None) for k, _ in pairs}
    for k, v in pairs:
        spark.conf.set(k, v)
    try:
        # fresh client: layout must survive commit + log replay over S3
        c2 = DeltaLakeClient(spark, store)
        c2.new_tx()
        puts_before = [k for k in api.put_keys if "bucketscan_" in k]
        d = c2.scan_bucketed("bd", with_stamps=False)
        s = c2.scan_bucketed("bs", with_stamps=False)
        # scan copies are server-side only: CopyObject yes, PutObject no
        assert [k for k in api.put_keys if "bucketscan_" in k] == puts_before
        assert any("bucketscan_" in k for k in api.copy_keys)
        j = d.join(s, "fp")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan.replace("BroadcastExchange", "BX"), plan
        got = sorted(tuple(r) for r in j.select("fp", "id", "score").collect())
        exp = sorted(
            tuple(r)
            for r in c2.scan("bd", with_stamps=False)
            .join(c2.scan("bs", with_stamps=False), "fp")
            .select("fp", "id", "score")
            .collect()
        )
        assert got == exp and len(got) == 120
        # superseding registration reclaims the previous area's keys
        first_area_keys = {k for k in api.objects if "bucketscan_" in k}
        c2.scan_bucketed("bd", with_stamps=False)
        remaining = {k for k in api.objects if "bucketscan_" in k}
        assert first_area_keys - remaining  # old bd area deleted
        c2.commit_tx()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_commit_protocol_over_s3(spark, s3_store):
    """Two clients share a bucket; the full metadata layer (log replay,
    checkpoint, first-committer-wins) runs unchanged over the S3 API."""
    a = DeltaLakeClient(spark, s3_store)
    b = DeltaLakeClient(spark, s3_store)
    a.new_tx()
    b.new_tx()  # same snapshot, same next version
    a.create_table("ta", "k BIGINT")
    b.create_table("tb", "k BIGINT")
    a.commit_tx()
    # coarse whole-log conflict (reference parity) is still available
    with pytest.raises(ConcurrentCommitError):
        b.commit_tx(retry_independent=0)
    # default commit resolves disjoint-table collisions automatically
    b.new_tx()
    b.create_table("tb", "k BIGINT")
    b.commit_tx()
    snap = replay_log(s3_store)
    assert set(snap.tables) == {"ta", "tb"}
    assert snap.version == 2


def test_schema_evolution_on_remote_store(spark, tmp_path):
    """The O(1)-metadata schema evolution lane (rename / widen /
    DEFAULT add / COW delete across the evolved schema) works on the
    S3 backend end-to-end: metadata rides the conditional-PUT log,
    staged rewrites carry physical names through the remote staging
    area, and a fresh client replays the full evolution history."""
    api = _MirroredS3Client(str(tmp_path / "mirror_ev"), page_size=3)
    store = _SparkReadableS3Storage("lake", prefix="tables/ev", client=api)
    c = DeltaLakeClient(spark, store, dataobject_size=1000)
    c.new_tx()
    c.create_table("t", "k INT, name STRING")
    c.write_dataframe(
        "t",
        spark.createDataFrame(
            [(i, f"n{i}") for i in range(30)], "k INT, name STRING"
        ),
    )
    c.commit_tx()

    c.new_tx()
    c.rename_column("t", "name", "label")
    c.widen_column("t", "k", "bigint")
    c.commit_tx()
    c.new_tx()
    c.add_columns("t", "score DOUBLE DEFAULT 1.5")
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t",
        spark.createDataFrame(
            [(2**40, "wide", 9.0)], "k BIGINT, label STRING, score DOUBLE"
        ),
    )
    c.commit_tx()

    c.new_tx()
    rows = {r[0]: (r[1], r[2]) for r in c.scan_iter("t")}
    assert rows[5] == ("n5", 1.5)        # pre-birth default over narrow file
    assert rows[2**40] == ("wide", 9.0)  # wide post-evolution file
    # COW delete on the widened key across mixed-width remote files
    c.delete_rows("t", "k", 10, 19)
    c.commit_tx()

    c2 = DeltaLakeClient(spark, store)
    c2.new_tx()
    assert [f.name for f in c2.table_schema("t").fields] == ["k", "label", "score"]
    ks = sorted(r[0] for r in c2.scan_iter("t"))
    assert ks == [i for i in range(30) if not 10 <= i <= 19] + [2**40]
    assert {r[2] for r in c2.scan_iter("t") if r[0] < 30} == {1.5}
    c2.commit_tx()
    # BULK ingests published via server-side copy (no driver bytes);
    # the small COW rewrite legitimately took the driver fast path
    assert [k for k in api.copy_keys if "table_t_" in k]


@pytest.mark.slow
def test_engine_stream_source_on_remote_store(spark, tmp_path):
    """The streaming source over the S3 backend: planning runs against
    the remote store through a registered store FACTORY (options are
    strings-only; the store object never leaves the driver), executors
    read the partition paths (the mirror — what s3a:// URIs resolve to
    on a real cluster). Snapshot batch == batch scan, resumed tail
    reads only the new commit, and the change feed streams a COW
    delete's net rows — all against the fake S3 API's conditional
    puts/lists."""
    from pyspark.sql import functions as F

    api = _MirroredS3Client(str(tmp_path / "mirror_src"), page_size=3)
    store = _SparkReadableS3Storage("lake", prefix="tables/stream", client=api)
    c = DeltaLakeClient(spark, store, dataobject_size=1000)
    c.new_tx()
    c.create_table("t", "id BIGINT, v DOUBLE")
    c.commit_tx()
    c.new_tx()
    c.write_dataframe(
        "t", spark.range(0, 20).select("id", (F.col("id") * 1.0).alias("v"))
    )
    c.commit_tx()

    from delta_lake_experiment_spark.streaming.engine_source import (
        register_engine_source,
    )

    # the fake store is a plain picklable object: it rides the bound
    # subclass into the data-source worker (boto3 clients would use a
    # "module:attr" storeFactory instead). The worker cannot import
    # TEST modules, so pickle this module's classes by value.
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])

    def drain_opts(ck, extra=()):
        # registration PICKLES the bound store's state — re-register
        # per run so each stream sees the store as of its start (a
        # real deployment's store reads live state; only the in-memory
        # fake freezes at pickle time)
        fmt = register_engine_source(spark, store=store)
        seen = []

        def collect(df, _bid):
            seen.extend(tuple(r) for r in df.collect())

        reader = (
            spark.readStream.format(fmt)
            .option("table", "t")
        )
        for k, v in extra:
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.foreachBatch(collect)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return seen

    ck = str(tmp_path / "ck")
    snap_rows = drain_opts(ck)
    c.new_tx()
    want = sorted(
        tuple(r) for r in c.scan("t", with_stamps=False).collect()
    )
    assert sorted(snap_rows) == want
    c.abort_tx()

    # tail: a new commit through the remote store streams on resume
    c.new_tx()
    c.write_dataframe(
        "t", spark.range(100, 105).select("id", (F.col("id") * 1.0).alias("v"))
    )
    c.commit_tx()
    tail_rows = drain_opts(ck)
    assert sorted(r[0] for r in tail_rows) == list(range(100, 105))

    # change feed over the remote store: a COW delete's net rows
    c.new_tx()
    c.delete_rows("t", "id", 0, 4)
    c.commit_tx()
    cdf_rows = drain_opts(
        str(tmp_path / "ck_cdf"), extra=[("readChangeFeed", "true")]
    )
    from collections import Counter

    by = Counter((r[-3], r[-2]) for r in cdf_rows)  # (_change_type, version)
    assert by[("insert", 2)] == 20
    assert by[("delete", 4)] == 5
    assert by[("insert", 3)] == 5
    _cp.unregister_pickle_by_value(_sys.modules[__name__])


def test_verify_bytes_assume_present_over_s3(spark, s3_store):
    """r15: SHOW DROPPED TABLES VERIFY over a backend whose tri-state
    exists() cannot answer (this double has no head_object): a
    listing-absent object is an UNCONFIRMED absence, so verify_bytes
    keeps recoverable=True — the same assume-present contract as
    undrop's probe (fail loud later at scan, never a false
    already-reclaimed downgrade). LocalObjectStorage's definitive
    downgrade path is pinned in test_drop_table."""
    c = DeltaLakeClient(spark, s3_store)
    c.new_tx()
    c.create_table("t", "k BIGINT")
    c.commit_tx()
    for i in range(10):  # >8 objects: the paginated-LIST branch runs
        c.new_tx()
        c.write_row("t", [i])
        c.commit_tx()
    c.new_tx()
    c.drop_table("t")
    c.commit_tx()
    data_keys = sorted(k for k in s3_store.client.objects if "table_t_" in k)
    del s3_store.client.objects[data_keys[0]]
    listing = c.list_dropped_tables(verify_bytes=True)
    assert [(d["table"], d["recoverable"]) for d in listing] == [("t", True)]
    assert listing[0]["reason"] is None


def test_drop_undrop_discovery_over_s3(spark, s3_store):
    """The r14 recovery lane over the S3 API double: the batched
    undrop probe rides paginated LISTs (page size 2 here), discovery
    walks the log unchanged, and the tri-state exists() contract holds
    — this double has NO head_object, so exists() answers None and a
    listing-absent object is ASSUMED present (fail loud later at scan,
    never a false already-reclaimed refusal; LocalObjectStorage's
    definitive False path is pinned in test_drop_table)."""
    c = DeltaLakeClient(spark, s3_store)
    c.new_tx()
    c.create_table("t", "k BIGINT")
    c.commit_tx()
    # 10 commits -> 10 data objects: past the probe's small-group
    # direct-exists() escape (<=8), so the BATCHED paginated-LIST
    # branch is what runs over this double
    for i in range(10):
        c.new_tx()
        c.write_row("t", [i])
        c.commit_tx()
    c.new_tx()
    c.drop_table("t")
    c.commit_tx()
    listing = c.list_dropped_tables()
    assert [(d["table"], d["recoverable"]) for d in listing] == [("t", True)]
    # vacuum one data object away behind recovery's back: the double
    # cannot HEAD, so the probe ASSUMES it present and undrop proceeds
    data_keys = sorted(k for k in s3_store.client.objects if "table_t_" in k)
    assert len(data_keys) == 10  # one flush per commit
    del s3_store.client.objects[data_keys[0]]
    c.new_tx()
    assert c.undrop_table("t") == 10
    c.commit_tx()
    c.new_tx()
    # the loss surfaces LOUDLY at first read of the missing object —
    # the documented degradation for backends that cannot answer. Pin
    # the MISSING-OBJECT error class, not just any failure: the table
    # itself must still resolve (undrop committed fine)
    assert c.table_schema("t") is not None
    with pytest.raises(Exception, match="(?i)file|path|exist|found"):
        c.scan("t", with_stamps=False).count()
    c.abort_tx()


class _OpCountingS3Client(_MirroredS3Client):
    """Mirrored fake S3 with a request meter — the fleet-shape gate's
    instrument (tests/test_drop_table.py::_ProbeCountingStore) at the
    S3 API layer: HEADs (head_object — this double ANSWERS them, so
    any per-object probe the engine attempted would both work and be
    counted) and logical LISTs (continuation pages of one prefix walk
    count once; page size stays tiny so pagination itself is
    exercised)."""

    def __init__(self, mirror_root, page_size=3):
        super().__init__(mirror_root, page_size)
        self.head_calls = 0
        self.list_calls = 0

    def reset(self):
        self.head_calls = 0
        self.list_calls = 0

    def head_object(self, Bucket, Key):
        self.head_calls += 1
        if Key not in self.objects:
            raise _ApiError(404, "NoSuchKey")
        return {"ContentLength": len(self.objects[Key])}

    def list_objects_v2(self, **kw):
        if not kw.get("ContinuationToken"):
            self.list_calls += 1
        return super().list_objects_v2(**kw)


@pytest.mark.slow
def test_streaming_fuzzy_gate_store_op_profile(spark, tmp_path):
    """r16 (VERDICT r15 item 7): the streaming fuzzy-dedup gate's
    per-micro-batch store bill over the S3 API double — ZERO
    per-object HEADs (the only heads allowed are replay_log's O(1)
    advisory-pointer validations) and a bounded handful of logical
    LISTs per batch, REGARDLESS of how many data objects the index
    has accumulated. A gate that degraded to per-object probes would
    multiply S3 request cost by file count exactly where the lane
    runs hottest (every micro-batch, forever)."""
    from delta_lake_experiment_spark.operators.dedup import SHINGLE_DF_DDL
    from delta_lake_experiment_spark.streaming.ingest import (
        foreach_batch_fuzzy_dedup_writer,
    )

    api = _OpCountingS3Client(str(tmp_path / "mirror"), page_size=3)
    store = _SparkReadableS3Storage("lake", prefix="gate", client=api)

    def factory():
        return DeltaLakeClient(spark, store)

    boot = factory()
    boot.new_tx()
    boot.create_table("fc", "doc_id BIGINT, text STRING")
    boot.create_table(
        "fp", "doc_id BIGINT, sh BIGINT", bucket_by=(["sh"], 4)
    )
    boot.create_table("fx", "doc_id BIGINT, pfx STRING")
    boot.create_table("fdf", SHINGLE_DF_DDL, primary_keys=["sh"])
    boot.commit_tx()

    writer = foreach_batch_fuzzy_dedup_writer(
        factory, "fc", "fp", "fx", "doc_id", "text", "s3gate",
        candidate_threshold=0.3, max_postings=64,
        prefix_chars=400, max_edit_ratio=0.2, df_table="fdf",
    )
    words = [f"w{i:03d}" for i in range(80)]

    def doc(seed):
        return " ".join(f"{w}{seed}" for w in words)

    # grow the index across several committed batches so the file
    # count is well above any plausible constant
    for b in range(6):
        writer(
            spark.createDataFrame(
                [(b * 10 + j, doc(b * 10 + j)) for j in range(3)],
                "doc_id long, text string",
            ),
            b,
        )
    n_objects = sum(
        1 for k in api.objects if "table_fp_" in k or "table_fdf_" in k
    )
    assert n_objects >= 12, n_objects  # the meter has something to meter

    api.reset()
    writer(
        spark.createDataFrame(
            # 100 is novel; 101 re-sends batch 1's doc 11 under a new
            # id — the content gate must reject it via the index
            [(100, doc(100)), (101, doc(11))], "doc_id long, text string"
        ),
        6,
    )
    # per-object HEADs: none (replay's advisory-pointer check is the
    # only head-shaped op in the protocol and is O(1) per replay)
    assert api.head_calls <= 3, (
        f"{api.head_calls} HEADs in one micro-batch — the gate must"
        " never existence-probe per object"
    )
    # logical LISTs: log-tail replay + staging publishes + scan-area
    # bookkeeping — a bounded handful, NOT O(index files)
    assert api.list_calls <= 16, (
        f"{api.list_calls} LISTs in one micro-batch over"
        f" {n_objects} index objects"
    )
    # and the batch actually did gate work: one admitted, one rejected
    check = factory()
    check.new_tx()
    ids = sorted(
        r["doc_id"] for r in check.scan("fc", with_stamps=False).collect()
    )
    assert 100 in ids and 101 not in ids, ids
    check.abort_tx()


@pytest.mark.slow
def test_streaming_semantic_gate_store_op_profile(spark, tmp_path):
    """The fleet-shape gate extended to the SEMANTIC admission gate
    (r16): one micro-batch against a grown embedding index costs zero
    per-object HEADs and a bounded handful of logical LISTs — the
    same bill as the fuzzy gate, plus nothing for the centroid load
    (an O(model) GET of data objects, not a listing walk)."""
    from delta_lake_experiment_spark.operators.semdedup import (
        deterministic_kmeans,
        incremental_semantic_near_duplicates,
        semantic_index_ddl,
    )
    from delta_lake_experiment_spark.streaming.ingest import (
        foreach_batch_semantic_dedup_writer,
    )

    api = _OpCountingS3Client(str(tmp_path / "mirror"), page_size=3)
    store = _SparkReadableS3Storage("lake", prefix="semgate", client=api)

    def factory():
        return DeltaLakeClient(spark, store)

    def vec(seed):
        base = [0.0] * 8
        base[seed % 8] = 1.0
        base[(seed + 3) % 8] = 0.1 + (seed % 5) * 0.05
        return base

    seed_docs = spark.createDataFrame(
        [(i, vec(i)) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    cents = deterministic_kmeans(
        seed_docs, "vec_id", "embedding", k=2, iters=1, salt="s"
    )
    boot = factory()
    boot.new_tx()
    boot.create_table("sc", "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    boot.create_table("si", semantic_index_ddl("vec_id"))
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
    seed_pairs, rows = incremental_semantic_near_duplicates(
        spark.createDataFrame([], semantic_index_ddl("vec_id")),
        seed_docs, cents, "vec_id", "embedding", threshold=0.95,
    )
    boot.write_dataframe("sc", seed_docs)
    boot.write_dataframe("si", rows)
    boot.commit_tx()
    for df in seed_pairs._cached_inputs:
        df.unpersist()

    writer = foreach_batch_semantic_dedup_writer(
        factory, "sc", "si", "scent", "vec_id", "embedding", "s3sem",
        threshold=0.95,
    )
    # grow the index across several committed batches
    for b in range(5):
        writer(
            spark.createDataFrame(
                [(100 + b * 10 + j, vec(41 + b * 10 + j)) for j in range(2)],
                "vec_id long, embedding array<double>",
            ),
            b,
        )
    n_objects = sum(
        1 for k in api.objects if "table_si_" in k or "table_sc_" in k
    )
    assert n_objects >= 12, n_objects

    api.reset()
    writer(
        spark.createDataFrame(
            # a uniform vector is far from every one-hot-ish doc
            # (cosine ~0.38) — genuinely novel, must be admitted
            [(990, [1.0] * 8)], "vec_id long, embedding array<double>"
        ),
        5,
    )
    assert api.head_calls <= 3, (
        f"{api.head_calls} HEADs in one semantic micro-batch"
    )
    assert api.list_calls <= 16, (
        f"{api.list_calls} LISTs in one semantic micro-batch over"
        f" {n_objects} objects"
    )
    check = factory()
    check.new_tx()
    assert 990 in {
        r["vec_id"] for r in check.scan("sc", with_stamps=False).collect()
    }
    check.abort_tx()
