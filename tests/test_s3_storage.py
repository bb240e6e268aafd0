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

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        assert IfNoneMatch == "*", "engine must always write conditionally"
        if Key in self.objects:
            raise _ApiError(412, "PreconditionFailed")
        self.objects[Key] = bytes(Body)
        return {"ETag": '"fake"'}

    def get_object(self, Bucket, Key):
        if Key not in self.objects:
            raise _ApiError(404, "NoSuchKey")
        return {"Body": io.BytesIO(self.objects[Key])}

    def list_objects_v2(self, Bucket, Prefix="", ContinuationToken=None):
        keys = sorted(k for k in self.objects if k.startswith(Prefix))
        start = int(ContinuationToken) if ContinuationToken else 0
        page = keys[start : start + self.page_size]
        truncated = start + self.page_size < len(keys)
        resp = {
            "Contents": [{"Key": k} for k in page],
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
