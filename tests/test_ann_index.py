"""Persisted IVF ANN index lifecycle (operators/ann_index.py,
VERDICT r7 item 7): build -> incremental ingest -> search finds the
new vector WITHOUT retraining; redelivery is a no-op; the stored model
is the single source of truth for assignments."""

import math
import random

import pytest
from pyspark.sql import functions as F

from delta_lake_experiment_spark.client import DeltaLakeClient
from delta_lake_experiment_spark.operators.ann_index import (
    CENTROIDS_DDL,
    ann_index_topk,
    assign_ddl,
    build_ann_index,
    incremental_ann_ingest,
    load_centroids,
    probe_lists,
    vectors_ddl,
)

_DIM = 8


def _vecs(n, seed=5, offset=0):
    rnd = random.Random(seed)
    out = []
    for i in range(n):
        base = [rnd.uniform(-1, 1) for _ in range(_DIM)]
        out.append((i + offset, [float(x) for x in base]))
    return out


def _setup(spark, store_dir, rows):
    c = DeltaLakeClient(spark, store_dir, dataobject_size=1000)
    c.new_tx()
    c.create_table("v", vectors_ddl("id", "vec"))
    c.create_table("cent", CENTROIDS_DDL)
    c.create_table("asg", assign_ddl("id"))
    c.write_dataframe(
        "v", spark.createDataFrame(rows, "id long, vec array<double>")
    )
    c.commit_tx()
    return c


@pytest.mark.slow
def test_build_ingest_search_without_retraining(spark, store_dir):
    rows = _vecs(80)
    c = _setup(spark, store_dir, rows)
    n = build_ann_index(c, "v", "cent", "asg", id_col="id", vec_col="vec",
                        k=8, iters=1)
    assert n == 80
    c.new_tx()
    cents_before = load_centroids(c, "cent")
    assert len(cents_before) == 8 and len(cents_before[0]) == _DIM
    # a stored vector's own embedding finds itself at rank 1, score 1.0
    target = rows[17]
    top = ann_index_topk(
        c, "v", "cent", "asg", target[1], id_col="id", vec_col="vec",
        k=5, n_probe=8,  # all lists: self MUST be reachable
    ).collect()
    assert top[0]["id"] == target[0] and top[0]["score"] == 1.0
    c.abort_tx()
    # incremental batch: one vector colinear with the query direction
    probe_query = [1.0, 0.5, -0.25, 0.0, 0.75, -0.5, 0.25, 1.0]
    nq = math.sqrt(sum(x * x for x in probe_query))
    new_vec = [x / nq for x in probe_query]
    batch = spark.createDataFrame(
        [(500, new_vec)] + [(501, rows[3][1])], "id long, vec array<double>"
    )
    admitted = incremental_ann_ingest(
        c, "v", "cent", "asg", batch, id_col="id", vec_col="vec"
    )
    assert admitted == 2
    # centroids untouched by ingest (no retraining)
    c.new_tx()
    assert load_centroids(c, "cent") == cents_before
    # the NEW vector is found through the persisted index: its list
    # assignment was computed at ingest under the stored model
    found = ann_index_topk(
        c, "v", "cent", "asg", probe_query, id_col="id", vec_col="vec",
        k=3, n_probe=2,
    ).collect()
    assert found[0]["id"] == 500 and found[0]["score"] == 1.0
    # assignments == assign_to_centroids under the stored centroids,
    # for every vector (build-time and ingest-time alike)
    from delta_lake_experiment_spark.operators.semdedup import (
        assign_to_centroids,
    )

    stored = {
        (r["id"], r["cluster"])
        for r in c.scan("asg", with_stamps=False).collect()
    }
    expected = {
        (r["id"], r["cluster"])
        for r in assign_to_centroids(
            c.scan("v", with_stamps=False), "id", "vec", cents_before
        ).collect()
    }
    assert stored == expected and len(stored) == 82
    c.abort_tx()
    # redelivered batch: no-op, tables unchanged
    assert incremental_ann_ingest(
        c, "v", "cent", "asg", batch, id_col="id", vec_col="vec"
    ) == 0
    c.new_tx()
    assert c.scan("v", with_stamps=False).count() == 82
    assert c.scan("asg", with_stamps=False).count() == 82
    c.abort_tx()


def test_ingest_before_build_raises(spark, store_dir):
    c = _setup(spark, store_dir, _vecs(10))
    with pytest.raises(ValueError, match="build_ann_index"):
        incremental_ann_ingest(
            c, "v", "cent", "asg",
            spark.createDataFrame([(99, [0.0] * _DIM)], "id long, vec array<double>"),
            id_col="id", vec_col="vec",
        )
    c.new_tx()
    with pytest.raises(ValueError, match="build_ann_index"):
        ann_index_topk(c, "v", "cent", "asg", [1.0] * _DIM,
                       id_col="id", vec_col="vec")
    c.abort_tx()


@pytest.mark.slow
def test_retrain_overwrites_model_atomically(spark, store_dir):
    rows = _vecs(40)
    c = _setup(spark, store_dir, rows)
    build_ann_index(c, "v", "cent", "asg", id_col="id", vec_col="vec",
                    k=4, iters=1)
    incremental_ann_ingest(
        c, "v", "cent", "asg",
        spark.createDataFrame(_vecs(40, seed=9, offset=100),
                              "id long, vec array<double>"),
        id_col="id", vec_col="vec",
    )
    # retrain over the grown corpus: model + lists replaced together
    n = build_ann_index(c, "v", "cent", "asg", id_col="id", vec_col="vec",
                        k=4, iters=2)
    assert n == 80
    c.new_tx()
    cents = load_centroids(c, "cent")
    assert c.scan("asg", with_stamps=False).count() == 80
    # probe ranking is deterministic over the stored grid centroids
    assert probe_lists([1.0] * _DIM, cents, 2) == probe_lists(
        [1.0] * _DIM, cents, 2
    )
    c.abort_tx()


@pytest.mark.slow
def test_staleness_report_trips_on_planted_drift(spark, store_dir):
    """ann_index_staleness (VERDICT r8 item 6): freshly built index ->
    no retrain recommended; a planted drift batch (orthogonal
    direction, volume >= trained) -> recommended; retraining over
    everything clears it."""
    from delta_lake_experiment_spark.operators.ann_index import (
        ann_index_staleness,
    )

    # trained corpus: concentrated near e0 (so centroids point there)
    rnd = random.Random(11)
    base = [
        (i, [1.0] + [rnd.uniform(-0.05, 0.05) for _ in range(_DIM - 1)])
        for i in range(40)
    ]
    c = _setup(spark, store_dir, base)
    build_ann_index(c, "v", "cent", "asg", id_col="id", vec_col="vec", k=4)

    c.new_tx()
    fresh = ann_index_staleness(c, "v", "cent", "asg", id_col="id", vec_col="vec")
    rows = {r["era"]: r for r in fresh.collect()}
    c.abort_tx()
    assert set(rows) == {"trained"}
    assert not rows["trained"]["retrain_recommended"]

    # planted drift: as many vectors again, pointing along e1 — low
    # similarity to every stored centroid AND volume >= trained
    drift = [
        (i, [0.0, 1.0] + [rnd.uniform(-0.05, 0.05) for _ in range(_DIM - 2)])
        for i in range(100, 140)
    ]
    incremental_ann_ingest(
        c, "v", "cent", "asg",
        spark.createDataFrame(drift, "id long, vec array<double>"),
        id_col="id", vec_col="vec",
    )
    c.new_tx()
    stale = ann_index_staleness(c, "v", "cent", "asg", id_col="id", vec_col="vec")
    rows = {r["era"]: r for r in stale.collect()}
    c.abort_tx()
    assert set(rows) == {"trained", "ingested"}
    assert rows["ingested"]["retrain_recommended"]
    assert rows["trained"]["retrain_recommended"]  # same flag, both rows
    assert rows["ingested"]["mean_sim"] < rows["trained"]["mean_sim"]

    # retrain over everything: the new model owns ALL rows again
    build_ann_index(c, "v", "cent", "asg", id_col="id", vec_col="vec", k=4)
    c.new_tx()
    after = ann_index_staleness(c, "v", "cent", "asg", id_col="id", vec_col="vec")
    rows = {r["era"]: r for r in after.collect()}
    c.abort_tx()
    assert set(rows) == {"trained"}
    assert not rows["trained"]["retrain_recommended"]
