"""Persistent IVF ANN index as engine tables, with incremental ingest.

The minhash LSH index already lives as an ACID table with incremental
admission and compaction (operators/incremental.py); the vector lane's
IVF centroids and inverted lists, by contrast, retrained on every
query (operators/similarity.py::ivf_topk). This module closes that
asymmetry (VERDICT r7 item 7): the trained model and its list
assignments become ENGINE TABLES —

- ``centroids_table`` (``j int, pos int, x double``): the K×dim
  centroid matrix as rows, coordinates on the certified rounded grid
  (operators/semdedup.py::deterministic_kmeans — md5 seeds, rounded
  Lloyd steps, lower-index tie-breaks), so everything downstream of a
  stored model is engine-reproducible;
- ``assign_table`` (``<id> bigint, cluster int``): the inverted lists,
  one row per vector;
- ``vectors_table`` (``<id> bigint, <vec> array<double>``): the
  vectors themselves.

Search never retrains: probe selection is driver-side O(K·dim) math
over the stored centroids (rounded-dot ranking, the pca.py fold
discipline), candidates are the probed lists' assignment rows
semi-joined back to the vectors, then the exact cosine rerank. New
embeddings APPEND in one transaction — vector rows plus their list
assignments under the STORED centroids, no retrain — so ingest cost is
O(batch), a redelivered batch is a no-op (already-present ids are
anti-joined away), and the index can never disagree with the corpus
(both tables commit atomically; concurrent writers hit
first-committer-wins and retry on the fresh snapshot — the
incremental_minhash_ingest composition). Drifted lists are repaired by
:func:`build_ann_index`, which retrains over everything and overwrites
model + lists atomically.

100 TB shape: training is the certified Lloyd loop (one distributed
pass per iteration, O(K·dim) driver state); ingest assignment is a
map-only pass against literal centroids; a search scans ~n_probe/K of
the corpus (and the assignment semi-join broadcasts the O(corpus/K)
probed id set under AQE). At warehouse scale the assign table would be
the bucket key of a bucketed vectors table, making the semi-join
shuffle-free — both primitives this engine already provides.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_experiment_spark.client import DeltaLakeClient

#: DDLs for the three index tables (create them with client.create_table)
CENTROIDS_DDL = "j int, pos int, x double"


def assign_ddl(id_col: str = "id") -> str:
    return f"{id_col} bigint, cluster int"


def vectors_ddl(id_col: str = "id", vec_col: str = "vec") -> str:
    return f"{id_col} bigint, {vec_col} array<double>"


def load_centroids(client: DeltaLakeClient, centroids_table: str) -> list:
    """The stored centroid matrix, driver-side: O(K·dim) rows."""
    rows = client.scan(centroids_table, with_stamps=False).collect()
    if not rows:
        return []
    by_j: dict[int, dict[int, float]] = {}
    for r in rows:
        by_j.setdefault(int(r["j"]), {})[int(r["pos"])] = float(r["x"])
    out = []
    for j in range(len(by_j)):
        if j not in by_j:
            raise ValueError(
                f"centroids table {centroids_table!r} is missing centroid {j}"
            )
        coords = by_j[j]
        out.append([coords[p] for p in range(len(coords))])
    return out


def _norm_py(vec: Sequence[float]) -> list:
    """The operator-side normalization (pca.py left-to-right fold):
    same double in, same double out as semdedup's ``_norm_checked``."""
    from delta_lake_experiment_spark.operators.pca import _fold_dot

    v = [float(x) for x in vec]
    n = math.sqrt(_fold_dot(v, v))
    return [x / n for x in v] if n > 0 else v


def probe_lists(
    query: Sequence[float],
    centroids: Sequence[Sequence[float]],
    n_probe: int,
    round_digits: int = 9,
) -> list:
    """The ``n_probe`` nearest inverted lists by rounded dot against
    the normalized query, ties to the lower index — driver-side
    O(K·dim), and the exact ORDER BY a SQL twin runs over the
    re-derived centroid table."""
    from delta_lake_experiment_spark.functions.rounding import round_like_sql
    from delta_lake_experiment_spark.operators.pca import _fold_dot

    qn = _norm_py(query)
    scored = sorted(
        (-round_like_sql(_fold_dot(list(c), qn), round_digits), j)
        for j, c in enumerate(centroids)
    )
    return [j for _, j in scored[:n_probe]]


def build_ann_index(
    client: DeltaLakeClient,
    vectors_table: str,
    centroids_table: str,
    assign_table: str,
    id_col: str = "id",
    vec_col: str = "vec",
    k: int = 16,
    iters: int = 1,
    salt: str = "annidx",
    retries: int = 3,
) -> int:
    """(Re)train the model over EVERYTHING in ``vectors_table`` and
    atomically overwrite ``centroids_table`` + ``assign_table`` in one
    transaction. Returns the number of vectors indexed. Run once at
    bootstrap and again when ingest volume has drifted the lists (the
    periodic-retrain half of the incremental pattern)."""
    from delta_lake_experiment_spark.operators.semdedup import (
        assign_to_centroids,
        deterministic_kmeans,
    )

    def _attempt(c: DeltaLakeClient) -> int:
        vecs = c.scan(vectors_table, with_stamps=False)
        cents = deterministic_kmeans(
            vecs, id_col, vec_col, k=k, iters=iters, salt=salt
        )
        cent_rows = [
            (j, p, float(x))
            for j, cv in enumerate(cents)
            for p, x in enumerate(cv)
        ]
        c.overwrite_table(
            centroids_table,
            c.spark.createDataFrame(cent_rows, "j int, pos int, x double"),
        )
        assigned = assign_to_centroids(vecs, id_col, vec_col, cents)
        c.overwrite_table(assign_table, assigned)
        # the overwrite's staged footers already hold the exact row
        # count — a metadata sum, not a second evaluation of the K-dot
        # assignment pass (r17; client.table_row_count is exact over
        # in-tx staged adds)
        return c.table_row_count(assign_table)

    return client.run_tx(_attempt, retries=retries)


def incremental_ann_ingest(
    client: DeltaLakeClient,
    vectors_table: str,
    centroids_table: str,
    assign_table: str,
    batch: DataFrame,
    id_col: str = "id",
    vec_col: str = "vec",
    retries: int = 3,
) -> int:
    """Admit a batch of new vectors WITHOUT retraining: ids not already
    present append to ``vectors_table`` together with their inverted-
    list assignments under the STORED centroids, in ONE transaction.
    Already-present ids are skipped, so a redelivered batch is a no-op
    (exactly-once by content, the incremental_dedup_ingest admission
    shape). Returns the number of vectors admitted."""
    from delta_lake_experiment_spark.functions.guards import null_checked
    from delta_lake_experiment_spark.operators.semdedup import (
        assign_to_centroids,
    )

    def _attempt(c: DeltaLakeClient) -> int:
        cents = load_centroids(c, centroids_table)
        if not cents:
            raise ValueError(
                f"centroids table {centroids_table!r} is empty - run"
                " build_ann_index before incremental ingest"
            )
        existing = c.scan(vectors_table, with_stamps=False).select(id_col)
        fresh = (
            batch.select(
                null_checked(
                    F.col(id_col), "incremental_ann_ingest", f"id {id_col!r}"
                ).alias(id_col),
                F.col(vec_col),
            )
            .join(existing, id_col, "left_anti")
            .persist()
        )
        try:
            n = fresh.count()
            if n:
                c.write_dataframe(vectors_table, fresh)
                c.write_dataframe(
                    assign_table,
                    assign_to_centroids(fresh, id_col, vec_col, cents),
                )
            return n
        finally:
            fresh.unpersist()

    return client.run_tx(_attempt, retries=retries)


def ann_index_topk(
    client: DeltaLakeClient,
    vectors_table: str,
    centroids_table: str,
    assign_table: str,
    query: Sequence[float],
    id_col: str = "id",
    vec_col: str = "vec",
    k: int = 10,
    n_probe: int = 4,
    centroids: Optional[list] = None,
) -> DataFrame:
    """IVF top-k over the PERSISTED index: rank probes driver-side from
    the stored centroids, scan only the probed lists' vectors, exact
    cosine rerank (similarity.py::cosine_topk — scores rounded to the
    engine-portable grid). No training happens here, ever."""
    cents = centroids if centroids is not None else load_centroids(
        client, centroids_table
    )
    if not cents:
        raise ValueError(
            f"centroids table {centroids_table!r} is empty - run"
            " build_ann_index first"
        )
    from delta_lake_experiment_spark.operators.similarity import cosine_topk

    probes = probe_lists(query, cents, n_probe)
    ids = (
        client.scan(assign_table, with_stamps=False)
        .filter(F.col("cluster").isin(probes))
        .select(id_col)
    )
    cand = client.scan(vectors_table, with_stamps=False).join(
        ids, id_col, "left_semi"
    )
    return cosine_topk(cand, id_col, vec_col, [float(x) for x in query], k=k)


def ann_index_staleness(
    client: DeltaLakeClient,
    vectors_table: str,
    centroids_table: str,
    assign_table: str,
    id_col: str = "id",
    vec_col: str = "vec",
    round_digits: int = 9,
    sim_drop: float = 0.05,
    skew_factor: int = 2,
) -> DataFrame:
    """Index drift diagnostic (VERDICT r8 item 6): the persisted IVF
    model silently degrades as ingest grows a corpus the centroids
    never saw. This report compares the INGESTED era against the
    TRAINED era — the eras come free from the engine's row stamps
    (rows committed by the build transaction vs after it) — on exact,
    engine-reproducible aggregates, and recommends a
    :func:`build_ann_index` retrain. One row per era:

    - ``n_vectors``, and ``sim_units_sum`` — each vector's rounded dot
      with its ASSIGNED centroid (the assignment score itself), scaled
      by 1e9 to an EXACT integer (rounded grid values are m/1e9, so
      the scaled round recovers m exactly): sums are integer-exact
      across engines, no float-mean hashing hazard;
    - ``mean_sim`` (display form of the sum), ``min_sim``;
    - ``max_list_n`` — the era's largest inverted list (occupancy
      skew);
    - ``retrain_recommended``, identical on both rows, computed from
      exact integer/decimal arithmetic: ingested volume >= trained
      volume, OR mean assignment similarity dropped by more than
      ``sim_drop`` (cross-multiplied in DECIMAL so no float compare
      can flip an engine), OR an ingested list holds more than
      ``skew_factor`` times its fair share.

    Cost: one pass over assign ⋈ vectors (K rounded dots per row — the
    same work one assignment pass costs) plus O(K) aggregates; never
    O(n²), never a retrain."""
    from delta_lake_experiment_spark.client import TX_COL
    from delta_lake_experiment_spark.operators.semdedup import (
        _dot_lit,
        _norm_checked,
    )

    cents = load_centroids(client, centroids_table)
    if not cents:
        raise ValueError(
            f"centroids table {centroids_table!r} is empty - run"
            " build_ann_index first"
        )
    k = len(cents)
    build_version = client.scan(centroids_table).agg(
        F.max(TX_COL).alias("v")
    ).first()["v"]
    assigned = client.scan(assign_table).select(
        F.col(id_col),
        F.col("cluster"),
        F.when(F.col(TX_COL) <= F.lit(int(build_version)), "trained")
        .otherwise("ingested")
        .alias("era"),
    )
    vecs = client.scan(vectors_table, with_stamps=False).select(
        F.col(id_col), _norm_checked(vec_col).alias("__v")
    )
    sims = F.array(
        *[
            F.round(_dot_lit(F.col("__v"), c), round_digits)
            for c in cents
        ]
    )
    rows = (
        assigned.join(vecs, id_col)
        .select(
            "era",
            "cluster",
            F.element_at(sims, F.col("cluster") + 1).alias("sim"),
        )
        # materialize once: per_era, lists AND the recommendation pivot
        # all consume these rows — without the barrier the K-dot join
        # re-evaluates per consumer (the docstring's one-pass claim)
        .localCheckpoint(eager=True)
    )
    per_era = rows.groupBy("era").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.round(F.col("sim") * 1e9, 0).cast("long")).alias(
            "sim_units_sum"
        ),
        F.min("sim").alias("min_sim"),
    )
    lists = (
        rows.groupBy("era", "cluster")
        .count()
        .groupBy("era")
        .agg(F.max("count").alias("max_list_n"))
    )
    report = per_era.join(lists, "era").withColumn(
        "mean_sim",
        F.round(
            F.col("sim_units_sum").cast("double") / 1e9 / F.col("n_vectors"), 6
        ),
    )
    # cross-era recommendation from exact arithmetic (one tiny 2-row
    # pivot, broadcast back onto both rows)
    drop_units = int(round(sim_drop * 1e9))
    pivot = report.groupBy().agg(
        F.coalesce(
            F.sum(F.when(F.col("era") == "trained", F.col("n_vectors"))),
            F.lit(0),
        ).alias("n_tr"),
        F.coalesce(
            F.sum(F.when(F.col("era") == "trained", F.col("sim_units_sum"))),
            F.lit(0),
        ).alias("u_tr"),
        F.coalesce(
            F.sum(F.when(F.col("era") == "ingested", F.col("n_vectors"))),
            F.lit(0),
        ).alias("n_in"),
        F.coalesce(
            F.sum(F.when(F.col("era") == "ingested", F.col("sim_units_sum"))),
            F.lit(0),
        ).alias("u_in"),
        F.coalesce(
            F.max(F.when(F.col("era") == "ingested", F.col("max_list_n"))),
            F.lit(0),
        ).alias("maxl_in"),
    )
    # precisions chosen so every product stays under 38 digits on BOTH
    # engines (DuckDB errors past 38; Spark nulls): u <= n*1e9 needs 18
    # digits up to n ~ 1e9 vectors; n 10; drop_units 9
    du, dn, dd = "decimal(18,0)", "decimal(10,0)", "decimal(9,0)"
    rec = (
        (F.col("n_in") >= F.col("n_tr"))
        | (
            (F.col("n_in") > 0)
            & (
                F.col("u_tr").cast(du) * F.col("n_in").cast(dn)
                - F.col("u_in").cast(du) * F.col("n_tr").cast(dn)
                > F.lit(drop_units).cast(dd)
                * F.col("n_tr").cast(dn)
                * F.col("n_in").cast(dn)
            )
        )
        | (F.col("maxl_in") * k > skew_factor * F.col("n_in"))
    ).alias("retrain_recommended")
    flags = pivot.select(rec).limit(1)
    return report.crossJoin(F.broadcast(flags)).select(
        "era",
        "n_vectors",
        "sim_units_sum",
        "mean_sim",
        "min_sim",
        "max_list_n",
        "retrain_recommended",
    )
