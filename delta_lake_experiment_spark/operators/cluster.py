"""Connected components over a pair graph — duplicate-cluster
resolution for dedup pipelines.

Pairwise near-duplicate detection (MinHash-LSH, SimHash, embedding
blocks — operators/dedup.py) emits EDGES; a pipeline must then resolve
them into CLUSTERS to keep one canonical document per group (A~B and
B~C must collapse to one survivor even though (A,C) was never emitted).
That resolution is connected components.

Algorithm: **hash-min label propagation** over DataFrames. Every node
starts labeled with its own id; each round, every node takes the min of
its own and its neighbors' labels; fixpoint = every node carries the
min id of its component. Each round is one equi-join + one groupBy on
the edge list — plain shuffles Catalyst handles like any other, no
driver-side graph. Convergence is detected with a 1-row aggregate (sum
of labels, strictly decreasing until fixpoint) — O(1) driver data per
round, never a collect of nodes.

Scale: each round combines the neighbor-min step with **pointer
jumping** (``comp <- comp[comp]``, Shiloach-Vishkin style): labels hop
to their label's label, halving chains, so rounds = O(log diameter)
instead of O(diameter) — a 1M-node path closes in ~20 rounds, not 1M.
Correctness is unchanged: a label is always a node id reachable from
its owner (reachability is transitive on the undirected graph), labels
only decrease, and the fixpoint of the combined round still forces
label constancy along every edge — hence the component minimum
everywhere. Per-round cost: one join+groupBy on the edge list plus one
node-sized self-join for the jump. The alternating
large-star/small-star formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) remains the
edge-rewriting alternative when even the node-sized label table must
shrink per round. ``localCheckpoint`` truncates lineage each round so
the plan does not grow with iterations.

The reference has no multi-table operators at all (SURVEY §2.2 —
"Joins: ABSENT"); this lane is part of the LLM-pipeline extension
surface. An exact DuckDB oracle exists via recursive CTE
(workloads/extensions.py::DEDUP_CLUSTER_SQL), so the operator is
value-checked end-to-end, not just pytest-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
    driver_max_edges: int = 100_000,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``;
    ``component`` = min node id reachable through the undirected graph.

    **Adaptive strategy.** Near-dup pair graphs are SPARSE relative to
    their corpora (edges = detected duplicate pairs, already an
    aggregated output orders of magnitude smaller than the document
    table). When the deduplicated edge list is at most
    ``driver_max_edges`` UNDIRECTED edges (known for free — the
    symmetrized list is localCheckpointed before the gate, so the
    count reads cached blocks; it holds two rows per undirected edge
    and the gate accounts for that), the fixpoint is solved by a
    driver-side union-find and the labels broadcast back: label
    propagation on a small graph is dominated by per-round job
    scheduling (each round = 2 materializations + 1 aggregate, all
    blocking), not by data. 100k edges is ~3 MB collected (200k
    directed rows) and milliseconds of union-find — strictly cheaper
    than even one propagation round. Graphs over the threshold take the distributed
    hash-min + pointer-jumping path unchanged; pass
    ``driver_max_edges=0`` to force it (the randomized equivalence
    pytest runs both paths against the same union-find oracle).

    Raises if the distributed path hasn't converged after
    ``max_rounds``. With pointer jumping, rounds grow with
    log2(diameter): the default cap of 25 covers diameters into the
    tens of millions, so hitting it signals a pathological graph (or a
    bug), not a slightly-low cap.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.unionByName(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    # sym carries BOTH directions of every undirected edge (and no
    # self-loops), so the undirected edge count is exactly half its
    # row count — the gate is stated, and applied, in undirected edges
    if driver_max_edges and sym.count() <= 2 * driver_max_edges:
        pairs = sym.collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in pairs:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so labels match the hash-min fixpoint
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        id_type = sym.schema["a"].dataType
        out_schema = T.StructType(
            [T.StructField("id", id_type), T.StructField("component", id_type)]
        )
        rows = [(n, find(n)) for n in parent]
        return edges.sparkSession.createDataFrame(rows, out_schema)

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]
    if prev_sum is None:  # no edges at all — nothing to propagate
        return labels
    for _ in range(max_rounds):
        neigh = (
            sym.join(
                labels.select(
                    F.col("id").alias("b"), F.col("component").alias("nb")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nb").alias("min_nb"))
        )
        stepped = (
            labels.join(neigh, labels["id"] == neigh["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("min_nb"), F.col("component"))
                ).alias("component"),
            )
            # materialize before the self-join below: both sides of the
            # jump read `stepped`, and without this the edge-list
            # join+groupBy above would execute twice per round
            .localCheckpoint(eager=True)
        )
        # pointer jump: comp <- comp[comp] (labels are node ids, so the
        # parent's label always exists in the table); halves chain depth
        parent = stepped.select(
            F.col("id").alias("__pid"), F.col("component").alias("__pcomp")
        )
        labels = (
            stepped.join(parent, stepped["component"] == parent["__pid"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("__pcomp"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_rounds} rounds "
        "(component diameter exceeds the cap)"
    )


def assign_components(
    df: DataFrame,
    edges: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Attach a ``component`` column to every row of ``df``: the min id
    of its duplicate cluster, or its own id when it has no duplicates.
    ``component == id`` marks the canonical (kept) row of each cluster."""
    comp = connected_components(edges, src=src, dst=dst).withColumnRenamed(
        "id", id_col
    )
    return df.join(comp, id_col, "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    )


def canonical_by(
    df: DataFrame,
    edges: DataFrame,
    id_col: str,
    order_cols,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """:func:`assign_components` with a CHOSEN survivor: the canonical
    row of each duplicate cluster is its best row by ``order_cols``
    (descending-first semantics belong to the caller — pass
    ``F.desc("quality")``), ties broken by ``id_col`` ascending.

    Min-id canonicals (the default elsewhere) keep whichever copy was
    crawled first; a curation pipeline usually wants to keep the BEST
    copy of each near-duplicate group — longest, highest quality
    score, most recent — and drop the rest. Returns ``df`` plus
    ``component`` and ``is_canonical``.

    One extra window partitioned by component — components are
    duplicate clusters, orders of magnitude smaller than the corpus
    and bounded by the pair detectors' thresholds; no skewed task."""
    comp = assign_components(df, edges, id_col, src=src, dst=dst)
    w = Window.partitionBy("component").orderBy(
        *list(order_cols), F.col(id_col).asc()
    )
    return comp.withColumn("is_canonical", F.row_number().over(w) == 1)
