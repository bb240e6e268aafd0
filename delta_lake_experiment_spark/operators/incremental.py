"""Incremental corpus update: dedup a NEW batch against an
engine-indexed existing corpus, transactionally.

Nobody re-runs full-corpus dedup when 1 TB arrives on top of 100 TB.
The daily operation is incremental: the corpus lives in an ACID engine
table carrying its dedup key (the exact content fingerprint,
operators/text.py::fingerprint); a new batch is deduped WITHIN itself,
anti-joined against the existing keys, and the survivors appended —
all inside one transaction, so concurrent ingests cannot admit the
same document twice.

Why this composition is the scale path:

- The existing-key read is a column-pruned engine scan: only
  ``key_cols`` reach the Parquet reader (ReadSchema pruning), and a
  table created with ``bloom_columns=key_cols`` prunes data files on
  the key, so the "read 100 TB to check membership" cost is actually
  "read the key column of the files the blooms keep".
- The anti-join shuffles on the key — or broadcasts the BATCH side
  when the batch is small relative to the corpus (the usual shape:
  Spark plans the smaller side; at 1 TB batch vs 100 TB corpus the
  optimizer's choice is the right one either way, and AQE re-plans on
  the runtime sizes).
- Correctness under concurrency is the ENGINE's job, not the join's:
  the whole read-check-append runs in :meth:`DeltaLakeClient.run_tx`,
  so a concurrent ingest to the same table triggers the
  first-committer-wins conflict and the loser RE-RUNS its anti-join
  against the fresh snapshot — the two-writers-admit-the-same-doc
  write-skew race cannot happen at table granularity.

The exact-fingerprint key makes every step value-oracle-checkable; a
production near-dup variant swaps the key for MinHash band signatures
(operators/dedup.py::minhash_signatures_hashed) with identical
transactional composition — banded keys join the same way.

The reference has no incremental-ingest surface (its write path is
append-only inserts, main.go via SURVEY.md §2.1 W1-W3); this
composition is original to the Spark build.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from delta_lake_experiment_spark.client import DeltaLakeClient
from delta_lake_experiment_spark.errors import ConcurrentCommitError
from delta_lake_experiment_spark.operators.dedup import exact_dedup


def incremental_dedup_ingest(
    client: DeltaLakeClient,
    table: str,
    batch: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    retries: int = 3,
) -> int:
    """Append to engine ``table`` the rows of ``batch`` whose
    ``key_cols`` are new — both within the batch (first-``order_col``
    survivor per key, the exact_dedup contract) and against the
    table's current committed contents. Returns the number of rows
    admitted.

    Runs inside :meth:`run_tx`: on a concurrent same-table commit the
    whole check-and-append re-executes against the fresh snapshot
    (``retries`` attempts), so admission is serializable per table.
    ``batch`` must be deterministic under re-execution (a re-read
    source or cached frame — the run_tx contract).

    NULL keys would vanish from the anti-join (NULL never equals
    NULL), silently re-admitting every NULL-keyed row each batch; the
    sampling-module contract applies — keys must be non-NULL, and the
    exact_dedup window upstream makes a NULL key its own group, so
    violations surface as duplicate NULL rows in the table rather
    than silent growth. Filter or coalesce upstream.
    """
    keys = list(key_cols)
    fresh = exact_dedup(batch, keys, order_col)

    def _attempt(c: DeltaLakeClient) -> int:
        existing = c.scan(table, with_stamps=False).select(*keys).distinct()
        admitted = fresh.join(existing, keys, "left_anti")
        # count once, write the SAME frame: persist so the count and
        # the write see one evaluation of the anti-join (the batch
        # source may be recomputed otherwise, and run_tx re-execution
        # must stay the ONLY redo path)
        admitted = admitted.persist()
        try:
            n = admitted.count()
            if n:
                c.write_dataframe(table, admitted)
            return n
        finally:
            admitted.unpersist()

    return client.run_tx(_attempt, retries=retries)


def incremental_minhash_ingest(
    client: DeltaLakeClient,
    docs_table: str,
    index_table: str,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
    retries: int = 3,
) -> int:
    """The NEAR-DUP variant of :func:`incremental_dedup_ingest`: the
    admission key swaps from the exact content fingerprint to banded
    MinHash signatures, the transactional composition stays identical.

    Two engine tables: ``docs_table`` holds admitted documents;
    ``index_table`` (schema ``id bigint, band int, bh bigint``) holds
    one row per (document, band) — the persisted LSH index. Admission
    is decided per in-batch near-dup COMPONENT (band collisions are
    not transitive, so per-pair rules would over-reject chain members
    whose "canonical" was itself rejected — id-order dependently):

    1. in-batch band-collision pairs -> connected components
       (operators/cluster.py), canonical = min id per component;
    2. a component with ANY member band-hitting the index is
       transitively near the existing corpus: all members rejected
       (the recall-biased direction every production dedup takes);
    3. otherwise the component's canonical is admitted, the rest
       rejected — so every rejected document either has an admitted
       canonical in its component or its component matched the
       corpus. That invariant is what makes the index
       one-entry-per-canonical.

    Scale shape: signatures are one groupBy over hashed shingles
    (num_hashes longs per doc), computed ONCE (persisted across the
    transaction, including conflict retries); admission is a
    (band, bh) semi-join against a column-pruned index scan — the
    index is O(num_bands) rows per admitted doc, orders of magnitude
    smaller than the text. In-batch pair counts are bounded by band
    groups (the lsh_candidate_pairs class — hot-group blowup is the
    banding parameters' job, `minhash_lsh_params`). Same run_tx
    conflict story as the exact lane: both tables are written in ONE
    transaction, so the index can never disagree with the admitted
    corpus.
    """
    from pyspark.sql import functions as F

    from delta_lake_experiment_spark.operators.cluster import assign_components
    from delta_lake_experiment_spark.operators.dedup import (
        lsh_band_rows,
        minhash_signatures_hashed,
        shingle_hashes,
    )

    sh = shingle_hashes(batch, id_col, text_col, n=shingle_n)
    sigs = minhash_signatures_hashed(sh, num_hashes=num_hashes)
    # one signature computation per call: hit-detection, pair-building,
    # and the admitted-bands write all read this materialization, and
    # run_tx retries reuse it (batch determinism is already required)
    bands = lsh_band_rows(sigs, num_bands=num_bands, num_hashes=num_hashes).persist()

    def _attempt(c: DeltaLakeClient) -> int:
        idx = c.scan(index_table, with_stamps=False).select("band", "bh")
        hit_ids = bands.join(idx, ["band", "bh"], "left_semi").select("__id").distinct()
        l, r = bands.alias("l"), bands.alias("r")
        pairs = (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bh") == F.col("r.bh"))
                & (F.col("l.__id") < F.col("r.__id")),
            )
            .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
            .distinct()
        )
        comp = assign_components(batch.select(F.col(id_col)), pairs, id_col)
        hit_comps = (
            comp.join(hit_ids.withColumnRenamed("__id", id_col), id_col, "left_semi")
            .select("component")
            .distinct()
        )
        admitted_ids = (
            comp.filter(F.col(id_col) == F.col("component"))
            .join(hit_comps, "component", "left_anti")
            .select(id_col)
        )
        admitted = batch.join(admitted_ids, id_col, "left_semi").persist()
        try:
            n = admitted.count()
            if n:
                c.write_dataframe(docs_table, admitted)
                adm_bands = bands.join(
                    admitted.select(F.col(id_col).alias("__id")), "__id", "left_semi"
                ).select(
                    F.col("__id").alias("id"), "band", "bh"
                )
                c.write_dataframe(index_table, adm_bands)
            return n
        finally:
            admitted.unpersist()

    try:
        return client.run_tx(_attempt, retries=retries)
    finally:
        bands.unpersist()


def compact_minhash_index(
    client: DeltaLakeClient,
    docs_table: str,
    index_table: str,
    id_col: str = "id",
    retries: int = 3,
    use_dv: bool = False,
) -> int:
    """Index maintenance for :func:`incremental_minhash_ingest`: drop
    every ``index_table`` entry whose document is no longer live in
    ``docs_table``. Returns the number of stale band rows removed.

    Without this, the LSH index grows forever and — worse — DELETED
    documents keep vetoing admissions: a document removed from the
    corpus (takedown, vacuum, quality purge) leaves its band
    signatures behind, and any recrawl or near-duplicate of it is
    silently rejected against a ghost. Run after corpus deletes (or
    periodically, like checkpoint compaction).

    Plan: one column-pruned scan of each table, a left-semi join of
    index entries against live document ids (the index is O(num_bands)
    rows per doc — tiny next to the corpus; the semi-join broadcasts
    whichever side is smaller under AQE), then a copy-on-write rewrite
    of the index: full-range delete + re-insert of survivors, all in
    ONE transaction (``run_tx``), so a concurrent ingest triggers
    first-committer-wins and the loser re-runs against the fresh
    snapshot — the index can never disagree with the admitted corpus.
    The per-table protocol is the SHARED
    :func:`~delta_lake_experiment_spark.operators.dedup.prune_table_by_live_ids`
    (one spelling with the verified-dedup family's prune_dedup_index,
    r16 — survivors persisted during the rewrite and RELEASED before
    returning, recompute-safe via the pinned scan file list).
    ``use_dv=True`` records deletion vectors instead of rewriting
    files (O(mask) written; the next compaction materializes)."""
    from pyspark.sql import functions as F

    from delta_lake_experiment_spark.operators.dedup import (
        prune_table_by_live_ids,
    )

    def _attempt(c: DeltaLakeClient) -> int:
        live = (
            c.scan(docs_table, with_stamps=False)
            .select(F.col(id_col).alias("id"))
            .distinct()
        )
        n_stale, _ = prune_table_by_live_ids(
            c, index_table, "id", live, use_dv=use_dv
        )
        return n_stale

    return client.run_tx(_attempt, retries=retries)


def refresh_aggregate_view(
    client: DeltaLakeClient,
    src_table: str,
    view_table: str,
    keys: "Sequence[str]",
    sum_cols: "Sequence[str]" = (),
    min_cols: "Sequence[str]" = (),
    max_cols: "Sequence[str]" = (),
    avg_cols: "Sequence[str]" = (),
    app_id: "str | None" = None,
    retries: int = 3,
) -> int:
    """Incrementally maintained COUNT/SUM/MIN/MAX/AVG materialized
    view: fold the SOURCE table's change feed since the last refresh
    into ``view_table`` (columns: keys…, ``n`` BIGINT, ``sum_<c>``
    DOUBLE per sum column, ``min_<c>``/``max_<c>`` per extremum
    column, ``avg_<c>`` DOUBLE per avg column) and stamp the refresh
    point — the lakehouse "materialized view maintained from CDC"
    primitive.

    Aggregate classes and their maintenance strategies:

    - **COUNT/SUM fold the net diff** — fully retractable, cost
      O(changed keys).
    - **MIN/MAX recompute per AFFECTED key**: a retracted extremum
      cannot be folded (the second-smallest value is not in the view),
      so the change feed names the touched keys and ONLY those groups
      are re-aggregated from the current source (a left-semi join
      restricts the scan; quiet keys never pay). This is the standard
      incremental-view-maintenance treatment for non-distributive
      retractions.
    - **AVG is derived state** (``sum_<c>/n``), recomputed from the
      folded sum at every refresh. Each avg column must also be in
      ``sum_cols`` (its sum IS the maintained state; the view schema
      carries both), and its values must be non-NULL — the fold
      raises in-plan on a NULL avg-column value, because a NULL-
      skipping SUM over a row-counting ``n`` would silently diverge
      from a direct AVG.

    Why this composition is exactly right for the engine's pieces:

    - **The delta is the change feed** (client.scan_changes): inserts
      count +1 / +value, deletes −1 / −value, and the feed is NET at
      file granularity — compaction and rewrites cancel out. Cost per
      refresh is O(files changed since the marker), never O(source).
    - **The merge is a full-outer join** of the current O(keys) view
      with the O(changed keys) delta; groups whose count reaches zero
      are dropped. NULL keys RAISE in-plan (a null-unsafe equi-join
      would silently split the NULL group and drop its decrements —
      the sampling-lane NULL contract).
    - **Freshness rides the commit**: the FOLDED SNAPSHOT VERSION is
      recorded as a ``txn (app_id, version)`` marker in the SAME
      atomic log record that publishes the new view contents — a
      crashed refresh either fully happened or never did. The marker
      is deliberately the snapshot version, NOT the commit slot:
      commit_tx may re-target a later version past disjoint
      concurrent commits, and a marker above the folded snapshot
      would silently skip those sources' changes on the next refresh.
      ``app_id`` defaults to ``"mv_<view_table>__src_<src_table>"`` —
      the source's name rides in the marker so ``update_rows`` can
      SELF-ENFORCE the contract limit below (a custom app_id opts out
      of that guard).
    - **The rewrite is overwrite_table**: the view is a derived
      O(keys) aggregate, cheapest to maintain by full replacement
      inside the refresh transaction.
    - **Quiet ranges cost metadata only**: if the source's live-file
      set and DV map are unchanged since the marker (only other
      tables committed), the refresh returns 0 with zero Spark jobs.
      If files changed but the NET diff is empty (compaction,
      rewrites), the refresh re-publishes the unchanged view once to
      ADVANCE the marker — so maintenance traffic is re-diffed at
      most once, never accumulated.

    CONTRACT LIMIT (inherits scan_changes' documented blind spot):
    sources mutated with ``update_rows`` are OUT OF CONTRACT — its
    stamp-preserving corrections are invisible to the change feed by
    design, so the view would silently diverge from a recompute.
    Maintain MV sources with inserts, deletes, MERGE and overwrites.
    The contract is self-enforcing under the default app_id:
    ``update_rows`` on a table whose snapshot carries an
    ``mv_*__src_<table>`` marker raises unless the caller passes
    ``allow_mv_sources=True`` (and then recomputes the view).

    Float caveat (documented, not hidden): incremental DOUBLE sums
    accumulate (base + delta) in a different order than a direct
    aggregate — ~1e-9 absolute noise, so consumers should round to
    their reporting grid (the registered query rounds to 2 over
    2-decimal inputs, where the true sum is always >= 0.005 from a
    rounding midpoint and the noise cannot flip a cent; the
    order-independent exact path is functions/numeric.py::exact_sum
    on a DECIMAL column). COUNT is exact. Runs in its own
    transaction(s); returns the snapshot version now certified fresh
    (0 = already fresh)."""
    from pyspark.sql import functions as F

    from delta_lake_experiment_spark.functions.guards import null_checked
    from delta_lake_experiment_spark.plans.snapshot import replay_log

    app = app_id or f"mv_{view_table}__src_{src_table}"
    key_list = list(keys)
    sums = list(sum_cols)
    mins, maxs, avgs = list(min_cols), list(max_cols), list(avg_cols)
    missing_avg_state = [a for a in avgs if a not in sums]
    if missing_avg_state:
        raise ValueError(
            f"avg_cols {missing_avg_state} need their sums maintained -"
            " add them to sum_cols (avg_<c> is derived from sum_<c>/n)"
        )
    mm_specs = [("min", c) for c in mins] + [("max", c) for c in maxs]

    def _attempt(c: DeltaLakeClient) -> int:
        tx = c.tx
        last = tx.snapshot.txns.get(app, 0)
        # versions committed by OTHER writers after our snapshot are
        # invisible here and will be folded by the next refresh
        cur = tx.snapshot.version
        if cur <= last:
            return 0
        # metadata-only quiet check: unchanged live-file set + DV map
        # for the SOURCE means the range holds only other tables'
        # commits (e.g. this view's own previous refresh) — no Spark
        # job, no marker movement needed
        from_snap = replay_log(c.store, as_of=last)
        # live_map (not raw .live): on a format-3 lazy checkpoint a
        # spilled-but-untouched source would read {} == {} from both
        # snapshots and be falsely judged quiet — certifying the view
        # fresh while stale (r12 review finding)
        src_quiet = (
            set(from_snap.live_map(src_table))
            == set(tx.snapshot.live_map(src_table))
            and from_snap.dvs.get(src_table, {})
            == tx.snapshot.dvs.get(src_table, {})
        )
        if src_quiet:
            return 0
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        # evaluated twice (emptiness probe + the overwrite write):
        # persist so the stamp anti-joins run once
        changes = c.scan_changes(src_table, from_version=last).persist()
        try:
            current = c.scan(view_table, with_stamps=False)
            if changes.first() is None:
                # pure rewrites (compaction) since the marker: net-zero
                # diff, but re-publish to ADVANCE the marker so this
                # range is never re-diffed
                c.overwrite_table(view_table, current)
                return cur
            gkeys = [
                null_checked(
                    F.col(k), "refresh_aggregate_view", f"key {k!r}"
                ).alias(k)
                for k in key_list
            ]
            measures = list(dict.fromkeys(sums + [c_ for _, c_ in mm_specs]))
            mcols = [
                null_checked(
                    F.col(m), "refresh_aggregate_view", f"avg column {m!r}"
                ).alias(m)
                if m in avgs
                else F.col(m)
                for m in measures
            ]
            delta = (
                changes.select(*gkeys, "_change_type", *mcols)
                .groupBy(*key_list)
                .agg(
                    F.sum(sign).cast("long").alias("__dn"),
                    *[
                        F.sum(
                            sign.cast("double") * F.col(s).cast("double")
                        ).alias(f"__ds_{s}")
                        for s in sums
                    ],
                )
            )
            merged = (
                current.join(delta, key_list, "full_outer")
                .select(
                    *key_list,
                    (
                        F.coalesce(F.col("n"), F.lit(0))
                        + F.coalesce(F.col("__dn"), F.lit(0))
                    ).alias("n"),
                    *[
                        (
                            F.coalesce(F.col(f"sum_{s}"), F.lit(0.0))
                            + F.coalesce(F.col(f"__ds_{s}"), F.lit(0.0))
                        ).alias(f"sum_{s}")
                        for s in sums
                    ],
                    *(
                        [F.col("__dn").isNotNull().alias("__touched")]
                        + [F.col(f"{op}_{c_}") for op, c_ in mm_specs]
                        if mm_specs
                        else []
                    ),
                )
                .filter(F.col("n") > 0)
            )
            if mm_specs:
                # MIN/MAX cannot fold retractions: recompute ONLY the
                # touched groups from the current source (left-semi
                # restricted), keep untouched groups' stored extrema
                affected = delta.select(*key_list)
                recomputed = (
                    c.scan(src_table, with_stamps=False)
                    .join(affected, key_list, "left_semi")
                    .groupBy(*key_list)
                    .agg(
                        *[
                            getattr(F, op)(c_).alias(f"__mm_{op}_{c_}")
                            for op, c_ in mm_specs
                        ]
                    )
                )
                merged = merged.join(recomputed, key_list, "left").select(
                    *key_list,
                    "n",
                    *[F.col(f"sum_{s}") for s in sums],
                    *[
                        F.when(
                            F.col("__touched"), F.col(f"__mm_{op}_{c_}")
                        )
                        .otherwise(F.col(f"{op}_{c_}"))
                        .alias(f"{op}_{c_}")
                        for op, c_ in mm_specs
                    ],
                )
            if avgs:
                merged = merged.withColumns(
                    {
                        f"avg_{a}": F.col(f"sum_{a}") / F.col("n")
                        for a in avgs
                    }
                )
            c.overwrite_table(view_table, merged)
            return cur
        finally:
            changes.unpersist()

    # run_tx cannot carry the txn marker (and the fresh case must
    # ABORT, which run_tx's always-commit contract cannot express), so
    # the OCC retry shape is replicated here with commit_tx(txn=...)
    last_err = None
    for _ in range(retries + 1):
        client.new_tx()
        try:
            folded = _attempt(client)
        except BaseException:
            client.abort_tx()
            raise
        if folded == 0:
            client.abort_tx()
            return 0
        try:
            client.commit_tx(txn=(app, folded))
            return folded
        except ConcurrentCommitError as e:  # pragma: no cover - raced
            last_err = e
    raise last_err
