"""Streaming incremental cardinality: per-batch HLL registers through
the exactly-once engine sink.

The batch sketch (operators/sketches.py) is MERGEABLE by per-register
max — which makes its streaming form almost declarative: each
micro-batch appends its own O(2^p) register rows to an ACID engine
table (idempotent under redelivery via the sink's txn markers), and
the CURRENT sketch of everything ever streamed is one groupBy-max over
the table — ``hll_merge`` semantics applied at read time, so the
writer needs no read-modify-write, no state store, and no watermark:
max is commutative, associative and idempotent, so batch boundaries
and replay order cannot change the answer. Register-row accumulation
is bounded by batches × 2^p and compacts away like any other engine
table.

This composes three lanes the repo certifies separately — Structured
Streaming, the transactional sink, and the value-oracled sketch — and
the registry query's oracle is the BATCH HLL SQL over the same input:
stream == batch, the core Structured Streaming guarantee, extended to
an approximate aggregate because the approximation itself is
deterministic.

Register-row growth is bounded by batches × 2^p; read-time merge is
O(table). :func:`compact_sketch_table` folds the accumulated rows into
ONE row per register inside one transaction (the
``compact_minhash_index`` maintenance pattern), so long-running
streams keep read-time merge at O(2^p) regardless of batch count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_experiment_spark.streaming.engine_sink import (
    foreach_batch_writer,
)

#: register-table schema (create the target table with this DDL)
HLL_TABLE_DDL = "bucket int, reg int"

#: counter-table schema for the CMS lane (re-export for symmetry)
from delta_lake_experiment_spark.operators.sketches import (  # noqa: E402
    CMS_TABLE_DDL,
)


def _with_periodic_compaction(process, client_factory, table: str,
                              compact_every: int, compactor):
    """Close the maintenance loop (VERDICT r8 item 7): run the fold
    compaction every ``compact_every`` committed batches, INSIDE the
    foreachBatch hook but AFTER the marker commit — so compaction is
    pure maintenance: a crash between commit and fold loses only the
    fold (the next cycle folds more rows), never data; a REDELIVERED
    batch skips its append but still reaches the fold — harmless (an
    already-compact table folds to a no-op 0-row change); and a
    concurrent appender hitting the fold's overwrite triggers
    first-committer-wins with the fold retrying on the fresh snapshot
    (compact_*_table's run_tx). ``compact_every=0`` disables."""
    if not compact_every:
        return process

    def wrapped(batch_df: DataFrame, batch_id: int) -> None:
        process(batch_df, batch_id)
        if (int(batch_id) + 1) % int(compact_every) == 0:
            compactor(client_factory(), table)

    return wrapped


def foreach_batch_hll_writer(client_factory, table: str, app_id: str,
                             key_col: str, p: int = 12,
                             compact_every: int = 0):
    """foreachBatch function: sketch the batch's ``key_col`` into
    (bucket, reg) rows and append them — the engine-sink skeleton
    provides the txn-marker exactly-once contract. ``compact_every=N``
    folds the register table back to O(2^p) rows every N batches (see
    :func:`_with_periodic_compaction`)."""
    from delta_lake_experiment_spark.operators.sketches import hll_registers

    def sketch(client, batch_df: DataFrame) -> DataFrame:
        return hll_registers(batch_df, key_col, p)

    return _with_periodic_compaction(
        foreach_batch_writer(client_factory, table, app_id, transform=sketch),
        client_factory, table, compact_every, compact_sketch_table,
    )


def write_hll_stream_to_table(
    stream_df: DataFrame,
    client_factory,
    table: str,
    app_id: str,
    key_col: str,
    checkpoint_dir: str,
    p: int = 12,
    compact_every: int = 0,
):
    """Start an AvailableNow stream appending per-batch HLL registers
    into an engine table; returns the StreamingQuery."""
    return (
        stream_df.writeStream.foreachBatch(
            foreach_batch_hll_writer(
                client_factory, table, app_id, key_col, p, compact_every
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_sketch_table(client, table: str, retries: int = 3) -> int:
    """Fold-compaction for the register table: rewrite the accumulated
    per-batch rows into ONE row per register — the groupBy-max merge,
    MATERIALIZED — with :meth:`overwrite_table`'s atomic replace in a
    single transaction. The estimate is unchanged by construction
    (``max`` is idempotent: max of per-batch maxes == max of the fold),
    read-time merge drops to O(2^p) regardless of how many batches have
    accumulated, and a concurrent batch append triggers
    first-committer-wins so the fold can never lose a register (the
    loser retries on the fresh snapshot). Already-compact tables are a
    no-op (returns 0; no write, no commit actions beyond the replay).
    At one batch/minute for a year a p=12 table holds ~2e9 register
    rows — this fold is the difference between that and 4096.

    Returns the number of rows removed."""

    def _attempt(c) -> int:
        regs = c.scan(table, with_stamps=False)
        n_total = regs.count()
        folded = (
            regs.groupBy("bucket")
            .agg(F.max("reg").alias("reg"))
            .localCheckpoint(eager=True)  # sever lineage from the files
        )                                 # the overwrite retires
        n_folded = folded.count()
        if n_folded == n_total:
            return 0
        c.overwrite_table(table, folded)
        return n_total - n_folded

    return client.run_tx(_attempt, retries=retries)


def table_sketch_estimate(client, table: str, p: int = 12) -> DataFrame:
    """(est_distinct) — the merged estimate over EVERYTHING the
    register table has accumulated: one groupBy-max (hll_merge at read
    time) + the exact-integer estimate."""
    from delta_lake_experiment_spark.operators.sketches import hll_estimate

    regs = (
        client.scan(table, with_stamps=False)
        .groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
    )
    return hll_estimate(regs, p)


# -- streaming count-min (heavy-hitter counts over everything streamed) -
#
# Same skeleton as the HLL lane with ONE algebraic difference that the
# design leans on: CMS merges by ADDITION, which is commutative and
# associative but NOT idempotent. Per-batch counter rows still append
# through the exactly-once sink and still merge at read time
# (groupBy-SUM instead of groupBy-max), but replay protection comes
# ENTIRELY from the sink's txn markers — a redelivered batch id is
# skipped before its increments exist, never "absorbed" by the merge
# the way a re-maxed register would be. The stream == batch oracle
# claim survives because the marker makes the append-set exact.


def foreach_batch_cms_writer(client_factory, table: str, app_id: str,
                             key_col: str, d: int = 3, w: int = 1024,
                             compact_every: int = 0):
    """foreachBatch function: sketch the batch's ``key_col`` into
    (r, c, cnt) counter rows and append them through the txn-marker
    exactly-once sink. ``compact_every=N`` folds the counter table
    back to O(d·w) rows every N batches."""
    from delta_lake_experiment_spark.operators.sketches import cms_counters

    def sketch(client, batch_df: DataFrame) -> DataFrame:
        return cms_counters(batch_df, key_col, d=d, w=w)

    return _with_periodic_compaction(
        foreach_batch_writer(client_factory, table, app_id, transform=sketch),
        client_factory, table, compact_every, compact_cms_table,
    )


def write_cms_stream_to_table(
    stream_df: DataFrame,
    client_factory,
    table: str,
    app_id: str,
    key_col: str,
    checkpoint_dir: str,
    d: int = 3,
    w: int = 1024,
    compact_every: int = 0,
):
    """Start an AvailableNow stream appending per-batch CMS counter
    rows into an engine table; returns the StreamingQuery."""
    return (
        stream_df.writeStream.foreachBatch(
            foreach_batch_cms_writer(
                client_factory, table, app_id, key_col, d, w, compact_every
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def table_cms_estimate(
    client, table: str, keys_df: DataFrame, key_col: str,
    d: int = 3, w: int = 1024,
) -> DataFrame:
    """``(<key_col>, est)`` — point estimates over EVERYTHING the
    counter table has accumulated: one groupBy-SUM (cms_merge at read
    time) + the exact-integer min-probe."""
    from delta_lake_experiment_spark.operators.sketches import cms_estimate

    counters = (
        client.scan(table, with_stamps=False)
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return cms_estimate(counters, keys_df, key_col, d=d, w=w)


def compact_cms_table(client, table: str, retries: int = 3) -> int:
    """Fold-compaction for the counter table: rewrite accumulated
    per-batch rows into ONE row per (r, c) cell — the groupBy-SUM
    merge, materialized atomically in one transaction. Estimates are
    unchanged (addition is associative; the fold is the same sum the
    read-time merge computes), read cost drops to O(d·w) regardless of
    batch count, and a concurrent batch append hits
    first-committer-wins so no increment can be lost or doubled.
    Returns the number of rows removed (0 = already compact)."""

    def _attempt(c) -> int:
        rows = c.scan(table, with_stamps=False)
        n_total = rows.count()
        folded = (
            rows.groupBy("r", "c")
            .agg(F.sum("cnt").alias("cnt"))
            .localCheckpoint(eager=True)  # sever lineage from the files
        )                                 # the overwrite retires
        n_folded = folded.count()
        if n_folded == n_total:
            return 0
        c.overwrite_table(table, folded)
        return n_total - n_folded

    return client.run_tx(_attempt, retries=retries)
