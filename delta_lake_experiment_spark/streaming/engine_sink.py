"""Exactly-once streaming sink INTO engine tables.

``foreachBatch`` gives at-least-once delivery: after a crash between
"engine commit" and "stream checkpoint", Structured Streaming redelivers
the batch. The engine's log de-duplicates it — each commit carries a
``txn {app_id, batch}`` marker (the Delta transactional-sink pattern);
replay tracks the highest committed batch per app, and a redelivered
batch is skipped. Commit atomicity comes from the same put-if-absent
log write as every other transaction, so "data visible" and "batch
recorded" are one atomic event.

Concurrent batch commits from other writers are absorbed with
``retry_independent`` (disjoint-table retry); a real conflict on the
target table fails the batch, and Structured Streaming retries it —
idempotently, thanks to the marker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def run_marked_batch(client_factory, app_id: str, batch_id: int, body) -> bool:
    """THE exactly-once micro-batch skeleton, in one copy (r15 — the
    module always promised this; the upsert and fuzzy sinks had grown
    their own): fresh client, marker check against the replayed
    snapshot (a redelivered batch aborts without side effects),
    ``body(client)`` stages the batch's writes inside the open
    transaction, then one commit carrying the ``txn {app_id, batch}``
    marker with disjoint-table retry. Returns False when the batch was
    a redelivery no-op, True when the body ran and committed — so a
    protocol fix (marker semantics, retry policy) lands here once and
    every sink variant inherits it."""
    client = client_factory()
    client.new_tx()
    last = client.tx.snapshot.txns.get(app_id, -1)
    if batch_id <= last:
        client.abort_tx()  # redelivered batch: already in the log
        return False
    try:
        body(client)
        client.commit_tx(retry_independent=3, txn=(app_id, batch_id))
    except BaseException:
        # a failed body/commit must not leave the client mid-tx: each
        # micro-batch gets a fresh client today, but a caller reusing
        # the factory's client (or doing post-failure work on it)
        # would silently violate the one-tx-per-client contract (r15
        # advisor note). commit_tx may have already closed the tx on
        # its own failure path — abort only what is still open.
        if client.tx is not None:
            client.abort_tx()
        raise
    return True


def foreach_batch_writer(client_factory, table: str, app_id: str, transform=None):
    """Build a foreachBatch function: ``client_factory() -> DeltaLakeClient``
    (a fresh client per call keeps the one-tx-per-client contract).

    ``transform(client, batch_df) -> DataFrame``, when given, rewrites
    the batch INSIDE the open transaction before the append — it may
    read the table through ``client`` (snapshot-consistent with the
    commit) to e.g. anti-join against existing keys
    (streaming/ingest.py). The marker/commit skeleton is
    :func:`run_marked_batch` — one copy for every engine-sink
    variant."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        def body(client):
            df = batch_df
            if transform is not None:
                df = transform(client, df)
            client.write_dataframe(table, df)

        run_marked_batch(client_factory, app_id, batch_id, body)

    return process


def foreach_batch_upsert(
    client_factory,
    table: str,
    app_id: str,
    order_by: str = None,
    when_not_matched: str = "insert",
):
    """MERGE-based exactly-once streaming UPSERT sink (the Delta
    foreachBatch-merge pattern): each micro-batch merges into the
    primary-keyed table — matched keys get a new latest-wins version,
    unmatched keys insert — under the same ``txn {app_id, batch}``
    replay protection as the append sink, so a redelivered batch is a
    no-op even though MERGE itself is not idempotent.

    ``order_by``: when a single batch can carry SEVERAL versions of one
    key (CDC bursts), name the event-order column and the sink keeps
    only each key's LAST row before merging — without it, intra-batch
    version order would be whatever the shuffle produced (the same
    caveat Delta documents for foreachBatch merge). The merge's
    source-key-bounds file pruning makes each micro-batch touch
    O(matching files), never O(table) — the property that lets a
    trickle of CDC events update a huge table cheaply.

    IDENTITY tables (operational note): a batch that MINTS identity
    values carries one high-water-mark advance record, so every
    allocating commit on the table serializes against every other
    concurrent allocator — the second committer conflicts, Structured
    Streaming retries the batch, and the ``txn`` marker keeps the
    retry idempotent (Delta's identity allocation has the same
    documented contract). One sink streaming into an identity table is
    unaffected (one advance per micro-batch, already amortized across
    the batch's rows); N CONCURRENT sinks/writers allocating on one
    table retry ~1/N of their batches under sustained overlap — prefer
    a single allocating stream per identity table, BY DEFAULT mode
    with caller-supplied keys (supplied-only batches skip the advance
    entirely since r12 and do not serialize), or opt-in BLOCK
    RESERVATION (``client.reserve_identity``, r13): each writer
    pre-commits one block-sized advance, then its row-buffered minting
    carries no advance record at all — concurrent holders stop
    conflicting on identity metadata entirely. This sink's BULK merge
    path keeps the per-batch advance (executor-side minting rides
    ``_row_idx`` stamps whose partition-bit gaps make the consumed
    span unboundable up front), which stays the right default at one
    advance per micro-batch."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        def body(client):
            keys = client.tx.snapshot.pkeys.get(table)
            src = batch_df
            if order_by is not None and keys:
                w = Window.partitionBy(*keys).orderBy(F.col(order_by).desc())
                src = (
                    src.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
            client.merge(table, src, when_not_matched=when_not_matched)

        run_marked_batch(client_factory, app_id, batch_id, body)

    return process


def write_stream_to_table(
    stream_df: DataFrame,
    client_factory,
    table: str,
    app_id: str,
    checkpoint_dir: str,
):
    """Start an AvailableNow stream draining into an engine table with
    exactly-once semantics; returns the StreamingQuery."""
    return (
        stream_df.writeStream.foreachBatch(
            foreach_batch_writer(client_factory, table, app_id)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
