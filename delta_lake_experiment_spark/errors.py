"""Engine error types.

Mirrors the reference's error values (reference
deltalakeclient/deltalakeclient.go:21-29) as Python exceptions.
"""


class EngineError(Exception):
    """Base class for engine errors."""


class ExistingTxError(EngineError):
    """A transaction is already open on this client (ref errExistingTx)."""


class NoTxError(EngineError):
    """Operation requires an open transaction (ref errNoTx)."""


class TableExistsError(EngineError):
    """CreateTable on an existing table (ref errTableExists)."""


class TableNotFoundError(EngineError):
    """Operation on an unknown table (ref errNoTable)."""


class TypeMismatchError(EngineError):
    """Range predicate over a non-comparable / mixed-type value
    (ref errTypeMismatch, deltalakeclient/writes.go:85-86)."""


class ConcurrentCommitError(EngineError):
    """Another transaction committed the same log version first
    (ref put-if-absent failure at transactions.go:144)."""


class ObjectExistsError(EngineError):
    """put_if_absent target already exists."""


class UnsupportedTableFeatureError(EngineError):
    """The log's ``protocol`` record names a table feature this client
    does not implement (Delta's minReaderVersion/minWriterVersion
    contract, feature-list form). ``features`` lists the missing
    feature names; ``kind`` is ``"reader"`` (this client cannot produce
    a correct READ of the log) or ``"writer"`` (it can read but must
    not COMMIT — it would corrupt an invariant the feature maintains).
    The remedy is always the same: upgrade the client."""

    def __init__(self, message: str, features=(), kind: str = "reader") -> None:
        super().__init__(message)
        self.features = sorted(features)
        self.kind = str(kind)


class UnsupportedCheckpointError(EngineError):
    """A checkpoint payload declares a format (``fmt``) newer than this
    client supports. Readers can fall back to replaying raw log
    records below the checkpoint ONLY if those survive retention —
    the safe remedy is upgrading the client. ``format`` is the
    payload's declared format number."""

    def __init__(self, message: str, format: int = 0) -> None:
        super().__init__(message)
        self.format = int(format)


class TableDroppedError(EngineError):
    """A consumer positioned on a table hit its DROP TABLE commit: the
    table (and any recreate under the same name, which starts a fresh
    lineage) can no longer serve this consumer's continuation. Raised
    by the change feed when the requested range crosses the drop and
    by the streaming source when a tailing stream reaches the drop
    record — named, never a silent empty diff or a wedged stream.
    ``version`` is the RESYNC point: the recreate's birth version when
    one exists (start new consumers there), else 0 (no recreate — there
    is nowhere to resync to)."""

    def __init__(self, message: str, version: int = 0) -> None:
        super().__init__(message)
        self.version = int(version)


class HistoryTruncatedError(EngineError):
    """Log replay hit a gap: ``vacuum_log`` reclaimed records below the
    retention horizon, so the requested historical version can no
    longer be reconstructed (Delta's logRetentionDuration contract).
    ``floor`` is the oldest version a reader can still reconstruct
    (``earliest_reconstructable_version``) — retry at or above it.
    ``base`` is the base checkpoint version the failing replay
    anchored on (diagnostic; below the horizon for deep time travel)."""

    def __init__(self, message: str, floor: int = 0, base: int = 0) -> None:
        super().__init__(message)
        self.floor = int(floor)
        self.base = int(base)
