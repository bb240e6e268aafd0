"""Minimal SQL DML statement router.

The reference has no SQL at all — its API *is* the plan (SURVEY §3).
Our engine exposes reads through Spark SQL views (``Client.sql``), but
writes went through Python methods only. This module closes that gap
for the DML shapes the engine actually supports, by parsing:

- ``INSERT INTO t  <select ...>``           -> ``insert_into``
- ``DELETE FROM t WHERE c BETWEEN a AND b`` -> ``delete_rows`` (COW/DV)
- ``DELETE FROM t WHERE c = v``             -> ``delete_rows(v, v)``
  (equality-as-degenerate-range, exactly how the reference's tests
  express point deletes — main_test.go:226, :313)
- ``UPDATE t SET c1 = v1[, ...] WHERE c BETWEEN a AND b | c = v``
                                            -> ``update_rows``
- ``MERGE INTO t USING (<select>) | src_table
     [WHEN MATCHED THEN UPDATE|DELETE|IGNORE]
     [WHEN NOT MATCHED THEN INSERT|IGNORE]``  -> ``merge`` (matching on
  the table's declared primary keys — the reference's 'conditional
  updates' roadmap item, README.md:31; clause defaults are
  UPDATE / INSERT, Delta-style)
- ``CREATE TABLE t (<ddl>) [PRIMARY KEY (c, ...)] [BLOOM (c, ...)]
  [GENERATED (c AS expr, ...)]
     [CLUSTER BY (c, ...)]``                  -> ``create_table``
- ``OPTIMIZE t [FILES n] [TARGET SIZE bytes] [WHERE c BETWEEN a AND b | c = v]
     [CLUSTER BY (c, ...)] | [ZORDER BY (c, ...)]`` -> ``compact``
  (WHERE selects FILES by stats intersection — selective compaction
  of a hot range; no rows are deleted)
- ``OPTIMIZE SKETCH t``                       -> fold-compaction of an
  HLL register / CMS counter table (streaming/sketch.py) — the sketch
  maintenance entry; runs outside a transaction like VACUUM
- ``VACUUM t [RETAIN n VERSIONS] [DRY RUN]``  -> ``vacuum`` (table arg
  ignored — vacuum is store-wide, kept for SQL familiarity; DRY RUN
  returns the reclaim report without deleting)
- ``RESTORE TABLE t TO VERSION n``            -> ``restore_table``
- ``GENERATE MANIFEST FOR t [MATERIALIZE]``   -> ``write_manifest``
  (external-reader file list; raises on DV/mapped/defaulted tables
  unless MATERIALIZE runs the rewrite remedy in the same call)
- ``DESCRIBE DETAIL t``                       -> ``describe_detail``
- ``DESCRIBE CHANGES t FROM v [TO v]``        -> ``scan_changes`` (CDF)
- ``ALTER TABLE t RENAME COLUMN a TO b``      -> ``rename_column``
- ``ALTER TABLE t DROP COLUMN a``             -> ``drop_column``
- ``ALTER TABLE t ALTER COLUMN a TYPE ty``    -> ``widen_column``
- ``ALTER TABLE t ALTER COLUMN a SET NOT NULL`` -> ``set_not_null``
  (``DROP NOT NULL`` -> ``drop_not_null``)
- ``ALTER TABLE t ADD COLUMNS (a ty, ...)``   -> ``add_columns``
  (all four are the O(1)-metadata schema evolution lane: column
  mapping for rename/drop, type widening, NULL-backfilled adds)
- ``CREATE OR REPLACE TABLE t (<ddl>) ...``   -> atomic
  drop-if-exists + fresh-lineage create in ONE commit
  (``create_or_replace_table``)
- ``CREATE TABLE dst [SHALLOW] CLONE src``    -> ``clone_table``
  (zero-copy metadata clone)
- ``DROP TABLE t`` / ``UNDROP TABLE t``       -> ``drop_table`` /
  ``undrop_table``; ``SHOW DROPPED TABLES [VERIFY]`` ->
  ``list_dropped_tables`` (discovery: drop version, timestamp,
  recoverable-now + reason; VERIFY existence-probes the bytes)
- ``RESTORE TABLE t TO VERSION n | TO TIMESTAMP 'ts'`` ->
  ``restore_table`` (the timestamp resolves like TIMESTAMP AS OF)
- ``ALTER TABLE t ADD CONSTRAINT name CHECK (expr)`` /
  ``DROP CONSTRAINT name``                    -> ``add_constraint`` /
  ``drop_constraint`` (ADD validates existing rows in one scan)
- ``ALTER TABLE t RESERVE IDENTITY (col, n)`` -> ``reserve_identity``
  (outside-tx block reservation; returns (first, last) as one row)

This is a deliberate micro-grammar, NOT a SQL parser: predicates are
restricted to the engine's native inclusive-range primitive (reference
writes.go:58-88), so every parsed statement maps 1:1 onto a
transactional operator with file-granularity COW semantics. Anything
that doesn't match raises ``UnsupportedSqlError`` with the reason —
callers then use ``Client.sql`` (arbitrary read-only SQL via Catalyst)
or the Python API. Literals: integers, floats, and single-quoted
strings (with '' escaping).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Optional

from delta_lake_experiment_spark.errors import TypeMismatchError


class UnsupportedSqlError(TypeMismatchError):
    """Statement is syntactically valid SQL but outside the DML
    micro-grammar this engine executes transactionally."""


_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
# int | float | 'string with '' escapes'
_LIT = r"(?:-?\d+\.\d+|-?\d+|'(?:[^']|'')*')"

_DELETE_RE = re.compile(
    rf"^\s*DELETE\s+FROM\s+({_IDENT})\s+WHERE\s+({_IDENT})\s+"
    rf"(?:BETWEEN\s+({_LIT})\s+AND\s+({_LIT})|=\s*({_LIT}))\s*;?\s*$",
    re.IGNORECASE,
)
_UPDATE_RE = re.compile(
    rf"^\s*UPDATE\s+({_IDENT})\s+SET\s+(.+?)\s+WHERE\s+({_IDENT})\s+"
    rf"(?:BETWEEN\s+({_LIT})\s+AND\s+({_LIT})|=\s*({_LIT}))\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_SET_ITEM_RE = re.compile(rf"^\s*({_IDENT})\s*=\s*({_LIT})\s*$")
_INSERT_RE = re.compile(
    rf"^\s*INSERT\s+INTO\s+({_IDENT})\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_RE = re.compile(
    rf"^\s*MERGE\s+INTO\s+({_IDENT})\s+USING\s+(.+?)\s*"
    rf"((?:WHEN\s+(?:NOT\s+)?MATCHED\s+THEN\s+{_IDENT}\s*)*)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_CLAUSE_RE = re.compile(
    rf"WHEN\s+(NOT\s+)?MATCHED\s+THEN\s+({_IDENT})", re.IGNORECASE
)
_COLLIST = rf"\(\s*{_IDENT}(?:\s*,\s*{_IDENT})*\s*\)"
_CREATE_RE = re.compile(
    rf"^\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?TABLE\s+({_IDENT})\s*\((.+?)\)\s*"
    rf"(?:PRIMARY\s+KEY\s*({_COLLIST})\s*)?"
    rf"(?:BLOOM\s*({_COLLIST})\s*)?"
    rf"(?:CLUSTER\s+BY\s*({_COLLIST})\s*)?"
    # IDENTITY bodies carry no nested parens (cols + integer options)
    rf"(?:IDENTITY\s*\(([^)]+)\)\s*)?"
    # GENERATED must be the LAST clause: its expressions may contain
    # any SQL (parens, commas, quotes), so the greedy capture runs to
    # the final close-paren and a quote/paren-aware splitter takes over
    rf"(?:GENERATED\s*\((.+)\)\s*)?;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OPTIMIZE_SKETCH_RE = re.compile(
    rf"^\s*OPTIMIZE\s+SKETCH\s+({_IDENT})\s*;?\s*$", re.IGNORECASE
)
_OPTIMIZE_RE = re.compile(
    rf"^\s*OPTIMIZE\s+({_IDENT})\s*(?:FILES\s+(\d+)\s*)?"
    rf"(?:TARGET\s+SIZE\s+(\d+)\s*)?"
    rf"(?:WHERE\s+({_IDENT})\s+"
    rf"(?:BETWEEN\s+({_LIT})\s+AND\s+({_LIT})|=\s*({_LIT}))\s*)?"
    rf"(?:CLUSTER\s+BY\s*({_COLLIST})\s*|ZORDER\s+BY\s*({_COLLIST})\s*)?;?\s*$",
    re.IGNORECASE,
)
_VACUUM_RE = re.compile(
    rf"^\s*VACUUM\s+({_IDENT})\s*(?:RETAIN\s+(\d+)\s+VERSIONS\s*)?"
    rf"(?:(DRY\s+RUN)\s*)?;?\s*$",
    re.IGNORECASE,
)
"""``VACUUM LOG`` is checked before ``VACUUM <table>``, so it shadows a
table literally named ``log`` — documented on ``client.vacuum_log``;
vacuum such a table via the Python API. Clause separators require real
whitespace (``VACUUM LOGRETAIN ...`` does not parse)."""
_VACUUM_LOG_RE = re.compile(
    r"^\s*VACUUM\s+LOG(?:\s+RETAIN\s+(\d+)\s+HOURS)?"
    r"(?:\s+(DRY\s+RUN))?\s*;?\s*$",
    re.IGNORECASE,
)
_RESTORE_RE = re.compile(
    rf"^\s*RESTORE\s+TABLE\s+({_IDENT})\s+TO\s+"
    rf"(?:VERSION\s+(\d+)|TIMESTAMP\s+('(?:[^']|'')*'))\s*;?\s*$",
    re.IGNORECASE,
)
# CREATE TABLE dst [SHALLOW] CLONE src: zero-copy metadata clone
# (Delta's CREATE TABLE ... CLONE; this engine's clones are always
# shallow - there is nothing to deep-copy that a write would not fork)
_CLONE_RE = re.compile(
    rf"^\s*CREATE\s+TABLE\s+({_IDENT})\s+(?:SHALLOW\s+)?CLONE\s+"
    rf"({_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
# ALTER TABLE t ADD CONSTRAINT name CHECK (expr) / DROP CONSTRAINT name
# (Delta's constraint verbs): post-create CHECK management on the same
# lane create-time checks ride; ADD validates existing rows first
_ALTER_ADD_CONSTRAINT_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+CONSTRAINT\s+({_IDENT})"
    rf"\s+CHECK\s*\((.+)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_DROP_CONSTRAINT_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+CONSTRAINT\s+"
    rf"({_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DESCRIBE_HISTORY_RE = re.compile(
    rf"^\s*DESCRIBE\s+HISTORY\s+({_IDENT})\s*(?:LIMIT\s+(\d+)\s*)?;?\s*$",
    re.IGNORECASE,
)
_DESCRIBE_DETAIL_RE = re.compile(
    rf"^\s*DESCRIBE\s+DETAIL\s+({_IDENT})\s*;?\s*$", re.IGNORECASE
)
_DESCRIBE_CHANGES_RE = re.compile(
    rf"^\s*DESCRIBE\s+CHANGES\s+({_IDENT})\s+FROM\s+(\d+)"
    rf"\s*(?:TO\s+(\d+)\s*)?;?\s*$",
    re.IGNORECASE,
)
_GENERATE_MANIFEST_RE = re.compile(
    rf"^\s*GENERATE\s+MANIFEST\s+FOR\s+({_IDENT})\s*(MATERIALIZE)?\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_RENAME_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_IDENT})\s+RENAME\s+COLUMN\s+({_IDENT})"
    rf"\s+TO\s+({_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_RENAME_TABLE_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_IDENT})\s+RENAME\s+TO\s+({_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_DROP_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+COLUMN\s+({_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_TYPE_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+({_IDENT})"
    rf"\s+TYPE\s+([A-Za-z][A-Za-z0-9_]*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_NOT_NULL_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+({_IDENT})"
    rf"\s+(SET|DROP)\s+NOT\s+NULL\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_ADD_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+COLUMNS?\s*\((.+?)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_SYNC_IDENTITY_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_IDENT})\s+SYNC\s+IDENTITY\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_TABLE_RE = re.compile(
    rf"^\s*DROP\s+TABLE\s+({_IDENT})\s*;?\s*$", re.IGNORECASE
)
_UNDROP_TABLE_RE = re.compile(
    rf"^\s*UNDROP\s+TABLE\s+({_IDENT})\s*;?\s*$", re.IGNORECASE
)
# ALTER TABLE t RESERVE IDENTITY (col, n): block reservation for
# row-buffered multi-writer ingest (routed to client.reserve_identity;
# outside-tx, like UPGRADE PROTOCOL)
_RESERVE_IDENTITY_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_IDENT})\s+RESERVE\s+IDENTITY\s*"
    rf"\(\s*({_IDENT})\s*,\s*(\d+)\s*\)\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_DROPPED_RE = re.compile(
    r"^\s*SHOW\s+DROPPED\s+TABLES(?:\s+(VERIFY))?\s*;?\s*$", re.IGNORECASE
)
# ALTER TABLE t UPGRADE PROTOCOL (READER FEATURES (f,...), WRITER
# FEATURES (f,...)) — either clause optional, at least one required.
# The table name is accepted for SQL familiarity (Delta upgrades
# per-table); this engine's protocol is log-wide, like VACUUM LOG.
_UPGRADE_PROTOCOL_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_IDENT})\s+UPGRADE\s+PROTOCOL\s*\(\s*"
    r"(?:READER\s+FEATURES\s*\(([^)]*)\)\s*,?\s*)?"
    r"(?:WRITER\s+FEATURES\s*\(([^)]*)\)\s*)?\)\s*;?\s*$",
    re.IGNORECASE,
)


_IDENTITY_ITEM_RE = re.compile(
    rf"^\s*({_IDENT})"
    r"(?:\s+START\s+WITH\s+(-?\d+))?"
    r"(?:\s+INCREMENT\s+BY\s+(-?\d+))?"
    r"(?:\s+(BY\s+DEFAULT))?\s*$",
    re.IGNORECASE,
)


def _parse_identity(body: str) -> dict:
    """Parse the IDENTITY clause body:
    ``col [START WITH n] [INCREMENT BY n] [BY DEFAULT], ...`` (Delta's
    GENERATED ALWAYS / BY DEFAULT AS IDENTITY options, defaults 1/1/
    ALWAYS)."""
    out: dict = {}
    for item in body.split(","):
        m = _IDENTITY_ITEM_RE.match(item)
        if not m:
            raise UnsupportedSqlError(
                f"IDENTITY item {item.strip()!r}: expected"
                " 'col [START WITH n] [INCREMENT BY n] [BY DEFAULT]'"
            )
        out[m.group(1)] = {
            "start": int(m.group(2)) if m.group(2) else 1,
            "step": int(m.group(3)) if m.group(3) else 1,
            "mode": "default" if m.group(4) else "always",
        }
    return out


def _parse_generated(body: str) -> dict:
    """Parse the GENERATED clause body: ``col AS expr, col AS expr``.
    Expressions are arbitrary SQL, so items split on TOP-LEVEL commas
    only (paren depth 0, outside single-quoted literals with ''
    escaping)."""
    items, depth, in_str, cur = [], 0, False, []
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if in_str:
            if ch == "'":
                if i + 1 < n and body[i + 1] == "'":
                    cur.append("''")
                    i += 2
                    continue
                in_str = False
            cur.append(ch)
        else:
            if ch == "'":
                in_str = True
                cur.append(ch)
            elif ch == "(":
                depth += 1
                cur.append(ch)
            elif ch == ")":
                depth -= 1
                cur.append(ch)
            elif ch == "," and depth == 0:
                items.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        i += 1
    items.append("".join(cur))
    out: dict = {}
    for item in items:
        item = item.strip()
        if not item:
            continue
        m = re.match(rf"^({_IDENT})\s+AS\s+(.+)$", item, re.IGNORECASE | re.DOTALL)
        if not m:
            raise UnsupportedSqlError(
                f"GENERATED item must be 'col AS expr', got {item!r}"
            )
        out[m.group(1)] = m.group(2).strip()
    return out


def _cols(list_text: str) -> list[str]:
    return [c.strip() for c in list_text.strip()[1:-1].split(",")]


@dataclass
class Delete:
    table: str
    column: str
    start: Any
    end: Any


@dataclass
class Update:
    table: str
    set_values: dict[str, Any]
    column: str
    start: Any
    end: Any


@dataclass
class Insert:
    table: str
    query: str


@dataclass
class Merge:
    table: str
    query: str  # SELECT text producing the source rows
    when_matched: str  # update | delete | ignore
    when_not_matched: str  # insert | ignore


@dataclass
class CreateTable:
    table: str
    schema_ddl: str
    primary_keys: list
    bloom_columns: list
    cluster_by: list
    # GENERATED (col AS expr, ...): declared generation expressions
    generated: dict = field(default_factory=dict)
    # IDENTITY (col [START WITH n] [INCREMENT BY n], ...): minted
    # BIGINT sequences — col -> {"start", "step"}
    identity: dict = field(default_factory=dict)
    # CREATE OR REPLACE TABLE: atomic drop-if-exists + create in one
    # commit (routed to client.create_or_replace_table)
    or_replace: bool = False


@dataclass
class Optimize:
    table: str
    target_files: int
    cluster_by: Optional[list]
    zorder_by: Optional[list]
    # (column, lo, hi) file-selection range, or None = whole table
    where: Optional[tuple] = None
    # size-aware bin-packing: rewrite only files under this byte size
    # (OPTIMIZE t TARGET SIZE n); None = count-based target_files mode
    target_bytes: Optional[int] = None


@dataclass
class Vacuum:
    table: str
    retain_versions: int
    dry_run: bool = False


@dataclass
class VacuumLog:
    # log-metadata retention (Delta's logRetentionDuration); store-wide
    # like Vacuum — the log is shared across tables
    retain_hours: float
    dry_run: bool = False


@dataclass
class CloneTable:
    # CREATE TABLE dst [SHALLOW] CLONE src -> client.clone_table
    src: str
    dst: str


@dataclass
class AlterAddConstraint:
    # ALTER TABLE t ADD CONSTRAINT name CHECK (expr) -> add_constraint
    table: str
    name: str
    expr: str


@dataclass
class AlterDropConstraint:
    # ALTER TABLE t DROP CONSTRAINT name -> drop_constraint
    table: str
    name: str


@dataclass
class Restore:
    table: str
    # exactly one of version / timestamp is set (TO VERSION n | TO
    # TIMESTAMP 'ts'; the timestamp resolves to the newest commit
    # at-or-before it, the same resolution TIMESTAMP AS OF uses)
    version: Optional[int] = None
    timestamp: Optional[str] = None


@dataclass
class DescribeHistory:
    table: str
    limit: Optional[int]


@dataclass
class DescribeDetail:
    table: str


@dataclass
class DescribeChanges:
    table: str
    from_version: int
    to_version: Optional[int]


@dataclass
class GenerateManifest:
    table: str
    materialize: bool = False


@dataclass
class AlterRenameColumn:
    table: str
    old: str
    new: str


@dataclass
class AlterDropColumn:
    table: str
    column: str


@dataclass
class AlterColumnType:
    table: str
    column: str
    new_type: str


@dataclass
class AlterAddColumns:
    table: str
    columns_ddl: str


@dataclass
class OptimizeSketch:
    table: str


@dataclass
class AlterNotNull:
    table: str
    column: str
    set: bool  # True = SET NOT NULL, False = DROP NOT NULL


@dataclass
class AlterSyncIdentity:
    # ALTER TABLE t SYNC IDENTITY (Delta's): lift identity high-water
    # marks past manually supplied BY DEFAULT values
    table: str


@dataclass
class DropTableStmt:
    # DROP TABLE t: remove the table from the lake (O(1) drop record;
    # vacuum reclaims the data after retention)
    table: str


@dataclass
class UndropTableStmt:
    # UNDROP TABLE t: restore a dropped table from just below its drop
    # record, while inside both retention windows (Delta's UNDROP)
    table: str


@dataclass
class ReserveIdentity:
    # ALTER TABLE t RESERVE IDENTITY (col, n): commit one block advance
    # so subsequent row-buffered minting carries no advance record
    table: str
    column: str
    n: int


@dataclass
class ShowDroppedTables:
    # SHOW DROPPED TABLES [VERIFY]: dropped-table discovery (the UNDROP
    # counterpart of DESCRIBE HISTORY; routed to list_dropped_tables).
    # VERIFY additionally existence-probes each recoverable candidate's
    # data objects (undrop's batched per-class LIST), downgrading
    # `recoverable` when vacuum already reclaimed the bytes.
    verify: bool = False


@dataclass
class RenameTableStmt:
    # ALTER TABLE a RENAME TO b: atomic zero-copy clone + drop
    old: str
    new: str


@dataclass
class UpgradeProtocol:
    # ALTER TABLE t UPGRADE PROTOCOL (...): pre-stamp features before
    # a fleet migration (routed to client.upgrade_protocol; log-wide)
    table: str
    reader_features: list[str]
    writer_features: list[str]


def _literal(tok: str) -> Any:
    if tok.startswith("'"):
        return tok[1:-1].replace("''", "'")
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    return float(tok)


def _bounds(m_between_lo: Optional[str], m_between_hi: Optional[str], m_eq: Optional[str]) -> tuple[Any, Any]:
    if m_eq is not None:
        v = _literal(m_eq)
        return v, v
    return _literal(m_between_lo), _literal(m_between_hi)


def parse_dml(sql: str):
    """Parse one statement into Delete / Update / Insert, or None when
    the statement is not DML (caller should treat it as a read query).
    Raises UnsupportedSqlError for DML shapes outside the grammar."""
    stripped = sql.strip()
    head = stripped.split(None, 1)[0].upper() if stripped else ""
    if head == "DELETE":
        m = _DELETE_RE.match(sql)
        if not m:
            raise UnsupportedSqlError(
                "DELETE supports exactly: DELETE FROM t WHERE col BETWEEN "
                "lo AND hi | col = v (the engine's native range primitive)"
            )
        lo, hi = _bounds(m.group(3), m.group(4), m.group(5))
        return Delete(table=m.group(1), column=m.group(2), start=lo, end=hi)
    if head == "UPDATE":
        m = _UPDATE_RE.match(sql)
        if not m:
            raise UnsupportedSqlError(
                "UPDATE supports exactly: UPDATE t SET c = lit[, ...] WHERE "
                "col BETWEEN lo AND hi | col = v"
            )
        set_values: dict[str, Any] = {}
        for item in _split_top_level_commas(m.group(2)):
            sm = _SET_ITEM_RE.match(item)
            if not sm:
                raise UnsupportedSqlError(f"unsupported SET clause item: {item!r}")
            set_values[sm.group(1)] = _literal(sm.group(2))
        lo, hi = _bounds(m.group(4), m.group(5), m.group(6))
        return Update(table=m.group(1), set_values=set_values, column=m.group(3), start=lo, end=hi)
    if head == "INSERT":
        m = _INSERT_RE.match(sql)
        if not m:
            raise UnsupportedSqlError("INSERT supports: INSERT INTO t <select query>")
        return Insert(table=m.group(1), query=m.group(2))
    if head == "MERGE":
        m = _MERGE_RE.match(sql)
        if not m:
            raise UnsupportedSqlError(
                "MERGE supports exactly: MERGE INTO t USING (<select>) | src "
                "[WHEN MATCHED THEN UPDATE|DELETE|IGNORE] "
                "[WHEN NOT MATCHED THEN INSERT|IGNORE] (matching on the "
                "table's declared primary keys)"
            )
        source = m.group(2).strip()
        if source.startswith("(") and source.endswith(")"):
            source = source[1:-1].strip()
        elif re.fullmatch(_IDENT, source):
            source = f"SELECT * FROM {source}"
        else:
            raise UnsupportedSqlError(
                "MERGE source must be a parenthesized SELECT or a view name"
            )
        when_matched, when_not_matched = "update", "insert"
        for neg, action in _MERGE_CLAUSE_RE.findall(m.group(3) or ""):
            action = action.lower()
            if neg:
                if action not in ("insert", "ignore"):
                    raise UnsupportedSqlError(
                        f"WHEN NOT MATCHED THEN {action.upper()}: only INSERT|IGNORE"
                    )
                when_not_matched = action
            else:
                if action not in ("update", "delete", "ignore"):
                    raise UnsupportedSqlError(
                        f"WHEN MATCHED THEN {action.upper()}: only UPDATE|DELETE|IGNORE"
                    )
                when_matched = action
        return Merge(
            table=m.group(1),
            query=source,
            when_matched=when_matched,
            when_not_matched=when_not_matched,
        )
    if head == "CREATE":
        m = _CLONE_RE.match(sql)
        if m:
            return CloneTable(dst=m.group(1), src=m.group(2))
        m = _CREATE_RE.match(sql)
        if not m:
            raise UnsupportedSqlError(
                "CREATE supports exactly: CREATE [OR REPLACE] TABLE t "
                "(<ddl>) ... | CREATE TABLE dst [SHALLOW] CLONE src "
                "[PRIMARY KEY (c,...)] [BLOOM (c,...)] [CLUSTER BY (c,...)] "
                "[IDENTITY (c [START WITH n] [INCREMENT BY n], ...)] "
                "[GENERATED (c AS expr, ...)]"
            )
        return CreateTable(
            table=m.group(2),
            schema_ddl=m.group(3).strip(),
            primary_keys=_cols(m.group(4)) if m.group(4) else [],
            bloom_columns=_cols(m.group(5)) if m.group(5) else [],
            cluster_by=_cols(m.group(6)) if m.group(6) else [],
            identity=_parse_identity(m.group(7)) if m.group(7) else {},
            generated=_parse_generated(m.group(8)) if m.group(8) else {},
            or_replace=bool(m.group(1)),
        )
    if head == "OPTIMIZE":
        m = _OPTIMIZE_SKETCH_RE.match(sql)
        if m:
            return OptimizeSketch(table=m.group(1))
        m = _OPTIMIZE_RE.match(sql)
        if not m:
            raise UnsupportedSqlError(
                "OPTIMIZE supports exactly: OPTIMIZE t [FILES n] "
                "[TARGET SIZE bytes] "
                "[WHERE col BETWEEN lo AND hi | col = v] "
                "[CLUSTER BY (c,...)] | [ZORDER BY (c,...)] "
                "| OPTIMIZE SKETCH t"
            )
        where = None
        if m.group(4):
            lo, hi = _bounds(m.group(5), m.group(6), m.group(7))
            where = (m.group(4), lo, hi)
        return Optimize(
            table=m.group(1),
            target_files=int(m.group(2)) if m.group(2) else 1,
            target_bytes=int(m.group(3)) if m.group(3) else None,
            cluster_by=_cols(m.group(8)) if m.group(8) else None,
            zorder_by=_cols(m.group(9)) if m.group(9) else None,
            where=where,
        )
    if head == "VACUUM":
        m = _VACUUM_LOG_RE.match(sql)
        if m:
            return VacuumLog(
                retain_hours=float(m.group(1)) if m.group(1) else 7 * 24.0,
                dry_run=bool(m.group(2)),
            )
        m = _VACUUM_RE.match(sql)
        if not m:
            raise UnsupportedSqlError(
                "VACUUM supports exactly: VACUUM t [RETAIN n VERSIONS]"
                " [DRY RUN] | VACUUM LOG [RETAIN n HOURS] [DRY RUN]"
            )
        return Vacuum(
            table=m.group(1),
            retain_versions=int(m.group(2)) if m.group(2) else 0,
            dry_run=bool(m.group(3)),
        )
    if head == "RESTORE":
        m = _RESTORE_RE.match(sql)
        if not m:
            raise UnsupportedSqlError(
                "RESTORE supports exactly: RESTORE TABLE t TO VERSION n"
                " | TO TIMESTAMP 'ts'"
            )
        return Restore(
            table=m.group(1),
            version=int(m.group(2)) if m.group(2) else None,
            timestamp=_literal(m.group(3)) if m.group(3) else None,
        )
    if head == "GENERATE":
        m = _GENERATE_MANIFEST_RE.match(sql)
        if not m:
            raise UnsupportedSqlError(
                "GENERATE supports exactly: GENERATE MANIFEST FOR t"
                " [MATERIALIZE]"
            )
        return GenerateManifest(
            table=m.group(1), materialize=bool(m.group(2))
        )
    if head == "DROP":
        m = _DROP_TABLE_RE.match(sql)
        if not m:
            raise UnsupportedSqlError(
                "DROP supports exactly: DROP TABLE t (drop a COLUMN via"
                " ALTER TABLE t DROP COLUMN a)"
            )
        return DropTableStmt(table=m.group(1))
    if head == "UNDROP":
        m = _UNDROP_TABLE_RE.match(sql)
        if not m:
            raise UnsupportedSqlError(
                "UNDROP supports exactly: UNDROP TABLE t"
            )
        return UndropTableStmt(table=m.group(1))
    if head == "SHOW":
        m = _SHOW_DROPPED_RE.match(sql)
        if m:
            return ShowDroppedTables(verify=m.group(1) is not None)
        # other SHOW spellings fall through to Catalyst (SHOW TABLES
        # over the registered views is a plain read query)
        return None
    if head == "ALTER":
        m = _ALTER_ADD_CONSTRAINT_RE.match(sql)
        if m:
            return AlterAddConstraint(
                table=m.group(1), name=m.group(2), expr=m.group(3).strip()
            )
        m = _ALTER_DROP_CONSTRAINT_RE.match(sql)
        if m:
            return AlterDropConstraint(table=m.group(1), name=m.group(2))
        m = _RESERVE_IDENTITY_RE.match(sql)
        if m:
            return ReserveIdentity(
                table=m.group(1), column=m.group(2), n=int(m.group(3))
            )
        m = _UPGRADE_PROTOCOL_RE.match(sql)
        if m:
            # groups capture the INSIDE of the parens (no _cols, which
            # strips a surrounding paren pair)
            rf = [
                f.strip() for f in (m.group(2) or "").split(",") if f.strip()
            ]
            wf = [
                f.strip() for f in (m.group(3) or "").split(",") if f.strip()
            ]
            if not rf and not wf:
                raise UnsupportedSqlError(
                    "UPGRADE PROTOCOL needs at least one of READER"
                    " FEATURES (f, ...) / WRITER FEATURES (f, ...)"
                )
            return UpgradeProtocol(
                table=m.group(1), reader_features=rf, writer_features=wf
            )
        m = _ALTER_SYNC_IDENTITY_RE.match(sql)
        if m:
            return AlterSyncIdentity(table=m.group(1))
        m = _ALTER_RENAME_RE.match(sql)
        if m:
            return AlterRenameColumn(table=m.group(1), old=m.group(2), new=m.group(3))
        m = _ALTER_RENAME_TABLE_RE.match(sql)
        if m:
            return RenameTableStmt(old=m.group(1), new=m.group(2))
        m = _ALTER_DROP_RE.match(sql)
        if m:
            return AlterDropColumn(table=m.group(1), column=m.group(2))
        m = _ALTER_NOT_NULL_RE.match(sql)
        if m:
            return AlterNotNull(
                table=m.group(1),
                column=m.group(2),
                set=m.group(3).upper() == "SET",
            )
        m = _ALTER_TYPE_RE.match(sql)
        if m:
            return AlterColumnType(
                table=m.group(1), column=m.group(2), new_type=m.group(3).strip()
            )
        m = _ALTER_ADD_RE.match(sql)
        if m:
            return AlterAddColumns(table=m.group(1), columns_ddl=m.group(2).strip())
        raise UnsupportedSqlError(
            "ALTER supports exactly: ALTER TABLE t RENAME COLUMN a TO b | "
            "DROP COLUMN a | ALTER COLUMN a TYPE ty | ALTER COLUMN a "
            "SET/DROP NOT NULL | ADD COLUMNS (a ty, ...) | SYNC IDENTITY | "
            "RENAME TO t2 | UPGRADE PROTOCOL (READER FEATURES (f,...), "
            "WRITER FEATURES (f,...)) | RESERVE IDENTITY (col, n) | "
            "ADD CONSTRAINT name CHECK (expr) | DROP CONSTRAINT name"
        )
    if head == "DESCRIBE":
        m = _DESCRIBE_HISTORY_RE.match(sql)
        if m:
            return DescribeHistory(
                table=m.group(1),
                limit=int(m.group(2)) if m.group(2) else None,
            )
        m = _DESCRIBE_DETAIL_RE.match(sql)
        if m:
            return DescribeDetail(table=m.group(1))
        m = _DESCRIBE_CHANGES_RE.match(sql)
        if m:
            return DescribeChanges(
                table=m.group(1),
                from_version=int(m.group(2)),
                to_version=int(m.group(3)) if m.group(3) else None,
            )
        raise UnsupportedSqlError(
            "DESCRIBE supports exactly: DESCRIBE HISTORY t [LIMIT n] | "
            "DESCRIBE DETAIL t | DESCRIBE CHANGES t FROM v [TO v]"
        )
    return None


def _split_top_level_commas(s: str) -> list[str]:
    """Split on commas not inside single-quoted strings."""
    parts, buf, in_str = [], [], False
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "'":
            # handle '' escape inside strings
            if in_str and i + 1 < len(s) and s[i + 1] == "'":
                buf.append("''")
                i += 2
                continue
            in_str = not in_str
            buf.append(ch)
        elif ch == "," and not in_str:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return [p for p in (p.strip() for p in parts) if p]
