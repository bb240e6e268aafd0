"""Driver-side Spark-compatible Murmur3 for bucket-aware file pruning.

A bucketed table (client.create_table(bucket_by=...)) labels every data
object with ``pmod(murmur3(bucket_cols), n)`` — Spark's bucket-id
expression, realized by ``repartition(n, cols)`` at write time. That
label is a pruning lever min/max stats and bloom filters cannot match:
an EQUALITY predicate on the bucket columns can only ever find rows in
the ONE bucket its key hashes to, so a point lookup needs O(live/n)
files — exactly, not probabilistically — and it composes with both
stat and bloom pruning on top.

Pruning happens in driver-side metadata planning (Snapshot.live_files),
where launching a Spark job per lookup to evaluate ``F.hash`` would be
absurd; so this module reimplements the exact hash Spark uses —
Murmur3_x86_32 with seed 42, the per-type encodings of
``org.apache.spark.sql.catalyst.expressions.Murmur3Hash`` (ints mix as
4-byte words, longs as lo/hi word pairs, strings as UTF-8 bytes with
signed-byte tails, doubles via their IEEE-754 bit pattern, -0.0
normalized to 0.0, NULLs pass the seed through) — in pure Python. The
implementation is CERTIFIED against the JVM: a pytest fuzzes every
supported type (and multi-column tuples) against ``F.hash`` and the
``repartition`` partition index itself, so a silent divergence — which
would mean silently WRONG pruning, the one failure mode a metadata
optimization must never have — fails the suite, not the user.

Used by Snapshot.live_files via DeltaLakeClient.scan: when ``prune``
pins every bucket column of a bucketed table to a point
(``lo == hi``), the scan computes the key's bucket id here and keeps
only objects labeled with it (objects without a label are kept
conservatively).
"""

from __future__ import annotations

import datetime
import struct
from typing import Any, Optional, Sequence

_M32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def _hash_int(value: int, seed: int) -> int:
    return _fmix(_mix_h1(seed, _mix_k1(value & _M32)), 4)


def _hash_long(value: int, seed: int) -> int:
    h1 = _mix_h1(seed, _mix_k1(value & _M32))
    h1 = _mix_h1(h1, _mix_k1((value >> 32) & _M32))
    return _fmix(h1, 8)


def _hash_bytes(data: bytes, seed: int) -> int:
    # Murmur3_x86_32.hashUnsafeBytes: aligned little-endian 4-byte
    # words, then each TAIL byte mixed individually as a SIGNED int —
    # Spark's (nonstandard) tail handling, not classic murmur3.
    h1 = seed
    aligned = len(data) - len(data) % 4
    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
    for i in range(aligned, len(data)):
        b = data[i]
        signed = b - 256 if b >= 128 else b
        h1 = _mix_h1(h1, _mix_k1(signed & _M32))
    return _fmix(h1, len(data))


def _hash_one(value: Any, spark_type: str, seed: int) -> Optional[int]:
    """One column's contribution: the new running hash, or None when
    the type (or a value out of its domain) is unsupported — callers
    must then skip the optimization, never guess."""
    if value is None:
        return seed  # Murmur3Hash: null columns leave the seed as-is
    t = spark_type.lower()
    if t in ("int", "integer", "smallint", "short", "tinyint", "byte"):
        return _hash_int(int(value), seed)
    if t in ("bigint", "long"):
        return _hash_long(int(value), seed)
    if t == "boolean":
        return _hash_int(1 if value else 0, seed)
    if t == "date":
        if isinstance(value, datetime.datetime):
            value = value.date()
        if not isinstance(value, datetime.date):
            return None
        return _hash_int((value - _EPOCH_DATE).days, seed)
    if t in ("timestamp", "timestamp_ntz"):
        if not isinstance(value, datetime.datetime):
            return None
        base = _EPOCH_TS.replace(tzinfo=value.tzinfo) if value.tzinfo else _EPOCH_TS
        delta = value - base
        micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        return _hash_long(micros, seed)
    if t in ("float", "real"):
        v = float(value)
        if v == 0.0:
            v = 0.0  # normalizes -0.0
        bits = struct.unpack("<i", struct.pack("<f", v))[0]
        return _hash_int(bits, seed)
    if t == "double":
        v = float(value)
        if v == 0.0:
            v = 0.0
        bits = struct.unpack("<q", struct.pack("<d", v))[0]
        return _hash_long(bits, seed)
    if t in ("string", "varchar", "char"):
        return _hash_bytes(str(value).encode("utf-8"), seed)
    if t == "binary":
        return _hash_bytes(bytes(value), seed)
    return None


def spark_hash(
    values: Sequence[Any], spark_types: Sequence[str], seed: int = 42
) -> Optional[int]:
    """``F.hash(*cols)`` as a signed 32-bit int, or None when any
    column type is unsupported. Columns fold left-to-right, each
    using the running hash as its seed — Spark's multi-column rule."""
    h = seed
    for v, t in zip(values, spark_types):
        nxt = _hash_one(v, t, h)
        if nxt is None:
            return None
        h = nxt
    return h - (1 << 32) if h >= (1 << 31) else h


def bucket_id_for(
    values: Sequence[Any], spark_types: Sequence[str], n_buckets: int
) -> Optional[int]:
    """``pmod(murmur3(values), n)`` — the bucket a key's rows live in,
    matching both ``repartition(n, cols)``'s partition index and
    Spark's bucketBy id. ``values`` must already be the STORED (cast)
    representations: murmur3(int) != murmur3(long) for the same value
    (the write path hashes after casting — the r7 review catch)."""
    h = spark_hash(values, spark_types)
    if h is None:
        return None
    return h % n_buckets
