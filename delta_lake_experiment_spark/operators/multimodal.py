"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
``kind`` discriminator and typed metadata — the lakehouse pattern for
non-tabular data (payloads could equally be object-store URIs; the
operator shape is identical).

The *decode* step (pillow/librosa/av) is environment-dependent, so it is
isolated behind ``_decode_payload`` and STUBBED here with a
deterministic hash-based fake (clearly marked). Everything Spark-visible
— schemas, ``mapInPandas`` batching, Arrow transfer, output shapes,
partition behavior — is real and tested; swapping in a real codec
touches only the one function.

Scale notes: ``mapInPandas`` streams Arrow batches through Python, so
peak memory is one batch per core, not one partition; tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` for fat payloads.
Feature extraction is embarrassingly parallel — no shuffle at all.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def _decode_payload(payload: bytes, kind: str, out_dim: int) -> np.ndarray:
    """STUB decoder. A real deployment decodes pixels/samples here
    (PIL.Image.open / librosa.load / av frame iteration — not available
    in this container). The fake is deterministic: features are derived
    from a sha256 stream over the payload, so tests and oracles are
    stable while exercising the exact data path a real decoder uses."""
    digest = hashlib.sha256(payload if payload is not None else b"").digest()
    reps = (out_dim * 4 + len(digest) - 1) // len(digest)
    stream = (digest * reps)[: out_dim * 4]
    arr = np.frombuffer(stream, dtype=np.uint32).astype(np.float64)
    return (arr / np.float64(2**32)).astype(np.float32)


def extract_features(
    df: DataFrame,
    out_dim: int = 16,
    batch_hint: int = 256,
    passthrough_cols: tuple = (),
    decoder=None,
) -> DataFrame:
    """(media_id, kind, features array<float>) via Arrow-batched
    mapInPandas — the vectorized lane for per-payload Python work.

    ``passthrough_cols`` ride through the Arrow batch unchanged
    (lineage paths, sizes, labels): carrying metadata alongside the
    decode costs a few extra Arrow columns, while recovering it
    afterwards would take a join back to the source — a full shuffle
    of the media table at corpus scale.

    ``decoder`` swaps in a REAL codec without touching the Spark
    plumbing: a callable ``(payload: bytes | None, kind: str,
    out_dim: int) -> sequence of out_dim float32s``, executed inside
    the same Arrow batches (it is closure-serialized to executors, so
    import heavyweight codec modules INSIDE the callable — e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` / ``librosa.load`` — the
    executor processes must have them installed). ``None`` keeps the
    deterministic sha256 stub, which remains the value-oracle lane
    (DuckDB re-derives it; a real codec's output is not
    SQL-reproducible, so decoder-equipped runs are certified by
    integration tests instead)."""
    requested = set(passthrough_cols)
    unknown = requested - {f.name for f in df.schema.fields}
    clash = requested & {"media_id", "kind", "features", "payload"}
    if unknown or clash:
        # silent drop would surface as a missing column far downstream;
        # a clash would emit a duplicate/ambiguous output column
        raise ValueError(
            f"passthrough_cols: unknown {sorted(unknown)!r}, "
            f"clashing with base output {sorted(clash)!r}"
        )
    extra = [
        T.StructField(f.name, f.dataType)
        for f in df.schema.fields
        if f.name in requested
    ]
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
        + extra
    )
    extra_names = [f.name for f in extra]
    decode = decoder if decoder is not None else _decode_payload

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def checked(p, k) -> np.ndarray:
            arr = np.asarray(decode(p, k, out_dim), dtype=np.float32)
            if arr.shape != (out_dim,):
                # a wrong-width decoder would otherwise emit ragged
                # array<float> rows that crash (or silently mis-score)
                # far downstream in zip_with consumers
                raise ValueError(
                    f"extract_features: decoder returned shape"
                    f" {arr.shape} for kind={k!r}, expected ({out_dim},)"
                )
            return arr

        for pdf in it:
            feats = [
                checked(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            cols = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "features": feats,
            }
            for name in extra_names:
                cols[name] = pdf[name]
            yield pd.DataFrame(cols)

    return df.select("media_id", "kind", "payload", *extra_names).mapInPandas(
        batches, out_schema
    )


def text_features(
    df: DataFrame,
    text_col: str,
    out_dim: int = 8,
    passthrough_cols: tuple = (),
) -> DataFrame:
    """The TEXT tower of a dual-encoder (CLIP-style) alignment check:
    (passthrough..., features array<float>) from the caption column via
    the same Arrow-batched lane — and the same STUB encoder
    (:func:`_decode_payload` over the caption's UTF-8 bytes; a real
    deployment calls its text encoder here). Keeping both towers on one
    stub makes the whole alignment pipeline value-oracled: DuckDB can
    recompute either side from sha256 of the same bytes."""
    out_schema = T.StructType(
        [
            T.StructField(f.name, f.dataType)
            for f in df.schema.fields
            if f.name in set(passthrough_cols)
        ]
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )
    names = [f.name for f in out_schema.fields if f.name != "features"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_payload(
                    (t if t is not None else "").encode("utf-8"), "text", out_dim
                )
                for t in pdf[text_col]
            ]
            cols = {name: pdf[name] for name in names}
            cols["features"] = feats
            yield pd.DataFrame(cols)

    return df.select(*dict.fromkeys(list(names) + [text_col])).mapInPandas(
        batches, out_schema
    )


def feature_vector_sql(hex_expr: str, out_dim: int = 8) -> str:
    """DuckDB DOUBLE[] expression re-deriving :func:`_decode_payload`'s
    feature vector from a sha256 HEX expression — each of the
    ``out_dim`` uint32s is 4 hex byte-pairs LITTLE-endian (the
    np.frombuffer layout), divided by 2^32 and squeezed through REAL to
    match the float32 output exactly. Requires ``out_dim * 4 <= 32``
    (one digest; the stub's repetition branch is not mirrored here)."""
    if out_dim * 4 > 32:
        raise ValueError(
            f"out_dim={out_dim!r} needs {out_dim * 4} bytes; the SQL twin"
            " mirrors only the single-digest case (<= 8 dims)"
        )
    elems = []
    for j in range(out_dim):
        off = 8 * j  # hex chars per uint32
        terms = " + ".join(
            f"CAST(('0x' || substr({hex_expr}, {off + 2 * b + 1}, 2)) AS BIGINT)"
            + ("" if b == 0 else f" * {256 ** b}")
            for b in range(4)
        )
        elems.append(f"CAST(CAST(({terms}) / 4294967296.0 AS REAL) AS DOUBLE)")
    return "[" + ", ".join(elems) + "]"


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """One row per sampled frame: (media_id, frame_idx, frame_ts_ms,
    frame binary). Frame *extraction* is stubbed (deterministic slices of
    the payload stand in for decoded frames); the explode-shaped output
    and its cost model (rows x frames) are the real thing."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                if kind != "video" or payload is None:
                    continue
                n = min(max_frames, max(1, int(dur or 0) // every_ms))
                for i in range(n):
                    # STUB: a real impl seeks to i*every_ms and decodes; the
                    # fake takes a deterministic payload slice per frame.
                    lo = (i * 97) % max(1, len(payload))
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["frame"].append(bytes(payload[lo : lo + 64]))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, out_schema)
