"""Document chunking: split long documents into overlapping
fixed-token-budget chunks.

Context windows are finite; a 200k-token document cannot be consumed
whole. Pipelines CHUNK long documents into windows of at most
``max_tokens`` tokens, with ``overlap`` tokens of context carried
across adjacent chunks (so no span of fewer than ``overlap + 1``
tokens is ever split across a boundary without appearing intact in
some chunk).

Chunk layout (stride = max_tokens - overlap):

- chunk i covers tokens ``[i * stride, min(i * stride + max_tokens,
  n))`` (0-based),
- ``n_chunks = 1`` when ``n <= max_tokens``, else
  ``ceil((n - max_tokens) / stride) + 1`` — every token is covered,
  the last chunk ends exactly at ``n``, and every chunk after the
  first holds more than ``overlap`` tokens (so no chunk is pure
  repeated context; a single-chunk short document simply holds the
  whole document).

Deterministic: chunk boundaries are a pure function of the token
sequence — same input, same chunks, on any cluster size or
partitioning.

Scale: tokenize + per-row sequence explode, all JVM-side column
expressions — a map-only plan with NO shuffle. Output fan-out is
``ceil(tokens / stride)`` rows per document, each carrying only its
own slice of the token array (Tungsten copies the slice, not the
document), so executor memory is bounded by ``max_tokens``, not
document length. The reference has no notion of documents or chunking
(SURVEY.md §2.2); this is part of the LLM-pipeline extension lane.

Rejoining tokens with a single space normalizes intra-document
whitespace — the same normalization the fingerprint/shingle lane
applies (operators/text.py::fingerprint), so chunk text composes with
the dedup operators without a second normalization pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """One row per (document, chunk): ``id_col``, ``chunk_id`` (int,
    0-based), ``n_chunks`` (int), ``chunk_n_tokens`` (int), and
    ``chunk_text`` (the chunk's tokens rejoined with single spaces).

    ``0 <= overlap < max_tokens`` is required — ``overlap >=
    max_tokens`` would make the stride non-positive (chunking could
    never advance). NULL texts raise at execution time (same guard
    style as pack_sequences: a NULL would silently produce zero chunks
    and the document would vanish from the training corpus).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens={max_tokens!r} must be > 0")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap={overlap!r} must be in [0, max_tokens={max_tokens!r})"
        )
    stride = max_tokens - overlap
    text = F.when(F.col(text_col).isNotNull(), F.col(text_col)).otherwise(
        F.raise_error(
            F.lit(f"chunk_documents: {text_col} is NULL - chunking a NULL text"
                  " would silently drop the document (filter upstream)")
        )
    )
    toks = F.split(F.trim(text), r"\s+")
    n = F.size(toks)
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(max_tokens)).cast("double") / F.lit(float(stride)))
        .cast("int") + F.lit(1)
    )
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        n_chunks.cast("int").alias("n_chunks"),
    )
    exploded = base.select(
        id_col,
        "n_chunks",
        "__toks",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, max_tokens
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        "n_chunks",
        F.size(chunk).cast("int").alias("chunk_n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def chunking_sql(
    src: str,
    id_sql: str,
    text_sql: str,
    max_tokens: int,
    overlap: int = 0,
    id_name: str = "id",
) -> str:
    """DuckDB twin of :func:`chunk_documents` over relation ``src`` —
    generated from the SAME stride/count arithmetic so a parameter
    change cannot diverge the engines (the sampling-module pattern:
    sample_predicate_sql)."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens={max_tokens!r} must be > 0")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap={overlap!r} must be in [0, max_tokens={max_tokens!r})"
        )
    stride = max_tokens - overlap
    return rf"""
WITH __ck_toks AS (
  SELECT {id_sql} AS id, string_split_regex(trim({text_sql}), '\s+') AS t
  FROM {src}
), __ck_counts AS (
  SELECT id, t, len(t) AS n,
    CASE WHEN len(t) <= {max_tokens} THEN 1
         ELSE CAST(ceil(CAST(len(t) - {max_tokens} AS DOUBLE) / {stride}) AS INT) + 1
    END AS nc
  FROM __ck_toks
)
SELECT id AS {id_name}, CAST(i AS INT) AS chunk_id, CAST(nc AS INT) AS n_chunks,
  CAST(least(n - i * {stride}, {max_tokens}) AS INT) AS chunk_n_tokens,
  array_to_string(t[i * {stride} + 1 : least(i * {stride} + {max_tokens}, n)], ' ')
    AS chunk_text
FROM __ck_counts, UNNEST(generate_series(0, nc - 1)) AS __u(i)
"""
