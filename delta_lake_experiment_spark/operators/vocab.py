"""Vocabulary building and token-id encoding: corpus text -> the int
sequences a model actually trains on.

The last text-side step of a training-data pipeline: build a frequency
vocabulary over the (case-folded, whitespace) tokens, assign dense ids
by rank, and encode every document as an ``array<int>`` of token ids
with a reserved out-of-vocabulary id. A real BPE vocab adds merge
rules on top; the frequency vocab is its deterministic, dependency-free
core and shares the distributed shape (count -> rank -> broadcast-join
encode).

Id scheme: 0 = OOV (reserved), 1..size = vocab tokens ranked by
(count DESC, token ASC) — the tiebreak makes ids a pure function of
the corpus, reproducible on any engine or partitioning.

Scale shape:
- build: one partial-agg shuffle to O(distinct tokens), then a top-K
  selection. K (the vocab size) is model-sized — 32k-256k rows — so
  the rank window runs over K rows AFTER the TakeOrdered-style cut,
  never over the full distinct-token table (ranking the raw vocab
  would put the whole token table through one window partition).
- encode: explode + broadcast-join against the K-row vocab + ordered
  regroup. Position order is carried explicitly (posexplode ->
  array_sort on (pos, id) structs), never left to shuffle luck.

The reference has no text surface (SURVEY.md §2.2); this is part of
the LLM-pipeline extension lane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OOV_ID = 0


def build_vocab(df: DataFrame, text_col: str, size: int, min_count: int = 1) -> DataFrame:
    """The vocabulary: ``(token_id int, token string, count long)`` —
    the ``size`` most frequent tokens with ``count >= min_count``,
    ids 1..size by (count DESC, token ASC). Fewer qualifying tokens
    than ``size`` yields a shorter vocab (ids stay dense).
    """
    if size < 1:
        raise ValueError(f"size={size!r} must be >= 1")
    if min_count < 1:
        raise ValueError(f"min_count={min_count!r} must be >= 1")
    counts = (
        df.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    # top-K first (TakeOrdered-class: no global sort of the full token
    # table), THEN rank the K survivors — the window sees K rows only
    top = counts.orderBy(F.desc("count"), F.asc("token")).limit(size)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("count"), F.asc("token"))
    return top.select(
        F.row_number().over(w).alias("token_id"), "token", "count"
    )


def encode_documents(
    df: DataFrame, id_col: str, text_col: str, vocab: DataFrame
) -> DataFrame:
    """Encode each document as ``token_ids array<int>`` (OOV -> 0,
    order-preserving), plus ``n_tokens`` and ``n_oov`` counts — the
    coverage number a vocab size is tuned with. ``vocab`` is
    :func:`build_vocab` output (broadcast: it is model-sized).

    Empty-vocab or all-OOV documents encode fine (all zeros); NULL
    texts raise (the packing/chunking contract).
    """
    text = F.when(F.col(text_col).isNotNull(), F.col(text_col)).otherwise(
        F.raise_error(
            F.lit(f"encode_documents: {text_col} is NULL - a NULL text would"
                  " silently encode to nothing (filter upstream)")
        )
    )
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.trim(text)), r"\s+")).alias("pos", "token"),
    )
    joined = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).withColumn("tid", F.coalesce(F.col("token_id"), F.lit(OOV_ID)).cast("int"))
    regrouped = joined.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos").alias("p"), F.col("tid").alias("t")))
        ).alias("__pt")
    )
    return regrouped.select(
        id_col,
        F.transform(F.col("__pt"), lambda s: s["t"]).alias("token_ids"),
        F.size("__pt").cast("int").alias("n_tokens"),
        F.size(F.filter(F.col("__pt"), lambda s: s["t"] == OOV_ID))
        .cast("int")
        .alias("n_oov"),
    )
