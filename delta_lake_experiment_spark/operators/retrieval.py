"""Lexical retrieval over the document corpus: BM25 ranking.

A training-data pipeline needs retrieval in several places — pulling
candidate documents for a topic-targeted subset, retrieval-based
contamination audits ("which corpus docs answer this benchmark
question"), and building retrieval-augmented eval sets. BM25 (Robertson
et al., Okapi) is the standard lexical ranker; this operator runs it as
two map-only scans plus one one-row aggregate — no corpus-sized shuffle
at any point.

Scale shape (the 100 TB case):
- Pass 1 computes per-document term frequencies for the QUERY TERMS
  ONLY (``size(filter(tokens, t == term))`` per term — pure JVM
  codegen columns, no explode of the full token stream) plus document
  length, then partial-aggregates to a SINGLE row of corpus statistics
  (N, avgdl, per-term document frequencies). O(terms) bytes shuffled.
- Pass 2 recomputes the same tf columns and scores each document
  against the stats row via a broadcast nested-loop join of the 1-row
  stats (a literal-sized side — Spark broadcasts it for free). The
  alternative — persisting the tf projection to skip the second scan —
  would cache a corpus-sized intermediate; two cheap map scans beat
  one cached pass at any scale where the corpus doesn't fit in memory.
- Top-k is ``orderBy(...).limit(k)`` — Spark's TakeOrdered, a per
  -partition heap + driver merge of k rows, never a global sort
  shuffle.

The reference engine has no text or ranking surface at all (SURVEY
§2.2 — scalar functions ABSENT); this is LLM-pipeline extension
surface with an exact DuckDB oracle (same formula, rounded to 6
digits — workloads/extensions.py::BM25_SEARCH_SQL).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for ``query_terms`` —
    ``(id_col, score)``, score rounded to 6 digits, ties broken by id
    ascending (deterministic, oracle-comparable).

    Formula (Robertson/Okapi, the non-negative idf variant used by
    Lucene): per term ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``,
    per doc-term ``tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl /
    avgdl))``, summed over query terms. Terms are matched on the same
    lowercased whitespace tokenization every text operator here uses.

    Duplicate query terms are collapsed (a repeated term must not
    double its contribution — BM25 is a document model, not a query
    tf model); empty/NULL documents score 0 for every term.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(dict.fromkeys(query_terms))  # dedup, keep order
    if k < 1:
        raise ValueError(f"k={k!r} must be >= 1")

    toks = F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")

    def _eq(term: str):
        # NOTE: a `lambda t, term=term:` default-arg closure would be
        # arity-2, and pyspark's higher-order-function binding treats a
        # two-parameter lambda as the (element, index) form — the term
        # would silently bind to the array index
        return lambda t: t == F.lit(term)

    def tf_cols(prefix: str):
        return [
            F.size(F.filter(toks, _eq(term))).alias(f"{prefix}{i}")
            for i, term in enumerate(terms)
        ]

    # pass 1: one row of corpus stats — N, avgdl, df per query term
    base = df.select(F.size(toks).alias("__dl"), *tf_cols("__tf"))
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )

    # pass 2: rescan + broadcast the 1-row stats; score and take k
    scored = df.select(
        F.col(id_col), F.size(toks).alias("__dl"), *tf_cols("__tf")
    ).crossJoin(F.broadcast(stats))
    per_term = [
        F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(f"__df{i}") + F.lit(0.5))
            / (F.col(f"__df{i}") + F.lit(0.5))
        )
        * (
            F.col(f"__tf{i}")
            * (F.lit(k1) + 1.0)
            / (
                F.col(f"__tf{i}")
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
            )
        )
        for i in range(len(terms))
    ]
    total = per_term[0]
    for expr in per_term[1:]:
        total = total + expr
    return (
        scored.select(id_col, F.round(total, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25_sql(
    src: str,
    id_col: str,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` over relation ``src`` carrying
    (id_col, text) — generated from the SAME parameters so the operator
    and its oracle can never drift. Single-quoted terms are escaped."""
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")

    def q(s: str) -> str:
        return s.replace("'", "''")

    tf_exprs = ", ".join(
        f"len(list_filter(t, x -> x = '{q(term)}')) AS tf{i}"
        for i, term in enumerate(terms)
    )
    df_exprs = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    score_terms = " + ".join(
        f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * ({k1} + 1.0)"
        f" / (tf{i} + {k1} * (1.0 - {b} + {b} * dl / avgdl)))"
        for i in range(len(terms))
    )
    return rf"""
WITH bt AS (
  SELECT {id_col}, string_split_regex(lower(trim(COALESCE(text, ''))), '\s+') AS t
  FROM {src}
), bd AS (
  SELECT {id_col}, len(t) AS dl, {tf_exprs} FROM bt
), bs AS (
  SELECT COUNT(*) AS n, AVG(dl) AS avgdl, {df_exprs} FROM bd
)
SELECT {id_col}, round({score_terms}, 6) AS score
FROM bd, bs
ORDER BY score DESC, {id_col} ASC
LIMIT {int(k)}
"""
