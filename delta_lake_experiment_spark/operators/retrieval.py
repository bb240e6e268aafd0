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

from pyspark.sql import DataFrame, Window
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


def bm25_batch_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries_df: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query for a whole QUERY TABLE —
    ``(query_id, id_col, score, rank)`` — the batch-retrieval shape
    (one benchmark question per row, retrieval-based contamination
    audits, topical subset mining) where the single-query plan
    (:func:`bm25_topk`) would launch one job per question.

    Plan: build postings ``(term, doc, tf)`` once (tokenize + explode +
    one groupBy), semi-restrict them to the query vocabulary BEFORE
    anything heavy (the query table is tiny next to the corpus — AQE
    broadcasts it, so the explode output is filtered map-side), compute
    per-term document frequencies from the restricted postings
    (O(query vocabulary) rows), join postings x query-terms, aggregate
    per (query, doc), rank per query with a window. The window
    partitions by query_id — thousands of independent partitions, no
    single-task skew. Only documents containing at least one query
    term are ranked (zero-score documents are not retrieval results).

    ``queries_df`` carries (query_id, term); duplicate (query, term)
    rows are collapsed — a repeated term must not double its
    contribution, matching :func:`bm25_topk`.
    """
    if k < 1:
        raise ValueError(f"k={k!r} must be >= 1")
    toks = F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    qterms = queries_df.select("query_id", "term").distinct()

    docs = df.select(F.col(id_col), F.size(toks).alias("__dl"), toks.alias("__t"))
    postings = (
        docs.select(id_col, "__dl", F.explode("__t").alias("term"))
        .join(F.broadcast(qterms.select("term").distinct()), "term", "left_semi")
        .groupBy("term", id_col, "__dl")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    dfreq = postings.groupBy("term").agg(
        F.countDistinct(id_col).alias("__df")
    )
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__s",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
            )
            * (
                F.col("__tf")
                * (F.lit(k1) + 1.0)
                / (
                    F.col("__tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0)
                        - F.lit(b)
                        + F.lit(b) * F.col("__dl") / F.col("__avgdl")
                    )
                )
            ),
        )
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("__s"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def bm25_batch_sql(
    src: str,
    id_col: str,
    queries: "dict[str, Sequence[str]]",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_batch_topk` for a literal query set
    ``{query_id: [terms...]}`` — generated from the same parameters."""
    if not queries:
        raise ValueError("queries must be non-empty")

    def q(s: str) -> str:
        return s.replace("'", "''")

    rows = ", ".join(
        f"('{q(qid)}', '{q(t)}')"
        for qid, terms in queries.items()
        for t in dict.fromkeys(terms)
    )
    return rf"""
WITH qt(query_id, term) AS (VALUES {rows}),
bdocs AS (
  SELECT {id_col}, string_split_regex(lower(trim(COALESCE(text, ''))), '\s+') AS t
  FROM {src}
), bstats AS (
  SELECT COUNT(*) AS n, AVG(len(t)) AS avgdl FROM bdocs
), bpost AS (
  SELECT term, {id_col}, dl, COUNT(*) AS tf FROM (
    SELECT {id_col}, len(t) AS dl, unnest(t) AS term FROM bdocs
  ) WHERE term IN (SELECT DISTINCT term FROM qt)
  GROUP BY 1, 2, 3
), bdf AS (
  SELECT term, COUNT(DISTINCT {id_col}) AS df FROM bpost GROUP BY term
), bscored AS (
  SELECT qt.query_id, p.{id_col},
    round(SUM(
      ln(1.0 + (n - df + 0.5) / (df + 0.5))
      * (tf * ({k1} + 1.0) / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl)))
    ), 6) AS score
  FROM bpost p JOIN qt ON qt.term = p.term JOIN bdf ON bdf.term = p.term, bstats
  GROUP BY 1, 2
)
SELECT query_id, {id_col}, score, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, {id_col} ASC
  ) AS INT) AS rank
  FROM bscored
) WHERE rank <= {int(k)}
"""


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
