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
    import re as _re

    bad = [
        t
        for t in terms
        if t is None or t != t.lower() or t == "" or _re.search(r"\s", t)
    ]
    if bad:
        # a term with whitespace/uppercase can NEVER match a lowercased
        # whitespace token — it would silently contribute 0 to every doc
        raise ValueError(
            f"query terms must be single lowercased tokens, got {bad!r}"
            " (tokenize multi-word queries into separate terms)"
        )
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


def hybrid_topk(
    docs: DataFrame,
    emb: DataFrame,
    id_col: str,
    text_col: str,
    vec_id_col: str,
    vec_col: str,
    query_terms: Sequence[str],
    query_vec: Sequence[float],
    k: int = 10,
    candidates: int = 50,
    alpha: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Hybrid lexical+semantic retrieval: BM25 candidate generation,
    embedding-cosine rerank — ``(id_col, score, bm25, cos_sim)`` top-k.
    The standard two-stage search stack: the cheap lexical index
    recalls ``candidates`` docs (bounded, whatever the corpus size),
    then only those are scored against the query embedding —
    ``score = alpha * bm25/max_bm25 + (1-alpha) * cosine`` (BM25 is
    unbounded, so it is normalized by the candidate max; cosine is
    already in [-1, 1]).

    Scale shape: stage 1 is :func:`bm25_topk` (two map scans, no
    corpus shuffle, TakeOrdered); stage 2 joins the ``candidates``-row
    result against the embedding table — the candidate side broadcasts
    by size, so the rerank is a map-side lookup over the embedding
    scan, plus one O(candidates) normalization aggregate. Every number
    is rounded to 6 digits and ties break on id, so the DuckDB twin
    (:func:`hybrid_sql`) reproduces the exact ranking."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha={alpha!r} must be in [0, 1]")
    if candidates < k:
        raise ValueError(
            f"candidates={candidates!r} must be >= k={k!r} (the rerank"
            " can only return docs stage 1 recalled)"
        )
    cands = (
        bm25_topk(docs, id_col, text_col, query_terms, k=candidates, k1=k1, b=b)
        .withColumnRenamed("score", "bm25")
        # a real inverted index never recalls a document containing no
        # query term; bm25_topk scores every doc, so zero-score rows
        # must be dropped here or pure-embedding matches with NO
        # lexical overlap would sneak in through the candidate slack
        .filter(F.col("bm25") > 0)
        # the candidate table feeds BOTH the max-normalization aggregate
        # and the rerank join; unpersisted, each consumer would re-run
        # bm25_topk's two corpus scans (4 scans total) — persisting the
        # <= `candidates` rows keeps the documented 2-scan cost. The
        # CONSUMER releases it after materializing (the
        # functions/cache.py contract — both in-repo harnesses do).
        .persist()
    )
    qv = [float(x) for x in query_vec]
    vecs = emb.select(
        F.col(vec_id_col).alias(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("__v"), F.lit(qv), lambda a, x: a * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    qnorm = sum(x * x for x in qv) ** 0.5
    if qnorm == 0:
        raise ValueError("query_vec must be non-zero")
    cos = F.round(
        dot
        / (
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("__v"), lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
            * F.lit(qnorm)
        ),
        6,
    )
    mx = cands.agg(F.max("bm25").alias("__mx"))
    scored = (
        F.broadcast(cands)
        .join(vecs, id_col)
        .crossJoin(F.broadcast(mx))
        .withColumn("cos_sim", cos)
        .withColumn(
            "score",
            F.round(
                F.lit(alpha)
                * F.when(F.col("__mx") > 0, F.col("bm25") / F.col("__mx"))
                .otherwise(F.lit(0.0))
                + F.lit(1.0 - alpha) * F.col("cos_sim"),
                6,
            ),
        )
    )
    return (
        scored.select(id_col, "score", "bm25", "cos_sim")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def hybrid_sql(
    docs_src: str,
    emb_src: str,
    id_col: str,
    vec_id_col: str,
    vec_col: str,
    query_terms: Sequence[str],
    query_vec_sql: str,
    k: int = 10,
    candidates: int = 50,
    alpha: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`hybrid_topk`, generated from the same
    parameters — the BM25 stage is the verbatim :func:`bm25_sql` query
    nested as a CTE. ``query_vec_sql`` is any expression producing the
    DOUBLE[] query vector — a literal (``[...]::DOUBLE[]``) or a scalar
    subquery resolving it from data (the oracle string is static, so a
    data-dependent query vector must resolve inside the SQL itself).
    The query norm is computed in SQL (same left-to-right double fold
    as the Python-side norm, and the cosine is rounded anyway)."""
    inner = bm25_sql(docs_src, id_col, query_terms, k=candidates, k1=k1, b=b)
    return rf"""
WITH hq AS (SELECT {query_vec_sql} AS qv),
hc AS (SELECT * FROM ({inner}) WHERE score > 0),
hmx AS (SELECT MAX(score) AS mx FROM hc),
hs AS (
  SELECT hc.{id_col}, hc.score AS bm25,
    round(list_dot_product(CAST(e.{vec_col} AS DOUBLE[]), qv)
      / (sqrt(list_dot_product(CAST(e.{vec_col} AS DOUBLE[]),
                               CAST(e.{vec_col} AS DOUBLE[])))
         * sqrt(list_dot_product(qv, qv))),
      6) AS cos_sim
  FROM hc JOIN {emb_src} e ON e.{vec_id_col} = hc.{id_col}, hq
)
SELECT {id_col},
  round({alpha} * (CASE WHEN mx > 0 THEN bm25 / mx ELSE 0.0 END)
        + {1.0 - alpha} * cos_sim, 6) AS score,
  bm25, cos_sim
FROM hs, hmx
ORDER BY score DESC, {id_col} ASC
LIMIT {int(k)}
"""


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
    from delta_lake_experiment_spark.functions.guards import (
        null_checked,
        token_checked,
    )

    toks = F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    # Bad query rows would otherwise vanish silently: a NULL term never
    # equi-joins, and an uppercase / empty / whitespace-containing term
    # can never match the lowercased whitespace tokenization — either
    # way its query silently loses a term. token_checked raises in-plan
    # (the same contract bm25_topk enforces driver-side on its literal
    # term list).
    qterms = queries_df.select(
        null_checked(F.col("query_id"), "bm25_batch_topk", "query_id").alias(
            "query_id"
        ),
        token_checked(F.col("term"), "bm25_batch_topk", "term").alias("term"),
    ).distinct()

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
    ``{query_id: [terms...]}`` — generated from the same parameters.
    Terms are validated driver-side with the same single-lowercased-
    token contract the operator enforces in-plan (token_checked):
    the twin must reject exactly what the operator rejects."""
    if not queries:
        raise ValueError("queries must be non-empty")
    import re as _re

    bad = [
        t
        for terms in queries.values()
        for t in terms
        if t is None or t == "" or t != t.lower() or _re.search(r"\s", t)
    ]
    if bad:
        raise ValueError(
            f"query terms must be single lowercased tokens, got {bad!r}"
            " (tokenize multi-word queries into separate terms)"
        )

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


def tfidf_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_df: int = 1,
) -> DataFrame:
    """Top-``k`` salient terms per document by TF-IDF —
    ``(id_col, term, tfidf, rank)`` — the cheap topical labeler a
    corpus owner runs for dataset cards, domain routing, and
    quick-look clustering of what a crawl actually contains.

    ``tfidf = (tf / dl) * ln(N / df)`` (normalized term frequency,
    plain idf; rounded to 6 digits), ranked per document with ties
    broken by term so the output is deterministic. ``min_df`` drops
    hapax noise (terms in fewer documents) before ranking.

    Plan: one tokenize + explode, one (doc, term) count aggregate
    (map-side combine absorbs repeats), one O(vocab) document
    -frequency aggregate joined back (vocab broadcasts by size), one
    per-document window over the doc's own distinct terms — window
    partitions are documents: millions of tiny partitions, no skewed
    task. Nothing after the first aggregate exceeds O(distinct
    (doc, term)).
    """
    if k < 1:
        raise ValueError(f"k={k!r} must be >= 1")
    if min_df < 1:
        raise ValueError(f"min_df={min_df!r} must be >= 1")
    toks = F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    base = df.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = base.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("__tf"))
    dl = tf.groupBy(id_col).agg(F.sum("__tf").alias("__dl"))
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_df)
    )
    scored = (
        tf.join(dl, id_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("__tf") / F.col("__dl"))
                * F.log(F.col("__n") / F.col("__df")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )


def tfidf_keywords_sql(
    src: str, id_col: str, k: int = 3, min_df: int = 1
) -> str:
    """DuckDB twin of :func:`tfidf_keywords` over ``src`` carrying
    (id_col, text) — generated from the same (k, min_df)."""
    return rf"""
WITH kwt AS (
  SELECT {id_col}, unnest(string_split_regex(lower(trim(COALESCE(text, ''))), '\s+')) AS term
  FROM {src}
), kwtf AS (
  SELECT {id_col}, term, COUNT(*) AS tf FROM kwt GROUP BY 1, 2
), kwdl AS (
  SELECT {id_col}, SUM(tf) AS dl FROM kwtf GROUP BY 1
), kwn AS (
  SELECT COUNT(*) AS n FROM {src}
), kwdf AS (
  SELECT term, COUNT(*) AS df FROM kwtf GROUP BY term
  HAVING COUNT(*) >= {int(min_df)}
)
SELECT {id_col}, term, tfidf, rank FROM (
  SELECT t.{id_col}, t.term,
    round((CAST(t.tf AS DOUBLE) / d.dl) * ln(CAST(n AS DOUBLE) / f.df), 6) AS tfidf,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY t.{id_col}
      ORDER BY round((CAST(t.tf AS DOUBLE) / d.dl) * ln(CAST(n AS DOUBLE) / f.df), 6) DESC,
               t.term ASC
    ) AS INT) AS rank
  FROM kwtf t JOIN kwdl d ON d.{id_col} = t.{id_col}
  JOIN kwdf f ON f.term = t.term, kwn
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
