"""BPE tokenizer training over a Spark corpus (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
corpus -> subword-merge-table step every modern LM pipeline runs
before encoding its training data.

Architecture (the part that matters at 100 TB): BPE's statistics are
functions of the WORD-FREQUENCY table, not the corpus — "low low
lower" and a trillion-token crawl both reduce to ``{word: count}``
first. So the corpus-sized work is ONE distributed aggregation
(tokenize + groupBy(word), partial-agg combine absorbs the Zipf skew),
producing O(distinct-words) rows — millions, not trillions — and the
iterative merge loop then runs driver-side on that table, exact and
fast, the same "aggregate distributed, iterate on metadata" split as
IVF centroid refinement (operators/similarity.py) and the small-graph
union-find gate (operators/cluster.py). A merge loop expressed as k
Spark jobs (one pair-count shuffle + argmax per merge) would schedule
tens of thousands of jobs to compute what is, after aggregation, a
megabytes-scale problem; ``max_words`` guards the collect with a loud
raise and ``min_freq`` bounds the table (hapax legomena cannot win a
merge against any repeated pair until vocab-sized merge counts).

Determinism: ties in pair frequency break lexicographically on the
pair, so the merge table is a pure function of the corpus — byte-equal
on any cluster size, partitioning, or run. The merge loop is the
textbook algorithm with incremental pair-count maintenance (only words
containing the merged pair are touched per step), verified in pytest
against an independent recount-from-scratch reference implementation.

The reference has no text surface (SURVEY.md §2.2); this extends the
LLM-pipeline lane next to operators/vocab.py (word-level vocabulary).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Iterator, List, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) — case-folded whitespace-token frequencies, the
    distributed reduction BPE statistics live on. One partial-agg
    shuffle to O(distinct words); NULL texts raise (the lm-lane
    contract — a silently uncounted document would bias every
    frequency downstream)."""
    text = F.when(F.col(text_col).isNotNull(), F.col(text_col)).otherwise(
        F.raise_error(
            F.lit(
                f"bpe: {text_col} is NULL - texts must be non-NULL"
                " (filter upstream)"
            )
        )
    )
    return (
        df.select(
            F.explode(F.split(F.lower(F.trim(text)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


Pair = Tuple[str, str]


def _merge_word(syms: Tuple[str, ...], pair: Pair) -> Tuple[str, ...]:
    """Apply one merge left-to-right (the BPE application order)."""
    a, b = pair
    out: List[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train_from_counts(
    word_freqs: Sequence[Tuple[str, int]], num_merges: int
) -> List[Pair]:
    """The exact merge loop on an in-memory word-frequency table:
    repeatedly merge the most frequent adjacent symbol pair (ties ->
    lexicographically smallest pair), ``num_merges`` times or until no
    pair repeats. Incremental maintenance: each step re-counts only the
    words that contained the merged pair (pair -> word index), the
    standard efficient formulation — pytest-pinned against a
    recount-from-scratch reference."""
    words: List[Tuple[str, ...]] = []
    freqs: List[int] = []
    for w, f in word_freqs:
        words.append(tuple(w))
        freqs.append(int(f))
    pair_counts: Counter = Counter()
    where: defaultdict = defaultdict(set)  # pair -> {word index}
    for wi, syms in enumerate(words):
        f = freqs[wi]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            where[p].add(wi)
    merges: List[Pair] = []
    for _ in range(num_merges):
        best: Pair | None = None
        best_n = 0
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None or best_n < 2:
            break  # nothing repeats: further merges are arbitrary
        merges.append(best)
        for wi in list(where[best]):
            syms, f = words[wi], freqs[wi]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                where[p].discard(wi)
            new = _merge_word(syms, best)
            words[wi] = new
            for p in zip(new, new[1:]):
                pair_counts[p] += f
                where[p].add(wi)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_freq: int = 1,
    max_words: int = 5_000_000,
) -> List[Pair]:
    """Train BPE merges on a corpus: distributed word-frequency
    aggregation, then the exact driver-side merge loop (module
    docstring). Returns the ordered merge list.

    ``min_freq`` drops words rarer than the threshold BEFORE the
    collect — the standard vocabulary floor, and the knob that bounds
    driver memory on open-vocabulary crawls. ``max_words`` is the
    loud-failure gate on that bound (the cluster.py
    ``driver_max_edges`` convention): a count on the aggregated table
    (O(vocab) rows, cheap) precedes the collect, and overflow RAISES
    with the remedy instead of OOMing the driver."""
    if num_merges < 0:
        raise ValueError(f"num_merges={num_merges!r} must be >= 0")
    if min_freq < 1:
        raise ValueError(f"min_freq={min_freq!r} must be >= 1")
    wf = word_frequencies(df, text_col).filter(F.col("freq") >= min_freq)
    wf = wf.persist()
    n = wf.count()
    if n > max_words:
        wf.unpersist()
        raise ValueError(
            f"bpe_train: {n} distinct words exceed max_words={max_words};"
            " raise min_freq (the vocabulary floor) or max_words"
            " (driver memory permitting)"
        )
    # deterministic iteration order (collect order is partition order):
    # the algorithm is order-independent given the tie-break, but a
    # sorted table makes the loop's internal state reproducible too
    rows = sorted((r["word"], r["freq"]) for r in wf.collect())
    wf.unpersist()
    return bpe_train_from_counts(rows, num_merges)


def merges_to_df(spark: SparkSession, merges: Sequence[Pair]) -> DataFrame:
    """(rank, left, right, merged) — the merge table as a DataFrame
    (rank is 1-based application order), for writing to an engine
    table next to the corpus it was trained on."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("rank", IntegerType(), False),
            StructField("left", StringType(), False),
            StructField("right", StringType(), False),
            StructField("merged", StringType(), False),
        ]
    )
    data = [
        (i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)
    ]
    return spark.createDataFrame(data, schema)


def encode_word(word: str, merges: Sequence[Pair]) -> Tuple[str, ...]:
    """Apply the merge table to one word SEQUENTIALLY in rank order —
    merge 1 everywhere, then merge 2, ... — exactly what the training
    loop did to the word table, so encoding the training corpus
    reproduces training's final segmentation bit-for-bit (and the SQL
    oracle's replace() chain computes the identical normal form).
    subword-nmt's priority-queue application (lowest-rank applicable
    pair next) coincides on well-behaved corpora but is a different
    stated semantics; sequential is the one this module certifies."""
    syms: Tuple[str, ...] = tuple(word)
    for pair in merges:
        if len(syms) < 2:
            break
        syms = _merge_word(syms, pair)
    return syms


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: Sequence[Pair],
) -> DataFrame:
    """Encode a corpus with a trained merge table: one row per
    document — ``(id_col, tokens array<string>, n_bpe_tokens int)``.

    Arrow-batched ``mapInPandas`` (the multimodal-lane UDF contract:
    Python only where column expressions genuinely cannot express the
    semantics — rank-ordered merge application is an iterative
    fixpoint per word). PER-PARTITION word memoization exploits Zipf:
    a partition's distinct-word count is far below its token count, so
    each distinct word is encoded once per partition; the memo is
    cleared past ``_MEMO_CAP`` entries so an open-vocabulary partition
    bounds executor memory instead of growing without limit. Map-only,
    no shuffle; the merge table broadcasts by closure (O(merges)
    strings).

    Tokenization is pinned to the TRAINING tokenizer's semantics:
    Java/RE2 ``\\s`` is the ASCII whitespace class, so the Python side
    splits on exactly ``[ \\t\\n\\x0b\\f\\r]`` (``str.split()`` would
    also break on U+00A0/U+2028-class Unicode whitespace that
    ``word_frequencies`` treats as word-internal, silently
    desynchronizing encode from train) and trims ASCII spaces only
    (the ``F.trim`` contract)."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    mlist: List[Pair] = [tuple(p) for p in merges]
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            id_field,
            StructField("tokens", ArrayType(StringType()), False),
            StructField("n_bpe_tokens", IntegerType(), False),
        ]
    )

    def run(batches: "Iterator") -> "Iterator":
        import re

        import pandas as pd

        ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")
        memo: "dict[str, tuple[str, ...]]" = {}
        _MEMO_CAP = 2_000_000

        def enc(text: str) -> "tuple[list, int]":
            if len(memo) > _MEMO_CAP:
                memo.clear()
            toks: List[str] = []
            for w in ascii_ws.split(text.lower().strip(" ")):
                if w == "":
                    continue
                got = memo.get(w)
                if got is None:
                    got = encode_word(w, mlist)
                    memo[w] = got
                toks.extend(got)
            return toks, len(toks)

        for pdf in batches:
            if pdf[text_col].isnull().any():
                raise ValueError(
                    f"bpe: {text_col} is NULL - texts must be non-NULL"
                    " (filter upstream)"
                )
            encoded = [enc(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": [t for t, _ in encoded],
                    "n_bpe_tokens": [n for _, n in encoded],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def _bpe_stage_ctes(src: str, text_sql: str, num_merges: int) -> str:
    """The shared CTE chain: words0 (bracket-wrapped symbol strings per
    distinct word + freq + the word itself) and, per merge stage i,
    pair counts -> best pair (cnt >= 2, ties lexicographic) ->
    words{i+1} via non-overlapping left-to-right replace().

    Bracket-wrapping makes string replace() EXACTLY the BPE merge
    application: '[a][a][a][a]' / pattern '[a][a]' -> '[aa][aa]' —
    no shared boundary between adjacent matches, unlike space-joined
    symbols. Valid while symbols never contain '[' / ']' (true for
    the whitespace-tokenized fixture corpus; the operator itself has
    no such restriction) — so words0 RAISES via error() on any
    bracket-containing word rather than silently merging across
    symbol boundaries and reporting a spurious oracle mismatch.
    Every stage CTE is MATERIALIZED: each references its predecessor
    several times, and inlining would make the expansion exponential
    in num_merges."""
    ctes = [
        rf"""words0 AS MATERIALIZED (
  SELECT word,
    CASE WHEN contains(word, '[') OR contains(word, ']')
      THEN error('bpe oracle: word contains a bracket, the bracket-wrap'
                 || ' symbol encoding is invalid for this corpus: ' || word)
      ELSE regexp_replace(word, '(.)', '[\1]', 'g') END AS ws, freq FROM (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
      SELECT unnest(string_split_regex(lower(trim({text_sql})), '\s+')) AS word
      FROM {src}
    ) WHERE word <> '' GROUP BY word
  )
)"""
    ]
    for i in range(num_merges):
        ctes.append(
            rf"""syms{i} AS MATERIALIZED (
  SELECT ws, freq, regexp_extract_all(ws, '\[([^\]]*)\]', 1) AS t FROM words{i}
), pc{i} AS MATERIALIZED (
  SELECT l, r, SUM(freq) AS cnt FROM (
    SELECT freq,
      unnest(list_transform(generate_series(1, len(t) - 1), u -> t[u])) AS l,
      unnest(list_transform(generate_series(1, len(t) - 1), u -> t[u + 1])) AS r
    FROM syms{i}
  ) GROUP BY l, r
), best{i} AS MATERIALIZED (
  SELECT l, r FROM pc{i} WHERE cnt >= 2 ORDER BY cnt DESC, l, r LIMIT 1
), words{i + 1} AS MATERIALIZED (
  SELECT word, CASE WHEN (SELECT COUNT(*) FROM best{i}) = 1
    THEN replace(ws, (SELECT '[' || l || '][' || r || ']' FROM best{i}),
                     (SELECT '[' || l || r || ']' FROM best{i}))
    ELSE ws END AS ws, freq
  FROM words{i}
)"""
        )
    return ",\n".join(ctes)


def bpe_merges_sql(src: str, text_sql: str, num_merges: int) -> str:
    """DuckDB twin of :func:`bpe_train` + :func:`merges_to_df`: the
    full iterative merge computation as ``num_merges`` chained CTE
    stages — a value oracle for an ITERATIVE algorithm (each stage's
    argmax-with-tie-break and merge application mirror the driver
    loop exactly; a stage whose best pair repeats < 2 times emits
    nothing and leaves the word table unchanged, the loop's break)."""
    if num_merges == 0:
        # zero stages would leave an empty UNION body (a parse error);
        # the twin of bpe_train(..., 0) == [] is an empty result set
        return (
            "SELECT 0 AS rank, '' AS \"left\", '' AS \"right\","
            " '' AS merged WHERE FALSE"
        )
    union = "\nUNION ALL ".join(
        f"SELECT {i + 1} AS rank, l AS \"left\", r AS \"right\","
        f" l || r AS merged FROM best{i}"
        for i in range(num_merges)
    )
    return (
        "WITH "
        + _bpe_stage_ctes(src, text_sql, num_merges)
        + "\n"
        + union
    )


def bpe_encoded_sql(
    src: str, id_sql: str, text_sql: str, num_merges: int
) -> str:
    """DuckDB twin of :func:`bpe_train` + :func:`bpe_encode` over the
    SAME corpus: the final stage's word table IS the trained
    segmentation of every in-corpus word (training applies merges in
    rank order — exactly :func:`encode_word`'s semantics), so encoding
    is a token -> words{k} join with order-preserving reassembly.
    Output: (id, n_bpe_tokens, tokens_md5) where tokens_md5 hashes the
    comma-joined subword sequence — ids AND order certified."""
    k = int(num_merges)
    return (
        "WITH "
        + _bpe_stage_ctes(src, text_sql, k)
        + rf""", __enc_toks AS (
  SELECT {id_sql} AS id, pos, word FROM (
    SELECT {id_sql},
      unnest(generate_series(1, len(t))) AS pos,
      unnest(t) AS word
    FROM (
      SELECT {id_sql}, list_filter(
        string_split_regex(lower(trim({text_sql})), '\s+'), w -> w <> ''
      ) AS t
      FROM {src}
    )
  )
), __enc_sub AS (
  SELECT e.id, e.pos, regexp_extract_all(w.ws, '\[([^\]]*)\]', 1) AS subs
  FROM __enc_toks e JOIN words{k} w USING (word)
), __enc_agg AS (
  SELECT id, CAST(SUM(len(subs)) AS INT) AS n_bpe_tokens,
         md5(string_agg(array_to_string(subs, ','), ',' ORDER BY pos)) AS tokens_md5
  FROM __enc_sub GROUP BY id
)
-- left join from the corpus: a whitespace-only document has zero
-- tokens but must still appear (the Spark side emits every row)
SELECT {id_sql} AS id,
       COALESCE(a.n_bpe_tokens, 0) AS n_bpe_tokens,
       COALESCE(a.tokens_md5, md5('')) AS tokens_md5
FROM {src} LEFT JOIN __enc_agg a ON a.id = {id_sql}
"""
    )
