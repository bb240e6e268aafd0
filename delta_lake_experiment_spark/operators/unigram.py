"""Unigram-LM (SentencePiece-style) tokenizer training over a Spark
corpus (Kudo 2018, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates") — the other
mainstream subword family next to BPE (operators/bpe.py): instead of
greedily growing merges, unigram starts from a LARGE candidate-piece
inventory and iteratively (a) re-estimates piece probabilities from
the corpus and (b) PRUNES the worst pieces, until the target
vocabulary size remains; encoding segments each word into the
maximum-likelihood piece sequence (Viterbi).

Architecture — identical 100 TB split to bpe_train: unigram's
statistics are functions of the WORD-FREQUENCY table, not the corpus.
One distributed aggregation (tokenize + groupBy(word), partial-agg
combine absorbs Zipf skew) reduces any corpus to O(distinct-words)
rows; the EM-prune loop then iterates driver-side on that table plus
an O(candidate-pieces) probability table — megabytes of metadata,
bounded by ``max_words`` (loud-raise collect gate, the cluster.py
``driver_max_edges`` convention) and ``max_candidates``. Expressing
the loop as Spark jobs would schedule ``rounds x em_iters`` shuffles
to recompute what is, after the reduction, an in-memory problem.

This implementation is the HARD-EM (Viterbi) variant: the E-step
counts pieces over each word's single best segmentation rather than
the forward-backward expectation, and pruning ranks pieces by their
estimated count (= probability) rather than the exact
loss-if-removed. Both are standard, documented approximations; what
they buy here is ENGINE-REPRODUCIBILITY — every quantity in the loop
is either an exact integer count or a ``round_digits``-rounded double
(probabilities, log-probs, Viterbi prefix scores), with ties broken
bytewise (equal rounded Viterbi score -> LONGER piece wins; equal
count -> lexicographically smaller piece), so the trained vocabulary
is a pure function of the corpus and the DuckDB twin
(:func:`unigram_vocab_sql`) re-derives the ENTIRE training run —
candidate seeding, every Viterbi DP (a recursive CTE carrying the
prefix-score list per word), every count re-estimation, every prune —
as chained MATERIALIZED CTEs: a VALUE oracle for an iterative
algorithm, the bpe_merges_sql / hashed_logreg_sql / semantic_dedup_sql
precedent.

Segmentability is guaranteed by construction: every single character
of the corpus is seeded and survives every prune; a character whose
Viterbi count drops to zero keeps a floor log-prob
(:data:`FLOOR_LOGP`) so any in-corpus word always has at least the
character-by-character segmentation.

The reference engine has no text surface (SURVEY.md §2.2); this
extends the LLM-pipeline tokenizer lane next to operators/bpe.py.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Iterator, List, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: log-prob assigned to a kept piece whose probability rounds to zero
#: (only ever single characters, kept for segmentability) — a large
#: negative constant both engines state literally, NOT -inf (NULL/inf
#: arithmetic diverges across engines; -100 per piece loses against
#: any real segmentation while keeping scores finite and comparable).
FLOOR_LOGP = -100.0


def _viterbi(
    word: str,
    logp: "dict[str, float]",
    max_piece_len: int,
    round_digits: int,
) -> List[str]:
    """Maximum-likelihood segmentation of one word under a piece
    log-prob table. Prefix scores are rounded at EVERY addition (the
    deterministic-kmeans grid discipline) and ties at the grid break
    toward the LONGER piece — max over (score, piece_len) tuples,
    mirrored bit-for-bit by the SQL twin's ``list_max`` over
    ``{'s': ..., 'l': ...}`` structs."""
    n = len(word)
    dp: List[Tuple[float, int]] = [(0.0, 0)]
    for p in range(1, n + 1):
        best: Tuple[float, int] | None = None
        for ln in range(1, min(max_piece_len, p) + 1):
            lp = logp.get(word[p - ln : p])
            if lp is None:
                continue
            cand = (round(dp[p - ln][0] + lp, round_digits), ln)
            if best is None or cand > best:
                best = cand
        if best is None:
            raise ValueError(
                f"unigram: unsegmentable word {word!r} - the piece table"
                " is missing one of its characters (vocabularies trained"
                " on a different corpus must share its alphabet)"
            )
        dp.append(best)
    out: List[str] = []
    pos = n
    while pos > 0:
        ln = dp[pos][1]
        out.append(word[pos - ln : pos])
        pos -= ln
    out.reverse()
    return out


def _logp_table(
    counts: "dict[str, int]", round_digits: int
) -> "dict[str, float]":
    """Piece log-probs from exact integer counts: prob = round(cnt /
    total, grid); logp = round(ln(prob), grid), or FLOOR_LOGP when the
    prob rounds to zero. Keeping the STATE as integers (not floats)
    means renormalization after a prune is implicit and exact — no
    order-sensitive float summation ever enters the loop.

    Rounding uses the DuckDB-replicated ``round_like_sql``, not
    Python's ``round``: an exact integer ratio with a power-of-two
    total (e.g. ``1/1024``) sits EXACTLY on a decimal-9 midpoint,
    where the two rounding functions provably disagree — the
    functions/rounding.py mismatch class, structural for count
    statistics, not measure-zero."""
    from delta_lake_experiment_spark.functions.rounding import round_like_sql

    total = sum(counts.values())
    if total == 0:
        # reachable: prune to exactly the alphabet when every word
        # segmented through multi-char pieces leaves all kept counts
        # at zero (hypothesis-found). Every piece gets the floor —
        # the twin agrees for free (0/0 is NULL in DuckDB, NULL > 0
        # is false, the CASE falls to the same floor)
        return {piece: FLOOR_LOGP for piece in counts}
    out: "dict[str, float]" = {}
    for piece, cnt in counts.items():
        prob = round_like_sql(cnt / total, round_digits)
        out[piece] = (
            round_like_sql(math.log(prob), round_digits)
            if prob > 0
            else FLOOR_LOGP
        )
    return out


def unigram_train_from_counts(
    word_freqs: Sequence[Tuple[str, int]],
    vocab_size: int,
    rounds: int = 2,
    em_iters: int = 1,
    max_piece_len: int = 4,
    max_candidates: int = 400,
    prune_frac: float = 0.3,
    round_digits: int = 9,
) -> List[Tuple[str, float]]:
    """The exact EM-prune loop on an in-memory word-frequency table.
    Returns the final vocabulary as ``[(piece, logprob)]`` ordered by
    (count desc, piece asc) — the token-id order.

    Loop shape (per round): ``em_iters`` hard-EM steps (Viterbi
    E-step over the word table -> integer piece counts; zero-count
    non-character pieces drop out, characters persist at count 0),
    then a prune keeping all characters plus the top non-character
    pieces by (count desc, piece asc) — down to ``max(vocab_size,
    ceil-style (1 - prune_frac) shrink)`` on intermediate rounds and
    exactly ``vocab_size`` on the last."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size={vocab_size!r} must be >= 1")
    if rounds < 1 or em_iters < 1:
        raise ValueError("rounds and em_iters must be >= 1")
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len={max_piece_len!r} must be >= 1")
    if not 0.0 < prune_frac < 1.0:
        raise ValueError(f"prune_frac={prune_frac!r} must be in (0, 1)")
    words = sorted((str(w), int(f)) for w, f in word_freqs)
    chars = sorted({c for w, _ in words for c in w})
    if not chars:
        raise ValueError("unigram_train: empty corpus")
    if vocab_size < len(chars):
        raise ValueError(
            f"vocab_size={vocab_size} is below the corpus alphabet size"
            f" {len(chars)} - every character must fit (raise vocab_size)"
        )
    if max_candidates < vocab_size:
        raise ValueError(
            f"max_candidates={max_candidates} must be >= vocab_size="
            f"{vocab_size}"
        )

    def prune(counts: "dict[str, int]", keep_n: int) -> "dict[str, int]":
        # characters are unconditionally kept; non-characters compete
        # for the remaining keep_n - |chars| slots by (cnt desc, piece)
        non_char = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )
        kept = {c: counts[c] for c in chars}
        for p, c in non_char[: max(keep_n - len(chars), 0)]:
            kept[p] = c
        return kept

    # seed: every substring of length 1..max_piece_len, counted with
    # multiplicity and weighted by word frequency, capped to the top
    # max_candidates (characters always in)
    seed: Counter = Counter()
    for w, f in words:
        n = len(w)
        for s in range(n):
            for ln in range(1, min(max_piece_len, n - s) + 1):
                seed[w[s : s + ln]] += f
    counts: "dict[str, int]" = prune(dict(seed), max_candidates)

    for r in range(rounds):
        for _ in range(em_iters):
            logp = _logp_table(counts, round_digits)
            est: Counter = Counter()
            for w, f in words:
                for piece in _viterbi(w, logp, max_piece_len, round_digits):
                    est[piece] += f
            counts = dict(est)
            for c in chars:  # characters persist even when unused
                counts.setdefault(c, 0)
        if r < rounds - 1:
            keep_n = max(
                vocab_size,
                len(counts) - math.floor(len(counts) * prune_frac),
            )
        else:
            keep_n = vocab_size
        counts = prune(counts, keep_n)

    logp = _logp_table(counts, round_digits)
    ordered = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
    return [(p, logp[p]) for p, _ in ordered]


def unigram_train(
    df: DataFrame,
    text_col: str,
    vocab_size: int,
    rounds: int = 2,
    em_iters: int = 1,
    max_piece_len: int = 4,
    max_candidates: int = 400,
    prune_frac: float = 0.3,
    round_digits: int = 9,
    min_freq: int = 1,
    max_words: int = 5_000_000,
) -> List[Tuple[str, float]]:
    """Train a unigram tokenizer on a corpus: distributed
    word-frequency aggregation (the one corpus-sized pass — identical
    plan to ``bpe_train``'s), then the exact driver-side EM-prune loop
    on the O(vocab) table. ``min_freq``/``max_words`` are the same
    vocabulary floor + loud collect gate as the BPE lane."""
    from delta_lake_experiment_spark.operators.bpe import word_frequencies

    if min_freq < 1:
        raise ValueError(f"min_freq={min_freq!r} must be >= 1")
    wf = word_frequencies(df, text_col).filter(F.col("freq") >= min_freq)
    wf = wf.persist()
    try:
        n = wf.count()
        if n > max_words:
            raise ValueError(
                f"unigram_train: {n} distinct words exceed"
                f" max_words={max_words}; raise min_freq (the vocabulary"
                " floor) or max_words (driver memory permitting)"
            )
        rows = sorted((r["word"], r["freq"]) for r in wf.collect())
    finally:
        wf.unpersist()
    return unigram_train_from_counts(
        rows,
        vocab_size,
        rounds=rounds,
        em_iters=em_iters,
        max_piece_len=max_piece_len,
        max_candidates=max_candidates,
        prune_frac=prune_frac,
        round_digits=round_digits,
    )


def pieces_to_df(
    spark: SparkSession, pieces: Sequence[Tuple[str, float]]
) -> DataFrame:
    """(token_id, piece, logprob) — the trained vocabulary as a
    DataFrame (token_id is the 1-based rank in training order:
    count desc, piece asc), for writing to an engine table next to
    the corpus it was trained on."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("token_id", IntegerType(), False),
            StructField("piece", StringType(), False),
            StructField("logprob", DoubleType(), False),
        ]
    )
    data = [(i + 1, p, float(lp)) for i, (p, lp) in enumerate(pieces)]
    return spark.createDataFrame(data, schema)


def unigram_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pieces: Sequence[Tuple[str, float]],
    max_piece_len: int = 4,
    round_digits: int = 9,
) -> DataFrame:
    """Encode a corpus with a trained unigram vocabulary: one row per
    document — ``(id_col, tokens array<string>, n_unigram_tokens
    int)`` — each word segmented by the SAME rounded Viterbi the
    trainer ran, so encoding the training corpus reproduces training's
    final segmentation exactly (what the SQL twin certifies).

    Arrow-batched ``mapInPandas`` with per-partition word memoization
    and the ASCII-whitespace tokenizer parity of ``bpe_encode`` (Java
    ``\\s`` splits ASCII whitespace only; Python's ``str.split()``
    would desynchronize on Unicode whitespace). Map-only, no shuffle;
    the piece table broadcasts by closure (O(vocab) floats)."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    logp = {str(p): float(lp) for p, lp in pieces}
    mpl, rd = int(max_piece_len), int(round_digits)
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            id_field,
            StructField("tokens", ArrayType(StringType()), False),
            StructField("n_unigram_tokens", IntegerType(), False),
        ]
    )

    def run(batches: "Iterator") -> "Iterator":
        import re

        import pandas as pd

        ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")
        memo: "dict[str, List[str]]" = {}
        _MEMO_CAP = 2_000_000

        def enc(text: str) -> "tuple[list, int]":
            if len(memo) > _MEMO_CAP:
                memo.clear()
            toks: List[str] = []
            for w in ascii_ws.split(text.strip(" ").lower()):
                if not w:
                    continue
                seg = memo.get(w)
                if seg is None:
                    seg = _viterbi(w, logp, mpl, rd)
                    memo[w] = seg
                toks.extend(seg)
            return toks, len(toks)

        for pdf in batches:
            if pdf[text_col].isnull().any():
                raise ValueError(
                    f"unigram: {text_col} is NULL - texts must be non-NULL"
                    " (filter upstream)"
                )
            encoded = [enc(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": [t for t, _ in encoded],
                    "n_unigram_tokens": [n for _, n in encoded],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# DuckDB value-oracle twins: the ENTIRE training run re-derived as
# chained CTEs (bpe_merges_sql / hashed_logreg_sql precedent). Every
# Viterbi DP is a recursive CTE that carries the growing prefix-score
# list per word — one {'s': score, 'l': backpointer} struct per prefix
# length, extended one position per recursion step with a list_max
# over the max_piece_len candidate splits (LEFT-joined piece lookups;
# larger 'l' wins rounded-score ties, the _viterbi tuple order) — and
# every backtrack is a second recursive CTE walking the backpointers.
# Piece tables are MATERIALIZED: each is referenced max_piece_len
# times by its DP (inlined, the expansion would be exponential — the
# BPE-oracle lesson).
# ---------------------------------------------------------------------------


def _prune_select(src_table: str, keep_non_sql: str) -> str:
    """Prune one counts state: all single characters, plus the top
    ``keep_non_sql`` non-character pieces by (cnt desc, piece asc) —
    the exact Python ``prune`` ordering."""
    return f"""  SELECT piece, cnt FROM {src_table} WHERE len(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece ASC) AS rn
    FROM {src_table} WHERE len(piece) > 1
  ) WHERE rn <= ({keep_non_sql})"""


def _em_step_ctes(
    j: int,
    state: str,
    max_piece_len: int,
    round_digits: int,
    words_table: str = "u_w",
) -> "tuple[list[str], str]":
    """CTEs for one hard-EM step from counts table ``state``:
    log-probs, Viterbi DP (recursive), backtrack (recursive), piece
    counts, next counts state (characters persist at zero; zero-count
    non-characters drop out). Returns (ctes, next_state_name).
    ``words_table`` is the (word, freq) relation the DP runs over —
    training uses the min_freq-filtered ``u_w``; the encode pass uses
    the UNFILTERED corpus words (the operator encodes every word, not
    just the trained-on ones)."""
    rd = int(round_digits)
    cands = ",\n      ".join(
        f"CASE WHEN p{ln}.piece IS NOT NULL THEN "
        f"{{'s': round(d.sc[len(d.sc) - {ln} + 1].s + p{ln}.logp, {rd}), "
        f"'l': {ln}}} END"
        for ln in range(1, max_piece_len + 1)
    )
    joins = "\n    ".join(
        f"LEFT JOIN u_l{j} p{ln} ON len(d.sc) >= {ln} "
        f"AND p{ln}.piece = substr(d.word, len(d.sc) - {ln} + 1, {ln})"
        for ln in range(1, max_piece_len + 1)
    )
    ctes = [
        f"""u_l{j} AS MATERIALIZED (
  SELECT piece,
    CASE WHEN p > 0 THEN round(ln(p), {rd})
         ELSE CAST({FLOOR_LOGP!r} AS DOUBLE) END AS logp
  FROM (
    SELECT piece, round(CAST(cnt AS DOUBLE)
      / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM {state}), {rd}) AS p
    FROM {state}
  )
)""",
        f"""u_dp{j}(word, freq, sc) AS (
  SELECT word, freq, [{{'s': CAST(0.0 AS DOUBLE), 'l': 0}}] FROM {words_table}
  UNION ALL
  SELECT d.word, d.freq, list_append(d.sc, list_max([
      {cands}
    ]))
  FROM u_dp{j} d
    {joins}
  WHERE len(d.sc) <= len(d.word)
)""",
        f"""u_df{j} AS MATERIALIZED (
  SELECT word, freq, sc FROM u_dp{j} WHERE len(sc) = len(word) + 1
)""",
        f"""u_bt{j}(word, freq, pos, l) AS (
  SELECT word, freq, len(word), sc[len(word) + 1].l FROM u_df{j}
  UNION ALL
  SELECT b.word, b.freq, b.pos - b.l, d.sc[b.pos - b.l + 1].l
  FROM u_bt{j} b JOIN u_df{j} d USING (word)
  WHERE b.pos - b.l > 0
)""",
        f"""u_c{j} AS MATERIALIZED (
  SELECT substr(word, pos - l + 1, l) AS piece,
         CAST(SUM(freq) AS BIGINT) AS cnt
  FROM u_bt{j} GROUP BY 1
)""",
        f"""u_s{j + 1} AS MATERIALIZED (
  SELECT pc.piece, COALESCE(c.cnt, CAST(0 AS BIGINT)) AS cnt
  FROM (SELECT piece FROM {state} WHERE len(piece) = 1) pc
  LEFT JOIN u_c{j} c USING (piece)
  UNION ALL
  SELECT piece, cnt FROM u_c{j} WHERE len(piece) > 1
)""",
    ]
    return ctes, f"u_s{j + 1}"


def _unigram_train_ctes(
    src: str,
    text_sql: str,
    vocab_size: int,
    rounds: int,
    em_iters: int,
    max_piece_len: int,
    max_candidates: int,
    prune_frac: float,
    round_digits: int,
    min_freq: int,
) -> "tuple[list[str], str, int]":
    """The shared training CTE chain: word frequencies, substring
    seeding + cap, then per round ``em_iters`` EM steps and one prune.
    Returns (ctes, final_state_name, next_free_step_index).

    Mirrors the operator's validation (a twin accepting what the
    operator rejects is a divergence — the epoch_plan_sql convention):
    static hyperparameters are checked here in Python; the
    data-dependent alphabet-size check (vocab_size must cover every
    corpus character) becomes an in-query ``error()`` guard riding
    the seed state."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size={vocab_size!r} must be >= 1")
    if rounds < 1 or em_iters < 1:
        raise ValueError("rounds and em_iters must be >= 1")
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len={max_piece_len!r} must be >= 1")
    if not 0.0 < prune_frac < 1.0:
        raise ValueError(f"prune_frac={prune_frac!r} must be in (0, 1)")
    if max_candidates < vocab_size:
        raise ValueError(
            f"max_candidates={max_candidates} must be >= vocab_size="
            f"{vocab_size}"
        )
    if min_freq < 1:
        raise ValueError(f"min_freq={min_freq!r} must be >= 1")
    ctes = [
        rf"""u_w AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split_regex(lower(trim({text_sql})), '\s+')) AS word
    FROM {src}
  ) WHERE word <> '' GROUP BY word
  HAVING COUNT(*) >= {int(min_freq)}
)""",
        f"""u_seed AS MATERIALIZED (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT substr(word, s, l) AS piece, freq FROM (
      SELECT word, freq, s,
        unnest(generate_series(1, least({int(max_piece_len)}, len(word) - s + 1))) AS l
      FROM (
        SELECT word, freq, unnest(generate_series(1, len(word))) AS s FROM u_w
      )
    )
  ) GROUP BY piece
)""",
        f"""u_alpha_ok AS MATERIALIZED (
  SELECT CASE
    WHEN (SELECT COUNT(*) FROM u_seed WHERE len(piece) = 1) = 0
    THEN CAST(error('unigram oracle: empty corpus - no characters to'
               || ' seed (the operator raises here too)') AS INT)
    WHEN (SELECT COUNT(*) FROM u_seed WHERE len(piece) = 1)
              > {int(vocab_size)}
    THEN CAST(error('unigram oracle: vocab_size={int(vocab_size)} is below'
               || ' the corpus alphabet size - every character must fit')
         AS INT)
    ELSE 1 END AS ok
)""",
        f"""u_s0 AS MATERIALIZED (
  SELECT piece, cnt FROM (
{_prune_select(
    "u_seed",
    f"{int(max_candidates)}"
    " - (SELECT COUNT(*) FROM u_seed WHERE len(piece) = 1)",
)}
  ), u_alpha_ok
)""",
    ]
    state = "u_s0"
    j = 0
    for r in range(rounds):
        for _ in range(em_iters):
            step_ctes, state = _em_step_ctes(
                j, state, max_piece_len, round_digits
            )
            ctes.extend(step_ctes)
            j += 1
        if r < rounds - 1:
            keep_n = (
                f"GREATEST({int(vocab_size)},"
                f" (SELECT COUNT(*) FROM {state})"
                f" - CAST(FLOOR((SELECT COUNT(*) FROM {state})"
                f" * {float(prune_frac)!r}) AS BIGINT))"
            )
        else:
            keep_n = f"{int(vocab_size)}"
        nxt = f"u_s{j}p"
        ctes.append(
            f"""{nxt} AS MATERIALIZED (
{_prune_select(
    state,
    f"({keep_n}) - (SELECT COUNT(*) FROM {state} WHERE len(piece) = 1)",
)}
)"""
        )
        state = nxt
    return ctes, state, j


def unigram_vocab_sql(
    src: str,
    text_sql: str,
    vocab_size: int,
    rounds: int = 2,
    em_iters: int = 1,
    max_piece_len: int = 4,
    max_candidates: int = 400,
    prune_frac: float = 0.3,
    round_digits: int = 9,
    min_freq: int = 1,
) -> str:
    """DuckDB twin of :func:`unigram_train` + :func:`pieces_to_df` —
    machine-generated from the same hyperparameters; emits a complete
    query returning (token_id, piece, logprob)."""
    ctes, state, _ = _unigram_train_ctes(
        src, text_sql, vocab_size, rounds, em_iters, max_piece_len,
        max_candidates, prune_frac, round_digits, min_freq,
    )
    rd = int(round_digits)
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, piece ASC) AS INT) AS token_id,
  piece,
  CASE WHEN p > 0 THEN round(ln(p), {rd})
       ELSE CAST({FLOOR_LOGP!r} AS DOUBLE) END AS logprob
FROM (
  SELECT piece, cnt, round(CAST(cnt AS DOUBLE)
    / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM {state}), {rd}) AS p
  FROM {state}
)
"""
    )


def unigram_encoded_sql(
    src: str,
    id_sql: str,
    text_sql: str,
    vocab_size: int,
    rounds: int = 2,
    em_iters: int = 1,
    max_piece_len: int = 4,
    max_candidates: int = 400,
    prune_frac: float = 0.3,
    round_digits: int = 9,
    min_freq: int = 1,
) -> str:
    """DuckDB twin of :func:`unigram_train` + :func:`unigram_encode`
    over the SAME corpus: the full training chain, one more Viterbi
    pass under the FINAL vocabulary to segment every distinct word,
    then per-document reassembly in word order (the bpe_encoded_sql
    doc-join pattern). Returns (id, n_unigram_tokens, tokens_md5) —
    tokens_md5 hashes the comma-joined piece sequence, certifying
    pieces AND order."""
    ctes, state, j = _unigram_train_ctes(
        src, text_sql, vocab_size, rounds, em_iters, max_piece_len,
        max_candidates, prune_frac, round_digits, min_freq,
    )
    # one more DP/backtrack under the final vocabulary, over the
    # UNFILTERED corpus words — the operator encodes every word, so
    # with min_freq > 1 the u_w table (training's vocabulary floor)
    # is the wrong relation here: joining it would silently drop
    # below-floor words from the token stream (its next-state CTE is
    # emitted but unused — the segmentation rides u_bt{j})
    ctes.append(
        rf"""u_w_all AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split_regex(lower(trim({text_sql})), '\s+')) AS word
    FROM {src}
  ) WHERE word <> '' GROUP BY word
)"""
    )
    enc_ctes, _ = _em_step_ctes(
        j, state, max_piece_len, round_digits, words_table="u_w_all"
    )
    ctes.extend(enc_ctes)
    # the operator RAISES on a word whose characters fall outside the
    # trained alphabet (possible when min_freq pruned them); a NULL
    # Viterbi cell would instead ride silently through substr — raise
    # via error() the moment any DP cell is NULL
    ctes.append(
        f"""u_seg AS MATERIALIZED (
  SELECT word,
    list(CASE WHEN l IS NULL
      THEN error('unigram oracle: unsegmentable word (character outside'
                 || ' the trained alphabet): ' || word)
      ELSE substr(word, pos - l + 1, l) END ORDER BY pos ASC) AS subs
  FROM u_bt{j} GROUP BY word
)"""
    )
    ctes.append(
        rf"""__uenc_toks AS (
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
), __uenc_agg AS (
  SELECT id, CAST(SUM(len(s.subs)) AS INT) AS n_unigram_tokens,
         md5(string_agg(array_to_string(s.subs, ','), ',' ORDER BY pos))
           AS tokens_md5
  FROM __uenc_toks e JOIN u_seg s USING (word) GROUP BY id
)"""
    )
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f"""
SELECT {id_sql} AS id,
       COALESCE(a.n_unigram_tokens, 0) AS n_unigram_tokens,
       COALESCE(a.tokens_md5, md5('')) AS tokens_md5
FROM {src} LEFT JOIN __uenc_agg a ON a.id = {id_sql}
"""
    )
