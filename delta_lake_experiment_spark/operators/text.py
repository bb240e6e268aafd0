"""Text-analysis operators for large-scale document pipelines.

All pure JVM-side column expressions (no Python UDFs): whole-stage
codegen applies, and at 100 TB the scan stays CPU-bound on vectorized
string kernels instead of Python serialization.

Every operator is deterministic and (deliberately) expressible in ANSI
SQL so results can be oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PUNCT_CLASS = "[.,;:!?]"
STOPWORD_RE = r"\b(the|a|of|and|is|in|to)\b"


def token_count(text: Column) -> Column:
    """Whitespace token count (INT)."""
    return F.size(F.split(F.trim(text), r"\s+"))


# GPT-2-style pretokenizer classes, lookahead-free so the same pattern
# runs on Java regex (Spark) and RE2 (DuckDB): a leading-space word, a
# leading-space number run, a leading-space punctuation run, or bare
# whitespace. This is the unit a byte-pair encoder would merge within —
# the right denominator for tokens-per-document budgeting.
BPE_ISH_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish pretoken count (INT): word / number / punctuation runs
    with their leading space, GPT-2 pretokenizer style. A cheap,
    deterministic stand-in for model token budgeting (true BPE merge
    counts need the vocab; pretoken count is its stable upper-bound
    denominator)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    stripped = F.regexp_replace(text, PUNCT_CLASS, "")
    return (F.length(text) - F.length(stripped)).cast("double") / F.length(text)


def stopword_ratio(text: Column) -> Column:
    """English stopword tokens / total tokens — the n-gram-free core of
    a heuristic language detector."""
    hits = F.size(F.regexp_extract_all(F.lower(text), F.lit(STOPWORD_RE), F.lit(0)))
    return hits.cast("double") / token_count(text)


def lang_id(text: Column, threshold: float = 0.05) -> Column:
    """Heuristic language ID: 'en' when the English stopword ratio
    clears ``threshold``, else 'unk'. At scale this is one pass of
    vectorized regex counting — no model, no UDF."""
    return F.when(stopword_ratio(text) > threshold, F.lit("en")).otherwise(F.lit("unk"))


def quality_score(text: Column) -> Column:
    """Cheap document quality in [0,1]: length saturation × low-punct ×
    mid-length tokens. Deterministic double arithmetic."""
    toks = token_count(text).cast("double")
    length_part = F.least(F.lit(1.0), toks / F.lit(100.0))
    punct_part = F.lit(1.0) - punct_ratio(text)
    avg_tok_len = F.length(text).cast("double") / toks
    shape_part = F.when((avg_tok_len >= 3.0) & (avg_tok_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return length_part * punct_part * shape_part


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the case/whitespace
    normalized text. Identical across engines (md5 is standard), so it
    doubles as an exact-dedup key."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the rolling-hash fingerprinting behind MOSS): hash every word
    ``k``-gram, slide a ``window`` over the hash sequence, keep each
    window's minimum. Guarantees: any shared run of ``window+k-1``
    tokens between two documents shares at least one fingerprint, while
    only ~2/(window+1) of the grams are kept — the standard partial-
    overlap detector (plagiarism, near-dup paragraphs) at a fraction of
    full-shingle cost.

    Output: (``__id``, ``pos``, ``fp``) — one row per SELECTED window
    minimum position (distinct (id, fp, pos) where pos is the argmin
    position, leftmost on ties: the "robust winnowing" choice).

    Implementation is one explode + one window-frame min per document —
    a single shuffle on the doc id; gram hashes are md5-prefix longs so
    the whole pipeline is expressible in ANSI SQL for the DuckDB oracle
    (same trick as the SimHash operator).
    """
    from delta_lake_experiment_spark.functions.arrays import sliding_ngrams

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = sliding_ngrams(toks, k, lambda a, b: F.concat_ws(" ", a, b))
    src = df.select(F.col(id_col).alias("__id"), F.posexplode(grams).alias("pos", "g"))
    # 60-bit md5-prefix hash of the gram (engine-independent)
    h = F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10).cast("long")
    hashed = src.select("__id", "pos", h.alias("h"))
    from pyspark.sql import Window as W

    frame = (
        W.partitionBy("__id").orderBy("pos").rowsBetween(0, window - 1)
    )
    n_grams = W.partitionBy("__id")
    with_min = hashed.select(
        "__id",
        "pos",
        "h",
        F.min("h").over(frame).alias("wmin"),
        F.count("*").over(n_grams).alias("n"),
    )
    # window starting at pos is complete iff pos <= n - window; the
    # selected fingerprint of a window is its min; emitting the leftmost
    # position per (id, fp) run dedups consecutive windows that picked
    # the same gram (robust winnowing)
    starts = with_min.filter(
        (F.col("pos") <= F.col("n") - window) | (F.col("n") < window)
    )
    return (
        starts.groupBy("__id", F.col("wmin").alias("fp"))
        .agg(F.min("pos").alias("pos"))
        .select("__id", "pos", "fp")
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column set."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_bpe_tokens": bpe_token_count(t),
            "n_chars_calc": F.length(t),
            "punct_ratio": punct_ratio(t),
            "stopword_ratio": stopword_ratio(t),
            "lang_pred": lang_id(t),
            "quality": quality_score(t),
            "fp": fingerprint(t),
            "dup_line_frac": dup_line_fraction(t),
            "rep3_ratio": ngram_repetition_ratio(t, 3),
        }
    )


# -- Gopher/C4-style repetition signals --------------------------------
# The standard corpus-quality heuristics for catching degenerate docs
# (boilerplate loops, scraped navigation, keyword stuffing): a document
# whose lines or n-grams repeat heavily carries little training signal.
# Both are pure array expressions over one row — no shuffle, no UDF.


# The one definition of "trimmed line" shared by every line-based
# signal (dup_line_fraction, corpus_line_dedup): trim ALL leading/
# trailing whitespace via regexp — F.trim strips only ASCII space,
# which would count tab-only lines as content and mismatch CRLF
# corpora's trailing \r. Two operators silently diverging on what a
# blank/duplicate line is would be a debugging trap.
LINE_TRIM_RE = r"^\s+|\s+$"


def trim_line(line: Column) -> Column:
    """Whitespace-trimmed form of one line (see LINE_TRIM_RE note)."""
    return F.regexp_replace(line, LINE_TRIM_RE, "")


def dup_line_fraction(text: Column) -> Column:
    """Fraction of lines that are duplicates of an earlier line
    (0.0 = all lines unique). Empty/whitespace-only lines are ignored
    (navigation scrape pages repeat blanks legitimately); trimming via
    :func:`trim_line`."""
    lines = F.filter(
        F.transform(F.split(text, r"\n"), trim_line),
        lambda l: l != "",
    )
    n = F.size(lines)
    uniq = F.size(F.array_distinct(lines))
    return F.when(n > 0, (n - uniq).cast("double") / n).otherwise(F.lit(0.0))


# -- PII scrubbing ------------------------------------------------------
# The C4-style cleaning pass: training corpora must not memorize
# contact details, so emails / phone numbers / IPv4 addresses are
# replaced with typed tags before anything downstream sees the text.
# Heuristic regexes by design (full PII detection needs NER); the
# patterns avoid lookarounds/backrefs so the SAME expression runs on
# Java regex (Spark) and RE2 (DuckDB oracle). All three are one
# vectorized regexp_replace each — no shuffle, no UDF.

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"
IPV4_RE = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"


def count_matches(text: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` (INT) — the
    audit counterpart of :func:`redact_pii` (count before you scrub)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def redact_pii(
    text: Column,
    email_tag: str = "[EMAIL]",
    phone_tag: str = "[PHONE]",
    ip_tag: str = "[IP]",
) -> Column:
    """Replace emails, then phone numbers, then IPv4 addresses with
    typed tags. Application order is fixed (and mirrored in the SQL
    oracle) so engines can never disagree on overlapping matches."""
    out = F.regexp_replace(text, EMAIL_RE, email_tag)
    out = F.regexp_replace(out, PHONE_RE, phone_tag)
    return F.regexp_replace(out, IPV4_RE, ip_tag)


def ngram_repetition_ratio(text: Column, n: int = 3) -> Column:
    """Fraction of word ``n``-grams that are repeats of an earlier gram
    (0.0 = no repetition, -> 1.0 for a looping document). The Gopher
    rule of thumb rejects docs above ~0.2 for larger n.

    Grams are 64-bit xxhash folds of the token hashes, not strings —
    ``array_distinct`` then compares longs instead of allocating and
    comparing n-token strings (~5x on the benched corpus). Equal to
    the string-gram ratio up to 2^-64 hash collisions; the DuckDB
    oracle counts distinct STRING grams, so the hashed lane is
    value-certified every round (the ngram_jaccard_pairs precedent,
    operators/dedup.py)."""
    from delta_lake_experiment_spark.functions.arrays import sliding_ngrams

    toks = F.split(F.lower(F.trim(text)), r"\s+")
    # fold strings directly (xxhash64 accepts mixed long/string args):
    # one array pass fewer than pre-hashing every token
    grams = sliding_ngrams(toks, n, lambda a, b: F.xxhash64(a, b))
    total = F.size(grams)
    uniq = F.size(F.array_distinct(grams))
    return F.when(total > 0, (total - uniq).cast("double") / total).otherwise(
        F.lit(0.0)
    )


# -- Gopher quality rules -----------------------------------------------
# The Gopher paper's document-quality rule set (Rae et al. 2021,
# "Scaling Language Models: Methods, Analysis & Insights from Training
# Gopher", table A1 — the filter battery Dolma/RedPajama/FineWeb
# reproduce): hard bounds on word count, mean word length,
# symbol-to-word ratio, bullet/ellipsis line fractions, the fraction
# of words containing an alphabetic character, and a minimum number of
# distinct "assurance" stop words. All map-only column expressions —
# one vectorized pass per document, no shuffle, engine-portable
# regexes (no lookarounds), every ratio rounded to 6 digits for
# oracle parity.

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
SYMBOL_RE = r"#|\.\.\."  # the paper's "symbols": hash marks and ellipses
BULLET_RE = r"^[-*•]"  # line starts with a bullet glyph
ELLIPSIS_END_RE = r"\.\.\.$"
ALPHA_WORD_RE = r"[A-Za-z]"


def gopher_quality_rules(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    stopwords: "tuple[str, ...]" = GOPHER_STOPWORDS,
    min_stopword_hits: int = 2,
) -> "dict[str, Column]":
    """The Gopher rule battery as named columns: per-signal values,
    one boolean per rule, and ``gopher_pass`` (AND of all rules).
    Defaults are the published thresholds; pass corpus-appropriate
    ``stopwords`` when filtering non-English (or synthetic) corpora —
    the assurance-word rule is vacuous under a list the corpus never
    uses, which is a caller decision, not a silent behavior.

    Word = whitespace token of the trimmed text; line = newline split.
    Empty documents have zero words and fail the min-word rule (never
    divide-by-zero: ratios guard on n > 0)."""
    words = F.filter(
        F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+"),
        lambda w: w != "",
    )
    n_words = F.size(words)
    lines = F.filter(
        F.transform(F.split(F.coalesce(text, F.lit("")), r"\n"), trim_line),
        lambda l: l != "",
    )
    n_lines = F.size(lines)

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 6
        )

    mean_word_len = frac(
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)), n_words
    )
    symbol_ratio = frac(
        F.size(F.regexp_extract_all(F.coalesce(text, F.lit("")),
                                    F.lit(SYMBOL_RE), F.lit(0))),
        n_words,
    )
    bullet_frac = frac(
        F.size(F.filter(lines, lambda l: l.rlike(BULLET_RE))), n_lines
    )
    ellipsis_frac = frac(
        F.size(F.filter(lines, lambda l: l.rlike(ELLIPSIS_END_RE))), n_lines
    )
    alpha_frac = frac(
        F.size(F.filter(words, lambda w: w.rlike(ALPHA_WORD_RE))), n_words
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(s) for s in stopwords]),
        )
    )
    rules = {
        "word_count": n_words,
        "mean_word_len": mean_word_len,
        "symbol_word_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "stopword_hits": stop_hits,
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len),
        "ok_symbol_ratio": symbol_ratio <= max_symbol_word_ratio,
        "ok_bullet_lines": bullet_frac <= max_bullet_line_frac,
        "ok_ellipsis_lines": ellipsis_frac <= max_ellipsis_line_frac,
        "ok_alpha_words": alpha_frac >= min_alpha_word_frac,
        "ok_stopwords": stop_hits >= min_stopword_hits,
    }
    rules["gopher_pass"] = (
        rules["ok_word_count"]
        & rules["ok_mean_word_len"]
        & rules["ok_symbol_ratio"]
        & rules["ok_bullet_lines"]
        & rules["ok_ellipsis_lines"]
        & rules["ok_alpha_words"]
        & rules["ok_stopwords"]
    )
    return rules


def gopher_rules_sql(
    text_sql: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    stopwords: "tuple[str, ...]" = GOPHER_STOPWORDS,
    min_stopword_hits: int = 2,
) -> str:
    """DuckDB twin of :func:`gopher_quality_rules` — a SELECT-column
    fragment (comma-joined named expressions, same column names and
    6-digit grids) machine-generated from the same thresholds. Wrap as
    ``SELECT <id>, {fragment} FROM <table>``. Expects the raw text
    expression; word/line derivations are inlined per column (DuckDB
    CSE handles the repetition)."""
    words = (
        rf"list_filter(string_split_regex(lower(trim(COALESCE({text_sql}, ''))),"
        rf" '\s+'), w -> w <> '')"
    )
    lines = (
        rf"list_filter(list_transform(string_split(COALESCE({text_sql}, ''),"
        rf" chr(10)), l -> regexp_replace(l, '^\s+|\s+$', '', 'g')),"
        rf" l -> l <> '')"
    )
    n_words = f"len({words})"
    n_lines = f"len({lines})"

    def frac(num: str, den: str) -> str:
        return (
            f"round(CASE WHEN {den} > 0 THEN CAST({num} AS DOUBLE)"
            f" / {den} ELSE 0.0 END, 6)"
        )

    mean_wl = frac(
        f"list_aggregate(list_transform({words}, w -> len(w)), 'sum')", n_words
    )
    sym = frac(
        rf"len(regexp_extract_all(COALESCE({text_sql}, ''), '#|\.\.\.'))",
        n_words,
    )
    bullet = frac(
        rf"len(list_filter({lines}, l -> regexp_matches(l, '^[-*•]')))",
        n_lines,
    )
    ellip = frac(
        rf"len(list_filter({lines}, l -> regexp_matches(l, '\.\.\.$')))",
        n_lines,
    )
    alpha = frac(
        rf"len(list_filter({words}, w -> regexp_matches(w, '[A-Za-z]')))",
        n_words,
    )
    stop_list = "[" + ", ".join("'" + s.replace("'", "''") + "'" for s in stopwords) + "]"
    stops = f"len(list_intersect(list_distinct({words}), {stop_list}))"
    cols = [
        f"CAST({n_words} AS INT) AS word_count",
        f"{mean_wl} AS mean_word_len",
        f"{sym} AS symbol_word_ratio",
        f"{bullet} AS bullet_line_frac",
        f"{ellip} AS ellipsis_line_frac",
        f"{alpha} AS alpha_word_frac",
        f"CAST({stops} AS INT) AS stopword_hits",
        f"({n_words} >= {int(min_words)} AND {n_words} <= {int(max_words)})"
        f" AS ok_word_count",
        f"({mean_wl} >= {float(min_mean_word_len)!r} AND"
        f" {mean_wl} <= {float(max_mean_word_len)!r}) AS ok_mean_word_len",
        f"({sym} <= {float(max_symbol_word_ratio)!r}) AS ok_symbol_ratio",
        f"({bullet} <= {float(max_bullet_line_frac)!r}) AS ok_bullet_lines",
        f"({ellip} <= {float(max_ellipsis_line_frac)!r}) AS ok_ellipsis_lines",
        f"({alpha} >= {float(min_alpha_word_frac)!r}) AS ok_alpha_words",
        f"({stops} >= {int(min_stopword_hits)}) AS ok_stopwords",
    ]
    pass_expr = (
        f"(({n_words} >= {int(min_words)} AND {n_words} <= {int(max_words)})"
        f" AND ({mean_wl} >= {float(min_mean_word_len)!r} AND"
        f" {mean_wl} <= {float(max_mean_word_len)!r})"
        f" AND ({sym} <= {float(max_symbol_word_ratio)!r})"
        f" AND ({bullet} <= {float(max_bullet_line_frac)!r})"
        f" AND ({ellip} <= {float(max_ellipsis_line_frac)!r})"
        f" AND ({alpha} >= {float(min_alpha_word_frac)!r})"
        f" AND ({stops} >= {int(min_stopword_hits)}))"
    )
    cols.append(f"{pass_expr} AS gopher_pass")
    return ",\n  ".join(cols)


# -- blocklist filtering (the C4 "bad words" pass) ----------------------


def blocklist_hits(
    text: Column, terms: "tuple[str, ...]", whole_word: bool = True
) -> Column:
    """Number of blocklisted-term occurrences in ``text`` (INT) — the
    C4 cleaning pass's detector (Raffel et al. 2020 dropped any page
    containing a term from the "List of Dirty, Naughty, Obscene..."
    blocklist; the fixture uses a benign stand-in list). One
    vectorized regex count over an alternation of the terms —
    lowercase match, no lookarounds (Java regex == RE2 == DuckDB).
    ``whole_word`` wraps the alternation in word boundaries so
    'class' never matches inside 'classification' (the blocklist
    false-positive everyone hits); term REGEX metacharacters are
    escaped — terms are literals, not patterns."""
    if not terms:
        raise ValueError("blocklist_hits: terms must be non-empty")
    import re as _re

    bad = [t for t in terms if t != t.lower() or not t or _re.search(r"\s", t)]
    if bad:
        raise ValueError(
            f"blocklist terms must be single lowercased tokens, got {bad!r}"
        )
    if whole_word:
        # \b needs a word char on the inside: a term starting/ending
        # with a non-word char (punctuated obfuscations, 'c++') can
        # NEVER match under whole-word boundaries — raise with the
        # remedy instead of silently counting zero forever
        edge = [t for t in terms if not _re.match(r"\w", t[0])
                or not _re.match(r"\w", t[-1])]
        if edge:
            raise ValueError(
                f"whole_word=True cannot match terms with non-word"
                f" edge characters {edge!r} - pass whole_word=False"
                " for those"
            )
    alts = "|".join(_re.escape(t) for t in terms)
    pat = rf"\b({alts})\b" if whole_word else f"({alts})"
    # NULL text would make the count NULL, and the canonical consumer
    # (`hits == 0` filter) would then DROP the document silently —
    # neither "blocked" nor "clean". Raise, matching the text lane's
    # NULL contract (ADVICE r6 #3).
    from delta_lake_experiment_spark.functions.guards import null_checked

    checked = null_checked(text, "blocklist_hits", "text")
    return F.size(F.regexp_extract_all(F.lower(checked), F.lit(pat), F.lit(0)))


def blocklist_hits_sql(
    text_sql: str, terms: "tuple[str, ...]", whole_word: bool = True
) -> str:
    """DuckDB twin of :func:`blocklist_hits` — same escaped
    alternation, same boundaries, same validation."""
    if not terms:
        raise ValueError("blocklist_hits: terms must be non-empty")
    import re as _re

    bad = [t for t in terms if t != t.lower() or not t or _re.search(r"\s", t)]
    if bad:
        raise ValueError(
            f"blocklist terms must be single lowercased tokens, got {bad!r}"
        )
    if whole_word:
        # \b needs a word char on the inside: a term starting/ending
        # with a non-word char (punctuated obfuscations, 'c++') can
        # NEVER match under whole-word boundaries — raise with the
        # remedy instead of silently counting zero forever
        edge = [t for t in terms if not _re.match(r"\w", t[0])
                or not _re.match(r"\w", t[-1])]
        if edge:
            raise ValueError(
                f"whole_word=True cannot match terms with non-word"
                f" edge characters {edge!r} - pass whole_word=False"
                " for those"
            )
    alts = "|".join(_re.escape(t) for t in terms)
    # DuckDB string literals do not process backslash escapes, so the
    # single-backslash \b reaches RE2 as the word boundary directly
    pat = rf"\b({alts})\b" if whole_word else f"({alts})"
    quoted = pat.replace("'", "''")
    # error() on NULL text, mirroring the operator's null_checked raise
    checked = (
        f"CASE WHEN {text_sql} IS NULL THEN CAST(error("
        "'blocklist_hits: text is NULL - must be non-NULL"
        " (filter or coalesce upstream)') AS VARCHAR)"
        f" ELSE {text_sql} END"
    )
    return rf"CAST(len(regexp_extract_all(lower({checked}), '{quoted}')) AS INT)"
