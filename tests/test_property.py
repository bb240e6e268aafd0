"""Property-based model test (hypothesis): arbitrary interleavings of
write / range-delete / drop+recreate / upsert / scan against a Python
dict model must agree with the engine — a generative generalization of
the reference's seeded randomized test (main_test.go:263-344), with
shrinking.

Spark sessions are expensive, so examples are few but each drives a
full multi-tx episode; hypothesis shrinks failing op sequences to
minimal counterexamples.
"""

from __future__ import annotations

import pytest

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_lake_experiment_spark.client import DeltaLakeClient

KEYS = st.integers(min_value=0, max_value=14)
VALS = st.integers(min_value=0, max_value=999)

op_write = st.tuples(st.just("write"), KEYS, VALS)
op_delete = st.tuples(st.just("delete"), KEYS, KEYS)  # delete keys in [a,b], COW
op_delete_dv = st.tuples(st.just("delete_dv"), KEYS, KEYS)  # same, soft delete
op_scan = st.tuples(st.just("scan"), st.just(0), st.just(0))
# DROP + recreate under the same name: the model simply empties — old
# rows, buffered rows, and DV masks must never resurrect (r13 verb)
op_drop = st.tuples(st.just("drop"), st.just(0), st.just(0))
# RENAME flips the episode between two names: the model is UNCHANGED —
# every row and DV mask must survive the move verbatim (r13 verb)
op_rename = st.tuples(st.just("rename"), st.just(0), st.just(0))
OPS = st.lists(
    st.one_of(
        op_write, op_delete, op_delete_dv, op_scan, op_drop, op_rename
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
@pytest.mark.slow
def test_engine_matches_dict_model(spark, ops):
    c = DeltaLakeClient(spark, tempfile.mkdtemp(prefix="prop_"), dataobject_size=3)
    c.new_tx()
    c.create_table("kv", "k BIGINT, v BIGINT")
    c.commit_tx()

    model: dict[int, int] = {}
    name = "kv"
    c.new_tx()
    for kind, a, b in ops:
        if kind == "write":
            c.write_row(name, [a, b])
            model[a] = b
        elif kind in ("delete", "delete_dv"):
            # COW rewrite and deletion-vector soft delete must be
            # indistinguishable to every scan — same model transition
            lo, hi = min(a, b), max(a, b)
            c.delete_rows(name, "k", lo, hi, use_dv=(kind == "delete_dv"))
            for k in [k for k in model if lo <= k <= hi]:
                del model[k]
        elif kind == "drop":
            # drop + same-tx recreate: fresh lineage, empty state —
            # nothing from before (committed rows, buffered rows, DV
            # masks) may survive into the recreate
            c.drop_table(name)
            c.create_table(name, "k BIGINT, v BIGINT")
            model.clear()
        elif kind == "rename":
            # clone+drop under the hood; the MODEL is unchanged —
            # every row and mask must move verbatim (buffered rows
            # flush first: clone refuses half-buffered state)
            other = "kv_b" if name == "kv" else "kv"
            c.flush_buffer(name)
            c.rename_table(name, other)
            name = other
        else:  # scan inside the open tx: first-seen-per-key wins
            seen: dict[int, int] = {}
            for k, v in c.scan_iter(name):
                seen.setdefault(k, v)
            assert seen == model, f"mid-tx scan diverged after {ops}"
            # split the episode across a commit boundary
            c.commit_tx()
            c.new_tx()
    # final check across a commit
    c.commit_tx()
    c.new_tx()
    seen = {}
    for k, v in c.scan_iter(name):
        seen.setdefault(k, v)
    c.commit_tx()
    assert seen == model


def test_bloom_filter_properties():
    """Blooms never false-negative (the pruning-safety invariant), stay
    usefully selective, and round-trip their JSON encoding exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from delta_lake_experiment_spark.plans.bloom import BloomFilter, build_column_blooms

    values = st.lists(
        st.one_of(st.integers(-(2**62), 2**62), st.text(max_size=30)),
        max_size=200,
    )

    @settings(max_examples=200, deadline=None)
    @given(values, values)
    def check(present, absent):
        built = build_column_blooms({"c": present}, ["c"])
        if not built:  # all-null/untaggable input -> no bloom, never prunes
            return
        bf = BloomFilter.from_json(built["c"])
        for v in present:
            assert bf.might_contain(v)  # NEVER a false negative
        fp = sum(
            1 for v in absent if v not in set(present) and bf.might_contain(v)
        )
        n_absent = len([v for v in absent if v not in set(present)])
        if n_absent >= 50:
            assert fp <= n_absent * 0.2  # ~1% expected; generous bound

    check()


# -- chunking vs a pure-Python oracle -----------------------------------

_WORDS = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=5), min_size=1, max_size=40
)
_PARAMS = st.tuples(
    st.integers(min_value=1, max_value=10),   # max_tokens
    st.integers(min_value=0, max_value=9),    # overlap (clamped below)
)


def _py_chunks(toks, max_tokens, overlap):
    stride = max_tokens - overlap
    n = len(toks)
    if n <= max_tokens:
        nc = 1
    else:
        nc = -(-(n - max_tokens) // stride) + 1
    return [
        (i, nc, toks[i * stride: i * stride + max_tokens]) for i in range(nc)
    ]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_WORDS, min_size=1, max_size=6), params=_PARAMS)
@pytest.mark.slow
def test_chunking_matches_python_oracle(spark, docs, params):
    from delta_lake_experiment_spark.operators.chunking import chunk_documents

    max_tokens, overlap = params
    overlap = min(overlap, max_tokens - 1)
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunks"], r["chunk_text"].split())
        for r in chunk_documents(
            df, "doc_id", "text", max_tokens=max_tokens, overlap=overlap
        ).collect()
    }
    expect = {}
    for i, ws in enumerate(rows):
        for cid, nc, ctoks in _py_chunks(rows[i][1].split(), max_tokens, overlap):
            expect[(i, cid)] = (nc, ctoks)
    assert got == expect


# -- deterministic shuffle vs a pure-Python oracle ----------------------

@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60,
        unique=True,
    ),
    salt=st.text(alphabet="abc", max_size=4),
    digits=st.integers(min_value=1, max_value=3),
)
@pytest.mark.slow
def test_shuffle_rank_matches_python_oracle(spark, keys, salt, digits):
    import hashlib

    from delta_lake_experiment_spark.operators.ordering import deterministic_shuffle

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["shuffle_pos"]
        for r in deterministic_shuffle(
            df, "k", salt=salt, bucket_hex_digits=digits
        ).collect()
    }
    order = sorted(keys, key=lambda k: (hashlib.md5((salt + str(k)).encode()).hexdigest(), k))
    expect = {k: i for i, k in enumerate(order)}
    assert got == expect


# -- incremental ingest vs a Python set model ---------------------------

_BATCHES = st.lists(
    st.lists(st.tuples(st.integers(0, 500), st.integers(0, 12)), min_size=0, max_size=8),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_BATCHES)
@pytest.mark.slow
def test_incremental_ingest_matches_set_model(spark, batches):
    """Arbitrary batch sequences with arbitrary key overlap: the table
    must hold exactly the first-seen (id, fp) per fp across all
    batches, in every interleaving hypothesis generates."""
    import tempfile as tf

    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.operators.incremental import (
        incremental_dedup_ingest,
    )

    c = DeltaLakeClient(spark, tf.mkdtemp(prefix="prop_inc_"))
    c.new_tx()
    c.create_table("corpus", "id bigint, fp string")
    c.commit_tx()

    model: dict[str, int] = {}
    for batch in batches:
        rows = [(i, f"f{fp}") for i, fp in batch]
        if not rows:
            continue
        df = spark.createDataFrame(rows, "id long, fp string")
        n = incremental_dedup_ingest(c, "corpus", df, ["fp"], "id")
        admitted = 0
        batch_first: dict[str, int] = {}
        for i, fp in sorted(batch):
            key = f"f{fp}"
            if key not in batch_first:
                batch_first[key] = i
        for key, i in batch_first.items():
            if key not in model:
                model[key] = i
                admitted += 1
        assert n == admitted
    c.new_tx()
    state = {(r["fp"], r["id"]) for r in c.scan("corpus", with_stamps=False).collect()}
    c.abort_tx()
    assert state == {(fp, i) for fp, i in model.items()}


@pytest.mark.slow
def test_contamination_spans_matches_python_model(spark):
    """Randomized corpora vs a pure-Python diagonal-run oracle."""
    import random

    from delta_lake_experiment_spark.operators.dedup import contamination_spans

    n = 3
    rng = random.Random(7)
    for trial in range(8):
        docs = []
        for i in range(rng.randint(2, 8)):
            toks = [rng.choice("abc") for _ in range(rng.randint(0, 12))]
            split = rng.choice(["train", "val", "test"])
            docs.append((i, " ".join(toks), split))
        # pure-Python expected spans
        def grams(text):
            t = text.split()
            return [tuple(t[i : i + n]) for i in range(len(t) - n + 1)]

        expected = {}
        for tid, ttxt, tsp in docs:
            if tsp != "train":
                continue
            for eid, etxt, esp in docs:
                if esp not in ("val", "test"):
                    continue
                tg, eg = grams(ttxt), grams(etxt)
                best = 0
                # longest run along each (tpos - epos) diagonal
                for diag in range(-len(eg), len(tg) + 1):
                    run = 0
                    for tp in range(len(tg)):
                        ep = tp - diag
                        if 0 <= ep < len(eg) and tg[tp] == eg[ep]:
                            run += 1
                            best = max(best, run)
                        else:
                            run = 0
                if best:
                    expected[(tid, eid)] = best + n - 1
        df = spark.createDataFrame(docs, "doc_id int, text string, split string")
        got = {
            (r["train_id"], r["eval_id"]): r["max_span_tokens"]
            for r in contamination_spans(
                df, "doc_id", "text", "split", shingle_n=n
            ).collect()
        }
        assert got == expected, (trial, docs, got, expected)


def test_temperature_sample_matches_python_model(spark):
    """The kept set equals the pure-Python md5-threshold model exactly
    (certifies the conv/round/md5 parity chain end to end)."""
    import hashlib

    from delta_lake_experiment_spark.operators.mixing import temperature_sample

    rows = [(k, ["en", "fr", "zh"][k % 3]) for k in range(300)]
    target, alpha, salt = 120, 0.5, "prop"
    counts = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    total_pw = sum(c ** alpha for c in counts.values())
    thr = {
        s: round(
            min(1.0, target * (c ** alpha) / (total_pw * c)) * 16 ** 8
        )
        for s, c in counts.items()
    }
    expected = {
        (k, s)
        for k, s in rows
        if int(hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:8], 16)
        < thr[s]
    }
    df = spark.createDataFrame(rows, "k int, lang string")
    got = {
        (r["k"], r["lang"])
        for r in temperature_sample(df, "k", "lang", target, alpha, salt=salt).collect()
    }
    assert got == expected


def test_corpus_substring_spans_random_vs_bruteforce(spark):
    """Randomized pin of the diagonal-islands span detector against a
    brute-force longest-common-contiguous-gram checker — repeated
    grams within documents (multiple diagonals per gram) are exactly
    the case the window construction must not overcount."""
    import random

    from delta_lake_experiment_spark.operators.dedup import (
        corpus_substring_spans,
    )

    rng = random.Random(23)
    n = 3  # gram width small enough that random overlaps occur
    for trial in range(4):
        vocab = [f"w{i}" for i in range(6)]  # tiny vocab -> repeats
        docs = {
            i: [rng.choice(vocab) for _ in range(rng.randint(1, 18))]
            for i in range(8)
        }
        df = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in docs.items()],
            "doc_id int, text string",
        )
        got = {
            (r["id_a"], r["id_b"]): r["max_span_tokens"]
            for r in corpus_substring_spans(
                df, "doc_id", "text", shingle_n=n, min_span_tokens=n
            ).collect()
        }

        def grams(t):
            return [tuple(t[i:i + n]) for i in range(len(t) - n + 1)]

        exp = {}
        for a in docs:
            for b in docs:
                if a >= b:
                    continue
                ga, gb = grams(docs[a]), grams(docs[b])
                best = 0
                # longest run of consecutive positions where ga[i+r] == gb[j+r]
                for i in range(len(ga)):
                    for j in range(len(gb)):
                        r = 0
                        while (i + r < len(ga) and j + r < len(gb)
                               and ga[i + r] == gb[j + r]):
                            r += 1
                        best = max(best, r)
                if best > 0:
                    exp[(a, b)] = best + n - 1
        assert got == exp, f"trial {trial}"


@pytest.mark.slow
def test_unigram_trainer_properties():
    """Pure-Python property sweep of the unigram trainer (no Spark —
    the trainer's loop is driver-side): on arbitrary small corpora the
    trained vocabulary contains the full alphabet, respects
    vocab_size, orders by (count desc, piece asc) with monotone
    logprobs, segments every corpus word losslessly under its own
    vocabulary, is input-order independent, and MATCHES the DuckDB
    twin value-for-value (train AND encode)."""
    import hashlib

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from delta_lake_experiment_spark.operators.unigram import (
        _viterbi,
        unigram_encoded_sql,
        unigram_train_from_counts,
        unigram_vocab_sql,
    )

    words_strategy = st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=7),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=25, deadline=None)
    @given(docs_words=st.lists(words_strategy, min_size=1, max_size=5),
           data=st.data())
    def run(docs_words, data):
        docs = [(i + 1, " ".join(ws)) for i, ws in enumerate(docs_words)]
        wf: dict[str, int] = {}
        for _, t in docs:
            for w in t.split():
                wf[w] = wf.get(w, 0) + 1
        chars = sorted({c for w in wf for c in w})
        vocab_size = data.draw(
            st.integers(min_value=len(chars), max_value=len(chars) + 10)
        )
        kw = dict(
            vocab_size=vocab_size,
            rounds=data.draw(st.integers(1, 2)),
            em_iters=data.draw(st.integers(1, 2)),
            max_piece_len=3,
            max_candidates=vocab_size + 20,
            prune_frac=0.4,
        )
        pieces = unigram_train_from_counts(sorted(wf.items()), **kw)
        vocab = {p for p, _ in pieces}
        assert set(chars) <= vocab
        assert len(pieces) <= vocab_size
        lps = [lp for _, lp in pieces]
        assert lps == sorted(lps, reverse=True)
        logp = dict(pieces)
        for w in wf:
            assert "".join(_viterbi(w, logp, 3, 9)) == w
        # input-order independence (integer-count state)
        assert unigram_train_from_counts(
            sorted(wf.items(), reverse=True), **kw
        ) == pieces
        # DuckDB twins agree value-for-value
        con = duckdb.connect()
        con.execute("CREATE TABLE hdocs(doc_id INT, text VARCHAR)")
        con.executemany("INSERT INTO hdocs VALUES (?, ?)", docs)
        got = con.execute(unigram_vocab_sql("hdocs", "text", **kw)).fetchall()
        assert got == [(i + 1, p, lp) for i, (p, lp) in enumerate(pieces)]
        egot = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                unigram_encoded_sql("hdocs", "doc_id", "text", **kw)
            ).fetchall()
        }
        con.close()
        for did, t in docs:
            toks = []
            for w in t.split():
                toks.extend(_viterbi(w, logp, 3, 9))
            md5 = hashlib.md5(",".join(toks).encode()).hexdigest()
            assert egot[did] == (len(toks), md5)

    run()


op_ev_write = st.tuples(st.just("write"), KEYS, VALS)
op_ev_delete = st.tuples(st.just("delete"), KEYS, KEYS)
op_ev_rename = st.tuples(st.just("rename"), st.just(0), st.just(0))
op_ev_evolve = st.tuples(st.just("evolve_b"), st.just(0), st.just(0))
op_ev_widen = st.tuples(st.just("widen"), st.just(0), st.just(0))
op_ev_scan = st.tuples(st.just("scan"), st.just(0), st.just(0))
EV_OPS = st.lists(
    st.one_of(
        op_ev_write, op_ev_delete, op_ev_rename,
        op_ev_evolve, op_ev_widen, op_ev_scan,
    ),
    min_size=1,
    max_size=18,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=EV_OPS)
def test_schema_evolution_matches_dict_model(spark, ops):
    """Generative interleavings of write / COW delete / RENAME COLUMN /
    DROP+re-ADD-with-DEFAULT / WIDEN / scan against a dict model: every
    O(1)-metadata evolution must be value-transparent to every
    subsequent scan, across commit boundaries, rewrites, and each
    other. Evolutions run in their own committed transaction (the
    documented same-tx contract: rows buffered in the evolving tx are
    post-birth)."""
    c = DeltaLakeClient(spark, tempfile.mkdtemp(prefix="prop_ev_"), dataobject_size=3)
    c.new_tx()
    c.create_table("kv", "k INT, a BIGINT, b STRING")
    c.commit_tx()

    model: dict[int, tuple] = {}  # k -> (a, b)
    a_name, widened = "a", False
    c.new_tx()
    for kind, x, y in ops:
        if kind == "write":
            c.write_row("kv", [x, y, f"s{y}"])
            model[x] = (y, f"s{y}")
        elif kind == "delete":
            lo, hi = min(x, y), max(x, y)
            c.delete_rows("kv", "k", lo, hi)
            for k in [k for k in model if lo <= k <= hi]:
                del model[k]
        elif kind == "rename":
            c.commit_tx()
            c.new_tx()
            new = "a2" if a_name == "a" else "a"
            c.rename_column("kv", a_name, new)
            a_name = new
            c.commit_tx()
            c.new_tx()
        elif kind == "evolve_b":
            c.commit_tx()
            c.new_tx()
            c.drop_column("kv", "b")
            c.add_columns("kv", "b STRING DEFAULT 'd'")
            c.commit_tx()
            c.new_tx()
            # every pre-birth row reads the default; the dropped
            # generation can never resurrect
            model = {k: (va, "d") for k, (va, vb) in model.items()}
        elif kind == "widen" and not widened:
            c.commit_tx()
            c.new_tx()
            c.widen_column("kv", "k", "bigint")
            widened = True
            c.commit_tx()
            c.new_tx()
        elif kind == "scan":
            seen: dict[int, tuple] = {}
            for k, va, vb in c.scan_iter("kv"):
                seen.setdefault(k, (va, vb))
            assert seen == model, f"mid-episode scan diverged after {ops}"
            c.commit_tx()
            c.new_tx()
    c.commit_tx()
    # final check through a FRESH client (log replay of the full
    # evolution history)
    c2 = DeltaLakeClient(spark, c.store.root, dataobject_size=3)
    c2.new_tx()
    assert [f.name for f in c2.table_schema("kv").fields] == [
        "k", a_name, "b",
    ]
    seen = {}
    for k, va, vb in c2.scan_iter("kv"):
        seen.setdefault(k, (va, vb))
    c2.commit_tx()
    assert seen == model


# --- bounded-verifier value identity (r15: VERDICT r14 #2) ----------
# The bounded Levenshtein verify stage (length pre-gate + threshold
# DP) must be VALUE-IDENTICAL to the unbounded DP on arbitrary
# corpora — including non-ASCII text, where Spark's codepoint
# semantics are authoritative. Texts are built from a tiny alphabet
# with a few shared stems so candidate pairs actually form, plus
# multibyte characters to exercise the codepoint path.

_WORDS = ["aa", "ab", "ba", "café", "中文", "naïve", "zz"]
_TEXTS = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=3, max_size=12).map(
        " ".join
    ),
    min_size=3,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_TEXTS)
@pytest.mark.slow
def test_bounded_verifier_value_identical(spark, texts):
    from pyspark.sql import functions as F

    from delta_lake_experiment_spark.operators.dedup import (
        ngram_jaccard_pairs,
        verified_near_duplicates,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    kw = dict(shingle_n=2, candidate_threshold=0.2, prefix_chars=12)
    bounded = verified_near_duplicates(
        docs, "doc_id", "text", max_edit_ratio=0.3, **kw
    )
    cands = ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=2, threshold=0.2
    )
    pfx = docs.select("doc_id", F.substring("text", 1, 12).alias("p"))
    a = pfx.select(F.col("doc_id").alias("id_a"), F.col("p").alias("pa"))
    b = pfx.select(F.col("doc_id").alias("id_b"), F.col("p").alias("pb"))
    unbounded = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("edit_dist", F.levenshtein("pa", "pb"))
        .filter(
            F.col("edit_dist")
            <= F.floor(
                F.lit(0.3) * F.greatest(F.length("pa"), F.length("pb"))
            )
        )
        .select("id_a", "id_b", "jaccard", "edit_dist")
    )
    assert {tuple(r) for r in bounded.collect()} == {
        tuple(r) for r in unbounded.collect()
    }


# --- incremental-vs-one-shot parity (r15 flagship) ------------------
# The persisted-index incremental dedup must equal the one-shot
# pipeline over corpus∪batch restricted to batch-touching pairs on
# ARBITRARY corpora and ARBITRARY batch splits — df cap, set sizes,
# pair orientation, and the bounded verifier all included. Texts reuse
# the bounded-verifier strategy's small shared-stem alphabet (so
# near-dup candidates actually form) plus multibyte words.

_SPLIT = st.lists(st.booleans(), min_size=4, max_size=8)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_TEXTS, split=_SPLIT)
@pytest.mark.slow
def test_incremental_dedup_matches_one_shot_property(spark, texts, split):
    from pyspark.sql import functions as F

    from delta_lake_experiment_spark.operators.dedup import (
        incremental_verified_near_duplicates,
        shingle_hashes,
        verified_near_duplicates,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    # hypothesis picks the batch membership; force both sides nonempty
    is_batch = {
        i: split[i % len(split)] for i, _ in rows
    }
    if all(is_batch.values()):
        is_batch[rows[0][0]] = False
    if not any(is_batch.values()):
        is_batch[rows[0][0]] = True
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    corpus = docs.filter(
        F.col("doc_id").isin([i for i, b in is_batch.items() if not b])
    )
    batch = docs.filter(
        F.col("doc_id").isin([i for i, b in is_batch.items() if b])
    )
    kw = dict(
        shingle_n=2, candidate_threshold=0.2, max_postings=5,
        prefix_chars=12, max_edit_ratio=0.3,
    )
    idx = (
        shingle_hashes(corpus, "doc_id", "text", n=2)
        .distinct()
        .select(F.col("__id").alias("doc_id"), "sh")
    )
    pfx = corpus.select(
        "doc_id", F.substring("text", 1, 12).alias("pfx")
    )
    inc, _, _ = incremental_verified_near_duplicates(
        idx, pfx, batch, "doc_id", "text", **kw
    )
    got = {tuple(r) for r in inc.collect()}
    full = verified_near_duplicates(docs, "doc_id", "text", **kw)
    batch_ids = {i for i, b in is_batch.items() if b}
    want = {
        tuple(r)
        for r in full.collect()
        if r.id_a in batch_ids or r.id_b in batch_ids
    }
    assert got == want


# --- LSH-index incremental parity (r16) ------------------------------
# The banded-signature incremental lane must equal the ONE-SHOT
# pipeline run with the same banded candidate stage over corpus∪batch,
# restricted to batch-touching pairs, on ARBITRARY corpora and splits —
# banding determinism (xxhash64), pair orientation, self-pair
# exclusion, and the bounded verifier all included. (Recall vs the
# exact lane is a separate, fixture-pinned floor; THIS property is
# exact equality against the lane's own one-shot twin.)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_TEXTS, split=_SPLIT)
@pytest.mark.slow
def test_incremental_lsh_matches_one_shot_property(spark, texts, split):
    from pyspark.sql import functions as F

    from delta_lake_experiment_spark.operators.dedup import (
        document_lsh_bands,
        incremental_verified_near_duplicates,
        lsh_candidate_pairs,
        minhash_signatures_hashed,
        shingle_hashes,
        verified_near_duplicates,
    )

    NH, NB = 8, 4
    rows = [(i, t) for i, t in enumerate(texts)]
    is_batch = {i: split[i % len(split)] for i, _ in rows}
    if all(is_batch.values()):
        is_batch[rows[0][0]] = False
    if not any(is_batch.values()):
        is_batch[rows[0][0]] = True
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    corpus = docs.filter(
        F.col("doc_id").isin([i for i, b in is_batch.items() if not b])
    )
    batch = docs.filter(
        F.col("doc_id").isin([i for i, b in is_batch.items() if b])
    )
    idx = document_lsh_bands(
        corpus, "doc_id", "text", shingle_n=2, num_hashes=NH, num_bands=NB
    )
    pfx = corpus.select(
        "doc_id", F.substring("text", 1, 12).alias("pfx")
    )
    inc, new_bands, _ = incremental_verified_near_duplicates(
        idx, pfx, batch, "doc_id", "text",
        index_kind="lsh", shingle_n=2, num_hashes=NH, num_bands=NB,
        prefix_chars=12, max_edit_ratio=0.3,
    )
    got = {tuple(r) for r in inc.collect()}
    full = verified_near_duplicates(
        docs, "doc_id", "text", prefix_chars=12, max_edit_ratio=0.3,
        candidate_fn=lambda d: lsh_candidate_pairs(
            minhash_signatures_hashed(
                shingle_hashes(d, "doc_id", "text", n=2), num_hashes=NH
            ),
            num_bands=NB, num_hashes=NH,
        ),
    )
    batch_ids = {i for i, b in is_batch.items() if b}
    want = {
        tuple(r)
        for r in full.collect()
        if r.id_a in batch_ids or r.id_b in batch_ids
    }
    assert got == want
    # the update rows: num_bands per batch doc, every id in the batch
    assert new_bands.count() == len(batch_ids) * NB
