"""Property-based model test (hypothesis): arbitrary interleavings of
write / range-delete / upsert / scan against a Python dict model must
agree with the engine — a generative generalization of the reference's
seeded randomized test (main_test.go:263-344), with shrinking.

Spark sessions are expensive, so examples are few but each drives a
full multi-tx episode; hypothesis shrinks failing op sequences to
minimal counterexamples.
"""

from __future__ import annotations

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
OPS = st.lists(
    st.one_of(op_write, op_delete, op_delete_dv, op_scan), min_size=1, max_size=25
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
def test_engine_matches_dict_model(spark, ops):
    c = DeltaLakeClient(spark, tempfile.mkdtemp(prefix="prop_"), dataobject_size=3)
    c.new_tx()
    c.create_table("kv", "k BIGINT, v BIGINT")
    c.commit_tx()

    model: dict[int, int] = {}
    c.new_tx()
    for kind, a, b in ops:
        if kind == "write":
            c.write_row("kv", [a, b])
            model[a] = b
        elif kind in ("delete", "delete_dv"):
            # COW rewrite and deletion-vector soft delete must be
            # indistinguishable to every scan — same model transition
            lo, hi = min(a, b), max(a, b)
            c.delete_rows("kv", "k", lo, hi, use_dv=(kind == "delete_dv"))
            for k in [k for k in model if lo <= k <= hi]:
                del model[k]
        else:  # scan inside the open tx: first-seen-per-key wins
            seen: dict[int, int] = {}
            for k, v in c.scan_iter("kv"):
                seen.setdefault(k, v)
            assert seen == model, f"mid-tx scan diverged after {ops}"
            # split the episode across a commit boundary
            c.commit_tx()
            c.new_tx()
    # final check across a commit
    c.commit_tx()
    c.new_tx()
    seen = {}
    for k, v in c.scan_iter("kv"):
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
