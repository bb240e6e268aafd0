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
op_delete = st.tuples(st.just("delete"), KEYS, KEYS)  # delete keys in [a,b]
op_scan = st.tuples(st.just("scan"), st.just(0), st.just(0))
OPS = st.lists(st.one_of(op_write, op_delete, op_scan), min_size=1, max_size=25)


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
        elif kind == "delete":
            lo, hi = min(a, b), max(a, b)
            c.delete_rows("kv", "k", lo, hi)
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
