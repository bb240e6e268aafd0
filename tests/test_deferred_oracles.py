"""Mechanical enforcement for the deferred-oracled registry queries.

The driver's CORRECTNESS gate only checks the first 50 registry
entries; the value-oracled queries deliberately ordered outside that
window (workloads/__init__.py::_DEFERRED_ORACLED) would otherwise be
guarded only by convention ("run tools/check_oracle.py before
commits"). A ROTATING TIER of the deferred queries runs against its
DuckDB oracle at sf0.001 on every pytest run (VERDICT r7 item 8: as
the registry passed 70+ deferred entries the full per-run sweep became
pure repetition of what tools/check_oracle.py certifies per session at
sf0.01 — the registry invariants below still run every time, and NO
query loses its oracle):

- tier membership and the active tier both derive from an md5 over the
  sorted deferred list, so ANY registry change reshuffles which third
  runs — coverage rotates as the registry evolves, and a given tree
  always tests the same deterministic subset (reproducible failures);
- ``SPARK_GRAFT_FULL_ORACLES=1`` forces the full per-run sweep (what
  tools/check_oracle.py runs per session at sf0.01 regardless).
"""

import hashlib
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from check_oracle import canon_rows  # noqa: E402  (tools/check_oracle.py)

from delta_lake_experiment_spark.sources.tables import TABLE_NAMES  # noqa: E402
from delta_lake_experiment_spark.workloads import (  # noqa: E402
    _DEFERRED_ORACLED,
    all_oracles,
    all_queries,
)

SF_DIR = "/root/testdata/sf0.001"

_TIERS = 3
_TIER_SALT = ",".join(sorted(_DEFERRED_ORACLED))


def _md5_mod(text: str, mod: int) -> int:
    return int(hashlib.md5(text.encode()).hexdigest(), 16) % mod


_ACTIVE_TIER = _md5_mod(_TIER_SALT, _TIERS)
_SWEEP = (
    sorted(_DEFERRED_ORACLED)
    if os.environ.get("SPARK_GRAFT_FULL_ORACLES") == "1"
    else sorted(
        n
        for n in _DEFERRED_ORACLED
        if _md5_mod(f"{_TIER_SALT}|{n}", _TIERS) == _ACTIVE_TIER
    )
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_every_deferred_query_is_oracled():
    # rows-only queries must never hide in the deferred list — deferral
    # is only legitimate for queries that DO have a value oracle
    oracles = all_oracles()
    missing = [q for q in _DEFERRED_ORACLED if q not in oracles]
    assert missing == [], f"deferred queries without oracles: {missing}"


def test_window_accounting():
    # every oracled query not deferred must fit the driver's 50-entry
    # window, and deferred/rows-only queries must be ordered after it —
    # the registry invariant SURVEY §10 documents
    queries = list(all_queries())
    oracles = all_oracles()
    in_window = queries[:50]
    assert all(q in oracles for q in in_window), "rows-only query inside the window"
    assert not any(q in _DEFERRED_ORACLED for q in in_window)
    n_oracled_nondeferred = len([q for q in oracles if q not in _DEFERRED_ORACLED])
    assert n_oracled_nondeferred <= 50, (
        f"{n_oracled_nondeferred} oracled non-deferred queries cannot fit the "
        "driver's 50-query window — defer some in workloads/__init__.py"
    )


def test_readme_query_counts_match_registry():
    """VERDICT r14 #4 close (the bench-HEADLINE invariant precedent):
    README's literal query counts can no longer drift from the
    registry — every 'N queries' / 'N-query' claim must be the actual
    registry size, and the 'N of M queries oracle-checked' claim must
    be the actual oracled count. A registry change without the README
    edit fails here instead of shipping stale prose."""
    import re

    import __spark_entry__ as entrymod

    total = len(all_queries())
    oracled = len(entrymod.oracle_sql())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(repo, "README.md")).read()
    claims = [
        int(m.group(1))
        for m in re.finditer(r"(\d+)[- ]quer(?:y|ies)", readme)
    ]
    assert claims, "README must state the registry size somewhere"
    bad = [n for n in claims if n != total]
    assert bad == [], (
        f"README claims query count(s) {bad} but the registry has"
        f" {total} — update README.md (counts are gated, not"
        " hand-trusted)"
    )
    m = re.search(r"\((\d+) of (\d+) queries oracle-checked", readme)
    assert m is not None
    assert (int(m.group(1)), int(m.group(2))) == (oracled, total), (
        f"README oracle-coverage claim {m.groups()} != actual"
        f" ({oracled}, {total})"
    )


def test_bench_headline_resolves_against_registry():
    # a renamed/dropped registry entry would otherwise surface as a
    # KeyError inside the driver's bench run, zeroing the round's
    # BENCH file
    import bench

    queries = all_queries()
    missing = [q for q in bench.HEADLINE if q not in queries]
    assert missing == [], f"bench HEADLINE names not in registry: {missing}"
    assert set(bench.BASELINE_SUBSET) <= set(bench.HEADLINE)
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no dups


def test_entry_contract_key_consistency():
    # every oracle belongs to a query; rows-only queries are the known
    # approximate set (a typo'd oracle key would silently become dead
    # SQL while its query degraded to rows-only checking)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "near_dup_minhash", "similarity_lsh_topk", "similarity_ivf_topk",
        "similarity_pq_topk",
        # r16: LSH-signature incremental dedup — banding is
        # xxhash64-derived (no SQL twin); hardened by in-query
        # overlap/size/index-update floors instead
        "incremental_lsh_ingest",
    }


def test_tier_partition_is_exhaustive():
    # the three tiers partition the deferred list: every query belongs
    # to exactly one, so nothing can fall out of rotation
    tiers = {t: [] for t in range(_TIERS)}
    for n in _DEFERRED_ORACLED:
        tiers[_md5_mod(f"{_TIER_SALT}|{n}", _TIERS)].append(n)
    assert sum(len(v) for v in tiers.values()) == len(_DEFERRED_ORACLED)
    assert all(tiers[t] for t in range(_TIERS)), "an empty tier would"
    " silently shrink rotation coverage"


@pytest.mark.parametrize("name", _SWEEP)
def test_deferred_query_matches_oracle(spark, duck, name):
    queries = all_queries()
    oracles = all_oracles()
    assert name in queries, f"deferred query {name!r} not in registry"
    spark.catalog.clearCache()
    df = queries[name](spark, SF_DIR)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    res = duck.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(rows) == len(orows), f"{name}: {len(rows)} vs oracle {len(orows)}"
    assert sorted(cols) == sorted(ocols)
    assert canon_rows(rows, cols) == canon_rows(orows, ocols), name
