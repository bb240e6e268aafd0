"""The query workload: every entry in the driver contract's ``queries()``
comes from here. Each module exports ``QUERIES: dict[str, callable]``
(callable: (spark, sf_dir) -> DataFrame) and ``ORACLES: dict[str, str]``
(ANSI SQL for DuckDB over the same tables; a query without an oracle gets
the driver's weaker rows-only check).
"""

from delta_lake_experiment_spark.workloads import (
    engine_queries,
    extensions,
    relational,
    temporal,
)

_MODULES = (relational, temporal, engine_queries, extensions)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
