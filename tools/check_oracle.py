"""Local mimic of the driver's correctness gate: run every entry in
__spark_entry__.queries() on Spark AND its oracle_sql() on DuckDB at the
same scale factor, compare row count / schema / order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from delta_lake_experiment_spark.sources.tables import TABLE_NAMES


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    try:
        from decimal import Decimal

        if isinstance(v, Decimal):
            return f"f:{float(v)!r}"
    except ImportError:
        pass
    if isinstance(v, datetime.datetime):
        return f"t:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return f"s:{v}"


def canon_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        args = args[1:]
    only = set(args)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("check_oracle")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # operators that persist() intermediates (minhash signatures,
        # jaccard shingles) can't release them — the consumer owns the
        # lifecycle (the functions/cache.py contract), and this
        # multi-query loop is the consumer. Same hygiene bench.py
        # applies.
        from delta_lake_experiment_spark.functions.cache import release_caches

        release_caches(spark)
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = df.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS  {name}: {len(rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount spark={len(rows)} oracle={len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"columns spark={sorted(cols)} oracle={sorted(ocols)}")
        if not problems:
            a = canon_rows([tuple(r) for r in rows], cols)
            b = canon_rows(orows, ocols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"OK    {name}: {len(rows)} rows match [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
