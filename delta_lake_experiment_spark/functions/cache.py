"""The cache-lifecycle contract for persisting operators.

Several operators ``persist()`` an intermediate that feeds BOTH a
driver-side metadata collect and multiple branches of the *returned*
lazy plan (minhash signatures, the semdedup assignment, hybrid
retrieval candidates, curriculum keys, ...). The operator cannot
unpersist before returning — the caller has not materialized the
result yet, and an early unpersist silently recomputes the
intermediate once per consuming branch, exactly the duplicated work
the persist exists to prevent. Operators whose cached intermediate is
fully consumed *inside* the call (the logreg trainer's featurized
corpus, BPE's word frequencies, the incremental-ingest batches) DO
release eagerly with try/finally; everything else follows the
contract here:

**The consumer owns the release.** After materializing an operator's
result (collect / write / count), call :func:`release_caches` — or
``spark.catalog.clearCache()`` directly — before the next unrelated
query. Both in-repo harnesses do exactly this per query (bench.py's
headline loop, tools/check_oracle.py's gate loop), which is why
cached blocks do not accumulate across a 100-query suite; a
long-lived interactive session should do the same at its own
query boundaries.
"""

from __future__ import annotations

import gc


def release_caches(spark) -> None:
    """Release every cache-manager entry plus GC-reachable checkpoint
    blocks: ``clearCache()`` drops persisted DataFrames;
    ``gc.collect()`` nudges the ContextCleaner to free the
    localCheckpoint RDD blocks of the cluster/funnel queries (those
    are not cache-manager entries, so clearCache alone misses them —
    the bench.py lesson, r3)."""
    spark.catalog.clearCache()
    gc.collect()
