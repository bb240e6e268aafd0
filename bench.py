"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints exactly ONE compact JSON
summary line to stdout, LAST (the driver keeps the stdout TAIL, so the
parseable line must be the final thing emitted); the full per-query
record is written to BENCH_LOCAL.json:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect skew). Run locally while iterating:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "range_filter_scan",
    "top_orders_by_price",
    "latest_event_per_user",
    "hourly_event_windows",
    "cube_event_stats",
    "segment_price_percentiles",
    # temporal (sessionization lane — regressed invisibly in r3; benched
    # since r4 so it can't again)
    "user_sessions",
    "events_in_session_intervals",
    # streaming parity
    "streaming_click_attribution",
    # engine (full ACID write/scan/delete/merge/CDC paths)
    "engine_roundtrip_scan",
    "engine_delete_range",
    "engine_upsert_latest",
    "engine_sql_join",
    "engine_sql_merge",
    "engine_change_feed",
    "engine_sql_time_travel",
    # LLM-pipeline extensions
    "doc_train_split",
    "doc_text_stats",
    "doc_winnow_fingerprints",
    "dedup_exact_documents",
    "near_dup_minhash",
    "near_dup_verified",
    "dedup_verified_clusters",
    "incremental_near_dup_ingest",
    "incremental_lsh_ingest",
    "incremental_semantic_ingest",
    "near_dup_simhash",
    "near_dup_embedding",
    "similarity_bruteforce_topk",
    "similarity_lsh_topk",
    # r5: the exact-Jaccard lane is posting-capped now (scale-honest),
    # so the cluster/funnel flagship and the decontamination lane are
    # benched — regressions in the round-4/5 capabilities were
    # previously invisible here (VERDICT r4 item 4)
    "near_dup_jaccard",
    "dedup_cluster_assignment",
    "corpus_curation_funnel",
    "train_contamination",
    "packed_sequences",
    "doc_pii_scrub",
    "doc_line_dedup",
    "corpus_report",
    "embedding_quantization",
    # r5 session 2: chunking, deterministic shuffle (two-phase global
    # rank), unigram LM scoring, and the incremental-ingest flagship
    "doc_chunks",
    "corpus_shuffle",
    "doc_lm_score",
    "incremental_corpus_update",
    # r5 session 3: corpus-composition lane (temperature mixing,
    # per-domain caps, DSIR importance weights)
    "temperature_mixture",
    "domain_capped_corpus",
    "dsir_doc_weights",
    "contamination_spans",
    "training_epoch_plan",
    "bpe_merge_table",
    "bpe_encoded_documents",
    "unigram_vocab",
    "unigram_encoded_documents",
    "gopher_quality_report",
    "embedding_pca_components",
    "embedding_pca_projection",
    "similarity_pca_topk",
    "doc_kn_bigram_score",
    "ccnet_perplexity_buckets",
    "blocklist_filtered_corpus",
    "hard_negative_pairs",
    "source_quality_report",
    "frozen_lm_transfer_score",
    "corpus_topic_report",
    "tokenizer_fertility_report",
    "epoch_expanded_corpus",
    "corpus_mixture_pipeline",
    "similarity_pq_topk",
    # r5 session 4: within-corpus substring-span dedup (Lee et al.),
    # BM25 lexical retrieval, learned quality classifier
    "corpus_span_dedup",
    "bm25_search",
    "quality_classifier_weights",
    "semantic_dedup_corpus",
    "ensemble_dedup",
    "image_text_alignment",
    "bm25_batch_search",
    "split_drift_report",
    "hybrid_search",
    "doc_bigram_score",
    "near_dup_containment",
    "doc_keywords",
    "quality_weighted_sample",
    "bitext_mining_pairs",
    "curriculum_ordered_corpus",
    "hot_ngram_report",
    "doc_novelty",
    "dedup_best_canonical",
    "advanced_curation_pipeline",
    # r7: the ANN tuning report (recall@k across the deterministic lanes)
    "ann_recall_report",
    # r7: multiclass lang-ID training + the predicted-language CCNet gate
    "lang_id_weights",
    "predicted_lang_ccnet_buckets",
    # r7: shuffle-free bucketed ACID join
    "engine_bucketed_join",
    # r7: value-oracled HLL distinct-count report
    "corpus_cardinality_report",
    # r7: PPMI word embeddings (distributed-matvec power iteration)
    "word_embedding_vectors",
    # r7: streaming incremental HLL through the exactly-once sink
    "streaming_cardinality_sketch",
    # r7: CDC-maintained materialized view (incremental == recompute)
    "engine_incremental_mv",
    # r8: persisted IVF index as engine tables + incremental ANN ingest
    "engine_ann_index_search",
    # r8: deterministic count-min heavy hitters (frequency dual of HLL)
    "corpus_heavy_hitters",
    # r8: zero-copy shallow clone with post-clone divergence
    "engine_clone_divergence",
    # r8: column mapping (rename/drop as O(1) metadata, COW across it)
    "engine_schema_evolution",
    # r8: type widening (narrow+wide parquet under one widened schema)
    "engine_type_widening",
    # r8: existingDefault column defaults (stamp-gated read substitution)
    "engine_default_values",
    # r8: exactly-once streaming MERGE upsert sink (pruned per batch)
    "engine_streaming_upsert",
    # r8: cluster-keyed train/test split (near-dups never straddle)
    "leakage_safe_split",
    # r9: Structured-Streaming SOURCE over engine tables (log versions
    # as stream offsets; snapshot-then-tail, exactly-once end to end)
    "engine_stream_source",
    # r9: NOT NULL constraints (in-plan rejection + merge under them)
    "engine_not_null_reject",
    # r9: IVF index drift diagnostic (era split from row stamps)
    "ann_index_staleness_report",
    # r9: streaming corpus dedup (engine source -> incremental index ->
    # exactly-once sink, first-seen-wins across stream runs)
    "streaming_corpus_dedup",
    # r9: streaming change data feed (per-commit insert/delete rows)
    "engine_stream_cdf",
    "engine_stream_bounded",
    "engine_conflict_resolution",
    "engine_generated_columns",
    # r11: identity allocation (OCC race in-query), size-aware OPTIMIZE
    # convergence, startingTimestamp stream slice
    "engine_identity_columns",
    "engine_optimize_sizes",
    "engine_stream_starting_ts",
    "engine_log_retention",
    # r12: protocol/table-feature gating lifecycle (the r4 principle:
    # capability queries are benched so their cost is visible)
    "engine_protocol_gating",
    # r13: DROP TABLE lifecycle (drop -> gate -> vacuum reclaim ->
    # fresh-lineage recreate)
    "engine_drop_table",
    "engine_undrop_recovery",
]

# The HEAVY lanes (r17, VERDICT r16 item 8 — additions-only): the
# 10 most expensive query classes (ingest lifecycles, streaming
# drains, composite diagnostics). None of them is in the frozen r2
# subset, so per-query driver reporting was structurally blind to the
# optimization target class; their timings are ADDED to the compact
# stdout map (existing entries unchanged) plus a heavy_subset_total,
# so round-over-round comparison covers the heavy tail too.
HEAVY_SUBSET = [
    "advanced_curation_pipeline",
    "ann_recall_report",
    "engine_stream_bounded",
    "engine_stream_source",
    "ensemble_dedup",
    "incremental_lsh_ingest",
    "incremental_near_dup_ingest",
    "incremental_semantic_ingest",
    "streaming_corpus_dedup",
    "word_embedding_vectors",
]

# The frozen r2 17-query headline set (BASELINE.md's 23.0 s anchor).
# bench.py reports its subtotal alongside the full headline so
# round-over-round and vs-BASELINE comparisons need no arithmetic over
# shifting headline membership (VERDICT r3 item 5).
BASELINE_SUBSET = [
    "dedup_exact_documents", "doc_text_stats", "engine_delete_range",
    "engine_roundtrip_scan", "engine_sql_join", "engine_upsert_latest",
    "hourly_event_windows", "latest_event_per_user", "near_dup_minhash",
    "near_dup_simhash", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "range_filter_scan",
    "similarity_bruteforce_topk", "similarity_lsh_topk",
    "top_orders_by_price",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("delta_lake_experiment_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # JVM + parquet-reader warm-up (codegen, file index, column decode)
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    from delta_lake_experiment_spark.functions.cache import release_caches
    from delta_lake_experiment_spark.workloads import all_queries

    queries = all_queries()
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    # best-of-2 per query: this is a SHARED host, and a transient
    # contention spike can triple a single measurement (observed on the
    # string-kernel dedup queries). The minimum of two runs measures
    # the engine, not the neighbors; both runs execute end-to-end, and
    # BOTH times are recorded so rounds compare under either protocol
    # (VERDICT r2 wrong-#3).
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = queries[name]
        per_run = []
        failed = False
        for _ in range(2):
            # Operators that persist() intermediates (e.g. the minhash
            # signature table) cannot unpersist them — the consumer owns
            # the lifecycle, and this harness is the consumer. Without
            # this, cached blocks leak across all 2x|HEADLINE| runs and
            # late queries pay the accumulated memory pressure (measured:
            # near_dup_minhash 5.7 s late in the suite vs 1.0 s
            # isolated — the r3 "regression" was exactly this).
            # functions/cache.py::release_caches is the single-sourced
            # release (clearCache for cache-manager entries + a GC nudge
            # for the localCheckpoint blocks the ContextCleaner frees).
            release_caches(spark)
            t0 = time.time()
            # one broken query must not zero the whole round's bench
            # record (r6: an sf0.1-only crash cost a full run) — record
            # the error loudly and keep measuring the other queries;
            # correctness gating is check_oracle's job, not this
            # harness's
            try:
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {e}"[:300]
                print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
                failed = True
                break
            per_run.append(round(time.time() - t0, 3))
        if failed:
            continue
        runs[name] = per_run
        timings[name] = min(per_run)
        print(f"# {name}: best {timings[name]:.2f}s runs={per_run}", file=sys.stderr)

    # a crashed query's missing time must not read as a speedup: with
    # any error the headline total is NOT comparable across rounds, so
    # emit null instead of a shrunken number (per-query timings stay).
    # The same rule applies to the frozen-subset total: a subset query
    # silently omitted via `if q in timings` would shrink the subtotal
    # and read as a speedup (ADVICE r6 #1).
    total = round(sum(timings.values()), 3) if not errors else None
    subset_errored = any(q in errors for q in BASELINE_SUBSET)
    # direct indexing, not `if q in timings`: a subset query that
    # neither ran nor errored (dropped/renamed) must KeyError loudly
    # here rather than silently shrink the subtotal into a fake
    # speedup (review catch on the ADVICE r6 #1 fix)
    subset_total = (
        None
        if subset_errored
        else round(sum(timings[q] for q in BASELINE_SUBSET), 3)
    )
    full = {
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "single_pass_total": round(sum(r[0] for r in runs.values()), 3),
        "baseline_subset_total": subset_total,
        "heavy_subset_total": (
            None
            if any(q in errors for q in HEAVY_SUBSET)
            else round(sum(timings[q] for q in HEAVY_SUBSET), 3)
        ),
        "sf": sf,
        "errors": errors,
    }
    # The driver keeps the TAIL of stdout (BENCH_r03..r06 all recorded
    # "parsed": null with the END of a too-long record in `tail` — the
    # r5 summary-FIRST fix aimed at the wrong end, VERDICT r6 item 1).
    # So: the full record goes ONLY to BENCH_LOCAL.json (which the
    # judge already uses), and stdout carries exactly ONE compact line
    # — totals + the frozen-subset per-query map, ~500 bytes — printed
    # LAST so a tail capture of any length ends with a parseable JSON
    # line.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
        "w",
    ) as f:
        json.dump(full, f, indent=1)
    compact = {
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": {
            q: round(timings[q], 2)
            for q in BASELINE_SUBSET + HEAVY_SUBSET
            if q in timings
        },
        "sf": sf,
        "baseline_subset_total": subset_total,
        # additions-only (r17): same loud-KeyError rule as the frozen
        # subtotal — a silently-missing heavy query must not shrink
        # this into a fake speedup
        "heavy_subset_total": (
            None
            if any(q in errors for q in HEAVY_SUBSET)
            else round(sum(timings[q] for q in HEAVY_SUBSET), 3)
        ),
        "single_pass_total": full["single_pass_total"],
        "n_queries": len(timings),
        "n_errors": len(errors),
        "detail": "BENCH_LOCAL.json",
    }
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
