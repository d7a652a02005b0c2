#!/usr/bin/env python
"""Benchmark harness: runs the headline queries + the flagship span-model
extraction at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "suite_seconds", "value": N, "unit": "sec",
     "queries": {...}, "sf": 0.1, "extraction": {...}}

Each query is executed to completion with a noop sink (full plan, no
driver materialization cost). Extraction throughput is reported as
docs/sec and pages/sec (the reference's own metric,
/root/reference/app.py:560-563).

For the two-parallelism scaling evidence (north rule) see
scripts/scaling_bench.py, which reuses run_extraction_bench here.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pdf_ocr_spark.session import release_session_blocks  # noqa: E402

BENCH_QUERIES = [
    # Python-kernel queries first: they share the session's python
    # worker pool, and measuring them after 35 JVM queries (whose
    # Arrow/broadcast churn recycles workers) inflated their numbers
    # 3-8x (word_boxes 1.2 s isolated vs 24-55 s late-suite). JVM-only
    # queries are position-insensitive.
    "word_boxes",
    "hocr_pages",
    "pdf_page_count",
    "pdf_metadata",
    "pdf_links",
    "pdf_link_graph",
    "pdf_attachments",
    "pdf_form_fields",
    "pdf_outline",
    "pdf_document_profile",
    "stream_pdf_profiles",
    "pdf_extract_text",
    "pdf_extract_text_dct",
    "pdf_extract_text_jpx",
    "pdf_text_layer",
    "pdf_interleaved_spans",
    "html_main_spans",
    "html_main_text",
    "html_links",
    "html_metadata",
    "url_parse",
    "link_graph_all",
    "domain_inlinks",
    "warc_extract_text",
    "robots_decisions",
    "sitemap_entries",
    "recrawl_frontier",
    "crawl_schedule",
    "sitemap_discovery",
    "audio_features",
    "video_frame_sample",
    "multimodal_extract",
    "normalize_chain",
    "paragraph_explode",
    "reassemble_txt",
    "serialize_md",
    "serialize_html",
    "page_count",
    "dedup_exact",
    "dedup_substring",
    "dedup_minhash_lsh",
    "simhash_signatures",
    "doc_fingerprint",
    "knn_cosine_topk",
    "token_stats",
    "quality_score",
    "pii_scrub",
    "repetition_stats",
    "corpus_filter_verdict",
    "lang_id",
    "pricing_summary",
    "window_offsets",
    "topk_per_group",
    "anti_join_unprocessed",
    "region_rollup",
    "asof_prev_error",
    "sessionize_events",
    "lag_lead_values",
    "cube_events",
    "bpe_token_count",
    "dedup_embedding_cosine",
    "semi_join_active_customers",
    "range_join_quantity_buckets",
    "set_except",
    "deterministic_sample",
    "pivot_event_counts",
    "percentiles_exact",
    "argmax_per_user",
    "json_extract_props",
    "grouping_sets_customers",
    "simhash_hamming_pairs",
    "contamination_check",
    "dedup_ngram_jaccard_capped",
    "dedup_embedding_lsh",
    "knn_ivf_topk",
    "knn_int8_topk",
    # round 5: degenerate-exact ANN forms (oracle-checked plumbing) and
    # the streaming-engine reassembly query
    "knn_lsh_exact",
    "knn_ivf_exact",
    "stream_reassemble_txt",
    "profit_by_nation",
    # round 6
    "distinct_users_exact",
    "dedup_substring_hashed",
    "document_curation_profile",
    "knn_hnsw_exact",
    "knn_hnsw_topk",
    "stratified_sample",
    "sequence_packing",
    "bm25_topk",
    "stream_dedup_exact",
    "lm_bigram_familiarity",
    # round 7
    "kmeans_assign",
    "dedup_semantic",
    "knn_ivf_trained",
    "bpe_train_merges",
    "ordered_quality_export",
    "curate_to_packed",
    "quality_classifier_train",
    "quality_classifier_score",
    "bpe_apply_tokens",
    "pagerank_hosts",
    "domain_quota_sample",
    "shard_manifest",
    "mixture_weights",
    "passage_chunks",
    "dedup_cross_snapshot",
    "dedup_substring_rewrite",
    "source_prior_quality",
]

# RUN order (above) keeps python-kernel queries first for timing
# fidelity; EMIT order puts them last. The round driver records
# BENCH_r{N}.json from the tail of this process's output, and the
# round-5 artifact was truncated from the head — losing exactly the
# PDF-query entries that ran (and were emitted) first. Reordering only
# the output dict keeps both properties: faithful timings, and the
# rarely-elsewhere-recorded PDF numbers in the survivable tail.
_EMIT_LAST = [
    "word_boxes",
    "hocr_pages",
    "pdf_page_count",
    "pdf_metadata",
    "pdf_links",
    "pdf_link_graph",
    "pdf_attachments",
    "pdf_form_fields",
    "pdf_outline",
    "pdf_document_profile",
    "stream_pdf_profiles",
    "pdf_extract_text",
    "pdf_extract_text_dct",
    "pdf_extract_text_jpx",
    "pdf_text_layer",
    "pdf_interleaved_spans",
    "document_curation_profile",
    "flagship_extraction",
]


def _emit_order(timings: dict[str, float]) -> dict[str, float]:
    head = {k: v for k, v in timings.items() if k not in _EMIT_LAST}
    tail = {k: timings[k] for k in _EMIT_LAST if k in timings}
    return {**head, **tail}


def build_spark(cpus: int, app: str = "pdf-ocr-spark-bench") -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _exec(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_extraction_bench(
    spark: SparkSession, n_docs: int, seed: int = 42, corpus_dir: str | None = None, reps: int = 1
) -> dict:
    """Flagship pipeline benchmark: read the materialized interleaved
    corpus (documents + media parquet — the Iceberg-input stand-in) ->
    OCR decode -> normalize -> reassemble -> serialize, fully executed.
    Corpus generation happens once (outside the timed region).
    With reps>1, reports the best of the post-warmup repetitions."""
    from pdf_ocr_spark.plans.pipeline import extract_documents
    from pdf_ocr_spark.sources.corpus import materialize_corpus

    corpus_dir = corpus_dir or os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"), f"pdf_ocr_corpus_{n_docs}_{seed}"
    )
    docs_path, media_path = materialize_corpus(spark, corpus_dir, n_docs=n_docs, seed=seed)
    out = extract_documents(
        spark.read.parquet(docs_path), spark.read.parquet(media_path)
    )
    times = []
    agg = None
    for _ in range(reps + 1):  # first run is warmup
        t0 = time.time()
        agg = out.agg(
            F.count("*").alias("docs"),
            F.sum("n_pages").alias("pages"),
            F.sum(F.length("txt")).alias("chars"),
        ).collect()[0]
        times.append(time.time() - t0)
    elapsed = min(times[1:])
    return {
        "n_docs": int(agg["docs"]),
        "n_pages": int(agg["pages"]),
        "out_chars": int(agg["chars"]),
        "seconds": round(elapsed, 3),
        "all_runs": [round(t, 2) for t in times],
        "docs_per_sec": round(agg["docs"] / elapsed, 2),
        "pages_per_sec": round(agg["pages"] / elapsed, 2),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", str(max(200, int(sf * 200000)))))

    import pdf_ocr_spark.entrypoints as ep

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup outside the timed region: JVM/session spin-up (otherwise
    # charged to the first query), the one-time PDF fixture render, and
    # the three oracle expectation manifests (all cached under /tmp by
    # content-fingerprint markers; timed runs measure scan+parse, not
    # fixture generation).
    _exec(ep.QUERIES["normalize_chain"](spark, sf_dir))
    ep._pdf_fixture_dir(spark, sf_dir)
    # the JPEG-scan corpus renders once (~minutes cold) into the same
    # content-fingerprinted /tmp cache; timed reps then measure the
    # scan+DCT-decode+OCR path, not fixture generation
    ep._pdf_fixture_dir(spark, sf_dir, dct=True)
    # likewise the JPEG 2000 corpus (EBCOT tier-1 encode is the priciest
    # render; cached the same way) — warming it moves pdf_extract_text_jpx
    # from correctness-only to a timed row (round-6 task)
    ep._pdf_fixture_dir(spark, sf_dir, jpx=True)
    ep._text_pdf_fixture_dir(spark, sf_dir)
    ep._warc_fixture_dir(spark, sf_dir)
    ep._media_manifest(spark)
    ep._layout_manifest(spark)
    ep._hocr_manifest(spark)

    timings: dict[str, float] = {}
    total0 = time.time()
    for name in BENCH_QUERIES:
        # min-of-2 per query: with 50+ queries in one JVM, a mid-suite
        # GC pause or python-worker recycle lands on SOME query every
        # run (measured: pricing_summary 11.4 s in-suite vs 0.6-1.6 s
        # standalone) — a second back-to-back rep is reliably clean, so
        # the min is the reproducible capability number
        best = None
        for _ in range(2):
            t0 = time.time()
            _exec(ep.QUERIES[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            # operators materialize internal tables (shingles,
            # signatures, LSH buckets — localCheckpoint blocks, which
            # clearCache() does NOT release) that only help within one
            # query; 50+ queries of pinned blocks build memory pressure
            # whose GC/eviction stalls land on unrelated mid-suite
            # queries (measured 4-10x single-query inflation) — release
            # everything between measurements and nudge the JVM GC so
            # the pause is spent here, not inside the next timed query
            release_session_blocks(spark)
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 3)

    # reps=2 -> best of 2 post-warmup runs: local-mode timing noise is
    # +/-30-50% per repetition, one rep made round-over-round numbers
    # incomparable
    extraction = run_extraction_bench(spark, n_docs=n_docs, reps=2)
    timings["flagship_extraction"] = extraction["seconds"]
    total = round(time.time() - total0, 3)

    # value = sum of per-query best times (the reproducible capability
    # number); wall_seconds = what the 2-rep measurement itself cost
    payload = {
        "metric": "suite_seconds",
        "value": round(sum(timings.values()), 3),
        # metric definition changed in r3: value = sum of
        # per-query min-of-2 reps (reproducible capability);
        # wall_seconds below is the pre-r3 wall-clock meaning —
        # compare r1/r2 artifacts against wall_seconds, not value
        "value_definition": "sum of per-query min-of-2 times",
        "unit": "sec",
        "queries": _emit_order(timings),
        "wall_seconds": total,
        "sf": sf,
        "cpus": cpus,
        "extraction": extraction,
    }
    print(json.dumps(payload))
    # The round driver records BENCH_r{N}.json from the TAIL of this
    # process's output and has truncated the head of the timings dict
    # every round since the suite outgrew the tail window (~26 rows
    # lost in r6 despite _EMIT_LAST). Persist the complete payload
    # alongside the repo so a full artifact can be committed per round
    # (BENCH_r{N}_full.json) regardless of the driver's window size.
    try:
        full_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_full_latest.json"
        )
        with open(full_path, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: stdout still carries the payload
    spark.stop()


if __name__ == "__main__":
    main()
