#!/usr/bin/env python
"""spark-submit entrypoint for the extraction engine.

Packaged execution (north rule):

    python scripts/make_pyfiles.py              # -> dist/pdf_ocr_spark.zip
    spark-submit --py-files dist/pdf_ocr_spark.zip scripts/run_job.py \
        --input /path/documents --media /path/media \
        --output /path/out --run-id run1 [--resume] \
        [--engine glyph] [--language eng] [--quality high] [--preprocess] \
        [--buckets 256]

Modes:
    --preflight    emit a dependency/system-check JSON (the analogue of
                   the reference's /system-check, app.py:839-892) and exit
    --generate N   materialize an N-document synthetic corpus at --output

On a cluster, master/executor settings come from spark-submit; this
script only declares the job.
"""

from __future__ import annotations

import argparse
import json
import sys


def preflight() -> dict:
    """Executor-side dependency probe: verifies the python runtime on
    every executor can run the kernel (the distributed analogue of
    check_dependencies, /root/reference/app.py:104-178)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()

    def probe(_):
        import importlib
        out = {}
        for mod in ("numpy", "pandas", "pyarrow", "zlib"):
            try:
                m = importlib.import_module(mod)
                out[mod] = getattr(m, "__version__", "builtin")
            except Exception as e:  # pragma: no cover
                out[mod] = f"MISSING: {e}"
        try:
            from pdf_ocr_spark.operators.imaging import ocr_decode
            from pdf_ocr_spark.sources.glyphs import render_text_image

            text, conf = ocr_decode(render_text_image("SELF TEST OK"))
            out["kernel_self_test"] = {"decoded": text, "confidence": conf}
        except Exception as e:
            out["kernel_self_test"] = f"FAILED: {e}"
        return [json.dumps(out)]

    n = spark.sparkContext.defaultParallelism
    results = spark.sparkContext.parallelize(range(n), n).mapPartitions(probe).collect()
    uniq = sorted(set(results))
    report = {
        "executors_probed": n,
        "uniform": len(uniq) == 1,
        "environments": [json.loads(u) for u in uniq],
        "spark_version": spark.version,
    }
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preflight", action="store_true")
    ap.add_argument("--generate", type=int, default=None)
    ap.add_argument("--input")
    ap.add_argument("--media")
    ap.add_argument("--output")
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--engine", default="glyph")
    ap.add_argument("--language", default="eng")
    ap.add_argument("--quality", default="standard")
    ap.add_argument("--preprocess", action="store_true")
    ap.add_argument("--derotate", action="store_true")
    ap.add_argument(
        "--pdf-password",
        default="",
        help="password for encrypted PDFs (tried as user then owner; "
        "empty opens only prompt-free files)",
    )
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    if args.preflight:
        print(json.dumps(preflight(), indent=2))
        return

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pdf-ocr-spark").getOrCreate()

    if args.generate:
        from pdf_ocr_spark.sources.corpus import materialize_corpus

        if not args.output:
            sys.exit("--generate requires --output")
        docs, media = materialize_corpus(spark, args.output, n_docs=args.generate, seed=args.seed)
        print(json.dumps({"documents": docs, "media": media}))
        return

    if not (args.input and args.media and args.output):
        sys.exit("need --input --media --output (or --preflight / --generate)")

    from pdf_ocr_spark.config import ExtractionConfig
    from pdf_ocr_spark.plans.manifest import run_extraction

    cfg = ExtractionConfig(
        ocr_engine=args.engine,
        language=args.language,
        quality=args.quality,
        preprocess=args.preprocess,
        derotate=args.derotate,
        pdf_password=args.pdf_password,
    )
    processed = run_extraction(
        spark,
        spark.read.parquet(args.input),
        spark.read.parquet(args.media),
        args.output,
        args.run_id,
        cfg,
        n_buckets=args.buckets,
    )
    print(json.dumps({"run_id": args.run_id, "buckets_processed": processed}))


if __name__ == "__main__":
    main()
