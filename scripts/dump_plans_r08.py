#!/usr/bin/env python
"""Dump .explain('formatted') for the round-8-touched queries into
plans/r08/<query>_<tag>.txt. Run once from the r07 tree with tag
'before' (git worktree at the round-start commit) and once from the
final tree with tag 'after'."""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "pdf_page_count", "pdf_metadata", "pdf_links", "pdf_attachments",
    "pdf_form_fields", "pdf_outline", "pdf_document_profile",
    "pdf_link_graph", "pdf_extract_text", "document_curation_profile",
    "link_graph_all", "dedup_semantic", "dedup_embedding_lsh",
]

def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    from bench import build_spark
    import pdf_ocr_spark.entrypoints as ep
    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ep._pdf_fixture_dir(spark, sf)
    for name in QUERIES:
        df = ep.QUERIES[name](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name, tag, flush=True)
    spark.stop()

if __name__ == "__main__":
    main()
