"""S10 retention: manifest TTL expiry."""

from __future__ import annotations

import datetime

from pdf_ocr_spark.plans.manifest import _manifest_dir, expire_manifest, read_manifest
from pdf_ocr_spark.schema import MANIFEST_SCHEMA


def test_expire_manifest(spark, tmp_path):
    out = str(tmp_path / "run")
    now = datetime.datetime.now()
    rows = [
        ("old", 0, None, "completed", 1, 1, 1.0, 0.1, now - datetime.timedelta(days=2)),
        ("new", 1, None, "completed", 1, 1, 1.0, 0.1, now),
    ]
    spark.createDataFrame(rows, MANIFEST_SCHEMA).write.parquet(_manifest_dir(out))
    kept = expire_manifest(spark, out, ttl_seconds=86400)
    assert kept == 1
    m = read_manifest(spark, out).collect()
    assert len(m) == 1 and m[0]["run_id"] == "new"
