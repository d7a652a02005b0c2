"""Unit tests for the sitemaps.org XML parser and its Spark fan-out."""

import pytest
from pyspark.sql import Row

from pdf_ocr_spark.operators.sitemap import parse_sitemap, sitemap_entries
from pdf_ocr_spark.sources.webgen import sitemap_for_site


def test_roundtrip_generated_sitemap():
    xml = sitemap_for_site("s.example.com", [3, 17])
    out = parse_sitemap(xml)
    assert [e["loc"] for e in out] == [
        "https://s.example.com/doc/3",
        "https://s.example.com/doc/17",
    ]
    assert out[0]["lastmod"] == "2026-04-04" and out[0]["priority"] == 0.4


def test_foreign_sitemap_without_namespace():
    xml = """<?xml version="1.0"?>
<urlset>
  <url><loc>https://x/1</loc></url>
  <url><loc>https://x/2</loc><lastmod>2025-01-01</lastmod></url>
</urlset>"""
    out = parse_sitemap(xml)
    assert [e["loc"] for e in out] == ["https://x/1", "https://x/2"]
    assert out[0]["lastmod"] is None and out[0]["priority"] is None
    assert out[1]["lastmod"] == "2025-01-01"


def test_typed_errors():
    with pytest.raises(ValueError, match="malformed"):
        parse_sitemap("<urlset><url>")
    with pytest.raises(ValueError, match="urlset"):
        parse_sitemap("<sitemapindex></sitemapindex>")
    with pytest.raises(ValueError, match="loc"):
        parse_sitemap("<urlset><url><lastmod>x</lastmod></url></urlset>")


def test_spark_fanout_contains_errors_as_rows(spark):
    df = spark.createDataFrame(
        [
            Row(host="a.com", sitemap_xml=sitemap_for_site("a.com", [1])),
            Row(host="bad.com", sitemap_xml="not xml at all <"),
        ]
    )
    rows = {r["host"]: r for r in sitemap_entries(df).collect()}
    assert rows["a.com"]["loc"] == "https://a.com/doc/1"
    assert rows["a.com"]["parse_error"] is None
    assert rows["bad.com"]["loc"] is None
    assert "malformed" in rows["bad.com"]["parse_error"]


def test_sitemap_index_recursion_targets():
    from pdf_ocr_spark.operators.sitemap import parse_sitemap_index

    xml = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://s/a.xml</loc></sitemap>
  <sitemap><loc>https://s/b.xml</loc></sitemap>
</sitemapindex>"""
    assert parse_sitemap_index(xml) == ["https://s/a.xml", "https://s/b.xml"]
    with pytest.raises(ValueError, match="sitemap index"):
        parse_sitemap_index("<urlset></urlset>")
