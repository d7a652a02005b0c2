"""Unit tests for URL parsing / registrable-domain heuristic and the
repetition-filter columns, on handcrafted rows the fixture corpus does
not produce."""


from pyspark.sql import Row
from pyspark.sql import functions as F

from pdf_ocr_spark.operators.analysis import (
    dup_char_fraction_col,
    dup_fraction_col,
    word_bigrams_strict,
)
from pdf_ocr_spark.operators.weburl import parse_links


def test_registrable_domain_heuristic(spark):
    cases = [
        ("https://www.bbc.co.uk/news", "bbc.co.uk"),
        ("https://site-3.example.com/doc/1", "example.com"),
        ("http://deep.sub.tree.example.org/x", "example.org"),
        ("https://example.com/", "example.com"),
        ("http://localhost/path", "localhost"),
        ("https://a.ac.jp/x", "a.ac.jp"),
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, offset=0, href=h, anchor="", region="content") for i, (h, _) in enumerate(cases)]
    )
    got = {r["href"]: r["domain"] for r in parse_links(df).collect()}
    for href, want in cases:
        assert got[href] == want, (href, got[href], want)


def test_parse_links_fields(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, offset=0, href="https://h.example.com/a/b", anchor="x", region="nav")]
    )
    r = parse_links(df).collect()[0]
    assert (r["scheme"], r["host"], r["path"]) == ("https", "h.example.com", "/a/b")


def test_dup_fraction_columns(spark):
    df = spark.createDataFrame(
        [
            Row(id=0, arr=["a", "b", "a", "a"]),  # 2 dups of 4
            Row(id=1, arr=[]),
            Row(id=2, arr=["xx", "yyyy", "xx"]),  # 2 dup chars of 8... by chars: repeated xx -> 1 - 6/8
        ]
    )
    out = {
        r["id"]: (r["d"], r["c"])
        for r in df.select(
            "id",
            dup_fraction_col(F.col("arr")).alias("d"),
            dup_char_fraction_col(F.col("arr")).alias("c"),
        ).collect()
    }
    assert out[0][0] == 0.5
    assert out[1] == (0.0, 0.0)
    assert out[2][1] == 0.25  # 8 chars total, 6 distinct -> 0.25


def test_word_bigrams_strict_short_arrays(spark):
    df = spark.createDataFrame(
        [Row(id=0, t=["a"]), Row(id=1, t=[]), Row(id=2, t=["a", "b", "c"])]
    )
    out = {
        r["id"]: r["g"]
        for r in df.select("id", word_bigrams_strict(F.col("t")).alias("g")).collect()
    }
    assert out[0] == [] and out[1] == []
    assert out[2] == ["a b", "b c"]
