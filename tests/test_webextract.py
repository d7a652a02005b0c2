"""Unit tests for the HTML boilerplate-strip extractor on handcrafted
(including malformed) markup — cases the synthetic fixture corpus does
not produce, so the heuristics are pinned beyond the oracle path."""

from pdf_ocr_spark.operators.webextract import (
    links_of,
    main_spans_of,
    main_text_of,
    metadata_of,
)
from pdf_ocr_spark.sources.webgen import escape_html, html_for_doc, tokens_of


def test_structural_pruning_drops_chrome():
    html = """
    <body>
    <header><h1>Site</h1><nav><a href="/a">A</a></nav></header>
    <article><p>real content here</p></article>
    <footer><p>copyright junk</p></footer>
    </body>"""
    assert main_text_of(html) == "real content here"


def test_link_density_drops_ad_but_keeps_linked_prose():
    html = """
    <body><article>
    <div class="ad"><a href="/buy">Buy now</a></div>
    <p>a long sentence of prose that happens to contain
       <a href="/ref">one small link</a> inside much more text</p>
    </article></body>"""
    spans = main_spans_of(html)
    texts = [t for k, t, _ in spans if k == "text"]
    assert len(texts) == 1
    assert "one small link" in texts[0]
    assert "Buy now" not in main_text_of(html)


def test_deepest_dominant_container_wins():
    # body and both wrapper divs tie on score; the tightest wrapper is
    # chosen, so sibling junk outside it is excluded even without a
    # semantic tag.
    html = """
    <body>
    <div class="related"><a href="/x">x</a><a href="/y">y</a></div>
    <div class="outer"><div class="inner">
      <p>alpha beta gamma delta epsilon zeta</p>
      <p>eta theta iota kappa</p>
    </div></div>
    </body>"""
    assert main_text_of(html) == (
        "alpha beta gamma delta epsilon zeta\n\neta theta iota kappa"
    )


def test_split_content_falls_back_to_common_ancestor():
    # content split across two sibling sections: neither reaches the
    # dominance share alone, so their common ancestor is selected and
    # BOTH halves survive.
    html = """
    <body><article>
    <section><p>first half of the story told here</p></section>
    <section><p>second half of the story told here</p></section>
    </article></body>"""
    txt = main_text_of(html)
    assert "first half" in txt and "second half" in txt


def test_interleaved_images_keep_document_order():
    html = """
    <body><article>
    <p>before</p>
    <img src="img://d/1" alt="">
    <p>after</p>
    </article></body>"""
    assert main_spans_of(html) == [
        ("text", "before", None),
        ("image", None, "img://d/1"),
        ("text", "after", None),
    ]


def test_entities_unescaped_and_whitespace_collapsed():
    html = "<body><article><p>a &amp; b\n\t  &lt;c&gt;</p></article></body>"
    assert main_text_of(html) == "a & b <c>"


def test_malformed_markup_tolerated():
    # unclosed p, stray close tag, unquoted attr
    html = "<body><article><p>one<p>two</b><p>three</article>"
    assert main_text_of(html) == "one\n\ntwo\n\nthree"


def test_loose_text_directly_in_div_is_attributed_to_it():
    html = "<body><div>loose text with no paragraph tags</div></body>"
    assert main_text_of(html) == "loose text with no paragraph tags"


def test_script_style_content_never_leaks():
    html = """
    <body><article>
    <style>.x { content: "styled"; }</style>
    <p>kept</p>
    <script>var leaked = "scripted";</script>
    </article></body>"""
    txt = main_text_of(html)
    assert txt == "kept"


def test_links_capture_region_and_order():
    html = """
    <body>
    <header><nav><a href="/n">N</a></nav></header>
    <div><a href="/c">C</a></div>
    <aside><a href="/s">S</a></aside>
    <footer><a href="/f">F</a></footer>
    </body>"""
    assert links_of(html) == [
        ("/n", "N", "nav"),
        ("/c", "C", "content"),
        ("/s", "S", "aside"),
        ("/f", "F", "footer"),
    ]


def test_metadata_fields():
    html = """<html lang="fr"><head><title>T &amp; U</title>
    <meta name="description" content="desc here"></head>
    <body><article><p>x y z</p></body></html>"""
    title, lang, desc, n_links, n_par, n_img, *og = metadata_of(html)
    assert (title, lang, desc) == ("T & U", "fr", "desc here")
    assert (n_links, n_par, n_img) == (0, 1, 0)
    assert og == [None] * 5  # no meta-property tags -> all null


def test_metadata_opengraph_fields():
    html = """<html><head><title>T</title>
    <meta property="og:title" content="OG T">
    <meta property="og:type" content="article">
    <meta property="og:title" content="second wins NOT">
    <meta property="article:published_time" content="2021-02-03T04:00:00Z">
    </head><body><p>x</p></body></html>"""
    *_, og_title, og_type, og_url, og_image, pub = metadata_of(html)
    assert (og_title, og_type) == ("OG T", "article")  # first tag wins
    assert og_url is None and og_image is None
    assert pub == "2021-02-03T04:00:00Z"


def test_empty_and_pathological_inputs():
    assert main_spans_of("") == []
    assert main_text_of("plain text no tags") == "plain text no tags"
    assert links_of("<a>no href</a>") == []
    assert main_spans_of("<p>" * 2000) == []  # nothing but empty blocks


def test_escape_html_matches_reference_order():
    # & first, then < and > (reference app.py:404 order)
    assert escape_html("&<>&amp;") == "&amp;&lt;&gt;&amp;amp;"


def test_fixture_roundtrip_all_layouts():
    text = " ".join(f"tok{i}" for i in range(50))
    for doc_id in (0, 1, 2):  # the three layout variants
        html = html_for_doc(doc_id, text, "en")
        spans = main_spans_of(html)
        assert spans[0] == ("heading", f"Document {doc_id}", None)
        paras = [t for k, t, _ in spans if k == "text"]
        assert " ".join(paras) == text
        imgs = [r for k, _, r in spans if k == "image"]
        # 4 paragraphs of 15 -> one image after paragraph 3
        assert imgs == [f"img://{doc_id}/3"]


def test_tokens_of_mirrors_sql_tokens_semantics():
    assert tokens_of("  a  b\tc \n") == ["a", "b", "c"]
    assert tokens_of("") == []
    assert tokens_of("   ") == []
