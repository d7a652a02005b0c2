"""BPE merge training: equality with a pure-python reference trainer,
re-tokenization with the learned merges, and the sentinel-replace
greedy-merge semantics on adversarial words."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from pdf_ocr_spark.operators.bpe import apply_merges, bpe_train_merges, word_freq

SF_DIR = "/root/testdata/sf0.001"


def _py_train(freq: dict[str, int], n_merges: int):
    """Independent reference: symbol lists + explicit greedy merge."""
    words = {w: ([*w], c) for w, c in freq.items()}
    merges = []
    for rnd in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, c))
        for w, (syms, cnt) in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, cnt)
    return merges, words


def test_train_matches_python_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
        F.col("doc_id") < 120
    )
    got = [
        (r.merge_round, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train_merges(docs, n_merges=6).collect()
    ]
    freq = {r.word: r.cnt for r in word_freq(docs).collect()}
    want, _words = _py_train(freq, 6)
    assert got == want


def test_retokenize_with_learned_merges(spark):
    """The learned merge table must re-tokenize every training word to
    exactly the symbol state the reference trainer ends in — the
    round-trip that certifies the merge table is USABLE, not just
    elected correctly."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
        F.col("doc_id") < 80
    )
    merges = [
        (r.left_sym, r.right_sym) for r in bpe_train_merges(docs, n_merges=6).collect()
    ]
    freq = {r.word: r.cnt for r in word_freq(docs).collect()}
    _m, words = _py_train(freq, 6)
    for w, (syms, _c) in words.items():
        assert apply_merges(w, merges) == syms, w
    # merged symbols reconstruct the word exactly
    for w in list(freq)[:50]:
        assert "".join(apply_merges(w, merges)) == w


def test_greedy_merge_adversarial_words():
    """Overlap and chaining: greedy left-to-right semantics on the
    sentinel representation (verified equal across Spark/DuckDB)."""
    assert apply_merges("aaa", [("a", "a")]) == ["aa", "a"]
    assert apply_merges("aaaa", [("a", "a")]) == ["aa", "aa"]
    assert apply_merges("aaaaa", [("a", "a")]) == ["aa", "aa", "a"]
    assert apply_merges("aaa", [("a", "a"), ("aa", "a")]) == ["aaa"]
    assert apply_merges("abab", [("a", "b"), ("ab", "ab")]) == ["abab"]
    assert apply_merges("", []) == []
    assert apply_merges("x", [("a", "b")]) == ["x"]


def test_word_freq_filters_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "The the THE cat! cat 42 x-y"), (2, None), (3, "  ")],
        "doc_id int, text string",
    )
    freq = {r.word: r.cnt for r in word_freq(df).collect()}
    # 'cat!' and 'x-y' fail ^[a-z0-9]+$; None/blank rows contribute nothing
    assert freq == {"the": 3, "cat": 1, "42": 1}
