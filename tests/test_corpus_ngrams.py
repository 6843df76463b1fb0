"""Corpus n-gram frequency tables (SURVEY J39)."""

from collections import Counter

import pytest

from mdscraper_spark.operators import textstats


def _py_ngrams(texts, n):
    c, docs = Counter(), Counter()
    for _, t in texts:
        toks = t.split()
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        c.update(grams)
        docs.update(set(grams))
    return c, docs


def test_bigram_counts_match_python_replay(spark):
    rows = [(i, " ".join(f"w{(i * 3 + j) % 7}" for j in range(12)))
            for i in range(40)] + [(100, "a b"), (101, ""), (102, "  ")]
    occ, docs = _py_ngrams([r for r in rows if r[1].strip()], 2)
    got = {r.ngram: (r.n_occurrences, r.n_docs)
           for r in textstats.corpus_ngram_counts(
               spark.createDataFrame(rows, "doc_id long, text string"),
               n=2, min_count=2).collect()}
    want = {g: (c, docs[g]) for g, c in occ.items() if c >= 2}
    assert got == want


def test_unigram_mode_and_min_count(spark):
    rows = [(0, "x x y"), (1, "x z")]
    got = {r.ngram: (r.n_occurrences, r.n_docs)
           for r in textstats.corpus_ngram_counts(
               spark.createDataFrame(rows, "doc_id long, text string"),
               n=1, min_count=2).collect()}
    assert got == {"x": (3, 2)}    # y, z pruned as singletons


def test_top_k_boundary_deterministic(spark):
    # many ties at the cut: the (count DESC, ngram ASC) total order
    # must pick the lexicographically smallest ngrams
    rows = [(i, f"t{i:02d} t{i:02d}") for i in range(20)]   # each bigram x1
    rows += [(100 + i, "hot pair") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = textstats.corpus_ngram_counts(df, n=2, min_count=1,
                                        top_k=5).collect()
    assert got[0].ngram == "hot pair" and got[0].n_occurrences == 3
    assert [r.ngram for r in got[1:]] == [
        "t00 t00", "t01 t01", "t02 t02", "t03 t03"]

    with pytest.raises(ValueError):
        textstats.corpus_ngram_counts(df, n=0)
    with pytest.raises(ValueError):
        textstats.corpus_ngram_counts(df, n=2, min_count=0)
