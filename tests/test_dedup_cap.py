"""Stop-shingle cap in ngram_jaccard_pairs: a pathological boilerplate
shingle shared by many docs must be dropped before pairing (bounding
the k(k-1)/2 posting-list blow-up), while genuine signal shingles keep
pairing — with a pure-Python differential oracle replaying the capped
semantics exactly.
"""

import itertools

from pyspark.sql import Observation
from pyspark.sql import functions as F

from mdscraper_spark.operators.dedup import ngram_jaccard_pairs

BOILER = ("site nav header menu footer links about contact privacy terms "
          "copyright legal sitemap search login register help faq press")
PASSAGE = ("the quarterly revenue report shows sustained growth across "
           "every region with notable acceleration in the cloud segment "
           "driven by renewals")


def corpus(spark):
    rows = [
        (0, f"{BOILER} {PASSAGE} alpha", "en"),
        (1, f"{BOILER} {PASSAGE} beta", "en"),
    ]
    for i in range(2, 10):
        rows.append((i, f"{BOILER} filler{i} only{i} words{i}", "en"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def py_oracle(rows, cap, threshold=0.2, bucket_chars=100):
    """Single-threaded replay: shingle, group, cap, pair."""
    def shingles(text):
        toks = text.strip().split()
        return set(" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)) \
            if len(toks) >= 3 else set()

    docs = {i: (lang, len(text) // bucket_chars, shingles(text))
            for i, text, lang in rows}
    counts = {}
    for i, (lang, lb, sh) in docs.items():
        for s in sh:
            counts[(lang, lb, s)] = counts.get((lang, lb, s), 0) + 1
    pairs = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        la, lba, sa = docs[a]
        lb_, lbb, sb = docs[b]
        if (la, lba) != (lb_, lbb):
            continue
        shared = sum(1 for s in sa & sb if counts[(la, lba, s)] <= cap)
        if not shared:
            continue
        jac = round(shared / (len(sa) + len(sb) - shared), 6)
        if jac >= threshold:
            pairs[(a, b)] = jac
    return pairs


def test_stop_shingle_cap_drops_boilerplate_pairs(spark):
    df = corpus(spark)
    obs = Observation("stops")
    capped = ngram_jaccard_pairs(df, max_posting=4, stop_stats=obs)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in capped.collect()}

    rows = [(r.doc_id, r.text, r.lang) for r in df.collect()]
    assert got == py_oracle(rows, cap=4)
    # the signal pair survives; the 8 boilerplate-only docs emit nothing
    assert (0, 1) in got
    assert all({a, b} <= {0, 1} for a, b in got)
    assert obs.get["n_stop_shingles"] > 0
    assert obs.get["n_postings_dropped"] >= 5 * obs.get["n_stop_shingles"]


def test_cap_enforced_for_null_lang_groups(spark):
    """groupBy treats null langs as one candidate group, so the
    anti-join must be null-safe — otherwise the cap is computed for
    null-lang groups but silently never applied to them."""
    rows = [(i, f"{BOILER} filler{i} only{i} words{i}", None)
            for i in range(8)]
    df = spark.createDataFrame(rows,
                               "doc_id long, text string, lang string")
    got = ngram_jaccard_pairs(df, max_posting=4).collect()
    assert got == []                 # hot shingles capped away


def test_minhash_and_simhash_width_guards(spark):
    import pytest

    from mdscraper_spark.operators.dedup import minhash_signatures, simhash

    df = spark.createDataFrame([(0, "a b c d e f", "en")],
                               "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="band"):
        minhash_signatures(df, n_bands=5).collect()
    with pytest.raises(ValueError, match="bits"):
        simhash(df, bits=33).collect()


def test_uncapped_boilerplate_would_blow_up(spark):
    df = corpus(spark)
    # max_posting=None takes the single-pass path (no count pass);
    # a huge finite cap takes the capped path with an empty stop set —
    # both must agree and both blow up quadratically on boilerplate
    uncapped = {(r.doc_a, r.doc_b)
                for r in ngram_jaccard_pairs(df, max_posting=None).collect()}
    huge_cap = {(r.doc_a, r.doc_b)
                for r in ngram_jaccard_pairs(df, max_posting=10**9).collect()}
    assert uncapped == huge_cap
    assert len(uncapped) >= 8 * 7 // 2


def test_capped_plan_stays_cartesian_free_and_broadcasts_stops(spark):
    df = corpus(spark)
    plan = ngram_jaccard_pairs(df)._jdf.queryExecution().executedPlan() \
                                  .toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the stop-key anti-join must be broadcast, not a shuffled join
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
