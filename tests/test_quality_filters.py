"""Gopher rule filter and CCNet quality buckets (round 5, J44/J45).

The Gopher rules are the published MassiveText thresholds (Rae et al.
2021 appendix A) with the per-rule boolean breakdown curation
forensics needs; CCNet buckets are per-language tertiles over the
corpus-unigram-LM score.  Cases here pin every rule's boundary
behavior and the bucket cut arithmetic; the engine-vs-DuckDB value
parity is covered by the registry oracle (tests/test_queries_oracle.py
SUBSET + tools/check_oracle.py).
"""

import pytest
from pyspark.sql import functions as F

from mdscraper_spark.operators import textstats

GOOD = ("the quick brown fox jumps over the lazy dog and then it "
        "sat down to rest with a book that it did not have before "
        "because reading is of great value to every fox who wants "
        "to be wise and calm about life in the woods every single "
        "day of the year")


def _rules(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.gopher_rules(df, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_gopher_pass_and_rule_booleans(spark):
    rows = [
        (1, GOOD),                                   # passes everything
        (2, "too short to pass"),                    # word count
        (3, "### # ## " + GOOD),                     # symbol ratio
        (4, "\n".join(["- item " + str(i) for i in range(20)])),  # bullets
        (5, "\n".join([f"line {i} trails off..." for i in range(10)])),
        (6, " ".join(["12345"] * 60)),               # no alpha words
        (7, " ".join(["lorem"] * 60)),               # no stop words
    ]
    got = _rules(spark, rows)
    assert got[1]["gopher_pass"] is True
    assert got[2]["ok_word_count"] is False and not got[2]["gopher_pass"]
    assert got[3]["ok_symbol_ratio"] is False
    assert got[4]["ok_bullet_lines"] is False
    assert got[5]["ok_ellipsis_lines"] is False
    assert got[6]["ok_alpha_words"] is False
    assert got[7]["ok_stopwords"] is False and got[7]["n_stop_hits"] == 0


def test_gopher_empty_and_whitespace_docs(spark):
    got = _rules(spark, [(1, ""), (2, " \n\t ")])
    for r in got.values():
        assert r["n_words"] == 0
        assert r["mean_word_len"] == 0.0
        assert r["alpha_frac"] == 0.0
        assert not r["gopher_pass"]
        # ratio rules over an empty doc are vacuously satisfied; the
        # word-count floor is what rejects it
        assert r["ok_symbol_ratio"] and r["ok_bullet_lines"]
        assert not r["ok_word_count"]


def test_gopher_stopword_rule_counts_distinct_words(spark):
    # 'the' repeated 60x is ONE distinct stop word -> fails; adding a
    # single 'and' makes two -> passes the stop-word rule
    got = _rules(spark, [(1, " ".join(["the"] * 60)),
                         (2, " ".join(["the"] * 59) + " and")])
    assert got[1]["n_stop_hits"] == 1 and not got[1]["ok_stopwords"]
    assert got[2]["n_stop_hits"] == 2 and got[2]["ok_stopwords"]


def test_gopher_word_count_boundaries(spark):
    # the rule is inclusive on both ends of [min_words, max_words]
    mk = lambda n: "the and " + " ".join(["word"] * (n - 2))
    got = _rules(spark, [(1, mk(50)), (2, mk(49))],
                 min_words=50, max_words=100)
    assert got[1]["n_words"] == 50 and got[1]["ok_word_count"]
    assert got[2]["n_words"] == 49 and not got[2]["ok_word_count"]


def test_gopher_mean_word_length_bounds(spark):
    # 60 two-char words -> mean 2.0 < 3 fails; 60 eleven-char words
    # -> mean 11.0 > 10 fails
    got = _rules(spark, [(1, " ".join(["ab"] * 60)),
                         (2, " ".join(["abcdefghijk"] * 60))])
    assert got[1]["mean_word_len"] == 2.0
    assert not got[1]["ok_mean_word_len"]
    assert got[2]["mean_word_len"] == 11.0
    assert not got[2]["ok_mean_word_len"]


def test_gopher_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = textstats.gopher_rules(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_ccnet_tertiles_per_language(spark):
    # 6 docs per language with strictly ordered LM scores -> exactly
    # 2 head / 2 middle / 2 tail inside EACH language
    rows = []
    did = 0
    for lang_word in ("the", "el"):   # en vs es stopword carriers
        for i in range(6):
            # vary rare-word mix so avg_logprob strictly decreases
            text = (f"{lang_word} " * (10 - i)
                    + " ".join(f"rare{did}x{j}" for j in range(i + 1)))
            rows.append((did, text))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.ccnet_quality_buckets(df, min_count=2).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "es"}
    for lang, rs in by_lang.items():
        buckets = sorted(r["bucket"] for r in rs)
        assert buckets == ["head", "head", "middle", "middle",
                           "tail", "tail"], (lang, buckets)
        # scores must not increase as buckets go head -> tail
        order = {"head": 0, "middle": 1, "tail": 2}
        rs = sorted(rs, key=lambda r: (-r["avg_logprob"], r["doc_id"]))
        assert [order[r["bucket"]] for r in rs] == sorted(
            order[r["bucket"]] for r in rs)


def test_ccnet_uneven_count_puts_remainder_in_later_buckets(spark):
    # 4 docs in one language: rank arithmetic gives 1 head
    # (rn*3 <= 4 only for rn=1), 1 middle (rn*3 <= 8 for rn=2), 2 tail
    rows = [(i, "the " * (8 - i) + " ".join(
        f"zz{i}q{j}" for j in range(i + 1))) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.ccnet_quality_buckets(df, min_count=2).collect()
    from collections import Counter
    assert Counter(r["bucket"] for r in out) == {
        "head": 1, "middle": 1, "tail": 2}


def test_ccnet_skips_whitespace_only_docs(spark):
    rows = [(1, "the and of that fox"), (2, "   \n  "),
            (3, "the and of that dog")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.ccnet_quality_buckets(df, min_count=1).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 3]


# ---- C4 line-level cleaning (round 5, J48) -------------------------

KEEPABLE = "this line has at least five words."


def _c4(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.c4_line_filter(df, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_c4_terminal_punctuation_set(spark):
    # . ! ? " keep; : ; , unterminated drop — C4's published set
    lines = [
        "ends with a period so it stays.",
        "ends with a bang so it stays!",
        "ends with a question so it stays?",
        'ends with a quote so it stays."'[:-1] + '"',
        "ends with a colon so it drops:",
        "ends with a semicolon so it drops;",
        "has no terminal punctuation so it drops",
    ]
    got = _c4(spark, [(1, "\n".join(lines))])
    assert got[1]["n_lines"] == 7
    assert got[1]["n_kept_lines"] == 4
    assert got[1]["cleaned_text"] == "\n".join(lines[:4])


def test_c4_min_words_boundary_inclusive(spark):
    # >= 5 whitespace words: exactly five passes, four fails
    got = _c4(spark, [(1, "one two three four five.\none two so-short.")])
    assert got[1]["n_kept_lines"] == 1


def test_c4_javascript_and_policy_phrases_case_insensitive(spark):
    lines = [
        "please enable JavaScript to view this page.",
        "we describe our Privacy Policy in detail here.",
        "this site uses cookies to improve your experience.",
        "read the terms of use before you continue on.",
        "a perfectly ordinary sentence that survives the filter.",
    ]
    got = _c4(spark, [(1, "\n".join(lines))])
    assert got[1]["n_kept_lines"] == 1
    assert got[1]["cleaned_text"] == lines[4]


def test_c4_page_level_drops(spark):
    body = "\n".join([KEEPABLE] * 4)
    got = _c4(spark, [
        (1, body),
        (2, body + "\nLorem Ipsum dolor sit amet."),   # ci page drop
        (3, body + "\nfunction f() { return 1; }"),    # curly brace
    ])
    assert got[1]["c4_keep"] is True
    assert got[2]["has_lorem_ipsum"] and not got[2]["c4_keep"]
    assert got[3]["has_curly_brace"] and not got[3]["c4_keep"]
    # the line rules still ran on the dropped pages
    assert got[2]["n_kept_lines"] == 5


def test_c4_min_kept_lines_boundary(spark):
    three = "\n".join([KEEPABLE] * 3)
    two = "\n".join([KEEPABLE] * 2)
    got = _c4(spark, [(1, three), (2, two)])
    assert got[1]["c4_keep"] is True and got[1]["n_kept_lines"] == 3
    assert got[2]["c4_keep"] is False and got[2]["n_kept_lines"] == 2


def test_c4_whitespace_lines_trimmed_and_dropped(spark):
    text = f"  {KEEPABLE}  \n\n   \n\t{KEEPABLE}"
    got = _c4(spark, [(1, text)])
    # blank/whitespace-only lines never count; kept lines are trimmed
    assert got[1]["n_lines"] == 2
    assert got[1]["cleaned_text"] == f"{KEEPABLE}\n{KEEPABLE}"


def test_c4_empty_doc_empty_cleaned_text(spark):
    got = _c4(spark, [(1, ""), (2, "word.")])
    for r in got.values():
        assert r["cleaned_text"] == ""      # '' not NULL (oracle twin)
        assert r["n_kept_lines"] == 0 and r["c4_keep"] is False
    assert got[1]["n_lines"] == 0 and got[2]["n_lines"] == 1


def test_c4_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, KEEPABLE)], "doc_id long, text string")
    plan = textstats.c4_line_filter(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_c4_partition_invariance(spark):
    rows = [(i, "\n".join([KEEPABLE] * (i % 5) + [f"frag {i}"]))
            for i in range(40)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(1)
    df7 = spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(7)
    a = sorted(map(tuple, textstats.c4_line_filter(df1).collect()))
    b = sorted(map(tuple, textstats.c4_line_filter(df7).collect()))
    assert a == b


# ---- DSIR importance weights (round 5, J49) ------------------------

PROSE = "the cat sat on the mat and purred softly"
JUNK = "quantum flux capacitor emits zorp blips xyzzy"


def _dsir(spark, raw_rows, target_rows, **kw):
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(target_rows, "doc_id long, text string")
    out = textstats.dsir_importance_weights(raw, tgt, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_dsir_direction(spark):
    # docs sharing the target's vocabulary outweigh vocabulary-disjoint
    # junk — the property importance resampling selects on
    raw = [(1, PROSE), (2, JUNK),
           (3, "the dog sat on the rug and barked loudly")]
    tgt = [(10, PROSE), (11, "the dog and the cat sat on the mat")]
    got = _dsir(spark, raw, tgt, buckets=256)
    assert got[1]["dsir_logweight"] > got[2]["dsir_logweight"]
    assert got[3]["dsir_logweight"] > got[2]["dsir_logweight"]


def test_dsir_feature_count_is_unigrams_plus_bigrams(spark):
    # an n-token doc contributes n + (n-1) feature occurrences
    got = _dsir(spark, [(1, "a b c d"), (2, "solo")], [(9, PROSE)],
                buckets=64)
    assert got[1]["n_features"] == 7
    assert got[2]["n_features"] == 1


def test_dsir_smoothing_keeps_unseen_features_finite(spark):
    # raw-only vocabulary (zero target count) must not produce -inf
    import math
    got = _dsir(spark, [(1, JUNK)], [(9, PROSE)], buckets=64)
    assert math.isfinite(got[1]["dsir_logweight"])


def test_dsir_whitespace_docs_absent(spark):
    got = _dsir(spark, [(1, PROSE), (2, "   \n\t ")], [(9, PROSE)])
    assert sorted(got) == [1]


def test_dsir_empty_target_schema_stable_empty(spark):
    raw = spark.createDataFrame([(1, PROSE)], "doc_id long, text string")
    tgt = spark.createDataFrame([], "doc_id long, text string")
    out = textstats.dsir_importance_weights(raw, tgt)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_features", "dsir_logweight"]
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "bigint", "double"]


def test_dsir_ratio_join_is_broadcast(spark):
    raw = spark.createDataFrame([(i, PROSE) for i in range(20)],
                                "doc_id long, text string")
    tgt = raw.filter("doc_id % 2 = 0")
    plan = textstats.dsir_importance_weights(raw, tgt)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dsir_partition_invariance(spark):
    rows = [(i, (PROSE if i % 3 else JUNK) + f" tail{i}")
            for i in range(30)]
    tgt = [(100 + i, PROSE) for i in range(3)]
    a = _dsir(spark, rows, tgt, buckets=128)
    raw7 = spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(7)
    t7 = spark.createDataFrame(tgt, "doc_id long, text string") \
        .repartition(2)
    b = {r["doc_id"]: r.asDict()
         for r in textstats.dsir_importance_weights(
             raw7, t7, buckets=128).collect()}
    assert a == b


# ---- Gopher repetition battery (round 5, J51) -----------------------


def _rep(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.gopher_repetition(df).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_rep_known_values(spark):
    # "spam" x6: top 2-gram "spam spam" count 5 x 9 chars / 29 chars
    got = _rep(spark, [(1, "spam spam spam spam spam spam")])
    r = got[1]
    assert r["n_chars"] == 29
    assert r["top_2gram_char_frac"] == round(5 * 9 / 29, 6)
    assert r["dup_5gram_char_frac"] == round(2 * 24 / 29, 6)
    assert r["rep_pass"] is False


def test_rep_top_tie_breaks_to_lexicographically_smaller(spark):
    # both 2-grams occur twice; "a bb" (4 chars) < "bb a" (4)... use
    # grams with different lengths to make the choice visible:
    # "aa zz" and "zz aa" both occur twice in "aa zz aa zz aa";
    # tie on count 2 -> "aa zz" (the smaller) wins; chars 5*2=10 / 14
    got = _rep(spark, [(1, "aa zz aa zz aa")])
    assert got[1]["top_2gram_char_frac"] == round(2 * 5 / 14, 6)


def test_rep_dup_line_char_frac_counts_repeats_only(spark):
    text = "line one here\nline one here\nsolo line stays\nline one here"
    got = _rep(spark, [(1, text)])
    r = got[1]
    assert r["dup_line_frac"] == 0.5
    # (3-1) occurrences x 13 chars over 3*13 + 15 total line chars
    assert r["dup_line_char_frac"] == round(26 / 54, 6)


def test_rep_clean_doc_passes(spark):
    got = _rep(spark, [(1, "every word here is used exactly once today "
                           "so nothing repeats at all")])
    r = got[1]
    assert r["rep_pass"] is True
    assert all(r[k] <= thr for k, thr in
               textstats.GOPHER_REP_THRESHOLDS.items())


def test_rep_empty_and_whitespace_docs(spark):
    got = _rep(spark, [(1, ""), (2, "  \n\t ")])
    for r in got.values():
        assert r["n_chars"] == 0 and r["rep_pass"] is True
        assert all(v == 0.0 for k, v in r.items()
                   if k.endswith("_frac"))


def test_rep_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = textstats.gopher_repetition(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_rep_partition_invariance(spark):
    rows = [(i, ("tok%d " % (i % 7)) * (i % 9) + "tail words here.")
            for i in range(40)]
    a = sorted(map(tuple, textstats.gopher_repetition(
        spark.createDataFrame(rows, "doc_id long, text string")
        .repartition(1)).collect()))
    b = sorted(map(tuple, textstats.gopher_repetition(
        spark.createDataFrame(rows, "doc_id long, text string")
        .repartition(7)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# soft-error page flags (SURVEY J58)
# ---------------------------------------------------------------------------

def test_soft_error_flags_battery(spark):
    from mdscraper_spark.operators.textstats import soft_error_flags

    rows = [
        (0, "Error 404 - Page Not Found on this server"),
        (1, "Please enable JavaScript to view this site"),
        (2, "Sign in to continue reading this story"),
        (3, "Subscribe to continue reading premium content"),
        (4, "this domain has been registered by a customer"),
        (5, "ordinary page about cooking pasta"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.not_found, r.js_required, r.login_wall,
                      r.paywall, r.domain_parked, r.soft_error)
           for r in soft_error_flags(df).collect()}
    assert got[0] == (True, False, False, False, False, True)
    assert got[1] == (False, True, False, False, False, True)
    assert got[2] == (False, False, True, False, False, True)
    assert got[3] == (False, False, False, True, False, True)
    assert got[4] == (False, False, False, False, True, True)
    assert got[5] == (False, False, False, False, False, False)
    assert got[6] == (False, False, False, False, False, False)


def test_soft_error_flags_head_bound(spark):
    """A marker past the head_chars bound must NOT flag — the scan is
    deliberately bounded to the page head."""
    from mdscraper_spark.operators.textstats import soft_error_flags

    far = "x " * 1200 + "page not found"     # beyond 2000 chars
    near = "page not found " + "x " * 1200
    df = spark.createDataFrame([(0, far), (1, near)],
                               "doc_id long, text string")
    got = {r.doc_id: r.soft_error for r in soft_error_flags(df).collect()}
    assert got == {0: False, 1: True}


def test_soft_error_flags_shuffle_free(spark):
    import contextlib
    import io

    from mdscraper_spark.operators.textstats import soft_error_flags

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        soft_error_flags(df).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Join" not in plan
