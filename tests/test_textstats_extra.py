"""Repetition filters, deterministic split, and benchmark
decontamination — hand-computed expectations on crafted corpora."""

from pyspark.sql import functions as F

from mdscraper_spark.operators import textstats


def _one(spark, text, col):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return df.select(col(F.col("text")).alias("v")).first().v


def test_dup_line_frac(spark):
    assert _one(spark, "a\nb\nc", textstats.dup_line_frac) == 0.0
    assert _one(spark, "x\ny\nx\nx", textstats.dup_line_frac) == 0.5
    assert _one(spark, "x\n\n  \nx", textstats.dup_line_frac) == 0.5
    assert _one(spark, "only one line", textstats.dup_line_frac) == 0.0


def test_top_bigram_frac(spark):
    # "a b a b a" -> bigrams: ab, ba, ab, ba -> top 2/4
    assert _one(spark, "a b a b a", textstats.top_bigram_frac) == 0.5
    # all-distinct bigrams -> 1/3
    assert _one(spark, "w x y z", textstats.top_bigram_frac) == round(1 / 3, 6)
    # chant: one bigram dominates
    assert _one(spark, "buy now " * 10, textstats.top_bigram_frac) >= 0.5
    assert _one(spark, "single", textstats.top_bigram_frac) == 0.0


def test_hash_split_deterministic_and_balanced(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    out = df.select("doc_id",
                    textstats.hash_split(F.col("doc_id")).alias("split"))
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.80) < 0.04
    assert abs(counts["val"] / 2000 - 0.10) < 0.03
    assert abs(counts["test"] / 2000 - 0.10) < 0.03
    again = out.collect()
    assert {(r.doc_id, r.split) for r in again} == \
        {(r.doc_id, r.split) for r in out.collect()}
    # a different salt reshuffles assignments
    other = df.select(textstats.hash_split(F.col("doc_id"),
                                           salt="v2").alias("split"))
    assert [r.split for r in other.collect()] != [r.split for r in again]


def test_contamination_known_overlap(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, bench_text),                                   # the benchmark doc
        (1, bench_text + " iota kappa"),                   # heavy overlap
        (2, "one two three four five six seven eight"),    # disjoint
        (3, "alpha beta gamma delta epsilon " +            # partial
            "unrelated tail words here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.filter(F.col("doc_id") == 0)
    out = {r.doc_id: r for r in
           textstats.contamination(docs, bench, k=5).collect()}
    assert out[0].contaminated                 # benchmark doc: full overlap
    assert out[0].n_hit == out[0].n_grams
    assert out[1].contaminated and out[1].n_hit == 4   # the 4 bench 5-grams
    assert out[2].n_hit == 0 and not out[2].contaminated
    assert out[3].n_hit == 1 and not out[3].contaminated  # 1 of 6 grams


def test_contamination_benchmark_side_broadcasts(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4} w{i+5}") for i in range(50)],
        "doc_id long, text string")
    plan = textstats.contamination(docs, docs.filter(F.col("doc_id") < 2)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def _py_dup_line_frac(text):
    lines = [l for l in text.split("\n") if l.strip()]
    if len(lines) <= 1:
        return 0.0
    return round((len(lines) - len(set(lines))) / len(lines), 6)


def _py_top_bigram_frac(text):
    toks = text.strip().split()
    if len(toks) < 2:
        return 0.0
    bigrams = [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
    top = max(bigrams.count(b) for b in set(bigrams))
    return round(top / len(bigrams), 6)


def test_repetition_stats_differential_fuzz(spark):
    """Seeded-random differential: 200 adversarial texts (repeats,
    whitespace runs, empties) in ONE Spark job vs the pure-Python
    replay — the distributed column folds must agree exactly."""
    import random

    rng = random.Random("textstats-fuzz-1")
    words = ["a", "bb", "ccc", "x", "buy", "now", "the", "of"]
    texts = []
    for i in range(200):
        n = rng.randrange(0, 30)
        toks = [rng.choice(words) for _ in range(n)]
        t = " ".join(toks)
        if rng.random() < 0.5:         # inject newlines / blank lines
            t = t.replace(" ", "\n", rng.randrange(0, 4))
        if rng.random() < 0.2:
            t = t + "\n" + t           # duplicated block
        if rng.random() < 0.1:
            t = "   "                  # whitespace-only
        texts.append((i, t))

    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: (r.d, r.b) for r in df.select(
        "doc_id",
        textstats.dup_line_frac(F.col("text")).alias("d"),
        textstats.top_bigram_frac(F.col("text")).alias("b")).collect()}
    for i, t in texts:
        assert got[i] == (_py_dup_line_frac(t), _py_top_bigram_frac(t)), \
            (i, repr(t), got[i])


def test_pii_scrub_hand_cases(spark):
    rows = [
        (0, "reach me at jane.doe+spam@sub.example.co.uk or 192.168.1.250 ok"),
        (1, "no pii here at all"),
        (2, "two mails a@b.io c.d@e-f.org one ip 8.8.8.8"),
        (3, ""),
        (4, "not an ip 1234.5.6.7 and not an email foo@bar"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in textstats.pii_scrub(df).collect()}
    assert (got[0].n_emails, got[0].n_ips) == (1, 1)
    assert got[0].clean_text == "reach me at <EMAIL> or <IP> ok"
    assert (got[1].n_emails, got[1].n_ips) == (0, 0)
    assert got[1].clean_text == "no pii here at all"
    assert (got[2].n_emails, got[2].n_ips) == (2, 1)
    assert got[2].clean_text == "two mails <EMAIL> <EMAIL> one ip <IP>"
    assert got[3].clean_text == "" and got[3].n_emails == 0
    # 1234.5.6.7: \b\d{1,3} can't start inside the digit run from its
    # left edge, so no IP match; foo@bar has no dotted TLD, no email
    assert (got[4].n_emails, got[4].n_ips) == (0, 0)


def test_dedup_lines_hand_cases(spark):
    rows = [
        (0, "a\nb\na\nc\nb\na"),
        (1, "single"),
        (2, ""),
        (3, "x\n\ny\n\nx"),       # duplicate empty lines removed too
        (4, "same\nsame\nsame"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in textstats.dedup_lines(df).collect()}
    assert got[0].clean_text == "a\nb\nc" and got[0].n_dup_lines == 3
    assert got[1].clean_text == "single" and got[1].n_dup_lines == 0
    assert got[2].clean_text == "" and got[2].n_dup_lines == 0
    assert got[3].clean_text == "x\n\ny" and got[3].n_dup_lines == 2
    assert got[4].clean_text == "same" and got[4].n_dup_lines == 2


def test_dedup_lines_partition_invariant(spark):
    rows = [(i, "\n".join(["head", f"body {i % 7}", "head", f"tail {i}"]))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    one = sorted(map(tuple, textstats.dedup_lines(df.coalesce(1)).collect()))
    many = sorted(map(tuple, textstats.dedup_lines(df.repartition(13)).collect()))
    assert one == many
    assert all(r[2] == 1 for r in one)  # exactly the repeated "head"


def test_domain_quota_sample_paths_and_cap(spark):
    import hashlib
    rows = ([(i, "big") for i in range(40)]          # over cap
            + [(100 + i, "small") for i in range(3)]  # under cap
            + [(200 + i, None) for i in range(7)])    # null domain, over cap
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = textstats.domain_quota_sample(df, cap=5).collect()
    assert len(got) == len(rows)
    by_dom = {}
    for r in got:
        by_dom.setdefault(r.domain, []).append(r)
    assert sum(r.keep for r in by_dom["big"]) == 5
    assert all(r.keep for r in by_dom["small"]) and len(by_dom["small"]) == 3
    # null domains form ONE group to the count, so the cap applies
    assert sum(r.keep for r in by_dom[None]) == 5
    # survivors are exactly the 5 smallest md5 priorities
    expect = sorted((hashlib.md5(f"{i}:quota-v1".encode()).hexdigest(), i)
                    for i in range(40))[:5]
    assert {r.doc_id for r in by_dom["big"] if r.keep} == {i for _, i in expect}


def test_domain_quota_sample_partition_invariant(spark):
    rows = [(i, f"d{i % 4}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    one = sorted(map(tuple, textstats.domain_quota_sample(
        df.coalesce(1), cap=10).collect()))
    many = sorted(map(tuple, textstats.domain_quota_sample(
        df.repartition(17), cap=10).collect()))
    assert one == many
    assert sum(r[2] for r in one) == 40  # 4 domains x cap 10


def test_domain_quota_sample_rejects_bad_cap(spark):
    import pytest
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        textstats.domain_quota_sample(df, cap=0)


def test_pii_scrub_phone_and_cc_boundaries(spark):
    rows = [
        # phones: parens+space, dots, dashes, +1 prefix
        (0, "call (415) 555-0042 or 415.555.0099 or +1 212-555-1234 now"),
        # separators REQUIRED: a bare 10-digit run is an id, not a phone
        (1, "order id 4155550042 is not a phone"),
        # IPv4 stays an IP, not a phone fragment
        (2, "host 192.168.1.250 up"),
        # Luhn-valid card in all three shapes: spaced, dashed, bare
        (3, "pay 4532 0151 1283 0366 / 4532-0151-1283-0366 / "
            "4532015112830366"),
        # card-SHAPED but Luhn-invalid: redacted, not counted
        (4, "ref 1234-5678-9012-3456 logged"),
        # 20-digit run: no \b-bounded 16-digit window exists inside
        (5, "hash 45320151128303661234 raw"),
        # phone inside a sentence ending in the number (trailing \b)
        (6, "text me at 650-555-0001."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in textstats.pii_scrub(df).collect()}
    assert got[0].n_phones == 3
    assert got[0].clean_text == "call <PHONE> or <PHONE> or <PHONE> now"
    assert got[1].n_phones == 0 and got[1].n_ccs == 0
    assert got[2].n_phones == 0 and got[2].n_ips == 1
    assert got[3].n_ccs == 3
    assert got[3].clean_text == "pay <CC> / <CC> / <CC>"
    assert got[4].n_ccs == 0                      # fails the checksum
    assert got[4].clean_text == "ref <CC> logged"  # still redacted
    assert got[5].n_ccs == 0 and "<CC>" not in got[5].clean_text
    assert got[6].n_phones == 1
    assert got[6].clean_text == "text me at <PHONE>."


def test_luhn_valid_expression(spark):
    cases = [
        ("4532015112830366", True),   # textbook valid Visa test number
        ("4532015112830367", False),
        ("4532 0151 1283 0366", True),   # separators are stripped
        ("79927398713", True),           # classic Luhn example
        ("79927398714", False),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = dict(df.select("s", textstats.luhn_valid(F.col("s"))
                         .alias("ok")).collect())
    for s, expect in cases:
        assert got[s] is expect, s


def test_unigram_logprob_known_corpus(spark):
    """4-doc corpus with hand-computable counts: 'the'x4, 'cat'x2,
    'sat'x2, hapaxes 'zzyq'/'qqzy' floored at 1/total.  Empty and
    whitespace-only docs are filtered out entirely."""
    import math

    rows = [(0, "the cat sat"), (1, "the cat"), (2, "the sat the zzyq"),
            (3, "qqzy"), (4, ""), (5, "   \n ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           textstats.unigram_logprob(df, min_count=2).collect()}
    assert set(got) == {0, 1, 2, 3}
    total = 10.0                      # 4+2+2+1+1 token instances
    lp = lambda c: math.log(c / total)
    assert got[0].n_tokens == 3
    assert got[0].avg_logprob == round((lp(4) + lp(2) + lp(2)) / 3, 6)
    assert got[3].n_tokens == 1
    assert got[3].avg_logprob == round(lp(1), 6)   # hapax floor
    assert got[2].avg_logprob == round(
        (lp(4) + lp(2) + lp(4) + lp(1)) / 4, 6)
    # common-word prose outranks the hapax doc — the curation signal
    assert got[0].avg_logprob > got[3].avg_logprob


def test_tfidf_topk_known_corpus(spark):
    """3-doc corpus: 'apple' is unique to doc 0 (idf ln(3)), 'banana'
    in two docs (ln 1.5), 'the' everywhere (idf 0 — never a keyword
    head), sub-3-char and numeric tokens excluded as candidates."""
    import math

    rows = [(0, "the apple apple banana ok 42"),
            (1, "the banana pear"),
            (2, "the pear pear plum")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.tfidf_topk(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for docid in by_doc:
        by_doc[docid].sort(key=lambda r: r.rk)
    d0 = by_doc[0]
    assert [r.token for r in d0] == ["apple", "banana"]
    assert d0[0].score == round(2 * math.log(3.0), 6)
    assert d0[1].score == round(1 * math.log(1.5), 6)
    # 'ok' (2 chars) and '42' (numeric) were never candidates
    assert all(r.token not in ("ok", "42", "the")
               for rs in by_doc.values() for r in rs)
    # doc 2: the unique 'plum' (ln 3 ~= 1.10) outranks the repeated
    # but shared 'pear' (2 * ln 1.5 ~= 0.81)
    d2 = by_doc[2]
    assert [r.token for r in d2] == ["plum", "pear"]
    assert d2[0].score == round(math.log(3.0), 6)
    assert d2[1].score == round(2 * math.log(1.5), 6)


def test_weighted_sample_topk_deterministic_and_weighted(spark):
    """Keys replayed exactly in pure Python (same md5 coin), the head
    matches the hand-ranked order, heavy docs dominate the sample, and
    a different salt redraws it."""
    import hashlib
    import math

    rows = [(i, 10_000 if i < 10 else 10) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")

    def key(i, w, salt="wsample-v1"):
        h = hashlib.md5(f"{i}:{salt}".encode()).hexdigest()
        u = (int(h[:15], 16) + 1) / float(1 << 60)
        return round(math.log(u) / max(float(w), 1.0), 9)

    expect = sorted(((key(i, w), -i) for i, w in rows), reverse=True)[:20]
    got = textstats.weighted_sample_topk(
        df, k=20, weight_col="n_chars").collect()
    assert [(r.key, -r.doc_id) for r in got] == expect
    # 10 heavy docs out of 200 (5% of rows, ~98% of mass) must crowd
    # the head of a weight-proportional sample
    n_heavy = sum(1 for r in got if r.doc_id < 10)
    assert n_heavy >= 8
    redrawn = textstats.weighted_sample_topk(
        df, k=20, weight_col="n_chars", salt="other-salt").collect()
    assert {r.doc_id for r in redrawn} != {r.doc_id for r in got}


def test_mixture_schedule_rates_and_determinism(spark):
    """Two sources with weights 3 and 1: streaming in mix_key order
    must hold a ~3:1 prefix ratio; ranks are a permutation per source;
    the whole schedule is partition-invariant."""
    rows = [(i, "heavy" if i < 300 else "light") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weight = F.when(F.col("source") == "heavy", F.lit(3.0)) \
              .otherwise(F.lit(1.0))
    out = textstats.mixture_schedule(df, weight).collect()
    assert len(out) == 400
    ranks = {}
    for r in out:
        ranks.setdefault(r.source, []).append(r.src_rank)
    assert sorted(ranks["heavy"]) == list(range(1, 301))
    assert sorted(ranks["light"]) == list(range(1, 101))
    stream = sorted(out, key=lambda r: (r.mix_key, r.source, r.doc_id))
    head = stream[:80]
    n_heavy = sum(1 for r in head if r.source == "heavy")
    # 3:1 interleave -> 60 of the first 80, exact up to boundary ties
    assert 55 <= n_heavy <= 65
    again = textstats.mixture_schedule(
        df.repartition(7), weight).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_source_health_rollup_hand_corpus(spark):
    """feedA: 3 docs, one exact pair -> dup_rate 1/3; feedB: 2 distinct
    docs -> 0; the means reuse the registry's own per-doc columns."""
    rows = [(0, "the cat sat on the mat today", "feedA"),
            (1, "the cat sat on the mat today", "feedA"),
            (2, "completely different text body", "feedA"),
            (3, "one feed b doc", "feedB"),
            (4, "another feed b doc", "feedB")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in
           textstats.source_health_rollup(df).collect()}
    a, b = got["feedA"], got["feedB"]
    assert (a.n_docs, a.n_dup_docs, a.dup_rate) == (3, 1, round(1 / 3, 6))
    assert (b.n_docs, b.n_dup_docs, b.dup_rate) == (2, 0, 0.0)
    per_doc = {r.doc_id: (r.q, r.t) for r in df.select(
        "doc_id",
        textstats.quality_score(F.col("text")).alias("q"),
        textstats.token_count_ws(F.col("text")).alias("t")).collect()}
    exp_q = round(sum(per_doc[i][0] for i in (0, 1, 2)) / 3, 6)
    exp_t = round(sum(per_doc[i][1] for i in (0, 1, 2)) / 3, 6)
    assert abs(a.mean_quality - exp_q) < 1e-9
    assert a.mean_tokens == exp_t


def test_unigram_and_tfidf_differential_fuzz(spark):
    """Seeded-random corpus (Zipf-ish vocab, whitespace noise, empties)
    vs exact pure-Python replays of both scoring formulas — the
    distributed groupBy/join/window plans must reproduce the scalar
    math bit-for-bit at the rounding points."""
    import math
    import random

    rng = random.Random("textfuzz-r5")
    # the alphabetic >=3-char words are ESSENTIAL: they are the only
    # tokens passing tfidf_topk's ^[A-Za-z]{3,}$ candidate filter —
    # without them the tf-idf half of this fuzz compares {} == {}
    vocab = ([f"w{i}" for i in range(30)] + ["ok", "no", "x7", "!"]
             + ["alpha", "beta", "gamma", "delta", "epsilon",
                "zeta", "theta", "kappa", "sigma", "omega"])
    docs = []
    for i in range(60):
        n = rng.randrange(0, 25)
        toks = [vocab[min(rng.randrange(1, len(vocab)),
                          rng.randrange(1, len(vocab)))]
                for _ in range(n)]
        t = " ".join(toks)
        if rng.random() < 0.15:
            t = "  " + t + "\n"
        if rng.random() < 0.08:
            t = " "
        docs.append((i, t))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    toks = {i: t.split() for i, t in docs if t.strip()}
    counts = {}
    for ts in toks.values():
        for w in ts:
            counts[w] = counts.get(w, 0) + 1
    total = float(sum(counts.values()))

    got = {r.doc_id: (r.n_tokens, r.avg_logprob) for r in
           textstats.unigram_logprob(df, min_count=2).collect()}
    assert set(got) == set(toks)
    for i, ts in toks.items():
        lps = [math.log((counts[w] if counts[w] >= 2 else 1) / total)
               for w in ts]
        assert got[i] == (len(ts), round(sum(lps) / len(lps), 6)), i

    n_docs = float(len(toks))
    tf = {i: {} for i in toks}
    for i, ts in toks.items():
        for w in ts:
            if len(w) >= 3 and w.isalpha():
                tf[i][w] = tf[i].get(w, 0) + 1
    dfreq = {}
    for i in tf:
        for w in tf[i]:
            dfreq[w] = dfreq.get(w, 0) + 1
    expect = {}
    for i in tf:
        scored = sorted(
            ((round(c * math.log(n_docs / dfreq[w]), 6), w)
             for w, c in tf[i].items()),
            key=lambda sw: (-sw[0], sw[1]))[:5]
        expect[i] = [(w, s, rk + 1) for rk, (s, w) in enumerate(scored)]
    got_k = {}
    for r in textstats.tfidf_topk(df, k=5).collect():
        got_k.setdefault(r.doc_id, []).append((r.token, r.score, r.rk))
    for i in got_k:
        got_k[i].sort(key=lambda x: x[2])
    assert got_k == {i: v for i, v in expect.items() if v}, \
        {i: (got_k.get(i), expect.get(i))
         for i in set(got_k) | set(expect)
         if got_k.get(i) != (expect.get(i) or None)}


# ---------------------------------------------------------------------------
# lexical diversity (SURVEY J55)
# ---------------------------------------------------------------------------

def test_lexical_stats_known_values(spark):
    import math

    from mdscraper_spark.operators.textstats import lexical_stats

    df = spark.createDataFrame(
        [(0, "the cat sat on the mat"),
         (1, "spam spam spam spam"),
         (2, "abab"),
         (3, ""),
         (4, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in lexical_stats(df).collect()}
    # doc 0: 6 tokens, 5 types ("the" twice), 4 hapax
    assert (got[0].n_tokens, got[0].n_types) == (6, 5)
    assert got[0].ttr == round(5 / 6, 6)
    assert got[0].hapax_frac == round(4 / 5, 6)
    # doc 1: one type repeated -> ttr 0.25, zero hapax
    assert (got[1].n_types, got[1].ttr, got[1].hapax_frac) == (1, 0.25, 0.0)
    # doc 2: 2 a's + 2 b's -> exactly 1 bit/char
    assert got[2].letter_entropy == 1.0
    # empty & NULL: the [""] single-token convention, zero entropy
    for d in (3, 4):
        assert (got[d].n_tokens, got[d].n_types,
                got[d].letter_entropy) == (1, 1, 0.0)
        assert got[d].ttr == 1.0 and got[d].hapax_frac == 1.0


def test_lexical_stats_python_replay_fuzz(spark):
    import math
    import random
    from collections import Counter

    from mdscraper_spark.operators.textstats import lexical_stats

    rng = random.Random("lex-fuzz-r5")
    vocab = ["cat", "dog", "Zq9", "a", "??", "the", "ab1c"]
    rows = [(i, " ".join(vocab[rng.randrange(len(vocab))]
                         for _ in range(rng.randrange(0, 15))))
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in lexical_stats(df).collect()}
    for i, text in rows:
        toks = text.split(" ")   # "" -> [""], the tokenize convention
        c = Counter(toks)
        types, hapax = len(c), sum(1 for v in c.values() if v == 1)
        assert got[i].n_tokens == len(toks)
        assert got[i].n_types == types
        assert got[i].ttr == round(types / len(toks), 6)
        assert got[i].hapax_frac == round(hapax / types, 6)
        letters = [ch for ch in text.lower() if "a" <= ch <= "z"]
        if letters:
            n = len(letters)
            lc = Counter(letters)
            ent = math.log2(n) - sum(
                v * math.log2(v) for _k, v in sorted(lc.items())) / n
            assert abs(got[i].letter_entropy - ent) < 1e-5
        else:
            assert got[i].letter_entropy == 0.0
