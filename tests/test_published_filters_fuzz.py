"""Differential fuzz for the round-5 published-method trio (C4 line
cleaning, DSIR importance weights, SemDeDup): seeded random corpora vs
exact pure-Python replays of the published math — the J-family
convention that the distributed plan must reproduce the scalar
computation bit-for-bit at the rounding points."""

import hashlib
import math
import random
import re

from mdscraper_spark.operators.similarity import semdedup
from mdscraper_spark.operators.textstats import (C4_POLICY_PHRASES,
                                                 C4_TERMINAL,
                                                 c4_line_filter,
                                                 dsir_importance_weights)

# ---- C4 --------------------------------------------------------------


def _c4_replay(doc_id, text, min_words=5, min_kept=3):
    lines = [re.sub(r"^\s+|\s+$", "", ln) for ln in text.split("\n")]
    lines = [ln for ln in lines if ln]

    def keep(ln):
        low = ln.lower()
        return (ln.endswith(C4_TERMINAL)
                and len(re.split(r"\s+", ln)) >= min_words
                and "javascript" not in low
                and not any(p in low for p in C4_POLICY_PHRASES))

    kept = [ln for ln in lines if keep(ln)]
    lorem = "lorem ipsum" in text.lower()
    brace = "{" in text
    return {"doc_id": doc_id, "n_lines": len(lines),
            "n_kept_lines": len(kept), "has_lorem_ipsum": lorem,
            "has_curly_brace": brace, "cleaned_text": "\n".join(kept),
            "c4_keep": (not lorem and not brace and len(kept) >= min_kept)}


def test_c4_differential_fuzz(spark):
    rng = random.Random("c4-fuzz-r5")
    frag = ["the quick brown fox jumps", "please enable javascript now",
            "we updated our privacy policy", "short bit", "use cookies",
            "Lorem Ipsum dolor", "function f() {", "a b c d e f g",
            "read the terms of use today", "one two three four five six"]
    tails = [".", "!", "?", '"', ":", ";", "", " "]
    docs = []
    for did in range(120):
        n = rng.randrange(0, 9)
        lines = [frag[rng.randrange(len(frag))]
                 + tails[rng.randrange(len(tails))] for _ in range(n)]
        if rng.random() < 0.3:
            lines.append("   ")                  # whitespace-only line
        docs.append((did, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in c4_line_filter(df).collect()}
    for did, text in docs:
        assert got[did] == _c4_replay(did, text), (did, text)


# ---- DSIR ------------------------------------------------------------


def _grams(text):
    t = re.sub(r"^\s+|\s+$", "", text)
    if not t:
        return None
    toks = re.split(r"\s+", t)
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(g, buckets):
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % buckets


def test_dsir_differential_fuzz(spark):
    rng = random.Random("dsir-fuzz-r5")
    vocab = [f"w{i}" for i in range(25)] + ["the", "of", "and"]
    buckets = 128
    raw = [(did, " ".join(vocab[rng.randrange(len(vocab))]
                          for _ in range(rng.randrange(0, 20))))
           for did in range(80)]
    tgt = [(1000 + i, " ".join(vocab[rng.randrange(5)]
                               for _ in range(rng.randrange(1, 15))))
           for i in range(10)]

    rc, tc = {}, {}
    for _d, text in raw:
        for g in (_grams(text) or []):
            b = _bucket(g, buckets)
            rc[b] = rc.get(b, 0) + 1
    for _d, text in tgt:
        for g in (_grams(text) or []):
            b = _bucket(g, buckets)
            tc[b] = tc.get(b, 0) + 1
    rtot, ttot = sum(rc.values()), sum(tc.values())
    expect = {}
    for did, text in raw:
        gs = _grams(text)
        if gs is None:
            continue
        s = 0.0
        for g in gs:
            b = _bucket(g, buckets)
            s += (math.log((tc.get(b, 0) + 1) / (ttot + buckets))
                  - math.log((rc.get(b, 0) + 1) / (rtot + buckets)))
        expect[did] = (len(gs), round(s, 6))

    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(tgt, "doc_id long, text string")
    out = dsir_importance_weights(rdf, tdf, buckets=buckets)
    got = {r["doc_id"]: (r["n_features"], r["dsir_logweight"])
           for r in out.collect()}
    assert got == expect


# ---- SemDeDup --------------------------------------------------------


def _cos(a, b):
    d = 0.0
    for x, y in zip(a, b):
        d += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    return d / (math.sqrt(na) * math.sqrt(nb))


def test_semdedup_differential_fuzz(spark):
    rng = random.Random("semdedup-fuzz-r5")
    dim, k, tau = 6, 4, 0.9
    rows = []
    for vid in range(70):
        if vid >= 10 and rng.random() < 0.3:
            src = rows[rng.randrange(len(rows))][1]
            if rng.random() < 0.5:
                vec = list(src)                        # exact dup
            else:
                vec = [v * 1.001 + 0.0003 for v in src]  # near dup
        else:
            vec = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((vid, vec))

    cents = rows[:k]
    cells, csim = {}, {}
    for vid, vec in rows:
        best = max(((_cos(vec, cv), -cid) for cid, cv in cents))
        cells[vid] = -best[1]
        csim[vid] = round(best[0], 6)
    expect = {}
    for vid, vec in rows:
        elims = [y for y, yv in rows
                 if cells[y] == cells[vid]
                 and ((csim[y], y) < (csim[vid], vid))
                 and round(_cos(vec, yv), 6) >= tau]
        dup = min(elims) if elims else None
        expect[vid] = (cells[vid], csim[vid], dup, dup is not None)

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: (r["cid"], r["centroid_sim"], r["dup_of"],
                         r["semdedup_drop"])
           for r in semdedup(df, n_cells=k, threshold=tau).collect()}
    assert got == expect


# ---- Gopher repetition battery ----------------------------------------


def test_gopher_repetition_cross_engine_fuzz(spark):
    """Random token streams with planted phrase repeats and duplicate
    lines, Spark's per-row sorted folds vs DuckDB's relational modes —
    two entirely different plans that must agree bit-for-bit at the
    rounding points."""
    import duckdb

    from mdscraper_spark.operators.textstats import (gopher_repetition,
                                                     sql_gopher_repetition)

    rng = random.Random("gopher-rep-fuzz-r5")
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for did in range(100):
        toks = [vocab[rng.randrange(len(vocab))]
                for _ in range(rng.randrange(0, 40))]
        if rng.random() < 0.5:                    # planted phrase repeat
            phrase = ["spam", "alpha", "beta", "gamma", "delta"]
            for _ in range(rng.randrange(1, 4)):
                pos = rng.randrange(0, len(toks) + 1)
                toks[pos:pos] = phrase
        lines = [" ".join(toks)] if toks else []
        if rng.random() < 0.4:                    # planted dup lines
            lines += ["a repeated closing line"] * rng.randrange(1, 4)
        docs.append((did, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(map(tuple, gopher_repetition(df).collect()))

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?,?)", docs)
    want = sorted(map(tuple, con.sql(sql_gopher_repetition("docs"))
                      .fetchall()))
    assert got == want
