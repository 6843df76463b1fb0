"""Winnowing fingerprints (round 5, J46) — MOSS local fingerprinting.

The Spark operator and the DuckDB twin are each validated against an
INDEPENDENT pure-Python winnowing implementation (min-of-window,
rightmost tie, distinct set, sorted digest), plus the algorithm's
defining guarantee: documents sharing a canonical substring of at
least k+w-1 characters share at least one fingerprint hash.
Engine-vs-oracle parity also rides the registry row
(tests/test_queries_oracle.py SUBSET + tools/check_oracle.py).
"""

import hashlib
import re

import duckdb
import pytest

from mdscraper_spark.operators.dedup import (
    sql_winnowing_fingerprints,
    winnowing_fingerprints,
)

K, W = 8, 4


def _canon(s: str) -> str:
    s = re.sub(r"[^a-z0-9\s]", " ", s.lower())
    return re.sub(r"^\s+|\s+$", "", re.sub(r"\s+", " ", s))


def _py_winnow(text: str, k: int = K, w: int = W):
    """Independent reference: returns (n_grams, fp_set, digest)."""
    c = _canon(text)
    m = max(len(c) - k + 1, 0)
    hs = [int(hashlib.md5(c[i:i + k].encode()).hexdigest()[:15], 16)
          for i in range(m)]
    if m == 0:
        n_win, length = 0, 0
    elif m < w:
        n_win, length = 1, m
    else:
        n_win, length = m - w + 1, w
    fps = []
    for j in range(1, n_win + 1):
        sl = hs[j - 1:j - 1 + length]
        minh = min(sl)
        ridx = max(i for i, v in enumerate(sl) if v == minh)
        fps.append(f"{minh}:{j + ridx}")
    fps = sorted(set(fps))
    return m, fps, hashlib.md5(",".join(fps).encode()).hexdigest()


CASES = [
    (1, "The quick brown fox jumps over the lazy dog!"),
    (2, "short"),                      # fewer grams than the window
    (3, ""),                           # no grams at all
    (4, "   \n\t "),                   # canonicalizes to empty
    (5, "exactly8"),                   # exactly one gram
    (6, "aaaaaaaaaaaaaaaaaaaa"),       # all hashes equal: tie rule
    (7, "Numbers 12345, punctuation!!! collapse; here."),
    (8, "a much longer document with many words " * 8),
]


def test_spark_matches_pure_python_reference(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {r["doc_id"]: r for r in winnowing_fingerprints(df).collect()}
    for doc_id, text in CASES:
        m, fps, digest = _py_winnow(text)
        r = got[doc_id]
        assert r["n_grams"] == m, doc_id
        assert r["n_fingerprints"] == len(fps), doc_id
        assert r["fp_digest"] == digest, doc_id


def test_duckdb_twin_matches_pure_python_reference():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in CASES)
        + ") t(doc_id, text)")
    got = {r[0]: r for r in
           con.execute(sql_winnowing_fingerprints("docs")).fetchall()}
    for doc_id, text in CASES:
        m, fps, digest = _py_winnow(text)
        assert got[doc_id][1] == m
        assert got[doc_id][2] == len(fps)
        assert got[doc_id][3] == digest


def test_winnowing_guarantee_shared_substring_shares_fingerprint():
    """Any shared canonical substring of >= k+w-1 chars must yield a
    shared fingerprint HASH (positions may differ) — the paper's
    theorem 1, checked across several embeddings of one phrase."""
    shared = "identical stretch of copied text here"  # >> k+w-1 chars
    docs = [f"prefix one {shared} suffix alpha",
            f"{shared} immediately at the start",
            f"totally different lead-in before {shared}"]

    def hashes(text):
        _m, fps, _d = _py_winnow(text)
        return {fp.split(":")[0] for fp in fps}

    sets = [hashes(d) for d in docs]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            assert sets[i] & sets[j], (i, j)


def test_disjoint_texts_share_nothing():
    a = {fp.split(":")[0] for fp in _py_winnow(
        "alpha beta gamma delta epsilon zeta eta theta")[1]}
    b = {fp.split(":")[0] for fp in _py_winnow(
        "one two three four five six seven eight nine")[1]}
    assert not (a & b)


def test_winnowing_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "some text")],
                               "doc_id long, text string")
    plan = winnowing_fingerprints(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_shared_pairs_finds_the_copied_passage(spark):
    """Docs embedding the same long passage pair up; the unrelated doc
    pairs with nobody; n_shared counts DISTINCT hashes (a hash
    repeated inside one doc cannot inflate the intersection)."""
    shared = ("a rather long copied passage that winnowing must catch "
              "wherever it is pasted in the document body")
    rows = [(1, f"intro text {shared} closing remarks"),
            (2, f"{shared} with a different tail entirely"),
            (3, "completely unrelated content about orbital mechanics "
                "and the restricted three body problem")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from mdscraper_spark.operators.dedup import winnowing_shared_pairs
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"]
           for r in winnowing_shared_pairs(
               df, min_shared=2, max_posting=16).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert not any(3 in p for p in got)


def test_shared_pairs_matches_duckdb_twin(spark):
    from mdscraper_spark.operators.dedup import (
        sql_winnowing_shared_pairs,
        winnowing_shared_pairs,
    )
    shared = "the quick brown fox jumps over the lazy dog again today"
    rows = [(i, f"doc {i} prefix {shared} doc {i} suffix words")
            for i in range(6)] + [(9, "nothing in common here at all")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in winnowing_shared_pairs(
        df, min_shared=2, max_posting=4).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE docs AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, '{t}')" for i, t in rows)
                + ") t(doc_id, text)")
    exp = sorted(tuple(r) for r in con.execute(
        sql_winnowing_shared_pairs("docs", min_shared=2,
                                   max_posting=4)).fetchall())
    assert got == exp
    # the cap bites: 6 docs share the passage but its hashes sit on
    # 6-doc postings > cap=4, so only hashes from the per-doc unique
    # context can pair — and those are singletons, so nothing pairs
    assert got == []


def test_shared_pairs_cap_admits_small_groups(spark):
    from mdscraper_spark.operators.dedup import winnowing_shared_pairs
    shared = "the quick brown fox jumps over the lazy dog again today"
    rows = [(i, f"doc {i} prefix {shared} doc {i} suffix words")
            for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = winnowing_shared_pairs(df, min_shared=2, max_posting=4).collect()
    # 3-doc postings fit under cap=4: all three pairs must surface
    assert sorted((r["doc_a"], r["doc_b"]) for r in got) == \
        [(0, 1), (0, 2), (1, 2)]


def test_density_bound():
    """Expected selection density is 2/(w+1); assert the loose upper
    bound fingerprints <= windows and a sane lower bound for a long
    non-repetitive doc."""
    text = " ".join(f"tok{i}ena" for i in range(200))
    m, fps, _ = _py_winnow(text)
    n_win = m - W + 1
    assert len(fps) <= n_win
    assert len(fps) >= n_win // (2 * W)
