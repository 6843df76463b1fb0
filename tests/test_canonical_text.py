"""Dedup-grade text canonicalization (SURVEY J34)."""

import duckdb

from pyspark.sql import functions as F

from mdscraper_spark.operators import dedup

CASES = [
    ("Hello,  World!", "hello world"),
    ("  MIXED-case\tand\nlines  ", "mixed case and lines"),
    ("digits 123 stay; punct.goes", "digits 123 stay punct goes"),
    ("", ""),
    ("!!!", ""),
    ("a--b__c", "a b c"),
    ("tabs\t\tand   runs", "tabs and runs"),
]


def test_canonical_text_hand_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, t string")
    got = {r.i: r.c for r in df.select(
        "i", dedup.canonical_text(F.col("t")).alias("c")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_canonical_text_sql_twin_parity(spark):
    extra = [raw for raw, _ in CASES] + [
        "Ünïcode Çase",            # non-ascii letters: punct-classed
        "line1\nline2\r\nline3",
        "semi;colon:and(parens)",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(extra)], "i long, t string")
    got = {r.i: r.c for r in df.select(
        "i", dedup.canonical_text(F.col("t")).alias("c")).collect()}
    con = duckdb.connect()
    for i, t in enumerate(extra):
        d = con.execute(
            f"SELECT {dedup.sql_canonical_text('t')} FROM (SELECT ? AS t)",
            [t]).fetchone()[0]
        assert d == got[i], (t, d, got[i])


def test_normalized_dedup_composition(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "The  QUICK, brown fox!"),
        (2, "THE QUICK BROWN FOX."),
        (3, "a different doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    canon = df.select("doc_id",
                      dedup.canonical_text(F.col("text")).alias("text"))
    got = {r.content_hash: r for r in
           dedup.exact_dedup_groups(canon).collect()}
    assert len(got) == 2
    big = max(got.values(), key=lambda r: r.n_docs)
    assert big.n_docs == 3 and big.min_doc_id == 0
