"""Sliding token-window chunking (SURVEY J31)."""

import pytest

from mdscraper_spark.operators import textstats


def _chunks(spark, rows, chunk_tokens, overlap):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.chunk_documents(df, chunk_tokens=chunk_tokens,
                                    overlap=overlap)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, {})[r.chunk_id] = (r.n_tokens, r.chunk_text)
    return got


def test_chunk_hand_cases(spark):
    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    got = _chunks(spark, [(0, text),
                          (1, "a b c"),
                          (2, "   \n\t "),   # whitespace-only: 0 chunks
                          (3, "")],
                  chunk_tokens=4, overlap=1)
    # stride 3; n=10 -> ceil(9/3)=3 chunks: [0:4),[3:7),[6:10)
    assert sorted(got[0]) == [0, 1, 2]
    assert got[0][0] == (4, "w0 w1 w2 w3")
    assert got[0][1] == (4, "w3 w4 w5 w6")
    assert got[0][2] == (4, "w6 w7 w8 w9")
    # n <= chunk: exactly one whole-doc chunk
    assert got[1] == {0: (3, "a b c")}
    assert 2 not in got and 3 not in got


def test_chunk_no_overlap_exact_boundary(spark):
    text = " ".join(f"w{i}" for i in range(8))
    got = _chunks(spark, [(0, text)], chunk_tokens=4, overlap=0)
    # n=8, stride 4 -> exactly 2 full chunks, no empty trailing chunk
    assert got[0] == {0: (4, "w0 w1 w2 w3"), 1: (4, "w4 w5 w6 w7")}


def test_chunk_final_stub_rule(spark):
    # n = chunk + 1: one token past the budget -> second chunk carries
    # overlap context + the single new token
    text = " ".join(f"w{i}" for i in range(5))
    got = _chunks(spark, [(0, text)], chunk_tokens=4, overlap=2)
    # stride 2; ceil((5-2)/2) = 2 chunks: [0:4), [2:5)
    assert got[0][0] == (4, "w0 w1 w2 w3")
    assert got[0][1] == (3, "w2 w3 w4")
    # but n = overlap exactly -> ONE chunk, never an overlap-only stub
    got2 = _chunks(spark, [(0, "a b")], chunk_tokens=4, overlap=2)
    assert got2[0] == {0: (2, "a b")}


def test_chunk_reassembly_covers_every_token(spark):
    # dropping the first `overlap` tokens of every chunk after the
    # first reassembles the document exactly — the training-time
    # contract that no token is lost or duplicated beyond the overlap
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(1 + (i * 13) % 40)))
            for i in range(30)]
    got = _chunks(spark, rows, chunk_tokens=7, overlap=3)
    for i, text in rows:
        toks = text.split()
        pieces = []
        for cid in sorted(got[i]):
            ctoks = got[i][cid][1].split()
            pieces.extend(ctoks if cid == 0 else ctoks[3:])
        assert pieces == toks, (i, pieces, toks)


def test_chunk_partition_invariant(spark):
    rows = [(i, " ".join(f"t{j}" for j in range((i * 7) % 50)))
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    one = sorted(map(tuple, textstats.chunk_documents(
        df.coalesce(1), 8, 2).collect()))
    many = sorted(map(tuple, textstats.chunk_documents(
        df.repartition(17), 8, 2).collect()))
    assert one == many


def test_chunk_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textstats.chunk_documents(df, chunk_tokens=0, overlap=0)
    with pytest.raises(ValueError):
        textstats.chunk_documents(df, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        textstats.chunk_documents(df, chunk_tokens=4, overlap=-1)
