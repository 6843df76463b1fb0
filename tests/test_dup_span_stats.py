"""Substring-level duplication stats (SURVEY J37)."""

import pytest

from mdscraper_spark.operators import dedup


def _run(spark, rows, window, stride):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: (r.n_windows, r.dup_windows, r.dup_frac)
            for r in dedup.dup_span_stats(df, window=window,
                                          stride=stride).collect()}


def test_window_arithmetic_and_exact_twins(spark):
    ten = " ".join(f"w{i}" for i in range(10))
    got = _run(spark, [
        (0, ten),                       # 10 tokens, window 4 -> 2 full
        (1, ten),                       # exact twin: every window dup
        (2, "a b"),                     # short: one whole-doc window
        (3, "a b"),                     # short twin collides
        (4, "unique doc here ok"),      # 4 tokens = 1 window, unique
    ], window=4, stride=4)
    # floor((10-4)/4)+1 = 2 windows; twins make both dup
    assert got[0] == (2, 2, 1.0) and got[1] == (2, 2, 1.0)
    assert got[2] == (1, 1, 1.0) and got[3] == (1, 1, 1.0)
    assert got[4] == (1, 0, 0.0)


def test_aligned_prefix_collides_unaligned_does_not(spark):
    boiler = " ".join(f"b{i}" for i in range(4))
    got = _run(spark, [
        (0, boiler + " body zero is long enough here"),
        (1, boiler + " body one differs after that prefix"),
        # same boilerplate but shifted one token: unaligned at
        # stride == window, so it does NOT collide (documented caveat)
        (2, "x " + boiler + " body two padded ok yes"),
    ], window=4, stride=4)
    assert got[0][1] >= 1 and got[1][1] >= 1     # shared window 0
    assert got[2][1] == 0


def test_partial_overlap_fraction(spark):
    shared = " ".join(f"s{i}" for i in range(8))
    got = _run(spark, [
        (0, shared + " " + " ".join(f"a{i}" for i in range(8))),
        (1, shared + " " + " ".join(f"z{i}" for i in range(8))),
    ], window=4, stride=4)
    # 16 tokens -> 4 windows; first two (the shared 8 tokens) dup
    assert got[0] == (4, 2, 0.5) and got[1] == (4, 2, 0.5)


def test_partition_invariance_and_validation(spark):
    rows = [(i, " ".join(f"t{(i * 5 + j) % 23}" for j in range(30)))
            for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    one = sorted(map(tuple, dedup.dup_span_stats(
        df.coalesce(1), 6, 3).collect()))
    many = sorted(map(tuple, dedup.dup_span_stats(
        df.repartition(13), 6, 3).collect()))
    assert one == many
    with pytest.raises(ValueError):
        dedup.dup_span_stats(df, window=0, stride=1)
    with pytest.raises(ValueError):
        dedup.dup_span_stats(df, window=4, stride=0)
