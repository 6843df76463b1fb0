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


# ---------------------------------------------------------------------------
# dup_span_scrub (SURVEY J52) — the removal counterpart
# ---------------------------------------------------------------------------

def _scrub(spark, rows, window, stride):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: (r.n_tokens, r.n_removed, r.scrubbed_text)
            for r in dedup.dup_span_scrub(df, window=window,
                                          stride=stride).collect()}


def test_scrub_exact_twin_keeps_first_occurrence(spark):
    ten = " ".join(f"w{i}" for i in range(10))
    got = _scrub(spark, [(0, ten), (1, ten)], window=4, stride=4)
    # doc 0 is the keeper for both full windows: loses nothing
    assert got[0] == (10, 0, ten)
    # doc 1 loses tokens 0..7 (two dup windows); tail w8 w9 survives
    assert got[1] == (10, 8, "w8 w9")


def test_scrub_untouched_doc_roundtrips(spark):
    got = _scrub(spark, [(0, "solo doc with no twin at all")],
                 window=3, stride=3)
    assert got[0] == (7, 0, "solo doc with no twin at all")


def test_scrub_short_doc_whole_window(spark):
    got = _scrub(spark, [(0, "a b"), (1, "a b"), (2, "c d")],
                 window=4, stride=4)
    assert got[0] == (2, 0, "a b")      # keeper
    assert got[1] == (2, 2, "")         # fully scrubbed twin
    assert got[2] == (2, 0, "c d")


def test_scrub_intra_doc_self_duplicate(spark):
    four = " ".join(f"r{i}" for i in range(4))
    # same 4-token window twice WITHIN one doc: second strike removed
    got = _scrub(spark, [(0, four + " " + four)], window=4, stride=4)
    assert got[0] == (8, 4, four)


def test_scrub_overlapping_stride_unions_positions(spark):
    eight = " ".join(f"v{i}" for i in range(8))
    # stride 2 < window 4: doc 1's dup windows overlap; removed
    # positions are the distinct union, not double-counted
    got = _scrub(spark, [(0, eight), (1, eight)], window=4, stride=2)
    assert got[1] == (8, 8, "")
    assert got[0] == (8, 0, eight)


def test_scrub_matches_stats_accounting(spark):
    """Every doc dup_span_stats says is clean must be untouched, and
    total removals can't exceed window * corpus dup_windows."""
    rows = [(i, " ".join(f"t{i % 3}_{j}" for j in range(12)))
            for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r.doc_id: r.dup_windows
             for r in dedup.dup_span_stats(df, window=4,
                                           stride=4).collect()}
    got = _scrub(spark, rows, window=4, stride=4)
    for did, (_n, removed, _txt) in got.items():
        if stats[did] == 0:
            assert removed == 0
    assert (sum(r for _, r, _ in got.values())
            <= 4 * sum(stats.values()))


def test_scrub_validation(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.dup_span_scrub(df, window=0)
    with pytest.raises(ValueError):
        dedup.dup_span_scrub(df, stride=0)
