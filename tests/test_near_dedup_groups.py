"""near_dedup_groups: LSH candidate pairs closed into components, one
survivor (min doc_id) per group — transitivity, singleton identity, and
the keep flag pinned against a pure-Python union-find replay."""

from pyspark.sql import functions as F

from mdscraper_spark.operators.dedup import (lsh_candidate_pairs,
                                             minhash_signatures,
                                             near_dedup_groups)

BASE = ("the quick brown fox jumps over the lazy dog while the band "
        "plays on and the crowd cheers loudly in the warm evening air "
        "near the old stone bridge by the river")


def corpus(spark):
    rows = [
        # A/B near-identical, C near B but further from A: transitivity
        # must still place all three in one group
        (7, BASE + " alpha", "en"),
        (3, BASE + " beta", "en"),
        (12, BASE + " beta gamma", "en"),
        # exact pair in a different group (no shingles shared with BASE)
        (20, "annual maintenance window scheduled for the storage "
             "cluster requires draining every cache node before the "
             "firmware rollout begins tonight at midnight sharp", "en"),
        (21, "annual maintenance window scheduled for the storage "
             "cluster requires draining every cache node before the "
             "firmware rollout begins tonight at midnight sharp", "en"),
        # singleton with unrelated text
        (30, "completely different content about spark physical plans "
             "and adaptive query execution with no shared shingles "
             "whatsoever in this entire standalone paragraph", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def py_union_find(pairs, all_ids):
    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then canon = component min (roots ARE minima here
    # because unions always point the larger root at the smaller)
    return {i: find(i) for i in all_ids}


def test_groups_match_union_find_replay(spark):
    df = corpus(spark)
    pairs = [(r.doc_a, r.doc_b) for r in
             lsh_candidate_pairs(minhash_signatures(df)).collect()]
    ids = [r.doc_id for r in df.select("doc_id").collect()]
    expect = py_union_find(pairs, ids)

    got = {r.doc_id: r for r in near_dedup_groups(df).collect()}
    assert set(got) == set(ids)
    for i in ids:
        assert got[i].canonical_id == expect[i], (i, got[i], expect[i])
        assert got[i].keep == (expect[i] == i)
    sizes = {}
    for i in ids:
        sizes[expect[i]] = sizes.get(expect[i], 0) + 1
    for i in ids:
        assert got[i].group_size == sizes[expect[i]]


def test_transitive_closure_and_survivors(spark):
    got = {r.doc_id: r for r in near_dedup_groups(corpus(spark)).collect()}
    # the A/B/C cluster resolves to min id 3 even if (7,12) never
    # shared a band directly
    assert got[7].canonical_id == got[3].canonical_id == got[12].canonical_id == 3
    assert [got[i].keep for i in (3, 7, 12)] == [True, False, False]
    assert got[3].group_size == 3
    # exact pair
    assert got[21].canonical_id == 20 and got[20].keep and not got[21].keep
    # singleton maps to itself with size 1
    assert got[30].canonical_id == 30 and got[30].keep and got[30].group_size == 1


def test_every_doc_appears_exactly_once(spark):
    df = corpus(spark)
    out = near_dedup_groups(df)
    assert out.count() == df.count()
    assert out.select("doc_id").distinct().count() == df.count()
    # exactly one survivor per group
    per_group = (out.groupBy("canonical_id")
                 .agg(F.sum(F.col("keep").cast("int")).alias("n_keep"))
                 .collect())
    assert all(r.n_keep == 1 for r in per_group)


def test_resolve_dedup_groups_generic_pairs(spark):
    # the factored closure works on ANY pair list with custom column
    # names — here a hand graph with a chain, a pair, and singletons
    ids = spark.createDataFrame([(i,) for i in range(8)], "vec_id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 6)], "vec_a long, vec_b long")
    from mdscraper_spark.operators.dedup import resolve_dedup_groups
    got = {r.vec_id: (r.canonical_id, r.group_size, r.keep)
           for r in resolve_dedup_groups(
               ids, pairs, id_col="vec_id",
               a_col="vec_a", b_col="vec_b").collect()}
    assert got[1] == (1, 3, True)
    assert got[3] == (1, 3, False) and got[5] == (1, 3, False)
    assert got[2] == (2, 2, True) and got[6] == (2, 2, False)
    for i in (0, 4, 7):
        assert got[i] == (i, 1, True)


# ---------------------------------------------------------------------------
# sorted-neighborhood blocking (SURVEY J57)
# ---------------------------------------------------------------------------

def test_sorted_neighborhood_pairs_window_and_blocks(spark):
    from mdscraper_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [(1, "apple pie"), (2, "apple pia"), (3, "apple pin"),
            (4, "apricot"), (5, "banana"), (6, "bananna")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r.id_a, r.id_b): r.lev
           for r in sorted_neighborhood_pairs(
               df, "name", "id", window=3, block_chars=1).collect()}
    # block 'a' order: apple pia(2) < apple pie(1) < apple pin(3) <
    # apricot(4); window 3 -> leads 1..2 from each position
    assert (2, 1) in got and got[(2, 1)] == 1
    assert (2, 3) in got and (1, 3) in got and (1, 4) in got
    assert (3, 4) in got
    # block 'b': banana(5) < bananna(6)
    assert got[(5, 6)] == 1
    # no cross-block pair
    assert not any({a, b} == {4, 5} for a, b in got)


def test_sorted_neighborhood_candidate_count_linear(spark):
    """n rows in one block with window w emit exactly
    (n-1)+(n-2)+...+(n-w+1) pairs — linear in n, never n^2."""
    from mdscraper_spark.operators.dedup import sorted_neighborhood_pairs

    n, w = 40, 4
    rows = [(i, f"k{i:03d}") for i in range(n)]
    df = spark.createDataFrame(rows, "id long, name string")
    cnt = sorted_neighborhood_pairs(df, "name", "id", window=w,
                                    block_chars=1).count()
    assert cnt == sum(n - j for j in range(1, w))


def test_sorted_neighborhood_validation(spark):
    import pytest

    from mdscraper_spark.operators.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "name", "id", window=1)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "name", "id", block_chars=0)


def test_multipass_blocking_recovers_tail_pairs(spark):
    """Names agreeing only in their word TAILS never meet under the
    raw-key order but do under the reversed-key pass; a pair caught by
    both passes reports n_passes=2."""
    from mdscraper_spark.operators.dedup import multipass_blocking_pairs

    rows = [(1, "alpha red widget"), (2, "alpha red widgget"),
            (3, "zeta red widget"), (4, "omega blue gadget")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r.id_a, r.id_b): (r.lev, r.n_passes)
           for r in multipass_blocking_pairs(
               df, "name", "id", window=3, block_chars=1).collect()}
    # (1,2): adjacent in the raw-key block AND within window 3 of the
    # reversed-key block (order there: 1, 3, 2) -> n_passes 2
    assert got[(1, 2)] == (1, 2)
    # (1,3): different raw blocks (a vs z) but reversed keys
    # ("widget red alpha"/"widget red zeta") share block 'w'
    assert (1, 3) in got and got[(1, 3)][1] == 1
    assert not any({a, b} == {1, 4} for (a, b) in got)
