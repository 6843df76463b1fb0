"""Deterministic corpus shuffle (SURVEY J35)."""

import hashlib

import pytest

from mdscraper_spark.operators import textstats


def test_corpus_shuffle_matches_hashlib_replay(spark):
    ids = list(range(500))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: (r.shard, r.pos)
           for r in textstats.corpus_shuffle(df, n_shards=4).collect()}

    shards = {}
    for i in ids:
        h = hashlib.md5(f"{i}:shuffle-v1".encode()).hexdigest()
        shards.setdefault(int(h[:8], 16) % 4, []).append((h, i))
    expect = {}
    for s, members in shards.items():
        for pos, (_, i) in enumerate(sorted(members)):
            expect[i] = (s, pos)
    assert got == expect


def test_corpus_shuffle_positions_dense_and_partition_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    one = sorted(map(tuple, textstats.corpus_shuffle(
        df.coalesce(1), n_shards=5).collect()))
    many = sorted(map(tuple, textstats.corpus_shuffle(
        df.repartition(13), n_shards=5).collect()))
    assert one == many
    by_shard = {}
    for _, s, p in one:
        by_shard.setdefault(s, []).append(p)
    assert sum(len(v) for v in by_shard.values()) == 300
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))  # dense 0-based


def test_corpus_shuffle_salt_reshuffles(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = {r.doc_id: (r.shard, r.pos) for r in
         textstats.corpus_shuffle(df, 4, salt="epoch-0").collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in
         textstats.corpus_shuffle(df, 4, salt="epoch-1").collect()}
    assert a != b                       # different epoch, different order
    assert set(a) == set(b)             # same corpus

    with pytest.raises(ValueError):
        textstats.corpus_shuffle(df, 0)
