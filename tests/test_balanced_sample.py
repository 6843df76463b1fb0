"""Quota-based stratum-balanced Bernoulli sampling (SURVEY J33)."""

import hashlib

import pytest

from mdscraper_spark.operators import textstats


def _bucket(doc_id, salt="balance-v1"):
    h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()
    return int(h[:8], 16) % 1_000_000


def test_balanced_sample_rates_and_coin(spark):
    rows = ([(i, "big") for i in range(400)]      # over quota
            + [(1000 + i, "tiny") for i in range(30)]   # under quota
            + [(2000 + i, None) for i in range(50)])    # null stratum
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r.doc_id: r for r in textstats.balanced_sample(df, quota=40).collect()}
    assert len(got) == len(rows)

    # under-quota stratum: rate 1.0 (PPM), everything kept
    for i in range(1000, 1030):
        assert got[i].rate_ppm == 1_000_000 and got[i].keep

    # over-quota stratum: rate floor-exact, keep iff coin < rate
    qppm = 40 * 1_000_000
    want_rate = (qppm - qppm % 400) // 400
    kept = 0
    for i in range(400):
        assert got[i].rate_ppm == want_rate
        assert got[i].keep == (_bucket(i) < want_rate)
        kept += got[i].keep
    # Bernoulli around 40: generous but non-vacuous band
    assert 15 <= kept <= 70

    # null stratum is ONE real group (50 docs, over quota of 40)
    null_rate = (qppm - qppm % 50) // 50
    for i in range(2000, 2050):
        assert got[i].stratum is None and got[i].rate_ppm == null_rate


def test_balanced_sample_partition_invariant(spark):
    rows = [(i, f"l{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    one = sorted(map(tuple, textstats.balanced_sample(
        df.coalesce(1), quota=20).collect()))
    many = sorted(map(tuple, textstats.balanced_sample(
        df.repartition(17), quota=20).collect()))
    assert one == many


def test_balanced_sample_quota_zero_and_validation(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, lang string")
    got = textstats.balanced_sample(df, quota=0).collect()
    assert all(r.rate_ppm == 0 and not r.keep for r in got)
    with pytest.raises(ValueError):
        textstats.balanced_sample(df, quota=-1)
