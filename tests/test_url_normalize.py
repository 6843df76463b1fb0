"""URL canonicalization + URL-level dedup (SURVEY J30).

normalize_url's contract is pinned against hand-derived expectations
AND cross-checked against its DuckDB twin on the same inputs, so the
oracle row can only fail if the registry's synthetic-URL construction
drifts — never the normalizer itself.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

from mdscraper_spark.operators import links

CASES = [
    # (raw, expected canonical or None)
    ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
     "https://www.example.com/a/b?a=1&b=2"),
    ("http://example.com:8080/p//", "http://example.com:8080/p"),
    ("http://example.com", "http://example.com/"),
    ("https://site.org/x?gclid=1&utm_campaign=c&fbclid=z",
     "https://site.org/x"),
    ("https://site.org/x?id=5&page=2", "https://site.org/x?id=5&page=2"),
    ("https://site.org/x?page=2&id=5", "https://site.org/x?id=5&page=2"),
    ("mailto:joe@example.com", None),
    ("/relative/path", None),
    ("", None),
    ("ftp://files.example.com/dir/", "ftp://files.example.com/dir"),
    ("http://Example.com:80/", "http://example.com/"),
    ("https://h.io/p?", "https://h.io/p"),
    ("https://h.io/p#only-frag", "https://h.io/p"),
    # '?' inside the fragment must not resurrect a query
    ("http://h.io/p?a=1#f?b=2", "http://h.io/p?a=1"),
    # query starts at the FIRST '?' (RFC): a later '?' is query DATA,
    # not a new query — nothing before it may be silently dropped
    ("http://h.io/p?a=1?b=2", "http://h.io/p?a=1?b=2"),
    ("http://h.io/p?x=2&a=1?z", "http://h.io/p?a=1?z&x=2"),
    # msclkid dropped; empty params (&&) dropped
    ("http://h.io/p?msclkid=m&&z=9", "http://h.io/p?z=9"),
    # non-default port on the OTHER scheme is kept
    ("http://h.io:443/p", "http://h.io:443/p"),
]


def test_normalize_url_hand_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string")
    got = {r.i: r.n for r in df.select(
        "i", links.normalize_url(F.col("url")).alias("n")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_sql_twin_matches_spark(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string")
    got = {r.i: r.n for r in df.select(
        "i", links.normalize_url(F.col("url")).alias("n")).collect()}
    con = duckdb.connect()
    for i, (raw, _) in enumerate(CASES):
        d = con.execute(
            f"SELECT {links.sql_normalize_url('u')} FROM (SELECT ? AS u)",
            [raw]).fetchone()[0]
        assert d == got[i], (raw, d, got[i])


def test_url_dedup_elects_min_and_keeps_unparseable(spark):
    rows = [
        (7, "https://A.io/x?utm_source=1"),
        (3, "HTTPS://a.io/x/"),
        (5, "https://a.io:443/x#frag"),
        (9, "https://b.io/y"),
        (11, "not a url"),
        (13, "still-not-a-url"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r for r in links.url_dedup(df).collect()}
    # the three a.io spellings collide; min doc_id 3 survives
    assert [got[i].url_norm for i in (3, 5, 7)] == ["https://a.io/x"] * 3
    assert (got[3].keep, got[5].keep, got[7].keep) == (True, False, False)
    assert got[9].keep
    # unparseable rows are ALL kept, never one-survivor-per-null-group
    assert got[11].url_norm is None and got[11].keep
    assert got[13].url_norm is None and got[13].keep


def test_url_dedup_partition_invariant(spark):
    rows = [(i, f"https://s{i % 5}.io/p{i % 21}?utm_c={i}") for i in range(210)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    one = sorted(map(tuple, links.url_dedup(df.coalesce(1)).collect()))
    many = sorted(map(tuple, links.url_dedup(df.repartition(13)).collect()))
    assert one == many
    # 5 and 21 coprime: 105 canonical urls, one survivor each
    assert sum(r[2] for r in one) == 105


def test_normalize_url_fuzz_twin_parity(spark):
    # structured fuzz: random-ish recombination of url fragments, both
    # engines must agree on every input (incl. degenerate ones)
    import itertools
    schemes = ["http://", "HTTPS://", "", "x+y-z.1://"]
    hosts = ["Host.IO", "h.io:80", "h.io:443", "h.io:81", ""]
    paths = ["", "/", "/a//", "/a/b"]
    queries = ["", "?", "?utm_source=s", "?b=2&a=1&utm_x=0", "?a", "?=v&a=1",
               "?a=1?b=2"]
    frags = ["", "#f", "#f?q=1"]
    cases = ["".join(p) for p in itertools.product(
        schemes, hosts, paths, queries, frags)]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, url string")
    got = {r.i: r.n for r in df.select(
        "i", links.normalize_url(F.col("url")).alias("n")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, c) for i, c in enumerate(cases)])
    for i, d in con.execute(
            f"SELECT i, {links.sql_normalize_url('u')} FROM t").fetchall():
        assert d == got[i], (cases[i], d, got[i])


def test_inlink_counts_hand_case(spark):
    rows = [
        # three spellings of one target, three different source hosts
        ("https://a.io/p", "https://T.io/x?utm_source=1"),
        ("https://b.io/p", "HTTPS://t.io/x/"),
        ("https://c.io/p", "https://t.io:443/x#f"),
        # same source host twice -> n_src_hosts stays 1 for this target
        ("https://a.io/q1", "https://u.io/y"),
        ("https://a.io/q2", "https://u.io/y"),
        # unparseable source: the in-link counts, the host does not
        ("not a url", "https://u.io/y"),
        # unparseable href: no edge at all
        ("https://a.io/p", "mailto:z@e.com"),
    ]
    df = spark.createDataFrame(rows, "src_url string, href string")
    got = {r.target_url: (r.n_inlinks, r.n_src_hosts)
           for r in links.inlink_counts(df).collect()}
    assert got == {"https://t.io/x": (3, 3), "https://u.io/y": (3, 1)}


def test_inlink_counts_partition_invariant(spark):
    rows = [(f"https://s{i % 4}.io/p{i}",
             f"https://t{i % 3}.io/page/{i % 10}?utm_x={i}")
            for i in range(120)]
    df = spark.createDataFrame(rows, "src_url string, href string")
    one = sorted(map(tuple, links.inlink_counts(df.coalesce(1)).collect()))
    many = sorted(map(tuple, links.inlink_counts(df.repartition(11)).collect()))
    assert one == many
    assert len(one) == 30 and all(r[1] == 4 for r in one)


def test_normalize_url_idempotent(spark):
    # canonicalization must be a fixed point: re-normalizing an already
    # canonical url (e.g. a re-crawl of a url we emitted) cannot change
    # the dedup key
    import itertools
    schemes = ["http://", "HTTPS://", "ftp://"]
    hosts = ["Host.IO", "h.io:80", "h.io:8080"]
    paths = ["", "/", "/a//", "/a/b"]
    queries = ["", "?", "?utm_source=s", "?b=2&a=1", "?a=1?b=2", "?=v&a"]
    frags = ["", "#f"]
    cases = ["".join(p) for p in itertools.product(
        schemes, hosts, paths, queries, frags)]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, url string")
    once = links.normalize_url(F.col("url"))
    rows = df.select("i", once.alias("n1")).select(
        "i", "n1", links.normalize_url(F.col("n1")).alias("n2")).collect()
    for r in rows:
        assert r.n2 == r.n1, (cases[r.i], r.n1, r.n2)


def test_crawl_policy_filter_hand_cases(spark):
    rules = spark.createDataFrame(
        [("h.io", "/admin"), ("h.io", "/p/1"), ("deny.io", "/")],
        "host string, path_prefix string")
    urls = spark.createDataFrame([
        ("https://H.IO/admin/x",),      # prefix hit, case-folded host
        ("https://h.io/p/10",),         # /p/1 is a byte prefix of /p/10
        ("https://h.io/p/2",),          # no rule
        ("https://h.io/Admin",),        # case-sensitive PATH: no hit
        ("https://deny.io",),           # empty path -> '/', deny-all
        ("https://other.io/admin",),    # host without rules: allowed
        ("not a url",),                 # unattributable: disallowed
    ], "url string")
    got = {r.url: r.allowed
           for r in links.crawl_policy_filter(urls, rules).collect()}
    assert got == {
        "https://H.IO/admin/x": False,
        "https://h.io/p/10": False,
        "https://h.io/p/2": True,
        "https://h.io/Admin": True,
        "https://deny.io": False,
        "https://other.io/admin": True,
        "not a url": False,
    }


def test_crawl_policy_filter_partition_invariant(spark):
    rules = spark.createDataFrame(
        [(f"s{i}.io", "/no") for i in range(3)],
        "host string, path_prefix string")
    urls = spark.createDataFrame(
        [(f"https://s{i % 5}.io/{'no' if i % 2 else 'yes'}/{i}",)
         for i in range(100)], "url string")
    one = sorted(map(tuple, links.crawl_policy_filter(
        urls.coalesce(1), rules).collect()))
    many = sorted(map(tuple, links.crawl_policy_filter(
        urls.repartition(13), rules).collect()))
    assert one == many
    # /no paths on ruled hosts s0-s2 denied; everything else allowed
    denied = [u for u, _, _, a in one if not a]
    assert all("/no/" in u and u[9] in "012" for u in denied)
    assert len(denied) == 30
