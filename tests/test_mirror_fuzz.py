"""Differential fuzz for the round-5 tail operators: seeded random
corpora vs exact pure-Python replays (the repo's J-family convention —
the distributed plan must reproduce the scalar math bit-for-bit at the
rounding points)."""

import random

import pytest

from mdscraper_spark.operators.dedup import mirror_shingle_overlap
from mdscraper_spark.operators.graph import component_sizes


def test_mirror_overlap_differential_fuzz(spark):
    """Zipf-ish vocab with deliberate cross-host copying and a viral
    boilerplate sentence, vs a pure-Python replay of tokenize →
    5-gram shingle → distinct posting → hot-cap → pair counts →
    overlap coefficient."""
    rng = random.Random("mirror-fuzz-r5")
    vocab = [f"t{i}" for i in range(40)]
    banner = "this website stores cookies on your computer okay"
    k, cap = 5, 8
    docs, did = [], 0
    for host in range(14):
        for _ in range(rng.randrange(1, 4)):
            n = rng.randrange(0, 30)
            toks = [vocab[rng.randrange(len(vocab))] for _ in range(n)]
            text = " ".join(toks)
            if rng.random() < 0.5:
                text = banner + " " + text      # viral boilerplate
            docs.append((did, text, f"host{host}"))
            did += 1
            if rng.random() < 0.3 and docs:     # cross-host mirror copy
                src_text = docs[rng.randrange(len(docs))][1]
                docs.append((did, src_text, f"host{(host + 7) % 14}"))
                did += 1
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")

    # pure-Python replay
    posting = {}                                 # shingle -> set(source)
    for _i, text, src in docs:
        toks = text.split()
        for j in range(max(0, len(toks) - k + 1)):
            posting.setdefault(" ".join(toks[j:j + k]), set()).add(src)
    kept = {sh: ss for sh, ss in posting.items() if len(ss) <= cap}
    totals = {}
    for ss in kept.values():
        for s in ss:
            totals[s] = totals.get(s, 0) + 1
    pair_n = {}
    for ss in kept.values():
        srcs = sorted(ss)
        for x in range(len(srcs)):
            for y in range(x + 1, len(srcs)):
                pair_n[(srcs[x], srcs[y])] = \
                    pair_n.get((srcs[x], srcs[y]), 0) + 1
    expect = {p: (n, round(n / min(totals[p[0]], totals[p[1]]), 6))
              for p, n in pair_n.items()}

    got = {(r.s1, r.s2): (r.n_shared, r.overlap)
           for r in mirror_shingle_overlap(df, max_sources=cap).collect()}
    assert got == expect
    assert got, "fuzz corpus produced no mirror pairs — vacuous"


def test_component_sizes_differential_fuzz(spark):
    """Random sparse multigraphs vs a pure-Python union-find census
    (min-label components, node counts, edge-ROW counts)."""
    rng = random.Random("census-fuzz-r5")
    for trial in range(3):
        n_nodes = rng.randrange(6, 40)
        n_edges = rng.randrange(3, 60)
        rows = []
        for e in range(n_edges):
            a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
            rows.append((f"v{a}", f"p{e % 3}", f"v{b}", 1))
        df = spark.createDataFrame(
            rows, "src string, pred string, dst string, n_support long")

        parent = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, _p, b, _s in rows:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = {x for a, _p, b, _s in rows for x in (a, b)}
        comp = {x: find(x) for x in nodes}
        expect = {}
        for x, c in comp.items():
            expect.setdefault(c, [0, 0])[0] += 1
        for a, _p, _b, _s in rows:
            expect[comp[a]][1] += 1
        got = {r.comp_id: [r.n_nodes, r.n_edges]
               for r in component_sizes(df).collect()}
        assert got == expect, trial


@pytest.mark.slow
def test_mirror_cap_bounds_pairs_at_20k_docs(spark):
    """The no-broadcast boilerplate cap at meaningful scale: 20k docs
    across 400 hosts where EVERY doc opens with one of 5 viral banner
    sentences.  Uncapped, each banner shingle pairs ~400 hosts ->
    ~80k pair-rows per shingle; with the cap the banners vanish and
    only the deliberate cross-host mirrors (2% of docs copied to one
    other host) survive.  Pins: (a) every reported pair involves a
    genuine copy, (b) pair count is bounded by the planted mirrors,
    (c) the job completes without any driver-side set (the plan is
    already asserted broadcast-free in test_mirror_components)."""
    from pyspark.sql import functions as F

    banners = [
        "this website stores cookies on your computer to improve experience",
        "we and our partners process personal data for measurement insights",
        "sign in to your account to continue reading premium member content",
        "subscribe to the newsletter for weekly updates delivered every morning",
        "all trademarks are property of their respective owners worldwide today",
    ]
    base = (spark.range(20_000, numPartitions=32)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.element_at(F.array(*[F.lit(b) for b in banners]),
                                 (F.col("id") % 5 + 1).cast("int")),
                    F.lit(" body "),
                    # 12 doc-unique tokens -> host-unique shingles
                    F.concat_ws(" ", *[
                        F.concat(F.lit(f"tok{j}x"), F.col("id"))
                        for j in range(12)])).alias("text"),
                F.concat(F.lit("host"), (F.col("id") % 400)).alias("source")))
    mirrors = (base.filter(F.col("doc_id") % 50 == 0)   # 2% copied
               .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                       "text",
                       F.concat(F.lit("host"),
                                ((F.col("doc_id") + 199) % 400))
                       .alias("source")))
    df = base.unionByName(mirrors)
    pairs = mirror_shingle_overlap(df).collect()
    n_mirror_docs = 20_000 // 50
    assert 0 < len(pairs) <= n_mirror_docs
    # every pair must be a planted copy pair: hosts 200 apart minus
    # the +199 shift — i.e. (h, (h+199) % 400) for some mirrored doc
    for r in pairs:
        h1 = int(r.s1.removeprefix("host"))
        h2 = int(r.s2.removeprefix("host"))
        assert (h1 + 199) % 400 == h2 or (h2 + 199) % 400 == h1, (r.s1, r.s2)
        assert r.n_shared >= 1


def test_dup_span_scrub_differential_fuzz(spark):
    """Seeded corpus with planted exact twins, shared prefixes and
    intra-doc repeats, run at three (window, stride) shapes incl. an
    overlapping stride, vs a pure-Python replay of the window ->
    keeper-election -> position-union -> rejoin algebra."""
    from mdscraper_spark.operators.dedup import dup_span_scrub

    rng = random.Random("scrub-fuzz-r5")
    vocab = [f"w{i}" for i in range(25)]
    boiler = " ".join(f"b{i}" for i in range(6))
    docs, did = [], 0
    for _ in range(40):
        n = rng.randrange(0, 24)
        toks = [vocab[rng.randrange(len(vocab))] for _ in range(n)]
        text = " ".join(toks)
        r = rng.random()
        if r < 0.25:
            text = boiler + (" " + text if text else "")
        elif r < 0.35 and text:
            text = text + " " + text            # intra-doc repeat
        docs.append((did, text))
        did += 1
        if rng.random() < 0.25:                 # exact twin
            docs.append((did, text))
            did += 1

    def replay(window, stride):
        # split(" ") on "" yields [""] — same as Spark's \s+ split on
        # the empty string (generated texts are single-spaced, so the
        # separators agree everywhere else too)
        toks = {d: t.split(" ") for d, t in docs}
        occ = {}                                # h -> [(doc_id, i)]
        meta = {}                               # (doc_id,i) -> n
        for d, tl in toks.items():
            n = len(tl)
            n_win = max(1, (n - window) // stride + 1) if n >= window \
                else 1
            for i in range(n_win):
                h = " ".join(tl[i * stride: i * stride + window])
                occ.setdefault(h, []).append((d, i))
                meta[(d, i)] = n
        removed = {}                            # doc -> set(pos)
        for h, occs in occ.items():
            if len(occs) < 2:
                continue
            keeper = min(occs)
            for (d, i) in occs:
                if (d, i) == keeper:
                    continue
                n = meta[(d, i)]
                for pos in range(i * stride,
                                 min(n, i * stride + window)):
                    removed.setdefault(d, set()).add(pos)
        out = {}
        for d, tl in toks.items():
            rm = removed.get(d, set())
            kept = [t for p, t in enumerate(tl) if p not in rm]
            out[d] = (len(tl), len(rm), " ".join(kept))
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    for window, stride in ((4, 4), (5, 2), (3, 3)):
        expect = replay(window, stride)
        got = {r.doc_id: (r.n_tokens, r.n_removed, r.scrubbed_text)
               for r in dup_span_scrub(df, window=window,
                                       stride=stride).collect()}
        assert got == expect, (window, stride)


def test_khop_reach_differential_fuzz(spark):
    """Random hub-skewed digraph (with cycles and self-loops) vs a
    pure-Python BFS from the same deterministic seed selection."""
    from mdscraper_spark.operators.graph import khop_reach

    rng = random.Random("khop-fuzz-r5")
    nodes = [f"n{i:02d}" for i in range(30)]
    edges = set()
    for _ in range(120):
        s = nodes[min(rng.randrange(30), rng.randrange(30))]  # skew
        d = nodes[rng.randrange(30)]
        edges.add((s, d))
    edges = sorted(edges)

    for k, n_seeds in ((3, 5), (1, 2), (4, 1)):
        out_deg = {}
        for s, _d in edges:
            out_deg[s] = out_deg.get(s, 0) + 1
        seeds = sorted(out_deg, key=lambda x: (-out_deg[x], x))[:n_seeds]
        adj = {}
        for s, d in edges:
            adj.setdefault(s, []).append(d)
        dist = {s: 0 for s in seeds}
        frontier = list(seeds)
        for lvl in range(1, k + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = lvl
                        nxt.append(v)
            frontier = nxt
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: r.min_dist
               for r in khop_reach(df, k=k, n_seeds=n_seeds).collect()}
        assert got == dist, (k, n_seeds)
