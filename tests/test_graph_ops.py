"""Graph read-side operators over kg_edges: degrees, shared-neighbor
traversal, PageRank invariants."""

import pytest
from pyspark.sql import functions as F

from mdscraper_spark.operators.graph import (degree_stats, pagerank,
                                             shared_neighbor_counts,
                                             two_hop_counts)


@pytest.fixture(scope="module")
def edges(spark):
    rows = [("a", "r", "x", 2), ("b", "r", "x", 1), ("c", "r", "y", 1),
            ("a", "r", "y", 1), ("x", "r", "z", 1)]
    return spark.createDataFrame(
        rows, "src string, pred string, dst string, n_support long")


def test_degree_stats(spark, edges):
    d = {r.node: (r.out_deg, r.in_deg, r.n_support_out)
         for r in degree_stats(edges).collect()}
    assert d["a"] == (2, 0, 3)
    assert d["x"] == (1, 2, 1)
    assert d["z"] == (0, 1, 0)


def test_two_hop_and_shared_neighbors(spark, edges):
    th = {r.src: r.n_two_hop for r in two_hop_counts(edges).collect()}
    assert th == {"a": 1, "b": 1}          # a->x->z, b->x->z
    sn = {r.node: r.n_peers for r in
          shared_neighbor_counts(edges).collect()}
    assert sn == {"a": 2, "b": 1, "c": 1}  # via shared x / y


def test_hub_degree_guard_bounds_blowup(spark):
    """Pathological hub: one midpoint with 80 in- and 80 out-edges
    would emit 6400 intermediate rows (10^12 for a 10^6-degree node at
    crawl scale).  With the cap, the hub is anti-joined out of the
    self-join — paths through it vanish, the clean subgraph is exact,
    and the Observation reports exactly what was dropped."""
    from pyspark.sql import Observation

    hub_in = [(f"u{i}", "r", "HUB", 1) for i in range(80)]
    hub_out = [("HUB", "r", f"v{j}", 1) for j in range(80)]
    clean = [("p", "r", "m", 1), ("m", "r", "q", 1), ("m", "r", "p", 1)]
    edges = spark.createDataFrame(
        hub_in + hub_out + clean,
        "src string, pred string, dst string, n_support long")

    exact = {r.src: r.n_two_hop for r in two_hop_counts(edges).collect()}
    assert exact["u0"] == 80                      # through the hub

    obs = Observation("hub")
    capped = {r.src: r.n_two_hop
              for r in two_hop_counts(edges, max_hub_degree=10,
                                      hub_stats=obs).collect()}
    # hub paths gone, clean subgraph untouched (m: in 1, out 2 <= cap)
    assert "u0" not in capped
    assert capped == {"p": 2, "m": 1}             # p->m->{q,p}, m->p->m
    assert obs.get == {"n_hub_nodes": 1, "n_paths_dropped": 80 * 80}

    # shared-neighbor twin: everyone "shares" the hub; capped, only the
    # genuine pair survives
    sn_exact = {r.node: r.n_peers
                for r in shared_neighbor_counts(edges).collect()}
    assert sn_exact["u0"] == 79
    obs2 = Observation("hub2")
    sn = {r.node: r.n_peers
          for r in shared_neighbor_counts(edges, max_hub_degree=10,
                                          hub_stats=obs2).collect()}
    assert all(not n.startswith("u") for n in sn)
    assert obs2.get["n_hub_nodes"] == 1
    assert obs2.get["n_pairs_dropped"] == 80 * 80

    # cap high enough to keep everything == exact semantics
    assert {r.src: r.n_two_hop
            for r in two_hop_counts(edges, max_hub_degree=100)
            .collect()} == exact


def test_pagerank_invariants(spark, edges):
    pr = {r.node: r.rank for r in pagerank(edges, iters=10).collect()}
    assert set(pr) == {"a", "b", "c", "x", "y", "z"}
    assert abs(sum(pr.values()) - 1.0) < 1e-4      # probability conserved
    assert pr["x"] == pr["y"]     # symmetric inflow (a/2+b vs a/2+c)
    assert pr["x"] > pr["a"] > 0  # hubs outrank pure sources
    assert pr == {r.node: r.rank for r in
                  pagerank(edges, iters=10).collect()}  # deterministic


def test_pagerank_matches_python_replay(spark, edges):
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from tools.freeze_kg_oracle import py_pagerank

    expect = py_pagerank([(r.src, r.dst) for r in edges.collect()])
    got = {r.node: r.rank for r in pagerank(edges).collect()}
    assert got == expect


def test_pagerank_empty_edges_returns_empty(spark, edges):
    empty = edges.filter("src = 'nope'")
    assert pagerank(empty).collect() == []


def test_triangle_counts_known_graph(spark):
    """K4 on {a,b,c,d} (4 triangles, every node in 3, clustering 1.0)
    plus a pendant edge d-e (degree 4 at d drops its coefficient to
    0.5) and an isolated edge f-g (zero triangles, zero coefficient).
    Direction/multiplicity must not matter: edges arrive as a mix of
    orientations with one duplicate and one self-loop."""
    from mdscraper_spark.operators.graph import triangle_counts

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
          ("d", "b"), ("c", "d")]
    rows = ([(s, "r", d, 1) for s, d in k4]
            + [("b", "r", "a", 1),        # duplicate, reversed
               ("d", "r", "e", 1), ("f", "r", "g", 1),
               ("e", "r", "e", 1)])       # self-loop: ignored
    edges = spark.createDataFrame(
        rows, "src string, pred string, dst string, n_support long")
    got = {r.node: (r.degree, r.n_tri, r.clustering)
           for r in triangle_counts(edges).collect()}
    assert got["a"] == (3, 3, 1.0)
    assert got["b"] == (3, 3, 1.0)
    assert got["c"] == (3, 3, 1.0)
    assert got["d"] == (4, 3, 0.5)
    assert got["e"] == (1, 0, 0.0)
    assert got["f"] == (1, 0, 0.0)
    assert got["g"] == (1, 0, 0.0)


def test_triangle_counts_triangle_free(spark):
    """Bipartite graph: every node present, zero triangles."""
    from mdscraper_spark.operators.graph import triangle_counts

    rows = [(u, "r", v, 1) for u in ("a", "b") for v in ("x", "y")]
    edges = spark.createDataFrame(
        rows, "src string, pred string, dst string, n_support long")
    out = triangle_counts(edges).collect()
    assert len(out) == 4
    assert all(r.n_tri == 0 and r.clustering == 0.0 for r in out)


def test_khop_reach_chain_and_cycle(spark):
    from mdscraper_spark.operators.graph import khop_reach

    # hub (out-deg 3, the unique top seed) fans out to a,b,f; chain
    # hub->a->c->d->e (e is 4 hops: cut); cycle c->hub must not
    # re-enter the visited set
    edges = spark.createDataFrame(
        [("hub", "a"), ("hub", "b"), ("hub", "f"), ("a", "c"),
         ("c", "d"), ("d", "e"), ("c", "hub")],
        "src string, dst string")
    got = {r.node: r.min_dist
           for r in khop_reach(edges, k=3, n_seeds=1).collect()}
    assert got == {"hub": 0, "a": 1, "b": 1, "f": 1, "c": 2, "d": 3}


def test_khop_reach_seed_selection_deterministic(spark):
    from mdscraper_spark.operators.graph import khop_reach

    # x and y both have out-degree 2: tie broken by node id -> x seeds
    edges = spark.createDataFrame(
        [("x", "p"), ("x", "q"), ("y", "r"), ("y", "s")],
        "src string, dst string")
    got = {r.node: r.min_dist
           for r in khop_reach(edges, k=2, n_seeds=1).collect()}
    assert got == {"x": 0, "p": 1, "q": 1}


def test_khop_reach_min_dist_over_multiple_paths(spark):
    from mdscraper_spark.operators.graph import khop_reach

    # z reachable in 1 hop directly and in 2 via m: min wins
    edges = spark.createDataFrame(
        [("s", "z"), ("s", "m"), ("m", "z"), ("s", "t"), ("s", "u")],
        "src string, dst string")
    got = {r.node: r.min_dist
           for r in khop_reach(edges, k=3, n_seeds=1).collect()}
    assert got["z"] == 1 and got["m"] == 1


def test_khop_reach_validation(spark):
    from mdscraper_spark.operators.graph import khop_reach
    import pytest

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        khop_reach(edges, k=0)


def test_hits_star_graph_known_values(spark):
    from mdscraper_spark.operators.graph import hits

    # two hubs pointing at one shared authority + a private one:
    # classic HITS fixpoint is computable by hand after normalization
    edges = spark.createDataFrame(
        [("h1", "a1"), ("h1", "a2"), ("h2", "a1")],
        "src string, dst string")
    got = {r.node: (r.hub, r.authority) for r in hits(edges).collect()}
    # authorities: a1 gets both hubs, a2 one; hubs: h1 > h2
    assert got["a1"][1] > got["a2"][1] > 0.0
    assert got["h1"][0] > got["h2"][0] > 0.0
    assert got["a1"][0] == 0.0 and got["h1"][1] == 0.0
    # L1 normalization: hub and authority columns each sum to ~1
    assert abs(sum(v[0] for v in got.values()) - 1.0) < 1e-6
    assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-6


def test_hits_matches_python_replay(spark):
    import random
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.freeze_kg_oracle import py_hits
    from mdscraper_spark.operators.graph import hits

    rng = random.Random("hits-fuzz-r5")
    nodes = [f"v{i}" for i in range(18)]
    edges = sorted({(nodes[min(rng.randrange(18), rng.randrange(18))],
                     nodes[rng.randrange(18)]) for _ in range(50)})
    df = spark.createDataFrame(edges, "src string, dst string")
    expect = py_hits(edges)
    got = {r.node: (r.hub, r.authority) for r in hits(df).collect()}
    assert got == expect


def test_hits_empty_edges(spark):
    from mdscraper_spark.operators.graph import hits

    e = spark.createDataFrame([], "src string, dst string")
    assert hits(e).count() == 0


def test_entity_cards_digest_and_counts(spark):
    from mdscraper_spark.operators.graph import entity_cards

    rows = [("A", "works_for", "X", 3), ("A", "based_in", "Y", 1),
            ("A", "works_for", "Z", 2), ("B", "based_in", "Y", 1)]
    edges = spark.createDataFrame(
        rows, "src string, pred string, dst string, n_support long")
    got = {r.node: (r.n_facts, r.n_preds, r.card)
           for r in entity_cards(edges).collect()}
    assert got["A"] == (3, 2,
                        "based_in -> Y (1); works_for -> X (3); "
                        "works_for -> Z (2)")
    assert got["B"] == (1, 1, "based_in -> Y (1)")
    # pure-sink nodes (no outgoing facts) have no card row
    assert set(got) == {"A", "B"}


def test_snapshot_diff_all_statuses(spark):
    from mdscraper_spark.operators.graph import snapshot_diff

    old = spark.createDataFrame(
        [("a", "p", "b", 3), ("a", "p", "c", 2), ("x", "q", "y", 1)],
        "src string, pred string, dst string, n_support long")
    new = spark.createDataFrame(
        [("a", "p", "b", 3), ("a", "p", "c", 5), ("m", "q", "n", 1)],
        "src string, pred string, dst string, n_support long")
    got = {(r.src, r.pred, r.dst): (r.n_support_old, r.n_support_new,
                                    r.status)
           for r in snapshot_diff(old, new).collect()}
    assert got[("a", "p", "b")] == (3, 3, "kept")
    assert got[("a", "p", "c")] == (2, 5, "changed")
    assert got[("x", "q", "y")] == (1, 0, "removed")
    assert got[("m", "q", "n")] == (0, 1, "added")
    assert len(got) == 4
