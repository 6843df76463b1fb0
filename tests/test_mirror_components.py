"""Round-5 tail operators: cross-source mirror detection
(mirror_shingle_overlap) and the connected-component census
(component_sizes)."""

from pyspark.sql import functions as F

from mdscraper_spark.operators.dedup import mirror_shingle_overlap
from mdscraper_spark.operators.graph import component_sizes


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string")


def test_full_mirror_scores_one(spark):
    """A host that carries an exact copy of another host's document
    scores overlap 1.0; an unrelated host shares nothing."""
    body = "alpha beta gamma delta epsilon zeta eta theta"
    df = _docs(spark, [
        (0, body, "origin"),
        (1, body + " iota kappa", "mirror"),     # superset page
        (2, "one two three four five six seven", "other"),
    ])
    got = {(r.s1, r.s2): (r.n_shared, r.overlap)
           for r in mirror_shingle_overlap(df).collect()}
    # origin has 4 distinct 5-gram shingles, all present on mirror
    assert got == {("mirror", "origin"): (4, 1.0)}


def test_boilerplate_cap_drops_viral_shingles(spark):
    """A shingle present on more sources than the cap (cookie-banner
    text) must not manufacture mirror pairs."""
    banner = "this site uses cookies to improve experience"
    rows = [(i, banner + f" unique{i} filler{i} words{i} here{i} pad{i}",
             f"host{i}") for i in range(12)]
    df = _docs(spark, rows)
    # cap below the 12 hosts: banner shingles are boilerplate, every
    # remaining shingle is host-unique -> no pairs at all
    assert mirror_shingle_overlap(df, max_sources=8).count() == 0
    # with the cap above the host count the banner pairs everyone
    n_uncapped = mirror_shingle_overlap(df, max_sources=64).count()
    assert n_uncapped == 12 * 11 // 2


def test_mirror_nulls_and_short_docs_are_inert(spark):
    df = _docs(spark, [
        (0, None, "a"),
        (1, "too short", "b"),
        (2, "one two three four five", "c"),
        (3, "one two three four five", "d"),
    ])
    got = {(r.s1, r.s2): r.n_shared
           for r in mirror_shingle_overlap(df).collect()}
    assert got == {("c", "d"): 1}


def test_component_sizes_hand_graph(spark):
    """Two components: {a,b,x,y} with 3 edge rows (multi-pred counted)
    and {p,q} with 1; comp_id is the component min node id."""
    edges = spark.createDataFrame(
        [("a", "r1", "x", 1), ("a", "r2", "x", 1), ("b", "r1", "y", 1),
         ("x", "r1", "y", 1), ("p", "r1", "q", 1)],
        "src string, pred string, dst string, n_support long")
    got = {r.comp_id: (r.n_nodes, r.n_edges)
           for r in component_sizes(edges).collect()}
    assert got == {"a": (4, 4), "p": (2, 1)}


def test_component_sizes_local_and_distributed_paths_agree(spark):
    """The census must be byte-identical across the size-gated local
    union-find and the distributed min-label propagation."""
    from mdscraper_spark.operators import graph as graph_mod
    from mdscraper_spark.operators import kg as kg_ops

    edges = spark.createDataFrame(
        [(f"n{i}", "r", f"n{i+1}", 1) for i in range(0, 40, 2)]
        + [("n1", "r", "n2", 1)],     # stitches two chains
        "src string, pred string, dst string, n_support long")

    def census(threshold):
        orig = kg_ops.connected_components

        def patched(e, **kw):
            kw["local_solve_threshold"] = threshold
            return orig(e, **kw)

        kg_ops.connected_components = patched
        try:
            return sorted((r.comp_id, r.n_nodes, r.n_edges)
                          for r in component_sizes(edges).collect())
        finally:
            kg_ops.connected_components = orig

    assert census(2_000_000) == census(0)


def test_mirror_plan_shape(spark):
    """Every join must stay keyed (cap count-join, pair self-join,
    totals joins — all equi-joins on shingle/source); no cartesian
    expansion and no driver-side set anywhere.  The boilerplate cap
    deliberately does NOT broadcast: at web scale the hot-shingle set
    is most of the common-phrase vocabulary, not a driver-sized top-N
    (unlike ngram_jaccard's Zipf-top stop-shingles)."""
    df = _docs(spark, [(i, f"one two three four five six{i}", f"h{i}")
                       for i in range(4)])
    plan = mirror_shingle_overlap(df)._jdf.queryExecution() \
                                     .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
