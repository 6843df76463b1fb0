"""Graph queries over the materialized KG (kg_edges: src, pred, dst,
n_support) — the read side of the knowledge graph: degree statistics,
multi-hop traversal, and PageRank.

Scale shapes:
* degree stats — one shuffle (groupBy node), map-side combined;
* two-hop — one self-equi-join on the hop node + distinct agg; at
  10^12 edges this is the classic join-on-dst≡src plan that bucketing
  on the node id makes exchange-free (the kg_edges table is written
  bucketed by canon_id for exactly this reason, SURVEY §2.I6);
* PageRank — the standard iterative join plan: contributions =
  edges ⋈ ranks (re-using the edge partitioning every round), one
  groupBy(dst) sum per iteration, `localCheckpoint` every few rounds
  to cut lineage (same discipline as connected_components).

Every result is rounded for cross-engine hash comparison; iteration
counts are fixed so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_stats(edges: DataFrame) -> DataFrame:
    """(node, out_deg, in_deg, n_support_out): per-node degree table.
    Out/in degrees computed in one pass each, outer-merged."""
    out_d = (edges.groupBy(F.col("src").alias("node"))
             .agg(F.count(F.lit(1)).alias("out_deg"),
                  F.sum("n_support").alias("n_support_out")))
    in_d = (edges.groupBy(F.col("dst").alias("node"))
            .agg(F.count(F.lit(1)).alias("in_deg")))
    return (out_d.join(in_d, "node", "full_outer")
            .select("node",
                    F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                    F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
                    F.coalesce("n_support_out", F.lit(0))
                    .alias("n_support_out")))


def component_sizes(edges: DataFrame) -> DataFrame:
    """(comp_id, n_nodes, n_edges): weakly-connected-component census
    of the KG — the graph-health row a production build watches (a
    collapsing giant component means over-merged entities; a dust of
    singleton pairs means linking recall fell off a cliff).

    ``comp_id`` is the component's minimum node id under UTF8 binary
    order — byte-identical to ``connected_components``' canonical
    labels, so the census is directly joinable against the canonical
    map.  Scale shape: CC reuses the size-gated union-find / hash-
    partitioned min-label propagation from ``operators.kg`` (the same
    code path the canonicalization stage runs at 10^12 documents);
    the census itself is one groupBy(canon) for node counts plus one
    join+groupBy for edge counts, with the canonical map broadcast
    only when the size gate proved it driver-sized."""
    from mdscraper_spark.operators.kg import (_maybe_broadcast,
                                              connected_components)

    cmap = connected_components(edges.select("src", "dst"))
    nodes = (cmap.groupBy(F.col("canon_id").alias("comp_id"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))
    e_cnt = (edges.join(_maybe_broadcast(cmap),
                        edges.src == cmap.node_id)
             .groupBy(F.col("canon_id").alias("comp_id"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
    return (nodes.join(e_cnt, "comp_id", "left")
            .select("comp_id", "n_nodes",
                    F.coalesce(F.col("n_edges"), F.lit(0))
                    .cast("long").alias("n_edges")))


def hub_hop_nodes(edges: DataFrame, max_hub_degree: int) -> DataFrame:
    """(node, in_deg, out_deg): hop nodes whose fan-in or fan-out
    exceeds ``max_hub_degree`` — the nodes whose in×out intermediate
    blow-up the self-equi-join traversals must not pay.  One map-side-
    combined count pass per direction; only nodes with BOTH in- and
    out-edges can ever be a two-hop midpoint, so the inner join keeps
    the hub set tiny (it is a top-of-the-degree-distribution set by
    construction — broadcastable at any graph size)."""
    in_d = (edges.groupBy(F.col("dst").alias("node"))
            .agg(F.count(F.lit(1)).alias("in_deg")))
    out_d = (edges.groupBy(F.col("src").alias("node"))
             .agg(F.count(F.lit(1)).alias("out_deg")))
    return (in_d.join(out_d, "node")
            .filter((F.col("in_deg") > max_hub_degree)
                    | (F.col("out_deg") > max_hub_degree)))


def two_hop_counts(edges: DataFrame,
                   max_hub_degree: int | None = None,
                   hub_stats=None) -> DataFrame:
    """(src, n_two_hop): distinct nodes reachable in exactly two hops
    (src -> mid -> dst, dst may equal src — pure path counting keeps
    the semantics engine-portable).  Empty on a strictly bipartite
    graph; see shared_neighbor_counts for the traversal that is
    non-trivial there.

    Hub guard: the self-equi-join on ``mid`` emits in(mid)×out(mid)
    rows per midpoint — one celebrity node with 10^6 neighbors is
    10^12 intermediate rows.  With ``max_hub_degree`` set, midpoints
    whose fan-in or fan-out exceeds it are dropped from the join by a
    broadcast anti-join (count pass first — the same stop-shingle
    pattern as dedup.ngram_jaccard_pairs), bounding the per-key
    intermediate volume at max_hub_degree².  Paths THROUGH dropped
    hubs are not counted — the documented stop-hub trade-off, replayed
    identically by the SQL oracle.  Pass an ``Observation`` as
    ``hub_stats`` to record n_hub_nodes / n_paths_dropped on the next
    action."""
    a = edges.select(F.col("src"), F.col("dst").alias("mid"))
    b = edges.select(F.col("src").alias("mid"), F.col("dst"))
    if max_hub_degree is not None:
        hubs = hub_hop_nodes(edges, max_hub_degree)
        if hub_stats is not None:
            hubs = hubs.observe(
                hub_stats,
                F.count(F.lit(1)).alias("n_hub_nodes"),
                F.coalesce(F.sum(F.col("in_deg") * F.col("out_deg")),
                           F.lit(0)).alias("n_paths_dropped"))
        # eager checkpoint: the (tiny) hub list is computed ONCE — it
        # feeds two anti-joins, and the Observation must fire exactly
        # once (a duplicated observed node breaks metric collection)
        stop = hubs.select(F.col("node").alias("mid")).localCheckpoint()
        # anti-join BOTH sides: one side would suffice semantically
        # (an inner join can't match a pruned key), but the hub rows
        # ARE the skewed mass — pruning b too keeps them out of the
        # join's shuffle/probe instead of shipping them to find no
        # partner.  The SQL oracle replays the equivalent one-sided
        # filter.
        a = a.join(F.broadcast(stop), "mid", "left_anti")
        b = b.join(F.broadcast(stop), "mid", "left_anti")
    return (a.join(b, "mid")
            .groupBy("src")
            .agg(F.countDistinct("dst").alias("n_two_hop")))


def shared_neighbor_counts(edges: DataFrame,
                           max_hub_degree: int | None = None,
                           hub_stats=None) -> DataFrame:
    """(node, n_peers): distinct OTHER sources sharing at least one
    out-neighbor (on the KG: co-workers via a common employer).  Same
    self-equi-join-on-node shape as two-hop — the plan that bucketing
    kg_edges on the node id makes exchange-free at 10^12 edges.

    Hub guard: the join key is the shared neighbor ``dst``, so the
    blow-up is in_deg(dst)² per neighbor.  With ``max_hub_degree``
    set, neighbors with more than that many in-edges are anti-joined
    out before pairing (count pass + broadcast anti-join, logged via
    ``hub_stats``): peers who ONLY share a mega-hub neighbor (everyone
    "shares" Wikipedia) are not counted — the standard stop-hub
    trade-off, replayed identically by the SQL oracle."""
    a = edges.select(F.col("src").alias("node"), F.col("dst"))
    b = edges.select(F.col("src").alias("peer"), F.col("dst"))
    if max_hub_degree is not None:
        hubs = (edges.groupBy("dst")
                .agg(F.count(F.lit(1)).alias("in_deg"))
                .filter(F.col("in_deg") > max_hub_degree))
        if hub_stats is not None:
            hubs = hubs.observe(
                hub_stats,
                F.count(F.lit(1)).alias("n_hub_nodes"),
                F.coalesce(F.sum(F.col("in_deg") * F.col("in_deg")),
                           F.lit(0)).alias("n_pairs_dropped"))
        # eager checkpoint, same reason as two_hop_counts: one compute
        # of the hub list, one firing of the Observation
        stop = hubs.select("dst").localCheckpoint()
        a = a.join(F.broadcast(stop), "dst", "left_anti")
        b = b.join(F.broadcast(stop), "dst", "left_anti")
    return (a.join(b, "dst")
            .filter(F.col("node") != F.col("peer"))
            .groupBy("node")
            .agg(F.countDistinct("peer").alias("n_peers")))


def pagerank(edges: DataFrame, iters: int = 10,
             damping: float = 0.85) -> DataFrame:
    """(node, rank): PageRank with uniform teleport over the node set,
    dangling mass redistributed uniformly, fixed iteration count.

    DataFrame loop: out-degrees computed once; each round joins ranks
    to edges on src (the reused partitioning), sums contributions by
    dst, adds teleport + dangling mass.  The per-round inflow table
    (O(#nodes)) is localCheckpointed, which both truncates lineage
    every iteration and lets the dangling mass come from ONE cheap
    aggregate over it — dangling = 1 - Σinflow, since rank mass is
    conserved (Σranks = 1 every round) and exactly the non-dangling
    mass flows through edges.  Ranks are rounded only at the END so
    iteration math matches the oracle's double arithmetic.
    """
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # edge list with per-edge weight 1/deg(src), reused every round
    weighted = (edges.select("src", "dst")
                .join(out_deg, "src")
                .select("src", "dst", (F.lit(1.0) / F.col("deg"))
                        .alias("w"))
                .localCheckpoint())

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (weighted.join(ranks, weighted.src == ranks.node)
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") * F.col("w")).alias("c")))
        inflow = (contrib.groupBy("node").agg(F.sum("c").alias("inflow"))
                  .localCheckpoint())
        dangling = 1.0 - (inflow.agg(F.coalesce(F.sum("inflow"),
                                                F.lit(0.0))).first()[0])
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (nodes.join(inflow, "node", "left")
                 .select("node",
                         (F.lit(base) + F.lit(damping)
                          * F.coalesce("inflow", F.lit(0.0)))
                         .alias("rank")))
    # round 6 (not more): per-iteration double sums are order-dependent
    # at ~1e-16 and 10 rounds amplify to ~1e-12 vs the oracle's replay
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, degree, n_tri, clustering): per-node triangle counts and
    local clustering coefficient over the UNDIRECTED simple graph
    induced by ``edges`` (src, dst) — direction, predicates and
    multiplicity are dropped; self-loops are ignored.

    Scale shape — degree-ordered orientation (the Schank/Wagner trick
    every distributed triangle counter uses): each undirected edge is
    oriented from its lower-(degree, id) endpoint to the higher one,
    which caps every node's ORIENTED out-degree at O(sqrt(m)).  The
    wedge self-join therefore emits at most sum(out_deg^2) = O(m^1.5)
    candidate wedges TOTAL regardless of hub skew — a celebrity node
    with 10^6 neighbors contributes wedges only through its (tiny)
    oriented out-list, not its fan-in.  Three shuffles: degree count,
    wedge self-join on the pivot, closing-edge join; each triangle is
    enumerated exactly once (its minimum-(degree, id) corner is the
    pivot).  At 10^12 edges the edge table bucketed by node id makes
    the self-join exchange-free, same as two_hop_counts.
    """
    und = (edges.select(F.least("src", "dst").alias("u"),
                        F.greatest("src", "dst").alias("v"))
           .filter(F.col("u") != F.col("v"))
           .distinct())
    deg = (und.select(F.col("u").alias("node"))
           .unionAll(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    # orient low-(degree, id) -> high-(degree, id); keep the head's
    # (degree, id) key so wedge endpoints can be ordered without a
    # second degree join
    lower_first = (F.col("du") < F.col("dv")) | \
        ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    o = (und.join(du, "u").join(dv, "v")
         .select(F.when(lower_first, F.col("u")).otherwise(F.col("v"))
                 .alias("s"),
                 F.when(lower_first, F.col("v")).otherwise(F.col("u"))
                 .alias("t"),
                 F.when(lower_first, F.col("dv")).otherwise(F.col("du"))
                 .alias("dt")))
    a = o.select(F.col("s"), F.col("t").alias("t1"), F.col("dt").alias("d1"))
    b = o.select(F.col("s"), F.col("t").alias("t2"), F.col("dt").alias("d2"))
    wedges = (a.join(b, "s")
              .filter((F.col("d1") < F.col("d2"))
                      | ((F.col("d1") == F.col("d2"))
                         & (F.col("t1") < F.col("t2")))))
    closing = o.select(F.col("s").alias("t1"), F.col("t").alias("t2"))
    tris = wedges.join(closing, ["t1", "t2"]).select("s", "t1", "t2")
    per_node = (tris.select(F.explode(F.array("s", "t1", "t2"))
                            .alias("node"))
                .groupBy("node").agg(F.count(F.lit(1)).alias("n_tri")))
    return (deg.join(per_node, "node", "left")
            .select("node", "degree",
                    F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
                    F.when(F.col("degree") < 2, F.lit(0.0))
                    .otherwise(F.round(
                        2.0 * F.coalesce("n_tri", F.lit(0))
                        / (F.col("degree") * (F.col("degree") - 1)), 6))
                    .alias("clustering")))


def khop_reach(edges: DataFrame, k: int = 3,
               n_seeds: int = 5) -> DataFrame:
    """(node, min_dist): every node reachable in at most ``k`` directed
    hops from the ``n_seeds`` highest-out-degree nodes (ties broken by
    node id ascending — deterministic in any engine with binary string
    order), with the exact minimum hop distance; seeds themselves are
    dist 0.  The bounded-BFS read query a KG serves constantly:
    "everything within 3 hops of these hub entities".

    Scale shape — proper frontier BFS, not path enumeration: each of
    the k rounds is ONE hash join frontier ⋈ edges on src (the edge
    table's bucket key, so exchange-free on a bucketed warehouse
    table), a distinct on the (small) next frontier, and an anti-join
    against the visited set, which keeps every node in exactly one
    level — the visited anti-join is what bounds the work at O(edges
    within k hops) instead of O(paths), the blow-up that kills naive
    transitive-closure plans on cyclic graphs.  The frontier and
    visited sets start seed-sized and are broadcast while small (AQE
    converts the joins at runtime).  k is a fixed small constant so
    the loop is unrolled lineage, no checkpoint needed.

    The SQL oracle is the opposite plan on purpose: DuckDB's recursive
    CTE ENUMERATES all ≤k-hop paths and takes min(dist) — exact but
    exponential in path count, fine at fixture scale, and a genuinely
    independent derivation of the same answer."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    out_d = (edges.groupBy(F.col("src").alias("node"))
             .agg(F.count(F.lit(1)).alias("out_deg")))
    seeds = (out_d.orderBy(F.col("out_deg").desc(), F.col("node").asc())
             .limit(n_seeds).select("node"))
    e = edges.select("src", "dst")
    visited = seeds.select("node", F.lit(0).alias("min_dist"))
    frontier = seeds
    for dist in range(1, k + 1):
        nxt = (frontier.join(e, frontier["node"] == e["src"])
               .select(F.col("dst").alias("node"))
               .distinct()
               .join(visited.select("node"), "node", "left_anti"))
        visited = visited.unionByName(
            nxt.select("node", F.lit(dist).alias("min_dist")))
        frontier = nxt
    return visited


def hits(edges: DataFrame, iters: int = 10) -> DataFrame:
    """(node, hub, authority): Kleinberg's HITS with sum (L1)
    normalization and a fixed iteration count — the query-independent
    companion of PageRank (authorities = pointed-at-by-good-hubs,
    hubs = pointing-at-good-authorities; on the mention co-reference
    KG's star shapes orgs surface as authorities and persons as hubs,
    structure PageRank's single score conflates).  Edge multiplicity
    follows the input verbatim (two predicates between one pair count
    twice), matching the frozen single-threaded replay.

    DataFrame loop, same discipline as ``pagerank``: the edge list is
    localCheckpointed once and reused as the join partitioning every
    round; each half-step is ONE hash join + map-side-combinable sum,
    the normalizer is a bounded driver scalar off the O(#nodes)
    checkpointed score table, and scores are rounded only at the end
    so iteration math matches the oracle's double arithmetic."""
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    if nodes.count() == 0:
        return nodes.select("node", F.lit(0.0).alias("hub"),
                            F.lit(0.0).alias("authority"))
    e = edges.select("src", "dst").localCheckpoint()
    hub = nodes.select("node", F.lit(1.0).alias("s"))
    auth = nodes.select("node", F.lit(1.0).alias("s"))

    def _halfstep(scores: DataFrame, key: str, out: str) -> DataFrame:
        """new score(out-side) = sum of `scores` over edges, L1-
        normalized; absent nodes keep 0."""
        agg = (e.join(scores, e[key] == scores["node"])
               .groupBy(F.col(out).alias("node"))
               .agg(F.sum("s").alias("raw"))
               .localCheckpoint())
        total = agg.agg(F.coalesce(F.sum("raw"), F.lit(0.0))).first()[0]
        if total == 0.0:
            return nodes.select("node", F.lit(0.0).alias("s"))
        return (nodes.join(agg, "node", "left")
                .select("node", (F.coalesce("raw", F.lit(0.0))
                                 / F.lit(total)).alias("s")))

    for _ in range(iters):
        auth = _halfstep(hub, "src", "dst")      # a(v) = Σ h(u), u→v
        hub = _halfstep(auth, "dst", "src")      # h(u) = Σ a(v), u→v
    return (nodes
            .join(hub.select("node", F.col("s").alias("hub")), "node")
            .join(auth.select("node", F.col("s").alias("authority")),
                  "node")
            .select("node", F.round("hub", 6).alias("hub"),
                    F.round("authority", 6).alias("authority")))


def entity_cards(edges: DataFrame) -> DataFrame:
    """(node, n_facts, n_preds, card): the subject-star summary a KG
    serves for entity pages — every outgoing fact of a node folded
    into one deterministic digest string ("pred -> dst (n)" segments
    joined by "; " in (pred, dst) order), plus fact/predicate counts.

    Scale shape: ONE map-side-combinable groupBy on the edge bucket
    key (src) — collect_list is bounded per node by its out-degree,
    the quantity hub-capped traversals already treat as the skew axis;
    ordering happens inside the per-group array (sort_array), never as
    a corpus-wide sort.  The SQL twin is string_agg ORDER BY — the
    same fold expressed relationally."""
    seg = F.concat(F.col("pred"), F.lit(" -> "), F.col("dst"),
                   F.lit(" ("), F.col("n_support").cast("string"),
                   F.lit(")"))
    return (edges
            .select(F.col("src").alias("node"),
                    F.col("pred"),
                    F.struct("pred", "dst").alias("k"),
                    seg.alias("seg"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("n_facts"),
                 F.size(F.array_distinct(F.collect_list("pred")))
                  .cast("long").alias("n_preds"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct(F.col("k"), F.col("seg")))),
                         lambda x: x["seg"]),
                     "; ").alias("card")))


def snapshot_diff(old_edges: DataFrame,
                  new_edges: DataFrame) -> DataFrame:
    """(src, pred, dst, n_support_old, n_support_new, status): the
    nightly KG diff — one FULL OUTER hash join on the triple key.
    status: 'added' (new only), 'removed' (old only), 'changed'
    (support count moved), 'kept'.  Note canonicalization makes this
    non-monotone on purpose: dropping documents can re-split a
    connected component, so edges can be ADDED by a corpus shrink —
    exactly the regression this diff exists to surface.

    Scale shape: both sides arrive bucketed by the edge key from the
    warehouse (exchange-free SMJ there); here it is one hash join,
    no shuffle beyond the join itself."""
    o = old_edges.select("src", "pred", "dst",
                         F.col("n_support").alias("n_support_old"))
    n = new_edges.select("src", "pred", "dst",
                         F.col("n_support").alias("n_support_new"))
    j = o.join(n, ["src", "pred", "dst"], "full_outer")
    status = (F.when(F.col("n_support_old").isNull(), F.lit("added"))
              .when(F.col("n_support_new").isNull(), F.lit("removed"))
              .when(F.col("n_support_old") != F.col("n_support_new"),
                    F.lit("changed"))
              .otherwise(F.lit("kept")))
    return j.select(
        "src", "pred", "dst",
        F.coalesce("n_support_old", F.lit(0)).cast("long")
         .alias("n_support_old"),
        F.coalesce("n_support_new", F.lit(0)).cast("long")
         .alias("n_support_new"),
        status.alias("status"))
