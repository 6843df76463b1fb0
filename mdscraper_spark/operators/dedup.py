"""Deduplication operators: exact, MinHash(+LSH), SimHash, n-gram Jaccard.

Engine-portable hashing: every hash is md5 of a string (identical bytes
in Spark and DuckDB), and every "min over hashes" is a lexicographic
min over hex strings — so signatures are bit-identical across engines
and across partitionings, with no dependence on xxhash/murmur
implementations.

Scale shapes:
* exact dedup — one shuffle (groupBy content hash), map-side combine;
* MinHash — shingle explode is narrow; the signature is a groupBy on
  doc_id (shuffle bounded by #docs, not #shingles); LSH pairing
  self-joins on (band, signature) — bucket sizes bound the pair
  blow-up, the classic LSH trade-off;
* SimHash — explode tokens -> per-bit majority vote via SUM, one
  shuffle on doc_id;
* n-gram Jaccard — candidate pruning by (lang, length-bucket) before
  the pair join keeps the quadratic term inside small groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BANDS = 4
SIMHASH_BITS = 16


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def ws_strip(col: Column) -> Column:
    """Strip ALL leading/trailing whitespace.  NOT F.trim: Spark (and
    DuckDB) trim removes only spaces, so a newline-leading doc would
    split into a phantom empty first token, inflating token counts and
    polluting shingles (caught by differential fuzz)."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def sql_ws_strip(col: str) -> str:
    """DuckDB twin of ws_strip — THE canonical encoding; every oracle
    that tokenizes must build on this (a stale space-only trim twin is
    exactly how the phantom-token bug slipped in)."""
    return f"regexp_replace({col}, '^\\s+|\\s+$', '', 'g')"


def sql_tokens(col: str) -> str:
    """DuckDB twin of tokenize()."""
    return f"regexp_split_to_array({sql_ws_strip(col)}, '\\s+')"


def tokenize(col: Column) -> Column:
    """Whitespace token array.  Materialize this as its OWN projection
    before shingling: higher-order functions are interpreted (no
    codegen subexpression elimination), so an inline split() inside the
    transform lambda re-splits the text for every element_at — O(words
    x shingles) per doc instead of O(words)."""
    return F.split(ws_strip(col), r"\s+")


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles over a BOUND token-array column."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    shingle = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + F.lit(j + 1))
                                           for j in range(k)])
    return F.when(n >= k,
                  F.array_distinct(F.transform(idx, shingle))) \
            .otherwise(F.array())


def word_shingles(col: Column, k: int = 3) -> Column:
    """One-shot shingles from raw text.  Convenience/compat path — for
    hot paths prefer tokenize() in its own select, then
    shingles_from_tokens() (see tokenize docstring)."""
    return shingles_from_tokens(tokenize(col), k)


SQL_TOKENS_CTE = "regexp_split_to_array(regexp_replace({col}, '^\\s+|\\s+$', '', 'g'), '\\s+')"  # legacy alias of sql_tokens


def sql_word_shingles(toks_expr: str, k: int = 3) -> str:
    """DuckDB twin of word_shingles over a token-array expression
    (pass e.g. ``t.toks`` from a CTE that computed the token array)."""
    parts = " || ' ' || ".join(f"{toks_expr}[i+{j}]" for j in range(k))
    return (f"(CASE WHEN len({toks_expr}) >= {k} THEN "
            f"list_distinct([{parts} "
            f"FOR i IN range(1, len({toks_expr}) - {k} + 2)]) "
            f"ELSE [] END)")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(content_hash, n_docs, min_doc_id): group identical texts."""
    return (df.withColumn("content_hash", F.md5(F.col(text_col)))
            .groupBy("content_hash")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min(id_col).alias("min_doc_id")))


# ---------------------------------------------------------------------------
# MinHash signatures + LSH candidate pairs
# ---------------------------------------------------------------------------

def _rot_hex(h: Column, band: int) -> Column:
    """Rotate a 32-hex-digit string left by 8*band chars — a bijection
    on hash values, so ``min`` over each rotation is an independent
    min-hash band derived from ONE md5 per shingle."""
    if not 0 <= band < 4:
        # rotation by 32 chars is the identity: band 4 would silently
        # duplicate band 0's signature, making b-band LSH behave as
        # (b mod 4) bands while the caller tunes recall for b
        raise ValueError(f"md5 supports at most 4 rotation bands, got "
                         f"band index {band}")
    if band == 0:
        return h
    cut = 8 * band
    return F.concat(F.substring(h, cut + 1, 32 - cut), F.substring(h, 1, cut))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       n_bands: int = N_BANDS) -> DataFrame:
    """(doc_id, band, sig): band b's signature is the min over shingles
    of rot_b(md5(shingle)), rot_b = rotate the hex string by 8*b chars.

    Scale shape: one md5 per shingle (no per-band row multiplication),
    one groupBy(doc_id) whose 4 mins are map-side-combinable partials —
    the shuffle carries #docs rows, not #shingles x #bands.
    """
    shingled = (df.select(F.col(id_col).alias("doc_id"),
                          tokenize(F.col(text_col)).alias("toks"))
                .select("doc_id",
                        F.explode(F.transform(
                            shingles_from_tokens(F.col("toks")), F.md5))
                        .alias("h")))
    mins = shingled.groupBy("doc_id").agg(
        *[F.min(_rot_hex(F.col("h"), b)).alias(f"sig{b}")
          for b in range(n_bands)])
    stack = ", ".join(f"{b}, sig{b}" for b in range(n_bands))
    return mins.selectExpr(
        "doc_id", f"stack({n_bands}, {stack}) AS (band, sig)")


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) sharing at least one band signature."""
    a = signatures.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = signatures.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (a.join(b, ["band", "sig"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): per-bit majority over token md5 bits.

    Bit b of a token = hex digit b of md5(token) >= '8' (top bit of the
    nibble) — portable to SQL via substr comparison on the hex string.
    """
    if not 1 <= bits <= 32:
        # md5 has 32 hex digits; substring past the end returns '' and
        # always votes -1 — bits 32+ would be constant zero, silently
        # halving the effective signature width
        raise ValueError(f"simhash bits must be in 1..32, got {bits}")
    toks = df.select(F.col(id_col).alias("doc_id"),
                     F.explode(tokenize(F.col(text_col))).alias("tok"))
    toks = toks.withColumn("h", F.md5("tok"))
    votes = [
        F.sum(F.when(F.substring("h", b + 1, 1) >= "8", 1).otherwise(-1))
        .alias(f"v{b}")
        for b in range(bits)
    ]
    voted = toks.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = bit if sim is None else (sim + bit)
    return voted.select("doc_id", sim.cast("long").alias("simhash"))


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs
# ---------------------------------------------------------------------------

MAX_POSTING = 64  # stop-shingle cap: a shingle shared by more docs than
                  # this carries no near-dup signal (navigation chrome,
                  # boilerplate) but would emit k(k-1)/2 pairs from one
                  # posting list — at crawl scale a single hot shingle
                  # can hold millions of docs


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", lang_col: str = "lang",
                        threshold: float = 0.2,
                        bucket_chars: int = 100,
                        max_posting: int = MAX_POSTING,
                        stop_stats=None) -> DataFrame:
    """Near-dup pairs by 3-gram Jaccard within (lang, length-bucket)
    candidate groups.  jaccard = |A∩B| / (|A| + |B| - |A∩B|), rounded
    to 6 places for cross-engine hash equality.

    Scale shape (vs the naive shingle self-join): the exploded shingle
    stream is shuffled keyed on (lang, lbucket, xxhash64(shingle));
    singleton shingles — the overwhelming majority of text — are
    dropped before any pairing, and candidate pairs are generated
    narrowly from each posting list, so only genuine co-occurrences
    reach the final (doc_a, doc_b) aggregate.  The 64-bit shingle hash
    shrinks shuffle keys; a cross-doc collision would need ~2^64
    shingles to matter.

    Stop-shingle cap: shingles held by more than ``max_posting`` docs
    within a candidate group are dropped BEFORE the posting-list
    collect_list (a cheap map-side-combined count pass finds them; the
    hot-key set is tiny by construction, so it broadcast-anti-joins the
    stream).  This bounds both the k(k-1)/2 pair blow-up and the
    collect_list memory of hot keys.  Dropped shingles lower the
    intersection count of pairs that also share signal shingles — the
    standard stop-shingle trade-off, replayed identically by the SQL
    oracle.  Pass a ``pyspark.sql.Observation`` as ``stop_stats`` to
    record n_stop_shingles / n_postings_dropped on the next action.
    """
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        (F.floor(F.length(text_col) / bucket_chars)).cast("int").alias("lbucket"),
        tokenize(F.col(text_col)).alias("toks"))
    docs = docs.select(
        "doc_id", "lang", "lbucket",
        shingles_from_tokens(F.col("toks")).alias("shingles"))
    docs = docs.withColumn("n_sh", F.size("shingles"))
    ex = docs.select("lang", "lbucket",
                     F.struct("doc_id", "n_sh").alias("d"),
                     F.explode(F.transform("shingles",
                                           lambda s: F.xxhash64(s)))
                     .alias("h"))
    if max_posting is None:
        kept = ex                      # uncapped: single-pass (unsafe at
    else:                              # crawl scale; for A/B + tests only)
        key_counts = (ex.groupBy("lang", "lbucket", "h")
                      .agg(F.count(F.lit(1)).alias("k"))
                      .filter(F.col("k") > max_posting))
        if stop_stats is not None:
            key_counts = key_counts.observe(
                stop_stats,
                F.count(F.lit(1)).alias("n_stop_shingles"),
                F.coalesce(F.sum("k"), F.lit(0)).alias("n_postings_dropped"))
        stops = key_counts.select(F.col("lang").alias("s_lang"),
                                  F.col("lbucket").alias("s_lbucket"),
                                  F.col("h").alias("s_h"))
        # null-SAFE anti-join: the pairing groupBy downstream treats
        # null keys as equal (null-lang docs form a real candidate
        # group), but a plain equi-anti-join never matches null keys —
        # the cap would be computed for those groups yet silently not
        # enforced, re-opening the k(k-1)/2 blow-up for them
        kept = ex.join(F.broadcast(stops),
                       ex["lang"].eqNullSafe(F.col("s_lang"))
                       & ex["lbucket"].eqNullSafe(F.col("s_lbucket"))
                       & ex["h"].eqNullSafe(F.col("s_h")),
                       "left_anti")
    posts = (kept.groupBy("lang", "lbucket", "h")
             .agg(F.collect_list("d").alias("ds"))
             .filter(F.size("ds") > 1))
    # each unordered doc pair in a posting list, exactly once, a < b
    pairs = (posts
             .select(F.posexplode("ds").alias("i", "a"), F.col("ds"))
             .select("a", F.explode(F.slice(
                 "ds", F.col("i") + F.lit(2),
                 F.size("ds") - F.col("i") - F.lit(1))).alias("b"))
             .filter(F.col("a.doc_id") != F.col("b.doc_id"))
             .select(
                 F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                 F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
                 F.when(F.col("a.doc_id") < F.col("b.doc_id"),
                        F.col("a.n_sh")).otherwise(F.col("b.n_sh"))
                 .alias("na"),
                 F.when(F.col("a.doc_id") < F.col("b.doc_id"),
                        F.col("b.n_sh")).otherwise(F.col("a.n_sh"))
                 .alias("nb")))
    inter = (pairs.groupBy("doc_a", "doc_b", "na", "nb")
             .agg(F.count(F.lit(1)).alias("shared")))
    jac = F.round(F.col("shared").cast("double")
                  / (F.col("na") + F.col("nb") - F.col("shared")), 6)
    return (inter.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


# ---------------------------------------------------------------------------
# cross-source mirror detection
# ---------------------------------------------------------------------------

MIRROR_SHINGLE_K = 5    # long enough that cross-source sharing means
                        # copied prose, not vocabulary coincidence
MIRROR_MAX_SOURCES = 8  # boilerplate guard: a shingle on more sources
                        # than this is chrome/legalese, not a mirror


def mirror_shingle_overlap(df: DataFrame, text_col: str = "text",
                           source_col: str = "source",
                           k: int = MIRROR_SHINGLE_K,
                           max_sources: int = MIRROR_MAX_SOURCES
                           ) -> DataFrame:
    """(s1, s2, n_shared, overlap): mirror-site detection at the
    source/host level — for every source pair, the count of distinct
    ``k``-word shingles both carry and the overlap coefficient
    ``n_shared / min(|A|, |B|)`` (1.0 = the smaller source is a full
    mirror of the larger).  The host-level twin of document near-dup:
    a crawl curator reads this to drop mirrored hosts wholesale
    before paying per-document dedup.

    Scale shape (10^12 docs, 10^8 hosts): one shuffle builds the
    distinct (source, shingle) posting set; shingles present on more
    than ``max_sources`` sources are boilerplate (cookie banners,
    license text).  Unlike ngram_jaccard's stop-shingle cap — where
    the hot set is the tiny top of a Zipf curve and broadcasts — the
    boilerplate set here is NOT driver-sized at web scale (at cap=8
    over 10^8 hosts, most of the common-phrase vocabulary exceeds
    it), so the per-shingle source count joins BACK on the shingle
    key instead: the same hash partitioning the count shuffle just
    produced, which AQE/Catalyst co-partitions with no broadcast and
    no driver-side set anywhere.  Singleton shingles (n_src == 1)
    cannot produce a pair and are pruned before the self-join — but
    AFTER the per-source totals, which count every non-boilerplate
    shingle so the overlap denominator keeps its meaning.  Per-shingle
    pair fan-out is bounded by max_sources^2 regardless of how viral
    a phrase is; per-source totals join back AQE-decided (one row per
    host is not driver-sized either)."""
    toks = (df.filter(F.col(text_col).isNotNull())
            .select(F.col(source_col).alias("source"),
                    tokenize(F.col(text_col)).alias("toks")))
    sh = (toks.select("source",
                      F.explode(shingles_from_tokens(F.col("toks"), k))
                      .alias("shingle"))
          .distinct())
    counts = (sh.groupBy("shingle")
              .agg(F.count(F.lit(1)).alias("n_src")))
    kept = (sh.join(counts, "shingle")
            .filter(F.col("n_src") <= max_sources))
    totals = (kept.groupBy("source")
              .agg(F.count(F.lit(1)).alias("n_sh")))
    pairable = kept.filter(F.col("n_src") >= 2)
    a = pairable.select(F.col("source").alias("s1"), "shingle")
    b = pairable.select(F.col("source").alias("s2"), "shingle")
    shared = (a.join(b, "shingle")
              .filter(F.col("s1") < F.col("s2"))
              .groupBy("s1", "s2")
              .agg(F.count(F.lit(1)).cast("long").alias("n_shared")))
    ta = totals.select(F.col("source").alias("s1"),
                       F.col("n_sh").alias("n1"))
    tb = totals.select(F.col("source").alias("s2"),
                       F.col("n_sh").alias("n2"))
    return (shared.join(ta, "s1").join(tb, "s2")
            .select("s1", "s2", "n_shared",
                    F.round(F.col("n_shared").cast("double")
                            / F.least("n1", "n2"), 6).alias("overlap")))


def sql_mirror_shingle_overlap(table: str, text_col: str = "text",
                               source_col: str = "source",
                               k: int = MIRROR_SHINGLE_K,
                               max_sources: int = MIRROR_MAX_SOURCES
                               ) -> str:
    """DuckDB twin of mirror_shingle_overlap (replays the identical
    tokenization, shingling, and boilerplate cap).  The operator's
    singleton prune (n_src >= 2 before the self-join) is invisible to
    the output — a one-source shingle can never produce a pair — so
    the twin keeps the simpler NOT-IN-hot form."""
    return f"""
WITH toks AS (
  SELECT {source_col} AS source, {sql_tokens(text_col)} AS t
  FROM {table} WHERE {text_col} IS NOT NULL
),
sh AS (
  SELECT DISTINCT source, unnest({sql_word_shingles('t', k)}) AS shingle
  FROM toks
),
hot AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > {max_sources}
),
kept AS (
  SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)
),
tot AS (SELECT source, COUNT(*) AS n_sh FROM kept GROUP BY source)
SELECT a.source AS s1, b.source AS s2,
       CAST(COUNT(*) AS BIGINT) AS n_shared,
       round(CAST(COUNT(*) AS DOUBLE) / least(ta.n_sh, tb.n_sh), 6)
           AS overlap
FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.source < b.source
JOIN tot ta ON ta.source = a.source
JOIN tot tb ON tb.source = b.source
GROUP BY a.source, b.source, ta.n_sh, tb.n_sh
"""


# ---------------------------------------------------------------------------
# near-dup group resolution (LSH pairs -> components -> survivors)
# ---------------------------------------------------------------------------

_PAD_W = 20  # covers every non-negative int64 (19 digits) + safety digit


def near_dedup_groups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      n_bands: int = N_BANDS,
                      cc_max_iter: int = 25) -> DataFrame:
    """(doc_id, canonical_id, group_size, keep): resolve MinHash-LSH
    candidate pairs into connected near-duplicate groups and elect one
    survivor per group (the minimum doc_id) — the decision artifact a
    dedup pass actually applies downstream, not just the pair list.

    Scale shape: pairs come from the banded LSH self-join (never
    all-pairs); their connected components run on the PAIR graph —
    #near-dup docs rows, orders of magnitude smaller than the corpus —
    through the size-gated union-find / min-label propagation in
    ``operators.kg.connected_components``.  Doc ids travel through CC
    as zero-padded fixed-width strings so the component min under UTF8
    binary order IS the numeric min (ids are non-negative by the
    documents contract).  The corpus side then pays exactly one left
    join against the small canonical map (broadcast when the size gate
    proved it driver-sized; Catalyst/AQE otherwise) — no corpus-keyed
    groupBy anywhere: group sizes are counted on the map, and
    singletons never leave the narrow scan.
    """
    sigs = minhash_signatures(df, text_col, id_col, n_bands)
    pairs = lsh_candidate_pairs(sigs)
    return resolve_dedup_groups(df.select(F.col(id_col)), pairs,
                                id_col=id_col, a_col="doc_a", b_col="doc_b",
                                cc_max_iter=cc_max_iter)


def resolve_dedup_groups(ids: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id",
                         a_col: str = "doc_a",
                         b_col: str = "doc_b",
                         cc_max_iter: int = 25) -> DataFrame:
    """Close ANY candidate-pair list into near-dup groups with one
    min-id survivor each — the shared back half of near-dup dedup,
    usable with MinHash-LSH pairs (near_dedup_groups), embedding-cosine
    pairs (similarity.embedding_near_dup_pairs), or any other pair
    source.  Output: one row per id in ``ids``:
    ``(id_col, canonical_id, group_size, keep)``.

    Same scale shape as documented on near_dedup_groups: CC runs on
    the PAIR graph only through the size-gated union-find / min-label
    propagation; the corpus pays one left join against the small
    canonical map; group sizes are counted on the map, never by a
    corpus-keyed groupBy."""
    from mdscraper_spark.operators.kg import (_maybe_broadcast,
                                              connected_components)

    pad = lambda c: F.lpad(F.col(c).cast("string"), _PAD_W, "0")
    cmap = connected_components(
        pairs.select(pad(a_col).alias("src"), pad(b_col).alias("dst")),
        max_iter=cc_max_iter)
    assigned = cmap.select(
        F.col("node_id").cast("bigint").alias(id_col),
        F.col("canon_id").cast("bigint").alias("canonical_id"))
    sizes = (assigned.groupBy("canonical_id")
             .agg(F.count(F.lit(1)).alias("group_size")))
    enriched = assigned.join(sizes, "canonical_id")
    enriched._mdscraper_local = getattr(cmap, "_mdscraper_local", False)
    out = ids.select(F.col(id_col)) \
             .join(_maybe_broadcast(enriched), id_col, "left")
    canon = F.coalesce("canonical_id", F.col(id_col))
    return out.select(
        id_col,
        canon.alias("canonical_id"),
        F.coalesce("group_size", F.lit(1).cast("bigint")).alias("group_size"),
        (canon == F.col(id_col)).alias("keep"))


def quality_survivors(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      n_bands: int = N_BANDS,
                      cc_max_iter: int = 25) -> DataFrame:
    """(doc_id, canonical_id, group_size, survivor_id, keep): near-dup
    group resolution that elects the HIGHEST-QUALITY member of each
    group as the survivor (quality ties broken by minimum doc_id) —
    the RefinedWeb/CCNet-style "which duplicate to keep" decision,
    where min-id election (``near_dedup_groups``) throws away the best
    copy whenever a low-id mirror happens to be the truncated one.

    Scale shape: same banded-LSH front and pair-graph-only CC as
    ``resolve_dedup_groups``; the election is a ``max_by`` over a
    TOTAL order key (quality desc, doc_id asc), so partial map-side
    aggregation collapses group members before the shuffle and the
    winner is partition-invariant.  The group-level aggregation runs on
    grouped docs only (pair-graph-sized after the semi filter); the
    corpus pays two narrow-scan joins against small maps (assignment,
    winners) — never a corpus-keyed groupBy.  Quality is the registry's
    own rounded heuristic (textstats.quality_score), so the SQL twin
    replays the identical double math.
    """
    from mdscraper_spark.operators.kg import (_maybe_broadcast,
                                              connected_components)
    from mdscraper_spark.operators.textstats import quality_score

    sigs = minhash_signatures(df, text_col, id_col, n_bands)
    pairs = lsh_candidate_pairs(sigs)
    pad = lambda c: F.lpad(F.col(c).cast("string"), _PAD_W, "0")
    cmap = connected_components(
        pairs.select(pad("doc_a").alias("src"), pad("doc_b").alias("dst")),
        max_iter=cc_max_iter)
    assigned = cmap.select(
        F.col("node_id").cast("bigint").alias(id_col),
        F.col("canon_id").cast("bigint").alias("canonical_id"))
    assigned._mdscraper_local = getattr(cmap, "_mdscraper_local", False)
    scored = df.select(F.col(id_col),
                       quality_score(F.col(text_col)).alias("quality"))
    merged = scored.join(_maybe_broadcast(assigned), id_col, "left")
    # election + sizing on GROUPED docs only (pair-graph-sized input)
    grp = (merged.where(F.col("canonical_id").isNotNull())
           .groupBy("canonical_id")
           .agg(F.count(F.lit(1)).alias("group_size"),
                F.max_by(F.col(id_col),
                         F.struct(F.col("quality"),
                                  (-F.col(id_col)).alias("tie")))
                 .alias("survivor_id")))
    grp._mdscraper_local = getattr(cmap, "_mdscraper_local", False)
    out = merged.join(_maybe_broadcast(grp), "canonical_id", "left")
    canon = F.coalesce("canonical_id", F.col(id_col))
    survivor = F.coalesce("survivor_id", F.col(id_col))
    return out.select(
        id_col,
        canon.alias("canonical_id"),
        F.coalesce("group_size", F.lit(1).cast("bigint")).alias("group_size"),
        survivor.alias("survivor_id"),
        (survivor == F.col(id_col)).alias("keep"))


# ---------------------------------------------------------------------------
# corpus-wide paragraph dedup (CCNet-style; SURVEY J32)
# ---------------------------------------------------------------------------

def paragraph_dedup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, clean_text, n_removed): remove every paragraph (newline-
    separated line) that already occurred EARLIER IN THE CORPUS — the
    CCNet-style sharded-paragraph dedup that strips boilerplate
    (nav bars, footers, cookie banners) repeated across pages, where
    intra-doc ``dedup_lines`` cannot see across documents.

    Semantics (replayed by the registry row's SQL twin): the global
    first occurrence of a paragraph — minimum ``(doc_id, position)``
    lexicographically — survives; later occurrences anywhere in the
    corpus are dropped.  Whitespace-only paragraphs never participate:
    they are structure, not content, and deduping the empty string
    would glue every document to the corpus's first blank line.  Every
    input doc appears in the output, even if all its content was
    removed (``clean_text``='').

    Scale shape: posexplode is narrow; the winner election is one
    map-side-combinable min-struct groupBy on the paragraph key,
    joined back on the same key (the winners branch re-reads the
    source with pruned columns rather than persisting the exploded
    corpus — at crawl scale a second pruned scan is cheaper than
    materializing #paragraphs rows) (AQE skew-join
    splits the hot-boilerplate keys — the exact skew this operator
    exists to remove); reassembly is one conditional aggregation on
    doc_id over ALL rows (kept flag folded into the agg, so
    every doc — split() never returns an empty array — survives
    without a totals branch re-scanning the source).  Nothing is
    corpus-quadratic and no driver state exists at any size."""
    e = df.select(F.col(id_col).alias("doc_id"),
                  # coalesce: posexplode of a NULL array emits no rows,
                  # so a null-text doc would silently vanish from the
                  # output instead of surviving as clean_text=''
                  F.posexplode(F.split(F.coalesce(F.col(text_col),
                                                  F.lit("")), "\n"))
                  .alias("pos", "para"))
    dedupable = ws_strip(F.col("para")) != ""
    ded = e.filter(dedupable)
    winners = (ded.groupBy("para")
               .agg(F.min(F.struct("doc_id", "pos")).alias("w")))
    # ws-only rows are routed AROUND the paragraph join: at crawl scale
    # the empty line is the hottest key in the corpus, and shuffling
    # billions of them by para just to probe a winners table they are
    # excluded from would recreate the exact skew this operator removes
    flagged = (ded.join(winners, "para")
               .select("doc_id", "pos", "para",
                       (F.struct("doc_id", "pos") == F.col("w"))
                       .alias("keep"))
               .unionByName(e.filter(~dedupable)
                            .select("doc_id", "pos", "para",
                                    F.lit(True).alias("keep"))))
    # collect_list skips the NULLs the when() leaves behind, so the
    # sorted rebuild sees only kept paragraphs while the groupBy still
    # covers every doc (each doc has >= 1 exploded row)
    return (flagged.groupBy("doc_id")
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("keep"),
                                    F.struct("pos", "para")))),
                         lambda s: s["para"]),
                     "\n").alias("clean_text"),
                 F.sum(F.when(F.col("keep"), F.lit(0)).otherwise(F.lit(1)))
                 .cast("bigint").alias("n_removed")))


# ---------------------------------------------------------------------------
# per-host boilerplate template removal (SURVEY J60)
# ---------------------------------------------------------------------------

def host_boilerplate_scrub(df: DataFrame, host_col: str = "source",
                           text_col: str = "text", id_col: str = "doc_id",
                           min_frac: float = 0.5,
                           min_docs: int = 3) -> DataFrame:
    """(doc_id, clean_text, n_removed): remove every line that is HOST
    TEMPLATE — appearing on at least ``max(min_docs,
    ceil(min_frac * n_docs_host))`` distinct documents of the SAME
    host — the trafilatura/boilerpipe-style site-template scrub.

    Distinct from ``paragraph_dedup`` in both scope and verdict:
    dedup is corpus-global and keeps the FIRST occurrence; template
    removal is host-local and strips ALL occurrences (the nav bar is
    boilerplate on the page where it first appeared too).  Lines
    shared across hosts but rare within each host (quotes, citations)
    survive — exactly the split a crawl pipeline wants between
    site chrome and genuinely duplicated content.

    Whitespace-only lines are structure, not content: never counted,
    never removed, and routed AROUND the template join (at crawl scale
    the empty line is the hottest key in the corpus).  Every input doc
    survives, even if fully scrubbed (``clean_text``='').

    Scale shape: explode is narrow; the line census is one
    map-side-combinable distinct-agg on (host, line); the template
    table is only the OVER-threshold subset — bounded by template size
    per host, not corpus size — joined back on (host, line) with AQE
    skew handling for hub hosts; reassembly is one groupBy(doc_id).
    No driver state at any size."""
    host = F.coalesce(F.col(host_col), F.lit("")).alias("host")
    e = df.select(F.col(id_col).alias("doc_id"), host,
                  F.posexplode(F.split(F.coalesce(F.col(text_col),
                                                  F.lit("")), "\n"))
                  .alias("pos", "para"))
    dedupable = ws_strip(F.col("para")) != ""
    ded = e.filter(dedupable)
    host_totals = (df.select(host, F.col(id_col).alias("doc_id"))
                   .groupBy("host")
                   .agg(F.countDistinct("doc_id").alias("n_docs")))
    line_docs = (ded.groupBy("host", "para")
                 .agg(F.countDistinct("doc_id").alias("n_line_docs")))
    threshold = F.greatest(F.lit(min_docs),
                           F.ceil(F.lit(min_frac) * F.col("n_docs")))
    template = (line_docs.join(host_totals, "host")
                .filter(F.col("n_line_docs") >= threshold)
                .select("host", "para", F.lit(True).alias("bp")))
    flagged = (ded.join(template, ["host", "para"], "left")
               .select("doc_id", "pos", "para",
                       F.col("bp").isNull().alias("keep"))
               .unionByName(e.filter(~dedupable)
                            .select("doc_id", "pos", "para",
                                    F.lit(True).alias("keep"))))
    return (flagged.groupBy("doc_id")
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("keep"),
                                    F.struct("pos", "para")))),
                         lambda s: s["para"]),
                     "\n").alias("clean_text"),
                 F.sum(F.when(F.col("keep"), F.lit(0)).otherwise(F.lit(1)))
                 .cast("bigint").alias("n_removed")))


# ---------------------------------------------------------------------------
# dedup-grade text canonicalization (SURVEY J34)
# ---------------------------------------------------------------------------

def canonical_text(col: Column) -> Column:
    """Dedup-grade canonical form of a text column — the normalization
    SlimPajama/CCNet-style pipelines apply BEFORE hashing, so that
    case, punctuation, and whitespace noise (the typical mirror-site /
    re-render delta) cannot hide an exact duplicate:

    1. lowercase (ASCII + Unicode simple mapping — both engines);
    2. every non-alphanumeric, non-whitespace char becomes a space
       (``[^a-z0-9\\s]`` AFTER lowercasing, so the class is closed
       under the case fold in both engines);
    3. whitespace runs collapse to one space;
    4. leading/trailing whitespace stripped.

    Composable: ``exact_dedup_groups(df.withColumn('text',
    canonical_text(col)))`` is normalized exact dedup; feeding it to
    ``minhash_signatures`` makes near-dup detection punctuation-blind.
    Pure codegen expressions, no shuffle of its own."""
    lowered = F.lower(col)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9\s]", " ")
    return ws_strip(F.regexp_replace(stripped, r"\s+", " "))


def sql_canonical_text(col: str) -> str:
    """DuckDB twin of canonical_text — identical regex classes applied
    in the identical order."""
    lowered = f"lower({col})"
    stripped = f"regexp_replace({lowered}, '[^a-z0-9\\s]', ' ', 'g')"
    return sql_ws_strip(f"regexp_replace({stripped}, '\\s+', ' ', 'g')")


# ---------------------------------------------------------------------------
# duplicated token-window (substring-level) statistics (SURVEY J37)
# ---------------------------------------------------------------------------

def dup_span_stats(df: DataFrame, window: int = 50, stride: int = 50,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_windows, dup_windows, dup_frac): per-doc fraction of
    strided token windows that occur 2+ times ANYWHERE in the corpus —
    the tractable strided approximation of suffix-array substring
    dedup: doc-level dedup (J1) misses partial copies, paragraph-level
    (J32) misses copies that straddle line breaks; this flags them at
    token-window granularity.  Stride==window (non-overlapping) is the
    production setting; smaller strides raise alignment recall at
    linear cost.  Alignment caveat (inherent to striding, documented,
    not a bug): a copy is only caught where the two occurrences
    tokenize into at least one identical window, so unaligned partial
    copies need stride < window.

    Window arithmetic (replayed by the SQL twin): docs with n >=
    window tokens get floor((n-window)/stride)+1 FULL windows (the
    sub-window tail is uncovered); shorter docs get one whole-doc
    window, so short exact duplicates still collide.

    Scale shape: same as paragraph dedup — narrow explode, one
    map-side-combinable count groupBy on the window hash, hash
    join-back (AQE skew splits the hot boilerplate windows), one
    doc_id reassembly groupBy.  dup_frac is a single IEEE division of
    two exact integers — deterministic in both engines."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    d = df.select(F.col(id_col).alias("doc_id"),
                  tokenize(F.coalesce(F.col(text_col), F.lit("")))
                  .alias("toks"))
    n = F.size("toks")
    n_win = F.greatest(
        F.lit(1).cast("bigint"),
        (F.floor((n - F.lit(window)).cast("double") / F.lit(stride))
         + F.lit(1)).cast("bigint"))
    w = d.select("doc_id", "toks",
                 F.explode(F.sequence(F.lit(0).cast("bigint"),
                                      n_win - 1)).alias("i"))
    h = F.md5(F.array_join(
        F.slice(w["toks"], (w["i"] * stride + 1).cast("int"), window), " "))
    spans = w.select("doc_id", h.alias("h"))
    counts = spans.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    return (spans.join(counts, "h")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_windows"),
                 F.sum((F.col("cnt") > 1).cast("long"))
                 .alias("dup_windows"))
            .select("doc_id", "n_windows", "dup_windows",
                    (F.col("dup_windows") / F.col("n_windows"))
                    .alias("dup_frac")))


def sql_dup_span_stats(table: str, window: int, stride: int,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB twin of dup_span_stats over ``table``."""
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id,
         {sql_tokens(f"coalesce({text_col}, '')")} AS toks
  FROM {table}
), w AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(1,
           CAST(floor((len(toks) - {window})::DOUBLE / {stride})
                AS BIGINT) + 1))) AS i
  FROM t
), spans AS (
  SELECT doc_id,
         md5(array_to_string(
           toks[i * {stride} + 1 : i * {stride} + {window}], ' ')) AS h
  FROM w
), c AS (
  SELECT h, count(*) AS cnt FROM spans GROUP BY h
)
SELECT doc_id, count(*) AS n_windows,
       CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows,
       sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) / count(*) AS dup_frac
FROM spans JOIN c USING (h)
GROUP BY doc_id
"""


def dup_span_scrub(df: DataFrame, window: int = 50, stride: int = 50,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_removed, scrubbed_text): the REMOVAL
    counterpart of dup_span_stats — exact-substring deduplication in
    the style of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), strided-window approximation instead of
    a suffix array (same trade-off note as dup_span_stats).

    Semantics (replayed exactly by the SQL twin):
    * windows = dup_span_stats' windows (full strided windows; docs
      shorter than ``window`` get one whole-doc window);
    * for every window hash occurring 2+ times corpus-wide, the
      occurrence with the minimum (doc_id, i) — lexicographic doc_id,
      then window index — is the KEEPER; every other occurrence's
      covered token positions [i*stride, min(n, i*stride+window)) are
      removed (self-duplicates within one doc count too);
    * ``scrubbed_text`` is the surviving tokens joined by single
      spaces (whitespace-normalized by construction — downstream of
      tokenize there is no original whitespace to preserve).

    Scale shape: the stats half is dup_span_stats' plan (narrow
    explode, one count groupBy on the window hash, join-back).  The
    expensive per-token explode + reassembly groupBy is paid ONLY by
    docs that actually lose a span: removal positions are a tiny
    fraction of the corpus (dup windows only), so the affected-doc
    semi-set is joined back and the untouched majority flows through
    a narrow projection with zero shuffle.  Keeper election is
    min(struct) — map-side combinable, no window sort."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    d = df.select(F.col(id_col).alias("doc_id"),
                  tokenize(F.coalesce(F.col(text_col), F.lit("")))
                  .alias("toks"))
    n = F.size("toks")
    n_win = F.greatest(
        F.lit(1).cast("bigint"),
        (F.floor((n - F.lit(window)).cast("double") / F.lit(stride))
         + F.lit(1)).cast("bigint"))
    w = d.select("doc_id", "toks", n.alias("n"),
                 F.explode(F.sequence(F.lit(0).cast("bigint"),
                                      n_win - 1)).alias("i"))
    h = F.md5(F.array_join(
        F.slice(w["toks"], (w["i"] * stride + 1).cast("int"), window), " "))
    spans = w.select("doc_id", "i", "n", h.alias("h"))
    keep = (spans.groupBy("h")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.min(F.struct("doc_id", "i")).alias("keep"))
            .filter(F.col("cnt") > 1)
            .select("h", "keep"))
    dup_occ = (spans.join(keep, "h")
               .filter(~((F.col("doc_id") == F.col("keep.doc_id"))
                         & (F.col("i") == F.col("keep.i")))))
    removals = (dup_occ.select(
        "doc_id",
        F.explode(F.sequence(
            (F.col("i") * stride).cast("int"),
            F.least(F.col("n"), F.col("i") * stride + window).cast("int")
            - F.lit(1))).alias("pos"))
        .distinct())
    # removals (dup positions only — tiny vs the corpus) feeds two
    # consumers; eager-checkpoint so the window-hash branch runs once
    # (same discipline as two_hop_counts' hub list)
    removals = removals.localCheckpoint(eager=True)
    # affected docs pay the per-token path; everyone else stays narrow
    affected = removals.select("doc_id").distinct()
    hit = d.join(affected, "doc_id")
    pos = hit.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    kept = pos.join(removals.withColumn("rm", F.lit(1)),
                    ["doc_id", "pos"], "left")
    scrub_hit = (kept.groupBy("doc_id")
                 .agg(F.count(F.lit(1)).alias("n_tokens"),
                      F.coalesce(F.sum("rm"), F.lit(0)).cast("long")
                      .alias("n_removed"),
                      F.concat_ws(" ", F.transform(
                          F.array_sort(F.collect_list(
                              F.when(F.col("rm").isNull(),
                                     F.struct("pos", "tok")))),
                          lambda x: x["tok"])).alias("scrubbed_text")))
    untouched = (d.join(affected, "doc_id", "left_anti")
                 .select("doc_id",
                         F.size("toks").cast("long").alias("n_tokens"),
                         F.lit(0).cast("long").alias("n_removed"),
                         F.array_join("toks", " ").alias("scrubbed_text")))
    return scrub_hit.unionByName(untouched)


def sql_dup_span_scrub(table: str, window: int, stride: int,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB twin of dup_span_scrub over ``table``."""
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id,
         {sql_tokens(f"coalesce({text_col}, '')")} AS toks
  FROM {table}
), w AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(0, greatest(1,
           CAST(floor((len(toks) - {window})::DOUBLE / {stride})
                AS BIGINT) + 1))) AS i
  FROM t
), spans AS (
  SELECT doc_id, i, n,
         md5(array_to_string(
           toks[i * {stride} + 1 : i * {stride} + {window}], ' ')) AS h
  FROM w
), ranked AS (
  SELECT doc_id, i, n,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn,
         count(*) OVER (PARTITION BY h) AS cnt
  FROM spans
), dup_occ AS (
  SELECT doc_id, i, n FROM ranked WHERE cnt > 1 AND rn > 1
), removals AS (
  SELECT DISTINCT doc_id,
         unnest(range(i * {stride},
                      least(n, i * {stride} + {window}))) AS pos
  FROM dup_occ
), posx AS (
  SELECT doc_id, toks, unnest(range(0, len(toks))) AS pos FROM t
), kept AS (
  SELECT p.doc_id, p.pos, p.toks[p.pos + 1] AS tok,
         r.pos IS NOT NULL AS removed
  FROM posx p LEFT JOIN removals r
    ON r.doc_id = p.doc_id AND r.pos = p.pos
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       coalesce(string_agg(CASE WHEN NOT removed THEN tok END,
                           ' ' ORDER BY pos), '') AS scrubbed_text
FROM kept
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# winnowing document fingerprints (SURVEY J46)
# ---------------------------------------------------------------------------

def winnowing_fingerprints(df: DataFrame, k: int = 8, w: int = 4,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_grams, n_fingerprints, fp_digest): winnowing local
    fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS
    algorithm) over dedup-canonical text: hash every ``k``-char gram,
    slide a window of ``w`` consecutive hashes, select each window's
    MINIMUM hash taking the RIGHTMOST on ties, and keep the distinct
    selected (hash, position) pairs.  The winnowing guarantee: any two
    documents sharing a canonical substring of at least ``k + w - 1``
    characters share at least one fingerprint — the local-selection
    property strided windows (dup_span_stats) lack, with density 2/(w+1)
    instead of all-grams.

    Emitted per doc: gram count, fingerprint count, and an
    order-insensitive md5 digest of the selected set ("hash:pos"
    strings, sorted) — equal digests mean byte-equal fingerprint sets,
    so the row pins selection (min + rightmost-tie + dedup) exactly.
    Exposing the exploded (doc, hash) posting list for cross-doc
    matching is the same posting-list shape as lsh_pairs and reuses
    that path when needed.

    Scale shape: narrow per-row array expressions — no shuffle, no
    join, no UDF; cost is O(chars·w) per doc inside one projection.
    Hashes are the same 60-bit md5-prefix fold the corpus signature
    uses, so the DuckDB twin reproduces them bit-exactly."""
    sel = _winnow_selected(df, k, w, text_col, id_col)
    return sel.select(
        "doc_id", "n_grams",
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.md5(F.array_join(F.array_sort("fps"), ",")).alias("fp_digest"))


def _winnow_selected(df: DataFrame, k: int, w: int,
                     text_col: str, id_col: str) -> DataFrame:
    """(doc_id, n_grams, fps): the winnowing selection as an array of
    distinct "hash:pos" strings — shared front end of the per-doc
    digest row and the cross-doc pair generator."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    base = df.select(F.col(id_col).alias("doc_id"),
                     canonical_text(F.col(text_col)).alias("_c"))
    m = (F.length("_c") - F.lit(k) + 1).cast("int")
    gram_hash = lambda i: F.conv(
        F.substring(F.md5(F.col("_c").substr(i, F.lit(k))), 1, 15),
        16, 10).cast("long")
    hashed = base.select(
        "doc_id",
        F.greatest(m, F.lit(0)).cast("long").alias("n_grams"),
        F.when(m >= 1,
               F.transform(F.sequence(F.lit(1), m), gram_hash))
         .otherwise(F.array().cast("array<bigint>")).alias("hs"))
    mm = F.size("hs")
    n_win = F.when(mm >= w, mm - F.lit(w) + 1) \
             .when(mm >= 1, F.lit(1)).otherwise(F.lit(0))
    win_len = F.least(mm, F.lit(w))

    def pick(j):
        sl = F.slice("hs", j, win_len)
        minh = F.array_min(sl)
        rpos = F.array_position(F.reverse(sl), minh)
        pos = j.cast("long") + win_len.cast("long") - rpos
        return F.concat(minh.cast("string"), F.lit(":"),
                        pos.cast("string"))

    fps = F.when(
        n_win >= 1,
        F.array_distinct(F.transform(F.sequence(F.lit(1), n_win), pick))
    ).otherwise(F.array().cast("array<string>"))
    return hashed.select("doc_id", "n_grams", fps.alias("fps"))


def winnowing_shared_pairs(df: DataFrame, k: int = 8, w: int = 4,
                           min_shared: int = 2, max_posting: int = 32,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(doc_a, doc_b, n_shared): cross-doc winnowing matches — MOSS's
    ranking signal: the number of DISTINCT fingerprint hashes two
    documents share (positions intentionally ignored: a copied passage
    moves).  ``min_shared`` floors the report (one shared hash is one
    k-gram — noise at corpus scale); hashes held by more than
    ``max_posting`` docs are boilerplate (the corpus's own stop
    phrases) and are dropped before pairing, the same stop-shingle
    trade-off ngram_jaccard_pairs documents, replayed identically in
    the SQL twin.

    Scale shape (the ngram_jaccard_pairs posting-list idiom): one
    explode + per-doc distinct builds the posting stream; over-cap
    hashes are found by a map-side-combined count pass whose hot set
    is Zipf-head-sized (broadcast anti-join, like the stop-shingle
    cap); survivors take ONE groupBy(hash) collect_list — memory
    bounded by the cap — and pairs are generated NARROWLY from each
    ≤cap posting list (posexplode + tail slice, each unordered pair
    exactly once), so no self-join and the winnowing selection is
    evaluated twice (stream + count pass), not three times.  The final
    pair count is a map-side-combinable groupBy.  No corpus-keyed
    groupBy, no cartesian."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    if max_posting < 2:
        raise ValueError(f"max_posting must be >= 2, got {max_posting}")
    sel = _winnow_selected(df, k, w, text_col, id_col)
    ph = sel.select(
        "doc_id",
        F.explode(F.array_distinct(F.transform(
            "fps", lambda x: F.split(x, ":")[0].cast("long"))))
        .alias("fph"))
    stops = (ph.groupBy("fph").agg(F.count(F.lit(1)).alias("c"))
             .filter(F.col("c") > max_posting)
             .select(F.col("fph").alias("s_fph")))
    kept = ph.join(F.broadcast(stops), ph["fph"] == F.col("s_fph"),
                   "left_anti")
    posts = (kept.groupBy("fph")
             .agg(F.collect_list("doc_id").alias("ds"))
             .filter(F.size("ds") > 1))
    pairs = (posts
             .select(F.posexplode("ds").alias("i", "a"), F.col("ds"))
             .select("a", F.explode(F.slice(
                 "ds", F.col("i") + F.lit(2),
                 F.size("ds") - F.col("i") - F.lit(1))).alias("b"))
             .select(F.least("a", "b").alias("doc_a"),
                     F.greatest("a", "b").alias("doc_b")))
    return (pairs.groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def sql_winnowing_fingerprints(table: str, k: int = 8, w: int = 4,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> str:
    """DuckDB twin of winnowing_fingerprints over ``table``: identical
    canonicalization, 60-bit md5-prefix gram hashes, min-with-
    rightmost-tie window selection, distinct set, sorted-join digest."""
    return f"""
{_sql_winnow_sel_cte(table, k, w, text_col, id_col)}
SELECT doc_id, n_grams,
       CAST(len(fps) AS BIGINT) AS n_fingerprints,
       md5(COALESCE(array_to_string(list_sort(fps), ','), ''))
           AS fp_digest
FROM sel
"""


def _sql_winnow_sel_cte(table: str, k: int, w: int,
                        text_col: str, id_col: str) -> str:
    """Shared WITH-chain ending in ``sel(doc_id, n_grams, fps)`` — the
    SQL twin of _winnow_selected, used by both winnowing twins."""
    sl = "hs[j : j + L - 1]"
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {sql_canonical_text(text_col)} AS _c
  FROM {table}
), g AS (
  SELECT doc_id,
         CAST(greatest(length(_c) - {k} + 1, 0) AS BIGINT) AS n_grams,
         CASE WHEN length(_c) >= {k}
              THEN [CAST(('0x' || substr(md5(substr(_c, i, {k})), 1, 15))
                         AS BIGINT)
                    FOR i IN range(1, length(_c) - {k} + 2)]
              ELSE CAST([] AS BIGINT[]) END AS hs
  FROM base
), wdef AS (
  SELECT doc_id, n_grams, hs,
         CASE WHEN len(hs) >= {w} THEN len(hs) - {w} + 1
              WHEN len(hs) >= 1 THEN 1 ELSE 0 END AS n_win,
         least(len(hs), {w}) AS L
  FROM g
), sel AS (
  SELECT doc_id, n_grams,
         list_distinct([
           CAST(list_min({sl}) AS VARCHAR) || ':' ||
           CAST(j + L - list_position(list_reverse({sl}),
                                      list_min({sl})) AS VARCHAR)
           FOR j IN range(1, n_win + 1)]) AS fps
  FROM wdef
)"""


def sql_winnowing_shared_pairs(table: str, k: int = 8, w: int = 4,
                               min_shared: int = 2, max_posting: int = 32,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> str:
    """DuckDB twin of winnowing_shared_pairs over ``table``: identical
    selection, distinct-hash posting list, 2..max_posting pruning,
    pair count floor."""
    return f"""
{_sql_winnow_sel_cte(table, k, w, text_col, id_col)},
ph AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             fps, x -> CAST(str_split(x, ':')[1] AS BIGINT)))) AS fph
  FROM sel
), cnt AS (
  SELECT fph, COUNT(*) AS c FROM ph GROUP BY fph
), keep AS (
  SELECT fph FROM cnt WHERE c >= 2 AND c <= {max_posting}
), phk AS (
  SELECT ph.doc_id, ph.fph FROM ph JOIN keep USING (fph)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM phk a JOIN phk b USING (fph)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}
"""


# ---------------------------------------------------------------------------
# sorted-neighborhood blocking (SURVEY J57) — the classic entity-
# resolution candidate generator (Hernandez & Stolfo, SIGMOD 1995)
# ---------------------------------------------------------------------------

def sorted_neighborhood_pairs(df: DataFrame, key_col: str,
                              id_col: str, window: int = 4,
                              block_chars: int = 1) -> DataFrame:
    """(id_a, id_b, key_a, key_b, lev): candidate pairs from a sorted
    neighborhood — records adjacent within ``window`` positions of the
    blocking-key order (key, then id for determinism) INSIDE each
    block (first ``block_chars`` characters of the key), scored with
    Levenshtein distance.  The point of blocking: candidate count is
    n*(window-1), NEVER the n² of all-pairs matching.

    Per-block windows are what make this scale-true: a GLOBAL ordered
    window would collapse to one Spark partition (the engine does not
    range-partition an unpartitioned window), so the sort is
    partitioned by the block prefix — the classic Hernandez-Stolfo
    formulation, where pairs straddling a block boundary are the
    DOCUMENTED recall trade-off and the published remedy is multi-pass
    blocking over different keys (run again with a different key_col /
    block_chars and union).  Inside a block there is no self-join at
    all: each row emits its pairs via lead(1..window-1), Levenshtein
    is a codegen expression on the pair row, and the SQL twin is the
    identical PARTITION BY + lead() construction."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if block_chars < 1:
        raise ValueError(f"block_chars must be >= 1, got {block_chars}")
    from pyspark.sql import Window

    w = (Window.partitionBy("block")
         .orderBy(F.col("key_a"), F.col("id_a")))
    base = df.select(F.col(id_col).alias("id_a"),
                     F.col(key_col).alias("key_a"),
                     F.substring(F.col(key_col), 1, block_chars)
                     .alias("block"))
    # window expressions must be top-level select items (Spark rejects
    # them nested under a Generate), so the leads land as flat columns
    # first and a second narrow projection folds them into pair rows
    led = base.select(
        "id_a", "key_a",
        *[c for j in range(1, window) for c in
          (F.lead("id_a", j).over(w).alias(f"id_b{j}"),
           F.lead("key_a", j).over(w).alias(f"key_b{j}"))])
    arms = F.array(*[
        F.struct(F.col(f"id_b{j}").alias("id_b"),
                 F.col(f"key_b{j}").alias("key_b"))
        for j in range(1, window)])
    pairs = (led
             .select("id_a", "key_a", F.explode(arms).alias("p"))
             .filter(F.col("p.id_b").isNotNull())
             .select("id_a", F.col("p.id_b").alias("id_b"),
                     "key_a", F.col("p.key_b").alias("key_b")))
    return pairs.withColumn(
        "lev", F.levenshtein("key_a", "key_b").cast("long"))


def sql_sorted_neighborhood_pairs(table: str, key_col: str,
                                  id_col: str, window: int = 4,
                                  block_chars: int = 1) -> str:
    """DuckDB twin of sorted_neighborhood_pairs over ``table`` — the
    identical PARTITION BY block + lead() construction, one UNION ALL
    arm per offset."""
    lead_cols = ",\n         ".join(
        f"lead(id_a, {j}) OVER w AS id_b{j}, "
        f"lead(key_a, {j}) OVER w AS key_b{j}"
        for j in range(1, window))
    arms = "\nUNION ALL\n".join(f"""
SELECT id_a, id_b{j} AS id_b, key_a, key_b{j} AS key_b,
       CAST(levenshtein(key_a, key_b{j}) AS BIGINT) AS lev
FROM led WHERE id_b{j} IS NOT NULL""" for j in range(1, window))
    return f"""
WITH base AS (
  SELECT {id_col} AS id_a, {key_col} AS key_a,
         substr({key_col}, 1, {block_chars}) AS block
  FROM {table}
), led AS (
  SELECT id_a, key_a,
         {lead_cols}
  FROM base
  WINDOW w AS (PARTITION BY block ORDER BY key_a, id_a)
)
{arms}
"""


def multipass_blocking_pairs(df: DataFrame, key_col: str, id_col: str,
                             window: int = 4,
                             block_chars: int = 1) -> DataFrame:
    """(id_a, id_b, lev, n_passes): Hernandez-Stolfo MULTI-PASS
    blocking — the published remedy for single-pass boundary loss:
    run the sorted neighborhood under two independent key orders (the
    raw key, and the key with its word order reversed so records
    agreeing in their tails block together), union the candidate
    pairs, and count how many passes proposed each pair (n_passes = 2
    is a strong-match prior).  Pair identity is normalized to
    id_a < id_b before the union so the same pair found in both
    directions collapses.

    Scale shape: two independent per-block window sorts (each the
    J57 single-pass shape) + one map-side-combinable groupBy on the
    normalized pair key — still zero self-joins."""
    rev_key = F.array_join(
        F.reverse(F.split(F.col(key_col), " ")), " ").alias("__revkey")
    passes = [
        sorted_neighborhood_pairs(df, key_col, id_col,
                                  window=window, block_chars=block_chars),
        sorted_neighborhood_pairs(
            df.select(F.col(id_col), rev_key),
            "__revkey", id_col, window=window, block_chars=block_chars),
    ]
    norm = [
        p.select(F.least("id_a", "id_b").alias("id_a"),
                 F.greatest("id_a", "id_b").alias("id_b"),
                 "lev")
        for p in passes]
    return (norm[0].unionByName(norm[1])
            .groupBy("id_a", "id_b")
            .agg(F.min("lev").alias("lev"),
                 F.count(F.lit(1)).cast("long").alias("n_passes")))


def sql_multipass_blocking_pairs(table: str, key_col: str, id_col: str,
                                 window: int = 4,
                                 block_chars: int = 1) -> str:
    """DuckDB twin of multipass_blocking_pairs over ``table``."""
    p1 = sql_sorted_neighborhood_pairs(table, key_col, id_col,
                                       window, block_chars)
    rev_tbl = (f"(SELECT {id_col}, array_to_string(list_reverse("
               f"string_split({key_col}, ' ')), ' ') AS __revkey "
               f"FROM {table})")
    p2 = sql_sorted_neighborhood_pairs(rev_tbl, "__revkey", id_col,
                                       window, block_chars)
    return f"""
WITH pass1 AS ({p1}), pass2 AS ({p2}),
norm AS (
  SELECT least(id_a, id_b) AS id_a, greatest(id_a, id_b) AS id_b, lev
  FROM pass1
  UNION ALL
  SELECT least(id_a, id_b) AS id_a, greatest(id_a, id_b) AS id_b, lev
  FROM pass2
)
SELECT id_a, id_b, min(lev) AS lev,
       CAST(count(*) AS BIGINT) AS n_passes
FROM norm GROUP BY id_a, id_b
"""
