"""Link-harvest operators: the reference's URL-file and site modes as
relational plans (SURVEY.md §2.A2-A4).

The extraction UDF already emits each page's in-content hrefs as the
``links`` array column; everything downstream is Spark built-ins:
posexplode preserves document order, the glob filter is one compiled
rlike alternation, and the work-list semi-joins back into ``pages``.
"""

from __future__ import annotations

import re
from typing import Iterator, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def url_file_source(spark, path: str) -> DataFrame:
    """A2: text file of URLs -> ordered DataFrame[pos, url]; blank lines
    dropped, duplicates and order preserved (scraper.py:753-767)."""
    from mdscraper_spark.operators.dedup import ws_strip

    # ws_strip, NOT F.trim: the reference's line.strip() removes ALL
    # whitespace while trim is space-only — a tab-padded url would
    # silently miss the pages semi-join (same pitfall documented at
    # dedup.ws_strip)
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("pos"),
        ws_strip(F.col("value")).alias("url"))
    return lines.filter(F.length("url") > 0)


def with_contiguous_pos(src: DataFrame) -> DataFrame:
    """Re-rank url_file_source's sparse monotonic ids into contiguous
    0-based file order WITHOUT a global single-partition sort: rank
    within each scan split in parallel, then add the split's offset
    (prefix sum over the tiny per-split count table, broadcast back).
    The only global window runs over #splits rows, not #urls.
    """
    from pyspark.sql import Window

    ranked = (src.withColumn("split", F.spark_partition_id())
              .withColumn("r", F.row_number().over(
                  Window.partitionBy("split").orderBy("pos")) - 1))
    offsets = (ranked.groupBy("split")
               .agg(F.count(F.lit(1)).alias("n"))
               .withColumn("off", F.coalesce(F.sum("n").over(
                   Window.orderBy("split")
                   .rowsBetween(Window.unboundedPreceding, -1)),
                   F.lit(0)))
               .select("split", "off"))
    return (ranked.join(F.broadcast(offsets), "split")
            .select((F.col("r") + F.col("off")).alias("pos"), "url"))


def glob_to_regex(globs: Sequence[str]) -> str:
    """fnmatch globs -> one anchored, engine-portable alternation.
    Supports * and ? (the subset the reference's fixtures exercise)."""
    parts = []
    for g in globs:
        out = []
        for ch in g:
            if ch == "*":
                out.append(".*")
            elif ch == "?":
                out.append(".")
            else:
                out.append(re.escape(ch))
        parts.append("".join(out))
    return "^(" + "|".join(parts) + ")$" if parts else "^$"


def site_seed_urls(markdown_docs: DataFrame, site_root: str,
                   exclude_pages: Sequence[str] = ()) -> DataFrame:
    """A3/A4: seed pages' harvested links -> URL work-list.

    Reproduces content_to_url_list semantics (scraper.py:666-709):
    query/fragment dropped, foreign-host absolutes rewritten onto
    site_root (path only), page-name glob exclusion, duplicates and
    document order retained (``pos``).
    """
    exploded = markdown_docs.select(
        "url", F.posexplode("links").alias("pos", "href"))
    # urlparse(href).path emulation (the reference uses it verbatim,
    # scraper.py:687-688 — including its quirks: a slash-less relative
    # href concatenates onto site_root with no separator, and a
    # mailto:/tel: href contributes its scheme-less remainder):
    #  * absolute/scheme-relative urls -> parse_url PATH (query and
    #    fragment dropped by the parser);
    #  * anything else (no netloc) -> href minus any scheme prefix,
    #    minus ?query/#fragment.
    # The old placeholder-host concat absorbed slash-less paths into
    # the fake host (PATH='') and NULLed on non-http schemes, crashing
    # the site work-list.
    href = F.col("href")
    netloc_full = href.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
    path = (F.when(netloc_full | href.startswith("//"),
                   F.coalesce(F.parse_url(
                       F.when(href.startswith("//"),
                              F.concat(F.lit("http:"), href))
                       .otherwise(href), F.lit("PATH")), F.lit("")))
            .otherwise(F.regexp_replace(
                F.regexp_replace(href, r"^[a-zA-Z][a-zA-Z0-9+.-]*:", ""),
                r"[?#].*", "")))
    page_name = F.element_at(F.split(path, "/"), -1)
    out = exploded.withColumn("url_path", path) \
                  .withColumn("page_name", page_name)
    if exclude_pages:
        out = out.filter(~F.col("page_name")
                         .rlike(glob_to_regex(exclude_pages)))
    return out.select(
        "url", "pos",
        F.concat(F.lit(site_root), F.col("url_path")).alias("harvested_url"))


DIV_ATTR_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("kind", StringType(), False),   # 'class' | 'id'
    StructField("value", StringType(), False),
])


def div_attr_census(pages: DataFrame) -> DataFrame:
    """C4 promoted from debug aid to corpus statistic: frequency of div
    class tokens / ids across the crawl — the data that tunes the
    content-name heuristic list (scraper.py:107-118)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mdscraper_spark.htmlcore.dom import parse_html

        for pdf in batches:
            rows = {"url": [], "kind": [], "value": []}
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (bytes(html).decode("utf-8", errors="replace")
                        if html is not None else "")
                try:
                    root = parse_html(text)
                except Exception:
                    continue
                for div in root.find_all("div"):
                    for token in div.attrs.get("class", "").split():
                        rows["url"].append(url)
                        rows["kind"].append("class")
                        rows["value"].append(token)
                    if div.attrs.get("id"):
                        rows["url"].append(url)
                        rows["kind"].append("id")
                        rows["value"].append(div.attrs["id"])
            yield pd.DataFrame(rows)

    per_page = pages.select("url", "html").mapInPandas(run, DIV_ATTR_SCHEMA)
    # countDistinct, matching the column's name: a page repeating a
    # class token (or holding two matching divs) is still ONE page —
    # occurrence counting would overweight repeated-container pages in
    # the heuristic-tuning statistic
    return (per_page.groupBy("kind", "value")
            .agg(F.countDistinct("url").alias("n_pages"))
            .orderBy(F.desc("n_pages"), "kind", "value"))


# ---------------------------------------------------------------------------
# URL canonicalization + URL-level dedup (SURVEY J30)
# ---------------------------------------------------------------------------

# tracking params dropped by normalize_url: the standard crawl-dedup
# blocklist (utm_* campaign family plus the big click-id params).  Kept
# in the RE2/Java-common regex subset so the DuckDB twin matches the
# identical params.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid)="

_ABS_URL_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def normalize_url(col: F.Column) -> F.Column:
    """Column expression: canonicalize an absolute http(s)-style URL for
    crawl-level dedup — the URL-identity pass a Common-Crawl-shaped
    pipeline runs BEFORE content dedup (two fetches of one page should
    never reach MinHash).

    Rules (each deterministic, replayed verbatim by
    :func:`sql_normalize_url`):

    1. scheme and host lowercased;
    2. default ports dropped (``:80`` for http, ``:443`` for https),
       any other explicit port kept;
    3. fragment dropped;
    4. tracking query params dropped (``utm_*``, ``gclid``, ``fbclid``,
       ``msclkid`` — :data:`TRACKING_PARAM_RE`);
    5. surviving query params sorted bytewise (full ``k=v`` string), so
       reordered params collide;
    6. trailing slashes stripped from the path; an empty path becomes
       ``/``;
    7. an emptied query drops its ``?``.

    Returns NULL for anything that is not an absolute ``scheme://`` URL
    (relative hrefs, mailto:, garbage) — the caller decides what
    unidentifiable means (url_dedup keeps them all).  Contract: no
    userinfo, no IPv6 bracket literals (a colon inside the authority is
    read as the port separator).

    Pure built-in expressions — regexp extracts plus one tiny
    filter/sort over the split param array — so the whole thing stays
    inside codegen/narrow projection: no shuffle, no Python, scales as
    a map at any corpus size.
    """
    url = col
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.regexp_extract(url, r"^[^:/?#]+://([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(auth, r"^([^:]*)", 1))
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    path = F.regexp_extract(url, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)

    default_port = (((scheme == "http") & (port == "80")) |
                    ((scheme == "https") & (port == "443")))
    portpart = F.when((port == "") | default_port, F.lit("")) \
                .otherwise(F.concat(F.lit(":"), port))
    stripped = F.regexp_replace(path, r"/+$", "")
    pathpart = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    qs = F.array_join(F.array_sort(params), "&")
    qpart = F.when(qs == "", F.lit("")) \
             .otherwise(F.concat(F.lit("?"), qs))
    return F.when(
        url.rlike(_ABS_URL_RE),
        F.concat(scheme, F.lit("://"), host, portpart, pathpart, qpart))


def sql_normalize_url(col: str) -> str:
    """DuckDB twin of :func:`normalize_url` — same extracts, same
    param filter/sort, same assembly, so both engines emit the
    identical canonical string."""
    scheme = f"lower(regexp_extract({col}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    auth = f"regexp_extract({col}, '^[^:/?#]+://([^/?#]*)', 1)"
    host = f"lower(regexp_extract({auth}, '^([^:]*)', 1))"
    port = f"regexp_extract({auth}, ':([0-9]+)$', 1)"
    path = f"regexp_extract({col}, '^[^:/?#]+://[^/?#]*([^?#]*)', 1)"
    query = f"regexp_extract({col}, '^[^#?]*\\?([^#]*)', 1)"
    portpart = (
        f"(CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443') THEN '' "
        f"ELSE ':' || {port} END)")
    stripped = f"regexp_replace({path}, '/+$', '')"
    pathpart = f"(CASE WHEN {stripped} = '' THEN '/' ELSE {stripped} END)"
    # coalesce: DuckDB array_to_string([]) is NULL where Spark
    # array_join([]) is '' — without it every URL whose params all get
    # filtered (or that has no query at all) NULLs the whole concat
    qs = (f"coalesce(array_to_string(list_sort(list_filter(str_split({query}, '&'), "
          f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}'))), '&'), '')")
    qpart = f"(CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END)"
    return (f"(CASE WHEN regexp_matches({col}, '{_ABS_URL_RE}') THEN "
            f"{scheme} || '://' || {host} || {portpart} || {pathpart} || {qpart} "
            f"END)")


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, url_norm, keep): URL-level dedup — canonicalize every
    URL with :func:`normalize_url` and elect the minimum doc_id per
    canonical URL as survivor.  Unparseable URLs (url_norm NULL) are
    all kept: identity unknown means no dedup decision, never a silent
    drop (and never one shared NULL group electing a single survivor).

    Scale shape: one narrow normalization map, then a single hash
    shuffle on url_norm for the unbounded-frame per-group MIN window.
    WindowExec still sorts each partition by the partition key (Spark
    groups window partitions by sorting even with no ORDER BY), but
    that is one partition-local string sort with spill — cheaper than
    the groupBy-min + corpus join-back alternative, which pays a
    second full-corpus exchange for its join.  No driver state.
    Skewed canonical URLs (one URL crawled 10^6 times) bound the
    window partition, which spills; AQE's skew handling does not apply
    inside a window, but a min over one hot key is a scan, not a
    blow-up."""
    from pyspark.sql import Window

    d = df.select(F.col(id_col).alias("doc_id"),
                  normalize_url(F.col(url_col)).alias("url_norm"))
    # unparseable urls get a per-row synthetic key ('\\0raw:' cannot
    # collide with any scheme://) instead of sharing the NULL group:
    # semantically identical (each is its own singleton survivor), but
    # it keeps a crawl with 10% malformed urls from shuffling them all
    # into ONE hot window partition
    gkey = F.coalesce(
        F.col("url_norm"),
        F.concat(F.lit("\0raw:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy(gkey)
    return d.select(
        "doc_id", "url_norm",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"))


_NORM_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/:]+)"


def inlink_counts(df: DataFrame, src_col: str = "src_url",
                  href_col: str = "href") -> DataFrame:
    """(target_url, n_inlinks, n_src_hosts): webgraph in-link
    aggregation over CANONICAL URLs — the link-popularity statistic
    crawl prioritizers and quality filters consume.  Both endpoints go
    through :func:`normalize_url` first, so tracking-param/case/port
    noise cannot split a target's in-link mass across spellings.

    Unparseable hrefs produce no edge (no canonical identity, nothing
    to count).  Unparseable SOURCE urls still count as an in-link but
    contribute no host to ``n_src_hosts`` (countDistinct skips NULL in
    both engines) — link evidence is real even when the referrer is
    malformed.

    Scale shape: narrow normalize map, one map-side-combinable groupBy
    on the canonical target.  Hub targets (the homepage every page
    links to) are exactly the skew AQE's skewed-agg handling exists
    for; n_src_hosts is exact here — swap to approx_count_distinct at
    10^12 edges if a 2-5% error contract is acceptable."""
    target = normalize_url(F.col(href_col))
    src_host = F.regexp_extract(normalize_url(F.col(src_col)),
                                _NORM_HOST_RE, 1)
    d = (df.select(target.alias("target_url"), src_host.alias("src_host"))
         .filter(F.col("target_url").isNotNull()))
    return (d.groupBy("target_url")
            .agg(F.count(F.lit(1)).alias("n_inlinks"),
                 F.countDistinct("src_host").alias("n_src_hosts")))


def sql_inlink_counts(table: str, src_col: str = "src_url",
                      href_col: str = "href") -> str:
    """DuckDB twin of inlink_counts over ``table`` (rows of one href
    each).  NULLIF: DuckDB regexp_extract yields '' on no match where
    the distinct-host count must skip the row like Spark's NULL."""
    target = sql_normalize_url(href_col)
    src_host = (f"nullif(regexp_extract({sql_normalize_url(src_col)}, "
                f"'{_NORM_HOST_RE}', 1), '')")
    return f"""
WITH e AS (
  SELECT {target} AS target_url, {src_host} AS src_host FROM {table}
)
SELECT target_url, COUNT(*) AS n_inlinks,
       COUNT(DISTINCT src_host) AS n_src_hosts
FROM e WHERE target_url IS NOT NULL
GROUP BY target_url
"""


ANCHOR_TEXT_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("href", StringType(), False),
    StructField("anchor", StringType(), False),
])


def harvest_anchor_texts(pages: DataFrame) -> DataFrame:
    """(url, href, anchor): every ``<a href>`` on every page with its
    rendered link text — the anchor corpus.  Web-scale KGs mine it as
    the primary entity-NAMING signal (what the web calls the thing a
    URL denotes), and search/crawl stacks read it as off-page document
    description; this is the harvest half.

    Anchor text is the REAL parsed subtree text (nested markup
    flattened, entities decoded by the parser) with runs of whitespace
    collapsed to single spaces; ``<a>`` without an href and anchors
    that collapse to the empty string yield no row — a link with no
    words names nothing.  Per-page parse failures drop that page's
    rows only (per-row error isolation).

    Scale shape: one narrow Arrow ``mapInPandas`` pass — no shuffle;
    row expansion is bounded by links-per-page."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mdscraper_spark.htmlcore.dom import parse_html

        for pdf in batches:
            rows = {"url": [], "href": [], "anchor": []}
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (bytes(html).decode("utf-8", errors="replace")
                        if html is not None else "")
                try:
                    root = parse_html(text)
                except Exception:
                    continue
                for a in root.find_all("a"):
                    href = a.attrs.get("href", "")
                    anchor = " ".join(a.get_text(separator=" ").split())
                    if href and anchor:
                        rows["url"].append(url)
                        rows["href"].append(href)
                        rows["anchor"].append(anchor)
            yield pd.DataFrame(rows)

    return pages.select("url", "html").mapInPandas(run, ANCHOR_TEXT_SCHEMA)


def anchor_text_rollup(links_df: DataFrame, href_col: str = "href",
                       anchor_col: str = "anchor") -> DataFrame:
    """(target_url, n_links, n_anchors, top_anchor, top_anchor_n):
    anchor-text aggregation per CANONICAL link target — the rollup half
    of the anchor corpus.  ``top_anchor`` is the plurality name the web
    gives each target (ties broken to the lexicographically smallest
    anchor, deterministic in both engines); ``n_anchors`` counts
    distinct surface names, a homonymy/popularity signal gazetteer
    builders threshold on.

    Targets go through :func:`normalize_url` so spelling noise cannot
    split a target's anchor mass; unidentifiable hrefs (relative,
    mailto:, garbage -> NULL) contribute nothing.

    Scale shape: one map-side-combinable groupBy on
    (target, anchor) — the heavy reduction happens against raw link
    volume here — then one hash shuffle of the already-aggregated
    (target, anchor) rows for the per-target windows (plurality pick +
    totals share the single partition key).  Hub targets are bounded
    by their DISTINCT anchor vocabulary after the first combine, not
    by raw in-link count, so the window partition for a 10^6-inlink
    homepage holds only its distinct names."""
    from pyspark.sql import Window

    d = (links_df
         .select(normalize_url(F.col(href_col)).alias("target_url"),
                 F.col(anchor_col).alias("anchor"))
         .filter(F.col("target_url").isNotNull()))
    counts = (d.groupBy("target_url", "anchor")
              .agg(F.count(F.lit(1)).alias("n")))
    per_tgt = Window.partitionBy("target_url")
    ranked = Window.partitionBy("target_url") \
                   .orderBy(F.desc("n"), F.asc("anchor"))
    return (counts
            .select("target_url", "anchor", "n",
                    F.sum("n").over(per_tgt).alias("n_links"),
                    F.count(F.lit(1)).over(per_tgt).alias("n_anchors"),
                    F.row_number().over(ranked).alias("rn"))
            .filter(F.col("rn") == 1)
            .select("target_url", "n_links", "n_anchors",
                    F.col("anchor").alias("top_anchor"),
                    F.col("n").alias("top_anchor_n")))


def sql_anchor_rollup(table: str) -> str:
    """DuckDB twin of :func:`anchor_text_rollup` over ``table`` (rows
    of one (href, anchor) each): same normalization, same counts, same
    (n DESC, anchor ASC) plurality tie-break.  SUM over BIGINT widens
    to HUGEINT in DuckDB, hence the explicit casts."""
    target = sql_normalize_url("href")
    return f"""
WITH e AS (
  SELECT {target} AS target_url, anchor FROM {table}
), c AS (
  SELECT target_url, anchor, COUNT(*) AS n
  FROM e WHERE target_url IS NOT NULL
  GROUP BY target_url, anchor
), r AS (
  SELECT target_url, anchor, n,
         CAST(SUM(n) OVER (PARTITION BY target_url) AS BIGINT) AS n_links,
         CAST(COUNT(*) OVER (PARTITION BY target_url) AS BIGINT)
             AS n_anchors,
         ROW_NUMBER() OVER (PARTITION BY target_url
                            ORDER BY n DESC, anchor ASC) AS rn
  FROM c
)
SELECT target_url, n_links, n_anchors, anchor AS top_anchor,
       CAST(n AS BIGINT) AS top_anchor_n
FROM r WHERE rn = 1
"""


def crawl_policy_filter(urls: DataFrame, rules: DataFrame,
                        url_col: str = "url") -> DataFrame:
    """(url, host, path, allowed): robots-style disallow filtering —
    the crawl-policy stage that runs between frontier dedup and fetch.
    ``rules`` is (host, path_prefix): a URL is disallowed iff ANY rule
    for its (case-normalized) host is a prefix of its raw path;
    no rules for a host means allowed (robots absent == crawl).

    Simplifications vs full robots.txt (documented contract): prefix
    rules only (no wildcards/Allow overrides/crawl-delay), matched on
    the raw path (no normalization — '/a//b' and '/a/b' are distinct,
    as in real robots matching, which is byte-prefix based).
    Unparseable URLs are DISALLOWED: a fetcher must never hit a url it
    cannot attribute to a host policy.

    Scale shape: the rules table is robots-sized (tiny, one row per
    disallow line) — broadcast; the corpus pays one narrow parse map
    and a broadcast left join on host with the prefix test as the
    residual predicate, then a groupBy on (url, host, path) to fold
    multiple matching rules — no corpus-sized shuffle beyond that
    fold, and a hot host (many rules) multiplies rows only by ITS rule
    count, map-side."""
    host = F.lower(F.regexp_extract(F.col(url_col),
                                    r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)",
                                    1))
    path = F.regexp_extract(F.col(url_col),
                            r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    parsed = urls.select(
        F.col(url_col).alias("url"),
        F.when(host != "", host).alias("host"),
        F.when(host != "", F.when(path != "", path).otherwise(F.lit("/")))
        .alias("path"))
    r = rules.select(F.lower(F.col("host")).alias("r_host"),
                     F.col("path_prefix").alias("r_prefix"))
    hit = (parsed.join(F.broadcast(r),
                       (F.col("host") == F.col("r_host"))
                       & F.col("path").startswith(F.col("r_prefix")),
                       "left"))
    return (hit.groupBy("url", "host", "path")
            .agg((F.count("r_prefix") == 0).alias("no_rule_hit"))
            .select("url", "host", "path",
                    (F.col("host").isNotNull() & F.col("no_rule_hit"))
                    .alias("allowed")))
