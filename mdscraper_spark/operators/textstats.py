"""Text-analysis operators for training-data pipelines.

All JVM-side (built-in pyspark.sql.functions only — whole-stage
codegen, no Python in the hot path), each with an exact ANSI-SQL twin
so the DuckDB oracle can verify values.  Determinism notes: every
float is derived by identical IEEE operations on identical inputs in
both engines; aggregates that would be order-sensitive are avoided or
made exact (decimal) first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# token pattern shared with the SQL twin (RE2/Java-compatible subset)
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny stopword inventories for the n-gram language heuristic
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "la", "les", "des", "est", "une"),
}


def _hits(col: Column, words) -> Column:
    pattern = r"\b(?:" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), F.lit(0)))


def token_count_ws(col: Column) -> Column:
    """Whitespace token count (empty/whitespace-only string -> 0).
    Strips ALL whitespace (not space-only trim) so newline-leading
    docs don't count a phantom empty token."""
    from mdscraper_spark.operators.dedup import ws_strip

    stripped = ws_strip(col)
    return F.when(F.length(stripped) == 0, F.lit(0)) \
            .otherwise(F.size(F.split(stripped, r"\s+")))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish unit count: alpha runs, digit runs, single punctuation."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), F.lit(0)))


def lang_guess(col: Column) -> Column:
    """Stopword-hit argmax with a fixed tie order (en>es>de>fr>und)."""
    hits = {lang: _hits(col, words) for lang, words in LANG_STOPWORDS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(("en", "es", "de", "fr")):  # earlier wins ties
        expr = F.when((best > 0) & (hits[lang] == best), F.lit(lang)) \
                .otherwise(expr)
    return expr


def quality_score(col: Column) -> Column:
    """Length/stopword/mean-word-length heuristic in [0,1], rounded to
    4 places (identical double math in the SQL twin)."""
    n_chars = F.length(col).cast("double")
    n_tokens = token_count_ws(col).cast("double")
    stop_hits = _hits(col, LANG_STOPWORDS["en"]).cast("double")
    mean_word = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(
        F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
        * F.lit(5.0), F.lit(1.0))
    word_score = F.when((mean_word >= 3.0) & (mean_word <= 10.0), F.lit(1.0)) \
                  .otherwise(F.lit(0.5))
    return F.round((len_score + stop_score + word_score) / F.lit(3.0), 4)


def doc_fingerprint(col: Column, prefix: int = 200) -> Column:
    """Stable content fingerprint: md5 of the whitespace-normalized
    lowercase prefix."""
    norm = F.regexp_replace(F.lower(F.substring(col, 1, prefix)),
                            r"\s+", " ")
    return F.md5(F.trim(norm))


def dup_line_frac(col: Column) -> Column:
    """Gopher-style repetition filter: fraction of non-empty lines that
    are duplicates of an earlier line (0.0 for docs with <2 lines)."""
    lines = F.filter(F.split(col, r"\n"),
                     lambda x: F.length(F.trim(x)) > 0)
    n = F.size(lines)
    return F.when(n > 1,
                  F.round((n - F.size(F.array_distinct(lines)))
                          / n.cast("double"), 6)) \
            .otherwise(F.lit(0.0))


def top_bigram_frac(col: Column) -> Column:
    """Fraction of word-bigram occurrences taken by the most frequent
    bigram (boilerplate/chant detector; Gopher-style).  Longest run in
    the sorted bigram array via a fold — per-doc arrays, no shuffle."""
    from mdscraper_spark.operators.dedup import ws_strip

    stripped = ws_strip(col)
    toks = F.split(stripped, r"\s+")
    n = F.when(F.length(stripped) == 0, F.lit(0)).otherwise(F.size(toks))
    # bigrams as zip-of-slices, NOT element_at(toks, i) inside the
    # lambda: higher-order functions are interpreted (no codegen
    # subexpression elimination — dedup.tokenize docstring), so an
    # indexed lambda re-evaluates the full split() per element = O(n²)
    # regexp work per doc.  The two slices evaluate toks a constant
    # number of times however long the doc is.
    m = F.greatest(n - F.lit(1), F.lit(0))
    pairs = F.arrays_zip(F.slice(toks, 1, m), F.slice(toks, 2, m))
    bigrams = F.when(n >= 2, F.array_sort(F.transform(
        pairs, lambda p: F.concat_ws(" ", p["0"], p["1"])))) \
               .otherwise(F.array())
    run = lambda acc, x: F.when(x == acc["prev"], acc["run"] + 1) \
                          .otherwise(F.lit(1))
    acc0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"))
    best = F.aggregate(
        bigrams, acc0,
        lambda acc, x: F.struct(
            x.alias("prev"), run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best")),
        lambda acc: acc["best"])
    return F.when(n >= 2,
                  F.round(best / F.size(bigrams).cast("double"), 6)) \
            .otherwise(F.lit(0.0))


def hash_split(id_col: Column, salt: str = "split-v1",
               train: int = 80, val: int = 10) -> Column:
    """Deterministic stratified-by-nothing train/val/test assignment:
    bucket = first 8 md5 hex chars of '{id}:{salt}' mod 100 — stable
    across engines, partitionings, and reruns (never random())."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(f":{salt}")))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 100
    return F.when(bucket < train, F.lit("train")) \
            .when(bucket < train + val, F.lit("val")) \
            .otherwise(F.lit("test"))


def domain_quota_sample(df: DataFrame, cap: int,
                        domain_col: str = "source",
                        id_col: str = "doc_id",
                        salt: str = "quota-v1") -> DataFrame:
    """(doc_id, domain, keep): cap documents per domain, electing
    survivors by a deterministic md5 priority — the per-domain quota
    pass crawl curation applies to hub sites (never random(): the same
    corpus always elects the same survivors, across engines, reruns,
    and partitionings; priorities are unique because doc ids are).

    Scale shape: one map-side-combined count pass finds the over-cap
    domains (a tiny, Zipf-headed set — broadcast); the long tail of
    under-cap domains bypasses ranking entirely and never shuffles into
    a sort, while only over-cap domains pay the per-domain window (a
    local sort with spill; rank is required — the cap-th element is an
    order statistic, not an aggregate).  Routing joins are null-safe
    because the count's groupBy treats null domains as one real group,
    so the split must agree.  Pathological single-domain skew inside
    the window is bounded by executor spill, not memory."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    prio = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}")))
    d = df.select(F.col(id_col).alias("doc_id"),
                  F.col(domain_col).alias("domain"), prio.alias("prio"))
    over = (d.groupBy("domain").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > cap)
            .select(F.col("domain").alias("o_domain")))
    cond = d["domain"].eqNullSafe(F.col("o_domain"))
    under = d.join(F.broadcast(over), cond, "left_anti") \
             .withColumn("keep", F.lit(True))
    w = Window.partitionBy("domain").orderBy("prio")
    ranked = (d.join(F.broadcast(over), cond, "left_semi")
              .withColumn("keep", F.row_number().over(w) <= cap))
    return under.unionByName(ranked).select("doc_id", "domain", "keep")


# PII patterns shared with the SQL twins: the Java-regex/RE2-common
# subset only (character classes, bounded repeats, non-capturing
# groups, ASCII \b) — no lookarounds, no backrefs, so both engines
# match the identical spans
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"
# NANP-style with REQUIRED separators (a bare 10-digit run is far more
# often an id than a phone number); optional +1 country code and area
# parens.  RE2/Java-common subset: no backrefs, no lookaround.
PHONE_PATTERN = r"(?:\+1[ .-])?\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}\b"
# 16-digit card shapes: 4 groups of 4 with optional space/dash
# separators, or one bare 16-digit run; \b keeps it out of longer
# digit runs (hashes, ids)
CC_PATTERN = r"\b\d{4}(?:[ -]?\d{4}){3}\b"


def luhn_valid(s) -> "Column":
    """Boolean column: do the digits of ``s`` pass the Luhn checksum?
    (Doubles every second digit from the right, subtracts 9 when the
    double exceeds 9, sum % 10 == 0.)  Pure array expressions over the
    handful of digits in one candidate match — applied only to
    CC_PATTERN hits, never to whole documents."""
    rev = F.reverse(F.regexp_extract_all(s, F.lit(r"\d"), 0))
    terms = F.zip_with(
        rev, F.sequence(F.lit(1), F.size(rev)),
        lambda d, i: F.when((i - 1) % 2 == 0, d.cast("int"))
                      .otherwise(F.when(d.cast("int") * 2 > 9,
                                        d.cast("int") * 2 - 9)
                                 .otherwise(d.cast("int") * 2)))
    return F.aggregate(terms, F.lit(0), lambda a, x: a + x) % 10 == 0


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, n_ccs, clean_text): count
    and redact email addresses, IPv4 literals, phone numbers, and
    credit-card-shaped digit runs — the standard pre-training PII pass.

    Counts are over the ORIGINAL text (each pattern independently);
    ``n_ccs`` counts only Luhn-VALID card candidates (a 16-digit run
    failing the checksum is an id, not a card), while redaction blanks
    every CC-shaped run regardless (conservative: a mistyped card is
    still a card).  Redaction applies emails, then phones, then IPs,
    then cards, each on the previous result — both engines scan
    left-to-right non-overlapping, so spans agree byte-for-byte.  Pure
    per-row column expressions: whole-stage codegen, no shuffle, scales
    as a narrow map at any corpus size."""
    col = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(col, EMAIL_PATTERN, "<EMAIL>"),
                PHONE_PATTERN, "<PHONE>"),
            IPV4_PATTERN, "<IP>"),
        CC_PATTERN, "<CC>")
    cc_hits = F.regexp_extract_all(col, F.lit(CC_PATTERN), F.lit(0))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(col, F.lit(EMAIL_PATTERN)).cast("bigint").alias("n_emails"),
        F.regexp_count(col, F.lit(IPV4_PATTERN)).cast("bigint").alias("n_ips"),
        F.regexp_count(col, F.lit(PHONE_PATTERN)).cast("bigint").alias("n_phones"),
        F.size(F.filter(cc_hits, luhn_valid)).cast("bigint").alias("n_ccs"),
        clean.alias("clean_text"))


def dedup_lines(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, clean_text, n_dup_lines): remove every line that is an
    exact duplicate of an EARLIER line in the same document (first
    occurrence kept, order preserved) — the removal counterpart of the
    dup_line_frac Gopher filter.

    Scale shape: entirely per-document array work (split once in its
    own projection — higher-order functions are interpreted, so the
    lambda must only reference the bound array, never re-derive it);
    the first-occurrence test is array_position == own index, O(lines²)
    string compares per doc with small constants and NO shuffle — at
    crawl scale this stays a narrow map stage."""
    d = df.select(F.col(id_col).alias("doc_id"),
                  F.split(F.col(text_col), "\n").alias("lines"))
    kept = F.filter(F.col("lines"),
                    lambda x, i: F.array_position(F.col("lines"), x) == i + 1)
    return d.select(
        "doc_id",
        F.array_join(kept, "\n").alias("clean_text"),
        (F.size("lines") - F.size(kept)).cast("int").alias("n_dup_lines"))


def contamination(docs: DataFrame, benchmark: DataFrame, k: int = 5,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: per doc, the fraction of its k-gram
    shingles that appear in ANY benchmark document.

    Scale shape: the benchmark shingle set is the small side — distinct
    md5 k-gram hashes, broadcast; the corpus side is a narrow explode +
    one groupBy(doc_id).  (doc_id, n_grams, n_hit, contaminated) with
    contaminated = hit fraction >= 0.5."""
    from mdscraper_spark.operators.dedup import (shingles_from_tokens,
                                                 tokenize)

    def sh(df):
        return (df.select(F.col(id_col).alias("doc_id"),
                          tokenize(F.col(text_col)).alias("toks"))
                .select("doc_id",
                        F.explode(F.transform(
                            shingles_from_tokens(F.col("toks"), k), F.md5))
                        .alias("h")))

    # ONE pass over the corpus: mark hits with a broadcast left join
    # (bench_set is distinct, so no row duplication) and count grams +
    # hits in the same aggregate — the previous semi-join + separate
    # totals pass shingled and exploded the entire corpus twice
    bench_set = (sh(benchmark).select("h").distinct()
                 .withColumn("bhit", F.lit(1)))
    out = (sh(docs).join(F.broadcast(bench_set), "h", "left")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_grams"),
                F.count("bhit").alias("n_hit")))
    frac = F.col("n_hit") / F.col("n_grams").cast("double")
    return out.select("doc_id", "n_grams", "n_hit",
                      (frac >= 0.5).alias("contaminated"))


def greedy_pack(docs: DataFrame, budget: int = 2048, n_buckets: int = 64,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Sequence packing for training: assign docs to token-budget packs
    (doc_id, bucket, n_tokens, pack_id).

    Scale shape: packing needs an ORDER, but a global order is a
    single-partition sort — so docs are hash-bucketed first and packed
    independently within each bucket by a running token sum (one
    shuffle, P parallel windows).  pack_id = bucket * 2^32 +
    floor(preceding_tokens / budget): a pack may overflow by its last
    doc (greedy streaming semantics); docs larger than the budget get
    their own pack run."""
    t = docs.select(F.col(id_col).alias("doc_id"),
                    (F.col(id_col) % n_buckets).alias("bucket"),
                    token_count_ws(F.col(text_col)).alias("n_tokens"))
    from pyspark.sql import Window
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    running = F.sum("n_tokens").over(w)
    pack = (F.col("bucket") * F.lit(1 << 32)
            + F.floor((running - F.col("n_tokens")) / budget))
    return t.select("doc_id", "bucket", "n_tokens",
                    pack.cast("long").alias("pack_id"))


def sql_greedy_pack(budget: int = 2048, n_buckets: int = 64) -> str:
    """DuckDB twin of greedy_pack over documents."""
    return f"""
SELECT doc_id, bucket, n_tokens,
       CAST(bucket * {1 << 32} +
            floor((running - n_tokens) / {budget}) AS BIGINT) AS pack_id
FROM (
  SELECT doc_id, doc_id % {n_buckets} AS bucket,
         {sql_token_count_ws('text')} AS n_tokens,
         SUM({sql_token_count_ws('text')}) OVER (
           PARTITION BY doc_id % {n_buckets} ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM documents)
"""


def pack_utilization(docs: DataFrame, budget: int = 2048,
                     n_buckets: int = 64, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Pack-quality observability for greedy_pack (J23): one row per
    bucket — (bucket, n_packs, n_docs, total_tokens, n_overflow_packs,
    fill_frac).  fill_frac = total_tokens / (n_packs * budget) is the
    budget fill fraction; an overflow pack is one whose token sum
    exceeds the budget (greedy streaming lets the LAST doc overflow).
    Two map-side-combined aggs over the packer's own output — the
    packer's quality becomes an oracled artifact, the same way the
    n-gram dedup reports its drop stats."""
    packs = greedy_pack(docs, budget=budget, n_buckets=n_buckets,
                        text_col=text_col, id_col=id_col)
    per_pack = (packs.groupBy("bucket", "pack_id")
                .agg(F.sum("n_tokens").alias("pack_tokens"),
                     F.count(F.lit(1)).alias("n_docs")))
    fill = F.round(F.col("total_tokens")
                   / (F.col("n_packs") * F.lit(budget)).cast("double"), 6)
    return (per_pack.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_packs"),
                 F.sum("n_docs").alias("n_docs"),
                 F.sum("pack_tokens").alias("total_tokens"),
                 F.sum((F.col("pack_tokens") > budget).cast("long"))
                 .alias("n_overflow_packs"))
            .select("bucket", "n_packs", "n_docs", "total_tokens",
                    "n_overflow_packs", fill.alias("fill_frac")))


def sql_pack_utilization(budget: int = 2048, n_buckets: int = 64) -> str:
    """DuckDB twin of pack_utilization over documents."""
    return f"""
WITH packs AS ({sql_greedy_pack(budget, n_buckets)}),
per_pack AS (
  SELECT bucket, pack_id, SUM(n_tokens) AS pack_tokens,
         COUNT(*) AS n_docs
  FROM packs GROUP BY bucket, pack_id)
SELECT bucket, COUNT(*) AS n_packs, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(pack_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN pack_tokens > {budget} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overflow_packs,
       round(SUM(pack_tokens) / CAST(COUNT(*) * {budget} AS DOUBLE), 6)
         AS fill_frac
FROM per_pack GROUP BY bucket
"""


# -- SQL twins (DuckDB dialect) ----------------------------------------------

def sql_ws_strip(col: str) -> str:
    """Canonical encoding lives in dedup.sql_ws_strip; kept as a
    delegating alias for textstats callers."""
    from mdscraper_spark.operators.dedup import sql_ws_strip as _s
    return _s(col)


def sql_token_count_ws(col: str) -> str:
    s = sql_ws_strip(col)
    return (f"CASE WHEN length({s}) = 0 THEN 0 "
            f"ELSE len(regexp_split_to_array({s}, '\\s+')) END")


def sql_token_count_bpe(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{TOKEN_PATTERN}'))"


def sql_hits(col: str, words) -> str:
    pattern = r"\b(?:" + "|".join(words) + r")\b"
    return f"len(regexp_extract_all(lower({col}), '{pattern}'))"


def sql_lang_guess(col: str) -> str:
    h = {lang: sql_hits(col, words) for lang, words in LANG_STOPWORDS.items()}
    best = f"greatest({h['en']}, {h['es']}, {h['de']}, {h['fr']})"
    return (f"CASE WHEN {best} = 0 THEN 'und' "
            f"WHEN {h['en']} = {best} THEN 'en' "
            f"WHEN {h['es']} = {best} THEN 'es' "
            f"WHEN {h['de']} = {best} THEN 'de' "
            f"ELSE 'fr' END")


def sql_quality_score(col: str) -> str:
    n_chars = f"CAST(length({col}) AS DOUBLE)"
    n_tokens = f"CAST({sql_token_count_ws(col)} AS DOUBLE)"
    stop = f"CAST({sql_hits(col, LANG_STOPWORDS['en'])} AS DOUBLE)"
    mean_word = f"(CASE WHEN {n_tokens} > 0 THEN {n_chars} / {n_tokens} ELSE 0.0 END)"
    len_score = f"least({n_chars} / 500.0, 1.0)"
    stop_score = (f"least((CASE WHEN {n_tokens} > 0 THEN {stop} / {n_tokens} "
                  f"ELSE 0.0 END) * 5.0, 1.0)")
    word_score = (f"(CASE WHEN {mean_word} >= 3.0 AND {mean_word} <= 10.0 "
                  f"THEN 1.0 ELSE 0.5 END)")
    return f"round(({len_score} + {stop_score} + {word_score}) / 3.0, 4)"


def sql_doc_fingerprint(col: str, prefix: int = 200) -> str:
    return (f"md5(trim(regexp_replace(lower(substr({col}, 1, {prefix})), "
            f"'\\s+', ' ', 'g')))")


def sql_dup_line_frac(col: str) -> str:
    lines = (f"list_filter(regexp_split_to_array({col}, '\\n'), "
             "x -> length(trim(x)) > 0)")
    return (f"(CASE WHEN len({lines}) > 1 THEN "
            f"round((len({lines}) - len(list_distinct({lines}))) "
            f"/ CAST(len({lines}) AS DOUBLE), 6) ELSE 0.0 END)")


def sql_hash_split(id_col: str, salt: str = "split-v1",
                   train: int = 80, val: int = 10) -> str:
    b = (f"(CAST('0x' || substr(md5({id_col} || ':{salt}'), 1, 8) "
         f"AS BIGINT) % 100)")
    return (f"(CASE WHEN {b} < {train} THEN 'train' "
            f"WHEN {b} < {train + val} THEN 'val' ELSE 'test' END)")


def sql_luhn_valid(expr: str) -> str:
    """DuckDB boolean: digits of ``expr`` pass the Luhn checksum —
    the exact twin of ``luhn_valid`` (reverse digits, double evens,
    -9 when >9, sum % 10 = 0).  ``expr`` may be a lambda variable
    (nested lambdas are fine in DuckDB)."""
    rev = f"list_reverse(regexp_extract_all({expr}, '\\d'))"
    return (f"(list_sum(list_transform(range(1, len({rev}) + 1), "
            f"i -> CASE WHEN (i-1) % 2 = 0 THEN {rev}[i]::INT "
            f"ELSE CASE WHEN 2*{rev}[i]::INT > 9 THEN 2*{rev}[i]::INT - 9 "
            f"ELSE 2*{rev}[i]::INT END END)) % 10 = 0)")


def sql_pii_counts(col: str) -> str:
    """n_emails, n_ips, n_phones, n_ccs as SELECT-list items (DuckDB
    regexp_extract_all returns full-match lists; len == Java's
    regexp_count of non-overlapping matches; n_ccs filters candidates
    through the Luhn twin exactly like the Spark side)."""
    return (f"len(regexp_extract_all({col}, '{EMAIL_PATTERN}')) AS n_emails, "
            f"len(regexp_extract_all({col}, '{IPV4_PATTERN}')) AS n_ips, "
            f"len(regexp_extract_all({col}, '{PHONE_PATTERN}')) AS n_phones, "
            f"len(list_filter(regexp_extract_all({col}, '{CC_PATTERN}'), "
            f"m -> {sql_luhn_valid('m')})) AS n_ccs")


def sql_pii_clean(col: str) -> str:
    return (f"regexp_replace(regexp_replace(regexp_replace(regexp_replace("
            f"{col}, '{EMAIL_PATTERN}', '<EMAIL>', 'g'), "
            f"'{PHONE_PATTERN}', '<PHONE>', 'g'), "
            f"'{IPV4_PATTERN}', '<IP>', 'g'), "
            f"'{CC_PATTERN}', '<CC>', 'g')")


def chunk_documents(df: DataFrame, chunk_tokens: int = 512,
                    overlap: int = 64, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): sliding token-window
    chunking — the pre-training/RAG pass that turns documents into
    fixed-budget training sequences with ``overlap`` tokens of context
    carried across the boundary.

    Window semantics (replayed exactly by the SQL twin in the registry
    row): tokens are the canonical whitespace tokenization
    (``dedup.tokenize``); chunk ``i`` covers tokens ``[i*stride,
    i*stride + chunk_tokens)`` with ``stride = chunk_tokens - overlap``;
    the chunk count is ``max(1, ceil((n - overlap) / stride))`` so the
    final chunk is never an overlap-only stub; chunk text is the
    single-space join of its tokens (token-level reconstruction — at
    training time the tokenizer output is the artifact, not the raw
    spans).  Whitespace-only documents yield ZERO chunks (gate on the
    stripped text, replayed in SQL).

    Scale shape: two narrow projections and one explode — no shuffle at
    all; output size is input tokens x (1 + overlap/stride), the
    explicit duplication budget of overlap chunking.  The slice runs
    OUTSIDE any lambda on the bound token array (interpreted-HOF
    rule)."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}")
    from mdscraper_spark.operators.dedup import tokenize, ws_strip

    stride = chunk_tokens - overlap
    d = (df.filter(F.length(ws_strip(F.col(text_col))) > 0)
         .select(F.col(id_col).alias("doc_id"),
                 tokenize(F.col(text_col)).alias("toks")))
    n = F.size("toks")
    n_chunks = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)))
    c = d.select(
        "doc_id", "toks",
        F.explode(F.sequence(F.lit(0).cast("bigint"),
                             n_chunks - 1)).alias("chunk_id"))
    ctoks = F.slice(c["toks"],
                    (c["chunk_id"] * stride + 1).cast("int"), chunk_tokens)
    return c.select(
        "doc_id", "chunk_id",
        F.size(ctoks).cast("bigint").alias("n_tokens"),
        F.array_join(ctoks, " ").alias("chunk_text"))


def sql_chunk_documents(table: str, chunk_tokens: int, overlap: int,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB twin of chunk_documents over ``table`` — same gate, same
    chunk-count arithmetic, same 1-based clamped slice."""
    from mdscraper_spark.operators.dedup import sql_tokens, sql_ws_strip

    stride = chunk_tokens - overlap
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc_id, {sql_tokens(text_col)} AS toks
  FROM {table}
  WHERE length({sql_ws_strip(text_col)}) > 0
), ex AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(greatest(1,
           ceil((len(toks) - {overlap})::DOUBLE / {stride})) AS BIGINT)))
           AS chunk_id
  FROM tok
)
SELECT doc_id, chunk_id,
       CAST(len(toks[chunk_id * {stride} + 1 :
                     chunk_id * {stride} + {chunk_tokens}]) AS BIGINT)
         AS n_tokens,
       array_to_string(toks[chunk_id * {stride} + 1 :
                            chunk_id * {stride} + {chunk_tokens}], ' ')
         AS chunk_text
FROM ex
"""


_PPM = 1_000_000


def balanced_sample(df: DataFrame, quota: int,
                    stratum_col: str = "lang",
                    id_col: str = "doc_id",
                    salt: str = "balance-v1") -> DataFrame:
    """(doc_id, stratum, rate_ppm, keep): quota-based stratum-balanced
    Bernoulli sampling — downsample each stratum (language, source...)
    toward ``quota`` EXPECTED survivors by a deterministic salted-md5
    coin, the way a 100 TB corpus rebalances languages.

    This is the shuffle-free counterpart of ``domain_quota_sample``:
    exact-K election needs a per-group sort; a hash-Bernoulli rate
    needs none — the right trade at crawl scale when ±sqrt(n) variance
    around the quota is acceptable.  Rates are integers in parts-per-
    million computed with exact arithmetic (``(q·PPM − q·PPM mod n)/n``
    — an exact-multiple IEEE division, bit-identical in both engines;
    never a bare float divide whose rounding could flip a boundary
    doc), so the same corpus elects the same survivors across engines,
    partitionings, and reruns.  Under-quota strata rate at 1.0 and
    keep everything.

    Scale shape: one map-side-combined count pass over strata (a tiny
    table — broadcast back with a null-safe equi-join: groupBy treats
    NULL strata as one real group, so the join must agree), then a
    narrow per-row hash compare.  No window, no sort, no driver state.
    """
    if quota < 0:
        raise ValueError(f"quota must be >= 0, got {quota}")
    qppm = quota * _PPM
    counts = (df.groupBy(F.col(stratum_col).alias("s_stratum"))
              .agg(F.count(F.lit(1)).alias("n")))
    rate = F.least(F.lit(_PPM).cast("bigint"),
                   ((F.lit(qppm) - F.lit(qppm) % F.col("n")) / F.col("n"))
                   .cast("bigint"))
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}")))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _PPM
    cond = F.col(stratum_col).eqNullSafe(F.col("s_stratum"))
    return (df.join(F.broadcast(counts.withColumn("rate_ppm", rate)
                                .select("s_stratum", "rate_ppm")), cond)
            .select(F.col(id_col).alias("doc_id"),
                    F.col(stratum_col).alias("stratum"),
                    "rate_ppm",
                    (bucket < F.col("rate_ppm")).alias("keep")))


def sql_balanced_sample(table: str, quota: int,
                        stratum_col: str = "lang",
                        id_col: str = "doc_id",
                        salt: str = "balance-v1") -> str:
    """DuckDB twin of balanced_sample over ``table`` — identical
    exact-multiple rate arithmetic and md5-prefix coin."""
    qppm = quota * _PPM
    return f"""
WITH c AS (
  SELECT {stratum_col} AS s_stratum, count(*) AS n
  FROM {table} GROUP BY {stratum_col}
), r AS (
  SELECT s_stratum,
         CAST(least({_PPM}, ({qppm} - {qppm} % n) / n) AS BIGINT) AS rate_ppm
  FROM c
)
SELECT d.{id_col} AS doc_id, d.{stratum_col} AS stratum, r.rate_ppm,
       ((CAST('0x' || substr(md5(d.{id_col} || ':{salt}'), 1, 8) AS BIGINT)
         % {_PPM}) < r.rate_ppm) AS keep
FROM {table} d JOIN r ON d.{stratum_col} IS NOT DISTINCT FROM r.s_stratum
"""


def corpus_shuffle(df: DataFrame, n_shards: int,
                   id_col: str = "doc_id",
                   salt: str = "shuffle-v1") -> DataFrame:
    """(doc_id, shard, pos): deterministic global corpus shuffle — the
    training-order materialization step: every doc gets a shard and a
    dense 0-based position inside it, both derived from a salted md5 so
    the same corpus always yields the same training order (changing
    ``salt`` is the epoch reshuffle; never ``rand()``, which breaks
    resume and engine parity).

    Scale shape: the shard assignment is a narrow hash map; ordering
    happens INSIDE each shard (one hash shuffle + P independent
    partition-local sorts over ~N/P rows each) — there is no global
    sort and no single-partition bottleneck, which is why training
    pipelines shard first and order second.  Tie-break on doc_id makes
    the order total even under md5-prefix collisions."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}")))
    d = df.select(F.col(id_col).alias("doc_id"), h.alias("prio"))
    shard = (F.conv(F.substring("prio", 1, 8), 16, 10).cast("bigint")
             % n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy("prio", "doc_id")
    return (d.withColumn("shard", shard)
            .select("doc_id", "shard",
                    (F.row_number().over(w) - 1).cast("bigint").alias("pos")))


def sql_corpus_shuffle(table: str, n_shards: int,
                       id_col: str = "doc_id",
                       salt: str = "shuffle-v1") -> str:
    """DuckDB twin of corpus_shuffle over ``table``."""
    h = f"md5({id_col} || ':{salt}')"
    shard = (f"CAST(CAST('0x' || substr({h}, 1, 8) AS BIGINT) "
             f"% {n_shards} AS INT)")
    return f"""
WITH s AS (
  SELECT {id_col} AS doc_id, {h} AS prio, {shard} AS shard FROM {table}
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY prio, doc_id) - 1
            AS BIGINT) AS pos
FROM s
"""


def corpus_ngram_counts(df: DataFrame, n: int = 2, min_count: int = 2,
                        top_k: int | None = None,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(ngram, n_occurrences, n_docs): corpus-wide word n-gram
    frequency table — the artifact tokenizer training, LM smoothing,
    and boilerplate mining read.  ``min_count`` prunes the Zipf tail
    (the overwhelming bulk of distinct n-grams are singletons — at
    crawl scale the HAVING filter is what makes the result
    materializable); ``top_k`` additionally keeps only the head under
    the total order (count DESC, ngram ASC — deterministic at the
    boundary, no ties possible on the full key).

    Scale shape: n-grams per doc via zip-of-n-slices on the bound
    token array (the interpreted-HOF rule: never element_at(toks, i)
    inside the lambda), one narrow explode, ONE map-side-combinable
    groupBy on the n-gram; the top-k runs on the post-HAVING table as
    a per-partition heap (TakeOrdered), never a full sort
    materialization."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    from mdscraper_spark.operators.dedup import tokenize, ws_strip

    d = (df.filter(F.length(ws_strip(F.col(text_col))) > 0)
         .select(F.col(id_col).alias("doc_id"),
                 tokenize(F.col(text_col)).alias("toks")))
    m = F.size("toks") - F.lit(n - 1)
    slices = [F.slice("toks", i + 1, m) for i in range(n)]
    zipped = F.arrays_zip(*slices) if n > 1 else None
    grams = (F.transform(zipped,
                         lambda p: F.concat_ws(
                             " ", *[p[str(i)] for i in range(n)]))
             if n > 1 else F.col("toks"))
    e = (d.filter(m > 0)
         .select("doc_id", F.explode(grams).alias("ngram")))
    out = (e.groupBy("ngram")
           .agg(F.count(F.lit(1)).alias("n_occurrences"),
                F.countDistinct("doc_id").alias("n_docs"))
           .filter(F.col("n_occurrences") >= min_count))
    if top_k is not None:
        out = out.orderBy(F.desc("n_occurrences"), "ngram").limit(top_k)
    return out


def sql_corpus_ngram_counts(table: str, n: int = 2, min_count: int = 2,
                            top_k: int | None = None,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> str:
    """DuckDB twin of corpus_ngram_counts over ``table``."""
    from mdscraper_spark.operators.dedup import sql_tokens, sql_ws_strip

    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    limit = f"LIMIT {top_k}" if top_k is not None else ""
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, {sql_tokens(text_col)} AS toks
  FROM {table}
  WHERE length({sql_ws_strip(text_col)}) > 0
), g AS (
  SELECT doc_id,
         unnest([{parts} FOR i IN range(1, len(toks) - {n} + 2)]) AS ngram
  FROM t WHERE len(toks) >= {n}
)
SELECT ngram, count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs
FROM g GROUP BY ngram
HAVING count(*) >= {min_count}
ORDER BY n_occurrences DESC, ngram {limit}
"""


def unigram_logprob(df: DataFrame, min_count: int = 2,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, avg_logprob): mean unigram log-probability of
    each document under the corpus's OWN unigram model — the
    perplexity-proxy quality signal training-data curation ranks by
    (gibberish and boilerplate-free word salad score far below prose
    made of common words).  p(token) = corpus_count / corpus_total;
    tokens whose corpus count falls below ``min_count`` (the Zipf
    singleton tail) are floored at 1/corpus_total, so one hapax does
    not dominate a document's mean.

    Scale shape: ONE map-side-combinable groupBy(token) builds the
    count table; the HAVING-style ``min_count`` filter prunes the
    (overwhelmingly singleton) tail before the join, exactly like
    corpus_ngram_counts; the exploded-tokens ⋈ counts join is the one
    wide op — token frequency is Zipf-skewed (stop words are hot
    keys), which AQE's skew split handles, and the per-doc mean
    combines map-side.  corpus_total is a single scalar pulled to the
    driver (same bounded-.first() contract as pagerank's dangling
    mass).  Rounded to 6 so Spark's and the oracle's double summation
    order agree."""
    from mdscraper_spark.operators.dedup import tokenize, ws_strip

    toks = (df.filter(F.length(ws_strip(F.col(text_col))) > 0)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(tokenize(F.col(text_col))).alias("token")))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c")).first()[0]
    if not total:
        # cast matches the normal path's schema exactly (count -> long,
        # round(avg(...)) -> double) so an empty corpus unions cleanly
        return toks.select("doc_id",
                           F.lit(0).cast("long").alias("n_tokens"),
                           F.lit(0.0).cast("double").alias("avg_logprob"))
    vocab = counts.filter(F.col("c") >= min_count)
    return (toks.join(vocab, "token", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(F.log(
                     F.coalesce(F.col("c"), F.lit(1))
                     / F.lit(float(total)))), 6).alias("avg_logprob")))


def sql_unigram_logprob(table: str, min_count: int = 2,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB twin of unigram_logprob over ``table``."""
    from mdscraper_spark.operators.dedup import sql_tokens, sql_ws_strip

    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, unnest({sql_tokens(text_col)}) AS token
  FROM {table}
  WHERE length({sql_ws_strip(text_col)}) > 0
), c AS (
  SELECT token, COUNT(*) AS c FROM t GROUP BY token
), tot AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS total FROM c
), v AS (
  SELECT token, c FROM c WHERE c >= {min_count}
)
SELECT doc_id, COUNT(*) AS n_tokens,
       round(AVG(ln(COALESCE(v.c, 1) / (SELECT total FROM tot))), 6)
           AS avg_logprob
FROM t LEFT JOIN v USING (token)
GROUP BY doc_id
"""


def tfidf_topk(df: DataFrame, k: int = 5,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, token, score, rk): top-``k`` keywords per document by
    tf-idf over the corpus itself — the per-doc summary signal topic
    sampling, index building and dedup triage read.  Only alphabetic
    tokens of length >= 3 are keyword candidates; idf = ln(N/df) with
    N = documents contributing any token (so stop words present in
    every doc score 0 and fall out of the head naturally — no
    hand-curated stop list).

    Scale shape: tf and df are each ONE map-side-combinable groupBy;
    the tf ⋈ df join is on the Zipf-skewed token key (AQE skew split);
    the per-doc head is a row_number window partitioned by doc_id —
    a per-partition top-k, never a global sort.  N is a driver scalar
    (bounded-.first() contract).  Ranking runs on the ROUNDED score
    (round 6) with token as the total-order tie-break, the same
    boundary-determinism rule every top-k row in the registry uses."""
    from pyspark.sql.window import Window

    from mdscraper_spark.operators.dedup import tokenize, ws_strip

    toks = (df.filter(F.length(ws_strip(F.col(text_col))) > 0)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(tokenize(F.col(text_col))).alias("token")))
    n = toks.select("doc_id").distinct().count()
    ft = (toks.filter(F.col("token").rlike(r"^[A-Za-z]{3,}$"))
          .groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = ft.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (ft.join(dfreq, "token")
              .select("doc_id", "token",
                      F.round(F.col("tf")
                              * F.log(F.lit(float(n)) / F.col("df")), 6)
                      .alias("score")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"),
                                             F.asc("token"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("doc_id", "token", "score", "rk"))


def sql_tfidf_topk(table: str, k: int = 5,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    """DuckDB twin of tfidf_topk over ``table``."""
    from mdscraper_spark.operators.dedup import sql_tokens, sql_ws_strip

    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, unnest({sql_tokens(text_col)}) AS token
  FROM {table}
  WHERE length({sql_ws_strip(text_col)}) > 0
), ft AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM t WHERE regexp_matches(token, '^[A-Za-z]{{3,}}$')
  GROUP BY doc_id, token
), dfreq AS (
  SELECT token, COUNT(*) AS df FROM ft GROUP BY token
), n AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM t
), s AS (
  SELECT doc_id, ft.token,
         round(tf * ln((SELECT n FROM n) / df), 6) AS score
  FROM ft JOIN dfreq ON dfreq.token = ft.token
), r AS (
  SELECT doc_id, token, score,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, token ASC) AS INT)
             AS rk
  FROM s
)
SELECT doc_id, token, score, rk FROM r WHERE rk <= {k}
"""


def weighted_sample_topk(df: DataFrame, k: int = 100,
                         weight_col: str = "n_chars",
                         id_col: str = "doc_id",
                         salt: str = "wsample-v1") -> DataFrame:
    """(doc_id, weight, key): deterministic weighted sample WITHOUT
    replacement via Efraimidis–Spirakis exponential keys — the
    standard distributed weighted reservoir.  Each row gets
    key = ln(u)/w with u a deterministic md5-prefix uniform in (0, 1]
    (same engine-portable coin as balanced_sample) and w its weight;
    the k LARGEST keys are the sample, with inclusion probability
    proportional to weight, reproducible across engines, partition
    layouts and reruns, and re-drawable by changing ``salt``.

    Scale shape: the key is a narrow per-row projection (no shuffle),
    and the head is orderBy+limit — Spark compiles that to
    TakeOrderedAndProject, a per-partition k-heap merged on the
    driver, never a global sort materialization.  Keys are rounded
    (9 dp) BEFORE ranking with id tie-break, the registry's standard
    boundary-determinism rule."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}")))
    x = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    u = (x + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    key = F.round(F.log(u) / w, 9)
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.col(weight_col).alias("weight"),
                      key.alias("key"))
            .orderBy(F.desc("key"), F.asc("doc_id"))
            .limit(k))


def sql_weighted_sample_topk(table: str, k: int = 100,
                             weight_col: str = "n_chars",
                             id_col: str = "doc_id",
                             salt: str = "wsample-v1") -> str:
    """DuckDB twin of weighted_sample_topk over ``table``."""
    return f"""
SELECT {id_col} AS doc_id, {weight_col} AS weight,
       round(ln((CAST(('0x' || substr(md5({id_col}::VARCHAR || ':{salt}'),
                       1, 15)) AS BIGINT) + 1)
                / 1152921504606846976.0)
             / greatest(CAST({weight_col} AS DOUBLE), 1.0), 9) AS key
FROM {table}
ORDER BY key DESC, doc_id ASC
LIMIT {k}
"""


def mixture_schedule(df: DataFrame, weight: Column,
                     source_col: str = "source",
                     id_col: str = "doc_id",
                     salt: str = "mix-v1") -> DataFrame:
    """(doc_id, source, src_rank, mix_key): deterministic multi-source
    mixing schedule — the data-mixing step that turns per-source
    corpora into ONE training stream with per-source sampling rates.
    Each source is internally shuffled by the md5 coin (src_rank), and
    mix_key = src_rank / weight(source) is the row's arrival time
    under rate-``weight`` interleaving: streaming the corpus in
    mix_key order yields source proportions matching the weights at
    every prefix (the standard deterministic-interleave construction).

    No global sort is materialized here: mix_key is a narrow per-row
    value; consumers shard by hash and sort shard-locally, exactly the
    corpus_shuffle discipline.  One shuffle total (the per-source
    window); a skewed mega-source is one hot partition handled by
    AQE's skew split at scale.  ``weight`` must be a deterministic
    expression over the row (replayed verbatim by the SQL oracle)."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}")))
    w = Window.partitionBy(source_col).orderBy(h.asc(),
                                               F.col(id_col).asc())
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.col(source_col).alias("source"),
                      F.row_number().over(w).alias("src_rank"),
                      weight.cast("double").alias("w"))
            .select("doc_id", "source", "src_rank",
                    F.round(F.col("src_rank") / F.col("w"), 9)
                    .alias("mix_key")))


def sql_mixture_schedule(table: str, weight_sql: str,
                         source_col: str = "source",
                         id_col: str = "doc_id",
                         salt: str = "mix-v1") -> str:
    """DuckDB twin of mixture_schedule; ``weight_sql`` must replay the
    Spark weight expression verbatim."""
    return f"""
WITH r AS (
  SELECT {id_col} AS doc_id, {source_col} AS source,
         CAST(row_number() OVER (
             PARTITION BY {source_col}
             ORDER BY md5({id_col}::VARCHAR || ':{salt}') ASC,
                      {id_col} ASC) AS INT) AS src_rank,
         CAST({weight_sql} AS DOUBLE) AS w
  FROM {table}
)
SELECT doc_id, source, src_rank, round(src_rank / w, 9) AS mix_key
FROM r
"""


def source_health_rollup(df: DataFrame,
                         text_col: str = "text",
                         source_col: str = "source",
                         id_col: str = "doc_id") -> DataFrame:
    """(source, n_docs, n_dup_docs, dup_rate, mean_quality,
    mean_tokens): the per-source crawl-health dashboard — the table an
    operator reads to decide which feeds to throttle, re-crawl or
    drop.  A doc is a within-source duplicate when its exact content
    hash repeats inside the SAME source (mirror feeds self-duplicate
    long before they collide across feeds); quality and token counts
    reuse the registry's own scoring columns so the dashboard cannot
    drift from the per-doc operators.

    Scale shape: one groupBy(source, content_hash) with map-side
    combine, then one groupBy(source) — both on the (modest) source
    key space; the per-doc quality/token columns are narrow codegen
    folds computed in the same pass.  No joins at all."""
    per_doc = df.select(
        F.col(source_col).alias("source"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("h"),
        quality_score(F.col(text_col)).alias("q"),
        token_count_ws(F.col(text_col)).cast("double").alias("t"))
    per_hash = (per_doc.groupBy("source", "h")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("q").alias("sq"),
                     F.sum("t").alias("st")))
    return (per_hash.groupBy("source")
            .agg(F.sum("n").alias("n_docs"),
                 F.sum(F.col("n") - 1).alias("n_dup_docs"),
                 F.round(F.sum(F.col("n") - 1) / F.sum("n"), 6)
                 .alias("dup_rate"),
                 F.round(F.sum("sq") / F.sum("n"), 6)
                 .alias("mean_quality"),
                 F.round(F.sum("st") / F.sum("n"), 6)
                 .alias("mean_tokens")))


def sql_source_health_rollup(table: str,
                             text_col: str = "text",
                             source_col: str = "source",
                             id_col: str = "doc_id") -> str:
    """DuckDB twin of source_health_rollup over ``table``."""
    return f"""
WITH per_doc AS (
  SELECT {source_col} AS source,
         md5(COALESCE({text_col}, '')) AS h,
         {sql_quality_score(text_col)} AS q,
         CAST({sql_token_count_ws(text_col)} AS DOUBLE) AS t
  FROM {table}
), per_hash AS (
  SELECT source, h, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(q) AS sq, SUM(t) AS st
  FROM per_doc GROUP BY source, h
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(SUM(n - 1) AS BIGINT) AS n_dup_docs,
       round(SUM(n - 1) / CAST(SUM(n) AS DOUBLE), 6) AS dup_rate,
       round(SUM(sq) / SUM(n), 6) AS mean_quality,
       round(SUM(st) / SUM(n), 6) AS mean_tokens
FROM per_hash GROUP BY source
"""


# Gopher / MassiveText rule-filter stop words (Rae et al. 2021,
# appendix A): a doc must contain at least two of these as whole
# (lowercased) tokens to pass the stop-word rule.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_words: int = 50,
                 max_words: int = 100_000) -> DataFrame:
    """Per-document Gopher/MassiveText rule-filter breakdown — unlike
    the scalar ``quality_score``, curation pipelines need the PER-RULE
    booleans (which rule killed a doc drives threshold tuning and
    corpus forensics).  Rules, with the published thresholds as
    defaults: word count in [min_words, max_words]; mean word length
    in [3, 10]; symbol-to-word ratio ('#' plus '...'/'…' ellipses)
    <= 0.1; <= 90% of non-empty lines bullet-led ('- ', '* ', '•');
    <= 30% of non-empty lines ellipsis-terminated; >= 80% of words
    containing an alphabetic character; >= 2 distinct GOPHER_STOPWORDS
    present as whole tokens.  ``gopher_pass`` is the AND of all seven.

    Every rule compares against the ROUNDED fraction it also emits, so
    the SQL twin (``sql_gopher_rules``) agrees at rule boundaries by
    construction — the booleans and their evidence columns cannot
    diverge.

    Scale shape: a narrow per-row projection — no shuffle, no join, no
    UDF; token and line arrays are bound once per stage (interpreted-
    HOF rule: an inline split() inside a lambda re-splits per
    element)."""
    from mdscraper_spark.operators.dedup import tokenize, ws_strip

    stripped = ws_strip(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        F.when(F.length(stripped) == 0,
               F.array().cast("array<string>"))
         .otherwise(tokenize(F.col(text_col))).alias("toks"),
        F.filter(
            F.transform(F.split(F.col(text_col), r"\n"),
                        lambda x: F.regexp_replace(x, r"^\s+|\s+$", "")),
            lambda x: F.length(x) > 0).alias("lines"))
    s2 = base.select(
        "doc_id", "_t", "lines",
        F.size("toks").cast("long").alias("n_words"),
        F.transform("toks", lambda t: F.lower(t)).alias("ltoks"),
        F.size(F.filter("toks", lambda t: t.rlike("[A-Za-z]")))
         .cast("long").alias("n_alpha"),
        F.length(F.concat_ws("", F.col("toks"))).cast("long")
         .alias("sum_len"))
    n = F.col("n_words")
    nd = n.cast("double")
    n_lines = F.size("lines").cast("long")
    nld = n_lines.cast("double")
    n_sym = (F.regexp_count(F.col("_t"), F.lit("#"))
             + F.regexp_count(F.col("_t"), F.lit(r"\.{3}"))
             + F.regexp_count(F.col("_t"), F.lit("…")))
    n_bullet = F.size(F.filter(
        "lines", lambda x: (x.startswith("- ") | x.startswith("* ")
                            | x.startswith("•"))))
    n_ell = F.size(F.filter(
        "lines", lambda x: x.endswith("...") | x.endswith("…")))
    n_stop = sum(
        F.array_contains("ltoks", w).cast("int")
        for w in GOPHER_STOPWORDS).cast("long")
    s3 = s2.select(
        "doc_id", "n_words",
        F.round(F.when(n > 0, F.col("sum_len") / nd)
                 .otherwise(F.lit(0.0)), 4).alias("mean_word_len"),
        F.round(F.when(n > 0, n_sym / nd)
                 .otherwise(F.lit(0.0)), 6).alias("symbol_ratio"),
        F.round(F.when(n_lines > 0, n_bullet / nld)
                 .otherwise(F.lit(0.0)), 6).alias("bullet_frac"),
        F.round(F.when(n_lines > 0, n_ell / nld)
                 .otherwise(F.lit(0.0)), 6).alias("ellipsis_line_frac"),
        F.round(F.when(n > 0, F.col("n_alpha") / nd)
                 .otherwise(F.lit(0.0)), 6).alias("alpha_frac"),
        n_stop.alias("n_stop_hits"))
    rules = {
        "ok_word_count": (F.col("n_words") >= min_words)
                         & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= 3.0)
                            & (F.col("mean_word_len") <= 10.0),
        "ok_symbol_ratio": F.col("symbol_ratio") <= 0.1,
        "ok_bullet_lines": F.col("bullet_frac") <= 0.9,
        "ok_ellipsis_lines": F.col("ellipsis_line_frac") <= 0.3,
        "ok_alpha_words": F.col("alpha_frac") >= 0.8,
        "ok_stopwords": F.col("n_stop_hits") >= 2,
    }
    out = s3.select(
        "*", *[c.alias(name) for name, c in rules.items()])
    passed = rules["ok_word_count"]
    for name in list(rules)[1:]:
        passed = passed & F.col(name)
    return out.withColumn("gopher_pass", passed)


def sql_gopher_rules(table: str, text_col: str = "text",
                     id_col: str = "doc_id",
                     min_words: int = 50,
                     max_words: int = 100_000) -> str:
    """DuckDB twin of gopher_rules over ``table``."""
    from mdscraper_spark.operators.dedup import sql_tokens, sql_ws_strip

    stop_sum = " + ".join(
        f"(CASE WHEN list_contains(ltoks, '{w}') THEN 1 ELSE 0 END)"
        for w in GOPHER_STOPWORDS)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {text_col} AS _t,
         CASE WHEN length({sql_ws_strip(text_col)}) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE {sql_tokens(text_col)} END AS toks,
         list_filter(
           list_transform(regexp_split_to_array({text_col}, '\\n'),
                          x -> regexp_replace(x, '^\\s+|\\s+$', '', 'g')),
           x -> length(x) > 0) AS lines
  FROM {table}
), s2 AS (
  SELECT doc_id, _t, lines,
         CAST(len(toks) AS BIGINT) AS n_words,
         list_transform(toks, t -> lower(t)) AS ltoks,
         CAST(len(list_filter(toks,
              t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
         CAST(length(array_to_string(toks, '')) AS BIGINT) AS sum_len
  FROM base
), s3 AS (
  SELECT doc_id, n_words,
         round(CASE WHEN n_words > 0
               THEN sum_len / CAST(n_words AS DOUBLE)
               ELSE 0.0 END, 4) AS mean_word_len,
         round(CASE WHEN n_words > 0
               THEN (len(regexp_extract_all(_t, '#'))
                     + len(regexp_extract_all(_t, '\\.{{3}}'))
                     + len(regexp_extract_all(_t, '…')))
                    / CAST(n_words AS DOUBLE)
               ELSE 0.0 END, 6) AS symbol_ratio,
         round(CASE WHEN len(lines) > 0
               THEN len(list_filter(lines,
                    x -> starts_with(x, '- ') OR starts_with(x, '* ')
                         OR starts_with(x, '•')))
                    / CAST(len(lines) AS DOUBLE)
               ELSE 0.0 END, 6) AS bullet_frac,
         round(CASE WHEN len(lines) > 0
               THEN len(list_filter(lines,
                    x -> ends_with(x, '...') OR ends_with(x, '…')))
                    / CAST(len(lines) AS DOUBLE)
               ELSE 0.0 END, 6) AS ellipsis_line_frac,
         round(CASE WHEN n_words > 0
               THEN n_alpha / CAST(n_words AS DOUBLE)
               ELSE 0.0 END, 6) AS alpha_frac,
         CAST({stop_sum} AS BIGINT) AS n_stop_hits
  FROM s2
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
       ellipsis_line_frac, alpha_frac, n_stop_hits,
       (n_words >= {min_words} AND n_words <= {max_words})
           AS ok_word_count,
       (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
           AS ok_mean_word_len,
       (symbol_ratio <= 0.1) AS ok_symbol_ratio,
       (bullet_frac <= 0.9) AS ok_bullet_lines,
       (ellipsis_line_frac <= 0.3) AS ok_ellipsis_lines,
       (alpha_frac >= 0.8) AS ok_alpha_words,
       (n_stop_hits >= 2) AS ok_stopwords,
       (n_words >= {min_words} AND n_words <= {max_words}
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
        AND ellipsis_line_frac <= 0.3 AND alpha_frac >= 0.8
        AND n_stop_hits >= 2) AS gopher_pass
FROM s3
"""


# C4's published line-level cleaning (Raffel et al. 2020, "Exploring
# the Limits of Transfer Learning...", §2.2; phrase list from the
# public c4 TFDS implementation).  Kept as module constants so the
# Spark operator and the DuckDB twin are generated from one list.
C4_POLICY_PHRASES = (
    "terms of use", "privacy policy", "cookie policy",
    "uses cookies", "use of cookies", "use cookies",
)
C4_TERMINAL = (".", "!", "?", '"')


def c4_line_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words_per_line: int = 5,
                   min_kept_lines: int = 3) -> DataFrame:
    """Per-document C4 line-level cleaning breakdown — the published
    heuristics that built the Colossal Clean Crawled Corpus, the
    line-granular complement of the page-granular Gopher rules
    (``gopher_rules``).  A line (trimmed, non-empty) is KEPT iff it
    (a) ends in a terminal punctuation mark (``. ! ? "``),
    (b) has >= ``min_words_per_line`` whitespace words,
    (c) does not contain "javascript" (case-insensitive), and
    (d) contains none of the C4 policy phrases (cookie/privacy/terms
    boilerplate).  Page level: docs containing "lorem ipsum"
    (case-insensitive) or a ``{`` are dropped outright, and a doc must
    retain >= ``min_kept_lines`` lines (every kept line ends in
    terminal punctuation, so kept lines lower-bound C4's ">= 3
    sentences" gate; the sentence-tokenizer variant is a library
    swap, not a plan change).

    Emits (doc_id, n_lines, n_kept_lines, has_lorem_ipsum,
    has_curly_brace, cleaned_text, c4_keep) — the per-rule evidence a
    curation pipeline tunes on, plus the cleaned text itself so the
    survivor corpus is materialized in the same pass.

    Scale shape: a narrow per-row projection — no shuffle, no join, no
    UDF; the line array is bound once per stage (interpreted-HOF
    rule), so the keep-predicate runs once per line, not once per
    line per reference."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), r"\n"),
                    lambda x: F.regexp_replace(x, r"^\s+|\s+$", "")),
        lambda x: F.length(x) > 0)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        lines.alias("lines"),
        F.col(text_col).contains("{").alias("has_curly_brace"),
        F.lower(F.col(text_col)).contains("lorem ipsum")
         .alias("has_lorem_ipsum"))

    def _keep(x):
        term = x.endswith(C4_TERMINAL[0])
        for t in C4_TERMINAL[1:]:
            term = term | x.endswith(t)
        low = F.lower(x)
        cond = term & (F.size(F.split(x, r"\s+")) >= min_words_per_line)
        cond = cond & ~low.contains("javascript")
        for p in C4_POLICY_PHRASES:
            cond = cond & ~low.contains(p)
        return cond

    s2 = base.select(
        "doc_id", "has_lorem_ipsum", "has_curly_brace",
        F.size("lines").cast("long").alias("n_lines"),
        F.filter("lines", _keep).alias("kept"))
    return s2.select(
        "doc_id", "n_lines",
        F.size("kept").cast("long").alias("n_kept_lines"),
        "has_lorem_ipsum", "has_curly_brace",
        F.concat_ws("\n", F.col("kept")).alias("cleaned_text"),
        (~F.col("has_lorem_ipsum") & ~F.col("has_curly_brace")
         & (F.size("kept") >= min_kept_lines)).alias("c4_keep"))


def sql_c4_line_filter(table: str, text_col: str = "text",
                       id_col: str = "doc_id",
                       min_words_per_line: int = 5,
                       min_kept_lines: int = 3) -> str:
    """DuckDB twin of c4_line_filter over ``table``."""
    term = " OR ".join(
        f"ends_with(x, '{t}')" for t in (".", "!", "?", '"'))
    phrases = " AND ".join(
        f"NOT contains(lower(x), '{p}')" for p in C4_POLICY_PHRASES)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         list_filter(
           list_transform(regexp_split_to_array({text_col}, '\\n'),
                          x -> regexp_replace(x, '^\\s+|\\s+$', '', 'g')),
           x -> length(x) > 0) AS lines,
         contains({text_col}, '{{') AS has_curly_brace,
         contains(lower({text_col}), 'lorem ipsum') AS has_lorem_ipsum
  FROM {table}
), s2 AS (
  SELECT doc_id, has_lorem_ipsum, has_curly_brace,
         CAST(len(lines) AS BIGINT) AS n_lines,
         list_filter(lines,
           x -> ({term})
                AND len(regexp_split_to_array(x, '\\s+'))
                    >= {min_words_per_line}
                AND NOT contains(lower(x), 'javascript')
                AND {phrases}) AS kept
  FROM base
)
SELECT doc_id, n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       has_lorem_ipsum, has_curly_brace,
       coalesce(array_to_string(kept, chr(10)), '') AS cleaned_text,
       (NOT has_lorem_ipsum AND NOT has_curly_brace
        AND len(kept) >= {min_kept_lines}) AS c4_keep
FROM s2
"""


def ccnet_quality_buckets(df: DataFrame, min_count: int = 2,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang, avg_logprob, bucket): CCNet-style per-language
    quality tertiles — docs are ranked per detected language by the
    corpus-unigram-LM score (``unigram_logprob``, the perplexity
    proxy) and cut into head/middle/tail thirds, the exact
    head/middle/tail split CCNet publishes its corpus in.  Bucket
    boundaries are rank arithmetic (rn*3 <= cnt), not interpolated
    percentiles, with (score DESC, doc_id ASC) as the total order —
    deterministic across engines and partitionings, replayed verbatim
    in the SQL twin.

    Scale shape: the LM scoring is unigram_logprob's one token groupBy
    + one skew-handled join; lang detection is a narrow fold joined on
    the co-keyed doc_id.  The tertile cut is a per-language window —
    a per-partition external sort (spill-bounded, like every window
    row here) whose partition count is the language count; at
    10^12-doc production scale this is the one place exactness costs a
    sort per language, and the documented swap is per-language
    approx-percentile thresholds + a broadcast threshold join
    (trading the oracle-exact boundary for a bounded aggregate).
    Whitespace-only docs carry no LM score and are absent, matching
    unigram_logprob."""
    from pyspark.sql.window import Window

    lp = unigram_logprob(df, min_count=min_count,
                         text_col=text_col, id_col=id_col)
    langs = df.select(F.col(id_col).alias("doc_id"),
                      lang_guess(F.col(text_col)).alias("lang"))
    j = lp.join(langs, "doc_id")
    w = Window.partitionBy("lang").orderBy(F.desc("avg_logprob"),
                                           F.asc("doc_id"))
    wn = Window.partitionBy("lang")
    ranked = j.select("doc_id", "lang", "avg_logprob",
                      F.row_number().over(w).alias("rn"),
                      F.count(F.lit(1)).over(wn).alias("cnt"))
    return ranked.select(
        "doc_id", "lang", "avg_logprob",
        F.when(F.col("rn") * 3 <= F.col("cnt"), F.lit("head"))
         .when(F.col("rn") * 3 <= 2 * F.col("cnt"), F.lit("middle"))
         .otherwise(F.lit("tail")).alias("bucket"))


def sql_ccnet_quality_buckets(table: str, min_count: int = 2,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> str:
    """DuckDB twin of ccnet_quality_buckets over ``table``."""
    return f"""
WITH lp AS ({sql_unigram_logprob(table, min_count=min_count,
                                 text_col=text_col, id_col=id_col)}),
l AS (
  SELECT {id_col} AS doc_id, {sql_lang_guess(text_col)} AS lang
  FROM {table}
), j AS (
  SELECT lp.doc_id, l.lang, lp.avg_logprob
  FROM lp JOIN l USING (doc_id)
), r AS (
  SELECT doc_id, lang, avg_logprob,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY avg_logprob DESC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS cnt
  FROM j
)
SELECT doc_id, lang, avg_logprob,
       CASE WHEN rn * 3 <= cnt THEN 'head'
            WHEN rn * 3 <= 2 * cnt THEN 'middle'
            ELSE 'tail' END AS bucket
FROM r
"""


def _hashed_ngram_feats(df: DataFrame, buckets: int,
                        text_col: str, id_col: str) -> DataFrame:
    """(doc_id, b): the hashed bag-of-ngrams feature stream DSIR
    weighs — one row per word-unigram and word-bigram OCCURRENCE,
    bucketed by the corpus-wide 60-bit md5-prefix hash mod
    ``buckets`` (the same cross-engine hash every fingerprint row
    uses, so the DuckDB twin reproduces buckets bit-exactly).
    Whitespace-only docs contribute nothing, matching
    unigram_logprob's convention.  The token array is bound as its
    own projection before the bigram zip (interpreted-HOF rule)."""
    from mdscraper_spark.operators.dedup import tokenize, ws_strip

    base = (df.filter(F.length(ws_strip(F.col(text_col))) > 0)
            .select(F.col(id_col).alias("doc_id"),
                    tokenize(F.col(text_col)).alias("toks")))
    n = F.size("toks")
    m = F.greatest(n - F.lit(1), F.lit(0))
    pairs = F.arrays_zip(F.slice("toks", 1, m), F.slice("toks", 2, m))
    bigrams = F.when(n >= 2, F.transform(
        pairs, lambda p: F.concat_ws(" ", p["0"], p["1"]))) \
               .otherwise(F.array().cast("array<string>"))
    grams = base.select(
        "doc_id", F.explode(F.concat(F.col("toks"), bigrams)).alias("g"))
    b = F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long") \
         % F.lit(buckets)
    return grams.select("doc_id", b.alias("b"))


def dsir_importance_weights(raw_df: DataFrame, target_df: DataFrame,
                            buckets: int = 1024,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_features, dsir_logweight): DSIR importance weights
    (Xie et al., NeurIPS 2023 — "Data Selection for Language Models
    via Importance Resampling") for every raw-corpus document against
    a target corpus: features are hashed word uni+bigram occurrences
    (``_hashed_ngram_feats``), the generative model per corpus is the
    add-one-smoothed bag-of-buckets distribution p(b) = (count(b)+1) /
    (total + buckets), and a document's log importance weight is
    sum_over_feature_occurrences ln(p_target(b) / p_raw(b)) — the
    quantity DSIR Gumbel-resamples on to tilt a 10^12-doc raw crawl
    toward a quality target (Wikipedia/books) without training a
    classifier.  Rounded to 6 (identical IEEE ln/sum inputs in the
    twin; the round absorbs summation-order variance).

    Scale shape: two map-side-combinable groupBy(b) count passes whose
    results are BUCKETS-bounded (driver scalars for the totals — same
    bounded-.first() contract as unigram_logprob's corpus_total); the
    bucket→log-ratio table (full-outer of the two counts) is ≤buckets
    rows and joins back to the raw feature stream BROADCAST, so the
    only corpus-scale shuffle is the final per-doc sum, which combines
    map-side.  No corpus self-join; target is typically corpus-tiny
    (a quality sample) but nothing assumes it fits anywhere."""
    fr = _hashed_ngram_feats(raw_df, buckets, text_col, id_col)
    ft = _hashed_ngram_feats(target_df, buckets, text_col, id_col)
    rc = fr.groupBy("b").agg(F.count(F.lit(1)).alias("rc"))
    tc = ft.groupBy("b").agg(F.count(F.lit(1)).alias("tc"))
    r_total = rc.agg(F.sum("rc")).first()[0] or 0
    t_total = tc.agg(F.sum("tc")).first()[0] or 0
    if r_total == 0 or t_total == 0:
        # schema-stable empty frame: no raw features (nothing to
        # weigh) or no target features (the ratio is undefined)
        return fr.select("doc_id",
                         F.lit(0).cast("long").alias("n_features"),
                         F.lit(0.0).cast("double").alias("dsir_logweight")) \
                 .limit(0)
    lr = (F.log((F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1))
                / F.lit(float(t_total + buckets)))
          - F.log((F.coalesce(F.col("rc"), F.lit(0)) + F.lit(1))
                  / F.lit(float(r_total + buckets))))
    ratio = rc.join(tc, "b", "full").select("b", lr.alias("lr"))
    return (fr.join(F.broadcast(ratio), "b")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_features"),
                 F.round(F.sum("lr"), 6).alias("dsir_logweight")))


def sql_dsir_importance_weights(table: str, target_where: str,
                                buckets: int = 1024,
                                text_col: str = "text",
                                id_col: str = "doc_id") -> str:
    """DuckDB twin of dsir_importance_weights: raw = ``table``,
    target = the rows of ``table`` matching ``target_where``."""
    from mdscraper_spark.operators.dedup import sql_tokens, sql_ws_strip

    def feats(name: str, where: str) -> str:
        return f"""{name}_t AS (
  SELECT {id_col} AS doc_id, {sql_tokens(text_col)} AS toks
  FROM {table}
  WHERE ({where}) AND length({sql_ws_strip(text_col)}) > 0
), {name} AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % {buckets} AS b
  FROM (
    SELECT doc_id,
           unnest(list_concat(
             toks,
             CASE WHEN len(toks) >= 2
                  THEN [toks[i] || ' ' || toks[i + 1]
                        FOR i IN range(1, len(toks))]
                  ELSE [] END)) AS g
    FROM {name}_t)
)"""

    return f"""
WITH {feats("fr", "TRUE")},
{feats("ft", target_where)},
rc AS (SELECT b, COUNT(*) AS rc FROM fr GROUP BY b),
tc AS (SELECT b, COUNT(*) AS tc FROM ft GROUP BY b),
rt AS (SELECT CAST(SUM(rc) AS DOUBLE) AS rtot FROM rc),
tt AS (SELECT CAST(SUM(tc) AS DOUBLE) AS ttot FROM tc),
ratio AS (
  SELECT b,
         ln((COALESCE(tc, 0) + 1) / ((SELECT ttot FROM tt) + {buckets}))
       - ln((COALESCE(rc, 0) + 1) / ((SELECT rtot FROM rt) + {buckets}))
           AS lr
  FROM rc FULL OUTER JOIN tc USING (b)
)
SELECT doc_id, COUNT(*) AS n_features,
       round(SUM(lr), 6) AS dsir_logweight
FROM fr JOIN ratio USING (b)
GROUP BY doc_id
"""


# MassiveText/Gopher repetition thresholds (Rae et al. 2021, table A1):
# max fraction of characters in the most frequent {2,3,4}-gram, and in
# duplicated {5..10}-grams, plus the duplicate-line fractions.  One
# module-level table so the Spark battery, the SQL twin, and the tests
# share the same numbers.
GOPHER_REP_THRESHOLDS = {
    "dup_line_frac": 0.30, "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20, "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15, "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13, "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11, "dup_10gram_char_frac": 0.10,
}


def _sorted_ngrams(toks: Column, n: int) -> Column:
    """Ascending-sorted word n-grams of a BOUND token-array column
    (zip-of-slices, the top_bigram_frac idiom — no indexed lambda)."""
    nn = F.size(toks)
    m = F.greatest(nn - F.lit(n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(n)])
    gram = lambda p: F.concat_ws(" ", *[p[str(i)] for i in range(n)])
    return F.when(nn >= n, F.array_sort(F.transform(z, gram))) \
            .otherwise(F.array().cast("array<string>"))


def _top_run_chars(arr: Column) -> Column:
    """count * charlen of the most frequent element of an ascending-
    sorted array, ties broken toward the lexicographically smaller
    element (count DESC, gram ASC — the same total order the SQL twin
    ranks by)."""
    acc0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("bc"), F.lit(0).alias("blen"))

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        better = run > acc["bc"]
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(acc["bc"]).alias("bc"),
            F.when(better, F.length(x)).otherwise(acc["blen"])
             .alias("blen"))

    # a count-1 "mode" is not repetition: without this guard every
    # SHORT all-distinct document fails the top-n-gram thresholds on
    # the chars of one arbitrary gram (the reference reproductions
    # carry the same count > 1 guard)
    return F.aggregate(arr, acc0, step,
                       lambda a: F.when(a["bc"] >= 2,
                                        (a["bc"] * a["blen"]).cast("long"))
                                  .otherwise(F.lit(0).cast("long")))


def _dup_run_chars(arr: Column, discount_first: bool = False) -> Column:
    """Characters covered by repeated elements of an ascending-sorted
    array: sum over elements occurring >= 2 of count * charlen (or
    (count-1) * charlen with ``discount_first`` — the chars that would
    vanish under exact dedup)."""
    d = 1 if discount_first else 0
    acc0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).cast("long").alias("dup"))
    flush = lambda acc: F.when(
        acc["run"] >= 2,
        acc["dup"] + ((acc["run"] - F.lit(d))
                      * F.length(acc["prev"])).cast("long")) \
        .otherwise(acc["dup"])

    def step(acc, x):
        return F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
             .alias("run"),
            F.when(x == acc["prev"], acc["dup"]).otherwise(flush(acc))
             .alias("dup"))

    return F.aggregate(arr, acc0, step, flush)


def gopher_repetition(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-document MassiveText/Gopher REPETITION battery (Rae et al.
    2021, table A1) — the companion of ``gopher_rules``' document-level
    rules: duplicate-line fraction and duplicate-line CHARACTER
    fraction, fraction of characters in the most frequent {2,3,4}-gram,
    and fraction of characters in duplicated {5..10}-grams, each
    compared (on the ROUNDED value, the house boundary rule) against
    the published threshold; ``rep_pass`` is the AND of all eleven.

    Conventions (stated because published reproductions vary):
    n-gram char coverage counts count x charlen over the
    space-joined gram, so overlapping coverage can exceed 1.0 (the
    RedPajama-v2 signal convention); a count-1 mode contributes 0 to
    the top-n-gram fraction (no repetition — the reference
    reproductions' count > 1 guard); the duplicate-LINE char fraction
    counts (count-1) x charlen — the characters exact line dedup
    would remove — over total non-empty-line chars; the n-gram
    denominators are length(ws_strip(text)).

    Scale shape: narrow per-row projections — the token array is bound
    once, each n-gram battery is one sorted-array fold (interpreted-HOF
    rule), zero shuffle, zero join, zero Python.  The SQL twin computes
    the same modes RELATIONALLY (unnest + group by + rank), so the two
    engines agree through entirely different plans — a stronger oracle
    than a shared fold replay."""
    from mdscraper_spark.operators.dedup import tokenize, ws_strip

    stripped = ws_strip(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(stripped).cast("long").alias("n_chars"),
        F.when(F.length(stripped) == 0,
               F.array().cast("array<string>"))
         .otherwise(tokenize(F.col(text_col))).alias("toks"),
        F.array_sort(F.filter(
            F.transform(F.split(F.col(text_col), r"\n"),
                        lambda x: F.regexp_replace(x, r"^\s+|\s+$", "")),
            lambda x: F.length(x) > 0)).alias("lines"),
        dup_line_frac(F.col(text_col)).alias("dup_line_frac"))

    line_total = F.aggregate(
        "lines", F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x).cast("long"))
    frac = lambda num, den: F.when(den > 0,
                                   F.round(num / den.cast("double"), 6)) \
                             .otherwise(F.lit(0.0))
    cols = [F.col("doc_id"), F.col("n_chars"), F.col("dup_line_frac"),
            frac(_dup_run_chars(F.col("lines"), discount_first=True),
                 line_total).alias("dup_line_char_frac")]
    for n in (2, 3, 4):
        cols.append(frac(_top_run_chars(_sorted_ngrams(F.col("toks"), n)),
                         F.col("n_chars"))
                    .alias(f"top_{n}gram_char_frac"))
    for n in (5, 6, 7, 8, 9, 10):
        cols.append(frac(_dup_run_chars(_sorted_ngrams(F.col("toks"), n)),
                         F.col("n_chars"))
                    .alias(f"dup_{n}gram_char_frac"))
    s2 = base.select(*cols)
    rep_pass = F.lit(True)
    for name, thr in GOPHER_REP_THRESHOLDS.items():
        rep_pass = rep_pass & (F.col(name) <= thr)
    return s2.select("*", rep_pass.alias("rep_pass"))


def sql_gopher_repetition(table: str, text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """DuckDB twin of gopher_repetition — the modes computed
    RELATIONALLY (unnest + group by + rank) rather than by replaying
    the Spark fold."""
    from mdscraper_spark.operators.dedup import sql_tokens, sql_ws_strip

    lines = (f"list_sort(list_filter(list_transform("
             f"regexp_split_to_array({text_col}, '\\n'), "
             f"x -> regexp_replace(x, '^\\s+|\\s+$', '', 'g')), "
             f"x -> length(x) > 0))")
    parts = [f"""
t AS (
  SELECT {id_col} AS doc_id,
         CAST(length({sql_ws_strip(text_col)}) AS BIGINT) AS n_chars,
         CASE WHEN length({sql_ws_strip(text_col)}) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE {sql_tokens(text_col)} END AS toks,
         {lines} AS lines,
         {sql_dup_line_frac(text_col)} AS dup_line_frac
  FROM {table}
), lx AS (
  SELECT doc_id, unnest(lines) AS l FROM t
), lc AS (
  SELECT doc_id, l, COUNT(*) AS c FROM lx GROUP BY 1, 2
), ldup AS (
  SELECT doc_id,
         SUM(CASE WHEN c >= 2 THEN (c - 1) * length(l) ELSE 0 END) AS dchars,
         SUM(c * length(l)) AS tchars
  FROM lc GROUP BY 1
)"""]
    for n in (2, 3, 4, 5, 6, 7, 8, 9, 10):
        parts.append(f"""
g{n} AS (
  SELECT doc_id,
         unnest([array_to_string(toks[i : i + {n - 1}], ' ')
                 FOR i IN range(1, len(toks) - {n} + 2)]) AS g
  FROM t WHERE len(toks) >= {n}
), c{n} AS (
  SELECT doc_id, g, COUNT(*) AS c FROM g{n} GROUP BY 1, 2
)""")
        if n <= 4:
            parts.append(f"""
a{n} AS (
  SELECT doc_id, c * length(g) AS chars
  FROM (SELECT doc_id, g, c,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, g ASC) AS rn
        FROM c{n})
  WHERE rn = 1 AND c >= 2
)""")
        else:
            parts.append(f"""
a{n} AS (
  SELECT doc_id, SUM(c * length(g)) AS chars
  FROM c{n} WHERE c >= 2 GROUP BY 1
)""")
    frac = lambda num, den: (f"CASE WHEN {den} > 0 THEN "
                             f"round({num} / CAST({den} AS DOUBLE), 6) "
                             f"ELSE 0.0 END")
    sel = [f"t.doc_id", "t.n_chars", "t.dup_line_frac",
           frac("COALESCE(ldup.dchars, 0)", "COALESCE(ldup.tchars, 0)")
           + " AS dup_line_char_frac"]
    joins = ["FROM t LEFT JOIN ldup USING (doc_id)"]
    for n in (2, 3, 4):
        sel.append(frac(f"COALESCE(a{n}.chars, 0)", "t.n_chars")
                   + f" AS top_{n}gram_char_frac")
        joins.append(f"LEFT JOIN a{n} USING (doc_id)")
    for n in (5, 6, 7, 8, 9, 10):
        sel.append(frac(f"COALESCE(a{n}.chars, 0)", "t.n_chars")
                   + f" AS dup_{n}gram_char_frac")
        joins.append(f"LEFT JOIN a{n} USING (doc_id)")
    conds = " AND ".join(
        f"({frac_col} <= {thr})"
        for frac_col, thr in (
            (f"t.dup_line_frac", GOPHER_REP_THRESHOLDS["dup_line_frac"]),
            (frac("COALESCE(ldup.dchars, 0)", "COALESCE(ldup.tchars, 0)"),
             GOPHER_REP_THRESHOLDS["dup_line_char_frac"]),
            *[(frac(f"COALESCE(a{n}.chars, 0)", "t.n_chars"),
               GOPHER_REP_THRESHOLDS[f"top_{n}gram_char_frac"])
              for n in (2, 3, 4)],
            *[(frac(f"COALESCE(a{n}.chars, 0)", "t.n_chars"),
               GOPHER_REP_THRESHOLDS[f"dup_{n}gram_char_frac"])
              for n in (5, 6, 7, 8, 9, 10)]))
    return ("WITH " + ",".join(parts) + "\nSELECT "
            + ",\n       ".join(sel)
            + f",\n       ({conds}) AS rep_pass\n"
            + "\n".join(joins))


# ---------------------------------------------------------------------------
# lexical diversity: type-token ratio, hapax fraction, letter entropy
# (SURVEY J55) — the gibberish/boilerplate detector family: keyboard
# mash has high entropy but near-zero type reuse, template boilerplate
# has low entropy and low hapax share, natural prose sits in a band on
# all three.
# ---------------------------------------------------------------------------

_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _letter_entropy(col: Column) -> Column:
    """Shannon entropy (bits/char) over the a-z letters of the
    lowercased text, all other characters ignored.  Computed as
    log2(N) - sum(c*log2(c))/N with the 26 per-letter counts taken by
    length-difference (26 replace+length codegen expressions — zero
    HOF, zero explode, and a FIXED a..z summation order, so the IEEE
    double result is bit-identical in any engine that evaluates the
    same literal expression tree).  Empty letter set -> 0.0."""
    s = F.regexp_replace(F.lower(col), "[^a-z]", "")
    n = F.length(s).cast("double")
    cnts = [(F.length(s) - F.length(F.regexp_replace(s, c, "")))
            .cast("double") for c in _LETTERS]
    acc = None
    for c in cnts:
        term = F.when(c > 0, c * F.log2(c)).otherwise(F.lit(0.0))
        acc = term if acc is None else acc + term
    return F.when(n > 0, F.round(F.log2(n) - acc / n, 6)) \
            .otherwise(F.lit(0.0))


def lexical_stats(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_types, ttr, hapax_frac, letter_entropy):
    per-doc lexical-diversity battery.  ttr = distinct/total tokens
    (the classic type-token ratio), hapax_frac = share of types seen
    exactly once, letter_entropy = Shannon bits/char over a-z.

    Scale shape: one narrow projection — the type/hapax census is a
    single sorted-array run-length fold (the gopher-battery idiom:
    interpreted HOF over a per-doc array, no shuffle, no join, no
    Python), the entropy 26 codegen length-diffs.  Tokenization is
    dedup.tokenize's convention (whitespace split of the ws-stripped
    text; the empty doc's [""] single token counts as one type),
    replayed identically by the SQL twin."""
    from mdscraper_spark.operators.dedup import tokenize

    d = df.select(F.col(id_col).alias("doc_id"),
                  F.coalesce(F.col(text_col), F.lit("")).alias("t"))
    d = d.select("doc_id", "t",
                 F.array_sort(tokenize(F.col("t"))).alias("toks"))
    acc0 = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).cast("long").alias("run"),
                    F.lit(0).cast("long").alias("types"),
                    F.lit(0).cast("long").alias("hapax"))

    def step(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        flush_types = F.when(acc["run"] >= 1, acc["types"] + 1) \
                       .otherwise(acc["types"])
        flush_hapax = F.when(acc["run"] == 1, acc["hapax"] + 1) \
                       .otherwise(acc["hapax"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
             .alias("run"),
            F.when(same, acc["types"]).otherwise(flush_types)
             .alias("types"),
            F.when(same, acc["hapax"]).otherwise(flush_hapax)
             .alias("hapax"))

    def final(acc):
        types = F.when(acc["run"] >= 1, acc["types"] + 1) \
                 .otherwise(acc["types"])
        hapax = F.when(acc["run"] == 1, acc["hapax"] + 1) \
                 .otherwise(acc["hapax"])
        return F.struct(types.alias("types"), hapax.alias("hapax"))

    census = F.aggregate("toks", acc0, step, final)
    return d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        census["types"].alias("n_types"),
        F.round(census["types"] / F.size("toks"), 6).alias("ttr"),
        F.round(census["hapax"] / census["types"], 6).alias("hapax_frac"),
        _letter_entropy(F.col("t")).alias("letter_entropy"))


def sql_lexical_stats(table: str, text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """DuckDB twin of lexical_stats over ``table`` — the census is
    recomputed RELATIONALLY (unnest + group) against the Spark side's
    sorted-array fold; the entropy replays the same fixed a..z
    expression order."""
    from mdscraper_spark.operators.dedup import sql_tokens

    letter_cnt = [
        f"CAST(length(s) - length(replace(s, '{c}', '')) AS DOUBLE)"
        for c in _LETTERS]
    ent_terms = " + ".join(
        f"(CASE WHEN {c} > 0 THEN {c} * log2({c}) ELSE 0.0 END)"
        for c in letter_cnt)
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id,
         coalesce({text_col}, '') AS raw,
         {sql_tokens(f"coalesce({text_col}, '')")} AS toks
  FROM {table}
), u AS (
  SELECT doc_id, unnest(toks) AS tok FROM t
), c AS (
  SELECT doc_id, tok, count(*) AS cnt FROM u GROUP BY doc_id, tok
), census AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax,
         CAST(sum(cnt) AS BIGINT) AS n_tokens
  FROM c GROUP BY doc_id
), ent AS (
  SELECT doc_id,
         CASE WHEN length(s) > 0
              THEN round(log2(CAST(length(s) AS DOUBLE))
                         - ({ent_terms}) / CAST(length(s) AS DOUBLE), 6)
              ELSE 0.0 END AS letter_entropy
  FROM (SELECT doc_id, regexp_replace(lower(raw), '[^a-z]', '', 'g') AS s
        FROM t)
)
SELECT census.doc_id, n_tokens, n_types,
       round(n_types / CAST(n_tokens AS DOUBLE), 6) AS ttr,
       round(n_hapax / CAST(n_types AS DOUBLE), 6) AS hapax_frac,
       letter_entropy
FROM census JOIN ent ON ent.doc_id = census.doc_id
"""


# ---------------------------------------------------------------------------
# soft-error page detection (SURVEY J58) — the crawl-noise page flags
# every production corpus filters before training: soft-404s served
# with HTTP 200, javascript walls, login walls, paywalls and parked
# domains.  Pattern battery in the RE2/Java-common regex subset so
# both engines match identical spans.
# ---------------------------------------------------------------------------

_SOFT_ERROR_PATTERNS = (
    ("not_found",
     r"(?i)\b(404|page not found|page cannot be found"
     r"|no longer available)\b"),
    ("js_required",
     r"(?i)(enable javascript|javascript is (required|disabled)"
     r"|browser does not support javascript)"),
    ("login_wall",
     r"(?i)(log in to continue|sign in to (view|continue)"
     r"|create a free account to)"),
    ("paywall",
     r"(?i)(subscribe to (read|continue)|subscription required"
     r"|remaining free articles?)"),
    ("domain_parked",
     r"(?i)(domain (is )?for sale|this domain has been registered"
     r"|buy this domain)"),
)


def soft_error_flags(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     head_chars: int = 2000) -> DataFrame:
    """(doc_id, not_found, js_required, login_wall, paywall,
    domain_parked, soft_error): per-doc boolean battery over the first
    ``head_chars`` characters (error boilerplate fronts the page;
    bounding the scan keeps the regex cost flat for long docs).
    ``soft_error`` ORs the five flags.  Narrow codegen projection —
    zero shuffle, zero join, zero Python."""
    head = F.substring(F.coalesce(F.col(text_col), F.lit("")),
                       1, head_chars)
    cols = [F.col(id_col).alias("doc_id")]
    flags = []
    for name, pat in _SOFT_ERROR_PATTERNS:
        flags.append(head.rlike(pat).alias(name))
    any_flag = None
    for f in flags:
        any_flag = f if any_flag is None else any_flag | f
    return df.select(*cols, *flags, any_flag.alias("soft_error"))


def sql_soft_error_flags(table: str, text_col: str = "text",
                         id_col: str = "doc_id",
                         head_chars: int = 2000) -> str:
    """DuckDB twin of soft_error_flags over ``table``."""
    head = f"substr(coalesce({text_col}, ''), 1, {head_chars})"
    flag_sql = []
    for name, pat in _SOFT_ERROR_PATTERNS:
        # standard SQL strings: '' escapes the quote, backslash is a
        # plain character (NO doubling — \b must reach RE2 as \b)
        esc = pat.replace("'", "''")
        flag_sql.append(f"regexp_matches({head}, '{esc}') AS {name}")
    names = [n for n, _p in _SOFT_ERROR_PATTERNS]
    any_sql = " OR ".join(names)
    return f"""
SELECT {id_col} AS doc_id,
       {", ".join(flag_sql)},
       ({any_sql}) AS soft_error
FROM {table}
"""
