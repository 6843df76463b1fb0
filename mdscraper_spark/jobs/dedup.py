"""Corpus dedup job: documents -> dedup decision table (+ optional
paragraph scrub) -> warehouse, with the recipe in snapshot properties.

The registry rows (`dedup_exact`, `normalized_exact_dedup`,
`near_dedup_groups`, `paragraph_dedup`, `dup_span_stats`) verify the
operator semantics against DuckDB; this job is the production surface
that MATERIALIZES a dedup pass a training pipeline actually applies:

* ``dedup_docs`` — one row per doc: ``(doc_id, group_key, keep)``,
  where the grouping is ``exact`` (md5 of raw text), ``normalized``
  (md5 of the dedup-grade canonical form — case/punct/ws-blind), or
  ``near`` (MinHash-LSH candidate pairs closed into connected groups);
  survivor = min doc_id per group, the convention every registry row
  pins.  NULL text hashes to one group (J1's GROUP BY semantics): docs
  with no content are mutually indistinguishable, so their duplicates
  are dropped like any other group's.
* ``dedup_paragraphs`` (``--paragraphs``) — corpus-wide
  paragraph-dedup rewrite of the SURVIVORS ONLY (running it before
  doc-level dedup would let a doomed duplicate claim global-first on
  its paragraphs and hollow out the copy that survives).

Counts travel as snapshot properties so every dedup snapshot carries
its own recipe audit, mirroring jobs/curate.py.

    spark-submit --py-files dist/mdscraper_spark.zip \\
        mdscraper_spark/jobs/dedup.py \\
        --input /path/documents_parquet --warehouse /path/wh \\
        --mode near --paragraphs
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from mdscraper_spark.operators import dedup as dedup_ops
from mdscraper_spark.sources.tables import Warehouse

MODES = ("exact", "normalized", "near")


def _hash_decision(docs, key_col) -> "DataFrame":
    """Per-doc keep decision for a hash-equality grouping: one hash
    shuffle for the unbounded-frame per-group MIN window (see
    links.url_dedup for why this beats groupBy-min + corpus join-back)."""
    d = docs.select("doc_id", key_col.alias("group_key"))
    w = Window.partitionBy("group_key")
    return d.select(
        "doc_id", "group_key",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"))


def dedup_corpus(spark: SparkSession, docs, warehouse_path: str,
                 mode: str = "exact", paragraphs: bool = False,
                 cc_max_iter: int = 25) -> dict:
    """Materialize the dedup decision (+ optional paragraph scrub);
    returns the audit counts dict.  ``cc_max_iter`` is the
    connected-components round budget for ``mode='near'`` (CC now
    fails loud on budget exhaustion, so the production job must expose
    the knob a deep duplicate chain would need raised)."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    docs = docs.select("doc_id", "text")

    if mode == "exact":
        decision = _hash_decision(docs, F.md5(F.col("text")))
    elif mode == "normalized":
        decision = _hash_decision(
            docs, F.md5(dedup_ops.canonical_text(F.col("text"))))
    else:
        groups = dedup_ops.near_dedup_groups(docs, cc_max_iter=cc_max_iter)
        decision = groups.select(
            "doc_id", F.col("canonical_id").cast("string")
            .alias("group_key"), "keep")

    # one pass for the audit; the decision table is tiny (3 narrow
    # columns) so the localCheckpoint is cheap and both the counts and
    # the survivor semi-join reuse it instead of re-running LSH+CC
    decision = decision.localCheckpoint()
    counts = decision.agg(
        F.count(F.lit(1)).alias("total"),
        F.coalesce(F.sum(F.col("keep").cast("long")), F.lit(0))
        .alias("kept")).first()
    audit = {"mode": mode, "total": int(counts["total"]),
             "kept": int(counts["kept"]),
             "removed": int(counts["total"]) - int(counts["kept"])}

    wh = Warehouse(spark, warehouse_path)
    wh.write_table(decision, "dedup_docs", properties={"dedup": audit})

    if paragraphs:
        survivors = docs.join(
            decision.filter("keep").select("doc_id"), "doc_id", "left_semi")
        scrubbed = dedup_ops.paragraph_dedup(survivors)
        para_removed = scrubbed.agg(
            F.coalesce(F.sum("n_removed"), F.lit(0))).first()[0]
        audit["paragraphs_removed"] = int(para_removed)
        wh.write_table(scrubbed, "dedup_paragraphs",
                       properties={"dedup": audit})
    return audit


N_STATE_BUCKETS = 16     # bucket(N, group_key) spec of incremental_dedup
COMPACT_AFTER = 8        # fold history once this many snapshots accumulate


def _seen_history(wh: Warehouse):
    """(base, delta) seen-key sets from the incremental_dedup state:
    ``base`` is the oldest (compacted) snapshot read WITH its catalog
    bucket spec — a join on group_key pays no Exchange on its side —
    and ``delta`` is the union of the small per-batch appends since the
    last compaction (broadcast by the caller).  Either may be None."""
    from functools import reduce

    parts = wh.read_bucketed_parts("incremental_dedup")
    parts = [p.filter("keep").select("group_key") for p in parts]
    if not parts:
        return None, None
    base = parts[0]
    delta = (reduce(lambda a, b: a.unionByName(b), parts[1:])
             if len(parts) > 1 else None)
    return base, delta


def dedup_incremental(spark: SparkSession, new_docs, warehouse_path: str,
                      batch_id: str, mode: str = "exact",
                      n_buckets: int = N_STATE_BUCKETS,
                      compact_after: int = COMPACT_AFTER) -> dict:
    """Dedup a NEW ingest batch against every batch already ingested —
    the production shape batch dedup cannot cover: a crawler never sees
    the whole corpus at once, and a duplicate of last week's page must
    be dropped this week.

    Keep rule: a doc survives iff its content key is the first
    occurrence within the batch (min doc_id) AND was never kept by any
    earlier batch.  ``exact``/``normalized`` keys only — near-dup
    groups need a global closure over all pairs ever seen, which is the
    batch job's territory (re-run ``dedup_corpus`` over the accumulated
    corpus periodically; the lambda-loop pattern kg_stream uses).

    One state table, one commit: ``incremental_dedup`` accumulates the
    per-batch decision rows, and the seen-set is derived from its kept
    rows — deriving instead of maintaining a second table makes the
    commit atomic (no crash window between a decision write and a
    seen-keys write that could silently re-admit duplicates).  Replay
    safety is the kg_incremental pattern: applied batch ids travel in
    the snapshot properties, and re-running an applied batch returns
    its recorded audit without touching the table.

    10^12-key shape: the state table is written ``bucket(n_buckets,
    group_key)`` (Warehouse bucket_by), so the per-batch history probe
    splits into (a) a sort-merge join against the compacted BASE
    snapshot with NO Exchange on the history side — only the new batch
    reshuffles onto the buckets — plus (b) a broadcast join against the
    small post-compaction DELTA snapshots; once ``compact_after``
    snapshots pile up the table auto-compacts (one bucketed rewrite
    amortized over that many batches), keeping the delta broadcast
    bounded.  Plan shape pinned by tests/test_dedup_job.py.

    NULL text takes a sentinel group key (``\\x00null:`` — md5 output
    is hex, so no collision) instead of md5(NULL)=NULL: the window
    already treats NULLs as one group, but an equi-join key of NULL
    never matches history, which would re-admit one NULL-text
    duplicate per batch (and NULL bucket keys would undercut the
    bucket spec).  Same one-group semantics as the batch job's GROUP
    BY, now join- and bucket-safe.

    Kept keys are globally unique by the invariant (one keeper per key
    per batch, cross-batch keys only kept when unseen), so the derived
    seen-set needs no distinct."""
    if mode not in ("exact", "normalized"):
        raise ValueError(
            f"incremental mode must be 'exact' or 'normalized', got {mode!r}")
    wh = Warehouse(spark, warehouse_path)
    m = wh.manifest("incremental_dedup")
    props = (m or {}).get("properties", {})
    applied = list(props.get("batches", []))
    audits = dict(props.get("audits", {}))
    if batch_id in applied:
        return audits[batch_id]

    key = (F.md5(F.col("text")) if mode == "exact"
           else F.md5(dedup_ops.canonical_text(F.col("text"))))
    key = F.coalesce(key, F.lit("\x00null:"))   # md5 is NULL iff text is
    new = new_docs.select("doc_id", key.alias("group_key"))
    w = Window.partitionBy("group_key")
    first = (F.col("doc_id") == F.min("doc_id").over(w))
    flagged = new.withColumn("first_in_batch", first)
    if m is not None:
        base, delta = _seen_history(wh)
        seen = F.lit(False)
        if base is not None:
            flagged = flagged.join(
                base.withColumn("_seen_base", F.lit(True)),
                "group_key", "left")
            seen = seen | F.col("_seen_base").isNotNull()
        if delta is not None:
            flagged = flagged.join(
                F.broadcast(delta.withColumn("_seen_delta", F.lit(True))),
                "group_key", "left")
            seen = seen | F.col("_seen_delta").isNotNull()
        keep = F.col("first_in_batch") & ~seen
        dup_hist = F.col("first_in_batch") & seen
    else:
        keep, dup_hist = F.col("first_in_batch"), F.lit(False)

    decision = flagged.select(
        "doc_id", "group_key", F.lit(batch_id).alias("batch_id"),
        keep.alias("keep"), dup_hist.alias("dup_vs_history"))
    decision = decision.localCheckpoint()
    c = decision.agg(
        F.count(F.lit(1)).alias("total"),
        F.coalesce(F.sum(F.col("keep").cast("long")), F.lit(0))
        .alias("kept"),
        F.coalesce(F.sum(F.col("dup_vs_history").cast("long")), F.lit(0))
        .alias("dup_hist")).first()
    audit = {"mode": mode, "batch_id": batch_id,
             "batch_total": int(c["total"]), "kept": int(c["kept"]),
             "dup_vs_history": int(c["dup_hist"]),
             "dup_in_batch": int(c["total"]) - int(c["kept"])
             - int(c["dup_hist"])}
    wh.write_table(decision, "incremental_dedup", mode="append",
                   bucket_by=(n_buckets, "group_key"),
                   properties={"batches": applied + [batch_id],
                               "audits": {**audits, batch_id: audit}})
    live = wh.manifest("incremental_dedup")["partitions"].get("", [])
    if len(live) > compact_after:
        wh.compact("incremental_dedup")
    return audit


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="dedup a document corpus")
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--mode", choices=MODES, default="exact")
    p.add_argument("--paragraphs", action="store_true",
                   help="also materialize the corpus-wide paragraph "
                        "scrub of the survivors (batch mode only)")
    p.add_argument("--incremental", metavar="BATCH_ID", default=None,
                   help="treat --input as ONE ingest batch and dedup it "
                        "against all previously applied batches; the id "
                        "makes re-runs exactly-once")
    p.add_argument("--cc-max-iter", type=int, default=25,
                   help="connected-components round budget for near "
                        "mode (raise for corpora with deep duplicate "
                        "chains; CC fails loud on exhaustion)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from mdscraper_spark.session import get_spark

    spark = get_spark("mdscraper-spark-dedup", master=args.master)
    docs = spark.read.parquet(args.input)
    if args.incremental is not None:
        audit = dedup_incremental(spark, docs, args.warehouse,
                                  batch_id=args.incremental,
                                  mode=args.mode)
    else:
        audit = dedup_corpus(spark, docs, args.warehouse, mode=args.mode,
                             paragraphs=args.paragraphs,
                             cc_max_iter=args.cc_max_iter)
    print(json.dumps({"dedup": audit}))


if __name__ == "__main__":
    main()
