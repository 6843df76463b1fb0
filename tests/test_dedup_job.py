"""Dedup job: decision table matches the operator semantics the
registry rows oracle, survivors-only paragraph scrub, recipe audit in
snapshot properties."""

import pytest

from mdscraper_spark.jobs.dedup import dedup_corpus
from mdscraper_spark.sources.tables import Warehouse


def _corpus(spark):
    rows = [
        (0, "alpha beta gamma\nshared footer"),
        (1, "alpha beta gamma\nshared footer"),      # exact dup of 0
        (2, "ALPHA, beta   gamma!\nshared footer"),  # normalized dup of 0
        (3, "totally different text\nshared footer"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_vs_normalized_modes(spark, tmp_path):
    docs = _corpus(spark)

    audit = dedup_corpus(spark, docs, str(tmp_path / "wh_e"), mode="exact")
    assert audit == {"mode": "exact", "total": 4, "kept": 3, "removed": 1}
    wh = Warehouse(spark, str(tmp_path / "wh_e"))
    got = {r.doc_id: r.keep for r in wh.read_table("dedup_docs").collect()}
    assert got == {0: True, 1: False, 2: True, 3: True}
    assert wh.manifest("dedup_docs")["properties"]["dedup"] == audit

    audit_n = dedup_corpus(spark, docs, str(tmp_path / "wh_n"),
                           mode="normalized")
    assert (audit_n["kept"], audit_n["removed"]) == (2, 2)
    wh_n = Warehouse(spark, str(tmp_path / "wh_n"))
    got_n = {r.doc_id: r.keep
             for r in wh_n.read_table("dedup_docs").collect()}
    assert got_n == {0: True, 1: False, 2: False, 3: True}


def test_paragraph_scrub_runs_on_survivors_only(spark, tmp_path):
    docs = _corpus(spark)
    audit = dedup_corpus(spark, docs, str(tmp_path / "wh_p"),
                         mode="normalized", paragraphs=True)
    wh = Warehouse(spark, str(tmp_path / "wh_p"))
    paras = {r.doc_id: (r.clean_text, r.n_removed)
             for r in wh.read_table("dedup_paragraphs").collect()}
    # only survivors 0 and 3 are scrubbed; doc 3 loses the footer that
    # doc 0 claimed globally-first — the doomed duplicates 1/2 never
    # got to claim anything
    assert set(paras) == {0, 3}
    assert paras[0] == ("alpha beta gamma\nshared footer", 0)
    assert paras[3] == ("totally different text", 1)
    assert audit["paragraphs_removed"] == 1
    props = wh.manifest("dedup_paragraphs")["properties"]["dedup"]
    assert props["paragraphs_removed"] == 1 and props["kept"] == 2


def test_near_mode_and_validation(spark, tmp_path):
    # two near-identical long docs (one token changed) + one unrelated
    base = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(0, base), (1, base.replace("tok7", "tok7x")),
         (2, " ".join(f"other{i}" for i in range(40)))],
        "doc_id long, text string")
    audit = dedup_corpus(spark, docs, str(tmp_path / "wh_near"),
                         mode="near")
    assert audit["total"] == 3
    wh = Warehouse(spark, str(tmp_path / "wh_near"))
    got = {r.doc_id: r for r in wh.read_table("dedup_docs").collect()}
    # 0 and 1 share LSH bands -> one group, min doc_id survives
    assert got[0].keep and not got[1].keep and got[2].keep
    assert got[0].group_key == got[1].group_key != got[2].group_key

    with pytest.raises(ValueError):
        dedup_corpus(spark, docs, str(tmp_path / "wh_bad"), mode="fuzzy")


def test_dedup_cli(spark, tmp_path, capsys):
    import json

    from mdscraper_spark.jobs.dedup import main

    main(["--input", "/root/testdata/sf0.001/documents.parquet",
          "--warehouse", str(tmp_path / "wh_cli"),
          "--mode", "normalized", "--paragraphs"])
    out = capsys.readouterr().out
    payload = json.loads([l for l in out.splitlines()
                          if l.startswith("{")][-1])
    audit = payload["dedup"]
    assert audit["mode"] == "normalized" and audit["total"] == 500
    assert audit["kept"] + audit["removed"] == 500
    assert "paragraphs_removed" in audit
    wh = Warehouse(spark, str(tmp_path / "wh_cli"))
    assert wh.read_table("dedup_docs").count() == 500
    assert (wh.read_table("dedup_paragraphs").count()
            == audit["kept"])


def test_incremental_dedup_across_batches(spark, tmp_path):
    from mdscraper_spark.jobs.dedup import dedup_incremental

    wh_path = str(tmp_path / "wh_inc")
    b1 = spark.createDataFrame(
        [(0, "doc alpha"), (1, "doc beta"), (2, "doc alpha")],
        "doc_id long, text string")
    a1 = dedup_incremental(spark, b1, wh_path, batch_id="b1")
    assert a1 == {"mode": "exact", "batch_id": "b1", "batch_total": 3,
                  "kept": 2, "dup_vs_history": 0, "dup_in_batch": 1}

    # batch 2: one dup of batch 1, one internal dup pair, one fresh
    b2 = spark.createDataFrame(
        [(10, "doc beta"), (11, "doc gamma"), (12, "doc gamma"),
         (13, "doc delta")],
        "doc_id long, text string")
    a2 = dedup_incremental(spark, b2, wh_path, batch_id="b2")
    assert a2 == {"mode": "exact", "batch_id": "b2", "batch_total": 4,
                  "kept": 2, "dup_vs_history": 1, "dup_in_batch": 1}

    wh = Warehouse(spark, wh_path)
    rows = {(r.batch_id, r.doc_id): r
            for r in wh.read_table("incremental_dedup").collect()}
    assert len(rows) == 7
    assert rows[("b2", 10)].keep is False and \
        rows[("b2", 10)].dup_vs_history is True
    assert rows[("b2", 11)].keep is True and rows[("b2", 13)].keep is True

    # replay of an applied batch: recorded audit back, table untouched
    a2_replay = dedup_incremental(spark, b2, wh_path, batch_id="b2")
    assert a2_replay == a2
    assert wh.read_table("incremental_dedup").count() == 7

    # batch 3 still sees batch-1 keys through the accumulated history
    b3 = spark.createDataFrame(
        [(20, "doc alpha"), (21, "doc epsilon")],
        "doc_id long, text string")
    a3 = dedup_incremental(spark, b3, wh_path, batch_id="b3")
    assert (a3["kept"], a3["dup_vs_history"]) == (1, 1)

    with pytest.raises(ValueError):
        dedup_incremental(spark, b3, wh_path, batch_id="b4", mode="near")


def test_incremental_dedup_normalized_and_cli(spark, tmp_path, capsys):
    import json

    from mdscraper_spark.jobs.dedup import dedup_incremental, main

    wh_path = str(tmp_path / "wh_inc_n")
    b1 = spark.createDataFrame([(0, "Hello, World!")],
                               "doc_id long, text string")
    dedup_incremental(spark, b1, wh_path, batch_id="n1",
                      mode="normalized")
    b2 = spark.createDataFrame([(5, "hello   world")],
                               "doc_id long, text string")
    a2 = dedup_incremental(spark, b2, wh_path, batch_id="n2",
                           mode="normalized")
    assert (a2["kept"], a2["dup_vs_history"]) == (0, 1)

    # CLI surface
    pq = str(tmp_path / "b3.parquet")
    spark.createDataFrame([(9, "fresh text")],
                          "doc_id long, text string").write.parquet(pq)
    main(["--input", pq, "--warehouse", wh_path,
          "--mode", "normalized", "--incremental", "n3"])
    out = capsys.readouterr().out
    payload = json.loads([l for l in out.splitlines()
                          if l.startswith("{")][-1])
    assert payload["dedup"]["batch_id"] == "n3"
    assert payload["dedup"]["kept"] == 1


def test_incremental_dedup_survives_compaction(spark, tmp_path):
    from mdscraper_spark.jobs.dedup import dedup_incremental

    wh_path = str(tmp_path / "wh_inc_c")
    b1 = spark.createDataFrame([(0, "one"), (1, "two")],
                               "doc_id long, text string")
    a1 = dedup_incremental(spark, b1, wh_path, batch_id="c1")
    b2 = spark.createDataFrame([(10, "two"), (11, "three")],
                               "doc_id long, text string")
    dedup_incremental(spark, b2, wh_path, batch_id="c2")

    wh = Warehouse(spark, wh_path)
    wh.compact("incremental_dedup")

    # maintenance must not wipe the exactly-once ledger (compact
    # carries snapshot properties forward) ...
    assert dedup_incremental(spark, b1, wh_path, batch_id="c1") == a1
    assert wh.read_table("incremental_dedup").count() == 4
    # ... nor the derived seen-set: a post-compact batch still sees
    # the full history
    b3 = spark.createDataFrame([(20, "one"), (21, "four")],
                               "doc_id long, text string")
    a3 = dedup_incremental(spark, b3, wh_path, batch_id="c3")
    assert (a3["kept"], a3["dup_vs_history"]) == (1, 1)


def test_incremental_dedup_null_text_matches_history(spark, tmp_path):
    """md5(NULL)=NULL used to never match the history seen-set, so one
    NULL-text duplicate per batch was silently re-admitted; the
    sentinel group key makes NULL-text docs one group across batches
    (same semantics as the batch job's GROUP BY)."""
    from mdscraper_spark.jobs.dedup import dedup_incremental

    wh_path = str(tmp_path / "wh_null")
    b1 = spark.createDataFrame(
        [(0, None), (1, "real text"), (2, None)],
        "doc_id long, text string")
    a1 = dedup_incremental(spark, b1, wh_path, batch_id="n1")
    assert (a1["kept"], a1["dup_in_batch"]) == (2, 1)

    b2 = spark.createDataFrame(
        [(10, None), (11, "fresh text")], "doc_id long, text string")
    a2 = dedup_incremental(spark, b2, wh_path, batch_id="n2")
    assert a2["dup_vs_history"] == 1 and a2["kept"] == 1
    wh = Warehouse(spark, wh_path)
    rows = {r.doc_id: r for r in
            wh.read_table("incremental_dedup").collect()}
    assert rows[10].keep is False and rows[10].dup_vs_history is True
    # the sentinel never collides with a real md5 and is non-null
    assert rows[0].group_key == rows[10].group_key == "\x00null:"


def test_incremental_dedup_auto_compacts_and_stays_correct(spark, tmp_path):
    """compact_after bounds the delta-snapshot count: once exceeded the
    state folds into ONE bucketed base snapshot, and history matching
    still holds across the compaction boundary."""
    from mdscraper_spark.jobs.dedup import dedup_incremental

    wh_path = str(tmp_path / "wh_cmp")
    for i in range(4):
        docs = spark.createDataFrame(
            [(i * 10, f"text {i}"), (i * 10 + 1, "the constant dup")],
            "doc_id long, text string")
        dedup_incremental(spark, docs, wh_path, batch_id=f"k{i}",
                          compact_after=2)
    wh = Warehouse(spark, wh_path)
    m = wh.manifest("incremental_dedup")
    # 4 appends with compact_after=2 -> at least one compaction ran
    assert len(m["partitions"][""]) <= 3
    assert m["bucket_by"] == [16, "group_key"]
    rows = wh.read_table("incremental_dedup").collect()
    assert len(rows) == 8
    # exactly one copy of the constant dup ever kept
    constant_kept = [r for r in rows
                     if r.keep and r.doc_id % 10 == 1]
    assert len(constant_kept) == 1 and constant_kept[0].doc_id == 1
    # exactly-once guard survives compaction (properties carried)
    replay = dedup_incremental(
        spark, spark.createDataFrame([(0, "text 0")],
                                     "doc_id long, text string"),
        wh_path, batch_id="k0", compact_after=2)
    assert replay["batch_id"] == "k0"
    assert wh.read_table("incremental_dedup").count() == 8


@pytest.mark.slow
def test_incremental_dedup_many_batches_flat_cost(spark, tmp_path):
    """Round-4 verdict item 6 — the bucketed-state design exercised at
    its operating point instead of toy scale: 20 ingest batches with
    auto-compaction triggering repeatedly (compact_after=4), pinning

    * delta-snapshot count stays bounded by compact_after across the
      WHOLE run (the broadcast side can never grow unboundedly),
    * compaction actually fired repeatedly (>= 3 folds),
    * the history probe is still Exchange-free on the compacted base
      after the last fold (the 10^12-key plan shape survives many
      compaction cycles, not just the first),
    * per-batch wall time stays flat: the late-batch median is within
      3x of the early-batch median even though history is ~20x larger
      — the growth a seen-set re-shuffle or unbounded delta union
      would show is absent,
    * global exactly-once keep: every content key kept exactly once
      across all 20 batches.
    """
    import time

    from pyspark.sql import functions as F

    from mdscraper_spark.jobs.dedup import _seen_history, dedup_incremental

    wh_path = str(tmp_path / "wh_many")
    wh = Warehouse(spark, wh_path)
    n_batches, per_batch, compact_after = 20, 400, 4
    walls, live_counts = [], []
    for b in range(n_batches):
        # ~half the batch repeats keys from earlier batches (stride-2
        # overlap), half is fresh — the realistic recrawl mix
        rows = [(b * per_batch + i,
                 f"text {(b // 2) * per_batch + i}" if i % 2 == 0
                 else f"text {b * per_batch + i}")
                for i in range(per_batch)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        t0 = time.monotonic()
        dedup_incremental(spark, docs, wh_path, batch_id=f"m{b:02d}",
                          compact_after=compact_after)
        walls.append(time.monotonic() - t0)
        live = wh.manifest("incremental_dedup")["partitions"].get("", [])
        live_counts.append(len(live))

    # delta count bounded the whole run, and compaction fired repeatedly
    assert max(live_counts) <= compact_after + 1, live_counts
    folds = sum(1 for prev, cur in zip(live_counts, live_counts[1:])
                if cur < prev)
    assert folds >= 3, (folds, live_counts)

    # plan shape after many folds: base probe still Exchange-free
    base, delta = _seen_history(wh)
    assert base is not None
    probe = spark.createDataFrame(
        [(f"k{i}",) for i in range(10)], "group_key string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (probe.join(base, "group_key", "left")
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # flat per-batch cost (median-of-window vs median-of-window rides
    # out host noise; JVM-warmup batches 0-2 excluded)
    med = lambda xs: sorted(xs)[len(xs) // 2]
    early, late = med(walls[3:8]), med(walls[-5:])
    assert late < 3 * early, (early, late, walls)

    # global exactly-once keep per content key
    kept = (wh.read_table("incremental_dedup").filter("keep")
            .groupBy("group_key").count())
    assert kept.filter(F.col("count") > 1).count() == 0
    # and total rows = every ingested doc, decided exactly once
    assert (wh.read_table("incremental_dedup").count()
            == n_batches * per_batch)


def test_incremental_history_join_exchange_free_on_base(spark, tmp_path):
    """The 10^12-key plan shape: probing the batch against the bucketed
    history base must put the ONLY Exchange on the batch side — the
    base scan reads its catalog bucket spec (no reshuffle of the
    accumulated history), unlike a plain parquet read of the same
    files (control)."""
    from mdscraper_spark.jobs.dedup import _seen_history, dedup_incremental

    wh_path = str(tmp_path / "wh_plan")
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(50)], "doc_id long, text string")
    dedup_incremental(spark, docs, wh_path, batch_id="p1")
    wh = Warehouse(spark, wh_path)
    base, delta = _seen_history(wh)
    assert base is not None and delta is None

    batch = spark.createDataFrame(
        [(100 + i, f"text {i}") for i in range(10)],
        "doc_id long, text string")
    from pyspark.sql import functions as F
    keys = batch.select(F.md5("text").alias("group_key"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = keys.join(base, "group_key", "left")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "SortMergeJoin" in plan, plan

        # control: same files read WITHOUT the bucket spec -> both sides
        # shuffle
        jp = keys.join(wh.read_table("incremental_dedup")
                       .filter("keep").select("group_key"),
                       "group_key", "left")
        plan_p = jp._jdf.queryExecution().executedPlan().toString()
        assert plan_p.count("Exchange") == 2, plan_p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
