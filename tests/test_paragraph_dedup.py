"""Corpus-wide paragraph dedup (SURVEY J32, CCNet-style)."""

from mdscraper_spark.operators import dedup


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: (r.clean_text, r.n_removed)
            for r in dedup.paragraph_dedup(df).collect()}


def test_global_first_occurrence_wins(spark):
    got = _run(spark, [
        (0, "nav\nbody zero\nfooter"),
        (1, "nav\nbody one\nfooter"),
        (2, "body zero\nunique two"),
    ])
    # doc 0 holds the first 'nav', 'body zero', 'footer'
    assert got[0] == ("nav\nbody zero\nfooter", 0)
    assert got[1] == ("body one", 2)
    # 'body zero' already occurred in doc 0
    assert got[2] == ("unique two", 1)


def test_whitespace_paragraphs_never_dedup(spark):
    got = _run(spark, [
        (0, "a\n\nb\n \nc"),
        (1, "\n\t\n"),        # three ws-only paragraphs, all kept
        (2, "a\n\nd"),
    ])
    assert got[0] == ("a\n\nb\n \nc", 0)
    assert got[1] == ("\n\t\n", 0)
    assert got[2] == ("\nd", 1)


def test_doc_losing_everything_still_appears(spark):
    got = _run(spark, [
        (0, "x\ny"),
        (1, "x\ny"),
        (2, "y"),
    ])
    assert got[0] == ("x\ny", 0)
    assert got[1] == ("", 2)
    assert got[2] == ("", 1)


def test_position_order_is_tiebreak_within_doc(spark):
    # the same new paragraph twice inside ONE doc: first position wins
    got = _run(spark, [(0, "p\nq\np")])
    assert got[0] == ("p\nq", 1)


def test_differential_python_replay_and_partition_invariance(spark):
    rows = [(i, "\n".join(
        ["shared header"] +
        [f"body {i} line {j}" if (i + j) % 4 else f"common {j % 3}"
         for j in range(5)] +
        ["", "shared footer"])) for i in range(60)]

    seen, expect = set(), {}
    for i, text in sorted(rows):
        kept, removed = [], 0
        for para in text.split("\n"):
            if para.strip() == "":
                kept.append(para)
            elif para in seen:
                removed += 1
            else:
                seen.add(para)
                kept.append(para)
        expect[i] = ("\n".join(kept), removed)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    for d in (df.coalesce(1), df.repartition(13)):
        got = {r.doc_id: (r.clean_text, r.n_removed)
               for r in dedup.paragraph_dedup(d).collect()}
        assert got == expect


def test_null_text_doc_survives(spark):
    got = _run(spark, [(0, "x"), (1, None)])
    assert got[1] == ("", 0)


# --- per-host boilerplate template removal (SURVEY J60) ----------------


def _run_bp(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    return {r.doc_id: (r.clean_text, r.n_removed)
            for r in dedup.host_boilerplate_scrub(df, **kw).collect()}


def test_template_strips_all_occurrences(spark):
    # 'nav' is on 3/3 docs of host a: removed EVERYWHERE, first
    # occurrence included — the verdict that separates template
    # removal from keep-first paragraph dedup
    got = _run_bp(spark, [
        (0, "a", "nav\nbody zero"),
        (1, "a", "nav\nbody one"),
        (2, "a", "nav\nbody two"),
    ])
    assert got == {0: ("body zero", 1), 1: ("body one", 1),
                   2: ("body two", 1)}


def test_template_is_host_local(spark):
    # the same line on every doc of host a but only one doc of host b:
    # scrubbed from a, kept on b — cross-host rarity is content
    got = _run_bp(spark, [
        (0, "a", "shared line\nbody zero"),
        (1, "a", "shared line\nbody one"),
        (2, "a", "shared line\nbody two"),
        (3, "b", "shared line\nbody three"),
        (4, "b", "body four"),
        (5, "b", "body five"),
    ])
    assert got[0] == ("body zero", 1)
    assert got[3] == ("shared line\nbody three", 0)
    assert got[4] == ("body four", 0)


def test_min_docs_floor_and_frac_threshold(spark):
    # host with 8 docs: threshold = max(3, ceil(0.5*8)) = 4.
    # 'three times' (3 docs) survives; 'four times' (4 docs) scrubbed.
    rows = []
    for i in range(8):
        lines = [f"body {i}"]
        if i < 3:
            lines.append("three times")
        if i < 4:
            lines.append("four times")
        rows.append((i, "h", "\n".join(lines)))
    got = _run_bp(spark, rows)
    assert got[0] == ("body 0\nthree times", 1)
    assert got[5] == ("body 5", 0)


def test_ws_only_lines_never_template(spark):
    # the blank line is on every doc of the host — still kept (it is
    # structure, and it never even reaches the template join)
    got = _run_bp(spark, [
        (0, "a", "x\n\nbody zero"),
        (1, "a", "x\n\nbody one"),
        (2, "a", "x\n\nbody two"),
    ])
    assert got[0] == ("\nbody zero", 1)


def test_fully_scrubbed_and_null_docs_survive(spark):
    got = _run_bp(spark, [
        (0, "a", "nav"),
        (1, "a", "nav"),
        (2, "a", "nav"),
        (3, "a", None),
        (4, None, "nav"),       # null host buckets separately
    ])
    assert got[0] == ("", 1)
    assert got[3] == ("", 0)
    assert got[4] == ("nav", 0)


def test_boilerplate_partition_invariance(spark):
    rows = [(i, f"h{i % 2}",
             "\n".join([f"top h{i % 2}", f"body {i}", "promo"]))
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    expect = {r.doc_id: (r.clean_text, r.n_removed)
              for r in dedup.host_boilerplate_scrub(df.coalesce(1)).collect()}
    got = {r.doc_id: (r.clean_text, r.n_removed)
           for r in dedup.host_boilerplate_scrub(df.repartition(13)).collect()}
    assert got == expect
    # 'promo' spans BOTH hosts and is template in each independently
    assert all(v[0] == f"body {k}" for k, v in expect.items())
