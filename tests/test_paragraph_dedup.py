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
