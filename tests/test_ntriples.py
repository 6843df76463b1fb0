"""N-Triples graph export (round 4): IRI-fragment mangling is injective
over the five breakable characters and the rendered line shape matches
the W3C N-Triples grammar; the registry row kg_export_ntriples pins
the same render against the frozen oracle edges in SQL.
"""

from mdscraper_spark.operators import kg as kg_ops


def _render(spark, rows):
    df = spark.createDataFrame(rows, "src string, pred string, dst string, "
                                     "n_support long")
    return {r["ntriple"]: r["n_support"]
            for r in kg_ops.edges_to_ntriples(df).collect()}


def test_plain_edge_line_shape(spark):
    got = _render(spark, [("e:42", "works_for", "e:7", 3)])
    assert got == {"<urn:kg:e:e:42> <urn:kg:p:works_for> <urn:kg:e:e:7> .": 3}


def test_breakable_chars_escaped(spark):
    got = _render(spark, [('s:a b<c>"d%e', "rel x", "e:1", 1)])
    (line,) = got
    assert line == ('<urn:kg:e:s:a%20b%3Cc%3E%22d%25e> '
                    '<urn:kg:p:rel%20x> <urn:kg:e:e:1> .')
    # no raw breakable chars survive inside any IRI token
    for tok in line.split(" ")[:3]:
        inner = tok[1:-1]
        assert not any(ch in inner for ch in ' <>"')


def test_escaping_injective(spark):
    # '%' encoded first => distinct inputs stay distinct after mangling
    got = _render(spark, [("s:a b", "p", "e:1", 1),
                          ("s:a%20b", "p", "e:1", 1)])
    assert len(got) == 2


def test_custom_base(spark):
    df = spark.createDataFrame([("e:1", "p", "e:2", 1)],
                               "src string, pred string, dst string, "
                               "n_support long")
    (row,) = kg_ops.edges_to_ntriples(df, base="http://kg.test/").collect()
    assert row["ntriple"].startswith("<http://kg.test/e:")


def test_full_iriref_excluded_set_escaped(spark):
    """Round-4 ADVICE: the W3C IRIREF production forbids [#x00-#x20]
    < > " { } | ^ ` \\ — every one must be percent-encoded, uppercase
    hex, '%' first."""
    nasty = 'a\\b{c}d|e^f`g\x01h\x1fi\tj'
    got = _render(spark, [(nasty, "p", "e:1", 1)])
    (line,) = got
    frag = line.split(" ")[0][len("<urn:kg:e:"):-1]
    assert frag == "a%5Cb%7Bc%7Dd%7Ce%5Ef%60g%01h%1Fi%09j"
    # nothing the grammar forbids survives in any IRI token
    forbidden = set('<>"{}|^`\\') | {chr(c) for c in range(0x21)}
    for tok in line.split(" ")[:3]:
        assert not (set(tok[1:-1]) & forbidden), tok


def test_sql_twin_matches_spark_on_adversarial_input(spark, tmp_path):
    """The DuckDB oracle fragment is GENERATED from kg_ops._NT_ESCAPES;
    prove the two renders agree byte-for-byte on inputs covering the
    whole excluded set."""
    import duckdb

    from mdscraper_spark.queries import _nt_sql_frag_expr

    rows = [('s:a b<c>"d%e', "rel x", "e:1", 1),
            ('a\\b{c}d|e^f`g', "p|q", 'e:"2"', 2),
            ("ctl\x00\x01\x1f\x09end", "p", "e:3", 3),
            ("plain", "works_for", "e:4", 4)]
    spark_lines = sorted(_render(spark, rows))
    con = duckdb.connect()
    con.execute("CREATE TABLE edges (src VARCHAR, pred VARCHAR, "
                "dst VARCHAR, n_support BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?,?,?,?)", rows)
    sql_lines = sorted(r[0] for r in con.execute(
        f"SELECT '<urn:kg:e:' || {_nt_sql_frag_expr('src')} ||"
        f" '> <urn:kg:p:' || {_nt_sql_frag_expr('pred')} ||"
        f" '> <urn:kg:e:' || {_nt_sql_frag_expr('dst')} || '> .'"
        " FROM edges").fetchall())
    assert spark_lines == sql_lines


def _render_prov(spark, rows):
    df = spark.createDataFrame(
        rows, "src string, pred string, dst string, n_support long, "
              "n_docs long, first_url string, last_url string")
    return [r["ntriple"] for r in
            kg_ops.provenance_to_ntriples(df).collect()]


def test_provenance_export_reification_shape(spark):
    lines = _render_prov(spark, [("e:1", "works_for", "e:2", 3, 2,
                                  "https://a.test/x", "https://z.test/y")])
    assert len(lines) == 9
    import hashlib
    sid = hashlib.md5("e:1\x1fworks_for\x1fe:2".encode()).hexdigest()
    stmt = f"<urn:kg:stmt:{sid}>"
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    xsd = "http://www.w3.org/2001/XMLSchema#integer"
    assert lines[0] == "<urn:kg:e:e:1> <urn:kg:p:works_for> <urn:kg:e:e:2> ."
    assert f"{stmt} <{rdf}type> <{rdf}Statement> ." in lines
    assert f"{stmt} <{rdf}subject> <urn:kg:e:e:1> ." in lines
    assert f"{stmt} <{rdf}predicate> <urn:kg:p:works_for> ." in lines
    assert f"{stmt} <{rdf}object> <urn:kg:e:e:2> ." in lines
    assert f'{stmt} <urn:kg:m:n_support> "3"^^<{xsd}> .' in lines
    assert f'{stmt} <urn:kg:m:n_docs> "2"^^<{xsd}> .' in lines
    assert f'{stmt} <urn:kg:m:first_url> "https://a.test/x" .' in lines
    assert f'{stmt} <urn:kg:m:last_url> "https://z.test/y" .' in lines


def test_provenance_literal_echar_escaping(spark):
    """STRING_LITERAL_QUOTE requires ECHAR for backslash, quote, LF, CR
    — urls are the only literal payload; prove they are escaped."""
    lines = _render_prov(spark, [("e:1", "p", "e:2", 1, 1,
                                  'u"r\\l\nx', "plain")])
    (first_line,) = [l for l in lines if "m:first_url" in l]
    assert '"u\\"r\\\\l\\nx"' in first_line
    # the rendered literal body contains no raw quote/backslash/newline
    body = first_line.split('m:first_url> "', 1)[1].rsplit('" .', 1)[0]
    assert "\n" not in body and "\r" not in body


def test_provenance_export_no_shuffle(spark):
    """Projection + explode only: the physical plan must contain no
    Exchange — the export cannot introduce a shuffle at any scale."""
    df = spark.createDataFrame(
        [("e:1", "p", "e:2", 1, 1, "u", "u")],
        "src string, pred string, dst string, n_support long, "
        "n_docs long, first_url string, last_url string")
    plan = kg_ops.provenance_to_ntriples(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
