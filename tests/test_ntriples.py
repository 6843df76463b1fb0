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
