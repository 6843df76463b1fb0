"""Property-based crash-freedom for the extraction core.

The byte-identity goldens pin correctness on the fixture corpus; these
hypothesis fuzz tests pin ROBUSTNESS on arbitrary input — a 10^12-page
crawl contains every malformed tag soup imaginable, and a single raised
exception inside the Arrow batch would fail the whole task.  Contract:
``extract_page`` never raises, always returns a typed ExtractResult,
and the E2 collapse invariant holds on whatever survives rendering.
"""

from hypothesis import given, settings, strategies as st

from mdscraper_spark.config import ExtractConfig
from mdscraper_spark.extract.pipeline import extract_page

CFG = ExtractConfig()
CFG_FULL = ExtractConfig(no_images=True, no_links=True,
                         exclude_selectors=(".ads", "#nav", "div.x"),
                         extra_heading_space="2,3",
                         prepend_source_link=True,
                         root_url="https://example.com/docs")

tag_soup = st.text(
    alphabet=st.sampled_from(list(
        "<>/=\"' abcdivph123spanclassnavhref&#;!-\n\t")),
    max_size=400)

# hostile-envelope seeds: structural fragments mirroring the frozen
# hostile-* golden corpus (comments, CDATA-ish script bodies,
# mis-nested inline/block, implicit-close li/p chains, entity edges,
# stray closes), mutated by interleaving them in random orders
_HOSTILE_FRAGMENTS = [
    "<!-- <div class='content'><p>decoy</p></div> -->",
    "<script>if (a < b && c > d) { x(\"<p>i</p>\"); }</script>",
    "<style>.x > .y { } /* </style> */</style>",
    "<p><b>bold <i>both</b> tail</i> plain</p>",
    "<span>s<div><p>block</p></div>t</span>",
    "<ul><li>one<li>two<li>three</ul>",
    "<p>first<p>second",
    "<ol><li>o<ul><li>ia<li>ib</ul><li>ot</ol>",
    "&amp;amp; &#x27; &#169; &fake; AT&T 1 &lt; 2",
    "</div></p></b>",
    "<DIV CLASS='content' ><h1>X</h1></div>tail",
    "<div><div><div>deep",
]

hostile_soup = st.lists(
    st.sampled_from(_HOSTILE_FRAGMENTS), min_size=1, max_size=6,
).map(lambda frags: "<div class='content'>" + "".join(frags) + "</div>")

html_ish = st.one_of(
    tag_soup,
    hostile_soup,
    st.builds(lambda t, a: f"<div class='{a}'><p>{t}</p></div>",
              st.text(max_size=100), st.text(max_size=20)),
    st.text(max_size=200),  # arbitrary unicode, no structure
)

STATUSES = {"ok", "no_content", "render_empty", "error"}


@settings(max_examples=150, deadline=None)
@given(html_ish)
def test_extract_never_raises_default_config(html):
    res = extract_page("https://h.test/p", html, CFG)
    assert res.status in STATUSES
    if res.markdown is not None:
        assert isinstance(res.markdown, str)
        # E2 invariant: collapsed output has no 3+ newline runs when
        # extra heading space is off
        assert "\n\n\n" not in res.markdown


@settings(max_examples=150, deadline=None)
@given(html_ish)
def test_extract_never_raises_full_config(html):
    res = extract_page("https://h.test/p", html, CFG_FULL)
    assert res.status in STATUSES
    assert isinstance(res.links, list)


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=300))
def test_extract_handles_unstructured_text(text):
    res = extract_page("https://h.test/p", f"<div>{text}</div>", CFG)
    assert res.status in STATUSES


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_mining_rules_never_raise(md):
    from mdscraper_spark.kg import rules
    from mdscraper_spark.sources.fixtures import alias_rows

    gaz = rules.cached_gazetteer(
        tuple((a, t) for a, _e, _c, t, _p in alias_rows()))
    sents = rules.split_sentences(md)
    assert isinstance(sents, list)
    for _s in rules.detect_mentions(sents, gaz):
        pass
    for _t in rules.extract_triples(sents):
        pass
