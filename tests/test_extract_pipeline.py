"""Extraction-pipeline tests.

Every Markdown/behavior assertion from the reference's own suite
(/root/reference/tests/test_mdscraper.py and test_empty_lines_fix.py)
is replayed here against our pipeline, plus dedicated tests for each
reference quirk (SURVEY.md §7.6-2).
"""

import pytest

from mdscraper_spark.config import ExtractConfig, resolve_config
from mdscraper_spark.extract.pipeline import (
    STAGE_ARTICLE,
    STAGE_CUSTOM_CLASS,
    STAGE_DEFAULT_CLASS,
    STAGE_DEFAULT_ID,
    STAGE_LARGEST_DIV,
    content_to_url_list,
    extract_page,
    find_content_container,
    add_newlines_before_headings,
    finish_markdown,
    parse_heading_levels,
)
from mdscraper_spark.extract.textfns import (
    clean_text,
    extract_md_title,
    get_last_url_part,
    get_relative_url_path,
    sanitize_filename,
)
from mdscraper_spark.htmlcore.dom import parse_html

# Fixture HTML mirroring /root/reference/tests/test_mdscraper.py:28-48
SAMPLE_HTML = """
<!DOCTYPE html>
<html>
<head>
    <title>Test Page</title>
</head>
<body>
    <article class="content">
        <h1>Test Article</h1>
        <p>This is a test paragraph.</p>
        <img src="test.jpg" alt="Test Image">
        <p>Another paragraph with <a href="https://example.com">a link</a>.</p>
        <h2>Section Heading</h2>
        <p>Content in a section.</p>
        <p><img src="section.jpg" alt="Section Image"></p>
        <h3>Subsection</h3>
        <p>More content.</p>
    </article>
</body>
</html>
"""

# Mirrors test_mdscraper.py:228-243
IMAGES_HTML = """
<!DOCTYPE html>
<html>
<body>
    <div class="content">
        <h1>Test</h1>
        <p>Text before image</p>
        <p><img src="test.jpg" alt="Test"></p>
        <p></p>
        <p>Text after image</p>
        <p><img src="test2.jpg" alt="Test2"></p>
        <p>More text</p>
    </div>
</body>
</html>
"""

URL = "https://example.com"


def run(html, **opts):
    cfg = ExtractConfig(**opts)
    return extract_page(URL, html, cfg)


# ---------------------------------------------------------------------------
# container detection (reference test_find_content_container)
# ---------------------------------------------------------------------------

def test_find_content_container_article():
    root = parse_html(SAMPLE_HTML)
    content, stage, name = find_content_container(root, ExtractConfig())
    assert content is not None
    # '<article class="content">' matches the default-name class pass
    # ('content' is in default_content_names)... only for <div>; the
    # article is found by the <article> strategy.
    assert content.name == "article"
    assert content.get("class") == ["content"]
    assert stage == STAGE_ARTICLE


def test_cascade_stage4_div_class():
    root = parse_html(IMAGES_HTML)
    content, stage, name = find_content_container(root, ExtractConfig())
    assert content.name == "div" and stage == STAGE_DEFAULT_CLASS
    assert name == "content"


def test_cascade_stage3_div_id_exact_match():
    html = """
    <body>
      <div id="content-extra">decoy: id must match exactly</div>
      <div id="main-content"><p>real</p></div>
    </body>"""
    root = parse_html(html)
    content, stage, name = find_content_container(root, ExtractConfig())
    assert stage == STAGE_DEFAULT_ID and name == "main-content"
    assert content.get_text(strip=True) == "real"


def test_cascade_list_priority_outranks_document_order():
    # 'content' precedes 'main-content' in default_content_names, so a
    # later-in-document div id='content' must win over an earlier
    # div id='main-content'.
    html = """
    <body>
      <div id="main-content">first in document</div>
      <div id="content">wins by list priority</div>
    </body>"""
    root = parse_html(html)
    content, stage, name = find_content_container(root, ExtractConfig())
    assert name == "content"
    assert "wins" in content.get_text()


def test_cascade_stage6_largest_div_stable_tiebreak():
    html = """
    <body>
      <span>no named containers here</span>
      <div class="a">xxxxxxxxxx</div>
      <div class="b">yyyyyyyyyy</div>
      <div class="c">shorter</div>
    </body>"""
    root = parse_html(html)
    content, stage, name = find_content_container(root, ExtractConfig())
    assert stage == STAGE_LARGEST_DIV
    assert content.get("class") == ["a"]  # tie -> earliest document order


def test_cascade_custom_content_names():
    html = '<body><div class="my-zone"><p>custom</p></div><article>art</article></body>'
    root = parse_html(html)
    content, stage, name = find_content_container(
        root, ExtractConfig(content=("my-zone",)))
    assert stage == STAGE_CUSTOM_CLASS and name == "my-zone"


# ---------------------------------------------------------------------------
# markdown conversion (reference test_fetch_and_convert_to_markdown)
# ---------------------------------------------------------------------------

def test_basic_conversion():
    res = run(SAMPLE_HTML)
    assert res.status == "ok"
    md = res.markdown
    assert "# Test Article" in md
    assert "This is a test paragraph" in md
    assert "![Test Image]" in md
    assert "Section Heading" in md
    assert "## Section Heading" in md
    assert "### Subsection" in md
    # link preserved with url
    assert "[a link](https://example.com)" in md


def test_no_images():
    res = run(SAMPLE_HTML, no_images=True)
    md = res.markdown
    assert "![Test Image]" not in md
    assert "![Section Image]" not in md
    assert "More content." in md


def test_no_links():
    res = run(SAMPLE_HTML, no_links=True)
    md = res.markdown
    assert "](https://example.com)" not in md
    assert "a link" in md
    assert "https://example.com" not in md


def test_extra_heading_space_2_3():
    res = run(SAMPLE_HTML, extra_heading_space="2,3")
    md = res.markdown
    assert md.count("\n\n\n## Section Heading") > 0
    assert md.count("\n\n\n### Subsection") > 0


def test_extra_heading_space_specific_level_only():
    res = run(SAMPLE_HTML, extra_heading_space="2")
    md = res.markdown
    assert md.count("\n\n\n##") >= 1
    assert md.count("\n\n\n###") == 0


def test_title_not_duplicated_when_h1_leads():
    res = run(SAMPLE_HTML)
    assert res.markdown.count("# Test Article") == 1


def test_prepend_source_link():
    res = run(SAMPLE_HTML, prepend_source_link=True)
    assert res.markdown.startswith(f"Source: <{URL}>\n\n")


def test_title_prepended_when_no_h1_in_content():
    html = '<body><div class="content"><p>just text</p></div><h1>Page H1</h1></body>'
    res = run(html)
    # h1 is outside the container but title comes from the whole page
    assert res.markdown.startswith("# Page H1\n\n")
    assert res.title == "Page H1"


def test_title_fallback_to_title_tag_then_webpage():
    html = "<head><title>From Title</title></head><body><div class='content'>x</div></body>"
    assert run(html).title == "From Title"
    html2 = "<body><div class='content'>x</div></body>"
    assert run(html2).title == "Webpage"


# ---------------------------------------------------------------------------
# empty-lines regression (reference test_image_removal_empty_lines +
# test_empty_lines_fix.py)
# ---------------------------------------------------------------------------

def test_image_removal_no_triple_newlines():
    res = run(IMAGES_HTML, no_images=True)
    md = res.markdown
    assert "\n\n\n" not in md
    assert "Text before image" in md
    assert "Text after image" in md
    paragraphs = [p for p in md.split("\n\n") if p.strip()]
    assert len(paragraphs) >= 3


EMPTY_LINES_HTML = """
<!DOCTYPE html>
<html>
<head><title>Test Empty Lines</title></head>
<body>
    <div class="content">
        <h1>Test Document</h1>
        <p>This is a paragraph before an image.</p>
        <p><img src="image1.jpg" alt="Image 1"></p>
        <p>This is a paragraph between two images.</p>
        <p><img src="image2.jpg" alt="Image 2"></p>
        <p></p>
        <p>This is a paragraph after an empty paragraph.</p>
        <div>
            <img src="image3.jpg" alt="Image 3">
        </div>
        <p>Text after a div with only an image.</p>
        <p>
            Some text with an inline image: <img src="inline.jpg" alt="Inline"> and more text.
        </p>
        <h2>Multiple Empty Paragraphs</h2>
        <p><img src="multiple1.jpg" alt="Multiple 1"></p>
        <p></p>
        <p></p>
        <p></p>
        <p>Text after multiple empty paragraphs and an image.</p>
        <p>Final paragraph.</p>
    </div>
</body>
</html>
"""


def test_empty_lines_fix_no_excessive_newlines():
    res = run(EMPTY_LINES_HTML, no_images=True)
    md = res.markdown
    assert "\n\n\n\n" not in md
    assert "\n\n\n" not in md
    paragraphs = [p for p in md.split("\n\n") if p.strip()]
    flow = False
    for i in range(len(paragraphs) - 1):
        if "paragraph before" in paragraphs[i] and "paragraph between" in paragraphs[i + 1]:
            flow = True
    assert flow, f"paragraph flow broken: {paragraphs}"
    # inline image removed but its sentence survives
    assert "Some text with an inline image:" in md
    assert "and more text" in md


def test_empty_lines_with_images_keeps_all_images():
    res = run(EMPTY_LINES_HTML)
    md = res.markdown
    for n in ("image1.jpg", "image2.jpg", "image3.jpg", "inline.jpg", "multiple1.jpg"):
        assert n in md


# ---------------------------------------------------------------------------
# exclude selectors + root url
# ---------------------------------------------------------------------------

def test_exclude_selectors():
    html = """
    <body><div class="content">
      <div class="ads">BUY NOW</div>
      <nav id="nav">navigation</nav>
      <p>real content</p>
    </div></body>"""
    res = run(html, exclude_selectors=(".ads", "#nav"))
    assert "BUY NOW" not in res.markdown
    assert "navigation" not in res.markdown
    assert "real content" in res.markdown


def test_make_urls_relative():
    html = """
    <body><div class="content">
      <p><a href="https://docs.test/docs/page1.html">P1</a></p>
    </div></body>"""
    res = run(html, root_url="https://docs.test/docs")
    assert "[P1](/page1.html)" in res.markdown


def test_make_urls_relative_replace_all_quirk():
    # '/docs/a/docs/b' with root path '/docs' -> '/a/b' (replace-all)
    assert get_relative_url_path(
        "https://x.test/docs/a/docs/b", "https://x.test/docs") == "/a/b"


def test_href_less_anchor_with_root_url_is_row_error():
    html = '<body><div class="content"><a>no href</a></div></body>'
    res = run(html, root_url="https://x.test/r")
    assert res.status == "error"
    assert "KeyError" in res.error


def test_no_content_container():
    html = "<body><span>no divs no articles</span></body>"
    res = run(html)
    assert res.status == "no_content"
    assert res.markdown is None


# ---------------------------------------------------------------------------
# E3 heading-space quirks
# ---------------------------------------------------------------------------

def test_parse_heading_levels():
    assert parse_heading_levels("all") == [1, 2, 3, 4, 5, 6]
    assert parse_heading_levels("2,3") == [2, 3]
    assert parse_heading_levels("0,2,9") == [2]
    assert parse_heading_levels("2,x") == [1, 2, 3, 4, 5, 6]  # ValueError -> all
    assert parse_heading_levels("") == []


def test_add_newlines_inserts_three_blank_lines():
    md = "# Title\nSome text\n## Section\nMore text\n### Subsection\nEven more"
    out = add_newlines_before_headings(md, "all")
    assert out.count("\n\n\n##") >= 1
    assert out.count("\n\n\n###") >= 1
    out2 = add_newlines_before_headings(md, "2")
    assert out2.count("\n\n\n##") >= 1
    assert out2.count("\n\n\n###") == 0
    # first line never gets prefix newlines
    assert add_newlines_before_headings("# T\nx", "all").startswith("# T")


def test_level2_pass_does_not_fire_on_h3_lines():
    md = "x\n### deep heading\ny"
    assert add_newlines_before_headings(md, "2") == md


# ---------------------------------------------------------------------------
# E2 collapse-order quirks
# ---------------------------------------------------------------------------

def test_finish_markdown_collapses_whitespace_newline_runs():
    md = "a\n\n\n \n \nb"
    out = finish_markdown(md, None, None, None)
    assert out == "a\n\nb"


def test_finish_markdown_title_exact_prefix_check():
    out = finish_markdown("# T\n\nbody", "T", None, None)
    assert out == "# T\n\nbody"
    out2 = finish_markdown("body", "T", None, None)
    assert out2 == "# T\n\nbody"


def test_finish_markdown_heading_space_survives():
    md = "# T\n\n## S\n\nbody"
    out = finish_markdown(md, None, None, "2")
    assert "\n\n\n## S" in out


def test_finish_markdown_falsy_is_none():
    assert finish_markdown("", "T", None, None) is None


# ---------------------------------------------------------------------------
# scalar functions
# ---------------------------------------------------------------------------

def test_clean_text_unescape_after_collapse():
    # entities that decode to whitespace survive the collapse
    assert clean_text("a &nbsp;  b &#10; c") == "a \xa0 b \n c"
    assert clean_text("  lots   of\tspace ") == "lots of space"
    assert clean_text(None) == ""


def test_extract_md_title_replace_all_quirk():
    md = "# Title with # inner # hash\nbody"
    assert extract_md_title(md) == "Title with inner hash"
    assert extract_md_title("no heading") is None


def test_get_last_url_part():
    assert get_last_url_part("https://x.test/a/b/page.html?q=1#f") == "page.html"
    assert get_last_url_part("https://x.test/a/b/") == ""


def test_sanitize_filename():
    assert sanitize_filename('a\\b/c*d?e:f"g<h>i|j') == "a_b_c_d_e_f_g_h_i_j"


# ---------------------------------------------------------------------------
# A4 link harvest (reference test_content_to_url_list_*)
# ---------------------------------------------------------------------------

def _soup(html):
    return parse_html(html)


def test_url_list_basic():
    html = '<html><body><a href="/page1.html">P1</a><a href="/page2.html">P2</a></body></html>'
    assert content_to_url_list(_soup(html), "https://example.com") == [
        "https://example.com/page1.html",
        "https://example.com/page2.html",
    ]


def test_url_list_excluded_pages():
    html = ('<body><a href="/page1.html">P</a><a href="/excluded-page.html">E</a>'
            '<a href="/ignore-this-page.html">I</a></body>')
    out = content_to_url_list(_soup(html), "https://example.com",
                              ["excluded-page.html", "ignore-this-page*"])
    assert out == ["https://example.com/page1.html"]


def test_url_list_foreign_host_rewritten_onto_site_root():
    html = ('<body><a href="/page1.html">P</a>'
            '<a href="https://other.host/page2.html">A</a></body>')
    assert content_to_url_list(_soup(html), "https://example.com") == [
        "https://example.com/page1.html",
        "https://example.com/page2.html",
    ]


def test_url_list_empty_and_duplicates_and_order():
    assert content_to_url_list(_soup("<body><p>No links here!</p></body>"),
                               "https://example.com") == []
    html = '<body><a href="/a">1</a><a href="/a">2</a></body>'
    assert content_to_url_list(_soup(html), "https://x.test") == [
        "https://x.test/a", "https://x.test/a"]


# ---------------------------------------------------------------------------
# config layering (G4)
# ---------------------------------------------------------------------------

def test_config_file_only_overrides_defaults():
    cfg = resolve_config(cli_options={"no_images": True},
                         config_file_options={"no_images": False, "no_links": True})
    assert cfg.no_images is True   # CLI wins
    assert cfg.no_links is True    # file fills untouched default


def test_unknown_config_key_raises():
    with pytest.raises(KeyError):
        resolve_config(config_file_options={"nope": 1})
    with pytest.raises(KeyError):
        resolve_config(cli_options={"bad_key": 1})


def test_harvest_runs_on_raw_container_before_strip_passes():
    """Reference parity (scraper.py:779-784): site-mode harvest reads
    the detected container BEFORE exclude/no_links/relativize — anchors
    inside excluded regions still harvest, and --no-links does not
    silently empty a --site run."""
    from mdscraper_spark.config import ExtractConfig
    from mdscraper_spark.extract.pipeline import extract_page

    html = """
    <div class="content">
      <p><a href="/keep.html">keep</a></p>
      <div class="ads"><a href="/from-ads.html">ad link</a></div>
    </div>
    """
    res = extract_page("https://s.test/x", html,
                       ExtractConfig(exclude_selectors=(".ads",),
                                     no_links=True))
    assert res.status == "ok"
    assert res.links == ["/keep.html", "/from-ads.html"]
    assert "keep" in res.markdown and "](" not in res.markdown
    assert "ad link" not in res.markdown      # markdown still excludes
