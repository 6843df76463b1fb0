"""DOM + selector unit tests (SURVEY.md §5.3-2)."""

from mdscraper_spark.htmlcore.dom import parse_html, TextNode


SAMPLE = """
<!DOCTYPE html>
<html>
<head><title>Test Page</title></head>
<body>
  <div id="main-content" class="wrapper main">
    <p>Hello &amp; welcome</p>
    <img src="x.jpg" alt="X">
    <a href="/a">A</a>
  </div>
  <div class="sidebar ads">side</div>
</body>
</html>
"""


def test_parse_and_find():
    root = parse_html(SAMPLE)
    div = root.find("div")
    assert div is not None and div.attrs["id"] == "main-content"
    assert root.find("div", class_token="main") is div
    assert root.find("div", class_token="wrapper") is div
    assert root.find("div", id_value="main-content") is div
    assert root.find("div", id_value="nope") is None
    # class token match, not substring: 'mai' must not match 'main'
    assert root.find("div", class_token="mai") is None


def test_get_returns_class_list():
    root = parse_html(SAMPLE)
    div = root.find("div")
    assert div.get("class") == ["wrapper", "main"]
    assert div.get("id") == "main-content"


def test_entities_decoded_in_text():
    root = parse_html(SAMPLE)
    p = root.find("p")
    assert p.get_text() == "Hello & welcome"


def test_get_text_strip_drops_whitespace_fragments():
    root = parse_html("<div><p>  a  </p>\n   <p></p>\n<p>b</p></div>")
    div = root.find("div")
    assert div.get_text(strip=True) == "ab"
    empty_p = div.find_all("p")[1]
    assert empty_p.get_text(strip=True) == ""


def test_void_elements_take_no_children():
    root = parse_html("<p><img src='a.png'>text after img</p>")
    img = root.find("img")
    assert img.children == []
    p = root.find("p")
    assert p.get_text() == "text after img"


def test_missing_href_raises_keyerror():
    root = parse_html("<p><a>no href</a></p>")
    a = root.find("a")
    try:
        _ = a["href"]
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_decompose_and_replace_with():
    root = parse_html("<div><p>keep</p><p class='drop'>drop</p></div>")
    root.find("p", class_token="drop").decompose()
    assert root.find("div").get_text() == "keep"
    root2 = parse_html("<p><a href='x'>link text</a></p>")
    a = root2.find("a")
    a.replace_with(TextNode(a.get_text()))
    assert root2.find("p").get_text() == "link text"
    assert root2.find("a") is None


def test_unmatched_end_tag_ignored():
    root = parse_html("<div><p>a</p></span></div><p>b</p>")
    assert len(root.find_all("p")) == 2


def test_select_subset():
    root = parse_html(
        "<div><nav id='nav'>n</nav><div class='ads banner'>ad</div>"
        "<section><span class='ads'>inner</span></section>"
        "<a data-x='1'>l</a></div>"
    )
    assert [e.name for e in root.select(".ads")] == ["div", "span"]
    assert [e.attrs.get("id") for e in root.select("#nav")] == ["nav"]
    assert [e.name for e in root.select("section .ads")] == ["span"]
    assert [e.name for e in root.select("section > .ads")] == ["span"]
    assert [e.name for e in root.select("div.ads")] == ["div"]
    assert [e.name for e in root.select("[data-x]")] == ["a"]
    assert [e.name for e in root.select("[data-x=1]")] == ["a"]
    assert [e.name for e in root.select("nav, .banner")] == ["nav", "div"]


def test_document_order_first_match():
    root = parse_html("<div id='a'>1</div><div id='b'>2</div>")
    assert root.find("div").attrs["id"] == "a"


def test_duplicate_attribute_first_wins_and_valueless_is_empty():
    root = parse_html('<div class="a" class="b" data-flag>x</div>')
    div = root.find("div")
    assert div.get("class") == ["a"]
    assert div.attrs["data-flag"] == ""
