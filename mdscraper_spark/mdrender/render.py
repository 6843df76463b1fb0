"""HTML -> Markdown renderer (ATX headings), clean-room.

The reference renders Markdown via the external ``markdownify`` package
with ``heading_style="ATX"`` (/root/reference/mdscraper/core/scraper.py:331,
dependency pinned ``markdownify>=0.11.6`` in /root/reference/pyproject.toml:28).
That package is not installable in this environment, so this module
reimplements its documented conversion semantics from scratch over our
own DOM (mdscraper_spark.htmlcore).  Behavior contract (verified against
every Markdown assertion in /root/reference/tests/test_mdscraper.py and
/root/reference/tests/test_empty_lines_fix.py, then frozen as golden
files in tests/goldens/):

* ATX ``#`` headings, heading text collapsed to one line;
* ``[text](href)`` links, autolink ``<href>`` when the text equals the
  href; ``![alt](src "title")`` images; images inside headings/cells
  degrade to their alt text;
* ``*``/``**`` emphasis, ``*+-`` bullet cycle by list depth, ``n.``
  ordered lists, ``> `` blockquotes, fenced code for ``<pre>``,
  ``---`` for ``<hr>``, two-space hard line breaks for ``<br>``;
* ``*`` and ``_`` escaped in regular text, nothing escaped in code;
* whitespace-only text between block-level elements is dropped, text
  runs containing a newline collapse to a single newline, tab/space
  runs collapse to a single space (no collapsing inside ``<pre>``);
* newline runs at sibling boundaries are capped at two;
* the finished document is stripped of leading/trailing newlines.

Pure Python; executed only inside Arrow batch UDFs.
"""

from __future__ import annotations

import re
from typing import Optional

from mdscraper_spark.htmlcore.dom import (
    CommentNode,
    Document,
    DoctypeNode,
    Element,
    Node,
    TextNode,
)

_HEADING_RE = re.compile(r"h([1-6])$")
_WHITESPACE_RE = re.compile(r"[\t ]+")
_NEWLINE_WS_RE = re.compile(r"[\t \r\n]*[\r\n][\t \r\n]*")
_ALL_WS_RE = re.compile(r"[\t \r\n]+")
_EDGE_NL_RE = re.compile(r"^(\n*)((?:.*[^\n])?)(\n*)$", re.DOTALL)

# Block-level elements: whitespace-only text immediately inside them or
# adjacent to them carries no meaning and is dropped.
_BLOCK_INSIDE = frozenset({
    "p", "blockquote", "cite", "article", "div", "section", "main",
    "ol", "ul", "li", "dl", "dt", "dd",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6",
})

BULLETS = "*+-"


def _is_block_inside(el: Optional[Node]) -> bool:
    return isinstance(el, Element) and el.name in _BLOCK_INSIDE


def _is_block_outside(el: Optional[Node]) -> bool:
    return _is_block_inside(el) or (isinstance(el, Element) and el.name == "pre")


def _chomp(text: str) -> tuple:
    """Split off a single leading/trailing space for inline markup."""
    prefix = " " if text and text[0] == " " else ""
    suffix = " " if text and text[-1] == " " else ""
    return prefix, suffix, text.strip()


def _next_meaningful_sibling(el: Node) -> Optional[Node]:
    sib = el.next_sibling
    while sib is not None:
        if isinstance(sib, Element):
            return sib
        if isinstance(sib, TextNode) and sib.data.strip():
            return sib
        sib = sib.next_sibling
    return None


class MarkdownRenderer:
    """Renders a DOM subtree to Markdown with ATX headings."""

    def __init__(self, autolinks: bool = True, bullets: str = BULLETS,
                 escape_asterisks: bool = True, escape_underscores: bool = True):
        self.autolinks = autolinks
        self.bullets = bullets
        self.escape_asterisks = escape_asterisks
        self.escape_underscores = escape_underscores

    # ------------------------------------------------------------------
    def render(self, node: Element) -> str:
        """Render a subtree; the result is stripped of edge newlines."""
        return self._render_element(node, frozenset()).strip("\n")

    # -- text ----------------------------------------------------------
    def _escape(self, text: str) -> str:
        if self.escape_asterisks:
            text = text.replace("*", "\\*")
        if self.escape_underscores:
            text = text.replace("_", "\\_")
        return text

    def _render_text(self, el: TextNode, parent_tags: frozenset) -> str:
        text = el.data
        if "pre" not in parent_tags:
            text = _NEWLINE_WS_RE.sub("\n", text)
            text = _WHITESPACE_RE.sub(" ", text)
        if "_noformat" not in parent_tags:
            text = self._escape(text)
        parent = el.parent
        if _is_block_outside(el.previous_sibling) or (
            _is_block_inside(parent) and el.previous_sibling is None
        ):
            text = text.lstrip(" \t\r\n")
        if _is_block_outside(el.next_sibling) or (
            _is_block_inside(parent) and el.next_sibling is None
        ):
            text = text.rstrip()
        return text

    # -- elements --------------------------------------------------------
    def _skippable(self, el: Node, container: Element) -> bool:
        """Whitespace-only text at block boundaries carries no content."""
        if isinstance(el, (CommentNode, DoctypeNode)):
            return True
        if not isinstance(el, TextNode) or el.data.strip():
            return False
        if _is_block_inside(container) and (
            el.previous_sibling is None or el.next_sibling is None
        ):
            return True
        return _is_block_outside(el.previous_sibling) or _is_block_outside(
            el.next_sibling
        )

    def _render_element(self, node: Element, parent_tags: frozenset) -> str:
        children = [c for c in node.children if not self._skippable(c, node)]

        child_tags = set(parent_tags)
        child_tags.add(node.name)
        if _HEADING_RE.match(node.name or "") or node.name in ("td", "th"):
            child_tags.add("_inline")
        if node.name in ("pre", "code", "kbd", "samp"):
            child_tags.add("_noformat")
        child_tags = frozenset(child_tags)

        pieces = []
        for child in children:
            if isinstance(child, TextNode):
                pieces.append(self._render_text(child, child_tags))
            elif isinstance(child, Element):
                pieces.append(self._render_element(child, child_tags))
        pieces = [p for p in pieces if p]

        if node.name == "pre" or "pre" in parent_tags:
            text = "".join(pieces)
        else:
            # cap newline runs at sibling boundaries to two
            merged = [""]
            for piece in pieces:
                lead, content, trail = _EDGE_NL_RE.match(piece).groups()
                if not content:
                    # ALL-newline piece (e.g. an empty blockquote's
                    # '\n'): fold it into the pending boundary run —
                    # emitting it as content would end the merge chain
                    # and let a 3-4 newline run through the cap
                    prev_trail = merged.pop()
                    merged.append("\n" * min(2, max(len(prev_trail),
                                                    len(lead),
                                                    len(trail))))
                    continue
                if merged[-1] and lead:
                    prev_trail = merged.pop()
                    lead = "\n" * min(2, max(len(prev_trail), len(lead)))
                merged.extend([lead, content, trail])
            text = "".join(merged)

        handler = self._handler_for(node.name)
        if handler is not None:
            text = handler(node, text, parent_tags)
        return text

    def _handler_for(self, name: Optional[str]):
        if name is None or name == "[document]":
            return None
        m = _HEADING_RE.match(name)
        if m:
            level = int(m.group(1))
            return lambda el, text, pt: self._heading(level, el, text, pt)
        return getattr(self, f"_tag_{name}", None)

    # -- block converters ------------------------------------------------
    def _heading(self, level: int, el: Element, text: str, parent_tags: frozenset) -> str:
        if "_inline" in parent_tags:
            return text
        text = _ALL_WS_RE.sub(" ", text).strip()
        return "\n\n%s %s\n\n" % ("#" * level, text)

    def _tag_p(self, el: Element, text: str, parent_tags: frozenset) -> str:
        if "_inline" in parent_tags:
            return " " + text.strip() + " "
        text = text.strip()
        return "\n\n%s\n\n" % text if text else ""

    def _block_container(self, el: Element, text: str, parent_tags: frozenset) -> str:
        if "_inline" in parent_tags:
            return " " + text.strip() + " "
        text = text.strip()
        return "\n\n%s\n\n" % text if text else ""

    _tag_div = _block_container
    _tag_article = _block_container
    _tag_section = _block_container
    _tag_main = _block_container

    def _tag_blockquote(self, el: Element, text: str, parent_tags: frozenset) -> str:
        text = (text or "").strip(" \t\r\n")
        if "_inline" in parent_tags:
            return " " + text + " "
        if not text:
            return "\n"
        quoted = "\n".join(
            ("> " + line if line else ">") for line in text.split("\n")
        )
        return "\n" + quoted + "\n\n"

    # definition lists (markdownify convert_dt/convert_dd, PHP-Markdown
    #-Extra style: bare term line, ':   ' definition lines)
    def _tag_dt(self, el: Element, text: str, parent_tags: frozenset) -> str:
        text = (text or "").strip()
        text = _ALL_WS_RE.sub(" ", text)
        if "_inline" in parent_tags:
            return " " + text + " "
        if not text:
            return ""
        return "\n\n%s\n" % text

    def _tag_dd(self, el: Element, text: str, parent_tags: frozenset) -> str:
        text = (text or "").strip()
        if "_inline" in parent_tags:
            return " " + text + " "
        if not text:
            return ""
        return ":   %s\n" % text

    def _tag_hr(self, el: Element, text: str, parent_tags: frozenset) -> str:
        return "\n\n---\n\n"

    def _tag_br(self, el: Element, text: str, parent_tags: frozenset) -> str:
        if "_inline" in parent_tags:
            return ""
        return "  \n"

    def _tag_pre(self, el: Element, text: str, parent_tags: frozenset) -> str:
        if not text:
            return ""
        return "\n\n```\n%s\n```\n\n" % text

    # -- lists -------------------------------------------------------------
    def _tag_list(self, el: Element, text: str, parent_tags: frozenset) -> str:
        if "li" in parent_tags:
            return "\n" + text.rstrip()
        nxt = _next_meaningful_sibling(el)
        before_paragraph = nxt is not None and getattr(nxt, "name", None) not in (
            "ul", "ol",
        )
        return "\n\n" + text + ("\n" if before_paragraph else "")

    _tag_ul = _tag_list
    _tag_ol = _tag_list

    def _tag_li(self, el: Element, text: str, parent_tags: frozenset) -> str:
        text = (text or "").strip()
        if not text:
            return "\n"
        parent = el.parent
        if parent is not None and parent.name == "ol":
            start_attr = parent.attrs.get("start", "")
            start = int(start_attr) if start_attr.isdigit() else 1
            n_prev = sum(
                1 for sib in parent.children[: el._sib_index()]
                if isinstance(sib, Element) and sib.name == "li"
            )
            bullet = "%d." % (start + n_prev)
        else:
            depth = -1
            cur: Optional[Element] = el
            while cur is not None:
                if cur.name == "ul":
                    depth += 1
                cur = cur.parent
            bullet = self.bullets[depth % len(self.bullets)]
        bullet += " "
        indent = " " * len(bullet)
        indented = "\n".join(
            (indent + line if line else "") for line in text.split("\n")
        )
        return "%s%s\n" % (bullet, indented[len(bullet):])

    # -- inline converters ---------------------------------------------------
    def _tag_a(self, el: Element, text: str, parent_tags: frozenset) -> str:
        if "_noformat" in parent_tags:
            return text
        prefix, suffix, text = _chomp(text)
        if not text:
            return ""
        href = el.attrs.get("href")
        title = el.attrs.get("title")
        if self.autolinks and text.replace("\\_", "_") == href and not title:
            return "<%s>" % href
        title_part = ' "%s"' % title.replace('"', '\\"') if title else ""
        if href:
            return "%s[%s](%s%s)%s" % (prefix, text, href, title_part, suffix)
        return text

    def _tag_img(self, el: Element, text: str, parent_tags: frozenset) -> str:
        alt = el.attrs.get("alt") or ""
        src = el.attrs.get("src") or ""
        title = el.attrs.get("title") or ""
        title_part = ' "%s"' % title.replace('"', '\\"') if title else ""
        if "_inline" in parent_tags:
            return alt
        return "![%s](%s%s)" % (alt, src, title_part)

    def _inline_wrap(self, markup: str, el: Element, text: str,
                     parent_tags: frozenset) -> str:
        if "_noformat" in parent_tags:
            return text
        prefix, suffix, text = _chomp(text)
        if not text:
            return ""
        return "%s%s%s%s%s" % (prefix, markup, text, markup, suffix)

    def _tag_strong(self, el, text, pt):
        return self._inline_wrap("**", el, text, pt)

    _tag_b = _tag_strong

    def _tag_em(self, el, text, pt):
        return self._inline_wrap("*", el, text, pt)

    _tag_i = _tag_em

    def _tag_del(self, el, text, pt):
        return self._inline_wrap("~~", el, text, pt)

    _tag_s = _tag_del

    def _tag_code(self, el, text, pt):
        return self._inline_wrap("`", el, text, pt)

    _tag_kbd = _tag_code
    _tag_samp = _tag_code

    # -- stripped elements ------------------------------------------------
    def _drop(self, el: Element, text: str, parent_tags: frozenset) -> str:
        return ""

    _tag_script = _drop
    _tag_style = _drop

    # -- tables ---------------------------------------------------------------
    def _tag_table(self, el: Element, text: str, parent_tags: frozenset) -> str:
        return "\n\n" + text.strip() + "\n\n"

    def _tag_caption(self, el: Element, text: str, parent_tags: frozenset) -> str:
        return text.strip() + "\n\n"

    def _tag_cell(self, el: Element, text: str, parent_tags: frozenset) -> str:
        colspan_attr = el.attrs.get("colspan", "")
        colspan = int(colspan_attr) if colspan_attr.isdigit() else 1
        return " " + text.strip().replace("\n", " ") + " |" * colspan

    _tag_td = _tag_cell
    _tag_th = _tag_cell

    def _tag_tr(self, el: Element, text: str, parent_tags: frozenset) -> str:
        cells = el.find_all(("td", "th"))
        prev = el.previous_sibling
        while prev is not None and not isinstance(prev, Element):
            prev = prev.previous_sibling
        is_first_row = prev is None
        is_headrow = bool(cells) and all(c.name == "th" for c in cells)
        n_cols = 0
        for c in cells:
            colspan_attr = c.attrs.get("colspan", "")
            n_cols += int(colspan_attr) if colspan_attr.isdigit() else 1
        overline = underline = ""
        # the empty-header overline belongs only to a headerless
        # table's FIRST row-container: parent is the table itself, or a
        # tbody with no preceding element (markdownify 0.11.6
        # convert_tr gates on el.parent being 'table' or a first
        # tbody).  A tbody preceded by a thead must NOT re-emit a
        # phantom blank header + second separator mid-table.
        parent = el.parent
        first_container = False
        if parent is not None:
            if parent.name == "table":
                first_container = True
            elif parent.name in ("tbody", "thead"):
                pprev = parent.previous_sibling
                while pprev is not None and not isinstance(pprev, Element):
                    pprev = pprev.previous_sibling
                first_container = pprev is None
        if is_first_row and is_headrow:
            underline = "| " + " | ".join(["---"] * n_cols) + " |\n"
        elif is_first_row and first_container:
            overline = (
                "|" + " |" * n_cols + "\n"
                + "| " + " | ".join(["---"] * n_cols) + " |\n"
            )
        return overline + "|" + text + "\n" + underline


_DEFAULT = MarkdownRenderer()


def render_markdown(node: Element) -> str:
    """Render with the reference's effective options (ATX, autolinks)."""
    return _DEFAULT.render(node)
