"""Dependency-free HTML DOM built on stdlib ``html.parser``.

Clean-room implementation of the tree semantics the reference pipeline
observes through BeautifulSoup's ``'html.parser'`` backend
(reference: /root/reference/mdscraper/core/scraper.py:268 parses with
``BeautifulSoup(response.text, 'html.parser')``).  Behaviors pinned here:

* entity decoding in text nodes (``convert_charrefs=True`` — the stdlib
  tokenizer both bs4 and we sit on);
* ``class`` is a multi-valued attribute: ``get('class')`` returns the
  whitespace-split token list; class matching is *token* membership
  (scraper.py:580 ``soup.find('div', class_=name)``);
* ``id`` matching is exact-string on the attribute
  (scraper.py:583-589 hand-rolled scan);
* ``find``/``find_all`` walk the tree in document (pre-)order;
* unmatched end tags are ignored; an end tag pops the open-element
  stack to its nearest matching open tag;
* void elements never take children;
* ``get_text(strip=True)`` strips each text fragment and drops the
  empty ones (bs4 ``Tag.get_text`` contract, relied on at
  scraper.py:501 and :655).

This module is pure Python and is executed inside Arrow-vectorized
batch UDFs only — never per Spark row from the driver.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional

VOID_ELEMENTS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
})

_TEXT_ESCAPES = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}


def _escape_text(s: str) -> str:
    for ch, rep in _TEXT_ESCAPES.items():
        s = s.replace(ch, rep)
    return s


def _escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


class Node:
    """Base node: has a parent and can remove itself from the tree."""

    __slots__ = ("parent", "_pidx")

    def __init__(self) -> None:
        self.parent: Optional[Element] = None
        self._pidx: int = 0        # sibling-index hint (see _sib_index)

    def _sib_index(self) -> int:
        """O(1)-amortized index of self in parent.children: verify the
        cached hint, and on a miss (tree surgery moved siblings)
        refresh EVERY sibling's hint in one pass.  Without this, each
        next_sibling/previous_sibling is an O(n) list scan — and the
        renderer consults siblings per child, turning one flat element
        with k children into O(k²) comparisons on the hot path."""
        sibs = self.parent.children
        i = self._pidx
        if 0 <= i < len(sibs) and sibs[i] is self:
            return i
        for j, c in enumerate(sibs):
            c._pidx = j
        return self._pidx

    # -- tree surgery -------------------------------------------------
    def extract(self) -> "Node":
        """Detach this node from its parent (keeps the node alive)."""
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None
        return self

    def decompose(self) -> None:
        """Remove this node (and implicitly its subtree) from the tree."""
        self.extract()

    def replace_with(self, node: "Node") -> None:
        if self.parent is None:
            raise ValueError("cannot replace a detached node")
        # extract the incoming node FIRST: if it is an earlier sibling
        # in the same parent, extracting it shifts this node's index —
        # computing idx before the extract corrupted the tree
        parent = self.parent
        node.extract()
        idx = parent.children.index(self)
        node.parent = parent
        parent.children[idx] = node
        self.parent = None

    # -- navigation ---------------------------------------------------
    @property
    def next_sibling(self) -> Optional["Node"]:
        if self.parent is None:
            return None
        sibs = self.parent.children
        i = self._sib_index()
        return sibs[i + 1] if i + 1 < len(sibs) else None

    @property
    def previous_sibling(self) -> Optional["Node"]:
        if self.parent is None:
            return None
        sibs = self.parent.children
        i = self._sib_index()
        return sibs[i - 1] if i > 0 else None

    @property
    def name(self) -> Optional[str]:
        return None  # overridden by Element


class TextNode(Node):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"TextNode({self.data!r})"


class CommentNode(Node):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data


class DoctypeNode(Node):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data


class Element(Node):
    __slots__ = ("_name", "attrs", "children")

    def __init__(self, name: str, attrs: Optional[dict] = None) -> None:
        super().__init__()
        self._name = name
        self.attrs: dict = attrs or {}
        self.children: list = []

    @property
    def name(self) -> str:
        return self._name

    # -- attributes ---------------------------------------------------
    def get(self, key: str, default=None):
        """bs4-style attribute access: ``class`` is multi-valued."""
        if key not in self.attrs:
            return default
        val = self.attrs[key]
        if key == "class":
            return val.split()
        return val

    def get_raw(self, key: str, default=None):
        return self.attrs.get(key, default)

    def has_class_token(self, token: str) -> bool:
        return token in self.attrs.get("class", "").split()

    def __setitem__(self, key: str, value: str) -> None:
        self.attrs[key] = value

    def __getitem__(self, key: str) -> str:
        return self.attrs[key]  # KeyError parity with bs4 anchor['href']

    # -- traversal ----------------------------------------------------
    def append(self, node: Node) -> None:
        node.parent = self
        node._pidx = len(self.children)   # exact hint at parse time
        self.children.append(node)

    def descendants(self) -> Iterator[Node]:
        """All nodes below this one, document (pre-)order.  Explicit
        stack instead of recursive generators: this is the extraction
        hot path (millions of nodes per Arrow batch), and nested
        ``yield from`` frames cost ~3x a flat loop."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            yield node
            if isinstance(node, Element) and node.children:
                stack.extend(reversed(node.children))

    def iter_elements(self) -> Iterator["Element"]:
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, Element):
                yield node
                if node.children:
                    stack.extend(reversed(node.children))

    def find_parent(self, names) -> Optional["Element"]:
        if isinstance(names, str):
            names = (names,)
        cur = self.parent
        while cur is not None:
            if cur.name in names:
                return cur
            cur = cur.parent
        return None

    # -- search -------------------------------------------------------
    def find_all(self, name=None, class_token: Optional[str] = None) -> list:
        names = None
        if name is not None:
            names = {name} if isinstance(name, str) else set(name)
        out = []
        for el in self.iter_elements():
            if names is not None and el.name not in names:
                continue
            if class_token is not None and not el.has_class_token(class_token):
                continue
            out.append(el)
        return out

    def find(self, name=None, class_token: Optional[str] = None,
             id_value: Optional[str] = None) -> Optional["Element"]:
        """First matching element in document order.

        ``class_token`` is bs4 token-membership; ``id_value`` is the
        exact-match id scan (scraper.py:583-589 semantics).
        """
        names = None
        if name is not None:
            names = {name} if isinstance(name, str) else set(name)
        for el in self.iter_elements():
            if names is not None and el.name not in names:
                continue
            if class_token is not None and not el.has_class_token(class_token):
                continue
            if id_value is not None and el.attrs.get("id") != id_value:
                continue
            return el
        return None

    # -- text ---------------------------------------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        """Concatenated descendant text, EXCLUDING <script>/<style>
        bodies: bs4 >= 4.9 stores those as Script/Stylesheet strings
        that get_text() skips by default — and the reference's
        largest-div heuristic runs on get_text, so a boilerplate div
        stuffed with inline JS must not out-score the real content."""
        parts = []
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, TextNode):
                s = node.data.strip() if strip else node.data
                if strip and not s:
                    continue
                parts.append(s)
            elif isinstance(node, Element) and node.children \
                    and node.name not in ("script", "style"):
                stack.extend(reversed(node.children))
        return separator.join(parts)

    # -- CSS selection (subset) ----------------------------------------
    def select(self, selector: str) -> list:
        from .selectors import select as _select
        return _select(self, selector)

    # -- serialization --------------------------------------------------
    def to_html(self) -> str:
        parts: list[str] = []
        self._serialize(parts)
        return "".join(parts)

    def _serialize(self, parts: list) -> None:
        attr_str = "".join(
            f' {k}="{_escape_attr(v)}"' for k, v in self.attrs.items()
        )
        if self._name in VOID_ELEMENTS:
            parts.append(f"<{self._name}{attr_str}/>")
            return
        parts.append(f"<{self._name}{attr_str}>")
        for child in self.children:
            if isinstance(child, TextNode):
                parts.append(_escape_text(child.data))
            elif isinstance(child, Element):
                child._serialize(parts)
            elif isinstance(child, CommentNode):
                parts.append(f"<!--{child.data}-->")
        parts.append(f"</{self._name}>")

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Element {self._name} attrs={self.attrs}>"


class Document(Element):
    """Root node; behaves like an Element named ``[document]``."""

    def __init__(self) -> None:
        super().__init__("[document]")

    def to_html(self) -> str:
        parts: list[str] = []
        for child in self.children:
            if isinstance(child, TextNode):
                parts.append(_escape_text(child.data))
            elif isinstance(child, Element):
                child._serialize(parts)
            elif isinstance(child, DoctypeNode):
                parts.append(f"<!{child.data}>")
            elif isinstance(child, CommentNode):
                parts.append(f"<!--{child.data}-->")
        return "".join(parts)


class _TreeBuilder(HTMLParser):
    """Builds a Document; end tags pop to nearest matching open tag."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Document()
        self.stack: list[Element] = [self.root]

    # LAST occurrence of a duplicated attribute wins (bs4's
    # html.parser builder default, on_duplicate_attribute='replace');
    # valueless -> ""
    @staticmethod
    def _attr_dict(attrs) -> dict:
        d: dict = {}
        for k, v in attrs:
            d[k] = v if v is not None else ""
        return d

    def handle_starttag(self, tag: str, attrs) -> None:
        el = Element(tag, self._attr_dict(attrs))
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        el = Element(tag, self._attr_dict(attrs))
        self.stack[-1].append(el)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignored

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].append(TextNode(data))

    def handle_comment(self, data: str) -> None:
        self.stack[-1].append(CommentNode(data))

    def handle_decl(self, decl: str) -> None:
        self.stack[-1].append(DoctypeNode(decl))

    def unknown_decl(self, data: str) -> None:
        # bs4 html.parser parity (bs4 builder unknown_decl): a marked
        # section becomes a STRING node — CData with the 'CDATA['
        # prefix stripped (case-sensitive, like bs4), anything else
        # (downlevel-revealed conditionals '<![if !IE]>', lowercase
        # '<![cdata[') a Declaration keeping its full text.  The
        # reference's converter walks both as plain NavigableStrings
        # (only Comment/Doctype are skipped), so they surface as text
        # in the Markdown — dropping them here would diverge bytes on
        # real-web pages.  stdlib HTMLParser's default is a silent
        # no-op, hence this override.
        if data.startswith("CDATA["):
            data = data[len("CDATA["):]
        if data:
            self.stack[-1].append(TextNode(data))

    def handle_pi(self, data: str) -> None:
        # bs4 html.parser parity: a processing instruction becomes a
        # ProcessingInstruction STRING node holding exactly the
        # tokenizer's data (everything between '<?' and the FIRST '>',
        # so '<?php echo "<p>x" ?>' yields 'php echo "<p' and the
        # remainder re-parses as markup — empirically pinned in
        # tests/test_htmlcore.py).  The reference's converter walks all
        # NavigableStrings except Comment/Doctype, so PI content
        # surfaces as plain text in the Markdown; stdlib HTMLParser's
        # default silent drop would diverge bytes on PHP/ASP-littered
        # real-web pages.
        if data:
            self.stack[-1].append(TextNode(data))


def parse_html(html_text: str) -> Document:
    """Parse an HTML string into a Document tree."""
    builder = _TreeBuilder()
    builder.feed(html_text)
    builder.close()
    return builder.root
