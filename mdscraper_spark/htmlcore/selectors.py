"""CSS selector subset for the exclude-selector pass.

The reference exposes CSS exclusion through ``Tag.select``
(/root/reference/mdscraper/core/scraper.py:529-545, soupsieve-backed).
The engine's fixture corpus (FIXTURES.md §1.2) only exercises the
subset implemented here:

* type selectors (``nav``), universal (``*``)
* ``.class`` (token match), ``#id`` (exact match)
* attribute presence ``[attr]`` and equality ``[attr=value]``
* compound simple selectors (``div.ads#top``)
* descendant combinator (whitespace) and child combinator (``>``)
* selector groups separated by commas

Unsupported syntax raises ``ValueError`` so a bad selector surfaces as
a per-row error status instead of silently matching nothing.
"""

from __future__ import annotations

import re
from typing import Optional

_SIMPLE_RE = re.compile(
    r"""
    (?P<tag>\*|[a-zA-Z][\w-]*)?
    (?P<rest>(?:[.#][\w-]+|\[[\w-]+(?:=(?:"[^"]*"|'[^']*'|[\w-]+))?\])*)
    """,
    re.VERBOSE,
)
_PART_RE = re.compile(
    r"""[.#][\w-]+|\[[\w-]+(?:=(?:"[^"]*"|'[^']*'|[\w-]+))?\]""",
    re.VERBOSE,
)


class _Simple:
    __slots__ = ("tag", "classes", "ids", "attrs")

    def __init__(self, tag: Optional[str], classes: list, ids: list, attrs: list) -> None:
        self.tag = tag
        self.classes = classes
        self.ids = ids
        self.attrs = attrs  # list of (name, value-or-None)

    def matches(self, el) -> bool:
        if self.tag is not None and self.tag != "*" and el.name != self.tag:
            return False
        for cls in self.classes:
            if not el.has_class_token(cls):
                return False
        for id_val in self.ids:
            if el.attrs.get("id") != id_val:
                return False
        for name, value in self.attrs:
            if name not in el.attrs:
                return False
            if value is not None and el.attrs[name] != value:
                return False
        return True


def _parse_simple(token: str) -> _Simple:
    m = _SIMPLE_RE.fullmatch(token)
    if not m or (m.group("tag") is None and not m.group("rest")):
        raise ValueError(f"unsupported CSS selector component: {token!r}")
    classes, ids, attrs = [], [], []
    for part in _PART_RE.findall(m.group("rest") or ""):
        if part.startswith("."):
            classes.append(part[1:])
        elif part.startswith("#"):
            ids.append(part[1:])
        else:  # [attr] or [attr=value]
            inner = part[1:-1]
            if "=" in inner:
                name, value = inner.split("=", 1)
                value = value.strip("\"'")
                attrs.append((name, value))
            else:
                attrs.append((inner, None))
    return _Simple(m.group("tag"), classes, ids, attrs)


def _parse_sequence(selector: str) -> list:
    """Parse one comma-free selector into [(combinator, _Simple), ...].

    combinator is ' ' (descendant) or '>' (child); the first entry's
    combinator is ' '.
    """
    tokens = re.split(r"\s*(>)\s*|\s+", selector.strip())
    seq: list = []
    combinator = " "
    for tok in tokens:
        if tok is None or tok == "":
            continue
        if tok == ">":
            combinator = ">"
            continue
        seq.append((combinator, _parse_simple(tok)))
        combinator = " "
    if not seq:
        raise ValueError(f"empty CSS selector: {selector!r}")
    return seq


def _is_element(node) -> bool:
    """True for real elements only: the Document root's name is
    '[document]' (never None), so a name-is-not-None guard would let
    the document node participate in combinator matching — soupsieve
    (the reference's selector engine) never treats the root as an
    element, so '* > nav' must not match a top-level nav via the
    document satisfying '*'."""
    return node is not None and node.name is not None \
        and not node.name.startswith("[")


def _ancestors_match(el, seq: list, idx: int) -> bool:
    """Check seq[:idx+1] matches ending at el (el already matched seq[idx])."""
    if idx == 0:
        return True
    combinator, _ = seq[idx]
    prev_simple = seq[idx - 1][1]
    if combinator == ">":
        parent = el.parent
        return (
            _is_element(parent)
            and prev_simple.matches(parent)
            and _ancestors_match(parent, seq, idx - 1)
        )
    cur = el.parent
    while _is_element(cur):
        if prev_simple.matches(cur) and _ancestors_match(cur, seq, idx - 1):
            return True
        cur = cur.parent
    return False


def select(root, selector: str) -> list:
    """All elements under ``root`` matching the selector group, document order."""
    sequences = [_parse_sequence(s) for s in selector.split(",") if s.strip()]
    if not sequences:
        raise ValueError(f"empty CSS selector: {selector!r}")
    out = []
    for el in root.iter_elements():
        for seq in sequences:
            last = seq[-1][1]
            if last.matches(el) and _ancestors_match(el, seq, len(seq) - 1):
                out.append(el)
                break
    return out
