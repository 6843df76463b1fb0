"""Deterministic KG-extraction rules (pure, shared).

The reference stops at Markdown, so the KG stages are specified by
BASELINE.json:6/14 rather than reference code: batched mention
detection, pattern-based (subj, pred, obj) triple extraction, alias
scoring, canonicalization.  These rules are THE spec: the
single-threaded oracle (kg/oracle.py) runs them sequentially to produce
ground truth, and the distributed operators (operators/kg.py) must
reproduce that truth at P/R >= 0.95 (target 1.0 — same rules, with
total-order tie-breaks so partitioning cannot change results).

Everything here is pure Python executed inside Arrow batch UDFs.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Tuple

# ---------------------------------------------------------------------------
# I1 — sentence split
# ---------------------------------------------------------------------------

_MD_IMAGE_RE = re.compile(r"!\[[^\]]*\]\([^)]*\)")
_MD_LINK_RE = re.compile(r"\[([^\]]*)\]\([^)]*\)")
_MD_AUTOLINK_RE = re.compile(r"<https?://[^>]*>")
_MD_HEADING_RE = re.compile(r"^#{1,6} ", re.MULTILINE)
_MD_EMPH_RE = re.compile(r"[*_`]+")
_SENT_BOUNDARY_RE = re.compile(r"(?<=[.!?])\s+")


def markdown_to_plain(markdown: str) -> str:
    """Strip Markdown syntax to plain text (deterministic, lossy)."""
    text = markdown
    text = re.sub(r"^Source: <[^>]*>\n\n", "", text)
    text = _MD_IMAGE_RE.sub("", text)
    text = _MD_LINK_RE.sub(r"\1", text)
    text = _MD_AUTOLINK_RE.sub("", text)
    text = _MD_HEADING_RE.sub("", text)
    text = text.replace("\\*", "*").replace("\\_", "_")
    text = _MD_EMPH_RE.sub("", text)
    return text


def split_sentences(markdown: str) -> List[str]:
    """Markdown -> ordered sentence list.  Blocks (\\n\\n) are hard
    boundaries; within a block, split after [.!?] + whitespace."""
    plain = markdown_to_plain(markdown)
    sentences: List[str] = []
    for block in plain.split("\n\n"):
        block = " ".join(block.split())
        if not block:
            continue
        for sent in _SENT_BOUNDARY_RE.split(block):
            sent = sent.strip()
            if sent:
                sentences.append(sent)
    return sentences


# ---------------------------------------------------------------------------
# I2 — gazetteer mention detection
# ---------------------------------------------------------------------------

class Gazetteer:
    """Leftmost-longest, word-bounded surface matching over an alias
    dictionary.  Compiled once per executor process and reused across
    Arrow batches (module-level cache below)."""

    def __init__(self, entries: Iterable[Tuple[str, str]]):
        """entries: (alias_surface, mtype)."""
        self.types: Dict[str, str] = {}
        surfaces = []
        for surface, mtype in entries:
            if surface not in self.types:
                self.types[surface] = mtype
                surfaces.append(surface)
        # longest-first alternation => leftmost-longest match.  A \b is
        # attached only where the alias EDGE is a word character: \b
        # needs a word char on its inside, so wrapping 'C++'/'.NET' in
        # \b...\b could never match anywhere — a silent recall hole.
        # Non-word edges need no boundary (the edge char itself breaks
        # any word).
        def bounded(s: str) -> str:
            left = r"\b" if re.match(r"\w", s[0]) else ""
            right = r"\b" if re.match(r"\w", s[-1]) else ""
            return f"{left}{re.escape(s)}{right}"

        # drop empty surfaces: a caller-supplied alias dictionary (now
        # reachable via KgBuildJob custom aliases) with a blank alias
        # would IndexError in bounded() and can never match anything
        surfaces = [s for s in surfaces if s]
        pattern = "|".join(
            bounded(s)
            for s in sorted(surfaces, key=lambda s: (-len(s), s)))
        self._re = re.compile(f"(?:{pattern})") if surfaces else None

    def find(self, sentence: str) -> List[Tuple[int, int, str, str]]:
        """Non-overlapping mentions: (start, end, surface, mtype)."""
        if self._re is None:
            return []
        out = []
        for m in self._re.finditer(sentence):
            surface = m.group(0)
            out.append((m.start(), m.end(), surface, self.types[surface]))
        return out


_GAZETTEER_CACHE: Dict[tuple, Gazetteer] = {}


def cached_gazetteer(entries_key: tuple) -> Gazetteer:
    """Per-process gazetteer cache; keyed by the entry tuple ITSELF
    (not its hash — dict lookup gets equality checking for free, where
    a raw-hash key would silently hand a colliding caller the wrong
    compiled gazetteer)."""
    gaz = _GAZETTEER_CACHE.get(entries_key)
    if gaz is None:
        gaz = Gazetteer(entries_key)
        _GAZETTEER_CACHE[entries_key] = gaz
    return gaz


def detect_mentions(sentences: List[str],
                    gaz: Gazetteer) -> List[Tuple[int, int, int, str, str]]:
    """[(sent_id, span_start, span_end, surface, mtype)] per document."""
    out = []
    for sid, sent in enumerate(sentences):
        for start, end, surface, mtype in gaz.find(sent):
            out.append((sid, start, end, surface, mtype))
    return out


# ---------------------------------------------------------------------------
# I3 — pattern-based triple extraction
# ---------------------------------------------------------------------------

# (pattern, predicate); subject/object are the capture groups.
# Anchored to full sentences so rule firing is unambiguous.
_NAME = r"([A-Z][\w-]*(?:[ ][\w-]+)*?)"
TRIPLE_PATTERNS: Tuple[Tuple[re.Pattern, str], ...] = tuple(
    (re.compile(p), pred) for p, pred in (
        (rf"^{_NAME} works for {_NAME}\.$", "works_for"),
        (rf"^{_NAME} founded {_NAME}\.$", "founded"),
        (rf"^{_NAME} is the CEO of {_NAME}\.$", "ceo_of"),
        (rf"^{_NAME} acquired {_NAME}\.$", "acquired"),
        (rf"^{_NAME} is based in {_NAME}\.$", "based_in"),
        (rf"^{_NAME} was founded by {_NAME}\.$", "founded_by"),
        (rf"^{_NAME} is a subsidiary of {_NAME}\.$", "subsidiary_of"),
    )
)


def extract_triples(sentences: List[str]) -> List[Tuple[int, str, str, str, float]]:
    """[(sent_id, subj, pred, obj, conf)]; first matching pattern wins."""
    out = []
    for sid, sent in enumerate(sentences):
        for pattern, pred in TRIPLE_PATTERNS:
            m = pattern.match(sent)
            if m:
                out.append((sid, m.group(1), pred, m.group(2), 1.0))
                break
    return out


# ---------------------------------------------------------------------------
# I4 — entity-link scoring (rule shared with the Spark join expression)
# ---------------------------------------------------------------------------

def norm_surface(surface: str) -> str:
    """Join key normalization: casefold + whitespace collapse."""
    return " ".join(surface.casefold().split())


def link_score(surface: str, alias: str, prior: float) -> float:
    """Exact surface match scores the full prior; casefolded-only match
    is discounted.  Mirrored exactly by the Spark column expression in
    operators/kg.py (and the DuckDB oracle SQL)."""
    return prior if surface == alias else 0.7 * prior


# ---------------------------------------------------------------------------
# I5 — canonicalization domain
# ---------------------------------------------------------------------------

def surface_node(surface: str) -> str:
    return "s:" + norm_surface(surface)


def entity_node(entity_id: int) -> str:
    return f"e:{entity_id}"
