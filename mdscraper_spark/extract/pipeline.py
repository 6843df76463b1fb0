"""Per-document extraction pipeline (pure Python, batch-UDF hosted).

Reproduces the reference's per-page dataflow — container detection ->
noise stripping -> title -> Markdown -> post-processing — over our own
DOM.  Stage order and every observable quirk follow
/root/reference/mdscraper/core/scraper.py (citations inline).  The
function :func:`extract_page` is the single entry point used by the
Arrow batch UDF, by the single-threaded oracle that freezes the golden
files, and by the unit tests.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass
from typing import List, Optional, Tuple
from urllib.parse import urlparse

from mdscraper_spark.config import ExtractConfig
from mdscraper_spark.extract.textfns import (
    clean_text,
    extract_md_title,
    get_last_url_part,
    get_relative_url_path,
    sanitize_filename,
)
from mdscraper_spark.htmlcore.dom import Document, Element, TextNode, parse_html
from mdscraper_spark.mdrender.render import render_markdown

# Detection-stage codes for lineage/metrics (SURVEY.md §2.C1).
STAGE_CUSTOM_ID = 1
STAGE_CUSTOM_CLASS = 2
STAGE_DEFAULT_ID = 3
STAGE_DEFAULT_CLASS = 4
STAGE_ARTICLE = 5
STAGE_LARGEST_DIV = 6
STAGE_NONE = 0


@dataclass
class ExtractResult:
    markdown: Optional[str]
    title: Optional[str]
    doc_slug: Optional[str]
    detect_stage: int
    detect_name: Optional[str]
    status: str          # ok | no_content | render_empty | error
    error: Optional[str]
    links: List[str]


# ---------------------------------------------------------------------------
# C2 — find div by attribute, list-priority before document order
# ---------------------------------------------------------------------------

def find_content_by_div_attr(root: Element, attr: str,
                             filter_list) -> Optional[Element]:
    """First ``<div>`` matching any name, names outranking document
    order (scraper.py:564-597).  ``class`` is bs4 token matching;
    ``id`` is the exact-match scan over all divs (scraper.py:583-589,
    authoritative because bs4's ``id_`` kwarg never matches)."""
    if attr not in ("class", "id"):
        raise NameError(f"unknown div attr {attr}")
    names = list(filter_list)
    if not names:
        return None
    # ONE walk instead of len(names) full scans: track the first
    # doc-order div per name, keep only the best (lowest) name index —
    # identical result to the per-name scans (the first div matching
    # name i is seen before any later div matching i), ~10x fewer
    # traversals for the default 10-name list.
    best_idx: Optional[int] = None
    best_el: Optional[Element] = None
    for el in root.iter_elements():
        if el.name != "div":
            continue
        if attr == "class":
            tokens = el.attrs.get("class", "").split()
            keys = set(tokens)
        else:
            keys = {el.attrs.get("id")}
        limit = len(names) if best_idx is None else best_idx
        for i in range(limit):
            if names[i] in keys:
                best_idx, best_el = i, el
                break
        if best_idx == 0:
            break
    return best_el


# ---------------------------------------------------------------------------
# C1 — content-container cascade
# ---------------------------------------------------------------------------

def find_content_container(root: Optional[Element],
                           config: ExtractConfig) -> Tuple[Optional[Element], int, Optional[str]]:
    """Priority cascade over six strategies (scraper.py:599-664).

    Returns (container, detect_stage, detect_name).  Stage 6 is the
    largest ``<div>`` by ``len(get_text())`` with ties broken to the
    earliest in document order (stable argmax, scraper.py:655-656).
    """
    if root is None:
        return None, STAGE_NONE, None

    if config.content:
        found = find_content_by_div_attr(root, "id", config.content)
        if found is not None:
            return found, STAGE_CUSTOM_ID, found.attrs.get("id")
        found = find_content_by_div_attr(root, "class", config.content)
        if found is not None:
            return found, STAGE_CUSTOM_CLASS, _matched_class(found, config.content)

    found = find_content_by_div_attr(root, "id", config.default_content_names)
    if found is not None:
        return found, STAGE_DEFAULT_ID, found.attrs.get("id")

    found = find_content_by_div_attr(root, "class", config.default_content_names)
    if found is not None:
        return found, STAGE_DEFAULT_CLASS, _matched_class(found, config.default_content_names)

    found = root.find("article")
    if found is not None:
        return found, STAGE_ARTICLE, "article"

    divs = root.find_all("div")
    if divs:
        best = max(divs, key=lambda d: len(d.get_text()))  # first max wins
        return best, STAGE_LARGEST_DIV, "largest-div"

    return None, STAGE_NONE, None


def _matched_class(el: Element, names) -> Optional[str]:
    tokens = set(el.attrs.get("class", "").split())
    for name in names:
        if name in tokens:
            return name
    return None


# ---------------------------------------------------------------------------
# D — noise-stripping passes (in fixed order, scraper.py:435-462)
# ---------------------------------------------------------------------------

def process_exclude_selectors(content: Element, selectors) -> None:
    """Decompose every match of each CSS selector (scraper.py:529-545)."""
    for selector in selectors:
        for el in content.select(selector):
            el.decompose()


def remove_images(content: Element) -> None:
    """Drop all ``<img>``, then drop every ``<p>`` whose stripped text
    is empty — including paragraphs that were already empty
    (scraper.py:478-505; regression contract in
    /root/reference/tests/test_empty_lines_fix.py)."""
    for img in content.find_all("img"):
        img.decompose()
    for p in content.find_all("p"):
        if not p.get_text(strip=True):
            p.decompose()


def remove_links(content: Element) -> None:
    """Replace each anchor with a bare text node of its text
    (scraper.py:507-527)."""
    for anchor in content.find_all("a"):
        anchor.replace_with(TextNode(anchor.get_text()))


def make_urls_relative(content: Element, root_url: str) -> None:
    """Rewrite every anchor href relative to the root (scraper.py:547-562).
    An href-less anchor raises ``KeyError`` exactly like ``anchor['href']``
    at scraper.py:561; the caller maps it to a per-row error status."""
    if not root_url:
        return
    for anchor in content.find_all("a"):
        url = anchor["href"]
        anchor["href"] = get_relative_url_path(url, root_url)


# ---------------------------------------------------------------------------
# C3 — page title (whole document, post-strip)
# ---------------------------------------------------------------------------

def extract_page_title(root: Element) -> str:
    """First ``<h1>`` anywhere, else ``<title>``, else ``"Webpage"``;
    text piped through clean_text (scraper.py:363-387)."""
    el = root.find("h1") or root.find("title")
    return clean_text(el.get_text()) if el is not None else "Webpage"


# ---------------------------------------------------------------------------
# E3 — heading-space insertion
# ---------------------------------------------------------------------------

def parse_heading_levels(spec: Optional[str]) -> List[int]:
    """``'all'`` -> 1..6; ``'2,3'`` -> clamped list; any ValueError ->
    all levels (scraper.py:283-289, verified quirk)."""
    if spec == "all":
        return list(range(1, 7))
    try:
        levels = [int(part.strip()) for part in (spec or "").split(",") if part.strip()]
        return [lv for lv in levels if 1 <= lv <= 6]
    except ValueError:
        return list(range(1, 7))


def add_newlines_before_headings(markdown: str, spec: Optional[str]) -> str:
    """Insert three empty lines before selected heading levels, except
    on the first line (scraper.py:270-315).  ``startswith('#'*n + ' ')``
    means a level-2 pass does not fire inside ``### `` lines."""
    levels = parse_heading_levels(spec)
    if not levels:
        return markdown
    out: List[str] = []
    for i, line in enumerate(markdown.split("\n")):
        if i > 0 and any(line.startswith("#" * lv + " ") for lv in levels):
            out.extend(["", "", ""])
        out.append(line)
    return "\n".join(out)


# ---------------------------------------------------------------------------
# E2 — Markdown post-pipeline
# ---------------------------------------------------------------------------

_NL3_RE = re.compile(r"\n{3,}")
_NL_WS_NL_RE = re.compile(r"\n\s*\n\s*\n")


def finish_markdown(markdown: str, title: Optional[str], source_url: Optional[str],
                    extra_heading_space: Optional[str]) -> Optional[str]:
    """Exact post-render order (scraper.py:329-361): falsy -> None;
    title prepend unless already the exact prefix; collapse ``\\n{3,}``;
    collapse whitespace-interleaved newline runs; heading-space pass OR
    re-collapse (inserted blank lines must survive, scraper.py:352-356);
    source prepend."""
    if not markdown:
        return None
    if title:
        title_str = f"# {title}\n\n"
        if not markdown.startswith(title_str):
            markdown = title_str + markdown
    markdown = _NL3_RE.sub("\n\n", markdown)
    markdown = _NL_WS_NL_RE.sub("\n\n", markdown)
    if extra_heading_space:
        markdown = add_newlines_before_headings(markdown, extra_heading_space)
    else:
        markdown = _NL3_RE.sub("\n\n", markdown)
    if source_url:
        markdown = f"Source: <{source_url}>\n\n{markdown}"
    return markdown


# ---------------------------------------------------------------------------
# A4 — link harvest + page-exclusion filter
# ---------------------------------------------------------------------------

def content_to_url_list(content: Element, site_root: str,
                        exclude_pages=()) -> List[str]:
    """Harvest anchors into a URL work-list (scraper.py:666-709).
    Semantics preserved: query/fragment dropped; foreign-host absolute
    URLs rewritten onto ``site_root`` (path only); duplicates and
    document order retained; anchor without href raises ``KeyError``."""
    urls: List[str] = []
    patterns = tuple(exclude_pages or ())
    for anchor in content.find_all("a"):
        url_path = urlparse(anchor["href"]).path
        page_name = url_path.split("/")[-1]
        if any(fnmatch.fnmatch(page_name, pat) for pat in patterns):
            continue
        urls.append(site_root + url_path)
    return urls


def harvest_links(content: Element) -> List[str]:
    """Raw hrefs in document order (missing href -> empty string),
    for the relational A4 analog done with Spark built-ins."""
    return [a.attrs.get("href", "") for a in content.find_all("a")]


# ---------------------------------------------------------------------------
# G1 — the per-document pipeline
# ---------------------------------------------------------------------------

def derive_output_name(url: str, markdown: str, output: str) -> str:
    """B2 output naming (scraper.py:800-837): '%TITLE' names by the
    markdown's first '# ' line, falling back to '%URL' when no title;
    '%URL' names by the last URL path segment; anything else is a fixed
    filename used VERBATIM (no sanitizing, no '.md' suffixing — the
    reference os.path.joins the literal value)."""
    if output == "%TITLE":
        md_title = extract_md_title(markdown)
        return sanitize_filename(md_title if md_title
                                 else get_last_url_part(url))
    if output == "%URL":
        return sanitize_filename(get_last_url_part(url))
    return output


def output_path(slug: str, output: str, outdir: str) -> str:
    """Full output path: %-modes get '.md' appended; a fixed --output
    name is joined verbatim (scraper.py:826-831).  os.path.join
    semantics, matching the Spark column twin with_doc_path
    (extract_udfs.py): no doubled slash after a trailing-slash outdir,
    and an ABSOLUTE fixed name discards outdir."""
    import os.path

    name = f"{slug}.md" if output in ("%TITLE", "%URL") else slug
    return os.path.join(outdir, name) if outdir else name


def extract_page(url: str, html_text: str, config: ExtractConfig) -> ExtractResult:
    """fetch -> detect -> strip -> title -> markdown -> slug, one page.

    Never raises: every failure becomes a status/error pair
    (scraper.py:743-746 counts failures and keeps going; the north rule
    requires per-row error isolation at 10^12-document scale).
    """
    try:
        root = parse_html(html_text)
        content, stage, name = find_content_container(root, config)
        if content is None:
            return ExtractResult(None, None, None, STAGE_NONE, None,
                                 "no_content", None, [])

        # harvest from the RAW detected container, BEFORE any strip
        # pass: the reference's site mode reads extract_page_content
        # output directly (scraper.py:779-784) — exclude_selectors /
        # no_links / make_urls_relative never touch its work-list, so
        # anchors inside excluded regions still harvest and --no-links
        # does not silently empty a --site run
        links = harvest_links(content)

        process_exclude_selectors(content, config.exclude_selectors)
        if config.no_images:
            remove_images(content)
        if config.no_links:
            remove_links(content)
        else:
            make_urls_relative(content, config.root_url)

        title = extract_page_title(root)

        rendered = render_markdown(content)
        markdown = finish_markdown(
            rendered,
            title,
            url if config.prepend_source_link else None,
            config.extra_heading_space,
        )
        if markdown is None:
            return ExtractResult(None, title, None, stage, name,
                                 "render_empty", None, links)

        slug = derive_output_name(url, markdown, config.output)
        return ExtractResult(markdown, title, slug, stage, name, "ok", None, links)
    except Exception as exc:  # per-row isolation, never fail the batch
        return ExtractResult(None, None, None, STAGE_NONE, None,
                             "error", f"{type(exc).__name__}: {exc}", [])
