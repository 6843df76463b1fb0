"""Scalar text functions with reference-quirk parity.

Each function reproduces an observable behavior of the reference,
including its quirks (SURVEY.md §7.6-2); citations point into
/root/reference/.  All are pure and are used both inside Arrow batch
UDFs and by the single-threaded oracle.
"""

from __future__ import annotations

import html as _html
import re
from typing import Optional
from urllib.parse import urlparse

_WS_RUN_RE = re.compile(r"\s+")
_FILENAME_BAD_RE = re.compile(r'[\\/*?:"<>|]')


def clean_text(text: Optional[str]) -> str:
    """Whitespace-collapse, THEN entity-unescape, then strip.

    Order matters (mdscraper/core/utils.py:68-85): because unescape runs
    after the collapse, entities that decode to whitespace (``&nbsp;``,
    ``&#10;``) survive into the "clean" text.
    """
    if not text:
        return ""
    text = _WS_RUN_RE.sub(" ", text)
    text = _html.unescape(text)
    return text.strip()


def get_last_url_part(url: str) -> str:
    """Last path segment; empty for a trailing slash (utils.py:22-41)."""
    return urlparse(url).path.split("/")[-1]


def sanitize_filename(filename: str) -> str:
    """Replace filesystem-hostile characters with ``_`` (utils.py:87-98)."""
    return _FILENAME_BAD_RE.sub("_", filename)


def extract_md_title(markdown: str) -> Optional[str]:
    """First ``# ``-prefixed line, with the reference's replace-all
    quirk: every occurrence of ``'# '`` in that line is stripped, not
    just the prefix (scraper.py:860-882)."""
    for line in markdown.split("\n"):
        if line.startswith("# "):
            return line.replace("# ", "")
    return None


def get_relative_url_path(url: str, root_url: str) -> str:
    """Strip the root path from a URL's path — replace-all semantics
    (scraper.py:217-245): ``/docs/a/docs/b`` with root ``/docs`` becomes
    ``/a/b``.  Returns the original URL unchanged when nothing matched
    or when no root is configured."""
    if not root_url:
        return url
    root_path = urlparse(root_url).path
    url_path = urlparse(url).path
    new_url = url_path.replace(root_path, "")
    return new_url if new_url != url_path else url
