"""Single-call convenience facade (reference library-API parity).

The reference is usable as a library in one line —
``MdScraper(no_images=True).fetch_content(url)``
(``/root/reference/mdscraper/core/scraper.py:79-82,416-434``) — while
this engine's smallest unit was a job or a bare ``extract_page`` call.
``MdScraperSpark`` closes that gap: same keyword options as the
reference's ``DefaultOptions`` (``scraper.py:84-118``), same
``fetch_content`` / ``extract_md_title`` verbs, plus a distributed twin
(``fetch_content_df``) that runs the identical pipeline as an Arrow
batch UDF over a pages DataFrame.

No network in this engine (sandbox + BASELINE.json input contract: the
crawl arrives as a pages table): ``fetch_content`` takes the HTML
directly, or a local file path / ``file://`` URL to read it from.
Network-only reference options (``requests_timeout``, ``user_agent``)
are accepted for signature parity and ignored, as is the reference's
dead ``custom_content_names`` attribute (the code reads the
``content`` key instead — quirk pinned in SURVEY §2.C1,
``scraper.py:106,628``).
"""

from __future__ import annotations

import pathlib
from typing import Optional

from mdscraper_spark.config import ExtractConfig

# reference option names accepted but inert in this engine
_INERT_OPTIONS = {"requests_timeout", "user_agent", "custom_content_names"}

_CONFIG_FIELDS = {f for f in ExtractConfig.__dataclass_fields__}


class MdScraperSpark:
    """Reference-shaped library facade over the extraction pipeline."""

    def __init__(self, **options):
        unknown = set(options) - _CONFIG_FIELDS - _INERT_OPTIONS
        if unknown:
            raise TypeError(f"unknown options: {sorted(unknown)}")
        cfg_kwargs = {k: v for k, v in options.items()
                      if k in _CONFIG_FIELDS}
        # reference CLI quirk G4: debug promotes silent verbose to 9
        if cfg_kwargs.get("debug") and not cfg_kwargs.get("verbose"):
            cfg_kwargs["verbose"] = 9
        self.config = ExtractConfig(**cfg_kwargs)

    # -- single-call surface (driver-side, no Spark needed) --------------

    def fetch_content(self, url: str,
                      html: Optional[str | bytes] = None) -> Optional[str]:
        """Extract one page to Markdown, or None on failure — the
        ``MdScraper.fetch_content`` verb with HTML supplied inline or
        read from a local path / file:// URL instead of the network."""
        res = self.fetch_result(url, html)
        return res.markdown

    def fetch_result(self, url: str, html: Optional[str | bytes] = None):
        """Like fetch_content but returns the full typed ExtractResult
        (status / markdown / title / links / error)."""
        from mdscraper_spark.extract.pipeline import extract_page

        if html is None:
            path = url[7:] if url.startswith("file://") else url
            html = pathlib.Path(path).read_bytes()
        if isinstance(html, bytes):
            html = html.decode("utf-8", errors="replace")
        return extract_page(url, html, self.config)

    @staticmethod
    def extract_md_title(markdown: Optional[str]) -> Optional[str]:
        """First ``# `` line with the reference's strip-ALL quirk
        (every ``'# '`` occurrence removed, B3).  None-safe so it
        composes with fetch_content's None-on-failure contract."""
        from mdscraper_spark.extract.textfns import extract_md_title

        if markdown is None:
            return None
        return extract_md_title(markdown)

    # -- distributed twin -------------------------------------------------

    def fetch_content_df(self, pages_df):
        """The same pipeline over a pages DataFrame (url, warc_ts,
        html, text, lang) — returns the markdown_docs frame the KG and
        warehouse jobs consume.  Identical bytes per url to
        fetch_content (pinned by tests)."""
        from mdscraper_spark.operators.extract_udfs import extract_markdown

        return extract_markdown(pages_df, self.config)
