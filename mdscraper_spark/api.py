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
        from mdscraper_spark.config import resolve_config

        unknown = set(options) - _CONFIG_FIELDS - _INERT_OPTIONS
        if unknown:
            raise TypeError(f"unknown options: {sorted(unknown)}")
        cfg_kwargs = {k: v for k, v in options.items()
                      if k in _CONFIG_FIELDS}
        # resolve_config is the ONE home of option layering: the G4
        # debug->verbose-9 quirk and the sequence->tuple coercion that
        # keeps the frozen dataclass hashable / equal to CLI-built ones
        self.config = resolve_config(cli_options=cfg_kwargs)

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
        (status / markdown / title / links / error).  With no ``html``,
        ``url`` must be a local path or file:// URL — an http(s) URL
        raises a clear error (this engine has no network; the crawl
        arrives as a pages table)."""
        from mdscraper_spark.extract.pipeline import extract_page

        if html is None:
            if url.startswith(("http://", "https://")):
                raise ValueError(
                    f"no network in this engine: pass the page HTML via "
                    f"html=... (or a local path / file:// URL) for {url}")
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
