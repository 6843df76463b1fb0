"""Job configuration.

Mirrors the reference option surface (DefaultOptions at
/root/reference/mdscraper/core/scraper.py:84-118 and the CLI flags at
/root/reference/mdscraper/cli.py:12-52) as a frozen dataclass that is
resolved once on the driver and broadcast to executors.  Precedence
matches the reference (scraper.py:184-191): defaults < config file
(only where the option is still default) < explicit kwargs/CLI.
Unknown config-file keys raise ``KeyError`` just like the reference's
dict access at scraper.py:189.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple

DEFAULT_CONTENT_NAMES: Tuple[str, ...] = (
    "article_content",
    "content",
    "article-content",
    "article",
    "main-content",
    "main",
    "post-content",
    "entry-content",
    "blog-content",
    "body-content",
)


@dataclass(frozen=True)
class ExtractConfig:
    """Per-run extraction options (reference CLI parity)."""

    no_images: bool = False
    no_links: bool = False
    extra_heading_space: Optional[str] = None
    prepend_source_link: bool = False
    root_url: str = ""
    content: Tuple[str, ...] = ()          # custom container names (--content)
    exclude_pages: Tuple[str, ...] = ()    # fnmatch globs (--exclude-pages)
    exclude_selectors: Tuple[str, ...] = ()  # CSS selectors (--exclude-selectors)
    output: str = "%TITLE"
    outdir: str = ""
    debug: bool = False
    verbose: int = 0
    default_content_names: Tuple[str, ...] = DEFAULT_CONTENT_NAMES

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), default=list, sort_keys=True)

    @classmethod
    def from_json(cls, payload: str) -> "ExtractConfig":
        raw = json.loads(payload)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "ExtractConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - known
        if unknown:
            raise KeyError(f"unknown config keys: {sorted(unknown)}")
        kwargs = dict(raw)
        for key in ("content", "exclude_pages", "exclude_selectors",
                    "default_content_names"):
            if key in kwargs and kwargs[key] is not None:
                kwargs[key] = tuple(kwargs[key])
            elif key in kwargs:
                kwargs[key] = ()
        return cls(**kwargs)


def resolve_config(cli_options: Optional[dict] = None,
                   config_file_options: Optional[dict] = None) -> ExtractConfig:
    """Reference option layering: file values apply only where the CLI
    left the option at its default (scraper.py:184-191)."""
    defaults = ExtractConfig()
    merged = dataclasses.asdict(defaults)
    cli_options = dict(cli_options or {})
    known = set(merged)
    bad = set(cli_options) - known
    if bad:
        raise KeyError(f"unknown options: {sorted(bad)}")
    merged.update(cli_options)
    if config_file_options:
        default_map = dataclasses.asdict(defaults)
        for key, value in config_file_options.items():
            if key not in known:
                raise KeyError(key)
            if merged[key] == default_map[key]:
                merged[key] = value
    # reference quirk (scraper.py:161-164): enabling debug promotes a
    # still-silent verbose to 9 — but an explicit verbose level wins
    if merged.get("debug") and merged.get("verbose", 0) == 0:
        merged["verbose"] = 9
    return ExtractConfig.from_dict(merged)
