"""WARC source/sink (round 4): round-trip byte identity, gzip shards,
malformed-record semantics, and the pages-schema contract.

The reference consumes live HTTP (core/scraper.py fetch path); the
engine's batch equivalent is a Common-Crawl-style WARC shard corpus.
These tests pin: writer emits valid WARC/1.0 response records the
reader walks by Content-Length (not regex), html bytes survive the
round trip exactly (including bodies containing 'WARC/1.0' and CRLF
runs), gzip member-per-record shards parse transparently, and torn
files fail loudly unless lenient.
"""

import glob
import gzip
import os

import pandas as pd
import pytest

from mdscraper_spark.sources import warc
from mdscraper_spark.sources.pages import PAGES_SCHEMA, fixture_pages_df


def _collect_pages(df):
    return sorted(
        ((r["url"], r["warc_ts"], bytes(r["html"]) if r["html"] is not None else None)
         for r in df.collect()),
        key=lambda t: t[0],
    )


def test_roundtrip_byte_identity(spark, tmp_path):
    src = fixture_pages_df(spark).repartition(3)
    out = str(tmp_path / "shards")
    manifest = warc.write_warc_shards(src, out).collect()
    assert sum(m["n_records"] for m in manifest) == src.count()
    assert all(os.path.exists(m["path"]) for m in manifest)

    back = warc.read_warc(spark, out)
    assert back.schema == warc.WARC_PAGES_SCHEMA
    orig = _collect_pages(src.select("url", "warc_ts", "html"))
    got = _collect_pages(back.select("url", "warc_ts", "html"))
    assert [u for u, _, _ in got] == [u for u, _, _ in orig]
    for (u0, t0, h0), (u1, t1, h1) in zip(orig, got):
        assert h1 == h0, u0          # byte identity through the shard
        assert t1 == t0, u0          # WARC-Date replays warc_ts


def test_adversarial_body_bytes(spark, tmp_path):
    """Bodies containing record markers / CRLF runs must not desync
    the Content-Length walk."""
    evil = b"WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n<p>fake</p>\r\n\r\n"
    rows = [("https://evil.test/a", None, evil, None, None),
            ("https://evil.test/b", None, b"\r\n\r\n" * 5, None, None),
            ("https://evil.test/c", None, b"", None, None)]
    src = spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1)
    out = str(tmp_path / "evil")
    warc.write_warc_shards(src, out).collect()
    got = {u: h for u, _, h in _collect_pages(warc.read_warc(spark, out))}
    assert got["https://evil.test/a"] == evil
    assert got["https://evil.test/b"] == b"\r\n\r\n" * 5
    assert got["https://evil.test/c"] == b""


def test_gzip_member_per_record(spark, tmp_path):
    src = fixture_pages_df(spark).coalesce(1)
    out = str(tmp_path / "gz")
    warc.write_warc_shards(src, out, compress=True).collect()
    paths = glob.glob(os.path.join(out, "*.warc.gz"))
    assert len(paths) == 1
    raw = open(paths[0], "rb").read()
    # member-per-record: more than one gzip magic in the shard
    assert raw.count(b"\x1f\x8b\x08") == src.count()
    got = _collect_pages(warc.read_warc(spark, out))
    assert len(got) == src.count()
    orig = _collect_pages(src.select("url", "warc_ts", "html"))
    assert [h for _, _, h in got] == [h for _, _, h in orig]


def test_non_response_records_skipped(tmp_path):
    rec = warc.format_record("https://x.test/", "2025-06-14T00:00:00Z", b"<p>x</p>")
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
            b"\r\nabcd\r\n\r\n")
    parsed = warc.parse_warc(info + rec)
    assert [u for u, _, _ in parsed] == ["https://x.test/"]
    assert parsed[0][2] == b"<p>x</p>"


def test_truncated_record_fails_loud_unless_lenient():
    rec = warc.format_record("https://x.test/", "2025-06-14T00:00:00Z",
                             b"<p>full record</p>")
    torn = rec + rec[: len(rec) // 2]
    with pytest.raises(ValueError, match="truncated|malformed"):
        warc.parse_warc(torn, "shard-x")
    ok = warc.parse_warc(torn, "shard-x", lenient=True)
    assert len(ok) == 1  # the intact record survives, the tear is dropped


def test_garbage_prefix_fails_loud():
    with pytest.raises(ValueError, match="malformed"):
        warc.parse_warc(b"HTTP/1.1 200 OK\r\n\r\nnope")


def test_deterministic_record_bytes():
    a = warc.format_record("https://x.test/p", "2025-06-14T00:00:00Z", b"<p>hi</p>")
    b = warc.format_record("https://x.test/p", "2025-06-14T00:00:00Z", b"<p>hi</p>")
    assert a == b
    # record id is uuid5(url): stable across processes, distinct per url
    c = warc.format_record("https://x.test/q", "2025-06-14T00:00:00Z", b"<p>hi</p>")
    assert a != c


def test_gzip_shard_bytes_deterministic(tmp_path):
    rec = warc.format_record("https://x.test/", "2025-06-14T00:00:00Z", b"<p>x</p>")
    assert gzip.compress(rec, mtime=0) == gzip.compress(rec, mtime=0)


def test_warc_date_nat_and_none():
    assert warc._warc_date(None) == "1970-01-01T00:00:00Z"
    assert warc._warc_date(pd.NaT) == "1970-01-01T00:00:00Z"
    assert warc._warc_date(pd.Timestamp("2025-06-14 12:30:45")) == \
        "2025-06-14T12:30:45Z"


def test_warc_date_subsecond_and_tz():
    """Round-4 ADVICE: sub-second precision must survive (WARC 1.1
    fractional seconds) and tz-aware stamps convert to UTC before the
    'Z' label; whole seconds keep the original compact shape."""
    assert warc._warc_date(pd.Timestamp("2024-05-06 07:08:09")) == \
        "2024-05-06T07:08:09Z"
    assert warc._warc_date(pd.Timestamp("2024-05-06 07:08:09.125")) == \
        "2024-05-06T07:08:09.125Z"
    assert warc._warc_date(pd.Timestamp("2024-05-06 07:08:09.000001")) == \
        "2024-05-06T07:08:09.000001Z"
    aware = pd.Timestamp("2024-05-06 07:08:09.5", tz="America/New_York")
    assert warc._warc_date(aware) == "2024-05-06T11:08:09.5Z"


def test_subsecond_ts_roundtrip(spark, tmp_path):
    """A page with microsecond warc_ts must come back equal through the
    shard roundtrip (the old whole-second strftime silently truncated)."""
    import datetime

    ts = datetime.datetime(2024, 5, 6, 7, 8, 9, 123456)
    df = spark.createDataFrame(
        [("https://sub.test/1", ts, b"<html>x</html>", None, None)],
        warc.WARC_PAGES_SCHEMA)
    out = str(tmp_path / "shards")
    warc.write_warc_shards(df.repartition(1), out).collect()
    (row,) = warc.read_warc(spark, out).collect()
    assert row["warc_ts"] == ts


def test_reader_ignores_inprogress_tmp(spark, tmp_path):
    """Round-4 ADVICE (medium): a reader racing the writer must never
    ingest a partially-written temp file.  The temp naming contract is
    dot-prefixed and '.warc'-free; drop a torn temp next to a good
    shard and assert both the batch glob and strict parsing never see
    it."""
    out = tmp_path / "shards"
    df = fixture_pages_df(spark).limit(3)
    warc.write_warc_shards(df.repartition(1), str(out)).collect()
    torn = out / ".inprogress-shard-00007-12345"
    torn.write_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n")  # torn header
    # strict (lenient=False) read: would raise if the temp were listed
    rows = warc.read_warc(spark, str(out)).collect()
    assert len(rows) == 3
    # and the temp name can never match the glob the readers ACTUALLY
    # use — pulled from the source so a reader-glob change re-tests
    # the contract instead of pinning a stale pattern
    import fnmatch
    import pathlib
    import re

    src_dir = pathlib.Path(warc.__file__).resolve().parents[1]
    globs = set()
    for mod in ("sources/warc.py", "streaming/incremental.py"):
        text = (src_dir / mod).read_text()
        globs |= set(re.findall(
            r'"pathGlobFilter",\s*"([^"]+)"', text))
    assert globs, "no pathGlobFilter found in readers"

    def expand(g):  # {a,b} brace alternation (fnmatch has none)
        m = re.fullmatch(r"(.*)\{([^}]*)\}(.*)", g)
        return ([m.group(1) + alt + m.group(3)
                 for alt in m.group(2).split(",")] if m else [g])

    alts = [alt for g in globs for alt in expand(g)]
    assert not any(fnmatch.fnmatch(torn.name, alt) for alt in alts), \
        (torn.name, sorted(globs))
    # and the published shard names must still match
    assert any(fnmatch.fnmatch("shard-00000.warc", alt) for alt in alts)
    assert any(fnmatch.fnmatch("shard-00000.warc.gz", alt) for alt in alts)


def test_failed_write_leaves_no_tmp(tmp_path):
    """A task attempt that dies mid-shard must remove its temp file so
    retries start clean (no torn litter, no glob surprises); driven at
    the _stream_shard level where a mid-iterator failure is
    deterministic."""
    out = tmp_path / "shards"
    tmp = str(out / ".inprogress-shard-00000-1")
    path = str(out / "shard-00000.warc")

    def batches():
        yield pd.DataFrame({"url": ["https://ok.test/1"],
                            "warc_ts": [None], "html": [b"<html>a</html>"]})
        raise RuntimeError("executor died mid-partition")

    with pytest.raises(RuntimeError):
        warc._stream_shard(batches(), str(out), tmp, path, compress=False)
    assert [p for p in out.glob("*") if p.is_file()] == []
    # and a clean retry into the same dir publishes normally
    def good():
        yield pd.DataFrame({"url": ["https://ok.test/1"],
                            "warc_ts": [None], "html": [b"<html>a</html>"]})
    n, n_bytes = warc._stream_shard(good(), str(out), tmp, path,
                                    compress=False)
    assert n == 1 and os.path.exists(path) and not os.path.exists(tmp)
