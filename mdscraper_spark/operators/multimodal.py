"""Multimodal-column plumbing (image/audio/video as opaque binary).

The decode step itself is STUBBED — the codec libraries (PIL/ffmpeg/…)
are not in this container — but the Spark-side plumbing is real and
tested: binary column + typed metadata struct, Arrow batch transfer,
bounded batch sizes, deterministic fake features so tests are stable.
Swap ``_decode_image_stub`` for a real decoder on a cluster with the
libs installed.

All stub derivations are **md5-over-strings** so DuckDB can replay
them exactly in SQL (DuckDB's ``md5`` accepts VARCHAR only) — the
``sql_*`` twins below build the oracle expressions.  This makes the
stubbed queries full hash-match oracle rows rather than rows-only.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("content_hash", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("codec", StringType(), True),
    StructField("status", StringType(), False),
])

REAL_DECODERS_AVAILABLE = False  # flipped when PIL/av are importable
try:  # pragma: no cover - not available in this container
    import PIL.Image  # noqa: F401
    REAL_DECODERS_AVAILABLE = True
except ImportError:
    pass


def _require_stub() -> None:
    """Seam guard: a cluster that *does* have the codec libraries must
    not silently run the deterministic fake — it has to wire the real
    decoder in at this exact point (or unset REAL_DECODERS_AVAILABLE
    to explicitly opt back into the stub)."""
    if REAL_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "real decoder wiring intentionally left to deployments with "
            "codec libraries installed")


def _decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decode.  A real deployment raises here unless
    the codec libs are present; the fake keeps the pipeline testable."""
    _require_stub()
    digest = hashlib.md5(payload).hexdigest()
    # fake-but-deterministic dimensions derived from the content hash
    width = 64 + int(digest[:4], 16) % 1920
    height = 64 + int(digest[4:8], 16) % 1080
    return {"content_hash": digest, "width": width, "height": height,
            "codec": "fake/deterministic", "status": "ok"}


def decode_binary_docs(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """binary payload -> typed metadata rows via Arrow batches."""
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # seam guard OUTSIDE the per-row try: a codec-equipped cluster
        # must fail loudly, not emit a table of status='error:...' rows
        _require_stub()
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_bytes", "content_hash",
                                   "width", "height", "codec", "status")}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    meta = _decode_image_stub(data)
                except Exception as exc:  # never fail the batch
                    meta = {"content_hash": "", "width": None, "height": None,
                            "codec": None, "status": f"error:{type(exc).__name__}"}
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(data))
                for k in ("content_hash", "width", "height", "codec", "status"):
                    out[k].append(meta[k])
            yield pd.DataFrame(out)

    return pruned.mapInPandas(run, DECODED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("frame_no", IntegerType(), False),
    StructField("ts_ms", LongType(), False),
    StructField("frame_hash", StringType(), False),
    StructField("status", StringType(), False),
])


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """video binary -> one row per sampled frame (1->N expansion inside
    the Arrow batch; output batch shape differs from input, which is
    why this is mapInPandas and not a scalar pandas_udf).

    Stub decode: frame count and hashes are derived deterministically
    from the content hash (``md5(f"{digest}:{i}")``); a real deployment
    swaps in av/ffmpeg frame extraction with the same output schema.
    """
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _require_stub()
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_no", "ts_ms",
                                   "frame_hash", "status")}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(data).hexdigest()
                n_frames = 1 + int(digest[:2], 16) % 8
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame_hash"].append(hashlib.md5(
                        f"{digest}:{i}".encode("ascii")).hexdigest())
                    out["status"].append("ok")
            yield pd.DataFrame(out)

    return pruned.mapInPandas(run, FRAME_SCHEMA)


FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("feature", ArrayType(FloatType()), False),
    StructField("status", StringType(), False),
])


def extract_features(df: DataFrame, dim: int = 16,
                     id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """binary -> array<float> feature vector (stubbed encoder: 2-byte
    ints carved from the hex chain ``md5(data) || md5(md5(data)) || …``,
    centered and unit-normalized).  The output column is directly
    consumable by the similarity operators (cosine top-k / LSH / IVF),
    closing the binary->embedding->ANN pipeline end-to-end."""
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _require_stub()
        for pdf in batches:
            ids, feats, status = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                raw = hashlib.md5(data).hexdigest()
                while len(raw) < 4 * dim:  # 4 hex chars per component
                    raw += hashlib.md5(raw.encode("ascii")).hexdigest()
                vals = [int(raw[4 * i:4 * i + 4], 16) - 32768
                        for i in range(dim)]
                norm = sum(v * v for v in vals) ** 0.5 or 1.0
                ids.append(doc_id)
                feats.append([float(v / norm) for v in vals])
                status.append("ok")
            yield pd.DataFrame(
                {"doc_id": ids, "feature": feats, "status": status})

    return pruned.mapInPandas(run, FEATURE_SCHEMA)


# -- SQL twins (DuckDB oracle expressions) -----------------------------------
#
# The Spark queries feed the stubs ``encode(text, 'utf-8')`` payloads, and
# DuckDB's VARCHAR md5 hashes the UTF-8 bytes of `text` — identical input
# bytes, so every derivation below replays bit-for-bit.

def sql_hex_int(h: str, pos: int, n: int = 4) -> str:
    """Integer value of ``n`` hex chars of expression ``h`` starting at
    1-indexed ``pos`` (DuckDB parses '0x…' casts natively)."""
    return f"CAST('0x' || substr({h}, {pos}, {n}) AS INT)"


def sql_decode_meta(text: str) -> str:
    """Column list replaying ``_decode_image_stub`` over utf-8 text."""
    h = f"md5({text})"
    return (f"CAST(octet_length(encode({text})) AS BIGINT) AS n_bytes, "
            f"{h} AS content_hash, "
            f"64 + ({sql_hex_int(h, 1)} % 1920) AS width, "
            f"64 + ({sql_hex_int(h, 5)} % 1080) AS height, "
            f"'fake/deterministic' AS codec, 'ok' AS status")


def sql_feature_vals(raw_hex: str, dim: int = 16) -> str:
    """DuckDB list literal of the centered 2-byte ints carved from the
    hex chain (twin of the ``vals`` list in ``extract_features``)."""
    parts = ", ".join(f"{sql_hex_int(raw_hex, 4 * i + 1)} - 32768"
                      for i in range(dim))
    return f"[{parts}]"


def sql_feature_cte(dim: int = 16) -> str:
    """CTE producing (vec_id, embedding FLOAT[]) from documents.text —
    the full extract_features twin, float32-cast exactly where the
    Arrow conversion rounds."""
    if dim > 16:
        raise ValueError("sql twin covers one md5-extension round (dim<=16)")
    return f"""
feat_raw AS (
  SELECT doc_id, md5(text) || md5(md5(text)) AS rh FROM documents
),
feat_vals AS (
  SELECT doc_id, {sql_feature_vals('rh', dim)} AS vals FROM feat_raw
),
feat AS (
  SELECT doc_id AS vec_id,
         list_transform(vals, x -> CAST(x / (CASE
             WHEN list_inner_product(vals::DOUBLE[], vals::DOUBLE[]) = 0
             THEN 1.0
             ELSE sqrt(list_inner_product(vals::DOUBLE[], vals::DOUBLE[]))
           END) AS FLOAT)) AS embedding
  FROM feat_vals
)"""
