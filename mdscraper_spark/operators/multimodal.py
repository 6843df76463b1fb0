"""Multimodal-column plumbing (image/audio/video as opaque binary).

The decode step itself is STUBBED — the codec libraries (PIL/ffmpeg/…)
are not in this container — but the Spark-side plumbing is real and
tested: binary column + typed metadata struct, Arrow batch transfer,
bounded batch sizes, deterministic fake features so tests are stable.
Swap ``_decode_image_stub`` for a real decoder on a cluster with the
libs installed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
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
    StructField("content_sha", StringType(), False),
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


def _decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decode.  A real deployment raises here unless
    the codec libs are present; the fake keeps the pipeline testable."""
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError(
            "real decoder wiring intentionally left to deployments with "
            "codec libraries installed")
    digest = hashlib.sha256(payload).hexdigest()
    # fake-but-deterministic dimensions derived from the content hash
    width = 64 + int(digest[:4], 16) % 1920
    height = 64 + int(digest[4:8], 16) % 1080
    return {"content_sha": digest, "width": width, "height": height,
            "codec": "fake/deterministic", "status": "ok"}


def decode_binary_docs(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """binary payload -> typed metadata rows via Arrow batches."""
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_bytes", "content_sha",
                                   "width", "height", "codec", "status")}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    meta = _decode_image_stub(data)
                except Exception as exc:  # never fail the batch
                    meta = {"content_sha": "", "width": None, "height": None,
                            "codec": None, "status": f"error:{type(exc).__name__}"}
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(data))
                for k in ("content_sha", "width", "height", "codec", "status"):
                    out[k].append(meta[k])
            yield pd.DataFrame(out)

    return pruned.mapInPandas(run, DECODED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("frame_no", IntegerType(), False),
    StructField("ts_ms", LongType(), False),
    StructField("frame_sha", StringType(), False),
    StructField("status", StringType(), False),
])


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """video binary -> one row per sampled frame (1->N expansion inside
    the Arrow batch; output batch shape differs from input, which is
    why this is mapInPandas and not a scalar pandas_udf).

    Stub decode: frame count and hashes are derived deterministically
    from the content hash; a real deployment swaps in av/ffmpeg frame
    extraction with the same output schema.
    """
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_no", "ts_ms",
                                   "frame_sha", "status")}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(data).hexdigest()
                n_frames = 1 + int(digest[:2], 16) % 8
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame_sha"].append(hashlib.sha256(
                        data + i.to_bytes(4, "big")).hexdigest())
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
    """binary -> array<float> feature vector (stubbed encoder: floats
    derived from the content hash, unit-normalized).  The output column
    is directly consumable by the similarity operators
    (cosine top-k / LSH / IVF), closing the binary->embedding->ANN
    pipeline end-to-end."""
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, status = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                raw = hashlib.sha256(data).digest()
                while len(raw) < 2 * dim:
                    raw += hashlib.sha256(raw).digest()
                vals = [int.from_bytes(raw[2 * i:2 * i + 2], "big") - 32768
                        for i in range(dim)]
                norm = sum(v * v for v in vals) ** 0.5 or 1.0
                ids.append(doc_id)
                feats.append([float(v / norm) for v in vals])
                status.append("ok")
            yield pd.DataFrame(
                {"doc_id": ids, "feature": feats, "status": status})

    return pruned.mapInPandas(run, FEATURE_SCHEMA)
