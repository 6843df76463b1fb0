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
    BinaryType,
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
