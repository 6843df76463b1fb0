"""Warehouse table layer: Iceberg-semantics adapter over parquet.

Production target is an Iceberg catalog (BASELINE.json: Iceberg tables,
``bucket(N, url_host)`` partitioning).  This sandbox has no Iceberg
runtime jar (SURVEY.md §4.4), so the same surface is provided over
partitioned parquet plus a JSON manifest chain carrying the
Iceberg-ish metadata we rely on: snapshot id, parent snapshot, schema,
partition spec.  The adapter is intentionally thin: on a cluster with
Iceberg jars, ``write_table``/``read_table`` become
``df.writeTo(...)``/``spark.read.table(...)`` with no caller changes.

Partition-granular idempotency comes from dynamic partition overwrite:
re-running a work bucket replaces exactly its files, which is what
makes checkpoint/resume restarts safe (SURVEY.md §2.I8).
"""

from __future__ import annotations

import datetime
import json
import pathlib
import uuid
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = pathlib.Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def table_path(self, name: str) -> pathlib.Path:
        return self.root / name

    def _manifest_path(self, name: str) -> pathlib.Path:
        return self.table_path(name) / "_manifest.json"

    def exists(self, name: str) -> bool:
        return self._manifest_path(name).exists()

    # -- io ---------------------------------------------------------------
    def write_table(self, df: DataFrame, name: str,
                    partition_by: Sequence[str] = (),
                    mode: str = "overwrite") -> str:
        """Write + advance the snapshot chain; returns the snapshot id.

        With ``mode='overwrite'`` and a partition spec, only the
        partitions present in ``df`` are replaced (dynamic overwrite) —
        Iceberg's overwrite-by-partition-expression semantics.
        """
        path = self.table_path(name)
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.option("partitionOverwriteMode", "dynamic")
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(path))

        parent = None
        if self._manifest_path(name).exists():
            parent = json.loads(self._manifest_path(name).read_text())["snapshot_id"]
        snapshot_id = uuid.uuid4().hex
        manifest = {
            "table": name,
            "snapshot_id": snapshot_id,
            "parent_snapshot": parent,
            "committed_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
            "schema": json.loads(df.schema.json()),
            "partition_by": list(partition_by),
            "write_mode": mode,
        }
        self._manifest_path(name).write_text(json.dumps(manifest, indent=2))
        return snapshot_id

    def read_table(self, name: str) -> DataFrame:
        """Read with the manifest schema (Iceberg semantics: schema comes
        from table metadata, not file-footer inference).  This also makes
        empty tables readable — a partitioned write of 0 rows leaves no
        parquet files, which would otherwise fail schema inference."""
        reader = self.spark.read
        m = self.manifest(name)
        if m is not None:
            from pyspark.sql.types import StructType
            reader = reader.schema(StructType.fromJson(m["schema"]))
        return reader.parquet(str(self.table_path(name)))

    def manifest(self, name: str) -> Optional[dict]:
        p = self._manifest_path(name)
        return json.loads(p.read_text()) if p.exists() else None
