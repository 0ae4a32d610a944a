"""Table catalog with snapshot + lineage semantics (Iceberg-shaped).

The north rule targets Iceberg tables; this container has no Iceberg
runtime jar and no network, so the catalog is a faithful local stand-in
over parquet: every append produces a numbered snapshot record (row
count, wall time, parent snapshot, free-form lineage), and reads go
through the latest snapshot's file set. On a real cluster the same
call sites map 1:1 to Iceberg:

    catalog.append(df, "extracted", lineage=...)   →  df.writeTo("cat.db.extracted").append()
    catalog.snapshots("extracted")                 →  SELECT * FROM cat.db.extracted.snapshots
    resume anti-join on the url manifest           →  incremental read from snapshot N

and the SparkSession confs are:
    spark.sql.catalog.cat = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.cat.type = hadoop
    spark.sql.catalog.cat.warehouse = <warehouse dir>
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class LocalTableCatalog:
    def __init__(self, warehouse_dir: str):
        self.warehouse = warehouse_dir
        os.makedirs(warehouse_dir, exist_ok=True)

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _snap_log(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_snapshots.jsonl")

    def append(
        self, df: DataFrame, name: str, lineage: dict | None = None
    ) -> dict:
        """Append df as a new snapshot; returns the snapshot record."""
        tdir = self._table_dir(name)
        data_dir = os.path.join(tdir, "data")
        snap_id = uuid.uuid4().hex[:16]
        df.write.mode("append").parquet(data_dir)
        n_rows = df.sparkSession.read.parquet(data_dir).count()
        parent = None
        snaps = self.snapshots(name)
        if snaps:
            parent = snaps[-1]["snapshot_id"]
        rec = {
            "snapshot_id": snap_id,
            "parent_id": parent,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "total_rows": n_rows,
            "lineage": lineage or {},
        }
        os.makedirs(tdir, exist_ok=True)
        with open(self._snap_log(name), "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        return rec

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._table_dir(name), "data"))

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._table_dir(name), "data"))

    def snapshots(self, name: str) -> list[dict]:
        path = self._snap_log(name)
        if not os.path.exists(path):
            return []
        with open(path) as fh:
            return [json.loads(line) for line in fh if line.strip()]
