"""Checkpoint store: Iceberg-first table layer with automatic Parquet
fallback (SURVEY.md §7.2 S0; the sandbox has no Iceberg runtime jar, a real
cluster would configure a catalog and get ACID snapshots + time travel).

Every pipeline stage writes its output here together with a manifest entry
(stage name, config hash, row count) enabling EXACT resume: a re-run with
the same config skips completed stages and reads their checkpoints
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics").
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


@dataclass
class CheckpointStore:
    """Stage-checkpoint table layer rooted at ``base_dir``.

    On Iceberg-enabled clusters the same API writes
    ``catalog.db.<name>`` tables (writeTo/createOrReplace); here it falls
    back to Parquet directories — identical schema and resume semantics.
    """

    spark: SparkSession
    base_dir: str

    def __post_init__(self) -> None:
        os.makedirs(self.base_dir, exist_ok=True)
        self._use_iceberg = iceberg_available(self.spark) and bool(
            self.spark.conf.get("spark.sql.catalog.ckpt", None)
        )

    # -- manifest ------------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.base_dir, "manifest.json")

    def _read_manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"stages": {}}

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path)

    # -- tables ----------------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def write(self, df: DataFrame, name: str, config_hash: str = "") -> DataFrame:
        """Materialize a stage output and record it in the manifest.
        Returns the re-read DataFrame (cuts lineage, exactly like the
        reference pipeline's per-stage checkpointing requirement)."""
        if self._use_iceberg:
            df.writeTo(f"ckpt.db.{name}").createOrReplace()
            out = self.spark.read.table(f"ckpt.db.{name}")
            rows = out.count()
        else:
            df.write.mode("overwrite").parquet(self._path(name))
            out = self.spark.read.parquet(self._path(name))
            rows = self._parquet_rows(self._path(name))
        m = self._read_manifest()
        m["stages"][name] = {
            "config_hash": config_hash,
            "rows": rows,
            "format": "iceberg" if self._use_iceberg else "parquet",
        }
        self._write_manifest(m)
        return out

    @staticmethod
    def _parquet_rows(path: str) -> int:
        """Row count from parquet footers (driver-side pyarrow metadata read
        — no Spark job; Iceberg would serve this from snapshot metadata)."""
        import pyarrow.parquet as pq

        total = 0
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
        return total

    def read(self, name: str) -> DataFrame:
        if self._use_iceberg:
            return self.spark.read.table(f"ckpt.db.{name}")
        return self.spark.read.parquet(self._path(name))

    def completed(self, name: str, config_hash: str = "") -> bool:
        """True iff the stage finished under the SAME config."""
        st = self._read_manifest()["stages"].get(name)
        if st is None or st["config_hash"] != config_hash:
            return False
        return os.path.exists(self._path(name)) or self._use_iceberg

    def stage_info(self, name: str) -> dict | None:
        return self._read_manifest()["stages"].get(name)

    # -- pipeline state (incremental-batch bookkeeping) ------------------------
    def state(self) -> dict:
        """Free-form pipeline state kept in the manifest (e.g. the ordered
        incremental-batch list and the current cumulative-table suffix).
        On Iceberg this would live in table properties / snapshot summary;
        the manifest keeps identical semantics on the parquet fallback."""
        return self._read_manifest().get("state", {})

    def set_state(self, **kv) -> None:
        m = self._read_manifest()
        m.setdefault("state", {}).update(kv)
        self._write_manifest(m)
