"""Stage checkpoint catalog: resumable runs with per-partition lineage.

The north rule requires every stage to checkpoint with per-partition
lineage + metrics so a run can resume mid-pipeline.  In an Iceberg
deployment each stage would be ``df.writeTo(...).createOrReplace()``
with snapshot metadata; this catalog targets the same abstraction and
falls back to partitioned Parquet + a JSON manifest when no Iceberg
catalog is configured (none is in this sandbox — no runtime jar).

Layout:  <base>/<run_id>/<stage>/         parquet data
         <base>/<run_id>/<stage>.json     manifest:
             stage, rows, wall_ms, partitions: [{partition_id, rows}]

``stage()`` is write-through: if a completed manifest + _SUCCESS marker
exist, the stage is *skipped* and read back (resume path, exercised by
tests/test_pipeline.py::test_resume_from_checkpoint).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RunCatalog:
    def __init__(self, spark: SparkSession, base_dir: str, run_id: str):
        self.spark = spark
        self.base_dir = base_dir
        self.run_id = run_id
        self.root = os.path.join(base_dir, run_id)
        os.makedirs(self.root, exist_ok=True)

    def _paths(self, name: str):
        return (os.path.join(self.root, name),
                os.path.join(self.root, f"{name}.json"))

    def is_done(self, name: str) -> bool:
        data, manifest = self._paths(name)
        return (os.path.exists(manifest)
                and os.path.exists(os.path.join(data, "_SUCCESS")))

    def stage(self, name: str, build, num_partitions: int | None = None)\
            -> DataFrame:
        """Materialize stage ``name``; ``build`` is a zero-arg callable
        returning the DataFrame.  Skips the build entirely when the
        stage checkpoint is already complete (resume)."""
        data, manifest = self._paths(name)
        if self.is_done(name):
            return self.spark.read.parquet(data)

        t0 = time.perf_counter()
        df = build()
        if num_partitions:
            df = df.repartition(num_partitions)
        df.write.mode("overwrite").parquet(data)
        wall_ms = int((time.perf_counter() - t0) * 1000)

        out = self.spark.read.parquet(data)
        parts = (out.groupBy(F.spark_partition_id().alias("partition_id"))
                 .agg(F.count(F.lit(1)).alias("rows"))
                 .orderBy("partition_id").collect())
        meta = {
            "run_id": self.run_id,
            "stage": name,
            "rows": int(sum(p["rows"] for p in parts)),
            "wall_ms": wall_ms,
            "partitions": [{"partition_id": int(p["partition_id"]),
                            "rows": int(p["rows"])} for p in parts],
        }
        with open(manifest, "w") as fh:
            json.dump(meta, fh)
        return out

    def manifest(self, name: str) -> dict:
        _, manifest = self._paths(name)
        with open(manifest) as fh:
            return json.load(fh)

    def manifests(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.root)):
            if fn.endswith(".json"):
                with open(os.path.join(self.root, fn)) as fh:
                    out.append(json.load(fh))
        return out
