"""Resumable stage checkpoints with per-partition lineage (north rule).

Each pipeline stage writes its output table plus a ``_lineage.json``
sidecar recording: stage name, an input fingerprint (hash of upstream
fingerprints + stage config), per-partition row counts, stage counters
(e.g. pairs budgeted/dropped) and wall time. The sidecar is written
LAST, so its presence with a matching fingerprint marks the stage
complete — an interrupted write leaves no sidecar and the stage reruns.

``resume``: on re-run, a stage whose fingerprint matches is read back
from parquet instead of recomputed; the first stage whose inputs changed
(or that never completed) recomputes, and everything downstream follows.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

LINEAGE_FILE = "_lineage.json"


def fingerprint(*parts: object) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x1f")
    return h.hexdigest()[:16]


def input_data_fingerprint(path: str) -> str:
    """Cheap DATA fingerprint for stage resume: the input path plus its
    file listing with sizes and mtimes. Rerunning against the same path
    after the data changed therefore recomputes instead of silently
    reusing stale stage outputs (no file reads — listing only)."""
    entries = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                entries.append((os.path.relpath(p, path), st.st_size, st.st_mtime_ns))
    elif os.path.exists(path):
        st = os.stat(path)
        entries.append((path, st.st_size, st.st_mtime_ns))
    return fingerprint(path, sorted(entries))


@dataclass
class StageResult:
    name: str
    df: DataFrame
    fingerprint: str
    resumed: bool
    counters: dict = field(default_factory=dict)


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    @staticmethod
    def _file_lineage(data_dir: str) -> list[dict]:
        """rows/bytes per output parquet file, from footers only."""
        import pyarrow.parquet as pq

        entries = []
        for root, _dirs, files in os.walk(data_dir):
            for name in sorted(files):
                if not name.endswith(".parquet"):
                    continue
                p = os.path.join(root, name)
                entries.append({
                    "partition": os.path.relpath(p, data_dir),
                    "rows": pq.ParquetFile(p).metadata.num_rows,
                    "bytes": os.path.getsize(p),
                })
        return entries

    def lineage(self, stage: str) -> dict | None:
        p = os.path.join(self._stage_dir(stage), LINEAGE_FILE)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def run_stage(
        self,
        stage: str,
        input_fingerprint: str,
        compute: Callable[[], DataFrame],
        counters: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> StageResult:
        """Return the stage output, recomputing only when the
        fingerprint is new. ``counters`` may be a dict OR a callable
        evaluated only on recompute (for stats that are themselves jobs).
        """
        d = self._stage_dir(stage)
        lin = self.lineage(stage)
        if lin is not None and lin.get("input_fingerprint") == input_fingerprint:
            return StageResult(
                stage, self.spark.read.parquet(os.path.join(d, "data")),
                input_fingerprint, resumed=True, counters=lin.get("counters", {}),
            )
        if os.path.exists(d):
            shutil.rmtree(d)
        t0 = time.time()
        df = compute()
        data_dir = os.path.join(d, "data")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        out = self.spark.read.parquet(data_dir)
        # per-partition lineage from the parquet FOOTERS (driver-side
        # metadata read, no Spark job): one entry per written file —
        # rows + bytes. Replaces a full groupBy-count scan of the stage
        # output, which at scale re-read the entire table per stage.
        part_counts = self._file_lineage(data_dir)
        resolved_counters = counters() if callable(counters) else (counters or {})
        lineage = {
            "stage": stage,
            "input_fingerprint": input_fingerprint,
            "rows_out": sum(p["rows"] for p in part_counts),
            "partitions": part_counts,
            "counters": resolved_counters,
            "wall_ms": int((time.time() - t0) * 1000),
            "completed_at": time.time(),
        }
        # sidecar written last == completion marker
        with open(os.path.join(d, LINEAGE_FILE), "w") as f:
            json.dump(lineage, f, indent=2)
        return StageResult(stage, out, input_fingerprint, resumed=False,
                           counters=resolved_counters)
