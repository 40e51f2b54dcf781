"""Spark UI REST metrics helpers (shared by bench.py and tools/).

The UI REST API (``/api/v1``) is the one public, version-stable way
to read per-stage shuffle/spill totals from outside the JVM — the
same numbers the listener bus aggregates for the web UI. Sessions
must be built with ``spark.ui.enabled=true`` for the endpoint to be
served (the status store itself always exists; only the HTTP server
is optional).

Pattern for measuring one query segment (used by the p10 per-stage
breakdown and the spill probe): snapshot completed stage keys,
materialize the segment, diff, and aggregate the NEW stages' totals.
"""

from __future__ import annotations

import json
import urllib.request

def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def _app_base(spark) -> str:
    # uiWebUrl reports the ACTUALLY BOUND port (4040 auto-increments
    # when another local session holds it), unlike the ui.port conf
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    return f"{ui}/api/v1/applications/{app_id}"


def completed_stage_keys(spark) -> set[tuple[int, int]]:
    return {
        (s["stageId"], s["attemptId"])
        for s in _get(f"{_app_base(spark)}/stages?status=COMPLETE")
    }


def stage_totals(spark, keys: set[tuple[int, int]]) -> dict:
    """Aggregate shuffle/spill/input totals over the given stage keys.

    Returns MiB-denominated sums plus the max single-stage
    ``peakExecutionMemory`` (the task-aggregated unroll/execution
    memory high-water mark — the number that predicts whether a 100×
    scale-up fits executor memory or spills).
    """
    tot = {
        "n_stages": 0,
        "input_mb": 0.0,
        "shuffle_read_mb": 0.0,
        "shuffle_write_mb": 0.0,
        # partial-aggregate hash maps degrade under memory pressure by
        # EARLY FLUSH (emitting partial rows before full combine), not
        # by disk spill — visible as a shuffle-record increase at an
        # unchanged result; the forced-spill harness reads this to
        # classify map-combined plans (s13/s14-shaped) whose per-task
        # state is bounded by construction
        "shuffle_write_records": 0,
        "mem_spill_mb": 0.0,
        "disk_spill_mb": 0.0,
        "peak_execution_memory_mb": 0.0,
    }
    for s in _get(f"{_app_base(spark)}/stages?status=COMPLETE"):
        if (s["stageId"], s["attemptId"]) not in keys:
            continue
        tot["n_stages"] += 1
        tot["input_mb"] += s.get("inputBytes", 0) / 2**20
        tot["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / 2**20
        tot["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / 2**20
        tot["shuffle_write_records"] += s.get("shuffleWriteRecords", 0)
        tot["mem_spill_mb"] += s.get("memoryBytesSpilled", 0) / 2**20
        tot["disk_spill_mb"] += s.get("diskBytesSpilled", 0) / 2**20
        tot["peak_execution_memory_mb"] = max(
            tot["peak_execution_memory_mb"],
            s.get("peakExecutionMemory", 0) / 2**20,
        )
    return {k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in tot.items()}


class SegmentMeter:
    """Measure wall + stage totals for successive segments of work."""

    def __init__(self, spark) -> None:
        self.spark = spark
        self._before = completed_stage_keys(spark)

    def segment(self) -> dict:
        """Totals for stages completed since the last call (or init)."""
        now = completed_stage_keys(self.spark)
        new = now - self._before
        self._before = now
        return stage_totals(self.spark, new)
