"""Checkpoint / lineage layout for resumable pipelines.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics".  Layout (plain partitioned Parquet — the Lance target
format is not installed in this environment; the layout is
format-agnostic):

    <out>/z=<z>/part-*.parquet      one directory per partition key (zoom)
    <out>/_lineage/z=<z>.json       lineage record written AFTER the
                                    partition's data lands (atomic rename)
    <out>/_metrics/z=<z>.json       per-partition metrics side output

A restarted run lists `_lineage/`, skips finished partitions (anti-join on
the partition key), and recomputes only the rest (SURVEY.md §4 checkpoint
row).
"""

from __future__ import annotations

import json
import os
import time


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def metrics_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_metrics")


def finished_partitions(out_dir: str) -> set[str]:
    d = lineage_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    return {f[: -len(".json")] for f in os.listdir(d) if f.endswith(".json")}


def _write_json_atomic(path: str, payload: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def record_partition(
    out_dir: str,
    key: str,
    *,
    inputs: dict,
    metrics: dict,
) -> None:
    """Write lineage + metrics for a finished partition (idempotent)."""
    stamp = {"key": key, "finished_unix": time.time(), "inputs": inputs}
    _write_json_atomic(os.path.join(lineage_dir(out_dir), f"{key}.json"), stamp)
    _write_json_atomic(os.path.join(metrics_dir(out_dir), f"{key}.json"), {"key": key, **metrics})


def load_metrics(out_dir: str) -> list[dict]:
    d = metrics_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out.append(json.load(fh))
    return out
