"""Checkpointed, resumable partitioned output with per-partition lineage +
metrics.

The reference's resume story is "append-only SQLite + latest-snapshot dedup —
re-run is safe, newest row wins" (``pages/parallel_ocr_test.py:56-67``,
``scripts/export_benchmark_results.py:47-56``). At 10^12 rows the equivalent
is a *partition manifest*: output is written one parquet file per input
partition under a deterministic name, each write records a manifest entry
(partition id, rows in/out, wall seconds, content checksum, finished_at), and
a re-submitted job anti-joins pending partitions against the manifest and
processes only the gap. Ray task retries handle block-level failure; the
manifest handles *job*-level resume, which Ray does not give you.

Layout::

    out_dir/
      part-00000.parquet
      part-00001.parquet
      _manifest/
        part-00000.json      # {"partition": 0, "rows_in": ..., "rows_out": ...,
                             #  "wall_sec": ..., "sha256": ..., "finished_at": ...}

A partition is DONE iff its manifest entry exists and names an existing file —
the data file is written first, the manifest entry second, so a crash between
the two re-processes the partition (idempotent: the filename is deterministic
and overwritten).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq


@dataclass
class PartitionResult:
    partition: int
    rows_in: int
    rows_out: int
    wall_sec: float
    sha256: str
    skipped: bool


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _part_file(out_dir: str, i: int) -> str:
    return os.path.join(out_dir, f"part-{i:05d}.parquet")


def _entry_file(out_dir: str, i: int) -> str:
    return os.path.join(_manifest_dir(out_dir), f"part-{i:05d}.json")


def done_partitions(out_dir: str) -> set[int]:
    """Partitions with a manifest entry whose data file still exists."""
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        try:
            entry = json.load(open(os.path.join(mdir, name)))
            if os.path.exists(_part_file(out_dir, entry["partition"])):
                done.add(int(entry["partition"]))
        except (json.JSONDecodeError, KeyError, OSError):
            continue  # torn write → treat as not done, re-process
    return done


def write_partition(out_dir: str, partition: int, table: pa.Table, *, rows_in: int | None = None,
                    started: float | None = None) -> PartitionResult:
    """Write one partition + its manifest entry (data first, manifest second)."""
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    t0 = started if started is not None else time.time()
    path = _part_file(out_dir, partition)
    pq.write_table(table, path)
    digest = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            digest.update(chunk)
    wall = time.time() - t0
    entry = {
        "partition": partition,
        "rows_in": rows_in if rows_in is not None else table.num_rows,
        "rows_out": table.num_rows,
        "wall_sec": round(wall, 4),
        "sha256": digest.hexdigest(),
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    tmp = _entry_file(out_dir, partition) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, _entry_file(out_dir, partition))
    return PartitionResult(partition, entry["rows_in"], entry["rows_out"], wall,
                           entry["sha256"], skipped=False)


def run_partitioned(
    inputs: list,
    out_dir: str,
    process_one: Callable[[object], pa.Table],
    *,
    resume: bool = True,
    rows_in_fn: Callable[[object], int | None] | None = None,
) -> list[PartitionResult]:
    """Process ``inputs[i]`` → ``part-i.parquet``, skipping finished
    partitions when resuming. ``process_one`` typically builds and consumes a
    Ray Dataset for one input shard; partitions run sequentially here because
    each one is internally distributed. ``rows_in_fn`` supplies the input row
    count for the lineage record (e.g. from parquet metadata — without it the
    manifest can only record rows_out).
    """
    done = done_partitions(out_dir) if resume else set()
    results: list[PartitionResult] = []
    for i, item in enumerate(inputs):
        if i in done:
            entry = json.load(open(_entry_file(out_dir, i)))
            results.append(
                PartitionResult(i, entry["rows_in"], entry["rows_out"],
                                entry["wall_sec"], entry["sha256"], skipped=True)
            )
            continue
        t0 = time.time()
        table = process_one(item)
        rows_in = rows_in_fn(item) if rows_in_fn else None
        results.append(write_partition(out_dir, i, table, rows_in=rows_in, started=t0))
    return results


def manifest_metrics(out_dir: str) -> pa.Table:
    """The manifest as an Arrow table — per-partition lineage + metrics rows
    (the north_rule's 'checkpointed block metadata')."""
    rows = []
    mdir = _manifest_dir(out_dir)
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if name.endswith(".json"):
                try:
                    rows.append(json.load(open(os.path.join(mdir, name))))
                except json.JSONDecodeError:
                    continue
    if not rows:
        return pa.table(
            {
                "partition": pa.array([], pa.int64()),
                "rows_in": pa.array([], pa.int64()),
                "rows_out": pa.array([], pa.int64()),
                "wall_sec": pa.array([], pa.float64()),
                "sha256": pa.array([], pa.string()),
                "finished_at": pa.array([], pa.string()),
            }
        )
    return pa.Table.from_pylist(rows)
