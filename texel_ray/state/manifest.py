"""Per-partition lineage manifest -> resumable partitioned output.

The north rule: every partition emits lineage records (input fragments,
key ranges, row counts) to a checkpoint manifest so a killed job resumes
tile-by-tile without recomputation.

Layout: ``out_dir/<key>=<value>/part-*.parquet`` (hive partitioning, one
directory per partition key — idempotent overwrite per partition) plus
``out_dir/_manifest.jsonl`` with one JSON record per COMPLETED partition:

    {"key": {"tm_id": 8}, "rows": 1234, "inputs": [...], "ts": ...}

``resumable_write`` computes the pending partition set (all keys minus
manifest keys), filters the pipeline to pending partitions only — pruned
at the READ when the partition column is a parquet partition/row-group
column — writes them, then appends their manifest records. Records are
appended only after the partition's files are fully written, so a crash
mid-partition re-does just that partition.
"""

from __future__ import annotations

import json
import os
import pathlib
import time


def _key_str(key: dict) -> str:
    return json.dumps(key, sort_keys=True)


class Manifest:
    def __init__(self, out_dir: str):
        self.dir = pathlib.Path(out_dir)
        self.path = self.dir / "_manifest.jsonl"

    def completed(self) -> dict[str, dict]:
        done = {}
        if self.path.exists():
            for line in self.path.read_text().splitlines():
                if not line.strip():
                    continue
                rec = json.loads(line)
                done[_key_str(rec["key"])] = rec
        return done

    def record(self, key: dict, rows: int, inputs: list[str] | None = None, **extra):
        self.dir.mkdir(parents=True, exist_ok=True)
        rec = {
            "key": key,
            "rows": rows,
            "inputs": inputs or [],
            "ts": time.time(),
            **extra,
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")
        return rec


def resumable_write(
    ds,
    out_dir: str,
    partition_col: str = "tm_id",
    inputs: list[str] | None = None,
):
    """Write ``ds`` hive-partitioned by ``partition_col``, skipping
    partitions already in the manifest. Returns (written_keys, skipped_keys).

    The partition-key discovery groupby is tiny (distinct keys); the
    filter happens before the write so skipped partitions cost nothing
    downstream. Call again after a crash to finish only what's missing.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    manifest = Manifest(out_dir)
    done = manifest.completed()

    # pin the pipeline output once: the key-count pass and the filtered
    # write below would otherwise each re-execute the whole upstream
    # chain (the dominant cost for compute-heavy pipelines like snap).
    # At larger-than-memory scale, replace with a counters side-channel.
    ds = ds.materialize()

    counts = {
        row[partition_col]: row["n"]
        for row in ds.groupby(partition_col)
        .aggregate(Count(alias_name="n"))
        .take_all()
    }
    pending = [k for k in counts if _key_str({partition_col: k}) not in done]
    skipped = [k for k in counts if _key_str({partition_col: k}) in done]
    if not pending:
        return [], skipped

    # idempotent overwrite: a crash mid-partition leaves files but no
    # manifest record; clear those partition dirs so the rerun replaces
    # them instead of appending duplicate part files
    import shutil

    for k in pending:
        shutil.rmtree(
            pathlib.Path(out_dir) / f"{partition_col}={k}", ignore_errors=True
        )

    value_set = pa_value_set(set(pending))
    filtered = ds.map_batches(  # vectorized partition filter
        lambda b: b.filter(pc.is_in(b[partition_col], value_set)),
        batch_format="pyarrow",
    )
    filtered.write_parquet(out_dir, partition_cols=[partition_col])
    for k in sorted(pending, key=str):
        manifest.record({partition_col: k}, rows=int(counts[k]), inputs=inputs)
    return pending, skipped


def pa_value_set(values):
    import pyarrow as pa

    return pa.array(list(values))
