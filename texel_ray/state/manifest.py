"""Per-partition lineage manifest -> resumable partitioned output.

The north rule: every partition emits lineage records (input fragments,
key ranges, row counts) to a checkpoint manifest so a killed job resumes
tile-by-tile without recomputation.

Layout: ``out_dir/<key>=<value>/part-*.parquet`` (hive partitioning, one
directory per partition key — idempotent overwrite per partition) plus
``out_dir/_manifest.jsonl`` with one JSON record per COMPLETED partition:

    {"key": {"tm_id": 8}, "rows": 1234, "inputs": [...], "ts": ...}

``resumable_write`` streams the pipeline ONCE into a partitioned write,
dropping already-completed partitions with a broadcast filter built from
the manifest (never a discovery pass or a materialize), then records each
new partition's row count from its parquet footers (a metadata-only
counters side-channel). Records land only after the partition's files are
fully written, so a crash mid-partition re-does just that partition.
"""

from __future__ import annotations

import json
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


def _parse_partition_value(s: str):
    """Hive dir-name string -> the partition value (int/float/str)."""
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            continue
    return s


def resumable_write(
    ds,
    out_dir: str,
    partition_col: str = "tm_id",
    inputs: list[str] | None = None,
    range_cols: tuple[str, ...] = ("tile_x", "tile_y"),
):
    """Write ``ds`` hive-partitioned by ``partition_col``, skipping
    partitions already in the manifest. Returns (written_keys, skipped_keys).

    SINGLE streaming pass — the pipeline executes exactly once, never
    materialized: completed partitions are dropped by a vectorized
    broadcast filter (the done-key set comes from the manifest, not from a
    discovery pass over the data), the rest streams straight into the
    partitioned write. Row counts come from a counters side-channel — the
    parquet footers of the files each write task produced (metadata-only
    reads, no data pass). Manifest records are appended only after the
    partition's files are fully on disk, so a crash mid-partition re-does
    just that partition; partition dirs WITHOUT a manifest record (crash
    leftovers) are cleared up front so the rerun replaces them.
    """
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    manifest = Manifest(out_dir)
    done = manifest.completed()
    done_values = [json.loads(k)[partition_col] for k in done]
    skipped = sorted(done_values, key=str)

    out_path = pathlib.Path(out_dir)
    # idempotent overwrite: clear crash leftovers (dirs with no record)
    for p in out_path.glob(f"{partition_col}=*"):
        val = _parse_partition_value(p.name.split("=", 1)[1])
        if _key_str({partition_col: val}) not in done:
            shutil.rmtree(p, ignore_errors=True)

    if done_values:
        def drop_done(b: pa.Table) -> pa.Table:
            value_set = pa.array(done_values).cast(b[partition_col].type)
            return b.filter(
                pc.invert(pc.is_in(b[partition_col], value_set=value_set))
            )

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=[partition_col])

    # counters side-channel: per-partition row counts + key (cell) ranges
    # from parquet footers — column statistics are in the metadata, so the
    # full lineage record (inputs, cell ranges, row counts) costs zero
    # data reads
    written = []
    for p in sorted(out_path.glob(f"{partition_col}=*")):
        val = _parse_partition_value(p.name.split("=", 1)[1])
        if _key_str({partition_col: val}) in done:
            continue
        rows = 0
        nbytes = 0
        n_files = 0
        ranges: dict[str, list] = {}
        for f in p.glob("*.parquet"):
            md = pq.read_metadata(f)
            rows += md.num_rows
            nbytes += f.stat().st_size
            n_files += 1
            schema_names = md.schema.to_arrow_schema().names
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name not in range_cols or name not in schema_names:
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        continue
                    cur = ranges.get(name)
                    if cur is None:
                        ranges[name] = [st.min, st.max]
                    else:
                        cur[0] = min(cur[0], st.min)
                        cur[1] = max(cur[1], st.max)
        manifest.record(
            {partition_col: val},
            rows=rows,
            inputs=inputs,
            ranges={k: list(v) for k, v in ranges.items()},
            metrics={"bytes": nbytes, "n_files": n_files},
        )
        written.append(val)
    return written, skipped
