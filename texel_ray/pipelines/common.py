"""Shared pipeline helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def read_table(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def hot_bucket_survivors(banded, key_cols: list[str], coalesce: int = 8):
    """LSH candidate generation: count (band, hash) buckets vectorized,
    keep only buckets holding >= 2 rows (a tiny set), and return the rows
    of those hot buckets as a pandas frame. `banded` should be
    materialized by the caller (it is consumed twice)."""
    from ..stages.agg import partial_count_groupby

    counts = partial_count_groupby(banded, key_cols, alias="n", coalesce=coalesce)
    hot = counts.map_batches(
        lambda b: b.filter(pa.compute.greater_equal(b["n"], 2)),
        batch_format="pyarrow",
    ).to_pandas()
    hot_keys = set(zip(*(hot[c].to_numpy() for c in key_cols)))

    def in_hot(batch: pa.Table) -> pa.Table:
        arrays = [batch[c].to_numpy() for c in key_cols]
        mask = np.fromiter(
            (tuple(int(a[i]) for a in arrays) in hot_keys for i in range(len(arrays[0]))),
            dtype=bool,
            count=len(arrays[0]),
        )
        return batch.filter(pa.array(mask))

    return banded.map_batches(in_hot, batch_format="pyarrow").to_pandas()
