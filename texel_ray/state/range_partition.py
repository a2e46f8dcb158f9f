"""Range partitioner: sketch -> boundaries -> assign -> partitioned write.

The classic range-partitioned (globally range-clustered) output a
100 TB pipeline needs for sorted sinks and merge-friendly downstream
reads: boundary values come from a t-digest sketch of the sort column
(mergeable per-batch partials — ONE cheap streaming pass, no sort
shuffle), every row maps to its partition with a searchsorted against
the broadcast boundaries, and the write reuses ``resumable_write``
(hive dirs + manifest lineage + crash-safe resume). Partition dirs are
non-overlapping key ranges in order, so reading ``part=0..n-1`` in
sequence yields a globally range-clustered dataset; sort within each
partition at read time if a total order is needed.

Determinism: digest partials are DATA-KEYED (id // 4096) and merged in
sorted chunk order, so the fitted boundaries — and therefore the whole
output layout — are identical under any task scheduling (same
convention as quantiles_quality).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.sketch import TDigest


def fit_range_boundaries(
    ds,
    col: str,
    n_parts: int,
    id_col: str,
    chunk_rows: int = 4096,
) -> np.ndarray:
    """One streaming pass -> (n_parts - 1) interior boundary values at the
    i/n_parts quantiles of the merged t-digest."""
    import pandas as pd

    def add_chunk(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return b.append_column(
            "chunk", pa.array((ids // chunk_rows).astype(np.int64))
        )

    # exactly ONE digest per chunk (groupby, not per-batch): a chunk that
    # straddles a batch boundary would otherwise yield two partials whose
    # merge order is task-arrival order — nondeterministic boundaries
    def digest_of_chunk(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[col].to_numpy().astype(np.float64))  # id-order free
        m, w = TDigest.of(v).to_arrays()
        return pd.DataFrame(
            {
                "chunk": [int(g["chunk"].iloc[0])],
                "means": [m.tolist()],
                "weights": [w.tolist()],
            }
        )

    pf = (
        ds.map_batches(add_chunk, batch_format="pyarrow")
        .groupby("chunk")
        .map_groups(digest_of_chunk, batch_format="pandas")
        .to_pandas()
    )
    pf = pf.sort_values("chunk").reset_index(drop=True)  # fixed merge order
    merged = None
    for m, w in zip(pf["means"], pf["weights"]):
        d = TDigest(means=np.asarray(m), weights=np.asarray(w))
        merged = d if merged is None else merged.merge(d)
    if merged is None:
        return np.array([], dtype=np.float64)
    qs = np.arange(1, n_parts) / n_parts
    return np.array([merged.quantile(float(q)) for q in qs])


def range_partition_write(
    ds_factory,
    col: str,
    out_dir: str,
    n_parts: int = 8,
    id_col: str = "o_orderkey",
    inputs: list[str] | None = None,
):
    """Fit boundaries (pass 1), assign + hive-write by part id (pass 2,
    via resumable_write: manifest lineage, completed parts skipped on
    rerun). Returns (boundaries, written_keys, skipped_keys)."""
    from .manifest import resumable_write

    bounds = fit_range_boundaries(ds_factory(), col, n_parts, id_col=id_col)

    def assign(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        part = np.searchsorted(bounds, v, side="right").astype(np.int64)
        return b.append_column("part", pa.array(part))

    ds = ds_factory().map_batches(assign, batch_format="pyarrow")
    written, skipped = resumable_write(
        ds, out_dir, partition_col="part", inputs=inputs
    )
    return bounds, written, skipped
