"""Distributed k-means (spherical / cosine Lloyd) over an embedding
column, plus SemDeDup-style semantic dedup (cluster -> within-cluster
near-dup pairs).

Each Lloyd iteration is ONE streaming pass, no shuffle: ``map_batches``
scores batches against the broadcast centroids and emits DATA-KEYED
partial sums (``chunk = id // chunk_rows`` -> per-(chunk, cluster) sum
vector + count). The partials are cluster-count-sized (k x chunks
rows), so the driver collects them, sorts by (cluster, chunk) and
reduces in that fixed order — float sums come out bit-identical
whatever the task scheduling, which is what lets a golden oracle pin
the result. Updated centroids broadcast into the next pass.

At 100 TB the same loop holds: the per-pass exchange is only the
partials (k x chunks skinny rows — collect or tree-reduce), the
vectors themselves never move, and each pass streams with backpressure.

Reference has no clustering; this is the cluster-then-dedup shape of
SemDeDup (Abbas et al., 2023) built from published k-means.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .similarity import _stack_embeddings, normalize_rows


class KMeansPartials:
    """One Lloyd pass's map stage: assign rows to the nearest (max
    cosine) broadcast centroid and emit per-(chunk, cluster) partial
    sums. Ships to TASKS (centroids are small; no actor spin-up)."""

    def __init__(
        self,
        centroids: np.ndarray,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        chunk_rows: int = 4096,
    ):
        self.cT = normalize_rows(np.asarray(centroids, dtype=np.float64)).T
        self.vec_col = vec_col
        self.id_col = id_col
        self.chunk_rows = chunk_rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        k, dim = self.cT.shape[1], self.cT.shape[0]
        if batch.num_rows == 0:
            return pa.table(
                {
                    "chunk": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int32()),
                    "n": pa.array([], pa.int64()),
                    "sim_sum": pa.array([], pa.float64()),
                    "vec_sum": pa.array(
                        [], pa.list_(pa.float64(), dim)
                    ),
                }
            )
        m = normalize_rows(_stack_embeddings(batch[self.vec_col], dim=dim))
        sims = m @ self.cT
        assign = np.argmax(sims, axis=1).astype(np.int64)
        best = sims[np.arange(len(assign)), assign]
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        chunk = (ids // self.chunk_rows).astype(np.int64)
        # reduce within the batch in (chunk, cluster, id) order so the
        # partial itself is deterministic
        key = chunk * k + assign
        order = np.lexsort((ids, key))
        key_s, m_s, best_s = key[order], m[order], best[order]
        bnd = np.nonzero(np.diff(key_s))[0] + 1
        starts = np.concatenate(([0], bnd))
        sums = np.add.reduceat(m_s, starts, axis=0)
        sim_sums = np.add.reduceat(best_s, starts)
        counts = np.diff(np.concatenate((starts, [len(key_s)])))
        uk = key_s[starts]
        return pa.table(
            {
                "chunk": pa.array(uk // k),
                "cluster": pa.array((uk % k).astype(np.int32)),
                "n": pa.array(counts.astype(np.int64)),
                "sim_sum": pa.array(sim_sums),
                "vec_sum": pa.array(
                    list(sums), pa.list_(pa.float64(), sums.shape[1])
                ),
            }
        )


def kmeans_fit(
    ds_factory,
    dim: int,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    init_sample: np.ndarray | None = None,
):
    """Fit spherical k-means with `iters` streaming Lloyd passes.

    ``init_sample`` is a small driver-side matrix for deterministic
    initialization (hash-spread rows, as in IVF training); when None the
    caller must have embedded the sample choice elsewhere. Returns
    (centroids, stats_df) where stats_df has one row per cluster:
    (cluster, n, sim_sum) from the LAST pass.
    """
    rng = np.random.default_rng(seed)
    sample = normalize_rows(np.asarray(init_sample, dtype=np.float64))
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    stats = None
    for _ in range(iters):
        part = KMeansPartials(centroids, vec_col=vec_col, id_col=id_col)
        pf = (
            ds_factory()
            .map_batches(
                lambda b, part=part: part(b),
                batch_format="pyarrow",
                batch_size=4096,
            )
            .to_pandas()
        )
        # deterministic driver reduce: fixed (cluster, chunk) order
        pf = pf.sort_values(["cluster", "chunk"]).reset_index(drop=True)
        vs = np.stack(pf["vec_sum"].to_numpy()) if len(pf) else np.zeros((0, dim))
        new_c = centroids.copy()
        stats_rows = []
        for c in range(k):
            mask = (pf["cluster"] == c).to_numpy()
            n_c = int(pf["n"][mask].sum())
            if n_c:
                s = vs[mask].sum(axis=0)  # rows already in chunk order
                new_c[c] = s
            stats_rows.append(
                (c, n_c, float(pf["sim_sum"][mask].sum()) if n_c else 0.0)
            )
        centroids = normalize_rows(new_c)
        stats = pd.DataFrame(stats_rows, columns=["cluster", "n", "sim_sum"])
    return centroids, stats


class ClusterAssign:
    """Append the fitted cluster id (max-cosine centroid) to each row."""

    def __init__(self, centroids, vec_col: str = "embedding"):
        self.cT = normalize_rows(np.asarray(centroids, dtype=np.float64)).T
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("cluster", pa.array([], pa.int32()))
        m = normalize_rows(
            _stack_embeddings(batch[self.vec_col], dim=self.cT.shape[0])
        )
        assign = np.argmax(m @ self.cT, axis=1).astype(np.int32)
        return batch.append_column("cluster", pa.array(assign))
