"""Distributed connected components over a pair Dataset (hash-to-min).

The cluster-scale form of the near-dup "pairs -> transitive groups"
step: when the verified pair list outgrows the driver (10^12-row corpora
with high dup rates), labels converge IN the dataset:

- a shuffle-free LOCAL pass first collapses every edge block to star
  rows (vertex -> block-local component rep, vectorized numpy
  min-propagation) — connectivity across blocks is preserved because a
  vertex shared by two blocks links both blocks' stars;
- then the hash-to-min scheme (Rastogi et al., "Finding Connected
  Components in Map-Reduce in Logarithmic Rounds"): each vertex v keeps
  a cluster-set C(v) as rows (key=v, member); per round, with
  m = min(C(v) ∪ {v}), v sends its WHOLE set to m and sends {m} to
  every member (plus a keep-alive (v, m) so keys never vanish). The
  min acts as a hub, so reach grows geometrically — O(log diameter)
  rounds (one-hop label propagation and even label pointer-doubling
  measure ~d rounds on random-id graphs; hash-to-min measures ~log d).
- the round map is deterministic, so the state hash (row count + sum of
  a 64-bit pair mix) repeating between rounds IS convergence; at the
  fixpoint C(v) = {component min} for every non-min v.

Every exchange carries only (int64, int64) rows — vertex/edge
dimension, never corpus rows; intermediate volume is the paper's
O(n log n) bound and final volume is 2x the sum of component sizes.
The driver union-find stays the small-N fast path in
pipelines/mlprep.q_dedup_clusters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)


def _state_hash(b: pa.Table) -> pa.Table:
    """Per-batch (row count, sum of pair mix) — order-independent state
    fingerprint for the convergence check."""
    k = b["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    m = b["member"].to_numpy(zero_copy_only=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = int((k * _MIX_A ^ m * _MIX_B).sum(dtype=np.uint64))
    return pa.table(
        {"n": pa.array([len(k)], pa.int64()), "h": pa.array([h], pa.uint64())}
    )


def connected_components(
    pairs_ds,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    num_partitions: int = 8,
):
    """Pair Dataset -> Dataset (id, rep) with rep = min id reachable.

    Only vertices that appear in some pair are emitted (isolated rows
    are their own trivial component, same convention as the driver
    union-find path)."""
    import ray.data

    def to_star_rows(b: pa.Table) -> pa.Table:
        """Collapse one edge block to (vertex, block-local rep) cluster
        rows, both directions. Pure numpy min-propagation with pointer
        doubling over index arrays — no Python per-edge loop."""
        a = b[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        ids, inv = np.unique(np.concatenate([a, c]), return_inverse=True)
        ea, eb = inv[: len(a)], inv[len(a) :]
        lbl = np.arange(len(ids))
        while True:
            m = lbl.copy()
            np.minimum.at(m, ea, lbl[eb])
            np.minimum.at(m, eb, lbl[ea])
            m = m[m]
            if np.array_equal(m, lbl):
                break
            lbl = m
        rep = ids[lbl]  # ids ascending => min index == min id
        return pa.table(
            {
                "key": pa.array(np.concatenate([ids, rep])),
                "member": pa.array(np.concatenate([rep, ids])),
            }
        )

    rows = pairs_ds.map_batches(to_star_rows, batch_format="pyarrow").materialize()
    n_rows = rows.count()
    if n_rows == 0:
        return ray.data.from_arrow(
            pa.table(
                {"id": pa.array([], pa.int64()), "rep": pa.array([], pa.int64())}
            )
        )
    # shuffle width scales with the (contracted) row volume — tiny
    # graphs don't pay for 8 aggregator actors per join per round
    num_partitions = max(2, min(num_partitions, n_rows // 100_000 + 1))

    def emit(b: pa.Table) -> pa.Table:
        """One hash-to-min round for the joined rows (key, member, m):
        (m, member) — the min hub collects the set;
        (member, m) — every member learns the min;
        (key, m)    — keep-alive so keys never vanish."""
        k = b["key"].to_numpy(zero_copy_only=False)
        mem = b["member"].to_numpy(zero_copy_only=False)
        mn = b["m"].to_numpy(zero_copy_only=False)
        out_k = np.concatenate([mn, mem, k])
        out_m = np.concatenate([mem, mn, mn])
        u = np.unique(np.stack([out_k, out_m], axis=1), axis=0)
        return pa.table({"key": pa.array(u[:, 0]), "member": pa.array(u[:, 1])})

    def _mins(rows_ds):
        """m(v) = min(member ∪ {v}) per key, as (key, m)."""
        out = rows_ds.groupby("key").min("member")

        def with_key(b: pa.Table) -> pa.Table:
            b = b.rename_columns(["key", "mn"])
            k = b["key"].to_numpy(zero_copy_only=False)
            mn = np.minimum(k, b["mn"].to_numpy(zero_copy_only=False))
            return pa.table({"key": pa.array(k), "m": pa.array(mn)})

        return out.map_batches(with_key, batch_format="pyarrow")

    def _fingerprint(rows_ds):
        t = rows_ds.map_batches(_state_hash, batch_format="pyarrow").to_pandas()
        h = t["h"].to_numpy().astype(np.uint64).sum(dtype=np.uint64)
        return (int(t["n"].sum()), int(h))

    prev_fp = _fingerprint(rows)
    for _ in range(max_iters):
        mins = _mins(rows)
        joined = rows.join(
            mins,
            join_type="inner",
            num_partitions=num_partitions,
            on=("key",),
        )
        rows = joined.map_batches(emit, batch_format="pyarrow").materialize()
        fp = _fingerprint(rows)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(hash-to-min needs ~log2(diameter) rounds; this should be "
            "unreachable for any real graph)"
        )

    return _mins(rows).map_batches(
        lambda b: pa.table({"id": b["key"], "rep": b["m"]}),
        batch_format="pyarrow",
    )
