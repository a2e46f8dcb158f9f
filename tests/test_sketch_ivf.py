"""Tests: HLL sketch accuracy + mergeability; IVF ANN recall."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from texel_ray.stages.sketch import HyperLogLog, hll_merge_estimate, hll_partials
from texel_ray.stages.similarity import (
    BruteForceTopK,
    IVFIndexer,
    IVFTopK,
    normalize_rows,
)


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(11)
    values = rng.integers(0, 1 << 62, 200_000, dtype=np.int64)
    true = len(np.unique(values))
    # split into 10 partial sketches, merge
    hlls = []
    for chunk in np.array_split(values, 10):
        h = HyperLogLog(p=12)
        h.add_int64(chunk)
        hlls.append(h)
    merged = hlls[0]
    for h in hlls[1:]:
        merged.merge(h)
    est = merged.estimate()
    assert abs(est - true) / true < 0.05  # p=12 -> ~1.6% std error
    # merge via serialized bytes gives the identical estimate
    h2 = HyperLogLog(p=12)
    for h in hlls:
        h2.merge_bytes(h.to_bytes())
    assert h2.estimate() == est


def test_hll_partials_grouped():
    batch = pa.table(
        {
            "g": pa.array(["a"] * 500 + ["b"] * 500),
            "v": pa.array(list(range(500)) + list(range(100)) * 5, pa.int64()),
        }
    )
    parts = hll_partials(batch, "v", "g")
    est = hll_merge_estimate(
        list(zip(parts["group"].to_pylist(), parts["sketch"].to_pylist()))
    )
    assert abs(est["a"] - 500) / 500 < 0.1
    assert abs(est["b"] - 100) / 100 < 0.1


def test_ivf_recall_vs_bruteforce():
    rng = np.random.default_rng(2)
    n, d = 2000, 32
    emb = rng.standard_normal((n, d))
    ids = np.arange(n, dtype=np.int64)
    table = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(
                [e.astype(np.float32).tolist() for e in emb], pa.list_(pa.float32())
            ),
        }
    )
    centroids = IVFIndexer.train(emb[:512], k=8)
    indexed = IVFIndexer(centroids)(table)
    k = 10
    queries = emb[:5]
    qids = ids[:5]
    ivf = IVFTopK(centroids, queries, qids, k=k, nprobe=4)
    cand = ivf(indexed).to_pandas()
    mat = normalize_rows(emb)
    recall_total = 0
    for qi in range(5):
        sims = mat @ mat[qi]
        truth = set(np.argsort(-sims, kind="stable")[:k].tolist())
        got = set(
            cand[cand["query_id"] == qi]
            .sort_values(["sim", "vec_id"], ascending=[False, True])
            .head(k)["vec_id"]
            .tolist()
        )
        recall_total += len(truth & got) / k
    # nprobe=4 of 8 lists: high but not perfect recall expected
    assert recall_total / 5 >= 0.6
