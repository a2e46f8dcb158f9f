"""Tests: HLL sketch accuracy + mergeability; IVF ANN recall."""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def test_bloom_filter_no_false_negatives_and_low_fpr():
    from texel_ray.stages.sketch import BloomFilter

    rng = np.random.default_rng(21)
    keys = rng.integers(0, 1 << 62, 20_000, dtype=np.int64)
    bloom = BloomFilter(len(keys), fpr=0.01)
    bloom.add_int64(keys)
    # zero false negatives
    assert bloom.might_contain(keys).all()
    # false-positive rate near the design point
    probe = rng.integers(0, 1 << 62, 50_000, dtype=np.int64)
    probe = probe[~np.isin(probe, keys)]
    fpr = bloom.might_contain(probe).mean()
    assert fpr < 0.03, fpr


def test_tdigest_quantiles_accuracy_and_merge():
    from texel_ray.stages.sketch import TDigest

    rng = np.random.default_rng(22)
    values = rng.normal(10.0, 3.0, 50_000)
    d = TDigest.of(values)
    assert len(d.means) < 600  # actually compressed
    for q in (0.01, 0.5, 0.9, 0.99):
        exact = np.quantile(values, q)
        got = d.quantile(q)
        # rank error: the estimated quantile's true rank stays within 1%
        rank = (values <= got).mean()
        assert abs(rank - q) < 0.01, (q, exact, got, rank)
    # merging chunked digests ~ digest of the whole
    parts = [TDigest.of(c) for c in np.array_split(values, 7)]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    for q in (0.5, 0.99):
        rank = (values <= merged.quantile(q)).mean()
        assert abs(rank - q) < 0.015, (q, rank)


def test_bloom_anti_join_equals_exact(ray_session):
    from texel_ray.pipelines.relational import q_anti_join_bloom, q_anti_join_lineitem

    sf = "/root/testdata/sf0.001"
    exact = q_anti_join_lineitem(sf).to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    bloom = q_anti_join_bloom(sf).to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    pd.testing.assert_frame_equal(exact, bloom)


def test_kmeans_fit_matches_numpy_lloyd(ray_session):
    """Distributed streaming Lloyd == single-process numpy Lloyd with the
    same init: identical assignments/counts and bit-close centroids."""
    import ray.data

    from texel_ray.stages.cluster import kmeans_fit
    from texel_ray.stages.similarity import normalize_rows

    rng = np.random.default_rng(7)
    n, dim, k, iters = 700, 16, 5, 4
    base = normalize_rows(rng.normal(size=(k, dim)))
    m = normalize_rows(
        base[rng.integers(0, k, n)] + 0.15 * rng.normal(size=(n, dim))
    )
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(m), pa.list_(pa.float64(), dim)),
        }
    )
    sample = m[:64]
    cent, stats = kmeans_fit(
        lambda: ray.data.from_arrow(tbl).repartition(4),
        dim=dim,
        k=k,
        iters=iters,
        init_sample=sample,
        seed=42,
    )
    # reference: same init (same rng), plain Lloyd
    ref_rng = np.random.default_rng(42)
    rc = normalize_rows(sample)[ref_rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ rc.T, axis=1)
        new_c = rc.copy()
        for c in range(k):
            mem = m[assign == c]
            if len(mem):
                new_c[c] = mem.sum(axis=0)
        rc = normalize_rows(new_c)
        ref_counts = np.bincount(assign, minlength=k)
    np.testing.assert_allclose(cent, rc, rtol=0, atol=1e-12)
    got_counts = stats.sort_values("cluster")["n"].to_numpy()
    # stats reflect the assignment of the LAST pass (pre-final-update)
    assert got_counts.sum() == n
    np.testing.assert_array_equal(got_counts, ref_counts)


def test_semantic_dedup_finds_planted_pairs(ray_session):
    """Cluster-blocked near-dup recovers planted near-identical pairs."""
    import ray.data

    from texel_ray.stages.cluster import ClusterAssign, kmeans_fit
    from texel_ray.stages.dedup import EmbeddingNearDup
    from texel_ray.stages.similarity import normalize_rows

    rng = np.random.default_rng(9)
    n, dim = 400, 16
    m = normalize_rows(rng.normal(size=(n, dim)))
    # plant three near-identical dup pairs
    for a, b in ((10, 210), (55, 350), (120, 121)):
        m[b] = normalize_rows((m[a] + 0.001 * rng.normal(size=dim))[None])[0]
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m), pa.list_(pa.float64(), dim)),
        }
    )
    factory = lambda: ray.data.from_arrow(tbl).repartition(4)  # noqa: E731
    cent, _ = kmeans_fit(factory, dim=dim, k=6, iters=3, init_sample=m[:64])
    ds = factory().map_batches(
        ClusterAssign,
        fn_constructor_kwargs={"centroids": cent},
        batch_format="pyarrow",
        concurrency=2,
    )
    near_dup = EmbeddingNearDup(threshold=0.98, id_col="vec_id")
    pairs = (
        ds.repartition(6)
        .groupby("cluster")
        .map_groups(lambda g: near_dup(g), batch_format="pandas")
        .to_pandas()
    )
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert {(10, 210), (55, 350), (120, 121)} <= got
    assert not pairs["capped"].any()


def test_pq_topk_recall_vs_bruteforce(ray_session):
    """PQ/ADC top-k recall@10 against the exact cosine top-10 on
    clustered vectors (PQ assumes local structure; pure isotropic noise
    is the worst case and not the target workload)."""
    import ray.data

    from texel_ray.stages.similarity import (
        PQEncoder,
        PQTopK,
        finalize_topk,
        normalize_rows,
    )

    rng = np.random.default_rng(13)
    n, dim = 1500, 32
    base = normalize_rows(rng.normal(size=(12, dim)))
    m = normalize_rows(
        base[rng.integers(0, 12, n)] + 0.25 * rng.normal(size=(n, dim))
    )
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(m), pa.list_(pa.float64(), dim)),
        }
    )
    codebooks = PQEncoder.train(m[:512], m=16, k=64)
    q_idx = np.arange(20)
    ds = ray.data.from_arrow(tbl).repartition(4)
    ds = ds.map_batches(
        PQEncoder,
        fn_constructor_kwargs={"codebooks": codebooks},
        batch_format="pyarrow",
        concurrency=1,
    ).select_columns(["vec_id", "pq_code"])
    ds = ds.map_batches(
        PQTopK,
        fn_constructor_kwargs={
            "codebooks": codebooks,
            "queries": m[q_idx],
            "query_ids": ids[q_idx],
            "k": 10,
        },
        batch_format="pyarrow",
        concurrency=1,
    )
    got = finalize_topk(ds, k=10).to_pandas()
    sims = m @ m[q_idx].T
    recalls = []
    for j, qi in enumerate(q_idx):
        exact = set(np.argsort(-sims[:, j], kind="stable")[:10].tolist())
        approx = set(got[got["query_id"] == qi]["vec_id"].tolist())
        recalls.append(len(exact & approx) / 10)
    assert np.mean(recalls) >= 0.6, np.mean(recalls)


def test_count_min_never_undercounts():
    import numpy as np

    from texel_ray.stages.sketch import CountMinSketch

    rng = np.random.default_rng(13)
    toks = np.array([f"tok{i:04d}" for i in range(3000)], dtype=object)
    counts = rng.integers(1, 50, len(toks))
    cms = CountMinSketch(width=1024, depth=4)  # deliberately tight
    h = CountMinSketch.hash_tokens(toks)
    cms.add(h, counts)
    est = cms.estimate(h)
    assert np.all(est >= counts)  # the property heavy_hitters relies on
    # merge = sum
    cms2 = CountMinSketch.from_bytes(cms.to_bytes(), width=1024, depth=4)
    cms2.merge(cms)
    assert np.array_equal(cms2.estimate(h), est * 0 + cms2.estimate(h))
    assert np.all(cms2.estimate(h) >= 2 * counts)


def test_heavy_hitters_exact_on_planted(ray_session):
    """CMS prefilter + exact confirm returns exactly the tokens with
    true count >= threshold."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from texel_ray.pipelines import mlprep
    from texel_ray.stages.agg import partial_sum_groupby  # noqa: F401

    # plant a corpus: 3 heavy tokens, long tail of light ones
    rows = (
        ["heavy_a word"] * 120
        + ["heavy_b filler"] * 101
        + ["heavy_c x"] * 100
        + [f"light_{i} y" for i in range(99)]
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    pa.parquet.write_table(
        pa.table({"doc_id": pa.array(range(len(rows))), "text": pa.array(rows)}),
        os.path.join(d, "documents.parquet"),
    )
    out = mlprep.q_heavy_hitters(d, threshold=100).to_pandas()
    got = dict(zip(out["token"], out["n"]))
    # exact expectation
    toks = pd.Series(" ".join(rows).split()).value_counts()
    want = {t: int(n) for t, n in toks.items() if n >= 100}
    assert got == want
