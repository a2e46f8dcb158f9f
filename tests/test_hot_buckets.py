"""Exact hot-bucket kernels: recall must NOT be truncated at any bucket
size. ``hamming_pairs_exact`` (pigeonhole recursion over distinct
signatures + clique expansion) and ``_tiled_cosine_pairs`` are checked
against brute force on populations engineered to blow past the old caps:
perturbed clusters, a 300-member identical-signature clique, and random
background. Pure numpy — no Ray needed."""

import numpy as np
import pandas as pd
import pytest

from texel_ray.stages.dedup import (
    _tiled_cosine_pairs,
    bucket_pairs,
    grouped_hamming_pairs,
    hamming_pairs_exact,
    popcount64_np,
    simhash_bucket_pairs,
)


@pytest.fixture(scope="module")
def sig_population():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 1 << 63, 200, dtype=np.uint64)
    clust = []
    for _ in range(10):
        seed = rng.integers(0, 1 << 63, dtype=np.uint64)
        for _ in range(30):
            s = np.uint64(seed)
            for b in rng.choice(64, rng.integers(0, 4), replace=False):
                s ^= np.uint64(1) << np.uint64(b)
            clust.append(s)
    clique = np.full(
        300, rng.integers(0, 1 << 63, dtype=np.uint64), dtype=np.uint64
    )
    sig = np.concatenate([base, np.array(clust, dtype=np.uint64), clique])
    return sig[rng.permutation(len(sig))]


def _brute(sig, mh):
    ia, ib = np.triu_indices(len(sig), k=1)
    d = popcount64_np(sig[ia] ^ sig[ib])
    keep = d <= mh
    return set(zip(ia[keep].tolist(), ib[keep].tolist()))


@pytest.mark.parametrize("mh", [0, 1, 3])
def test_hamming_pairs_exact_matches_brute(sig_population, mh):
    sig = sig_population
    ia, ib, d = hamming_pairs_exact(sig, mh, leaf=64)
    got = set(zip(np.minimum(ia, ib).tolist(), np.maximum(ia, ib).tolist()))
    assert got == _brute(sig, mh)
    assert (popcount64_np(sig[ia] ^ sig[ib]) == d).all()


def test_simhash_bucket_pairs_hot_equals_uncapped(sig_population):
    sig = sig_population
    g = pd.DataFrame(
        {
            "doc_id": np.arange(len(sig)),
            "simhash": (sig - np.uint64(1 << 63)).astype(np.int64),
        }
    )
    hot = simhash_bucket_pairs(g, max_hamming=3, cap=50)
    ref = simhash_bucket_pairs(g, max_hamming=3, cap=10**9)
    assert set(zip(hot.id_a, hot.id_b)) == set(zip(ref.id_a, ref.id_b))
    assert not hot.capped.any()
    assert (hot.id_a < hot.id_b).all()


def test_grouped_hamming_pairs_hot_and_cold_groups(sig_population):
    sig = sig_population.astype(np.int64)
    key = np.concatenate(
        [np.zeros(700, dtype=np.int64), 1 + np.arange(len(sig) - 700) // 5]
    )
    ids = np.array([f"im{i:05d}" for i in range(len(sig))], dtype=object)
    hot = grouped_hamming_pairs(key, ids, sig, max_hamming=3, cap=50)
    ref = grouped_hamming_pairs(key, ids, sig, max_hamming=3, cap=10**9)
    assert set(zip(hot.id_a, hot.id_b)) == set(zip(ref.id_a, ref.id_b))
    assert not hot.capped.any()
    assert (hot.id_a < hot.id_b).all()


def test_bucket_pairs_full_enumeration():
    bp = bucket_pairs(pd.DataFrame({"doc_id": np.arange(130)}))
    assert len(bp) == 130 * 129 // 2
    assert not bp.capped.any()
    assert (bp.id_a < bp.id_b).all()
    assert len(bp[["id_a", "id_b"]].drop_duplicates()) == len(bp)


def test_embedding_neardup_exact_mode_full_recall():
    # a 2000-row bucket (over the 1024 cap): exact mode must enumerate
    # every qualifying pair; sampled mode truncates WITH the capped flag.
    from texel_ray.stages.dedup import EmbeddingNearDup

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 8))
    vecs = np.repeat(base, 50, axis=0) + rng.normal(scale=1e-4, size=(2000, 8))
    df = pd.DataFrame(
        {"vec_id": np.arange(2000), "embedding": list(vecs)}
    )
    exact = EmbeddingNearDup(threshold=0.999, exact=True)(df)
    sampled = EmbeddingNearDup(threshold=0.999, exact=False)(df)
    mn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ia, ib = np.triu_indices(2000, k=1)
    # dense brute uses matmul — the same float path as the kernels
    sims = mn @ mn.T
    want = int((sims[ia, ib] >= 0.999).sum())
    assert len(exact) == want
    assert not exact.capped.any()
    assert len(sampled) < want and sampled.capped.all()


def test_tiled_cosine_matches_dense():
    rng = np.random.default_rng(11)
    m = rng.normal(size=(900, 16))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    ia, ib, cos = _tiled_cosine_pairs(m, 0.5, tile=100)
    sims = m @ m.T
    ja, jb = np.triu_indices(900, k=1)
    keep = sims[ja, jb] >= 0.5
    assert set(zip(ia.tolist(), ib.tolist())) == set(
        zip(ja[keep].tolist(), jb[keep].tolist())
    )
    assert np.allclose(np.sort(cos), np.sort(sims[ja, jb][keep]))


def test_identical_clique_is_output_dimensional():
    # 5000 distinct seeds sampled into 20k members: the old cap would
    # have dropped all but 50; the exact kernel resolves it fast.
    rng = np.random.default_rng(3)
    seeds = rng.integers(0, 1 << 63, 5000, dtype=np.uint64)
    big = seeds[rng.integers(0, 5000, 20000)]
    ia, ib, d = hamming_pairs_exact(big, 0)
    # distance-0 pairs = sum over duplicate classes of C(n,2)
    _, counts = np.unique(big, return_counts=True)
    assert len(ia) == int((counts * (counts - 1) // 2).sum())
    assert (d == 0).all()


def test_matrix_hamming_pairs_exact_matches_brute():
    # the string-record-linkage hot-bucket kernel: byte rows with a
    # shared prefix half (every row lands in one slice bucket)
    from texel_ray.stages.dedup import matrix_hamming_pairs_exact

    rng = np.random.default_rng(3)
    base = rng.integers(48, 58, size=(40, 18), dtype=np.uint8)
    rows = base[rng.integers(0, 40, 1200)].copy()
    flip = rng.integers(0, 18, 1200)
    vals = rng.integers(48, 58, 1200, dtype=np.uint8)
    sel = rng.random(1200) < 0.5
    rows[np.arange(1200)[sel], flip[sel]] = vals[sel]
    rows[:, :9] = ord("C")
    for md in (0, 1, 2):
        ia, ib, d = matrix_hamming_pairs_exact(rows, md, leaf=64)
        ja, jb = np.triu_indices(len(rows), k=1)
        bd = (rows[ja] != rows[jb]).sum(axis=1)
        want = set(zip(ja[bd <= md].tolist(), jb[bd <= md].tolist()))
        got = set(
            zip(np.minimum(ia, ib).tolist(), np.maximum(ia, ib).tolist())
        )
        assert got == want, (md, len(got), len(want))
        assert ((rows[ia] != rows[ib]).sum(axis=1) == d).all()
