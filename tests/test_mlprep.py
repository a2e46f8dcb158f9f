"""Operator tests: dedup family (planted near-duplicates), similarity
search vs a numpy reference, text features, windows."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from texel_ray.stages.dedup import (
    EmbeddingNearDup,
    JaccardVerifier,
    MinHasher,
    SimHasher,
    bucket_pairs,
    hamming64,
    jaccard,
    shingle_set,
    simhash64,
)
from texel_ray.stages.similarity import (
    BruteForceTopK,
    LSHBucketer,
    _stack_embeddings,
    normalize_rows,
)
from texel_ray.stages.text import TextFeatures, fingerprint64


def _docs_with_neardups() -> pa.Table:
    rng = np.random.default_rng(0)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    texts = []
    for i in range(40):
        texts.append(" ".join(rng.choice(vocab, size=60)))
    # plant near-duplicates: copy with 2 token edits (high jaccard)
    for src in (3, 17, 25):
        toks = texts[src].split()
        toks[5] = "MUTATED"
        toks[30] = "CHANGED"
        texts.append(" ".join(toks))
    ids = list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


def test_minhash_lsh_finds_planted_neardups():
    docs = _docs_with_neardups()
    hasher = MinHasher(num_perm=128, bands=32)
    banded = hasher(docs)
    # group in-process (mirrors groupby(band_id, band_hash).map_groups)
    df = banded.to_pandas()
    pairs = (
        df.groupby(["band_id", "band_hash"])
        .apply(lambda g: bucket_pairs(g), include_groups=False)
        .reset_index(drop=True)
    )
    pairs = pairs.drop_duplicates(["id_a", "id_b"]) if len(pairs) else pairs
    texts_by_id = dict(
        zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    )
    verifier = JaccardVerifier(texts_by_id, threshold=0.8)
    verified = verifier(pa.Table.from_pandas(pairs[["id_a", "id_b"]]))
    got = set(zip(verified["id_a"].to_pylist(), verified["id_b"].to_pylist()))
    assert {(3, 40), (17, 41), (25, 42)} <= got
    # no false positives below threshold survive verification
    for a, b in got:
        assert jaccard(shingle_set(texts_by_id[a]), shingle_set(texts_by_id[b])) >= 0.8


def test_simhash_neardup_detects_small_edits():
    docs = _docs_with_neardups()
    texts = docs["text"].to_pylist()
    h_orig = simhash64(texts[3].split())
    h_dup = simhash64(texts[40].split())
    h_other = simhash64(texts[4].split())
    assert hamming64(h_orig, h_dup) < hamming64(h_orig, h_other)
    # banded blocking emits 4 rows per doc
    banded = SimHasher()(docs)
    assert banded.num_rows == docs.num_rows * 4


def test_bruteforce_topk_matches_numpy_reference():
    rng = np.random.default_rng(5)
    n, d = 500, 32
    emb = rng.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    table = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        }
    )
    k = 10
    stage = BruteForceTopK(queries=emb[:3].astype(np.float64), query_ids=ids[:3], k=k)
    # run over two batches, then take global top-k per query
    out1 = stage(table.slice(0, 250)).to_pandas()
    out2 = stage(table.slice(250)).to_pandas()
    cand = pd.concat([out1, out2])
    mat = normalize_rows(emb.astype(np.float64))
    for qi in range(3):
        sims = mat @ mat[qi]
        expect = np.argsort(-sims, kind="stable")[:k]
        got = (
            cand[cand["query_id"] == qi]
            .sort_values(["sim", "vec_id"], ascending=[False, True])
            .head(k)["vec_id"]
            .to_numpy()
        )
        assert set(got) == set(expect)


def test_embedding_neardup_finds_planted_duplicate():
    rng = np.random.default_rng(9)
    emb = rng.standard_normal((50, 16))
    emb[20] = emb[7] + rng.standard_normal(16) * 0.01  # near-identical pair
    df = pd.DataFrame({"vec_id": np.arange(50, dtype=np.int64)})
    df["embedding"] = list(emb)
    out = EmbeddingNearDup(threshold=0.98)(df)
    assert (7, 20) in set(zip(out["id_a"], out["id_b"]))
    # bucketer puts the near-identical pair in the same bucket
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(50, dtype=np.int64)),
            "embedding": pa.array(list(emb.astype(np.float32)), pa.list_(pa.float32())),
        }
    )
    b = LSHBucketer(dim=16, bits=8)(table)
    buckets = b["bucket"].to_numpy()
    assert buckets[7] == buckets[20]


def test_stack_embeddings_shape():
    t = pa.table(
        {"embedding": pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float32()))}
    )
    m = _stack_embeddings(t["embedding"])
    assert m.shape == (2, 2) and m.dtype == np.float64


def test_text_features_and_fingerprint_deterministic():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["the cat and the hat", ""]),
        }
    )
    out = TextFeatures()(t)
    assert out["n_tokens"].to_pylist() == [5, 0]
    assert out["stop_hits"].to_pylist() == [3, 0]  # the, and, the
    assert fingerprint64("abc") == fingerprint64("abc")
    assert fingerprint64("abc") != fingerprint64("abd")


def test_session_windows():
    from texel_ray.stages.window import session_windows

    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 02:00", "2024-01-01 02:05"]
    )
    g = pd.DataFrame({"user_id": [1] * 4, "ts": ts})
    out = session_windows(g)
    assert out["n_sessions"].iloc[0] == 2
    assert out["n_events"].iloc[0] == 4


def test_fingerprint_batch_matches_scalar():
    from texel_ray.stages.text import fingerprint64, fingerprint64_batch

    rng = np.random.default_rng(11)
    texts = ["", "a", "abc", "the quick brown fox", "你好 world", "x" * 600]
    texts += ["".join(chr(rng.integers(32, 1000)) for _ in range(rng.integers(0, 80))) for _ in range(50)]
    got = fingerprint64_batch(texts)
    expect = np.array([fingerprint64(t) for t in texts], dtype=np.int64)
    np.testing.assert_array_equal(got, expect)


def test_langid_batch_matches_scalar_predict():
    from texel_ray.stages.text import LangId

    texts = [
        "the cat and the hat is on the mat",
        "der hund und die katze ist ein tier",
        "le chat est un animal et la maison",
        "el perro es un animal y la casa",
        "中文文本 with some english",
        "",
        "zzz qqq www",  # words but no profile hits -> und
        "de la le und the",  # cross-language tie fodder
    ]
    stage = LangId()
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    out = stage(t)
    for i, txt in enumerate(texts):
        lang, score = stage._predict(txt)
        assert out["lang_pred"][i].as_py() == lang, (i, txt)
        assert out["lang_score"][i].as_py() == score, (i, txt)


def test_connected_components_matches_union_find(ray_session):
    """Distributed hash-to-min components == driver union-find on random
    graphs including a long chain (multi-round propagation)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from texel_ray.stages.components import connected_components

    rng = np.random.default_rng(11)
    # random clustered pairs + a 40-link chain (forces >1 round)
    a = rng.integers(0, 300, 150)
    b = rng.integers(0, 300, 150)
    chain_a = np.arange(1000, 1040)
    chain_b = np.arange(1001, 1041)
    id_a = np.concatenate([np.minimum(a, b), chain_a]).astype(np.int64)
    id_b = np.concatenate([np.maximum(a, b) + 1, chain_b]).astype(np.int64)
    pairs = pa.table({"id_a": pa.array(id_a), "id_b": pa.array(id_b)})
    got = (
        connected_components(ray.data.from_arrow(pairs).repartition(4))
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    parent = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(id_a.tolist(), id_b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    want = sorted((k, find(k)) for k in parent)
    assert list(zip(got["id"], got["rep"])) == want


def test_connected_components_empty(ray_session):
    import pyarrow as pa
    import ray.data

    from texel_ray.stages.components import connected_components

    pairs = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )
    out = connected_components(ray.data.from_arrow(pairs))
    assert out.count() == 0


def test_grouped_hamming_pairs_matches_per_group_kernel():
    """The batched triangle kernel must equal simhash_bucket_pairs run
    per group — including cap truncation and the capped flag."""
    import numpy as np
    import pandas as pd

    from texel_ray.stages.dedup import grouped_hamming_pairs, simhash_bucket_pairs

    rng = np.random.default_rng(11)
    n = 400
    key = rng.integers(0, 25, n)
    ids = np.array([f"img{i:04d}" for i in rng.permutation(n)])
    base = rng.integers(0, 1 << 62, 30, dtype=np.int64)
    sig = base[rng.integers(0, len(base), n)]
    flip = rng.integers(0, 64, n)
    sig = sig ^ (np.int64(1) << flip.astype(np.int64)) * rng.integers(0, 2, n)

    got = grouped_hamming_pairs(key, ids, sig, max_hamming=3, cap=8)
    refs = []
    for k in np.unique(key):
        m = key == k
        g = pd.DataFrame({"image_id": ids[m], "simhash": sig[m]})
        refs.append(
            simhash_bucket_pairs(g, id_col="image_id", max_hamming=3, cap=8)
        )
    ref = pd.concat(refs, ignore_index=True)
    got_s = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    ref_s = ref.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_s[["id_a", "id_b", "hamming", "capped"]],
        ref_s[["id_a", "id_b", "hamming", "capped"]],
    )


def test_embedding_neardup_bucketed_matches_per_bucket_kernel():
    """Arrow-native EmbeddingNearDupBucketed must equal EmbeddingNearDup
    run per real bucket (same sort-by-id, cap, cosine threshold)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from texel_ray.stages.dedup import EmbeddingNearDup, EmbeddingNearDupBucketed

    rng = np.random.default_rng(5)
    n = 300
    bucket = rng.integers(0, 12, n)
    ids = rng.permutation(n).astype(np.int64)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    emb = base[rng.integers(0, len(base), n)] + rng.standard_normal(
        (n, 16)
    ).astype(np.float32) * np.float32(0.002)

    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "bucket": pa.array(bucket),
            "embedding": pa.array(
                [e.tolist() for e in emb], pa.list_(pa.float32())
            ),
        }
    )
    got = (
        EmbeddingNearDupBucketed(threshold=0.999, cap=10)(tbl)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    refs = []
    for b in np.unique(bucket):
        m = bucket == b
        g = pd.DataFrame(
            {"vec_id": ids[m], "embedding": list(emb[m])}
        )
        refs.append(EmbeddingNearDup(threshold=0.999, cap=10)(g))
    ref = (
        pd.concat(refs, ignore_index=True)
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(got) > 0  # planted near-identical vectors must pair
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
