"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All follow the same scale shape:
  per-batch vectorized signature kernel (map_batches)
  -> explode to (block key, doc) rows
  -> ONE hash-shuffle groupby on the block key
  -> within-bucket candidate pairs (map_groups; buckets are small by
     construction — band width bounds collision probability)
  -> verify stage (exact Jaccard / hamming / cosine).

Only signatures and ids cross the shuffle, never payloads. The verify
stage at test scale uses a broadcast id->text/vector lookup; at 100 TB it
becomes a re-read by id from the columnar store (random access by row id).

Exact dedup is in pipelines/queries.py (hash-partitioned groupby(phash)
with per-batch combiners).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_PRIME = (1 << 61) - 1
# minhash permutation prime: > 2^32 so (a*x + b) with a,x < 2^32 fits uint64
_MH_PRIME = np.uint64(4294967311)
_MASK32 = np.uint64(0xFFFFFFFF)


def _hash_tokens_ngrams(tokens: list[str], n: int) -> np.ndarray:
    """Word n-gram shingles -> uint64 hashes. Python's builtin hash() is
    process-unstable, so use crc32 (C speed, deterministic everywhere) over
    the shingle bytes, salted twice to fill 64 bits."""
    if len(tokens) < n:
        shingles = [" ".join(tokens)] if tokens else []
    else:
        shingles = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    import zlib

    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        b = s.encode("utf-8")
        out[i] = (zlib.crc32(b) << 32) | zlib.crc32(b, 0x9E3779B9)
    return out


def shingle_set(text: str, n: int = 3) -> set[int]:
    return set(_hash_tokens_ngrams(text.split(), n).tolist())


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


class MinHasher:
    """MinHash signatures over word n-gram shingles.

    num_perm universal hashes ((a*x + b) mod p), vectorized per document.
    Emits one row per (band_id, band_hash, doc) for the LSH groupby.
    """

    def __init__(
        self,
        num_perm: int = 128,
        bands: int = 32,
        ngram: int = 3,
        seed: int = 42,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 32, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, 1 << 32, num_perm, dtype=np.uint64)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.ngram = ngram
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _hash_tokens_ngrams((text or "").split(), self.ngram) & _MASK32
        if len(sh) == 0:
            return np.full(len(self.a), int(_MH_PRIME), dtype=np.uint64)
        # (num_perm, n_shingles) -> min over shingles; products fit uint64
        prod = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MH_PRIME
        return np.min(prod, axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        band_ids, band_hashes, doc_ids = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = self.signature(text)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                h = np.uint64(1469598103934665603)
                for v in chunk:
                    h = np.uint64((int(h) ^ int(v)) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
                band_ids.append(band)
                band_hashes.append(int(h) & 0x7FFFFFFFFFFFFFFF)
                doc_ids.append(doc_id)
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                self.id_col: pa.array(doc_ids),
            }
        )


def bucket_pairs(group: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """Candidate pairs within one LSH bucket (map_groups). Buckets are tiny
    (band collision implies high similarity), so the quadratic pair list is
    bounded; a hard cap guards adversarial buckets (capped pairs logged by
    the caller via the `capped` column)."""
    ids = sorted(set(group[id_col].tolist()))
    cap = 50
    capped = len(ids) > cap
    ids = ids[:cap]
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"id_a": a, "id_b": b, "capped": [capped] * len(a)})


class JaccardVerifier:
    """Exact n-gram Jaccard verification of candidate pairs against a
    broadcast id->text lookup (re-read by id at production scale)."""

    def __init__(self, texts_by_id: dict, ngram: int = 3, threshold: float = 0.8):
        self.shingles = {k: shingle_set(v or "", ngram) for k, v in texts_by_id.items()}
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_pylist()
        b = batch["id_b"].to_pylist()
        sims = [
            jaccard(self.shingles.get(x, set()), self.shingles.get(y, set()))
            for x, y in zip(a, b)
        ]
        keep = [i for i, s in enumerate(sims) if s >= self.threshold]
        return pa.table(
            {
                "id_a": pa.array([a[i] for i in keep]),
                "id_b": pa.array([b[i] for i in keep]),
                "jaccard": pa.array([sims[i] for i in keep], pa.float64()),
            }
        )


# ---- SimHash --------------------------------------------------------------


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token FNV hashes (weight = term frequency)."""
    if not tokens:
        return 0
    hashes = _hash_tokens_ngrams(tokens, 1)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    acc = (2 * bits - 1).sum(axis=0)
    return int((acc > 0).astype(np.uint64) @ (1 << np.arange(64, dtype=np.uint64)))


class SimHasher:
    """Emit (band, band_bits, id, simhash) rows: 4 x 16-bit bands; two docs
    within hamming distance 3 share at least one exact band."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        band_id, band_bits, out_ids, sims = [], [], [], []
        for doc_id, text in zip(ids, texts):
            sh = simhash64((text or "").split())
            for band in range(4):
                band_id.append(band)
                band_bits.append((sh >> (band * 16)) & 0xFFFF)
                out_ids.append(doc_id)
                sims.append(sh - (1 << 63))  # store as int64
        return pa.table(
            {
                "band_id": pa.array(band_id, pa.int32()),
                "band_bits": pa.array(band_bits, pa.int64()),
                self.id_col: pa.array(out_ids),
                "simhash": pa.array(sims, pa.int64()),
            }
        )


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


class EmbeddingNearDup:
    """Within-LSH-bucket pairwise cosine >= threshold (map_groups stage)."""

    def __init__(self, threshold: float = 0.95, id_col: str = "vec_id", cap: int = 1024):
        self.threshold = threshold
        self.id_col = id_col
        self.cap = cap  # bound the quadratic pair scan per bucket

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        from .similarity import normalize_rows

        group = group.sort_values(self.id_col).head(self.cap)
        ids = group[self.id_col].to_numpy()
        m = normalize_rows(np.stack(group["embedding"].to_numpy()))
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= self.threshold
        id_a = np.minimum(ids[ia[keep]], ids[ib[keep]])
        id_b = np.maximum(ids[ia[keep]], ids[ib[keep]])
        if np.issubdtype(ids.dtype, np.integer):
            id_a = id_a.astype(np.int64)
            id_b = id_b.astype(np.int64)
        return pd.DataFrame(
            {
                "id_a": id_a,
                "id_b": id_b,
                "cosine": sims[ia[keep], ib[keep]].astype(np.float64),
            }
        )
