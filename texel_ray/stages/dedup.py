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


_NGRAM_MULTS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _hash_tokens_ngrams(tokens: list[str], n: int) -> np.ndarray:
    """Word n-gram shingles -> uint64 hashes, position-combined.

    Python's builtin hash() is process-unstable, so each TOKEN gets a
    deterministic crc32 widened by splitmix64, and an n-gram's hash is
    the XOR of its tokens' hashes times per-position odd multipliers —
    vectorized over all shingles (the old per-shingle string join +
    crc32 was the MinHash kernel hot spot). Collisions are ~2^-64; any
    collision only perturbs the exact-Jaccard estimate negligibly.
    """
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    import zlib

    th = _splitmix64(
        np.fromiter(
            (zlib.crc32(t.encode("utf-8")) for t in tokens),
            dtype=np.uint64,
            count=len(tokens),
        )
    )
    m = min(n, len(tokens))
    mults = (
        _NGRAM_MULTS
        if m <= len(_NGRAM_MULTS)
        else _splitmix64(np.arange(m, dtype=np.uint64)) | np.uint64(1)
    )
    out = th[: len(th) - m + 1] * mults[0]
    for i in range(1, m):
        out = out ^ (th[i : len(th) - m + 1 + i] * mults[i])
    if len(tokens) < n:
        # short doc: ONE shingle combining all tokens
        return out[:1] if len(out) else out
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
        sh = _hash_tokens_ngrams((text or "").split(), self.ngram)
        if len(sh) == 0:
            return np.full(len(self.a), np.iinfo(np.uint64).max, dtype=np.uint64)
        # multiply-shift universal family on the full 64-bit shingle hash:
        # wrapping a*x + b (no modulo — integer % was the kernel hot spot;
        # pair candidates are exact-Jaccard verified downstream, so hash
        # family quality only affects LSH recall, which stays ~1)
        prod = self.a[:, None] * sh[None, :] + self.b[:, None]
        return np.min(prod, axis=1)

    def signatures(self, texts: list) -> np.ndarray:
        """(n_docs, num_perm) signature matrix, vectorized ACROSS docs.

        Shingle hashes of many docs are concatenated and the permutation
        products min-reduced per document segment (``np.minimum.reduceat``),
        in chunks bounded to ~64k shingles so the (num_perm x shingles)
        product matrix stays small. Bit-identical to ``signature`` per doc.
        """
        n = len(texts)
        num_perm = len(self.a)
        sh_list = [
            _hash_tokens_ngrams((t or "").split(), self.ngram) for t in texts
        ]
        sigs = np.empty((n, num_perm), dtype=np.uint64)
        start = 0
        while start < n:
            end, total = start, 0
            while end < n and (end == start or total + len(sh_list[end]) <= 65536):
                total += len(sh_list[end])
                end += 1
            lens = np.array([len(sh_list[i]) for i in range(start, end)])
            block = np.full(
                (end - start, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64
            )
            nz = lens > 0
            if nz.any():
                allsh = np.concatenate([s for s in sh_list[start:end] if len(s)])
                prod = self.a[:, None] * allsh[None, :] + self.b[:, None]
                offsets = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
                block[nz] = np.minimum.reduceat(prod, offsets, axis=1).T
            sigs[start:end] = block
            start = end
        return sigs

    def band_hashes(self, sigs: np.ndarray) -> np.ndarray:
        """(n_docs, bands) int64 FNV-1a band hashes, vectorized across docs
        and bands (the inner loop is rows_per_band, typically 4)."""
        n = sigs.shape[0]
        s3 = sigs.reshape(n, self.bands, self.rows_per_band)
        h = np.full((n, self.bands), 1469598103934665603, dtype=np.uint64)
        for r in range(self.rows_per_band):
            h = (h ^ s3[:, :, r]) * np.uint64(0x100000001B3)
        return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        bh = self.band_hashes(self.signatures(texts))  # (n, bands)
        take = pa.array(np.repeat(np.arange(n, dtype=np.int64), self.bands))
        return pa.table(
            {
                "band_id": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n)
                ),
                "band_hash": pa.array(bh.reshape(-1)),
                self.id_col: batch[self.id_col].take(take),
            }
        )


def _triangle_pair_indices(n: int, tile: int = 2048):
    """Yield (ia, ib) index-array tiles covering the strict upper triangle
    of an n x n pair matrix, each tile bounded to ~tile^2 entries so the
    intermediate arrays stay small regardless of bucket size."""
    for s0 in range(0, n, tile):
        e0 = min(s0 + tile, n)
        m = e0 - s0
        ia, ib = np.triu_indices(m, k=1)
        yield ia + s0, ib + s0
        for s1 in range(e0, n, tile):
            e1 = min(s1 + tile, n)
            ii = np.repeat(np.arange(s0, e0), e1 - s1)
            jj = np.tile(np.arange(s1, e1), m)
            yield ii, jj


def bucket_pairs(
    group: pd.DataFrame, id_col: str = "doc_id", hard_cap: int = 4096
) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket (map_groups). Buckets are tiny
    by construction (a band collision implies high similarity), and every
    member pair is a candidate, so full enumeration is exact and the pair
    list is output-dimensional: a hot bucket is a near-duplicate clique
    whose pairs ARE the answer. Enumeration is tiled so intermediates stay
    bounded; only buckets beyond `hard_cap` distinct docs (adversarial —
    ~8M pairs) are truncated, WITH the `capped` flag (no silent caps)."""
    ids = sorted(set(group[id_col].tolist()))
    capped = len(ids) > hard_cap
    ids_arr = np.asarray(ids[:hard_cap])
    outs_a, outs_b = [], []
    for ia, ib in _triangle_pair_indices(len(ids_arr)):
        outs_a.append(ids_arr[ia])
        outs_b.append(ids_arr[ib])
    a = np.concatenate(outs_a) if outs_a else np.array([], dtype=ids_arr.dtype)
    b = np.concatenate(outs_b) if outs_b else np.array([], dtype=ids_arr.dtype)
    return pd.DataFrame({"id_a": a, "id_b": b, "capped": np.full(len(a), capped)})


def verify_jaccard_pairs(
    batch: pa.Table, threshold: float = 0.8, ngram: int = 3
) -> pa.Table:
    """Exact n-gram Jaccard verification over joined candidate pairs.

    Input rows carry BOTH texts (``text_a``/``text_b`` joined back by id in
    the dataset — no driver-held corpus dict); emits only pairs with
    jaccard >= threshold. The per-pair set math is Python, but the pair
    stream is candidate-dimension-sized, not corpus-sized."""
    a = batch["id_a"].to_pylist()
    b = batch["id_b"].to_pylist()
    ta = batch["text_a"].to_pylist()
    tb = batch["text_b"].to_pylist()
    sims = [
        jaccard(shingle_set(x or "", ngram), shingle_set(y or "", ngram))
        for x, y in zip(ta, tb)
    ]
    keep = [i for i, s in enumerate(sims) if s >= threshold]
    return pa.table(
        {
            "id_a": pa.array([a[i] for i in keep], batch.schema.field("id_a").type),
            "id_b": pa.array([b[i] for i in keep], batch.schema.field("id_b").type),
            "jaccard": pa.array([sims[i] for i in keep], pa.float64()),
        }
    )


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


def simhash64_batch(texts: list) -> np.ndarray:
    """Vectorized simhash64 across documents: token hashes of all docs are
    concatenated, the per-bit +/-1 votes reduced per doc segment
    (``np.add.reduceat``), chunked to bound the (tokens x 64) bit matrix.
    Bit-identical to ``simhash64`` per doc."""
    n = len(texts)
    tok_list = [_hash_tokens_ngrams((t or "").split(), 1) for t in texts]
    out = np.zeros(n, dtype=np.uint64)
    weights = 1 << np.arange(64, dtype=np.uint64)
    start = 0
    while start < n:
        end, total = start, 0
        while end < n and (end == start or total + len(tok_list[end]) <= 65536):
            total += len(tok_list[end])
            end += 1
        lens = np.array([len(tok_list[i]) for i in range(start, end)])
        nz = lens > 0
        if nz.any():
            alltok = np.concatenate([t for t in tok_list[start:end] if len(t)])
            bits = (
                (alltok[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
            ).astype(np.int64)
            votes = 2 * bits - 1
            offsets = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
            acc = np.add.reduceat(votes, offsets, axis=0)  # (n_nz, 64)
            vals = ((acc > 0).astype(np.uint64) * weights[None, :]).sum(axis=1)
            seg = np.zeros(end - start, dtype=np.uint64)
            seg[nz] = vals
            out[start:end] = seg
        start = end
    return out


class SimHasher:
    """Emit (band, band_bits, id, simhash) rows: 4 x 16-bit bands; two docs
    within hamming distance 3 share at least one exact band."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        sh = simhash64_batch(texts)  # (n,) uint64
        bands = np.arange(4, dtype=np.uint64)
        band_bits = ((sh[:, None] >> (bands[None, :] * np.uint64(16)))
                     & np.uint64(0xFFFF)).astype(np.int64)
        sims = (sh - np.uint64(1 << 63)).astype(np.int64)  # store as int64
        take = pa.array(np.repeat(np.arange(n, dtype=np.int64), 4))
        return pa.table(
            {
                "band_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "band_bits": pa.array(band_bits.reshape(-1)),
                self.id_col: batch[self.id_col].take(take),
                "simhash": pa.array(np.repeat(sims, 4)),
            }
        )


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def popcount64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR bit tricks; numpy<2 lacks
    ``bitwise_count``)."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def _tiled_triangle_hamming(sig: np.ndarray, max_hamming: int):
    """Exact (ia, ib, dist) over ALL pairs of ``sig`` with
    hamming <= max_hamming, tiled so intermediates stay bounded."""
    outs_a, outs_b, outs_d = [], [], []
    for ia, ib in _triangle_pair_indices(len(sig)):
        d = popcount64_np(sig[ia] ^ sig[ib])
        keep = d <= max_hamming
        if keep.any():
            outs_a.append(ia[keep])
            outs_b.append(ib[keep])
            outs_d.append(d[keep])
    if not outs_a:
        e = np.array([], dtype=np.int64)
        return e, e.copy(), e.copy()
    return (
        np.concatenate(outs_a),
        np.concatenate(outs_b),
        np.concatenate(outs_d),
    )


def _distinct_hamming_pairs(
    sig: np.ndarray, max_hamming: int, bits: np.ndarray, leaf: int
):
    """(ia, ib, dist) among DISTINCT signatures via pigeonhole recursion.

    Splitting the available ``bits`` into max_hamming+1 sub-bands, any
    qualifying pair agrees exactly on >= 1 sub-band (it has <= max_hamming
    differing bits total), so recursing into equal-sub-band groups finds
    every pair; the full-signature popcount at the leaves removes false
    positives; pairs found by several branches are deduped by the caller.
    Terminates because each recursion removes its sub-band from ``bits``
    and distinct signatures cannot agree on every bit."""
    n = len(sig)
    if max_hamming == 0:  # distinct signatures can't be at distance 0
        e = np.array([], dtype=np.int64)
        return e, e.copy(), e.copy()
    if n <= leaf or len(bits) < (max_hamming + 1):
        return _tiled_triangle_hamming(sig, max_hamming)
    chunks = np.array_split(bits, max_hamming + 1)
    acc_a, acc_b, acc_d = [], [], []
    for ci, chunk in enumerate(chunks):
        key = np.zeros(n, dtype=np.uint64)
        for k, bit in enumerate(chunk):
            key |= ((sig >> np.uint64(bit)) & np.uint64(1)) << np.uint64(k)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        bnd = np.nonzero(ks[1:] != ks[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [n]))
        rem = np.concatenate([c for j, c in enumerate(chunks) if j != ci])
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            idx = order[s:e]
            ia, ib, d = _distinct_hamming_pairs(sig[idx], max_hamming, rem, leaf)
            if len(ia):
                acc_a.append(idx[ia])
                acc_b.append(idx[ib])
                acc_d.append(d)
    if not acc_a:
        e = np.array([], dtype=np.int64)
        return e, e.copy(), e.copy()
    ia = np.concatenate(acc_a)
    ib = np.concatenate(acc_b)
    d = np.concatenate(acc_d)
    lo = np.minimum(ia, ib)
    hi = np.maximum(ia, ib)
    _, ui = np.unique(lo.astype(np.int64) * n + hi, return_index=True)
    return lo[ui], hi[ui], d[ui]


def hamming_pairs_exact(
    sig: np.ndarray, max_hamming: int = 3, leaf: int = 512
):
    """ALL index pairs (ia, ib, dist) with hamming(sig[ia], sig[ib]) <=
    max_hamming — EXACT at any group size (the hot-bucket kernel; replaces
    recall truncation). Shape: collapse to distinct signatures first, run
    the pigeonhole recursion over those (bounded by signature diversity,
    not member count), then expand winning signature pairs to member pairs
    — so identical-signature cliques cost output-dimensional work only,
    which is inherent (their pairs are the answer)."""
    if len(sig) == 0:
        e = np.array([], dtype=np.int64)
        return e, e.copy(), e.copy()
    uniq, inv = np.unique(sig.astype(np.uint64), return_inverse=True)
    ua, ub, ud = _distinct_hamming_pairs(
        uniq, max_hamming, np.arange(64, dtype=np.uint64), leaf
    )
    order = np.argsort(inv, kind="stable")
    inv_s = inv[order]
    bnd = np.nonzero(inv_s[1:] != inv_s[:-1])[0] + 1
    starts = np.concatenate(([0], bnd))
    counts = np.diff(np.concatenate((starts, [len(sig)])))
    cls_start = np.zeros(len(uniq), dtype=np.int64)
    cls_count = np.zeros(len(uniq), dtype=np.int64)
    cls_start[inv_s[starts]] = starts
    cls_count[inv_s[starts]] = counts
    outs_a, outs_b, outs_d = [], [], []
    # within-class pairs: identical signatures, distance 0
    for c in np.nonzero(cls_count >= 2)[0]:
        members = order[cls_start[c] : cls_start[c] + cls_count[c]]
        for ia, ib in _triangle_pair_indices(len(members)):
            outs_a.append(members[ia])
            outs_b.append(members[ib])
            outs_d.append(np.zeros(len(ia), dtype=np.int64))
    # cross-class pairs: cartesian product of the two member lists
    for u, v, d in zip(ua, ub, ud):
        ma = order[cls_start[u] : cls_start[u] + cls_count[u]]
        mb = order[cls_start[v] : cls_start[v] + cls_count[v]]
        outs_a.append(np.repeat(ma, len(mb)))
        outs_b.append(np.tile(mb, len(ma)))
        outs_d.append(np.full(len(ma) * len(mb), d, dtype=np.int64))
    if not outs_a:
        e = np.array([], dtype=np.int64)
        return e, e.copy(), e.copy()
    return (
        np.concatenate(outs_a),
        np.concatenate(outs_b),
        np.concatenate(outs_d),
    )


def _matrix_distinct_pairs(
    mat: np.ndarray, max_d: int, cols: np.ndarray, leaf: int
):
    """(ia, ib, dist) among DISTINCT byte rows with mismatch-count <=
    max_d — the string generalization of ``_distinct_hamming_pairs``:
    split the available columns into max_d+1 chunks, a qualifying pair
    agrees exactly on >= 1 chunk, recurse into equal-chunk groups, full-
    row verification at the leaves, dedupe across branches."""
    n = len(mat)
    if max_d == 0:
        e = np.array([], dtype=np.int64)
        return e, e.copy(), e.copy()
    if n <= leaf or len(cols) < (max_d + 1):
        outs_a, outs_b, outs_d = [], [], []
        for ia, ib in _triangle_pair_indices(n, 1024):
            d = (mat[ia] != mat[ib]).sum(axis=1)
            keep = d <= max_d
            if keep.any():
                outs_a.append(ia[keep])
                outs_b.append(ib[keep])
                outs_d.append(d[keep].astype(np.int64))
        if not outs_a:
            e = np.array([], dtype=np.int64)
            return e, e.copy(), e.copy()
        return (
            np.concatenate(outs_a),
            np.concatenate(outs_b),
            np.concatenate(outs_d),
        )
    chunks = np.array_split(cols, max_d + 1)
    acc_a, acc_b, acc_d = [], [], []
    for ci, chunk in enumerate(chunks):
        sub = np.ascontiguousarray(mat[:, chunk])
        view = sub.view([("", sub.dtype)] * sub.shape[1]).ravel()
        order = np.argsort(view, kind="stable")
        sv = view[order]
        bnd = np.nonzero(sv[1:] != sv[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [n]))
        rem = np.concatenate([c for j, c in enumerate(chunks) if j != ci])
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            idx = order[s:e]
            ia, ib, d = _matrix_distinct_pairs(mat[idx], max_d, rem, leaf)
            if len(ia):
                acc_a.append(idx[ia])
                acc_b.append(idx[ib])
                acc_d.append(d)
    if not acc_a:
        e = np.array([], dtype=np.int64)
        return e, e.copy(), e.copy()
    ia = np.concatenate(acc_a)
    ib = np.concatenate(acc_b)
    d = np.concatenate(acc_d)
    lo = np.minimum(ia, ib)
    hi = np.maximum(ia, ib)
    _, ui = np.unique(lo.astype(np.int64) * n + hi, return_index=True)
    return lo[ui], hi[ui], d[ui]


def matrix_hamming_pairs_exact(
    mat: np.ndarray, max_d: int = 1, leaf: int = 256
):
    """ALL row-index pairs of a uint8 matrix (equal-length strings as
    byte rows) with column mismatch count <= max_d — EXACT at any group
    size; the hot-bucket kernel for string record linkage. Same shape
    as ``hamming_pairs_exact``: collapse to distinct rows, pigeonhole
    recursion over those, expand duplicate-row cliques (output-
    dimensional, inherent)."""
    if len(mat) == 0:
        e = np.array([], dtype=np.int64)
        return e, e.copy(), e.copy()
    uniq, inv = np.unique(mat, axis=0, return_inverse=True)
    inv = inv.ravel()
    ua, ub, ud = _matrix_distinct_pairs(
        uniq, max_d, np.arange(mat.shape[1]), leaf
    )
    order = np.argsort(inv, kind="stable")
    inv_s = inv[order]
    bnd = np.nonzero(inv_s[1:] != inv_s[:-1])[0] + 1
    starts = np.concatenate(([0], bnd))
    counts = np.diff(np.concatenate((starts, [len(mat)])))
    cls_start = np.zeros(len(uniq), dtype=np.int64)
    cls_count = np.zeros(len(uniq), dtype=np.int64)
    cls_start[inv_s[starts]] = starts
    cls_count[inv_s[starts]] = counts
    outs_a, outs_b, outs_d = [], [], []
    for c in np.nonzero(cls_count >= 2)[0]:
        members = order[cls_start[c] : cls_start[c] + cls_count[c]]
        for ia, ib in _triangle_pair_indices(len(members)):
            outs_a.append(members[ia])
            outs_b.append(members[ib])
            outs_d.append(np.zeros(len(ia), dtype=np.int64))
    for u, v, d in zip(ua, ub, ud):
        ma = order[cls_start[u] : cls_start[u] + cls_count[u]]
        mb = order[cls_start[v] : cls_start[v] + cls_count[v]]
        outs_a.append(np.repeat(ma, len(mb)))
        outs_b.append(np.tile(mb, len(ma)))
        outs_d.append(np.full(len(ma) * len(mb), d, dtype=np.int64))
    if not outs_a:
        e = np.array([], dtype=np.int64)
        return e, e.copy(), e.copy()
    return (
        np.concatenate(outs_a),
        np.concatenate(outs_b),
        np.concatenate(outs_d),
    )


def simhash_bucket_pairs(
    group: pd.DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    cap: int = 50,
) -> pd.DataFrame:
    """Candidate pairs + hamming verification inside one SimHash band
    bucket (map_groups stage; the signature travels with the row, so no
    join-back is needed). Vectorized XOR+popcount over the pair triangle
    for ordinary buckets; buckets beyond `cap` docs switch to the EXACT
    pigeonhole-recursion kernel (``hamming_pairs_exact``) instead of
    truncating, so recall holds at any bucket size. ``capped`` is kept in
    the schema (always False now) for caller compatibility."""
    rows = group[[id_col, "simhash"]].drop_duplicates(id_col).sort_values(id_col)
    ids = rows[id_col].to_numpy()
    sh = rows["simhash"].to_numpy().astype(np.int64).astype(np.uint64)
    if len(ids) > cap:
        ia, ib, dist = hamming_pairs_exact(sh, max_hamming)
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)  # ids sorted asc
        return pd.DataFrame(
            {
                "id_a": ids[lo],
                "id_b": ids[hi],
                "hamming": dist,
                "capped": np.zeros(len(ia), dtype=bool),
            }
        )
    ia, ib = np.triu_indices(len(ids), k=1)
    dist = popcount64_np(sh[ia] ^ sh[ib])
    keep = dist <= max_hamming
    return pd.DataFrame(
        {
            "id_a": ids[ia[keep]],
            "id_b": ids[ib[keep]],
            "hamming": dist[keep],
            "capped": np.zeros(int(keep.sum()), dtype=bool),
        }
    )


def _tiled_cosine_pairs(m: np.ndarray, threshold: float, tile: int = 2048):
    """(ia, ib, cos) for ALL row pairs of unit-normalized ``m`` with
    cosine >= threshold, ia < ib. The similarity matrix is computed as
    tile x tile BLOCK MATMULS (the same BLAS path as the dense small-
    bucket case; a per-pair row gather would cost ~dim x the block's
    memory), so peak memory is one tile^2 block at any bucket size;
    work is quadratic, which is inherent to candidate generation — LSH
    bucketing keeps hot buckets meaning 'mostly genuine near-dups'."""
    n = len(m)
    outs_a, outs_b, outs_c = [], [], []
    for s0 in range(0, n, tile):
        e0 = min(s0 + tile, n)
        a = m[s0:e0]
        for s1 in range(s0, n, tile):
            e1 = min(s1 + tile, n)
            s = a @ m[s1:e1].T
            if s0 == s1:  # diagonal block: strict upper triangle only
                iu, ju = np.triu_indices(e0 - s0, k=1)
                v = s[iu, ju]
                keep = v >= threshold
                ii, jj, v = iu[keep], ju[keep], v[keep]
            else:
                ii, jj = np.nonzero(s >= threshold)
                v = s[ii, jj]
            if len(ii):
                outs_a.append(ii.astype(np.int64) + s0)
                outs_b.append(jj.astype(np.int64) + s1)
                outs_c.append(v.astype(np.float64))
    if not outs_a:
        e = np.array([], dtype=np.int64)
        return e, e.copy(), np.array([], dtype=np.float64)
    return (
        np.concatenate(outs_a),
        np.concatenate(outs_b),
        np.concatenate(outs_c),
    )


class EmbeddingNearDup:
    """Within-LSH-bucket pairwise cosine >= threshold (map_groups stage).

    Two modes, because cosine (unlike the hamming pigeonhole) has no
    exact sub-split that preserves recall:

    - ``exact=True``: full enumeration at any bucket size via the tiled
      kernel (memory-bounded; work is quadratic per bucket, which LSH
      keeps output-dimensional on corpora with genuine dup structure).
    - ``exact=False`` (default): buckets beyond ``cap`` rows keep the
      ``cap`` smallest ids and flag every emitted pair ``capped`` — the
      documented sampled estimate for SATURATED corpora where nearly
      every in-bucket pair clears the threshold and the exact pair set
      is Omega(n^2) of the bucket (there, the production move is
      cluster-level dedup via a representative, not a pair list)."""

    def __init__(
        self,
        threshold: float = 0.95,
        id_col: str = "vec_id",
        cap: int = 1024,
        exact: bool = False,
    ):
        self.threshold = threshold
        self.id_col = id_col
        self.cap = cap  # truncation bound (exact=False) / dense-path bound
        self.exact = exact

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        from .similarity import normalize_rows

        capped = (not self.exact) and len(group) > self.cap
        group = group.sort_values(self.id_col)
        if not self.exact:
            group = group.head(self.cap)
        ids = group[self.id_col].to_numpy()
        m = normalize_rows(np.stack(group["embedding"].to_numpy()))
        if len(ids) > self.cap:  # exact mode, hot bucket: tiled kernel
            ia, ib, cos = _tiled_cosine_pairs(m, self.threshold)
        else:
            sims = m @ m.T
            ia, ib = np.triu_indices(len(ids), k=1)
            keep = sims[ia, ib] >= self.threshold
            ia, ib, cos = ia[keep], ib[keep], sims[ia[keep], ib[keep]].astype(np.float64)
        id_a = np.minimum(ids[ia], ids[ib])
        id_b = np.maximum(ids[ia], ids[ib])
        if np.issubdtype(ids.dtype, np.integer):
            id_a = id_a.astype(np.int64)
            id_b = id_b.astype(np.int64)
        return pd.DataFrame(
            {
                "id_a": id_a,
                "id_b": id_b,
                "cosine": cos,
                "capped": np.full(len(id_a), capped),
            }
        )


def grouped_hamming_pairs(
    key: np.ndarray,
    ids: np.ndarray,
    sig: np.ndarray,
    max_hamming: int = 3,
    cap: int = 50,
) -> pd.DataFrame:
    """All within-``key``-group pairs with hamming(sig) <= max_hamming,
    vectorized ACROSS groups: one lexsort, then one batched
    triangle-enumeration per DISTINCT group size (a handful of numpy
    calls instead of one ``simhash_bucket_pairs`` dispatch per group —
    the per-group pandas overhead dominated phash/simhash buckets).
    Semantics match simhash_bucket_pairs: ids must be unique within a
    group; groups beyond ``cap`` ids are handled one-by-one by the EXACT
    pigeonhole kernel (``hamming_pairs_exact``) — no recall truncation;
    ``capped`` stays in the schema (always False) for compatibility."""
    order = np.lexsort((ids, key))
    k = key[order]
    ids_s = ids[order]
    sig_s = sig[order].astype(np.int64).astype(np.uint64)
    bnd = np.nonzero(k[1:] != k[:-1])[0] + 1
    starts = np.concatenate(([0], bnd)) if len(k) else np.array([], dtype=np.int64)
    ends = np.concatenate((bnd, [len(k)])) if len(k) else np.array([], dtype=np.int64)
    counts = ends - starts
    out = {"id_a": [], "id_b": [], "hamming": [], "capped": []}
    for g in np.nonzero(counts > cap)[0]:  # hot groups: exact kernel
        s, e = starts[g], ends[g]
        ia, ib, d = hamming_pairs_exact(sig_s[s:e], max_hamming)
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)  # ids sorted asc
        out["id_a"].append(ids_s[s + lo])
        out["id_b"].append(ids_s[s + hi])
        out["hamming"].append(d)
        out["capped"].append(np.zeros(len(d), dtype=bool))
    eff = np.where(counts > cap, 0, counts)
    for c in np.unique(eff):
        if c < 2:
            continue
        gsel = np.nonzero(eff == c)[0]
        ia, ib = np.triu_indices(int(c), k=1)
        base = starts[gsel][:, None]
        A = (base + ia[None, :]).ravel()
        B = (base + ib[None, :]).ravel()
        d = popcount64_np(sig_s[A] ^ sig_s[B])
        keep = d <= max_hamming
        out["id_a"].append(ids_s[A[keep]])
        out["id_b"].append(ids_s[B[keep]])
        out["hamming"].append(d[keep])
        out["capped"].append(np.zeros(int(keep.sum()), dtype=bool))
    if not out["id_a"]:
        return pd.DataFrame(
            {
                "id_a": pd.Series(dtype=ids.dtype if ids.dtype != object else str),
                "id_b": pd.Series(dtype=ids.dtype if ids.dtype != object else str),
                "hamming": pd.Series(dtype="int64"),
                "capped": pd.Series(dtype=bool),
            }
        )
    return pd.DataFrame(
        {
            "id_a": np.concatenate(out["id_a"]),
            "id_b": np.concatenate(out["id_b"]),
            "hamming": np.concatenate(out["hamming"]),
            "capped": np.concatenate(out["capped"]),
        }
    )


class EmbeddingNearDupBucketed:
    """``EmbeddingNearDup`` lifted to SUPERBUCKET groups: the dataset
    groups on a ~512-way hash of the LSH bucket (hundreds of map_groups
    dispatches instead of one per bucket — dispatch dominated the tail
    at 4096 buckets), and each real bucket inside the group is processed
    by the identical sort-by-id / cap / triangle-cosine kernel on numpy
    slices. Arrow-native: the embedding list column flattens zero-copy
    into one (n, dim) matrix (the pandas path materialized one tiny
    numpy array PER ROW, which cost more than the math). Pair output is
    exactly EmbeddingNearDup's per real bucket."""

    def __init__(
        self,
        threshold: float = 0.95,
        id_col: str = "vec_id",
        cap: int = 1024,
        bucket_col: str = "bucket",
        exact: bool = False,
    ):
        self.threshold = threshold
        self.id_col = id_col
        self.cap = cap
        self.bucket_col = bucket_col
        self.exact = exact  # see EmbeddingNearDup: exact vs sampled-capped

    def __call__(self, g: pa.Table) -> pa.Table:
        from .similarity import normalize_rows

        ids = g[self.id_col].to_numpy(zero_copy_only=False)
        buck = g[self.bucket_col].to_numpy(zero_copy_only=False)
        emb_col = g["embedding"].combine_chunks()
        flat = np.asarray(emb_col.flatten())
        emb = flat.reshape(len(g), -1)
        order = np.lexsort((ids, buck))
        ids = ids[order]
        buck = buck[order]
        emb = emb[order]
        bnd = np.nonzero(buck[1:] != buck[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [len(buck)]))
        out_a, out_b, out_cos, out_cap = [], [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            capped = (not self.exact) and (e - s) > self.cap
            sl = slice(s, e) if self.exact else slice(s, min(e, s + self.cap))
            bids = ids[sl]
            m = normalize_rows(emb[sl])
            if len(bids) > self.cap:  # exact mode, hot bucket: tiled kernel
                ia, ib, cos = _tiled_cosine_pairs(m, self.threshold)
                keepn = len(ia)
            else:
                sims = m @ m.T
                ia, ib = np.triu_indices(len(bids), k=1)
                keep = sims[ia, ib] >= self.threshold
                ia, ib = ia[keep], ib[keep]
                cos = sims[ia, ib].astype(np.float64)
                keepn = int(keep.sum())
            if not keepn:
                continue
            a = bids[ia]
            b = bids[ib]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_cos.append(cos)
            out_cap.append(np.full(keepn, capped))
        id_int = np.issubdtype(ids.dtype, np.integer)
        id_type = pa.int64() if id_int else pa.string()
        if not out_a:
            return pa.table(
                {
                    "id_a": pa.array([], id_type),
                    "id_b": pa.array([], id_type),
                    "cosine": pa.array([], pa.float64()),
                    "capped": pa.array([], pa.bool_()),
                }
            )
        id_a = np.concatenate(out_a)
        id_b = np.concatenate(out_b)
        if id_int:
            id_a = id_a.astype(np.int64)
            id_b = id_b.astype(np.int64)
        return pa.table(
            {
                "id_a": pa.array(id_a, id_type),
                "id_b": pa.array(id_b, id_type),
                "cosine": pa.array(np.concatenate(out_cos)),
                "capped": pa.array(np.concatenate(out_cap)),
            }
        )
