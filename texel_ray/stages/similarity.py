"""Similarity search over embedding columns (list<float>).

- ``BruteForceTopK``: the exact baseline — each actor holds the broadcast
  query matrix (normalized, float64) and scores every batch with one
  numpy matmul, emitting (query_id, vec_id, sim) candidates; a tiny
  groupby(query_id) top-k finishes. Scales linearly in corpus size and is
  embarrassingly parallel over batches — at 100 TB the corpus streams,
  only (n_queries x k) rows shuffle.
- ``LSHBucketer``: the scale path — signed-random-projection (SimHash)
  bucketing; probes only matching buckets (hash-partitioned groupby),
  trading recall for a ~2^bits candidate reduction.

Spatial kNN over geotags lives in stages/knn.py (cell-ring expansion).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stack_embeddings(col, dim: int | None = None) -> np.ndarray:
    """Arrow list<float> column -> (n, d) float64 matrix, zero-ish copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, dim or 0), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Actor-pool stage: per-batch cosine scores vs the broadcast queries.

    Emits per-batch local top-k candidates per query (combiner) — the
    global top-k over candidates equals the global top-k over everything.
    """

    def __init__(
        self,
        queries: np.ndarray,
        query_ids: np.ndarray,
        k: int = 10,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.q = normalize_rows(np.asarray(queries, dtype=np.float64)).T  # (d, nq)
        self.query_ids = np.asarray(query_ids)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def _empty(self, ids_dtype=None) -> pa.Table:
        return pa.table(
            {
                "query_id": pa.array(np.array([], dtype=self.query_ids.dtype)),
                self.id_col: pa.array(
                    np.array([], dtype=ids_dtype) if ids_dtype is not None else []
                ),
                "sim": pa.array([], pa.float64()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._empty()
        m = normalize_rows(_stack_embeddings(batch[self.vec_col]))
        sims = m @ self.q  # (n, nq)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[0])
        # local top-k per query (argpartition then exact sort of the head)
        part = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, nq)
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[1]):
            rows = part[:, qi]
            out_q.append(np.full(len(rows), self.query_ids[qi]))
            out_v.append(ids[rows])
            out_s.append(sims[rows, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


def finalize_topk(ds, k: int = 10, id_col: str = "vec_id"):
    """groupby(query_id) -> exact top-k with (sim desc, id asc) tie-break."""

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return ds.groupby("query_id").map_groups(topk, batch_format="pandas")


class IVFIndexer:
    """IVF (inverted-file) coarse quantizer: assign each vector to its
    nearest of K centroids (broadcast, trained once on a sample with a few
    Lloyd iterations). Search probes only the `nprobe` nearest centroid
    lists — the classic trade of recall for a K/nprobe candidate cut.
    """

    def __init__(self, centroids: np.ndarray, vec_col: str = "embedding"):
        self.centroids = normalize_rows(np.asarray(centroids, dtype=np.float64)).T
        self.vec_col = vec_col

    @staticmethod
    def train(sample: np.ndarray, k: int = 16, iters: int = 5, seed: int = 42):
        """Deterministic mini-kmeans on a driver-side sample."""
        rng = np.random.default_rng(seed)
        sample = normalize_rows(np.asarray(sample, dtype=np.float64))
        centroids = sample[rng.choice(len(sample), size=k, replace=False)]
        for _ in range(iters):
            assign = np.argmax(sample @ centroids.T, axis=1)
            for c in range(k):
                members = sample[assign == c]
                if len(members):
                    centroids[c] = members.mean(axis=0)
            centroids = normalize_rows(centroids)
        return centroids

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = normalize_rows(_stack_embeddings(batch[self.vec_col], dim=self.centroids.shape[0]))
        lists = np.argmax(m @ self.centroids, axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists))


class IVFTopK(BruteForceTopK):
    """Brute-force scoring restricted to the queries' nprobe nearest IVF
    lists: batches are pre-partitioned by ivf_list; each actor scores a
    batch only against the queries probing that list."""

    def __init__(self, centroids, queries, query_ids, k=10, nprobe=4, **kw):
        super().__init__(queries, query_ids, k=k, **kw)
        c = normalize_rows(np.asarray(centroids, dtype=np.float64))
        sims = self.q.T @ c.T  # (nq, K)
        order = np.argsort(-sims, axis=1)[:, :nprobe]
        self.queries_for_list: dict[int, np.ndarray] = {}
        for qi in range(order.shape[0]):
            for li in order[qi]:
                self.queries_for_list.setdefault(int(li), []).append(qi)
        self.queries_for_list = {
            k_: np.asarray(v) for k_, v in self.queries_for_list.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._empty()
        lists = batch["ivf_list"].to_numpy(zero_copy_only=False)
        m = normalize_rows(_stack_embeddings(batch[self.vec_col], dim=self.q.shape[0]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        for li in np.unique(lists):
            qidx = self.queries_for_list.get(int(li))
            if qidx is None:
                continue
            rows = np.nonzero(lists == li)[0]
            sims = m[rows] @ self.q[:, qidx]  # (n_rows, n_q_probing)
            k = min(self.k, len(rows))
            part = np.argpartition(-sims, k - 1, axis=0)[:k]
            for j, qi in enumerate(qidx):
                sel = rows[part[:, j]]
                out_q.append(np.full(len(sel), self.query_ids[qi]))
                out_v.append(ids[sel])
                out_s.append(sims[part[:, j], j])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    self.id_col: pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


class LSHBucketer:
    """Signed-random-projection bucket ids for ANN / near-dup blocking."""

    def __init__(
        self,
        dim: int,
        bits: int = 16,
        seed: int = 42,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, bits))
        self.id_col = id_col
        self.vec_col = vec_col

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        signs = (np.asarray(m, dtype=np.float64) @ self.planes) > 0
        weights = (1 << np.arange(signs.shape[1], dtype=np.uint64)).astype(np.uint64)
        return (signs.astype(np.uint64) * weights[None, :]).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _stack_embeddings(batch[self.vec_col], dim=self.planes.shape[0])
        return batch.append_column(
            "bucket", pa.array(self.bucket_of(m), pa.uint64())
        )


def lloyd_l2(sample: np.ndarray, k: int, iters: int = 8, seed: int = 42):
    """Plain (euclidean) Lloyd on a driver-side sample — PQ codebook
    training (codebooks are trained on samples in published practice;
    the full corpus never moves)."""
    rng = np.random.default_rng(seed)
    sample = np.asarray(sample, dtype=np.float64)
    cent = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            mem = sample[assign == c]
            if len(mem):
                cent[c] = mem.mean(axis=0)
    return cent


class PQEncoder:
    """Product quantization encode (Jegou et al., PAMI 2011): split the
    (L2-normalized) vector into M subspaces, store each subvector as the
    index of its nearest codebook centroid — dim x 8 bytes compress to M
    codes. Codebooks = (M, K, dim/M), trained per subspace on a sample
    with plain Lloyd. Stage appends a fixed-size list<int16> code column;
    the payload embedding can then be dropped from downstream exchanges.
    """

    def __init__(self, codebooks: np.ndarray, vec_col: str = "embedding"):
        self.cb = np.asarray(codebooks, dtype=np.float64)  # (M, K, dsub)
        self.vec_col = vec_col

    @staticmethod
    def train(sample: np.ndarray, m: int = 8, k: int = 16, iters: int = 8, seed: int = 42):
        sample = normalize_rows(np.asarray(sample, dtype=np.float64))
        dsub = sample.shape[1] // m
        assert dsub * m == sample.shape[1], "dim must divide into m subspaces"
        return np.stack(
            [
                lloyd_l2(sample[:, i * dsub : (i + 1) * dsub], k, iters, seed + i)
                for i in range(m)
            ]
        )

    def encode(self, vecs: np.ndarray) -> np.ndarray:
        m, k, dsub = self.cb.shape
        v = normalize_rows(np.asarray(vecs, dtype=np.float64))
        codes = np.empty((len(v), m), dtype=np.int16)
        for i in range(m):
            sub = v[:, i * dsub : (i + 1) * dsub]
            # ||x - c||^2 argmin == argmax(x.c - |c|^2/2), one GEMM per subspace
            scores = sub @ self.cb[i].T - 0.5 * (self.cb[i] ** 2).sum(axis=1)[None, :]
            codes[:, i] = np.argmax(scores, axis=1)
        return codes

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.cb.shape[0]
        if batch.num_rows == 0:
            return batch.append_column(
                "pq_code", pa.array([], pa.list_(pa.int16(), m))
            )
        codes = self.encode(_stack_embeddings(batch[self.vec_col]))
        return batch.append_column(
            "pq_code", pa.array(list(codes), pa.list_(pa.int16(), m))
        )


class PQTopK:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query build the
    (M, K) inner-product lookup table against the codebooks ONCE, then
    score each batch by summing M table lookups per row — no float
    reconstruction, no full-dim math in the scan. Emits per-batch local
    top-k per query (combiner); finish with finalize_topk."""

    def __init__(self, codebooks, queries, query_ids, k: int = 10, id_col: str = "vec_id"):
        self.cb = np.asarray(codebooks, dtype=np.float64)
        q = normalize_rows(np.asarray(queries, dtype=np.float64))
        m, kk, dsub = self.cb.shape
        # lut[qi, m, code] = q_sub . codebook[m, code]
        self.lut = np.einsum(
            "qmd,mkd->qmk", q.reshape(len(q), m, dsub), self.cb
        )
        self.query_ids = np.asarray(query_ids)
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        nq = len(self.query_ids)
        ids_t = batch[self.id_col]
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array(self.query_ids).slice(0, 0),
                    self.id_col: ids_t.slice(0, 0),
                    "sim": pa.array([], pa.float64()),
                }
            )
        codes = np.stack(batch["pq_code"].to_numpy(zero_copy_only=False))
        n, m = codes.shape
        sims = np.zeros((n, nq))
        for i in range(m):
            # lut[:, i, codes[:, i]] -> (nq, n); accumulate transposed
            sims += self.lut[:, i, codes[:, i]].T
        ids = ids_t.to_numpy(zero_copy_only=False)
        k = min(self.k, n)
        part = np.argpartition(-sims, k - 1, axis=0)[:k]
        out_q, out_v, out_s = [], [], []
        for qi in range(nq):
            rows = part[:, qi]
            out_q.append(np.full(len(rows), self.query_ids[qi]))
            out_v.append(ids[rows])
            out_s.append(sims[rows, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )
