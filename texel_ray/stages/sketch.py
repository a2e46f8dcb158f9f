"""Mergeable sketches: HyperLogLog approximate distinct counting.

The canonical sketch shape for Ray Data: one sketch per batch emitted by
a vectorized ``map_batches`` (a few KB each), merged associatively in a
tiny final stage — no all-to-all shuffle of the raw keys, unlike exact
distinct. Standard HLL (Flajolet et al.): p index bits -> m=2^p registers
holding max leading-zero ranks; estimate = alpha * m^2 / sum(2^-reg) with
the usual small-range linear-counting correction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash64(values: np.ndarray) -> np.ndarray:
        """Deterministic 64-bit mix (splitmix64) of int64/uint64 values."""
        x = values.astype(np.uint64, copy=True)
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def add_int64(self, values: np.ndarray) -> None:
        h = self._hash64(np.asarray(values))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1
        ranks = np.zeros(len(h), dtype=np.uint8)
        bits = rest
        # vectorized count-leading-zeros via 64 - bit_length
        fl = np.frexp(bits.astype(np.float64))[1]  # ~bit length (ok to 2^53)
        # exact for large values; for safety compute via where on shifted
        ranks = (64 - fl + 1).clip(1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, ranks)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def merge_bytes(self, raw: bytes) -> "HyperLogLog":
        regs = np.frombuffer(raw, dtype=np.uint8)
        np.maximum(self.registers, regs, out=self.registers)
        return self

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.power(2.0, -self.registers.astype(np.float64)))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting
        return float(est)


def hll_partials(
    batch: pa.Table, col: str, group_col: str | None = None, p: int = 12
) -> pa.Table:
    """Per-batch HLL sketches (optionally per group): one row per group
    with the serialized registers."""
    values = batch[col].to_numpy(zero_copy_only=False)
    if group_col is None:
        hll = HyperLogLog(p)
        hll.add_int64(values)
        return pa.table(
            {"group": pa.array(["_all"]), "sketch": pa.array([hll.to_bytes()], pa.binary())}
        )
    groups = batch[group_col].to_numpy(zero_copy_only=False)
    out_g, out_s = [], []
    for g in np.unique(groups):
        hll = HyperLogLog(p)
        hll.add_int64(values[groups == g])
        out_g.append(str(g))
        out_s.append(hll.to_bytes())
    return pa.table({"group": pa.array(out_g), "sketch": pa.array(out_s, pa.binary())})


def hll_merge_estimate(sketch_rows, p: int = 12):
    """Merge serialized sketches per group -> {group: estimate}."""
    merged: dict[str, HyperLogLog] = {}
    for group, raw in sketch_rows:
        merged.setdefault(group, HyperLogLog(p)).merge_bytes(raw)
    return {g: h.estimate() for g, h in merged.items()}


# ---- Bloom filter ----------------------------------------------------------


class BloomFilter:
    """Vectorized Bloom filter over int64 keys (double hashing, k probes).

    The scale path for broadcast anti-joins: ``np.isin`` against an exact
    key array stops fitting at billions of keys; a Bloom filter of the
    same set is ~10 bits/key at 1% FPR and `might_contain` stays a pure
    numpy pass. False positives only PASS keys through to the exact
    confirm step — never drop rows — so anti-join semantics stay exact.
    """

    def __init__(self, n_keys: int, fpr: float = 0.01):
        n_keys = max(1, n_keys)
        m = int(np.ceil(-n_keys * np.log(fpr) / (np.log(2) ** 2)))
        self.m = max(64, m)
        self.k = max(1, int(round(self.m / n_keys * np.log(2))))
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _probe_positions(self, values: np.ndarray, i: int) -> np.ndarray:
        h1 = HyperLogLog._hash64(values)
        h2 = HyperLogLog._hash64(values ^ np.uint64(0xA076_1D64_78BD_642F))
        return (h1 + np.uint64(i) * h2) % np.uint64(self.m)

    def add_int64(self, values: np.ndarray) -> None:
        v = np.asarray(values).astype(np.uint64)
        for i in range(self.k):
            pos = self._probe_positions(v, i)
            np.bitwise_or.at(
                self.bits, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )

    def might_contain(self, values: np.ndarray) -> np.ndarray:
        v = np.asarray(values).astype(np.uint64)
        out = np.ones(len(v), dtype=bool)
        for i in range(self.k):
            pos = self._probe_positions(v, i)
            word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
            if not out.any():
                break
        return out


# ---- t-digest --------------------------------------------------------------


class TDigest:
    """Mergeable quantile sketch (merging t-digest, Dunning & Ertl).

    Per-batch partials carry (mean, weight) centroid arrays — a few KB —
    merged associatively like HLL; quantiles interpolate between centroid
    means. Cluster sizes are bounded by the k1 (arcsine) scale function,
    so tail quantiles (p99) stay tight while the middle compresses.
    """

    def __init__(self, compression: float = 200.0, means=None, weights=None):
        self.compression = float(compression)
        self.means = np.asarray(means if means is not None else [], dtype=np.float64)
        self.weights = np.asarray(
            weights if weights is not None else [], dtype=np.float64
        )

    @staticmethod
    def of(values: np.ndarray, compression: float = 200.0) -> "TDigest":
        d = TDigest(compression)
        values = np.asarray(values, dtype=np.float64)
        values = values[np.isfinite(values)]
        if len(values):
            d._merge_sorted(np.sort(values), np.ones(len(values)))
        return d

    def _k(self, q: np.ndarray) -> np.ndarray:
        # k1 scale function: delta/(2*pi) * asin(2q - 1)
        return (
            self.compression
            / (2.0 * np.pi)
            * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))
        )

    def _merge_sorted(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Merge sorted (means, weights) with the existing centroids."""
        if len(self.means):
            means = np.concatenate((self.means, means))
            weights = np.concatenate((self.weights, weights))
            order = np.argsort(means, kind="stable")
            means, weights = means[order], weights[order]
        total = weights.sum()
        if total == 0:
            return
        # greedy left-to-right clustering bounded by the scale function
        out_m, out_w = [], []
        cum = 0.0
        cur_m, cur_w = means[0], weights[0]
        k_lo = self._k(np.array([0.0]))[0]
        for i in range(1, len(means)):
            q_new = (cum + cur_w + weights[i]) / total
            if self._k(np.array([q_new]))[0] - k_lo <= 1.0:
                cur_m = (cur_m * cur_w + means[i] * weights[i]) / (cur_w + weights[i])
                cur_w += weights[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                k_lo = self._k(np.array([cum / total]))[0]
                cur_m, cur_w = means[i], weights[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def merge(self, other: "TDigest") -> "TDigest":
        if len(other.means):
            order = np.argsort(other.means, kind="stable")
            self._merge_sorted(other.means[order], other.weights[order])
        return self

    def to_arrays(self):
        return self.means, self.weights

    def quantile(self, q: float) -> float:
        if not len(self.means):
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        total = w.sum()
        # centroid midpoints in cumulative-weight space
        cum = np.cumsum(w) - w / 2.0
        target = q * total
        idx = np.searchsorted(cum, target)
        if idx == 0:
            return float(self.means[0])
        if idx >= len(self.means):
            return float(self.means[-1])
        lo, hi = cum[idx - 1], cum[idx]
        frac = 0.0 if hi == lo else (target - lo) / (hi - lo)
        return float(self.means[idx - 1] + frac * (self.means[idx] - self.means[idx - 1]))


def tdigest_partials(
    batch: pa.Table, value_col: str, group_col: str, compression: float = 200.0
) -> pa.Table:
    """Per-batch per-group t-digest partials: (group, means, weights)."""
    df = batch.select([group_col, value_col]).to_pandas()
    groups, means_col, weights_col = [], [], []
    for g, sub in df.groupby(group_col):
        d = TDigest.of(sub[value_col].to_numpy(), compression)
        groups.append(g)
        m, w = d.to_arrays()
        means_col.append(m.tolist())
        weights_col.append(w.tolist())
    return pa.table(
        {
            "group": pa.array(groups),
            "means": pa.array(means_col, pa.list_(pa.float64())),
            "weights": pa.array(weights_col, pa.list_(pa.float64())),
        }
    )


def tdigest_merge_quantiles(
    rows, quantiles=(0.5, 0.9, 0.99), compression: float = 200.0
) -> dict:
    """rows of (group, means, weights) -> {group: [q...]} merged digests."""
    digests: dict = {}
    for group, means, weights in rows:
        d = digests.setdefault(group, TDigest(compression))
        d.merge(TDigest(compression, means, weights))
    return {
        g: [d.quantile(q) for q in quantiles] for g, d in digests.items()
    }


class CountMinSketch:
    """Count-min sketch (Cormode & Muthukrishnan): depth x width counter
    matrix, row i indexed by (h1 + i*h2) mod width over a 64-bit mix of
    the key. Mergeable by element-wise sum; estimates NEVER undercount
    (est >= true), which is what makes the heavy-hitters pipeline exact:
    the sketch is only a candidate prefilter, an exact groupby confirms.
    """

    def __init__(self, width: int = 8192, depth: int = 4):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)

    @staticmethod
    def hash_tokens(tokens: np.ndarray) -> np.ndarray:
        """Deterministic vectorized uint64 hash of string tokens."""
        import pandas as pd

        return pd.util.hash_array(np.asarray(tokens, dtype=object))

    def _rows(self, h: np.ndarray) -> np.ndarray:
        h1 = HyperLogLog._hash64(h)
        h2 = HyperLogLog._hash64(h ^ np.uint64(0xDEADBEEFCAFEF00D)) | np.uint64(1)
        return np.stack(
            [
                ((h1 + np.uint64(i) * h2) % np.uint64(self.width)).astype(np.int64)
                for i in range(self.depth)
            ]
        )

    def add(self, h: np.ndarray, counts: np.ndarray) -> None:
        idx = self._rows(h)
        for i in range(self.depth):
            np.add.at(self.table[i], idx[i], counts.astype(np.int64))

    def estimate(self, h: np.ndarray) -> np.ndarray:
        idx = self._rows(h)
        ests = np.stack([self.table[i][idx[i]] for i in range(self.depth)])
        return ests.min(axis=0)

    def to_bytes(self) -> bytes:
        return self.table.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes, width: int = 8192, depth: int = 4):
        cms = cls(width, depth)
        cms.table = np.frombuffer(buf, dtype="<i8").reshape(depth, width).copy()
        return cms

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.table += other.table
        return self
