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
