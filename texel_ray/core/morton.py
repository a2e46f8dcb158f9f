"""Morton (Z-order) interleaving of (x, y) -> uint64 quadrant keys.

Semantics match the reference (``morton/morton.go:22-48``): x occupies the
even bits, y the odd bits (``z = x | y << 1``). Scalar variants for the
per-polygon quadtree; vectorized numpy variants for dataset-level cell
encoding (the S2/H3-style ``cell`` column).
"""

from __future__ import annotations

import numpy as np

_MASKS = (
    0x5555555555555555,
    0x3333333333333333,
    0x0F0F0F0F0F0F0F0F,
    0x00FF00FF00FF00FF,
    0x0000FFFF0000FFFF,
    0x00000000FFFFFFFF,
)
_U64 = (1 << 64) - 1
_MAX_U32 = 0xFFFFFFFF


def to_z(x: int, y: int) -> int:
    """Interleave x (even bits) and y (odd bits). x, y must fit in uint32."""
    if x > _MAX_U32 or y > _MAX_U32 or x < 0 or y < 0:
        raise ValueError(f"cannot make Z out of {x} and {y}")
    for i in (4, 3, 2, 1, 0):
        x = (x | (x << (1 << i))) & _MASKS[i]
        y = (y | (y << (1 << i))) & _MASKS[i]
    return x | (y << 1)


def from_z(z: int) -> tuple[int, int]:
    """Deinterleave a Z key back into (x, y)."""
    x = z & _U64
    y = (z >> 1) & _U64
    for i, shift in enumerate((0, 1, 2, 4, 8, 16)):
        x = (x | (x >> shift)) & _MASKS[i]
        y = (y | (y >> shift)) & _MASKS[i]
    return x, y


def to_z_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized interleave over uint64 arrays (values must fit uint32)."""
    x = np.asarray(x, dtype=np.uint64).copy()
    y = np.asarray(y, dtype=np.uint64).copy()
    for i in (4, 3, 2, 1, 0):
        shift = np.uint64(1 << i)
        mask = np.uint64(_MASKS[i])
        x = (x | (x << shift)) & mask
        y = (y | (y << shift)) & mask
    return x | (y << np.uint64(1))


def from_z_np(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized deinterleave of uint64 Z keys -> (x, y) uint64 arrays."""
    z = np.asarray(z, dtype=np.uint64)
    x = z.copy()
    y = z >> np.uint64(1)
    for i, s in enumerate((0, 1, 2, 4, 8, 16)):
        shift = np.uint64(s)
        mask = np.uint64(_MASKS[i])
        x = (x | (x >> shift)) & mask
        y = (y | (y >> shift)) & mask
    return x, y


def hilbert_xy2d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized Hilbert-curve index (x, y) -> d on a 2^order grid.

    The classic iterative quadrant-rotation walk (public construction,
    e.g. Wikipedia "Hilbert curve", converted from the per-point loop to
    numpy over all points; 'order' fixed iterations). Unlike Morton,
    consecutive d are always 4-adjacent, so equi-count d-ranges make
    spatially-compact shuffle partitions."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        m = ry == 0
        flip = m & (rx == 1)
        x[flip] = s - 1 - x[flip]
        y[flip] = s - 1 - y[flip]
        xs = x[m].copy()
        x[m] = y[m]
        y[m] = xs
        s >>= 1
    return d
