"""S2 cell ids from scratch (public s2geometry algorithm, vectorized).

A 64-bit S2 cell id encodes (face 0..5, Hilbert-curve position at level
30) as ``face(3 bits) | curve position (2*30 bits) | sentinel 1``. The
construction follows the published S2 scheme:

- lon/lat -> unit XYZ -> dominant-axis cube face + (u, v) in [-1, 1];
- quadratic projection u -> s (the published C++ default) warps the cube
  so cells have near-uniform area;
- (s, t) -> discrete (i, j) at 2^30; i/j -> Hilbert position by the
  4-level-at-a-time lookup-table walk with orientation swap/invert bits.

Everything here is vectorized numpy over coordinate arrays — the cell
encode is a per-batch ``map_batches`` kernel at any level. Locality:
consecutive Hilbert positions are adjacent on the sphere, so
range-partitioning on cell id keeps spatial neighbors in the same shard
(the same role Morton z-order plays for the TMS tile grid, with better
worst-case locality).

No code from the s2geometry repo is used; this derives from the
published algorithm description (lookup tables computed at import).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4

# Hilbert sub-cell orders per orientation, from the S2 paper's two
# modifier bits (swap, invert): position -> (i, j) bit pair, plus the
# orientation modifiers applied for the next level.
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical order
        [0, 2, 3, 1],  # swap
        [3, 2, 0, 1],  # invert
        [3, 1, 0, 2],  # swap + invert
    ],
    dtype=np.uint64,
)
_SWAP_MASK = 1
_INVERT_MASK = 2
_POS_TO_ORIENTATION = np.array(
    [_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK], dtype=np.uint64
)


def _build_lookup():
    """(i j bits interleaved, orientation) -> (hilbert pos, orientation),
    4 levels at a time (the standard S2 lookup-table construction)."""
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)

    def init_lookup_cell(level, i, j, orig_orientation, pos, orientation):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for index in range(4):
            ij = int(r[index])
            init_lookup_cell(
                level,
                i + (ij >> 1),
                j + (ij & 1),
                orig_orientation,
                pos + index,
                orientation ^ int(_POS_TO_ORIENTATION[index]),
            )

    for orientation in range(4):
        init_lookup_cell(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup()


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    """Dominant-axis cube face (0..5) + (u, v) gnomonic coordinates."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    m = face == 0
    u[m], v[m] = y[m] / x[m], z[m] / x[m]
    m = face == 1
    u[m], v[m] = -x[m] / y[m], z[m] / y[m]
    m = face == 2
    u[m], v[m] = -x[m] / z[m], -y[m] / z[m]
    m = face == 3
    u[m], v[m] = z[m] / x[m], y[m] / x[m]
    m = face == 4
    u[m], v[m] = z[m] / y[m], -x[m] / y[m]
    m = face == 5
    u[m], v[m] = -y[m] / z[m], -x[m] / z[m]
    return face, u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's default quadratic projection (area-uniformizing)."""
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(
        (np.floor((1 << MAX_LEVEL) * s)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1
    )


def cell_id_from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """(face, i, j at level 30) -> 64-bit leaf cell id (vectorized
    lookup-table Hilbert walk, 4 bits of i/j per step)."""
    n = np.asarray(face, dtype=np.uint64) << np.uint64(2 * MAX_LEVEL)
    bits = np.asarray(face, dtype=np.uint64) & np.uint64(_SWAP_MASK)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        ib = (i >> np.uint64(k * _LOOKUP_BITS)) & mask
        jb = (j >> np.uint64(k * _LOOKUP_BITS)) & mask
        bits += (ib << np.uint64(_LOOKUP_BITS + 2)) + (jb << np.uint64(2))
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP_MASK | _INVERT_MASK)
    return n * np.uint64(2) + np.uint64(1)  # leaf sentinel bit


def face_ij_from_cell_id(cell_id: np.ndarray):
    """Leaf cell id -> (face, i, j): the inverse lookup-table walk (the
    top step consumes the 2 leftover bits of the 30-bit i/j)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    face = (cell_id >> np.uint64(2 * MAX_LEVEL + 1)).astype(np.int64)
    bits = (np.asarray(face, dtype=np.uint64)) & np.uint64(_SWAP_MASK)
    i = np.zeros(cell_id.shape, dtype=np.uint64)
    j = np.zeros(cell_id.shape, dtype=np.uint64)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * _LOOKUP_BITS) if k == 7 else _LOOKUP_BITS
        bits += (
            (cell_id >> np.uint64(k * 2 * _LOOKUP_BITS + 1))
            & np.uint64((1 << (2 * nbits)) - 1)
        ) << np.uint64(2)
        bits = _LOOKUP_IJ[bits]
        i += (bits >> np.uint64(_LOOKUP_BITS + 2)) << np.uint64(k * _LOOKUP_BITS)
        j += (
            (bits >> np.uint64(2)) & np.uint64((1 << _LOOKUP_BITS) - 1)
        ) << np.uint64(k * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP_MASK | _INVERT_MASK)
    return face, i.astype(np.int64), j.astype(np.int64)


def cell_id_from_lonlat(lon, lat, level: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized lon/lat -> S2 cell id at `level` (uint64)."""
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    leaf = cell_id_from_face_ij(face, i, j)
    return parent(leaf, level)


def parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell id at `level` (clears trailing bits, sets sentinel)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (cell_id & ~(lsb - np.uint64(1))) | lsb


def level_of(cell_id) -> np.ndarray:
    """Level of a cell id = MAX_LEVEL - (trailing-zero count / 2)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    tz = np.zeros(cell_id.shape, dtype=np.int64)
    x = cell_id.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = (x & np.uint64((1 << shift) - 1)) == 0
        tz[m] += shift
        x[m] >>= np.uint64(shift)
    return MAX_LEVEL - tz // 2


def cell_range(cell_id):
    """[range_min, range_max] of leaf ids contained in this cell — the
    property that makes cell ids range-partitionable."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    lsb = cell_id & (~cell_id + np.uint64(1))
    return cell_id - (lsb - np.uint64(1)), cell_id + (lsb - np.uint64(1))


def cell_token(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Compact GROUPING token for same-level cell ids: ``face|pos`` with
    the sentinel+zero tail shifted out, so all key entropy sits in the
    LOW ``2*level + 3`` bits.

    Why this exists: canonical ids at level L share their low
    ``2*(30-L)+1`` bits (sentinel then zeros). Hash aggregators that
    derive the bucket index from the key's low bits — pyarrow's
    ``Table.group_by`` does — then put EVERY key in one bucket and probe
    quadratically: grouping 600k level-8 ids measured 96s vs 0.06s on
    tokens. Group on the token, restore ids with ``token_to_cell_id``.
    """
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    return cell_id >> np.uint64(2 * (MAX_LEVEL - level) + 1)


def token_to_cell_id(tok: np.ndarray, level: int) -> np.ndarray:
    """Inverse of ``cell_token``: re-append sentinel + zero tail."""
    tok = np.asarray(tok, dtype=np.uint64)
    shift = np.uint64(2 * (MAX_LEVEL - level) + 1)
    return (tok << shift) | (np.uint64(1) << (shift - np.uint64(1)))
