"""Aperture-7 hierarchical hexagonal grid over the WebMercator plane —
the H3-cell-hierarchy role of the north rule (H3/S2 cell encoding over
image geotags), built from scratch on the published aperture-7 lattice
construction (the same parent/child scheme H3 uses per icosahedron face;
see Sahr, White & Kimerling, "Geodesic Discrete Global Grid Systems",
CaGIS 30(2), 2003).

Scope note (honest): this is the PLANAR aperture-7 hierarchy on the
WebMercator plane, not canonical H3 — the icosahedral gnomonic
projection and H3's 122-base-cell table are out of scope (no `h3`
library exists in this environment to verify index parity against, and
re-deriving the base-cell tables without a cross-check would be
unverifiable). The spherical-cell role is covered by `core/s2.py`,
which IS canonical S2. What this module provides — and what the
pipelines exercise — is the full hierarchy semantics: multi-resolution
cell assignment, aperture-7 parent/child, k-ring neighborhoods, and
compact/uncompact, all vectorized over numpy arrays.

Construction
------------
Resolution 0 is a regular hex lattice with size ``S0`` metres (axial
coordinates via the standard pointy-top transform, matching
``stages/tiles.hex_bin``).  Each finer resolution is the aperture-7
sub-lattice: 7× cell density, rotated by atan2(-3, 5*sqrt(3)) ≈ -19.107°.
In axial integer coordinates the coarse basis, expressed in fine-lattice
coordinates, is the column matrix

    M = | 2  -1 |
        | 1   3 |        (det M = 7)

so fractional axial coords at res r are ``f_r = M^r @ f_0`` and the
aperture-7 parent of a fine cell is ``cube_round(M^-1 @ (q, r))`` with
``M^-1 = (1/7) [[3, 1], [-1, 2]]``.  One checks that ``B0 @ M^-1`` is
the res-0 Cartesian basis scaled by 1/sqrt(7) and rotated by -19.107°,
i.e. every resolution is again a regular hex lattice, so cube rounding
in axial coordinates is the exact Voronoi assignment at every level.

As in H3, children do not nest exactly inside parents: a point near a
cell edge may have ``cell(p, r).parent != cell(p, r-1)``.  The
invariants that DO hold (and are pytest-pinned) are
``parent(center(c)) == parent(c)``, ``c in children(parent(c))``, and
``compact(uncompact(cells)) == cells``.

Cell ids pack (res, q, r) into one int64: res in bits 56..61, q and r
as 28-bit two's-complement fields — at MAX_RES=15 the axial magnitude
is ~2.6e7 < 2^27, so the packing is lossless over the Mercator square.
"""

from __future__ import annotations

import numpy as np

# Res-0 cell size (metres, WebMercator). ~3,500 km puts the Mercator
# square (40,075 km) at ~11 res-0 cells across; res 15 is ~16 m.
S0 = 3_500_000.0
MAX_RES = 15
SQRT3 = np.sqrt(3.0)

# Aperture-7 coarse->fine basis in axial ints (columns (2,1) and (-1,3)).
M = np.array([[2, -1], [1, 3]], dtype=np.int64)
# M^-1 * 7 (integer form; divide by 7 when used).
MINV7 = np.array([[3, 1], [-1, 2]], dtype=np.int64)

_Q_BITS = 28
_Q_MASK = (1 << _Q_BITS) - 1


def m_pow(res: int) -> np.ndarray:
    """Integer matrix power M^res (exact in int64 for res <= MAX_RES)."""
    out = np.eye(2, dtype=np.int64)
    for _ in range(res):
        out = out @ M
    return out


def cube_round(fq: np.ndarray, fr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-hex-center rounding of fractional axial coords.

    Identical arithmetic to ``stages/tiles.hex_bin`` (floor(x+0.5)
    half-away-up) so the SQL oracles mirror it 1:1.
    """
    cx, cz = fq, fr
    cy = -cx - cz
    rx = np.floor(cx + 0.5)
    ry = np.floor(cy + 0.5)
    rz = np.floor(cz + 0.5)
    dx, dy, dz = np.abs(rx - cx), np.abs(ry - cy), np.abs(rz - cz)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    fix_z = ~fix_x & ~fix_y
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def axial_frac0(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Fractional res-0 axial coords of WebMercator points."""
    q = (x * (SQRT3 / 3.0) - y * (1.0 / 3.0)) / S0
    r = (y * (2.0 / 3.0)) / S0
    return q, r


def point_to_cell(x: np.ndarray, y: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Axial (q, r) of the res-``res`` cell containing each point."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    q0, r0 = axial_frac0(np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))
    mp = m_pow(res)
    fq = mp[0, 0] * q0 + mp[0, 1] * r0
    fr = mp[1, 0] * q0 + mp[1, 1] * r0
    return cube_round(fq, fr)


def cell_center(q: np.ndarray, r: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """WebMercator (x, y) of cell centers (inverse of the axial transform)."""
    mp = m_pow(res)
    # f_0 = M^-res @ (q, r); invert the 2x2 exactly via adjugate / det.
    det = float(mp[0, 0] * mp[1, 1] - mp[0, 1] * mp[1, 0])  # = 7^res
    f0q = (mp[1, 1] * q - mp[0, 1] * r) / det
    f0r = (-mp[1, 0] * q + mp[0, 0] * r) / det
    x = (f0q * SQRT3 + f0r * (SQRT3 / 2.0)) * S0
    y = f0r * 1.5 * S0
    return x, y


def parent(q: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Aperture-7 parent cell (res-1) of res-r cells: cube_round(M^-1 @ c)."""
    fq = (MINV7[0, 0] * q + MINV7[0, 1] * r) / 7.0
    fr = (MINV7[1, 0] * q + MINV7[1, 1] * r) / 7.0
    return cube_round(fq, fr)


# k-ring offsets for k=2 around the origin (used by children()); axial
# spiral directions, standard.
_DIRS = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64)


def kring_offsets(k: int) -> np.ndarray:
    """All axial offsets within hex distance k (1 + 3k(k+1) of them)."""
    offs = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            offs.append((dq, dr))
    return np.array(offs, dtype=np.int64)


def children(q: int, r: int) -> np.ndarray:
    """The res+1 cells whose aperture-7 parent is (q, r), as an (n, 2)
    array. Exactly 7 per parent (center child + the 6 fine cells whose
    centers fall in the parent hex)."""
    cq = M[0, 0] * q + M[0, 1] * r
    cr = M[1, 0] * q + M[1, 1] * r
    cand = kring_offsets(2) + np.array([cq, cr], dtype=np.int64)
    pq, pr = parent(cand[:, 0], cand[:, 1])
    mask = (pq == q) & (pr == r)
    out = cand[mask]
    return out[np.lexsort((out[:, 1], out[:, 0]))]


def hex_distance(q1, r1, q2, r2):
    """Hex (cube) distance between axial cells."""
    dq = np.asarray(q1) - np.asarray(q2)
    dr = np.asarray(r1) - np.asarray(r2)
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def pack(res, q, r):
    """(res, q, r) -> int64 cell id."""
    res = np.asarray(res, dtype=np.int64)
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    return (res << 56) | ((q & _Q_MASK) << _Q_BITS) | (r & _Q_MASK)


def unpack(cell):
    """int64 cell id -> (res, q, r) with sign extension."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> 56
    q = (cell >> _Q_BITS) & _Q_MASK
    r = cell & _Q_MASK
    sign = np.int64(1) << (_Q_BITS - 1)
    q = (q ^ sign) - sign
    r = (r ^ sign) - sign
    return res, q, r


def compact(cells: np.ndarray) -> np.ndarray:
    """H3-style compact: wherever all 7 children of a parent are present
    at some resolution, replace them with the parent; repeat upward.
    ``cells`` is an int64 array of packed ids (mixed resolutions allowed);
    returns the compacted sorted id set. Pure numpy, cell-cardinality
    sized — runs on aggregated cell sets, never raw rows."""
    out: list[np.ndarray] = []
    cells = np.unique(np.asarray(cells, dtype=np.int64))
    while cells.size:
        res, q, r = unpack(cells)
        finest = int(res.max())
        at = res == finest
        if finest == 0:
            out.append(cells)
            break
        fq, fr = q[at], r[at]
        pq, pr = parent(fq, fr)
        pid = pack(np.full(pq.shape, finest - 1, dtype=np.int64), pq, pr)
        uniq, cnt = np.unique(pid, return_counts=True)
        full = uniq[cnt == 7]
        # children of a full parent are absorbed; the rest stay terminal.
        absorbed = np.isin(pid, full)
        out.append(cells[at][~absorbed])
        # full parents re-enter at res-1 and may complete a set there;
        # dedupe in case the parent was already present in the input.
        cells = np.unique(np.concatenate([cells[~at], full]))
    return np.sort(np.concatenate(out)) if out else np.array([], dtype=np.int64)


def uncompact(cells: np.ndarray, res: int) -> np.ndarray:
    """Expand packed ids down to uniform resolution ``res``."""
    cells = np.asarray(cells, dtype=np.int64)
    todo = cells
    done: list[np.ndarray] = []
    while todo.size:
        cres, q, r = unpack(todo)
        if np.any(cres > res):
            raise ValueError("uncompact target res coarser than an input cell")
        at = cres == res
        done.append(todo[at])
        rest_res, rest_q, rest_r = cres[~at], q[~at], r[~at]
        nxt = []
        for rr, qq, rrr in zip(rest_res, rest_q, rest_r):
            ch = children(int(qq), int(rrr))
            nxt.append(pack(np.full(len(ch), rr + 1, dtype=np.int64), ch[:, 0], ch[:, 1]))
        todo = np.concatenate(nxt) if nxt else np.array([], dtype=np.int64)
    return np.sort(np.concatenate(done)) if done else np.array([], dtype=np.int64)


def polyfill(rings_xy: list, res: int) -> tuple[np.ndarray, np.ndarray]:
    """H3-style polygonToCells: all res-``res`` cells whose CENTER lies
    inside the polygon (outer ring + optional holes, WebMercator
    coords, even-odd rule). Candidate lattice range from the bbox's
    fractional axial coords (padded by 1); containment vectorized.

    Center-in-polygon is the standard polyfill semantics (cells
    straddling the boundary belong to whichever side holds their
    center), making disjoint polygons' fills disjoint."""
    outer = np.asarray(rings_xy[0], dtype=np.float64)
    mp = m_pow(res)
    # fractional axial coords of the outer ring's vertices
    q0, r0 = axial_frac0(outer[:, 0], outer[:, 1])
    fq = mp[0, 0] * q0 + mp[0, 1] * r0
    fr = mp[1, 0] * q0 + mp[1, 1] * r0
    qmin, qmax = int(np.floor(fq.min())) - 1, int(np.ceil(fq.max())) + 1
    rmin, rmax = int(np.floor(fr.min())) - 1, int(np.ceil(fr.max())) + 1
    qq, rr = np.meshgrid(
        np.arange(qmin, qmax + 1, dtype=np.int64),
        np.arange(rmin, rmax + 1, dtype=np.int64),
        indexing="ij",
    )
    qq, rr = qq.ravel(), rr.ravel()
    cx, cy = cell_center(qq, rr, res)
    inside = np.zeros(len(cx), dtype=bool)
    for i, ring in enumerate(rings_xy):
        pts = np.asarray(ring, dtype=np.float64)
        x1, y1 = pts[:, 0], pts[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        # even-odd crossing number, vectorized (centers x edges)
        crosses = (y1[None, :] > cy[:, None]) != (y2[None, :] > cy[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1)[None, :] * (cy[:, None] - y1[None, :]) / (
                y2 - y1
            )[None, :] + x1[None, :]
        hits = crosses & (cx[:, None] < xint)
        inside ^= (hits.sum(axis=1) % 2).astype(bool)
    return qq[inside], rr[inside]


def cell_to_boundary(q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    """Hexagon boundary vertices of cells (H3 cellToBoundary role):
    (n, 6, 2) array, CCW from the eastern vertex. Vertices are the
    centroids of the three cells meeting at each corner, computed as
    center + rotated unit offsets of the res lattice (exact for every
    resolution because each level is a regular hex lattice — the
    aperture rotation is applied via the basis itself)."""
    cx, cy = cell_center(np.asarray(q), np.asarray(r), res)
    # two lattice basis vectors in the plane at this res
    e1x, e1y = cell_center(np.asarray(q) + 1, np.asarray(r), res)
    e2x, e2y = cell_center(np.asarray(q), np.asarray(r) + 1, res)
    b1 = np.stack([e1x - cx, e1y - cy], axis=-1)  # neighbor offsets
    b2 = np.stack([e2x - cx, e2y - cy], axis=-1)
    # hex corner = (b_i + b_j) / 3 for the 6 adjacent neighbor pairs
    # around the cell: neighbors in axial order (1,0),(0,1),(-1,1),
    # (-1,0),(0,-1),(1,-1)
    n1 = b1
    n2 = b2
    n3 = b2 - b1
    n4 = -b1
    n5 = -b2
    n6 = b1 - b2
    ring = [n1, n2, n3, n4, n5, n6]
    corners = []
    for a, b in zip(ring, ring[1:] + ring[:1]):
        corners.append((a + b) / 3.0)
    out = np.stack(corners, axis=-2)  # (n, 6, 2)
    return out + np.stack([cx, cy], axis=-1)[..., None, :]
