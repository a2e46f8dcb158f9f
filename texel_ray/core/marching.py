"""Raster -> vector: marching-squares contour extraction over binary
masks — the inverse direction of the engine's raster tile cutting
(tilecut) and the vector clipping (vectorcut), completing the
raster<->vector pair the north rule names.

Midpoint rule (no interpolation): contour vertices sit at pixel-edge
midpoints, expressed in HALF-UNIT integer coordinates (x = 2*col + 1
on a horizontal edge, etc.), so every output is exact integer math —
deterministic across platforms and safely hashable by goldens.

Saddle cells (both diagonals set) use the fixed "center false" rule:
diagonal foreground pixels remain separate loops. The mask is padded
with one false ring so every contour closes. Each crossed pixel edge
is shared by exactly two cells, giving every contour vertex degree 2 —
the segment soup decomposes into disjoint closed loops, traced
deterministically from the lexicographically smallest unused vertex.
"""

from __future__ import annotations

import numpy as np


# Directed case table: per 4-bit corner code (TL*8 | TR*4 | BR*2 | BL*1),
# segments as (from_edge, to_edge) with edge ids T=0, R=1, B=2, L=3.
# Direction convention: foreground on the RIGHT of travel in screen
# coords (y down) == POSITIVE shoelace for fg outer loops; complements
# reverse direction; saddles
# (5, 10) use the fixed center-false rule (diagonal fg pixels separate).
# Consistent orientation makes every fg outer loop one winding and every
# hole the opposite — signed shoelace areas add up to the fg area.
_LUT: list[list[tuple[int, int]]] = [
    [],            # 0
    [(3, 2)],      # 1  BL
    [(2, 1)],      # 2  BR
    [(3, 1)],      # 3  BL+BR
    [(1, 0)],      # 4  TR
    [(1, 0), (3, 2)],  # 5  TR+BL saddle
    [(2, 0)],      # 6  TR+BR
    [(3, 0)],      # 7  all but TL
    [(0, 3)],      # 8  TL
    [(0, 2)],      # 9  TL+BL
    [(0, 3), (2, 1)],  # 10 TL+BR saddle
    [(0, 1)],      # 11 all but TR
    [(1, 3)],      # 12 TL+TR
    [(1, 2)],      # 13 all but BR
    [(2, 3)],      # 14 all but BL
    [],            # 15
]


def marching_squares(mask: np.ndarray) -> list[np.ndarray]:
    """Extract closed contour loops from a 2D boolean mask.

    Returns a list of (n, 2) int64 arrays of (x, y) vertices in
    half-unit coordinates (pixel (r, c) spans x in [2c, 2c+2], y in
    [2r, 2r+2] after the 1-pixel false padding shift of +2)."""
    m = np.pad(np.asarray(mask, dtype=bool), 1, constant_values=False)
    h, w = m.shape
    tl = m[:-1, :-1]
    tr = m[:-1, 1:]
    br = m[1:, 1:]
    bl = m[1:, :-1]
    code = (
        tl.astype(np.int8) * 8
        + tr.astype(np.int8) * 4
        + br.astype(np.int8) * 2
        + bl.astype(np.int8)
    )
    ri, ci = np.nonzero((code != 0) & (code != 15))
    # edge-midpoint coordinates per cell (half units): cell (r, c) covers
    # corners (r, c)..(r+1, c+1); T midpoint = (2c+1, 2r), R = (2c+2,
    # 2r+1), B = (2c+1, 2r+2), L = (2c, 2r+1)

    def edge_pt(e: int, r: int, c: int) -> tuple[int, int]:
        if e == 0:
            return (2 * c + 1, 2 * r)
        if e == 1:
            return (2 * c + 2, 2 * r + 1)
        if e == 2:
            return (2 * c + 1, 2 * r + 2)
        return (2 * c, 2 * r + 1)

    # directed successor map: every vertex has exactly one outgoing and
    # one incoming segment under the consistent fg-left orientation
    nextp: dict[tuple[int, int], tuple[int, int]] = {}
    for r, c in zip(ri.tolist(), ci.tolist()):
        for ea, eb in _LUT[code[r, c]]:
            nextp[edge_pt(ea, r, c)] = edge_pt(eb, r, c)

    loops: list[np.ndarray] = []
    seen: set[tuple[int, int]] = set()
    for start in sorted(nextp):
        if start in seen:
            continue
        loop = [start]
        seen.add(start)
        cur = nextp[start]
        while cur != start:
            loop.append(cur)
            seen.add(cur)
            cur = nextp[cur]
        loops.append(np.asarray(loop, dtype=np.int64))
    return loops


def loop_perimeter(loop: np.ndarray) -> int:
    """Total L1 length of a loop in half-units (segments are axis-
    aligned or diagonal between adjacent edge midpoints; L1 length of
    each marching-squares segment is 2)."""
    d = np.abs(np.diff(np.vstack([loop, loop[:1]]), axis=0))
    return int(d.sum())


def loop_area2(loop: np.ndarray) -> int:
    """Twice the signed shoelace area (half-unit coords), as exact int."""
    x, y = loop[:, 0], loop[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return int(np.sum(x * y2 - x2 * y))


def vectorize_mask(mask: np.ndarray) -> dict:
    """Summary stats of a mask's marching-squares vectorization:
    loop count, total perimeter (half-units), total |area| (quarter
    pixel^2 units), and a CRC of the concatenated vertex stream."""
    import zlib

    loops = marching_squares(mask)
    perim = sum(loop_perimeter(lp) for lp in loops)
    area2 = sum(abs(loop_area2(lp)) for lp in loops)
    if loops:
        stream = np.concatenate(loops).astype("<i8").tobytes()
    else:
        stream = b""
    return {
        "n_loops": len(loops),
        "perimeter": perim,
        "area2": area2,
        "crc": zlib.crc32(stream),
    }


def _edge_xy(e: int, r: np.ndarray, c: np.ndarray):
    """Vectorized edge-midpoint coordinates (same mapping as edge_pt)."""
    if e == 0:
        return 2 * c + 1, 2 * r
    if e == 1:
        return 2 * c + 2, 2 * r + 1
    if e == 2:
        return 2 * c + 1, 2 * r + 2
    return 2 * c, 2 * r + 1


def vectorize_masks(masks: np.ndarray) -> list[dict]:
    """Batched ``vectorize_mask`` over a (B, H, W) boolean stack —
    output is IDENTICAL per image (same loop discovery order, same CRC),
    but the code grid, the segment soup and the successor map are built
    ONCE for the whole batch: tiny masks (16x16 tiles) are bound by
    per-call numpy/dict overhead, not by contour length. Vertex keys
    embed the batch index (b << 44 | x << 21 | y), so walks can never
    cross images and ascending-key discovery order equals the per-image
    lexicographic (x, y) order the scalar kernel uses."""
    import zlib

    B, H, W = masks.shape
    # key packing holds y in 21 bits and x in 23: beyond that the batch
    # kernel would silently merge vertices — fall back to the scalar
    # kernel (correct at any size) instead
    if 2 * (H + 2) >= (1 << 21) or 2 * (W + 2) >= (1 << 23):
        return [vectorize_mask(m) for m in masks]
    m = np.zeros((B, H + 2, W + 2), dtype=bool)
    m[:, 1:-1, 1:-1] = masks
    tl = m[:, :-1, :-1].astype(np.int8)
    tr = m[:, :-1, 1:].astype(np.int8)
    br = m[:, 1:, 1:].astype(np.int8)
    bl = m[:, 1:, :-1].astype(np.int8)
    code = tl * 8 + tr * 4 + br * 2 + bl
    bi, ri, ci = np.nonzero((code != 0) & (code != 15))
    cv = code[bi, ri, ci]

    src_parts, dst_parts = [], []
    for k in range(1, 15):
        sel = np.nonzero(cv == k)[0]
        if not len(sel):
            continue
        r, c, b = ri[sel], ci[sel], bi[sel].astype(np.int64)
        for ea, eb in _LUT[k]:
            sx, sy = _edge_xy(ea, r, c)
            dx, dy = _edge_xy(eb, r, c)
            src_parts.append((b << 44) | (sx.astype(np.int64) << 21) | sy)
            dst_parts.append((b << 44) | (dx.astype(np.int64) << 21) | dy)
    out = [
        {"n_loops": 0, "perimeter": 0, "area2": 0, "crc": zlib.crc32(b"")}
        for _ in range(B)
    ]
    if not src_parts:
        return out
    src = np.concatenate(src_parts)
    dst = np.concatenate(dst_parts)
    order = np.argsort(src, kind="stable")  # vertex out-degree is exactly 1
    ssrc = src[order]
    succ = np.searchsorted(ssrc, dst[order])
    xs = ((ssrc >> 21) & 0x7FFFFF).astype(np.int64)
    ys = (ssrc & 0x1FFFFF).astype(np.int64)
    bs = (ssrc >> 44).astype(np.int64)

    # walk every cycle once, in ascending-key start order (= the scalar
    # kernel's sorted() discovery order); plain python ints + bytearray
    # keep the only sequential part at ~100ns/vertex
    n = len(ssrc)
    succ_l = succ.tolist()
    visited = bytearray(n)
    walk: list[int] = []
    loop_starts: list[int] = []
    for start in range(n):
        if visited[start]:
            continue
        loop_starts.append(len(walk))
        cur = start
        while not visited[cur]:
            visited[cur] = 1
            walk.append(cur)
            cur = succ_l[cur]
    ord_arr = np.asarray(walk, dtype=np.int64)
    starts = np.asarray(loop_starts, dtype=np.int64)
    loop_len = np.diff(np.concatenate((starts, [n])))
    loop_b = bs[ord_arr[starts]]

    # per-loop stats, vectorized: every marching segment has L1 length 2,
    # so perimeter = 2 * n_vertices; signed shoelace via the successor
    # permutation + reduceat (exact int64)
    nxt = succ[ord_arr]
    cross = xs[ord_arr] * ys[nxt] - xs[nxt] * ys[ord_arr]
    area_per_loop = np.abs(np.add.reduceat(cross, starts))

    n_loops_b = np.bincount(loop_b, minlength=B)
    perim_b = 2 * np.bincount(loop_b, weights=loop_len, minlength=B).astype(
        np.int64
    )
    area_b = np.bincount(loop_b, weights=area_per_loop, minlength=B).astype(
        np.int64
    )
    # ascending-key starts mean each image's loops are CONTIGUOUS in the
    # walk: per-image vertex stream = one slice of the global stream
    stream = np.column_stack((xs[ord_arr], ys[ord_arr])).astype("<i8").tobytes()
    verts_b = np.bincount(loop_b, weights=loop_len, minlength=B).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(verts_b)))
    mv = memoryview(stream)
    for b in range(B):
        if n_loops_b[b]:
            out[b] = {
                "n_loops": int(n_loops_b[b]),
                "perimeter": int(perim_b[b]),
                "area2": int(area_b[b]),
                "crc": zlib.crc32(mv[offs[b] * 16 : offs[b + 1] * 16]),
            }
    return out
