"""Topology-preserving per-zoom polygon simplification (Visvalingam–
Whyatt with a self-intersection guard) — the north-star's
"topology-preserving simplification per zoom level" as an explicit
operator.

Relationship to the snap kernel: the reference (texel) achieves its
per-zoom generalization by snapping to the zoom's fixed-point grid
(core/snap.py replicates that bit-exactly). This module adds the
classic cartographic complement: effective-area (Visvalingam–Whyatt)
vertex elimination with the threshold tied to the zoom's pixel size,
so a polygon keeps only vertices whose removal would visibly change it
at that zoom.

Semantics
---------
- Effective area of a vertex = area of the triangle (prev, v, next).
  Vertices are removed smallest-first (min-heap with lazy invalidation)
  until every remaining vertex's effective area >= ``min_area``.
- Topology guard (``preserve_topology=True``): a removal is skipped if
  the replacement segment (prev, next) properly crosses any other
  surviving segment of the SAME feature (all rings — so an outer ring
  can never be pulled across its holes, and a ring can't self-cross).
  Blocked vertices are re-examined when a neighbor is removed; the
  guard is conservative (a vertex whose blocking segment later
  disappears stays blocked unless adjacent to a removal), which can
  only under-simplify, never break topology. Cross-FEATURE shared-arc
  topology (dissolving shared boundaries between adjacent polygons) is
  out of scope, as in standard per-feature simplifiers.
- Rings that collapse below a triangle while still under threshold are
  dropped whole (tiny holes/islands vanish at coarse zooms, mirroring
  what grid snapping does to sub-pixel rings).
- Output vertices are a SUBSET of input vertices (no new coordinates),
  so downstream fixed-point/snap stages compose safely.

The per-removal guard scan is vectorized over the feature's surviving
segments (O(n) numpy per removal, no Python pair loop). Features are
independent — the stage runs embarrassingly parallel in map_batches;
at cluster scale the unit of work is one feature, same as the snap
stage, and a segment bucket-grid would drop the guard to O(k) if
individual features ever reach 10^5+ vertices.
"""

from __future__ import annotations

import heapq

import numpy as np

# WebMercatorQuad world span (matches core/tms builtin).
_WORLD = 2.0 * 20037508.342789244


def pixel_size(zoom: int, tile_px: int = 256) -> float:
    """Ground size (m) of one pixel at a WebMercatorQuad zoom."""
    return _WORLD / (tile_px * (1 << zoom))


def zoom_min_area(zoom: int, pixels: float = 2.0) -> float:
    """Effective-area threshold for a zoom: a (pixels x pixels) square."""
    px = pixel_size(zoom)
    return (pixels * px) ** 2


def _tri_area2(ax, ay, bx, by, cx, cy) -> float:
    """Twice the triangle area (abs cross product)."""
    return abs((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))


def simplify_rings(
    rings: list[list[tuple[float, float]]],
    min_area: float,
    preserve_topology: bool = True,
) -> list[list[tuple[float, float]]]:
    """Visvalingam–Whyatt simplification of one polygon (outer + holes).

    ``rings``: closed or open rings (a duplicated closing point is
    ignored); returns OPEN rings (no closing duplicate), possibly fewer
    (collapsed rings drop). Winding order of survivors is preserved.
    """
    # ---- flatten rings into linked lists over one coordinate array ----
    xs: list[float] = []
    ys: list[float] = []
    ring_of: list[int] = []
    ring_slices: list[tuple[int, int]] = []
    for rid, ring in enumerate(rings):
        pts = list(ring)
        if len(pts) >= 2 and pts[0] == pts[-1]:
            pts = pts[:-1]
        start = len(xs)
        for x, y in pts:
            xs.append(float(x))
            ys.append(float(y))
            ring_of.append(rid)
        ring_slices.append((start, len(xs)))

    n = len(xs)
    X = np.asarray(xs)
    Y = np.asarray(ys)
    prv = np.empty(n, dtype=np.int64)
    nxt = np.empty(n, dtype=np.int64)
    alive = np.zeros(n, dtype=bool)
    ring_count = [0] * len(rings)
    for rid, (s, e) in enumerate(ring_slices):
        m = e - s
        ring_count[rid] = m
        if m == 0:
            continue
        idx = np.arange(s, e)
        prv[idx] = np.roll(idx, 1)
        nxt[idx] = np.roll(idx, -1)
        alive[idx] = True

    version = np.zeros(n, dtype=np.int64)
    rof = np.asarray(ring_of, dtype=np.int64)

    def area_of(i: int) -> float:
        p, q = prv[i], nxt[i]
        return _tri_area2(X[p], Y[p], X[i], Y[i], X[q], Y[q]) * 0.5

    heap: list[tuple[float, int, int]] = []
    for i in range(n):
        if alive[i]:
            heapq.heappush(heap, (area_of(i), i, 0))

    def blocked(p: int, i: int, q: int) -> bool:
        """Would removing ``i`` break topology? Two checks over the
        surviving geometry (both vectorized):

        1. the replacement segment (p, q) properly crosses another
           surviving segment (touching at shared endpoints is fine);
        2. some other surviving vertex lies strictly inside the swept
           triangle (p, i, q) — the hole-swallowing case: a ring inside
           the swept area would end up on the wrong side of (p, q)
           WITHOUT crossing it, so the segment test alone misses it.

        For valid (non-self-crossing) input these two are sufficient: a
        segment passing through the swept triangle with no vertex
        inside it must cross (p, q) itself and is caught by check 1
        (crossing (p,i)/(i,q) instead would mean the INPUT already
        crossed the old boundary)."""
        si = np.where(alive)[0]
        ax, ay, bx, by = X[p], Y[p], X[q], Y[q]
        ix, iy = X[i], Y[i]
        sx_all, sy_all = X[si], Y[si]

        # bbox prefilter (pure pruning — both exact tests can only fire
        # inside the triangle's bbox): a vertex strictly inside (p,i,q)
        # lies in the bbox, and a segment properly crossing (p,q) must
        # touch (p,q)'s bbox, which the triangle bbox contains
        tminx = min(ax, bx, ix)
        tmaxx = max(ax, bx, ix)
        tminy = min(ay, by, iy)
        tmaxy = max(ay, by, iy)

        # check 2: strict point-in-triangle (p, i, q)
        near = (
            (sx_all >= tminx)
            & (sx_all <= tmaxx)
            & (sy_all >= tminy)
            & (sy_all <= tmaxy)
        )
        others = si[near & (si != p) & (si != q) & (si != i)]
        if others.size:
            px_, py_ = X[others], Y[others]
            s1 = (ix - ax) * (py_ - ay) - (iy - ay) * (px_ - ax)
            s2 = (bx - ix) * (py_ - iy) - (by - iy) * (px_ - ix)
            s3 = (ax - bx) * (py_ - by) - (ay - by) * (px_ - bx)
            inside = ((s1 > 0) & (s2 > 0) & (s3 > 0)) | (
                (s1 < 0) & (s2 < 0) & (s3 < 0)
            )
            if np.any(inside):
                return True

        # check 1: proper crossing of the replacement segment — only
        # segments whose bbox overlaps (p, q)'s bbox can cross it
        pminx = min(ax, bx)
        pmaxx = max(ax, bx)
        pminy = min(ay, by)
        pmaxy = max(ay, by)
        ei = nxt[si]
        ex_all, ey_all = X[ei], Y[ei]
        seg_near = ~(
            ((sx_all < pminx) & (ex_all < pminx))
            | ((sx_all > pmaxx) & (ex_all > pmaxx))
            | ((sy_all < pminy) & (ey_all < pminy))
            | ((sy_all > pmaxy) & (ey_all > pmaxy))
        )
        mask = seg_near & (si != p) & (si != q) & (ei != p) & (ei != q)
        if not mask.any():
            return False
        sx, sy = sx_all[mask], sy_all[mask]
        ex, ey = ex_all[mask], ey_all[mask]
        d1 = (bx - ax) * (sy - ay) - (by - ay) * (sx - ax)
        d2 = (bx - ax) * (ey - ay) - (by - ay) * (ex - ax)
        d3 = (ex - sx) * (ay - sy) - (ey - sy) * (ax - sx)
        d4 = (ex - sx) * (by - sy) - (ey - sy) * (bx - sx)
        return bool(np.any((d1 * d2 < 0.0) & (d3 * d4 < 0.0)))

    def drop_ring(rid: int) -> None:
        s, e = ring_slices[rid]
        for j in range(s, e):
            alive[j] = False
        ring_count[rid] = 0

    while heap:
        a, i, ver = heapq.heappop(heap)
        if not alive[i] or ver != version[i]:
            continue
        if a >= min_area:
            break
        rid = int(rof[i])
        if ring_count[rid] <= 3:
            # a triangle still under threshold: the whole ring vanishes
            drop_ring(rid)
            continue
        p, q = int(prv[i]), int(nxt[i])
        if preserve_topology and blocked(p, i, q):
            # blocked; re-examined when a neighbor is removed
            continue
        alive[i] = False
        ring_count[rid] -= 1
        nxt[p] = q
        prv[q] = p
        for j in (p, q):
            version[j] += 1
            heapq.heappush(heap, (area_of(j), j, int(version[j])))

    out: list[list[tuple[float, float]]] = []
    # holes cannot outlive their shell: if the OUTER ring (index 0)
    # collapsed under the threshold, the whole feature vanishes —
    # otherwise a surviving hole would be misread downstream as the shell
    if ring_slices and ring_count[0] < 3:
        return out
    for rid, (s, e) in enumerate(ring_slices):
        if ring_count[rid] < 3:
            continue
        # walk the linked list from the first surviving vertex
        first = next((j for j in range(s, e) if alive[j]), None)
        if first is None:
            continue
        ring_pts = []
        j = first
        while True:
            ring_pts.append((float(X[j]), float(Y[j])))
            j = int(nxt[j])
            if j == first:
                break
        out.append(ring_pts)
    return out


def simplify_polygon_for_zoom(
    rings: list[list[tuple[float, float]]],
    zoom: int,
    pixels: float = 2.0,
    preserve_topology: bool = True,
) -> list[list[tuple[float, float]]]:
    """Per-zoom entry point: threshold = (pixels * pixel_size(zoom))^2."""
    return simplify_rings(
        rings, zoom_min_area(zoom, pixels), preserve_topology=preserve_topology
    )


def ring_self_intersects(ring: list[tuple[float, float]]) -> bool:
    """Brute-force proper-self-intersection check (test oracle use)."""
    pts = list(ring)
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    m = len(pts)
    segs = [(pts[i], pts[(i + 1) % m]) for i in range(m)]
    for i in range(m):
        (ax, ay), (bx, by) = segs[i]
        for j in range(i + 1, m):
            if j == i or (i + 1) % m == j or (j + 1) % m == i:
                continue
            (sx, sy), (ex, ey) = segs[j]
            d1 = (bx - ax) * (sy - ay) - (by - ay) * (sx - ax)
            d2 = (bx - ax) * (ey - ay) - (by - ay) * (ex - ax)
            d3 = (ex - sx) * (ay - sy) - (ey - sy) * (ax - sx)
            d4 = (ex - sx) * (by - sy) - (ey - sy) * (bx - sx)
            if d1 * d2 < 0 and d3 * d4 < 0:
                return True
    return False
