"""Per-polygon quadtree ("pointcloud annex quadtree") for grid snapping.

A faithful re-implementation of the reference's PointIndex
(``pointindex/pointindex.go``): a quadtree over the level-0 tile matrix
extent down to ``deepest_level = deepest_tm_id + log2(tile_width) +
log2(16)`` (16x internal pixel resolution), all arithmetic in int64
fixed-point (ordinate x 1e10). Snap targets are quadrant centroids of
the deepest level (the "+0.5 pixel" offset).

Edge inclusion is asymmetric and exact: a quadrant contains its left and
bottom edges, not its right and top edges. ``line_intersects`` replicates
the reference's exceptions for line tips touching exclusive edges —
including the reference's intersection-point conversion quirk where the
compared int point is built from the x ordinate twice
(``intgeom/intgeom.go:57-61``), which the reference's own regression
tests pin.

This structure is built fresh per polygon inside the snap kernel — it is
per-row state, not shared across rows, which is what makes the snap
transform embarrassingly parallel over a Ray Dataset.
"""

from __future__ import annotations

import math

from . import fixedpoint as fp
from . import geom as geomh
from . import morton

VECTOR_TILE_INTERNAL_PIXEL_RESOLUTION = 16

_RIGHT = 0b01
_TOP = 0b10


class OutsideGridError(Exception):
    def __init__(self, deepest_x: int, deepest_y: int, deepest_size: int):
        self.deepest_x = deepest_x
        self.deepest_y = deepest_y
        self.deepest_size = deepest_size
        super().__init__(
            f"trying to insert a coord ({deepest_x}, {deepest_y}) outside the "
            f"grid/extent (0, {deepest_size}; 0, {deepest_size})"
        )


def _contains_point(ipt, ext) -> bool:
    """Left/bottom inclusive, right/top exclusive."""
    return ext[0] <= ipt[0] < ext[2] and ext[1] <= ipt[1] < ext[3]


def _infinite_quadrant(ipt, icentroid) -> int:
    is_right = 1 if ipt[0] >= icentroid[0] else 0
    is_top = (1 if ipt[1] >= icentroid[1] else 0) << 1
    return is_right | is_top


def _quadrants_adjacent(a: int, b: int) -> bool:
    d = a ^ b
    return d == 0b01 or d == 0b10


def _edges(ext):
    """Extent edges in the reference's order: bottom, right, top, left."""
    v0 = (ext[0], ext[1])
    v1 = (ext[2], ext[1])
    v2 = (ext[2], ext[3])
    v3 = (ext[0], ext[3])
    return ((v0, v1), (v1, v2), (v2, v3), (v3, v0))


def _is_exclusive_edge(edge_i: int) -> bool:
    i = edge_i % 4
    return i == 1 or i == 2


def _exclusive_tip(edge_i: int, edge):
    i = edge_i % 4
    if i == 0:
        return edge[1]
    if i == 3:
        return edge[0]
    raise AssertionError(f"not an inclusive edge: {edge_i}")


def _int_segment_intersect(il1, il2):
    """Reference intgeom.SegmentIntersect: float math, then a conversion
    where BOTH int ordinates come from the x ordinate (reference quirk)."""
    f1 = ((fp.to_ord(il1[0][0]), fp.to_ord(il1[0][1])), (fp.to_ord(il1[1][0]), fp.to_ord(il1[1][1])))
    f2 = ((fp.to_ord(il2[0][0]), fp.to_ord(il2[0][1])), (fp.to_ord(il2[1][0]), fp.to_ord(il2[1][1])))
    pt, ok = geomh.segment_intersect(f1, f2)
    if pt is None:
        return (0, 0), ok
    return (fp.from_ord(pt[0]), fp.from_ord(pt[0])), ok


def _between_inc(f: int, p: int, q: int) -> bool:
    return p <= f <= q if p <= q else q <= f <= p


def _line_overlaps_inclusive_edge(iline, edge_i: int, iedge) -> bool:
    if iedge[0][0] == iedge[1][0]:
        const_ax, var_ax = 0, 1
    elif iedge[0][1] == iedge[1][1]:
        const_ax, var_ax = 1, 0
    else:
        raise AssertionError(f"not a straight edge: {iedge}")
    e_const = iedge[0][const_ax]
    if iline[0][const_ax] != e_const or iline[1][const_ax] != e_const:
        return False
    e1, e2 = iedge[0][var_ax], iedge[1][var_ax]
    tip = _exclusive_tip(edge_i, iedge)
    l1, l2 = iline[0][var_ax], iline[1][var_ax]
    return l1 != l2 and (
        (_between_inc(l1, e1, e2) and iline[0] != tip)
        or (_between_inc(l2, e1, e2) and iline[1] != tip)
    )


def line_intersects(iline, iext) -> bool:
    """Whether an int line intersects an int extent (right/top exclusive)."""
    if _contains_point(iline[0], iext) or _contains_point(iline[1], iext):
        return True
    for edge_i, iedge in enumerate(_edges(iext)):
        ipt, intersects = _int_segment_intersect(iline, iedge)
        if intersects:
            if _is_exclusive_edge(edge_i):
                if iline[0] == ipt or iline[1] == ipt:
                    continue
            else:
                tip = _exclusive_tip(edge_i, iedge)
                if iline[0] == tip or iline[1] == tip:
                    continue
            return True
        elif not _is_exclusive_edge(edge_i) and _line_overlaps_inclusive_edge(
            iline, edge_i, iedge
        ):
            return True
    return False


class PointIndex:
    """Quadtree over a TMS root extent; see module docstring."""

    def __init__(self, tms, deepest_tm_id: int):
        # quadtree-ness is a preflight check (tms.is_quadtree()), not enforced
        # here — test fixtures use degenerate 1x1 matrices per level.
        root = tms.tile_matrices[0]
        level_diff = int(math.log2(root.tile_width)) + int(
            math.log2(VECTOR_TILE_INTERNAL_PIXEL_RESOLUTION)
        )
        self.deepest_level = deepest_tm_id + level_diff
        (min_x, min_y), (max_x, max_y) = tms.matrix_bounding_box(0)
        self.int_extent = (
            fp.from_ord(min_x),
            fp.from_ord(min_y),
            fp.from_ord(max_x),
            fp.from_ord(max_y),
        )
        self.deepest_size = 1 << self.deepest_level
        self.deepest_res = (self.int_extent[2] - self.int_extent[0]) // self.deepest_size
        # level -> {morton_z -> (int_extent, int_centroid)}
        self.quadrants: dict[int, dict[int, tuple]] = {}
        # level -> {int_point -> [ring_idx]}
        self.hit_once: dict[int, dict] = {}
        self.hit_multiple: dict[int, dict] = {}
        _, self.int_centroid = self._quadrant_extent_and_centroid(0, 0, 0)

    # ---- building --------------------------------------------------------

    def _quadrant_extent_and_centroid(self, level: int, x: int, y: int):
        span = (1 << (self.deepest_level - level)) * self.deepest_res
        min_x, min_y = self.int_extent[0], self.int_extent[1]
        ext = (
            min_x + x * span,
            min_y + y * span,
            min_x + (x + 1) * span,
            min_y + (y + 1) * span,
        )
        centroid = (min_x + x * span + span // 2, min_y + y * span + span // 2)
        return ext, centroid

    def insert_polygon(self, rings) -> None:
        for level in range(self.deepest_level + 1):
            self.quadrants.setdefault(level, {})
        for ring in rings:
            for vertex in ring:
                self.insert_point(vertex)

    def insert_point(self, point) -> None:
        ipt = (fp.from_ord(point[0]), fp.from_ord(point[1]))
        # int64 division truncates toward zero (Python // floors) — matters
        # for points left/below the extent.
        dx = ipt[0] - self.int_extent[0]
        dy = ipt[1] - self.int_extent[1]
        deepest_x = abs(dx) // self.deepest_res * (1 if dx >= 0 else -1)
        deepest_y = abs(dy) // self.deepest_res * (1 if dy >= 0 else -1)
        self.insert_coord(deepest_x, deepest_y)

    def insert_coord(self, deepest_x: int, deepest_y: int) -> None:
        if (
            deepest_x < 0
            or deepest_y < 0
            or deepest_x > self.deepest_size - 1
            or deepest_y > self.deepest_size - 1
        ):
            raise OutsideGridError(deepest_x, deepest_y, self.deepest_size)
        # morton(x>>s, y>>s) == morton(x, y) >> 2s: interleave once
        z_deepest = morton.to_z(deepest_x, deepest_y)
        for level in range(self.deepest_level + 1):
            shift = self.deepest_level - level
            x = deepest_x >> shift
            y = deepest_y >> shift
            z = z_deepest >> (2 * shift)
            level_map = self.quadrants.setdefault(level, {})
            level_map[z] = self._quadrant_extent_and_centroid(level, x, y)

    # ---- snapping --------------------------------------------------------

    def snap_closest_points(self, line, level_set, ring_id: int):
        """Line segment -> {level: [snapped float points]} in traversal order.

        Also records grid points hit more than once by the same ring (the
        hit_multiple map that later drives ring splitting).
        """
        iline = (
            (fp.from_ord(line[0][0]), fp.from_ord(line[0][1])),
            (fp.from_ord(line[1][0]), fp.from_ord(line[1][1])),
        )
        quadrants_per_level = self._snap_closest_points(iline, level_set)
        points_per_level = {}
        for level, quads in quadrants_per_level.items():
            if not quads:
                continue
            ho = self.hit_once.setdefault(level, {})
            hm = self.hit_multiple.setdefault(level, {})
            pts = []
            for i, (_, icentroid) in enumerate(quads):
                pts.append((fp.to_ord(icentroid[0]), fp.to_ord(icentroid[1])))
                if i > 0:
                    self._check_point_hits(ho, hm, icentroid, ring_id)
            points_per_level[level] = pts
        return points_per_level

    def _check_point_hits(self, hit_once, hit_multiple, vertex, ring_id):
        once = hit_once.get(vertex)
        if once:
            if ring_id not in once:
                once.append(ring_id)
            else:
                multi = hit_multiple.setdefault(vertex, [])
                if ring_id not in multi:
                    multi.append(ring_id)
        else:
            hit_once.setdefault(vertex, []).append(ring_id)

    def _snap_closest_points(self, iline, level_set):
        if not level_set or not line_intersects(iline, self.int_extent):
            return {}
        per_level = {}
        parents = [(self.int_extent, self.int_centroid, 0)]  # ext, centroid, z
        if 0 in level_set:
            per_level[0] = [(self.int_extent, self.int_centroid)]
        ip1, ip2 = iline
        for level in range(1, self.deepest_level + 1):
            get = self.quadrants.get(level, {}).get
            intersected = []
            for parent_ext, parent_centroid, parent_z in parents:
                # child quadrant q of parent z has key (z << 2) | q
                _descend(
                    iline, ip1, ip2, get, parent_z << 2,
                    parent_ext, parent_centroid, intersected,
                )
            parents = intersected
            if level in level_set:
                per_level[level] = [(ext, cen) for ext, cen, _ in intersected]
        return per_level

    def get_hit_multiple(self, level: int) -> dict:
        return self.hit_multiple.get(level, {})


def _descend(iline, ip1, ip2, get, base, parent_ext, parent_centroid, out):
    """Append the (ext, centroid, z) of the parent's child quadrants the
    line intersects, in the reference's traversal order. Hot inner loop of
    the snap kernel: quadrant math inlined, children looked up lazily
    (only the candidates, not all four)."""
    cx, cy = parent_centroid
    e0, e1, e2, e3 = parent_ext
    x1, y1 = ip1
    x2, y2 = ip2
    q1 = (1 if x1 >= cx else 0) | ((1 if y1 >= cy else 0) << 1)
    q2 = (1 if x2 >= cx else 0) | ((1 if y2 >= cy else 0) << 1)
    in1 = e0 <= x1 < e2 and e1 <= y1 < e3
    in2 = e0 <= x2 < e2 and e1 <= y2 < e3

    # (quadrant index, certain, mutex)
    if q1 == q2:
        if in1 and in2:
            quad = get(base | q1)
            if quad is not None:
                out.append((quad[0], quad[1], base | q1))
            return
        to_check = ((q1, False, False),)
    elif (q1 ^ q2) in (0b01, 0b10):  # adjacent quadrants
        certain = in1 and in2
        to_check = ((q1, certain, False), (q2, certain, False))
    else:
        if in1:
            to_check = (
                (q1, True, False),
                (q1 ^ 0b01, False, True),
                (q1 ^ 0b10, False, True),
                (q2, in2, False),
            )
        else:
            to_check = (
                (q1, False, False),
                (q1 ^ 0b01, False, True),
                (q1 ^ 0b10, False, True),
                (q2, in2, False),
            )
    mutexed = False
    for qi, certain, mutex in to_check:
        if mutex and mutexed:
            continue
        quad = get(base | qi)
        if quad is None:
            continue
        if certain or line_intersects(iline, quad[0]):
            out.append((quad[0], quad[1], base | qi))
            if mutex:
                mutexed = True


