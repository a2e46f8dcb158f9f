"""Planar geometry helpers: shoelace, winding, ray casting, WKB codec.

Ports the reference's helper semantics exactly (goldens pin them):

- ``shoelace``: absolute ring area (``geomhelp/geomhelp.go:12-24``).
- ``ray_intersect`` / ``ring_contains``: even-odd ray cast with boundary
  detection (``geomhelp/geomhelp.go:30-88``, after paulmach/orb's public
  rosetta-code ray-casting implementation).
- ``winding_of_points``: -1 clockwise / 0 colinear / +1 counter-clockwise
  in y-up coordinates; used to enforce outer=CCW, inner=CW
  (``snap/snap.go:406-417``).
- ``segment_intersect``: float segment intersection (parametric ua/ub
  form), used by the quadtree's exact edge-inclusion rules.

Plus a minimal WKB codec for Point/LineString/Polygon/MultiPolygon —
geometry travels through Ray Data as a WKB ``binary`` Arrow column.
"""

from __future__ import annotations

import math
import struct

Point = tuple[float, float]
Ring = list[Point]


def shoelace(pts) -> float:
    """Absolute area of a ring (last point implicitly joins the first)."""
    if len(pts) == 0:
        return 0.0
    total = 0.0
    p0 = pts[-1]
    for p1 in pts:
        total += p0[1] * p1[0] - p0[0] * p1[1]
        p0 = p1
    return abs(total / 2.0)


def winding_of_points(pts, y_positive_down: bool = False) -> int:
    """-1 = clockwise, 0 = colinear/degenerate, +1 = counter-clockwise.

    Uses the edge-sum 2*area form sum((x2-x1)*(y2+y1)); in y-up
    coordinates a positive sum is clockwise.
    """
    n = len(pts)
    if n < 3:
        return 0
    total = 0.0
    p0 = pts[-1]
    for p1 in pts:
        total += (p1[0] - p0[0]) * (p1[1] + p0[1])
        p0 = p1
    if total == 0:
        return 0
    cw = total > 0
    if y_positive_down:
        cw = not cw
    return -1 if cw else 1


def ray_intersect(pt: Point, start: Point, end: Point) -> tuple[bool, bool]:
    """(intersects, on_boundary) for a rightward ray from pt vs segment."""
    if start[0] > end[0]:
        start, end = end, start

    px, py = pt
    if px == start[0]:
        if py == start[1]:
            return False, True
        elif start[0] == end[0]:
            if start[1] > end[1] and start[1] >= py >= end[1]:
                return False, True
            if end[1] > start[1] and end[1] >= py >= start[1]:
                return False, True
        px = math.nextafter(px, math.inf)
    elif px == end[0]:
        if py == end[1]:
            return False, True
        px = math.nextafter(px, math.inf)

    if px < start[0] or px > end[0]:
        return False, False

    if start[1] > end[1]:
        if py > start[1]:
            return False, False
        elif py < end[1]:
            return True, False
    else:
        if py > end[1]:
            return False, False
        elif py < start[1]:
            return True, False

    rs = (py - start[1]) / (px - start[0])
    ds = (end[1] - start[1]) / (end[0] - start[0])
    if rs == ds:
        return False, True
    return rs <= ds, False


def ring_contains(ring, point: Point) -> tuple[bool, bool]:
    """(contains, on_boundary) by the even-odd rule; boundary counts as in."""
    c, on = ray_intersect(point, ring[0], ring[-1])
    if on:
        return True, True
    for i in range(len(ring) - 1):
        intersects, on = ray_intersect(point, ring[i], ring[i + 1])
        if on:
            return True, True
        if intersects:
            c = not c
    return c, False


def segment_intersect(l1, l2):
    """Intersection point of two float segments, or (None, False).

    Parametric ua/ub formulation; endpoints count as intersecting.
    """
    x1, y1 = l1[0]
    x2, y2 = l1[1]
    x3, y3 = l2[0]
    x4, y4 = l2[1]
    den = (y4 - y3) * (x2 - x1) - (x4 - x3) * (y2 - y1)
    if den == 0:
        return None, False
    ua = ((x4 - x3) * (y1 - y3) - (y4 - y3) * (x1 - x3)) / den
    ub = ((x2 - x1) * (y1 - y3) - (y2 - y1) * (x1 - x3)) / den
    if ua < 0 or ua > 1 or ub < 0 or ub > 1:
        return None, False
    return (x1 + ua * (x2 - x1), y1 + ua * (y2 - y1)), True


# ---- WKB codec ------------------------------------------------------------
# Little-endian ISO WKB, 2D only: Point(1) LineString(2) Polygon(3)
# MultiPolygon(6) GeometryCollection(7 - decode only).

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOINT = 4
_WKB_MULTILINESTRING = 5
_WKB_MULTIPOLYGON = 6


def wkb_encode_polygon(rings) -> bytes:
    """rings: list of rings, ring = list of (x, y); closing point appended."""
    out = [struct.pack("<BI", 1, _WKB_POLYGON), struct.pack("<I", len(rings))]
    for ring in rings:
        pts = list(ring)
        if pts and pts[0] != pts[-1]:
            pts.append(pts[0])
        out.append(struct.pack("<I", len(pts)))
        for x, y in pts:
            out.append(struct.pack("<dd", x, y))
    return b"".join(out)


def wkb_encode_multipolygon(polygons) -> bytes:
    out = [struct.pack("<BI", 1, _WKB_MULTIPOLYGON), struct.pack("<I", len(polygons))]
    for rings in polygons:
        out.append(wkb_encode_polygon(rings))
    return b"".join(out)


def wkb_encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _WKB_POINT, x, y)


def wkb_encode_linestring(pts) -> bytes:
    out = [struct.pack("<BII", 1, _WKB_LINESTRING, len(pts))]
    for x, y in pts:
        out.append(struct.pack("<dd", x, y))
    return b"".join(out)


class _WKBReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _take(self, fmt: str):
        vals = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += struct.calcsize(fmt)
        return vals

    def geometry(self):
        (bo,) = self._take("<B")
        endian = "<" if bo == 1 else ">"
        (gtype,) = self._take(endian + "I")
        gtype = gtype & 0xFF  # strip SRID/Z flags (2D only supported)
        if gtype == _WKB_POINT:
            x, y = self._take(endian + "dd")
            return ("Point", (x, y))
        if gtype == _WKB_LINESTRING:
            return ("LineString", self._points(endian))
        if gtype == _WKB_POLYGON:
            return ("Polygon", self._polygon(endian))
        if gtype == _WKB_MULTIPOLYGON:
            (n,) = self._take(endian + "I")
            return ("MultiPolygon", [self.geometry()[1] for _ in range(n)])
        if gtype in (_WKB_MULTIPOINT, _WKB_MULTILINESTRING):
            (n,) = self._take(endian + "I")
            return ("Multi", [self.geometry() for _ in range(n)])
        raise ValueError(f"unsupported WKB geometry type {gtype}")

    def _points(self, endian):
        (n,) = self._take(endian + "I")
        pts = []
        for _ in range(n):
            x, y = self._take(endian + "dd")
            pts.append((x, y))
        return pts

    def _polygon(self, endian):
        (nrings,) = self._take(endian + "I")
        rings = []
        for _ in range(nrings):
            pts = self._points(endian)
            # match the reference's LinearRings(): drop the closing point
            if len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]
            rings.append(pts)
        return rings


def wkb_decode(buf: bytes):
    """-> (kind, coords); Polygon coords = rings WITHOUT closing points."""
    return _WKBReader(bytes(buf)).geometry()


# ---- WKT debug encoding ----------------------------------------------------
# Mirrors the reference's error-row pretty-printer
# (``geomhelp/geomhelp.go:110-158``): degenerate polygon "rings" of 1 or 2
# vertices are pulled out and rendered as POINT / LINESTRING after the
# remaining polygon; output is truncated to max_len with a "..." tail.


def _wkt_ring(ring) -> str:
    return "(" + ",".join(f"{x:g} {y:g}" for x, y in ring) + ")"


def _wkt_truncate(s: str, max_len: int) -> str:
    if max_len and len(s) > max_len:
        return s[: max(0, max_len - 3)] + "..."
    return s


def wkt_encode(kind: str, coords, max_len: int = 0) -> str:
    """WKT for Point/LineString/Polygon/MultiPolygon debug output."""
    if kind == "Point":
        return _wkt_truncate(f"POINT ({coords[0]:g} {coords[1]:g})", max_len)
    if kind == "LineString":
        return _wkt_truncate("LINESTRING " + _wkt_ring(coords), max_len)
    if kind == "Polygon":
        points, lines, rings = [], [], []
        for ring in coords:
            if len(ring) == 1:
                points.append(ring[0])
            elif len(ring) == 2:
                lines.append(ring)
            else:
                rings.append(ring)
        s = ""
        if rings:
            s = _wkt_truncate(
                "POLYGON (" + ",".join(_wkt_ring(r) for r in rings) + ")", max_len
            )
        for ln in lines:
            s += _wkt_truncate("LINESTRING " + _wkt_ring(ln), max_len)
        for pt in points:
            s += _wkt_truncate(f"POINT ({pt[0]:g} {pt[1]:g})", max_len)
        return s
    if kind == "MultiPolygon":
        return _wkt_truncate(
            "MULTIPOLYGON ("
            + ",".join("(" + ",".join(_wkt_ring(r) for r in poly) + ")" for poly in coords)
            + ")",
            max_len,
        )
    raise ValueError(f"wkt_encode: unsupported kind {kind!r}")
