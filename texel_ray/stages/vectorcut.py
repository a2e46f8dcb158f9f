"""Vector tile cutting: clip polygons to tile boundaries per zoom.

The vector half of raster<->vector tile cutting (the raster half is
stages/tilecut.py): every polygon is assigned to the tiles its bbox
overlaps (vectorized tile-range arithmetic, same FromNative convention)
and clipped to each tile rectangle with Sutherland-Hodgman against the
4 half-planes. Emits one (tm_id, tile_x, tile_y, geom_wkb) row per
non-empty intersection — the per-tile feature layout a vector-tile
encoder consumes.

Clipped pieces partition the polygon: the sum of clipped ring areas
equals the original ring area (pinned by tests). Ring order in each
piece follows the subject ring's orientation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.geom import shoelace, wkb_decode, wkb_encode_polygon
from ..core.tms import TileMatrixSet, builtin_tms


def sutherland_hodgman(ring, rect):
    """Clip one ring to an axis-aligned rect (minx, miny, maxx, maxy)."""
    minx, miny, maxx, maxy = rect

    def clip_edge(pts, inside, intersect):
        if not pts:
            return pts
        out = []
        prev = pts[-1]
        prev_in = inside(prev)
        for cur in pts:
            cur_in = inside(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect(prev, cur))
            prev, prev_in = cur, cur_in
        return out

    def ix_minx(a, b):
        t = (minx - a[0]) / (b[0] - a[0])
        return (minx, a[1] + t * (b[1] - a[1]))

    def ix_maxx(a, b):
        t = (maxx - a[0]) / (b[0] - a[0])
        return (maxx, a[1] + t * (b[1] - a[1]))

    def ix_miny(a, b):
        t = (miny - a[1]) / (b[1] - a[1])
        return (a[0] + t * (b[0] - a[0]), miny)

    def ix_maxy(a, b):
        t = (maxy - a[1]) / (b[1] - a[1])
        return (a[0] + t * (b[0] - a[0]), maxy)

    pts = list(ring)
    pts = clip_edge(pts, lambda p: p[0] >= minx, ix_minx)
    pts = clip_edge(pts, lambda p: p[0] <= maxx, ix_maxx)
    pts = clip_edge(pts, lambda p: p[1] >= miny, ix_miny)
    pts = clip_edge(pts, lambda p: p[1] <= maxy, ix_maxy)
    return pts


class VectorTileCutter:
    """Actor stage: polygons (WKB, native CRS) -> per-tile clipped rows."""

    def __init__(self, tms: TileMatrixSet | str = "WebMercatorQuad", zoom: int = 8):
        if isinstance(tms, str):
            tms = builtin_tms(tms)
        tm = tms.tile_matrices[zoom]
        self.zoom = zoom
        self.tile_span = float(tm.tile_width) * tm.cell_size
        self.origin_x, self.origin_y = tm.point_of_origin  # topLeft grids
        self.top_left = tm.corner_of_origin == "topLeft"
        self.matrix = tm.matrix_width

    def _tile_rect(self, tx: int, ty: int):
        x0 = self.origin_x + tx * self.tile_span
        if self.top_left:
            y1 = self.origin_y - ty * self.tile_span
            return (x0, y1 - self.tile_span, x0 + self.tile_span, y1)
        y0 = self.origin_y + ty * self.tile_span
        return (x0, y0, x0 + self.tile_span, y0 + self.tile_span)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # replace any upstream tile columns (e.g. the snap stage's tm_id)
        carry = [
            c
            for c in batch.column_names
            if c not in ("geom_wkb", "tm_id", "tile_x", "tile_y")
        ]
        out_idx, out_tx, out_ty, out_wkb = [], [], [], []
        for i, buf in enumerate(batch["geom_wkb"].to_pylist()):
            kind, coords = wkb_decode(buf)
            if kind == "Polygon":
                polys = [coords]
            elif kind == "MultiPolygon":
                polys = coords
            else:
                continue
            for rings in polys:
                outer = rings[0]
                if len(outer) < 3:
                    continue
                xs = [p[0] for p in outer]
                ys = [p[1] for p in outer]
                tx0 = int(np.floor((min(xs) - self.origin_x) / self.tile_span))
                tx1 = int(np.floor((max(xs) - self.origin_x) / self.tile_span))
                if self.top_left:
                    ty0 = int(np.floor((self.origin_y - max(ys)) / self.tile_span))
                    ty1 = int(np.floor((self.origin_y - min(ys)) / self.tile_span))
                else:
                    ty0 = int(np.floor((min(ys) - self.origin_y) / self.tile_span))
                    ty1 = int(np.floor((max(ys) - self.origin_y) / self.tile_span))
                for tx in range(max(tx0, 0), min(tx1, self.matrix - 1) + 1):
                    for ty in range(max(ty0, 0), min(ty1, self.matrix - 1) + 1):
                        rect = self._tile_rect(tx, ty)
                        clipped = [
                            sutherland_hodgman(r, rect) for r in rings
                        ]
                        clipped = [r for r in clipped if len(r) >= 3]
                        if not clipped or len(clipped[0]) < 3:
                            continue
                        out_idx.append(i)
                        out_tx.append(tx)
                        out_ty.append(ty)
                        out_wkb.append(wkb_encode_polygon(clipped))

        take = pa.array(np.asarray(out_idx, dtype=np.int64))
        cols = [batch[c].take(take) for c in carry]
        names = list(carry)
        cols.append(pa.array(np.full(len(out_idx), self.zoom, dtype=np.int32)))
        names.append("tm_id")
        cols.append(pa.array(np.asarray(out_tx, dtype=np.int64)))
        names.append("tile_x")
        cols.append(pa.array(np.asarray(out_ty, dtype=np.int64)))
        names.append("tile_y")
        cols.append(pa.array(out_wkb, pa.binary()))
        names.append("geom_wkb")
        return pa.table(cols, names=names)


def clipped_area(wkb: bytes) -> float:
    kind, coords = wkb_decode(wkb)
    rings = coords if kind == "Polygon" else [r for p in coords for r in p]
    area = shoelace(rings[0])
    for hole in rings[1:]:
        area -= shoelace(hole)
    return area
