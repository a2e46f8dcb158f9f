"""OGC Tile Matrix Set 2.0: grids, deterministic tile assignment, tile math.

Semantics mirror the reference (``tms20/tms20.go:556-791``):

- ``from_native(zoom, x, y)``: tile containing a native-CRS point —
  ``tx = floor((x - originX) / (tileWidth * cellSize))`` (uint truncation),
  y measured downward from the origin for ``topLeft`` grids, upward for
  ``bottomLeft``; out-of-matrix points return no tile.
- ``to_native(zoom, tx, ty)``: top-left native point of a tile, rounded to
  9 decimals (reference ``CoordPrecision = 9``, half-away-from-zero).
- ``matrix_bounding_box(tmID)``: native bbox of a whole matrix.
- ``is_quadtree`` / ``deviation_stats``: preflight checks for the snap
  grid (``pointindex/pointindex.go:515-603``).

Grids are either built-in (public OGC registry constants for
WebMercatorQuad / NetherlandsRDNewQuad), loaded from an OGC TMS 2.0 JSON
document, or generated (``make_quadtree_tms`` for test fixtures).
Parsed sets are cached per process; workers load them once.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np

COORD_PRECISION = 9

# ---- CRS axis-order authority ---------------------------------------------
# EPSG codes whose CRS axis order is lat/lon (or northing/easting): TMS JSON
# coordinates (pointOfOrigin) for these must be swapped into XY order.
# Subset of the EPSG database (v10.x) covering every CRS in the shipped OGC
# registry grids plus common geographic CRSs; mirrors the reference's
# generated authority table (``tms20/epsg_axis_order.go``, lookup at
# ``tms20/tms20.go:504-524``). Unknown CRSs fall back to the TMS document's
# informative ``orderedAxes``.
EPSG_AXES_ARE_LATLON = {
    2193: True,   # NZGD2000 / NZTM2000 (N,E)
    3035: True,   # ETRS89-extended / LAEA Europe (N,E)
    3395: False,  # WGS 84 / World Mercator
    3857: False,  # WGS 84 / Pseudo-Mercator
    3978: False,  # NAD83 / Canada Atlas Lambert
    4258: True,   # ETRS89 (lat,lon)
    4277: True,   # OSGB36 (lat,lon)
    4326: True,   # WGS 84 (lat,lon)
    4937: True,   # ETRS89 3D (lat,lon)
    5041: False,  # WGS 84 / UPS North
    5042: False,  # WGS 84 / UPS South
    5482: True,   # RSRGD2000 / RSPS2000 (N,E)
    25831: False,  # ETRS89 / UTM 31N
    28992: False,  # Amersfoort / RD New
    32631: False,  # WGS 84 / UTM 31N
}


def crs_is_latlon(crs: str) -> bool | None:
    """Authority-table axis order for a CRS URI/URN; None when unknown.

    Handles ``http://www.opengis.net/def/crs/EPSG/0/4326``,
    ``urn:ogc:def:crs:EPSG::2193`` and OGC CRS84 forms, like the
    reference's ``CRS.Authority()/Code()`` parsing.
    """
    if not crs:
        return None
    parts = crs.replace("urn:ogc:def:crs:", "").rstrip("/").split(
        "/def/crs/"
    )[-1].replace("::", ":").replace("/", ":").split(":")
    # -> [authority, version, code] or [authority, code]
    if not parts:
        return None
    authority = parts[0].upper()
    code = parts[-1]
    if authority == "OGC" and code.upper() == "CRS84":
        return False  # lon/lat by definition
    if authority != "EPSG":
        return None
    try:
        return EPSG_AXES_ARE_LATLON.get(int(code))
    except ValueError:
        return None


def axes_are_latlon(ordered_axes) -> bool | None:
    """Informative orderedAxes fallback: is the first axis the north/lat
    one?  (The reference's fallback regexes, ``tms20/tms20.go:38-39``,
    carry inverted names and are untestable from its fixtures — the only
    fixture using them has a symmetric (0,0) origin; this implements the
    OGC-semantic reading: first axis Lat/Y/N means coordinates need the
    swap into XY order.)"""
    if not ordered_axes or len(ordered_axes) < 2:
        return None
    first = str(ordered_axes[0]).strip().lower()
    if first.startswith(("lat", "y", "n")):
        return True
    if first.startswith(("lon", "x", "e")):
        return False
    return None


def _round_half_away(f: float, p: int) -> float:
    """Go math.Round semantics: round half away from zero."""
    r = 10.0**p
    x = f * r
    return math.floor(x + 0.5) / r if x >= 0 else math.ceil(x - 0.5) / r


def round9(f: float) -> float:
    return _round_half_away(f, COORD_PRECISION)


@dataclass(frozen=True)
class TileMatrix:
    id: int
    scale_denominator: float
    cell_size: float
    point_of_origin: tuple[float, float]  # XY order (already swapped if needed)
    corner_of_origin: str = "topLeft"  # or "bottomLeft"
    tile_width: int = 256
    tile_height: int = 256
    matrix_width: int = 1
    matrix_height: int = 1
    # ((coalesce, min_tile_row, max_tile_row), ...): rows where `coalesce`
    # adjacent columns merge into one tile (polar rows of global geographic
    # grids). The reference loads but panics on these
    # (tms20/tms20.go:670-671 "not supported"); here the column snap
    # tx -> (tx // c) * c implements the OGC TMS 2.0 coalescence rule.
    variable_matrix_widths: tuple = ()

    def coalesce_for_row(self, ty: int) -> int:
        for c, lo, hi in self.variable_matrix_widths:
            if lo <= ty <= hi:
                return c
        return 1


@dataclass(frozen=True)
class TileMatrixSet:
    id: str
    crs: str
    tile_matrices: dict[int, TileMatrix] = field(default_factory=dict)

    # ---- tile assignment -------------------------------------------------

    def from_native(self, zoom: int, x: float, y: float):
        """Native point -> (tx, ty) or None if outside the matrix."""
        tm = self.tile_matrices.get(zoom)
        if tm is None:
            return None
        ox, oy = tm.point_of_origin
        tile_size_x = float(tm.tile_width) * tm.cell_size
        fx = (x - ox) / tile_size_x
        if fx < 0:
            return None
        tx = int(fx)
        if tx >= tm.matrix_width:
            return None
        tile_size_y = float(tm.tile_height) * tm.cell_size
        if tm.corner_of_origin == "bottomLeft":
            fy = (y - oy) / tile_size_y
        else:
            fy = (oy - y) / tile_size_y
        if fy < 0:
            return None
        ty = int(fy)
        if ty >= tm.matrix_height:
            return None
        if tm.variable_matrix_widths:
            c = tm.coalesce_for_row(ty)
            if c > 1:
                tx = (tx // c) * c
        return (tx, ty)

    def from_native_np(self, zoom: int, xs: np.ndarray, ys: np.ndarray):
        """Vectorized tile assignment.

        Returns (tx, ty, valid): int64 arrays + bool mask; tx/ty are only
        meaningful where valid. Exactly mirrors ``from_native``.
        """
        tm = self.tile_matrices[zoom]
        ox, oy = tm.point_of_origin
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        fx = (xs - ox) / (float(tm.tile_width) * tm.cell_size)
        if tm.corner_of_origin == "bottomLeft":
            fy = (ys - oy) / (float(tm.tile_height) * tm.cell_size)
        else:
            fy = (oy - ys) / (float(tm.tile_height) * tm.cell_size)
        valid = (fx >= 0) & (fy >= 0)
        # trunc-toward-zero like Go uint(); negatives are masked out anyway
        tx = np.trunc(fx).astype(np.int64)
        ty = np.trunc(fy).astype(np.int64)
        valid &= (tx < tm.matrix_width) & (ty < tm.matrix_height)
        for c, lo, hi in tm.variable_matrix_widths:
            in_rows = (ty >= lo) & (ty <= hi)
            if c > 1 and in_rows.any():
                tx = np.where(in_rows, (tx // c) * c, tx)
        return tx, ty, valid

    def to_native(self, zoom: int, tx: int, ty: int):
        """Tile -> native top-left point, or None. Accepts x/y up to matrix size
        (inclusive), mirroring the reference's `>` (not `>=`) bound check."""
        tm = self.tile_matrices.get(zoom)
        if tm is None:
            return None
        if tx > tm.matrix_width or ty > tm.matrix_height:
            return None
        ox, oy = tm.point_of_origin
        tile_size_x = float(tm.tile_width) * tm.cell_size
        px = round9(ox + float(tx) * tile_size_x)
        tile_size_y = float(tm.tile_height) * tm.cell_size
        if tm.corner_of_origin == "bottomLeft":
            py = round9(oy + float(ty + 1) * tile_size_y)
        else:
            py = round9(oy - float(ty) * tile_size_y)
        return (px, py)

    # ---- matrix geometry -------------------------------------------------

    def matrix_size(self, tm_id: int) -> tuple[float, float]:
        tm = self.tile_matrices[tm_id]
        w = round9(float(tm.matrix_width) * float(tm.tile_width) * tm.cell_size)
        h = round9(float(tm.matrix_height) * float(tm.tile_height) * tm.cell_size)
        return w, h

    def matrix_bounding_box(self, tm_id: int):
        """-> ((minx, miny), (maxx, maxy)) in native CRS."""
        tm = self.tile_matrices.get(tm_id)
        if tm is None:
            raise KeyError(f"tile matrix with id {tm_id} not found")
        gw, gh = self.matrix_size(tm_id)
        ox, oy = tm.point_of_origin
        min_x = ox
        max_x = round9(ox + gw)
        if tm.corner_of_origin == "bottomLeft":
            min_y, max_y = oy, round9(oy + gh)
        else:
            max_y, min_y = oy, round9(oy - gh)
        return (min_x, min_y), (max_x, max_y)

    def is_quadtree(self) -> tuple[bool, str]:
        prev = None
        prev_id = None
        for tm_id in sorted(self.tile_matrices):
            tm = self.tile_matrices[tm_id]
            if tm.matrix_height != tm.matrix_width:
                return False, f"matrix height != width at {tm_id}"
            if tm.tile_height != tm.tile_width:
                return False, f"tiles not square at {tm_id}"
            if prev is not None:
                if tm_id != prev_id + 1:
                    return False, "tile matrix IDs not a 0-based range"
                if tm.point_of_origin != prev.point_of_origin:
                    return False, f"point of origin changes at {tm_id}"
                if tm.corner_of_origin != prev.corner_of_origin:
                    return False, f"corner of origin changes at {tm_id}"
                if tm.tile_height != prev.tile_height:
                    return False, f"tile size changes at {tm_id}"
                if tm.matrix_height != 2 * prev.matrix_height:
                    return False, f"matrix does not double at {tm_id}"
                if not (1.99 <= prev.cell_size / tm.cell_size <= 2.01):
                    return False, f"cell size does not halve at {tm_id}"
            prev, prev_id = tm, tm_id
        return True, ""

    def deviation_stats(self, deepest_tm_id: int) -> tuple[float, float]:
        """Fixed-point grid deviation (units, pixels) at the deepest level.

        Mirrors ``pointindex/pointindex.go:569-603``: difference between the
        float grid resolution and the truncated int64 resolution, accumulated
        over the whole axis.
        """
        from . import fixedpoint as fp
        from .pointindex import VECTOR_TILE_INTERNAL_PIXEL_RESOLUTION

        (min_x, min_y), (max_x, max_y) = self.matrix_bounding_box(0)
        root = self.tile_matrices[0]
        level_diff = int(math.log2(root.tile_width)) + int(
            math.log2(VECTOR_TILE_INTERNAL_PIXEL_RESOLUTION)
        )
        deepest_level = deepest_tm_id + level_diff
        deepest_size = 1 << deepest_level
        int_span = fp.from_ord(max_x) - fp.from_ord(min_x)
        float_span = max_x - min_x
        float_res = float_span / deepest_size
        int_res = int_span // deepest_size
        dev_units = float_res * deepest_size - fp.to_ord(int_res * deepest_size)
        dev_pixels = dev_units / float_res
        return dev_units, dev_pixels


# ---- constructors ---------------------------------------------------------


def make_quadtree_tms(
    tms_id: str,
    crs: str,
    origin: tuple[float, float],
    z0_cell_size: float,
    depth: int,
    tile_size: int = 256,
    corner: str = "topLeft",
    z0_scale_denominator: float | None = None,
) -> TileMatrixSet:
    """Generate a quadtree TMS: matrix doubles and cellSize halves per level."""
    if z0_scale_denominator is None:
        # OGC convention: scaleDenominator = cellSize / 0.00028 (0.28mm pixel)
        z0_scale_denominator = z0_cell_size / 0.00028
    tms = {}
    for z in range(depth + 1):
        tms[z] = TileMatrix(
            id=z,
            scale_denominator=z0_scale_denominator / (1 << z),
            cell_size=z0_cell_size / (1 << z),
            point_of_origin=origin,
            corner_of_origin=corner,
            tile_width=tile_size,
            tile_height=tile_size,
            matrix_width=1 << z,
            matrix_height=1 << z,
        )
    return TileMatrixSet(id=tms_id, crs=crs, tile_matrices=tms)


def make_simple_tms(deepest_tm_id: int, cell_size: float) -> TileMatrixSet:
    """Degenerate test grid mirroring the reference snap-test fixture
    (``snap/snap_test.go:1007-1030``): every level is a 1x1 matrix of one
    1-px tile at origin (0,0) bottomLeft; cellSize doubles toward the root.
    Effective deepest snapping grid: 2^deepest x 16 cells of cell_size/16,
    snap targets at cell centers."""
    tms = {}
    for tm_id in range(deepest_tm_id + 1):
        cs = cell_size * (1 << (deepest_tm_id - tm_id))
        tms[tm_id] = TileMatrix(
            id=tm_id,
            scale_denominator=cs / 0.00028,
            cell_size=cs,
            point_of_origin=(0.0, 0.0),
            corner_of_origin="bottomLeft",
            tile_width=1,
            tile_height=1,
            matrix_width=1,
            matrix_height=1,
        )
    return TileMatrixSet(id=f"simple_{deepest_tm_id}_{cell_size}", crs="", tile_matrices=tms)


def load_tms_json(doc: dict | str) -> TileMatrixSet:
    """Load an OGC TMS 2.0 JSON document (dict or JSON string).

    Coordinate axis order: the CRS authority table decides first (as the
    reference does at ``tms20/tms20.go:527-533``); the document's
    informative ``orderedAxes`` is the fallback for unknown CRSs. A
    lat/lon-ordered CRS (e.g. EPSG:4326) therefore loads with the correct
    XY origin even when the JSON omits ``orderedAxes``.
    """
    if isinstance(doc, str):
        doc = json.loads(doc)
    crs = doc.get("crs")
    if isinstance(crs, dict):
        crs = crs.get("uri", "")
    swap = crs_is_latlon(crs or "")
    if swap is None:
        swap = axes_are_latlon(doc.get("orderedAxes"))
    if swap is None:
        swap = False
    tms = {}
    for tm in doc["tileMatrices"]:
        poo = tm["pointOfOrigin"]
        if swap:
            poo = (float(poo[1]), float(poo[0]))
        else:
            poo = (float(poo[0]), float(poo[1]))
        tm_id = int(tm["id"])
        vmw = tuple(
            (int(v["coalesce"]), int(v["minTileRow"]), int(v["maxTileRow"]))
            for v in tm.get("variableMatrixWidths", ())
        )
        tms[tm_id] = TileMatrix(
            id=tm_id,
            scale_denominator=float(tm["scaleDenominator"]),
            cell_size=float(tm["cellSize"]),
            point_of_origin=poo,
            corner_of_origin=tm.get("cornerOfOrigin", "topLeft"),
            tile_width=int(tm["tileWidth"]),
            tile_height=int(tm["tileHeight"]),
            matrix_width=int(tm["matrixWidth"]),
            matrix_height=int(tm["matrixHeight"]),
            variable_matrix_widths=vmw,
        )
    return TileMatrixSet(id=doc.get("id", "custom"), crs=crs or "", tile_matrices=tms)


_REGISTRY_DIR = __file__.rsplit("/", 1)[0] + "/tilematrixsets"

REGISTRY_TMS_NAMES = (
    "CDB1GlobalGrid",
    "CanadianNAD83_LCC",
    "EuropeanETRS89_LAEAQuad",
    "GNOSISGlobalGrid",
    "LINZAntarticaMapTilegrid",
    "NZTM2000Quad",
    "NetherlandsRDNewQuad",
    "UPSAntarcticWGS84Quad",
    "UPSArcticWGS84Quad",
    "UTM31WGS84Quad",
    "WGS1984Quad",
    "WebMercatorQuad",
    "WorldCRS84Quad",
    "WorldMercatorWGS84Quad",
)


@lru_cache(maxsize=None)
def registry_tms(name: str) -> TileMatrixSet:
    """Load one of the 14 embedded OGC tile-matrix-set registry documents
    (the same public registry files the reference embeds at
    ``tms20/tilematrixsets/``). Parsed once per process (lru_cache);
    workers hold the parsed set, never the JSON."""
    if name not in REGISTRY_TMS_NAMES:
        raise KeyError(
            f"unknown registry TMS: {name!r} (have {', '.join(REGISTRY_TMS_NAMES)})"
        )
    with open(f"{_REGISTRY_DIR}/{name}.json") as f:
        return load_tms_json(json.load(f))


# Public OGC tile-matrix-set registry constants for the quadtree grids
# (non-quadtree registry grids are out of scope for the snap kernel, as in
# the reference's IsQuadTree preflight). Origins are in XY order.
_BUILTIN_QUADTREE_TMS = {
    "WebMercatorQuad": dict(
        crs="http://www.opengis.net/def/crs/EPSG/0/3857",
        origin=(-20037508.3427892, 20037508.3427892),
        cell0=156543.033928041,
        depth=24,
        scale0=559082264.028717,
    ),
    "NetherlandsRDNewQuad": dict(
        crs="http://www.opengis.net/def/crs/EPSG/0/28992",
        origin=(-285401.92, 903401.92),
        cell0=3440.64,
        depth=16,
        scale0=12288000.0,
    ),
    "EuropeanETRS89_LAEAQuad": dict(
        crs="http://www.opengis.net/def/crs/EPSG/0/3035",
        origin=(2000000.0, 5500000.0),  # registry lists Y,X order
        cell0=17578.125,
        depth=15,
        scale0=62779017.857142866,
    ),
    "NZTM2000Quad": dict(
        crs="urn:ogc:def:crs:EPSG::2193",
        origin=(-3260586.7284, 10438190.1652),  # registry lists Y,X order
        cell0=39135.75848201011,
        depth=21,
        scale0=139770566.0071794,
    ),
    "UPSAntarcticWGS84Quad": dict(
        crs="http://www.opengis.net/def/crs/EPSG/0/5042",
        origin=(-14440759.350252, 18440759.350252),
        cell0=128443.4324,
        depth=24,
        scale0=458726544.4,
    ),
    "UPSArcticWGS84Quad": dict(
        crs="http://www.opengis.net/def/crs/EPSG/0/5041",
        origin=(-14440759.350252, 18440759.350252),
        cell0=128443.4324,
        depth=24,
        scale0=458726544.4,
    ),
    "WorldMercatorWGS84Quad": dict(
        crs="http://www.opengis.net/def/crs/EPSG/0/3395",
        origin=(-20037508.3427892, 20037508.3427892),
        cell0=156543.033928041,
        depth=24,
        scale0=559082264.028717,
    ),
}


@lru_cache(maxsize=None)
def builtin_tms(name: str) -> TileMatrixSet:
    """Resolve a grid by name: quadtree constants first, then the embedded
    OGC registry JSON.

    The quadtree builtins derive every level as ``cell0 / 2**z`` — exact
    float parity with the SQL tile-arithmetic oracles; the registry JSONs
    list per-level cellSize values that can differ in the last ulp, so
    they back the REMAINING (non-quadtree / non-square-root) grids:
    WGS1984Quad, WorldCRS84Quad, GNOSISGlobalGrid, CDB1GlobalGrid,
    CanadianNAD83_LCC, UTM31WGS84Quad, LINZAntarticaMapTilegrid.
    """
    spec = _BUILTIN_QUADTREE_TMS.get(name)
    if spec is None:
        if name in REGISTRY_TMS_NAMES:
            return registry_tms(name)
        raise KeyError(f"unknown builtin TMS: {name}")
    return make_quadtree_tms(
        name,
        spec["crs"],
        spec["origin"],
        spec["cell0"],
        depth=spec["depth"],
        z0_scale_denominator=spec["scale0"],
    )


# WebMercator forward projection (EPSG:3857), for lon/lat geotag columns.
_EARTH_R = 6378137.0


def lonlat_to_webmercator_np(lon: np.ndarray, lat: np.ndarray):
    """Vectorized EPSG:4326 -> EPSG:3857. Latitudes beyond the Mercator
    domain produce +/-inf y and land outside every matrix (-> no tile)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = lon * (math.pi / 180.0) * _EARTH_R
    with np.errstate(divide="ignore", invalid="ignore"):
        y = np.log(np.tan((90.0 + lat) * (math.pi / 360.0))) * _EARTH_R
    return x, y
