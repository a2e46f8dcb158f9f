"""Deterministic polygon side-table ("regions") for PIP joins and tiling.

Small dimension table (broadcast side of the PIP join): axis-aligned
rectangles around the urban geotag clusters plus a lon/lat grid of coarse
rectangles, and a few general (non-rectangular) polygons — hexagons —
exercising the full even-odd point-in-polygon path.

Columns: ``region_id:int64, name:string, kind:string ('rect'|'poly'),
minx,miny,maxx,maxy:float64`` (bbox; for rects the exact shape) and
``geom_wkb:binary`` (the polygon, WKB). Rect regions are expressible in
ANSI SQL (the DuckDB oracle); hexagons are pinned by pytest goldens.

Rebuilt deterministically from the seed anywhere — workers regenerate it
instead of shipping it (cheaper than a broadcast at cluster scale).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..core.geom import wkb_encode_polygon

from .images import _URBAN_CENTERS


def _hexagon(cx: float, cy: float, r: float):
    pts = []
    for k in range(6):
        a = math.pi / 3.0 * k
        pts.append((cx + r * math.cos(a), cy + r * math.sin(a)))
    return pts


def generate_regions_table() -> pa.Table:
    region_id = []
    name = []
    kind = []
    minx, miny, maxx, maxy = [], [], [], []
    wkb = []

    rid = 0
    # tight rectangles around each urban cluster
    for i, (lon, lat) in enumerate(_URBAN_CENTERS):
        for j, half in enumerate((0.1, 0.25)):
            region_id.append(rid)
            name.append(f"urban_{i}_{j}")
            kind.append("rect")
            x0, y0, x1, y1 = lon - half, lat - half, lon + half, lat + half
            minx.append(x0), miny.append(y0), maxx.append(x1), maxy.append(y1)
            wkb.append(
                wkb_encode_polygon([[(x0, y0), (x1, y0), (x1, y1), (x0, y1)]])
            )
            rid += 1
    # coarse world grid rectangles (30 x 30 degrees), clipped a hair inside
    # the antimeridian: the registry's WebMercatorQuad origin is rounded to
    # 13 digits, so lon=+-180 projects marginally outside the snap grid
    for gx in range(-6, 6):
        for gy in range(-2, 2):
            x0, y0 = max(gx * 30.0, -179.99), gy * 30.0
            x1, y1 = min(x0 + 30.0, 179.99), y0 + 30.0
            region_id.append(rid)
            name.append(f"grid_{gx}_{gy}")
            kind.append("rect")
            minx.append(x0), miny.append(y0), maxx.append(x1), maxy.append(y1)
            wkb.append(
                wkb_encode_polygon([[(x0, y0), (x1, y0), (x1, y1), (x0, y1)]])
            )
            rid += 1
    # general polygons: hexagons around the urban centers
    for i, (lon, lat) in enumerate(_URBAN_CENTERS):
        pts = _hexagon(lon, lat, 0.5)
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        region_id.append(rid)
        name.append(f"hex_{i}")
        kind.append("poly")
        minx.append(min(xs)), miny.append(min(ys))
        maxx.append(max(xs)), maxy.append(max(ys))
        wkb.append(wkb_encode_polygon([pts]))
        rid += 1

    return pa.table(
        {
            "region_id": pa.array(region_id, pa.int64()),
            "name": pa.array(name, pa.string()),
            "kind": pa.array(kind, pa.string()),
            "minx": pa.array(np.array(minx, dtype=np.float64)),
            "miny": pa.array(np.array(miny, dtype=np.float64)),
            "maxx": pa.array(np.array(maxx, dtype=np.float64)),
            "maxy": pa.array(np.array(maxy, dtype=np.float64)),
            "geom_wkb": pa.array(wkb, pa.binary()),
        }
    )


def regions_parquet_path() -> str:
    import pyarrow.parquet as pq

    from .images import DATA_DIR

    path = DATA_DIR / "regions_v2.parquet"
    if not path.exists():
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp")
        pq.write_table(generate_regions_table(), tmp)
        import os

        os.replace(tmp, path)
    return str(path)


def generate_dense_rects(n: int = 20000, seed: int = 1234) -> pa.Table:
    """LARGE rectangle dimension table for the STR-tree PIP path: too many
    polygons for the dense mask, enough to make a real candidate index
    matter. Deterministic from the seed — workers regenerate it instead of
    shipping it. Same schema as ``generate_regions_table``."""
    rng = np.random.default_rng(seed)
    cx = rng.uniform(-179.0, 179.0, n)
    cy = rng.uniform(-85.0, 85.0, n)
    w = rng.uniform(0.1, 1.0, n)
    h = rng.uniform(0.1, 1.0, n)
    minx, maxx = cx - w, cx + w
    miny, maxy = cy - h, cy + h
    wkb = [
        wkb_encode_polygon(
            [[(minx[i], miny[i]), (maxx[i], miny[i]), (maxx[i], maxy[i]), (minx[i], maxy[i])]]
        )
        for i in range(n)
    ]
    return pa.table(
        {
            "region_id": pa.array(np.arange(n, dtype=np.int64)),
            "name": pa.array([f"rect_{i}" for i in range(n)], pa.string()),
            "kind": pa.array(["rect"] * n, pa.string()),
            "minx": pa.array(minx),
            "miny": pa.array(miny),
            "maxx": pa.array(maxx),
            "maxy": pa.array(maxy),
            "geom_wkb": pa.array(wkb, pa.binary()),
        }
    )


def dense_rects_parquet_path() -> str:
    import pyarrow.parquet as pq

    from .images import DATA_DIR

    path = DATA_DIR / "dense_rects_v1.parquet"
    if not path.exists():
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp")
        pq.write_table(generate_dense_rects(), tmp)
        import os

        os.replace(tmp, path)
    return str(path)


def region_boundary_edges() -> pa.Table:
    """Every region's boundary as directed segments (the map-matching /
    nearest-edge dimension table; derived from the same WKB so the Ray
    path and the SQL oracle literal share one source of truth).

    Columns: ``edge_id:int64`` (global, ordered), ``region_id:int64``,
    ``ax, ay, bx, by`` (segment endpoints, lon/lat degrees). Rings are
    stored open in WKB, so the closing segment is emitted explicitly.
    Dimension-sized (hundreds of rows): broadcast, never shuffled.
    """
    from ..core.geom import wkb_decode

    t = generate_regions_table()
    rid_l, ax_l, ay_l, bx_l, by_l = [], [], [], [], []
    for rid, buf in zip(t["region_id"].to_pylist(), t["geom_wkb"].to_pylist()):
        kind, coords = wkb_decode(buf)
        rings = coords if kind == "Polygon" else [r for p in coords for r in p]
        for ring in rings:
            m = len(ring)
            for k in range(m):
                x0, y0 = ring[k]
                x1, y1 = ring[(k + 1) % m]
                rid_l.append(rid)
                ax_l.append(x0), ay_l.append(y0)
                bx_l.append(x1), by_l.append(y1)
    return pa.table(
        {
            "edge_id": pa.array(np.arange(len(rid_l), dtype=np.int64)),
            "region_id": pa.array(rid_l, pa.int64()),
            "ax": pa.array(np.array(ax_l, dtype=np.float64)),
            "ay": pa.array(np.array(ay_l, dtype=np.float64)),
            "bx": pa.array(np.array(bx_l, dtype=np.float64)),
            "by": pa.array(np.array(by_l, dtype=np.float64)),
        }
    )


def edge_geom_arrays():
    """Precomputed segment geometry for the nearest-edge kernel:
    (edge_id, region_id, ax, ay, dx, dy, l2) numpy arrays. ONE source of
    truth for both the Ray kernels and the SQL VALUES literals — the
    oracles depend on the float ops mirroring 1:1."""
    e = region_boundary_edges()
    ax = e["ax"].to_numpy()
    ay = e["ay"].to_numpy()
    dx = e["bx"].to_numpy() - ax
    dy = e["by"].to_numpy() - ay
    return (
        e["edge_id"].to_numpy(),
        e["region_id"].to_numpy(),
        ax,
        ay,
        dx,
        dy,
        dx * dx + dy * dy,
    )


def nearest_edge_index(
    lon: np.ndarray, lat: np.ndarray, ax, ay, dx, dy, l2
) -> np.ndarray:
    """Index of each point's nearest segment: clamped projection +
    argmin with the deterministic (d2, index) tie-break (first minimum
    = smallest edge_id when arrays are edge_id-ordered). Dense
    (points x edges) matrix — correct for dimension-sized edge tables;
    large edge sets sit behind a cell-cover prefilter."""
    t = ((lon[:, None] - ax[None, :]) * dx[None, :]
         + (lat[:, None] - ay[None, :]) * dy[None, :]) / l2[None, :]
    t = np.clip(t, 0.0, 1.0)
    qx = ax[None, :] + t * dx[None, :]
    qy = ay[None, :] + t * dy[None, :]
    d2 = (lon[:, None] - qx) ** 2 + (lat[:, None] - qy) ** 2
    return np.argmin(d2, axis=1)
