"""Deterministic tile assignment + S2/H3-style cell encoding over geotags.

Vectorized ``map_batches`` kernels (zero-copy Arrow in/out):

- ``encode_tiles``: explode each geotagged row to one row per requested
  zoom with ``tm_id, tile_x, tile_y, cell`` columns. Tile assignment is
  the reference's FromNative arithmetic (``tms20/tms20.go:664-712``):
  ``tile = trunc((pt - origin) / (tile_size * cell_size))`` with
  right/top-exclusive bounds — applied vectorized over the batch.
- ``encode_cells``: single-level cell id at a fixed level (the kNN /
  dedup partitioning key).

Cells are Morton-curve quadtree cells, the same space-filling-curve
construction S2/quadkey use (the h3/s2 libs are not in this container):
``cell = (zoom << 58) | morton(tile_x, tile_y)`` — 58 bits of Morton key
supports zoom <= 28. Cells at one level sort contiguously along the
Z-curve, so range partitioning by ``cell`` co-locates spatial neighbors.

Outside-grid points (e.g. |lat| beyond the WebMercator domain) follow the
reference's IgnoreOutsideGrid semantics: dropped, with a per-batch count
in the ``outside_grid`` metric column of ``tile_metrics``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import morton
from ..core.tms import TileMatrixSet, builtin_tms, lonlat_to_webmercator_np

CELL_ZOOM_SHIFT = 58


def cell_ids_np(zoom: int, tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    """(zoom, tile_x, tile_y) -> uint64 Morton cell ids."""
    z = morton.to_z_np(tx.astype(np.uint64), ty.astype(np.uint64))
    return (np.uint64(zoom) << np.uint64(CELL_ZOOM_SHIFT)) | z


def cell_parent_np(cell: np.ndarray, levels_up: int = 1) -> np.ndarray:
    """Parent cell id `levels_up` levels toward the root."""
    cell = np.asarray(cell, dtype=np.uint64)
    zoom = (cell >> np.uint64(CELL_ZOOM_SHIFT)).astype(np.int64) - levels_up
    z = cell & ((np.uint64(1) << np.uint64(CELL_ZOOM_SHIFT)) - np.uint64(1))
    return (zoom.astype(np.uint64) << np.uint64(CELL_ZOOM_SHIFT)) | (
        z >> np.uint64(2 * levels_up)
    )


def _native_xy(batch: pa.Table, tms: TileMatrixSet, lon_col: str, lat_col: str):
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    if "3857" in tms.crs:
        return lonlat_to_webmercator_np(lon, lat)
    # native-CRS geotags (columns already in grid units)
    return lon, lat


def encode_tiles(
    batch: pa.Table,
    tms: TileMatrixSet | str = "WebMercatorQuad",
    zooms: tuple[int, ...] = (8,),
    lon_col: str = "lon",
    lat_col: str = "lat",
    keep_columns: list[str] | None = None,
    with_cell: bool = True,
) -> pa.Table:
    """Explode a geotagged Arrow batch to (row x zoom) tile assignments."""
    if isinstance(tms, str):
        tms = builtin_tms(tms)
    x, y = _native_xy(batch, tms, lon_col, lat_col)
    keep = keep_columns if keep_columns is not None else batch.column_names
    pieces = []
    for zoom in zooms:
        tx, ty, valid = tms.from_native_np(zoom, x, y)
        idx = np.nonzero(valid)[0]
        sub = batch.select(keep).take(pa.array(idx))
        cols = list(sub.columns)
        names = list(sub.column_names)
        cols.append(pa.array(np.full(len(idx), zoom, dtype=np.int32)))
        names.append("tm_id")
        cols.append(pa.array(tx[idx]))
        names.append("tile_x")
        cols.append(pa.array(ty[idx]))
        names.append("tile_y")
        if with_cell:
            cols.append(pa.array(cell_ids_np(zoom, tx[idx], ty[idx])))
            names.append("cell")
        pieces.append(pa.table(cols, names=names))
    if not pieces:
        return pa.table({})
    return pa.concat_tables(pieces)


def tile_metrics(
    batch: pa.Table,
    tms: TileMatrixSet | str = "WebMercatorQuad",
    zoom: int = 8,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> pa.Table:
    """Per-batch partial counters (pre-aggregation before the tiny groupby):
    total rows, in-grid rows, outside-grid rows."""
    if isinstance(tms, str):
        tms = builtin_tms(tms)
    x, y = _native_xy(batch, tms, lon_col, lat_col)
    _, _, valid = tms.from_native_np(zoom, x, y)
    n = len(valid)
    inside = int(valid.sum())
    return pa.table(
        {
            "rows": pa.array([n], pa.int64()),
            "inside_grid": pa.array([inside], pa.int64()),
            "outside_grid": pa.array([n - inside], pa.int64()),
        }
    )


def encode_s2(batch, level: int = 8, keep_columns=None, as_token: bool = False):
    """S2 cell encoding over geotag columns: one vectorized pass of
    lon/lat -> cube face -> quadratic (s,t) -> Hilbert cell id at `level`
    (core/s2.py, from the published s2geometry algorithm). The Hilbert id
    is range-partitionable: a cell's children occupy one contiguous id
    range, so range shuffles keep spatial neighbors together.

    ``as_token=True`` emits the compact grouping token instead (column
    ``s2_tok``): canonical ids share their low sentinel+zero bits, which
    collapses pyarrow's low-bit-indexed hash grouper to quadratic probing
    (96s vs 0.06s per 600k rows at level 8 — see core/s2.cell_token).
    Group on the token; restore ids with ``s2.token_to_cell_id``."""
    import pyarrow as pa

    from ..core import s2

    keep = keep_columns if keep_columns is not None else batch.column_names
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    ids = s2.cell_id_from_lonlat(lon, lat, level=level)
    cols = [batch[c] for c in keep]
    if as_token:
        cols.append(pa.array(s2.cell_token(ids, level).view(np.int64)))
        return pa.table(cols, names=[*keep, "s2_tok"])
    cols.append(pa.array(ids.view(np.int64)))  # store as int64 (bit view)
    return pa.table(cols, names=[*keep, "s2_cell"])


def hex_bin(batch, size_m: float = 250_000.0, keep_columns=None):
    """Hexagonal binning of geotags on the WebMercator plane (the H3-grid
    ROLE — flat-top axial hex cells with exact cube rounding; a faithful
    H3 needs the icosahedral projection, out of scope and documented).

    Axial coords q = (sqrt(3)/3*x - y/3)/size, r = (2y/3)/size; cube
    rounding with floor(x+0.5) (half-away-up, mirrored exactly in the SQL
    oracle). Points outside the Mercator domain are dropped.
    """
    import pyarrow as pa

    from ..core.tms import lonlat_to_webmercator_np

    keep = keep_columns if keep_columns is not None else batch.column_names
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    x, y = lonlat_to_webmercator_np(lon, lat)
    valid = np.isfinite(x) & np.isfinite(y)
    x, y = x[valid], y[valid]
    q = (x * (np.sqrt(3.0) / 3.0) - y * (1.0 / 3.0)) / size_m
    r = (y * (2.0 / 3.0)) / size_m
    cx, cz = q, r
    cy = -cx - cz
    rx = np.floor(cx + 0.5)
    ry = np.floor(cy + 0.5)
    rz = np.floor(cz + 0.5)
    dx, dy, dz = np.abs(rx - cx), np.abs(ry - cy), np.abs(rz - cz)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    fix_z = ~fix_x & ~fix_y
    rx = np.where(fix_x, -ry - rz, rx)
    ry = np.where(fix_y, -rx - rz, ry)
    rz = np.where(fix_z, -rx - ry, rz)
    t = batch.filter(pa.array(valid))
    cols = [t[c] for c in keep]
    cols.append(pa.array(rx.astype(np.int64)))
    cols.append(pa.array(rz.astype(np.int64)))
    return pa.table(cols, names=[*keep, "hex_q", "hex_r"])


def hexgrid_encode(batch, res: int = 6, keep_columns=None):
    """Aperture-7 hierarchical hex-cell assignment (core/hexgrid.py — the
    H3-hierarchy role: multi-resolution cells with parent/child/k-ring/
    compact semantics). Emits axial ints ``hq``/``hr`` plus the packed
    int64 ``cell`` id; cube rounding and the axial transform are
    mirrored 1:1 by the SQL oracles (mlprep.sql_h3_cells)."""
    import pyarrow as pa

    from ..core import hexgrid
    from ..core.tms import lonlat_to_webmercator_np

    keep = keep_columns if keep_columns is not None else batch.column_names
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    x, y = lonlat_to_webmercator_np(lon, lat)
    valid = np.isfinite(x) & np.isfinite(y)
    q, r = hexgrid.point_to_cell(x[valid], y[valid], res)
    cell = hexgrid.pack(np.full(q.shape, res, dtype=np.int64), q, r)
    t = batch.filter(pa.array(valid))
    cols = [t[c] for c in keep]
    cols.extend([pa.array(q), pa.array(r), pa.array(cell)])
    return pa.table(cols, names=[*keep, "hq", "hr", "cell"])


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_np(lon: np.ndarray, lat: np.ndarray, precision: int = 5) -> np.ndarray:
    """Vectorized geohash (standard base32, lon bit first). Supports
    even precisions' asymmetric bit split: p chars = 5p bits, lon gets
    ceil(5p/2), lat floor(5p/2). Mirrored 1:1 by the SQL oracle
    (mlprep.sql_geohash_cells builds the same interleave expression)."""
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    li = np.minimum(
        np.floor((lon + 180.0) / 360.0 * (1 << lon_bits)), (1 << lon_bits) - 1
    ).astype(np.int64)
    la = np.minimum(
        np.floor((lat + 90.0) / 180.0 * (1 << lat_bits)), (1 << lat_bits) - 1
    ).astype(np.int64)
    code = np.zeros(len(lon), dtype=np.int64)
    # geohash bit k (0 = most significant of nbits): even k -> lon
    for i in range(lon_bits):
        # lon bit (lon_bits-1-i) lands at geohash bit 2i -> position nbits-1-2i
        code |= ((li >> (lon_bits - 1 - i)) & 1) << (nbits - 1 - 2 * i)
    for i in range(lat_bits):
        code |= ((la >> (lat_bits - 1 - i)) & 1) << (nbits - 2 - 2 * i)
    # base32 chars, 5 bits per char, most significant first
    chars = np.empty((precision, len(lon)), dtype="U1")
    lut = np.array(list(_GEOHASH32))
    for k in range(precision):
        chars[k] = lut[(code >> (nbits - 5 * (k + 1))) & 31]
    out = chars[0]
    for k in range(1, precision):
        out = np.char.add(out, chars[k])
    return out


def geohash_encode(batch, precision: int = 5, keep_columns=None):
    """Geohash cell assignment over geotags (map_batches stage)."""
    import pyarrow as pa

    keep = keep_columns if keep_columns is not None else batch.column_names
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    gh = geohash_np(lon, lat, precision)
    cols = [batch[c] for c in keep]
    cols.append(pa.array(gh.tolist(), pa.string()))
    return pa.table(cols, names=[*keep, "geohash"])


def quadkey_np(tx: np.ndarray, ty: np.ndarray, zoom: int) -> np.ndarray:
    """Bing-style quadkeys from tile coords: zoom digits 0-3, MSB first
    (digit = y_bit*2 + x_bit). Vectorized; mirrored 1:1 by the SQL
    oracle (queries.sql_quadkey_cells)."""
    digits = np.empty((zoom, len(tx)), dtype="U1")
    lut = np.array(["0", "1", "2", "3"])
    for k in range(zoom):
        bit = zoom - 1 - k
        d = ((ty >> bit) & 1) * 2 + ((tx >> bit) & 1)
        digits[k] = lut[d]
    out = digits[0]
    for k in range(1, zoom):
        out = np.char.add(out, digits[k])
    return out
