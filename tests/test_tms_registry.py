"""Full OGC tile-matrix-set registry: load/parity/round-trip tests for all
14 embedded grids (counterpart of the reference's load+remarshal tests,
``tms20/tms20_test.go:17-55``) plus CRS axis-order resolution and
variable-matrix-width coalescing."""

from __future__ import annotations

import json

import pytest

from texel_ray.core.tms import (
    REGISTRY_TMS_NAMES,
    _REGISTRY_DIR,
    axes_are_latlon,
    builtin_tms,
    crs_is_latlon,
    load_tms_json,
    registry_tms,
)


def _raw(name: str) -> dict:
    with open(f"{_REGISTRY_DIR}/{name}.json") as f:
        return json.load(f)


def test_all_14_registry_grids_load():
    assert len(REGISTRY_TMS_NAMES) == 14
    for name in REGISTRY_TMS_NAMES:
        tms = registry_tms(name)
        # the registry file WGS1984Quad.json itself declares
        # id=WorldCRS84Quad (upstream OGC registry quirk, shipped verbatim)
        assert tms.id == _raw(name)["id"]
        assert len(tms.tile_matrices) >= 1


@pytest.mark.parametrize("name", REGISTRY_TMS_NAMES)
def test_registry_field_parity_roundtrip(name):
    """Every loaded TileMatrix reproduces the raw JSON fields exactly;
    pointOfOrigin round-trips through the axis swap."""
    raw = _raw(name)
    tms = registry_tms(name)
    crs = raw["crs"] if isinstance(raw["crs"], str) else raw["crs"].get("uri", "")
    swap = crs_is_latlon(crs)
    if swap is None:
        swap = axes_are_latlon(raw.get("orderedAxes")) or False
    assert len(tms.tile_matrices) == len(raw["tileMatrices"])
    for tm_raw in raw["tileMatrices"]:
        tm = tms.tile_matrices[int(tm_raw["id"])]
        assert tm.scale_denominator == float(tm_raw["scaleDenominator"])
        assert tm.cell_size == float(tm_raw["cellSize"])
        assert tm.tile_width == tm_raw["tileWidth"]
        assert tm.tile_height == tm_raw["tileHeight"]
        assert tm.matrix_width == tm_raw["matrixWidth"]
        assert tm.matrix_height == tm_raw["matrixHeight"]
        poo = tm.point_of_origin
        back = (poo[1], poo[0]) if swap else poo
        assert back == (float(tm_raw["pointOfOrigin"][0]), float(tm_raw["pointOfOrigin"][1]))
        vmw = tm_raw.get("variableMatrixWidths", [])
        assert len(tm.variable_matrix_widths) == len(vmw)


@pytest.mark.parametrize("name", REGISTRY_TMS_NAMES)
def test_registry_from_to_native_roundtrip(name):
    """to_native(tile) nudged into the tile interior maps back to the same
    tile via from_native, on the root and a deeper level of every grid."""
    tms = registry_tms(name)
    levels = sorted(tms.tile_matrices)
    for lvl in (levels[0], levels[min(3, len(levels) - 1)]):
        tm = tms.tile_matrices[lvl]
        for tx, ty in {(0, 0), (tm.matrix_width - 1, tm.matrix_height - 1)}:
            c = tm.coalesce_for_row(ty)
            tx = (tx // c) * c
            px, py = tms.to_native(lvl, tx, ty)
            half_x = tm.tile_width * tm.cell_size * 0.5
            half_y = tm.tile_height * tm.cell_size * 0.5
            qx = px + half_x
            qy = py - half_y if tm.corner_of_origin == "topLeft" else py + half_y
            # interior point of a coalesced tile group may be wider
            got = tms.from_native(lvl, qx, qy)
            assert got is not None, (name, lvl, tx, ty)
            assert got == (tx, ty), (name, lvl, (tx, ty), got)


def test_wgs1984quad_two_by_one_root():
    """WGS1984Quad: lat/lon CRS (EPSG:4326) swaps the origin to XY; the
    root is a 2x1 matrix of 180-degree tiles."""
    tms = registry_tms("WGS1984Quad")
    root = tms.tile_matrices[0]
    assert (root.matrix_width, root.matrix_height) == (2, 1)
    assert root.point_of_origin == (-180.0, 90.0)  # swapped from [90, -180]
    assert tms.from_native(0, -90.0, 0.0) == (0, 0)
    assert tms.from_native(0, 90.0, 0.0) == (1, 0)
    # quadtree preflight correctly rejects the non-square root
    ok, reason = tms.is_quadtree()
    assert not ok


def test_worldcrs84quad_crs84_is_lonlat():
    """OGC CRS84 is lon/lat by definition: no swap."""
    tms = registry_tms("WorldCRS84Quad")
    assert tms.tile_matrices[0].point_of_origin == (-180.0, 90.0)
    assert crs_is_latlon("http://www.opengis.net/def/crs/OGC/1.3/CRS84") is False


def test_latlon_crs_without_ordered_axes_swaps():
    """A TMS JSON for a lat/lon-ordered CRS (EPSG:4326) WITHOUT orderedAxes
    must still load with the XY origin (authority table, not the
    informative axes list, decides — ADVICE round 1)."""
    doc = {
        "id": "latlon_no_axes",
        "crs": "http://www.opengis.net/def/crs/EPSG/0/4326",
        "tileMatrices": [
            {
                "id": "0",
                "scaleDenominator": 279541132.0143589,
                "cellSize": 0.703125,
                "pointOfOrigin": [90.0, -180.0],  # lat, lon as EPSG:4326 orders
                "tileWidth": 256,
                "tileHeight": 256,
                "matrixWidth": 2,
                "matrixHeight": 1,
            }
        ],
    }
    tms = load_tms_json(doc)
    assert tms.tile_matrices[0].point_of_origin == (-180.0, 90.0)
    assert tms.from_native(0, -170.0, 80.0) == (0, 0)


def test_latlon_crs_outside_inline_subset_swaps():
    """A lat/lon CRS absent from the inline fallback dict (EPSG:4269,
    NAD83) must resolve through the full committed authority table
    (epsg_axis_latlon.json, 7,070 EPSG v10.096 codes) and load with the
    XY origin — ADVICE round 2 #8."""
    from texel_ray.core.tms import EPSG_AXES_ARE_LATLON, _epsg_axis_table

    assert 4269 not in EPSG_AXES_ARE_LATLON  # genuinely exercises the table
    assert len(_epsg_axis_table()) > 5000
    doc = {
        "id": "nad83_no_axes",
        "crs": "http://www.opengis.net/def/crs/EPSG/0/4269",
        "tileMatrices": [
            {
                "id": "0",
                "scaleDenominator": 279541132.0143589,
                "cellSize": 0.703125,
                "pointOfOrigin": [90.0, -180.0],  # lat, lon as EPSG:4269 orders
                "tileWidth": 256,
                "tileHeight": 256,
                "matrixWidth": 2,
                "matrixHeight": 1,
            }
        ],
    }
    tms = load_tms_json(doc)
    assert tms.tile_matrices[0].point_of_origin == (-180.0, 90.0)
    assert tms.from_native(0, -170.0, 80.0) == (0, 0)


def test_ordered_axes_fallback_for_unknown_crs():
    """Unknown CRS authority -> the informative orderedAxes decide
    (mirrors the reference's fallback at tms20/tms20.go:527-554, with the
    OGC-semantic reading of the axis names)."""
    base = {
        "id": "custom",
        "crs": "http://www.opengis.net/def/crs/CUSTOM/0/1",
        "tileMatrices": [
            {
                "id": "0",
                "scaleDenominator": 3571.42857143,
                "cellSize": 1.0,
                "pointOfOrigin": [100.0, 7.0],
                "tileWidth": 256,
                "tileHeight": 256,
                "matrixWidth": 2,
                "matrixHeight": 4,
                "cornerOfOrigin": "bottomLeft",
            }
        ],
    }
    yx = dict(base, orderedAxes=["Y", "X"])
    assert load_tms_json(yx).tile_matrices[0].point_of_origin == (7.0, 100.0)
    xy = dict(base, orderedAxes=["X", "Y"])
    assert load_tms_json(xy).tile_matrices[0].point_of_origin == (100.0, 7.0)
    en = dict(base, orderedAxes=["E(X)", "N(Y)"])
    assert load_tms_json(en).tile_matrices[0].point_of_origin == (100.0, 7.0)
    ne = dict(base, orderedAxes=["N", "E"])
    assert load_tms_json(ne).tile_matrices[0].point_of_origin == (7.0, 100.0)


def test_cdb1_variable_matrix_width_coalescing():
    """CDB1GlobalGrid polar rows coalesce columns: at the base level the
    north-pole row (ty=0) snaps tx to multiples of 12, mid-latitudes are
    unaffected. (The reference loads but panics on these grids,
    tms20/tms20.go:670-671; the OGC coalescence rule is implemented here.)"""
    import numpy as np

    tms = registry_tms("CDB1GlobalGrid")
    lvl = min(tms.tile_matrices)  # base 1x1-degree level
    # north-pole row: 1-degree columns coalesce 12:1
    t = tms.from_native(lvl, -179.5 + 5.0, 89.5)  # tx would be 5 -> snaps to 0
    assert t is not None and t[0] % 12 == 0 and t[1] == 0
    # equator row: no coalescing
    t_eq = tms.from_native(lvl, 0.5, 0.5)
    assert t_eq is not None and tms.tile_matrices[lvl].coalesce_for_row(t_eq[1]) == 1
    # vectorized path agrees with the scalar path
    lons = np.array([-174.5, 0.5, 170.2])
    lats = np.array([89.5, 0.5, -89.5])
    tx, ty, valid = tms.from_native_np(lvl, lons, lats)
    for i in range(3):
        assert valid[i]
        assert (tx[i], ty[i]) == tms.from_native(lvl, lons[i], lats[i])


def test_builtin_resolver_reaches_registry():
    """builtin_tms falls through to the registry for non-quadtree names."""
    tms = builtin_tms("GNOSISGlobalGrid")
    assert tms.id == "GNOSISGlobalGrid"
    root = tms.tile_matrices[0]
    assert (root.matrix_width, root.matrix_height) == (4, 2)
