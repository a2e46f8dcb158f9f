"""Conformance tests for the core libs against the reference's golden data.

Golden inputs/expectations were extracted verbatim from the reference's
table-driven unit tests (see tests/golden/*.json and
tools/extract_goldens.py); the morton and tile-math cases are small and
transcribed by hand from ``morton/morton_test.go:10-57`` and
``tms20/tms20_test.go:131-215``.
"""

from __future__ import annotations

import pytest

from texel_ray.core import fixedpoint as fp
from texel_ray.core import morton
from texel_ray.core.pointindex import PointIndex, _contains_point, line_intersects
from texel_ray.core.tms import builtin_tms, load_tms_json

from .golden_util import as_lists, build_pointindex, load_cases

# ---- morton ---------------------------------------------------------------

MORTON_CASES = [
    (0b0, 0b0, 0b0),
    (0b1, 0b1, 0b11),
    (0b11, 0b0, 0b0101),
    (0b1111111111111111, 0b0, 0b01010101010101010101010101010101),
    (
        0b11111111111111111111111111111111,
        0b0,
        0b0101010101010101010101010101010101010101010101010101010101010101,
    ),
]


@pytest.mark.parametrize("x,y,z", MORTON_CASES)
def test_morton_to_z(x, y, z):
    assert morton.to_z(x, y) == z
    assert morton.from_z(z) == (x, y)


def test_morton_out_of_range():
    with pytest.raises(ValueError):
        morton.to_z(0b100000000000000000000000000000000, 0)


def test_morton_vectorized_roundtrip():
    import numpy as np

    rng = np.random.default_rng(42)
    x = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64)
    y = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64)
    z = morton.to_z_np(x, y)
    rx, ry = morton.from_z_np(z)
    assert (rx == x).all() and (ry == y).all()
    assert z[0] == morton.to_z(int(x[0]), int(y[0]))


# ---- tms tile assignment (tms20_test.go goldens) --------------------------

_CUSTOM_TMS_JSON = {
    # equivalent of tms20/testdata/SomethingWithBottomLeftAndLatLonAndDoubleHeight.json
    "id": "SomethingWithBottomLeftAndLatLonAndDoubleHeight",
    "crs": {"uri": "http://www.opengis.net/def/crs/CUSTOM/0/1"},
    "orderedAxes": ["Y", "X"],
    "tileMatrices": [
        {
            "id": "0",
            "pointOfOrigin": [0.0, 0.0],
            "scaleDenominator": 3571.42857143,
            "cellSize": 1.0,
            "tileWidth": 256,
            "tileHeight": 256,
            "matrixWidth": 2,
            "matrixHeight": 4,
            "cornerOfOrigin": "bottomLeft",
        }
    ],
}


def test_from_native_goldens():
    rd = builtin_tms("NetherlandsRDNewQuad")
    assert rd.from_native(1, 155000, 463000.0) == (1, 1)
    assert rd.from_native(100, 0, 0) is None
    assert rd.from_native(0, -285401.92 - 1, 903401.92) is None
    assert rd.from_native(0, -285401.92, 903401.92 + 1) is None
    assert rd.from_native(0, 595401.92 + 1, 22598.08) is None
    assert rd.from_native(0, 595401.92, 22598.08 - 1) is None

    custom = load_tms_json(_CUSTOM_TMS_JSON)
    assert custom.from_native(0, 256.0, 256.0) == (1, 1)


def test_from_native_vectorized_matches_scalar():
    import numpy as np

    rd = builtin_tms("NetherlandsRDNewQuad")
    rng = np.random.default_rng(7)
    xs = rng.uniform(-400000, 700000, 5000)
    ys = rng.uniform(-100000, 1000000, 5000)
    for zoom in (0, 5, 12):
        tx, ty, valid = rd.from_native_np(zoom, xs, ys)
        for i in range(0, 5000, 217):
            expect = rd.from_native(zoom, xs[i], ys[i])
            if expect is None:
                assert not valid[i]
            else:
                assert valid[i] and (tx[i], ty[i]) == expect


def test_to_native_goldens():
    rd = builtin_tms("NetherlandsRDNewQuad")
    assert rd.to_native(1, 1, 1) == (155000, 463000.0)
    custom = load_tms_json(_CUSTOM_TMS_JSON)
    assert custom.to_native(0, 1, 1) == (256.0, 512.0)


def test_is_quadtree_builtin():
    # all 7 quadtree grids of the public registry (the reference's
    # IsQuadTree accepts exactly these; pointindex_test.go:551-592)
    for name in (
        "WebMercatorQuad",
        "NetherlandsRDNewQuad",
        "EuropeanETRS89_LAEAQuad",
        "NZTM2000Quad",
        "UPSAntarcticWGS84Quad",
        "UPSArcticWGS84Quad",
        "WorldMercatorWGS84Quad",
    ):
        ok, reason = builtin_tms(name).is_quadtree()
        assert ok, f"{name}: {reason}"


def test_deviation_stats():
    # pointindex_test.go:594-655: WebMercatorQuad z17 < 1px, z19 > 1px
    wm = builtin_tms("WebMercatorQuad")
    _, dev_px_17 = wm.deviation_stats(17)
    assert abs(dev_px_17) < 1
    _, dev_px_19 = wm.deviation_stats(19)
    assert abs(dev_px_19) > 1
    rd = builtin_tms("NetherlandsRDNewQuad")
    _, dev_px_rd = rd.deviation_stats(16)
    assert abs(dev_px_rd) < 1e-6  # RD grid is exactly representable


# ---- pointindex goldens ---------------------------------------------------


def test_contains_point_goldens():
    for case in load_cases("pi_contains_point_cases.json"):
        ipt = (fp.from_ord(case["pt"][0]), fp.from_ord(case["pt"][1]))
        got = _contains_point(ipt, (0, 0, fp.ONE, fp.ONE))
        assert got == case["want"], case["name"]


def test_insert_point_deepest_goldens():
    for case in load_cases("pi_insert_deepest_cases.json"):
        tms = builtin_tms(case["tmsID"])
        ix = PointIndex(tms, case["tmID"])
        ix.insert_point(tuple(case["point"]))
        deepest = ix.quadrants[ix.deepest_level]
        assert len(deepest) == 1, case["name"]
        ((z, (ext, cen)),) = deepest.items()
        assert z == case["want"]["z"], case["name"]
        assert list(ext) == case["want"]["intExtent"], case["name"]
        assert list(cen) == case["want"]["intCentroid"], case["name"]


def test_insert_point_goldens():
    for case in load_cases("pi_insert_point_cases.json"):
        ix = build_pointindex(case["ix"])
        ix.insert_point(tuple(case["point"]))
        want = case["want"]
        assert ix.deepest_level == want["deepestLevel"], case["name"]
        assert ix.deepest_size == want["deepestSize"], case["name"]
        assert ix.deepest_res == want["deepestRes"], case["name"]
        want_quadrants = want.get("quadrants") or {}
        got = {
            int(level): {
                int(z): {"intExtent": list(q[0]), "intCentroid": list(q[1])}
                for z, q in qs.items()
            }
            for level, qs in ix.quadrants.items()
        }
        want_norm = {
            int(level): {
                int(z): {
                    "intExtent": q["intExtent"],
                    "intCentroid": q["intCentroid"],
                }
                for z, q in qs.items()
            }
            for level, qs in want_quadrants.items()
        }
        assert got == want_norm, case["name"]


def test_snap_closest_points_goldens():
    for case in load_cases("pi_snap_closest_cases.json"):
        ix = build_pointindex(case["ix"])
        for ring in case["poly"]:
            for vertex in ring:
                ix.insert_point(tuple(vertex))
        levels = case.get("levels") or [ix.deepest_level]
        line = (tuple(case["line"][0]), tuple(case["line"][1]))
        got = ix.snap_closest_points(line, set(levels), case["ringID"])
        want = {int(k): v for k, v in (case["want"] or {}).items()} if isinstance(
            case["want"], dict
        ) else {}
        assert {k: as_lists(v) for k, v in got.items()} == want, case["name"]


def test_line_intersects_goldens():
    for case in load_cases("pi_line_intersects_cases.json"):
        line = (tuple(case["line"][0]), tuple(case["line"][1]))
        ext = tuple(case["extent"])
        assert line_intersects(line, ext) == case["want"], case["name"]


def test_wkt_debug_encode_and_fixedpoint_print():
    """WKT debug encode (geomhelp/geomhelp.go:110-158 semantics: degenerate
    1/2-vertex rings become POINT/LINESTRING) + intgeom decimal
    pretty-print (intgeom/intgeom.go:63-74)."""
    from texel_ray.core import fixedpoint as fp
    from texel_ray.core.geom import wkt_encode

    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    assert wkt_encode("Polygon", [ring]) == "POLYGON ((0 0,4 0,4 4,0 4))"
    # degenerate rings split out after the polygon, reference-style
    s = wkt_encode("Polygon", [ring, [(9.0, 9.0)], [(1.0, 1.0), (2.0, 2.0)]])
    assert s == "POLYGON ((0 0,4 0,4 4,0 4))LINESTRING (1 1,2 2)POINT (9 9)"
    assert wkt_encode("Point", (1.5, -2.0)) == "POINT (1.5 -2)"
    long = wkt_encode("Polygon", [ring], max_len=12)
    assert long.endswith("...") and len(long) == 12

    assert fp.print_with_decimals(fp.from_ord(1.25), 2) == "1.25"
    assert fp.print_with_decimals(fp.from_ord(1.25), 12) == "1.250000000000"
    assert fp.print_with_decimals(fp.from_ord(-3.5), 1) == "-3.5"
    assert fp.print_with_decimals(123, 10) == "0.0000000123"


def test_s2_cell_ids():
    """S2 construction: face/i/j <-> cell id roundtrip is exact, the
    known (0,0) leaf id matches s2geometry (0x1000000000000001), levels
    and containment behave, and cube faces map correctly."""
    import numpy as np

    from texel_ray.core import s2

    rng = np.random.default_rng(0)
    face = rng.integers(0, 6, 2000).astype(np.int64)
    i = rng.integers(0, 1 << 30, 2000).astype(np.int64)
    j = rng.integers(0, 1 << 30, 2000).astype(np.int64)
    ids = s2.cell_id_from_face_ij(face, i, j)
    f2, i2, j2 = s2.face_ij_from_cell_id(ids)
    assert np.array_equal(face, f2) and np.array_equal(i, i2) and np.array_equal(j, j2)

    assert int(s2.cell_id_from_lonlat([0.0], [0.0], 30)[0]) == 0x1000000000000001

    x, y, z = s2.lonlat_to_xyz(
        np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0]),
        np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0]),
    )
    f, _, _ = s2.xyz_to_face_uv(x, y, z)
    assert f.tolist() == [0, 1, 2, 3, 4, 5]

    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-89, 89, 1000)
    l10 = s2.cell_id_from_lonlat(lon, lat, 10)
    assert set(s2.level_of(l10).tolist()) == {10}
    leaf = s2.cell_id_from_lonlat(lon, lat, 30)
    lo, hi = s2.cell_range(l10)
    assert bool(np.all((lo <= leaf) & (leaf <= hi)))
    # every leaf is distinct for distinct random points
    assert len(np.unique(leaf)) == len(leaf)
