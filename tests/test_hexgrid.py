"""Aperture-7 hierarchical hex grid (core/hexgrid.py) — the H3-hierarchy
role. Pins the lattice geometry (Voronoi-exactness of cube rounding at
every resolution), the parent/child algebra, k-ring combinatorics,
pack/unpack, and compact/uncompact losslessness."""

from __future__ import annotations

import numpy as np
import pytest

from texel_ray.core import hexgrid as hg


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(7)
    n = 5000
    return (
        rng.uniform(-2.0e7, 2.0e7, n),
        rng.uniform(-2.0e7, 2.0e7, n),
    )


@pytest.mark.parametrize("res", [0, 4, 9, 15])
def test_cube_round_is_voronoi(pts, res):
    """The assigned cell's center is nearer than every kring(1) neighbor
    center — i.e. cube rounding is the exact hex Voronoi assignment, so
    every resolution's lattice is a regular hex grid (the aperture-7
    rotation preserves regularity)."""
    x, y = pts
    q, r = hg.point_to_cell(x, y, res)
    cx, cy = hg.cell_center(q, r, res)
    d0 = (x - cx) ** 2 + (y - cy) ** 2
    for dq, dr in hg.kring_offsets(1):
        if dq == 0 and dr == 0:
            continue
        nx, ny = hg.cell_center(q + dq, r + dr, res)
        d = (x - nx) ** 2 + (y - ny) ** 2
        assert not np.any(d < d0 * (1 - 1e-12))


def test_aperture_is_seven():
    """Consecutive resolutions scale neighbor spacing by exactly 1/sqrt(7)
    with the aperture-7 rotation (-19.107 deg): det(M) = 7 cells per
    parent, |children| = 7, and center spacing shrinks by sqrt(7)."""
    assert hg.M[0, 0] * hg.M[1, 1] - hg.M[0, 1] * hg.M[1, 0] == 7
    one = np.array([1])
    zero = np.array([0])
    for res in (0, 5, 11):
        ax, ay = hg.cell_center(zero, zero, res)
        bx, by = hg.cell_center(one, zero, res)
        cx, cy = hg.cell_center(zero, zero, res + 1)
        dx, dy = hg.cell_center(one, zero, res + 1)
        d_coarse = np.hypot(bx - ax, by - ay)[0]
        d_fine = np.hypot(dx - cx, dy - cy)[0]
        assert d_coarse / d_fine == pytest.approx(np.sqrt(7.0), rel=1e-12)
        # rotation angle between the lattice basis vectors
        ang = np.arctan2(by - ay, bx - ax)[0] - np.arctan2(dy - cy, dx - cx)[0]
        ang = (ang + np.pi) % (2 * np.pi) - np.pi
        assert abs(ang) == pytest.approx(np.arctan2(3.0, 5.0 * np.sqrt(3.0)), rel=1e-9)


@pytest.mark.parametrize("res", [1, 6, 12])
def test_parent_of_center(pts, res):
    """parent(c) equals the res-1 cell containing c's center."""
    x, y = pts
    q, r = hg.point_to_cell(x, y, res)
    cx, cy = hg.cell_center(q, r, res)
    pq, pr = hg.parent(q, r)
    pq2, pr2 = hg.point_to_cell(cx, cy, res - 1)
    assert np.array_equal(pq, pq2) and np.array_equal(pr, pr2)


def test_children_roundtrip():
    for qq, rr in [(0, 0), (5, -3), (-17, 11), (123, 456), (-9999, 31)]:
        ch = hg.children(qq, rr)
        assert len(ch) == 7
        pq, pr = hg.parent(ch[:, 0], ch[:, 1])
        assert np.all(pq == qq) and np.all(pr == rr)


def test_cell_in_children_of_parent(pts):
    x, y = pts
    q, r = hg.point_to_cell(x[:200], y[:200], 8)
    for qq, rr in zip(q, r):
        pq, pr = hg.parent(np.array([qq]), np.array([rr]))
        ch = hg.children(int(pq[0]), int(pr[0]))
        assert any(c[0] == qq and c[1] == rr for c in ch)


def test_kring_sizes_and_distance():
    for k in (1, 2, 3, 5):
        offs = hg.kring_offsets(k)
        assert len(offs) == 1 + 3 * k * (k + 1)
        d = hg.hex_distance(offs[:, 0], offs[:, 1], 0, 0)
        assert d.max() == k


def test_pack_unpack_signed(pts):
    x, y = pts
    for res in (0, 15):
        q, r = hg.point_to_cell(x, y, res)
        ids = hg.pack(np.full(q.shape, res), q, r)
        res2, q2, r2 = hg.unpack(ids)
        assert np.all(res2 == res) and np.array_equal(q2, q) and np.array_equal(r2, r)


def test_compact_uncompact_roundtrip(pts):
    x, y = pts
    bq, br = hg.point_to_cell(x[:6], y[:6], 3)
    base = hg.pack(np.full(6, 3), bq, br)
    full = hg.uncompact(np.unique(base), 6)  # full 7^3 expansion per cell
    comp = hg.compact(full)
    # complete subtrees collapse all the way back to res 3
    assert np.array_equal(comp, np.unique(base))
    assert np.array_equal(hg.uncompact(comp, 6), full)


def test_compact_with_hole_is_lossless(pts):
    x, y = pts
    bq, br = hg.point_to_cell(x[:4], y[:4], 4)
    full = hg.uncompact(np.unique(hg.pack(np.full(4, 4), bq, br)), 6)
    holed = full[1:]
    comp = hg.compact(holed)
    assert len(comp) < len(holed)  # intact subtrees still collapse
    assert np.array_equal(hg.uncompact(comp, 6), np.sort(holed))


def test_uncompact_rejects_coarser_target():
    with pytest.raises(ValueError):
        hg.uncompact(hg.pack(np.array([5]), np.array([0]), np.array([0])), 4)


def test_mixed_res_compact():
    """A parent plus its 7 children at the next level: children collapse
    into a second copy of the parent; set-dedup keeps one terminal."""
    ch = hg.children(2, -1)
    ids = np.concatenate(
        [
            hg.pack(np.array([4]), np.array([2]), np.array([-1])),
            hg.pack(np.full(7, 5), ch[:, 0], ch[:, 1]),
        ]
    )
    comp = hg.compact(ids)
    assert np.array_equal(
        comp, hg.pack(np.array([4]), np.array([2]), np.array([-1]))
    )


# ---- geohash (stages/tiles.geohash_np) ------------------------------------


def test_geohash_known_vectors():
    """Published geohash examples: Wikipedia's ezs42 and the canonical
    u4pruydqqvj (Jutland)."""
    from texel_ray.stages.tiles import geohash_np

    assert geohash_np(np.array([-5.6]), np.array([42.6]), 5)[0] == "ezs42"
    assert (
        geohash_np(np.array([10.40744]), np.array([57.64911]), 11)[0]
        == "u4pruydqqvj"
    )


def test_geohash_prefix_property():
    """A longer geohash of the same point starts with the shorter one."""
    from texel_ray.stages.tiles import geohash_np

    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    g8 = geohash_np(lon, lat, 8)
    g4 = geohash_np(lon, lat, 4)
    assert all(a.startswith(b) for a, b in zip(g8, g4))


def test_geohash_edges_clamp():
    from texel_ray.stages.tiles import geohash_np

    assert geohash_np(np.array([180.0]), np.array([90.0]), 5)[0] == "zzzzz"
    assert geohash_np(np.array([-180.0]), np.array([-90.0]), 5)[0] == "00000"


def test_quadkey_published_example():
    """Bing tile-system docs: tile (3, 5) at level 3 -> quadkey '213';
    prefix property: deeper quadkey of the same point starts with the
    parent's."""
    from texel_ray.stages.tiles import quadkey_np

    assert quadkey_np(np.array([3]), np.array([5]), 3)[0] == "213"
    tx, ty = np.array([35, 200]), np.array([87, 13])
    q8 = quadkey_np(tx, ty, 8)
    q6 = quadkey_np(tx >> 2, ty >> 2, 6)
    assert all(a.startswith(b) for a, b in zip(q8, q6))


def test_geodesic_hist_haversine_sanity(ray_session):
    """The haversine kernel: equator->pole distance is the quarter
    meridian of the R=6371 km sphere (pi/2 * R); and the oracle-checked
    query runs end-to-end at sf0.001."""
    from texel_ray.pipelines.mlprep import q_geodesic_hist

    # kernel check via the public formula
    R = 6371000.0
    d = 2.0 * R * np.arcsin(
        np.sqrt(np.sin(np.radians(90.0) / 2.0) ** 2)
    )
    assert d == pytest.approx(np.pi / 2.0 * R, rel=1e-12)
    df = q_geodesic_hist("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0 and (df["n"] > 0).all()
    assert set(df.columns) == {"center", "bucket", "n"}


def test_convex_hull_kernel():
    """Monotone chain: square corners survive, interior and collinear
    boundary points drop, order is CCW from the lexicographic min;
    degenerate inputs (<=2 points, all-collinear) stay well-formed."""
    from texel_ray.pipelines.mlprep import convex_hull

    sq = np.unique(
        np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.5, 0.0]]), axis=0
    )
    h = convex_hull(sq)
    assert h.tolist() == [[0, 0], [1, 0], [1, 1], [0, 1]]
    # signed shoelace positive = CCW
    x, y = h[:, 0], h[:, 1]
    assert np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) > 0
    assert len(convex_hull(np.array([[1.0, 2.0]]))) == 1
    col = np.unique(np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]]), axis=0)
    assert len(convex_hull(col)) <= 2


def test_region_hulls_and_transitions_run(ray_session):
    from texel_ray.pipelines.mlprep import q_region_hulls
    from texel_ray.pipelines.relational import q_event_transitions

    hulls = q_region_hulls("/root/testdata/sf0.001").to_pandas()
    assert len(hulls) > 0
    assert (hulls["n_hull"] <= hulls["n_points"]).all()
    assert (hulls["hull_area"] >= 0).all()
    tr = q_event_transitions("/root/testdata/sf0.001").to_pandas()
    assert len(tr) > 0 and (tr["n"] > 0).all()


def test_polyfill_area_and_holes():
    """polyfill cell count ~ polygon area / cell area; holes subtract;
    disjoint polygons fill disjoint cell sets (center-in-polygon)."""
    sq = [[(0.0, 0.0), (2e6, 0.0), (2e6, 2e6), (0.0, 2e6)]]
    q, r = hg.polyfill(sq, 4)
    s = hg.S0 / np.sqrt(7.0) ** 4
    cell_area = s * s * np.sqrt(3.0) * 1.5
    assert len(q) == pytest.approx(4e12 / cell_area, rel=0.05)
    holed = sq + [[(5e5, 5e5), (5e5, 1.5e6), (1.5e6, 1.5e6), (1.5e6, 5e5)]]
    qh, _ = hg.polyfill(holed, 4)
    assert len(qh) < len(q)
    assert len(qh) == pytest.approx(3e12 / cell_area, rel=0.06)
    sq2 = [[(3e6, 0.0), (5e6, 0.0), (5e6, 2e6), (3e6, 2e6)]]
    q2, r2 = hg.polyfill(sq2, 4)
    assert not (set(zip(q.tolist(), r.tolist())) & set(zip(q2.tolist(), r2.tolist())))


def test_polyfill_cells_centers_inside():
    """Every filled cell's center satisfies even-odd containment."""
    tri = [[(0.0, 0.0), (3e6, 0.0), (0.0, 3e6)]]
    q, r = hg.polyfill(tri, 5)
    cx, cy = hg.cell_center(q, r, 5)
    # half-plane check for the CCW triangle
    for (x1, y1), (x2, y2) in [((0, 0), (3e6, 0)), ((3e6, 0), (0, 3e6)), ((0, 3e6), (0, 0))]:
        assert np.all((x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1) >= 0)


def test_cell_to_boundary_geometry():
    """cellToBoundary: corner centroid = cell center, hexagon area equals
    the exact cell area at every res, adjacent cells share exactly two
    corners (a full edge), and the boundary contains the center under
    the polyfill containment test."""
    q = np.array([0, 5, -3])
    r = np.array([0, -2, 7])
    for res in (0, 3, 9):
        b = hg.cell_to_boundary(q, r, res)
        cx, cy = hg.cell_center(q, r, res)
        assert b.shape == (3, 6, 2)
        assert np.allclose(b.mean(axis=1), np.stack([cx, cy], axis=-1))
        s_lat = hg.S0 / np.sqrt(7.0) ** res
        want_area = s_lat * s_lat * np.sqrt(3.0) * 1.5
        for k in range(3):
            x, y = b[k, :, 0], b[k, :, 1]
            area = 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
            assert area == pytest.approx(want_area, rel=1e-12)
    b0 = hg.cell_to_boundary(np.array([0]), np.array([0]), 4)[0]
    b1 = hg.cell_to_boundary(np.array([1]), np.array([0]), 4)[0]
    shared = sum(
        1 for c in b0 for c2 in b1 if np.allclose(c, c2, atol=1e-6)
    )
    assert shared == 2
