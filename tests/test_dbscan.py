"""Distributed exact DBSCAN (stages/dbscan.py) vs the independent
single-node brute-force reference (golden_util.brute_dbscan): exact
assignment equality on planted blobs + noise, plus edge-case behavior
(eps-straddling cells, all-noise corpora, borders shared between
clusters)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tests.golden_util import brute_dbscan
from texel_ray.stages.dbscan import dbscan


def _run(ids, lon, lat, eps, min_pts, parallelism=8):
    import ray.data

    t = pa.table(
        {
            "image_id": pa.array(ids),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        }
    )
    ds = ray.data.from_arrow(t).repartition(parallelism)
    got = dbscan(ds, eps=eps, min_pts=min_pts).to_pandas()
    if len(got) == 0:  # Ray's to_pandas drops columns on empty datasets
        return {}
    return dict(zip(got["image_id"], got["cluster"]))


def test_blobs_plus_noise_exact(ray_session):
    rng = np.random.default_rng(3)
    blobs = [(-5.0, 2.0, 400), (0.03, 0.01, 300), (9.0, -7.0, 250)]
    lon = [rng.normal(bx, 0.01, n) for bx, _, n in blobs] + [
        rng.uniform(-20, 20, 800)
    ]
    lat = [rng.normal(by, 0.01, n) for _, by, n in blobs] + [
        rng.uniform(-20, 20, 800)
    ]
    lon, lat = np.concatenate(lon), np.concatenate(lat)
    ids = np.array([f"p{i:05d}" for i in range(len(lon))])
    got = _run(ids, lon, lat, eps=0.02, min_pts=5)
    want = brute_dbscan(ids, lon, lat, 0.02, 5)
    assert got == want
    assert len(set(got.values())) == 3


def test_chain_across_many_cells(ray_session):
    """A line of points spaced 0.9*eps apart chains through dozens of
    cells into ONE cluster (pure cross-cell union-find path)."""
    eps = 0.01
    n = 60
    lon = np.arange(n) * (0.9 * eps)
    lat = np.zeros(n)
    ids = np.array([f"c{i:03d}" for i in range(n)])
    got = _run(ids, lon, lat, eps=eps, min_pts=3)
    want = brute_dbscan(ids, lon, lat, eps, 3)
    assert got == want
    assert len(set(got.values())) == 1
    assert len(got) == n


def test_two_clusters_separated_by_just_over_eps(ray_session):
    """Two tight blobs with min gap slightly over eps stay separate."""
    rng = np.random.default_rng(11)
    a_lon = rng.uniform(0.0, 0.004, 40)
    a_lat = rng.uniform(0.0, 0.004, 40)
    b_lon = a_lon + 0.0152  # > eps=0.01 from every a point
    b_lat = a_lat
    lon = np.concatenate([a_lon, b_lon])
    lat = np.concatenate([a_lat, b_lat])
    ids = np.array([f"s{i:03d}" for i in range(len(lon))])
    got = _run(ids, lon, lat, eps=0.01, min_pts=4)
    want = brute_dbscan(ids, lon, lat, 0.01, 4)
    assert got == want
    assert len(set(got.values())) == 2


def test_all_noise(ray_session):
    rng = np.random.default_rng(5)
    lon = rng.uniform(-50, 50, 200)
    lat = rng.uniform(-50, 50, 200)
    ids = np.array([f"n{i:03d}" for i in range(200)])
    got = _run(ids, lon, lat, eps=0.001, min_pts=5)
    assert got == {}


def test_border_point_tie_is_deterministic(ray_session):
    """A border point equidistant from cores of two different clusters
    joins the cluster of the smaller core id — in both implementations."""
    # cluster A: 5 cores at x ~ 0; cluster B: 5 cores at x ~ 0.05
    # border at x = 0.025, exactly 0.009 from a core of each side
    a = [(0.0, i * 0.001) for i in range(5)]
    b = [(0.05, i * 0.001) for i in range(5)]
    border = [(0.016, 0.0), (0.034, 0.0)]
    lon = np.array([p[0] for p in a + b + border])
    lat = np.array([p[1] for p in a + b + border])
    ids = np.array([f"t{i:02d}" for i in range(len(lon))])
    got = _run(ids, lon, lat, eps=0.016, min_pts=3)
    want = brute_dbscan(ids, lon, lat, 0.016, 3)
    assert got == want


def _group_table(pts, tcx, tcy):
    """Donated rows for ONE segment: every point targeted at (tcx, tcy)."""
    ids, lon, lat, core = zip(*pts)
    return pa.table(
        {
            "image_id": pa.array(list(ids)),
            "lon": pa.array(list(lon)),
            "lat": pa.array(list(lat)),
            "core": pa.array(list(core)),
            "tcx": pa.array([tcx] * len(pts), pa.int64()),
            "tcy": pa.array([tcy] * len(pts), pa.int64()),
        }
    )


def test_labeler_labels_are_row_order_independent():
    """The same cell is labeled independently in up to 9 shuffle groups,
    and Ray Data guarantees no row order within a group — so CellLabeler's
    provisional component labels must be canonical (id-derived), not
    positional. Permuting the group's rows must not change any emitted
    assignment or edge label."""
    from texel_ray.stages.dbscan import CellLabeler

    eps = 1.0
    # cell (0,0): two separate core components A (near origin corner) and
    # B (near far corner), > eps apart; cell (1,1): two components C1
    # (close enough to B for a cross-cell edge) and C2 (isolated).
    pts = (
        [(f"a{i}", 0.05 + 0.02 * i, 0.05, True) for i in range(3)]
        + [(f"b{i}", 0.95 - 0.02 * i, 0.95, True) for i in range(3)]
        + [(f"c{i}", 1.05 + 0.02 * i, 1.05, True) for i in range(3)]
        + [(f"d{i}", 1.90 - 0.02 * i, 1.90, True) for i in range(3)]
    )
    labeler = CellLabeler(eps)
    group1 = _group_table(pts, 0, 0)
    base = labeler(group1).to_pandas().sort_values(
        ["kind", "image_id", "label", "label_b"]
    ).reset_index(drop=True)
    rng = np.random.default_rng(7)
    for _ in range(5):
        perm = rng.permutation(len(pts))
        shuffled = labeler(group1.take(pa.array(perm))).to_pandas().sort_values(
            ["kind", "image_id", "label", "label_b"]
        ).reset_index(drop=True)
        assert shuffled.equals(base)

    # cross-group consistency: cell (1,1)'s labels as seen from home
    # (0,0)'s EDGES must match its labels in home (1,1)'s ASSIGNMENTS,
    # even when the two groups present the rows in different orders.
    perm = rng.permutation(len(pts))
    group2 = _group_table(pts, 1, 1).take(pa.array(perm))
    out2 = labeler(group2).to_pandas()
    c_labels = set(
        out2[(out2["kind"] == "A") & out2["image_id"].str.startswith("c")]["label"]
    )
    assert len(c_labels) == 1  # C1 is one component
    edges = base[base["kind"] == "E"]
    assert len(edges) > 0
    assert set(edges["label_b"]) <= c_labels | set(
        out2[out2["kind"] == "A"]["label"]
    )
    assert set(edges["label_b"]) == c_labels


def test_eps_too_small_for_label_packing_raises(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"image_id": ["x"], "lon": [0.0], "lat": [0.0]})
    )
    with pytest.raises(ValueError, match="21-bit"):
        dbscan(ds, eps=1e-5, min_pts=3)


def test_dense_cell_kernels_exact(ray_session):
    """Blobs big enough to push every segment past _DENSE (512): the
    sub-grid counting/components/edge/border kernels must agree with the
    brute-force reference exactly."""
    rng = np.random.default_rng(42)
    blobs = [(-5.0, 2.0, 1500), (0.03, 0.01, 1200), (0.05, 0.03, 1000)]
    lon = np.concatenate(
        [rng.normal(bx, 0.008, n) for bx, _, n in blobs]
        + [rng.uniform(-20, 20, 800)]
    )
    lat = np.concatenate(
        [rng.normal(by, 0.008, n) for _, by, n in blobs]
        + [rng.uniform(-20, 20, 800)]
    )
    ids = np.array([f"d{i:05d}" for i in range(len(lon))])
    got = _run(ids, lon, lat, eps=0.02, min_pts=10)
    want = brute_dbscan(ids, lon, lat, 0.02, 10)
    assert got == want


def test_dense_kernels_match_matrix_kernels():
    """Kernel-level parity: the sub-grid fast paths return bit-identical
    results to the chunked matrix paths on random dense inputs."""
    import texel_ray.stages.dbscan as D

    rng = np.random.default_rng(3)
    eps = 0.02
    eps2 = eps * eps
    # counting
    lon = rng.uniform(0, 0.06, 4000)
    lat = rng.uniform(0, 0.06, 4000)
    res = rng.choice(4000, 1000, replace=False)
    flags = D._count_cores_dense(lon, lat, res, eps, 10)
    cnt = D._neighbor_counts(lon[res], lat[res], lon, lat, eps2)
    assert np.array_equal(flags, cnt >= 10)
    # components: dense route vs iterative route
    clon = np.concatenate([rng.normal(x, 0.0008, 400) for x in rng.uniform(0, 0.02, 5)])
    clat = np.concatenate([rng.normal(y, 0.0008, 400) for y in rng.uniform(0, 0.02, 5)])
    core = rng.random(len(clon)) < 0.9
    got = D._local_components(clon, clat, core, 0.002**2)
    old = D._DENSE
    try:
        D._DENSE = 10**9
        want = D._local_components(clon, clat, core, 0.002**2)
    finally:
        D._DENSE = old
    assert np.array_equal(got, want)
    # edges
    alon = rng.uniform(0.0, 0.02, 1500); alat = rng.uniform(0.0, 0.02, 1500)
    blon = rng.uniform(0.02, 0.04, 1200); blat = rng.uniform(0.0, 0.04, 1200)
    alab = rng.integers(0, 4, 1500); blab = rng.integers(10, 15, 1200)
    pa_, pb_ = D._edge_pairs_dense(alon, alat, alab, blon, blat, blab, eps)
    Dm = (alon[:, None] - blon[None, :]) ** 2 + (alat[:, None] - blat[None, :]) ** 2
    ii, jj = np.nonzero(Dm <= eps2)
    assert set(zip(pa_.tolist(), pb_.tolist())) == set(
        zip(alab[ii].tolist(), blab[jj].tolist())
    )
    # nearest core with forced exact ties (rounded coords)
    blon2 = rng.uniform(0, 0.06, 800); blat2 = rng.uniform(0, 0.06, 800)
    clon2 = rng.uniform(0, 0.06, 2000).round(3)
    clat2 = rng.uniform(0, 0.06, 2000).round(3)
    bp = D._nearest_core_dense(blon2, blat2, clon2, clat2, eps)
    Dm = (blon2[:, None] - clon2[None, :]) ** 2 + (blat2[:, None] - clat2[None, :]) ** 2
    Dm[Dm > eps2] = np.inf
    best = np.argmin(Dm, axis=1)
    ok = np.isfinite(Dm[np.arange(800), best])
    assert np.array_equal(bp, np.where(ok, best, -1))
