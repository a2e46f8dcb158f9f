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
