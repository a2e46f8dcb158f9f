"""STR R-tree (core/strtree.py): exactness vs a brute-force bbox mask
across sizes, closed-boundary semantics, and degenerate inputs."""

import numpy as np

from texel_ray.core.strtree import STRtree


def _brute(minx, miny, maxx, maxy, px, py):
    mask = (
        (px[:, None] >= minx[None, :])
        & (px[:, None] <= maxx[None, :])
        & (py[:, None] >= miny[None, :])
        & (py[:, None] <= maxy[None, :])
    )
    return set(zip(*[a.tolist() for a in np.nonzero(mask)]))


def test_strtree_matches_bruteforce_across_sizes():
    rng = np.random.default_rng(42)
    for n in (0, 1, 7, 100, 1000, 20000):
        cx = rng.uniform(-180, 180, n)
        cy = rng.uniform(-90, 90, n)
        w = rng.uniform(0.01, 5, n)
        h = rng.uniform(0.01, 5, n)
        minx, maxx = cx - w, cx + w
        miny, maxy = cy - h, cy + h
        t = STRtree(minx, miny, maxx, maxy)
        px = rng.uniform(-185, 185, 3000)
        py = rng.uniform(-95, 95, 3000)
        pi, bi = t.query_points(px, py)
        got = set(zip(pi.tolist(), bi.tolist()))
        assert len(got) == len(pi)  # each pair exactly once
        want = _brute(minx, miny, maxx, maxy, px, py) if n else set()
        assert got == want


def test_strtree_closed_bounds_and_outside():
    t = STRtree(
        np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([1.0])
    )
    pi, bi = t.query_points(
        np.array([0.0, 1.0, 0.5, 1.0000001, -0.0000001]),
        np.array([0.0, 1.0, 0.5, 0.5, 0.5]),
    )
    assert pi.tolist() == [0, 1, 2] and bi.tolist() == [0, 0, 0]


def test_strtree_identical_and_nested_boxes():
    # pathological: many identical boxes plus fully nested ones
    minx = np.array([0.0] * 50 + [-10.0])
    miny = np.array([0.0] * 50 + [-10.0])
    maxx = np.array([1.0] * 50 + [10.0])
    maxy = np.array([1.0] * 50 + [10.0])
    t = STRtree(minx, miny, maxx, maxy)
    pi, bi = t.query_points(np.array([0.5]), np.array([0.5]))
    assert sorted(bi.tolist()) == list(range(51))
    pi, bi = t.query_points(np.array([5.0]), np.array([5.0]))
    assert bi.tolist() == [50]
