"""Marching-squares raster->vector kernel (core/marching.py): exact
integer contour invariants on hand-verifiable shapes, plus round-trip
consistency (mask area vs enclosed contour area)."""

from __future__ import annotations

import numpy as np
import pytest

from texel_ray.core.marching import (
    loop_area2,
    loop_perimeter,
    marching_squares,
    vectorize_mask,
)


def test_single_pixel_diamond():
    m = np.zeros((5, 5), bool)
    m[2, 2] = True
    loops = marching_squares(m)
    assert len(loops) == 1
    # 4 midpoint segments, L1 length 2 each; diamond area = 2 half-units^2
    assert loop_perimeter(loops[0]) == 8
    assert abs(loop_area2(loops[0])) == 4


def test_filled_square_octagon():
    m = np.zeros((7, 7), bool)
    m[2:5, 2:5] = True
    loops = marching_squares(m)
    assert len(loops) == 1
    # 3x3 px = 36 half-units^2 minus 4 corner triangles (area 1/2 each)
    assert abs(loop_area2(loops[0])) == 68
    assert loop_perimeter(loops[0]) == 24


def test_two_blobs_two_loops():
    m = np.zeros((5, 9), bool)
    m[2, 2] = True
    m[2, 6] = True
    assert len(marching_squares(m)) == 2


def test_donut_outer_and_hole():
    m = np.zeros((9, 9), bool)
    m[2:7, 2:7] = True
    m[4, 4] = False
    loops = marching_squares(m)
    assert len(loops) == 2
    areas = sorted(abs(loop_area2(lp)) for lp in loops)
    assert areas[0] == 4  # the 1-px hole diamond
    # hole has opposite winding to the outer loop
    signs = sorted(np.sign(loop_area2(lp)) for lp in loops)
    assert signs == [-1, 1]


def test_saddle_center_false_rule():
    """Two diagonal pixels stay separate loops (deterministic rule)."""
    m = np.zeros((4, 4), bool)
    m[1, 1] = True
    m[2, 2] = True
    assert len(marching_squares(m)) == 2


def test_empty_and_full():
    assert vectorize_mask(np.zeros((4, 4), bool))["n_loops"] == 0
    full = vectorize_mask(np.ones((3, 3), bool))
    assert full["n_loops"] == 1


def test_area_consistency_random_masks():
    """|contour area| is within the corner-cut bound of the pixel area:
    each convex corner trims 1/2 a half-unit^2; loops never cross."""
    rng = np.random.default_rng(21)
    for _ in range(20):
        m = rng.random((12, 12)) < 0.4
        loops = marching_squares(m)
        area2 = sum(loop_area2(lp) for lp in loops)  # signed: holes cancel
        px_area2 = int(m.sum()) * 8  # 1 px = 4 half-units^2 -> area2 = 8
        n_corners = sum(len(lp) for lp in loops)
        assert abs(area2 - px_area2) <= n_corners * 2
        # determinism
        loops2 = marching_squares(m)
        assert all(np.array_equal(a, b) for a, b in zip(loops, loops2))


def test_vertex_degree_closure():
    """Every loop is closed: consecutive vertices differ by exactly one
    marching step (L1 distance 2), including the wrap-around."""
    rng = np.random.default_rng(5)
    m = rng.random((10, 10)) < 0.5
    for lp in marching_squares(m):
        d = np.abs(np.diff(np.vstack([lp, lp[:1]]), axis=0)).sum(axis=1)
        assert np.all(d == 2)


# ---- overview pyramid (q_tile_pyramid) ------------------------------------


def test_tile_pyramid_conservation(ray_session):
    """Every pyramid level conserves point count and color mass exactly,
    and each parent cell equals the sum of its 2x2 children."""
    from texel_ray.pipelines.mlprep import q_tile_pyramid

    df = q_tile_pyramid("/root/testdata/sf0.001", base_zoom=10, levels=3).to_pandas()
    lv = df.groupby("tm_id")[["n", "sum_r"]].sum()
    assert lv["n"].nunique() == 1
    assert lv["sum_r"].nunique() == 1
    base = df[df.tm_id == 10]
    parents = df[df.tm_id == 9]
    child_sums = (
        base.assign(pgx=base.gx // 2, pgy=base.gy // 2)
        .groupby(["pgx", "pgy"])[["n", "sum_r", "sum_g", "sum_b"]]
        .sum()
        .reset_index()
    )
    merged = parents.merge(
        child_sums, left_on=["gx", "gy"], right_on=["pgx", "pgy"], how="outer",
        suffixes=("", "_c"),
    )
    assert len(merged) == len(parents)
    for col in ("n", "sum_r", "sum_g", "sum_b"):
        assert (merged[col] == merged[f"{col}_c"]).all()


def test_vectorize_masks_batched_identical_to_scalar():
    """The batched kernel must be bit-identical to vectorize_mask per
    image — including empty/full masks, saddle-rich random masks, and
    non-square shapes (the goldens pin per-image vertex-stream CRCs)."""
    import numpy as np

    from texel_ray.core.marching import vectorize_mask, vectorize_masks

    rng = np.random.default_rng(7)
    dense = rng.random((64, 16, 16)) < 0.45
    dense[0][:] = False
    dense[1][:] = True
    assert vectorize_masks(dense) == [vectorize_mask(m) for m in dense]
    odd = rng.random((32, 9, 13)) < 0.3
    assert vectorize_masks(odd) == [vectorize_mask(m) for m in odd]
