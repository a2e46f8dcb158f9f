"""Property-based tests (hypothesis) for the core kernels."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st

# deterministic example generation: this suite is a correctness GATE, a
# randomized property run that fails on the 200th session is a flake,
# not a signal (new falsifying examples belong in explicit regression
# tests). derandomize fixes the example stream per test body.
settings.register_profile("gate", derandomize=True)
settings.load_profile("gate")

from texel_ray.core import fixedpoint as fp
from texel_ray.core import morton
from texel_ray.core.geom import (
    shoelace,
    wkb_decode,
    wkb_encode_multipolygon,
    wkb_encode_polygon,
    winding_of_points,
)
from texel_ray.stages.vectorcut import sutherland_hodgman

coord = st.floats(
    min_value=-1e7, max_value=1e7, allow_nan=False, allow_infinity=False
)


@settings(max_examples=200, deadline=None)
@given(st.integers(0, (1 << 32) - 1), st.integers(0, (1 << 32) - 1))
def test_morton_roundtrip(x, y):
    assert morton.from_z(morton.to_z(x, y)) == (x, y)


@settings(max_examples=200, deadline=None)
@given(coord)
def test_fixedpoint_roundtrip_close(x):
    # float -> int64 -> float loses at most one fixed-point unit plus the
    # float ulp of the scaled product (x*1e10 ~ 1e17 has ulp ~ 16)
    assert abs(fp.to_ord(fp.from_ord(x)) - x) <= 1e-10 + abs(x) * 1e-15


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(coord, coord), min_size=3, max_size=12),
)
def test_wkb_polygon_roundtrip(ring):
    # decode strips a closing point equal to the first (LinearRings
    # semantics), so only unclosed rings round-trip verbatim
    assume(ring[0] != ring[-1])
    buf = wkb_encode_polygon([ring])
    kind, coords = wkb_decode(buf)
    assert kind == "Polygon"
    assert coords[0] == ring
    buf2 = wkb_encode_multipolygon([[ring], [ring]])
    kind2, coords2 = wkb_decode(buf2)
    assert kind2 == "MultiPolygon" and len(coords2) == 2


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(coord, coord), min_size=3, max_size=10),
)
def test_winding_reverse_flips_sign(ring):
    w = winding_of_points(ring)
    w_rev = winding_of_points(list(reversed(ring)))
    # degeneracy guard must be RELATIVE: with ~1e7 coords the shoelace
    # sum cancels catastrophically, and a ring whose area is small
    # relative to coord^2 can sum to exactly 0.0 in one traversal
    # direction only (found by hypothesis: a repeated-vertex bowtie)
    max_c = max(max(abs(x), abs(y)) for x, y in ring)
    assume(shoelace(ring) > 1e-9 * max(max_c * max_c, 1.0))
    if w != 0:
        assert w_rev == -w


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=-100, max_value=100, allow_nan=False),
    st.floats(min_value=-100, max_value=100, allow_nan=False),
    st.floats(min_value=1, max_value=50, allow_nan=False),
)
def test_clip_convex_polygon_partitions_area(cx, cy, r):
    """Clipping a convex polygon by the 4 quadrant rects around any split
    point partitions its area."""
    pts = [
        (cx + r * math.cos(2 * math.pi * k / 8), cy + r * math.sin(2 * math.pi * k / 8))
        for k in range(8)
    ]
    area = shoelace(pts)
    big = 1e4
    rects = [
        (cx - big, cy - big, cx, cy),
        (cx, cy - big, cx + big, cy),
        (cx - big, cy, cx, cy + big),
        (cx, cy, cx + big, cy + big),
    ]
    clipped_total = 0.0
    for rect in rects:
        piece = sutherland_hodgman(pts, rect)
        if len(piece) >= 3:
            clipped_total += shoelace(piece)
    assert clipped_total == np.float64(0) if area == 0 else abs(
        clipped_total - area
    ) <= 1e-9 * max(1.0, area)


@given(
    lon=st.floats(-180.0, 180.0, allow_nan=False),
    lat=st.floats(-89.999, 89.999, allow_nan=False),
    level=st.integers(1, 20),
)
@settings(max_examples=200, deadline=None)
def test_s2_token_roundtrip_property(lon, lat, level):
    """cell_token/token_to_cell_id invert each other for any cell, and
    the token really concentrates entropy in the low bits (the pyarrow
    grouper pathology guard)."""
    from texel_ray.core import s2

    cid = s2.cell_id_from_lonlat(np.array([lon]), np.array([lat]), level=level)
    tok = s2.cell_token(cid, level)
    back = s2.token_to_cell_id(tok, level)
    assert back[0] == cid[0]
    assert tok[0] < (1 << (2 * level + 3))  # compact: high bits clear
    assert s2.level_of(back)[0] == level


@given(
    n_iv=st.integers(1, 25),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=60, deadline=None)
def test_interval_joiner_property(n_iv, seed):
    """Range-join kernel == O(rows x intervals) reference for arbitrary
    overlapping/nested/zero-width interval sets."""
    import pyarrow as pa

    from texel_ray.stages.interval import IntervalJoiner

    rng = np.random.default_rng(seed)
    lo = np.round(rng.uniform(0, 50, n_iv), 1)
    hi = lo + np.round(rng.uniform(0, 20, n_iv), 1)
    v = np.round(rng.uniform(-5, 75, 120), 1)
    j = IntervalJoiner(lo, hi, np.arange(n_iv), "v", keep_columns=["row"])
    out = j(pa.table({"row": pa.array(np.arange(120)), "v": pa.array(v)}))
    got = set(zip(out["row"].to_pylist(), out["interval_id"].to_pylist()))
    exp = {
        (r, k) for r in range(120) for k in range(n_iv) if lo[k] <= v[r] < hi[k]
    }
    assert got == exp
