"""Snap-kernel conformance suite: the reference's 32 golden polygon cases
(``snap/snap_test.go:20-800``) plus the ring/kmp/dedupe unit goldens, run
against our pure-Python snap implementation. Exact vertex equality."""

from __future__ import annotations

import pytest

from texel_ray.core.geom import ring_contains
from texel_ray.core.snap import (
    SnapConfig,
    _dedupe_inners_outers,
    _kmp_deduplicate,
    snap_polygon,
)

from .golden_util import as_lists, build_tms, load_cases

SNAP_CASES = load_cases("snap_polygon_cases.json")


def _config(case) -> SnapConfig:
    cfg = case.get("config") or {}
    if isinstance(cfg, list):  # empty literal extracted as []
        cfg = {}
    return SnapConfig(
        keep_points_and_lines=cfg.get("KeepPointsAndLines", False),
        ignore_outside_grid=cfg.get("IgnoreOutsideGrid", False),
        reverse_winding_order=cfg.get("ReverseWindingOrder", False),
    )


@pytest.mark.parametrize("case", SNAP_CASES, ids=[c["name"] for c in SNAP_CASES])
def test_snap_polygon_golden(case):
    tms = build_tms(case["tms"])
    tm_ids = case["tmIDs"]
    polygon = [[tuple(pt) for pt in ring] for ring in case["polygon"]]
    config = _config(case)

    if case.get("wantPanic"):
        with pytest.raises(Exception):
            snap_polygon(polygon, tms, tm_ids, config)
        return

    got = snap_polygon(polygon, tms, tm_ids, config)
    want = case["want"] if isinstance(case["want"], dict) else {}
    for tm_id_str, want_polys in want.items():
        tm_id = int(tm_id_str)
        got_polys = as_lists(got.get(tm_id, []))
        assert got_polys == want_polys, (
            f"{case['name']}: tm {tm_id}\n got: {got_polys}\nwant: {want_polys}"
        )


def test_ring_contains_golden():
    for case in load_cases("ring_contains_cases.json"):
        ring = [tuple(p) for p in case["args"]["ring"]]
        point = tuple(case["args"]["point"])
        contains, on_boundary = ring_contains(ring, point)
        assert contains == case["wantContains"], case["name"]
        assert on_boundary == case["wantOnBoundary"], case["name"]


def test_kmp_deduplicate_golden():
    for case in load_cases("kmp_dedupe_cases.json"):
        ring = [tuple(p) for p in case["ring"]]
        got = _kmp_deduplicate(ring)
        assert as_lists(got) == case["want"], case["name"]


def test_dedupe_inners_outers_golden():
    for case in load_cases("dedupe_inners_outers_cases.json"):
        outers = [[tuple(p) for p in r] for r in case["args"]["outers"]]
        inners = [[tuple(p) for p in r] for r in case["args"]["inners"]]
        got_outers, got_inners = _dedupe_inners_outers(outers, inners)
        assert as_lists(got_outers) == case["wantOuters"], case["name"]
        assert as_lists(got_inners) == case["wantInners"], case["name"]
