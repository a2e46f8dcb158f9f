"""Helpers to materialize golden-case fixtures (extracted from the
reference's table-driven tests by tools/extract_goldens.py)."""

from __future__ import annotations

import json
import pathlib

from texel_ray.core import fixedpoint as fp
from texel_ray.core.pointindex import PointIndex
from texel_ray.core.tms import builtin_tms, make_simple_tms

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def load_cases(name: str):
    return json.loads((GOLDEN_DIR / name).read_text())


def build_tms(marker):
    kind = marker["tms"][0]
    if kind == "embedded":
        return builtin_tms(marker["tms"][1])
    if kind == "simple":
        return make_simple_tms(marker["tms"][1], marker["tms"][2])
    raise ValueError(marker)


def build_pointindex(marker):
    kind, *args = marker["pointindex"]
    if kind == "embedded":
        return PointIndex(builtin_tms(args[0]), args[1])
    if kind == "simple":
        deepest_level, cell_size = args
        return _simple_pointindex(deepest_level, cell_size)
    raise ValueError(marker)


def _simple_pointindex(deepest_level: int, cell_size: float) -> PointIndex:
    """Mirror of the reference test fixture ``newSimplePointIndex``:
    extent (0,0)-(span,span), span = cellSize * 2^deepestLevel."""
    ix = PointIndex.__new__(PointIndex)
    span = cell_size * (1 << deepest_level)
    ix.deepest_level = deepest_level
    ix.int_extent = (0, 0, fp.from_ord(span), fp.from_ord(span))
    ix.deepest_size = 1 << deepest_level
    ix.deepest_res = (ix.int_extent[2] - ix.int_extent[0]) // ix.deepest_size
    ix.quadrants = {}
    ix.hit_once = {}
    ix.hit_multiple = {}
    _, ix.int_centroid = ix._quadrant_extent_and_centroid(0, 0, 0)
    return ix


def as_lists(obj):
    """Nested tuples -> nested lists (for comparison against JSON data)."""
    if isinstance(obj, tuple):
        return [as_lists(v) for v in obj]
    if isinstance(obj, list):
        return [as_lists(v) for v in obj]
    if isinstance(obj, dict):
        return {k: as_lists(v) for k, v in obj.items()}
    return obj
