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


def brute_dbscan(ids, lon, lat, eps: float, min_pts: int):
    """Single-node exact DBSCAN reference (chunked O(n^2)): shares NO
    code with stages/dbscan.py's grid decomposition. Returns a dict
    id -> cluster id (min member id); noise ids absent. Border points
    join their nearest core neighbor, ties broken by smallest core id
    (the same deterministic rule as the distributed stage)."""
    import numpy as np

    ids = np.asarray(ids)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, lon, lat = ids[order], lon[order], lat[order]
    n = len(ids)
    eps2 = eps * eps
    chunk = 2048

    counts = np.zeros(n, dtype=np.int64)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        d2 = (lon[s:e, None] - lon[None, :]) ** 2 + (lat[s:e, None] - lat[None, :]) ** 2
        counts[s:e] = (d2 <= eps2).sum(axis=1)
    core = counts >= min_pts

    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    cidx = np.nonzero(core)[0]
    clon, clat = lon[cidx], lat[cidx]
    for s in range(0, len(cidx), chunk):
        e = min(s + chunk, len(cidx))
        d2 = (clon[s:e, None] - clon[None, :]) ** 2 + (clat[s:e, None] - clat[None, :]) ** 2
        ii, jj = np.nonzero(d2 <= eps2)
        for a, b in zip(cidx[ii + s], cidx[jj]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    member_root = {}
    for i in cidx:
        member_root[i] = find(i)

    # border points: nearest core, tie -> smallest core id (ids sorted,
    # argmin returns the first = smallest id among equals)
    bidx = np.nonzero(~core)[0]
    if len(cidx):
        for s in range(0, len(bidx), chunk):
            e = min(s + chunk, len(bidx))
            sub = bidx[s:e]
            d2 = (lon[sub][:, None] - clon[None, :]) ** 2 + (lat[sub][:, None] - clat[None, :]) ** 2
            d2[d2 > eps2] = np.inf
            best = np.argmin(d2, axis=1)
            ok = np.isfinite(d2[np.arange(len(sub)), best])
            for i, b in zip(sub[ok], best[ok]):
                member_root[i] = find(cidx[b])

    # cluster id = min id over ALL members (cores AND borders) -- same
    # definition as the distributed stage
    root_min = {}
    for i, r in member_root.items():
        lab = ids[i]
        if r not in root_min or lab < root_min[r]:
            root_min[r] = lab
    return {ids[i]: root_min[r] for i, r in member_root.items()}
