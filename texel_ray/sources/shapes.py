"""Deterministic dense-polygon table ("shapes") for the simplification
operator — coastline-like star-shaped Fourier blobs with 300–1500
vertices, some with holes.

Star-shapedness (radius is a single-valued smooth function of angle
around the centroid, and every hole radius is a strict fraction of the
outer radius at the same angle) guarantees the generated polygons are
simple with holes strictly inside — so the simplifier's
no-self-intersection guarantee is testable against clean inputs.

Columns: ``shape_id:int64, name:string, n_vert:int32, has_hole:bool,
geom_wkb:binary`` — coordinates are WebMercator meters (EPSG:3857),
ready for the per-zoom pixel thresholds. Deterministic from the seed;
workers can regenerate it instead of shipping it (same policy as
sources/regions.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.geom import wkb_encode_polygon

SEED = 20260817
N_SHAPES = 48


def _blob(rng: np.random.Generator, n_vert: int, base_r: float):
    """Radius-of-angle Fourier blob: r(t) = R * (1 + sum a_k sin(k t + p_k)),
    amplitudes chosen so r stays in [0.35R, 1.65R] (strictly positive)."""
    ks = np.arange(2, 9)
    amps = rng.uniform(0.0, 0.12, len(ks)) / np.sqrt(ks - 1)
    phases = rng.uniform(0.0, 2.0 * np.pi, len(ks))
    t = np.linspace(0.0, 2.0 * np.pi, n_vert, endpoint=False)
    r = np.ones_like(t)
    for k, a, p in zip(ks, amps, phases):
        r += a * np.sin(k * t + p)
    # fine jitter: sub-pixel-ish noise that simplification should erase
    r += rng.uniform(-0.004, 0.004, n_vert)
    return t, base_r * r


def generate_shapes_table() -> pa.Table:
    rng = np.random.default_rng(SEED)
    shape_id, name, n_vert_col, has_hole, wkb = [], [], [], [], []
    for sid in range(N_SHAPES):
        n_vert = int(rng.integers(300, 1500))
        base_r = float(rng.uniform(30_000.0, 900_000.0))
        cx = float(rng.uniform(-1.6e7, 1.6e7))
        cy = float(rng.uniform(-1.2e7, 1.2e7))
        t, r = _blob(rng, n_vert, base_r)
        outer = list(
            zip((cx + r * np.cos(t)).tolist(), (cy + r * np.sin(t)).tolist())
        )
        rings = [outer]
        hole = sid % 3 == 0
        if hole:
            # hole: same angular samples at 40% radius, REVERSED winding
            rh = 0.4 * r
            inner = list(
                zip(
                    (cx + rh * np.cos(t)).tolist(),
                    (cy + rh * np.sin(t)).tolist(),
                )
            )
            rings.append(inner[::-1])
        shape_id.append(sid)
        name.append(f"blob_{sid}")
        n_vert_col.append(sum(len(rg) for rg in rings))
        has_hole.append(hole)
        wkb.append(wkb_encode_polygon(rings))
    return pa.table(
        {
            "shape_id": pa.array(shape_id, type=pa.int64()),
            "name": pa.array(name),
            "n_vert": pa.array(n_vert_col, type=pa.int32()),
            "has_hole": pa.array(has_hole),
            "geom_wkb": pa.array(wkb, type=pa.binary()),
        }
    )


def shapes_parquet_path() -> str:
    import os

    import pyarrow.parquet as pq

    from .images import DATA_DIR

    path = DATA_DIR / "shapes_v1.parquet"
    if not path.exists():
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp")
        pq.write_table(generate_shapes_table(), tmp)
        os.replace(tmp, path)
    return str(path)
