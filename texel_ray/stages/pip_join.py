"""Point-in-polygon join: broadcast-hash-join shaped actor-pool stage.

The polygon side is small (a dimension table); instead of shuffling the
big fact side we give every actor its own spatial index, built ONCE in
``__init__`` (the reference's in-record inner->outer PIP test
``snap/snap.go:277-324`` lifted to a dataset-level join):

- bbox arrays for a vectorized candidate filter (numpy broadcast
  compare — the STRtree role for a few hundred polygons; swap in a real
  tree if the dimension table grows),
- per-polygon edge arrays for an exact, vectorized even-odd
  crossing-number test on the candidates.

Usage::

    joined = points.map_batches(
        PIPJoiner, fn_constructor_kwargs={"regions_path": path},
        batch_format="pyarrow", concurrency=8)

Emits one output row per (point, matching polygon) pair — inner-join
semantics; points in no region produce nothing. At cluster scale the
polygon table is either regenerated per actor (deterministic seed) or
``ray.put`` once and fetched in ``__init__`` — never shipped per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.geom import wkb_decode


class PIPJoiner:
    def __init__(
        self,
        regions_path: str | None = None,
        regions: pa.Table | None = None,
        lon_col: str = "lon",
        lat_col: str = "lat",
        keep_columns: list[str] | None = None,
    ):
        if regions is None:
            if regions_path is None:
                from ..sources.regions import regions_parquet_path

                regions_path = regions_parquet_path()
            import pyarrow.parquet as pq

            regions = pq.read_table(regions_path)
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.keep_columns = keep_columns
        self.region_id = regions["region_id"].to_numpy()
        self.region_name = regions["name"].to_pylist()
        self.minx = regions["minx"].to_numpy()
        self.miny = regions["miny"].to_numpy()
        self.maxx = regions["maxx"].to_numpy()
        self.maxy = regions["maxy"].to_numpy()
        kinds = regions["kind"].to_pylist()
        self.is_rect = np.array([k == "rect" for k in kinds])
        # per-polygon edge arrays (x1, y1, x2, y2) for the exact test
        self.edges = []
        for i, buf in enumerate(regions["geom_wkb"].to_pylist()):
            kind, rings = wkb_decode(buf)
            assert kind == "Polygon"
            ring = rings[0]
            pts = np.asarray(ring + [ring[0]], dtype=np.float64)
            self.edges.append((pts[:-1, 0], pts[:-1, 1], pts[1:, 0], pts[1:, 1]))

    def _contains(self, poly_i: int, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        if self.is_rect[poly_i]:
            return (
                (px >= self.minx[poly_i])
                & (px <= self.maxx[poly_i])
                & (py >= self.miny[poly_i])
                & (py <= self.maxy[poly_i])
            )
        x1, y1, x2, y2 = self.edges[poly_i]
        # even-odd crossing number, vectorized over (points x edges)
        pyv = py[:, None]
        pxv = px[:, None]
        crosses = (y1[None, :] > pyv) != (y2[None, :] > pyv)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1)[None, :] * (pyv - y1[None, :]) / (y2 - y1)[None, :] + x1[
                None, :
            ]
        hits = crosses & (pxv < xint)
        return (hits.sum(axis=1) % 2).astype(bool)

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.lon_col].to_numpy(zero_copy_only=False)
        py = batch[self.lat_col].to_numpy(zero_copy_only=False)
        keep = self.keep_columns if self.keep_columns is not None else batch.column_names

        # vectorized bbox candidate filter: (points x polygons) bitmask.
        # dimension table is small, so the dense mask is cheap; a real
        # STRtree replaces this when |polygons| is large.
        cand = (
            (px[:, None] >= self.minx[None, :])
            & (px[:, None] <= self.maxx[None, :])
            & (py[:, None] >= self.miny[None, :])
            & (py[:, None] <= self.maxy[None, :])
        )
        out_point_idx = []
        out_region = []
        for poly_i in np.nonzero(cand.any(axis=0))[0]:
            idx = np.nonzero(cand[:, poly_i])[0]
            if not self.is_rect[poly_i]:
                inside = self._contains(poly_i, px[idx], py[idx])
                idx = idx[inside]
            if len(idx):
                out_point_idx.append(idx)
                out_region.append(np.full(len(idx), poly_i, dtype=np.int64))

        if not out_point_idx:
            cols = [batch[c].slice(0, 0) for c in keep]
            cols += [pa.array([], pa.int64()), pa.array([], pa.string())]
            return pa.table(cols, names=[*keep, "region_id", "region_name"])

        point_idx = np.concatenate(out_point_idx)
        region_idx = np.concatenate(out_region)
        order = np.argsort(point_idx, kind="stable")
        point_idx = point_idx[order]
        region_idx = region_idx[order]

        take = pa.array(point_idx)
        cols = [batch[c].take(take) for c in keep]
        cols.append(pa.array(self.region_id[region_idx]))
        cols.append(pa.array([self.region_name[i] for i in region_idx], pa.string()))
        return pa.table(cols, names=[*keep, "region_id", "region_name"])
