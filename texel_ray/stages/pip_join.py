"""Point-in-polygon join: broadcast-hash-join shaped actor-pool stage.

The polygon side is small (a dimension table); instead of shuffling the
big fact side we give every actor its own spatial index, built ONCE in
``__init__`` (the reference's in-record inner->outer PIP test
``snap/snap.go:277-324`` lifted to a dataset-level join):

- a candidate filter over polygon bboxes: dense numpy broadcast compare
  for a few hundred polygons, a packed STR R-tree (``core/strtree.py``)
  or uniform cell grid above that — all three produce identical pairs,
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


def evenodd_contains(
    x1: np.ndarray,
    y1: np.ndarray,
    x2: np.ndarray,
    y2: np.ndarray,
    px: np.ndarray,
    py: np.ndarray,
) -> np.ndarray:
    """Even-odd crossing-number test, vectorized over (points x edges).

    The one exact-containment kernel shared by every PIP path (broadcast
    joiner, anti join, shuffle cover join) so their semantics can never
    drift apart."""
    pyv = py[:, None]
    pxv = px[:, None]
    crosses = (y1[None, :] > pyv) != (y2[None, :] > pyv)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1)[None, :] * (pyv - y1[None, :]) / (y2 - y1)[None, :] + x1[
            None, :
        ]
    hits = crosses & (pxv < xint)
    return (hits.sum(axis=1) % 2).astype(bool)


class PIPJoiner:
    # Emission-order CONTRACT: __call__ output is lexsorted by
    # (input point position, region index) — see the lexsort before the
    # final take — so all matches for one input row are CONTIGUOUS and
    # input-ordered. pipelines/flagship.FusedTileStage's adjacency dedup
    # (`keep[1:] = ids[1:] != ids[:-1]`) asserts on this flag; flip it
    # only together with that dedup.
    EMITS_POINT_SORTED = True

    def __init__(
        self,
        regions_path: str | None = None,
        regions: pa.Table | None = None,
        lon_col: str = "lon",
        lat_col: str = "lat",
        keep_columns: list[str] | None = None,
        grid_threshold: int = 512,
        index: str = "auto",
    ):
        """``index``: candidate-filter structure — ``dense`` (N x P bbox
        mask, cheapest for a few hundred polygons), ``grid`` (uniform
        cell grid), ``strtree`` (packed STR R-tree, the general large-P
        path), or ``auto`` (dense below ``grid_threshold`` polygons,
        strtree above)."""
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
        # object ndarray so the probe emits names by fancy-index (no
        # per-match Python loop in the hot path)
        self.region_name = np.asarray(regions["name"].to_pylist(), dtype=object)
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
        # spatial index over polygon bboxes, built once per actor, used
        # instead of the dense (points x polygons) mask when the dimension
        # table is large — the dense mask is O(N*P) memory, a scale-killer
        # at 10^5 regions. Default large-P structure is the packed STR
        # R-tree (core/strtree.py); the uniform grid remains selectable.
        if index == "auto":
            index = "dense" if len(self.region_id) <= grid_threshold else "strtree"
        self.index = index
        self.use_grid = index == "grid"
        if index == "strtree":
            from ..core.strtree import STRtree

            self.tree = STRtree(self.minx, self.miny, self.maxx, self.maxy)
        if self.use_grid:
            w = self.maxx - self.minx
            h = self.maxy - self.miny
            self.cell = float(max(np.median(w), np.median(h), 1e-9))
            self.gx0 = float(self.minx.min())
            self.gy0 = float(self.miny.min())
            cell_to_polys: dict[tuple[int, int], list[int]] = {}
            for i in range(len(self.region_id)):
                cx0 = int((self.minx[i] - self.gx0) // self.cell)
                cx1 = int((self.maxx[i] - self.gx0) // self.cell)
                cy0 = int((self.miny[i] - self.gy0) // self.cell)
                cy1 = int((self.maxy[i] - self.gy0) // self.cell)
                for cx in range(cx0, cx1 + 1):
                    for cy in range(cy0, cy1 + 1):
                        cell_to_polys.setdefault((cx, cy), []).append(i)
            self.cell_to_polys = {
                k: np.asarray(v, dtype=np.int64) for k, v in cell_to_polys.items()
            }

    def _contains(self, poly_i: int, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        if self.is_rect[poly_i]:
            return (
                (px >= self.minx[poly_i])
                & (px <= self.maxx[poly_i])
                & (py >= self.miny[poly_i])
                & (py <= self.maxy[poly_i])
            )
        x1, y1, x2, y2 = self.edges[poly_i]
        return evenodd_contains(x1, y1, x2, y2, px, py)

    def _bbox_candidates(self, px: np.ndarray, py: np.ndarray):
        """(point_idx, region_idx) bbox-candidate pairs via the configured
        index structure (grid or STR tree) — identical contract: every
        pair whose point lies in the region's closed bbox, exactly once."""
        if self.index == "strtree":
            return self.tree.query_points(px, py)
        return self._grid_bbox_candidates(px, py)

    def _grid_bbox_candidates(self, px: np.ndarray, py: np.ndarray):
        """(point_idx, region_idx) bbox-candidate pairs via the cell grid:
        points are grouped by cell (one lexsort) and tested only against
        the polygons registered for that cell — O(N * polys_per_cell)
        instead of the dense O(N * P) mask."""
        cx = np.floor((px - self.gx0) / self.cell).astype(np.int64)
        cy = np.floor((py - self.gy0) / self.cell).astype(np.int64)
        order = np.lexsort((cy, cx))
        scx, scy = cx[order], cy[order]
        bnd = np.nonzero((np.diff(scx) != 0) | (np.diff(scy) != 0))[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [len(order)]))
        out_p, out_r = [], []
        for s, e in zip(starts, ends):
            polys = self.cell_to_polys.get((int(scx[s]), int(scy[s])))
            if polys is None:
                continue
            pts = order[s:e]
            m = (
                (px[pts][:, None] >= self.minx[polys][None, :])
                & (px[pts][:, None] <= self.maxx[polys][None, :])
                & (py[pts][:, None] >= self.miny[polys][None, :])
                & (py[pts][:, None] <= self.maxy[polys][None, :])
            )
            pi, ri = np.nonzero(m)
            if len(pi):
                out_p.append(pts[pi])
                out_r.append(polys[ri])
        if not out_p:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_p), np.concatenate(out_r)

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.lon_col].to_numpy(zero_copy_only=False)
        py = batch[self.lat_col].to_numpy(zero_copy_only=False)
        keep = self.keep_columns if self.keep_columns is not None else batch.column_names

        out_point_idx = []
        out_region = []
        if self.index != "dense":
            cand_p, cand_r = self._bbox_candidates(px, py)
            # rect candidates ARE matches (bbox hit = containment) — accept
            # wholesale, no per-region dispatch; only general polygons need
            # the exact even-odd pass, grouped by region
            rect = self.is_rect[cand_r]
            if rect.any():
                out_point_idx.append(cand_p[rect])
                out_region.append(cand_r[rect])
            cand_p, cand_r = cand_p[~rect], cand_r[~rect]
            order = np.argsort(cand_r, kind="stable")
            cand_p, cand_r = cand_p[order], cand_r[order]
            bnd = np.nonzero(np.diff(cand_r) != 0)[0] + 1
            starts = np.concatenate(([0], bnd)) if len(cand_r) else []
            ends = np.concatenate((bnd, [len(cand_r)])) if len(cand_r) else []
            for s, e in zip(starts, ends):
                poly_i = int(cand_r[s])
                idx = cand_p[s:e]
                inside = self._contains(poly_i, px[idx], py[idx])
                idx = idx[inside]
                if len(idx):
                    out_point_idx.append(np.sort(idx))
                    out_region.append(np.full(len(idx), poly_i, dtype=np.int64))
        else:
            # vectorized bbox candidate filter: dense (points x polygons)
            # bitmask — cheapest for a few hundred regions
            cand = (
                (px[:, None] >= self.minx[None, :])
                & (px[:, None] <= self.maxx[None, :])
                & (py[:, None] >= self.miny[None, :])
                & (py[:, None] <= self.maxy[None, :])
            )
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
        # canonical (point, region) order — identical across dense/grid/
        # strtree paths regardless of candidate emission order
        order = np.lexsort((region_idx, point_idx))
        point_idx = point_idx[order]
        region_idx = region_idx[order]

        take = pa.array(point_idx)
        cols = [batch[c].take(take) for c in keep]
        cols.append(pa.array(self.region_id[region_idx]))
        cols.append(pa.array(self.region_name[region_idx], pa.string()))
        return pa.table(cols, names=[*keep, "region_id", "region_name"])


# row-level any-region containment (used by the spatial anti join)
def contains_any(self: "PIPJoiner", px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Boolean mask: point is inside AT LEAST one region (same exact
    even-odd semantics and bbox/grid candidate pruning as __call__)."""
    inside = np.zeros(len(px), dtype=bool)
    if self.index != "dense":
        cand_p, cand_r = self._bbox_candidates(px, py)
        order = np.argsort(cand_r, kind="stable")
        cand_p, cand_r = cand_p[order], cand_r[order]
        bnd = np.nonzero(np.diff(cand_r) != 0)[0] + 1
        starts = np.concatenate(([0], bnd)) if len(cand_r) else []
        ends = np.concatenate((bnd, [len(cand_r)])) if len(cand_r) else []
        for s, e in zip(starts, ends):
            poly_i = int(cand_r[s])
            idx = cand_p[s:e]
            idx = idx[~inside[idx]]
            if not len(idx):
                continue
            if self.is_rect[poly_i]:
                inside[idx] = True
            else:
                hit = self._contains(poly_i, px[idx], py[idx])
                inside[idx[hit]] = True
    else:
        cand = (
            (px[:, None] >= self.minx[None, :])
            & (px[:, None] <= self.maxx[None, :])
            & (py[:, None] >= self.miny[None, :])
            & (py[:, None] <= self.maxy[None, :])
        )
        for poly_i in np.nonzero(cand.any(axis=0))[0]:
            idx = np.nonzero(cand[:, poly_i] & ~inside)[0]
            if not len(idx):
                continue
            if self.is_rect[poly_i]:
                inside[idx] = True
            else:
                hit = self._contains(poly_i, px[idx], py[idx])
                inside[idx[hit]] = True
    return inside



# ---------------------------------------------------------------------------
# Shuffle-path spatial join (cell cover): the scale path for a HUGE polygon
# dimension table. The broadcast PIPJoiner above assumes the polygon side
# fits in every actor; when it does not (10^6+ admin/tile-boundary polygons),
# the textbook distributed formulation is a hash join on a space-grid key:
#
#   polygons  -> explode to one row per coarse grid cell their bbox overlaps
#   points    -> one row, keyed by the single cell that contains them
#   Dataset.join(on=cover_cell)  -> candidate (point, polygon) pairs
#   exact even-odd confirm per joined batch
#
# Each point lives in exactly ONE cell and a polygon is registered at most
# once per cell, so every candidate pair appears exactly once — no dedup
# exchange is needed after the join. Both sides stream through a standard
# hash-partitioned join; nothing is broadcast and no actor holds the whole
# dimension table. Skewed cells (urban areas) are handled by the join's
# hash partitioning plus the confirm stage being stateless map_batches.
# ---------------------------------------------------------------------------

COVER_X0, COVER_Y0 = -180.0, -90.0


def cover_cell_key(px: np.ndarray, py: np.ndarray, cell: float) -> np.ndarray:
    """int64 grid key ``(cx << 32) | cy`` on a fixed lon/lat origin."""
    cx = np.floor((np.asarray(px, np.float64) - COVER_X0) / cell).astype(np.int64)
    cy = np.floor((np.asarray(py, np.float64) - COVER_Y0) / cell).astype(np.int64)
    return (cx << 32) | (cy & np.int64(0xFFFFFFFF))


def bbox_cover_cells(minx, miny, maxx, maxy, cell: float):
    """(cells, idx) for every coarse cover cell each bbox overlaps —
    the ONE place the cover-cell packing for bbox ranges lives (shared
    by the PIP cover join and the polygon x polygon join, whose
    reference-point dedup depends on it matching ``cover_cell_key``).
    Dimension-sized Python loop (runs once, on the driver or in a read
    task — never per point batch)."""
    out_cell, out_i = [], []
    for i in range(len(minx)):
        cx0 = int(np.floor((minx[i] - COVER_X0) / cell))
        cx1 = int(np.floor((maxx[i] - COVER_X0) / cell))
        cy0 = int(np.floor((miny[i] - COVER_Y0) / cell))
        cy1 = int(np.floor((maxy[i] - COVER_Y0) / cell))
        for cx in range(cx0, cx1 + 1):
            for cy in range(cy0, cy1 + 1):
                out_cell.append((cx << 32) | (cy & 0xFFFFFFFF))
                out_i.append(i)
    return (
        np.asarray(out_cell, dtype=np.int64),
        np.asarray(out_i, dtype=np.int64),
    )


def explode_region_cover(regions: pa.Table, cell: float) -> pa.Table:
    """One row per (cover_cell, region) for every coarse cell the region's
    bbox overlaps."""
    rid = regions["region_id"].to_numpy()
    minx = regions["minx"].to_numpy()
    miny = regions["miny"].to_numpy()
    maxx = regions["maxx"].to_numpy()
    maxy = regions["maxy"].to_numpy()
    kinds = regions["kind"].to_pylist()
    wkbs = regions["geom_wkb"].to_pylist()
    out_cell, idx = bbox_cover_cells(minx, miny, maxx, maxy, cell)
    out_i = idx.tolist()
    return pa.table(
        {
            "cover_cell": pa.array(np.asarray(out_cell, dtype=np.int64)),
            "region_id": pa.array(rid[idx]),
            "kind": pa.array([kinds[i] for i in out_i], pa.string()),
            "r_minx": pa.array(minx[idx]),
            "r_miny": pa.array(miny[idx]),
            "r_maxx": pa.array(maxx[idx]),
            "r_maxy": pa.array(maxy[idx]),
            "geom_wkb": pa.array([wkbs[i] for i in out_i], pa.binary()),
        }
    )


class PIPConfirm:
    """Exact containment confirm on the candidate pairs out of the cover
    join. Stateless per pair; the per-region edge arrays are decoded from
    WKB once per actor (keyed by region_id) and reused across batches."""

    def __init__(
        self,
        lon_col: str = "lon",
        lat_col: str = "lat",
        keep_columns: list[str] | None = None,
    ):
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.keep_columns = keep_columns if keep_columns is not None else []
        self._edges: dict[int, tuple] = {}

    def _edges_for(self, region_id: int, wkb: bytes):
        e = self._edges.get(region_id)
        if e is None:
            _, rings = wkb_decode(wkb)
            ring = rings[0]
            pts = np.asarray(ring + [ring[0]], dtype=np.float64)
            e = (pts[:-1, 0], pts[:-1, 1], pts[1:, 0], pts[1:, 1])
            self._edges[region_id] = e
        return e

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_names = [*self.keep_columns, "region_id"]
        if batch.num_rows == 0:
            cols = [batch[c].slice(0, 0) for c in self.keep_columns]
            return pa.table([*cols, pa.array([], pa.int64())], names=out_names)
        px = batch[self.lon_col].to_numpy(zero_copy_only=False)
        py = batch[self.lat_col].to_numpy(zero_copy_only=False)
        rid = batch["region_id"].to_numpy(zero_copy_only=False)
        is_rect = pa.compute.equal(batch["kind"], "rect").to_numpy(
            zero_copy_only=False
        )
        inside = np.zeros(len(px), dtype=bool)
        # rect fast path: inclusive bbox (the SQL oracle's semantics)
        r = np.nonzero(is_rect)[0]
        if len(r):
            inside[r] = (
                (px[r] >= batch["r_minx"].to_numpy(zero_copy_only=False)[r])
                & (px[r] <= batch["r_maxx"].to_numpy(zero_copy_only=False)[r])
                & (py[r] >= batch["r_miny"].to_numpy(zero_copy_only=False)[r])
                & (py[r] <= batch["r_maxy"].to_numpy(zero_copy_only=False)[r])
            )
        # general polygons: group pair-rows by region, one even-odd call each
        p = np.nonzero(~is_rect)[0]
        if len(p):
            wkb_col = batch["geom_wkb"]
            order = p[np.argsort(rid[p], kind="stable")]
            bnd = np.nonzero(np.diff(rid[order]) != 0)[0] + 1
            starts = np.concatenate(([0], bnd))
            ends = np.concatenate((bnd, [len(order)]))
            for s, e in zip(starts, ends):
                idx = order[s:e]
                x1, y1, x2, y2 = self._edges_for(
                    int(rid[idx[0]]), wkb_col[int(idx[0])].as_py()
                )
                inside[idx] = evenodd_contains(x1, y1, x2, y2, px[idx], py[idx])
        take = pa.array(np.nonzero(inside)[0])
        cols = [batch[c].take(take) for c in self.keep_columns]
        cols.append(batch["region_id"].take(take))
        return pa.table(cols, names=out_names)
