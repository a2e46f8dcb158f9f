"""Spatial bounded kNN over geotags via cell-ring expansion.

k nearest images within radius R of each query point (planar lon/lat
distance). The scale shape: queries are a small broadcast side; the image
stream is filtered by a grid-cell cover BEFORE any distance math:

- queries are bucketed on a lon/lat grid with cell size >= R, so the
  3x3 cell ring around a query's cell is a guaranteed cover of its
  radius-R disc (no false negatives — results exactly match the oracle's
  cross-join + radius filter);
- each actor holds {cell -> [query idx]} built once in ``__init__``;
  per batch it cell-encodes the points (vectorized), probes only the
  queries registered for those cells, and emits (query_id, image_id, d2)
  candidates;
- a tiny groupby(query_id) finishes with an exact top-k
  (d2 asc, image_id asc tie-break).

Ring EXPANSION (grow the ring until k found, unbounded radius) reuses the
same machinery with increasing R; the bounded form is the deterministic,
oracle-checkable core.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class CellRingKNN:
    def __init__(
        self,
        query_ids,
        query_lon,
        query_lat,
        radius: float = 1.0,
        id_col: str = "image_id",
    ):
        self.qid = np.asarray(query_ids)
        self.qlon = np.asarray(query_lon, dtype=np.float64)
        self.qlat = np.asarray(query_lat, dtype=np.float64)
        self.r2 = radius * radius
        self.cell = radius  # grid cell size >= radius -> 3x3 ring covers
        self.id_col = id_col
        self.cell_to_queries: dict[tuple[int, int], list[int]] = {}
        gx = np.floor((self.qlon + 180.0) / self.cell).astype(np.int64)
        gy = np.floor((self.qlat + 90.0) / self.cell).astype(np.int64)
        for i in range(len(self.qid)):
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    self.cell_to_queries.setdefault(
                        (int(gx[i]) + dx, int(gy[i]) + dy), []
                    ).append(i)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array(self.qid).slice(0, 0),
                    self.id_col: batch[self.id_col],
                    "d2": pa.array([], pa.float64()),
                }
            )
        gx = np.floor((lon + 180.0) / self.cell).astype(np.int64)
        gy = np.floor((lat + 90.0) / self.cell).astype(np.int64)

        out_q, out_i, out_d = [], [], []
        # group points by their cell, probe the registered queries per cell
        order = np.lexsort((gy, gx))
        sgx, sgy = gx[order], gy[order]
        boundaries = np.nonzero((np.diff(sgx) != 0) | (np.diff(sgy) != 0))[0] + 1
        starts = np.concatenate(([0], boundaries))
        ends = np.concatenate((boundaries, [len(order)]))
        for s, e in zip(starts, ends):
            key = (int(sgx[s]), int(sgy[s]))
            qidx = self.cell_to_queries.get(key)
            if not qidx:
                continue
            pts = order[s:e]
            dlon = lon[pts][:, None] - self.qlon[qidx][None, :]
            dlat = lat[pts][:, None] - self.qlat[qidx][None, :]
            d2 = dlon * dlon + dlat * dlat
            hit_p, hit_q = np.nonzero(d2 <= self.r2)
            if len(hit_p):
                out_q.append(self.qid[np.asarray(qidx)[hit_q]])
                out_i.append(ids[pts[hit_p]])
                out_d.append(d2[hit_p, hit_q])

        if not out_q:
            # type the empty result from the actual id columns so empty and
            # non-empty blocks unify under any id type
            return pa.table(
                {
                    "query_id": pa.array(self.qid).slice(0, 0),
                    self.id_col: batch[self.id_col].slice(0, 0),
                    "d2": pa.array([], pa.float64()),
                }
            )
        # cast both id outputs to the exact source Arrow types so empty and
        # non-empty blocks unify (numpy round-trips would e.g. turn
        # large_string into string)
        qid_type = pa.array(self.qid).slice(0, 0).type
        id_type = batch.schema.field(self.id_col).type
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)).cast(qid_type),
                self.id_col: pa.array(np.concatenate(out_i)).cast(id_type),
                "d2": pa.array(np.concatenate(out_d)),
            }
        )


class KNNAllCellExplode:
    """Full SELF-JOIN kNN, stage 1: replicate each point into the 3x3 ring
    of grid cells around its own cell (cell size >= radius, so a point's
    own-cell group sees EVERY candidate within radius — no false
    negatives). The own-cell copy carries ``home=True``; the 8 ring copies
    are candidate-only. Only (id, lon, lat) rows are replicated — 9x a
    12-byte-ish row, never payloads — and ONE groupby(cell) shuffle
    finishes the whole kNN: each group's top-k is already final because
    the group holds the home point's complete radius cover.

    Skew note (dense urban cells): per-group work is O(homes x cands);
    ``knn_all_group`` chunks the home side so memory stays bounded, and a
    hot cell parallelizes no further — salt via stages/agg.salted_group_map
    (decompose: per-salt top-k then merge top-k) if one city dominates.
    """

    def __init__(self, radius: float = 0.5, id_col: str = "image_id"):
        self.cell = radius
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        gx = np.floor((lon + 180.0) / self.cell).astype(np.int64)
        gy = np.floor((lat + 90.0) / self.cell).astype(np.int64)
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        cell_x = np.concatenate([gx + dx for dx, dy in offs])
        cell_y = np.concatenate([gy + dy for dx, dy in offs])
        home = np.concatenate(
            [np.full(n, dx == 0 and dy == 0) for dx, dy in offs]
        )
        take = pa.array(np.tile(np.arange(n, dtype=np.int64), len(offs)))
        return pa.table(
            {
                "cell_x": pa.array(cell_x),
                "cell_y": pa.array(cell_y),
                "home": pa.array(home),
                self.id_col: batch[self.id_col].take(take),
                "lon": pa.array(np.tile(lon, len(offs))),
                "lat": pa.array(np.tile(lat, len(offs))),
            }
        )


def _knn_cell(hid, hlon, hlat, cid, clon, clat, k, r2, out, home_chunk=512):
    """One cell's exact kNN (numpy core): home points vs all candidates.
    Chunked (homes x candidates) distance matrix; candidates MUST be
    pre-sorted by id so the STABLE distance argsort reproduces the
    oracle's (d2 asc, id asc) tie-break exactly. Appends result arrays to
    ``out`` = (queries, neighbors, ranks)."""
    for s in range(0, len(hid), home_chunk):
        e = min(s + home_chunk, len(hid))
        dlon = hlon[s:e, None] - clon[None, :]
        dlat = hlat[s:e, None] - clat[None, :]
        d2 = dlon * dlon + dlat * dlat
        invalid = (d2 > r2) | (hid[s:e, None] == cid[None, :])
        d2[invalid] = np.inf
        kk = min(k, d2.shape[1])
        order = np.argsort(d2, axis=1, kind="stable")[:, :kk]
        picked_d = np.take_along_axis(d2, order, axis=1)
        h_idx, rank_idx = np.nonzero(np.isfinite(picked_d))
        if len(h_idx):
            out[0].append(hid[s:e][h_idx])
            out[1].append(cid[order[h_idx, rank_idx]])
            out[2].append(rank_idx.astype(np.int64) + 1)


def knn_all_bucket(
    group: pd.DataFrame, k: int = 5, radius: float = 0.5, id_col: str = "image_id"
) -> pd.DataFrame:
    """One hash-bucket of cells (map_groups stage): rows are lexsorted by
    (cell_x, cell_y) once, then each cell runs the vectorized numpy kNN
    kernel — the per-cell Python loop does only slicing, all math is
    vectorized, and Ray sees just ~dozens of groups instead of one per
    cell (per-group overhead dominated the naive groupby(cell))."""
    r2 = radius * radius
    cx = group["cell_x"].to_numpy()
    cy = group["cell_y"].to_numpy()
    ids = group[id_col].to_numpy()
    lon = group["lon"].to_numpy()
    lat = group["lat"].to_numpy()
    home = group["home"].to_numpy()
    # candidate id-order WITHIN cell: sort by (cell, id) in one lexsort
    order = np.lexsort((ids, cy, cx))
    cx, cy, ids, lon, lat, home = (
        a[order] for a in (cx, cy, ids, lon, lat, home)
    )
    bnd = np.nonzero((np.diff(cx) != 0) | (np.diff(cy) != 0))[0] + 1
    starts = np.concatenate(([0], bnd))
    ends = np.concatenate((bnd, [len(cx)]))
    out: tuple[list, list, list] = ([], [], [])
    for s, e in zip(starts, ends):
        h = home[s:e]
        if not h.any():
            continue
        _knn_cell(
            ids[s:e][h], lon[s:e][h], lat[s:e][h],
            ids[s:e], lon[s:e], lat[s:e], k, r2, out,
        )
    if not out[0]:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=group[id_col].dtype),
                id_col: pd.Series([], dtype=group[id_col].dtype),
                "rank": pd.Series([], dtype="int64"),
            }
        )
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out[0]),
            id_col: np.concatenate(out[1]),
            "rank": np.concatenate(out[2]),
        }
    )


def knn_all(
    ds,
    radius: float = 0.5,
    k: int = 5,
    id_col: str = "image_id",
    n_buckets: int = 32,
):
    """k nearest neighbors within `radius` for EVERY row (full self-join
    kNN): 9x cell-ring explode -> ONE groupby(cell-hash bucket) shuffle ->
    per-cell exact top-k inside each bucket (already final; see
    KNNAllCellExplode). Cells are co-located by a hash bucket key — a
    single int key with bounded cardinality keeps the sort shuffle cheap
    (widen n_buckets at cluster scale, as with dedup_exact)."""
    exploded = ds.map_batches(
        KNNAllCellExplode,
        fn_constructor_kwargs={"radius": radius, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=16384,
        concurrency=(1, 8),
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        cx = b["cell_x"].to_numpy()
        cy = b["cell_y"].to_numpy()
        h = (cx * np.int64(-7046029254386353131) + cy) % np.int64(n_buckets)
        return b.append_column("__bucket", pa.array(np.abs(h).astype(np.int8)))

    exploded = exploded.map_batches(add_bucket, batch_format="pyarrow")
    return exploded.groupby("__bucket").map_groups(
        lambda g: knn_all_bucket(g, k=k, radius=radius, id_col=id_col),
        batch_format="pandas",
    )


def finalize_knn(ds, k: int = 5, id_col: str = "image_id"):
    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["d2", id_col], ascending=[True, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", id_col, "rank"]]

    return ds.groupby("query_id").map_groups(topk, batch_format="pandas")
