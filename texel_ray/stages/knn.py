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
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_i)),
                "d2": pa.array(np.concatenate(out_d)),
            }
        )


def finalize_knn(ds, k: int = 5, id_col: str = "image_id"):
    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["d2", id_col], ascending=[True, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", id_col, "rank"]]

    return ds.groupby("query_id").map_groups(topk, batch_format="pandas")
