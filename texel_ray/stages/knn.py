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

Ring EXPANSION (``knn_nearest``: unbounded k nearest) reuses the bounded
machinery with doubling R, rescanning only unresolved queries; ``knn_all``
is the full self-join form (every row a query) with a dense-cluster
sub-grid kernel. All three are oracle-checked.
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
        local_topk: int | None = None,
    ):
        self.qid = np.asarray(query_ids)
        self.qlon = np.asarray(query_lon, dtype=np.float64)
        self.qlat = np.asarray(query_lat, dtype=np.float64)
        self.r2 = radius * radius
        self.cell = radius  # grid cell size >= radius -> 3x3 ring covers
        self.id_col = id_col
        # ties-inclusive per-batch top-k reduction (see BruteKNN): bounds
        # each batch's output at Q x (k + ties) rows however dense the
        # radius, so the caller can finish on collected candidates
        # without a shuffle
        self.local_topk = local_topk
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
                out_q.append(np.asarray(qidx)[hit_q])  # query INDEX
                out_i.append(pts[hit_p])  # point row index
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
        qi = np.concatenate(out_q)
        pi = np.concatenate(out_i)
        dd = np.concatenate(out_d)
        if self.local_topk is not None and len(qi):
            # self-exclusion must happen BEFORE the top-k reduction or a
            # query's own row (d2 = 0) eats a slot; the plain (no
            # local_topk) path keeps self and lets the caller filter, as
            # knn_radius's oracle-checked finish does
            notself = ids[pi] != self.qid[qi]
            qi, pi, dd = qi[notself], pi[notself], dd[notself]
            if len(qi):
                qi, pi, dd = _ties_inclusive_topk(qi, pi, dd, self.local_topk)
        # cast both id outputs to the exact source Arrow types so empty and
        # non-empty blocks unify (numpy round-trips would e.g. turn
        # large_string into string)
        qid_type = pa.array(self.qid).slice(0, 0).type
        id_type = batch.schema.field(self.id_col).type
        return pa.table(
            {
                "query_id": pa.array(self.qid[qi]).cast(qid_type),
                self.id_col: pa.array(ids[pi]).cast(id_type),
                "d2": pa.array(dd),
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


def _matrix_knn(lon, lat, ids, s, e, hrows, k, r2, out_q, out_i, out_r):
    """Chunked (homes x all-cell-candidates) exact kNN: np.partition for
    the exact k-th distance, ties-inclusive survivor mask, tiny lexsort."""
    clon, clat = lon[s:e], lat[s:e]
    c = e - s
    kk = min(k, c - 1)
    if kk <= 0:
        return
    for hs in range(0, len(hrows), 256):
        hr = hrows[hs : hs + 256]
        D = (lon[hr, None] - clon[None, :]) ** 2 + (lat[hr, None] - clat[None, :]) ** 2
        D[D > r2] = np.inf
        D[np.arange(len(hr)), hr - s] = np.inf  # self
        kth = np.partition(D, kk - 1, axis=1)[:, kk - 1]
        # isfinite guard: with < k in-radius neighbours the k-th
        # "distance" is inf and D <= inf would readmit everything
        hi, ci = np.nonzero((D <= kth[:, None]) & np.isfinite(D))
        pd2 = D[hi, ci]
        o = np.lexsort((pd2, hi))  # stable: ties keep id (pos) order
        hi, ci = hi[o], ci[o]
        seg = np.nonzero(np.diff(hi) != 0)[0] + 1
        seg_start = np.concatenate(([0], seg))
        rank = np.arange(len(hi)) - np.repeat(
            seg_start, np.diff(np.concatenate((seg_start, [len(hi)])))
        ) + 1
        top = rank <= k
        out_q.append(ids[hr[hi[top]]])
        out_i.append(ids[s + ci[top]])
        out_r.append(rank[top].astype(np.int64))


def _dense_cell_knn(
    lon, lat, ids, s, e, hrows, k, r2, out_q, out_i, out_r, sub_target: int = 32
):
    """Exact kNN inside ONE dense cell via a sub-grid ring pass.

    Members are bucketed on a g x g sub-grid (~sub_target per sub-cell);
    each home gathers candidates from its 3x3 sub-cell ring (the same
    repeat/arange pair tricks as the sparse path, 9 vectorized offset
    passes). Geometry guarantee: any point OUTSIDE a home's ring is
    STRICTLY farther than the sub-cell size t, so a home whose k-th ring
    distance^2 <= t^2 (shrunk by 1e-9 for assignment rounding) is exact
    and final. The few unfinished homes (sparse cluster edges, < k ring
    neighbours) fall back to the full-cell matrix kernel. Turns the 900M
    pair volume of a 30k-point cluster into ~homes x 9 x sub_target.
    """
    m = e - s
    clon, clat = lon[s:e], lat[s:e]
    hloc = hrows - s
    x0, y0 = clon.min(), clat.min()
    span = max(clon.max() - x0, clat.max() - y0)
    g = max(2, int(np.ceil(np.sqrt(m / sub_target))))
    if span <= 0.0:  # fully degenerate cluster (all identical points)
        _matrix_knn(lon, lat, ids, s, e, hrows, k, r2, out_q, out_i, out_r)
        return
    t = span / g
    sx = np.minimum((np.maximum(clon - x0, 0.0) / t).astype(np.int64), g - 1)
    sy = np.minimum((np.maximum(clat - y0, 0.0) / t).astype(np.int64), g - 1)
    skey = sx * g + sy
    order = np.argsort(skey, kind="stable")  # stable keeps id order in runs
    sk_sorted = skey[order]
    bnd = np.nonzero(np.diff(sk_sorted))[0] + 1
    run_starts = np.concatenate(([0], bnd))
    run_ends = np.concatenate((bnd, [m]))
    run_keys = sk_sorted[run_starts]

    # iterate occupied sub-cells that contain homes: every home of one
    # sub-cell shares the SAME 3x3 ring candidate set, so each sub-cell
    # is one small (homes x ring) matrix kernel — no giant pair lexsort
    t2_safe = (t * t) * (1.0 - 1e-9)
    kk = min(k, m - 1)
    hkey = skey[hloc]
    horder = np.argsort(hkey, kind="stable")
    hl_sorted = hloc[horder]
    hk_sorted = hkey[horder]
    hbnd = np.nonzero(np.diff(hk_sorted))[0] + 1
    hseg_starts = np.concatenate(([0], hbnd))
    hseg_ends = np.concatenate((hbnd, [len(hl_sorted)]))
    finished_mask = np.zeros(m, dtype=bool)  # indexed by local home pos
    nrk = len(run_keys)
    for hs, he in zip(hseg_starts, hseg_ends):
        key = int(hk_sorted[hs])
        kx, ky = key // g, key % g
        cand_parts = []
        for dx in (-1, 0, 1):
            nx = kx + dx
            if nx < 0 or nx >= g:
                continue
            for dy in (-1, 0, 1):
                ny = ky + dy
                if ny < 0 or ny >= g:
                    continue
                nkey = nx * g + ny
                ri = np.searchsorted(run_keys, nkey)
                if ri < nrk and run_keys[ri] == nkey:
                    cand_parts.append(order[run_starts[ri] : run_ends[ri]])
        cand = np.sort(np.concatenate(cand_parts))  # id (position) order
        homes = hl_sorted[hs:he]
        if len(cand) - 1 < kk:
            continue  # not enough ring candidates: all unfinished
        D = (clon[homes, None] - clon[cand][None, :]) ** 2 + (
            clat[homes, None] - clat[cand][None, :]
        ) ** 2
        D[D > r2] = np.inf
        D[cand[None, :] == homes[:, None]] = np.inf  # self
        kth = np.partition(D, kk - 1, axis=1)[:, kk - 1]
        fin = kth <= t2_safe  # exact by the strict outside-ring bound
        if not fin.any():
            continue
        finished_mask[homes[fin]] = True
        Df = D[fin]
        hi, ci = np.nonzero((Df <= kth[fin, None]) & np.isfinite(Df))
        pd2 = Df[hi, ci]
        o = np.lexsort((pd2, hi))  # stable: ties keep id (pos) order
        hi, ci = hi[o], ci[o]
        seg = np.nonzero(np.diff(hi) != 0)[0] + 1
        seg_start = np.concatenate(([0], seg))
        rank = np.arange(len(hi)) - np.repeat(
            seg_start, np.diff(np.concatenate((seg_start, [len(hi)])))
        ) + 1
        top = rank <= k
        out_q.append(ids[s + homes[fin][hi[top]]])
        out_i.append(ids[s + cand[ci[top]]])
        out_r.append(rank[top].astype(np.int64))
    unfinished = hrows[~finished_mask[hloc]]
    if len(unfinished):
        _matrix_knn(lon, lat, ids, s, e, unfinished, k, r2, out_q, out_i, out_r)


def knn_all_bucket(
    group: pd.DataFrame,
    k: int = 5,
    radius: float = 0.5,
    id_col: str = "image_id",
    pair_chunk: int = 4_000_000,
) -> pd.DataFrame:
    """One hash-bucket of cells (map_groups stage), FULLY vectorized across
    cells: rows are lexsorted by (cell, id) once, every home point's
    candidate set is its own cell's contiguous slice, and (home,
    candidate) pair indices are built with repeat/arange segment tricks —
    no per-cell Python loop (a world-sized grid has ~10^6 occupied cells;
    looping them dominated wall time). Distances, the radius filter and
    the per-home (d2 asc, id asc) top-k all run as single numpy passes,
    chunked so the pair arrays stay under ``pair_chunk`` rows."""
    r2 = radius * radius
    cx = group["cell_x"].to_numpy()
    cy = group["cell_y"].to_numpy()
    ids = group[id_col].to_numpy()
    lon = group["lon"].to_numpy()
    lat = group["lat"].to_numpy()
    home = group["home"].to_numpy()

    def _empty():
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=group[id_col].dtype),
                id_col: pd.Series([], dtype=group[id_col].dtype),
                "rank": pd.Series([], dtype="int64"),
            }
        )

    if len(cx) == 0 or not home.any():
        return _empty()
    # sort rows by (cell, id): candidates of one cell form one contiguous
    # run, already in the id order the tie-break needs
    order = np.lexsort((ids, cy, cx))
    cx, cy, ids, lon, lat, home = (a[order] for a in (cx, cy, ids, lon, lat, home))
    run = np.nonzero((np.diff(cx) != 0) | (np.diff(cy) != 0))[0] + 1
    starts = np.concatenate(([0], run))
    ends = np.concatenate((run, [len(cx)]))
    # map every row to its cell run index (scatter + cumsum)
    row_run = np.zeros(len(cx), dtype=np.int64)
    row_run[run] = 1
    row_run = np.cumsum(row_run)

    h_idx = np.nonzero(home)[0]  # row index of each home point
    h_run = row_run[h_idx]
    h_cnt = (ends - starts)[h_run]  # candidates per home = its cell size
    out_q, out_i, out_r = [], [], []

    # DENSE cells (urban clusters): the radius filter prunes almost
    # nothing there — a 30k-member cell is 900M pairs, a quadratic wall no
    # grid size fixes (the cluster is smaller than any radius-covering
    # cell). _dense_cell_knn runs a SUB-GRID ring pass with an exactness
    # guarantee and falls back to the chunked matrix kernel only for the
    # homes the guarantee can't finish.
    dense = 64
    dense_runs = np.nonzero((ends - starts) >= dense)[0]
    for r in dense_runs:
        s, e = starts[r], ends[r]
        hm = h_idx[(h_run == r)]
        if not len(hm):
            continue
        _dense_cell_knn(lon, lat, ids, int(s), int(e), hm, k, r2, out_q, out_i, out_r)
    # drop dense-cell homes from the pair path
    sparse_mask = (ends - starts)[h_run] < dense
    h_idx = h_idx[sparse_mask]
    h_run = h_run[sparse_mask]
    h_cnt = h_cnt[sparse_mask]
    if not len(h_idx):
        if not out_q:
            return _empty()
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                id_col: np.concatenate(out_i),
                "rank": np.concatenate(out_r),
            }
        )
    # chunk home points so sum(candidates) per chunk <= pair_chunk
    csum = np.cumsum(h_cnt)
    chunk_of_home = (csum - 1) // pair_chunk
    for c in range(int(chunk_of_home[-1]) + 1 if len(h_cnt) else 0):
        sel = np.nonzero(chunk_of_home == c)[0]
        if not len(sel):
            continue
        lens = h_cnt[sel]
        total = int(lens.sum())
        # pair arrays: home replicated by its candidate count; candidate
        # row index = cell start + position within the segment
        seg_ends = np.cumsum(lens)
        seg_starts = seg_ends - lens
        pos = np.arange(total) - np.repeat(seg_starts, lens)
        pair_home = np.repeat(h_idx[sel], lens)
        pair_cand = np.repeat(starts[h_run[sel]], lens) + pos
        dlon = lon[pair_home] - lon[pair_cand]
        dlat = lat[pair_home] - lat[pair_cand]
        d2 = dlon * dlon + dlat * dlat
        # self-pair == same physical row (each point has exactly ONE
        # replica in its own cell); integer compare, never string ids
        keep = (d2 <= r2) & (pair_home != pair_cand)
        if not keep.any():
            continue
        ph, pc, pd2 = pair_home[keep], pair_cand[keep], d2[keep]
        # per-home (d2 asc, id asc) order: candidates are already id-sorted
        # within a cell and lexsort is stable, so ties keep the id order
        o = np.lexsort((pd2, ph))
        ph, pc = ph[o], pc[o]
        seg = np.nonzero(np.diff(ph) != 0)[0] + 1
        seg_start = np.concatenate(([0], seg))
        rank = np.arange(len(ph)) - np.repeat(
            seg_start, np.diff(np.concatenate((seg_start, [len(ph)])))
        ) + 1
        top = rank <= k
        out_q.append(ids[ph[top]])
        out_i.append(ids[pc[top]])
        out_r.append(rank[top].astype(np.int64))
    if not out_q:
        return _empty()
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q),
            id_col: np.concatenate(out_i),
            "rank": np.concatenate(out_r),
        }
    )


def knn_all(
    ds,
    radius: float = 0.5,
    k: int = 5,
    id_col: str = "image_id",
    n_buckets: int = 128,
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
        return b.append_column("__bucket", pa.array(np.abs(h).astype(np.int16)))

    exploded = exploded.map_batches(add_bucket, batch_format="pyarrow")
    # sort-shuffle output block count == input block count, and map_groups
    # parallelism == output block count: spread the skinny replica rows
    # over enough blocks that the per-bucket kNN kernels actually run in
    # parallel (a handful of fat blocks serializes the reduce stage)
    exploded = exploded.repartition(64)
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


def _ties_inclusive_topk(qi, pi, dd, k):
    """Per-query ties-inclusive top-k over flat (query-index, point-index,
    d2) candidate arrays: keep every row with d2 <= the query's k-th
    smallest d2. The survivor set contains the true global (d2 asc, id
    asc) top-k members whatever the local row order, so a later exact
    sort finishes correctly."""
    o = np.lexsort((dd, qi))
    qi, pi, dd = qi[o], pi[o], dd[o]
    seg = np.nonzero(np.diff(qi) != 0)[0] + 1
    starts = np.concatenate(([0], seg))
    ends = np.concatenate((seg, [len(qi)]))
    kth_pos = np.minimum(starts + k - 1, ends - 1)
    kth_of_row = np.repeat(dd[kth_pos], ends - starts)
    keep = dd <= kth_of_row
    return qi[keep], pi[keep], dd[keep]


class BruteKNN:
    """Single-pass exact kNN combiner for a SMALL broadcast query set:
    each batch computes the (rows x Q) squared-distance matrix and emits,
    per query, the TIES-INCLUSIVE local top-k (every row with d2 <= the
    exact k-th smallest, found with np.partition). That survivor set
    provably contains the query's true global top-k members from this
    batch whatever the row order, so a final (d2 asc, id asc) sort over
    the collected candidates (<= blocks x Q x k + ties rows,
    query-dimension-sized) finishes exactly — one streaming pass, no
    shuffle, no rounds. Use when Q x batch_size x 8B fits a worker;
    cell-ring expansion (CellRingKNN rounds) is the big-Q path."""

    def __init__(self, query_ids, query_lon, query_lat, k=5, id_col="image_id"):
        self.qid = np.asarray(query_ids)
        self.qlon = np.asarray(query_lon, dtype=np.float64)
        self.qlat = np.asarray(query_lat, dtype=np.float64)
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        qid_type = pa.array(self.qid).slice(0, 0).type
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([]).cast(qid_type),
                    self.id_col: batch[self.id_col],
                    "d2": pa.array([], pa.float64()),
                }
            )
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        # difference form (NOT the expanded |p|^2+|q|^2-2pq GEMM): d2 must
        # be bit-identical to the oracle's (a-b)*(a-b) sum for exact
        # tie-breaks; in-place ops avoid ~256MB/batch of temporaries
        D = lon[:, None] - self.qlon[None, :]
        np.multiply(D, D, out=D)
        T = lat[:, None] - self.qlat[None, :]
        np.multiply(T, T, out=T)
        D += T
        D[ids[:, None] == self.qid[None, :]] = np.inf  # self-exclusion
        kk = min(self.k, D.shape[0])
        kth = np.partition(D, kk - 1, axis=0)[kk - 1, :]
        # isfinite guard: a batch smaller than k (after self-exclusion)
        # has an inf k-th "distance" and would readmit everything
        keep_r, keep_q = np.nonzero((D <= kth[None, :]) & np.isfinite(D))
        id_type = batch.schema.field(self.id_col).type
        return pa.table(
            {
                "query_id": pa.array(self.qid[keep_q]).cast(qid_type),
                self.id_col: pa.array(ids[keep_r]).cast(id_type),
                "d2": pa.array(D[keep_r, keep_q]),
            }
        )


def _knn_nearest_brute(ds_factory, qids, qlon, qlat, k, id_col):
    import pandas as pd

    n_q = max(len(qids), 1)
    # size the batch so the (batch x Q) float64 matrix stays ~64 MB
    bs = int(np.clip(8_000_000 // n_q, 1024, 16384))
    # driver-built instance shipped to TASKS (not an actor pool): the
    # per-task state is just the broadcast query arrays, and a task pool
    # skips the ~1.5s/round actor spin-up
    probe = BruteKNN(qids, qlon, qlat, k=k, id_col=id_col)
    cand = ds_factory().map_batches(
        lambda b, probe=probe: probe(b),
        batch_format="pyarrow",
        batch_size=bs,
    )
    got = cand.to_pandas()  # query-dimension-sized (see BruteKNN)
    got = got.sort_values(["query_id", "d2", id_col], kind="stable")
    got["rank"] = got.groupby("query_id").cumcount() + 1
    out = got[got["rank"] <= k]
    return out[["query_id", id_col, "rank"]].reset_index(drop=True)


def knn_nearest(
    ds_factory,
    query_ids,
    query_lon,
    query_lat,
    k: int = 5,
    r0: float = 0.1,
    max_rounds: int = 8,
    id_col: str = "image_id",
    small_q: int = 128,
):
    """UNBOUNDED k nearest neighbors via cell-RING EXPANSION: run the
    bounded cell-ring cover at radius r, keep the queries that found k
    neighbors with kth distance <= r (exact: every unexamined point is
    farther than r), DOUBLE r for the rest and rescan. Each round streams
    the dataset once with only the unresolved queries broadcast; dense
    areas resolve in round one, remote queries pay only their own extra
    rounds.

    ``ds_factory()`` must return a fresh Dataset of (id, lon, lat) rows
    (a Dataset can't be consumed twice).

    Two-phase plan: each bounded round uses ties-inclusive per-batch
    top-k (``local_topk``) and finishes on the driver over the collected
    query-dimension-sized candidates — NO per-round shuffle. As soon as
    the unresolved set shrinks to <= ``small_q`` queries (including
    before round one for tiny query sets) a single unbounded BruteKNN
    pass finishes them exactly, so every query resolves even past
    ``max_rounds``. Ring rounds earn their keep only while the active
    set is large enough that a (batch x active) brute matrix would cost
    more than a pruned cell scan (~20ms/query vs ~1s/scan measured).
    """
    import pandas as pd

    qids = np.asarray(query_ids)
    qlon = np.asarray(query_lon, dtype=np.float64)
    qlat = np.asarray(query_lat, dtype=np.float64)
    resolved = []
    active = np.arange(len(qids))
    r = r0
    for _ in range(max_rounds):
        if len(active) == 0 or len(active) <= small_q:
            break
        # driver-built probe shipped to TASKS: the cell index for a few
        # hundred queries costs microseconds to build, so an actor pool's
        # per-round spin-up (~1.5s, the dominant round cost) buys nothing
        probe = CellRingKNN(
            qids[active],
            qlon[active],
            qlat[active],
            radius=r,
            id_col=id_col,
            local_topk=k,
        )
        cand = ds_factory().map_batches(
            lambda b, probe=probe: probe(b),
            batch_format="pyarrow",
            batch_size=16384,
        )
        # driver finish: candidates are <= blocks x active x (k + ties)
        got = cand.to_pandas()
        got = got.sort_values(["query_id", "d2", id_col], kind="stable")
        got["rank"] = got.groupby("query_id").cumcount() + 1
        got = got[got["rank"] <= k]
        # a query is DONE iff it has k hits and the kth is within r
        counts = got.groupby("query_id")["rank"].max()
        kth = got.groupby("query_id")["d2"].max()
        done_ids = set(counts[(counts >= k) & (kth <= r * r)].index)
        resolved.append(got[got["query_id"].isin(done_ids)])
        qid_active = qids[active]
        still = np.array([q not in done_ids for q in qid_active])
        active = active[still]
        # x4 schedule: each scan's cost is round overhead, not kernel
        # work, so fewer/larger jumps beat gentle doubling (a too-large r
        # only costs extra in-kernel pairs, never correctness)
        r *= 4.0
    if len(active):
        resolved.append(
            _knn_nearest_brute(
                ds_factory, qids[active], qlon[active], qlat[active], k, id_col
            )
        )
    out = (
        pd.concat(resolved, ignore_index=True)
        if resolved
        else pd.DataFrame({"query_id": [], id_col: [], "rank": []})
    )
    return out[["query_id", id_col, "rank"]].reset_index(drop=True)
