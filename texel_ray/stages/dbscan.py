"""Distributed exact DBSCAN over geotags — grid-partitioned in the
MR-DBSCAN style (Dai & Lin's cell decomposition): rows never leave the
dataset, the driver touches only the bounded cell-label graph.

Exact DBSCAN semantics (deterministic variant):
- core point: >= ``min_pts`` points (self included) within ``eps``
  (Euclidean on lon/lat, d2 <= eps^2);
- clusters: connected components of the core-point graph (edges between
  cores within eps); border point (non-core with a core neighbor):
  joins its NEAREST core neighbor's cluster, ties broken by smallest
  core id — the one place classic DBSCAN is scan-order-dependent, made
  deterministic here (and in the brute-force golden, identically);
- everything else: noise (omitted from the output).
Cluster ids are the minimum point id in the cluster — stable under any
execution order.

Distribution scheme (two groupby exchanges, no row-level join):
1. cell = floor(coord / eps): every eps-ball around a point in cell C
   lies inside ring1(C), so donating each point to its 9 neighbor
   cells makes each cell's group self-sufficient for neighbor counts.
   Round 1 (groupby home cell): exact per-point neighbor counts ->
   (id, lon, lat, core) for residents. Every point is a resident of
   exactly one cell, so round 1's output is the corpus WITH core flags
   — no join needed to attach them.
   (Both rounds group on a 512-way HASH BUCKET of the cell, not the raw
   cell id: map_groups dispatches Python per group, and 10^4..10^6
   per-cell calls dominated wall time — measured 49s -> ~8s at sf0.01.
   Cells are iterated vectorized inside each bucket via one lexsort.)
2. Round 2 (same donation over round-1 output): per home cell H the
   group holds ring1(H) with core flags. Local core components of ANY
   cell C in the group are recomputable from C's own points (all
   present), so H emits: its residents' provisional labels
   (cell-local component ids), cross-cell core edges (label pairs for
   core pairs within eps spanning cells), and border assignments.
3. Driver: union-find over the emitted LABEL graph (bounded by
   occupied-cell count, independent of row count), then a tiny
   groupby(root).min(id) gives the deterministic cluster ids, mapped
   back over the assignments via broadcast dict.

Dense-cell safety: every kernel that would otherwise be quadratic in
points-per-cell (neighbor counts, local components, cross-cell edges,
border nearest-core) switches above `_DENSE` to a SUB-GRID pass: the
segment's points are bucketed on a grid of side eps/q, sub-cell PAIRS
are classified conservatively by their min/max possible point distance
('inside' pairs — every cross pair within eps — contribute without any
distance computation; 'excluded' pairs are dropped; only the
eps-straddling boundary band is measured exactly), so a 10^5-point
urban cell costs ~n x band instead of n^2, and in saturated regions
the inside-count alone certifies cores with no pair work at all.
Results are bit-identical to the matrix path (the bounds are
conservative under float slop: misclassification can only move a pair
into the exact-check class, never produce a wrong answer).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CHUNK = 1024
_OFF = 1 << 20  # cell coordinate offset for label packing
_DENSE = 512  # segment/cell size above which the sub-grid kernels engage
_DENSE_PAIRS = 1 << 18  # pair-matrix volume above which edges/borders go dense
_K = 1 << 32  # sub-cell key stride (|sub coords| < 2^31 by the eps guard)


def pack_label(cx: int, cy: int, comp: int) -> int:
    return ((cx + _OFF) << 42) | ((cy + _OFF) << 21) | comp


def _cells(lon: np.ndarray, lat: np.ndarray, eps: float):
    return (
        np.floor(lon / eps).astype(np.int64),
        np.floor(lat / eps).astype(np.int64),
    )


N_BUCKETS = 512


def _bucket(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """Cell -> shuffle bucket (mixing hash). Grouping on ~512 buckets
    instead of ~10^4..10^6 raw cells keeps the exchange's group count
    (and map_groups' per-group Python dispatch) bounded; the per-cell
    iteration happens vectorized INSIDE each bucket group."""
    return ((cx * 73856093) ^ (cy * 19349663)) % N_BUCKETS


def donate9(batch: pa.Table, eps: float) -> pa.Table:
    """Fan each point out to its cell and the 8 ring-1 neighbors."""
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    cx, cy = _cells(lon, lat, eps)
    tables = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            tables.append(
                batch.append_column("tcx", pa.array(cx + dx))
                .append_column("tcy", pa.array(cy + dy))
                .append_column("bucket", pa.array(_bucket(cx + dx, cy + dy)))
            )
    return pa.concat_tables(tables).combine_chunks()


def _segment_offsets(tcx: np.ndarray, tcy: np.ndarray):
    """Sort the bucket by target cell; return (order, starts, ends) —
    one [starts[j], ends[j]) slice of ``order`` per distinct cell."""
    order = np.lexsort((tcy, tcx))
    if len(order) == 0:
        return order, np.empty(0, np.int64), np.empty(0, np.int64)
    sx, sy = tcx[order], tcy[order]
    bnd = np.nonzero((np.diff(sx) != 0) | (np.diff(sy) != 0))[0] + 1
    starts = np.concatenate(([0], bnd))
    ends = np.concatenate((bnd, [len(order)]))
    return order, starts, ends


def _neighbor_counts(
    rlon: np.ndarray, rlat: np.ndarray, alon: np.ndarray, alat: np.ndarray, eps2: float
) -> np.ndarray:
    """# of points in (alon, alat) within eps of each (rlon, rlat) row."""
    counts = np.zeros(len(rlon), dtype=np.int64)
    for s in range(0, len(rlon), _CHUNK):
        e = min(s + _CHUNK, len(rlon))
        d2 = (rlon[s:e, None] - alon[None, :]) ** 2 + (
            rlat[s:e, None] - alat[None, :]
        ) ** 2
        counts[s:e] = (d2 <= eps2).sum(axis=1)
    return counts


_OFFSET_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _offset_classes(q: int) -> tuple[np.ndarray, np.ndarray]:
    """Sub-cell offset classification for sub-grid side t = eps/q.

    For two sub-cells (di, dj) apart, the cross-point distance lies in
    [max(0,|di|-1)*t, (|di|+1)*t] per axis. Offsets whose MAX bound is
    <= eps are 'inside' (every cross pair within eps — no distances
    needed); offsets whose MIN bound is > eps can hold no pair and are
    dropped; the rest are the 'boundary' band needing exact checks.
    Comparisons run on exact integers against q^2 with a one-unit slack
    (>= t^2 absolute margin), so float slop in the floor-bucketing can
    only demote a pair into the exact-check class."""
    got = _OFFSET_CACHE.get(q)
    if got is not None:
        return got
    rng = np.arange(-(q + 1), q + 2, dtype=np.int64)
    di = np.repeat(rng, len(rng))
    dj = np.tile(rng, len(rng))
    mn2 = np.maximum(np.abs(di) - 1, 0) ** 2 + np.maximum(np.abs(dj) - 1, 0) ** 2
    mx2 = (np.abs(di) + 1) ** 2 + (np.abs(dj) + 1) ** 2
    q2 = q * q
    inside = mx2 <= q2 - 1
    excl = mn2 >= q2 + 1
    bd = ~inside & ~excl
    got = (di[inside] * _K + dj[inside], di[bd] * _K + dj[bd])
    _OFFSET_CACHE[q] = got
    return got


_RING_CACHE: dict[int, np.ndarray] = {}


def _ring_offsets(r: int) -> np.ndarray:
    """Packed key offsets of the Chebyshev-radius-r sub-cell ring."""
    got = _RING_CACHE.get(r)
    if got is not None:
        return got
    if r == 0:
        got = np.zeros(1, dtype=np.int64)
    else:
        offs = []
        for di in range(-r, r + 1):
            for dj in range(-r, r + 1):
                if max(abs(di), abs(dj)) == r:
                    offs.append(di * _K + dj)
        got = np.asarray(offs, dtype=np.int64)
    _RING_CACHE[r] = got
    return got


def _subgrid_runs(lon: np.ndarray, lat: np.ndarray, t: float):
    """Bucket points on the global grid of side t; return (key, order,
    run starts, run ends, run keys) with runs sorted by packed key."""
    sx = np.floor(lon / t).astype(np.int64)
    sy = np.floor(lat / t).astype(np.int64)
    key = sx * _K + sy
    order = np.argsort(key, kind="stable")
    ks = key[order]
    bnd = np.nonzero(np.diff(ks))[0] + 1
    starts = np.concatenate(([0], bnd))
    ends = np.concatenate((bnd, [len(ks)]))
    return key, order, starts, ends, ks[starts]


def _grid_q(n: int) -> int:
    """Sub-grid resolution: ~32 points per sub-cell, clamped."""
    return int(np.clip(np.sqrt(n / 32.0), 4.0, 32.0))


def _any_pair_within(ax, ay, bx, by, eps2: float) -> bool:
    """True iff some cross pair is within eps (chunked, early exit)."""
    for s in range(0, len(ax), 256):
        d2 = (ax[s : s + 256, None] - bx[None, :]) ** 2 + (
            ay[s : s + 256, None] - by[None, :]
        ) ** 2
        if (d2 <= eps2).any():
            return True
    return False


def _count_cores_dense(
    lon: np.ndarray,
    lat: np.ndarray,
    res_local: np.ndarray,
    eps: float,
    min_pts: int,
) -> np.ndarray:
    """Core flags for the `res_local` rows of ONE dense segment without
    the residents x ring-points matrix: 'inside' sub-cell pairs add
    their run lengths outright, and the boundary band is measured only
    for residents whose inside-count hasn't already reached min_pts
    (in saturated neighborhoods that's nobody)."""
    n = len(lon)
    q = _grid_q(n)
    t = eps / q
    eps2 = eps * eps
    key, order, starts, ends, rkeys = _subgrid_runs(lon, lat, t)
    rlens = ends - starts
    nk = len(rkeys)
    ins_k, bd_k = _offset_classes(q)
    core = np.zeros(len(res_local), dtype=bool)
    rk = key[res_local]
    ro = np.argsort(rk, kind="stable")
    rks = rk[ro]
    gb = np.nonzero(np.diff(rks))[0] + 1
    gstarts = np.concatenate(([0], gb))
    gends = np.concatenate((gb, [len(res_local)]))
    for gs, ge in zip(gstarts, gends):
        u = rks[gs]
        grp = ro[gs:ge]
        tk = u + ins_k
        pos = np.searchsorted(rkeys, tk)
        np.minimum(pos, nk - 1, out=pos)
        hit = rkeys[pos] == tk
        inside = int(rlens[pos[hit]].sum())
        if inside >= min_pts:
            core[grp] = True
            continue
        tk = u + bd_k
        pos = np.searchsorted(rkeys, tk)
        np.minimum(pos, nk - 1, out=pos)
        bidx = pos[rkeys[pos] == tk]
        if len(bidx) == 0:
            continue
        cand = np.concatenate([order[starts[i] : ends[i]] for i in bidx])
        rr = res_local[grp]
        cnt = _neighbor_counts(lon[rr], lat[rr], lon[cand], lat[cand], eps2)
        core[grp] = (inside + cnt) >= min_pts
    return core


def _propagate_min(nk: int, ei: np.ndarray, ej: np.ndarray) -> np.ndarray:
    """Min-label propagation with pointer jumping over an edge list;
    converges to label = min reachable node index."""
    labels = np.arange(nk)
    while True:
        new = labels.copy()
        if len(ei):
            np.minimum.at(new, ei, labels[ej])
            np.minimum.at(new, ej, labels[ei])
        new = np.minimum(new, new[new])
        while True:
            nxt = new[new]
            if np.array_equal(nxt, new):
                break
            new = nxt
        if np.array_equal(new, labels):
            return labels
        labels = new


def _components_dense(clon: np.ndarray, clat: np.ndarray, eps: float) -> np.ndarray:
    """Connected components of core points within ONE cell via sub-cell
    contraction: same-sub-cell points are mutually within eps (t <=
    eps/4), 'inside' sub-cell pairs union outright (vectorized edge
    list), and only eps-straddling pairs whose endpoints are still in
    different provisional components run an any-pair check. Returns the
    min-member-index label per point — _local_components' convention."""
    n = len(clon)
    eps2 = eps * eps
    q = _grid_q(n)
    t = eps / q
    key, order, starts, ends, rkeys = _subgrid_runs(clon, clat, t)
    nk = len(rkeys)
    ins_k, bd_k = _offset_classes(q)
    tk = (rkeys[:, None] + ins_k[None, :]).ravel()
    pos = np.searchsorted(rkeys, tk)
    np.minimum(pos, nk - 1, out=pos)
    hit = rkeys[pos] == tk
    ei = np.repeat(np.arange(nk), len(ins_k))[hit]
    ej = pos[hit]
    m = ej > ei
    labels = _propagate_min(nk, ei[m], ej[m])
    tk = (rkeys[:, None] + bd_k[None, :]).ravel()
    pos = np.searchsorted(rkeys, tk)
    np.minimum(pos, nk - 1, out=pos)
    hit = rkeys[pos] == tk
    bi = np.repeat(np.arange(nk), len(bd_k))[hit]
    bj = pos[hit]
    m = (bj > bi) & (labels[bi] != labels[bj])
    bi, bj = bi[m], bj[m]
    if len(bi):
        parent: dict[int, int] = {}

        def find(a: int) -> int:
            r = a
            while parent.setdefault(r, r) != r:
                r = parent[r]
            while parent[a] != r:
                parent[a], a = r, parent[a]
            return r

        for i, j in zip(bi.tolist(), bj.tolist()):
            ra, rb = find(int(labels[i])), find(int(labels[j]))
            if ra == rb:
                continue
            a = order[starts[i] : ends[i]]
            b = order[starts[j] : ends[j]]
            if _any_pair_within(clon[a], clat[a], clon[b], clat[b], eps2):
                parent[max(ra, rb)] = min(ra, rb)
        labels = np.asarray([find(int(v)) for v in labels.tolist()], dtype=np.int64)
    run_id = np.zeros(n, dtype=np.int64)
    run_id[starts[1:]] = 1
    run_id = np.cumsum(run_id)
    sub_of_point = np.empty(n, dtype=np.int64)
    sub_of_point[order] = run_id
    comp_of_point = labels[sub_of_point]
    minidx = np.full(nk, n, dtype=np.int64)
    np.minimum.at(minidx, comp_of_point, np.arange(n))
    return minidx[comp_of_point]


def _run_label_info(lab, order, starts):
    """Per sub-cell run: (first label, is-the-run-uniformly-labeled)."""
    sl = lab[order]
    first = sl[starts]
    nruns = len(starts)
    run_id = np.zeros(len(sl), dtype=np.int64)
    run_id[starts[1:]] = 1
    run_id = np.cumsum(run_id)
    uniform = np.ones(nruns, dtype=bool)
    uniform[np.unique(run_id[sl != first[run_id]])] = False
    return first, uniform


def _edge_pairs_dense(alon, alat, alab, blon, blat, blab, eps: float):
    """Unique (label_a, label_b) pairs with some cross pair within eps:
    'inside' sub-cell pairs emit their label products outright (bulk
    vectorized for the uniform-label majority), boundary pairs are
    verified only when they could add a pair not already emitted."""
    eps2 = eps * eps
    q = _grid_q(len(alon) + len(blon))
    t = eps / q
    keyA, orderA, startsA, endsA, rkeysA = _subgrid_runs(alon, alat, t)
    keyB, orderB, startsB, endsB, rkeysB = _subgrid_runs(blon, blat, t)
    nA, nB = len(rkeysA), len(rkeysB)
    ins_k, bd_k = _offset_classes(q)
    firstA, unifA = _run_label_info(alab, orderA, startsA)
    firstB, unifB = _run_label_info(blab, orderB, startsB)
    out: set[tuple[int, int]] = set()

    tk = (rkeysA[:, None] + ins_k[None, :]).ravel()
    pos = np.searchsorted(rkeysB, tk)
    np.minimum(pos, nB - 1, out=pos)
    hit = rkeysB[pos] == tk
    ai = np.repeat(np.arange(nA), len(ins_k))[hit]
    bj = pos[hit]
    uu = unifA[ai] & unifB[bj]
    if uu.any():
        pairs = np.unique(
            np.stack([firstA[ai[uu]], firstB[bj[uu]]], axis=1), axis=0
        )
        out.update((int(a), int(b)) for a, b in pairs)
    for i, j in zip(ai[~uu].tolist(), bj[~uu].tolist()):
        ula = np.unique(alab[orderA[startsA[i] : endsA[i]]])
        ulb = np.unique(blab[orderB[startsB[j] : endsB[j]]])
        out.update((int(a), int(b)) for a in ula for b in ulb)

    tk = (rkeysA[:, None] + bd_k[None, :]).ravel()
    pos = np.searchsorted(rkeysB, tk)
    np.minimum(pos, nB - 1, out=pos)
    hit = rkeysB[pos] == tk
    ai = np.repeat(np.arange(nA), len(bd_k))[hit]
    bj = pos[hit]
    # vectorized skip: uniform-label boundary pairs whose label pair the
    # inside pass already emitted need no distance check (the common
    # case in a dense cluster — this drops ~all of the loop below)
    uu = unifA[ai] & unifB[bj]
    if uu.any():
        pr = np.stack([firstA[ai[uu]], firstB[bj[uu]]], axis=1)
        upr, inv = np.unique(pr, axis=0, return_inverse=True)
        known = np.asarray([(int(a), int(b)) in out for a, b in upr])
        drop = np.zeros(len(ai), dtype=bool)
        drop[np.nonzero(uu)[0][known[inv]]] = True
        ai, bj = ai[~drop], bj[~drop]
    for i, j in zip(ai.tolist(), bj.tolist()):
        if (
            unifA[i]
            and unifB[j]
            and (int(firstA[i]), int(firstB[j])) in out
        ):
            continue
        arun = orderA[startsA[i] : endsA[i]]
        brun = orderB[startsB[j] : endsB[j]]
        ula = [int(v) for v in np.unique(alab[arun])]
        ulb = [int(v) for v in np.unique(blab[brun])]
        if all((a, b) in out for a in ula for b in ulb):
            continue
        D = (alon[arun][:, None] - blon[brun][None, :]) ** 2 + (
            alat[arun][:, None] - blat[brun][None, :]
        ) ** 2
        ii, jj = np.nonzero(D <= eps2)
        out.update(
            zip(alab[arun[ii]].tolist(), blab[brun[jj]].tolist())
        )
    if not out:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    arr = np.asarray(sorted(out), dtype=np.int64)
    return arr[:, 0], arr[:, 1]


def _nearest_core_dense(blon, blat, clon, clat, eps: float) -> np.ndarray:
    """Nearest-core POSITION (into the id-sorted core arrays) for each
    border point via expanding sub-cell rings; -1 if none within eps.
    Candidates are position-sorted so equal-d2 ties resolve to the
    smallest position — identical to the matrix path's first-argmin."""
    eps2 = eps * eps
    q = _grid_q(len(clon))
    t = eps / q
    key, order, starts, ends, rkeys = _subgrid_runs(clon, clat, t)
    nk = len(rkeys)
    best_pos = np.full(len(blon), -1, dtype=np.int64)
    bx = np.floor(blon / t).astype(np.int64)
    by = np.floor(blat / t).astype(np.int64)
    bkey = bx * _K + by
    bo = np.argsort(bkey, kind="stable")
    bks = bkey[bo]
    gb = np.nonzero(np.diff(bks))[0] + 1
    gstarts = np.concatenate(([0], gb))
    gends = np.concatenate((gb, [len(bo)]))
    for gs, ge in zip(gstarts, gends):
        grp = bo[gs:ge]
        u = bks[gs]
        gl, gt = blon[grp], blat[grp]
        gbest = np.full(len(grp), np.inf)
        gpos = np.full(len(grp), -1, dtype=np.int64)
        for r in range(0, q + 3):
            rm2 = 0.0 if r <= 1 else (((r - 1) * t) ** 2) * (1.0 - 1e-9)
            if rm2 > eps2:
                break
            active = np.nonzero(gbest >= rm2)[0]
            if len(active) == 0:
                break
            tk = u + _ring_offsets(r)
            pos = np.searchsorted(rkeys, tk)
            np.minimum(pos, nk - 1, out=pos)
            hidx = pos[rkeys[pos] == tk]
            if len(hidx) == 0:
                continue
            cand = np.sort(
                np.concatenate([order[starts[i] : ends[i]] for i in hidx])
            )
            D = (gl[active][:, None] - clon[cand][None, :]) ** 2 + (
                gt[active][:, None] - clat[cand][None, :]
            ) ** 2
            D[D > eps2] = np.inf
            am = np.argmin(D, axis=1)
            dmin = D[np.arange(len(active)), am]
            cp = cand[am]
            better = (dmin < gbest[active]) | (
                np.isfinite(dmin) & (dmin == gbest[active]) & (cp < gpos[active])
            )
            upd = active[better]
            gbest[upd] = dmin[better]
            gpos[upd] = cp[better]
        best_pos[grp] = np.where(np.isfinite(gbest), gpos, -1)
    return best_pos


class CoreFlagger:
    """Round 1 map_groups fn over one BUCKET: for every home cell hashed
    into the bucket, exact neighbor counts for its residents; emits the
    resident rows + core flag."""

    def __init__(self, eps: float, min_pts: int, id_col: str = "image_id"):
        self.eps = eps
        self.eps2 = eps * eps
        self.min_pts = min_pts
        self.id_col = id_col

    def __call__(self, group: pa.Table) -> pa.Table:
        lon = group["lon"].to_numpy(zero_copy_only=False)
        lat = group["lat"].to_numpy(zero_copy_only=False)
        tcx = group["tcx"].to_numpy(zero_copy_only=False)
        tcy = group["tcy"].to_numpy(zero_copy_only=False)
        cx, cy = _cells(lon, lat, self.eps)
        # resident = the copy whose donation target is its own cell;
        # computed vectorized for the whole bucket, not per segment
        res_mask = (cx == tcx) & (cy == tcy)
        order, starts, ends = _segment_offsets(tcx, tcy)
        lengths = ends - starts
        # segments whose whole 9-cell ring holds < min_pts points can't
        # produce a core: bulk-emit their residents core=false with ZERO
        # per-segment Python (the vast majority of world cells at global
        # scale); the O(n^2) path below touches dense neighborhoods only.
        seg_id = np.zeros(len(order), dtype=np.int64)
        if len(starts) > 1:
            seg_id[starts[1:]] = 1
            seg_id = np.cumsum(seg_id)
        small_pos = lengths[seg_id] < self.min_pts
        res_pos = res_mask[order]
        keep_idx: list[np.ndarray] = [order[small_pos & res_pos]]
        keep_core: list[np.ndarray] = [
            np.zeros(int((small_pos & res_pos).sum()), dtype=bool)
        ]
        for j in np.nonzero(lengths >= self.min_pts)[0]:
            seg = order[starts[j] : ends[j]]
            res_local = np.nonzero(res_mask[seg])[0]
            res = seg[res_local]
            if len(res) == 0:
                continue
            if len(seg) >= _DENSE:
                flags = _count_cores_dense(
                    lon[seg], lat[seg], res_local, self.eps, self.min_pts
                )
            else:
                cnt = _neighbor_counts(
                    lon[res], lat[res], lon[seg], lat[seg], self.eps2
                )
                flags = cnt >= self.min_pts
            keep_idx.append(res)
            keep_core.append(flags)
        keep_idx = [a for a in keep_idx if len(a)]
        keep_core = [a for a in keep_core if len(a)]
        if not keep_idx:
            return pa.table(
                {
                    self.id_col: group[self.id_col].slice(0, 0),
                    "lon": pa.array([], pa.float64()),
                    "lat": pa.array([], pa.float64()),
                    "core": pa.array([], pa.bool_()),
                }
            )
        idx = np.concatenate(keep_idx)
        t = group.take(pa.array(idx))
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "lon": t["lon"],
                "lat": t["lat"],
                "core": pa.array(np.concatenate(keep_core)),
            }
        )


def _local_components(
    lon: np.ndarray, lat: np.ndarray, core: np.ndarray, eps2: float
) -> np.ndarray:
    """Connected components (within ONE cell) of its core points; -1 for
    non-core. Vectorized min-label propagation with pointer jumping —
    converges to label = min reachable index, identical to the previous
    union-find's min-root convention but with no per-edge Python loop
    (the labeler's hot kernel: dense urban cells hold O(10^2..10^3)
    cores whose eps-graphs have tens of thousands of edges)."""
    comp = np.full(len(lon), -1, dtype=np.int64)
    idx = np.nonzero(core)[0]
    n = len(idx)
    if n == 0:
        return comp
    if n == 1:
        comp[idx] = 0
        return comp
    if n >= _DENSE:
        comp[idx] = _components_dense(lon[idx], lat[idx], float(np.sqrt(eps2)))
        return comp
    clon, clat = lon[idx], lat[idx]
    labels = np.arange(n)
    cache = None
    if n <= _CHUNK:
        d2 = (clon[:, None] - clon[None, :]) ** 2 + (clat[:, None] - clat[None, :]) ** 2
        cache = d2 <= eps2
    while True:
        new = np.empty_like(labels)
        if cache is not None:
            lab = np.where(cache, labels[None, :], n)
            new = lab.min(axis=1)
        else:
            for s in range(0, n, _CHUNK):
                e = min(s + _CHUNK, n)
                d2 = (clon[s:e, None] - clon[None, :]) ** 2 + (
                    clat[s:e, None] - clat[None, :]
                ) ** 2
                lab = np.where(d2 <= eps2, labels[None, :], n)
                new[s:e] = lab.min(axis=1)
        new = np.minimum(new, labels[new])  # pointer jump
        while True:
            nxt = new[new]
            if np.array_equal(nxt, new):
                break
            new = nxt
        if np.array_equal(new, labels):
            break
        labels = new
    comp[idx] = labels
    return comp


class CellLabeler:
    """Round 2 map_groups fn: per home cell emit provisional labels for
    residents, cross-cell core edges, and border assignments.

    Output rows are a tagged union (kind: 'A' assignment, 'E' edge):
    - A: (id, label) resident core -> its local label; resident border
         -> nearest core neighbor's label
    - E: (label_a=label, label_b) core-core edge across cells (emitted
         once per unordered pair with home on the lexicographically
         smaller cell, so the exchange carries no duplicates)
    """

    def __init__(self, eps: float, id_col: str = "image_id"):
        self.eps = eps
        self.eps2 = eps * eps
        self.id_col = id_col

    def __call__(self, group: pa.Table) -> pa.Table:
        eps, eps2 = self.eps, self.eps2
        glon = group["lon"].to_numpy(zero_copy_only=False)
        glat = group["lat"].to_numpy(zero_copy_only=False)
        gcore = group["core"].to_numpy(zero_copy_only=False)
        gids = np.asarray(group[self.id_col].to_pylist())
        gtcx = group["tcx"].to_numpy(zero_copy_only=False)
        gtcy = group["tcy"].to_numpy(zero_copy_only=False)
        gcx, gcy = _cells(glon, glat, eps)

        out_id: list = []
        out_label: list = []
        out_kind: list = []
        edge_a: list = []
        edge_b: list = []

        order, starts, ends = _segment_offsets(gtcx, gtcy)
        # per-segment any-core, computed in one reduceat — segments with
        # no core anywhere in their 9-cell ring yield only noise (a
        # border needs an in-ring core) and are skipped without touching
        # Python; labeling work confines to dense neighborhoods.
        if len(starts) == 0:
            has_core = np.empty(0, dtype=bool)
        else:
            has_core = np.add.reduceat(
                gcore[order].astype(np.int64), starts
            ) > 0
        for j in np.nonzero(has_core)[0]:
            seg = order[starts[j] : ends[j]]
            hcx, hcy = int(gtcx[seg[0]]), int(gtcy[seg[0]])
            lon, lat = glon[seg], glat[seg]
            core, ids = gcore[seg], gids[seg]
            cx, cy = gcx[seg], gcy[seg]

            # local component labels per cell present in the segment
            label = np.full(len(seg), -1, dtype=np.int64)
            cell_key = (cx - hcx + 1) * 3 + (cy - hcy + 1)  # 0..8
            for k in range(9):
                m = np.nonzero(cell_key == k)[0]
                if len(m) == 0:
                    continue
                # CANONICAL ORDER: the same cell is labeled independently
                # in up to 9 different shuffle groups (its home segment
                # emits assignments, neighbor segments emit edges naming
                # its labels), and _local_components labels a component by
                # the minimum POSITIONAL index of its cores — so the cell's
                # rows must be presented in an order every group agrees
                # on. Ray Data's shuffle guarantees no such order; sorting
                # by point id here makes comp ids order-independent.
                m = m[np.argsort(ids[m], kind="stable")]
                comp = _local_components(lon[m], lat[m], core[m], eps2)
                has = comp >= 0
                if has.any():
                    ccx, ccy = int(cx[m[0]]), int(cy[m[0]])
                    label[m[has]] = (
                        pack_label(ccx, ccy, 0) + comp[has]
                    )

            res = (cx == hcx) & (cy == hcy)
            ridx = np.nonzero(res)[0]
            if not len(ridx):
                continue
            rcore = ridx[core[ridx]]
            # resident core assignments (bulk extend, no per-row loop)
            out_id.extend(ids[rcore])
            out_label.extend(label[rcore])
            out_kind.extend(["A"] * len(rcore))
            # cross-cell core edges (home cell lexicographically smaller)
            oidx = np.nonzero(~res & core)[0]
            if len(rcore) and len(oidx):
                forward = (cx[oidx] > hcx) | ((cx[oidx] == hcx) & (cy[oidx] > hcy))
                oidx = oidx[forward]
            if len(rcore) and len(oidx):
                if len(rcore) * len(oidx) >= _DENSE_PAIRS:
                    pa_, pb_ = _edge_pairs_dense(
                        lon[rcore], lat[rcore], label[rcore],
                        lon[oidx], lat[oidx], label[oidx], eps,
                    )
                    edge_a.extend(pa_)
                    edge_b.extend(pb_)
                else:
                    olon, olat = lon[oidx], lat[oidx]
                    for s in range(0, len(rcore), _CHUNK):
                        e = min(s + _CHUNK, len(rcore))
                        sub = rcore[s:e]
                        d2 = (lon[sub][:, None] - olon[None, :]) ** 2 + (
                            lat[sub][:, None] - olat[None, :]
                        ) ** 2
                        ii, jj = np.nonzero(d2 <= eps2)
                        if len(ii):
                            la = label[sub[ii]]
                            lb = label[oidx[jj]]
                            pairs = np.unique(np.stack([la, lb], axis=1), axis=0)
                            edge_a.extend(pairs[:, 0])
                            edge_b.extend(pairs[:, 1])
            # border points: nearest core neighbor's label, tie -> min id
            rbord = ridx[~core[ridx]]
            cidx = np.nonzero(core)[0]
            if len(rbord) and len(cidx):
                clon, clat = lon[cidx], lat[cidx]
                cid = ids[cidx]
                # NB: must not be named `order` — that's the outer
                # bucket-wide segment ordering this loop slices from
                cord = np.argsort(cid, kind="stable")  # tie-break by id
                cidx_o = cidx[cord]
                clon, clat = clon[cord], clat[cord]
                if len(rbord) * len(cidx) >= _DENSE_PAIRS:
                    bp = _nearest_core_dense(
                        lon[rbord], lat[rbord], clon, clat, eps
                    )
                    ok = bp >= 0
                    out_id.extend(ids[rbord[ok]])
                    out_label.extend(label[cidx_o[bp[ok]]])
                    out_kind.extend(["A"] * int(ok.sum()))
                else:
                    for s in range(0, len(rbord), _CHUNK):
                        e = min(s + _CHUNK, len(rbord))
                        sub = rbord[s:e]
                        d2 = (lon[sub][:, None] - clon[None, :]) ** 2 + (
                            lat[sub][:, None] - clat[None, :]
                        ) ** 2
                        d2[d2 > eps2] = np.inf
                        best = np.argmin(d2, axis=1)  # first min = smallest id
                        ok = np.isfinite(d2[np.arange(len(sub)), best])
                        out_id.extend(ids[sub[ok]])
                        out_label.extend(label[cidx_o[best[ok]]])
                        out_kind.extend(["A"] * int(ok.sum()))

        n_assign = len(out_id)
        label_b_col = np.concatenate(
            [np.zeros(n_assign, dtype=np.int64), np.asarray(edge_b, dtype=np.int64)]
        )
        out_id.extend([""] * len(edge_a))
        out_label.extend(edge_a)
        out_kind.extend(["E"] * len(edge_a))
        return pa.table(
            {
                self.id_col: pa.array(out_id, pa.string()),
                "label": pa.array(np.asarray(out_label, dtype=np.int64)),
                "label_b": pa.array(label_b_col),
                "kind": pa.array(out_kind, pa.string()),
            }
        )


def dbscan(ds, eps: float, min_pts: int, id_col: str = "image_id"):
    """Full distributed DBSCAN; returns a Dataset (id_col, cluster) over
    the CLUSTERED points (noise rows are simply absent — at curation
    scale the clustered set is the interesting/smaller one), with
    cluster = min point id of the cluster.

    The two materialize() calls pin only SKINNY tag tables
    ((id, label, kind) ~ tens of bytes/row, payload columns long gone)
    so the two downstream consumers (driver edge pull + assignment
    relabel) don't re-execute the pipeline; the raw image rows stream
    through exactly once."""
    # pack_label packs cell coords into 21-bit fields around _OFF=2^20;
    # lon in [-180, 180] gives |cell| <= 180/eps + 1 (donation adds +-1),
    # so eps below ~1.72e-4 deg would silently alias label fields.
    if not (eps > 0.0) or np.floor(180.0 / eps) + 1 >= _OFF:
        raise ValueError(
            f"eps={eps} too small for 21-bit cell label packing "
            f"(need floor(180/eps)+1 < 2^20, i.e. eps > ~1.72e-4 deg)"
        )
    flagger = CoreFlagger(eps, min_pts, id_col)
    labeler = CellLabeler(eps, id_col)

    def flag_cell(g: pa.Table) -> pa.Table:
        return flagger(g)

    def label_cell(g: pa.Table) -> pa.Table:
        return labeler(g)

    flagged = (
        ds.map_batches(lambda b: donate9(b, eps), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(flag_cell, batch_format="pyarrow")
    )
    # Density-aware pruning of the round-2 exchange: round 2 only does
    # work in segments whose 9-cell ring holds a core, i.e. home cells
    # inside ring1 of some core cell ("active"). Donating only to active
    # targets drops the world's noise points from the second shuffle
    # entirely (exact: p needs a round-2 row only in segments H with a
    # core in ring1(H), and every such H is active by construction).
    # The active set is dense-region-bounded (core cells + their ring),
    # broadcast once via ray.put.
    import ray

    flagged = flagged.materialize()  # skinny (id, lon, lat, core) rows
    core_cell_ids: set[int] = set()
    for b in (
        flagged.filter(expr="core == True")
        .select_columns(["lon", "lat"])
        .iter_batches(batch_format="pyarrow")
    ):
        ccx, ccy = _cells(
            b["lon"].to_numpy(zero_copy_only=False),
            b["lat"].to_numpy(zero_copy_only=False),
            eps,
        )
        core_cell_ids.update(pack_label(ccx, ccy, 0).tolist())
    if not core_cell_ids:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {id_col: pa.array([], pa.string()), "cluster": pa.array([], pa.string())}
            )
        )
    cc = np.array(sorted(core_cell_ids), dtype=np.int64)
    ccx = (cc >> 42) - _OFF
    ccy = ((cc >> 21) & ((1 << 21) - 1)) - _OFF
    act = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            act.append(pack_label(ccx + dx, ccy + dy, 0))
    active_sorted = np.unique(np.concatenate(act))
    active_ref = ray.put(active_sorted)

    def donate_active(batch: pa.Table) -> pa.Table:
        active = ray.get(active_ref)
        full = donate9(batch, eps)
        key = pack_label(
            full["tcx"].to_numpy(zero_copy_only=False),
            full["tcy"].to_numpy(zero_copy_only=False),
            0,
        )
        pos = np.searchsorted(active, key)
        pos[pos >= len(active)] = len(active) - 1
        keep = active[pos] == key
        return full.filter(pa.array(keep))

    tagged = (
        flagged.map_batches(donate_active, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(label_cell, batch_format="pyarrow")
    )
    tagged = tagged.materialize()

    # driver-side union-find over the LABEL graph (cell-bounded)
    edges = (
        tagged.filter(expr="kind == 'E'")
        .select_columns(["label", "label_b"])
        .to_pandas()
    )
    assigns = tagged.filter(expr="kind == 'A'").select_columns([id_col, "label"])
    if assigns.count() == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {id_col: pa.array([], pa.string()), "cluster": pa.array([], pa.string())}
            )
        )

    parent: dict[int, int] = {}

    def find(a: int) -> int:
        r = a
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[a] != r:
            parent[a], a = r, parent[a]
        return r

    for a, b in (
        zip(edges["label"], edges["label_b"]) if len(edges) else ()
    ):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # root per provisional label, broadcast as a dict (bounded by cells)
    import ray

    roots_ref = ray.put({k: find(k) for k in list(parent)})

    def to_root(batch: pa.Table) -> pa.Table:
        roots = ray.get(roots_ref)
        lab = batch["label"].to_numpy(zero_copy_only=False)
        rr = np.array([roots.get(int(v), int(v)) for v in lab], dtype=np.int64)
        return pa.table({id_col: batch[id_col], "root": pa.array(rr)})

    rooted = assigns.map_batches(to_root, batch_format="pyarrow")
    rooted = rooted.materialize()
    # deterministic cluster id = min point id per root: per-batch arrow
    # partial mins -> one tiny final merge (cluster-cardinality sized)
    def pmin(batch: pa.Table) -> pa.Table:
        g = batch.group_by("root").aggregate([(id_col, "min")])
        return g.rename_columns(["root", "mid"])

    parts = (
        rooted.map_batches(pmin, batch_format="pyarrow").repartition(1)
        .map_batches(
            lambda b: b.group_by("root")
            .aggregate([("mid", "min")])
            .rename_columns(["root", "mid"]),
            batch_format="pyarrow",
            batch_size=None,
        )
        .to_pandas()
    )
    min_map_ref = ray.put(dict(zip(parts["root"].astype(np.int64), parts["mid"])))

    def finish(batch: pa.Table) -> pa.Table:
        mm = ray.get(min_map_ref)
        rr = batch["root"].to_numpy(zero_copy_only=False)
        cl = [mm[int(v)] for v in rr]
        return pa.table({id_col: batch[id_col], "cluster": pa.array(cl, pa.string())})

    return rooted.map_batches(finish, batch_format="pyarrow")
