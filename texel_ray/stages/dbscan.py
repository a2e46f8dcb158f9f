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

Dense-cell safety: all pairwise work is chunked (`_CHUNK` rows of the
d2 matrix at a time), so a worst-case urban cell costs compute, never
memory. (If a single eps-cell ever holds ~10^5+ points the knn_all
sub-grid kernel shape applies; documented, not needed at bench scale.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CHUNK = 1024
_OFF = 1 << 20  # cell coordinate offset for label packing


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
            res = seg[res_mask[seg]]
            if len(res) == 0:
                continue
            cnt = _neighbor_counts(
                lon[res], lat[res], lon[seg], lat[seg], self.eps2
            )
            keep_idx.append(res)
            keep_core.append(cnt >= self.min_pts)
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
