"""Brute-force invariant tests for the round-4 operators: skyline
(O(n^2) dominance recompute), funnel (per-user greedy scan), grouped
median (plain numpy quantile rule), cohort retention (pandas
recompute), upsert_latest (pandas idxmax), variogram (brute pair
enumeration over the occupied lattice), contour census (dense-lattice
marching recompute), pagerank (dense-lattice power iteration)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from texel_ray.sources.images import ensure_images_for_sf_dir

SF_DIR = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    df = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype(np.int64)
    df["cents"] = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
    return df


def test_skyline_matches_quadratic_bruteforce():
    from texel_ray.pipelines.relational import q_skyline_events

    out = q_skyline_events(SF_DIR)
    ev = _events()
    c = ev["cents"].to_numpy()
    t = ev["ts_us"].to_numpy()
    keep = []
    for i in range(len(ev)):
        dominated = np.any(
            (c >= c[i]) & (t >= t[i]) & ((c > c[i]) | (t > t[i]))
        )
        if not dominated:
            keep.append(int(ev["event_id"].iloc[i]))
    assert sorted(out["event_id"].tolist()) == sorted(keep)
    assert len(out) >= 1


def test_funnel_matches_per_user_greedy_scan():
    from texel_ray.pipelines.relational import (
        _FUNNEL_STAGES,
        q_funnel_conversion,
    )

    out = q_funnel_conversion(SF_DIR).to_pandas().set_index("stage")
    ev = _events().sort_values(["user_id", "ts_us", "event_id"])
    counts = [0] * len(_FUNNEL_STAGES)
    for _, g in ev.groupby("user_id"):
        stage = 0
        for row in g.itertuples():
            if stage < len(_FUNNEL_STAGES) and row.event_type == _FUNNEL_STAGES[stage]:
                stage += 1
        # greedy scan: the earliest match per stage is what a single
        # forward pass takes, which is exactly the kernel's semantics
        for k in range(stage):
            counts[k] += 1
    for k, n in enumerate(counts):
        assert int(out.loc[k, "n_users"]) == n
    assert counts[0] >= counts[1] >= counts[2]


def test_grouped_median_quantile_rule():
    from texel_ray.pipelines.relational import q_grouped_median

    out = q_grouped_median(SF_DIR).to_pandas().set_index("event_type")
    ev = _events()
    for typ, g in ev.groupby("event_type"):
        v = np.sort(g["cents"].to_numpy())
        for col, q in (
            ("p25_cents", 0.25),
            ("median_cents", 0.5),
            ("p75_cents", 0.75),
        ):
            k = int(np.ceil(q * len(v)))
            assert int(out.loc[typ, col]) == int(v[k - 1])
        assert int(out.loc[typ, "n"]) == len(v)


def test_upsert_latest_matches_pandas():
    from texel_ray.pipelines.relational import q_upsert_latest

    out = q_upsert_latest(SF_DIR).to_pandas().set_index("event_type")
    ev = _events().sort_values(["ts_us", "event_id"])
    latest = ev.groupby(["user_id", "event_type"], sort=False).last()
    ref = latest.groupby("event_type")["cents"].agg(["size", "sum"])
    for typ in ref.index:
        assert int(out.loc[typ, "n_keys"]) == int(ref.loc[typ, "size"])
        assert int(out.loc[typ, "sum_latest_cents"]) == int(ref.loc[typ, "sum"])


def test_cohort_retention_matches_pandas():
    from texel_ray.pipelines.relational import q_cohort_retention

    out = q_cohort_retention(SF_DIR).to_pandas()
    ev = _events()
    WEEK = 7 * 86400 * 1_000_000
    uw = (
        ev.assign(week=ev["ts_us"] // WEEK)[["user_id", "week"]]
        .drop_duplicates()
    )
    uw["cohort"] = uw.groupby("user_id")["week"].transform("min")
    ref = (
        uw.groupby([uw["cohort"], uw["week"] - uw["cohort"]])
        .size()
        .rename_axis(["cohort_week", "week_offset"])
        .reset_index(name="n_users")
    )
    got = out.sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    ref = ref.sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    assert got["n_users"].tolist() == ref["n_users"].tolist()
    assert got[["cohort_week", "week_offset"]].values.tolist() == ref[
        ["cohort_week", "week_offset"]
    ].values.tolist()
    # offset-0 row of each cohort counts every user of that cohort
    assert (got[got.week_offset == 0].n_users > 0).all()


def _tile_counts_z(zoom: int) -> dict[tuple[int, int], int]:
    # tile assignment itself is pinned by the tile_assign_* SQL oracles;
    # these tests verify the lattice statistics built on top of it
    from texel_ray.stages.tiles import encode_tiles

    path = ensure_images_for_sf_dir(SF_DIR)
    t = pq.read_table(path, columns=["lon", "lat"])
    enc = encode_tiles(t, "WebMercatorQuad", (zoom,), keep_columns=[])
    counts: dict[tuple[int, int], int] = {}
    for x, y in zip(
        enc["tile_x"].to_numpy().tolist(), enc["tile_y"].to_numpy().tolist()
    ):
        counts[(x, y)] = counts.get((x, y), 0) + 1
    return counts


def test_contour_census_matches_dense_marching():
    from texel_ray.pipelines.queries import q_contour_segments

    thresh = 3
    out = q_contour_segments(SF_DIR, zoom=8, thresh=thresh).to_pandas()
    counts = _tile_counts_z(8)
    hot = {k for k, n in counts.items() if n >= thresh}
    cases: dict[int, int] = {}
    cells = {(x - dx, y - dy) for x, y in hot for dx in (0, 1) for dy in (0, 1)}
    for cx, cy in cells:
        case = sum(
            1 << (dx + 2 * dy)
            for dx in (0, 1)
            for dy in (0, 1)
            if (cx + dx, cy + dy) in hot
        )
        if 1 <= case <= 14:
            cases[case] = cases.get(case, 0) + 1
    got = dict(zip(out["case_idx"].tolist(), out["n_cells"].tolist()))
    assert got == cases
    for r in out.itertuples():
        expect = 2 if r.case_idx in (5, 10) else 1
        assert r.n_segments == r.n_cells * expect


def test_variogram_matches_brute_pairs():
    from texel_ray.pipelines.queries import _VARIOGRAM_OFFSETS, q_variogram_tiles

    out = q_variogram_tiles(SF_DIR, zoom=6).to_pandas().set_index("lag2")
    counts = _tile_counts_z(6)
    ref: dict[int, list[int]] = {}
    for (x, y), n in counts.items():
        for dx, dy in _VARIOGRAM_OFFSETS:
            other = counts.get((x + dx, y + dy))
            if other is not None:
                d = n - other
                acc = ref.setdefault(dx * dx + dy * dy, [0, 0])
                acc[0] += 1
                acc[1] += d * d
    assert set(out.index) == set(ref)
    for lag2, (n_pairs, sse) in ref.items():
        assert int(out.loc[lag2, "n_pairs"]) == n_pairs
        assert int(out.loc[lag2, "sse"]) == sse
        assert int(out.loc[lag2, "gamma_fp"]) == (sse * 1_000_000) // (2 * n_pairs)


def test_pagerank_matches_dense_power_iteration():
    from texel_ray.pipelines.queries import q_pagerank_tiles

    out = q_pagerank_tiles(SF_DIR, zoom=6, iters=3).to_pandas()
    counts = _tile_counts_z(6)
    occ = set(counts)
    rook = ((1, 0), (-1, 0), (0, 1), (0, -1))
    deg = {
        k: sum((k[0] + dx, k[1] + dy) in occ for dx, dy in rook) for k in occ
    }
    r = {k: 1_000_000 for k in occ}
    for _ in range(3):
        inc = {k: 0 for k in occ}
        for k in occ:
            if deg[k]:
                share = r[k] // deg[k]
                for dx, dy in rook:
                    nb = (k[0] + dx, k[1] + dy)
                    if nb in occ:
                        inc[nb] += share
        r = {k: 150_000 + (85 * s) // 100 for k, s in inc.items()}
    got = {
        (int(t.tile_x), int(t.tile_y)): int(t.pr_fp) for t in out.itertuples()
    }
    assert got == r
    # high-degree interior tiles outrank isolated ones
    assert max(r.values()) > 150_000


def test_grouped_mode_matches_pandas():
    from texel_ray.pipelines.relational import q_grouped_mode

    out = q_grouped_mode(SF_DIR).to_pandas().set_index("event_type")
    ev = _events()
    for typ, g in ev.groupby("event_type"):
        vc = g["cents"].value_counts()
        top = vc.max()
        expect = min(v for v, n in vc.items() if n == top)
        assert int(out.loc[typ, "mode_cents"]) == int(expect)
        assert int(out.loc[typ, "n_mode"]) == int(top)


def test_tile_gradient_matches_dense_horn():
    from texel_ray.pipelines.queries import q_tile_gradient

    out = q_tile_gradient(SF_DIR, zoom=8).to_pandas()
    counts = _tile_counts_z(8)
    got = {
        (int(r.tile_x), int(r.tile_y)): (int(r.gx), int(r.gy), int(r.g2))
        for r in out.itertuples()
    }
    assert set(got) == set(counts)
    for (x, y) in list(counts)[:200]:
        z = lambda dx, dy: counts.get((x + dx, y + dy), 0)
        gx = (z(1, -1) + 2 * z(1, 0) + z(1, 1)) - (
            z(-1, -1) + 2 * z(-1, 0) + z(-1, 1)
        )
        gy = (z(-1, 1) + 2 * z(0, 1) + z(1, 1)) - (
            z(-1, -1) + 2 * z(0, -1) + z(1, -1)
        )
        assert got[(x, y)] == (gx, gy, gx * gx + gy * gy)


def test_tile_bfs_dist_matches_reference_bfs():
    from collections import deque

    from texel_ray.pipelines.queries import q_tile_bfs_dist

    thresh, hops = 2, 6
    out = q_tile_bfs_dist(SF_DIR, zoom=6, thresh=thresh, max_hops=hops).to_pandas()
    counts = _tile_counts_z(6)
    occ = set(counts)
    dist = {k: 0 for k, n in counts.items() if n >= thresh}
    q = deque(dist)
    while q:
        k = q.popleft()
        if dist[k] >= hops:
            continue
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (k[0] + dx, k[1] + dy)
            if nb in occ and nb not in dist:
                dist[nb] = dist[k] + 1
                q.append(nb)
    got = {(int(r.tile_x), int(r.tile_y)): int(r.dist) for r in out.itertuples()}
    assert set(got) == occ
    for k in occ:
        assert got[k] == dist.get(k, -1)
    assert any(v > 0 for v in got.values())  # frontier actually expanded


def test_gini_tiles_formula():
    from texel_ray.pipelines.queries import q_gini_tiles

    out = q_gini_tiles(SF_DIR, zoom=6).iloc[0]
    counts = _tile_counts_z(6)
    y = sorted(counts.values())
    m, total = len(y), sum(y)
    ranked = sum(i * v for i, v in enumerate(y, start=1))
    num = 2 * ranked - (m + 1) * total
    assert int(out.n_tiles) == m
    assert int(out.gini_num) == num
    assert int(out.gini_den) == m * total
    assert 0 <= out.gini_fp < 1_000_000  # a valid Gini in [0, 1)


def test_tile_trend_matches_pandas_lsq():
    from texel_ray.pipelines.queries import _tile_sql  # noqa: F401 (zoom parity)
    from texel_ray.pipelines.relational import _event_geo_np, q_tile_trend
    from texel_ray.stages.tiles import encode_tiles
    import pyarrow as pa

    out = q_tile_trend(SF_DIR, zoom=6).to_pandas()
    ev = _events()
    lon, lat = _event_geo_np(
        ev["user_id"].to_numpy(), ev["event_id"].to_numpy()
    )
    t = pa.table(
        {
            "lon": pa.array(lon),
            "lat": pa.array(lat),
            "day": pa.array(ev["ts_us"].to_numpy() // (86400 * 1_000_000)),
        }
    )
    enc = encode_tiles(t, "WebMercatorQuad", (6,), keep_columns=["day"]).to_pandas()
    daily = (
        enc.groupby(["tile_x", "tile_y", "day"]).size().reset_index(name="c")
    )
    got = {
        (int(r.tile_x), int(r.tile_y)): (
            int(r.n_days),
            int(r.slope_num),
            int(r.slope_den),
        )
        for r in out.itertuples()
    }
    seen = set()
    for (x, y), g in daily.groupby(["tile_x", "tile_y"]):
        if len(g) < 2:
            assert (x, y) not in got
            continue
        seen.add((int(x), int(y)))
        d = g["day"].to_numpy().astype(int)
        c = g["c"].to_numpy().astype(int)
        n = len(g)
        num = n * int((d * c).sum()) - int(d.sum()) * int(c.sum())
        den = n * int((d * d).sum()) - int(d.sum()) ** 2
        assert got[(int(x), int(y))] == (n, num, den)
        # cross-check against float least squares
        slope = np.polyfit(d.astype(float), c.astype(float), 1)[0]
        assert abs(slope - num / den) < 1e-9
    assert seen == set(got)


def test_chi2_assoc_matches_crosstab_recompute():
    from texel_ray.pipelines.relational import q_chi2_assoc

    out = q_chi2_assoc(SF_DIR)
    ev = _events()
    ev["dow"] = (ev["ts_us"] // (86400 * 1_000_000)) % 7
    ct = ev.groupby(["event_type", "dow"]).size()
    row = ev.groupby("event_type").size()
    col = ev.groupby("dow").size()
    n = len(ev)
    got = {
        (r.event_type, int(r.dow)): (int(r.o), int(r.en_num), int(r.term_fp))
        for r in out.itertuples()
    }
    assert set(got) == set(ct.index)
    for (typ, dow), o in ct.items():
        r, c = int(row[typ]), int(col[dow])
        dev = int(o) * n - r * c
        assert got[(typ, int(dow))] == (
            int(o),
            r * c,
            (dev * dev * 1_000_000) // (r * c * n),
        )
    # the statistic is a real sum of non-negative contributions
    assert out["term_fp"].ge(0).all() and out["term_fp"].sum() > 0


def test_changepoint_days_matches_cusum_scan():
    from texel_ray.pipelines.relational import q_changepoint_days

    out = q_changepoint_days(SF_DIR).set_index("event_type")
    ev = _events()
    ev["day"] = ev["ts_us"] // (86400 * 1_000_000)
    for typ, g in ev.groupby("event_type"):
        daily = g.groupby("day").size().sort_index()
        days = daily.index.to_numpy()
        c = daily.to_numpy()
        n = len(days)
        if n < 2:
            assert typ not in out.index
            continue
        best = None
        pre = 0
        tot = int(c.sum())
        for k in range(1, n):  # split after day[k-1]
            pre += int(c[k - 1])
            s = n * pre - k * tot
            if best is None or abs(s) > best[0]:
                best = (abs(s), int(days[k - 1]), s)
        assert int(out.loc[typ, "n_days"]) == n
        assert int(out.loc[typ, "split_day"]) == best[1]
        assert int(out.loc[typ, "s_max"]) == best[2]
        assert int(out.loc[typ, "s_abs"]) == best[0]


def test_acf_daily_matches_pair_recompute():
    from texel_ray.pipelines.relational import q_acf_daily

    out = q_acf_daily(SF_DIR).set_index("lag_d")
    ev = _events()
    ev["day"] = ev["ts_us"] // (86400 * 1_000_000)
    daily = ev.groupby("day").size()
    cnt = {int(d): int(v) for d, v in daily.items()}
    for lag in (1, 2, 3):
        pairs = [(v, cnt[d + lag]) for d, v in cnt.items() if d + lag in cnt]
        if not pairs:
            assert lag not in out.index
            continue
        a = np.array([p[0] for p in pairs], dtype=np.int64)
        b = np.array([p[1] for p in pairs], dtype=np.int64)
        assert int(out.loc[lag, "n_pairs"]) == len(pairs)
        assert int(out.loc[lag, "sx"]) == int(a.sum())
        assert int(out.loc[lag, "sy"]) == int(b.sum())
        assert int(out.loc[lag, "sxy"]) == int((a * b).sum())
        assert int(out.loc[lag, "sxx"]) == int((a * a).sum())
        assert int(out.loc[lag, "syy"]) == int((b * b).sum())


def test_spearman_tiles_matches_pandas_ranks():
    from texel_ray.pipelines.queries import q_spearman_tiles
    from texel_ray.stages.tiles import encode_tiles

    out = q_spearman_tiles(SF_DIR, zoom=6).iloc[0]
    path = ensure_images_for_sf_dir(SF_DIR)
    t = pq.read_table(path, columns=["lon", "lat", "w"])
    enc = encode_tiles(t, "WebMercatorQuad", (6,), keep_columns=["w"]).to_pandas()
    per = enc.groupby(["tile_x", "tile_y"]).agg(
        n=("w", "size"), sw=("w", "sum")
    )
    rx = (per["n"].rank(method="average") * 2).astype(np.int64).to_numpy()
    ry = (per["sw"].rank(method="average") * 2).astype(np.int64).to_numpy()
    n = len(per)
    sx, sy = int(rx.sum()), int(ry.sum())
    num = n * int((rx * ry).sum()) - sx * sy
    den_x = n * int((rx * rx).sum()) - sx * sx
    den_y = n * int((ry * ry).sum()) - sy * sy
    assert int(out.n_tiles) == n
    assert int(out.rho_num) == num
    assert int(out.den_x) == den_x
    assert int(out.den_y) == den_y
    rho2 = (1 if num >= 0 else -1) * ((num * num * 1_000_000) // (den_x * den_y))
    assert int(out.rho2_fp) == rho2
    # density and payload width are positively coupled in the synthetic corpus
    assert den_x > 0 and den_y > 0


def test_tile_cost_dist_matches_bounded_bellman_ford():
    from texel_ray.pipelines.queries import q_tile_cost_dist

    thresh, rounds = 2, 8
    out = q_tile_cost_dist(SF_DIR, zoom=6, thresh=thresh, rounds=rounds).to_pandas()
    counts = _tile_counts_z(6)
    w = {k: 1 + n for k, n in counts.items()}
    dist = {k: 0 for k, n in counts.items() if n >= thresh}
    for _ in range(rounds):
        nxt = dict(dist)
        for (x, y), d in dist.items():
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                nb = (x + dx, y + dy)
                if nb in w and d + w[nb] < nxt.get(nb, 1 << 62):
                    nxt[nb] = d + w[nb]
        dist = nxt
    got = {(int(r.tile_x), int(r.tile_y)): int(r.d) for r in out.itertuples()}
    assert set(got) == set(counts)
    for k in counts:
        assert got[k] == dist.get(k, -1)
    assert any(v > 0 for v in got.values())


def test_mannwhitney_u_matches_scipy_free_ranks():
    from texel_ray.pipelines.relational import q_mannwhitney_u

    out = q_mannwhitney_u(SF_DIR).set_index("event_type")
    ev = _events()
    # tie-averaged ranks over the combined sample, doubled to stay integer
    r2 = (ev["cents"].rank(method="average") * 2).astype(np.int64)
    for typ, g in ev.groupby("event_type"):
        n_t = len(g)
        r2_sum = int(r2[g.index].sum())
        assert int(out.loc[typ, "n_t"]) == n_t
        assert int(out.loc[typ, "r2_sum"]) == r2_sum
        assert int(out.loc[typ, "u2"]) == r2_sum - n_t * (n_t + 1)
    # U + U' symmetry: sum of all one-vs-rest 2U values equals
    # 2 * sum over unordered type pairs of n_a*n_b  (each cross pair is
    # counted once from each side)
    sizes = ev.groupby("event_type").size()
    cross = int(sizes.sum()) ** 2 - int((sizes**2).sum())
    assert int(out["u2"].sum()) == cross


def test_ks_stat_matches_cdf_scan():
    from texel_ray.pipelines.relational import q_ks_stat

    out = q_ks_stat(SF_DIR).set_index("event_type")
    ev = _events()
    vals = np.sort(ev["cents"].unique())
    for typ in ev["event_type"].unique():
        a = ev.loc[ev["event_type"] == typ, "cents"].to_numpy()
        b = ev.loc[ev["event_type"] != typ, "cents"].to_numpy()
        cum_a = np.searchsorted(np.sort(a), vals, side="right")
        cum_b = np.searchsorted(np.sort(b), vals, side="right")
        dn = np.abs(cum_a * len(b) - cum_b * len(a))
        i = int(np.lexsort((vals, -dn))[0])
        assert int(out.loc[typ, "n_t"]) == len(a)
        assert int(out.loc[typ, "n_rest"]) == len(b)
        assert int(out.loc[typ, "d_num"]) == int(dn[i])
        assert int(out.loc[typ, "at_cents"]) == int(vals[i])


def test_theil_sen_matches_fraction_median():
    from fractions import Fraction

    from texel_ray.pipelines.relational import (
        _TS_LCM,
        _TS_MAX_GAP,
        q_theil_sen_daily,
    )

    out = q_theil_sen_daily(SF_DIR).set_index("event_type")
    ev = _events()
    ev["day"] = ev["ts_us"] // (86400 * 1_000_000)
    for typ, g in ev.groupby("event_type"):
        daily = g.groupby("day").size().sort_index()
        days = daily.index.to_numpy()
        c = daily.to_numpy()
        slopes = []
        for i in range(len(days)):
            for j in range(i + 1, len(days)):
                gap = int(days[j] - days[i])
                if gap <= _TS_MAX_GAP:
                    slopes.append(Fraction(int(c[j]) - int(c[i]), gap))
        slopes.sort()
        med = slopes[(len(slopes) - 1) // 2]
        key = med.numerator * _TS_LCM // med.denominator
        assert (med.numerator * _TS_LCM) % med.denominator == 0  # exact
        assert int(out.loc[typ, "n_pairs"]) == len(slopes)
        assert int(out.loc[typ, "slope_lkey"]) == key


def test_agg_rollup_levels_are_consistent():
    from texel_ray.pipelines.relational import q_agg_rollup

    out = q_agg_rollup(SF_DIR)
    fine = out[(out.l_returnflag != "ALL") & (out.l_linestatus != "ALL")]
    lvl1 = out[(out.l_returnflag != "ALL") & (out.l_linestatus == "ALL")]
    lvl0 = out[(out.l_returnflag == "ALL") & (out.l_linestatus == "ALL")]
    assert len(lvl0) == 1
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet",
                       columns=["l_returnflag", "l_quantity"]).to_pandas()
    assert int(lvl0["n"].iloc[0]) == len(li)
    assert int(lvl0["qty_cents"].iloc[0]) == int(
        np.trunc(li["l_quantity"].to_numpy() * 100.0).astype(np.int64).sum()
    )
    for c in ("n", "qty_cents", "price_cents"):
        assert int(fine[c].sum()) == int(lvl0[c].iloc[0])
        assert int(lvl1[c].sum()) == int(lvl0[c].iloc[0])
    # per-flag level matches the fine level rolled up by hand
    got = lvl1.set_index("l_returnflag")["n"].to_dict()
    expect = fine.groupby("l_returnflag")["n"].sum().to_dict()
    assert got == expect


def test_image_edges_matches_per_pixel_loop():
    from texel_ray.core.imagecodec import decode_image
    from texel_ray.pipelines.mlprep import q_image_edges

    out = q_image_edges(SF_DIR).to_pandas().set_index("image_id")
    path = ensure_images_for_sf_dir(SF_DIR)
    t = pq.read_table(path, columns=["image_id", "bytes", "fmt"])
    n_checked = 0
    for iid, buf, fmt in zip(
        t["image_id"].to_pylist()[:500],
        t["bytes"].to_pylist()[:500],
        t["fmt"].to_pylist()[:500],
    ):
        img = decode_image(buf, fmt).astype(np.int64)
        h, w = img.shape[0], img.shape[1]
        luma = [
            [int(img[y, x, :].sum()) // 3 for x in range(w)] for y in range(h)
        ]
        es, em = 0, 0
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                gx = (
                    luma[y - 1][x + 1] + 2 * luma[y][x + 1] + luma[y + 1][x + 1]
                    - luma[y - 1][x - 1] - 2 * luma[y][x - 1] - luma[y + 1][x - 1]
                )
                gy = (
                    luma[y + 1][x - 1] + 2 * luma[y + 1][x] + luma[y + 1][x + 1]
                    - luma[y - 1][x - 1] - 2 * luma[y - 1][x] - luma[y - 1][x + 1]
                )
                e = abs(gx) + abs(gy)
                es += e
                em = max(em, e)
        assert int(out.loc[iid, "edge_sum"]) == es
        assert int(out.loc[iid, "edge_max"]) == em
        assert int(out.loc[iid, "n_px"]) == (h - 2) * (w - 2)
        n_checked += 1
    assert n_checked == 500


def test_max_concurrency_matches_full_sort_sweep():
    from texel_ray.pipelines.relational import _SWEEP_DUR_US, q_max_concurrency

    out = q_max_concurrency(SF_DIR).iloc[0]
    ev = _events()
    t0 = ev["ts_us"].to_numpy()
    deltas = sorted(
        [(int(t), 1) for t in t0] + [(int(t) + _SWEEP_DUR_US, -1) for t in t0]
    )
    # collapse per unique t (the -1-before-+1 ordering makes row-level
    # and collapsed maxima identical for half-open intervals)
    per_t: dict[int, int] = {}
    for t, d in deltas:
        per_t[t] = per_t.get(t, 0) + d
    cum, best, at = 0, -1, None
    for t in sorted(per_t):
        cum += per_t[t]
        if cum > best:
            best, at = cum, t
    assert int(out.max_active) == best
    assert int(out.at_us) == at
    assert best >= 2  # the synthetic stream actually overlaps


def test_interval_union_matches_merge_intervals():
    from texel_ray.pipelines.relational import (
        _SWEEP_DUR_US,
        q_interval_union_len,
    )

    out = q_interval_union_len(SF_DIR).iloc[0]
    ev = _events()
    iv = sorted((int(t), int(t) + _SWEEP_DUR_US) for t in ev["ts_us"])
    total, cur_s, cur_e = 0, None, None
    for s, e in iv:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    total += cur_e - cur_s
    assert int(out.union_us) == total
    assert int(out.n_intervals) == len(ev)
    assert 0 < total <= (iv[-1][1] - iv[0][0])


def test_triangle_regions_matches_brute_enumeration():
    from texel_ray.pipelines.relational import _event_geo_np, q_triangle_regions
    from texel_ray.sources.regions import regions_parquet_path

    out = q_triangle_regions(SF_DIR)
    ev = _events()
    lon, lat = _event_geo_np(
        ev["user_id"].to_numpy(), ev["event_id"].to_numpy()
    )
    regs = pq.read_table(regions_parquet_path()).to_pandas()
    regs = regs[regs["kind"] == "rect"].sort_values("region_id")
    user_regions: dict[int, set] = {}
    for u, lo, la in zip(ev["user_id"], lon, lat):
        for r in regs.itertuples():
            if r.minx <= lo <= r.maxx and r.miny <= la <= r.maxy:
                user_regions.setdefault(int(u), set()).add(int(r.region_id))
                break  # min region_id wins (sorted)
    edges = set()
    for rs in user_regions.values():
        rl = sorted(rs)
        for i in range(len(rl)):
            for j in range(i + 1, len(rl)):
                edges.add((rl[i], rl[j]))
    verts = sorted({v for e in edges for v in e})
    tri: dict[int, int] = {}
    for i, a in enumerate(verts):
        for b in verts[i + 1:]:
            if (a, b) not in edges:
                continue
            for c in verts:
                if c > b and (a, c) in edges and (b, c) in edges:
                    for v in (a, b, c):
                        tri[v] = tri.get(v, 0) + 1
    got = dict(zip(out["region_id"].tolist(), out["n_tri"].tolist()))
    assert got == tri


def test_quadtree_agg_invariants_and_counts():
    from texel_ray.pipelines.queries import q_quadtree_agg

    cap = 40
    out = q_quadtree_agg(SF_DIR, z_min=4, z_max=8, cap=cap)
    # leaves tile the point set exactly once: counts sum to the corpus
    counts8 = _tile_counts_z(8)
    assert int(out["n"].sum()) == sum(counts8.values())
    # no leaf above cap unless at z_max
    assert (out[(out.tm_id < 8)]["n"] <= cap).all()
    # every z8 leaf's ancestors were all hot: recompute by halving
    lvl = {8: dict(counts8)}
    for z in range(7, 3, -1):
        up: dict = {}
        for (x, y), n in lvl[z + 1].items():
            up[(x // 2, y // 2)] = up.get((x // 2, y // 2), 0) + n
        lvl[z] = up
    for r in out.itertuples():
        z, x, y = int(r.tm_id), int(r.tile_x), int(r.tile_y)
        assert lvl[z][(x, y)] == int(r.n)
        for a in range(4, z):
            shift = 2 ** (z - a)
            assert lvl[a][(x // shift, y // shift)] > cap
    # leaves are disjoint: no leaf is an ancestor of another
    leafset = {(int(r.tm_id), int(r.tile_x), int(r.tile_y)) for r in out.itertuples()}
    for z, x, y in leafset:
        for a in range(4, z):
            shift = 2 ** (z - a)
            assert (a, x // shift, y // shift) not in leafset
    # adaptivity actually happened (multiple depths present)
    assert out["tm_id"].nunique() >= 2


def test_benford_digits_matches_string_leading():
    from texel_ray.pipelines.relational import q_benford_digits

    out = q_benford_digits(SF_DIR).to_pandas()
    ev = _events()
    pos = ev[ev["cents"] > 0].copy()
    pos["digit"] = pos["cents"].astype(str).str[0].astype(np.int64)
    ref = pos.groupby(["event_type", "digit"]).size()
    got = {
        (r.event_type, int(r.digit)): int(r.n) for r in out.itertuples()
    }
    assert got == {(t, int(d)): int(n) for (t, d), n in ref.items()}
    assert set(out["digit"].unique()) <= set(range(1, 10))


def test_grouped_mad_matches_numpy():
    from texel_ray.pipelines.relational import q_grouped_mad

    out = q_grouped_mad(SF_DIR).to_pandas().set_index("event_type")
    ev = _events()
    for typ, g in ev.groupby("event_type"):
        v = np.sort(g["cents"].to_numpy())
        k = -(-len(v) // 2)
        med = int(v[k - 1])
        dev = np.sort(np.abs(g["cents"].to_numpy() - med))
        mad = int(dev[k - 1])
        assert int(out.loc[typ, "median_cents"]) == med
        assert int(out.loc[typ, "mad_cents"]) == mad
        assert int(out.loc[typ, "n"]) == len(v)


def test_trimmed_mean_matches_sorted_slice():
    from texel_ray.pipelines.relational import q_trimmed_mean

    out = q_trimmed_mean(SF_DIR).to_pandas().set_index("event_type")
    ev = _events()
    for typ, g in ev.groupby("event_type"):
        v = np.sort(g["cents"].to_numpy())
        k = len(v) * 10 // 100
        kept = v[k: len(v) - k]
        assert int(out.loc[typ, "n_kept"]) == len(kept)
        assert int(out.loc[typ, "sum_kept_cents"]) == int(kept.sum())
        assert int(out.loc[typ, "n"]) == len(v)


def test_shard_assign_ring_semantics():
    from texel_ray.pipelines.relational import (
        _SHARD_N,
        _fold_hash,
        _shard_ring,
        q_shard_assign,
    )

    out = q_shard_assign(SF_DIR).to_pandas().set_index("shard")
    ev = _events()
    pos, shard = _shard_ring()
    # scalar re-derivation of the ring successor per distinct user
    ref: dict[int, set] = {}
    ref_ev: dict[int, int] = {}
    for u in ev["user_id"]:
        h = int(_fold_hash(np.array([u]), 1 << 31)[0])
        i = 0
        while i < len(pos) and pos[i] < h:
            i += 1
        s = int(shard[i % len(pos)])
        ref.setdefault(s, set()).add(int(u))
        ref_ev[s] = ref_ev.get(s, 0) + 1
    assert set(out.index) == set(ref)
    for s in ref:
        assert int(out.loc[s, "n_users"]) == len(ref[s])
        assert int(out.loc[s, "n_events"]) == ref_ev[s]
    # every event lands somewhere; load is spread over multiple shards
    assert int(out["n_events"].sum()) == len(ev)
    assert len(out) >= _SHARD_N // 2


def test_k_anon_tiles_suppression():
    from texel_ray.pipelines.relational import _event_geo_np, q_k_anon_tiles
    from texel_ray.stages.tiles import encode_tiles

    k = 2
    out = q_k_anon_tiles(SF_DIR, zoom=8, k=k).to_pandas()
    ev = _events()
    lon, lat = _event_geo_np(ev["user_id"].to_numpy(), ev["event_id"].to_numpy())
    t = pa_table_from(lon, lat, ev["user_id"].to_numpy())
    enc = encode_tiles(t, "WebMercatorQuad", (8,), keep_columns=["user_id"]).to_pandas()
    ref = enc.groupby(["tile_x", "tile_y"])["user_id"].agg(["nunique", "size"])
    pub = ref[ref["nunique"] >= k]
    got = out.set_index(["tile_x", "tile_y"]).sort_index()
    assert set(got.index) == set(pub.index)
    for idx in pub.index:
        assert int(got.loc[idx, "n_users"]) == int(pub.loc[idx, "nunique"])
        assert int(got.loc[idx, "n_events"]) == int(pub.loc[idx, "size"])
    # suppression actually removed something
    assert len(pub) < len(ref)


def pa_table_from(lon, lat, uid):
    import pyarrow as pa

    return pa.table(
        {
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
            "user_id": pa.array(uid, pa.int64()),
        }
    )


def test_embedding_dim_stats_matches_numpy():
    from texel_ray.pipelines.mlprep import q_embedding_dim_stats

    out = q_embedding_dim_stats(SF_DIR).to_pandas().set_index("d").sort_index()
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    m = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64)
    m = np.floor(m.reshape(-1, 64) * 1_000_000.0).astype(np.int64)
    assert len(out) == 64
    assert (out["n"] == len(m)).all()
    assert out["sum_fp"].to_numpy().tolist() == m.sum(axis=0).tolist()
    assert out["min_fp"].to_numpy().tolist() == m.min(axis=0).tolist()
    assert out["max_fp"].to_numpy().tolist() == m.max(axis=0).tolist()


def test_ntile_buckets_matches_window_recompute():
    from texel_ray.pipelines.relational import q_ntile_buckets

    out = (
        q_ntile_buckets(SF_DIR)
        .to_pandas()
        .set_index(["o_orderpriority", "bucket"])
        .sort_index()
    )
    od = pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()
    od["cents"] = np.floor(od["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    for pri, g in od.groupby("o_orderpriority"):
        v = np.sort(g["cents"].to_numpy())
        n = len(v)
        base, extra = divmod(n, 4)
        start = 0
        for b in range(4):
            size = base + (1 if b < extra else 0)
            band = v[start : start + size]
            start += size
            assert int(out.loc[(pri, b + 1), "n"]) == size
            assert int(out.loc[(pri, b + 1), "sum_cents"]) == int(band.sum())


def test_cross_corr_daily_matches_pandas():
    from texel_ray.pipelines.relational import q_cross_corr_daily

    out = q_cross_corr_daily(SF_DIR).set_index("lag_d")
    ev = _events()
    day = ev["ts_us"].to_numpy() // (86400 * 1_000_000)
    x = pd.Series(day[ev["event_type"] == "click"]).value_counts()
    y = pd.Series(day[ev["event_type"] == "purchase"]).value_counts()
    for lag in range(0, 4):
        days = sorted(d for d in x.index if d + lag in y.index)
        if not days:
            assert lag not in out.index
            continue
        a = x.loc[days].to_numpy().astype(np.int64)
        b = y.loc[[d + lag for d in days]].to_numpy().astype(np.int64)
        assert int(out.loc[lag, "n_pairs"]) == len(days)
        assert int(out.loc[lag, "sxy"]) == int((a * b).sum())
        assert int(out.loc[lag, "sx"]) == int(a.sum())
        assert int(out.loc[lag, "syy"]) == int((b * b).sum())


def test_weighted_quantile_matches_repeat_expansion():
    from texel_ray.pipelines.relational import q_weighted_quantile

    out = q_weighted_quantile(SF_DIR).to_pandas().set_index("l_returnflag")
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pandas()
    li["cents"] = np.floor(li["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
    li["w"] = li["l_quantity"].to_numpy().astype(np.int64)
    for flag, g in li.groupby("l_returnflag"):
        # brute force: materialize each value w times, take the
        # ceil(q*W)-th smallest (1-based)
        expanded = np.sort(np.repeat(g["cents"].to_numpy(), g["w"].to_numpy()))
        W = len(expanded)
        assert int(out.loc[flag, "total_w"]) == W
        for name, q in (
            ("p25_cents", 0.25),
            ("median_cents", 0.5),
            ("p75_cents", 0.75),
        ):
            k = int(np.ceil(q * W))
            assert int(out.loc[flag, name]) == int(expanded[k - 1])


def test_raster_blobs_matches_flood_fill():
    from texel_ray.pipelines.queries import _tile_counts, q_raster_blobs

    out = q_raster_blobs(SF_DIR).set_index("blob_id").sort_index()
    counts = _tile_counts(SF_DIR, 8).to_pandas()
    counts = counts[counts["n"] >= 2]
    cells = {
        (int(x), int(y)): int(n)
        for x, y, n in zip(counts["tile_x"], counts["tile_y"], counts["n"])
    }
    seen = set()
    blobs = {}
    for c in cells:
        if c in seen:
            continue
        stack, comp = [c], []
        seen.add(c)
        while stack:
            x, y = stack.pop()
            comp.append((x, y))
            for nb in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
                if nb in cells and nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        key = min(x * 65536 + y for x, y in comp)
        blobs[key] = comp
    assert sorted(out.index.tolist()) == sorted(blobs)
    for key, comp in blobs.items():
        assert int(out.loc[key, "n_cells"]) == len(comp)
        assert int(out.loc[key, "sum_n"]) == sum(cells[c] for c in comp)
        assert int(out.loc[key, "min_x"]) == min(x for x, _ in comp)
        assert int(out.loc[key, "max_y"]) == max(y for _, y in comp)


def test_allpairs_jaccard_complete_vs_bruteforce():
    from texel_ray.pipelines.mlprep import q_allpairs_jaccard
    from texel_ray.stages.dedup import jaccard, shingle_set

    out = q_allpairs_jaccard(SF_DIR).to_pandas()
    got = {
        (int(a), int(b)): j
        for a, b, j in zip(out["id_a"], out["id_b"], out["jaccard"])
    }
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    ids = docs["doc_id"].to_numpy()
    sets = [shingle_set(t, 3) for t in docs["text"]]
    want = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            s = jaccard(sets[i], sets[j])
            if s >= 0.75:
                a, b = sorted((int(ids[i]), int(ids[j])))
                want[(a, b)] = s
    # prefix filtering must be COMPLETE: exact same pair set, same values
    assert got == want
    assert len(want) >= 1


def test_hilbert_order_partitions_are_contiguous_and_balanced():
    from texel_ray.core.morton import hilbert_xy2d
    from texel_ray.pipelines.queries import _tile_counts, q_hilbert_order

    out = q_hilbert_order(SF_DIR).sort_values("part").reset_index(drop=True)
    counts = _tile_counts(SF_DIR, 8).to_pandas()
    total = int(counts["n"].sum())
    # NTILE sizing: first (total % 16) partitions hold ceil, rest floor
    base, extra = divmod(total, 16)
    want_sizes = [base + (1 if p < extra else 0) for p in range(16)]
    assert out["n"].tolist() == want_sizes
    # index ranges are non-overlapping except possibly at shared
    # boundary cells, and increase monotonically
    nonempty = out[out["n"] > 0]
    for i in range(1, len(nonempty)):
        assert nonempty["min_h"].iloc[i] >= nonempty["max_h"].iloc[i - 1]
    # every occupied cell's index falls inside its partition's range
    h = hilbert_xy2d(
        8, counts["tile_x"].to_numpy(), counts["tile_y"].to_numpy()
    )
    assert h.min() >= int(nonempty["min_h"].iloc[0])
    assert h.max() <= int(nonempty["max_h"].iloc[-1])
    # hilbert bijectivity on the lattice: distinct cells, distinct idx
    assert len(np.unique(h)) == len(h)


def test_dwell_time_matches_per_user_scan():
    from texel_ray.pipelines.relational import (
        _event_pos_region_batch,
        q_dwell_time,
    )
    import pyarrow as pa

    out = q_dwell_time(SF_DIR).to_pandas().set_index("region").sort_index()
    ev = pq.read_table(f"{SF_DIR}/events.parquet")
    tagged = _event_pos_region_batch(ev).to_pandas()
    want = {}
    for _, g in tagged.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        reg = g["region"].to_numpy()
        ts = g["ts_us"].to_numpy()
        for i in range(1, len(g)):
            if reg[i] == reg[i - 1] != -1:
                r = int(reg[i])
                n, d = want.get(r, (0, 0))
                want[r] = (n + 1, d + int(ts[i] - ts[i - 1]))
    assert sorted(out.index.tolist()) == sorted(want)
    for r, (n, d) in want.items():
        assert int(out.loc[r, "n_stays"]) == n
        assert int(out.loc[r, "dwell_us"]) == d


def test_border_crossings_matches_per_user_scan():
    from texel_ray.pipelines.relational import (
        _event_geo_np,
        _rect_regions,
        q_border_crossings,
    )

    out = (
        q_border_crossings(SF_DIR).to_pandas().set_index("region").sort_index()
    )
    ev = _events()
    rid, minx, miny, maxx, maxy = _rect_regions()
    want = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        lon, lat = _event_geo_np(g["user_id"].to_numpy(), g["event_id"].to_numpy())
        for i in range(1, len(g)):
            for j, r in enumerate(rid):
                pin = (
                    minx[j] <= lon[i - 1] <= maxx[j]
                    and miny[j] <= lat[i - 1] <= maxy[j]
                )
                cin = minx[j] <= lon[i] <= maxx[j] and miny[j] <= lat[i] <= maxy[j]
                if pin != cin:
                    e, x = want.get(int(r), (0, 0))
                    want[int(r)] = (e + (1 if cin else 0), x + (1 if pin else 0))
    assert sorted(out.index.tolist()) == sorted(want)
    for r, (e, x) in want.items():
        assert int(out.loc[r, "n_enter"]) == e
        assert int(out.loc[r, "n_exit"]) == x


def test_spatial_downsample_cap_and_determinism():
    from texel_ray.pipelines.queries import _tile_counts, q_spatial_downsample
    from texel_ray.pipelines.relational import _fold_hash

    out = q_spatial_downsample(SF_DIR).to_pandas()
    per_tile = out.groupby(["tile_x", "tile_y"]).size()
    assert per_tile.max() <= 4
    counts = _tile_counts(SF_DIR, 8).to_pandas().set_index(["tile_x", "tile_y"])
    # every occupied tile keeps min(n, cap) images
    assert len(per_tile) == len(counts)
    for (tx, ty), k in per_tile.items():
        assert k == min(int(counts.loc[(tx, ty), "n"]), 4)
    # the kept set per tile is the hash-rank prefix: re-running with a
    # brute recompute on one tile agrees
    ens = ensure_images_for_sf_dir(SF_DIR)
    tx, ty = per_tile.index[0]
    import pyarrow.compute as pc
    import pyarrow.parquet as pq2

    from texel_ray.sources.images import images_parquet_path
    from texel_ray.stages.tiles import encode_tiles

    imgs = pq2.read_table(
        images_parquet_path(SF_DIR), columns=["image_id", "lon", "lat"]
    )
    enc = encode_tiles(imgs, "WebMercatorQuad", (8,), keep_columns=["image_id"])
    mask = pc.and_(pc.equal(enc["tile_x"], tx), pc.equal(enc["tile_y"], ty))
    sub = enc.filter(mask)
    ids = pc.utf8_slice_codeunits(sub["image_id"], 3).cast("int64").to_numpy()
    h = _fold_hash(ids, 1 << 31)
    want = set(ids[np.lexsort((ids, h))][:4].tolist())
    got = set(
        out[(out["tile_x"] == tx) & (out["tile_y"] == ty)]["img"].tolist()
    )
    assert got == want


def test_video_scene_cuts_matches_plain_recompute():
    from texel_ray.core.imagecodec import decode_image
    from texel_ray.pipelines.mlprep import q_video_scene_cuts
    from texel_ray.sources.video import decode_sfv, ensure_video_for_sf_dir

    out = (
        q_video_scene_cuts(SF_DIR).to_pandas().set_index("video_id").sort_index()
    )
    t = pq.read_table(ensure_video_for_sf_dir(SF_DIR))
    assert len(out) == len(t)
    for vid, buf in zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()):
        frames, _w, _h, _fps = decode_sfv(buf)
        imgs = [decode_image(b, "png").astype(np.int64) for b in frames]
        sads = [
            int(np.abs(imgs[i] - imgs[i - 1]).sum()) for i in range(1, len(imgs))
        ]
        cuts = [i + 1 for i, s in enumerate(sads) if s >= 13000]
        assert int(out.loc[vid, "n_frames"]) == len(frames)
        assert int(out.loc[vid, "n_cuts"]) == len(cuts)
        assert int(out.loc[vid, "first_cut"]) == (cuts[0] if cuts else -1)
        assert int(out.loc[vid, "total_sad"]) == sum(sads)


def test_tpch_q3_matches_pandas_recompute():
    from texel_ray.pipelines.relational import q_tpch_q3

    out = q_tpch_q3(SF_DIR)
    cu = pq.read_table(f"{SF_DIR}/customer.parquet").to_pandas()
    od = pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pandas()
    cut = pd.Timestamp("1998-06-01")
    keys = set(cu[cu["c_mktsegment"] == "BUILDING"]["c_custkey"])
    od = od[(od["o_custkey"].isin(keys)) & (od["o_orderdate"] < cut)]
    li = li[li["l_shipdate"] > cut].copy()
    li["rev"] = np.trunc(
        li["l_extendedprice"].to_numpy() * (1.0 - li["l_discount"].to_numpy()) * 100.0
    ).astype(np.int64)
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["odate_us"] = j["o_orderdate"].astype("datetime64[us]").astype(np.int64)
    agg = (
        j.groupby(["l_orderkey", "odate_us"])["rev"].sum().reset_index()
        .sort_values(["rev", "odate_us", "l_orderkey"], ascending=[False, True, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert out["l_orderkey"].tolist() == agg["l_orderkey"].tolist()
    assert out["rev_cents"].tolist() == agg["rev"].tolist()
    assert out["odate_us"].tolist() == agg["odate_us"].tolist()


def test_gap_fill_daily_matches_plain_scan():
    from texel_ray.pipelines.relational import q_gap_fill_daily

    out = q_gap_fill_daily(SF_DIR).set_index("event_type")
    ev = _events()
    day = ev["ts_us"].to_numpy() // (86400 * 1_000_000)
    d0, d1 = int(day.min()), int(day.max())
    for typ, g in ev.groupby("event_type"):
        counts = pd.Series(
            g["ts_us"].to_numpy() // (86400 * 1_000_000)
        ).value_counts()
        last, total, obs = 0, 0, 0
        for d in range(d0, d1 + 1):
            if d in counts.index:
                last = int(counts[d])
                obs += 1
            total += last
        assert int(out.loc[typ, "n_days"]) == d1 - d0 + 1
        assert int(out.loc[typ, "n_observed"]) == obs
        assert int(out.loc[typ, "sum_filled"]) == total


def test_s2_compact_lossless_and_minimal():
    from texel_ray.core import s2
    from texel_ray.pipelines.mlprep import q_s2_compact
    from texel_ray.sources.images import images_parquet_path
    from texel_ray.stages.tiles import encode_s2

    out = q_s2_compact(SF_DIR)
    ids = out["s2_cell"].to_numpy().view(np.uint64)
    lvl = out["lvl"].to_numpy()
    assert (lvl <= 8).all() and (lvl >= 0).all()
    # expand every compacted cell back to level-8 descendants: the union
    # must equal the original occupied set exactly (lossless), with no
    # overlap (sum of 4^(8-lvl) == len(original))
    imgs = pq.read_table(images_parquet_path(SF_DIR), columns=["lon", "lat"])
    enc = encode_s2(imgs, level=8, keep_columns=[], as_token=True)
    occ = np.unique(
        s2.token_to_cell_id(
            enc["s2_tok"].to_numpy().view(np.uint64), 8
        ).astype(np.uint64)
    )
    want = set(occ.tolist())
    got = set()
    for cid, lv in zip(ids, lvl):
        lo, hi = s2.cell_range(np.array([cid], dtype=np.uint64))
        lsb8 = np.uint64(1) << np.uint64(2 * (30 - 8))
        members = np.arange(
            int(lo[0]) + int(lsb8) - 1, int(hi[0]) + 1, 2 * int(lsb8),
            dtype=np.uint64,
        )
        # level-8 descendants: ids with lsb at level 8 inside the range
        members = members[(members & (np.uint64(2) * lsb8 - np.uint64(1))) == lsb8]
        assert len(members) == 4 ** (8 - lv)
        before = len(got)
        got.update(int(m) for m in members)
        assert len(got) == before + len(members)  # disjoint
    assert got == want
    # minimality: no 4 siblings at any level remain unpromoted
    for k in range(0, 8):
        lsb = np.uint64(1) << np.uint64(2 * (30 - k))
        child = ids[lvl == k + 1]
        if len(child) == 0:
            continue
        par = (child & ~(lsb - np.uint64(1))) | lsb
        _, counts = np.unique(par, return_counts=True)
        assert counts.max() < 4


def test_region_centroid_matches_extents_membership():
    from texel_ray.pipelines.queries import q_region_centroid, q_region_extents

    cen = q_region_centroid(SF_DIR).to_pandas().set_index("region_id")
    ext = q_region_extents(SF_DIR).to_pandas().set_index("region_id")
    # same membership: counts equal; centroid inside the extent box
    assert sorted(cen.index) == sorted(ext.index)
    for rid in cen.index:
        assert int(cen.loc[rid, "n"]) == int(ext.loc[rid, "n"])
        n = int(cen.loc[rid, "n"])
        lon_c = cen.loc[rid, "lon_fp"] / 1e7 / n
        lat_c = cen.loc[rid, "lat_fp"] / 1e7 / n
        assert ext.loc[rid, "minx"] - 1e-6 <= lon_c <= ext.loc[rid, "maxx"] + 1e-6
        assert ext.loc[rid, "miny"] - 1e-6 <= lat_c <= ext.loc[rid, "maxy"] + 1e-6


def test_percent_change_weekly_matches_pandas():
    from texel_ray.pipelines.relational import q_percent_change_weekly

    out = q_percent_change_weekly(SF_DIR)
    ev = _events()
    week = ev["ts_us"].to_numpy() // (7 * 86400 * 1_000_000)
    for typ, g in ev.groupby("event_type"):
        counts = (
            pd.Series(g["ts_us"].to_numpy() // (7 * 86400 * 1_000_000))
            .value_counts()
            .sort_index()
        )
        sub = out[out["event_type"] == typ].set_index("week")
        for w in counts.index:
            if w - 1 in counts.index:
                assert int(sub.loc[w, "n"]) == int(counts[w])
                assert int(sub.loc[w, "delta"]) == int(counts[w] - counts[w - 1])
            else:
                assert w not in sub.index


def test_new_users_daily_matches_pandas():
    from texel_ray.pipelines.relational import q_new_users_daily

    out = q_new_users_daily(SF_DIR).to_pandas().set_index("day")
    ev = _events()
    ev = ev.assign(day=ev["ts_us"] // (86400 * 1_000_000))
    first = ev.groupby("user_id")["day"].min()
    want = first.value_counts().sort_index()
    assert out["n_new"].sum() == ev["user_id"].nunique()
    for d, n in want.items():
        assert int(out.loc[d, "n_new"]) == int(n)


def test_rolling_wau_matches_pandas():
    from texel_ray.pipelines.relational import q_rolling_wau

    out = q_rolling_wau(SF_DIR).to_pandas().set_index("day")
    ev = _events()
    ev = ev.assign(day=ev["ts_us"] // (86400 * 1_000_000))
    d0, d1 = int(ev["day"].min()), int(ev["day"].max())
    for d in range(d0, d1 + 1):
        users = ev[(ev["day"] >= d - 6) & (ev["day"] <= d)]["user_id"].nunique()
        if users:
            assert int(out.loc[d, "wau"]) == users
        else:
            assert d not in out.index


def test_voronoi_assign_matches_argmin():
    from texel_ray.pipelines.relational import _event_geo_np, q_voronoi_assign
    from texel_ray.sources.images import _URBAN_CENTERS

    out = q_voronoi_assign(SF_DIR).to_pandas().set_index("site").sort_index()
    ev = _events()
    cx = np.array([c[0] for c in _URBAN_CENTERS])
    cy = np.array([c[1] for c in _URBAN_CENTERS])
    lon, lat = _event_geo_np(ev["user_id"].to_numpy(), ev["event_id"].to_numpy())
    d2 = (lon[:, None] - cx[None, :]) ** 2 + (lat[:, None] - cy[None, :]) ** 2
    site = d2.argmin(axis=1)
    for s in np.unique(site):
        sel = site == s
        assert int(out.loc[s, "n"]) == int(sel.sum())
        assert int(out.loc[s, "d2_fp"]) == int(
            np.floor(d2[sel, s] * 1e7).astype(np.int64).sum()
        )


def test_shard_zonemap_covers_all_rows():
    from texel_ray.pipelines.queries import q_shard_zonemap
    from texel_ray.sources.images import images_parquet_path

    out = q_shard_zonemap(SF_DIR).to_pandas()
    t = pq.read_table(images_parquet_path(SF_DIR), columns=["lon", "lat"])
    assert int(out["n"].sum()) == t.num_rows
    assert out["min_lon"].min() == t["lon"].to_numpy().min()
    assert out["max_lat"].max() == t["lat"].to_numpy().max()
    # pruning is sound: a pruned shard's envelope is disjoint from the bbox
    for _, r in out[out["pruned"] == 1].iterrows():
        assert (
            r["max_lon"] < 0.0 or r["min_lon"] > 40.0
            or r["max_lat"] < 0.0 or r["min_lat"] > 40.0
        )


def test_segment_traffic_matches_dda_traversal():
    import math

    from texel_ray.core.tms import lonlat_to_webmercator_np
    from texel_ray.pipelines.relational import (
        _SEG_ORIGIN,
        _SEG_ZOOM_SPAN,
        _event_geo_np,
        q_segment_traffic,
    )

    out = (
        q_segment_traffic(SF_DIR)
        .to_pandas()
        .set_index(["tile_x", "tile_y"])
        .sort_index()
    )
    ev = _events()
    acc = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        lon, lat = _event_geo_np(g["user_id"].to_numpy(), g["event_id"].to_numpy())
        mx, my = lonlat_to_webmercator_np(lon, lat)
        fx = (mx - (-_SEG_ORIGIN)) / _SEG_ZOOM_SPAN
        fy = (_SEG_ORIGIN - my) / _SEG_ZOOM_SPAN
        for i in range(1, len(g)):
            x0, y0, x1, y1 = fx[i - 1], fy[i - 1], fx[i], fy[i]
            tx, ty = int(math.floor(x0)), int(math.floor(y0))
            txe, tye = int(math.floor(x1)), int(math.floor(y1))
            dx, dy = x1 - x0, y1 - y0
            sx, sy = (1 if dx > 0 else -1), (1 if dy > 0 else -1)
            tmx = ((tx + (sx > 0)) - x0) / dx if dx else math.inf
            tmy = ((ty + (sy > 0)) - y0) / dy if dy else math.inf
            tdx = abs(1.0 / dx) if dx else math.inf
            tdy = abs(1.0 / dy) if dy else math.inf
            cells = [(tx, ty)]
            while (tx, ty) != (txe, tye):
                if tmx < tmy:
                    tx += sx
                    tmx += tdx
                else:
                    ty += sy
                    tmy += tdy
                cells.append((tx, ty))
            for c in cells:
                acc[c] = acc.get(c, 0) + 1
    assert sorted(out.index.tolist()) == sorted(acc)
    for c, n in acc.items():
        assert int(out.loc[c, "n"]) == n


def test_abandoned_clicks_matches_per_user_scan():
    from texel_ray.pipelines.relational import q_abandoned_clicks

    out = q_abandoned_clicks(SF_DIR).to_pandas().set_index("day")
    ev = _events()
    want = {}
    for _, g in ev.groupby("user_id"):
        clicks = g[g["event_type"] == "click"]["ts_us"].to_numpy()
        buys = np.sort(g[g["event_type"] == "purchase"]["ts_us"].to_numpy())
        for t in clicks:
            followed = np.any((buys > t) & (buys <= t + 3600 * 1_000_000))
            if not followed:
                d = int(t // (86400 * 1_000_000))
                want[d] = want.get(d, 0) + 1
    assert sorted(out.index.tolist()) == sorted(want)
    for d, n in want.items():
        assert int(out.loc[d, "n_abandoned"]) == n


def test_iou_footprint_join_matches_allpairs_bruteforce():
    from texel_ray.pipelines.queries import q_iou_footprint_join
    from texel_ray.sources.images import images_parquet_path

    out = q_iou_footprint_join(SF_DIR).to_pandas()
    got = {
        (int(a), int(b)): v
        for a, b, v in zip(out["id_a"], out["id_b"], out["iou"])
    }
    t = pq.read_table(
        images_parquet_path(SF_DIR), columns=["image_id", "lon", "lat", "w", "h"]
    ).to_pandas()
    t = t[np.abs(t["lat"]) < 85.0].reset_index(drop=True)
    img = t["image_id"].str.slice(3).astype(np.int64).to_numpy()
    mx, my = t["lon"].to_numpy(), t["lat"].to_numpy()
    hw = t["w"].to_numpy() * 0.002 / 2.0
    hh = t["h"].to_numpy() * 0.002 / 2.0
    want = {}
    for i in range(len(t)):
        ix = np.minimum(mx[i] + hw[i], mx + hw) - np.maximum(mx[i] - hw[i], mx - hw)
        iy = np.minimum(my[i] + hh[i], my + hh) - np.maximum(my[i] - hh[i], my - hh)
        inter = np.maximum(0.0, ix) * np.maximum(0.0, iy)
        areas = 4.0 * hw[i] * hh[i] + 4.0 * hw * hh
        iou = inter / (areas - inter)
        for j in np.nonzero((iou >= 0.5) & (img > img[i]))[0]:
            want[(int(img[i]), int(img[j]))] = float(iou[j])
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k] or abs(got[k] - want[k]) < 1e-12


def test_ab_test_counts_matches_pandas():
    from texel_ray.pipelines.relational import _fold_hash, q_ab_test_counts

    out = q_ab_test_counts(SF_DIR).to_pandas().set_index("arm").sort_index()
    ev = _events()
    ev = ev.assign(arm=_fold_hash(ev["user_id"].to_numpy(), 2))
    for arm, g in ev.groupby("arm"):
        per_user = g.groupby("user_id")["event_type"].apply(
            lambda s: (s == "purchase").sum()
        )
        assert int(out.loc[arm, "users"]) == len(per_user)
        assert int(out.loc[arm, "converted"]) == int((per_user > 0).sum())
        assert int(out.loc[arm, "purchases"]) == int(per_user.sum())
        assert int(out.loc[arm, "clicks"]) == int((g["event_type"] == "click").sum())


def test_bilinear_upsample_matches_dense_interpolation():
    from texel_ray.pipelines.queries import _tile_counts, q_bilinear_upsample

    out = (
        q_bilinear_upsample(SF_DIR)
        .to_pandas()
        .set_index(["fine_x", "fine_y"])
        .sort_index()
    )
    counts = _tile_counts(SF_DIR, 6).to_pandas()
    dense = np.zeros((64, 64), dtype=np.int64)
    dense[counts["tile_x"].to_numpy(), counts["tile_y"].to_numpy()] = counts[
        "n"
    ].to_numpy()
    # dense recompute: value16(fx, fy) = sum over the 4 coarse centers of
    # weight * count, bilinear at the fine-center quarter offsets
    for (fx, fy), row in out.iterrows():
        cxf = (fx + 0.5) / 2.0 - 0.5
        cyf = (fy + 0.5) / 2.0 - 0.5
        x0, y0 = int(np.floor(cxf)), int(np.floor(cyf))
        wx1 = cxf - x0
        wy1 = cyf - y0
        val = 0.0
        for (cx, wx) in ((x0, 1 - wx1), (x0 + 1, wx1)):
            for (cy, wy) in ((y0, 1 - wy1), (y0 + 1, wy1)):
                if 0 <= cx < 64 and 0 <= cy < 64:
                    val += wx * wy * dense[cx, cy]
        assert int(row["value16"]) == int(round(val * 16))
    assert len(out) > 0


def test_fulfillment_lag_matches_pandas():
    from texel_ray.pipelines.relational import q_fulfillment_lag

    out = (
        q_fulfillment_lag(SF_DIR)
        .to_pandas()
        .set_index(["o_orderpriority", "bucket"])
        .sort_index()
    )
    od = pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pandas()
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    lag = (
        j["l_shipdate"].astype("datetime64[us]").astype(np.int64)
        - j["o_orderdate"].astype("datetime64[us]").astype(np.int64)
    ) // (86400 * 1_000_000)
    bucket = np.full(len(lag), 3)
    bucket[lag <= 90] = 2
    bucket[lag <= 30] = 1
    bucket[lag <= 7] = 0
    j = j.assign(bucket=bucket)
    want = j.groupby(["o_orderpriority", "bucket"]).size()
    assert len(out) == len(want)
    for k, v in want.items():
        assert int(out.loc[k, "n"]) == int(v)


def test_ripley_pairs_matches_quadratic_lattice():
    from texel_ray.pipelines.queries import _tile_counts, q_ripley_pairs

    out = q_ripley_pairs(SF_DIR).set_index("r")
    counts = _tile_counts(SF_DIR, 6).to_pandas()
    x = counts["tile_x"].to_numpy()
    y = counts["tile_y"].to_numpy()
    n = counts["n"].to_numpy().astype(np.int64)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    for r in (1, 2, 4):
        same = int((n * (n - 1) // 2).sum())
        mask = np.triu(d2 <= r * r, k=1)
        cross = int((n[:, None] * n[None, :])[mask].sum())
        assert int(out.loc[r, "n_pairs"]) == same + cross
    # monotone in r
    v = out["n_pairs"].to_numpy()
    assert (np.diff(v) >= 0).all()


def test_containment_join_complete_vs_bruteforce():
    from texel_ray.pipelines.mlprep import q_containment_join
    from texel_ray.stages.dedup import shingle_set

    out = q_containment_join(SF_DIR).to_pandas()
    got = {
        (int(a), int(b)): c
        for a, b, c in zip(out["id_a"], out["id_b"], out["containment"])
    }
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    ids = docs["doc_id"].to_numpy()
    sets = [shingle_set(t, 3) for t in docs["text"]]
    want = {}
    for i in range(len(ids)):
        if not sets[i]:
            continue
        for j in range(len(ids)):
            if i == j:
                continue
            c = len(sets[i] & sets[j]) / len(sets[i])
            if c >= 0.9:
                want[(int(ids[i]), int(ids[j]))] = c
    # one-sided prefix filtering must be COMPLETE over ordered pairs
    assert got == want


def test_impossible_travel_matches_per_user_scan():
    from texel_ray.pipelines.relational import (
        _event_geo_np,
        q_impossible_travel,
    )

    out = (
        q_impossible_travel(SF_DIR).to_pandas().set_index("user_id").sort_index()
    )
    ev = _events()
    want = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        lon, lat = _event_geo_np(g["user_id"].to_numpy(), g["event_id"].to_numpy())
        lon, lat = np.radians(lon), np.radians(lat)
        if len(g) < 2:
            continue
        dphi = (lat[1:] - lat[:-1]) / 2.0
        dlmb = (lon[1:] - lon[:-1]) / 2.0
        a = np.sin(dphi) ** 2 + np.cos(lat[:-1]) * np.cos(lat[1:]) * np.sin(dlmb) ** 2
        d = 2.0 * 6371000.0 * np.arcsin(np.sqrt(a))
        dist_mm = np.floor(d * 1000.0).astype(np.int64)
        dt = np.diff(g["ts_us"].to_numpy())
        viol = int((dist_mm * 1_000_000 > dt * 150_000).sum())
        if viol:
            want[int(uid)] = (len(g) - 1, viol)
    assert sorted(out.index.tolist()) == sorted(want)
    for u, (ns, nv) in want.items():
        assert int(out.loc[u, "n_steps"]) == ns
        assert int(out.loc[u, "n_violations"]) == nv


def test_embedding_quantization_matches_numpy():
    from texel_ray.pipelines.mlprep import q_embedding_quantization

    out = (
        q_embedding_quantization(SF_DIR).to_pandas().set_index("d").sort_index()
    )
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    x = np.stack(
        [np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()]
    )
    max_abs = np.abs(x).max(axis=0)
    scale = np.where(max_abs > 0, 127.0 / max_abs, 0.0)
    q = np.floor(x * scale[None, :] + 0.5)
    deq = np.where(scale[None, :] > 0, q / np.where(scale == 0, 1, scale)[None, :], 0.0)
    term = np.floor((x - deq) ** 2 * 1e12).astype(np.int64)
    for d in range(64):
        assert int(out.loc[d, "n"]) == len(x)
        assert int(out.loc[d, "sum_err_fp"]) == int(term[:, d].sum())
        assert int(out.loc[d, "max_q"]) == int(q[:, d].max())
        # int8 range respected
        assert -127 <= int(out.loc[d, "min_q"]) <= int(out.loc[d, "max_q"]) <= 127


def test_home_location_matches_pandas_argmax():
    from texel_ray.core.tms import lonlat_to_webmercator_np
    from texel_ray.pipelines.relational import _event_geo_np, q_home_location

    out = q_home_location(SF_DIR).to_pandas().set_index("user_id").sort_index()
    ev = _events()
    span = 256.0 * (156543.033928041 / 256.0)
    origin = 20037508.3427892
    lon, lat = _event_geo_np(ev["user_id"].to_numpy(), ev["event_id"].to_numpy())
    mx, my = lonlat_to_webmercator_np(lon, lat)
    fx = (mx + origin) / span
    fy = (origin - my) / span
    tx = np.trunc(fx).astype(np.int64)
    ty = np.trunc(fy).astype(np.int64)
    ok = (fx >= 0) & (fy >= 0) & (tx < 256) & (ty < 256)
    df = pd.DataFrame(
        {"user_id": ev["user_id"].to_numpy()[ok], "tkey": tx[ok] * 65536 + ty[ok]}
    )
    for uid, g in df.groupby("user_id"):
        counts = g["tkey"].value_counts()
        best_n = counts.max()
        best = min(int(t) for t, n in counts.items() if n == best_n)
        assert int(out.loc[uid, "n_visits"]) == int(best_n)
        assert (
            int(out.loc[uid, "tile_x"]) * 65536 + int(out.loc[uid, "tile_y"])
            == best
        )


def test_doc_keywords_matches_plain_recompute():
    from texel_ray.pipelines.mlprep import q_doc_keywords

    out = q_doc_keywords(SF_DIR).to_pandas()
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    df_map = {}
    for t in docs["text"]:
        for w in set((t or "").split()):
            df_map[w] = df_map.get(w, 0) + 1
    for _, drow in docs.iterrows():
        toks = (drow["text"] or "").split()
        tf = {}
        for w in toks:
            tf[w] = tf.get(w, 0) + 1
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1], df_map[kv[0]], kv[0]))[:3]
        sub = out[out["doc_id"] == drow["doc_id"]].sort_values("rank")
        assert sub["word"].tolist() == [w for w, _ in ranked]
        assert sub["tf"].tolist() == [f for _, f in ranked]


def test_tile_diversity_simpson_consistency():
    from texel_ray.pipelines.relational import q_tile_diversity

    out = q_tile_diversity(SF_DIR).to_pandas()
    # invariants: sum_sq between n (all-distinct) and n^2 (single type);
    # n_types bounded by the 5 event types; totals match the corpus
    assert (out["sum_sq"] >= out["n"]).all()
    assert (out["sum_sq"] <= out["n"] ** 2).all()
    assert (out["n_types"] <= 5).all()
    ev = _events()
    assert out["n"].sum() == len(ev)  # all events land in-grid at z6


def test_tpch_q10_matches_pandas_recompute():
    from texel_ray.pipelines.relational import q_tpch_q10

    out = q_tpch_q10(SF_DIR)
    od = pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pandas()
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1997-04-01")
    od = od[(od["o_orderdate"] >= lo) & (od["o_orderdate"] < hi)]
    li = li[li["l_returnflag"] == "R"].copy()
    li["rev"] = np.trunc(
        li["l_extendedprice"].to_numpy() * (1.0 - li["l_discount"].to_numpy()) * 100.0
    ).astype(np.int64)
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    agg = (
        j.groupby("o_custkey")
        .agg(rev=("rev", "sum"), n=("rev", "size"))
        .reset_index()
        .sort_values(["rev", "o_custkey"], ascending=[False, True])
        .head(20)
    )
    assert out["o_custkey"].tolist() == agg["o_custkey"].tolist()
    assert out["rev_cents"].tolist() == agg["rev"].tolist()


def test_conversion_latency_matches_per_user_scan():
    from texel_ray.pipelines.relational import q_conversion_latency

    out = q_conversion_latency(SF_DIR).to_pandas().set_index("bucket")
    ev = _events()
    edges = np.array([60, 3600, 21600, 86400]) * 1_000_000
    want = {}
    for _, g in ev.groupby("user_id"):
        buys = np.sort(g[g["event_type"] == "purchase"]["ts_us"].to_numpy())
        for t in g[g["event_type"] == "click"]["ts_us"].to_numpy():
            after = buys[buys > t]
            if len(after) and after[0] - t <= 86400 * 1_000_000:
                b = int(np.searchsorted(edges, after[0] - t, side="left"))
                want[b] = want.get(b, 0) + 1
    assert sorted(out.index.tolist()) == sorted(want)
    for b, n in want.items():
        assert int(out.loc[b, "n"]) == n


def test_phash_bit_stats_matches_popcount():
    from texel_ray.pipelines.mlprep import q_phash_bit_stats
    from texel_ray.sources.images import images_parquet_path

    out = q_phash_bit_stats(SF_DIR).to_pandas().set_index("bit").sort_index()
    h = (
        pq.read_table(images_parquet_path(SF_DIR), columns=["phash"])["phash"]
        .to_numpy()
        .view(np.uint64)
    )
    for bit in range(64):
        assert int(out.loc[bit, "ones"]) == int(
            ((h >> np.uint64(bit)) & np.uint64(1)).sum()
        )
        assert int(out.loc[bit, "n"]) == len(h)


def test_nearest_region_dist_matches_numpy():
    from texel_ray.pipelines.queries import q_nearest_region_dist
    from texel_ray.pipelines.relational import _rect_regions
    from texel_ray.sources.images import images_parquet_path

    out = (
        q_nearest_region_dist(SF_DIR).to_pandas().set_index("region").sort_index()
    )
    t = pq.read_table(images_parquet_path(SF_DIR), columns=["lon", "lat"])
    lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
    rid, minx, miny, maxx, maxy = _rect_regions()
    dx = np.maximum(
        np.maximum(minx[None, :] - lon[:, None], lon[:, None] - maxx[None, :]), 0.0
    )
    dy = np.maximum(
        np.maximum(miny[None, :] - lat[:, None], lat[:, None] - maxy[None, :]), 0.0
    )
    d2 = dx * dx + dy * dy
    site = d2.argmin(axis=1)
    for s in np.unique(site):
        sel = site == s
        assert int(out.loc[rid[s], "n"]) == int(sel.sum())
        assert int(out.loc[rid[s], "d2_fp"]) == int(
            np.floor(d2[sel, s] * 1e9).astype(np.int64).sum()
        )
    assert int(out["n"].sum()) == len(lon)


def test_caption_size_corr_moments():
    from texel_ray.pipelines.queries import q_caption_size_corr
    from texel_ray.sources.images import images_parquet_path

    out = q_caption_size_corr(SF_DIR).to_pandas().iloc[0]
    t = pq.read_table(
        images_parquet_path(SF_DIR), columns=["caption", "w", "h"]
    ).to_pandas()
    x = t["caption"].str.len().to_numpy().astype(np.int64)
    y = (t["w"].astype(np.int64) * t["h"].astype(np.int64)).to_numpy()
    assert int(out["n"]) == len(t)
    assert int(out["sxy"]) == int((x * y).sum())
    assert int(out["sxx"]) == int((x * x).sum())
    assert int(out["syy"]) == int((y * y).sum())


def test_weekday_mix_totals():
    from texel_ray.pipelines.relational import q_weekday_mix

    out = q_weekday_mix(SF_DIR).to_pandas()
    ev = _events()
    assert int(out["n"].sum()) == len(ev)
    wd = (ev["ts_us"] // (86400 * 1_000_000)) % 7
    for (w, typ), g in ev.assign(wd=wd).groupby(["wd", "event_type"]):
        row = out[(out["weekday"] == w) & (out["event_type"] == typ)]
        assert int(row["n"].iloc[0]) == len(g)


def test_user_locality_depth_matches_lcp_scan():
    from texel_ray.core.tms import lonlat_to_webmercator_np
    from texel_ray.pipelines.relational import (
        _event_geo_np,
        q_user_locality_depth,
    )

    out = q_user_locality_depth(SF_DIR).to_pandas().set_index("depth")
    ev = _events()
    span = 256.0 * (156543.033928041 / 65536.0)
    origin = 20037508.3427892
    lon, lat = _event_geo_np(ev["user_id"].to_numpy(), ev["event_id"].to_numpy())
    mx, my = lonlat_to_webmercator_np(lon, lat)
    tx = np.trunc((mx + origin) / span).astype(np.int64)
    ty = np.trunc((origin - my) / span).astype(np.int64)
    df = pd.DataFrame({"u": ev["user_id"], "tx": tx, "ty": ty})
    want = {}
    for _, g in df.groupby("u"):
        # brute LCP: deepest z where ALL tile coords share floor(t / 2^k)
        gx = g["tx"].to_numpy()
        gy = g["ty"].to_numpy()
        depth = 16
        while depth > 0:
            k = 16 - depth
            if len(set(gx >> k)) == 1 and len(set(gy >> k)) == 1:
                break
            depth -= 1
        want[depth] = want.get(depth, 0) + 1
    assert sorted(out.index.tolist()) == sorted(want)
    for d, n in want.items():
        assert int(out.loc[d, "n_users"]) == n


def test_tile_activity_span_invariants():
    from texel_ray.pipelines.relational import q_tile_activity_span

    out = q_tile_activity_span(SF_DIR).to_pandas()
    ev = _events()
    assert int(out["n_events"].sum()) == len(ev)
    span_days = out["last_day"] - out["first_day"] + 1
    assert (out["n_days"] >= 1).all()
    assert (out["n_days"] <= span_days).all()
    assert (out["n_events"] >= out["n_days"]).all()


def test_type_cooccurrence_matches_pandas():
    from texel_ray.pipelines.relational import q_type_cooccurrence

    out = (
        q_type_cooccurrence(SF_DIR)
        .to_pandas()
        .set_index(["type_a", "type_b"])
        .sort_index()
    )
    ev = _events()
    ev = ev.assign(hour=ev["ts_us"] // (3600 * 1_000_000))
    want = {}
    for _, g in ev.groupby(["user_id", "hour"]):
        types = sorted(set(g["event_type"]))
        for i in range(len(types)):
            for j in range(i + 1, len(types)):
                k = (types[i], types[j])
                want[k] = want.get(k, 0) + 1
    assert sorted(out.index.tolist()) == sorted(want)
    for k, n in want.items():
        assert int(out.loc[k, "n"]) == n


def test_zipf_head_matches_counter():
    from collections import Counter

    from texel_ray.pipelines.mlprep import q_zipf_head

    out = q_zipf_head(SF_DIR)
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    c = Counter()
    for t in docs["text"]:
        c.update((t or "").split())
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    assert out["word"].tolist() == [w for w, _ in ranked]
    assert out["freq"].tolist() == [f for _, f in ranked]
    assert out["rank"].tolist() == list(range(1, len(ranked) + 1))


def test_region_knn_images_matches_bruteforce():
    from texel_ray.pipelines.queries import q_region_knn_images
    from texel_ray.pipelines.relational import _rect_regions
    from texel_ray.sources.images import images_parquet_path

    out = q_region_knn_images(SF_DIR)
    t = pq.read_table(
        images_parquet_path(SF_DIR), columns=["image_id", "lon", "lat"]
    ).to_pandas()
    img = t["image_id"].str.slice(3).astype(np.int64).to_numpy()
    lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
    rid, minx, miny, maxx, maxy = _rect_regions()
    cx, cy = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    for j, r in enumerate(rid):
        d2f = np.floor(((lon - cx[j]) ** 2 + (lat - cy[j]) ** 2) * 1e9).astype(
            np.int64
        )
        order = np.lexsort((img, d2f))[:5]
        sub = out[out["region"] == r].sort_values("rank")
        assert sub["img"].tolist() == img[order].tolist()
        assert sub["d2_fp"].tolist() == d2f[order].tolist()


def test_word_burstiness_matches_counter():
    from collections import Counter

    from texel_ray.pipelines.mlprep import q_word_burstiness

    out = q_word_burstiness(SF_DIR).to_pandas().set_index("word")
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    agg = {}
    for t in docs["text"]:
        for w, f in Counter((t or "").split()).items():
            df, s1, s2 = agg.get(w, (0, 0, 0))
            agg[w] = (df + 1, s1 + f, s2 + f * f)
    want = {w: v for w, v in agg.items() if v[0] >= 5}
    assert sorted(out.index.tolist()) == sorted(want)
    for w, (df, s1, s2) in want.items():
        assert int(out.loc[w, "df"]) == df
        assert int(out.loc[w, "sum_tf"]) == s1
        assert int(out.loc[w, "sum_tf2"]) == s2


def test_novelty_curve_matches_first_seen():
    from texel_ray.pipelines.mlprep import q_novelty_curve
    from texel_ray.stages.dedup import shingle_set

    out = q_novelty_curve(SF_DIR).to_pandas().set_index("doc_id")
    docs = (
        pq.read_table(f"{SF_DIR}/documents.parquet")
        .to_pandas()
        .sort_values("doc_id")
    )
    seen = set()
    want = {}
    for _, row in docs.iterrows():
        sh = shingle_set(row["text"], 2)
        fresh = sh - seen
        if fresh:
            want[int(row["doc_id"])] = len(fresh)
        seen |= sh
    assert sorted(out.index.tolist()) == sorted(want)
    for d, n in want.items():
        assert int(out.loc[d, "n_introduced"]) == n


def test_activity_heatmap_totals():
    from texel_ray.pipelines.relational import q_activity_heatmap

    out = q_activity_heatmap(SF_DIR).to_pandas()
    ev = _events()
    assert int(out["n"].sum()) == len(ev)
    assert out["hour"].between(0, 23).all()
    assert out["weekday"].between(0, 6).all()
