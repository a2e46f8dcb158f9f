"""Brute-force invariant tests for the round-5 operators: full-outer
hourly reconciliation (pandas outer merge), semi join (pandas isin),
EWMA (plain sequential recurrence), activity streaks (per-user python
scan), habit-cell churn (pandas pivot), IQR outlier gate (numpy
recompute of the discrete-quantile Tukey fences)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"

DAY_US = 86400 * 1_000_000
HOUR_US = 3600 * 1_000_000


def _events() -> pd.DataFrame:
    df = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype(np.int64)
    df["day"] = df["ts_us"] // DAY_US
    df["cents"] = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
    return df


def test_full_outer_hours_matches_pandas_outer_merge():
    from texel_ray.pipelines.relational import q_full_outer_hours

    out = (
        q_full_outer_hours(SF_DIR)
        .to_pandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    ev = _events()
    ev["hour"] = ev["ts_us"] // HOUR_US
    s = ev[ev.event_type == "signup"].groupby("hour").size().rename("n_signup")
    p = ev[ev.event_type == "purchase"].groupby("hour").size().rename("n_purchase")
    want = (
        pd.concat([s, p], axis=1)
        .fillna(0)
        .astype(np.int64)
        .reset_index()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    # outer-only rows must exist, or the join type isn't exercised
    assert ((want.n_signup == 0) | (want.n_purchase == 0)).any()


def test_semi_join_orders_matches_isin():
    from texel_ray.pipelines.relational import q_semi_join_orders

    out = (
        q_semi_join_orders(SF_DIR)
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pandas()
    orders = pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()
    keys = set(li[li.l_quantity >= 48.0].l_orderkey)
    hit = orders[orders.o_orderkey.isin(keys)].copy()
    hit["cents"] = np.trunc(hit.o_totalprice.to_numpy() * 100.0).astype(np.int64)
    want = (
        hit.groupby("o_orderpriority")
        .agg(total_cents=("cents", "sum"), n_orders=("cents", "size"))
        .reset_index()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    # semi (not inner): an order with several qualifying lineitems
    # counts once
    assert int(want.n_orders.sum()) == len(keys & set(orders.o_orderkey))


def test_ewma_daily_matches_sequential_recurrence():
    from texel_ray.pipelines.relational import q_ewma_daily

    out = q_ewma_daily(SF_DIR).to_pandas().sort_values("day").reset_index(drop=True)
    daily = _events().groupby("day").size().sort_index()
    e = []
    for i, c in enumerate(daily.to_numpy()):
        e.append(float(c) if i == 0 else (float(c) + e[-1]) / 2.0)
    assert out["day"].tolist() == daily.index.tolist()
    assert out["n"].tolist() == daily.to_numpy().tolist()
    # alpha = 1/2 keeps every term a dyadic rational: exact equality
    assert out["ewma"].tolist() == e


def test_activity_streaks_matches_python_scan():
    from texel_ray.pipelines.relational import q_activity_streaks

    out = q_activity_streaks(SF_DIR).to_pandas()
    got = dict(zip(out.streak_len, out.n_users))
    ev = _events()
    hist: dict[int, int] = {}
    for _, g in ev.groupby("user_id"):
        days = sorted(set(g.day))
        best = run = 1
        for a, b in zip(days, days[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        hist[best] = hist.get(best, 0) + 1
    assert got == hist


def test_churned_users_matches_pandas_pivot():
    from texel_ray.pipelines.relational import q_churned_users

    out = q_churned_users(SF_DIR).to_pandas()
    got = dict(zip(out.status, out.n_cells))
    ev = _events()
    mid = (int(ev.day.min()) + int(ev.day.max()) + 1) // 2
    ev["hod"] = (ev.ts_us // HOUR_US) % 24
    f = ev.groupby(["user_id", "hod"]).agg(
        h1=("day", lambda d: int((d < mid).any())),
        h2=("day", lambda d: int((d >= mid).any())),
    )
    want = {
        "retained": int(((f.h1 > 0) & (f.h2 > 0)).sum()),
        "churned": int(((f.h1 > 0) & (f.h2 == 0)).sum()),
        "new": int(((f.h1 == 0) & (f.h2 > 0)).sum()),
    }
    assert got == {k: v for k, v in want.items() if v > 0}
    assert len(got) >= 2  # the grain must exercise >1 class


def test_iqr_outliers_matches_numpy_fences():
    from texel_ray.pipelines.relational import q_iqr_outliers

    out = q_iqr_outliers(SF_DIR).to_pandas().set_index("event_type")
    ev = _events()
    for typ, g in ev.groupby("event_type"):
        c = np.sort(g.cents.to_numpy())
        n = len(c)
        q1 = int(c[int(np.ceil(0.25 * n)) - 1])  # ceil(q*n)th smallest
        q3 = int(c[int(np.ceil(0.75 * n)) - 1])
        iqr = q3 - q1
        n_out = int(((2 * c < 2 * q1 - 3 * iqr) | (2 * c > 2 * q3 + 3 * iqr)).sum())
        row = out.loc[typ]
        assert (row.q1_cents, row.q3_cents, row.n, row.n_outliers) == (
            q1,
            q3,
            n,
            n_out,
        )


def test_flow_basins_matches_chain_walk():
    from texel_ray.pipelines.queries import _tile_counts, q_flow_basins

    out = q_flow_basins(SF_DIR).to_pandas()
    occ = _tile_counts(SF_DIR, 6).to_pandas()
    key2n = {
        (int(r.tile_x), int(r.tile_y)): int(r.n) for r in occ.itertuples()
    }

    def succ(cell):
        x, y = cell
        n = key2n[cell]
        best = None
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nb = (x + dx, y + dy)
                if nb not in key2n:
                    continue
                k = (key2n[nb], nb[0], nb[1])
                if k < (n, x, y) and (best is None or k < best):
                    best = k
        return (best[1], best[2]) if best else cell

    basins: dict[tuple, list] = {}
    for cell, n in key2n.items():
        cur = cell
        while True:
            nxt = succ(cur)
            if nxt == cur:
                break
            cur = nxt
        basins.setdefault(cur, [0, 0])
        basins[cur][0] += n
        basins[cur][1] += 1
    got = {
        (int(r.sink_x), int(r.sink_y)): (int(r.n_images), int(r.n_tiles))
        for r in out.itertuples()
    }
    assert got == {k: tuple(v) for k, v in basins.items()}


def test_last_touch_attribution_matches_per_user_scan():
    from texel_ray.pipelines.relational import q_last_touch_attribution

    out = q_last_touch_attribution(SF_DIR).to_pandas()
    got = dict(zip(out.touch_type, out.n))
    ev = _events().sort_values(["user_id", "ts_us", "event_id"])
    want: dict[str, int] = {}
    for _, g in ev.groupby("user_id"):
        last = None
        for row in g.itertuples():
            if row.event_type == "purchase":
                key = last if last is not None else "none"
                want[key] = want.get(key, 0) + 1
            else:
                last = row.event_type
    assert got == want


def test_pareto_tiles_matches_sorted_cumsum():
    from texel_ray.pipelines.relational import (
        _event_geo_np,
        q_pareto_tiles,
    )
    from texel_ray.core.tms import lonlat_to_webmercator_np

    out = q_pareto_tiles(SF_DIR).to_pandas().set_index("share_pct")
    ev = _events()
    lon, lat = _event_geo_np(ev.user_id.to_numpy(), ev.event_id.to_numpy())
    mx, my = lonlat_to_webmercator_np(lon, lat)
    span = 256.0 * (156543.033928041 / 64.0)
    origin = 20037508.3427892
    fx, fy = (mx + origin) / span, (origin - my) / span
    tx, ty = np.trunc(fx).astype(np.int64), np.trunc(fy).astype(np.int64)
    ok = (fx >= 0) & (fy >= 0) & (tx < 64) & (ty < 64)
    counts: dict[tuple, int] = {}
    for x, y in zip(tx[ok], ty[ok]):
        counts[(int(x), int(y))] = counts.get((int(x), int(y)), 0) + 1
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    for p in (50, 80, 90, 99):
        cum = 0
        for k, (_, n) in enumerate(ordered, 1):
            cum += n
            if 100 * cum >= p * total:
                break
        row = out.loc[p]
        assert (int(row.n_tiles), int(row.n_covered)) == (k, cum)


def test_moving_avg_daily_matches_pandas_rolling():
    from texel_ray.pipelines.relational import q_moving_avg_daily

    out = (
        q_moving_avg_daily(SF_DIR)
        .to_pandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    ev = _events()
    d = ev.groupby(["event_type", "day"]).size().rename("n").reset_index()
    rows = []
    for typ, g in d.groupby("event_type"):
        g = g.sort_values("day")
        for _, r in g.iterrows():
            win = g[(g.day >= r.day - 6) & (g.day <= r.day)]
            rows.append((typ, int(r.day), int(r.n), int(win.n.sum())))
    want = pd.DataFrame(rows, columns=["event_type", "day", "n", "n7"])
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_scd2_intervals_matches_per_key_diffs():
    from texel_ray.pipelines.relational import q_scd2_intervals

    out = q_scd2_intervals(SF_DIR).to_pandas().set_index("event_type")
    ev = _events().sort_values(["user_id", "event_type", "ts_us", "event_id"])
    agg: dict[str, list] = {}
    for (_, typ), g in ev.groupby(["user_id", "event_type"]):
        ts = g.ts_us.to_numpy()
        for gap in np.diff(ts):
            agg.setdefault(typ, []).append(int(gap))
    for typ, gaps in agg.items():
        row = out.loc[typ]
        assert (int(row.n_intervals), int(row.total_us), int(row.max_us)) == (
            len(gaps),
            sum(gaps),
            max(gaps),
        )


def test_top2_gap_tiles_matches_counter():
    from texel_ray.core.tms import lonlat_to_webmercator_np
    from texel_ray.pipelines.relational import _event_geo_np, q_top2_gap_tiles

    out = q_top2_gap_tiles(SF_DIR).to_pandas()
    got = {
        (int(r.tile_x), int(r.tile_y)): (r.top_type, int(r.n_top), int(r.gap))
        for r in out.itertuples()
    }
    ev = _events()
    lon, lat = _event_geo_np(ev.user_id.to_numpy(), ev.event_id.to_numpy())
    mx, my = lonlat_to_webmercator_np(lon, lat)
    span = 256.0 * (156543.033928041 / 64.0)
    origin = 20037508.3427892
    fx, fy = (mx + origin) / span, (origin - my) / span
    tx, ty = np.trunc(fx).astype(np.int64), np.trunc(fy).astype(np.int64)
    ok = (fx >= 0) & (fy >= 0) & (tx < 64) & (ty < 64)
    cnt: dict[tuple, dict] = {}
    for x, y, t in zip(tx[ok], ty[ok], ev.event_type.to_numpy()[ok]):
        cnt.setdefault((int(x), int(y)), {}).setdefault(t, 0)
        cnt[(int(x), int(y))][t] += 1
    want = {}
    for cell, types in cnt.items():
        ordered = sorted(types.items(), key=lambda kv: (-kv[1], kv[0]))
        top_t, top_n = ordered[0]
        second = ordered[1][1] if len(ordered) > 1 else 0
        want[cell] = (top_t, top_n, top_n - second)
    assert got == want


def test_grid_crosstab_row_consistency():
    """Every (tile, hex) pair must agree with an independent per-row
    double-encode, and the marginals must equal the single-grid counts."""
    from texel_ray.core.tms import lonlat_to_webmercator_np
    from texel_ray.pipelines.relational import _event_geo_np, q_grid_crosstab

    out = q_grid_crosstab(SF_DIR).to_pandas()
    got = {
        (int(r.tile_x), int(r.tile_y), int(r.hex_q), int(r.hex_r)): int(r.n)
        for r in out.itertuples()
    }
    ev = _events()
    lon, lat = _event_geo_np(ev.user_id.to_numpy(), ev.event_id.to_numpy())
    mx, my = lonlat_to_webmercator_np(lon, lat)
    span = 256.0 * (156543.033928041 / 64.0)
    origin = 20037508.3427892
    fx, fy = (mx + origin) / span, (origin - my) / span
    tx, ty = np.trunc(fx).astype(np.int64), np.trunc(fy).astype(np.int64)
    ok = (fx >= 0) & (fy >= 0) & (tx < 64) & (ty < 64) & np.isfinite(my)
    q = (mx * (np.sqrt(3.0) / 3.0) - my * (1.0 / 3.0)) / 250_000.0
    r = (my * (2.0 / 3.0)) / 250_000.0
    cx, cz = q, r
    cy = -cx - cz
    rx, ry, rz = np.floor(cx + 0.5), np.floor(cy + 0.5), np.floor(cz + 0.5)
    dx, dy, dz = np.abs(rx - cx), np.abs(ry - cy), np.abs(rz - cz)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    fix_z = ~fix_x & ~fix_y
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    want: dict[tuple, int] = {}
    for i in np.nonzero(ok)[0]:
        key = (int(tx[i]), int(ty[i]), int(rx[i]), int(rz[i]))
        want[key] = want.get(key, 0) + 1
    assert got == want


def test_robust_zscore_days_matches_recompute():
    from texel_ray.pipelines.relational import q_robust_zscore_days

    out = q_robust_zscore_days(SF_DIR).to_pandas().sort_values("day")
    daily = _events().groupby("day").size().sort_index()
    n = daily.to_numpy()
    v = np.sort(n)
    med = int(v[int(np.ceil(0.5 * len(v))) - 1])
    dev = np.sort(np.abs(n - med))
    mad = int(dev[int(np.ceil(0.5 * len(dev))) - 1])
    want = (1349 * np.abs(n - med) > 7000 * mad).astype(int)
    assert out["day"].tolist() == daily.index.tolist()
    assert out["n"].tolist() == n.tolist()
    assert out["is_outlier"].tolist() == want.tolist()
    # the integer reduction is the exact 0.6745/3.5 rule
    flt = 0.6745 * np.abs(n - med) > 3.5 * mad
    assert np.array_equal(flt.astype(int), want)


def test_rfm_segments_matches_pandas_recompute():
    from texel_ray.pipelines.relational import q_rfm_segments

    out = q_rfm_segments(SF_DIR).to_pandas()
    got = {
        (int(r.r_bucket), int(r.f_bucket), int(r.m_bucket)): int(r.n_customers)
        for r in out.itertuples()
    }
    orders = pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()
    orders["day"] = (
        orders.o_orderdate.astype("datetime64[us]").astype(np.int64)
        // (86400 * 1_000_000)
    )
    orders["cents"] = np.trunc(orders.o_totalprice.to_numpy() * 100.0).astype(
        np.int64
    )
    c = orders.groupby("o_custkey").agg(
        r_day=("day", "max"), f=("day", "size"), m=("cents", "sum")
    )

    def edges(v):
        s = np.sort(v.to_numpy())
        return [s[int(np.ceil(q * len(s))) - 1] for q in (0.2, 0.4, 0.6, 0.8)]

    er, ef, em = edges(c.r_day), edges(c.f), edges(c.m)
    want: dict[tuple, int] = {}
    for row in c.itertuples():
        key = (
            1 + sum(row.r_day > e for e in er),
            1 + sum(row.f > e for e in ef),
            1 + sum(row.m > e for e in em),
        )
        want[key] = want.get(key, 0) + 1
    assert got == want


def test_tpch_q5_matches_pandas_join():
    from texel_ray.pipelines.relational import q_tpch_q5

    out = q_tpch_q5(SF_DIR).to_pandas()
    got = dict(zip(out.n_name, out.revenue_cents))
    rd = lambda t: pq.read_table(f"{SF_DIR}/{t}.parquet").to_pandas()  # noqa: E731
    c, o, li = rd("customer"), rd("orders"), rd("lineitem")
    s, n, r = rd("supplier"), rd("nation"), rd("region")
    df = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(n, left_on="s_nationkey", right_on="n_nationkey")
        .merge(r, left_on="n_regionkey", right_on="r_regionkey")
    )
    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1997-01-01")
    df = df[
        (df.c_nationkey == df.s_nationkey)
        & (df.r_name == "ASIA")
        & (df.o_orderdate >= lo)
        & (df.o_orderdate < hi)
    ]
    df["rev"] = np.trunc(
        df.l_extendedprice.to_numpy() * (1.0 - df.l_discount.to_numpy()) * 100.0
    ).astype(np.int64)
    want = df.groupby("n_name").rev.sum().to_dict()
    assert got == want and len(got) > 0


def test_percent_of_parent_tiles_marginals():
    from texel_ray.pipelines.relational import q_percent_of_parent_tiles

    out = q_percent_of_parent_tiles(SF_DIR).to_pandas()
    # parent totals must equal the sum of their children's n
    grp = out.assign(px=out.tile_x // 4, py=out.tile_y // 4)
    for (_, _), g in grp.groupby(["px", "py"]):
        assert (g.parent_n == g.n.sum()).all()
    assert (out.n <= out.parent_n).all() and len(out) > 0


def test_word_cooccurrence_matches_counter():
    from texel_ray.pipelines.mlprep import q_word_cooccurrence

    out = q_word_cooccurrence(SF_DIR).to_pandas()
    got = {(r.word_a, r.word_b): int(r.n_docs) for r in out.itertuples()}
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    from collections import Counter

    cnt = Counter()
    for t in docs.text.fillna(""):
        if t.strip():
            cnt.update(t.split())
    vocab = set(
        w for w, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    )
    want: dict[tuple, int] = {}
    for t in docs.text.fillna(""):
        ws = sorted(set(t.split()) & vocab)
        for i in range(len(ws)):
            for j in range(i + 1, len(ws)):
                want[(ws[i], ws[j])] = want.get((ws[i], ws[j]), 0) + 1
    assert got == want


def test_order_fanout_dist_matches_counter():
    from collections import Counter

    from texel_ray.pipelines.relational import q_order_fanout_dist

    out = q_order_fanout_dist(SF_DIR).to_pandas()
    got = dict(zip(out.n_lines, out.n_orders))
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey"])
    per = Counter(li["l_orderkey"].to_pylist())
    want = Counter(per.values())
    assert got == dict(want)


def test_user_day_percentiles_matches_numpy():
    from texel_ray.pipelines.relational import q_user_day_percentiles

    out = q_user_day_percentiles(SF_DIR).to_pandas().iloc[0]
    ev = _events()
    n = ev.groupby(["user_id", "day"]).size().to_numpy()
    v = np.sort(n)
    pick = lambda q: int(v[int(np.ceil(q * len(v))) - 1])  # noqa: E731
    assert (
        int(out.n_user_days),
        int(out.p10),
        int(out.p50),
        int(out.p90),
    ) == (len(v), pick(0.10), pick(0.50), pick(0.90))


def test_path_motifs_matches_per_user_scan():
    from collections import Counter

    from texel_ray.pipelines.relational import q_path_motifs

    out = q_path_motifs(SF_DIR).to_pandas()
    ev = _events().sort_values(["user_id", "ts_us", "event_id"])
    cnt = Counter()
    for _, g in ev.groupby("user_id"):
        t = g.event_type.tolist()
        for i in range(len(t) - 2):
            cnt[(t[i], t[i + 1], t[i + 2])] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [((r.t1, r.t2, r.t3), int(r.n)) for r in out.itertuples()]
    assert got == want


def test_bucket_skew_report_matches_fold_hash():
    from collections import Counter

    from texel_ray.pipelines.relational import _fold_hash, q_bucket_skew_report

    out = q_bucket_skew_report(SF_DIR).to_pandas()
    got = dict(zip(out.bucket, out.n))
    ev = _events()
    b = _fold_hash(ev.user_id.to_numpy(), 512)
    want = dict(Counter(b.tolist()))
    assert got == want


def test_embedding_norm_outliers_matches_numpy():
    from texel_ray.pipelines.mlprep import q_embedding_norm_outliers

    out = q_embedding_norm_outliers(SF_DIR).to_pandas().iloc[0]
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    flat = np.asarray(emb["embedding"].combine_chunks().flatten(), np.float64)
    m = np.floor(flat.reshape(-1, 64) * 1_000_000.0).astype(np.int64)
    n2 = np.sort((m * m).sum(axis=1))
    q1 = int(n2[int(np.ceil(0.25 * len(n2))) - 1])
    q3 = int(n2[int(np.ceil(0.75 * len(n2))) - 1])
    iqr = q3 - q1
    n_out = int(
        ((2 * n2 < 2 * q1 - 3 * iqr) | (2 * n2 > 2 * q3 + 3 * iqr)).sum()
    )
    assert (int(out.n), int(out.q1_norm2), int(out.q3_norm2), int(out.n_outliers)) == (
        len(n2),
        q1,
        q3,
        n_out,
    )
