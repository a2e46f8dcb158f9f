"""Invariant tests for the round-3 spatial-analytics operators:
kde_heatmap (brute-force recompute), map_match_edges (mass conservation
+ nearest-by-construction), morans_i (clustered geotags => positive
autocorrelation), region_sphere_area (analytic spherical-cap area of
the 30x30-degree grid cells)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

from texel_ray.sources.images import ensure_images_for_sf_dir

SF_DIR = "/root/testdata/sf0.001"


def _points():
    path = ensure_images_for_sf_dir(SF_DIR)
    t = pq.read_table(path, columns=["lon", "lat"])
    return t["lon"].to_numpy(), t["lat"].to_numpy()


def test_kde_heatmap_matches_bruteforce():
    from texel_ray.pipelines.mlprep import q_kde_heatmap

    g = 0.5
    out = q_kde_heatmap(SF_DIR, g=g).to_pandas()
    lon, lat = _points()
    cx = np.floor(lon / g).astype(np.int64)
    cy = np.floor(lat / g).astype(np.int64)
    got = {
        (int(r.gx), int(r.gy)): (int(r.n), int(r.density))
        for r in out.itertuples()
    }
    # brute force over the occupied cells
    occ = set(zip(cx.tolist(), cy.tolist()))
    assert set(got) == occ
    for tx, ty in list(occ)[:50]:
        ctr_x = (tx + 0.5) * g
        ctr_y = (ty + 0.5) * g
        d2 = (lon - ctr_x) ** 2 + (lat - ctr_y) ** 2
        ok = d2 <= g * g
        wfp = np.floor(1048576.0 * (1.0 - d2[ok] / (g * g))).astype(np.int64)
        assert got[(tx, ty)] == (int(ok.sum()), int(wfp.sum()))


def test_map_match_edges_mass_and_nearest():
    from texel_ray.pipelines.mlprep import q_map_match_edges
    from texel_ray.sources.regions import region_boundary_edges

    out = q_map_match_edges(SF_DIR).to_pandas()
    lon, lat = _points()
    assert out["n"].sum() == len(lon)  # every point matched exactly once
    e = region_boundary_edges()
    valid = dict(
        zip(e["edge_id"].to_pylist(), e["region_id"].to_pylist())
    )
    for r in out.itertuples():
        assert valid[int(r.edge_id)] == int(r.region_id)


def test_morans_i_positive_on_clustered_geotags():
    from texel_ray.pipelines.queries import q_morans_i

    out = q_morans_i(SF_DIR, zoom=6)
    row = out.iloc[0]
    # urban clusters make neighbouring tiles correlated
    assert row["w_pairs"] > 0
    assert row["morans_i"] > 0.05
    # the exact integers and the double agree
    assert row["morans_i"] == (
        float(row["n_cells"]) * float(row["num"])
    ) / (float(row["w_pairs"]) * float(row["den"]))


def test_region_sphere_area_matches_analytic():
    from texel_ray.pipelines.mlprep import q_region_sphere_area
    from texel_ray.sources.regions import generate_regions_table

    out = q_region_sphere_area(SF_DIR).to_pandas().set_index("region_id")
    regs = generate_regions_table().to_pandas().set_index("region_id")
    R = 6371000.0
    checked = 0
    for rid, r in regs.iterrows():
        if not r["name"].startswith("grid_"):
            continue
        lam1, lam2 = math.radians(r.minx), math.radians(r.maxx)
        phi1, phi2 = math.radians(r.miny), math.radians(r.maxy)
        analytic_km2 = (
            R * R * (lam2 - lam1) * (math.sin(phi2) - math.sin(phi1)) / 1e6
        )
        got = out.loc[rid, "area_km2"]
        assert abs(got - analytic_km2) / analytic_km2 < 1e-3, (rid, got, analytic_km2)
        checked += 1
    assert checked >= 40
    assert (out["area_fp"] >= 0).all()


def test_dissolve_regions_band_analytic_and_topology():
    from texel_ray.pipelines.queries import q_dissolve_regions

    out = q_dissolve_regions(SF_DIR, res=0.25)
    bands = out[out.grp.str.startswith("band_")]
    # a band = 4 stacked 30x30-degree rects at 0.25 deg: 120x480 cells,
    # one hole-free component
    assert len(bands) == 12
    assert (bands.n_cells == 120 * 480).all()
    assert (bands.perimeter == 2 * (120 + 480)).all()
    assert (bands.euler_char == 1).all()
    sites = out[out.grp.str.startswith("site_")]
    # each site union (two concentric rects + hexagon) is one hole-free
    # component with a real footprint
    assert len(sites) == 5
    assert (sites.euler_char == 1).all()
    assert (sites.n_cells >= 10).all()


def test_pca_scatter_and_projection():
    import numpy as np
    import pyarrow.parquet as pq

    from texel_ray.pipelines.mlprep import pca_project, q_pca_scatter

    out = q_pca_scatter(SF_DIR).to_pandas()
    # brute-force scatter over the quantized embeddings
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    q = np.floor(m * 1024.0).astype(np.int64)
    S = q.T @ q
    got = {(int(r.a), int(r.b)): int(r.s) for r in out.itertuples()}
    assert got[(-1, -1)] == len(q)
    for i in (0, 3, 63):
        assert got[(i, -1)] == int(q[:, i].sum())
        for j in (i, 17, 63):
            if j >= i:
                assert got[(i, j)] == int(S[i, j])
    w, basis = pca_project(out, k=4)
    # eigenvalues descending, basis orthonormal, sign convention applied
    assert (np.diff(w) <= 1e-9).all()
    assert np.allclose(basis.T @ basis, np.eye(4), atol=1e-9)
    flip = np.abs(basis).argmax(axis=0)
    assert (basis[flip, np.arange(4)] > 0).all()
    # projected variance (in quantized units) matches the eigenvalues
    cov = np.cov(q.T.astype(np.float64), bias=False)
    proj_var = np.diag(basis.T @ cov @ basis)
    assert np.allclose(proj_var, w, rtol=1e-6)


def test_hotspots_gi_flags_urban_tiles():
    import math

    from texel_ray.pipelines.queries import q_hotspots_gi
    from texel_ray.sources.images import _URBAN_CENTERS

    out = q_hotspots_gi(SF_DIR, zoom=6)
    assert len(out) > 0
    # every hot tile must sit near an urban cluster (z6 tile distance <= 2)
    centers = []
    for lon, lat in _URBAN_CENTERS:
        # mercator tile of the center at z6
        x = (lon + 180.0) / 360.0 * 64
        y = (
            (1.0 - math.log(math.tan(math.radians(lat))
                            + 1.0 / math.cos(math.radians(lat))) / math.pi)
            / 2.0 * 64
        )
        centers.append((int(x), int(y)))
    for r in out.itertuples():
        d = min(
            max(abs(r.tile_x - cx), abs(r.tile_y - cy)) for cx, cy in centers
        )
        assert d <= 2, (r.tile_x, r.tile_y, d)
    # exact-integer columns are self-consistent: k <= 9, g_sum >= n
    assert (out.k <= 9).all() and (out.g_sum >= out.n).all()


def test_equalize_image_monotone_and_stretching():
    from texel_ray.stages.multimodal import equalize_image

    rng = np.random.default_rng(9)
    # low-contrast image: values confined to [100, 140)
    img = rng.integers(100, 140, size=(16, 16, 3)).astype(np.uint8)
    eq = equalize_image(img)
    # monotone: pixel ordering by value is preserved channel-wise
    flat_in = img.reshape(-1).astype(np.int64)
    flat_out = eq.reshape(-1).astype(np.int64)
    order = np.argsort(flat_in, kind="stable")
    assert (np.diff(flat_out[order]) >= 0).all()
    # contrast stretched to (nearly) full range
    assert int(eq.max()) == 255
    assert int(eq.min()) < 20
    # flat image maps without crashing and stays constant
    flat = np.full((4, 4, 3), 7, dtype=np.uint8)
    eqf = equalize_image(flat)
    assert len(np.unique(eqf)) == 1


def test_dissolve_topology_cross_checks_marching_squares():
    """Tie dissolve's cell-complex invariants to an independent geometry
    path: re-rasterize each group's union with plain numpy PIP, vectorize
    the mask with core/marching, and check n_loops == euler_char (hole-
    free unions: boundary loops == components == chi). Marching uses the
    midpoint rule (chamfered corners), so area/perimeter are checked as
    bounds: each chamfer trims half a half-unit^2 from the full cell
    union and there are at most `perimeter` corners."""
    from texel_ray.core.geom import wkb_decode
    from texel_ray.core.marching import vectorize_mask
    from texel_ray.pipelines.queries import q_dissolve_regions
    from texel_ray.sources.regions import generate_regions_table

    res = 0.25
    nx = int(round(360.0 / res))
    ny = int(round(170.0 / res))
    regs = generate_regions_table()
    cells: dict[str, set] = {}
    for rid, name, kind, minx, miny, maxx, maxy, buf in zip(
        regs["region_id"].to_pylist(), regs["name"].to_pylist(),
        regs["kind"].to_pylist(), regs["minx"].to_pylist(),
        regs["miny"].to_pylist(), regs["maxx"].to_pylist(),
        regs["maxy"].to_pylist(), regs["geom_wkb"].to_pylist(),
    ):
        part = name.split("_")[1]
        grp = f"band_{part}" if name.startswith("grid_") else f"site_{part}"
        s = cells.setdefault(grp, set())
        px0 = max(int(np.floor((minx + 180.0) / res)) - 1, 0)
        px1 = min(int(np.floor((maxx + 180.0) / res)) + 1, nx - 1)
        py0 = max(int(np.floor((miny + 85.0) / res)) - 1, 0)
        py1 = min(int(np.floor((maxy + 85.0) / res)) + 1, ny - 1)
        pxs, pys = np.meshgrid(
            np.arange(px0, px1 + 1), np.arange(py0, py1 + 1)
        )
        pxs, pys = pxs.ravel(), pys.ravel()
        lon = -180.0 + (pxs + 0.5) * res
        lat = -85.0 + (pys + 0.5) * res
        if kind == "rect":
            inside = (lon >= minx) & (lon <= maxx) & (lat >= miny) & (lat <= maxy)
        else:
            _, rings = wkb_decode(buf)
            ring = rings[0]
            inside = np.ones(len(lon), dtype=bool)
            for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
                inside &= ((x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1)) >= 0
        for p, q in zip(pxs[inside], pys[inside]):
            s.add((int(p), int(q)))
    out = q_dissolve_regions(SF_DIR, res=res).set_index("grp")
    for grp, cs in cells.items():
        xs = np.array([c[0] for c in cs])
        ys = np.array([c[1] for c in cs])
        mask = np.zeros(
            (ys.max() - ys.min() + 1, xs.max() - xs.min() + 1), dtype=bool
        )
        mask[ys - ys.min(), xs - xs.min()] = True
        v = vectorize_mask(mask)
        row = out.loc[grp]
        assert len(cs) == row.n_cells, grp
        assert v["n_loops"] == row.euler_char, (grp, v["n_loops"])
        # area2 = 2 x shoelace in half-units: full union = 8 * n_cells,
        # minus one unit per chamfered corner (bounded by corner count)
        assert v["area2"] <= 8 * row.n_cells, grp
        assert v["area2"] >= 8 * row.n_cells - 2 * row.perimeter, grp


def test_dist_join_paths_agree():
    # the cogroup kernel (default) and the Dataset.join path must
    # produce identical per-type rollups
    from texel_ray.pipelines.relational import q_dist_join_events

    a = (
        q_dist_join_events(SF_DIR)
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    b = (
        q_dist_join_events(SF_DIR, use_join=True)
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert (a.n_pairs > 0).any()


def test_region_buffer_rect_analytic():
    # mitered buffer of an axis-aligned rect is just the enlarged rect:
    # area (w+2r)(h+2r), perimeter 2(w+h+4r)
    from texel_ray.pipelines.mlprep import q_region_buffer
    from texel_ray.sources.regions import generate_regions_table

    r = 0.1
    out = q_region_buffer(SF_DIR, r=r).to_pandas().set_index("region_id")
    regs = generate_regions_table().to_pandas().set_index("region_id")
    checked = 0
    for rid, row in regs.iterrows():
        if row["kind"] != "rect":
            continue
        w = row.maxx - row.minx
        h = row.maxy - row.miny
        area = out.loc[rid, "area_fp"] / 1e6 / 2.0  # shoelace = 2*area
        perim = out.loc[rid, "perim_fp"] / 1e6
        assert abs(area - (w + 2 * r) * (h + 2 * r)) < 1e-4, rid
        assert abs(perim - 2 * (w + h + 4 * r)) < 1e-4, rid
        checked += 1
    assert checked >= 50
    # hexagons: mitered buffer area must sit between the round-join
    # analytic (A + P*r + pi*r^2) and the miter bound
    # (A + P*r + r^2 * 6*tan(30deg)) for a regular hexagon
    from texel_ray.core.geom import wkb_decode

    regs_t = generate_regions_table()
    hex_checked = 0
    for rid, kind, buf in zip(
        regs_t["region_id"].to_pylist(), regs_t["kind"].to_pylist(),
        regs_t["geom_wkb"].to_pylist(),
    ):
        if kind != "poly":
            continue
        _, rings = wkb_decode(buf)
        v = np.asarray(rings[0], dtype=np.float64)
        x, y = v[:, 0], v[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        A = 0.5 * abs(np.sum(x * y2 - x2 * y))
        P = np.sum(np.hypot(x2 - x, y2 - y))
        got = out.loc[rid, "area_fp"] / 1e6 / 2.0
        lo = A + P * r + math.pi * r * r
        hi = A + P * r + r * r * 6.0 * math.tan(math.pi / 6.0)
        assert lo - 1e-4 <= got <= hi + 1e-4, (rid, got, lo, hi)
        hex_checked += 1
    assert hex_checked >= 5


def test_validate_corpus_detects_corruption():
    # the expectations gate must actually flag bad rows (the clean
    # corpus exercises the zero-violation path via the oracle)
    import pyarrow as pa

    from texel_ray.pipelines.mlprep import corpus_checks

    bad = pa.table(
        {
            "image_id": pa.array(["a", "b", "c"]),
            "caption": pa.array(["ok word #00000001", "BAD CAPTION", "x #123"]),
            "lon": pa.array([0.0, 200.0, 10.0]),
            "lat": pa.array([0.0, 10.0, -95.0]),
            "w": pa.array([16, 0, 16], pa.int32()),
            "h": pa.array([16, 16, -1], pa.int32()),
            "fmt": pa.array(["png", "gif", "jpeg"]),
            "bytes": pa.array([b"xx", b"", b"yy"], pa.binary()),
        }
    )
    out = corpus_checks(bad)
    got = dict(zip(out["check"].to_pylist(), out["n_violations"].to_pylist()))
    assert got == {
        "caption_format": 2,
        "geotag_range": 2,
        "dims_positive": 2,
        "payload_present": 1,
        "fmt_allowed": 1,
    }
    assert set(out["n_rows"].to_pylist()) == {3}


def test_fold_hash_matches_duckdb_in_overflow_zone():
    # the shared Knuth fold hash must agree with its SQL mirror even for
    # ids past the uint64-overflow threshold (~6.95e9) that broke the
    # original raw-multiply form in DuckDB
    import duckdb

    from texel_ray.pipelines.relational import _fold_hash

    ids = np.array(
        [0, 1, 2147483647, 2147483648, 6946401183, 10_000_000_000,
         9_223_372_036_854_775_000],
        dtype=np.int64,
    )
    got = _fold_hash(ids, 10000)
    vals = ", ".join(f"({int(i)})" for i in ids)
    df = duckdb.sql(
        f"SELECT ((id & 2147483647) * 2654435761) % 10000 AS h "
        f"FROM (VALUES {vals}) t(id)"
    ).df()
    assert got.tolist() == df["h"].astype("int64").tolist()


def test_dlit_parses_bit_identical_in_duckdb():
    # bare 17-digit decimals go through DuckDB's DECIMAL->DOUBLE cast
    # (1 ulp off for ~13% of values); dlit's e-notation must parse
    # bit-identical to the Python float for every literal
    import duckdb

    from texel_ray.pipelines.common import dlit

    rng = np.random.default_rng(123)
    vals = np.concatenate(
        [
            rng.uniform(-180, 180, 200),
            rng.normal(scale=1e-6, size=50),
            rng.normal(scale=1e12, size=50),
            np.array([0.0, -0.0, 0.5, 51.407399999999996]),
        ]
    )
    exprs = ", ".join(f"({dlit(v)})" for v in vals)
    df = duckdb.sql(f"SELECT x FROM (VALUES {exprs}) t(x)").df()
    got = df["x"].to_numpy()
    assert all(
        np.float64(a).tobytes() == np.float64(b).tobytes()
        for a, b in zip(got, vals)
    )
