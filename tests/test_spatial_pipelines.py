"""Tests: dataset-level snap stage, raster tile cutting (reassembly
invariant), resumable partitioned writes with lineage manifest."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from texel_ray.core.imagecodec import decode_image, psnr
from texel_ray.core.geom import wkb_decode, wkb_encode_point, wkb_encode_polygon
from texel_ray.sources.images import ensure_images_for_sf_dir
from texel_ray.stages.snap_stage import SnapStage
from texel_ray.stages.tilecut import TileCutter, reassemble_image

SF_DIR = "/root/testdata/sf0.001"


def test_snap_stage_dispatch():
    # polygon snapped per zoom; point passes through to every zoom
    square = [[(100000.0, 450000.0), (120000.0, 450000.0), (120000.0, 470000.0),
               (100000.0, 470000.0)]]
    batch = pa.table(
        {
            "fid": pa.array([1, 2], pa.int64()),
            "geom_wkb": pa.array(
                [wkb_encode_polygon(square), wkb_encode_point(110000.0, 460000.0)],
                pa.binary(),
            ),
        }
    )
    stage = SnapStage("NetherlandsRDNewQuad", (5, 9))
    out = stage(batch)
    assert set(out.column_names) == {"fid", "tm_id", "geom_wkb"}
    rows = list(zip(out["fid"].to_pylist(), out["tm_id"].to_pylist()))
    assert sorted(rows) == [(1, 5), (1, 9), (2, 5), (2, 9)]
    kind, coords = wkb_decode(out["geom_wkb"][0].as_py())
    assert kind == "Polygon" and len(coords[0]) >= 4
    assert stage.last_counters["pre"] == 2
    assert stage.last_counters["non_polygon"] == 1


def test_snap_stage_matches_kernel_golden():
    # same "missing corner" polygon as the golden corpus, through the stage
    from tests.golden_util import load_cases

    case = next(
        c for c in load_cases("snap_polygon_cases.json") if c["name"] == "missing corner"
    )
    ring = [tuple(p) for p in case["polygon"][0]]
    batch = pa.table(
        {
            "fid": pa.array([7], pa.int64()),
            "geom_wkb": pa.array([wkb_encode_polygon([ring])], pa.binary()),
        }
    )
    stage = SnapStage("NetherlandsRDNewQuad", (14,), keep_points_and_lines=True)
    out = stage(batch)
    kind, coords = wkb_decode(out["geom_wkb"][0].as_py())
    want = case["want"]["14"][0][0]
    assert [list(p) for p in coords[0]] == want


def test_tilecut_reassembly_invariant():
    path = ensure_images_for_sf_dir(SF_DIR)
    t = pq.read_table(path).slice(0, 300)
    cutter = TileCutter(zoom=13)
    pieces = cutter(t)
    assert pieces.num_rows >= 300  # some images cross tile boundaries
    by_image: dict[str, list] = {}
    for i in range(pieces.num_rows):
        row = {c: pieces[c][i].as_py() for c in pieces.column_names}
        by_image.setdefault(row["image_id"], []).append(row)
    originals = {t["image_id"][i].as_py(): i for i in range(t.num_rows)}
    n_multi = 0
    for image_id, rows in list(by_image.items())[:100]:
        i = originals[image_id]
        w, h = t["w"][i].as_py(), t["h"][i].as_py()
        covered = sum(r["pw"] * r["ph"] for r in rows)
        assert covered == w * h, f"{image_id}: pieces do not partition the image"
        rebuilt = reassemble_image(rows, w, h)
        orig = decode_image(t["bytes"][i].as_py(), t["fmt"][i].as_py())
        if t["fmt"][i].as_py() == "png":
            assert (rebuilt == orig).all()
        else:
            assert psnr(orig, rebuilt) >= 40.0
        assert rows[0]["caption"] == t["caption"][i].as_py()
        if len(rows) > 1:
            n_multi += 1
    assert n_multi > 0  # the invariant actually exercised boundary crossing


def test_resumable_write_manifest(ray_session, tmp_path):
    import ray.data

    from texel_ray.state.manifest import Manifest, resumable_write

    ds = ray.data.from_arrow(
        pa.table(
            {
                "tm_id": pa.array([4] * 10 + [8] * 20, pa.int32()),
                "v": pa.array(range(30)),
            }
        )
    )
    out = str(tmp_path / "tiles")
    written, skipped = resumable_write(
        ds, out, partition_col="tm_id", range_cols=("v",)
    )
    assert sorted(written) == [4, 8] and skipped == []
    recs = Manifest(out).completed()
    assert len(recs) == 2
    assert {r["rows"] for r in recs.values()} == {10, 20}
    # lineage key ranges from parquet footer stats (north rule: input
    # fragments + cell ranges + row counts per partition)
    by_rows = {r["rows"]: r for r in recs.values()}
    assert by_rows[10]["ranges"]["v"] == [0, 9]
    assert by_rows[20]["ranges"]["v"] == [10, 29]
    # per-partition METRICS (bytes on disk, file count) ride the record
    for r in recs.values():
        assert r["metrics"]["bytes"] > 0
        assert r["metrics"]["n_files"] >= 1
    # rerun: everything skipped, nothing rewritten
    written2, skipped2 = resumable_write(ds, out, partition_col="tm_id")
    assert written2 == [] and sorted(skipped2) == [4, 8]


def test_project_wkb_roundtrip():
    from texel_ray.pipelines.spatial import project_wkb_to_mercator

    ring = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    batch = pa.table({"geom_wkb": pa.array([wkb_encode_polygon([ring])], pa.binary())})
    out = project_wkb_to_mercator(batch)
    kind, coords = wkb_decode(out["geom_wkb"][0].as_py())
    assert kind == "Polygon"
    xs = [p[0] for p in coords[0]]
    assert max(xs) == pytest.approx(111319.49079327357)


def test_vector_tile_cutting_partitions_area():
    from texel_ray.pipelines.spatial import project_wkb_to_mercator
    from texel_ray.sources.regions import generate_regions_table
    from texel_ray.stages.vectorcut import VectorTileCutter, clipped_area
    from texel_ray.core.geom import wkb_decode
    from texel_ray.core.geom import shoelace

    regions = generate_regions_table()
    batch = project_wkb_to_mercator(
        regions.select(["region_id", "geom_wkb"])
    )
    cutter = VectorTileCutter("WebMercatorQuad", zoom=6)
    out = cutter(batch)
    assert out.num_rows > batch.num_rows  # big rects span several tiles
    # clipped pieces partition each polygon: areas sum to the original
    areas: dict[int, float] = {}
    for i in range(out.num_rows):
        rid = out["region_id"][i].as_py()
        areas[rid] = areas.get(rid, 0.0) + clipped_area(out["geom_wkb"][i].as_py())
    for i in range(batch.num_rows):
        rid = batch["region_id"][i].as_py()
        kind, coords = wkb_decode(batch["geom_wkb"][i].as_py())
        if kind != "Polygon":
            continue
        original = shoelace(coords[0])
        if rid in areas and original > 0:
            assert abs(areas[rid] - original) / original < 1e-9, rid


def test_resumable_write_replaces_crashed_partition(ray_session, tmp_path):
    """A partition with files on disk but NO manifest record (crash
    mid-write) must be replaced, not appended to, on rerun."""
    import pyarrow.parquet as pq_
    import ray.data

    from texel_ray.state.manifest import resumable_write

    ds = ray.data.from_arrow(
        pa.table({"tm_id": pa.array([4] * 10, pa.int32()), "v": pa.array(range(10))})
    )
    out = tmp_path / "tiles"
    # simulate a crashed partial write: files exist, no manifest
    part_dir = out / "tm_id=4"
    part_dir.mkdir(parents=True)
    pq_.write_table(pa.table({"v": pa.array([999, 998])}), part_dir / "stale.parquet")

    written, skipped = resumable_write(ds, str(out), partition_col="tm_id")
    assert written == [4]
    got = pq_.read_table(str(out)).to_pandas()
    assert len(got) == 10  # stale rows replaced, not appended
    assert 999 not in set(got["v"])


def test_rasterize_regions_rect_counts_independent(ray_session):
    """Vector->raster burn: every rect region's burned-pixel count must
    equal the closed-form lattice count (centers at -180 + (px+0.5)*res
    inside the inclusive bbox), computed here without any PIP code; the
    burned pixel bbox must bound the count."""
    import numpy as np
    import pyarrow.parquet as pq

    from texel_ray.pipelines.queries import q_rasterize_regions
    from texel_ray.sources.regions import regions_parquet_path

    res = 1.0
    out = q_rasterize_regions("/root/testdata/sf0.001", res=res).to_pandas()
    out = out.set_index("region_id")
    regions = pq.read_table(regions_parquet_path()).to_pandas()

    checked = 0
    for r in regions.itertuples():
        if r.kind != "rect":
            continue
        # closed-form: px with -180 + (px+.5)*res in [minx, maxx] (inclusive,
        # matching both the joiner's bbox test and the SQL oracle)
        px = np.arange(360)
        py = np.arange(170)
        cx = -180.0 + (px + 0.5) * res
        cy = -85.0 + (py + 0.5) * res
        n = int(((cx >= r.minx) & (cx <= r.maxx)).sum()) * int(
            ((cy >= r.miny) & (cy <= r.maxy)).sum()
        )
        if n == 0:
            assert r.region_id not in out.index
            continue
        row = out.loc[r.region_id]
        assert int(row["n_px"]) == n, (r.region_id, r.name)
        area = (row["px_max"] - row["px_min"] + 1) * (row["py_max"] - row["py_min"] + 1)
        assert row["n_px"] <= area
        checked += 1
    assert checked >= 20  # urban + world-grid rects actually exercised


def test_spatial_block_split_leakage_free(ray_session):
    """Every image in one z6 block gets one split (the leakage property),
    splits are exhaustive, and block proportions sit near 80/10/10."""
    from texel_ray.pipelines.queries import q_spatial_block_split
    from texel_ray.pipelines.relational import _fold_hash
    from texel_ray.sources import images as images_src
    from texel_ray.stages.tiles import encode_tiles

    df = q_spatial_block_split(SF_DIR).to_pandas()
    assert set(df["split"]) <= {"train", "val", "test"}
    assert "train" in set(df["split"])

    # per-image recomputation: split must be a pure function of the block
    ds = images_src.read_images(SF_DIR, columns=["lon", "lat"])
    enc = ds.map_batches(
        lambda b: encode_tiles(b, "WebMercatorQuad", (6,), keep_columns=[]),
        batch_format="pyarrow",
    ).to_pandas()
    key = enc["tile_x"].to_numpy() * 64 + enc["tile_y"].to_numpy()
    h = _fold_hash(key, 100)
    split = np.where(h < 10, "test", np.where(h < 20, "val", "train"))
    import pandas as pd

    per_block = pd.DataFrame({"key": key, "split": split}).groupby("key")["split"].nunique()
    assert (per_block == 1).all()
    # totals agree with the pipeline rollup
    want = pd.Series(split).value_counts()
    got = df.set_index("split")["n_images"]
    for s in want.index:
        assert got[s] == want[s]
