"""GeoPackage source/sink roundtrip tests (stdlib sqlite3)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from texel_ray.core.geom import wkb_decode, wkb_encode_point, wkb_encode_polygon
from texel_ray.sources.gpkg import (
    GeoPackageSink,
    gpkg_wkb_to_wkb,
    list_tables,
    read_gpkg,
    read_table_arrow,
    wkb_to_gpkg_wkb,
    write_gpkg,
)


@pytest.fixture()
def sample_gpkg(tmp_path):
    path = str(tmp_path / "sample.gpkg")
    square = [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]]
    table = pa.table(
        {
            "name": pa.array(["a", "b", None], pa.string()),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "geom_wkb": pa.array(
                [
                    wkb_encode_polygon(square),
                    wkb_encode_point(5.0, 5.0),
                    wkb_encode_polygon([[(1, 1), (2, 1), (2, 2), (1, 2)]]),
                ],
                pa.binary(),
            ),
        }
    )
    sink = GeoPackageSink(path, "features", table.schema, srs_id=0, pagesize=2)
    sink.write_batch(table)
    sink.close()
    return path


def test_gpkg_binary_header_roundtrip():
    wkb = wkb_encode_point(1.0, 2.0)
    blob = wkb_to_gpkg_wkb(wkb, srs_id=28992)
    assert blob[:2] == b"GP"
    assert gpkg_wkb_to_wkb(blob) == wkb


def test_gpkg_discovery_and_read(sample_gpkg):
    tables = list_tables(sample_gpkg)
    assert len(tables) == 1
    t = tables[0]
    assert t.name == "features" and t.geom_column == "geom_wkb"
    arrow = read_table_arrow(sample_gpkg, t)
    assert arrow.num_rows == 3
    assert set(arrow.column_names) >= {"name", "value", "geom_wkb"}
    kind, coords = wkb_decode(arrow["geom_wkb"][0].as_py())
    assert kind == "Polygon" and coords[0][0] == (0.0, 0.0)
    # extent recorded in gpkg_contents
    import sqlite3

    con = sqlite3.connect(sample_gpkg)
    minx, miny, maxx, maxy = con.execute(
        "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents"
    ).fetchone()
    con.close()
    assert (minx, miny, maxx, maxy) == (0.0, 0.0, 10.0, 10.0)


def test_gpkg_ray_roundtrip(sample_gpkg, ray_session, tmp_path):
    ds = read_gpkg(sample_gpkg, "features", chunk_rows=2)
    df = ds.to_pandas()
    assert len(df) == 3
    out = str(tmp_path / "out.gpkg")
    write_gpkg(ds, out, "copied")
    back = read_table_arrow(out, "copied")
    assert back.num_rows == 3
    assert sorted(back["value"].to_pylist()) == [1.5, 2.5, 3.5]


def test_gpkg_snap_pipeline(sample_gpkg, ray_session):
    """The reference's CLI path: gpkg source -> snap -> per-zoom rows."""
    from texel_ray.stages.snap_stage import snap_dataset

    ds = read_gpkg(sample_gpkg, "features").select_columns(["fid", "geom_wkb"])
    # geometry is in unit coords; snap on the simple test grid semantics
    # via NetherlandsRDNewQuad would be outside-grid -> use WebMercator
    snapped = snap_dataset(
        ds, "WebMercatorQuad", (2, 4), keep_points_and_lines=True
    )
    df = snapped.to_pandas()
    # 2 polygons + 1 point passthrough, each on 2 zooms (unless collapsed)
    assert set(df["tm_id"]) == {2, 4}
    assert len(df) >= 4


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/reference/example/example.gpkg"),
    reason="reference example.gpkg not present",
)
def test_read_real_world_gpkg(ray_session):
    """Read a real GeoPackage produced by standard GIS tooling (the
    reference repo's demo file) and run the snap pipeline over it."""
    path = "/root/reference/example/example.gpkg"
    tables = {t.name: t for t in list_tables(path)}
    assert {"polygons", "points", "lines"} <= set(tables)
    assert tables["polygons"].srs_id in (28992, 3857)
    polys = read_table_arrow(path, tables["polygons"])
    assert polys.num_rows == 6
    kinds = {wkb_decode(b)[0] for b in polys["geom_wkb"].to_pylist()}
    assert kinds <= {"Polygon", "MultiPolygon"}

    from texel_ray.stages.snap_stage import snap_dataset

    # the demo file's coordinates are in WebMercator range
    ds = read_gpkg(path, "polygons").select_columns(["fid", "geom_wkb"])
    snapped = snap_dataset(
        ds, "WebMercatorQuad", (5, 9), keep_points_and_lines=True
    ).to_pandas()
    assert set(snapped["tm_id"]) == {5, 9}
    assert len(snapped) >= 6  # every polygon survives on at least one zoom
