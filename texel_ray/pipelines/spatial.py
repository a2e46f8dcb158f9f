"""Spatial pipelines: dataset-level snapping, raster tile cutting, and the
resumable per-zoom partitioned tile write."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.geom import wkb_decode, wkb_encode_multipolygon, wkb_encode_polygon
from ..core.tms import lonlat_to_webmercator_np


def project_wkb_to_mercator(batch: pa.Table, geom_col: str = "geom_wkb") -> pa.Table:
    """Reproject WKB polygon coordinates from lon/lat to EPSG:3857 meters."""
    out = []
    for buf in batch[geom_col].to_pylist():
        kind, coords = wkb_decode(buf)
        if kind == "Polygon":
            rings = [
                list(zip(*lonlat_to_webmercator_np(*map(np.array, zip(*ring)))))
                for ring in coords
            ]
            out.append(wkb_encode_polygon(rings))
        elif kind == "MultiPolygon":
            polys = []
            for poly in coords:
                polys.append(
                    [
                        list(zip(*lonlat_to_webmercator_np(*map(np.array, zip(*ring)))))
                        for ring in poly
                    ]
                )
            out.append(wkb_encode_multipolygon(polys))
        else:
            out.append(buf)
    idx = batch.column_names.index(geom_col)
    return batch.set_column(idx, geom_col, pa.array(out, pa.binary()))


def q_snap_regions(sf_dir: str, zooms: tuple[int, ...] = (6, 10)):
    """Snap the region polygons to the WebMercator grid at several zooms;
    emit a deterministic per-(region, zoom) geometry summary.

    Mirrors the reference CLI run (snap every feature of a table for a
    zoom list, fan out per zoom); exact vertex-level semantics are pinned
    by the golden kernel suite, this pipeline checks the dataset shape.
    """
    import ray.data

    from ..sources.regions import regions_parquet_path
    from ..stages.snap_stage import snap_dataset

    ds = ray.data.read_parquet(
        regions_parquet_path(), columns=["region_id", "geom_wkb"]
    )
    ds = ds.map_batches(project_wkb_to_mercator, batch_format="pyarrow")
    snapped = snap_dataset(
        ds, "WebMercatorQuad", zooms, keep_points_and_lines=True
    )

    def summarize(batch: pa.Table) -> pa.Table:
        n_vertices = []
        n_rings = []
        for buf in batch["geom_wkb"].to_pylist():
            kind, coords = wkb_decode(buf)
            if kind == "Polygon":
                rings = coords
            elif kind == "MultiPolygon":
                rings = [r for poly in coords for r in poly]
            elif kind == "LineString":
                rings = [coords]
            else:
                rings = [[coords]]
            n_rings.append(len(rings))
            n_vertices.append(sum(len(r) for r in rings))
        return pa.table(
            {
                "region_id": batch["region_id"],
                "tm_id": batch["tm_id"],
                "n_rings": pa.array(n_rings, pa.int64()),
                "n_vertices": pa.array(n_vertices, pa.int64()),
            }
        )

    return snapped.map_batches(summarize, batch_format="pyarrow")


def snap_throughput(sf_dir: str, copies: int = 40, zooms: tuple[int, ...] = (6, 10)):
    """Snap-kernel throughput at volume: the region polygon corpus
    replicated `copies` times (translated by multiples of 0.5 degrees so
    every copy is distinct work), snapped at several zooms. Returns the
    per-(tm_id) output row counts — consumption forces the full snap."""
    import ray.data

    from ..sources.regions import generate_regions_table
    from ..stages.agg import partial_count_groupby
    from ..stages.snap_stage import snap_dataset

    base = generate_regions_table()
    tables = []
    for c in range(copies):
        dx = (c % 8) * 0.5 - 2.0
        dy = (c // 8) * 0.25 - 1.0
        shifted = []
        for buf in base["geom_wkb"].to_pylist():
            kind, coords = wkb_decode(buf)
            if kind == "Polygon":
                shifted.append(
                    wkb_encode_polygon(
                        [[(x + dx, y + dy) for x, y in ring] for ring in coords]
                    )
                )
            else:
                shifted.append(buf)
        tables.append(
            pa.table(
                {
                    "region_id": pa.compute.add(base["region_id"], c * 1000),
                    "geom_wkb": pa.array(shifted, pa.binary()),
                }
            )
        )
    ds = ray.data.from_arrow(pa.concat_tables(tables)).repartition(32)
    ds = ds.map_batches(project_wkb_to_mercator, batch_format="pyarrow")
    snapped = snap_dataset(ds, "WebMercatorQuad", zooms, keep_points_and_lines=True)
    return partial_count_groupby(snapped, ["tm_id"], alias="n_features", coalesce=4)


def q_tilecut(sf_dir: str, zoom: int = 13):
    """Cut image rasters along the z13 tile grid; per-tile piece stats.

    Deterministic: per (tile): piece count, distinct images, pixel area.
    """
    from ..sources.images import read_images
    from ..stages.tilecut import cut_images

    ds = read_images(
        sf_dir, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "lon", "lat"]
    )
    pieces = cut_images(ds, zoom=zoom)

    def to_area(batch: pa.Table) -> pa.Table:
        area = pa.compute.multiply(
            batch["pw"].cast(pa.int64()), batch["ph"].cast(pa.int64())
        )
        return pa.table(
            {
                "tm_id": batch["tm_id"],
                "tile_x": batch["tile_x"],
                "tile_y": batch["tile_y"],
                "pixel_area": area,
            }
        )

    from ..stages.agg import partial_sum_groupby

    return partial_sum_groupby(
        pieces.map_batches(to_area, batch_format="pyarrow"),
        ["tm_id", "tile_x", "tile_y"],
        ["pixel_area"],
        count_alias="n_pieces",
    )


def q_vector_tilecut(sf_dir: str, zoom: int = 6):
    """Vector tile cutting: snap region polygons, clip to tile boundaries,
    per-tile feature counts + integer-truncated clipped area (m^2).
    Snap -> clip is the full reference-style vector-tile preprocessing
    chain; area partitioning is pinned by pytest."""
    import ray.data

    from ..sources.regions import regions_parquet_path
    from ..stages.agg import partial_sum_groupby
    from ..stages.snap_stage import snap_dataset
    from ..stages.vectorcut import VectorTileCutter, clipped_area

    ds = ray.data.read_parquet(
        regions_parquet_path(), columns=["region_id", "geom_wkb"]
    )
    ds = ds.map_batches(project_wkb_to_mercator, batch_format="pyarrow")
    snapped = snap_dataset(ds, "WebMercatorQuad", (zoom,), keep_points_and_lines=False)
    clipped = snapped.map_batches(
        VectorTileCutter,
        fn_constructor_kwargs={"tms": "WebMercatorQuad", "zoom": zoom},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )

    def to_area(batch: pa.Table) -> pa.Table:
        areas = np.array(
            [clipped_area(b) for b in batch["geom_wkb"].to_pylist()], dtype=np.float64
        )
        return pa.table(
            {
                "tm_id": batch["tm_id"],
                "tile_x": batch["tile_x"],
                "tile_y": batch["tile_y"],
                "area_m2": pa.array(np.trunc(areas).astype(np.int64)),
            }
        )

    return partial_sum_groupby(
        clipped.map_batches(to_area, batch_format="pyarrow"),
        ["tm_id", "tile_x", "tile_y"],
        ["area_m2"],
        count_alias="n_features",
        coalesce=4,
    )


def write_tiles(sf_dir: str, out_dir: str, zooms: tuple[int, ...] = (4, 8)):
    """End-to-end resumable tile write: PIP-joined tile rows, partitioned
    by tm_id with per-partition lineage records (see state/manifest.py)."""
    from ..sources.images import images_parquet_path, read_images
    from ..sources.regions import regions_parquet_path
    from ..stages.pip_join import PIPJoiner
    from ..stages.tiles import encode_tiles
    from ..state.manifest import resumable_write

    ds = read_images(sf_dir, columns=["image_id", "lon", "lat"])
    ds = ds.map_batches(
        PIPJoiner,
        fn_constructor_kwargs={
            "regions_path": regions_parquet_path(),
            "keep_columns": ["image_id", "lon", "lat"],
        },
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(2, 16),
    )
    ds = ds.map_batches(
        lambda b: encode_tiles(
            b, "WebMercatorQuad", zooms, keep_columns=["image_id", "region_id"]
        ),
        batch_format="pyarrow",
        batch_size=8192,
    )
    return resumable_write(
        ds, out_dir, partition_col="tm_id", inputs=[images_parquet_path(sf_dir)]
    )


def q_tile_atlas(sf_dir: str, zoom: int = 6, max_pieces: int = 256):
    """Tile ASSEMBLY on the driver surface: cut -> groupby(tile) ->
    per-tile atlas (pieces stacked deterministically into one PNG) — the
    engine's ONE payload-moving shuffle (moving pieces IS the
    computation; SCALE.md documents the refs-only alternative). Emits
    per tile the atlas CRC/dims + piece accounting instead of the binary
    (comparator-safe). INDEPENDENT golden: a plain single-node loop
    re-derives the cut windows and stacks the same atlases."""
    import zlib

    from ..sources.images import read_images
    from ..stages.tilecut import assemble_tiles, cut_images

    ds = read_images(
        sf_dir, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "lon", "lat"]
    )
    pieces = cut_images(ds, zoom=zoom)
    # prune before the payload shuffle: the assembly needs neither the
    # caption nor the piece extents — only tile key, order keys, payload
    pieces = pieces.select_columns(
        ["tm_id", "tile_x", "tile_y", "image_id", "px", "py", "bytes", "fmt"]
    )
    atlases = assemble_tiles(pieces, max_pieces_per_tile=max_pieces)

    def summarize(batch: pa.Table) -> pa.Table:
        crcs = [zlib.crc32(b) for b in batch["atlas"].to_pylist()]
        idx_md5 = [
            __import__("hashlib").md5(s.encode()).hexdigest()
            for s in batch["piece_index"].to_pylist()
        ]
        return pa.table(
            {
                "tm_id": batch["tm_id"],
                "tile_x": batch["tile_x"],
                "tile_y": batch["tile_y"],
                "n_pieces": batch["n_pieces"],
                "dropped": batch["dropped"],
                "atlas_crc": pa.array(crcs, pa.int64()),
                "index_md5": pa.array(idx_md5, pa.string()),
            }
        )

    return atlases.map_batches(summarize, batch_format="pyarrow")


def q_snap_deadletter(sf_dir: str, zooms: tuple[int, ...] = (0, 10)):
    """Snap with the dead-letter channel: features a plain snap run
    silently drops surface as status rows with the input geometry's WKT
    (zoom 0's ~10 km snap grid collapses city-sized polygons; zoom 10
    mostly succeeds). Returns per-(status, tm_id) row counts plus total
    wkt_debug length — the shape a failure side-table write would see.
    Golden oracle (snap is not SQL-expressible)."""
    import ray.data

    from ..sources.regions import regions_parquet_path
    from ..stages.agg import partial_sum_groupby
    from ..stages.snap_stage import SnapDeadLetter

    from ..core.geom import wkb_encode_point, wkb_encode_polygon

    ds = ray.data.read_parquet(
        regions_parquet_path(), columns=["region_id", "geom_wkb"]
    )
    ds = ds.map_batches(project_wkb_to_mercator, batch_format="pyarrow")
    # deterministic failure probes (already in native mercator meters):
    # a 1 mm sliver that collapses at every zoom, a polygon past the
    # mercator grid bound (outside_grid), and a point (passthrough)
    bound = 20037508.3427892
    probes = pa.table(
        {
            "region_id": pa.array([9001, 9002, 9003], pa.int64()),
            "geom_wkb": pa.array(
                [
                    wkb_encode_polygon(
                        [[(0.0, 0.0), (0.001, 0.0), (0.001, 0.001), (0.0, 0.0)]]
                    ),
                    wkb_encode_polygon(
                        [
                            [
                                (bound * 1.2, 0.0),
                                (bound * 1.3, 0.0),
                                (bound * 1.3, 1e6),
                                (bound * 1.2, 0.0),
                            ]
                        ]
                    ),
                    wkb_encode_point(1000.0, 2000.0),
                ],
                pa.binary(),
            ),
        }
    )
    ds = ds.union(ray.data.from_arrow(probes))
    ds = ds.map_batches(
        SnapDeadLetter,
        fn_constructor_kwargs={"tms_name": "WebMercatorQuad", "tm_ids": zooms},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )

    def shrink(b: pa.Table) -> pa.Table:
        wkt_len = np.array(
            [len(s) for s in b["wkt_debug"].to_pylist()], dtype=np.int64
        )
        return pa.table(
            {
                "status": b["status"],
                "tm_id": b["tm_id"].cast(pa.int64()),
                "wkt_chars": pa.array(wkt_len),
            }
        )

    return partial_sum_groupby(
        ds.map_batches(shrink, batch_format="pyarrow"),
        ["status", "tm_id"],
        ["wkt_chars"],
        count_alias="n",
        coalesce=4,
    )


def q_simplify_shapes(sf_dir: str, zooms: tuple[int, ...] = (4, 7, 10)):
    """Topology-preserving per-zoom simplification (core/simplify.py:
    Visvalingam-Whyatt, threshold = 2px at each zoom) over the dense
    shapes table. Per (shape, zoom): vertex counts, ring count, shoelace
    areas and a CRC of the simplified WKB — the golden pins the
    geometry byte-for-byte (raw binary stays out of the comparator).

    Per-feature kernel in map_batches (one feature is the unit of work,
    as in the snap stage); zoom fan-out inside the batch so a feature's
    WKB is decoded once for all zooms."""
    import zlib

    import ray.data

    from ..core.geom import shoelace
    from ..core.simplify import simplify_polygon_for_zoom
    from ..sources.shapes import shapes_parquet_path

    ds = ray.data.read_parquet(
        shapes_parquet_path(), columns=["shape_id", "geom_wkb"]
    )

    def simplify_batch(batch: pa.Table) -> pa.Table:
        sid_out, zoom_out, n_in, n_out, nr_out = [], [], [], [], []
        area_in, area_out, wkb_out = [], [], []
        for sid, buf in zip(
            batch["shape_id"].to_pylist(), batch["geom_wkb"].to_pylist()
        ):
            kind, rings = wkb_decode(buf)
            assert kind == "Polygon"
            a_in = sum(abs(shoelace(r[:-1] if r[0] == r[-1] else r)) for r in [rings[0]]) - sum(
                abs(shoelace(r[:-1] if r[0] == r[-1] else r)) for r in rings[1:]
            )
            nv_in = sum(len(r) - (1 if r[0] == r[-1] else 0) for r in rings)
            for zoom in zooms:
                simp = simplify_polygon_for_zoom(rings, zoom)
                a_out = (
                    sum(abs(shoelace(r)) for r in simp[:1])
                    - sum(abs(shoelace(r)) for r in simp[1:])
                    if simp
                    else 0.0
                )
                sid_out.append(sid)
                zoom_out.append(zoom)
                n_in.append(nv_in)
                n_out.append(sum(len(r) for r in simp))
                nr_out.append(len(simp))
                area_in.append(a_in)
                area_out.append(a_out)
                buf_out = wkb_encode_polygon(simp) if simp else b""
                wkb_out.append(zlib.crc32(buf_out))
        return pa.table(
            {
                "shape_id": pa.array(sid_out, type=pa.int64()),
                "zoom": pa.array(zoom_out, type=pa.int32()),
                "n_in": pa.array(n_in, type=pa.int64()),
                "n_out": pa.array(n_out, type=pa.int64()),
                "n_rings": pa.array(nr_out, type=pa.int64()),
                "area_in": pa.array(area_in, type=pa.float64()),
                "area_out": pa.array(area_out, type=pa.float64()),
                "geom_crc": pa.array(wkb_out, type=pa.int64()),
            }
        )

    return ds.map_batches(simplify_batch, batch_format="pyarrow", batch_size=8)


def q_vector_chain(sf_dir: str, zoom: int = 7):
    """The full vector-tile preprocessing chain as ONE streamed pipeline
    — the north-star sentence end-to-end: topology-preserving per-zoom
    SIMPLIFICATION (core/simplify.py) -> snap-to-tile-grid SNAPPING
    (core/snap.py, reference semantics) -> deterministic TILE CUTTING
    (Sutherland-Hodgman clip) -> per-tile rollup (feature count +
    integer clipped area). Dense shapes in, tile stats out; every stage
    is an actor-pool map_batches, the only exchange is the final skinny
    rollup. Golden oracle; each stage kernel is separately pinned
    (simplify invariants, snap goldens, clip area-conservation)."""
    import ray.data

    from ..core.geom import shoelace, wkb_decode, wkb_encode_polygon
    from ..core.simplify import simplify_polygon_for_zoom
    from ..sources.shapes import shapes_parquet_path
    from ..stages.agg import partial_sum_groupby
    from ..stages.snap_stage import snap_dataset
    from ..stages.vectorcut import VectorTileCutter, clipped_area

    ds = ray.data.read_parquet(
        shapes_parquet_path(), columns=["shape_id", "geom_wkb"]
    )

    def simplify_batch(batch: pa.Table) -> pa.Table:
        ids, out = [], []
        for sid, buf in zip(
            batch["shape_id"].to_pylist(), batch["geom_wkb"].to_pylist()
        ):
            kind, rings = wkb_decode(buf)
            simp = simplify_polygon_for_zoom(rings, zoom)
            if not simp:
                continue
            ids.append(sid)
            out.append(wkb_encode_polygon(simp))
        return pa.table(
            {
                "region_id": pa.array(ids, pa.int64()),
                "geom_wkb": pa.array(out, pa.binary()),
            }
        )

    simplified = ds.map_batches(simplify_batch, batch_format="pyarrow", batch_size=8)
    snapped = snap_dataset(
        simplified, "WebMercatorQuad", (zoom,), keep_points_and_lines=False
    )
    clipped = snapped.map_batches(
        VectorTileCutter,
        fn_constructor_kwargs={"tms": "WebMercatorQuad", "zoom": zoom},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )

    def to_area(batch: pa.Table) -> pa.Table:
        areas = np.array(
            [clipped_area(b) for b in batch["geom_wkb"].to_pylist()],
            dtype=np.float64,
        )
        return pa.table(
            {
                "tm_id": batch["tm_id"],
                "tile_x": batch["tile_x"],
                "tile_y": batch["tile_y"],
                "area_m2": pa.array(np.trunc(areas).astype(np.int64)),
            }
        )

    return partial_sum_groupby(
        clipped.map_batches(to_area, batch_format="pyarrow"),
        ["tm_id", "tile_x", "tile_y"],
        ["area_m2"],
        count_alias="n_features",
        coalesce=4,
    )
