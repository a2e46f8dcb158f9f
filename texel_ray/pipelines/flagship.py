"""Flagship pipeline: spatial join + tiling over the image+caption table.

read images (columns pruned)
  -> map_batches(encode_tiles)            # explode rows per zoom, tile keys
  -> map_batches(PIPJoiner actor pool)    # broadcast point-in-polygon join
  -> per-batch partial counts             # pre-aggregation (combiner)
  -> groupby(tm_id, tile_x, tile_y)       # the one hash shuffle, tiny rows
  -> per-tile counts

Streaming end-to-end: nothing materializes the full input; the shuffle
moves only (tile key, partial count) rows, not image payloads.
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.images import read_images
from ..sources.regions import regions_parquet_path
from ..stages.pip_join import PIPJoiner
from ..stages.tiles import encode_tiles


def tile_counts(
    sf_dir: str,
    zooms: tuple[int, ...] = (4, 8),
    with_pip: bool = True,
    concurrency: int | tuple[int, int] = (2, 8),
):
    """Per-tile joined-image counts at each requested zoom."""
    ds = read_images(sf_dir, columns=["image_id", "lon", "lat"])
    if with_pip:
        ds = ds.map_batches(
            PIPJoiner,
            fn_constructor_kwargs={
                "regions_path": regions_parquet_path(),
                "keep_columns": ["image_id", "lon", "lat"],
            },
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=concurrency,
        )
    ds = ds.map_batches(
        lambda b: encode_tiles(
            b, "WebMercatorQuad", zooms, keep_columns=[]
        ),
        batch_format="pyarrow",
        batch_size=8192,
    )

    # partial counts per batch (combiner) -> coalesce -> small shuffle
    from ..stages.agg import partial_count_groupby

    return partial_count_groupby(ds, ["tm_id", "tile_x", "tile_y"], alias="n")


def pool_size(frac: float = 0.75) -> tuple[int, int]:
    """Autoscaling actor-pool bounds fitted to the cluster. Fractions
    across concurrent stages must sum below 1 so task-based stages (read,
    rollup, shuffle) keep CPUs — a pool that reserves every CPU stalls the
    streaming executor. (A fully static pool of this size deadlocks the
    executor on short jobs; autoscale from half.)"""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    hi = max(2, int(cpus * frac))
    return (max(2, hi // 2), hi)


class FusedTileStage:
    """Operator fusion of the heavyweight per-row chain: PIP join ->
    first-region dedup -> raster tile cut -> rollup partials. One actor
    pool, one object-store hop — the per-stage boundaries (block handoff,
    per-stage scheduling) otherwise dominate this payload-heavy pipeline.
    The individual stages stay available for composition; this class is
    the fused fast path with identical results."""

    def __init__(self, cut_zoom: int = 13, rollup_zoom: int = 8):
        import pyarrow.parquet as pq

        from ..stages.tilecut import TileCutter

        self.joiner = PIPJoiner(
            regions_path=regions_parquet_path(),
            keep_columns=["image_id", "bytes", "w", "h", "fmt", "caption", "lon", "lat"],
        )
        self.cutter = TileCutter(zoom=cut_zoom)
        self.shift = cut_zoom - rollup_zoom
        self.rollup_zoom = rollup_zoom

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        # adjacency dedup below requires PIPJoiner's canonical
        # point-sorted emission (all matches per input row contiguous)
        assert PIPJoiner.EMITS_POINT_SORTED
        joined = self.joiner(batch)
        ids = joined["image_id"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = ids[1:] != ids[:-1]
        joined = joined.filter(pa.array(keep)).drop_columns(
            ["region_id", "region_name"]
        )
        pieces = self.cutter(joined)
        area = (
            pieces["pw"].to_numpy(zero_copy_only=False).astype(np.int64)
            * pieces["ph"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        t = pa.table(
            {
                "tm_id": pa.array(
                    np.full(pieces.num_rows, self.rollup_zoom, dtype=np.int32)
                ),
                "tile_x": pa.array(
                    pieces["tile_x"].to_numpy(zero_copy_only=False) >> self.shift
                ),
                "tile_y": pa.array(
                    pieces["tile_y"].to_numpy(zero_copy_only=False) >> self.shift
                ),
                "pixel_area": pa.array(area),
            }
        )
        g = t.group_by(["tm_id", "tile_x", "tile_y"]).aggregate(
            [("pixel_area", "sum"), ("tm_id", "count")]
        )
        return g.rename_columns(
            ["tm_id", "tile_x", "tile_y", "pixel_area", "n_pieces"]
        )


def full_pipeline_fused(sf_dir: str, cut_zoom: int = 13, rollup_zoom: int = 8, epochs: int = 1):
    """Fused heavyweight pipeline (see FusedTileStage). `epochs` unions
    repeated reads of the same input to lengthen the job for scaling
    measurements (same files, same results x epochs)."""
    import numpy as np
    from ray.data.aggregate import Sum

    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "lon", "lat"]
    ds = read_images(sf_dir, columns=cols)
    for _ in range(epochs - 1):
        ds = ds.union(read_images(sf_dir, columns=cols))
    ds = ds.map_batches(
        FusedTileStage,
        fn_constructor_kwargs={"cut_zoom": cut_zoom, "rollup_zoom": rollup_zoom},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=pool_size(0.85),
    )
    # inputs are already per-batch partials; merge with arrow group_by
    def merge(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["tm_id", "tile_x", "tile_y"]).aggregate(
            [("pixel_area", "sum"), ("n_pieces", "sum")]
        )
        return g.rename_columns(["tm_id", "tile_x", "tile_y", "pixel_area", "n_pieces"])

    ds = ds.repartition(1)
    return ds.map_batches(merge, batch_format="pyarrow", batch_size=None)


def full_pipeline(sf_dir: str, cut_zoom: int = 13, rollup_zoom: int = 8):
    """The heavyweight end-to-end job (scaling headline): read the full
    image table -> PIP join (broadcast actor pool) -> raster tile cutting
    along the z`cut_zoom` grid (decode/crop/re-encode per image) ->
    hierarchical rollup of piece stats to z`rollup_zoom` ancestor cells
    (combiner-friendly: ~thousands of keys, not one per z13 tile).
    Map-dominated by design; the one shuffle moves tiny partial rows."""
    import pyarrow as pa

    from ..stages.agg import partial_sum_groupby
    from ..stages.tilecut import TileCutter

    ds = read_images(
        sf_dir,
        columns=["image_id", "bytes", "w", "h", "fmt", "caption", "lon", "lat"],
    )
    ds = ds.map_batches(
        PIPJoiner,
        fn_constructor_kwargs={
            "regions_path": regions_parquet_path(),
            "keep_columns": ["image_id", "bytes", "w", "h", "fmt", "caption", "lon", "lat"],
        },
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=pool_size(0.4),
    )
    # drop duplicate region matches before the expensive cut (first wins)
    def dedup_image(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["image_id"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = ids[1:] != ids[:-1]
        return batch.filter(pa.array(keep)).drop_columns(
            ["region_id", "region_name"]
        )

    # per-BLOCK (batch_size=None): PIPJoiner emits one block per input
    # batch, and an input row's multiple region matches are always
    # adjacent within that block — re-slicing at a fixed batch_size could
    # split them across calls and defeat the adjacency dedup
    ds = ds.map_batches(dedup_image, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(
        TileCutter,
        fn_constructor_kwargs={"zoom": cut_zoom},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=pool_size(0.75),
    )

    shift = cut_zoom - rollup_zoom

    def rollup(batch: pa.Table) -> pa.Table:
        import numpy as np

        area = (
            batch["pw"].to_numpy(zero_copy_only=False).astype(np.int64)
            * batch["ph"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "tm_id": pa.array(
                    np.full(batch.num_rows, rollup_zoom, dtype=np.int32)
                ),
                "tile_x": pa.array(
                    batch["tile_x"].to_numpy(zero_copy_only=False) >> shift
                ),
                "tile_y": pa.array(
                    batch["tile_y"].to_numpy(zero_copy_only=False) >> shift
                ),
                "pixel_area": pa.array(area),
            }
        )

    ds = ds.map_batches(rollup, batch_format="pyarrow")
    return partial_sum_groupby(
        ds, ["tm_id", "tile_x", "tile_y"], ["pixel_area"], count_alias="n_pieces"
    )
