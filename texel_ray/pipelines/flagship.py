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
