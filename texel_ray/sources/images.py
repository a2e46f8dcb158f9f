"""Deterministic synthetic image+caption table (the engine's primary input).

Schema per the north rule's input hint:
``image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64`` plus synthetic geotag columns
``lon:float64, lat:float64``.

Content is fully determined by (n_rows, seed): tiny RGB images (gradient +
seeded noise) encoded as real PNG or the deterministic lossy stand-in
("jpeg", see texel_ray.core.imagecodec); captions from a fixed vocabulary;
~1% duplicate phash values (exercises exact dedup); geotags drawn as a
mixture of world-uniform points and dense urban clusters (hot-tile skew for
the salted shuffle), with ~0.5% outside the WebMercator domain (exercises
outside-grid policy).

The table is materialized once per scale factor to a parquet file under
/tmp and re-read with ``ray.data.read_parquet`` — at production scale this
is the Lance table of the north rule; ``read_images`` prefers Lance if the
package is importable, else parquet.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..core import imagecodec

DATA_DIR = pathlib.Path(os.environ.get("TEXEL_RAY_DATA_DIR", "/tmp/texel_ray_data"))

IMG_W = 16
IMG_H = 16

# (name, lon, lat) — a few dense "urban" geotag clusters to create hot tiles
_URBAN_CENTERS = [
    (-74.006, 40.7128),  # New York
    (2.3522, 48.8566),  # Paris
    (139.6917, 35.6895),  # Tokyo
    (4.9041, 52.3676),  # Amsterdam
    (-0.1276, 51.5074),  # London
]

_VOCAB = (
    "sunset over the harbor with boats|a cat sleeping on a windowsill|"
    "aerial view of farmland|crowded street market at night|"
    "mountain trail in the fog|children playing football|"
    "vintage car parked by a cafe|rainbow after the storm|"
    "snow covered rooftops|a plate of fresh pasta|"
    "dense forest canopy from above|city skyline at dusk"
).split("|")

SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
    ]
)


def rows_for_sf(sf: float) -> int:
    return max(1000, int(6_000_000 * sf))


def sf_of_dir(sf_dir: str) -> float:
    """Parse the scale factor from a testdata dir name like .../sf0.01."""
    name = pathlib.Path(sf_dir).name
    if name.startswith("sf"):
        try:
            return float(name[2:])
        except ValueError:
            pass
    return 0.001


def images_parquet_path(sf_dir: str) -> str:
    """Directory of parquet shards (the Lance-fragment model: parallel
    reads, per-fragment lineage)."""
    name = pathlib.Path(sf_dir).name or "default"
    return str(DATA_DIR / f"images_{name}")


def _make_batch(start: int, n: int, rng: np.random.Generator) -> pa.RecordBatch:
    idx = np.arange(start, start + n)
    # --- pixels: deterministic gradient + per-row noise, vectorized ---
    base = np.linspace(0, 255, IMG_W, dtype=np.float32)
    grad = np.add.outer(np.linspace(0, 64, IMG_H, dtype=np.float32), base)  # h x w
    noise = rng.integers(0, 32, size=(n, IMG_H, IMG_W, 3), dtype=np.int16)
    tint = (idx % 7)[:, None, None, None] * 9
    imgs = np.clip(grad[None, :, :, None] + noise + tint, 0, 255).astype(np.uint8)

    fmts = np.where(rng.random(n) < 0.5, "png", "jpeg")
    # corpus STORAGE stays on the deterministic FJPG container (fast
    # zlib decode; decode_image dispatches on magic) — pipelines that
    # RE-encode jpeg outputs (tilecut/resize/augment) emit real JFIF
    payloads = [
        imagecodec.encode_png(imgs[i], level=1)
        if fmts[i] == "png"
        else imagecodec.encode_fake_jpeg(imgs[i], level=1)
        for i in range(n)
    ]

    captions = [
        f"{_VOCAB[i % len(_VOCAB)]} #{i:08d}" for i in idx
    ]
    phash = rng.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max, n).astype(
        np.int64
    )
    # ~1% duplicated phash (copied from another row in the same batch)
    dup_mask = rng.random(n) < 0.01
    dup_src = rng.integers(0, n, n)
    phash[dup_mask] = phash[dup_src[dup_mask]]

    # --- geotags: mixture of uniform + urban clusters + outside-grid ---
    lon = rng.uniform(-180.0, 180.0, n)
    lat = rng.uniform(-70.0, 70.0, n)
    urban = rng.random(n) < 0.25
    centers = rng.integers(0, len(_URBAN_CENTERS), n)
    c_lon = np.array([c[0] for c in _URBAN_CENTERS])[centers]
    c_lat = np.array([c[1] for c in _URBAN_CENTERS])[centers]
    lon = np.where(urban, c_lon + rng.normal(0, 0.05, n), lon)
    lat = np.where(urban, c_lat + rng.normal(0, 0.05, n), lat)
    outside = rng.random(n) < 0.005
    lat = np.where(outside, 89.9, lat)

    return pa.record_batch(
        [
            pa.array([f"img{i:09d}" for i in idx], pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(np.full(n, IMG_W, dtype=np.int32)),
            pa.array(np.full(n, IMG_H, dtype=np.int32)),
            pa.array(fmts.tolist(), pa.string()),
            pa.array(captions, pa.string()),
            pa.array(phash),
            pa.array(lon),
            pa.array(lat),
        ],
        schema=SCHEMA,
    )


def generate_images_parquet(
    path: str, n_rows: int, seed: int = 42, batch_rows: int = 20_000
) -> str:
    """Write the deterministic images table as a directory of parquet
    shards (idempotent; one shard per generation batch so reads
    parallelize like Lance fragments)."""
    p = pathlib.Path(path)
    if p.exists():
        return str(p)
    tmp = p.with_name(p.name + ".tmp")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for shard, start in enumerate(range(0, n_rows, batch_rows)):
        n = min(batch_rows, n_rows - start)
        table = pa.Table.from_batches([_make_batch(start, n, rng)])
        pq.write_table(table, tmp / f"part-{shard:05d}.parquet")
    os.replace(tmp, p)
    return str(p)


def ensure_images_for_sf_dir(sf_dir: str) -> str:
    """Materialize (once) and return the images parquet for a testdata dir."""
    path = images_parquet_path(sf_dir)
    return generate_images_parquet(path, rows_for_sf(sf_of_dir(sf_dir)))


def read_images(sf_dir: str, columns: list[str] | None = None):
    """ray.data.Dataset over the images table (columns pruned at the read).

    Prefers Lance when available (production path per the north rule);
    falls back to parquet in this container.
    """
    import ray.data

    path = ensure_images_for_sf_dir(sf_dir)
    try:  # pragma: no cover - lance not present in the eval container
        import lance  # noqa: F401

        lance_uri = path + ".lance"  # sibling lance dataset of the shard dir
        if pathlib.Path(lance_uri).exists():
            return ray.data.read_lance(lance_uri, columns=columns)
    except ImportError:
        pass
    return ray.data.read_parquet(path, columns=columns)
