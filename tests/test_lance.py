"""Exercise the Lance-native read branch of sources/images.read_images.

The north rule's input_hint names a Lance table; this container has no
`lance` package, so the branch is import-gated and these tests SKIP
cleanly here — on an environment with `pylance` installed they write a
real Lance dataset next to the parquet shards and assert read_images
routes through ray.data.read_lance with identical rows and pruned
columns."""

from __future__ import annotations

import pathlib

import pytest

lance = pytest.importorskip("lance")


@pytest.fixture()
def lance_sibling(tmp_path, monkeypatch):
    """Build a tiny images shard dir + sibling .lance dataset."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from texel_ray.sources import images as images_src

    rng = np.random.default_rng(0)
    t = pa.table(
        {
            "image_id": pa.array([f"img-{i:04d}" for i in range(64)]),
            "bytes": pa.array([bytes([i % 256] * 16) for i in range(64)], pa.binary()),
            "w": pa.array(np.full(64, 16, dtype=np.int32)),
            "h": pa.array(np.full(64, 16, dtype=np.int32)),
            "fmt": pa.array(["png"] * 64),
            "caption": pa.array([f"cap {i}" for i in range(64)]),
            "phash": pa.array(rng.integers(-(2**62), 2**62, 64, dtype=np.int64)),
            "lon": pa.array(rng.uniform(-10, 10, 64)),
            "lat": pa.array(rng.uniform(-10, 10, 64)),
        }
    )
    shard_dir = tmp_path / "images_sf0.0001"
    shard_dir.mkdir()
    pq.write_table(t, shard_dir / "part-00000.parquet")
    lance.write_dataset(t, str(shard_dir) + ".lance")
    monkeypatch.setattr(
        images_src, "ensure_images_for_sf_dir", lambda sf_dir: str(shard_dir)
    )
    return t, str(shard_dir)


def test_read_images_prefers_lance(ray_session, lance_sibling):
    import pyarrow as pa

    from texel_ray.sources.images import read_images

    t, shard_dir = lance_sibling
    assert pathlib.Path(shard_dir + ".lance").exists()
    ds = read_images("ignored", columns=["image_id", "phash"])
    got = ds.to_pandas().sort_values("image_id").reset_index(drop=True)
    assert list(got.columns) == ["image_id", "phash"]  # column pruning held
    want = (
        t.select(["image_id", "phash"])
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_lance_rows_match_parquet_fallback(ray_session, lance_sibling, monkeypatch):
    """The same oracle-style aggregate over the Lance read and the parquet
    read must agree row-for-row (fragment model equivalence)."""
    from texel_ray.sources import images as images_src
    from texel_ray.sources.images import read_images

    t, shard_dir = lance_sibling
    via_lance = read_images("ignored", columns=["image_id", "lon", "lat"]).to_pandas()
    # force the parquet fallback by hiding the sibling
    monkeypatch.setattr(images_src.pathlib.Path, "exists", lambda self: False)
    via_parquet = read_images("ignored", columns=["image_id", "lon", "lat"]).to_pandas()
    key = "image_id"
    assert (
        via_lance.sort_values(key).reset_index(drop=True).equals(
            via_parquet.sort_values(key).reset_index(drop=True)
        )
    )
