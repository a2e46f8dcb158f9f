"""End-to-end training-data curation pipelines — compositions of the
engine's stages into the flows a 100 TB data-prep user actually runs.

``curate_documents``: quality filter -> near-dup removal -> split.
``curate_images``: decode stats filter -> visual near-dup removal ->
spatial tile assignment of the survivors.

Both stream end-to-end; the only driver-side sets are id blocklists
(near-dup victims), which are dimension-sized (fraction of corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def curate_documents(sf_dir: str, quality_threshold: float = 0.35):
    """documents -> TextFeatures quality gate -> MinHash near-dup removal
    (keep the smaller doc_id of each verified pair) -> deterministic
    train/test split -> per-(split) counts + kept char volume."""
    import ray.data

    from ..stages.agg import partial_sum_groupby
    from ..stages.text import TextFeatures

    from .mlprep import q_minhash_neardup

    # near-dup victims (id_b of each verified pair): tiny, collect once
    pairs = q_minhash_neardup(sf_dir)
    victims = np.unique(
        np.asarray(
            pairs.to_pandas()["id_b"].tolist()
            if hasattr(pairs, "to_pandas")
            else pairs["id_b"].tolist(),
            dtype=np.int64,
        )
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    feats = ds.map_batches(
        TextFeatures, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)
    )

    def gate_and_split(batch: pa.Table) -> pa.Table:
        q = batch["quality_score"].to_numpy(zero_copy_only=False)
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = (q >= quality_threshold) & ~np.isin(doc_id, victims)
        kept = batch.filter(pa.array(keep))
        ids = kept["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        split = np.where(
            (ids * np.uint64(2654435761)) % np.uint64(100) < 10, "test", "train"
        )
        return pa.table(
            {
                "split": pa.array(split.tolist(), pa.string()),
                "n_chars": kept["n_chars"],
            }
        )

    gated = feats.map_batches(gate_and_split, batch_format="pyarrow")
    return partial_sum_groupby(
        gated, ["split"], ["n_chars"], count_alias="n_docs", coalesce=4
    )


def _sql_curate_documents() -> str:
    """Fully recomputing DuckDB oracle for curate_documents: exact-Jaccard
    near-dup victims (the minhash oracle's own pair set), the mirrored
    text-features quality expression, and the Knuth-hash split rule with
    the uint64 wraparound done in HUGEINT arithmetic."""
    from .mlprep import SQL_MINHASH_NEARDUP, SQL_TEXT_FEATURES

    return f"""
WITH victims AS (
  SELECT DISTINCT id_b FROM ({SQL_MINHASH_NEARDUP})
), feats AS (
  {SQL_TEXT_FEATURES}
), kept AS (
  SELECT doc_id, n_chars FROM feats
  WHERE quality_score >= 0.35
    AND doc_id NOT IN (SELECT id_b FROM victims)
)
SELECT CASE WHEN ((CAST(doc_id AS HUGEINT) * 2654435761) % 18446744073709551616) % 100 < 10
            THEN 'test' ELSE 'train' END AS split,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       count(*) AS n_docs
FROM kept GROUP BY 1
"""


SQL_CURATE_DOCUMENTS = _sql_curate_documents()


def curate_images(sf_dir: str, min_mean: int = 40, max_mean: int = 230):
    """images -> ONE decode pass (brightness stats + visual embedding +
    geotags from the same decode — payload read once, `ImageEmbedStats`)
    -> visual near-dup removal over the skinny embedding table ->
    brightness gate -> tile assignment of survivors at z8 -> per-tile
    kept counts. The materialized intermediate is the skinny
    (id, embedding, means, lon, lat) table (~100B/row — the same
    signature-table shape the minhash path pins), consumed twice:
    near-dup pairs and the gate."""
    from ..sources.images import read_images
    from ..stages.agg import partial_count_groupby
    from ..stages.multimodal import ImageEmbedStats
    from ..stages.tiles import encode_tiles

    from .mlprep import embed_neardup_counts

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt", "lon", "lat"])
    skinny = ds.map_batches(
        ImageEmbedStats, batch_format="pyarrow", batch_size=1024, concurrency=(2, 16)
    ).materialize()

    dup_counts = embed_neardup_counts(
        skinny.select_columns(["image_id", "embedding"])
    ).to_pandas()
    # arbitrary-but-deterministic side; sorted array for vectorized np.isin.
    # zero near-dup pairs -> empty Dataset loses its schema in to_pandas
    # (no 'id_a' column), so guard before indexing
    victims_arr = (
        np.unique(np.asarray(dup_counts["id_a"].tolist()))
        if len(dup_counts)
        else np.array([], dtype=str)
    )

    def gate_and_tag(batch: pa.Table) -> pa.Table:
        mean = (
            batch["mean_r"].to_numpy()
            + batch["mean_g"].to_numpy()
            + batch["mean_b"].to_numpy()
        ) // 3
        ids = batch["image_id"].to_numpy(zero_copy_only=False)
        keep = (
            (mean >= min_mean) & (mean <= max_mean) & ~np.isin(ids, victims_arr)
        )
        kept = batch.filter(pa.array(keep))
        return encode_tiles(kept, "WebMercatorQuad", (8,), keep_columns=[])

    tiles = skinny.map_batches(
        gate_and_tag, batch_format="pyarrow", batch_size=16384
    )
    return partial_count_groupby(tiles, ["tm_id", "tile_x", "tile_y"], alias="n_kept")


def curate_audio(sf_dir: str, min_rms: float = 0.02, min_dur: float = 0.25):
    """audio clips -> decode + content-hash in ONE pass (features and the
    exact-dedup key from the same decode; payload read once) -> exact
    content dedup (keep min audio_id per hash; victims are the only
    collected intermediate, dimension-sized) -> rms/duration quality gate
    -> deterministic split -> per-(split, sample_rate) kept counts and
    duration. Integer-truncated ms before the sum keeps the aggregate
    order-independent (same convention as q_audio_features)."""
    import hashlib

    from ..sources.audio import read_audio
    from ..stages.agg import partial_sum_groupby
    from ..stages.multimodal import AudioDecode

    decoder = AudioDecode()

    def decode_and_hash(batch: pa.Table) -> pa.Table:
        feats = decoder(batch)
        hashes = [
            int.from_bytes(
                hashlib.blake2b(buf, digest_size=8).digest(), "big", signed=True
            )
            for buf in batch["bytes"].to_pylist()
        ]
        return feats.append_column("content_hash", pa.array(hashes, pa.int64()))

    feats = read_audio(sf_dir, columns=["audio_id", "bytes"]).map_batches(
        decode_and_hash, batch_format="pyarrow", batch_size=256, concurrency=8
    ).materialize()  # consumed twice (victim scan + gate); payload-free rows

    # exact dedup: every id that is not its hash-group's min is a victim.
    # One cheap 32-way low-bit bucket shuffle (the dedup_exact pattern)
    # instead of a per-hash map_groups dispatch; within a bucket one
    # vectorized groupby-transform finds each row's group min.
    def dup_partial(b: pa.Table) -> pa.Table:
        bucket = (
            b["content_hash"].to_numpy(zero_copy_only=False) & 31
        ).astype(np.int8)
        return pa.table(
            {
                "content_hash": b["content_hash"],
                "audio_id": b["audio_id"],
                "__bucket": pa.array(bucket),
            }
        )

    import pandas as pd

    def victims_of(g: pd.DataFrame) -> pd.DataFrame:
        keep_min = g.groupby("content_hash")["audio_id"].transform("min")
        v = g.loc[g["audio_id"].to_numpy() != keep_min.to_numpy(), "audio_id"]
        return pd.DataFrame({"victim": v.to_numpy()})

    vic = (
        feats.map_batches(dup_partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(victims_of, batch_format="pandas")
        .to_pandas()
    )
    victims = np.unique(vic["victim"].to_numpy()) if len(vic) else np.array([], dtype=np.int64)

    def gate_and_split(batch: pa.Table) -> pa.Table:
        ids = batch["audio_id"].to_numpy(zero_copy_only=False)
        keep = (
            (batch["rms"].to_numpy() >= min_rms)
            & (batch["duration_s"].to_numpy() >= min_dur)
            & ~np.isin(ids, victims)
        )
        kept = batch.filter(pa.array(keep))
        kid = kept["audio_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        split = np.where(
            (kid * np.uint64(2654435761)) % np.uint64(100) < 10, "test", "train"
        )
        return pa.table(
            {
                "split": pa.array(split.tolist(), pa.string()),
                "sample_rate": kept["sample_rate"],
                "ms": pa.array(
                    np.trunc(kept["duration_s"].to_numpy() * 1000.0).astype(np.int64)
                ),
            }
        )

    gated = feats.map_batches(gate_and_split, batch_format="pyarrow")
    return partial_sum_groupby(
        gated, ["split", "sample_rate"], ["ms"], count_alias="n_clips", coalesce=4
    )
