"""Multimodal (image/audio/video) column stages.

Images are opaque ``binary`` columns with typed metadata (w/h/fmt); each
stage is an actor-pool ``map_batches`` doing decode -> vectorized pixel
work -> (re-encode | features). PNG and the deterministic lossy stand-in
decode for real (texel_ray.core.imagecodec); real JPEG/audio/video codecs
are STUBBED behind NotImplementedError — the Ray-side plumbing (schema,
batch sizing for wide binary rows, actor signature, output layout) is the
real, tested part and a production codec drops in per format.

Batch sizes are small (payload-aware): with ~1 KB payloads batch_size=512
keeps a batch well under a worker's heap even at concurrency x num_cpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.imagecodec import decode_image, encode_image


class ImageStats:
    """Per-image pixel statistics (mean/min/max per channel as ints)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        mean_r, mean_g, mean_b, px_min, px_max = [], [], [], [], []
        for buf, fmt in zip(payloads, fmts):
            img = decode_image(buf, fmt).astype(np.int64)
            sums = img.reshape(-1, 3).sum(axis=0)
            n = img.shape[0] * img.shape[1]
            mean_r.append(int(sums[0] // n))
            mean_g.append(int(sums[1] // n))
            mean_b.append(int(sums[2] // n))
            px_min.append(int(img.min()))
            px_max.append(int(img.max()))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "mean_r": pa.array(mean_r, pa.int64()),
                "mean_g": pa.array(mean_g, pa.int64()),
                "mean_b": pa.array(mean_b, pa.int64()),
                "px_min": pa.array(px_min, pa.int64()),
                "px_max": pa.array(px_max, pa.int64()),
            }
        )


class ImageResizer:
    """Nearest-neighbor resize (pure numpy — real, not stubbed) and
    re-encode in the source format."""

    def __init__(self, out_w: int = 8, out_h: int = 8):
        self.out_w = out_w
        self.out_h = out_h

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w, _ = img.shape
        yi = (np.arange(self.out_h) * h // self.out_h).clip(0, h - 1)
        xi = (np.arange(self.out_w) * w // self.out_w).clip(0, w - 1)
        return img[yi[:, None], xi[None, :]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        out = [
            encode_image(self._resize(decode_image(buf, fmt)), fmt)
            for buf, fmt in zip(payloads, fmts)
        ]
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": pa.array(out, pa.binary()),
                "w": pa.array(np.full(len(out), self.out_w, dtype=np.int32)),
                "h": pa.array(np.full(len(out), self.out_h, dtype=np.int32)),
                "fmt": batch["fmt"],
            }
        )


class ImageEmbedder:
    """Tiny deterministic visual feature: 4x4 grayscale patch means,
    flattened to list<float> — a stand-in with the exact actor/batch shape
    of a real batched vision-model embedder (model load once per actor in
    __init__, inference per batch)."""

    def __init__(self, grid: int = 4):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        feats = []
        for buf, fmt in zip(payloads, fmts):
            img = decode_image(buf, fmt).mean(axis=2)
            h, w = img.shape
            gh, gw = h // self.grid, w // self.grid
            patch = img[: gh * self.grid, : gw * self.grid].reshape(
                self.grid, gh, self.grid, gw
            )
            feats.append(patch.mean(axis=(1, 3)).ravel().astype(np.float32))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "embedding": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


class AudioDecode:
    """STUB: no audio codec ships in this container. The stage contract
    (binary in, float32 PCM list + sample_rate out) is what a real codec
    implements."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "audio decoding requires an audio codec (e.g. soundfile/ffmpeg); "
            "not available in this environment"
        )


class VideoFrameSample:
    """STUB: no video codec ships in this container. Contract: binary in,
    one row per sampled frame (frame_idx, bytes as encoded image)."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video frame sampling requires a video codec (e.g. pyav/ffmpeg); "
            "not available in this environment"
        )
