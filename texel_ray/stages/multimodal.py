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


class ImageHistogram:
    """Corpus luminance histogram PARTIALS: per batch, the 256-bin
    count of integer luma = (r + g + b) // 3 per pixel, keyed by format
    — the combiner shape (<= formats x 256 skinny rows per batch; one
    groupby merges). Exact integers, order-independent."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        hists: dict[str, np.ndarray] = {}
        for buf, fmt in zip(payloads, fmts):
            img = decode_image(buf, fmt).astype(np.int64)
            luma = img.reshape(-1, 3).sum(axis=1) // 3
            h = hists.setdefault(fmt, np.zeros(256, dtype=np.int64))
            h += np.bincount(luma, minlength=256)
        out_f, out_b, out_n = [], [], []
        for fmt, h in sorted(hists.items()):
            nz = np.nonzero(h)[0]
            out_f.extend([fmt] * len(nz))
            out_b.append(nz.astype(np.int64))
            out_n.append(h[nz])
        if not out_b:
            return pa.table(
                {
                    "fmt": pa.array([], pa.string()),
                    "bin": pa.array([], pa.int64()),
                    "n_px": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "fmt": pa.array(out_f, pa.string()),
                "bin": pa.array(np.concatenate(out_b)),
                "n_px": pa.array(np.concatenate(out_n)),
            }
        )


def equalize_image(img: np.ndarray) -> np.ndarray:
    """Exact-integer histogram equalization: the luma CDF maps every
    channel value v -> floor((cdf[v] - cdf_min) * 255 / (n - cdf_min))
    (the standard discrete formula; monotone by construction)."""
    im = img.astype(np.int64)
    luma = im.reshape(-1, 3).sum(axis=1) // 3
    hist = np.bincount(luma, minlength=256)
    cdf = np.cumsum(hist)
    nz = np.nonzero(hist)[0]
    cdf_min = int(cdf[nz[0]]) if len(nz) else 0
    n = int(cdf[-1])
    denom = max(n - cdf_min, 1)
    lut = ((np.maximum(cdf - cdf_min, 0)) * 255 // denom).astype(np.uint8)
    return lut[im]


class ImageEqualizer:
    """Per-image histogram equalization (actor-pool transform stage);
    emits the equalized-pixel CRC + integer range per image so the
    output is comparable without binary columns."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        payloads = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        crcs, out_min, out_max = [], [], []
        for buf, fmt in zip(payloads, fmts):
            eq = equalize_image(decode_image(buf, fmt))
            crcs.append(zlib.crc32(eq.tobytes()))
            out_min.append(int(eq.min()))
            out_max.append(int(eq.max()))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "crc": pa.array(crcs, pa.int64()),
                "out_min": pa.array(out_min, pa.int64()),
                "out_max": pa.array(out_max, pa.int64()),
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
        from ..core.imagecodec import encode_jpeg_batch, is_real_jpeg, reencode_like

        payloads = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        imgs = [
            self._resize(decode_image(buf, fmt))
            for buf, fmt in zip(payloads, fmts)
        ]
        # container-preserving: real-JPEG sources re-encode as real JFIF
        # in one vectorized batch pass; FJPG/png keep their fast paths
        real = [f == "jpeg" and is_real_jpeg(p) for f, p in zip(fmts, payloads)]
        jpeg = encode_jpeg_batch([im for im, r in zip(imgs, real) if r])
        ji = iter(jpeg)
        out = [
            next(ji) if r else reencode_like(im, f, p, level=6)
            for im, f, p, r in zip(imgs, fmts, payloads, real)
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


class ImageEmbedStats:
    """ONE decode pass emitting BOTH the ImageEmbedder patch-mean
    embedding and the ImageStats channel means, plus carried columns
    (e.g. lon/lat). Payload decode dominates the curation pipelines;
    running ImageEmbedder and ImageStats as separate stages decoded every
    image twice. Arithmetic is identical to the two stages, so outputs
    are bit-equal."""

    def __init__(self, grid: int = 4, carry: tuple = ("lon", "lat")):
        self.grid = grid
        self.carry = carry

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        feats, mean_r, mean_g, mean_b = [], [], [], []
        for buf, fmt in zip(payloads, fmts):
            img = decode_image(buf, fmt)
            gray = img.mean(axis=2)
            h, w = gray.shape
            gh, gw = h // self.grid, w // self.grid
            patch = gray[: gh * self.grid, : gw * self.grid].reshape(
                self.grid, gh, self.grid, gw
            )
            feats.append(patch.mean(axis=(1, 3)).ravel().astype(np.float32))
            sums = img.astype(np.int64).reshape(-1, 3).sum(axis=0)
            n = h * w
            mean_r.append(int(sums[0] // n))
            mean_g.append(int(sums[1] // n))
            mean_b.append(int(sums[2] // n))
        cols = {
            "image_id": batch["image_id"],
            "embedding": pa.array(
                [f.tolist() for f in feats], pa.list_(pa.float32())
            ),
            "mean_r": pa.array(mean_r, pa.int64()),
            "mean_g": pa.array(mean_g, pa.int64()),
            "mean_b": pa.array(mean_b, pa.int64()),
        }
        for c in self.carry:
            cols[c] = batch[c]
        return pa.table(cols)


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


def decode_wav(buf: bytes):
    """Pure-numpy RIFF/WAVE PCM decoder (8/16/32-bit int + 32-bit float).

    Returns (samples float32 (n, channels) in [-1, 1], sample_rate).
    No external codec needed — WAV is a length-prefixed chunk container.
    """
    import struct

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 1 and bits == 8:  # unsigned
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}bit")
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), rate


class AudioDecode:
    """Audio decode + feature extraction actor stage.

    PCM WAV decodes for real (pure numpy, see ``decode_wav``); compressed
    codecs (mp3/ogg/flac) would need an external library not present in
    this container and raise a clear error. Emits per-clip features:
    duration_s, sample_rate, channels, rms, peak."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "audio_id"):
        self.bytes_col = bytes_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        out = {"duration_s": [], "sample_rate": [], "channels": [], "rms": [], "peak": []}
        for buf in batch[self.bytes_col].to_pylist():
            samples, rate = decode_wav(buf)
            mono = samples.mean(axis=1)
            out["duration_s"].append(len(mono) / rate if rate else 0.0)
            out["sample_rate"].append(rate)
            out["channels"].append(samples.shape[1])
            out["rms"].append(float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0)
            out["peak"].append(float(np.abs(mono).max()) if len(mono) else 0.0)
        return pa.table(
            {
                self.id_col: ids,
                "duration_s": pa.array(out["duration_s"], pa.float64()),
                "sample_rate": pa.array(out["sample_rate"], pa.int32()),
                "channels": pa.array(out["channels"], pa.int32()),
                "rms": pa.array(out["rms"], pa.float64()),
                "peak": pa.array(out["peak"], pa.float64()),
            }
        )


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Mono/multi-channel float [-1,1] -> 16-bit PCM WAV bytes (for tests
    and synthetic audio columns)."""
    import struct

    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    channels = samples.shape[1]
    byte_rate = rate * channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate, byte_rate, channels * 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


class VideoFrameSample:
    """Frame-sampling stage: binary video in, one row per sampled frame
    (frame_idx, ts_ms, bytes as encoded image). The 'sfv' deterministic
    frame container (sources/video.py) decodes for REAL — the Ray-side
    plumbing (payload-aware batch sizing, per-frame fan-out layout,
    actor signature) is the tested part; real codecs (mp4/webm) need
    pyav/ffmpeg, absent in this container, and raise the documented
    NotImplementedError per format."""

    def __init__(
        self, every_n: int = 5, bytes_col: str = "bytes", id_col: str = "video_id"
    ):
        self.every_n = every_n
        self.bytes_col = bytes_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.video import decode_sfv

        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        o_id, o_idx, o_ts, o_bytes, o_w, o_h = [], [], [], [], [], []
        for i, buf in enumerate(batch[self.bytes_col].to_pylist()):
            if fmts[i] != "sfv":
                raise NotImplementedError(
                    f"video format {fmts[i]!r} needs a real codec "
                    "(pyav/ffmpeg); not available in this environment"
                )
            frames, w, h, fps = decode_sfv(buf)
            for k in range(0, len(frames), self.every_n):
                o_id.append(ids[i])
                o_idx.append(k)
                o_ts.append(int(k * 1000 / fps))
                o_bytes.append(frames[k])
                o_w.append(w)
                o_h.append(h)
        return pa.table(
            {
                self.id_col: pa.array(o_id, batch.schema.field(self.id_col).type),
                "frame_idx": pa.array(o_idx, pa.int32()),
                "ts_ms": pa.array(o_ts, pa.int64()),
                "bytes": pa.array(o_bytes, pa.binary()),
                "w": pa.array(o_w, pa.int32()),
                "h": pa.array(o_h, pa.int32()),
            }
        )


class ImageAugmenter:
    """Deterministic per-image augmentation: the op is chosen by a hash
    of the image id (hflip / vflip / rot90 / center-crop), pixels
    transformed with pure numpy on the decoded array, re-encoded in the
    source format. Determinism is the point — augmentation must be
    REPRODUCIBLE for lineage/resume (same id -> same augmentation every
    run, no RNG state carried between batches or workers)."""

    OPS = ("hflip", "vflip", "rot90", "crop")

    def __init__(self, crop_frac: float = 0.75, id_col: str = "image_id"):
        self.crop_frac = crop_frac
        self.id_col = id_col

    def _apply(self, img: np.ndarray, op: str) -> np.ndarray:
        if op == "hflip":
            return img[:, ::-1]
        if op == "vflip":
            return img[::-1]
        if op == "rot90":
            return np.rot90(img)
        h, w = img.shape[:2]
        ch = max(1, int(h * self.crop_frac))
        cw = max(1, int(w * self.crop_frac))
        y0, x0 = (h - ch) // 2, (w - cw) // 2
        return img[y0 : y0 + ch, x0 : x0 + cw]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        ids = batch[self.id_col].to_pylist()
        # deterministic op choice for ANY id type (string image ids in the
        # north-rule schema): crc32 of the id's string form
        which = [zlib.crc32(str(i).encode()) % len(self.OPS) for i in ids]
        payloads = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        from ..core.imagecodec import encode_jpeg_batch, is_real_jpeg, reencode_like

        augs, imgs, checks = [], [], []
        for i, (buf, fmt) in enumerate(zip(payloads, fmts)):
            op = self.OPS[int(which[i])]
            img = self._apply(decode_image(buf, fmt), op)
            augs.append(op)
            imgs.append(np.ascontiguousarray(img))
            checks.append(int(img.astype(np.int64).sum()))
        # container-preserving split (see ImageResizer.__call__)
        real = [f == "jpeg" and is_real_jpeg(p) for f, p in zip(fmts, payloads)]
        jpeg = encode_jpeg_batch([im for im, r in zip(imgs, real) if r])
        ji = iter(jpeg)
        outs = [
            next(ji) if r else reencode_like(im, f, p, level=6)
            for im, f, p, r in zip(imgs, fmts, payloads, real)
        ]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "fmt": batch["fmt"],
                "aug": pa.array(augs, pa.string()),
                "bytes": pa.array(outs, pa.binary()),
                "px_checksum": pa.array(checks, pa.int64()),
            }
        )


class ZonalImageStats:
    """Zonal statistics: PIP join + image decode + per-region pixel
    partials FUSED in one actor stage (the flagship fused-operator
    pattern — the heavy ``bytes`` column never crosses an exchange;
    only per-region integer partials leave the actor).

    Overlapping regions (tight urban rect inside a coarse grid rect)
    both receive an image's pixels; each image is DECODED ONCE per
    batch regardless of how many regions it matches (unique-payload
    dedup before the codec loop). Output partial rows per region:
    n_images, n_px, sum_lum (total channel sum), px_min, px_max."""

    def __init__(self, regions_path: str | None = None):
        from .pip_join import PIPJoiner

        self.joiner = PIPJoiner(
            regions_path=regions_path,
            keep_columns=["image_id", "bytes", "fmt"],
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        joined = self.joiner(batch)
        if joined.num_rows == 0:
            return pa.table(
                {
                    "region_id": pa.array([], pa.int64()),
                    "n_images": pa.array([], pa.int64()),
                    "n_px": pa.array([], pa.int64()),
                    "sum_lum": pa.array([], pa.int64()),
                    "px_min": pa.array([], pa.int64()),
                    "px_max": pa.array([], pa.int64()),
                }
            )
        ids = np.asarray(joined["image_id"].to_pylist())
        uniq, inv = np.unique(ids, return_inverse=True)
        first_row = np.zeros(len(uniq), dtype=np.int64)
        first_row[inv[::-1]] = np.arange(len(ids) - 1, -1, -1)
        payloads = joined["bytes"].to_pylist()
        fmts = joined["fmt"].to_pylist()
        px_n = np.zeros(len(uniq), dtype=np.int64)
        lum = np.zeros(len(uniq), dtype=np.int64)
        mn = np.zeros(len(uniq), dtype=np.int64)
        mx = np.zeros(len(uniq), dtype=np.int64)
        for u, row in enumerate(first_row):
            img = decode_image(payloads[row], fmts[row]).astype(np.int64)
            px_n[u] = img.shape[0] * img.shape[1]
            lum[u] = int(img.sum())
            mn[u] = int(img.min())
            mx[u] = int(img.max())
        region = joined["region_id"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "region_id": pa.array(region),
                "n_images": pa.array(np.ones(len(region), dtype=np.int64)),
                "n_px": pa.array(px_n[inv]),
                "sum_lum": pa.array(lum[inv]),
                "px_min": pa.array(mn[inv]),
                "px_max": pa.array(mx[inv]),
            }
        )
        g = t.group_by(["region_id"]).aggregate(
            [
                ("n_images", "sum"),
                ("n_px", "sum"),
                ("sum_lum", "sum"),
                ("px_min", "min"),
                ("px_max", "max"),
            ]
        )
        return g.rename_columns(
            ["region_id", "n_images", "n_px", "sum_lum", "px_min", "px_max"]
        )


class RasterVectorize:
    """Raster -> vector per image: decode, threshold luminance (channel
    sum >= 384, the mid-gray cut), marching-squares vectorization
    (core/marching.py). Emits exact-integer loop stats + a CRC of the
    full vertex stream, so goldens pin the traced geometry itself."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.marching import vectorize_masks

        payloads = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        masks = [
            decode_image(buf, fmt).astype(np.int64).sum(axis=2) >= 384
            for buf, fmt in zip(payloads, fmts)
        ]
        # batched marching kernel per mask SHAPE (uniform corpora = one
        # stack); tiny tiles are per-call-overhead-bound, so one walk for
        # the whole batch is ~5x the per-image kernel
        n = len(masks)
        n_loops = [0] * n
        perim = [0] * n
        area2 = [0] * n
        crc = [0] * n
        by_shape: dict[tuple, list[int]] = {}
        for i, m in enumerate(masks):
            by_shape.setdefault(m.shape, []).append(i)
        for idxs in by_shape.values():
            outs = vectorize_masks(np.stack([masks[i] for i in idxs]))
            for i, s in zip(idxs, outs):
                n_loops[i] = s["n_loops"]
                perim[i] = s["perimeter"]
                area2[i] = s["area2"]
                crc[i] = s["crc"]
        return pa.table(
            {
                "image_id": batch["image_id"],
                "n_loops": pa.array(n_loops, pa.int64()),
                "perimeter": pa.array(perim, pa.int64()),
                "area2": pa.array(area2, pa.int64()),
                "crc": pa.array(crc, pa.int64()),
            }
        )


class SobelEdges:
    """Per-image SOBEL EDGE ENERGY (the sharpness / blur-detection
    signal a curation pipeline filters on): decode once per image,
    integer |gx| + |gy| over the valid (h-2) x (w-2) interior of the
    luma plane, emit exact integer (edge_sum, edge_max, n_px). Actor
    pool stage — decode state per actor, vectorized slice arithmetic
    per image, no Python per-pixel loop."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        out_sum = np.zeros(len(ids), dtype=np.int64)
        out_max = np.zeros(len(ids), dtype=np.int64)
        out_npx = np.zeros(len(ids), dtype=np.int64)
        for i, (buf, fmt) in enumerate(zip(payloads, fmts)):
            img = decode_image(buf, fmt).astype(np.int64)
            luma = img.sum(axis=2) // 3
            h, w = luma.shape
            if h < 3 or w < 3:
                continue
            gx = (
                luma[:-2, 2:] + 2 * luma[1:-1, 2:] + luma[2:, 2:]
                - luma[:-2, :-2] - 2 * luma[1:-1, :-2] - luma[2:, :-2]
            )
            gy = (
                luma[2:, :-2] + 2 * luma[2:, 1:-1] + luma[2:, 2:]
                - luma[:-2, :-2] - 2 * luma[:-2, 1:-1] - luma[:-2, 2:]
            )
            e = np.abs(gx) + np.abs(gy)
            out_sum[i] = int(e.sum())
            out_max[i] = int(e.max())
            out_npx[i] = e.size
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "edge_sum": pa.array(out_sum),
                "edge_max": pa.array(out_max),
                "n_px": pa.array(out_npx),
            }
        )
