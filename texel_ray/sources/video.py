"""Deterministic synthetic video table (SFV frame-container payloads).

Mirrors the audio/images source pattern: a seeded, scale-proportional
table of (video_id, bytes, fmt='sfv', fps, n_frames) cached as sharded
parquet under /tmp/texel_ray_data. No real video codec ships in this
container, so the payload is SFV — a trivial deterministic frame
container (header + length-prefixed PNG frames) that makes the
Ray-side plumbing (schema, payload-aware batch sizing, actor
signature, per-frame output layout) REAL and testable; a production
codec (pyav/ffmpeg) drops into ``VideoFrameSample`` per format.

SFV layout (little-endian):
  b"SFV1" | uint16 n_frames | uint16 w | uint16 h | uint8 fps
  then per frame: uint32 byte_len | PNG bytes
"""

from __future__ import annotations

import os
import struct

import numpy as np

_BASE = "/tmp/texel_ray_data"
_FPS = (10, 15, 30)


def n_videos_for_sf(sf: float) -> int:
    return max(60, int(6000 * sf))


def sf_of_dir(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.01


def encode_sfv(frames: list[np.ndarray], fps: int) -> bytes:
    from ..core.imagecodec import encode_image

    h, w = frames[0].shape[:2]
    out = [struct.pack("<4sHHHB", b"SFV1", len(frames), w, h, fps)]
    for f in frames:
        buf = encode_image(f, "png", level=1)
        out.append(struct.pack("<I", len(buf)))
        out.append(buf)
    return b"".join(out)


def decode_sfv(buf: bytes):
    """-> (frame_png_bytes: list[bytes], w, h, fps)."""
    magic, n, w, h, fps = struct.unpack_from("<4sHHHB", buf, 0)
    if magic != b"SFV1":
        raise ValueError("not an SFV container")
    off = struct.calcsize("<4sHHHB")
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", buf, off)
        off += 4
        frames.append(buf[off : off + ln])
        off += ln
    return frames, w, h, fps


def _gen_video(video_id: int):
    rng = np.random.default_rng(0x51DE0 + video_id)
    fps = _FPS[video_id % len(_FPS)]
    n_frames = int(rng.integers(8, 25))
    w = h = 8
    base = rng.integers(0, 200, size=(h, w, 3), dtype=np.int64)
    frames = []
    for k in range(n_frames):
        # deterministic motion: base pattern rolls one pixel per frame
        # with a brightness ramp, so frame stats vary monotonically
        f = np.roll(base, k, axis=1) + 2 * k
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
    return encode_sfv(frames, fps), fps, n_frames


def ensure_video_for_sf_dir(sf_dir: str, shards: int = 4) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = sf_of_dir(sf_dir)
    out = f"{_BASE}/video_sf{sf}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    n = n_videos_for_sf(sf)
    per = (n + shards - 1) // shards
    for s in range(shards):
        ids = list(range(s * per, min((s + 1) * per, n)))
        rows = [_gen_video(i) for i in ids]
        tbl = pa.table(
            {
                "video_id": pa.array(ids, pa.int64()),
                "bytes": pa.array([r[0] for r in rows], pa.binary()),
                "fmt": pa.array(["sfv"] * len(ids), pa.string()),
                "fps": pa.array([r[1] for r in rows], pa.int32()),
                "n_frames": pa.array([r[2] for r in rows], pa.int32()),
            }
        )
        pq.write_table(tbl, os.path.join(out, f"part-{s:03d}.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return out


def read_video(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(ensure_video_for_sf_dir(sf_dir), columns=columns)
