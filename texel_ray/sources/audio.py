"""Deterministic synthetic audio table (PCM WAV payload column).

Mirrors the images source pattern: a seeded, scale-factor-proportional
table of (audio_id, bytes=RIFF/WAVE PCM16, rate, n_samples) cached as
sharded parquet under /tmp/texel_ray_data — the stand-in for an audio
modality column in the 10^12-row Lance table. Each clip is a per-id
seeded mix of a sine fundamental + harmonic + noise so decode features
(rms/peak/duration) are non-trivial and reproducible.
"""

from __future__ import annotations

import os

import numpy as np

_BASE = "/tmp/texel_ray_data"
_RATES = (4000, 8000, 16000)


def n_clips_for_sf(sf: float) -> int:
    return max(200, int(20000 * sf))


def sf_of_dir(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.01


def _gen_clip(audio_id: int):
    from ..stages.multimodal import encode_wav_pcm16

    rng = np.random.default_rng(0xA0D10 + audio_id)
    rate = _RATES[audio_id % len(_RATES)]
    n = int(rate * rng.uniform(0.2, 0.6))
    t = np.arange(n, dtype=np.float64) / rate
    f0 = rng.uniform(100.0, 900.0)
    sig = (
        0.4 * np.sin(2 * np.pi * f0 * t)
        + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
        + 0.05 * rng.standard_normal(n)
    )
    return encode_wav_pcm16(sig * 0.8, rate), rate, n


def ensure_audio_for_sf_dir(sf_dir: str, shards: int = 4) -> str:
    """Generate (once) and return the sharded parquet dir for this sf."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = sf_of_dir(sf_dir)
    out = f"{_BASE}/audio_sf{sf}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    n = n_clips_for_sf(sf)
    per = (n + shards - 1) // shards
    for s in range(shards):
        ids = list(range(s * per, min((s + 1) * per, n)))
        rows = [_gen_clip(i) for i in ids]
        tbl = pa.table(
            {
                "audio_id": pa.array(ids, pa.int64()),
                "bytes": pa.array([r[0] for r in rows], pa.binary()),
                "rate": pa.array([r[1] for r in rows], pa.int32()),
                "n_samples": pa.array([r[2] for r in rows], pa.int32()),
            }
        )
        pq.write_table(tbl, os.path.join(out, f"part-{s:03d}.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return out


def read_audio(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(ensure_audio_for_sf_dir(sf_dir), columns=columns)
