"""Real baseline JPEG decoder (core/imagecodec.decode_jpeg) conformance:
decodes a REAL third-party JPEG (CPython test-suite imghdrdata fixture,
16x16 4:2:0 with a raw-PPM sibling as pixel ground truth) and a real
photo (Rust embedded-book asset, 477x720) — no repo-made files, so the
decoder is checked against independently produced bitstreams."""

from __future__ import annotations

import os
import zlib

import numpy as np
import pytest

from texel_ray.core.imagecodec import decode_image, decode_jpeg, psnr

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _ppm(path):
    with open(path, "rb") as f:
        parts = f.read().split(b"\n", 3)
    assert parts[0] == b"P6"
    w, h = map(int, parts[1].split())
    return np.frombuffer(parts[3][: w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def test_real_jpeg_decodes_against_raw_sibling():
    with open(os.path.join(FIX, "real_baseline.jpg"), "rb") as f:
        buf = f.read()
    img = decode_jpeg(buf)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    truth = _ppm(os.path.join(FIX, "real_baseline.ppm"))
    # full-color PSNR is bounded by the file's own 4:2:0 chroma loss on a
    # sharp-edged 16x16 icon; luma isolates the DCT/huffman path
    assert psnr(img, truth) >= 23.0
    luma = img.astype(np.float64) @ [0.299, 0.587, 0.114]
    luma_t = truth.astype(np.float64) @ [0.299, 0.587, 0.114]
    assert 10 * np.log10(255.0**2 / np.mean((luma - luma_t) ** 2)) >= 35.0
    # regression pin of the exact decoded pixels
    assert zlib.crc32(img.tobytes()) == 1229007597


def test_real_photo_decodes_deterministically():
    with open(os.path.join(FIX, "real_photo.jpg"), "rb") as f:
        buf = f.read()
    img = decode_jpeg(buf)
    assert img.shape == (477, 720, 3)
    assert zlib.crc32(img.tobytes()) == 1572927773


def test_decode_image_dispatches_on_soi():
    """fmt='jpeg' payloads: real JFIF (SOI magic) -> T.81 decoder, the
    synthetic corpus's FJPG container -> the deterministic stand-in."""
    from texel_ray.core.imagecodec import encode_image

    with open(os.path.join(FIX, "real_baseline.jpg"), "rb") as f:
        real = f.read()
    assert decode_image(real, "jpeg").shape == (16, 16, 3)
    arr = (np.arange(16 * 16 * 3, dtype=np.int64) % 251).astype(np.uint8).reshape(16, 16, 3)
    fjpg = encode_image(arr, "jpeg")
    out = decode_image(fjpg, "jpeg")
    assert psnr(out, arr) >= 40.0


def test_progressive_raises_cleanly():
    # minimal SOF2 (progressive) frame header after SOI
    buf = b"\xff\xd8" + b"\xff\xc2" + b"\x00\x0b" + b"\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(buf)
