"""GIF / BMP / extended-PNG decode conformance: the CPython-test-suite
imghdrdata fixtures carry the SAME 16x16 logo in png/bmp/gif, so the
lossless formats must agree pixel-for-pixel across three independent
third-party encoders, with no repo-made ground truth involved."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

from texel_ray.core.imagecodec import (
    decode_bmp,
    decode_gif,
    decode_image,
    decode_png,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _read(name: str) -> bytes:
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


def test_bmp_matches_png_pixel_exact():
    """BITFIELDS 32-bit BMP and palettized PNG of the same image, both
    lossless: decoded pixels must be IDENTICAL."""
    png = decode_png(_read("real_logo.png"))
    bmp = decode_bmp(_read("real_logo.bmp"))
    assert png.shape == bmp.shape == (16, 16, 3)
    assert np.array_equal(bmp, png)
    assert zlib.crc32(png.tobytes()) == 1186727254  # regression pin


def test_gif_decodes_against_png_sibling():
    """The GIF sibling is palette-quantized with a transparent
    background (GCE index 63), so equality holds on the majority of
    pixels and the rest are the documented transparency/quantization
    classes."""
    png = decode_png(_read("real_logo.png"))
    gif = decode_gif(_read("real_logo.gif"))
    assert gif.shape == (16, 16, 3)
    same = np.all(gif == png, axis=2)
    assert same.mean() > 0.6
    assert zlib.crc32(gif.tobytes()) == 2040878644  # regression pin


def test_gif_interlaced_lzw_roundtrip():
    """Hand-authored interlaced GIF (clear-before-every-literal LZW, a
    valid degenerate stream) must decode to the exact pixel grid."""
    h, w = 8, 8
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 4, (h, w)).astype(np.uint8)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)

    # interlace pass order: rows 0,8,16.. then 4,12.. then 2,6.. then odd
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    pixels = np.concatenate([idx[r] for r in order])
    mcs = 2
    clear, _end = 1 << mcs, (1 << mcs) + 1
    acc = nbits = 0
    out = bytearray()

    def put(code: int, size: int = 3):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for p in pixels:
        put(clear)
        put(int(p))
    put(clear + 1)  # end
    if nbits:
        out.append(acc & 0xFF)
    data = bytes(out)
    blocks = b""
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)  # GCT, 4 colors
        + pal.tobytes() + bytes(0)
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
        + bytes([mcs]) + blocks + b"\x00" + b"\x3b"
    )
    outimg = decode_gif(gif)
    assert np.array_equal(outimg, pal[idx])


def test_png_color_types():
    """Gray / RGBA / gray+alpha 8-bit PNGs decode (alpha dropped, gray
    replicated) — authored via zlib with filter 0 rows."""

    def make_png(w, h, ctype, nch, payload):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        raw = b"".join(
            b"\x00" + payload[y * w * nch : (y + 1) * w * nch]
            for y in range(h)
        )
        def chunk(tag, data):
            body = tag + data
            return struct.pack(">I", len(data)) + body + struct.pack(
                ">I", zlib.crc32(body)
            )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    g = (np.arange(12, dtype=np.uint8) * 20).reshape(3, 4)
    img = decode_png(make_png(4, 3, 0, 1, g.tobytes()))
    assert np.array_equal(img, np.repeat(g[:, :, None], 3, axis=2))

    rgba = np.arange(4 * 3 * 4, dtype=np.uint8).reshape(3, 4, 4)
    img = decode_png(make_png(4, 3, 6, 4, rgba.tobytes()))
    assert np.array_equal(img, rgba[:, :, :3])

    ga = np.arange(4 * 3 * 2, dtype=np.uint8).reshape(3, 4, 2)
    img = decode_png(make_png(4, 3, 4, 2, ga.tobytes()))
    assert np.array_equal(img, np.repeat(ga[:, :, :1], 3, axis=2))


def test_decode_image_dispatch_gif_bmp():
    assert decode_image(_read("real_logo.gif"), "gif").shape == (16, 16, 3)
    assert decode_image(_read("real_logo.bmp"), "bmp").shape == (16, 16, 3)
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\x00" * 60)


def test_ppm_matches_jpeg_sibling_fixture():
    """decode_ppm reads the committed third-party PPM ground-truth
    sibling; cross-checked against the repo's existing header parser."""
    from texel_ray.core.imagecodec import decode_ppm

    img = decode_ppm(_read("real_baseline.ppm"))
    assert img.shape == (16, 16, 3)
    # grayscale P5 + comment handling
    g = bytes([10, 20, 30, 40, 50, 60])
    p5 = b"P5\n# comment\n3 2\n255\n" + g
    out = decode_ppm(p5)
    assert np.array_equal(out[:, :, 0].ravel(), np.frombuffer(g, np.uint8))
    assert np.array_equal(out[:, :, 0], out[:, :, 2])


def test_bmp_encode_roundtrip_lossless():
    from texel_ray.core.imagecodec import encode_bmp

    rng = np.random.RandomState(11)
    for shape in ((5, 7, 3), (16, 16, 3), (9, 3, 3)):
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        buf = encode_bmp(img)
        assert buf[:2] == b"BM"
        assert np.array_equal(decode_bmp(buf), img)
