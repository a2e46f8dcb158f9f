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
    from texel_ray.core.imagecodec import encode_fake_jpeg, encode_image

    with open(os.path.join(FIX, "real_baseline.jpg"), "rb") as f:
        real = f.read()
    assert decode_image(real, "jpeg").shape == (16, 16, 3)
    arr = (np.arange(16 * 16 * 3, dtype=np.int64) % 251).astype(np.uint8).reshape(16, 16, 3)
    # legacy FJPG container (synthetic corpus storage) still decodes
    fjpg = encode_fake_jpeg(arr)
    assert psnr(decode_image(fjpg, "jpeg"), arr) >= 40.0
    # encode_image now emits real JFIF (SOI magic) — same dispatch entry
    jfif = encode_image(arr, "jpeg")
    assert bytes(jfif[:2]) == b"\xff\xd8"
    assert psnr(decode_image(jfif, "jpeg"), arr) >= 40.0


# ---- real baseline encoder (encode_jpeg) ----------------------------------


def _fixture_dht_tables(path):
    """Parse every DHT segment of a JPEG file -> {(tc, th): (counts, syms)}."""
    import struct

    with open(path, "rb") as f:
        buf = f.read()
    pos, out = 2, {}
    while pos + 4 <= len(buf):
        marker = buf[pos + 1]
        if marker in (0xD9, 0xDA):
            break
        (seglen,) = struct.unpack_from(">H", buf, pos + 2)
        data = buf[pos + 4 : pos + 2 + seglen]
        if marker == 0xC4:
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 15
                counts = list(data[p + 1 : p + 17])
                n = sum(counts)
                out[(tc, th)] = (counts, list(data[p + 17 : p + 17 + n]))
                p += 17 + n
        pos += 2 + seglen
    return out


def test_annex_k_tables_match_third_party_fixture():
    """Vector anchor for the transcribed T.81 Annex-K huffman tables:
    real_photo.jpg (third-party) carries exactly the standard tables, so
    the transcription is verified against an independent bitstream."""
    from texel_ray.core.imagecodec import (
        _HUFF_AC_CHROMA,
        _HUFF_AC_LUMA,
        _HUFF_DC_CHROMA,
        _HUFF_DC_LUMA,
    )

    dht = _fixture_dht_tables(os.path.join(FIX, "real_photo.jpg"))
    assert dht[(0, 0)] == (_HUFF_DC_LUMA[0], _HUFF_DC_LUMA[1])
    assert dht[(1, 0)] == (_HUFF_AC_LUMA[0], _HUFF_AC_LUMA[1])
    assert dht[(0, 1)] == (_HUFF_DC_CHROMA[0], _HUFF_DC_CHROMA[1])
    assert dht[(1, 1)] == (_HUFF_AC_CHROMA[0], _HUFF_AC_CHROMA[1])


def test_encode_roundtrip_psnr_on_fixtures():
    """encode -> decode >= 40 dB on the third-party fixtures (both the
    PPM ground truth and the decoded photo)."""
    from texel_ray.core.imagecodec import encode_jpeg

    truth = _ppm(os.path.join(FIX, "real_baseline.ppm"))
    assert psnr(truth, decode_jpeg(encode_jpeg(truth))) >= 40.0
    with open(os.path.join(FIX, "real_photo.jpg"), "rb") as f:
        photo = decode_jpeg(f.read())
    assert psnr(photo, decode_jpeg(encode_jpeg(photo))) >= 40.0


def test_encode_roundtrip_psnr_worst_case_noise_and_odd_sizes():
    from texel_ray.core.imagecodec import encode_jpeg

    rng = np.random.default_rng(7)
    for shape in [(16, 16, 3), (8, 8, 3), (5, 7, 3), (33, 17, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img))
        assert dec.shape == img.shape
        assert psnr(img, dec) >= 40.0


def test_encode_emits_valid_jfif_structure():
    """Marker-level sanity: SOI, APP0-JFIF, two DQT, SOF0 4:4:4, four
    DHT, SOS, EOI — the layout any external tool expects."""
    import struct

    from texel_ray.core.imagecodec import encode_jpeg

    img = (np.arange(24 * 24 * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(24, 24, 3)
    buf = encode_jpeg(img)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    pos, markers = 2, []
    while pos + 4 <= len(buf):
        assert buf[pos] == 0xFF
        marker = buf[pos + 1]
        markers.append(marker)
        (seglen,) = struct.unpack_from(">H", buf, pos + 2)
        if marker == 0xDA:
            break
        if marker == 0xE0:
            assert buf[pos + 4 : pos + 9] == b"JFIF\x00"
        if marker == 0xC0:
            # 3 components, all 1x1 sampling (4:4:4)
            data = buf[pos + 4 : pos + 2 + seglen]
            assert data[5] == 3
            assert data[7] == 0x11 and data[10] == 0x11 and data[13] == 0x11
        pos += 2 + seglen
    assert markers.count(0xDB) == 2 and markers.count(0xC4) == 4
    assert markers[-1] == 0xDA


def test_unsupported_sof_raises_cleanly():
    # SOF2 (progressive) is now supported; SOF3 (lossless) and SOF10
    # (arithmetic progressive) still raise the documented error
    for sof in (0xC3, 0xCA):
        buf = (
            b"\xff\xd8"
            + bytes([0xFF, sof])
            + b"\x00\x0b"
            + b"\x08\x00\x10\x00\x10\x01\x01\x11\x00"
        )
        with pytest.raises(NotImplementedError, match="progressive"):
            decode_jpeg(buf)


def test_tilecut_real_jpeg_end_to_end():
    """Container preservation through the cutter: a REAL JFIF source
    emits real JFIF pieces (externally-readable SOI bitstreams) that
    reassemble above the 40 dB gate; an FJPG-container source keeps the
    synthetic fast path."""
    import pyarrow as pa

    from texel_ray.core.imagecodec import (
        decode_jpeg,
        encode_fake_jpeg,
        encode_jpeg,
    )
    from texel_ray.stages.tilecut import TileCutter, reassemble_image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    real_buf = encode_jpeg(img)
    fjpg_buf = encode_fake_jpeg(img)
    batch = pa.table(
        {
            "image_id": pa.array(["real-1", "fjpg-1"]),
            "bytes": pa.array([real_buf, fjpg_buf], pa.binary()),
            "w": pa.array([16, 16], pa.int32()),
            "h": pa.array([16, 16], pa.int32()),
            "fmt": pa.array(["jpeg", "jpeg"]),
            "caption": pa.array(["a", "b"]),
            # straddle a z13 tile boundary so the cut emits >1 piece
            "lon": pa.array([0.01, 0.01]),
            "lat": pa.array([0.01, 0.01]),
        }
    )
    pieces = TileCutter(zoom=13)(batch)
    assert pieces.num_rows >= 4  # both images cut into multiple pieces
    rows = [
        {c: pieces[c][i].as_py() for c in pieces.column_names}
        for i in range(pieces.num_rows)
    ]
    real_rows = [r for r in rows if r["image_id"] == "real-1"]
    fjpg_rows = [r for r in rows if r["image_id"] == "fjpg-1"]
    assert all(bytes(r["bytes"][:2]) == b"\xff\xd8" for r in real_rows)
    assert all(bytes(r["bytes"][:4]) == b"FJPG" for r in fjpg_rows)
    rebuilt = reassemble_image(real_rows, 16, 16)
    assert psnr(decode_jpeg(real_buf), rebuilt) >= 40.0


# ---- progressive (SOF2) decode + encode ------------------------------------


def test_real_progressive_444_decodes_deterministically():
    """Third-party progressive JPEG (nodejs docs asset, 4:4:4, real
    libjpeg scan script with successive approximation) decodes; pixels
    pinned; PSNR vs our own baseline re-encode >= 40 dB."""
    from texel_ray.core.imagecodec import encode_jpeg

    with open(os.path.join(FIX, "real_progressive_444.jpg"), "rb") as f:
        buf = f.read()
    img = decode_jpeg(buf)
    assert img.shape == (58, 493, 3) and img.dtype == np.uint8
    assert zlib.crc32(img.tobytes()) == 3940411038
    assert psnr(img, decode_jpeg(encode_jpeg(img))) >= 40.0


def test_real_progressive_subsampled_decodes_deterministically():
    """Third-party progressive JPEG (Rust embedded-book asset, 2x1
    chroma subsampling): exercises interleaved-DC MCU geometry and the
    non-interleaved component sub-dimensions."""
    with open(os.path.join(FIX, "real_progressive_21.jpg"), "rb") as f:
        buf = f.read()
    img = decode_jpeg(buf)
    assert img.shape == (477, 720, 3)
    assert zlib.crc32(img.tobytes()) == 114274112


def test_progressive_encode_bitexact_vs_baseline():
    """Progressive transmission is a LOSSLESS reordering of the same
    quantized coefficients: decode(progressive_encode(img)) must equal
    decode(baseline_encode(img)) bit-for-bit. The baseline path is
    third-party-anchored, so this pins the whole spectral-selection +
    successive-approximation machinery (EOB runs, ZRL-in-refinement,
    correction-bit buffering) without circularity."""
    from texel_ray.core.imagecodec import encode_jpeg, encode_jpeg_progressive

    rng = np.random.RandomState(7)
    with open(os.path.join(FIX, "real_photo.jpg"), "rb") as f:
        photo = decode_jpeg(f.read())[:96, :112]
    cases = [
        photo,
        rng.randint(0, 256, (8, 8, 3), dtype=np.uint8),
        rng.randint(0, 256, (24, 40, 3), dtype=np.uint8),
        np.zeros((16, 16, 3), dtype=np.uint8),  # all-EOB-run scans
    ]
    for img in cases:
        pbuf = encode_jpeg_progressive(img)
        assert pbuf[:2] == b"\xff\xd8" and b"\xff\xc2" in pbuf[:200]
        assert np.array_equal(decode_jpeg(pbuf), decode_jpeg(encode_jpeg(img)))


def test_progressive_encode_dispatches_via_decode_image():
    from texel_ray.core.imagecodec import encode_jpeg_progressive

    img = (np.arange(12 * 20 * 3, dtype=np.int64) % 251).astype(np.uint8).reshape(12, 20, 3)
    out = decode_image(encode_jpeg_progressive(img), "jpeg")
    assert out.shape == (12, 20, 3)
    assert psnr(img, out) >= 30.0
