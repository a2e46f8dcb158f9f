"""Image payload codecs for the multimodal (image+caption) pipeline.

The evaluation container has no PIL/libjpeg/OpenCV, so:

- ``png``: a real, self-contained PNG codec (RGB8, zlib DEFLATE) —
  bit-exact roundtrip, valid files readable by any external PNG reader.
- ``jpeg`` DECODE: a real pure-numpy baseline JPEG decoder (ITU-T
  T.81: SOF0/SOF1 frames, huffman entropy decode via a flat 16-bit
  prefix table, restart intervals, any 1x1/2x1/2x2 subsampling,
  batched float IDCT) — real third-party JFIF files decode; pinned in
  tests/test_jpeg.py against a CPython-test-suite fixture with a raw
  PPM ground-truth sibling. Progressive (SOF2) raises a documented
  NotImplementedError.
- ``jpeg`` ENCODE: the deterministic lossy stand-in ("FJPG": uniform
  quantization step 4 + zlib, PSNR >= 40 dB) — the synthetic corpus
  uses it, and ``decode_image`` dispatches on the payload magic (SOI
  -> real decoder, FJPG -> stand-in), so real corpora and the
  synthetic table coexist.

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


# ---- real baseline JPEG decoder (pure numpy, ITU-T T.81) ------------------
#
# Decodes baseline DCT JFIF/JPEG: SOF0/SOF1, multiple DQT/DHT tables,
# restart intervals, arbitrary H/V chroma subsampling (1x1, 2x1, 2x2),
# 1- or 3-component scans. Written from the published T.81 spec — no
# libjpeg code. The encoder side deliberately stays the deterministic
# FJPG stand-in (an encoder is not needed to ingest real corpora).

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 type-III DCT basis: block = C^T @ coeffs @ C with orthonormal C
_DCT_C = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if k == 0 else np.sqrt(2.0 / 8.0))
            * np.cos((2 * n + 1) * k * np.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ],
    dtype=np.float64,
)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with FF00
    byte-unstuffing and restart-marker awareness. peek/skip support the
    flat 16-bit-prefix huffman lookup (one table probe per symbol)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                # marker reached: T.81 pads the tail with 1-bits
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
            else:
                self.pos += 1
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def peek16(self) -> int:
        while self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int):
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self):
        """Consume a RSTn marker at a byte boundary; reset bit state."""
        self.acc = 0
        self.nbits = 0
        while self.buf[self.pos] != 0xFF or self.buf[self.pos + 1] == 0x00:
            self.pos += 1
        m = self.buf[self.pos + 1]
        if 0xD0 <= m <= 0xD7:
            self.pos += 2


def _build_huffman(bits_counts, symbols):
    """(BITS, HUFFVAL) -> flat 2^16 lookup: 16-bit prefix -> packed
    (code length << 8 | symbol), per the T.81 C.2 canonical code order."""
    flat = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits_counts[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            flat[lo:hi] = (length << 8) | symbols[k]
            code += 1
            k += 1
        code <<= 1
    return flat


def _huff_decode(r: _BitReader, flat) -> int:
    entry = int(flat[r.peek16()])
    if entry == 0:
        raise ValueError("invalid JPEG huffman code")
    r.skip(entry >> 8)
    return entry & 0xFF


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> RGB8 (h, w, 3) (grayscale replicated)."""
    buf = bytes(buf)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", buf, pos + 2)
        data = buf[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(data[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(data[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                q = np.zeros(64, dtype=np.int64)
                q[_ZIGZAG] = vals
                qt[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 15
                counts = list(data[p + 1 : p + 17])
                n = sum(counts)
                syms = list(data[p + 17 : p + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _build_huffman(counts, syms)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (baseline + ext. seq.)
            prec, h, w, nc = data[0], *struct.unpack_from(">HH", data, 1), data[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq_ = data[6 + c * 3], data[7 + c * 3], data[8 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq_})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline (SOF0/SOF1) JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS
            ns = data[0]
            scan = []
            for c in range(ns):
                cs, tdta = data[1 + c * 2], data[2 + c * 2]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 15))
            hmax = max(c["h"] for c in frame["comps"])
            vmax = max(c["v"] for c in frame["comps"])
            mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
            mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
            # phase 1: pure huffman/bit decode into per-component
            # (nblocks, 64) coefficient arrays — no numpy in the loop
            nmcu = mcuy * mcux
            coefs = [
                np.zeros((nmcu * comp["v"] * comp["h"], 64), dtype=np.int32)
                for comp, _, _ in scan
            ]
            zig = _ZIGZAG.tolist()
            r = _BitReader(buf, pos)
            pred = [0] * ns
            nblk = [0] * ns
            mcu_count = 0
            for _my in range(mcuy):
                for _mx in range(mcux):
                    if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                        r.restart()
                        pred = [0] * ns
                    for ci, (comp, td, ta) in enumerate(scan):
                        dct = huff_dc[td]
                        act = huff_ac[ta]
                        carr = coefs[ci]
                        for _b in range(comp["v"] * comp["h"]):
                            t = _huff_decode(r, dct)
                            if t:
                                pred[ci] += _extend(r.bits(t), t)
                            row = carr[nblk[ci]]
                            row[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(r, act)
                                ssss = rs & 15
                                if ssss == 0:
                                    if rs == 0xF0:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += rs >> 4
                                row[zig[k]] = _extend(r.bits(ssss), ssss)
                                k += 1
                            nblk[ci] += 1
                    mcu_count += 1
            # phase 2: batched dequant + IDCT + MCU-order scatter per
            # component (one einsum instead of per-block matmuls)
            h, w = frame["h"], frame["w"]
            full = []
            for ci, (comp, _, _) in enumerate(scan):
                blocks = coefs[ci].reshape(-1, 8, 8) * qt[comp["tq"]][None]
                px = np.einsum(
                    "ki,nij,jl->nkl", _DCT_C.T, blocks.astype(np.float32), _DCT_C
                ) + np.float32(128.0)
                v, hh = comp["v"], comp["h"]
                plane = (
                    px.reshape(mcuy, mcux, v, hh, 8, 8)
                    .transpose(0, 2, 4, 1, 3, 5)
                    .reshape(mcuy * v * 8, mcux * hh * 8)
                )
                ry, rx = vmax // v, hmax // hh
                if ry > 1 or rx > 1:
                    plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
                full.append(plane[:h, :w])
            if ns == 1:
                y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
                return np.stack([y, y, y], axis=2)
            y, cb, cr = full[0], full[1] - np.float32(128.0), full[2] - np.float32(128.0)
            rgb = np.empty((h, w, 3), dtype=np.float32)
            rgb[:, :, 0] = y + np.float32(1.402) * cr
            rgb[:, :, 1] = y - np.float32(0.344136) * cb - np.float32(0.714136) * cr
            rgb[:, :, 2] = y + np.float32(1.772) * cb
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        elif marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos -= seglen  # parameterless markers carry no length field
            pos += 0
    raise ValueError("no SOS scan found in JPEG")


def decode_image(buf: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(buf)
    if fmt == "jpeg":
        # real JFIF/JPEG payloads (SOI marker) decode with the baseline
        # T.81 decoder; the synthetic corpus's FJPG stand-in keeps its
        # deterministic path
        if bytes(buf[:2]) == b"\xff\xd8":
            return decode_jpeg(buf)
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
