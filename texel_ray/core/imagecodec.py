"""Image payload codecs for the multimodal (image+caption) pipeline.

The evaluation container has no PIL/libjpeg/OpenCV, so:

- ``png``: a real, self-contained PNG codec (RGB8, zlib DEFLATE) —
  bit-exact roundtrip, valid files readable by any external PNG reader.
- ``jpeg`` DECODE: a real pure-numpy JPEG decoder (ITU-T T.81:
  baseline SOF0/SOF1 AND progressive SOF2 frames — spectral selection,
  successive approximation, EOB runs —, huffman entropy decode via a
  flat 16-bit prefix table, restart intervals, any 1x1/2x1/2x2
  subsampling, batched float IDCT) — real third-party JFIF files
  decode; pinned in tests/test_jpeg.py against a CPython-test-suite
  fixture with a raw PPM ground-truth sibling plus two third-party
  progressive fixtures (nodejs docs, Rust embedded-book). Lossless
  (SOF3) and arithmetic-coded frames raise a documented
  NotImplementedError.
- ``jpeg`` ENCODE: a real pure-numpy baseline JFIF encoder (4:4:4,
  Annex-K quant + huffman tables at quality 98, PSNR >= 40 dB even on
  noise) — outputs are readable by any external JPEG tool and by the
  decoder above. The legacy deterministic "FJPG" stand-in remains only
  as the synthetic corpus's storage format; ``decode_image`` dispatches
  on the payload magic (SOI -> real decoder, FJPG -> stand-in), so the
  synthetic table and re-encoded outputs coexist.

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
    """PNG bytes -> RGB8 array. Supports every 8-bit non-interlaced
    color type (gray / RGB / palette / gray+alpha / RGBA; alpha dropped,
    gray replicated, palette resolved), filters 0-4."""
    buf = bytes(buf)
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    ctype = 2
    pal = None
    idat = []
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace != 0 or ctype not in (0, 2, 3, 4, 6):
                raise ValueError("only 8-bit non-interlaced PNG supported")
        elif tag == b"PLTE":
            pal = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = w * nch + 1
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)

    def to_rgb(flat: np.ndarray) -> np.ndarray:
        px = flat.reshape(h, w, nch)
        if ctype == 2:
            rgb = px
        elif ctype == 6:
            rgb = px[:, :, :3]
        elif ctype == 3:
            if pal is None:
                raise ValueError("palette PNG without PLTE")
            rgb = pal[np.minimum(px[:, :, 0], len(pal) - 1)]
        else:  # 0 or 4: grayscale (+alpha dropped)
            rgb = np.repeat(px[:, :, :1], 3, axis=2)
        return np.ascontiguousarray(rgb)

    if not rows[:, 0].any():  # all filter 0 (our encoder): fully vectorized
        return to_rgb(np.ascontiguousarray(rows[:, 1:]))
    out = np.zeros((h, w * nch), dtype=np.uint8)
    bpp = nch
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
    return to_rgb(out)


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
# libjpeg code.

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
            if nxt != 0x00:
                # marker reached (RSTn, EOI, or — in a progressive
                # stream — the next SOS/DHT): T.81 pads the tail with
                # 1-bits; never advance past the marker
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
            self.pos += 2
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
        elif marker == 0xC2:  # SOF2: progressive DCT — dedicated multi-scan path
            return _decode_jpeg_progressive(buf)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) JPEG supported"
            )
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


# ---- progressive (SOF2) JPEG decode ---------------------------------------
#
# T.81 Annexes G.1/G.2, written from the published spec: spectral
# selection (Ss..Se bands per scan) + successive approximation (Ah/Al
# bit-plane refinement), interleaved DC scans, non-interleaved AC scans,
# EOB-run coding, restart intervals. Coefficients accumulate across scans
# into per-component block grids; the final dequant+IDCT reuses the same
# batched einsum as the baseline path. Progressive transmission is a
# LOSSLESS reordering of the same quantized coefficients, so a fully
# refined progressive stream must decode bit-identically to the baseline
# encoding of the same coefficients (pinned in tests/test_jpeg.py).


def _next_marker(buf: bytes, pos: int) -> int:
    """Index of the next real marker (0xFF + not-a-stuffed-zero, not
    RSTn) at or after pos."""
    n = len(buf)
    while pos + 1 < n:
        if buf[pos] == 0xFF:
            m = buf[pos + 1]
            if m != 0x00 and not (0xD0 <= m <= 0xD7):
                return pos
        pos += 1
    return n


def _ac_first_scan(block, r, act, ss, se, al, eobrun, zig):
    """One block of an Ah=0 AC scan (T.81 G.1.2.2); returns eobrun."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(r, act)
        ssss = rs & 15
        rr = rs >> 4
        if ssss == 0:
            if rr == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << rr) - 1
            if rr:
                eobrun += r.bits(rr)
            return eobrun
        k += rr
        block[zig[k]] = _extend(r.bits(ssss), ssss) << al
        k += 1
    return 0


def _ac_refine_scan(block, r, act, ss, se, al, eobrun, zig):
    """One block of an Ah>0 AC refinement scan (T.81 G.1.2.3); returns
    eobrun. Correction bits ride along for every already-nonzero
    coefficient passed over, including inside EOB runs."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, act)
            ssss = rs & 15
            rr = rs >> 4
            val = 0
            if ssss == 0:
                if rr != 15:
                    eobrun = 1 << rr
                    if rr:
                        eobrun += r.bits(rr)
                    break
                # rr == 15: ZRL — pass 16 zero-history coefficients
            else:  # ssss must be 1 in a refinement scan
                val = p1 if r.bits(1) else m1
            while k <= se:
                z = zig[k]
                cur = int(block[z])
                if cur != 0:
                    if r.bits(1) and (cur & p1) == 0:
                        block[z] = cur + (p1 if cur >= 0 else m1)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val:
                block[zig[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = zig[k]
            cur = int(block[z])
            if cur != 0:
                if r.bits(1) and (cur & p1) == 0:
                    block[z] = cur + (p1 if cur >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_jpeg_progressive(buf: bytes) -> np.ndarray:
    """Progressive JPEG bytes -> RGB8 (h, w, 3) (grayscale replicated)."""
    buf = bytes(buf)
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, np.ndarray] = {}
    huff_ac: dict[int, np.ndarray] = {}
    restart_interval = 0
    frame = None
    grids = None  # per component: (bh_pad, bw_pad, 64) int32, natural order
    zig = _ZIGZAG.tolist()
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
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
        elif marker == 0xC2:  # SOF2
            prec, h, w, nc = data[0], *struct.unpack_from(">HH", data, 1), data[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq_ = data[6 + c * 3], data[7 + c * 3], data[8 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq_})
            frame = {"h": h, "w": w, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            frame["hmax"], frame["vmax"] = hmax, vmax
            frame["mcux"], frame["mcuy"] = mcux, mcuy
            grids = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                for c in comps
            ]
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS: one progressive scan
            if frame is None:
                raise ValueError("SOS before SOF2")
            ns = data[0]
            scan = []
            for c in range(ns):
                cs, tdta = data[1 + c * 2], data[2 + c * 2]
                idx = next(
                    i for i, x in enumerate(frame["comps"]) if x["id"] == cs
                )
                scan.append((idx, tdta >> 4, tdta & 15))
            ss, se = data[1 + ns * 2], data[2 + ns * 2]
            ahal = data[3 + ns * 2]
            ah, al = ahal >> 4, ahal & 15
            r = _BitReader(buf, pos)
            if ns > 1:
                # interleaved scan (DC band only, per T.81): MCU order
                if ss != 0:
                    raise ValueError("interleaved AC scan is not valid T.81")
                pred = [0] * ns
                mcu_count = 0
                for my in range(frame["mcuy"]):
                    for mx in range(frame["mcux"]):
                        if (
                            restart_interval
                            and mcu_count
                            and mcu_count % restart_interval == 0
                        ):
                            r.restart()
                            pred = [0] * ns
                        for ci, (idx, td, _ta) in enumerate(scan):
                            comp = frame["comps"][idx]
                            grid = grids[idx]
                            for by in range(comp["v"]):
                                for bx in range(comp["h"]):
                                    block = grid[
                                        my * comp["v"] + by, mx * comp["h"] + bx
                                    ]
                                    if ah == 0:
                                        t = _huff_decode(r, huff_dc[td])
                                        if t:
                                            pred[ci] += _extend(r.bits(t), t)
                                        block[0] = pred[ci] << al
                                    else:
                                        if r.bits(1):
                                            block[0] = int(block[0]) | (1 << al)
                        mcu_count += 1
            else:
                # non-interleaved: raster over the component's REAL block
                # dims (not MCU-padded), one block per restart unit
                idx, td, ta = scan[0]
                comp = frame["comps"][idx]
                grid = grids[idx]
                xi = (frame["w"] * comp["h"] + frame["hmax"] - 1) // frame["hmax"]
                yi = (frame["h"] * comp["v"] + frame["vmax"] - 1) // frame["vmax"]
                bw = (xi + 7) // 8
                bh = (yi + 7) // 8
                eobrun = 0
                pred0 = 0
                blocknum = 0
                act = huff_ac.get(ta)
                dct = huff_dc.get(td)
                for byy in range(bh):
                    for bxx in range(bw):
                        if (
                            restart_interval
                            and blocknum
                            and blocknum % restart_interval == 0
                        ):
                            r.restart()
                            pred0 = 0
                            eobrun = 0
                        block = grid[byy, bxx]
                        if ss == 0:
                            if ah == 0:
                                t = _huff_decode(r, dct)
                                if t:
                                    pred0 += _extend(r.bits(t), t)
                                block[0] = pred0 << al
                            else:
                                if r.bits(1):
                                    block[0] = int(block[0]) | (1 << al)
                        elif ah == 0:
                            eobrun = _ac_first_scan(
                                block, r, act, ss, se, al, eobrun, zig
                            )
                        else:
                            eobrun = _ac_refine_scan(
                                block, r, act, ss, se, al, eobrun, zig
                            )
                        blocknum += 1
            pos = _next_marker(buf, r.pos)
        # any other segment (APPn/COM/...) is skipped by the length field
    if frame is None or grids is None:
        raise ValueError("no SOF2 frame found in progressive JPEG")
    # dequant + batched IDCT + plane assembly (same math as baseline)
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    full = []
    for comp, grid in zip(frame["comps"], grids):
        gh, gw, _ = grid.shape
        blocks = grid.reshape(-1, 8, 8) * qt[comp["tq"]][None]
        px = np.einsum(
            "ki,nij,jl->nkl", _DCT_C.T, blocks.astype(np.float32), _DCT_C
        ) + np.float32(128.0)
        plane = (
            px.reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
        )
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    y, cb, cr = full[0], full[1] - np.float32(128.0), full[2] - np.float32(128.0)
    rgb = np.empty((h, w, 3), dtype=np.float32)
    rgb[:, :, 0] = y + np.float32(1.402) * cr
    rgb[:, :, 1] = y - np.float32(0.344136) * cb - np.float32(0.714136) * cr
    rgb[:, :, 2] = y + np.float32(1.772) * cb
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---- real baseline JPEG encoder (pure numpy + python bit writer) ----------
#
# Inverse of decode_jpeg: BT.601 color transform, 4:4:4 sampling (every
# component 1x1 — simplest valid baseline layout, highest fidelity),
# Annex-K quantization tables with the public IJG quality scaling, and
# the standard T.81 Annex-K huffman tables. The table transcriptions are
# VECTOR-ANCHORED: tests/test_jpeg.py asserts they equal byte-for-byte
# the DHT segments of the committed third-party fixture
# (tests/fixtures/real_photo.jpg), which carries the standard tables.
# Output is plain JFIF readable by any external JPEG tool.

# T.81 Annex K.1 / K.2 quantization tables (natural row order)
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# T.81 Annex K.3 standard huffman tables: (BITS counts, HUFFVAL)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _encode_codes(bits_counts, symbols):
    """(BITS, HUFFVAL) -> dict symbol -> (code, length), T.81 C.2 order."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits_counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_ENC_DC = (_encode_codes(*_HUFF_DC_LUMA), _encode_codes(*_HUFF_DC_CHROMA))
_ENC_AC = (_encode_codes(*_HUFF_AC_LUMA), _encode_codes(*_HUFF_AC_CHROMA))


def _codes_to_arrays(codes: dict, size: int):
    """symbol -> (code, len) dict as two int64 lookup arrays for the
    vectorized scan writer."""
    c = np.zeros(size, dtype=np.int64)
    ln = np.zeros(size, dtype=np.int64)
    for sym, (code, length) in codes.items():
        c[sym] = code
        ln[sym] = length
    return c, ln


_ENC_DC_ARR = (_codes_to_arrays(_ENC_DC[0], 16), _codes_to_arrays(_ENC_DC[1], 16))
_ENC_AC_ARR = (_codes_to_arrays(_ENC_AC[0], 256), _codes_to_arrays(_ENC_AC[1], 256))


def _scaled_quant(q: np.ndarray, quality: int) -> np.ndarray:
    """Public IJG quality scaling of an Annex-K table (50 = unscaled)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * scale + 50) // 100, 1, 255).astype(np.int64)


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) float32 -> (nblocks, 8, 8) in MCU (row-major block) order,
    edge-replicated to multiples of 8."""
    h, w = plane.shape
    bh, bw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    if bh != h or bw != w:
        plane = np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge")
    return (
        plane.reshape(bh // 8, 8, bw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


# Fixed-point FDCT basis (20 fractional bits). The forward transform is
# EXACT int64 arithmetic — a float BLAS matmul's summation order varies
# with the batch's row count, so the same pixels could quantize
# differently depending on which batch they ride in (observed: 2 flipped
# coefficients in 60k images), breaking golden determinism. Integer
# multiply-adds are associative, so the result is identical for any
# batch composition. Value bound: |T2| <= 8 * (8*2^19*255) * 2^19
# = 4.5e18 < 2^63.
_FDCT_CI = np.round(_DCT_C * (1 << 20)).astype(np.int64)


def _fdct_quant(blocks: np.ndarray, qzz: np.ndarray) -> np.ndarray:
    """(N, 8, 8) level-shifted int64 blocks -> (N, 64) quantized zigzag
    coefficients, exactly: X = C' B C'^T at 2^40 scale, then round-half-
    away division by (q << 40). Deterministic for any N."""
    n = blocks.shape[0]
    t1 = np.zeros((n, 8, 8), dtype=np.int64)
    for k in range(8):
        t1 += _FDCT_CI[None, :, k, None] * blocks[:, k, None, :]
    x = np.zeros((n, 8, 8), dtype=np.int64)
    for l in range(8):  # noqa: E741
        x += t1[:, :, l, None] * _FDCT_CI[None, None, :, l]
    z = x.reshape(n, 64)[:, _ZIGZAG]
    d = qzz.astype(np.int64) << 40
    half = d >> 1
    q = (np.abs(z) + half) // d
    return np.where(z < 0, -q, q).astype(np.int32)

_ENC_CACHE: dict = {}


def _enc_tables(quality: int):
    """Cached per-quality scaled quant rows (zigzag order, float32
    divisors) + the constant header segments that don't depend on size."""
    hit = _ENC_CACHE.get(quality)
    if hit is not None:
        return hit

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    ql = _scaled_quant(_QUANT_LUMA, quality)
    qc = _scaled_quant(_QUANT_CHROMA, quality)
    zz_l = ql.reshape(-1)[_ZIGZAG]
    zz_c = qc.reshape(-1)[_ZIGZAG]
    head = b"".join(
        [
            b"\xff\xd8",  # SOI
            seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
            seg(0xDB, b"\x00" + zz_l.astype(np.uint8).tobytes()),
            seg(0xDB, b"\x01" + zz_c.astype(np.uint8).tobytes()),
        ]
    )
    tail = b"".join(
        [
            seg(0xC4, bytes([0x00] + _HUFF_DC_LUMA[0]) + bytes(_HUFF_DC_LUMA[1])),
            seg(0xC4, bytes([0x10] + _HUFF_AC_LUMA[0]) + bytes(_HUFF_AC_LUMA[1])),
            seg(0xC4, bytes([0x01] + _HUFF_DC_CHROMA[0]) + bytes(_HUFF_DC_CHROMA[1])),
            seg(0xC4, bytes([0x11] + _HUFF_AC_CHROMA[0]) + bytes(_HUFF_AC_CHROMA[1])),
            seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])),
        ]
    )
    entry = (
        zz_l.astype(np.int64),
        zz_c.astype(np.int64),
        head,
        tail,
        seg,
    )
    _ENC_CACHE[quality] = entry
    return entry


def encode_jpeg_batch(imgs: list, quality: int = 98) -> list:
    """Encode MANY RGB8 images to baseline JFIF in one vectorized pass
    (4:4:4, Annex-K tables). This is the tile-piece hot path: tiny
    crops are numpy-call-overhead bound one at a time, so the FDCT, the
    huffman token generation and the bit packing all run ONCE over the
    concatenated blocks of the whole batch; per-image work is just the
    color transform and the final byte split. quality=98 keeps the
    lossy roundtrip >= 40 dB even on pure-noise input (measured 43.6 dB
    worst case; natural content 44-54 dB)."""
    if not imgs:
        return []
    zz_l, zz_c, head, tail, seg = _enc_tables(quality)

    nimg = len(imgs)
    comp_blocks = ([], [], [])
    nb = np.empty(nimg, dtype=np.int64)
    for i, img in enumerate(imgs):
        h, w, c = img.shape
        assert c == 3 and img.dtype == np.uint8
        f = img.astype(np.float32)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        nb[i] = ((h + 7) // 8) * ((w + 7) // 8)
        for ci, plane in enumerate((y, cb, cr)):
            # standard 8-bit YCbCr sampling: elementwise round/clip (no
            # cross-element float reduction -> batch-independent)
            p = np.clip(np.round(plane), 0.0, 255.0).astype(np.int64)
            comp_blocks[ci].append(_plane_blocks(p).reshape(-1, 8, 8))

    nblocks = int(nb.sum())
    img_of_block = np.repeat(np.arange(nimg, dtype=np.int64), nb)
    block_starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    is_first_block = np.zeros(nblocks, dtype=bool)
    is_first_block[block_starts] = True

    comp_coef = []
    for ci, q in ((0, zz_l), (1, zz_c), (2, zz_c)):
        blocks = np.concatenate(comp_blocks[ci]) - np.int64(128)
        comp_coef.append(_fdct_quant(blocks, q))

    # ---- entropy-coded scans, fully vectorized across the batch: every
    # token (huffman code + amplitude merged into one value/nbits pair)
    # is generated per component in numpy, ordered by an (image-major
    # block, component, zigzag-position) sort key, bit-packed with ONE
    # packbits (per-image byte alignment via 1-padding), FF-stuffed with
    # one np.insert per image.
    tok_val, tok_bits, tok_key, tok_img = [], [], [], []
    for ci, tab in enumerate((0, 1, 1)):
        Z = comp_coef[ci]
        dc_c, dc_l = _ENC_DC_ARR[tab]
        ac_c, ac_l = _ENC_AC_ARR[tab]
        # DC: differential with the predictor RESET at each image start
        dc = Z[:, 0].astype(np.int64)
        prev = np.concatenate(([0], dc[:-1]))
        diff = np.where(is_first_block, dc, dc - prev)
        s = np.frexp(np.abs(diff).astype(np.float64))[1].astype(np.int64)
        amp = np.where(diff >= 0, diff, diff + (np.int64(1) << s) - 1)
        tok_val.append((dc_c[s].astype(np.int64) << s) | amp)
        tok_bits.append(dc_l[s] + s)
        tok_key.append(np.arange(nblocks, dtype=np.int64) * 512 + ci * 128)
        tok_img.append(img_of_block)
        # AC: nonzero coefficients with runs, ZRL expansion, EOB
        bi, kj = np.nonzero(Z[:, 1:])
        k = kj.astype(np.int64) + 1
        v = Z[bi, k].astype(np.int64)
        first = np.concatenate(([True], bi[1:] != bi[:-1]))
        prev_k = np.concatenate(([0], k[:-1]))
        run = k - np.where(first, 0, prev_k) - 1
        nzrl = run >> 4
        s = np.frexp(np.abs(v).astype(np.float64))[1].astype(np.int64)
        amp = np.where(v >= 0, v, v + (np.int64(1) << s) - 1)
        sym = ((run & 15) << 4) | s
        base_key = bi.astype(np.int64) * 512 + ci * 128 + 2 * k
        tok_val.append((ac_c[sym].astype(np.int64) << s) | amp)
        tok_bits.append(ac_l[sym] + s)
        tok_key.append(base_key)
        tok_img.append(img_of_block[bi])
        if nzrl.sum():
            zrl_code, zrl_len = int(ac_c[0xF0]), int(ac_l[0xF0])
            zi = np.repeat(np.arange(len(k)), nzrl)
            tok_val.append(np.full(len(zi), zrl_code, dtype=np.int64))
            tok_bits.append(np.full(len(zi), zrl_len, dtype=np.int64))
            tok_key.append(base_key[zi] - 1)  # just before their coeff
            tok_img.append(img_of_block[bi[zi]])
        # EOB for every block whose last nonzero isn't position 63
        last_k = np.zeros(nblocks, dtype=np.int64)
        if len(k):
            last_k[bi] = np.maximum.reduceat(
                k, np.nonzero(first)[0]
            )[np.cumsum(first) - 1]  # per-row max via segmented reduce
        need_eob = np.nonzero(last_k != 63)[0]
        eob_code, eob_len = int(ac_c[0]), int(ac_l[0])
        tok_val.append(np.full(len(need_eob), eob_code, dtype=np.int64))
        tok_bits.append(np.full(len(need_eob), eob_len, dtype=np.int64))
        tok_key.append(need_eob * 512 + ci * 128 + 127)
        tok_img.append(img_of_block[need_eob])
    val = np.concatenate(tok_val)
    bits = np.concatenate(tok_bits)
    order = np.argsort(np.concatenate(tok_key), kind="stable")
    val, bits = val[order], bits[order]
    timg = np.concatenate(tok_img)[order]  # non-decreasing (keys img-major)

    # per-image bit budgets, byte-aligned starts (padding bits are 1s)
    img_bits = np.bincount(timg, weights=bits.astype(np.float64), minlength=nimg)
    img_bits = img_bits.astype(np.int64)
    img_padded = (img_bits + 7) // 8 * 8
    img_start = np.concatenate(([0], np.cumsum(img_padded)[:-1]))
    base = np.concatenate(([0], np.cumsum(img_bits)[:-1]))  # bits before image

    ends = np.cumsum(bits)
    tok_pos = img_start[timg] + (ends - bits) - base[timg]
    total_padded = int(img_padded.sum())
    j = np.arange(int(bits.sum()), dtype=np.int64) - np.repeat(ends - bits, bits)
    shifts = np.repeat(bits, bits) - 1 - j
    bitvals = ((np.repeat(val, bits) >> shifts) & 1).astype(np.uint8)
    bitarr = np.ones(total_padded, dtype=np.uint8)
    bitarr[np.repeat(tok_pos, bits) + j] = bitvals
    allbytes = np.packbits(bitarr)

    out = []
    for i, img in enumerate(imgs):
        h, w, _ = img.shape
        b0 = int(img_start[i] // 8)
        scan = allbytes[b0 : b0 + int(img_padded[i] // 8)]
        ff = np.nonzero(scan == 0xFF)[0]  # T.81 byte stuffing
        if len(ff):
            scan = np.insert(scan, ff + 1, 0)
        out.append(
            b"".join(
                [
                    head,
                    seg(
                        0xC0,
                        struct.pack(">BHHB", 8, h, w, 3)
                        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
                    ),
                    tail,
                    scan.tobytes(),
                    b"\xff\xd9",  # EOI
                ]
            )
        )
    return out


def encode_jpeg(img: np.ndarray, quality: int = 98) -> bytes:
    """RGB8 (h, w, 3) -> baseline JFIF bytes (see encode_jpeg_batch)."""
    return encode_jpeg_batch([img], quality)[0]


# ---- progressive (SOF2) JPEG encoder ---------------------------------------
#
# Emits a multi-scan progressive stream (spectral selection + successive
# approximation, T.81 Annex G.2) over the SAME quantized coefficients as
# the baseline encoder — so decode(progressive) must equal
# decode(baseline) bit-for-bit (the cross-validation pinned in
# tests/test_jpeg.py). The AC table is a custom uniform-8-bit canonical
# table because progressive EOBn symbols (0x10..0xE0) don't exist in the
# Annex-K baseline tables.

_PROG_AC_SYMS = sorted(
    {(run << 4) | s for run in range(16) for s in range(1, 15)}
    | {rr << 4 for rr in range(15)}
    | {0xF0}
)
_PROG_AC_TABLE = (
    [0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMS), 0, 0, 0, 0, 0, 0, 0, 0],
    _PROG_AC_SYMS,
)
_PROG_AC_CODES = _encode_codes(*_PROG_AC_TABLE)
_PROG_DC_CODES = _ENC_DC[0]

# default scan script: covers every progressive decode branch —
# interleaved DC first + DC refinement, banded AC first scans with EOB
# runs, and two-level AC successive-approximation refinement on luma
_PROG_SCAN_SCRIPT = (
    ((0, 1, 2), 0, 0, 0, 1),  # DC first, Al=1
    ((0,), 1, 5, 0, 2),  # AC luma low band, Al=2
    ((0,), 6, 63, 0, 2),  # AC luma high band, Al=2
    ((1,), 1, 63, 0, 1),  # AC chroma, Al=1
    ((2,), 1, 63, 0, 1),
    ((0, 1, 2), 0, 0, 1, 0),  # DC refine
    ((0,), 1, 63, 2, 1),  # AC luma refine 2->1
    ((0,), 1, 63, 1, 0),  # AC luma refine 1->0
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
)


class _BitWriterE:
    """MSB-first bit writer with T.81 FF00 byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, n: int):
        if n <= 0:
            return
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-bit padding per F.1.2.3
        b = bytes(self.out)
        self.out = bytearray()
        return b


def _mag_bits(v: int) -> tuple[int, int]:
    """(size s, amplitude bits) for a signed value per T.81 F.1.2.1/2."""
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _trunc_shift(v: int, al: int) -> int:
    """AC point transform: magnitude shift (truncation toward zero)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 98, script=_PROG_SCAN_SCRIPT
) -> bytes:
    """RGB8 (h, w, 3) -> progressive (SOF2) JFIF bytes, 4:4:4, same
    quantized coefficients as the baseline encoder at this quality."""
    zz_l, zz_c, head, _tail, seg = _enc_tables(quality)
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    f = img.astype(np.float32)
    r_, g_, b_ = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
    cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
    comp_coef = []
    for plane, q in ((y, zz_l), (cb, zz_c), (cr, zz_c)):
        p = np.clip(np.round(plane), 0.0, 255.0).astype(np.int64)
        comp_coef.append(_fdct_quant(_plane_blocks(p) - np.int64(128), q))
    nby, nbx = (h + 7) // 8, (w + 7) // 8

    parts = [
        head,
        seg(
            0xC2,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
        ),
        seg(0xC4, bytes([0x00] + _HUFF_DC_LUMA[0]) + bytes(_HUFF_DC_LUMA[1])),
        seg(
            0xC4,
            bytes([0x10] + _PROG_AC_TABLE[0]) + bytes(_PROG_AC_TABLE[1]),
        ),
    ]
    dc_codes, ac_codes = _PROG_DC_CODES, _PROG_AC_CODES

    for comp_ids, ss, se, ah, al in script:
        ns = len(comp_ids)
        sos = bytes([ns])
        for cid in comp_ids:
            sos += bytes([cid + 1, (0 << 4) | 0])  # DC table 0, AC table 0
        sos += bytes([ss, se, (ah << 4) | al])
        parts.append(seg(0xDA, sos))
        wtr = _BitWriterE()
        if ss == 0 and ah == 0:
            # DC first scan (interleaved MCU order == block raster at 4:4:4)
            pred = [0] * ns
            for bi in range(nby * nbx):
                for ci, cid in enumerate(comp_ids):
                    d = int(comp_coef[cid][bi, 0]) >> al  # arithmetic shift
                    diff = d - pred[ci]
                    pred[ci] = d
                    s, amp = _mag_bits(diff)
                    code, ln = dc_codes[s]
                    wtr.put(code, ln)
                    wtr.put(amp, s)
        elif ss == 0:
            # DC refinement: one bit per block per component
            for bi in range(nby * nbx):
                for cid in comp_ids:
                    wtr.put((int(comp_coef[cid][bi, 0]) >> al) & 1, 1)
        elif ah == 0:
            # AC first scan: EOB-run coded band (single component)
            Z = comp_coef[comp_ids[0]]
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    rr = eobrun.bit_length() - 1
                    code, ln = ac_codes[rr << 4]
                    wtr.put(code, ln)
                    wtr.put(eobrun - (1 << rr), rr)
                    eobrun = 0

            for bi in range(nby * nbx):
                vs = [_trunc_shift(int(Z[bi, k]), al) for k in range(ss, se + 1)]
                if not any(vs):
                    eobrun += 1
                    if eobrun == 0x4000:  # cap: EOBn rr <= 14
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                last_nz = max(i for i, v in enumerate(vs) if v)
                for i, v in enumerate(vs):
                    if i > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        wtr.put(code, ln)
                        run -= 16
                    s, amp = _mag_bits(v)
                    code, ln = ac_codes[(run << 4) | s]
                    wtr.put(code, ln)
                    wtr.put(amp, s)
                    run = 0
                if last_nz < len(vs) - 1:
                    eobrun += 1  # block tail is all zero -> joins EOB run
            flush_eob()
        else:
            # AC refinement scan (T.81 G.2 / the libjpeg-documented
            # algorithm re-derived): newly-significant coefficients emit
            # (run<<4)|1 + sign; already-nonzero coefficients passed over
            # buffer one correction bit each, appended after the next
            # symbol or carried with the EOB run.
            Z = comp_coef[comp_ids[0]]
            eobrun = 0
            run_bits: list[int] = []  # correction bits riding the EOB run
            cur_bits: list[int] = []  # this block's bits since last symbol

            def flush_eob_r():
                """Emit the pending EOBn symbol + the run's buffered
                correction bits (decoder reads them while tail-walking
                the run's blocks in coefficient order)."""
                nonlocal eobrun
                if eobrun:
                    rr = eobrun.bit_length() - 1
                    code, ln = ac_codes[rr << 4]
                    wtr.put(code, ln)
                    wtr.put(eobrun - (1 << rr), rr)
                    eobrun = 0
                for b in run_bits:
                    wtr.put(b, 1)
                run_bits.clear()

            def emit_cur():
                for b in cur_bits:
                    wtr.put(b, 1)
                cur_bits.clear()

            for bi in range(nby * nbx):
                band = [int(Z[bi, k]) for k in range(ss, se + 1)]
                absv = [abs(_trunc_shift(v, al)) for v in band]
                eob = -1
                for i, a in enumerate(absv):
                    if a == 1:
                        eob = i
                run = 0
                for i, a in enumerate(absv):
                    if a == 0:
                        run += 1
                        continue
                    while run > 15 and i <= eob:
                        flush_eob_r()
                        code, ln = ac_codes[0xF0]
                        wtr.put(code, ln)
                        run -= 16
                        emit_cur()
                    if a > 1:
                        # history coefficient: buffer its correction bit
                        cur_bits.append(a & 1)
                        continue
                    # newly significant (|shifted| == 1)
                    flush_eob_r()
                    code, ln = ac_codes[(run << 4) | 1]
                    wtr.put(code, ln)
                    wtr.put(1 if band[i] >= 0 else 0, 1)
                    emit_cur()
                    run = 0
                if run > 0 or cur_bits:
                    eobrun += 1
                    run_bits.extend(cur_bits)
                    cur_bits.clear()
                    if eobrun == 0x4000 or len(run_bits) > 900:
                        flush_eob_r()
            flush_eob_r()
        parts.append(wtr.flush())
    parts.append(b"\xff\xd9")
    return b"".join(parts)


# ---- BMP decode (BITMAPINFOHEADER, BI_RGB) ---------------------------------


def decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed Windows BMP -> RGB8 (h, w, 3): 8-bit palettized,
    24-bit BGR and 32-bit BGRA (alpha dropped), bottom-up or top-down,
    4-byte row padding. Written from the published BITMAPINFOHEADER
    layout; compressed variants (RLE, BITFIELDS) raise."""
    buf = bytes(buf)
    if buf[:2] != b"BM":
        raise ValueError("not a BMP (missing BM signature)")
    (data_off,) = struct.unpack_from("<I", buf, 10)
    (hdr_size,) = struct.unpack_from("<I", buf, 14)
    if hdr_size < 40:
        raise NotImplementedError("only BITMAPINFOHEADER(+) BMP supported")
    w, h = struct.unpack_from("<ii", buf, 18)
    (bpp,) = struct.unpack_from("<H", buf, 28)
    (comp,) = struct.unpack_from("<I", buf, 30)
    if comp not in (0, 3):  # BI_RGB / BI_BITFIELDS
        raise NotImplementedError(f"compressed BMP (method {comp}) unsupported")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * bpp + 31) // 32 * 4
    px = np.frombuffer(buf, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    rows = px.reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if comp == 3:  # BI_BITFIELDS: per-channel masks follow the header
        if bpp not in (16, 32):
            raise NotImplementedError("BITFIELDS BMP requires 16/32 bpp")
        masks = struct.unpack_from(
            "<III", buf, 54 if hdr_size == 40 else 14 + 40
        )
        dt = np.uint16 if bpp == 16 else np.uint32
        words = np.ascontiguousarray(rows[:, : w * (bpp // 8)]).view(dt)
        words = words.reshape(h, w).astype(np.uint32)
        chans = []
        for m in masks:
            if m == 0:
                chans.append(np.zeros((h, w), dtype=np.uint8))
                continue
            shift = (m & -m).bit_length() - 1
            width = int(m >> shift).bit_length()
            v = (words & np.uint32(m)) >> np.uint32(shift)
            # scale a width-bit value to 8 bits (replicate high bits)
            if width < 8:
                v = (v << (8 - width)) | (v >> max(0, 2 * width - 8))
            chans.append(v.astype(np.uint8))
        img = np.stack(chans, axis=2)
    elif bpp == 24:
        img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    elif bpp == 32:
        img = rows[:, : w * 4].reshape(h, w, 4)[:, :, 2::-1]  # BGRA -> RGB
    elif bpp == 8:
        (ncol,) = struct.unpack_from("<I", buf, 46)
        ncol = ncol or 256
        pal = np.frombuffer(
            buf, dtype=np.uint8, count=ncol * 4, offset=14 + hdr_size
        ).reshape(ncol, 4)[:, 2::-1]  # BGRX -> RGB
        img = pal[rows[:, :w]]
    else:
        raise NotImplementedError(f"{bpp}-bit BMP unsupported")
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """RGB8 (h, w, 3) -> 24-bit BI_RGB BMP bytes (bottom-up, padded
    rows) — the lossless uncompressed interchange output; readable by
    any external viewer and bit-exact through decode_bmp."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 14 + 40)
    return hdr + dib + data


# ---- GIF decode (87a/89a, LZW, first frame) --------------------------------


def _gif_lzw(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    """GIF variable-width LZW decode (LSB-first bit packing) -> palette
    indices. Written from the GIF89a specification appendix."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(npix, dtype=np.uint8)
    n_out = 0
    # dictionary: seq[i] = bytes for code i (base codes are single bytes)
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    seqs = list(base)
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev = None
    n = len(data)
    while n_out < npix:
        while nbits < code_size:
            if pos >= n:
                # truncated stream: stop with what we have
                out[n_out:] = 0
                return out
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            seqs = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(seqs):
            entry = seqs[code]
            if prev is not None:
                seqs.append(prev + entry[:1])
        elif code == len(seqs) and prev is not None:
            entry = prev + prev[:1]
            seqs.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        take = min(len(entry), npix - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        prev = entry
        if len(seqs) == (1 << code_size) and code_size < 12:
            code_size += 1
    if n_out < npix:
        out[n_out:] = 0
    return out


def decode_gif(buf: bytes) -> np.ndarray:
    """GIF87a/89a FIRST FRAME -> RGB8 (h, w, 3): global/local color
    tables, interlaced row order, LZW decompression; animation frames
    beyond the first and transparency compositing are out of scope (the
    first frame renders from its palette as-is)."""
    buf = bytes(buf)
    if buf[:4] != b"GIF8" or buf[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF (missing GIF87a/89a signature)")
    sw, sh = struct.unpack_from("<HH", buf, 6)
    flags = buf[10]
    pos = 13
    gct = None
    if flags & 0x80:
        ncol = 2 << (flags & 7)
        gct = np.frombuffer(buf, np.uint8, ncol * 3, pos).reshape(ncol, 3)
        pos += ncol * 3
    while pos < len(buf):
        b0 = buf[pos]
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while buf[pos]:
                pos += 1 + buf[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _ix, _iy, iw, ih = struct.unpack_from("<HHHH", buf, pos + 1)
            iflags = buf[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                ncol = 2 << (iflags & 7)
                ct = np.frombuffer(buf, np.uint8, ncol * 3, pos).reshape(ncol, 3)
                pos += ncol * 3
            if ct is None:
                raise ValueError("GIF image without a color table")
            mcs = buf[pos]
            pos += 1
            chunks = []
            while buf[pos]:
                ln = buf[pos]
                chunks.append(buf[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw(b"".join(chunks), mcs, iw * ih).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                deinter = np.empty_like(idx)
                passes = ((0, 8), (4, 8), (2, 4), (1, 2))
                src = 0
                for start, step in passes:
                    rows = range(start, ih, step)
                    for r in rows:
                        deinter[r] = idx[src]
                        src += 1
                idx = deinter
            return np.ascontiguousarray(ct[np.minimum(idx, len(ct) - 1)])
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("no image frame found in GIF")


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) -> RGB8: the raw interchange format
    (maxval <= 255; grayscale replicated). Header tokens may be
    separated by any whitespace/comments per the Netpbm spec."""
    buf = bytes(buf)
    if buf[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM (P6/P5)")
    tokens = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    nch = 3 if buf[:2] == b"P6" else 1
    px = np.frombuffer(buf, np.uint8, w * h * nch, pos).reshape(h, w, nch)
    if nch == 1:
        px = np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px)


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
    if fmt == "gif":
        return decode_gif(buf)
    if fmt == "bmp":
        return decode_bmp(buf)
    if fmt in ("ppm", "pgm"):
        return decode_ppm(buf)
    raise NotImplementedError(f"unsupported image format: {fmt}")


def is_real_jpeg(buf) -> bool:
    """True when a fmt='jpeg' payload is a real JFIF bitstream (SOI
    magic) rather than the synthetic corpus's FJPG container."""
    return bytes(buf[:2]) == b"\xff\xd8"


def reencode_like(img: np.ndarray, fmt: str, src_payload, level: int = 1) -> bytes:
    """Container-preserving re-encode for derived pixels (tile pieces,
    resizes, augmentations): a real-JPEG source emits real JFIF, an
    FJPG-container source keeps FJPG (the fast deterministic synthetic
    path), png stays png. Hot batched stages do the same split inline
    with encode_jpeg_batch."""
    if fmt == "jpeg" and not is_real_jpeg(src_payload):
        return encode_fake_jpeg(img, level)
    return encode_image(img, fmt, level)


def encode_image(img: np.ndarray, fmt: str, level: int = 6) -> bytes:
    if fmt == "png":
        return encode_png(img, level)
    if fmt == "jpeg":
        # real baseline JFIF output (externally readable); `level` is the
        # png/zlib knob — jpeg always encodes at quality 98 so the lossy
        # roundtrip stays above the 40 dB PSNR gate
        return encode_jpeg(img)
    raise NotImplementedError(f"unsupported image format: {fmt}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
