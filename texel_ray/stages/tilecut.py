"""Raster <-> tile cutting: slice georeferenced image payloads along the
tile grid, and assemble per-tile mosaics.

Each image covers a ground footprint in WebMercator meters: centered on
its geotag, ``ground_res`` meters per pixel, row 0 = north. Cutting is
per-image (embarrassingly parallel, an actor-pool ``map_batches`` doing
decode -> pixel-window crop -> re-encode); only the assembly of per-tile
mosaics needs the one groupby((tm_id, tile_x, tile_y)) shuffle — and that
shuffle moves already-cut pieces, never whole originals.

Invariant (north rule): re-assembling an image's pieces reproduces the
original decoded pixels exactly (PNG) or within PSNR >= 40 dB (lossy
stand-in) with captions carried through unchanged — pinned by pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.imagecodec import (
    decode_image,
    encode_fake_jpeg,
    encode_image,
    encode_jpeg_batch,
    is_real_jpeg,
)
from ..core.tms import builtin_tms, lonlat_to_webmercator_np


class TileCutter:
    """Actor-pool stage: decode once per image, emit one piece row per
    overlapped tile."""

    def __init__(
        self,
        zoom: int = 13,
        ground_res: float = 200.0,  # meters/pixel -> 16px image = 3.2 km
        tms_name: str = "WebMercatorQuad",
    ):
        self.zoom = zoom
        self.ground_res = ground_res
        tms = builtin_tms(tms_name)
        tm = tms.tile_matrices[zoom]
        self.tile_span = float(tm.tile_width) * tm.cell_size
        self.origin_x, self.origin_y = tm.point_of_origin  # top-left
        self.matrix = tm.matrix_width

    def __call__(self, batch: pa.Table) -> pa.Table:
        mx, my = lonlat_to_webmercator_np(
            batch["lon"].to_numpy(zero_copy_only=False),
            batch["lat"].to_numpy(zero_copy_only=False),
        )
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        captions = batch["caption"].to_pylist()
        payloads = batch["bytes"].to_pylist()

        o_id, o_tm, o_tx, o_ty = [], [], [], []
        o_px, o_py, o_pw, o_ph = [], [], [], []
        o_bytes, o_fmt, o_caption = [], [], []
        jpeg_pieces: list = []  # deferred batch encode (see below)

        for i in range(len(ids)):
            if not np.isfinite(my[i]):
                continue  # outside the mercator domain: skip (grid policy)
            w, h = int(ws[i]), int(hs[i])
            half_w = w * self.ground_res / 2.0
            half_h = h * self.ground_res / 2.0
            min_x, max_x = mx[i] - half_w, mx[i] + half_w
            max_y, min_y = my[i] + half_h, my[i] - half_h
            img = None
            # pixel cut lines from tile boundaries crossing the footprint
            tx0 = int(np.floor((min_x - self.origin_x) / self.tile_span))
            tx1 = int(np.floor((max_x - self.origin_x) / self.tile_span))
            ty0 = int(np.floor((self.origin_y - max_y) / self.tile_span))
            ty1 = int(np.floor((self.origin_y - min_y) / self.tile_span))
            for tx in range(tx0, tx1 + 1):
                if tx < 0 or tx >= self.matrix:
                    continue
                # pixel x-window of this tile column
                cut_x0 = self.origin_x + tx * self.tile_span
                cut_x1 = cut_x0 + self.tile_span
                px0 = max(0, int(np.ceil((cut_x0 - min_x) / self.ground_res - 1e-9)))
                px1 = min(w, int(np.ceil((cut_x1 - min_x) / self.ground_res - 1e-9)))
                if px1 <= px0:
                    continue
                for ty in range(ty0, ty1 + 1):
                    if ty < 0 or ty >= self.matrix:
                        continue
                    cut_y0 = self.origin_y - ty * self.tile_span  # north edge
                    cut_y1 = cut_y0 - self.tile_span
                    py0 = max(0, int(np.ceil((max_y - cut_y0) / self.ground_res - 1e-9)))
                    py1 = min(h, int(np.ceil((max_y - cut_y1) / self.ground_res - 1e-9)))
                    if py1 <= py0:
                        continue
                    if img is None:
                        img = decode_image(payloads[i], fmts[i])
                    piece = np.ascontiguousarray(img[py0:py1, px0:px1])
                    o_id.append(ids[i])
                    o_tm.append(self.zoom)
                    o_tx.append(tx)
                    o_ty.append(ty)
                    o_px.append(px0)
                    o_py.append(py0)
                    o_pw.append(px1 - px0)
                    o_ph.append(py1 - py0)
                    if fmts[i] == "jpeg" and is_real_jpeg(payloads[i]):
                        # container-preserving: real-JPEG sources emit
                        # real JFIF pieces, all of them encoded in ONE
                        # vectorized encode_jpeg_batch pass below
                        o_bytes.append(len(jpeg_pieces))
                        jpeg_pieces.append(piece)
                    elif fmts[i] == "jpeg":
                        o_bytes.append(encode_fake_jpeg(piece, 1))
                    else:
                        o_bytes.append(encode_image(piece, fmts[i], level=1))
                    o_fmt.append(fmts[i])
                    o_caption.append(captions[i])

        if jpeg_pieces:
            encoded = encode_jpeg_batch(jpeg_pieces)
            o_bytes = [encoded[v] if isinstance(v, int) else v for v in o_bytes]

        return pa.table(
            {
                "image_id": pa.array(o_id, pa.string()),
                "tm_id": pa.array(o_tm, pa.int32()),
                "tile_x": pa.array(o_tx, pa.int64()),
                "tile_y": pa.array(o_ty, pa.int64()),
                "px": pa.array(o_px, pa.int32()),
                "py": pa.array(o_py, pa.int32()),
                "pw": pa.array(o_pw, pa.int32()),
                "ph": pa.array(o_ph, pa.int32()),
                "bytes": pa.array(o_bytes, pa.binary()),
                "fmt": pa.array(o_fmt, pa.string()),
                "caption": pa.array(o_caption, pa.string()),
            }
        )


def reassemble_image(pieces: list[dict], w: int, h: int) -> np.ndarray:
    """Rebuild an image from its cut pieces (inverse of TileCutter).
    pieces: rows with px/py/pw/ph/bytes/fmt."""
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for p in pieces:
        img = decode_image(p["bytes"], p["fmt"])
        out[p["py"] : p["py"] + p["ph"], p["px"] : p["px"] + p["pw"]] = img
    return out


def assemble_tiles(pieces_ds, max_pieces_per_tile: int = 256):
    """groupby(tile) -> one atlas row per tile: pieces stacked vertically
    into a single PNG (padded to the widest piece), with a deterministic
    piece index. The shuffle moves cut pieces only; per-tile group size is
    bounded by `max_pieces_per_tile` (overflow counted, not crashed).
    Groups arrive as Arrow tables — the binary piece payloads stay in
    Arrow buffers instead of being boxed into pandas object cells."""

    def build_atlas(group: pa.Table) -> pa.Table:
        n_total = group.num_rows
        g = group.sort_by(
            [("image_id", "ascending"), ("px", "ascending"), ("py", "ascending")]
        ).slice(0, max_pieces_per_tile)
        ids = g["image_id"].to_pylist()
        imgs = [
            decode_image(b, f)
            for b, f in zip(g["bytes"].to_pylist(), g["fmt"].to_pylist())
        ]
        width = max(im.shape[1] for im in imgs)
        height = sum(im.shape[0] for im in imgs)
        atlas = np.zeros((height, width, 3), dtype=np.uint8)
        y = 0
        index = []
        for im, image_id in zip(imgs, ids):
            atlas[y : y + im.shape[0], : im.shape[1]] = im
            index.append(f"{image_id}:{y}")
            y += im.shape[0]
        return pa.table(
            {
                "tm_id": pa.array([g["tm_id"][0].as_py()], pa.int64()),
                "tile_x": pa.array([g["tile_x"][0].as_py()], pa.int64()),
                "tile_y": pa.array([g["tile_y"][0].as_py()], pa.int64()),
                "n_pieces": pa.array([len(imgs)], pa.int64()),
                "dropped": pa.array([n_total - g.num_rows], pa.int64()),
                "atlas": pa.array([encode_image(atlas, "png")], pa.binary()),
                "piece_index": pa.array([";".join(index)], pa.string()),
            }
        )

    return pieces_ds.groupby(["tm_id", "tile_x", "tile_y"]).map_groups(
        build_atlas, batch_format="pyarrow"
    )


def cut_images(ds, zoom: int = 13, concurrency=(4, 24), batch_size: int = 1024):
    """images Dataset (id/bytes/w/h/fmt/caption/lon/lat) -> piece rows."""
    return ds.map_batches(
        TileCutter,
        fn_constructor_kwargs={"zoom": zoom},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
