"""Dataset-level snap stage: the reference's CLI pipeline re-expressed as a
Ray Data transform.

Reference shape (``processing/processing.go:22-76,136-154``): one reader
goroutine -> one processor goroutine -> per-zoom writer channels. Here the
same semantics are a single ``map_batches`` over Arrow batches of WKB
features — embarrassingly parallel because all snap state is per-feature
(SURVEY.md §3.3) — followed by a partitioned write keyed on ``tm_id``
(Ray's exchange replaces the hand-rolled channel fan-out).

Geometry-type dispatch mirrors the reference exactly:
- Polygon: snap; 0..len(zooms) output rows (a zoom whose outer ring
  collapses emits nothing for that zoom);
- MultiPolygon: split into polygons, snap each, recombine the results
  into one MultiPolygon per zoom;
- anything else: passed through unchanged to EVERY zoom.

Outside-grid handling follows IgnoreOutsideGrid: skip + count, never
crash the job. Counters (pre/post/non-polygon/multipolygon/outside-grid)
are emitted as per-batch partials for a tiny final aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.geom import (
    wkb_decode,
    wkb_encode_linestring,
    wkb_encode_multipolygon,
    wkb_encode_point,
    wkb_encode_polygon,
)
from ..core.pointindex import OutsideGridError
from ..core.snap import SnapConfig, snap_polygon
from ..core.tms import builtin_tms


def _encode_result_polygons(polys) -> bytes:
    """Snapped result -> WKB; single polygon stays POLYGON, several become
    one MULTIPOLYGON (reference ``processing/processing.go:185-192``).
    Degenerate rings (points/lines kept by KeepPointsAndLines) are encoded
    as POINT/LINESTRING when they are the entire result."""
    if len(polys) == 1:
        rings = polys[0]
        if len(rings) == 1 and len(rings[0]) == 1:
            return wkb_encode_point(*rings[0][0])
        if len(rings) == 1 and len(rings[0]) == 2:
            return wkb_encode_linestring(rings[0])
        return wkb_encode_polygon(rings)
    return wkb_encode_multipolygon(polys)


class SnapStage:
    """Actor-pool stage; the TMS is parsed once per actor."""

    def __init__(
        self,
        tms_name: str = "WebMercatorQuad",
        tm_ids: tuple[int, ...] = (8,),
        keep_points_and_lines: bool = False,
        ignore_outside_grid: bool = True,
        reverse_winding_order: bool = False,
        geom_col: str = "geom_wkb",
    ):
        self.tms = builtin_tms(tms_name)
        self.tm_ids = list(tm_ids)
        self.config = SnapConfig(
            keep_points_and_lines=keep_points_and_lines,
            ignore_outside_grid=ignore_outside_grid,
            reverse_winding_order=reverse_winding_order,
        )
        self.geom_col = geom_col

    def _snap_one(self, kind, coords):
        """-> (rows: {tm_id: wkb}, is_multi, outside) following the
        reference dispatch."""
        # the kernel is always asked to raise on outside-grid so the stage
        # can count skips exactly; when the config says don't ignore, the
        # error propagates and fails the task (the reference's panic).
        from dataclasses import replace

        raising = replace(self.config, ignore_outside_grid=False)
        if kind == "Polygon":
            try:
                per_tm = snap_polygon(coords, self.tms, self.tm_ids, raising)
            except OutsideGridError:
                if not self.config.ignore_outside_grid:
                    raise
                return {}, False, True
            return {tm: _encode_result_polygons(p) for tm, p in per_tm.items() if p}, False, False
        if kind == "MultiPolygon":
            combined: dict[int, list] = {}
            for poly in coords:
                try:
                    per_tm = snap_polygon(poly, self.tms, self.tm_ids, raising)
                except OutsideGridError:
                    if not self.config.ignore_outside_grid:
                        raise
                    return {}, True, True
                for tm, new_polys in per_tm.items():
                    combined.setdefault(tm, []).extend(new_polys)
            return (
                {tm: wkb_encode_multipolygon(p) for tm, p in combined.items() if p},
                True,
                False,
            )
        return None, False, False  # non-polygon: passthrough

    def __call__(self, batch: pa.Table) -> pa.Table:
        geoms = batch[self.geom_col].to_pylist()
        carry_idx: list[int] = []
        out_tm: list[int] = []
        out_wkb: list[bytes] = []
        pre = len(geoms)
        post = non_polygon = multi = outside = 0
        for i, buf in enumerate(geoms):
            kind, coords = wkb_decode(buf)
            rows, is_multi, was_outside = self._snap_one(kind, coords)
            if rows is None:
                # non-polygon passthrough to every zoom
                non_polygon += 1
                post += 1
                for tm in self.tm_ids:
                    carry_idx.append(i)
                    out_tm.append(tm)
                    out_wkb.append(buf)
                continue
            if is_multi:
                multi += 1
            if was_outside:
                outside += 1
                continue
            if rows:
                post += 1
            for tm, wkb in rows.items():
                carry_idx.append(i)
                out_tm.append(tm)
                out_wkb.append(wkb)

        carry = [c for c in batch.column_names if c != self.geom_col]
        take = pa.array(np.asarray(carry_idx, dtype=np.int64))
        cols = [batch[c].take(take) for c in carry]
        names = list(carry)
        cols.append(pa.array(np.asarray(out_tm, dtype=np.int32)))
        names.append("tm_id")
        cols.append(pa.array(out_wkb, pa.binary()))
        names.append(self.geom_col)
        # per-batch counters, replicated on every row of this batch's output
        # would be wasteful; emit as a metrics struct column is overkill —
        # callers wanting counters use snap_metrics() below.
        self.last_counters = {
            "pre": pre,
            "post": post,
            "non_polygon": non_polygon,
            "multipolygon": multi,
            "outside_grid": outside,
        }
        return pa.table(cols, names=names)


class SnapMetrics(SnapStage):
    """Counters-only variant: per-batch partial counters (combiner rows)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        super().__call__(batch)
        c = self.last_counters
        return pa.table({k: pa.array([v], pa.int64()) for k, v in c.items()})


def snap_dataset(
    ds,
    tms_name: str = "WebMercatorQuad",
    tm_ids: tuple[int, ...] = (8,),
    concurrency=(2, 8),
    batch_size: int = 1024,
    **config,
):
    """read -> snap (actor pool) -> rows tagged with tm_id (shuffle-ready)."""
    return ds.map_batches(
        SnapStage,
        fn_constructor_kwargs={"tms_name": tms_name, "tm_ids": tm_ids, **config},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class SnapDeadLetter(SnapStage):
    """Dead-letter channel variant: one output row per (feature, zoom)
    for successes PLUS one row per (feature, zoom) the plain stage
    silently drops — ``status`` says why (``outside_grid``, whole
    feature, ``tm_id = -1``; or ``collapsed``, per zoom with that
    ``tm_id``) and ``wkt_debug`` carries the INPUT geometry's WKT (the
    reference's debug encoder role, geomhelp/geomhelp.go:110-158) so a
    large run can route failures to a side table (filter or partitioned
    write on ``status``) instead of losing them in counters. Error rows
    have an empty geometry; success rows have ``status = 'ok'`` and an
    empty ``wkt_debug``."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        from ..core.geom import wkt_encode

        geoms = batch[self.geom_col].to_pylist()
        carry_idx: list[int] = []
        out_tm: list[int] = []
        out_wkb: list[bytes] = []
        out_status: list[str] = []
        out_wkt: list[str] = []

        def dead(i, kind, coords, status, tm=-1):
            carry_idx.append(i)
            out_tm.append(tm)
            out_wkb.append(b"")
            out_status.append(status)
            out_wkt.append(wkt_encode(kind, coords, max_len=256))

        for i, buf in enumerate(geoms):
            kind, coords = wkb_decode(buf)
            rows, _is_multi, was_outside = self._snap_one(kind, coords)
            if rows is None:  # non-polygon passthrough
                for tm in self.tm_ids:
                    carry_idx.append(i)
                    out_tm.append(tm)
                    out_wkb.append(buf)
                    out_status.append("ok")
                    out_wkt.append("")
                continue
            if was_outside:
                dead(i, kind, coords, "outside_grid")
                continue
            for tm in self.tm_ids:
                if tm in rows:
                    carry_idx.append(i)
                    out_tm.append(tm)
                    out_wkb.append(rows[tm])
                    out_status.append("ok")
                    out_wkt.append("")
                else:  # this zoom's snap collapsed the feature entirely
                    dead(i, kind, coords, "collapsed", tm=tm)

        carry = [c for c in batch.column_names if c != self.geom_col]
        take = pa.array(np.asarray(carry_idx, dtype=np.int64))
        cols = [batch[c].take(take) for c in carry]
        names = list(carry)
        cols.append(pa.array(np.asarray(out_tm, dtype=np.int32)))
        names.append("tm_id")
        cols.append(pa.array(out_wkb, pa.binary()))
        names.append(self.geom_col)
        cols.append(pa.array(out_status, pa.string()))
        names.append("status")
        cols.append(pa.array(out_wkt, pa.string()))
        names.append("wkt_debug")
        return pa.table(cols, names=names)
