"""Snap-to-grid polygon simplification — the engine's core geometry kernel.

Re-implements the reference's ``snap.SnapPolygon`` (``snap/snap.go``)
semantics exactly; the ported golden corpus in ``tests/test_snap_golden.py``
pins every behavior:

1. build a per-polygon quadtree over the TMS extent (deepest requested zoom),
   insert all polygon vertices;
2. re-walk every ring segment, snapping to intersected deepest-level quadrant
   centroids on ALL requested zoom levels in one pass;
3. per level: de-dupe seam vertices, drop too-small rings to "points &
   lines", KMP-dedupe zigzag/backtrack excursions, split rings at
   multi-visited grid points, cancel duplicate outer/inner rings, match
   inner rings to their smallest containing outer, enforce winding.

A zoom level whose outer ring collapses is dropped for that feature
(mid-loop — order dependent, kept identical to the reference).

This function is pure per-polygon state -> embarrassingly parallel; the
Ray Data stage maps it over Arrow batches of WKB geometries
(``texel_ray.stages.snap_stage``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from . import fixedpoint as fp
from . import geom as geomh
from .pointindex import (
    VECTOR_TILE_INTERNAL_PIXEL_RESOLUTION,
    OutsideGridError,
    PointIndex,
)


@dataclass(frozen=True)
class SnapConfig:
    keep_points_and_lines: bool = False
    ignore_outside_grid: bool = False
    reverse_winding_order: bool = False


class SnapError(Exception):
    pass


def snap_polygon(rings, tms, tm_ids, config: SnapConfig = SnapConfig()):
    """Snap one polygon (list of rings, no closing points) to the grids of
    ``tm_ids``. Returns {tm_id: [polygon]}, polygon = list of rings."""
    deepest_id = max(tm_ids)
    ix = PointIndex(tms, deepest_id)
    tm_ids_by_level = _tile_matrix_ids_by_levels(tms, tm_ids)
    levels = list(tm_ids_by_level)

    try:
        ix.insert_polygon(rings)
    except OutsideGridError:
        if config.ignore_outside_grid:
            return {}
        raise

    new_polygons_per_level = _add_points_and_snap(ix, rings, levels, config)
    return {
        tm_ids_by_level[level]: polys
        for level, polys in new_polygons_per_level.items()
    }


def _tile_matrix_ids_by_levels(tms, tm_ids):
    root = tms.tile_matrices[0]
    level_diff = int(math.log2(root.tile_width)) + int(
        math.log2(VECTOR_TILE_INTERNAL_PIXEL_RESOLUTION)
    )
    return {tm_id + level_diff: tm_id for tm_id in tm_ids}


def _add_points_and_snap(ix: PointIndex, rings, levels, config: SnapConfig):
    level_map = dict.fromkeys(levels)  # insertion-ordered set
    new_outers: dict[int, list] = {}
    new_inners: dict[int, list] = {}
    new_points_and_lines: dict[int, list] = {}

    for ring_idx, ring in enumerate(rings):
        if not level_map:
            continue  # all levels obsoleted
        is_outer = ring_idx == 0
        ring = _ensure_correct_winding_order(ring, not is_outer)
        ring_len = len(ring)
        new_ring = {level: [] for level in level_map}

        for vertex_idx, vertex in enumerate(ring):
            segment = (vertex, ring[(vertex_idx + 1) % ring_len])
            new_vertices = ix.snap_closest_points(segment, level_map.keys(), ring_idx)
            for level in level_map:
                acc = new_ring[level]
                cleaned = _cleanup_new_vertices(
                    new_vertices.get(level, []),
                    segment,
                    level,
                    acc[-1] if acc else None,
                )
                acc.extend(cleaned)

        for level in list(level_map):
            outer_rings, inner_rings, points_and_lines = _cleanup_new_ring(
                new_ring[level], is_outer, ix.get_hit_multiple(level), ring_idx
            )
            if is_outer and not outer_rings and (
                not config.keep_points_and_lines or not points_and_lines
            ):
                del level_map[level]  # outer collapsed: drop this zoom
                continue
            new_outers.setdefault(level, []).extend(outer_rings)
            new_inners.setdefault(level, []).extend(inner_rings)
            if config.keep_points_and_lines:
                new_points_and_lines.setdefault(level, []).extend(points_and_lines)

    new_polygons: dict[int, list] = {}
    for level in level_map:
        outers, inners = _dedupe_inners_outers(
            new_outers.get(level, []), new_inners.get(level, [])
        )
        polys = _match_inners_to_polygons([[o] for o in outers], inners)
        if config.reverse_winding_order:
            polys = [[list(reversed(r)) for r in poly] for poly in polys]
        if polys:
            new_polygons[level] = polys

    for level, points_and_lines in new_points_and_lines.items():
        for point_or_line in points_and_lines:
            new_polygons.setdefault(level, []).append([point_or_line])
    return new_polygons


# ---- per-segment / per-ring cleanup ---------------------------------------


def _cleanup_new_vertices(new_vertices, segment, level, last_vertex):
    count = len(new_vertices)
    if count == 0:
        raise SnapError(f"no points found for {segment} on level {level}")
    minus = min(count - 1, 1)
    new_vertices = new_vertices[: count - minus]
    if last_vertex is not None and new_vertices[0] == last_vertex:
        new_vertices = new_vertices[1:]
    return new_vertices


def _cleanup_new_ring(new_ring, is_outer, hit_multiple, ring_idx):
    ring = list(new_ring)
    if len(ring) > 1 and ring[0] == ring[-1]:
        ring = ring[:-1]
    if len(ring) < 3:
        return [], [], [ring]
    ring = _kmp_deduplicate(ring)
    if len(ring) < 3:
        return [], [], [ring]
    return _split_ring(ring, is_outer, hit_multiple, ring_idx)


def _ensure_correct_winding_order(ring, should_be_clockwise):
    if not _winding_order_is_correct(ring, should_be_clockwise):
        return list(reversed(ring))
    return ring


def _winding_order_is_correct(ring, should_be_clockwise):
    wo = geomh.winding_of_points(ring)
    return (
        (wo == -1 and should_be_clockwise)
        or (wo == 1 and not should_be_clockwise)
        or wo == 0
    )


def _is_hit_multiple(hit_multiple, vertex, ring_idx):
    iv = (fp.from_ord(vertex[0]), fp.from_ord(vertex[1]))
    for cand in (
        iv,
        (iv[0] + 1, iv[1]),
        (iv[0] - 1, iv[1]),
        (iv[0], iv[1] + 1),
        (iv[0], iv[1] - 1),
    ):
        if ring_idx in hit_multiple.get(cand, ()):
            return True
    return False


# ---- ring splitting -------------------------------------------------------


def _split_ring(ring, is_outer, hit_multiple, ring_idx):
    """Split a snapped ring at every grid point it passes through more than
    once, via a partial-ring stack; classify sub-rings by winding order."""
    outer_rings: list = []
    inner_rings: list = []
    points_and_lines: list = []

    partial_idx = 0
    stack: dict[int, list] = {partial_idx: []}
    complete_rings: dict[int, list] = {}
    check_ring = list(ring) + [ring[0]]
    last_idx = len(check_ring) - 1

    for vertex_idx, vertex in enumerate(check_ring):
        if vertex_idx == 0 or not _is_hit_multiple(hit_multiple, vertex, ring_idx):
            if partial_idx not in stack:
                stack[partial_idx] = []
            else:
                stack[partial_idx] = stack[partial_idx] + [vertex]
            if vertex_idx < last_idx:
                continue
        else:
            stack[partial_idx] = stack[partial_idx] + [vertex]

        temp_ring = stack[partial_idx]
        if temp_ring[0] == temp_ring[-1]:
            complete_rings[partial_idx] = temp_ring[:-1]
            del stack[partial_idx]
        else:
            # prepend earlier partials until the ring closes
            partials_to_remove = [partial_idx]
            keys = list(stack.keys())
            for stack_idx in reversed(keys[:-1]):  # from second-newest back
                partial_from_stack = stack[stack_idx]
                if partial_from_stack[-1] == temp_ring[0]:
                    partials_to_remove.append(stack_idx)
                    temp_ring = partial_from_stack + temp_ring[1:]
                else:
                    break
                if temp_ring[0] == temp_ring[-1]:
                    complete_rings[stack_idx] = temp_ring[:-1]
                    for idx in partials_to_remove:
                        del stack[idx]
                    break
        if vertex_idx < last_idx:
            partial_idx += 1
            stack[partial_idx] = stack.get(partial_idx, []) + [vertex]
        elif stack:
            raise SnapError(
                f"reached end of ring with stack length {len(stack)}, expected 0"
            )

    for key in sorted(complete_rings):
        complete = complete_rings[key]
        if len(complete) < 3:
            points_and_lines.append(complete)
        elif is_outer:
            if not _winding_order_is_correct(complete, False):
                inner_rings.append(complete)
            else:
                outer_rings.append(complete)
        else:
            if not _winding_order_is_correct(complete, True):
                outer_rings.append(complete)
            else:
                inner_rings.append(complete)

    # all classified wrong-sided -> swap (winding heuristic)
    if is_outer and not outer_rings and inner_rings:
        outer_rings = [list(reversed(r)) for r in inner_rings]
        inner_rings = []
    elif not is_outer and not inner_rings and outer_rings:
        inner_rings = [list(reversed(r)) for r in outer_rings]
        outer_rings = []
    return outer_rings, inner_rings, points_and_lines


# ---- duplicate-ring cancellation ------------------------------------------


def _rings_are_equal(ring_i, ring_j, i_is_outer, j_is_outer):
    ring_len = len(ring_i)
    if ring_len != len(ring_j):
        return False
    try:
        idx = ring_j.index(ring_i[0])
    except ValueError:
        return False
    different_winding = i_is_outer and not j_is_outer
    for k in range(ring_len):
        if not different_winding and ring_i[k] != ring_j[(idx + k) % ring_len]:
            return False
        if different_winding and ring_i[k] != ring_j[(idx + ring_len - k) % ring_len]:
            return False
    return True


def _dedupe_inners_outers(outers, inners):
    len_outers = len(outers)
    len_all = len_outers + len(inners)
    processed: dict[int, bool] = {}
    to_delete: dict[int, bool] = {}
    for i in range(len_all):
        if i in processed:
            continue
        i_is_outer = i < len_outers
        equal_indexes: dict[int, bool] = {i: i_is_outer}
        for j in range(i + 1, len_all):
            if j in processed:
                continue
            j_is_outer = j < len_outers
            ring_i = outers[i] if i_is_outer else inners[i - len_outers]
            ring_j = outers[j] if j_is_outer else inners[j - len_outers]
            if not _rings_are_equal(ring_i, ring_j, i_is_outer, j_is_outer):
                continue
            equal_indexes[j] = j_is_outer
        if len(equal_indexes) <= 1:
            continue

        n_equal_outers = sum(1 for v in equal_indexes.values() if v)
        n_equal_inners = sum(1 for v in equal_indexes.values() if not v)
        difference = abs(n_equal_outers - n_equal_inners)
        if difference == 0:
            n_outers_del = n_equal_outers - 1
            n_inners_del = n_equal_inners - 1
        else:
            n_outers_del = min(n_equal_outers, n_equal_inners)
            n_inners_del = n_outers_del
        for equal_i, is_outer in equal_indexes.items():
            processed[equal_i] = is_outer
            if is_outer and n_outers_del > 0:
                to_delete[equal_i] = is_outer
                n_outers_del -= 1
            elif not is_outer and n_inners_del > 0:
                to_delete[equal_i] = is_outer
                n_inners_del -= 1

    if not to_delete:
        return outers, inners
    new_outers = [r for i, r in enumerate(outers) if i not in to_delete]
    new_inners = [r for i, r in enumerate(inners) if (i + len_outers) not in to_delete]
    return new_outers, new_inners


# ---- inner-ring matching --------------------------------------------------


def _find_last_key_with_max_value(m: dict):
    """Newest-to-oldest scan; strict > keeps the newest max. Returns
    (key, value, num_winners)."""
    max_k = None
    max_v = None
    num_winners = 0
    first = True
    for k in reversed(list(m.keys())):
        v = m[k]
        if first or v > max_v:
            max_k, max_v, num_winners, first = k, v, 1, False
            continue
        if v == max_v:
            num_winners += 1
    return max_k, max_v, num_winners


def _match_inners_to_polygons(polygons, inner_rings):
    # (the reference threads a has_inners flag here purely for a log line
    # — snap.go:277-324; not ported)
    if not inner_rings:
        return polygons

    poly_by_area_desc = None
    inners_turned_outers = []
    for inner_ring in inner_rings:
        contains_per_poly: dict[int, int] = {}
        matched = False
        for vertex in inner_ring:
            for poly_i in range(len(polygons)):
                contains, _ = geomh.ring_contains(polygons[poly_i][0], vertex)
                if contains:
                    contains_per_poly[poly_i] = contains_per_poly.get(poly_i, 0) + 1
            matching_poly, _, match_count = _find_last_key_with_max_value(
                contains_per_poly
            )
            if match_count == 1:
                polygons[matching_poly].append(inner_ring)
                matched = True
                break
        if matched:
            continue
        if not contains_per_poly:
            # no matching outer: presumably a misclassified outer; flip it
            inners_turned_outers.append(list(reversed(inner_ring)))
            continue
        # multiple matching outers: use the smallest containing one
        if poly_by_area_desc is None:
            poly_by_area_desc = _sort_poly_idxs_by_outer_area_desc(polygons)
        candidates = list(contains_per_poly.keys())
        smallest = next(
            (i for i in reversed(poly_by_area_desc) if i in candidates), None
        )
        polygons[smallest].append(inner_ring)

    for ring in inners_turned_outers:
        polygons.append([ring])
    return polygons


def _sort_poly_idxs_by_outer_area_desc(polygons):
    areas = [
        geomh.shoelace(poly[0]) if poly else 0.0 for poly in polygons
    ]
    return sorted(range(len(polygons)), key=lambda i: -areas[i])


# ---- KMP zigzag deduplication ---------------------------------------------


def _kmp_deduplicate(ring):
    """Remove back-and-forth degenerate excursions from a snapped ring using
    Knuth-Morris-Pratt substring search over the vertex sequence."""
    ring_len = len(ring)
    sequences_to_remove: dict[str, tuple[int, int]] = {}

    visited: list = []
    i = 0
    while i < ring_len:
        vertex = ring[i]
        if len(visited) <= 1 or visited[-2] != vertex:
            visited.append(vertex)
            i += 1
            continue
        # step back taken: build the reverse segment by walking backwards
        reverse_segment = [visited[-1], visited[-2]]
        for j in range(3, len(visited) + 1):
            next_i = i + (j - 2)
            if next_i <= ring_len - 1 and visited[-j] == ring[next_i]:
                reverse_segment.append(visited[-j])
            else:
                break
        segment = list(reversed(reverse_segment))
        seg_len = len(segment)
        start = i - seg_len
        end = start + 3 * seg_len
        k = 0
        corpus = ring[start : min(end, ring_len)]
        while True:
            stop = False
            for v in corpus[k:]:
                if v not in segment:
                    stop = True
                    break
            if end > ring_len:
                stop = True
            if stop:
                break
            k = len(corpus)
            corpus = corpus + ring[end : min(end + 2 * seg_len, ring_len)]
            end += 2 * seg_len

        matches = _kmp_search_all(corpus, segment)
        reverse_matches = _kmp_search_all(corpus, reverse_segment)
        key = str(segment)
        if len(matches) > 1 and (len(matches) - len(reverse_matches)) == 1:
            # zigzag: segment occurs once more than its reverse
            seq_start = start + seg_len
            seq_end = start + matches[-1] + seg_len
            sequences_to_remove.setdefault(key, (seq_start, seq_end))
            i = seq_end
            visited = []
        elif len(matches) > 1 and len(matches) == len(reverse_matches):
            # multiple backtrace
            seq_start = start + 2 * seg_len - 1
            seq_end = start + matches[-1] + seg_len
            sequences_to_remove.setdefault(key, (seq_start, seq_end))
            i = seq_end
            visited = []
        elif len(matches) == 1 and len(reverse_matches) == 1:
            # single backtrace: no removal needed
            i = start + 2 * seg_len - 1
            visited = []
        else:
            seq_start = start
            if len(reverse_matches) > len(matches):
                # odd zigzag / backtrace followed by a shape
                seq_end = start + 2 * (seg_len - 1) * len(matches)
                end_point_idx = start + reverse_matches[-1] + seg_len
            elif len(matches) > 1 and (len(matches) - len(reverse_matches)) > 1:
                seq_end = start + 2 * (seg_len - 1) * len(reverse_matches)
                end_point_idx = start + matches[-1] + seg_len
            else:
                raise SnapError("unexpected kmp dedupe state")
            sequences_to_remove.setdefault(key, (seq_start, seq_end))
            i = end_point_idx - 1
            visited = []

    return _remove_sequences(ring, sequences_to_remove)


def _remove_sequences(s, sequences: dict[str, tuple[int, int]]):
    out = []
    keep_from = 0
    for _, (seq_start, seq_end) in sorted(sequences.items(), key=lambda kv: kv[1][0]):
        out.extend(s[keep_from:seq_start])
        keep_from = seq_end
    out.extend(s[keep_from:])
    return out


def _kmp_search_all(corpus, find):
    matches = []
    offset = 0
    while True:
        match = _kmp_search(corpus, find)
        if match == len(corpus):
            break
        matches.append(match + offset)
        offset += match + len(find)
        corpus = corpus[match + len(find) :]
        if len(corpus) < len(find):
            break
    return matches


def _kmp_search(corpus, find):
    m = i = 0
    table = [0] * max(len(corpus), 2)
    _kmp_table(find, table)
    while m + i < len(corpus):
        if find[i] == corpus[m + i]:
            if i == len(find) - 1:
                return m
            i += 1
        else:
            if table[i] > -1:
                # note: i updates BEFORE m, matching the reference verbatim
                i = table[i]
                m = m + i - table[i]
            else:
                i = 0
                m += 1
    return len(corpus)


def _kmp_table(find, table):
    pos, cnd = 2, 0
    table[0], table[1] = -1, 0
    while pos < len(find):
        if find[pos - 1] == find[cnd]:
            cnd += 1
            table[pos] = cnd
            pos += 1
        elif cnd > 0:
            cnd = table[cnd]
        else:
            table[pos] = 0
            pos += 1
