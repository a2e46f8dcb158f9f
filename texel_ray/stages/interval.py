"""Range (interval) join: match each row's value to EVERY dimension
interval containing it, overlaps and nesting allowed.

The reference engine has no interval join; this is the classic
dimension-broadcast range join a training-data pipeline needs (price
bands, time windows, length buckets). Ray-Data-first shape: the
interval table is dimension-sized and travels WITH the stage callable
(broadcast once per task/actor ship, never per batch); the probe side
streams through ``map_batches`` untouched.

Algorithm: the interval set is decomposed once, in ``__init__``, into
ELEMENTARY SEGMENTS — the sorted unique boundaries split the number
line into runs on which the set of covering intervals is constant. A
CSR layout (offsets + interval-index values) stores each segment's
covering list. Per batch, one ``searchsorted`` maps values to
segments and a repeat/arange gather emits all (row, interval) matches
— O(log B) per row, fully vectorized, output-proportional.

Partitioning assumption: intervals fit one process (dimension-sized;
the CSR is O(intervals x overlap-depth)). A large-large range join
instead buckets BOTH sides by range chunks (each interval replicated
to the chunks it spans) and runs this same kernel per bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class IntervalJoiner:
    """Callable map_batches stage: emits matched rows with an appended
    interval-id column. Interval semantics are half-open ``[lo, hi)``.

    ``keep_columns`` limits the projected probe columns (skinny output
    before a rollup); ``None`` keeps all.
    """

    def __init__(
        self,
        lo,
        hi,
        interval_ids,
        value_col: str,
        id_out: str = "interval_id",
        keep_columns: list[str] | None = None,
    ):
        lo = np.asarray(lo, dtype=np.float64)
        hi = np.asarray(hi, dtype=np.float64)
        self.ids = np.asarray(interval_ids)
        if not (len(lo) == len(hi) == len(self.ids)):
            raise ValueError("lo/hi/interval_ids length mismatch")
        if np.any(hi < lo):
            raise ValueError("interval with hi < lo")
        self.value_col = value_col
        self.id_out = id_out
        self.keep_columns = keep_columns

        # elementary-segment decomposition: boundaries -> CSR of covering
        # interval indices per segment
        self.bounds = np.unique(np.concatenate([lo, hi]))
        n_seg = max(len(self.bounds) - 1, 0)
        s0 = np.searchsorted(self.bounds, lo)  # first covered segment
        s1 = np.searchsorted(self.bounds, hi)  # one past last
        counts = np.zeros(n_seg + 1, dtype=np.int64)
        np.add.at(counts, s0, 1)
        np.add.at(counts, s1, -1)
        seg_depth = np.cumsum(counts[:-1])  # covering intervals per segment
        self.offsets = np.concatenate(([0], np.cumsum(seg_depth)))
        # fill: one (segment, interval) pair per covered segment, sorted
        # by segment; within a segment keep input interval order
        span = s1 - s0
        pair_iv = np.repeat(np.arange(len(lo)), span)
        pair_seg = np.arange(int(span.sum())) - np.repeat(
            np.cumsum(span) - span, span
        ) + np.repeat(s0, span)
        order = np.argsort(pair_seg, kind="stable")
        self.csr_vals = pair_iv[order]
        self.n_seg = n_seg

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = (
            self.keep_columns
            if self.keep_columns is not None
            else batch.column_names
        )
        id_arr = pa.array(np.asarray(self.ids))
        if batch.num_rows == 0 or self.n_seg == 0:
            cols = [batch[c] for c in keep]
            cols.append(id_arr.slice(0, 0))
            return pa.table(cols, names=[*keep, self.id_out])
        v = batch[self.value_col].to_numpy(zero_copy_only=False)
        seg = np.searchsorted(self.bounds, v, side="right") - 1
        inside = (seg >= 0) & (seg < self.n_seg)
        seg = np.where(inside, seg, 0)
        n_match = np.where(inside, self.offsets[seg + 1] - self.offsets[seg], 0)
        total = int(n_match.sum())
        if total == 0:
            cols = [batch[c] for c in keep]
            cols = [c.slice(0, 0) for c in cols]
            cols.append(id_arr.slice(0, 0))
            return pa.table(cols, names=[*keep, self.id_out])
        # repeat/arange gather of each row's covering-interval run
        row_idx = np.repeat(np.arange(batch.num_rows), n_match)
        within = np.arange(total) - np.repeat(np.cumsum(n_match) - n_match, n_match)
        flat = np.repeat(self.offsets[seg], n_match) + within
        iv_idx = self.csr_vals[flat]
        take = pa.array(row_idx)
        cols = [batch[c].take(take) for c in keep]
        cols.append(id_arr.take(pa.array(iv_idx)))
        return pa.table(cols, names=[*keep, self.id_out])
