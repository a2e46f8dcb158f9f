"""Stream-shaped operators over the ordered events log.

Ray Data is a (streaming-)batch engine with no event-time watermarks; the
reference likewise has no windowing (SURVEY.md §2.9). For the engine's
streaming surface we treat `events` as an ordered, partitioned log:

- tumbling windows: pure vectorized bucketing (ts floor to window) —
  no ordering assumption at all, safe under any partitioning;
- session windows: ``groupby(user_id).map_groups`` sorting each user's
  events by ts and splitting on gaps — assumes only per-user grouping,
  which the groupby provides.

Double-typed measures are scale-truncated to int64 before cross-row sums
so results are addition-order-independent (deterministic under any
parallelism), mirrored exactly by the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

US_PER_HOUR = 3_600_000_000


def tumbling_window_partials(
    batch: pa.Table,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_us: int = US_PER_HOUR,
) -> pa.Table:
    """Per-batch partial aggregates keyed by (key, window_start)."""
    ts = batch[ts_col].cast(pa.int64())
    win = pc.multiply(pc.divide(ts, window_us), window_us)  # floor to window
    value = batch[value_col].to_numpy(zero_copy_only=False)
    cents = np.trunc(value * 100.0).astype(np.int64)  # order-independent sum
    t = pa.table(
        {
            key_col: batch[key_col],
            "window_start": win,
            "n": pa.array(np.ones(len(cents), dtype=np.int64)),
            "value_cents": pa.array(cents),
            "value_min": batch[value_col],
            "value_max": batch[value_col],
        }
    )
    g = t.group_by([key_col, "window_start"]).aggregate(
        [("n", "sum"), ("value_cents", "sum"), ("value_min", "min"), ("value_max", "max")]
    )
    return g.rename_columns(
        [key_col, "window_start", "n", "value_cents", "value_min", "value_max"]
    )


def finalize_tumbling(ds, key_col: str = "event_type"):
    """Shuffle the (tiny) partials and emit final per-window rows."""
    from ray.data.aggregate import Max, Min, Sum

    out = ds.groupby([key_col, "window_start"]).aggregate(
        Sum("n", alias_name="n"),
        Sum("value_cents", alias_name="value_cents"),
        Min("value_min", alias_name="value_min"),
        Max("value_max", alias_name="value_max"),
    )

    def to_ts(batch: pa.Table) -> pa.Table:
        ws = batch["window_start"].cast(pa.timestamp("us"))
        return batch.set_column(
            batch.column_names.index("window_start"), "window_start", ws
        )

    return out.map_batches(to_ts, batch_format="pyarrow")


def sliding_window_partials(
    batch: pa.Table,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_us: int = 2 * US_PER_HOUR,
    step_us: int = US_PER_HOUR,
) -> pa.Table:
    """Sliding windows: each event explodes into window_us/step_us window
    assignments (vectorized repeat), then the same partial-aggregate shape
    as tumbling. window_start identifies the window's first step bucket."""
    n_windows = window_us // step_us
    ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    base = (ts // step_us) * step_us
    offsets = (np.arange(n_windows, dtype=np.int64) * step_us)[None, :]
    starts = (base[:, None] - offsets).ravel()
    keys = np.repeat(
        np.asarray(batch[key_col].to_pylist(), dtype=object), n_windows
    )
    value = np.repeat(batch[value_col].to_numpy(zero_copy_only=False), n_windows)
    cents = np.trunc(value * 100.0).astype(np.int64)
    t = pa.table(
        {
            key_col: pa.array(keys.tolist(), pa.string()),
            "window_start": pa.array(starts),
            "n": pa.array(np.ones(len(starts), dtype=np.int64)),
            "value_cents": pa.array(cents),
        }
    )
    g = t.group_by([key_col, "window_start"]).aggregate(
        [("n", "sum"), ("value_cents", "sum")]
    )
    return g.rename_columns([key_col, "window_start", "n", "value_cents"])


def session_windows_bucket(group: pd.DataFrame, gap_us: int = 30 * 60 * 1_000_000):
    """Session splitting for a BUCKET of users (hash-superbucketed
    groupby — one pandas dispatch per ~512 buckets instead of per user).
    Fully vectorized: one sort by (user_id, ts), a session break is a
    user change OR a gap, per-user counts by segment reduction."""
    g = group.sort_values(["user_id", "ts"], kind="stable")
    uid = g["user_id"].to_numpy()
    ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    n = len(uid)
    user_change = np.empty(n, dtype=bool)
    user_change[0] = True
    user_change[1:] = uid[1:] != uid[:-1]
    new_session = user_change.copy()
    new_session[1:] |= (ts[1:] - ts[:-1]) > gap_us
    starts = np.nonzero(user_change)[0]
    ends = np.concatenate((starts[1:], [n]))
    csum = np.concatenate(([0], np.cumsum(new_session)))
    return pd.DataFrame(
        {
            "user_id": uid[starts].astype("int64"),
            "n_events": (ends - starts).astype("int64"),
            "n_sessions": (csum[ends] - csum[starts]).astype("int64"),
        }
    )


def session_windows(group: pd.DataFrame, gap_us: int = 30 * 60 * 1_000_000):
    """Per-user session splitting: sort by ts, new session when the gap to
    the previous event exceeds `gap_us`. Runs inside
    ``groupby(user_id).map_groups`` (pandas batch per user)."""
    g = group.sort_values("ts")
    ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    new_session = np.ones(len(ts), dtype=bool)
    if len(ts) > 1:
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
    return pd.DataFrame(
        {
            "user_id": [int(g["user_id"].iloc[0])],
            "n_events": [len(ts)],
            "n_sessions": [int(new_session.sum())],
        }
    )
