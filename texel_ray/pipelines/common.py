"""Shared pipeline helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def dlit(x) -> str:
    """A float as a DuckDB DOUBLE literal. Bare decimals are typed
    DECIMAL, and DuckDB's decimal->double cast is NOT correctly rounded
    (measured 1 ulp off on 17-digit literals) — scientific notation
    forces direct strtod parsing, bit-identical to the Python float."""
    s = repr(float(x))
    return s if ("e" in s or "E" in s or "inf" in s or "nan" in s) else s + "e0"


def cluster_cpus(default: int = 32) -> int:
    """Total CPUs the Ray cluster currently exposes. Used to size join
    partition counts and repartition widths so stages scale with the
    cluster instead of a sandbox-sized constant; falls back to
    `default` when called before ray.init (e.g. planning in a test)."""
    try:
        import ray

        if ray.is_initialized():
            return max(2, int(ray.cluster_resources().get("CPU", default)))
    except Exception:  # pragma: no cover - ray import/runtime edge
        pass
    return default


def read_table(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _composite_key(cols: list[np.ndarray]) -> np.ndarray:
    """Fold multiple int columns into one int64 bucket key (wrapping
    multiply-add). A collision can only MERGE two buckets — merged buckets
    yield extra candidate pairs that downstream verification rejects, so
    correctness is unaffected; no false negatives are possible."""
    key = cols[0].astype(np.int64, copy=True)
    for c in cols[1:]:
        key = key * np.int64(-7046029254386353131) + c.astype(np.int64)
    return key


def hot_bucket_filter(banded, key_cols: list[str], coalesce: int = 8):
    """LSH candidate generation, stage 1: keep only rows of hot (>= 2 row)
    buckets, IN-DATASET.

    Bucket counts are pre-aggregated per batch (combiner) so only
    (key, partial_count) rows shuffle; the hot KEY SET — aggregated,
    bucket-dimension-sized, tiny for a near-dup workload — is broadcast
    into a vectorized composite-key ``pc.is_in`` filter over the banded
    stream. Returns the filtered Dataset with an extra ``__bucket``
    composite-key column for a cheap single-key groupby. ``banded`` should
    be materialized by the caller (it is consumed twice).
    """
    from ..stages.agg import partial_count_groupby

    counts = partial_count_groupby(banded, key_cols, alias="n", coalesce=coalesce)
    hot = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n"], 2)),
        batch_format="pyarrow",
    ).to_pandas()  # aggregated hot keys only — never per-row data
    hot_keys = _composite_key([hot[c].to_numpy() for c in key_cols])
    value_set = pa.array(np.unique(hot_keys)) if len(hot_keys) else pa.array([], pa.int64())

    def filt(batch: pa.Table) -> pa.Table:
        key = _composite_key(
            [batch[c].to_numpy(zero_copy_only=False) for c in key_cols]
        )
        t = batch.append_column("__bucket", pa.array(key))
        return t.filter(pc.is_in(t["__bucket"], value_set=value_set))

    return banded.map_batches(filt, batch_format="pyarrow")


def distinct_pairs(pairs, extra_cols: list[str] = ()):  # noqa: B006
    """Distinct (id_a, id_b) rows in-dataset (pair stream is
    candidate-dimension-sized; the groupby shuffle is tiny)."""
    cols = ["id_a", "id_b", *extra_cols]

    def head1(g):
        return g.head(1)[cols]

    return pairs.groupby(["id_a", "id_b"]).map_groups(head1, batch_format="pandas")
