"""Relational pipelines over the TPC-H-ish tables (lineitem/orders/...).

The reference engine has no dataset-level joins/aggregates (SURVEY.md
§2.4-2.6); these pipelines are part of generalizing it into a complete
data-processing engine. Every double measure that crosses rows is
scale-truncated to int64 cents first, so sums are addition-order-independent
and bit-equal to the DuckDB oracle under any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


from .common import cluster_cpus as _ccpus
from .common import read_table as _read


def _str_eq(col, value: str) -> np.ndarray:
    """Boolean mask ``col == value`` as a pure Arrow kernel — no per-row
    Python boxing (replaces the ``np.asarray(col.to_pylist(), object)``
    idiom that boxed every row of the hot scans)."""
    return pc.equal(col, value).to_numpy(zero_copy_only=False)


def _str_codes(col) -> tuple[np.ndarray, np.ndarray]:
    """Dictionary-encode a string column to (int64 codes, categories):
    grouping and multi-way comparison run on ints, and per-value work
    (hashing, comparisons) runs once per DISTINCT value, not per row."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    enc = pc.dictionary_encode(arr)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, np.asarray(enc.dictionary, dtype=object)


def q_agg_pricing(sf_dir: str):
    """Pricing summary per (returnflag, linestatus): counts + cent-sums."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty_cents": pa.array(np.trunc(qty * 100.0).astype(np.int64)),
                "price_cents": pa.array(np.trunc(ep * 100.0).astype(np.int64)),
                "disc_price_cents": pa.array(
                    np.trunc(ep * (1.0 - disc) * 100.0).astype(np.int64)
                ),
                "n": pa.array(np.ones(len(qty), dtype=np.int64)),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty_cents", "sum"),
                ("price_cents", "sum"),
                ("disc_price_cents", "sum"),
                ("n", "sum"),
            ]
        )
        return g.rename_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "qty_cents",
                "price_cents",
                "disc_price_cents",
                "n",
            ]
        )

    ds = ds.map_batches(partial, batch_format="pyarrow")
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_cents", alias_name="qty_cents"),
        Sum("price_cents", alias_name="price_cents"),
        Sum("disc_price_cents", alias_name="disc_price_cents"),
        Sum("n", alias_name="n"),
    )


SQL_AGG_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(trunc(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS qty_cents,
       CAST(sum(CAST(trunc(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS price_cents,
       CAST(sum(CAST(trunc(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS disc_price_cents,
       count(*) AS n
FROM lineitem
GROUP BY 1, 2
"""


def _customer_segment_lookup(sf_dir: str):
    """Sorted (custkey, mktsegment) arrays for the broadcast join side —
    shared by q_join_mktsegment and q_topk_per_group (one source for the
    searchsorted-match semantics)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust["c_custkey"].to_numpy()
    order = np.argsort(keys)
    codes, cats = _str_codes(cust["c_mktsegment"])
    vals = cats[codes][order]
    return keys[order], vals


def q_join_mktsegment(sf_dir: str):
    """Broadcast hash join: orders x customer -> order counts + cent-sums
    per market segment. The customer side is small -> shipped once per
    actor; no shuffle of the fact table."""
    from ray.data.aggregate import Sum

    lookup_keys, lookup_vals = _customer_segment_lookup(sf_dir)

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def join_partial(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(lookup_keys, ck)
        pos = np.clip(pos, 0, len(lookup_keys) - 1)
        matched = lookup_keys[pos] == ck
        seg = lookup_vals[pos]
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "c_mktsegment": pa.array(seg[matched].tolist(), pa.string()),
                "price_cents": pa.array(
                    np.trunc(tp[matched] * 100.0).astype(np.int64)
                ),
                "n": pa.array(np.ones(int(matched.sum()), dtype=np.int64)),
            }
        )
        g = t.group_by(["c_mktsegment"]).aggregate(
            [("price_cents", "sum"), ("n", "sum")]
        )
        return g.rename_columns(["c_mktsegment", "price_cents", "n"])

    ds = ds.map_batches(join_partial, batch_format="pyarrow")
    return ds.groupby("c_mktsegment").aggregate(
        Sum("price_cents", alias_name="price_cents"), Sum("n", alias_name="n")
    )


SQL_JOIN_MKTSEGMENT = """
SELECT c.c_mktsegment AS c_mktsegment,
       CAST(sum(CAST(trunc(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS price_cents,
       count(*) AS n
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


def q_topk_orders(sf_dir: str, k: int = 25):
    """Global top-k by total price (distributed sort + limit)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def to_cents(batch: pa.Table) -> pa.Table:
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "price_cents": pa.array(np.trunc(tp * 100.0).astype(np.int64)),
            }
        )

    ds = ds.map_batches(to_cents, batch_format="pyarrow")
    return ds.sort(["price_cents", "o_orderkey"], descending=[True, False]).limit(k)


SQL_TOPK_ORDERS = """
SELECT o_orderkey, CAST(trunc(o_totalprice * 100.0) AS BIGINT) AS price_cents
FROM orders
ORDER BY price_cents DESC, o_orderkey ASC
LIMIT 25
"""


def q_topk_per_group(sf_dir: str, k: int = 3):
    """GROUPED top-k (top orders per market segment) with the combiner
    shape: the broadcast customer join tags each order with its segment,
    each batch keeps only its local per-segment top-k (k x segments rows
    leave every block — never the fact table), and a final tiny
    per-segment selection emits ranks. Exact SQL oracle: row_number
    window with the same (price desc, orderkey) tie-break."""
    lookup_keys, lookup_vals = _customer_segment_lookup(sf_dir)

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def local_topk(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(lookup_keys, ck), 0, len(lookup_keys) - 1)
        matched = lookup_keys[pos] == ck
        seg = lookup_vals[pos][matched]
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False)[matched]
        cents = np.trunc(
            batch["o_totalprice"].to_numpy(zero_copy_only=False)[matched] * 100.0
        ).astype(np.int64)
        # within-batch per-segment top-k: sort by (segment, -price, key)
        o = np.lexsort((okey, -cents, seg))
        seg, okey, cents = seg[o], okey[o], cents[o]
        bnd = np.nonzero(seg[1:] != seg[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        keep = np.zeros(len(seg), dtype=bool)
        for s in starts:
            keep[s : s + k] = True
        return pa.table(
            {
                "c_mktsegment": pa.array(seg[keep].tolist(), pa.string()),
                "o_orderkey": pa.array(okey[keep]),
                "price_cents": pa.array(cents[keep]),
            }
        )

    parts = ds.map_batches(local_topk, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["price_cents", "o_orderkey"], ascending=[False, True], kind="stable"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["c_mktsegment", "rank", "o_orderkey", "price_cents"]]

    return parts.groupby("c_mktsegment").map_groups(
        final_topk, batch_format="pandas"
    )


def sql_topk_per_group(k: int = 3) -> str:
    return f"""
WITH ranked AS (
  SELECT c.c_mktsegment,
         o.o_orderkey,
         CAST(trunc(o.o_totalprice * 100.0) AS BIGINT) AS price_cents,
         row_number() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY CAST(trunc(o.o_totalprice * 100.0) AS BIGINT) DESC,
                    o.o_orderkey
         ) AS rank
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment, CAST(rank AS BIGINT) AS rank, o_orderkey, price_cents
FROM ranked WHERE rank <= {k}
"""


def q_distinct_users(sf_dir: str):
    """Distinct user count per event type (two-stage distinct)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type", "user_id"]).aggregate([])

    ds = ds.map_batches(pair_partial, batch_format="pyarrow")
    # global distinct of (event_type, user_id), then count per event_type
    ds = ds.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="_c"))
    ds = ds.drop_columns(["_c"])
    return ds.groupby("event_type").aggregate(Count(alias_name="n_users"))


SQL_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
"""


def q_tumbling_events(sf_dir: str):
    from ..stages.window import finalize_tumbling, tumbling_window_partials

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    ds = ds.map_batches(tumbling_window_partials, batch_format="pyarrow")
    return finalize_tumbling(ds)


SQL_TUMBLING_EVENTS = """
SELECT event_type,
       date_trunc('hour', ts) AS window_start,
       count(*) AS n,
       CAST(sum(CAST(trunc(value * 100.0) AS BIGINT)) AS BIGINT) AS value_cents,
       min(value) AS value_min,
       max(value) AS value_max
FROM events
GROUP BY 1, 2
"""


def q_sliding_events(sf_dir: str):
    """Sliding 2h windows stepping 1h per event type (each event lands in
    two windows); deterministic cent sums."""
    from ..stages.agg import partial_sum_groupby
    from ..stages.window import sliding_window_partials

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    partials = ds.map_batches(sliding_window_partials, batch_format="pyarrow")
    out = partial_sum_groupby(
        partials, ["event_type", "window_start"], ["n", "value_cents"], coalesce=8
    )

    def to_ts(batch: pa.Table) -> pa.Table:
        ws = batch["window_start"].cast(pa.timestamp("us"))
        return batch.set_column(
            batch.column_names.index("window_start"), "window_start", ws
        )

    return out.map_batches(to_ts, batch_format="pyarrow")


SQL_SLIDING_EVENTS = """
SELECT event_type, window_start,
       CAST(sum(one) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS value_cents
FROM (
    SELECT event_type, date_trunc('hour', ts) AS window_start,
           1 AS one, CAST(trunc(value * 100.0) AS BIGINT) AS cents
    FROM events
    UNION ALL
    SELECT event_type, date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start,
           1 AS one, CAST(trunc(value * 100.0) AS BIGINT) AS cents
    FROM events
)
GROUP BY 1, 2
"""


def q_image_transcode(sf_dir: str):
    """Real-JPEG TRANSCODE pass over the jpeg half of the corpus: decode
    (FJPG container) -> encode a REAL baseline JFIF (core/imagecodec
    encode_jpeg_batch: Annex-K tables, exact integer FDCT so the bytes
    are batch-composition-independent) -> decode the JFIF back -> exact
    fixed-point PSNR stats. Proves the externally-readable encode path
    end-to-end under the driver gate. Output: one row (n, total JFIF
    bytes, min/sum floor(psnr*1000)) — every value deterministic.
    """
    from ..core.imagecodec import decode_image, decode_jpeg, encode_jpeg_batch
    from ..stages.agg import partial_sum_groupby
    from ..sources.images import read_images

    import zlib

    def transcode(batch: pa.Table) -> pa.Table:
        # deterministic 1-in-8 gate (crc32 of the string id) keeps the
        # driver-sweep cost bounded while still exercising thousands of
        # real encodes end-to-end
        fmts = batch["fmt"].to_pylist()
        ids = batch["image_id"].to_pylist()
        keep = [
            i
            for i, (f, iid) in enumerate(zip(fmts, ids))
            if f == "jpeg" and zlib.crc32(str(iid).encode()) % 8 == 0
        ]
        payloads = batch["bytes"].take(pa.array(keep, pa.int64())).to_pylist()
        imgs = [decode_image(buf, "jpeg") for buf in payloads]
        jfif = encode_jpeg_batch(imgs)
        n_bytes = 0
        min_fp = np.int64(1 << 60)
        sum_fp = np.int64(0)
        for img, buf in zip(imgs, jfif):
            back = decode_jpeg(buf)
            d = img.astype(np.int64) - back.astype(np.int64)
            mse = (d * d).sum() / d.size  # exact int sum -> one fl division
            p = 10.0 * np.log10(255.0**2 / mse) if mse else 120.0
            fp = np.int64(np.floor(p * 1000.0))
            n_bytes += len(buf)
            min_fp = min(min_fp, fp)
            sum_fp += fp
        return pa.table(
            {
                "grp": pa.array([0], pa.int64()),
                "n": pa.array([len(imgs)], pa.int64()),
                "jfif_bytes": pa.array([n_bytes], pa.int64()),
                "min_psnr_fp": pa.array([int(min_fp)], pa.int64()),
                "sum_psnr_fp": pa.array([int(sum_fp)], pa.int64()),
            }
        )

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt"])
    parts = ds.map_batches(
        transcode, batch_format="pyarrow", batch_size=512, concurrency=12
    )
    from ray.data.aggregate import Min, Sum

    out = parts.groupby("grp").aggregate(
        Sum("n", alias_name="n"),
        Sum("jfif_bytes", alias_name="jfif_bytes"),
        Min("min_psnr_fp", alias_name="min_psnr_fp"),
        Sum("sum_psnr_fp", alias_name="sum_psnr_fp"),
    )

    def finish(b: pa.Table) -> pa.Table:
        return b.drop_columns(["grp"])

    return out.map_batches(finish, batch_format="pyarrow")


def q_image_progressive(sf_dir: str):
    """PROGRESSIVE-JPEG transcode audit over a deterministic 1-in-16
    corpus sample: decode -> encode a real multi-scan SOF2 stream
    (spectral selection + successive approximation) -> decode it back
    and compare BIT-FOR-BIT against the baseline encode->decode of the
    same pixels. Progressive transmission is a lossless reordering of
    the same quantized coefficients, so n_mismatch MUST be 0 — the
    query is its own conformance gate for the SOF2 codec under the
    driver sweep. Output: one row (n, prog_bytes, baseline_bytes,
    n_mismatch), every value deterministic.
    """
    import zlib

    from ..core.imagecodec import (
        decode_image,
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from ..sources.images import read_images

    def transcode(batch: pa.Table) -> pa.Table:
        fmts = batch["fmt"].to_pylist()
        ids = batch["image_id"].to_pylist()
        keep = [
            i
            for i, (f, iid) in enumerate(zip(fmts, ids))
            if f == "jpeg" and zlib.crc32(str(iid).encode()) % 16 == 0
        ]
        payloads = batch["bytes"].take(pa.array(keep, pa.int64())).to_pylist()
        n = 0
        prog_bytes = 0
        base_bytes = 0
        n_mismatch = 0
        for buf in payloads:
            img = decode_image(buf, "jpeg")
            pbuf = encode_jpeg_progressive(img)
            bbuf = encode_jpeg(img)
            if not np.array_equal(decode_jpeg(pbuf), decode_jpeg(bbuf)):
                n_mismatch += 1
            n += 1
            prog_bytes += len(pbuf)
            base_bytes += len(bbuf)
        return pa.table(
            {
                "grp": pa.array([0], pa.int64()),
                "n": pa.array([n], pa.int64()),
                "prog_bytes": pa.array([prog_bytes], pa.int64()),
                "baseline_bytes": pa.array([base_bytes], pa.int64()),
                "n_mismatch": pa.array([n_mismatch], pa.int64()),
            }
        )

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt"])
    parts = ds.map_batches(
        transcode, batch_format="pyarrow", batch_size=512, concurrency=12
    )
    from ray.data.aggregate import Sum

    out = parts.groupby("grp").aggregate(
        Sum("n", alias_name="n"),
        Sum("prog_bytes", alias_name="prog_bytes"),
        Sum("baseline_bytes", alias_name="baseline_bytes"),
        Sum("n_mismatch", alias_name="n_mismatch"),
    )

    def finish(b: pa.Table) -> pa.Table:
        return b.drop_columns(["grp"])

    return out.map_batches(finish, batch_format="pyarrow")


def q_image_bmp_roundtrip(sf_dir: str):
    """BMP interchange audit over a deterministic 1-in-16 corpus
    sample: decode -> encode 24-bit BI_RGB BMP -> decode back; BMP is
    LOSSLESS so n_mismatch must be 0 (and is). Output: one row
    (n, bmp_bytes, n_mismatch), every value deterministic — the
    externally-readable uncompressed export path under the driver
    gate."""
    import zlib

    from ..core.imagecodec import decode_bmp, decode_image, encode_bmp
    from ..sources.images import read_images

    def roundtrip(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        keep = [
            i
            for i, iid in enumerate(ids)
            if zlib.crc32(str(iid).encode()) % 16 == 0
        ]
        payloads = batch["bytes"].take(pa.array(keep, pa.int64())).to_pylist()
        fmts = batch["fmt"].take(pa.array(keep, pa.int64())).to_pylist()
        n = 0
        total = 0
        n_mismatch = 0
        for buf, f in zip(payloads, fmts):
            img = decode_image(buf, f)
            bmp = encode_bmp(img)
            if not np.array_equal(decode_bmp(bmp), img):
                n_mismatch += 1
            n += 1
            total += len(bmp)
        return pa.table(
            {
                "grp": pa.array([0], pa.int64()),
                "n": pa.array([n], pa.int64()),
                "bmp_bytes": pa.array([total], pa.int64()),
                "n_mismatch": pa.array([n_mismatch], pa.int64()),
            }
        )

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt"])
    parts = ds.map_batches(
        roundtrip, batch_format="pyarrow", batch_size=512, concurrency=12
    )
    from ray.data.aggregate import Sum

    out = parts.groupby("grp").aggregate(
        Sum("n", alias_name="n"),
        Sum("bmp_bytes", alias_name="bmp_bytes"),
        Sum("n_mismatch", alias_name="n_mismatch"),
    )
    return out.map_batches(
        lambda b: b.drop_columns(["grp"]), batch_format="pyarrow"
    )


def q_image_resize(sf_dir: str, out_w: int = 8, out_h: int = 8):
    """Multimodal resize stage as a pipeline: decode -> nearest-neighbor
    resize -> re-encode; per-format count + total re-encoded bytes
    (deterministic ints). Rows-only (SQL cannot decode)."""
    from ..sources.images import read_images
    from ..stages.agg import partial_sum_groupby
    from ..stages.multimodal import ImageResizer

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt"])
    ds = ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(2, 16),
    )

    def sizes(batch: pa.Table) -> pa.Table:
        # offset arithmetic on the Arrow binary column — the payloads
        # themselves are never boxed into Python bytes objects
        lens = pc.binary_length(batch["bytes"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {"fmt": batch["fmt"], "out_bytes": pa.array(lens.astype(np.int64))}
        )

    return partial_sum_groupby(
        ds.map_batches(sizes, batch_format="pyarrow"),
        ["fmt"],
        ["out_bytes"],
        count_alias="n",
        coalesce=4,
    )


def _fold_hash(ids: np.ndarray, mod: int) -> np.ndarray:
    """Deterministic Knuth hash, overflow-free in BOTH engines: fold to
    31 bits BEFORE the multiply (2^31 * 2654435761 fits int64/BIGINT; a
    raw uint64 product silently wraps in numpy but raises in DuckDB).
    SQL mirror: ``((col & 2147483647) * 2654435761) % mod``."""
    folded = ids.astype(np.int64) & np.int64(0x7FFFFFFF)
    return (folded * np.int64(2654435761)) % np.int64(mod)


def _add_arrival_us(batch: pa.Table) -> pa.Table:
    """Shared watermark prelude (late_events / windowed_on_time): event
    time in us + scrambled ARRIVAL order (the time-ordered synthetic
    stream delivered out of order)."""
    ts_us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
    eid = batch["event_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "arrival_seq": pa.array(_fold_hash(eid, 1 << 31)),
            "event_type": batch["event_type"],
            "ts_us": ts_us,
        }
    )


def _add_user_bucket(batch: pa.Table, buckets: int = 512) -> pa.Table:
    """~512-way hash bucket of user_id: per-USER map_groups dispatch
    (one pandas conversion per user) dominated wall time at thousands of
    users; grouping on the bucket and iterating user segments vectorized
    inside cuts the dispatch count to the bucket count."""
    uid = batch["user_id"].to_numpy(zero_copy_only=False)
    return batch.append_column("__ub", pa.array(_fold_hash(uid, buckets)))


def _user_segments(g: pd.DataFrame, order_cols: list):
    """Sort one user-bucket group by (user_id, *order_cols) and yield
    (user_id, segment DataFrame-view slice indices) per user."""
    g = g.sort_values(["user_id"] + order_cols, kind="stable")
    uid = g["user_id"].to_numpy()
    bnd = np.nonzero(uid[1:] != uid[:-1])[0] + 1
    starts = np.concatenate(([0], bnd))
    ends = np.concatenate((bnd, [len(uid)]))
    return g, uid, starts, ends


def _bucketed_bigrams(skinny, val_col: str, out_from: str, out_to: str):
    """Per-user consecutive-pair (bigram) counts without per-user
    dispatch: bucket users 512-way (_add_user_bucket), then inside each
    bucket ONE stable sort by (user_id, ts_us, event_id) and a fully
    vectorized prev/next pairing masked at user boundaries — no per-user
    loop at all. Emits partial (from, to, n_partial) counts for the
    combiner groupby. Replaces the measured-4.5x-slower raw
    groupby(user_id).map_groups form (late_events precedent)."""
    skinny = skinny.map_batches(_add_user_bucket, batch_format="pyarrow")

    def bigrams(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        r = g[val_col].to_numpy()
        same = uid[1:] == uid[:-1]
        pairs = pd.DataFrame({out_from: r[:-1][same], out_to: r[1:][same]})
        return (
            pairs.groupby([out_from, out_to], sort=False)
            .size()
            .reset_index(name="n_partial")
        )

    return skinny.groupby("__ub").map_groups(bigrams, batch_format="pandas")


_SQL_WATERMARK_SEQ = """seq AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         max(epoch_us(ts)) OVER (
           PARTITION BY user_id
           ORDER BY ((event_id & 2147483647) * 2654435761) % 2147483648,
                    event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prior_max
  FROM events
)"""


def q_late_events(sf_dir: str, lateness_s: int = 3600):
    """Streaming WATERMARK semantics on a batch engine: the per-user
    watermark is the running max event time (in ARRIVAL order) minus the
    allowed lateness, and an event is LATE if its timestamp falls behind
    the watermark at its arrival — the late-data/side-output
    classification every windowed streaming pipeline needs. The
    synthetic events are time-ordered by event_id, so arrival order is a
    deterministic scramble (arrival_seq = event_id * 2654435761 mod
    2^31) — out-of-order delivery with real late events at any
    lateness. One skinny groupby(user) exchange, vectorized cummax per
    group; output bounded by event types. Exact SQL oracle: running max
    window with 1 PRECEDING over the same arrival key."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    skinny = ds.map_batches(
        _add_arrival_us, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")
    late_us = lateness_s * 1_000_000

    def classify(group: pd.DataFrame) -> pd.DataFrame:
        g, _uid, starts, ends = _user_segments(group, ["arrival_seq", "event_id"])
        ts_all = g["ts_us"].to_numpy()
        et_all = g["event_type"].to_numpy()
        lates = np.empty(len(ts_all), dtype=bool)
        for s, e in zip(starts, ends):
            ts = ts_all[s:e]
            # half-range sentinel: int64 min would underflow when the
            # lateness is subtracted (wrapping positive = first late)
            prior_max = np.concatenate(
                ([np.iinfo(np.int64).min // 2], np.maximum.accumulate(ts)[:-1])
            )
            lates[s:e] = ts < (prior_max - late_us)
        out = pd.DataFrame({"event_type": et_all, "late": lates})
        return (
            out.groupby(["event_type", "late"], sort=False)
            .size()
            .reset_index(name="n_partial")
        )

    parts = skinny.groupby("__ub").map_groups(classify, batch_format="pandas")
    agg = partial_sum_groupby(parts, ["event_type", "late"], ["n_partial"], coalesce=4)

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["event_type", "late", "n"])

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_late_events(lateness_s: int = 3600) -> str:
    late_us = lateness_s * 1_000_000
    return f"""
WITH {_SQL_WATERMARK_SEQ}
SELECT event_type,
       (prior_max IS NOT NULL AND ts_us < prior_max - {late_us}) AS late,
       count(*) AS n
FROM seq
GROUP BY 1, 2
"""


def q_trip_length(sf_dir: str):
    """Per-user TRAVELED DISTANCE (trajectory path length): consecutive
    event geotags in (ts, event_id) order, haversine step lengths in
    meters, each step FIXED-POINT floored (mm) so the per-user sum is
    order-independent and the SQL oracle recomputes it exactly (the
    geodesic_hist pattern: sin/cos/asin mirror 1:1). One skinny
    groupby(user) exchange; user-dimension output."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def geotag(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ev = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, ev)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch["event_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    skinny = ds.map_batches(
        geotag, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def path_len(group: pd.DataFrame) -> pd.DataFrame:
        g, uid, starts, ends = _user_segments(group, ["ts_us", "event_id"])
        lon_all = np.radians(g["lon"].to_numpy())
        lat_all = np.radians(g["lat"].to_numpy())
        users, nsteps, dists = [], [], []
        for s, e in zip(starts, ends):
            lon = lon_all[s:e]
            lat = lat_all[s:e]
            users.append(uid[s])
            if e - s < 2:
                nsteps.append(0)
                dists.append(0)
                continue
            dphi = (lat[1:] - lat[:-1]) / 2.0
            dlmb = (lon[1:] - lon[:-1]) / 2.0
            a = (np.sin(dphi) ** 2
                 + np.cos(lat[:-1]) * np.cos(lat[1:]) * np.sin(dlmb) ** 2)
            d = 2.0 * 6371000.0 * np.arcsin(np.sqrt(a))
            nsteps.append(e - s - 1)
            dists.append(int(np.floor(d * 1000.0).astype(np.int64).sum()))
        return pd.DataFrame(
            {
                "user_id": np.array(users),
                "n_steps": np.array(nsteps, dtype=np.int64),
                "dist_mm": np.array(dists, dtype=np.int64),
            }
        )

    return skinny.groupby("__ub").map_groups(path_len, batch_format="pandas")


def sql_trip_length() -> str:
    hav = (
        "2.0 * 6371000.0 * asin(sqrt("
        "pow(sin((radians(lat) - radians(plat)) / 2.0), 2)"
        " + cos(radians(plat)) * cos(radians(lat))"
        " * pow(sin((radians(lon) - radians(plon)) / 2.0), 2)))"
    )
    return f"""
WITH {_sql_event_pos()},
seq AS (
  SELECT user_id, lon, lat,
         lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
  FROM pos
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id,
       CAST(count(plon) AS BIGINT) AS n_steps,
       CAST(COALESCE(sum(CAST(floor({hav} * 1000.0) AS BIGINT)), 0) AS BIGINT)
         AS dist_mm
FROM seq
GROUP BY user_id
"""


def q_windowed_on_time(sf_dir: str, lateness_s: int = 3600):
    """Watermarked WINDOWED aggregation (the late_events x tumbling
    composition a streaming engine runs as one job): hourly windows per
    event_type counting on-time and late arrivals separately — late
    events (behind the per-user watermark at their scrambled arrival, see
    q_late_events) go to the side-output count instead of silently
    polluting the window. One skinny groupby(user) tag pass + one
    combiner groupby on (type, window). Exact SQL oracle."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    skinny = ds.map_batches(
        _add_arrival_us, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")
    late_us = lateness_s * 1_000_000
    hour_us = 3_600_000_000

    def tag(group: pd.DataFrame) -> pd.DataFrame:
        g, _uid, starts, ends = _user_segments(group, ["arrival_seq", "event_id"])
        ts_all = g["ts_us"].to_numpy()
        lates = np.empty(len(ts_all), dtype=bool)
        for s, e in zip(starts, ends):
            ts = ts_all[s:e]
            prior_max = np.concatenate(
                ([np.iinfo(np.int64).min // 2], np.maximum.accumulate(ts)[:-1])
            )
            lates[s:e] = ts < (prior_max - late_us)
        win = (ts_all // hour_us) * hour_us
        out = pd.DataFrame(
            {"event_type": g["event_type"].to_numpy(), "window_us": win,
             "n_on_time": (~lates).astype(np.int64),
             "n_late": lates.astype(np.int64)}
        )
        return (
            out.groupby(["event_type", "window_us"], sort=False)[
                ["n_on_time", "n_late"]
            ]
            .sum()
            .reset_index()
        )

    parts = skinny.groupby("__ub").map_groups(tag, batch_format="pandas")
    return partial_sum_groupby(
        parts, ["event_type", "window_us"], ["n_on_time", "n_late"], coalesce=4
    )


def sql_windowed_on_time(lateness_s: int = 3600) -> str:
    late_us = lateness_s * 1_000_000
    return f"""
WITH {_SQL_WATERMARK_SEQ}
SELECT event_type,
       (ts_us // 3600000000) * 3600000000 AS window_us,
       CAST(sum(CASE WHEN prior_max IS NOT NULL AND ts_us < prior_max - {late_us}
                THEN 0 ELSE 1 END) AS BIGINT) AS n_on_time,
       CAST(sum(CASE WHEN prior_max IS NOT NULL AND ts_us < prior_max - {late_us}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM seq
GROUP BY 1, 2
"""


def q_name_linkage(sf_dir: str, max_dist: int = 1):
    """RECORD LINKAGE (fuzzy self-join on names): customer pairs whose
    equal-length names differ by at most ``max_dist`` substitutions.
    Blocking is the EXACT string pigeonhole: split each name into
    max_dist+1 slices — a qualifying pair matches at least one slice
    exactly — so one groupby on (slice_id, crc(slice), length) finds
    every candidate; within-bucket verification is a vectorized byte
    mismatch count. Pairs dedupe on the driver (pair-dimension list).
    Each name ships max_dist+1 times through the exchange (names are
    tens of bytes; for long-string corpora ship (slice hash, id) only
    and re-fetch text by id for the verify pass — the minhash text-back
    pattern). Exact SQL oracle: brute hamming self-join over
    equal-length pairs."""
    import zlib

    nb = max_dist + 1
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def slices(batch: pa.Table) -> pa.Table:
        names = batch["c_name"].to_pylist()
        keys = batch["c_custkey"].to_numpy(zero_copy_only=False)
        sid_l, h_l, ln_l, id_l, nm_l = [], [], [], [], []
        for k, nm in zip(keys, names):
            n = len(nm)
            for s in range(nb):
                lo = s * n // nb
                hi = (s + 1) * n // nb
                sid_l.append(s)
                h_l.append(zlib.crc32(nm[lo:hi].encode()))
                ln_l.append(n)
                id_l.append(int(k))
                nm_l.append(nm)
        return pa.table(
            {
                "sid": pa.array(sid_l, pa.int32()),
                "h": pa.array(h_l, pa.int64()),
                "ln": pa.array(ln_l, pa.int32()),
                "c_custkey": pa.array(id_l, pa.int64()),
                "c_name": pa.array(nm_l, pa.string()),
            }
        )

    banded = ds.map_batches(slices, batch_format="pyarrow", batch_size=8192)

    def superbucket(batch: pa.Table) -> pa.Table:
        sid = batch["sid"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False)
        ln = batch["ln"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = (sid << 40) ^ (ln << 32) ^ h
        sb = ((key.astype(np.uint64) * np.uint64(2654435761)) % 512).astype(
            np.int64
        )
        return batch.append_column("key", pa.array(key)).append_column(
            "__sb", pa.array(sb)
        )

    banded = banded.map_batches(superbucket, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # iterate the real (slice, hash, length) buckets vectorized inside
        # one ~512-way superbucket group (per-group dispatch would
        # dominate at tens of thousands of tiny buckets)
        out_a, out_b, out_d = [], [], []
        g = group.sort_values(["key", "c_custkey"], kind="stable")
        keys = g["key"].to_numpy()
        ids = g["c_custkey"].to_numpy()
        names = g["c_name"].to_list()
        bnd = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [len(keys)]))
        for s, e in zip(starts, ends):
            # one row per id per bucket by construction
            if e - s < 2:
                continue
            bids = ids[s:e]
            mat = np.frombuffer(
                "".join(names[s:e]).encode(), dtype=np.uint8
            ).reshape(e - s, -1)
            if e - s > 256:
                # hot bucket (e.g. a shared name prefix puts EVERY row
                # in one slice bucket): exact pigeonhole recursion over
                # the byte columns instead of the quadratic triangle
                from ..stages.dedup import matrix_hamming_pairs_exact

                ia, ib, dist = matrix_hamming_pairs_exact(mat, max_dist)
                lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
                out_a.append(bids[lo])
                out_b.append(bids[hi])
                out_d.append(dist)
                continue
            ia, ib = np.triu_indices(e - s, k=1)
            dist = (mat[ia] != mat[ib]).sum(axis=1)
            keep = dist <= max_dist
            if keep.any():
                out_a.append(bids[ia[keep]])
                out_b.append(bids[ib[keep]])
                out_d.append(dist[keep].astype(np.int64))
        if not out_a:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"),
                 "id_b": pd.Series(dtype="int64"),
                 "dist": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "dist": np.concatenate(out_d),
            }
        )

    pairs = banded.groupby("__sb").map_groups(bucket_pairs, batch_format="pandas")
    pdf = pairs.to_pandas()  # pair-dimension-sized
    if len(pdf) == 0:
        return pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "dist": pd.Series(dtype="int64")}
        )
    return (
        pdf.drop_duplicates(["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def sql_name_linkage(max_dist: int = 1) -> str:
    # hamming (not levenshtein): the engine counts SUBSTITUTIONS on
    # equal-length names, and the two measures diverge at max_dist >= 2
    # (e.g. rotations); the ON clause restricts to equal lengths before
    # hamming() is evaluated
    return f"""
WITH pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         CAST(hamming(a.c_name, b.c_name) AS BIGINT) AS dist
  FROM customer a
  JOIN customer b
    ON a.c_custkey < b.c_custkey
   AND length(a.c_name) = length(b.c_name)
)
SELECT id_a, id_b, dist FROM pairs WHERE dist <= {max_dist}
"""


def q_value_drift(sf_dir: str, bin_width: float = 5.0):
    """Distribution DRIFT between two corpus halves (the
    population-stability-index monitor every production training
    pipeline runs before a refresh): events split ref/cur by the
    deterministic Knuth-hash rule (the train_test_split rule), the value
    column binned, and per event_type PSI = sum (p_cur - p_ref) *
    ln(p_cur / p_ref) over bins populated in BOTH halves. Per-bin terms
    are fixed-point floored (1e-12) so the reduction is
    order-independent; probabilities divide int64-cast counts, so every
    float is deterministic and the SQL oracle recomputes PSI exactly.
    One combiner groupby; the statistic runs on the (type, bin)
    dimension table."""
    from ..stages.agg import partial_count_groupby

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def bucketize(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        cur = _fold_hash(eid, 100) < np.int64(50)
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "cur": pa.array(cur),
                "bin": pa.array(np.floor(v / bin_width).astype(np.int64)),
            }
        )

    skinny = ds.map_batches(bucketize, batch_format="pyarrow", batch_size=16384)
    counts = partial_count_groupby(skinny, ["event_type", "cur", "bin"], alias="n")
    pdf = counts.to_pandas()  # (type x split x bin)-dimension table
    import pandas as pd

    rows = []
    for et, g in pdf.groupby("event_type"):
        ref = g[~g["cur"]].set_index("bin")["n"]
        cur = g[g["cur"]].set_index("bin")["n"]
        both = sorted(set(ref.index) & set(cur.index))
        n_ref = int(ref.sum())
        n_cur = int(cur.sum())
        psi_fp = 0
        for b in both:
            pr = float(int(ref[b])) / float(n_ref)
            pc = float(int(cur[b])) / float(n_cur)
            term = (pc - pr) * np.log(pc / pr)
            psi_fp += int(np.floor(term * 1e12))
        rows.append(
            (et, len(both), len(ref.index) + len(cur.index) - 2 * len(both), psi_fp)
        )
    out = pd.DataFrame(
        rows, columns=["event_type", "n_bins", "n_one_sided", "psi_fp"]
    )
    for c in ("n_bins", "n_one_sided", "psi_fp"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def sql_value_drift(bin_width: float = 5.0) -> str:
    from .mlprep import _dlit

    return f"""
WITH b AS (
  SELECT event_type,
         (((event_id & 2147483647) * 2654435761) % 100) < 50 AS cur,
         CAST(floor(value / {_dlit(bin_width)}) AS BIGINT) AS bin
  FROM events
), counts AS (
  SELECT event_type, cur, bin, count(*) AS n
  FROM b GROUP BY 1, 2, 3
), tot AS (
  SELECT event_type, cur, sum(n) AS total
  FROM counts GROUP BY 1, 2
), wide AS (
  SELECT r.event_type, r.bin,
         r.n AS n_ref, c.n AS n_cur,
         tr.total AS tot_ref, tc.total AS tot_cur
  FROM counts r
  JOIN counts c ON c.event_type = r.event_type AND c.bin = r.bin AND c.cur
  JOIN tot tr ON tr.event_type = r.event_type AND NOT tr.cur
  JOIN tot tc ON tc.event_type = r.event_type AND tc.cur
  WHERE NOT r.cur
), sided AS (
  SELECT event_type,
         count(*) FILTER (WHERE cur) AS bins_cur,
         count(*) FILTER (WHERE NOT cur) AS bins_ref
  FROM counts GROUP BY 1
), terms AS (
  SELECT event_type,
         CAST(n_cur AS DOUBLE) / CAST(tot_cur AS DOUBLE) AS pc,
         CAST(n_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE) AS pr
  FROM wide
)
, agg AS (
  SELECT event_type, count(*) AS n_bins,
         CAST(sum(CAST(floor((pc - pr) * ln(pc / pr) * 1e12) AS BIGINT)) AS BIGINT)
           AS psi_fp
  FROM terms GROUP BY 1
)
SELECT s.event_type,
       CAST(COALESCE(a.n_bins, 0) AS BIGINT) AS n_bins,
       CAST(s.bins_cur + s.bins_ref - 2 * COALESCE(a.n_bins, 0) AS BIGINT)
         AS n_one_sided,
       CAST(COALESCE(a.psi_fp, 0) AS BIGINT) AS psi_fp
FROM sided s LEFT JOIN agg a USING (event_type)
"""


def q_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (sorted-group streaming semantics).
    Superbucketed: one vectorized kernel per 512-way user-hash bucket
    (session_windows_bucket) instead of one pandas dispatch per user."""
    from ..stages.window import session_windows_bucket

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    skinny = ds.map_batches(_add_user_bucket, batch_format="pyarrow")
    gap_us = gap_minutes * 60 * 1_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        return session_windows_bucket(g.drop(columns="__ub"), gap_us)

    return skinny.groupby("__ub").map_groups(sessions, batch_format="pandas")


SQL_SESSIONIZE = """
SELECT user_id,
       count(*) AS n_events,
       count(*) FILTER (
           WHERE prev_ts IS NULL
              OR epoch_us(ts) - epoch_us(prev_ts) > 30 * 60 * 1000000
       ) AS n_sessions
FROM (
    SELECT user_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
    FROM events
)
GROUP BY 1
"""


def q_asof_join(sf_dir: str):
    """As-of join: for every event, the most recent prior-or-equal
    'purchase' event of the same user. Sorted merge_asof per user group
    (groupby(user_id).map_groups) — the guide's bucketed as-of pattern.

    Output: one row per event that has a prior purchase, with the lag in
    microseconds (integer, deterministic).
    """
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def skinnify(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "is_purchase": pa.compute.equal(batch["event_type"], "purchase"),
            }
        )

    skinny = ds.map_batches(
        skinnify, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def asof_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # sort + forward-fill of the last purchase so far: identical to the
        # oracle window (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING),
        # including same-timestamp ties. Vectorized across EVERY user in
        # the bucket: running argmax of purchase positions, then a fill is
        # valid only if it lands inside the same user's segment.
        g = group.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        ev = g["event_id"].to_numpy()
        ts_us = g["ts_us"].to_numpy()
        is_purchase = g["is_purchase"].to_numpy()
        n = len(uid)
        filled = np.maximum.accumulate(np.where(is_purchase, np.arange(n), -1))
        valid = (filled >= 0) & (uid[np.maximum(filled, 0)] == uid)
        f = filled[valid]
        return pd.DataFrame(
            {
                "event_id": ev[valid].astype("int64"),
                "user_id": uid[valid].astype("int64"),
                "purchase_event_id": ev[f].astype("int64"),
                "lag_us": (ts_us[valid] - ts_us[f]).astype("int64"),
            }
        )

    return skinny.groupby("__ub").map_groups(asof_bucket, batch_format="pandas")


def q_join_large(sf_dir: str, num_partitions: int = 16):
    """Large-large hash-partitioned join via Dataset.join (both sides
    shuffled on the key): lineitem x orders -> cent-revenue per order
    priority. The broadcast pattern (q_join_mktsegment) covers small
    sides; this is the genuine two-sided exchange."""
    from ..stages.agg import partial_sum_groupby

    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def li_cents(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "rev_cents": pa.array(
                    np.trunc(ep * (1.0 - disc) * 100.0).astype(np.int64)
                ),
            }
        )

    lineitem = lineitem.map_batches(li_cents, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = lineitem.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return partial_sum_groupby(
        joined, ["o_orderpriority"], ["rev_cents"], count_alias="n", coalesce=4
    )


SQL_JOIN_LARGE = """
SELECT o.o_orderpriority AS o_orderpriority,
       CAST(sum(CAST(trunc(l.l_extendedprice * (1.0 - l.l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS rev_cents,
       count(*) AS n
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


def q_join_part_brand(sf_dir: str):
    """Broadcast join lineitem x part: quantity cents per brand."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    keys = part["p_partkey"].to_numpy()
    order = np.argsort(keys)
    keys = keys[order]
    bcodes, bcats = _str_codes(part["p_brand"])
    brands = bcats[bcodes][order]

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    def join(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(keys, pk), 0, len(keys) - 1)
        matched = keys[pos] == pk
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p_brand": pa.array(brands[pos][matched].tolist(), pa.string()),
                "qty_cents": pa.array(
                    np.trunc(qty[matched] * 100.0).astype(np.int64)
                ),
            }
        )

    from ..stages.agg import partial_sum_groupby

    return partial_sum_groupby(
        ds.map_batches(join, batch_format="pyarrow"),
        ["p_brand"],
        ["qty_cents"],
        count_alias="n",
        coalesce=4,
    )


SQL_JOIN_PART_BRAND = """
SELECT p.p_brand AS p_brand,
       CAST(sum(CAST(trunc(l.l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS qty_cents,
       count(*) AS n
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
"""


def q_label_stats(sf_dir: str):
    """Embedding metadata aggregate: per label, count + integer-truncated
    sum of the first embedding dimension (list-column access, deterministic
    int sums on both sides)."""
    ds = _read(sf_dir, "embeddings", ["embedding", "label"])

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.similarity import _stack_embeddings

        m = _stack_embeddings(batch["embedding"])
        first_scaled = np.trunc(m[:, 0] * 1000000.0).astype(np.int64)
        return pa.table(
            {"label": batch["label"], "dim0_sum": pa.array(first_scaled)}
        )

    from ..stages.agg import partial_sum_groupby

    return partial_sum_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label"],
        ["dim0_sum"],
        count_alias="n",
        coalesce=4,
    )


SQL_LABEL_STATS = """
SELECT label,
       CAST(sum(CAST(trunc(CAST(embedding[1] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS dim0_sum,
       count(*) AS n
FROM embeddings
GROUP BY 1
"""


SQL_ASOF_JOIN = """
SELECT event_id, user_id, purchase_event_id, lag_us FROM (
    SELECT e.event_id, e.user_id,
           last_value(CASE WHEN e.event_type = 'purchase' THEN e.event_id END IGNORE NULLS)
               OVER w AS purchase_event_id,
           epoch_us(e.ts) - last_value(CASE WHEN e.event_type = 'purchase' THEN epoch_us(e.ts) END IGNORE NULLS)
               OVER w AS lag_us
    FROM events e
    WINDOW w AS (PARTITION BY e.user_id ORDER BY e.ts, e.event_id ROWS UNBOUNDED PRECEDING)
)
WHERE purchase_event_id IS NOT NULL
"""


def q_anti_join_lineitem(sf_dir: str):
    """Broadcast anti join: lineitems NOT supplied by high-balance
    suppliers (s_acctbal > 5000), counted per return flag.

    The excluded key set is small -> collected once and broadcast into a
    vectorized np.isin filter (no shuffle; a Bloom filter takes this to
    billions of keys)."""
    import pyarrow.parquet as pq

    from ..stages.agg import partial_count_groupby

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"])
    rich = supp.filter(pa.compute.greater(supp["s_acctbal"], 5000.0))[
        "s_suppkey"
    ].to_numpy()

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_returnflag"])

    def anti(batch: pa.Table) -> pa.Table:
        keep = ~np.isin(batch["l_suppkey"].to_numpy(zero_copy_only=False), rich)
        return batch.filter(pa.array(keep)).select(["l_returnflag"])

    ds = ds.map_batches(anti, batch_format="pyarrow")
    return partial_count_groupby(ds, ["l_returnflag"], alias="n", coalesce=4)


SQL_ANTI_JOIN_LINEITEM = """
SELECT l_returnflag, count(*) AS n
FROM lineitem l
WHERE NOT EXISTS (
    SELECT 1 FROM supplier s
    WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal > 5000.0
)
GROUP BY 1
"""


def q_event_props_extract(sf_dir: str):
    """JSON-ish scalar extraction (regexp) + aggregate: sum of props.k per
    event_type."""
    from ray.data.aggregate import Sum
    import re

    ds = _read(sf_dir, "events", ["event_type", "props"])
    pattern = re.compile(r'"k":\s*(-?\d+)')

    def extract(batch: pa.Table) -> pa.Table:
        props = batch["props"].to_pylist()
        ks = np.array(
            [int(m.group(1)) if (m := pattern.search(p or "")) else 0 for p in props],
            dtype=np.int64,
        )
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "k_sum": pa.array(ks),
                "n": pa.array(np.ones(len(ks), dtype=np.int64)),
            }
        )
        g = t.group_by(["event_type"]).aggregate([("k_sum", "sum"), ("n", "sum")])
        return g.rename_columns(["event_type", "k_sum", "n"])

    ds = ds.map_batches(extract, batch_format="pyarrow")
    return ds.groupby("event_type").aggregate(
        Sum("k_sum", alias_name="k_sum"), Sum("n", alias_name="n")
    )


SQL_EVENT_PROPS_EXTRACT = """
SELECT event_type,
       CAST(sum(CAST(coalesce(nullif(regexp_extract(props, '"k":\\s*(-?\\d+)', 1), ''), '0') AS BIGINT)) AS BIGINT) AS k_sum,
       count(*) AS n
FROM events
GROUP BY 1
"""


def q_anti_join_bloom(sf_dir: str):
    """Anti join with a Bloom-filter prefilter — the billions-of-keys
    scale path for q_anti_join_lineitem. The broadcast side is the Bloom
    bits (~10 bits/key) instead of the raw key array; rows the filter
    definitely excludes pass immediately, `maybe` rows get the exact
    confirm (np.isin here; a partitioned semi-join at cluster scale).
    False positives only route rows to the confirm step, so results are
    EXACT — the oracle is the same SQL as the exact anti join."""
    import pyarrow.parquet as pq

    from ..stages.agg import partial_count_groupby
    from ..stages.sketch import BloomFilter

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"])
    rich = supp.filter(pa.compute.greater(supp["s_acctbal"], 5000.0))[
        "s_suppkey"
    ].to_numpy()
    bloom = BloomFilter(len(rich), fpr=0.01)
    bloom.add_int64(rich)

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_returnflag"])

    def anti(batch: pa.Table) -> pa.Table:
        keys = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        maybe = bloom.might_contain(keys)
        in_set = np.zeros(len(keys), dtype=bool)
        if maybe.any():
            in_set[maybe] = np.isin(keys[maybe], rich)
        return batch.filter(pa.array(~in_set)).select(["l_returnflag"])

    ds = ds.map_batches(anti, batch_format="pyarrow")
    return partial_count_groupby(ds, ["l_returnflag"], alias="n", coalesce=4)


def q_range_join(sf_dir: str, n_bands: int = 30):
    """Range (interval) join: every order matched to each OVERLAPPING
    price band [i*20000, i*20000 + 30000) — the broadcast
    interval-dimension join (stages/interval.IntervalJoiner: elementary
    segments + CSR cover lists, searchsorted probe). Returns all
    (o_orderkey, band_id) match rows; a row can match two bands."""
    from ..stages.interval import IntervalJoiner

    i = np.arange(n_bands, dtype=np.float64)
    joiner = IntervalJoiner(
        lo=i * 20000.0,
        hi=i * 20000.0 + 30000.0,
        interval_ids=np.arange(n_bands, dtype=np.int64),
        value_col="o_totalprice",
        id_out="band_id",
        keep_columns=["o_orderkey"],
    )
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    # dimension-sized joiner ships with the task (no actor pool needed:
    # the decomposition is built once on the driver)
    return ds.map_batches(lambda b, j=joiner: j(b), batch_format="pyarrow")


SQL_RANGE_JOIN = """
WITH bands AS (
  SELECT CAST(i AS BIGINT) AS band_id,
         i * 20000.0 AS lo, i * 20000.0 + 30000.0 AS hi
  FROM range(30) t(i)
)
SELECT o.o_orderkey, b.band_id
FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
"""


def q_range_partition_orders(sf_dir: str, n_parts: int = 8):
    """Range-partitioned sorted sink: t-digest boundary fit (one
    streaming pass, no sort shuffle) -> searchsorted part assignment ->
    resumable hive write (manifest lineage). Returns the written
    layout read BACK from the files themselves: per part the row count
    and min/max price in cents — non-overlapping ascending ranges prove
    the global range clustering. Golden oracle (sketch boundaries are
    deterministic but not SQL-recomputable); layout invariants also
    pinned in pytest."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from ..state.range_partition import range_partition_write

    out = f"/tmp/texel_ray_data/range_orders_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out, ignore_errors=True)
    _, written, _ = range_partition_write(
        lambda: _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
        col="o_totalprice",
        out_dir=out,
        n_parts=n_parts,
        id_col="o_orderkey",
    )
    rows = []
    for part in sorted(int(p) for p in written):
        t = pq.read_table(f"{out}/part={part}", columns=["o_totalprice"])
        v = t["o_totalprice"].to_numpy()
        rows.append(
            (
                part,
                len(v),
                int(np.trunc(v.min() * 100.0)),
                int(np.trunc(v.max() * 100.0)),
            )
        )
    return pd.DataFrame(
        rows, columns=["part", "n_rows", "min_cents", "max_cents"]
    )


def q_window_join_events(sf_dir: str, window_us: int = 3_600_000_000):
    """Per-key sliding-window SELF-JOIN (streaming window join): for every
    event, the count and value-sum of the SAME user's STRICTLY-PRIOR
    events within the trailing 1h window — the classic feature-engineering
    window join. One groupby(user) shuffle; per group a sort + two
    searchsorted/prefix-sum passes (no quadratic pair scan). "Prior" is
    (ts, event_id)-lexicographic, mirrored exactly by the SQL join
    condition; value sums are cent-truncated ints (order-independent)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def skinnify(batch: pa.Table) -> pa.Table:
        value = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "cents": pa.array(np.trunc(value * 100.0).astype(np.int64)),
            }
        )

    skinny = ds.map_batches(
        skinnify, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def window_counts(group: pd.DataFrame) -> pd.DataFrame:
        # one sort per bucket; per-user segments share the global prefix
        # sum (contiguous), only the searchsorted runs per segment
        g, _uid, starts, ends = _user_segments(group, ["ts_us", "event_id"])
        ts = g["ts_us"].to_numpy()
        ev = g["event_id"].to_numpy()
        cum = np.concatenate(([0], np.cumsum(g["cents"].to_numpy())))
        n_win = np.empty(len(ts), dtype=np.int64)
        cents_win = np.empty(len(ts), dtype=np.int64)
        for s, e in zip(starts, ends):
            lo = s + np.searchsorted(ts[s:e], ts[s:e] - window_us, side="left")
            pos = np.arange(s, e)
            n_win[s:e] = pos - lo
            cents_win[s:e] = cum[pos] - cum[lo]
        return pd.DataFrame(
            {"event_id": ev, "n_win": n_win, "cents_win": cents_win}
        )

    return skinny.groupby("__ub").map_groups(window_counts, batch_format="pandas")


SQL_WINDOW_JOIN_EVENTS = """
SELECT e.event_id,
       COUNT(o.event_id) AS n_win,
       COALESCE(CAST(SUM(trunc(o.value * 100.0)) AS BIGINT), 0) AS cents_win
FROM events e LEFT JOIN events o
  ON o.user_id = e.user_id
 AND o.ts >= e.ts - INTERVAL 1 HOUR
 AND (o.ts < e.ts OR (o.ts = e.ts AND o.event_id < e.event_id))
GROUP BY 1
"""


def q_percent_rank_orders(sf_dir: str):
    """Window-function op: percent_rank of o_totalprice within each
    order priority (groupby(priority) -> sort + vectorized
    (rank-1)/(n-1); average-ties via cent-truncated price, mirroring
    SQL's peer semantics on an integer key so the doubles divide out
    bit-identically on both sides)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.trunc(g["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        order = np.lexsort((g["o_orderkey"].to_numpy(), cents))
        cents_s = cents[order]
        n = len(cents_s)
        # percent_rank: (rank - 1) / (n - 1), rank = 1 + count of strictly
        # smaller peers (ties share the rank of their first element)
        first_of_run = np.concatenate(([True], np.diff(cents_s) != 0))
        rank = np.maximum.accumulate(np.where(first_of_run, np.arange(n), 0))
        pr = rank / (n - 1) if n > 1 else np.zeros(n)
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy()[order],
                "o_orderpriority": g["o_orderpriority"].to_numpy()[order],
                "pct_rank": pr,
            }
        )

    ds = ds.repartition(8)
    return ds.groupby("o_orderpriority").map_groups(
        per_group, batch_format="pandas"
    )


SQL_PERCENT_RANK_ORDERS = """
SELECT o_orderkey, o_orderpriority,
       percent_rank() OVER (
         PARTITION BY o_orderpriority
         ORDER BY CAST(trunc(o_totalprice * 100.0) AS BIGINT)
       ) AS pct_rank
FROM orders
"""


def q_pivot_events(sf_dir: str):
    """Pivot: per-user event counts spread into one column per event
    type (long -> wide). Per-batch (user, type) partial counts -> one
    skinny groupby -> vectorized driver-free reshape in a final
    map_batches (the type set is a fixed dimension)."""
    from ..stages.agg import partial_count_groupby

    types = ["click", "purchase", "view"]
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = partial_count_groupby(ds, ["user_id", "event_type"], alias="n")

    def widen(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        w = df.pivot_table(
            index="user_id", columns="event_type", values="n",
            aggfunc="sum", fill_value=0,
        )
        out = {"user_id": w.index.to_numpy()}
        for t in types:
            out[f"n_{t}"] = (
                w[t].to_numpy().astype(np.int64)
                if t in w.columns
                else np.zeros(len(w), dtype=np.int64)
            )
        return pa.table(out)

    # the groupby output is vocabulary-sized (users x types); the final
    # widen runs on the coalesced aggregate
    return counts.repartition(1).map_batches(widen, batch_format="pyarrow")


SQL_PIVOT_EVENTS = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS n_click,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'view') AS n_view
FROM events GROUP BY 1
"""


def q_event_transitions(sf_dir: str):
    """Per-user event-type TRANSITION counts (Markov bigrams): for each
    consecutive event pair in (ts, event_id) order, count (prev_type ->
    type). One groupby(user) exchange of skinny rows; per group a
    vectorized sort + shift; partial bigram counts -> tiny final merge.
    Exact SQL oracle via lag() over the same deterministic ordering."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def skinnify(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
            }
        )

    skinny = ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384)
    parts = _bucketed_bigrams(skinny, "event_type", "prev_type", "event_type")
    agg = partial_sum_groupby(
        parts, ["prev_type", "event_type"], ["n_partial"], coalesce=4
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["prev_type", "event_type", "n"])

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENT_TRANSITIONS = """
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type, count(*) AS n
FROM o
WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


# ---- synthetic event geotags (deterministic; mirrored 1:1 in SQL) ---------
#
# The events table carries no geometry; trajectory-shaped operators need
# one. Each user's events jitter +-2 degrees around a "home" urban center
# (user_id % n_centers) with an exact integer formula, so the DuckDB
# oracle recomputes the identical doubles (same parenthesization; integer
# modulus on non-negative ids agrees between numpy and SQL).


def _event_geo_np(user_id: np.ndarray, event_id: np.ndarray):
    from ..sources.images import _URBAN_CENTERS

    cx = np.array([c[0] for c in _URBAN_CENTERS], dtype=np.float64)
    cy = np.array([c[1] for c in _URBAN_CENTERS], dtype=np.float64)
    ci = user_id % len(_URBAN_CENTERS)
    lon = cx[ci] + (((event_id * 9973) % 400) / 100.0 - 2.0)
    lat = cy[ci] + (((event_id * 7919) % 400) / 100.0 - 2.0)
    return lon, lat


def _sql_event_pos() -> str:
    """Shared CTE fragment: centers VALUES + pos (geotagged events)."""
    from ..sources.images import _URBAN_CENTERS

    n = len(_URBAN_CENTERS)
    vals = ", ".join(
        f"({i}, {cx!r}, {cy!r})" for i, (cx, cy) in enumerate(_URBAN_CENTERS)
    )
    return f"""
centers(ci, cx, cy) AS (VALUES {vals}),
pos AS (
  SELECT e.user_id, epoch_us(e.ts) AS ts_us, e.event_id,
         c.cx + (((e.event_id * 9973) % 400) / 100.0 - 2.0) AS lon,
         c.cy + (((e.event_id * 7919) % 400) / 100.0 - 2.0) AS lat
  FROM events e JOIN centers c ON (e.user_id % {n}) = c.ci
)"""


_RECT_REGIONS = None


def _rect_regions():
    """(region_id, minx, miny, maxx, maxy) arrays for the RECT regions,
    ascending region_id; regenerated deterministically per process
    (cheaper than broadcasting a table this small at cluster scale)."""
    global _RECT_REGIONS
    if _RECT_REGIONS is None:
        from ..sources.regions import generate_regions_table

        t = generate_regions_table()
        t = t.filter(pa.compute.equal(t["kind"], "rect"))
        _RECT_REGIONS = tuple(
            t[c].to_numpy(zero_copy_only=False)
            for c in ("region_id", "minx", "miny", "maxx", "maxy")
        )
    return _RECT_REGIONS


def _event_pos_region_batch(batch: pa.Table) -> pa.Table:
    """Geotag a batch of events and assign region = MIN region_id among
    containing rect regions (else -1). Dense (batch x 58) mask; first
    True along ascending region_id IS the minimum."""
    uid = batch["user_id"].to_numpy(zero_copy_only=False)
    ev = batch["event_id"].to_numpy(zero_copy_only=False)
    lon, lat = _event_geo_np(uid, ev)
    rid, minx, miny, maxx, maxy = _rect_regions()
    inside = (
        (lon[:, None] >= minx[None, :])
        & (lon[:, None] <= maxx[None, :])
        & (lat[:, None] >= miny[None, :])
        & (lat[:, None] <= maxy[None, :])
    )
    hit = inside.any(axis=1)
    region = np.where(hit, rid[inside.argmax(axis=1)], -1)
    return pa.table(
        {
            "user_id": batch["user_id"],
            "ts_us": pa.compute.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "region": pa.array(region, pa.int64()),
        }
    )


def q_od_flows(sf_dir: str):
    """Origin -> destination FLOW MATRIX (OD counts between regions):
    geotag events deterministically (see _event_geo_np), assign each
    event the MIN containing rect region (else -1) in one stateless
    map_batches pass, then count per-user consecutive (from -> to)
    region transitions in (ts, event_id) order. 100-TB shape: only
    skinny int rows cross the single groupby(user) exchange, the flow
    matrix itself is bounded by regions^2; the 58-rect dimension side is
    regenerated per worker, never shipped. Exact SQL oracle: the same
    geotag formula + a min-region scalar subquery + lag() window."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    skinny = ds.map_batches(
        _event_pos_region_batch, batch_format="pyarrow", batch_size=16384
    )

    parts = _bucketed_bigrams(skinny, "region", "from_region", "to_region")
    agg = partial_sum_groupby(
        parts, ["from_region", "to_region"], ["n_partial"], coalesce=4
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["from_region", "to_region", "n"])

    return agg.map_batches(finish, batch_format="pyarrow")


def q_dist_join_events(
    sf_dir: str, eps: float = 0.05, num_partitions: int = 16,
    use_join: bool = False,
):
    """Bipartite epsilon-DISTANCE JOIN (the kNN-join cousin): every
    (event, image) pair whose geotags lie within ``eps`` degrees,
    summarized per event_type (pair count, distinct images, distinct
    events). A genuine TWO-SIDED exchange — neither side is
    dimension-sized. Blocking: images carry their single home cell,
    events donate to their 3x3 neighbor cells (any pair within eps
    differs by <= 1 cell coordinate, so blocking is complete and each
    candidate appears exactly once). Only all-int skinny rows shuffle.

    Two equivalent exchanges (pytest-pinned identical):
    - default COGROUP kernel: union both sides with a side tag, ONE
      hash-bucketed groupby on the cell, per-cell vectorized bipartite
      distance matrix, per-type partials aggregated INSIDE the group —
      the 13M-pair candidate set never materializes (9.1 s vs 16.2 s at
      sf0.1/32cpus);
    - ``use_join=True``: hash-partitioned ``Dataset.join`` on the packed
      cell key + exact d2 filter (the generic relational form).
    Exact SQL oracle: identical cell equijoin + predicate."""
    import zlib

    import ray.data

    from ..sources.images import read_images
    from ..stages.agg import partial_count_groupby, partial_sum_groupby

    e2 = eps * eps

    def image_cells(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        cx = np.floor(lon / eps).astype(np.int64)
        cy = np.floor(lat / eps).astype(np.int64)
        img_int = pc.utf8_slice_codeunits(batch["image_id"], 3).cast(pa.int64())
        n = len(lon)
        return pa.table(
            {
                "cell": pa.array((cx << 32) | (cy & np.int64(0xFFFFFFFF))),
                "ida": img_int,
                "x": batch["lon"],
                "y": batch["lat"],
                "tcode": pa.array(np.full(n, -1, np.int64)),
                "side": pa.array(np.zeros(n, np.int8)),
            }
        )

    def event_cells(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, eid)
        cx = np.floor(lon / eps).astype(np.int64)
        cy = np.floor(lat / eps).astype(np.int64)
        # crc32 once per DISTINCT type (dictionary codes), not per row
        codes, cats = _str_codes(batch["event_type"])
        cat_crc = np.fromiter(
            (zlib.crc32(t.encode()) & 0x7FFFFFFF for t in cats),
            dtype=np.int64,
            count=len(cats),
        )
        tcode = cat_crc[codes]
        cells, ids, xs, ys, tc = [], [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cells.append(((cx + dx) << 32) | ((cy + dy) & np.int64(0xFFFFFFFF)))
                ids.append(eid)
                xs.append(lon)
                ys.append(lat)
                tc.append(tcode)
        n9 = len(eid) * 9
        return pa.table(
            {
                "cell": pa.array(np.concatenate(cells)),
                "ida": pa.array(np.concatenate(ids)),
                "x": pa.array(np.concatenate(xs)),
                "y": pa.array(np.concatenate(ys)),
                "tcode": pa.array(np.concatenate(tc)),
                "side": pa.array(np.ones(n9, np.int8)),
            }
        )

    imgs = read_images(sf_dir, columns=["image_id", "lon", "lat"]).map_batches(
        image_cells, batch_format="pyarrow", batch_size=16384
    )
    evs = _read(sf_dir, "events", ["user_id", "event_id", "event_type"]).map_batches(
        event_cells, batch_format="pyarrow", batch_size=16384
    )

    if use_join:
        joined = imgs.join(
            evs,
            join_type="inner",
            num_partitions=num_partitions,
            on=("cell",),
            left_suffix="_i",
            right_suffix="_e",
        )

        def confirm(batch: pa.Table) -> pa.Table:
            ix = batch["x_i"].to_numpy(zero_copy_only=False)
            iy = batch["y_i"].to_numpy(zero_copy_only=False)
            ex = batch["x_e"].to_numpy(zero_copy_only=False)
            ey = batch["y_e"].to_numpy(zero_copy_only=False)
            d2 = (ix - ex) ** 2 + (iy - ey) ** 2
            keep = pa.array(d2 <= e2)
            t = batch.filter(keep)
            return pa.table(
                {
                    "tcode": t["tcode_e"],
                    "image_int": t["ida_i"],
                    "event_id": t["ida_e"],
                }
            )

        pairs = joined.map_batches(confirm, batch_format="pyarrow").materialize()
        n_pairs = partial_count_groupby(pairs, ["tcode"], alias="n_pairs")
        img_d = partial_count_groupby(pairs, ["tcode", "image_int"], alias="__x")
        ev_d = partial_count_groupby(pairs, ["tcode", "event_id"], alias="__x")
        n_imgs = partial_count_groupby(img_d, ["tcode"], alias="n_images")
        n_evs = partial_count_groupby(ev_d, ["tcode"], alias="n_events")
        a = n_pairs.to_pandas().set_index("tcode")
        a["n_images"] = n_imgs.to_pandas().set_index("tcode")["n_images"]
        a["n_events"] = n_evs.to_pandas().set_index("tcode")["n_events"]
    else:
        u = imgs.union(evs)

        def sb(batch: pa.Table) -> pa.Table:
            c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
            return batch.append_column(
                "__sb",
                pa.array(((c * np.uint64(2654435761)) % 512).astype(np.int64)),
            )

        u = u.map_batches(sb, batch_format="pyarrow")

        def cogroup(g: pa.Table) -> pa.Table:
            cell = g["cell"].to_numpy(zero_copy_only=False)
            side = g["side"].to_numpy(zero_copy_only=False)
            ida = g["ida"].to_numpy(zero_copy_only=False)
            x = g["x"].to_numpy(zero_copy_only=False)
            y = g["y"].to_numpy(zero_copy_only=False)
            tc = g["tcode"].to_numpy(zero_copy_only=False)
            order = np.lexsort((side, cell))
            cell, side, ida = cell[order], side[order], ida[order]
            x, y, tc = x[order], y[order], tc[order]
            bnd = np.nonzero(cell[1:] != cell[:-1])[0] + 1
            starts = np.concatenate(([0], bnd))
            ends = np.concatenate((bnd, [len(cell)]))
            pair_n: dict[int, int] = {}
            img_n: dict[int, int] = {}
            ev_rows_t, ev_rows_e = [], []
            for s, e in zip(starts, ends):
                k = s + int(np.searchsorted(side[s:e], 1))  # images first
                if k == s or k == e:
                    continue  # one-sided cell
                d2 = (x[s:k][:, None] - x[k:e][None, :]) ** 2 + (
                    y[s:k][:, None] - y[k:e][None, :]
                ) ** 2
                hit = d2 <= e2
                if not hit.any():
                    continue
                per_event = hit.sum(axis=0)
                etc = tc[k:e]
                for t in np.unique(etc):
                    m = etc == t
                    pair_n[t] = pair_n.get(t, 0) + int(per_event[m].sum())
                    # distinct images are exact per group: an image's
                    # single home cell holds ALL its candidate pairs
                    img_n[t] = img_n.get(t, 0) + int(
                        hit[:, m].any(axis=1).sum()
                    )
                got = per_event > 0
                ev_rows_t.append(etc[got])
                ev_rows_e.append(ida[k:e][got])
            ts = list(pair_n)
            out1 = pa.table(
                {
                    "tcode": pa.array(ts, pa.int64()),
                    "event_id": pa.array([-1] * len(ts), pa.int64()),
                    "n_pairs": pa.array([pair_n[t] for t in ts], pa.int64()),
                    "n_images": pa.array([img_n[t] for t in ts], pa.int64()),
                }
            )
            if not ev_rows_t:
                return out1
            et = np.concatenate(ev_rows_t)
            ee = np.concatenate(ev_rows_e)
            z = np.zeros(len(et), np.int64)
            out2 = pa.table(
                {
                    "tcode": pa.array(et),
                    "event_id": pa.array(ee),
                    "n_pairs": pa.array(z),
                    "n_images": pa.array(z),
                }
            )
            return pa.concat_tables([out1, out2])

        parts = u.groupby("__sb").map_groups(
            cogroup, batch_format="pyarrow"
        ).materialize()  # skinny: per-(group, type) partials + event rows
        summary = partial_sum_groupby(
            parts.filter(expr="event_id == -1"),
            ["tcode"],
            ["n_pairs", "n_images"],
            coalesce=4,
        )
        evd = partial_count_groupby(
            parts.filter(expr="event_id >= 0"), ["tcode", "event_id"], alias="__x"
        )
        n_evs = partial_count_groupby(evd, ["tcode"], alias="n_events")
        a = summary.to_pandas().set_index("tcode")
        a["n_events"] = n_evs.to_pandas().set_index("tcode")["n_events"]

    # tiny label map: 5 event types
    types = _read(sf_dir, "events", ["event_type"]).unique("event_type")
    label = {zlib.crc32(t.encode()) & 0x7FFFFFFF: t for t in types}
    a["event_type"] = [label[c] for c in a.index]
    return a.reset_index(drop=True)[
        ["event_type", "n_pairs", "n_images", "n_events"]
    ]


def q_traj_edge_match(sf_dir: str):
    """Trajectory MAP-MATCHING composition: every event geotag snaps to
    its nearest region boundary segment (the q_map_match_edges kernel on
    the deterministic event positions), then per-user consecutive
    (from_edge -> to_edge) transitions in (ts, event_id) order — the
    edge-sequence form of od_flows, i.e. the classic GPS-trace ->
    road-segment -> transition-matrix pipeline. The 262-edge dimension
    side regenerates per worker; one skinny groupby(user) exchange; the
    transition matrix is edges^2-bounded. Exact SQL oracle: same
    clamped-projection distance + row_number nearest + lag window."""
    from ..sources.regions import edge_geom_arrays, nearest_edge_index
    from ..stages.agg import partial_sum_groupby

    eid, _rid, ax, ay, dx, dy, l2 = edge_geom_arrays()

    def nearest_edge(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ev = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, ev)
        best = nearest_edge_index(lon, lat, ax, ay, dx, dy, l2)
        ts_us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": ts_us,
                "event_id": batch["event_id"],
                "edge": pa.array(eid[best]),
            }
        )

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    skinny = ds.map_batches(nearest_edge, batch_format="pyarrow", batch_size=8192)

    parts = _bucketed_bigrams(skinny, "edge", "from_edge", "to_edge")
    agg = partial_sum_groupby(
        parts, ["from_edge", "to_edge"], ["n_partial"], coalesce=4
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["from_edge", "to_edge", "n"])

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_traj_edge_match() -> str:
    from .mlprep import edge_values_sql

    vals = edge_values_sql(with_region=False)
    return f"""
WITH {_sql_event_pos()},
eg(edge_id, ax, ay, dx, dy, l2) AS (VALUES {vals}),
proj AS (
  SELECT p.user_id, p.ts_us, p.event_id, eg.edge_id,
         LEAST(1.0, GREATEST(0.0,
           ((p.lon - eg.ax) * eg.dx + (p.lat - eg.ay) * eg.dy) / eg.l2)) AS t,
         p.lon, p.lat, eg.ax, eg.ay, eg.dx, eg.dy
  FROM pos p CROSS JOIN eg
), dist AS (
  SELECT user_id, ts_us, event_id, edge_id,
         (lon - (ax + t * dx)) * (lon - (ax + t * dx))
       + (lat - (ay + t * dy)) * (lat - (ay + t * dy)) AS d2
  FROM proj
), best AS (
  SELECT user_id, ts_us, event_id, edge_id,
         row_number() OVER (PARTITION BY event_id ORDER BY d2, edge_id) AS rk
  FROM dist
), seq AS (
  SELECT user_id, edge_id AS to_edge,
         lag(edge_id) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS from_edge
  FROM best WHERE rk = 1
)
SELECT CAST(from_edge AS BIGINT) AS from_edge,
       CAST(to_edge AS BIGINT) AS to_edge, count(*) AS n
FROM seq WHERE from_edge IS NOT NULL
GROUP BY 1, 2
"""


def sql_dist_join_events(images_source: str, eps: float = 0.05) -> str:
    from .mlprep import _dlit

    e2 = eps * eps
    return f"""
WITH {_sql_event_pos()},
ic AS (
  SELECT image_id, lon AS ilon, lat AS ilat,
         CAST(floor(lon / {_dlit(eps)}) AS BIGINT) AS cx,
         CAST(floor(lat / {_dlit(eps)}) AS BIGINT) AS cy
  FROM {images_source}
),
ec AS (
  SELECT p.event_id, e.event_type, p.lon AS elon, p.lat AS elat,
         CAST(floor(p.lon / {_dlit(eps)}) AS BIGINT) AS cx,
         CAST(floor(p.lat / {_dlit(eps)}) AS BIGINT) AS cy
  FROM pos p JOIN events e USING (event_id)
),
pairs AS (
  SELECT ec.event_type, ic.image_id, ec.event_id
  FROM ic
  JOIN ec
    ON ic.cx BETWEEN ec.cx - 1 AND ec.cx + 1
   AND ic.cy BETWEEN ec.cy - 1 AND ec.cy + 1
  WHERE (ic.ilon - ec.elon) * (ic.ilon - ec.elon)
      + (ic.ilat - ec.elat) * (ic.ilat - ec.elat) <= {_dlit(e2)}
)
SELECT event_type,
       count(*) AS n_pairs,
       count(DISTINCT image_id) AS n_images,
       count(DISTINCT event_id) AS n_events
FROM pairs
GROUP BY 1
"""


def sql_od_flows() -> str:
    from ..sources.regions import regions_parquet_path

    rsrc = f"read_parquet('{regions_parquet_path()}')"
    return f"""
WITH {_sql_event_pos()},
reg AS (
  SELECT p.user_id, p.ts_us, p.event_id,
         coalesce((SELECT min(r.region_id) FROM {rsrc} r
                   WHERE r.kind = 'rect'
                     AND p.lon >= r.minx AND p.lon <= r.maxx
                     AND p.lat >= r.miny AND p.lat <= r.maxy), -1) AS region
  FROM pos p
),
o AS (
  SELECT user_id, region,
         lag(region) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS from_region
  FROM reg
)
SELECT from_region, region AS to_region, count(*) AS n
FROM o
WHERE from_region IS NOT NULL
GROUP BY 1, 2
"""


def q_traj_segments(
    sf_dir: str, gap_us: int = 43_200_000_000, d2_split: float = 4.0
):
    """Trajectory SEGMENTATION (trip/stay splitting): per user, order
    events by (ts, event_id) and start a new segment when the time gap
    exceeds 12h OR the squared-degree jump exceeds ``d2_split``. Emits
    per segment: event count, first/last event_id (in trajectory order)
    and the time span. One skinny groupby(user) exchange; per group a
    single vectorized diff/cumsum — no per-row Python. Exact SQL oracle:
    lag() + sum(CASE) running window over the identical doubles."""

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def pos(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ev = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, ev)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": pa.compute.cast(batch["ts"], pa.int64()),
                "event_id": batch["event_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    skinny = ds.map_batches(pos, batch_format="pyarrow", batch_size=16384)

    skinny = skinny.map_batches(_add_user_bucket, batch_format="pyarrow")

    def segments(group: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every user in the bucket: a user change is a
        # forced break, so segment starts never straddle users; the seg
        # index restarts per user by subtracting each user's first start
        g = group.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        ev = g["event_id"].to_numpy()
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        dlon = np.diff(lon)
        dlat = np.diff(lat)
        brk = np.concatenate(
            (
                [True],
                (uid[1:] != uid[:-1])
                | (np.diff(ts) > gap_us)
                | (dlon * dlon + dlat * dlat > d2_split),
            )
        )
        starts = np.nonzero(brk)[0]
        ends = np.concatenate((starts[1:], [len(ts)])) - 1
        su = uid[starts]
        new_user = np.concatenate(([True], su[1:] != su[:-1]))
        first_pos = np.nonzero(new_user)[0]
        runs = np.diff(np.concatenate((first_pos, [len(starts)])))
        seg = np.arange(len(starts), dtype=np.int64) - np.repeat(first_pos, runs)
        return pd.DataFrame(
            {
                "user_id": su,
                "seg": seg,
                "n": (ends - starts + 1).astype(np.int64),
                "first_event_id": ev[starts],
                "last_event_id": ev[ends],
                "span_us": ts[ends] - ts[starts],
            }
        )

    return skinny.groupby("__ub").map_groups(segments, batch_format="pandas")


def sql_traj_segments(
    gap_us: int = 43_200_000_000, d2_split: float = 4.0
) -> str:
    return f"""
WITH {_sql_event_pos()},
o AS (
  SELECT user_id, ts_us, event_id, lon, lat,
         lag(ts_us) OVER w AS pts,
         lag(lon) OVER w AS plon,
         lag(lat) OVER w AS plat
  FROM pos
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
b AS (
  SELECT user_id, ts_us, event_id,
         CASE WHEN pts IS NULL OR ts_us - pts > {gap_us}
                   OR (lon - plon) * (lon - plon)
                      + (lat - plat) * (lat - plat) > {d2_split!r}
              THEN 1 ELSE 0 END AS brk
  FROM o
),
s AS (
  SELECT user_id, ts_us, event_id,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS seg
  FROM b
),
m AS (
  SELECT user_id, seg, ts_us, event_id,
         row_number() OVER (PARTITION BY user_id, seg
                            ORDER BY ts_us, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, seg
                            ORDER BY ts_us DESC, event_id DESC) AS rn_d
  FROM s
)
SELECT user_id, seg, count(*) AS n,
       max(CASE WHEN rn_a = 1 THEN event_id END) AS first_event_id,
       max(CASE WHEN rn_d = 1 THEN event_id END) AS last_event_id,
       max(ts_us) - min(ts_us) AS span_us
FROM m
GROUP BY 1, 2
"""


def q_region_coviz(sf_dir: str):
    """Region CO-VISITATION matrix (market-basket co-occurrence): for
    every pair of rect regions, how many users visited BOTH (distinct
    per user; unassigned events excluded). Same geotag + min-region
    assign as od_flows; users bucketed 512-way (_add_user_bucket) so the
    map_groups dispatch count is the bucket count, not the user count
    (the measured-4.5x late_events precedent); inside each bucket ONE
    vectorized dedup + equal-size-class triangle template expansion —
    no per-user Python loop. Pair counts merge through the combiner —
    the output is regions^2-bounded, the exchange carries (user,
    region) int rows only. Exact SQL oracle: distinct user-region
    self-join."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    skinny = ds.map_batches(
        _event_pos_region_batch, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group["region"] >= 0]
        uid = g["user_id"].to_numpy()
        reg = g["region"].to_numpy()
        order = np.lexsort((reg, uid))
        uid, reg = uid[order], reg[order]
        keep = np.ones(len(uid), dtype=bool)
        keep[1:] = (uid[1:] != uid[:-1]) | (reg[1:] != reg[:-1])
        uid, reg = uid[keep], reg[keep]
        bnd = np.nonzero(uid[1:] != uid[:-1])[0] + 1
        starts = np.concatenate(([0], bnd)) if len(uid) else np.empty(0, np.int64)
        ends = np.concatenate((bnd, [len(uid)])) if len(uid) else starts
        seglen = ends - starts
        out_a, out_b = [], []
        for k in np.unique(seglen):
            if k < 2:
                continue
            sel = starts[seglen == k]
            ia, ib = np.triu_indices(int(k), k=1)
            out_a.append(reg[(sel[:, None] + ia[None, :]).ravel()])
            out_b.append(reg[(sel[:, None] + ib[None, :]).ravel()])
        if out_a:
            ra = np.concatenate(out_a)
            rb = np.concatenate(out_b)
        else:
            ra = rb = np.empty(0, dtype=reg.dtype)
        loc = (
            pd.DataFrame({"region_a": ra, "region_b": rb})
            .groupby(["region_a", "region_b"], sort=False)
            .size()
            .reset_index(name="n_partial")
        )
        return loc

    parts = skinny.groupby("__ub").map_groups(pairs, batch_format="pandas")
    agg = partial_sum_groupby(
        parts, ["region_a", "region_b"], ["n_partial"], coalesce=4
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["region_a", "region_b", "n_users"])

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_region_coviz() -> str:
    from ..sources.regions import regions_parquet_path

    rsrc = f"read_parquet('{regions_parquet_path()}')"
    return f"""
WITH {_sql_event_pos()},
reg AS (
  SELECT p.user_id,
         coalesce((SELECT min(r.region_id) FROM {rsrc} r
                   WHERE r.kind = 'rect'
                     AND p.lon >= r.minx AND p.lon <= r.maxx
                     AND p.lat >= r.miny AND p.lat <= r.maxy), -1) AS region
  FROM pos p
),
u AS (SELECT DISTINCT user_id, region FROM reg WHERE region >= 0)
SELECT a.region AS region_a, b.region AS region_b, count(*) AS n_users
FROM u a JOIN u b ON a.user_id = b.user_id AND a.region < b.region
GROUP BY 1, 2
"""


# ---- round 4: CDC compaction / exact quantiles / funnel / cohort /
# ---- skyline (five new plan shapes over the events stream) ----------------


def q_upsert_latest(sf_dir: str):
    """CDC COMPACTION (upsert / SCD "keep latest"): reduce the event
    stream to the latest record per (user_id, event_type) key by
    (ts, event_id) order, then roll up per type. The canonical
    change-data-capture materialization step.

    Shape at 100 TB: per-BATCH latest (a vectorized lexsort + segment
    last — a combiner, since "latest" is associative), so only one
    skinny row per key per block crosses the wire; ONE 512-way user
    superbucket groupby resolves cross-block winners vectorized; the
    final per-type rollup is a tiny combiner groupby. Payloads (props)
    never shuffle."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id", "value"])

    def batch_latest(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        # dictionary codes, not boxed strings: the type column is only a
        # GROUPING key here (latest-per-key keeps the max (ts, eid) row
        # within each (user, type) run, so inter-type order is free)
        tcode, cats = _str_codes(batch["event_type"])
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.lexsort((eid, ts, tcode, uid))
        u, t = uid[order], tcode[order]
        last = np.nonzero((u[1:] != u[:-1]) | (t[1:] != t[:-1]))[0]
        keep = order[np.concatenate((last, [len(u) - 1]))] if len(u) else order
        return pa.table(
            {
                "user_id": pa.array(uid[keep], pa.int64()),
                "event_type": pa.array(cats[tcode[keep]], pa.string()),
                "ts_us": pa.array(ts[keep], pa.int64()),
                "event_id": pa.array(eid[keep], pa.int64()),
                "cents": pa.array(cents[keep], pa.int64()),
            }
        )

    skinny = ds.map_batches(
        batch_latest, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def bucket_latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "event_type", "ts_us", "event_id"], kind="stable"
        )
        uid = g["user_id"].to_numpy()
        typ = g["event_type"].to_numpy()
        last = np.nonzero((uid[1:] != uid[:-1]) | (typ[1:] != typ[:-1]))[0]
        keep = np.concatenate((last, [len(uid) - 1])) if len(uid) else []
        cents = g["cents"].to_numpy()[keep]
        return (
            pd.DataFrame({"event_type": typ[keep], "cents": cents})
            .groupby("event_type", sort=False)
            .agg(n_partial=("cents", "size"), cents=("cents", "sum"))
            .reset_index()
        )

    parts = skinny.groupby("__ub").map_groups(bucket_latest, batch_format="pandas")
    agg = partial_sum_groupby(
        parts, ["event_type"], ["n_partial", "cents"], coalesce=2
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["event_type", "n_keys", "sum_latest_cents"])

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_UPSERT_LATEST = """
WITH latest AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT)
         AS sum_latest_cents
FROM latest WHERE rn = 1
GROUP BY 1
"""


def q_grouped_median(sf_dir: str):
    """EXACT distributed quantile selection per group (p25/median/p75 of
    the cent-quantized value per event type) — the value-histogram
    selection pattern: a per-batch (group, value) count combiner folds
    the corpus to its DISTINCT-VALUE dimension, one skinny groupby merges
    the histograms, and the quantile pick runs on the tiny per-group
    sorted histogram. No sort of the corpus, no per-row shuffle; exact
    (discrete lower quantile, ceil(q*n)th smallest — DuckDB
    quantile_disc semantics) at any cluster size."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def skinnify(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"event_type": batch["event_type"], "cents": pa.array(cents)})

    hist = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["event_type", "cents"],
        [],
        count_alias="n",
        coalesce=4,
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents", kind="stable")
        n = g["n"].to_numpy()
        v = g["cents"].to_numpy()
        cum = np.cumsum(n)
        total = int(cum[-1])
        out = {"event_type": [g["event_type"].iloc[0]], "n": [total]}
        for name, q in (("p25_cents", 0.25), ("median_cents", 0.5), ("p75_cents", 0.75)):
            k = int(np.ceil(q * total))  # ceil(q*n)th smallest, 1-based
            out[name] = [int(v[np.searchsorted(cum, k)])]
        return pd.DataFrame(out)

    def pick_named(g: pd.DataFrame) -> pd.DataFrame:
        return pick(g)

    return hist.groupby("event_type").map_groups(pick_named, batch_format="pandas")


SQL_GROUPED_MEDIAN = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS cents FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       quantile_disc(cents, 0.25) AS p25_cents,
       quantile_disc(cents, 0.50) AS median_cents,
       quantile_disc(cents, 0.75) AS p75_cents
FROM c GROUP BY 1
"""


_FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel_conversion(sf_dir: str):
    """FUNNEL analysis (greedy earliest-match): a user converts through
    stage k when a view -> click -> purchase subsequence exists in
    strict (ts, event_id) order, matching each stage to its earliest
    qualifying event. Output: users reaching each stage.

    Shape at 100 TB: only funnel-stage rows leave the scan (skinny
    (user, stage, ts, id)); ONE 512-way user superbucket groupby; inside
    a bucket the greedy match is K vectorized passes (K = stages): per
    stage, a per-user masked minimum over the sorted segment — no
    per-user Python dispatch. Partial stage counts -> tiny combiner."""
    from ..stages.agg import partial_sum_groupby

    stages = _FUNNEL_STAGES
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def skinnify(batch: pa.Table) -> pa.Table:
        # per-DISTINCT-value stage map via dictionary codes (no boxing)
        tcode, cats = _str_codes(batch["event_type"])
        cat_stage = np.full(len(cats), -1, dtype=np.int64)
        for k, name in enumerate(stages):
            cat_stage[cats == name] = k
        stage = cat_stage[tcode]
        keep = stage >= 0
        return pa.table(
            {
                "user_id": pa.array(
                    batch["user_id"].to_numpy(zero_copy_only=False)[keep]
                ),
                "stage": pa.array(stage[keep]),
                "ts_us": pa.array(
                    batch["ts"]
                    .cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_numpy()[keep]
                ),
                "event_id": pa.array(
                    batch["event_id"].to_numpy(zero_copy_only=False)[keep]
                ),
            }
        )

    skinny = ds.map_batches(
        skinnify, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def match(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        stg = g["stage"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        users, inv = np.unique(uid, return_inverse=True)
        nu = len(users)
        # per-user frontier: the (ts, eid) of the last matched stage
        NEG = np.iinfo(np.int64).min // 2
        f_ts = np.full(nu, NEG, dtype=np.int64)
        f_id = np.full(nu, NEG, dtype=np.int64)
        alive = np.ones(nu, dtype=bool)
        counts = []
        for k in range(len(stages)):
            m = (
                (stg == k)
                & alive[inv]
                & (
                    (ts > f_ts[inv])
                    | ((ts == f_ts[inv]) & (eid > f_id[inv]))
                )
            )
            # earliest qualifying event per user: rows are (ts, eid)-sorted,
            # so the FIRST masked row per user wins
            idx = np.nonzero(m)[0]
            u_first, first_pos = np.unique(inv[idx], return_index=True)
            hit = idx[first_pos]
            new_alive = np.zeros(nu, dtype=bool)
            new_alive[inv[hit]] = True
            f_ts[inv[hit]] = ts[hit]
            f_id[inv[hit]] = eid[hit]
            alive = new_alive
            counts.append(int(alive.sum()))
        return pd.DataFrame(
            {"stage": np.arange(len(stages)), "n_partial": np.array(counts)}
        )

    parts = skinny.groupby("__ub").map_groups(match, batch_format="pandas")
    agg = partial_sum_groupby(parts, ["stage"], ["n_partial"], coalesce=2)

    def finish(batch: pa.Table) -> pa.Table:
        stage = batch["stage"].to_numpy(zero_copy_only=False)
        names = np.asarray(list(_FUNNEL_STAGES), dtype=object)
        return pa.table(
            {
                "stage": batch["stage"],
                "stage_type": pa.array(names[stage].tolist(), pa.string()),
                "n_users": batch["n_partial"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_funnel_conversion() -> str:
    stages = _FUNNEL_STAGES
    ctes = []
    prev = None
    for k, name in enumerate(stages):
        cond = f"e.event_type = '{name}'"
        if prev is not None:
            cond += (
                f" AND EXISTS (SELECT 1 FROM {prev} p WHERE p.user_id = e.user_id)"
            )
            cond_order = (
                f"(epoch_us(e.ts), e.event_id) > "
                f"(SELECT (p.ts_us, p.event_id) FROM {prev} p "
                f"WHERE p.user_id = e.user_id)"
            )
        ctes.append(
            f"""s{k} AS (
  SELECT user_id, ts_us, event_id FROM (
    SELECT e.user_id, epoch_us(e.ts) AS ts_us, e.event_id,
           row_number() OVER (PARTITION BY e.user_id
                              ORDER BY e.ts, e.event_id) AS rn
    FROM events e
    WHERE {cond}"""
            + (
                f"\n      AND {cond_order}"
                if prev is not None
                else ""
            )
            + """
  ) WHERE rn = 1
)"""
        )
        prev = f"s{k}"
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS stage, '{name}' AS stage_type, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM s{k}) AS n_users"
        for k, name in enumerate(stages)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


def q_cohort_retention(sf_dir: str):
    """COHORT RETENTION: users grouped by first-active epoch-week
    (cohort), counted per later active week offset — the
    (cohort x week) retention triangle.

    Shape at 100 TB: per-batch DISTINCT (user, week) combiner (weeks per
    user are tiny) -> one skinny groupby merges distincts; the per-user
    cohort min + offset expansion runs vectorized inside a 512-way user
    superbucket; final (cohort, offset) rollup is a combiner groupby on
    a weeks^2-bounded dimension table."""
    from ..stages.agg import partial_sum_groupby

    WEEK_US = 7 * 86400 * 1_000_000
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def skinnify(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        week = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // WEEK_US
        )
        t = pa.table({"user_id": pa.array(uid), "week": pa.array(week)})
        return t.group_by(["user_id", "week"]).aggregate([])

    uw = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["user_id", "week"],
        [],
        count_alias="__dup",
        coalesce=4,
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "week"], kind="stable")
        uid = g["user_id"].to_numpy()
        wk = g["week"].to_numpy()
        bnd = np.nonzero(uid[1:] != uid[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        cohort = np.repeat(wk[starts], np.diff(np.concatenate((starts, [len(uid)]))))
        return (
            pd.DataFrame({"cohort_week": cohort, "week_offset": wk - cohort})
            .groupby(["cohort_week", "week_offset"], sort=False)
            .size()
            .reset_index(name="n_partial")
        )

    parts = uw.groupby("__ub").map_groups(expand, batch_format="pandas")
    agg = partial_sum_groupby(
        parts, ["cohort_week", "week_offset"], ["n_partial"], coalesce=2
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["cohort_week", "week_offset", "n_users"])

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_COHORT_RETENTION = """
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events
),
c AS (
  SELECT user_id, week, min(week) OVER (PARTITION BY user_id) AS cw FROM uw
)
SELECT cw AS cohort_week, week - cw AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM c GROUP BY 1, 2
"""


def q_skyline_events(sf_dir: str):
    """SKYLINE (pareto front) of the event stream over (value cents,
    ts_us), both maximized: every event no other event dominates
    (>= on both dims, > on at least one). Ties: equal (cents, ts)
    pairs never dominate each other, so all copies survive.

    Shape at 100 TB: per-BLOCK local skyline (a vectorized sort +
    running-max scan — valid because dominance is transitive, so the
    global skyline is a subset of every covering block-skyline union);
    only block-skyline survivors (output-dimension rows) leave the
    scan; the exact final scan runs once on the union. No all-pairs
    work anywhere; worst case (fully anti-correlated dims) degrades to
    the true skyline size, which IS the output."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def _skyline_mask(cents: np.ndarray, ts: np.ndarray) -> np.ndarray:
        """Exact skyline membership, O(n log n): a point survives iff
        its ts strictly exceeds every ts at strictly higher cents AND
        equals the max ts within its own cents value."""
        if not len(cents):
            return np.zeros(0, dtype=bool)
        uc, inv = np.unique(cents, return_inverse=True)  # ascending
        gmax = np.full(len(uc), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(gmax, inv, ts)
        # running max of group-max ts over STRICTLY higher cents
        # (suffix[i] = max(gmax[i+1:]) via a reversed cummax, shifted)
        s = np.maximum.accumulate(gmax[::-1])[::-1]
        suffix = np.empty(len(uc), dtype=np.int64)
        suffix[:-1] = s[1:]
        suffix[-1] = np.iinfo(np.int64).min
        return (ts == gmax[inv]) & (ts > suffix[inv])

    def local(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        keep = _skyline_mask(cents, ts)
        return pa.table(
            {
                "event_id": pa.array(
                    batch["event_id"].to_numpy(zero_copy_only=False)[keep]
                ),
                "cents": pa.array(cents[keep]),
                "ts_us": pa.array(ts[keep]),
            }
        )

    cand = ds.map_batches(local, batch_format="pyarrow", batch_size=16384).to_pandas()
    keep = _skyline_mask(cand["cents"].to_numpy(), cand["ts_us"].to_numpy())
    out = cand.loc[keep].sort_values("event_id", kind="stable")
    return out.reset_index(drop=True)


SQL_SKYLINE_EVENTS = """
WITH p AS (
  SELECT event_id, CAST(floor(value * 100.0) AS BIGINT) AS cents,
         epoch_us(ts) AS ts_us
  FROM events
),
vg AS (SELECT cents, max(ts_us) AS mt FROM p GROUP BY cents),
vr AS (
  SELECT cents, mt,
         max(mt) OVER (ORDER BY cents DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS rm
  FROM vg
)
SELECT p.event_id, p.cents, p.ts_us
FROM p JOIN vr ON p.cents = vr.cents
WHERE p.ts_us = vr.mt AND (vr.rm IS NULL OR p.ts_us > vr.rm)
"""


def q_grouped_mode(sf_dir: str):
    """MODE per group (most frequent cent-quantized value per event
    type, smallest-value tie-break) — the categorical sibling of
    grouped_median, same value-histogram plan shape: (group, value)
    count combiner -> one skinny groupby -> argmax on the tiny
    per-group histogram."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def skinnify(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"event_type": batch["event_type"], "cents": pa.array(cents)})

    hist = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["event_type", "cents"],
        [],
        count_alias="n",
        coalesce=4,
    )

    def pick_mode(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "cents"], ascending=[False, True], kind="stable")
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "mode_cents": [int(g["cents"].iloc[0])],
                "n_mode": [int(g["n"].iloc[0])],
            }
        )

    return hist.groupby("event_type").map_groups(pick_mode, batch_format="pandas")


SQL_GROUPED_MODE = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS cents,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, cents AS mode_cents, CAST(n AS BIGINT) AS n_mode
FROM c
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY n DESC, cents ASC) = 1
"""


def q_tile_trend(sf_dir: str, zoom: int = 6):
    """Per-tile TEMPORAL TREND of event activity: exact-integer least
    squares slope of daily event counts per z-level tile (the
    growing/shrinking-hotspot monitor). The slope is emitted as the
    exact integer pair (num, den) of the closed-form LSQ solution
    num/den = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) over the tile's observed
    days — order-independent at any cluster size, and DuckDB recomputes
    it in plain BIGINT arithmetic.

    Shape at 100 TB: geotag + tile-assign stateless map -> (tile, day)
    count combiner -> per-row moment expansion -> second combiner
    groupby on the tile dimension. Two skinny exchanges, no
    map_groups."""
    from ..stages.agg import partial_sum_groupby
    from ..stages.tiles import encode_tiles

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    DAY_US = 86400 * 1_000_000

    def geotag(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, eid)
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        t = pa.table(
            {
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
                "day": pa.array(day, pa.int64()),
            }
        )
        return encode_tiles(t, "WebMercatorQuad", (zoom,), keep_columns=["day"])

    daily = partial_sum_groupby(
        ds.map_batches(geotag, batch_format="pyarrow", batch_size=16384),
        ["tile_x", "tile_y", "day"],
        [],
        count_alias="c",
        coalesce=4,
    )

    def moments(batch: pa.Table) -> pa.Table:
        day = batch["day"].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tile_x": batch["tile_x"],
                "tile_y": batch["tile_y"],
                "sx": pa.array(day),
                "sy": pa.array(c),
                "sxy": pa.array(day * c),
                "sxx": pa.array(day * day),
            }
        )

    agg = partial_sum_groupby(
        daily.map_batches(moments, batch_format="pyarrow"),
        ["tile_x", "tile_y"],
        ["sx", "sy", "sxy", "sxx"],
        count_alias="n_days",
        coalesce=4,
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_days"].to_numpy(zero_copy_only=False)
        sx = batch["sx"].to_numpy(zero_copy_only=False)
        sy = batch["sy"].to_numpy(zero_copy_only=False)
        sxy = batch["sxy"].to_numpy(zero_copy_only=False)
        sxx = batch["sxx"].to_numpy(zero_copy_only=False)
        keep = n >= 2
        return pa.table(
            {
                "tile_x": batch["tile_x"].filter(pa.array(keep)),
                "tile_y": batch["tile_y"].filter(pa.array(keep)),
                "n_days": pa.array(n[keep], pa.int64()),
                "slope_num": pa.array(
                    (n * sxy - sx * sy)[keep], pa.int64()
                ),
                "slope_den": pa.array(
                    (n * sxx - sx * sx)[keep], pa.int64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_tile_trend(tile_exprs: dict, zoom: int = 6) -> str:
    return f"""
WITH {_sql_event_pos()},
d AS (
  SELECT {tile_exprs['tx']} AS tile_x, {tile_exprs['ty']} AS tile_y,
         ts_us // 86400000000 AS day,
         count(*) AS c
  FROM pos
  WHERE {tile_exprs['valid']}
  GROUP BY 1, 2, 3
),
m AS (
  SELECT tile_x, tile_y, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(day) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy,
         CAST(sum(day * c) AS BIGINT) AS sxy,
         CAST(sum(day * day) AS BIGINT) AS sxx
  FROM d GROUP BY 1, 2
)
SELECT tile_x, tile_y, n_days,
       n_days * sxy - sx * sy AS slope_num,
       n_days * sxx - sx * sx AS slope_den
FROM m WHERE n_days >= 2
"""


def q_chi2_assoc(sf_dir: str):
    """CHI-SQUARE ASSOCIATION test between event_type and epoch-day-of-
    week (the categorical-drift / independence monitor): the full
    contingency table with each cell's exact observed count, expected-
    count numerator (row_total * col_total; expected = en_num / N) and
    fixed-point chi-square contribution term_fp =
    ((O*N - R*C)^2 * 10^6) // (R*C*N) — all integer, so the statistic
    is bit-identical at any cluster size and DuckDB recomputes it in
    HUGEINT.

    Shape at 100 TB: ONE (event_type, dow) count combiner — the corpus
    folds to the n_types x 7 contingency dimension before anything
    crosses the wire; the chi-square finish runs on that tiny table
    with Python ints (the (O*N - R*C)^2 intermediate exceeds int64)."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table(
            {
                "event_type": batch["event_type"],
                "dow": pa.array(day % 7, pa.int64()),
            }
        )

    cells = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["event_type", "dow"],
        [],
        count_alias="o",
        coalesce=4,
    )

    cdf = cells.to_pandas()  # contingency-dimension-sized (n_types x 7)
    row_tot = cdf.groupby("event_type")["o"].sum().to_dict()
    col_tot = cdf.groupby("dow")["o"].sum().to_dict()
    n_tot = int(cdf["o"].sum())
    out = {
        "event_type": cdf["event_type"].tolist(),
        "dow": cdf["dow"].astype("int64").tolist(),
        "o": cdf["o"].astype("int64").tolist(),
        "en_num": [],
        "term_fp": [],
    }
    for typ, dow, o in zip(out["event_type"], out["dow"], out["o"]):
        r, c = int(row_tot[typ]), int(col_tot[dow])
        dev = int(o) * n_tot - r * c  # exact Python int (can exceed int64 squared)
        out["en_num"].append(r * c)
        out["term_fp"].append((dev * dev * 1_000_000) // (r * c * n_tot))
    return pd.DataFrame(
        {
            "event_type": pd.Series(out["event_type"], dtype="object"),
            "dow": pd.Series(out["dow"], dtype="int64"),
            "o": pd.Series(out["o"], dtype="int64"),
            "en_num": pd.Series(out["en_num"], dtype="int64"),
            "term_fp": pd.Series(out["term_fp"], dtype="int64"),
        }
    )


SQL_CHI2_ASSOC = """
WITH c AS (
  SELECT event_type, (epoch_us(ts) // 86400000000) % 7 AS dow,
         count(*) AS o
  FROM events GROUP BY 1, 2
),
r AS (SELECT event_type, sum(o) AS rt FROM c GROUP BY 1),
k AS (SELECT dow, sum(o) AS ct FROM c GROUP BY 1),
n AS (SELECT sum(o) AS nt FROM c)
SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow, CAST(c.o AS BIGINT) AS o,
       CAST(r.rt * k.ct AS BIGINT) AS en_num,
       CAST(
         ((CAST(c.o AS HUGEINT) * n.nt - CAST(r.rt AS HUGEINT) * k.ct)
          * (CAST(c.o AS HUGEINT) * n.nt - CAST(r.rt AS HUGEINT) * k.ct)
          * 1000000)
         // (CAST(r.rt AS HUGEINT) * k.ct * n.nt)
         AS BIGINT) AS term_fp
FROM c JOIN r ON c.event_type = r.event_type
       JOIN k ON c.dow = k.dow
       CROSS JOIN n
"""


def q_changepoint_days(sf_dir: str):
    """CUSUM CHANGEPOINT per event_type over its daily-count series
    (the level-shift detector): for each type the split day k*
    maximizing |S_k| where S_k = n * prefix_k - k * total over the
    day-ordered counts (the exact-integer reformulation of the
    classic mean-shift CUSUM — S_k/n = prefix_k - k*mean). Earliest
    day wins ties; the changepoint is AFTER split_day.

    Shape at 100 TB: ONE (event_type, day) count combiner folds the
    corpus to the types x days dimension; the argmax scan runs
    driver-side on that tiny table."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table(
            {"event_type": batch["event_type"], "day": pa.array(day, pa.int64())}
        )

    daily = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["event_type", "day"],
        [],
        count_alias="c",
        coalesce=4,
    )

    ddf = daily.to_pandas()  # types x days dimension
    rows = {"event_type": [], "n_days": [], "split_day": [], "s_max": [], "s_abs": []}
    for typ, g in ddf.groupby("event_type"):
        g = g.sort_values("day")
        day = g["day"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        n = len(day)
        if n < 2:
            continue
        pre = np.cumsum(c)
        tot = int(pre[-1])
        k = np.arange(1, n + 1, dtype=np.int64)
        s = (n * pre - k * tot)[:-1]  # k = 1..n-1 (a split needs both sides)
        i = int(np.lexsort((day[:-1], -np.abs(s)))[0])
        rows["event_type"].append(typ)
        rows["n_days"].append(n)
        rows["split_day"].append(int(day[i]))
        rows["s_max"].append(int(s[i]))
        rows["s_abs"].append(int(abs(s[i])))
    return pd.DataFrame(
        {
            "event_type": pd.Series(rows["event_type"], dtype="object"),
            "n_days": pd.Series(rows["n_days"], dtype="int64"),
            "split_day": pd.Series(rows["split_day"], dtype="int64"),
            "s_max": pd.Series(rows["s_max"], dtype="int64"),
            "s_abs": pd.Series(rows["s_abs"], dtype="int64"),
        }
    )


SQL_CHANGEPOINT_DAYS = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS c
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, day,
         sum(c) OVER (PARTITION BY event_type ORDER BY day) AS pre,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(c) OVER (PARTITION BY event_type) AS tot
  FROM d
),
s AS (
  SELECT event_type, day, CAST(n AS BIGINT) AS n_days,
         CAST(n * pre - k * tot AS BIGINT) AS s
  FROM w WHERE k < n AND n >= 2
)
SELECT event_type, n_days, day AS split_day, s AS s_max, abs(s) AS s_abs
FROM s
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY abs(s) DESC, day ASC) = 1
"""


def q_acf_daily(sf_dir: str, max_lag: int = 3):
    """LAG-k AUTOCORRELATION moments of the global daily event-count
    series (the seasonality probe): for each lag L in 1..max_lag, the
    exact integer moment sums (n_pairs, sx, sy, sxy, sxx, syy) over
    day pairs (d, d+L) both observed — the Pearson ACF is
    (n*sxy - sx*sy) / sqrt((n*sxx - sx^2) (n*syy - sy^2)) downstream;
    emitting the moments keeps every byte exactly recomputable.

    Shape at 100 TB: ONE day count combiner folds the corpus to the
    day dimension; the lag self-join runs driver-side on it."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["ts"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table({"day": pa.array(day, pa.int64())})

    daily = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["day"],
        [],
        count_alias="c",
        coalesce=4,
    )

    ddf = daily.to_pandas().sort_values("day")  # day-dimension
    day = ddf["day"].to_numpy().astype(np.int64)
    c = ddf["c"].to_numpy().astype(np.int64)
    pos = {int(d): i for i, d in enumerate(day)}
    rows = {k: [] for k in ("lag_d", "n_pairs", "sx", "sy", "sxy", "sxx", "syy")}
    for lag in range(1, max_lag + 1):
        idx = [(i, pos[int(d) + lag]) for i, d in enumerate(day) if int(d) + lag in pos]
        if not idx:
            continue
        a = c[[i for i, _ in idx]]
        b = c[[j for _, j in idx]]
        rows["lag_d"].append(lag)
        rows["n_pairs"].append(len(idx))
        rows["sx"].append(int(a.sum()))
        rows["sy"].append(int(b.sum()))
        rows["sxy"].append(int((a * b).sum()))
        rows["sxx"].append(int((a * a).sum()))
        rows["syy"].append(int((b * b).sum()))
    return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in rows.items()})


SQL_ACF_DAILY = """
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
  FROM events GROUP BY 1
),
l(lag_d) AS (VALUES (1), (2), (3))
SELECT CAST(l.lag_d AS BIGINT) AS lag_d,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(a.c) AS BIGINT) AS sx, CAST(sum(b.c) AS BIGINT) AS sy,
       CAST(sum(a.c * b.c) AS BIGINT) AS sxy,
       CAST(sum(a.c * a.c) AS BIGINT) AS sxx,
       CAST(sum(b.c * b.c) AS BIGINT) AS syy
FROM l CROSS JOIN d a JOIN d b ON b.day = a.day + l.lag_d
GROUP BY 1
"""


def _cents_hist(sf_dir: str):
    """Shared prelude of the two-sample rank/CDF tests: the
    (event_type, cents) count histogram — the corpus folds to the
    value dimension before anything crosses the wire."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def skinnify(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {"event_type": batch["event_type"], "cents": pa.array(cents)}
        )

    return partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["event_type", "cents"],
        [],
        count_alias="n",
        coalesce=4,
    )


def q_mannwhitney_u(sf_dir: str):
    """MANN-WHITNEY U rank-sum test, one-vs-rest per event_type (the
    nonparametric does-this-group's-value-distribution-differ monitor):
    doubled tie-averaged ranks over the GLOBAL combined sample
    (rank2(v) = 2*cum_less(v) + tie_count(v) + 1, always integer), per
    type the doubled rank sum r2_sum = sum n_t(v) * rank2(v) and
    u2 = 2*U = r2_sum - n_t*(n_t + 1).

    Shape at 100 TB: ONE (type, cents) count combiner; ranking runs
    driver-side on the value-dimension histogram with Python ints
    (r2_sum ~ n_t * 2N exceeds int64 beyond ~10^9 rows)."""
    hist = _cents_hist(sf_dir)
    hdf = hist.to_pandas()  # value-dimension-sized
    per_v = hdf.groupby("cents")["n"].sum().sort_index()
    vals = per_v.index.to_numpy()
    cnt = per_v.to_numpy().astype(np.int64)
    cumlt = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    rank2 = {int(v): 2 * int(l) + int(c) + 1 for v, l, c in zip(vals, cumlt, cnt)}
    rows = {"event_type": [], "n_t": [], "r2_sum": [], "u2": []}
    for typ, g in hdf.groupby("event_type"):
        n_t = int(g["n"].sum())
        r2 = sum(int(n) * rank2[int(v)] for v, n in zip(g["cents"], g["n"]))
        rows["event_type"].append(typ)
        rows["n_t"].append(n_t)
        rows["r2_sum"].append(r2)
        rows["u2"].append(r2 - n_t * (n_t + 1))
    return pd.DataFrame(
        {
            "event_type": pd.Series(rows["event_type"], dtype="object"),
            "n_t": pd.Series(rows["n_t"], dtype="int64"),
            "r2_sum": pd.Series(rows["r2_sum"], dtype="int64"),
            "u2": pd.Series(rows["u2"], dtype="int64"),
        }
    )


SQL_MANNWHITNEY_U = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS cents,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
v AS (SELECT cents, sum(n) AS cnt FROM c GROUP BY 1),
w AS (
  SELECT cents, cnt,
         sum(cnt) OVER (ORDER BY cents) - cnt AS cumlt
  FROM v
)
SELECT c.event_type,
       CAST(sum(c.n) AS BIGINT) AS n_t,
       CAST(sum(c.n * (2 * w.cumlt + w.cnt + 1)) AS BIGINT) AS r2_sum,
       CAST(sum(c.n * (2 * w.cumlt + w.cnt + 1))
            - sum(c.n) * (sum(c.n) + 1) AS BIGINT) AS u2
FROM c JOIN w ON c.cents = w.cents
GROUP BY 1
"""


def q_ks_stat(sf_dir: str):
    """KOLMOGOROV-SMIRNOV statistic, one-vs-rest per event_type (the
    distribution-drift detector): D = max_v |F_t(v) - F_rest(v)| held
    exactly as the integer numerator d_num = max |cum_t(v) * n_rest -
    cum_rest(v) * n_t| over the common denominator n_t * n_rest, plus
    the smallest cents value attaining it.

    Shape at 100 TB: ONE (type, cents) count combiner; the CDF scan
    runs driver-side on the value-dimension histogram."""
    hist = _cents_hist(sf_dir)
    hdf = hist.to_pandas()
    piv = (
        hdf.pivot_table(index="cents", columns="event_type", values="n",
                        aggfunc="sum", fill_value=0)
        .sort_index()
    )
    vals = piv.index.to_numpy()
    rows = {"event_type": [], "n_t": [], "n_rest": [], "d_num": [], "at_cents": []}
    total = int(piv.to_numpy().sum())
    cum_all = piv.to_numpy().astype(np.int64).sum(axis=1).cumsum()
    for typ in piv.columns:
        c_t = piv[typ].to_numpy().astype(np.int64)
        n_t = int(c_t.sum())
        n_r = total - n_t
        cum_t = np.cumsum(c_t)
        cum_r = cum_all - cum_t
        dn = np.abs(cum_t * n_r - cum_r * n_t)
        i = int(np.lexsort((vals, -dn))[0])
        rows["event_type"].append(typ)
        rows["n_t"].append(n_t)
        rows["n_rest"].append(n_r)
        rows["d_num"].append(int(dn[i]))
        rows["at_cents"].append(int(vals[i]))
    return pd.DataFrame(
        {
            "event_type": pd.Series(rows["event_type"], dtype="object"),
            "n_t": pd.Series(rows["n_t"], dtype="int64"),
            "n_rest": pd.Series(rows["n_rest"], dtype="int64"),
            "d_num": pd.Series(rows["d_num"], dtype="int64"),
            "at_cents": pd.Series(rows["at_cents"], dtype="int64"),
        }
    )


SQL_KS_STAT = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS cents,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
v AS (SELECT DISTINCT cents FROM c),
t AS (SELECT event_type, sum(n) AS n_t FROM c GROUP BY 1),
tot AS (SELECT sum(n) AS nt FROM c),
g AS (
  SELECT t.event_type, v.cents, COALESCE(c.n, 0) AS n
  FROM t CROSS JOIN v
  LEFT JOIN c ON c.event_type = t.event_type AND c.cents = v.cents
),
w AS (
  SELECT event_type, cents,
         sum(n) OVER (PARTITION BY event_type ORDER BY cents) AS cum_t
  FROM g
),
a AS (
  SELECT cents, sum(n) AS cn FROM g GROUP BY 1
),
aw AS (
  SELECT cents, sum(cn) OVER (ORDER BY cents) AS cum_all FROM a
),
d AS (
  SELECT w.event_type, w.cents, t.n_t,
         tot.nt - t.n_t AS n_rest,
         CAST(abs(w.cum_t * (tot.nt - t.n_t)
                  - (aw.cum_all - w.cum_t) * t.n_t) AS BIGINT) AS dn
  FROM w JOIN aw ON w.cents = aw.cents
         JOIN t ON w.event_type = t.event_type
         CROSS JOIN tot
)
SELECT event_type, CAST(n_t AS BIGINT) AS n_t,
       CAST(n_rest AS BIGINT) AS n_rest,
       dn AS d_num, cents AS at_cents
FROM d
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY dn DESC, cents ASC) = 1
"""


# lcm(1..29): every pair-gap <= 29 days divides it, so num * L / den is an
# exact integer slope key (the windowed Theil-Sen trick).
_TS_LCM = 2329089562800
_TS_MAX_GAP = 29


def q_theil_sen_daily(sf_dir: str):
    """WINDOWED THEIL-SEN robust trend per event_type (the
    outlier-immune alternative to the LSQ slope of tile_trend): the
    exact lower-median of all pairwise daily-count slopes with day gap
    <= 29, each slope held exactly as slope_lkey = (c_j - c_i) * L //
    (d_j - d_i) with L = lcm(1..29) — the gap always divides L, so the
    key IS the L-scaled slope and median selection is exact (no float
    comparisons anywhere).

    Shape at 100 TB: ONE (type, day) count combiner; the O(days^2)
    pair scan runs driver-side on the types x days dimension (the
    30-day window bounds pairs at 435 per type regardless of corpus
    size)."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table(
            {"event_type": batch["event_type"], "day": pa.array(day, pa.int64())}
        )

    daily = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["event_type", "day"],
        [],
        count_alias="c",
        coalesce=4,
    )

    ddf = daily.to_pandas()
    rows = {"event_type": [], "n_pairs": [], "slope_lkey": []}
    for typ, g in ddf.groupby("event_type"):
        g = g.sort_values("day")
        day = g["day"].to_numpy().astype(np.int64)
        c = [int(x) for x in g["c"]]
        keys = []
        for i in range(len(day)):
            for j in range(i + 1, len(day)):
                gap = int(day[j] - day[i])
                if gap <= _TS_MAX_GAP:
                    keys.append((c[j] - c[i]) * _TS_LCM // gap)
        if not keys:
            continue
        keys.sort()
        rows["event_type"].append(typ)
        rows["n_pairs"].append(len(keys))
        rows["slope_lkey"].append(keys[(len(keys) - 1) // 2])
    return pd.DataFrame(
        {
            "event_type": pd.Series(rows["event_type"], dtype="object"),
            "n_pairs": pd.Series(rows["n_pairs"], dtype="int64"),
            "slope_lkey": pd.Series(rows["slope_lkey"], dtype="int64"),
        }
    )


SQL_THEIL_SEN_DAILY = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS c
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT a.event_type,
         (CAST(b.c AS BIGINT) - a.c) * {_TS_LCM} // (b.day - a.day) AS k
  FROM d a JOIN d b
    ON a.event_type = b.event_type
   AND b.day > a.day AND b.day - a.day <= {_TS_MAX_GAP}
)
SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
       CAST(k AS BIGINT) AS slope_lkey
FROM (
  SELECT event_type, k,
         row_number() OVER (PARTITION BY event_type ORDER BY k) AS rk,
         count(*) OVER (PARTITION BY event_type) AS np
  FROM p
)
WHERE rk = (np + 1) // 2
"""


def q_agg_rollup(sf_dir: str):
    """ROLLUP / GROUPING-SETS aggregation over lineitem
    ((flag, status) -> (flag) -> ()), the OLAP cube primitive: one
    distributed combiner pass at the FINEST grain, then the coarser
    levels derive from that tiny grain driver-side — never re-scan the
    corpus per level. Rolled-up dimensions carry the 'ALL' sentinel
    (not NULL) so the typed hash is unambiguous."""
    fine = q_agg_pricing(sf_dir).to_pandas()  # finest-grain dimension table
    fine = fine[
        ["l_returnflag", "l_linestatus", "n", "qty_cents", "price_cents"]
    ].copy()
    lvl1 = (
        fine.groupby("l_returnflag", as_index=False)[
            ["n", "qty_cents", "price_cents"]
        ]
        .sum()
    )
    lvl1["l_linestatus"] = "ALL"
    lvl0 = fine[["n", "qty_cents", "price_cents"]].sum().to_frame().T
    lvl0["l_returnflag"] = "ALL"
    lvl0["l_linestatus"] = "ALL"
    cols = ["l_returnflag", "l_linestatus", "n", "qty_cents", "price_cents"]
    out = pd.concat([fine[cols], lvl1[cols], lvl0[cols]], ignore_index=True)
    for c in ("n", "qty_cents", "price_cents"):
        out[c] = out[c].astype("int64")
    return out


SQL_AGG_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(trunc(l_quantity * 100.0) AS BIGINT)) AS BIGINT)
         AS qty_cents,
       CAST(sum(CAST(trunc(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


_SWEEP_DUR_US = 300 * 1_000_000  # each event spans [ts, ts + 5 min)
_SWEEP_PART_US = 6 * 3600 * 1_000_000  # time-keyed partition (6 h)


def _sweep_deltas(sf_dir: str):
    """Shared prelude of the sweep-line pair: (part, t, d) delta rows,
    two per event (+1 at ts, -1 at ts + 5 min), partition keyed by
    time so no global sort is ever needed — the scan decomposes into
    per-partition kernels + a driver exclusive scan over the tiny
    partition-sums table (the pack_sequences pattern)."""
    ds = _read(sf_dir, "events", ["ts"])

    def deltas(batch: pa.Table) -> pa.Table:
        t0 = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        t = np.concatenate([t0, t0 + _SWEEP_DUR_US])
        d = np.concatenate(
            [np.ones(len(t0), dtype=np.int64), -np.ones(len(t0), dtype=np.int64)]
        )
        return pa.table(
            {
                "part": pa.array(t // _SWEEP_PART_US),
                "t": pa.array(t),
                "d": pa.array(d),
            }
        )

    return ds.map_batches(deltas, batch_format="pyarrow", batch_size=16384)


def _sweep_offsets(deltas):
    """Pass 1: per-partition net sums -> driver exclusive scan.
    Returns (offsets dict, ordered part ids)."""
    from ..stages.agg import partial_sum_groupby

    sums = (
        partial_sum_groupby(deltas, ["part"], ["d"], coalesce=4)
        .to_pandas()
        .sort_values("part")  # partition-dimension rows only
    )
    parts = sums["part"].to_numpy()
    offs = np.concatenate(([0], np.cumsum(sums["d"].to_numpy())[:-1]))
    return dict(zip(parts.tolist(), offs.tolist())), parts.tolist()


def q_max_concurrency(sf_dir: str):
    """MAX CONCURRENCY sweep-line (peak simultaneous activity — the
    capacity-planning statistic): with each event open for 5 minutes,
    the maximum number simultaneously open and the earliest time it is
    reached. Exact integers; per-unique-t collapsed actives equal the
    row-level maximum because -1 deltas sort before +1 at equal t
    (half-open intervals).

    Shape at 100 TB: delta rows are 24-byte ints, time-keyed
    partitions scan independently (pass 1 net sums -> driver exclusive
    scan -> pass 2 per-partition vectorized max with its broadcast
    offset); nothing is globally sorted."""
    deltas = _sweep_deltas(sf_dir).materialize()
    offsets, _ = _sweep_offsets(deltas)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        off = offsets[int(g["part"].iloc[0])]
        per_t = g.groupby("t")["d"].sum().sort_index()
        cum = off + per_t.cumsum().to_numpy()
        i = int(np.lexsort((per_t.index.to_numpy(), -cum))[0])
        return pd.DataFrame(
            {
                "local_max": [int(cum[i])],
                "at_t": [int(per_t.index[i])],
            }
        )

    per_part = (
        deltas.groupby("part").map_groups(kernel, batch_format="pandas")
    ).to_pandas()  # partition-dimension
    i = int(np.lexsort((per_part["at_t"].to_numpy(), -per_part["local_max"].to_numpy()))[0])
    return pd.DataFrame(
        {
            "max_active": pd.Series([int(per_part["local_max"].iloc[i])], dtype="int64"),
            "at_us": pd.Series([int(per_part["at_t"].iloc[i])], dtype="int64"),
        }
    )


SQL_MAX_CONCURRENCY = f"""
WITH dl AS (
  SELECT epoch_us(ts) AS t, 1 AS d FROM events
  UNION ALL
  SELECT epoch_us(ts) + {_SWEEP_DUR_US}, -1 FROM events
),
g AS (SELECT t, sum(d) AS net FROM dl GROUP BY 1),
c AS (SELECT t, sum(net) OVER (ORDER BY t) AS active FROM g)
SELECT CAST(active AS BIGINT) AS max_active, t AS at_us
FROM c
QUALIFY row_number() OVER (ORDER BY active DESC, t ASC) = 1
"""


def q_interval_union_len(sf_dir: str):
    """INTERVAL-UNION LENGTH sweep-line (total wall-clock covered by at
    least one open event — the utilisation statistic): same 5-minute
    intervals, exact microsecond union length. Per-partition covered
    time uses the broadcast entry offset; gaps BETWEEN partitions are
    covered iff the carried active count is positive (assembled on the
    partition-dimension table driver-side)."""
    deltas = _sweep_deltas(sf_dir).materialize()
    offsets, _ = _sweep_offsets(deltas)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        off = offsets[int(g["part"].iloc[0])]
        per_t = g.groupby("t")["d"].sum().sort_index()
        t = per_t.index.to_numpy()
        cum = off + per_t.cumsum().to_numpy()
        covered = int(((t[1:] - t[:-1]) * (cum[:-1] > 0)).sum()) if len(t) > 1 else 0
        return pd.DataFrame(
            {
                "part": [int(g["part"].iloc[0])],
                "first_t": [int(t[0])],
                "last_t": [int(t[-1])],
                "end_active": [int(cum[-1])],
                "covered": [covered],
            }
        )

    import pyarrow.parquet as pq

    pp = (
        deltas.groupby("part").map_groups(kernel, batch_format="pandas")
    ).to_pandas().sort_values("part")  # partition-dimension
    total = int(pp["covered"].sum())
    # cross-partition gaps: covered iff the carried active is positive
    for i in range(len(pp) - 1):
        if int(pp["end_active"].iloc[i]) > 0:
            total += int(pp["first_t"].iloc[i + 1]) - int(pp["last_t"].iloc[i])
    n = int(pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id"]).num_rows)
    return pd.DataFrame(
        {
            "union_us": pd.Series([total], dtype="int64"),
            "n_intervals": pd.Series([n], dtype="int64"),
        }
    )


SQL_INTERVAL_UNION_LEN = f"""
WITH dl AS (
  SELECT epoch_us(ts) AS t, 1 AS d FROM events
  UNION ALL
  SELECT epoch_us(ts) + {_SWEEP_DUR_US}, -1 FROM events
),
g AS (SELECT t, sum(d) AS net FROM dl GROUP BY 1),
c AS (
  SELECT t, sum(net) OVER (ORDER BY t) AS active,
         lead(t) OVER (ORDER BY t) AS nxt
  FROM g
)
SELECT CAST(sum(CASE WHEN active > 0 AND nxt IS NOT NULL THEN nxt - t
                     ELSE 0 END) AS BIGINT) AS union_us,
       (SELECT count(*) FROM events) AS n_intervals
FROM c
"""


def q_triangle_regions(sf_dir: str):
    """TRIANGLE COUNTING on the region co-visitation graph (the graph-
    motif / community-density primitive, completing the graph family:
    components, pagerank, BFS, cost-distance): regions are vertices,
    an edge joins two regions some user visited both of; per region,
    the number of triangles it participates in.

    Shape at 100 TB: the edge list comes from the coviz machinery
    (exchange carries (user, region) int rows; output regions^2-
    bounded); the triangle enumeration runs driver-side on that
    dimension-bounded adjacency. Exact SQL oracle via ordered triple
    join."""
    edges = q_region_coviz(sf_dir).to_pandas()  # regions^2-bounded
    adj: dict[int, set] = {}
    for a, b in zip(edges["region_a"], edges["region_b"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    tri: dict[int, int] = {}
    for a, b in zip(edges["region_a"], edges["region_b"]):
        a, b = int(a), int(b)
        for c in adj[a] & adj[b]:
            if a < b < c:
                for v in (a, b, c):
                    tri[v] = tri.get(v, 0) + 1
    items = sorted(tri.items())
    return pd.DataFrame(
        {
            "region_id": pd.Series([k for k, _ in items], dtype="int64"),
            "n_tri": pd.Series([v for _, v in items], dtype="int64"),
        }
    )


def sql_triangle_regions() -> str:
    from ..sources.regions import regions_parquet_path

    rsrc = f"read_parquet('{regions_parquet_path()}')"
    return f"""
WITH {_sql_event_pos()},
reg AS (
  SELECT p.user_id,
         coalesce((SELECT min(r.region_id) FROM {rsrc} r
                   WHERE r.kind = 'rect'
                     AND p.lon >= r.minx AND p.lon <= r.maxx
                     AND p.lat >= r.miny AND p.lat <= r.maxy), -1) AS region
  FROM pos p
),
u AS (SELECT DISTINCT user_id, region FROM reg WHERE region >= 0),
e AS (
  SELECT DISTINCT a.region AS ra, b.region AS rb
  FROM u a JOIN u b ON a.user_id = b.user_id AND a.region < b.region
),
t AS (
  SELECT e1.ra AS a, e1.rb AS b, e2.rb AS c
  FROM e e1 JOIN e e2 ON e2.ra = e1.rb
            JOIN e e3 ON e3.ra = e1.ra AND e3.rb = e2.rb
),
m AS (
  SELECT a AS region_id FROM t
  UNION ALL SELECT b FROM t
  UNION ALL SELECT c FROM t
)
SELECT CAST(region_id AS BIGINT) AS region_id,
       CAST(count(*) AS BIGINT) AS n_tri
FROM m GROUP BY 1
"""


def q_benford_digits(sf_dir: str):
    """LEADING-DIGIT (Benford) distribution of positive cent values per
    event_type — the fraud / synthetic-data smell test: observed count
    per leading digit 1..9, exact integers.

    Shape at 100 TB: ONE (type, digit) count combiner; the leading
    digit is a vectorized integer divide-down (no string ops)."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def skinnify(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        keep = cents > 0
        d = cents[keep]
        while (d >= 10).any():
            big = d >= 10
            d[big] //= 10
        return pa.table(
            {
                "event_type": batch["event_type"].filter(pa.array(keep)),
                "digit": pa.array(d),
            }
        )

    return partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["event_type", "digit"],
        [],
        count_alias="n",
        coalesce=4,
    )


SQL_BENFORD_DIGITS = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS cents
  FROM events
)
SELECT event_type,
       CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       CAST(count(*) AS BIGINT) AS n
FROM c WHERE cents > 0
GROUP BY 1, 2
"""


def q_grouped_mad(sf_dir: str):
    """MEDIAN ABSOLUTE DEVIATION per group (the robust dispersion
    statistic — stddev without outlier sensitivity): per event_type the
    exact discrete median of cents AND the exact median of
    |cents - median| — BOTH selections run on the same per-group value
    histogram (the grouped_median plan shape), so the corpus folds to
    its distinct-value dimension once and never re-shuffles for the
    second pass."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def skinnify(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"event_type": batch["event_type"], "cents": pa.array(cents)})

    hist = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["event_type", "cents"],
        [],
        count_alias="n",
        coalesce=4,
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents", kind="stable")
        n = g["n"].to_numpy()
        v = g["cents"].to_numpy()
        cum = np.cumsum(n)
        total = int(cum[-1])
        # ceil(0.5*total)th smallest == quantile_disc(0.5)
        k = -(-total // 2)
        med = int(v[np.searchsorted(cum, k)])
        dev = np.abs(v - med)
        order = np.argsort(dev, kind="stable")
        dcum = np.cumsum(n[order])
        mad = int(dev[order][np.searchsorted(dcum, k)])
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [total],
                "median_cents": [med],
                "mad_cents": [mad],
            }
        )

    return hist.groupby("event_type").map_groups(pick, batch_format="pandas")


SQL_GROUPED_MAD = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS cents FROM events
),
m AS (SELECT event_type, quantile_disc(cents, 0.5) AS med FROM c GROUP BY 1)
SELECT c.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(m.med AS BIGINT) AS median_cents,
       CAST(quantile_disc(abs(c.cents - m.med), 0.5) AS BIGINT) AS mad_cents
FROM c JOIN m ON c.event_type = m.event_type
GROUP BY 1, 3
"""


def q_trimmed_mean(sf_dir: str, trim_pct: int = 10):
    """TRIMMED MEAN per group (outlier-clipped average): drop the
    lowest and highest floor(n * trim_pct / 100) values, emit the
    exact integer (sum_kept_cents, n_kept) pair — the mean is the
    ratio downstream. Selection runs on the per-group value histogram:
    each distinct value keeps the overlap of its cumulative span with
    the kept rank band [k+1, n-k], so no corpus sort and no per-row
    shuffle."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def skinnify(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"event_type": batch["event_type"], "cents": pa.array(cents)})

    hist = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["event_type", "cents"],
        [],
        count_alias="n",
        coalesce=4,
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents", kind="stable")
        n = g["n"].to_numpy()
        v = g["cents"].to_numpy()
        cum = np.cumsum(n)
        total = int(cum[-1])
        k = total * trim_pct // 100
        lo_rank, hi_rank = k, total - k  # keep ranks (k, total-k]
        prev = np.concatenate(([0], cum[:-1]))
        kept = np.maximum(
            0, np.minimum(cum, hi_rank) - np.maximum(prev, lo_rank)
        )
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [total],
                "n_kept": [int(kept.sum())],
                "sum_kept_cents": [int((kept * v).sum())],
            }
        )

    return hist.groupby("event_type").map_groups(pick, batch_format="pandas")


SQL_TRIMMED_MEAN = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS cents,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, cents, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM c
),
k AS (
  SELECT event_type, cents, n, cum, total,
         total * 10 // 100 AS lo_rank, total - total * 10 // 100 AS hi_rank,
         cum - n AS prev
  FROM w
)
SELECT event_type, CAST(max(total) AS BIGINT) AS n,
       CAST(sum(greatest(0, least(cum, hi_rank) - greatest(prev, lo_rank)))
            AS BIGINT) AS n_kept,
       CAST(sum(greatest(0, least(cum, hi_rank) - greatest(prev, lo_rank))
                * cents) AS BIGINT) AS sum_kept_cents
FROM k GROUP BY 1
"""


_SHARD_N = 8
_SHARD_VNODES = 64


def _shard_ring():
    """Deterministic consistent-hash ring: _SHARD_VNODES virtual nodes
    per shard, position = fold-hash of shard * 1009 + vnode * 9176569
    (mod 2^31). Sorted (pos, shard) arrays for searchsorted assignment."""
    ids = np.array(
        [s * 1009 + v * 9176569 for s in range(_SHARD_N) for v in range(_SHARD_VNODES)],
        dtype=np.int64,
    )
    pos = _fold_hash(ids, 1 << 31)
    shard = np.repeat(np.arange(_SHARD_N, dtype=np.int64), _SHARD_VNODES)
    order = np.argsort(pos, kind="stable")
    return pos[order], shard[order]


def q_shard_assign(sf_dir: str):
    """CONSISTENT-HASH SHARD ASSIGNMENT (the data-placement primitive —
    how a 256-node cluster decides ownership without a directory): each
    user hashes onto a 2^31 ring, owned by the clockwise-next virtual
    node of 8 shards x 64 vnodes; per shard, the distinct-user and
    event loads. Ring positions use the engine-mirrorable fold hash, so
    DuckDB recomputes the exact assignment.

    Shape at 100 TB: the ring is broadcast (tiny), assignment is a
    stateless searchsorted map, loads are ONE combiner groupby."""
    from ..stages.agg import partial_sum_groupby

    ring_pos, ring_shard = _shard_ring()
    ds = _read(sf_dir, "events", ["user_id"])

    def assign(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        h = _fold_hash(uid, 1 << 31)
        i = np.searchsorted(ring_pos, h, side="left") % len(ring_pos)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "shard": pa.array(ring_shard[i], pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Sum

    tagged = ds.map_batches(assign, batch_format="pyarrow", batch_size=16384)

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = batch.append_column(
            "__one", pa.array(np.ones(batch.num_rows, dtype=np.int64))
        )
        g = t.group_by(["shard", "user_id"]).aggregate([("__one", "sum")])
        return g.rename_columns(["shard", "user_id", "n_ev"])

    # per-batch combiner, then the Ray sort-based groupby for the
    # unbounded (shard, user) key space, then a tiny per-shard rollup
    pairs = tagged.map_batches(pair_partial, batch_format="pyarrow")
    merged = pairs.groupby(["shard", "user_id"]).aggregate(
        Sum("n_ev", alias_name="n_ev")
    )
    return merged.groupby("shard").aggregate(
        Count(alias_name="n_users"), Sum("n_ev", alias_name="n_events")
    )


def sql_shard_assign() -> str:
    pos, shard = _shard_ring()
    vals = ", ".join(f"({int(p)}, {int(s)})" for p, s in zip(pos, shard))
    return f"""
WITH ring(pos, shard) AS (VALUES {vals}),
u AS (
  SELECT user_id, ((user_id & 2147483647) * 2654435761) % 2147483648 AS h,
         count(*) AS n_ev
  FROM events GROUP BY 1, 2
),
a AS (
  SELECT u.user_id, u.n_ev,
         coalesce(
           (SELECT r.shard FROM ring r WHERE r.pos >= u.h
            ORDER BY r.pos, r.shard LIMIT 1),
           (SELECT r.shard FROM ring r ORDER BY r.pos, r.shard LIMIT 1)
         ) AS shard
  FROM u
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n_ev) AS BIGINT) AS n_events
FROM a GROUP BY 1
"""


def q_k_anon_tiles(sf_dir: str, zoom: int = 8, k: int = 5):
    """K-ANONYMITY TILE PUBLICATION (the privacy-preserving aggregation
    gate): per z-level tile the DISTINCT-user and event counts, with
    tiles under k distinct users SUPPRESSED — the standard rule before
    publishing mobility heatmaps.

    Shape at 100 TB: geotag + tile-assign stateless map, per-batch
    (tile, user) dedup combiner, the Ray sort-based groupby resolves
    the unbounded (tile, user) key space, then a tiny per-tile
    rollup + the >= k filter."""
    from ray.data.aggregate import Count, Sum

    from ..stages.tiles import encode_tiles

    ds = _read(sf_dir, "events", ["user_id", "event_id"])

    def geotag(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, eid)
        t = pa.table(
            {
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
                "user_id": batch["user_id"],
            }
        )
        return encode_tiles(
            t, "WebMercatorQuad", (zoom,), keep_columns=["user_id"]
        )

    tagged = ds.map_batches(geotag, batch_format="pyarrow", batch_size=16384)

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = batch.append_column(
            "__one", pa.array(np.ones(batch.num_rows, dtype=np.int64))
        )
        g = t.group_by(["tile_x", "tile_y", "user_id"]).aggregate(
            [("__one", "sum")]
        )
        return g.rename_columns(["tile_x", "tile_y", "user_id", "n_ev"])

    pairs = tagged.map_batches(pair_partial, batch_format="pyarrow")
    merged = pairs.groupby(["tile_x", "tile_y", "user_id"]).aggregate(
        Sum("n_ev", alias_name="n_ev")
    )
    per_tile = merged.groupby(["tile_x", "tile_y"]).aggregate(
        Count(alias_name="n_users"), Sum("n_ev", alias_name="n_events")
    )
    return per_tile.filter(expr=f"n_users >= {k}")


def sql_k_anon_tiles(tile_exprs: dict, k: int = 5) -> str:
    return f"""
WITH {_sql_event_pos()},
t AS (
  SELECT {tile_exprs['tx']} AS tile_x, {tile_exprs['ty']} AS tile_y, user_id
  FROM pos
  WHERE {tile_exprs['valid']}
),
u AS (
  SELECT tile_x, tile_y, user_id, count(*) AS n_ev
  FROM t GROUP BY 1, 2, 3
)
SELECT tile_x, tile_y, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n_ev) AS BIGINT) AS n_events
FROM u GROUP BY 1, 2
HAVING count(*) >= {k}
"""


def q_ntile_buckets(sf_dir: str, n_buckets: int = 4):
    """NTILE equi-height bucketing per group (the histogram-equalized
    binning primitive behind percentile dashboards and equi-depth
    partition planning): orders split into ``n_buckets`` rank bands of
    cent-quantized o_totalprice within each o_orderpriority, emitting
    the exact (n, sum_cents) of every band. Ties straddling a band
    boundary contribute deterministic counts because every row of a tie
    carries the same value — the per-band sums are order-independent
    even though NTILE's row assignment is not.

    Shape at 100 TB: ONE (priority, cents) count combiner folds the
    corpus to its distinct-value dimension; band assignment is the same
    cumulative-span/rank-band overlap used by trimmed_mean, run per
    band on the tiny sorted histogram. No corpus sort, no row shuffle."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def skinnify(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {"o_orderpriority": batch["o_orderpriority"], "cents": pa.array(cents)}
        )

    hist = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["o_orderpriority", "cents"],
        [],
        count_alias="n",
        coalesce=4,
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents", kind="stable")
        n = g["n"].to_numpy()
        v = g["cents"].to_numpy()
        cum = np.cumsum(n)
        prev = np.concatenate(([0], cum[:-1]))
        total = int(cum[-1])
        # SQL NTILE sizing: the first (total % n_buckets) bands hold
        # ceil(total/n_buckets) rows, the rest floor(total/n_buckets).
        base, extra = divmod(total, n_buckets)
        sizes = np.full(n_buckets, base, dtype=np.int64)
        sizes[:extra] += 1
        hi = np.cumsum(sizes)
        lo = hi - sizes
        rows = {"o_orderpriority": [], "bucket": [], "n": [], "sum_cents": []}
        for b in range(n_buckets):
            inb = np.maximum(
                0, np.minimum(cum, hi[b]) - np.maximum(prev, lo[b])
            )
            rows["o_orderpriority"].append(g["o_orderpriority"].iloc[0])
            rows["bucket"].append(b + 1)
            rows["n"].append(int(inb.sum()))
            rows["sum_cents"].append(int((inb * v).sum()))
        out = pd.DataFrame(rows)
        out["bucket"] = out["bucket"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        out["sum_cents"] = out["sum_cents"].astype(np.int64)
        return out

    return hist.groupby("o_orderpriority").map_groups(pick, batch_format="pandas")


SQL_NTILE_BUCKETS = """
WITH c AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
),
b AS (
  SELECT o_orderpriority, cents,
         NTILE(4) OVER (PARTITION BY o_orderpriority ORDER BY cents) AS bucket
  FROM c
)
SELECT o_orderpriority, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM b GROUP BY 1, 2
"""


def q_cross_corr_daily(sf_dir: str, max_lag: int = 3):
    """LAG-k CROSS-CORRELATION moments between two daily event-count
    series (does today's `click` volume predict `purchase` volume L
    days later — the leading-indicator probe): for each lag L in
    0..max_lag, exact integer moment sums (n_pairs, sx, sy, sxy, sxx,
    syy) over day pairs (d, d+L) where BOTH series observed a count;
    Pearson r derives downstream exactly as in acf_daily.

    Shape at 100 TB: ONE (day, series) count combiner folds the corpus
    to the day dimension; the lag join runs driver-side on it."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    DAY_US = 86400 * 1_000_000
    sx_name, sy_name = "click", "purchase"

    def skinnify(batch: pa.Table) -> pa.Table:
        is_x = _str_eq(batch["event_type"], sx_name)
        is_y_all = _str_eq(batch["event_type"], sy_name)
        keep = is_x | is_y_all
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )[keep]
        is_y = is_y_all[keep].astype(np.int64)
        return pa.table(
            {"day": pa.array(day, pa.int64()), "is_y": pa.array(is_y)}
        )

    daily = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["day", "is_y"],
        [],
        count_alias="c",
        coalesce=4,
    )

    ddf = daily.to_pandas()  # day-dimension
    xs = ddf[ddf["is_y"] == 0].set_index("day")["c"]
    ys = ddf[ddf["is_y"] == 1].set_index("day")["c"]
    rows = {k: [] for k in ("lag_d", "n_pairs", "sx", "sy", "sxy", "sxx", "syy")}
    for lag in range(0, max_lag + 1):
        days = sorted(d for d in xs.index if d + lag in ys.index)
        if not days:
            continue
        a = xs.loc[days].to_numpy().astype(np.int64)
        b = ys.loc[[d + lag for d in days]].to_numpy().astype(np.int64)
        rows["lag_d"].append(lag)
        rows["n_pairs"].append(len(days))
        rows["sx"].append(int(a.sum()))
        rows["sy"].append(int(b.sum()))
        rows["sxy"].append(int((a * b).sum()))
        rows["sxx"].append(int((a * a).sum()))
        rows["syy"].append(int((b * b).sum()))
    return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in rows.items()})


SQL_CROSS_CORR_DAILY = """
WITH x AS (
  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
  FROM events WHERE event_type = 'click' GROUP BY 1
),
y AS (
  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
l(lag_d) AS (VALUES (0), (1), (2), (3))
SELECT CAST(l.lag_d AS BIGINT) AS lag_d,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(x.c) AS BIGINT) AS sx, CAST(sum(y.c) AS BIGINT) AS sy,
       CAST(sum(x.c * y.c) AS BIGINT) AS sxy,
       CAST(sum(x.c * x.c) AS BIGINT) AS sxx,
       CAST(sum(y.c * y.c) AS BIGINT) AS syy
FROM l CROSS JOIN x JOIN y ON y.day = x.day + l.lag_d
GROUP BY 1
"""


def q_weighted_quantile(sf_dir: str):
    """EXACT WEIGHTED quantiles per group (p25/median/p75 of the
    cent-quantized extended price, weighted by quantity, per
    l_returnflag — the price-distribution monitor where a 50-unit line
    counts 50x): lower weighted quantile, smallest value whose
    cumulative weight reaches ceil(q * W). l_quantity is integral in
    this corpus, so every weight and threshold is an exact int64.

    Shape at 100 TB: ONE (flag, cents) weight-sum combiner folds the
    corpus to its distinct-value dimension; the quantile picks run on
    the tiny per-group sorted weight histogram. No corpus sort."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])

    def skinnify(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        w = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "cents": pa.array(cents),
                "w": pa.array(w),
            }
        )

    hist = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["l_returnflag", "cents"],
        ["w"],
        coalesce=4,
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents", kind="stable")
        w = g["w"].to_numpy()
        v = g["cents"].to_numpy()
        cum = np.cumsum(w)
        total = int(cum[-1])
        out = {"l_returnflag": [g["l_returnflag"].iloc[0]], "total_w": [total]}
        # cum >= ceil(q*W)  <=>  cum * denom >= q_num * W  (cum integral)
        for name, q_num, denom in (
            ("p25_cents", 1, 4),
            ("median_cents", 1, 2),
            ("p75_cents", 3, 4),
        ):
            i = int(np.searchsorted(cum * denom, q_num * total))
            out[name] = [int(v[i])]
        o = pd.DataFrame(out)
        for c in ("total_w", "p25_cents", "median_cents", "p75_cents"):
            o[c] = o[c].astype(np.int64)
        return o

    return hist.groupby("l_returnflag").map_groups(pick, batch_format="pandas")


SQL_WEIGHTED_QUANTILE = """
WITH c AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
),
h AS (SELECT l_returnflag, cents, sum(w) AS wv FROM c GROUP BY 1, 2),
s AS (
  SELECT l_returnflag, cents, wv,
         sum(wv) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cum,
         sum(wv) OVER (PARTITION BY l_returnflag) AS tot
  FROM h
)
SELECT l_returnflag, CAST(max(tot) AS BIGINT) AS total_w,
       CAST(min(CASE WHEN cum * 4 >= tot THEN cents END) AS BIGINT) AS p25_cents,
       CAST(min(CASE WHEN cum * 2 >= tot THEN cents END) AS BIGINT) AS median_cents,
       CAST(min(CASE WHEN cum * 4 >= 3 * tot THEN cents END) AS BIGINT) AS p75_cents
FROM s GROUP BY 1
"""


def q_dwell_time(sf_dir: str):
    """GEOFENCE DWELL TIME per region (how long users linger inside each
    zone — the visit-duration statistic behind store/POI analytics and
    curriculum geo-balancing): consecutive same-user events both inside
    region R contribute their timestamp gap to R's dwell total. Exact
    integer microseconds.

    Shape at 100 TB: the region assignment is the stateless rect-PIP
    map (dimension side regenerated per worker); ONE 512-way user
    superbucket groupby; inside a bucket one stable sort + vectorized
    boundary-masked pairing (the _bucketed_bigrams plan); per-bucket
    (region, n_stays, dwell) partials -> tiny combiner groupby."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    skinny = ds.map_batches(
        _event_pos_region_batch, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def dwell(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        reg = g["region"].to_numpy()
        ts = g["ts_us"].to_numpy()
        keep = (uid[1:] == uid[:-1]) & (reg[1:] == reg[:-1]) & (reg[:-1] != -1)
        part = pd.DataFrame(
            {"region": reg[:-1][keep], "dur": ts[1:][keep] - ts[:-1][keep]}
        )
        out = (
            part.groupby("region", sort=False)
            .agg(n_stays=("dur", "size"), dwell_us=("dur", "sum"))
            .reset_index()
        )
        return out.astype({"region": np.int64, "n_stays": np.int64, "dwell_us": np.int64})

    parts = skinny.groupby("__ub").map_groups(dwell, batch_format="pandas")
    return partial_sum_groupby(parts, ["region"], ["n_stays", "dwell_us"], coalesce=4)


def sql_dwell_time() -> str:
    from ..sources.regions import regions_parquet_path

    rsrc = f"read_parquet('{regions_parquet_path()}')"
    return f"""
WITH {_sql_event_pos()},
reg AS (
  SELECT p.user_id, p.ts_us, p.event_id,
         coalesce((SELECT min(r.region_id) FROM {rsrc} r
                   WHERE r.kind = 'rect'
                     AND p.lon >= r.minx AND p.lon <= r.maxx
                     AND p.lat >= r.miny AND p.lat <= r.maxy), -1) AS region
  FROM pos p
),
o AS (
  SELECT region,
         lag(region) OVER w AS from_region,
         ts_us - lag(ts_us) OVER w AS dur
  FROM reg WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT from_region AS region, CAST(count(*) AS BIGINT) AS n_stays,
       CAST(sum(dur) AS BIGINT) AS dwell_us
FROM o WHERE from_region = region AND from_region <> -1
GROUP BY 1
"""


def q_border_crossings(sf_dir: str):
    """GEOFENCE BORDER CROSSINGS per region (entry/exit counting — the
    segment-vs-boundary join behind alerting and mobility flux
    statistics): each consecutive same-user event pair is a movement
    segment; it ENTERS region R when only its head lies inside R's
    rect, EXITS when only its tail does. Segments are tested against
    EVERY region independently (a long hop can cross several borders),
    unlike od_flows' single min-region assignment.

    Shape at 100 TB: ONE 512-way user superbucket groupby; inside a
    bucket one stable sort + boundary-masked pairing, then a vectorized
    (segments x 58 rects) inclusion matrix — the region dimension side
    is regenerated per worker, never shipped; only nonzero (region,
    enter, exit) partials leave the group for the tiny combiner."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def skinnify(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": pa.compute.cast(
                    batch["ts"].cast(pa.timestamp("us")), pa.int64()
                ),
                "event_id": batch["event_id"],
            }
        )

    skinny = ds.map_batches(
        skinnify, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def crossings(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        lon, lat = _event_geo_np(uid, eid)
        rid, minx, miny, maxx, maxy = _rect_regions()
        inside = (
            (lon[:, None] >= minx[None, :])
            & (lon[:, None] <= maxx[None, :])
            & (lat[:, None] >= miny[None, :])
            & (lat[:, None] <= maxy[None, :])
        )
        same = uid[1:] == uid[:-1]
        pin, cin = inside[:-1][same], inside[1:][same]
        enter = (~pin) & cin
        exit_ = pin & (~cin)
        n_enter = enter.sum(axis=0).astype(np.int64)
        n_exit = exit_.sum(axis=0).astype(np.int64)
        keep = (n_enter > 0) | (n_exit > 0)
        return pd.DataFrame(
            {
                "region": rid[keep].astype(np.int64),
                "n_enter": n_enter[keep],
                "n_exit": n_exit[keep],
            }
        )

    parts = skinny.groupby("__ub").map_groups(crossings, batch_format="pandas")
    return partial_sum_groupby(parts, ["region"], ["n_enter", "n_exit"], coalesce=4)


def sql_border_crossings() -> str:
    from ..sources.regions import regions_parquet_path

    rsrc = f"read_parquet('{regions_parquet_path()}')"
    return f"""
WITH {_sql_event_pos()},
seg AS (
  SELECT user_id, lon, lat,
         lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
  FROM pos WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
s AS (SELECT * FROM seg WHERE plon IS NOT NULL),
x AS (
  SELECT r.region_id AS region,
         (s.plon >= r.minx AND s.plon <= r.maxx
          AND s.plat >= r.miny AND s.plat <= r.maxy) AS pin,
         (s.lon >= r.minx AND s.lon <= r.maxx
          AND s.lat >= r.miny AND s.lat <= r.maxy) AS cin
  FROM s CROSS JOIN (SELECT * FROM {rsrc} WHERE kind = 'rect') r
)
SELECT region,
       CAST(sum(CASE WHEN cin THEN 1 ELSE 0 END) AS BIGINT) AS n_enter,
       CAST(sum(CASE WHEN pin THEN 1 ELSE 0 END) AS BIGINT) AS n_exit
FROM x WHERE pin <> cin
GROUP BY 1
"""


def q_tpch_q3(sf_dir: str, segment: str = "BUILDING", cutoff: str = "1998-06-01", k: int = 10):
    """TPC-H Q3 (shipping priority): the canonical 3-way selective join —
    customer(segment) |x| orders(date < cutoff) |x| lineitem(shipdate >
    cutoff) -> cent-exact revenue per order -> top-k by (revenue desc,
    orderdate, orderkey). Exercises the mixed join plan: the filtered
    customer keys are a BROADCAST semi-join gate on orders (small side
    shipped once), then orders |x| lineitem is the genuine two-sided
    hash exchange (Dataset.join), per-order revenue a combiner groupby,
    and top-k a per-block prune + tiny driver finish.

    Shape at 100 TB: predicates pushed to the parquet scan; nothing
    corpus-sized is materialized; the only driver state is the k-row
    result and the filtered-segment key set (customer-dimension; at
    larger dimension tables the same gate becomes a Dataset.join)."""
    import pyarrow.compute as pc

    from ..stages.agg import partial_sum_groupby

    cutoff_us = int(pd.Timestamp(cutoff).value // 1000)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = pa.array(
        np.unique(
            np.concatenate(
                [
                    b["c_custkey"].to_numpy(zero_copy_only=False)[
                        _str_eq(b["c_mktsegment"], segment)
                    ]
                    for b in cust.iter_batches(batch_format="pyarrow")
                ]
            )
        )
    )  # customer-dimension key set, broadcast via closure

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        m = pc.and_(
            pc.is_in(batch["o_custkey"], value_set=keys),
            pc.less(od, pa.scalar(cutoff_us, pa.int64())),
        )
        t = batch.append_column("odate_us", od).filter(m)
        return t.select(["o_orderkey", "odate_us"])

    o_small = orders.map_batches(o_filter, batch_format="pyarrow")

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def li_filter(batch: pa.Table) -> pa.Table:
        sd = (
            batch["l_shipdate"]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keep = sd > cutoff_us
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        ok = batch["l_orderkey"].filter(pa.array(keep))
        return pa.table(
            {
                "l_orderkey": ok,
                "rev_cents": pa.array(
                    np.trunc(ep * (1.0 - disc) * 100.0).astype(np.int64)
                ),
            }
        )

    li_small = li.map_batches(li_filter, batch_format="pyarrow")
    joined = li_small.join(
        o_small,
        join_type="inner",
        num_partitions=max(8, _ccpus() // 2),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    per_order = partial_sum_groupby(
        joined, ["l_orderkey", "odate_us"], ["rev_cents"], coalesce=4
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["rev_cents", "odate_us", "l_orderkey"],
            ascending=[False, True, True],
            kind="stable",
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    pdf = (
        per_order.map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(
            ["rev_cents", "odate_us", "l_orderkey"],
            ascending=[False, True, True],
            kind="stable",
        )
        .head(k)
        .reset_index(drop=True)
    )
    return pdf.astype({"l_orderkey": np.int64, "odate_us": np.int64, "rev_cents": np.int64})


def sql_tpch_q3(segment: str = "BUILDING", cutoff: str = "1998-06-01", k: int = 10) -> str:
    return f"""
SELECT l.l_orderkey,
       epoch_us(o.o_orderdate) AS odate_us,
       CAST(sum(CAST(trunc(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
                AS BIGINT)) AS BIGINT) AS rev_cents
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{segment}'
  AND o.o_orderdate < TIMESTAMP '{cutoff}'
  AND l.l_shipdate > TIMESTAMP '{cutoff}'
GROUP BY 1, 2
ORDER BY rev_cents DESC, odate_us, l_orderkey
LIMIT {k}
"""


def q_gap_fill_daily(sf_dir: str):
    """TEMPORAL GAP FILL / RESAMPLE with last-observation-carried-forward
    (the regularization step before any fixed-step time-series model):
    per event type, the daily count series is completed over the GLOBAL
    [min_day, max_day] span, missing days carrying the last observed
    count forward (days before a type's first observation fill 0).
    Output per type: span length, observed days, filled days, and the
    exact integer sum of the completed series.

    Shape at 100 TB: ONE (type, day) count combiner folds the corpus to
    the day dimension; the fill runs driver-side on that tiny table (at
    finer grains it is a per-type segment cumsum inside one groupby)."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table(
            {"event_type": batch["event_type"], "day": pa.array(day, pa.int64())}
        )

    daily = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["event_type", "day"],
        [],
        count_alias="c",
        coalesce=4,
    ).to_pandas()  # (type x day)-dimension

    d_min, d_max = int(daily["day"].min()), int(daily["day"].max())
    span = d_max - d_min + 1
    rows = {
        "event_type": [],
        "n_days": [],
        "n_observed": [],
        "n_filled": [],
        "sum_filled": [],
    }
    for typ, g in daily.groupby("event_type"):
        g = g.sort_values("day")
        series = np.zeros(span, dtype=np.int64)
        obs = np.zeros(span, dtype=bool)
        series[g["day"].to_numpy() - d_min] = g["c"].to_numpy()
        obs[g["day"].to_numpy() - d_min] = True
        # LOCF: carry last observed value across unobserved days
        idx = np.where(obs, np.arange(span), -1)
        idx = np.maximum.accumulate(idx)
        filled = np.where(idx >= 0, series[np.maximum(idx, 0)], 0)
        rows["event_type"].append(typ)
        rows["n_days"].append(span)
        rows["n_observed"].append(int(obs.sum()))
        rows["n_filled"].append(int(span - obs.sum()))
        rows["sum_filled"].append(int(filled.sum()))
    out = pd.DataFrame(rows)
    for c in ("n_days", "n_observed", "n_filled", "sum_filled"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_GAP_FILL_DAILY = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
days AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM span),
grid AS (
  SELECT t.event_type, days.day
  FROM (SELECT DISTINCT event_type FROM d) t CROSS JOIN days
),
f AS (
  SELECT g.event_type, g.day, d.c,
         coalesce(last_value(d.c IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.day), 0) AS filled
  FROM grid g LEFT JOIN d ON d.event_type = g.event_type AND d.day = g.day
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_observed,
       CAST(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
       CAST(sum(filled) AS BIGINT) AS sum_filled
FROM f GROUP BY 1
"""


def q_percent_change_weekly(sf_dir: str):
    """WEEK-OVER-WEEK DELTA per event type (the trend-monitoring delta
    behind every ops dashboard): weekly event counts and the exact
    integer change vs the previous OBSERVED week. Output: (type, week,
    n, prev_n, delta) for weeks with a predecessor.

    Shape at 100 TB: ONE (type, week) count combiner; the adjacent-week
    join runs driver-side on the week dimension."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    WEEK_US = 7 * 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        week = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // WEEK_US
        )
        return pa.table(
            {"event_type": batch["event_type"], "week": pa.array(week, pa.int64())}
        )

    weekly = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["event_type", "week"],
        [],
        count_alias="n",
        coalesce=4,
    ).to_pandas()

    rows = {"event_type": [], "week": [], "n": [], "prev_n": [], "delta": []}
    for typ, g in weekly.groupby("event_type"):
        g = g.sort_values("week")
        w = g["week"].to_numpy()
        n = g["n"].to_numpy()
        adj = w[1:] == w[:-1] + 1
        rows["event_type"].extend([typ] * int(adj.sum()))
        rows["week"].extend(w[1:][adj].tolist())
        rows["n"].extend(n[1:][adj].tolist())
        rows["prev_n"].extend(n[:-1][adj].tolist())
        rows["delta"].extend((n[1:][adj] - n[:-1][adj]).tolist())
    out = pd.DataFrame(rows)
    for c in ("week", "n", "prev_n", "delta"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_PERCENT_CHANGE_WEEKLY = """
WITH w AS (
  SELECT event_type, epoch_us(ts) // 604800000000 AS week, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT a.event_type, a.week, CAST(a.n AS BIGINT) AS n,
       CAST(b.n AS BIGINT) AS prev_n, CAST(a.n - b.n AS BIGINT) AS delta
FROM w a JOIN w b ON b.event_type = a.event_type AND b.week = a.week - 1
"""


def q_new_users_daily(sf_dir: str):
    """NEW-vs-RETURNING decomposition (acquisition monitoring): per day,
    how many users appear for the FIRST time in the corpus. One
    groupby(user) min-day pass (combiner: per-batch min partials), then
    a day histogram of first days.

    Shape at 100 TB: per-batch (user, min_day) partials -> one skinny
    user-dimension groupby -> tiny day histogram combiner."""
    from ..stages.agg import partial_min_groupby, partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table(
            {"user_id": batch["user_id"], "day": pa.array(day, pa.int64())}
        )

    skinny = ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384)
    first = partial_min_groupby(skinny, ["user_id"], ["day"], coalesce=8)
    return partial_sum_groupby(
        first, ["day"], [], count_alias="n_new", coalesce=4
    )


SQL_NEW_USERS_DAILY = """
WITH f AS (
  SELECT user_id, min(epoch_us(ts) // 86400000000) AS day
  FROM events GROUP BY 1
)
SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM f GROUP BY 1
"""


def q_rolling_wau(sf_dir: str, window_d: int = 7):
    """ROLLING 7-DAY ACTIVE USERS (the WAU engagement metric — a
    sliding-window COUNT DISTINCT, the aggregation SQL windows cannot
    express directly): for each day, how many distinct users had any
    event in [day - 6, day]. Exact.

    Shape at 100 TB: per-batch (user, day) dedup combiner folds the
    corpus to active user-days; each user-day DONATES itself to the 7
    windows it supports (skinny explode); a second (user, window-day)
    dedup combiner collapses multi-day users inside one window; the
    final count is a tiny day-histogram combiner. Three skinny
    exchanges, nothing corpus-sized, no per-day rescan."""
    from ..stages.agg import partial_count_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table(
            {"user_id": batch["user_id"], "day": pa.array(day, pa.int64())}
        )

    skinny = ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384)
    # pass 1: distinct active (user, day)
    active = partial_count_groupby(skinny, ["user_id", "day"], alias="_c", coalesce=8)
    # observed day span (bounds the donated windows)
    span = active.map_batches(
        lambda b: pa.table(
            {
                "d0": pa.array([int(b["day"].to_numpy().min())] if b.num_rows else [], pa.int64()),
                "d1": pa.array([int(b["day"].to_numpy().max())] if b.num_rows else [], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()
    d_min, d_max = int(span["d0"].min()), int(span["d1"].max())

    def donate(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        day = batch["day"].to_numpy(zero_copy_only=False)
        outs_u, outs_w = [], []
        for k in range(window_d):
            w = day + k
            keep = w <= d_max
            outs_u.append(uid[keep])
            outs_w.append(w[keep])
        return pa.table(
            {
                "user_id": pa.array(np.concatenate(outs_u)),
                "wday": pa.array(np.concatenate(outs_w)),
            }
        )

    donated = active.map_batches(donate, batch_format="pyarrow")
    # pass 2: distinct (user, window-day), then the day histogram
    uw = partial_count_groupby(donated, ["user_id", "wday"], alias="_c", coalesce=8)
    out = partial_count_groupby(uw, ["wday"], alias="wau", coalesce=4)
    return out.map_batches(
        lambda b: b.rename_columns(["day", "wau"]), batch_format="pyarrow"
    )


SQL_ROLLING_WAU = """
WITH a AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
span AS (SELECT min(day) AS d0, max(day) AS d1 FROM a),
days AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM span)
SELECT d.day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
FROM days d JOIN a ON a.day BETWEEN d.day - 6 AND d.day
GROUP BY 1
"""


def q_voronoi_assign(sf_dir: str):
    """VORONOI / NEAREST-CENTROID assignment (the discrete-site
    partition behind service-area analysis and nearest-depot routing):
    every event maps to its nearest urban center by squared euclidean
    degree distance (deterministic min-index tiebreak), one stateless
    vectorized argmin per batch against the broadcast center table;
    output per center: members and the exact fixed-point (1e7) distance
    sum. Exact SQL oracle: the same argmin as a min-over-cross-join."""
    from ..sources.images import _URBAN_CENTERS
    from ..stages.agg import partial_sum_groupby

    cx = np.array([c[0] for c in _URBAN_CENTERS], dtype=np.float64)
    cy = np.array([c[1] for c in _URBAN_CENTERS], dtype=np.float64)

    ds = _read(sf_dir, "events", ["user_id", "event_id"])

    def assign(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, eid)
        d2 = (lon[:, None] - cx[None, :]) ** 2 + (lat[:, None] - cy[None, :]) ** 2
        site = d2.argmin(axis=1).astype(np.int64)  # first min wins
        dmin = d2[np.arange(len(site)), site]
        return pa.table(
            {
                "site": pa.array(site),
                "d2_fp": pa.array(np.floor(dmin * 1e7).astype(np.int64)),
            }
        )

    return partial_sum_groupby(
        ds.map_batches(assign, batch_format="pyarrow", batch_size=16384),
        ["site"],
        ["d2_fp"],
        count_alias="n",
        coalesce=4,
    )


def sql_voronoi_assign() -> str:
    from ..sources.images import _URBAN_CENTERS

    vals = ", ".join(
        f"({i}, {cx!r}, {cy!r})" for i, (cx, cy) in enumerate(_URBAN_CENTERS)
    )
    return f"""
WITH {_sql_event_pos()},
sites(si, sx, sy) AS (VALUES {vals}),
d AS (
  SELECT p.event_id, s.si,
         (p.lon - s.sx) * (p.lon - s.sx) + (p.lat - s.sy) * (p.lat - s.sy) AS d2
  FROM pos p CROSS JOIN sites s
),
a AS (
  SELECT event_id, si, d2,
         row_number() OVER (PARTITION BY event_id ORDER BY d2, si) AS rk
  FROM d
)
SELECT CAST(si AS BIGINT) AS site,
       CAST(sum(CAST(floor(d2 * 1e7) AS BIGINT)) AS BIGINT) AS d2_fp,
       CAST(count(*) AS BIGINT) AS n
FROM a WHERE rk = 1
GROUP BY 1
"""


_SEG_ZOOM_SPAN = 256.0 * (156543.033928041 / 256.0)  # z8 tile span, meters
_SEG_ORIGIN = 20037508.3427892


def _seg_tiles_clip(fx0, fy0, fx1, fy1):
    """Cells of the z-grid a segment passes through, by Liang-Barsky
    interval clipping against every cell in the segment's bbox (cells
    whose clip interval is non-degenerate, t0 < t1). Returns (tx, ty)
    int arrays. Scalar per segment; candidate cells are bbox-bounded."""
    txa, txb = int(np.floor(min(fx0, fx1))), int(np.floor(max(fx0, fx1)))
    tya, tyb = int(np.floor(min(fy0, fy1))), int(np.floor(max(fy0, fy1)))
    dx, dy = fx1 - fx0, fy1 - fy0
    out_x, out_y = [], []
    for tx in range(txa, txb + 1):
        for ty in range(tya, tyb + 1):
            t0, t1 = 0.0, 1.0
            ok = True
            for p, q0, q1 in (
                (dx, tx - fx0, tx + 1 - fx0),
                (dy, ty - fy0, ty + 1 - fy0),
            ):
                if p == 0.0:
                    if q0 > 0.0 or q1 < 0.0:
                        ok = False
                        break
                else:
                    ta, tb = q0 / p, q1 / p
                    if ta > tb:
                        ta, tb = tb, ta
                    t0, t1 = max(t0, ta), min(t1, tb)
                    if t0 >= t1:
                        ok = False
                        break
            if ok:
                out_x.append(tx)
                out_y.append(ty)
    return out_x, out_y


def q_segment_traffic(sf_dir: str, zoom: int = 8):
    """TRAJECTORY LINE RASTERIZATION (segment -> tile-grid traffic
    counts — the supercover traversal behind traffic heatmaps and
    corridor analysis; the LINE sibling of rasterize_regions'
    polygon burn): every consecutive same-user event pair is a
    movement segment in WebMercator; each z-level tile it PASSES
    THROUGH (open Liang-Barsky clip interval) counts one traversal.

    Shape at 100 TB: ONE 512-way user superbucket groupby builds the
    segments (boundary-masked pairing); per segment the candidate cells
    are bbox-bounded (urban hops span a handful of z8 tiles) so the clip loop is
    output-dimensional; (tile, n) partials -> tiny combiner. Exactness:
    both this and the independent golden define traversal by the same
    strict t0 < t1 clip on identical float arithmetic."""
    from ..core.tms import lonlat_to_webmercator_np
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def skinnify(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": pa.compute.cast(
                    batch["ts"].cast(pa.timestamp("us")), pa.int64()
                ),
                "event_id": batch["event_id"],
            }
        )

    skinny = ds.map_batches(
        skinnify, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def traffic(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        lon, lat = _event_geo_np(uid, eid)
        mx, my = lonlat_to_webmercator_np(lon, lat)
        fx = (mx - (-_SEG_ORIGIN)) / _SEG_ZOOM_SPAN
        fy = (_SEG_ORIGIN - my) / _SEG_ZOOM_SPAN
        same = np.nonzero(uid[1:] == uid[:-1])[0]
        acc: dict[tuple, int] = {}
        for i in same:
            xs, ys = _seg_tiles_clip(fx[i], fy[i], fx[i + 1], fy[i + 1])
            for tx, ty in zip(xs, ys):
                acc[(tx, ty)] = acc.get((tx, ty), 0) + 1
        items = sorted(acc.items())
        return pd.DataFrame(
            {
                "tile_x": np.array([k[0] for k, _ in items], dtype=np.int64),
                "tile_y": np.array([k[1] for k, _ in items], dtype=np.int64),
                "n": np.array([v for _, v in items], dtype=np.int64),
            }
        )

    parts = skinny.groupby("__ub").map_groups(traffic, batch_format="pandas")
    return partial_sum_groupby(parts, ["tile_x", "tile_y"], ["n"], coalesce=4)


def q_abandoned_clicks(sf_dir: str, window_s: int = 3600):
    """BOUNDED-WINDOW TEMPORAL ANTI-JOIN (cart abandonment): per day,
    clicks with NO purchase by the same user within the next hour —
    the not-followed-by pattern (funnel's negative space) every
    engagement pipeline needs. Strict window: (t_click, t_click + 1h].

    Shape at 100 TB: only click/purchase rows leave the scan; ONE
    512-way user superbucket groupby; inside a bucket one sort and a
    per-user vectorized searchsorted of click times into purchase
    times (no per-row scan); (day, n) partials -> tiny combiner."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    win_us = window_s * 1_000_000
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        is_p = _str_eq(batch["event_type"], "purchase")
        keep = _str_eq(batch["event_type"], "click") | is_p
        return pa.table(
            {
                "user_id": pa.array(
                    batch["user_id"].to_numpy(zero_copy_only=False)[keep]
                ),
                "ts_us": pa.array(
                    batch["ts"]
                    .cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_numpy()[keep]
                ),
                "is_purchase": pa.array(is_p[keep].astype(np.int8)),
            }
        )

    skinny = ds.map_batches(
        skinnify, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def scan(group: pd.DataFrame) -> pd.DataFrame:
        g, uid, starts, ends = _user_segments(group, ["ts_us"])
        ts = g["ts_us"].to_numpy()
        isp = g["is_purchase"].to_numpy()
        out_day, cnt = {}, None
        days = []
        for s, e in zip(starts, ends):
            t = ts[s:e]
            p = t[isp[s:e] == 1]
            c = t[isp[s:e] == 0]
            if len(c) == 0:
                continue
            # abandoned: no purchase in (t, t + win]
            lo = np.searchsorted(p, c, side="right")
            hi = np.searchsorted(p, c + win_us, side="right")
            ab = c[hi == lo]
            days.append(ab // DAY_US)
        if days:
            all_days = np.concatenate(days)
        else:
            all_days = np.array([], dtype=np.int64)
        uniq, counts = np.unique(all_days, return_counts=True)
        return pd.DataFrame(
            {"day": uniq.astype(np.int64), "n_abandoned": counts.astype(np.int64)}
        )

    parts = skinny.groupby("__ub").map_groups(scan, batch_format="pandas")
    return partial_sum_groupby(parts, ["day"], ["n_abandoned"], coalesce=4)


SQL_ABANDONED_CLICKS = """
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase'
)
SELECT c.ts_us // 86400000000 AS day,
       CAST(count(*) AS BIGINT) AS n_abandoned
FROM c
WHERE NOT EXISTS (
  SELECT 1 FROM p
  WHERE p.user_id = c.user_id
    AND p.ts_us > c.ts_us AND p.ts_us <= c.ts_us + 3600000000
)
GROUP BY 1
"""


def q_ab_test_counts(sf_dir: str):
    """A/B COHORT CONVERSION TABLE (the experiment-analysis primitive):
    users split deterministically by fold-hash parity into arms A/B;
    per arm, exact user count, converting users (>= 1 purchase), click
    and purchase event totals — the 2x2 table a proportions z-test or
    chi-square consumes downstream, all exact int64.

    Shape at 100 TB: stateless arm tag per batch; ONE (user, arm)
    combiner with per-batch partial flags folds the corpus to the user
    dimension; the arm rollup is a tiny second combiner."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def skinnify(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "arm": pa.array(_fold_hash(uid, 2)),
                "clicks": pa.array(
                    _str_eq(batch["event_type"], "click").astype(np.int64)
                ),
                "purchases": pa.array(
                    _str_eq(batch["event_type"], "purchase").astype(np.int64)
                ),
            }
        )

    per_user = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["user_id", "arm"],
        ["clicks", "purchases"],
        coalesce=8,
    )

    def to_flags(batch: pa.Table) -> pa.Table:
        p = batch["purchases"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "arm": batch["arm"],
                "users": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "converted": pa.array((p > 0).astype(np.int64)),
                "clicks": batch["clicks"],
                "purchases": batch["purchases"],
            }
        )

    return partial_sum_groupby(
        per_user.map_batches(to_flags, batch_format="pyarrow"),
        ["arm"],
        ["users", "converted", "clicks", "purchases"],
        coalesce=4,
    )


SQL_AB_TEST_COUNTS = """
WITH u AS (
  SELECT user_id,
         ((user_id & 2147483647) * 2654435761) % 2 AS arm,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases
  FROM events GROUP BY 1, 2
)
SELECT CAST(arm AS BIGINT) AS arm,
       CAST(count(*) AS BIGINT) AS users,
       CAST(sum(CASE WHEN purchases > 0 THEN 1 ELSE 0 END) AS BIGINT) AS converted,
       CAST(sum(clicks) AS BIGINT) AS clicks,
       CAST(sum(purchases) AS BIGINT) AS purchases
FROM u GROUP BY 1
"""


def q_fulfillment_lag(sf_dir: str):
    """ORDER-FULFILLMENT LAG histogram (operational SLA monitoring):
    per order priority, how many lineitems shipped within 0-7 / 8-30 /
    31-90 / >90 days of the order date — a large-large join whose
    payload is just two timestamps, bucketed exactly in integer days.

    Shape at 100 TB: both sides pruned to (key, date) at the scan; one
    hash-partitioned Dataset.join; per-batch bucket combiner."""
    from ..stages.agg import partial_sum_groupby

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_orderdate"])

    def o_skinny(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_orderpriority": batch["o_orderpriority"],
                "odate_us": batch["o_orderdate"]
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def l_skinny(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "sdate_us": batch["l_shipdate"]
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
            }
        )

    joined = li.map_batches(l_skinny, batch_format="pyarrow").join(
        orders.map_batches(o_skinny, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=max(8, _ccpus() // 2),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    DAY_US = 86400 * 1_000_000

    def bucketize(batch: pa.Table) -> pa.Table:
        lag_d = (
            batch["sdate_us"].to_numpy(zero_copy_only=False)
            - batch["odate_us"].to_numpy(zero_copy_only=False)
        ) // DAY_US
        bucket = np.full(len(lag_d), 3, dtype=np.int64)
        bucket[lag_d <= 90] = 2
        bucket[lag_d <= 30] = 1
        bucket[lag_d <= 7] = 0
        return pa.table(
            {"o_orderpriority": batch["o_orderpriority"], "bucket": pa.array(bucket)}
        )

    return partial_sum_groupby(
        joined.map_batches(bucketize, batch_format="pyarrow"),
        ["o_orderpriority", "bucket"],
        [],
        count_alias="n",
        coalesce=4,
    )


SQL_FULFILLMENT_LAG = """
WITH j AS (
  SELECT o.o_orderpriority,
         (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000 AS lag_d
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT o_orderpriority,
       CAST(CASE WHEN lag_d <= 7 THEN 0 WHEN lag_d <= 30 THEN 1
                 WHEN lag_d <= 90 THEN 2 ELSE 3 END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM j GROUP BY 1, 2
"""


def q_impossible_travel(sf_dir: str, v_max_mm_s: int = 150_000):
    """IMPOSSIBLE-TRAVEL detection (the GPS-noise / account-sharing
    anomaly gate): per user, consecutive-event steps whose implied
    speed exceeds v_max (150 m/s default — faster than airliners'
    ground average) are violations. The comparison is all-integer
    (dist_mm * 1e6 > dt_us * v_max_mm_s) over the same mm-floored
    haversine steps trip_length uses, so the oracle recomputes exactly;
    zero-dt steps with positive distance count as violations.

    Shape at 100 TB: one skinny superbucketed groupby(user); output is
    the flagged-user dimension (HAVING >= 1 violation)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def geotag(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ev = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, ev)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch["event_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    skinny = ds.map_batches(
        geotag, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def flag(group: pd.DataFrame) -> pd.DataFrame:
        g, uid, starts, ends = _user_segments(group, ["ts_us", "event_id"])
        lon_all = np.radians(g["lon"].to_numpy())
        lat_all = np.radians(g["lat"].to_numpy())
        ts_all = g["ts_us"].to_numpy()
        users, nsteps, nviol = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            lon = lon_all[s:e]
            lat = lat_all[s:e]
            dphi = (lat[1:] - lat[:-1]) / 2.0
            dlmb = (lon[1:] - lon[:-1]) / 2.0
            a = (np.sin(dphi) ** 2
                 + np.cos(lat[:-1]) * np.cos(lat[1:]) * np.sin(dlmb) ** 2)
            d = 2.0 * 6371000.0 * np.arcsin(np.sqrt(a))
            dist_mm = np.floor(d * 1000.0).astype(np.int64)
            dt_us = ts_all[s + 1 : e] - ts_all[s : e - 1]
            viol = dist_mm * np.int64(1_000_000) > dt_us * np.int64(v_max_mm_s)
            if viol.any():
                users.append(uid[s])
                nsteps.append(e - s - 1)
                nviol.append(int(viol.sum()))
        return pd.DataFrame(
            {
                "user_id": np.array(users, dtype=np.int64),
                "n_steps": np.array(nsteps, dtype=np.int64),
                "n_violations": np.array(nviol, dtype=np.int64),
            }
        )

    return skinny.groupby("__ub").map_groups(flag, batch_format="pandas")


def sql_impossible_travel(v_max_mm_s: int = 150_000) -> str:
    hav = (
        "2.0 * 6371000.0 * asin(sqrt("
        "pow(sin((radians(lat) - radians(plat)) / 2.0), 2)"
        " + cos(radians(plat)) * cos(radians(lat))"
        " * pow(sin((radians(lon) - radians(plon)) / 2.0), 2)))"
    )
    return f"""
WITH {_sql_event_pos()},
seq AS (
  SELECT user_id, lon, lat, ts_us,
         lag(lon) OVER w AS plon, lag(lat) OVER w AS plat,
         lag(ts_us) OVER w AS pts
  FROM pos
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id,
       CAST(count(plon) AS BIGINT) AS n_steps,
       CAST(sum(CASE WHEN CAST(floor({hav} * 1000.0) AS BIGINT) * 1000000
                          > (ts_us - pts) * {v_max_mm_s}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM seq WHERE plon IS NOT NULL
GROUP BY user_id
HAVING sum(CASE WHEN CAST(floor({hav} * 1000.0) AS BIGINT) * 1000000
                     > (ts_us - pts) * {v_max_mm_s}
           THEN 1 ELSE 0 END) >= 1
"""


def q_home_location(sf_dir: str, zoom: int = 8):
    """HOME-LOCATION INFERENCE (modal cell per user — the anchor-point
    primitive of mobility analytics): each user's most-visited z-level
    tile with its visit count; ties resolve to the smallest packed tile
    key, so the answer is deterministic at any parallelism.

    Shape at 100 TB: ONE (user, tile) count combiner folds events to
    visited cells; ONE 512-way user superbucket groupby picks each
    user's argmax with a vectorized lexsort + segment-head take — no
    per-user dispatch. Output is the user dimension."""
    from ..core.tms import lonlat_to_webmercator_np
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_id"])
    span = 256.0 * (156543.033928041 / float(1 << zoom))
    origin = 20037508.3427892
    matrix = 1 << zoom

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, eid)
        mx, my = lonlat_to_webmercator_np(lon, lat)
        fx = (mx - (-origin)) / span
        fy = (origin - my) / span
        tx = np.trunc(fx).astype(np.int64)
        ty = np.trunc(fy).astype(np.int64)
        ok = (fx >= 0) & (fy >= 0) & (tx < matrix) & (ty < matrix)
        return pa.table(
            {
                "user_id": pa.array(uid[ok]),
                "tkey": pa.array(tx[ok] * 65536 + ty[ok], pa.int64()),
            }
        )

    visits = partial_sum_groupby(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=16384),
        ["user_id", "tkey"],
        [],
        count_alias="n",
        coalesce=8,
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def argmax(group: pd.DataFrame) -> pd.DataFrame:
        uid = group["user_id"].to_numpy()
        tkey = group["tkey"].to_numpy()
        n = group["n"].to_numpy()
        # per user: max n, then min tkey — lexsort ascending by
        # (uid, -n, tkey) and take each segment head
        order = np.lexsort((tkey, -n, uid))
        uid, tkey, n = uid[order], tkey[order], n[order]
        head = np.concatenate(([True], uid[1:] != uid[:-1]))
        return pd.DataFrame(
            {
                "user_id": uid[head].astype(np.int64),
                "tile_x": (tkey[head] // 65536).astype(np.int64),
                "tile_y": (tkey[head] % 65536).astype(np.int64),
                "n_visits": n[head].astype(np.int64),
            }
        )

    return visits.groupby("__ub").map_groups(argmax, batch_format="pandas")


def sql_home_location(zoom: int = 8) -> str:
    span = f"(256.0 * (156543.033928041 / {float(1 << zoom)!r}))"
    matrix = 1 << zoom
    merc_x = "(lon * (pi() / 180.0) * 6378137.0)"
    merc_y = "(ln(tan((90.0 + lat) * (pi() / 360.0))) * 6378137.0)"
    fx = f"(({merc_x}) - (-20037508.3427892)) / {span}"
    fy = f"((20037508.3427892) - ({merc_y})) / {span}"
    return f"""
WITH {_sql_event_pos()},
t AS (
  SELECT user_id,
         CAST(trunc({fx}) AS BIGINT) AS tx,
         CAST(trunc({fy}) AS BIGINT) AS ty
  FROM pos
  WHERE ({fx}) >= 0 AND ({fy}) >= 0
    AND CAST(trunc({fx}) AS BIGINT) < {matrix}
    AND CAST(trunc({fy}) AS BIGINT) < {matrix}
),
v AS (SELECT user_id, tx, ty, count(*) AS n FROM t GROUP BY 1, 2, 3),
r AS (
  SELECT user_id, tx, ty, n,
         row_number() OVER (
           PARTITION BY user_id ORDER BY n DESC, tx * 65536 + ty
         ) AS rk
  FROM v
)
SELECT user_id, tx AS tile_x, ty AS tile_y, CAST(n AS BIGINT) AS n_visits
FROM r WHERE rk = 1
"""


def q_tile_diversity(sf_dir: str, zoom: int = 6):
    """SPATIAL EVENT-MIX DIVERSITY per tile (Gini-Simpson numerator —
    the exact-integer diversity screen behind "is this cell
    single-behavior or mixed-use"): per z-level tile, total events n
    and sum over event types of n_t^2; the Simpson index 1 - sum/n^2
    derives downstream, every byte exact.

    Shape at 100 TB: ONE (tile, type) count combiner -> per-tile
    squared rollup on the (lattice x types)-bounded table."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_id", "event_type"])
    span = 256.0 * (156543.033928041 / float(1 << zoom))
    origin = 20037508.3427892
    matrix = 1 << zoom

    def tag(batch: pa.Table) -> pa.Table:
        from ..core.tms import lonlat_to_webmercator_np

        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, eid)
        mx, my = lonlat_to_webmercator_np(lon, lat)
        fx = (mx - (-origin)) / span
        fy = (origin - my) / span
        tx = np.trunc(fx).astype(np.int64)
        ty = np.trunc(fy).astype(np.int64)
        ok = (fx >= 0) & (fy >= 0) & (tx < matrix) & (ty < matrix)
        mask = pa.array(ok)
        return pa.table(
            {
                "tile_x": pa.array(tx[ok]),
                "tile_y": pa.array(ty[ok]),
                "event_type": batch["event_type"].filter(mask),
            }
        )

    per_type = partial_sum_groupby(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=16384),
        ["tile_x", "tile_y", "event_type"],
        [],
        count_alias="n_t",
        coalesce=8,
    )

    def square(batch: pa.Table) -> pa.Table:
        nt = batch["n_t"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tile_x": batch["tile_x"],
                "tile_y": batch["tile_y"],
                "n": batch["n_t"],
                "sum_sq": pa.array(nt * nt),
                "n_types": pa.array(np.ones(len(nt), dtype=np.int64)),
            }
        )

    return partial_sum_groupby(
        per_type.map_batches(square, batch_format="pyarrow"),
        ["tile_x", "tile_y"],
        ["n", "sum_sq", "n_types"],
        coalesce=4,
    )


def sql_tile_diversity(zoom: int = 6) -> str:
    span = f"(256.0 * (156543.033928041 / {float(1 << zoom)!r}))"
    matrix = 1 << zoom
    merc_x = "(lon * (pi() / 180.0) * 6378137.0)"
    merc_y = "(ln(tan((90.0 + lat) * (pi() / 360.0))) * 6378137.0)"
    fx = f"(({merc_x}) - (-20037508.3427892)) / {span}"
    fy = f"((20037508.3427892) - ({merc_y})) / {span}"
    return f"""
WITH {_sql_event_pos()},
t AS (
  SELECT CAST(trunc({fx}) AS BIGINT) AS tile_x,
         CAST(trunc({fy}) AS BIGINT) AS tile_y,
         e.event_type
  FROM pos p JOIN events e ON e.event_id = p.event_id
  WHERE ({fx}) >= 0 AND ({fy}) >= 0
    AND CAST(trunc({fx}) AS BIGINT) < {matrix}
    AND CAST(trunc({fy}) AS BIGINT) < {matrix}
),
c AS (
  SELECT tile_x, tile_y, event_type, count(*) AS n_t FROM t GROUP BY 1, 2, 3
)
SELECT tile_x, tile_y,
       CAST(sum(n_t) AS BIGINT) AS n,
       CAST(sum(n_t * n_t) AS BIGINT) AS sum_sq,
       CAST(count(*) AS BIGINT) AS n_types
FROM c GROUP BY 1, 2
"""


def q_tpch_q10(sf_dir: str, cutoff: str = "1997-01-01", k: int = 20):
    """TPC-H Q10 (returned-item revenue): customers ranked by the
    cent-exact revenue of their RETURNED lineitems (l_returnflag='R')
    on orders placed in the quarter after `cutoff` — the who-is-
    returning-the-most report. Top-k by (revenue DESC, custkey).

    Shape at 100 TB: date+flag predicates pushed to both scans; orders
    |x| lineitem is the two-sided hash join; per-customer revenue a
    combiner; the k-row finish per-block-pruned then driver-final
    (the tpch_q3 plan shape, different join/filters)."""
    import pyarrow.compute as pc

    from ..stages.agg import partial_sum_groupby

    lo_us = int(pd.Timestamp(cutoff).value // 1000)
    hi_us = int((pd.Timestamp(cutoff) + pd.DateOffset(months=3)).value // 1000)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(batch: pa.Table) -> pa.Table:
        od = (
            batch["o_orderdate"]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keep = (od >= lo_us) & (od < hi_us)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(pa.array(keep)),
                "o_custkey": batch["o_custkey"].filter(pa.array(keep)),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]
    )

    def l_filter(batch: pa.Table) -> pa.Table:
        keep = _str_eq(batch["l_returnflag"], "R")
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"].filter(pa.array(keep)),
                "rev_cents": pa.array(
                    np.trunc(ep * (1.0 - disc) * 100.0).astype(np.int64)
                ),
            }
        )

    joined = li.map_batches(l_filter, batch_format="pyarrow").join(
        orders.map_batches(o_filter, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=max(8, _ccpus() // 2),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    per_cust = partial_sum_groupby(
        joined, ["o_custkey"], ["rev_cents"], count_alias="n_items", coalesce=4
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["rev_cents", "o_custkey"], ascending=[False, True], kind="stable"
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    pdf = (
        per_cust.map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["rev_cents", "o_custkey"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    return pdf.astype(
        {"o_custkey": np.int64, "rev_cents": np.int64, "n_items": np.int64}
    )


def sql_tpch_q10(cutoff: str = "1997-01-01", k: int = 20) -> str:
    return f"""
SELECT o.o_custkey,
       CAST(sum(CAST(trunc(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
                AS BIGINT)) AS BIGINT) AS rev_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{cutoff}'
  AND o.o_orderdate < TIMESTAMP '{cutoff}' + INTERVAL 3 MONTH
GROUP BY 1
ORDER BY rev_cents DESC, o_custkey
LIMIT {k}
"""


def q_conversion_latency(sf_dir: str, window_s: int = 86400):
    """CLICK -> PURCHASE CONVERSION LATENCY histogram (the matched-pair
    complement of abandoned_clicks): for every click with a purchase by
    the same user within 24 h, the latency to the EARLIEST such
    purchase, bucketed exactly (<=1 min, <=1 h, <=6 h, <=24 h).

    Shape at 100 TB: same superbucketed per-user searchsorted as the
    anti-join — one skinny exchange, (bucket, n) combiner output."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    win_us = window_s * 1_000_000
    edges_us = np.array([60, 3600, 21600, 86400], dtype=np.int64) * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        is_p = _str_eq(batch["event_type"], "purchase")
        keep = _str_eq(batch["event_type"], "click") | is_p
        return pa.table(
            {
                "user_id": pa.array(
                    batch["user_id"].to_numpy(zero_copy_only=False)[keep]
                ),
                "ts_us": pa.array(
                    batch["ts"]
                    .cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_numpy()[keep]
                ),
                "is_purchase": pa.array(is_p[keep].astype(np.int8)),
            }
        )

    skinny = ds.map_batches(
        skinnify, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def scan(group: pd.DataFrame) -> pd.DataFrame:
        g, uid, starts, ends = _user_segments(group, ["ts_us"])
        ts = g["ts_us"].to_numpy()
        isp = g["is_purchase"].to_numpy()
        lat_all = []
        for s, e in zip(starts, ends):
            t = ts[s:e]
            p = t[isp[s:e] == 1]
            c = t[isp[s:e] == 0]
            if len(c) == 0 or len(p) == 0:
                continue
            idx = np.searchsorted(p, c, side="right")
            has = idx < len(p)
            lat = p[np.minimum(idx, len(p) - 1)] - c
            ok = has & (lat > 0) & (lat <= win_us)
            lat_all.append(lat[ok])
        lats = np.concatenate(lat_all) if lat_all else np.array([], dtype=np.int64)
        bucket = np.searchsorted(edges_us, lats, side="left")
        uniq, counts = np.unique(bucket, return_counts=True)
        return pd.DataFrame(
            {"bucket": uniq.astype(np.int64), "n": counts.astype(np.int64)}
        )

    parts = skinny.groupby("__ub").map_groups(scan, batch_format="pandas")
    return partial_sum_groupby(parts, ["bucket"], ["n"], coalesce=4)


SQL_CONVERSION_LATENCY = """
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT c.ts_us,
         (SELECT min(p.ts_us) FROM p
          WHERE p.user_id = c.user_id AND p.ts_us > c.ts_us) AS pts
  FROM c
),
l AS (
  SELECT pts - ts_us AS lat FROM m
  WHERE pts IS NOT NULL AND pts - ts_us <= 86400000000
)
SELECT CAST(CASE WHEN lat <= 60000000 THEN 0
                 WHEN lat <= 3600000000 THEN 1
                 WHEN lat <= 21600000000 THEN 2
                 ELSE 3 END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM l GROUP BY 1
"""


def q_weekday_mix(sf_dir: str):
    """WEEKDAY x EVENT-TYPE seasonality matrix (the day-of-week shape
    every forecasting/staffing model starts from): exact counts per
    (weekday, type), weekday = epoch_days mod 7 (0 = Thursday,
    1970-01-01 anchor — pure integer arithmetic, no timezone/locale
    functions to drift between engines).

    Shape at 100 TB: ONE stateless combiner; 35-row output."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table(
            {
                "weekday": pa.array(day % 7, pa.int64()),
                "event_type": batch["event_type"],
            }
        )

    return partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["weekday", "event_type"],
        [],
        count_alias="n",
        coalesce=4,
    )


SQL_WEEKDAY_MIX = """
SELECT (epoch_us(ts) // 86400000000) % 7 AS weekday, event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


def q_user_locality_depth(sf_dir: str, zoom: int = 16):
    """USER LOCALITY DEPTH histogram (quadkey longest-common-prefix —
    the discrete roaming-radius measure: the deepest tile that contains
    ALL of a user's events is their z16-quadkey LCP): per user,
    depth = zoom - bitlength(max(min_tx XOR max_tx, min_ty XOR max_ty))
    (pure integer bit math — the XOR of the bounding tile coords upper-
    bounds every pairwise prefix break); output = users per depth.

    Shape at 100 TB: ONE (user, min/max tile coords) combiner (min and
    max are associative), a stateless bit-math map, a tiny depth
    histogram combiner. The quadratic per-user pair scan never runs."""
    from ..core.tms import lonlat_to_webmercator_np
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_id"])
    span = 256.0 * (156543.033928041 / float(1 << zoom))
    origin = 20037508.3427892
    matrix = 1 << zoom

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, eid)
        mx, my = lonlat_to_webmercator_np(lon, lat)
        fx = (mx - (-origin)) / span
        fy = (origin - my) / span
        tx = np.trunc(fx).astype(np.int64)
        ty = np.trunc(fy).astype(np.int64)
        ok = (fx >= 0) & (fy >= 0) & (tx < matrix) & (ty < matrix)
        return pa.table(
            {
                "user_id": pa.array(uid[ok]),
                "tx0": pa.array(tx[ok]),
                "tx1": pa.array(tx[ok]),
                "ty0": pa.array(ty[ok]),
                "ty1": pa.array(ty[ok]),
            }
        )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id"]).aggregate(
            [("tx0", "min"), ("tx1", "max"), ("ty0", "min"), ("ty1", "max")]
        )
        return g.rename_columns(["user_id", "tx0", "tx1", "ty0", "ty1"])

    u = (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=16384)
        .map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
    )

    def depth(batch: pa.Table) -> pa.Table:
        m = np.maximum(
            batch["tx0"].to_numpy(zero_copy_only=False)
            ^ batch["tx1"].to_numpy(zero_copy_only=False),
            batch["ty0"].to_numpy(zero_copy_only=False)
            ^ batch["ty1"].to_numpy(zero_copy_only=False),
        )
        bl = np.frexp(m.astype(np.float64))[1]  # bitlength; frexp(0) -> 0
        return pa.table({"depth": pa.array(zoom - bl, pa.int64())})

    return partial_sum_groupby(
        u.map_batches(depth, batch_format="pyarrow"),
        ["depth"],
        [],
        count_alias="n_users",
        coalesce=4,
    )


def sql_user_locality_depth(zoom: int = 16) -> str:
    span = f"(256.0 * (156543.033928041 / {float(1 << zoom)!r}))"
    matrix = 1 << zoom
    merc_x = "(lon * (pi() / 180.0) * 6378137.0)"
    merc_y = "(ln(tan((90.0 + lat) * (pi() / 360.0))) * 6378137.0)"
    fx = f"(({merc_x}) - (-20037508.3427892)) / {span}"
    fy = f"((20037508.3427892) - ({merc_y})) / {span}"
    return f"""
WITH {_sql_event_pos()},
t AS (
  SELECT user_id,
         CAST(trunc({fx}) AS BIGINT) AS tx,
         CAST(trunc({fy}) AS BIGINT) AS ty
  FROM pos
  WHERE ({fx}) >= 0 AND ({fy}) >= 0
    AND CAST(trunc({fx}) AS BIGINT) < {matrix}
    AND CAST(trunc({fy}) AS BIGINT) < {matrix}
),
u AS (
  SELECT user_id, xor(min(tx), max(tx)) AS xx, xor(min(ty), max(ty)) AS xy
  FROM t GROUP BY 1
),
z AS (
  SELECT CASE WHEN greatest(xx, xy) = 0 THEN {zoom}
              ELSE {zoom} - length(bin(greatest(xx, xy))) END AS depth
  FROM u
)
SELECT CAST(depth AS BIGINT) AS depth, CAST(count(*) AS BIGINT) AS n_users
FROM z GROUP BY 1
"""


def q_tile_activity_span(sf_dir: str, zoom: int = 6):
    """TILE TEMPORAL PERSISTENCE (coverage stability: is a cell's
    activity a one-day burst or steady?): per z-level tile, the number
    of DISTINCT active days plus the first/last active day — the
    churn-vs-stable classification input for cache/invalidations.

    Shape at 100 TB: (tile, day) dedup combiner -> per-tile
    count/min/max rollup; both exchanges lattice-bounded."""
    from ..core.tms import lonlat_to_webmercator_np
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    span = 256.0 * (156543.033928041 / float(1 << zoom))
    origin = 20037508.3427892
    matrix = 1 << zoom
    DAY_US = 86400 * 1_000_000

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, eid)
        mx, my = lonlat_to_webmercator_np(lon, lat)
        fx = (mx - (-origin)) / span
        fy = (origin - my) / span
        tx = np.trunc(fx).astype(np.int64)
        ty = np.trunc(fy).astype(np.int64)
        ok = (fx >= 0) & (fy >= 0) & (tx < matrix) & (ty < matrix)
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )[ok]
        return pa.table(
            {
                "tile_x": pa.array(tx[ok]),
                "tile_y": pa.array(ty[ok]),
                "day": pa.array(day, pa.int64()),
            }
        )

    tile_days = partial_sum_groupby(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=16384),
        ["tile_x", "tile_y", "day"],
        [],
        count_alias="n_ev",
        coalesce=8,
    )

    def rollup(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["tile_x", "tile_y"]).aggregate(
            [("day", "count"), ("day", "min"), ("day", "max"), ("n_ev", "sum")]
        )
        return g.rename_columns(
            ["tile_x", "tile_y", "n_days", "first_day", "last_day", "n_events"]
        )

    def merge(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["tile_x", "tile_y"]).aggregate(
            [
                ("n_days", "sum"),
                ("first_day", "min"),
                ("last_day", "max"),
                ("n_events", "sum"),
            ]
        )
        return g.rename_columns(
            ["tile_x", "tile_y", "n_days", "first_day", "last_day", "n_events"]
        )

    # the (tile, day) rows for one tile may span blocks: rollup partials
    # then merge (count of distinct days = sum of partial counts only
    # after the dedup combiner above made (tile, day) unique)
    return (
        tile_days.map_batches(rollup, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )


def sql_tile_activity_span(zoom: int = 6) -> str:
    span = f"(256.0 * (156543.033928041 / {float(1 << zoom)!r}))"
    matrix = 1 << zoom
    merc_x = "(lon * (pi() / 180.0) * 6378137.0)"
    merc_y = "(ln(tan((90.0 + lat) * (pi() / 360.0))) * 6378137.0)"
    fx = f"(({merc_x}) - (-20037508.3427892)) / {span}"
    fy = f"((20037508.3427892) - ({merc_y})) / {span}"
    return f"""
WITH {_sql_event_pos()},
t AS (
  SELECT CAST(trunc({fx}) AS BIGINT) AS tile_x,
         CAST(trunc({fy}) AS BIGINT) AS tile_y,
         p.ts_us // 86400000000 AS day
  FROM pos p
  WHERE ({fx}) >= 0 AND ({fy}) >= 0
    AND CAST(trunc({fx}) AS BIGINT) < {matrix}
    AND CAST(trunc({fy}) AS BIGINT) < {matrix}
),
d AS (SELECT tile_x, tile_y, day, count(*) AS n_ev FROM t GROUP BY 1, 2, 3)
SELECT tile_x, tile_y,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(min(day) AS BIGINT) AS first_day,
       CAST(max(day) AS BIGINT) AS last_day,
       CAST(sum(n_ev) AS BIGINT) AS n_events
FROM d GROUP BY 1, 2
"""


def q_type_cooccurrence(sf_dir: str):
    """EVENT-TYPE CO-OCCURRENCE within (user, hour) windows (the
    behavioral basket analysis: which behaviors happen together in the
    same session-hour): unordered type pairs counted once per (user,
    hour) that contains both. Exact.

    Shape at 100 TB: (user, hour, type) dedup combiner -> 512-way
    user-hour superbucket -> vectorized per-window pair emit (types
    bounded by 5, so C(5,2) max per window) -> tiny pair combiner."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    HOUR_US = 3600 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        hour = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // HOUR_US
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "hour": pa.array(hour, pa.int64()),
                "event_type": batch["event_type"],
            }
        )

    distinct = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["user_id", "hour", "event_type"],
        [],
        count_alias="_c",
        coalesce=8,
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        # Fully vectorized pair emit: dictionary-encode the (bounded)
        # type vocabulary to int codes, sort windows, then one
        # triu_indices template per window-size class k (k <= n_types,
        # so <= 5 classes) — no per-window Python loop. Pairs are
        # counted locally via a packed-code bincount, so the bucket
        # emits at most n_types^2 partial rows, not one row per pair.
        cat = group["event_type"].astype("category")
        codes = cat.cat.codes.to_numpy().astype(np.int64)
        uid = group["user_id"].to_numpy()
        hr = group["hour"].to_numpy()
        order = np.lexsort((codes, hr, uid))
        uid, hr, codes = uid[order], hr[order], codes[order]
        new_w = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (hr[1:] != hr[:-1]))
        )
        starts = np.nonzero(new_w)[0]
        ends = np.concatenate((starts[1:], [len(codes)]))
        seglen = ends - starts
        out_a, out_b = [], []
        for k in np.unique(seglen):
            if k < 2:
                continue
            sel = starts[seglen == k]
            ia, ib = np.triu_indices(int(k), k=1)
            out_a.append(codes[(sel[:, None] + ia[None, :]).ravel()])
            out_b.append(codes[(sel[:, None] + ib[None, :]).ravel()])
        n_t = len(cat.cat.categories)
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            cnt = np.bincount(a * n_t + b, minlength=n_t * n_t)
        else:
            cnt = np.zeros(n_t * n_t, dtype=np.int64)
        nz = np.nonzero(cnt)[0]
        cats = np.asarray(cat.cat.categories, dtype=object)
        return pd.DataFrame(
            {
                "type_a": cats[nz // n_t],
                "type_b": cats[nz % n_t],
                "n": cnt[nz].astype(np.int64),
            }
        )

    parts = distinct.groupby("__ub").map_groups(pairs, batch_format="pandas")
    return partial_sum_groupby(parts, ["type_a", "type_b"], ["n"], coalesce=4)


SQL_TYPE_COOCCURRENCE = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hour, event_type
  FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n
FROM d a JOIN d b
  ON b.user_id = a.user_id AND b.hour = a.hour
 AND a.event_type < b.event_type
GROUP BY 1, 2
"""


def q_activity_heatmap(sf_dir: str):
    """WEEKDAY x HOUR activity heatmap (the 7x24 staffing/capacity
    grid): exact counts per (weekday, hour-of-day), both pure integer
    epoch arithmetic. ONE stateless combiner; 168-row output."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["ts"])
    HOUR_US = 3600 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "weekday": pa.array((us // (86400 * 1_000_000)) % 7, pa.int64()),
                "hour": pa.array((us // HOUR_US) % 24, pa.int64()),
            }
        )

    return partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["weekday", "hour"],
        [],
        count_alias="n",
        coalesce=4,
    )


SQL_ACTIVITY_HEATMAP = """
SELECT (epoch_us(ts) // 86400000000) % 7 AS weekday,
       (epoch_us(ts) // 3600000000) % 24 AS hour,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


# ---- round 5: six new plan shapes (outer/semi joins, recursive EWMA,
# ---- gaps-and-islands streaks, set-difference churn, IQR outlier gate) -----


def q_full_outer_hours(sf_dir: str):
    """FULL OUTER JOIN of two derived hourly series (signup counts vs
    purchase counts per hour-of-epoch): the canonical reconciliation
    shape where either side can be missing — sparse hours produce
    genuine left-only/right-only rows, coalesced to 0. Exercises Ray's
    Dataset.join(join_type="full_outer") end to end.

    Shape at 100 TB: each side folds through a (hour) count combiner to
    the time dimension BEFORE the join, so the full-outer exchange is
    hour-dimension, never event-dimension."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    HOUR_US = 3600 * 1_000_000

    def side(ev_type: str, alias: str):
        def skinnify(batch: pa.Table) -> pa.Table:
            keep = _str_eq(batch["event_type"], ev_type)
            hour = (
                batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
                // HOUR_US
            )[keep]
            return pa.table({"hour": pa.array(hour, pa.int64())})

        return partial_sum_groupby(
            ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
            ["hour"],
            [],
            count_alias=alias,
            coalesce=4,
        )

    joined = side("signup", "n_signup").join(
        side("purchase", "n_purchase"),
        join_type="full_outer",
        num_partitions=max(2, _ccpus() // 8),
        on=("hour",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": batch["hour"],
                "n_signup": pc.coalesce(batch["n_signup"], 0).cast(pa.int64()),
                "n_purchase": pc.coalesce(batch["n_purchase"], 0).cast(pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_FULL_OUTER_HOURS = """
WITH s AS (
  SELECT epoch_us(ts) // 3600000000 AS hour, CAST(count(*) AS BIGINT) AS n_signup
  FROM events WHERE event_type = 'signup' GROUP BY 1
), p AS (
  SELECT epoch_us(ts) // 3600000000 AS hour, CAST(count(*) AS BIGINT) AS n_purchase
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT coalesce(s.hour, p.hour) AS hour,
       coalesce(n_signup, 0) AS n_signup,
       coalesce(n_purchase, 0) AS n_purchase
FROM s FULL OUTER JOIN p ON s.hour = p.hour
"""


def q_semi_join_orders(sf_dir: str, qty: float = 48.0):
    """SEMI JOIN (EXISTS): orders having at least one high-quantity
    lineitem, rolled up per order priority (count + cent-exact total).
    Exercises Ray's Dataset.join(join_type="left_semi") — the
    no-duplication existence probe that a plain inner join would get
    wrong (an order with 3 qualifying lineitems must count once).

    Shape at 100 TB: the probe side folds to DISTINCT qualifying order
    keys via a per-batch dedup combiner before the semi join, so the
    exchange carries each key once; the rollup is a tiny combiner."""
    from ..stages.agg import partial_min_groupby, partial_sum_groupby

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def l_filter(batch: pa.Table) -> pa.Table:
        keep = batch["l_quantity"].to_numpy(zero_copy_only=False) >= qty
        return pa.table({"l_orderkey": batch["l_orderkey"].filter(pa.array(keep))})

    keys = partial_min_groupby(
        li.map_batches(l_filter, batch_format="pyarrow"),
        ["l_orderkey"],
        [],
        coalesce=8,
    )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def o_skinny(batch: pa.Table) -> pa.Table:
        cents = np.trunc(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_orderpriority": batch["o_orderpriority"],
                "cents": pa.array(cents),
            }
        )

    hit = orders.map_batches(o_skinny, batch_format="pyarrow").join(
        keys,
        join_type="left_semi",
        num_partitions=max(8, _ccpus() // 2),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    agg = partial_sum_groupby(
        hit, ["o_orderpriority"], ["cents"], count_alias="n_orders", coalesce=4
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["o_orderpriority", "total_cents", "n_orders"]
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_semi_join_orders(qty: float = 48.0) -> str:
    return f"""
SELECT o_orderpriority,
       CAST(sum(CAST(trunc(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= {qty})
GROUP BY 1
"""


def q_ewma_daily(sf_dir: str, half: bool = True):
    """EWMA smoothing of the daily event count (alpha = 1/2): the
    recursive time-series operator SQL needs a RECURSIVE CTE for.
    e_1 = c_1; e_t = (c_t + e_{t-1}) / 2 — with alpha exactly one half
    every term is a dyadic rational, so float64 is EXACT on both
    engines and the value hash is deterministic.

    Shape at 100 TB: one (day) count combiner folds the corpus to the
    time dimension; the recurrence runs on that bounded series (a
    dimension table, like tile_cost_dist's occupied-tile list) — the
    sequential scan is inherent to the operator's data dependency."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["ts"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table({"day": pa.array(day, pa.int64())})

    daily = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["day"],
        [],
        count_alias="n",
        coalesce=4,
    ).to_pandas()  # day-dimension (bounded)
    daily = daily.sort_values("day").reset_index(drop=True)
    n = daily["n"].to_numpy().astype(np.float64)
    e = np.empty(len(n), dtype=np.float64)
    for i in range(len(n)):
        e[i] = n[i] if i == 0 else (n[i] + e[i - 1]) / 2.0
    return pa.table(
        {
            "day": pa.array(daily["day"].to_numpy(), pa.int64()),
            "n": pa.array(daily["n"].to_numpy(), pa.int64()),
            "ewma": pa.array(e, pa.float64()),
        }
    )


SQL_EWMA_DAILY = """
WITH RECURSIVE d AS (
  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), o AS (
  SELECT day, n, row_number() OVER (ORDER BY day) AS rn FROM d
), r AS (
  SELECT day, n, rn, CAST(n AS DOUBLE) AS ewma FROM o WHERE rn = 1
  UNION ALL
  SELECT o.day, o.n, o.rn, (CAST(o.n AS DOUBLE) + r.ewma) / 2.0
  FROM o JOIN r ON o.rn = r.rn + 1
)
SELECT day, n, ewma FROM r
"""


def q_activity_streaks(sf_dir: str):
    """LONGEST CONSECUTIVE-DAY STREAK per user, as a streak-length
    histogram (the gaps-and-islands engagement metric). Exact.

    Shape at 100 TB: (user, day) dedup combiner folds the corpus to
    active user-days; ONE 512-way user superbucket groupby; inside a
    bucket one sort and fully vectorized island detection (boundary
    where user changes or day gap != 1, segment max via reduceat) — no
    per-user loop; the histogram is a tiny combiner."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table(
            {"user_id": batch["user_id"], "day": pa.array(day, pa.int64())}
        )

    dedup = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["user_id", "day"],
        [],
        count_alias="_c",
        coalesce=8,
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def streaks(group: pd.DataFrame) -> pd.DataFrame:
        uid = group["user_id"].to_numpy()
        day = group["day"].to_numpy()
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        # island starts: new user OR day gap != 1
        new_island = np.ones(len(uid), dtype=bool)
        if len(uid) > 1:
            new_island[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1] + 1)
        starts = np.nonzero(new_island)[0]
        ends = np.concatenate((starts[1:], [len(uid)]))
        ilen = ends - starts  # island lengths
        iuid = uid[starts]
        # per-user max island length (islands are user-contiguous)
        ubnd = np.nonzero(iuid[1:] != iuid[:-1])[0] + 1
        ustarts = np.concatenate(([0], ubnd))
        umax = np.maximum.reduceat(ilen, ustarts) if len(ilen) else ilen
        return (
            pd.DataFrame({"streak_len": umax})
            .groupby("streak_len", sort=False)
            .size()
            .reset_index(name="n_partial")
        )

    parts = dedup.groupby("__ub").map_groups(streaks, batch_format="pandas")
    agg = partial_sum_groupby(parts, ["streak_len"], ["n_partial"], coalesce=2)

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["streak_len", "n_users"])

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_ACTIVITY_STREAKS = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), g AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
), i AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS ilen FROM g GROUP BY user_id, grp
), m AS (
  SELECT user_id, max(ilen) AS streak_len FROM i GROUP BY 1
)
SELECT streak_len, CAST(count(*) AS BIGINT) AS n_users FROM m GROUP BY 1
"""


def q_churned_users(sf_dir: str):
    """HABIT-CELL CHURN (set difference over time halves): classify
    every (user, hour-of-day) habit cell as retained (active both
    halves), churned (first half only) or new (second half only) by the
    corpus-midpoint day — the behavioral-shift decomposition. The
    hour-of-day grain keeps all three classes populated (plain per-user
    churn is degenerate on this corpus: every user is active in both
    halves). The midpoint derives from the data (min/max day) in a
    first tiny aggregate pass.

    Shape at 100 TB: pass 1 is a scalar min/max combiner; pass 2 folds
    the corpus to per-cell half-activity FLAGS via a max-combiner
    (flags are 0/1 ints, max = logical OR); the 2x2 rollup is a tiny
    combiner. Nothing cell-dimension ever sorts."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    DAY_US = 86400 * 1_000_000

    # pass 1: corpus day range (scalar)
    def day_minmax(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table(
            {
                "dmin": pa.array([int(day.min())], pa.int64()),
                "dmax": pa.array([int(day.max())], pa.int64()),
            }
        )

    rng = ds.map_batches(day_minmax, batch_format="pyarrow").to_pandas()
    dmin, dmax = int(rng["dmin"].min()), int(rng["dmax"].max())
    mid = (dmin + dmax + 1) // 2  # first day of the second half

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        hod = (us // (3600 * 1_000_000)) % 24
        return pa.table(
            {
                "user_id": batch["user_id"],
                "hod": pa.array(hod, pa.int64()),
                "h1": pa.array((day < mid).astype(np.int64)),
                "h2": pa.array((day >= mid).astype(np.int64)),
            }
        )

    # max-combiner == logical OR of the half flags per habit cell
    from ..stages.agg import partial_max_groupby

    flags = partial_max_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["user_id", "hod"],
        ["h1", "h2"],
        coalesce=8,
    )

    def classify(batch: pa.Table) -> pa.Table:
        h1 = batch["h1"].to_numpy(zero_copy_only=False)
        h2 = batch["h2"].to_numpy(zero_copy_only=False)
        status = np.where(
            (h1 > 0) & (h2 > 0), "retained", np.where(h1 > 0, "churned", "new")
        )
        return pa.table({"status": pa.array(status.tolist(), pa.string())})

    return partial_sum_groupby(
        flags.map_batches(classify, batch_format="pyarrow"),
        ["status"],
        [],
        count_alias="n_cells",
        coalesce=2,
    )


SQL_CHURNED_USERS = """
WITH b AS (
  SELECT min(epoch_us(ts) // 86400000000) AS dmin,
         max(epoch_us(ts) // 86400000000) AS dmax
  FROM events
), f AS (
  SELECT user_id, (epoch_us(ts) // 3600000000) % 24 AS hod,
         max(CASE WHEN epoch_us(ts) // 86400000000 <  (dmin + dmax + 1) // 2
                  THEN 1 ELSE 0 END) AS h1,
         max(CASE WHEN epoch_us(ts) // 86400000000 >= (dmin + dmax + 1) // 2
                  THEN 1 ELSE 0 END) AS h2
  FROM events, b GROUP BY 1, 2
)
SELECT CASE WHEN h1 > 0 AND h2 > 0 THEN 'retained'
            WHEN h1 > 0 THEN 'churned' ELSE 'new' END AS status,
       CAST(count(*) AS BIGINT) AS n_cells
FROM f GROUP BY 1
"""


def q_iqr_outliers(sf_dir: str):
    """IQR OUTLIER GATE per event type (the Tukey-fence data-quality
    rule): values outside [q1 - 1.5*IQR, q3 + 1.5*IQR] where q1/q3 are
    the exact DISCRETE quartiles (quantile_disc: the ceil(q*n)th
    smallest) of the cent-quantized value — all-integer bounds times 2
    (to keep 1.5x exact), so the comparison is exact at any parallelism.

    Shape at 100 TB: same value-histogram selection as grouped_median —
    a (type, cents) count combiner folds the corpus to its
    distinct-value dimension, quartiles pick on the per-type sorted
    histogram, and the outlier count sums histogram buckets outside the
    fences. No second scan of the corpus, no per-row shuffle."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def skinnify(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {"event_type": batch["event_type"], "cents": pa.array(cents)}
        )

    hist = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["event_type", "cents"],
        [],
        count_alias="n",
        coalesce=4,
    )

    def gate(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents", kind="stable")
        n = g["n"].to_numpy()
        v = g["cents"].to_numpy()
        cum = np.cumsum(n)
        total = int(cum[-1])
        q1 = int(v[np.searchsorted(cum, int(np.ceil(0.25 * total)))])
        q3 = int(v[np.searchsorted(cum, int(np.ceil(0.75 * total)))])
        iqr = q3 - q1
        lo2, hi2 = 2 * q1 - 3 * iqr, 2 * q3 + 3 * iqr  # fences x2, all int
        out_mask = (2 * v < lo2) | (2 * v > hi2)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [total],
                "q1_cents": [q1],
                "q3_cents": [q3],
                "n_outliers": [int(n[out_mask].sum())],
            }
        )

    return hist.groupby("event_type").map_groups(gate, batch_format="pandas")


SQL_IQR_OUTLIERS = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS cents FROM events
), q AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         quantile_disc(cents, 0.25) AS q1_cents,
         quantile_disc(cents, 0.75) AS q3_cents
  FROM c GROUP BY 1
)
SELECT q.event_type, q.n, q.q1_cents, q.q3_cents,
       CAST(count(*) FILTER (
         2 * c.cents < 2 * q1_cents - 3 * (q3_cents - q1_cents)
         OR 2 * c.cents > 2 * q3_cents + 3 * (q3_cents - q1_cents)
       ) AS BIGINT) AS n_outliers
FROM q JOIN c ON c.event_type = q.event_type
GROUP BY 1, 2, 3, 4
"""


def q_last_touch_attribution(sf_dir: str):
    """LAST-TOUCH ATTRIBUTION: every purchase is credited to the user's
    most recent PRIOR non-purchase event (strict (ts, event_id) order;
    purchases with no prior touch credit 'none') — the marketing
    attribution argmax-before-each-anchor shape. Output: per touch type,
    attributed purchase count.

    Shape at 100 TB: skinny (user, ts, id, typecode) rows; ONE 512-way
    user superbucket groupby; inside a bucket one sort + a vectorized
    running last-non-purchase index (maximum.accumulate over positions,
    user-boundary checked by uid equality at the credited index) — no
    per-user loop; (type, n) partials -> tiny combiner."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def skinnify(batch: pa.Table) -> pa.Table:
        tcode, cats = _str_codes(batch["event_type"])
        # stable global code: crc32 of the type string, computed once
        # per DISTINCT type so merged buckets agree across batches
        import zlib

        cat_crc = np.fromiter(
            (zlib.crc32(t.encode()) & 0x7FFFFFFF for t in cats),
            dtype=np.int64,
            count=len(cats),
        )
        is_p = _str_eq(batch["event_type"], "purchase")
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "is_p": pa.array(is_p.astype(np.int8)),
            }
        )

    skinny = ds.map_batches(
        skinnify, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def attribute(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        is_p = g["is_p"].to_numpy().astype(bool)
        typ = g["event_type"].to_numpy()
        idx = np.arange(len(uid))
        last_np = np.maximum.accumulate(np.where(~is_p, idx, -1))
        p_pos = idx[is_p]
        j = last_np[p_pos]
        ok = (j >= 0) & (uid[np.maximum(j, 0)] == uid[p_pos])
        touch = np.where(ok, typ[np.maximum(j, 0)], "none")
        return (
            pd.DataFrame({"touch_type": touch})
            .groupby("touch_type", sort=False)
            .size()
            .reset_index(name="n_partial")
        )

    parts = skinny.groupby("__ub").map_groups(attribute, batch_format="pandas")
    agg = partial_sum_groupby(parts, ["touch_type"], ["n_partial"], coalesce=2)

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["touch_type", "n"])

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_LAST_TOUCH_ATTRIBUTION = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), p AS (
  SELECT user_id, event_id, ts_us FROM e WHERE event_type = 'purchase'
), x AS (
  SELECT p.event_id AS pid,
         (SELECT n.event_type FROM e n
          WHERE n.user_id = p.user_id AND n.event_type != 'purchase'
            AND (n.ts_us < p.ts_us
                 OR (n.ts_us = p.ts_us AND n.event_id < p.event_id))
          ORDER BY n.ts_us DESC, n.event_id DESC LIMIT 1) AS touch
  FROM p
)
SELECT coalesce(touch, 'none') AS touch_type, CAST(count(*) AS BIGINT) AS n
FROM x GROUP BY 1
"""


def q_pareto_tiles(sf_dir: str, zoom: int = 6, shares=(50, 80, 90, 99)):
    """PARETO COVERAGE CURVE of spatial concentration: the minimum
    number of z6 tiles that cover >= P% of all located events, for P in
    {50, 80, 90, 99} (the "how concentrated is the corpus" planning
    number behind cache sizing and hot-shard budgets). Ordering is
    deterministic: tiles by (count DESC, tile_x, tile_y); all-integer
    comparison (100 * cumsum >= P * total).

    Shape at 100 TB: ONE (tile) count combiner folds the corpus to the
    lattice dimension; the cumulative scan runs on that bounded
    histogram driver-side (a dimension table)."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_id"])
    span = 256.0 * (156543.033928041 / float(1 << zoom))
    origin = 20037508.3427892
    matrix = 1 << zoom

    def tag(batch: pa.Table) -> pa.Table:
        from ..core.tms import lonlat_to_webmercator_np

        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, eid)
        mx, my = lonlat_to_webmercator_np(lon, lat)
        fx = (mx - (-origin)) / span
        fy = (origin - my) / span
        tx = np.trunc(fx).astype(np.int64)
        ty = np.trunc(fy).astype(np.int64)
        ok = (fx >= 0) & (fy >= 0) & (tx < matrix) & (ty < matrix)
        return pa.table(
            {"tile_x": pa.array(tx[ok]), "tile_y": pa.array(ty[ok])}
        )

    hist = partial_sum_groupby(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=16384),
        ["tile_x", "tile_y"],
        [],
        count_alias="n",
        coalesce=4,
    ).to_pandas()  # lattice-dimension-bounded
    order = np.lexsort(
        (hist["tile_y"].to_numpy(), hist["tile_x"].to_numpy(), -hist["n"].to_numpy())
    )
    n = hist["n"].to_numpy()[order]
    cum = np.cumsum(n)
    total = int(cum[-1]) if len(cum) else 0
    out_p, out_k, out_cov = [], [], []
    for p in shares:
        k = int(np.searchsorted(100 * cum, p * total, side="left")) + 1
        out_p.append(p)
        out_k.append(k)
        out_cov.append(int(cum[k - 1]))
    return pa.table(
        {
            "share_pct": pa.array(out_p, pa.int64()),
            "n_tiles": pa.array(out_k, pa.int64()),
            "n_covered": pa.array(out_cov, pa.int64()),
        }
    )


def sql_pareto_tiles(zoom: int = 6, shares=(50, 80, 90, 99)) -> str:
    span = f"(256.0 * (156543.033928041 / {float(1 << zoom)!r}))"
    matrix = 1 << zoom
    merc_x = "(lon * (pi() / 180.0) * 6378137.0)"
    merc_y = "(ln(tan((90.0 + lat) * (pi() / 360.0))) * 6378137.0)"
    fx = f"(({merc_x}) - (-20037508.3427892)) / {span}"
    fy = f"((20037508.3427892) - ({merc_y})) / {span}"
    vals = ", ".join(f"({p})" for p in shares)
    return f"""
WITH {_sql_event_pos()},
t AS (
  SELECT CAST(trunc({fx}) AS BIGINT) AS tile_x,
         CAST(trunc({fy}) AS BIGINT) AS tile_y,
         CAST(count(*) AS BIGINT) AS n
  FROM pos p
  WHERE ({fx}) >= 0 AND ({fy}) >= 0
    AND CAST(trunc({fx}) AS BIGINT) < {matrix}
    AND CAST(trunc({fy}) AS BIGINT) < {matrix}
  GROUP BY 1, 2
), c AS (
  SELECT sum(n) OVER (ORDER BY n DESC, tile_x, tile_y
                      ROWS UNBOUNDED PRECEDING) AS cum,
         row_number() OVER (ORDER BY n DESC, tile_x, tile_y) AS k,
         sum(n) OVER () AS total
  FROM t
), p(share_pct) AS (VALUES {vals})
SELECT CAST(share_pct AS BIGINT) AS share_pct,
       CAST(min(k) AS BIGINT) AS n_tiles,
       CAST(min(cum) AS BIGINT) AS n_covered
FROM p JOIN c ON 100 * cum >= share_pct * total
GROUP BY 1
"""


def q_moving_avg_daily(sf_dir: str, window_d: int = 7):
    """TRAILING 7-DAY WINDOW SUM of daily event counts per type (the
    moving-average smoothing every ops dashboard draws): for each
    (type, day) present in the data, n and the sum over [day-6, day].
    Exact integers.

    Shape at 100 TB: a (type, day) count combiner folds the corpus to
    the time dimension; each day-count DONATES itself to the 7 windows
    it supports (the rolling_wau donation pattern — skinny explode on
    the bounded day dimension, no per-day rescan); one combiner sums
    donations, own-day rows filter absent days out."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table(
            {"event_type": batch["event_type"], "day": pa.array(day, pa.int64())}
        )

    daily = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["event_type", "day"],
        [],
        count_alias="n",
        coalesce=4,
    )

    def donate(batch: pa.Table) -> pa.Table:
        typ = batch["event_type"]
        day = batch["day"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        outs = []
        for off in range(window_d):
            outs.append(
                pa.table(
                    {
                        "event_type": typ,
                        "day": pa.array(day + off, pa.int64()),
                        "n7": pa.array(n),
                        "n_self": pa.array(
                            n if off == 0 else np.zeros(len(n), np.int64)
                        ),
                    }
                )
            )
        return pa.concat_tables(outs)

    win = partial_sum_groupby(
        daily.map_batches(donate, batch_format="pyarrow"),
        ["event_type", "day"],
        ["n7", "n_self"],
        coalesce=4,
    )

    def finish(batch: pa.Table) -> pa.Table:
        keep = batch["n_self"].to_numpy(zero_copy_only=False) > 0
        m = pa.array(keep)
        return pa.table(
            {
                "event_type": batch["event_type"].filter(m),
                "day": batch["day"].filter(m),
                "n": batch["n_self"].filter(m),
                "n7": batch["n7"].filter(m),
            }
        )

    return win.map_batches(finish, batch_format="pyarrow")


SQL_MOVING_AVG_DAILY = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
                         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n7
FROM d
"""


def q_scd2_intervals(sf_dir: str):
    """SCD2 VALIDITY INTERVALS: treating each (user, event_type) stream
    as versioned records, the validity interval of an event runs to the
    NEXT event of the same key (lead()); rollup per type: interval
    count, total and max covered microseconds. The
    slowly-changing-dimension reconstruction shape.

    Shape at 100 TB: skinny (user, type-code, ts, id) rows; ONE 512-way
    user superbucket groupby; one sort + a vectorized next-diff masked
    at (user, type) boundaries; (type, n, sum, max) partials -> tiny
    combiner."""
    from ..stages.agg import partial_max_groupby, partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def skinnify(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
            }
        )

    skinny = ds.map_batches(
        skinnify, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def intervals(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["user_id", "event_type", "ts_us", "event_id"], kind="stable"
        )
        uid = g["user_id"].to_numpy()
        typ = g["event_type"].to_numpy()
        ts = g["ts_us"].to_numpy()
        same = (uid[1:] == uid[:-1]) & (typ[1:] == typ[:-1])
        gap = (ts[1:] - ts[:-1])[same]
        tt = typ[:-1][same]
        df = pd.DataFrame({"event_type": tt, "gap": gap})
        out = df.groupby("event_type", sort=False).agg(
            n_intervals=("gap", "size"),
            total_us=("gap", "sum"),
            max_us=("gap", "max"),
        )
        return out.reset_index()

    parts = skinny.groupby("__ub").map_groups(intervals, batch_format="pandas")
    sums = partial_sum_groupby(
        parts, ["event_type"], ["n_intervals", "total_us"], coalesce=2
    )
    maxes = partial_max_groupby(parts, ["event_type"], ["max_us"], coalesce=2)
    joined = sums.join(
        maxes,
        join_type="inner",
        num_partitions=max(2, _ccpus() // 8),
        on=("event_type",),
    )
    return joined.map_batches(
        lambda b: b.select(["event_type", "n_intervals", "total_us", "max_us"]),
        batch_format="pyarrow",
    )


SQL_SCD2_INTERVALS = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
), l AS (
  SELECT event_type,
         lead(ts_us) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts_us, event_id) - ts_us AS gap
  FROM e
)
SELECT event_type,
       CAST(count(gap) AS BIGINT) AS n_intervals,
       CAST(sum(gap) AS BIGINT) AS total_us,
       CAST(max(gap) AS BIGINT) AS max_us
FROM l WHERE gap IS NOT NULL GROUP BY 1
"""


def q_top2_gap_tiles(sf_dir: str, zoom: int = 6):
    """TOP-2 MARGIN per tile: the dominant event type, its count, and
    the gap to the runner-up (0 when a tile has one type) — the
    classification-confidence margin for every spatial cell,
    deterministic tiebreak (count DESC, type ASC).

    Shape at 100 TB: (tile, type) count combiner -> 512-way tile
    superbucket -> ONE in-bucket lexsort + segment-head/second pick
    (vectorized, no per-tile loop). Output lattice-bounded."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_id", "event_type"])
    span = 256.0 * (156543.033928041 / float(1 << zoom))
    origin = 20037508.3427892
    matrix = 1 << zoom

    def tag(batch: pa.Table) -> pa.Table:
        from ..core.tms import lonlat_to_webmercator_np

        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, eid)
        mx, my = lonlat_to_webmercator_np(lon, lat)
        fx = (mx - (-origin)) / span
        fy = (origin - my) / span
        tx = np.trunc(fx).astype(np.int64)
        ty = np.trunc(fy).astype(np.int64)
        ok = (fx >= 0) & (fy >= 0) & (tx < matrix) & (ty < matrix)
        m = pa.array(ok)
        return pa.table(
            {
                "tile_x": pa.array(tx[ok]),
                "tile_y": pa.array(ty[ok]),
                "event_type": batch["event_type"].filter(m),
            }
        )

    per_type = partial_sum_groupby(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=16384),
        ["tile_x", "tile_y", "event_type"],
        [],
        count_alias="n",
        coalesce=8,
    ).map_batches(
        lambda b: b.append_column(
            "__tb",
            pa.array(
                (
                    (
                        (
                            b["tile_x"].to_numpy(zero_copy_only=False) * 131071
                            + b["tile_y"].to_numpy(zero_copy_only=False)
                        )
                        & np.int64(0x7FFFFFFF)
                    )
                    * np.int64(2654435761)
                )
                % np.int64(512)
            ),
        ),
        batch_format="pyarrow",
    )

    def top2(group: pd.DataFrame) -> pd.DataFrame:
        tx = group["tile_x"].to_numpy()
        ty = group["tile_y"].to_numpy()
        typ = group["event_type"].to_numpy()
        n = group["n"].to_numpy()
        order = np.lexsort((typ, -n, ty, tx))
        tx, ty, typ, n = tx[order], ty[order], typ[order], n[order]
        new_tile = np.ones(len(tx), dtype=bool)
        new_tile[1:] = (tx[1:] != tx[:-1]) | (ty[1:] != ty[:-1])
        starts = np.nonzero(new_tile)[0]
        ends = np.concatenate((starts[1:], [len(tx)]))
        second = np.where(ends - starts >= 2, n[np.minimum(starts + 1, len(n) - 1)], 0)
        return pd.DataFrame(
            {
                "tile_x": tx[starts],
                "tile_y": ty[starts],
                "top_type": typ[starts],
                "n_top": n[starts],
                "gap": n[starts] - second,
            }
        )

    return per_type.groupby("__tb").map_groups(top2, batch_format="pandas")


def sql_top2_gap_tiles(zoom: int = 6) -> str:
    span = f"(256.0 * (156543.033928041 / {float(1 << zoom)!r}))"
    matrix = 1 << zoom
    merc_x = "(lon * (pi() / 180.0) * 6378137.0)"
    merc_y = "(ln(tan((90.0 + lat) * (pi() / 360.0))) * 6378137.0)"
    fx = f"(({merc_x}) - (-20037508.3427892)) / {span}"
    fy = f"((20037508.3427892) - ({merc_y})) / {span}"
    return f"""
WITH {_sql_event_pos()},
t AS (
  SELECT CAST(trunc({fx}) AS BIGINT) AS tile_x,
         CAST(trunc({fy}) AS BIGINT) AS tile_y,
         e.event_type, CAST(count(*) AS BIGINT) AS n
  FROM pos p JOIN events e ON e.event_id = p.event_id
  WHERE ({fx}) >= 0 AND ({fy}) >= 0
    AND CAST(trunc({fx}) AS BIGINT) < {matrix}
    AND CAST(trunc({fy}) AS BIGINT) < {matrix}
  GROUP BY 1, 2, 3
), r AS (
  SELECT tile_x, tile_y, event_type, n,
         row_number() OVER (PARTITION BY tile_x, tile_y
                            ORDER BY n DESC, event_type) AS rk
  FROM t
)
SELECT a.tile_x, a.tile_y, a.event_type AS top_type, a.n AS n_top,
       a.n - coalesce(b.n, 0) AS gap
FROM r a LEFT JOIN r b
  ON b.tile_x = a.tile_x AND b.tile_y = a.tile_y AND b.rk = 2
WHERE a.rk = 1
"""


def q_grid_crosstab(sf_dir: str, zoom: int = 6, size_m: float = 250_000.0):
    """CROSS-GRID CONTINGENCY: joint (z6 WebMercator tile, axial hex
    cell) event counts — the index-migration audit that shows how two
    spatial partitioning schemes overlap (needed when moving a corpus
    between tile- and hex-keyed layouts). Both encodings run in the
    SAME batch pass, so consistency is per-row by construction.

    Shape at 100 TB: stateless double-encode map, ONE combiner on the
    composite key; output bounded by occupied (tile x hex) pairs."""
    from ..stages.agg import partial_sum_groupby
    from ..stages.tiles import hex_bin

    ds = _read(sf_dir, "events", ["user_id", "event_id"])
    span = 256.0 * (156543.033928041 / float(1 << zoom))
    origin = 20037508.3427892
    matrix = 1 << zoom

    def tag(batch: pa.Table) -> pa.Table:
        from ..core.tms import lonlat_to_webmercator_np

        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, eid)
        mx, my = lonlat_to_webmercator_np(lon, lat)
        fx = (mx - (-origin)) / span
        fy = (origin - my) / span
        tx = np.trunc(fx).astype(np.int64)
        ty = np.trunc(fy).astype(np.int64)
        ok = (fx >= 0) & (fy >= 0) & (tx < matrix) & (ty < matrix)
        t = pa.table(
            {
                "lon": pa.array(lon[ok], pa.float64()),
                "lat": pa.array(lat[ok], pa.float64()),
                "tile_x": pa.array(tx[ok]),
                "tile_y": pa.array(ty[ok]),
            }
        )
        # hex_bin appends hex_q/hex_r with its own validity filter (the
        # same rows: in-grid implies a finite Mercator y)
        return hex_bin(t, size_m=size_m, keep_columns=["tile_x", "tile_y"])

    return partial_sum_groupby(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=16384),
        ["tile_x", "tile_y", "hex_q", "hex_r"],
        [],
        count_alias="n",
        coalesce=4,
    )


def sql_grid_crosstab(zoom: int = 6, size_m: float = 250_000.0) -> str:
    span = f"(256.0 * (156543.033928041 / {float(1 << zoom)!r}))"
    matrix = 1 << zoom
    mx = "(lon * (pi() / 180.0) * 6378137.0)"
    my = "(ln(tan((90.0 + lat) * (pi() / 360.0))) * 6378137.0)"
    fx = f"(({mx}) - (-20037508.3427892)) / {span}"
    fy = f"((20037508.3427892) - ({my})) / {span}"
    return f"""
WITH {_sql_event_pos()},
a AS (
  SELECT CAST(trunc({fx}) AS BIGINT) AS tile_x,
         CAST(trunc({fy}) AS BIGINT) AS tile_y,
         ({mx} * (sqrt(3.0) / 3.0) - {my} * (1.0 / 3.0)) / {size_m!r} AS q,
         ({my} * (2.0 / 3.0)) / {size_m!r} AS r
  FROM pos
  WHERE ({fx}) >= 0 AND ({fy}) >= 0
    AND CAST(trunc({fx}) AS BIGINT) < {matrix}
    AND CAST(trunc({fy}) AS BIGINT) < {matrix}
    AND isfinite({my})
), c AS (
  SELECT tile_x, tile_y, q AS cx, r AS cz, -q - r AS cy,
         floor(q + 0.5) AS rx0, floor(-q - r + 0.5) AS ry0, floor(r + 0.5) AS rz0
  FROM a
), f AS (
  SELECT tile_x, tile_y, cx, cy, cz, rx0, ry0, rz0,
         abs(rx0 - cx) AS dx, abs(ry0 - cy) AS dy, abs(rz0 - cz) AS dz
  FROM c
)
SELECT tile_x, tile_y,
       CAST(CASE WHEN dx > dy AND dx > dz THEN -ry0 - rz0 ELSE rx0 END AS BIGINT) AS hex_q,
       CAST(CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
                 THEN -rx0 - ry0 ELSE rz0 END AS BIGINT) AS hex_r,
       CAST(count(*) AS BIGINT) AS n
FROM f
GROUP BY 1, 2, 3, 4
"""


def q_robust_zscore_days(sf_dir: str):
    """ROBUST (MAD) DAILY ANOMALY GATE: flag days whose event count
    deviates from the corpus median by a modified z-score > 3.5 —
    0.6745 * |n - median| / MAD > 3.5, evaluated as the exact integer
    comparison 6745 * |n - med| > 35000 * MAD, reduced to
    1349 * |n - med| > 7000 * MAD (both sides int64). The
    outlier-day data-quality rule that, unlike mean/std, one bad day
    cannot mask.

    Shape at 100 TB: a (day) count combiner folds the corpus to the
    time dimension; median and MAD are exact selections on that bounded
    histogram. Output: day, n, is_outlier for every day."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["ts"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table({"day": pa.array(day, pa.int64())})

    daily = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["day"],
        [],
        count_alias="n",
        coalesce=4,
    ).to_pandas()  # day-dimension (bounded)
    daily = daily.sort_values("day").reset_index(drop=True)
    n = daily["n"].to_numpy()
    v = np.sort(n)
    med = int(v[int(np.ceil(0.5 * len(v))) - 1])  # quantile_disc median
    dev = np.sort(np.abs(n - med))
    mad = int(dev[int(np.ceil(0.5 * len(dev))) - 1])
    is_out = (1349 * np.abs(n - med) > 7000 * mad).astype(np.int64)
    return pa.table(
        {
            "day": pa.array(daily["day"].to_numpy(), pa.int64()),
            "n": pa.array(n, pa.int64()),
            "is_outlier": pa.array(is_out, pa.int64()),
        }
    )


SQL_ROBUST_ZSCORE_DAYS = """
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), m AS (
  SELECT quantile_disc(n, 0.5) AS med FROM d
), md AS (
  SELECT quantile_disc(abs(n - med), 0.5) AS mad FROM d, m
)
SELECT day, n,
       CAST(CASE WHEN 1349 * abs(n - med) > 7000 * mad
                 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
FROM d, m, md
"""


def q_rfm_segments(sf_dir: str):
    """RFM CUSTOMER SEGMENTATION (recency / frequency / monetary
    quintiles — the classic CRM cube): per customer last-order day,
    order count and cent-exact spend; each metric bucketed 1..5 by its
    exact DISCRETE quintile edges (quantile_disc at .2/.4/.6/.8; a
    value equal to an edge falls in the lower bucket, so ties are
    deterministic and engine-independent); output the populated
    (r, f, m) cells with customer counts (<= 125 rows).

    Shape at 100 TB: ONE (custkey) combiner folds orders to the
    customer dimension; each metric's quintile edges are exact
    selections on its value histogram (the grouped_median pattern);
    only the 12 edge scalars broadcast; the cell rollup is a tiny
    combiner."""
    from ..stages.agg import partial_max_groupby, partial_sum_groupby

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        cents = np.trunc(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "r_day": pa.array(day, pa.int64()),
                "f": pa.array(np.ones(len(day), np.int64)),
                "m": pa.array(cents),
            }
        )

    skinny = orders.map_batches(skinnify, batch_format="pyarrow", batch_size=16384)
    last = partial_max_groupby(skinny, ["o_custkey"], ["r_day"], coalesce=8)
    sums = partial_sum_groupby(skinny, ["o_custkey"], ["f", "m"], coalesce=8)
    cust = last.join(
        sums,
        join_type="inner",
        num_partitions=max(2, _ccpus() // 8),
        on=("o_custkey",),
    )

    def edges_of(col: str) -> np.ndarray:
        # exact discrete quintile edges on the metric's value histogram
        # (grouped_median selection pattern; the histogram task holds
        # the distinct-value dimension, the driver sees 4 scalars)
        hist = partial_sum_groupby(
            cust.select_columns([col]), [col], [], count_alias="cnt", coalesce=4
        ).to_pandas()
        hist = hist.sort_values(col)
        cum = hist["cnt"].to_numpy().cumsum()
        total = int(cum[-1])
        v = hist[col].to_numpy()
        return np.array(
            [
                v[np.searchsorted(cum, int(np.ceil(q * total)))]
                for q in (0.2, 0.4, 0.6, 0.8)
            ],
            dtype=np.int64,
        )

    cust = cust.materialize()  # customer-dimension; consumed 4x below
    er, ef, em = edges_of("r_day"), edges_of("f"), edges_of("m")

    def bucket(batch: pa.Table) -> pa.Table:
        def b(col, e):
            x = batch[col].to_numpy(zero_copy_only=False)
            return 1 + (x[:, None] > e[None, :]).sum(axis=1).astype(np.int64)

        return pa.table(
            {
                "r_bucket": pa.array(b("r_day", er)),
                "f_bucket": pa.array(b("f", ef)),
                "m_bucket": pa.array(b("m", em)),
            }
        )

    return partial_sum_groupby(
        cust.map_batches(bucket, batch_format="pyarrow"),
        ["r_bucket", "f_bucket", "m_bucket"],
        [],
        count_alias="n_customers",
        coalesce=2,
    )


SQL_RFM_SEGMENTS = """
WITH c AS (
  SELECT o_custkey,
         max(epoch_us(o_orderdate) // 86400000000) AS r_day,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(CAST(trunc(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS m
  FROM orders GROUP BY 1
), e AS (
  SELECT quantile_disc(r_day, 0.2) AS r1, quantile_disc(r_day, 0.4) AS r2,
         quantile_disc(r_day, 0.6) AS r3, quantile_disc(r_day, 0.8) AS r4,
         quantile_disc(f, 0.2) AS f1, quantile_disc(f, 0.4) AS f2,
         quantile_disc(f, 0.6) AS f3, quantile_disc(f, 0.8) AS f4,
         quantile_disc(m, 0.2) AS m1, quantile_disc(m, 0.4) AS m2,
         quantile_disc(m, 0.6) AS m3, quantile_disc(m, 0.8) AS m4
  FROM c
)
SELECT CAST(1 + (r_day > r1)::int + (r_day > r2)::int
            + (r_day > r3)::int + (r_day > r4)::int AS BIGINT) AS r_bucket,
       CAST(1 + (f > f1)::int + (f > f2)::int
            + (f > f3)::int + (f > f4)::int AS BIGINT) AS f_bucket,
       CAST(1 + (m > m1)::int + (m > m2)::int
            + (m > m3)::int + (m > m4)::int AS BIGINT) AS m_bucket,
       CAST(count(*) AS BIGINT) AS n_customers
FROM c, e GROUP BY 1, 2, 3
"""


def q_tpch_q5(sf_dir: str, region: str = "ASIA", year_lo: str = "1996-01-01",
              year_hi: str = "1997-01-01"):
    """TPC-H Q5 (local supplier volume): cent-exact revenue per nation
    for orders in [year_lo, year_hi) where the CUSTOMER and the
    LINEITEM's SUPPLIER sit in the same nation, restricted to one
    region — the widest join in the suite (region x nation x supplier x
    customer x orders x lineitem).

    Shape at 100 TB: region/nation/supplier/customer fold to broadcast
    int lookup arrays (dimension tables — at extreme customer
    cardinality this side upgrades to a hash join, the
    q_join_mktsegment caveat); orders date-pruned at the scan; ONE
    two-sided lineitem |x| orders hash join; nation-equality gate and
    the region filter run vectorized in the join's map; per-nation
    revenue is a tiny combiner."""
    import pyarrow.parquet as pq

    from ..stages.agg import partial_sum_groupby

    lo_us = int(pd.Timestamp(year_lo).value // 1000)
    hi_us = int(pd.Timestamp(year_hi).value // 1000)

    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = int(
        reg["r_regionkey"][list(reg["r_name"].to_pylist()).index(region)].as_py()
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nkeys = nat["n_nationkey"].to_numpy()
    norder = np.argsort(nkeys)
    nkeys_s = nkeys[norder]
    nregion = nat["n_regionkey"].to_numpy()[norder]
    nnames = np.asarray(nat["n_name"].to_pylist(), dtype=object)[norder]

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    skeys = supp["s_suppkey"].to_numpy()
    sorder = np.argsort(skeys)
    skeys_s = skeys[sorder]
    snation = supp["s_nationkey"].to_numpy()[sorder]

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    ckeys = cust["c_custkey"].to_numpy()
    corder = np.argsort(ckeys)
    ckeys_s = ckeys[corder]
    cnation = cust["c_nationkey"].to_numpy()[corder]

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        keep = (d >= lo_us) & (d < hi_us)
        m = pa.array(keep)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)[keep]
        pos = np.minimum(np.searchsorted(ckeys_s, ck), len(ckeys_s) - 1)
        cn = np.where(ckeys_s[pos] == ck, cnation[pos], -1)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(m),
                "c_nation": pa.array(cn.astype(np.int64)),
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def l_skinny(batch: pa.Table) -> pa.Table:
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(skeys_s, sk), len(skeys_s) - 1)
        sn = np.where(skeys_s[pos] == sk, snation[pos], -1)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "s_nation": pa.array(sn.astype(np.int64)),
                "rev_cents": pa.array(
                    np.trunc(ep * (1.0 - disc) * 100.0).astype(np.int64)
                ),
            }
        )

    joined = li.map_batches(l_skinny, batch_format="pyarrow").join(
        orders.map_batches(o_filter, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=max(8, _ccpus() // 2),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def gate(batch: pa.Table) -> pa.Table:
        sn = batch["s_nation"].to_numpy(zero_copy_only=False)
        cn = batch["c_nation"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(nkeys_s, sn), len(nkeys_s) - 1)
        in_region = (nkeys_s[pos] == sn) & (nregion[pos] == rkey)
        keep = (sn == cn) & (sn >= 0) & in_region
        name = nnames[pos[keep]]
        return pa.table(
            {
                "n_name": pa.array(name.tolist(), pa.string()),
                "rev_cents": batch["rev_cents"].filter(pa.array(keep)),
            }
        )

    agg = partial_sum_groupby(
        joined.map_batches(gate, batch_format="pyarrow"),
        ["n_name"],
        ["rev_cents"],
        coalesce=4,
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["n_name", "revenue_cents"])

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_tpch_q5(region: str = "ASIA", year_lo: str = "1996-01-01",
                year_hi: str = "1997-01-01") -> str:
    return f"""
SELECT n.n_name,
       CAST(sum(CAST(trunc(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE c.c_nationkey = s.s_nationkey
  AND r.r_name = '{region}'
  AND o.o_orderdate >= TIMESTAMP '{year_lo}'
  AND o.o_orderdate <  TIMESTAMP '{year_hi}'
GROUP BY 1
"""


def q_percent_of_parent_tiles(sf_dir: str, zoom: int = 6):
    """PERCENT-OF-PARENT hierarchy share: every occupied z6 tile's event
    count alongside its z4 PARENT tile's total (the OLAP
    percent-of-parent drill-down, kept as the exact integer pair
    (n, parent_n) so the share is engine-independent).

    Shape at 100 TB: ONE z6 count combiner; the z4 parent totals derive
    from that lattice-bounded table (a second tiny combiner) and
    broadcast as a lookup — no join, no second corpus scan."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_id"])
    span = 256.0 * (156543.033928041 / float(1 << zoom))
    origin = 20037508.3427892
    matrix = 1 << zoom

    def tag(batch: pa.Table) -> pa.Table:
        from ..core.tms import lonlat_to_webmercator_np

        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_geo_np(uid, eid)
        mx, my = lonlat_to_webmercator_np(lon, lat)
        fx = (mx - (-origin)) / span
        fy = (origin - my) / span
        tx = np.trunc(fx).astype(np.int64)
        ty = np.trunc(fy).astype(np.int64)
        ok = (fx >= 0) & (fy >= 0) & (tx < matrix) & (ty < matrix)
        return pa.table(
            {"tile_x": pa.array(tx[ok]), "tile_y": pa.array(ty[ok])}
        )

    fine = partial_sum_groupby(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=16384),
        ["tile_x", "tile_y"],
        [],
        count_alias="n",
        coalesce=4,
    ).materialize()  # lattice-bounded; consumed twice

    parents = fine.map_batches(
        lambda b: pa.table(
            {
                "px": pa.array(b["tile_x"].to_numpy(zero_copy_only=False) >> 2),
                "py": pa.array(b["tile_y"].to_numpy(zero_copy_only=False) >> 2),
                "n": b["n"],
            }
        ),
        batch_format="pyarrow",
    )
    ptab = partial_sum_groupby(parents, ["px", "py"], ["n"], coalesce=2).to_pandas()
    pkey = (ptab["px"].to_numpy() << 32) | ptab["py"].to_numpy()
    porder = np.argsort(pkey)
    pkey_s, pn_s = pkey[porder], ptab["n"].to_numpy()[porder]

    def attach(batch: pa.Table) -> pa.Table:
        tx = batch["tile_x"].to_numpy(zero_copy_only=False)
        ty = batch["tile_y"].to_numpy(zero_copy_only=False)
        key = ((tx >> 2) << 32) | (ty >> 2)
        pos = np.minimum(np.searchsorted(pkey_s, key), len(pkey_s) - 1)
        return pa.table(
            {
                "tile_x": batch["tile_x"],
                "tile_y": batch["tile_y"],
                "n": batch["n"],
                "parent_n": pa.array(pn_s[pos].astype(np.int64)),
            }
        )

    return fine.map_batches(attach, batch_format="pyarrow")


def sql_percent_of_parent_tiles(zoom: int = 6) -> str:
    span = f"(256.0 * (156543.033928041 / {float(1 << zoom)!r}))"
    matrix = 1 << zoom
    mx = "(lon * (pi() / 180.0) * 6378137.0)"
    my = "(ln(tan((90.0 + lat) * (pi() / 360.0))) * 6378137.0)"
    fx = f"(({mx}) - (-20037508.3427892)) / {span}"
    fy = f"((20037508.3427892) - ({my})) / {span}"
    return f"""
WITH {_sql_event_pos()},
t AS (
  SELECT CAST(trunc({fx}) AS BIGINT) AS tile_x,
         CAST(trunc({fy}) AS BIGINT) AS tile_y,
         CAST(count(*) AS BIGINT) AS n
  FROM pos
  WHERE ({fx}) >= 0 AND ({fy}) >= 0
    AND CAST(trunc({fx}) AS BIGINT) < {matrix}
    AND CAST(trunc({fy}) AS BIGINT) < {matrix}
  GROUP BY 1, 2
)
SELECT tile_x, tile_y, n,
       CAST(sum(n) OVER (PARTITION BY tile_x // 4, tile_y // 4)
            AS BIGINT) AS parent_n
FROM t
"""


def q_order_fanout_dist(sf_dir: str):
    """JOIN-FANOUT DISTRIBUTION: histogram of lineitems-per-order (the
    group-size distribution that sizes hash-join build sides and
    predicts skew). Two combiners: per-order counts, then the count
    histogram — the corpus folds to the order dimension then to the
    distinct-size dimension.

    Shape at 100 TB: both exchanges skinny; output bounded by the max
    fanout."""
    from ..stages.agg import partial_sum_groupby

    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    per_order = partial_sum_groupby(
        li, ["l_orderkey"], [], count_alias="n_lines", coalesce=8
    )
    return partial_sum_groupby(
        per_order.select_columns(["n_lines"]),
        ["n_lines"],
        [],
        count_alias="n_orders",
        coalesce=2,
    )


SQL_ORDER_FANOUT_DIST = """
WITH c AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY 1
)
SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders FROM c GROUP BY 1
"""


def q_user_day_percentiles(sf_dir: str):
    """ACTIVITY-RATE PERCENTILES: p10/p50/p90 of events per active
    user-day (the engagement-distribution summary behind rate limits
    and capacity planning). Exact discrete quantiles (ceil selection).

    Shape at 100 TB: a (user, day) count combiner folds the corpus to
    active user-days, a second combiner folds THAT to its distinct-
    count histogram (bounded by the max daily rate), and the selection
    runs on the tiny histogram."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    DAY_US = 86400 * 1_000_000

    def skinnify(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // DAY_US
        )
        return pa.table(
            {"user_id": batch["user_id"], "day": pa.array(day, pa.int64())}
        )

    per_ud = partial_sum_groupby(
        ds.map_batches(skinnify, batch_format="pyarrow", batch_size=16384),
        ["user_id", "day"],
        [],
        count_alias="n",
        coalesce=8,
    )
    hist = partial_sum_groupby(
        per_ud.select_columns(["n"]), ["n"], [], count_alias="cnt", coalesce=2
    ).to_pandas()  # distinct-daily-rate dimension (bounded)
    hist = hist.sort_values("n")
    cum = hist["cnt"].to_numpy().cumsum()
    total = int(cum[-1])
    v = hist["n"].to_numpy()
    out = {}
    for name, q in (("p10", 0.10), ("p50", 0.50), ("p90", 0.90)):
        out[name] = int(v[np.searchsorted(cum, int(np.ceil(q * total)))])
    return pa.table(
        {
            "n_user_days": pa.array([total], pa.int64()),
            "p10": pa.array([out["p10"]], pa.int64()),
            "p50": pa.array([out["p50"]], pa.int64()),
            "p90": pa.array([out["p90"]], pa.int64()),
        }
    )


SQL_USER_DAY_PERCENTILES = """
WITH c AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_user_days,
       quantile_disc(n, 0.10) AS p10,
       quantile_disc(n, 0.50) AS p50,
       quantile_disc(n, 0.90) AS p90
FROM c
"""


def q_path_motifs(sf_dir: str, k: int = 20):
    """TOP-K BEHAVIORAL PATH MOTIFS: the most common consecutive
    event-type TRIGRAMS per user stream (the 3-step journey patterns
    behind funnel design) — counts exact, top-k by (n DESC, path ASC).

    Shape at 100 TB: 512-way user superbucket, ONE sort per bucket and
    a fully vectorized prev/mid/next triple masked at user boundaries
    (the bigram kernel extended one step); (t1,t2,t3) partials -> tiny
    combiner -> deterministic top-k."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def skinnify(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
            }
        )

    skinny = ds.map_batches(
        skinnify, batch_format="pyarrow", batch_size=16384
    ).map_batches(_add_user_bucket, batch_format="pyarrow")

    def trigrams(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        typ = g["event_type"].to_numpy()
        if len(uid) < 3:
            return pd.DataFrame(
                {"t1": [], "t2": [], "t3": [], "n_partial": []}
            ).astype({"t1": object, "t2": object, "t3": object, "n_partial": np.int64})
        same = (uid[2:] == uid[1:-1]) & (uid[1:-1] == uid[:-2])
        df = pd.DataFrame(
            {"t1": typ[:-2][same], "t2": typ[1:-1][same], "t3": typ[2:][same]}
        )
        return (
            df.groupby(["t1", "t2", "t3"], sort=False)
            .size()
            .reset_index(name="n_partial")
        )

    parts = skinny.groupby("__ub").map_groups(trigrams, batch_format="pandas")
    agg = partial_sum_groupby(parts, ["t1", "t2", "t3"], ["n_partial"], coalesce=2)

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["t1", "t2", "t3", "n"])

    return (
        agg.map_batches(finish, batch_format="pyarrow")
        .sort(["n", "t1", "t2", "t3"], descending=[True, False, False, False])
        .limit(k)
    )


def sql_path_motifs(k: int = 20) -> str:
    return f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
), t AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3,
         user_id,
         lead(user_id, 2) OVER (ORDER BY user_id, ts_us, event_id) AS u3
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM t WHERE t3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, t1, t2, t3
LIMIT {k}
"""


def q_bucket_skew_report(sf_dir: str, buckets: int = 512):
    """SHUFFLE-SKEW AUDIT of the engine's own 512-way user superbucket:
    row count per fold-hash bucket — the introspection report that
    validates the superbucket family's even-work assumption (hot
    buckets here would mean hot tasks in every superbucketed
    operator). Output: per-bucket counts (bounded by `buckets`).

    Shape at 100 TB: ONE stateless combiner on the bucket key."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "events", ["user_id"])
    skinny = ds.map_batches(_add_user_bucket, batch_format="pyarrow")
    return partial_sum_groupby(
        skinny.select_columns(["__ub"]), ["__ub"], [], count_alias="n", coalesce=4
    ).map_batches(
        lambda b: b.rename_columns(["bucket", "n"]), batch_format="pyarrow"
    )


SQL_BUCKET_SKEW_REPORT = """
SELECT ((user_id & 2147483647) * 2654435761) % 512 AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
"""
