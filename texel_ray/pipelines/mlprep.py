"""Training-data-prep pipelines: text analysis, dedup family, similarity
search, spatial kNN. (See stages/{text,dedup,similarity,knn}.py.)"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


from .common import hot_bucket_survivors, read_table as _read


# ---- text analysis --------------------------------------------------------


def q_text_features(sf_dir: str):
    from ..stages.text import TextFeatures

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        TextFeatures, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)
    )


SQL_TEXT_FEATURES = r"""
SELECT doc_id,
       length(text) AS n_chars,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
       length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars,
       len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS stop_hits,
       0.5 * (CASE WHEN length(text) > 0
                   THEN CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text)
                   ELSE 0.0 END)
       + 0.3 * (CASE WHEN (CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END) > 0
                     THEN CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS DOUBLE)
                          / (CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END)
                     ELSE 0.0 END)
       + 0.2 * (CAST(least((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END), 100) AS DOUBLE) / 100.0)
       AS quality_score
FROM documents
"""


def q_fingerprint(sf_dir: str):
    from ..stages.text import Fingerprinter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(Fingerprinter, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4))


def q_langid(sf_dir: str):
    from ..stages.text import LangId

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        LangId, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)
    )


def q_token_counts(sf_dir: str, top: int = 50):
    """Corpus vocabulary: top tokens by frequency (partial histograms ->
    one tiny shuffle)."""
    from ray.data.aggregate import Sum

    from ..stages.text import token_histogram

    ds = _read(sf_dir, "documents", ["text"])
    ds = ds.map_batches(token_histogram, batch_format="pandas")
    out = ds.groupby("token").aggregate(Sum("n_partial", alias_name="n"))
    return out.sort(["n", "token"], descending=[True, False]).limit(top)


SQL_TOKEN_COUNTS = r"""
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents WHERE trim(text) <> '')
GROUP BY 1
ORDER BY n DESC, token ASC
LIMIT 50
"""


# ---- dedup family ---------------------------------------------------------


def q_minhash_neardup(sf_dir: str, threshold: float = 0.8):
    """MinHash+LSH near-duplicate pairs, exact-Jaccard verified.

    shingle -> minhash -> band explode -> groupby(band) -> candidate pairs
    -> distinct pair -> verify >= threshold. Rows-only driver check;
    recall/precision pinned by pytest with planted near-duplicates.
    """
    from ..stages.dedup import JaccardVerifier, MinHasher, bucket_pairs

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts_by_id = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    banded = ds.map_batches(
        MinHasher, batch_format="pyarrow", batch_size=2048, concurrency=(1, 4)
    ).materialize()  # consumed twice (counts + survivors); rows are tiny
    # Candidate generation at scale: almost every (band, hash) bucket is a
    # singleton; pair up only rows in hot (>=2 doc) buckets.
    import pandas as pd

    survivors = hot_bucket_survivors(banded, ["band_id", "band_hash"])
    if len(survivors) == 0:
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "jaccard": pd.Series([], dtype="float64"),
            }
        )
    pairs = (
        survivors.groupby(["band_id", "band_hash"])[["doc_id"]]
        .apply(lambda g: bucket_pairs(g, id_col="doc_id"))
        .reset_index(drop=True)
    )
    if pairs.empty:  # every hot bucket collapsed to a single doc
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "jaccard": pd.Series([], dtype="float64"),
            }
        )
    n_capped = int(pairs["capped"].sum()) if "capped" in pairs else 0
    if n_capped:
        # no silent caps: truncated buckets mean missed recall
        print(
            f"[minhash_neardup] WARNING: {n_capped} candidate pairs came from "
            f"capped buckets (>50 docs) — recall is truncated there",
            flush=True,
        )
    pairs = pairs[["id_a", "id_b"]].drop_duplicates()
    import ray.data

    verified = ray.data.from_pandas(pairs).map_batches(
        JaccardVerifier,
        fn_constructor_kwargs={"texts_by_id": texts_by_id, "threshold": threshold},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return verified


def q_simhash_neardup(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup: banded exact-match blocking + hamming verify."""
    import pandas as pd

    from ..stages.dedup import SimHasher, hamming64

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    banded = ds.map_batches(
        SimHasher, batch_format="pyarrow", batch_size=2048, concurrency=(1, 4)
    ).materialize()  # consumed twice (counts + survivors); rows are tiny
    survivors = hot_bucket_survivors(banded, ["band_id", "band_bits"])
    a, b, d = [], [], []
    n_capped = 0
    for _, group in survivors.groupby(["band_id", "band_bits"]):
        rows = group[["doc_id", "simhash"]].drop_duplicates().sort_values("doc_id")
        ids = rows["doc_id"].to_numpy()
        sh = rows["simhash"].to_numpy()
        if len(ids) > 51:
            n_capped += 1  # no silent caps: the 50-neighbor window truncates
        for i in range(len(ids)):
            for j in range(i + 1, min(i + 51, len(ids))):
                dist = hamming64(int(sh[i]), int(sh[j]))
                if dist <= max_hamming:
                    a.append(int(ids[i]))
                    b.append(int(ids[j]))
                    d.append(dist)
    if n_capped:
        print(
            f"[simhash_neardup] WARNING: {n_capped} buckets exceeded the "
            f"50-neighbor pair window — recall is truncated there",
            flush=True,
        )
    return (
        pd.DataFrame({"id_a": a, "id_b": b, "hamming": d})
        .drop_duplicates(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def q_embedding_neardup(sf_dir: str, threshold: float = 0.98):
    """Embedding-cosine near-dup via LSH buckets + within-bucket pairwise."""
    from ..stages.dedup import EmbeddingNearDup
    from ..stages.similarity import LSHBucketer

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ds = ds.map_batches(
        LSHBucketer,
        fn_constructor_kwargs={"dim": 64, "bits": 8},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    near_dup = EmbeddingNearDup(threshold=threshold)
    return ds.groupby("bucket").map_groups(
        lambda g: near_dup(g), batch_format="pandas"
    )


# ---- similarity search ----------------------------------------------------


def q_ann_topk(sf_dir: str, n_queries: int = 10, k: int = 10):
    """Brute-force cosine top-k (exact ANN baseline): first n_queries
    embeddings are the query matrix (broadcast), streamed matmul per batch,
    tiny top-k groupby. Rows-only driver check (float rank ties are not
    SQL-stable); exactness pinned by pytest vs a numpy reference."""
    import pyarrow.parquet as pq

    from ..stages.similarity import BruteForceTopK, _stack_embeddings, finalize_topk

    head = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, n_queries)
    q = _stack_embeddings(head["embedding"])
    qids = head["vec_id"].to_numpy()

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ds = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries": q, "query_ids": qids, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    out = finalize_topk(ds, k=k)
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_train_test_split(sf_dir: str, test_frac_pct: int = 10):
    """Deterministic hash-based train/test split of the documents table:
    split = 'test' iff (doc_id * 2654435761) % 100 < pct (Knuth
    multiplicative hash — stable everywhere, no RNG state). Counts +
    integer char sums per split."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def split(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (doc_id * np.uint64(2654435761)) % np.uint64(100)
        labels = np.where(bucket < test_frac_pct, "test", "train")
        return pa.table(
            {
                "split": pa.array(labels.tolist(), pa.string()),
                "n_chars": batch["n_chars"],
            }
        )

    return partial_sum_groupby(
        ds.map_batches(split, batch_format="pyarrow"),
        ["split"],
        ["n_chars"],
        count_alias="n",
        coalesce=4,
    )


SQL_TRAIN_TEST_SPLIT = """
SELECT CASE WHEN (CAST(doc_id AS UBIGINT) * 2654435761) % 100 < 10
            THEN 'test' ELSE 'train' END AS split,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       count(*) AS n
FROM documents
GROUP BY 1
"""


def q_stratified_sample(sf_dir: str, pct: int = 20):
    """Stratified deterministic sample: keep `pct`% of documents per
    language (hash-bucketed, not RNG) — per-lang counts prove the strata."""
    from ..stages.agg import partial_count_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def sample(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = (doc_id * np.uint64(0x9E3779B1)) % np.uint64(100) < pct
        return batch.filter(pa.array(keep)).select(["lang"])

    return partial_count_groupby(
        ds.map_batches(sample, batch_format="pyarrow"), ["lang"], alias="n", coalesce=4
    )


SQL_STRATIFIED_SAMPLE = """
SELECT lang, count(*) AS n
FROM documents
WHERE (CAST(doc_id AS UBIGINT) * 2654435761) % 100 < 20
GROUP BY 1
"""


def q_approx_distinct(sf_dir: str):
    """HLL approximate distinct users per event type: per-batch mergeable
    sketches -> tiny merge (no raw-key shuffle, unlike exact distinct).
    Rows-only check; error bound pinned by pytest vs exact counts."""
    import pandas as pd

    from ..stages.sketch import hll_merge_estimate, hll_partials

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    partials = ds.map_batches(
        lambda b: hll_partials(b, "user_id", "event_type"), batch_format="pyarrow"
    )
    rows = [
        (r["group"], r["sketch"]) for r in partials.take_all()
    ]
    est = hll_merge_estimate(rows)
    return pd.DataFrame(
        {
            "event_type": sorted(est),
            "n_users_approx": [int(round(est[g])) for g in sorted(est)],
        }
    )


def q_ivf_topk(sf_dir: str, n_queries: int = 10, k: int = 10, nprobe: int = 4):
    """IVF-accelerated ANN: coarse-quantize the corpus (broadcast
    centroids trained on a driver sample), probe nprobe lists per query.
    Rows-only; recall vs brute force pinned by pytest."""
    import pyarrow.parquet as pq

    from ..stages.similarity import IVFIndexer, IVFTopK, _stack_embeddings, finalize_topk

    head = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    sample = _stack_embeddings(head["embedding"].slice(0, 256))
    centroids = IVFIndexer.train(sample, k=8)
    q = _stack_embeddings(head["embedding"]. slice(0, n_queries))
    qids = head["vec_id"].to_numpy()[:n_queries]

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ds = ds.map_batches(
        IVFIndexer,
        fn_constructor_kwargs={"centroids": centroids},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    ds = ds.map_batches(
        IVFTopK,
        fn_constructor_kwargs={
            "centroids": centroids,
            "queries": q,
            "query_ids": qids,
            "k": k,
            "nprobe": nprobe,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    out = finalize_topk(ds, k=k)
    return out.select_columns(["query_id", "vec_id", "rank"])


# ---- multimodal (image payload) stages ------------------------------------


def q_image_stats(sf_dir: str):
    """Decode every image payload; per-format aggregate of pixel stats.
    Deterministic integer sums; rows-only check (SQL cannot decode)."""
    from ray.data.aggregate import Max, Min, Sum

    from ..sources.images import read_images
    from ..stages.multimodal import ImageStats

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt"])
    ds = ds.map_batches(
        ImageStats, batch_format="pyarrow", batch_size=512, concurrency=(2, 8)
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.append_column(
            "n", pa.array(np.ones(batch.num_rows, dtype=np.int64))
        )
        g = t.group_by(["fmt"]).aggregate(
            [
                ("mean_r", "sum"),
                ("mean_g", "sum"),
                ("mean_b", "sum"),
                ("px_min", "min"),
                ("px_max", "max"),
                ("n", "sum"),
            ]
        )
        return g.rename_columns(
            ["fmt", "sum_mean_r", "sum_mean_g", "sum_mean_b", "px_min", "px_max", "n"]
        )

    ds = ds.map_batches(partial, batch_format="pyarrow")
    return ds.groupby("fmt").aggregate(
        Sum("sum_mean_r", alias_name="sum_mean_r"),
        Sum("sum_mean_g", alias_name="sum_mean_g"),
        Sum("sum_mean_b", alias_name="sum_mean_b"),
        Min("px_min", alias_name="px_min"),
        Max("px_max", alias_name="px_max"),
        Sum("n", alias_name="n"),
    )


def q_image_embed_neardup(sf_dir: str, threshold: float = 0.9999):
    """Visual near-dup: decode -> patch-mean embedding -> LSH bucket ->
    within-bucket cosine. Composition of the multimodal + dedup stages."""
    from ..sources.images import read_images
    from ..stages.dedup import EmbeddingNearDup
    from ..stages.multimodal import ImageEmbedder
    from ..stages.similarity import LSHBucketer

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt"])
    ds = ds.map_batches(
        ImageEmbedder, batch_format="pyarrow", batch_size=512, concurrency=(2, 8)
    )
    ds = ds.map_batches(
        LSHBucketer,
        fn_constructor_kwargs={"dim": 16, "bits": 12, "id_col": "image_id"},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    near_dup = EmbeddingNearDup(threshold=threshold, id_col="image_id", cap=256)
    from ray.data.aggregate import Count

    pairs = ds.groupby("bucket").map_groups(
        lambda g: near_dup(g), batch_format="pandas"
    )
    # summarize (pair lists can be large for self-similar corpora)
    return pairs.groupby("id_a").aggregate(Count(alias_name="n_neardups"))


# ---- spatial kNN ----------------------------------------------------------


def q_knn_radius(sf_dir: str, n_queries: int = 20, k: int = 5, radius: float = 1.0):
    """Bounded kNN over image geotags via cell-ring cover (oracle-exact)."""
    import pyarrow.parquet as pq

    from ..sources.images import ensure_images_for_sf_dir, read_images
    from ..stages.knn import CellRingKNN, finalize_knn

    path = ensure_images_for_sf_dir(sf_dir)
    head = pq.read_table(path, columns=["image_id", "lon", "lat"]).slice(0, n_queries)

    ds = read_images(sf_dir, columns=["image_id", "lon", "lat"])
    ds = ds.map_batches(
        CellRingKNN,
        fn_constructor_kwargs={
            "query_ids": head["image_id"].to_pylist(),
            "query_lon": head["lon"].to_numpy(),
            "query_lat": head["lat"].to_numpy(),
            "radius": radius,
        },
        batch_format="pyarrow",
        batch_size=16384,
        concurrency=(1, 8),
    )
    return finalize_knn(ds, k=k)


def sql_knn_radius(images_source: str, n_queries: int = 20, k: int = 5, radius: float = 1.0) -> str:
    return f"""
WITH q AS (
    SELECT image_id AS query_id, lon AS qlon, lat AS qlat
    FROM {images_source} ORDER BY image_id LIMIT {n_queries}
), d AS (
    SELECT q.query_id, i.image_id,
           (i.lon - q.qlon) * (i.lon - q.qlon) + (i.lat - q.qlat) * (i.lat - q.qlat) AS d2
    FROM {images_source} i CROSS JOIN q
)
SELECT query_id, image_id, rank FROM (
    SELECT query_id, image_id,
           row_number() OVER (PARTITION BY query_id ORDER BY d2 ASC, image_id ASC) AS rank
    FROM d WHERE d2 <= {radius * radius!r}
) WHERE rank <= {k}
"""
