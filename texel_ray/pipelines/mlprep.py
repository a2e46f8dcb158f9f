"""Training-data-prep pipelines: text analysis, dedup family, similarity
search, spatial kNN. (See stages/{text,dedup,similarity,knn}.py.)"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


from .common import (
    cluster_cpus as _ccpus,
    distinct_pairs,
    dlit as _dlit,
    hot_bucket_filter,
    read_table as _read,
)


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


# 1:1 SQL mirror of stages/text.py LangId._predict: CJK codepoint check,
# [a-zA-Z]+ word extraction, per-language stopword-profile hit counts, and
# the first-language-wins tie-break of the Python dict iteration order
# (en, de, fr, es).
SQL_LANGID = r"""
WITH w AS (
  SELECT doc_id, text,
         list_transform(regexp_extract_all(text, '[a-zA-Z]+'), x -> lower(x)) AS words
  FROM documents
), h AS (
  SELECT doc_id, text, len(words) AS nw,
    len(list_filter(words, x -> x IN ('the','and','of','to','a','in','is','for','on','with'))) AS h_en,
    len(list_filter(words, x -> x IN ('der','die','das','und','ist','ein','zu','mit','von','nicht'))) AS h_de,
    len(list_filter(words, x -> x IN ('le','la','les','et','est','un','une','de','que','pour'))) AS h_fr,
    len(list_filter(words, x -> x IN ('el','la','los','y','es','un','una','de','que','por'))) AS h_es
  FROM w
)
SELECT doc_id,
  CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
       WHEN nw = 0 THEN 'und'
       WHEN h_en = 0 AND h_de = 0 AND h_fr = 0 AND h_es = 0 THEN 'und'
       WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
       WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
       WHEN h_fr >= h_es THEN 'fr'
       ELSE 'es' END AS lang_pred,
  CASE WHEN regexp_matches(text, '[一-鿿]') THEN 1.0
       WHEN nw = 0 THEN 0.0
       ELSE CAST(greatest(h_en, h_de, h_fr, h_es) AS DOUBLE) / nw END AS lang_score
FROM h
"""

# Polynomial rolling hash h = (h*257 + codepoint) mod 2^61-1 as a recursive
# CTE (codepoint == utf-8 byte for the ASCII corpus; HUGEINT keeps the
# intermediate products exact).
SQL_FINGERPRINT = r"""
WITH RECURSIVE fp AS (
  SELECT doc_id, text, 0::HUGEINT AS h, 0 AS i, length(text) AS n FROM documents
  UNION ALL
  SELECT doc_id, text,
         (h * 257 + unicode(substr(text, i + 1, 1))) % (2305843009213693951::HUGEINT),
         i + 1, n
  FROM fp WHERE i < n
)
SELECT doc_id, CAST(h AS BIGINT) AS fingerprint FROM fp WHERE i = n
"""

# Exact cosine top-k over the full corpus — the brute-force pipeline must
# reproduce it rank-for-rank ((sim desc, vec_id asc) tie-break both sides).
SQL_ANN_TOPK = r"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings ORDER BY vec_id LIMIT 10
), d AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS sim
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM d
) WHERE rank <= 10
"""

# ALL pairs with cosine >= threshold; the LSH-bucketed pipeline must find
# exactly these (the synthetic corpus has no cross-bucket near-identical
# pairs at 0.98 — max corpus cosine ~0.51, so both sides are provably
# empty AND the oracle would catch any false positive).
SQL_EMB_NEARDUP = r"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cosine,
       false AS capped
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.98
"""


def q_token_counts(sf_dir: str, top: int = 50):
    """Corpus vocabulary: top tokens by frequency (partial histograms ->
    one tiny shuffle)."""
    from ray.data.aggregate import Sum

    from ..stages.text import token_histogram

    ds = _read(sf_dir, "documents", ["text"])
    ds = ds.map_batches(token_histogram, batch_format="pandas")
    out = ds.groupby("token").aggregate(Sum("n_partial", alias_name="n"))
    return out.sort(["n", "token"], descending=[True, False]).limit(top)


def q_heavy_hitters(sf_dir: str, threshold: int = 100):
    """Exact heavy hitters via count-min prefilter: tokens whose corpus
    frequency >= threshold. Pass A builds a mergeable CMS from per-batch
    token histograms (256 KB per partial, summed on the driver — sketch
    rows, never token rows); pass B broadcasts the sketch and emits
    candidate (token, n_partial) rows ONLY for tokens the CMS says could
    be heavy, then an exact tiny groupby confirms. CMS never
    undercounts, so there are no false negatives — output semantics are
    EXACT (same pattern as the Bloom anti-join), which is why a plain
    SQL HAVING oracle recomputes it."""
    import numpy as np
    import pyarrow as pa

    import ray

    from ..stages.agg import partial_sum_groupby
    from ..stages.sketch import CountMinSketch
    from ..stages.text import token_histogram

    hist = _read(sf_dir, "documents", ["text"]).map_batches(
        token_histogram, batch_format="pandas"
    )

    def cms_partial(batch: pa.Table) -> pa.Table:
        cms = CountMinSketch()
        toks = np.asarray(batch["token"].to_pylist(), dtype=object)
        cms.add(
            CountMinSketch.hash_tokens(toks),
            batch["n_partial"].to_numpy(zero_copy_only=False),
        )
        return pa.table({"sketch": pa.array([cms.to_bytes()], pa.binary())})

    hist = hist.materialize()  # consumed by both passes; skinny rows
    total = CountMinSketch()
    for row in hist.map_batches(cms_partial, batch_format="pyarrow").iter_rows():
        total.merge(CountMinSketch.from_bytes(row["sketch"]))
    cms_ref = ray.put(total.to_bytes())

    def candidates(batch: pa.Table) -> pa.Table:
        cms = CountMinSketch.from_bytes(ray.get(cms_ref))
        toks = np.asarray(batch["token"].to_pylist(), dtype=object)
        est = cms.estimate(CountMinSketch.hash_tokens(toks))
        keep = est >= threshold
        return pa.table(
            {
                "token": pa.array(toks[keep].tolist(), pa.string()),
                "n_partial": batch["n_partial"].filter(pa.array(keep)),
            }
        )

    agg = partial_sum_groupby(
        hist.map_batches(candidates, batch_format="pyarrow"),
        ["token"],
        ["n_partial"],
        coalesce=4,
    )

    def confirm(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.greater_equal(batch["n_partial"], threshold))
        return pa.table({"token": t["token"], "n": t["n_partial"]})

    return agg.map_batches(confirm, batch_format="pyarrow")


SQL_HEAVY_HITTERS = r"""
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents WHERE trim(text) <> '')
GROUP BY 1
HAVING count(*) >= 100
"""


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
    """MinHash+LSH near-duplicate pairs, exact-Jaccard verified — fully
    in-dataset (nothing corpus-sized ever touches the driver):

    shingle -> minhash -> band explode (combiner-style vectorized kernel)
    -> hot-bucket semi-join filter (broadcast aggregated hot keys)
    -> groupby(bucket).map_groups candidate pairs (collected ONCE —
    pair-dimension-sized, like a victim list — for dedupe/capped tally)
    -> candidate-filtered text joined back per side via Dataset.join
    -> exact-Jaccard verify.

    The DuckDB oracle recomputes ALL pairs with exact 3-gram Jaccard >=
    threshold; with 128 perms / 32 bands the LSH miss probability at
    s >= 0.8 is < 5e-8 per pair, so outputs match exactly at test scale.
    """
    import pandas as pd

    from ..stages.dedup import MinHasher, bucket_pairs, verify_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    banded = ds.map_batches(
        MinHasher, batch_format="pyarrow", batch_size=512, concurrency=(2, 8)
    ).materialize()  # consumed twice (counts + filter); rows are tiny
    hot = hot_bucket_filter(banded, ["band_id", "band_hash"])
    # one execution: in-bucket candidate-pair generation
    pairs = hot.groupby("__bucket").map_groups(
        lambda g: bucket_pairs(g, id_col="doc_id"), batch_format="pandas"
    ).materialize()
    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        }
    )
    if pairs.count() == 0:  # count of a materialized dataset is free
        return empty
    # the candidate-pair list is pair-dimension-sized (like a near-dup
    # victim list): collect it ONCE for dedupe + the capped tally + the
    # candidate id set; the corpus itself never lands on the driver.
    import pyarrow.compute as pc
    import ray.data

    # to_pandas (block-level arrow fetch), NOT take_all: take_all converts
    # row-by-row through Python dicts (~1ms/row — 6.5s for 7k pair rows)
    pdf_all = pairs.to_pandas()
    n_capped = int(pdf_all["capped"].sum())
    if n_capped:
        # no silent caps: truncated buckets mean missed recall
        print(
            f"[minhash_neardup] WARNING: {n_capped} candidate pairs came from "
            f"capped buckets (>4096 docs, adversarial) — recall truncated there",
            flush=True,
        )
    pdf = pdf_all[["id_a", "id_b"]].drop_duplicates()
    cand = ray.data.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))
    # broadcast semi-join text fetch: stream the corpus once through an
    # is_in filter so the text-back joins see a candidate-sized right
    # side instead of the whole documents table. At 100 TB the same shape
    # re-reads text by row-id from the columnar store.
    cand_ids = pa.array(
        np.unique(np.concatenate((pdf["id_a"].to_numpy(), pdf["id_b"].to_numpy())))
    )
    texts_small = ds.map_batches(
        lambda b: b.filter(pc.is_in(b["doc_id"], value_set=cand_ids)),
        batch_format="pyarrow",
    ).materialize()  # consumed by both joins; candidate-sized
    j = cand.join(
        texts_small,
        join_type="inner",
        num_partitions=max(2, _ccpus() // 8),
        on=("id_a",),
        right_on=("doc_id",),
    ).map_batches(
        # Dataset.join folds the right key into the left key column
        lambda b: b.rename_columns(
            ["text_a" if c == "text" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    j = j.join(
        texts_small,
        join_type="inner",
        num_partitions=max(2, _ccpus() // 8),
        on=("id_b",),
        right_on=("doc_id",),
    ).map_batches(
        lambda b: b.rename_columns(
            ["text_b" if c == "text" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    return j.map_batches(
        lambda b: verify_jaccard_pairs(b, threshold=threshold),
        batch_format="pyarrow",
    )


# Exact-Jaccard recomputation of ALL >= threshold pairs: the LSH path must
# find exactly these (miss probability < 5e-8 per pair at s >= 0.8 with
# 128 perms / 32 bands). Shingle semantics mirror _hash_tokens_ngrams:
# whitespace split, 3-gram join-by-space, whole text when < 3 tokens,
# DISTINCT shingles.
SQL_MINHASH_NEARDUP = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         END AS sh
  FROM t
)
, l AS (SELECT doc_id, len(sh) AS n FROM s
), e AS (SELECT doc_id, unnest(sh) AS g FROM s
), i AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ninter
  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
-- exploded-shingle join instead of all-pairs list_intersect: identical
-- pair set (a 0-intersection pair can never reach jaccard 0.8) and the
-- identical double (same integer counts in the same expression), ~5x
-- cheaper — this CTE is shared by four oracles
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b,
         CAST(i.ninter AS DOUBLE) / (la.n + lb.n - i.ninter) AS jaccard
  FROM i JOIN l la ON la.doc_id = i.id_a JOIN l lb ON lb.doc_id = i.id_b
) WHERE jaccard >= 0.8
"""


def q_dedup_clusters(sf_dir: str, threshold: float = 0.8):
    """Near-duplicate CLUSTERS: connected components over the verified
    MinHash pair graph, each doc labeled with its component
    representative (min doc_id). Completes the dedup story: pairs ->
    transitive groups -> canonical keep/drop decision. The union-find
    runs on the driver over the PAIR list (pair-dimension-sized, the
    same bounded victim-list shape the curation pipelines collect);
    rows never leave the dataset. Exact SQL oracle: recursive-CTE
    reachability (min-rep closure) over the same exact-Jaccard pair
    set the minhash oracle uses."""
    import pandas as pd

    pairs = q_minhash_neardup(sf_dir, threshold).to_pandas()
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        r = a
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[a] != r:
            parent[a], a = r, parent[a]
        return r

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((int(k), find(int(k))) for k in parent)
    return pd.DataFrame(
        {"doc_id": [a for a, _ in rows], "rep": [b for _, b in rows]}
    ).astype("int64")


def q_dedup_clusters_dist(sf_dir: str, threshold: float = 0.8):
    """dedup_clusters via the DISTRIBUTED connected-components operator
    (stages/components.connected_components — iterative hash-to-min
    label propagation; every exchange carries only (id, label) int64
    rows): the cluster-scale form for when the verified pair list
    outgrows the driver. Same recursive-CTE SQL oracle as the
    union-find path — outputs must be identical."""
    import pyarrow as pa

    import ray.data

    from ..stages.components import connected_components

    pairs = q_minhash_neardup(sf_dir, threshold)
    if isinstance(pairs, __import__("pandas").DataFrame):  # empty fast path
        pairs = ray.data.from_arrow(pa.Table.from_pandas(pairs, preserve_index=False))
    out = connected_components(pairs)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["id"], "rep": b["rep"]}),
        batch_format="pyarrow",
    )


SQL_DEDUP_CLUSTERS = r"""
WITH RECURSIVE t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         END AS sh
  FROM t
), l AS (SELECT doc_id, len(sh) AS n FROM s
), e AS (SELECT doc_id, unnest(sh) AS g FROM s
), i AS MATERIALIZED (
  -- exploded-shingle join (see SQL_MINHASH_NEARDUP) + MATERIALIZED so
  -- the recursion below does not re-evaluate the pair computation on
  -- every iteration (21s -> sub-second at sf0.01)
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ninter
  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS MATERIALIZED (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b,
           CAST(i.ninter AS DOUBLE) / (la.n + lb.n - i.ninter) AS jaccard
    FROM i JOIN l la ON la.doc_id = i.id_a JOIN l lb ON lb.doc_id = i.id_b
  ) WHERE jaccard >= 0.8
), edges AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), comp(id, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, c.r FROM edges e JOIN comp c ON c.id = e.b
)
SELECT id AS doc_id, min(r) AS rep
FROM comp
GROUP BY 1
"""


def q_caption_redact(sf_dir: str):
    """Regex redaction at scale: the numeric id markers in captions
    (`#00001234`) are scrubbed to `<ID>`; per image the redacted-caption
    md5 and hit count. The compiled regex lives in the batch fn (one
    compile per process); exact SQL oracle mirrors with DuckDB
    regexp_replace / regexp_extract_all — the pattern is chosen from
    the RE2-and-Python-re common subset so semantics align exactly."""
    import hashlib
    import re

    import pyarrow as pa

    from ..sources.images import read_images

    pat = re.compile(r"#[0-9]+")

    def redact(batch: pa.Table) -> pa.Table:
        caps = batch["caption"].to_pylist()
        red, md5s, hits = [], [], []
        for c in caps:
            r = pat.sub("<ID>", c)
            md5s.append(hashlib.md5(r.encode()).hexdigest())
            hits.append(len(pat.findall(c)))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "md5": pa.array(md5s, pa.string()),
                "n_hits": pa.array(hits, pa.int64()),
            }
        )

    ds = read_images(sf_dir, columns=["image_id", "caption"])
    return ds.map_batches(redact, batch_format="pyarrow", batch_size=8192)


def sql_caption_redact(images_source: str) -> str:
    return f"""
SELECT image_id,
       md5(regexp_replace(caption, '#[0-9]+', '<ID>', 'g')) AS md5,
       CAST(len(regexp_extract_all(caption, '#[0-9]+')) AS BIGINT) AS n_hits
FROM {images_source}
"""


def q_phash_neardup(sf_dir: str, max_hamming: int = 3):
    """Image near-dup by perceptual-hash hamming distance: 4x16-bit band
    blocking over the phash column (pigeonhole: hamming <= 3 forces an
    identical band, so recall is EXACT), in-bucket vectorized
    XOR+popcount (reuses the SimHash kernel), pairs deduped across
    bands on the driver (pair-dimension-sized). Exact SQL oracle: the
    same band self-join with bit_count(xor(...)) — numpy's masked
    arithmetic shift and DuckDB's agree bit-for-bit on all 4 bands."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..sources.images import read_images
    from ..stages.dedup import grouped_hamming_pairs

    ds = read_images(sf_dir, columns=["image_id", "phash"])

    def band_rows(batch: pa.Table) -> pa.Table:
        ph = batch["phash"].to_numpy(zero_copy_only=False)
        ids = batch["image_id"]
        tables = []
        for b in range(4):
            tables.append(
                pa.table(
                    {
                        "image_id": ids,
                        "simhash": pa.array(ph),
                        "band_id": pa.array(
                            np.full(len(ph), b, dtype=np.int64)
                        ),
                        "band_val": pa.array((ph >> (b * 16)) & 0xFFFF),
                    }
                )
            )
        return pa.concat_tables(tables)

    def band_rows_bucketed(batch: pa.Table) -> pa.Table:
        t = band_rows(batch)
        bid = t["band_id"].to_numpy(zero_copy_only=False)
        bval = t["band_val"].to_numpy(zero_copy_only=False)
        bucket = ((bid * 65536 + bval) * 2654435761) % 512
        return t.append_column("bucket", pa.array(bucket))

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        # one hash bucket of band groups, ALL pairs in a handful of numpy
        # calls (grouped_hamming_pairs batches the triangle enumeration
        # per distinct group size — no per-band-group pandas dispatch)
        key = (g["band_id"] * 65536 + g["band_val"]).to_numpy()
        return grouped_hamming_pairs(
            key,
            g["image_id"].to_numpy(),
            g["simhash"].to_numpy(),
            max_hamming=max_hamming,
        )

    banded = ds.map_batches(band_rows_bucketed, batch_format="pyarrow")
    pairs = banded.groupby("bucket").map_groups(bucket_fn, batch_format="pandas")
    df = pairs.to_pandas()
    if len(df) == 0:
        return pd.DataFrame(
            {"id_a": pd.Series(dtype=str), "id_b": pd.Series(dtype=str),
             "hamming": pd.Series(dtype="int64")}
        )
    out = (
        df.drop(columns=["capped"])
        .drop_duplicates(["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    out["hamming"] = out["hamming"].astype("int64")
    return out


def sql_phash_neardup(images_source: str, max_hamming: int = 3) -> str:
    return f"""
WITH b AS (
  SELECT image_id, phash, g.g AS band_id,
         (phash >> (g.g * 16)) & 65535 AS band_val
  FROM {images_source} CROSS JOIN generate_series(0, 3) g(g)
)
SELECT DISTINCT a.image_id AS id_a, c.image_id AS id_b,
       CAST(bit_count(xor(a.phash, c.phash)) AS BIGINT) AS hamming
FROM b a JOIN b c
  ON a.band_id = c.band_id AND a.band_val = c.band_val
 AND a.image_id < c.image_id
WHERE bit_count(xor(a.phash, c.phash)) <= {max_hamming}
"""


def q_simhash_neardup(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup: banded exact-match blocking + in-bucket vectorized
    hamming verification, fully in-dataset (the 64-bit signature travels
    with the banded row, so verification needs no join-back)."""
    import pandas as pd

    from ..stages.dedup import SimHasher, simhash_bucket_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    banded = ds.map_batches(
        SimHasher, batch_format="pyarrow", batch_size=512, concurrency=(2, 8)
    ).materialize()  # consumed twice (counts + filter); rows are tiny
    hot = hot_bucket_filter(banded, ["band_id", "band_bits"])
    # one execution: in-bucket pair generation + in-group hamming verify
    pairs = hot.groupby("__bucket").map_groups(
        lambda g: simhash_bucket_pairs(g, max_hamming=max_hamming),
        batch_format="pandas",
    ).materialize()
    if pairs.count() == 0:
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
    # verified pairs are output-dimension-sized: collect once, dedupe
    # (same pair surfaces from several bands), tally capped buckets
    pdf_all = pairs.to_pandas()  # block-level fetch; take_all is ~1ms/row
    n_capped = int(pdf_all["capped"].sum())
    if n_capped:
        print(
            f"[simhash_neardup] WARNING: {n_capped} capped pairs — should be "
            f"impossible (hot buckets use the exact pigeonhole kernel)",
            flush=True,
        )
    return (
        pdf_all[["id_a", "id_b", "hamming"]]
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
    near_dup = EmbeddingNearDup(threshold=threshold, exact=True)
    out = ds.groupby("bucket").map_groups(
        lambda g: near_dup(g), batch_format="pandas"
    ).materialize()
    if out.count() == 0:  # keep the typed schema even when no pairs exist
        import pandas as pd

        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
                "capped": pd.Series([], dtype="bool"),
            }
        )
    return out


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
    pdf = partials.to_pandas()  # group×batch-dimension; block-level fetch
    rows = list(zip(pdf["group"], pdf["sketch"]))
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
    # deterministic hash-spread training sample (NOT the head slice — a
    # sorted/clustered table would bias centroids; at cluster scale this
    # is ds.random_sample pushed into the read)
    vid = head["vec_id"].to_numpy().astype(np.uint64)
    pick = (vid * np.uint64(0x9E3779B1)) % np.uint64(1024) < np.uint64(
        max(1, min(1024, (256 * 1024) // max(1, len(vid))))
    )
    sample = _stack_embeddings(head.filter(pa.array(pick))["embedding"])
    centroids = IVFIndexer.train(sample, k=8)
    q = _stack_embeddings(head["embedding"].slice(0, n_queries))
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


def q_image_histogram(sf_dir: str):
    """Corpus-wide 256-bin luminance histogram per format: per-batch
    integer bincount partials (stages/multimodal.ImageHistogram) -> one
    combiner groupby. Exact integers, order-independent; INDEPENDENT
    golden recomputes decode+bincount in a plain loop (SQL cannot
    decode pixels)."""
    from ..sources.images import read_images
    from ..stages.agg import partial_sum_groupby
    from ..stages.multimodal import ImageHistogram

    ds = read_images(sf_dir, columns=["bytes", "fmt"])
    ds = ds.map_batches(
        ImageHistogram, batch_format="pyarrow", batch_size=512,
        concurrency=(2, 8),
    )
    return partial_sum_groupby(ds, ["fmt", "bin"], ["n_px"], coalesce=4)


def q_image_equalize(sf_dir: str):
    """Histogram equalization per image (exact-integer CDF mapping,
    stages/multimodal.ImageEqualizer); output per image the equalized
    CRC + range. Per-image transform at corpus scale = one actor pool;
    INDEPENDENT golden recomputes the formula in a plain loop, and the
    monotone-LUT/range invariants are pytest-pinned."""
    from ..sources.images import read_images
    from ..stages.multimodal import ImageEqualizer

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt"])
    return ds.map_batches(
        ImageEqualizer, batch_format="pyarrow", batch_size=512,
        concurrency=(2, 8),
    )


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


def embed_neardup_counts(embed_ds, threshold: float = 0.9999):
    """LSH bucket -> within-bucket cosine pairs -> per-id near-dup counts
    over an (image_id, embedding) dataset (shared by q_image_embed_neardup
    and curate_images, which feeds it from a single fused decode pass).
    The pair stage groups on a 512-way hash of the bucket and iterates
    real buckets vectorized inside (EmbeddingNearDupBucketed) — one
    map_groups dispatch per 4096 tiny buckets dominated the tail.

    SAMPLED (exact=False) mode, deliberately: the synthetic corpus is one
    visual family (shared gradient + per-image noise), so at 16-dim
    patch-mean granularity nearly every in-bucket pair clears 0.9999 —
    measured 2.3e8 qualifying pairs at sf0.01, i.e. the exact pair set is
    Omega(n^2) of the corpus, not a dup-dimension list. Pairs from
    truncated buckets carry the ``capped`` flag; the production move for
    a saturated corpus is cluster-level dedup (semantic_dedup /
    dedup_clusters), not pair enumeration."""
    import pyarrow.compute as pc

    from ..stages.dedup import EmbeddingNearDupBucketed
    from ..stages.similarity import LSHBucketer

    ds = embed_ds.map_batches(
        LSHBucketer,
        fn_constructor_kwargs={"dim": 16, "bits": 12, "id_col": "image_id"},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )

    def superbucket(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__bucket", pa.array((b * np.uint64(2654435761)) % 512)
        )

    ds = ds.map_batches(superbucket, batch_format="pyarrow")
    near_dup = EmbeddingNearDupBucketed(
        threshold=threshold, id_col="image_id", cap=256
    )
    from ray.data.aggregate import Count

    pairs = ds.groupby("__bucket").map_groups(
        lambda g: near_dup(g), batch_format="pyarrow"
    )
    # summarize (pair lists can be large for self-similar corpora)
    return pairs.groupby("id_a").aggregate(Count(alias_name="n_neardups"))


def q_image_embed_neardup(sf_dir: str, threshold: float = 0.9999):
    """Visual near-dup: decode -> patch-mean embedding -> LSH bucket ->
    within-bucket cosine. Composition of the multimodal + dedup stages."""
    from ..sources.images import read_images
    from ..stages.multimodal import ImageEmbedder

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt"])
    ds = ds.map_batches(
        ImageEmbedder, batch_format="pyarrow", batch_size=1024, concurrency=(2, 16)
    )
    return embed_neardup_counts(ds, threshold=threshold)


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


def q_knn_all(sf_dir: str, k: int = 3, radius: float = 0.1):
    """Full self-join kNN: k nearest neighbors within `radius` for EVERY
    image (oracle-exact). One 9x cell-ring explode of (id, lon, lat) rows
    + one groupby(cell) shuffle; per-cell top-k is final."""
    from ..sources.images import read_images
    from ..stages.knn import knn_all

    ds = read_images(sf_dir, columns=["image_id", "lon", "lat"])
    return knn_all(ds, radius=radius, k=k)


def q_audio_features(sf_dir: str):
    """Audio modality: decode every PCM WAV clip (actor pool, pure-numpy
    RIFF parser) and aggregate per sample rate. Float features are
    truncated to integer micro-units before the sum so the aggregate is
    order-independent (same convention as the cent-truncated money sums).
    Golden oracle (decode is not SQL-expressible)."""
    from ..sources.audio import read_audio
    from ..stages.agg import partial_sum_groupby
    from ..stages.multimodal import AudioDecode

    ds = read_audio(sf_dir, columns=["audio_id", "bytes"])
    feats = ds.map_batches(
        AudioDecode, batch_format="pyarrow", batch_size=256, concurrency=(2, 8)
    )

    def to_ints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sample_rate": batch["sample_rate"],
                "ms": pa.array(
                    np.trunc(
                        batch["duration_s"].to_numpy() * 1000.0
                    ).astype(np.int64)
                ),
                "rms_ppm": pa.array(
                    np.trunc(batch["rms"].to_numpy() * 1e6).astype(np.int64)
                ),
            }
        )

    return partial_sum_groupby(
        feats.map_batches(to_ints, batch_format="pyarrow"),
        ["sample_rate"],
        ["ms", "rms_ppm"],
        count_alias="n",
        coalesce=4,
    )


def q_knn_nearest(sf_dir: str, n_queries: int = 500, k: int = 5):
    """UNBOUNDED k nearest neighbors (no radius) for a broadcast query
    set via cell-RING EXPANSION: bounded scans at radius r, doubling r
    only for queries that haven't proven their k-th neighbor <= r yet
    (see stages/knn.knn_nearest). Self is excluded."""
    import pyarrow.parquet as pq

    from ..sources.images import ensure_images_for_sf_dir, read_images
    from ..stages.knn import knn_nearest

    path = ensure_images_for_sf_dir(sf_dir)
    head = pq.read_table(path, columns=["image_id", "lon", "lat"])
    order = pa.compute.sort_indices(head["image_id"])
    head = head.take(order[:n_queries])

    return knn_nearest(
        lambda: read_images(sf_dir, columns=["image_id", "lon", "lat"]),
        head["image_id"].to_pylist(),
        head["lon"].to_numpy(),
        head["lat"].to_numpy(),
        k=k,
    )


def sql_knn_nearest(images_source: str, n_queries: int = 500, k: int = 5) -> str:
    d2 = "(i.lon - q.qlon) * (i.lon - q.qlon) + (i.lat - q.qlat) * (i.lat - q.qlat)"
    return f"""
WITH q AS (
    SELECT image_id AS query_id, lon AS qlon, lat AS qlat
    FROM {images_source} ORDER BY image_id LIMIT {n_queries}
), d AS (
    SELECT q.query_id, i.image_id, {d2} AS d2
    FROM {images_source} i CROSS JOIN q
    WHERE i.image_id <> q.query_id
)
SELECT query_id, image_id, rank FROM (
    SELECT query_id, image_id,
           row_number() OVER (PARTITION BY query_id ORDER BY d2 ASC, image_id ASC) AS rank
    FROM d
) WHERE rank <= {k}
"""


def sql_knn_all(images_source: str, k: int = 3, radius: float = 0.1) -> str:
    """Cell-ring equi-join oracle (BETWEEN +-1 on the same grid cells the
    engine uses; guaranteed cover of the radius disc)."""
    d2 = "(a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat)"
    return f"""
WITH pts AS (
    SELECT image_id, lon, lat,
           CAST(floor((lon + 180.0) / {radius!r}) AS BIGINT) AS cx,
           CAST(floor((lat + 90.0) / {radius!r}) AS BIGINT) AS cy
    FROM {images_source}
), cand AS (
    SELECT a.image_id AS query_id, b.image_id AS image_id, {d2} AS d2
    FROM pts a JOIN pts b
      ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
     AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
     AND a.image_id <> b.image_id
    WHERE {d2} <= {radius * radius!r}
)
SELECT query_id, image_id, rank FROM (
    SELECT query_id, image_id,
           row_number() OVER (PARTITION BY query_id ORDER BY d2 ASC, image_id ASC) AS rank
    FROM cand
) WHERE rank <= {k}
"""


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


def q_quantiles_quality(sf_dir: str):
    """Approximate per-language quality-score quantiles (p50/p90/p99) via
    mergeable t-digest sketches: per-batch per-group digest partials (a
    few KB each) -> tiny associative merge — no sort shuffle of the raw
    values, unlike exact quantiles. Accuracy bound pinned by pytest;
    driver check via committed golden (deterministic partial layout at a
    fixed batch size)."""
    import pandas as pd

    from ..stages.text import TextFeatures
    from ..stages.sketch import tdigest_merge_quantiles, tdigest_partials

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    class FeaturesWithLang:
        def __init__(self):
            self.feats = TextFeatures()

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = self.feats(batch)
            return out.append_column("lang", batch["lang"])

    feats = ds.map_batches(
        FeaturesWithLang, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)
    )

    # partial digests over DATA-KEYED chunks (doc_id // 4096), not batch
    # boundaries — batching varies with read parallelism and a t-digest is
    # batching-sensitive; data-keyed partials make the estimate
    # deterministic (and the merge order below is sorted)
    def add_chunk(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.append_column("chunk", pa.array((doc_id // 4096).astype(np.int64)))

    partials = (
        feats.map_batches(add_chunk, batch_format="pyarrow")
        .groupby(["chunk", "lang"])
        .map_groups(
            lambda g: tdigest_partials(
                pa.Table.from_pandas(g, preserve_index=False),
                "quality_score",
                "lang",
            ).to_pandas(),
            batch_format="pandas",
        )
    )
    pdf = partials.to_pandas()  # group×batch-dimension; block-level fetch
    rows = sorted(
        (
            (g, tuple(m), tuple(w))
            for g, m, w in zip(pdf["group"], pdf["means"], pdf["weights"])
        ),
        key=lambda r: (str(r[0]), r[1][:1]),
    )
    est = tdigest_merge_quantiles(rows, quantiles=(0.5, 0.9, 0.99))
    langs = sorted(est)
    return pd.DataFrame(
        {
            "lang": langs,
            "p50": [est[g][0] for g in langs],
            "p90": [est[g][1] for g in langs],
            "p99": [est[g][2] for g in langs],
        }
    )


def q_pack_sequences(sf_dir: str, budget: int = 2048, part_size: int = 4096):
    """LLM sequence packing: assign docs (in doc_id order) to fixed
    token-budget chunks via a DISTRIBUTED PREFIX SUM — the scan primitive:

    pass 1: per-partition token sums (partition = doc_id // part_size,
            data-keyed, so no global sort) -> driver computes the
            exclusive prefix over the partition sums (partition-count
            rows, never per-doc data);
    pass 2: each partition adds its broadcast offset to its local
            exclusive cumsum -> chunk_id = cum_excl // budget -> per-chunk
            rollup (combiner + tiny groupby).

    Oracle: the same assignment as one SQL window cumsum.
    """
    import pandas as pd

    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tokens(batch: pa.Table) -> pa.Table:
        text = batch["text"].to_pandas().fillna("").astype(str)
        stripped = text.str.strip()
        n_tok = np.where(
            stripped.str.len() == 0, 0, stripped.str.split().str.len()
        ).astype(np.int64)
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "part": pa.array((doc_id // part_size).astype(np.int64)),
                "n_tok": pa.array(n_tok),
            }
        )

    t = ds.map_batches(tokens, batch_format="pyarrow").materialize()
    sums = (
        partial_sum_groupby(t, ["part"], ["n_tok"], coalesce=4)
        .to_pandas()
        .sort_values("part")  # partition-dimension rows only
    )
    offsets = dict(
        zip(sums["part"], np.concatenate(([0], np.cumsum(sums["n_tok"])[:-1])))
    )

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        base = offsets[int(g["part"].iloc[0])]
        cum_excl = base + g["n_tok"].cumsum().shift(fill_value=0)
        return pd.DataFrame(
            {
                "chunk_id": (cum_excl // budget).astype(np.int64),
                "n_tok": g["n_tok"].to_numpy(),
            }
        )

    packed = t.groupby("part").map_groups(assign, batch_format="pandas")
    return partial_sum_groupby(
        packed, ["chunk_id"], ["n_tok"], count_alias="n_docs", coalesce=4
    ).map_batches(
        lambda b: b.rename_columns(["chunk_id", "n_tokens", "n_docs"]),
        batch_format="pyarrow",
    )


SQL_PACK_SEQUENCES = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
  FROM documents
), c AS (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
  FROM t
)
SELECT CAST(cum_excl // 2048 AS BIGINT) AS chunk_id,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_docs
FROM c GROUP BY 1
"""


def q_s2_cells(sf_dir: str, level: int = 8):
    """Per-S2-cell image counts at one level (the H3/S2 cell-encode role
    of the north rule; core/s2.py implements the published cube-face +
    quadratic + Hilbert construction from scratch). Golden oracle —
    Hilbert ids are not SQL-expressible; the encode itself is pinned by
    roundtrip/known-vector pytest.

    Grouping runs on the compact token, not the canonical id: canonical
    same-level ids differ only in their HIGH bits, which degrades
    pyarrow's hash grouper to quadratic probing (measured 96s -> 0.06s
    on 600k rows — core/s2.cell_token). Canonical ids are restored after
    the aggregate, so the output schema/values are unchanged."""
    import numpy as np
    import pyarrow as pa

    from ..core import s2
    from ..sources.images import read_images
    from ..stages.agg import partial_count_groupby
    from ..stages.tiles import encode_s2

    ds = read_images(sf_dir, columns=["lon", "lat"])
    ds = ds.map_batches(
        lambda b: encode_s2(b, level=level, keep_columns=[], as_token=True),
        batch_format="pyarrow",
        batch_size=16384,
    )
    agg = partial_count_groupby(ds, ["s2_tok"], alias="n")

    def restore(batch: pa.Table) -> pa.Table:
        tok = batch["s2_tok"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = s2.token_to_cell_id(tok, level)
        return pa.table(
            {"s2_cell": pa.array(ids.view(np.int64)), "n": batch["n"]}
        )

    return agg.map_batches(restore, batch_format="pyarrow")


def q_hex_cells(sf_dir: str, size_m: float = 250_000.0):
    """Per-hex-cell image counts (axial hex binning on WebMercator — the
    H3-grid role; exact SQL oracle mirrors the cube rounding 1:1)."""
    from ..sources.images import read_images
    from ..stages.agg import partial_count_groupby
    from ..stages.tiles import hex_bin

    ds = read_images(sf_dir, columns=["lon", "lat"])
    ds = ds.map_batches(
        lambda b: hex_bin(b, size_m=size_m, keep_columns=[]),
        batch_format="pyarrow",
        batch_size=16384,
    )
    return partial_count_groupby(ds, ["hex_q", "hex_r"], alias="n")


def sql_hex_cells(images_source: str, size_m: float = 250_000.0) -> str:
    mx = "(lon * (pi() / 180.0) * 6378137.0)"
    my = "(ln(tan((90.0 + lat) * (pi() / 360.0))) * 6378137.0)"
    return f"""
WITH a AS (
  SELECT ({mx} * (sqrt(3.0) / 3.0) - {my} * (1.0 / 3.0)) / {size_m!r} AS q,
         ({my} * (2.0 / 3.0)) / {size_m!r} AS r
  FROM {images_source}
  WHERE isfinite({my})
), c AS (
  SELECT q AS cx, r AS cz, -q - r AS cy,
         floor(q + 0.5) AS rx0, floor(-q - r + 0.5) AS ry0, floor(r + 0.5) AS rz0
  FROM a
), f AS (
  SELECT cx, cy, cz, rx0, ry0, rz0,
         abs(rx0 - cx) AS dx, abs(ry0 - cy) AS dy, abs(rz0 - cz) AS dz
  FROM c
)
SELECT CAST(CASE WHEN dx > dy AND dx > dz THEN -ry0 - rz0 ELSE rx0 END AS BIGINT) AS hex_q,
       -- the fix branches are mutually exclusive, so only the z-fix
       -- changes hex_r and it sees the ORIGINAL rx0/ry0
       CAST(CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
                 THEN -rx0 - ry0 ELSE rz0 END AS BIGINT) AS hex_r,
       count(*) AS n
FROM f
GROUP BY 1, 2
"""


# ---- aperture-7 hierarchical hex grid (H3-hierarchy role) -----------------
#
# core/hexgrid.py provides the full H3-style hierarchy on the WebMercator
# plane: multi-resolution aperture-7 cells, parent/child, k-ring, compact.
# (Canonical-H3 icosahedral indexes are documented out of scope there; the
# spherical-cell role is core/s2.py.) The cell assignment, parent rollup
# and k-ring neighborhood join all have EXACT recomputing SQL oracles —
# the aperture math is two 2x2 integer matrices, inlined into the SQL.


def _hexgrid_counts(sf_dir: str, res: int):
    """Shared head: per-cell (hq, hr, cell, n) counts at one resolution."""
    from ..sources.images import read_images
    from ..stages.agg import partial_count_groupby
    from ..stages.tiles import hexgrid_encode

    ds = read_images(sf_dir, columns=["lon", "lat"])
    ds = ds.map_batches(
        lambda b: hexgrid_encode(b, res=res, keep_columns=[]),
        batch_format="pyarrow",
        batch_size=16384,
    )
    return partial_count_groupby(ds, ["hq", "hr", "cell"], alias="n")


def q_h3_cells(sf_dir: str, res: int = 6):
    """Per-cell image counts at one aperture-7 resolution (packed int64
    cell ids). The whole hierarchy encode is one vectorized map_batches;
    only (cell, n) partials cross the exchange."""
    ds = _hexgrid_counts(sf_dir, res)
    return ds.select_columns(["cell", "n"])


def q_h3_rollup(sf_dir: str, res: int = 7):
    """Aperture-7 parent rollup: counts at ``res`` re-aggregated to the
    res-1 parents (cell -> cube_round(M^-1 @ cell)). Output per parent:
    ``n_cells`` occupied children and ``n`` total points. The rollup runs
    on the already-aggregated cell table (cell-cardinality sized), so the
    second exchange is tiny at any data scale."""
    import numpy as np
    import pyarrow as pa

    from ..core import hexgrid
    from ..stages.agg import partial_sum_groupby

    ds = _hexgrid_counts(sf_dir, res)

    def to_parent(batch: pa.Table) -> pa.Table:
        q = batch["hq"].to_numpy(zero_copy_only=False)
        r = batch["hr"].to_numpy(zero_copy_only=False)
        pq_, pr_ = hexgrid.parent(q, r)
        cell = hexgrid.pack(np.full(pq_.shape, res - 1, dtype=np.int64), pq_, pr_)
        return pa.table(
            {
                "cell": pa.array(cell),
                "n_cells": pa.array(np.ones(len(cell), dtype=np.int64)),
                "n": batch["n"],
            }
        )

    ds = ds.map_batches(to_parent, batch_format="pyarrow")
    return partial_sum_groupby(ds, ["cell"], ["n_cells", "n"], coalesce=4)


def q_h3_kring(sf_dir: str, res: int = 5):
    """k-ring(1) neighborhood density join: for every occupied cell, its
    own count ``n`` plus ``ring_n`` = total points in the 7-cell
    neighborhood. Implemented as a 7x fan-out of the aggregated cell
    table (donations to each neighbor) -> one tiny groupby -> filter to
    occupied cells; no row-level shuffle, no join operator needed."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..core import hexgrid
    from ..stages.agg import partial_sum_groupby

    ds = _hexgrid_counts(sf_dir, res)
    offs = hexgrid.kring_offsets(1)

    def fan_out(batch: pa.Table) -> pa.Table:
        q = batch["hq"].to_numpy(zero_copy_only=False)
        r = batch["hr"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        k = len(offs)
        qq = np.repeat(q, k) + np.tile(offs[:, 0], len(q))
        rr = np.repeat(r, k) + np.tile(offs[:, 1], len(q))
        ring = np.repeat(n, k)
        own = np.where(
            np.tile((offs[:, 0] == 0) & (offs[:, 1] == 0), len(q)), ring, 0
        )
        return pa.table(
            {
                "hq": pa.array(qq),
                "hr": pa.array(rr),
                "ring_n": pa.array(ring),
                "n": pa.array(own),
            }
        )

    fanned = ds.map_batches(fan_out, batch_format="pyarrow")
    agg = partial_sum_groupby(fanned, ["hq", "hr"], ["ring_n", "n"], coalesce=4)

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["n"], 0))
        q = t["hq"].to_numpy(zero_copy_only=False)
        r = t["hr"].to_numpy(zero_copy_only=False)
        cell = hexgrid.pack(np.full(len(q), res, dtype=np.int64), q, r)
        return pa.table({"cell": pa.array(cell), "n": t["n"], "ring_n": t["ring_n"]})

    return agg.map_batches(finish, batch_format="pyarrow")


def q_h3_compact(sf_dir: str, res: int = 6):
    """H3-style compact of the occupied cell set: full 7-child sets
    collapse into their parent, recursively. The compact itself runs on
    the driver over the AGGREGATED cell id array — cell cardinality is
    bounded by the grid (res 6 is ~10^5 cells globally), independent of
    row count, so this stays driver-safe at any data scale. Output:
    (cell, res) terminal cover, sorted."""
    import pandas as pd

    from ..core import hexgrid

    ds = _hexgrid_counts(sf_dir, res)
    cells = ds.select_columns(["cell"]).to_pandas()["cell"].to_numpy()
    comp = hexgrid.compact(cells)
    cres, _, _ = hexgrid.unpack(comp)
    return pd.DataFrame({"cell": comp, "res": cres.astype("int32")})


def _sql_hexgrid_cells(images_source: str, res: int) -> str:
    """Fractional axial at ``res`` + cube rounding, mirroring
    hexgrid.point_to_cell float-op-for-float-op (M^res inlined)."""
    import numpy as np

    from ..core import hexgrid

    mp = hexgrid.m_pow(res)
    s0 = repr(hexgrid.S0)
    mx = "(lon * (pi() / 180.0) * 6378137.0)"
    my = "(ln(tan((90.0 + lat) * (pi() / 360.0))) * 6378137.0)"
    return f"""
  SELECT ({mp[0,0]}.0 * q0 + {mp[0,1]}.0 * r0) AS q,
         ({mp[1,0]}.0 * q0 + {mp[1,1]}.0 * r0) AS r
  FROM (
    SELECT ({mx} * (sqrt(3.0) / 3.0) - {my} * (1.0 / 3.0)) / {s0} AS q0,
           ({my} * (2.0 / 3.0)) / {s0} AS r0
    FROM {images_source}
    WHERE isfinite({my})
  )
"""


_SQL_CUBE_ROUND = """
  SELECT CAST(CASE WHEN dx > dy AND dx > dz THEN -ry0 - rz0 ELSE rx0 END AS BIGINT) AS hq,
         CAST(CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
                   THEN -rx0 - ry0 ELSE rz0 END AS BIGINT) AS hr
  FROM (
    SELECT rx0, ry0, rz0,
           abs(rx0 - q) AS dx, abs(ry0 + q + r) AS dy, abs(rz0 - r) AS dz
    FROM (
      SELECT q, r,
             floor(q + 0.5) AS rx0, floor(-q - r + 0.5) AS ry0, floor(r + 0.5) AS rz0
      FROM frac
    )
  )
"""


def _sql_pack(res_expr: str, q: str = "hq", r: str = "hr") -> str:
    mask = (1 << 28) - 1
    return (
        f"(CAST({res_expr} AS BIGINT) << 56) "
        f"| (({q} & {mask}) << 28) | ({r} & {mask})"
    )


def sql_h3_cells(images_source: str, res: int = 6) -> str:
    return f"""
WITH frac AS ({_sql_hexgrid_cells(images_source, res)}),
cells AS ({_SQL_CUBE_ROUND})
SELECT {_sql_pack(res)} AS cell, count(*) AS n
FROM cells
GROUP BY 1
"""


def sql_h3_rollup(images_source: str, res: int = 7) -> str:
    # parent = cube_round(((3q + r)/7, (-q + 2r)/7)) on the child ints.
    return f"""
WITH frac AS ({_sql_hexgrid_cells(images_source, res)}),
cells AS ({_SQL_CUBE_ROUND}),
child AS (
  SELECT hq, hr, count(*) AS n FROM cells GROUP BY 1, 2
),
pfrac AS (
  SELECT (3.0 * hq + 1.0 * hr) / 7.0 AS q,
         (-1.0 * hq + 2.0 * hr) / 7.0 AS r,
         n
  FROM child
),
parent AS (
  SELECT CAST(CASE WHEN dx > dy AND dx > dz THEN -ry0 - rz0 ELSE rx0 END AS BIGINT) AS hq,
         CAST(CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
                   THEN -rx0 - ry0 ELSE rz0 END AS BIGINT) AS hr,
         n
  FROM (
    SELECT rx0, ry0, rz0, n,
           abs(rx0 - q) AS dx, abs(ry0 + q + r) AS dy, abs(rz0 - r) AS dz
    FROM (
      SELECT q, r, n,
             floor(q + 0.5) AS rx0, floor(-q - r + 0.5) AS ry0, floor(r + 0.5) AS rz0
      FROM pfrac
    )
  )
)
SELECT {_sql_pack(str(res - 1))} AS cell,
       count(*) AS n_cells, CAST(sum(n) AS BIGINT) AS n
FROM parent
GROUP BY 1
"""


def sql_h3_kring(images_source: str, res: int = 5) -> str:
    return f"""
WITH frac AS ({_sql_hexgrid_cells(images_source, res)}),
cells AS ({_SQL_CUBE_ROUND}),
c AS (
  SELECT hq, hr, count(*) AS n FROM cells GROUP BY 1, 2
)
SELECT {_sql_pack(str(res), 'a.hq', 'a.hr')} AS cell,
       CAST(a.n AS BIGINT) AS n,
       CAST(sum(b.n) AS BIGINT) AS ring_n
FROM c a JOIN c b
  ON (abs(a.hq - b.hq) + abs(a.hr - b.hr) + abs(a.hq + a.hr - b.hq - b.hr)) / 2 <= 1
GROUP BY a.hq, a.hr, a.n
"""


def q_dbscan(sf_dir: str, eps: float = 0.01, min_pts: int = 10):
    """Distributed exact DBSCAN over image geotags (stages/dbscan.py:
    MR-DBSCAN-style cell decomposition; two groupby exchanges, driver
    union-find over the bounded cell-label graph). Output: clustered
    points only, cluster id = min image_id in the cluster. Independent
    golden: a from-scratch single-node brute-force DBSCAN
    (tests/golden_util.brute_dbscan) with the identical deterministic
    border rule."""
    from ..sources.images import read_images
    from ..stages.dbscan import dbscan

    ds = read_images(sf_dir, columns=["image_id", "lon", "lat"])
    return dbscan(ds, eps=eps, min_pts=min_pts)


def q_tile_pyramid(sf_dir: str, base_zoom: int = 12, levels: int = 4):
    """Raster overview pyramid: per-tile density + mean-color mass at
    ``base_zoom``, rolled up level by level (each parent cell = the sum
    of its 2x2 children — the standard overview construction, exact in
    integers). One decode+assign pass builds the base; every rollup
    runs on the ALREADY aggregated cell table (cell-bounded, skinny),
    so the pyramid costs base + negligible. Output rows across all
    levels: (tm_id, gx, gy, n, sum_r, sum_g, sum_b). Golden oracle
    (decode); conservation (level totals equal, parent = sum of
    children) is pytest-pinned."""
    import numpy as np
    import pyarrow as pa

    from ..sources.images import read_images
    from ..stages.agg import partial_sum_groupby
    from ..stages.multimodal import ImageStats
    from ..stages.tiles import encode_tiles

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt", "lon", "lat"])

    class StatsWithTile:
        """Tile-assign FIRST (drops outside-grid rows, same policy as
        tile_metrics), then decode the surviving rows once."""

        def __init__(self):
            self.stats = ImageStats()

        def __call__(self, batch: pa.Table) -> pa.Table:
            t = encode_tiles(
                batch,
                "WebMercatorQuad",
                (base_zoom,),
                keep_columns=["image_id", "bytes", "fmt"],
            )
            stats = self.stats(t)
            return pa.table(
                {
                    "gx": t["tile_x"],
                    "gy": t["tile_y"],
                    "sum_r": stats["mean_r"],
                    "sum_g": stats["mean_g"],
                    "sum_b": stats["mean_b"],
                }
            )

    enc = ds.map_batches(
        StatsWithTile, batch_format="pyarrow", batch_size=1024, concurrency=(2, 16)
    )
    base = partial_sum_groupby(
        enc, ["gx", "gy"], ["sum_r", "sum_g", "sum_b"], count_alias="n"
    )
    # each level is cell-bounded (skinny aggregate); materializing lets
    # the union consume all levels without re-executing shared lineage
    base = base.materialize()

    def tag(level_ds, z):
        def add(b: pa.Table) -> pa.Table:
            return b.append_column(
                "tm_id", pa.array(np.full(b.num_rows, z, dtype=np.int32))
            )

        return level_ds.map_batches(add, batch_format="pyarrow")

    out = tag(base, base_zoom)
    cur = base
    for z in range(base_zoom - 1, base_zoom - levels, -1):
        def to_parent(b: pa.Table) -> pa.Table:
            gx = b["gx"].to_numpy(zero_copy_only=False) >> 1
            gy = b["gy"].to_numpy(zero_copy_only=False) >> 1
            return pa.table(
                {
                    "gx": pa.array(gx),
                    "gy": pa.array(gy),
                    "sum_r": b["sum_r"],
                    "sum_g": b["sum_g"],
                    "sum_b": b["sum_b"],
                    "n": b["n"],
                }
            )

        cur = partial_sum_groupby(
            cur.map_batches(to_parent, batch_format="pyarrow"),
            ["gx", "gy"],
            ["sum_r", "sum_g", "sum_b", "n"],
            coalesce=4,
        ).materialize()
        out = out.union(tag(cur, z))
    return out


def q_geodesic_hist(sf_dir: str, bucket_m: float = 100_000.0):
    """Geodesic (haversine) distance features: each image's nearest
    urban center (the 12 deterministic cluster seeds, broadcast — tiny
    dimension side) and its distance bucket; per (center, bucket)
    counts. Exact SQL oracle: the haversine expression is mirrored
    float-op-for-float-op and the bucket floor gives huge margins
    against last-ulp libm differences."""
    import numpy as np
    import pyarrow as pa

    from ..sources.images import _URBAN_CENTERS, read_images
    from ..stages.agg import partial_count_groupby

    centers = np.asarray(_URBAN_CENTERS, dtype=np.float64)  # (k, 2) lon/lat
    clon = np.radians(centers[:, 0])
    clat = np.radians(centers[:, 1])

    def nearest(batch: pa.Table) -> pa.Table:
        lon = np.radians(batch["lon"].to_numpy(zero_copy_only=False))
        lat = np.radians(batch["lat"].to_numpy(zero_copy_only=False))
        # (n, k) haversine to every center; k = 12 so the dense matrix
        # is cheap and the argmin is exact
        dphi = (clat[None, :] - lat[:, None]) / 2.0
        dlmb = (clon[None, :] - lon[:, None]) / 2.0
        a = np.sin(dphi) ** 2 + np.cos(lat)[:, None] * np.cos(clat)[None, :] * np.sin(dlmb) ** 2
        d = 2.0 * 6371000.0 * np.arcsin(np.sqrt(a))
        best = np.argmin(d, axis=1)
        dist = d[np.arange(len(lon)), best]
        return pa.table(
            {
                "center": pa.array(best.astype(np.int64)),
                "bucket": pa.array(np.floor(dist / bucket_m).astype(np.int64)),
            }
        )

    ds = read_images(sf_dir, columns=["lon", "lat"])
    ds = ds.map_batches(nearest, batch_format="pyarrow", batch_size=16384)
    return partial_count_groupby(ds, ["center", "bucket"], alias="n")


def sql_geodesic_hist(images_source: str, bucket_m: float = 100_000.0) -> str:
    from ..sources.images import _URBAN_CENTERS

    vals = ", ".join(
        f"({i}, {lon!r}, {lat!r})" for i, (lon, lat) in enumerate(_URBAN_CENTERS)
    )
    hav = (
        "2.0 * 6371000.0 * asin(sqrt("
        "pow(sin((radians(c.clat) - radians(i.lat)) / 2.0), 2)"
        " + cos(radians(i.lat)) * cos(radians(c.clat))"
        " * pow(sin((radians(c.clon) - radians(i.lon)) / 2.0), 2)))"
    )
    return f"""
WITH c(center, clon, clat) AS (VALUES {vals}),
d AS (
  SELECT arg_min(c.center, {hav}) AS center,
         min({hav}) AS dist
  FROM {images_source} i CROSS JOIN c
  GROUP BY i.lon, i.lat, i.image_id
)
SELECT CAST(center AS BIGINT) AS center,
       CAST(floor(dist / {bucket_m!r}) AS BIGINT) AS bucket,
       count(*) AS n
FROM d
GROUP BY 1, 2
"""


def q_vectorize_raster(sf_dir: str):
    """Raster -> vector: marching-squares contours of each image's
    luminance mask (stages/multimodal.RasterVectorize, kernel in
    core/marching.py — midpoint rule, exact integer half-unit coords).
    Completes the raster<->vector pair (tilecut / vectorcut are the
    other direction). Golden oracle; the kernel's case table is pinned
    by shape tests (pixel diamond, corner-cut octagon, saddle
    separation, donut holes) in tests/test_marching.py."""
    from ..sources.images import read_images
    from ..stages.multimodal import RasterVectorize

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt"])
    return ds.map_batches(
        RasterVectorize,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(2, 16),
    )


def q_idw_grid(sf_dir: str, g: float = 0.5):
    """Inverse-distance-weighted interpolation of image resolution (w*h)
    onto the occupied g-degree grid: for every cell with >= 1 resident
    point, idw = sum(wq_i * v_i) // sum(wq_i) over all points within
    r = g of the cell CENTER (9-cell donation, as in stages/dbscan.py).

    Weights are FIXED-POINT: wq = floor(2^20 / (1 + floor(d2 / 1e-4))).
    Integer contributions make the reduction order-independent — the
    same result on any cluster size / batch order (a reproducibility
    feature at scale, and what lets DuckDB recompute it exactly: float
    IDW sums would differ in the last ulp between engines). Fully
    combiner-shaped: per-batch arrow partials -> one skinny groupby; no
    map_groups, no per-cell Python."""
    import numpy as np
    import pyarrow as pa

    from ..sources.images import read_images
    from ..stages.agg import partial_sum_groupby

    r2 = g * g
    ds = read_images(sf_dir, columns=["lon", "lat", "w", "h"])

    def donate_and_weigh(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        v = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64) * batch[
            "h"
        ].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = np.floor(lon / g).astype(np.int64)
        cy = np.floor(lat / g).astype(np.int64)
        gx_l, gy_l, wv_l, w_l, n_l, res_l = [], [], [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tx, ty = cx + dx, cy + dy
                ctr_x = (tx + 0.5) * g
                ctr_y = (ty + 0.5) * g
                d2 = (lon - ctr_x) ** 2 + (lat - ctr_y) ** 2
                ok = d2 <= r2
                wq = np.floor(
                    1048576.0 / (1.0 + np.floor(d2[ok] / 1e-4))
                ).astype(np.int64)
                gx_l.append(tx[ok])
                gy_l.append(ty[ok])
                wv_l.append(wq * v[ok])
                w_l.append(wq)
                n_l.append(np.ones(int(ok.sum()), dtype=np.int64))
                res_l.append(
                    np.full(int(ok.sum()), 1 if (dx == 0 and dy == 0) else 0, np.int64)
                )
        return pa.table(
            {
                "gx": pa.array(np.concatenate(gx_l)),
                "gy": pa.array(np.concatenate(gy_l)),
                "sum_wv": pa.array(np.concatenate(wv_l)),
                "sum_w": pa.array(np.concatenate(w_l)),
                "n": pa.array(np.concatenate(n_l)),
                "n_res": pa.array(np.concatenate(res_l)),
            }
        )

    agg = partial_sum_groupby(
        ds.map_batches(donate_and_weigh, batch_format="pyarrow"),
        ["gx", "gy"],
        ["sum_wv", "sum_w", "n", "n_res"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.greater(batch["n_res"], 0))
        idw = pc.divide(t["sum_wv"], t["sum_w"])  # int64 floor division
        return pa.table(
            {"gx": t["gx"], "gy": t["gy"], "n": t["n"], "idw": idw}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_idw_grid(images_source: str, g: float = 0.5) -> str:
    return f"""
WITH pts AS (
  SELECT lon, lat, CAST(w AS BIGINT) * CAST(h AS BIGINT) AS v,
         CAST(floor(lon / {g!r}) AS BIGINT) AS cx,
         CAST(floor(lat / {g!r}) AS BIGINT) AS cy
  FROM {images_source}
), fan AS (
  SELECT p.cx + o.dx AS gx, p.cy + o.dy AS gy, p.v,
         (p.lon - (p.cx + o.dx + 0.5) * {g!r}) * (p.lon - (p.cx + o.dx + 0.5) * {g!r})
       + (p.lat - (p.cy + o.dy + 0.5) * {g!r}) * (p.lat - (p.cy + o.dy + 0.5) * {g!r}) AS d2,
         CASE WHEN o.dx = 0 AND o.dy = 0 THEN 1 ELSE 0 END AS is_res
  FROM pts p
  CROSS JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)) o(dx, dy)
  WHERE (p.lon - (p.cx + o.dx + 0.5) * {g!r}) * (p.lon - (p.cx + o.dx + 0.5) * {g!r})
      + (p.lat - (p.cy + o.dy + 0.5) * {g!r}) * (p.lat - (p.cy + o.dy + 0.5) * {g!r}) <= {g * g!r}
), wq AS (
  SELECT gx, gy, v, is_res,
         CAST(floor(1048576.0 / (1.0 + floor(d2 / 1e-4))) AS BIGINT) AS w
  FROM fan
)
SELECT gx, gy, count(*) AS n,
       CAST(sum(w * v) // sum(w) AS BIGINT) AS idw
FROM wq
GROUP BY 1, 2
HAVING sum(is_res) > 0
"""


def q_kde_heatmap(sf_dir: str, g: float = 0.5):
    """Kernel-density heatmap of the image geotags on the occupied
    g-degree grid: for every cell with >= 1 resident point, the
    Epanechnikov-kernel density sum over all points within r = g of the
    cell CENTER (9-cell donation, the idw_grid exchange shape).

    The kernel is POLYNOMIAL (w = 1 - d2/r2), not Gaussian, precisely so
    the weight is computable with IEEE +-*/ only and the fixed-point
    floor (wfp = floor(2^20 * w)) gives an order-independent integer
    reduction DuckDB recomputes exactly — same rationale as idw_grid's
    fixed-point weights. Fully combiner-shaped: per-batch arrow partials
    -> one skinny groupby keyed by cell."""
    import numpy as np
    import pyarrow as pa

    from ..sources.images import read_images
    from ..stages.agg import partial_sum_groupby

    r2 = g * g
    ds = read_images(sf_dir, columns=["lon", "lat"])

    def donate(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        cx = np.floor(lon / g).astype(np.int64)
        cy = np.floor(lat / g).astype(np.int64)
        gx_l, gy_l, w_l, n_l, res_l = [], [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tx, ty = cx + dx, cy + dy
                ctr_x = (tx + 0.5) * g
                ctr_y = (ty + 0.5) * g
                d2 = (lon - ctr_x) ** 2 + (lat - ctr_y) ** 2
                ok = d2 <= r2
                wfp = np.floor(1048576.0 * (1.0 - d2[ok] / r2)).astype(np.int64)
                gx_l.append(tx[ok])
                gy_l.append(ty[ok])
                w_l.append(wfp)
                n_l.append(np.ones(int(ok.sum()), dtype=np.int64))
                res_l.append(
                    np.full(int(ok.sum()), 1 if (dx == 0 and dy == 0) else 0, np.int64)
                )
        return pa.table(
            {
                "gx": pa.array(np.concatenate(gx_l)),
                "gy": pa.array(np.concatenate(gy_l)),
                "density": pa.array(np.concatenate(w_l)),
                "n": pa.array(np.concatenate(n_l)),
                "n_res": pa.array(np.concatenate(res_l)),
            }
        )

    agg = partial_sum_groupby(
        ds.map_batches(donate, batch_format="pyarrow"),
        ["gx", "gy"],
        ["density", "n", "n_res"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.greater(batch["n_res"], 0))
        return t.select(["gx", "gy", "n", "density"])

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_kde_heatmap(images_source: str, g: float = 0.5) -> str:
    d2 = (
        "(p.lon - (p.cx + o.dx + 0.5) * {g}) * (p.lon - (p.cx + o.dx + 0.5) * {g})"
        " + (p.lat - (p.cy + o.dy + 0.5) * {g}) * (p.lat - (p.cy + o.dy + 0.5) * {g})"
    ).format(g=_dlit(g))
    return f"""
WITH pts AS (
  SELECT lon, lat,
         CAST(floor(lon / {_dlit(g)}) AS BIGINT) AS cx,
         CAST(floor(lat / {_dlit(g)}) AS BIGINT) AS cy
  FROM {images_source}
), fan AS (
  SELECT p.cx + o.dx AS gx, p.cy + o.dy AS gy,
         CAST(floor(1048576.0 * (1.0 - ({d2}) / {_dlit(g * g)})) AS BIGINT) AS wfp,
         CASE WHEN o.dx = 0 AND o.dy = 0 THEN 1 ELSE 0 END AS is_res
  FROM pts p
  CROSS JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)) o(dx, dy)
  WHERE {d2} <= {_dlit(g * g)}
)
SELECT gx, gy, count(*) AS n, CAST(sum(wfp) AS BIGINT) AS density
FROM fan
GROUP BY 1, 2
HAVING sum(is_res) > 0
"""


def q_map_match_edges(sf_dir: str):
    """Map-matching primitive: snap every geotag to its nearest region
    BOUNDARY SEGMENT (the GPS-trace-to-road-edge operation); per-edge
    match counts. The edge table (sources/regions.region_boundary_edges,
    262 rows) is dimension-sized: regenerated per actor from the seed —
    never shuffled; the per-batch kernel is one (batch x edges)
    point-segment distance matrix (clamped projection), argmin with the
    deterministic (d2, edge_id) tie-break. At corpus scale with large
    edge tables the same kernel runs behind a cell-cover candidate
    prefilter (the stages/pip_join.py grid pattern); the dense matrix is
    the correct form for dimension-sized edge sets."""
    import pyarrow as pa

    from ..sources.images import read_images
    from ..sources.regions import edge_geom_arrays, nearest_edge_index
    from ..stages.agg import partial_count_groupby

    eid, rid, ax, ay, dx, dy, l2 = edge_geom_arrays()

    def nearest_edge(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        best = nearest_edge_index(lon, lat, ax, ay, dx, dy, l2)
        return pa.table(
            {
                "region_id": pa.array(rid[best]),
                "edge_id": pa.array(eid[best]),
            }
        )

    ds = read_images(sf_dir, columns=["lon", "lat"])
    ds = ds.map_batches(nearest_edge, batch_format="pyarrow", batch_size=4096)
    return partial_count_groupby(ds, ["region_id", "edge_id"], alias="n")


def edge_values_sql(with_region: bool = True) -> str:
    """The edge table as DOUBLE-literal VALUES rows (shared by the
    map-match and trajectory-match oracles; derives from
    edge_geom_arrays so both mirror the same floats)."""
    from ..sources.regions import edge_geom_arrays

    eid, rid, ax, ay, dx, dy, l2 = edge_geom_arrays()
    return ", ".join(
        (
            f"({int(i)}, {int(r)}, {_dlit(a)}, {_dlit(b)},"
            f" {_dlit(c)}, {_dlit(d)}, {_dlit(l)})"
            if with_region
            else f"({int(i)}, {_dlit(a)}, {_dlit(b)},"
                 f" {_dlit(c)}, {_dlit(d)}, {_dlit(l)})"
        )
        for i, r, a, b, c, d, l in zip(eid, rid, ax, ay, dx, dy, l2)
    )


def sql_map_match_edges(images_source: str) -> str:
    vals = edge_values_sql(with_region=True)
    # float ops mirror the numpy kernel 1:1 (clip == LEAST/GREATEST)
    return f"""
WITH e(edge_id, region_id, ax, ay, dx, dy, l2) AS (VALUES {vals}),
proj AS (
  SELECT p.image_id, e.edge_id, e.region_id,
         LEAST(1.0, GREATEST(0.0,
           ((p.lon - e.ax) * e.dx + (p.lat - e.ay) * e.dy) / e.l2)) AS t,
         p.lon, p.lat, e.ax, e.ay, e.dx, e.dy
  FROM {images_source} p CROSS JOIN e
), dist AS (
  SELECT image_id, edge_id, region_id,
         (lon - (ax + t * dx)) * (lon - (ax + t * dx))
       + (lat - (ay + t * dy)) * (lat - (ay + t * dy)) AS d2
  FROM proj
), best AS (
  SELECT image_id, edge_id, region_id,
         row_number() OVER (PARTITION BY image_id ORDER BY d2, edge_id) AS rk
  FROM dist
)
SELECT CAST(region_id AS BIGINT) AS region_id,
       CAST(edge_id AS BIGINT) AS edge_id, count(*) AS n
FROM best WHERE rk = 1
GROUP BY 1, 2
"""


def q_region_sphere_area(sf_dir: str):
    """Geodesic (spherical-excess) polygon area per region via the
    spherical shoelace sum_k (lam2 - lam1) * (2 + sin(phi1) + sin(phi2))
    over boundary edges. Each edge term is FIXED-POINT floored
    (floor(term * 1e9), int64) so the per-region reduction is
    order-independent and DuckDB recomputes it exactly (the float
    ops + libm sin mirror 1:1, the proven geodesic_hist pattern); the
    final km^2 value derives from the exact integer. Map-only over the
    region table (per-feature geometry measure; at corpus scale this is
    one vectorized map_batches over the polygon corpus)."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from ..sources.regions import regions_parquet_path

    rad = math.pi / 180.0
    scale = 0.5 * 6371000.0 * 6371000.0 / 1e9 / 1e6  # fp -> km^2

    def area_terms(batch: pa.Table) -> pa.Table:
        from ..core.geom import wkb_decode

        rids, areas_fp, areas_km2, nv = [], [], [], []
        for rid, buf in zip(
            batch["region_id"].to_pylist(), batch["geom_wkb"].to_pylist()
        ):
            kind, coords = wkb_decode(buf)
            rings = coords if kind == "Polygon" else [r for p in coords for r in p]
            total = 0
            nverts = 0
            for ring in rings:
                v = np.asarray(ring, dtype=np.float64)
                nverts += len(v)
                lam = v[:, 0] * rad
                phi = v[:, 1] * rad
                lam2 = np.roll(lam, -1)
                phi2 = np.roll(phi, -1)
                term = (lam2 - lam) * (2.0 + np.sin(phi) + np.sin(phi2))
                total += int(np.floor(term * 1e9).astype(np.int64).sum())
            rids.append(rid)
            areas_fp.append(abs(total))
            areas_km2.append(abs(total) * scale)
            nv.append(nverts)
        return pa.table(
            {
                "region_id": pa.array(rids, pa.int64()),
                "n_vertices": pa.array(nv, pa.int64()),
                "area_fp": pa.array(areas_fp, pa.int64()),
                "area_km2": pa.array(areas_km2, pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        regions_parquet_path(), columns=["region_id", "geom_wkb"]
    )
    return ds.map_batches(area_terms, batch_format="pyarrow")


def sql_region_sphere_area() -> str:
    import math

    from ..sources.regions import region_boundary_edges

    rad = math.pi / 180.0
    scale = 0.5 * 6371000.0 * 6371000.0 / 1e9 / 1e6
    e = region_boundary_edges()
    vals = ", ".join(
        f"({int(r)}, {_dlit(a)}, {_dlit(b)}, {_dlit(c)}, {_dlit(d)})"
        for r, a, b, c, d in zip(
            e["region_id"].to_pylist(),
            e["ax"].to_numpy(), e["ay"].to_numpy(),
            e["bx"].to_numpy(), e["by"].to_numpy(),
        )
    )
    return f"""
WITH e(region_id, ax, ay, bx, by) AS (VALUES {vals}),
terms AS (
  SELECT region_id,
         CAST(floor((bx * {_dlit(rad)} - ax * {_dlit(rad)})
              * (2.0 + sin(ay * {_dlit(rad)}) + sin(by * {_dlit(rad)})) * 1e9) AS BIGINT)
           AS term_fp
  FROM e
)
SELECT CAST(region_id AS BIGINT) AS region_id,
       count(*) AS n_vertices,
       CAST(abs(sum(term_fp)) AS BIGINT) AS area_fp,
       CAST(CAST(abs(sum(term_fp)) AS BIGINT) AS DOUBLE) * {_dlit(scale)} AS area_km2
FROM terms
GROUP BY region_id
"""


def q_pca_scatter(sf_dir: str, dim: int = 64):
    """Distributed PCA, stage 1: the exact integer SCATTER matrix of the
    quantized embeddings (q = floor(x * 1024) per element — one float64
    multiply + floor, so DuckDB recomputes every entry exactly). Each
    batch contributes Q^T Q (int64, dim x dim upper triangle), the
    column sums, and the row count as skinny (a, b, s) partial rows; ONE
    combiner groupby merges them. Vectors never cross an exchange — at
    10^12 rows the only traffic is 2080 partial rows per block (at that
    scale the int64 grand totals approach 2^63: promote the merge to
    HUGEINT/float128 or re-quantize per shard — the partial shape is
    unchanged). The
    eigen-decomposition / projection runs on the driver over this exact
    dim x dim table (pca_project below; pinned by pytest invariants —
    orthonormality, variance ordering, scikit-free)."""
    import numpy as np
    import pyarrow as pa

    from ..stages.agg import partial_sum_groupby

    iu_a, iu_b = np.triu_indices(dim)

    def moments(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"].combine_chunks()
        flat = np.asarray(emb.flatten(), dtype=np.float64)
        m = flat.reshape(len(batch), dim)
        q = np.floor(m * 1024.0).astype(np.int64)
        scatter = q.T @ q  # exact: |q| < 2^17, dim*rows products < 2^63
        sums = q.sum(axis=0)
        a = np.concatenate([iu_a, np.arange(dim), [-1]])
        b = np.concatenate([iu_b, np.full(dim, -1), [-1]])
        s = np.concatenate([scatter[iu_a, iu_b], sums, [len(batch)]])
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "s": pa.array(s, pa.int64()),
            }
        )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ds = ds.map_batches(moments, batch_format="pyarrow", batch_size=4096)
    return partial_sum_groupby(ds, ["a", "b"], ["s"], coalesce=4)


def sql_pca_scatter(dim: int = 64) -> str:
    return f"""
WITH q AS (
  SELECT e.vec_id, t.i - 1 AS idx,
         CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * 1024.0) AS BIGINT) AS v
  FROM embeddings e, generate_series(1, {dim}) t(i)
),
upper AS (
  SELECT qa.idx AS a, qb.idx AS b, sum(qa.v * qb.v) AS s
  FROM q qa JOIN q qb ON qa.vec_id = qb.vec_id AND qa.idx <= qb.idx
  GROUP BY 1, 2
),
sums AS (
  SELECT idx AS a, -1 AS b, sum(v) AS s FROM q GROUP BY 1
),
cnt AS (
  SELECT -1 AS a, -1 AS b, count(DISTINCT vec_id) AS s FROM q
)
SELECT a, b, CAST(s AS BIGINT) AS s FROM upper
UNION ALL SELECT a, b, CAST(s AS BIGINT) FROM sums
UNION ALL SELECT a, b, CAST(s AS BIGINT) FROM cnt
"""


def pca_project(scatter_df, dim: int = 64, k: int = 4):
    """Driver-side stage 2: eigendecomposition of the exact-integer
    covariance (n * Sxx - sx sx^T, symmetric PSD up to quantization) and
    the top-k projection basis. Deterministic given the exact integers;
    sign convention: largest-|component| entry positive."""
    import numpy as np

    piv = {(int(r.a), int(r.b)): int(r.s) for r in scatter_df.itertuples()}
    n = piv[(-1, -1)]
    sx = np.array([piv[(i, -1)] for i in range(dim)], dtype=np.float64)
    S = np.zeros((dim, dim), dtype=np.float64)
    for i in range(dim):
        for j in range(i, dim):
            S[i, j] = S[j, i] = piv[(i, j)]
    cov = (S * n - np.outer(sx, sx)) / (float(n) * float(max(n - 1, 1)))
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    basis = v[:, order]
    flip = np.abs(basis).argmax(axis=0)
    basis = basis * np.sign(basis[flip, np.arange(basis.shape[1])])[None, :]
    return w[order], basis


def corpus_checks(batch: "pa.Table") -> "pa.Table":
    """The per-batch expectations kernel (module-level so the
    corruption-sensitivity pytest exercises the REAL check logic)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = batch.num_rows

    def _ok(arr) -> np.ndarray:
        # null-safe: a NULL in any checked column is a VIOLATION (the
        # oracle's CASE WHEN counts NULL as false), never a crash
        return pc.fill_null(arr, False).to_numpy(zero_copy_only=False)

    cap_ok = _ok(pc.match_substring_regex(batch["caption"], r"^[a-z ]+ #[0-9]{8}$"))
    geo_ok = _ok(
        pc.and_(
            pc.and_(
                pc.greater_equal(batch["lon"], -180.0),
                pc.less_equal(batch["lon"], 180.0),
            ),
            pc.and_(
                pc.greater_equal(batch["lat"], -90.0),
                pc.less_equal(batch["lat"], 90.0),
            ),
        )
    )
    dim_ok = _ok(
        pc.and_(pc.greater(batch["w"], 0), pc.greater(batch["h"], 0))
    )
    payload_ok = _ok(pc.greater(pc.binary_length(batch["bytes"]), 0))
    fmt_ok = _ok(pc.is_in(batch["fmt"], value_set=pa.array(["png", "jpeg"])))
    names = ["caption_format", "geotag_range", "dims_positive",
             "payload_present", "fmt_allowed"]
    viol = [
        int(n - cap_ok.sum()), int(n - geo_ok.sum()), int(n - dim_ok.sum()),
        int(n - payload_ok.sum()), int(n - fmt_ok.sum()),
    ]
    return pa.table(
        {
            "check": pa.array(names, pa.string()),
            "n_violations": pa.array(viol, pa.int64()),
            "n_rows": pa.array([n] * len(names), pa.int64()),
        }
    )


def q_importance_sample(sf_dir: str, full_tokens: int = 200):
    """Quality-WEIGHTED sampling (importance sampling, the
    token-proportional keep rule a curation pipeline uses to upweight
    substantive documents): doc keep probability = min(1, tokens /
    ``full_tokens``), decided by the deterministic Knuth-hash test
    (folded to 31 bits, overflow-free in both engines). Output: per
    token-band (tokens // 10) total vs kept counts — the acceptance
    curve. Stateless gate + one combiner groupby. Exact SQL oracle
    (same tokenizer mirror as the token stats family)."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def gate(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        toks = np.array(
            [len(t.split()) if t and t.strip() else 0 for t in texts],
            dtype=np.int64,
        )
        from .relational import _fold_hash

        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = _fold_hash(did, 10000)
        thresh = np.minimum(toks * 10000 // full_tokens, 10000)
        kept = h < thresh
        return pa.table(
            {
                "band": pa.array(toks // 10),
                "n_total": pa.array(np.ones(len(toks), dtype=np.int64)),
                "n_kept": pa.array(kept.astype(np.int64)),
            }
        )

    parts = ds.map_batches(gate, batch_format="pyarrow", batch_size=4096)
    return partial_sum_groupby(parts, ["band"], ["n_total", "n_kept"], coalesce=4)


def sql_importance_sample(full_tokens: int = 200) -> str:
    ntok = (
        "CASE WHEN trim(text) = '' THEN 0 "
        "ELSE len(string_split_regex(trim(text), '\\s+')) END"
    )
    return f"""
WITH t AS (
  SELECT CAST({ntok} AS BIGINT) AS toks,
         ((doc_id & 2147483647) * 2654435761) % 10000 AS h
  FROM documents
)
SELECT toks // 10 AS band,
       count(*) AS n_total,
       CAST(sum(CASE WHEN h < least(toks * 10000 // {full_tokens}, 10000)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM t
GROUP BY 1
"""


def q_validate_corpus(sf_dir: str):
    """Data-quality EXPECTATIONS gate (the pre-training validation pass):
    per named check, the violation count over the image corpus —
    caption format (``word #digits``), geotag range, positive
    dimensions, payload present, format in the allowed set. Stateless
    vectorized map_batches partials -> one tiny combiner groupby; at
    100 TB this is one streaming pass whose output is check-dimension
    sized. Exact SQL oracle (same regex / range predicates)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..sources.images import read_images
    from ..stages.agg import partial_sum_groupby

    ds = read_images(
        sf_dir, columns=["image_id", "caption", "lon", "lat", "w", "h", "fmt", "bytes"]
    )
    parts = ds.map_batches(corpus_checks, batch_format="pyarrow", batch_size=16384)
    return partial_sum_groupby(parts, ["check"], ["n_violations", "n_rows"], coalesce=4)


def sql_validate_corpus(images_source: str) -> str:
    return f"""
WITH src AS (SELECT * FROM {images_source})
SELECT 'caption_format' AS check,
       CAST(sum(CASE WHEN regexp_matches(caption, '^[a-z ]+ #[0-9]{{8}}$')
                THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
       count(*) AS n_rows FROM src
UNION ALL
SELECT 'geotag_range',
       CAST(sum(CASE WHEN lon >= -180.0 AND lon <= 180.0
                      AND lat >= -90.0 AND lat <= 90.0
                THEN 0 ELSE 1 END) AS BIGINT), count(*) FROM src
UNION ALL
SELECT 'dims_positive',
       CAST(sum(CASE WHEN w > 0 AND h > 0 THEN 0 ELSE 1 END) AS BIGINT),
       count(*) FROM src
UNION ALL
SELECT 'payload_present',
       CAST(sum(CASE WHEN octet_length(bytes) > 0 THEN 0 ELSE 1 END) AS BIGINT),
       count(*) FROM src
UNION ALL
SELECT 'fmt_allowed',
       CAST(sum(CASE WHEN fmt IN ('png', 'jpeg') THEN 0 ELSE 1 END) AS BIGINT),
       count(*) FROM src
"""


def q_region_buffer(sf_dir: str, r: float = 0.1):
    """Polygon BUFFER (offset by ``r`` degrees, mitered joins): every
    region ring is convex and CCW, so the buffered ring is the
    intersection of consecutive outward-offset edge lines — pure
    +-*/sqrt vertex algebra that DuckDB mirrors 1:1. Per region the
    buffered ring's shoelace area and perimeter are emitted as
    fixed-point integer sums (floor(term * 1e6); order-independent).
    Map-only over the polygon corpus; pytest pins the analytic mitered
    area A + P*r + r^2 * sum(tan(theta_ext/2)) for the rectangles."""
    import pyarrow as pa
    import ray.data

    from ..sources.regions import regions_parquet_path

    def buffer_terms(batch: pa.Table) -> pa.Table:
        from ..core.geom import wkb_decode

        rids, nv, area_l, perim_l = [], [], [], []
        for rid, buf in zip(
            batch["region_id"].to_pylist(), batch["geom_wkb"].to_pylist()
        ):
            kind, coords = wkb_decode(buf)
            ring = (coords if kind == "Polygon" else coords[0])[0]
            v = np.asarray(ring, dtype=np.float64)
            pv = np.roll(v, 1, axis=0)   # v_{k-1}
            nx = np.roll(v, -1, axis=0)  # v_{k+1}
            d1 = v - pv
            d2 = nx - v
            l1 = np.sqrt(d1[:, 0] * d1[:, 0] + d1[:, 1] * d1[:, 1])
            l2 = np.sqrt(d2[:, 0] * d2[:, 0] + d2[:, 1] * d2[:, 1])
            n1 = np.stack((d1[:, 1] / l1, -d1[:, 0] / l1), axis=1)
            n2 = np.stack((d2[:, 1] / l2, -d2[:, 0] / l2), axis=1)
            q1 = pv + r * n1
            q2 = v + r * n2
            denom = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
            t = ((q2[:, 0] - q1[:, 0]) * d2[:, 1]
                 - (q2[:, 1] - q1[:, 1]) * d2[:, 0]) / denom
            wx = q1[:, 0] + t * d1[:, 0]
            wy = q1[:, 1] + t * d1[:, 1]
            wx2 = np.roll(wx, -1)
            wy2 = np.roll(wy, -1)
            area_fp = int(
                np.floor((wx * wy2 - wx2 * wy) * 1e6).astype(np.int64).sum()
            )
            perim_fp = int(
                np.floor(
                    np.sqrt((wx2 - wx) ** 2 + (wy2 - wy) ** 2) * 1e6
                ).astype(np.int64).sum()
            )
            rids.append(rid)
            nv.append(len(v))
            area_l.append(area_fp)
            perim_l.append(perim_fp)
        return pa.table(
            {
                "region_id": pa.array(rids, pa.int64()),
                "n_vertices": pa.array(nv, pa.int64()),
                "area_fp": pa.array(area_l, pa.int64()),
                "perim_fp": pa.array(perim_l, pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        regions_parquet_path(), columns=["region_id", "geom_wkb"]
    )
    return ds.map_batches(buffer_terms, batch_format="pyarrow")


def sql_region_buffer(r: float = 0.1) -> str:
    from ..core.geom import wkb_decode
    from ..sources.regions import generate_regions_table

    t = generate_regions_table()
    rows = []
    for rid, buf in zip(t["region_id"].to_pylist(), t["geom_wkb"].to_pylist()):
        kind, coords = wkb_decode(buf)
        ring = (coords if kind == "Polygon" else coords[0])[0]
        m = len(ring)
        for k in range(m):
            px, py = ring[(k - 1) % m]
            cx, cy = ring[k]
            nx_, ny_ = ring[(k + 1) % m]
            rows.append(
                f"({int(rid)}, {k}, {_dlit(px)}, {_dlit(py)},"
                f" {_dlit(cx)}, {_dlit(cy)}, {_dlit(nx_)}, {_dlit(ny_)})"
            )
    vals = ", ".join(rows)
    rl = _dlit(r)
    return f"""
WITH v(region_id, k, px, py, cx, cy, nx, ny) AS (VALUES {vals}),
w AS (
  -- lateral column aliases mirror the numpy kernel step-for-step
  SELECT region_id, k,
         (cx - px) AS d1x, (cy - py) AS d1y,
         (nx - cx) AS d2x, (ny - cy) AS d2y,
         sqrt(d1x * d1x + d1y * d1y) AS l1,
         sqrt(d2x * d2x + d2y * d2y) AS l2,
         px + {rl} * (d1y / l1) AS q1x,
         py + {rl} * (-d1x / l1) AS q1y,
         cx + {rl} * (d2y / l2) AS q2x,
         cy + {rl} * (-d2x / l2) AS q2y,
         ((q2x - q1x) * d2y - (q2y - q1y) * d2x) / (d1x * d2y - d1y * d2x) AS t,
         q1x + t * d1x AS wx,
         q1y + t * d1y AS wy
  FROM v
),
paired AS (
  SELECT region_id, k, wx, wy,
         COALESCE(lead(wx) OVER ord, first_value(wx) OVER ord) AS wx2,
         COALESCE(lead(wy) OVER ord, first_value(wy) OVER ord) AS wy2
  FROM w
  WINDOW ord AS (PARTITION BY region_id ORDER BY k
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT CAST(region_id AS BIGINT) AS region_id,
       count(*) AS n_vertices,
       CAST(sum(CAST(floor((wx * wy2 - wx2 * wy) * 1e6) AS BIGINT)) AS BIGINT)
         AS area_fp,
       CAST(sum(CAST(floor(sqrt((wx2 - wx) * (wx2 - wx) + (wy2 - wy) * (wy2 - wy)) * 1e6) AS BIGINT)) AS BIGINT)
         AS perim_fp
FROM paired
GROUP BY region_id
"""


def q_geohash_cells(sf_dir: str, precision: int = 5):
    """Per-geohash-cell image counts (stages/tiles.geohash_np — standard
    base32 interleave, pinned against the published test vectors
    u4pruydqqvj / ezs42 in pytest). Exact recomputing SQL oracle: the
    bit-interleave expression is generated in Python and inlined."""
    from ..sources.images import read_images
    from ..stages.agg import partial_count_groupby
    from ..stages.tiles import geohash_encode

    ds = read_images(sf_dir, columns=["lon", "lat"])
    ds = ds.map_batches(
        lambda b: geohash_encode(b, precision=precision, keep_columns=[]),
        batch_format="pyarrow",
        batch_size=16384,
    )
    return partial_count_groupby(ds, ["geohash"], alias="n")


def sql_geohash_cells(images_source: str, precision: int = 5) -> str:
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    terms = []
    for i in range(lon_bits):
        terms.append(f"(((li >> {lon_bits - 1 - i}) & 1) << {nbits - 1 - 2 * i})")
    for i in range(lat_bits):
        terms.append(f"(((la >> {lat_bits - 1 - i}) & 1) << {nbits - 2 - 2 * i})")
    code = " | ".join(terms)
    chars = " || ".join(
        f"substr('0123456789bcdefghjkmnpqrstuvwxyz', "
        f"CAST(((code >> {nbits - 5 * (k + 1)}) & 31) AS INTEGER) + 1, 1)"
        for k in range(precision)
    )
    return f"""
WITH c AS (
  SELECT CAST(least(floor((lon + 180.0) / 360.0 * {float(1 << lon_bits)!r}),
                    {float((1 << lon_bits) - 1)!r}) AS BIGINT) AS li,
         CAST(least(floor((lat + 90.0) / 180.0 * {float(1 << lat_bits)!r}),
                    {float((1 << lat_bits) - 1)!r}) AS BIGINT) AS la
  FROM {images_source}
), g AS (
  SELECT ({code}) AS code FROM c
)
SELECT ({chars}) AS geohash, count(*) AS n
FROM g
GROUP BY 1
"""


def q_zonal_stats(sf_dir: str):
    """Zonal statistics: per-region aggregates of DECODED pixel data for
    the images geotagged inside each region (stages/multimodal.py
    ZonalImageStats — PIP join + decode + partials fused in one actor
    pool; only skinny per-region integer partials cross the exchange).
    Golden oracle (SQL cannot decode pixels); the PIP membership itself
    is oracle-exact via pip_join_rect/poly."""
    import pyarrow as pa

    from ..sources.images import read_images
    from ..stages.multimodal import ZonalImageStats

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt", "lon", "lat"])
    parts = ds.map_batches(
        ZonalImageStats,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(2, 16),
    )

    def merge(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["region_id"]).aggregate(
            [
                ("n_images", "sum"),
                ("n_px", "sum"),
                ("sum_lum", "sum"),
                ("px_min", "min"),
                ("px_max", "max"),
            ]
        )
        return g.rename_columns(
            ["region_id", "n_images", "n_px", "sum_lum", "px_min", "px_max"]
        )

    return parts.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


def q_hex_polyfill(sf_dir: str, res: int = 7):
    """H3-style polygonToCells over the hexagon regions: the aperture-7
    cells (core/hexgrid.polyfill, center-in-polygon rule) covering each
    region, counted. Per-feature map_batches — at scale a corpus of
    millions of polygons fans out across the pool, each feature's fill
    independent. Exact SQL oracle: per region a generate_series lattice
    over the SAME candidate bounds with the cell-center formula and the
    convex half-plane test inlined (projected vertices as literals)."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ..core import hexgrid
    from ..core.geom import wkb_decode
    from ..core.tms import lonlat_to_webmercator_np
    from ..sources.regions import regions_parquet_path

    ds = ray.data.read_parquet(
        regions_parquet_path(), columns=["region_id", "kind", "geom_wkb"]
    )

    def fill(batch: pa.Table) -> pa.Table:
        rids, counts = [], []
        for rid, kind, buf in zip(
            batch["region_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["geom_wkb"].to_pylist(),
        ):
            if kind != "poly":
                continue
            _, rings = wkb_decode(buf)
            merc = []
            for ring in rings:
                xs, ys = lonlat_to_webmercator_np(
                    np.array([p[0] for p in ring]),
                    np.array([p[1] for p in ring]),
                )
                merc.append(list(zip(xs.tolist(), ys.tolist())))
            q, r = hexgrid.polyfill(merc, res)
            rids.append(rid)
            counts.append(len(q))
        return pa.table(
            {
                "region_id": pa.array(rids, pa.int64()),
                "n_cells": pa.array(counts, pa.int64()),
            }
        )

    return ds.map_batches(fill, batch_format="pyarrow", batch_size=64)


def sql_hex_polyfill(res: int = 7) -> str:
    import numpy as np

    from ..core import hexgrid
    from ..core.geom import wkb_decode
    from ..core.tms import lonlat_to_webmercator_np
    from ..sources.regions import generate_regions_table

    mp = hexgrid.m_pow(res)
    det = float(mp[0, 0] * mp[1, 1] - mp[0, 1] * mp[1, 0])
    s3 = hexgrid.SQRT3
    selects = []
    regions = generate_regions_table()
    for rid, kind, buf in zip(
        regions["region_id"].to_pylist(),
        regions["kind"].to_pylist(),
        regions["geom_wkb"].to_pylist(),
    ):
        if kind != "poly":
            continue
        _, rings = wkb_decode(buf)
        ring = rings[0]
        xs, ys = lonlat_to_webmercator_np(
            np.array([p[0] for p in ring]), np.array([p[1] for p in ring])
        )
        merc = list(zip(xs.tolist(), ys.tolist()))
        # same candidate bounds as hexgrid.polyfill
        q0, r0 = hexgrid.axial_frac0(xs, ys)
        fq = mp[0, 0] * q0 + mp[0, 1] * r0
        fr = mp[1, 0] * q0 + mp[1, 1] * r0
        qmin, qmax = int(np.floor(fq.min())) - 1, int(np.ceil(fq.max())) + 1
        rmin, rmax = int(np.floor(fr.min())) - 1, int(np.ceil(fr.max())) + 1
        conds = []
        for (x1, y1), (x2, y2) in zip(merc, merc[1:] + merc[:1]):
            conds.append(
                f"(({x2!r} - {x1!r}) * (cy - {y1!r}) - "
                f"({y2!r} - {y1!r}) * (cx - {x1!r})) >= 0"
            )
        selects.append(f"""
SELECT CAST({rid} AS BIGINT) AS region_id, count(*) AS n_cells FROM (
  SELECT ((({mp[1,1]} * q.g - {mp[0,1]} * r.g) / {det!r}) * {s3!r}
        + ((-{mp[1,0]} * q.g + {mp[0,0]} * r.g) / {det!r}) * {s3 / 2.0!r}) * {hexgrid.S0!r} AS cx,
         ((-{mp[1,0]} * q.g + {mp[0,0]} * r.g) / {det!r}) * 1.5 * {hexgrid.S0!r} AS cy
  FROM generate_series({qmin}, {qmax}) q(g)
  CROSS JOIN generate_series({rmin}, {rmax}) r(g)
) WHERE {' AND '.join(conds)}""")
    return "\nUNION ALL\n".join(selects)


def q_tfidf(sf_dir: str, top: int = 50):
    """Corpus TF-IDF vocabulary scoring: top tokens by total_tf * (N/df)
    (rational idf — exactly SQL-reproducible, unlike ln(N/df) whose libm
    rounding may differ across engines; pass a log to the score map for
    the classic form). Per-batch (tf, df) partials -> one skinny
    token groupby -> score -> top-k. At cluster scale the final sort is
    a per-block top-k merge; at test scale Dataset.sort on the
    vocab-sized aggregate is fine."""
    from ..stages.agg import partial_sum_groupby
    from ..stages.text import tfidf_partial

    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()  # metadata count
    ds = _read(sf_dir, "documents", ["text"])
    parts = ds.map_batches(tfidf_partial, batch_format="pandas")
    agg = partial_sum_groupby(parts, ["token"], ["tf_partial", "df_partial"])

    def score(b: pa.Table) -> pa.Table:
        tf = b["tf_partial"].to_numpy(zero_copy_only=False)
        df = b["df_partial"].to_numpy(zero_copy_only=False)
        s = tf * (np.float64(n_docs) / df)  # same op order as the oracle
        return pa.table(
            {
                "token": b["token"],
                "df": pa.array(df),
                "total_tf": pa.array(tf),
                "score": pa.array(s),
            }
        )

    out = agg.map_batches(score, batch_format="pyarrow")
    return out.sort(["score", "token"], descending=[True, False]).limit(top)


SQL_TFIDF = r"""
WITH t AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
  FROM documents WHERE trim(text) <> ''
), c AS (
  SELECT token, COUNT(*) AS total_tf, COUNT(DISTINCT doc_id) AS df
  FROM t GROUP BY 1
)
SELECT token, df, total_tf,
       total_tf * ((SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) / df) AS score
FROM c
ORDER BY score DESC, token ASC
LIMIT 50
"""


def q_kmeans(sf_dir: str, k: int = 8, iters: int = 4):
    """Distributed spherical k-means over the embeddings table: `iters`
    streaming Lloyd passes of data-keyed partial sums against broadcast
    centroids (stages/cluster.py — no shuffle; the vectors never move).
    Returns per-cluster (cluster, n, sim_sum). Golden oracle — an
    iterative float algorithm is not SQL-expressible; the fit is pinned
    against a single-process numpy Lloyd reference in pytest, and the
    fixed (cluster, chunk) driver reduce order makes the floats
    deterministic under any task scheduling."""
    import pyarrow.parquet as pq

    from ..stages.cluster import kmeans_fit
    from ..stages.similarity import _stack_embeddings

    head = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # deterministic hash-spread init sample (same rationale as IVF training)
    vid = head["vec_id"].to_numpy().astype(np.uint64)
    share = np.uint64(max(1, min(1024, (256 * 1024) // max(1, len(vid)))))
    pick = (vid * np.uint64(0x9E3779B1)) % np.uint64(1024) < share
    sample = _stack_embeddings(head.filter(pa.array(pick))["embedding"])
    _, stats = kmeans_fit(
        lambda: _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        dim=sample.shape[1],
        k=k,
        iters=iters,
        init_sample=sample,
    )
    return stats


def q_semantic_dedup(sf_dir: str, k: int = 8, iters: int = 3, threshold: float = 0.4):
    """SemDeDup-shaped semantic near-dup: k-means cluster the embedding
    space, then pairwise cosine >= threshold WITHIN each cluster
    (groupby(cluster).map_groups) — the cluster blocking is what makes
    the quadratic scan affordable at corpus scale; near-identical pairs
    land in one cluster with overwhelming probability (missing a pair
    requires the pair to straddle a centroid boundary). Golden oracle
    (cluster ids are iterative floats); planted-dup recall in pytest."""
    import pyarrow.parquet as pq

    from ..stages.cluster import ClusterAssign, kmeans_fit
    from ..stages.dedup import EmbeddingNearDup
    from ..stages.similarity import _stack_embeddings

    head = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = head["vec_id"].to_numpy().astype(np.uint64)
    share = np.uint64(max(1, min(1024, (256 * 1024) // max(1, len(vid)))))
    pick = (vid * np.uint64(0x9E3779B1)) % np.uint64(1024) < share
    sample = _stack_embeddings(head.filter(pa.array(pick))["embedding"])
    centroids, _ = kmeans_fit(
        lambda: _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        dim=sample.shape[1],
        k=k,
        iters=iters,
        init_sample=sample,
    )
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ds = ds.map_batches(
        ClusterAssign,
        fn_constructor_kwargs={"centroids": centroids},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    ds = ds.repartition(8)  # map_groups parallelism == input block count
    near_dup = EmbeddingNearDup(threshold=threshold, id_col="vec_id", exact=True)
    return ds.groupby("cluster").map_groups(
        lambda g: near_dup(g), batch_format="pandas"
    )


def q_vocab_encode(sf_dir: str, vocab_size: int = 24):
    """Tokenizer-style vocab build + corpus encode: build the top-N
    vocabulary (one skinny token groupby — the token_counts path), rank
    tokens by (count desc, token asc) into ids, BROADCAST the vocab dict,
    then encode every document in one streaming pass: per doc the token
    count, OOV count, and an order-independent checksum of matched ids
    that pins the exact id assignment. The vocab (dimension-sized) is
    the broadcast small side; the encode pass streams. Exact SQL
    oracle."""
    vocab_df = q_token_counts(sf_dir, top=vocab_size).to_pandas()
    # rank -> id in (n desc, token asc) order, ids 0..N-1
    vocab_df = vocab_df.sort_values(
        ["n", "token"], ascending=[False, True]
    ).reset_index(drop=True)
    vocab = {t: i for i, t in enumerate(vocab_df["token"])}

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def encode(batch: pa.Table) -> pa.Table:
        import pandas as pd

        texts = pd.Series(batch["text"].to_pylist()).fillna("")
        toks = texts.str.split()
        n_tok = toks.str.len().to_numpy(dtype=np.int64)
        ex = toks.explode().dropna()
        ids = ex.map(vocab)
        known = ids.notna()
        n_known = known.groupby(level=0).sum()
        # order-independent checksum of matched ids (+1 so id 0 counts):
        # pins the exact vocab id assignment, robust to token order
        check = (ids.fillna(-1).astype(np.int64) + 1).groupby(level=0).sum()
        n = len(texts)
        n_known_full = np.zeros(n, dtype=np.int64)
        if len(n_known):
            n_known_full[n_known.index.to_numpy()] = n_known.to_numpy()
        check_full = np.zeros(n, dtype=np.int64)
        if len(check):
            check_full[check.index.to_numpy()] = check.to_numpy()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok),
                "n_oov": pa.array(n_tok - n_known_full),
                "id_checksum": pa.array(check_full),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", batch_size=4096)


SQL_VOCAB_ENCODE = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
  FROM documents WHERE trim(text) <> ''
), vocab AS (
  SELECT token, row_number() OVER (ORDER BY n DESC, token ASC) - 1 AS tok_id
  FROM (SELECT token, count(*) AS n FROM tok GROUP BY 1
        ORDER BY n DESC, token ASC LIMIT 24)
)
SELECT d.doc_id,
       COALESCE(t.n_tokens, 0) AS n_tokens,
       COALESCE(t.n_oov, 0) AS n_oov,
       COALESCE(t.id_checksum, 0) AS id_checksum
FROM documents d LEFT JOIN (
  SELECT p.doc_id,
         COUNT(*) AS n_tokens,
         COUNT(*) - COUNT(v.tok_id) AS n_oov,
         COALESCE(CAST(SUM(v.tok_id + 1) AS BIGINT), 0) AS id_checksum
  FROM tok p LEFT JOIN vocab v USING (token)
  GROUP BY 1
) t USING (doc_id)
"""


def q_pq_topk(sf_dir: str, n_queries: int = 10, k: int = 10):
    """Product-quantized ANN: train (M=16, K=64) PQ codebooks on the
    hash-spread sample, encode the corpus once (the full embedding then
    drops out of the scan — 64 doubles -> 16 codes), and answer top-k by
    asymmetric distance: per-query LUTs against the codebooks, M table
    lookups per row. Golden oracle (approximate by design); recall vs
    the exact brute force pinned by pytest."""
    import pyarrow.parquet as pq

    from ..stages.similarity import (
        PQEncoder,
        PQTopK,
        _stack_embeddings,
        finalize_topk,
    )

    head = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = head["vec_id"].to_numpy().astype(np.uint64)
    share = np.uint64(max(1, min(1024, (256 * 1024) // max(1, len(vid)))))
    pick = (vid * np.uint64(0x9E3779B1)) % np.uint64(1024) < share
    sample = _stack_embeddings(head.filter(pa.array(pick))["embedding"])
    codebooks = PQEncoder.train(sample, m=16, k=64)
    q = _stack_embeddings(head["embedding"].slice(0, n_queries))
    qids = head["vec_id"].to_numpy()[:n_queries]

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ds = ds.map_batches(
        PQEncoder,
        fn_constructor_kwargs={"codebooks": codebooks},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 2),
    ).select_columns(["vec_id", "pq_code"])  # payload embedding dropped
    ds = ds.map_batches(
        PQTopK,
        fn_constructor_kwargs={
            "codebooks": codebooks,
            "queries": q,
            "query_ids": qids,
            "k": k,
        },
        batch_format="pyarrow",
        batch_size=4096,
        # autoscaling (1,2) pools: two FIXED pools of 2 on a 4-cpu test
        # session deadlock the pipeline (actors reserve every CPU, the
        # repartition/sort tasks starve)
        concurrency=(1, 2),
    )
    return finalize_topk(ds, k=k).select_columns(["query_id", "vec_id", "rank"])


def q_image_augment(sf_dir: str):
    """Deterministic image augmentation (hflip/vflip/rot90/center-crop
    chosen by id hash — reproducible for lineage/resume): decode ->
    numpy pixel transform -> re-encode, then per-(fmt, aug) counts,
    output bytes and an integer pixel checksum. Golden oracle (decode
    not SQL-expressible); the transform kernels are pinned by pytest on
    known arrays."""
    from ..sources.images import read_images
    from ..stages.agg import partial_sum_groupby
    from ..stages.multimodal import ImageAugmenter

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt"])
    ds = ds.map_batches(
        ImageAugmenter,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(2, 16),
    )

    def sizes(batch: pa.Table) -> pa.Table:
        lens = np.array([len(b) for b in batch["bytes"].to_pylist()], dtype=np.int64)
        return pa.table(
            {
                "fmt": batch["fmt"],
                "aug": batch["aug"],
                "out_bytes": pa.array(lens),
                "px_checksum": batch["px_checksum"],
            }
        )

    return partial_sum_groupby(
        ds.map_batches(sizes, batch_format="pyarrow"),
        ["fmt", "aug"],
        ["out_bytes", "px_checksum"],
        count_alias="n",
        coalesce=4,
    )


def q_video_frames(sf_dir: str, every_n: int = 5):
    """Video frame sampling over the synthetic SFV clip table: decode the
    frame container (actor pool; real per-frame PNG decode), keep every
    Nth frame, aggregate per fps: sampled-frame count, clip count and an
    integer pixel checksum over the sampled frames. Golden oracle
    (container decode is not SQL-expressible)."""
    from ..core.imagecodec import decode_image
    from ..sources.video import read_video
    from ..stages.agg import partial_sum_groupby
    from ..stages.multimodal import VideoFrameSample

    ds = read_video(sf_dir, columns=["video_id", "bytes", "fmt", "fps"])

    class SampleWithFps:
        def __init__(self):
            self.sampler = VideoFrameSample(every_n=every_n)

        def __call__(self, batch: pa.Table) -> pa.Table:
            # carry fps through the frame fan-out by joining on position
            out = self.sampler(batch)
            fps_by_id = dict(
                zip(batch["video_id"].to_pylist(), batch["fps"].to_pylist())
            )
            fps = [fps_by_id[v] for v in out["video_id"].to_pylist()]
            checks = [
                int(decode_image(b, "png").astype(np.int64).sum())
                for b in out["bytes"].to_pylist()
            ]
            return pa.table(
                {
                    "fps": pa.array(fps, pa.int32()),
                    "video_id": out["video_id"],
                    "px_checksum": pa.array(checks, pa.int64()),
                }
            )

    frames = ds.map_batches(
        SampleWithFps, batch_format="pyarrow", batch_size=128, concurrency=(2, 8)
    )

    def shrink(b: pa.Table) -> pa.Table:
        # per-batch partial: distinct clips counted exactly later via the
        # (fps, video) dimension — here frames only
        return pa.table(
            {
                "fps": b["fps"],
                "px_checksum": b["px_checksum"],
            }
        )

    return partial_sum_groupby(
        frames.map_batches(shrink, batch_format="pyarrow"),
        ["fps"],
        ["px_checksum"],
        count_alias="n_frames",
        coalesce=4,
    )


def q_region_hulls(sf_dir: str):
    """Per-region convex hull of member image geotags (PIP join ->
    groupby(region).map_groups monotone chain). The dissolve-style
    spatial aggregate: per region the hull vertex count, shoelace area
    and a CRC of the exact hull vertex stream (deterministic — hull of
    a point SET is order-independent, ties resolved lexicographically).
    Golden oracle (hulls are not SQL-expressible); the kernel is pinned
    by a square + collinear pytest."""
    import numpy as np
    import pandas as pd

    from ..stages.pip_join import PIPJoiner

    def hull_of(group: pd.DataFrame) -> pd.DataFrame:
        import zlib

        pts = np.unique(
            np.stack([group["lon"].to_numpy(), group["lat"].to_numpy()], axis=1),
            axis=0,
        )  # lexicographically sorted unique points
        h = convex_hull(pts)
        x, y = h[:, 0], h[:, 1]
        area2 = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
        return pd.DataFrame(
            {
                "region_id": [int(group["region_id"].iloc[0])],
                "n_points": [len(pts)],
                "n_hull": [len(h)],
                "hull_area": [abs(area2) / 2.0],
                "crc": [zlib.crc32(h.astype("<f8").tobytes())],
            }
        )

    def join_batch(batch):
        import pyarrow as pa  # noqa: F401

        return batch

    import ray.data

    from ..sources.images import read_images

    ds = read_images(sf_dir, columns=["lon", "lat"])
    joined = ds.map_batches(
        PIPJoiner,
        fn_constructor_kwargs={"keep_columns": ["lon", "lat"]},
        batch_format="pyarrow",
        batch_size=16384,
        concurrency=(1, 4),
    )
    return (
        joined.select_columns(["region_id", "lon", "lat"])
        .groupby("region_id")
        .map_groups(hull_of, batch_format="pandas")
    )


def convex_hull(pts):
    """Andrew's monotone chain over lexicographically sorted unique
    points; returns hull vertices CCW starting from the lexicographic
    minimum. Collinear boundary points are dropped (strict turns)."""
    import numpy as np

    n = len(pts)
    if n <= 2:
        return np.asarray(pts, dtype=np.float64)

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (p[1] - oy) - (ay - oy) * (p[0] - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append((float(p[0]), float(p[1])))
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)


def q_substring_dedup(sf_dir: str, n: int = 8, n_buckets: int = 64):
    """EXACT substring-overlap dedup (the fixed-length form of
    suffix-array substring dedup a la "Deduplicating Training Data Makes
    Language Models Better"): a document is flagged when any of its word
    ``n``-grams also appears in a LOWER-doc_id document; emits
    (doc_id, n_dup_shingles) for flagged docs. Distributed shape: per-doc
    DISTINCT shingle keys (md5 prefix — recomputable in SQL, unlike our
    numpy hashes) explode to (key, doc_id) rows, ONE hash-bucketed
    groupby co-locates equal keys (n_buckets hash buckets, not one
    dispatch per key — size to ~4x cluster cores at real scale; the
    within-bucket work is vectorized, so bucket count only trades
    dispatch overhead against skew), within-bucket pandas min-transform
    finds each key's first
    holder, per-doc victim counts merge through the standard combiner.
    Only 16-char keys + ids cross the exchange, never text."""
    import hashlib

    import ray.data

    from ..stages.agg import partial_sum_groupby

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out_id, out_key = [], []
        for d, t in zip(ids, texts):
            words = (t or "").split(" ")
            if len(words) < n:
                continue
            seen = set()
            for i in range(len(words) - n + 1):
                s = " ".join(words[i : i + n])
                seen.add(hashlib.md5(s.encode("utf-8")).hexdigest()[:16])
            out_id.extend([int(d)] * len(seen))
            out_key.extend(seen)
        bucket = (
            np.array([int(k[:4], 16) for k in out_key], dtype=np.int64)
            % n_buckets
        )
        return pa.table(
            {
                "key": pa.array(out_key, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    shingles = ds.map_batches(shingle_rows, batch_format="pyarrow", batch_size=1024)

    def victims(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("key")["doc_id"].transform("min")
        v = g[g["doc_id"] > m]
        return v.groupby("doc_id").size().reset_index(name="n_partial")

    parts = shingles.groupby("bucket").map_groups(victims, batch_format="pandas")
    agg = partial_sum_groupby(parts, ["doc_id"], ["n_partial"], coalesce=4)

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "n_dup_shingles"])

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_substring_dedup(n: int = 8) -> str:
    return f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
sh0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(words) - {n} + 2),
                i -> array_to_string(list_slice(words, i, i + {n} - 1), ' ')))
           AS shingle
  FROM w WHERE len(words) >= {n}
),
sh AS (SELECT DISTINCT doc_id, substr(md5(shingle), 1, 16) AS key FROM sh0),
m AS (SELECT key, min(doc_id) AS mdoc FROM sh GROUP BY 1)
SELECT s.doc_id, count(*) AS n_dup_shingles
FROM sh s JOIN m ON s.key = m.key AND m.mdoc < s.doc_id
GROUP BY 1
"""


def q_ngram_quality(sf_dir: str):
    """Corpus-statistics quality score (the C4/Gopher-heuristic shape with
    a learned-from-the-corpus table): pass 1 aggregates GLOBAL char-bigram
    counts over cleaned text (lowercase, [a-z ] only) through per-batch
    ``np.bincount`` partials + one skinny groupby; the <=729-row count
    table is broadcast back and pass 2 scores each document as
    sum(global_count(bigram)) // n_bigrams — all-integer, so the score is
    reduction-order-independent and the SQL oracle recomputes it exactly.
    The two-pass train-then-score dependency is the same plan a perplexity
    filter with a real LM would run."""
    import re

    import ray.data

    from ..stages.agg import partial_sum_groupby

    clean_pat = re.compile(r"[^a-z ]")

    def doc_codes(text: str) -> np.ndarray:
        t = clean_pat.sub("", (text or "").lower())
        if len(t) < 2:
            return np.empty(0, dtype=np.int64)
        b = np.frombuffer(t.encode("ascii"), dtype=np.uint8).astype(np.int64)
        return b[:-1] * 256 + b[1:]

    def bigram_partials(batch: pa.Table) -> pa.Table:
        acc = np.zeros(65536, dtype=np.int64)
        for t in batch["text"].to_pylist():
            codes = doc_codes(t)
            if len(codes):
                acc += np.bincount(codes, minlength=65536)
        nz = np.nonzero(acc)[0]
        return pa.table(
            {"b": pa.array(nz, pa.int64()), "c": pa.array(acc[nz], pa.int64())}
        )

    docs = lambda: ray.data.read_parquet(  # noqa: E731
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    counts_df = partial_sum_groupby(
        docs().map_batches(bigram_partials, batch_format="pyarrow", batch_size=1024),
        ["b"],
        ["c"],
        coalesce=4,
    ).to_pandas()
    lut = np.zeros(65536, dtype=np.int64)
    lut[counts_df["b"].to_numpy()] = counts_df["c"].to_numpy()

    def score(batch: pa.Table) -> pa.Table:
        ids, scores = [], []
        for d, t in zip(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["text"].to_pylist(),
        ):
            codes = doc_codes(t)
            if len(codes) == 0:
                continue
            ids.append(int(d))
            scores.append(int(lut[codes].sum() // len(codes)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(scores, pa.int64()),
            }
        )

    return docs().map_batches(score, batch_format="pyarrow", batch_size=1024)


SQL_NGRAM_QUALITY = """
WITH c AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', '', 'g') AS t
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(t)), i -> substr(t, i, 2))) AS b
  FROM c WHERE length(t) >= 2
),
cnt AS (SELECT b, count(*) AS n FROM bg GROUP BY 1),
s AS (
  SELECT bg.doc_id, sum(cnt.n) AS tot, count(*) AS nb
  FROM bg JOIN cnt USING (b) GROUP BY 1
)
SELECT doc_id, CAST(tot // nb AS BIGINT) AS score FROM s
"""


def q_geo_phash_neardup(sf_dir: str, max_hamming: int = 3, zoom: int = 8):
    """GEO-BLOCKED image near-dup (the graft's spatial x dedup cross):
    perceptual-hash pairs with hamming <= 3 restricted to images in the
    SAME z8 tile — the realistic blocking for geo-corpora, where
    near-dups are co-located (re-shots of the same scene). Blocking key
    = (tile, 16-bit phash band): the pigeonhole rule keeps recall exact
    within a tile while bounding group sizes in dense urban tiles
    (~3k images/tile at sf0.01 would be all-pairs otherwise). ONE
    hash-bucketed groupby over skinny (key, id, phash) rows; pairs
    dedupe across bands on the driver (pair-dimension-sized). Exact SQL
    oracle: same-tile self-join with bit_count(xor())."""
    import pandas as pd

    from ..sources.images import read_images
    from ..stages.dedup import grouped_hamming_pairs
    from ..stages.tiles import encode_tiles

    ds = read_images(sf_dir, columns=["image_id", "phash", "lon", "lat"])

    def banded_tile_rows(batch: pa.Table) -> pa.Table:
        t = encode_tiles(
            batch,
            "WebMercatorQuad",
            (zoom,),
            keep_columns=["image_id", "phash"],
            with_cell=False,
        )
        if len(t) == 0:
            return pa.table(
                {
                    "key": pa.array([], pa.int64()),
                    "image_id": pa.array([], pa.string()),
                    "simhash": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        tile_id = (
            t["tile_x"].to_numpy(zero_copy_only=False) * (1 << zoom)
            + t["tile_y"].to_numpy(zero_copy_only=False)
        )
        ph = t["phash"].to_numpy(zero_copy_only=False)
        parts = []
        for b in range(4):
            key = ((tile_id * 4 + b) << 16) | ((ph >> (b * 16)) & 0xFFFF)
            parts.append(
                pa.table(
                    {
                        "key": pa.array(key, pa.int64()),
                        "image_id": t["image_id"],
                        "simhash": pa.array(ph),
                        "bucket": pa.array(
                            (key * 2654435761) % 512, pa.int64()
                        ),
                    }
                )
            )
        return pa.concat_tables(parts)

    banded = ds.map_batches(banded_tile_rows, batch_format="pyarrow")

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        return grouped_hamming_pairs(
            g["key"].to_numpy(),
            g["image_id"].to_numpy(),
            g["simhash"].to_numpy(),
            max_hamming=max_hamming,
            cap=1024,
        )

    pairs = banded.groupby("bucket").map_groups(bucket_fn, batch_format="pandas")
    df = pairs.to_pandas()
    if len(df) == 0:
        return pd.DataFrame(
            {"id_a": pd.Series(dtype=str), "id_b": pd.Series(dtype=str),
             "hamming": pd.Series(dtype="int64")}
        )
    n_capped = int(df["capped"].sum())
    if n_capped:
        print(
            f"[geo_phash_neardup] WARNING: {n_capped} capped pairs — should "
            f"be impossible (hot groups use the exact pigeonhole kernel)",
            flush=True,
        )
    return (
        df.drop(columns=["capped"])
        .drop_duplicates(["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def sql_geo_phash_neardup(tile_sql: dict, images_source: str, max_hamming: int = 3) -> str:
    return f"""
WITH b AS (
  SELECT image_id, phash, {tile_sql['tx']} AS tx, {tile_sql['ty']} AS ty
  FROM {images_source}
  WHERE {tile_sql['valid']}
)
SELECT a.image_id AS id_a, c.image_id AS id_b,
       CAST(bit_count(xor(a.phash, c.phash)) AS BIGINT) AS hamming
FROM b a JOIN b c
  ON a.tx = c.tx AND a.ty = c.ty AND a.image_id < c.image_id
WHERE bit_count(xor(a.phash, c.phash)) <= {max_hamming}
"""


_MIX_BP = [10000, 5000, 2500, 1000]  # keep basis points by source band


def q_source_mix(sf_dir: str):
    """DATA MIXING: deterministic per-source downsampling to target
    proportions (the "adjust the source mix" step of LLM corpus
    building). Each source's keep fraction is looked up by source band
    (numeric suffix % 4 -> 100%/50%/25%/10%) and membership is the same
    Knuth-hash rule as train_test_split — reproducible on any cluster
    and in SQL. Pure stateless map_batches + combiner rollup; emits per
    source the kept doc count and kept char volume."""
    import ray.data

    from ..stages.agg import partial_sum_groupby

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def gate(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bp = np.array([_MIX_BP[int(s[3:]) % 4] for s in src], dtype=np.uint64)
        keep = (ids * np.uint64(2654435761)) % np.uint64(10000) < bp
        kept = batch.filter(pa.array(keep))
        return pa.table(
            {"source": kept["source"], "n_chars": kept["n_chars"]}
        )

    gated = ds.map_batches(gate, batch_format="pyarrow", batch_size=8192)
    return partial_sum_groupby(
        gated, ["source"], ["n_chars"], count_alias="n_docs", coalesce=4
    )


SQL_SOURCE_MIX = """
WITH g AS (
  SELECT doc_id, source, n_chars,
         CASE (CAST(substr(source, 4) AS INTEGER) % 4)
           WHEN 0 THEN 10000 WHEN 1 THEN 5000
           WHEN 2 THEN 2500 ELSE 1000 END AS bp
  FROM documents
)
SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars, count(*) AS n_docs
FROM g
WHERE (CAST(doc_id AS UBIGINT) * 2654435761) % 10000 < bp
GROUP BY 1
"""


def q_kcenter_sample(sf_dir: str, k: int = 8):
    """DIVERSITY (coreset) SELECTION: greedy k-center / farthest-point
    sampling (Gonzalez) over the embeddings table — the data-selection
    step that picks a maximally-spread subset. Distributed shape: k-1
    rounds, each a stateless map_batches computing per-block
    (max min-distance-to-centers, argmax id) partials with the current
    centers BROADCAST, and a driver reduce that is order-independent
    (exact float max; ties broken by min vec_id). The corpus is streamed
    k-1 times; vectors never shuffle. The winner's vector is fetched by
    id between rounds with a parquet filter pushdown (a columnar point
    lookup at cluster scale), never the corpus. Output: (round, vec_id,
    d2_micro) with d2 scaled to int64 micro-units so the result is
    hashable and the independent numpy golden recomputes it exactly."""
    import pandas as pd
    import pyarrow.parquet as pq

    path = f"{sf_dir}/embeddings.parquet"

    def read():
        import ray.data

        return ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    def fetch_vec(vec_id: int) -> np.ndarray:
        t = pq.read_table(
            path,
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "==", vec_id)],
        )
        return np.array(t["embedding"].to_pylist()[0], dtype=np.float64)

    head = pq.read_table(path, columns=["vec_id"])
    seed_id = int(pa.compute.min(head["vec_id"]).as_py())
    centers = fetch_vec(seed_id)[None, :]
    rows = [(0, seed_id, 0)]
    for rnd in range(1, k):
        C = centers

        def far_partial(batch: pa.Table, C=C) -> pa.Table:
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            m = np.asarray(
                batch["embedding"].combine_chunks().flatten()
            ).reshape(len(batch), -1).astype(np.float64)
            d2 = ((m[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).min(axis=1)
            order = np.lexsort((ids, -d2))  # max d2, then min id
            j = order[0]
            return pa.table(
                {
                    "vec_id": pa.array([int(ids[j])], pa.int64()),
                    "d2": pa.array([float(d2[j])], pa.float64()),
                }
            )

        parts = read().map_batches(
            far_partial, batch_format="pyarrow", batch_size=4096
        ).to_pandas()
        parts = parts.sort_values(["d2", "vec_id"], ascending=[False, True])
        win_id = int(parts.iloc[0]["vec_id"])
        win_d2 = float(parts.iloc[0]["d2"])
        centers = np.vstack([centers, fetch_vec(win_id)])
        rows.append((rnd, win_id, int(round(win_d2 * 1_000_000))))

    return pd.DataFrame(rows, columns=["round", "vec_id", "d2_micro"])


def q_image_edges(sf_dir: str):
    """Per-image Sobel edge energy (stages/multimodal.SobelEdges) — the
    sharpness signal image curation filters on. One actor-pool decode
    pass, exact integer outputs; INDEPENDENT golden recomputes the
    convolution with explicit per-offset Python loops (SQL cannot
    decode pixels)."""
    from ..sources.images import read_images
    from ..stages.multimodal import SobelEdges

    ds = read_images(sf_dir, columns=["image_id", "bytes", "fmt"])
    return ds.map_batches(
        SobelEdges, batch_format="pyarrow", batch_size=512, concurrency=(2, 8)
    )


def q_embedding_dim_stats(sf_dir: str, dim: int = 64):
    """PER-DIMENSION embedding statistics (the feature-health /
    quantization-calibration probe): for each of the `dim` coordinates,
    exact fixed-point (n, sum_fp, min_fp, max_fp) with fp = floor(x *
    10^6) after the float32 -> float64 widening — one multiply + floor,
    so DuckDB recomputes every value bit-exactly via a lateral unnest.

    Shape at 100 TB: per-batch partials are dim-dimension rows (64 per
    block); ONE combiner groupby merges. Vectors never shuffle."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"].combine_chunks()
        flat = np.asarray(emb.flatten(), dtype=np.float64)
        m = np.floor(flat.reshape(len(batch), dim) * 1_000_000.0).astype(
            np.int64
        )
        d = np.arange(dim, dtype=np.int64)
        return pa.table(
            {
                "d": pa.array(d),
                "n": pa.array(np.full(dim, len(batch), dtype=np.int64)),
                "sum_fp": pa.array(m.sum(axis=0)),
                "min_fp": pa.array(m.min(axis=0)),
                "max_fp": pa.array(m.max(axis=0)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)

    def merge(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["d"]).aggregate(
            [("n", "sum"), ("sum_fp", "sum"), ("min_fp", "min"), ("max_fp", "max")]
        )
        return g.rename_columns(["d", "n", "sum_fp", "min_fp", "max_fp"])

    out = parts.repartition(4).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )
    return out.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


SQL_EMBEDDING_DIM_STATS = """
SELECT CAST(t.i AS BIGINT) AS d,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(CAST(e.embedding[t.i + 1] AS DOUBLE) * 1000000.0) AS BIGINT))
            AS BIGINT) AS sum_fp,
       CAST(min(CAST(floor(CAST(e.embedding[t.i + 1] AS DOUBLE) * 1000000.0) AS BIGINT))
            AS BIGINT) AS min_fp,
       CAST(max(CAST(floor(CAST(e.embedding[t.i + 1] AS DOUBLE) * 1000000.0) AS BIGINT))
            AS BIGINT) AS max_fp
FROM embeddings e, range(64) t(i)
GROUP BY 1
"""


def _add_token_bucket(b: pa.Table) -> pa.Table:
    """512-way fold-hash superbucket on the shingle key `g`."""
    return b.append_column(
        "__gb",
        pa.array(
            (
                (b["g"].to_numpy(zero_copy_only=False) & np.int64(0x7FFFFFFF))
                * np.int64(2654435761)
            )
            % np.int64(512)
        ),
    )


def _shingle_rows_ds(ds, doc_shingles):
    """(doc_id, g, n) rows: one row per (doc, DISTINCT shingle), with the
    doc's distinct-shingle count n carried on every row (needed for the
    per-doc prefix length). The corpus-dimension expansion streams —
    nothing lands on the driver."""

    def shingle_rows(batch: pa.Table) -> pa.Table:
        out_g, out_id, out_n = [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            h = doc_shingles(text)
            if len(h) == 0:
                continue
            out_g.append(h)
            out_id.append(np.full(len(h), did, dtype=np.int64))
            out_n.append(np.full(len(h), len(h), dtype=np.int64))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(out_id) if out_id else [], pa.int64()
                ),
                "g": pa.array(
                    np.concatenate(out_g) if out_g else [], pa.int64()
                ),
                "n": pa.array(
                    np.concatenate(out_n) if out_n else [], pa.int64()
                ),
            }
        )

    return ds.map_batches(shingle_rows, batch_format="pyarrow", batch_size=512)


def _rarest_prefix_select(rows, threshold: float):
    """Per-doc rarest-first PREFIX rows (g, doc_id) without broadcasting
    the vocabulary: first a 512-way TOKEN-superbucket groupby attaches
    each row's document frequency in place (every occurrence of a
    shingle hashes to the same bucket, so the within-bucket count IS the
    global df — a reduce-side join with no driver hop and no join
    operator), then a 512-way DOC-superbucket groupby selects each doc's
    p = n - ceil(tau*n) + 1 smallest shingles under the global
    (df asc, g asc) order. Ordering by the (df, g) SORT KEY directly is
    equivalent to the dense rarest-first rank (same total order, and a
    doc's shingles are distinct), so no global rank array is ever
    materialized or shipped in task closures."""
    import pandas as pd

    def attach_df(group: pd.DataFrame) -> pd.DataFrame:
        g = group["g"].to_numpy()
        _, inv, cnt = np.unique(g, return_inverse=True, return_counts=True)
        out = group[["doc_id", "g", "n"]].copy()
        out["df"] = cnt[inv].astype(np.int64)
        return out

    with_df = (
        rows.map_batches(_add_token_bucket, batch_format="pyarrow")
        .groupby("__gb")
        .map_groups(attach_df, batch_format="pandas")
        .map_batches(
            lambda b: b.append_column(
                "__db",
                pa.array(
                    (
                        (
                            b["doc_id"].to_numpy(zero_copy_only=False)
                            & np.int64(0x7FFFFFFF)
                        )
                        * np.int64(2654435761)
                    )
                    % np.int64(512)
                ),
            ),
            batch_format="pyarrow",
        )
    )

    def prefix_select(group: pd.DataFrame) -> pd.DataFrame:
        did = group["doc_id"].to_numpy()
        g = group["g"].to_numpy()
        n = group["n"].to_numpy()
        dfv = group["df"].to_numpy()
        order = np.lexsort((g, dfv, did))
        did, g, n = did[order], g[order], n[order]
        bnd = np.nonzero(did[1:] != did[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [len(did)]))
        pos = np.arange(len(did)) - np.repeat(starts, ends - starts)
        p = (n - np.ceil(threshold * n) + 1).astype(np.int64)
        keep = pos < p
        return pd.DataFrame({"g": g[keep], "doc_id": did[keep]})

    return with_df.groupby("__db").map_groups(prefix_select, batch_format="pandas")


def q_allpairs_jaccard(sf_dir: str, threshold: float = 0.75, ngram: int = 3):
    """ALL-PAIRS exact set-similarity self-join with PREFIX FILTERING
    (Bayardo et al. "Scaling Up All Pairs Similarity Search", WWW'07 /
    PPJoin, Xiao et al. VLDB'08): every document pair whose distinct
    word-trigram shingle sets have Jaccard >= threshold — COMPLETE
    recall, no LSH miss probability (the guaranteed-exact sibling of
    minhash_neardup, at a lower threshold LSH banding would miss more
    often). Shingle order matters: bigrams on this corpus's ~900-token
    vocabulary leave every prefix token hot (~9M candidates, measured
    289 s); trigram shingles push the vocabulary to 27k and candidates
    to ~150k — pick the shingle width that makes prefixes RARE. Prefix lemma: order every set by one global token
    order (rarest-first by document frequency); a pair with
    |a ∩ b| >= ceil(tau*max(|a|,|b|)) must share a token within the
    first n - ceil(tau*n) + 1 tokens of each side, so only those
    PREFIX tokens are exploded for candidate generation.

    Shape at 100 TB: stage 1 is a (shingle) df combiner (vocab
    dimension, stays a DATASET); the rarest-first order means hot
    shingles almost never appear in prefixes, collapsing the classic
    inverted-index hot-key blowup; candidates are pair-dimension;
    verification re-reads only candidate texts (broadcast semi-join
    fetch). Rank assignment is a DATASET JOIN on the shingle key —
    (doc,shingle) rows ⋈ df table, per-doc prefix selection in a
    512-way doc-superbucket groupby with (df, g) as the order key
    directly (no dense rank, so no driver-side vocabulary
    materialization and no multi-GB task-closure broadcast)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from ..stages.agg import partial_sum_groupby
    from ..stages.dedup import (
        _hash_tokens_ngrams,
        _triangle_pair_indices,
        verify_jaccard_pairs,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def doc_shingles(text: str) -> np.ndarray:
        return np.unique(
            _hash_tokens_ngrams((text or "").split(), ngram).astype(np.int64)
        )

    rows = _shingle_rows_ds(ds, doc_shingles)
    prefixes = _rarest_prefix_select(rows, threshold).map_batches(
        # 512-way token superbucket: grouping on the raw prefix token
        # dispatches one pandas map_groups per DISTINCT token (measured
        # 381 s at sf0.1 — the per-tiny-group tax); the fold-hash bucket
        # cuts dispatches to 512 with a vectorized in-bucket kernel
        _add_token_bucket,
        batch_format="pyarrow",
    )

    def segment_pairs(group) -> "pd.DataFrame":
        """Candidate pairs per token segment inside one bucket: sort by
        (g, doc_id), then tiled triangle enumeration per segment —
        singleton segments (the common case under rarest-first
        prefixes) cost one boundary comparison, no pandas dispatch."""
        g_arr = group["g"].to_numpy()
        ids = group["doc_id"].to_numpy()
        order = np.lexsort((ids, g_arr))
        g_arr, ids = g_arr[order], ids[order]
        bnd = np.nonzero(g_arr[1:] != g_arr[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [len(g_arr)]))
        outs_a, outs_b, capped = [], [], False
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            if n > 4096:
                capped = True
                e = s + 4096
                n = 4096
            seg = ids[s:e]
            for ia, ib in _triangle_pair_indices(n):
                outs_a.append(seg[ia])
                outs_b.append(seg[ib])
        a = np.concatenate(outs_a) if outs_a else np.array([], dtype=np.int64)
        b = np.concatenate(outs_b) if outs_b else np.array([], dtype=np.int64)
        return pd.DataFrame(
            {"id_a": a, "id_b": b, "capped": np.full(len(a), capped)}
        )

    pairs = (
        prefixes.groupby("__gb")
        .map_groups(segment_pairs, batch_format="pandas")
        .materialize()
    )
    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        }
    )
    if pairs.count() == 0:
        return empty
    pdf_all = pairs.to_pandas()  # pair-dimension
    n_capped = int(pdf_all["capped"].sum())
    if n_capped:
        print(
            f"[allpairs_jaccard] WARNING: {n_capped} candidates from capped "
            f"prefix groups (>4096 docs) — recall truncated there",
            flush=True,
        )
    pdf = pdf_all[["id_a", "id_b"]].drop_duplicates()
    cand = ray.data.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))
    cand_ids = pa.array(
        np.unique(np.concatenate((pdf["id_a"].to_numpy(), pdf["id_b"].to_numpy())))
    )
    texts_small = ds.map_batches(
        lambda b: b.filter(pc.is_in(b["doc_id"], value_set=cand_ids)),
        batch_format="pyarrow",
    ).materialize()  # candidate-sized
    j = cand.join(
        texts_small,
        join_type="inner",
        num_partitions=max(2, _ccpus() // 8),
        on=("id_a",),
        right_on=("doc_id",),
    ).map_batches(
        lambda b: b.rename_columns(
            ["text_a" if c == "text" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    j = j.join(
        texts_small,
        join_type="inner",
        num_partitions=max(2, _ccpus() // 8),
        on=("id_b",),
        right_on=("doc_id",),
    ).map_batches(
        lambda b: b.rename_columns(
            ["text_b" if c == "text" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    return j.map_batches(
        lambda b: verify_jaccard_pairs(b, threshold=threshold, ngram=ngram),
        batch_format="pyarrow",
    )


SQL_ALLPAIRS_JACCARD = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         END AS sh
  FROM t
)
, l AS (SELECT doc_id, len(sh) AS n FROM s
), e AS (SELECT doc_id, unnest(sh) AS g FROM s
), i AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ninter
  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b,
         CAST(i.ninter AS DOUBLE) / (la.n + lb.n - i.ninter) AS jaccard
  FROM i JOIN l la ON la.doc_id = i.id_a JOIN l lb ON lb.doc_id = i.id_b
) WHERE jaccard >= 0.75
"""


def q_video_scene_cuts(sf_dir: str, sad_thresh: int = 13000):
    """VIDEO SCENE-CUT DETECTION (temporal shot segmentation — the
    frame-level curation signal behind clip splitting and per-shot
    captioning): per clip, decode every frame (actor pool, one decode
    pass), compute the exact integer sum-of-absolute-differences (SAD)
    between consecutive frames, and mark a cut where SAD >= thresh.
    Output per clip: frame/cut counts, the first cut index (-1 when
    none) and the total SAD energy — all exact int64.

    Shape at 100 TB: one actor-pool map_batches, clip-parallel (a clip's
    frames never cross workers, so the consecutive-frame pairing needs
    no shuffle at all); per-frame pixel math vectorized; output is
    clip-dimension. Real codecs (mp4/webm) raise the documented
    NotImplementedError; the SFV container decodes for real."""
    from ..sources.video import read_video

    ds = read_video(sf_dir, columns=["video_id", "bytes", "fmt"])

    class SceneCuts:
        def __init__(self):
            from ..core.imagecodec import decode_image
            from ..sources.video import decode_sfv

            self.decode_sfv = decode_sfv
            self.decode_image = decode_image

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = batch["video_id"].to_numpy(zero_copy_only=False)
            fmts = batch["fmt"].to_pylist()
            rows = {
                "video_id": [],
                "n_frames": [],
                "n_cuts": [],
                "first_cut": [],
                "total_sad": [],
            }
            for i, buf in enumerate(batch["bytes"].to_pylist()):
                if fmts[i] != "sfv":
                    raise NotImplementedError(
                        f"video format {fmts[i]!r} needs a real codec"
                    )
                frames, _w, _h, _fps = self.decode_sfv(buf)
                imgs = np.stack(
                    [self.decode_image(b, "png").astype(np.int64) for b in frames]
                )
                sad = np.abs(imgs[1:] - imgs[:-1]).sum(axis=(1, 2, 3))
                cuts = np.nonzero(sad >= sad_thresh)[0]
                rows["video_id"].append(int(vids[i]))
                rows["n_frames"].append(len(frames))
                rows["n_cuts"].append(len(cuts))
                rows["first_cut"].append(int(cuts[0]) + 1 if len(cuts) else -1)
                rows["total_sad"].append(int(sad.sum()))
            return pa.table(
                {k: pa.array(v, pa.int64()) for k, v in rows.items()}
            )

    return ds.map_batches(
        SceneCuts, batch_format="pyarrow", batch_size=64, concurrency=(2, 8)
    )


def q_s2_compact(sf_dir: str, level: int = 8):
    """S2 COVERING COMPACTION (RegionCoverer's normalize step; the S2
    sibling of h3_compact): the corpus's occupied level-`level` cells
    collapse into a minimal mixed-level covering — a parent replaces its
    children exactly when ALL FOUR are present, recursively to level 0.
    The result is the canonical compact cell union importers feed to
    S2-based systems (coverings, index shards, spatial ACLs).

    Shape at 100 TB: ONE distinct-cell combiner (token-grouped — see
    q_s2_cells for why canonical ids degrade the hash grouper) folds
    the corpus to the occupied-cell dimension; compaction runs on that
    set with vectorized parent arithmetic (4^level-bounded; at deeper
    levels it becomes a per-face groupby of the same numpy kernel)."""
    from ..core import s2
    from ..stages.agg import partial_count_groupby
    from ..stages.tiles import encode_s2

    ds = _read_images_lonlat(sf_dir)
    ds = ds.map_batches(
        lambda b: encode_s2(b, level=level, keep_columns=[], as_token=True),
        batch_format="pyarrow",
        batch_size=16384,
    )
    occ = partial_count_groupby(ds, ["s2_tok"], alias="n").to_pandas()
    cur = s2.token_to_cell_id(
        occ["s2_tok"].to_numpy().view(np.uint64), level
    ).astype(np.uint64)

    out_ids, out_lvl = [], []
    for k in range(level - 1, -1, -1):
        par = s2.parent(cur, k).astype(np.uint64)
        uniq, counts = np.unique(par, return_counts=True)
        complete = set(uniq[counts == 4].tolist())
        if complete:
            keep = np.array([int(p) not in complete for p in par], dtype=bool)
        else:
            keep = np.ones(len(cur), dtype=bool)
        out_ids.append(cur[keep])
        out_lvl.append(np.full(int(keep.sum()), k + 1, dtype=np.int64))
        cur = np.array(sorted(complete), dtype=np.uint64)
        if len(cur) == 0:
            break
    if len(cur):
        out_ids.append(cur)
        out_lvl.append(np.zeros(len(cur), dtype=np.int64))
    ids = np.concatenate(out_ids)
    lvl = np.concatenate(out_lvl)
    order = np.argsort(ids)
    import pandas as pd

    return pd.DataFrame(
        {
            "s2_cell": ids[order].view(np.int64),
            "lvl": lvl[order],
        }
    )


def _read_images_lonlat(sf_dir: str):
    from ..sources.images import read_images

    return read_images(sf_dir, columns=["lon", "lat"])


def q_containment_join(sf_dir: str, threshold: float = 0.9, ngram: int = 3):
    """ASYMMETRIC CONTAINMENT JOIN (Broder's containment coefficient
    |A∩B| / |A| — the boilerplate/quote/near-superset detector Jaccard
    misses when a short doc lives inside a long one): every ORDERED
    pair (A, B) with >= threshold of A's distinct trigram shingles
    present in B. Complete recall via the one-sided prefix lemma: if
    at most floor((1-tau)|A|) of A's tokens miss B, A's rarest
    (|A| - ceil(tau*|A|) + 1) tokens must hit SOME token of B — so the
    query side emits prefixes while the index side emits full sets.

    Shape at 100 TB: df combiner (stays a DATASET); rank assignment is
    a dataset join on the shingle key + per-doc prefix selection in a
    doc-superbucket groupby (same de-broadcast shape as
    allpairs_jaccard — no driver-side vocabulary, no task-closure rank
    arrays); query-prefix rows union index-full rows into ONE 512-way
    token-superbucket groupby (vectorized per-segment bipartite
    candidate generation); candidates are pair-dimension; verification
    re-reads only candidate texts (semi-join fetch)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from ..stages.agg import partial_sum_groupby
    from ..stages.dedup import _hash_tokens_ngrams, jaccard, shingle_set

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def doc_shingles(text: str) -> np.ndarray:
        return np.unique(
            _hash_tokens_ngrams((text or "").split(), ngram).astype(np.int64)
        )

    srows = _shingle_rows_ds(ds, doc_shingles)

    def idx_tag(b: pa.Table) -> pa.Table:
        return _add_token_bucket(
            pa.table(
                {
                    "g": b["g"],
                    "doc_id": b["doc_id"],
                    "side": pa.array(np.zeros(b.num_rows, np.int8)),
                }
            )
        )

    def qry_tag(b: pa.Table) -> pa.Table:
        return _add_token_bucket(
            pa.table(
                {
                    "g": b["g"].cast(pa.int64()),
                    "doc_id": b["doc_id"].cast(pa.int64()),
                    "side": pa.array(np.ones(b.num_rows, np.int8)),
                }
            )
        )

    rows = srows.map_batches(idx_tag, batch_format="pyarrow").union(
        _rarest_prefix_select(srows, threshold).map_batches(
            qry_tag, batch_format="pyarrow"
        )
    )

    def segment_candidates(group) -> "pd.DataFrame":
        g_arr2 = group["g"].to_numpy()
        ids = group["doc_id"].to_numpy()
        side = group["side"].to_numpy()
        order2 = np.lexsort((ids, side, g_arr2))
        g_arr2, ids, side = g_arr2[order2], ids[order2], side[order2]
        bnd = np.nonzero(g_arr2[1:] != g_arr2[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [len(g_arr2)]))
        oa, ob = [], []
        for s, e in zip(starts, ends):
            sd = side[s:e]
            nq = int((sd == 1).sum())
            ni = (e - s) - nq
            if nq == 0 or ni == 0:
                continue
            idx = ids[s:e]
            q = idx[sd == 1]
            ix = idx[sd == 0]
            # bipartite candidates (query A, index B), A != B
            a = np.repeat(q, len(ix))
            b = np.tile(ix, len(q))
            keep = a != b
            oa.append(a[keep])
            ob.append(b[keep])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(oa) if oa else np.array([], dtype=np.int64),
                "id_b": np.concatenate(ob) if ob else np.array([], dtype=np.int64),
            }
        )

    pairs = (
        rows.groupby("__gb")
        .map_groups(segment_candidates, batch_format="pandas")
        .materialize()
    )
    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "containment": pd.Series([], dtype="float64"),
        }
    )
    if pairs.count() == 0:
        return empty
    pdf = pairs.to_pandas().drop_duplicates()  # pair-dimension
    cand = ray.data.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))
    cand_ids = pa.array(
        np.unique(np.concatenate((pdf["id_a"].to_numpy(), pdf["id_b"].to_numpy())))
    )
    texts_small = ds.map_batches(
        lambda b: b.filter(pc.is_in(b["doc_id"], value_set=cand_ids)),
        batch_format="pyarrow",
    ).materialize()
    j = cand.join(
        texts_small,
        join_type="inner",
        num_partitions=max(2, _ccpus() // 8),
        on=("id_a",),
        right_on=("doc_id",),
    ).map_batches(
        lambda b: b.rename_columns(
            ["text_a" if c == "text" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    j = j.join(
        texts_small,
        join_type="inner",
        num_partitions=max(2, _ccpus() // 8),
        on=("id_b",),
        right_on=("doc_id",),
    ).map_batches(
        lambda b: b.rename_columns(
            ["text_b" if c == "text" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_pylist()
        b = batch["id_b"].to_pylist()
        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        keep_a, keep_b, keep_c = [], [], []
        for x, y, sx, sy in zip(a, b, ta, tb):
            sa = shingle_set(sx or "", ngram)
            sb = shingle_set(sy or "", ngram)
            if not sa:
                continue
            c = len(sa & sb) / len(sa)
            if c >= threshold:
                keep_a.append(x)
                keep_b.append(y)
                keep_c.append(c)
        return pa.table(
            {
                "id_a": pa.array(keep_a, pa.int64()),
                "id_b": pa.array(keep_b, pa.int64()),
                "containment": pa.array(keep_c, pa.float64()),
            }
        )

    return j.map_batches(verify, batch_format="pyarrow")


SQL_CONTAINMENT_JOIN = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         END AS sh
  FROM t
)
, l AS (SELECT doc_id, len(sh) AS n FROM s
), e AS (SELECT doc_id, unnest(sh) AS g FROM s
), i AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ninter
  FROM e a JOIN e b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, containment FROM (
  SELECT id_a, id_b, CAST(i.ninter AS DOUBLE) / la.n AS containment
  FROM i JOIN l la ON la.doc_id = i.id_a
) WHERE containment >= 0.9
"""


def q_embedding_quantization(sf_dir: str, dim: int = 64):
    """INT8 QUANTIZATION CALIBRATION (the error audit run before
    shipping a quantized ANN index): per dimension, symmetric int8
    scale = 127 / max|x|, q = floor(x * scale + 0.5), and the exact
    integer reconstruction-error account sum(floor((x - q/scale)^2 *
    1e12)) — floor-fixed per ELEMENT so the sum is reduction-order
    independent and DuckDB recomputes it bit-exactly (naive float sums
    would differ by reduction order at any cluster size).

    Shape at 100 TB: TWO streaming passes — a dim-dimension max
    combiner, broadcast scales, then a dim-dimension error combiner.
    Vectors never shuffle."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def max_partial(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"].combine_chunks()
        flat = np.asarray(emb.flatten(), dtype=np.float64)
        m = np.abs(flat.reshape(len(batch), dim))
        return pa.table(
            {
                "d": pa.array(np.arange(dim, dtype=np.int64)),
                "max_abs": pa.array(m.max(axis=0)),
            }
        )

    def max_merge(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["d"]).aggregate([("max_abs", "max")])
        return g.rename_columns(["d", "max_abs"])

    mx = (
        ds.map_batches(max_partial, batch_format="pyarrow", batch_size=4096)
        .repartition(1)
        .map_batches(max_merge, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("d")
    )
    max_abs = mx["max_abs"].to_numpy()  # dim-dimension, broadcast
    scale = np.where(max_abs > 0.0, 127.0 / max_abs, 0.0)

    def err_partial(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"].combine_chunks()
        x = np.asarray(emb.flatten(), dtype=np.float64).reshape(len(batch), dim)
        q = np.floor(x * scale[None, :] + 0.5)
        with np.errstate(invalid="ignore", divide="ignore"):
            deq = np.where(scale[None, :] > 0.0, q / scale[None, :], 0.0)
        err = x - deq
        term = np.floor(err * err * 1e12).astype(np.int64)
        return pa.table(
            {
                "d": pa.array(np.arange(dim, dtype=np.int64)),
                "n": pa.array(np.full(dim, len(batch), dtype=np.int64)),
                "sum_err_fp": pa.array(term.sum(axis=0)),
                "max_q": pa.array(q.max(axis=0).astype(np.int64)),
                "min_q": pa.array(q.min(axis=0).astype(np.int64)),
            }
        )

    def err_merge(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["d"]).aggregate(
            [("n", "sum"), ("sum_err_fp", "sum"), ("max_q", "max"), ("min_q", "min")]
        )
        return g.rename_columns(["d", "n", "sum_err_fp", "max_q", "min_q"])

    out = (
        ds.map_batches(err_partial, batch_format="pyarrow", batch_size=4096)
        .repartition(4)
        .map_batches(err_merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(err_merge, batch_format="pyarrow", batch_size=None)
    )
    return out


SQL_EMBEDDING_QUANTIZATION = """
WITH x AS (
  SELECT t.i AS d, CAST(e.embedding[t.i + 1] AS DOUBLE) AS v
  FROM embeddings e, range(64) t(i)
),
s AS (
  SELECT d, CASE WHEN max(abs(v)) > 0.0 THEN 127.0 / max(abs(v)) ELSE 0.0 END AS scale
  FROM x GROUP BY 1
),
q AS (
  SELECT x.d, x.v, floor(x.v * s.scale + 0.5) AS qv, s.scale
  FROM x JOIN s ON s.d = x.d
)
SELECT CAST(d AS BIGINT) AS d,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor((v - CASE WHEN scale > 0.0 THEN qv / scale ELSE 0.0 END)
                           * (v - CASE WHEN scale > 0.0 THEN qv / scale ELSE 0.0 END)
                           * 1e12) AS BIGINT)) AS BIGINT) AS sum_err_fp,
       CAST(max(qv) AS BIGINT) AS max_q,
       CAST(min(qv) AS BIGINT) AS min_q
FROM q GROUP BY 1
"""


def q_doc_keywords(sf_dir: str, k: int = 3):
    """PER-DOCUMENT SALIENT TERMS (the keyword-extraction / tagging
    primitive): each document's top-k words ranked by term frequency
    with a rarity tiebreak — (tf DESC, corpus df ASC, word ASC), a
    fully integer ordering (deliberately not the float tf*idf product:
    ln() differs by 1 ulp between libms, and a value-hashed output
    cannot absorb that — the integer lexicographic rank is exactly
    mirrorable and selects the same head terms).

    Shape at 100 TB: a (word, doc-distinct) df combiner (vocab
    dimension, broadcast); per-batch per-doc vectorized tf count +
    top-k selection — documents never shuffle; output is docs x k."""
    import pandas as pd

    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def df_rows(batch: pa.Table) -> pa.Table:
        words = []
        for t in batch["text"].to_pylist():
            words.extend(set((t or "").split()))
        return pa.table({"word": pa.array(words, pa.string())})

    df_tab = partial_sum_groupby(
        ds.map_batches(df_rows, batch_format="pyarrow", batch_size=512),
        ["word"],
        [],
        count_alias="df",
        coalesce=4,
    ).to_pandas()  # vocab dimension
    df_map = dict(zip(df_tab["word"], df_tab["df"].astype(int)))

    def topk(batch: pa.Table) -> pa.Table:
        out_id, out_rank, out_word, out_tf = [], [], [], []
        for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = (t or "").split()
            if not toks:
                continue
            tf: dict[str, int] = {}
            for w in toks:
                tf[w] = tf.get(w, 0) + 1
            ranked = sorted(
                tf.items(), key=lambda kv: (-kv[1], df_map.get(kv[0], 0), kv[0])
            )[:k]
            for r, (w, f) in enumerate(ranked):
                out_id.append(did)
                out_rank.append(r + 1)
                out_word.append(w)
                out_tf.append(f)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "rank": pa.array(out_rank, pa.int64()),
                "word": pa.array(out_word, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )

    return ds.map_batches(topk, batch_format="pyarrow", batch_size=512)


SQL_DOC_KEYWORDS = r"""
WITH w AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY 1),
r AS (
  SELECT tf.doc_id, tf.word, tf.tf,
         row_number() OVER (
           PARTITION BY tf.doc_id ORDER BY tf.tf DESC, df.df, tf.word
         ) AS rank
  FROM tf JOIN df ON df.word = tf.word
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, word, CAST(tf AS BIGINT) AS tf
FROM r WHERE rank <= 3
"""


def q_phash_bit_stats(sf_dir: str):
    """SIGNATURE BIT-BALANCE audit (hash-health: a good perceptual hash
    has each bit near 50/50 and the Hamming geometry depends on it):
    per bit position 0..63 of the images' phash column, the exact
    number of set bits and total rows — the bias 2*ones/n - 1 derives
    downstream.

    Shape at 100 TB: per-batch popcount partials over the int64 column
    (64 skinny rows per block) -> one combiner. Nothing else moves."""
    from ..sources.images import read_images
    from ..stages.agg import partial_sum_groupby

    ds = read_images(sf_dir, columns=["phash"])

    def partial(batch: pa.Table) -> pa.Table:
        h = batch["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
        bits = np.arange(64, dtype=np.uint64)
        ones = ((h[:, None] >> bits[None, :]) & np.uint64(1)).sum(axis=0)
        return pa.table(
            {
                "bit": pa.array(np.arange(64, dtype=np.int64)),
                "ones": pa.array(ones.astype(np.int64)),
                "n": pa.array(np.full(64, len(h), dtype=np.int64)),
            }
        )

    return partial_sum_groupby(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384),
        ["bit"],
        ["ones", "n"],
        coalesce=4,
    )


SQL_PHASH_BIT_STATS = """
SELECT CAST(t.i AS BIGINT) AS bit,
       CAST(sum((phash >> t.i) & 1) AS BIGINT) AS ones,
       CAST(count(*) AS BIGINT) AS n
FROM {IMAGES} i, range(64) t(i)
GROUP BY 1
"""


def q_zipf_head(sf_dir: str, k: int = 100):
    """ZIPF HEAD TABLE (vocabulary rank-frequency head — the corpus
    fingerprint whose log-log slope is the Zipf exponent; kept as exact
    (rank, freq) integers so the fit runs downstream without any libm
    drift): the top-k words by (frequency DESC, word ASC).

    Shape at 100 TB: ONE word-count combiner (vocab dimension) -> per-
    block top-k prune -> driver final sort. The corpus never sorts."""
    import pandas as pd

    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def words(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["text"].to_pylist():
            out.extend((t or "").split())
        return pa.table({"word": pa.array(out, pa.string())})

    counts = partial_sum_groupby(
        ds.map_batches(words, batch_format="pyarrow", batch_size=512),
        ["word"],
        [],
        count_alias="freq",
        coalesce=4,
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["freq", "word"], ascending=[False, True], kind="stable"
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    pdf = (
        counts.map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["freq", "word"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    pdf["rank"] = np.arange(1, len(pdf) + 1, dtype=np.int64)
    pdf["freq"] = pdf["freq"].astype(np.int64)
    return pdf[["rank", "word", "freq"]]


SQL_ZIPF_HEAD = r"""
WITH w AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents
),
c AS (SELECT word, count(*) AS freq FROM w GROUP BY 1)
SELECT CAST(row_number() OVER (ORDER BY freq DESC, word) AS BIGINT) AS rank,
       word, CAST(freq AS BIGINT) AS freq
FROM c
ORDER BY freq DESC, word
LIMIT 100
"""


def q_word_burstiness(sf_dir: str, min_df: int = 5):
    """WORD BURSTINESS moments (Church-Gale dispersion: a word appearing
    20x in one doc differs from one appearing once in 20 docs — the
    spam/topicality signal tf-idf misses): per word with df >= min_df,
    exact (df, sum_tf, sum_tf2) — the variance-to-mean ratio derives
    downstream exactly.

    Shape at 100 TB: per-batch per-doc tf counting (vectorized dict
    fold), ONE (word) combiner summing the three moments."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def moments(batch: pa.Table) -> pa.Table:
        words, dfs, tfs, tf2s = [], [], [], []
        for t in batch["text"].to_pylist():
            tf: dict[str, int] = {}
            for w in (t or "").split():
                tf[w] = tf.get(w, 0) + 1
            for w, f in tf.items():
                words.append(w)
                dfs.append(1)
                tfs.append(f)
                tf2s.append(f * f)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "df": pa.array(dfs, pa.int64()),
                "sum_tf": pa.array(tfs, pa.int64()),
                "sum_tf2": pa.array(tf2s, pa.int64()),
            }
        )

    out = partial_sum_groupby(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=512),
        ["word"],
        ["df", "sum_tf", "sum_tf2"],
        coalesce=4,
    )

    def gate(batch: pa.Table) -> pa.Table:
        keep = batch["df"].to_numpy(zero_copy_only=False) >= min_df
        return batch.filter(pa.array(keep))

    return out.map_batches(gate, batch_format="pyarrow")


SQL_WORD_BURSTINESS = r"""
WITH w AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS f FROM w GROUP BY 1, 2)
SELECT word, CAST(count(*) AS BIGINT) AS df,
       CAST(sum(f) AS BIGINT) AS sum_tf,
       CAST(sum(f * f) AS BIGINT) AS sum_tf2
FROM tf GROUP BY 1 HAVING count(*) >= 5
"""


def q_novelty_curve(sf_dir: str, ngram: int = 2):
    """CONTENT NOVELTY attribution (which documents INTRODUCED the
    corpus's bigrams — the dataset-growth/contamination audit that
    shows whether new data still adds new content): every distinct
    bigram shingle is credited to its smallest doc_id; output per
    crediting doc: how many bigrams it introduced.

    Shape at 100 TB: per-doc distinct shingle rows -> ONE (shingle)
    min-doc combiner (partial_min_groupby) -> doc-dimension count
    combiner. Text never shuffles; shingle keys only."""
    from ..stages.agg import partial_min_groupby, partial_sum_groupby
    from ..stages.dedup import _hash_tokens_ngrams

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def shingle_rows(batch: pa.Table) -> pa.Table:
        gs, ids = [], []
        for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            h = np.unique(
                _hash_tokens_ngrams((t or "").split(), ngram).astype(np.int64)
            )
            gs.append(h)
            ids.append(np.full(len(h), did, dtype=np.int64))
        return pa.table(
            {
                "g": pa.array(np.concatenate(gs) if gs else [], pa.int64()),
                "doc_id": pa.array(
                    np.concatenate(ids) if ids else [], pa.int64()
                ),
            }
        )

    first = partial_min_groupby(
        ds.map_batches(shingle_rows, batch_format="pyarrow", batch_size=512),
        ["g"],
        ["doc_id"],
        coalesce=8,
    )
    return partial_sum_groupby(
        first, ["doc_id"], [], count_alias="n_introduced", coalesce=4
    )


SQL_NOVELTY_CURVE = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct(list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i+1]))
         END AS sh
  FROM t
),
e AS (SELECT doc_id, unnest(sh) AS g FROM s),
f AS (SELECT g, min(doc_id) AS doc_id FROM e GROUP BY 1)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_introduced
FROM f GROUP BY 1
"""


def q_word_cooccurrence(sf_dir: str, k: int = 30):
    """WORD CO-OCCURRENCE over the top-k vocabulary: for every pair of
    head words, how many documents contain BOTH (the PMI/embedding-
    prior co-occurrence matrix, kept as exact integer counts). The
    vocabulary is the deterministic top-k by (count DESC, token ASC).

    Shape at 100 TB: the vocab is output-dimension (top-k) and
    broadcasts; per batch each doc folds to its distinct vocab-index
    set and pairs count into a k*k bincount, so a batch emits <= C(k,2)
    partial rows regardless of corpus size; one tiny pair combiner."""
    from ..stages.agg import partial_sum_groupby

    vdf = q_token_counts(sf_dir, k).to_pandas()
    vocab = {w: i for i, w in enumerate(vdf["token"].tolist())}
    words = np.asarray(vdf["token"].tolist(), dtype=object)
    nv = len(words)

    ds = _read(sf_dir, "documents", ["text"])

    def pairs(batch: pa.Table) -> pa.Table:
        cnt = np.zeros(nv * nv, dtype=np.int64)
        for text in batch["text"].to_pylist():
            idx = sorted(
                {vocab[t] for t in (text or "").split() if t in vocab}
            )
            m = len(idx)
            for i in range(m):
                a = idx[i] * nv
                for j in range(i + 1, m):
                    cnt[a + idx[j]] += 1
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "ia": pa.array((nz // nv).astype(np.int64)),
                "ib": pa.array((nz % nv).astype(np.int64)),
                "n_partial": pa.array(cnt[nz]),
            }
        )

    agg = partial_sum_groupby(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=512),
        ["ia", "ib"],
        ["n_partial"],
        coalesce=4,
    )

    def finish(batch: pa.Table) -> pa.Table:
        ia = batch["ia"].to_numpy(zero_copy_only=False)
        ib = batch["ib"].to_numpy(zero_copy_only=False)
        wa = words[ia]
        wb = words[ib]
        # canonical pair order is LEXICOGRAPHIC (mirrors a.token < b.token)
        lo = np.minimum(wa, wb)
        hi = np.maximum(wa, wb)
        return pa.table(
            {
                "word_a": pa.array(lo.tolist(), pa.string()),
                "word_b": pa.array(hi.tolist(), pa.string()),
                "n_docs": batch["n_partial"],
            }
        )

    # index pairs are rank-ordered, not lexicographic: re-key and merge
    out = agg.map_batches(finish, batch_format="pyarrow")
    return partial_sum_groupby(out, ["word_a", "word_b"], ["n_docs"], coalesce=2)


SQL_WORD_COOCCURRENCE = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
  FROM documents WHERE trim(text) <> ''
), v AS (
  SELECT token FROM toks GROUP BY 1
  ORDER BY count(*) DESC, token ASC LIMIT 30
), d AS (
  SELECT DISTINCT doc_id, token FROM toks
  WHERE token IN (SELECT token FROM v)
)
SELECT a.token AS word_a, b.token AS word_b,
       CAST(count(*) AS BIGINT) AS n_docs
FROM d a JOIN d b ON a.doc_id = b.doc_id AND a.token < b.token
GROUP BY 1, 2
"""


def q_embedding_norm_outliers(sf_dir: str, dim: int = 64):
    """VECTOR-NORM QUALITY GATE: per-embedding exact fixed-point squared
    L2 norm (sum of floor(x*1e6)^2 — pure integer after the one widening
    multiply, so DuckDB recomputes it bit-exactly), Tukey-fenced on the
    exact discrete quartiles of the norm distribution. Degenerate or
    exploded vectors (bad encoder batches) land outside the fences.
    Output: one row (n, q1, q3, n_outliers).

    Shape at 100 TB: norms are a map-only fold (vectors never shuffle);
    the fence selection runs on the distinct-norm histogram (the
    grouped_median pattern)."""
    from ..stages.agg import partial_sum_groupby

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def norms(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"].combine_chunks()
        flat = np.asarray(emb.flatten(), dtype=np.float64)
        m = np.floor(flat.reshape(len(batch), dim) * 1_000_000.0).astype(np.int64)
        return pa.table({"norm2": pa.array((m * m).sum(axis=1))})

    hist = partial_sum_groupby(
        ds.map_batches(norms, batch_format="pyarrow", batch_size=4096),
        ["norm2"],
        [],
        count_alias="cnt",
        coalesce=4,
    ).to_pandas()  # distinct-norm dimension
    hist = hist.sort_values("norm2")
    cum = hist["cnt"].to_numpy().cumsum()
    total = int(cum[-1])
    v = hist["norm2"].to_numpy()
    q1 = int(v[np.searchsorted(cum, int(np.ceil(0.25 * total)))])
    q3 = int(v[np.searchsorted(cum, int(np.ceil(0.75 * total)))])
    iqr = q3 - q1
    out_mask = (2 * v < 2 * q1 - 3 * iqr) | (2 * v > 2 * q3 + 3 * iqr)
    n_out = int(hist["cnt"].to_numpy()[out_mask].sum())
    return pa.table(
        {
            "n": pa.array([total], pa.int64()),
            "q1_norm2": pa.array([q1], pa.int64()),
            "q3_norm2": pa.array([q3], pa.int64()),
            "n_outliers": pa.array([n_out], pa.int64()),
        }
    )


SQL_EMBEDDING_NORM_OUTLIERS = """
WITH n AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                * CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)))
           AS BIGINT) AS norm2
  FROM embeddings
), q AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         quantile_disc(norm2, 0.25) AS q1_norm2,
         quantile_disc(norm2, 0.75) AS q3_norm2
  FROM n
)
SELECT q.n, q.q1_norm2, q.q3_norm2,
       CAST(count(*) FILTER (
         2 * n.norm2 < 2 * q1_norm2 - 3 * (q3_norm2 - q1_norm2)
         OR 2 * n.norm2 > 2 * q3_norm2 + 3 * (q3_norm2 - q1_norm2)
       ) AS BIGINT) AS n_outliers
FROM q, n
GROUP BY 1, 2, 3
"""
