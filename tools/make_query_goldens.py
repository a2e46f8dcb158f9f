"""Generate committed golden-parquet oracles for queries whose semantics
SQL cannot recompute (image decode, HLL sketches, IVF probing, snap/tile
kernels). The driver's oracle_sql() for these reads the committed parquet
back (``SELECT * FROM read_parquet(...)``), so the correctness gate pins
row counts, schema and values at sf0.01.

Two golden classes (documented per query in GOLDEN_QUERIES):
- independent: recomputed here by a brute-force reference that shares no
  code path with the distributed pipeline's BLOCKING/shuffle logic (e.g.
  all-pairs hamming for simhash_neardup — the 4x16 band pigeonhole makes
  LSH recall exact, so brute force must equal the pipeline bit-for-bit);
- regression-pin: the pipeline's own sf0.01 output, committed (for
  compositions whose kernels are already golden/pytest-pinned elsewhere;
  catches any future drift).

Usage: python tools/make_query_goldens.py [name ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden_queries",
)

# queries whose golden is the pipeline's own committed sf0.01 output
REGRESSION_PIN = [
    "snap_regions",
    "tilecut_z13",
    "vector_tilecut",
    "ivf_topk",
    "approx_distinct",
    "image_stats",
    "image_embed_neardup",
    "curate_documents",
    "curate_images",
    "image_resize",
    "quantiles_quality",
    "audio_features",
    "s2_cells",
    # kmeans fit is pinned vs a numpy Lloyd reference in pytest; the
    # committed parquet catches drift in the distributed partial/reduce
    "kmeans",
    "semantic_dedup",
    "curate_audio",
    # ADC/PQ is approximate by design; recall vs brute force is pinned in
    # pytest, the golden pins the deterministic output
    "pq_topk",
    "image_augment",
    "range_partition_orders",
    "snap_deadletter",
    "video_frames",
    # VW kernel invariants (no self-intersection, vertex subset, area
    # bounds) are pytest-pinned in test_simplify.py; golden pins geometry
    "simplify_shapes",
    # decode kernel pinned by PSNR/image tests; PIP membership by the
    # pip_join oracles; golden pins the fused per-region integer sums
    "zonal_stats",
    # marching-squares kernel pinned by shape tests in test_marching.py
    "vectorize_raster",
    # overview rollup is exact-integer; conservation pytest-pinned
    "tile_pyramid",
    # hull kernel pinned by square/collinear pytest
    "region_hulls",
    # full simplify->snap->clip chain; stage kernels separately pinned
    "vector_chain",
]


def golden_simhash_neardup():
    """Independent brute-force reference: all-pairs hamming <= 3 over the
    per-doc simhash64 signatures. The pipeline's 4x16-bit band blocking is
    EXACT by pigeonhole (hamming <= 3 forces at least one identical band),
    so this must match the distributed output exactly."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from texel_ray.stages.dedup import popcount64_np, simhash64_batch

    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ids = np.asarray(docs["doc_id"].to_pylist(), dtype=np.int64)
    sh = simhash64_batch(docs["text"].to_pylist())
    order = np.argsort(ids)
    ids, sh = ids[order], sh[order]
    ia, ib = np.triu_indices(len(ids), k=1)
    dist = popcount64_np(sh[ia] ^ sh[ib])
    keep = dist <= 3
    return pd.DataFrame(
        {
            "id_a": ids[ia[keep]],
            "id_b": ids[ib[keep]],
            "hamming": dist[keep],
        }
    )


def golden_h3_compact():
    """Independent reference for h3_compact: the cell assignment reuses
    the pytest-pinned hexgrid.point_to_cell kernel, but the compact
    itself is a from-scratch set-based loop (dicts + recursion), sharing
    no code with the vectorized numpy hexgrid.compact."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from texel_ray.core import hexgrid
    from texel_ray.core.tms import lonlat_to_webmercator_np
    from texel_ray.sources.images import images_parquet_path

    res = 6
    path = images_parquet_path(SF_DIR)
    t = pq.read_table(path, columns=["lon", "lat"])
    x, y = lonlat_to_webmercator_np(
        t["lon"].to_numpy(zero_copy_only=False),
        t["lat"].to_numpy(zero_copy_only=False),
    )
    ok = np.isfinite(x) & np.isfinite(y)
    q, r = hexgrid.point_to_cell(x[ok], y[ok], res)
    cells = {(res, int(qq), int(rr)) for qq, rr in zip(q, r)}

    for level in range(res, 0, -1):
        groups: dict[tuple, list] = {}
        for c in cells:
            if c[0] != level:
                continue
            pq_, pr_ = hexgrid.parent(np.array([c[1]]), np.array([c[2]]))
            groups.setdefault((level - 1, int(pq_[0]), int(pr_[0])), []).append(c)
        for par, kids in groups.items():
            if len(kids) == 7:
                cells.difference_update(kids)
                cells.add(par)

    ids = sorted(
        int(hexgrid.pack(np.array([c[0]]), np.array([c[1]]), np.array([c[2]]))[0])
        for c in cells
    )
    rs = [int(hexgrid.unpack(np.array([i]))[0][0]) for i in ids]
    return pd.DataFrame({"cell": np.array(ids, dtype=np.int64), "res": np.array(rs, dtype=np.int32)})


def golden_dbscan():
    """Independent reference: single-node chunked brute-force DBSCAN
    (tests/golden_util.brute_dbscan — no shared code with the
    distributed cell decomposition), same deterministic border rule."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from tests.golden_util import brute_dbscan
    from texel_ray.sources.images import images_parquet_path

    t = pq.read_table(
        images_parquet_path(SF_DIR), columns=["image_id", "lon", "lat"]
    )
    out = brute_dbscan(
        np.asarray(t["image_id"].to_pylist()),
        t["lon"].to_numpy(zero_copy_only=False),
        t["lat"].to_numpy(zero_copy_only=False),
        eps=0.01,
        min_pts=10,
    )
    items = sorted(out.items())
    return pd.DataFrame(
        {"image_id": [k for k, _ in items], "cluster": [v for _, v in items]}
    )


INDEPENDENT = {
    "simhash_neardup": golden_simhash_neardup,
    "h3_compact": golden_h3_compact,
    "dbscan": golden_dbscan,
}


def main() -> int:
    names = sys.argv[1:] or (REGRESSION_PIN + list(INDEPENDENT))
    os.makedirs(OUT_DIR, exist_ok=True)

    import warnings

    warnings.filterwarnings("ignore")
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    ray.init(
        address="local", num_cpus=16, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    for name in names:
        if name in INDEPENDENT:
            df = INDEPENDENT[name]()
            kind = "independent"
        else:
            result = queries[name](SF_DIR)
            df = result if isinstance(result, pd.DataFrame) else result.to_pandas()
            kind = "regression-pin"
        df = df.sort_values(list(sorted(df.columns))).reset_index(drop=True)
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
        print(f"{name}: {len(df)} rows -> {path} ({kind})")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
