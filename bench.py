"""Benchmark harness.

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "tiles_per_sec": ..., "joined_rows_per_sec": ...}

`--scaling` runs the headline pipeline twice in fresh processes
(num_cpus=8 then 32) on the same input and reports both throughputs and
the scaling efficiency (see BASELINE.md).

Input generation (the deterministic synthetic images table) is cached on
disk and excluded from timings; one warm-up read primes the page cache.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_benchmarks() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from texel_ray.pipelines import mlprep, queries, relational, spatial
    from texel_ray.pipelines.flagship import tile_counts
    from texel_ray.pipelines.queries import q_dedup_exact, q_pip_join_rect, q_tile_assign
    from texel_ray.sources.images import ensure_images_for_sf_dir, sf_of_dir

    ensure_images_for_sf_dir(SF_DIR)  # cached generation, not timed

    # warm-up: prime the OS page cache AND Ray's worker/shuffle services so
    # the timed numbers measure steady-state compute + exchange, not the
    # one-time actor/worker spin-up the first query would otherwise absorb
    # (~2-5s; documented cold-start band in BASELINE.md)
    import pyarrow.parquet as pq

    from texel_ray.sources.images import images_parquet_path

    pq.read_table(images_parquet_path(SF_DIR), columns=["image_id"])
    q_tile_assign(SF_DIR, 4).to_pandas()  # not timed

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn, consume="to_pandas"):
        t0 = time.perf_counter()
        result = fn()
        if consume == "to_pandas" and hasattr(result, "to_pandas"):
            result = result.to_pandas()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        return result, dt

    # headline: fused spatial join + raster tile cutting + rollup
    from texel_ray.pipelines.flagship import full_pipeline_fused

    df, headline_sec = timed(
        "fused_join_cut_rollup", lambda: full_pipeline_fused(SF_DIR)
    )
    n_tiles = len(df)
    pieces = int(df["n_pieces"].sum())
    extras["tiles_per_sec"] = round(n_tiles / headline_sec, 1)
    extras["joined_rows_per_sec"] = round(pieces / headline_sec, 1)
    timed("flagship_tile_counts", lambda: tile_counts(SF_DIR))

    timed("tile_assign_z8", lambda: q_tile_assign(SF_DIR, 8))
    timed("pip_join_rect", lambda: q_pip_join_rect(SF_DIR))
    timed(
        "pip_join_cover",
        lambda: queries.q_pip_join_cover(SF_DIR, num_partitions=16),
    )
    timed("pip_join_manyrect", lambda: queries.q_pip_join_manyrect(SF_DIR))
    timed("rasterize_regions", lambda: queries.q_rasterize_regions(SF_DIR))
    timed("dedup_exact", lambda: q_dedup_exact(SF_DIR))
    timed("tilecut_z13", lambda: spatial.q_tilecut(SF_DIR))
    timed("snap_regions", lambda: spatial.q_snap_regions(SF_DIR))
    timed("snap_throughput_x40", lambda: spatial.snap_throughput(SF_DIR))
    timed("minhash_neardup", lambda: mlprep.q_minhash_neardup(SF_DIR))
    timed("simhash_neardup", lambda: mlprep.q_simhash_neardup(SF_DIR))
    timed("knn_all", lambda: mlprep.q_knn_all(SF_DIR))
    timed("ann_topk", lambda: mlprep.q_ann_topk(SF_DIR))
    timed("s2_cells", lambda: mlprep.q_s2_cells(SF_DIR))
    timed("hex_cells", lambda: mlprep.q_hex_cells(SF_DIR))
    timed("h3_cells", lambda: mlprep.q_h3_cells(SF_DIR))
    timed("h3_kring", lambda: mlprep.q_h3_kring(SF_DIR))
    timed("geohash_cells", lambda: mlprep.q_geohash_cells(SF_DIR))
    timed("idw_grid", lambda: mlprep.q_idw_grid(SF_DIR))
    timed("knn_nearest", lambda: mlprep.q_knn_nearest(SF_DIR))
    timed("dbscan", lambda: mlprep.q_dbscan(SF_DIR))
    timed("simplify_shapes", lambda: spatial.q_simplify_shapes(SF_DIR))
    timed("tile_pyramid", lambda: mlprep.q_tile_pyramid(SF_DIR))
    timed("heavy_hitters", lambda: mlprep.q_heavy_hitters(SF_DIR))
    timed("pack_sequences", lambda: mlprep.q_pack_sequences(SF_DIR))
    timed("quantiles_quality", lambda: mlprep.q_quantiles_quality(SF_DIR))
    timed("audio_features", lambda: mlprep.q_audio_features(SF_DIR))
    timed("tfidf", lambda: mlprep.q_tfidf(SF_DIR))
    timed("kmeans", lambda: mlprep.q_kmeans(SF_DIR))
    timed("semantic_dedup", lambda: mlprep.q_semantic_dedup(SF_DIR))
    # the heaviest image/raster pipelines (ADVICE r2 #7: previously
    # unbenched, so perf regressions there were invisible)
    from texel_ray.pipelines import curate

    timed("zonal_stats", lambda: mlprep.q_zonal_stats(SF_DIR))
    timed("vectorize_raster", lambda: mlprep.q_vectorize_raster(SF_DIR))
    timed("image_embed_neardup", lambda: mlprep.q_image_embed_neardup(SF_DIR))
    timed("curate_images", lambda: curate.curate_images(SF_DIR))
    timed("dedup_clusters_dist", lambda: mlprep.q_dedup_clusters_dist(SF_DIR))
    timed("range_join", lambda: relational.q_range_join(SF_DIR))
    timed("agg_pricing", lambda: relational.q_agg_pricing(SF_DIR))
    timed("tumbling_events", lambda: relational.q_tumbling_events(SF_DIR))
    timed("od_flows", lambda: relational.q_od_flows(SF_DIR))
    timed("traj_segments", lambda: relational.q_traj_segments(SF_DIR))
    timed("region_coviz", lambda: relational.q_region_coviz(SF_DIR))
    timed("geo_phash_neardup", lambda: mlprep.q_geo_phash_neardup(SF_DIR))
    timed("source_mix", lambda: mlprep.q_source_mix(SF_DIR))
    from texel_ray.pipelines.queries import q_tile_invalidation

    timed("tile_invalidation", lambda: q_tile_invalidation(SF_DIR))
    timed("kcenter_sample", lambda: mlprep.q_kcenter_sample(SF_DIR), consume=None)
    timed("substring_dedup", lambda: mlprep.q_substring_dedup(SF_DIR))
    timed("ngram_quality", lambda: mlprep.q_ngram_quality(SF_DIR))
    from texel_ray.pipelines.queries import q_tile_focal_sum

    timed("tile_focal_sum", lambda: q_tile_focal_sum(SF_DIR))
    from texel_ray.pipelines.queries import q_morans_i

    timed("morans_i", lambda: q_morans_i(SF_DIR), consume=None)
    from texel_ray.pipelines.queries import q_dissolve_regions

    timed("dissolve_regions", lambda: q_dissolve_regions(SF_DIR), consume=None)
    timed(
        "dist_join_events",
        lambda: relational.q_dist_join_events(SF_DIR),
        consume=None,
    )
    timed("pca_scatter", lambda: mlprep.q_pca_scatter(SF_DIR))
    from texel_ray.pipelines.queries import q_hotspots_gi

    timed("hotspots_gi", lambda: q_hotspots_gi(SF_DIR), consume=None)
    timed("traj_edge_match", lambda: relational.q_traj_edge_match(SF_DIR))
    timed("late_events", lambda: relational.q_late_events(SF_DIR))
    timed("topk_per_group", lambda: relational.q_topk_per_group(SF_DIR))
    timed("region_buffer", lambda: mlprep.q_region_buffer(SF_DIR))
    timed("tile_atlas", lambda: spatial.q_tile_atlas(SF_DIR))
    timed("value_drift", lambda: relational.q_value_drift(SF_DIR), consume=None)
    timed("name_linkage", lambda: relational.q_name_linkage(SF_DIR), consume=None)
    timed("windowed_on_time", lambda: relational.q_windowed_on_time(SF_DIR))
    timed("validate_corpus", lambda: mlprep.q_validate_corpus(SF_DIR))
    timed("trip_length", lambda: relational.q_trip_length(SF_DIR))
    timed("sessionize", lambda: relational.q_sessionize(SF_DIR))
    timed("asof_join", lambda: relational.q_asof_join(SF_DIR))
    timed("window_join_events", lambda: relational.q_window_join_events(SF_DIR))
    timed("event_transitions", lambda: relational.q_event_transitions(SF_DIR))
    timed("image_transcode", lambda: relational.q_image_transcode(SF_DIR))
    timed("spatial_block_split", lambda: queries.q_spatial_block_split(SF_DIR))
    timed("upsert_latest", lambda: relational.q_upsert_latest(SF_DIR))
    timed("grouped_median", lambda: relational.q_grouped_median(SF_DIR))
    timed("funnel_conversion", lambda: relational.q_funnel_conversion(SF_DIR))
    timed("cohort_retention", lambda: relational.q_cohort_retention(SF_DIR))
    timed("skyline_events", lambda: relational.q_skyline_events(SF_DIR))
    timed("contour_segments", lambda: queries.q_contour_segments(SF_DIR))
    timed("variogram_tiles", lambda: queries.q_variogram_tiles(SF_DIR))
    timed("pagerank_tiles", lambda: queries.q_pagerank_tiles(SF_DIR))
    timed("tile_gradient", lambda: queries.q_tile_gradient(SF_DIR))
    timed("tile_bfs_dist", lambda: queries.q_tile_bfs_dist(SF_DIR))
    timed("gini_tiles", lambda: queries.q_gini_tiles(SF_DIR))
    timed("grouped_mode", lambda: relational.q_grouped_mode(SF_DIR))
    timed("tile_trend", lambda: relational.q_tile_trend(SF_DIR))
    timed("spearman_tiles", lambda: queries.q_spearman_tiles(SF_DIR))
    timed("tile_cost_dist", lambda: queries.q_tile_cost_dist(SF_DIR))
    timed("chi2_assoc", lambda: relational.q_chi2_assoc(SF_DIR))
    timed("changepoint_days", lambda: relational.q_changepoint_days(SF_DIR))
    timed("acf_daily", lambda: relational.q_acf_daily(SF_DIR))
    timed("mannwhitney_u", lambda: relational.q_mannwhitney_u(SF_DIR))
    timed("ks_stat", lambda: relational.q_ks_stat(SF_DIR))
    timed("theil_sen_daily", lambda: relational.q_theil_sen_daily(SF_DIR))
    timed("agg_rollup", lambda: relational.q_agg_rollup(SF_DIR))
    timed("image_edges", lambda: mlprep.q_image_edges(SF_DIR))
    timed("quadtree_agg", lambda: queries.q_quadtree_agg(SF_DIR))
    timed("raster_blobs", lambda: queries.q_raster_blobs(SF_DIR))
    timed("allpairs_jaccard", lambda: mlprep.q_allpairs_jaccard(SF_DIR))
    timed("containment_join", lambda: mlprep.q_containment_join(SF_DIR))
    timed("hilbert_order", lambda: queries.q_hilbert_order(SF_DIR))
    timed("dwell_time", lambda: relational.q_dwell_time(SF_DIR))
    timed("border_crossings", lambda: relational.q_border_crossings(SF_DIR))
    timed("spatial_downsample", lambda: queries.q_spatial_downsample(SF_DIR))
    timed("video_scene_cuts", lambda: mlprep.q_video_scene_cuts(SF_DIR))
    timed("tpch_q3", lambda: relational.q_tpch_q3(SF_DIR), consume=None)
    timed("gap_fill_daily", lambda: relational.q_gap_fill_daily(SF_DIR), consume=None)
    timed("s2_compact", lambda: mlprep.q_s2_compact(SF_DIR), consume=None)
    timed("region_centroid", lambda: queries.q_region_centroid(SF_DIR))
    timed("new_users_daily", lambda: relational.q_new_users_daily(SF_DIR))
    timed("rolling_wau", lambda: relational.q_rolling_wau(SF_DIR))
    timed("voronoi_assign", lambda: relational.q_voronoi_assign(SF_DIR))
    timed("shard_zonemap", lambda: queries.q_shard_zonemap(SF_DIR))
    timed("segment_traffic", lambda: relational.q_segment_traffic(SF_DIR))
    timed("abandoned_clicks", lambda: relational.q_abandoned_clicks(SF_DIR))
    timed("iou_footprint_join", lambda: queries.q_iou_footprint_join(SF_DIR))
    timed("ab_test_counts", lambda: relational.q_ab_test_counts(SF_DIR))
    timed("bilinear_upsample", lambda: queries.q_bilinear_upsample(SF_DIR))
    timed("fulfillment_lag", lambda: relational.q_fulfillment_lag(SF_DIR))
    timed("ripley_pairs", lambda: queries.q_ripley_pairs(SF_DIR), consume=None)
    timed("impossible_travel", lambda: relational.q_impossible_travel(SF_DIR))
    timed("embedding_quantization", lambda: mlprep.q_embedding_quantization(SF_DIR))
    timed("home_location", lambda: relational.q_home_location(SF_DIR))
    timed("doc_keywords", lambda: mlprep.q_doc_keywords(SF_DIR))
    timed("tile_diversity", lambda: relational.q_tile_diversity(SF_DIR))
    timed("tpch_q10", lambda: relational.q_tpch_q10(SF_DIR), consume=None)
    timed("conversion_latency", lambda: relational.q_conversion_latency(SF_DIR))
    timed("phash_bit_stats", lambda: mlprep.q_phash_bit_stats(SF_DIR))
    timed("nearest_region_dist", lambda: queries.q_nearest_region_dist(SF_DIR))
    timed("caption_size_corr", lambda: queries.q_caption_size_corr(SF_DIR))
    timed("weekday_mix", lambda: relational.q_weekday_mix(SF_DIR))
    timed("user_locality_depth", lambda: relational.q_user_locality_depth(SF_DIR))
    timed("tile_activity_span", lambda: relational.q_tile_activity_span(SF_DIR))
    timed("type_cooccurrence", lambda: relational.q_type_cooccurrence(SF_DIR))
    timed("zipf_head", lambda: mlprep.q_zipf_head(SF_DIR), consume=None)
    timed("region_knn_images", lambda: queries.q_region_knn_images(SF_DIR), consume=None)
    timed("word_burstiness", lambda: mlprep.q_word_burstiness(SF_DIR))
    timed("novelty_curve", lambda: mlprep.q_novelty_curve(SF_DIR))
    timed("activity_heatmap", lambda: relational.q_activity_heatmap(SF_DIR))
    timed("max_concurrency", lambda: relational.q_max_concurrency(SF_DIR))
    timed("interval_union_len", lambda: relational.q_interval_union_len(SF_DIR))
    timed("triangle_regions", lambda: relational.q_triangle_regions(SF_DIR))
    timed("benford_digits", lambda: relational.q_benford_digits(SF_DIR))
    timed("grouped_mad", lambda: relational.q_grouped_mad(SF_DIR))
    timed("trimmed_mean", lambda: relational.q_trimmed_mean(SF_DIR))
    timed("shard_assign", lambda: relational.q_shard_assign(SF_DIR))
    timed("k_anon_tiles", lambda: relational.q_k_anon_tiles(SF_DIR))
    timed("embedding_dim_stats", lambda: mlprep.q_embedding_dim_stats(SF_DIR))
    timed("ntile_buckets", lambda: relational.q_ntile_buckets(SF_DIR))
    timed("cross_corr_daily", lambda: relational.q_cross_corr_daily(SF_DIR))
    timed("weighted_quantile", lambda: relational.q_weighted_quantile(SF_DIR))
    timed("importance_sample", lambda: mlprep.q_importance_sample(SF_DIR))
    timed("image_histogram", lambda: mlprep.q_image_histogram(SF_DIR))
    timed("image_equalize", lambda: mlprep.q_image_equalize(SF_DIR))
    timed("kde_heatmap", lambda: mlprep.q_kde_heatmap(SF_DIR))
    timed("map_match_edges", lambda: mlprep.q_map_match_edges(SF_DIR))
    from texel_ray.pipelines.queries import q_poly_intersect_join

    timed("poly_intersect_join", lambda: q_poly_intersect_join(SF_DIR))
    timed("full_outer_hours", lambda: relational.q_full_outer_hours(SF_DIR))
    timed("semi_join_orders", lambda: relational.q_semi_join_orders(SF_DIR))
    timed("ewma_daily", lambda: relational.q_ewma_daily(SF_DIR), consume=None)
    timed("activity_streaks", lambda: relational.q_activity_streaks(SF_DIR))
    timed("churned_users", lambda: relational.q_churned_users(SF_DIR))
    timed("iqr_outliers", lambda: relational.q_iqr_outliers(SF_DIR))
    timed("flow_basins", lambda: queries.q_flow_basins(SF_DIR))
    timed("image_progressive", lambda: relational.q_image_progressive(SF_DIR))
    timed("last_touch_attribution", lambda: relational.q_last_touch_attribution(SF_DIR))
    timed("pareto_tiles", lambda: relational.q_pareto_tiles(SF_DIR), consume=None)
    timed("moving_avg_daily", lambda: relational.q_moving_avg_daily(SF_DIR))
    timed("scd2_intervals", lambda: relational.q_scd2_intervals(SF_DIR))
    timed("top2_gap_tiles", lambda: relational.q_top2_gap_tiles(SF_DIR))
    timed("image_bmp_roundtrip", lambda: relational.q_image_bmp_roundtrip(SF_DIR))
    timed("grid_crosstab", lambda: relational.q_grid_crosstab(SF_DIR))
    timed("robust_zscore_days", lambda: relational.q_robust_zscore_days(SF_DIR), consume=None)
    timed("rfm_segments", lambda: relational.q_rfm_segments(SF_DIR))
    timed("tpch_q5", lambda: relational.q_tpch_q5(SF_DIR))
    timed("percent_of_parent_tiles", lambda: relational.q_percent_of_parent_tiles(SF_DIR))
    timed("word_cooccurrence", lambda: mlprep.q_word_cooccurrence(SF_DIR))
    timed("order_fanout_dist", lambda: relational.q_order_fanout_dist(SF_DIR))
    timed("user_day_percentiles", lambda: relational.q_user_day_percentiles(SF_DIR), consume=None)
    timed("path_motifs", lambda: relational.q_path_motifs(SF_DIR))
    timed("bucket_skew_report", lambda: relational.q_bucket_skew_report(SF_DIR))
    timed("embedding_norm_outliers", lambda: mlprep.q_embedding_norm_outliers(SF_DIR), consume=None)

    def _shuffle():
        import pyarrow as _pa

        from texel_ray.sources.images import read_images

        # push-based shuffle wins for the raw exchange (44s -> 8s) but
        # loses for sort-aggregates, so scope it to this entry only
        prev = ctx.shuffle_strategy
        ctx.shuffle_strategy = "sort_shuffle_push_based"
        try:
            # the map after the shuffle forces the exchange to materialize
            return (
                read_images(SF_DIR, columns=["image_id", "bytes"])
                .random_shuffle(seed=42)
                .map_batches(
                    lambda b: _pa.table({"n": [b.num_rows]}), batch_format="pyarrow"
                )
                .count()
            )
        finally:
            ctx.shuffle_strategy = prev

    timed("random_shuffle_payload", _shuffle, consume=None)

    ray.shutdown()
    return {
        "metric": "tiles/sec + joined rows/sec on the synthetic image+caption table",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_of_dir(SF_DIR),
        "num_cpus": NUM_CPUS,
        **extras,
    }


def run_scaling() -> dict:
    """Same headline job at two parallelism levels in fresh processes."""

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_HEADLINE_ONLY="1")
        out = subprocess.run(
            [sys.executable, __file__],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    # single-shot efficiency on this shared VM swings +-40% with
    # co-tenant load (judge r3 measured 0.661 and 1.177 back to back),
    # so sample interleaved lo/hi pairs and report the MEDIAN, plus the
    # 1-min load average around each sample for interpretability
    n_samples = int(os.environ.get("BENCH_SCALING_SAMPLES", "3"))
    samples = []
    for _ in range(n_samples):
        load_before = os.getloadavg()[0]
        r_lo = one(lo)
        r_hi = one(hi)
        load_after = os.getloadavg()[0]
        samples.append(
            {
                "sec_8": r_lo["value"],
                "sec_32": r_hi["value"],
                "throughput_8_rows_per_sec": r_lo["joined_rows_per_sec"],
                "throughput_32_rows_per_sec": r_hi["joined_rows_per_sec"],
                "efficiency": round(
                    (r_lo["value"] / r_hi["value"]) / (hi / lo), 3
                ),
                "load_avg_1m": [round(load_before, 2), round(load_after, 2)],
            }
        )
    effs = sorted(s["efficiency"] for s in samples)
    median_eff = effs[len(effs) // 2] if n_samples % 2 else round(
        (effs[n_samples // 2 - 1] + effs[n_samples // 2]) / 2, 3
    )
    return {
        "metric": "scaling efficiency (32 vs 8 cpus, same input)",
        "samples": samples,
        "median_efficiency": median_eff,
        "scaling_efficiency": median_eff,
        "load_avg": round(os.getloadavg()[0], 2),
        "sec_8": samples[-1]["sec_8"],
        "sec_32": samples[-1]["sec_32"],
    }


def run_headline_only() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    import pyarrow.parquet as pq

    from texel_ray.pipelines.flagship import full_pipeline_fused
    from texel_ray.sources.images import (
        ensure_images_for_sf_dir,
        images_parquet_path,
        sf_of_dir,
    )

    ensure_images_for_sf_dir(SF_DIR)
    pq.read_table(images_parquet_path(SF_DIR), columns=["image_id"])
    epochs = int(os.environ.get("BENCH_EPOCHS", "3"))
    t0 = time.perf_counter()
    df = full_pipeline_fused(SF_DIR, epochs=epochs).to_pandas()
    dt = time.perf_counter() - t0
    pieces = int(df["n_pieces"].sum())
    ray.shutdown()
    return {
        "metric": "fused join+cut+rollup headline",
        "value": round(dt, 3),
        "unit": "sec",
        "sf": sf_of_dir(SF_DIR),
        "num_cpus": NUM_CPUS,
        "epochs": epochs,
        "tiles_per_sec": round(len(df) / dt, 1),
        "joined_rows_per_sec": round(pieces / dt, 1),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif os.environ.get("BENCH_HEADLINE_ONLY"):
        print(json.dumps(run_headline_only()))
    else:
        print(json.dumps(run_benchmarks()))
