"""Driver-window registry: build_queries (curated insertion order) and
build_oracle_sql (composed from the two oracle parts)."""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd

from gridfia_ray import fixtures
from gridfia_ray.io import read_parquet_clean
from gridfia_ray.kernels.base import KernelContext
from gridfia_ray.kernels.registry import registry
from gridfia_ray.pipelines.common import GridSpec
from gridfia_ray.contract._shared import *  # noqa: F401,F403
from gridfia_ray.contract.gf_focal import *  # noqa: F401,F403
from gridfia_ray.contract.gf_terrain import *  # noqa: F401,F403
from gridfia_ray.contract.gf_zonal import *  # noqa: F401,F403
from gridfia_ray.contract.gf_store import *  # noqa: F401,F403
from gridfia_ray.contract.mm import *  # noqa: F401,F403
from gridfia_ray.contract.docs import *  # noqa: F401,F403
from gridfia_ray.contract.emb import *  # noqa: F401,F403
from gridfia_ray.contract.rel import *  # noqa: F401,F403
from gridfia_ray.contract.events import *  # noqa: F401,F403
from gridfia_ray.contract.graph import *  # noqa: F401,F403
from gridfia_ray.contract._oracles_a import add_oracles_a
from gridfia_ray.contract._oracles_b import add_oracles_b


def build_queries() -> dict[str, Callable[[str], pd.DataFrame]]:
    """Insertion order is CURATED for the driver's 50-row recording
    window (round-3 VERDICT #1): the first 50 entries are all
    oracle-backed and span every operator family in SURVEY.md §2 plus
    the LLM-data-plane families — raster metric kernels (unscaled +
    scaled-integer + the global two-phase dominance), global species
    stats, zonal stats/species/percentiles, overview pyramid, focal map
    algebra, the 4-sink raster roundtrip,
    the lossy JPEG decode pool, WAV audio features, multimodal tile
    features, warp + percentile sketch with pinned-parquet oracles,
    bbox window, spatial join, kNN-IDW, tile exact/near dedup, Moran's
    I, local autocorrelation (LISA local Moran + Getis-Ord Gi* hot
    spots), L1 proximity distance transform, per-pixel temporal trend,
    store lifecycle (zarr-cube migration ingest), State Plane CRS
    EPSG vectors, large*large shuffle join, semi join, ROLLUP, as-of +
    interval joins, tumbling windows, funnels, running window
    functions, seeded bootstrap/permutation resampling, MinHash-LSH and
    IVF pinned sequential replays, ANN brute top-k, doc dedup exact/
    incremental/verified/clusters, n-gram decontamination, the one-shot
    filter chain AND the resumable sharded corpus build, corpus mixing,
    sequence packing, language ID, quality, and sketch-verified heavy
    hitters. Entries 51+ are family siblings already represented in
    the window (remaining per-pixel kernels, zonal species breakdown,
    the percentile sketch, the CSV/NDJSON text roundtrips, MJPEG video
    frame sampling, hopping windows, anti
    join, broadcast chains, focal gradient, paragraph/near-incremental
    dedup, splits, token stats, the remaining pinned twins) plus the
    seven rows-only sf-table variants of the heuristic ops, which carry
    pytest oracles and pinned twins instead.

    Late-round-4 window swaps (each displaced entry's family keeps
    another in-window representative, and all displaced entries stay
    fully verified by the complete contract run): gf_getis_gstar →
    graph_pagerank (new graph-analytics family), gf_zonal_percentiles →
    doc_lm_perplexity (LM quality scoring), events_resampling →
    doc_tfidf_topk (retrieval), events_running_totals →
    bpe_train_pinned (tokenizer training), gf_tile_features →
    gf_contour_cells (raster→vector contours), gf_tile_near_dup →
    gf_watershed (new hydrology family; tile dedup keeps
    gf_tile_dedup_exact in-window); doc_tfidf_topk → doc_hybrid_rrf
    (the retrieval slot now carries BM25 + quantized-MIPS + RRF fusion
    in one integer-exact query; tfidf stays a verified sibling);
    gf_shannon → doc_substr_dedup (ExactSubstr span dedup — new dedup
    technique; the pixel-metric family keeps gf_richness in-window and
    shannon stays a verified sibling); gf_local_moran →
    gf_cost_distance (new weighted-geodesic family with the Dijkstra
    pin; autocorrelation keeps gf_morans_i in-window); doc_dup_verified
    moved to the sibling list (the dedup family holds exact +
    incremental + substr in-window; the n-gram-Jaccard PPJoin query
    stays fully verified) — this also fixes a silent off-by-one that
    had left the 51-entry "window" cutting doc_heavy_tokens out of the
    driver's recorded 50.

    Round-4 continuation swaps (same rule — every displaced family
    keeps an in-window representative): gf_distance_transform →
    gf_kriging (new geostatistics family: variogram-model OK solve;
    proximity keeps gf_cost_distance), rel_urgent_customers →
    rel_nation_volume (Q7-shaped 6-table join over the co-bucketed
    attach; the semi-join family keeps rel_bloom_join), doc_mix →
    gf_fill_sinks (new hydrologic-conditioning family: Planchon-
    Darboux supersteps; corpus build keeps filter_chain +
    corpus_build), doc_pack → emb_kcenter (new diversity-selection
    family: farthest-first coreset). gf_viewshed, gf_flow_filled,
    rel_market_share and events_transitions enter as fully-verified
    siblings of in-window families.

    Round-5 swaps (hostile-driver-budget hardening — CORRECTNESS_r04
    came back empty, so the window is re-curated for wall-time: every
    entry must run in <5 s at num_cpus=8 and the whole 50-query window
    in well under two minutes cold; scripts/driver_sim.py proves the
    budget per commit): bpe_train_pinned → bpe_tokenize_pinned (the
    tokenizer family keeps a pinned rank-exact twin; the 20 s training
    loop stays a verified sibling), doc_minhash_pinned →
    doc_simhash_pinned (near-dup-hashing family keeps a pinned twin at
    half the cost), gf_fill_sinks → video_frames (hydrology keeps
    gf_watershed in-window; the MJPEG frame-sampling family enters)."""
    qs: dict[str, Callable[[str], pd.DataFrame]] = {
        # --- driver window (50): one green row per operator family ---
        # raster metric kernels (M1-M15)
        "gf_richness": _pixel_metric_query("species_richness", "richness", scaled=False),
        "doc_substr_dedup": q_doc_substr_dedup,
        # global / zonal / raster ops
        "gf_species_dominance": q_species_dominance,
        "gf_occurrence_stats": q_occurrence_stats,
        "gf_zonal_stats": q_zonal_stats,
        "doc_lm_perplexity": q_doc_lm_perplexity,
        "gf_downsample_2x": q_downsample_2x,
        "gf_focal_sum": q_focal_sum_3x3,
        # sinks / codecs / multimodal stages
        "gf_raster_roundtrip": q_raster_roundtrip,
        "gf_jpeg_decode": q_jpeg_decode,
        "audio_features": q_audio_features,
        "gf_contour_cells": q_contour_cells,
        # geo ops / joins / dedup / stats / lifecycle
        "gf_warp_mercator": q_warp_mercator,
        "gf_bbox_extract": q_bbox_extract,
        "gf_tile_zone_join": q_tile_zone_join,
        "gf_knn_idw": q_knn_idw,
        "gf_tile_dedup_exact": q_tile_dedup_exact,
        "gf_watershed": q_watershed,
        "gf_morans_i": q_morans_i,
        "gf_cost_distance": q_cost_distance,
        "graph_pagerank": q_graph_pagerank,
        "gf_kriging": q_gf_kriging,
        "gf_temporal_trend": q_temporal_trend,
        "gf_percentiles_exact": q_percentiles_exact,
        "gf_tile_catalog": q_tile_catalog,
        "gf_ingest_cube": q_ingest_cube,
        "gf_stateplane_vectors": q_stateplane_vectors,
        # relational / windowed / temporal joins / resampling
        "rel_priority_lines": q_rel_priority_lines,
        "rel_bloom_join": q_rel_bloom_join,
        "rel_nation_volume": q_rel_nation_volume,
        "rel_rollup_pricing": q_rel_rollup_pricing,
        "events_asof_join": q_events_asof_join,
        "events_error_window_join": q_events_error_window_join,
        "rel_ntile_orders": q_rel_ntile_orders,
        "events_funnel": q_events_funnel,
        "bpe_tokenize_pinned": q_bpe_tokenize_pinned,
        "doc_hybrid_rrf": q_doc_hybrid_rrf,
        # document dedup / decontamination / corpus build / packing
        "doc_simhash_pinned": q_doc_simhash_pinned,
        "ann_ivf_pinned": q_ann_ivf_pinned,
        "emb_gram": q_emb_gram,
        "doc_dedup_exact": q_doc_dedup_exact,
        "doc_dedup_incremental": q_doc_dedup_incremental,
        "doc_decontaminate_ngram": q_doc_decontaminate_ngram,
        "doc_filter_chain": q_doc_filter_chain,
        "doc_corpus_build": q_corpus_build,
        "video_frames": q_video_frames,
        "emb_kcenter": q_emb_kcenter,
        # text analysis / sketches
        "doc_langid": q_doc_langid,
        "doc_quality": q_doc_quality,
        "doc_heavy_tokens": q_doc_heavy_tokens,
        # --- beyond the window: family siblings (all still SQL-backed,
        # verified by scripts/check_contract.py every round) ---
        "doc_dup_verified": q_doc_dup_verified,
        "doc_dup_clusters": q_doc_dup_clusters,
        "doc_canonical_dedup": q_doc_canonical_dedup,
        "gf_csv_roundtrip": q_csv_roundtrip,
        "gf_fill_sinks": q_gf_fill_sinks,
        "audio_spectrogram": q_audio_spectrogram,
        "rel_returned_orders": q_rel_returned_orders,
        "rel_small_qty_revenue": q_rel_small_qty_revenue,
        "rel_large_orders": q_rel_large_orders,
        "rel_top_supplier": q_rel_top_supplier,
        "rel_sole_slow_supplier": q_rel_sole_slow_supplier,
        "rel_urgent_customers": q_rel_urgent_customers,
        "rel_market_share": q_rel_market_share,
        "graph_bfs": q_graph_bfs,
        "graph_triangles": q_graph_triangles,
        "gf_zonal_species": q_zonal_species,
        "gf_zonal_majority": q_zonal_majority,
        "gf_zonal_histogram": q_zonal_histogram,
        "gf_zonal_raster_stats": q_zonal_raster_stats,
        "gf_tabulate_area": q_tabulate_area,
        "gf_zonal_geometry": q_zonal_geometry,
        "gf_zone_neighbors": q_zone_neighbors,
        "gf_cooccurrence": q_cooccurrence,
        "events_anomaly": q_events_anomaly,
        "doc_textrank": q_doc_textrank,
        "rel_wealthy_quiet": q_rel_wealthy_quiet,
        "gf_quantile_classes": q_quantile_classes,
        "gf_getis_gstar": q_getis_gstar,
        "gf_zonal_percentiles": q_zonal_percentiles,
        "events_resampling": q_stats_resampling,
        "events_running_totals": q_events_running_totals,
        "gf_tile_features": q_tile_features,
        "gf_percentiles": q_percentiles,
        "rel_cube_orders": q_rel_cube_orders,
        "rel_order_count_dist": q_rel_order_count_dist,
        "ann_topk": q_ann_topk,
        "graph_components": q_graph_components,
        "events_hourly": q_events_hourly,
        "events_gapfill": q_events_gapfill,
        "doc_compress_ratio": q_doc_compress_ratio,
        "doc_outlier_mad": q_doc_outlier_mad,
        "doc_stratified": q_doc_stratified,
        "doc_cdc_pinned": q_doc_cdc_pinned,
        "doc_cdc_dedup_pinned": q_doc_cdc_dedup_pinned,
        "emb_pca_pinned": q_emb_pca_pinned,
        "emb_knn_graph": q_emb_knn_graph,
        "emb_hard_negatives": q_emb_hard_negatives,
        "doc_pack": q_doc_pack,
        "rel_outer_counts": q_rel_outer_counts,
        "rel_except_customers": q_rel_except_customers,
        "rel_pivot_status": q_rel_pivot_status,
        "rel_validate_orders": q_rel_validate_orders,
        "doc_bm25_topk": q_doc_bm25_topk,
        "doc_tfidf_topk": q_doc_tfidf_topk,
        "events_retention": q_events_retention,
        "events_transitions": q_events_transitions,
        "events_top_paths": q_events_top_paths,
        "doc_fertility": q_doc_fertility,
        "rel_correlation": q_rel_correlation,
        "doc_normalize_pinned": q_doc_normalize_pinned,
        "rel_zscore": q_rel_zscore,
        "doc_cdc_dedup_docs": q_doc_cdc_dedup_docs,
        "gf_webp_decode": q_webp_decode,
        "gf_json_roundtrip": q_json_roundtrip,
        "gf_ipc_roundtrip": q_ipc_roundtrip,
        "gf_downsample_4x": q_downsample_4x,
        "gf_downsample_majority": q_downsample_majority,
        "gf_mosaic": q_mosaic,
        "gf_rasterize": q_rasterize,
        "gf_connected_components": q_connected_components,
        "gf_component_sizes": q_component_sizes,
        "gf_component_props": q_component_props,
        "gf_hillshade": q_hillshade,
        "gf_flow_accumulation": q_flow_accumulation,
        "gf_strahler": q_strahler,
        "gf_temporal_composite": q_temporal_composite,
        "gf_change_patches": q_change_patches,
        "gf_distance_transform_l2": q_distance_transform_l2,
        "gf_euclidean_allocation": q_euclidean_allocation,
        "gf_cost_backlink": q_cost_backlink,
        "gf_cost_allocation": q_cost_allocation,
        "gf_cost_paths": q_cost_paths,
        "gf_cost_distance_src": q_cost_distance_src,
        "gf_distance_transform": q_distance_transform,
        "gf_viewshed": q_gf_viewshed,
        "doc_mix": q_doc_mix,
        "gf_flow_filled": q_gf_flow_filled,
        "gf_twi": q_gf_twi,
        "gf_dinf_accumulation": q_gf_dinf_accumulation,
        "gf_flow_length": q_gf_flow_length,
        "gf_clahe": q_gf_clahe,
        "gf_unsharp": q_gf_unsharp,
        "audio_resample": q_audio_resample,
        "gf_local_moran": q_local_moran,
        "gf_geary_c": q_geary_c,
        "gf_semivariogram": q_semivariogram,
        "gf_focal_stats_5x5": q_focal_stats_5x5,
        "gf_tile_near_dup": q_tile_near_dup,
        "gf_sieve": q_sieve,
        "gf_augment_rot90": q_augment_rot90,
        "gf_patchify": q_patchify,
        "gf_warp_bilinear": q_warp_bilinear,
        "gf_focal_tpi": q_focal_tpi,
        "gf_focal_curvature": q_focal_curvature,
        "gf_glcm": q_glcm,
        "gf_raster_calc": q_raster_calc,
        "gf_focal_median": q_focal_median,
        "gf_focal_majority": q_focal_majority,
        "gf_focal_aspect": q_focal_aspect,
        "gf_dominant_species": _pixel_metric_query("dominant_species", "dom_idx", scaled=False),
        "gf_rare_species": _pixel_metric_query(
            "rare_species", "n_rare", scaled=False, params={"occurrence_threshold": 0.05}
        ),
        "gf_simpson": _pixel_metric_query("simpson_diversity", "simpson_u", scaled=True),
        "gf_shannon": _pixel_metric_query("shannon_diversity", "shannon_u", scaled=True),
        "gf_evenness": _pixel_metric_query("evenness", "evenness_u", scaled=True),
        "gf_total_biomass": _pixel_metric_query("total_biomass", "total_u", scaled=True),
        "gf_total_comparison": _pixel_metric_query(
            "total_biomass_comparison", "comparison_u", scaled=True
        ),
        "gf_species_proportion": _pixel_metric_query(
            "species_proportion", "proportion_u", scaled=True, params={"species_code": "0110"}
        ),
        "gf_group_proportion": _pixel_metric_query(
            "species_group_proportion",
            "group_u",
            scaled=True,
            params={"species_codes": list(fixtures.GROUP_CODES)},
        ),
        "gf_biomass_threshold": _pixel_metric_query(
            "biomass_threshold", "above50", scaled=False, params={"threshold": 50.0}
        ),
        "gf_species_presence": _pixel_metric_query(
            "species_presence", "present", scaled=False, params={"species_code": "0131"}
        ),
        "gf_species_percentage": _pixel_metric_query(
            "species_percentage", "percentage_u", scaled=True, params={"species_code": "0110"}
        ),
        "gf_common_species": _pixel_metric_query(
            "common_species", "n_common", scaled=False, params={"occurrence_threshold": 0.5}
        ),
        "gf_coverage_topk": q_coverage_topk,
        "gf_store_validate": q_store_validate,
        "gf_focal_gradient": q_focal_gradient,
        "gf_store_append": q_store_append,
        "gf_store_compact": q_store_compact,
        "events_hopping": q_events_hopping,
        "events_props_sum": q_events_props_sum,
        "rel_pricing_summary": q_rel_pricing_summary,
        "rel_top_customers": q_rel_top_customers,
        "rel_regional_revenue": q_rel_regional_revenue,
        "rel_quiet_customers": q_rel_quiet_customers,
        "gf_tile_resize": q_tile_resize,
        "gf_identify": q_identify,
        "gf_normalize_clip": q_normalize_clip,
        "gf_hist_equalize": q_hist_equalize,
        "gf_hist_match": q_hist_match,
        "events_group_compare": q_events_group_compare,
        "rel_prompt_ship_lines": q_rel_prompt_ship_lines,
        "doc_near_dedup_incremental": q_doc_near_dedup_incremental,
        "doc_para_dedup": q_doc_para_dedup,
        "doc_decontaminate": q_doc_decontaminate,
        "doc_split": q_doc_split,
        "doc_chunks": q_doc_chunks,
        "doc_source_cap": q_doc_source_cap,
        "doc_token_count": q_doc_token_count,
        "doc_token_freq": q_doc_token_freq,
        "doc_top_tokens_by_source": q_doc_top_tokens_by_source,
        "doc_tfidf_topk": q_doc_tfidf_topk,
        "doc_lm_perplexity": q_doc_lm_perplexity,
        "doc_nb_classifier": q_doc_nb_classifier,
        "doc_dsir_weights": q_doc_dsir_weights,
        "doc_chi2_keywords": q_doc_chi2_keywords,
        "doc_winnow": q_doc_winnow,
        "doc_redact": q_doc_redact,
        "gf_s2_aggregate": q_s2_aggregate,
        "gf_job_shannon": q_job_shannon,
        "doc_bpe_tokens": q_doc_bpe_tokens,
        "doc_repetition": q_doc_repetition,
        "doc_langid_ngram": q_doc_langid_ngram,
        "doc_fingerprint": q_doc_fingerprint,
        "events_error_window_banded": q_events_error_window_banded,
        "events_value_quantiles": q_events_value_quantiles,
        "events_top_by_user": q_events_top_by_user,
        "events_daily_uniques": q_events_daily_uniques,
        "events_sessions": q_events_sessions,
        "events_window_dedup": q_events_window_dedup,
        "events_time_to_convert": q_events_time_to_convert,
        "events_sample_per_user": q_events_sample_per_user,
        # pinned sequential-replay twins of the hash/heuristic ops: the
        # same distributed pipelines on deterministic planted corpora,
        # hash-checked against oracle_pins replays (simhash, BPE-tokenize
        # and IVF twins sit inside the driver window above)
        "bpe_train_pinned": q_bpe_train_pinned,
        "doc_minhash_pinned": q_doc_minhash_pinned,
        "doc_hll_pinned": q_doc_hll_pinned,
        "ghll_pinned": q_ghll_pinned,
        "ddq_pinned": q_ddq_pinned,
        "ann_lsh_pinned": q_ann_lsh_pinned,
        "ann_pq_pinned": q_ann_pq_pinned,
        "ann_ivfpq_pinned": q_ann_ivfpq_pinned,
        "emb_semantic_pinned": q_emb_semantic_pinned,
        "emb_near_dup_pinned": q_emb_near_dup_pinned,
        # --- rows-only by design (hash/heuristic ops; pytest oracles) ---
        "doc_vocab_hll": q_doc_vocab_hll,
        "doc_minhash_pairs": q_doc_minhash_pairs,
        "doc_simhash_pairs": q_doc_simhash_pairs,
        "ann_lsh_topk": q_ann_lsh_topk,
        "emb_knn_graph_ivf": q_emb_knn_graph_ivf,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_pq_topk": q_ann_pq_topk,
        "emb_near_dup": q_emb_near_dup,
        "emb_semantic_dedup": q_emb_semantic_dedup,
    }
    return qs


def _prewarm_pins() -> None:
    """Build every pinned-oracle fixture IN PARALLEL as Ray tasks
    before the SQL strings are assembled (driver-budget hardening: a
    cold cache paid ~50 s of sequential single-threaded pin builds
    inside build_oracle_sql; the builders are independent and their
    cache writes are atomic tmp+rename, so concurrent builds are safe
    — worst case a loser discards its copy). No-op when warm (each
    task hits the _COMPLETE marker)."""
    import inspect

    import ray

    from gridfia_ray import fixtures as _fixt
    from gridfia_ray import oracle_pins as _pins

    if not ray.is_initialized():  # plain-python caller: build inline
        return

    @ray.remote(num_cpus=1)
    def _warm(mod_name: str, fn_name: str, args: tuple) -> None:
        import importlib

        getattr(importlib.import_module(mod_name), fn_name)(*args)

    jobs = [
        ("gridfia_ray.fixtures", "ensure_fixture", ("t2",)),
        ("gridfia_ray.fixtures", "ensure_fixture", ("t1",)),
        ("gridfia_ray.fixtures", "ensure_jpeg_fixture", ()),
        ("gridfia_ray.fixtures", "ensure_webp_fixture", ()),
    ]
    for name, fn in inspect.getmembers(_pins, inspect.isfunction):
        if not name.startswith("ensure_"):
            continue
        sig = inspect.signature(fn)
        if all(
            p.default is not inspect.Parameter.empty
            for p in sig.parameters.values()
        ):
            jobs.append(("gridfia_ray.oracle_pins", name, ()))
    # t2 first: several pin builders read the fixture tables
    ray.get(_warm.remote(*jobs[0]))
    ray.get([_warm.remote(*j) for j in jobs[1:]])


def build_oracle_sql() -> dict[str, str]:
    _prewarm_pins()
    f = _fx()
    sql: dict[str, str] = {}
    add_oracles_a(sql, f)
    add_oracles_b(sql, f)
    return sql
