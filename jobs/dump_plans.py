"""Dump formatted physical plans of representative contract queries to
BENCH/PLANS.md — an auditable artifact of the plan-quality claims
(pruned scans, broadcast joins, single exchanges, codegen spans).

Usage: python jobs/dump_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT = [
    "tile_assign",        # E4: map-only ingest + explode, no shuffle
    "zone_image_stats",   # flagship: broadcast PIP + fused pixel leg
    "value_at_coords",    # R12: dedup-first sampling, bytes join last
    "zonal_stats",        # E7: partial+final, pixel bytes never shuffle
    "focal_mosaic",       # halo exchange: strips shuffle, tiles co-partitioned
    "rasterize_burn",     # map-only burn, bytes pruned from scan
    "asof_clicks",        # one-exchange window as-of
    "minhash_lsh_pairs",  # D3: bounded band join
    "equalize",           # two-pass: O(256) LUT + broadcast remap
    "terrain_slope",      # A15: map-only fused Arrow pass (Horn kernel)
    "mosaic_regions",     # A17: seam strips + fragment-graph CC rounds
    "zonal_quantiles",    # A23: histogram partials, O(pairs*values) shuffle
    "cell_rollup",        # A19: aggregates-of-aggregates up the cell tree
    "tfidf_topterms",     # A20: tf/df aggs + term join + window top-k
    "user_sessions",      # A27: one-exchange lag/cumsum/agg sessionization
    "decontaminate",      # A28: broadcast benchmark side, map-only corpus
    "zone_overlap",       # A26: cell-prefiltered pair join, no cross join
    "pagerank_graph",     # A30: checkpointed per-round join + agg
    "image_augment",      # A32: one fused Arrow hop, bytes never emitted
    "region_geometry",    # A33: map-only per-region geometry
    "radius_join",        # A46: cell filter-refine, no cross join
    "str_pack",           # A45: distributed rank, no unpartitioned window
    "geohash_rollup",     # A49: 40-term interleave in one codegen Project
    "image_quality",      # A41: map-only fused Laplacian pass
    "idw_interpolate",    # A52: filter-refine neighbor candidates
    "value_outliers",     # A53: one window exchange reused by the agg
    "flow_direction",     # A58: map-only fused D8 pass
    "curation_pipeline",  # A59: composed gates, no pixel shuffle
    "zonal_frac",         # A89: fractional-coverage zonal, fused partials
    "pii_scan",           # A90: map-side regexp + one group shuffle
    "seq_packing",        # A91: per-source window, no global sort
    "pansharpen",         # A92: map-only fused Brovey pass
    "viewshed",           # A93: map-only fused ray pass
    "stretch",            # A94: per-tile executor sort, no Spark sort
    "url_domains",        # A95: bounded explode + combiner-friendly agg
    "reclassify",         # A96: census Arrow hop + broadcast range join
    "coverage_audit",     # A97: broadcast dim + tiny census LEFT join
    "oov_rate",           # A98: tiny-vocab window + broadcast left join
    "geary_lattice",      # A99: co-located lattice join, two tiny aggs
    "semivariogram",      # A101: filter-refine pair join, slim bin agg
    "kde_heatmap",        # A103: cover-explode x anchor-cell equi-join
    "getis_ord",          # A104: co-located lattice join + 2-scalar bcast
    "hough_lines",        # A106: map-only composite-bincount vote pass
    "watershed",          # A107: map-only pointer-jumping pass
    "gorilla_size",       # R3b: one window shuffle, codegen CASE ladder
    "hll_registers",      # R3b: map-only hash + 64-group partial+final
    "mst_boruvka",        # R3b: per-round min-struct agg + star contraction
    "k_truss",            # R3b: oriented triangle join + support filter
    "bellman_ford",       # R3b: per-round edge relax join + groupBy min
    "merkle_cells",       # R3b: one Arrow decode + sorted md5 folds
    "pip_raycast",        # R3b: broadcast edges + parity groupBy
    "lpm_route",          # R3b: broadcast CIDR table + struct argmax
    "poisson_bootstrap",  # R3b: map-only multiplicity + 8-group agg
    "route_burn",         # A108: broadcast waypoint join + codegen DDA
    "bm25_topk",          # A111: partial+final aggs + TakeOrdered
    "semdedup",           # A112: IVF-cell groupBy applyInPandas GEMM
    "ann_ivfpq",          # A114: bucket-pruned compressed-domain scan
    "kmeans_embed",       # A115: map-only assign + K-row driver update
    "dedup_components_star",  # A116: star-contraction CC rounds
    "integrity_audit",    # A117: anti-join FK checks union
    "flow_length",        # A118: pointer jumping with additive weights
    "lm_doc_likelihood",  # A119: count aggs + keyed scoring joins
    "source_mixture_sample",  # A120: census + 1-row broadcast keep rule
    "adaptive_quadtree",  # A121: per-level census + bounded hot broadcasts
    "od_matrix",          # A122: one user-key window + OD-pair agg
    "scd2_history",       # A123: change-point filter between two windows
    "dsir_importance",    # A124: 1024-row model broadcast onto term stream
    "chunking_audit",     # A125: bounded chunk-index explode
    "resize_bilinear",    # A126: map-only fused fixed-point gather
    "payload_integrity",  # A127: map-only flags, single-row agg, stack()
    "geodesic_assign",    # A128: map-only chord argmin, codegen
    "event_transitions",  # A129: one user-key lead() window
    "hilbert_range_scan", # A130: driver range plan + OR-of-BETWEENs prune
    "voronoi_assign",     # A62 (round-3 replan): scalar least()+CASE argmin
    "zonal_majority",     # A50-family (round-3 replan): cached-decode hist partials
    "local_supplier_volume",  # A160: Q5 join pyramid, broadcast dims
    "box_nms",            # A165: named-column greedy cascade, zero shuffle
    "clustering_coeff",   # A166: degree-ordered wedges, 3-way corner credit
    "edit_distance_join", # A168: SymSpell variant blocking + levenshtein refine
    "segment_intersections",  # A172: grid bucket join + ccw refine
    "hits_scores",        # A177: per-half-round edge join + sum agg
    "threshold_diffusion",    # A178: fused multi-round Arrow pass
    "kmv_distinct",       # A183: distinct-hash agg + TakeOrdered bottom-k
    "ivf_nprobe_sweep",   # A186: probe-once candidates + GEMM truth
    "bitmap_index_ops",   # A193: bit_or word build + index-sized algebra
    "histogram_quantile_audit",  # A194: sketch vs distributed global rank
    "basket_rules",       # A198: pair self-join + broadcast marginals
    "ivm_audit",          # A201: delta-partition scan + dims outer merge
    "partition_skew_audit",   # A192: cell census + p99 order statistic
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT

    from georaster_spark.session import get_spark

    spark = get_spark(master="local[8]")
    from georaster_spark.plans import contract

    queries = contract.spatial_queries()
    jvm = spark._jvm
    out = ["# Physical plans (generated by jobs/dump_plans.py)\n"]
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"\n## {name}\n\n```\n{txt}\n```\n")
    dest = REPO / "BENCH" / "PLANS.md"
    dest.write_text("".join(out))
    print(f"wrote {dest} ({len(names)} plans)")


if __name__ == "__main__":
    main()
