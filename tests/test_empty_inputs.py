"""Empty / single-row inputs degrade to typed empty (or tiny) results.

The round-2 ADVICE found one crash of this class (ann._bottom_n_by_vec_id
returning None on an empty embeddings table); this audit pins the whole
LLM-curation family: every operator must run — not crash — on a 0-row
and a 1-row corpus, the boundary a real user's first broken shard hits.
"""

import os

import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FAMS = ["duplicate_spans", "lm_perplexity", "perplexity_buckets",
        "events_asof_join", "events_sliding_window",
        "corpus_clean_spans", "token_hll", "hll_estimate", "tfidf_top_terms",
        "bpe_train", "bpe_encode_stats", "importance_weights",
        "dataset_mixture", "quality_classifier", "token_kl_divergence",
        "embedding_quantize", "kcenter_sample", "events_funnel",
        "events_retention", "events_interval_join", "token_zipf_fit",
        "bm25_topk", "length_quantiles", "incremental_dedup",
        "embedding_pq", "ann_recall_eval", "time_decay_aggregate",
        "q3_shipping_priority", "q6_forecast_revenue",
        "hll_error_eval", "minhash_error_eval", "corpus_summary",
        "exact_dedup", "minhash_pairs", "simhash_signatures",
        "simhash_neardup_pairs", "ngram_jaccard_pairs", "dup_clusters",
        "embedding_dup_clusters", "ann_cosine_topk", "ann_knn_join",
        "ann_ivf_topk", "ann_ivf_persisted", "ann_ivf_trained",
        "boilerplate_ngrams", "topk_tokens", "decontaminate",
        "stratified_sample", "pack_sequences", "repetition_filter",
        "corpus_clean", "langid_confusion", "quality_scores",
        "token_stats", "fingerprints", "chunk_documents",
        "pca_embeddings", "inverse_pca", "kmeans_embeddings",
        "coincident_dedup", "cluster_attributes",
        # geo / LAS / photogrammetry finalizations that crashed on
        # schema-less empty frames in the round-3 audit
        "tile_assign", "tile_hex", "las_file_summary", "las_tile_stats",
        "filter_las_scan_angles", "find_flightline_edge_points",
        "isolate_ground_points", "lidar_nn_interpolation",
        "lidar_bare_earth_dem", "lidar_canopy_model",
        "lidar_segmentation_weights", "las_rgb_stats",
        "attribute_histogram", "attribute_correlation",
        "attribute_gridding", "vector_feature_density", "fuse_touching",
        "find_polygon_chains", "group_polygons_by_orientation",
        "layer_footprint", "trend_surface", "kriging_interpolate",
        "nearest_neighbour_analysis", "value_histogram",
        "xyz_text_to_raster", "surf_match_points", "find_tie_points",
        "image_rectification_fit", "estimate_heights_parallax",
        "job_manifest", "revenue_by_nation", "create_rect_grid"]


def _make_fixture(tmp_path, nrows: int) -> str:
    d = str(tmp_path / f"sf_{nrows}")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        src = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(src.slice(0, nrows), f"{d}/{t}.parquet")
    return d


def _consume(r) -> int:
    import ray.data as rd
    if isinstance(r, rd.Dataset):
        return sum(b.num_rows for b in
                   r.iter_batches(batch_size=65536, batch_format="pyarrow"))
    return len(r)


@pytest.mark.parametrize("nrows", [0, 1])
def test_curation_family_degrades_on_tiny_inputs(tmp_path, ray_session,
                                                 nrows):
    import __ray_entry__ as e
    qs = e.queries()
    sf = _make_fixture(tmp_path, nrows)
    failures = []
    for name in FAMS:
        if name not in qs:
            continue
        try:
            n = _consume(qs[name](sf))
            assert n >= 0
        except Exception as ex:  # noqa: BLE001 — collecting the audit
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not failures, failures


def test_curation_family_tolerates_null_cells(tmp_path, ray_session):
    """Dirty-shard boundary: null text / lang / n_chars / embedding /
    label cells must not crash the curation family. Documented rules:
    null text ≡ empty document (tokenless; groups with "" in dedup),
    null embedding rows are dropped (no geometry), null lang groups
    under "". Real-data outputs unchanged (oracle parity re-verified)."""
    import pyarrow as pa

    d = str(tmp_path / "nulls")
    os.makedirs(d, exist_ok=True)
    src = pq.read_table(f"{SRC}/documents.parquet")
    t = src.slice(0, 20).to_pydict()
    t["text"][3] = None
    t["text"][7] = None
    t["lang"][5] = None
    t["n_chars"][4] = None
    pq.write_table(pa.table(t, schema=src.schema),
                   f"{d}/documents.parquet")
    esrc = pq.read_table(f"{SRC}/embeddings.parquet")
    ee = esrc.slice(0, 20).to_pydict()
    ee["embedding"][2] = None
    ee["label"][6] = None
    pq.write_table(pa.table(ee, schema=esrc.schema),
                   f"{d}/embeddings.parquet")
    for tb in TABLES:
        if tb in ("documents", "embeddings"):
            continue
        pq.write_table(pq.read_table(f"{SRC}/{tb}.parquet"),
                       f"{d}/{tb}.parquet")

    import __ray_entry__ as e
    qs = e.queries()
    fams = ["duplicate_spans", "lm_perplexity", "perplexity_buckets",
            "importance_weights", "bpe_train", "bpe_encode_stats",
            "dataset_mixture", "quality_classifier",
            "token_kl_divergence", "embedding_quantize",
            "kcenter_sample", "token_zipf_fit", "bm25_topk",
            "length_quantiles", "incremental_dedup", "embedding_pq",
            "ann_recall_eval", "hll_error_eval", "minhash_error_eval",
            "corpus_summary",
            "exact_dedup", "minhash_pairs", "simhash_signatures",
            "simhash_neardup_pairs", "ngram_jaccard_pairs",
            "dup_clusters", "embedding_dup_clusters", "ann_cosine_topk",
            "ann_knn_join", "ann_ivf_topk", "ann_ivf_persisted",
            "ann_ivf_trained", "topk_tokens", "decontaminate",
            "stratified_sample", "pack_sequences", "repetition_filter",
            "corpus_clean", "langid_confusion", "quality_scores",
            "token_stats", "fingerprints", "chunk_documents",
            "pca_embeddings", "inverse_pca", "kmeans_embeddings",
            "boilerplate_ngrams", "coincident_dedup"]
    failures = []
    for name in fams:
        try:
            assert _consume(qs[name](d)) >= 0
        except Exception as ex:  # noqa: BLE001 — collecting the audit
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not failures, failures
