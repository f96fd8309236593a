"""Block-structure invariance for the part-5 operator families
(SURVEY §5 property): results must be identical whether the input
table arrives as ONE parquet file or as many small files (Ray blocks
follow files, so this exercises every partial+combine boundary in the
new plumbing)."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SPLIT = {"documents": 7, "events": 9, "embeddings": 5}


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def split_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("split_sf"))
    for t in TABLES:
        src = pq.read_table(f"{SRC}/{t}.parquet")
        n = SPLIT.get(t)
        if n is None:
            pq.write_table(src, f"{d}/{t}.parquet")
            continue
        os.makedirs(f"{d}/{t}.parquet", exist_ok=True)
        step = max(1, (src.num_rows + n - 1) // n)
        for i in range(0, src.num_rows, step):
            pq.write_table(src.slice(i, step),
                           f"{d}/{t}.parquet/part{i:06d}.parquet")
    return d


OPS = ["dataset_mixture", "quality_classifier", "token_kl_divergence",
       "embedding_quantize", "embedding_pq", "kcenter_sample",
       "length_quantiles", "incremental_dedup", "bm25_topk",
       "token_zipf_fit", "hll_error_eval", "minhash_error_eval",
       "events_funnel", "events_retention", "events_interval_join",
       "time_decay_aggregate", "ann_recall_eval",
       "q3_shipping_priority", "q6_forecast_revenue",
       "embedding_dup_clusters", "ann_ivf_topk", "job_manifest",
       "corpus_summary"]


@pytest.mark.parametrize("name", OPS)
def test_block_structure_invariant(split_dir, ray_session, name):
    import ray.data as rd

    import __ray_entry__ as e
    qs = e.queries()

    def run(sf):
        r = qs[name](sf)
        return _sorted(r.to_pandas() if isinstance(r, rd.Dataset) else r)

    pd.testing.assert_frame_equal(run(SRC), run(split_dir))
