"""Round-4 verdict item 5: the IVF training sample must be UNBIASED
with respect to shard/file order. Fixture: a source-sorted embeddings
table (vec_id order == cluster order, the layout that breaks a
first-N-file-order or lowest-vec_id sample). The trained quantizer's
recall@k must be >= the seeded (lowest-vec_id) quantizer's there."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from whitebox_geospatial_analysis_tools_ray.stages import ann, embeddings as emb

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def sorted_sf(tmp_path_factory):
    """sf0.001 with the embeddings table REWRITTEN source-sorted:
    vec_ids reassigned in label (cluster) order, so the lowest ids all
    come from one cluster."""
    d = tmp_path_factory.mktemp("sorted_sf")
    for t in TABLES:
        tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "embeddings":
            df = tb.to_pandas()
            df = df.sort_values(["label", "vec_id"],
                                kind="mergesort").reset_index(drop=True)
            df["vec_id"] = np.arange(len(df), dtype=np.int64)
            out = pa.table({
                "vec_id": pa.array(df["vec_id"], pa.int64()),
                "embedding": pa.array(
                    [list(np.asarray(e)) for e in df["embedding"]],
                    pa.list_(pa.float32())),
                "label": pa.array(df["label"].astype(int),
                                  pa.int32())})
            pq.write_table(out, d / f"{t}.parquet")
        else:
            pq.write_table(tb, d / f"{t}.parquet")
    return str(d)


def _recall(topk_fn, sf, queries, k=20):
    rs = []
    for q in queries:
        truth = set(ann.cosine_topk(sf, k=k, query_vec_id=q)
                    .to_pandas()["vec_id"])
        got = set(topk_fn(sf, k=k, query_vec_id=q).to_pandas()["vec_id"])
        rs.append(len(got & truth) / k)
    return sum(rs) / len(rs)


def test_trained_recall_non_decreasing_on_sorted_fixture(sorted_sf):
    queries = (0, 50, 123, 200, 444)
    seeded = _recall(ann.ivf_topk, sorted_sf, queries)
    trained = _recall(ann.ivf_topk_trained, sorted_sf, queries)
    assert trained >= seeded


def test_sample_is_file_order_independent(sorted_sf, tmp_path):
    """The smallest-md5(vec_id) sample depends only on table CONTENT:
    re-sharding the table into reversed-order files leaves it
    unchanged."""
    ids1 = emb._sample_vec_ids(sorted_sf, 200)
    # reshard: two files, reversed halves, under a directory
    df = pq.read_table(f"{sorted_sf}/embeddings.parquet").to_pandas()
    d = tmp_path / "resharded"
    (d / "embeddings.parquet").mkdir(parents=True)
    half = len(df) // 2
    pq.write_table(pa.Table.from_pandas(df.iloc[half:],
                                        preserve_index=False),
                   d / "embeddings.parquet" / "part-0.parquet")
    pq.write_table(pa.Table.from_pandas(df.iloc[:half],
                                        preserve_index=False),
                   d / "embeddings.parquet" / "part-1.parquet")
    ids2 = emb._sample_vec_ids(str(d), 200)
    assert np.array_equal(np.sort(ids1), np.sort(ids2))


def test_neardup_stats_reports_duplication_factor():
    st = emb.cosine_neardup_stats(SF_DIR)
    assert len(st) == 1
    assert int(st["n_vectors"].iloc[0]) == 500
    f = float(st["dup_factor"].iloc[0])
    assert f >= 1.0                     # every vector posts home
    assert int(st["n_pairs"].iloc[0]) >= 0
    # pairs remain EXACT (centroid-independent coverage proof): count
    # must equal the brute-force pair count
    pairs = emb.cosine_neardup_pairs(SF_DIR).to_pandas()
    assert int(st["n_pairs"].iloc[0]) == len(pairs)
