"""Round-4 ADVICE regression tests: the oracle/impl boundary rules on
DIRTY fixtures (null embedding at the lowest vec_id, null label, null
lang) — each finding reproduced as a parity assertion so the fixed
oracles are pinned against the fixture shapes that exposed them."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def dirty_sf(tmp_path_factory):
    """sf0.001 with injected nulls: embedding IS NULL at the LOWEST
    vec_id (the kcenter-seed position), one null label, one null lang —
    the exact shapes the round-3 advisor used to break the oracles."""
    d = tmp_path_factory.mktemp("dirty_sf")
    for t in TABLES:
        if t == "embeddings":
            tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
            df = tb.to_pandas()
            i0 = int(df["vec_id"].idxmin())
            emb = df["embedding"].astype(object)
            emb.iloc[i0] = None
            df["embedding"] = emb
            lab = df["label"].astype(object)
            lab.iloc[1] = None
            df["label"] = lab
            out = pa.table({
                "vec_id": pa.array(df["vec_id"], pa.int64()),
                "embedding": pa.array(
                    [None if e is None else list(np.asarray(e))
                     for e in df["embedding"]],
                    pa.list_(pa.float32())),
                "label": pa.array(
                    [None if pd.isna(v) else int(v)
                     for v in df["label"]], pa.int32())})
            pq.write_table(out, d / f"{t}.parquet")
        elif t == "documents":
            df = pq.read_table(f"{SF_DIR}/{t}.parquet").to_pandas()
            for col, row in (("lang", 2), ("text", 3), ("source", 4)):
                s = df[col].astype(object)
                s.iloc[row] = None
                df[col] = s
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           d / f"{t}.parquet")
        else:
            pq.write_table(pq.read_table(f"{SF_DIR}/{t}.parquet"),
                           d / f"{t}.parquet")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    yield str(d), con
    con.close()


@pytest.mark.parametrize("name", [
    "kcenter_sample",        # advisor: oracle kept the null-embedding seed
    "embedding_quantize",    # advisor: oracle kept null-label rows
    "length_quantiles",      # advisor: oracle grouped null lang under NULL
    "embedding_pq",          # advisor: sqrt-then-square 1-ulp sse drift
    "ann_recall_eval",
    "corpus_summary",
    # the 16 divergences the round-4 full dirty sweep surfaced — each
    # pinned to the shared rules: null text ≡ '', null lang/source
    # group under '', null embedding/label rows drop
    "corpus_clean", "corpus_clean_spans", "dataset_mixture",
    "exact_dedup", "fingerprints", "image_features",
    "kmeans_embeddings", "langid_confusion", "quality_classifier",
    "quality_scores", "simhash_signatures", "stratified_sample",
    "surf_match_points", "token_kl_divergence", "token_stats",
    "zonal_stats",
    # the ann family shares the null-embedding drop
    "ann_cosine_topk", "ann_ivf_topk", "ann_knn_join",
])
def test_dirty_fixture_parity(name, dirty_sf):
    from conftest import assert_matches_oracle
    sf, con = dirty_sf
    assert_matches_oracle(QUERIES[name](sf), con, ORACLES[name])


def test_ann_recall_eval_empty_corpus(tmp_path):
    """The 0-row-corpus boundary: impl now emits the one-row zero card
    the SQL mirror's aggregates produce (advisor finding #4)."""
    d = tmp_path
    for t in TABLES:
        tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
        pq.write_table(tb.slice(0, 0), d / f"{t}.parquet")
    out = QUERIES["ann_recall_eval"](str(d))
    from conftest import to_pandas
    out = to_pandas(out)
    assert len(out) == 1
    assert int(out["n_hit"].iloc[0]) == 0
    assert float(out["recall"].iloc[0]) == 0.0

    cs = to_pandas(QUERIES["corpus_summary"](str(d)))
    assert len(cs) == 1
    assert int(cs["n_docs"].iloc[0]) == 0
