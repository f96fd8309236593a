"""Round-4 empty-corpus audit: a full 376-query sweep on an ALL-EMPTY
fixture surfaced 14 substantive impl/oracle divergences (undefined
aggregates emitted as garbage rows, degenerate extent grids, dtype
drift in typed-empty frames). This suite pins the fixed set: every
query here must match its oracle exactly on zero-row tables."""

import duckdb
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

FIXED = [
    "attribute_correlation",   # undefined correlation -> zero rows
    "trend_surface",           # undefined fit -> zero rows
    "layer_footprint",         # hull of nothing -> zero rows
    "inverse_pca",             # covariance undefined (n < 2)
    "pca_embeddings",
    "construct_tin",           # tile scaffold with zero counts
    "rasterize_tin",           # no data points -> all NoData
    "knn_idw",                 # fixed grid of NoData cells
    "lidar_bare_earth_dem",    # degenerate 1-row raster, zero valid
    "lidar_canopy_model",
    "lidar_nn_interpolation",
    "create_rect_grid",        # empty input -> empty grid
    "bpe_train",               # typed-empty object dtypes
    "filter_las_scan_angles",  # COALESCE'd zero sum
]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
        pq.write_table(tb.slice(0, 0), d / f"{t}.parquet")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    yield str(d), con
    con.close()


@pytest.mark.parametrize("name", FIXED)
def test_empty_corpus_parity(name, empty_sf):
    from conftest import assert_matches_oracle
    sf, con = empty_sf
    assert_matches_oracle(QUERIES[name](sf), con, ORACLES[name])


# single-row boundary (the n=1 audit): undefined statistics must agree
# on which degenerate answer both sides give
ONE_ROW_FIXED = [
    "attribute_correlation",   # n < 2: correlation undefined -> 0 rows
    "trend_surface",           # n < 3: singular normal system -> 0 rows
    "kmeans_embeddings",       # min(k, n) clusters, not a range(k) pad
    "cluster_attributes",
    "embedding_neardup_stats",  # kcenter picks capped at min(k, n)
    "ann_ivf_trained",
]


@pytest.fixture(scope="module")
def one_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("one_sf")
    for t in TABLES:
        tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
        pq.write_table(tb.slice(0, 1), d / f"{t}.parquet")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    yield str(d), con
    con.close()


@pytest.mark.parametrize("name", ONE_ROW_FIXED)
def test_one_row_corpus_parity(name, one_sf):
    from conftest import assert_matches_oracle
    sf, con = one_sf
    assert_matches_oracle(QUERIES[name](sf), con, ORACLES[name])
