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
