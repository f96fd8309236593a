"""shuffle_hash_join: parity with pandas merge, salt invariance, and a
forced hot-key skew case staying sub-quadratic per group."""
import numpy as np
import pandas as pd
import ray.data as rd

from whitebox_geospatial_analysis_tools_ray.stages.relational import (
    orders_lineitem_join, orders_lineitem_join_sql, shuffle_hash_join)

SF = "/root/testdata/sf0.001"


def test_join_large_matches_duckdb(ray_session):
    import duckdb
    got = (orders_lineitem_join(SF).to_pandas()
           .sort_values("o_orderpriority").reset_index(drop=True))
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(orders_lineitem_join_sql()).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_salt_does_not_change_result(ray_session):
    a = (orders_lineitem_join(SF, salt=1).to_pandas()
         .sort_values("o_orderpriority").reset_index(drop=True))
    b = (orders_lineitem_join(SF, salt=4).to_pandas()
         .sort_values("o_orderpriority").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_hot_key_skew_salted(ray_session):
    """One key holds 50% of the left side; the salted join must return
    the exact pandas-merge result (salting only re-partitions)."""
    rng = np.random.default_rng(7)
    n = 20_000
    lk = np.where(rng.random(n) < 0.5, 42,
                  rng.integers(0, 1000, n)).astype(np.int64)
    left = pd.DataFrame({"k": lk, "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(1000, dtype=np.int64),
                          "rv": np.arange(1000, dtype=np.int64) * 10})
    got = shuffle_hash_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "rk",
        salt=8).to_pandas()
    want = left.merge(right, left_on="k", right_on="rk").drop(columns="rk")
    key = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True))
