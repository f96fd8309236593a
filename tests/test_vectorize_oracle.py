"""raster_to_vector_lines vs its recursive-CTE replay oracle
(round-4 verdict item 5: the query was rows-only; the oracle replays
the sequential thinning + trace state machines as spliced-string
recursions — see stages/vectorize_oracle.py). Exact compare: the
driver hashes values, so check_exact pins the float sums and the
DuckDB-mode (half-away) rounding."""

import duckdb
import pandas as pd
import pytest

from whitebox_geospatial_analysis_tools_ray.stages import vectorize as V
from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec
from whitebox_geospatial_analysis_tools_ray.stages.vectorize_oracle import (
    raster_to_vector_lines_sql)


@pytest.mark.parametrize("n,tile_rows", [(16, 8), (48, 16)])
def test_rtvl_oracle_exact(ray_session, n, tile_rows):
    want = V.raster_to_vector_lines(RasterSpec(rows=n, cols=n,
                                               tile_rows=tile_rows))
    got = duckdb.connect().execute(
        raster_to_vector_lines_sql(rows=n, cols=n)).fetchdf()
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, check_exact=True)


def test_sql_round_matches_duckdb_on_ties():
    from whitebox_geospatial_analysis_tools_ray.stages.util import sql_round

    con = duckdb.connect()
    for v in (546.28125, 33.65625, 190.0104, -2.28125, 0.00005,
              176.15625, 0.0, 123.45675):
        duck = float(con.execute(
            "SELECT round(CAST(? AS DOUBLE), 4)", [v]).fetchone()[0])
        assert sql_round(v, 4) == duck, v
