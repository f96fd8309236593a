"""Round-4 exotic-whitespace audit: Python's str-mode '\\s' (and argless
str.strip()/str.split()) covers 19 Unicode whitespace codepoints, while
the oracles' DuckDB RE2 '\\s' is exactly [\\t\\n\\f\\r ] — text carrying
NBSP / vertical tab / FS / em-space tokenized DIFFERENTLY on the two
sides (9 token-family queries diverged). Every impl tokenizer now pins
to util.SQL_WS; this suite regression-tests the fixed family on a
fixture carrying exactly those codepoints."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

FIXED = [
    "token_stats", "topk_tokens", "lm_perplexity", "quality_classifier",
    "bm25_topk", "corpus_summary", "token_kl_divergence",
    "simhash_signatures", "pack_sequences", "fingerprints",
    "langid_confusion", "length_quantiles", "exact_dedup",
    "duplicate_spans", "bpe_train",
]


def test_sql_ws_matches_duckdb_class():
    """The pinned class must equal what DuckDB's \\s actually matches
    over the BMP controls + Unicode spaces."""
    import re

    from whitebox_geospatial_analysis_tools_ray.stages.util import (
        SQL_WS, sql_ws_re)
    con = duckdb.connect()
    cands = [chr(i) for i in range(0x30)] + [
        "\x7f", "\x85", "\xa0", " ", " ", " ", " ",
        " ", " ", "　", "​"]
    for ch in cands:
        duck = con.execute(
            "SELECT regexp_matches(?, '^\\s$')", [ch]).fetchone()[0]
        ours = bool(re.match(sql_ws_re(), ch)) and ch in SQL_WS
        mine = ch in SQL_WS
        assert bool(duck) == mine == (ours if mine else False), hex(ord(ch))
    con.close()


@pytest.fixture(scope="module")
def ws_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("ws_sf")
    for t in TABLES:
        tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "documents":
            df = tb.to_pandas()
            txt = df["text"].astype(object)
            txt.iloc[0] = "alpha beta gamma"        # NBSP
            txt.iloc[1] = "one\x0btwo three"             # vertical tab
            txt.iloc[2] = "x\x1cy z w"              # FS + em-space
            txt.iloc[3] = " lead and trail "   # exotic strip
            df["text"] = txt
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           d / f"{t}.parquet")
        else:
            pq.write_table(tb, d / f"{t}.parquet")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    yield str(d), con
    con.close()


@pytest.mark.parametrize("name", FIXED)
def test_exotic_whitespace_parity(name, ws_sf):
    from conftest import assert_matches_oracle
    sf, con = ws_sf
    assert_matches_oracle(QUERIES[name](sf), con, ORACLES[name])
