"""Round-4 verdict item 6: promote the escape_nul convention to a
structural guarantee.

pandas' all-string hashtables key by C string (strlen), so groupby /
factorize / Series.map on keys with embedded NULs silently MERGE
distinct keys — real web text carries NULs. util.keyed_group_sum is
the one sanctioned group-sum on text-derived keys; this module (a)
lints the stages/ sources so no raw ``.groupby`` on a token-named key
can land again, and (b) pins the helper's NUL behavior functionally.
"""

import pathlib
import re

import numpy as np
import pandas as pd
import pytest

STAGES = pathlib.Path(
    "whitebox_geospatial_analysis_tools_ray/stages")

# column names that always carry text-derived (tokenizer-output) keys
RISKY = ("token", "term", "word", "ngram", "key", "shingle")

_GROUPBY_RE = re.compile(
    r"\.groupby\(\s*(?:\[\s*)?([\"'])(%s)\1" % "|".join(RISKY))


def test_no_raw_groupby_on_token_keys_in_stages():
    """Every pandas groupby whose first key is a token-derived column
    must go through util.keyed_group_sum (which NUL-escapes
    internally). util.py itself hosts the helper; everything else must
    be clean."""
    offenders = []
    for path in sorted(STAGES.glob("*.py")):
        if path.name == "util.py":
            continue
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if _GROUPBY_RE.search(line):
                offenders.append(f"{path}:{i}: {line.strip()}")
    assert not offenders, (
        "raw .groupby on a token-derived key (NUL-merge hazard); "
        "use util.keyed_group_sum:\n" + "\n".join(offenders))


def test_keyed_group_sum_separates_nul_distinct_keys():
    from whitebox_geospatial_analysis_tools_ray.stages.util import (
        keyed_group_sum)

    df = pd.DataFrame({
        "term": ["a\x00b", "a\x00c", "a\x00b", "a", "a\x01x"],
        "c": np.array([1, 10, 100, 1000, 7], dtype=np.int64)})
    # raw pandas merges the NUL-distinct keys — prove the hazard lives
    raw = df.groupby("term", sort=False)["c"].sum()
    assert len(raw) < 4 or raw.get("a\x00b", 0) != 101
    out = keyed_group_sum(df, ["term"], ["c"])
    got = dict(zip(out["term"], out["c"]))
    assert got == {"a\x00b": 101, "a\x00c": 10, "a": 1000, "a\x01x": 7}


def test_keyed_group_sum_mixed_and_multi_value():
    from whitebox_geospatial_analysis_tools_ray.stages.util import (
        keyed_group_sum)

    df = pd.DataFrame({
        "key": ["k\x001", "k\x001", "k\x002"],
        "is_big": np.array([0, 0, 1], dtype=np.int64),
        "a": np.array([1, 2, 4], dtype=np.int64),
        "b": np.array([10, 20, 40], dtype=np.int64)})
    out = keyed_group_sum(df, ["key", "is_big"], ["a", "b"])
    out = out.sort_values(["key", "is_big"]).reset_index(drop=True)
    assert out["key"].tolist() == ["k\x001", "k\x002"]
    assert out["a"].tolist() == [3, 4]
    assert out["b"].tolist() == [30, 40]


@pytest.fixture(scope="module")
def nul_text_sf(tmp_path_factory):
    """sf0.001 with embedded-NUL tokens in several documents — the
    exact shape pandas' C-string hashtables silently merge."""
    import shutil

    import duckdb
    import pyarrow.parquet as pq

    SF = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("nul_sf")
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]
    for t in tables:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    s = df["text"].astype(object)
    s.iloc[0] = "alpha\x00beta alpha\x00gamma alpha\x00beta plain words"
    s.iloc[1] = "alpha\x00beta alpha\x00gamma repeated alpha\x00beta"
    s.iloc[5] = "x\x01y x\x01\x02z control bytes \x00\x00 doubled"
    df["text"] = s
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   d / "documents.parquet")
    con = duckdb.connect()
    for t in tables + ["documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    yield str(d), con
    con.close()


@pytest.mark.parametrize("name", ["topk_tokens", "tfidf_top_terms",
                                  "token_kl_divergence",
                                  "boilerplate_ngrams"])
def test_token_queries_exact_on_nul_text(ray_session, nul_text_sf,
                                         name):
    """Full-query parity on NUL-bearing text: DuckDB treats
    NUL-distinct tokens as distinct; so must every Ray groupby in the
    chain (keyed_group_sum / escaped-space lookups)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    import __ray_entry__ as entry_mod

    d, con = nul_text_sf
    got = entry_mod.queries()[name](d)
    if isinstance(got, (rd.Dataset, pa.Table)):
        got = got.to_pandas()
    want = con.execute(entry_mod.oracle_sql()[name]).fetchdf()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
