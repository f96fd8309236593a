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
