"""Property tests: the document-selection operators against literal
brute-force mirrors on RANDOM corpora — guards the bucketed-combine
plumbing against fixture-specific luck (the oracle-parity suite pins
real-data equivalence; these shrink failures to tiny corpora)."""

import hashlib
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SRC = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WORDS = ["aa", "bb", "cc", "dd", "ee"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8),
    min_size=1, max_size=25)


def _write_docs(tmpdir, token_lists):
    d = str(tmpdir)
    os.makedirs(d, exist_ok=True)
    schema = pq.read_table(f"{SRC}/documents.parquet").schema
    n = len(token_lists)
    tbl = {"doc_id": list(range(n)),
           "text": [" ".join(t) for t in token_lists],
           "lang": [["en", "de", "fr"][i % 3] for i in range(n)],
           "source": [f"s{i % 2}" for i in range(n)],
           "n_chars": [len(" ".join(t)) for t in token_lists]}
    pq.write_table(pa.table(tbl, schema=schema), f"{d}/documents.parquet")
    for t in TABLES:
        if t == "documents":
            continue
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{d}/{t}.parquet")
    return d


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(toks=docs_strategy)
def test_incremental_dedup_matches_brute(tmp_path_factory, ray_session,
                                         toks):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import incremental_dedup
    d = _write_docs(tmp_path_factory.mktemp("docs"), toks)
    out = incremental_dedup(d, mod=3).iloc[0]
    texts = [" ".join(t) for t in toks]
    groups: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        groups.setdefault(t, []).append(i)
    n_inc = n_hit = n_dup = n_kept = 0
    for _t, ids in groups.items():
        inc = [i for i in ids if i % 3 != 0]
        has_ex = any(i % 3 == 0 for i in ids)
        n_inc += len(inc)
        if has_ex:
            n_hit += len(inc)
        elif inc:
            n_dup += len(inc) - 1
            n_kept += 1
    assert out.tolist() == [n_inc, n_hit, n_dup, n_kept]


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(toks=docs_strategy)
def test_length_quantiles_matches_brute(tmp_path_factory, ray_session,
                                        toks):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import length_quantiles
    d = _write_docs(tmp_path_factory.mktemp("docs"), toks)
    out = length_quantiles(d)
    got = {r.lang: (r.n_docs, r.p50, r.p90, r.p99)
           for r in out.itertuples()}
    by_lang: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        if len(t) == 0:
            continue
        by_lang.setdefault(["en", "de", "fr"][i % 3], []).append(len(t))
    want = {}
    for lang, ls in by_lang.items():
        ls.sort()
        n = len(ls)
        pick = lambda q: ls[min(  # smallest v with cum >= ceil(q*n)
            next(j for j in range(n) if j + 1 >= math.ceil(q * n)),
            n - 1)]
        want[lang] = (n, pick(0.5), pick(0.9), pick(0.99))
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(toks=docs_strategy,
       rate_idx=st.integers(0, 3))
def test_dataset_mixture_matches_brute(tmp_path_factory, ray_session,
                                       toks, rate_idx):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import dataset_mixture
    rate = [0.0, 0.3, 0.7, 1.0][rate_idx]
    rates = {"s0": rate}           # s1 defaults to 1.0
    d = _write_docs(tmp_path_factory.mktemp("docs"), toks)
    out = dataset_mixture(d, rates=rates)
    got = {r.source: (r.n_docs, r.n_kept) for r in out.itertuples()}
    want: dict[str, list[int]] = {}
    for i in range(len(toks)):
        src = f"s{i % 2}"
        u = int(hashlib.md5(f"{src}:{i}".encode()).hexdigest()[:8],
                16) / 2 ** 32
        w = want.setdefault(src, [0, 0])
        w[0] += 1
        w[1] += int(u < rates.get(src, 1.0))
    assert got == {k: tuple(v) for k, v in want.items()}
