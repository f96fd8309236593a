"""Known-answer tests for the data-selection / event-analytics family
(stages/selection.py + the round-3 relational/textops additions) on
hand-crafted fixtures — the oracle-parity suite covers real-data
equivalence; these pin the SEMANTICS on inputs small enough to check
by hand."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _fixture_dir(tmp_path, events=None, documents=None, embeddings=None):
    d = str(tmp_path / "fix")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        src = pq.read_table(f"{SRC}/{t}.parquet")
        override = {"events": events, "documents": documents,
                    "embeddings": embeddings}[t] if t in (
            "events", "documents", "embeddings") else None
        if override is not None:
            pq.write_table(pa.table(override, schema=src.schema),
                           f"{d}/{t}.parquet")
        else:
            pq.write_table(src, f"{d}/{t}.parquet")
    return d


def _events(rows):
    """rows: (event_id, ts_us, user_id, event_type)"""
    return {
        "event_id": [r[0] for r in rows],
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows)}


HOUR = 3600 * 1_000_000
DAY = 24 * HOUR
WEEK = 7 * DAY


def test_events_funnel_known_answer(tmp_path, ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import events_funnel
    # user 1: full funnel view(t0) -> click(t0+1h) -> purchase(t0+2h)
    # user 2: view then click AFTER the horizon -> stops at view
    # user 3: click/purchase with NO view -> never enters
    # user 4: purchase BEFORE click -> completes only through click's
    #         strictly-after purchase (none) -> stops at click
    t0 = 1_700_000_000 * 1_000_000
    rows = [
        (1, t0, 1, "view"), (2, t0 + HOUR, 1, "click"),
        (3, t0 + 2 * HOUR, 1, "purchase"),
        (4, t0, 2, "view"), (5, t0 + 8 * DAY, 2, "click"),
        (6, t0, 3, "click"), (7, t0 + HOUR, 3, "purchase"),
        (8, t0, 4, "view"), (9, t0 + 2 * HOUR, 4, "click"),
        (10, t0 + HOUR, 4, "purchase"),
    ]
    d = _fixture_dir(tmp_path, events=_events(rows))
    out = events_funnel(d).sort_values("step_index").reset_index(drop=True)
    assert out["n_users"].tolist() == [3, 2, 1]
    # gaps: user1 click at +1h + user4 click at +2h = 3h; purchase u1 +2h
    assert out["total_gap_us"].tolist() == [0, 3 * HOUR, 2 * HOUR]


def test_events_retention_known_answer(tmp_path, ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.relational import events_retention
    w0 = 2800  # an arbitrary epoch week
    t = lambda wk, h=0: wk * WEEK + h * HOUR
    rows = [
        (1, t(w0), 1, "view"), (2, t(w0 + 1), 1, "click"),
        (3, t(w0 + 1, 5), 1, "view"),          # same week, counted once
        (4, t(w0), 2, "view"), (5, t(w0 + 2), 2, "view"),
        (6, t(w0 + 1), 3, "signup"),
    ]
    d = _fixture_dir(tmp_path, events=_events(rows))
    out = events_retention(d).to_pandas()
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in out.itertuples()}
    assert got == {(w0, 0): 2, (w0, 1): 1, (w0, 2): 1, (w0 + 1, 0): 1}


def test_events_interval_join_known_answer(tmp_path, ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.relational import events_interval_join
    t0 = 1_700_000_000 * 1_000_000
    rows = [
        (1, t0, 1, "error"),
        (2, t0 - HOUR, 1, "click"),      # boundary: inclusive
        (3, t0 + HOUR, 1, "click"),      # boundary: inclusive
        (4, t0 + HOUR + 1, 1, "click"),  # just outside
        (5, t0, 2, "click"),             # other user
        (6, t0, 3, "error"),             # no clicks at all
    ]
    d = _fixture_dir(tmp_path, events=_events(rows))
    out = events_interval_join(d).to_pandas()
    got = dict(zip(out["event_id"], out["n_right"]))
    assert got == {1: 2, 6: 0}


def test_dataset_mixture_rate_one_keeps_all(tmp_path, ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import dataset_mixture
    out = dataset_mixture(SRC, rates={})     # absent source -> rate 1.0
    assert (out["n_kept"] == out["n_docs"]).all()
    assert (out["frac_kept"] == 1.0).all()
    zero = dataset_mixture(SRC, rates={f"src{i}": 0.0 for i in range(20)})
    assert (zero["n_kept"] == 0).all()


def test_quality_classifier_deterministic_and_empty(tmp_path, ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import quality_classifier
    docs = {"doc_id": [0, 1, 2], "text": ["aa bb aa", "", None],
            "lang": ["en"] * 3, "source": ["s"] * 3,
            "n_chars": [8, 0, 0]}
    d = _fixture_dir(tmp_path, documents=docs)
    out = (quality_classifier(d).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [3, 0, 0]
    # empty/null docs score exactly 0.5 / keep
    assert out["score"].tolist()[1:] == [0.5, 0.5]
    assert (out["label"][1:] == "keep").all()
    # literal replay of the integer accumulator for doc 0
    import zlib
    from whitebox_geospatial_analysis_tools_ray.stages.selection import (
        _QC_A, _QC_B, _QC_P)
    h = {t: (zlib.crc32(t.encode()) * _QC_A + _QC_B) % _QC_P
         for t in ("aa", "bb")}
    s = 2 * h["aa"] + h["bb"]
    m = float(s) / float(3 * _QC_P) - 0.5
    assert out["score"][0] == round(1.0 / (1.0 + np.exp(-m)), 6)


def test_kcenter_first_pick_is_farthest(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import kcenter_sample
    out = kcenter_sample(SRC, k=3)
    assert out["rank"].tolist() == [0, 1, 2]
    assert len(set(out["vec_id"])) == 3
    # rank-1 distance is the global max distance to the seed;
    # rank-2 distance cannot exceed it (greedy monotonicity)
    assert out["dist"][2] <= out["dist"][1]
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    X = np.asarray([np.asarray(e, dtype=np.float64)
                    for e in t["embedding"].to_pylist()])
    seed = X[ids.argmin()]
    D = np.round(np.sqrt(((X - seed) ** 2).sum(axis=1)), 6)
    assert out["dist"][1] == D.max()


def test_embedding_quantize_error_bound(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import embedding_quantize
    out = embedding_quantize(SRC)
    # int8 symmetric quantization error is bounded by scale/2 per dim
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    X = np.asarray([np.asarray(e, dtype=np.float64)
                    for e in t["embedding"].to_pylist()])
    max_scale = np.abs(X).max(axis=0).max() / 127.0
    assert (out["max_abs_err"] <= max_scale / 2 + 1e-9).all()
    assert (out["mse"] >= 0).all()
    assert int(out["n_vecs"].sum()) == len(X)


def test_bm25_scores_monotone_in_tf(tmp_path, ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.textops import bm25_topk
    # same doc length, increasing tf of the top-df term -> higher score
    docs = {"doc_id": [0, 1, 2],
            "text": ["q q q x", "q q x x", "q x x x"],
            "lang": ["en"] * 3, "source": ["s"] * 3, "n_chars": [7] * 3}
    d = _fixture_dir(tmp_path, documents=docs)
    out = bm25_topk(d, n_query_terms=1, k=3)
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["score"].is_monotonic_decreasing


def test_token_zipf_fit_on_exact_zipf(tmp_path, ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.textops import token_zipf_fit
    # construct frequencies f(r) = round(1000 / r): slope ~ -1
    toks = []
    for r in range(1, 21):
        toks += [f"w{r:02d}"] * round(1000 / r)
    docs = {"doc_id": [0], "text": [" ".join(toks)], "lang": ["en"],
            "source": ["s"], "n_chars": [1]}
    d = _fixture_dir(tmp_path, documents=docs)
    out = token_zipf_fit(d, k=20)
    assert len(out) == 1
    assert abs(out["slope"][0] + 1.0) < 0.05
    assert out["r2"][0] > 0.999


def test_length_quantiles_known_answer(tmp_path, ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import length_quantiles
    # lang 'a': lengths 1..10 (one doc each): p50 -> 5, p90 -> 9, p99 -> 10
    docs = {"doc_id": list(range(10)),
            "text": [" ".join(["w"] * n) for n in range(1, 11)],
            "lang": ["a"] * 10, "source": ["s"] * 10,
            "n_chars": [1] * 10}
    d = _fixture_dir(tmp_path, documents=docs)
    out = length_quantiles(d)
    assert out.iloc[0][["n_docs", "p50", "p90", "p99"]].tolist() == \
        [10, 5, 9, 10]


def test_incremental_dedup_known_answer(tmp_path, ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import incremental_dedup
    # mod=3: doc 0,3 existing; 1,2,4,5 incoming.
    # "x": in existing (0) and incoming (1,4) -> 2 hit_existing
    # "y": incoming only (2,5) -> 1 dup_within, 1 kept
    docs = {"doc_id": [0, 1, 2, 3, 4, 5],
            "text": ["x", "x", "y", "z", "x", "y"],
            "lang": ["en"] * 6, "source": ["s"] * 6, "n_chars": [1] * 6}
    d = _fixture_dir(tmp_path, documents=docs)
    out = incremental_dedup(d)
    assert out.iloc[0].tolist() == [4, 2, 1, 1]


def test_embedding_pq_reconstruction_reasonable(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import (
        embedding_pq, embedding_quantize)
    pq_out = embedding_pq(SRC)
    assert len(pq_out) == 8
    assert (pq_out["n_vecs"] == 500).all()
    assert (pq_out["mse"] >= 0).all()
    assert pq_out["top_code"].between(0, 15).all()
    # the top code's count is a plurality bound
    assert (pq_out["top_code_count"] * 16 >= pq_out["n_vecs"]).all()


def test_time_decay_monotone_in_recency(tmp_path, ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import time_decay_aggregate
    H = 7 * DAY
    t0 = 1_700_000_000 * 1_000_000
    # user 1's event at T (weight 1), user 2's one halflife earlier
    # (weight 0.5), user 3 two halflives earlier (weight 0.25)
    rows = [(1, t0 + 2 * H, 1, "view"), (2, t0 + H, 2, "view"),
            (3, t0, 3, "view")]
    d = _fixture_dir(tmp_path, events=_events(rows))
    out = (time_decay_aggregate(d).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out["score"].tolist() == [1.0, 0.5, 0.25]


def test_ann_recall_eval_bounds(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import ann_recall_eval
    out = ann_recall_eval(SRC, k=10)
    assert len(out) == 1
    assert 0.0 <= out["recall"][0] <= 1.0
    assert out["n_hit"][0] == round(out["recall"][0] * 10)


def test_corpus_summary_known_answer(tmp_path, ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.textops import corpus_summary
    docs = {"doc_id": [0, 1, 2, 3],
            "text": ["aa bb", "aa bb", "cc", ""],
            "lang": ["en", "en", "de", "fr"],
            "source": ["s0", "s1", "s0", "s0"],
            "n_chars": [5, 5, 2, 0]}
    d = _fixture_dir(tmp_path, documents=docs)
    out = corpus_summary(d).iloc[0]
    # 4 docs, 3 nonempty, 5 tokens, vocab {aa,bb,cc}, 3 langs,
    # 2 sources, 1 dup of 4 -> 0.25, mean len 5/3
    assert out["n_docs"] == 4 and out["n_nonempty"] == 3
    assert out["n_tokens"] == 5 and out["vocab"] == 3
    assert out["n_langs"] == 3 and out["n_sources"] == 2
    assert out["dup_rate"] == 0.25
    assert out["mean_doc_len"] == round(5 / 3, 6)


def test_minhash_error_eval_within_sketch_bounds(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.dedup import minhash_error_eval
    out = minhash_error_eval(SRC)
    assert len(out) > 0
    # 64-hash sketch: sigma = sqrt(J(1-J)/64) <= 1/16; allow 6 sigma
    assert (out["abs_err"] <= 6 * 0.0625).all()
    assert out["est_jaccard"].between(0, 1).all()
