"""Property tests: the distributed event-analytics operators
(funnel / retention / interval join) against literal per-user
brute-force mirrors on RANDOM event streams — guards the bucketing and
searchsorted plumbing against fixture-specific luck. Example counts
are small (each example runs a Ray pipeline); failures shrink to tiny
streams."""

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

HOUR = 3600 * 1_000_000
DAY = 24 * HOUR
WEEK = 7 * DAY
T0 = 1_700_000_000 * 1_000_000

TYPES = ["view", "click", "purchase"]

events_strategy = st.lists(
    st.tuples(st.integers(0, 7),                  # user_id
              st.integers(0, 40),                 # offset in 6h steps
              st.sampled_from(TYPES)),
    min_size=1, max_size=40)


def _write_events(tmpdir, rows):
    d = str(tmpdir)
    os.makedirs(d, exist_ok=True)
    src_schema = pq.read_table(f"{SRC}/events.parquet").schema
    n = len(rows)
    tbl = {
        "event_id": list(range(1, n + 1)),
        "ts": pa.array([T0 + r[1] * 6 * HOUR for r in rows],
                       pa.timestamp("us")),
        "user_id": [r[0] for r in rows],
        "event_type": [r[2] for r in rows],
        "value": [1.0] * n, "props": ["{}"] * n}
    pq.write_table(pa.table(tbl, schema=src_schema),
                   f"{d}/events.parquet")
    for t in TABLES:
        if t == "events":
            continue
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{d}/{t}.parquet")
    return d


def _brute_funnel(rows, steps=("view", "click", "purchase"),
                  horizon=7 * 24 * 3600 * 1_000_000):
    df = pd.DataFrame({"u": [r[0] for r in rows],
                       "t": [T0 + r[1] * 6 * HOUR for r in rows],
                       "e": [r[2] for r in rows]})
    counts, gaps = [0] * len(steps), [0] * len(steps)
    for u, g in df.groupby("u"):
        t_prev = None
        t_zero = None
        for i, s in enumerate(steps):
            cand = g[(g["e"] == s)]
            if i > 0:
                cand = cand[cand["t"] > t_prev]
            if cand.empty:
                break
            t = int(cand["t"].min())
            if i == 0:
                t_zero = t
            elif t - t_zero > horizon:
                break
            counts[i] += 1
            gaps[i] += (t - t_zero) if i > 0 else 0
            t_prev = t
    return counts, gaps


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=events_strategy)
def test_funnel_matches_brute_force(tmp_path_factory, ray_session, rows):
    from whitebox_geospatial_analysis_tools_ray.stages.selection import events_funnel
    d = _write_events(tmp_path_factory.mktemp("ev"), rows)
    out = events_funnel(d).sort_values("step_index")
    counts, gaps = _brute_funnel(rows)
    assert out["n_users"].tolist() == counts
    assert out["total_gap_us"].tolist() == gaps


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=events_strategy)
def test_interval_join_matches_brute_force(tmp_path_factory, ray_session,
                                           rows):
    from whitebox_geospatial_analysis_tools_ray.stages.relational import (
        events_interval_join)
    d = _write_events(tmp_path_factory.mktemp("ev"), rows)
    out = events_interval_join(d, left_type="view", right_type="click",
                               before_us=12 * HOUR,
                               after_us=6 * HOUR).to_pandas()
    # an all-empty result may come back schema-less (Ray drops pandas
    # block schemas when every bucket is 0-row) — ≡ empty mapping
    got = dict(zip(out["event_id"], out["n_right"])) \
        if "event_id" in out.columns else {}
    want = {}
    for i, (u, off, e) in enumerate(rows):
        if e != "view":
            continue
        t = T0 + off * 6 * HOUR
        n = sum(1 for (u2, off2, e2) in rows
                if u2 == u and e2 == "click"
                and t - 12 * HOUR <= T0 + off2 * 6 * HOUR <= t + 6 * HOUR)
        want[i + 1] = n
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=events_strategy)
def test_retention_matches_brute_force(tmp_path_factory, ray_session,
                                       rows):
    from whitebox_geospatial_analysis_tools_ray.stages.relational import (
        events_retention)
    d = _write_events(tmp_path_factory.mktemp("ev"), rows)
    out = events_retention(d).to_pandas()
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in out.itertuples()}
    per_user = {}
    for (u, off, _e) in rows:
        wk = (T0 + off * 6 * HOUR) // WEEK
        per_user.setdefault(u, set()).add(wk)
    want: dict[tuple[int, int], int] = {}
    for u, wks in per_user.items():
        cw = min(wks)
        for wk in wks:
            k = (cw, wk - cw)
            want[k] = want.get(k, 0) + 1
    assert got == want
