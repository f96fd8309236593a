"""events_asof_join: naive per-row mirror incl. tie semantics (equal
timestamps across left/right must NOT match — strictly prior only)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from whitebox_geospatial_analysis_tools_ray.stages import relational


def _write_events(d, rows):
    d.mkdir(exist_ok=True)
    df = pd.DataFrame(rows, columns=["event_id", "ts_us", "user_id",
                                     "event_type"])
    tbl = pa.table({
        "event_id": pa.array(df["event_id"], pa.int64()),
        "ts": pa.array(df["ts_us"], pa.timestamp("us")),
        "user_id": pa.array(df["user_id"], pa.int64()),
        "event_type": pa.array(df["event_type"], pa.string()),
        "value": pa.array(np.zeros(len(df)), pa.float64()),
        "props": pa.array(["{}"] * len(df), pa.string())})
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


def _mirror(rows, lt="purchase", rt="signup"):
    out = []
    for eid, ts, uid, et in rows:
        if et != lt:
            continue
        prior = [t for _, t, u, e in rows
                 if e == rt and u == uid and t < ts]
        if prior:
            out.append((eid, uid, 1, ts - max(prior)))
        else:
            out.append((eid, uid, 0, -1))
    return (pd.DataFrame(out, columns=["event_id", "user_id",
                                       "has_prior", "gap_us"])
            .sort_values("event_id").reset_index(drop=True))


def test_asof_join_mirror_with_ties(ray_session, tmp_path):
    rows = [
        (0, 100, 1, "signup"),
        (1, 100, 1, "purchase"),   # tie: signup at SAME ts -> no match
        (2, 200, 1, "purchase"),   # matches signup@150, gap 50
        (3, 150, 1, "signup"),
        (4, 300, 1, "purchase"),   # matches signup@150, gap 150
        (5, 50, 2, "purchase"),    # user 2: no signup at all
        (6, 60, 2, "signup"),
        (7, 60, 2, "signup"),      # duplicate-ts signups
        (8, 90, 2, "purchase"),    # gap 30 (either dup, same ts)
        (9, 10, 3, "click"),       # other types ignored
        (10, 20, 3, "purchase"),   # no signup for user 3
    ]
    d = _write_events(tmp_path / "ev", rows)
    got = (relational.events_asof_join(d).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    want = _mirror(rows)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    g = got.set_index("event_id")
    assert g.loc[1, "has_prior"] == 0          # strict: ties don't match
    assert g.loc[2, "gap_us"] == 50 and g.loc[4, "gap_us"] == 150
    assert g.loc[8, "gap_us"] == 30
    assert g.loc[10, "has_prior"] == 0


def test_asof_join_mirror_random(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    rows = []
    for eid in range(300):
        rows.append((eid, int(rng.integers(0, 1000)),
                     int(rng.integers(0, 12)),
                     str(rng.choice(["purchase", "signup", "click"]))))
    d = _write_events(tmp_path / "ev2", rows)
    got = (relational.events_asof_join(d).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    want = _mirror(rows)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sliding_window_mirror(ray_session, tmp_path):
    """Each event must land in exactly window/hop windows, with exact
    integer-µs boundary semantics ([w·hop, w·hop + window))."""
    W, H = 3600, 900
    rows = [
        (0, 0, 1, "purchase"),                     # ts = epoch 0
        (1, 900 * 10**6, 1, "purchase"),           # exact hop boundary
        (2, 3600 * 10**6, 1, "purchase"),          # exact window length
        (3, 3599 * 10**6 + 999999, 1, "purchase"),
        (4, 5000 * 10**6, 2, "signup"),
    ]
    d = _write_events(tmp_path / "sw", rows)
    from whitebox_geospatial_analysis_tools_ray.stages.relational import (
        events_sliding_window)
    got = (events_sliding_window(d, W, H).to_pandas()
           .sort_values(["event_type", "window_id"])
           .reset_index(drop=True))
    # literal mirror
    agg = {}
    for _, us, _, et in rows:
        hi = us // (H * 10**6)
        lo = (us - W * 10**6) // (H * 10**6) + 1
        for w in range(lo, hi + 1):
            k = (et, w)
            n, s = agg.get(k, (0, 0.0))
            agg[k] = (n + 1, s + 0.0)
    want = (pd.DataFrame(
        [(et, w, n, round(s, 6)) for (et, w), (n, s) in agg.items()],
        columns=["event_type", "window_id", "n_events", "sum_value"])
        .sort_values(["event_type", "window_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every event covers exactly W/H windows
    assert got["n_events"].sum() == len(rows) * (W // H)
