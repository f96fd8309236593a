"""Persisted IVF index: query equals the recompute-per-query variant,
the build is resumable (committed partitions skipped), and the cache
key tracks content, not just path."""
import os
import shutil

import pandas as pd

from whitebox_geospatial_analysis_tools_ray.stages import ann

SF = "/root/testdata/sf0.001"


def test_persisted_matches_recompute(ray_session):
    a = ann.ivf_topk(SF).to_pandas().reset_index(drop=True)
    b = ann.ivf_topk_persisted(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["vec_id", "cosine"]],
                                  b[["vec_id", "cosine"]],
                                  check_dtype=False)


def test_build_is_resumable(ray_session, tmp_path):
    """Delete the _SUCCESS marker and one partition: the rebuild writes
    ONLY the missing partition (manifest rows for committed partitions
    are honoured) and the index still answers correctly."""
    out = str(tmp_path / "ivf")
    ann.ivf_build(SF, out_dir=out)
    parts = sorted(p for p in os.listdir(out) if p.startswith("part-"))
    assert len(parts) > 1
    victim = os.path.join(out, parts[0])
    os.remove(victim)
    os.remove(os.path.join(out, "_SUCCESS"))
    # drop the victim's manifest row so the writer re-emits it
    mpath = os.path.join(out, "_MANIFEST.jsonl")
    keep = [ln for ln in open(mpath)
            if f'"path": "{victim}"' not in ln]
    with open(mpath, "w") as f:
        f.writelines(keep)
    before = {p: os.path.getmtime(os.path.join(out, p))
              for p in parts[1:] if os.path.exists(os.path.join(out, p))}
    ann.ivf_build(SF, out_dir=out)
    assert os.path.exists(victim)          # rebuilt
    for p, m in before.items():            # untouched survivors
        assert os.path.getmtime(os.path.join(out, p)) == m


def test_cache_key_tracks_content(tmp_path):
    """ADVICE regression: the cache key must track CONTENT. A file
    regenerated with different data but identical size and preserved
    mtime (the cp -p / rsync -a failure mode) must invalidate the
    cache; an mtime-only touch must NOT."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from whitebox_geospatial_analysis_tools_ray.state.checkpoint import (
        commit_cache_key, content_cache_dir, content_fingerprint)

    src = str(tmp_path / "t.parquet")

    def write(vals):
        pq.write_table(pa.table({"v": pa.array(vals, type=pa.int64())}),
                       src, compression="NONE")

    write(np.arange(100))
    st = os.stat(src)
    fp1 = content_fingerprint(src, "p")
    # mtime-only touch: fingerprint unchanged
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns + 10**9))
    assert content_fingerprint(src, "p") == fp1
    # different data, same size, mtime restored to the original
    write(np.arange(100, 200))
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert os.path.getsize(src) == st.st_size
    assert content_fingerprint(src, "p") != fp1

    # dir lifecycle: build -> valid; content change -> wiped
    write(np.arange(100))
    d, valid = content_cache_dir(src, "graft_testcache", "p")
    assert not valid
    open(os.path.join(d, "artifact"), "w").write("x")
    commit_cache_key(d, src, "p")
    d2, valid2 = content_cache_dir(src, "graft_testcache", "p")
    assert d2 == d and valid2
    assert os.path.exists(os.path.join(d, "artifact"))
    write(np.arange(200, 300))
    d3, valid3 = content_cache_dir(src, "graft_testcache", "p")
    assert d3 == d and not valid3
    assert not os.path.exists(os.path.join(d, "artifact"))  # wiped
    shutil.rmtree(d, ignore_errors=True)


def test_trained_ivf_recall_and_determinism(ray_session):
    """Round-2 verdict item 4: the k-means-trained quantizer must reach
    recall@k >= the seeded quantizer's on the same (n_lists, nprobe)
    budget, beat a non-trivial floor vs the brute-force ground truth,
    and be deterministic across runs."""
    k = 20
    t1 = ann.ivf_topk_trained(SF, k=k).to_pandas()
    t2 = ann.ivf_topk_trained(SF, k=k).to_pandas()
    pd.testing.assert_frame_equal(t1, t2)      # deterministic
    rt, rs = [], []
    for q in (0, 50, 123, 200, 444):           # averaged: per-query noisy
        truth = set(ann.cosine_topk(SF, k=k,
                                    query_vec_id=q).to_pandas()["vec_id"])
        seeded = set(ann.ivf_topk(SF, k=k,
                                  query_vec_id=q).to_pandas()["vec_id"])
        trained = set(ann.ivf_topk_trained(
            SF, k=k, query_vec_id=q).to_pandas()["vec_id"])
        rt.append(len(trained & truth) / k)
        rs.append(len(seeded & truth) / k)
    assert sum(rt) / len(rt) >= sum(rs) / len(rs)   # training helps
    assert sum(rt) / len(rt) >= 0.6                 # non-trivial floor
