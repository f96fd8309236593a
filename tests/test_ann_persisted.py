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
    """Same path, different bytes → different index dir (the
    stale-fixture failure mode from round 1's red row)."""
    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy(f"{SF}/embeddings.parquet", d / "embeddings.parquet")
    # compute the key twice: once fresh, once after touching the file
    import hashlib
    src = str(d / "embeddings.parquet")
    st = os.stat(src)
    key1 = hashlib.md5(
        f"{src}|{st.st_size}|{st.st_mtime_ns}|16|6|v1".encode()).hexdigest()
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    st2 = os.stat(src)
    key2 = hashlib.md5(
        f"{src}|{st2.st_size}|{st2.st_mtime_ns}|16|6|v1".encode()).hexdigest()
    assert key1 != key2
