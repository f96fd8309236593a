"""MinHash-LSH: distributed verify matches a literal driver mirror;
mega-buckets degrade to linear star pairs (never O(m²))."""
import numpy as np
import pandas as pd
import pytest

from whitebox_geospatial_analysis_tools_ray.stages import dedup

SF = "/root/testdata/sf0.001"


def _mirror_verified(sf_dir: str, threshold: float = 0.6) -> pd.DataFrame:
    """Single-process replay: candidates → exact Jaccard (the round-1
    driver-side loop, kept as the correctness mirror)."""
    import pyarrow.parquet as pq

    cand = dedup.minhash_candidates(sf_dir).to_pandas()
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    lut = {int(r.doc_id): dedup._shingle_crcs(r.text)
           for r in t.itertuples()}
    out = {"doc_a": [], "doc_b": [], "jaccard": []}
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = lut[int(a)], lut[int(b)]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        denom = len(sa) + len(sb) - inter
        j = inter / denom if denom else 0.0
        if j >= threshold:
            out["doc_a"].append(int(a))
            out["doc_b"].append(int(b))
            out["jaccard"].append(round(j, 6))
    return (pd.DataFrame(out).sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True))


def test_verified_pairs_match_driver_mirror(ray_session):
    got = dedup.minhash_verified_pairs(SF)
    want = _mirror_verified(SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    assert len(got) > 0          # the corpus has near-dups by design


def test_verified_pairs_large_path_matches_small(ray_session):
    """max_driver_pairs=0 forces the fully distributed two-shuffle
    verify; it must equal the size-adaptive driver path bit for bit."""
    small = dedup.minhash_verified_pairs(SF)
    large = dedup.minhash_verified_pairs(SF, max_driver_pairs=0)
    pd.testing.assert_frame_equal(
        large.reset_index(drop=True), small.reset_index(drop=True),
        check_dtype=False)


def test_mega_bucket_caps_to_star_pairs(ray_session, tmp_path):
    """3,000 identical docs land in ONE bucket per band; the capped
    pair generator must emit O(m) star pairs, not C(m,2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    m = 3000
    tbl = pa.table({
        "doc_id": np.arange(m, dtype=np.int64),
        "text": ["the same boilerplate page content again and again"] * m})
    d = tmp_path / "mega"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")

    cand = dedup.minhash_candidates(str(d), max_bucket=256).to_pandas()
    # star pairs: every doc connected to the min-id hub, exactly once
    assert len(cand) == m - 1
    assert set(cand["doc_a"]) == {0}
    assert set(cand["doc_b"]) == set(range(1, m))


def test_small_buckets_unchanged_by_cap(ray_session):
    uncapped = (dedup.minhash_candidates(SF, max_bucket=10**9)
                .to_pandas().sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True))
    capped = (dedup.minhash_candidates(SF)
              .to_pandas().sort_values(["doc_a", "doc_b"])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(capped, uncapped)


def test_ngram_jaccard_matches_brute_force(ray_session):
    """ngram_jaccard_pairs == single-process brute-force all-pairs
    Jaccard over the same shingle-crc sets (no LSH miss possible)."""
    import itertools

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    sets = {int(r.doc_id): set(dedup._shingle_crcs(r.text).tolist())
            for r in docs.itertuples()}
    rows = []
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if not inter:
            continue
        j = inter / (len(sets[a]) + len(sets[b]) - inter)
        if j >= 0.5:
            rows.append((a, b, np.floor(j * 1e6 + 0.5) / 1e6))
    want = pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])
    got = (dedup.ngram_jaccard_pairs(SF).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_simhash_neardup_matches_brute_force(ray_session):
    """Banded candidates + Hamming verify == single-process all-pairs
    (banding is lossless for max_hamming <= 3 by pigeonhole)."""
    import itertools

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    sigs = {int(r.doc_id): dedup._simhash_of(r.text)
            for r in docs.itertuples()}
    rows = [(a, b, bin(sigs[a] ^ sigs[b]).count("1"))
            for a, b in itertools.combinations(sorted(sigs), 2)
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3]
    want = pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])
    got = (dedup.simhash_neardup_pairs(SF).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_minhash_affine_arithmetic_is_exact():
    """(a·x+b) mod (2^61−1) must equal arbitrary-precision integer
    arithmetic (the SQL oracle's HUGEINT) — the naive int64 expression
    silently wrapped at a·x ~ 2^93 and computed a DIFFERENT hash
    family (regression pin for the round-3 part-4 fix)."""
    import numpy as np
    from whitebox_geospatial_analysis_tools_ray.stages.dedup import (
        _MERSENNE, _minhash_params, _mod_mersenne_affine)
    a, b = _minhash_params(42)
    rng = np.random.default_rng(99)
    x = np.concatenate([rng.integers(0, 1 << 32, 100),
                        [0, 1, (1 << 32) - 1]]).astype(np.int64)
    got = _mod_mersenne_affine(a, b, x)
    want = np.array([[(int(ai) * int(xi) + int(bi)) % _MERSENNE
                      for xi in x] for ai, bi in zip(a, b)])
    assert (got == want).all()
    # and the naive int64 path really does differ (the bug was real)
    naive = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
    assert not (naive == want).all()
