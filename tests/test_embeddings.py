"""Embedding ops: distributed k-means == single-process mirror; PCA sanity."""

import numpy as np

from whitebox_geospatial_analysis_tools_ray.stages.embeddings import (
    kmeans_embeddings, kmeans_naive, pca_embeddings)

SF = "/root/testdata/sf0.001"


def test_kmeans_matches_naive(ray_session):
    got = kmeans_embeddings(SF, k=6, iters=5)
    want = kmeans_naive(SF, k=6, iters=5)
    assert got["cluster_id"].tolist() == want["cluster_id"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    np.testing.assert_allclose(got["inertia"], want["inertia"], rtol=0, atol=0)
    assert got["n"].sum() == 500


def test_pca_spectrum(ray_session):
    df = pca_embeddings(SF, k=4)
    ev = df["eigenvalue"].to_numpy()
    assert (np.diff(ev) <= 0).all()          # descending
    assert (ev > 0).all()
    assert df["explained_ratio"].iloc[0] < 1.0
    # mirror with plain numpy
    from whitebox_geospatial_analysis_tools_ray.stages.embeddings import _full_matrix
    _, emb = _full_matrix(SF)
    cov = np.cov(emb, rowvar=False)
    want = np.linalg.eigvalsh(cov)[::-1][:4]
    np.testing.assert_allclose(ev, want, atol=1e-5)


def test_inverse_pca_matches_single_process_mirror():
    import numpy as np
    from whitebox_geospatial_analysis_tools_ray.stages.embeddings import (
        _full_matrix, inverse_pca_embeddings)

    sf = "/root/testdata/sf0.001"
    out = inverse_pca_embeddings(sf, k=4)
    _, x = _full_matrix(sf)
    mu = x.mean(axis=0)
    xc = x - mu
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    V = evecs[:, np.argsort(evals)[::-1][:4]]
    err = xc - (xc @ V) @ V.T
    sse = float((err ** 2).sum())
    sst = float((xc ** 2).sum())
    assert abs(out["recon_error"].iloc[0] - sse) < 1e-4 * max(sse, 1.0)
    assert abs(out["retained_ratio"].iloc[0] - (1 - sse / sst)) < 1e-6
    assert 0.0 <= out["retained_ratio"].iloc[0] <= 1.0


def test_cluster_attributes_matches_single_process_lloyd():
    import numpy as np
    import pyarrow.parquet as pq

    from whitebox_geospatial_analysis_tools_ray.stages.embeddings import (
        cluster_attributes)

    sf = "/root/testdata/sf0.001"
    out = cluster_attributes(sf, k=5, iters=8)
    t = pq.read_table(f"{sf}/customer.parquet").to_pandas()
    t = t.sort_values("c_custkey").reset_index(drop=True)
    a = t["c_acctbal"].to_numpy(); nk = t["c_nationkey"].to_numpy(float)
    mu = np.array([a.mean(), nk.mean()])
    sd = np.array([a.std(), nk.std()])
    x = np.stack([(a - mu[0]) / sd[0], (nk - mu[1]) / sd[1]], axis=1)
    cents = x[:5].copy()
    for _ in range(8):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = d2.argmin(axis=1)
        for c in range(5):
            if (lab == c).any():
                cents[c] = x[lab == c].mean(axis=0)
        cents = np.round(cents, 9)
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    lab = d2.argmin(axis=1)
    exp_n = np.bincount(lab, minlength=5)
    assert np.array_equal(out.sort_values("cluster_id")["n"].to_numpy(),
                          exp_n)
