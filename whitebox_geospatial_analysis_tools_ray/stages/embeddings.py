"""Embedding-space training-data ops: cosine near-dup, PCA, k-means.

These extend the reference's model-state family (SURVEY.md §2.3:
PrincipalComponentAnalysis.java 929 LoC, kMeansClassification.java 453
LoC — two-phase fit-then-apply / iterative driver loops) onto the graft's
embedding column, and add the exact embedding-cosine near-duplicate pass a
100 TB text pipeline needs next to MinHash/SimHash.

Scale notes (documented partitioning assumptions):
- near-dup: the probe side streams; the comparison side is a broadcast
  L2-normalized matrix (`ray.put` once, read per actor). At 10^12 rows
  the broadcast side must become IVF buckets (`ann.ivf_topk` pattern:
  coarse-quantize → groupby bucket → in-bucket matmul); the all-pairs
  form here is the exact-verification kernel both variants share.
- PCA: one pass of partial (n, Σx, Σxᵀx) per batch → driver eigh of the
  D×D covariance (D small) — the classic partial+final two-phase fit.
- k-means: driver loop of (broadcast centroids → per-batch assign +
  partial per-cluster sums → tiny groupby) rounds; deterministic seeded
  init (first k by vec_id) and fixed iteration count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .ann import _batch_matrix
from .util import coalesce_partials


def _read_embeddings(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _full_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    emb = np.asarray([np.asarray(e, dtype=np.float64) for e in
                      t["embedding"].to_pylist()])
    order = np.argsort(ids)
    return ids[order], emb[order]


def cosine_neardup_pairs(sf_dir: str, threshold: float = 0.35,
                         round_to: int = 6) -> "rd.Dataset":
    """All pairs (a < b) with cosine ≥ threshold.

    Broadcast the normalized matrix once; each streamed batch multiplies
    against it (one matmul per batch, no Python loop)."""
    ids_all, emb_all = _full_matrix(sf_dir)
    norms = np.sqrt((emb_all * emb_all).sum(axis=1))
    norms[norms == 0] = 1.0
    mat_ref = ray.put((ids_all, emb_all / norms[:, None]))

    def partial(batch) -> pd.DataFrame:
        aids, aemb = _batch_matrix(batch)
        bids, bmat = ray.get(mat_ref) if isinstance(mat_ref, ray.ObjectRef) \
            else mat_ref
        an = np.sqrt((aemb * aemb).sum(axis=1))
        an[an == 0] = 1.0
        cos = (aemb / an[:, None]) @ bmat.T
        ia, ib = np.nonzero(cos >= threshold)
        keep = aids[ia] < bids[ib]
        return pd.DataFrame({
            "doc_a": aids[ia][keep], "doc_b": bids[ib][keep],
            "cosine": np.round(cos[ia, ib][keep], round_to)})

    return _read_embeddings(sf_dir).map_batches(partial, batch_format="numpy")


def pca_embeddings(sf_dir: str, k: int = 4, round_to: int = 6) -> pd.DataFrame:
    """Distributed PCA fit: per-batch partial (n, Σx, ΣxᵀX) → driver
    covariance + eigh. Output (component, eigenvalue, explained_ratio) —
    eigen-vectors are sign-ambiguous so only spectra are reported."""
    ds = _read_embeddings(sf_dir)

    def partial(batch) -> pd.DataFrame:
        _, emb = _batch_matrix(batch)
        return pd.DataFrame({
            "n": [float(len(emb))],
            "sx": [emb.sum(axis=0).tobytes()],
            "sxx": [(emb.T @ emb).tobytes()],
        })

    parts = ds.map_batches(partial, batch_format="numpy").to_pandas()
    d = int(np.sqrt(len(np.frombuffer(parts["sxx"].iloc[0]))))
    n = parts["n"].sum()
    sx = np.sum([np.frombuffer(b) for b in parts["sx"]], axis=0)
    sxx = np.sum([np.frombuffer(b).reshape(d, d) for b in parts["sxx"]], axis=0)
    mean = sx / n
    cov = (sxx - np.outer(sx, mean) - np.outer(mean, sx)
           + n * np.outer(mean, mean)) / (n - 1)
    evals = np.linalg.eigvalsh(cov)[::-1][:k]
    total = np.trace(cov)
    return pd.DataFrame({
        "component": np.arange(k, dtype=np.int64),
        "eigenvalue": np.round(evals, round_to),
        "explained_ratio": np.round(evals / total, round_to)})


def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 10,
                      round_to: int = 4) -> pd.DataFrame:
    """Lloyd's k-means as a driver loop of broadcast-assign rounds
    (kMeansClassification.java's iterative structure, distributed).

    Deterministic: init = the k lowest vec_ids' vectors; fixed ``iters``
    rounds; ties in assignment go to the lowest cluster id (argmin).
    Output: (cluster_id, n, inertia)."""
    ids, emb = _full_matrix(sf_dir)
    centroids = emb[:k].copy()
    ds = _read_embeddings(sf_dir)

    for _ in range(iters):
        c_ref = ray.put(centroids)

        def partial(batch, _ref=c_ref) -> pd.DataFrame:
            cents = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
            _, x = _batch_matrix(batch)
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            sums = np.zeros_like(cents)
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=len(cents)).astype(np.float64)
            return pd.DataFrame({
                "c": np.arange(len(cents), dtype=np.int64),
                "n": cnt,
                "sx": [row.tobytes() for row in sums],
            })

        parts = coalesce_partials(
            ds.map_batches(partial, batch_format="numpy")).to_pandas()
        agg = parts.groupby("c")
        for c, g in agg:
            nn = g["n"].sum()
            if nn > 0:
                centroids[int(c)] = np.sum(
                    [np.frombuffer(b) for b in g["sx"]], axis=0) / nn
        # round each broadcast round so partial-sum accumulation order can
        # never drift an assignment across engines/parallelism levels
        centroids = np.round(centroids, 9)

    # final assignment + inertia
    c_ref = ray.put(centroids)

    def final(batch) -> pd.DataFrame:
        cents = ray.get(c_ref) if isinstance(c_ref, ray.ObjectRef) else c_ref
        _, x = _batch_matrix(batch)
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        return pd.DataFrame({
            "cluster_id": np.arange(len(cents), dtype=np.int64),
            "n": np.bincount(a, minlength=len(cents)).astype(np.int64),
            "inertia": np.bincount(a, weights=d2.min(axis=1),
                                   minlength=len(cents))})

    parts = ds.map_batches(final, batch_format="numpy").to_pandas()
    out = parts.groupby("cluster_id", as_index=False).agg(
        n=("n", "sum"), inertia=("inertia", "sum"))
    out["inertia"] = out["inertia"].round(round_to)
    out["n"] = out["n"].astype("int64")
    return out.sort_values("cluster_id").reset_index(drop=True)


def kmeans_naive(sf_dir: str, k: int = 8, iters: int = 10,
                 round_to: int = 4) -> pd.DataFrame:
    """Single-process mirror for tests."""
    ids, emb = _full_matrix(sf_dir)
    cents = emb[:k].copy()
    for _ in range(iters):
        d2 = ((emb[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                cents[c] = emb[m].sum(axis=0) / m.sum()
        cents = np.round(cents, 9)
    d2 = ((emb[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    return pd.DataFrame({
        "cluster_id": np.arange(k, dtype=np.int64),
        "n": np.bincount(a, minlength=k).astype(np.int64),
        "inertia": np.round(np.bincount(a, weights=d2.min(axis=1),
                                        minlength=k), round_to)})


def inverse_pca_embeddings(sf_dir: str, k: int = 4,
                           round_to: int = 6) -> pd.DataFrame:
    """InversePrincipalComponentAnalysis (WhiteboxGIS/resources/plugins/
    source_files + Scripts — reconstruct the signal from the leading
    components): fit = the pca_embeddings partial-moments pass + driver
    eigh (eigenVECTORS this time, sign fixed deterministically: first
    nonzero coordinate made positive); apply = broadcast (mean,
    components) + one stateless map computing per-batch reconstruction
    moments x̂ = μ + V Vᵀ (x − μ). Output one row
    (k, total_var, recon_error, retained_ratio); rows-only, verified
    against the single-process mirror in tests."""
    ds = _read_embeddings(sf_dir)

    def partial(batch) -> pd.DataFrame:
        _, emb = _batch_matrix(batch)
        return pd.DataFrame({
            "n": [float(len(emb))],
            "sx": [emb.sum(axis=0).tobytes()],
            "sxx": [(emb.T @ emb).tobytes()],
        })

    parts = ds.map_batches(partial, batch_format="numpy").to_pandas()
    d = int(np.sqrt(len(np.frombuffer(parts["sxx"].iloc[0]))))
    n = parts["n"].sum()
    sx = np.sum([np.frombuffer(b) for b in parts["sx"]], axis=0)
    sxx = np.sum([np.frombuffer(b).reshape(d, d) for b in parts["sxx"]],
                 axis=0)
    mean = sx / n
    cov = (sxx - np.outer(sx, mean) - np.outer(mean, sx)
           + n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    V = evecs[:, order]
    for j in range(V.shape[1]):          # deterministic sign
        nz = np.flatnonzero(np.abs(V[:, j]) > 1e-12)
        if len(nz) and V[nz[0], j] < 0:
            V[:, j] = -V[:, j]
    ref = ray.put((mean, V))

    def recon(batch, _ref=ref) -> pd.DataFrame:
        mu, comp = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        _, x = _batch_matrix(batch)
        xc = x - mu
        err = xc - (xc @ comp) @ comp.T
        return pd.DataFrame({"sse": [float((err ** 2).sum())],
                             "sst": [float((xc ** 2).sum())]})

    stats = ds.map_batches(recon, batch_format="numpy").to_pandas()
    sse = float(stats["sse"].sum())
    sst = float(stats["sst"].sum())
    return pd.DataFrame({
        "k": [k],
        "total_var": [round(sst, round_to)],
        "recon_error": [round(sse, round_to)],
        "retained_ratio": [round(1.0 - sse / sst, round_to)]})


def cluster_attributes(sf_dir: str, k: int = 5, iters: int = 8,
                       round_to: int = 4) -> pd.DataFrame:
    """ClusterAttributes (WhiteboxGIS Scripts — k-means over a feature
    table's ATTRIBUTE vectors instead of imagery): the
    kMeansClassification broadcast-round machinery applied to a
    2-D attribute matrix (c_acctbal, c_nationkey) z-scored per
    attribute (one global-moments pass) so neither dominates.
    Deterministic: init = the k lowest custkeys' vectors, fixed
    ``iters`` rounds, per-round centroid rounding (the
    kmeans_embeddings drift rule). Output (cluster_id, n, inertia);
    rows-only, mirror-tested."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_acctbal", "c_nationkey"])

    def moments(batch) -> pd.DataFrame:
        a = np.asarray(batch["c_acctbal"], dtype=np.float64)
        nk = np.asarray(batch["c_nationkey"], dtype=np.float64)
        return pd.DataFrame({
            "n": [float(len(a))],
            "sa": [a.sum()], "saa": [(a * a).sum()],
            "sn": [nk.sum()], "snn": [(nk * nk).sum()]})

    m = ds.map_batches(moments, batch_format="numpy").to_pandas().sum()
    n = m["n"]
    mu = np.array([m["sa"] / n, m["sn"] / n])
    var = np.array([m["saa"] / n - mu[0] ** 2, m["snn"] / n - mu[1] ** 2])
    sd = np.sqrt(np.maximum(var, 1e-30))

    def matrix(batch):
        ids = np.asarray(batch["c_custkey"], dtype=np.int64)
        x = np.stack([
            (np.asarray(batch["c_acctbal"], dtype=np.float64) - mu[0])
            / sd[0],
            (np.asarray(batch["c_nationkey"], dtype=np.float64) - mu[1])
            / sd[1]], axis=1)
        return ids, x

    init = ds.take(k)
    centroids = np.stack([
        np.array([(r["c_acctbal"] - mu[0]) / sd[0],
                  (r["c_nationkey"] - mu[1]) / sd[1]])
        for r in sorted(init, key=lambda r: r["c_custkey"])])

    from .util import coalesce_partials
    for _ in range(iters):
        c_ref = ray.put(centroids)

        def partial(batch, _ref=c_ref) -> pd.DataFrame:
            cents = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) \
                else _ref
            _, x = matrix(batch)
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            sums = np.zeros_like(cents)
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=len(cents)).astype(np.float64)
            return pd.DataFrame({
                "c": np.arange(len(cents), dtype=np.int64),
                "n": cnt,
                "sx": [row.tobytes() for row in sums]})

        parts = coalesce_partials(
            ds.map_batches(partial, batch_format="numpy")).to_pandas()
        for c, g in parts.groupby("c"):
            nn = g["n"].sum()
            if nn > 0:
                centroids[int(c)] = np.sum(
                    [np.frombuffer(b) for b in g["sx"]], axis=0) / nn
        centroids = np.round(centroids, 9)

    c_ref = ray.put(centroids)

    def final(batch, _ref=c_ref) -> pd.DataFrame:
        cents = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        _, x = matrix(batch)
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        return pd.DataFrame({
            "cluster_id": np.arange(len(cents), dtype=np.int64),
            "n": np.bincount(a, minlength=len(cents)).astype(np.int64),
            "inertia": np.round(np.bincount(
                a, weights=d2[np.arange(len(a)), a],
                minlength=len(cents)), round_to)})

    parts = coalesce_partials(
        ds.map_batches(final, batch_format="numpy")).to_pandas()
    g = parts.groupby("cluster_id").agg(n=("n", "sum"),
                                        inertia=("inertia", "sum"))
    g["inertia"] = g["inertia"].round(round_to)
    return g.reset_index()
