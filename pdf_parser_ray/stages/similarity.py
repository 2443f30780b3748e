"""Similarity search over an embedding column (list<float>).

- knn_bruteforce: exact cosine top-k — per-batch numpy matmul against a
  broadcast query matrix, per-batch top-k partials, tiny final merge.
  This is the baseline (and the DuckDB-oracle-checkable one).
- knn_lsh: the scale path — random-hyperplane buckets; the query probes
  only matching buckets (multi-probe over Hamming-1 neighbors), then
  exact re-rank. Recall < 1 by design; use for 10^9+ corpora where a
  full scan per query is off the table.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import pandas as pd


def _cosine_batch(batch: pd.DataFrame, q: np.ndarray, k: int,
                  vec_col: str, id_col: str,
                  exclude_id) -> pd.DataFrame:
    vecs = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    qn = np.linalg.norm(q)
    denom = norms * qn
    sims = np.where(denom > 0, vecs @ q / np.where(denom == 0, 1, denom), 0.0)
    out = pd.DataFrame({id_col: batch[id_col],
                        "cos_sim": np.round(sims, 4)})
    if exclude_id is not None:
        out = out[out[id_col] != exclude_id]
    return out.sort_values(["cos_sim", id_col],
                           ascending=[False, True]).head(k)


def knn_bruteforce(ds, query_vec, k: int = 10, *,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   exclude_id=None, batch_size: int = 8192) -> pd.DataFrame:
    """Exact cosine top-k: partial top-k per batch, final merge of
    k x n_blocks rows on the driver. Ties broken by id ascending (total
    deterministic order)."""
    q = np.asarray(query_vec, dtype=np.float64)
    fn = functools.partial(_cosine_batch, q=q, k=k, vec_col=vec_col,
                           id_col=id_col, exclude_id=exclude_id)
    partials = ds.map_batches(fn, batch_format="pandas",
                              batch_size=batch_size).to_pandas()
    return (partials.sort_values(["cos_sim", id_col],
                                 ascending=[False, True])
            .head(k).reset_index(drop=True))


def train_ivf_centroids(ds, *, n_clusters: int = 16, sample_size: int = 2048,
                        n_iter: int = 10, seed: int = 99,
                        vec_col: str = "embedding") -> np.ndarray:
    """Train IVF coarse centroids: seeded sample of the corpus (driver
    holds only sample_size vectors), Lloyd's k-means in numpy. At real
    scale the sample is a `random_sample` read; centroids are tiny and
    broadcast to every probe/assign task."""
    sample = ds.random_sample(1.0, seed=seed).limit(sample_size).to_pandas()
    X = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    # Block arrival order varies under a busy cluster; sort the sample
    # rows lexicographically so k-means init (and thus the trained
    # centroids) is invariant to physical block ordering.
    X = X[np.lexsort(X.T[::-1])]
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(n_clusters, len(X)),
                         replace=False)]
    for _ in range(n_iter):
        sims = X @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def knn_ivf(ds, query_vec, k: int = 10, *, n_clusters: int = 16,
            nprobe: int = 4, vec_col: str = "embedding",
            id_col: str = "vec_id", exclude_id=None, seed: int = 99,
            batch_size: int = 8192, with_stats: bool = False):
    """IVF approximate top-k: assign every vector to its nearest coarse
    centroid per batch (broadcast centroid matrix, one matmul), keep
    only vectors whose centroid is among the query's ``nprobe`` nearest,
    exact re-rank inside the probed subset. Scan fraction ~nprobe/n_clusters."""
    q = np.asarray(query_vec, dtype=np.float64)
    cents = train_ivf_centroids(ds, n_clusters=n_clusters, seed=seed,
                                vec_col=vec_col)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = set(np.argsort(-(cents @ qn))[:nprobe].tolist())

    def filter_probed(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True),
                           1e-12)
        assign = ((vecs / norms) @ cents.T).argmax(axis=1)
        return batch[np.isin(assign, list(probe))]

    probed = ds.map_batches(filter_probed, batch_format="pandas",
                            batch_size=batch_size)
    if with_stats:
        probed = probed.materialize()
        return (knn_bruteforce(probed, q, k, vec_col=vec_col,
                               id_col=id_col, exclude_id=exclude_id,
                               batch_size=batch_size),
                probed.count())
    return knn_bruteforce(probed, q, k, vec_col=vec_col, id_col=id_col,
                          exclude_id=exclude_id, batch_size=batch_size)


def _bucket_keys(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    proj = vecs @ planes.T > 0
    return (proj @ (1 << np.arange(planes.shape[0]))).astype(np.int64)


def knn_lsh(ds, query_vec, k: int = 10, *, n_planes: int = 10,
            vec_col: str = "embedding", id_col: str = "vec_id",
            exclude_id=None, seed: int = 777,
            batch_size: int = 8192, with_stats: bool = False):
    """Approximate top-k: probe the query's hyperplane bucket plus all
    Hamming-1 neighbor buckets, exact re-rank inside the probed set."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = np.random.RandomState(seed).standard_normal((n_planes, len(q)))
    qkey = int(_bucket_keys(q[None, :], planes)[0])
    probe = {qkey} | {qkey ^ (1 << i) for i in range(n_planes)}

    def filter_probed(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        keys = _bucket_keys(vecs, planes)
        mask = np.isin(keys, list(probe))
        return batch[mask]

    probed = ds.map_batches(filter_probed, batch_format="pandas",
                            batch_size=batch_size)
    if with_stats:
        probed = probed.materialize()
        return (knn_bruteforce(probed, q, k, vec_col=vec_col,
                               id_col=id_col, exclude_id=exclude_id,
                               batch_size=batch_size),
                probed.count())
    return knn_bruteforce(probed, q, k, vec_col=vec_col, id_col=id_col,
                          exclude_id=exclude_id, batch_size=batch_size)
