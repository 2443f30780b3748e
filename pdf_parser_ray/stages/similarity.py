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


# ------------------------------------------------------- semantic dedup

def semantic_inject_batch(b: pd.DataFrame, *, vec_col: str = "embedding",
                          id_col: str = "vec_id") -> pd.DataFrame:
    """Deterministic near-duplicate fixture for the SemDeDup flow
    (same role as text_analysis.pii_inject_batch): the sf embedding
    corpora are near-orthogonal (max within-label cosine ~0.47 at
    sf0.01), so a semantic-dedup pass over the raw table is vacuous.
    Append, for every ``vec_id % 17 == 0`` row, a collinear copy at
    ``vec_id + 1_000_000`` scaled by 1.25, and for every
    ``vec_id % 51 == 0`` row a second copy at ``vec_id + 3_000_000``
    scaled by 0.8 — cosine ~1.0 to the base (scale-invariant), so the
    %51 rows form size-3 duplicate components that exercise
    transitive clustering. Both the scaling and the id arithmetic are
    mirrored expression-for-expression in the SQL oracle
    (``list_transform(embedding::DOUBLE[], x -> x * 1.25)``); every
    output embedding is float64 so the batch stays one Arrow type."""
    ids = b[id_col].to_numpy(dtype=np.int64)
    if len(ids) and (ids.min() < 0 or ids.max() >= 1_000_000):
        # a real id in the injected ranges would silently merge into a
        # fixture component — refuse instead (fixture is for the sf
        # corpora, whose ids are small and non-negative)
        raise ValueError(
            "semantic_inject_batch: vec_id outside [0, 1e6) collides "
            f"with the injected-id ranges (saw min={ids.min()}, "
            f"max={ids.max()})")
    vecs = [np.asarray(v, dtype=np.float64) for v in b[vec_col]]
    out = b.copy(deep=False)
    out[vec_col] = pd.Series(vecs, index=b.index, dtype=object)
    parts = [out]
    for mod, offset, scale in ((17, 1_000_000, 1.25),
                               (51, 3_000_000, 0.8)):
        m = ids % mod == 0
        if m.any():
            dup = out[m].copy(deep=False)
            dup[id_col] = ids[m] + offset
            dup[vec_col] = pd.Series([v * scale for v in
                                      np.asarray(out[vec_col][m])],
                                     index=dup.index, dtype=object)
            parts.append(dup)
    return pd.concat(parts, ignore_index=True)


def semantic_pairs_group(g: pd.DataFrame, *, threshold: float,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         block_col: str = "label",
                         tile: int = 2048) -> pd.DataFrame:
    """All within-block pairs with cosine >= threshold, tiled so peak
    memory is tile^2 floats regardless of block size. ``g`` holds one
    or more complete blocks (SemDeDup's within-cluster pairwise scan:
    the block is a kmeans cluster in production, the label column in
    the oracled query — the paper's design point is k chosen so a
    cluster fits one worker, which this tiling relaxes to 'one
    worker's wall-time'; a cluster too big for one task belongs in a
    finer clustering, not a bigger tile). Output is integer-only
    (vec_a, vec_b, block) with vec_a < vec_b: cosine margins between
    injected duplicates (~1.0) and the natural corpus (<=0.65) make
    the threshold decision immune to summation-order ulps, and the
    verified surface carries no floats at all."""
    rows_a, rows_b, rows_l = [], [], []
    for lb, grp in g.groupby(block_col, sort=False):
        grp = grp.sort_values(id_col, kind="mergesort")
        ids = grp[id_col].to_numpy(dtype=np.int64)
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in grp[vec_col]])
        n = np.linalg.norm(X, axis=1)
        Xn = X / np.where(n == 0, 1.0, n)[:, None]
        m = len(ids)
        for i0 in range(0, m, tile):
            Xi = Xn[i0:i0 + tile]
            for j0 in range(i0, m, tile):
                S = Xi @ Xn[j0:j0 + tile].T
                ai, bj = np.nonzero(S >= threshold)
                keep = (i0 + ai) < (j0 + bj)
                ai, bj = ai[keep], bj[keep]
                if len(ai):
                    rows_a.append(ids[i0 + ai])
                    rows_b.append(ids[j0 + bj])
                    rows_l.append(np.full(len(ai), lb, dtype=np.int64))
    if not rows_a:
        return pd.DataFrame({"vec_a": pd.array([], dtype="int64"),
                             "vec_b": pd.array([], dtype="int64"),
                             "block": pd.array([], dtype="int64")})
    return pd.DataFrame({"vec_a": np.concatenate(rows_a),
                         "vec_b": np.concatenate(rows_b),
                         "block": np.concatenate(rows_l)})


def lloyd_centroids(nds, *, k: int, iters: int,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> np.ndarray:
    """Distributed Lloyd's k-means returning the FINAL CENTROIDS only:
    deterministic lowest-id seeds, per-batch vectorized assign +
    per-cluster partial sums inside map_batches, driver combines k x
    n_blocks tiny partials per iteration in deterministic (cluster,
    blk) order. This is the blocking stage for kmeans-blocked
    SemDeDup; queries.embeddings_kmeans keeps its own fused variant
    because its REPORT (per-iteration SSE bound, assignment hashes)
    rides the same partial pass — the assignment kernel there must
    stay in sync with ``assign_clusters`` below."""
    import ray

    seed = (nds.map_batches(
        lambda b: b.sort_values(id_col).head(k), batch_format="pandas")
        .to_pandas().sort_values(id_col).head(k))
    if len(seed) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(seed)}")
    centroids = np.stack([np.asarray(v, dtype=np.float64)
                          for v in seed[vec_col]])

    def partials_for(ref):
        def assign(b: pd.DataFrame) -> pd.DataFrame:
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in b[vec_col]])
            C = ray.get(ref)
            d2 = ((X * X).sum(1)[:, None] - 2.0 * (X @ C.T)
                  + (C * C).sum(1)[None, :])
            a = d2.argmin(1)
            sums = np.zeros_like(C)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pd.DataFrame({
                "cluster": np.arange(k, dtype=np.int64),
                "n": counts, "s": list(sums),
                "blk": np.int64(b[id_col].min())})
        return assign

    for _ in range(iters):
        ref = ray.put(centroids)
        part = (nds.map_batches(partials_for(ref), batch_format="pandas")
                .to_pandas().sort_values(["cluster", "blk"],
                                         kind="mergesort"))
        counts = part.groupby("cluster")["n"].sum()
        sums = {c: np.sum(np.stack([np.asarray(s) for s in g["s"]]),
                          axis=0)
                for c, g in part.groupby("cluster")}
        centroids = np.stack([
            sums[c] / counts[c] if counts[c] > 0 else centroids[c]
            for c in range(k)])
    return centroids


def assign_clusters(b: pd.DataFrame, centroids: np.ndarray, *,
                    vec_col: str = "embedding") -> np.ndarray:
    """Nearest-centroid assignment for one batch (the same d2 kernel
    lloyd_centroids iterates with)."""
    X = np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
    d2 = ((X * X).sum(1)[:, None] - 2.0 * (X @ centroids.T)
          + (centroids * centroids).sum(1)[None, :])
    return d2.argmin(1).astype(np.int64)


def kmeans_blocked_pairs(nds, *, threshold: float,
                         target_cluster_rows: int = 4096,
                         iters: int = 5, k_floor: int = 8,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         label_col: str = None,
                         _depth: int = 0,
                         max_depth: int = 4) -> pd.DataFrame:
    """SemDeDup's kmeans blocking at the PAPER'S design point: k scales
    with corpus size (k = ceil(n / target_cluster_rows), so ~110k
    clusters on the paper's web corpus) instead of a fixed small k that
    would put corpus/k rows in one within-cluster scan task. The scan
    itself enforces a hard per-cluster row budget (4x target), and a
    cluster past the budget — skew kmeans couldn't balance — is
    RECURSIVELY re-clustered on its own rows rather than scanned
    oversized; a cluster kmeans provably cannot split (every row
    identical, or max_depth reached) is refused loudly instead of
    silently materializing it in one task.

    ``label_col`` (optional) enables the fixture-corpus runtime
    invariant the SQL oracle depends on: the oracle enumerates
    within-LABEL pairs, so an emitted pair crossing labels — legal
    SemDeDup output on some future corpus — must fail HERE with a
    clear message, not as an opaque driver hash mismatch.

    Returns the (vec_a, vec_b) pair frame, vec_a < vec_b, unsorted."""
    import ray

    from ..relational import bucketed_map_groups

    empty = pd.DataFrame({"vec_a": pd.array([], dtype="int64"),
                          "vec_b": pd.array([], dtype="int64")})
    n = nds.count()
    if n == 0:
        return empty
    row_budget = 4 * target_cluster_rows
    # floor k at k_floor on the top-level call (cheap insurance for
    # balance on small corpora), at 2 in recursion (the point there is
    # only to split); always clamp to the corpus size so a tiny
    # post-injection corpus never trips lloyd's seed check
    k = min(n, max(k_floor if _depth == 0 else 2,
                   -(-n // target_cluster_rows)))
    centroids = lloyd_centroids(nds, k=k, iters=iters,
                                vec_col=vec_col, id_col=id_col)
    ref = ray.put(centroids)

    def add_cluster(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["cluster"] = assign_clusters(b, ray.get(ref), vec_col=vec_col)
        return b

    cds = nds.map_batches(add_cluster, batch_format="pandas")
    if k == 1:
        # n <= target_cluster_rows: one block, inherently under budget
        sizes = pd.Series({0: n})
    else:
        # per-cluster sizes as k-row partials combined on the driver
        # (k rows per block — never a keyed shuffle)
        cds = cds.materialize()
        sizes = (cds.map_batches(
            lambda b: pd.DataFrame({
                "cluster": np.arange(k, dtype=np.int64),
                "n": np.bincount(b["cluster"], minlength=k)}),
            batch_format="pandas")
            .to_pandas().groupby("cluster")["n"].sum())
    oversized = set(sizes.index[sizes > row_budget].tolist())

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        vc = g["cluster"].value_counts()
        if (vc > row_budget).any():
            raise RuntimeError(
                f"within-cluster scan received a cluster of "
                f"{int(vc.max())} rows past the {row_budget}-row "
                "budget — the oversized-cluster re-clustering guard "
                "is broken")
        out = semantic_pairs_group(g, threshold=threshold,
                                   block_col="cluster",
                                   vec_col=vec_col, id_col=id_col)
        if label_col is not None and len(out):
            lab = g.set_index(id_col)[label_col]
            cross = (lab.reindex(out["vec_a"]).to_numpy()
                     != lab.reindex(out["vec_b"]).to_numpy())
            if cross.any():
                raise RuntimeError(
                    f"{int(cross.sum())} emitted pair(s) cross labels "
                    "— legal SemDeDup output, but this query's SQL "
                    "oracle enumerates within-label pairs only and is "
                    "FIXTURE-CORPUS-SCOPED; the corpus no longer "
                    "satisfies its invariant (see "
                    "semantic_inject_batch)")
        return out[["vec_a", "vec_b"]]

    within = cds if not oversized else cds.map_batches(
        lambda b: b[~b["cluster"].isin(oversized)],
        batch_format="pandas")
    parts = [bucketed_map_groups(within, ["cluster"], scan).to_pandas()]
    for c in sorted(oversized):
        if sizes[c] >= n or _depth >= max_depth:
            raise RuntimeError(
                f"cluster {c} holds {int(sizes[c])} of {n} rows at "
                f"depth {_depth} and cannot be split further "
                f"(max_depth={max_depth}) — refusing to run a "
                f"{int(sizes[c])}-row within-cluster scan in one "
                "task; raise target_cluster_rows deliberately if "
                "that is intended")
        sub = cds.map_batches(
            lambda b, c=c: b[b["cluster"] == c].drop(columns="cluster"),
            batch_format="pandas")
        parts.append(kmeans_blocked_pairs(
            sub, threshold=threshold,
            target_cluster_rows=target_cluster_rows, iters=iters,
            vec_col=vec_col, id_col=id_col, label_col=label_col,
            _depth=_depth + 1, max_depth=max_depth))
    parts = [p for p in parts if len(p)]
    if not parts:
        return empty
    return pd.concat(parts, ignore_index=True)


# ------------------------------------------------ product quantization

def pq_train_codebooks(nds, *, m: int = 4, ksub: int = 16,
                       iters: int = 4, vec_col: str = "embedding",
                       id_col: str = "vec_id") -> list:
    """Train product-quantization codebooks (Jegou et al. 2011,
    'Product Quantization for Nearest Neighbor Search'): split the
    D-dim vectors into ``m`` contiguous subspaces and run the
    engine's distributed Lloyd stage independently in each, giving
    ``m`` codebooks of ``ksub`` centroids. Every subspace pass
    streams the full dataset (broadcast centroids + sufficient-stats
    partials); at web scale the paper trains codebooks on a bounded
    sample and assigns the full corpus — the caller picks the
    training dataset, this function just never materializes it."""
    first = nds.take(1)
    if not first:
        return []
    d = len(np.asarray(first[0][vec_col]))
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = []
    for sub in range(m):
        lo = sub * dsub

        def slice_sub(b: pd.DataFrame, lo=lo) -> pd.DataFrame:
            out = b[[id_col]].copy(deep=False)
            out[vec_col] = [np.asarray(v, dtype=np.float64)[lo:lo + dsub]
                            for v in b[vec_col]]
            return out

        # materialize the slice once: lloyd streams it iters+1 times
        # (seed pass + per-iteration partials) and the subvectors are
        # 1/m the input bytes
        books.append(lloyd_centroids(
            nds.map_batches(slice_sub,
                            batch_format="pandas").materialize(),
            k=ksub, iters=iters, vec_col=vec_col, id_col=id_col))
    return books


def pq_assign_report(nds, books, *, vec_col: str = "embedding",
                     id_col: str = "vec_id"):
    """One streaming assign pass with the ``m`` codebooks broadcast
    once (ray.put): per batch, vectorized nearest-centroid codes per
    subspace, plus the mergeable error partials the quality asserts
    need — quantization SSE and around-the-subspace-mean SSE (the
    rank-0 baseline PQ must beat). Returns (histogram DataFrame
    [subspace, code, n], err_sse, base_sse, n_vecs); partials are
    combined in deterministic (subspace, code, blk) order."""
    import ray
    m = len(books)
    dsub = books[0].shape[1]
    ref = ray.put([np.asarray(b, dtype=np.float64) for b in books])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            # empty blocks reach map_batches fns (repartition,
            # filtered upstream) — emit a typed empty partial
            return pd.DataFrame({
                "subspace": pd.array([], dtype="int64"),
                "code": pd.array([], dtype="int64"),
                "n": pd.array([], dtype="int64"),
                "err": pd.array([], dtype="float64"),
                "s": pd.Series([], dtype=object),
                "sq": pd.array([], dtype="float64"),
                "nv": pd.array([], dtype="int64"),
                "blk": pd.array([], dtype="int64")})
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in b[vec_col]])
        C = ray.get(ref)
        rows = []
        for sub in range(m):
            Xm = X[:, sub * dsub:(sub + 1) * dsub]
            Cm = C[sub]
            d2 = ((Xm * Xm).sum(1)[:, None] - 2.0 * (Xm @ Cm.T)
                  + (Cm * Cm).sum(1)[None, :])
            codes = d2.argmin(1)
            err = np.maximum(d2[np.arange(len(Xm)), codes], 0.0)
            cnt = np.bincount(codes, minlength=len(Cm))
            es = np.zeros(len(Cm))
            np.add.at(es, codes, err)
            rows.append(pd.DataFrame({
                "subspace": np.int64(sub),
                "code": np.arange(len(Cm), dtype=np.int64),
                "n": cnt.astype(np.int64), "err": es,
                "s": list(Xm.sum(0)[None, :].repeat(len(Cm), 0)),
                "sq": (Xm * Xm).sum(),
                "nv": np.int64(len(Xm)),
                "blk": np.int64(b[id_col].min())}))
        return pd.concat(rows, ignore_index=True)

    part = (nds.map_batches(assign, batch_format="pandas")
            .to_pandas()
            .sort_values(["subspace", "code", "blk"], kind="mergesort"))
    hist = (part.groupby(["subspace", "code"], as_index=False)["n"]
            .sum().astype({"n": "int64"}))
    err_sse = float(part["err"].sum())
    # base SSE = sum ||x_m||^2 - n * ||mean_m||^2 per subspace; the
    # per-batch (s, sq, nv) rows repeat per code, so take one code's
    base_sse, n_vecs = 0.0, 0
    one = part[part["code"] == 0]
    for sub, g in one.groupby("subspace"):
        g = g.sort_values("blk", kind="mergesort")
        s = np.sum(np.stack([np.asarray(v) for v in g["s"]]), axis=0)
        sq = float(g["sq"].sum())
        nv = int(g["nv"].sum())
        base_sse += sq - (s @ s) / nv if nv else 0.0
        if sub == 0:
            n_vecs = nv
    return hist, err_sse, base_sse, n_vecs
