"""Deduplication operators: exact, MinHash-LSH, SimHash, embedding-cosine.

All follow the partial-before-shuffle discipline:

- exact:   content-hash inside map_batches, per-batch min-key partial,
           tiny groupby(hash) final — only one row per distinct hash per
           block enters the shuffle.
- minhash: shingle -> minhash signature per batch (numpy, vectorized
           over permutations) -> explode to (band, band_hash, doc_id)
           rows -> groupby(band, band_hash) bucket -> candidate pairs ->
           broadcast-text exact-Jaccard verification. Shingles can be
           word n-grams or char n-grams (the char mode doubles as the
           "n-gram Jaccard" dedup operator).
- simhash: 64-bit simhash per doc -> 4x16-bit band buckets ->
           candidates -> Hamming-distance verification.
- embedding: random-hyperplane LSH buckets over the embedding column ->
           candidates -> exact cosine verification.

Candidate-pair sets are assumed small relative to the corpus (the
standard LSH contract); verification joins the pair list against a
broadcast of ONLY the candidate docs' payloads, never the full corpus.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import List, Tuple

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"),
                                          digest_size=8).digest(), "big")


# ------------------------------------------------------------- exact dedup

def exact_dedup_keep(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     batch_size: int = 8192) -> pd.DataFrame:
    """Kept-representative set: min id per distinct content hash."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(t.encode("utf-8")).hexdigest()
             for t in batch[text_col]]
        df = pd.DataFrame({"h": h, id_col: batch[id_col].values})
        return df.groupby("h", as_index=False)[id_col].min()

    from ..relational import bucketed_map_groups
    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size)
    final = bucketed_map_groups(
        partials, ["h"],
        lambda g: g.groupby("h", as_index=False, sort=False)[id_col].min()
    ).to_pandas()
    return final[[id_col]].sort_values(id_col).reset_index(drop=True)


def exact_dedup_rows(ds, key_cols: List[str]):
    """Row-level exact dedup by key (D1 analog: duplicate
    (conv_id, turn_idx) rows collapse to one; duplicates are exact
    copies so any representative is deterministic). Bucketed combine —
    key cardinality is ~row count, the pathological case for Ray's
    per-group reduce."""
    from ..relational import bucketed_map_groups
    return bucketed_map_groups(
        ds, key_cols, lambda g: g.drop_duplicates(subset=key_cols))


# ----------------------------------------------------------- minhash + LSH

class MinHasher:
    """Per-actor state: the permutation coefficients (seeded, identical
    across actors) — computed once, reused per batch."""

    def __init__(self, num_perm: int = 128, shingle: str = "word3"):
        rng = np.random.RandomState(12345)
        # coefficients and shingle hashes are kept < 2^31 so a*h+b stays
        # below 2^62 and never wraps int64 — (a*h+b) mod p must be the
        # real universal-hash value or the banding S-curve is
        # miscalibrated and near-dup candidates get silently missed
        self.a = rng.randint(1, 2**31, size=num_perm, dtype=np.int64)
        self.b = rng.randint(0, 2**31, size=num_perm, dtype=np.int64)
        self.num_perm = num_perm
        self.shingle = shingle

    def shingles(self, text: str) -> np.ndarray:
        if self.shingle.startswith("word"):
            n = int(self.shingle[4:])
            toks = text.split()
            items = {" ".join(toks[i:i + n])
                     for i in range(max(0, len(toks) - n + 1))}
        else:  # charN
            n = int(self.shingle[4:])
            items = {text[i:i + n] for i in range(max(0, len(text) - n + 1))}
        if not items:
            items = {""}
        # 31-bit shingle ids: see __init__ overflow note (birthday
        # collisions at typical per-doc shingle counts are ~1e-4)
        return np.array([_stable_u64(s) & ((1 << 31) - 1) for s in items],
                        dtype=np.int64)

    def signature(self, text: str) -> np.ndarray:
        h = self.shingles(text)
        # (n_shingles, num_perm) permuted hashes; min along shingles
        perm = (h[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return perm.min(axis=0)


class MinHashBands:
    """map_batches stage: doc -> (band, band_hash, doc_id) rows."""

    def __init__(self, num_perm: int = 128, bands: int = 16,
                 shingle: str = "word3",
                 text_col: str = "text", id_col: str = "doc_id"):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm, shingle)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        band_ids, band_hashes, doc_ids = [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col]):
            sig = self.mh.signature(text)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                band_ids.append(b)
                band_hashes.append(zlib.crc32(chunk.tobytes()))
                doc_ids.append(doc_id)
        return pd.DataFrame({
            "band": pd.array(band_ids, dtype="int32"),
            "band_hash": pd.array(band_hashes, dtype="int64"),
            "doc_id": doc_ids,
        })


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(g["doc_id"]))
    if len(ids) < 2:
        return pd.DataFrame({"id_a": [], "id_b": []})
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i]); b.append(ids[j])
    return pd.DataFrame({"id_a": a, "id_b": b})


def _grouped_pairs(df: pd.DataFrame, group_cols: List[str],
                   id_col: str = "doc_id") -> pd.DataFrame:
    """All within-group id pairs. Vectorized pre-filter: only rows whose
    group key is duplicated can pair, so the Python loop touches the
    (rare) collision groups only."""
    dup = df[df.duplicated(group_cols, keep=False)]
    a, b = [], []
    for _, g in dup.groupby(group_cols, sort=False):
        ids = sorted(set(g[id_col]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i]); b.append(ids[j])
    return pd.DataFrame({"id_a": a, "id_b": b})


def _jaccard(sa: set, sb: set) -> float:
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def minhash_dedup_pairs(ds, *, num_perm: int = 128, bands: int = 16,
                        shingle: str = "word3", threshold: float = 0.7,
                        text_col: str = "text", id_col: str = "doc_id",
                        batch_size: int = 4096) -> pd.DataFrame:
    """Near-duplicate pairs with exact-Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold,
    sorted. ``shingle='char5'`` makes this the n-gram-Jaccard dedup.
    """
    import ray

    band_rows = ds.map_batches(
        MinHashBands, batch_format="pandas", batch_size=batch_size,
        concurrency=(1, 2),
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                               "shingle": shingle, "text_col": text_col,
                               "id_col": id_col})
    from ..relational import bucketed_map_groups
    cand = (bucketed_map_groups(
        band_rows, ["band", "band_hash"],
        lambda g: _grouped_pairs(g, ["band", "band_hash"]))
        .to_pandas().drop_duplicates().reset_index(drop=True))
    if cand.empty:
        return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                             "id_b": pd.array([], dtype="int64"),
                             "jaccard": pd.array([], dtype="float64")})

    # verification: broadcast ONLY candidate docs' texts
    cand_ids = sorted(set(cand["id_a"]) | set(cand["id_b"]))
    id_set = set(cand_ids)
    texts_df = (ds.map_batches(
        lambda b: b[b[id_col].isin(id_set)][[id_col, text_col]],
        batch_format="pandas", batch_size=batch_size).to_pandas())
    mh = MinHasher(num_perm, shingle)
    shingle_map = {i: set(mh.shingles(t).tolist())
                   for i, t in zip(texts_df[id_col], texts_df[text_col])}
    jac = [
        _jaccard(shingle_map.get(a, set()), shingle_map.get(b, set()))
        for a, b in zip(cand["id_a"], cand["id_b"])]
    cand["jaccard"] = np.round(jac, 4)
    out = cand[cand["jaccard"] >= threshold]
    return (out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
            .astype({"id_a": "int64", "id_b": "int64"}))


def components_from_pairs(pairs: pd.DataFrame) -> dict:
    """Union-find over the near-dup pair list -> {id: representative
    (min id of its component)}. Driver-side on purpose: the LSH contract
    makes the verified pair set tiny relative to the corpus; were it
    ever large, swap in iterative min-label propagation (a few
    groupby-min rounds over the edge list)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def minhash_dedup_keep(ds, *, num_perm: int = 128, bands: int = 16,
                       shingle: str = "word3", threshold: float = 0.7,
                       text_col: str = "text", id_col: str = "doc_id",
                       batch_size: int = 4096) -> pd.DataFrame:
    """The actual training-data dedup operator: drop near-duplicates,
    keeping each component's min-id representative. Returns the kept id
    set; filter the corpus with a broadcast of the DROPPED set (tiny),
    not the kept one."""
    pairs = minhash_dedup_pairs(
        ds, num_perm=num_perm, bands=bands, shingle=shingle,
        threshold=threshold, text_col=text_col, id_col=id_col,
        batch_size=batch_size)
    comp = components_from_pairs(pairs)
    dropped = {x for x, rep in comp.items() if rep != x}
    kept = ds.map_batches(
        lambda b: b[~b[id_col].isin(dropped)][[id_col]],
        batch_format="pandas", batch_size=batch_size).to_pandas()
    return (kept.sort_values(id_col).reset_index(drop=True)
            .astype({id_col: "int64"}))


# ---------------------------------------------------------------- simhash

class SimHashStage:
    """64-bit SimHash per doc + 4x16-bit band keys for bucketing."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for tok in set(text.split()):
            h = np.uint64(_stable_u64(tok))
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        return int("".join("1" if v > 0 else "0" for v in acc), 2)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, sigs, bands, keys = [], [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col]):
            s = self.simhash(text)
            for b in range(4):
                ids.append(doc_id)
                sigs.append(s - (1 << 63))       # store as signed int64
                bands.append(b)
                keys.append((s >> (16 * b)) & 0xFFFF)
        return pd.DataFrame({
            "doc_id": ids,
            "simhash": pd.array(sigs, dtype="int64"),
            "band": pd.array(bands, dtype="int32"),
            "band_key": pd.array(keys, dtype="int32"),
        })


def simhash_dedup_pairs(ds, *, max_hamming: int = 3,
                        text_col: str = "text", id_col: str = "doc_id",
                        batch_size: int = 4096) -> pd.DataFrame:
    """Candidate pairs sharing any 16-bit band, verified by Hamming
    distance on the full 64-bit signature."""
    rows = ds.map_batches(
        SimHashStage, batch_format="pandas", batch_size=batch_size,
        concurrency=(1, 2),
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col})

    def pairs_with_sig(df: pd.DataFrame) -> pd.DataFrame:
        dup = df[df.duplicated(["band", "band_key"], keep=False)]
        a, b, sa, sb = [], [], [], []
        for _, g in dup.groupby(["band", "band_key"], sort=False):
            recs = sorted(set(zip(g["doc_id"], g["simhash"])))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    a.append(recs[i][0]); b.append(recs[j][0])
                    sa.append(recs[i][1]); sb.append(recs[j][1])
        return pd.DataFrame({"id_a": a, "id_b": b, "sig_a": sa, "sig_b": sb})

    from ..relational import bucketed_map_groups
    cand = (bucketed_map_groups(rows, ["band", "band_key"], pairs_with_sig)
            .to_pandas().drop_duplicates(["id_a", "id_b"])
            .reset_index(drop=True))
    if cand.empty:
        return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                             "id_b": pd.array([], dtype="int64"),
                             "hamming": pd.array([], dtype="int64")})
    x = (cand["sig_a"].to_numpy(dtype="int64")
         ^ cand["sig_b"].to_numpy(dtype="int64")).astype(np.uint64)
    ham = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        ham += (x & 1).astype(np.int64)
        x >>= 1
    cand["hamming"] = ham
    out = cand[cand["hamming"] <= max_hamming][["id_a", "id_b", "hamming"]]
    return (out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
            .astype({"id_a": "int64", "id_b": "int64"}))


# ------------------------------------------------------ embedding near-dup

def embedding_dedup_pairs(ds, *, threshold: float = 0.95, n_planes: int = 12,
                          vec_col: str = "embedding", id_col: str = "vec_id",
                          batch_size: int = 4096) -> pd.DataFrame:
    """Random-hyperplane LSH buckets -> exact-cosine verification."""
    def bucket_batch(batch: pd.DataFrame, planes: np.ndarray) -> pd.DataFrame:
        vecs = np.stack(batch[vec_col].to_numpy())
        proj = vecs @ planes.T > 0
        keys = proj @ (1 << np.arange(n_planes))
        return pd.DataFrame({id_col: batch[id_col], "bucket": keys.astype("int64")})

    # dim sniffed from the first row; planes seeded (identical everywhere)
    first = ds.take(1)[0][vec_col]
    dim = len(first)
    planes = np.random.RandomState(777).standard_normal((n_planes, dim))

    import functools
    buckets = ds.map_batches(
        functools.partial(bucket_batch, planes=planes),
        batch_format="pandas", batch_size=batch_size)
    from ..relational import bucketed_map_groups
    cand = (bucketed_map_groups(
        buckets, ["bucket"],
        lambda g: _grouped_pairs(g.rename(columns={id_col: "doc_id"}),
                                 ["bucket"]))
        .to_pandas().drop_duplicates().reset_index(drop=True))
    if cand.empty:
        return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                             "id_b": pd.array([], dtype="int64"),
                             "cosine": pd.array([], dtype="float64")})
    cand_ids = set(cand["id_a"]) | set(cand["id_b"])
    vec_df = ds.map_batches(
        lambda b: b[b[id_col].isin(cand_ids)][[id_col, vec_col]],
        batch_format="pandas", batch_size=batch_size).to_pandas()
    vmap = {i: np.asarray(v, dtype=np.float64)
            for i, v in zip(vec_df[id_col], vec_df[vec_col])}

    def cos(a, b):
        va, vb = vmap[a], vmap[b]
        na, nb = np.linalg.norm(va), np.linalg.norm(vb)
        if na == 0 or nb == 0:
            return 0.0
        return float(va @ vb / (na * nb))

    cand["cosine"] = np.round(
        [cos(a, b) for a, b in zip(cand["id_a"], cand["id_b"])], 4)
    out = cand[cand["cosine"] >= threshold]
    return (out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
            .astype({"id_a": "int64", "id_b": "int64"}))
