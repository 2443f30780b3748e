"""Deduplication operators: exact, MinHash-LSH, SimHash, embedding-cosine.

All follow the partial-before-shuffle discipline, and the candidate-
PAIR flow is distributed END TO END: pairs are born in the banding
shuffle, cross-band-deduped in a bucketed shuffle, verified either
map-side (broadcast payloads) or via two bucketed shuffles, and fed to
connected components as a Dataset edge list — the driver never holds a
pair list (on a template-heavy 100-TB crawl candidate pairs can reach
billions of rows).

- exact:   content-hash inside map_batches, per-batch min-key partial,
           tiny groupby(hash) final — only one row per distinct hash per
           block enters the shuffle.
- minhash: shingle -> minhash signature per batch (numpy, vectorized
           over permutations) -> explode to (band, band_hash, doc_id)
           rows -> groupby(band, band_hash) bucket -> candidate pairs ->
           DISTRIBUTED exact-Jaccard verification. Shingles can be
           word n-grams or char n-grams (the char mode doubles as the
           "n-gram Jaccard" dedup operator).
- simhash: 64-bit simhash per doc -> 4x16-bit band buckets ->
           candidates -> Hamming-distance verification (signatures ride
           along with the pairs; vectorized popcount, no second pass).
- embedding: random-hyperplane LSH buckets over the embedding column ->
           candidates -> distributed exact-cosine verification (same
           path as minhash).
- keep-set: connected components over the verified pair Dataset via
           ITERATIVE MIN-LABEL PROPAGATION over Ray datasets (a few
           bucketed groupby-min rounds; the driver only sees a scalar
           convergence aggregate per round), so a high-duplication
           corpus — the normal case for web crawls — cannot blow up
           driver memory the way union-find would.

The signature/shingle map stages are STATELESS TASKS, not actor pools:
their only state is seeded hash coefficients, which a module-level
per-worker cache rehydrates in microseconds, and measured on this
engine stateless tasks beat a warmed actor pool ~2x for cheap-state
stages while scaling to every core with zero pool-sizing risk.
"""

from __future__ import annotations

import functools
import hashlib
import zlib
from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa



import re

# RE2 \S spelled out (no \v — RE2's \s is [ \t\n\f\r]), matching
# text_analysis._NONSPACE and the pc.split_pattern_regex(r"\s+") the
# exact-verification join tokenizes with
_ASCII_TOKEN_RE = re.compile(r"[^ \t\n\f\r]+")


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"),
                                          digest_size=8).digest(), "big")


# per-worker shingle-hash memo: template-heavy corpora repeat most
# shingles across batches, so the blake2b (the sig stage's largest
# single cost, ~38% profiled) runs once per distinct shingle per
# worker, not once per batch. Bounded: cleared wholesale past the cap
# (simple and allocation-free vs LRU bookkeeping).
_SHINGLE_HASH_MEMO: dict = {}
_SHINGLE_MEMO_CAP = 4_000_000


def _stable_u64_arr(uniq) -> np.ndarray:
    """blake2b-u64 per unique shingle string, memoized per worker."""
    memo = _SHINGLE_HASH_MEMO
    if len(memo) > _SHINGLE_MEMO_CAP:
        memo.clear()
    out = np.empty(len(uniq), dtype=np.uint64)
    get = memo.get
    for i, s in enumerate(uniq):
        v = get(s)
        if v is None:
            v = _stable_u64(s)
            memo[s] = v
        out[i] = v
    return out


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
    """Seeded per-lane bijective mixes — identical in every process.

    Lane j's value for a shingle is splitmix64(shingle_hash XOR
    seed_j) — a bijection of the 64-bit hash space per lane, so each
    lane's argmin is a uniformly random element of the shingle set and
    P(lane agreement) = Jaccard, the textbook MinHash estimator.

    (History: the previous family, (a*h + b) mod (2^61-1) with 31-bit
    h and a, had a*h+b < 2p — lanes with a < 2^30 NEVER wrapped the
    modulus, stayed monotone in h, and all picked the globally
    smallest shingle hash; lane agreement was bimodal, measured 0.047
    on a true-J=0.51 conversation pair. Caught by the grouped
    near-dup's exact union-Jaccard verification, fixed 2026-08-18.
    Banding/verification pipelines were unaffected in CORRECTNESS —
    exact verification decides pairs — but candidate recall at the
    S-curve's design point was luck-dependent.)"""

    def __init__(self, num_perm: int = 128, shingle: str = "word3"):
        rng = np.random.RandomState(12345)
        self.seeds = rng.randint(0, 2**63, size=num_perm,
                                 dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.shingle = shingle

    @staticmethod
    def _lane(h: np.ndarray, seed) -> np.ndarray:
        """uint64 shingle hashes -> non-negative int64 lane values
        (splitmix64 finalizer; >>1 keeps values in int64's positive
        range so int64 and uint64 min orderings coincide everywhere
        the signatures are combined)."""
        x = h ^ seed
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        return (x >> np.uint64(1)).astype(np.int64)

    def shingle_strings(self, text: str) -> set:
        if self.shingle.startswith("word"):
            n = int(self.shingle[4:])
            # ASCII-explicit tokens (the repo-wide RE2 \S convention,
            # see text_analysis._NONSPACE): ONE token definition shared
            # with the exact union-Jaccard verification join
            # (_shingle_postings, RE2 \s+) and the Arrow batch path
            # below — Python str.split()'s unicode whitespace would
            # silently diverge from all three on NBSP/  text
            toks = _ASCII_TOKEN_RE.findall(text)
            items = {" ".join(toks[i:i + n])
                     for i in range(max(0, len(toks) - n + 1))}
        else:  # charN
            n = int(self.shingle[4:])
            items = {text[i:i + n] for i in range(max(0, len(text) - n + 1))}
        return items or {""}

    def shingles(self, text: str) -> np.ndarray:
        return np.fromiter((_stable_u64(s)
                            for s in self.shingle_strings(text)),
                           np.uint64)

    def signature_from_strings(self, shingle_set) -> np.ndarray:
        """Signature of an explicit shingle-string set (the scalar
        oracle for union/group semantics)."""
        h = np.fromiter((_stable_u64(s) for s in shingle_set),
                        np.uint64, count=len(shingle_set))
        vals = np.stack([self._lane(h, s) for s in self.seeds], axis=1)
        return vals.min(axis=0)

    def signature(self, text: str) -> np.ndarray:
        """Per-doc signature — the slow scalar oracle; the batch path
        (minhash_band_rows) must produce byte-identical values."""
        return self.signature_from_strings(self.shingle_strings(text))

    def _word_shingles_arrow(self, texts):
        """(flat shingle object array WITH duplicates, per-doc counts)
        via Arrow C++: RE2 split, element-wise join of the k shifted
        token slices (the _shingle_postings kernel — a window stays
        inside one doc iff its first and last token share the list
        parent index). Duplicates are NOT removed: min() is
        idempotent, so the per-doc set() the scalar path builds is
        unnecessary work here. Docs with < k tokens contribute zero
        shingles (the caller substitutes the scalar path's ``""``
        fallback)."""
        import pyarrow.compute as pc
        k = int(self.shingle[4:])
        n_docs = len(texts)
        toks = pc.split_pattern_regex(
            pa.array(texts, type=pa.large_string()), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        flat, par = flat.filter(mask), par.filter(mask)
        m = len(flat) - k + 1
        if m <= 0:
            return (np.empty(0, dtype=object),
                    np.zeros(n_docs, dtype=np.int64))
        parts = [flat.slice(i, m) for i in range(k)]
        sh = pc.binary_join_element_wise(
            *parts, pa.scalar(" ", type=pa.large_string()))
        owner = par.slice(0, m)
        same = pc.equal(owner, par.slice(k - 1, m))
        sh = sh.filter(same)
        owner = owner.filter(same).to_numpy(zero_copy_only=False)
        counts = np.bincount(owner, minlength=n_docs).astype(np.int64)
        return sh.to_numpy(zero_copy_only=False), counts

    def signatures_batch(self, texts) -> np.ndarray:
        """(n_docs, num_perm) signature matrix, vectorized: word-k
        shingling runs in Arrow C++ (RE2 split + element-wise join —
        no per-doc Python), every UNIQUE shingle string in the batch
        is blake2b-hashed ONCE through the per-worker memo
        (template-heavy corpora share most shingles across docs AND
        batches), and the per-permutation min runs as one segment-min
        (np.minimum.reduceat) per lane over the flattened shingle-id
        array instead of a per-doc matrix. Byte-identical to
        signature() per doc (pinned by test)."""
        texts = list(texts)
        if not texts:
            return np.empty((0, self.num_perm), dtype=np.int64)
        if self.shingle.startswith("word"):
            flat, lens = self._word_shingles_arrow(texts)
        else:
            sets = [self.shingle_strings(t) for t in texts]
            lens = np.fromiter((len(s) for s in sets), np.int64,
                               count=len(sets))
            flat = np.asarray([s for ss in sets for s in ss],
                              dtype=object)
        # factorize, not np.unique: hash-based first-occurrence codes
        # (~17x faster than unique's sort on object strings; order of
        # the unique array is irrelevant here)
        inv, uniq = pd.factorize(flat)
        uh = _stable_u64_arr(uniq)
        empty_docs = lens == 0
        if empty_docs.any():
            # scalar-path fallback for shingle-less docs: the {""}
            # singleton (its lane values are a fixed vector, cached)
            if not hasattr(self, "_empty_sig"):
                self._empty_sig = np.fromiter(
                    (self._lane(np.array([_stable_u64("")], np.uint64),
                                s)[0] for s in self.seeds),
                    np.int64, count=self.num_perm)
            empty_sig = self._empty_sig
        starts = np.zeros(len(texts), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        sigs = np.empty((len(texts), self.num_perm), dtype=np.int64)
        nonempty = ~empty_docs
        ne_starts = starts[nonempty]
        for j in range(self.num_perm):
            # mix the UNIQUE ids (U ≤ flat count, far below it on
            # template corpora), then gather back to flat positions
            vals_u = self._lane(uh, self.seeds[j])
            if len(flat):
                sigs[nonempty, j] = np.minimum.reduceat(
                    vals_u[inv], ne_starts)
        if empty_docs.any():
            sigs[empty_docs] = empty_sig
        return sigs


_HASHER_CACHE: dict = {}


def _hasher(num_perm: int, shingle: str) -> MinHasher:
    """Per-worker-process MinHasher cache: stateless map tasks rehydrate
    the (cheap, seeded) coefficient state once per worker instead of
    paying an actor pool's scheduling rigidity for it."""
    key = (num_perm, shingle)
    if key not in _HASHER_CACHE:
        _HASHER_CACHE[key] = MinHasher(num_perm, shingle)
    return _HASHER_CACHE[key]


def minhash_band_rows(batch: pd.DataFrame, *, num_perm: int, bands: int,
                      shingle: str, text_col: str,
                      id_col: str) -> pd.DataFrame:
    """Stateless map task: doc -> (band, band_hash, doc_id) rows."""
    assert num_perm % bands == 0
    mh = _hasher(num_perm, shingle)
    rows_per_band = num_perm // bands
    sigs = mh.signatures_batch(batch[text_col].tolist())
    band_hashes = np.empty((len(sigs), bands), dtype=np.int64)
    for i in range(len(sigs)):
        row = sigs[i]
        for b in range(bands):
            band_hashes[i, b] = zlib.crc32(
                row[b * rows_per_band:(b + 1) * rows_per_band].tobytes())
    return pd.DataFrame({
        "band": np.tile(np.arange(bands, dtype=np.int32), len(sigs)),
        "band_hash": band_hashes.ravel(),
        "doc_id": np.repeat(batch[id_col].to_numpy(), bands),
    })


def _empty_pairs(extra: dict = None) -> pd.DataFrame:
    cols = {"id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64")}
    for name, dtype in (extra or {}).items():
        cols[name] = pd.Series([], dtype=dtype)
    return pd.DataFrame(cols)


def _group_codes(df: pd.DataFrame, cols: List[str]) -> np.ndarray:
    """Dense int64 group codes for a column tuple (hash-based
    factorize — no sort, no per-group iteration)."""
    code = None
    for c in cols:
        f, u = pd.factorize(df[c].to_numpy())
        code = f.astype(np.int64) if code is None \
            else code * np.int64(len(u)) + f
    return code


def _pair_positions(code: np.ndarray):
    """Positions (i, j), i<j, of every same-code row pair in a
    code-SORTED array, via offset-diagonal sweeps: one vectorized
    numpy comparison per diagonal offset d, so total work is
    O(n * max_group_size) — proportional to the emitted pair count,
    never a ~100 us/group pandas groupby iteration (the hot line when
    an exact-copy-heavy corpus makes hundreds of thousands of small
    collision groups per bucket)."""
    n = len(code)
    ii, jj = [], []
    d = 1
    while d < n:
        same = code[d:] == code[:-d]
        if not same.any():
            break           # groups are contiguous: no matches at d
        k = np.flatnonzero(same)     # => none at any larger offset
        ii.append(k)
        jj.append(k + d)
        d += 1
    if not ii:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    return np.concatenate(ii), np.concatenate(jj)


def _grouped_pairs(df: pd.DataFrame, group_cols: List[str],
                   id_col: str = "doc_id") -> pd.DataFrame:
    """All within-group id pairs, fully vectorized (offset-diagonal
    expansion over the whole bucket, see _pair_positions)."""
    dup = df[df.duplicated(group_cols, keep=False)]
    if dup.empty:
        # int64-typed empty: a float64 empty block would poison the
        # pair Dataset's schema unification in the dedup shuffle
        return _empty_pairs()
    sub = dup.drop_duplicates(group_cols + [id_col])
    code = _group_codes(sub, group_cols)
    ids = sub[id_col].to_numpy()
    order = np.lexsort((ids, code))
    code, ids = code[order], ids[order]
    i, j = _pair_positions(code)
    if not len(i):
        return _empty_pairs()
    # ids ascend within each group, so positional i<j gives id_a<id_b
    return pd.DataFrame({"id_a": ids[i], "id_b": ids[j]})


def _dedup_pairs_fast(cand: pd.DataFrame) -> pd.DataFrame:
    """drop_duplicates(['id_a','id_b']) via packed-uint64 np.unique
    when ids fit 32 bits (cross-band duplicates on a template-heavy
    corpus reach millions of rows, where pandas hashing is the slow
    part); falls back to pandas otherwise. Keeps first occurrence."""
    if cand.empty:
        return cand
    a = cand["id_a"].to_numpy()
    b = cand["id_b"].to_numpy()
    if (np.issubdtype(a.dtype, np.integer)
            and np.issubdtype(b.dtype, np.integer)
            and a.min() >= 0 and b.min() >= 0
            and max(a.max(), b.max()) < (1 << 32)):
        key = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        _, idx = np.unique(key, return_index=True)
        return cand.iloc[np.sort(idx)]
    return cand.drop_duplicates(["id_a", "id_b"])


def _dedup_pairs_ds(cand_ds):
    """Distributed cross-band pair dedup: every copy of a pair lands in
    one bucket (hash of the pair key), one survives. The pair list
    never visits the driver."""
    from ..relational import bucketed_map_groups
    return bucketed_map_groups(cand_ds, ["id_a", "id_b"],
                               _dedup_pairs_fast)


def _jaccard_arrays(sa, sb) -> float:
    """Exact Jaccard over two sorted-unique int sequences."""
    sa = np.asarray(sa, dtype=np.int64)
    sb = np.asarray(sb, dtype=np.int64)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def _cosine_arrays(va: np.ndarray, vb: np.ndarray) -> float:
    va = np.asarray(va, dtype=np.float64)
    vb = np.asarray(vb, dtype=np.float64)
    na, nb = np.linalg.norm(va), np.linalg.norm(vb)
    if na == 0 or nb == 0:
        return 0.0
    return float(va @ vb / (na * nb))


_BROADCAST_VERIFY_BYTES = 64 << 20


def _id_filter(ds, ids_ds, id_col: str, *, anti: bool = False,
               batch_size: int = 4096):
    """Filter a corpus Dataset by a Dataset of ids — adaptive:

    - id set under the broadcast budget: frozenset shipped once,
      stateless map-side isin (zero shuffles) — the normal case for
      candidate/drop sets bounded by the duplicate count.
    - larger id set: one co-partitioned semi/anti join shuffle; the
      driver never holds the id set.
    """
    import ray

    from ..relational import _cogroup, _split_sides

    ids_ds = ids_ds.materialize()
    size = ids_ds.size_bytes()
    if size is not None and size <= _BROADCAST_VERIFY_BYTES:
        pdf = ids_ds.to_pandas()
        # a fully-empty dataset loses its columns through to_pandas
        id_ref = ray.put(frozenset(
            pdf[id_col].tolist() if id_col in pdf.columns else ()))

        def flt(b: pd.DataFrame) -> pd.DataFrame:
            wanted = ray.get(id_ref)
            mask = b[id_col].isin(wanted)
            return b[~mask] if anti else b[mask]

        return ds.map_batches(flt, batch_format="pandas",
                              batch_size=batch_size)

    corpus_cols = list(ds.schema().names)

    def keep_bucket(t) -> pd.DataFrame:
        l, r = _split_sides(t, corpus_cols, [id_col])
        present = l[id_col].isin(set(r[id_col].tolist()))
        return l[~present] if anti else l[present]

    return _cogroup(ds, ids_ds, [id_col], keep_bucket)


def _pair_ids_ds(cand_ds, id_col: str):
    """Doc ids appearing in any candidate pair, as a Dataset —
    per-batch unique ONLY (no dedup shuffle): both _id_filter paths
    (frozenset broadcast, in-bucket isin set) tolerate cross-batch
    duplicate id rows, and the only cost is a conservative size check."""
    def ids_of(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: np.unique(np.concatenate(
            [b["id_a"].to_numpy(dtype=np.int64),
             b["id_b"].to_numpy(dtype=np.int64)]))})

    return cand_ds.map_batches(ids_of, batch_format="pandas")


def _pairwise_verify(cand_ds, payload_ds, score_fn, out_col: str,
                     extra_cols: List[str] = ()):
    """Distributed pairwise verification with an adaptive join
    strategy (the broadcast-small-sides rule applied to dedup).

    cand_ds: Dataset of (id_a, id_b) candidate pairs (already
    deduplicated). payload_ds: Ray dataset (doc_id, pl) holding one
    verification payload per CANDIDATE doc (already filtered down from
    the corpus). Returns a DATASET of (id_a, id_b, out_col) — pairs
    whose payloads were both present, scored; nothing is collected to
    the driver.

    Fast path — payloads fit the 64 MiB broadcast budget (the normal
    LSH-contract case): ship a CSR triple (sorted ids + offsets + one
    flat value array — ray.get of numpy is zero-copy where a python
    dict would re-unpickle per task) ONCE and score pairs in stateless
    map tasks over the pair Dataset; zero additional shuffles.

    Scale path — a high-duplication corpus blows the budget: two
    bucketed shuffles keyed by PAIR IDENTITY (id_a, id_b), never a
    driver-assigned index: (1) bucket by doc_id to attach each doc's
    payload to its pair halves, (2) bucket by (id_a, id_b) to score
    where both halves meet.

    Both paths return identical results; score_fn(payload_a,
    payload_b) must be symmetric and picklable. ``extra_cols`` are
    pair-level columns of cand_ds carried through to the scored
    output unchanged (so callers don't need a re-attach shuffle).
    """
    import pyarrow as pa
    import ray

    from ..relational import bucketed_map_groups

    payload_ds = payload_ds.materialize()
    if payload_ds.size_bytes() <= _BROADCAST_VERIFY_BYTES:
        pdf = payload_ds.to_pandas()
        if len(pdf) == 0:       # fully-empty datasets can lose columns
            pdf = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                "pl": pd.Series([], dtype=object)})
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        pls = pdf["pl"].to_numpy()[order] if len(pdf) else np.array([])
        lens = np.fromiter((len(x) for x in pls), dtype=np.int64,
                           count=len(pls))
        offs = np.zeros(len(pls) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        flat = (np.concatenate([np.asarray(x) for x in pls])
                if len(pls) else np.array([]))
        csr_ref = ray.put((ids, offs, flat))

        def score_batch(b: pd.DataFrame) -> pd.DataFrame:
            p_ids, p_offs, p_flat = ray.get(csr_ref)
            if len(p_ids) == 0 or not len(b):
                return _empty_pairs(
                    {out_col: "float64",
                     **{c: (b[c].dtype if c in b.columns else "object")
                        for c in extra_cols}})
            a = b["id_a"].to_numpy(dtype=np.int64)
            c = b["id_b"].to_numpy(dtype=np.int64)
            ia = np.searchsorted(p_ids, a)
            ic = np.searchsorted(p_ids, c)
            ok = ((ia < len(p_ids)) & (ic < len(p_ids)))
            ok &= np.where(ok, p_ids[np.minimum(ia, len(p_ids) - 1)] == a,
                           False)
            ok &= np.where(ok, p_ids[np.minimum(ic, len(p_ids) - 1)] == c,
                           False)
            rows = np.flatnonzero(ok)
            scores = np.empty(len(rows), dtype=np.float64)
            for n, i in enumerate(rows):
                scores[n] = score_fn(
                    p_flat[p_offs[ia[i]]:p_offs[ia[i] + 1]],
                    p_flat[p_offs[ic[i]]:p_offs[ic[i] + 1]])
            out = pd.DataFrame({
                "id_a": a[rows], "id_b": c[rows],
                out_col: pd.array(scores, dtype="float64"),
            })
            for col in extra_cols:
                out[col] = b[col].to_numpy()[rows]
            return out

        return cand_ds.map_batches(score_batch, batch_format="pandas",
                                   batch_size=2048)

    s = payload_ds.schema()
    pl_type = dict(zip(s.names, s.types))["pl"]
    cs = cand_ds.schema()
    extra_types = {c: t for c, t in zip(cs.names, cs.types)
                   if c in extra_cols}

    def explode(b: pd.DataFrame) -> pa.Table:
        a = b["id_a"].to_numpy(dtype=np.int64)
        c = b["id_b"].to_numpy(dtype=np.int64)
        n2 = 2 * len(b)
        cols = [pa.array(np.column_stack([a, c]).ravel()),
                pa.array(np.repeat(a, 2)), pa.array(np.repeat(c, 2)),
                pa.array(np.zeros(n2, dtype=bool)),
                pa.array([[]] * n2, pl_type)]
        names = ["doc_id", "id_a", "id_b", "is_pl", "pl"]
        for col in extra_cols:
            cols.append(pa.array(np.repeat(b[col].to_numpy(), 2),
                                 type=extra_types[col], from_pandas=True))
            names.append(col)
        return pa.Table.from_arrays(cols, names=names)

    def tag_payload(t: pa.Table) -> pa.Table:
        n = t.num_rows
        z = pa.array(np.zeros(n, dtype=np.int64))
        cols = [t.column("doc_id").cast(pa.int64()), z, z,
                pa.array(np.ones(n, dtype=bool)), t.column("pl")]
        names = ["doc_id", "id_a", "id_b", "is_pl", "pl"]
        for col in extra_cols:
            cols.append(pa.nulls(n, type=extra_types[col]))
            names.append(col)
        return pa.Table.from_arrays(cols, names=names)

    halves = cand_ds.map_batches(explode, batch_format="pandas")
    tagged = payload_ds.map_batches(tag_payload, batch_format="pyarrow")

    def attach(g: pd.DataFrame) -> pa.Table:
        h = g[~g["is_pl"]][["doc_id", "id_a", "id_b", *extra_cols]]
        pls = g[g["is_pl"]][["doc_id", "pl"]]
        m = h.merge(pls, on="doc_id", how="inner")
        # zero-copy list construction (offsets + one flat value
        # array): a per-row tolist() here costs ~10 s per million
        # payload rows and was the verify stage's hot line
        vals = m["pl"].to_numpy()
        lens = np.fromiter((len(x) for x in vals), np.int64,
                           count=len(vals))
        offs = np.zeros(len(vals) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        np_vt = pl_type.value_type.to_pandas_dtype()
        flat = (np.concatenate(vals) if len(vals)
                else np.empty(0, dtype=np_vt))
        pl_arr = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(flat.astype(np_vt, copy=False),
                     type=pl_type.value_type))
        cols = [pa.array(m["id_a"].to_numpy(dtype=np.int64)),
                pa.array(m["id_b"].to_numpy(dtype=np.int64)), pl_arr]
        names = ["id_a", "id_b", "pl"]
        for col in extra_cols:
            cols.append(pa.array(m[col], type=extra_types[col],
                                 from_pandas=True))
            names.append(col)
        return pa.Table.from_arrays(cols, names=names)

    attached = bucketed_map_groups(halves.union(tagged), ["doc_id"],
                                   attach)

    def score_groups(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _empty_pairs(
                {out_col: "float64",
                 **{c: (g[c].dtype if c in g.columns else "object")
                    for c in extra_cols}})
        # each pair contributes AT MOST two rows (one per half, docs
        # unique in the payload set), so after a lexsort the two
        # halves are adjacent — adjacency detection replaces a
        # ~100 us/group pandas tuple groupby (the hot line at
        # millions of candidate pairs)
        a = g["id_a"].to_numpy(dtype=np.int64)
        b = g["id_b"].to_numpy(dtype=np.int64)
        order = np.lexsort((b, a))
        a2, b2 = a[order], b[order]
        pls = g["pl"].to_numpy()[order]
        idx = np.flatnonzero((a2[1:] == a2[:-1]) & (b2[1:] == b2[:-1]))
        scores = np.empty(len(idx), dtype=np.float64)
        for n, i in enumerate(idx):
            scores[n] = score_fn(pls[i], pls[i + 1])
        out = pd.DataFrame({
            "id_a": a2[idx], "id_b": b2[idx],
            out_col: pd.array(scores, dtype="float64")})
        for col in extra_cols:
            # both halves of a pair carry identical extras; take one
            out[col] = g[col].to_numpy()[order][idx]
        return out

    return bucketed_map_groups(attached, ["id_a", "id_b"], score_groups)


def _shingle_payload(batch: pd.DataFrame, *, num_perm: int,
                     shingle: str, text_col: str, id_col: str):
    """Sorted-unique shingle-id payload per doc, with each UNIQUE
    shingle string hashed once per batch (factorize) instead of once
    per occurrence — same trick as signatures_batch, identical ids.
    Explicit Arrow list<int64> payloads: Ray's ndarray tensor
    extension cannot shuffle variable-length cells, and an object
    column would make the join's schema-driven null-fill guess wrong."""
    import pyarrow as pa
    mh = _hasher(num_perm, shingle)
    sets = [mh.shingle_strings(t) for t in batch[text_col]]
    if sets:
        flat = np.asarray([s for ss in sets for s in ss], dtype=object)
        inv, uniq = pd.factorize(flat)
        # 63-bit ids (int64-positive): payload Jaccard collisions drop
        # from the old 31-bit space's ~1e-4 to ~1e-13
        uh = np.fromiter((_stable_u64(s) & ((1 << 63) - 1)
                          for s in uniq), np.int64, count=len(uniq))
        h = uh[inv]
        offs = np.zeros(len(sets) + 1, np.int64)
        np.cumsum(np.fromiter((len(s) for s in sets), np.int64,
                              count=len(sets)), out=offs[1:])
        pls = [np.unique(h[offs[i]:offs[i + 1]]).tolist()
               for i in range(len(sets))]
    else:
        pls = []
    return pa.Table.from_arrays(
        [pa.array(batch[id_col].to_numpy(dtype=np.int64)),
         pa.array(pls, pa.list_(pa.int64()))],
        names=["doc_id", "pl"])


def minhash_dedup_pairs_ds(ds, *, num_perm: int = 128, bands: int = 16,
                           shingle: str = "word3", threshold: float = 0.7,
                           text_col: str = "text", id_col: str = "doc_id",
                           batch_size: int = 4096):
    """Near-duplicate pairs with exact-Jaccard verification, as a
    DATASET of (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold. ``shingle='char5'`` makes this the
    n-gram-Jaccard dedup. Everything stays distributed: banding
    shuffle -> bucketed pair dedup -> adaptive candidate-doc filter ->
    shingle payloads computed where the docs live -> adaptive
    broadcast/shuffle verification.
    """
    cand_raw = _banded_candidates(ds, num_perm=num_perm, bands=bands,
                                  shingle=shingle, text_col=text_col,
                                  id_col=id_col, batch_size=batch_size)
    cand_ds = _dedup_pairs_ds(cand_raw).materialize()
    cand_docs = _id_filter(ds, _pair_ids_ds(cand_ds, id_col), id_col,
                           batch_size=batch_size)
    payload_ds = cand_docs.map_batches(
        functools.partial(_shingle_payload, num_perm=num_perm,
                          shingle=shingle, text_col=text_col,
                          id_col=id_col),
        batch_format="pandas", batch_size=batch_size)
    verified = _pairwise_verify(cand_ds, payload_ds, _jaccard_arrays,
                                "jaccard")

    def thresh(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["jaccard"] = np.round(b["jaccard"].to_numpy(dtype=np.float64), 4)
        return b[b["jaccard"] >= threshold]

    return verified.map_batches(thresh, batch_format="pandas")


def _banded_candidates(ds, *, num_perm, bands, shingle, text_col,
                       id_col, batch_size):
    from ..relational import bucketed_map_groups
    band_rows = ds.map_batches(
        functools.partial(minhash_band_rows, num_perm=num_perm,
                          bands=bands, shingle=shingle, text_col=text_col,
                          id_col=id_col),
        batch_format="pandas", batch_size=batch_size)
    return bucketed_map_groups(
        band_rows, ["band", "band_hash"],
        lambda g: _grouped_pairs(g, ["band", "band_hash"]))


# ------------------------------------------- grouped (multi-row) near-dup

def _group_sig_partial(b: pd.DataFrame, *, num_perm: int, shingle: str,
                       text_col: str, group_col: str) -> pd.DataFrame:
    """Per-batch partial: elementwise-min of the rows' MinHash
    signatures per group. min(sig(A), sig(B)) == sig(A ∪ B), so these
    partials combine mergeably — a conversation's signature never
    needs its turns assembled in one place."""
    if not len(b):
        # typed empty (group ids are int64 per the operator contract)
        return pd.DataFrame({group_col: pd.Series([], dtype="int64"),
                             "sig": pd.Series([], dtype=object)})
    mh = _hasher(num_perm, shingle)
    sigs = mh.signatures_batch(b[text_col].tolist())
    codes, groups = pd.factorize(b[group_col].to_numpy())
    order = np.argsort(codes, kind="stable")
    oc = codes[order]
    starts = np.flatnonzero(np.r_[True, oc[1:] != oc[:-1]])
    mins = np.minimum.reduceat(sigs[order], starts, axis=0)
    return pd.DataFrame({group_col: groups[oc[starts]],
                         "sig": [m.tobytes() for m in mins]})


def _sig_min_combine(g: pd.DataFrame, *, group_col: str) -> pd.DataFrame:
    mat = np.stack([np.frombuffer(x, dtype=np.int64) for x in g["sig"]])
    codes, groups = pd.factorize(g[group_col].to_numpy())
    order = np.argsort(codes, kind="stable")
    oc = codes[order]
    starts = np.flatnonzero(np.r_[True, oc[1:] != oc[:-1]])
    mins = np.minimum.reduceat(mat[order], starts, axis=0)
    return pd.DataFrame({group_col: groups[oc[starts]],
                         "sig": [m.tobytes() for m in mins]})


def _band_rows_from_sigs(b: pd.DataFrame, *, num_perm: int, bands: int,
                         group_col: str) -> pd.DataFrame:
    rows_per_band = num_perm // bands
    n = len(b)
    band_hashes = np.empty((n, bands), dtype=np.int64)
    for i, x in enumerate(b["sig"]):
        row = np.frombuffer(x, dtype=np.int64)
        for bb in range(bands):
            band_hashes[i, bb] = zlib.crc32(
                row[bb * rows_per_band:(bb + 1) * rows_per_band]
                .tobytes())
    return pd.DataFrame({
        "band": np.tile(np.arange(bands, dtype=np.int32), n),
        "band_hash": band_hashes.ravel(),
        "doc_id": np.repeat(b[group_col].to_numpy(), bands),
    })


def grouped_minhash_pairs_ds(ds, *, group_col: str = "doc_id",
                             text_col: str = "text",
                             num_perm: int = 128, bands: int = 16,
                             shingle: str = "word3",
                             threshold: float = 0.7,
                             batch_size: int = 4096,
                             verify_max_df: int = 256):
    """Near-duplicate GROUPS (conversations/documents spanning many
    rows) without ever assembling a group in one task.

    A group's shingle set is the UNION of its rows' shingle sets, and
    MinHash signatures of unions are elementwise minima — so group
    signatures build as mergeable partials (per-batch min, bucketed
    min-combine; a 10^7-turn conversation contributes one 1-KiB
    partial per batch, never its text). Banding over the combined
    signatures yields candidate group pairs (distributed pair dedup);
    verification is the EXACT union-set Jaccard via the inverted-index
    join over the candidate groups' rows with ``multi_row_ids``
    postings dedupe — the per-shingle bucket restores distinct
    (group, shingle) semantics, so the score is exact set Jaccard, not
    an estimate. Returned pairs are all id_a < id_b pairs among
    banding-candidate groups with exact J >= threshold.

    ``group_col`` values must be non-negative int64 (pack string conv
    ids to ints first). Word-k shingles only (union semantics are
    per-row: shingles never span row boundaries — for transcripts,
    a shingle never crosses a turn).
    """
    from ..relational import bucketed_map_groups
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    if not shingle.startswith("word"):
        raise ValueError("grouped near-dup supports word-k shingles "
                         "(per-row shingling must match the exact "
                         "verification join's tokenizer)")
    k = int(shingle[4:])
    # the input feeds two consumers (the signature pass and the exact
    # union-Jaccard verification rows); pin it in the (spillable)
    # object store so a lazy upstream — e.g. the whole extraction
    # pipeline — does not re-execute once per consumer (same pattern
    # as strip_conv_boilerplate)
    ds = ds.materialize()
    # finer batches than the default 4096: signature partials shrink
    # ~7x (one row per conv per batch), so the stage is
    # parallelism-bound, not amortization-bound — 4096-row bundles
    # left a 32-cpu pool 8 tasks (measured 4.2-5.4 s vs 2.6-3.3 s at
    # 1024 for the sf0.1 sig+combine pass)
    partials = ds.map_batches(
        functools.partial(_group_sig_partial, num_perm=num_perm,
                          shingle=shingle, text_col=text_col,
                          group_col=group_col),
        batch_format="pandas", batch_size=min(batch_size, 1024))
    sigs = bucketed_map_groups(
        partials, [group_col],
        functools.partial(_sig_min_combine, group_col=group_col))
    band_rows = sigs.map_batches(
        functools.partial(_band_rows_from_sigs, num_perm=num_perm,
                          bands=bands, group_col=group_col),
        batch_format="pandas")
    cand = _dedup_pairs_ds(bucketed_map_groups(
        band_rows, ["band", "band_hash"],
        lambda g: _grouped_pairs(g, ["band", "band_hash"]))).materialize()
    # exact union-Jaccard verification over candidate groups' rows
    rows = ds.map_batches(
        lambda b: pd.DataFrame({"doc_id": b[group_col].to_numpy(),
                                "text": b[text_col].to_numpy()}),
        batch_format="pandas")
    cand_rows = _id_filter(rows, _pair_ids_ds(cand, "doc_id"), "doc_id",
                           batch_size=batch_size)
    exact = jaccard_pairs_exact_ds(cand_rows, k=k, threshold=threshold,
                                   max_df=verify_max_df,
                                   batch_size=batch_size,
                                   multi_row_ids=True)

    def thresh(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["jaccard"] = np.round(b["jaccard"].to_numpy(np.float64), 4)
        return b[b["jaccard"] >= threshold][["id_a", "id_b", "jaccard"]]

    return exact.map_batches(thresh, batch_format="pandas")


def grouped_minhash_pairs(ds, **kwargs) -> pd.DataFrame:
    """grouped_minhash_pairs_ds collected to sorted driver pandas."""
    return _collect_pairs(grouped_minhash_pairs_ds(ds, **kwargs),
                          {"jaccard": "float64"})


def _collect_pairs(pairs_ds, extra: dict) -> pd.DataFrame:
    """Small-result driver collection for the public pandas API."""
    out = pairs_ds.to_pandas()
    if out.empty:
        return _empty_pairs(extra)
    return (out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
            .astype({"id_a": "int64", "id_b": "int64"}))


def minhash_dedup_pairs(ds, **kwargs) -> pd.DataFrame:
    """minhash_dedup_pairs_ds collected to sorted driver pandas."""
    return _collect_pairs(minhash_dedup_pairs_ds(ds, **kwargs),
                          {"jaccard": "float64"})


# --------------------------------------------------- connected components

def components_from_pairs(pairs: pd.DataFrame) -> dict:
    """Driver-side union-find -> {id: min-id representative}. Kept as
    the small-input fast path and as the test oracle for the
    distributed propagation below; production keep-set uses
    components_min_label."""
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


def components_min_label(pairs, *, max_iter: int = 50) -> pd.DataFrame:
    """Distributed connected components by iterative min-label
    propagation over Ray datasets. ``pairs`` may be a DATASET of
    (id_a, id_b) edges — the production path, nothing driver-side —
    or a pandas DataFrame for small inputs/tests.

    Each round: every node takes min(own label, neighbors' labels) —
    one partitioned hash join (edges x labels) plus one bucketed
    groupby-min; converged when the (monotonically non-increasing) sum
    of labels stops changing, which the driver checks as ONE scalar
    aggregate. Labels converge to each component's min id, matching
    union-find-with-min-merge exactly. O(diameter) rounds; near-dup
    components are dense (LSH emits most intra-clique pairs) so this is
    2-4 rounds in practice.

    Returns a DataFrame (node, rep) covering every node that appears in
    the edge list. Scale note: on the distributed path the edge list
    and labels stay in the object store and driver traffic is one int
    per round; an edge list under the 64 MiB verify budget is instead
    union-found on the driver in one collect (adaptive, like
    _id_filter / _pairwise_verify — a dozen fixed-cost shuffle rounds
    for a few thousand edges is pure overhead).
    """
    empty = pd.DataFrame({"node": pd.array([], dtype="int64"),
                          "rep": pd.array([], dtype="int64")})
    if not isinstance(pairs, pd.DataFrame):
        # adaptive small-edge-list path (the broadcast-small-sides
        # rule): an edge list under the verify budget is union-found
        # on the driver in ONE collect instead of O(diameter) shuffle
        # rounds — identical min-rep result (the distributed path's
        # own test oracle)
        pairs = pairs.materialize()
        if pairs.size_bytes() > _BROADCAST_VERIFY_BYTES:
            return _components_min_label_distributed(pairs, max_iter)
        pairs = pairs.to_pandas()
    if pairs.empty or "id_a" not in pairs.columns:
        return empty
    pairs = pairs[["id_a", "id_b"]].astype("int64")
    rep_map = components_from_pairs(pairs)
    nodes = np.unique(np.concatenate([pairs["id_a"].to_numpy(),
                                      pairs["id_b"].to_numpy()]))
    rep = (pd.Series(nodes).map(rep_map).fillna(pd.Series(nodes))
           .to_numpy(dtype=np.int64))
    return pd.DataFrame({"node": nodes, "rep": rep})


def _components_min_label_distributed(pairs, max_iter: int) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    from ..relational import bucketed_map_groups, distinct_ds

    empty = pd.DataFrame({"node": pd.array([], dtype="int64"),
                          "rep": pd.array([], dtype="int64")})

    # symmetric edge list: propagate labels both directions. Tagged
    # with the unified message-join schema up front (is_edge, key =
    # receiving end's neighbor) so each round is a pure int64 bucketed
    # merge — a generic outer-union join would null-fill and silently
    # coerce the id columns to float64.
    def to_edges(b: pd.DataFrame) -> pa.Table:
        a = b["id_a"].to_numpy(dtype=np.int64)
        c = b["id_b"].to_numpy(dtype=np.int64)
        return pa.table({
            "key": np.concatenate([c, a]),        # label provider
            "node": np.concatenate([a, c]),       # label receiver
            "label": np.zeros(2 * len(b), dtype=np.int64),
            "is_edge": np.ones(2 * len(b), dtype=bool),
        })

    edges_ds = pairs.map_batches(to_edges,
                                 batch_format="pandas").materialize()
    if edges_ds.count() == 0:
        return empty

    def label_table(node_arr, label_arr) -> pa.Table:
        return pa.table({
            "key": node_arr, "node": node_arr, "label": label_arr,
            "is_edge": np.zeros(len(node_arr), dtype=bool),
        })

    nodes_ds = distinct_ds(
        edges_ds.map_batches(lambda t: t.select(["node"]),
                             batch_format="pyarrow"), ["node"])
    labels = nodes_ds.map_batches(
        lambda b: label_table(b["node"].to_numpy(dtype=np.int64),
                              b["node"].to_numpy(dtype=np.int64)),
        batch_format="pandas").materialize()
    prev_sum = int(labels.sum("label"))

    def round_fn(g: pd.DataFrame) -> pd.DataFrame:
        """One bucket of the message join: attach each provider node's
        label to its outgoing edges, emit (receiver, label) messages."""
        e = g[g["is_edge"]][["key", "node"]]
        l = g[~g["is_edge"]][["key", "label"]]
        m = e.merge(l, on="key")
        return pd.DataFrame({"node": m["node"], "label": m["label"]})

    def min_per_node(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False, sort=False)["label"].min()
        return label_table(out["node"].to_numpy(dtype=np.int64),
                           out["label"].to_numpy(dtype=np.int64)).to_pandas()

    converged = False
    for _ in range(max_iter):
        msgs = (bucketed_map_groups(edges_ds.union(labels), ["key"],
                                    round_fn)
                .map_batches(lambda t: t, batch_format="pyarrow"))
        own = labels.map_batches(lambda t: t.select(["node", "label"]),
                                 batch_format="pyarrow")
        # min over (incoming messages + own label) per node; emitted
        # back in the tagged schema for the next round's union
        new_labels = (bucketed_map_groups(msgs.union(own), ["node"],
                                          min_per_node)
                      .map_batches(lambda t: t, batch_format="pyarrow")
                      .materialize())
        new_sum = int(new_labels.sum("label"))
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # returning silently would leak near-duplicates into the kept
        # set (a >max_iter-diameter chain component); refuse instead
        raise RuntimeError(
            f"components_min_label did not converge in {max_iter} "
            "rounds; raise max_iter (component diameter exceeds it)")
    out = (labels.map_batches(lambda t: t.select(["node", "label"]),
                              batch_format="pyarrow")
           .to_pandas().rename(columns={"label": "rep"}))
    return (out.sort_values("node").reset_index(drop=True)
            .astype({"node": "int64", "rep": "int64"}))


def minhash_dedup_keep_ds(ds, *, num_perm: int = 128, bands: int = 16,
                          shingle: str = "word3", threshold: float = 0.7,
                          text_col: str = "text", id_col: str = "doc_id",
                          batch_size: int = 4096):
    """The actual training-data dedup operator: drop near-duplicates,
    keeping each component's min-id representative (components computed
    by distributed min-label propagation over the pair DATASET) — the
    kept-id set is returned AS A DATASET, so the full corpus filter
    composes with downstream stages without any driver materialization.
    The filter for the DROPPED id set is adaptive: broadcast under the
    budget (it is bounded by the duplicate count; at real scale it
    would ship as a Bloom filter), co-partitioned anti-join above it.
    """
    import ray.data as rd

    pairs_ds = minhash_dedup_pairs_ds(
        ds, num_perm=num_perm, bands=bands, shingle=shingle,
        threshold=threshold, text_col=text_col, id_col=id_col,
        batch_size=batch_size).materialize()
    comp = components_min_label(pairs_ds)
    dropped = comp.loc[comp["node"] != comp["rep"], ["node"]].rename(
        columns={"node": id_col})
    ids_only = ds.map_batches(lambda b: b[[id_col]],
                              batch_format="pandas",
                              batch_size=batch_size)
    if dropped.empty:
        return ids_only
    return _id_filter(ids_only, rd.from_pandas(dropped), id_col,
                      anti=True, batch_size=batch_size)


def minhash_dedup_keep(ds, **kwargs) -> pd.DataFrame:
    """minhash_dedup_keep_ds collected to sorted driver pandas."""
    id_col = kwargs.get("id_col", "doc_id")
    kept = minhash_dedup_keep_ds(ds, **kwargs).to_pandas()
    return (kept.sort_values(id_col).reset_index(drop=True)
            .astype({id_col: "int64"}))


# ---------------------------------------------------------------- simhash

_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)],
                  dtype=np.uint8)

def _simhash64(text: str) -> int:
    """64-bit SimHash over unique whitespace tokens, vectorized across
    tokens (token-hash bit matrix -> signed column sums)."""
    toks = list(set(text.split()))
    if not toks:
        return 0
    h = np.array([_stable_u64(t) for t in toks], dtype=np.uint64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    return int("".join("1" if v > 0 else "0" for v in acc), 2)


def simhash_rows(batch: pd.DataFrame, *, text_col: str,
                 id_col: str) -> pd.DataFrame:
    """Stateless map task: doc -> 4 x (doc_id, simhash, band, band_key)
    rows (16-bit bands of the 64-bit signature)."""
    ids, sigs, bands, keys = [], [], [], []
    for doc_id, text in zip(batch[id_col], batch[text_col]):
        s = _simhash64(text)
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


def simhash_dedup_pairs_ds(ds, *, max_hamming: int = 3,
                           text_col: str = "text", id_col: str = "doc_id",
                           batch_size: int = 4096):
    """Candidate pairs sharing any 16-bit band, verified by Hamming
    distance on the full 64-bit signature — as a DATASET of
    (id_a, id_b, hamming). Signatures ride with the pairs, so
    verification is a per-batch vectorized popcount; the driver never
    sees the pair list."""
    rows = ds.map_batches(
        functools.partial(simhash_rows, text_col=text_col, id_col=id_col),
        batch_format="pandas", batch_size=batch_size)

    def pairs_with_sig(df: pd.DataFrame) -> pd.DataFrame:
        """Within-bucket pair expansion carrying both signatures,
        fully vectorized (offset-diagonal, see _pair_positions).
        drop_duplicates: a doc_id duplicated in the CORPUS (e.g. a
        union of overlapping shards) appears twice in a group and a
        bare pair expansion would emit an (x, x) self-pair."""
        dup = df[df.duplicated(["band", "band_key"], keep=False)]
        if dup.empty:
            return _empty_pairs({"sig_a": "int64", "sig_b": "int64"})
        sub = dup.drop_duplicates(["band", "band_key", "doc_id"])
        code = _group_codes(sub, ["band", "band_key"])
        ids = sub["doc_id"].to_numpy()
        order = np.lexsort((ids, code))
        code, ids = code[order], ids[order]
        sigs = sub["simhash"].to_numpy()[order]
        i, j = _pair_positions(code)
        if not len(i):
            return _empty_pairs({"sig_a": "int64", "sig_b": "int64"})
        return pd.DataFrame({"id_a": ids[i], "id_b": ids[j],
                             "sig_a": sigs[i], "sig_b": sigs[j]})

    from ..relational import bucketed_map_groups
    cand_raw = bucketed_map_groups(rows, ["band", "band_key"],
                                   pairs_with_sig)

    def hamming_batch(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return _empty_pairs({"hamming": "int64"})
        x = (b["sig_a"].to_numpy(dtype="int64")
             ^ b["sig_b"].to_numpy(dtype="int64")).astype(np.uint64)
        # 16-bit table popcount: 4 gathers instead of 64 shift/mask
        # passes (millions of candidate pairs on a template-heavy
        # corpus)
        m = np.uint64(0xFFFF)
        ham = (_POP16[x & m] + _POP16[(x >> np.uint64(16)) & m]
               + _POP16[(x >> np.uint64(32)) & m]
               + _POP16[x >> np.uint64(48)]).astype(np.int64)
        out = b[["id_a", "id_b"]].copy(deep=False)
        out["hamming"] = ham
        return out[out["hamming"] <= max_hamming]

    # verify BEFORE the pair-dedup shuffle: hamming is per-row and
    # identical for every duplicate of a pair, so filtering first
    # shrinks the shuffle by the verification selectivity and drops
    # the signature columns from it
    return _dedup_pairs_ds(
        cand_raw.map_batches(hamming_batch, batch_format="pandas"))


def simhash_dedup_pairs(ds, **kwargs) -> pd.DataFrame:
    """simhash_dedup_pairs_ds collected to sorted driver pandas."""
    return _collect_pairs(simhash_dedup_pairs_ds(ds, **kwargs),
                          {"hamming": "int64"})


# ------------------------------------------------------ embedding near-dup

def _embed_buckets(batch: pd.DataFrame, *, n_planes: int, vec_col: str,
                   id_col: str) -> pd.DataFrame:
    """Stateless map task: hyperplane-LSH bucket per vector. Planes are
    seeded and built lazily from the batch's own vector dim (identical
    in every worker — no driver take(1) round-trip to sniff the dim)."""
    vecs = np.stack(batch[vec_col].to_numpy())
    planes = _embed_planes(n_planes, vecs.shape[1])
    proj = vecs @ planes.T > 0
    keys = proj @ (1 << np.arange(n_planes))
    return pd.DataFrame({id_col: batch[id_col],
                         "bucket": keys.astype("int64")})


_PLANES_CACHE: dict = {}


def _embed_planes(n_planes: int, dim: int) -> np.ndarray:
    key = (n_planes, dim)
    if key not in _PLANES_CACHE:
        _PLANES_CACHE[key] = (np.random.RandomState(777)
                              .standard_normal((n_planes, dim)))
    return _PLANES_CACHE[key]


def _vector_payload(batch: pd.DataFrame, *, vec_col: str, id_col: str):
    import pyarrow as pa
    return pa.Table.from_arrays(
        [pa.array(batch[id_col].to_numpy(dtype=np.int64)),
         pa.array([np.asarray(v, dtype=np.float64).tolist()
                   for v in batch[vec_col]], pa.list_(pa.float64()))],
        names=["doc_id", "pl"])


def embedding_dedup_pairs_ds(ds, *, threshold: float = 0.95,
                             n_planes: int = 12, vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             batch_size: int = 4096):
    """Random-hyperplane LSH buckets -> distributed exact-cosine
    verification, as a DATASET of (id_a, id_b, cosine) — same
    end-to-end-distributed pair flow as minhash."""
    from ..relational import bucketed_map_groups

    buckets = ds.map_batches(
        functools.partial(_embed_buckets, n_planes=n_planes,
                          vec_col=vec_col, id_col=id_col),
        batch_format="pandas", batch_size=batch_size)
    cand_raw = bucketed_map_groups(
        buckets, ["bucket"],
        lambda g: _grouped_pairs(g.rename(columns={id_col: "doc_id"}),
                                 ["bucket"]))
    cand_ds = _dedup_pairs_ds(cand_raw).materialize()
    cand_docs = _id_filter(ds, _pair_ids_ds(cand_ds, id_col), id_col,
                           batch_size=batch_size)
    payload_ds = cand_docs.map_batches(
        functools.partial(_vector_payload, vec_col=vec_col,
                          id_col=id_col),
        batch_format="pandas", batch_size=batch_size)
    verified = _pairwise_verify(cand_ds, payload_ds, _cosine_arrays,
                                "cosine")

    def thresh(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["cosine"] = np.round(b["cosine"].to_numpy(dtype=np.float64), 4)
        return b[b["cosine"] >= threshold]

    return verified.map_batches(thresh, batch_format="pandas")


def embedding_dedup_pairs(ds, **kwargs) -> pd.DataFrame:
    """embedding_dedup_pairs_ds collected to sorted driver pandas."""
    return _collect_pairs(embedding_dedup_pairs_ds(ds, **kwargs),
                          {"cosine": "float64"})


# ------------------------------------ exact similarity join (set Jaccard)

def _shingle_postings(batch: pa.Table, *, k: int, id_col: str,
                      text_col: str) -> pa.Table:
    """Explode each doc into its DISTINCT word-k-shingle postings
    (doc_id, sh) — fully Arrow C++: RE2 whitespace split, element-wise
    string join of the k shifted token slices (a window stays inside
    one doc iff its first and last token share the list parent index),
    and a key-only hash group-by for the per-doc DISTINCT. Same
    shingle strings as the previous Python `" ".join(toks[i:i+k])`
    loop, ~vectorized end to end."""
    import pyarrow.compute as pc
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "sh": pa.array([], pa.large_string())})
    toks = pc.split_pattern_regex(batch.column(text_col),
                                  pattern=r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    par = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    flat, par = flat.filter(mask), par.filter(mask)
    m = len(flat) - k + 1
    if m <= 0:
        return empty
    parts = [flat.slice(i, m) for i in range(k)]
    sh = pc.binary_join_element_wise(*parts, " ")
    same = pc.equal(par.slice(0, m), par.slice(k - 1, m))
    sh = sh.filter(same)
    ids = pc.take(batch.column(id_col), par.slice(0, m).filter(same))
    if not len(sh):
        return empty
    res = pa.TableGroupBy(
        pa.table({"doc_id": pc.cast(ids, pa.int64()),
                  "sh": pc.cast(sh, pa.large_string())}),
        ["doc_id", "sh"]).aggregate([])
    return res.select(["doc_id", "sh"])


def _packed_pair_sum(a: np.ndarray, b: np.ndarray, n: np.ndarray
                     ) -> pd.DataFrame:
    """Sum n per (id_a, id_b) — packed-uint64 np.unique + bincount when
    ids fit 32 bits (5-10x pandas groupby on millions of skinny pair
    rows; the combine CPU line of the exact similarity join), pandas
    fallback otherwise. id_b == -1 size-marker rows pack fine via +1."""
    if (np.issubdtype(a.dtype, np.integer)
            and np.issubdtype(b.dtype, np.integer)
            and len(a) and a.min() >= 0 and b.min() >= -1
            and max(a.max(), b.max()) < (1 << 32) - 1):
        key = ((a + 1).astype(np.uint64) << np.uint64(32)) \
            | (b + 1).astype(np.uint64)
        u, inv = np.unique(key, return_inverse=True)
        # bincount sums in float64: exact for co-counts < 2^53
        s = np.bincount(inv, weights=n).astype(np.int64)
        return pd.DataFrame({
            "id_a": (u >> np.uint64(32)).astype(np.int64) - 1,
            "id_b": (u & np.uint64(0xFFFFFFFF)).astype(np.int64) - 1,
            "n": s})
    return (pd.DataFrame({"id_a": a, "id_b": b, "n": n})
            .groupby(["id_a", "id_b"], sort=False)["n"].sum()
            .reset_index())


def _jaccard_postings_bucket(g: pd.DataFrame, *, max_df: int,
                             dedupe_ids: bool = False) -> pd.DataFrame:
    """Per shingle-hash bucket: exact document frequency per shingle
    (all postings of a shingle land in ONE bucket), stop-shingle drop
    (df > max_df), then two partial outputs in one union frame:

    - size partials  (id_a=doc, id_b=-1, n=retained shingles here)
    - pair partials  (id_a<id_b, n=co-occurring shingles here),
      vectorized offset-diagonal expansion (_pair_positions) and
      pre-aggregated before the pair shuffle.

    ``dedupe_ids``: when one logical document spans MULTIPLE input
    rows (conversation-level dedup: id = conv, rows = turns), the same
    (id, shingle) posting arrives once per containing row; all copies
    of a shingle land in this one bucket, so a local distinct here
    restores exact set semantics (df = distinct docs, co-counts =
    distinct shared shingles). Off by default — single-row documents
    are distinct by construction and skip the pass.
    """
    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64")})
    if dedupe_ids:
        g = g.drop_duplicates(["doc_id", "sh"])
    codes, _u = pd.factorize(g["sh"].to_numpy())
    df = np.bincount(codes)
    keep = df[codes] <= max_df
    ids = g["doc_id"].to_numpy()[keep]
    codes = codes[keep]
    if not len(ids):
        return empty
    u, cnt = np.unique(ids, return_counts=True)
    sizes = pd.DataFrame({"id_a": u.astype(np.int64),
                          "id_b": np.int64(-1),
                          "n": cnt.astype(np.int64)})
    order = np.lexsort((ids, codes))
    c, sids = codes[order], ids[order]
    i, j = _pair_positions(c)
    if not len(i):
        return pd.concat([empty, sizes], ignore_index=True)
    pairs = _packed_pair_sum(sids[i], sids[j],
                             np.ones(len(i), dtype=np.int64))
    return pd.concat([pairs, sizes], ignore_index=True)


def _pair_score(n, na, nb, metric: str):
    if metric == "jaccard":
        return n / (na + nb - n)
    if metric == "containment":
        return n / np.minimum(na, nb)
    raise ValueError(f"unknown metric {metric!r}")


def jaccard_pairs_exact_ds(ds, *, k: int = 3, threshold: float = 0.5,
                           max_df: int = 256, id_col: str = "doc_id",
                           text_col: str = "text",
                           batch_size: int = 4096,
                           metric: str = "jaccard",
                           multi_row_ids: bool = False):
    """EXACT all-pairs Jaccard similarity join — the SQL-oracle-able
    complement of the MinHash approximation — via a distributed
    inverted index (the classic exact set-similarity-join plan):

      1. explode docs to DISTINCT (shingle, doc_id) postings
      2. one bucketed shuffle BY SHINGLE: per group, drop stop-shingles
         (document frequency > max_df), emit per-doc retained-size
         partials and co-occurrence pair partials
      3. one bucketed shuffle BY KEY combines both partial kinds
         (pair co-counts and per-doc sizes share the shuffle: sizes
         ride as (doc, -1) keys)
      4. attach sizes to pairs — broadcast (sorted id + count arrays,
         np.searchsorted) under the byte budget, two co-partitioned
         hash_joins above it — and filter
         J = shared / (|A| + |B| - shared) >= threshold
         (``metric="containment"`` scores shared / min(|A|, |B|)
         instead — the subset/near-subset join that catches a doc
         embedded inside a larger one, which symmetric Jaccard
         misses).

    EXACT over the df-filtered shingle space: any pair with J > 0 in
    that space shares >= 1 retained shingle, so every qualifying pair
    is generated. max_df bounds the per-shingle pair blow-up (a
    boilerplate shingle on a 100-TB crawl would otherwise emit df^2
    pairs); the SQL oracle applies the identical df filter, so the
    semantic is pinned, not approximated.
    """
    import functools as _ft

    import ray

    from ..relational import bucketed_map_groups, guard_broadcast_bytes

    postings = ds.map_batches(
        _ft.partial(_shingle_postings, k=k, id_col=id_col,
                    text_col=text_col),
        batch_format="pyarrow", batch_size=batch_size)
    parts = bucketed_map_groups(
        postings, ["sh"],
        _ft.partial(_jaccard_postings_bucket, max_df=max_df,
                    dedupe_ids=multi_row_ids))

    def _sum_n(g: pd.DataFrame) -> pd.DataFrame:
        return _packed_pair_sum(g["id_a"].to_numpy(),
                                g["id_b"].to_numpy(),
                                g["n"].to_numpy())

    combined = bucketed_map_groups(parts, ["id_a", "id_b"],
                                   _sum_n).materialize()
    sizes_ds = combined.map_batches(
        lambda b: b[b["id_b"] == -1][["id_a", "n"]],
        batch_format="pandas").materialize()
    pairs_ds = combined.map_batches(lambda b: b[b["id_b"] != -1],
                                    batch_format="pandas")

    size_bytes = sizes_ds.size_bytes() or 0
    if size_bytes <= _BROADCAST_VERIFY_BYTES:
        sdf = sizes_ds.to_pandas()
        if sdf.empty:
            sid = np.empty(0, dtype=np.int64)
            scnt = np.empty(0, dtype=np.int64)
        else:
            order = np.argsort(sdf["id_a"].to_numpy(), kind="stable")
            sid = sdf["id_a"].to_numpy()[order]
            scnt = sdf["n"].to_numpy()[order]
        guard_broadcast_bytes(sid.nbytes + scnt.nbytes,
                              "jaccard size arrays",
                              "raise _BROADCAST_VERIFY_BYTES or rely on "
                              "the hash_join path")
        ref = ray.put((sid, scnt))

        def attach(b: pd.DataFrame) -> pd.DataFrame:
            sid, scnt = ray.get(ref)
            a = b["id_a"].to_numpy()
            bb = b["id_b"].to_numpy()
            n = b["n"].to_numpy()
            na = scnt[np.searchsorted(sid, a)]
            nb = scnt[np.searchsorted(sid, bb)]
            j = _pair_score(n, na, nb, metric)
            out = pd.DataFrame({"id_a": a, "id_b": bb,
                                "n_shared": n.astype(np.int64),
                                metric: j})
            return out[out[metric] >= threshold]

        return pairs_ds.map_batches(attach, batch_format="pandas")

    # sizes outgrew the broadcast budget: two co-partitioned hash joins
    # (every pair id is present in sizes — a paired doc retained >= 1
    # shingle — so inner joins lose nothing)
    from ..relational import hash_join
    sa = sizes_ds.map_batches(
        lambda b: b.rename(columns={"n": "n_a"}), batch_format="pandas")
    sb = sizes_ds.map_batches(
        lambda b: b.rename(columns={"id_a": "id_b", "n": "n_b"}),
        batch_format="pandas")
    joined = hash_join(hash_join(pairs_ds, sa, on="id_a"), sb, on="id_b")

    def score(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy()
        j = _pair_score(n, b["n_a"].to_numpy(), b["n_b"].to_numpy(),
                        metric)
        out = pd.DataFrame({"id_a": b["id_a"].to_numpy(),
                            "id_b": b["id_b"].to_numpy(),
                            "n_shared": n.astype(np.int64),
                            metric: j})
        return out[out[metric] >= threshold]

    return joined.map_batches(score, batch_format="pandas")


def jaccard_pairs_exact(ds, **kwargs) -> pd.DataFrame:
    """jaccard_pairs_exact_ds collected to sorted driver pandas."""
    metric = kwargs.get("metric", "jaccard")
    out = jaccard_pairs_exact_ds(ds, **kwargs).to_pandas()
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "n_shared": pd.Series([], dtype="int64"),
                             metric: pd.Series([], dtype="float64")})
    return (out.sort_values(["id_a", "id_b"], kind="mergesort")
            .reset_index(drop=True))
