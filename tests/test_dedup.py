"""Dedup operator correctness on corpora with KNOWN duplicates (the
testdata documents are all distinct, so these build their own)."""

import numpy as np
import pandas as pd
import pytest

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill nearby every single day").split()


def _doc(i, mutate=0):
    words = list(BASE) * 3
    rng = np.random.RandomState(i)
    for _ in range(mutate):
        words[rng.randint(len(words))] = f"tok{rng.randint(1000)}"
    return " ".join(words)


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data as rd
    rows = []
    # 0 and 1: exact duplicates; 2: near-dup of 0 (2 words changed);
    # 3: distinct-ish (heavily mutated); 4: unrelated
    rows.append({"doc_id": 0, "text": _doc(0)})
    rows.append({"doc_id": 1, "text": _doc(0)})
    rows.append({"doc_id": 2, "text": _doc(2, mutate=2)})
    rows.append({"doc_id": 3, "text": _doc(3, mutate=40)})
    rows.append({"doc_id": 4, "text": " ".join(f"u{i}" for i in range(100))})
    return rd.from_pandas(pd.DataFrame(rows))


def test_exact_dedup_keep(corpus):
    from pdf_parser_ray.stages.dedup import exact_dedup_keep
    kept = exact_dedup_keep(corpus)
    assert kept["doc_id"].tolist() == [0, 2, 3, 4]   # 1 collapsed into 0


def test_minhash_finds_exact_and_near(corpus):
    from pdf_parser_ray.stages.dedup import minhash_dedup_pairs
    pairs = minhash_dedup_pairs(corpus, threshold=0.5)
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got
    assert (0, 2) in got and (1, 2) in got
    assert not any(4 in p for p in got)
    exact = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]["jaccard"].iloc[0]
    assert exact == 1.0


def test_ngram_char_minhash(corpus):
    from pdf_parser_ray.stages.dedup import minhash_dedup_pairs
    pairs = minhash_dedup_pairs(corpus, shingle="char5", threshold=0.5)
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got
    assert not any(4 in p for p in got)


def test_simhash_pairs(corpus):
    from pdf_parser_ray.stages.dedup import simhash_dedup_pairs
    pairs = simhash_dedup_pairs(corpus, max_hamming=3)
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got                 # identical -> hamming 0
    ham01 = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]["hamming"].iloc[0]
    assert ham01 == 0
    assert not any(4 in p for p in got)


def test_embedding_near_dup(ray_session):
    import ray.data as rd
    from pdf_parser_ray.stages.dedup import embedding_dedup_pairs
    rng = np.random.RandomState(5)
    base = rng.standard_normal(32)
    rows = []
    rows.append({"vec_id": 0, "embedding": base})
    rows.append({"vec_id": 1, "embedding": base + 1e-4 * rng.standard_normal(32)})
    rows.append({"vec_id": 2, "embedding": rng.standard_normal(32)})
    rows.append({"vec_id": 3, "embedding": -base})
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = embedding_dedup_pairs(ds, threshold=0.99)
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert got == {(0, 1)}


def test_exact_dedup_rows_transcripts(ray_session):
    import ray.data as rd
    from pdf_parser_ray.sources.transcripts import transcripts_table
    from pdf_parser_ray.stages.dedup import exact_dedup_rows
    t = transcripts_table("/root/testdata/sf0.001", limit_docs=60,
                         with_duplicates=True)
    base = transcripts_table("/root/testdata/sf0.001", limit_docs=60)
    assert t.num_rows > base.num_rows          # duplicates injected
    ds = rd.from_arrow(t.select(["conv_id", "turn_idx", "role", "tool"]))
    out = exact_dedup_rows(ds, ["conv_id", "turn_idx"]).to_pandas()
    assert len(out) == base.num_rows
    assert not out.duplicated(["conv_id", "turn_idx"]).any()

def test_components_min_label_matches_union_find(ray_session):
    """Distributed min-label propagation == driver union-find, on a
    graph with multi-hop chains (forces >1 propagation round)."""
    from pdf_parser_ray.stages.dedup import (components_from_pairs,
                                             components_min_label)
    # chain 10-11-12-13-14, clique {20,21,22}, pair (30,31), singleton-free
    pairs = pd.DataFrame({
        "id_a": [10, 11, 12, 13, 20, 20, 21, 30],
        "id_b": [11, 12, 13, 14, 21, 22, 22, 31],
    })
    dist = components_min_label(pairs)
    uf = components_from_pairs(pairs)
    expect = {n: uf.get(n, n) for n in dist["node"]}
    got = dict(zip(dist["node"], dist["rep"]))
    assert got == expect
    assert got[14] == 10 and got[22] == 20 and got[31] == 30


def test_minhash_keep_high_duplication(ray_session):
    """High-duplication corpus (the web-crawl normal case): 40% of docs
    are near-copies of a handful of templates. The distributed keep-set
    must equal the union-find answer and keep exactly one doc per
    component."""
    import ray.data as rd
    from pdf_parser_ray.stages.dedup import (components_from_pairs,
                                             minhash_dedup_keep,
                                             minhash_dedup_pairs)
    rows = []
    n_templates, copies = 8, 10
    for t in range(n_templates):
        for c in range(copies):
            # each copy mutates 1 word -> high pairwise jaccard
            rows.append({"doc_id": t * 100 + c,
                         "text": _doc(t * 1000 + c, mutate=1)})
    for i in range(80):   # distinct background docs
        rng = np.random.RandomState(10_000 + i)
        rows.append({"doc_id": 5000 + i,
                     "text": " ".join(f"w{rng.randint(100000)}"
                                      for _ in range(80))})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df)
    pairs = minhash_dedup_pairs(ds, threshold=0.7)
    comp = components_from_pairs(pairs)
    dropped = {x for x, r in comp.items() if r != x}
    expect_kept = sorted(set(df["doc_id"]) - dropped)
    kept = minhash_dedup_keep(ds, threshold=0.7)
    assert kept["doc_id"].tolist() == expect_kept
    # sanity: the duplication actually happened (most copies collapse)
    assert len(dropped) > n_templates * (copies - 1) * 0.8


def test_chunk_dedup_removes_repeated_boilerplate(ray_session, tmp_path):
    """Docs sharing a 25-word boilerplate chunk keep it only in its
    first occurrence; a doc made entirely of seen chunks disappears."""
    from pdf_parser_ray.queries import docs_chunk_dedup
    boiler = " ".join(f"b{i}" for i in range(25))
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(25))
    df = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2], dtype="int64"),
        "text": [
            boiler + " " + uniq("x"),      # first occurrence keeps boiler
            boiler + " " + uniq("y"),      # later: boiler stripped
            boiler,                        # all chunks seen -> dropped
        ],
    })
    df.to_parquet(tmp_path / "documents.parquet")
    out = docs_chunk_dedup(str(tmp_path))
    assert out["doc_id"].tolist() == [0, 1]
    assert out.loc[0, "dedup_text"] == boiler + " " + uniq("x")
    assert out.loc[1, "dedup_text"] == uniq("y")
    assert out["n_kept"].tolist() == [2, 1]


def test_pairwise_verify_paths_agree(ray_session, monkeypatch):
    """The broadcast fast path and the shuffle scale path of pairwise
    verification return identical pairs."""
    import ray.data as rd
    import pdf_parser_ray.stages.dedup as dd
    rows = [{"doc_id": 0, "text": _doc(0)},
            {"doc_id": 1, "text": _doc(0)},
            {"doc_id": 2, "text": _doc(2, mutate=2)},
            {"doc_id": 3, "text": _doc(3, mutate=40)}]
    ds = rd.from_pandas(pd.DataFrame(rows))
    fast = dd.minhash_dedup_pairs(ds, threshold=0.5)
    monkeypatch.setattr(dd, "_BROADCAST_VERIFY_BYTES", 0)
    slow = dd.minhash_dedup_pairs(ds, threshold=0.5)
    pd.testing.assert_frame_equal(fast, slow)


def test_signatures_batch_matches_scalar_oracle():
    """The vectorized batch signature path (unique-shingle hashing +
    per-lane segment-min) must be byte-identical to the per-doc scalar
    signature, including empty and shorter-than-n docs."""
    from pdf_parser_ray.stages.dedup import MinHasher
    texts = [_doc(0), _doc(0), _doc(2, mutate=2), "", "one two",
             "x", " ".join(f"u{i}" for i in range(50))]
    for mode in ("word3", "char5"):
        mh = MinHasher(64, mode)
        batch = mh.signatures_batch(texts)
        for i, t in enumerate(texts):
            np.testing.assert_array_equal(batch[i], mh.signature(t))


# ------------------------------------ exact Jaccard similarity join

def _brute_jaccard(df, k=3, max_df=None, threshold=0.0):
    """Scalar oracle: per-doc shingle sets, optional global df filter,
    all-pairs Jaccard."""
    sets = {}
    for _, r in df.iterrows():
        toks = r["text"].split()
        if len(toks) >= k:
            sets[r["doc_id"]] = {
                " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
    if max_df is not None:
        from collections import Counter
        dfc = Counter(s for v in sets.values() for s in v)
        sets = {d: {s for s in v if dfc[s] <= max_df}
                for d, v in sets.items()}
    rows = []
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold and inter > 0:
                rows.append((a, b, inter, inter / union))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "n_shared",
                                       "jaccard"])


def test_jaccard_pairs_exact_vs_brute(ray_session):
    import ray.data as rd
    from pdf_parser_ray.stages.dedup import jaccard_pairs_exact
    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        n = rng.randint(3, 30)
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(vocab, n))})
    # clones and near-clones to guarantee high-J pairs
    rows.append({"doc_id": 100, "text": rows[0]["text"]})
    rows.append({"doc_id": 101, "text": rows[0]["text"] + " extra"})
    df = pd.DataFrame(rows)
    want = _brute_jaccard(df, k=3, max_df=256, threshold=0.4)
    got = jaccard_pairs_exact(rd.from_pandas(df).repartition(5),
                              k=3, threshold=0.4, max_df=256)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.sort_values(["id_a", "id_b"]).reset_index(drop=True),
        check_dtype=False)


def test_jaccard_pairs_df_cap_semantics(ray_session):
    """The df cap changes the shingle SPACE, not just candidates: a
    shingle in > max_df docs contributes to neither intersection nor
    union, exactly as the brute-force oracle defines it."""
    import ray.data as rd
    from pdf_parser_ray.stages.dedup import jaccard_pairs_exact
    common = "alpha beta gamma"  # one shingle shared by every doc
    df = pd.DataFrame([
        {"doc_id": i, "text": f"{common} tail{i} tail{i} end{i}"}
        for i in range(5)])
    want = _brute_jaccard(df, k=3, max_df=3, threshold=0.0)
    got = jaccard_pairs_exact(rd.from_pandas(df).repartition(2),
                              k=3, threshold=0.0001, max_df=3)
    w = want[want["jaccard"] >= 0.0001]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        w.sort_values(["id_a", "id_b"]).reset_index(drop=True),
        check_dtype=False)


def test_jaccard_pairs_shuffle_path_pins_broadcast(ray_session,
                                                   monkeypatch):
    """Force the hash_join fallback (sizes 'over' budget) and pin its
    output byte-equal to the broadcast path."""
    import ray.data as rd
    from pdf_parser_ray.stages import dedup
    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(30)]
    df = pd.DataFrame([
        {"doc_id": i, "text": " ".join(rng.choice(vocab, 15))}
        for i in range(40)])
    df.loc[39, "text"] = df.loc[0, "text"]
    ds = rd.from_pandas(df).repartition(4)
    base = dedup.jaccard_pairs_exact(ds, k=3, threshold=0.3)
    monkeypatch.setattr(dedup, "_BROADCAST_VERIFY_BYTES", 0)
    forced = dedup.jaccard_pairs_exact(ds, k=3, threshold=0.3)
    pd.testing.assert_frame_equal(base, forced)
