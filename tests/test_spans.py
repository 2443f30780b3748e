"""Cross-document duplicate-span removal: exact semantics pinned by a
brute-force scalar oracle, plus partitioning invariance."""

import re

import numpy as np
import pandas as pd
import ray

from pdf_parser_ray.stages.spans import strip_duplicate_spans

_TOKEN_RE = re.compile(r"\S+")


def _scalar_oracle(docs, n):
    """Pure-Python reference: window key = the literal n-token tuple.
    Windows shared by >= 2 distinct docs are cut everywhere except the
    global min (doc_id, start) occurrence; per-doc marked windows merge
    into maximal intervals before cutting."""
    occ = {}
    toks_by_doc = {}
    for doc_id, text in docs:
        toks = [(m.start(), m.end(), m.group())
                for m in _TOKEN_RE.finditer(text or "")]
        toks_by_doc[doc_id] = toks
        for i in range(len(toks) - n + 1):
            key = tuple(t[2] for t in toks[i:i + n])
            occ.setdefault(key, []).append(
                (doc_id, toks[i][0], toks[i + n - 1][1]))
    marked = {}
    for key, occs in occ.items():
        if len({d for d, _, _ in occs}) < 2:
            continue
        occs = sorted(occs)
        for d, s, e in occs[1:]:
            marked.setdefault(d, []).append((s, e))
    out = []
    for doc_id, text in docs:
        ivs = sorted(marked.get(doc_id, []))
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        pieces, pos = [], 0
        for s, e in merged:
            pieces.append(text[pos:s])
            pos = e
        pieces.append(text[pos:])
        cleaned = "".join(pieces)
        out.append((doc_id, cleaned, len(merged),
                    len(text) - len(cleaned)))
    return pd.DataFrame(out, columns=["doc_id", "clean_text", "n_spans",
                                      "chars_removed"])


def _run(docs, n, **kw):
    ds = ray.data.from_pandas(
        pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = strip_duplicate_spans(ds, n=n, **kw).to_pandas()
    return (got.sort_values("doc_id").reset_index(drop=True)
            .astype({"doc_id": "int64", "n_spans": "int64",
                     "chars_removed": "int64"}))


def _check(docs, n, **kw):
    got = _run(docs, n, **kw)
    want = (_scalar_oracle(docs, n).sort_values("doc_id")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["doc_id", "clean_text", "n_spans", "chars_removed"]], want)
    return got


def test_shared_span_cut_once(ray_session):
    boiler = " ".join(f"b{i}" for i in range(8))
    docs = [(1, f"alpha beta {boiler} gamma"),
            (2, f"delta {boiler} epsilon zeta"),
            (3, "totally unique text with no overlap at all here now")]
    got = _check(docs, 8)
    # doc 1 is the winner (min doc_id, min start): untouched
    assert got.loc[got.doc_id == 1, "n_spans"].item() == 0
    assert got.loc[got.doc_id == 2, "n_spans"].item() == 1
    assert boiler not in got.loc[got.doc_id == 2, "clean_text"].item()
    assert "delta" in got.loc[got.doc_id == 2, "clean_text"].item()
    assert "epsilon zeta" in got.loc[got.doc_id == 2, "clean_text"].item()
    assert got.loc[got.doc_id == 3, "chars_removed"].item() == 0


def test_winner_self_repeat_keeps_first_only(ray_session):
    span = " ".join(f"s{i}" for i in range(4))
    # doc 1 holds the span twice; doc 2 once -> doc1's first stays,
    # doc1's second and doc2's are cut
    docs = [(1, f"{span} middle words here {span}"),
            (2, f"x {span} y")]
    got = _check(docs, 4)
    assert got.loc[got.doc_id == 1, "clean_text"].item().count("s0") == 1
    assert "s0" not in got.loc[got.doc_id == 2, "clean_text"].item()


def test_overlapping_windows_merge_to_one_interval(ray_session):
    # a 12-token shared run yields 5 overlapping 8-windows -> 1 interval
    run = " ".join(f"r{i}" for i in range(12))
    docs = [(10, f"head {run} tail"), (20, f"{run} closing words")]
    got = _check(docs, 8)
    assert got.loc[got.doc_id == 20, "n_spans"].item() == 1


def test_short_docs_and_empty(ray_session):
    docs = [(1, "too short"), (2, ""), (3, "also brief text")]
    got = _check(docs, 8)
    assert (got["chars_removed"] == 0).all()


def test_random_corpus_matches_scalar_oracle(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for d in range(60):
        k = int(rng.integers(5, 60))
        docs.append((d, " ".join(rng.choice(vocab, size=k))))
    # inject literal cross-doc boilerplate into a third of them
    boiler = " ".join(f"tpl{i}" for i in range(10))
    docs = [(d, (t + " " + boiler) if d % 3 == 0 else t)
            for d, t in docs]
    _check(docs, 5)


def test_partitioning_invariance(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"v{i}" for i in range(20)]
    docs = [(d, " ".join(rng.choice(vocab, size=int(rng.integers(8, 40)))))
            for d in range(40)]
    a = _run(docs, 5, batch_size=4)
    b = _run(list(reversed(docs)), 5, batch_size=17)
    pd.testing.assert_frame_equal(a, b)


def test_contamination_counts_scalar_oracle(ray_session):
    from pdf_parser_ray.stages.spans import contamination_counts
    boiler = " ".join(f"e{i}" for i in range(6))
    bench = [(100, f"intro {boiler} outro words"),
             (101, "another eval doc with its own unique phrasing")]
    train = [(1, f"pre {boiler} post"),                 # 1 hit
             (2, f"{boiler} again later {boiler}"),     # 2 occurrences
             (3, "completely clean training document"),
             (4, "tiny")]                               # < n tokens
    bds = ray.data.from_pandas(
        pd.DataFrame(bench, columns=["doc_id", "text"]))
    tds = ray.data.from_pandas(
        pd.DataFrame(train, columns=["doc_id", "text"]))
    got = (contamination_counts(tds, bds, n=6).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [1, 2, 3, 4]
    assert got["n_overlap"].tolist() == [1, 2, 0, 0]


def test_contamination_counts_empty_bench(ray_session):
    from pdf_parser_ray.stages.spans import contamination_counts
    bds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "text": pd.Series([], dtype=object)}))
    tds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1], "text": ["some training text here"]}))
    got = contamination_counts(tds, bds, n=3).to_pandas()
    assert got["n_overlap"].tolist() == [0]
