"""Cross-document duplicate-SPAN removal (exact substring dedup).

The operator the big LLM corpora run besides whole-doc dedup
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better"): find text spans that occur verbatim in more than one
document and strip every occurrence except one elected winner, while
keeping the surrounding unique text. The reference engine has no such
operator; this is the training-pipeline extension suite.

Distributed shape (token-window granularity, not a suffix array —
windows shard perfectly by hash, a suffix array does not):

1. map_batches: tokenize each doc (``\\S+`` with char offsets), hash
   every n-token window to one uint64 (vectorized polynomial over
   31-bit token hashes; uint64 wraparound is the hash), emit
   (win_hash, doc_id, start_char, end_char) rows. Row count ==
   token count — the same expansion every shuffle-based substring
   dedup pays, and these rows are 4 ints, not text.
2. bucketed shuffle on win_hash: a window hash seen in >= 2 DISTINCT
   docs is a duplicate; every occurrence except the lexicographically
   first (doc_id, start_char) — the elected winner — is marked for
   removal. Fully vectorized segment logic, no per-group loop.
3. bucketed shuffle on doc_id: merge each doc's marked windows into
   maximal char intervals (numpy cummax interval merge) and cut them
   out of the text. Docs with no marked window pass through untouched.

Self-duplication inside ONE doc is deliberately not marked (that is
repetition_ratio's job); only cross-doc duplication is stripped.
"""

from __future__ import annotations

import re
from typing import List

import numpy as np
import pandas as pd

from .dedup import _stable_u64

_TOKEN_RE = re.compile(r"\S+")
_POLY = np.uint64(1099511628211)          # FNV prime as the mix base


def _doc_windows(text: str, n: int, powers: np.ndarray):
    """All n-token window hashes of one doc with char extents, or None
    if the doc has fewer than n tokens. Shared by span dedup and
    decontamination so both agree on window identity."""
    toks = [(m.start(), m.end(), m.group())
            for m in _TOKEN_RE.finditer(text or "")]
    if len(toks) < n:
        return None
    th = np.fromiter(
        (_stable_u64(t[2]) & ((1 << 31) - 1) for t in toks),
        np.uint64, count=len(toks))
    win = np.lib.stride_tricks.sliding_window_view(th, n)
    wh = (win * powers).sum(axis=1, dtype=np.uint64)
    s = np.fromiter((t[0] for t in toks), np.int64, count=len(toks))
    e = np.fromiter((t[1] for t in toks), np.int64, count=len(toks))
    return wh, s[:len(wh)], e[n - 1:]


def _powers(n: int) -> np.ndarray:
    return _POLY ** np.arange(n, dtype=np.uint64)


def _window_rows(batch: pd.DataFrame, *, n: int, text_col: str,
                 id_col: str) -> pd.DataFrame:
    """One row per n-token window: (win_hash, doc_id, start, end)."""
    hashes: List[np.ndarray] = []
    ids: List[np.ndarray] = []
    starts: List[np.ndarray] = []
    ends: List[np.ndarray] = []
    powers = _powers(n)
    for doc_id, text in zip(batch[id_col].to_numpy(),
                            batch[text_col].to_numpy()):
        w = _doc_windows(text, n, powers)
        if w is None:
            continue
        wh, s, e = w
        hashes.append(wh.view(np.int64))
        ids.append(np.full(len(wh), doc_id, dtype=np.int64))
        starts.append(s)
        ends.append(e)
    if not hashes:
        return pd.DataFrame({
            "win_hash": pd.Series([], dtype="int64"),
            "doc_id": pd.Series([], dtype="int64"),
            "start": pd.Series([], dtype="int64"),
            "end": pd.Series([], dtype="int64")})
    return pd.DataFrame({"win_hash": np.concatenate(hashes),
                         "doc_id": np.concatenate(ids),
                         "start": np.concatenate(starts),
                         "end": np.concatenate(ends)})


def _marked_windows(df: pd.DataFrame) -> pd.DataFrame:
    """Within one win_hash bucket: occurrences of any hash shared by
    >= 2 distinct docs, minus the elected winner (first (doc_id,
    start) of each hash). Vectorized over the whole bucket."""
    if not len(df):
        return df[["doc_id", "start", "end"]]
    df = df.sort_values(["win_hash", "doc_id", "start"],
                        kind="mergesort")
    h = df["win_hash"].to_numpy()
    d = df["doc_id"].to_numpy()
    new_h = np.ones(len(h), dtype=bool)
    new_h[1:] = h[1:] != h[:-1]
    new_hd = new_h.copy()
    new_hd[1:] |= d[1:] != d[:-1]
    seg = np.cumsum(new_h) - 1                 # hash-segment id
    ndocs = np.bincount(seg[new_hd])           # distinct docs per hash
    marked = (ndocs[seg] >= 2) & ~new_h        # all but the winner row
    return df.loc[marked, ["doc_id", "start", "end"]]


def _cut_spans(g: pd.DataFrame, *, text_col: str, id_col: str,
               out_col: str) -> pd.DataFrame:
    """Within one doc_id bucket: merge marked windows per doc into
    maximal intervals and cut them from the text. Rows with a null
    start are the text side of the cogroup union."""
    texts = g[g["start"].isna()]
    marks = g[g["start"].notna()]
    by_doc = {}
    for doc_id, mg in marks.groupby(id_col, sort=False):
        s = mg["start"].to_numpy(dtype=np.int64)
        e = mg["end"].to_numpy(dtype=np.int64)
        order = np.argsort(s, kind="stable")
        s, e = s[order], np.maximum.accumulate(e[order])
        new_iv = np.ones(len(s), dtype=bool)
        new_iv[1:] = s[1:] > e[:-1]            # gap => new interval
        iv = np.cumsum(new_iv) - 1
        ms = s[new_iv]
        me = np.maximum.reduceat(e, np.flatnonzero(new_iv))
        by_doc[doc_id] = (ms, me, int(iv[-1] + 1))
    out_rows = []
    for row in texts.itertuples(index=False):
        doc_id = getattr(row, id_col)
        text = getattr(row, text_col)
        if doc_id not in by_doc:
            out_rows.append((doc_id, text, 0, 0))
            continue
        ms, me, n_spans = by_doc[doc_id]
        pieces, pos = [], 0
        for a, b in zip(ms, me):
            pieces.append(text[pos:a])
            pos = b
        pieces.append(text[pos:])
        cleaned = "".join(pieces)
        out_rows.append((doc_id, cleaned, n_spans,
                         len(text) - len(cleaned)))
    return pd.DataFrame(out_rows, columns=[id_col, out_col, "n_spans",
                                           "chars_removed"])


def strip_duplicate_spans(ds, *, n: int = 8, text_col: str = "text",
                          id_col: str = "doc_id",
                          out_col: str = "clean_text",
                          batch_size: int = 1024):
    """Remove every cross-document duplicate n-token span except one
    elected winner occurrence. Returns a DATASET of (id_col, out_col,
    n_spans, chars_removed) — one row per input doc; nothing
    proportional to the corpus ever sits on the driver.

    The winner election is global and deterministic (min (doc_id,
    start) per window hash), so output is independent of input
    partitioning.
    """
    from ..relational import bucketed_map_groups

    wins = ds.map_batches(
        lambda b: _window_rows(b, n=n, text_col=text_col, id_col=id_col),
        batch_format="pandas", batch_size=batch_size)
    marked = bucketed_map_groups(wins, ["win_hash"], _marked_windows)

    # cogroup texts with their marked windows by doc_id: tag the text
    # side with null start/end (a real window always has both)
    def tag_text(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(dtype=np.int64),
            text_col: b[text_col],
            "start": np.full(len(b), np.nan),
            "end": np.full(len(b), np.nan)})

    def tag_marks(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(dtype=np.int64),
            text_col: pd.Series([None] * len(b), dtype=object),
            "start": b["start"].to_numpy(dtype=np.float64),
            "end": b["end"].to_numpy(dtype=np.float64)})

    both = (ds.map_batches(tag_text, batch_format="pandas",
                           batch_size=batch_size)
            .union(marked.map_batches(tag_marks, batch_format="pandas")))
    return bucketed_map_groups(
        both, [id_col],
        lambda g: _cut_spans(g, text_col=text_col, id_col=id_col,
                             out_col=out_col))


def contamination_counts(train_ds, bench_ds, *, n: int = 8,
                         text_col: str = "text", id_col: str = "doc_id",
                         batch_size: int = 1024):
    """Benchmark decontamination (the GPT-3/Llama-style pre-training
    hygiene pass): for every training doc, count how many of its
    n-token window OCCURRENCES appear verbatim anywhere in the
    benchmark/eval corpus. Returns a Dataset of (id_col, n_overlap) —
    one row per training doc (0 for clean or shorter-than-n docs);
    the caller thresholds to drop contaminated docs.

    Scale shape: eval benchmarks are MBs against a 100-TB crawl, so
    the benchmark windows are the canonical broadcast small side — the
    DISTINCT window-hash set is collected once (byte-guarded), sorted,
    `ray.put` as one uint64 array, and every train task membership-
    tests its windows via np.searchsorted. ONE distributed aggregation
    on the small side, zero shuffles on the big side.
    """
    import ray

    from ..relational import distinct_ds, guard_broadcast_bytes

    bench_wins = bench_ds.map_batches(
        lambda b: _window_rows(b, n=n, text_col=text_col, id_col=id_col)
        [["win_hash"]],
        batch_format="pandas", batch_size=batch_size)
    bdf = distinct_ds(bench_wins, ["win_hash"]).to_pandas()
    # an empty Dataset loses its columns through to_pandas()
    bench_hashes = (bdf["win_hash"].to_numpy(dtype=np.int64)
                    .view(np.uint64) if "win_hash" in bdf.columns
                    else np.array([], dtype=np.uint64))
    bench_hashes = np.sort(bench_hashes)
    guard_broadcast_bytes(
        bench_hashes.nbytes, "benchmark window-hash set",
        "shard the benchmark set and run contamination_counts per "
        "shard, summing n_overlap — or raise n to shrink the set")
    ref = ray.put(bench_hashes)

    def count_overlap(batch: pd.DataFrame) -> pd.DataFrame:
        bh = ray.get(ref)          # zero-copy shared-memory numpy
        powers = _powers(n)
        ids = batch[id_col].to_numpy(dtype=np.int64)
        counts = np.zeros(len(batch), dtype=np.int64)
        for i, text in enumerate(batch[text_col].to_numpy()):
            w = _doc_windows(text, n, powers)
            if w is None:
                continue
            wh = w[0]
            pos = np.searchsorted(bh, wh)
            pos[pos == len(bh)] = 0
            counts[i] = int((bh[pos] == wh).sum()) if len(bh) else 0
        return pd.DataFrame({id_col: ids, "n_overlap": counts})

    return train_ds.map_batches(count_overlap, batch_format="pandas",
                                batch_size=batch_size)


# --------------------------------------------- exact LINE-level dedup

def _line_explode(t, *, id_col: str, text_col: str) -> pd.DataFrame:
    """One row per line of every doc: (doc_id, idx, line) with idx the
    1-based within-doc ordinal (1-based to mirror DuckDB's
    generate_subscripts). Takes the Arrow batch directly (the lines_of
    precedent in stages/boilerplate.py — measured 3-6x the pandas
    split on the same blocks); the split runs in Arrow C++ on the
    zero-copy column, the ordinal is pure numpy arithmetic over the
    list lengths — no per-doc Python, no full-text pandas round-trip."""
    import pyarrow as pa
    import pyarrow.compute as pc
    if not t.num_rows:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "idx": pd.Series([], dtype="int64"),
                             "line": pd.Series([], dtype=object)})
    parts = pc.split_pattern(t.column(text_col), "\n")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts).to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(parts).to_numpy(
        zero_copy_only=False).astype(np.int64)
    doc = np.repeat(
        t.column(id_col).to_numpy(zero_copy_only=False)
        .astype(np.int64), lens)
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    idx = (np.arange(offs[-1], dtype=np.int64)
           - np.repeat(offs[:-1], lens) + 1)
    return pd.DataFrame({"doc_id": doc, "idx": idx, "line": flat})


def _line_min_partial(b: pd.DataFrame) -> pd.DataFrame:
    """Per-batch combiner for winner election: ONE row per distinct
    line of the batch carrying its lexicographically-first
    (doc_id, idx) and its occurrence count. This is what makes the
    winner shuffle skew-free at 100 TB: a boilerplate footer occurring
    a billion times contributes <= one row per batch to the shuffle,
    never its occurrences. Empty lines are formatting, always kept —
    they are excluded here and never shuffled at all (blank lines are
    the most duplicated string in any real corpus)."""
    ne = b[b["line"].to_numpy() != ""]
    if not len(ne):
        return pd.DataFrame({"line": pd.Series([], dtype=object),
                             "wd": pd.Series([], dtype="int64"),
                             "wi": pd.Series([], dtype="int64"),
                             "cnt": pd.Series([], dtype="int64")})
    line = ne["line"].to_numpy()
    doc = ne["doc_id"].to_numpy(dtype=np.int64)
    idx = ne["idx"].to_numpy(dtype=np.int64)
    codes, uniq = pd.factorize(line)
    order = np.lexsort((idx, doc, codes))
    oc = codes[order]
    starts = np.flatnonzero(np.r_[True, oc[1:] != oc[:-1]])
    first = order[starts]
    return pd.DataFrame({"line": uniq[oc[starts]],
                         "wd": doc[first], "wi": idx[first],
                         "cnt": np.bincount(codes)[oc[starts]]
                         .astype(np.int64)})


def _combine_line_min(g: pd.DataFrame) -> pd.DataFrame:
    """Bucket-level combine of _line_min_partial rows: min of mins,
    sum of counts — and only DUPLICATED lines (total cnt >= 2) leave
    the combine; unique lines keep trivially and never travel
    further."""
    if not len(g):
        return pd.DataFrame({"line": pd.Series([], dtype=object),
                             "wd": pd.Series([], dtype="int64"),
                             "wi": pd.Series([], dtype="int64")})
    line = g["line"].to_numpy()
    wd = g["wd"].to_numpy(dtype=np.int64)
    wi = g["wi"].to_numpy(dtype=np.int64)
    codes, uniq = pd.factorize(line)
    order = np.lexsort((wi, wd, codes))
    oc = codes[order]
    starts = np.flatnonzero(np.r_[True, oc[1:] != oc[:-1]])
    first = order[starts]
    tot = np.zeros(oc[starts].max() + 1 if len(starts) else 0,
                   np.int64)
    np.add.at(tot, codes, g["cnt"].to_numpy(dtype=np.int64))
    tot = tot[oc[starts]]
    dup = tot >= 2
    return pd.DataFrame({"line": uniq[oc[starts]][dup],
                         "wd": wd[first][dup], "wi": wi[first][dup]})


def _flag_against_winners(b: pd.DataFrame,
                          win: pd.DataFrame) -> pd.DataFrame:
    """keep = empty line, OR line not in the duplicated-winner table,
    OR this occurrence IS the winner. The merge is a vectorized
    string-keyed hash join against the (small) dup-winner frame."""
    # winner ids join as NULLABLE Int64, never float64: a left-merge
    # float upcast would silently round doc ids above 2^53. The
    # broadcast path pre-types the frame ONCE on the driver (it is
    # static across thousands of batches); the salted path's win side
    # arrives per-bucket and converts here.
    if str(win["wd"].dtype) != "Int64":
        win = win.astype({"wd": "Int64", "wi": "Int64"})
    m = b.merge(win, on="line", how="left")
    eq = ((m["wd"] == m["doc_id"]) & (m["wi"] == m["idx"]))
    keep = (m["wd"].isna().to_numpy()
            | eq.fillna(False).to_numpy(dtype=bool)
            | (m["line"].to_numpy() == ""))
    return pd.DataFrame({"doc_id": m["doc_id"].to_numpy(np.int64),
                         "idx": m["idx"].to_numpy(np.int64),
                         "line": m["line"].to_numpy(),
                         "keep": keep})


def _rebuild_docs(g: pd.DataFrame) -> pd.DataFrame:
    """Within one doc-keyed bucket: reassemble each doc from its kept
    lines in idx order. The per-doc string join is output-proportional
    work; everything else is numpy segment logic."""
    if not len(g):
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_lines": pd.Series([], dtype="int64"),
                             "n_kept": pd.Series([], dtype="int64"),
                             "text": pd.Series([], dtype=object)})
    order = np.lexsort((g["idx"].to_numpy(dtype=np.int64),
                        g["doc_id"].to_numpy(dtype=np.int64)))
    doc = g["doc_id"].to_numpy(dtype=np.int64)[order]
    keep = g["keep"].to_numpy(dtype=bool)[order]
    line = g["line"].to_numpy()[order]
    starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
    ends = np.r_[starts[1:], len(doc)]
    return pd.DataFrame({
        "doc_id": doc[starts],
        "n_lines": (ends - starts).astype(np.int64),
        "n_kept": np.add.reduceat(keep.astype(np.int64), starts),
        "text": ["\n".join(line[s:e][keep[s:e]])
                 for s, e in zip(starts, ends)]})


def line_dedup_ds(ds, *, id_col: str = "doc_id",
                  text_col: str = "text", salt: int = 64):
    """Global exact LINE-level dedup with document rebuild — the
    line-granularity complement of strip_duplicate_spans (the step
    FineWeb/RefinedWeb-style curation runs against repeated
    navigation/footer lines): every non-empty line that occurs in
    more than one place survives only at its globally first
    (doc_id, idx); empty lines always survive. Returns a Dataset of
    (doc_id, n_lines, n_kept, text) with text rebuilt from the kept
    lines.

    Distributed shape, skew-safe at web scale: Arrow explode -> a
    PER-BATCH combiner (one row per distinct line per batch — a
    footer duplicated a billion times never ships its occurrences)
    -> a line-keyed winner combine emitting only DUPLICATED lines ->
    keep-flags attached adaptively (the boilerplate-strip pattern):
    under the broadcast budget the dup-winner frame ships once via
    ray.put and flags map-side with ZERO occurrence shuffle; past it,
    occurrences salt into (doc_id, idx)-derived ranges and winners
    replicate per range, so one co-partition bucket holds at most
    ~1/salt of any single hot line's occurrences -> one doc-keyed
    rebuild pass (bounded by document size). The input is pinned once
    (two consumers — the strip_conv_boilerplate precedent)."""
    import functools

    import ray

    from ..relational import (_cogroup, _maybe_broadcast_right,
                              _split_sides, bucketed_map_groups)
    ds = ds.materialize()
    rows = ds.map_batches(
        functools.partial(_line_explode, id_col=id_col,
                          text_col=text_col),
        batch_format="pyarrow")
    winners = bucketed_map_groups(
        rows.map_batches(_line_min_partial, batch_format="pandas"),
        ["line"], _combine_line_min)

    # adaptive flag attach (the shared _maybe_broadcast_right rule);
    # the Int64 coercion runs ONCE on the driver, not per probe batch
    win_ref, winners = _maybe_broadcast_right(
        winners,
        prepare=lambda d: d.astype({"wd": "Int64", "wi": "Int64"}))
    if win_ref is not None:
        def flag(b: pd.DataFrame) -> pd.DataFrame:
            return _flag_against_winners(b, ray.get(win_ref))

        flagged = rows.map_batches(flag, batch_format="pandas")
    else:
        def add_salt(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy(deep=False)
            b["__s"] = ((b["doc_id"].to_numpy(dtype=np.int64)
                         * 1000003
                         + b["idx"].to_numpy(dtype=np.int64))
                        % salt)
            return b

        def rep_winners(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            out = b.loc[b.index.repeat(salt)].reset_index(drop=True)
            out["__s"] = np.tile(np.arange(salt, dtype=np.int64), n)
            return out

        def flag_bucket(t) -> pd.DataFrame:
            occ, win = _split_sides(
                t, ["doc_id", "idx", "line", "__s"],
                ["line", "__s", "wd", "wi"])
            # several (line, salt) replicas of ONE line can hash into
            # the same bucket; they carry identical winners — dedupe
            # or the flag merge would fan occurrences out
            win = win.drop(columns="__s").drop_duplicates("line")
            return _flag_against_winners(occ.drop(columns="__s"), win)

        flagged = _cogroup(
            rows.map_batches(add_salt, batch_format="pandas"),
            winners.map_batches(rep_winners, batch_format="pandas"),
            ["line", "__s"], flag_bucket)

    return bucketed_map_groups(flagged, ["doc_id"], _rebuild_docs)
