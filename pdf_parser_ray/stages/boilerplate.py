"""Cross-turn conversation boilerplate stripping.

The per-turn kernel strips header/footer regions by page GEOMETRY
(reference A002/A003/A004 semantics); this stage adds the complementary
FREQUENCY heuristic a web-extraction pipeline runs next: a line that
repeats across most turns ("pages") of one conversation ("document") —
a banner, watermark, or template chrome — is boilerplate even when it
sits mid-page, so strip it from every turn while keeping lines unique
to a turn. (The reference's classify-and-strip path is per-page only;
this is the corpus-side extension SURVEY.md files under the
training-data operator suite, not a reference op.)

Scale shape — deliberately NOT a whole-conversation-per-task
map_groups (a mega-conversation would OOM the task):

1. one flat pass turns -> per-turn DISTINCT (conv_id, line_hash) rows,
2. cardinality-bounded grouped_agg on (conv_id, line_hash) -> how many
   turns of the conversation contain the line, plus a per-conv turn
   count,
3. the boilerplate line set per conversation (cnt >= ratio * n_turns)
   stays a Dataset; stripping is per-turn independent given that set,
   so the terminal stage is ADAPTIVE: when the whole boilerplate set
   fits the broadcast budget it ships once via ray.put and the strip
   is a pure map_batches (no shuffle at all); past the budget the
   strip co-partitions on (conv_id, turn_idx // salt_turns) with the
   per-conv hash set REPLICATED to each salt range — a 10^7-turn
   mega-conversation spreads over ~n_turns/salt_turns tasks instead
   of landing whole in one bucket's memory (same salting scheme as
   state/checkpoint.py's writer).

Line identity is the fixed-key 64-bit siphash of the line string
(pd.util.hash_pandas_object) — deterministic across processes; a
collision can at worst strip one extra line per conversation. The
strip membership test uses the combined (conv_id, line_h) row hash
(same primitive), vectorized np.isin instead of a per-line Python
set probe.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd


def _line_hash(s: pd.Series) -> np.ndarray:
    return pd.util.hash_pandas_object(s, index=False).to_numpy()


def _pair_key(conv, line_h) -> np.ndarray:
    """Combined deterministic row hash of (conv_id, line_h) — one
    uint64 per pair so strip membership is a vectorized np.isin, not a
    per-line Python set probe."""
    return pd.util.hash_pandas_object(
        pd.DataFrame({"c": np.asarray(conv),
                      "h": np.asarray(line_h, dtype=np.uint64)}),
        index=False).to_numpy()


def _strip_rows(turns: pd.DataFrame, drop_keys: np.ndarray,
                text_col: str) -> pd.DataFrame:
    """Strip boilerplate lines from one batch of turns given the
    sorted combined-hash key array. Pure per-turn; order preserved.
    Split, per-turn rebuild, and the final join all run as Arrow C++
    kernels (split_pattern / list offsets / binary_join) — the line
    HASHING stays the pandas siphash so strip keys match the count
    side bit-for-bit; the only remaining Python-per-line work is that
    one vectorized hash call."""
    import pyarrow as pa
    import pyarrow.compute as pc
    if not len(turns):
        empty = turns.copy()
        empty["n_stripped_lines"] = pd.Series([], dtype="int64")
        return empty
    ta = pa.array(turns[text_col].astype(str).to_numpy(),
                  type=pa.large_string())
    lines = pc.split_pattern(ta, pattern="\n")
    flat = pc.list_flatten(lines)
    par = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    nl = pc.list_value_length(lines).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat_np = flat.to_numpy(zero_copy_only=False)
    conv_rep = np.repeat(turns["conv_id"].to_numpy(), nl)
    hs = _line_hash(pd.Series(flat_np, dtype=object))
    if len(drop_keys):
        keys = _pair_key(conv_rep, hs)
        is_bp = np.isin(keys, drop_keys)
    else:
        is_bp = np.zeros(len(hs), dtype=bool)
    # empty lines always survive (elementwise compare on the object
    # array — an astype(str) here would copy every line into a
    # fixed-width unicode array sized by the LONGEST line per batch)
    keep = ~is_bp | (flat_np == "")
    kept_counts = np.bincount(par[keep], minlength=len(turns)
                              ).astype(np.int64)
    offs = np.zeros(len(turns) + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=offs[1:])
    kept_lists = pa.LargeListArray.from_arrays(
        pa.array(offs, type=pa.int64()), flat.filter(pa.array(keep)))
    new_texts = pc.binary_join(
        kept_lists, pa.scalar("\n", type=pa.large_string()))
    turns = turns.copy(deep=False)
    # positional assignment (to_numpy, not a to_pandas Series): the
    # batch index need not be the default RangeIndex
    turns[text_col] = new_texts.to_numpy(zero_copy_only=False)
    turns["n_stripped_lines"] = pd.array(nl - kept_counts,
                                         dtype="int64")
    return turns


def strip_conv_boilerplate(ds, *, min_ratio: float = 0.5,
                           min_turns: int = 3,
                           text_col: str = "extracted_text",
                           n_buckets: Optional[int] = None,
                           salt_turns: int = 8192,
                           force_salted: bool = False):
    """Strip cross-turn repeated lines per conversation.

    ds: Dataset with (conv_id, turn_idx, ``text_col``) columns (extra
    columns pass through). Returns the same rows with ``text_col``
    rewritten (boilerplate lines removed, order preserved) plus an
    ``n_stripped_lines`` int64 column. Conversations with fewer than
    ``min_turns`` turns are left untouched (a 2-turn conversation has
    no meaningful repetition signal). A line counts once per turn it
    appears in; it is boilerplate when that turn count >=
    ``min_ratio`` * n_turns.

    The terminal strip never holds a whole conversation in one task:
    small boilerplate sets broadcast (strip = shuffle-free
    map_batches); large ones co-partition on
    (conv_id, turn_idx // ``salt_turns``) with the per-conv hash set
    replicated per salt range, so task memory is bounded by
    ~``salt_turns`` turns regardless of conversation size.
    ``force_salted`` pins the salted path (tests / benchmarking).
    """
    import ray

    from ..relational import (_cogroup, _maybe_broadcast_right,
                              _split_sides, grouped_agg_ds)

    if not (0.0 < min_ratio <= 1.0):
        raise ValueError("min_ratio must be in (0, 1]")

    # the input feeds three consumers (line counting, turn counting,
    # the final strip join); pin it in the (spillable) object store so
    # a lazy upstream — e.g. the whole extraction pipeline — does not
    # re-execute once per consumer
    ds = ds.materialize()

    def lines_of(t) -> pd.DataFrame:
        # Arrow C++ split/flatten (3-6x the pandas split+explode on
        # the same blocks, measured sf0.1/32 cpus; rows pinned equal)
        import pyarrow as pa
        import pyarrow.compute as pc
        lines = pc.split_pattern(t.column(text_col), pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines)
        mask = pc.not_equal(flat, "")
        flat, parents = flat.filter(mask), parents.filter(mask)
        d = pd.DataFrame({
            "conv_id": pc.take(t.column("conv_id"), parents).to_pandas(),
            "turn_idx": pc.take(t.column("turn_idx"), parents)
            .to_numpy(zero_copy_only=False),
            "line": flat.to_pandas(),
        })
        d["line_h"] = _line_hash(d["line"])
        # distinct per TURN: a line repeated inside one turn counts once
        out = (d[["conv_id", "turn_idx", "line_h"]]
               .drop_duplicates()[["conv_id", "line_h"]])
        out = out.copy()
        out["m"] = False
        # one TURN-MARKER row per input turn rides the same shuffle
        # ('m' is part of the group key, so markers can never collide
        # with a line hash) — the per-conv turn count then falls out of
        # the SAME grouped aggregate instead of a second pass+shuffle
        markers = pd.DataFrame({
            "conv_id": t.column("conv_id").to_pandas(),
            "line_h": np.zeros(t.num_rows, dtype=np.uint64),
            "m": True})
        return pd.concat([out, markers], ignore_index=True)

    line_rows = ds.map_batches(lines_of, batch_format="pyarrow")
    counts_all = grouped_agg_ds(line_rows, ["conv_id", "line_h", "m"],
                                {"cnt": ("count", None)}).materialize()
    counts = counts_all.map_batches(
        lambda b: b.loc[~b["m"], ["conv_id", "line_h", "cnt"]],
        batch_format="pandas")
    nturns = counts_all.map_batches(
        lambda b: b.loc[b["m"], ["conv_id", "cnt"]].rename(
            columns={"cnt": "n_turns"}),
        batch_format="pandas").materialize()

    kw = {} if n_buckets is None else {"n_buckets": n_buckets}

    def _bp_filter(c: pd.DataFrame, nt: pd.DataFrame) -> pd.DataFrame:
        m = c.merge(nt, on="conv_id", how="inner")
        m = m[(m["n_turns"] >= min_turns)
              & (m["cnt"].to_numpy(dtype=np.float64)
                 >= min_ratio * m["n_turns"].to_numpy(dtype=np.float64))]
        return m[["conv_id", "line_h"]]

    # adaptive (the shared _maybe_broadcast_right rule): the per-conv
    # turn-count table is one row per conversation — under the
    # broadcast budget it ships once and the line counts filter
    # map-side with NO second shuffle of the (much larger) line-count
    # rows; past the budget it falls back to a conv_id-co-partitioned
    # join
    nt_ref, nturns = _maybe_broadcast_right(nturns)
    if nt_ref is not None:
        def flt(c: pd.DataFrame) -> pd.DataFrame:
            return _bp_filter(c, ray.get(nt_ref))

        bp = counts.map_batches(flt, batch_format="pandas")
    else:
        def bp_bucket(t) -> pd.DataFrame:
            c, nt = _split_sides(t, ["conv_id", "line_h", "cnt"],
                                 ["conv_id", "n_turns"])
            return _bp_filter(c, nt)

        bp = _cogroup(counts, nturns, ["conv_id"], bp_bucket, **kw)

    out_cols = list(ds.schema().names)

    # ---- terminal strip: adaptive broadcast / salted co-partition ----
    # stripping is per-turn independent given the (conv, line) drop
    # set, so the set never has to meet a whole conversation in one
    # task. Small set: ship the combined-hash key array once, strip
    # map-side with no shuffle. Large set: salt turns into
    # turn_idx // salt_turns ranges and replicate each conv's hashes
    # to its ranges — one bucket then holds at most ~salt_turns turns
    # of any single conversation.
    def _drop_keys_of(bpd: pd.DataFrame) -> np.ndarray:
        if len(bpd):
            return np.sort(_pair_key(bpd["conv_id"].to_numpy(),
                                     bpd["line_h"].to_numpy()))
        return np.array([], dtype=np.uint64)

    keys_ref = None
    if not force_salted:
        keys_ref, bp = _maybe_broadcast_right(bp,
                                              prepare=_drop_keys_of)
    else:
        bp = bp.materialize()
    if keys_ref is not None:
        def strip_map(b: pd.DataFrame) -> pd.DataFrame:
            return _strip_rows(b, ray.get(keys_ref), text_col)

        return ds.map_batches(strip_map, batch_format="pandas")

    if salt_turns <= 0:
        raise ValueError("salt_turns must be positive")

    def add_rng(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["__rng"] = (b["turn_idx"].to_numpy(dtype=np.int64)
                      // salt_turns)
        return b

    ds_r = ds.map_batches(add_rng, batch_format="pandas")
    # distinct (conv, salt range) pairs present — cardinality-bounded
    # (n_turns / salt_turns rows per conversation)
    ranges = grouped_agg_ds(
        ds_r.map_batches(lambda b: b[["conv_id", "__rng"]],
                         batch_format="pandas"),
        ["conv_id", "__rng"], {"__n": ("count", None)}).map_batches(
        lambda b: b[["conv_id", "__rng"]], batch_format="pandas")

    def rep_bucket(t) -> pd.DataFrame:
        rg, bpl = _split_sides(t, ["conv_id", "__rng"],
                               ["conv_id", "line_h"])
        return rg.merge(bpl, on="conv_id", how="inner")

    bp_rep = _cogroup(ranges, bp, ["conv_id"], rep_bucket, **kw)

    def strip_bucket(t) -> pd.DataFrame:
        turns, bpl = _split_sides(t, out_cols + ["__rng"],
                                  ["conv_id", "__rng", "line_h"])
        if len(bpl):
            drop_keys = np.sort(_pair_key(bpl["conv_id"].to_numpy(),
                                          bpl["line_h"].to_numpy()))
        else:
            drop_keys = np.array([], dtype=np.uint64)
        return _strip_rows(turns[out_cols], drop_keys, text_col)

    return _cogroup(ds_r, bp_rep, ["conv_id", "__rng"], strip_bucket,
                    **kw)
