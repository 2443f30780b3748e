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
   stays a Dataset and meets the turns again in ONE co-partitioned
   shuffle keyed by conv_id; each bucket holds only its conversations'
   boilerplate hashes, never a global set.

Line identity is the fixed-key 64-bit siphash of the line string
(pd.util.hash_pandas_object) — deterministic across processes; a
collision can at worst strip one extra line per conversation.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd


def _line_hash(s: pd.Series) -> np.ndarray:
    return pd.util.hash_pandas_object(s, index=False).to_numpy()


def strip_conv_boilerplate(ds, *, min_ratio: float = 0.5,
                           min_turns: int = 3,
                           text_col: str = "extracted_text",
                           n_buckets: Optional[int] = None):
    """Strip cross-turn repeated lines per conversation.

    ds: Dataset with (conv_id, turn_idx, ``text_col``) columns (extra
    columns pass through). Returns the same rows with ``text_col``
    rewritten (boilerplate lines removed, order preserved) plus an
    ``n_stripped_lines`` int64 column. Conversations with fewer than
    ``min_turns`` turns are left untouched (a 2-turn conversation has
    no meaningful repetition signal). A line counts once per turn it
    appears in; it is boilerplate when that turn count >=
    ``min_ratio`` * n_turns.
    """
    import ray

    from ..relational import (_BROADCAST_JOIN_BYTES, _cogroup,
                              _split_sides, grouped_agg_ds)

    if not (0.0 < min_ratio <= 1.0):
        raise ValueError("min_ratio must be in (0, 1]")

    # the input feeds three consumers (line counting, turn counting,
    # the final strip join); pin it in the (spillable) object store so
    # a lazy upstream — e.g. the whole extraction pipeline — does not
    # re-execute once per consumer
    ds = ds.materialize()

    def lines_of(b: pd.DataFrame) -> pd.DataFrame:
        lines = b[text_col].str.split("\n")
        n = lines.str.len().fillna(0).to_numpy(dtype=np.int64)
        d = pd.DataFrame({
            "conv_id": np.repeat(b["conv_id"].to_numpy(), n),
            "turn_idx": np.repeat(b["turn_idx"].to_numpy(dtype=np.int64),
                                  n),
            "line": lines.explode().dropna().to_numpy(),
        })
        d = d[d["line"].astype(str).str.len() > 0]
        d["line_h"] = _line_hash(d["line"].astype(str))
        # distinct per TURN: a line repeated inside one turn counts once
        return (d[["conv_id", "turn_idx", "line_h"]]
                .drop_duplicates()[["conv_id", "line_h"]])

    line_rows = ds.map_batches(lines_of, batch_format="pandas")
    counts = grouped_agg_ds(line_rows, ["conv_id", "line_h"],
                            {"cnt": ("count", None)})
    nturns = grouped_agg_ds(
        ds.map_batches(lambda b: b[["conv_id", "turn_idx"]],
                       batch_format="pandas"),
        ["conv_id"], {"n_turns": ("count", None)}).materialize()

    kw = {} if n_buckets is None else {"n_buckets": n_buckets}

    def _bp_filter(c: pd.DataFrame, nt: pd.DataFrame) -> pd.DataFrame:
        m = c.merge(nt, on="conv_id", how="inner")
        m = m[(m["n_turns"] >= min_turns)
              & (m["cnt"].to_numpy(dtype=np.float64)
                 >= min_ratio * m["n_turns"].to_numpy(dtype=np.float64))]
        return m[["conv_id", "line_h"]]

    # adaptive (broadcast-small-sides rule): the per-conv turn-count
    # table is one row per conversation — under the broadcast budget
    # it ships once and the line counts filter map-side with NO second
    # shuffle of the (much larger) line-count rows; past the budget it
    # falls back to a conv_id-co-partitioned join
    if (nturns.size_bytes() or 0) <= _BROADCAST_JOIN_BYTES:
        nt_ref = ray.put(nturns.to_pandas())

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

    def strip_bucket(t) -> pd.DataFrame:
        turns, bpl = _split_sides(t, out_cols, ["conv_id", "line_h"])
        if not len(turns):
            empty = turns.copy()
            empty["n_stripped_lines"] = pd.Series([], dtype="int64")
            return empty
        drop = {(c, h) for c, h in zip(bpl["conv_id"], bpl["line_h"])}
        # explode the whole bucket once, hash every line in one
        # vectorized call, rebuild per-turn texts by offset slicing
        lines = turns[text_col].astype(str).str.split("\n")
        nl = lines.str.len().to_numpy(dtype=np.int64)
        flat = lines.explode().astype(str).to_numpy()
        conv_rep = np.repeat(turns["conv_id"].to_numpy(), nl)
        hs = _line_hash(pd.Series(flat, dtype=object))
        is_bp = np.fromiter(
            ((c, h) in drop for c, h in zip(conv_rep, hs)),
            dtype=bool, count=len(hs))
        keep = ~is_bp | (np.char.str_len(flat.astype(str)) == 0)
        offs = np.zeros(len(turns) + 1, dtype=np.int64)
        np.cumsum(nl, out=offs[1:])
        new_texts, n_stripped = [], []
        for i in range(len(turns)):
            sl = slice(offs[i], offs[i + 1])
            kept = flat[sl][keep[sl]]
            new_texts.append("\n".join(kept))
            n_stripped.append(int(nl[i] - len(kept)))
        turns = turns.copy(deep=False)
        turns[text_col] = new_texts
        turns["n_stripped_lines"] = pd.array(n_stripped, dtype="int64")
        return turns

    return _cogroup(ds, bp, ["conv_id"], strip_bucket, **kw)
