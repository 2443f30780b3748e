"""SFT pair construction — salted so a mega-conversation never lands
whole in one task.

Pairing "each assistant turn with the most recent preceding user turn
of its conversation" is a forward-fill over turn order — inherently
sequential per conversation, but NOT inherently one-task-per-
conversation: exactly like relational.asof_join_salted's carry trick,
split each conversation into ``salt_turns``-sized turn ranges, pair
within ranges locally, and resolve assistant turns that precede their
range's first user turn with a per-(conv, range) CARRY row — the last
user turn of any strictly-earlier range. The carry table is
cardinality-bounded (one row per conv x range per input batch), so no
stage ever holds more than ~salt_turns turns of one conversation.

Stages (all bounded per task):
1. co-partition extracted turns x role rows on
   (conv_id, turn_idx // salt_turns) and equi-merge per turn,
2. per-batch partial: last user turn per (conv, range),
3. per-conv combine of the tiny partials -> carry per range
   (running max over earlier ranges),
4. co-partition merged turns x carries on (conv, range), seed the
   in-range forward fill with the carry, emit assistant pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sft_pairs_salted(ex, roles, *, salt_turns: int = 8192,
                     n_buckets=None):
    """ex: Dataset(conv_id, turn_idx, chars); roles: Dataset(conv_id,
    turn_idx2, role). Returns a Dataset of (conv_id, prompt_turn_idx,
    response_turn_idx, prompt_chars, response_chars, gap_turns) — one
    row per assistant turn with at least one preceding user turn in
    its conversation. gap_turns counts the turns (tool calls etc.)
    strictly between prompt and response.

    When the role column can be produced in the SAME rows as the
    chars (the extraction stage is 1:1 and order-preserving, so a
    caller holding the raw transcript batch can attach role with no
    join at all), skip this equi-join shuffle and call
    ``sft_pairs_from_turns`` directly."""
    from ..relational import _cogroup, _split_sides

    if salt_turns <= 0:
        raise ValueError("salt_turns must be positive")
    kw = {} if n_buckets is None else {"n_buckets": n_buckets}

    def add_rng(col):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy(deep=False)
            b["__rng"] = (b[col].to_numpy(dtype=np.int64) // salt_turns)
            return b
        return fn

    ex2 = ex.map_batches(add_rng("turn_idx"), batch_format="pandas")
    roles2 = roles.map_batches(add_rng("turn_idx2"),
                               batch_format="pandas")

    def merge_bucket(t) -> pd.DataFrame:
        e, r = _split_sides(t, ["conv_id", "__rng", "turn_idx", "chars"],
                            ["conv_id", "__rng", "turn_idx2", "role"])
        m = e.merge(r, left_on=["conv_id", "__rng", "turn_idx"],
                    right_on=["conv_id", "__rng", "turn_idx2"],
                    how="inner")
        return m[["conv_id", "turn_idx", "role", "chars"]]

    # one co-partitioned shuffle of the turn-scale data; bucket memory
    # is bounded by salt_turns turns per conversation
    merged = _cogroup(ex2, roles2, ["conv_id", "__rng"], merge_bucket,
                      **kw)
    return sft_pairs_from_turns(merged, salt_turns=salt_turns,
                                n_buckets=n_buckets)


def sft_pairs_from_turns(turns, *, salt_turns: int = 8192,
                         n_buckets=None):
    """Salted pairing over a Dataset(conv_id, turn_idx, role, chars)
    that already has role attached per turn — the join-free path."""
    from ..relational import (_cogroup, _split_sides,
                              bucketed_map_groups)

    if salt_turns <= 0:
        raise ValueError("salt_turns must be positive")
    kw = {} if n_buckets is None else {"n_buckets": n_buckets}

    def add_rng(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["conv_id", "turn_idx", "role", "chars"]].copy(deep=False)
        b["__rng"] = (b["turn_idx"].to_numpy(dtype=np.int64)
                      // salt_turns)
        return b

    merged = turns.map_batches(add_rng,
                               batch_format="pandas").materialize()

    def last_user_partial(b: pd.DataFrame) -> pd.DataFrame:
        """One row per (conv, range) per batch: the batch-local last
        user turn (or -1). Emitted for EVERY range present so carries
        reach ranges with no user turns of their own."""
        allg = b[["conv_id", "__rng"]].drop_duplicates()
        u = b[b["role"] == "user"]
        if len(u):
            lu = u.loc[u.groupby(["conv_id", "__rng"], sort=False)
                       ["turn_idx"].idxmax(),
                       ["conv_id", "__rng", "turn_idx", "chars"]]
            m = allg.merge(lu, on=["conv_id", "__rng"], how="left")
        else:
            m = allg.assign(turn_idx=np.nan, chars=np.nan)
        return pd.DataFrame({
            "conv_id": m["conv_id"].to_numpy(),
            "__rng": m["__rng"].to_numpy(dtype=np.int64),
            "u_idx": m["turn_idx"].fillna(-1).to_numpy(dtype=np.int64),
            "u_chars": m["chars"].fillna(0).to_numpy(dtype=np.int64)})

    partials = merged.map_batches(last_user_partial,
                                  batch_format="pandas")

    def carry_fn(g: pd.DataFrame) -> pd.DataFrame:
        """Per conv: running last-user over earlier ranges. Input is
        the tiny partial table (<= ranges x batches rows per conv)."""
        # final per-(conv, range) last user = max across batch partials
        g = g.loc[g.groupby(["conv_id", "__rng"], sort=False)
                  ["u_idx"].idxmax()]
        g = g.sort_values(["conv_id", "__rng"],
                          kind="mergesort").reset_index(drop=True)
        conv = g["conv_id"]
        run = g.groupby(conv, sort=False)["u_idx"].cummax()
        # chars aligned to the running argmax: the setter row's chars,
        # forward-filled (turn indices are unique per conv, so the
        # setter is unambiguous)
        setter = g["u_idx"].eq(run) & g["u_idx"].ge(0)
        ch = pd.Series(np.where(setter, g["u_chars"], np.nan),
                       index=g.index)
        ch = ch.groupby(conv, sort=False).ffill()
        carry_idx = run.groupby(conv, sort=False).shift(1)
        carry_ch = ch.groupby(conv, sort=False).shift(1)
        keep = carry_idx.notna() & (carry_idx >= 0)
        return pd.DataFrame({
            "conv_id": g["conv_id"].to_numpy()[keep],
            "__rng": g["__rng"].to_numpy()[keep],
            "carry_uidx": carry_idx.to_numpy()[keep].astype(np.int64),
            "carry_uchars": carry_ch.to_numpy()[keep].astype(np.int64)})

    carries = bucketed_map_groups(partials, ["conv_id"], carry_fn)

    def pair_bucket(t) -> pd.DataFrame:
        m, c = _split_sides(
            t, ["conv_id", "__rng", "turn_idx", "role", "chars"],
            ["conv_id", "__rng", "carry_uidx", "carry_uchars"])
        m = m.sort_values(["conv_id", "__rng", "turn_idx"],
                          kind="mergesort")
        m = m.merge(c, on=["conv_id", "__rng"], how="left")
        is_user = (m["role"] == "user").to_numpy()
        grp = [m["conv_id"].to_numpy(), m["__rng"].to_numpy()]
        uidx = np.where(is_user, m["turn_idx"].to_numpy(), -1)
        s = pd.Series(np.where(uidx >= 0, uidx, np.nan)) \
            .groupby(grp).ffill()
        uchars = pd.Series(
            np.where(is_user, m["chars"].to_numpy(), np.nan)) \
            .groupby(grp).ffill()
        # seed turns before the range's first user turn from the carry
        s = s.fillna(pd.Series(m["carry_uidx"].to_numpy(dtype=float)))
        uchars = uchars.fillna(
            pd.Series(m["carry_uchars"].to_numpy(dtype=float)))
        keep = (m["role"] == "assistant").to_numpy() \
            & s.notna().to_numpy()
        out = pd.DataFrame({
            "conv_id": m["conv_id"].to_numpy()[keep],
            "prompt_turn_idx": s.to_numpy()[keep].astype(np.int64),
            "response_turn_idx": m["turn_idx"].to_numpy()[keep],
            "prompt_chars": uchars.to_numpy()[keep].astype(np.int64),
            "response_chars": m["chars"].to_numpy()[keep],
        })
        out["gap_turns"] = (out["response_turn_idx"]
                            - out["prompt_turn_idx"] - 1)
        return out

    return _cogroup(merged, carries, ["conv_id", "__rng"], pair_bucket,
                    **kw)
