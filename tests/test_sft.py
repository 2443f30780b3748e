"""Salted SFT pairing: semantics vs a brute-force oracle, mega-conv
bounded-task stress."""

import numpy as np
import pandas as pd

COLS = ["conv_id", "prompt_turn_idx", "response_turn_idx",
        "prompt_chars", "response_chars", "gap_turns"]


def _oracle(ex: pd.DataFrame, roles: pd.DataFrame) -> pd.DataFrame:
    """Sequential per-conv scan — the definitionally-correct pairing."""
    m = ex.merge(roles.rename(columns={"turn_idx2": "turn_idx"}),
                 on=["conv_id", "turn_idx"], how="inner")
    m = m.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    last, rows = {}, []
    for r in m.itertuples():
        if r.role == "user":
            last[r.conv_id] = (r.turn_idx, r.chars)
        elif r.role == "assistant" and r.conv_id in last:
            pi, pc = last[r.conv_id]
            rows.append((r.conv_id, pi, r.turn_idx, pc, r.chars,
                         r.turn_idx - pi - 1))
    out = pd.DataFrame(rows, columns=COLS)
    return (out.astype({c: "int64" for c in COLS[1:]})
            .sort_values(["conv_id", "response_turn_idx"])
            .reset_index(drop=True))


def _run(ex: pd.DataFrame, roles: pd.DataFrame, **kw) -> pd.DataFrame:
    import ray.data as rd
    from pdf_parser_ray.stages.sft import sft_pairs_salted
    out = sft_pairs_salted(rd.from_pandas(ex).repartition(5),
                           rd.from_pandas(roles).repartition(3),
                           **kw).to_pandas()
    return (out[COLS].astype({c: "int64" for c in COLS[1:]})
            .sort_values(["conv_id", "response_turn_idx"])
            .reset_index(drop=True))


def _corpus(seed: int, n_convs: int, max_turns: int):
    rng = np.random.RandomState(seed)
    ex_rows, role_rows = [], []
    for c in range(n_convs):
        n = rng.randint(1, max_turns)
        for t in range(n):
            role = rng.choice(["user", "assistant", "tool", "system"],
                              p=[0.35, 0.35, 0.2, 0.1])
            ex_rows.append((f"conv{c}", t, int(rng.randint(1, 500))))
            role_rows.append((f"conv{c}", t, role))
    ex = pd.DataFrame(ex_rows, columns=["conv_id", "turn_idx", "chars"])
    roles = pd.DataFrame(role_rows,
                         columns=["conv_id", "turn_idx2", "role"])
    return ex, roles


def test_sft_pairs_salted_matches_oracle(ray_session):
    ex, roles = _corpus(3, 25, 40)
    got = _run(ex, roles, salt_turns=7)     # salt << conv length
    want = _oracle(ex, roles)
    pd.testing.assert_frame_equal(got, want)
    assert len(want) > 10  # non-vacuous


def test_sft_pairs_salt_invariance(ray_session):
    """Any salt window gives identical pairs (carry resolution is
    exact, not approximate)."""
    ex, roles = _corpus(9, 12, 30)
    outs = [_run(ex, roles, salt_turns=s) for s in (1, 4, 10**6)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_sft_pairs_mega_conv_bounded(ray_session):
    """20k-turn single conversation: the salted key caps every
    pairing task at salt_turns turns, and the output still equals the
    sequential oracle — including assistant turns whose prompt lives
    many salt ranges earlier (a long tool-only stretch)."""
    n, salt = 20_000, 512
    roles = ["user" if t % 1000 == 0 else
             ("assistant" if t % 7 == 0 else "tool")
             for t in range(n)]
    ex = pd.DataFrame({"conv_id": ["mega"] * n,
                       "turn_idx": np.arange(n, dtype=np.int64),
                       "chars": (np.arange(n, dtype=np.int64) % 97) + 1})
    rdf = pd.DataFrame({"conv_id": ["mega"] * n,
                        "turn_idx2": np.arange(n, dtype=np.int64),
                        "role": roles})
    # key math: salted pairing key bounds per-task rows
    per_key = ex.groupby(ex["turn_idx"] // salt).size()
    assert per_key.max() == salt and len(per_key) == -(-n // salt)
    got = _run(ex, rdf, salt_turns=salt)
    want = _oracle(ex, rdf)
    pd.testing.assert_frame_equal(got, want)
    # the carry actually crossed ranges: prompts are 1000 apart while
    # salt is 512, so most pairs resolve via a carry row
    assert (got["gap_turns"] > salt).any()


def test_sft_pairs_from_turns_matches_join_path(ray_session):
    """The join-free path (role already attached per turn, as the
    query builds it in-batch from extraction) must equal both the
    cogroup path and the sequential oracle."""
    import ray.data as rd
    from pdf_parser_ray.stages.sft import sft_pairs_from_turns
    ex, roles = _corpus(17, 14, 35)
    turns = ex.merge(roles.rename(columns={"turn_idx2": "turn_idx"}),
                     on=["conv_id", "turn_idx"], how="inner")
    got = (sft_pairs_from_turns(rd.from_pandas(turns).repartition(4),
                                salt_turns=6).to_pandas()[COLS]
           .astype({c: "int64" for c in COLS[1:]})
           .sort_values(["conv_id", "response_turn_idx"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, _oracle(ex, roles))
    pd.testing.assert_frame_equal(got, _run(ex, roles, salt_turns=6))
