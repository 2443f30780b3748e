"""Cross-turn conversation boilerplate stripping: semantics, scale
shape (no whole-conv task), determinism."""

import numpy as np
import pandas as pd
import pytest


def _corpus():
    rows = []
    for t in range(6):
        rows.append({"conv_id": "c1", "turn_idx": t,
                     "extracted_text":
                     f"BANNER ACME\nbody {t} unique\n\nfooter page {t}"})
    for t in range(2):   # below min_turns: untouched
        rows.append({"conv_id": "c2", "turn_idx": t,
                     "extracted_text": "BANNER ACME\nshort conv"})
    for t in range(4):   # exactly at the 50% ratio boundary
        rows.append({"conv_id": "c3", "turn_idx": t,
                     "extracted_text":
                     (f"half banner\nbody {t}" if t < 2 else f"body {t}")})
    return pd.DataFrame(rows)


def test_strip_conv_boilerplate_semantics(ray_session):
    import ray.data as rd
    from pdf_parser_ray.stages.boilerplate import strip_conv_boilerplate
    df = _corpus()
    out = (strip_conv_boilerplate(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    c1 = out[out["conv_id"] == "c1"]
    assert not c1["extracted_text"].str.contains("BANNER").any()
    assert (c1["n_stripped_lines"] == 1).all()
    # unique bodies and blank separator lines survive
    assert (c1["extracted_text"]
            == [f"body {t} unique\n\nfooter page {t}" for t in range(6)]).all()
    c2 = out[out["conv_id"] == "c2"]
    assert (c2["extracted_text"] == "BANNER ACME\nshort conv").all()
    assert (c2["n_stripped_lines"] == 0).all()
    c3 = out[out["conv_id"] == "c3"].sort_values("turn_idx")
    # 2/4 == min_ratio -> boilerplate (>= is inclusive)
    assert list(c3["extracted_text"]) == [f"body {t}" for t in range(4)]
    assert list(c3["n_stripped_lines"]) == [1, 1, 0, 0]


def test_strip_conv_boilerplate_partitioning_invariant(ray_session):
    import ray.data as rd
    from pdf_parser_ray.stages.boilerplate import strip_conv_boilerplate
    rng = np.random.RandomState(7)
    rows = []
    for c in range(12):
        n = rng.randint(3, 9)
        for t in range(n):
            body = "\n".join(f"line {c}-{t}-{i}"
                             for i in range(rng.randint(1, 5)))
            rows.append({"conv_id": f"conv{c}", "turn_idx": t,
                         "extracted_text": f"chrome {c}\n{body}"})
    df = pd.DataFrame(rows)
    outs = []
    for parts in (1, 7):
        outs.append(
            strip_conv_boilerplate(rd.from_pandas(df).repartition(parts))
            .to_pandas().sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert not outs[0]["extracted_text"].str.contains("chrome").any()


def test_strip_salted_path_equality(ray_session):
    """force_salted (co-partitioned on (conv_id, turn_idx//salt)) must
    be bit-identical to the broadcast strip path, including a salt
    window smaller than conversations (ranges with no boilerplate
    occurrences still strip via the replicated hash set)."""
    import ray.data as rd
    from pdf_parser_ray.stages.boilerplate import strip_conv_boilerplate
    rng = np.random.RandomState(11)
    rows = []
    for c in range(6):
        n = rng.randint(4, 40)
        for t in range(n):
            body = "\n".join(f"line {c}-{t}-{i}"
                             for i in range(rng.randint(1, 4)))
            rows.append({"conv_id": f"conv{c}", "turn_idx": t,
                         "extracted_text": f"chrome {c}\n{body}"})
    df = pd.DataFrame(rows)
    base = (strip_conv_boilerplate(rd.from_pandas(df).repartition(5))
            .to_pandas().sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))
    salted = (strip_conv_boilerplate(
        rd.from_pandas(df).repartition(5), force_salted=True,
        salt_turns=8)
        .to_pandas().sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True))
    pd.testing.assert_frame_equal(base, salted[base.columns.tolist()])


def test_strip_salted_mega_conv_bounded(ray_session):
    """Mega-conversation stress: one conversation of 30k turns. The
    salted path must (a) produce the same bytes as the broadcast path
    and (b) bound any single strip task to ~salt_turns turns — the
    salted key (conv_id, turn_idx // salt_turns) caps every group at
    exactly salt_turns rows where the unsalted conv_id key puts all
    30k in one bucket."""
    import ray.data as rd
    from pdf_parser_ray.stages.boilerplate import strip_conv_boilerplate
    n, salt = 30_000, 1024
    df = pd.DataFrame({
        "conv_id": ["mega"] * n,
        "turn_idx": np.arange(n, dtype=np.int64),
        "extracted_text": [f"SYSTEM BANNER\nunique payload {t}"
                           for t in range(n)],
    })
    # key math: the salted strip key bounds per-task rows
    per_key = df.groupby(df["turn_idx"] // salt).size()
    assert per_key.max() == salt and len(per_key) == -(-n // salt)
    base = (strip_conv_boilerplate(rd.from_pandas(df).repartition(8))
            .to_pandas().sort_values("turn_idx").reset_index(drop=True))
    salted = (strip_conv_boilerplate(
        rd.from_pandas(df).repartition(8), force_salted=True,
        salt_turns=salt)
        .to_pandas().sort_values("turn_idx").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, salted[base.columns.tolist()])
    assert not base["extracted_text"].str.contains("BANNER").any()
    assert (base["n_stripped_lines"] == 1).all()


def test_strip_conv_boilerplate_rejects_bad_ratio(ray_session):
    import ray.data as rd
    from pdf_parser_ray.stages.boilerplate import strip_conv_boilerplate
    with pytest.raises(ValueError, match="min_ratio"):
        strip_conv_boilerplate(rd.from_pandas(_corpus()), min_ratio=0.0)
