"""Incremental cross-wave near-dup dedup: history wins, new-new pairs
keep min id, index round-trips through parquet."""

import numpy as np
import pandas as pd

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill nearby every single day").split()


def _doc(i, mutate=0):
    words = list(BASE) * 3
    rng = np.random.RandomState(i)
    for _ in range(mutate):
        words[rng.randint(len(words))] = f"tok{rng.randint(1000)}"
    return " ".join(words)


def _fresh(tag, n=90):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_incremental_two_waves(ray_session, tmp_path):
    import ray.data as rd
    from pdf_parser_ray.stages.incremental import incremental_dedup_wave

    idx = str(tmp_path / "index")

    # wave 0: two near-dup docs (10, 11) and two distinct (12, 13)
    w0 = pd.DataFrame([
        {"doc_id": 10, "text": _doc(0)},
        {"doc_id": 11, "text": _doc(0, mutate=2)},   # near-dup of 10
        {"doc_id": 12, "text": _fresh("a")},
        {"doc_id": 13, "text": _fresh("b")},
    ])
    r0 = incremental_dedup_wave(rd.from_pandas(w0), idx, wave=0,
                                threshold=0.5)
    kept0 = sorted(r0["kept"].to_pandas()["doc_id"])
    assert kept0 == [10, 12, 13]           # 11 collapsed into 10

    # wave 1: 20 = exact copy of historical 10 (MUST drop, history
    # wins even though 20 > nothing relevant); 21 = near-copy of
    # historical 12? no — of 10; 22/23 intra-wave near-dups (keep 22);
    # 24 fresh
    w1 = pd.DataFrame([
        {"doc_id": 20, "text": _doc(0)},              # == historical 10
        {"doc_id": 21, "text": _doc(0, mutate=3)},    # near historical 10
        {"doc_id": 22, "text": _fresh("c", 100)},
        {"doc_id": 23, "text": _fresh("c", 100)},     # == 22 (new-new)
        {"doc_id": 24, "text": _fresh("d", 100)},
    ])
    r1 = incremental_dedup_wave(rd.from_pandas(w1), idx, wave=1,
                                threshold=0.5)
    kept1 = sorted(r1["kept"].to_pandas()["doc_id"])
    assert kept1 == [22, 24]

    pairs = r1["pairs"].to_pandas()
    # exact copy of history scores estimate 1.0 with has_old
    row = pairs[(pairs.id_a == 10) & (pairs.id_b == 20)]
    assert len(row) == 1 and bool(row["has_old"].iloc[0])
    assert row["est_jaccard"].iloc[0] == 1.0
    # the intra-wave exact pair is flagged new-new
    row = pairs[(pairs.id_a == 22) & (pairs.id_b == 23)]
    assert len(row) == 1 and not bool(row["has_old"].iloc[0])

    # wave 2 against two waves of history: a copy of wave-1's KEPT doc
    # 22 must drop; fresh doc kept; nothing from dropped 23 resurfaces
    w2 = pd.DataFrame([
        {"doc_id": 30, "text": _fresh("c", 100)},     # == historical 22
        {"doc_id": 31, "text": _fresh("e", 100)},
    ])
    r2 = incremental_dedup_wave(rd.from_pandas(w2), idx, wave=2,
                                threshold=0.5)
    kept2 = sorted(r2["kept"].to_pandas()["doc_id"])
    assert kept2 == [31]


def test_incremental_first_wave_matches_batch(ray_session, tmp_path):
    """With no history, the incremental keep-set must equal the batch
    minhash keep-set on corpora where the signature estimate is
    decisive (exact duplicates and clearly-distinct docs)."""
    import ray.data as rd
    from pdf_parser_ray.stages.dedup import minhash_dedup_keep
    from pdf_parser_ray.stages.incremental import incremental_dedup_wave
    rows = []
    for t in range(6):
        for c in range(3):
            rows.append({"doc_id": t * 10 + c,
                         "text": _fresh(f"t{t}_", 80)})   # exact trips
    for i in range(10):
        rows.append({"doc_id": 1000 + i, "text": _fresh(f"u{i}q", 70)})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df)
    batch_kept = minhash_dedup_keep(ds, threshold=0.7)["doc_id"].tolist()
    inc = incremental_dedup_wave(ds, str(tmp_path / "idx"), wave=0,
                                 threshold=0.7)
    inc_kept = sorted(inc["kept"].to_pandas()["doc_id"])
    assert inc_kept == batch_kept


def test_index_family_guard(ray_session, tmp_path):
    """An index written under a different MinHash family / banding
    config must be refused loudly — matching against incomparable
    band hashes would silently miss cross-wave duplicates."""
    import json

    import pytest
    import ray.data as rd
    import pandas as pd
    from pdf_parser_ray.stages.incremental import (incremental_dedup_wave,
                                                   write_wave_index)
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "text": ["alpha beta gamma delta"] * 2}))
    idx = str(tmp_path / "idx")
    write_wave_index(ds, idx, wave=0)
    # simulate an index from the old family
    with open(f"{idx}/_FAMILY.json") as f:
        fam = json.load(f)
    fam["sig_family"] = 1
    with open(f"{idx}/_FAMILY.json", "w") as f:
        json.dump(fam, f)
    with pytest.raises(ValueError, match="incomparable"):
        incremental_dedup_wave(ds, idx, wave=1)
    with pytest.raises(ValueError, match="incomparable"):
        write_wave_index(ds, idx, wave=1)
    # and a banding-config mismatch is refused too
    fam["sig_family"] = 2
    with open(f"{idx}/_FAMILY.json", "w") as f:
        json.dump(fam, f)
    with pytest.raises(ValueError, match="incomparable"):
        incremental_dedup_wave(ds, idx, wave=1, bands=32)


def test_index_family_guard_unstamped_legacy(ray_session, tmp_path):
    """An index holding wave state but NO _FAMILY.json predates the
    stamp (the biased family-1 era): it must be refused on BOTH the
    read path (append_index=False) and the write path — NOT
    retroactively stamped as the current family, which would silently
    miss every cross-wave duplicate against the old band hashes."""
    import os

    import pandas as pd
    import pytest
    import ray.data as rd

    from pdf_parser_ray.stages.incremental import (incremental_dedup_wave,
                                                   write_wave_index)
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "text": ["alpha beta gamma delta"] * 2}))
    idx = str(tmp_path / "legacy")
    write_wave_index(ds, idx, wave=0)
    os.remove(f"{idx}/_FAMILY.json")       # simulate a pre-stamp index
    with pytest.raises(ValueError, match="no _FAMILY.json"):
        incremental_dedup_wave(ds, idx, wave=1, append_index=False)
    with pytest.raises(ValueError, match="no _FAMILY.json"):
        write_wave_index(ds, idx, wave=1)
    assert not os.path.exists(f"{idx}/_FAMILY.json")  # never re-stamped
