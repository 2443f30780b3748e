"""Shared mutable index (raw-actor pattern): deterministic dedup
equivalence with the shuffle path, plus the resident-state property a
shuffle cannot give (incremental ingest waves)."""

import numpy as np
import pandas as pd


def _dup_corpus(n_base, copies, seed=0):
    rng = np.random.RandomState(seed)
    rows = []
    for b in range(n_base):
        text = " ".join(f"w{rng.randint(500)}" for _ in range(30))
        for c in range(copies):
            rows.append({"doc_id": b * 100 + c, "text": text})
    return pd.DataFrame(rows)


def test_indexed_dedup_matches_shuffle_dedup(ray_session):
    import ray.data as rd
    from pdf_parser_ray.stages.dedup import exact_dedup_keep
    from pdf_parser_ray.state.shared_index import DedupIndex
    df = _dup_corpus(40, 5)
    ds = rd.from_pandas(df).repartition(7)
    want = exact_dedup_keep(ds)
    idx = DedupIndex(n_shards=4)
    try:
        n = idx.ingest(ds)
        assert n == len(df)
        got = idx.kept_ids()
        assert idx.size() == len(want)
    finally:
        idx.shutdown()
    pd.testing.assert_frame_equal(got, want)


def test_indexed_dedup_incremental_waves(ray_session):
    """Second ingest wave dedups against everything the index already
    holds — the resident-state property."""
    import ray.data as rd
    from pdf_parser_ray.state.shared_index import DedupIndex
    wave1 = _dup_corpus(10, 1, seed=1)                    # ids 0..900
    wave2 = wave1.assign(doc_id=wave1["doc_id"] + 10_000)  # same texts
    idx = DedupIndex(n_shards=4)
    try:
        idx.ingest(rd.from_pandas(wave1))
        kept1 = idx.kept_ids()
        idx.ingest(rd.from_pandas(wave2))
        kept2 = idx.kept_ids()
    finally:
        idx.shutdown()
    # wave2's copies all lose to wave1's lower ids: kept set unchanged
    pd.testing.assert_frame_equal(kept1, kept2)
    assert (kept2["doc_id"] < 10_000).all()


def test_indexed_dedup_empty_wave(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from pdf_parser_ray.state.shared_index import DedupIndex
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    idx = DedupIndex(n_shards=2)
    try:
        assert idx.ingest(rd.from_arrow(empty)) == 0
        assert idx.size() == 0
    finally:
        idx.shutdown()
