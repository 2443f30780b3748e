"""Deterministic training-shard export: partitioning invariance,
resume, and the re-shard guard."""

import json
import os

import numpy as np
import pandas as pd
import pytest


def _corpus(n=3000):
    rng = np.random.RandomState(4)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [f"doc {i} " + "w" * int(rng.randint(5, 40))
                 for i in range(n)],
    })


def test_shards_deterministic_across_partitioning(ray_session, tmp_path):
    import ray.data as rd
    from pdf_parser_ray.state.shards import write_training_shards
    df = _corpus()
    manifests = []
    for i, parts in enumerate((3, 17)):
        out = str(tmp_path / f"run{i}")
        m = write_training_shards(rd.from_pandas(df).repartition(parts),
                                  out, key_col="doc_id", n_shards=8)
        manifests.append(m)
        assert m["rows"].sum() == len(df)
    # identical shard membership, order and content regardless of
    # input partitioning
    pd.testing.assert_frame_equal(manifests[0], manifests[1])


def test_shards_resume_skips_committed(ray_session, tmp_path):
    import ray.data as rd
    import pyarrow.dataset as pds
    from pdf_parser_ray.state.shards import write_training_shards
    df = _corpus(800)
    out = str(tmp_path / "out")
    m1 = write_training_shards(rd.from_pandas(df), out,
                               key_col="doc_id", n_shards=6)
    # wipe two shards; resume must recreate exactly those
    import shutil
    for s in (1, 4):
        shutil.rmtree(os.path.join(out, f"shard={s:05d}"))
    m2 = write_training_shards(rd.from_pandas(df), out,
                               key_col="doc_id", n_shards=6)
    pd.testing.assert_frame_equal(m1, m2)
    total = pds.dataset(out, format="parquet",
                        partitioning="hive").to_table()
    assert total.num_rows == len(df)
    with pytest.raises(ValueError, match="resume mismatch"):
        write_training_shards(rd.from_pandas(df), out,
                              key_col="doc_id", n_shards=12)
