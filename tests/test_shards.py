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


def test_shards_resume_survives_missing_success_marker(ray_session,
                                                       tmp_path):
    """Crash-window regression: a shard directory that exists but lost
    its _SUCCESS marker (or predates the rename-is-commit protocol)
    must be adopted on resume — not crash the re-run with ENOTEMPTY."""
    import ray.data as rd
    from pdf_parser_ray.state.shards import write_training_shards
    df = _corpus(600)
    out = str(tmp_path / "out")
    m1 = write_training_shards(rd.from_pandas(df), out,
                               key_col="doc_id", n_shards=4)
    os.remove(os.path.join(out, "shard=00002", "_SUCCESS"))
    m2 = write_training_shards(rd.from_pandas(df), out,
                               key_col="doc_id", n_shards=4)
    pd.testing.assert_frame_equal(m1, m2)


def test_shards_multi_row_group_streaming(ray_session, tmp_path):
    """Shards larger than the row-group slice are written in multiple
    row groups with an identical manifest (the content hash covers the
    parquet bytes, which the deterministic sort fixes)."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from pdf_parser_ray.state.shards import write_training_shards
    df = _corpus(1200)
    out1 = str(tmp_path / "a")
    m1 = write_training_shards(rd.from_pandas(df).repartition(5), out1,
                               key_col="doc_id", n_shards=3,
                               row_group_size=100)
    pf = pq.ParquetFile(os.path.join(out1, "shard=00000",
                                     "part.parquet"))
    assert pf.num_row_groups > 1
    out2 = str(tmp_path / "b")
    m2 = write_training_shards(rd.from_pandas(df).repartition(11), out2,
                               key_col="doc_id", n_shards=3,
                               row_group_size=100)
    pd.testing.assert_frame_equal(m1, m2)
    assert m1["rows"].sum() == len(df)


# ----------------------------------------------------------- sorted export

def _ev(n=4000):
    rng = np.random.RandomState(9)
    ts = (np.datetime64("2024-03-01", "us")
          + rng.randint(0, 20 * 86400_000_000, n).astype("timedelta64[us]"))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.Series(ts),
        "value": rng.rand(n) * 100,
    })


def test_sorted_export_global_order_and_pruning(ray_session, tmp_path):
    import ray.data as rd
    from pdf_parser_ray.state.shards import (read_sorted_range,
                                             write_sorted_export)
    df = _ev()
    out = str(tmp_path / "sorted")
    man = write_sorted_export(rd.from_pandas(df).repartition(7), out,
                              sort_col="ts", tiebreak_cols=["event_id"],
                              n_ranges=8)
    assert man["rows"].sum() == len(df)
    # concatenating range files in range order = one global sort
    import pyarrow.parquet as pq
    parts = []
    for rng_id in man["range"]:
        parts.append(pq.read_table(
            os.path.join(out, f"range={rng_id:05d}", "part.parquet"))
            .to_pandas())
    whole = pd.concat(parts, ignore_index=True)
    expect = df.sort_values(["ts", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, expect[whole.columns.tolist()])
    # pruned read: a 3-day window opens fewer than all files and
    # returns exactly the SQL-BETWEEN rows
    ds, n_files = read_sorted_range(out, "2024-03-05", "2024-03-08")
    assert 0 < n_files < len(man)
    got = (ds.to_pandas().sort_values(["ts", "event_id"])
           .reset_index(drop=True))
    lo, hi = pd.Timestamp("2024-03-05"), pd.Timestamp("2024-03-08")
    want = (expect[(expect["ts"] >= lo) & (expect["ts"] <= hi)]
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_sorted_export_deterministic_and_resume(ray_session, tmp_path):
    import ray.data as rd
    from pdf_parser_ray.state.shards import write_sorted_export
    df = _ev(1500)
    outs = []
    for i, parts in enumerate((2, 11)):
        out = str(tmp_path / f"s{i}")
        m = write_sorted_export(rd.from_pandas(df).repartition(parts),
                                out, sort_col="ts",
                                tiebreak_cols=["event_id"], n_ranges=6)
        outs.append(m)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # bytes invariant

    # resume: wipe one committed range, re-run -> only it is rewritten,
    # manifest identical
    out = str(tmp_path / "s0")
    import shutil
    victim = os.path.join(out, "range=00002")
    shutil.rmtree(victim)
    m2 = write_sorted_export(rd.from_pandas(df).repartition(5), out,
                             sort_col="ts", tiebreak_cols=["event_id"],
                             n_ranges=6)
    pd.testing.assert_frame_equal(m2, outs[0])
    # re-ranging guard
    with pytest.raises(ValueError, match="resume mismatch"):
        write_sorted_export(rd.from_pandas(df), out, sort_col="ts",
                            n_ranges=4)


def test_sorted_export_pruned_column_read(ray_session, tmp_path):
    """columns= on a bounded read auto-includes the sort key for the
    trim filter; requested columns come back (plus the key)."""
    import ray.data as rd
    from pdf_parser_ray.state.shards import (read_sorted_range,
                                             write_sorted_export)
    df = _ev(1200)
    out = str(tmp_path / "cols")
    write_sorted_export(rd.from_pandas(df), out, sort_col="ts",
                        tiebreak_cols=["event_id"], n_ranges=5)
    ds, n = read_sorted_range(out, "2024-03-04", "2024-03-06",
                              columns=["value"])
    assert n >= 1
    got = ds.to_pandas()
    assert set(got.columns) == {"ts", "value"}
    lo, hi = pd.Timestamp("2024-03-04"), pd.Timestamp("2024-03-06")
    assert ((got["ts"] >= lo) & (got["ts"] <= hi)).all()
    want = df[(df["ts"] >= lo) & (df["ts"] <= hi)]
    assert len(got) == len(want)


def test_checkpoint_salted_write_equal_and_balanced(ray_session,
                                                    tmp_path):
    """Mega-conversation skew: the salted checkpointed write must (a)
    produce the exact same row set as the unsalted write and (b) bound
    the largest bucket near salt_turns instead of the mega-conv size."""
    import ray.data as rd
    import pyarrow.dataset as pds
    from pdf_parser_ray.state.checkpoint import checkpointed_write
    n_mega, n_small = 5000, 500
    df = pd.concat([
        pd.DataFrame({"conv_id": "mega", "turn_idx": np.arange(n_mega),
                      "payload": np.arange(n_mega) * 3}),
        pd.DataFrame({"conv_id": [f"c{i}" for i in range(n_small)],
                      "turn_idx": 0,
                      "payload": np.arange(n_small)}),
    ], ignore_index=True)
    outs = {}
    for salt in (0, 256):
        out = str(tmp_path / f"salt{salt}")
        m = checkpointed_write(rd.from_pandas(df).repartition(6), out,
                               key="conv_id", n_buckets=8,
                               salt_turns=salt)
        back = (pds.dataset(out, format="parquet", partitioning="hive",
                            exclude_invalid_files=True)
                .to_table().to_pandas()
                .sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True))
        outs[salt] = back[["conv_id", "turn_idx", "payload"]]
        if salt == 0:
            assert m["rows"].max() >= n_mega      # one straggler bucket
        else:
            assert m["rows"].max() < n_mega / 4   # spread out
    pd.testing.assert_frame_equal(outs[0], outs[256])


# ----------------------------------------------------------- z-order export

def _zorder_frame(n=6000):
    rng = np.random.RandomState(11)
    return pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "a": rng.randint(0, 1000, n).astype(np.int64),
        "b": np.round(rng.uniform(0, 100, n), 2),
    })


def test_zorder_prunes_both_columns_and_is_exact(ray_session, tmp_path):
    import ray.data as rd
    from pdf_parser_ray.state.shards import (read_zorder_range,
                                             write_zorder_export)
    df = _zorder_frame()
    out = str(tmp_path / "z")
    man = write_zorder_export(rd.from_pandas(df), out, cols=["a", "b"],
                              tiebreak_cols=["rid"], n_ranges=16)
    assert int(man["rows"].sum()) == len(df)
    for preds in ({"a": (0, 99)}, {"b": (0.0, 9.0)},
                  {"a": (0, 99), "b": (0.0, 9.0)}):
        got, nf = read_zorder_range(out, preds)
        got = (got.to_pandas() if got is not None
               else df.iloc[0:0])
        mask = np.ones(len(df), bool)
        for c, (lo, hi) in preds.items():
            mask &= (df[c] >= lo) & (df[c] <= hi)
        want = df[mask]
        # a ~10% slice of one dimension must prune files (z-order
        # clusters BOTH dims; a single-column sort would prune only one)
        assert nf < 16, preds
        got = got.sort_values("rid").reset_index(drop=True)
        want = want.sort_values("rid").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                      want[sorted(want.columns)])


def test_zorder_deterministic_and_resume(ray_session, tmp_path):
    import ray.data as rd
    from pdf_parser_ray.state.shards import write_zorder_export
    df = _zorder_frame()
    a, b = str(tmp_path / "za"), str(tmp_path / "zb")
    m1 = write_zorder_export(rd.from_pandas(df), a, cols=["a", "b"],
                             tiebreak_cols=["rid"], n_ranges=8)
    m2 = write_zorder_export(rd.from_pandas(df).repartition(5), b,
                             cols=["a", "b"], tiebreak_cols=["rid"],
                             n_ranges=8)
    assert list(m1["content_hash"]) == list(m2["content_hash"])
    # resume: wipe two ranges, re-run -> identical manifest
    import shutil
    for r in (2, 5):
        shutil.rmtree(os.path.join(a, f"range={r:05d}"))
    m3 = write_zorder_export(rd.from_pandas(df), a, cols=["a", "b"],
                             tiebreak_cols=["rid"], n_ranges=8)
    assert list(m3["content_hash"]) == list(m1["content_hash"])
    # re-clustering guard
    with pytest.raises(ValueError, match="resume mismatch"):
        write_zorder_export(rd.from_pandas(df), a, cols=["a", "b"],
                            tiebreak_cols=["rid"], n_ranges=16)


def test_zorder_rejects_unclustered_predicate(ray_session, tmp_path):
    import ray.data as rd
    from pdf_parser_ray.state.shards import (read_zorder_range,
                                             write_zorder_export)
    out = str(tmp_path / "zc")
    write_zorder_export(rd.from_pandas(_zorder_frame(500)), out,
                        cols=["a", "b"], tiebreak_cols=["rid"],
                        n_ranges=4)
    with pytest.raises(ValueError, match="non-clustered"):
        read_zorder_range(out, {"rid": (0, 10)})


def test_zorder_datetime_column(ray_session, tmp_path):
    """Z-order clustering with a datetime dimension: kind detection,
    manifest bounds, and predicate conversion all run the datetime
    path."""
    import ray.data as rd
    from pdf_parser_ray.state.shards import (read_zorder_range,
                                             write_zorder_export)
    rng = np.random.RandomState(5)
    n = 3000
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(rng.randint(0, 60 * 24 * 30, n), unit="m"),
        "v": rng.uniform(0, 100, n).round(2),
    })
    out = str(tmp_path / "zdt")
    man = write_zorder_export(rd.from_pandas(df), out, cols=["ts", "v"],
                              tiebreak_cols=["rid"], n_ranges=8)
    assert int(man["rows"].sum()) == n
    got, nf = read_zorder_range(
        out, {"ts": ("2024-03-02", "2024-03-04")})
    got = got.to_pandas()
    lo, hi = pd.Timestamp("2024-03-02"), pd.Timestamp("2024-03-04")
    want = df[(df["ts"] >= lo) & (df["ts"] <= hi)]
    assert nf < 8
    pd.testing.assert_frame_equal(
        got.sort_values("rid").reset_index(drop=True)[sorted(got.columns)],
        want.sort_values("rid").reset_index(drop=True)[sorted(want.columns)])


def test_zorder_pruned_read_property(ray_session, tmp_path):
    """Property-style sweep: random frames and random rectangle
    predicates — the pruned read must equal the plain pandas filter
    exactly for every draw (files opened <= total is an invariant,
    strict pruning is asserted only for selective predicates)."""
    import ray.data as rd
    from pdf_parser_ray.state.shards import (read_zorder_range,
                                             write_zorder_export)
    rng = np.random.RandomState(23)
    for case in range(4):
        n = int(rng.randint(500, 4000))
        df = pd.DataFrame({
            "rid": np.arange(n, dtype=np.int64),
            "a": rng.randint(-1000, 1000, n).astype(np.int64),
            "b": np.round(rng.lognormal(2, 1.5, n), 3),
        })
        out = str(tmp_path / f"zp{case}")
        write_zorder_export(rd.from_pandas(df).repartition(3), out,
                            cols=["a", "b"], tiebreak_cols=["rid"],
                            n_ranges=16)
        for _ in range(3):
            lo_a, hi_a = sorted(rng.randint(-1000, 1000, 2).tolist())
            hi_b = float(rng.lognormal(2, 1.5))
            preds = {"a": (lo_a, hi_a), "b": (None, hi_b)}
            got, nf = read_zorder_range(out, preds)
            got = (got.to_pandas() if got is not None
                   else df.iloc[0:0])
            mask = ((df["a"] >= lo_a) & (df["a"] <= hi_a)
                    & (df["b"] <= hi_b))
            want = df[mask]
            assert nf <= 16
            got = got.sort_values("rid").reset_index(drop=True)
            want = want.sort_values("rid").reset_index(drop=True)
            pd.testing.assert_frame_equal(
                got[sorted(got.columns)], want[sorted(want.columns)],
                check_dtype=False)


def test_bucketed_export_join_semantics(ray_session, tmp_path):
    """Storage-partitioned join: inner/left parity with pandas merge
    on constructed frames (keys missing from either side, NULL keys
    never matching), layout-mismatch refusal, and resume rewriting
    only the deleted bucket."""
    import json

    import pytest
    import ray.data as rd

    from pdf_parser_ray.state.shards import (read_bucketed_join,
                                             write_bucketed_export)

    left = pd.DataFrame({
        "k": pd.array([1, 2, 2, 3, None, 9], dtype="Int64"),
        "lv": [10, 20, 21, 30, 40, 90]})
    right = pd.DataFrame({
        "rk": pd.array([2, 3, 3, 7, None], dtype="Int64"),
        "rv": ["b", "c", "d", "x", "n"]})
    da, db = str(tmp_path / "L"), str(tmp_path / "R")
    ma = write_bucketed_export(rd.from_pandas(left), da, key="k",
                               n_buckets=8, tiebreak_cols=["lv"])
    mb = write_bucketed_export(rd.from_pandas(right), db, key="rk",
                               n_buckets=8, tiebreak_cols=["rv"])
    assert int(ma["rows"].sum()) == 6 and int(mb["rows"].sum()) == 5

    inner = (read_bucketed_join(da, db, how="inner").to_pandas()
             .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    want = (left.dropna(subset=["k"])
            .merge(right.dropna(subset=["rk"]).rename(columns={"rk": "k"}),
                   on="k", how="inner")
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    assert list(inner["lv"]) == list(want["lv"])
    assert list(inner["rv"]) == list(want["rv"])

    lj = (read_bucketed_join(da, db, how="left").to_pandas()
          .sort_values(["lv"]).reset_index(drop=True))
    # every left row survives (6), unmatched (incl. the null key) with
    # missing right values
    assert len(lj) == 7                     # k=2 x1 right + k=3 x2
    assert lj.loc[lj["lv"] == 90, "rv"].isna().all()
    assert lj.loc[lj["lv"] == 40, "rv"].isna().all()

    # layout mismatch refused
    dc = str(tmp_path / "C")
    write_bucketed_export(rd.from_pandas(right), dc, key="rk",
                          n_buckets=4, tiebreak_cols=["rv"])
    with pytest.raises(ValueError, match="layout mismatch"):
        read_bucketed_join(da, dc)
    with pytest.raises(ValueError, match="resume mismatch"):
        write_bucketed_export(rd.from_pandas(left), da, key="lv",
                              n_buckets=8)

    # resume: drop one committed bucket -> only it is rewritten,
    # content hashes identical
    import shutil
    victim = f"bucket={int(ma['bucket'].iloc[0]):05d}"
    shutil.rmtree(f"{da}/{victim}")
    ma2 = write_bucketed_export(rd.from_pandas(left), da, key="k",
                                n_buckets=8, tiebreak_cols=["lv"])
    assert list(ma2["content_hash"]) == list(ma["content_hash"])
    man = json.load(open(f"{da}/_MANIFEST.json"))
    assert man["n_buckets"] == 8 and man["key"] == "k"
