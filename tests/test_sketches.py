"""Bloom / HyperLogLog sketch tests: no false negatives, bounded error,
merge associativity, end-to-end prefilter semantics."""

import numpy as np
import pandas as pd
import pytest

from pdf_parser_ray.stages.sketches import (BloomFilter, approx_distinct,
                                            bloom_from_dataset,
                                            bloom_semi_join, hll_estimate,
                                            hll_partial)


def test_bloom_no_false_negatives_and_low_fp():
    bf = BloomFilter(n_bits=1 << 16, k=5)
    members = pd.Series([f"key-{i}" for i in range(2000)])
    bf.add_many(members)
    assert bf.contains_many(members).all()          # no false negatives
    others = pd.Series([f"other-{i}" for i in range(5000)])
    fp_rate = bf.contains_many(others).mean()
    assert fp_rate < 0.05, fp_rate


def test_bloom_merge_equals_single_build():
    a = BloomFilter(n_bits=1 << 14, k=4).add_many(pd.Series(range(0, 500)))
    b = BloomFilter(n_bits=1 << 14, k=4).add_many(pd.Series(range(500, 1000)))
    merged = a.merge(b)
    whole = BloomFilter(n_bits=1 << 14, k=4).add_many(pd.Series(range(1000)))
    assert np.array_equal(merged.bits, whole.bits)


def test_hll_accuracy_and_merge():
    s = pd.Series([f"v{i}" for i in range(50_000)])
    est = hll_estimate(hll_partial(s))
    assert abs(est - 50_000) / 50_000 < 0.05
    # element-wise max merge of halves == whole
    r1 = hll_partial(s[:25_000])
    r2 = hll_partial(s[25_000:])
    assert hll_estimate(np.maximum(r1, r2)) == pytest.approx(est)


def test_distributed_sketches(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(3)
    df = pd.DataFrame({"k": rng.randint(0, 3000, 20_000)})
    ds = rd.from_pandas(df).repartition(6)

    est = approx_distinct(ds, "k")
    exact = df["k"].nunique()
    assert abs(est - exact) / exact < 0.05

    # bloom built from one side filters the other with zero false negatives
    keys = rd.from_pandas(pd.DataFrame({"k": np.arange(0, 1000)}))
    bloom = bloom_from_dataset(keys, "k", n_bits=1 << 16)
    kept = bloom_semi_join(ds, bloom, on="k").to_pandas()
    true_members = df[df["k"] < 1000]
    assert len(kept) >= len(true_members)                  # superset
    assert set(true_members.index).issubset(set(kept.index))
    extra = (kept["k"] >= 1000).mean()
    assert extra < 0.05


def test_events_approx_distinct_users(ray_session):
    import pyarrow.parquet as pq
    from pdf_parser_ray.relational import read_table
    exact = (pq.read_table("/root/testdata/sf0.001/events.parquet",
                           columns=["user_id"])
             .to_pandas()["user_id"].nunique())
    ds = read_table("/root/testdata/sf0.001", "events", ["user_id"])
    est = approx_distinct(ds, "user_id")
    assert abs(est - exact) / exact < 0.05


def test_bottomk_merge_invariance(ray_session):
    """Bottom-k sample is partitioning-invariant (min-k of union ==
    merge of min-k's) and its quantile estimate tracks the truth."""
    import ray.data as rd
    from pdf_parser_ray.stages.sketches import bottomk_sample, sample_quantile
    import numpy as np
    import pandas as pd
    rng = np.random.RandomState(3)
    df = pd.DataFrame({"id": np.arange(50_000, dtype=np.int64),
                       "val": rng.exponential(50.0, 50_000)})
    samples = []
    for parts in (2, 17):
        ds = rd.from_pandas(df).repartition(parts)
        s = bottomk_sample(ds, value_col="val", id_col="id", k=2048)
        samples.append(s.sort_values("h").reset_index(drop=True))
    pd.testing.assert_frame_equal(samples[0], samples[1])
    est = sample_quantile(samples[0]["v"].to_numpy(), 0.5)
    true = float(np.median(df["val"]))
    assert abs(est - true) <= 0.1 * true


def test_weighted_sample_bias_and_invariance(ray_session):
    """Weighted sample is partitioning-invariant and actually biased
    toward heavy rows (sample mean weight >> population mean)."""
    import ray.data as rd
    from pdf_parser_ray.stages.sketches import weighted_sample
    import numpy as np
    import pandas as pd
    rng = np.random.RandomState(8)
    df = pd.DataFrame({"id": np.arange(20_000, dtype=np.int64),
                       "w": rng.exponential(10.0, 20_000)})
    outs = []
    for parts in (3, 11):
        s = weighted_sample(rd.from_pandas(df).repartition(parts),
                            weight_col="w", id_col="id", k=500)
        outs.append(s.sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert outs[0]["w"].mean() > 1.5 * df["w"].mean()


def test_weighted_sample_large_ids_match_sql_oracle(ray_session):
    """Regression for the Knuth-hash int64 overflow: ids above
    2^63 / 2654435761 (~3.5e9) must produce the same sample as the
    DuckDB HUGEINT formulation of the key (uint64 wrap mod 2^64 then
    % 2^32 equals exact arithmetic % 2^32)."""
    import duckdb
    import ray.data as rd
    from pdf_parser_ray.stages.sketches import weighted_sample
    import numpy as np
    import pandas as pd
    rng = np.random.RandomState(3)
    ids = (np.int64(1) << 62) + rng.choice(10_000_000, 5_000,
                                           replace=False).astype(np.int64)
    df = pd.DataFrame({"id": ids,
                       "w": rng.exponential(10.0, 5_000)})
    got = weighted_sample(rd.from_pandas(df).repartition(7),
                          weight_col="w", id_col="id", k=100)
    got = got.sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        WITH h AS (SELECT id, w,
                          ((CAST(id AS HUGEINT) * 2654435761)
                           % 4294967296 + 0.5) / 4294967296.0 AS u
                   FROM t WHERE w > 0),
        s AS (SELECT id, w FROM h ORDER BY -ln(u) / w, id LIMIT 100)
        SELECT id, w FROM s ORDER BY id
    """).df()
    con.close()
    want["id"] = want["id"].astype("int64")
    pd.testing.assert_frame_equal(got[["id", "w"]], want)


def test_heavy_hitters_mg_guarantees(ray_session):
    """Vocabulary 30x the sketch capacity, Zipf-ish counts: for every
    token, est <= true <= est + deficit; every token with
    true > deficit is present; and the top-5 by true count are
    recovered with exact-enough estimates to rank them — under two
    different input partitionings."""
    import ray.data as rd
    from pdf_parser_ray.stages.sketches import heavy_hitters
    rng = np.random.RandomState(5)
    vocab = 30_000
    true = pd.Series((3_000_000 / (np.arange(1, vocab + 1) ** 1.1))
                     .astype("int64"),
                     index=[f"t{i:05d}" for i in range(vocab)])
    true = true[true > 0]
    # token rows scattered: each token's count split across 1-4 rows
    reps = rng.randint(1, 5, len(true))
    toks = np.repeat(true.index.to_numpy(), reps)
    per = true.to_numpy() // reps
    base = np.repeat(per, reps)
    extra = np.repeat(true.to_numpy() - per * reps, reps)
    first = np.r_[True, toks[1:] != toks[:-1]]
    cnts = base + np.where(first, extra, 0)
    df = pd.DataFrame({"token": toks, "cnt": cnts})
    for parts in (4, 19):
        shuffled = df.sample(frac=1, random_state=parts)
        summary, deficit = heavy_hitters(
            rd.from_pandas(shuffled).repartition(parts),
            token_col="token", cnt_col="cnt", m=1000, n_reducers=8)
        assert deficit > 0          # caps definitely happened
        est = dict(zip(summary["token"], summary["est"]))
        for t, e in est.items():
            assert e <= true[t] <= e + deficit, t
        guaranteed = true[true > deficit]
        assert set(guaranteed.index) <= set(est), "guaranteed token lost"
        top5 = true.nlargest(5)
        assert all(t in est for t in top5.index)
