"""Property-based checks: the bucketed-combine relational layer must
agree with pandas ground truth on random frames (random key
cardinality, nulls in value columns, single- and multi-key groupbys)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, example, given, settings
import hypothesis.strategies as st

_SETTINGS = dict(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow,
                                        HealthCheck.function_scoped_fixture])


@st.composite
def frames(draw):
    n = draw(st.integers(20, 400))
    n_keys = draw(st.integers(1, 60))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    v = np.round(rng.standard_normal(n), 3)
    # inject NaNs into the value column (partial+final null semantics:
    # all-NaN group slices per batch must still combine like pandas)
    v[rng.random(n) < draw(st.sampled_from([0.0, 0.2]))] = np.nan
    return pd.DataFrame({
        "k1": rng.randint(0, n_keys, n),
        "k2": rng.choice(list("abc"), n),
        "v": v,
        "w": rng.randint(-5, 100, n),
    })


@settings(**_SETTINGS)
@given(df=frames(), keys=st.sampled_from([["k1"], ["k2"], ["k1", "k2"]]))
def test_grouped_agg_property(ray_session, df, keys):
    import ray.data as rd
    from pdf_parser_ray.relational import grouped_agg
    got = (grouped_agg(rd.from_pandas(df).repartition(3), keys,
                       {"n": ("count", None), "s": ("sum", "w"),
                        "m": ("mean", "v"), "mx": ("max", "w"),
                        "mn": ("min", "v")})
           .sort_values(keys).reset_index(drop=True))
    want = (df.groupby(keys)
            .agg(n=("w", "size"), s=("w", "sum"), m=("v", "mean"),
                 mx=("w", "max"), mn=("v", "min"))
            .reset_index().sort_values(keys).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns],
                                  check_dtype=False, atol=1e-9, rtol=0)


@settings(**_SETTINGS)
@given(df=frames())
def test_distinct_property(ray_session, df):
    import ray.data as rd
    from pdf_parser_ray.relational import distinct
    got = (distinct(rd.from_pandas(df).repartition(4), ["k1", "k2"])
           .sort_values(["k1", "k2"]).reset_index(drop=True))
    want = (df[["k1", "k2"]].drop_duplicates()
            .sort_values(["k1", "k2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(**_SETTINGS)
@given(df=frames(), k=st.integers(1, 8))
def test_topk_property(ray_session, df, k):
    import ray.data as rd
    from pdf_parser_ray.relational import topk
    got = topk(rd.from_pandas(df).repartition(3), ["v", "k1"],
               [False, True], k)
    want = (df.sort_values(["v", "k1"], ascending=[False, True])
            .head(k).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@st.composite
def asof_frames(draw):
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    nl = draw(st.integers(5, 120))
    nr = draw(st.integers(1, 120))
    base = pd.Timestamp("2024-01-01")
    # coarse second grid so exact-ts ties actually occur
    lts = base + pd.to_timedelta(rng.randint(0, 50, nl), unit="s")
    rts = base + pd.to_timedelta(rng.randint(0, 50, nr), unit="s")
    left = pd.DataFrame({"k": rng.randint(0, 6, nl), "lt": lts,
                         "lv": np.arange(nl, dtype=np.int64)})
    right = pd.DataFrame({"k": rng.randint(0, 8, nr), "rt": rts,
                          "rv": rng.randint(0, 10**9, nr)})
    # dedupe (k, rt) on the right so the asof winner is unique and the
    # pandas ground truth is order-independent
    right = right.drop_duplicates(["k", "rt"]).reset_index(drop=True)
    return left, right


@settings(**_SETTINGS)
@given(fr=asof_frames(), parts=st.sampled_from([1, 4, 9]))
def test_asof_join_property(ray_session, fr, parts):
    import ray.data as rd
    from pdf_parser_ray.relational import asof_join
    left, right = fr
    import pdf_parser_ray.relational as rel
    right_ds = rd.from_pandas(right)
    if len(right) > 1:          # repartition of an empty/1-row frame
        right_ds = right_ds.repartition(max(1, parts - 1))
    # exercise BOTH adaptive strategies: broadcast and co-partitioned
    got = asof_join(rd.from_pandas(left).repartition(parts), right_ds,
                    by="k", left_ts="lt", right_ts="rt").to_pandas()
    old = rel._BROADCAST_JOIN_BYTES
    try:
        rel._BROADCAST_JOIN_BYTES = 0
        got_shuffle = asof_join(rd.from_pandas(left).repartition(parts),
                                rd.from_pandas(right), by="k",
                                left_ts="lt", right_ts="rt").to_pandas()
    finally:
        rel._BROADCAST_JOIN_BYTES = old
    want = (pd.merge_asof(left.sort_values("lt", kind="mergesort"),
                          right.sort_values("rt", kind="mergesort"),
                          left_on="lt", right_on="rt", by="k")
            .dropna(subset=["rt"]).sort_values("lv")
            .reset_index(drop=True))
    want["rv"] = want["rv"].astype("int64")
    if len(want) == 0:
        # Ray drops column metadata from an all-empty result dataset
        assert len(got) == 0
        assert len(got_shuffle) == 0
        return
    got = got.sort_values("lv").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)
    got_shuffle = got_shuffle.sort_values("lv").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_shuffle[want.columns], want)


@st.composite
def interval_frames(draw):
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    base = pd.Timestamp("2024-01-01")
    iv_rows = []
    ivid = 0
    for k in range(draw(st.integers(1, 5))):
        t = 0
        for _ in range(rng.randint(1, 6)):
            start = t + rng.randint(0, 20)
            end = start + rng.randint(0, 30)
            iv_rows.append({"k": k,
                            "s": base + pd.Timedelta(seconds=int(start)),
                            "e": base + pd.Timedelta(seconds=int(end)),
                            "ivid": np.int64(ivid)})
            ivid += 1
            t = end + 1          # non-overlapping per key
    iv = pd.DataFrame(iv_rows)
    np_ = draw(st.integers(5, 150))
    probe = pd.DataFrame({
        "k": rng.randint(0, 7, np_),
        "t": base + pd.to_timedelta(rng.randint(0, 200, np_), unit="s"),
        "pid": np.arange(np_, dtype=np.int64),
    })
    return probe, iv


@settings(**_SETTINGS)
@given(fr=interval_frames(), parts=st.sampled_from([1, 5]))
def test_interval_join_property(ray_session, fr, parts):
    """interval_join == brute-force containment scan on random
    non-overlapping interval sets."""
    import ray.data as rd
    from pdf_parser_ray.relational import interval_join
    probe, iv = fr
    import pdf_parser_ray.relational as rel
    got = interval_join(rd.from_pandas(probe).repartition(parts),
                        rd.from_pandas(iv), by="k", ts_col="t",
                        start_col="s", end_col="e").to_pandas()
    old = rel._BROADCAST_JOIN_BYTES
    try:
        rel._BROADCAST_JOIN_BYTES = 0
        got_shuffle = interval_join(
            rd.from_pandas(probe).repartition(parts),
            rd.from_pandas(iv), by="k", ts_col="t",
            start_col="s", end_col="e").to_pandas()
    finally:
        rel._BROADCAST_JOIN_BYTES = old
    want_rows = []
    for _, p in probe.iterrows():
        hit = iv[(iv["k"] == p["k"]) & (iv["s"] <= p["t"])
                 & (p["t"] <= iv["e"])]
        for _, h in hit.iterrows():
            want_rows.append({**p.to_dict(), "s": h["s"], "e": h["e"],
                              "ivid": h["ivid"]})
    if not want_rows:
        assert len(got) == 0
        assert len(got_shuffle) == 0
        return
    want = (pd.DataFrame(want_rows).sort_values("pid")
            .reset_index(drop=True).astype({"ivid": "int64"}))
    got = got.sort_values("pid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)
    got_shuffle = got_shuffle.sort_values("pid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_shuffle[want.columns], want)


@settings(**_SETTINGS)
@given(fr=asof_frames(), window=st.sampled_from(["5s", "13s", "1h"]))
def test_asof_join_salted_equals_plain(ray_session, fr, window):
    """Time-range salting must not change the join result, for windows
    smaller than, comparable to, and larger than the data span."""
    import ray.data as rd
    from pdf_parser_ray.relational import asof_join, asof_join_salted
    left, right = fr
    plain = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                      by="k", left_ts="lt", right_ts="rt").to_pandas()
    salted = asof_join_salted(rd.from_pandas(left), rd.from_pandas(right),
                              by="k", left_ts="lt", right_ts="rt",
                              salt_window=window).to_pandas()
    if len(plain) == 0:
        assert len(salted) == 0
        return
    plain = plain.sort_values("lv").reset_index(drop=True)
    salted = salted.sort_values("lv").reset_index(drop=True)
    pd.testing.assert_frame_equal(salted[plain.columns], plain)


@settings(**_SETTINGS)
@given(fr=interval_frames(), window=st.sampled_from(["7s", "29s", "1h"]))
def test_interval_join_salted_equals_plain(ray_session, fr, window):
    import ray.data as rd
    from pdf_parser_ray.relational import interval_join, interval_join_salted
    probe, iv = fr
    plain = interval_join(rd.from_pandas(probe), rd.from_pandas(iv),
                          by="k", ts_col="t", start_col="s",
                          end_col="e").to_pandas()
    salted = interval_join_salted(rd.from_pandas(probe),
                                  rd.from_pandas(iv), by="k", ts_col="t",
                                  start_col="s", end_col="e",
                                  salt_window=window).to_pandas()
    if len(plain) == 0:
        assert len(salted) == 0
        return
    plain = plain.sort_values("pid").reset_index(drop=True)
    salted = salted.sort_values("pid").reset_index(drop=True)
    pd.testing.assert_frame_equal(salted[plain.columns], plain)


@st.composite
def asof_frames_with_ties(draw):
    """Like asof_frames but the right side intentionally KEEPS
    duplicated (k, rt) rows — the winner among ties is then the
    deterministic tiebreak (greatest numeric payload), which salted
    and plain paths must agree on."""
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    nl = draw(st.integers(5, 80))
    nr = draw(st.integers(4, 80))
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "k": rng.randint(0, 4, nl),
        "lt": base + pd.to_timedelta(rng.randint(0, 30, nl), unit="s"),
        "lv": np.arange(nl, dtype=np.int64)})
    # very coarse ts grid -> many exact (k, rt) ties
    right = pd.DataFrame({
        "k": rng.randint(0, 5, nr),
        "rt": base + pd.to_timedelta(rng.randint(0, 8, nr), unit="s"),
        "rv": rng.randint(0, 10**9, nr)})
    return left, right


@settings(**_SETTINGS)
@given(fr=asof_frames_with_ties(), window=st.sampled_from(["3s", "1h"]))
def test_asof_join_salted_ties(ray_session, fr, window):
    """Regression for the carry-row tiebreak: among equal (k, rt) right
    rows, latest_partial must carry the same winner _gather_asof picks
    (greatest numeric payload), independent of batch arrival order."""
    import ray.data as rd
    from pdf_parser_ray.relational import asof_join, asof_join_salted
    left, right = fr
    plain = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                      by="k", left_ts="lt", right_ts="rt").to_pandas()
    salted = asof_join_salted(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(3),
        by="k", left_ts="lt", right_ts="rt",
        salt_window=window).to_pandas()
    if len(plain) == 0:
        assert len(salted) == 0
        return
    plain = plain.sort_values("lv").reset_index(drop=True)
    salted = salted.sort_values("lv").reset_index(drop=True)
    pd.testing.assert_frame_equal(salted[plain.columns], plain)


@settings(**_SETTINGS)
@given(fr=asof_frames(), parts=st.sampled_from([1, 4]))
def test_asof_left_null_keys_numeric_payload(ray_session, fr, parts):
    """how='left' with NULL keys/timestamps on the left AND numeric
    (int64/float64) right payloads: such rows must come back unmatched
    with null-filled payloads (int promotes to float/NaN), on both the
    broadcast and the co-partitioned path. Regression for the
    pd.Series([pd.NA]*n, dtype=int64) TypeError."""
    import ray.data as rd
    import pdf_parser_ray.relational as rel
    from pdf_parser_ray.relational import asof_join
    left, right = fr
    left = left.copy()
    # poke NULLs into key and timestamp
    left.loc[left.index[::4], "k"] = np.nan
    left["k"] = left["k"].astype("float64")
    right = right.copy()
    right["k"] = right["k"].astype("float64")
    left.loc[left.index[1::5], "lt"] = pd.NaT
    right["rf"] = right["rv"].astype("float64") / 3.0

    def want_frame():
        ok = left.dropna(subset=["k", "lt"])
        m = pd.merge_asof(ok.sort_values("lt", kind="mergesort"),
                          right.sort_values("rt", kind="mergesort"),
                          left_on="lt", right_on="rt", by="k")
        nulls = left[left["k"].isna() | left["lt"].isna()]
        return (pd.concat([m, nulls], ignore_index=True)
                .sort_values("lv").reset_index(drop=True))

    want = want_frame()
    got = asof_join(rd.from_pandas(left).repartition(parts),
                    rd.from_pandas(right), by="k", left_ts="lt",
                    right_ts="rt", how="left").to_pandas()
    old = rel._BROADCAST_JOIN_BYTES
    try:
        rel._BROADCAST_JOIN_BYTES = 0
        got_shuffle = asof_join(rd.from_pandas(left).repartition(parts),
                                rd.from_pandas(right), by="k",
                                left_ts="lt", right_ts="rt",
                                how="left").to_pandas()
    finally:
        rel._BROADCAST_JOIN_BYTES = old
    for g in (got, got_shuffle):
        g = g.sort_values("lv").reset_index(drop=True)
        assert len(g) == len(want)
        pd.testing.assert_frame_equal(g[want.columns], want,
                                      check_dtype=False)


@settings(**_SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), parts=st.sampled_from([1, 3, 9]),
       as_float=st.booleans(), nr=st.sampled_from([4, 16]),
       mode=st.sampled_from(["quantile", "range"]))
def test_ordered_exclusive_cumsum_property(ray_session, seed, parts,
                                           as_float, nr, mode):
    """Global exclusive running sum == pandas cumsum-shift ground
    truth, under any input partitioning, skewed/sparse/negative order
    keys, both int and float values, and both boundary strategies."""
    import ray.data as rd
    from pdf_parser_ray.relational import ordered_exclusive_cumsum
    rng = np.random.RandomState(seed)
    n = rng.randint(5, 300)
    # sparse, skewed, possibly negative ids
    ids = np.unique(rng.choice(2_000_000, n) - 500_000)
    vals = rng.randint(0, 1000, len(ids))
    df = pd.DataFrame({"k": ids.astype(np.int64)})
    df["v"] = vals.astype("float64") / 8 if as_float \
        else vals.astype("int64")
    got = ordered_exclusive_cumsum(
        rd.from_pandas(df).repartition(parts), order_col="k",
        value_col="v", n_ranges=nr, boundaries=mode).to_pandas()
    want = df.sort_values("k").reset_index(drop=True)
    want["cum"] = want["v"].cumsum().shift(1, fill_value=0)
    got = got.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v", "cum"]], want,
                                  check_dtype=False)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 2**31 - 1),
       dist=st.sampled_from(["normal", "ties", "lognormal", "ints"]),
       q=st.sampled_from([0.0, 0.1, 0.5, 0.75, 0.9, 1.0]),
       budget=st.sampled_from([50, 100000]))
@example(seed=146, dist='ints', q=0.1, budget=50)
def test_quantile_exact_matches_numpy_property(ray_session, seed, dist,
                                               q, budget):
    """quantile_exact == np.quantile(method='linear') bit-for-bit on
    random distributions (including heavy ties and all-int columns),
    both with a roomy budget and one small enough to force narrowing
    or the tie shortcut."""
    import ray.data as rd
    from pdf_parser_ray.relational import quantile_exact
    rng = np.random.RandomState(seed)
    n = rng.randint(50, 3000)
    if dist == "normal":
        v = rng.standard_normal(n)
    elif dist == "ties":
        v = rng.choice([0.0, 1.5, 1.5, 1.5, 7.25], n)
    elif dist == "lognormal":
        v = rng.lognormal(0, 4, n)
    else:
        v = rng.randint(-10, 10, n).astype(np.float64)
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(
        rng.randint(1, 9))
    got = quantile_exact(ds, "x", [q], band_budget_rows=budget,
                         max_rounds=12)
    assert got == [float(np.quantile(v, q, method="linear"))]


def test_quantile_exact_adjacent_giant_tie_runs(ray_session):
    """Regression: ranks at the BOUNDARY of two tie runs each far
    larger than the band budget. The bracket pins to the two distinct
    values and the closed-interval narrowing makes no progress; the
    edge-tie-run count resolution (and the exhaustive-sample shortcut
    for small windows) must converge exactly."""
    import ray.data as rd
    from pdf_parser_ray.relational import quantile_exact

    rng = np.random.RandomState(7)
    v = np.repeat([1.0, 2.0, 3.0], 40_000)[rng.permutation(120_000)]
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(6)
    for q in (0.0, 1 / 3, 0.5, 2 / 3, 0.99, 1.0):
        got = quantile_exact(ds, "x", [q], band_budget_rows=50,
                             max_rounds=12)
        assert got == [float(np.quantile(v, q, method="linear"))], q

    # rank exactly at the junction of a 70k run and a 50k run
    v2 = np.concatenate([np.full(70_000, 5.0), np.full(50_000, 9.0)])
    ds2 = rd.from_pandas(pd.DataFrame({"x": v2})).repartition(5)
    for q in (70_000 / 120_000, (70_000 - 1) / (120_000 - 1), 0.58334):
        got = quantile_exact(ds2, "x", [q], band_budget_rows=50,
                             max_rounds=12)
        assert got == [float(np.quantile(v2, q, method="linear"))], q
