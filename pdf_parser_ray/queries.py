"""Driver-harness queries: one entry per implemented operator/pipeline.

Each function takes ``sf_dir`` and returns a pandas DataFrame; the
driver compares it against the matching SQL in ORACLES via DuckDB
(row count + schema + order-insensitive value hash). Column names and
explicit ROUND() calls match on both sides by construction.

Queries without an ORACLES entry are non-SQL-expressible (extraction
kernel, LSH dedup, markdown assembly, ...) and get a rows-only check;
their correctness gate is the pytest oracle suite instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .relational import (broadcast_join, distinct, grouped_agg,
                         grouped_agg_ds, hash_join, read_table)

# Money columns in the testdata are 2-decimal fixed point. Aggregating
# doubles in parallel makes the result depend on summation order, and
# rounding half-even (numpy) vs half-away (DuckDB) flips exact .xx5
# boundaries — so every money aggregate here is computed in EXACT int64
# cents inside the partial stage, with the oracle SQL using the same
# integer expression tree; the final double division sequences are
# identical on both sides, making results bit-equal at any parallelism.


def _cents(x) -> np.ndarray:
    return np.rint(np.asarray(x, dtype=np.float64) * 100).astype("int64")


def _d(s) -> pd.Series:
    return s.astype("float64")


# --------------------------------------------------------------- relational


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "lineitem",
                    ["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])
    cutoff = pd.Timestamp("1998-09-02")

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] <= cutoff]
        qty_c = _cents(b["l_quantity"])
        price_c = _cents(b["l_extendedprice"])
        disc_c = _cents(b["l_discount"])
        tax_c = _cents(b["l_tax"])
        disc_price_e4 = price_c * (100 - disc_c)
        return pd.DataFrame({
            "l_returnflag": b["l_returnflag"].values,
            "l_linestatus": b["l_linestatus"].values,
            "qty_c": qty_c, "price_c": price_c, "disc_c": disc_c,
            "dp_e4": disc_price_e4,
            "ch_e6": disc_price_e4 * (100 + tax_c)})

    g = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                    ["l_returnflag", "l_linestatus"], {
                        "s_qty": ("sum", "qty_c"),
                        "s_price": ("sum", "price_c"),
                        "s_disc": ("sum", "disc_c"),
                        "s_dp": ("sum", "dp_e4"),
                        "s_ch": ("sum", "ch_e6"),
                        "count_order": ("count", None)})
    n = g["count_order"]
    out = g[["l_returnflag", "l_linestatus"]].copy()
    out["sum_qty"] = _d(g["s_qty"]) / 100.0
    out["sum_base_price"] = _d(g["s_price"]) / 100.0
    out["sum_disc_price"] = _d(g["s_dp"]) / 10000.0
    out["sum_charge"] = _d(g["s_ch"]) / 1000000.0
    out["avg_qty"] = _d(g["s_qty"]) / 100.0 / n
    out["avg_price"] = _d(g["s_price"]) / 100.0 / n
    out["avg_disc"] = _d(g["s_disc"]) / 100.0 / n
    out["count_order"] = n
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def lineitem_filter_project(sf_dir: str) -> pd.DataFrame:
    import pyarrow.compute as pc
    ds = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_linenumber", "l_quantity",
                     "l_extendedprice", "l_shipdate"])
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")

    def f(t):
        m = pc.and_(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                            pc.less(t["l_shipdate"], hi)),
                    pc.greater(t["l_quantity"], 45.0))
        return t.filter(m).select(["l_orderkey", "l_linenumber",
                                   "l_quantity", "l_extendedprice"])

    return ds.map_batches(f, batch_format="pyarrow").to_pandas()


def orders_priority_count(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "orders", ["o_orderpriority"])
    out = grouped_agg(ds, ["o_orderpriority"],
                      {"n_orders": ("count", None)})
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate — the pushdown
    showcase (only 4 columns leave storage, the date/discount/quantity
    filters run vectorized per batch, one scalar leaves each task).
    Integer e4 cents end to end."""
    ds = read_table(sf_dir, "lineitem",
                    ["l_shipdate", "l_discount", "l_quantity",
                     "l_extendedprice"])
    # the synthetic corpus spans 1995-2001, so the classic 1994 window
    # is shifted one year in (same shape, nonzero selectivity)
    lo, hi = pd.Timestamp("1995-06-01"), pd.Timestamp("1996-06-01")

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        disc_c = _cents(b["l_discount"])
        m = ((b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)
             & (disc_c >= 5) & (disc_c <= 7)
             & (b["l_quantity"] < 24))
        return pd.DataFrame({
            "rev_e4": _cents(b["l_extendedprice"])[m.to_numpy()]
            * disc_c[m.to_numpy()]})

    g = grouped_agg(
        ds.map_batches(prep, batch_format="pandas")
        .map_batches(lambda b: b.assign(k=np.int64(0)),
                     batch_format="pandas"),
        ["k"], {"s": ("sum", "rev_e4")})
    total = int(g["s"].iloc[0]) if len(g) and "s" in g.columns else 0
    return pd.DataFrame({"revenue": [float(total) / 10000.0]})


def q4_priority_semi_join(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape: orders placed in one quarter with AT LEAST ONE
    qualifying lineitem (here l_returnflag = 'R' — the synthetic
    lineitem has no commit/receipt dates), counted by priority. The
    EXISTS is a distinct-then-broadcast semi join: the qualifying
    orderkeys reduce to a distinct Dataset (partial per-batch unique,
    one key-hash shuffle) and ship once via the guarded broadcast set
    (at real scale the byte guard trips first — swap in the Bloom
    prefilter of parts_bloom_prefilter or a co-partitioned semi
    join); the window-filtered orders probe it map-side, then the
    5-row priority rollup is the usual partial+final."""
    from .relational import distinct, semi_join
    lo, hi = pd.Timestamp("1996-07-01"), pd.Timestamp("1996-10-01")
    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
    rkeys = distinct(
        li.map_batches(lambda b: b[b["l_returnflag"] == "R"]
                       [["l_orderkey"]], batch_format="pandas"),
        ["l_orderkey"])["l_orderkey"]
    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_orderdate", "o_orderpriority"])
    win = orders.map_batches(
        lambda b: b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)],
        batch_format="pandas")
    out = grouped_agg(semi_join(win, rkeys, on="o_orderkey"),
                      ["o_orderpriority"],
                      {"order_count": ("count", None)})
    if not len(out) or "order_count" not in out.columns:
        return pd.DataFrame({
            "o_orderpriority": pd.array([], dtype=str),
            "order_count": pd.array([], dtype="int64")})
    out["order_count"] = out["order_count"].astype("int64")
    return out.sort_values("o_orderpriority", ignore_index=True)


def q12_status_line_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape (two large sides, conditional rollup): 1997
    lineitems pre-aggregate to (orderkey, nlines) BEFORE the join —
    the combine-before-shuffle rule, a distributed high-cardinality
    grouped_agg_ds — then the adaptive partitioned hash join attaches
    order status/priority and a 3-row status rollup splits line
    counts into high (1-URGENT / 2-HIGH) vs low priority, mirroring
    Q12's CASE sums. The synthetic lineitem has no l_shipmode, so
    o_orderstatus plays the grouping column."""
    from .relational import grouped_agg, grouped_agg_ds, hash_join
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    per_order = grouped_agg_ds(
        li.map_batches(
            lambda b: b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)]
            [["l_orderkey"]], batch_format="pandas"),
        ["l_orderkey"], {"nlines": ("count", None)}).map_batches(
        lambda b: b.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas")
    # pin the preagg (orders-cardinality, already combined): the join
    # probes both schemas and an all-filtered window would otherwise
    # hand hash_join a schemaless empty pipeline
    per_order = per_order.materialize()
    empty12 = pd.DataFrame({
        "o_orderstatus": pd.array([], dtype=str),
        "high_lines": pd.array([], dtype="int64"),
        "low_lines": pd.array([], dtype="int64")})
    if per_order.count() == 0:
        return empty12
    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_orderstatus",
                         "o_orderpriority"])
    joined = hash_join(per_order, orders, on="o_orderkey", how="inner")

    def split(b: pd.DataFrame) -> pd.DataFrame:
        hi_m = b["o_orderpriority"].isin(("1-URGENT", "2-HIGH"))
        n = b["nlines"].astype("int64")
        return pd.DataFrame({"o_orderstatus": b["o_orderstatus"].values,
                             "high_lines": n.where(hi_m, 0).to_numpy(),
                             "low_lines": n.where(~hi_m, 0).to_numpy()})

    out = grouped_agg(joined.map_batches(split, batch_format="pandas"),
                      ["o_orderstatus"],
                      {"high_lines": ("sum", "high_lines"),
                       "low_lines": ("sum", "low_lines")})
    if not len(out) or "high_lines" not in out.columns:
        return empty12
    out = out.astype({"high_lines": "int64", "low_lines": "int64"})
    return out.sort_values("o_orderstatus", ignore_index=True)


def q14_promo_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape (promo revenue share over one shipdate month):
    the part dimension reduces driver-side to the PROMO key set
    (guarded broadcast — the strategy-lookup pattern, zero shuffles),
    lineitems in the window flag membership per batch, and one
    global sum of integer e4 revenue partials yields the share. All
    arithmetic integer cents mirrored by the oracle: rev_e4 =
    round(price*100) * (100 - round(discount*100)), share emitted as
    milli-units via '//' so no float division is hash-compared."""
    import ray

    from .relational import guard_broadcast_bytes
    lo, hi = pd.Timestamp("1996-06-01"), pd.Timestamp("1996-07-01")
    part = read_table(sf_dir, "part",
                      ["p_partkey", "p_type"]).to_pandas()
    known = frozenset(part["p_partkey"])
    promo = frozenset(part.loc[part["p_type"] == "PROMO", "p_partkey"])
    guard_broadcast_bytes(len(known) * 64, "q14 part key sets",
                          "bucket the part dim and co-partition")
    ref = ray.put((known, promo))
    li = read_table(sf_dir, "lineitem",
                    ["l_partkey", "l_shipdate", "l_extendedprice",
                     "l_discount"])
    cpus = int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else 4

    class Prep:
        """Per-actor broadcast cache (the semi_join.Filter pattern:
        the key sets deserialize once per actor, not per batch)."""

        def __init__(self):
            self.known, self.promo = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            m = (b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)
            b = b[m]
            # inner-join semantics, matching the oracle: a lineitem
            # whose partkey has no part row contributes to NEITHER sum
            b = b[b["l_partkey"].isin(self.known)]
            rev = (_cents(b["l_extendedprice"])
                   * (100 - _cents(b["l_discount"])))
            is_promo = b["l_partkey"].isin(self.promo).to_numpy()
            return pd.DataFrame({
                "k": np.zeros(len(b), dtype=np.int64),
                "promo_e4": np.where(is_promo, rev, 0),
                "total_e4": rev})

    g = grouped_agg(li.map_batches(Prep, batch_format="pandas",
                                   concurrency=(1, max(1, cpus - 2))),
                    ["k"],
                    {"promo_e4": ("sum", "promo_e4"),
                     "total_e4": ("sum", "total_e4")})
    pe = int(g["promo_e4"].iloc[0]) if len(g) else 0
    te = int(g["total_e4"].iloc[0]) if len(g) else 0
    return pd.DataFrame({
        "promo_e4": [pe], "total_e4": [te],
        "share_milli": [pe * 1000 // te if te > 0 else 0]}
    ).astype("int64")


def orders_interorder_gap(sf_dir: str) -> pd.DataFrame:
    """Inter-order gap histogram — the repurchase-interval statistic
    behind retention/CLV models: per customer, the day gaps between
    consecutive orders (LAG in (o_orderdate, o_orderkey) order — tie
    pairs gap 0 under any tie-break, and both sides order
    identically), bucketed by week. One bucketed per-customer shuffle
    computes every lag vectorized with per-bucket count partials;
    only the (week_bucket, n) histogram — bounded by the date range,
    never customers — reaches the combine. Integer seconds -> integer
    day -> integer week arithmetic, DuckDB-mirrored."""
    from .relational import bucketed_map_groups
    ds = read_table(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate"])

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort")
        s = (df["o_orderdate"].astype("datetime64[ns]")
             .astype("int64") // 1_000_000_000)
        prev = (df.assign(__s=s.values)
                .groupby("o_custkey", sort=False, observed=True)
                ["__s"].shift(1))
        m = prev.notna()
        gap_days = ((s[m].to_numpy(np.int64)
                     - prev[m].to_numpy(np.int64)) // 86400)
        return (pd.DataFrame({"gap_week_bucket": gap_days // 7})
                .groupby("gap_week_bucket", sort=False)
                .size().reset_index(name="n"))

    part = bucketed_map_groups(ds, ["o_custkey"], gaps)
    out = grouped_agg(part, ["gap_week_bucket"],
                      {"n_gaps": ("sum", "n")})
    return (out.astype({"gap_week_bucket": "int64",
                        "n_gaps": "int64"})
            .sort_values("gap_week_bucket").reset_index(drop=True))


def q10_returned_items(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape — the returned-item revenue report: which
    customers returned the most in a quarter. The heavy side
    (lineitem filtered to l_returnflag='R') partial-sums revenue per
    ORDER before any join (grouped_agg_ds), the quarter's orders
    attach co-partitioned on orderkey, the per-customer rollup is a
    second bucketed combine that STAYS a Dataset, and the top-20 cut
    is the partial-top-k primitive — only the 20 winners' customer /
    nation detail rows are fetched (filter-read + a 20-row driver
    merge), never a customer-table join. Revenue in exact integer e4
    cents (the q1/q5 arithmetic); top 20 by (revenue desc,
    c_custkey)."""
    from .relational import grouped_agg_ds, hash_join, topk
    lo, hi = pd.Timestamp("1995-10-01"), pd.Timestamp("1996-01-01")
    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate"])
    orders_f = orders.map_batches(
        lambda b: b.loc[(b["o_orderdate"] >= lo)
                        & (b["o_orderdate"] < hi),
                        ["o_orderkey", "o_custkey"]].rename(
            columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas")
    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_returnflag", "l_extendedprice",
                     "l_discount"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_returnflag"] == "R"]
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"].values,
            "rev_e4": _cents(b["l_extendedprice"])
            * (100 - _cents(b["l_discount"]))})

    per_order = grouped_agg_ds(
        li.map_batches(prep, batch_format="pandas"),
        ["l_orderkey"], {"rev_e4": ("sum", "rev_e4")})
    joined = hash_join(per_order, orders_f, on="l_orderkey",
                       how="inner")
    per_cust = grouped_agg_ds(joined, ["o_custkey"],
                              {"rev_e4": ("sum", "rev_e4")})
    top = topk(per_cust, ["rev_e4", "o_custkey"], [False, True], 20)
    if not len(top):
        return pd.DataFrame({
            "c_custkey": pd.array([], dtype="int64"),
            "c_name": pd.array([], dtype=str),
            "revenue": pd.array([], dtype="float64"),
            "n_name": pd.array([], dtype=str),
            "c_acctbal": pd.array([], dtype="float64")})
    keys = set(int(k) for k in top["o_custkey"])
    cust = read_table(sf_dir, "customer",
                      ["c_custkey", "c_name", "c_nationkey",
                       "c_acctbal"]).map_batches(
        lambda b: b[b["c_custkey"].isin(keys)],
        batch_format="pandas").to_pandas()
    nation = read_table(sf_dir, "nation",
                        ["n_nationkey", "n_name"]).to_pandas()
    out = (top.rename(columns={"o_custkey": "c_custkey"})
           .merge(cust, on="c_custkey")
           .merge(nation, left_on="c_nationkey",
                  right_on="n_nationkey"))
    out["revenue"] = _d(out["rev_e4"]) / 10000.0
    return (out[["c_custkey", "c_name", "revenue", "n_name",
                 "c_acctbal"]]
            .astype({"c_custkey": "int64"})
            .sort_values(["revenue", "c_custkey"],
                         ascending=[False, True])
            .reset_index(drop=True))


def q5_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape — the six-table join graph (region -> nation ->
    customer -> orders -> lineitem -> supplier, with the
    supplier-nation = customer-nation equality): every dimension side
    (region/nation/customer key maps, supplier->nation map) is a
    BROADCAST lookup applied inside map_batches, so the only shuffles
    are the orders semi-attach and one co-partitioned hash join of the
    two fact-sized datasets (lineitem x orders). Revenue in exact
    integer e4 cents."""
    import ray

    from .relational import guard_broadcast_bytes, hash_join
    # ASIA nations
    region = read_table(sf_dir, "region",
                        ["r_regionkey", "r_name"]).to_pandas()
    asia = set(region.loc[region["r_name"] == "ASIA", "r_regionkey"])
    nation = read_table(sf_dir, "nation",
                        ["n_nationkey", "n_name", "n_regionkey"]) \
        .to_pandas()
    nat = nation[nation["n_regionkey"].isin(asia)]
    nkey_to_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    # customers in those nations: custkey -> nationkey (broadcast)
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cmap = (cust.map_batches(
        lambda b: b[b["c_nationkey"].isin(set(nkey_to_name))],
        batch_format="pandas").to_pandas())
    guard_broadcast_bytes(16 * len(cmap), "q5 customer->nation map",
                          "co-partition the orders x customer attach")
    ck = cmap["c_custkey"].to_numpy(dtype=np.int64)
    cn = cmap["c_nationkey"].to_numpy(dtype=np.int64)
    order_ck = np.argsort(ck, kind="stable")
    cust_ref = ray.put((ck[order_ck], cn[order_ck]))
    # suppliers: suppkey -> nationkey (broadcast)
    supp = read_table(sf_dir, "supplier",
                      ["s_suppkey", "s_nationkey"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(dtype=np.int64)
    sn = supp["s_nationkey"].to_numpy(dtype=np.int64)
    order_sk = np.argsort(sk, kind="stable")
    supp_ref = ray.put((sk[order_sk], sn[order_sk]))

    lo, hi = pd.Timestamp("1995-01-01"), pd.Timestamp("1996-01-01")
    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        cks, cns = ray.get(cust_ref)
        ok = b["o_custkey"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(cks, ok)
        hit = (pos < len(cks)) & (cks[np.minimum(pos, len(cks) - 1)]
                                  == ok) if len(cks) else \
            np.zeros(len(ok), dtype=bool)
        b = b[hit]
        b = b.assign(cust_nation=cns[np.searchsorted(
            cks, b["o_custkey"].to_numpy(dtype=np.int64))])
        return b[["o_orderkey", "cust_nation"]].rename(
            columns={"o_orderkey": "l_orderkey"})

    orders_f = orders.map_batches(ord_prep, batch_format="pandas")

    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"])

    def li_prep(b: pd.DataFrame) -> pd.DataFrame:
        sks, sns = ray.get(supp_ref)
        lsk = b["l_suppkey"].to_numpy(np.int64)
        pos = np.minimum(np.searchsorted(sks, lsk), len(sks) - 1)
        # FK check: a suppkey absent from supplier must fail loudly,
        # not be attributed to the nearest supplier. (ord_prep's miss
        # mask FILTERS instead — its customer map is region-pruned, so
        # a miss there means "non-ASIA customer, drop the row", not a
        # violation. Do not harmonize the two.)
        if not (sks[pos] == lsk).all():
            bad = lsk[sks[pos] != lsk][:5]
            raise ValueError(
                f"lineitem FK violation: l_suppkey values {bad.tolist()}"
                " not present in supplier")
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"].values,
            "supp_nation": sns[pos],
            "rev_e4": _cents(b["l_extendedprice"])
            * (100 - _cents(b["l_discount"]))})

    joined = hash_join(li.map_batches(li_prep, batch_format="pandas"),
                       orders_f, on="l_orderkey", how="inner")

    def local_only(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["supp_nation"] == b["cust_nation"]]
        return pd.DataFrame({"n_nationkey": b["supp_nation"].values,
                             "rev_e4": b["rev_e4"].values})

    g = grouped_agg(joined.map_batches(local_only,
                                       batch_format="pandas"),
                    ["n_nationkey"], {"s": ("sum", "rev_e4")})
    g["n_name"] = g["n_nationkey"].map(nkey_to_name)
    g["revenue"] = _d(g["s"]) / 10000.0
    return (g[["n_name", "revenue"]]
            .sort_values(["revenue", "n_name"], ascending=[False, True])
            .reset_index(drop=True))


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape — GROUP-HAVING driving a semi join: orders
    whose lineitem quantity total exceeds 150, with customer and
    order details attached. The heavy side (lineitem) partial-sums
    per order BEFORE any join; only the HAVING winners (a tiny set by
    construction) flow into the joins, with the orders attach
    co-partitioned and the customer attach a broadcast of just the
    winning custkeys. Quantities in int cents, top 20 by
    (total_qty desc, o_orderkey)."""
    from .relational import grouped_agg_ds, hash_join, semi_join
    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"l_orderkey": b["l_orderkey"].values,
                             "qty_c": _cents(b["l_quantity"])})

    sums = grouped_agg_ds(li.map_batches(prep, batch_format="pandas"),
                          ["l_orderkey"], {"qty_c": ("sum", "qty_c")})
    winners = sums.map_batches(
        lambda b: b[b["qty_c"] > 150 * 100] if "qty_c" in b.columns
        else b, batch_format="pandas")
    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate",
                         "o_totalprice"])
    j = hash_join(
        orders.map_batches(lambda b: b.rename(
            columns={"o_orderkey": "l_orderkey"}),
            batch_format="pandas"),
        winners, on="l_orderkey", how="inner").to_pandas()
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_name"])
    cmap = (semi_join(cust, set(j["o_custkey"]), on="c_custkey")
            .to_pandas())
    out = j.merge(cmap, left_on="o_custkey", right_on="c_custkey")
    out["total_qty"] = _d(out["qty_c"]) / 100.0
    return (out[["c_name", "c_custkey", "l_orderkey", "o_orderdate",
                 "o_totalprice", "total_qty"]]
            .rename(columns={"l_orderkey": "o_orderkey"})
            .sort_values(["total_qty", "o_orderkey"],
                         ascending=[False, True])
            .head(20).reset_index(drop=True))


def top_customers_by_spend(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"o_custkey": b["o_custkey"].values,
                             "price_c": _cents(b["o_totalprice"])})

    g = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                    ["o_custkey"], {"s": ("sum", "price_c")})
    g["total_spend"] = _d(g["s"]) / 100.0
    return (g[["o_custkey", "total_spend"]]
            .sort_values(["total_spend", "o_custkey"],
                         ascending=[False, True])
            .head(10).reset_index(drop=True))


def q3_shipping_topk(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape, scale-safe end to end: the customer dim's
    BUILDING key set is the only driver-held object (a dimension-table
    broadcast for the orders semi-join); lineitem revenue is
    partial-aggregated to one row per order, the date attach is a
    co-partitioned hash join of the two large per-order datasets, and
    the top-k runs as per-batch partials. No fact table ever
    materializes on the driver."""
    from .relational import grouped_agg_ds, hash_join, semi_join, topk
    cutoff = pd.Timestamp("1998-03-15")
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    building = (cust.map_batches(
        lambda b: b.loc[b["c_mktsegment"] == "BUILDING", ["c_custkey"]],
        batch_format="pandas").to_pandas()["c_custkey"])
    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate"])
    orders_f = semi_join(
        orders.map_batches(lambda b: b[b["o_orderdate"] < cutoff],
                           batch_format="pandas"),
        building, "o_custkey").map_batches(
        lambda b: b[["o_orderkey", "o_orderdate"]].rename(
            columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas")

    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_extendedprice", "l_discount",
                     "l_shipdate"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] > cutoff]
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"].values,
            "rev_e4": _cents(b["l_extendedprice"])
            * (100 - _cents(b["l_discount"]))})

    rev = grouped_agg_ds(li.map_batches(prep, batch_format="pandas"),
                         ["l_orderkey"], {"rev_e4": ("sum", "rev_e4")})
    joined = hash_join(rev, orders_f, on="l_orderkey", how="inner")

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"].values,
            "revenue": _d(b["rev_e4"]) / 10000.0,
            "o_orderdate": b["o_orderdate"].values})

    return topk(joined.map_batches(finalize, batch_format="pandas"),
                ["revenue", "l_orderkey"], [False, True],
                10).reset_index(drop=True)


def customer_orders_full_outer(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER hash join of two derived large sides: the
    BUILDING-segment customer dim against per-customer high-value
    order aggregates. Both sides have unmatched rows (BUILDING
    customers with no qualifying order; non-BUILDING customers with
    qualifying orders) — exercised co-partitioned, never broadcast.
    Unmatched numerics are COALESCEd to 0 in BOTH engines so the
    value-hash compares deterministically (no NaN-vs-NULL skew)."""
    from .relational import grouped_agg_ds, hash_join
    cust = read_table(sf_dir, "customer",
                      ["c_custkey", "c_mktsegment", "c_acctbal"])
    bldg = cust.map_batches(
        lambda b: b.loc[b["c_mktsegment"] == "BUILDING",
                        ["c_custkey", "c_acctbal"]],
        batch_format="pandas")
    orders = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        big = b[b["o_totalprice"] > 200_000.0]
        return pd.DataFrame({"c_custkey": big["o_custkey"].values,
                             "price_c": _cents(big["o_totalprice"])})

    agg = grouped_agg_ds(orders.map_batches(prep, batch_format="pandas"),
                         ["c_custkey"], {"n_orders": ("count", None),
                                         "spend_c": ("sum", "price_c")})
    out = hash_join(bldg, agg, on="c_custkey", how="outer").to_pandas()
    return (pd.DataFrame({
        "custkey": out["c_custkey"].to_numpy(dtype=np.int64),
        "acctbal": out["c_acctbal"].fillna(0.0),
        "n_orders": out["n_orders"].fillna(0).astype("int64"),
        "total_spend": _d(out["spend_c"].fillna(0)) / 100.0,
    }).sort_values("custkey").reset_index(drop=True))


def customer_nation_stats(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    nation = nation.rename(columns={"n_nationkey": "c_nationkey"})
    cust = read_table(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    joined = broadcast_join(cust, nation, on="c_nationkey")

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n_name": b["n_name"].values,
                             "bal_c": _cents(b["c_acctbal"])})

    g = grouped_agg(joined.map_batches(prep, batch_format="pandas"),
                    ["n_name"], {"n_customers": ("count", None),
                                 "s": ("sum", "bal_c")})
    out = g[["n_name", "n_customers"]].copy()
    out["avg_acctbal"] = _d(g["s"]) / 100.0 / g["n_customers"]
    return out.sort_values("n_name").reset_index(drop=True)


def orders_customer_join_stats(sf_dir: str) -> pd.DataFrame:
    """Partitioned hash join (both sides treated as large)."""
    orders = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer",
                      ["c_custkey", "c_mktsegment"]).rename_columns(
                          {"c_custkey": "o_custkey"})
    joined = hash_join(orders, cust, on="o_custkey", n_buckets=16)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"c_mktsegment": b["c_mktsegment"].values,
                             "price_c": _cents(b["o_totalprice"])})

    g = grouped_agg(joined.map_batches(prep, batch_format="pandas"),
                    ["c_mktsegment"], {"n_orders": ("count", None),
                                       "s": ("sum", "price_c")})
    out = g[["c_mktsegment", "n_orders"]].copy()
    out["total_price"] = _d(g["s"]) / 100.0
    return out.sort_values("c_mktsegment").reset_index(drop=True)


# ------------------------------------------------------------------- events

def orders_version_diff(sf_dir: str) -> pd.DataFrame:
    """CDC-style DATASET DIFF between two table versions — the
    incremental-ingest primitive (what changed since the last run?):
    'new' is a deterministic mutation of orders (keys %97==0 removed,
    %13==0 repriced +1.00, fresh keys key+10_000_000 for %101==0
    added), both versions stay distributed, and the diff is one
    co-partitioned FULL OUTER hash join on the key with per-row
    classification (added / removed / changed / same) — value equality
    compared in exact int64 cents. Output: per-status row counts plus
    key-range fingerprints (classification then aggregates
    distributed; only 4 summary rows ever reach the driver)."""
    from .relational import grouped_agg, hash_join
    old = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep_old(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["o_orderkey"].values,
                             "old_c": _cents(b["o_totalprice"])})

    def prep_new(b: pd.DataFrame) -> pd.DataFrame:
        keep = b.loc[b["o_orderkey"] % 97 != 0]
        c = _cents(keep["o_totalprice"])
        c = c + np.where(keep["o_orderkey"] % 13 == 0, 100, 0)
        new = pd.DataFrame({"k": keep["o_orderkey"].values, "new_c": c})
        adds = b.loc[b["o_orderkey"] % 101 == 0]
        added = pd.DataFrame({
            "k": adds["o_orderkey"].values + 10_000_000,
            "new_c": _cents(adds["o_totalprice"])})
        return pd.concat([new, added], ignore_index=True)

    j = hash_join(old.map_batches(prep_old, batch_format="pandas"),
                  read_table(sf_dir, "orders",
                             ["o_orderkey", "o_totalprice"])
                  .map_batches(prep_new, batch_format="pandas"),
                  on="k", how="outer")

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        old_c, new_c = b["old_c"], b["new_c"]
        status = np.where(old_c.isna(), "added",
                          np.where(new_c.isna(), "removed",
                                   np.where(old_c != new_c, "changed",
                                            "same")))
        return pd.DataFrame({"status": status, "k": b["k"].values})

    g = grouped_agg(j.map_batches(classify, batch_format="pandas"),
                    ["status"], {"n": ("count", None),
                                 "min_key": ("min", "k"),
                                 "max_key": ("max", "k")})
    g["n"] = g["n"].astype("int64")
    g["min_key"] = g["min_key"].astype("int64")
    g["max_key"] = g["max_key"].astype("int64")
    return g.sort_values("status").reset_index(drop=True)


def events_type_stats(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "events", ["event_type", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": b["event_type"].values,
                             "v_c": _cents(b["value"]),
                             "value": b["value"].values})

    g = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                    ["event_type"], {"n_events": ("count", None),
                                     "s": ("sum", "v_c"),
                                     "max_value": ("max", "value")})
    out = g[["event_type", "n_events"]].copy()
    out["sum_value"] = _d(g["s"]) / 100.0
    out["avg_value"] = _d(g["s"]) / 100.0 / g["n_events"]
    out["max_value"] = g["max_value"]
    return out.sort_values("event_type").reset_index(drop=True)


def events_hourly_counts(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "events", ["ts"])

    def add_hour(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"hour": b["ts"].dt.floor("h")})

    out = grouped_agg(ds.map_batches(add_hour, batch_format="pandas"),
                      ["hour"], {"n_events": ("count", None)})
    return out.sort_values("hour").reset_index(drop=True)


def events_user_topk(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "events", ["user_id", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": b["user_id"].values,
                             "v_c": _cents(b["value"])})

    g = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                    ["user_id"], {"s": ("sum", "v_c")})
    g["total_value"] = _d(g["s"]) / 100.0
    return (g[["user_id", "total_value"]]
            .sort_values(["total_value", "user_id"],
                         ascending=[False, True])
            .head(10).reset_index(drop=True))


def events_user_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window (1h) aggregate per user — the engine's windowed
    aggregation operator (SURVEY.md §2.9: Ray Data has no event-time
    windows; tumbling windows are a grouped aggregate on the truncated
    timestamp)."""
    ds = read_table(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": b["user_id"].values,
                             "hour": b["ts"].dt.floor("h").values,
                             "v_c": _cents(b["value"])})

    g = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                    ["user_id", "hour"], {"n_events": ("count", None),
                                          "s": ("sum", "v_c")})
    out = g[["user_id", "hour", "n_events"]].copy()
    out["sum_value"] = _d(g["s"]) / 100.0
    return out.sort_values(["user_id", "hour"]).reset_index(drop=True)


def _sessions_ds(sf_dir: str):
    """Session windows (30-min inactivity gap) per user as a DATASET:
    bucketed per-user combine, vectorized diff+cumsum inside the
    bucket. Ordering ties on equal ts are gap-safe (diff 0 < gap ->
    same session), so the result is deterministic under any stable tie
    order."""
    from .relational import bucketed_map_groups
    ds = read_table(sf_dir, "events", ["user_id", "ts"])
    gap = pd.Timedelta(minutes=30)

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        new_user = df["user_id"] != df["user_id"].shift()
        gap_break = (df["ts"] - df["ts"].shift()) > gap
        df = df.assign(session_id=(new_user | gap_break).groupby(
            df["user_id"], observed=True).cumsum().astype("int64"))
        g = df.groupby(["user_id", "session_id"], sort=False)
        return pd.DataFrame({
            "n_events": g.size().astype("int64"),
            "session_start": g["ts"].min(),
            "session_end": g["ts"].max(),
        }).reset_index()

    return bucketed_map_groups(ds, ["user_id"], sessions)


def events_sessions(sf_dir: str) -> pd.DataFrame:
    out = _sessions_ds(sf_dir).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["user_id", "session_id"]).reset_index(drop=True)


def events_running_sum(sf_dir: str) -> pd.DataFrame:
    """Per-user running cumulative value (streaming-state analog):
    bucketed per-user combine, vectorized sort + int64-cents cumsum.
    Deterministic total order (ts, event_id) on both sides."""
    from .relational import bucketed_map_groups
    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        v_c = _cents(df["value"])
        csum = (pd.Series(v_c, index=df.index)
                .groupby(df["user_id"], observed=True).cumsum())
        return pd.DataFrame({
            "event_id": df["event_id"].values,
            "user_id": df["user_id"].values,
            "ts": df["ts"].values,
            "running_value": csum.astype("float64").values / 100.0,
        })

    out = bucketed_map_groups(ds, ["user_id"], running).to_pandas()
    return (out.sort_values(["user_id", "ts", "event_id"])
            .reset_index(drop=True))


def events_top_per_user(sf_dir: str) -> pd.DataFrame:
    """Grouped top-k (top 3 events by value per user), tie-broken by
    event_id — a per-group window operator."""
    from .relational import bucketed_map_groups
    ds = read_table(sf_dir, "events", ["event_id", "user_id", "value"])

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "value", "event_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.groupby("user_id", sort=False, observed=True).head(3)

    out = bucketed_map_groups(ds, ["user_id"], topn).to_pandas()
    return (out[["user_id", "event_id", "value"]]
            .sort_values(["user_id", "event_id"]).reset_index(drop=True))


def events_value_delta(sf_dir: str) -> pd.DataFrame:
    """Per-user LAG/LEAD window: previous-event value delta and
    next-event gap in exact integer microseconds, ordered by
    (ts, event_id) within user — one bucketed per-user shuffle, all
    window arithmetic vectorized inside the group stage. First/last
    rows use explicit sentinels (delta 0.0, gap -1) instead of NULLs
    so the result is hash-comparable without NULL-semantics coupling.
    """
    from .relational import bucketed_map_groups
    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False, observed=True)
        prev_v = g["value"].shift(1)
        next_ts = g["ts"].shift(-1)
        delta = (df["value"] - prev_v).fillna(0.0)
        td = (next_ts - df["ts"]).values.astype("timedelta64[us]")
        gap = td.view("int64").copy()
        gap[np.isnat(td)] = -1
        return pd.DataFrame({
            "event_id": df["event_id"].values,
            "user_id": df["user_id"].values,
            "ts": df["ts"].values,
            "value": df["value"].values,
            "value_delta": delta.values,
            "next_gap_us": gap,
        })

    out = bucketed_map_groups(ds, ["user_id"], win).to_pandas()
    return (out.sort_values(["user_id", "ts", "event_id"])
            .reset_index(drop=True))


def events_profile(sf_dir: str) -> pd.DataFrame:
    """Dataset PROFILER (the schema-QA pass every ingest runs): per
    column — row count, null count, EXACT distinct count (distributed
    per-batch-unique -> bucketed distinct; the mergeable-partial shape
    that never ships raw rows), and a live HyperLogLog cross-check
    (the scale path when exact distinct is too wide) asserted within
    5%. One profile row per column, all integer-exact plus the sketch
    bound as a verified TRUE."""
    from .relational import distinct_ds
    from .stages.sketches import approx_distinct
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ds = read_table(sf_dir, "events", cols).materialize()

    def null_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "col": cols,
            "n": np.int64(len(b)),
            "nulls": [int(b[c].isna().sum()) for c in cols]})

    totals = grouped_agg(
        ds.map_batches(null_partial, batch_format="pandas"),
        ["col"], {"n_rows": ("sum", "n"), "n_nulls": ("sum", "nulls")})
    rows = []
    for c in cols:
        nd = distinct_ds(ds.map_batches(lambda b, c=c: b[[c]],
                                        batch_format="pandas"),
                         [c]).count()
        est = approx_distinct(ds, c)
        t = totals[totals["col"] == c].iloc[0]
        rows.append({"col": c,
                     "n_rows": int(t["n_rows"]),
                     "n_nulls": int(t["n_nulls"]),
                     "n_distinct": int(nd),
                     "hll_within_5pct":
                     bool(abs(est - nd) <= 0.05 * max(nd, 1))})
    return (pd.DataFrame(rows)
            .astype({"n_rows": "int64", "n_nulls": "int64",
                     "n_distinct": "int64"})
            .sort_values("col").reset_index(drop=True))


def events_hourly_p95(sf_dir: str) -> pd.DataFrame:
    """Hourly P95 of event value — the SLO/latency-style windowed
    quantile report: exact per-(hour) quantile_cont from the
    cardinality-bounded int-cents histogram (the events_quantiles
    machinery keyed by time bucket), integer arithmetic until the two
    final exact float divisions mirrored in the SQL window oracle."""
    ds = read_table(sf_dir, "events", ["ts", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"hour": b["ts"].dt.floor("h"),
                             "v_c": _cents(b["value"])})

    hist = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                       ["hour", "v_c"], {"cnt": ("count", None)})
    rows = []
    for hour, g in hist.groupby("hour", sort=True):
        g = g.sort_values("v_c")
        counts = g["cnt"].to_numpy()
        values = g["v_c"].to_numpy(dtype=np.int64)
        n = int(counts.sum())
        cum = counts.cumsum()
        h100 = (n - 1) * 95
        lo_rank, f100 = divmod(h100, 100)
        hi_rank = lo_rank + (1 if f100 else 0)
        lo = int(values[np.searchsorted(cum, lo_rank + 1)])
        hi = int(values[np.searchsorted(cum, hi_rank + 1)])
        rows.append({"hour": hour,
                     "n_events": np.int64(n),
                     "p95": float(lo * (100 - f100) + hi * f100)
                     / 100.0 / 100.0})
    return (pd.DataFrame(rows).astype({"n_events": "int64"})
            .sort_values("hour").reset_index(drop=True))


def events_hourly_anomaly(sf_dir: str) -> pd.DataFrame:
    """Hourly-volume ANOMALY report (the pipeline-monitoring stat): a
    z-score per hour against the mean/population-stddev of all hourly
    counts, flagging |z| > 2. The distributed part is the hourly
    count aggregate; the moments come from its cardinality-bounded
    result in EXACT integer arithmetic (sum, sum of squares), and the
    float expression mirrors the SQL term for term so z is bit-equal.
    Hours with no events are absent on both sides (gap-fill is its own
    query)."""
    ds = read_table(sf_dir, "events", ["ts"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"hour": b["ts"].dt.floor("h")})

    g = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                    ["hour"], {"n": ("count", None)})
    n = g["n"].to_numpy(dtype=np.int64)
    k = len(g)
    s1 = int(n.sum())
    s2 = int((n * n).sum())
    mean = float(s1) / float(k)
    var = float(s2) / float(k) - mean * mean   # population variance
    # float-compare the variance (not an integer identity) so the SQL
    # CASE takes the same branch bit-for-bit
    z = ((n.astype(np.float64) - mean) / np.sqrt(var) if var > 0
         else np.zeros(k, dtype=np.float64))
    out = pd.DataFrame({"hour": g["hour"].values,
                        "n_events": n,
                        "z": np.round(z, 6),
                        "is_anomaly": np.abs(z) > 2.0})
    return (out.astype({"n_events": "int64"})
            .sort_values("hour").reset_index(drop=True))


def events_cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix: users are cohorted by the Monday week
    of their FIRST event; each (cohort_week, week_offset) cell counts
    distinct users active that many weeks later. Distributed: grouped
    min per user (partial+final), the small user->cohort map broadcast
    (at web scale: co-partitioned join by user_id — the broadcast is
    guarded), then per-batch distinct partials feed one bucketed
    distinct-count combine. Date arithmetic in exact integer days."""
    import ray

    from .relational import guard_broadcast_bytes
    ds = read_table(sf_dir, "events", ["user_id", "ts"])

    def first_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("user_id", as_index=False, sort=False)["ts"].min()
        return g

    firsts = grouped_agg(ds.map_batches(first_partial,
                                        batch_format="pandas"),
                         ["user_id"], {"first_ts": ("min", "ts")})
    cohort = firsts["first_ts"].dt.floor("D") - pd.to_timedelta(
        firsts["first_ts"].dt.weekday, unit="D")
    uid = firsts["user_id"].to_numpy(dtype=np.int64)
    order = np.argsort(uid, kind="stable")
    cw = cohort.to_numpy().astype("datetime64[D]").view("int64")
    guard_broadcast_bytes(2 * uid.nbytes, "user->cohort map",
                          "co-partition the cohort attach by user_id "
                          "instead of broadcasting")
    ref = ray.put((uid[order], cw[order]))

    def cells(b: pd.DataFrame) -> pd.DataFrame:
        uids, cws = ray.get(ref)
        u = b["user_id"].to_numpy(dtype=np.int64)
        c = cws[np.searchsorted(uids, u)]
        week = (b["ts"].dt.floor("D")
                - pd.to_timedelta(b["ts"].dt.weekday, unit="D")) \
            .to_numpy().astype("datetime64[D]").view("int64")
        off = (week - c) // 7
        return (pd.DataFrame({"cohort_week": c, "week_offset": off,
                              "user_id": u})
                .drop_duplicates())

    from .relational import bucketed_map_groups
    cell_rows = ds.map_batches(cells, batch_format="pandas")
    out = bucketed_map_groups(
        cell_rows, ["cohort_week", "week_offset"],
        lambda g: (g.drop_duplicates()
                   .groupby(["cohort_week", "week_offset"],
                            as_index=False, sort=False)
                   .agg(n_users=("user_id", "nunique")))).to_pandas()
    out["cohort_week"] = pd.to_datetime(
        out["cohort_week"].to_numpy().astype("datetime64[D]"))
    return (out.astype({"week_offset": "int64", "n_users": "int64"})
            .sort_values(["cohort_week", "week_offset"])
            .reset_index(drop=True))


def events_transition_matrix(sf_dir: str) -> pd.DataFrame:
    """Per-user event-type TRANSITION MATRIX (the Markov/path-analysis
    aggregate behind funnel mining): LAG(event_type) within each user's
    (ts, event_id) order, then a grouped count over (prev_type, type).
    One bucketed per-user shuffle computes every lag vectorized; the
    transition counts combine partially (25-cell result at any scale).
    Session starts (no previous event) are counted under
    prev_type='(start)'."""
    from .relational import bucketed_map_groups
    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts",
                                       "event_type"])

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        prev = (df.groupby("user_id", sort=False, observed=True)
                ["event_type"].shift(1).fillna("(start)"))
        return (pd.DataFrame({"prev_type": prev.values,
                              "event_type": df["event_type"].values})
                .groupby(["prev_type", "event_type"], sort=False)
                .size().reset_index(name="n"))

    part = bucketed_map_groups(ds, ["user_id"], win)
    out = grouped_agg(part, ["prev_type", "event_type"],
                      {"n_transitions": ("sum", "n")})
    if not len(out):
        return pd.DataFrame({
            "prev_type": pd.array([], dtype=str),
            "event_type": pd.array([], dtype=str),
            "n_transitions": pd.array([], dtype="int64")})
    return (out.astype({"n_transitions": "int64"})
            .sort_values(["prev_type", "event_type"])
            .reset_index(drop=True))


_PAGERANK_SCALE = 10 ** 9
_PAGERANK_ITERS = 6


def events_type_pagerank(sf_dir: str) -> pd.DataFrame:
    """PageRank over the event-type transition graph — the iterative
    GRAPH algorithm class (with connected components in the dedup
    keep-set): nodes are the distinct event types, edge weights the
    per-user LAG transition counts (the heavy distributed part —
    reused wholesale from events_transition_matrix's bucketed
    per-user shuffle; '(start)' rows excluded), then 6 power
    iterations over the cardinality-bounded matrix (|types|^2 cells
    at any corpus scale). The recurrence is EXACT FIXED-POINT INTEGER
    arithmetic so the oracle can mirror it hash-exactly: ranks live
    in 1e9-scaled units, every division is a floor (Python int //,
    DuckDB // over HUGEINT — both floor for the all-positive
    operands here), per-edge contribution floor(rank[src] * w /
    wout[src]) is floored BEFORE the sum, and damping is
    rank' = floor(0.15*SCALE/n) + floor(85 * inflow / 100).
    Dangling-node mass is dropped (the documented simplified
    variant), so total mass is non-increasing — asserted in-query.
    The oracle unrolls the 6 iterations as generated chained CTEs
    (aggregates are illegal in a recursive CTE's recursive term)."""
    tm = events_transition_matrix(sf_dir)
    # nodes from the DST side only: every event is the destination of
    # exactly one transition row (its own arrival), so dst values
    # cover the full type vocabulary — and, unlike the src side, they
    # can never BE the LAG sentinel, so a corpus whose vocabulary
    # contains the literal string '(start)' still gets the oracle's
    # node set (DISTINCT event_type). Edges from such a type are
    # dropped by the sentinel filter on BOTH sides identically (the
    # oracle's lagw CTE uses the same COALESCE sentinel).
    nodes = sorted(set(tm["event_type"]))
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"event_type": pd.array([], dtype=str),
                             "rank_scaled": pd.array([], dtype="int64")})
    ed = tm[tm["prev_type"] != "(start)"]
    edges = [(s, d, int(w)) for s, d, w in
             zip(ed["prev_type"], ed["event_type"],
                 ed["n_transitions"])]
    wout: dict = {}
    for s, _, w in edges:
        wout[s] = wout.get(s, 0) + w
    base = (15 * _PAGERANK_SCALE) // (100 * n)
    rank = {v: _PAGERANK_SCALE // n for v in nodes}
    for _ in range(_PAGERANK_ITERS):
        inflow = {v: 0 for v in nodes}
        for s, d, w in edges:
            inflow[d] += (rank[s] * w) // wout[s]
        rank = {v: base + (85 * inflow[v]) // 100 for v in nodes}
        assert sum(rank.values()) <= _PAGERANK_SCALE, \
            "pagerank mass must not grow"
    return pd.DataFrame({
        "event_type": nodes,
        "rank_scaled": pd.array([rank[v] for v in nodes],
                                dtype="int64")})


def events_type_cooccurrence(sf_dir: str) -> pd.DataFrame:
    """Event-type CO-OCCURRENCE counts — 'users who did X also did Y',
    the collaborative-filtering / market-basket prep aggregate: for
    every unordered type pair (a < b), the number of distinct users
    who performed both. One bucketed per-user shuffle; inside each
    bucket the user x type DISTINCT reduce and the pair explosion are
    vectorized pandas merges, and per-bucket pair counts are FINAL
    (same user never spans buckets), so at most |types|^2 rows per
    bucket reach the tiny combine — scale-safe for any corpus with a
    bounded type vocabulary (salting the basket side is the escape
    hatch for unbounded vocabularies, as in the conv-level near-dup)."""
    from .relational import bucketed_map_groups
    ds = read_table(sf_dir, "events", ["user_id", "event_type"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["user_id", "event_type"]].drop_duplicates()
        m = d.merge(d, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        return (m.groupby(["event_type_x", "event_type_y"],
                          sort=False)
                .size().reset_index(name="n"))

    part = bucketed_map_groups(ds, ["user_id"], pairs)
    out = grouped_agg(part, ["event_type_x", "event_type_y"],
                      {"n_users": ("sum", "n")})
    if not len(out):
        return pd.DataFrame({
            "type_a": pd.array([], dtype=str),
            "type_b": pd.array([], dtype=str),
            "n_users": pd.array([], dtype="int64")})
    out = out.rename(columns={"event_type_x": "type_a",
                              "event_type_y": "type_b"})
    return (out.astype({"n_users": "int64"})
            .sort_values(["type_a", "type_b"])
            .reset_index(drop=True))


def events_hourly_pivot(sf_dir: str) -> pd.DataFrame:
    """PIVOT (long -> wide): hourly counts per event type as one wide
    row per hour. The heavy part — the (hour, type) aggregate — runs
    distributed with partial combines; the pivot itself reshapes only
    the aggregated series (hours x 5 types), which is small by
    construction at any input scale."""
    ds = read_table(sf_dir, "events", ["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"hour": b["ts"].dt.floor("h"),
                          "event_type": b["event_type"]})
        return (d.groupby(["hour", "event_type"], sort=False,
                          observed=True).size().reset_index(name="c"))

    g = grouped_agg(ds.map_batches(partial, batch_format="pandas"),
                    ["hour", "event_type"], {"n": ("sum", "c")})
    wide = (g.pivot(index="hour", columns="event_type", values="n")
            .fillna(0).astype("int64"))
    wide = wide.reindex(
        columns=["click", "error", "purchase", "signup", "view"],
        fill_value=0).reset_index()
    wide.columns.name = None
    return wide.sort_values("hour").reset_index(drop=True)


def events_hourly_gap_fill(sf_dir: str) -> pd.DataFrame:
    """Time-series GAP FILL: the hourly 'error' count series densified
    to EVERY hour between the global min and max hour (missing hours
    emitted with n_events 0 and filled forward from the last observed
    count). The spine bounds come from one distributed min/max
    aggregate; the spine itself is hours-long (tiny by construction),
    so densify + forward-fill run on the aggregated series."""
    ds = read_table(sf_dir, "events", ["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b.loc[b["event_type"] == "error"]
        return (pd.DataFrame({"hour": d["ts"].dt.floor("h")})
                .groupby("hour", sort=False).size()
                .reset_index(name="c"))

    g = grouped_agg(ds.map_batches(partial, batch_format="pandas"),
                    ["hour"], {"n_events": ("sum", "c")})
    from ray.data.aggregate import Max, Min
    agg = ds.aggregate(Min("ts"), Max("ts"))
    lo = pd.Timestamp(agg["min(ts)"]).floor("h")
    hi = pd.Timestamp(agg["max(ts)"]).floor("h")
    spine = pd.DataFrame({"hour": pd.date_range(lo, hi, freq="h")})
    out = spine.merge(g, on="hour", how="left")
    out["observed"] = out["n_events"].notna()
    out["n_events"] = (out["n_events"].ffill().fillna(0)
                       .astype("int64"))
    return out.sort_values("hour").reset_index(drop=True)


def events_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUPING SETS / ROLLUP over (event_type, hour): counts and
    exact-cents value sums at all three levels. The FINEST level is
    the one distributed aggregation (grouped_agg partial+final); the
    coarser levels re-aggregate its cardinality-bounded result (types
    x hours rows) — int64-cents sums re-sum exactly, so every level is
    bit-equal to DuckDB's ROLLUP at any parallelism. GROUPING flags
    (g_type, g_hour) disambiguate rolled-up NULLs from data NULLs."""
    ds = read_table(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": b["event_type"].values,
                             "hour": b["ts"].dt.floor("h"),
                             "v_c": _cents(b["value"])})

    fine = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                       ["event_type", "hour"],
                       {"n_events": ("count", None), "s": ("sum", "v_c")})

    hour_dtype = fine["hour"].dtype

    def lvl(df, g_type, g_hour):
        out = pd.DataFrame({
            "event_type": (df["event_type"] if not g_type
                           else pd.Series([None] * len(df),
                                          dtype="object")),
            "hour": (df["hour"] if not g_hour
                     else pd.Series([pd.NaT] * len(df),
                                    dtype=hour_dtype)),
            "n_events": df["n_events"].astype("int64").to_numpy(),
            "sum_value": _d(df["s"]) / 100.0,
            "g_type": np.int64(g_type), "g_hour": np.int64(g_hour)})
        return out

    by_type = (fine.groupby("event_type", sort=False)
               .agg(n_events=("n_events", "sum"), s=("s", "sum"))
               .reset_index())
    total = pd.DataFrame({"event_type": [None],
                          "n_events": [fine["n_events"].sum()],
                          "s": [fine["s"].sum()]})
    out = pd.concat([lvl(fine, 0, 0), lvl(by_type, 0, 1),
                     lvl(total, 1, 1)], ignore_index=True)
    return (out.sort_values(["g_type", "g_hour", "event_type", "hour"])
            .reset_index(drop=True))


def events_funnel(sf_dir: str) -> pd.DataFrame:
    """Per-user staged-conversion FUNNEL (view -> click -> purchase,
    each stage strictly after the previous one's first occurrence).
    One bucketed per-user shuffle; inside each bucket the three stage
    timestamps come from vectorized grouped mins + merges (no per-user
    Python loop). SQL-exact vs a chain of filtered MIN() joins."""
    from .relational import bucketed_map_groups
    ds = read_table(sf_dir, "events", ["user_id", "event_type", "ts"])

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        t1 = (g[g["event_type"] == "view"]
              .groupby("user_id")["ts"].min().rename("first_view"))
        c = g[g["event_type"] == "click"].merge(
            t1, left_on="user_id", right_index=True)
        t2 = (c[c["ts"] > c["first_view"]]
              .groupby("user_id")["ts"].min()
              .rename("first_click_after"))
        p = g[g["event_type"] == "purchase"].merge(
            t2, left_on="user_id", right_index=True)
        t3 = (p[p["ts"] > p["first_click_after"]]
              .groupby("user_id")["ts"].min()
              .rename("first_purchase_after"))
        out = pd.DataFrame({"user_id": np.unique(g["user_id"])})
        out = (out.merge(t1, left_on="user_id", right_index=True,
                         how="left")
               .merge(t2, left_on="user_id", right_index=True, how="left")
               .merge(t3, left_on="user_id", right_index=True, how="left"))
        out["funnel_stage"] = np.where(
            out["first_purchase_after"].notna(), 3,
            np.where(out["first_click_after"].notna(), 2,
                     np.where(out["first_view"].notna(), 1, 0))
        ).astype("int64")
        return out

    out = bucketed_map_groups(ds, ["user_id"], funnel).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def events_sliding_window(sf_dir: str) -> pd.DataFrame:
    """Per-event trailing RANGE window (count + exact-cents sum of
    value over [ts - 1 hour, ts] within user, peers-at-equal-ts
    included — SQL RANGE-frame semantics, not ROWS): one bucketed
    per-user shuffle; inside each bucket the frame bounds come from
    two vectorized searchsorteds per user segment over the sorted
    timestamp array and the sum from an int64-cents prefix cumsum —
    no per-row loop, no quadratic window expansion. (The outer loop is
    per user SEGMENT — microseconds each; with millions of users per
    bucket the composite-key searchsorted variant removes it, at the
    cost of range-compressing timestamps per segment.)"""
    from .relational import bucketed_map_groups
    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    ONE_HOUR_US = 3_600_000_000

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts_us = df["ts"].values.astype("datetime64[us]").view("int64")
        cents = _cents(df["value"])
        uid = df["user_id"].to_numpy()
        seg = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        seg = np.r_[seg, len(uid)]
        n_out = np.empty(len(uid), dtype=np.int64)
        s_out = np.empty(len(uid), dtype=np.int64)
        for a, b in zip(seg[:-1], seg[1:]):
            t = ts_us[a:b]
            lo = np.searchsorted(t, t - ONE_HOUR_US, side="left")
            hi = np.searchsorted(t, t, side="right")  # peer-inclusive
            csum = np.r_[0, np.cumsum(cents[a:b])]
            n_out[a:b] = hi - lo
            s_out[a:b] = csum[hi] - csum[lo]
        return pd.DataFrame({
            "event_id": df["event_id"].values,
            "user_id": uid,
            "ts": df["ts"].values,
            "w_count": n_out,
            "w_sum": s_out.astype("float64") / 100.0,
        })

    out = bucketed_map_groups(ds, ["user_id"], win).to_pandas()
    return (out.sort_values(["user_id", "ts", "event_id"])
            .reset_index(drop=True))


def events_ntile(sf_dir: str) -> pd.DataFrame:
    """Global NTILE(4) over (value, event_id) — a GLOBAL-order window
    function computed distributed: ordered_global_rank gives each row
    its 0-based global row number (range partition on value + scalar
    prefix, no global sort), then the SQL NTILE bucket formula (first
    n%k buckets one row larger) is a pure vectorized map."""
    from .relational import ordered_global_rank
    ds = read_table(sf_dir, "events", ["event_id", "value"])
    n = ds.count()
    k = 4
    q, r = divmod(n, k)

    def tile(b: pd.DataFrame) -> pd.DataFrame:
        rn = b["rank"].to_numpy()
        big = q + 1
        # SQL NTILE: first r buckets hold q+1 rows, the rest q
        t = np.where(rn < r * big, rn // max(big, 1) + 1,
                     r + (rn - r * big) // max(q, 1) + 1)
        return pd.DataFrame({"event_id": b["event_id"].values,
                             "value": b["value"].values,
                             "quartile": t.astype("int64")})

    ranked = ordered_global_rank(ds, ["value", "event_id"])
    out = ranked.map_batches(tile, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def events_user_rfm(sf_dir: str) -> pd.DataFrame:
    """RFM (recency / frequency / monetary) user segmentation — the
    classic cohort/marketing segmentation, and a three-way consumer
    of the distributed NTILE primitive: per-user (seconds since last
    event, event count, spend in exact cents) via ONE bucketed
    combine, then three chained ordered_global_rank passes (value-
    range partition + prefix scalars — no global sort, no whole-
    corpus task; each pass preserves the row's other columns so no
    user-keyed re-join is needed), each followed by the SQL NTILE(4)
    bucket formula, then the 4x4x4 segment histogram (<= 64 rows at
    any corpus scale). The recency anchor is the corpus max ts
    (self-contained — no wall clock enters the surface);
    recency_days floors integer-second arithmetic mirrored by
    DuckDB's floor(epoch())."""
    from .relational import grouped_agg_ds, ordered_global_rank
    ds = read_table(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].values,
            "ts_s": (b["ts"].astype("datetime64[ns]")
                     .astype("int64") // 1_000_000_000),
            "one": np.ones(len(b), dtype=np.int64),
            "val_c": _cents(b["value"])})

    per_user = grouped_agg_ds(
        ds.map_batches(prep, batch_format="pandas"),
        ["user_id"], {"last_s": ("max", "ts_s"),
                      "freq": ("sum", "one"),
                      "spend_c": ("sum", "val_c")}).materialize()
    n = per_user.count()
    cols = ["r_q", "f_q", "m_q", "n_users"]
    if n == 0:
        return pd.DataFrame({c: pd.array([], dtype="int64")
                             for c in cols})
    anchor = int(per_user.max("last_s"))
    k = 4
    nq, nr = divmod(n, k)

    def rec(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["recency_days"] = ((anchor
                              - b["last_s"].to_numpy(np.int64))
                             // 86400)
        b["one"] = np.ones(len(b), dtype=np.int64)  # 1 row == 1 user
        return b

    def tile_col(rank_col: str, out: str):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            rn = b[rank_col].to_numpy()
            big = nq + 1
            # SQL NTILE: first n%k buckets hold one extra row
            t = np.where(rn < nr * big, rn // max(big, 1) + 1,
                         nr + (rn - nr * big) // max(nq, 1) + 1)
            b = b.copy(deep=False)
            b[out] = t.astype("int64")
            return b
        return f

    pu = per_user.map_batches(rec, batch_format="pandas")
    for order, rank_col, out in (
            (["recency_days", "user_id"], "rr", "r_q"),
            (["freq", "user_id"], "fr", "f_q"),
            (["spend_c", "user_id"], "mr", "m_q")):
        pu = ordered_global_rank(pu, order, out_col=rank_col)
        # materialize between passes: each rank pass consumes its
        # input several times (order-value sample + range counts +
        # the ranked output), so an unmaterialized chain re-executes
        # every earlier pass's shuffle multiplicatively
        pu = pu.map_batches(tile_col(rank_col, out),
                            batch_format="pandas").materialize()
    seg = grouped_agg(pu, ["r_q", "f_q", "m_q"],
                      {"n_users": ("sum", "one")})
    return (seg.astype({c: "int64" for c in cols})[cols]
            .sort_values(["r_q", "f_q", "m_q"])
            .reset_index(drop=True))


def events_hourly_moving_avg(sf_dir: str) -> pd.DataFrame:
    """3-hour trailing moving average over the hourly count series:
    the heavy aggregation is distributed; the rolling window runs on
    the already-tiny hour series."""
    hourly = events_hourly_counts(sf_dir).sort_values("hour")
    hourly["moving_avg"] = (hourly["n_events"]
                            .rolling(3, min_periods=1).mean())
    return hourly.reset_index(drop=True)


def events_asof_join(sf_dir: str) -> pd.DataFrame:
    """AS-OF join (relational.asof_join): each purchase event attached
    to the user's most recent prior-or-equal view event; lag in exact
    integer microseconds. Inner semantics (purchases with no prior view
    drop out) so no null column ever float-coerces."""
    from .relational import asof_join
    ds = read_table(sf_dir, "events",
                    ["event_id", "user_id", "event_type", "ts"])
    left = ds.map_batches(
        lambda b: b[b["event_type"] == "purchase"]
        [["event_id", "user_id", "ts"]], batch_format="pandas")
    right = ds.map_batches(
        lambda b: b[b["event_type"] == "view"][["user_id", "ts"]]
        .rename(columns={"ts": "view_ts"}), batch_format="pandas")
    out = asof_join(left, right, by="user_id",
                    left_ts="ts", right_ts="view_ts").to_pandas()
    out["lag_us"] = ((out["ts"] - out["view_ts"])
                     // pd.Timedelta(microseconds=1)).astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def events_asof_window(sf_dir: str) -> pd.DataFrame:
    """AS-OF join with an ATTRIBUTION WINDOW (ads-style last-touch
    within 1 hour): the most recent prior view only counts when it is
    at most an hour old — since the as-of match is the closest prior
    event, windowing is an exact post-filter on the match lag, applied
    distributed inside the same pipeline (no extra shuffle)."""
    from .relational import asof_join
    W_US = 3_600_000_000
    ds = read_table(sf_dir, "events",
                    ["event_id", "user_id", "event_type", "ts"])
    left = ds.map_batches(
        lambda b: b[b["event_type"] == "purchase"]
        [["event_id", "user_id", "ts"]], batch_format="pandas")
    right = ds.map_batches(
        lambda b: b[b["event_type"] == "view"][["user_id", "ts"]]
        .rename(columns={"ts": "view_ts"}), batch_format="pandas")

    def windowed(b: pd.DataFrame) -> pd.DataFrame:
        lag = ((b["ts"] - b["view_ts"])
               // pd.Timedelta(microseconds=1)).astype("int64")
        b = b.assign(lag_us=lag)
        return b[b["lag_us"] <= W_US]

    out = (asof_join(left, right, by="user_id",
                     left_ts="ts", right_ts="view_ts")
           .map_batches(windowed, batch_format="pandas").to_pandas())
    return out.sort_values("event_id").reset_index(drop=True)


def events_asof_left(sf_dir: str) -> pd.DataFrame:
    """LEFT-outer AS-OF join: every purchase kept, with the most recent
    prior view timestamp or NULL — matching DuckDB ASOF LEFT JOIN
    bit-exact (the nullable payload is a timestamp, which stays
    dtype-exact through null-filling)."""
    from .relational import asof_join
    ds = read_table(sf_dir, "events",
                    ["event_id", "user_id", "event_type", "ts"])
    left = ds.map_batches(
        lambda b: b[b["event_type"] == "purchase"]
        [["event_id", "user_id", "ts"]], batch_format="pandas")
    right = ds.map_batches(
        lambda b: b[b["event_type"] == "view"][["user_id", "ts"]]
        .rename(columns={"ts": "view_ts"}), batch_format="pandas")
    out = asof_join(left, right, by="user_id", left_ts="ts",
                    right_ts="view_ts", how="left").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def events_session_attrib(sf_dir: str) -> pd.DataFrame:
    """Interval/range join (relational.interval_join): purchase events
    matched into their containing session window, then per-session
    purchase count + exact-cents revenue. Exercises the containment
    join against intervals derived by the engine itself; the oracle
    recomputes the same sessions CTE in SQL."""
    from .relational import interval_join
    probe = read_table(sf_dir, "events",
                       ["event_id", "user_id", "event_type", "ts", "value"]) \
        .map_batches(
            lambda b: pd.DataFrame({
                "user_id": b.loc[b["event_type"] == "purchase", "user_id"],
                "p_ts": b.loc[b["event_type"] == "purchase", "ts"],
                "v_c": _cents(b.loc[b["event_type"] == "purchase", "value"]),
            }), batch_format="pandas")
    joined = interval_join(probe, _sessions_ds(sf_dir), by="user_id",
                           ts_col="p_ts", start_col="session_start",
                           end_col="session_end")
    g = grouped_agg(joined, ["user_id", "session_id"],
                    {"n_purchases": ("count", None), "s": ("sum", "v_c")})
    out = g[["user_id", "session_id", "n_purchases"]].copy()
    out["purchase_value"] = _d(g["s"]) / 100.0
    return (out.sort_values(["user_id", "session_id"])
            .reset_index(drop=True))


def docs_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified sampling: exactly ceil(10%) of each
    language stratum, chosen by a Knuth-hash order on doc_id so the
    sample is reproducible and SQL-expressible. Two passes: tiny
    per-stratum counts, then per-batch partial top-k (each batch ships
    at most k rows per stratum into the shuffle) + per-stratum final
    top-k — the full table never enters the shuffle."""
    import math

    from .relational import bucketed_map_groups
    ds = read_table(sf_dir, "documents", ["doc_id", "lang"])
    counts = grouped_agg(ds, ["lang"], {"n": ("count", None)})
    k_by_lang = {l: math.ceil(0.1 * n)
                 for l, n in zip(counts["lang"], counts["n"])}

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # uint64 multiply wraps mod 2^64; % 2^32 then equals exact
        # arithmetic (2^32 | 2^64) — see weighted_sample
        b = b.assign(h=((b["doc_id"].to_numpy(dtype=np.int64)
                         .astype(np.uint64) * np.uint64(2654435761))
                        % np.uint64(1 << 32)).astype(np.int64))
        b = b.sort_values(["h", "doc_id"], kind="mergesort")
        return b.groupby("lang", sort=False, observed=True).head(
            max(k_by_lang.values()))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="mergesort")
        return pd.concat([gg.head(k_by_lang[l]) for l, gg in
                          g.groupby("lang", sort=False, observed=True)])

    partials = ds.map_batches(partial, batch_format="pandas")
    out = bucketed_map_groups(partials, ["lang"], final).to_pandas()
    return (out[["doc_id", "lang"]].sort_values("doc_id")
            .reset_index(drop=True))


def embeddings_knn_confusion(sf_dir: str) -> pd.DataFrame:
    """k-NN label-prediction CONFUSION MATRIX (k=5, majority vote) —
    the label-quality audit run before trusting a labeled corpus: each
    point is classified by its 5 nearest neighbors (self excluded) and
    the (actual, predicted) counts expose systematically confusable
    label pairs. Distributed as broadcast-candidate-matrix + per-batch
    vectorized scoring (matmul, one argsort per query row); at web
    scale the candidate side is the IVF-bucketed index
    (stages.similarity), the vote logic unchanged. Ranking runs on
    cosine ROUNDED to 4dp with vec_id tiebreak — the same
    ulp-stability surface as the knn oracle — so the SQL window
    ranking is identical; vote ties break to the smallest label."""
    import ray
    ds = read_table(sf_dir, "embeddings",
                    ["vec_id", "embedding", "label"]).materialize()
    pdf = ds.to_pandas()
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    labels = pdf["label"].to_numpy(dtype=np.int64)
    from .relational import guard_broadcast_bytes
    guard_broadcast_bytes(X.nbytes, "knn candidate matrix",
                          "swap the broadcast matrix for the "
                          "IVF-bucketed index (stages.similarity)")
    norms = np.linalg.norm(X, axis=1)
    ref = ray.put((X, ids, labels, norms))
    K = 5

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        Xc, cid, clab, cnorm = ray.get(ref)
        Q = np.stack([np.asarray(v, dtype=np.float64)
                      for v in b["embedding"]])
        qid = b["vec_id"].to_numpy(dtype=np.int64)
        qlab = b["label"].to_numpy(dtype=np.int64)
        cos = (Q @ Xc.T) / (np.linalg.norm(Q, axis=1)[:, None]
                            * cnorm[None, :])
        cos4 = np.round(cos, 4)
        preds = np.empty(len(b), dtype=np.int64)
        for i in range(len(b)):
            row = cos4[i].copy()
            row[cid == qid[i]] = -np.inf          # exclude self
            order = np.lexsort((cid, -row))[:K]
            nl = clab[order]
            cnt = np.bincount(nl)
            preds[i] = int(np.flatnonzero(cnt == cnt.max())[0])
        return pd.DataFrame({"actual": qlab, "predicted": preds})

    out = grouped_agg(ds.map_batches(classify, batch_format="pandas"),
                      ["actual", "predicted"], {"n": ("count", None)})
    return (out.astype({"actual": "int64", "predicted": "int64",
                        "n": "int64"})
            .sort_values(["actual", "predicted"]).reset_index(drop=True))


def embeddings_label_outliers(sf_dir: str) -> pd.DataFrame:
    """Per-label centroid QA — the mislabeled-sample detector a
    training-data pipeline runs over an embedded corpus: each label's
    centroid direction is the per-dim SUM of its members (cosine is
    scale-invariant, and the sum — unlike the mean — is mirrored
    exactly by SQL SUM), every point is scored by cosine to its OWN
    label's centroid, and the per-label report counts negative-cosine
    members (pointing away from their class). Two passes, kmeans
    layout: per-batch sufficient statistics combined driver-side in
    deterministic (label, blk) order, centroids broadcast once via
    ray.put, scoring fully distributed. avg_cos is rounded to 3dp so
    dim-summation-order ulps can't break the hash compare."""
    import ray
    ds = read_table(sf_dir, "embeddings",
                    ["vec_id", "embedding", "label"]).materialize()

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in b["embedding"]])
        lab = b["label"].to_numpy(dtype=np.int64)
        blk = int(b["vec_id"].min())
        rows = []
        for lb in np.unique(lab):
            rows.append({"label": int(lb),
                         "s": X[lab == lb].sum(axis=0).tolist(),
                         "blk": blk})
        return pd.DataFrame(rows)

    part = (ds.map_batches(stats, batch_format="pandas")
            .to_pandas().sort_values(["label", "blk"], kind="mergesort"))
    cen = {int(lb): np.sum(np.stack([np.asarray(s) for s in g["s"]]),
                           axis=0)
           for lb, g in part.groupby("label")}
    ref = ray.put(cen)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        C_map = ray.get(ref)
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in b["embedding"]])
        lab = b["label"].to_numpy(dtype=np.int64)
        C = np.stack([C_map[int(lb)] for lb in lab])
        cos = (X * C).sum(1) / (np.linalg.norm(X, axis=1)
                                * np.linalg.norm(C, axis=1))
        return pd.DataFrame({"label": lab,
                             "is_out": (cos < 0.0).astype(np.int64),
                             "cos": cos})

    agg = grouped_agg(ds.map_batches(score, batch_format="pandas"),
                      ["label"], {"n": ("count", None),
                                  "n_outliers": ("sum", "is_out"),
                                  "sum_cos": ("sum", "cos")})
    agg["avg_cos"] = np.round(agg["sum_cos"].to_numpy(dtype=np.float64)
                              / agg["n"].to_numpy(dtype=np.float64), 3)
    return (agg[["label", "n", "n_outliers", "avg_cos"]]
            .astype({"label": "int64", "n": "int64",
                     "n_outliers": "int64"})
            .sort_values("label").reset_index(drop=True))


def embeddings_kmeans(sf_dir: str) -> pd.DataFrame:
    """Distributed k-means (k=8, 5 fixed iterations, deterministic
    seed = the k lowest vec_ids): per-batch vectorized assign +
    per-cluster partial sums inside map_batches; the driver only ever
    combines k x n_blocks tiny partials per iteration (the classic
    broadcast-centroids / partial-sufficient-statistics layout).
    Iterative, so no SQL oracle — instead two BOUNDS ORACLES are
    asserted live: (a) total within-cluster SSE after the update
    iterations must not exceed the seed-centroid SSE (Lloyd's
    iterations are monotonically non-increasing), and (b) the
    per-cluster membership hash (wraparound int64 sum of member
    vec_id siphashes — order-independent, so deterministic under any
    task completion order) is returned, pinning assignments bit-stably
    across re-runs via the driver's value-hash compare."""
    import ray
    k, iters = 8, 5
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    # iterative re-scan: cache the (projected) working set in the
    # object store rather than re-reading parquet every iteration
    ds = ds.materialize()
    # seed = the k lowest vec_ids, found by a mergeable per-batch
    # bottom-k (ids need not start at 0 or be dense)
    seed = (ds.map_batches(
        lambda b: b.sort_values("vec_id").head(k), batch_format="pandas")
        .to_pandas().sort_values("vec_id").head(k))
    if len(seed) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(seed)}")
    centroids = np.stack([np.asarray(v, dtype=np.float64)
                          for v in seed["embedding"]])

    def partials_for(ref):
        def assign(b: pd.DataFrame):
            import pyarrow as pa
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in b["embedding"]])
            C = ray.get(ref)
            d2 = ((X * X).sum(1)[:, None] - 2.0 * (X @ C.T)
                  + (C * C).sum(1)[None, :])
            a = d2.argmin(1)
            sums = np.zeros_like(C)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            inert = np.zeros(k)
            np.add.at(inert, a, d2[np.arange(len(a)), a])
            # per-cluster membership hash partial: wraparound int64
            # sums are associative+commutative, so the combined value
            # is independent of batch/task order
            vh = pd.util.hash_pandas_object(
                b["vec_id"], index=False).to_numpy().view(np.int64)
            ah = np.zeros(k, dtype=np.int64)
            with np.errstate(over="ignore"):
                np.add.at(ah, a, vh)
            # blk: stable per-batch key so the driver combines float
            # partials in a deterministic order regardless of task
            # completion order
            blk = int(b["vec_id"].min())
            return pa.table({
                "cluster": np.arange(k, dtype=np.int64),
                "n": counts,
                "s": sums.tolist(),
                "inertia": inert,
                "ah": ah,
                "blk": np.full(k, blk, dtype=np.int64),
            })
        return assign

    seed_sse = None
    for it in range(iters):
        ref = ray.put(centroids)
        part = (ds.map_batches(partials_for(ref), batch_format="pandas")
                .to_pandas().sort_values(["cluster", "blk"],
                                         kind="mergesort"))
        if it == 0:
            seed_sse = float(part["inertia"].sum())
        counts = part.groupby("cluster")["n"].sum()
        sums = {c: np.sum(np.stack([np.asarray(s) for s in g["s"]]), axis=0)
                for c, g in part.groupby("cluster")}
        centroids = np.stack([
            sums[c] / counts[c] if counts[c] > 0 else centroids[c]
            for c in range(k)])

    ref = ray.put(centroids)
    part = (ds.map_batches(partials_for(ref), batch_format="pandas")
            .to_pandas().sort_values(["cluster", "blk"], kind="mergesort"))
    g = part.groupby("cluster", as_index=False).agg(
        size=("n", "sum"), inertia=("inertia", "sum"),
        assign_hash=("ah", "sum"))
    # bounds oracle: Lloyd's updates never increase total SSE
    final_sse = float(g["inertia"].sum())
    assert final_sse <= seed_sse * (1 + 1e-9), \
        f"k-means SSE increased: seed {seed_sse} -> final {final_sse}"
    g["inertia"] = np.round(g["inertia"], 4)
    return (g.rename(columns={"cluster": "cluster_id"})
            .astype({"cluster_id": "int64", "size": "int64",
                     "assign_hash": "int64"})
            .sort_values("cluster_id").reset_index(drop=True))


def docs_training_mix(sf_dir: str) -> pd.DataFrame:
    """End-to-end training-data curation pipeline COMPOSED from the
    engine's own operators, fully SQL-oracled: language filter ->
    vectorized quality scoring -> quality gate (n_tokens >= 50,
    alpha_ratio >= 0.8) -> exact content dedup (min-id representative)
    -> kept-id semi-join. The gated working set is pinned once in the
    (spillable) object store for its two consumers rather than
    re-scanned; the only driver state is the kept-id set (at real
    scale that broadcast becomes the Bloom-filter semi join exercised
    by parts_bloom_prefilter)."""
    from .relational import semi_join
    from .stages.dedup import exact_dedup_keep
    from .stages.text_analysis import quality_batch
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "lang"])

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["lang"] == "en"]
        q = quality_batch(b)
        keep = (q["n_tokens"] >= 50) & (q["alpha_ratio"] >= 0.8)
        out = q.loc[keep, ["doc_id", "n_tokens", "alpha_ratio"]]
        return out.assign(text=b.loc[keep.to_numpy(), "text"].to_numpy())

    gated = ds.map_batches(gate, batch_format="pandas").materialize()
    kept = exact_dedup_keep(gated)
    out = semi_join(gated, set(kept["doc_id"]), on="doc_id").to_pandas()
    return (out[["doc_id", "n_tokens", "alpha_ratio"]]
            .sort_values("doc_id").reset_index(drop=True))


def events_distinct_users_by_type(sf_dir: str) -> pd.DataFrame:
    """Per-group approximate distinct (grouped HyperLogLog,
    stages.sketches.approx_distinct_grouped) with a BOUNDS ORACLE:
    the emitted count is the exact distributed COUNT(DISTINCT) (via a
    (type, user) distinct shuffle, SQL-equal) and `hll_within_5pct`
    asserts the O(4 KiB)-per-group register sketch — which never
    shuffles user ids at all — lands within 5% (p=12, ~1.6% standard
    error)."""
    from .relational import distinct, grouped_agg
    from .stages.sketches import approx_distinct_grouped
    ds = read_table(sf_dir, "events", ["event_type", "user_id"])
    pairs = distinct(ds, ["event_type", "user_id"])
    exact = (pairs.groupby("event_type", observed=True).size()
             .reset_index(name="n_users"))
    exact["n_users"] = exact["n_users"].astype("int64")
    est = approx_distinct_grouped(ds, group_col="event_type",
                                  col="user_id")
    e = dict(zip(est["event_type"], est["est"]))
    exact = exact.sort_values("event_type").reset_index(drop=True)
    exact["hll_within_5pct"] = pd.array(
        [abs(e.get(t, 0) - n) <= 0.05 * n
         for t, n in zip(exact["event_type"], exact["n_users"])],
        dtype="bool")
    return exact


def docs_chunk_dedup(sf_dir: str) -> pd.DataFrame:
    """Chunk-level (paragraph-analog) exact dedup: split each doc into
    25-word chunks, keep only the FIRST global occurrence of each
    distinct chunk (ordered by (doc_id, chunk_idx)), and reassemble
    each doc from its surviving chunks — the repeated-boilerplate
    removal step of web-corpus curation. Two bucketed shuffles: chunks
    grouped by content (winner = min occurrence per group, chosen
    inside the bucket — no global winner set is ever broadcast), then
    survivors regrouped by doc for ordered reassembly. Docs whose every
    chunk was seen earlier disappear (SQL inner-join semantics)."""
    from .relational import bucketed_map_groups
    CH = 25
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def chunks(b: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, chs = [], [], []
        for did, t in zip(b["doc_id"], b["text"]):
            words = t.split(" ")       # matches SQL string_split exactly
            for i in range((len(words) + CH - 1) // CH):
                ids.append(did)
                idxs.append(i)
                chs.append(" ".join(words[i * CH:(i + 1) * CH]))
        return pd.DataFrame({
            "doc_id": pd.array(ids, dtype="int64"),
            "chunk_idx": pd.array(idxs, dtype="int64"),
            "chunk": chs,
        })

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["chunk", "doc_id", "chunk_idx"],
                          kind="mergesort")
        return g.drop_duplicates("chunk", keep="first")

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("chunk_idx", kind="mergesort")
        gg = g.groupby("doc_id", sort=False)
        return pd.DataFrame({
            "dedup_text": gg["chunk"].agg(" ".join),
            "n_kept": gg.size().astype("int64"),
        }).reset_index()

    chunk_ds = ds.map_batches(chunks, batch_format="pandas")
    kept = bucketed_map_groups(chunk_ds, ["chunk"], keep_first)
    out = bucketed_map_groups(kept, ["doc_id"], reassemble).to_pandas()
    return (out[["doc_id", "dedup_text", "n_kept"]]
            .sort_values("doc_id").reset_index(drop=True))


def lineitem_join_sample(sf_dir: str) -> pd.DataFrame:
    """Weighted sampling pushed BELOW a join (the streaming
    sampling-over-joins optimization): a price-weighted sample of the
    orders x lineitem join is taken by sampling ONLY the lineitem side
    (the weight lives there and the FK join is key-preserving: every
    lineitem matches exactly one order), then joining just the k
    winners to orders via broadcast — the full join is never computed.
    The oracle samples the materialized join with the identical
    deterministic keys, proving the pushdown is exact."""
    from .relational import broadcast_join
    from .stages.sketches import weighted_sample
    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_linenumber", "l_extendedprice"])

    def add_key(b: pd.DataFrame) -> pd.DataFrame:
        # composite id: (orderkey, linenumber) packed into one int64,
        # mirrored exactly in the oracle SQL
        b = b.copy(deep=False)
        b["li_id"] = (b["l_orderkey"].to_numpy(dtype=np.int64) * 10
                      + b["l_linenumber"].to_numpy(dtype=np.int64))
        return b

    sample = weighted_sample(li.map_batches(add_key, batch_format="pandas"),
                             weight_col="l_extendedprice", id_col="li_id",
                             k=50)
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                           "o_totalprice"])
    import ray.data as rd
    joined = broadcast_join(
        orders.map_batches(
            lambda b: b.rename(columns={"o_orderkey": "l_orderkey"}),
            batch_format="pandas"),
        sample.drop(columns="li_id"), on="l_orderkey").to_pandas()
    return (joined[["l_orderkey", "l_linenumber", "l_extendedprice",
                    "o_orderdate", "o_totalprice"]]
            .sort_values(["l_orderkey", "l_linenumber"])
            .reset_index(drop=True))


def docs_commonness(sf_dir: str) -> pd.DataFrame:
    """Corpus-statistic document scoring (the unigram-LM quality-filter
    analog, kept in exact integer arithmetic so it is bit-oracle-able):
    pass 1 computes global token counts distributed (partial counts per
    batch, bucketed combine); pass 2 broadcasts the frequency table and
    scores each doc as the average global count of its tokens —
    boilerplate-/stopword-heavy docs score high, rare-vocab docs low.
    At web scale the broadcast table is the top-V vocabulary with a
    default count for the long tail."""
    import ray

    from .relational import bucketed_map_groups
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def tok_partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b["text"].str.split(" ").explode()
        vc = ex.value_counts()
        return pd.DataFrame({"token": vc.index, "c": vc.to_numpy()})

    counts = bucketed_map_groups(
        ds.map_batches(tok_partial, batch_format="pandas"), ["token"],
        lambda g: g.groupby("token", as_index=False, sort=False)["c"].sum()
    ).to_pandas()
    # broadcast the vocabulary as (sorted 64-bit token hashes, counts)
    # numpy arrays: ray.get of numpy is zero-copy from the object store
    # per task, where a python dict would re-unpickle every entry in
    # every scoring task (measured). Lookup is np.searchsorted; tokens
    # always hit (pass 2 scans the same corpus as pass 1), and 64-bit
    # siphash collisions at vocabulary sizes are negligible (~1e-9).
    th = pd.util.hash_pandas_object(counts["token"],
                                    index=False).to_numpy()
    order = np.argsort(th, kind="stable")
    from .relational import guard_broadcast_bytes
    guard_broadcast_bytes(2 * th.nbytes, "commonness vocabulary",
                          "broadcast the top-V vocabulary with a tail "
                          "default count instead of the full table")
    freq_ref = ray.put((th[order],
                        counts["c"].to_numpy(dtype=np.int64)[order]))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        hs, cs = ray.get(freq_ref)
        toks = b["text"].str.split(" ")
        ex = toks.explode()
        eh = pd.util.hash_pandas_object(ex, index=False).to_numpy()
        pos = np.minimum(np.searchsorted(hs, eh), len(hs) - 1)
        f = pd.Series(cs[pos], index=ex.index)
        sums = f.groupby(level=0).sum()
        n = toks.str.len()
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "n_tokens": n.astype("int64"),
            "sum_freq": sums.reindex(b.index).astype("int64"),
            "avg_token_freq": (sums.reindex(b.index) / n).astype("float64"),
        })

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_bigram_novelty(sf_dir: str) -> pd.DataFrame:
    """Per-document bigram NOVELTY rate — the memorization/template QA
    statistic: the fraction of a doc's adjacent token pairs that occur
    exactly once in the whole corpus (template chrome scores ~0, fresh
    prose ~1). Two passes, integer-exact: (1) distributed corpus
    bigram counts keyed by the 64-bit row hash of the (a, b) pair
    (collisions ~1e-9, same budget as docs_commonness), (2) the
    count==1 hash set broadcast as ONE sorted numpy array (guarded;
    top-V + tail default at web scale) and membership tested by
    searchsorted inside map_batches. Docs with fewer than 2 tokens
    have no bigram and are excluded, mirroring the SQL's len > 1."""
    import ray

    from .relational import grouped_agg_ds, guard_broadcast_bytes
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def _pairs(b: pd.DataFrame):
        toks = b["text"].str.findall(r"\S+")
        lens = toks.str.len().to_numpy(dtype=np.int64)
        if int(lens.sum()) == 0:
            return None
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in toks.to_numpy()])
        ends = np.cumsum(lens)
        valid = np.ones(max(len(flat) - 1, 0), dtype=bool)
        # cross-document seams; empty leading docs give end=0 -> -1,
        # which must not wrap to the last pair
        seams = ends[:-1] - 1
        seams = seams[(seams >= 0) & (seams < len(valid))]
        valid[seams] = False
        a = flat[:-1][valid]
        b2 = flat[1:][valid]
        h = pd.util.hash_pandas_object(
            pd.DataFrame({"a": a, "b": b2}), index=False).to_numpy()
        docs = np.repeat(b["doc_id"].to_numpy(dtype=np.int64),
                         np.maximum(lens - 1, 0))
        return h, docs

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        p = _pairs(b)
        if p is None:
            return pd.DataFrame({"ph": pd.array([], dtype="uint64"),
                                 "c": pd.array([], dtype="int64")})
        h, _ = p
        vc = pd.Series(h).value_counts()
        return pd.DataFrame({"ph": vc.index.to_numpy(),
                             "c": vc.to_numpy()})

    counts = grouped_agg_ds(
        ds.map_batches(count_partial, batch_format="pandas"),
        ["ph"], {"c": ("sum", "c")})
    def _novel_of(b: pd.DataFrame) -> pd.DataFrame:
        if "ph" not in b.columns:     # an all-empty combine bucket
            return pd.DataFrame({"ph": pd.array([], dtype="uint64")})
        return b.loc[b["c"] == 1, ["ph"]]

    novel_pdf = (counts.map_batches(_novel_of, batch_format="pandas")
                 .to_pandas())
    novel = (novel_pdf["ph"].to_numpy() if "ph" in novel_pdf.columns
             else np.empty(0, dtype=np.uint64))
    novel = np.sort(novel)
    guard_broadcast_bytes(novel.nbytes, "novel-bigram hash set",
                          "broadcast only the top-V frequent-pair "
                          "table and treat the unseen tail as novel")
    novel_ref = ray.put(novel)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        p = _pairs(b)
        if p is None:
            return pd.DataFrame({
                "doc_id": pd.array([], dtype="int64"),
                "n_bigrams": pd.array([], dtype="int64"),
                "n_novel": pd.array([], dtype="int64"),
                "novelty_rate": pd.array([], dtype="float64")})
        h, docs = p
        nv = ray.get(novel_ref)
        if len(nv) == 0:        # corpus with no unique pair at all
            is_novel = np.zeros(len(h), dtype=bool)
        else:
            pos = np.searchsorted(nv, h)
            is_novel = (pos < len(nv)) \
                & (nv[np.minimum(pos, len(nv) - 1)] == h)
        g = pd.DataFrame({"doc_id": docs,
                          "one": np.int64(1),
                          "nov": is_novel.astype(np.int64)}) \
            .groupby("doc_id", as_index=False, sort=False).sum()
        g = g.rename(columns={"one": "n_bigrams", "nov": "n_novel"})
        g["novelty_rate"] = (g["n_novel"].to_numpy(dtype=np.float64)
                             * 1.0
                             / g["n_bigrams"].to_numpy(dtype=np.float64))
        return g.astype({"doc_id": "int64", "n_bigrams": "int64",
                         "n_novel": "int64"})

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _heavy_partkeys(sf_dir: str) -> set:
    """Distinct partkeys appearing in a quantity > 49 lineitem (the
    shared probe-key set for the semi/anti join pair)."""
    li = read_table(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    heavy = distinct(
        li.map_batches(lambda b: b[b["l_quantity"] > 49][["l_partkey"]],
                       batch_format="pandas"),
        ["l_partkey"])
    return set(heavy["l_partkey"])


def tpch_fk_audit(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity AUDIT across the schema's FK graph — the
    ingest-gate check a warehouse runs before trusting joins: for each
    child->parent edge, how many child rows reference a missing
    parent. Each edge is a distributed distinct of the child key
    column (per-batch unique partial) anti-joined against the parent
    key set; dimension parents broadcast, the lineitem->orders edge
    counts orphan KEYS (bounded by distinct cardinality) the same way.
    All counts integer-exact."""
    from .relational import distinct_ds

    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    rows = []
    for child, ck, parent, pk in edges:
        # two consumers (orphan scan + count): pin the distinct once
        child_keys = distinct_ds(read_table(sf_dir, child, [ck]),
                                 [ck]).materialize()
        parent_keys = set(
            distinct(read_table(sf_dir, parent, [pk]), [pk])[pk])
        orphans = child_keys.map_batches(
            lambda b, ck=ck, pks=parent_keys:
            pd.DataFrame({"k": [int((~b[ck].isin(pks)).sum())]}),
            batch_format="pandas").to_pandas()["k"].sum()
        rows.append({"fk_edge": f"{child}.{ck}->{parent}.{pk}",
                     "n_child_keys": None,  # filled below
                     "n_orphan_keys": int(orphans)})
        rows[-1]["n_child_keys"] = int(child_keys.count())
    return (pd.DataFrame(rows)
            .astype({"n_child_keys": "int64", "n_orphan_keys": "int64"})
            .sort_values("fk_edge").reset_index(drop=True))


def parts_anti_join(sf_dir: str) -> pd.DataFrame:
    """Anti join via broadcast key set: parts never shipped in a
    quantity > 49 lineitem."""
    from .relational import anti_join
    parts = read_table(sf_dir, "part", ["p_partkey", "p_name"])
    out = anti_join(parts, _heavy_partkeys(sf_dir), on="p_partkey").to_pandas()
    return out.sort_values("p_partkey").reset_index(drop=True)


def parts_semi_join(sf_dir: str) -> pd.DataFrame:
    """Semi join via broadcast key set: parts that DO appear in a
    quantity > 49 lineitem."""
    from .relational import semi_join
    parts = read_table(sf_dir, "part", ["p_partkey", "p_name"])
    out = semi_join(parts, _heavy_partkeys(sf_dir), on="p_partkey").to_pandas()
    return out.sort_values("p_partkey").reset_index(drop=True)


def events_props_stats(sf_dir: str) -> pd.DataFrame:
    """JSON scalar extraction (F8 analog) at dataset level: parse the
    open-schema props column per batch (orjson-less stdlib json is the
    per-row cost; the groupby is the usual partial+final)."""
    import json as _json
    ds = read_table(sf_dir, "events", ["event_type", "props"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        ks = [int(_json.loads(p)["k"]) for p in b["props"]]
        return pd.DataFrame({"event_type": b["event_type"].values,
                             "k": pd.array(ks, dtype="int64")})

    g = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                    ["event_type"], {"n": ("count", None),
                                     "sum_k": ("sum", "k"),
                                     "max_k": ("max", "k")})
    out = g[["event_type", "n"]].copy()
    out["sum_k"] = g["sum_k"].astype("int64")
    out["max_k"] = g["max_k"].astype("int64")
    out["avg_k"] = _d(g["sum_k"]) / g["n"]
    return out.sort_values("event_type").reset_index(drop=True)


def _type_cents_hist(sf_dir: str) -> pd.DataFrame:
    """The shared (event_type, v_c) -> cnt int-cents value histogram
    behind the order-statistics family (median, quantiles, MAD,
    winsorized stats): ONE partial-agg groupby whose cardinality is
    bounded by distinct cent values per type, not corpus rows — a
    change to cent rounding or histogram semantics lands in all four
    consumers at once."""
    ds = read_table(sf_dir, "events", ["event_type", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": b["event_type"].values,
                             "v_c": _cents(b["value"])})

    return grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                       ["event_type", "v_c"], {"cnt": ("count", None)})


def events_median_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact distributed median per event_type WITHOUT a global sort:
    the 2-decimal values collapse to an int-cents histogram
    ((type, value_c) -> count, cardinality bounded by distinct values,
    not rows) via partial-agg groupby; the order statistics come from
    the tiny cumulative histogram. Integer arithmetic end-to-end, so
    the result is bit-equal to the SQL window-function oracle."""
    hist = _type_cents_hist(sf_dir)
    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("v_c")
        counts = g["cnt"].to_numpy()
        values = g["v_c"].to_numpy()
        n = int(counts.sum())
        cum = counts.cumsum()
        lo_rank = (n - 1) // 2          # floor((n-1)/2)
        hi_rank = n // 2                # ceil((n-1)/2)
        lo = int(values[np.searchsorted(cum, lo_rank + 1)])
        hi = int(values[np.searchsorted(cum, hi_rank + 1)])
        rows.append({"event_type": etype,
                     "median_value": float(lo + hi) / 2.0 / 100.0})
    return pd.DataFrame(rows).reset_index(drop=True)


def events_winsorized_stats(sf_dir: str) -> pd.DataFrame:
    """WINSORIZED (p5/p95-clipped) per-type statistics — the robust
    aggregation used to keep long-tail outliers from dominating spend
    metrics: cut values by exact rank (0-based rank (n-1)*k//100, the
    'lower' discrete quantile), every value clipped into [lo, hi],
    then clipped sum and clip counts. ONE distributed pass builds the
    same int-cents value histogram as the median/quantile family;
    cuts, clipped sums and counts all derive from that histogram
    driver-side (cardinality = distinct cent values per type, the
    documented median bound) — no second pass over the corpus.
    All-integer surface, DuckDB-mirrored rank arithmetic."""
    hist = _type_cents_hist(sf_dir)
    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("v_c")
        counts = g["cnt"].to_numpy(np.int64)
        values = g["v_c"].to_numpy(np.int64)
        n = int(counts.sum())
        cum = counts.cumsum()
        # value at 0-based rank r: first histogram row whose
        # cumulative count exceeds r
        lo = int(values[np.searchsorted(cum, (n - 1) * 5 // 100,
                                        side="right")])
        hi = int(values[np.searchsorted(cum, (n - 1) * 95 // 100,
                                        side="right")])
        clipped = np.clip(values, lo, hi)
        rows.append({
            "event_type": etype,
            "n_events": n,
            "lo_c": lo, "hi_c": hi,
            "wsum_c": int((clipped * counts).sum()),
            "n_clip_lo": int(counts[values < lo].sum()),
            "n_clip_hi": int(counts[values > hi].sum())})
    cols = ["event_type", "n_events", "lo_c", "hi_c", "wsum_c",
            "n_clip_lo", "n_clip_hi"]
    if not rows:
        out = {"event_type": pd.array([], dtype=str)}
        out.update({c: pd.array([], dtype="int64")
                    for c in cols[1:]})
        return pd.DataFrame(out)
    return pd.DataFrame(rows)[cols].astype(
        {c: "int64" for c in cols[1:]})


def events_quantiles_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact distributed quantiles (p25/p50/p75/p95) per event_type
    from the same int-cents histogram as the median — the interpolation
    fraction for q=k/100 is the exact rational ((n-1)*k % 100)/100, so
    the whole computation stays in int64 until two final /100.0 double
    divisions mirrored verbatim in the SQL oracle."""
    hist = _type_cents_hist(sf_dir)
    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("v_c")
        counts = g["cnt"].to_numpy()
        values = g["v_c"].to_numpy()
        n = int(counts.sum())
        cum = counts.cumsum()
        rec = {"event_type": etype}
        for k in (25, 50, 75, 95):
            pos = (n - 1) * k
            rank_lo, f100 = pos // 100, pos % 100
            rank_hi = rank_lo if f100 == 0 else rank_lo + 1
            lo = int(values[np.searchsorted(cum, rank_lo + 1)])
            hi = int(values[np.searchsorted(cum, rank_hi + 1)])
            rec[f"p{k}"] = float(lo * (100 - f100) + hi * f100) / 100.0 / 100.0
        rows.append(rec)
    return pd.DataFrame(rows).reset_index(drop=True)


def events_value_mad_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact median-absolute-deviation per event_type — the robust
    dispersion statistic quality-gating pipelines use where stddev is
    skew-poisoned. BOTH medians (the center and the deviation median)
    come from the SAME cardinality-bounded int-cents histogram, so the
    data is scanned once and the second median costs no shuffle at all:
    the deviation histogram is a driver-side relabeling
    (dev_hc = |2*v_c - med_hc|, half-cent units keep the possibly-.5
    median integral) of the tiny (type, value) -> count table.
    Integer arithmetic until two final exact float divisions, mirrored
    verbatim in the SQL oracle."""
    hist = _type_cents_hist(sf_dir)

    def _hist_median_x2(values: np.ndarray, counts: np.ndarray) -> int:
        """2x the continuous median of a sorted int histogram (exact
        int: lo + hi order statistics)."""
        n = int(counts.sum())
        cum = counts.cumsum()
        lo = int(values[np.searchsorted(cum, (n - 1) // 2 + 1)])
        hi = int(values[np.searchsorted(cum, n // 2 + 1)])
        return lo + hi

    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("v_c")
        counts = g["cnt"].to_numpy()
        values = g["v_c"].to_numpy(dtype=np.int64)
        med_hc = _hist_median_x2(values, counts)      # half-cent units
        dev = np.abs(2 * values - med_hc)             # still half-cents
        order = np.argsort(dev, kind="stable")
        dev_s, cnt_s = dev[order], counts[order]
        # collapse duplicate deviation labels (v below and above the
        # median can map to the same |dev|)
        uniq, start = np.unique(dev_s, return_index=True)
        sums = np.add.reduceat(cnt_s, start)
        mad_x2_hc = _hist_median_x2(uniq, sums)
        rows.append({"event_type": etype,
                     "mad_value": float(mad_x2_hc) / 2.0 / 200.0})
    return pd.DataFrame(rows).reset_index(drop=True)


def events_approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct-count sketch (p=12, ~1.6% stderr) with a
    BOUNDS ORACLE: the output carries the exact distinct count
    (computed distributed, matched bit-exact against DuckDB) plus a
    within-5%% assertion on the sketch — so the driver's hash compare
    validates both the exact path and the sketch's error bound instead
    of recording `no_oracle`."""
    from .stages.sketches import approx_distinct
    ds = read_table(sf_dir, "events", ["user_id"])
    approx = approx_distinct(ds, "user_id")
    exact = len(distinct(ds, ["user_id"]))
    return pd.DataFrame({
        "exact_distinct_users": pd.array([exact], dtype="int64"),
        "within_5pct": pd.array([abs(approx - exact) <= 0.05 * exact],
                                dtype="bool"),
    })


def parts_bloom_prefilter(sf_dir: str) -> pd.DataFrame:
    """Bloom semi-join prefilter with a BOUNDS ORACLE: the exact kept
    count is computed via an independent broadcast semi join (matched
    bit-exact against DuckDB), and `bloom_contains_all` asserts the
    no-false-negative invariant — every exact-match row survived the
    Bloom prefilter. The fp overshoot is asserted in-engine (65536 bits
    over ~900 keys -> fp ~1e-9)."""
    from .stages.sketches import bloom_from_dataset, bloom_semi_join
    import ray
    import ray.data as rd
    heavy = sorted(_heavy_partkeys(sf_dir))
    bloom = bloom_from_dataset(
        rd.from_pandas(pd.DataFrame({"k": pd.array(heavy, dtype="int64")})),
        "k", n_bits=1 << 16)
    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    from .relational import guard_broadcast_bytes
    guard_broadcast_bytes(len(heavy) * 64, "bloom-oracle exact key set",
                          "the Bloom filter alone is the scale path; "
                          "drop the exact-comparison side")
    heavy_ref = ray.put(frozenset(heavy))

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        in_heavy = batch["k"].isin(ray.get(heavy_ref))
        return pd.DataFrame({"bloom_rows": [len(batch)],
                             "exact_in_kept": [int(in_heavy.sum())]})

    kept_counts = (bloom_semi_join(li.rename_columns({"l_partkey": "k"}),
                                   bloom, on="k")
                   .map_batches(counts, batch_format="pandas").to_pandas())
    bloom_rows = int(kept_counts["bloom_rows"].sum())
    exact_in_kept = int(kept_counts["exact_in_kept"].sum())

    # independent exact count straight off the lineitem scan
    exact_counts = li.map_batches(
        lambda b: pd.DataFrame(
            {"n": [int(b["l_partkey"].isin(ray.get(heavy_ref)).sum())]}),
        batch_format="pandas").to_pandas()
    exact_rows = int(exact_counts["n"].sum())

    fp_rate = (bloom_rows - exact_in_kept) / max(1, bloom_rows)
    assert fp_rate < 0.01, f"bloom fp rate {fp_rate} out of bounds"
    return pd.DataFrame({
        "exact_rows": pd.array([exact_rows], dtype="int64"),
        "bloom_contains_all": pd.array([exact_in_kept == exact_rows],
                                       dtype="bool"),
    })


def events_median_sketch(sf_dir: str) -> pd.DataFrame:
    """Bottom-k sample sketch (mergeable deterministic min-hash-k
    sample, stages.sketches.bottomk_sample) estimating the per-type
    median, with a BOUNDS ORACLE: the emitted median is the exact
    distributed-histogram value (bit-equal to the SQL window oracle)
    and `sketch_within_10pct` asserts the k=4096 sample's estimate
    lands within 10% relative error."""
    from .stages.sketches import bottomk_sample, sample_quantile
    exact = events_median_by_type(sf_dir)
    ds = read_table(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_id": b["event_id"].values,
                             "event_type": b["event_type"].values,
                             "v_c": _cents(b["value"])})

    sample = bottomk_sample(ds.map_batches(prep, batch_format="pandas"),
                            value_col="v_c", id_col="event_id",
                            group_col="event_type", k=4096)
    ok = []
    for etype, med in zip(exact["event_type"], exact["median_value"]):
        est = sample_quantile(
            sample.loc[sample["g"] == etype, "v"].to_numpy(), 0.5) / 100.0
        ok.append(abs(est - med) <= 0.10 * abs(med) + 0.02)
    out = exact.copy()
    out["sketch_within_10pct"] = pd.array(ok, dtype="bool")
    return out


def events_weighted_sample(sf_dir: str) -> pd.DataFrame:
    """Value-weighted sample of 100 events without replacement
    (stages.sketches.weighted_sample): higher-value events
    proportionally more likely, yet fully deterministic and
    SQL-reproducible — the oracle computes the identical
    -ln(hash-u)/weight keys and takes the same bottom-k."""
    from .stages.sketches import weighted_sample
    ds = read_table(sf_dir, "events", ["event_id", "user_id", "value"])
    out = weighted_sample(ds, weight_col="value", id_col="event_id", k=100)
    return (out[["event_id", "user_id", "value"]]
            .sort_values("event_id").reset_index(drop=True))


def events_distinct_types(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "events", ["event_type"])
    return distinct(ds, ["event_type"]).sort_values(
        "event_type").reset_index(drop=True)


def events_dedup_user_type(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "events", ["user_id", "event_type"])
    return (distinct(ds, ["user_id", "event_type"])
            .sort_values(["user_id", "event_type"]).reset_index(drop=True))


# ---------------------------------------------------------------- documents

def docs_token_counts(sf_dir: str) -> pd.DataFrame:
    from .stages.text_analysis import token_count_batch
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return (ds.map_batches(token_count_batch, batch_format="pandas")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def docs_length_buckets(sf_dir: str) -> pd.DataFrame:
    """Sequence-length bucketing (8 exact octile buckets over n_chars)
    with per-bucket padding-waste accounting — the batching-efficiency
    op an LLM data pipeline runs before padding fixed-shape batches.
    The octile thresholds are EXACT quantile_cont order statistics
    computed from the cardinality-bounded value histogram in
    eighth-units (t_e8 = v_lo*(8-f8) + v_hi*f8 stays int64), bucket
    membership is count(8*x > t_e8) via one broadcast searchsorted,
    and waste = n*max - sum per bucket — integer arithmetic end to
    end, mirrored term-for-term in the oracle."""
    ds = read_table(sf_dir, "documents", ["doc_id", "n_chars"])
    hist = (grouped_agg(ds, ["n_chars"], {"cnt": ("count", None)})
            .sort_values("n_chars").reset_index(drop=True))
    counts = hist["cnt"].to_numpy(dtype=np.int64)
    values = hist["n_chars"].to_numpy(dtype=np.int64)
    n = int(counts.sum())
    cum = counts.cumsum()
    ths = []
    for i in range(1, 8):
        h8 = (n - 1) * i                      # rank in eighth-units
        lo_rank, f8 = divmod(h8, 8)
        hi_rank = lo_rank + (1 if f8 else 0)
        v_lo = int(values[np.searchsorted(cum, lo_rank + 1)])
        v_hi = int(values[np.searchsorted(cum, hi_rank + 1)])
        ths.append(v_lo * (8 - f8) + v_hi * f8)
    th = np.sort(np.array(ths, dtype=np.int64))

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        x = b["n_chars"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "bucket": np.searchsorted(th, 8 * x, side="left")
            .astype(np.int64),
            "n_chars": x})

    agg = grouped_agg(ds.map_batches(bucketize, batch_format="pandas"),
                      ["bucket"], {"n_docs": ("count", None),
                                   "max_chars": ("max", "n_chars"),
                                   "sum_chars": ("sum", "n_chars")})
    agg["padding_waste"] = (agg["n_docs"].to_numpy(dtype=np.int64)
                            * agg["max_chars"].to_numpy(dtype=np.int64)
                            - agg["sum_chars"].to_numpy(dtype=np.int64))
    return (agg[["bucket", "n_docs", "max_chars", "padding_waste"]]
            .astype({"bucket": "int64", "n_docs": "int64",
                     "max_chars": "int64", "padding_waste": "int64"})
            .sort_values("bucket").reset_index(drop=True))


def docs_pack_sequences(sf_dir: str) -> pd.DataFrame:
    """Token-budget sequence packing (split-allowed streaming packing
    for LLM pretraining shards): documents in doc_id order fill fixed
    512-token sequences; each doc is assigned (seq_id, seq_offset) =
    divmod(exclusive running token count, 512). The running count is
    the engine's ordered-scan primitive
    (relational.ordered_exclusive_cumsum): value-range partition +
    per-range prefix broadcast, no global sort, driver holds n_ranges
    scalars. SQL-window-oracle exact."""
    from .relational import ordered_exclusive_cumsum
    from .stages.text_analysis import token_count_batch
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    toks = ds.map_batches(
        lambda b: token_count_batch(b)[["doc_id", "n_tokens"]],
        batch_format="pandas")
    packed = ordered_exclusive_cumsum(toks, order_col="doc_id",
                                      value_col="n_tokens")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        cum = b["cum"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "n_tokens": b["n_tokens"].to_numpy(dtype=np.int64),
            "seq_id": cum // 512,
            "seq_offset": cum % 512,
        })

    return (packed.map_batches(finish, batch_format="pandas")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def docs_incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """Two-wave incremental near-dup dedup over documents (the
    production wave-at-a-time shape): wave 0 = even doc_ids, indexed
    (band rows + signatures persisted to parquet); wave 1 = odd
    doc_ids PLUS exact copies of every doc_id % 4 == 0 doc under
    shifted ids. History wins: the copies must drop against the index
    without re-reading wave-0 texts; wave-1 near-dup clusters keep
    their min id. Rows-only check (the cross-wave verifier is the
    128-lane MinHash signature estimate, not SQL-expressible)."""
    import shutil
    import tempfile

    from .stages.incremental import incremental_dedup_wave
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    w0 = ds.map_batches(lambda b: b[b["doc_id"] % 2 == 0],
                        batch_format="pandas")

    def shifted_copies(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"] % 4 == 0].copy()
        b["doc_id"] = b["doc_id"] + 10_000_000
        return b

    w1 = (ds.map_batches(lambda b: b[b["doc_id"] % 2 == 1],
                         batch_format="pandas")
          .union(ds.map_batches(shifted_copies, batch_format="pandas")))
    idx = tempfile.mkdtemp(prefix="incdedup_")
    try:
        incremental_dedup_wave(w0, idx, wave=0, threshold=0.7)
        r = incremental_dedup_wave(w1, idx, wave=1, threshold=0.7)
        kept = r["kept"].to_pandas()
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return (kept.sort_values("doc_id").reset_index(drop=True)
            .astype({"doc_id": "int64"}))


def docs_source_lang_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP over (source, lang): doc counts and exact char sums at
    all three levels — the corpus-composition report a training-mix
    designer reads first. One distributed aggregation at the finest
    level; the coarser levels re-sum its cardinality-bounded result
    (int64 char sums re-sum exactly). GROUPING flags disambiguate
    rolled-up NULLs."""
    ds = read_table(sf_dir, "documents", ["source", "lang", "n_chars"])
    fine = grouped_agg(ds, ["source", "lang"],
                       {"n_docs": ("count", None),
                        "s": ("sum", "n_chars")})

    def lvl(df, g_lang, g_src):
        return pd.DataFrame({
            "source": (df["source"] if not g_src
                       else pd.Series([None] * len(df), dtype="object")),
            "lang": (df["lang"] if not g_lang
                     else pd.Series([None] * len(df), dtype="object")),
            "n_docs": df["n_docs"].astype("int64").to_numpy(),
            "sum_chars": df["s"].astype("int64").to_numpy(),
            "g_lang": np.int64(g_lang), "g_source": np.int64(g_src)})

    by_src = (fine.groupby("source", sort=False)
              .agg(n_docs=("n_docs", "sum"), s=("s", "sum"))
              .reset_index())
    total = pd.DataFrame({"source": [None],
                          "n_docs": [fine["n_docs"].sum()],
                          "s": [fine["s"].sum()]})
    out = pd.concat([lvl(fine, 0, 0), lvl(by_src, 1, 0),
                     lvl(total, 1, 1)], ignore_index=True)
    return (out.astype({"n_docs": "int64", "sum_chars": "int64",
                        "g_lang": "int64", "g_source": "int64"})
            .sort_values(["g_source", "g_lang", "source", "lang"],
                         na_position="first")
            .reset_index(drop=True))


def events_user_spend_cume(sf_dir: str) -> pd.DataFrame:
    """Per-user spend CUME_DIST — the percentile-rank curve behind
    'top-X%% users' cuts: per-user exact-cents totals (one distributed
    aggregation), then the cumulative distribution computed from the
    cardinality-bounded per-user result as exact rational
    rank/n (bit-equal to the SQL window)."""
    ds = read_table(sf_dir, "events", ["user_id", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": b["user_id"].values,
                             "v_c": _cents(b["value"])})

    g = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                    ["user_id"], {"s": ("sum", "v_c")})
    g = g.sort_values(["s", "user_id"]).reset_index(drop=True)
    n = len(g)
    s = g["s"].to_numpy(dtype=np.int64)
    # CUME_DIST = (# rows with value <= current) / n — ties share the
    # highest rank of their run
    hi = np.searchsorted(s, s, side="right")
    g["total_spend"] = _d(g["s"]) / 100.0
    g["cume_dist"] = hi.astype(np.float64) / float(n)
    return (g[["user_id", "total_spend", "cume_dist"]]
            .astype({"user_id": "int64"})
            .sort_values("user_id").reset_index(drop=True))


def docs_cap_per_source(sf_dir: str) -> pd.DataFrame:
    """Per-key document cap (crawl curation: keep at most K docs per
    source domain, preferring longer docs, ties to the smaller id).
    The per-batch partial already enforces the cap, so at most K rows
    per (source, input block) enter the shuffle — the grouped-top-k
    combiner pattern; one bucketed final applies the identical rank.
    SQL oracle: ROW_NUMBER() window."""
    from .relational import bucketed_map_groups
    K = 3
    ds = read_table(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "n_chars", "doc_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.groupby("source", sort=False, observed=True).head(K)

    partial = ds.map_batches(topn, batch_format="pandas")
    out = bucketed_map_groups(partial, ["source"], topn).to_pandas()
    return (out[["doc_id", "source", "n_chars"]]
            .sort_values("doc_id").reset_index(drop=True))


def docs_temperature_mix(sf_dir: str) -> pd.DataFrame:
    """TEMPERATURE-SAMPLED source mixing (the multilingual-LLM
    rebalancing op: sample source s in proportion to n_s^alpha,
    alpha=0.7, so heavy sources are down-weighted and light ones
    up-weighted). Per-source quotas come from the tiny source-count
    aggregate (k_s = floor(budget * n_s^0.7 / sum n^0.7), float
    expression mirrored term for term in SQL); membership is the
    deterministic multiplicative-hash rank WITHIN source — the same
    SQL-reproducible key as docs_shuffle_order — computed distributed
    via per-batch per-source bottom-k partials (k varies per source,
    broadcast as a dict) and one bucketed final. Every piece is exact,
    so the sampled id set is bit-equal to the SQL window oracle."""
    import ray

    from .relational import bucketed_map_groups, guard_broadcast_bytes
    BUDGET = 200
    ALPHA = 0.7
    ds = read_table(sf_dir, "documents", ["doc_id", "source"])
    counts = grouped_agg(ds, ["source"], {"n": ("count", None)})
    counts = counts.sort_values("source").reset_index(drop=True)
    w = np.power(counts["n"].to_numpy(dtype=np.float64), ALPHA)
    quota = np.floor(BUDGET * (w / w.sum())).astype(np.int64)
    # a source's quota never exceeds its size (alpha < 1 guarantees
    # it only when the budget is <= total; floor keeps us safe here)
    quota = np.minimum(quota, counts["n"].to_numpy(dtype=np.int64))
    kmap = dict(zip(counts["source"], quota))
    guard_broadcast_bytes(64 * len(kmap), "temperature quota map",
                          "co-partition the quota attach by source")
    ref = ray.put(kmap)

    def keyed_topk(b: pd.DataFrame) -> pd.DataFrame:
        km = ray.get(ref)
        b = b.copy(deep=False)
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(4294967296)
        b["__h"] = h.astype(np.int64)
        b = b.sort_values(["source", "__h", "doc_id"], kind="mergesort")
        g = b.groupby("source", sort=False, observed=True)
        b["__r"] = g.cumcount()
        kk = b["source"].map(km).fillna(0).to_numpy(dtype=np.int64)
        return b[b["__r"].to_numpy() < kk].drop(columns="__r")

    partial = ds.map_batches(keyed_topk, batch_format="pandas")
    out = bucketed_map_groups(partial, ["source"],
                              keyed_topk).to_pandas()
    return (out[["doc_id", "source"]].astype({"doc_id": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


def docs_token_budget_mix(sf_dir: str) -> pd.DataFrame:
    """TOKEN-budget temperature mixing — the variant of
    docs_temperature_mix a pretraining run actually schedules by:
    per-source budgets are allocated over TOKEN mass, not document
    count (budget_s = floor(TOTAL * toks_s^0.7 / sum toks^0.7)), and
    docs are admitted in deterministic multiplicative-hash order until
    each source's token budget is exhausted (the boundary-crossing doc
    is kept — greedy admission, so a source whose budget covers it
    keeps every doc).

    Scale shape: NO global sort and never a whole source in one task.
    One skinny pass computes (n_tok, hash, hash-range); per-(source,
    range) token sums are a cardinality-bounded aggregate whose
    driver-side exclusive prefix (n_sources x 16 scalars — the
    ordered-scan primitive of docs_pack_sequences, partitioned by
    source) broadcasts with the budget map; one bucketed shuffle on
    (source, range) then admits locally: local hash-order cumsum plus
    the range's offset, compare against the budget. Every piece is
    integer or a term-for-term float mirror, so the admitted id set is
    bit-equal to the SQL window oracle."""
    import ray

    from .relational import bucketed_map_groups, guard_broadcast_bytes
    TOTAL = 20_000
    ALPHA = 0.7
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "source"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        h = ((ids.astype(np.uint64) * np.uint64(2654435761))
             % np.uint64(4294967296))
        return pd.DataFrame({
            "doc_id": ids,
            "source": b["source"].values,
            "n_tok": b["text"].str.count(r"\S+")
            .to_numpy(dtype=np.int64),
            "h": h.astype(np.int64),
            "rng": (h >> np.uint64(28)).astype(np.int64)})

    # skinny (no text) and feeds two consumers (the range sums and the
    # admission shuffle) — pin per the repo-wide multi-consumer rule
    t = ds.map_batches(prep, batch_format="pandas").materialize()

    sums = grouped_agg(t, ["source", "rng"], {"s": ("sum", "n_tok")})
    sums = sums.sort_values(["source", "rng"]).reset_index(drop=True)
    tot = sums.groupby("source", as_index=False, sort=True)["s"].sum()
    w = np.power(tot["s"].to_numpy(dtype=np.float64), ALPHA)
    tw = float(w.sum())
    if tw <= 0.0:        # every doc empty: nothing admissible
        budget = np.zeros(len(tot), dtype=np.int64)
    else:
        budget = np.floor(TOTAL * (w / tw)).astype(np.int64)
    bmap = dict(zip(tot["source"], budget))
    offs = {}
    for src, grp in sums.groupby("source", sort=False):
        run = 0
        for r, v in zip(grp["rng"], grp["s"]):
            offs[(src, int(r))] = run
            run += int(v)
    guard_broadcast_bytes(96 * len(offs) + 64 * len(bmap),
                          "token-budget offsets + budget map",
                          "raise the range shift / co-partition the "
                          "budget attach by source")
    ref = ray.put((offs, bmap))

    def admit(g: pd.DataFrame) -> pd.DataFrame:
        o, bm = ray.get(ref)
        g = g.sort_values(["source", "rng", "h", "doc_id"],
                          kind="mergesort")
        outs = []
        for (src, r), grp in g.groupby(["source", "rng"], sort=False):
            ntk = grp["n_tok"].to_numpy(dtype=np.int64)
            cum = o[(src, int(r))] + np.cumsum(ntk)
            keep = (cum - ntk) < bm[src]
            outs.append(grp.loc[keep, ["doc_id", "source", "n_tok"]])
        if not outs:
            return g[["doc_id", "source", "n_tok"]]
        return pd.concat(outs, ignore_index=True)

    out = bucketed_map_groups(t, ["source", "rng"], admit).to_pandas()
    if "doc_id" not in out.columns:   # empty corpus: typed empty frame
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                            "source": pd.Series([], dtype=object),
                            "n_tok": pd.Series([], dtype="int64")})
    return (out.astype({"doc_id": "int64", "n_tok": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


def docs_strip_dup_spans(sf_dir: str) -> pd.DataFrame:
    """Cross-document duplicate-SPAN removal (Lee et al. 2022 style):
    every verbatim 8-token window shared by >= 2 documents is stripped
    from all but one globally-elected winner occurrence; unique
    surrounding text survives. Fully distributed — window rows shuffle
    by hash, cuts shuffle by doc — see stages/spans.py. No SQL oracle
    (token-window semantics aren't SQL-expressible); the pytest scalar
    oracle in tests/test_spans.py pins exact semantics."""
    from .stages.spans import strip_duplicate_spans
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    out = strip_duplicate_spans(ds, n=8).to_pandas()
    out["clean_len"] = out["clean_text"].str.len().astype("int64")
    return (out[["doc_id", "n_spans", "chars_removed", "clean_len"]]
            .astype({"doc_id": "int64", "n_spans": "int64",
                     "chars_removed": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


def docs_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: docs with doc_id % 50 == 0 play the
    eval/benchmark corpus; every remaining training doc is scored by
    how many of its verbatim 8-token windows appear anywhere in the
    benchmark set (GPT-3-appendix-C-style n-gram hygiene). Benchmark
    windows broadcast once as a sorted hash array; zero shuffles on
    the training side. DuckDB oracle builds the same windows via
    regexp_extract_all + list slicing."""
    from .stages.spans import contamination_counts
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    bench = ds.map_batches(lambda b: b[b["doc_id"] % 50 == 0],
                           batch_format="pandas")
    train = ds.map_batches(lambda b: b[b["doc_id"] % 50 != 0],
                           batch_format="pandas")
    out = contamination_counts(train, bench, n=8).to_pandas()
    out["contaminated"] = (out["n_overlap"] > 0).astype("int64")
    return (out.astype({"doc_id": "int64", "n_overlap": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


def docs_tfidf_topk(sf_dir: str) -> pd.DataFrame:
    """Per-document top-3 TF-IDF terms (corpus-relative salience —
    the classic quality/topic feature). Composition: per-batch exact
    tf rows (each doc lives in one row), distributed df via
    grouped_agg_ds over the token vocabulary, partitioned hash_join
    tf x df (vocab is NOT assumed driver-small), then the grouped-
    top-k combiner pattern per doc. The raw float score is NOT in the
    verified output: numpy's log and DuckDB's ln differ by 1-3 ulp on
    identical inputs (measured at sf0.01), so the hash-verified
    surface is the exact integers (tf, df) plus the RANKING itself —
    which embeds the score ordinally on both sides."""
    from .relational import bucketed_map_groups, grouped_agg_ds, hash_join
    from .stages.text_analysis import tf_rows_arrow
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    # tf feeds BOTH the df aggregate and the join probe: pin it once
    # so the tokenization pass does not re-execute per consumer.
    # Arrow-native (RE2 split + C++ hash group-by): no pandas object
    # arrays on the tokenization hot path
    tf = ds.map_batches(tf_rows_arrow,
                        batch_format="pyarrow").materialize()
    df = grouped_agg_ds(tf, ["token"], {"df": ("count", None)})
    joined = hash_join(tf, df, on="token")

    K = 3

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy(deep=False)
        g["score"] = (g["tf"].to_numpy(dtype=np.float64)
                      * np.log(float(n_docs)
                               / g["df"].to_numpy(dtype=np.float64)))
        g = g.sort_values(["doc_id", "score", "token"],
                          ascending=[True, False, True],
                          kind="mergesort")
        return g.groupby("doc_id", sort=False).head(K)

    partial = joined.map_batches(topk, batch_format="pandas")
    out = bucketed_map_groups(partial, ["doc_id"], topk).to_pandas()
    return (out[["doc_id", "token", "tf", "df"]]
            .astype({"doc_id": "int64", "tf": "int64", "df": "int64"})
            .sort_values(["doc_id", "token"]).reset_index(drop=True))


def docs_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """Per-document top-3 BM25 terms (k1=1.2, b=0.75) — the IR-grade
    salience scorer that adds document-length normalization on top of
    TF-IDF. Same distributed shape as docs_tfidf_topk (tf rows ->
    vocab df via grouped_agg_ds -> partitioned joins; nothing assumes
    a driver-small vocabulary) plus a per-doc length join. As with
    TF-IDF, ln() differs from DuckDB by ulps, so the verified surface
    is the exact integers (tf, df, dl) and the top-3 MEMBERSHIP under
    (score desc, token asc) ranking, mirrored expression-for-
    expression in the oracle so both sides evaluate the identical
    IEEE double tree."""
    from .relational import bucketed_map_groups, grouped_agg_ds, hash_join
    from .stages.text_analysis import tf_rows_arrow
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    tf = ds.map_batches(tf_rows_arrow,
                        batch_format="pyarrow").materialize()
    df = grouped_agg_ds(tf, ["token"], {"df": ("count", None)})
    n_toks = int(tf.map_batches(
        lambda b: pd.DataFrame({"s": [b["tf"].sum()]}),
        batch_format="pandas").to_pandas()["s"].sum())
    # one join attaches df (vocabulary-keyed — never assumed
    # driver-small); the doc-length attach needs NO join at all: the
    # per-doc bucket below holds every (doc, token, tf) row of its
    # docs, so dl is a groupby-sum inside the same shuffle that the
    # top-k combine already pays
    joined = hash_join(tf, df, on="token")

    K = 3
    avgdl = float(n_toks) / float(n_docs)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy(deep=False)
        g["dl"] = g.groupby("doc_id", sort=False)["tf"].transform("sum")
        tfv = g["tf"].to_numpy(dtype=np.float64)
        dfv = g["df"].to_numpy(dtype=np.float64)
        dlv = g["dl"].to_numpy(dtype=np.float64)
        idf = np.log((float(n_docs) - dfv + 0.5) / (dfv + 0.5) + 1.0)
        g["score"] = idf * (tfv * 2.2) \
            / (tfv + 1.2 * (0.25 + 0.75 * (dlv / avgdl)))
        g = g.sort_values(["doc_id", "score", "token"],
                          ascending=[True, False, True],
                          kind="mergesort")
        return g.groupby("doc_id", sort=False).head(K)

    out = bucketed_map_groups(joined, ["doc_id"], topk).to_pandas()
    return (out[["doc_id", "token", "tf", "df", "dl"]]
            .astype({"doc_id": "int64", "tf": "int64", "df": "int64",
                     "dl": "int64"})
            .sort_values(["doc_id", "token"]).reset_index(drop=True))


def docs_unigram_ce(sf_dir: str) -> pd.DataFrame:
    """Per-document unigram cross-entropy against the corpus's OWN
    unigram LM — the CCNet-style fluency/quality proxy (Wenzek et al.
    2020 rank web documents by LM perplexity; with no external model
    allowed, the corpus-self unigram CE has the same shape: docs made
    of common tokens score low, rare-token docs score high, and the
    score feeds the same quality-gate/temperature-mix stages). Shape:
    ONE Arrow tokenize pass pinned for both consumers, corpus token
    counts via grouped_agg_ds over the vocabulary (never assumed
    driver-small), partitioned hash_join tf x cnt on token, then
    per-doc sufficient statistics (sum tf*ln p, dl) through one more
    grouped_agg_ds — no per-doc Python, no doc-keyed wide shuffle
    beyond the aggregate. ce is rounded to 3dp (np.log and DuckDB ln
    differ by ulps — the established float surface; dl is exact
    int64)."""
    from .relational import grouped_agg_ds, hash_join
    from .stages.text_analysis import tf_rows_arrow
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    tf = ds.map_batches(tf_rows_arrow,
                        batch_format="pyarrow").materialize()
    cnt = grouped_agg_ds(tf, ["token"], {"cnt": ("sum", "tf")})
    sums = tf.map_batches(
        lambda b: pd.DataFrame({"s": [b["tf"].sum()]}),
        batch_format="pandas").to_pandas()
    n_toks = int(sums["s"].sum()) if "s" in sums.columns else 0
    if n_toks == 0:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "dl": pd.array([], dtype="int64"),
                             "ce": pd.array([], dtype="float64")})
    joined = hash_join(tf, cnt, on="token")

    def contrib(b: pd.DataFrame) -> pd.DataFrame:
        tfv = b["tf"].to_numpy(dtype=np.float64)
        p = b["cnt"].to_numpy(dtype=np.float64) / float(n_toks)
        return pd.DataFrame({"doc_id": b["doc_id"].values,
                             "w": tfv * np.log(p),
                             "tf": b["tf"].values})

    per_doc = grouped_agg_ds(
        joined.map_batches(contrib, batch_format="pandas"),
        ["doc_id"], {"sw": ("sum", "w"),
                     "dl": ("sum", "tf")}).to_pandas()
    per_doc["ce"] = np.round(
        -per_doc["sw"].to_numpy(dtype=np.float64)
        / per_doc["dl"].to_numpy(dtype=np.float64), 3)
    return (per_doc[["doc_id", "dl", "ce"]]
            .astype({"doc_id": "int64", "dl": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


def _bigram_nll_per_doc(sf_dir: str, *, per_lang: bool = False):
    """Shared bigram-LM scorer behind docs_bigram_lm_ppl (global LM)
    and docs_ccnet_buckets (one LM PER LANGUAGE, the paper's actual
    shape): P(b|a) = (C(a,b)+1) / (C(a)+V) with C over the corpus (or
    the language's slice), C(a) the bigram-head count and V the
    continuation vocabulary — all derivable from the ONE bigram
    table, so the corpus is tokenized exactly once. Shape: per-batch
    doc-bigram partials (Arrow kernel, lang carried as a group key
    when per_lang) -> corpus bigram stats via grouped_agg_ds (never
    driver-resident) -> head counts fuse into the per-pair log-weight
    in ONE (lang,)a-keyed bucketed pass (vocab-side work, never doc
    rows) -> one partitioned hash_join of doc partials against the
    log-weight on a length-prefix-framed (lang,)a,b key (tokens may
    contain any non-space byte, so 'len(x):x' framing keeps the
    composite key collision-free) -> per-doc sufficient stats through
    grouped_agg_ds. Returns a Dataset of (doc_id[, lang], m, nll) —
    nll rounded 3dp (the docs_unigram_ce float surface), m exact
    int64 — or None for a bigram-less corpus; docs with < 2 tokens
    have no bigram and emit no row, mirroring the SQL."""
    import functools

    from .relational import bucketed_map_groups, grouped_agg_ds, hash_join
    from .stages.text_analysis import bigram_counts_arrow
    lcols = ["lang"] if per_lang else []
    ds = read_table(sf_dir, "documents", ["doc_id", "text"] + lcols)
    rows = ds.map_batches(
        functools.partial(bigram_counts_arrow, out_col="k",
                          id_col=["doc_id"] + lcols),
        batch_format="pyarrow").materialize()
    corpus = grouped_agg_ds(rows, lcols + ["a", "b"],
                            {"cb": ("sum", "k")}).materialize()
    # continuation-vocabulary size V: per language when per_lang (a
    # dict of n_langs scalars in the closure), else one scalar
    if per_lang:
        vf = grouped_agg_ds(
            grouped_agg_ds(corpus, ["lang", "b"],
                           {"_n": ("count", None)}),
            ["lang"], {"v": ("count", None)}).to_pandas()
        vmap = dict(zip(vf["lang"], vf["v"].astype(np.int64)))
        if not vmap:
            return None
    else:
        n_cont = grouped_agg_ds(corpus, ["b"],
                                {"nb": ("count", None)}).count()
        if n_cont == 0:
            return None

    def _frame_key(df: pd.DataFrame) -> pd.Series:
        a = df["a"].astype(str)
        k = a.str.len().astype(str) + ":" + a + df["b"].astype(str)
        if per_lang:
            lg = df["lang"].astype(str)
            k = lg.str.len().astype(str) + ":" + lg + k
        return k

    # head counts fuse into the per-pair log-weight in ONE
    # (lang,)a-keyed bucketed pass (ca is a within-group transform),
    # replacing a grouped_agg_ds + hash_join round trip — same
    # shuffle count as a plain aggregate, and group size is bounded
    # by the continuations of one head token, never the corpus
    def lw_group(df: pd.DataFrame) -> pd.DataFrame:
        ca = (df.groupby(lcols + ["a"], observed=True)["cb"]
              .transform("sum").to_numpy(np.float64))
        v = (df["lang"].map(vmap).to_numpy(np.float64) if per_lang
             else float(n_cont))
        return pd.DataFrame({
            "ab": _frame_key(df),
            "lw": np.log(
                (df["cb"].to_numpy(np.float64) + 1.0) / (ca + v))})

    lwt = bucketed_map_groups(corpus, lcols + ["a"], lw_group)

    def key_rows(b: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": b["doc_id"].values}
        if per_lang:
            out["lang"] = b["lang"].values
        out.update({"ab": _frame_key(b), "k": b["k"].values})
        return pd.DataFrame(out)

    joined = hash_join(
        rows.map_batches(key_rows, batch_format="pandas"), lwt, on="ab")

    def contrib(b: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": b["doc_id"].values}
        if per_lang:
            out["lang"] = b["lang"].values
        out.update({"w": b["k"].to_numpy(np.float64)
                    * b["lw"].to_numpy(np.float64),
                    "k": b["k"].values})
        return pd.DataFrame(out)

    per_doc = grouped_agg_ds(
        joined.map_batches(contrib, batch_format="pandas"),
        ["doc_id"] + lcols, {"sw": ("sum", "w"), "m": ("sum", "k")})

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["nll"] = np.round(
            -b["sw"].to_numpy(np.float64)
            / b["m"].to_numpy(np.float64), 3)
        return b.drop(columns="sw")

    return per_doc.map_batches(fin, batch_format="pandas")


def docs_bigram_lm_ppl(sf_dir: str) -> pd.DataFrame:
    """Per-document CONDITIONAL bigram-LM negative log-likelihood —
    the CCNet perplexity filter (Wenzek et al. 2020) with the corpus's
    own Laplace-smoothed bigram LM standing in for KenLM (no external
    models allowed). The distributed scorer is _bigram_nll_per_doc
    (shared with docs_ccnet_buckets); this surface is the global-LM
    per-doc report."""
    per = _bigram_nll_per_doc(sf_dir, per_lang=False)
    if per is None:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "m": pd.array([], dtype="int64"),
                             "nll": pd.array([], dtype="float64")})
    per_doc = per.to_pandas()
    return (per_doc[["doc_id", "m", "nll"]]
            .astype({"doc_id": "int64", "m": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


def docs_ccnet_buckets(sf_dir: str) -> pd.DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al.
    2020 §3: documents sorted by LM perplexity per language and split
    into three equal parts; head = lowest perplexity). One bigram LM
    per LANGUAGE (the paper trains per-language KenLM models) scores
    every doc via the shared _bigram_nll_per_doc scorer; the bucket
    is NTILE(3) within lang ordered by (nll, doc_id) — computed
    distributed with grouped_global_rank (value-range partition +
    per-(lang, range) prefix scalars, no global sort, no whole-lang
    task), so no stage ever holds a language's corpus in one task.
    Ordering uses the ROUNDED 3dp nll on BOTH sides, so engine and
    DuckDB rank identically (the established float-surface rule);
    doc_id breaks ties."""
    from .relational import grouped_agg_ds, grouped_global_rank
    empty = pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                          "lang": pd.array([], dtype=str),
                          "m": pd.array([], dtype="int64"),
                          "nll": pd.array([], dtype="float64"),
                          "bucket": pd.array([], dtype="int64")})
    per = _bigram_nll_per_doc(sf_dir, per_lang=True)
    if per is None:
        return empty
    per = per.materialize()
    # per-lang doc totals for the NTILE size formula: n_langs scalars
    tot = grouped_agg_ds(per, ["lang"],
                         {"n": ("count", None)}).to_pandas()
    nmap = dict(zip(tot["lang"], tot["n"].astype(np.int64)))
    ranked = grouped_global_rank(per, ["lang"], ["nll", "doc_id"])

    def tile(b: pd.DataFrame) -> pd.DataFrame:
        n = b["lang"].map(nmap).to_numpy(np.int64)
        q, r = n // 3, n % 3
        rn = b["rank"].to_numpy(np.int64)
        big = q + 1
        # SQL NTILE: first n%3 buckets hold q+1 rows, the rest q
        t = np.where(rn < r * big, rn // np.maximum(big, 1) + 1,
                     r + (rn - r * big) // np.maximum(q, 1) + 1)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "lang": b["lang"].values,
            "m": b["m"].to_numpy(np.int64),
            "nll": b["nll"].values,
            "bucket": t.astype(np.int64)})

    out = ranked.map_batches(tile, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_quality_percentile(sf_dir: str) -> pd.DataFrame:
    """Per-language rank-normalized quality calibration: each doc's
    alpha-ratio becomes its percentile WITHIN its language — the
    normalization step curation pipelines apply before a global
    quality threshold, because raw char-class scores are not
    comparable across languages (a fixed alpha-ratio cut keeps
    different quality bands per language; the per-lang percentile
    makes one threshold mean the same thing everywhere). Distributed
    shape: vectorized score kernel -> grouped_global_rank (the
    per-partition ROW_NUMBER primitive: value-range partition +
    per-(lang, range) prefix scalars — no global sort, no whole-lang
    task). The percentile surface is INTEGER milli-percentile
    rank*1000 // (n-1) (0..1000, '//' on both sides), sidestepping
    the ROUND-half mismatch a float rank/(n-1) would hit whenever
    n-1 is a power of two (k/16 = 0.0625 is exact binary: numpy
    rounds half-even, DuckDB half-away). Ordering key is the raw
    alpha-ratio double — bit-identical on both sides (int/int true
    division == DuckDB *1.0/, the docs_quality_scores-established
    fact) — with doc_id tiebreak."""
    from .relational import grouped_agg_ds, grouped_global_rank

    def score(b: pd.DataFrame) -> pd.DataFrame:
        text = b["text"]
        length = text.str.len().astype("int64")
        alpha = text.str.count(r"[A-Za-z]").astype("int64")
        return pd.DataFrame({
            "doc_id": b["doc_id"].values, "lang": b["lang"].values,
            "alpha_ratio": np.where(length > 0, alpha / length, 0.0)})

    ds = read_table(sf_dir, "documents", ["doc_id", "text", "lang"])
    scored = ds.map_batches(score, batch_format="pandas").materialize()
    if scored.count() == 0:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "lang": pd.array([], dtype=str),
                             "alpha_ratio": pd.array([], dtype="float64"),
                             "rnk": pd.array([], dtype="int64"),
                             "pct_milli": pd.array([], dtype="int64")})
    tot = grouped_agg_ds(scored, ["lang"],
                         {"n": ("count", None)}).to_pandas()
    nmap = dict(zip(tot["lang"], tot["n"].astype(np.int64)))
    ranked = grouped_global_rank(scored, ["lang"],
                                 ["alpha_ratio", "doc_id"],
                                 out_col="rnk")

    def pct(b: pd.DataFrame) -> pd.DataFrame:
        n = b["lang"].map(nmap).to_numpy(np.int64)
        rn = b["rnk"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "lang": b["lang"].values,
            "alpha_ratio": b["alpha_ratio"].values,
            "rnk": rn,
            "pct_milli": np.where(n > 1, rn * 1000 // np.maximum(
                n - 1, 1), 0).astype(np.int64)})

    out = ranked.map_batches(pct, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_quality_classifier(sf_dir: str) -> pd.DataFrame:
    """Model-based quality filter, TRAINED DISTRIBUTED: a hashed
    bag-of-words logistic regression (the fastText-style classifier
    of the CCNet / GPT-3 / LLaMA curation recipes; fastText is absent
    from this environment, so the model trains here with the engine's
    iterative broadcast pattern — per iteration the weight vector is
    ray.put ONCE and each task returns one (dim+1)-float gradient
    partial, combined driver-side in deterministic blk order; see
    stages/classifier.py). The sf docs are label-free word salad, so
    the deterministic fixture plants per-class marker vocabulary
    (quality_label_inject_batch — the established injected-corpus
    pattern). No SQL oracle (iterative float model — the kmeans/ANN
    class); verified in-query instead: training loss must drop ≥ 5%
    and held-in accuracy must reach 90%, and the pytest suite pins
    the trainer against a single-process numpy reference and the
    confusion matrix across partitionings. Surface is all-integer:
    confusion counts + milli-accuracy."""
    from .stages.classifier import (confusion_counts, featurize_batch,
                                    quality_label_inject_batch,
                                    train_logreg)
    dim, iters = 512, 12
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    feats = (ds.map_batches(quality_label_inject_batch,
                            batch_format="pandas")
             .map_batches(lambda b: featurize_batch(b, dim=dim),
                          batch_format="pandas")
             .materialize())
    # lr sits just past the worst-case full-batch stability bound
    # 2/L = 8/max_active_features (~0.24 at ~33 presence features per
    # doc) and converges to 100% on the planted signal in 12 passes;
    # 4.0 was measured divergent (loss 0.69 -> 5.76).
    w, losses = train_logreg(feats, dim=dim, iters=iters, lr=0.3)
    if not losses:
        return pd.DataFrame({c: pd.array([], dtype="int64")
                             for c in ("n", "tp", "fp", "tn", "fn",
                                       "accuracy_milli")})
    tp, fp, tn, fn = confusion_counts(feats, w, dim=dim)
    n = tp + fp + tn + fn
    acc_milli = (tp + tn) * 1000 // n
    assert losses[-1] < 0.95 * losses[0], \
        f"training loss did not drop: {losses[0]:.4f} -> {losses[-1]:.4f}"
    assert acc_milli >= 900, \
        f"classifier failed to learn the planted signal: acc {acc_milli}"
    return pd.DataFrame({"n": [n], "tp": [tp], "fp": [fp],
                         "tn": [tn], "fn": [fn],
                         "accuracy_milli": [acc_milli]}).astype("int64")


def docs_inverted_index(sf_dir: str) -> pd.DataFrame:
    """Inverted-index EXPORT (the search/retrieval sink a curation
    stack feeds): token -> exact document frequency + the k=8
    smallest doc ids as a champion posting list, pruned to df >= 5.
    Distributed shape: one Arrow tokenize pass emits MERGEABLE
    per-batch partials (batch-local df count + batch-local bottom-k
    postings — docs never split across batches, so the sum/merge is
    exact), then ONE token-hash bucketed combine; no whole-token
    posting list is ever materialized (a common token contributes k
    rows per batch, not df rows), which is what lets the same plan
    run over 100 TB — full postings beyond k would be sharded the
    same way, k rows at a time per merge level. Postings ship as a
    comma-joined string so the hash-compared surface has no
    list-type coercion."""
    from .relational import bucketed_map_groups
    from .stages.text_analysis import index_postings_partial
    K, MIN_DF = 8, 5
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    partials = ds.map_batches(
        lambda t: index_postings_partial(t, k=K),
        batch_format="pyarrow")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("token", sort=False)
        df = grp["df_p"].sum()
        p = g[g["doc_id"] >= 0].sort_values(["token", "doc_id"],
                                            ignore_index=True)
        p = p[p.groupby("token", sort=False).cumcount().to_numpy() < K]
        p["__s"] = p["doc_id"].astype(str)
        postings = p.groupby("token", sort=False)["__s"].agg(",".join)
        out = pd.DataFrame({"df": df.astype("int64"),
                            "postings": postings}).reset_index()
        return out[out["df"] >= MIN_DF]

    out = bucketed_map_groups(partials, ["token"], combine).to_pandas()
    if not len(out):
        return pd.DataFrame({"token": pd.array([], dtype=str),
                             "df": pd.array([], dtype="int64"),
                             "postings": pd.array([], dtype=str)})
    return out.sort_values("token", ignore_index=True)


def docs_blocklist_filter(sf_dir: str) -> pd.DataFrame:
    """The C4 §2.2 bad-words PAGE gate (Raffel et al. 2020: drop any
    page containing a word from a public blocklist) — the one C4
    cleaning rule docs_c4_filters leaves out. The blocklist rides as
    a closure constant compiled into ONE RE2 alternation with
    explicit [^a-z0-9] word boundaries, evaluated by the Arrow C++
    kernel — the same regex engine as the DuckDB oracle, so the
    (?i) case fold and boundary classes agree by construction. The
    sf corpora contain no blockwords, so a deterministic fixture
    plants a mixed-case hit, a punctuation-bounded hit, and an
    embedded-in-a-longer-token NON-hit (blocklist_inject_batch,
    mirrored verbatim in the oracle). Surface is the per-source
    gate report: doc counts, blocked/kept, kept char mass."""
    from .relational import grouped_agg
    from .stages.text_analysis import (blocklist_flag_batch,
                                       blocklist_inject_batch)

    def flag(t):
        return blocklist_flag_batch(blocklist_inject_batch(t))

    ds = read_table(sf_dir, "documents", ["doc_id", "text", "source"])
    out = grouped_agg(ds.map_batches(flag, batch_format="pyarrow"),
                      ["source"],
                      {"n_docs": ("count", None),
                       "n_blocked": ("sum", "blocked"),
                       "kept_chars": ("sum", "kept_chars")})
    if not len(out) or "n_docs" not in out.columns:
        return pd.DataFrame({
            "source": pd.array([], dtype=str),
            **{c: pd.array([], dtype="int64")
               for c in ("n_docs", "n_blocked", "kept_chars",
                         "kept_docs")}})
    out = out.astype({"n_docs": "int64", "n_blocked": "int64",
                      "kept_chars": "int64"})
    out["kept_docs"] = out["n_docs"] - out["n_blocked"]
    return out.sort_values("source", ignore_index=True)


def embeddings_pq_codes(sf_dir: str) -> pd.DataFrame:
    """Product quantization (Jegou et al. 2011) — the compression
    half of the IVF-PQ ANN stack (embeddings_knn_ivf is the
    partition half): 64-dim vectors split into m=4 subspaces, a
    ksub=16 codebook trained per subspace with the engine's
    distributed Lloyd stage (broadcast centroids, sufficient-stats
    partials, deterministic lowest-id seeds), then ONE streaming
    assign pass with all codebooks broadcast — 64 float32 dims
    become 4 uint8-range codes (128x fewer bits), which is how a
    100 TB embedding corpus fits an in-memory ANN index. No SQL
    oracle (iterative float k-means, the embeddings_kmeans class);
    verified in-query instead: per-subspace code histograms must
    sum to n, and the quantization SSE must land at <= 0.85x the
    rank-0 (subspace-mean) baseline — the sf embeddings are
    near-isotropic within a subspace, where ksub=16 over 16 dims
    buys ~27% SSE (measured 0.73-0.77 across sf0.001/0.01/0.1;
    theory for k centroids in d dims predicts ~1 - k^(-2/d) = 29%),
    so 0.85 is non-vacuous (an untrained codebook sits at ~1.0) yet
    stable across corpora — plus the pytest suite pins codes against
    a numpy reference and partitioning invariance. Surface is
    integer-only: (subspace, code, n) histogram rows."""
    from .stages.similarity import pq_assign_report, pq_train_codebooks
    M, KSUB = 4, 16
    ds = read_table(sf_dir, "embeddings",
                    ["vec_id", "embedding"]).materialize()
    books = pq_train_codebooks(ds, m=M, ksub=KSUB, iters=4)
    if not books:
        return pd.DataFrame({c: pd.array([], dtype="int64")
                             for c in ("subspace", "code", "n")})
    hist, err_sse, base_sse, n_vecs = pq_assign_report(ds, books)
    sums = hist.groupby("subspace")["n"].sum()
    assert (sums == n_vecs).all(), \
        f"code histograms must each sum to n={n_vecs}: {dict(sums)}"
    assert err_sse <= 0.85 * base_sse, \
        (f"PQ SSE {err_sse:.3f} does not beat the subspace-mean "
         f"baseline {base_sse:.3f} by 15% — codebooks failed to train")
    return hist.sort_values(["subspace", "code"], ignore_index=True)


def docs_shuffle_order(sf_dir: str) -> pd.DataFrame:
    """Deterministic global training-order shuffle: every doc gets a
    dense position 0..N-1 in multiplicative-hash order — the epoch
    shuffle a trainer replays identically on any cluster shape. No
    global sort: ordered_exclusive_cumsum range-partitions on the
    (unique) hash-derived key, so the only driver state is one prefix
    scalar per range. uint64 hash mirrored in HUGEINT SQL."""
    from .relational import ordered_exclusive_cumsum
    ds = read_table(sf_dir, "documents", ["doc_id"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(4294967296)
        b = b.copy(deep=False)
        # (h, doc_id) packed into one unique int64 key: h < 2^32,
        # doc_id < 2^31 keeps the pack collision-free and in range
        b["__key"] = (h.astype(np.int64) << np.int64(31)) + ids
        b["__one"] = np.int64(1)
        return b

    out = (ordered_exclusive_cumsum(ds.map_batches(
        keyed, batch_format="pandas"),
        order_col="__key", value_col="__one", out_col="shuffle_pos")
        .to_pandas())
    return (out[["doc_id", "shuffle_pos"]]
            .astype({"doc_id": "int64", "shuffle_pos": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


def docs_gopher_rules(sf_dir: str) -> pd.DataFrame:
    """The published Gopher quality-filter rule set (Rae et al. 2021
    table A1) over the documents table — word-count bounds, mean-word-
    length bounds, symbol-to-word ratio, bullet/ellipsis line
    fractions, alphabetic-word fraction, stop-word floor, and the
    duplicate-line-fraction repetition rule. One vectorized
    map_batches pass (pandas .str regex kernels); every threshold is a
    cross-multiplied INTEGER comparison so the whole verified surface
    is float-free and the DuckDB oracle matches bit-exactly."""
    from .stages.text_analysis import gopher_rules_batch
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return (ds.map_batches(gopher_rules_batch, batch_format="pandas")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def docs_dsir_weights(sf_dir: str) -> pd.DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hashed-unigram
    bucket LMs over a TARGET slice (lang = 'en' — the stand-in for
    the paper's high-quality target corpus) and the RAW corpus, and
    per-doc log importance weight sum_tokens(ln pt[b] - ln pr[b])
    with Laplace +1 smoothing over K = 256 buckets. Shape: ONE Arrow
    tokenize pass producing (doc_id, bucket, tf, target-tf) partials
    (the md5-upper-64 bucket hash is memoized per worker and mirrored
    by DuckDB's md5_number_upper, the winnow_batch precedent); the
    two bucket histograms are FIXED-SIZE (K rows) sketches combined
    on the driver and broadcast back in the scoring closure; per-doc
    sums via grouped_agg_ds. logw is rounded to 3dp (np.log vs
    DuckDB ln ulps — the docs_unigram_ce float surface); dl is exact
    int64 and `selected` gates on the ROUNDED value so both engines
    decide identically."""
    from .relational import grouped_agg_ds
    from .stages.text_analysis import dsir_bucket_rows
    K = 256
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "lang"])
    rows = ds.map_batches(dsir_bucket_rows, fn_kwargs={"k": K},
                          batch_format="pandas").materialize()
    # fixed-size sketches: K rows per side regardless of corpus size
    hist = (rows.map_batches(
        lambda b: b.groupby("bucket", as_index=False)
        .agg(tf=("tf", "sum"), tt=("tt", "sum")),
        batch_format="pandas").to_pandas()
        .groupby("bucket").agg(tf=("tf", "sum"), tt=("tt", "sum")))
    if not len(hist):
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "dl": pd.array([], dtype="int64"),
                             "logw": pd.array([], dtype="float64"),
                             "selected": pd.array([], dtype="int64")})
    cr = np.zeros(K, dtype=np.int64)
    ct = np.zeros(K, dtype=np.int64)
    cr[hist.index.to_numpy()] = hist["tf"].to_numpy()
    ct[hist.index.to_numpy()] = hist["tt"].to_numpy()
    tr, tt = int(cr.sum()), int(ct.sum())
    lr = (np.log((ct + 1).astype(np.float64) / np.float64(tt + K))
          - np.log((cr + 1).astype(np.float64) / np.float64(tr + K)))

    def contrib(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].values,
            "w": b["tf"].to_numpy(np.float64)
            * lr[b["bucket"].to_numpy()],
            "tf": b["tf"].values})

    per_doc = grouped_agg_ds(
        rows.map_batches(contrib, batch_format="pandas"),
        ["doc_id"], {"logw": ("sum", "w"), "dl": ("sum", "tf")}
    ).to_pandas()
    per_doc["logw"] = np.round(per_doc["logw"].to_numpy(np.float64), 3)
    per_doc["selected"] = (per_doc["logw"] > 0).astype("int64")
    return (per_doc[["doc_id", "dl", "logw", "selected"]]
            .astype({"doc_id": "int64", "dl": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


def docs_bpe_pair_counts(sf_dir: str) -> pd.DataFrame:
    """First BPE tokenizer-training iteration (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units"):
    the corpus-wide adjacent character-pair frequency table whose
    argmax is the first merge — the feed a distributed tokenizer
    trainer would loop on. Shape: per-batch token-count partials ->
    the vocabulary combine STAYS a Dataset (grouped_agg_ds — the
    vocabulary never visits the driver) -> weighted pair explosion
    over DISTINCT words only (pair work scales with vocabulary, not
    corpus tokens) -> tiny pair-keyed combine; the driver sees only
    the top-20 report. Ties at the LIMIT boundary break on the pair
    text, which orders identically on both sides (Python code-point
    < vs DuckDB binary UTF-8 collation)."""
    from .stages.text_analysis import bpe_pair_rows, token_counts_arrow
    ds = read_table(sf_dir, "documents", ["text"])
    vocab = grouped_agg_ds(
        ds.map_batches(token_counts_arrow, batch_format="pyarrow"),
        ["token"], {"c": ("sum", "cnt")})
    pairs = grouped_agg(
        vocab.map_batches(bpe_pair_rows, batch_format="pandas"),
        ["pair"], {"cnt": ("sum", "n")})
    if not len(pairs):
        return pd.DataFrame({"pair": pd.array([], dtype=str),
                             "cnt": pd.array([], dtype="int64")})
    pairs["cnt"] = pairs["cnt"].astype("int64")
    return (pairs.sort_values(["cnt", "pair"], ascending=[False, True])
            .head(20).reset_index(drop=True))


def docs_bpe_train(sf_dir: str) -> pd.DataFrame:
    """FULL BPE merge training (Sennrich et al. 2016) — the iterative
    loop docs_bpe_pair_counts is one step of: 10 merge rounds, each a
    streaming symbol-pair count over the UNIQUE-WORD frequency
    Dataset (built once; corpus text is read exactly once) with the
    merge list broadcast, exact integer bucketed combine, and a
    per-block top-1 argmax reduction — the third iterative
    distributed trainer in the engine (with Lloyd k-means and the
    logreg quality classifier). No SQL oracle (iterative argmax);
    verified in-query by the max-pair-count monotonicity theorem (a
    pair born of merge r occurs at most n_r times, so n_{r+1} <=
    n_r) plus distinct-merge and positive-count checks, and the
    pytest suite pins the merge table against an independent
    single-process reference trainer (incremental vocabulary
    rewrite, not rank-order replay) and partitioning invariance.
    Surface: (rank, left, right, merged, n) — ints and strings."""
    from .stages.text_analysis import token_counts_arrow, train_bpe_merges
    R = 10
    ds = read_table(sf_dir, "documents", ["text"])
    vocab = grouped_agg_ds(
        ds.map_batches(token_counts_arrow, batch_format="pyarrow"),
        ["token"], {"c": ("sum", "cnt")}).materialize()
    out = train_bpe_merges(vocab, R)
    assert (out["n"] > 0).all(), "merge counts must be positive"
    assert not out[["left", "right"]].duplicated().any(), \
        "merges must be distinct"
    assert (out["n"].diff().dropna() <= 0).all(), \
        f"max pair count must be non-increasing: {out['n'].tolist()}"
    return out


def docs_bpe_encode(sf_dir: str) -> pd.DataFrame:
    """BPE tokenizer APPLY — the encode half of the BPE stack
    (docs_bpe_train is the train half): a FIXED 16-merge table
    (corpus-independent so the oracle can embed it; broadcast in the
    batch-fn closure) is replayed in rank order over the UNIQUE-WORD
    vocabulary, so encode work scales with vocabulary size, never
    corpus tokens — corpus text is read exactly once for the (token,
    c) reduce. Surface: top-50 (symbol, n) encoded-symbol totals —
    ints + ASCII strings, hash-exact; ties at the LIMIT boundary
    break on symbol text (identical collation both sides). The
    DuckDB oracle replays the SAME merges as a generated chain of
    replace() calls over [c][c]-wrapped words: bracket wrapping makes
    global leftmost non-overlapping replace() EXACTLY one BPE merge
    pass (no match can straddle a symbol boundary, and consuming the
    trailing ']' never eats the next match's leading '[' — the
    classic shared-space pitfall of space-joined encodings);
    adversarial self-pair cases ((a,a) on 'aaaaa') are pinned in
    tests/test_queries_oracle.py."""
    from .stages.text_analysis import (BPE_FIXED_MERGES,
                                       bpe_encode_symbol_rows,
                                       word_token_counts_arrow)
    ds = read_table(sf_dir, "documents", ["text"])
    vocab = grouped_agg_ds(
        ds.map_batches(word_token_counts_arrow,
                       batch_format="pyarrow"),
        ["token"], {"c": ("sum", "cnt")})
    sym = grouped_agg(
        vocab.map_batches(
            lambda b: bpe_encode_symbol_rows(b, BPE_FIXED_MERGES),
            batch_format="pandas"),
        ["symbol"], {"n": ("sum", "n")})
    if not len(sym):
        return pd.DataFrame({"symbol": pd.array([], dtype=str),
                             "n": pd.array([], dtype="int64")})
    sym["n"] = sym["n"].astype("int64")
    return (sym.sort_values(["n", "symbol"], ascending=[False, True])
            .head(50).reset_index(drop=True))


def docs_gopher_repetition(sf_dir: str) -> pd.DataFrame:
    """The Gopher REPETITION-removal family (Rae et al. 2021 table A1
    — the rules docs_gopher_rules only samples via its duplicate-line
    count): top 2/3/4-gram character fraction, duplicate 5..10-gram
    character fraction, duplicate-line character fraction. N-gram
    generation is the Arrow slice+join shingle kernel (one C++ pass
    per n); occurrence counting and the per-doc max / dup-sum are
    numpy segment ops. All thresholds are cross-multiplied int64
    comparisons over (count x chars, word_chars) integers — the
    verified surface carries no floats and the DuckDB oracle mirrors
    the reproduction choices expression-for-expression (see
    stages/text_analysis.py for the documented choices). The sf docs
    are near-unique word salad (every duplicate-n-gram signal zero
    corpus-wide), so the deterministic repetition fixture
    (gopher_rep_inject_batch, mirrored in the oracle) makes the dup
    rules decide both ways."""
    from .stages.text_analysis import (gopher_rep_inject_batch,
                                       gopher_repetition_batch)
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return (ds.map_batches(gopher_rep_inject_batch,
                           batch_format="pandas")
            .map_batches(gopher_repetition_batch,
                         batch_format="pandas")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def docs_c4_filters(sf_dir: str) -> pd.DataFrame:
    """The C4 cleaning filters (Raffel et al. 2020 §2.2) as a
    TRANSFORM over the documents table: terminal-punctuation /
    5-word / no-javascript line retention, brace / lorem-ipsum /
    min-3-sentences page gating. One vectorized map_batches pass;
    the verified surface is the retained text itself plus int64
    signals, mirrored lambda-for-lambda in the DuckDB oracle
    (list_filter over the same ASCII-explicit RE2 predicates)."""
    from .stages.text_analysis import c4_filters_batch, c4_inject_batch
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return (ds.map_batches(c4_inject_batch, batch_format="pandas")
            .map_batches(c4_filters_batch, batch_format="pandas")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def docs_hapax_ratio(sf_dir: str) -> pd.DataFrame:
    """Per-source HAPAX LEGOMENA ratio — vocabulary richness (the
    type-level complement of docs_distinct_ngram_ratio's
    occurrence-level metric): tokens appearing exactly once in a
    source, as a milli-fraction of that source's distinct types.
    Token counts reduce per (source, token) in ONE bucketed combine
    (the vocabulary never visits the driver); the per-source rollup
    folds each combined row into (types, hapax, occurrences) int
    partials, so only |sources| rows reach the report."""
    from .stages.text_analysis import tf_rows_arrow
    ds = read_table(sf_dir, "documents", ["source", "text"])
    per = grouped_agg_ds(
        ds.map_batches(
            lambda t: tf_rows_arrow(t, id_col="source"),
            batch_format="pyarrow"),
        ["source", "token"], {"c": ("sum", "tf")})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy(np.int64)
        return pd.DataFrame({
            "source": b["source"].values,
            "types": np.ones(len(b), dtype=np.int64),
            "hapax": (c == 1).astype(np.int64),
            "occurrences": c})

    out = grouped_agg(per.map_batches(fold, batch_format="pandas"),
                      ["source"], {"n_types": ("sum", "types"),
                                   "n_hapax": ("sum", "hapax"),
                                   "n_tokens": ("sum", "occurrences")})
    out = out.astype({c: "int64" for c in
                      ("n_types", "n_hapax", "n_tokens")})
    out["hapax_milli"] = (out["n_hapax"] * 1000 // out["n_types"]
                          if len(out) else
                          pd.array([], dtype="int64"))
    return (out[["source", "n_tokens", "n_types", "n_hapax",
                 "hapax_milli"]]
            .sort_values("source").reset_index(drop=True))


def docs_charclass_profile(sf_dir: str) -> pd.DataFrame:
    """Per-source character-class profile — the composition histogram
    a multilingual-mix audit starts from (ASCII letters, digits,
    ASCII whitespace, everything else): one vectorized Arrow RE2 pass
    per class over each batch, per-source integer sums, and 'other'
    derived by subtraction so the four classes always sum to n_chars.
    Classes are ASCII-EXPLICIT ranges so the oracle's RE2 and the
    engine's RE2 share one definition (the Gopher-module
    convention)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    ds = read_table(sf_dir, "documents", ["source", "text"])

    def classes(t: pa.Table) -> pa.Table:
        txt = t.column("text")

        def cnt(pat):
            return pc.cast(pc.count_substring_regex(txt, pat),
                           pa.int64())

        n = pc.cast(pc.utf8_length(txt), pa.int64())
        return pa.table({"source": t.column("source"),
                         "n_chars": n,
                         "ascii_alpha": cnt("[A-Za-z]"),
                         "digits": cnt("[0-9]"),
                         "spaces": cnt("[ \t\n\f\r]")})

    out = grouped_agg(ds.map_batches(classes, batch_format="pyarrow"),
                      ["source"],
                      {"n_chars": ("sum", "n_chars"),
                       "ascii_alpha": ("sum", "ascii_alpha"),
                       "digits": ("sum", "digits"),
                       "spaces": ("sum", "spaces")})
    cols = ["n_chars", "ascii_alpha", "digits", "spaces"]
    out = out.astype({c: "int64" for c in cols})
    out["other"] = (out["n_chars"] - out["ascii_alpha"]
                    - out["digits"] - out["spaces"])
    return (out[["source", *cols, "other"]]
            .sort_values("source").reset_index(drop=True))


def docs_distinct_ngram_ratio(sf_dir: str) -> pd.DataFrame:
    """Per-source DISTINCT-BIGRAM ratio — the distinct-n diversity
    metric (Li et al. 2016) used to compare corpus slices for
    repetitiveness before mixing: distinct bigrams / total bigrams
    per source, in integer milli-units. The heavy reduce is the
    seam-masked Arrow bigram kernel keyed by source (per-batch
    partials, ONE bucketed combine over (source, a, b) — the bigram
    vocabulary never visits the driver); the per-source rollup then
    counts combined rows (each distinct bigram is exactly one row
    post-combine), so only |sources| rows reach the report."""
    from .stages.text_analysis import bigram_counts_arrow
    ds = read_table(sf_dir, "documents", ["source", "text"])
    per = grouped_agg_ds(
        ds.map_batches(
            lambda t: bigram_counts_arrow(t, id_col="source"),
            batch_format="pyarrow"),
        ["source", "a", "b"], {"c": ("sum", "c")})
    # count(None) counts combined rows == distinct bigrams directly —
    # no intermediate ones-column pass over the bigram vocabulary
    out = grouped_agg(per, ["source"],
                      {"distinct_bigrams": ("count", None),
                       "total_bigrams": ("sum", "c")})
    out = out.astype({"distinct_bigrams": "int64",
                      "total_bigrams": "int64"})
    out["ttr_milli"] = (out["distinct_bigrams"] * 1000
                        // out["total_bigrams"]
                        if len(out) else
                        pd.array([], dtype="int64"))
    return (out[["source", "distinct_bigrams", "total_bigrams",
                 "ttr_milli"]]
            .sort_values("source").reset_index(drop=True))


def docs_readability(sf_dir: str) -> pd.DataFrame:
    """Flesch-style readability scoring — the classic reading-ease
    quality signal (Flesch 1948, as used in readability-based corpus
    filters): words are [A-Za-z]+ runs, syllables the standard
    vowel-group heuristic ([aeiouyAEIOUY]+ runs — a vowel group can
    never span a non-alpha char, so the corpus-text count equals the
    per-word sum), sentences [.!?]+ runs clamped to >= 1. The score
    is EXACT INTEGER MILLI-UNITS of the Flesch formula
    (206.835 - 1.015 w/s - 84.6 syl/w), every division a positive
    floor mirrored by DuckDB // — no float enters the surface. One
    vectorized Arrow pass (count_substring_regex, RE2 — the oracle's
    regex engine); docs with zero words emit no row on either side."""
    import pyarrow as pa
    import pyarrow.compute as pc
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        w = pc.cast(pc.count_substring_regex(txt, "[A-Za-z]+"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        syl = pc.cast(pc.count_substring_regex(
            txt, "[aeiouyAEIOUY]+"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        sent = pc.cast(pc.count_substring_regex(txt, "[.!?]+"),
                       pa.int64()).to_numpy(zero_copy_only=False)
        sent = np.maximum(sent, 1)
        keep = w > 0
        w, syl, sent = w[keep], syl[keep], sent[keep]
        flesch = (206835 - (1015 * w) // sent
                  - (84600 * syl) // np.maximum(w, 1))
        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"),
                              pa.int64()).filter(pa.array(keep)),
            "n_words": pa.array(w, pa.int64()),
            "n_sentences": pa.array(sent, pa.int64()),
            "n_syllables": pa.array(syl, pa.int64()),
            "flesch_milli": pa.array(flesch, pa.int64())})

    out = (ds.map_batches(score, batch_format="pyarrow")
           .to_pandas())
    if not len(out):
        return pd.DataFrame({c: pd.array([], dtype="int64")
                             for c in ("doc_id", "n_words",
                                       "n_sentences", "n_syllables",
                                       "flesch_milli")})
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_quality_scores(sf_dir: str) -> pd.DataFrame:
    from .stages.text_analysis import quality_batch
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return (ds.map_batches(quality_batch, batch_format="pandas")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def events_sorted_export(sf_dir: str) -> pd.DataFrame:
    """GLOBALLY SORTED range-partitioned export + PRUNED range read
    (state.shards.write_sorted_export / read_sorted_range): events are
    exported sorted by (ts, event_id) into 8 quantile-boundary range
    files with a (vmin, vmax) manifest, then a 5-day window is read
    back opening ONLY the intersecting files (asserted) — the
    sorted-serving complement of the hash-sharded trainer export.
    Oracle: plain SQL BETWEEN over the original table."""
    import shutil
    import tempfile

    from .state.shards import read_sorted_range, write_sorted_export
    ds = read_table(sf_dir, "events",
                    ["event_id", "user_id", "ts", "value"])
    out = tempfile.mkdtemp(prefix="sorted_export_")
    try:
        man = write_sorted_export(ds, out, sort_col="ts",
                                  tiebreak_cols=["event_id"], n_ranges=8)
        got, n_files = read_sorted_range(out, "2024-01-10", "2024-01-15")
        assert n_files < len(man), \
            f"manifest pruning read all {n_files} files"
        pdf = got.to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return (pdf[["event_id", "user_id", "ts", "value"]]
            .sort_values(["ts", "event_id"]).reset_index(drop=True))


def events_zorder_pruned_read(sf_dir: str) -> pd.DataFrame:
    """Z-ORDER clustered export + TWO-COLUMN pruned read
    (state.shards.write_zorder_export / read_zorder_range): events are
    clustered by the Morton interleaving of (user_id, value) rank codes
    into 16 range files carrying per-file per-column [vmin, vmax], then
    a rectangle predicate (user_id <= max/5, value <= 60) is answered
    opening only the intersecting files — multi-dimensional pruning a
    single-column sort cannot give (a ts-sorted layout prunes nothing
    for this predicate). The pruned result is aggregated and matched
    bit-exact against plain SQL over the original table; `pruned`
    asserts files were actually skipped, so the oracle validates both
    the clustering's correctness and its usefulness."""
    import shutil
    import tempfile

    from .state.shards import read_zorder_range, write_zorder_export
    ds = read_table(sf_dir, "events",
                    ["event_id", "user_id", "event_type", "value"])
    hi_user = int(ds.map_batches(
        lambda b: pd.DataFrame({"m": [b["user_id"].max()]}),
        batch_format="pandas").to_pandas()["m"].max()) // 5
    out = tempfile.mkdtemp(prefix="zorder_export_")
    try:
        man = write_zorder_export(ds, out, cols=["user_id", "value"],
                                  tiebreak_cols=["event_id"],
                                  n_ranges=16)
        got, n_files = read_zorder_range(
            out, {"user_id": (None, hi_user), "value": (None, 60.0)})
        pruned = n_files < len(man)
        if got is None:
            # no range file intersects the predicate: every file was
            # pruned — the correct answer is the empty aggregate, not
            # an AttributeError on None.map_batches
            agg = pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "sum_value_c": pd.Series([], dtype="int64")})
        else:
            agg = grouped_agg(
                got.map_batches(
                    lambda b: pd.DataFrame({
                        "event_type": b["event_type"].values,
                        "v_c": _cents(b["value"])}),
                    batch_format="pandas"),
                ["event_type"], {"n": ("count", None),
                                 "sum_value_c": ("sum", "v_c")})
    finally:
        shutil.rmtree(out, ignore_errors=True)
    agg["n"] = agg["n"].astype("int64")
    agg["sum_value_c"] = agg["sum_value_c"].astype("int64")
    agg["pruned"] = bool(pruned)
    return agg.sort_values("event_type").reset_index(drop=True)


def docs_quality_gate(sf_dir: str) -> pd.DataFrame:
    """Quality gate at a GLOBAL exact quantile threshold: keep the
    documents whose alpha-ratio is at or above the corpus-wide exact
    P75, the "top quality band" cut a training-data curation pipeline
    makes before mixing. The threshold is an EXACT order statistic
    computed distributed (relational.quantile_exact: sample-bracketed
    selection, driver holds only a bounded sample + the final value
    band — never the score column); the score projection is
    materialized once (16 bytes/row) and reused by the quantile scans
    and the final filter, so the regex scoring pass runs exactly once.
    """
    from .relational import quantile_exact
    from .stages.text_analysis import quality_batch

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    scored = ds.map_batches(
        lambda b: quality_batch(b)[["doc_id", "alpha_ratio"]],
        batch_format="pandas").materialize()
    thr = quantile_exact(scored, "alpha_ratio", [0.75])[0]

    def gate(b: pd.DataFrame, thr=thr) -> pd.DataFrame:
        return b[b["alpha_ratio"] >= thr]

    out = scored.map_batches(gate, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_top_tokens(sf_dir: str) -> pd.DataFrame:
    from .stages.text_analysis import token_counts_arrow
    ds = read_table(sf_dir, "documents", ["text"])
    g = grouped_agg(ds.map_batches(token_counts_arrow,
                                   batch_format="pyarrow"),
                    ["token"], {"n": ("sum", "cnt")})
    g["n"] = g["n"].astype("int64")
    return (g.sort_values(["n", "token"], ascending=[False, True])
            .head(20).reset_index(drop=True))


def docs_freq_spectrum(sf_dir: str) -> pd.DataFrame:
    """Token-frequency SPECTRUM (Zipf QA: for each occurrence count n,
    how many distinct tokens occur exactly n times — the corpus-health
    curve dedup/boilerplate bugs bend first). Two-level distributed
    aggregation: per-batch token counts -> bucketed vocabulary combine
    that STAYS a Dataset (grouped_agg_ds — the vocabulary never visits
    the driver) -> tiny per-count regroup."""
    from .stages.text_analysis import token_counts_arrow
    ds = read_table(sf_dir, "documents", ["text"])
    vocab = grouped_agg_ds(
        ds.map_batches(token_counts_arrow, batch_format="pyarrow"),
        ["token"], {"n": ("sum", "cnt")})
    spec = grouped_agg(vocab, ["n"], {"n_tokens": ("count", None)})
    spec["n"] = spec["n"].astype("int64")
    spec["n_tokens"] = spec["n_tokens"].astype("int64")
    return spec.sort_values("n").reset_index(drop=True)


def docs_sliding_chunks(sf_dir: str) -> pd.DataFrame:
    """Sliding token-window chunker (window 64, stride 48 — the
    standard long-document splitter for pretraining, complementing
    docs_pack_sequences' whole-doc packing): a pure flat-map, rows out
    proportional to tokens in, no shuffle at all. Window index
    arithmetic is fully vectorized; only the final chunk-string join
    is per-chunk (inherent string assembly, O(output bytes))."""
    W, S = 64, 48
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def chunks(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.findall(r"\S+")
        n = toks.str.len().fillna(0).astype("int64").to_numpy()
        keep = n > 0
        nk = n[keep]
        cnt = -(-nk // S)                      # chunks per doc (ceil)
        total = int(cnt.sum())
        doc_ids = np.repeat(b["doc_id"].to_numpy()[keep], cnt)
        # within-doc chunk index without a per-doc arange
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(np.cumsum(cnt) - cnt, cnt))
        starts = idx * S
        n_chunk = np.minimum(W, np.repeat(nk, cnt) - starts)
        texts = []
        for arr, c in zip(toks.to_numpy()[keep], cnt):
            for j in range(int(c)):
                texts.append(" ".join(arr[j * S:j * S + W]))
        return pd.DataFrame({"doc_id": doc_ids, "chunk_idx": idx,
                             "chunk": texts,
                             "n_chunk_tokens": n_chunk})

    out = ds.map_batches(chunks, batch_format="pandas").to_pandas()
    return (out.sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True))


def docs_bigram_lift(sf_dir: str) -> pd.DataFrame:
    """Collocation mining: top-20 adjacent-token bigrams by LIFT
    (c_ab * N / (c_a * c_b) — the PMI ranking with the monotone log
    dropped, so the score is pure IEEE arithmetic on exact integers
    and hash-comparable across engines, unlike a transcendental).
    Bigram and unigram counts aggregate distributed over the token
    vocabulary (grouped_agg_ds + two partitioned hash_joins — the
    vocabulary is never assumed driver-small); the final top-20 uses
    per-batch partial top-k."""
    from .relational import grouped_agg_ds, hash_join, topk
    ds = read_table(sf_dir, "documents", ["text"])

    from .stages.text_analysis import (bigram_counts_arrow,
                                       token_counts_arrow)
    import functools as _ft

    cab = grouped_agg_ds(ds.map_batches(bigram_counts_arrow,
                                        batch_format="pyarrow"),
                         ["a", "b"], {"c_ab": ("sum", "c")})
    uni = ds.map_batches(
        _ft.partial(token_counts_arrow, token_col="tok", out_col="c"),
        batch_format="pyarrow")
    cu = grouped_agg_ds(uni, ["tok"], {"c": ("sum", "c")})
    n_tokens = int(ds.map_batches(
        lambda b: pd.DataFrame(
            {"n": [int(b["text"].str.count(r"\S+").sum())]}),
        batch_format="pandas").to_pandas()["n"].sum())

    ca = cu.map_batches(lambda b: b.rename(
        columns={"tok": "a", "c": "c_a"}), batch_format="pandas")
    cb = cu.map_batches(lambda b: b.rename(
        columns={"tok": "b", "c": "c_b"}), batch_format="pandas")
    j = hash_join(hash_join(cab, ca, on="a"), cb, on="b")

    def score(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[b["c_ab"] >= 5].copy(deep=False)
        # identical expression tree to the oracle:
        # (double(c_ab) * double(N)) / double(c_a * c_b)
        b["lift"] = (b["c_ab"].to_numpy(dtype=np.float64)
                     * float(n_tokens)) \
            / (b["c_a"].to_numpy() * b["c_b"].to_numpy()) \
            .astype(np.float64)
        return b

    out = topk(j.map_batches(score, batch_format="pandas"),
               ["lift", "a", "b"], [False, True, True], 20)
    return (out[["a", "b", "c_ab", "c_a", "c_b", "lift"]]
            .astype({"c_ab": "int64", "c_a": "int64", "c_b": "int64"})
            .reset_index(drop=True))


def docs_heavy_tokens(sf_dir: str) -> pd.DataFrame:
    """Heavy-hitters sketch (distributed Misra-Gries,
    stages.sketches.heavy_hitters) with a BOUNDS ORACLE: the emitted
    top-10 tokens/counts are the exact distributed counts (SQL-equal);
    `sketch_recovered` asserts each is present in the O(m)-state
    sketch (guaranteed when true count > deficit) and
    `sketch_bound_ok` asserts est <= true <= est + deficit — the
    Misra-Gries mergeable-summary guarantee, checked live."""
    from .relational import grouped_agg
    from .stages.sketches import heavy_hitters
    ds = read_table(sf_dir, "documents", ["text"])

    from .stages.text_analysis import token_counts_arrow
    rows = ds.map_batches(token_counts_arrow, batch_format="pyarrow")
    exact = grouped_agg(rows, ["token"], {"n": ("sum", "cnt")})
    exact["n"] = exact["n"].astype("int64")
    top = (exact.sort_values(["n", "token"], ascending=[False, True])
           .head(10).reset_index(drop=True))

    summary, deficit = heavy_hitters(rows, token_col="token",
                                     cnt_col="cnt", m=4096)
    est = dict(zip(summary["token"], summary["est"]))
    rec, bound = [], []
    for t, n in zip(top["token"], top["n"]):
        e = est.get(t)
        rec.append(e is not None)
        bound.append(e is not None and e <= n <= e + deficit)
    top["sketch_recovered"] = pd.array(rec, dtype="bool")
    top["sketch_bound_ok"] = pd.array(bound, dtype="bool")
    return top


def docs_lang_counts(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "documents", ["lang"])
    out = grouped_agg(ds, ["lang"], {"n_docs": ("count", None)})
    return out.sort_values("lang").reset_index(drop=True)


def docs_clean_text(sf_dir: str) -> pd.DataFrame:
    """NFC normalization + email/URL redaction (training-data cleaning;
    DuckDB nfc_normalize + regexp_replace oracle)."""
    from .stages.text_analysis import clean_text_batch
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return (ds.map_batches(clean_text_batch, batch_format="pandas")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def docs_pii_scrub(sf_dir: str) -> pd.DataFrame:
    """PII REDACTION over an injected corpus — the scrub every
    web-scale training pipeline runs before anything else. The sf
    corpora contain no PII-shaped strings (a scrub over the raw table
    is vacuous), so a deterministic fixture first appends a synthetic
    email to every doc_id % 7 == 0 doc and a 555 phone number to every
    doc_id % 11 == 0 doc; the injection is mirrored verbatim in the
    SQL oracle, so the per-source scrub report (doc counts, emails and
    phones redacted, post-scrub char sums) is DuckDB-exact and
    NON-vacuous. Redaction itself is Arrow C++ RE2
    (count/replace_substring_regex) — the same regex engine as the
    oracle's regexp_* — in one fused map_batches with per-batch
    aggregate partials."""
    from .stages.text_analysis import pii_inject_batch, pii_scrub_batch

    def scrub(t):
        out = pii_scrub_batch(pii_inject_batch(t))
        return out.drop_columns(["doc_id", "clean_text"])

    ds = read_table(sf_dir, "documents", ["doc_id", "text", "source"])
    out = grouped_agg(ds.map_batches(scrub, batch_format="pyarrow"),
                      ["source"],
                      {"n_docs": ("count", None),
                       "emails": ("sum", "emails"),
                       "phones": ("sum", "phones"),
                       "clean_chars": ("sum", "clean_chars")})
    return (out.astype({"n_docs": "int64", "emails": "int64",
                        "phones": "int64", "clean_chars": "int64"})
            .sort_values("source").reset_index(drop=True))


def docs_curation_funnel(sf_dir: str) -> pd.DataFrame:
    """The COMPOSED curation pipeline (pipelines/curation.py) end to
    end over a deterministically augmented corpus: PII injection
    (docs_pii_scrub's fixture) plus exact-duplicate copies of every
    doc_id % 13 == 0 un-injected doc under shifted ids, then
    scrub -> alpha-ratio gate -> exact dedup (min id per md5) ->
    exact-Jaccard near-dup drop (df-capped inverted index, pairwise
    drop-the-larger-id). Returns the per-source funnel — the
    corpus-composition report a curation run is judged by. Every stage
    is non-vacuous on this corpus (emails AND phones scrubbed, gate
    drops ~45%, both dedups fire) and the whole funnel is mirrored in
    one SQL oracle."""
    from .pipelines.curation import curate_corpus
    from .stages.text_analysis import pii_inject_batch

    ds = read_table(sf_dir, "documents", ["doc_id", "text", "source"])

    def dup_copies(t):
        import pyarrow as pa
        import pyarrow.compute as pc
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = (did % 13 == 0) & (did % 7 != 0) & (did % 11 != 0)
        sub = t.filter(pa.array(m))
        return sub.set_column(
            sub.schema.get_field_index("doc_id"), "doc_id",
            pc.add(sub.column("doc_id"), 20_000_000))

    # one pass emits BOTH the injected rows and their duplicate copies
    # (a two-branch union of the lazy read would execute the parquet
    # scan + injection once per branch; a materialize() would fix that
    # but insert a full pipeline barrier — the in-batch concat needs
    # neither)
    def inject_plus_copies(t):
        import pyarrow as pa
        inj = pii_inject_batch(t)
        return pa.concat_tables([inj, dup_copies(inj)])

    corpus = ds.map_batches(inject_plus_copies, batch_format="pyarrow")
    return curate_corpus(corpus)["report"]


def docs_repetition_ratio(sf_dir: str) -> pd.DataFrame:
    from .stages.text_analysis import repetition_ratio_batch
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return (ds.map_batches(repetition_ratio_batch, batch_format="pandas")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def docs_exact_dedup(sf_dir: str) -> pd.DataFrame:
    from .stages.dedup import exact_dedup_keep
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup_keep(ds)


def docs_exact_dedup_indexed(sf_dir: str) -> pd.DataFrame:
    """Exact dedup through the SHARED MUTABLE INDEX actor service
    (state.shared_index) — the raw-actor pattern for state a Dataset
    transform can't hold. Commutative min-claims make the result
    deterministic under any parallelism; identical output (and oracle)
    to the shuffle-based docs_exact_dedup, but the index stays resident
    for incremental ingest waves."""
    from .state.shared_index import DedupIndex
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    idx = DedupIndex(n_shards=8)
    try:
        idx.ingest(ds)
        return idx.kept_ids()
    finally:
        idx.shutdown()


def docs_fingerprint(sf_dir: str) -> pd.DataFrame:
    from .stages.text_analysis import md5_fingerprint_batch
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return (ds.map_batches(md5_fingerprint_batch, batch_format="pandas")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


# --------------------------------------------------------------- embeddings

def _query_vec(sf_dir: str):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    df = t.to_pandas()
    return df.loc[df["vec_id"] == 0, "embedding"].iloc[0]


def embeddings_knn_bruteforce(sf_dir: str) -> pd.DataFrame:
    from .stages.similarity import knn_bruteforce
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_bruteforce(ds, _query_vec(sf_dir), k=10, exclude_id=0)


def embeddings_knn_lsh(sf_dir: str) -> pd.DataFrame:
    from .stages.similarity import knn_lsh
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_lsh(ds, _query_vec(sf_dir), k=10, exclude_id=0)


def embeddings_knn_ivf(sf_dir: str) -> pd.DataFrame:
    from .stages.similarity import knn_ivf
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_ivf(ds, _query_vec(sf_dir), k=10, exclude_id=0)


def embeddings_ann_recall(sf_dir: str) -> pd.DataFrame:
    """ANN quality REPORT (measured, not asserted): recall@10 and scan
    fraction for the LSH and IVF paths against the exact brute-force
    truth, with a BOUNDS ORACLE on the one guarantee that is
    data-independent — an index that scans a fraction f of an
    ISOTROPIC corpus (these testdata embeddings: same-label mean cosine
    ~0.0007) can only recall ~f of the true neighbors, so the assertion
    is recall <= scan_fraction + slack (slack = 3 binomial sigma
    at k=10). The measured
    numbers (LSH ~1% scan -> recall ~0, IVF 25-30% scan -> recall
    0.3-0.6) are the honest statement that sublinear ANN needs
    clustered embeddings to beat its scan fraction; on real embedding
    corpora (which cluster) IVF recovers. Rounded to 1 decimal so the
    hash compare is stable across scale factors."""
    from .stages.similarity import knn_bruteforce, knn_ivf, knn_lsh
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    total = ds.count()
    q = _query_vec(sf_dir)
    truth = set(knn_bruteforce(ds, q, k=10, exclude_id=0)["vec_id"])
    lsh, lsh_scanned = knn_lsh(ds, q, k=10, exclude_id=0, with_stats=True)
    ivf, ivf_scanned = knn_ivf(ds, q, k=10, exclude_id=0, with_stats=True)
    rows = []
    for method, res, scanned in (("ivf", ivf, ivf_scanned),
                                 ("lsh", lsh, lsh_scanned)):
        recall = len(set(res["vec_id"]) & truth) / len(truth)
        frac = scanned / total
        rows.append({
            "method": method,
            "recall_at_10": round(recall, 4),
            "scan_fraction": round(frac, 4),
            "recall_bounded_by_scan": bool(recall <= frac + 0.45),
        })
    # the bound is ASSERTED, not just reported: an isotropic corpus
    # where an index recalls far above its scan fraction means the
    # stats plumbing (scanned counts / truth set) broke
    bad = [r["method"] for r in rows if not r["recall_bounded_by_scan"]]
    assert not bad, f"ANN recall exceeded scan-fraction bound: {bad}"
    return pd.DataFrame(rows).sort_values("method").reset_index(drop=True)


def embeddings_near_dup(sf_dir: str) -> pd.DataFrame:
    from .stages.dedup import embedding_dedup_pairs
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_dedup_pairs(ds, threshold=0.95)


def _semantic_pairs_ds(sf_dir: str):
    """Shared SemDeDup pair stage: inject the deterministic collinear
    duplicates (the raw sf corpus is near-orthogonal — max within-label
    cosine 0.47 at sf0.01, so the pass would be vacuous), then a tiled
    within-block pairwise cosine scan at threshold 0.9. Blocking key is
    the label column (kmeans cluster id in production — labels make the
    blocking SQL-mirrorable); one bucketed shuffle on the block key
    moves each block's vectors together, and the scan inside is tiled
    matmul so peak memory is tile^2 regardless of block size. Returns
    a DATASET of integer-only (vec_a, vec_b, block), vec_a < vec_b."""
    from .relational import bucketed_map_groups
    from .stages.similarity import (semantic_inject_batch,
                                    semantic_pairs_group)
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def inject(b: pd.DataFrame) -> pd.DataFrame:
        out = semantic_inject_batch(b)
        return out.assign(label=out["label"].astype("int64"))

    return bucketed_map_groups(
        ds.map_batches(inject, batch_format="pandas"), ["label"],
        lambda g: semantic_pairs_group(g, threshold=0.9,
                                       block_col="label"))


def embeddings_semantic_pairs(sf_dir: str) -> pd.DataFrame:
    """SemDeDup-style semantic near-duplicate PAIRS (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — block by cluster, pairwise cosine within blocks).
    The verified surface is integer-only (vec_a, vec_b, block): the
    injected duplicates sit at cosine ~1.0 and the natural corpus at
    <= 0.65, so the 0.9 threshold decision is immune to the
    summation-order ulps that keep raw cosines out of hash-verified
    outputs elsewhere (see docs_tfidf_topk's docstring)."""
    out = _semantic_pairs_ds(sf_dir).to_pandas()
    if out.empty:
        return pd.DataFrame({"vec_a": pd.array([], dtype="int64"),
                             "vec_b": pd.array([], dtype="int64"),
                             "block": pd.array([], dtype="int64")})
    return (out.astype({"vec_a": "int64", "vec_b": "int64",
                        "block": "int64"})
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))


def embeddings_semantic_pairs_kmeans(sf_dir: str) -> pd.DataFrame:
    """SemDeDup with the PAPER'S blocking: L2-normalize, k-means
    cluster the normalized embeddings (broadcast-centroid /
    sufficient-statistics layout, deterministic lowest-vec_id seeds,
    5 Lloyd iterations — same distributed shape as embeddings_kmeans),
    then the tiled within-CLUSTER cosine scan. Cross-cluster pairs are
    missed BY DESIGN — that is SemDeDup's approximation. Scale shape
    (stages/similarity.kmeans_blocked_pairs): k = max(8, ceil(n /
    target_cluster_rows)) — the paper's "cluster fits a worker" design
    point, ~110k clusters at web scale — the within-cluster scan
    enforces a hard 4x-target per-cluster row budget, and an oversized
    cluster is recursively re-clustered, never materialized in one
    task. At fixture scale (<= 32k rows) k stays 8, so the pair set is
    unchanged from the fixed-k version. The SQL oracle (threshold over
    all within-LABEL pairs, no clustering) is exact here because every
    >=0.9 pair in the fixture corpus is a collinear injected
    duplicate: collinear vectors normalize to the SAME point,
    identical points share a nearest centroid, so each such pair is
    intra-cluster and the blocking's recall is provably 1.0 on this
    corpus (natural pairs max out at cosine ~0.51). That
    within-label invariant is FIXTURE-CORPUS-SCOPED and asserted at
    runtime (label_col below): a future corpus with a legitimate
    cross-label pair fails loudly in the scan task, not as an opaque
    driver hash mismatch. Verified surface: integer-only
    (vec_a, vec_b)."""
    from .stages.similarity import (kmeans_blocked_pairs,
                                    semantic_inject_batch)
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        out = semantic_inject_batch(b)
        normed = []
        for v in out["embedding"]:
            v = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(v)
            normed.append(v / n if n > 0 else v)
        lab = out["label"].astype("int64")
        out = out[["vec_id"]].copy(deep=False)
        out["embedding"] = pd.Series(normed, index=out.index,
                                     dtype=object)
        out["label"] = lab
        return out

    # iterative re-scan: pin the normalized working set once
    nds = ds.map_batches(prep, batch_format="pandas").materialize()
    pairs = kmeans_blocked_pairs(nds, threshold=0.9, label_col="label")
    if pairs.empty:
        return pd.DataFrame({"vec_a": pd.array([], dtype="int64"),
                             "vec_b": pd.array([], dtype="int64")})
    return (pairs.astype({"vec_a": "int64", "vec_b": "int64"})
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))


def embeddings_semantic_dedup(sf_dir: str) -> pd.DataFrame:
    """SemDeDup KEEP-LIST: connected components over the semantic pair
    graph, min-id representative per component — kept=1 rows are the
    exemplars a SemDeDup prune retains, kept=0 rows the semantic
    duplicates it drops. Components via the same adaptive distributed
    min-label propagation the MinHash keep-set uses (driver union-find
    only under the broadcast byte budget). Oracle: a recursive-CTE
    min-label closure in DuckDB, so the full graph semantics — not
    just the pair list — are value-hash-verified end to end."""
    import pyarrow as pa

    from .stages.dedup import components_min_label
    pairs = _semantic_pairs_ds(sf_dir).map_batches(
        lambda t: pa.table({"id_a": t.column("vec_a"),
                            "id_b": t.column("vec_b")}),
        batch_format="pyarrow")
    comp = components_min_label(pairs)
    if comp.empty:
        return pd.DataFrame({"vec_id": pd.array([], dtype="int64"),
                             "rep": pd.array([], dtype="int64"),
                             "kept": pd.array([], dtype="int64")})
    out = comp.rename(columns={"node": "vec_id"})
    out["kept"] = (out["vec_id"] == out["rep"]).astype("int64")
    return (out.astype({"vec_id": "int64", "rep": "int64"})
            .sort_values("vec_id").reset_index(drop=True))


# ------------------------------------------------- rows-only: dedup family

def dedup_minhash_word(sf_dir: str) -> pd.DataFrame:
    from .stages.dedup import minhash_dedup_pairs
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return minhash_dedup_pairs(ds, shingle="word3", threshold=0.7)


def dedup_ngram_char(sf_dir: str) -> pd.DataFrame:
    from .stages.dedup import minhash_dedup_pairs
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return minhash_dedup_pairs(ds, shingle="char5", threshold=0.7)


def docs_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """EXACT set-similarity join (no MinHash approximation): all doc
    pairs with word-3-shingle Jaccard >= 0.5 over the df<=256-filtered
    shingle space, via the distributed inverted-index plan
    (stages.dedup.jaccard_pairs_exact) — the SQL-oracle-able anchor for
    the approximate dedup family."""
    from .stages.dedup import jaccard_pairs_exact
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return jaccard_pairs_exact(ds, k=3, threshold=0.5, max_df=256)


def docs_containment_pairs(sf_dir: str) -> pd.DataFrame:
    """EXACT containment join (shared / min(|A|, |B|) >= 0.8 over the
    same df-filtered word-3-shingle space): finds docs embedded inside
    larger ones — quote blocks, concatenated crawls — that symmetric
    Jaccard misses because the big doc dilutes the union. Same
    inverted-index plan as docs_jaccard_pairs, different denominator;
    SQL-exact."""
    from .stages.dedup import jaccard_pairs_exact
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return jaccard_pairs_exact(ds, k=3, threshold=0.8, max_df=256,
                               metric="containment")


def dedup_cluster_stats(sf_dir: str) -> pd.DataFrame:
    """Dedup VALUE report: near-dup cluster-size histogram plus the
    chars the keep-set saves — the number a curation run is judged by.
    Components come from the verified MinHash pairs (distributed
    min-label propagation); sizes histogram from the tiny components
    frame; chars saved = distributed char-count of dropped ids via the
    adaptive id filter. Rows-only (LSH); deterministic."""
    from .stages.dedup import (components_min_label,
                               minhash_dedup_pairs_ds, _id_filter)
    import ray.data as rd
    ds = read_table(sf_dir, "documents", ["doc_id", "text"]) \
        .materialize()
    pairs = minhash_dedup_pairs_ds(ds, threshold=0.7).materialize()
    comp = components_min_label(pairs)
    if comp.empty:
        return pd.DataFrame({
            "cluster_size": pd.array([], dtype="int64"),
            "n_clusters": pd.array([], dtype="int64"),
            "chars_dropped": pd.array([], dtype="int64")})
    sizes = comp.groupby("rep").size()
    hist = (sizes.value_counts().rename_axis("cluster_size")
            .reset_index(name="n_clusters")
            .sort_values("cluster_size").reset_index(drop=True))
    dropped = comp.loc[comp["node"] != comp["rep"], ["node"]] \
        .rename(columns={"node": "doc_id"})
    dropped_chars = int(_id_filter(
        ds, rd.from_pandas(dropped), "doc_id").map_batches(
        lambda b: pd.DataFrame({"c": [int(b["text"].str.len().sum())]}),
        batch_format="pandas").to_pandas()["c"].sum())
    hist = hist.astype({"cluster_size": "int64", "n_clusters": "int64"})
    hist["chars_dropped"] = np.int64(dropped_chars)
    return hist


def dedup_minhash_eval(sf_dir: str, *, eval_docs: int = 20_000) -> pd.DataFrame:
    """MinHash QUALITY EVALUATION against exact ground truth — the
    honest sketch-calibration report: the approximate pipeline's pairs
    (word-3 shingles, 128 perms, 16 bands, signature-estimate >= 0.7)
    are scored against the EXACT Jaccard-similarity join at the same
    shingle space and threshold. The truth join is BOUNDED at scale:
    both sides run over a deterministic bottom-k doc sample (smallest
    ``eval_docs`` stable doc_id hashes — the whole corpus when it is
    smaller, so test-scale results are unsampled). Within the sample
    the truth is EXACT over the FULL shingle space (max_df = sample
    size, the cap can never bind): per-shingle df is bounded by
    ``eval_docs``, so the worst-case pair expansion is eval_docs^2 —
    a fixed calibration budget independent of corpus size — and the
    approx side's exact-verified pairs are measured in the SAME space
    (a df cap applied to the truth only would score the two sides in
    different similarity spaces and could fail the precision assert on
    a healthy sketch). Reports measured
    precision/recall with both ASSERTED >= 0.8 — a failing sketch
    raises instead of silently reporting garbage. Precision is 1.0 by
    construction (candidates are exact-verified, and the precision
    denominator uses the verifier's own rounded acceptance region so a
    J-in-[0.69995, 0.7) boundary pair is not miscounted as a false
    positive); the recall floor
    holds because this corpus's true pairs sit at J >= ~0.85 where the
    16x8 banding S-curve exceeds 0.99 (at exactly J=0.7 the curve
    gives only 0.61 — borderline pairs are inherently probabilistic in
    LSH, which is WHY the assertion evaluates against the exact truth
    join rather than trusting the curve). Deterministic end to end
    (rows-only check)."""
    import ray.data as rd

    from .relational import topk
    from .stages.dedup import (_id_filter, jaccard_pairs_exact,
                               minhash_dedup_pairs)
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    hds = ds.map_batches(
        lambda b: pd.DataFrame({
            "doc_id": b["doc_id"].values,
            "h": pd.util.hash_pandas_object(
                b["doc_id"], index=False).to_numpy()}),
        batch_format="pandas")
    sample = topk(hds, ["h"], [True], eval_docs,
                  columns=["doc_id", "h"])
    if len(sample) >= eval_docs:
        ds = _id_filter(ds, rd.from_pandas(sample[["doc_id"]]),
                        "doc_id")
    # the eval corpus feeds BOTH the approx pipeline (which scans it
    # twice itself) and the exact truth join — pin it so the read (+
    # sample filter) runs once per the repo-wide multi-consumer rule
    ds = ds.materialize()
    approx = minhash_dedup_pairs(ds, threshold=0.7, shingle="word3")
    # the approx verify accepts round(J, 4) >= 0.7 (i.e. J >= 0.69995)
    # — run the truth join just below that and split it into the SAME
    # rounded acceptance region (precision side: a borderline pair the
    # approx verifier accepted is not a false positive) and the strict
    # J >= 0.7 set (recall side), so neither score can fail on a
    # rounding-boundary pair
    truth = jaccard_pairs_exact(ds, k=3, threshold=0.6999,
                                max_df=eval_docs)
    j = truth["jaccard"].to_numpy(dtype=np.float64)
    accepted = np.round(j, 4) >= 0.7
    ap = set(zip(approx["id_a"], approx["id_b"]))
    relaxed = set(zip(truth.loc[accepted, "id_a"],
                      truth.loc[accepted, "id_b"]))
    strict = set(zip(truth.loc[j >= 0.7, "id_a"],
                     truth.loc[j >= 0.7, "id_b"]))
    precision = len(ap & relaxed) / len(ap) if ap else 1.0
    recall = len(ap & strict) / len(strict) if strict else 1.0
    tp_pairs = strict
    assert precision >= 0.8 and recall >= 0.8, \
        f"minhash quality collapsed: p={precision} r={recall}"
    return pd.DataFrame({
        "n_approx_pairs": pd.array([len(ap)], dtype="int64"),
        "n_true_pairs": pd.array([len(tp_pairs)], dtype="int64"),
        "precision": [round(precision, 3)],
        "recall": [round(recall, 3)],
        "both_above_080": pd.array([True], dtype="bool"),
    })


def dedup_minhash_keep(sf_dir: str) -> pd.DataFrame:
    """Near-dup dedup as a FILTER: connected components over verified
    pairs, min-id representative kept per component."""
    from .stages.dedup import minhash_dedup_keep
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return minhash_dedup_keep(ds, threshold=0.7)


def dedup_simhash(sf_dir: str) -> pd.DataFrame:
    from .stages.dedup import simhash_dedup_pairs
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return simhash_dedup_pairs(ds, max_hamming=3)


def docs_lang_id(sf_dir: str) -> pd.DataFrame:
    from .pipelines.extraction import pool_size
    from .stages.text_analysis import LangId
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return (ds.map_batches(LangId, batch_format="pandas",
                           concurrency=pool_size())
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def docs_winnow_fingerprints(sf_dir: str) -> pd.DataFrame:
    from .stages.text_analysis import winnow_batch
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return (ds.map_batches(winnow_batch, batch_format="pandas")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


# ------------------------------------- rows-only: flagship extraction suite

def flagship_extract(sf_dir: str) -> pd.DataFrame:
    from .pipelines.extraction import run_extraction
    ds = run_extraction(sf_dir, ordered=True)
    return ds.to_pandas()


def transcript_strip_boilerplate(sf_dir: str) -> pd.DataFrame:
    """Extraction composed with CROSS-TURN boilerplate stripping: after
    the per-turn geometric header/footer strip, lines that still repeat
    across >=50%% of a conversation's turns (template chrome the
    geometry can't see) are removed per conversation — two
    cardinality-bounded aggregates plus one conv_id-co-partitioned
    shuffle, never a whole conversation in one task
    (stages/boilerplate.py). Returns per-conversation totals (rows-only
    check: the transcript corpus is synthesized, not SQL-visible;
    semantics are pinned by tests/test_boilerplate.py)."""
    from .pipelines.extraction import run_extraction
    from .stages.boilerplate import strip_conv_boilerplate
    ds = run_extraction(sf_dir, ordered=False)
    stripped = strip_conv_boilerplate(ds)
    out = grouped_agg(
        stripped.map_batches(
            lambda b: pd.DataFrame({
                "conv_id": b["conv_id"].values,
                "n_stripped_lines": b["n_stripped_lines"].values,
                "n_chars": b["extracted_text"].str.len()
                .to_numpy(dtype=np.int64)}),
            batch_format="pandas"),
        ["conv_id"], {"turns": ("count", None),
                      "stripped_lines": ("sum", "n_stripped_lines"),
                      "kept_chars": ("sum", "n_chars")})
    return (out.astype({"turns": "int64", "stripped_lines": "int64",
                        "kept_chars": "int64"})
            .sort_values("conv_id").reset_index(drop=True))


def transcript_sft_pairs(sf_dir: str) -> pd.DataFrame:
    """SFT PAIR CONSTRUCTION — the canonical post-training data op:
    each assistant turn is paired with the most recent preceding USER
    turn of its conversation (tool turns in between are counted as
    the agentic tool-call depth, not paired). Runs on the EXTRACTED
    turns (the engine's own product) through the SALTED pairing stage
    (stages/sft.py): turns co-partition on
    (conv_id, turn_idx // salt_turns) with a per-range carry row, so
    a mega-conversation never lands whole in one task. Rows-only
    (synthesized corpus); deterministic."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .sources.transcripts import transcripts_dataset
    from .stages.extract import extract_batch
    from .stages.sft import sft_pairs_from_turns

    # extraction is 1:1 and order-preserving within a batch, so role
    # rides along in the SAME rows — no (conv_id, turn_idx) equi-join
    # shuffle between the extracted chars and the role column at all
    def ex_with_role(b: pa.Table) -> pa.Table:
        out = extract_batch(b)
        return pa.table({
            "conv_id": out.column("conv_id"),
            "turn_idx": out.column("turn_idx"),
            "role": b.column("role"),
            "chars": pc.cast(pc.utf8_length(
                out.column("extracted_text")), pa.int64()),
        })

    turns = transcripts_dataset(sf_dir).map_batches(
        ex_with_role, batch_format="pyarrow")
    out = sft_pairs_from_turns(turns).to_pandas()
    return (out.astype({"response_turn_idx": "int64",
                        "response_chars": "int64",
                        "gap_turns": "int64"})
            .sort_values(["conv_id", "response_turn_idx"])
            .reset_index(drop=True))


def transcript_tool_error_rates(sf_dir: str) -> pd.DataFrame:
    """Extraction QA report: per-tool turn counts, error-record counts
    (the kernel's record-level containment — metadata carries an
    'error' key, the task never fails), and mean extracted chars for
    clean turns. The report any production extraction run is gated on;
    rows-only (transcript corpus is synthesized). Error detection uses
    the same canonical metadata the sinks consume."""
    from .pipelines.extraction import run_extraction
    ds = run_extraction(sf_dir, ordered=False)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        is_err = b["metadata_json"].str.contains('"error":', regex=False)
        return pd.DataFrame({
            "tool": b["tool"].values,
            "err": is_err.to_numpy(dtype=np.int64),
            "chars": np.where(is_err.to_numpy(),
                              np.int64(0),
                              b["extracted_text"].str.len()
                              .to_numpy(dtype=np.int64))})

    g = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                    ["tool"], {"turns": ("count", None),
                               "error_turns": ("sum", "err"),
                               "sum_chars": ("sum", "chars")})
    clean = g["turns"].to_numpy(dtype=np.int64) \
        - g["error_turns"].to_numpy(dtype=np.int64)
    g["error_rate"] = np.round(
        g["error_turns"].to_numpy(dtype=np.float64)
        / g["turns"].to_numpy(dtype=np.float64), 6)
    g["mean_clean_chars"] = np.round(np.where(
        clean > 0,
        g["sum_chars"].to_numpy(dtype=np.float64) / np.maximum(clean, 1),
        0.0), 2)
    return (g[["tool", "turns", "error_turns", "error_rate",
               "mean_clean_chars"]]
            .astype({"turns": "int64", "error_turns": "int64"})
            .sort_values("tool").reset_index(drop=True))


def transcript_train_shards(sf_dir: str) -> pd.DataFrame:
    """Full pipeline to TRAINING-READY OUTPUT: extraction -> select the
    text payload -> deterministic hash-sharded export (16 shards,
    pseudo-random within-shard order, atomic commits + manifest,
    state/shards.py). Returns the manifest; re-runs are byte-identical
    under any partitioning (the invariance tests pin this)."""
    import shutil

    from .pipelines.extraction import run_extraction
    from .state.shards import write_training_shards
    out = "/tmp/pdf_parser_ray_train_shards"
    shutil.rmtree(out, ignore_errors=True)
    extracted = run_extraction(sf_dir)
    m = write_training_shards(
        extracted.map_batches(
            lambda b: b[["conv_id", "turn_idx", "extracted_text"]],
            batch_format="pandas"),
        out, key_col="conv_id", n_shards=16)
    return m


def transcript_wave_extract(sf_dir: str) -> pd.DataFrame:
    """Wave-level INCREMENTAL extraction (state/waves.py): the corpus
    arrives as two daily file drops; the second submission passes the
    full listing and must process only the new file, a third is a
    committed no-op, and the union over waves must equal a one-shot
    extraction of everything (asserted live). Returns the per-wave
    report. Rows-only (stateful filesystem protocol — no SQL)."""
    import glob
    import shutil
    import tempfile

    from .sources.transcripts import transcripts_dataset
    from .state.waves import extract_wave, read_waves

    work = tempfile.mkdtemp(prefix="wave_extract_")
    try:
        # build the two daily drops as STREAMED writes — the corpus
        # never lands on the driver (r4 VERDICT item 7); the split
        # hash is per-row, so a map_batches filter is exact
        ts = transcripts_dataset(sf_dir).materialize()
        total_rows = ts.count()

        def day_slice(b: pd.DataFrame, day: int) -> pd.DataFrame:
            h = pd.util.hash_pandas_object(b["conv_id"],
                                           index=False).to_numpy() % 2
            return b[h == day]

        files = []
        for day in range(2):
            ddir = f"{work}/day{day}"
            (ts.map_batches(day_slice, fn_kwargs={"day": day},
                            batch_format="pandas")
             .write_parquet(ddir))
            files.extend(sorted(glob.glob(f"{ddir}/*.parquet")))
        day0 = [f for f in files if "/day0/" in f]
        out = f"{work}/corpus"
        rows = []
        w0, m0 = extract_wave(day0, out, n_buckets=8)
        rows.append({"wave": w0, "n_files": len(day0),
                     "rows": int(m0["rows"].sum()),
                     "error_rows": int(m0["error_rows"].sum())})
        w1, m1 = extract_wave(files, out, n_buckets=8)
        rows.append({"wave": w1, "n_files": len(files) - len(day0),
                     "rows": int(m1["rows"].sum()),
                     "error_rows": int(m1["error_rows"].sum())})
        w2, m2 = extract_wave(files, out, n_buckets=8)
        assert w2 is None and m2.empty, "resubmission was not a no-op"
        assert read_waves(out).count() == total_rows, \
            "union over waves != one-shot extraction row count"
        return (pd.DataFrame(rows)
                .astype({"wave": "int64", "n_files": "int64",
                         "rows": "int64", "error_rows": "int64"}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def transcript_questions(sf_dir: str) -> pd.DataFrame:
    from .pipelines.extraction import run_extraction
    from .stages.questions import questions_dataset
    extracted = run_extraction(sf_dir)
    return questions_dataset(extracted).to_pandas()


def conversation_markdown(sf_dir: str) -> pd.DataFrame:
    from .pipelines.extraction import run_extraction
    from .stages.assemble import markdown_dataset
    extracted = run_extraction(sf_dir)
    return (markdown_dataset(extracted).to_pandas()
            .sort_values("conv_id").reset_index(drop=True))


def transcript_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact (conv_id, turn_idx) dedup over a corpus with injected
    duplicate rows (D1 analog)."""
    import ray.data as rd
    from .sources.transcripts import transcripts_table
    from .stages.dedup import exact_dedup_rows
    t = transcripts_table(sf_dir, with_duplicates=True)
    ds = rd.from_arrow(t.select(["conv_id", "turn_idx", "role", "tool"]))
    out = exact_dedup_rows(ds, ["conv_id", "turn_idx"]).to_pandas()
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def conversation_json_envelopes(sf_dir: str) -> pd.DataFrame:
    """S3 sink analog: per-conversation JSON layout envelope."""
    from .pipelines.extraction import run_extraction
    from .stages.sinks import conversation_json_dataset
    out = conversation_json_dataset(run_extraction(sf_dir)).to_pandas()
    return out.sort_values("conv_id").reset_index(drop=True)


def conversation_markdown_c001(sf_dir: str) -> pd.DataFrame:
    """S6 sink analog: C001 comment-marker markdown variant."""
    from .pipelines.extraction import run_extraction
    from .stages.sinks import markdown_c001_dataset
    out = markdown_c001_dataset(run_extraction(sf_dir)).to_pandas()
    return out.sort_values("conv_id").reset_index(drop=True)


def questions_reports(sf_dir: str) -> pd.DataFrame:
    """S4+S5 sink analogs: per-conversation question JSON + markdown."""
    from .pipelines.extraction import run_extraction
    from .stages.questions import questions_dataset
    from .stages.sinks import questions_json_dataset, questions_markdown_dataset
    qs = questions_dataset(run_extraction(sf_dir)).materialize()
    md = questions_markdown_dataset(qs).to_pandas()
    js = questions_json_dataset(qs).to_pandas()[["conv_id", "questions_json"]]
    out = md.merge(js, on="conv_id")
    return out.sort_values("conv_id").reset_index(drop=True)


def extract_compare_strategies(sf_dir: str) -> pd.DataFrame:
    """Multi-strategy comparison harness (pdf_layout_tester.py:325-365
    analog): every strategy over the same transcripts, summarized."""
    import ray.data as rd
    from .pipelines.extraction import compare_strategies
    from .sources.transcripts import transcripts_table
    t = transcripts_table(sf_dir, limit_docs=60)
    results = compare_strategies(rd.from_arrow(t),
                                 ["a000", "a002", "a003", "a004"])
    rows = []
    for name, ds in results.items():
        df = ds.to_pandas()
        rows.append({
            "strategy": name,
            "n_turns": len(df),
            "n_with_header": int((df["header"] != "").sum()),
            "n_with_footer": int((df["footer"] != "").sum()),
            "extracted_chars": int(df["extracted_text"].str.len().sum()),
        })
    return (pd.DataFrame(rows).sort_values("strategy")
            .reset_index(drop=True))


def transcript_turnspec_filter(sf_dir: str) -> pd.DataFrame:
    """M15 page-spec analog: parse '2-4' and push the turn_idx predicate
    into the stream."""
    import ray.data as rd
    from .functions.pagespec import filter_turns
    from .sources.transcripts import transcripts_table
    t = transcripts_table(sf_dir, limit_docs=100)
    ds = rd.from_arrow(t.select(["conv_id", "turn_idx", "tool"]))
    out = filter_turns(ds, "2-4").to_pandas()
    return (out.sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))


def multimodal_frames(sf_dir: str) -> pd.DataFrame:
    """Video frame sampling (flat map) + image resize plumbing over the
    synthetic media table; features rounded for stable hashing."""
    import ray.data as rd
    from .stages.multimodal import (ResizeImages, decode_media_dataset,
                                    sample_frames_dataset,
                                    synth_media_table)
    # split the synthetic table so the actor pool has >1 input block
    media = rd.from_arrow(synth_media_table(60)).repartition(8)
    frames = sample_frames_dataset(media, n_frames=3).to_pandas()
    frames["features"] = frames["features"].map(
        lambda a: np.round(np.asarray(a, dtype=np.float64), 4).tolist())
    from .pipelines.extraction import pool_size
    resized = decode_media_dataset(
        media.map_batches(ResizeImages, batch_format="pyarrow",
                          batch_size=16, concurrency=pool_size(),
                          fn_constructor_kwargs={"width": 64, "height": 48})
    ).to_pandas()
    im = resized[resized["kind"] == "im"]
    au_vi = resized[resized["kind"] != "im"]
    orig = decode_media_dataset(media).to_pandas()
    assert (im["width"] == 64).all() and (im["height"] == 48).all()
    # non-image payloads must be untouched by the resize stage
    assert au_vi.sort_values("media_id")[["width", "height"]].equals(
        orig[orig["kind"] != "im"]
        .sort_values("media_id")[["width", "height"]])
    return frames.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def multimodal_audio_chunks(sf_dir: str) -> pd.DataFrame:
    """Windowed audio segmentation (the ASR pre-step) — the one
    multimodal path that is FULLY REAL in this container: it slices
    raw payload bytes (no codec), rewriting each chunk's header so it
    stands alone. Checked invariants: stride/window coverage is exact
    (every body byte appears in ceil((len-window)/stride)+1 windows'
    union), chunk headers re-decode, and the output is deterministic
    under repartitioning. Returned without the binary column (hash
    surface: ids, offsets, lengths, chunk blake2b)."""
    import hashlib

    import ray.data as rd
    from .stages.multimodal import chunk_audio_dataset, synth_media_table
    media = rd.from_arrow(synth_media_table(60)).repartition(8)
    chunks = chunk_audio_dataset(media, window=64, stride=48).to_pandas()
    # re-decode every chunk header (standalone-clip invariant)
    from .stages.multimodal import DecodeMedia
    dec = DecodeMedia("fake")
    for p in chunks["payload"]:
        dec._decode(p)
    chunks["chunk_hash"] = chunks["payload"].map(
        lambda p: hashlib.blake2b(p, digest_size=8).hexdigest())
    return (chunks.drop(columns="payload")
            .sort_values(["media_id", "chunk_idx"])
            .reset_index(drop=True))


def multimodal_decode(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd
    from .stages.multimodal import synth_media_table, decode_media_dataset
    media = rd.from_arrow(synth_media_table(96)).repartition(8)
    df = decode_media_dataset(media).to_pandas()
    df["features"] = df["features"].map(
        lambda a: np.round(np.asarray(a, dtype=np.float64), 4).tolist())
    return df.sort_values("media_id").reset_index(drop=True)


def transcript_conv_near_dup(sf_dir: str) -> pd.DataFrame:
    """CONVERSATION-LEVEL near-duplicate detection — the transcript
    analog of document MinHash dedup, WITHOUT ever assembling a
    conversation in one task: a conv's signature is the elementwise
    min of its turns' signatures (MinHash union property), built as
    mergeable partials; banding yields candidate conv pairs; the exact
    union-set Jaccard over the candidates' turn rows (multi-row
    postings dedupe) decides. Runs on the EXTRACTED turns, so
    near-duplicate source documents surface as near-duplicate
    conversations. Threshold 0.45 with 32 bands x 4 rows: the S-curve
    gives ~0.74 candidate recall at J=0.45 (0.87 at 0.5) while junk
    collisions stay ~0.3% of pairs — 2-row bands were measured to
    admit ~half of ALL pairs as candidates, degrading to the full
    quadratic join. Precision is 1.0 by construction (EXACT union-set
    Jaccard verification, df<=256-filtered shingle space like
    docs_jaccard_pairs). Rows-only (extraction-derived);
    deterministic (seeded permutations)."""
    from .pipelines.extraction import run_extraction
    from .stages.dedup import grouped_minhash_pairs
    ex = run_extraction(sf_dir, ordered=False).map_batches(
        lambda b: pd.DataFrame({
            # conv ids are "conv-%08d": the integer suffix is the
            # stable int64 group key the pair machinery needs
            "conv": b["conv_id"].str.slice(5).astype(np.int64),
            "text": b["extracted_text"].to_numpy()}),
        batch_format="pandas")
    pairs = grouped_minhash_pairs(ex, group_col="conv", text_col="text",
                                  threshold=0.45, bands=32)
    out = pairs.rename(columns={"id_a": "conv_a", "id_b": "conv_b"})
    return (out.astype({"conv_a": "int64", "conv_b": "int64"})
            .sort_values(["conv_a", "conv_b"]).reset_index(drop=True))


def docs_train_val_test_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic TRAIN/VAL/TEST split — the assignment every
    curation pipeline must reproduce identically on any cluster shape
    and any re-run: split = multiplicative hash of doc_id mod 10
    (0-7 train, 8 val, 9 test → 80/10/10 in expectation), pure
    integer arithmetic mirrored exactly in the SQL oracle (same
    HUGEINT trick as docs_shuffle_order). Verified surface: per
    (split, lang) doc counts + char sums — proves assignment AND that
    the split is content-complete (counts add up across splits)."""
    from .relational import grouped_agg
    ds = read_table(sf_dir, "documents", ["doc_id", "lang", "text"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        h = ((ids.astype(np.uint64) * np.uint64(2654435761))
             % np.uint64(4294967296)) % np.uint64(10)
        split = np.where(h < 8, "train",
                         np.where(h == 8, "val", "test"))
        return pd.DataFrame({
            "split": split,
            "lang": b["lang"].to_numpy(),
            "n_chars": b["text"].str.len().to_numpy(dtype=np.int64)})

    g = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                    ["split", "lang"], {"n_docs": ("count", None),
                                        "sum_chars": ("sum", "n_chars")})
    return (g.astype({"n_docs": "int64", "sum_chars": "int64"})
            .sort_values(["split", "lang"]).reset_index(drop=True))


def multimodal_resize_raw(sf_dir: str) -> pd.DataFrame:
    """REAL image resampling (no codec, no stub): raw w*h*c uint8
    pixel payloads bilinear-resized to 32x24 in an actor-pool stage —
    the image analog of the audio-chunking path. Live invariants: the
    output body is exactly 32*24*c bytes and, because bilinear is an
    averaging kernel with half-pixel centers, the per-image pixel mean
    is preserved within a few units of gray. Hash surface: dims + the
    blake2b of the resized bytes (deterministic end to end)."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from .stages.multimodal import (MEDIA_SCHEMA, make_raw_image_payload,
                                    resize_raw_dataset)
    n = 48
    rows = [(i, "rw", make_raw_image_payload(i), "{}") for i in range(n)]
    media = rd.from_arrow(pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.int64()),
         pa.array([r[1] for r in rows], pa.string()),
         pa.array([r[2] for r in rows], pa.large_binary()),
         pa.array([r[3] for r in rows], pa.string())],
        schema=MEDIA_SCHEMA)).repartition(6)
    out = resize_raw_dataset(media, width=32, height=24).to_pandas()
    import struct as _st
    recs = []
    for _, r in out.iterrows():
        p = bytes(r["payload"])
        w, h, c = _st.unpack("<IIH", p[7:17])
        body = np.frombuffer(p, dtype=np.uint8, offset=17)
        assert (w, h) == (32, 24) and len(body) == w * h * c
        src = np.frombuffer(make_raw_image_payload(int(r["media_id"])),
                            dtype=np.uint8, offset=17)
        mean_in, mean_out = float(src.mean()), float(body.mean())
        assert abs(mean_in - mean_out) < 6.0, \
            f"bilinear mean drifted: {mean_in} -> {mean_out}"
        recs.append({
            "media_id": int(r["media_id"]),
            "w_out": int(w), "h_out": int(h), "channels": int(c),
            "mean_shift_ok": True,
            "out_blake2b": hashlib.blake2b(
                p, digest_size=16).hexdigest(),
        })
    return (pd.DataFrame(recs).sort_values("media_id")
            .reset_index(drop=True))


def events_value_hour_corr(sf_dir: str) -> pd.DataFrame:
    """Per-type Pearson correlation and OLS slope of event value
    (exact cents) against hour-of-day — the one-pass
    SUFFICIENT-STATISTICS aggregate (n, Σx, Σy, Σxy, Σx², Σy², all
    exact int64) that generalizes to any distributed corr/covariance/
    regression: partials combine associatively, so the result is
    parallelism-invariant, and the tiny per-type final is driver-side.
    The float expression tree over the exact sums is mirrored term for
    term in the SQL oracle (every sum here is < 2^53, so the
    int->double casts are exact on both sides). Scale note: Σy² is the
    first sum to threaten int64 (~4e9 rows/type at these cent
    magnitudes); past that the partial would split into two int64
    limbs, the same trick the packed-uint64 co-count combine uses."""
    ds = read_table(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        x = b["ts"].dt.hour.to_numpy(np.int64)
        y = _cents(b["value"])
        return pd.DataFrame({"event_type": b["event_type"].values,
                             "x": x, "y": y, "xy": x * y,
                             "xx": x * x, "yy": y * y})

    g = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                    ["event_type"],
                    {"n": ("count", None), "sx": ("sum", "x"),
                     "sy": ("sum", "y"), "sxy": ("sum", "xy"),
                     "sxx": ("sum", "xx"), "syy": ("sum", "yy")})
    if g.empty:                   # no events — typed empty report
        return pd.DataFrame({
            "event_type": pd.Series(dtype="object"),
            "n_events": pd.Series(dtype="int64"),
            "corr_value_hour": pd.Series(dtype="float64"),
            "slope_cents_per_hour": pd.Series(dtype="float64")})
    # the exact-mirror contract needs every sum to cast to double
    # losslessly; Σy² breaks that first at extreme scale (int64 would
    # wrap even earlier, silently) — fail loudly, don't drift quietly
    for col in ("sx", "sy", "sxy", "sxx", "syy"):
        assert g[col].abs().max() < 2 ** 53, (
            f"{col} exceeds 2^53: the int->double cast is no longer "
            "exact — split this sum into two int64 limbs (see the "
            "packed-uint64 co-count combine) before trusting corr")
    n = g["n"].to_numpy(dtype=np.float64)
    sx = g["sx"].to_numpy(dtype=np.float64)
    sy = g["sy"].to_numpy(dtype=np.float64)
    sxy = g["sxy"].to_numpy(dtype=np.float64)
    sxx = g["sxx"].to_numpy(dtype=np.float64)
    syy = g["syy"].to_numpy(dtype=np.float64)
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    # zero-variance groups (single event, constant column): the exact
    # integer sums make cov exactly 0 there too, and the SQL oracle's
    # x/0 yields NULL — mirror it with NaN instead of crashing the
    # whole report on an assert
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = np.where((vx > 0) & (vy > 0),
                        cov / np.sqrt(vx * vy), np.nan)
        slope = np.where(vx > 0, cov / vx, np.nan)
    out = pd.DataFrame({
        "event_type": g["event_type"],
        "n_events": g["n"].astype("int64"),
        "corr_value_hour": np.round(corr, 6),
        "slope_cents_per_hour": np.round(slope, 6)})
    return out.sort_values("event_type").reset_index(drop=True)


def docs_source_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-source unigram Shannon entropy + type/token ratio — the
    corpus-diversity report (a collapsed or template-generated source
    shows up as low entropy long before eyeballing samples would).
    Two-level distributed shape: per-batch (source, token) tf partials
    (Arrow group-by) -> bucketed vocabulary combine that STAYS a
    Dataset -> per-batch Σc·log2(c)/Σc/type-count partials -> tiny
    per-source final. H = log2(N) - Σc·log2(c)/N, so entropy needs
    only mergeable sums, never the materialized distribution. Token
    counts are exact ints; the two float divisions and log2 mirror the
    SQL oracle's expression tree (summation-order float drift is
    ~1e-9 absolute on Σc·log2 c, invisible at the 6-decimal
    surface)."""
    from .stages.text_analysis import tf_rows_arrow
    ds = read_table(sf_dir, "documents", ["source", "text"])
    vocab = grouped_agg_ds(
        ds.map_batches(lambda t: tf_rows_arrow(t, id_col="source"),
                       batch_format="pyarrow"),
        ["source", "token"], {"c": ("sum", "tf")})

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy(dtype=np.int64)
        cf = c.astype(np.float64)
        g = pd.DataFrame({"source": b["source"].values, "n": c,
                          "v": np.int64(1), "s": cf * np.log2(cf)})
        return (g.groupby("source", sort=False)
                .agg(n=("n", "sum"), v=("v", "sum"), s=("s", "sum"))
                .reset_index())

    agg = grouped_agg(vocab.map_batches(partial, batch_format="pandas"),
                      ["source"],
                      {"n_tokens": ("sum", "n"), "n_types": ("sum", "v"),
                       "s": ("sum", "s")})
    if agg.empty:                 # no tokens — typed empty report
        return pd.DataFrame({
            "source": pd.Series(dtype="object"),
            "n_tokens": pd.Series(dtype="int64"),
            "n_types": pd.Series(dtype="int64"),
            "entropy_bits": pd.Series(dtype="float64"),
            "type_token_ratio": pd.Series(dtype="float64")})
    N = agg["n_tokens"].to_numpy(dtype=np.float64)
    assert (N > 0).all(), "source with zero tokens — entropy undefined"
    out = pd.DataFrame({
        "source": agg["source"],
        "n_tokens": agg["n_tokens"].astype("int64"),
        "n_types": agg["n_types"].astype("int64"),
        "entropy_bits": np.round(
            np.log2(N) - agg["s"].to_numpy(dtype=np.float64) / N, 6),
        "type_token_ratio": np.round(
            agg["n_types"].to_numpy(dtype=np.float64) / N, 6)})
    return out.sort_values("source").reset_index(drop=True)


def docs_vocab_overlap(sf_dir: str) -> pd.DataFrame:
    """Pairwise cross-source VOCABULARY Jaccard matrix (which crawl
    sources are re-hosting each other's content?) via the per-token
    source-BITMASK trick: the k distinct sources (k <= 62, asserted)
    get bit values, each globally-distinct (source, token) row
    contributes its bit, and a token's mask is the SUM of its distinct
    bits (= OR, because distinctness makes each bit appear once). The
    expensive part — distinct + mask combine — is two token-keyed
    bucketed shuffles that stay Datasets; each downstream batch then
    folds its masks into a k x k co-occurrence MATRIX (bits^T @ bits,
    one numpy matmul), and those matrices are mergeable sums — so
    what reaches the driver is exactly k(k+1)/2 counts no matter how
    large the vocabulary or how many distinct co-occurrence patterns
    exist. Intersections are the off-diagonal, per-source vocabulary
    sizes the diagonal. Contrast the SQL oracle's token self-join,
    which is Σ_token df² rows — the bitmask plan replaces that blowup
    with one linear pass."""
    import pyarrow as pa  # noqa: F401 — or_partial's batch type
    import ray

    from .relational import bucketed_map_groups, guard_broadcast_bytes
    from .stages.text_analysis import tf_rows_arrow

    ds = read_table(sf_dir, "documents", ["source", "text"])
    srcs = grouped_agg(read_table(sf_dir, "documents", ["source"]),
                       ["source"], {"n": ("count", None)})
    names = ([] if srcs.empty else sorted(srcs["source"].tolist()))
    if len(names) < 2:            # no pairs — typed empty report
        return pd.DataFrame({
            "source_a": pd.Series(dtype="object"),
            "source_b": pd.Series(dtype="object"),
            "n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "n_common": pd.Series(dtype="int64"),
            "n_union": pd.Series(dtype="int64"),
            "jaccard": pd.Series(dtype="float64")})
    assert len(names) <= 62, \
        "bitmask plan holds one int64 lane per source; shard the " \
        "source space (or use multi-limb masks) past 62"
    bit_of = {s: np.int64(1) << np.int64(i) for i, s in enumerate(names)}
    guard_broadcast_bytes(64 * len(bit_of), "source bit map",
                          "co-partition the bit attach by source")
    ref = ray.put(bit_of)

    # bit-OR is idempotent, so no distinct pass is needed before the
    # combine: per-batch (source, token) rows map straight to bits and
    # OR down to one mask row per token — ONE token-keyed shuffle
    # where distinct-then-sum would take two
    def or_partial(t: pa.Table) -> pd.DataFrame:
        bm = ray.get(ref)
        st = tf_rows_arrow(t, id_col="source")
        b = pd.DataFrame({
            "token": st.column("token").to_pandas(),
            "mask": st.column("source").to_pandas().map(bm)
            .to_numpy(dtype=np.int64)})
        return (b.groupby("token", as_index=False, sort=False)["mask"]
                .agg(lambda s: np.bitwise_or.reduce(s.to_numpy())))

    def or_final(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("token", as_index=False, sort=False)["mask"]
                .agg(lambda s: np.bitwise_or.reduce(s.to_numpy())))

    masks = bucketed_map_groups(
        ds.map_batches(or_partial, batch_format="pyarrow"),
        ["token"], or_final)

    k = len(names)

    def pair_matrix(b: pd.DataFrame) -> pd.DataFrame:
        # one row per distinct token: unpack the mask into a rows x k
        # bit matrix and fold the whole batch into k x k counts
        m = b["mask"].to_numpy(dtype=np.int64)
        bits = ((m[:, None] >> np.arange(k, dtype=np.int64)) & 1) \
            .astype(np.int64)
        mat = bits.T @ bits
        iu = np.triu_indices(k)
        return pd.DataFrame({"i": iu[0].astype(np.int64),
                             "j": iu[1].astype(np.int64),
                             "c": mat[iu]})

    cc = grouped_agg(masks.map_batches(pair_matrix,
                                       batch_format="pandas"),
                     ["i", "j"], {"c": ("sum", "c")})
    mat = np.zeros((k, k), dtype=np.int64)
    if not cc.empty:              # empty when every text tokenizes to 0
        mat[cc["i"].to_numpy(dtype=np.int64),
            cc["j"].to_numpy(dtype=np.int64)] = cc["c"].to_numpy(np.int64)

    recs = []
    for i, sa in enumerate(names):
        n_a = int(mat[i, i])
        if n_a == 0:              # token-less source: the oracle's cnt
            continue              # CTE omits it, so pairs must too
        for j in range(i + 1, k):
            sb = names[j]
            n_b = int(mat[j, j])
            if n_b == 0:
                continue
            common = int(mat[i, j])
            union = n_a + n_b - common
            recs.append({"source_a": sa, "source_b": sb,
                         "n_a": n_a, "n_b": n_b, "n_common": common,
                         "n_union": union,
                         "jaccard": round(common / union, 6)})
    cols = {"source_a": "object", "source_b": "object",
            "n_a": "int64", "n_b": "int64", "n_common": "int64",
            "n_union": "int64", "jaccard": "float64"}
    out = pd.DataFrame(recs, columns=list(cols))
    return (out.astype(cols).sort_values(["source_a", "source_b"])
            .reset_index(drop=True))


def events_value_drift_psi(sf_dir: str) -> pd.DataFrame:
    """Per-type distribution DRIFT between the first and second half
    of the event stream — the Population Stability Index check a
    production pipeline runs on every ingest wave before letting new
    data into a training mix. The stream splits at the exact integer
    midpoint of the epoch-microsecond range (one tiny min/max
    aggregate), values land in 10 fixed exact-cents bins, and the
    binned counts are ONE partial-before-shuffle aggregation with
    cardinality types x 2 x 10 — so the driver does only the final
    PSI arithmetic. Add-one smoothing keeps empty bins rational
    (exact ints on both sides); the PSI float expression is mirrored
    term for term in the SQL oracle."""
    N_BINS, BIN_W = 10, 5000
    ds = read_table(sf_dir, "events", ["ts", "event_type", "value"])
    rng = grouped_agg(
        ds.map_batches(
            lambda b: pd.DataFrame(
                {"k": np.int64(0),
                 "us": b["ts"].to_numpy(dtype="datetime64[us]")
                 .astype(np.int64)}),
            batch_format="pandas"),
        ["k"], {"lo": ("min", "us"), "hi": ("max", "us")})
    if rng.empty:                 # no events — typed empty report
        return pd.DataFrame({
            "event_type": pd.Series(dtype="object"),
            "n_first": pd.Series(dtype="int64"),
            "n_second": pd.Series(dtype="int64"),
            "psi": pd.Series(dtype="float64")})
    split_us = (int(rng["lo"].iloc[0]) + int(rng["hi"].iloc[0])) // 2

    def binned(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        c = _cents(b["value"])
        return pd.DataFrame({
            "event_type": b["event_type"].values,
            "w": (us >= split_us).astype(np.int64),
            "bin": np.minimum(N_BINS - 1,
                              np.maximum(0, c // BIN_W))})

    g = grouped_agg(ds.map_batches(binned, batch_format="pandas"),
                    ["event_type", "w", "bin"],
                    {"n": ("count", None)})
    types = sorted(g["event_type"].unique())
    recs = []
    for t in types:
        sub = g[g["event_type"] == t]
        cnt = np.zeros((2, N_BINS), dtype=np.int64)
        cnt[sub["w"].to_numpy(dtype=np.int64),
            sub["bin"].to_numpy(dtype=np.int64)] = \
            sub["n"].to_numpy(dtype=np.int64)
        n_a, n_b = int(cnt[0].sum()), int(cnt[1].sum())
        # add-one smoothing: (c+1)/(N+bins) — exact rationals, no
        # zero-bin infinities, denominators mirrored in the oracle
        p = (cnt[0] + 1).astype(np.float64) / np.float64(n_a + N_BINS)
        q = (cnt[1] + 1).astype(np.float64) / np.float64(n_b + N_BINS)
        psi = float(np.sum((p - q) * np.log(p / q)))
        recs.append({"event_type": t, "n_first": n_a, "n_second": n_b,
                     "psi": round(psi, 6)})
    return (pd.DataFrame(recs)
            .astype({"n_first": "int64", "n_second": "int64"})
            .sort_values("event_type").reset_index(drop=True))


def events_rolling_wau(sf_dir: str) -> pd.DataFrame:
    """Rolling 7-day active users per day (DAU + WAU) — the
    window-DISTINCT shape none of the other aggregates cover: a
    distinct count over a sliding set union, not a sum (a user active
    on 3 of the 7 days counts once). Plan: one distinct pass to
    (day, user), then each row explodes to the <= 7 OBSERVED window
    days it serves (searchsorted against the broadcast day spine —
    day count is calendar-bounded, unlike users), and one more
    bucketed distinct + count gives WAU. Every stage's cardinality is
    bounded by days x users, never events; the x7 explode is the
    exact price the SQL self-join pays, made explicit."""
    import ray

    from .relational import distinct_ds, guard_broadcast_bytes
    ds = read_table(sf_dir, "events", ["ts", "user_id"])

    def du_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "day": b["ts"].dt.floor("D"),
            "user_id": b["user_id"].values}).drop_duplicates()

    du = distinct_ds(ds.map_batches(du_partial, batch_format="pandas"),
                     ["day", "user_id"])
    du = du.materialize()          # two consumers: spine + explode
    dau = grouped_agg(du, ["day"], {"dau": ("count", None)})
    days_arr = np.sort(dau["day"].to_numpy(dtype="datetime64[ns]"))
    guard_broadcast_bytes(8 * len(days_arr), "observed-day spine",
                          "chunk the spine by date range")
    spine = ray.put(days_arr)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        days = ray.get(spine)
        d = b["day"].to_numpy(dtype="datetime64[ns]")
        lo = np.searchsorted(days, d, side="left")
        hi = np.searchsorted(days, d + np.timedelta64(6, "D"),
                             side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(np.cumsum(cnt) - cnt, cnt))
        return pd.DataFrame({
            "day": days[np.repeat(lo, cnt) + idx],
            "user_id": np.repeat(b["user_id"].to_numpy(np.int64), cnt)})

    win = distinct_ds(du.map_batches(explode, batch_format="pandas"),
                      ["day", "user_id"])
    wau = grouped_agg(win, ["day"], {"wau": ("count", None)})
    out = dau.merge(wau, on="day", how="inner")
    out["dau"] = out["dau"].astype("int64")
    out["wau"] = out["wau"].astype("int64")
    return (out[["day", "dau", "wau"]]
            .sort_values("day").reset_index(drop=True))



def orders_customer_bucketed_join(sf_dir: str) -> pd.DataFrame:
    """STORAGE-PARTITIONED join (state.shards.write_bucketed_export /
    read_bucketed_join): both tables are exported hash-bucketed on the
    customer key ONCE, then joined bucket-by-bucket with ZERO shuffle
    at read time — the co-partitioning exchange `hash_join` pays per
    run was paid at write time and is reusable by every later join on
    the same key (the Iceberg/SPJ bucketing technique; at 100 TB the
    write is amortized across the many joins a warehouse key sees).
    Same aggregate surface and SQL oracle expression as
    orders_customer_join_stats, so the driver verifies the disk path
    end to end; a live assert pins that at least one bucket holds
    rows from BOTH sides (the co-location is real, not vacuous)."""
    import shutil
    import tempfile

    from .state.shards import read_bucketed_join, write_bucketed_export
    orders = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer",
                      ["c_custkey", "c_mktsegment"])
    da = tempfile.mkdtemp(prefix="bkt_orders_")
    db = tempfile.mkdtemp(prefix="bkt_customer_")
    try:
        ma = write_bucketed_export(orders, da, key="o_custkey",
                                   n_buckets=16,
                                   tiebreak_cols=["o_totalprice"])
        mb = write_bucketed_export(cust, db, key="c_custkey",
                                   n_buckets=16,
                                   tiebreak_cols=["c_mktsegment"])
        both = set(ma["bucket"]) & set(mb["bucket"])
        assert both, "no bucket holds rows from both sides"
        joined = read_bucketed_join(da, db, how="inner")

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "c_mktsegment": b["c_mktsegment"].values,
                "price_c": _cents(b["o_totalprice"])})

        g = grouped_agg(joined.map_batches(prep, batch_format="pandas"),
                        ["c_mktsegment"],
                        {"n_orders": ("count", None),
                         "s": ("sum", "price_c")})
        out = g[["c_mktsegment", "n_orders"]].copy()
        out["n_orders"] = out["n_orders"].astype("int64")
        out["total_price"] = _d(g["s"]) / 100.0
        return (out.sort_values("c_mktsegment")
                .reset_index(drop=True))
    finally:
        shutil.rmtree(da, ignore_errors=True)
        shutil.rmtree(db, ignore_errors=True)


def events_user_cms_topk(sf_dir: str) -> pd.DataFrame:
    """Count-Min sketch point estimates for the heavy users (Cormode
    & Muthukrishnan 2005) — the streaming frequency sketch the suite
    lacked (Bloom/HLL/bottom-k/Misra-Gries exist; CMS adds bounded
    OVERcount point queries a heavy-hitter pipeline reads directly).
    Shape: per-batch fixed-size (r, bucket, c) partials (<= depth x
    width rows regardless of batch size; the bucket hash runs once
    per DISTINCT key, stages/sketches.cms_partial_rows) -> the
    (<= 4096-row) sketch combine via grouped_agg_ds -> exact top-20
    by (count DESC, user_id) computed Dataset-side (sort + limit —
    the exact counts never land on the driver beyond the report
    rows). est >= exact is a CMS structural guarantee, ASSERTED
    in-query and emitted as overcount_ok; the oracle recomputes both
    sides from the same md5_number_upper bucket arithmetic
    (the DSIR/winnow mirroring contract) — all int64, no floats."""
    import functools

    from .stages.sketches import cms_bucket, cms_partial_rows
    depth, width, topk = 4, 1024, 20
    ds = read_table(sf_dir, "events", ["user_id"])
    top = (grouped_agg_ds(ds, ["user_id"], {"n": ("count", None)})
           .sort(["n", "user_id"], descending=[True, False])
           .limit(topk).to_pandas())
    if not len(top):
        # zero events: no sketch to build (an empty partials Dataset
        # has no columns to combine on)
        return pd.DataFrame({"user_id": pd.array([], dtype="int64"),
                             "exact_n": pd.array([], dtype="int64"),
                             "est_n": pd.array([], dtype="int64"),
                             "overcount_ok": pd.array([],
                                                      dtype="int64")})
    sk = grouped_agg_ds(
        ds.map_batches(
            functools.partial(cms_partial_rows, col="user_id",
                              depth=depth, width=width),
            batch_format="pandas"),
        ["r", "bucket"], {"c": ("sum", "c")}).to_pandas()
    cms = {(int(r), int(bkt)): int(c)
           for r, bkt, c in zip(sk["r"], sk["bucket"], sk["c"])}
    users = top["user_id"].to_numpy(dtype=np.int64)
    exact = top["n"].to_numpy(dtype=np.int64)
    est = np.fromiter(
        (min(cms[(r, cms_bucket(r, int(u), width))]
             for r in range(depth)) for u in users),
        np.int64, count=len(users))
    if (est < exact).any():
        raise AssertionError(
            "CMS undercount — min-over-rows of summed bucket counts "
            "can never be below a key's true count")
    return (pd.DataFrame({"user_id": users, "exact_n": exact,
                          "est_n": est,
                          "overcount_ok":
                              (est >= exact).astype(np.int64)})
            .sort_values("user_id").reset_index(drop=True))


def docs_line_dedup(sf_dir: str) -> pd.DataFrame:
    """Global exact LINE-level dedup with document rebuild — the
    line-granularity dedup step web-scale curation runs against
    repeated navigation/footer/boilerplate lines (the FineWeb /
    RefinedWeb recipe), complementing strip_duplicate_spans' token
    windows: every line occurring in more than one place survives
    only at its globally first (doc_id, line_idx); empty lines are
    formatting, always kept. Verified surface: per-doc original line
    count, kept line count, and the REBUILT TEXT itself (int64s +
    string, no floats). Shape (stages/spans.line_dedup_ds), skew-safe
    at web scale: Arrow split/explode -> per-batch winner COMBINER
    (one row per distinct line per batch — a billion-occurrence
    footer never ships its occurrences to the winner shuffle) ->
    line-keyed combine emitting only duplicated lines -> keep flags
    attached adaptively (broadcast dup-winner frame under the 64 MiB
    budget / salted co-partition past it, both paths pinned
    bit-equal) -> one doc-keyed rebuild pass. The sf docs
    are single-line near-unique word salad, so the deterministic
    fixture (line_dedup_inject_batch, mirrored in the SQL CASE tree)
    creates multi-line docs, cross-slice shared footers, and
    %19-slice docs that dedup away entirely."""
    from .stages.spans import line_dedup_ds
    from .stages.text_analysis import line_dedup_inject_batch
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    out = line_dedup_ds(
        ds.map_batches(line_dedup_inject_batch, batch_format="pandas"))
    pdf = out.to_pandas()
    if not len(pdf):
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "n_lines": pd.array([], dtype="int64"),
                             "n_kept": pd.array([], dtype="int64"),
                             "text": pd.array([], dtype=str)})
    return (pdf.astype({"doc_id": "int64", "n_lines": "int64",
                        "n_kept": "int64"})
            .sort_values("doc_id").reset_index(drop=True))



# ----------------------------------------------------------------- registry

# Registry order contract: the correctness driver samples the FIRST 50
# entries of this dict each round. Those 50 are therefore ALL oracled
# (pinned by tests/test_queries_oracle.py::test_driver_window_is_all_oracled):
# the 36 oracled queries rounds 1-4 never sampled lead, followed by 14
# previously-driver-verified entries; rows-only queries (no SQL oracle
# possible: iterative kmeans, measured ANN recall, extraction surfaces)
# sit past the window where the driver's weaker rows-only check applies.
QUERIES = {
    "tpch_fk_audit": tpch_fk_audit,
    "events_value_mad_by_type": events_value_mad_by_type,
    "docs_pack_sequences": docs_pack_sequences,
    "docs_length_buckets": docs_length_buckets,
    "docs_source_lang_rollup": docs_source_lang_rollup,
    "events_user_spend_cume": events_user_spend_cume,
    "docs_cap_per_source": docs_cap_per_source,
    "docs_temperature_mix": docs_temperature_mix,
    "docs_token_budget_mix": docs_token_budget_mix,
    "docs_decontaminate": docs_decontaminate,
    "docs_tfidf_topk": docs_tfidf_topk,
    "docs_bm25_topk": docs_bm25_topk,
    "docs_shuffle_order": docs_shuffle_order,
    "docs_gopher_rules": docs_gopher_rules,
    "docs_c4_filters": docs_c4_filters,
    "docs_quality_gate": docs_quality_gate,
    "docs_freq_spectrum": docs_freq_spectrum,
    "docs_heavy_tokens": docs_heavy_tokens,
    "docs_sliding_chunks": docs_sliding_chunks,
    "docs_bigram_lift": docs_bigram_lift,
    "docs_bigram_novelty": docs_bigram_novelty,
    "docs_pii_scrub": docs_pii_scrub,
    "docs_curation_funnel": docs_curation_funnel,
    "embeddings_semantic_pairs": embeddings_semantic_pairs,
    "embeddings_semantic_pairs_kmeans": embeddings_semantic_pairs_kmeans,
    "embeddings_semantic_dedup": embeddings_semantic_dedup,
    "docs_unigram_ce": docs_unigram_ce,
    "docs_jaccard_pairs": docs_jaccard_pairs,
    "docs_containment_pairs": docs_containment_pairs,
    "docs_train_val_test_split": docs_train_val_test_split,
    "events_value_hour_corr": events_value_hour_corr,
    "docs_source_entropy": docs_source_entropy,
    "docs_vocab_overlap": docs_vocab_overlap,
    "events_value_drift_psi": events_value_drift_psi,
    "events_rolling_wau": events_rolling_wau,
    "orders_customer_bucketed_join": orders_customer_bucketed_join,
    "q1_pricing_summary": q1_pricing_summary,
    "q6_forecast_revenue": q6_forecast_revenue,
    "lineitem_filter_project": lineitem_filter_project,
    "orders_customer_join_stats": orders_customer_join_stats,
    "events_type_stats": events_type_stats,
    "events_sessions": events_sessions,
    "events_sorted_export": events_sorted_export,
    "docs_exact_dedup": docs_exact_dedup,
    "docs_clean_text": docs_clean_text,
    "events_props_stats": events_props_stats,
    "docs_lang_id": docs_lang_id,
    "docs_training_mix": docs_training_mix,
    "docs_token_counts": docs_token_counts,
    "docs_fingerprint": docs_fingerprint,
    "orders_priority_count": orders_priority_count,
    "top_customers_by_spend": top_customers_by_spend,
    "q3_shipping_topk": q3_shipping_topk,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q18_large_orders": q18_large_orders,
    "customer_orders_full_outer": customer_orders_full_outer,
    "orders_version_diff": orders_version_diff,
    "customer_nation_stats": customer_nation_stats,
    "events_hourly_counts": events_hourly_counts,
    "events_user_topk": events_user_topk,
    "events_user_hourly": events_user_hourly,
    "events_running_sum": events_running_sum,
    "events_top_per_user": events_top_per_user,
    "events_value_delta": events_value_delta,
    "events_distinct_users_by_type": events_distinct_users_by_type,
    "events_profile": events_profile,
    "events_hourly_p95": events_hourly_p95,
    "events_hourly_anomaly": events_hourly_anomaly,
    "events_cohort_retention": events_cohort_retention,
    "events_transition_matrix": events_transition_matrix,
    "events_hourly_pivot": events_hourly_pivot,
    "events_hourly_gap_fill": events_hourly_gap_fill,
    "events_sliding_window": events_sliding_window,
    "events_rollup": events_rollup,
    "events_funnel": events_funnel,
    "events_zorder_pruned_read": events_zorder_pruned_read,
    "events_ntile": events_ntile,
    "events_hourly_moving_avg": events_hourly_moving_avg,
    "events_asof_join": events_asof_join,
    "events_asof_window": events_asof_window,
    "events_asof_left": events_asof_left,
    "events_session_attrib": events_session_attrib,
    "docs_stratified_sample": docs_stratified_sample,
    "embeddings_kmeans": embeddings_kmeans,
    "embeddings_label_outliers": embeddings_label_outliers,
    "embeddings_knn_confusion": embeddings_knn_confusion,
    "events_median_sketch": events_median_sketch,
    "docs_chunk_dedup": docs_chunk_dedup,
    "embeddings_ann_recall": embeddings_ann_recall,
    "events_weighted_sample": events_weighted_sample,
    "docs_commonness": docs_commonness,
    "lineitem_join_sample": lineitem_join_sample,
    "docs_exact_dedup_indexed": docs_exact_dedup_indexed,
    "transcript_train_shards": transcript_train_shards,
    "transcript_wave_extract": transcript_wave_extract,
    "parts_anti_join": parts_anti_join,
    "parts_semi_join": parts_semi_join,
    "events_median_by_type": events_median_by_type,
    "events_quantiles_by_type": events_quantiles_by_type,
    "events_approx_distinct_users": events_approx_distinct_users,
    "parts_bloom_prefilter": parts_bloom_prefilter,
    "events_distinct_types": events_distinct_types,
    "events_dedup_user_type": events_dedup_user_type,
    "docs_incremental_dedup": docs_incremental_dedup,
    "docs_strip_dup_spans": docs_strip_dup_spans,
    "docs_quality_scores": docs_quality_scores,
    "docs_top_tokens": docs_top_tokens,
    "docs_lang_counts": docs_lang_counts,
    "docs_repetition_ratio": docs_repetition_ratio,
    "embeddings_knn_bruteforce": embeddings_knn_bruteforce,
    "embeddings_knn_lsh": embeddings_knn_lsh,
    "embeddings_knn_ivf": embeddings_knn_ivf,
    "embeddings_near_dup": embeddings_near_dup,
    "dedup_minhash_word": dedup_minhash_word,
    "dedup_cluster_stats": dedup_cluster_stats,
    "dedup_minhash_eval": dedup_minhash_eval,
    "dedup_minhash_keep": dedup_minhash_keep,
    "dedup_ngram_char": dedup_ngram_char,
    "dedup_simhash": dedup_simhash,
    "docs_winnow_fingerprints": docs_winnow_fingerprints,
    "flagship_extract": flagship_extract,
    "transcript_strip_boilerplate": transcript_strip_boilerplate,
    "transcript_sft_pairs": transcript_sft_pairs,
    "transcript_tool_error_rates": transcript_tool_error_rates,
    "transcript_questions": transcript_questions,
    "conversation_markdown": conversation_markdown,
    "transcript_exact_dedup": transcript_exact_dedup,
    "conversation_json_envelopes": conversation_json_envelopes,
    "conversation_markdown_c001": conversation_markdown_c001,
    "questions_reports": questions_reports,
    "extract_compare_strategies": extract_compare_strategies,
    "transcript_turnspec_filter": transcript_turnspec_filter,
    "multimodal_decode": multimodal_decode,
    "multimodal_frames": multimodal_frames,
    "multimodal_resize_raw": multimodal_resize_raw,
    "transcript_conv_near_dup": transcript_conv_near_dup,
    "multimodal_audio_chunks": multimodal_audio_chunks,
    "docs_gopher_repetition": docs_gopher_repetition,
    "docs_dsir_weights": docs_dsir_weights,
    "docs_bpe_pair_counts": docs_bpe_pair_counts,
    "docs_bigram_lm_ppl": docs_bigram_lm_ppl,
    "docs_line_dedup": docs_line_dedup,
    "events_user_cms_topk": events_user_cms_topk,
    "docs_ccnet_buckets": docs_ccnet_buckets,
    "docs_quality_percentile": docs_quality_percentile,
    "docs_quality_classifier": docs_quality_classifier,
    "docs_inverted_index": docs_inverted_index,
    "docs_blocklist_filter": docs_blocklist_filter,
    "embeddings_pq_codes": embeddings_pq_codes,
    "q4_priority_semi_join": q4_priority_semi_join,
    "q12_status_line_priority": q12_status_line_priority,
    "q14_promo_share": q14_promo_share,
    "docs_bpe_train": docs_bpe_train,
    "docs_bpe_encode": docs_bpe_encode,
    "events_type_pagerank": events_type_pagerank,
    "events_type_cooccurrence": events_type_cooccurrence,
    "q10_returned_items": q10_returned_items,
    "events_user_rfm": events_user_rfm,
    "docs_readability": docs_readability,
    "docs_distinct_ngram_ratio": docs_distinct_ngram_ratio,
    "events_winsorized_stats": events_winsorized_stats,
    "orders_interorder_gap": orders_interorder_gap,
    "docs_charclass_profile": docs_charclass_profile,
    "docs_hapax_ratio": docs_hapax_ratio,
}

_BPE_SQL = r"[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r\f\v]"

ORACLES = {
    # money aggregates use exact int64-cents arithmetic mirroring the
    # Ray side (see _cents): identical doubles, no rounding ambiguity.
    #
    # bounds-oracles: the sketch queries emit (exact value computed by
    # the engine, invariant bool); the SQL emits (exact value computed
    # by DuckDB, TRUE) — the hash compare then validates the exact path
    # bit-exact AND fails if the sketch ever leaves its error bound.
    "events_approx_distinct_users": """
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
                 AS exact_distinct_users,
               TRUE AS within_5pct
        FROM events
    """,
    "tpch_fk_audit": """
        SELECT * FROM (
        SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS fk_edge,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_child_keys,
               CAST(COUNT(DISTINCT CASE WHEN l_orderkey NOT IN
                    (SELECT o_orderkey FROM orders) THEN l_orderkey END) AS BIGINT)
                 AS n_orphan_keys
        FROM lineitem
        UNION ALL
        SELECT 'orders.o_custkey->customer.c_custkey' AS fk_edge,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_child_keys,
               CAST(COUNT(DISTINCT CASE WHEN o_custkey NOT IN
                    (SELECT c_custkey FROM customer) THEN o_custkey END) AS BIGINT)
                 AS n_orphan_keys
        FROM orders
        UNION ALL
        SELECT 'customer.c_nationkey->nation.n_nationkey' AS fk_edge,
               CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_child_keys,
               CAST(COUNT(DISTINCT CASE WHEN c_nationkey NOT IN
                    (SELECT n_nationkey FROM nation) THEN c_nationkey END) AS BIGINT)
                 AS n_orphan_keys
        FROM customer
        UNION ALL
        SELECT 'supplier.s_nationkey->nation.n_nationkey' AS fk_edge,
               CAST(COUNT(DISTINCT s_nationkey) AS BIGINT) AS n_child_keys,
               CAST(COUNT(DISTINCT CASE WHEN s_nationkey NOT IN
                    (SELECT n_nationkey FROM nation) THEN s_nationkey END) AS BIGINT)
                 AS n_orphan_keys
        FROM supplier
        UNION ALL
        SELECT 'nation.n_regionkey->region.r_regionkey' AS fk_edge,
               CAST(COUNT(DISTINCT n_regionkey) AS BIGINT) AS n_child_keys,
               CAST(COUNT(DISTINCT CASE WHEN n_regionkey NOT IN
                    (SELECT r_regionkey FROM region) THEN n_regionkey END) AS BIGINT)
                 AS n_orphan_keys
        FROM nation
        ) ORDER BY fk_edge
    """,
    "parts_bloom_prefilter": """
        SELECT CAST(COUNT(*) AS BIGINT) AS exact_rows,
               TRUE AS bloom_contains_all
        FROM lineitem
        WHERE l_partkey IN (SELECT DISTINCT l_partkey FROM lineitem
                            WHERE l_quantity > 49)
    """,
    "q18_large_orders": """
        WITH s AS (
          SELECT l_orderkey,
                 SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_c
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 15000)
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               o_totalprice, qty_c / 100.0 AS total_qty
        FROM s JOIN orders ON o_orderkey = l_orderkey
               JOIN customer ON c_custkey = o_custkey
        ORDER BY total_qty DESC, o_orderkey LIMIT 20
    """,
    "q6_forecast_revenue": """
        SELECT COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                            * CAST(ROUND(l_discount * 100) AS BIGINT)),
                        0) / 10000.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-06-01'
          AND l_shipdate <  DATE '1996-06-01'
          AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
          AND l_quantity < 24
    """,
    "q5_local_supplier_volume": """
        SELECT n_name,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                 / 10000.0 AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= DATE '1995-01-01'
          AND o_orderdate <  DATE '1996-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    "q1_pricing_summary": """
        WITH c AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(ROUND(l_quantity * 100) AS BIGINT)      AS qty_c,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
                 CAST(ROUND(l_discount * 100) AS BIGINT)      AS disc_c,
                 CAST(ROUND(l_tax * 100) AS BIGINT)           AS tax_c
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(qty_c) AS DOUBLE) / 100.0   AS sum_qty,
               CAST(SUM(price_c) AS DOUBLE) / 100.0 AS sum_base_price,
               CAST(SUM(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0
                 AS sum_disc_price,
               CAST(SUM(price_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE)
                 / 1000000.0 AS sum_charge,
               CAST(SUM(qty_c) AS DOUBLE) / 100.0 / COUNT(*)   AS avg_qty,
               CAST(SUM(price_c) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
               CAST(SUM(disc_c) AS DOUBLE) / 100.0 / COUNT(*)  AS avg_disc,
               COUNT(*) AS count_order
        FROM c GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "lineitem_filter_project": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_quantity > 45
    """,
    "orders_priority_count": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "top_customers_by_spend": """
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS total_spend
        FROM orders GROUP BY o_custkey
        ORDER BY total_spend DESC, o_custkey LIMIT 10
    """,
    "q3_shipping_topk": """
        SELECT l_orderkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS DOUBLE) / 10000.0 AS revenue,
               o_orderdate
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "customer_orders_full_outer": """
        SELECT COALESCE(c.c_custkey, o.c_custkey) AS custkey,
               COALESCE(c.c_acctbal, 0.0) AS acctbal,
               COALESCE(o.n_orders, 0) AS n_orders,
               COALESCE(o.total_spend, 0.0) AS total_spend
        FROM (SELECT c_custkey, c_acctbal FROM customer
              WHERE c_mktsegment = 'BUILDING') c
        FULL OUTER JOIN
             (SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                          AS DOUBLE) / 100.0 AS total_spend
              FROM orders WHERE o_totalprice > 200000.0
              GROUP BY o_custkey) o
        ON c.c_custkey = o.c_custkey
        ORDER BY custkey
    """,
    "customer_nation_stats": """
        SELECT n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 / COUNT(*) AS avg_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "orders_customer_join_stats": """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "events_type_stats": """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS sum_value,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 / COUNT(*) AS avg_value,
               MAX(value) AS max_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "events_hourly_counts": """
        SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_events
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "events_user_topk": """
        SELECT user_id,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS total_value
        FROM events GROUP BY user_id
        ORDER BY total_value DESC, user_id LIMIT 10
    """,
    "events_user_hourly": """
        SELECT user_id, date_trunc('hour', ts) AS hour,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS sum_value
        FROM events GROUP BY user_id, hour ORDER BY user_id, hour
    """,
    "events_sessions": """
        WITH d AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (
          SELECT user_id, ts,
                 CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS session_id
          FROM d)
        SELECT user_id, session_id, COUNT(*) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM s GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "events_value_delta": """
        SELECT event_id, user_id, ts, value,
               COALESCE(value - LAG(value) OVER w, 0.0) AS value_delta,
               COALESCE(date_diff('microsecond', ts, LEAD(ts) OVER w),
                        -1) AS next_gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, ts, event_id
    """,
    "orders_version_diff": """
        WITH old AS (SELECT o_orderkey AS k,
                            CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS old_c
                     FROM orders),
        new AS (
          SELECT o_orderkey AS k,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT)
                   + CASE WHEN o_orderkey % 13 = 0 THEN 100 ELSE 0 END
                   AS new_c
          FROM orders WHERE o_orderkey % 97 <> 0
          UNION ALL
          SELECT o_orderkey + 10000000 AS k,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS new_c
          FROM orders WHERE o_orderkey % 101 = 0),
        d AS (SELECT COALESCE(old.k, new.k) AS k,
                     CASE WHEN old.k IS NULL THEN 'added'
                          WHEN new.k IS NULL THEN 'removed'
                          WHEN old_c <> new_c THEN 'changed'
                          ELSE 'same' END AS status
              FROM old FULL OUTER JOIN new ON old.k = new.k)
        SELECT status, COUNT(*) AS n, MIN(k) AS min_key,
               MAX(k) AS max_key
        FROM d GROUP BY status ORDER BY status
    """,
    "events_hourly_pivot": """
        SELECT date_trunc('hour', ts) AS hour,
               COUNT(*) FILTER (WHERE event_type = 'click') AS click,
               COUNT(*) FILTER (WHERE event_type = 'error') AS error,
               COUNT(*) FILTER (WHERE event_type = 'purchase')
                 AS purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
               COUNT(*) FILTER (WHERE event_type = 'view') AS view
        FROM events GROUP BY hour ORDER BY hour
    """,
    "events_hourly_gap_fill": """
        WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
                          date_trunc('hour', max(ts)) AS hi
                   FROM events),
        spine AS (SELECT unnest(generate_series(lo, hi,
                                                INTERVAL 1 HOUR))
                    AS hour FROM b),
        e AS (SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
              FROM events WHERE event_type = 'error' GROUP BY 1)
        SELECT s.hour,
               CAST(COALESCE(last_value(e.n IGNORE NULLS)
                             OVER (ORDER BY s.hour
                                   ROWS UNBOUNDED PRECEDING), 0)
                    AS BIGINT) AS n_events,
               e.n IS NOT NULL AS observed
        FROM spine s LEFT JOIN e ON s.hour = e.hour
        ORDER BY s.hour
    """,
    "events_distinct_users_by_type": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
               TRUE AS hll_within_5pct
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "events_ntile": """
        SELECT event_id, value,
               NTILE(4) OVER (ORDER BY value, event_id) AS quartile
        FROM events ORDER BY event_id
    """,
    "events_zorder_pruned_read": """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                 AS sum_value_c,
               TRUE AS pruned
        FROM events
        WHERE user_id <= (SELECT CAST(MAX(user_id) AS BIGINT) // 5
                          FROM events)
          AND value <= 60.0
        GROUP BY event_type ORDER BY event_type
    """,
    "events_sorted_export": """
        SELECT event_id, user_id, ts, value FROM events
        WHERE ts BETWEEN TIMESTAMP '2024-01-10'
                     AND TIMESTAMP '2024-01-15'
        ORDER BY ts, event_id
    """,
    "events_sliding_window": """
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w AS w_count,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
                    AS DOUBLE) / 100.0 AS w_sum
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW)
        ORDER BY user_id, ts, event_id
    """,
    "events_running_sum": """
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0
                 AS running_value
        FROM events ORDER BY user_id, ts
    """,
    "events_top_per_user": """
        SELECT user_id, event_id, value
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, event_id) <= 3
        ORDER BY user_id, event_id
    """,
    "events_asof_join": """
        SELECT a.event_id, a.user_id, a.ts, b.view_ts,
               date_diff('microsecond', b.view_ts, a.ts) AS lag_us
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') a
        ASOF JOIN (SELECT user_id, ts AS view_ts FROM events
                   WHERE event_type = 'view') b
          ON a.user_id = b.user_id AND a.ts >= b.view_ts
        ORDER BY a.event_id
    """,
    "events_asof_window": """
        SELECT * FROM (
          SELECT a.event_id, a.user_id, a.ts, b.view_ts,
                 date_diff('microsecond', b.view_ts, a.ts) AS lag_us
          FROM (SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'purchase') a
          ASOF JOIN (SELECT user_id, ts AS view_ts FROM events
                     WHERE event_type = 'view') b
            ON a.user_id = b.user_id AND a.ts >= b.view_ts)
        WHERE lag_us <= 3600000000
        ORDER BY event_id
    """,
    "events_asof_left": """
        SELECT a.event_id, a.user_id, a.ts, b.view_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') a
        ASOF LEFT JOIN (SELECT user_id, ts AS view_ts FROM events
                        WHERE event_type = 'view') b
          ON a.user_id = b.user_id AND a.ts >= b.view_ts
        ORDER BY a.event_id
    """,
    "events_session_attrib": """
        WITH d AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (
          SELECT user_id, ts,
                 CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS session_id
          FROM d),
        sess AS (
          SELECT user_id, session_id,
                 MIN(ts) AS session_start, MAX(ts) AS session_end
          FROM s GROUP BY user_id, session_id),
        p AS (
          SELECT user_id, ts,
                 CAST(ROUND(value * 100) AS BIGINT) AS v_c
          FROM events WHERE event_type = 'purchase')
        SELECT sess.user_id, sess.session_id,
               COUNT(*) AS n_purchases,
               CAST(SUM(p.v_c) AS DOUBLE) / 100.0 AS purchase_value
        FROM sess JOIN p
          ON p.user_id = sess.user_id
         AND p.ts BETWEEN sess.session_start AND sess.session_end
        GROUP BY sess.user_id, sess.session_id
        ORDER BY sess.user_id, sess.session_id
    """,
    "lineitem_join_sample": """
        WITH j AS (SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
                          o.o_orderdate, o.o_totalprice,
                          l.l_orderkey * 10 + l.l_linenumber AS li_id
                   FROM lineitem l JOIN orders o
                     ON l.l_orderkey = o.o_orderkey),
        h AS (SELECT *, ((CAST(li_id AS HUGEINT) * 2654435761)
                         % 4294967296 + 0.5)
                        / 4294967296.0 AS u
              FROM j WHERE l_extendedprice > 0),
        s AS (SELECT l_orderkey, l_linenumber, l_extendedprice,
                     o_orderdate, o_totalprice
              FROM h ORDER BY -ln(u) / l_extendedprice, li_id LIMIT 50)
        SELECT * FROM s ORDER BY l_orderkey, l_linenumber
    """,
    "events_rollup": """
        WITH c AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                          CAST(ROUND(value * 100) AS BIGINT) AS v_c
                   FROM events)
        SELECT event_type, hour, COUNT(*) AS n_events,
               CAST(SUM(v_c) AS DOUBLE) / 100.0 AS sum_value,
               CAST(GROUPING(event_type) AS BIGINT) AS g_type,
               CAST(GROUPING(hour) AS BIGINT) AS g_hour
        FROM c GROUP BY ROLLUP (event_type, hour)
        ORDER BY g_type, g_hour, event_type, hour
    """,
    "events_funnel": """
        WITH t1 AS (SELECT user_id, MIN(ts) AS first_view
                    FROM events WHERE event_type = 'view' GROUP BY 1),
        t2 AS (SELECT e.user_id, MIN(e.ts) AS first_click_after
               FROM events e JOIN t1 USING (user_id)
               WHERE e.event_type = 'click' AND e.ts > t1.first_view
               GROUP BY 1),
        t3 AS (SELECT e.user_id, MIN(e.ts) AS first_purchase_after
               FROM events e JOIN t2 USING (user_id)
               WHERE e.event_type = 'purchase'
                 AND e.ts > t2.first_click_after
               GROUP BY 1),
        u AS (SELECT DISTINCT user_id FROM events)
        SELECT u.user_id, t1.first_view, t2.first_click_after,
               t3.first_purchase_after,
               CAST(CASE WHEN t3.user_id IS NOT NULL THEN 3
                         WHEN t2.user_id IS NOT NULL THEN 2
                         WHEN t1.user_id IS NOT NULL THEN 1
                         ELSE 0 END AS BIGINT) AS funnel_stage
        FROM u LEFT JOIN t1 USING (user_id)
               LEFT JOIN t2 USING (user_id)
               LEFT JOIN t3 USING (user_id)
        ORDER BY u.user_id
    """,
    "docs_containment_pairs": """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
                   FROM documents),
        g AS (SELECT doc_id, array_to_string(words[i:i+2], ' ') AS sh
              FROM w, UNNEST(range(1, len(words) - 1)) AS r(i)
              WHERE len(words) >= 3),
        s AS (SELECT DISTINCT doc_id, sh FROM g),
        df AS (SELECT sh, COUNT(*) AS df FROM s GROUP BY sh),
        f AS (SELECT s.doc_id, s.sh FROM s JOIN df USING (sh)
              WHERE df.df <= 256),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM f GROUP BY doc_id),
        co AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      COUNT(*) AS n_shared
               FROM f a JOIN f b USING (sh)
               WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT co.id_a, co.id_b, co.n_shared,
               CAST(co.n_shared AS DOUBLE)
                 / LEAST(sa.n, sb.n) AS containment
        FROM co JOIN sz sa ON sa.doc_id = co.id_a
                JOIN sz sb ON sb.doc_id = co.id_b
        WHERE CAST(co.n_shared AS DOUBLE)
                / LEAST(sa.n, sb.n) >= 0.8
        ORDER BY co.id_a, co.id_b
    """,
    "docs_jaccard_pairs": """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
                   FROM documents),
        g AS (SELECT doc_id, array_to_string(words[i:i+2], ' ') AS sh
              FROM w, UNNEST(range(1, len(words) - 1)) AS r(i)
              WHERE len(words) >= 3),
        s AS (SELECT DISTINCT doc_id, sh FROM g),
        df AS (SELECT sh, COUNT(*) AS df FROM s GROUP BY sh),
        f AS (SELECT s.doc_id, s.sh FROM s JOIN df USING (sh)
              WHERE df.df <= 256),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM f GROUP BY doc_id),
        co AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      COUNT(*) AS n_shared
               FROM f a JOIN f b USING (sh)
               WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT co.id_a, co.id_b, co.n_shared,
               CAST(co.n_shared AS DOUBLE)
                 / (sa.n + sb.n - co.n_shared) AS jaccard
        FROM co JOIN sz sa ON sa.doc_id = co.id_a
                JOIN sz sb ON sb.doc_id = co.id_b
        WHERE CAST(co.n_shared AS DOUBLE)
                / (sa.n + sb.n - co.n_shared) >= 0.5
        ORDER BY co.id_a, co.id_b
    """,
    "docs_freq_spectrum": r"""
        WITH toks AS (SELECT unnest(regexp_extract_all(text, '\S+'))
                        AS token
                      FROM documents),
        v AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n
              FROM toks GROUP BY token)
        SELECT n, CAST(COUNT(*) AS BIGINT) AS n_tokens
        FROM v GROUP BY n ORDER BY n
    """,
    "docs_repetition_ratio": """
        WITH toks AS (SELECT doc_id,
                             unnest(string_split(text, ' ')) AS tok
                      FROM documents),
        t AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        cnt AS (SELECT doc_id, tok, COUNT(*) AS c
                FROM t GROUP BY doc_id, tok),
        agg AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE)
                               / CAST(SUM(c) AS DOUBLE) AS top_token_ratio
                FROM cnt GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(a.top_token_ratio, 0.0)
                 AS top_token_ratio
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id
    """,
    "docs_commonness": """
        WITH toks AS (SELECT doc_id,
                             unnest(string_split(text, ' ')) AS token
                      FROM documents),
        cnt AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
        s AS (SELECT t.doc_id, CAST(SUM(c.c) AS BIGINT) AS sum_freq,
                     COUNT(*) AS n_tokens
              FROM toks t JOIN cnt c USING (token) GROUP BY t.doc_id)
        SELECT doc_id, n_tokens, sum_freq,
               CAST(sum_freq AS DOUBLE) / n_tokens AS avg_token_freq
        FROM s ORDER BY doc_id
    """,
    "docs_chunk_dedup": """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
                   FROM documents),
        i AS (SELECT doc_id, words,
                     unnest(range(0, CAST(CEIL(len(words) / 25.0)
                                          AS BIGINT))) AS chunk_idx
              FROM w),
        c AS (SELECT doc_id, chunk_idx,
                     array_to_string(list_slice(words, chunk_idx * 25 + 1,
                                                chunk_idx * 25 + 25),
                                     ' ') AS chunk
              FROM i),
        k AS (SELECT chunk, MIN(ROW(doc_id, chunk_idx)) AS fk
              FROM c GROUP BY chunk),
        kept AS (SELECT c.* FROM c JOIN k ON c.chunk = k.chunk
                 AND ROW(c.doc_id, c.chunk_idx) = k.fk)
        SELECT doc_id,
               string_agg(chunk, ' ' ORDER BY chunk_idx) AS dedup_text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id ORDER BY doc_id
    """,
    "docs_training_mix": """
        WITH q AS (
          SELECT doc_id, text,
                 len(regexp_extract_all(text, '\\S+')) AS n_tokens,
                 CASE WHEN length(text) > 0
                      THEN len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                           / length(text) ELSE 0 END AS alpha_ratio
          FROM documents WHERE lang = 'en'),
        f AS (SELECT * FROM q
              WHERE n_tokens >= 50 AND alpha_ratio >= 0.8),
        k AS (SELECT MIN(doc_id) AS doc_id FROM f GROUP BY text)
        SELECT f.doc_id, f.n_tokens, f.alpha_ratio
        FROM f JOIN k USING (doc_id) ORDER BY f.doc_id
    """,
    "docs_stratified_sample": """
        WITH d AS (SELECT doc_id, lang,
                          (CAST(doc_id AS HUGEINT) * 2654435761)
                          % 4294967296 AS h
                   FROM documents),
             c AS (SELECT lang, CAST(CEIL(0.1 * COUNT(*)) AS BIGINT) AS k
                   FROM documents GROUP BY lang),
             r AS (SELECT d.doc_id, d.lang, c.k,
                          row_number() OVER (PARTITION BY d.lang
                                             ORDER BY d.h, d.doc_id) AS rn
                   FROM d JOIN c USING (lang))
        SELECT doc_id, lang FROM r WHERE rn <= k ORDER BY doc_id
    """,
    "events_hourly_moving_avg": """
        WITH h AS (SELECT date_trunc('hour', ts) AS hour,
                          COUNT(*) AS n_events
                   FROM events GROUP BY 1)
        SELECT hour, n_events,
               AVG(n_events) OVER (ORDER BY hour
                                   ROWS BETWEEN 2 PRECEDING
                                   AND CURRENT ROW) AS moving_avg
        FROM h ORDER BY hour
    """,
    "parts_anti_join": """
        SELECT p_partkey, p_name FROM part p
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_partkey = p.p_partkey
                            AND l.l_quantity > 49)
        ORDER BY p_partkey
    """,
    "parts_semi_join": """
        SELECT p_partkey, p_name FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey
                        AND l.l_quantity > 49)
        ORDER BY p_partkey
    """,
    "events_props_stats": """
        WITH k AS (SELECT event_type,
                          CAST(props->>'k' AS BIGINT) AS k
                   FROM events)
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k,
               CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k
        FROM k GROUP BY event_type ORDER BY event_type
    """,
    "events_profile": """
        SELECT * FROM (
        SELECT 'event_id' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
               TRUE AS hll_within_5pct
        FROM events
        UNION ALL
        SELECT 'ts' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT ts) AS BIGINT) AS n_distinct,
               TRUE AS hll_within_5pct
        FROM events
        UNION ALL
        SELECT 'user_id' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct,
               TRUE AS hll_within_5pct
        FROM events
        UNION ALL
        SELECT 'event_type' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct,
               TRUE AS hll_within_5pct
        FROM events
        UNION ALL
        SELECT 'value' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT value) AS BIGINT) AS n_distinct,
               TRUE AS hll_within_5pct
        FROM events
        UNION ALL
        SELECT 'props' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT props) AS BIGINT) AS n_distinct,
               TRUE AS hll_within_5pct
        FROM events
        ) ORDER BY col
    """,
    "events_hourly_p95": """
        WITH c AS (SELECT date_trunc('hour', ts) AS hour,
                          CAST(ROUND(value * 100) AS BIGINT) AS v_c
                   FROM events)
        SELECT hour, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(quantile_cont(v_c, 0.95) * 100 AS BIGINT)
                 / 100.0 / 100.0 AS p95
        FROM c GROUP BY hour ORDER BY hour
    """,
    "events_hourly_anomaly": """
        WITH h AS (SELECT date_trunc('hour', ts) AS hour,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM events GROUP BY hour),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(n) AS BIGINT) AS s1,
                     CAST(SUM(n * n) AS BIGINT) AS s2 FROM h)
        SELECT hour, n AS n_events,
               CASE WHEN (CAST(s2 AS DOUBLE) / k
                          - (CAST(s1 AS DOUBLE) / k)
                            * (CAST(s1 AS DOUBLE) / k)) > 0
                    THEN ROUND((n - (CAST(s1 AS DOUBLE) / k))
                               / sqrt(CAST(s2 AS DOUBLE) / k
                                      - (CAST(s1 AS DOUBLE) / k)
                                        * (CAST(s1 AS DOUBLE) / k)), 6)
                    ELSE 0.0 END AS z,
               CASE WHEN (CAST(s2 AS DOUBLE) / k
                          - (CAST(s1 AS DOUBLE) / k)
                            * (CAST(s1 AS DOUBLE) / k)) > 0
                    THEN ABS((n - (CAST(s1 AS DOUBLE) / k))
                             / sqrt(CAST(s2 AS DOUBLE) / k
                                    - (CAST(s1 AS DOUBLE) / k)
                                      * (CAST(s1 AS DOUBLE) / k))) > 2.0
                    ELSE FALSE END AS is_anomaly
        FROM h CROSS JOIN m ORDER BY hour
    """,
    "events_cohort_retention": """
        WITH f AS (SELECT user_id,
                          date_trunc('week', MIN(ts)) AS cohort_week
                   FROM events GROUP BY user_id),
        act AS (SELECT DISTINCT e.user_id, f.cohort_week,
                       CAST(date_diff('day',
                            CAST(f.cohort_week AS DATE),
                            CAST(date_trunc('week', e.ts) AS DATE)) // 7
                            AS BIGINT) AS week_offset
                FROM events e JOIN f USING (user_id))
        SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
               week_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM act GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """,
    "events_transition_matrix": """
        WITH w AS (
          SELECT COALESCE(LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id),
                 '(start)') AS prev_type,
                 event_type
          FROM events)
        SELECT prev_type, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM w GROUP BY prev_type, event_type
        ORDER BY prev_type, event_type
    """,
    "docs_source_lang_rollup": """
        SELECT source, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(GROUPING(lang) AS BIGINT) AS g_lang,
               CAST(GROUPING(source) AS BIGINT) AS g_source
        FROM documents GROUP BY ROLLUP (source, lang)
        ORDER BY g_source, g_lang, source NULLS FIRST, lang NULLS FIRST
    """,
    "events_user_spend_cume": """
        WITH g AS (
          SELECT user_id,
                 SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s_c
          FROM events GROUP BY user_id)
        SELECT user_id, s_c / 100.0 AS total_spend,
               CUME_DIST() OVER (ORDER BY s_c) AS cume_dist
        FROM g ORDER BY user_id
    """,
    "events_value_mad_by_type": """
        WITH c AS (SELECT event_type,
                          CAST(ROUND(value * 100) AS BIGINT) AS v_c
                   FROM events),
        m AS (SELECT event_type,
                     CAST(quantile_cont(v_c, 0.5) * 2 AS BIGINT) AS med_hc
              FROM c GROUP BY event_type),
        d AS (SELECT c.event_type, ABS(2 * c.v_c - m.med_hc) AS dev_hc
              FROM c JOIN m USING (event_type))
        SELECT event_type, quantile_cont(dev_hc, 0.5) / 200.0 AS mad_value
        FROM d GROUP BY event_type ORDER BY event_type
    """,
    "events_quantiles_by_type": """
        WITH v AS (SELECT event_type,
                          CAST(ROUND(value * 100) AS BIGINT) AS vc
                   FROM events),
        r AS (SELECT event_type, vc,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY vc) - 1 AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM v)
        SELECT event_type,
               CAST(SUM(CASE WHEN rn = ((n - 1) * 25) // 100 THEN vc * (100 - (((n - 1) * 25) % 100)) ELSE 0 END)
                    + SUM(CASE WHEN rn = CASE WHEN ((n - 1) * 25) % 100 = 0 THEN ((n - 1) * 25) // 100 ELSE ((n - 1) * 25) // 100 + 1 END THEN vc * (((n - 1) * 25) % 100) ELSE 0 END)
                    AS DOUBLE) / 100.0 / 100.0 AS p25,
               CAST(SUM(CASE WHEN rn = ((n - 1) * 50) // 100 THEN vc * (100 - (((n - 1) * 50) % 100)) ELSE 0 END)
                    + SUM(CASE WHEN rn = CASE WHEN ((n - 1) * 50) % 100 = 0 THEN ((n - 1) * 50) // 100 ELSE ((n - 1) * 50) // 100 + 1 END THEN vc * (((n - 1) * 50) % 100) ELSE 0 END)
                    AS DOUBLE) / 100.0 / 100.0 AS p50,
               CAST(SUM(CASE WHEN rn = ((n - 1) * 75) // 100 THEN vc * (100 - (((n - 1) * 75) % 100)) ELSE 0 END)
                    + SUM(CASE WHEN rn = CASE WHEN ((n - 1) * 75) % 100 = 0 THEN ((n - 1) * 75) // 100 ELSE ((n - 1) * 75) // 100 + 1 END THEN vc * (((n - 1) * 75) % 100) ELSE 0 END)
                    AS DOUBLE) / 100.0 / 100.0 AS p75,
               CAST(SUM(CASE WHEN rn = ((n - 1) * 95) // 100 THEN vc * (100 - (((n - 1) * 95) % 100)) ELSE 0 END)
                    + SUM(CASE WHEN rn = CASE WHEN ((n - 1) * 95) % 100 = 0 THEN ((n - 1) * 95) // 100 ELSE ((n - 1) * 95) // 100 + 1 END THEN vc * (((n - 1) * 95) % 100) ELSE 0 END)
                    AS DOUBLE) / 100.0 / 100.0 AS p95
        FROM r GROUP BY event_type ORDER BY event_type
    """,
    "events_median_by_type": """
        WITH v AS (SELECT event_type,
                          CAST(ROUND(value * 100) AS BIGINT) AS vc
                   FROM events),
        r AS (SELECT event_type, vc,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY vc) - 1 AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM v)
        SELECT event_type,
               CAST(SUM(CASE WHEN rn = (n - 1) // 2 THEN vc ELSE 0 END)
                    + SUM(CASE WHEN rn = n // 2 THEN vc ELSE 0 END)
                    AS DOUBLE) / 2.0 / 100.0 AS median_value
        FROM r GROUP BY event_type ORDER BY event_type
    """,
    "events_weighted_sample": """
        WITH h AS (SELECT event_id, user_id, value,
                          ((CAST(event_id AS HUGEINT) * 2654435761)
                           % 4294967296 + 0.5)
                            / 4294967296.0 AS u
                   FROM events WHERE value > 0),
        s AS (SELECT event_id, user_id, value
              FROM h ORDER BY -ln(u) / value, event_id LIMIT 100)
        SELECT event_id, user_id, value FROM s ORDER BY event_id
    """,
    "events_median_sketch": """
        WITH v AS (SELECT event_type,
                          CAST(ROUND(value * 100) AS BIGINT) AS vc
                   FROM events),
        r AS (SELECT event_type, vc,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY vc) - 1 AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM v)
        SELECT event_type,
               CAST(SUM(CASE WHEN rn = (n - 1) // 2 THEN vc ELSE 0 END)
                    + SUM(CASE WHEN rn = n // 2 THEN vc ELSE 0 END)
                    AS DOUBLE) / 2.0 / 100.0 AS median_value,
               TRUE AS sketch_within_10pct
        FROM r GROUP BY event_type ORDER BY event_type
    """,
    "events_distinct_types": """
        SELECT DISTINCT event_type FROM events ORDER BY event_type
    """,
    "events_dedup_user_type": """
        SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type
    """,
    "docs_token_counts": f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '\\S+')) AS n_tokens,
               len(regexp_extract_all(text, '{_BPE_SQL}')) AS n_tokens_bpe
        FROM documents ORDER BY doc_id
    """,
    "docs_pack_sequences": """
        WITH t AS (SELECT doc_id,
                          len(regexp_extract_all(text, '\\S+')) AS n_tokens
                   FROM documents),
        c AS (SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS cum
              FROM t)
        SELECT doc_id, n_tokens,
               CAST(cum // 512 AS BIGINT) AS seq_id,
               CAST(cum % 512 AS BIGINT) AS seq_offset
        FROM c ORDER BY doc_id
    """,
    "docs_temperature_mix": """
        WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                   FROM documents GROUP BY source),
        q AS (SELECT source, n,
                     CAST(FLOOR(200 * (pow(CAST(n AS DOUBLE), 0.7)
                          / (SELECT SUM(pow(CAST(n AS DOUBLE), 0.7))
                             FROM c))) AS BIGINT) AS k
              FROM c),
        r AS (SELECT d.doc_id, d.source,
                     ROW_NUMBER() OVER (
                       PARTITION BY d.source
                       ORDER BY (CAST(d.doc_id AS HUGEINT) * 2654435761)
                                  % 4294967296,
                                d.doc_id) AS rn
              FROM documents d)
        SELECT r.doc_id, r.source
        FROM r JOIN q USING (source)
        WHERE rn <= LEAST(q.k, q.n) ORDER BY doc_id
    """,
    "docs_token_budget_mix": r"""
        WITH t AS (
          SELECT doc_id, source,
                 CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                   AS n_tok,
                 (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296
                   AS h
          FROM documents),
        tot AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS toks
                FROM t GROUP BY source),
        b AS (SELECT source,
                     CAST(FLOOR(20000 * (pow(CAST(toks AS DOUBLE), 0.7)
                          / (SELECT SUM(pow(CAST(toks AS DOUBLE), 0.7))
                             FROM tot))) AS BIGINT) AS budget
              FROM tot),
        c AS (SELECT doc_id, source, n_tok,
                     SUM(n_tok) OVER (PARTITION BY source
                                      ORDER BY h, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
              FROM t)
        SELECT c.doc_id, c.source, c.n_tok
        FROM c JOIN b USING (source)
        WHERE c.cum - c.n_tok < b.budget
        ORDER BY doc_id
    """,
    "docs_cap_per_source": """
        SELECT doc_id, source, n_chars FROM (
            SELECT doc_id, source, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rn
            FROM documents) WHERE rn <= 3
        ORDER BY doc_id
    """,
    "docs_decontaminate": r"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS t
          FROM documents),
        wins AS (
          SELECT doc_id, array_to_string(t[u.i:u.i+7], ' ') AS win
          FROM toks,
               unnest(generate_series(1, greatest(len(t) - 7, 0)))
                 AS u(i)),
        bench AS (SELECT DISTINCT win FROM wins WHERE doc_id % 50 = 0),
        train AS (SELECT doc_id, win FROM wins WHERE doc_id % 50 <> 0),
        hits AS (
          SELECT tr.doc_id, COUNT(b.win) AS hit
          FROM train tr LEFT JOIN bench b USING (win)
          GROUP BY tr.doc_id)
        SELECT d.doc_id, COALESCE(h.hit, 0) AS n_overlap,
               CAST(CASE WHEN COALESCE(h.hit, 0) > 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 50 <> 0 ORDER BY d.doc_id
    """,
    "docs_tfidf_topk": r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
          FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf
               FROM toks GROUP BY doc_id, token),
        df AS (SELECT token, COUNT(*) AS df
               FROM tf GROUP BY token),
        n AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.token, tf.tf, df.df,
                 tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score
          FROM tf JOIN df USING (token) CROSS JOIN n),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (
                     PARTITION BY doc_id
                     ORDER BY score DESC, token) AS rn
          FROM scored)
        SELECT doc_id, token, tf, df FROM ranked
        WHERE rn <= 3 ORDER BY doc_id, token
    """,
    "docs_length_buckets": """
        WITH ql AS (
          SELECT quantile_cont(n_chars, [0.125, 0.25, 0.375, 0.5,
                                         0.625, 0.75, 0.875]) AS q
          FROM documents),
        th AS (SELECT CAST(unnest(q) * 8 AS BIGINT) AS t_e8 FROM ql),
        b AS (
          SELECT d.doc_id, d.n_chars,
                 (SELECT CAST(SUM(CASE WHEN 8 * d.n_chars > t.t_e8
                                       THEN 1 ELSE 0 END) AS BIGINT)
                  FROM th t) AS bucket
          FROM documents d)
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars,
               CAST(COUNT(*) * MAX(n_chars) - SUM(n_chars) AS BIGINT)
                 AS padding_waste
        FROM b GROUP BY bucket ORDER BY bucket
    """,
    "docs_bm25_topk": r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
          FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf
               FROM toks GROUP BY doc_id, token),
        df AS (SELECT token, COUNT(*) AS df
               FROM tf GROUP BY token),
        dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
               FROM tf GROUP BY doc_id),
        t AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                     (SELECT SUM(dl) FROM dl) AS n_toks),
        scored AS (
          SELECT tf.doc_id, tf.token, tf.tf, df.df, dl.dl,
                 ln((CAST(t.n_docs AS DOUBLE) - df.df + 0.5)
                    / (df.df + 0.5) + 1.0)
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75
                    * (dl.dl / (CAST(t.n_toks AS DOUBLE) / t.n_docs))))
                   AS score
          FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
               CROSS JOIN t),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (
                     PARTITION BY doc_id
                     ORDER BY score DESC, token) AS rn
          FROM scored)
        SELECT doc_id, token, tf, df, dl FROM ranked
        WHERE rn <= 3 ORDER BY doc_id, token
    """,
    "docs_shuffle_order": """
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY
                 ((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296)
                   * 2147483648 + doc_id) - 1 AS shuffle_pos
        FROM documents ORDER BY doc_id
    """,
    "docs_train_val_test_split": """
        WITH s AS (
          SELECT CASE
                   WHEN ((CAST(doc_id AS HUGEINT) * 2654435761)
                         % 4294967296) % 10 < 8 THEN 'train'
                   WHEN ((CAST(doc_id AS HUGEINT) * 2654435761)
                         % 4294967296) % 10 = 8 THEN 'val'
                   ELSE 'test'
                 END AS split,
                 lang, length(text) AS n_chars
          FROM documents)
        SELECT split, lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM s GROUP BY split, lang ORDER BY split, lang
    """,
    "docs_quality_scores": """
        SELECT doc_id,
               length(text) AS text_len,
               len(regexp_extract_all(text, '[A-Za-z]')) AS alpha_chars,
               len(regexp_extract_all(text, '[0-9]')) AS digit_chars,
               len(regexp_extract_all(text, '[^A-Za-z0-9 \\t\\n\\r\\f\\v]')) AS punct_chars,
               len(regexp_extract_all(text, '\\S+')) AS n_tokens,
               CASE WHEN length(text) > 0
                    THEN len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                         / length(text) ELSE 0 END AS alpha_ratio
        FROM documents ORDER BY doc_id
    """,
    "docs_quality_gate": """
        WITH s AS (
          SELECT doc_id,
                 CASE WHEN length(text) > 0
                      THEN len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                           / length(text) ELSE 0 END AS alpha_ratio
          FROM documents)
        SELECT doc_id, alpha_ratio FROM s
        WHERE alpha_ratio >= (SELECT quantile_cont(alpha_ratio, 0.75)
                              FROM s)
        ORDER BY doc_id
    """,
    "docs_top_tokens": """
        WITH toks AS (
          SELECT unnest(regexp_extract_all(text, '\\S+')) AS token
          FROM documents)
        SELECT token, COUNT(*) AS n FROM toks
        GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
    "docs_sliding_chunks": """
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(text, '\\S+') AS toks
                   FROM documents),
        s AS (SELECT doc_id, toks,
                     unnest(generate_series(0, len(toks) - 1, 48))
                       AS start
              FROM t WHERE len(toks) > 0)
        SELECT doc_id, start // 48 AS chunk_idx,
               array_to_string(toks[start + 1 : start + 64], ' ')
                 AS chunk,
               LEAST(64, len(toks) - start) AS n_chunk_tokens
        FROM s ORDER BY doc_id, chunk_idx
    """,
    "docs_bigram_novelty": r"""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        bi AS (SELECT doc_id, toks[i] AS a, toks[i+1] AS b
               FROM (SELECT doc_id, toks,
                            unnest(generate_series(1, len(toks) - 1))
                              AS i
                     FROM t WHERE len(toks) > 1)),
        cab AS (SELECT a, b, COUNT(*) AS c_ab FROM bi GROUP BY a, b)
        SELECT bi.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CASE WHEN cab.c_ab = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               SUM(CASE WHEN cab.c_ab = 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*) AS novelty_rate
        FROM bi JOIN cab USING (a, b)
        GROUP BY bi.doc_id ORDER BY bi.doc_id
    """,
    "docs_bigram_lift": r"""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        bi AS (SELECT toks[i] AS a, toks[i+1] AS b
               FROM (SELECT toks,
                            unnest(generate_series(1, len(toks) - 1))
                              AS i
                     FROM t WHERE len(toks) > 1)),
        cab AS (SELECT a, b, COUNT(*) AS c_ab FROM bi GROUP BY a, b),
        uni AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS tok
                FROM documents),
        cu AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
        n AS (SELECT COUNT(*) AS n FROM uni)
        SELECT cab.a, cab.b, c_ab, ca.c AS c_a, cb.c AS c_b,
               c_ab * CAST(n.n AS DOUBLE) / (ca.c * cb.c) AS lift
        FROM cab JOIN cu ca ON cab.a = ca.tok
                 JOIN cu cb ON cab.b = cb.tok
        CROSS JOIN n
        WHERE c_ab >= 5
        ORDER BY lift DESC, cab.a, cab.b LIMIT 20
    """,
    "docs_heavy_tokens": """
        WITH toks AS (
          SELECT unnest(regexp_extract_all(text, '\\S+')) AS token
          FROM documents)
        SELECT token, COUNT(*) AS n,
               TRUE AS sketch_recovered, TRUE AS sketch_bound_ok
        FROM toks GROUP BY token ORDER BY n DESC, token LIMIT 10
    """,
    "docs_lang_counts": """
        SELECT lang, COUNT(*) AS n_docs FROM documents
        GROUP BY lang ORDER BY lang
    """,
    "docs_clean_text": """
        WITH c AS (
          SELECT doc_id,
                 regexp_replace(
                   regexp_replace(nfc_normalize(text),
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
                   'https?://[A-Za-z0-9./_%+~#?&=-]+', '<URL>', 'g')
                   AS clean_text,
                 text
          FROM documents)
        SELECT doc_id, clean_text, length(clean_text) AS clean_len,
               CAST(CASE WHEN clean_text <> text THEN 1 ELSE 0 END
                    AS BIGINT) AS changed
        FROM c ORDER BY doc_id
    """,
    "docs_pii_scrub": r"""
        WITH inj AS (
          SELECT source,
                 CASE WHEN doc_id % 7 = 0
                      THEN text || ' contact user'
                           || CAST(doc_id AS VARCHAR) || '@example.com'
                      ELSE text END
                 || CASE WHEN doc_id % 11 = 0
                      THEN ' call 555-'
                           || CAST(100 + doc_id % 900 AS VARCHAR) || '-'
                           || CAST(1000 + doc_id % 9000 AS VARCHAR)
                      ELSE '' END AS t
          FROM documents)
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(length(regexp_extract_all(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')))
                 AS BIGINT) AS emails,
               CAST(SUM(length(regexp_extract_all(t,
                 '\b555-[0-9]{3}-[0-9]{4}\b'))) AS BIGINT) AS phones,
               CAST(SUM(length(regexp_replace(regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
                 '\b555-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g')))
                 AS BIGINT) AS clean_chars
        FROM inj GROUP BY source ORDER BY source
    """,
    "docs_curation_funnel": r"""
        WITH base AS (
          SELECT doc_id, source,
                 CASE WHEN doc_id % 7 = 0
                      THEN text || ' contact user'
                           || CAST(doc_id AS VARCHAR) || '@example.com'
                      ELSE text END
                 || CASE WHEN doc_id % 11 = 0
                      THEN ' call 555-'
                           || CAST(100 + doc_id % 900 AS VARCHAR) || '-'
                           || CAST(1000 + doc_id % 9000 AS VARCHAR)
                      ELSE '' END AS t
          FROM documents),
        corpus AS (
          SELECT * FROM base
          UNION ALL
          SELECT doc_id + 20000000, source, t FROM base
          WHERE doc_id % 13 = 0 AND doc_id % 7 <> 0
            AND doc_id % 11 <> 0),
        scrub AS (
          SELECT doc_id, source,
                 len(regexp_extract_all(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                   AS emails,
                 len(regexp_extract_all(t,
                   '\b555-[0-9]{3}-[0-9]{4}\b')) AS phones,
                 regexp_replace(regexp_replace(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                   '\b555-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS t
          FROM corpus),
        gate AS (
          SELECT * FROM scrub
          WHERE len(regexp_extract_all(t, '[A-Za-z]')) * 1.0
                / length(t) >= 0.82),
        ex AS (SELECT MIN(doc_id) AS doc_id FROM gate GROUP BY md5(t)),
        exk AS (SELECT g.* FROM gate g
                WHERE g.doc_id IN (SELECT doc_id FROM ex)),
        w AS (SELECT doc_id, string_split(t, ' ') AS words FROM exk),
        g3 AS (SELECT doc_id, array_to_string(words[i:i+2], ' ') AS sh
               FROM w, UNNEST(range(1, len(words) - 1)) AS r(i)
               WHERE len(words) >= 3),
        s2 AS (SELECT DISTINCT doc_id, sh FROM g3),
        df AS (SELECT sh, COUNT(*) AS df FROM s2 GROUP BY sh),
        f AS (SELECT s2.doc_id, s2.sh FROM s2 JOIN df USING (sh)
              WHERE df.df <= 256),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM f GROUP BY doc_id),
        co AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      COUNT(*) AS n_shared
               FROM f a JOIN f b USING (sh)
               WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        nd AS (SELECT DISTINCT co.id_b FROM co
               JOIN sz sa ON sa.doc_id = co.id_a
               JOIN sz sb ON sb.doc_id = co.id_b
               WHERE CAST(co.n_shared AS DOUBLE)
                     / (sa.n + sb.n - co.n_shared) >= 0.6),
        fin AS (SELECT * FROM exk
                WHERE doc_id NOT IN (SELECT id_b FROM nd)),
        r_in AS (SELECT source, COUNT(*) AS n_in,
                        CAST(SUM(emails) AS BIGINT) AS emails,
                        CAST(SUM(phones) AS BIGINT) AS phones
                 FROM scrub GROUP BY source),
        r_gate AS (SELECT source, COUNT(*) AS n_gate
                   FROM gate GROUP BY source),
        r_ex AS (SELECT source, COUNT(*) AS n_exact
                 FROM exk GROUP BY source),
        r_fin AS (SELECT source, COUNT(*) AS n_kept,
                         CAST(SUM(len(regexp_extract_all(t, '\S+')))
                              AS BIGINT) AS tokens_kept
                  FROM fin GROUP BY source)
        -- LEFT joins + zero fills mirror the engine's report merge: a
        -- source whose every doc dies at the gate (or a dedup stage)
        -- still gets its zeros row instead of vanishing from the report
        SELECT source, n_in, emails, phones,
               COALESCE(n_gate, 0) AS n_gate,
               COALESCE(n_exact, 0) AS n_exact,
               COALESCE(n_kept, 0) AS n_kept,
               COALESCE(tokens_kept, 0) AS tokens_kept
        FROM r_in LEFT JOIN r_gate USING (source)
                  LEFT JOIN r_ex USING (source)
                  LEFT JOIN r_fin USING (source)
        ORDER BY source
    """,
    "docs_exact_dedup": """
        SELECT MIN(doc_id) AS doc_id FROM documents
        GROUP BY md5(text) ORDER BY doc_id
    """,
    "docs_exact_dedup_indexed": """
        SELECT MIN(doc_id) AS doc_id FROM documents
        GROUP BY md5(text) ORDER BY doc_id
    """,
    "docs_fingerprint": """
        SELECT doc_id, md5(text) AS fingerprint
        FROM documents ORDER BY doc_id
    """,
    "embeddings_knn_confusion": """
        WITH p AS (
          SELECT a.vec_id AS qid, a.label AS actual,
                 b.vec_id AS nid, b.label AS nlabel,
                 ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                              b.embedding::DOUBLE[]), 4)
                   AS cos4
          FROM embeddings a JOIN embeddings b
               ON a.vec_id <> b.vec_id),
        r AS (SELECT *, ROW_NUMBER() OVER (
                         PARTITION BY qid
                         ORDER BY cos4 DESC, nid) AS rk FROM p),
        v AS (SELECT qid, actual, nlabel, COUNT(*) AS c
              FROM r WHERE rk <= 5 GROUP BY qid, actual, nlabel),
        pred AS (SELECT qid, actual, nlabel AS predicted,
                        ROW_NUMBER() OVER (
                          PARTITION BY qid
                          ORDER BY c DESC, nlabel) AS vr FROM v)
        SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred WHERE vr = 1
        GROUP BY actual, predicted ORDER BY actual, predicted
    """,
    "embeddings_label_outliers": """
        WITH dims AS (
          SELECT label, i, SUM(embedding[i]::DOUBLE) AS sd
          FROM embeddings, range(1, 65) t(i)
          GROUP BY label, i),
        cen AS (
          SELECT label, list(sd ORDER BY i) AS cen
          FROM dims GROUP BY label),
        scored AS (
          SELECT e.label,
                 list_cosine_similarity(e.embedding::DOUBLE[], c.cen)
                   AS cos
          FROM embeddings e JOIN cen c USING (label))
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN cos < 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_outliers,
               ROUND(AVG(cos), 3) AS avg_cos
        FROM scored GROUP BY label ORDER BY label
    """,
    "embeddings_knn_bruteforce": """
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                   WHERE vec_id = 0)
        SELECT e.vec_id,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 4)
                 AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <> 0
        ORDER BY cos_sim DESC, e.vec_id LIMIT 10
    """,
}


def _lang_id_sql() -> str:
    """docs_lang_id oracle, generated from the SAME _STOPWORDS /_CJK
    patterns the engine uses (no drift): per-language stopword-hit
    ratios, first-max-in-declaration-order tie-break (the CASE chain
    mirrors pandas idxmax), CJK override, 0.05 confidence floor. The
    patterns are ASCII-\\b-anchored alternations, so Python re
    (leftmost-first) and DuckDB RE2 (leftmost-longest) find the same
    non-overlapping match set."""
    from .stages.text_analysis import _CJK, _STOPWORDS
    langs = list(_STOPWORDS)
    scores = ",\n               ".join(
        f"len(regexp_extract_all(lower(text), '{pat}')) * 1.0"
        f" / GREATEST(len(regexp_extract_all(text, '\\S+')), 1)"
        f" AS s_{lang}"
        for lang, pat in _STOPWORDS.items())
    # first max in declaration order == pandas idxmax(axis=1)
    cases = []
    for i, lang in enumerate(langs):
        conds = " AND ".join(f"s_{lang} >= s_{other}"
                             for other in langs[i + 1:])
        cases.append(f"WHEN {conds} THEN '{lang}'" if conds
                     else f"ELSE '{lang}'")
    case_chain = "\n                      ".join(cases)
    return f"""
        WITH s AS (
          SELECT doc_id,
               {scores},
               len(regexp_extract_all(text, '{_CJK}')) * 1.0
                 / GREATEST(length(text), 1) AS cjk_ratio
          FROM documents),
        b AS (
          SELECT doc_id,
                 GREATEST({', '.join('s_' + lg for lg in langs)})
                   AS confidence,
                 CASE {case_chain} END AS best,
                 cjk_ratio
          FROM s)
        SELECT doc_id,
               CASE WHEN cjk_ratio > 0.2 THEN 'zh'
                    WHEN confidence >= 0.05 THEN best
                    ELSE 'unknown' END AS pred_lang,
               confidence
        FROM b ORDER BY doc_id
    """


ORACLES["docs_lang_id"] = _lang_id_sql()

# winnowing is SQL-expressible because the engine's gram hash IS
# DuckDB's md5_number_upper (text_analysis.winnow_batch); the window
# min is a ROWS-frame window function. Docs shorter than one full
# window keep the min over all their grams (the i = cnt row's partial
# window), mirroring the engine's keepdims fallback.
ORACLES["docs_winnow_fingerprints"] = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
               FROM documents),
    g AS (SELECT doc_id, i,
                 md5_number_upper(array_to_string(words[i:i+4], ' '))
                   AS h
          FROM w, UNNEST(range(1, len(words) - 3)) AS r(i)
          WHERE len(words) >= 5),
    c AS (SELECT doc_id, COUNT(*) AS cnt FROM g GROUP BY doc_id),
    m AS (SELECT g.doc_id, g.i, c.cnt,
                 MIN(h) OVER (PARTITION BY g.doc_id ORDER BY g.i
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                   AS fp
          FROM g JOIN c USING (doc_id)),
    fps AS (SELECT DISTINCT doc_id, fp FROM m
            WHERE (cnt >= 4 AND i >= 4) OR (cnt < 4 AND i = cnt)),
    agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
                   CAST(MIN(fp) AS DOUBLE) AS fp_min,
                   CAST(MAX(fp) AS DOUBLE) AS fp_max
            FROM fps GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(a.n_fingerprints, 0) AS n_fingerprints,
           COALESCE(a.fp_min, 0.0) AS fp_min,
           COALESCE(a.fp_max, 0.0) AS fp_max
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
"""

# The corr/slope oracle mirrors the engine's expression tree exactly:
# exact integer sufficient statistics (every sum < 2^53 here, so the
# int->double casts are lossless), then the identical sequence of
# double multiplies/subtracts/divides — bit-equal before ROUND.
ORACLES["events_value_hour_corr"] = """
    WITH s AS (SELECT event_type,
                      CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x,
                      CAST(ROUND(value * 100) AS BIGINT) AS y
               FROM events),
    a AS (SELECT event_type, COUNT(*) AS n,
                 SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy
          FROM s GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS corr_value_hour,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS slope_cents_per_hour
    FROM a ORDER BY event_type
"""

ORACLES["docs_source_entropy"] = r"""
    WITH tok AS (SELECT source,
                        unnest(regexp_extract_all(text, '\S+')) AS token
                 FROM documents),
    cnt AS (SELECT source, token, COUNT(*) AS c
            FROM tok GROUP BY source, token),
    agg AS (SELECT source,
                   SUM(c) AS n_tokens, COUNT(*) AS n_types,
                   SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
                     AS s
            FROM cnt GROUP BY source)
    SELECT source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           ROUND(log2(CAST(n_tokens AS DOUBLE))
                 - s / CAST(n_tokens AS DOUBLE), 6) AS entropy_bits,
           ROUND(CAST(n_types AS DOUBLE)
                 / CAST(n_tokens AS DOUBLE), 6) AS type_token_ratio
    FROM agg ORDER BY source
"""

# The oracle takes the direct route the engine's bitmask plan avoids:
# a token self-join between source pairs (Σ_token df² rows — fine at
# oracle scale, the exact blowup the mask histogram sidesteps).
ORACLES["docs_vocab_overlap"] = r"""
    WITH tok AS (SELECT source,
                        unnest(regexp_extract_all(text, '\S+')) AS token
                 FROM documents),
    st AS (SELECT DISTINCT source, token FROM tok),
    cnt AS (SELECT source, COUNT(*) AS n FROM st GROUP BY source),
    pairs AS (SELECT a.source AS source_a, b.source AS source_b,
                     a.n AS n_a, b.n AS n_b
              FROM cnt a JOIN cnt b ON a.source < b.source),
    inter AS (SELECT x.source AS sa, y.source AS sb, COUNT(*) AS c
              FROM st x JOIN st y
                ON x.token = y.token AND x.source < y.source
              GROUP BY 1, 2)
    SELECT p.source_a, p.source_b,
           CAST(p.n_a AS BIGINT) AS n_a, CAST(p.n_b AS BIGINT) AS n_b,
           CAST(COALESCE(i.c, 0) AS BIGINT) AS n_common,
           CAST(p.n_a + p.n_b - COALESCE(i.c, 0) AS BIGINT) AS n_union,
           ROUND(CAST(COALESCE(i.c, 0) AS DOUBLE)
                 / CAST(p.n_a + p.n_b - COALESCE(i.c, 0) AS DOUBLE),
                 6) AS jaccard
    FROM pairs p LEFT JOIN inter i
      ON p.source_a = i.sa AND p.source_b = i.sb
    ORDER BY source_a, source_b
"""

# PSI oracle: identical integer split/bin/smoothing arithmetic, the
# same (c+1)/(N+10) rationals, and a dense type x window x bin grid so
# empty bins contribute their smoothed mass exactly like the engine's
# zero-filled count matrix.
ORACLES["events_value_drift_psi"] = """
    WITH r AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
               FROM events),
    b AS (SELECT event_type,
                 CASE WHEN epoch_us(ts) >= (r.lo + r.hi) // 2
                      THEN 1 ELSE 0 END AS w,
                 LEAST(9, GREATEST(0,
                     CAST(ROUND(value * 100) AS BIGINT) // 5000))
                   AS bin
          FROM events, r),
    c AS (SELECT event_type, w, bin, COUNT(*) AS n
          FROM b GROUP BY 1, 2, 3),
    grid AS (SELECT g.event_type, ws.w, bins.bin
             FROM (SELECT DISTINCT event_type FROM events) g
             CROSS JOIN (SELECT unnest([0, 1]) AS w) ws
             CROSS JOIN (SELECT unnest(range(10)) AS bin) bins),
    dense AS (SELECT grid.event_type, grid.w, grid.bin,
                    COALESCE(c.n, 0) AS n
             FROM grid LEFT JOIN c
               ON grid.event_type = c.event_type
              AND grid.w = c.w AND grid.bin = c.bin),
    tot AS (SELECT event_type, w, SUM(n) AS nt
            FROM dense GROUP BY 1, 2),
    pq AS (SELECT f0.event_type, f0.bin,
                  CAST(f0.n + 1 AS DOUBLE)
                    / CAST(t0.nt + 10 AS DOUBLE) AS p,
                  CAST(f1.n + 1 AS DOUBLE)
                    / CAST(t1.nt + 10 AS DOUBLE) AS q,
                  t0.nt AS n_first, t1.nt AS n_second
           FROM dense f0
           JOIN dense f1 ON f0.event_type = f1.event_type
                       AND f0.bin = f1.bin AND f0.w = 0 AND f1.w = 1
           JOIN tot t0 ON t0.event_type = f0.event_type AND t0.w = 0
           JOIN tot t1 ON t1.event_type = f0.event_type AND t1.w = 1)
    SELECT event_type,
           CAST(MAX(n_first) AS BIGINT) AS n_first,
           CAST(MAX(n_second) AS BIGINT) AS n_second,
           ROUND(SUM((p - q) * ln(p / q)), 6) AS psi
    FROM pq GROUP BY event_type ORDER BY event_type
"""

# The WAU oracle pays the same explode as a day-spine self-join; the
# window is the 6 preceding OBSERVED days plus the current one.
ORACLES["events_rolling_wau"] = """
    WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
                FROM events),
    days AS (SELECT DISTINCT day FROM du),
    win AS (SELECT d.day AS day, du.user_id
            FROM days d JOIN du
              ON du.day BETWEEN d.day - INTERVAL 6 DAY AND d.day)
    SELECT w.day,
           (SELECT COUNT(*) FROM du WHERE du.day = w.day) AS dau,
           COUNT(DISTINCT w.user_id) AS wau
    FROM win w GROUP BY w.day ORDER BY w.day
"""

# Same expression tree as orders_customer_join_stats: the bucketed
# disk path must produce the identical aggregate.
ORACLES["orders_customer_bucketed_join"] = """
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

# The SemDeDup oracles share one augmented-corpus CTE body: the
# deterministic collinear-duplicate injection mirrored expression-for-
# expression from stages.similarity.semantic_inject_batch (embedding
# cast to DOUBLE before scaling on both sides, so the vectors are
# bit-identical; cosine is scale-invariant, and the 0.9 threshold sits
# between the injected ~1.0 pairs and the natural <=0.65 corpus, so
# ulp-level expression-tree differences cannot flip a pair).
_SEMANTIC_AUG_SQL = """
    aug AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb, CAST(label AS BIGINT) AS label
      FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(embedding::DOUBLE[], x -> x * 1.25),
             CAST(label AS BIGINT)
      FROM embeddings WHERE vec_id % 17 = 0
      UNION ALL
      SELECT vec_id + 3000000,
             list_transform(embedding::DOUBLE[], x -> x * 0.8),
             CAST(label AS BIGINT)
      FROM embeddings WHERE vec_id % 51 = 0),
    sem_pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS block
      FROM aug a JOIN aug b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.emb, b.emb) >= 0.9)
"""

ORACLES["embeddings_semantic_pairs"] = f"""
    WITH {_SEMANTIC_AUG_SQL}
    SELECT vec_a, vec_b, block FROM sem_pairs ORDER BY vec_a, vec_b
"""

# Keep-list oracle: recursive-CTE min-label closure over the pair
# graph — cc(n, m) holds every (node, component member) pair, so
# MIN(m) per node is the component's min id, exactly the engine's
# distributed min-label fixpoint.
ORACLES["embeddings_semantic_dedup"] = f"""
    WITH RECURSIVE {_SEMANTIC_AUG_SQL},
    edges AS (SELECT vec_a AS a, vec_b AS b FROM sem_pairs
              UNION ALL
              SELECT vec_b, vec_a FROM sem_pairs),
    cc(n, m) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, cc.m FROM cc JOIN edges e ON e.a = cc.n)
    SELECT n AS vec_id, MIN(m) AS rep,
           CAST(n = MIN(m) AS BIGINT) AS kept
    FROM cc GROUP BY n ORDER BY vec_id
"""

# Engine expression tree mirrored exactly: p = cnt / n (DOUBLE), then
# w = tf * ln(p), ce = -SUM(w) / SUM(tf) rounded to 3dp.
ORACLES["docs_unigram_ce"] = r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
      FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf
           FROM toks GROUP BY doc_id, token),
    cnt AS (SELECT token, SUM(tf) AS cnt FROM tf GROUP BY token),
    t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM cnt),
    w AS (SELECT tf.doc_id, tf.tf,
                 tf.tf * ln(CAST(cnt.cnt AS DOUBLE) / t.n) AS w
          FROM tf JOIN cnt USING (token) CROSS JOIN t)
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl,
           ROUND(-SUM(w) / SUM(tf), 3) AS ce
    FROM w GROUP BY doc_id ORDER BY doc_id
"""

# The kmeans-blocked variant shares the pair-threshold oracle (no
# block column): exact on this corpus because every >=0.9 pair is a
# collinear injected duplicate, which normalizes to the same point and
# therefore always shares a cluster (see the query docstring; the
# blocking-recall property is separately asserted in tests).
ORACLES["embeddings_semantic_pairs_kmeans"] = f"""
    WITH {_SEMANTIC_AUG_SQL}
    SELECT vec_a, vec_b FROM sem_pairs ORDER BY vec_a, vec_b
"""

# Gopher-rule thresholds mirrored as the SAME cross-multiplied integer
# comparisons the engine evaluates — no float ever enters the compare.
ORACLES["docs_gopher_rules"] = """
    WITH sig AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[^ \t\n\f\r]+'))
                  AS BIGINT) AS word_count,
             CAST(len(regexp_extract_all(text, '[^ \t\n\f\r]'))
                  AS BIGINT) AS word_chars,
             CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…'))
                  AS BIGINT) AS symbols,
             CAST(length(text) - length(replace(text, chr(10), '')) + 1
                  AS BIGINT) AS n_lines,
             CAST(len(regexp_extract_all(text, '(?m)^[ \t]*[-*•]'))
                  AS BIGINT) AS bullet_lines,
             CAST(len(regexp_extract_all(text,
                  '(?m)(\\.\\.\\.|…)$')) AS BIGINT) AS ellipsis_lines,
             CAST(len(regexp_extract_all(text,
                  '[^ \t\n\f\r]*[A-Za-z][^ \t\n\f\r]*')) AS BIGINT)
               AS alpha_words,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM
                unnest(regexp_extract_all(text, '[^ \t\n\f\r]+'))
                  AS t(tok)
              WHERE regexp_replace(lower(tok),
                      '^[^0-9a-z]+|[^0-9a-z]+$', '', 'g')
                    IN ('the','be','to','of','and','that','have','with'))
               AS stop_hits,
             (SELECT CAST(COUNT(DISTINCT regexp_replace(lower(tok),
                      '^[^0-9a-z]+|[^0-9a-z]+$', '', 'g')) AS BIGINT)
              FROM unnest(regexp_extract_all(text, '[^ \t\n\f\r]+'))
                  AS t(tok)
              WHERE regexp_replace(lower(tok),
                      '^[^0-9a-z]+|[^0-9a-z]+$', '', 'g')
                    IN ('the','be','to','of','and','that','have','with'))
               AS stop_distinct,
             (SELECT COUNT(DISTINCT l.line) FROM
                unnest(string_split(text, chr(10))) AS l(line))
               AS n_distinct
      FROM documents)
    SELECT doc_id, word_count, word_chars, symbols, n_lines,
           bullet_lines, ellipsis_lines, alpha_words, stop_hits,
           stop_distinct,
           CAST(n_lines - n_distinct AS BIGINT) AS dup_lines,
           CAST(word_count >= 50 AND word_count <= 100000 AS BIGINT)
             AS r_word_count,
           CAST(word_chars >= 3 * word_count
                AND word_chars <= 10 * word_count AS BIGINT)
             AS r_mean_word_len,
           CAST(10 * symbols <= word_count AS BIGINT) AS r_symbol_ratio,
           CAST(10 * bullet_lines <= 9 * n_lines AS BIGINT) AS r_bullet,
           CAST(10 * ellipsis_lines <= 3 * n_lines AS BIGINT)
             AS r_ellipsis,
           CAST(5 * alpha_words >= 4 * word_count AS BIGINT)
             AS r_alpha_words,
           CAST(stop_hits >= 2 AS BIGINT) AS r_stopwords,
           CAST(10 * (n_lines - n_distinct) <= 3 * n_lines AS BIGINT)
             AS r_dup_lines,
           CAST((word_count >= 50 AND word_count <= 100000)
                AND (word_chars >= 3 * word_count
                     AND word_chars <= 10 * word_count)
                AND 10 * symbols <= word_count
                AND 10 * bullet_lines <= 9 * n_lines
                AND 10 * ellipsis_lines <= 3 * n_lines
                AND 5 * alpha_words >= 4 * word_count
                AND stop_hits >= 2
                AND 10 * (n_lines - n_distinct) <= 3 * n_lines
                AS BIGINT) AS passes
    FROM sig ORDER BY doc_id
"""

# C4 line retention mirrored lambda-for-lambda: list_filter over the
# same ASCII-explicit RE2 predicates the engine's per-line masks use.
ORACLES["docs_c4_filters"] = """
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN regexp_replace(text,
                       '((?:[^ ]+ ){5}[^ ]+) ', '\\1.' || chr(10), 'g')
                  ELSE text END
             || CASE WHEN doc_id % 13 = 0
                     THEN chr(10) || 'see var x = {1} in code'
                     ELSE '' END
             || CASE WHEN doc_id % 17 = 0
                     THEN chr(10)
                          || 'lorem ipsum dolor sit amet today ok.'
                     ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN chr(10)
                          || 'This menu needs javascript enabled today.'
                     ELSE '' END AS text
      FROM documents),
    f AS (
      SELECT doc_id, text,
             list_filter(string_split(text, chr(10)),
               l -> regexp_matches(l, '[.!?\\"]$')
                    AND len(regexp_extract_all(l,
                            '[^ \\t\\n\\f\\r]+')) >= 5
                    AND NOT regexp_matches(l, '(?i)javascript'))
               AS kept
      FROM aug),
    s AS (
      SELECT doc_id,
             CAST(len(string_split(text, chr(10))) AS BIGINT)
               AS n_lines,
             CAST(len(kept) AS BIGINT) AS kept_lines,
             COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
             CAST(contains(text, '{') AS BIGINT) AS has_brace,
             CAST(regexp_matches(text, '(?i)lorem ipsum') AS BIGINT)
               AS has_lorem
      FROM f)
    SELECT doc_id, n_lines, kept_lines,
           CAST(len(regexp_extract_all(clean_text, '[.!?]')) AS BIGINT)
             AS n_sentences,
           has_brace, has_lorem,
           CAST(has_brace = 0 AND has_lorem = 0
                AND len(regexp_extract_all(clean_text, '[.!?]')) >= 3
                AS BIGINT) AS keep_page,
           clean_text
    FROM s ORDER BY doc_id
"""


def _gopher_repetition_sql() -> str:
    """The repetition-family oracle, generated per n so the nine
    near-identical correlated subqueries stay in lockstep with
    text_analysis._REP_TOP/_REP_DUP (imported here — one threshold
    table for both engines)."""
    from .stages.text_analysis import _REP_DUP, _REP_TOP
    def grams(n: str, agg: str) -> str:
        return f"""(SELECT COALESCE(CAST({agg} AS BIGINT), 0) FROM (
          SELECT COUNT(*) AS c, CAST(length(g) - {n - 1} AS BIGINT) AS cl
          FROM unnest(list_transform(
                 generate_series(1, len(tk) - {n - 1}),
                 i -> array_to_string(tk[i:i+{n - 1}], ' '))) AS t(g)
          GROUP BY g))"""
    cols, rules, bools = [], [], []
    for n, (lm, rm) in _REP_TOP.items():
        cols.append(f"{grams(n, 'MAX(c * cl)')} AS top{n}_chars")
        bools.append(f"{lm} * top{n}_chars <= {rm} * word_chars")
        rules.append(f"CAST({bools[-1]} AS BIGINT) AS r_top{n}")
    for n, (lm, rm) in _REP_DUP.items():
        cols.append(f"{grams(n, 'SUM(CASE WHEN c >= 2 THEN c * cl END)')}"
                    f" AS dup{n}_chars")
        bools.append(f"{lm} * dup{n}_chars <= {rm} * word_chars")
        rules.append(f"CAST({bools[-1]} AS BIGINT) AS r_dup{n}")
    bools.append("5 * dup_line_chars <= word_chars")
    rules.append(f"CAST({bools[-1]} AS BIGINT) AS r_dup_line_chars")
    pass_expr = " + ".join(f"CAST({b} AS BIGINT)" for b in bools)
    cols_sql = ",\n             ".join(cols)
    rule_sql = ",\n           ".join(rules)
    from .stages.text_analysis import _REP_LINE, _REP_PHRASE
    return f"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 23 = 0
                  THEN t9 || chr(10) || '{_REP_LINE}'
                          || chr(10) || '{_REP_LINE}'
                  ELSE t9 END AS text
      FROM (SELECT doc_id,
                   CASE WHEN doc_id % 9 = 0
                        THEN text || ' {_REP_PHRASE} {_REP_PHRASE}'
                        ELSE text END AS t9
            FROM documents)),
    tk0 AS (
      SELECT doc_id, text,
             regexp_extract_all(text, '[^ \t\n\f\r]+') AS tk
      FROM aug),
    sig AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[^ \t\n\f\r]'))
                  AS BIGINT) AS word_chars,
             {cols_sql},
             (SELECT COALESCE(CAST(SUM(CASE WHEN c >= 2 THEN c * cl END)
                     AS BIGINT), 0) FROM (
                SELECT COUNT(*) AS c, CAST(length(l) AS BIGINT) AS cl
                FROM unnest(string_split(text, chr(10))) AS t(l)
                WHERE l <> '' GROUP BY l)) AS dup_line_chars
      FROM tk0)
    SELECT *,
           {rule_sql},
           CAST(({pass_expr}) = {len(bools)} AS BIGINT) AS passes
    FROM sig ORDER BY doc_id
"""


ORACLES["docs_gopher_repetition"] = _gopher_repetition_sql()


# DSIR mirrors the engine expression-for-expression: the bucket hash
# IS DuckDB's md5_number_upper mod K (the winnow precedent), the two
# histograms are integer-exact, the per-bucket log-ratio is the same
# ln((ct+1)/(tt+K)) - ln((cr+1)/(tr+K)) double tree, and the per-doc
# weight is ROUNDed to 3dp (the docs_unigram_ce float surface);
# `selected` gates on the ROUNDED value so both engines decide
# identically. Docs with no tokens emit no row on either side.
ORACLES["docs_dsir_weights"] = r"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(regexp_extract_all(text, '\S+'))
               AS token
      FROM documents),
    db AS (SELECT doc_id,
                  CAST(md5_number_upper(token) % 256 AS BIGINT)
                    AS bucket,
                  CAST(COUNT(*) AS BIGINT) AS tf,
                  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                       AS BIGINT) AS tt
           FROM toks GROUP BY doc_id, bucket),
    hist AS (SELECT bucket, SUM(tf) AS cr, SUM(tt) AS ct
             FROM db GROUP BY bucket),
    tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS ts FROM hist),
    lr AS (SELECT bucket,
                  ln(CAST(ct + 1 AS DOUBLE)
                     / CAST(ts + 256 AS DOUBLE))
                  - ln(CAST(cr + 1 AS DOUBLE)
                       / CAST(tr + 256 AS DOUBLE)) AS lw
           FROM hist CROSS JOIN tot),
    perdoc AS (SELECT db.doc_id,
                      CAST(SUM(db.tf) AS BIGINT) AS dl,
                      ROUND(SUM(CAST(db.tf AS DOUBLE) * lr.lw), 3)
                        AS logw
               FROM db JOIN lr USING (bucket) GROUP BY db.doc_id)
    SELECT doc_id, dl, logw,
           CAST(logw > 0 AS BIGINT) AS selected
    FROM perdoc ORDER BY doc_id
"""


# BPE pair counts mirror the engine stage-for-stage: the same RE2
# \S+ tokenization, the same distinct-word frequency table, and the
# same code-point pair slicing (DuckDB substring's character offsets
# equal pandas .str.slice — pinned by the unicode parity test).
# Counts are integer-exact; the LIMIT-20 boundary tie-breaks on the
# pair text, identical under Python code-point < and DuckDB's binary
# UTF-8 collation.
ORACLES["docs_bpe_pair_counts"] = r"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(text, '\S+')) AS w
      FROM documents),
    words AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
              FROM toks GROUP BY w),
    idx AS (SELECT w, c,
                   unnest(generate_series(1, length(w) - 1)) AS i
            FROM words),
    pairs AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
                     CAST(SUM(c) AS BIGINT) AS cnt
              FROM idx GROUP BY 1)
    SELECT pair, cnt FROM pairs ORDER BY cnt DESC, pair LIMIT 20
"""


# The BPE-encode oracle is GENERATED from the same fixed merge table
# the engine broadcasts: each merge becomes one replace() over the
# [c][c]-wrapped word (bracket wrapping == one leftmost
# non-overlapping BPE merge pass; see docs_bpe_encode's docstring).
def _bpe_encode_oracle_sql() -> str:
    from .stages.text_analysis import BPE_FIXED_MERGES
    expr = r"regexp_replace(w, '(.)', '[\1]', 'g')"
    for a, b in BPE_FIXED_MERGES:
        expr = (f"replace({expr}, '[{a}][{b}]', '[{a}{b}]')")
    return rf"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS w
      FROM documents),
    vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
              FROM toks GROUP BY w),
    enc AS (SELECT {expr} AS s, c FROM vocab),
    syms AS (SELECT unnest(regexp_extract_all(s, '\[([^\]]*)\]', 1))
                    AS symbol, c
             FROM enc)
    SELECT symbol, CAST(SUM(c) AS BIGINT) AS n
    FROM syms GROUP BY symbol
    ORDER BY n DESC, symbol LIMIT 50
"""


ORACLES["docs_bpe_encode"] = _bpe_encode_oracle_sql()


# The PageRank oracle is GENERATED: one chained CTE per power
# iteration (standard SQL forbids aggregates in a recursive CTE's
# recursive term), each mirroring the engine's exact fixed-point
# integer recurrence — per-edge floor BEFORE the inflow sum, HUGEINT
# products (rank * w overflows int64 at corpus scale), all-positive
# operands so // floors on both sides.
def _pagerank_oracle_sql() -> str:
    scale, iters = _PAGERANK_SCALE, _PAGERANK_ITERS
    base = (f"(15 * CAST({scale} AS HUGEINT)) "
            f"// (100 * (SELECT COUNT(*) FROM nodes))")
    ctes = [f"""r0 AS (
      SELECT v, (SELECT CAST({scale} AS HUGEINT) // COUNT(*)
                 FROM nodes) AS rank
      FROM nodes)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} AS (
      SELECT n.v AS v,
             {base} + (85 * COALESCE(SUM((p.rank * e.w) // o.wo),
                                     CAST(0 AS HUGEINT))) // 100
               AS rank
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.v
      LEFT JOIN r{k - 1} p ON p.v = e.src
      LEFT JOIN wout o ON o.src = e.src
      GROUP BY n.v)""")
    chain = ",\n    ".join(ctes)
    return f"""
    WITH lagw AS (
      SELECT COALESCE(LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id),
             '(start)') AS src,
             event_type AS dst
      FROM events),
    edges AS (SELECT src, dst, CAST(COUNT(*) AS HUGEINT) AS w
              FROM lagw WHERE src <> '(start)' GROUP BY src, dst),
    nodes AS (SELECT DISTINCT event_type AS v FROM events),
    wout AS (SELECT src, SUM(w) AS wo FROM edges GROUP BY src),
    {chain}
    SELECT v AS event_type, CAST(rank AS BIGINT) AS rank_scaled
    FROM r{iters} ORDER BY event_type
"""


ORACLES["events_type_pagerank"] = _pagerank_oracle_sql()


ORACLES["docs_hapax_ratio"] = r"""
    WITH toks AS (
      SELECT source, unnest(regexp_extract_all(text, '\S+')) AS token
      FROM documents),
    v AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
          FROM toks GROUP BY source, token)
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           (CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
            * 1000) // CAST(COUNT(*) AS BIGINT) AS hapax_milli
    FROM v GROUP BY source ORDER BY source
"""


ORACLES["docs_charclass_profile"] = """
    WITH sig AS (
      SELECT source,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(text, '[A-Za-z]'))
                  AS BIGINT) AS ascii_alpha,
             CAST(len(regexp_extract_all(text, '[0-9]'))
                  AS BIGINT) AS digits,
             CAST(len(regexp_extract_all(text, '[ \t\n\f\r]'))
                  AS BIGINT) AS spaces
      FROM documents)
    SELECT source,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(ascii_alpha) AS BIGINT) AS ascii_alpha,
           CAST(SUM(digits) AS BIGINT) AS digits,
           CAST(SUM(spaces) AS BIGINT) AS spaces,
           CAST(SUM(n_chars - ascii_alpha - digits - spaces)
                AS BIGINT) AS other
    FROM sig GROUP BY source ORDER BY source
"""


ORACLES["orders_interorder_gap"] = """
    WITH g AS (
      SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) AS s,
             LAG(CAST(floor(epoch(o_orderdate)) AS BIGINT)) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS ps
      FROM orders)
    SELECT ((s - ps) // 86400) // 7 AS gap_week_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_gaps
    FROM g WHERE ps IS NOT NULL
    GROUP BY gap_week_bucket ORDER BY gap_week_bucket
"""


ORACLES["events_winsorized_stats"] = """
    WITH v AS (SELECT event_type,
                      CAST(ROUND(value * 100) AS BIGINT) AS vc
               FROM events),
    r AS (SELECT event_type, vc,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY vc) - 1 AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM v),
    cuts AS (SELECT event_type,
                    MAX(CASE WHEN rn = ((n - 1) * 5) // 100
                             THEN vc END) AS lo,
                    MAX(CASE WHEN rn = ((n - 1) * 95) // 100
                             THEN vc END) AS hi
             FROM r GROUP BY event_type)
    SELECT v.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           c.lo AS lo_c, c.hi AS hi_c,
           CAST(SUM(CASE WHEN vc < c.lo THEN c.lo
                         WHEN vc > c.hi THEN c.hi
                         ELSE vc END) AS BIGINT) AS wsum_c,
           CAST(SUM(CASE WHEN vc < c.lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clip_lo,
           CAST(SUM(CASE WHEN vc > c.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clip_hi
    FROM v JOIN cuts c USING (event_type)
    GROUP BY v.event_type, c.lo, c.hi
    ORDER BY v.event_type
"""


ORACLES["docs_distinct_ngram_ratio"] = r"""
    WITH t AS (SELECT source, regexp_extract_all(text, '\S+') AS toks
               FROM documents),
    bi AS (SELECT source, toks[i] AS a, toks[i+1] AS b
           FROM (SELECT source, toks,
                        unnest(generate_series(1, len(toks) - 1)) AS i
                 FROM t WHERE len(toks) > 1)),
    d AS (SELECT source, a, b, CAST(COUNT(*) AS BIGINT) AS c
          FROM bi GROUP BY source, a, b)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS distinct_bigrams,
           CAST(SUM(c) AS BIGINT) AS total_bigrams,
           (CAST(COUNT(*) AS BIGINT) * 1000)
             // CAST(SUM(c) AS BIGINT) AS ttr_milli
    FROM d GROUP BY source ORDER BY source
"""


ORACLES["docs_readability"] = """
    WITH sig AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
                  AS BIGINT) AS n_words,
             GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
                           AS BIGINT), 1) AS n_sentences,
             CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                  AS BIGINT) AS n_syllables
      FROM documents)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           206835 - (1015 * n_words) // n_sentences
                  - (84600 * n_syllables) // n_words AS flesch_milli
    FROM sig WHERE n_words > 0 ORDER BY doc_id
"""


ORACLES["events_user_rfm"] = """
    WITH pu AS (
      SELECT user_id,
             MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS last_s,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS spend_c
      FROM events GROUP BY user_id),
    r AS (
      SELECT user_id,
             ((SELECT MAX(last_s) FROM pu) - last_s) // 86400
               AS recency_days,
             freq, spend_c
      FROM pu),
    t AS (
      SELECT NTILE(4) OVER (ORDER BY recency_days, user_id) AS r_q,
             NTILE(4) OVER (ORDER BY freq, user_id)         AS f_q,
             NTILE(4) OVER (ORDER BY spend_c, user_id)      AS m_q
      FROM r)
    SELECT r_q, f_q, m_q, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM t GROUP BY r_q, f_q, m_q ORDER BY r_q, f_q, m_q
"""


ORACLES["q10_returned_items"] = """
    SELECT c_custkey, c_name,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             / 10000.0 AS revenue,
           n_name, c_acctbal
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= DATE '1995-10-01'
      AND o_orderdate <  DATE '1996-01-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey LIMIT 20
"""


ORACLES["events_type_cooccurrence"] = """
    WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM d a JOIN d b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    ORDER BY type_a, type_b
"""


# The bigram-LM oracle reuses the established toks[i]/toks[i+1]
# bigram CTE (docs_bigram_novelty) and mirrors the engine's smoothing
# tree term for term: head counts and the continuation vocabulary V
# both derive from the one corpus bigram table, the per-pair weight is
# ln((cb+1)/(ca+V)) in doubles, and the per-doc mean is ROUNDed to 3dp
# (the docs_unigram_ce float surface). Docs with < 2 tokens emit no
# row on either side.
ORACLES["docs_bigram_lm_ppl"] = r"""
    WITH t AS (SELECT doc_id,
                      regexp_extract_all(text, '\S+') AS toks
               FROM documents),
    bi AS (SELECT doc_id, toks[i] AS a, toks[i+1] AS b
           FROM (SELECT doc_id, toks,
                        unnest(generate_series(1, len(toks) - 1)) AS i
                 FROM t WHERE len(toks) > 1)),
    db AS (SELECT doc_id, a, b, CAST(COUNT(*) AS BIGINT) AS k
           FROM bi GROUP BY doc_id, a, b),
    cb AS (SELECT a, b, CAST(SUM(k) AS BIGINT) AS cb
           FROM db GROUP BY a, b),
    ca AS (SELECT a, CAST(SUM(cb) AS BIGINT) AS ca FROM cb GROUP BY a),
    v AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS v FROM cb),
    perdoc AS (SELECT db.doc_id,
                      CAST(SUM(db.k) AS BIGINT) AS m,
                      ROUND(-SUM(CAST(db.k AS DOUBLE)
                                 * ln(CAST(cb.cb + 1 AS DOUBLE)
                                      / CAST(ca.ca + v.v AS DOUBLE)))
                            / CAST(SUM(db.k) AS DOUBLE), 3) AS nll
               FROM db
               JOIN cb USING (a, b) JOIN ca USING (a) CROSS JOIN v
               GROUP BY db.doc_id)
    SELECT doc_id, m, nll FROM perdoc ORDER BY doc_id
"""

# docs_line_dedup: the CASE tree mirrors line_dedup_inject_batch
# branch for branch (%19 total override LAST in the engine == the
# FIRST CASE branch here — CASE precedence is the override). Winner
# election is ROW_NUMBER over (doc_id, idx) per line; empty lines are
# always kept on both sides; string_agg skips the NULLed dropped
# lines and COALESCE('') covers docs that lose every line.
ORACLES["docs_line_dedup"] = r"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 19 = 0
                  THEN 'subscribe to our newsletter for updates today'
                  ELSE (CASE WHEN doc_id % 7 = 0
                             THEN regexp_replace(text,
                                  '((?:[^ ]+ ){5}[^ ]+) ',
                                  '\1.' || chr(10), 'g')
                             ELSE text END)
                    || CASE WHEN doc_id % 2 = 0 OR doc_id % 5 = 0
                            THEN chr(10) ||
                                 'subscribe to our newsletter for updates today'
                            ELSE '' END
                    || CASE WHEN doc_id % 3 = 0
                            THEN chr(10) ||
                                 'all rights reserved by the site owner'
                            ELSE '' END
             END AS text
      FROM documents),
    lines AS (
      SELECT doc_id,
             unnest(string_split(text, chr(10))) AS line,
             generate_subscripts(string_split(text, chr(10)), 1)
               AS idx
      FROM aug),
    flagged AS (
      SELECT doc_id, idx, line,
             (line = '' OR ROW_NUMBER() OVER (
                 PARTITION BY line ORDER BY doc_id, idx) = 1) AS keep
      FROM lines)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10)
                               ORDER BY idx), '') AS text
    FROM flagged GROUP BY doc_id ORDER BY doc_id
"""

# events_user_cms_topk: both sides derive the sketch from the SAME
# md5_number_upper("r:user") % width buckets over per-user exact
# counts (summing a user's occurrences before or after bucketing is
# the same integer), so est_n is reproducible to the bit; the LIMIT
# boundary orders by (n DESC, user_id), identical on both sides.
ORACLES["events_user_cms_topk"] = r"""
    WITH cnt AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
                 FROM events GROUP BY user_id),
    rows_ AS (SELECT unnest(range(4)) AS r),
    sk AS (SELECT r,
                  CAST(md5_number_upper(CAST(r AS VARCHAR) || ':'
                       || CAST(user_id AS VARCHAR)) % 1024 AS BIGINT)
                    AS bucket,
                  CAST(SUM(n) AS BIGINT) AS c
           FROM cnt CROSS JOIN rows_ GROUP BY r, bucket),
    top AS (SELECT user_id, n FROM cnt
            ORDER BY n DESC, user_id LIMIT 20),
    est AS (SELECT t.user_id, t.n,
                   CAST(MIN(sk.c) AS BIGINT) AS est
            FROM top t CROSS JOIN rows_ rr
            JOIN sk ON sk.r = rr.r
                   AND sk.bucket = CAST(md5_number_upper(
                         CAST(rr.r AS VARCHAR) || ':'
                         || CAST(t.user_id AS VARCHAR)) % 1024
                       AS BIGINT)
            GROUP BY t.user_id, t.n)
    SELECT user_id, n AS exact_n, est AS est_n,
           CAST(est >= n AS BIGINT) AS overcount_ok
    FROM est ORDER BY user_id
"""

# docs_ccnet_buckets: the per-language bigram-LM nll (the
# docs_bigram_lm_ppl expression with lang joined into every LM
# statistic) plus NTILE(3) within lang ordered by the ROUNDED nll —
# both sides rank the same 3dp value with doc_id tiebreak, so the
# tercile assignment is deterministic and identical.
ORACLES["docs_ccnet_buckets"] = r"""
    WITH t AS (SELECT doc_id, lang,
                      regexp_extract_all(text, '\S+') AS toks
               FROM documents),
    bi AS (SELECT doc_id, lang, toks[i] AS a, toks[i+1] AS b
           FROM (SELECT doc_id, lang, toks,
                        unnest(generate_series(1, len(toks) - 1)) AS i
                 FROM t WHERE len(toks) > 1)),
    db AS (SELECT doc_id, lang, a, b, CAST(COUNT(*) AS BIGINT) AS k
           FROM bi GROUP BY doc_id, lang, a, b),
    cb AS (SELECT lang, a, b, CAST(SUM(k) AS BIGINT) AS cb
           FROM db GROUP BY lang, a, b),
    ca AS (SELECT lang, a, CAST(SUM(cb) AS BIGINT) AS ca
           FROM cb GROUP BY lang, a),
    v AS (SELECT lang, CAST(COUNT(DISTINCT b) AS BIGINT) AS v
          FROM cb GROUP BY lang),
    perdoc AS (SELECT db.doc_id, db.lang,
                      CAST(SUM(db.k) AS BIGINT) AS m,
                      ROUND(-SUM(CAST(db.k AS DOUBLE)
                                 * ln(CAST(cb.cb + 1 AS DOUBLE)
                                      / CAST(ca.ca + v.v AS DOUBLE)))
                            / CAST(SUM(db.k) AS DOUBLE), 3) AS nll
               FROM db
               JOIN cb USING (lang, a, b) JOIN ca USING (lang, a)
               JOIN v USING (lang)
               GROUP BY db.doc_id, db.lang)
    SELECT doc_id, lang, m, nll,
           CAST(NTILE(3) OVER (PARTITION BY lang
                               ORDER BY nll, doc_id) AS BIGINT)
             AS bucket
    FROM perdoc ORDER BY doc_id
"""

# docs_quality_percentile: per-language ROW_NUMBER over the raw
# alpha-ratio double (bit-identical on both sides), with the
# percentile emitted as INTEGER milli-percentile via '//' so no
# float ROUND is ever hash-compared.
ORACLES["docs_quality_percentile"] = r"""
    WITH s AS (SELECT doc_id, lang,
                      CASE WHEN length(text) > 0
                           THEN len(regexp_extract_all(text, '[A-Za-z]'))
                                * 1.0 / length(text)
                           ELSE 0 END AS alpha_ratio
               FROM documents),
    r AS (SELECT doc_id, lang, alpha_ratio,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY alpha_ratio, doc_id) - 1
                   AS rnk,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM s)
    SELECT doc_id, lang, alpha_ratio, CAST(rnk AS BIGINT) AS rnk,
           CAST(CASE WHEN n > 1 THEN (rnk * 1000) // (n - 1)
                     ELSE 0 END AS BIGINT) AS pct_milli
    FROM r ORDER BY doc_id
"""

# docs_inverted_index: exact df over distinct (doc, token) pairs;
# postings = k smallest doc ids, list-sliced then string-joined so
# the hash-compared surface is a plain VARCHAR on both sides. The
# \S+ tokenization is the RE2 split shared with every token oracle.
ORACLES["docs_inverted_index"] = r"""
    WITH raw AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
      FROM documents),
    tf AS (SELECT DISTINCT doc_id, token FROM raw),
    g AS (SELECT token, COUNT(*) AS df,
                 list_sort(list(doc_id)) AS ids
          FROM tf GROUP BY token)
    SELECT token, CAST(df AS BIGINT) AS df,
           array_to_string(list_transform(ids[1:8],
                                          x -> CAST(x AS VARCHAR)),
                           ',') AS postings
    FROM g WHERE df >= 5 ORDER BY token
"""

# docs_blocklist_filter: the C4 bad-words page gate; injection CASE
# mirrors blocklist_inject_batch branch for branch, and the boundary
# regex is byte-identical to the engine's Arrow RE2 pattern.
ORACLES["docs_blocklist_filter"] = r"""
    WITH inj AS (
      SELECT source,
             text || CASE doc_id % 9
               WHEN 0 THEN ' GrObNik speaking'
               WHEN 3 THEN ' pure zxqvut!'
               WHEN 6 THEN ' xfrobscottley run'
               ELSE '' END AS t
      FROM documents),
    f AS (SELECT source, t,
                 CAST(regexp_matches(t,
                   '(?i)(^|[^a-z0-9])(grobnik|zxqvut|frobscottle)([^a-z0-9]|$)')
                   AS BIGINT) AS blocked
          FROM inj)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(blocked) AS BIGINT) AS n_blocked,
           CAST(SUM(CASE WHEN blocked = 0 THEN length(t) ELSE 0 END)
                AS BIGINT) AS kept_chars,
           CAST(COUNT(*) - SUM(blocked) AS BIGINT) AS kept_docs
    FROM f GROUP BY source ORDER BY source
"""

# q4/q12/q14 shapes: the date windows are shifted into the synthetic
# corpus's 1995-2001 span; qualifying predicates substitute existing
# columns for the ones the synthetic lineitem lacks (returnflag for
# commit/receipt dates, orderstatus for shipmode) — the SHAPES
# (EXISTS semi join, preagg-before-join conditional rollup, promo
# revenue ratio) are the point. Integer arithmetic mirrored exactly.
ORACLES["q4_priority_semi_join"] = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-07-01'
      AND o_orderdate <  DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLES["q12_status_line_priority"] = """
    WITH f AS (
      SELECT l_orderkey, COUNT(*) AS nlines FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01'
        AND l_shipdate <  DATE '1998-01-01'
      GROUP BY l_orderkey)
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN nlines ELSE 0 END) AS BIGINT) AS high_lines,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN
                         ('1-URGENT', '2-HIGH')
                         THEN nlines ELSE 0 END) AS BIGINT) AS low_lines
    FROM orders JOIN f ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

ORACLES["q14_promo_share"] = """
    WITH f AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_e4,
             p_type
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= DATE '1996-06-01'
        AND l_shipdate <  DATE '1996-07-01'),
    t AS (SELECT COALESCE(SUM(CASE WHEN p_type = 'PROMO'
                               THEN rev_e4 ELSE 0 END), 0) AS promo_e4,
                 COALESCE(SUM(rev_e4), 0) AS total_e4 FROM f)
    SELECT CAST(promo_e4 AS BIGINT) AS promo_e4,
           CAST(total_e4 AS BIGINT) AS total_e4,
           CAST(CASE WHEN total_e4 > 0
                     THEN promo_e4 * 1000 // total_e4
                     ELSE 0 END AS BIGINT) AS share_milli
    FROM t
"""
