"""Driver-harness mirror: every QUERIES entry runs; the SQL-expressible
subset must match DuckDB on the same parquet (values compared
order-insensitively, like the driver)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_parser_ray.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return (df.sort_values(list(df.columns), kind="mergesort")
            .reset_index(drop=True))


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_sql_oracle_match(ray_session, con, name):
    got = QUERIES[name](SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.sql(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {got.columns} vs {want.columns}")
    g, w = _canon(got), _canon(want)
    assert len(g) == len(w), f"{name}: {len(g)} rows vs oracle {len(w)}"
    pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-6)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(ray_session, name):
    out = QUERIES[name](SF_DIR)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert out is not None
    assert len(out.columns) > 0
    # deterministic: running twice gives identical frames
    if name in ("docs_lang_id", "multimodal_decode", "embeddings_knn_lsh"):
        out2 = QUERIES[name](SF_DIR)
        if not isinstance(out2, pd.DataFrame):
            out2 = out2.to_pandas()
        pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                      out2.reset_index(drop=True))


def test_driver_entry_contract(ray_session):
    """Mirror the driver's smoke check: entry() runs under an
    externally owned Ray session (must not call ray.init itself),
    returns >0 rows with a schema, and every oracle key has a query."""
    import __ray_entry__ as e
    res = e.entry()
    assert res.count() > 0
    assert res.schema() is not None
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())


def test_readme_registry_counts_in_sync():
    """README's registry counts are asserted against the live registry
    so the doc can't drift (r3 VERDICT item 5)."""
    import re
    text = open("README.md").read()
    for pat in (r"(\d+) driver-harness queries; (\d+) with DuckDB",
                r"Query registry index \((\d+) pipelines; (\d+) DuckDB-oracled\)"):
        m = re.search(pat, text)
        assert m, f"README registry count line missing: {pat}"
        assert int(m.group(1)) == len(QUERIES), (pat, m.group(1))
        assert int(m.group(2)) == len(ORACLES), (pat, m.group(2))


def test_driver_window_is_all_oracled():
    """The correctness driver samples the FIRST 50 registry entries;
    a future append must not silently push an oracled query out of
    the window or a rows-only query into it (r4 VERDICT item 8).
    Also pins that the rotation actually promoted the 36 queries
    rounds 1-4 never sampled (r4 VERDICT item 1)."""
    order = list(QUERIES)
    window = order[:50]
    not_oracled = [q for q in window if q not in ORACLES]
    assert not not_oracled, (
        f"driver window contains non-oracled queries: {not_oracled}")
    for q in ("docs_gopher_rules", "docs_c4_filters",
              "docs_jaccard_pairs", "docs_curation_funnel",
              "docs_vocab_overlap", "embeddings_semantic_pairs",
              "embeddings_semantic_pairs_kmeans",
              "embeddings_semantic_dedup", "tpch_fk_audit",
              "orders_customer_bucketed_join"):
        assert q in window, f"{q} fell out of the driver window"
    for q in ("embeddings_kmeans", "embeddings_ann_recall"):
        assert q not in window, f"rows-only {q} re-entered the window"


def test_pii_scrub_kernel_semantics():
    """Constructed-string check of the scrub kernel itself (the corpus
    path is covered by the SQL oracle): counts are pre-replacement,
    both patterns replace globally, non-matching text is untouched."""
    import pyarrow as pa

    from pdf_parser_ray.stages.text_analysis import (pii_inject_batch,
                                                     pii_scrub_batch)
    t = pa.table({
        "doc_id": [1, 2, 3],
        "source": ["s", "s", "s"],
        "text": ["a@b.io and c.d+e@f-g.org together",
                 "call 555-123-4567 or 555-000-9999; not 1555-123-4567x",
                 "no pii here"],
    })
    out = pii_scrub_batch(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "emails"] == 2 and out.loc[1, "phones"] == 0
    assert out.loc[1, "clean_text"] == "<EMAIL> and <EMAIL> together"
    # \b boundaries: digits adjacent to the 555 pattern block the match
    assert out.loc[2, "phones"] == 2
    assert out.loc[2, "clean_text"] == \
        "call <PHONE> or <PHONE>; not 1555-123-4567x"
    assert out.loc[3, "clean_text"] == "no pii here"
    assert out.loc[3, "emails"] == 0 and out.loc[3, "phones"] == 0
    # injection fixture: %7 docs get an email, %11 docs a phone
    inj = pii_inject_batch(pa.table({
        "doc_id": [7, 11, 77, 5], "source": ["s"] * 4,
        "text": ["x", "y", "z", "w"]})).column("text").to_pylist()
    assert inj[0] == "x contact user7@example.com"
    assert inj[1].startswith("y call 555-")
    assert "@" in inj[2] and "555-" in inj[2]
    assert inj[3] == "w"


def test_curation_pipeline_semantics(ray_session):
    """Constructed-corpus check of pipelines.curation.curate_corpus:
    each funnel stage fires on a row built to exercise exactly it, and
    the kept Dataset agrees with the report's n_kept."""
    import ray.data as rd

    from pdf_parser_ray.pipelines.curation import curate_corpus

    # 12 distinct words -> 10 distinct word-3 shingles; alpha ratio
    # ~0.85 (>= the 0.82 gate); the near-dup copy appends one clause
    # (adds ~3 shingles -> J ~ 10/13 >= 0.6) plus an email
    good = ("the quick brown fox jumps over lazy dogs near "
            "riverbank today quietly")
    bad = "1 2 3 4 5 6 7 8 9 0 " * 8             # digit-heavy: gated out
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "source": ["s1", "s1", "s1", "s2", "s2"],
        "text": [good,
                 good,                            # exact dup of 1
                 good + " pingworthy x@y.io okay",  # near-dup + email
                 bad,                             # gated out
                 "completely different vocabulary entirely unrelated "
                 "sentences about nothing shared with other documents"],
    })
    out = curate_corpus(rd.from_pandas(rows))
    rep = out["report"].set_index("source")
    assert rep.loc["s1", "n_in"] == 3 and rep.loc["s2", "n_in"] == 2
    assert rep.loc["s1", "emails"] == 1
    assert rep.loc["s2", "n_gate"] == 1           # bad doc gated out
    assert rep.loc["s1", "n_exact"] == 2          # doc 2 exact-dropped
    assert rep.loc["s1", "n_kept"] == 1           # doc 3 near-dup-dropped
    assert rep.loc["s2", "n_kept"] == 1
    kept = out["kept"].to_pandas()
    assert sorted(kept["doc_id"]) == [1, 5]
    assert int(rep["n_kept"].sum()) == len(kept)
    # scrub really rewrote the kept text's PII-free form upstream:
    # doc 3 (dropped) carried the email; doc 1 survives unmodified
    assert kept.set_index("doc_id").loc[1, "clean_text"] == good
    # pathological corpus: EVERYTHING gated out -> empty downstream
    # stages must yield a zeros report, not a KeyError on the join
    allbad = curate_corpus(rd.from_pandas(pd.DataFrame({
        "doc_id": [9], "source": ["sx"], "text": ["1 2 3 4 5 6"]})))
    rep2 = allbad["report"]
    assert rep2.loc[0, "n_in"] == 1 and rep2.loc[0, "n_gate"] == 0
    assert rep2.loc[0, "n_kept"] == 0 and allbad["kept"].count() == 0


def test_curation_empty_corpus_typed_report(ray_session):
    """A fully EMPTY input corpus must yield the typed empty report
    (every per-source aggregate — including r_in, the first one —
    collapses to a column-less frame on empty data; each must be
    re-shaped before the report merge, not KeyError on 'source')."""
    import ray.data as rd

    from pdf_parser_ray.pipelines.curation import curate_corpus

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "source": pd.Series([], dtype=object),
                          "text": pd.Series([], dtype=object)})
    out = curate_corpus(rd.from_pandas(empty))
    rep = out["report"]
    assert list(rep.columns) == ["source", "n_in", "emails", "phones",
                                 "n_gate", "n_exact", "n_kept",
                                 "tokens_kept"]
    assert len(rep) == 0
    assert out["kept"].count() == 0


def test_curation_funnel_oracle_gated_out_source(ray_session, tmp_path):
    """Engine/oracle parity on the edge the sweep corpus never hits: a
    source whose EVERY doc dies at the quality gate. The engine's
    report merge left-joins and zero-fills; the SQL oracle must do the
    same (LEFT JOIN + COALESCE) or the source row vanishes from the
    oracle side only."""
    docs = pd.DataFrame({
        "doc_id": [2, 3, 4, 5],
        "source": ["junk", "junk", "ok", "ok"],
        "text": ["1 2 3 4 5 6 7 8 9 0",          # alpha ratio 0 -> gated
                 "0 9 8 7 6 5 4 3 2 1",
                 "the quick brown fox jumps over lazy dogs near "
                 "riverbank today quietly",
                 "completely different vocabulary entirely unrelated "
                 "sentences about nothing shared with other documents"],
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)
    got = QUERIES["docs_curation_funnel"](str(sf))
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * "
          f"FROM '{sf}/documents.parquet'")
    want = c.sql(ORACLES["docs_curation_funnel"]).df()
    assert "junk" in set(want["source"]), \
        "oracle dropped the fully-gated-out source row"
    g, w = _canon(got), _canon(want)
    assert len(g) == len(w) == 2
    pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-6)
    junk = got.set_index("source").loc["junk"]
    assert junk["n_in"] == 2 and junk["n_gate"] == 0 \
        and junk["n_kept"] == 0 and junk["tokens_kept"] == 0


def test_new_reports_empty_corpus_typed(ray_session, tmp_path):
    """The corr / entropy / vocab-overlap / PSI reports over an empty
    corpus: typed empty frames (or a loud assert), never a KeyError
    from a column-less grouped_agg result."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.queries import QUERIES

    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64())}),
        str(tmp_path / "documents.parquet"))
    pq.write_table(pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
        "props": pa.array([], pa.string())}),
        str(tmp_path / "events.parquet"))

    vo = QUERIES["docs_vocab_overlap"](str(tmp_path))
    assert len(vo) == 0 and list(vo.columns) == [
        "source_a", "source_b", "n_a", "n_b", "n_common", "n_union",
        "jaccard"]
    assert str(vo["n_common"].dtype) == "int64"

    psi = QUERIES["events_value_drift_psi"](str(tmp_path))
    assert len(psi) == 0 and list(psi.columns) == [
        "event_type", "n_first", "n_second", "psi"]
    assert str(psi["psi"].dtype) == "float64"

    corr = QUERIES["events_value_hour_corr"](str(tmp_path))
    assert len(corr) == 0 and list(corr.columns) == [
        "event_type", "n_events", "corr_value_hour",
        "slope_cents_per_hour"]

    ent = QUERIES["docs_source_entropy"](str(tmp_path))
    assert len(ent) == 0 and list(ent.columns) == [
        "source", "n_tokens", "n_types", "entropy_bits",
        "type_token_ratio"]


def test_vocab_overlap_partition_invariance(ray_session, tmp_path):
    """The k x k co-occurrence matrix is a sum of per-batch bit-matrix
    products — the result must be identical however the per-token mask
    rows are batched. Construct a corpus with known overlaps, run at
    two very different partitionings, and check both against the
    hand-computed sets."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.queries import QUERIES

    docs = {
        "a": ["x y z", "x q"],          # vocab {x,y,z,q}
        "b": ["x y", "w"],              # vocab {x,y,w}
        "c": ["unique only here"],      # vocab {unique,only,here}
    }
    rows = [(i, t, "en", s, len(t))
            for i, (s, t) in enumerate(
                (s, t) for s, ts in docs.items() for t in ts)]
    for layout in ("single", "per_row"):
        d = tmp_path / f"p_{layout}"
        d.mkdir()
        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64())})
        if layout == "single":
            pq.write_table(tbl, str(d / "documents.parquet"))
        else:  # one row per file -> every batch boundary exercised
            (d / "documents.parquet").mkdir()
            for i in range(len(rows)):
                pq.write_table(
                    tbl.slice(i, 1),
                    str(d / "documents.parquet" / f"part_{i}.parquet"))
        out = QUERIES["docs_vocab_overlap"](str(d))
        got = {(r.source_a, r.source_b):
               (r.n_a, r.n_b, r.n_common, r.n_union)
               for r in out.itertuples()}
        assert got == {("a", "b"): (4, 3, 2, 5),
                       ("a", "c"): (4, 3, 0, 7),
                       ("b", "c"): (3, 3, 0, 6)}, got


def _write_docs(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())}),
        str(path / "documents.parquet"))


def _write_events(path, rows):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([dt.datetime(2024, 1, 1) + dt.timedelta(hours=r[1])
                        for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())}),
        str(path / "events.parquet"))


def _oracle_on(tmp, name):
    c = duckdb.connect()
    for t in ("documents", "events", "orders", "lineitem",
              "customer", "nation", "supplier", "part", "region",
              "embeddings"):
        p = tmp / f"{t}.parquet"
        if p.exists():
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c.sql(ORACLES[name]).df()


def test_vocab_overlap_tokenless_source_matches_oracle(ray_session,
                                                       tmp_path):
    """A source whose every doc tokenizes to nothing must be OMITTED
    from the pair list (the oracle's cnt CTE never sees it), not
    emitted with n=0 — and two such sources must not 0/0."""
    _write_docs(tmp_path, [(1, "x y z", "a"), (2, "x q", "a"),
                           (3, "x y", "b"),
                           (4, "   ", "c"), (5, "", "c"),
                           (6, " \t ", "d")])
    got = QUERIES["docs_vocab_overlap"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_vocab_overlap")
    assert list(got["source_a"]) == ["a"] and list(got["source_b"]) == ["b"]
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)


def test_drift_psi_negative_values_match_oracle(ray_session, tmp_path):
    """Negative values (refunds/deltas) must clamp into bin 0 on BOTH
    sides — floor-vs-truncate division and the unclamped fancy-index
    overwrite were three different answers before the clamp."""
    rows = [(i, i % 48, "t", v) for i, v in enumerate(
        [-1.0, -120.5, -0.01, 3.0, 499.99, 250.0, -75.25, 10.0] * 4)]
    _write_events(tmp_path, rows)
    got = QUERIES["events_value_drift_psi"](str(tmp_path))
    want = _oracle_on(tmp_path, "events_value_drift_psi")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    assert (got["n_first"] + got["n_second"]).sum() == len(rows)


def test_corr_degenerate_groups_match_oracle(ray_session, tmp_path):
    """Zero-variance groups (single event; constant hour; constant
    value) must yield NaN corr like the oracle's NULL, without
    crashing the report for the healthy types."""
    rows = ([(0, 5, "single", 3.5)] +                # n=1: vx=vy=0
            [(10 + i, 7, "const_hour", 1.0 + i) for i in range(5)] +
            [(20 + i, i, "const_value", 2.0) for i in range(5)] +
            [(30 + i, i, "healthy", 1.0 + 2.0 * i) for i in range(6)])
    _write_events(tmp_path, rows)
    got = QUERIES["events_value_hour_corr"](str(tmp_path))
    want = _oracle_on(tmp_path, "events_value_hour_corr")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    by = got.set_index("event_type")
    assert np.isnan(by.loc["single", "corr_value_hour"])
    assert np.isnan(by.loc["const_hour", "corr_value_hour"])
    assert np.isnan(by.loc["const_value", "corr_value_hour"])
    assert by.loc["const_value", "slope_cents_per_hour"] == 0.0
    assert abs(by.loc["healthy", "corr_value_hour"] - 1.0) < 1e-9


def test_corr_matches_numpy_corrcoef(ray_session, tmp_path):
    """The sufficient-statistics formula against numpy's independent
    two-pass implementation on seeded random data (many types, varied
    sizes): agreement at the 6-decimal output surface everywhere both
    are defined."""
    rng = np.random.default_rng(7)
    rows, eid = [], 0
    for t in range(8):
        for _ in range(int(rng.integers(2, 40))):
            rows.append((eid, int(rng.integers(0, 24)), f"ty{t}",
                         round(float(rng.uniform(0.01, 490.0)), 2)))
            eid += 1
    _write_events(tmp_path, rows)
    got = QUERIES["events_value_hour_corr"](str(tmp_path))
    df = pd.DataFrame(rows, columns=["eid", "hour", "ty", "value"])
    df["cents"] = np.rint(df["value"] * 100).astype("int64")
    for r in got.itertuples():
        sub = df[df["ty"] == r.event_type]
        x = sub["hour"].to_numpy(np.float64)
        y = sub["cents"].to_numpy(np.float64)
        if x.std() == 0 or y.std() == 0:
            assert np.isnan(r.corr_value_hour)
            continue
        # query surfaces are rounded to 6 decimals; compare there
        ref = float(np.corrcoef(x, y)[0, 1])
        assert abs(r.corr_value_hour - ref) < 1e-6, (r.event_type,
                                                     r.corr_value_hour,
                                                     ref)
        ref_slope = float(np.polyfit(x, y, 1)[0])
        assert abs(r.slope_cents_per_hour - ref_slope) < \
            1e-6 + 1e-9 * abs(ref_slope)


def test_rolling_wau_gap_days_match_oracle(ray_session, tmp_path):
    """Calendar gaps: the 7-day window is a DATE range, so a user
    active 8+ days before an observed day must NOT count even when
    fewer than 7 observed days intervene. The sf corpora are gap-free;
    this pins the searchsorted window against SQL BETWEEN on a corpus
    with gaps, plus hand-computed expectations."""
    rows = [
        (0, 0, "t", 1.0),     # day 0: users 1..2 (via below)
        (1, 0, "t", 1.0),
        (2, 24 * 2, "t", 1.0),      # day 2
        (3, 24 * 9, "t", 1.0),      # day 9 (gap: days 3-8 absent)
        (4, 24 * 10, "t", 1.0),     # day 10
    ]
    # rows: (event_id, hour offset, type, value); users assigned below
    users = [1, 2, 1, 1, 3]
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([dt.datetime(2024, 3, 1)
                        + dt.timedelta(hours=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())}),
        str(tmp_path / "events.parquet"))
    got = QUERIES["events_rolling_wau"](str(tmp_path))
    want = _oracle_on(tmp_path, "events_rolling_wau")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    by = got.set_index(got["day"].dt.day)   # days: Mar 1/3/10/11
    # Mar 10's window (Mar 4-10) holds only Mar 10 itself: Mar 3 is
    # 7 days back and must NOT count despite being the previous
    # OBSERVED day — the window is a date range, not a row count
    assert by.loc[1, "wau"] == 2 and by.loc[1, "dau"] == 2
    assert by.loc[3, "wau"] == 2 and by.loc[3, "dau"] == 1  # Mar 1-3
    assert by.loc[10, "wau"] == 1 and by.loc[10, "dau"] == 1
    assert by.loc[11, "wau"] == 2 and by.loc[11, "dau"] == 1


def _write_docs_langs(path, rows):
    """rows: (doc_id, text, lang)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())}),
        str(path / "documents.parquet"))


def test_dsir_weights_edges_match_oracle(ray_session, tmp_path):
    """DSIR edge semantics pinned engine-vs-oracle on a constructed
    corpus: token-less docs emit NO row on either side; target-slice
    tokens raise the weight of docs sharing their buckets (the 'en'
    doc must outscore the disjoint-vocabulary 'zh' doc); and the
    `selected` gate equals (rounded logw > 0) in both engines. (On a
    corpus this small Laplace smoothing over 256 buckets pulls every
    weight slightly negative — only the ORDERING is asserted.)"""
    _write_docs_langs(tmp_path, [
        (1, "alpha beta alpha gamma", "en"),
        (2, "alpha beta", "de"),          # shares target vocabulary
        (3, "zeta eta theta iota", "zh"),  # disjoint vocabulary
        (4, "   ", "en"),                  # token-less: no row
        (5, "", "de"),                     # empty: no row
    ])
    got = QUERIES["docs_dsir_weights"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_dsir_weights")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    assert set(got["doc_id"]) == {1, 2, 3}
    by = got.set_index("doc_id")
    # docs 1/2 share the target LM's vocabulary; doc 3 never does
    assert by.loc[2, "logw"] > by.loc[3, "logw"]
    assert by.loc[1, "logw"] > by.loc[3, "logw"]
    assert (got["selected"] == (got["logw"] > 0).astype("int64")).all()


def test_dsir_weights_no_target_slice(ray_session, tmp_path):
    """With zero target-language docs the target LM is the uniform
    Laplace prior; the query must still run and match the oracle
    (no division blowup), with every doc scored by -ln of its raw-LM
    bucket mass relative to uniform."""
    _write_docs_langs(tmp_path, [
        (1, "alpha beta gamma", "de"),
        (2, "alpha alpha", "zh"),
    ])
    got = QUERIES["docs_dsir_weights"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_dsir_weights")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    assert len(got) == 2 and (got["selected"] == 0).all()


def test_bpe_pair_counts_hand_computed(ray_session, tmp_path):
    """BPE first-merge pair table pinned by hand AND engine-vs-oracle
    on a constructed corpus: 'ab' appears both as a word (count 2) and
    inside 'abc' (count 2) -> 4; in-word REPEATS count per occurrence
    ('aaa' has 'aa' twice per instance); single-char words and
    token-less docs contribute nothing; the unicode word slices by
    CODE POINTS identically in pandas .str.slice and DuckDB substring
    ('héllo' -> hé, él, ll, lo)."""
    _write_docs(tmp_path, [
        (1, "ab abc héllo héllo x", "s"),
        (2, "abc zz ab aaa", "s"),
        (3, "   ", "s"),
        (4, "", "s"),
    ])
    got = QUERIES["docs_bpe_pair_counts"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_bpe_pair_counts")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    by = got.set_index("pair")["cnt"]
    assert by["ab"] == 4          # word 'ab' x2 + inside 'abc' x2
    assert by["bc"] == 2
    assert by["aa"] == 2          # twice within one 'aaa'
    assert by["hé"] == 2 and by["él"] == 2
    assert "x" not in by.index    # single-char word: no pair


def test_bpe_pair_counts_empty_and_limit_tie(ray_session, tmp_path):
    """Empty corpus returns the typed empty frame; a LIMIT boundary
    tie resolves by pair text identically on both sides (>20 distinct
    pairs all with count 1)."""
    _write_docs(tmp_path, [])
    got = QUERIES["docs_bpe_pair_counts"](str(tmp_path))
    assert len(got) == 0 and list(got.columns) == ["pair", "cnt"]
    # 26 distinct pairs, every count 1 -> the kept 20 is the
    # lexicographically-first 20 on both engines
    words = [chr(97 + i) * 2 for i in range(26)]  # aa bb .. zz
    _write_docs(tmp_path, [(1, " ".join(words), "s")])
    got = QUERIES["docs_bpe_pair_counts"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_bpe_pair_counts")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    assert list(got["pair"]) == [w for w in sorted(words)][:20]


def test_bpe_encode_hand_computed(ray_session, tmp_path):
    """Tokenizer APPLY pinned by hand AND engine-vs-oracle: 'the'
    chains (t,h)->(th,e) into one symbol, 'thinging' encodes as
    [th, ing, ing] ((i,n) then (in,g)), unmerged chars stay singles,
    punctuation/whitespace never enters the word alphabet, and
    uppercase chars are out-of-table singles."""
    _write_docs(tmp_path, [
        (1, "the thinging The!", "s"),
        (2, "at-at to, zz", "s"),
        (3, "", "s"),
    ])
    got = QUERIES["docs_bpe_encode"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_bpe_encode")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    by = got.set_index("symbol")["n"]
    assert by["the"] == 1 and by["th"] == 1      # 'the'; 'th' in thinging
    assert by["ing"] == 2                        # both in 'thinging'
    assert by["at"] == 2 and by["to"] == 1       # at-at splits on '-'
    assert by["z"] == 2                          # no (z,z) merge
    assert by["T"] == 1 and by["h"] == 1         # 'The' -> T,h,e singles
    assert "!" not in by.index and "-" not in by.index


def test_bpe_encode_replace_semantics_adversarial(tmp_path):
    """The oracle's bracket-wrapped replace() chain IS one leftmost
    non-overlapping BPE merge pass — pinned against bpe_symbols on
    the self-pair cases where space-joined encodings break (the
    consumed-shared-separator pitfall): (a,a) on odd/even runs,
    (aa,aa) chaining, and cross-boundary lookalikes ('xa b' must not
    merge). Pure-kernel test: no Ray, DuckDB evaluates the same
    generated expression the oracle embeds."""
    import re as _re
    import duckdb
    from pdf_parser_ray.stages.text_analysis import bpe_symbols
    merges = [("a", "a"), ("aa", "aa"), ("x", "a"), ("t", "h"),
              ("th", "e")]
    expr = r"regexp_replace(?, '(.)', '[\1]', 'g')"
    for a, b in merges:
        expr = f"replace({expr}, '[{a}][{b}]', '[{a}{b}]')"
    con = duckdb.connect()
    for w in ["aaa", "aaaa", "aaaaa", "aaaaaaaa", "xaa", "axa",
              "ththe", "theh", "a", ""]:
        s = con.execute(f"SELECT {expr}", [w]).fetchone()[0]
        sql_syms = _re.findall(r"\[([^\]]*)\]", s)
        assert sql_syms == bpe_symbols(w, merges), (w, sql_syms)


def test_hapax_ratio_hand_computed(ray_session, tmp_path):
    """Vocabulary richness pinned by hand: source s1 corpus
    'a b a' + 'b c' has types {a:2, b:2, c:1} -> 5 tokens, 3 types,
    1 hapax -> 333 milli; a source whose only doc is whitespace
    contributes no row (no tokens, no types) on either side."""
    _write_docs(tmp_path, [
        (1, "a b a", "s1"),
        (2, "b c", "s1"),
        (3, "   ", "s2"),
    ])
    got = QUERIES["docs_hapax_ratio"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_hapax_ratio")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    assert list(got["source"]) == ["s1"]
    r = got.iloc[0]
    assert r["n_tokens"] == 5 and r["n_types"] == 3
    assert r["n_hapax"] == 1 and r["hapax_milli"] == 333
    _write_docs(tmp_path, [])
    got = QUERIES["docs_hapax_ratio"](str(tmp_path))
    assert len(got) == 0 and "hapax_milli" in got.columns


def test_charclass_profile_hand_computed(ray_session, tmp_path):
    """Per-source char classes pinned by hand, with a multi-byte
    check: 'ab1 é!' is 6 CODEPOINTS (2 alpha, 1 digit, 1 space,
    2 other — é and ! — on both engines: utf8_length and DuckDB
    length both count codepoints, and é is outside the ASCII
    classes); NBSP counts as 'other', not space (ASCII-explicit
    class)."""
    _write_docs(tmp_path, [
        (1, "ab1 é!", "s1"),
        (2, "x y", "s1"),
        (3, "", "s2"),
    ])
    got = QUERIES["docs_charclass_profile"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_charclass_profile")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    by = got.set_index("source")
    assert by.loc["s1", "n_chars"] == 9        # 6 + 3
    assert by.loc["s1", "ascii_alpha"] == 4    # a b x y
    assert by.loc["s1", "digits"] == 1
    assert by.loc["s1", "spaces"] == 1         # NBSP excluded
    assert by.loc["s1", "other"] == 3          # é ! NBSP
    assert by.loc["s2", "n_chars"] == 0


def test_interorder_gap_hand_computed(ray_session, tmp_path):
    """Repurchase-interval histogram pinned by hand: customer 1
    orders on days 0, 7, 7, 21 -> gaps 7/0/14 days -> week buckets
    1, 0, 2 (the same-day tie pairs a 0 gap under any tie-break);
    customer 2's single order contributes no gap; empty table yields
    the typed frame."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    def write(rows):
        pq.write_table(pa.table({
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderdate": pa.array(
                [dt.datetime(1995, 1, 1) + dt.timedelta(days=r[2])
                 for r in rows], pa.timestamp("us"))}),
            str(tmp_path / "orders.parquet"))

    write([(1, 1, 0), (2, 1, 7), (3, 1, 7), (4, 1, 21), (5, 2, 3)])
    got = QUERIES["orders_interorder_gap"](str(tmp_path))
    want = _oracle_on(tmp_path, "orders_interorder_gap")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    by = got.set_index("gap_week_bucket")["n_gaps"]
    assert dict(by) == {0: 1, 1: 1, 2: 1}
    write([])
    got = QUERIES["orders_interorder_gap"](str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["gap_week_bucket", "n_gaps"]


def test_winsorized_stats_hand_computed(ray_session, tmp_path):
    """p5/p95 winsorization pinned by hand on values 1..20 dollars:
    lower-quantile ranks (19*5)//100 = 0 and (19*95)//100 = 18 give
    cuts [1.00, 19.00]; only the 20.00 row clips (to 19.00), so the
    winsorized sum is (1+..+19+19) = 209.00 in cents. Engine vs the
    window-SQL oracle hash-exact; empty corpus yields the typed
    frame."""
    rows = [(i, i % 24, "t", float(i + 1)) for i in range(20)]
    _write_events(tmp_path, rows)
    got = QUERIES["events_winsorized_stats"](str(tmp_path))
    want = _oracle_on(tmp_path, "events_winsorized_stats")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    r = got.iloc[0]
    assert r["n_events"] == 20
    assert r["lo_c"] == 100 and r["hi_c"] == 1900
    assert r["wsum_c"] == 20900
    assert r["n_clip_lo"] == 0 and r["n_clip_hi"] == 1
    _write_events(tmp_path, [])
    got = QUERIES["events_winsorized_stats"](str(tmp_path))
    assert len(got) == 0 and "wsum_c" in got.columns


def test_distinct_ngram_ratio_hand_computed(ray_session, tmp_path):
    """distinct-2 diversity pinned by hand: source s1 'a b a b' has
    bigrams (a,b),(b,a),(a,b) -> 2 distinct / 3 total -> 666 milli;
    s2's repeated 'x x x' doc gives 1 distinct / 2 total -> 500;
    bigrams never cross doc seams (two one-token docs add nothing);
    empty corpus returns the typed empty frame."""
    _write_docs(tmp_path, [
        (1, "a b a b", "s1"),
        (2, "x x x", "s2"),
        (3, "solo", "s2"),
        (4, "lone", "s1"),
    ])
    got = QUERIES["docs_distinct_ngram_ratio"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_distinct_ngram_ratio")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    by = got.set_index("source")
    assert by.loc["s1", "distinct_bigrams"] == 2
    assert by.loc["s1", "total_bigrams"] == 3
    assert by.loc["s1", "ttr_milli"] == 666
    assert by.loc["s2", "distinct_bigrams"] == 1
    assert by.loc["s2", "total_bigrams"] == 2
    assert by.loc["s2", "ttr_milli"] == 500
    _write_docs(tmp_path, [])
    got = QUERIES["docs_distinct_ngram_ratio"](str(tmp_path))
    assert len(got) == 0 and "ttr_milli" in got.columns


def test_readability_hand_computed(ray_session, tmp_path):
    """Flesch milli-score pinned by hand: 'The cat sat. It ran!' has
    5 words, 2 sentence runs, 5 vowel groups -> 206835 - 5075//2 -
    423000//5 = 119698; a doc with no sentence punctuation clamps to
    1 sentence; a long vowel run collapses to ONE group ('ueuei');
    a zero-word doc ('123 !!!') emits no row on either side."""
    _write_docs(tmp_path, [
        (1, "The cat sat. It ran!", "s"),
        (2, "no punctuation here", "s"),
        (3, "queueing", "s"),
        (4, "123 !!!", "s"),
        (5, "", "s"),
    ])
    got = QUERIES["docs_readability"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_readability")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    by = got.set_index("doc_id")
    assert by.loc[1, "n_words"] == 5 and by.loc[1, "n_sentences"] == 2
    assert by.loc[1, "n_syllables"] == 5
    assert by.loc[1, "flesch_milli"] == 206835 - 5075 // 2 - 423000 // 5
    assert by.loc[2, "n_sentences"] == 1          # clamp
    assert by.loc[3, "n_syllables"] == 1          # one run: 'ueuei'
    assert 4 not in by.index and 5 not in by.index
    _write_docs(tmp_path, [])
    got = QUERIES["docs_readability"](str(tmp_path))
    assert len(got) == 0 and "flesch_milli" in got.columns


def _write_events_users(path, rows):
    """(event_id, hour, user_id, event_type, value) — the multi-user
    variant of _write_events (which pins user_id=1)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([dt.datetime(2024, 1, 1)
                        + dt.timedelta(hours=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())}),
        str(path / "events.parquet"))


def test_type_cooccurrence_hand_computed(ray_session, tmp_path):
    """'Users who did X also did Y': user 1 does {A,B,C} (B twice —
    distinct-per-user, so it still counts once), user 2 {A,B},
    user 3 {C}. Pairs: (A,B)=2, (A,C)=1, (B,C)=1; singleton C alone
    adds nothing. Engine vs SQL self-join oracle hash-exact."""
    rows = [(0, 0, 1, "A", 1.0), (1, 1, 1, "B", 1.0),
            (2, 2, 1, "B", 1.0), (3, 3, 1, "C", 1.0),
            (4, 0, 2, "A", 1.0), (5, 1, 2, "B", 1.0),
            (6, 0, 3, "C", 1.0)]
    _write_events_users(tmp_path, rows)
    got = QUERIES["events_type_cooccurrence"](str(tmp_path))
    want = _oracle_on(tmp_path, "events_type_cooccurrence")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    by = got.set_index(["type_a", "type_b"])["n_users"]
    assert by[("A", "B")] == 2 and by[("A", "C")] == 1 \
        and by[("B", "C")] == 1 and len(by) == 3
    _write_events_users(tmp_path, [])
    got = QUERIES["events_type_cooccurrence"](str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["type_a", "type_b", "n_users"]


def test_user_rfm_hand_computed(ray_session, tmp_path):
    """RFM quartiles on 5 users with hand-checkable metrics: NTILE(4)
    over 5 rows puts 2 rows in tile 1 (first n%k tiles get the extra
    row) — mirrored by the engine's bucket formula; recency floors
    (anchor - last)/86400 in integer seconds. Engine vs the SQL
    NTILE oracle hash-exact; segment counts sum to the user count."""
    rows = []
    eid = 0
    # user u has u events, last at hour 24*u, each value u dollars
    for u in range(1, 6):
        for i in range(u):
            rows.append((eid, 24 * u - i, u, "t", float(u)))
            eid += 1
    _write_events_users(tmp_path, rows)
    got = QUERIES["events_user_rfm"](str(tmp_path))
    want = _oracle_on(tmp_path, "events_user_rfm")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    assert got["n_users"].sum() == 5
    assert set(got.columns) == {"r_q", "f_q", "m_q", "n_users"}
    # user 5: most recent (r_q 1), most frequent + biggest spender
    # (f_q == m_q == 4, the top tile of an ascending NTILE)
    seg = got.set_index(["r_q", "f_q", "m_q"])["n_users"]
    assert seg[(1, 4, 4)] == 1
    _write_events_users(tmp_path, [])
    got = QUERIES["events_user_rfm"](str(tmp_path))
    assert len(got) == 0


def test_pagerank_hand_computed(ray_session, tmp_path):
    """PageRank over one user's chain A,B,A,B,C,A,D — edges A->B x2,
    B->A, B->C, C->A, A->D; D is DANGLING (its mass drops, the
    documented simplified variant). Engine vs the generated
    unrolled-CTE oracle hash-exact, AND the exact fixed-point integer
    recurrence replayed independently in the test for all 6
    iterations must reproduce the engine's ranks digit for digit."""
    rows = [(i, i, t, 1.0) for i, t in
            enumerate(["A", "B", "A", "B", "C", "A", "D"])]
    _write_events(tmp_path, rows)
    got = QUERIES["events_type_pagerank"](str(tmp_path))
    want = _oracle_on(tmp_path, "events_type_pagerank")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    S = 10 ** 9
    edges = [("A", "B", 2), ("B", "A", 1), ("B", "C", 1),
             ("C", "A", 1), ("A", "D", 1)]
    wout = {"A": 3, "B": 2, "C": 1}
    base = (15 * S) // (100 * 4)
    rk = {v: S // 4 for v in "ABCD"}
    for _ in range(6):
        inflow = {v: 0 for v in "ABCD"}
        for s, d, w in edges:
            inflow[d] += (rk[s] * w) // wout[s]
        rk = {v: base + (85 * inflow[v]) // 100 for v in "ABCD"}
    by = got.set_index("event_type")["rank_scaled"]
    assert dict(by) == rk
    assert by.sum() <= S                      # dangling mass drops
    assert by["B"] > by["D"]                  # A routes 2/3 vs 1/3


def test_q10_empty_quarter(ray_session, tmp_path):
    """No orders in the target quarter: the empty side flows through
    hash_join (SQL semantics) and topk (typed empty rebuild) into the
    guard's typed empty frame — this chain used to KeyError twice."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1], pa.int64()),
        "l_returnflag": pa.array(["R"], pa.string()),
        "l_extendedprice": pa.array([10.0], pa.float64()),
        "l_discount": pa.array([0.05], pa.float64())}),
        str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([7], pa.int64()),
        "o_orderdate": pa.array([dt.datetime(2001, 1, 1)],
                                pa.timestamp("us"))}),
        str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([7], pa.int64()),
        "c_name": pa.array(["c7"], pa.string()),
        "c_nationkey": pa.array([0], pa.int64()),
        "c_acctbal": pa.array([1.0], pa.float64())}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": pa.array(["N"], pa.string())}),
        str(tmp_path / "nation.parquet"))
    got = QUERIES["q10_returned_items"](str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["c_custkey", "c_name", "revenue",
                                 "n_name", "c_acctbal"]


def test_pagerank_literal_start_type(ray_session, tmp_path):
    """A corpus whose type vocabulary contains the LITERAL string
    '(start)' (the LAG sentinel) must still match the oracle: the
    node set comes from the transition DST side (which can never be
    the sentinel), so '(start)' stays a node on both sides, and its
    outgoing edges are dropped by the sentinel filter identically in
    the engine and the oracle's COALESCE CTE."""
    rows = [(0, 0, 1, "A", 1.0), (1, 1, 1, "(start)", 1.0),
            (2, 2, 1, "B", 1.0), (3, 0, 2, "(start)", 1.0)]
    _write_events_users(tmp_path, rows)
    got = QUERIES["events_type_pagerank"](str(tmp_path))
    want = _oracle_on(tmp_path, "events_type_pagerank")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    assert set(got["event_type"]) == {"A", "B", "(start)"}


def test_pagerank_degenerate_corpora(ray_session, tmp_path):
    """Single-event corpus: one node, no edges -> rank == the damping
    base floor(0.15 * SCALE / 1) on both sides. Empty corpus: typed
    empty frame."""
    _write_events(tmp_path, [(0, 0, "only", 1.0)])
    got = QUERIES["events_type_pagerank"](str(tmp_path))
    want = _oracle_on(tmp_path, "events_type_pagerank")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    assert got["rank_scaled"].tolist() == [150000000]
    _write_events(tmp_path, [])
    got = QUERIES["events_type_pagerank"](str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["event_type", "rank_scaled"]


def test_bigram_lm_ppl_hand_computed(ray_session, tmp_path):
    """Bigram-LM scoring pinned by hand AND engine-vs-oracle: corpus
    'a b a b' + 'a b' gives C(a,b)=3, C(b,a)=1, head counts a=3, b=1,
    continuation vocab V={a,b}=2, so lw(a,b)=ln(4/5), lw(b,a)=ln(2/3);
    doc nlls follow. Docs with < 2 tokens (single token, empty) emit
    NO row on either side."""
    import math
    _write_docs(tmp_path, [
        (1, "a b a b", "s"),
        (2, "a b", "s"),
        (3, "x", "s"),
        (4, "", "s"),
    ])
    got = QUERIES["docs_bigram_lm_ppl"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_bigram_lm_ppl")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    assert set(got["doc_id"]) == {1, 2}
    by = got.set_index("doc_id")
    assert by.loc[1, "m"] == 3 and by.loc[2, "m"] == 1
    nll1 = -(2 * math.log(4 / 5) + math.log(2 / 3)) / 3
    assert by.loc[1, "nll"] == round(nll1, 3)
    assert by.loc[2, "nll"] == round(-math.log(4 / 5), 3)


def test_bigram_lm_ppl_empty_and_framed_key(ray_session, tmp_path):
    """Empty corpus returns the typed empty frame. The framed (a,b)
    join key cannot collide: words embedding the old separator-style
    ambiguity ('x y'+'z' vs 'x'+'y z' cannot occur since tokens have
    no spaces, but 'ab'+'c' vs 'a'+'bc' CAN) stay distinct pairs."""
    _write_docs(tmp_path, [])
    got = QUERIES["docs_bigram_lm_ppl"](str(tmp_path))
    assert len(got) == 0 and list(got.columns) == ["doc_id", "m", "nll"]
    _write_docs(tmp_path, [
        (1, "ab c ab c", "s"),   # pair (ab, c)
        (2, "a bc a bc", "s"),   # pair (a, bc) — same concatenation
    ])
    got = QUERIES["docs_bigram_lm_ppl"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_bigram_lm_ppl")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    # if the key collided, the two docs would share pooled counts and
    # score identically with inflated cb; distinct pairs keep the
    # per-doc stats symmetric but the oracle equality above is the
    # real guard
    assert len(got) == 2


def test_bpe_pair_counts_replication_linearity(ray_session, tmp_path):
    """Pair counts are a LINEAR statistic: replicating every document
    16x under distinct doc_id ranges must multiply every pair count by
    exactly 16 and keep the top-20 membership/order identical — the
    partitioning-and-scale invariance check (replication also reshapes
    the block layout, so this doubles as a parallelism-invariance
    pin)."""
    base = [(i, t, "s") for i, t in enumerate(
        ["ab abc abc", "zz ab aaa", "héllo héllo x", "qr st qr"])]
    _write_docs(tmp_path, base)
    one = QUERIES["docs_bpe_pair_counts"](str(tmp_path))
    rep = [(i + 100 * j, t, s) for j in range(16) for (i, t, s) in base]
    _write_docs(tmp_path, rep)
    sixteen = QUERIES["docs_bpe_pair_counts"](str(tmp_path))
    assert list(one["pair"]) == list(sixteen["pair"])
    assert (sixteen["cnt"].to_numpy() ==
            16 * one["cnt"].to_numpy()).all()


def test_line_dedup_hand_fixture(ray_session, tmp_path):
    """Winner election, within-doc duplicates, empty-line retention,
    and whole-doc-dedup on a corpus computed by hand. Ids 1/11/13/23
    hit NO inject slice (not divisible by 2,3,5,7,19), so the fixture
    text passes through the injector verbatim."""
    _write_docs(tmp_path, [
        (1, "a b c\ndup line x\nunique one", "s"),
        (11, "dup line x\nzz\ndup line x", "s"),   # cross + within-doc
        (13, "\ndup line x", "s"),                  # empty line kept
        (23, "dup line x", "s"),                    # dedups away
    ])
    got = QUERIES["docs_line_dedup"](str(tmp_path))
    want = pd.DataFrame({
        "doc_id": [1, 11, 13, 23],
        "n_lines": [3, 3, 2, 1],
        "n_kept": [3, 1, 1, 0],
        "text": ["a b c\ndup line x\nunique one", "zz", "", ""]})
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    # and the SQL oracle agrees on the same corpus
    w = _oracle_on(tmp_path, "docs_line_dedup")
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        w.sort_values("doc_id").reset_index(drop=True)[sorted(w.columns)],
        check_dtype=False)


def test_cms_topk_empty_events(ray_session, tmp_path):
    """Zero events: the query returns the typed empty frame and the
    oracle returns zero rows — no KeyError on an empty sketch."""
    _write_events(tmp_path, [])
    got = QUERIES["events_user_cms_topk"](str(tmp_path))
    assert list(got.columns) == ["user_id", "exact_n", "est_n",
                                 "overcount_ok"]
    assert len(got) == 0
    assert len(_oracle_on(tmp_path, "events_user_cms_topk")) == 0


def test_line_dedup_salted_path_equals_broadcast(ray_session, tmp_path,
                                                 monkeypatch):
    """Forcing the dup-winner frame past the broadcast budget must
    flip line_dedup_ds to the salted co-partition path and produce a
    frame BIT-EQUAL to the broadcast path (including the sf-fixture
    injection slices)."""
    _write_docs(tmp_path, [
        (i, t, "s") for i, t in enumerate(
            ["dup line x\na b c", "dup line x\nq r s",
             "dup line x", "\nzz\n", "solo here"] * 8)])
    base = QUERIES["docs_line_dedup"](str(tmp_path))
    import pdf_parser_ray.relational as rel
    monkeypatch.setattr(rel, "_BROADCAST_JOIN_BYTES", 0)
    salted = QUERIES["docs_line_dedup"](str(tmp_path))
    pd.testing.assert_frame_equal(base, salted)
    w = _oracle_on(tmp_path, "docs_line_dedup")
    pd.testing.assert_frame_equal(
        salted[sorted(salted.columns)].reset_index(drop=True),
        w.sort_values("doc_id").reset_index(drop=True)[
            sorted(w.columns)],
        check_dtype=False)


def _write_docs_langs(path, rows):
    """(doc_id, text, lang) writer for per-language operators."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())}),
        str(path / "documents.parquet"))


def test_quality_percentile_power_of_two_and_ties(ray_session, tmp_path):
    """The exact hazard the integer surface exists for: a language
    with n=17 docs makes every percentile k/16 — exact binary
    fractions where numpy (half-even) and DuckDB (half-away) ROUND
    disagree, so only the '//' milli surface is safe. Plus: tied
    alpha_ratio broken by doc_id, a singleton language (pct 0 by
    convention), and an empty-text doc (ratio 0.0)."""
    rows = [(i, "ab" * i + "!" * (20 - i), "en") for i in range(17)]
    rows += [(100, "same same", "fr"), (101, "same same", "fr")]
    rows += [(200, "", "de")]
    _write_docs_langs(tmp_path, rows)
    got = QUERIES["docs_quality_percentile"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_quality_percentile")
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        want.sort_values("doc_id").reset_index(drop=True)[
            sorted(want.columns)],
        check_dtype=False)
    en = got[got["lang"] == "en"].sort_values("rnk")
    assert list(en["pct_milli"]) == [k * 1000 // 16 for k in range(17)]
    fr = got[got["lang"] == "fr"].sort_values("doc_id")
    assert list(fr["rnk"]) == [0, 1]          # tie broken by doc_id
    de = got[got["lang"] == "de"]
    assert list(de["pct_milli"]) == [0] and list(de["alpha_ratio"]) == [0.0]


def test_quality_classifier_trainer_matches_numpy_reference(ray_session):
    """Single-block train_logreg must be BIT-EQUAL to a plain numpy
    full-batch GD on the same features — the distributed trainer is
    the reference computation plus a deterministic partial combine,
    nothing else."""
    import ray.data as rd

    from pdf_parser_ray.stages.classifier import (
        _scores, confusion_counts, featurize_batch,
        quality_label_inject_batch, train_logreg)
    dim, iters, lr = 64, 8, 0.3
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "text": [f"w{i % 7} w{i % 11} common tok" for i in range(60)]})
    feats = featurize_batch(quality_label_inject_batch(docs), dim=dim)
    ds = rd.from_pandas(feats).repartition(1).materialize()
    w_ray, losses_ray = train_logreg(ds, dim=dim, iters=iters, lr=lr)

    lens = feats["idx"].map(len).to_numpy(np.int64)
    flat = np.concatenate([np.asarray(a, np.int64) for a in feats["idx"]])
    y = feats["y"].to_numpy(np.float64)
    cuts = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=cuts[1:])
    w = np.zeros(dim + 1, np.float64)
    losses = []
    for _ in range(iters):
        c = np.zeros(len(flat) + 1)
        np.cumsum(w[flat], out=c[1:])
        s = np.clip(c[cuts[1:]] - c[cuts[:-1]] + w[dim], -35.0, 35.0)
        p = 1.0 / (1.0 + np.exp(-s))
        r = p - y
        g = np.bincount(flat, weights=np.repeat(r, lens),
                        minlength=dim + 1)
        g[dim] = r.sum()
        losses.append(float((np.logaddexp(0.0, s) - y * s).sum())
                      / len(y))
        w = w - lr * (g / len(y))
    assert losses_ray == losses
    assert (w_ray == w).all()
    # and the margin kernel agrees on the trained weights
    _, _, s_chk = _scores(feats, w, dim)
    tp, fp, tn, fn = confusion_counts(ds, w_ray, dim=dim)
    assert tp + fp + tn + fn == len(y)
    assert tp == int(((s_chk > 0) & (y == 1)).sum())
    assert fn == int(((s_chk <= 0) & (y == 1)).sum())


def test_quality_classifier_confusion_partition_invariant(ray_session):
    """The trained decision (confusion matrix) must be identical
    under 1-block and 8-block layouts: per-doc margins are summed in
    the doc's own sorted index order, so partitioning cannot move a
    prediction across the threshold. Losses may differ in ulps
    (combine order), accuracy may not."""
    import ray.data as rd

    from pdf_parser_ray.stages.classifier import (
        confusion_counts, featurize_batch, quality_label_inject_batch,
        train_logreg)
    dim = 128
    docs = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "text": [f"alpha{i % 13} beta{i % 5} gamma" for i in range(200)]})
    feats = featurize_batch(quality_label_inject_batch(docs), dim=dim)
    one = rd.from_pandas(feats).repartition(1).materialize()
    eight = rd.from_pandas(feats).repartition(8).materialize()
    w1, l1 = train_logreg(one, dim=dim, iters=6, lr=0.3)
    w8, l8 = train_logreg(eight, dim=dim, iters=6, lr=0.3)
    assert np.allclose(w1, w8, rtol=0, atol=1e-12)
    assert np.allclose(l1, l8, rtol=0, atol=1e-12)
    assert confusion_counts(one, w1, dim=dim) == \
        confusion_counts(eight, w1, dim=dim)
    # cross-check: each model's confusion under the OTHER layout
    assert confusion_counts(eight, w8, dim=dim) == \
        confusion_counts(one, w8, dim=dim)


def test_quality_classifier_featurize_batch_boundary_invariant():
    """featurize_batch over one batch vs two halves must give every
    doc the same sorted bucket list (the hash is per-string, the
    unique+sort is per-doc — no batch-level state)."""
    from pdf_parser_ray.stages.classifier import featurize_batch
    docs = pd.DataFrame({
        "doc_id": np.arange(30, dtype=np.int64),
        "text": [f"t{i % 4} t{i % 4} u{i % 9} shared" for i in range(30)],
        "y": np.zeros(30, dtype=np.int64)})
    whole = featurize_batch(docs, dim=97, text_col="text")
    halves = pd.concat([featurize_batch(docs.iloc[:13], dim=97),
                        featurize_batch(docs.iloc[13:], dim=97)],
                       ignore_index=True)
    for a, b in zip(whole["idx"], halves["idx"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_inverted_index_capping_min_df_and_oracle(ray_session,
                                                  tmp_path):
    """Constructed corpus pinning every inverted-index rule: 'hot'
    lives in 12 docs (df counted in full, postings CAPPED to the 8
    smallest ids), 'warm' in exactly 5 (the df >= 5 boundary is
    inclusive), 'rare' in 4 (pruned), and every doc carries a unique
    salt token (always pruned). Engine frame must equal the DuckDB
    oracle and the explicit expectations."""
    rows = []
    for i in range(12):
        rows.append((100 + i, f"hot salt{i}", "s"))
    for i in range(5):
        rows.append((200 + i, f"warm wsalt{i}", "s"))
    for i in range(4):
        rows.append((300 + i, f"rare rsalt{i}", "s"))
    _write_docs(tmp_path, rows)
    got = QUERIES["docs_inverted_index"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_inverted_index")
    pd.testing.assert_frame_equal(_canon(got).reset_index(drop=True),
                                  _canon(want).reset_index(drop=True),
                                  check_dtype=False)
    by = dict(zip(got["token"], zip(got["df"], got["postings"])))
    assert set(by) == {"hot", "warm"}
    assert by["hot"] == (12, ",".join(str(100 + i) for i in range(8)))
    assert by["warm"] == (5, ",".join(str(200 + i) for i in range(5)))


def test_inverted_index_partials_merge_exactly():
    """The mergeability contract the distributed combine relies on:
    partials from two disjoint batch slices, merged (sum df_p, merge
    bottom-k), must equal the whole-batch partial — docs never split
    across batches, so no (doc, token) pair repeats."""
    import pyarrow as pa

    from pdf_parser_ray.stages.text_analysis import \
        index_postings_partial
    t = pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "text": pa.array([f"hot u{i}" if i % 2 == 0 else f"hot v{i}"
                          for i in range(20)], pa.string())})
    k = 8
    whole = index_postings_partial(t, k=k).to_pandas()
    parts = pd.concat([index_postings_partial(t.slice(0, 11), k=k)
                       .to_pandas(),
                       index_postings_partial(t.slice(11), k=k)
                       .to_pandas()], ignore_index=True)

    def final(df):
        cnt = df.groupby("token")["df_p"].sum()
        p = df[df["doc_id"] >= 0].sort_values(["token", "doc_id"])
        p = p[p.groupby("token").cumcount() < k]
        post = p.groupby("token")["doc_id"].agg(
            lambda s: ",".join(s.astype(str)))
        return pd.DataFrame({"df": cnt, "postings": post}).sort_index()

    pd.testing.assert_frame_equal(final(parts), final(whole))
    assert final(whole).loc["hot", "df"] == 20
    assert final(whole).loc["hot", "postings"] == \
        ",".join(str(i) for i in range(8))


def test_blocklist_boundary_case_and_oracle(ray_session, tmp_path):
    """The three fixture branches each pin one rule: doc 0 gets a
    mixed-case blockword (case fold), doc 3 a punctuation-bounded one
    (boundary class includes punctuation), doc 6 a blockword embedded
    inside a longer token (must NOT block). Doc 1's BASE text carries
    a natural sentence-initial blockword (gate applies to raw text
    too, '^' boundary). Engine report must equal the oracle and the
    hand-computed flags."""
    rows = [(0, "alpha beta", "a"),
            (1, "frobscottle is fizzy", "a"),
            (2, "plain text", "a"),
            (3, "more words", "b"),
            (6, "embedded case", "b"),
            (9, "GrObNik speaking arrives via injection too", "b")]
    _write_docs(tmp_path, rows)
    got = QUERIES["docs_blocklist_filter"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_blocklist_filter")
    pd.testing.assert_frame_equal(_canon(got).reset_index(drop=True),
                                  _canon(want).reset_index(drop=True),
                                  check_dtype=False)
    a = got[got["source"] == "a"].iloc[0]
    b = got[got["source"] == "b"].iloc[0]
    # source a: doc 0 (injected mixed case) + doc 1 (natural, at ^)
    # blocked; doc 2 kept.
    assert (a["n_docs"], a["n_blocked"], a["kept_docs"]) == (3, 2, 1)
    # source b: doc 3 (injected 'zxqvut!') and doc 9 (% 9 == 0 mixed
    # case) blocked; doc 6's embedded 'xfrobscottley' must survive.
    assert (b["n_docs"], b["n_blocked"], b["kept_docs"]) == (3, 2, 1)


def _write_tpch_min(path, lineitem_rows, orders_rows, part_rows):
    """Minimal (lineitem, orders, part) fixture in the sf schema.
    lineitem: (orderkey, partkey, shipdate, price, discount, rflag);
    orders: (orderkey, orderdate, priority, status);
    part: (partkey, p_type)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in lineitem_rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in lineitem_rows], pa.int64()),
        "l_suppkey": pa.array([1] * len(lineitem_rows), pa.int64()),
        "l_linenumber": pa.array(range(len(lineitem_rows)), pa.int32()),
        "l_quantity": pa.array([1.0] * len(lineitem_rows)),
        "l_extendedprice": pa.array([r[3] for r in lineitem_rows]),
        "l_discount": pa.array([r[4] for r in lineitem_rows]),
        "l_tax": pa.array([0.0] * len(lineitem_rows)),
        "l_returnflag": pa.array([r[5] for r in lineitem_rows]),
        "l_linestatus": pa.array(["O"] * len(lineitem_rows)),
        "l_shipdate": pa.array([pd.Timestamp(r[2]) for r in
                                lineitem_rows], pa.timestamp("us"))}),
        str(path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in orders_rows], pa.int64()),
        "o_custkey": pa.array([1] * len(orders_rows), pa.int64()),
        "o_orderstatus": pa.array([r[3] for r in orders_rows]),
        "o_totalprice": pa.array([1.0] * len(orders_rows)),
        "o_orderdate": pa.array([pd.Timestamp(r[1]) for r in
                                 orders_rows], pa.timestamp("us")),
        "o_orderpriority": pa.array([r[2] for r in orders_rows])}),
        str(path / "orders.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([r[0] for r in part_rows], pa.int64()),
        "p_name": pa.array(["p"] * len(part_rows)),
        "p_brand": pa.array(["b"] * len(part_rows)),
        "p_type": pa.array([r[1] for r in part_rows]),
        "p_size": pa.array([1] * len(part_rows), pa.int32()),
        "p_retailprice": pa.array([1.0] * len(part_rows))}),
        str(path / "part.parquet"))


def _tpch_oracle_on(tmp, name):
    c = duckdb.connect()
    for t in ("lineitem", "orders", "part"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{tmp / t}.parquet'")
    return c.sql(ORACLES[name]).df()


def test_q4_exists_semantics_and_q14_zero_guard(ray_session, tmp_path):
    """q4: an in-window order with only non-R lineitems must NOT
    count, one with R lines counts ONCE (EXISTS, not join fanout),
    and an out-of-window order with R lines is excluded. q14: the
    fixture window (1996-06) holds no lineitems at all, so both
    engine and oracle must emit the guarded all-zero row rather
    than divide by zero."""
    li = [(1, 10, "1996-07-15", 100.0, 0.05, "R"),
          (1, 10, "1996-07-16", 100.0, 0.05, "R"),   # same order, 2 R
          (2, 10, "1996-07-15", 100.0, 0.05, "N"),   # no R -> excluded
          (3, 10, "1996-01-15", 100.0, 0.05, "R")]   # window miss
    orders = [(1, "1996-08-01", "1-URGENT", "O"),
              (2, "1996-08-01", "1-URGENT", "O"),
              (3, "1996-01-20", "2-HIGH", "F")]
    part = [(10, "PROMO")]
    _write_tpch_min(tmp_path, li, orders, part)
    got = QUERIES["q4_priority_semi_join"](str(tmp_path))
    want = _tpch_oracle_on(tmp_path, "q4_priority_semi_join")
    pd.testing.assert_frame_equal(_canon(got).reset_index(drop=True),
                                  _canon(want).reset_index(drop=True),
                                  check_dtype=False)
    assert list(got["o_orderpriority"]) == ["1-URGENT"]
    assert list(got["order_count"]) == [1]

    got14 = QUERIES["q14_promo_share"](str(tmp_path))
    want14 = _tpch_oracle_on(tmp_path, "q14_promo_share")
    pd.testing.assert_frame_equal(_canon(got14).reset_index(drop=True),
                                  _canon(want14).reset_index(drop=True),
                                  check_dtype=False)
    assert got14.iloc[0].tolist() == [0, 0, 0]


def test_q12_preagg_split_matches_oracle(ray_session, tmp_path):
    """Three orders across two statuses; the 1997 window drops one
    line; high/low split follows priority membership exactly."""
    li = [(1, 10, "1997-03-01", 10.0, 0.0, "N"),
          (1, 10, "1997-03-02", 10.0, 0.0, "N"),
          (2, 10, "1997-05-01", 10.0, 0.0, "N"),
          (2, 10, "1996-12-31", 10.0, 0.0, "N"),   # window miss
          (3, 10, "1997-07-01", 10.0, 0.0, "N")]
    orders = [(1, "1997-01-01", "2-HIGH", "O"),
              (2, "1997-01-01", "5-LOW", "O"),
              (3, "1997-01-01", "3-MEDIUM", "F")]
    _write_tpch_min(tmp_path, li, orders, [(10, "PROMO")])
    got = QUERIES["q12_status_line_priority"](str(tmp_path))
    want = _tpch_oracle_on(tmp_path, "q12_status_line_priority")
    pd.testing.assert_frame_equal(_canon(got).reset_index(drop=True),
                                  _canon(want).reset_index(drop=True),
                                  check_dtype=False)
    by = got.set_index("o_orderstatus")
    assert (by.loc["O", "high_lines"], by.loc["O", "low_lines"]) == (2, 1)
    assert (by.loc["F", "high_lines"], by.loc["F", "low_lines"]) == (0, 1)


def _ref_bpe_trainer(word_counts, r):
    """Independent single-process BPE trainer: incremental vocabulary
    REWRITE after every merge (the Sennrich formulation), not the
    engine's rank-order replay — agreement is the equivalence proof."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    out = []
    for rank in range(1, r + 1):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pairs[k] = pairs.get(k, 0) + c
        if not pairs:
            break
        (a, b), n = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append({"rank": rank, "left": a, "right": b,
                    "merged": a + b, "n": n})
        new = {}
        for syms, c in vocab.items():
            i, ns = 0, []
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            new[tuple(ns)] = new.get(tuple(ns), 0) + c
        vocab = new
    return pd.DataFrame(out)


def test_bpe_train_matches_reference_trainer(ray_session, tmp_path):
    """Engine merge table == the independent incremental-rewrite
    trainer on a corpus engineered to hit the hard rules: 'aaaa' runs
    (overlapping pairs COUNT but merge non-overlapping left-to-right),
    count ties broken lexicographically, and merged symbols feeding
    later merges ('lo'+'w' after 'l'+'o')."""
    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3,
             "aaaa": 3, "aab": 2, "zz": 4, "yy": 4}
    docs = []
    i = 0
    for w, c in words.items():
        for _ in range(c):
            docs.append((i, w, "s"))
            i += 1
    _write_docs(tmp_path, docs)
    got = QUERIES["docs_bpe_train"](str(tmp_path))
    want = _ref_bpe_trainer(words, 10)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want[got.columns.tolist()].astype(got.dtypes.to_dict())
        .reset_index(drop=True))
    # the engineered facts themselves: 'aaaa'x3 contributes THREE
    # overlapping (a,a) index pairs per word (9) + 'aab'x2 = 11,
    # beating (e,s) = newest 6 + widest 3 = 9
    es = got.set_index("rank")
    assert (es.loc[1, "left"], es.loc[1, "right"], es.loc[1, "n"]) \
        == ("a", "a", 11)
    assert (es.loc[2, "left"], es.loc[2, "right"], es.loc[2, "n"]) \
        == ("e", "s", 9)


def test_bpe_train_partitioning_invariant(ray_session):
    import ray.data as rd

    from pdf_parser_ray.stages.text_analysis import train_bpe_merges
    vocab = pd.DataFrame({
        "token": ["alpha", "alps", "beta", "betake", "aaaa", "ba"],
        "c": pd.array([7, 3, 5, 2, 4, 9], dtype="int64")})
    a = train_bpe_merges(rd.from_pandas(vocab).repartition(1), 6)
    b = train_bpe_merges(rd.from_pandas(vocab).repartition(5), 6)
    pd.testing.assert_frame_equal(a, b)


def test_inverted_index_all_pruned_and_tpch_empty_windows(
        ray_session, tmp_path):
    """Guard pins: a corpus whose every token has df < 5 must yield
    the TYPED empty index frame (and agree with the oracle's empty
    result); q4/q12 with every row outside their date windows must
    yield typed empty rollups, not KeyError on the missing agg
    column."""
    _write_docs(tmp_path, [(i, f"only{i} tok{i % 2}", "s")
                           for i in range(4)])
    got = QUERIES["docs_inverted_index"](str(tmp_path))
    want = _oracle_on(tmp_path, "docs_inverted_index")
    assert len(got) == 0 and len(want) == 0
    assert list(got.columns) == ["token", "df", "postings"]

    li = [(1, 10, "1990-01-01", 10.0, 0.0, "R")]
    orders = [(1, "1990-01-02", "1-URGENT", "O")]
    _write_tpch_min(tmp_path, li, orders, [(10, "PROMO")])
    q4 = QUERIES["q4_priority_semi_join"](str(tmp_path))
    assert len(q4) == 0
    assert list(q4.columns) == ["o_orderpriority", "order_count"]
    q12 = QUERIES["q12_status_line_priority"](str(tmp_path))
    assert len(q12) == 0
    assert list(q12.columns) == ["o_orderstatus", "high_lines",
                                 "low_lines"]


def test_q14_dangling_partkey_matches_oracle(ray_session, tmp_path):
    """Inner-join semantics: an in-window lineitem whose partkey has
    NO part row must contribute to neither sum (the oracle's JOIN
    drops it); before the fix the engine counted it in total_e4."""
    li = [(1, 10, "1996-06-10", 100.0, 0.00, "N"),    # PROMO part
          (2, 11, "1996-06-11", 100.0, 0.00, "N"),    # non-promo part
          (3, 99, "1996-06-12", 500.0, 0.00, "N")]    # dangling FK
    orders = [(1, "1996-06-01", "1-URGENT", "O")]
    _write_tpch_min(tmp_path, li, orders,
                    [(10, "PROMO"), (11, "STANDARD")])
    got = QUERIES["q14_promo_share"](str(tmp_path))
    want = _tpch_oracle_on(tmp_path, "q14_promo_share")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    row = got.iloc[0]
    assert row["total_e4"] == 2 * 100 * 100 * 100  # doc 3 excluded
    assert row["promo_e4"] == 100 * 100 * 100
    assert row["share_milli"] == 500
