"""Composed curation pipeline: scrub -> quality gate -> exact dedup ->
near-dup dedup over a documents corpus, with a per-source funnel report.

The single-flow analog of running the registry's curation queries
back-to-back — the shape a 100-TB pretraining corpus actually runs:
each stage consumes the previous stage's (materialized, spillable)
Dataset, ids-only sets flow through the adaptive broadcast/shuffle
``_id_filter``, and the only driver-side frames are the per-source
aggregates (cardinality = number of sources).

Stage semantics are the registry's, so the whole funnel is
SQL-oracle-exact (queries.docs_curation_funnel):

- PII scrub: stages.text_analysis.pii_scrub_batch (Arrow RE2).
- Quality gate: alpha-ratio >= ``gate_alpha`` on the SCRUBBED text
  (scrub-before-gate is the production order — redacted spans must not
  influence quality scores; the '<EMAIL>'/'<PHONE>' tags are
  alpha-neutral where raw phone digits would sink the ratio).
- Exact dedup: min doc_id per md5(clean_text), bucketed combine.
- Near-dup: the exact inverted-index Jaccard join
  (stages.dedup.jaccard_pairs_exact_ds, df-capped); the drop rule is
  pairwise drop-the-larger-id (EXISTS in SQL) rather than connected
  components, so the oracle needs no recursive CTE.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def curate_corpus(ds, *, gate_alpha: float = 0.82,
                  neardup_threshold: float = 0.6, k: int = 3,
                  max_df: int = 256, text_col: str = "text"):
    """corpus Dataset(doc_id, ``text_col``, source) -> {"kept": Dataset,
    "report": per-source funnel DataFrame}.

    Report columns (all int64 except source): n_in, emails, phones,
    n_gate, n_exact, n_kept, tokens_kept.
    """
    from ..relational import bucketed_map_groups, grouped_agg
    from ..stages.dedup import _id_filter, jaccard_pairs_exact_ds
    from ..stages.text_analysis import pii_scrub_batch

    # ---- scrub (stage feeds the n_in/emails/phones report AND the
    # gate; pin it so the lazy upstream runs once per the repo-wide
    # multi-consumer rule)
    scrubbed = ds.map_batches(
        lambda t: pii_scrub_batch(t, text_col=text_col),
        batch_format="pyarrow").materialize()
    r_in = grouped_agg(scrubbed, ["source"],
                       {"n_in": ("count", None),
                        "emails": ("sum", "emails"),
                        "phones": ("sum", "phones")})

    # ---- quality gate on the scrubbed text (int/int true division is
    # correctly-rounded IEEE: identical to the oracle's alpha*1.0/len)
    def gate(b: pd.DataFrame) -> pd.DataFrame:
        t = b["clean_text"]
        n = t.str.len().to_numpy(dtype=np.int64)
        alpha = t.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
        ratio = np.where(n > 0, alpha / np.maximum(n, 1), 0.0)
        return b[ratio >= gate_alpha][["doc_id", "source", "clean_text"]]

    gated = scrubbed.map_batches(gate, batch_format="pandas").materialize()
    r_gate = grouped_agg(gated, ["source"], {"n_gate": ("count", None)})

    # ---- exact dedup: min id per content hash; the keep-id set stays
    # a Dataset through the adaptive semi join (broadcast under the
    # byte budget, co-partitioned shuffle past it)
    def md5_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(t.encode("utf-8")).hexdigest()
             for t in b["clean_text"]]
        df = pd.DataFrame({"h": h, "doc_id": b["doc_id"].values})
        return df.groupby("h", as_index=False)["doc_id"].min()

    keep_ids = bucketed_map_groups(
        gated.map_batches(md5_partial, batch_format="pandas"), ["h"],
        lambda g: g.groupby("h", as_index=False, sort=False)["doc_id"]
        .min()).map_batches(lambda b: b[["doc_id"]],
                            batch_format="pandas")
    exk = _id_filter(gated, keep_ids, "doc_id").materialize()
    r_ex = grouped_agg(exk, ["source"], {"n_exact": ("count", None)})

    # ---- near-dup: exact df-capped Jaccard join over the survivors;
    # drop the larger id of every qualifying pair
    pairs = jaccard_pairs_exact_ds(
        exk.map_batches(
            lambda b: pd.DataFrame({"doc_id": b["doc_id"].values,
                                    "text": b["clean_text"].values}),
            batch_format="pandas"),
        k=k, threshold=neardup_threshold, max_df=max_df)
    drop_ids = pairs.map_batches(
        lambda b: pd.DataFrame(
            {"doc_id": np.unique(b["id_b"].to_numpy(dtype=np.int64))}),
        batch_format="pandas")
    kept = _id_filter(exk, drop_ids, "doc_id", anti=True).materialize()

    def tok(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": b["source"].values,
            "n_tok": b["clean_text"].str.count(r"\S+")
            .to_numpy(dtype=np.int64)})

    r_fin = grouped_agg(kept.map_batches(tok, batch_format="pandas"),
                        ["source"], {"n_kept": ("count", None),
                                     "tokens_kept": ("sum", "n_tok")})

    # an empty stage (e.g. every doc gated out) aggregates to a frame
    # with NO columns — normalize to the typed empty shape so the
    # report join can't KeyError on a pathological corpus
    def _shape(df: pd.DataFrame, cols) -> pd.DataFrame:
        if "source" in df.columns:
            return df
        return pd.DataFrame({"source": pd.Series([], dtype=object),
                             **{c: pd.Series([], dtype="int64")
                                for c in cols}})

    r_in = _shape(r_in, ["n_in", "emails", "phones"])
    r_gate = _shape(r_gate, ["n_gate"])
    r_ex = _shape(r_ex, ["n_exact"])
    r_fin = _shape(r_fin, ["n_kept", "tokens_kept"])

    # per-source frames are cardinality-bounded (one row per source):
    # the driver-side merge is the report join, not a data join
    report = (r_in.merge(r_gate, on="source", how="left")
              .merge(r_ex, on="source", how="left")
              .merge(r_fin, on="source", how="left")
              .fillna(0)
              .astype({c: "int64" for c in
                       ("n_in", "emails", "phones", "n_gate",
                        "n_exact", "n_kept", "tokens_kept")})
              .sort_values("source").reset_index(drop=True))
    return {"kept": kept, "report": report}
