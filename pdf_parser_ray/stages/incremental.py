"""Incremental cross-wave near-duplicate dedup.

The production shape of web-crawl dedup: yesterday's corpus is already
deduped and INDEXED; today's ingest wave must drop near-duplicates of
(a) history and (b) itself, without recomputing history. The index is
a parquet directory of MinHash state per wave:

    index_dir/bands/wave=NNNNN/  (band:int32, band_hash:int64, doc_id)
    index_dir/sigs/wave=NNNNN/   (doc_id, sig: list<int64>[num_perm])

Only band rows and signatures persist — not texts or shingle sets —
so cross-wave verification scores SIGNATURE AGREEMENT (mean of equal
minhash lanes), the standard unbiased Jaccard estimator: for
num_perm=128 the estimate's std is sqrt(j(1-j)/128) <= 0.045, and the
banding threshold already guarantees candidates cluster near/above
the S-curve knee. Same-wave pairs use the same estimator for
consistency (one verification path, one threshold semantics); the
exact-Jaccard path remains available for single-corpus dedup
(stages.dedup.minhash_dedup_pairs).

Drop policy: HISTORY WINS. A new doc matching any indexed doc is
dropped regardless of id order; surviving new docs then run min-id
components among themselves. This keeps the invariant that an indexed
document's keep/drop status never changes retroactively — the
property that makes wave-at-a-time processing composable at 100 TB.

Everything is distributed: band tables meet in a bucketed shuffle,
candidate pairs stay a Dataset through dedup and verification
(stages.dedup plumbing), and the index append is a plain partitioned
parquet write.
"""

from __future__ import annotations

import functools
import os
import zlib
from typing import Optional

import numpy as np
import pandas as pd

from .dedup import (_dedup_pairs_ds, _empty_pairs, _hasher, _id_filter,
                    _pair_ids_ds, _pairwise_verify, components_min_label)


def _wave_dir(base: str, kind: str, wave: int) -> str:
    return os.path.join(base, kind, f"wave={wave:05d}")


def _band_sig_tables(batch: pd.DataFrame, *, num_perm: int, bands: int,
                     shingle: str, text_col: str, id_col: str):
    """One pass over a wave batch -> (band rows, signature rows)."""
    mh = _hasher(num_perm, shingle)
    sigs = mh.signatures_batch(batch[text_col].tolist())
    rows_per_band = num_perm // bands
    band_hashes = np.empty((len(sigs), bands), dtype=np.int64)
    for i in range(len(sigs)):
        row = sigs[i]
        for b in range(bands):
            band_hashes[i, b] = zlib.crc32(
                row[b * rows_per_band:(b + 1) * rows_per_band].tobytes())
    ids = batch[id_col].to_numpy(dtype=np.int64)
    band_df = pd.DataFrame({
        "band": np.tile(np.arange(bands, dtype=np.int32), len(sigs)),
        "band_hash": band_hashes.ravel(),
        "doc_id": np.repeat(ids, bands),
    })
    sig_df = pd.DataFrame({"doc_id": ids,
                           "sig": [sigs[i] for i in range(len(sigs))]})
    return band_df, sig_df


def write_wave_index(ds, index_dir: str, *, wave: int,
                     num_perm: int = 128, bands: int = 16,
                     shingle: str = "word3", text_col: str = "text",
                     id_col: str = "doc_id",
                     batch_size: int = 4096) -> None:
    """Append one wave's MinHash state to the index (partitioned
    parquet; the signature column is list<int64> so it shuffles and
    round-trips without Ray's tensor extension)."""
    import pyarrow as pa

    def bands_of(b: pd.DataFrame) -> pd.DataFrame:
        band_df, _ = _band_sig_tables(
            b, num_perm=num_perm, bands=bands, shingle=shingle,
            text_col=text_col, id_col=id_col)
        return band_df

    def sigs_of(b: pd.DataFrame) -> pa.Table:
        _, sig_df = _band_sig_tables(
            b, num_perm=num_perm, bands=bands, shingle=shingle,
            text_col=text_col, id_col=id_col)
        return pa.Table.from_arrays(
            [pa.array(sig_df["doc_id"].to_numpy(), pa.int64()),
             pa.array([s.tolist() for s in sig_df["sig"]],
                      pa.list_(pa.int64()))],
            names=["doc_id", "sig"])

    (ds.map_batches(bands_of, batch_format="pandas",
                    batch_size=batch_size)
       .write_parquet(_wave_dir(index_dir, "bands", wave)))
    (ds.map_batches(sigs_of, batch_format="pandas",
                    batch_size=batch_size)
       .write_parquet(_wave_dir(index_dir, "sigs", wave)))


_HIST_COLUMNS = {"bands": ["band", "band_hash", "doc_id"],
                 "sigs": ["doc_id", "sig"]}


def _history_ds(index_dir: str, kind: str, *, before_wave: int):
    """Union of all indexed waves strictly before ``before_wave``
    (column-pruned parquet read — the hive `wave=` partition column
    never leaves storage), or None when no history exists."""
    import ray.data as rd
    base = os.path.join(index_dir, kind)
    if not os.path.isdir(base):
        return None
    dirs = sorted(d for d in os.listdir(base)
                  if d.startswith("wave=")
                  and int(d.split("=")[1]) < before_wave)
    if not dirs:
        return None
    paths = []
    for d in dirs:
        full = os.path.join(base, d)
        paths += [os.path.join(full, f) for f in sorted(os.listdir(full))
                  if f.endswith(".parquet")]
    return rd.read_parquet(paths, columns=_HIST_COLUMNS[kind])


def _sig_agreement(sa, sb) -> float:
    """Unbiased MinHash Jaccard estimate: fraction of equal lanes."""
    return float(np.mean(np.asarray(sa, dtype=np.int64)
                         == np.asarray(sb, dtype=np.int64)))


def _mixed_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Within-(band, band_hash) pairs that involve AT LEAST ONE new
    doc (old-old pairs were found when their waves were processed).
    Emits has_old so the drop policy can tell cross-wave matches from
    same-wave ones; vectorized per collision group."""
    dup = df[df.duplicated(["band", "band_hash"], keep=False)]
    out_a, out_b, out_old = [], [], []
    for _, g in dup.groupby(["band", "band_hash"], sort=False):
        g = g.drop_duplicates("doc_id")
        new = np.sort(g.loc[g["is_new"], "doc_id"].to_numpy())
        old = np.sort(g.loc[~g["is_new"], "doc_id"].to_numpy())
        if len(new) == 0:
            continue
        if len(new) > 1:                      # new-new pairs
            i, j = np.triu_indices(len(new), k=1)
            out_a.append(new[i]); out_b.append(new[j])
            out_old.append(np.zeros(len(i), dtype=bool))
        if len(old):                          # new-old pairs
            a = np.repeat(new, len(old))
            b = np.tile(old, len(new))
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            out_a.append(lo); out_b.append(hi)
            out_old.append(np.ones(len(lo), dtype=bool))
    if not out_a:
        return _empty_pairs({"has_old": "bool"})
    return pd.DataFrame({"id_a": np.concatenate(out_a),
                         "id_b": np.concatenate(out_b),
                         "has_old": np.concatenate(out_old)})


def incremental_dedup_wave(new_ds, index_dir: str, *, wave: int,
                           threshold: float = 0.7, num_perm: int = 128,
                           bands: int = 16, shingle: str = "word3",
                           text_col: str = "text", id_col: str = "doc_id",
                           batch_size: int = 4096,
                           append_index: bool = True) -> dict:
    """Dedup one ingest wave against itself AND the index of all prior
    waves. Returns {"kept": Dataset of kept new ids, "pairs": Dataset
    of (id_a, id_b, has_old, est_jaccard)}; when ``append_index`` the
    wave's band/signature state is written so the NEXT wave sees it.

    Doc ids must be globally unique across waves (the id_col contract
    of the whole dedup suite).
    """
    import ray.data as rd

    from ..relational import bucketed_map_groups

    def tag(is_new):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy(deep=False)
            b["is_new"] = is_new
            return b
        return f

    def bands_of(b: pd.DataFrame) -> pd.DataFrame:
        band_df, _ = _band_sig_tables(
            b, num_perm=num_perm, bands=bands, shingle=shingle,
            text_col=text_col, id_col=id_col)
        return band_df

    new_bands = (new_ds.map_batches(bands_of, batch_format="pandas",
                                    batch_size=batch_size)
                 .map_batches(tag(True), batch_format="pandas"))
    hist_bands = _history_ds(index_dir, "bands", before_wave=wave)
    all_bands = new_bands if hist_bands is None else new_bands.union(
        hist_bands.map_batches(tag(False), batch_format="pandas"))

    cand_ds = _dedup_pairs_ds(
        bucketed_map_groups(all_bands, ["band", "band_hash"],
                            _mixed_pairs)).materialize()

    # signature payloads: new sigs computed in-flight, historical sigs
    # read back from the index — both filtered to candidate docs
    import pyarrow as pa

    def sig_payload(b: pd.DataFrame) -> pa.Table:
        _, sig_df = _band_sig_tables(
            b, num_perm=num_perm, bands=bands, shingle=shingle,
            text_col=text_col, id_col=id_col)
        return pa.Table.from_arrays(
            [pa.array(sig_df["doc_id"].to_numpy(), pa.int64()),
             pa.array([s.tolist() for s in sig_df["sig"]],
                      pa.list_(pa.int64()))],
            names=["doc_id", "pl"])

    ids_ds = _pair_ids_ds(cand_ds, id_col).materialize()
    new_payloads = _id_filter(new_ds, ids_ds, id_col,
                              batch_size=batch_size).map_batches(
        sig_payload, batch_format="pandas", batch_size=batch_size)
    hist_sigs = _history_ds(index_dir, "sigs", before_wave=wave)
    if hist_sigs is not None:
        def reencode(b: pd.DataFrame) -> pa.Table:
            # back to an explicit Arrow list<int64> after the pandas
            # filter (ndarray cells must never enter a shuffle)
            return pa.Table.from_arrays(
                [pa.array(b["doc_id"].to_numpy(dtype=np.int64)),
                 pa.array([np.asarray(x).tolist() for x in b["pl"]],
                          pa.list_(pa.int64()))],
                names=["doc_id", "pl"])

        hist_payloads = _id_filter(
            hist_sigs.map_batches(
                lambda t: t.rename_columns(["doc_id", "pl"]),
                batch_format="pyarrow"),
            ids_ds, "doc_id", batch_size=batch_size).map_batches(
            reencode, batch_format="pandas")
        payload_ds = new_payloads.union(hist_payloads)
    else:
        payload_ds = new_payloads

    scored = _pairwise_verify(cand_ds, payload_ds, _sig_agreement,
                              "est_jaccard")

    def thresh(b: pd.DataFrame) -> pd.DataFrame:
        return b[np.round(b["est_jaccard"].to_numpy(dtype=np.float64), 4)
                 >= threshold]

    kept_pairs = scored.map_batches(thresh, batch_format="pandas")

    # re-attach has_old by PAIR IDENTITY: one bucketed meet of the
    # scored pairs with the flag rows (a real score is never NaN, so
    # NaN marks the flag side after the union)
    cols = ["id_a", "id_b", "has_old", "est_jaccard"]
    flags_u = cand_ds.map_batches(
        lambda b: b.assign(est_jaccard=np.nan)[cols],
        batch_format="pandas")
    scored_u = kept_pairs.map_batches(
        lambda b: b.assign(has_old=False)[cols],
        batch_format="pandas")

    def attach_flag(g: pd.DataFrame) -> pd.DataFrame:
        f = g[g["est_jaccard"].isna()][["id_a", "id_b", "has_old"]]
        s = g[g["est_jaccard"].notna()][["id_a", "id_b", "est_jaccard"]]
        return s.merge(f, on=["id_a", "id_b"],
                       how="inner")[["id_a", "id_b", "has_old",
                                     "est_jaccard"]]

    pairs_out = bucketed_map_groups(scored_u.union(flags_u),
                                    ["id_a", "id_b"],
                                    attach_flag).materialize()

    # drop policy: history wins, then min-id components among new-new
    hist_hits = pairs_out.map_batches(
        lambda b: pd.DataFrame({id_col: np.unique(np.concatenate([
            b.loc[b["has_old"], "id_a"].to_numpy(dtype=np.int64),
            b.loc[b["has_old"], "id_b"].to_numpy(dtype=np.int64)]))}),
        batch_format="pandas")
    # only NEW ids can be dropped by a has_old pair; old ids in those
    # pairs are filtered out by intersecting with the wave's own ids
    hist_dropped = _id_filter(
        new_ds.map_batches(lambda b: b[[id_col]],
                           batch_format="pandas",
                           batch_size=batch_size),
        hist_hits, id_col, batch_size=batch_size)

    nn_pairs = pairs_out.map_batches(
        lambda b: b.loc[~b["has_old"], ["id_a", "id_b"]],
        batch_format="pandas")
    comp = components_min_label(nn_pairs)
    nn_dropped = comp.loc[comp["node"] != comp["rep"], ["node"]].rename(
        columns={"node": id_col})

    drop_ds = hist_dropped
    if not nn_dropped.empty:
        drop_ds = drop_ds.union(rd.from_pandas(nn_dropped))
    kept = _id_filter(
        new_ds.map_batches(lambda b: b[[id_col]],
                           batch_format="pandas",
                           batch_size=batch_size),
        drop_ds, id_col, anti=True, batch_size=batch_size)

    if append_index:
        write_wave_index(new_ds, index_dir, wave=wave, num_perm=num_perm,
                         bands=bands, shingle=shingle, text_col=text_col,
                         id_col=id_col, batch_size=batch_size)
    return {"kept": kept, "pairs": pairs_out}
