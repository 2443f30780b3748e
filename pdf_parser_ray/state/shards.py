"""Deterministic training-shard export — the terminal op of a data
pipeline: N shard files a trainer can stream, with a manifest.

Sharding is HASH-based, not random_shuffle: shard membership and
within-shard order depend only on the key column, so the export is
byte-for-byte reproducible under any input partitioning, task order or
retry — a re-run (or a resumed run) cannot produce a differently-
mixed dataset. Within-shard order is (key-hash, key): pseudo-random
relative to any natural ordering of the data (the "global shuffle"
a trainer wants) yet fully deterministic.

Resumability mirrors state/checkpoint.py: one directory per shard,
atomic rename commit, `_SUCCESS` marker, manifest with per-shard row
counts and content hashes; a re-run skips committed shards.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import List, Optional

import numpy as np
import pandas as pd


def _shard_hash(s: pd.Series) -> np.ndarray:
    """Deterministic 64-bit hash of the key column (fixed-key siphash
    via pandas, identical across processes)."""
    return pd.util.hash_pandas_object(s, index=False).to_numpy()


def write_training_shards(ds, out_dir: str, *, key_col: str,
                          n_shards: int = 16,
                          columns: Optional[List[str]] = None) -> pd.DataFrame:
    """Export ``ds`` as ``n_shards`` deterministic parquet shards.

    Returns the manifest DataFrame (shard, rows, content_hash). Skips
    shards whose ``_SUCCESS`` marker already exists (resume); refuses
    to resume into a directory written with a different shard count.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..relational import bucketed_map_groups

    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "_SHARDS.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        if prev["n_shards"] != n_shards:
            raise ValueError(
                f"resume mismatch: directory has n_shards="
                f"{prev['n_shards']}, requested {n_shards}")
    else:
        with open(meta_path, "w") as f:
            json.dump({"n_shards": n_shards, "key_col": key_col}, f)

    done = {
        int(d.split("=")[1])
        for d in os.listdir(out_dir)
        if d.startswith("shard=")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))}

    if columns is not None:
        ds = ds.map_batches(lambda b: b[columns], batch_format="pandas")

    def add_shard(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        h = _shard_hash(b[key_col])
        b["__h"] = h.astype("uint64")
        b["__shard"] = (h % n_shards).astype("int32")
        return b.loc[~b["__shard"].isin(done)]

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["__shard"].iloc[0])
        g = (g.sort_values(["__h", key_col], kind="mergesort")
             .drop(columns=["__h", "__shard"]).reset_index(drop=True))
        content = hashlib.blake2b(
            pa.Table.from_pandas(g, preserve_index=False)
            .to_pandas().to_csv(index=False).encode(),
            digest_size=16).hexdigest()
        sdir = os.path.join(out_dir, f"shard={shard:05d}")
        tmp = sdir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                       os.path.join(tmp, "part.parquet"))
        with open(os.path.join(tmp, "_meta.json"), "w") as f:
            json.dump({"shard": shard, "rows": len(g),
                       "content_hash": content}, f)
        os.rename(tmp, sdir)                 # atomic commit
        with open(os.path.join(sdir, "_SUCCESS"), "w") as f:
            f.write("")
        return pd.DataFrame({"shard": pd.array([shard], dtype="int64"),
                             "rows": pd.array([len(g)], dtype="int64"),
                             "content_hash": [content]})

    tagged = ds.map_batches(add_shard, batch_format="pandas")
    # one group per shard id: the shard file is written INSIDE the
    # bucketed combine (shard count chosen ≫ nodes bounds skew the
    # same way the checkpoint writer does)
    written = bucketed_map_groups(
        tagged, ["__shard"],
        lambda g: pd.concat(
            [write_shard(gg) for _, gg in g.groupby("__shard",
                                                    sort=False)],
            ignore_index=True) if len(g) else g.iloc[0:0],
    ).to_pandas()
    manifest = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("shard=") and not d.endswith(".tmp"):
            with open(os.path.join(out_dir, d, "_meta.json")) as f:
                manifest.append(json.load(f))
    mdf = pd.DataFrame(manifest).sort_values("shard").reset_index(drop=True)
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return mdf
