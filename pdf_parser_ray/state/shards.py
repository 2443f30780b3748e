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
atomic rename commit (the `_SUCCESS` marker and `_meta.json` are
written INSIDE the tmp directory, so the rename itself is the full
commit — there is no window where a committed shard lacks its
marker), manifest with per-shard row counts and content hashes; a
re-run skips committed shards. Shard parquet is written in bounded
row-group slices and the content hash is taken over the parquet bytes
— no whole-shard text round-trip.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import List, Optional

import numpy as np
import pandas as pd

_ROW_GROUP = 65536          # rows per parquet row group / write slice
_HASH_CHUNK = 1 << 20       # bytes per content-hash read


def _shard_hash(s: pd.Series) -> np.ndarray:
    """Deterministic 64-bit hash of the key column (fixed-key siphash
    via pandas, identical across processes)."""
    return pd.util.hash_pandas_object(s, index=False).to_numpy()


def _read_meta(sdir: str) -> dict:
    with open(os.path.join(sdir, "_meta.json")) as f:
        return json.load(f)


def write_training_shards(ds, out_dir: str, *, key_col: str,
                          n_shards: int = 16,
                          columns: Optional[List[str]] = None,
                          shared_fs: bool = False,
                          row_group_size: int = _ROW_GROUP) -> pd.DataFrame:
    """Export ``ds`` as ``n_shards`` deterministic parquet shards.

    Returns the manifest DataFrame (shard, rows, content_hash), built
    from the rows each writer task returns (newly written shards) plus
    the committed ``_meta.json`` of shards skipped on resume — the
    driver never rescans worker output. Skips shards whose ``_SUCCESS``
    marker already exists (resume); refuses to resume into a directory
    written with a different shard count.

    Shard tasks write through the local filesystem path ``out_dir``;
    on a multi-node cluster that path must be on storage shared by
    every node (NFS, fuse-mounted object store) — pass
    ``shared_fs=True`` to assert that, otherwise a >1-node cluster is
    rejected up front instead of silently scattering shards across
    worker-local disks.

    Memory: one task holds one shard's rows (sorting needs them);
    size ``n_shards`` so data_size / n_shards fits a worker heap —
    the parquet itself is written in bounded row-group slices, so
    raising ``n_shards`` is the only knob needed at scale.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..relational import bucketed_map_groups

    if ray.is_initialized() and not shared_fs:
        alive = [n for n in ray.nodes() if n.get("Alive")]
        if len(alive) > 1:
            raise ValueError(
                "write_training_shards writes shards through the "
                f"filesystem path {out_dir!r}; on a multi-node cluster "
                "that path must be shared storage visible to every "
                "node — pass shared_fs=True to assert it is")

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
        if d.startswith("shard=") and not d.endswith(".tmp")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))}

    if columns is not None:
        ds = ds.map_batches(lambda b: b[columns], batch_format="pandas")

    def add_shard(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        h = _shard_hash(b[key_col])
        b["__h"] = h.astype("uint64")
        b["__shard"] = (h % n_shards).astype("int32")
        return b.loc[~b["__shard"].isin(done)]

    def write_shard(g: pd.DataFrame) -> dict:
        shard = int(g["__shard"].iloc[0])
        sdir = os.path.join(out_dir, f"shard={shard:05d}")
        if os.path.exists(os.path.join(sdir, "_meta.json")):
            # an earlier (crashed-after-rename or speculatively
            # retried) task already committed this shard — the rename
            # IS the commit, so adopt its manifest row
            return _read_meta(sdir)
        g = (g.sort_values(["__h", key_col], kind="mergesort")
             .drop(columns=["__h", "__shard"]).reset_index(drop=True))
        # unique tmp dir per writer so concurrent retries never
        # collide; only the rename below is the commit point
        tmp = f"{sdir}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        ppath = os.path.join(tmp, "part.parquet")
        schema = pa.Schema.from_pandas(g, preserve_index=False)
        with pq.ParquetWriter(ppath, schema) as w:
            for i in range(0, max(len(g), 1), row_group_size):
                w.write_table(pa.Table.from_pandas(
                    g.iloc[i:i + row_group_size], schema=schema,
                    preserve_index=False))
        # content identity = the parquet bytes themselves (the sort
        # above makes them partitioning-invariant), hashed streaming
        hasher = hashlib.blake2b(digest_size=16)
        with open(ppath, "rb") as f:
            for chunk in iter(lambda: f.read(_HASH_CHUNK), b""):
                hasher.update(chunk)
        meta = {"shard": shard, "rows": int(len(g)),
                "content_hash": hasher.hexdigest()}
        with open(os.path.join(tmp, "_meta.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("")
        try:
            os.rename(tmp, sdir)             # the one atomic commit
        except OSError:
            # another writer committed first; keep its shard
            shutil.rmtree(tmp, ignore_errors=True)
            meta = _read_meta(sdir)
        return meta

    tagged = ds.map_batches(add_shard, batch_format="pandas")
    # one group per shard id: the shard file is written INSIDE the
    # bucketed combine (shard count chosen ≫ nodes bounds skew the
    # same way the checkpoint writer does); each task RETURNS its
    # manifest row, so the manifest needs no output rescan
    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"shard": pd.Series([], dtype="int64"),
                                 "rows": pd.Series([], dtype="int64"),
                                 "content_hash": pd.Series([],
                                                           dtype=object)})
        rows = [write_shard(gg)
                for _, gg in g.groupby("__shard", sort=False)]
        return pd.DataFrame(rows)

    written = bucketed_map_groups(tagged, ["__shard"],
                                  run_bucket).to_pandas()
    rows = ([] if written.empty else
            written.to_dict("records"))
    for shard in done:      # committed in a previous run
        rows.append(_read_meta(os.path.join(out_dir,
                                            f"shard={shard:05d}")))
    # plain-python values: manifest rows round-trip through json
    rows = [{"shard": int(m["shard"]), "rows": int(m["rows"]),
             "content_hash": str(m["content_hash"])} for m in rows]
    rows.sort(key=lambda m: m["shard"])
    mdf = pd.DataFrame(rows).reset_index(drop=True)
    mdf = mdf.astype({"shard": "int64", "rows": "int64"})
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(rows, f, indent=1)
    return mdf


# ------------------------------------------------------- sorted range export

def _range_scalar(v):
    """Manifest-storable scalar for a sort-column value (JSON has no
    timestamps: datetimes become int64 epoch-microseconds)."""
    if isinstance(v, (np.datetime64, pd.Timestamp)):
        return int(np.datetime64(v, "us").view("int64"))
    if isinstance(v, (np.integer,)):
        return int(v)
    return float(v)


def _sort_key_array(s: pd.Series) -> np.ndarray:
    """The sort column as a numeric array manifest bounds compare in
    (datetime64 -> epoch us), matching `_range_scalar`."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return s.values.astype("datetime64[us]").view("int64")
    return s.to_numpy()


def write_sorted_export(ds, out_dir: str, *, sort_col: str,
                        tiebreak_cols: Optional[List[str]] = None,
                        n_ranges: Optional[int] = None,
                        columns: Optional[List[str]] = None,
                        shared_fs: bool = False,
                        row_group_size: int = _ROW_GROUP) -> pd.DataFrame:
    """GLOBALLY SORTED export: range-partitioned parquet where range
    directories concatenated in order form one totally sorted dataset,
    plus a per-range (vmin, vmax) manifest enabling PRUNED range reads
    (`read_sorted_range`) — the serving-side complement to the
    hash-sharded trainer export above (same atomic rename commit,
    resume, and shared-filesystem contract).

    Range boundaries come from a deterministic bounded hash-sample of
    the sort column (quantile placement — boundary choice only affects
    balance, never correctness); each range task sorts only its own
    slice, so memory per task is data_size / n_ranges and a global
    `ds.sort` all-to-all is never issued. Byte-determinism of each
    range file requires a total order: pass ``tiebreak_cols`` covering
    duplicates of ``sort_col`` (e.g. a unique id).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..relational import _sample_order_values, bucketed_map_groups

    if ray.is_initialized() and not shared_fs:
        alive = [n for n in ray.nodes() if n.get("Alive")]
        if len(alive) > 1:
            raise ValueError(
                f"write_sorted_export writes through the filesystem "
                f"path {out_dir!r}; on a multi-node cluster it must be "
                "shared storage — pass shared_fs=True to assert it is")

    from ..relational import default_buckets
    K = n_ranges or default_buckets()
    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "_SORTED.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        if prev["n_ranges"] != K or prev["sort_col"] != sort_col:
            raise ValueError(
                f"resume mismatch: directory has n_ranges="
                f"{prev['n_ranges']} sort_col={prev['sort_col']!r}, "
                f"requested {K}/{sort_col!r}")
        bounds = np.array(prev["bounds"], dtype=np.float64)
        kind = prev["kind"]
    else:
        sample = _sample_order_values(ds, sort_col)
        kind = ("datetime" if np.issubdtype(np.asarray(sample).dtype,
                                            np.datetime64)
                else "numeric")
        snum = (np.asarray(sample).astype("datetime64[us]").view("int64")
                if kind == "datetime" else
                np.asarray(sample, dtype=np.float64))
        bounds = (np.quantile(snum.astype(np.float64),
                              np.linspace(0, 1, K + 1)[1:-1],
                              method="lower")
                  if len(snum) >= 2 else np.array([]))
        with open(meta_path, "w") as f:
            json.dump({"n_ranges": K, "sort_col": sort_col,
                       "kind": kind, "bounds": list(map(float, bounds))},
                      f)

    done = {
        int(d.split("=")[1])
        for d in os.listdir(out_dir)
        if d.startswith("range=") and not d.endswith(".tmp")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))}

    if columns is not None:
        cols = list(dict.fromkeys([sort_col, *(tiebreak_cols or []),
                                   *columns]))
        ds = ds.map_batches(lambda b: b[cols], batch_format="pandas")

    def add_rng(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        v = _sort_key_array(b[sort_col]).astype(np.float64)
        b["__rng"] = np.searchsorted(bounds, v, side="right") \
            .astype("int32")
        return b.loc[~b["__rng"].isin(done)]

    sort_by = [sort_col, *(tiebreak_cols or [])]

    def write_range(g: pd.DataFrame) -> dict:
        rng = int(g["__rng"].iloc[0])
        sdir = os.path.join(out_dir, f"range={rng:05d}")
        if os.path.exists(os.path.join(sdir, "_meta.json")):
            return _read_meta(sdir)
        g = (g.sort_values(sort_by, kind="mergesort")
             .drop(columns="__rng").reset_index(drop=True))
        tmp = f"{sdir}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        ppath = os.path.join(tmp, "part.parquet")
        schema = pa.Schema.from_pandas(g, preserve_index=False)
        with pq.ParquetWriter(ppath, schema) as w:
            for i in range(0, max(len(g), 1), row_group_size):
                w.write_table(pa.Table.from_pandas(
                    g.iloc[i:i + row_group_size], schema=schema,
                    preserve_index=False))
        hasher = hashlib.blake2b(digest_size=16)
        with open(ppath, "rb") as f:
            for chunk in iter(lambda: f.read(_HASH_CHUNK), b""):
                hasher.update(chunk)
        key = _sort_key_array(g[sort_col])
        meta = {"range": rng, "rows": int(len(g)),
                "vmin": _range_scalar(key[0]) if len(g) else None,
                "vmax": _range_scalar(key[-1]) if len(g) else None,
                "content_hash": hasher.hexdigest()}
        with open(os.path.join(tmp, "_meta.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("")
        try:
            os.rename(tmp, sdir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            meta = _read_meta(sdir)
        return meta

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"range": pd.Series([], dtype="int64"),
                                 "rows": pd.Series([], dtype="int64"),
                                 "vmin": pd.Series([], dtype="float64"),
                                 "vmax": pd.Series([], dtype="float64"),
                                 "content_hash": pd.Series([],
                                                           dtype=object)})
        return pd.DataFrame([write_range(gg)
                             for _, gg in g.groupby("__rng", sort=False)])

    tagged = ds.map_batches(add_rng, batch_format="pandas")
    written = bucketed_map_groups(tagged, ["__rng"], run_bucket,
                                  n_buckets=K).to_pandas()
    rows = [] if written.empty else written.to_dict("records")
    for rng in done:
        rows.append(_read_meta(os.path.join(out_dir, f"range={rng:05d}")))
    rows = [{"range": int(m["range"]), "rows": int(m["rows"]),
             "vmin": m["vmin"], "vmax": m["vmax"],
             "content_hash": str(m["content_hash"])} for m in rows]
    rows.sort(key=lambda m: m["range"])
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump({"kind": kind, "sort_col": sort_col, "ranges": rows},
                  f, indent=1)
    mdf = pd.DataFrame(rows).reset_index(drop=True)
    return mdf.astype({"range": "int64", "rows": "int64"})


def _read_part_files(files: List[str], columns: Optional[List[str]]):
    """read_parquet over explicit part files with hive-partition
    inference defused: the range=NNNNN directory names would otherwise
    materialize a spurious partition column (and Ray 2.49's
    partitioning=None path crashes when columns= is also given), so
    when the caller wants all columns we pass the part schema's names
    explicitly."""
    import pyarrow.parquet as pq
    import ray.data as rd
    if columns is None:
        columns = list(pq.read_schema(files[0]).names)
    return rd.read_parquet(files, columns=columns)


def read_sorted_range(out_dir: str, lo=None, hi=None,
                      columns: Optional[List[str]] = None):
    """Pruned read over a `write_sorted_export` directory: only range
    files whose manifest [vmin, vmax] intersects [lo, hi] are opened
    (both bounds inclusive; None = open end). Returns (Dataset,
    n_files_read) — the count makes pruning observable/testable."""
    import ray.data as rd

    with open(os.path.join(out_dir, "_MANIFEST.json")) as f:
        man = json.load(f)
    kind, sort_col = man["kind"], man["sort_col"]

    def conv(v):
        if v is None:
            return None
        if kind == "datetime":
            return int(np.datetime64(pd.Timestamp(v), "us").view("int64"))
        return float(v)

    lo_s, hi_s = conv(lo), conv(hi)
    files = [
        os.path.join(out_dir, f"range={m['range']:05d}", "part.parquet")
        for m in man["ranges"]
        if m["rows"] > 0
        and (hi_s is None or m["vmin"] <= hi_s)
        and (lo_s is None or m["vmax"] >= lo_s)]
    if not files:
        return None, 0
    need_trim = not (lo_s is None and hi_s is None)
    if columns is not None and need_trim and sort_col not in columns:
        columns = [sort_col, *columns]   # the trim filter needs the key
    ds = _read_part_files(files, columns)
    if lo_s is None and hi_s is None:
        return ds, len(files)

    def trim(b: pd.DataFrame) -> pd.DataFrame:
        v = _sort_key_array(b[sort_col]).astype(np.float64)
        m = np.ones(len(b), dtype=bool)
        if lo_s is not None:
            m &= v >= lo_s
        if hi_s is not None:
            m &= v <= hi_s
        return b.loc[m]

    return ds.map_batches(trim, batch_format="pandas"), len(files)


# ------------------------------------------------------------- z-order export

def _morton16(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave two 8-bit code arrays into 16-bit Morton (Z-order)
    codes, vectorized magic-number bit spreading; ``a`` takes the odd
    (higher) bit positions."""
    def spread(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.uint16)
        x = (x | (x << np.uint16(4))) & np.uint16(0x0F0F)
        x = (x | (x << np.uint16(2))) & np.uint16(0x3333)
        x = (x | (x << np.uint16(1))) & np.uint16(0x5555)
        return x
    return ((spread(a) << np.uint16(1)) | spread(b)).astype(np.uint16)


def _col_kind(s: pd.Series) -> str:
    return ("datetime"
            if pd.api.types.is_datetime64_any_dtype(s) else "numeric")


def _quantize(v: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Value -> 8-bit rank code against sampled quantile boundaries
    (monotone: order-preserving, so per-file [vmin, vmax] stay valid
    pruning bounds for the ORIGINAL values)."""
    return np.searchsorted(bounds, v.astype(np.float64),
                           side="right").astype(np.uint8)


def _sample_rows(ds, cols: List[str], k: int = 4096) -> pd.DataFrame:
    """Deterministic bounded JOINT sample of ``cols`` (bottom-k by
    fixed-key row hash): per-batch partial bottom-k, driver final
    bottom-k — O(k) driver memory under any partitioning."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[cols].copy(deep=False)
        # hash the WHOLE row tuple: equal hashes then imply equal
        # (c0, c1) pairs, so bottom-k boundary ties cannot make the
        # sampled grid depend on input partitioning
        v["__h"] = pd.util.hash_pandas_object(
            b[cols], index=False).to_numpy()
        return v.nsmallest(k, "__h")

    s = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return s.nsmallest(k, "__h") if len(s) else s


def write_zorder_export(ds, out_dir: str, *, cols: List[str],
                        tiebreak_cols: Optional[List[str]] = None,
                        n_ranges: Optional[int] = None,
                        shared_fs: bool = False,
                        row_group_size: int = _ROW_GROUP) -> pd.DataFrame:
    """Z-ORDER clustered export: rows are range-partitioned by the
    Morton interleaving of two columns' sampled-quantile rank codes,
    so files are simultaneously clustered on BOTH columns and a
    predicate on EITHER prunes file reads via the manifest's per-file
    per-column [vmin, vmax] — the multi-dimensional complement of
    `write_sorted_export` (single-column total order). Same atomic
    rename commit, resume, manifest and shared-filesystem contract.

    Clustering quality, never correctness, depends on the sampled
    quantile grids (256 levels per column from a bounded joint
    sample); pruning bounds in the manifest are true min/max of the
    original values, so a skewed sample only costs balance.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..relational import bucketed_map_groups, default_buckets

    if len(cols) != 2:
        raise ValueError("write_zorder_export clusters exactly 2 columns")
    if ray.is_initialized() and not shared_fs:
        alive = [n for n in ray.nodes() if n.get("Alive")]
        if len(alive) > 1:
            raise ValueError(
                f"write_zorder_export writes through the filesystem "
                f"path {out_dir!r}; on a multi-node cluster it must be "
                "shared storage — pass shared_fs=True to assert it is")

    K = n_ranges or default_buckets()
    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "_ZORDER.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        if prev["n_ranges"] != K or prev["cols"] != list(cols):
            raise ValueError(
                f"resume mismatch: directory has n_ranges="
                f"{prev['n_ranges']} cols={prev['cols']}, "
                f"requested {K}/{list(cols)}")
        kinds = prev["kinds"]
        grids = [np.array(g, dtype=np.float64) for g in prev["grids"]]
        zbounds = np.array(prev["zbounds"], dtype=np.int64)
    else:
        sample = _sample_rows(ds, list(cols))
        kinds = [(_col_kind(sample[c]) if len(sample) else "numeric")
                 for c in cols]
        grids, codes = [], []
        for c in cols:
            v = (_sort_key_array(sample[c]).astype(np.float64)
                 if len(sample) else np.array([], dtype=np.float64))
            g = (np.quantile(v, np.linspace(0, 1, 256)[1:-1],
                             method="lower")
                 if len(v) >= 2 else np.array([], dtype=np.float64))
            g = np.unique(g)
            grids.append(g)
            codes.append(_quantize(v, g))
        z = (_morton16(codes[0], codes[1]).astype(np.int64)
             if len(sample) else np.array([], dtype=np.int64))
        zbounds = (np.quantile(z, np.linspace(0, 1, K + 1)[1:-1],
                               method="lower").astype(np.int64)
                   if len(z) >= 2 else np.array([], dtype=np.int64))
        with open(meta_path, "w") as f:
            json.dump({"n_ranges": K, "cols": list(cols), "kinds": kinds,
                       "grids": [list(map(float, g)) for g in grids],
                       "zbounds": [int(b) for b in zbounds]}, f)

    done = {
        int(d.split("=")[1])
        for d in os.listdir(out_dir)
        if d.startswith("range=") and not d.endswith(".tmp")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))}

    def add_rng(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        c0 = _quantize(_sort_key_array(b[cols[0]]), grids[0])
        c1 = _quantize(_sort_key_array(b[cols[1]]), grids[1])
        z = _morton16(c0, c1).astype(np.int64)
        b["__z"] = z
        b["__rng"] = np.searchsorted(zbounds, z,
                                     side="right").astype("int32")
        return b.loc[~b["__rng"].isin(done)]

    sort_by = ["__z", *cols, *(tiebreak_cols or [])]

    def write_range(g: pd.DataFrame) -> dict:
        rng = int(g["__rng"].iloc[0])
        sdir = os.path.join(out_dir, f"range={rng:05d}")
        if os.path.exists(os.path.join(sdir, "_meta.json")):
            return _read_meta(sdir)
        g = (g.sort_values(sort_by, kind="mergesort")
             .drop(columns=["__z", "__rng"]).reset_index(drop=True))
        tmp = f"{sdir}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        ppath = os.path.join(tmp, "part.parquet")
        schema = pa.Schema.from_pandas(g, preserve_index=False)
        with pq.ParquetWriter(ppath, schema) as w:
            for i in range(0, max(len(g), 1), row_group_size):
                w.write_table(pa.Table.from_pandas(
                    g.iloc[i:i + row_group_size], schema=schema,
                    preserve_index=False))
        hasher = hashlib.blake2b(digest_size=16)
        with open(ppath, "rb") as f:
            for chunk in iter(lambda: f.read(_HASH_CHUNK), b""):
                hasher.update(chunk)
        meta = {"range": rng, "rows": int(len(g)),
                "content_hash": hasher.hexdigest()}
        for c in cols:
            key = _sort_key_array(g[c])
            meta[f"vmin__{c}"] = _range_scalar(key.min()) if len(g) else None
            meta[f"vmax__{c}"] = _range_scalar(key.max()) if len(g) else None
        with open(os.path.join(tmp, "_meta.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("")
        try:
            os.rename(tmp, sdir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            meta = _read_meta(sdir)
        return meta

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"range": pd.Series([], dtype="int64"),
                                 "rows": pd.Series([], dtype="int64"),
                                 "content_hash": pd.Series([],
                                                           dtype=object)})
        return pd.DataFrame([write_range(gg)
                             for _, gg in g.groupby("__rng", sort=False)])

    tagged = ds.map_batches(add_rng, batch_format="pandas")
    written = bucketed_map_groups(tagged, ["__rng"], run_bucket,
                                  n_buckets=K).to_pandas()
    rows = [] if written.empty else written.to_dict("records")
    for rng in done:
        rows.append(_read_meta(os.path.join(out_dir, f"range={rng:05d}")))
    rows.sort(key=lambda m: int(m["range"]))
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump({"cols": list(cols), "kinds": kinds, "ranges": rows},
                  f, indent=1)
    mdf = pd.DataFrame(rows).reset_index(drop=True)
    return mdf.astype({"range": "int64", "rows": "int64"})


def read_zorder_range(out_dir: str, preds: dict,
                      columns: Optional[List[str]] = None):
    """Pruned read over a `write_zorder_export` directory.

    ``preds``: {col: (lo, hi)} inclusive bounds (None = open end) on
    either or both clustered columns; only range files whose manifest
    per-column [vmin, vmax] intersects EVERY predicate are opened.
    Returns (Dataset filtered to the exact predicate rows,
    n_files_read).
    """
    import ray.data as rd

    with open(os.path.join(out_dir, "_MANIFEST.json")) as f:
        man = json.load(f)
    cols, kinds = man["cols"], man["kinds"]
    kind_of = dict(zip(cols, kinds))

    def conv(c, v):
        if v is None:
            return None
        if kind_of[c] == "datetime":
            return int(np.datetime64(pd.Timestamp(v), "us").view("int64"))
        return float(v)

    norm = {c: (conv(c, lo), conv(c, hi)) for c, (lo, hi) in preds.items()
            if c in kind_of}
    if set(preds) - set(kind_of):
        raise ValueError(f"predicate on non-clustered column(s) "
                         f"{sorted(set(preds) - set(kind_of))}; "
                         f"clustered: {cols}")

    def keep(m) -> bool:
        if m["rows"] == 0:
            return False
        for c, (lo, hi) in norm.items():
            if hi is not None and m[f"vmin__{c}"] > hi:
                return False
            if lo is not None and m[f"vmax__{c}"] < lo:
                return False
        return True

    files = [os.path.join(out_dir, f"range={m['range']:05d}",
                          "part.parquet")
             for m in man["ranges"] if keep(m)]
    if not files:
        return None, 0
    read_cols = columns
    if read_cols is not None:
        read_cols = list(dict.fromkeys([*norm.keys(), *read_cols]))
    ds = _read_part_files(files, read_cols)
    if not norm:
        return ds, len(files)

    def trim(b: pd.DataFrame) -> pd.DataFrame:
        m = np.ones(len(b), dtype=bool)
        for c, (lo, hi) in norm.items():
            v = _sort_key_array(b[c]).astype(np.float64)
            if lo is not None:
                m &= v >= lo
            if hi is not None:
                m &= v <= hi
        return b.loc[m]

    return ds.map_batches(trim, batch_format="pandas"), len(files)


# ------------------------------------------------ storage-partitioned join

def write_bucketed_export(ds, out_dir: str, *, key: str,
                          n_buckets: int,
                          tiebreak_cols: Optional[List[str]] = None,
                          shared_fs: bool = False,
                          row_group_size: int = _ROW_GROUP
                          ) -> pd.DataFrame:
    """HASH-BUCKETED export: rows land in ``bucket=NNNNN/`` by the
    fixed-key siphash of ``key`` mod ``n_buckets`` — the durable form
    of "pick ONE partitioning key and reuse it": two tables exported
    with the same (hash family, n_buckets) co-locate matching keys ON
    DISK, so `read_bucketed_join` joins them bucket-by-bucket with
    ZERO shuffle at read time (the storage-partitioned join). Same
    atomic rename commit, resume, `_SUCCESS` markers and content-hash
    manifest as the sorted/z-order exports; `_BUCKETED.json` records
    the layout and a resume or join against a different layout is
    refused, never silently mis-bucketed."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    if ray.is_initialized() and not shared_fs:
        alive = [n for n in ray.nodes() if n.get("Alive")]
        if len(alive) > 1:
            raise ValueError(
                f"write_bucketed_export writes through the filesystem "
                f"path {out_dir!r}; on a multi-node cluster it must be "
                "shared storage — pass shared_fs=True to assert it is")

    from ..relational import bucketed_map_groups

    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "_BUCKETED.json")
    layout = {"key": key, "n_buckets": int(n_buckets),
              "hash": "pandas-siphash-v1"}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        if prev != layout:
            raise ValueError(
                f"resume mismatch: directory has layout {prev}, "
                f"requested {layout}")
    else:
        with open(meta_path, "w") as f:
            json.dump(layout, f)

    done = {
        int(d.split("=")[1])
        for d in os.listdir(out_dir)
        if d.startswith("bucket=") and not d.endswith(".tmp")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))}

    def add_bkt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["__bkt"] = (pd.util.hash_pandas_object(b[key], index=False)
                      .to_numpy() % np.uint64(n_buckets)).astype("int32")
        return b.loc[~b["__bkt"].isin(done)]

    sort_by = [key, *(tiebreak_cols or [])]

    def write_bucket(g: pd.DataFrame) -> dict:
        bkt = int(g["__bkt"].iloc[0])
        sdir = os.path.join(out_dir, f"bucket={bkt:05d}")
        if os.path.exists(os.path.join(sdir, "_meta.json")):
            return _read_meta(sdir)
        g = (g.sort_values(sort_by, kind="mergesort")
             .drop(columns="__bkt").reset_index(drop=True))
        tmp = f"{sdir}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        ppath = os.path.join(tmp, "part.parquet")
        schema = pa.Schema.from_pandas(g, preserve_index=False)
        with pq.ParquetWriter(ppath, schema) as w:
            for i in range(0, max(len(g), 1), row_group_size):
                w.write_table(pa.Table.from_pandas(
                    g.iloc[i:i + row_group_size], schema=schema,
                    preserve_index=False))
        hasher = hashlib.blake2b(digest_size=16)
        with open(ppath, "rb") as f:
            for chunk in iter(lambda: f.read(_HASH_CHUNK), b""):
                hasher.update(chunk)
        meta = {"bucket": bkt, "rows": int(len(g)),
                "content_hash": hasher.hexdigest()}
        with open(os.path.join(tmp, "_meta.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("")
        try:
            os.rename(tmp, sdir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            meta = _read_meta(sdir)
        return meta

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                 "rows": pd.Series([], dtype="int64"),
                                 "content_hash": pd.Series([],
                                                           dtype=object)})
        return pd.DataFrame([write_bucket(gg)
                             for _, gg in g.groupby("__bkt", sort=False)])

    tagged = ds.map_batches(add_bkt, batch_format="pandas")
    written = bucketed_map_groups(tagged, ["__bkt"], run_bucket,
                                  n_buckets=n_buckets).to_pandas()
    rows = [] if written.empty else written.to_dict("records")
    for bkt in done:
        rows.append(_read_meta(os.path.join(out_dir,
                                            f"bucket={bkt:05d}")))
    rows = [{"bucket": int(m["bucket"]), "rows": int(m["rows"]),
             "content_hash": str(m["content_hash"])} for m in rows]
    rows.sort(key=lambda m: m["bucket"])
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump({**layout, "buckets": rows}, f, indent=1)
    return pd.DataFrame(rows).reset_index(drop=True)


def read_bucketed_join(dir_left: str, dir_right: str, *,
                       how: str = "inner"):
    """STORAGE-PARTITIONED JOIN over two `write_bucketed_export`
    directories: matching keys already share a bucket index on disk,
    so the join is one independent task per bucket — read both sides'
    bucket files, pandas-merge, emit — with ZERO shuffle at read time
    (contrast `relational.hash_join`, which pays the co-partitioning
    exchange per run; here it was paid once at write time and is
    reused by every subsequent join on the same key). Layouts must
    agree exactly (key hash family + n_buckets) — a mismatch is
    refused up front, never silently wrong. NULL keys follow SQL:
    they never match; ``how='left'`` keeps left nulls unmatched."""
    import pyarrow.parquet as pq
    import ray.data as rd

    if how not in ("inner", "left"):
        raise ValueError(f"read_bucketed_join supports inner/left, "
                         f"got {how!r}")
    metas = []
    for d in (dir_left, dir_right):
        p = os.path.join(d, "_BUCKETED.json")
        if not os.path.exists(p):
            raise ValueError(f"{d!r} is not a bucketed export "
                             "(no _BUCKETED.json)")
        with open(p) as f:
            metas.append(json.load(f))
    ml, mr = metas
    if (ml["n_buckets"], ml["hash"]) != (mr["n_buckets"], mr["hash"]):
        raise ValueError(
            f"bucket layout mismatch: {ml} vs {mr} — the "
            "storage-partitioned join needs identical hash family "
            "and bucket count; re-export one side")
    kl, kr, n = ml["key"], mr["key"], int(ml["n_buckets"])

    def join_bucket(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for bkt in b["id"].tolist():
            pl = os.path.join(dir_left, f"bucket={bkt:05d}",
                              "part.parquet")
            pr = os.path.join(dir_right, f"bucket={bkt:05d}",
                              "part.parquet")
            lf = (pq.read_table(pl).to_pandas() if os.path.exists(pl)
                  else None)
            rf = (pq.read_table(pr).to_pandas() if os.path.exists(pr)
                  else None)
            if lf is None or not len(lf):
                continue
            if rf is None:
                rf = pd.DataFrame({kr: pd.Series([], dtype=object)})
            rf = rf.rename(columns={kr: kl})
            rf = rf.loc[rf[kl].notna()]      # SQL: nulls never match
            if how == "inner":
                lf = lf.loc[lf[kl].notna()]
            outs.append(lf.merge(rf, on=kl, how=how))
        if not outs:
            return pd.DataFrame()
        return pd.concat(outs, ignore_index=True)

    ids = rd.range(n, override_num_blocks=n)
    ids = ids.map_batches(lambda b: pd.DataFrame({"id": b["id"]}),
                          batch_format="pandas")
    return ids.map_batches(join_bucket, batch_format="pandas")
