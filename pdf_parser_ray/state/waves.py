"""Wave-level incremental extraction over an append-only corpus.

Production shape: a crawl/ingest pipeline lands new transcript Parquet
files every day; the extraction job is re-submitted over the WHOLE
file listing and must process only what is new, resume a crashed wave
without duplicating rows, and expose one coherent read surface over
everything extracted so far. (The reference has no incremental mode —
its CLI re-extracts whole PDFs; this is the 100-TB-operations layer on
top of the same per-turn kernel.)

Layout under ``out_dir``:

    _WAVES.json              committed-wave registry (atomic replace)
    wave=00000/_WAVE.json    the wave's input file list (written first)
    wave=00000/bucket=*/     the existing checkpointed bucketed write
    wave=00001/...

Crash protocol: a wave directory is created (with its `_WAVE.json`
file list) BEFORE extraction and its registry entry is appended only
AFTER the checkpointed write completes. A crash in between leaves an
uncommitted wave dir; the next submission with the same pending file
set RESUMES it (the bucketed write skips completed buckets) and then
commits. An uncommitted dir whose recorded file set differs from the
pending one is ambiguous and refused, like checkpoint.py's re-bucket
guard — never silently mixed.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import pandas as pd

_REGISTRY = "_WAVES.json"
_WAVE_META = "_WAVE.json"


def _registry_path(out_dir: str) -> str:
    return os.path.join(out_dir, _REGISTRY)


def read_registry(out_dir: str) -> List[dict]:
    p = _registry_path(out_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)["waves"]


def _commit_registry(out_dir: str, waves: List[dict]) -> None:
    tmp = _registry_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"waves": waves}, f, sort_keys=True)
    os.replace(tmp, _registry_path(out_dir))


def _empty_metrics() -> pd.DataFrame:
    return pd.DataFrame({
        "bucket": pd.array([], dtype="int64"),
        "rows": pd.array([], dtype="int64"),
        "error_rows": pd.array([], dtype="int64")})


def extract_wave(transcript_files: Sequence[str], out_dir: str, *,
                 n_buckets: int = 32, salt_turns: int = 0,
                 batch_size=None, concurrency=None,
                 override_num_blocks: Optional[int] = None,
                 ) -> Tuple[Optional[int], pd.DataFrame]:
    """Extract the files in ``transcript_files`` that no committed wave
    has processed yet. Returns ``(wave_id, per-bucket metrics)`` for the
    LAST wave this call committed; ``(None, empty)`` when everything
    submitted is already committed (idempotent re-submission). The
    whole current listing can be passed every time — diffing against
    the registry is the point.

    Crash recovery: an uncommitted wave dir whose recorded file set is
    a SUBSET of the pending files is resumed (bucket-wise) and
    committed first, and the remainder then proceeds as the next
    wave in the same call — so a crash that straddles a new file drop
    never wedges the daily re-submission. A recorded set containing
    files NOT in the pending listing is genuinely ambiguous and
    refused. A dir that crashed before its ``_WAVE.json`` landed
    (meta is written atomically, so it is either absent or valid) has
    by construction no extracted data and is adopted for the current
    pending set."""
    from ..pipelines.extraction import run_extraction_from_parquet
    from .checkpoint import read_lineage

    os.makedirs(out_dir, exist_ok=True)
    files = sorted(os.path.abspath(p) for p in transcript_files)
    last: Tuple[Optional[int], pd.DataFrame] = (None, _empty_metrics())
    while True:
        waves = read_registry(out_dir)
        seen = {f for w in waves for f in w["files"]}
        new_files = [f for f in files if f not in seen]
        if not new_files:
            return last

        wave_id = len(waves)
        wdir = os.path.join(out_dir, f"wave={wave_id:05d}")
        meta_path = os.path.join(wdir, _WAVE_META)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                wave_files = json.load(f)["files"]
            stray = [f for f in wave_files if f not in new_files]
            if stray:
                raise ValueError(
                    f"uncommitted {wdir} was started for a different "
                    f"file set ({len(stray)} of its files are not in "
                    "the pending listing); refusing to mix waves "
                    "(remove the directory or re-submit the original "
                    "listing)")
            # subset (or equal): resume THIS wave over its own files;
            # any remaining pending files become the next loop turn
        else:
            # no meta -> the previous run died before _WAVE.json's
            # atomic replace, so no extraction ever started here;
            # adopt the dir for the current pending set
            wave_files = new_files
            os.makedirs(wdir, exist_ok=True)
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"files": wave_files}, f, sort_keys=True)
            os.replace(tmp, meta_path)

        metrics = run_extraction_from_parquet(
            wave_files, out_dir=wdir, n_buckets=n_buckets,
            salt_turns=salt_turns, batch_size=batch_size,
            concurrency=concurrency,
            override_num_blocks=override_num_blocks)
        if metrics.empty:
            metrics = _empty_metrics()

        # lineage is the wave's TRUE total: on a resume the returned
        # metrics cover only the recomputed buckets
        lineage = read_lineage(wdir)
        waves.append({"wave": wave_id, "files": wave_files,
                      "rows": int(lineage["rows"].sum())
                      if len(lineage) else 0})
        _commit_registry(out_dir, waves)
        last = (wave_id, metrics)


def read_waves(out_dir: str, *, columns: Optional[List[str]] = None):
    """One Dataset over every COMMITTED wave's bucket parquet files
    (an uncommitted, half-written wave is invisible — readers only see
    registry-committed data). Hive-style path inference surfaces the
    ``wave`` directory key as a provenance column alongside the stored
    ``bucket`` column; both are cast to int64 so they join directly
    against ``waves_lineage`` / the registry (the raw hive values are
    zero-padded directory strings)."""
    import ray.data as rd
    paths: List[str] = []
    for w in read_registry(out_dir):
        wdir = os.path.join(out_dir, f"wave={w['wave']:05d}")
        for b in sorted(os.listdir(wdir)):
            if not b.startswith("bucket="):
                continue
            bdir = os.path.join(wdir, b)
            if not os.path.exists(os.path.join(bdir, "_SUCCESS")):
                continue
            paths.extend(sorted(
                os.path.join(bdir, f) for f in os.listdir(bdir)
                if f.endswith(".parquet")))
    if not paths:
        raise ValueError(f"no committed wave data under {out_dir}")
    ds = rd.read_parquet(paths, columns=columns)

    def cast_hive(t):
        import pyarrow as pa
        import pyarrow.compute as pc
        for name in ("wave", "bucket"):
            idx = t.schema.get_field_index(name)
            if idx >= 0 and not pa.types.is_integer(t.column(idx).type):
                t = t.set_column(idx, name,
                                 pc.cast(t.column(idx), pa.int64()))
        return t

    return ds.map_batches(cast_hive, batch_format="pyarrow")


def waves_lineage(out_dir: str) -> pd.DataFrame:
    """Per-wave, per-bucket lineage for every committed wave."""
    from .checkpoint import read_lineage
    rows = []
    for w in read_registry(out_dir):
        lin = read_lineage(os.path.join(out_dir, f"wave={w['wave']:05d}"))
        lin["wave"] = w["wave"]
        rows.append(lin)
    return (pd.concat(rows, ignore_index=True) if rows
            else pd.DataFrame())
