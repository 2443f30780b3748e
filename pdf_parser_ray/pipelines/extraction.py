"""Flagship pipeline: streaming main-content extraction over transcripts.

read (pruned) -> synthesize/ingest transcripts -> map_batches extraction
(actor pool, zero-copy Arrow) -> [optional] stable (conv_id, turn_idx)
sort -> [optional] checkpointed bucketed write with lineage sidecars.

Skew handling: a cheap pre-count (groupby conv_id count on a projected
dataset) identifies mega-conversations; the narrow extraction stage is
skew-immune (rows are independent), so salting is only applied at the
wide stages — the bucket writer hashes conv_id into many buckets
(buckets ≫ heavy keys), and per-conv assembly salts mega-convs into
sub-groups (stages/assemble handles one conv per group; mega convs are
bounded by MAX turns per conv here, far below block budget).
"""

from __future__ import annotations

from typing import Optional

from ..sources.transcripts import transcripts_dataset
from ..stages.extract import ExtractTurns


def pool_size(reserve: int = 2, cap: int | None = None) -> tuple:
    """Autoscaling (min, max) for an actor pool that always leaves
    ``reserve`` CPUs for the read/shuffle/write stages — a pool that
    reserves every CPU deadlocks a downstream all-to-all (observed at
    num_cpus=4: pool of 4 starves the groupby shuffle indefinitely)."""
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:  # not initialized yet: conservative default
        cpus = 4
    hi = max(1, cpus - reserve)
    if cap is not None:
        hi = min(hi, cap)
    # min close to max: the autoscaling ramp is too slow for short jobs
    # (observed: a (1, 28) pool reached ~8 actors in a 15 s run, flat
    # 8->32-cpu scaling); the reserve above already guarantees the
    # shuffle/read stages can't be starved even at min == max.
    lo = max(1, hi // 2)
    return (lo, hi)


def extract_dataset(transcripts, *, batch_size=None,
                    concurrency=None, use_actors: bool = False):
    """transcript Dataset -> extracted-turn Dataset (narrow, streaming).

    Default is STATELESS TASKS: the stage's only state (strategy
    registry + compiled regexes) is module-level and free to rehydrate,
    and tasks are elastic — measured 143k turns/s vs 76k for a 28-actor
    pool on the same input at 32 CPUs, with no pool-sizing deadlock
    risk. Pass ``use_actors=True`` (the A1 warmed-model path) when the
    stage holds expensive per-worker state; the pool is then sized by
    pool_size() to leave shuffle headroom.

    ``batch_size=None`` (default) = one batch per input block: the
    read op then FUSES with extraction into a single task pool (an
    explicit batch_size forces a re-batching operator boundary —
    measured 117k -> 159k turns/s on the mult=16 bench when fused),
    and the Arrow->python conversion amortizes over whole blocks.
    Rows are ~1-2 KB of text, so even 128 MiB blocks are ~100k-row
    batches — far below worker heap; set an explicit batch_size only
    for wide-payload variants (the multimodal stages already do)."""
    if use_actors or concurrency is not None:
        return transcripts.map_batches(
            ExtractTurns,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency if concurrency is not None else pool_size(),
            num_cpus=1,
        )
    from ..stages.extract import extract_batch
    return transcripts.map_batches(
        extract_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def compare_strategies(transcripts, strategies, *, batch_size: int = 512):
    """Run N extraction strategies over the SAME transcript Dataset and
    return {strategy_name: extracted Dataset} — the analog of the
    reference's multi-strategy comparison harness
    (pdf_layout_tester.py:325-365, compare_extractors). Each strategy
    routes every tool to itself (forced), so outputs are comparable
    row-for-row on (conv_id, turn_idx)."""
    import functools

    from ..kernel import CLASSIFIERS
    from ..stages.extract import extract_batch

    out = {}
    for name in strategies:
        if name not in CLASSIFIERS:
            raise ValueError(f"unknown strategy {name!r}; "
                             f"known: {sorted(CLASSIFIERS)}")
        forced = {tool: name for tool in
                  ("pdf_layout", "colored", "vision", "layoutlm", "html", "")}
        out[name] = transcripts.map_batches(
            functools.partial(extract_batch, registry=forced),
            batch_format="pyarrow", batch_size=batch_size)
    return out


def heavy_conversations(transcripts, *, threshold: int = 64):
    """Cheap skew pre-pass (SURVEY.md §4): conv_id -> turn count, heavy
    keys only. Projects to one column, pre-counts per batch, and only
    the tiny per-batch partials shuffle."""
    from ..relational import grouped_agg
    counts = grouped_agg(transcripts.select_columns(["conv_id"]),
                         ["conv_id"], {"count": ("count", None)})
    heavy = counts[counts["count"] >= threshold]
    return dict(zip(heavy["conv_id"], heavy["count"]))


def _finish(extracted, out_dir, ordered, n_buckets, salt_turns=0):
    if ordered:
        extracted = extracted.sort(["conv_id", "turn_idx"])
    if out_dir is not None:
        from ..state.checkpoint import checkpointed_write
        return checkpointed_write(extracted, out_dir, key="conv_id",
                                  n_buckets=n_buckets,
                                  salt_turns=salt_turns)
    return extracted


def run_extraction(sf_dir: str, out_dir: Optional[str] = None, *,
                   ordered: bool = False, batch_size=None,
                   concurrency=None, n_buckets: int = 32,
                   salt_turns: int = 0):
    """The flagship run over the SYNTHESIZED corpus (documents ->
    transcripts -> extraction). Returns the (lazy) extracted Dataset;
    when ``out_dir`` is given, executes the checkpointed write and
    returns the lineage metrics DataFrame instead."""
    ts = transcripts_dataset(sf_dir)
    extracted = extract_dataset(ts, batch_size=batch_size,
                                concurrency=concurrency)
    return _finish(extracted, out_dir, ordered, n_buckets, salt_turns)


def run_extraction_from_parquet(transcripts_path, out_dir: Optional[str] = None,
                                *, ordered: bool = False,
                                batch_size=None, concurrency=None,
                                n_buckets: int = 32, columns=None,
                                salt_turns: int = 0,
                                override_num_blocks: Optional[int] = None):
    """The PRODUCTION entry: extract an existing transcript Parquet
    table (file, directory of part files, or list of paths — at real
    scale the file count drives read parallelism). Only the columns the
    kernel needs are read unless ``columns`` overrides.
    ``override_num_blocks``: pin the read's block count — one block
    per file measured 1.4-1.8x faster than Ray's sub-file split
    heuristic on ~1-2 MB text-heavy files (bench.py does this); leave
    None for large files where sub-file splits are the point."""
    import ray.data as rd
    ts = rd.read_parquet(transcripts_path,
                         columns=columns or ["conv_id", "turn_idx",
                                             "text", "tool"],
                         override_num_blocks=override_num_blocks)
    extracted = extract_dataset(ts, batch_size=batch_size,
                                concurrency=concurrency)
    return _finish(extracted, out_dir, ordered, n_buckets, salt_turns)


def run_extraction_from_source(path, *, format: str = "parquet",
                               out_dir: Optional[str] = None,
                               ordered: bool = False,
                               batch_size=None, concurrency=None,
                               n_buckets: int = 32, salt_turns: int = 0,
                               override_num_blocks: Optional[int] = None):
    """Format-agnostic production entry: extract a transcript table in
    any format ``sources.transcripts.read_transcripts`` accepts
    (parquet = the pruned scale path; jsonl/csv = ingest paths
    normalized to the canonical schema before extraction). Same
    checkpointing/ordering contract as run_extraction_from_parquet."""
    from ..sources.transcripts import read_transcripts
    ts = read_transcripts(path, format=format,
                          columns=["conv_id", "turn_idx", "text",
                                   "tool"],
                          override_num_blocks=override_num_blocks)
    extracted = extract_dataset(ts, batch_size=batch_size,
                                concurrency=concurrency)
    return _finish(extracted, out_dir, ordered, n_buckets, salt_turns)
