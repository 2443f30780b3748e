"""Fault-tolerance drill: a worker process hard-killed mid-extraction
(os._exit — no exception, no cleanup; what a machine loss looks like to
the scheduler) must not change the output. Ray's task retry reschedules
the dead worker's block and the flagship result is BIT-IDENTICAL to a
clean run — the compute-side complement of the crash-resume drill in
test_shards/test_derived_pipelines, which covers the write side.
"""

import os

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_worker_kill_mid_extraction_retries_to_identical_output(
        ray_session, tmp_path):
    from pdf_parser_ray.pipelines.extraction import (_finish,
                                                     extract_dataset,
                                                     run_extraction)
    from pdf_parser_ray.sources.transcripts import transcripts_dataset

    clean = run_extraction(SF, ordered=True).to_pandas()

    sentinel = str(tmp_path / "killed_once")

    def crash_once(b: pd.DataFrame) -> pd.DataFrame:
        # the first task through on this host hard-kills its worker;
        # O_EXCL makes the kill exactly-once across worker processes
        try:
            fd = os.open(sentinel, os.O_CREAT | os.O_EXCL)
            os.close(fd)
            os._exit(1)
        except FileExistsError:
            pass
        return b

    ts = transcripts_dataset(SF).map_batches(crash_once,
                                             batch_format="pandas")
    faulted = _finish(extract_dataset(ts), None, True, 32, 0).to_pandas()

    assert os.path.exists(sentinel), "the crash branch never executed"
    pd.testing.assert_frame_equal(clean, faulted)


def test_worker_kill_in_shuffle_reduce_retries_to_identical_output(
        ray_session, tmp_path):
    """Kill a worker INSIDE a post-shuffle reduce task (the bucketed
    combine of grouped_agg_ds's shape): Ray must replay that reduce
    from the shuffle outputs and the aggregate must come out
    identical — the all-to-all recovery case a multi-node run hits
    when a node dies after the map side finished."""
    from pdf_parser_ray.relational import bucketed_map_groups, read_table

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("event_type", as_index=False, sort=False).agg(
            n=("event_id", "size"), sum_value=("value", "sum"))
        return out

    def clean_run():
        ds = read_table(SF, "events", ["event_id", "event_type", "value"])
        return (bucketed_map_groups(ds, ["event_type"], combine)
                .to_pandas().sort_values("event_type")
                .reset_index(drop=True))

    sentinel = str(tmp_path / "killed_reduce")

    def crashing_combine(g: pd.DataFrame) -> pd.DataFrame:
        try:
            fd = os.open(sentinel, os.O_CREAT | os.O_EXCL)
            os.close(fd)
            os._exit(1)
        except FileExistsError:
            pass
        return combine(g)

    want = clean_run()
    ds = read_table(SF, "events", ["event_id", "event_type", "value"])
    got = (bucketed_map_groups(ds, ["event_type"], crashing_combine)
           .to_pandas().sort_values("event_type").reset_index(drop=True))

    assert os.path.exists(sentinel), "the crash branch never executed"
    pd.testing.assert_frame_equal(want, got)
