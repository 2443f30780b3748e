"""Wave-level incremental extraction (state/waves.py): only new files
are processed per submission, a crashed wave resumes without
duplicates, readers see only committed waves, and the union over waves
equals a one-shot extraction of the same files."""

import json
import os

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
            [sorted(df.columns)])


@pytest.fixture(scope="module")
def corpus_files(ray_session, tmp_path_factory):
    """The synthesized sf0.001 transcripts split into three daily
    parquet files by conversation hash."""
    from pdf_parser_ray.sources.transcripts import transcripts_dataset
    ts = transcripts_dataset(SF).to_pandas()
    d = tmp_path_factory.mktemp("wave_input")
    h = pd.util.hash_pandas_object(ts["conv_id"], index=False) % 3
    paths = []
    for day in range(3):
        p = str(d / f"day{day}.parquet")
        ts[h == day].reset_index(drop=True).to_parquet(p)
        paths.append(p)
    return paths, ts


def test_waves_process_only_new_files(ray_session, corpus_files,
                                      tmp_path):
    from pdf_parser_ray.pipelines.extraction import (
        run_extraction_from_parquet)
    from pdf_parser_ray.state.waves import (extract_wave, read_registry,
                                            read_waves, waves_lineage)
    paths, _ = corpus_files
    out = str(tmp_path / "corpus")

    w0, m0 = extract_wave(paths[:1], out, n_buckets=8)
    assert w0 == 0 and m0["rows"].sum() > 0
    # resubmit the FULL listing: only day1+day2 are new
    w1, m1 = extract_wave(paths, out, n_buckets=8)
    assert w1 == 1 and m1["rows"].sum() > 0
    # fully-committed listing -> no-op
    w2, m2 = extract_wave(paths, out, n_buckets=8)
    assert w2 is None and m2.empty

    reg = read_registry(out)
    assert [w["wave"] for w in reg] == [0, 1]
    assert reg[0]["files"] == [os.path.abspath(paths[0])]
    assert sorted(reg[1]["files"]) == sorted(
        os.path.abspath(p) for p in paths[1:])

    # union over waves == one-shot extraction of all three files
    got = _sorted(read_waves(out).to_pandas())
    # hive-inferred provenance, cast to int64 to match waves_lineage
    assert set(got["wave"]) == {0, 1}
    want = _sorted(run_extraction_from_parquet(paths).to_pandas())
    pd.testing.assert_frame_equal(got.drop(columns=["bucket", "wave"]),
                                  want)

    lin = waves_lineage(out)
    assert set(lin["wave"]) == {0, 1}
    assert lin["rows"].sum() == len(got)


def test_crashed_wave_resumes_without_duplicates(ray_session,
                                                 corpus_files, tmp_path):
    """Simulate a crash AFTER the bucketed write but BEFORE the
    registry commit: the wave dir exists (with some buckets complete),
    the registry doesn't know it. Re-submission resumes that dir —
    recomputing only the incomplete buckets — then commits; no
    duplicate (conv_id, turn_idx) keys."""
    import shutil

    from pdf_parser_ray.state.waves import extract_wave, read_waves
    paths, _ = corpus_files
    out = str(tmp_path / "corpus")
    extract_wave(paths[:1], out, n_buckets=8)

    # run wave 1, then roll back: delete its registry entry and one
    # bucket's _SUCCESS (a mid-write crash leaves exactly this)
    extract_wave(paths[:2], out, n_buckets=8)
    reg_path = os.path.join(out, "_WAVES.json")
    reg = json.load(open(reg_path))
    reg["waves"] = reg["waves"][:1]
    json.dump(reg, open(reg_path, "w"))
    wdir = os.path.join(out, "wave=00001")
    victim = sorted(b for b in os.listdir(wdir)
                    if b.startswith("bucket="))[0]
    shutil.rmtree(os.path.join(wdir, victim))

    w, m = extract_wave(paths[:2], out, n_buckets=8)
    assert w == 1
    # resume recomputed ONLY the deleted bucket
    assert m["bucket"].tolist() == [int(victim.split("=")[1])]
    full = read_waves(out).to_pandas()
    assert not full.duplicated(["conv_id", "turn_idx"]).any()
    # the committed registry entry records the wave's FULL row count
    # (from lineage), not just the recomputed bucket's
    reg2 = json.load(open(reg_path))["waves"]
    wave1_rows = full[full["wave"] == 1].shape[0]
    assert reg2[1]["rows"] == wave1_rows


def test_uncommitted_wave_with_foreign_files_refused(
        ray_session, corpus_files, tmp_path):
    """A recorded file OUTSIDE the pending listing is genuinely
    ambiguous and refused (a subset, by contrast, resumes)."""
    from pdf_parser_ray.state.waves import extract_wave
    paths, _ = corpus_files
    out = str(tmp_path / "corpus")
    extract_wave(paths[:1], out, n_buckets=8)
    wdir = os.path.join(out, "wave=00001")
    os.makedirs(wdir)
    json.dump({"files": ["/tmp/never_submitted.parquet"]},
              open(os.path.join(wdir, "_WAVE.json"), "w"))
    with pytest.raises(ValueError, match="different file set"):
        extract_wave(paths, out, n_buckets=8)


def test_crash_straddling_new_drop_resumes_then_continues(
        ray_session, corpus_files, tmp_path):
    """A crash before the registry commit, followed by a NEW file
    landing: the next full-listing submission must resume + commit the
    crashed wave over ITS files, then process the new file as the next
    wave — the daily cron never wedges."""
    from pdf_parser_ray.pipelines.extraction import (
        run_extraction_from_parquet)
    from pdf_parser_ray.state.waves import (extract_wave, read_registry,
                                            read_waves, waves_lineage)
    paths, _ = corpus_files
    out = str(tmp_path / "corpus")
    extract_wave(paths[:1], out, n_buckets=8)
    extract_wave(paths[:2], out, n_buckets=8)
    # roll back wave 1's registry entry (crash before commit)
    reg_path = os.path.join(out, "_WAVES.json")
    reg = json.load(open(reg_path))
    reg["waves"] = reg["waves"][:1]
    json.dump(reg, open(reg_path, "w"))

    # day2's file has landed; submit the full listing
    w, _ = extract_wave(paths, out, n_buckets=8)
    assert w == 2
    reg = read_registry(out)
    assert [x["wave"] for x in reg] == [0, 1, 2]
    assert reg[1]["files"] == [os.path.abspath(paths[1])]
    assert reg[2]["files"] == [os.path.abspath(paths[2])]

    got = _sorted(read_waves(out).to_pandas())
    # the hive wave column is int64 so it joins lineage directly
    assert got["wave"].dtype == "int64"
    lin = waves_lineage(out)
    joined = got.merge(lin[["wave", "bucket", "rows"]],
                       on=["wave", "bucket"], how="left")
    assert joined["rows"].notna().all()
    want = _sorted(run_extraction_from_parquet(paths).to_pandas())
    pd.testing.assert_frame_equal(
        got.drop(columns=["bucket", "wave"]), want)


def test_dir_without_meta_is_adopted(ray_session, corpus_files,
                                     tmp_path):
    """A wave dir whose _WAVE.json never landed (crash before the
    atomic replace) has no data by construction; the next submission
    adopts it instead of crashing."""
    from pdf_parser_ray.state.waves import extract_wave
    paths, _ = corpus_files
    out = str(tmp_path / "corpus")
    extract_wave(paths[:1], out, n_buckets=8)
    os.makedirs(os.path.join(out, "wave=00001"))
    w, m = extract_wave(paths[:2], out, n_buckets=8)
    assert w == 1 and m["rows"].sum() > 0


def test_read_waves_ignores_uncommitted(ray_session, corpus_files,
                                        tmp_path):
    from pdf_parser_ray.state.waves import extract_wave, read_waves
    paths, _ = corpus_files
    out = str(tmp_path / "corpus")
    extract_wave(paths[:1], out, n_buckets=8)
    n_committed = read_waves(out).count()
    # an uncommitted wave dir with data must stay invisible
    extract_wave(paths[:2], out, n_buckets=8)
    reg_path = os.path.join(out, "_WAVES.json")
    reg = json.load(open(reg_path))
    reg["waves"] = reg["waves"][:1]
    json.dump(reg, open(reg_path, "w"))
    assert read_waves(out).count() == n_committed


def test_compaction_preserves_view_and_prunes(ray_session,
                                              corpus_files, tmp_path):
    """compact_waves seals the committed view into one generation:
    the read surface is frame-identical before/after, delta waves
    landed after a compaction union in, a second generation prunes
    the first, and recompaction with nothing new is a no-op."""
    from pdf_parser_ray.state.waves import (compact_waves, extract_wave,
                                            read_compactions, read_waves)
    paths, _ = corpus_files
    out = str(tmp_path / "corpus")
    extract_wave(paths[:1], out, n_buckets=8)
    extract_wave(paths[:2], out, n_buckets=8)

    before = _sorted(read_waves(out).to_pandas())
    entry = compact_waves(out)
    assert entry["generation"] == 0 and entry["covers_through"] == 1
    assert entry["rows"] == len(before)
    after = _sorted(read_waves(out).to_pandas())
    pd.testing.assert_frame_equal(before, after)

    assert compact_waves(out) is None   # nothing new: idempotent

    # a delta wave after the compaction unions into the view
    extract_wave(paths, out, n_buckets=8)
    view = _sorted(read_waves(out).to_pandas())
    assert set(view["wave"]) == {0, 1, 2}
    assert len(view) > len(before)

    # second generation covers the delta; WITHOUT prune the previous
    # generation stays on disk (an in-flight reader may stream it)
    entry2 = compact_waves(out)
    assert entry2["generation"] == 1 and entry2["covers_through"] == 2
    assert os.path.exists(os.path.join(out, "compact=00000"))
    pd.testing.assert_frame_equal(
        _sorted(read_waves(out).to_pandas()), view)
    assert [c["generation"] for c in read_compactions(out)] == [0, 1]

    # explicit prune removes only superseded generations
    from pdf_parser_ray.state.waves import prune_superseded
    removed = prune_superseded(out)
    assert removed == [os.path.join(out, "compact=00000")]
    assert os.path.exists(os.path.join(out, "compact=00001"))
    assert os.path.exists(os.path.join(out, "wave=00000"))  # lineage kept
    pd.testing.assert_frame_equal(
        _sorted(read_waves(out).to_pandas()), view)


def test_uncommitted_compaction_invisible_and_rebuilt(
        ray_session, corpus_files, tmp_path):
    from pdf_parser_ray.state.waves import (compact_waves, extract_wave,
                                            read_waves)
    paths, _ = corpus_files
    out = str(tmp_path / "corpus")
    extract_wave(paths[:2], out, n_buckets=8)
    before = _sorted(read_waves(out).to_pandas())
    # a crashed compaction: dir exists with partial junk, no registry
    cdir = os.path.join(out, "compact=00000")
    os.makedirs(cdir)
    before.head(3).to_parquet(os.path.join(cdir, "partial.parquet"))
    pd.testing.assert_frame_equal(
        _sorted(read_waves(out).to_pandas()), before)  # invisible
    entry = compact_waves(out)                          # rebuilt clean
    assert entry["generation"] == 0
    pd.testing.assert_frame_equal(
        _sorted(read_waves(out).to_pandas()), before)


def test_wave_landed_mid_compaction_stays_a_delta(
        ray_session, corpus_files, tmp_path, monkeypatch):
    """A wave the daily job commits WHILE a compaction rewrite is
    running must end up neither baked into the generation (would
    duplicate) nor erased by the commit (would lose rows): content and
    covers_through come from one snapshot, the commit re-reads the
    registry, so the interleaved wave stays a delta."""
    import ray.data

    from pdf_parser_ray.pipelines.extraction import (
        run_extraction_from_parquet)
    from pdf_parser_ray.state.waves import (compact_waves, extract_wave,
                                            read_registry, read_waves)
    paths, _ = corpus_files
    out = str(tmp_path / "corpus")
    extract_wave(paths[:2], out, n_buckets=8)   # wave 0 = day0+day1

    orig = ray.data.Dataset.write_parquet
    fired = {}

    def hooked(self, path, *a, **kw):
        if not fired:            # day2's wave lands mid-rewrite
            fired["x"] = True
            extract_wave(paths, out, n_buckets=8)
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(ray.data.Dataset, "write_parquet", hooked)
    entry = compact_waves(out)
    monkeypatch.undo()

    assert fired and entry["covers_through"] == 0
    assert [w["wave"] for w in read_registry(out)] == [0, 1]
    got = _sorted(read_waves(out).to_pandas())
    want = _sorted(run_extraction_from_parquet(paths).to_pandas())
    pd.testing.assert_frame_equal(
        got.drop(columns=["bucket", "wave"]), want)


def test_prune_honored_when_already_compacted(ray_session,
                                              corpus_files, tmp_path):
    """The documented safe workflow — compact today, prune after a
    grace period — must work from the same entry point: a compact
    call that finds nothing new still prunes when asked."""
    from pdf_parser_ray.state.waves import compact_waves, extract_wave
    paths, _ = corpus_files
    out = str(tmp_path / "corpus")
    extract_wave(paths[:1], out, n_buckets=8)
    compact_waves(out)                       # gen 0
    extract_wave(paths[:2], out, n_buckets=8)
    compact_waves(out)                       # gen 1, gen 0 kept
    assert os.path.exists(os.path.join(out, "compact=00000"))
    assert compact_waves(out, prune=True) is None   # nothing new
    assert not os.path.exists(os.path.join(out, "compact=00000"))
    assert os.path.exists(os.path.join(out, "compact=00001"))


def test_compact_empty_corpus_raises_cleanly(ray_session, tmp_path):
    """Waves committed with zero rows leave no bucket data; compaction
    refuses with the documented error instead of an IndexError."""
    import pandas as pd

    from pdf_parser_ray.state.waves import compact_waves, extract_wave
    cols = {"conv_id": pd.array([], dtype="string"),
            "turn_idx": pd.array([], dtype="int32"),
            "role": pd.array([], dtype="string"),
            "text": pd.array([], dtype="string"),
            "tool": pd.array([], dtype="string")}
    p = str(tmp_path / "empty.parquet")
    pd.DataFrame(cols).to_parquet(p)
    out = str(tmp_path / "corpus")
    w, _ = extract_wave([p], out, n_buckets=4)
    assert w == 0
    with pytest.raises(ValueError, match="no committed wave data"):
        compact_waves(out)


def test_lease_blocks_writer_when_flock_does_not_forward(
        monkeypatch, tmp_path):
    """Simulated non-flock-forwarding shared fs (flock monkeypatched
    to a no-op, as NFSv3 / some FUSE mounts behave across nodes):
    with writer A inside the critical section, writer B must fail
    LOUDLY instead of interleaving the registry read-modify-write.
    The O_EXCL lease file is the fence the flock no longer provides."""
    import fcntl

    from pdf_parser_ray.state import waves

    monkeypatch.setattr(fcntl, "flock", lambda *a, **k: None)
    out = str(tmp_path / "corpus")
    os.makedirs(out)
    a = waves._registry_lock(out)
    a.__enter__()           # writer A holds the lease
    try:
        # pretend the lease belongs to a live writer on another host —
        # same-host dead-pid reclaim must NOT fire
        lease = os.path.join(out, "_WAVES.lease")
        with open(lease, "w") as f:
            json.dump({"host": "other-node", "pid": 1}, f)
        with pytest.raises(RuntimeError, match="does not forward flock"):
            with waves._registry_lock(out, timeout=0.5):
                pass
    finally:
        a.__exit__(None, None, None)


def test_stale_same_host_lease_is_reclaimed(tmp_path):
    """A lease left by a crashed writer on THIS host (dead pid) must
    not wedge the daily job: the next writer reclaims it and commits."""
    import socket

    from pdf_parser_ray.state import waves

    out = str(tmp_path / "corpus")
    os.makedirs(out)
    # a pid that cannot be alive: fork and reap a child
    pid = os.fork()
    if pid == 0:
        os._exit(0)
    os.waitpid(pid, 0)
    with open(os.path.join(out, "_WAVES.lease"), "w") as f:
        json.dump({"host": socket.gethostname(), "pid": pid}, f)
    waves._commit_with(out, add_wave={"wave": 0, "files": [], "rows": 0})
    assert waves.read_registry(out)[0]["wave"] == 0
    assert not os.path.exists(os.path.join(out, "_WAVES.lease"))
