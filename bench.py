"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Plain run: executes the flagship extraction pipeline plus a set of
headline queries, prints ONE JSON line:
  {"metric": ..., "value": <flagship sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns": T,
   "turns_per_sec": ...}

--scaling: runs the flagship job twice in FRESH processes
(num_cpus=8 then num_cpus=32) on the same input and prints both
throughputs plus scaling efficiency (the in-sandbox evidence for the
north rule's N-vs-4N-node criterion; levels are logical CPU slots on
one node).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# replicate the documents table this many times (distinct doc_id ranges)
# so the flagship job is long enough to measure scaling honestly.
# Default 16: at mult=2 the ~3 s job is fixed-overhead-dominated and
# underreports engine throughput 4-5x (round-1 verdict); mult=16
# (~534k turns at sf0.1) amortizes session+read startup honestly.
BENCH_MULT = int(os.environ.get("GRAFT_BENCH_MULT", "16"))


def _ensure_transcripts() -> str:
    """Synthesize the transcript corpus ONCE (untimed) to parquet under
    /tmp and reuse it across runs/levels: the engine's workload is
    'transcript table in, extracted turns out' — fixture generation
    (~220 us/turn, 3x the extraction kernel cost) must not pollute the
    throughput measurement."""
    import pyarrow as pa
    import ray.data as rd

    from pdf_parser_ray.sources.transcripts import synth_batch

    tag = SF_DIR.strip("/").replace("/", "_")
    # v2: bump whenever the generator's LAYOUT changes (fixed 64-block
    # generation, combine_chunks, row_group_size=32768) — the layout
    # feeds the timed read, so a stale pre-fix cache reused through
    # _DONE would silently keep benchmarking the old pathological
    # layout (1,920 tiny row groups/file) and make results
    # incomparable with BASELINE.md
    out = f"/tmp/graft_bench/transcripts_{tag}_m{BENCH_MULT}_v2"
    if os.path.exists(f"{out}/_DONE"):
        return out
    if os.path.exists(out):
        # a previous run died mid-write: partial part files would be
        # silently appended to (write_parquet names files per-run) and
        # every later benchmark would read duplicated turns
        import shutil
        shutil.rmtree(out)

    # fixed block count so the corpus FILE LAYOUT is identical no
    # matter which process (2-cpu scaling leg, 32-cpu headline)
    # generates it first — the layout feeds the timed read, so a
    # generator-dependent file count would make runs incomparable
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"],
                           override_num_blocks=64)

    def synth_replicated(batch: pa.Table) -> pa.Table:
        outs = []
        for j in range(BENCH_MULT):
            if j:
                shifted = batch.set_column(
                    batch.schema.get_field_index("doc_id"), "doc_id",
                    pa.compute.add(batch.column("doc_id"), j * 1_000_000))
                outs.append(synth_batch(shifted))
            else:
                outs.append(synth_batch(batch))
        # combine_chunks: without it the parquet writer emits one row
        # group PER CONCAT CHUNK (~200 rows) — 1,920 tiny row groups
        # per file whose fixed decode overhead dominated the read and
        # skewed sub-file split costs (measured: the 8-core scaling leg
        # sat at the slow end of its band until this fix)
        return pa.concat_tables(outs).combine_chunks()

    (docs.map_batches(synth_replicated, batch_format="pyarrow",
                      batch_size=32)
     .write_parquet(out, row_group_size=32768))
    with open(f"{out}/_DONE", "w") as f:
        f.write("")
    return out


def _flagship_dataset():
    """transcripts parquet -> extraction (the timed engine pipeline).
    Column-pruned read: the kernel needs 4 of the 6 transcript columns
    (role/ts never leave storage). Blocks are pinned to
    max(n_files, 2 x cpus): Ray's default split heuristic fragments a
    many-small-file corpus into sub-file splits whose per-task
    overhead dominates the narrow fused chain (measured 4.75 -> 2.64 s
    at 32 cpus, 11.0 -> 7.9 s at 8 pinned cpus on the 64-file mult=16
    corpus), while a few-big-file corpus still needs >= 2 x cpus
    blocks or the pool starves (one-block-per-FILE on the 4-file
    mult=48 corpus cut 8-cpu scaling to 0.48: 4 tasks on 8 cores)."""
    import ray.data as rd

    from pdf_parser_ray.pipelines.extraction import extract_dataset

    path = _ensure_transcripts()
    n_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    n_blocks = int(os.environ.get("GRAFT_READ_BLOCKS", "0")) or \
        max(n_files, 2 * NUM_CPUS)
    transcripts = rd.read_parquet(path,
                                  columns=["conv_id", "turn_idx",
                                           "text", "tool"],
                                  override_num_blocks=n_blocks)
    return extract_dataset(transcripts)


def run_flagship() -> dict:
    """Best of two back-to-back runs: this shared host's >8-core wall
    clock varies up to 2.3x across contention windows (BASELINE.md),
    so a single draw under-reports engine throughput; both draws are
    reported so the noise stays visible."""
    _ensure_transcripts()          # untimed: corpus generation is cached
    secs = []
    total = 0
    for _ in range(2):
        t0 = time.perf_counter()
        ds = _flagship_dataset()
        # consume as a stream: count + checksum via aggregation, no
        # driver materialization of the payload
        total = ds.count()
        secs.append(time.perf_counter() - t0)
    sec = min(secs)
    return {"sec": round(sec, 3), "turns": total,
            "turns_per_sec": round(total / sec, 1),
            "flagship_runs_sec": [round(s, 3) for s in secs]}


def run_queries() -> dict:
    from pdf_parser_ray.queries import QUERIES
    headline = ["q1_pricing_summary", "events_type_stats",
                "orders_customer_join_stats", "docs_exact_dedup",
                "docs_top_tokens", "embeddings_knn_bruteforce",
                "dedup_minhash_word", "transcript_questions",
                "events_sessions", "events_median_by_type",
                "embeddings_knn_ivf", "events_approx_distinct_users",
                "events_asof_join", "docs_training_mix",
                "embeddings_kmeans", "docs_chunk_dedup",
                "events_weighted_sample", "docs_pack_sequences",
                "docs_incremental_dedup", "docs_cap_per_source",
                "docs_strip_dup_spans", "docs_decontaminate",
                "docs_tfidf_topk", "docs_shuffle_order",
                "docs_quality_gate", "events_sliding_window",
                "events_sorted_export", "events_ntile",
                "docs_heavy_tokens", "docs_sliding_chunks",
                "docs_jaccard_pairs", "events_rollup", "events_funnel",
                "events_zorder_pruned_read", "events_value_mad_by_type",
                "docs_bm25_topk",
                "docs_freq_spectrum", "docs_length_buckets",
                "embeddings_label_outliers", "events_transition_matrix",
                "docs_bigram_novelty", "q5_local_supplier_volume",
                "q18_large_orders", "docs_containment_pairs",
                "events_hourly_anomaly",
                # round 4: salted conv-keyed terminal stages, the
                # bounded sketch-calibration eval, conversation-level
                # near-dup (mergeable union signatures), split + resize
                "transcript_strip_boilerplate", "transcript_sft_pairs",
                "dedup_minhash_eval", "transcript_conv_near_dup",
                "docs_train_val_test_split", "multimodal_resize_raw",
                "docs_pii_scrub", "docs_curation_funnel",
                # round 4 (late): sufficient-stats corr, per-source
                # entropy, bitmask vocabulary-overlap matrix
                "events_value_hour_corr", "docs_source_entropy",
                "docs_vocab_overlap", "events_value_drift_psi",
                "events_rolling_wau", "orders_customer_bucketed_join",
                # continuation session: SemDeDup-style semantic dedup
                # (tiled within-block cosine + recursive-CTE-oracled
                # keep list) and the corpus-self unigram-CE quality
                # proxy
                "embeddings_semantic_pairs", "embeddings_semantic_dedup",
                "embeddings_semantic_pairs_kmeans", "docs_unigram_ce",
                "docs_gopher_rules", "docs_c4_filters",
                # round 5: Gopher repetition-removal rules, DSIR
                # hashed-unigram importance weighting, BPE pair counts
                "docs_gopher_repetition", "docs_dsir_weights",
                "docs_bpe_pair_counts", "docs_bigram_lm_ppl",
                "docs_line_dedup", "events_user_cms_topk",
                # round 5 (late): CCNet per-language perplexity
                # terciles via the distributed grouped ROW_NUMBER
                "docs_ccnet_buckets",
                # round 5 (late): per-language rank-normalized quality
                # percentile; distributed-trained hashed-logreg
                # quality classifier (fastText-style)
                "docs_quality_percentile", "docs_quality_classifier",
                # round 5 (late): inverted-index export (mergeable
                # bottom-k postings) and the C4 bad-words page gate
                "docs_inverted_index", "docs_blocklist_filter",
                # round 5 (late): product quantization — the
                # compression half of the IVF-PQ ANN stack
                "embeddings_pq_codes",
                # round 5 (late): Q4/Q12/Q14 shapes — EXISTS semi
                # join, preagg-before-join rollup, promo ratio
                "q4_priority_semi_join", "q12_status_line_priority",
                "q14_promo_share",
                # round 5 (late): full iterative BPE merge training
                # and the fixed-merge-table tokenizer APPLY pass
                "docs_bpe_train", "docs_bpe_encode",
                # round 5 (late): integer-exact PageRank over the
                # event-type transition graph; type co-occurrence
                # (market-basket prep); RFM NTILE segmentation; the
                # Q10 returned-item report
                "events_type_pagerank", "events_type_cooccurrence",
                "events_user_rfm", "q10_returned_items",
                # round 5 (late): Flesch readability (integer
                # milli-score, one Arrow regex pass); distinct-bigram
                # diversity ratio per source
                "docs_readability", "docs_distinct_ngram_ratio",
                # round 5 (late): p5/p95 winsorized robust stats;
                # repurchase-interval histogram
                "events_winsorized_stats", "orders_interorder_gap",
                # round 5 (late): per-source char-class composition;
                # hapax-legomena vocabulary richness
                "docs_charclass_profile", "docs_hapax_ratio"]
    # transcript_wave_extract is deliberately NOT a bench row: it is a
    # commit-protocol demo (two full wave extractions + checkpointed
    # writes + a driver-built fixture corpus, 12.8 s at sf0.1) whose
    # throughput-relevant compute is exactly the flagship's
    import gc
    # two draws per query, headline = best (like the flagship):
    # single-shot rows carry worker-pool/table-cache ramp (measured:
    # dedup_minhash_eval 7.7 s first draw vs 3.4-3.9 steady), so the
    # recorded number should reflect plan cost, not ramp. Both draws
    # are kept in the output ("query_draws") so the ramp stays
    # visible. GRAFT_BENCH_QUERY_DRAWS=1 restores single-shot.
    draws = int(os.environ.get("GRAFT_BENCH_QUERY_DRAWS", "2"))
    out, all_draws = {}, {}
    for name in headline:
        times = []
        for _ in range(draws):
            t0 = time.perf_counter()
            QUERIES[name](SF_DIR)
            times.append(time.perf_counter() - t0)
            # release the query's Dataset/ObjectRef graph NOW: dropped
            # results sit in reference CYCLES until a full gc pass, and
            # the pinned object-store blocks they hold degraded
            # late-list queries ~3x (measured: docs_jaccard_pairs
            # 9.0-9.7 s after a 30-query session without this, 2.7 s
            # with it; 2.8-3.9 s in a fresh session)
            gc.collect()
        out[name] = round(min(times), 3)
        all_draws[name] = [round(t, 3) for t in times]
    return out, all_draws


def main():
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # warm the page cache so the timed run measures compute+shuffle
    import pyarrow.parquet as pq
    for t in ("documents", "lineitem", "orders", "customer", "events",
              "embeddings"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    flagship = run_flagship()
    queries, query_draws = run_queries()
    ray.shutdown()

    print(json.dumps({
        "metric": "flagship_extraction_wall_sec",
        "value": flagship["sec"],
        "unit": "sec",
        "queries": queries,
        "query_draws": query_draws,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "turns": flagship["turns"],
        "turns_per_sec": flagship["turns_per_sec"],
        "flagship_runs_sec": flagship["flagship_runs_sec"],
        "bench_mult": BENCH_MULT,
    }))


def scaling():
    """Fresh process per parallelism level (N=2 vs 4N=8 CPUs), same
    input — the in-sandbox evidence for the north rule's N-vs-4N-node
    criterion.

    Each level is pinned with CPU AFFINITY (taskset) in addition to
    ray.init(num_cpus=N): Ray's logical slots alone don't confine
    worker-internal (pyarrow) threads, and this shared-host sandbox
    shows heavy wall-clock noise above ~8 cores, so 2-vs-8 pinned
    physical cores is the honest compute-bound measurement. The
    multiplier defaults high enough that the low level runs >=60 s
    (fixed session+read costs amortized)."""
    import shutil
    lo, hi = 2, 8
    results = {}
    for ncpu in (lo, hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_ONLY_FLAGSHIP="1")
        env.setdefault("GRAFT_BENCH_MULT", "48")
        cmd = [sys.executable, __file__]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(cmd, env=env,
                             capture_output=True, text=True, check=True)
        results[ncpu] = json.loads(out.stdout.strip().splitlines()[-1])
    tput_lo = results[lo]["turns_per_sec"]
    tput_hi = results[hi]["turns_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    print(json.dumps({
        "metric": f"scaling_efficiency_{lo}_to_{hi}_cpus",
        f"turns_per_sec_{lo}": tput_lo,
        f"turns_per_sec_{hi}": tput_hi,
        f"sec_{lo}": results[lo]["value"],
        f"sec_{hi}": results[hi]["value"],
        "scaling_efficiency": round(eff, 3),
        "turns": results[hi]["turns"],
        "sf": SF_DIR,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif os.environ.get("GRAFT_BENCH_ONLY_FLAGSHIP"):
        import ray
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        import pyarrow.parquet as pq
        pq.read_table(f"{SF_DIR}/documents.parquet")
        flagship = run_flagship()
        ray.shutdown()
        print(json.dumps({"metric": "flagship_extraction_wall_sec",
                          "value": flagship["sec"], "unit": "sec",
                          "queries": {}, "sf": SF_DIR,
                          "num_cpus": NUM_CPUS, **flagship}))
    else:
        main()
