#!/usr/bin/env python
"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "turns": T, "turns_per_sec": R}

Headline = flagship extraction+assembly (north rule) over the synthetic
transcripts corpus at the scale matching $GRAFT_SF_DIR (default
/root/testdata/sf0.1 -> ~110k turns). Query timings cover the operator
families over the real testdata tables.

--scaling: run the headline twice in FRESH processes at num_cpus=8 and 32
on the same input and report both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "category_stats", "revenue_by_flag", "top_events", "ordered_assembly",
    "join_customer_orders", "join_lineitem_orders", "dedup_exact",
    "minhash_dedup", "embedding_knn", "token_counts", "quality_score",
    "events_sliding", "user_sessions", "asof_purchase_click",
    "range_purchase_views", "normalize_text", "redact_pii",
    "ngram_topk", "tfidf_keywords", "length_deciles", "running_revenue",
    "shipping_priority", "returned_revenue",
    "chunk_dedup", "quality_filter", "revenue_rollup", "event_type_pivot",
    "length_cdf",
    "order_count_distribution", "large_orders", "retention_cohorts",
    "unigram_logprob", "event_transitions", "rolling_time_window",
    "source_token_entropy", "value_mad_by_type", "weighted_sample",
    "fk_audit", "weekly_active_users", "value_hour_correlation",
    "kmeans_assign", "semantic_dedup", "cluster_topics",
    "cluster_purity", "value_quantile_sketch",
    "market_share", "late_shipments", "waiting_suppliers",
    # round-4 curation family
    "mixture_weights", "novelty_curve", "chunk_plan", "hapax_stats",
    "promo_part_suppliers", "interarrival_rate",
    # round-4b web-curation + embedding additions
    "contamination_by_source", "dedup_cluster_sizes",
    "template_prefixes", "length_quality_grid", "dup_canonical",
    "embedding_norm_stats",
    # round-4c family
    "split_contamination", "rfm_segments", "hourly_top_event",
    "heaps_law_curve", "lineitem_value_corr", "session_overlap_peak",
    "doc_perplexity", "ship_latency_percentiles", "label_scatter",
    "reorder_gap_percentiles",
    # round-4d family
    "split_token_kl", "quota_allocation", "rank_normalize_by_source",
    # round-4e family
    "kmv_distinct", "padding_waste", "token_fertility",
    "curriculum_schedule",
    # round-4f family
    "gopher_rules", "dsir_weights", "soft_dedup_weights",
    # round-4g family
    "lang_confusion", "neyman_allocation", "chao1_vocab",
    "event_burstiness",
    # round-4i family
    "event_runs", "oov_rate", "bm25_search",
    # round-4j family
    "boilerplate_ngrams", "prefix_containment", "good_turing",
    "weighted_median_price",
    # round-4k family
    "subsample_weights", "char_coverage", "vocab_coverage",
    "order_backlog",
    # round-4l family
    "knn_label_consistency", "embedding_margin",
    # round-4m family
    "geo_mean_by_type", "bpe_train_steps", "kcenter_coreset",
    # round-4n family
    "exchange_skew_census", "debounce_census",
    # round-4o family
    "dup_coverage", "interarrival_percentiles", "split_balance",
    "user_event_entropy",
    # round-4p family
    "decayed_event_popularity", "dedup_method_agreement",
    "readability_scores", "supplier_reliability",
    # round-4q family
    "token_heavy_hitters", "near_dup_split_safety", "dedup_prf",
    # round-4r family
    "dup_transitivity_gap", "activity_tier_migration",
    "user_acquisition_curve",
    # round-4s family
    "corpus_datacard", "nation_value_percentiles",
    "top_decile_share_by_source",
    # round-4t family
    "source_fp_overlap", "user_activity_gini", "embedding_pca_evr",
    # round-4u family
    "theil_sen_daily_trend", "spearman_qty_price",
    # round-4v family
    "fuzzy_decontam_rate", "reorder_survival",
    # round-4w family
    "tokens_chars_ols", "source_js_matrix", "candidate_jaccard_hist",
    # round-4x family
    "split_embedding_drift", "hubness_census",
    # round-4y family
    "shuffle_autocorr", "dp_source_counts", "quality_dup_lift",
    # round-4z family
    "value_psi_weekly", "glove_cooc_topk",
    # round-4aa family
    "dow_seasonality", "lineitem_fanout_hist",
    "event_markov_stationary",
    # round-4ab family
    "source_length_wasserstein", "cluster_silhouette",
    # round-4ac family
    "median_user_value_by_type", "revenue_drawdown",
    "markov_entropy_rate",
    # round-4ad family
    "bounce_rate", "negative_sampling_table", "funnel_latency",
    # round-4ae family
    "casefold_dup_gain", "bow_dup_census",
    # round-4af family
    "audience_overlap", "sentence_length_profile",
    # round-5a family
    "repetition_census", "ccnet_buckets",
    # round-5b family
    "substring_dup_pairs", "winnow_threshold_curve",
    # round-5c family
    "anchor_stride_recall", "join_size_estimate",
    # round-5d family
    "heldout_perplexity",
    # round-5e/5f families
    "pq_distortion", "pq_adc_recall",
    # round-5g family
    "ngram_coverage_curve", "unicode_nfc_census",
    # round-5h family
    "semantic_decontam",
    # round-5i family
    "norm_label_auc", "welch_ttest",
    # round-5j family
    "mmr_rerank",
    # round-5k family
    "winnow_param_grid",
    # round-5l family
    "rrf_fusion",
    # round-5m family
    "dedup_lm_ab",
    # round-5n family
    "session_gap_grid",
    # round-5o family
    "decontam_lm_ab",
    # round-5p family
    "quality_lm_ab",
    # round-5q family
    "jackknife_variance",
    # round-4 perf-gated fixes (driver-visible walls for the record)
    "top_customers", "loyal_users", "user_type_breadth",
    "winnow_dup_pairs", "dup_components",
]


def ensure_bench_corpus(tag: str) -> str:
    """Parallel-generated (no golden) corpus for the bench scale."""
    from pdf_oxide_ray.gen.cache import CACHE_ROOT, SF_CONVS
    from pdf_oxide_ray.gen.parallel import write_corpus_parallel

    out = os.path.join(CACHE_ROOT, f"{tag}-s42-bench")
    marker = os.path.join(out, "_complete")
    if os.path.exists(marker):
        return os.path.join(out, "transcripts")
    path = write_corpus_parallel(out, SF_CONVS[tag], seed=42)
    with open(marker, "w") as f:
        f.write("ok\n")
    return path


def _memcpy_gb_s(budget_sec: float = 1.5) -> float:
    """Host memory-bandwidth probe (single-proc 50 MB numpy copies for
    ~budget_sec). This box's co-tenants saturate the memory BUS while
    every CPU metric reads idle (measured 0.09-1.4 GB/s swings against
    a healthy >10 GB/s); the flagship kernel is memory-bound, so this
    one number contextualizes any wall-time in this report."""
    import numpy as np

    a = np.empty(50_000_000, dtype=np.uint8)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_sec:
        _ = a.copy()
        n += 1
    return round(n * 0.05 / (time.perf_counter() - t0), 3)


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from pdf_oxide_ray.gen.cache import tag_for_sf_dir
    from pdf_oxide_ray.pipelines.flagship import run_flagship_job

    tag = tag_for_sf_dir(SF_DIR)
    corpus = ensure_bench_corpus(tag)

    # warm OS page cache (untimed): one full read of the input
    import pyarrow.dataset as pads

    n_turns = sum(f.count_rows() for f in
                  pads.dataset(corpus).get_fragments())

    # headline: phased flagship job (skinny-shuffle assembly; the fat
    # extracted bytes never cross an exchange) ending in the production
    # parquet sink — the driver never materializes the output
    import shutil
    import tempfile

    # median of 5 runs (r02 lesson: this box shows up to 1.8-2x
    # run-to-run spread from background load — median-of-5 keeps one
    # loaded window from setting the record) — flagship-only mode keeps
    # a single run for the scaling subprocesses where fresh-process
    # cost dominates anyway
    n_runs = 1 if os.environ.get("GRAFT_BENCH_FLAGSHIP_ONLY") == "1" else 5
    bw_before = _memcpy_gb_s()
    if n_runs > 1:
        # one UNTIMED warmup: the first run pays FS-cache + plasma +
        # worker-import cold start (measured 14.8s/18.1s vs 13.3s/13.5s
        # for run 2 on the same build) — standard bench hygiene, the
        # timed runs measure the code, not the page cache
        out_dir = tempfile.mkdtemp(prefix="bench_flagship_", dir="/tmp")
        run_flagship_job(corpus, out_dir, keep_spans=True,
                         want_markdown=True)
        shutil.rmtree(out_dir, ignore_errors=True)
    walls = []
    summary = None
    for _ in range(n_runs):
        out_dir = tempfile.mkdtemp(prefix="bench_flagship_", dir="/tmp")
        t0 = time.perf_counter()
        summary = run_flagship_job(corpus, out_dir, keep_spans=True,
                                   want_markdown=True)
        walls.append(time.perf_counter() - t0)
        shutil.rmtree(out_dir, ignore_errors=True)
    headline = sorted(walls)[len(walls) // 2]
    bw_after = _memcpy_gb_s()
    rows = summary["rows"]

    timings: dict[str, float] = {
        "flagship_extract": round(headline, 3),
        "flagship_phase_extract": summary["sec_extract"],
        "flagship_phase_offsets": summary["sec_offsets"],
        "flagship_phase_annotate_write": summary["sec_annotate_write"],
    }

    from pdf_oxide_ray.queries import QUERIES

    flagship_only = os.environ.get("GRAFT_BENCH_FLAGSHIP_ONLY") == "1"
    for name in ([] if flagship_only else BENCH_QUERIES):
        try:
            # best-of-3: this host's load swings single-shot walls by
            # 2-4x (measured); the min is the stable capability signal
            walls_q = []
            for _ in range(3):
                t0 = time.perf_counter()
                QUERIES[name](SF_DIR)
                walls_q.append(time.perf_counter() - t0)
            timings[name] = round(min(walls_q), 3)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"bench query {name} failed: {exc}", file=sys.stderr)

    result = {
        "metric": "flagship extraction+assembly wall time "
                  f"({tag} synthetic transcripts corpus)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": tag,
        "num_cpus": NUM_CPUS,
        "turns": rows,
        "turns_per_sec": round(rows / headline, 1),
        "flagship_runs_sec": [round(w, 3) for w in walls],
        "input_turns": n_turns,
        # host memory-bus state around the flagship runs (healthy > 10;
        # see BASELINE.md "decisive host-noise measurement")
        "host_memcpy_gb_s_before": bw_before,
        "host_memcpy_gb_s_after": bw_after,
    }
    ray.shutdown()
    return result


def _hardware_ceiling(lo: int, hi: int) -> dict:
    """No-Ray calibration: the SAME extraction kernel over the same kind of
    payloads via plain multiprocessing at lo and hi processes. On this
    sandbox the allocation-heavy kernel saturates the memory subsystem well
    before 32 procs (a register-bound loop scales fine) — so the ceiling is
    a property of the box, not of the Ray pipeline. Normalizing the
    pipeline's efficiency by this ceiling isolates the orchestration cost."""
    import multiprocessing as mp

    import pyarrow.dataset as pads

    from pdf_oxide_ray.gen.cache import transcripts_path

    path = transcripts_path("sf0.01", with_golden=False)
    payloads = pads.dataset(path).to_table(
        columns=["text"]).column("text").to_pylist()[:4000]

    def timed(nproc: int) -> float:
        t0 = time.perf_counter()
        with mp.Pool(nproc, initializer=_calib_init,
                     initargs=(payloads,)) as pool:
            pool.map(_calib_work, [(i, nproc) for i in range(nproc)])
        return time.perf_counter() - t0

    t_lo, t_hi = timed(lo), timed(hi)
    return {"sec_lo": round(t_lo, 3), "sec_hi": round(t_hi, 3),
            "ceiling_efficiency": round((t_lo / t_hi) / (hi / lo), 3)}


_CALIB_PAYLOADS: list = []


def _calib_init(payloads: list) -> None:
    global _CALIB_PAYLOADS
    _CALIB_PAYLOADS = payloads


def _calib_work(args: tuple) -> int:
    from pdf_oxide_ray.core.payload import extract_payload

    chunk_id, nproc = args
    n = 0
    for p in _CALIB_PAYLOADS[chunk_id::nproc]:
        extract_payload(p)
        n += 1
    return n


def run_scaling() -> dict:
    """Two N-vs-4N pairs in fresh processes on the same input.

    (2, 8): below this box's memory-bus saturation point — the honest
    proxy for multi-node scaling, where adding nodes multiplies memory
    buses and per-node parallelism stays constant.
    (8, 32): shares ONE memory bus across 4x workers — a regime a real
    cluster never enters; reported with the no-Ray multiprocessing
    hardware ceiling so the orchestration cost is isolated from the
    box's bandwidth wall.
    """
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_FLAGSHIP_ONLY="1")
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    results = {r: run(r) for r in (2, 8, 32)}
    t2, t8, t32 = (results[r]["value"] for r in (2, 8, 32))
    eff_2_8 = (t2 / t8) / 4
    eff_8_32 = (t8 / t32) / 4
    hw = _hardware_ceiling(8, 32)
    hw_2_8 = _hardware_ceiling(2, 8)
    return {
        "metric": "scaling efficiency (flagship extraction, fresh "
                  "processes, same input; pairs 2->8 and 8->32 cpus)",
        "sec_2": t2,
        "sec_8": t8,
        "sec_32": t32,
        "turns_per_sec_2": results[2]["turns_per_sec"],
        "turns_per_sec_8": results[8]["turns_per_sec"],
        "turns_per_sec_32": results[32]["turns_per_sec"],
        "scaling_efficiency_2_8": round(eff_2_8, 3),
        "scaling_efficiency_8_32": round(eff_8_32, 3),
        "scaling_efficiency": round(eff_2_8, 3),
        "scaling_efficiency_note": (
            "unsuffixed key = the 2->8 pair (below this box's memory-bus "
            "saturation, the multi-node proxy); round-1 reported the 8->32 "
            "pair under this key — use the explicit _2_8/_8_32 keys for "
            "cross-round comparison"),
        "hardware_ceiling_2_8": hw_2_8,
        "normalized_efficiency_2_8": round(
            min(eff_2_8 / hw_2_8["ceiling_efficiency"], 1.0), 3)
        if hw_2_8["ceiling_efficiency"] else None,
        "hardware_ceiling_8_32": hw,
        "normalized_efficiency_8_32": round(
            min(eff_8_32 / hw["ceiling_efficiency"], 1.0), 3)
        if hw["ceiling_efficiency"] else None,
        "sf": results[32]["sf"],
        "turns": results[32]["turns"],
    }


def run_stats() -> None:
    """--stats: one flagship pass, then dump Ray Data's per-operator
    stats (wall, blocks, memory) — the evidence loop the scale doctrine
    asks for ('read ds.stats() for the stage and iterate')."""
    import ray

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus,
                 include_dashboard=False)
    from pdf_oxide_ray.gen.cache import tag_for_sf_dir
    from pdf_oxide_ray.pipelines.flagship import run_flagship

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    path = ensure_bench_corpus(tag_for_sf_dir(sf_dir))
    ds = run_flagship(path, keep_spans=False).materialize()
    print(ds.stats())
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--stats" in sys.argv:
        run_stats()
    else:
        print(json.dumps(run_bench()))
