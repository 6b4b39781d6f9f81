"""Corpus metrics rollups — the distributed analogue of the reference's
benchmark/validation folds.

Reference parity (SURVEY.md §2.7): ``benchmark_all_pdfs.rs:84-230`` folds
counts / success rate / total+avg duration / text length / top-10 slowest
over a sequential file loop; ``validate_dataset.rs:31-141`` adds
per-category rollups. Here the fold is ``map_batches`` partials ->
``groupby().aggregate()`` (one row per kind per batch crosses the shuffle)
and top-k is ``sort + limit``.
"""

from __future__ import annotations

import pandas as pd
from ray.data.aggregate import Sum


def extraction_stats(extracted_ds) -> pd.DataFrame:
    """Per payload-kind rollup over an extracted Dataset: counts, error
    rate, total/mean duration, total chars (benchmark_all_pdfs.rs:84-230
    shape)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.assign(is_err=(b["status"] == "error").astype("int64")) \
            .groupby("kind", as_index=False).agg(
                n=("status", "size"),
                n_errors=("is_err", "sum"),
                duration_us=("duration_us", "sum"),
                total_chars=("n_chars", "sum"),
                total_spans=("n_spans", "sum"))
        return g

    agg = extracted_ds.select_columns(
        ["kind", "status", "duration_us", "n_chars", "n_spans"]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby("kind").aggregate(
            Sum("n", alias_name="n"),
            Sum("n_errors", alias_name="n_errors"),
            Sum("duration_us", alias_name="duration_us"),
            Sum("total_chars", alias_name="total_chars"),
            Sum("total_spans", alias_name="total_spans")).to_pandas()
    agg["success_rate"] = 1.0 - agg["n_errors"] / agg["n"]
    agg["mean_duration_us"] = agg["duration_us"] / agg["n"]
    return agg


def top_k_slowest(extracted_ds, k: int = 10) -> pd.DataFrame:
    """Top-k slowest turns (benchmark_all_pdfs.rs:209-227). Deterministic
    tiebreak on (conv_id, turn_idx)."""
    return extracted_ds.select_columns(
        ["conv_id", "turn_idx", "kind", "duration_us", "n_chars"]) \
        .sort(["duration_us", "conv_id", "turn_idx"],
              descending=[True, False, False]) \
        .limit(k).to_pandas()


def error_rows(extracted_ds, limit: int = 1000) -> pd.DataFrame:
    """The failed-list output (benchmark_all_pdfs.rs failed_files).
    Vectorized expression filter — a per-row Python predicate would run
    once per row (ray_guide pitfall #1)."""
    return extracted_ds.filter(expr="status == 'error'") \
        .select_columns(["conv_id", "turn_idx", "kind", "error"]) \
        .limit(limit).to_pandas()


def quality_tails(extracted_ds) -> pd.DataFrame:
    """Regression-suite quality tails over an extracted corpus — the
    distributed analogue of the reference's known-issue metrics
    (``docs/REGRESSION_TEST_SUITE.md:3-97``: % empty output, % containing
    U+FFFD, % containing control chars). One partial row per batch
    crosses the exchange."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b["extracted_text"].fillna("")
        return pd.DataFrame({
            "n": [int(len(t))],
            "n_empty": [int((t.str.strip() == "").sum())],
            "n_replacement": [int(t.str.contains("�").sum())],
            "n_control": [int(t.str.contains(
                r"[\x00-\x08\x0b\x0c\x0e-\x1f]", regex=True).sum())],
        })

    agg = extracted_ds.select_columns(["extracted_text"]) \
        .map_batches(partial, batch_format="pandas") \
        .sum(["n", "n_empty", "n_replacement", "n_control"])
    n = max(int(agg["sum(n)"]), 1)
    return pd.DataFrame([{
        "n_rows": int(agg["sum(n)"]),
        "pct_empty": round(100.0 * agg["sum(n_empty)"] / n, 3),
        "pct_replacement_char": round(
            100.0 * agg["sum(n_replacement)"] / n, 3),
        "pct_control_chars": round(100.0 * agg["sum(n_control)"] / n, 3),
    }])
