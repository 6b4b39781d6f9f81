"""Phased production job (run_flagship_job): parity with the lazy
groupby pipeline and with the golden oracle, for BOTH offsets paths
(driver-broadcast and sharded index actors)."""

import shutil

import pyarrow.dataset as pads
import pytest

from pdf_oxide_ray.gen.cache import transcripts_path
from pdf_oxide_ray.pipelines.flagship import run_flagship, run_flagship_job

CMP_COLS = ["conv_id", "turn_idx", "extracted_text", "markdown", "n_chars",
            "turn_offset", "conv_turns", "status"]


def _normalize(df):
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def lazy_result(ray_session):
    path = transcripts_path("sf0.001", with_golden=False)
    return _normalize(run_flagship(path).to_pandas())


@pytest.mark.parametrize("threshold,label", [
    (5_000_000, "broadcast"),
    (0, "index_actors"),
])
def test_job_matches_lazy_pipeline(ray_session, tmp_path, lazy_result,
                                   threshold, label):
    path = transcripts_path("sf0.001", with_golden=False)
    out = str(tmp_path / f"job_{label}")
    shutil.rmtree(out, ignore_errors=True)
    summary = run_flagship_job(path, out,
                               broadcast_threshold_rows=threshold)
    assert summary["rows"] == len(lazy_result)
    job = _normalize(pads.dataset(out).to_table().to_pandas())
    assert len(job) == len(lazy_result)
    for col in CMP_COLS:
        assert (job[col] == lazy_result[col]).all(), f"{label}: {col}"
    # every row annotated (no -1 leftovers from a missed lookup)
    assert (job["turn_offset"] >= 0).all()
    assert (job["conv_turns"] > 0).all()
