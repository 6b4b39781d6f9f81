"""Corpus metrics rollups + crash-recovery semantics of the partitioned
extraction phase."""

import json
import os
import shutil

import pyarrow.dataset as pads

from pdf_oxide_ray.gen.cache import transcripts_path
from pdf_oxide_ray.pipelines.flagship import (
    extract_dataset,
    read_transcripts,
    run_extraction_partitioned,
)
from pdf_oxide_ray.pipelines.metrics import (
    error_rows,
    extraction_stats,
    top_k_slowest,
)


def _extracted(ray_session):
    path = transcripts_path("sf0.001", with_golden=False)
    return extract_dataset(read_transcripts(path), want_markdown=False,
                           keep_spans=False)


def test_extraction_stats_rollup(ray_session):
    stats = extraction_stats(_extracted(ray_session))
    assert set(stats["kind"]) <= {"pdf", "html", "plain"}
    assert (stats["success_rate"] == 1.0).all()
    assert (stats["n"] > 0).all()
    assert (stats["mean_duration_us"] > 0).all()


def test_top_k_slowest(ray_session):
    top = top_k_slowest(_extracted(ray_session), k=5)
    assert len(top) == 5
    d = top["duration_us"].to_numpy()
    assert (d[:-1] >= d[1:]).all()  # descending


def test_error_rows_empty_on_clean_corpus(ray_session):
    assert len(error_rows(_extracted(ray_session))) == 0


def test_partitioned_rerun_replaces_stale_partial_output(ray_session,
                                                         tmp_path):
    """A crashed run leaves a temp dir and/or a partition dir without a
    manifest; the rerun must replace both and produce correct output."""
    path = transcripts_path("sf0.001", with_golden=False)
    out = str(tmp_path / "parts")
    os.makedirs(out)
    # simulate a crash: stale tmp dir + partition dir with garbage, NO
    # manifest (the manifest is the commit point)
    os.makedirs(os.path.join(out, ".part_id=0.tmp"))
    with open(os.path.join(out, ".part_id=0.tmp", "junk"), "w") as f:
        f.write("partial")
    os.makedirs(os.path.join(out, "part_id=1"))
    with open(os.path.join(out, "part_id=1", "garbage.parquet"), "w") as f:
        f.write("not parquet")

    summary = run_extraction_partitioned(path, out, num_shards=2,
                                         want_markdown=False,
                                         keep_spans=False)
    assert summary["skipped"] == 0
    assert summary["errors"] == 0
    total = 0
    for pid in (0, 1):
        part = os.path.join(out, f"part_id={pid}")
        manifest = os.path.join(part, "_manifest.json")
        assert os.path.exists(manifest), f"missing manifest for {pid}"
        with open(manifest) as f:
            m = json.load(f)
        assert m["status"] == "complete"
        assert "garbage.parquet" not in os.listdir(part)
        total += sum(
            f.count_rows()
            for f in pads.dataset(part).get_fragments()
            if not f.path.endswith("_manifest.json"))
    n_input = sum(f.count_rows() for f in pads.dataset(path).get_fragments())
    assert total == n_input
    shutil.rmtree(out, ignore_errors=True)
