"""CLI entry points (`ray job submit` surface) driven as subprocesses.

Each CLI invocation owns its own local Ray session (the guarded
``_ensure_ray``), independent of the test session's cluster."""

import json
import os
import subprocess
import sys

import pytest

from pdf_oxide_ray.gen.cache import transcripts_path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(*args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-m", "pdf_oxide_ray.cli", *args],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout.strip().splitlines()[-1]


@pytest.mark.slow
def test_cli_flagship_and_metrics(tmp_path):
    src = transcripts_path("sf0.001", with_golden=False)
    out_dir = str(tmp_path / "flag")
    summary = json.loads(_run_cli("flagship", "--input", src,
                                  "--output", out_dir, "--no-spans"))
    assert summary["rows"] > 0
    assert summary["errors"] == 0
    assert os.path.isdir(out_dir)

    metrics = json.loads(_run_cli("metrics", "--input", out_dir))
    kinds = {row["kind"] for row in metrics["stats"]}
    assert kinds <= {"pdf", "html", "plain"}
    assert len(metrics["top_slowest"]) == 10


@pytest.mark.slow
def test_cli_export_and_validate(tmp_path):
    import pyarrow.dataset as pads

    src = transcripts_path("sf0.001", with_golden=False)
    for fmt in ("text", "markdown", "html"):
        out = str(tmp_path / f"exp_{fmt}")
        json.loads(_run_cli("export", "--input", src, "--output", out,
                            "--format", fmt))
        t = pads.dataset(out).to_table()
        assert t.num_rows > 0
        assert set(t.schema.names) == {"conv_id", "turn_idx", "content",
                                       "status"}
        if fmt == "html":
            body = "".join(t.column("content").to_pylist()[:200])
            assert "<h1>" in body or "<p>" in body

    # JSONL sink: line-delimited records a training loader can stream
    out_jl = str(tmp_path / "exp_jsonl")
    summary = json.loads(_run_cli("export", "--input", src, "--output",
                                  out_jl, "--format", "text",
                                  "--sink", "jsonl"))
    assert summary["sink"] == "jsonl"
    files = [f for f in os.listdir(out_jl) if f.endswith(".json")]
    assert files
    with open(os.path.join(out_jl, files[0])) as f:
        rec = json.loads(f.readline())
    assert {"conv_id", "turn_idx", "content", "status"} <= set(rec)

    flag_out = str(tmp_path / "flag")
    _run_cli("flagship", "--input", src, "--output", flag_out, "--no-spans")
    tails = json.loads(_run_cli("validate", "--input", flag_out))
    assert tails["n_rows"] > 0
    assert tails["pct_empty"] <= 100.0
    assert tails["pct_control_chars"] <= 100.0


def test_cli_diagnose(tmp_path):
    """diagnose: single-process font/encoding loupe (reference
    tools/diagnose_font_encoding.rs parity) — runs without Ray."""
    import pyarrow.parquet as pq

    src = transcripts_path("sf0.001", with_golden=False)
    t = pq.read_table(src).to_pandas()
    pdf_rows = t[t["text"].str.lstrip().str.startswith("%PDF")]
    assert len(pdf_rows) > 0
    p = tmp_path / "one.pdf"
    p.write_bytes(pdf_rows.iloc[0]["text"].encode("latin-1",
                                                  errors="replace"))
    out = subprocess.run(
        [sys.executable, "-m", "pdf_oxide_ray.cli", "diagnose",
         "--input", str(p), "--page", "0"],
        capture_output=True, text=True, cwd=REPO, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout)
    assert rep["n_pages"] >= 1 and rep["n_spans"] > 0
    assert rep["spans"][0]["char_codes"]
    assert rep["fonts"]
    assert isinstance(rep["text_head"], str) and rep["text_head"]
