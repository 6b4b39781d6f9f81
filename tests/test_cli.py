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
