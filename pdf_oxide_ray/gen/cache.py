"""Cached deterministic corpora under /tmp (generation is pure-seeded, so a
cache hit is byte-identical to a regeneration)."""

from __future__ import annotations

import os

from .transcripts import write_corpus

# bump when extraction semantics change (golden tables must regenerate)
CORPUS_VERSION = 9

CACHE_ROOT = os.environ.get(
    "PDF_OXIDE_RAY_CACHE", f"/tmp/pdf_oxide_ray_corpora_v{CORPUS_VERSION}")

# scale-factor -> conversation count (~6 turns median => ~8x turns w/ skew)
SF_CONVS = {
    "sf0.001": 160,     # ~1.1k turns
    "sf0.01": 1600,     # ~11k turns
    "sf0.1": 16000,     # ~110k turns
}


def corpus_dir(tag: str, *, with_golden: bool, seed: int = 42) -> str:
    n_convs = SF_CONVS.get(tag)
    if n_convs is None:
        raise ValueError(f"unknown corpus tag {tag}; use one of {sorted(SF_CONVS)}")
    suffix = "g" if with_golden else "ng"
    out = os.path.join(CACHE_ROOT, f"{tag}-s{seed}-{suffix}")
    marker = os.path.join(out, "_complete")
    if os.path.exists(marker):
        return out
    write_corpus(out, n_convs, seed=seed, with_golden=with_golden)
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


def transcripts_path(tag: str, *, with_golden: bool = False,
                     seed: int = 42) -> str:
    return os.path.join(corpus_dir(tag, with_golden=with_golden, seed=seed),
                        "transcripts.parquet")


def golden_path(tag: str, seed: int = 42) -> str:
    return os.path.join(corpus_dir(tag, with_golden=True, seed=seed),
                        "golden.parquet")


def tag_for_sf_dir(sf_dir: str) -> str:
    """Map a /root/testdata/sfX dir to the matching corpus scale tag."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base in SF_CONVS else "sf0.01"
