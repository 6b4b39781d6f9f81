"""Per-partition lineage manifests + resume-skip (north rule).

Ray Data gives task retries, not job-level resume (SURVEY.md §4); this
layout is ours: the extraction phase is sharded by INPUT (file groups — at
100 TB each shard is a set of parquet files; locally, row-range splits of
one file). Each shard writes to ``out/part_id=N/`` and then atomically
(temp + rename) writes ``_manifest.json`` carrying lineage (input fragment
list), row/error counts, an order-insensitive content hash and throughput.
On resume, shards with a valid manifest are skipped.
"""

from __future__ import annotations

import json
import os
import time

MANIFEST_NAME = "_manifest.json"


def partition_dir(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, f"part_id={part_id}")


def manifest_path(out_dir: str, part_id: int) -> str:
    return os.path.join(partition_dir(out_dir, part_id), MANIFEST_NAME)


def is_partition_complete(out_dir: str, part_id: int) -> bool:
    path = manifest_path(out_dir, part_id)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            m = json.load(f)
        return m.get("status") == "complete"
    except (json.JSONDecodeError, OSError):
        return False


def write_manifest(out_dir: str, part_id: int, *, inputs: list[str],
                   rows: int, errors: int, n_chars: int,
                   content_hash: int, wall_sec: float) -> dict:
    """Atomic write: temp file + rename (same-directory rename is atomic on
    POSIX)."""
    pdir = partition_dir(out_dir, part_id)
    os.makedirs(pdir, exist_ok=True)
    manifest = {
        "status": "complete",
        "part_id": part_id,
        "inputs": inputs,
        "rows": rows,
        "errors": errors,
        "n_chars": n_chars,
        "content_hash": content_hash,
        "wall_sec": round(wall_sec, 3),
        "rows_per_sec": round(rows / wall_sec, 1) if wall_sec > 0 else None,
        "written_unix": time.time(),
    }
    tmp = os.path.join(pdir, f".{MANIFEST_NAME}.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(pdir, MANIFEST_NAME))
    return manifest


def read_manifests(out_dir: str) -> list[dict]:
    out = []
    if not os.path.isdir(out_dir):
        return out
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("part_id="):
            try:
                part_id = int(name.split("=", 1)[1])
            except ValueError:
                continue
            path = manifest_path(out_dir, part_id)
            if os.path.exists(path):
                try:
                    with open(path) as f:
                        out.append(json.load(f))
                except (json.JSONDecodeError, OSError):
                    continue
    return out
