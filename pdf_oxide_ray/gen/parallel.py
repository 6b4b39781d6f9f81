"""Ray-parallel corpus generation (for bench-scale corpora).

Generation is pure per-(seed, conv_id, turn) — so it parallelizes trivially:
``ray.data.range(n_convs)`` -> ``map_batches(build conv rows)`` ->
``write_parquet``. Byte-level row content is identical to the single-process
generator (same per-turn RNG derivation); only file layout/row order differ,
which the pipeline must not depend on anyway (turns are shuffled by design).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA, conv_rows as _conv_rows


class _GenBatch:
    def __init__(self, seed: int, median_turns: int):
        self.seed = seed
        self.median_turns = median_turns

    def __call__(self, batch: dict) -> pa.Table:
        conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
        for idx in batch["id"].tolist():
            for row in _conv_rows(int(idx), self.seed, self.median_turns):
                conv_ids.append(row[0])
                turn_idxs.append(row[1])
                roles.append(row[2])
                texts.append(row[3])
                tools.append(row[4])
                tss.append(row[5])
        # deterministic within-block shuffle (turn order must be restored
        # downstream; FIXTURES.md writes turns shuffled)
        order = np.random.RandomState(
            self.seed + (int(batch["id"][0]) if len(batch["id"]) else 0)
        ).permutation(len(conv_ids))
        return pa.table({
            "conv_id": pa.array([conv_ids[j] for j in order], pa.string()),
            "turn_idx": pa.array([turn_idxs[j] for j in order], pa.int32()),
            "role": pa.array([roles[j] for j in order], pa.string()),
            "text": pa.array([texts[j] for j in order], pa.string()),
            "tool": pa.array([tools[j] for j in order], pa.string()),
            "ts": pa.array([tss[j] for j in order], pa.timestamp("us")),
        }, schema=TRANSCRIPT_SCHEMA)


def write_corpus_parallel(out_dir: str, n_convs: int, seed: int = 42,
                          median_turns: int = 6) -> str:
    """Generate the transcripts corpus with Ray; returns the parquet dir."""
    import os

    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    ds = rd.range(n_convs, override_num_blocks=max(8, n_convs // 250))
    ds = ds.map_batches(_GenBatch, batch_format="numpy", batch_size=64,
                        fn_constructor_kwargs={"seed": seed,
                                               "median_turns": median_turns},
                        concurrency=(2, 16))
    path = os.path.join(out_dir, "transcripts")
    ds.write_parquet(path)
    return path
