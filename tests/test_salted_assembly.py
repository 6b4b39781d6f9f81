"""Salted assembly: hot conversations split across the shuffle must yield
offsets identical to the unsalted groupby path."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pdf_oxide_ray.stages.assembly import assemble, assemble_salted


def _synthetic_extracted(n_hot_turns: int = 500, n_cold_convs: int = 20):
    """Skewed extracted-shaped table: one hot conversation + cold ones."""
    rows = []
    rng = np.random.RandomState(7)
    for t in range(n_hot_turns):
        rows.append(("hot000", t, int(rng.randint(5, 50))))
    for c in range(n_cold_convs):
        for t in range(int(rng.randint(1, 8))):
            rows.append((f"cold{c:03d}", t, int(rng.randint(5, 50))))
    rng.shuffle(rows)
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "n_chars": pa.array([r[2] for r in rows], pa.int64()),
    })


def test_salted_matches_unsalted(ray_session):
    tbl = _synthetic_extracted()
    ds = rd.from_arrow(tbl).repartition(8).materialize()

    plain = assemble(ds).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    salted = assemble_salted(ds, hot_turns_threshold=100,
                             salt_span=64).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    assert len(plain) == len(salted)
    for col in ("conv_id", "turn_idx", "turn_offset", "conv_turns"):
        assert (plain[col] == salted[col]).all(), col


def test_salt_actually_splits_hot_conversation(ray_session):
    # with threshold 100 and span 64, the 500-turn conv produces 8 salts
    tbl = _synthetic_extracted()
    ds = rd.from_arrow(tbl).repartition(4).materialize()
    out = assemble_salted(ds, hot_turns_threshold=100, salt_span=64)
    df = out.to_pandas()
    hot = df[df["conv_id"] == "hot000"].sort_values("turn_idx")
    # offsets strictly increasing across salt boundaries
    assert (np.diff(hot["turn_offset"].to_numpy()) > 0).all()
    assert hot["conv_turns"].eq(500).all()
