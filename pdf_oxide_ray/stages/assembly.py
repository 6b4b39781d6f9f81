"""Conversation assembly: the only required shuffle (SURVEY.md §2.7).

Restores stable ``(conv_id, turn_idx)`` ordering after the embarrassingly
parallel extract stage and computes per-turn character offsets into the
concatenated conversation text — the distributed analogue of the reference's
multi-page concat in page order (``to_markdown_all`` / ``to_plain_text_all``,
``/root/reference/src/document.rs:2317-2333,2366-2382``).

Shuffle plan: ``groupby("conv_id")`` hash-partitions by conversation (the
ONE partitioning key reused across stages); within each group an Arrow-level
sort by ``turn_idx`` restores order — no global sort. Skew note: extraction
is per-turn so hot conversations cost nothing there; in assembly a group is
one conversation (bounded by turns-per-conv, not corpus size). For
pathological conversations (millions of turns) the group fits because only
(turn_idx, n_chars)-sized state is needed to compute offsets — text stays in
the rows. TURN_SEPARATOR joins turns when a caller materializes full
conversation text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TURN_SEPARATOR = "\n\n"


def assemble_conversation(group: pa.Table) -> pa.Table:
    """Per-group (one conversation): sort by turn_idx, compute offsets.

    Stays in Arrow end-to-end — the wide ``spans`` list<struct> column does
    not survive a pandas round-trip (object-dtype ndarrays), and zero-copy
    Arrow sort is cheaper anyway.

    Adds ``turn_offset`` (char offset of this turn's text within the
    ``TURN_SEPARATOR``-joined conversation text) and ``conv_turns``.
    """
    group = group.sort_by("turn_idx")
    n_chars = group.column("n_chars").to_numpy().astype(np.int64)
    sep = len(TURN_SEPARATOR)
    ends = np.cumsum(n_chars + sep)
    offsets = np.concatenate(([0], ends[:-1]))
    group = group.append_column("turn_offset", pa.array(offsets, pa.int64()))
    return group.append_column(
        "conv_turns",
        pa.array(np.full(len(n_chars), len(n_chars), dtype=np.int32)))


def assemble(ds, batch_format: str = "pyarrow"):
    """``extracted`` Dataset -> per-turn rows in stable conversation order."""
    return ds.groupby("conv_id").map_groups(
        assemble_conversation, batch_format=batch_format)


def compute_offsets_skinny(group: pa.Table) -> pa.Table:
    """Per-conversation offsets from SKINNY columns only (conv_id,
    turn_idx, n_chars) — the cheap half of assembly used by the phased
    production job (see ``state/offset_index.py``). Same offset math as
    ``assemble_conversation``."""
    group = group.sort_by("turn_idx")
    n_chars = group.column("n_chars").to_numpy().astype(np.int64)
    sep = len(TURN_SEPARATOR)
    ends = np.cumsum(n_chars + sep)
    offsets = np.concatenate(([0], ends[:-1]))
    return pa.table({
        "conv_id": group.column("conv_id"),
        "turn_idx": group.column("turn_idx"),
        "turn_offset": pa.array(offsets, pa.int64()),
        "conv_turns": pa.array(
            np.full(len(n_chars), len(n_chars), dtype=np.int32)),
    })


def conversation_text(group: pd.DataFrame) -> pd.DataFrame:
    """Optional rollup: one row per conversation with the joined text
    (used by tests / small exports, not the 100 TB path)."""
    group = group.sort_values("turn_idx", kind="mergesort")
    return pd.DataFrame({
        "conv_id": [group["conv_id"].iloc[0]],
        "n_turns": [len(group)],
        "conversation_text": [TURN_SEPARATOR.join(group["extracted_text"])],
    })
