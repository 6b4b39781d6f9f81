"""Flagship pipeline (north rule):

``read_parquet(transcripts) -> map_batches(ExtractTurns actor pool,
batch_format="pyarrow") -> groupby(conv_id) / in-group sort(turn_idx) ->
per-turn rows with offsets -> write_parquet(out/part_id=N/) + per-partition
_manifest.json``.

The Ray-Data re-expression of the reference's EP3 batch loop
(``/root/reference/src/bin/benchmark_all_pdfs.rs:41-230``): directory walk ->
``read_parquet``; sequential per-file body -> actor-pool ``map_batches``;
stats fold -> ``groupby().aggregate()``; JSON summary -> partition manifests.

Scale notes (100 TB design):
* extraction is stateless-per-row behind a warm actor pool; no shuffle;
* the ONLY all-to-all exchange is the conv_id groupby in ``assemble``;
* resumability: the extract phase is sharded by input file groups; each
  shard writes ``part_id=N`` + an atomic manifest; reruns skip complete
  shards (``state/manifest.py``);
* nothing materializes the full dataset: outputs stream to parquet; the
  driver only ever sees small aggregates.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..stages.assembly import assemble
from ..stages.extract import ExtractTurns
from ..state.manifest import is_partition_complete, write_manifest

DEFAULT_BATCH_SIZE = 128  # rows per batch: payloads are ~1-4 KB documents
TARGET_BLOCK_BYTES = 64 * 1024 * 1024  # cap block size at scale


def tune_for_pipeline() -> None:
    """Session-level knobs measured on this workload (sf0.1, 32 cpus):
    push-based sort shuffle cut the conv_id groupby exchange from ~50s to
    ~6s self-time (the pull-based exchange drowned in per-object overhead
    at 256 blocks x 256 partitions)."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED


def _plan_num_blocks(paths: list[str]) -> int:
    """Blocks ~ max(2-3x cores, input/64MB): enough waves to pipeline the
    actor pool without flooding the shuffle with tiny blocks (measured:
    64-96 blocks optimal at 32 cpus / 132k turns; 192 blocks 2x slower)."""
    import ray

    total_cpus = int(ray.cluster_resources().get("CPU", 8)) if \
        ray.is_initialized() else 8
    try:
        input_bytes = sum(os.path.getsize(p) for p in paths)
    except OSError:
        input_bytes = 0
    return max(2 * total_cpus, input_bytes // TARGET_BLOCK_BYTES or 1)


def read_transcripts(path: str, columns: list[str] | None = None):
    """``path`` is a parquet/JSONL file, a directory, or a glob.

    Parquet is the production format (column pruning + row groups);
    JSONL (.jsonl/.json) is accepted as a convenience source for raw
    conversation dumps — projected down to ``columns`` right after the
    read since JSON cannot prune at the scan."""
    if os.path.isdir(path):
        paths = sorted(glob.glob(os.path.join(path, "*.parquet"))) or \
            sorted(glob.glob(os.path.join(path, "*.jsonl"))) or \
            sorted(glob.glob(os.path.join(path, "*.json")))
    elif any(ch in path for ch in "*?["):
        paths = sorted(glob.glob(path))
    else:
        paths = [path]
    json_paths = [p for p in paths if p.endswith((".jsonl", ".json"))]
    if json_paths and len(json_paths) != len(paths):
        raise ValueError(
            f"mixed parquet/JSONL inputs in one read: {paths[:4]}...; "
            "point at one format per source")
    if json_paths:
        ds = rd.read_json(paths,
                          override_num_blocks=_plan_num_blocks(paths))
        if columns:
            ds = ds.select_columns(columns)
        return ds.map_batches(_cast_transcript_types,
                              batch_format="pyarrow")
    return rd.read_parquet(paths, columns=columns,
                           override_num_blocks=_plan_num_blocks(paths))


def _cast_transcript_types(batch: pa.Table) -> pa.Table:
    """Align JSON-inferred dtypes with TRANSCRIPT_SCHEMA so the two source
    formats are interchangeable downstream (JSON infers int64 for turn_idx
    and cannot represent timestamp[us] natively — it arrives as an ISO
    string or epoch-microsecond int)."""
    from ..gen.transcripts import TRANSCRIPT_SCHEMA

    for name in batch.schema.names:
        idx = TRANSCRIPT_SCHEMA.get_field_index(name)
        if idx < 0:
            continue
        want = TRANSCRIPT_SCHEMA.field(idx).type
        col = batch.column(name)
        if col.type == want:
            continue
        if pa.types.is_timestamp(want) and pa.types.is_integer(col.type):
            cast = col.cast(pa.int64()).cast(want)
        else:
            cast = col.cast(want)
        batch = batch.set_column(batch.schema.get_field_index(name),
                                 name, cast)
    return batch


def extract_dataset(ds, *, want_markdown: bool = True, keep_spans: bool = True,
                    concurrency: int | tuple[int, int] | None = None,
                    batch_size: int = DEFAULT_BATCH_SIZE,
                    use_actor_pool: bool = False):
    """transcripts Dataset -> extracted Dataset (zero-copy Arrow batches).

    Default is TASK-based ``map_batches`` with a callable-instance UDF:
    the warm tokenizer/font-cache state lives in module-level per-worker
    caches (built on first import in each worker process, reused across
    every batch that worker runs), and Ray's shared task-worker pool gives
    perfect work-stealing over skewed payloads. Measured at sf0.1/32 cpus:
    tasks 9.7s vs actor pool 18s — the pool's fixed spawn cost plus
    per-actor dispatch (no stealing) dominates for a cheap-state stage.

    ``use_actor_pool=True`` (or an explicit ``concurrency``) switches to an
    explicit actor pool — the right shape when per-worker state is
    EXPENSIVE (a model, a GPU); the multimodal stages use that mode.
    """
    if use_actor_pool or concurrency is not None:
        if concurrency is None:
            import ray

            total = int(ray.cluster_resources().get("CPU", 8)) if \
                ray.is_initialized() else 8
            concurrency = max(1, total - 2)
        return ds.map_batches(
            ExtractTurns,
            batch_format="pyarrow",
            batch_size=batch_size,
            fn_constructor_kwargs={"want_markdown": want_markdown,
                                   "keep_spans": keep_spans},
            num_cpus=1,
            concurrency=concurrency,
        )
    return ds.map_batches(
        ExtractTurns(want_markdown=want_markdown, keep_spans=keep_spans),
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
    )


def run_flagship(input_path: str, *, want_markdown: bool = True,
                 keep_spans: bool = True,
                 concurrency: int | tuple[int, int] | None = None,
                 batch_size: int = DEFAULT_BATCH_SIZE,
                 assemble_conversations: bool = True):
    """Lazy end-to-end Dataset (consume with write_parquet/iter_batches)."""
    tune_for_pipeline()
    ds = read_transcripts(input_path)
    ds = extract_dataset(ds, want_markdown=want_markdown,
                         keep_spans=keep_spans, concurrency=concurrency,
                         batch_size=batch_size)
    if assemble_conversations:
        ds = assemble(ds)
    return ds


# ---------------------------------------------------------------------------
# phased production job: skinny shuffle, fat bytes never cross an exchange
# ---------------------------------------------------------------------------

def run_flagship_job(input_path: str, out_dir: str, *,
                     want_markdown: bool = True, keep_spans: bool = True,
                     concurrency: int | tuple[int, int] | None = None,
                     batch_size: int = DEFAULT_BATCH_SIZE,
                     broadcast_threshold_rows: int = 5_000_000) -> dict:
    """Production flagship: same output as ``run_flagship`` but the
    conversation-assembly exchange moves ONLY skinny columns.

    Phases (each streams; the checkpoint is the object store):

    1. read -> extract (actor pool) -> ``materialize()``  — the one
       checkpoint, shared by both downstream consumers (without it Ray
       Data would re-execute extraction per consumer);
    2. skinny push: ``select_columns(conv_id, turn_idx, n_chars)`` ->
       conv-hash-routed into sharded index actors
       (``state/offset_index.py``) — the hash routing IS the
       groupby(conv_id) partition step, ~2% of the bytes;
    3. ``finalize_index``: per-conversation sort(turn_idx) + prefix sum
       inside each shard (vectorized, no per-group task overhead);
    4. fat blocks -> ``map_batches(AnnotateOffsets)`` -> ``write_parquet``
       — annotation is an in-place lookup, no exchange.

    vs the fat ``groupby``: the all-to-all moves ~24 B/turn instead of
    ~1.7 KB/turn, and the non-extract share shrinks, which is what the
    N->4N scaling efficiency target needs. Returns a summary dict.
    """
    import pyarrow as _pa
    import ray

    from ..stages.assembly import TURN_SEPARATOR
    from ..state.offset_index import (AnnotateOffsets,
                                      AnnotateOffsetsBroadcast,
                                      PushTurnSizes, compute_offsets_table,
                                      create_index, finalize_index)

    tune_for_pipeline()
    t0 = time.perf_counter()
    ds = read_transcripts(input_path)
    extracted = extract_dataset(
        ds, want_markdown=want_markdown, keep_spans=keep_spans,
        concurrency=concurrency, batch_size=batch_size).materialize()
    rows = extracted.count()
    errors = extracted.select_columns(["status"]).map_batches(
        lambda b: pa.table({"e": pa.array(
            [int(np.sum(np.asarray(b.column("status")) == "error"))],
            pa.int64())}),
        batch_format="pyarrow").sum("e")
    t_extract = time.perf_counter() - t0

    # Offsets phase: below the threshold the skinny table fits the driver
    # comfortably — compute the segmented prefix sum locally and broadcast
    # the lookup (one ray.put, no RPCs). Above it, hash-sharded index
    # actors hold the map across the cluster (the 10^9+-turn path).
    t1 = time.perf_counter()
    skinny = extracted.select_columns(["conv_id", "turn_idx", "n_chars"])
    if rows <= broadcast_threshold_rows:
        skinny_tbl = _pa.concat_tables(
            ray.get(skinny.to_arrow_refs()), promote_options="default")
        lookup = compute_offsets_table(skinny_tbl, len(TURN_SEPARATOR))
        annotate = AnnotateOffsetsBroadcast(ray.put(lookup))
    else:
        total_cpus = int(ray.cluster_resources().get("CPU", 8))
        shards = create_index(min(16, max(2, total_cpus // 2)),
                              len(TURN_SEPARATOR))
        skinny.map_batches(PushTurnSizes(shards), batch_format="pyarrow",
                           batch_size=16384).sum("pushed")
        finalize_index(shards)
        annotate = AnnotateOffsets(shards)
    t_offsets = time.perf_counter() - t1

    t2 = time.perf_counter()
    final = extracted.map_batches(annotate, batch_format="pyarrow",
                                  batch_size=4096)
    final.write_parquet(out_dir)
    t_write = time.perf_counter() - t2
    return {
        "rows": rows,
        "errors": errors,
        "out_dir": out_dir,
        "sec_extract": round(t_extract, 3),
        "sec_offsets": round(t_offsets, 3),
        "sec_annotate_write": round(t_write, 3),
        "sec_total": round(time.perf_counter() - t0, 3),
    }


# ---------------------------------------------------------------------------
# sharded, resumable extraction phase
# ---------------------------------------------------------------------------

def _conv_hash(conv_ids: list[str]) -> np.ndarray:
    return np.fromiter((zlib.crc32(c.encode()) for c in conv_ids),
                       dtype=np.uint32, count=len(conv_ids))


def _add_row_hash(batch: pa.Table) -> pa.Table:
    """Order-insensitive per-row content hash for manifest lineage."""
    texts = batch.column("extracted_text").to_pylist()
    convs = batch.column("conv_id").to_pylist()
    idxs = batch.column("turn_idx").to_pylist()
    hashes = [
        zlib.crc32(f"{c}\x00{i}\x00".encode() + (t or "").encode())
        for c, i, t in zip(convs, idxs, texts)
    ]
    return batch.append_column("row_hash", pa.array(hashes, pa.uint32()))


def plan_shards(input_path: str, num_shards: int) -> list[dict]:
    """Shard the input for resumable processing.

    With >= num_shards files, shards are FILE GROUPS (the 100 TB layout:
    lineage = the file list). With fewer files (local testing), shards are
    conv_id-hash slices of the whole input (lineage = the predicate).
    """
    if os.path.isdir(input_path):
        files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    else:
        files = sorted(glob.glob(input_path)) or [input_path]
    if len(files) >= num_shards:
        chunks = [sorted(files[i::num_shards]) for i in range(num_shards)]
        return [{"part_id": i, "files": chunk, "mode": "files"}
                for i, chunk in enumerate(chunks) if chunk]
    return [{"part_id": i, "files": files, "mode": "conv_hash",
             "num_shards": num_shards} for i in range(num_shards)]


def run_extraction_partitioned(input_path: str, out_dir: str, *,
                               num_shards: int = 8,
                               want_markdown: bool = True,
                               keep_spans: bool = True,
                               concurrency: int | tuple[int, int] | None = None,
                               batch_size: int = DEFAULT_BATCH_SIZE) -> dict:
    """Resumable extract phase: per-shard parquet + manifest; skip complete
    shards on rerun. Returns summary with per-shard stats."""
    os.makedirs(out_dir, exist_ok=True)
    shards = plan_shards(input_path, num_shards)
    summary = {"shards": [], "skipped": 0, "rows": 0, "errors": 0}
    for shard in shards:
        pid = shard["part_id"]
        if is_partition_complete(out_dir, pid):
            summary["skipped"] += 1
            continue
        t0 = time.perf_counter()
        ds = rd.read_parquet(shard["files"])
        if shard["mode"] == "conv_hash":
            k, n = pid, shard["num_shards"]

            def _filter(batch: pa.Table, k=k, n=n) -> pa.Table:
                mask = _conv_hash(batch.column("conv_id").to_pylist()) % n == k
                return batch.filter(pa.array(mask))

            ds = ds.map_batches(_filter, batch_format="pyarrow")
        ds = extract_dataset(ds, want_markdown=want_markdown,
                             keep_spans=keep_spans, concurrency=concurrency,
                             batch_size=batch_size)
        ds = ds.map_batches(_add_row_hash, batch_format="pyarrow")
        part_path = os.path.join(out_dir, f"part_id={pid}")
        # stale partial output from a crashed/invalidated run must not leak
        # into the rerun: write fresh to a temp dir, swap, then manifest
        # (the manifest is the commit point).
        tmp_path = os.path.join(out_dir, f".part_id={pid}.tmp")
        if os.path.isdir(tmp_path):
            shutil.rmtree(tmp_path)
        ds.write_parquet(tmp_path)
        if os.path.isdir(part_path):
            shutil.rmtree(part_path)
        os.replace(tmp_path, part_path)
        # cheap column-scan for manifest stats (reads 3 columns only)
        stats = rd.read_parquet(part_path,
                                columns=["status", "n_chars", "row_hash"])
        agg = stats.map_batches(
            lambda b: pa.table({
                "rows": pa.array([b.num_rows], pa.int64()),
                "errors": pa.array(
                    [int(np.sum(np.asarray(b.column("status")) == "error"))],
                    pa.int64()),
                "n_chars": pa.array(
                    [int(np.sum(b.column("n_chars").to_numpy()))], pa.int64()),
                "hash_sum": pa.array(
                    [int(np.sum(b.column("row_hash").to_numpy(),
                                dtype=np.uint64))], pa.int64()),
            }),
            batch_format="pyarrow").to_pandas()
        rows = int(agg["rows"].sum())
        errors = int(agg["errors"].sum())
        n_chars = int(agg["n_chars"].sum())
        content_hash = int(agg["hash_sum"].sum()) & ((1 << 63) - 1)
        wall = time.perf_counter() - t0
        m = write_manifest(out_dir, pid,
                           inputs=shard["files"] if shard["mode"] == "files"
                           else [f"{f}#conv_hash%{shard['num_shards']}=={pid}"
                                 for f in shard["files"]],
                           rows=rows, errors=errors, n_chars=n_chars,
                           content_hash=content_hash, wall_sec=wall)
        summary["shards"].append(m)
        summary["rows"] += rows
        summary["errors"] += errors
    return summary


def run_export(input_path: str, out_dir: str, fmt: str = "text", *,
               batch_size: int = DEFAULT_BATCH_SIZE,
               sink: str = "parquet") -> dict:
    """Per-format export job — the distributed analogue of the
    reference's export_to_{text,markdown,html} bins
    (``/root/reference/src/bin/export_to_*.rs``): extract, render the
    requested format per turn, write (conv_id, turn_idx, content)
    rows. HTML renders each turn's spans through the semantic
    converter (R6) inside the same batch pass. ``sink`` picks the
    output format: ``parquet`` (production — column-pruned reads) or
    ``jsonl`` (``Dataset.write_json`` — the interchange format LM
    training loaders commonly consume); both stream per block, never
    one giant file."""
    if fmt not in ("text", "markdown", "html"):
        raise ValueError(f"unknown export format {fmt!r}")
    if sink not in ("parquet", "jsonl"):
        raise ValueError(f"unknown sink {sink!r}")
    tune_for_pipeline()
    ds = read_transcripts(input_path)
    extracted = extract_dataset(ds, want_markdown=(fmt == "markdown"),
                                keep_spans=(fmt == "html"),
                                batch_size=batch_size)

    def render(b: pa.Table) -> pa.Table:
        if fmt == "text":
            content = b.column("extracted_text")
        elif fmt == "markdown":
            content = b.column("markdown")
        else:
            from ..core.html_out import convert_page_semantic
            from ..core.interpret import TextSpan

            html = []
            for recs in b.column("spans").to_pylist():
                spans = [TextSpan(text=r["text"], x=r["x"], y=r["y"],
                                  width=r["w"], height=r["h"],
                                  font_name=r["font"], font_size=r["size"],
                                  bold=r["bold"], mcid=None,
                                  sequence=r["seq"])
                         for r in (recs or [])]
                html.append(convert_page_semantic(spans) if spans else "")
            content = pa.array(html, pa.large_string())
        return pa.table({
            "conv_id": b.column("conv_id"),
            "turn_idx": b.column("turn_idx"),
            "content": content,
            "status": b.column("status"),
        })

    out = extracted.map_batches(render, batch_format="pyarrow")
    if sink == "jsonl":
        out.write_json(out_dir)
    else:
        out.write_parquet(out_dir)
    return {"out_dir": out_dir, "format": fmt, "sink": sink}
