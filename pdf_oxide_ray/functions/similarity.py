"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and every ``map_batches`` task does one numpy matmul per batch
against it (no shuffle; partial top-k per batch, merged small on the driver
side via a final aggregate).

Scale path: LSH-bucketed variant — random-hyperplane signatures put vectors
into buckets; only same-bucket candidates are scored (bucket groupby is the
only shuffle and carries (bucket, id, vec) projections, not documents).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd


def normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def batch_topk_fn(queries_ref, k: int):
    """Build a map_batches body: per-batch cosine top-k against a broadcast
    query matrix (``ray.put`` once; zero-copy ``ray.get`` cached per worker).
    Emits (query_id, vec_id, score) candidate rows — k per query per batch —
    which a final small reduce merges to global top-k."""
    state: dict = {}

    def _q() -> np.ndarray:
        if "q" not in state:
            import ray

            raw = queries_ref if isinstance(queries_ref, np.ndarray) \
                else ray.get(queries_ref)
            state["q"] = normalize_rows(np.asarray(raw, dtype=np.float64))
        return state["q"]

    def topk(batch: pd.DataFrame) -> pd.DataFrame:
        q = _q()
        vecs = normalize_rows(
            np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = vecs @ q.T  # (B, Q)
        kk = min(k, len(batch))
        out_q, out_v, out_s = [], [], []
        vec_ids = batch["vec_id"].to_numpy()
        for qi in range(q.shape[0]):
            col = sims[:, qi]
            idx = np.argpartition(-col, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_v.extend(vec_ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v,
                             "score": out_s})

    return topk


def reduce_topk(candidates: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    """Merge per-batch candidates to global top-k per query (deterministic
    tiebreak: higher score, then lower vec_id)."""
    rows = []
    for qid, grp in candidates.groupby("query_id"):
        top = heapq.nsmallest(k, grp.itertuples(),
                              key=lambda r: (-r.score, r.vec_id))
        for rank, r in enumerate(top):
            rows.append((qid, rank, r.vec_id, float(r.score)))
    return pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "score"])


def brute_force_topk(ds, query_matrix: np.ndarray, k: int = 10,
                     concurrency: int | None = None) -> pd.DataFrame:
    """embeddings Dataset -> top-k table. Broadcasts queries via ray.put."""
    import ray

    ref = ray.put(np.asarray(query_matrix, dtype=np.float64))
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    cands = ds.map_batches(batch_topk_fn(ref, k), batch_format="pandas",
                           batch_size=4096, **kwargs).to_pandas()
    return reduce_topk(cands, k=k)


# ---------------------------------------------------------------------------
# LSH-bucketed variant (scale path)
# ---------------------------------------------------------------------------

def hyperplane_signatures(vecs: np.ndarray, n_planes: int = 12,
                          seed: int = 97) -> np.ndarray:
    rs = np.random.RandomState(seed)
    planes = rs.normal(size=(vecs.shape[1], n_planes)).astype(np.float64)
    bits = (vecs @ planes) > 0
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    return bits @ weights


def add_lsh_bucket(batch: pd.DataFrame, n_planes: int = 12,
                   seed: int = 97) -> pd.DataFrame:
    vecs = normalize_rows(
        np.stack(batch["embedding"].to_numpy()).astype(np.float64))
    batch = batch.copy()
    batch["bucket"] = hyperplane_signatures(vecs, n_planes, seed)
    return batch


def bucket_near_dups(group: pd.DataFrame, tau: float = 0.95) -> pd.DataFrame:
    """Within one LSH bucket: all-pairs cosine; emit id pairs >= tau."""
    if len(group) < 2:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    vecs = normalize_rows(
        np.stack(group["embedding"].to_numpy()).astype(np.float64))
    sims = vecs @ vecs.T
    ids = group["vec_id"].to_numpy()
    ia, ib = np.triu_indices(len(group), k=1)
    mask = sims[ia, ib] >= tau
    return pd.DataFrame({
        "id_a": np.minimum(ids[ia[mask]], ids[ib[mask]]),
        "id_b": np.maximum(ids[ia[mask]], ids[ib[mask]]),
        "score": sims[ia[mask], ib[mask]].astype(np.float64),
    })
