"""Deduplication operators (exact + near-dup families) for corpus-scale
pipelines.

Not present in the reference library (its corpus bins never join across
documents — SURVEY.md §2.7); these are the cross-document operators a
training-data engine needs. Shuffle plans:

* exact: content-hash per batch (vectorized) -> ``groupby(hash)`` -> min
  doc_id per group (hash-partitioned; ONE small shuffle over (hash, id));
* MinHash+LSH: shingle -> minhash signature per batch -> explode to
  (band_id, band_hash, doc_id) rows -> ``groupby(band)`` -> candidate pairs
  -> Jaccard verify -> min-label connected components;
* SimHash: 64-bit signature per batch; bucket by rotated prefixes;
* embedding near-dup: cosine >= tau via the similarity module's bucketed
  matmul.

Everything per-batch is numpy/pandas vectorized; the only all-to-all
exchanges are the groupbys over tiny (key, id) projections — never the text.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

# ASCII word tokens by design: the DuckDB oracles tokenize with the RE2
# class [0-9A-Za-z_]+ (RE2 \w is ASCII-only), so the Python side must
# agree on EVERY corpus, not just ASCII ones. Widen both sides together
# if a multilingual corpus ever needs Unicode word segmentation.
_TOKEN_RE = re.compile(r"\w+", re.ASCII)

# 64-bit universal-hash parameters for minhash permutations, seeded once per
# worker at import (deterministic constants).
_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 1337) -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rs.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def content_hash(texts: pd.Series) -> pd.Series:
    """Stable 128-bit hex content hash (collision-safe exact-dup key)."""
    return texts.fillna("").map(
        lambda t: hashlib.sha256(t.encode("utf-8")).hexdigest()[:32])


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Word k-shingles -> uint64 hashes."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.zeros(1, dtype=np.uint64)
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                        "big") for g in grams),
        dtype=np.uint64, count=len(grams))


def minhash_signature(text: str, num_perm: int = 64, k: int = 5) -> np.ndarray:
    """num_perm-wide MinHash signature over shingles.

    Hash family: multiply-add with natural uint64 wraparound (odd
    multipliers -> a permutation of Z_2^64; the multiply-shift family of
    Dietzfelbinger et al.). Fully vectorized — the earlier (a*h+b) mod
    Mersenne variant needed Python-object bignums and dominated the
    minhash query's runtime."""
    if num_perm not in _PERM_CACHE:
        a, b = _perm_params(num_perm)
        _PERM_CACHE[num_perm] = (a | np.uint64(1), b)  # odd multipliers
    a, b = _PERM_CACHE[num_perm]
    h = shingle_hashes(text, k=k)
    vals = h[:, None] * a + b  # uint64 wraparound is the hash
    return np.min(vals, axis=0)


def minhash_bands(sig: np.ndarray, num_bands: int = 16) -> list[int]:
    """LSH band hashes (band id folded in)."""
    rows = len(sig) // num_bands
    out = []
    for band in range(num_bands):
        chunk = sig[band * rows : (band + 1) * rows].tobytes()
        digest = hashlib.blake2b(chunk, digest_size=8,
                                 salt=band.to_bytes(8, "big")).digest()
        out.append(int.from_bytes(digest, "big") >> 1)  # fit int64
    return out


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa = set(shingle_hashes(text_a, k).tolist())
    sb = set(shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Character n-gram Jaccard (the cheap verify for short texts)."""
    sa = {text_a[i : i + n] for i in range(max(len(text_a) - n + 1, 1))}
    sb = {text_b[i : i + n] for i in range(max(len(text_b) - n + 1, 1))}
    return len(sa & sb) / max(len(sa | sb), 1)


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens.

    The per-token hash is the first 8 bytes of md5 so a DuckDB oracle can
    reconstruct the signature bit-for-bit from ``md5(tok)`` hex (blake2b
    isn't available in SQL); the bit accumulation is one vectorized pass
    over the stacked token digests rather than a per-token numpy op."""
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    buf = b"".join(hashlib.md5(t.encode()).digest()[:8] for t in toks)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8).reshape(-1, 8), axis=1)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = np.packbits((acc > 0).astype(np.uint8))
    return int.from_bytes(out.tobytes(), "big") >> 1  # fit int64


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# batch-level kernels (map_batches bodies)
# ---------------------------------------------------------------------------

def add_content_hash(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    batch = batch.copy()
    batch["content_hash"] = content_hash(batch[text_col])
    return batch


def add_minhash_bands(batch: pd.DataFrame, text_col: str = "text",
                      num_perm: int = 64, num_bands: int = 16,
                      k: int = 5) -> pd.DataFrame:
    batch = batch.copy()
    batch["bands"] = batch[text_col].fillna("").map(
        lambda t: minhash_bands(minhash_signature(t, num_perm, k), num_bands))
    return batch


def add_simhash(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    batch = batch.copy()
    batch["simhash"] = batch[text_col].fillna("").map(simhash64).astype("int64")
    return batch


def connected_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over the (small) verified candidate-pair set: id -> root.
    At 100 TB the pair set after Jaccard verification is a tiny fraction of
    the corpus (only near-dup ids + edges reach the driver)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}
