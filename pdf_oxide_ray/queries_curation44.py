"""Round-5m operator — the dedup ablation, measured where it
matters:

* `dedup_lm_ab` — A/B of exact-dedup on held-out language-model
  quality: train the `heldout_perplexity` bigram LM twice — once on
  the RAW train split, once on the train split EXACT-DEDUPED
  (min-doc_id winner per identical text, the `dedup_exact` rule
  restricted to train) — and score the SAME val split with add-1
  unigram backoff. Output: one row per variant (n_train_docs,
  n_bigrams scored, backoff_rate, mean_lp). This is the experiment
  behind "dedup improves LMs" run as a single query: the val set
  never changes, only the training corpus does.

Distributed plan (shuffle budget — also in SCALE.md): the split is
row-local; the dedup winner selection is ONE bucketed content-hash
exchange carrying the payload once (the `training_prep` dedup
shape); each variant's bigram/unigram counts ride the
vocabulary-bounded reduces; BOTH variants' lp6 maps broadcast
together and the val corpus is scored in ONE pass emitting
per-(variant) scalar partials -> a 2-row reduce.

Exactness: identical to `heldout_perplexity` (per-occurrence lp6 on
the int 1e-6 grid, order-free sums, denom guard); the dedup winner
rule ties to min doc_id, mirrored by the twin's GROUP BY text /
MIN(doc_id) join. Empty inputs return the twin's 2 variant rows
with zero counts and NULL means. Self-registers into
``queries.QUERIES`` / ``queries.ORACLE_SQL`` on import.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .queries import _pq, _reduce_partials, _scoped_parallelism

CURATION44_QUERIES: dict = {}
CURATION44_ORACLES: dict = {}


def _nibble_split(doc_ids) -> np.ndarray:
    nib = [hashlib.md5(str(d).encode()).hexdigest()[0]
           for d in doc_ids]
    return np.where(np.array(nib) == "0", "test",
                    np.where(np.array(nib) == "1", "val", "train"))


def _lm_from_counts(vocab: pd.DataFrame):
    """(bigram lp6 lut, unigram backoff lut, unk lp6) from a
    (kind, g, n) count frame — the heldout_perplexity recipe."""
    bg = vocab[vocab["kind"] == "b"] if len(vocab) else vocab
    un = vocab[vocab["kind"] == "u"] if len(vocab) else vocab
    denom = (int(un["n"].sum()) if len(un) else 0) + int(len(un))
    if len(bg):
        left = bg["g"].str.split(" ", n=1).str[0]
        nl = bg.groupby(left.to_numpy(object))["n"] \
            .transform("sum").to_numpy(np.int64)
        raw = np.log(bg["n"].to_numpy(np.float64)
                     / nl.astype(np.float64)) * 1e6
        lp6 = np.copysign(np.floor(np.abs(raw) + 0.5), raw) \
            .astype(np.int64)
        bg_lut = dict(zip(bg["g"], lp6))
    else:
        bg_lut = {}
    if denom > 0:
        uc = un["n"].to_numpy(np.int64) if len(un) else \
            np.array([], dtype=np.int64)
        raw = np.log((uc + 1).astype(np.float64)
                     / np.float64(denom)) * 1e6
        un_lp6 = np.copysign(np.floor(np.abs(raw) + 0.5), raw) \
            .astype(np.int64)
        un_lut = dict(zip(un["g"], un_lp6)) if len(un) else {}
        r0 = np.log(1.0 / np.float64(denom)) * 1e6
        unk = int(np.copysign(np.floor(np.abs(r0) + 0.5), r0))
    else:
        un_lut, unk = {}, 0
    return bg_lut, un_lut, unk


def q_dedup_lm_ab(sf_dir: str) -> pd.DataFrame:
    """Raw vs exact-deduped train split, same val scoring — module
    docstring."""
    import ray

    from .functions import dedup as fdedup
    from .stages.joins import _bucket_of, _get_broadcast

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def train_rows(b: pd.DataFrame) -> pd.DataFrame:
        split = _nibble_split(b["doc_id"].to_numpy(np.int64))
        b = b[split == "train"]
        if not len(b):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "text": pd.Series([], dtype=object),
                "bucket": pd.Series([], dtype="int64")})
        h = fdedup.content_hash(b["text"])
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "text": b["text"].fillna("").to_numpy(object),
            "bucket": _bucket_of(h, 64)})

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        h = fdedup.content_hash(g["text"])
        g = g.assign(__h=h).sort_values(["__h", "doc_id"],
                                        kind="mergesort")
        return g.drop_duplicates("__h", keep="first") \
            [["doc_id", "text"]]

    with _scoped_parallelism(32):
        train = ds.map_batches(train_rows,
                               batch_format="pandas").materialize()
        if train.count():
            winners = train.groupby("bucket") \
                .map_groups(keep_min, batch_format="pandas") \
                .materialize()
        else:
            winners = train

    def counts_of(dset) -> pd.DataFrame:
        def cnt(b: pd.DataFrame) -> pd.DataFrame:
            toks = b["text"].fillna("").str.split() if len(b) else \
                pd.Series([], dtype=object)
            grams = [f"{r[i]} {r[i + 1]}" for r in toks
                     for i in range(len(r) - 1)]
            unis = [w for r in toks for w in r]
            bg = pd.Series(grams, dtype=object).value_counts()
            un = pd.Series(unis, dtype=object).value_counts()
            return pd.concat([
                pd.DataFrame({"kind": "b",
                              "g": bg.index.to_numpy(object),
                              "n": bg.to_numpy(np.int64)}),
                pd.DataFrame({"kind": "u",
                              "g": un.index.to_numpy(object),
                              "n": un.to_numpy(np.int64)})],
                ignore_index=True)
        return _reduce_partials(
            dset.map_batches(cnt, batch_format="pandas"),
            ["kind", "g"], ["n"])

    n_raw = train.count()
    n_ded = winners.count()
    lm_raw = _lm_from_counts(counts_of(train))
    lm_ded = _lm_from_counts(counts_of(winners))
    lut_ref = ray.put((lm_raw, lm_ded))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        lms = _get_broadcast(lut_ref)
        split = _nibble_split(b["doc_id"].to_numpy(np.int64))
        toks = b.loc[split == "val", "text"].fillna("").str.split()
        rows = {"variant": [], "n_bigrams": [], "n_backoff": [],
                "s_lp6": []}
        for name, lm in zip(("raw", "dedup"), lms):
            bgl, unl, unk = lm
            nb = nbo = 0
            s = 0
            for r in toks:
                for i in range(len(r) - 1):
                    nb += 1
                    lp = bgl.get(f"{r[i]} {r[i + 1]}")
                    if lp is None:
                        nbo += 1
                        lp = unl.get(r[i + 1], unk)
                    s += int(lp)
            rows["variant"].append(name)
            rows["n_bigrams"].append(nb)
            rows["n_backoff"].append(nbo)
            rows["s_lp6"].append(s)
        out = pd.DataFrame(rows)
        for c in ("n_bigrams", "n_backoff", "s_lp6"):
            out[c] = out[c].astype("int64")
        return out

    g = _reduce_partials(ds.map_batches(score, batch_format="pandas"),
                         ["variant"],
                         ["n_bigrams", "n_backoff", "s_lp6"])
    if g.empty:
        g = pd.DataFrame({"variant": ["dedup", "raw"],
                          "n_bigrams": np.int64(0),
                          "n_backoff": np.int64(0),
                          "s_lp6": np.int64(0)})
    g = g.set_index("variant")
    rows = []
    for name, n_train in (("raw", n_raw), ("dedup", n_ded)):
        nb = int(g.loc[name, "n_bigrams"]) if name in g.index else 0
        nbo = int(g.loc[name, "n_backoff"]) if name in g.index else 0
        s = int(g.loc[name, "s_lp6"]) if name in g.index else 0
        rows.append((name, int(n_train), nb,
                     float(nbo) / nb if nb else np.nan,
                     (float(s) / nb) / 1e6 if nb else np.nan))
    return pd.DataFrame(rows, columns=["variant", "n_train_docs",
                                       "n_bigrams", "backoff_rate",
                                       "mean_lp"]) \
        .astype({"n_train_docs": "int64", "n_bigrams": "int64"}) \
        .sort_values("variant").reset_index(drop=True)


CURATION44_QUERIES["dedup_lm_ab"] = q_dedup_lm_ab


def _lm_chain(prefix: str, src: str) -> str:
    """One variant's LM CTE chain over ``src`` (doc_id, t)."""
    return f"""
    {prefix}uni AS (
      SELECT w, count(*) AS c FROM (
        SELECT unnest(t) AS w FROM {src}) GROUP BY w),
    {prefix}tot AS (
      SELECT CAST(coalesce(SUM(c), 0) AS BIGINT)
               + CAST(count(*) AS BIGINT) AS denom
      FROM {prefix}uni),
    {prefix}big AS (
      SELECT bg, count(*) AS nb FROM (
        SELECT unnest(CASE WHEN len(t) < 2 THEN []
                           ELSE list_transform(range(1, len(t)),
                                               i -> t[i] || ' '
                                                    || t[i+1])
                      END) AS bg
        FROM {src}) GROUP BY bg),
    {prefix}left AS (
      SELECT split_part(bg, ' ', 1) AS w1,
             CAST(SUM(nb) AS BIGINT) AS nl
      FROM {prefix}big GROUP BY 1),
    {prefix}lp AS (
      SELECT bg,
             CAST(round(ln(CAST(nb AS DOUBLE) / CAST(nl AS DOUBLE))
                        * 1000000) AS BIGINT) AS lp6
      FROM {prefix}big JOIN {prefix}left
        ON split_part({prefix}big.bg, ' ', 1) = {prefix}left.w1),
    {prefix}scored AS (
      SELECT CASE WHEN l.lp6 IS NOT NULL THEN 0 ELSE 1 END
               AS backoff,
             coalesce(l.lp6,
                      CASE WHEN tt.denom > 0 THEN
                        CAST(round(ln(CAST(coalesce(u.c, 0) + 1
                                           AS DOUBLE)
                                      / CAST(tt.denom AS DOUBLE))
                                   * 1000000) AS BIGINT)
                      ELSE 0 END) AS lp6
      FROM held h
      CROSS JOIN {prefix}tot tt
      LEFT JOIN {prefix}lp l ON l.bg = h.bg
      LEFT JOIN {prefix}uni u
        ON u.w = split_part(h.bg, ' ', 2))"""


def _ab_oracle_sql() -> str:
    return rf"""
    WITH base AS (
      SELECT doc_id,
             CASE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                  WHEN '0' THEN 'test' WHEN '1' THEN 'val'
                  ELSE 'train' END AS split,
             coalesce(text, '') AS txt,
             list_filter(regexp_split_to_array(coalesce(text, ''),
                                               '\s+'),
                         x -> x <> '') AS t
      FROM documents),
    traw AS (SELECT doc_id, t FROM base WHERE split = 'train'),
    tded AS (
      SELECT b.doc_id, b.t FROM base b
      JOIN (SELECT txt, MIN(doc_id) AS keep FROM base
            WHERE split = 'train' GROUP BY txt) w
        ON w.keep = b.doc_id
      WHERE b.split = 'train'),
    held AS (
      SELECT unnest(CASE WHEN len(t) < 2 THEN []
                         ELSE list_transform(range(1, len(t)),
                                             i -> t[i] || ' '
                                                  || t[i+1])
                    END) AS bg
      FROM base WHERE split = 'val'),
    {_lm_chain("r_", "traw")},
    {_lm_chain("d_", "tded")},
    nt AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM traw)
                    AS n_raw,
                  (SELECT CAST(count(*) AS BIGINT) FROM tded)
                    AS n_ded),
    agg AS (
      SELECT 'raw' AS variant, nt.n_raw AS n_train_docs,
             CAST(count(s.lp6) AS BIGINT) AS n_bigrams,
             CAST(coalesce(SUM(s.backoff), 0) AS BIGINT)
               AS n_backoff,
             SUM(s.lp6) AS s
      FROM nt LEFT JOIN r_scored s ON TRUE
      GROUP BY nt.n_raw
      UNION ALL
      SELECT 'dedup', nt.n_ded,
             CAST(count(s.lp6) AS BIGINT),
             CAST(coalesce(SUM(s.backoff), 0) AS BIGINT),
             SUM(s.lp6)
      FROM nt LEFT JOIN d_scored s ON TRUE
      GROUP BY nt.n_ded)
    SELECT variant, n_train_docs, n_bigrams,
           CASE WHEN n_bigrams > 0
                THEN CAST(n_backoff AS DOUBLE) / n_bigrams
           END AS backoff_rate,
           CASE WHEN n_bigrams > 0
                THEN (CAST(CAST(s AS VARCHAR) AS DOUBLE)
                      / n_bigrams) / 1000000.0
           END AS mean_lp
    FROM agg ORDER BY variant"""


def _register() -> None:
    from . import queries as _q

    _q.QUERIES.update(CURATION44_QUERIES)
    _q.ORACLE_SQL.update(CURATION44_ORACLES)
    _q.ORACLE_SQL["dedup_lm_ab"] = _ab_oracle_sql()


_register()
