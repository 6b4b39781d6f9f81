"""Round-4i operator family — behavioral-sequence + retrieval ops a
training-data pipeline needs beside the document filters:

* `event_runs` — gaps-and-islands: per user, the number of maximal
  same-event-type runs and the longest run (with its type) over the
  (ts, event_id)-ordered stream. The classic session-shape diagnostic
  (is a user's activity one long scroll or many short visits?).
* `oov_rate` — per-source out-of-vocabulary rate against the corpus
  top-V vocabulary (count DESC, word ASC tie-break): the vocabulary-
  coverage number a tokenizer owner reads before adding a source.
* `bm25_search` — Okapi BM25 (k1=1.2, b=0.75) top-20 retrieval for a
  fixed 3-term query: tokenize → (dl, tf) skinny per-doc table →
  tiny (N, Σdl, df_t) reduce → driver idf → broadcast-scalar scoring
  map → per-batch top-k partials → driver merge.

Distributed plans (shuffle budgets — also in SCALE.md):

`event_runs` reuses the sorted-batch boundary-stitch ordered plan
proven by `event_burstiness` (queries_curation7.py), generalized from
gaps to islands: ONE range-partitioned sort of the skinny (user_id,
event_type, ts, event_id) projection is the only exchange; in-batch
islands are vectorized diffs; each batch emits O(1) boundary rows
(first/last island with an explicit whole-batch flag — a k≥3 batch
can legally start and end with the same (user, type, len) island, so
the flag cannot be inferred) plus per-(user,type) interior partials
that the driver stitches in key order — batches partition the global
sort order, so a last→first adjacency in key order IS a cross-batch
seam. Boundary rows are 2/batch and interior partials are
key-cardinality × batches, a documented driver-side hot set (stitch
hierarchically per range partition beyond ~5M rows, the
`_reduce_partials` gate). (The sibling transition-matrix censor over
the same ordered stream already exists as `event_transitions`,
queries_relational.py:475 — this family deliberately does not shadow
it.)

`oov_rate`: two streamed token passes (re-tokenizing beats
materializing a corpus-sized token column); exchange 1 = the
vocabulary-sized (word, count) partial reduce via `_reduce_partials`;
top-V is a driver-side sort of the reduced vocab (vocab-sized, not
corpus-sized; at web scale cut with a distributed top-k first); the
V-word set rides the closure (tiny); exchange 2 = the source-sized
(n_tokens, n_oov) partial reduce.

`bm25_search`: the per-doc (doc_id, dl, tf_t) skinny table is
materialized ONCE in the object store (~40 B/doc — spillable, never
driver-held) so the global reduce and the scoring pass don't
re-tokenize; globals are a 5-number driver fold; idf/avgdl are plain
Python floats in the scoring closure; top-k merges per-batch top-20
partials. No shuffle at all — both passes are pure maps.

Exactness: run counts are pure int64; rates are single int/int double
divisions (bit-identical to the twin); BM25 scores follow the repo's ln() convention — identical
float64 operand order term-for-term and a final half-away round to
the 1e-6 grid (`halfaway6`) on BOTH sides, with the top-k ORDER BY on
the rounded score (+ doc_id) so last-ulp libm drift can't reorder the
cut. Empty inputs return the twins' empty shapes. Self-registers into
``queries.QUERIES`` / ``queries.ORACLE_SQL`` on import.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .functions.textops import halfaway6
from .queries import _empty_typed, _pq, _reduce_partials

CURATION8_QUERIES: dict = {}
CURATION8_ORACLES: dict = {}

_WORD_RE = re.compile(r"[0-9a-z_]+")
_WORD_SQL = "regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+')"


# ---------------------------------------------------------------- runs

def q_event_runs(sf_dir: str) -> pd.DataFrame:
    """Per-user maximal same-type run census over the (ts, event_id)
    order: n_runs, longest_run, and the (smallest) type achieving it.
    Sorted-batch boundary-stitch plan — module docstring."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type", "ts",
                                "event_id"]) \
        .sort(["user_id", "ts", "event_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "event_type": object,
                "n_isl": "int64", "max_len": "int64", "b_len": "int64",
                "b_whole": "int64", "k_user": "int64", "k_ts": "int64",
                "k_eid": "int64", "kind": "int64"}
        if len(b) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in cols.items()})
        u = b["user_id"].to_numpy(np.int64)
        et = b["event_type"].to_numpy(object)
        ts = b["ts"].to_numpy("datetime64[us]").astype(np.int64)
        eid = b["event_id"].to_numpy(np.int64)
        brk = np.flatnonzero((u[1:] != u[:-1]) | (et[1:] != et[:-1]))
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk, [len(b) - 1]))
        lens = ends - starts + 1
        k = len(starts)
        # interior islands (exclude the first and last — they may
        # continue across the batch seam)
        if k > 2:
            iu, iet, il = u[starts[1:-1]], et[starts[1:-1]], lens[1:-1]
            interior = pd.DataFrame({"user_id": iu, "event_type": iet,
                                     "n_isl": np.int64(1),
                                     "max_len": il}) \
                .groupby(["user_id", "event_type"], as_index=False) \
                .agg(n_isl=("n_isl", "sum"), max_len=("max_len", "max"))
        else:
            interior = pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "event_type": pd.Series([], dtype=object),
                "n_isl": pd.Series([], dtype="int64"),
                "max_len": pd.Series([], dtype="int64")})
        interior["b_len"] = np.int64(0)
        interior["b_whole"] = np.int64(0)
        interior["k_user"] = np.int64(0)
        interior["k_ts"] = np.int64(0)
        interior["k_eid"] = np.int64(0)
        interior["kind"] = np.int64(-1)
        # boundary rows: the batch's first and last islands, keyed by
        # the batch's FIRST row so the driver can re-order batches
        # (kind 1 = first island, 2 = last island; b_whole marks a
        # single-island batch — the flag is explicit because a k>=3
        # batch can legally start and end with the same (user, type,
        # len) island)
        edge = pd.DataFrame({
            "user_id": [u[starts[0]], u[starts[-1]]],
            "event_type": [et[starts[0]], et[starts[-1]]],
            "n_isl": np.int64(0), "max_len": np.int64(0),
            "b_len": [lens[0], lens[-1]],
            "b_whole": np.int64(1 if k == 1 else 0),
            "k_user": u[0], "k_ts": ts[0], "k_eid": eid[0],
            "kind": np.array([1, 2], dtype=np.int64)})
        return pd.concat([interior, edge], ignore_index=True)

    # fixed batch_size: contiguous slices of the sorted order AND the
    # stitch path exercises at every scale
    rows = ds.map_batches(partial, batch_format="pandas",
                          batch_size=4096).materialize().to_pandas()
    empty = _empty_typed(user_id="int64", n_runs="int64",
                         longest_run="int64", run_type=object)
    if rows.empty:
        return empty
    stats: dict = {}  # (user, type) -> [n_runs, max_len]

    def _fin(user: int, typ: str, ln: int) -> None:
        cur = stats.setdefault((user, typ), [0, 0])
        cur[0] += 1
        cur[1] = max(cur[1], ln)

    interior = rows[rows["kind"] == -1]
    for _, r in interior.groupby(["user_id", "event_type"],
                                 as_index=False) \
            .agg(n_isl=("n_isl", "sum"),
                 max_len=("max_len", "max")).iterrows():
        cur = stats.setdefault((int(r["user_id"]), r["event_type"]),
                               [0, 0])
        cur[0] += int(r["n_isl"])
        cur[1] = max(cur[1], int(r["max_len"]))
    # stitch: order batches by their first-row key; within a batch the
    # first island (kind 1) precedes the last (kind 2)
    edge = rows[rows["kind"] > 0] \
        .sort_values(["k_user", "k_ts", "k_eid", "kind"],
                     kind="mergesort").reset_index(drop=True)
    pend: tuple | None = None  # (user, type, len)
    for i in range(0, len(edge), 2):
        f, last = edge.iloc[i], edge.iloc[i + 1]
        whole = bool(f["b_whole"])
        fu, ft, fl = int(f["user_id"]), f["event_type"], int(f["b_len"])
        lu, lt, ll = (int(last["user_id"]), last["event_type"],
                      int(last["b_len"]))
        if pend is not None:
            if pend[0] == fu and pend[1] == ft:
                merged = pend[2] + fl
                if whole:
                    pend = (fu, ft, merged)
                    continue
                _fin(fu, ft, merged)
            else:
                _fin(*pend)
                if whole:
                    pend = (fu, ft, fl)
                    continue
                _fin(fu, ft, fl)
        else:
            if whole:
                pend = (fu, ft, fl)
                continue
            _fin(fu, ft, fl)
        pend = (lu, lt, ll)
    if pend is not None:
        _fin(*pend)
    if not stats:
        return empty
    per = pd.DataFrame([(u, t, v[0], v[1])
                        for (u, t), v in stats.items()],
                       columns=["user_id", "event_type", "n_isl",
                                "max_len"])
    tot = per.groupby("user_id", as_index=False) \
        .agg(n_runs=("n_isl", "sum"), longest_run=("max_len", "max"))
    best = per.merge(tot, on="user_id")
    best = best[best["max_len"] == best["longest_run"]] \
        .groupby("user_id", as_index=False) \
        .agg(run_type=("event_type", "min"))
    out = tot.merge(best, on="user_id").sort_values("user_id") \
        .reset_index(drop=True)
    return out.astype({"user_id": "int64", "n_runs": "int64",
                       "longest_run": "int64"})[
        ["user_id", "n_runs", "longest_run", "run_type"]]


CURATION8_QUERIES["event_runs"] = q_event_runs
CURATION8_ORACLES["event_runs"] = """
    WITH o AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS grp
      FROM events),
    i AS (
      SELECT user_id, event_type, grp, COUNT(*) AS run_len
      FROM o GROUP BY user_id, event_type, grp),
    m AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
             CAST(MAX(run_len) AS BIGINT) AS longest_run
      FROM i GROUP BY user_id)
    SELECT m.user_id, m.n_runs, m.longest_run,
           MIN(i.event_type) AS run_type
    FROM m JOIN i ON i.user_id = m.user_id
                 AND i.run_len = m.longest_run
    GROUP BY m.user_id, m.n_runs, m.longest_run
    ORDER BY m.user_id"""


# ----------------------------------------------------------------- oov

_OOV_V = 10  # top-V vocabulary size (parameter; the plan is V-agnostic)


def q_oov_rate(sf_dir: str) -> pd.DataFrame:
    """Per-source OOV rate vs the corpus top-V vocabulary (count DESC,
    word ASC tie-break). Two streamed token passes; exchanges are the
    vocab-sized word-count reduce and the source-sized OOV reduce —
    module docstring."""
    ds = _pq(sf_dir, "documents", ["source", "text"])

    def wcount(b: pd.DataFrame) -> pd.DataFrame:
        toks: dict[str, int] = {}
        for t in b["text"].fillna(""):
            for w in _WORD_RE.findall(t.lower()):
                toks[w] = toks.get(w, 0) + 1
        return pd.DataFrame({"w": list(toks), "c": list(toks.values())}) \
            .astype({"c": "int64"}) if toks else \
            pd.DataFrame({"w": pd.Series([], dtype=object),
                          "c": pd.Series([], dtype="int64")})

    vocab_df = _reduce_partials(
        ds.map_batches(wcount, batch_format="pandas"), ["w"], ["c"])
    empty = _empty_typed(source=object, n_tokens="int64",
                         n_oov="int64", oov_rate="float64")
    if vocab_df.empty:
        return empty
    vocab_df = vocab_df.sort_values(["c", "w"],
                                    ascending=[False, True],
                                    kind="mergesort")
    vocab = frozenset(vocab_df["w"].head(_OOV_V))

    def oov(b: pd.DataFrame) -> pd.DataFrame:
        srcs, n_tok, n_oov = [], [], []
        agg: dict[str, list[int]] = {}
        for s, t in zip(b["source"], b["text"].fillna("")):
            ws = _WORD_RE.findall(t.lower())
            cur = agg.setdefault(s, [0, 0])
            cur[0] += len(ws)
            cur[1] += sum(1 for w in ws if w not in vocab)
        for s, (nt, no) in agg.items():
            srcs.append(s)
            n_tok.append(nt)
            n_oov.append(no)
        return pd.DataFrame({"source": pd.Series(srcs, dtype=object),
                             "n_tokens": pd.Series(n_tok, dtype="int64"),
                             "n_oov": pd.Series(n_oov, dtype="int64")})

    per = _reduce_partials(ds.map_batches(oov, batch_format="pandas"),
                           ["source"], ["n_tokens", "n_oov"])
    if per.empty:
        return empty
    per["oov_rate"] = per["n_oov"].to_numpy(np.float64) \
        / per["n_tokens"].to_numpy(np.float64)
    return per.sort_values("source").reset_index(drop=True) \
        .astype({"n_tokens": "int64", "n_oov": "int64"})


CURATION8_QUERIES["oov_rate"] = q_oov_rate
CURATION8_ORACLES["oov_rate"] = f"""
    WITH tok AS (
      SELECT source, unnest({_WORD_SQL}) AS w FROM documents),
    cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    vocab AS (SELECT w FROM cnt ORDER BY c DESC, w LIMIT {_OOV_V}),
    agg AS (
      SELECT source, COUNT(*) AS n_tokens,
             SUM(CASE WHEN w IN (SELECT w FROM vocab)
                 THEN 0 ELSE 1 END) AS n_oov
      FROM tok GROUP BY source)
    SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_oov AS BIGINT) AS n_oov,
           CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
    FROM agg ORDER BY source"""


# ---------------------------------------------------------------- bm25

_BM25_TERMS = ("join", "spark", "window")  # fixed 3-term query
_BM25_K = 20


def q_bm25_search(sf_dir: str) -> pd.DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) top-20 for the fixed query
    {join, spark, window}: skinny (dl, tf_t) table materialized once,
    5-number global fold, scalar-closure scoring map, per-batch top-k
    partials. Scores round half-away to the 1e-6 grid on BOTH sides
    and the ORDER BY uses the rounded score — module docstring."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    t1, t2, t3 = _BM25_TERMS

    def tf_dl(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        dl = np.zeros(n, dtype=np.int64)
        tf = np.zeros((3, n), dtype=np.int64)
        for i, t in enumerate(b["text"].fillna("")):
            ws = _WORD_RE.findall(t.lower())
            dl[i] = len(ws)
            for w in ws:
                if w == t1:
                    tf[0, i] += 1
                elif w == t2:
                    tf[1, i] += 1
                elif w == t3:
                    tf[2, i] += 1
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                             "dl": dl, "tf1": tf[0], "tf2": tf[1],
                             "tf3": tf[2]})

    skinny = ds.map_batches(tf_dl, batch_format="pandas").materialize()

    def glob(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": np.int64(0),
            "n": np.int64(len(b)),
            "sdl": np.int64(b["dl"].sum()),
            "df1": np.int64((b["tf1"] > 0).sum()),
            "df2": np.int64((b["tf2"] > 0).sum()),
            "df3": np.int64((b["tf3"] > 0).sum())}, index=[0])

    g = _reduce_partials(skinny.map_batches(glob, batch_format="pandas"),
                         ["k"], ["n", "sdl", "df1", "df2", "df3"])
    empty = _empty_typed(doc_id="int64", dl="int64", score="float64")
    if g.empty or int(g["n"].iloc[0]) == 0:
        return empty
    n = int(g["n"].iloc[0])
    avgdl = np.float64(int(g["sdl"].iloc[0])) / np.float64(n)
    idf = [np.log((np.float64(n - int(g[f"df{i}"].iloc[0])) + 0.5)
                  / (np.float64(int(g[f"df{i}"].iloc[0])) + 0.5) + 1.0)
           for i in (1, 2, 3)]
    idf1, idf2, idf3 = (np.float64(x) for x in idf)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        hit = (b["tf1"] + b["tf2"] + b["tf3"]) > 0
        b = b[hit]
        if len(b) == 0:
            return _empty_typed(doc_id="int64", dl="int64",
                                score_r6="int64")
        dl = b["dl"].to_numpy(np.float64)
        norm = np.float64(1.2) * (np.float64(0.25)
                                  + np.float64(0.75) * (dl / avgdl))

        def sat(tf_col: str) -> np.ndarray:
            tf = b[tf_col].to_numpy(np.float64)
            return (tf * np.float64(2.2)) / (tf + norm)

        s = idf1 * sat("tf1")
        s = s + idf2 * sat("tf2")
        s = s + idf3 * sat("tf3")
        out = pd.DataFrame({"doc_id": b["doc_id"].to_numpy(np.int64),
                            "dl": b["dl"].to_numpy(np.int64),
                            "score_r6": halfaway6(s)})
        return out.sort_values(["score_r6", "doc_id"],
                               ascending=[False, True],
                               kind="mergesort").head(_BM25_K)

    top = skinny.map_batches(score, batch_format="pandas").to_pandas()
    if top.empty:
        return empty
    top = top.sort_values(["score_r6", "doc_id"],
                          ascending=[False, True],
                          kind="mergesort").head(_BM25_K)
    return pd.DataFrame({"doc_id": top["doc_id"].astype("int64"),
                         "dl": top["dl"].astype("int64"),
                         "score": top["score_r6"].to_numpy(np.float64)
                         / 1e6}).reset_index(drop=True)


CURATION8_QUERIES["bm25_search"] = q_bm25_search
CURATION8_ORACLES["bm25_search"] = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_WORD_SQL}) AS w FROM documents),
    dl AS (
      SELECT d.doc_id,
             COALESCE(t.dl, 0) AS dl,
             COALESCE(t.tf1, 0) AS tf1,
             COALESCE(t.tf2, 0) AS tf2,
             COALESCE(t.tf3, 0) AS tf3
      FROM documents d LEFT JOIN (
        SELECT doc_id, COUNT(*) AS dl,
               SUM(CASE WHEN w = '{_BM25_TERMS[0]}' THEN 1 ELSE 0 END)
                 AS tf1,
               SUM(CASE WHEN w = '{_BM25_TERMS[1]}' THEN 1 ELSE 0 END)
                 AS tf2,
               SUM(CASE WHEN w = '{_BM25_TERMS[2]}' THEN 1 ELSE 0 END)
                 AS tf3
        FROM tok GROUP BY doc_id) t USING (doc_id)),
    g AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS avgdl,
             SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
             SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
      FROM dl),
    s AS (
      SELECT d.doc_id, d.dl,
             ((ln((CAST(g.n - g.df1 AS DOUBLE) + 0.5)
                  / (CAST(g.df1 AS DOUBLE) + 0.5) + 1.0)
               * ((CAST(d.tf1 AS DOUBLE) * 2.2)
                  / (CAST(d.tf1 AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE)
                                             / g.avgdl)))))
              + (ln((CAST(g.n - g.df2 AS DOUBLE) + 0.5)
                    / (CAST(g.df2 AS DOUBLE) + 0.5) + 1.0)
                 * ((CAST(d.tf2 AS DOUBLE) * 2.2)
                    / (CAST(d.tf2 AS DOUBLE)
                       + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE)
                                               / g.avgdl))))))
             + (ln((CAST(g.n - g.df3 AS DOUBLE) + 0.5)
                   / (CAST(g.df3 AS DOUBLE) + 0.5) + 1.0)
                * ((CAST(d.tf3 AS DOUBLE) * 2.2)
                   / (CAST(d.tf3 AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE)
                                              / g.avgdl)))))
               AS score
      FROM dl d, g
      WHERE d.tf1 + d.tf2 + d.tf3 > 0)
    SELECT doc_id, dl,
           round(score * 1000000.0, 0) / 1000000.0 AS score
    FROM s
    ORDER BY round(score * 1000000.0, 0) / 1000000.0 DESC, doc_id
    LIMIT {_BM25_K}"""


def _register() -> None:
    from . import queries as _q

    _q.QUERIES.update(CURATION8_QUERIES)
    _q.ORACLE_SQL.update(CURATION8_ORACLES)


_register()
