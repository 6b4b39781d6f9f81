"""Round-4s operator family — the corpus data card, grouped
percentiles behind a dimension join, and length concentration:

* `corpus_datacard` — the one-row release summary a dataset card
  quotes: doc/empty/token counts, distinct-text count and dup rate,
  source/lang cardinalities, mean and exact-median length. Composes
  the repo's standard partial plans into one summary row.
* `nation_value_percentiles` — exact p25/p50/p75 of order value per
  customer nation: the grouped-percentile-after-dim-join shape
  (orders join customer join nation, then the bounded value
  histogram — never a global sort).
* `top_decile_share_by_source` — per source, the share of total
  characters held by docs at or above the p90 length: the length
  concentration curve that says whether a source is a few huge docs
  or many small ones. p90 and the conditional sum read off the SAME
  histogram — one exchange.

Distributed plans (shuffle budgets — also in SCALE.md):

`corpus_datacard`: four column-pruned streamed scans (two touch
text): (1) per-batch scalar partials (1 row/block) driver-summed;
(2) the `dedup_exact` (hash, n) exchange with the distinct COUNT
taken distributedly (`Dataset.count()` after the groupby — the
hash vocabulary never lands on the driver); (3) per-batch unique
(source, lang) pairs -> dimension-bounded reduce; (4) the bounded
n_chars histogram for the exact median (the `length_deciles` plan).

`nation_value_percentiles`: customer (custkey -> nationkey) rides
`adaptive_join` (broadcast under its byte+row gate, bucketed above);
nation names broadcast (25 rows); per-batch (nation, price-cents)
value_counts partials -> ONE reduce bounded by nations x distinct
cents (min(n_orders, price domain)); percentiles read off cumulative
counts with the percentile_disc index rule ``sorted[ceil(n*p)-1]``.

`top_decile_share_by_source`: per-batch (source, n_chars) value
counts -> ONE source x distinct-length bounded reduce; p90 (disc
rule) and the >= p90 conditional char sum both read off that one
histogram — int64 sums, one final division.

Empty inputs return the twins' empty shapes (`corpus_datacard` keeps
its single row of zeros/NULLs like the SQL twin). Self-registers into
``queries.QUERIES`` / ``queries.ORACLE_SQL`` on import.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .functions import dedup as fdedup
from .functions.textops import TOK_SQL
from .queries import (_empty_typed, _pq, _reduce_partials,
                      _scoped_parallelism)

CURATION18_QUERIES: dict = {}
CURATION18_ORACLES: dict = {}


# ------------------------------------------------------ corpus datacard

def q_corpus_datacard(sf_dir: str) -> pd.DataFrame:
    """One-row corpus release summary — module docstring."""
    ds = _pq(sf_dir, "documents",
             ["doc_id", "text", "source", "lang", "n_chars"])

    def scalars(b: pd.DataFrame) -> pd.DataFrame:
        text = b["text"].fillna("")
        return pd.DataFrame({
            "n_docs": [np.int64(len(b))],
            "n_empty": [np.int64((text.str.len() == 0).sum())],
            "n_tokens": [np.int64(text.str.split().str.len().sum())]})

    sc = ds.map_batches(scalars, batch_format="pandas").to_pandas()
    n_docs = int(sc["n_docs"].sum()) if len(sc) else 0
    n_empty = int(sc["n_empty"].sum()) if len(sc) else 0
    n_tokens = int(sc["n_tokens"].sum()) if len(sc) else 0

    def hpart(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"h": fdedup.content_hash(b["text"]),
                             "n": np.int64(1)}) \
            .groupby("h", as_index=False).sum()

    with _scoped_parallelism(32):
        hp = ds.map_batches(hpart, batch_format="pandas") \
            .materialize()
        # zero-block guard: groupby on an empty pipeline raises
        n_distinct = int(hp.groupby("h").sum("n").count()) \
            if hp.count() else 0

    def dims(b: pd.DataFrame) -> pd.DataFrame:
        u = b[["source", "lang"]].drop_duplicates()
        return pd.DataFrame({"source": u["source"].to_numpy(object),
                             "lang": u["lang"].to_numpy(object),
                             "n": np.int64(1)})

    dm = _reduce_partials(ds.map_batches(dims, batch_format="pandas"),
                          ["source", "lang"], ["n"])
    n_sources = int(dm["source"].nunique()) if len(dm) else 0
    n_langs = int(dm["lang"].nunique()) if len(dm) else 0

    def lhist(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["n_chars"].value_counts(sort=False)
        return pd.DataFrame({"len": vc.index.to_numpy(np.int64),
                             "cnt": vc.to_numpy(np.int64)})

    h = _reduce_partials(ds.map_batches(lhist, batch_format="pandas"),
                         ["len"], ["cnt"])
    if len(h):
        h = h.sort_values("len")
        cum = h["cnt"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        idx = int(np.ceil(n * 0.5)) - 1
        p50 = float(h["len"].to_numpy(np.int64)
                    [np.searchsorted(cum, idx + 1)])
        sum_chars = int((h["len"].to_numpy(np.int64)
                         * h["cnt"].to_numpy(np.int64)).sum())
    else:
        p50, sum_chars = np.nan, 0

    dup_rate = (float(n_docs - n_distinct) / n_docs
                if n_docs else np.nan)
    mean_chars = float(sum_chars) / n_docs if n_docs else np.nan
    return pd.DataFrame({
        "n_docs": pd.Series([n_docs], dtype="int64"),
        "n_empty": pd.Series([n_empty], dtype="int64"),
        "n_tokens": pd.Series([n_tokens], dtype="int64"),
        "n_distinct": pd.Series([n_distinct], dtype="int64"),
        "dup_rate": [dup_rate],
        "n_sources": pd.Series([n_sources], dtype="int64"),
        "n_langs": pd.Series([n_langs], dtype="int64"),
        "mean_chars": [mean_chars],
        "p50_chars": [p50]})


CURATION18_QUERIES["corpus_datacard"] = q_corpus_datacard
CURATION18_ORACLES["corpus_datacard"] = f"""
    WITH s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(SUM(CASE WHEN coalesce(text, '') = ''
                                    THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_empty,
             CAST(count(DISTINCT coalesce(text, '')) AS BIGINT)
               AS n_distinct,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(quantile_disc(n_chars, 0.5) AS DOUBLE) AS p50_chars
      FROM documents),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens
          FROM (SELECT {TOK_SQL} AS tok FROM documents))
    SELECT n_docs, n_empty, n_tokens,
           CASE WHEN n_docs > 0 THEN n_distinct ELSE 0 END
             AS n_distinct,
           CASE WHEN n_docs > 0
                THEN CAST(n_docs - n_distinct AS DOUBLE) / n_docs
           END AS dup_rate,
           n_sources, n_langs,
           CASE WHEN n_docs > 0
                THEN CAST(sum_chars AS DOUBLE) / n_docs
           END AS mean_chars,
           p50_chars
    FROM s, t"""


# ------------------------------------------- nation value percentiles

def q_nation_value_percentiles(sf_dir: str) -> pd.DataFrame:
    """Exact p25/p50/p75 of order value per customer nation — module
    docstring."""
    import ray

    from .stages.joins import _get_broadcast, adaptive_join

    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nat = _pq(sf_dir, "nation",
              ["n_nationkey", "n_name"]).to_pandas()
    empty = _empty_typed(nation=object, n_orders="int64",
                         p25="float64", p50="float64", p75="float64")
    if nat.empty:
        return empty
    nat = nat.sort_values("n_nationkey")  # searchsorted needs order
    nat_ref = ray.put((nat["n_nationkey"].to_numpy(np.int64),
                       nat["n_name"].to_numpy(object)))

    joined = adaptive_join(orders, cust, left_on="o_custkey",
                           right_on="c_custkey")

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        keys, names = _get_broadcast(nat_ref)
        nk = b["c_nationkey"].to_numpy(np.int64)
        name = names[np.searchsorted(keys, nk)]
        p = b["o_totalprice"].to_numpy(np.float64) * 100
        pc = np.copysign(np.floor(np.abs(p) + 0.5), p) \
            .astype(np.int64)
        vc = pd.DataFrame({"nation": name, "pc": pc}) \
            .value_counts(sort=False).rename("cnt").reset_index()
        vc["cnt"] = vc["cnt"].astype(np.int64)
        return vc

    h = _reduce_partials(joined.map_batches(hist,
                                            batch_format="pandas"),
                         ["nation", "pc"], ["cnt"])
    if h.empty:
        return empty
    rows = []
    for nation, g in h.sort_values("pc").groupby("nation"):
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        vals = g["pc"].to_numpy(np.int64)
        n = int(cum[-1])

        def disc(p: float) -> float:
            idx = int(np.ceil(n * p)) - 1
            return float(vals[np.searchsorted(cum, idx + 1)]) / 100.0

        rows.append((nation, n, disc(0.25), disc(0.5), disc(0.75)))
    return pd.DataFrame(rows, columns=["nation", "n_orders", "p25",
                                       "p50", "p75"]) \
        .astype({"n_orders": "int64"}) \
        .sort_values("nation").reset_index(drop=True)


CURATION18_QUERIES["nation_value_percentiles"] = \
    q_nation_value_percentiles
CURATION18_ORACLES["nation_value_percentiles"] = """
    WITH o AS (
      SELECT n.n_name AS nation,
             CAST(round(o_totalprice * 100) AS BIGINT) AS pc
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation n ON n.n_nationkey = c.c_nationkey)
    SELECT nation, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(quantile_disc(pc, 0.25) AS DOUBLE) / 100.0 AS p25,
           CAST(quantile_disc(pc, 0.5) AS DOUBLE) / 100.0 AS p50,
           CAST(quantile_disc(pc, 0.75) AS DOUBLE) / 100.0 AS p75
    FROM o GROUP BY nation ORDER BY nation"""


# ------------------------------------- top-decile share per source

def q_top_decile_share_by_source(sf_dir: str) -> pd.DataFrame:
    """Per source: p90 length and the char share of docs >= p90 —
    module docstring."""
    ds = _pq(sf_dir, "documents", ["source", "n_chars"])

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[["source", "n_chars"]].value_counts(sort=False) \
            .rename("cnt").reset_index()
        vc["cnt"] = vc["cnt"].astype(np.int64)
        return vc

    h = _reduce_partials(ds.map_batches(hist, batch_format="pandas"),
                         ["source", "n_chars"], ["cnt"])
    if h.empty:
        return _empty_typed(source=object, n_docs="int64",
                            p90_chars="float64", top_share="float64")
    rows = []
    for source, g in h.sort_values("n_chars").groupby("source"):
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        vals = g["n_chars"].to_numpy(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        n = int(cum[-1])
        idx = int(np.ceil(n * 0.9)) - 1
        p90 = int(vals[np.searchsorted(cum, idx + 1)])
        total = int((vals * cnt).sum())
        top = int((vals * cnt)[vals >= p90].sum())
        rows.append((source, n, float(p90),
                     float(top) / total if total else np.nan))
    return pd.DataFrame(rows, columns=["source", "n_docs",
                                       "p90_chars", "top_share"]) \
        .astype({"n_docs": "int64"}) \
        .sort_values("source").reset_index(drop=True)


CURATION18_QUERIES["top_decile_share_by_source"] = \
    q_top_decile_share_by_source
CURATION18_ORACLES["top_decile_share_by_source"] = """
    WITH q AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             quantile_disc(n_chars, 0.9) AS p90,
             CAST(SUM(n_chars) AS BIGINT) AS total
      FROM documents GROUP BY source),
    t AS (
      SELECT d.source, CAST(SUM(d.n_chars) AS BIGINT) AS top
      FROM documents d JOIN q ON q.source = d.source
      WHERE d.n_chars >= q.p90 GROUP BY d.source)
    SELECT q.source, q.n_docs,
           CAST(q.p90 AS DOUBLE) AS p90_chars,
           CASE WHEN q.total > 0
                THEN CAST(t.top AS DOUBLE) / q.total END AS top_share
    FROM q JOIN t ON t.source = q.source ORDER BY q.source"""


def _register() -> None:
    from . import queries as _q

    _q.QUERIES.update(CURATION18_QUERIES)
    _q.ORACLE_SQL.update(CURATION18_ORACLES)


_register()
