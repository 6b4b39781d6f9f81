"""Randomized end-to-end equivalence for the round-4c family
(split_contamination / rfm_segments / hourly_top_event /
heaps_law_curve / lineitem_value_corr / session_overlap_peak): seeded
random corpora — duplicate texts across splits, tied timestamps,
boundary-touching sessions, degenerate constant measures — must match
the DuckDB oracle bit-for-bit, plus empty-input parity."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_oxide_ray.queries import ORACLE_SQL, QUERIES

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "the", "a",
          "of", "scan", "merge", "sort", "hash", "key", "row", "qq17x"]


def _write_tables(tmp_path, seed: int) -> str:
    rs = np.random.RandomState(seed)
    n_docs = int(rs.randint(30, 200))
    texts = []
    for _ in range(n_docs):
        k = int(rs.randint(0, 40))
        texts.append(" ".join(_WORDS[i]
                              for i in rs.randint(0, len(_WORDS), k)))
    # force exact duplicates so splits share text (contamination)
    for _ in range(n_docs // 3):
        i, j = rs.randint(0, n_docs, 2)
        texts[max(i, j)] = texts[min(i, j)]
    docs = pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts, "lang": "en", "source": "s0",
        "n_chars": np.int64([len(t) for t in texts])})
    n_ev = int(rs.randint(20, 500))
    events = pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "user_id": rs.randint(0, 7, n_ev).astype(np.int64),
        "event_type": [f"t{i}" for i in rs.randint(0, 4, n_ev)],
        "value": np.round(rs.rand(n_ev) * 10, 2),
        # seconds-granular over ~3 days: same-instant ties AND >30min
        # session gaps both occur
        "ts": pd.to_datetime("2024-05-01")
        + pd.to_timedelta(rs.randint(0, 3 * 86400, n_ev), unit="s")})
    n_ord = int(rs.randint(10, 300))
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rs.randint(1, 40, n_ord).astype(np.int64),
        "o_totalprice": np.round(rs.rand(n_ord) * 9000, 2),
        "o_orderdate": pd.to_datetime("1995-01-01")
        + pd.to_timedelta(rs.randint(0, 400, n_ord), unit="D"),
        "o_orderstatus": "O", "o_orderpriority": "1-URGENT"})
    n_li = int(rs.randint(10, 400))
    lineitem = pd.DataFrame({
        "l_orderkey": rs.randint(0, max(n_ord, 1), n_li).astype(np.int64),
        "l_quantity": rs.randint(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rs.rand(n_li) * 90000, 2),
        "l_discount": np.round(rs.randint(0, 11, n_li) / 100, 2),
        "l_tax": np.round(rs.randint(0, 9, n_li) / 100, 2),
        # hour-granular so negative latencies and same-day ties occur
        "l_shipdate": pd.to_datetime("1995-03-01")
        + pd.to_timedelta(rs.randint(0, 300 * 24, n_li), unit="h")})
    customer = pd.DataFrame({
        "c_custkey": np.arange(1, 41, dtype=np.int64),
        "c_name": [f"c{i}" for i in range(1, 41)],
        "c_nationkey": np.int32(0), "c_acctbal": 0.0,
        "c_mktsegment": [["AUTO", "BUILDING", "MACHINERY"][i % 3]
                         for i in range(40)]})
    n_vec = int(rs.randint(5, 60))
    dim = int(rs.randint(2, 9))
    emb = rs.randn(n_vec, dim).astype(np.float32)
    if n_vec >= 3:
        emb[2] = 0.0  # all-zero vector: the ma == 0 grid edge
    embeddings = pd.DataFrame({
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": [r for r in emb],
        "label": rs.randint(0, 4, n_vec).astype(np.int32)})
    d = tmp_path / f"cur2-{seed}"
    os.makedirs(d, exist_ok=True)
    docs.to_parquet(d / "documents.parquet", index=False)
    events.to_parquet(d / "events.parquet", index=False)
    orders.to_parquet(d / "orders.parquet", index=False)
    lineitem.to_parquet(d / "lineitem.parquet", index=False)
    customer.to_parquet(d / "customer.parquet", index=False)
    embeddings.to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "events", "orders", "lineitem", "customer",
              "embeddings"):
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _assert_equal(a: pd.DataFrame, b: pd.DataFrame, name: str):
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[sorted(b.columns)].sort_values(sorted(b.columns)) \
        .reset_index(drop=True)
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            av = a[c].astype(float).to_numpy()
            bv = b[c].astype(float).to_numpy()
            assert all((math.isnan(x) and math.isnan(y)) or x == y
                       for x, y in zip(av, bv)), f"{name}: col {c}"
        else:
            assert (a[c].astype(str) == b[c].astype(str)).all(), \
                f"{name}: col {c}"


_NEW = ["split_contamination", "rfm_segments", "hourly_top_event",
        "heaps_law_curve", "lineitem_value_corr",
        "session_overlap_peak", "doc_perplexity",
        "ship_latency_percentiles", "label_scatter",
        "reorder_gap_percentiles"]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("name", _NEW)
def test_curation2_matches_oracle_on_random_tables(ray_session, tmp_path,
                                                   seed, name):
    sf_dir = _write_tables(tmp_path, seed)
    ray_df = QUERIES[name](sf_dir)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    _assert_equal(ray_df, _oracle(sf_dir, ORACLE_SQL[name]), name)


def test_curation2_invariants(ray_session, tmp_path):
    sf_dir = _write_tables(tmp_path, 7)
    rfm = QUERIES["rfm_segments"](sf_dir)
    for c in ("r_score", "f_score", "m_score"):
        assert rfm[c].between(1, 4).all()
    heaps = QUERIES["heaps_law_curve"](sf_dir)
    assert (heaps["cum_vocab"] <= heaps["cum_tokens"]).all()
    assert heaps["cum_vocab"].is_monotonic_increasing
    peak = QUERIES["session_overlap_peak"](sf_dir)
    assert int(peak["peak"].iloc[0]) >= 1
    assert int(peak["n_sessions"].iloc[0]) >= int(peak["peak"].iloc[0])


def test_empty_input_parity_curation2(ray_session, tmp_path):
    """Zero-row fact tables: every op must return its SQL twin's
    empty-input shape — 0 rows everywhere except lineitem_value_corr's
    constant 6-row matrix with n=0 and NULL r."""
    d = tmp_path / "empty-cur2"
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                  "text": pd.Series([], dtype=object),
                  "lang": pd.Series([], dtype=object),
                  "source": pd.Series([], dtype=object),
                  "n_chars": pd.Series([], dtype="int64")}) \
        .to_parquet(d / "documents.parquet", index=False)
    pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                  "user_id": pd.Series([], dtype="int64"),
                  "event_type": pd.Series([], dtype=object),
                  "value": pd.Series([], dtype="float64"),
                  "ts": pd.Series([], dtype="datetime64[us]")}) \
        .to_parquet(d / "events.parquet", index=False)
    pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                  "o_custkey": pd.Series([], dtype="int64"),
                  "o_totalprice": pd.Series([], dtype="float64"),
                  "o_orderdate": pd.Series([], dtype="datetime64[us]")}) \
        .to_parquet(d / "orders.parquet", index=False)
    pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                  "l_quantity": pd.Series([], dtype="float64"),
                  "l_extendedprice": pd.Series([], dtype="float64"),
                  "l_discount": pd.Series([], dtype="float64"),
                  "l_tax": pd.Series([], dtype="float64"),
                  "l_shipdate": pd.Series([], dtype="datetime64[us]")}) \
        .to_parquet(d / "lineitem.parquet", index=False)
    pd.DataFrame({"c_custkey": [1], "c_mktsegment": ["AUTO"]}) \
        .to_parquet(d / "customer.parquet", index=False)
    pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                  "embedding": pd.Series([], dtype=object),
                  "label": pd.Series([], dtype="int32")}) \
        .to_parquet(d / "embeddings.parquet", index=False)
    sd = str(d)
    assert len(QUERIES["split_contamination"](sd)) == 0
    assert len(QUERIES["rfm_segments"](sd)) == 0
    assert len(QUERIES["hourly_top_event"](sd)) == 0
    assert len(QUERIES["heaps_law_curve"](sd)) == 0
    assert len(QUERIES["session_overlap_peak"](sd)) == 0
    corr = QUERIES["lineitem_value_corr"](sd)
    assert len(corr) == 6
    assert (corr["n"] == 0).all() and corr["r"].isna().all()
    assert len(QUERIES["doc_perplexity"](sd)) == 0
    assert len(QUERIES["ship_latency_percentiles"](sd)) == 0
    assert len(QUERIES["label_scatter"](sd)) == 0
    assert len(QUERIES["reorder_gap_percentiles"](sd)) == 0
