"""Randomized end-to-end equivalence for the round-4i family
(`event_runs`, `oov_rate`, `bm25_search`):
seeded random event logs / corpora — including runs that span multiple
4096-row sorted batches (the whole-batch merge chain must fire),
timestamp ties, single-event users, empty and NULL documents — must
match the DuckDB oracles bit-for-bit, plus closed-form invariants and
empty-input parity."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_oxide_ray.queries import ORACLE_SQL, QUERIES


def _write_events(tmp_path, seed: int, n_ev: int, n_users: int,
                  run_user: bool = False) -> str:
    """Random event log; with run_user=True the first 60% of rows are
    ONE user emitting ONE type in a single consecutive block — at
    n_ev ≥ 9000 that run spans 2+ sorted 4096-row batches, forcing the
    whole-batch stitch chain."""
    rs = np.random.RandomState(seed)
    base = pd.Timestamp("2024-03-01").value // 1000  # us
    user = rs.randint(0, n_users, n_ev).astype(np.int64)
    etype = np.array(["view", "click", "buy", "view", "view"])[
        rs.randint(0, 5, n_ev)].astype(object)
    ts = base + rs.randint(0, 10**8, n_ev).astype(np.int64)
    ties = rs.randint(0, n_ev, max(2, n_ev // 40))
    ts[ties] = ts[ties[0]]
    if run_user:
        k = int(n_ev * 0.6)
        user[:k] = 99
        etype[:k] = "view"
        ts[:k] = base - 10**9 + np.arange(k, dtype=np.int64)
    events = pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "user_id": user,
        "event_type": etype,
        "value": np.round(rs.rand(n_ev), 2),
        "ts": pd.to_datetime(ts, unit="us")})
    d = tmp_path / f"cur8e-{seed}-{n_ev}-{int(run_user)}"
    os.makedirs(d, exist_ok=True)
    events.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _write_docs(tmp_path, seed: int, n_doc: int) -> str:
    rs = np.random.RandomState(seed)
    vocab = ["join", "spark", "window", "scan", "merge", "hash", "row",
             "batch", "filter", "sort", "agg", "key", "q%d" % seed,
             "zz_rare"]
    texts: list = []
    srcs: list = []
    for i in range(n_doc):
        if i % 17 == 0:
            texts.append("")  # empty doc
        elif i % 23 == 0:
            texts.append(None)  # NULL text
        else:
            n = rs.randint(1, 60)
            texts.append(" ".join(
                vocab[j] for j in rs.randint(0, len(vocab), n)))
        srcs.append(f"src{rs.randint(0, 4)}")
    docs = pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": pd.Series(texts, dtype=object),
        "lang": "en", "source": pd.Series(srcs, dtype=object),
        "n_chars": pd.Series([len(t or "") for t in texts],
                             dtype="int64")})
    d = tmp_path / f"cur8d-{seed}-{n_doc}"
    os.makedirs(d, exist_ok=True)
    docs.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _oracle(sf_dir: str, sql: str, table: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{table}.parquet')")
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


# 9000+ events: 3+ sorted batches — the cross-batch stitch MUST fire;
# run_user=True forces a single run spanning 2+ whole batches (the
# pending-merge chain)
@pytest.mark.parametrize("seed,n_ev,n_users,run_user", [
    (0, 400, 8, False), (1, 9000, 30, False), (2, 12000, 5, True),
    (3, 4097, 1, False)])
def test_event_runs_matches_oracle(ray_session, tmp_path, seed, n_ev,
                                   n_users, run_user):
    sf_dir = _write_events(tmp_path, seed, n_ev, n_users, run_user)
    _assert_equal(QUERIES["event_runs"](sf_dir),
                  _oracle(sf_dir, ORACLE_SQL["event_runs"], "events"),
                  f"event_runs-{seed}")


def test_event_runs_invariants(ray_session, tmp_path):
    sf_dir = _write_events(tmp_path, 11, 3000, 10)
    events = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    out = QUERIES["event_runs"](sf_dir).set_index("user_id")
    per = events.groupby("user_id").size()
    for u, n in per.items():
        # 1 <= n_runs <= n_events; longest_run <= n_events
        assert 1 <= out.loc[u, "n_runs"] <= n
        assert 1 <= out.loc[u, "longest_run"] <= n
    # Σ run lengths per user = n_events (checked via pandas islands)
    ev = events.sort_values(["user_id", "ts", "event_id"])
    brk = (ev["user_id"].ne(ev["user_id"].shift())
           | ev["event_type"].ne(ev["event_type"].shift()))
    isl = ev.assign(g=brk.cumsum()).groupby(["user_id", "g"]).size()
    n_runs = isl.groupby("user_id").size()
    longest = isl.groupby("user_id").max()
    assert (out["n_runs"] == n_runs).all()
    assert (out["longest_run"] == longest).all()


@pytest.mark.parametrize("seed,n_doc", [(0, 120), (1, 900)])
def test_oov_and_bm25_match_oracle(ray_session, tmp_path, seed, n_doc):
    sf_dir = _write_docs(tmp_path, seed, n_doc)
    for name in ("oov_rate", "bm25_search"):
        _assert_equal(QUERIES[name](sf_dir),
                      _oracle(sf_dir, ORACLE_SQL[name], "documents"),
                      f"{name}-{seed}")


def test_bm25_ranking_invariants(ray_session, tmp_path):
    sf_dir = _write_docs(tmp_path, 5, 300)
    out = QUERIES["bm25_search"](sf_dir)
    assert len(out) <= 20
    # scores non-increasing; doc_id ascending within equal scores
    s = out["score"].to_numpy()
    assert (np.diff(s) <= 0).all()
    ties = np.flatnonzero(np.diff(s) == 0)
    d = out["doc_id"].to_numpy()
    assert (d[ties + 1] > d[ties]).all()
    # every hit contains at least one query term
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    hit_text = docs.set_index("doc_id").loc[out["doc_id"], "text"]
    assert hit_text.fillna("").str.contains(
        "join|spark|window", regex=True).all()


def test_empty_input_parity_curation8(ray_session, tmp_path):
    d = tmp_path / "empty-cur8"
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                  "user_id": pd.Series([], dtype="int64"),
                  "event_type": pd.Series([], dtype="string"),
                  "value": pd.Series([], dtype="float64"),
                  "ts": pd.Series([], dtype="datetime64[us]")}) \
        .to_parquet(d / "events.parquet", index=False)
    pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                  "text": pd.Series([], dtype="string"),
                  "lang": pd.Series([], dtype="string"),
                  "source": pd.Series([], dtype="string"),
                  "n_chars": pd.Series([], dtype="int64")}) \
        .to_parquet(d / "documents.parquet", index=False)
    sd = str(d)
    for name, table in (("event_runs", "events"),
                        ("oov_rate", "documents"),
                        ("bm25_search", "documents")):
        out = QUERIES[name](sd)
        assert len(out) == 0, name
        assert len(_oracle(sd, ORACLE_SQL[name], table)) == 0, name
