"""Randomized end-to-end equivalence for the round-4e family
(kmv_distinct / padding_waste / token_fertility / curriculum_schedule):
seeded random corpora — KMV-saturated and sub-k event types, empty
texts, tied difficulty values — must match the DuckDB oracle
bit-for-bit, plus closed-form invariants and empty-input parity."""

import hashlib
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
    n_docs = int(rs.randint(40, 300))
    texts = []
    for _ in range(n_docs):
        k = int(rs.randint(0, 30))
        texts.append(" ".join(_WORDS[i]
                              for i in rs.randint(0, len(_WORDS), k)))
    for i in range(0, n_docs, 11):
        texts[i] = ""  # zero-token docs: excluded by both sides
    docs = pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": [["en", "de", "fr"][i] for i in rs.randint(0, 3, n_docs)],
        "source": "s0",
        "n_chars": np.int64([len(t) for t in texts])})
    # one saturated type (>64 distinct users) + one tiny type (<64)
    n_ev = int(rs.randint(800, 2000))
    user = rs.randint(0, 500, n_ev).astype(np.int64)
    etype = np.where(rs.rand(n_ev) < 0.1, "rare", "common")
    user[etype == "rare"] = user[etype == "rare"] % 9  # <= 9 distinct
    events = pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "user_id": user, "event_type": etype,
        "value": np.round(rs.rand(n_ev) * 10, 2),
        "ts": pd.to_datetime("2024-05-01")
        + pd.to_timedelta(rs.randint(0, 86400, n_ev), unit="s")})
    d = tmp_path / f"cur4-{seed}"
    os.makedirs(d, exist_ok=True)
    docs.to_parquet(d / "documents.parquet", index=False)
    events.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "events"):
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


_NEW = ["kmv_distinct", "padding_waste", "token_fertility",
        "curriculum_schedule"]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("name", _NEW)
def test_curation4_matches_oracle_on_random_tables(ray_session, tmp_path,
                                                   seed, name):
    sf_dir = _write_tables(tmp_path, seed)
    ray_df = QUERIES[name](sf_dir)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    _assert_equal(ray_df, _oracle(sf_dir, ORACLE_SQL[name]), name)


def test_curation4_invariants(ray_session, tmp_path):
    sf_dir = _write_tables(tmp_path, 7)
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    events = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))

    # kmv: k_used == min(64, exact distinct); sub-k groups are EXACT;
    # saturated groups reproduce the estimator from the held hash
    kmv = QUERIES["kmv_distinct"](sf_dir).set_index("event_type")
    exact = events.groupby("event_type")["user_id"].nunique()
    for etype, nd in exact.items():
        row = kmv.loc[etype]
        assert int(row["k_used"]) == min(64, int(nd))
        if nd < 64:
            assert float(row["est_distinct"]) == float(nd)
        else:
            h48 = int(row["kth_hash"][:12], 16)
            assert float(row["est_distinct"]) == \
                float(np.float64(63.0) * np.float64(2.0 ** 48)
                      / np.float64(h48))
            # deterministic hash => the k-th hash is reproducible
            hs = sorted(hashlib.md5(str(u).encode()).hexdigest()
                        for u in events.loc[events["event_type"] == etype,
                                            "user_id"].unique())
            assert row["kth_hash"] == hs[63]

    # padding_waste: waste >= 0, efficiency in (0, 1], token total ties
    pw = QUERIES["padding_waste"](sf_dir)
    assert (pw["waste"] >= 0).all()
    assert ((pw["efficiency"] > 0) & (pw["efficiency"] <= 1)).all()
    n_tok = docs["text"].str.split().str.len()
    assert int(pw["sum_tokens"].sum()) == int(n_tok.sum())
    assert int(pw["n_docs"].sum()) == int((n_tok >= 1).sum())

    # token_fertility: tokens <= chars per lang => fertility in (0, 1]
    tf = QUERIES["token_fertility"](sf_dir)
    assert (tf["total_tokens"] <= tf["total_chars"]).all()
    assert ((tf["fertility"] > 0) & (tf["fertility"] <= 1)).all()

    # curriculum: deciles partition the tokenful docs; epoch rule holds
    cs = QUERIES["curriculum_schedule"](sf_dir)
    assert cs["decile"].between(1, 10).all()
    assert (cs["intro_epoch"]
            == (cs["decile"] - 1) // 3 + 1).all()
    assert int(cs["n_docs"].sum()) == int((n_tok >= 1).sum())
    assert cs["mean_difficulty"].is_monotonic_increasing


def test_empty_input_parity_curation4(ray_session, tmp_path):
    d = tmp_path / "empty-cur4"
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                  "text": pd.Series([], dtype="string"),
                  "lang": pd.Series([], dtype="string"),
                  "source": pd.Series([], dtype="string"),
                  "n_chars": pd.Series([], dtype="int64")}) \
        .to_parquet(d / "documents.parquet", index=False)
    pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                  "user_id": pd.Series([], dtype="int64"),
                  "event_type": pd.Series([], dtype="string"),
                  "value": pd.Series([], dtype="float64"),
                  "ts": pd.Series([], dtype="datetime64[us]")}) \
        .to_parquet(d / "events.parquet", index=False)
    sd = str(d)
    for name in _NEW:
        out = QUERIES[name](sd)
        assert len(out) == 0, name
        assert len(_oracle(sd, ORACLE_SQL[name])) == 0, name
