"""Randomized end-to-end equivalence for the round-4d family
(split_token_kl / quota_allocation / rank_normalize_by_source): seeded
random corpora — multi-lang, multi-source, duplicate lengths, empty
texts, singleton strata — must match the DuckDB oracle bit-for-bit,
plus closed-form invariants and empty-input parity."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_oxide_ray.queries import ORACLE_SQL, QUERIES

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "the", "a",
          "of", "scan", "merge", "sort", "hash", "key", "row", "qq17x"]


def _write_docs(tmp_path, seed: int) -> str:
    rs = np.random.RandomState(seed)
    n_docs = int(rs.randint(40, 300))
    texts = []
    for _ in range(n_docs):
        k = int(rs.randint(0, 30))
        texts.append(" ".join(_WORDS[i]
                              for i in rs.randint(0, len(_WORDS), k)))
    # duplicate lengths on purpose (rank ties) + a few empty texts
    for i in range(0, n_docs, 11):
        texts[i] = ""
    docs = pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": [["en", "de", "fr"][i] for i in rs.randint(0, 3, n_docs)],
        "source": [f"s{i}" for i in rs.randint(0, 5, n_docs)],
        "n_chars": np.int64([len(t) for t in texts])})
    d = tmp_path / f"cur3-{seed}"
    os.makedirs(d, exist_ok=True)
    docs.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
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


_NEW = ["split_token_kl", "quota_allocation", "rank_normalize_by_source"]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("name", _NEW)
def test_curation3_matches_oracle_on_random_tables(ray_session, tmp_path,
                                                   seed, name):
    sf_dir = _write_docs(tmp_path, seed)
    ray_df = QUERIES[name](sf_dir)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    _assert_equal(ray_df, _oracle(sf_dir, ORACLE_SQL[name]), name)


def test_curation3_invariants(ray_session, tmp_path):
    sf_dir = _write_docs(tmp_path, 7)
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    n_total = len(docs)

    # quota_allocation: Hamilton quotas sum EXACTLY to the rounded
    # global budget, every doc is assigned to exactly one split, and
    # each cell is within one doc of its proportional share
    q = QUERIES["quota_allocation"](sf_dir)
    budget = int(np.floor(abs(0.05 * n_total) + 0.5))
    assert int(q["val_quota"].sum()) == budget
    assert int(q["test_quota"].sum()) == budget
    assert int((q["val_quota"] + q["test_quota"]
                + q["train_quota"]).sum()) == n_total
    share = q["n_docs"].to_numpy(np.float64) * budget / n_total
    assert (np.abs(q["val_quota"].to_numpy(np.float64) - share)
            < 1.0 + 1e-9).all()

    # split_token_kl: KL over the renormalized shared vocabulary is
    # non-negative up to the 1e-6 quantization grid
    kl = QUERIES["split_token_kl"](sf_dir)
    assert (kl["kl"] >= -1e-3).all()
    assert (kl["shared_vocab"] >= 1).all()

    # rank_normalize_by_source: mean_cume in (0, 1]; the doc-weighted
    # grand mean equals sum(c(x) * c_le(x)) / N^2 computed directly
    r = QUERIES["rank_normalize_by_source"](sf_dir)
    assert ((r["mean_cume"] > 0) & (r["mean_cume"] <= 1)).all()
    c = docs["n_chars"].value_counts().sort_index()
    grand = float((c.to_numpy(np.int64)
                   * c.to_numpy(np.int64).cumsum()).sum()) / n_total ** 2
    weighted = float((r["mean_cume"] * r["n_docs"]).sum()) / n_total
    assert abs(weighted - grand) < 1e-12


def test_empty_input_parity_curation3(ray_session, tmp_path):
    d = tmp_path / "empty-cur3"
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                  "text": pd.Series([], dtype="string"),
                  "lang": pd.Series([], dtype="string"),
                  "source": pd.Series([], dtype="string"),
                  "n_chars": pd.Series([], dtype="int64")}) \
        .to_parquet(d / "documents.parquet", index=False)
    sd = str(d)
    for name in _NEW:
        out = QUERIES[name](sd)
        assert len(out) == 0, name
        assert len(_oracle(sd, ORACLE_SQL[name])) == 0, name
