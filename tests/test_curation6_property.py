"""Randomized end-to-end equivalence for the round-4g family
(lang_confusion / neyman_allocation / chao1_vocab): seeded random
corpora with constant-length strata (sigma = 0), single-doc strata,
empty texts, stopword-free (unknown-language) docs and hapax-heavy
tails must match the DuckDB oracle bit-for-bit, plus closed-form
invariants and empty-input parity."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_oxide_ray.queries import ORACLE_SQL, QUERIES

_WORDS = ["the", "and", "of", "der", "und", "ist", "le", "la", "et",
          "el", "los", "es", "scan", "merge", "qq17x", "zz9", "77",
          "hapaxish", "rareword", "uniqtok"]


def _write_docs(tmp_path, seed: int) -> str:
    rs = np.random.RandomState(seed)
    n_docs = int(rs.randint(50, 220))
    texts = []
    for i in range(n_docs):
        k = int(rs.randint(0, 60))
        toks = [_WORDS[j] for j in rs.randint(0, len(_WORDS), k)]
        # hapax tail: a unique token in every 3rd doc
        if i % 3 == 0:
            toks.append(f"hapax{i}x{seed}")
        texts.append(" ".join(toks))
    for i in range(0, n_docs, 11):
        texts[i] = ""  # zero-token docs
    sources = [f"s{i}" for i in rs.randint(0, 5, n_docs)]
    # one constant-length stratum (sigma = 0) and one single-doc stratum
    for i in range(n_docs):
        if sources[i] == "s0":
            texts[i] = "the and of"
    sources[0] = "only1"
    docs = pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": [["en", "de", "fr", "es"][i]
                 for i in rs.randint(0, 4, n_docs)],
        "source": sources,
        "n_chars": np.int64([len(t) for t in texts])})
    d = tmp_path / f"cur6-{seed}"
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


_NEW = ["lang_confusion", "neyman_allocation", "chao1_vocab"]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("name", _NEW)
def test_curation6_matches_oracle_on_random_tables(ray_session, tmp_path,
                                                   seed, name):
    sf_dir = _write_docs(tmp_path, seed)
    ray_df = QUERIES[name](sf_dir)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    _assert_equal(ray_df, _oracle(sf_dir, ORACLE_SQL[name]), name)


def test_neyman_all_constant_strata(ray_session, tmp_path):
    """Every stratum constant-length: all sigma = 0, total weight 0 —
    both sides must allocate zero everywhere."""
    d = tmp_path / "const-cur6"
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({
        "doc_id": np.arange(30, dtype=np.int64),
        "text": ["the and of"] * 30,
        "lang": ["en"] * 30,
        "source": [f"s{i % 3}" for i in range(30)],
        "n_chars": np.int64([11] * 30)}) \
        .to_parquet(d / "documents.parquet", index=False)
    out = QUERIES["neyman_allocation"](str(d))
    assert (out["sigma"] == 0.0).all()
    assert (out["alloc"] == 0).all()
    _assert_equal(out, _oracle(str(d), ORACLE_SQL["neyman_allocation"]),
                  "neyman_const")


def test_curation6_invariants(ray_session, tmp_path):
    sf_dir = _write_docs(tmp_path, 7)
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))

    # confusion census covers every doc; recall sums to 1 per label
    lc = QUERIES["lang_confusion"](sf_dir)
    assert int(lc["n_docs"].sum()) == len(docs)
    per_label = lc.groupby("lang")["recall"].sum()
    assert np.allclose(per_label.to_numpy(), 1.0)

    # neyman: budget fully allocated when any stratum varies;
    # zero-variance strata get zero
    na = QUERIES["neyman_allocation"](sf_dir)
    assert int(na["alloc"].sum()) == 10_000
    assert (na.loc[na["sigma"] == 0.0, "alloc"] == 0).all()
    assert int(na["n_docs"].sum()) == len(docs)

    # chao1 >= observed vocabulary; f1/f2 bounded by V
    ch = QUERIES["chao1_vocab"](sf_dir)
    assert (ch["chao1"] >= ch["v_obs"]).all()
    assert (ch["f1"] + ch["f2"] <= ch["v_obs"]).all()
    # exact per-source check against pandas
    tok = docs.assign(t=docs["text"].str.split()).explode("t").dropna(
        subset=["t"])
    vc = tok.groupby(["source", "t"]).size().reset_index(name="c")
    exp = vc.groupby("source")["c"].agg(
        v_obs="count", f1=lambda s: int((s == 1).sum()),
        f2=lambda s: int((s == 2).sum())).reset_index()
    merged = ch.merge(exp, on="source", suffixes=("", "_exp"))
    for c in ("v_obs", "f1", "f2"):
        assert (merged[c] == merged[f"{c}_exp"]).all(), c


def test_empty_input_parity_curation6(ray_session, tmp_path):
    d = tmp_path / "empty-cur6"
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
