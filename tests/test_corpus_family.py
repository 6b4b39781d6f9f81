"""Corpus-diagnostics family (queries_corpus.py): empty-input parity,
a hand-built cross-source duplicate scenario with a known dup matrix,
and Zipf-fit sanity on a synthetic power-law corpus."""

import os

import duckdb
import numpy as np
import pandas as pd

from pdf_oxide_ray.queries import ORACLE_SQL, QUERIES

NEW = ["token_zipf_fit", "source_gini", "source_dup_stats",
       "df_histogram", "lang_source_mi"]


def _docs_dir(tmp_path, df: pd.DataFrame, name: str) -> str:
    d = tmp_path / name
    os.makedirs(d, exist_ok=True)
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _oracle(d: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    return con.execute(ORACLE_SQL[name]).fetchdf()


def _assert_match(mine: pd.DataFrame, gold: pd.DataFrame, name: str):
    assert sorted(mine.columns) == sorted(gold.columns), name
    assert len(mine) == len(gold), f"{name}: {len(mine)} vs {len(gold)}"
    a = mine[sorted(mine.columns)].sort_values(
        sorted(mine.columns), kind="mergesort").reset_index(drop=True)
    b = gold[sorted(gold.columns)].sort_values(
        sorted(gold.columns), kind="mergesort").reset_index(drop=True)
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            av, bv = a[c].astype(float), b[c].astype(float)
            assert ((av.isna() & bv.isna())
                    | (av == bv)).all(), f"{name}: {c}"
        else:
            assert (a[c].astype(str) == b[c].astype(str)).all(), \
                f"{name}: {c}"


def test_empty_input_parity_corpus_ops(ray_session, tmp_path):
    """Empty documents: zipf mirrors the twin's single (0, NULL, NULL)
    aggregate row; the other four mirror zero-row twins."""
    d = _docs_dir(tmp_path, pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype=object),
        "lang": pd.Series([], dtype=object),
        "source": pd.Series([], dtype=object),
        "n_chars": pd.Series([], dtype="int64")}), "empty-corpus")
    z = QUERIES["token_zipf_fit"](d)
    assert len(z) == 1 and int(z["n_terms"].iloc[0]) == 0
    assert z["slope"].isna().all() and z["intercept"].isna().all()
    for name in ("source_gini", "source_dup_stats", "df_histogram",
                 "lang_source_mi"):
        assert len(QUERIES[name](d)) == 0, name


def test_revenue_concentration_edges(ray_session, tmp_path):
    """One dominant customer: top-1% (k=1 of 3) share is exactly its
    fraction; empty orders mirror the zero-row twin."""
    d = tmp_path / "conc"
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({
        "o_orderkey": np.arange(4, dtype=np.int64),
        "o_custkey": np.int64([1, 2, 3, 3]),
        "o_totalprice": [800.0, 150.0, 25.0, 25.0]}) \
        .to_parquet(d / "orders.parquet", index=False)
    out = QUERIES["revenue_concentration"](str(d)).set_index("p")
    assert (out["n_cust"] == 3).all()
    assert out.loc[0.01, "share"] == 0.8  # k=ceil(3*0.01)=1 -> top cust
    assert out.loc[0.50, "share"] == 0.95  # k=2 -> 800+150 of 1000
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{d}/orders.parquet')")
    _assert_match(out.reset_index(),
                  con.execute(ORACLE_SQL["revenue_concentration"]).fetchdf(),
                  "revenue_concentration")
    d2 = tmp_path / "conc-empty"
    os.makedirs(d2, exist_ok=True)
    pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                  "o_custkey": pd.Series([], dtype="int64"),
                  "o_totalprice": pd.Series([], dtype="float64")}) \
        .to_parquet(d2 / "orders.parquet", index=False)
    assert len(QUERIES["revenue_concentration"](str(d2))) == 0


def test_source_dup_stats_known_matrix(ray_session, tmp_path):
    """Hand-built corpus: 'AAA' appears in s1 (keeper, doc 1) + two
    later copies (one per source); 'BBB' is unique; NULL text and ''
    text are the same dup group (coalesce on both sides)."""
    df = pd.DataFrame({
        "doc_id": np.arange(1, 8, dtype=np.int64),
        "text": ["AAA", "BBB", "AAA", "AAA", None, "", "CCC"],
        "lang": "en",
        "source": ["s1", "s1", "s1", "s2", "s2", "s3", "s3"],
        "n_chars": np.int64(3)})
    d = _docs_dir(tmp_path, df, "dup-matrix")
    out = QUERIES["source_dup_stats"](d).set_index("source")
    # s1: docs 1,2,3 -> doc 3 dups doc 1            => 1/3
    # s2: docs 4 (dups doc 1), 5 (NULL, keeper of '') => 1/2
    # s3: docs 6 ('' dups NULL doc 5), 7 unique       => 1/2
    assert out.loc["s1", "n_docs"] == 3 and out.loc["s1", "n_dups"] == 1
    assert out.loc["s2", "n_docs"] == 2 and out.loc["s2", "n_dups"] == 1
    assert out.loc["s3", "n_docs"] == 2 and out.loc["s3", "n_dups"] == 1
    _assert_match(out.reset_index(), _oracle(d, "source_dup_stats"),
                  "source_dup_stats")


def test_zipf_fit_power_law_slope(ray_session, tmp_path):
    """A corpus drawn exactly Zipfian (term i repeated floor(N/i) times)
    must fit slope ~ -1; engine matches the twin bit-for-bit."""
    rng = np.random.default_rng(7)
    words = []
    for i in range(1, 200):
        words += [f"w{i:03d}"] * (2000 // i)
    rng.shuffle(words)
    texts = [" ".join(words[i:i + 50]) for i in range(0, len(words), 50)]
    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts, "lang": "en", "source": "zipf",
        "n_chars": pd.Series([len(t) for t in texts], dtype="int64")})
    d = _docs_dir(tmp_path, df, "zipf")
    out = QUERIES["token_zipf_fit"](d)
    assert -1.3 < float(out["slope"].iloc[0]) < -0.7
    _assert_match(out, _oracle(d, "token_zipf_fit"), "token_zipf_fit")


def test_gini_extremes(ray_session, tmp_path):
    """Equal lengths -> Gini 0 exactly; one-doc source -> Gini 0; a
    maximally-skewed source beats a balanced one."""
    df = pd.DataFrame({
        "doc_id": np.arange(9, dtype=np.int64),
        "text": "t",
        "lang": "en",
        "source": ["eq"] * 3 + ["skew"] * 3 + ["solo"] + ["mix"] * 2,
        "n_chars": pd.Series([5, 5, 5, 1, 1, 1000, 7, 3, 9],
                             dtype="int64")})
    d = _docs_dir(tmp_path, df, "gini")
    out = QUERIES["source_gini"](d).set_index("source")
    assert out.loc["eq", "gini"] == 0.0
    assert out.loc["solo", "gini"] == 0.0
    assert out.loc["skew", "gini"] > out.loc["mix", "gini"] > 0.0
    _assert_match(out.reset_index(), _oracle(d, "source_gini"),
                  "source_gini")


def test_lang_source_mi_extremes(ray_session, tmp_path):
    """Perfectly language-segregated sources give MI = H(lang) =
    ln(2) for a 50/50 split; fully mixed sources give MI = 0."""
    seg = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64), "text": "t",
        "lang": ["en", "en", "de", "de"],
        "source": ["s1", "s1", "s2", "s2"],
        "n_chars": np.int64(1)})
    d = _docs_dir(tmp_path, seg, "mi-seg")
    mi = float(QUERIES["lang_source_mi"](d)["mi"].iloc[0])
    assert abs(mi - np.log(2)) < 1e-5
    mixed = seg.assign(source=["s1", "s2", "s1", "s2"])
    d2 = _docs_dir(tmp_path, mixed, "mi-mix")
    mi2 = float(QUERIES["lang_source_mi"](d2)["mi"].iloc[0])
    assert abs(mi2) < 1e-5
    _assert_match(QUERIES["lang_source_mi"](d), _oracle(d, "lang_source_mi"),
                  "lang_source_mi")
