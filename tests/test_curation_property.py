"""Randomized end-to-end equivalence for the round-4 curation family
(mixture_weights / novelty_curve / chunk_plan / hapax_stats /
interarrival_rate): for seeded random corpora — including empty texts,
exact duplicate docs, single-source corpora and tied timestamps — the
Ray pipeline must equal the DuckDB oracle on the same parquet files."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_oxide_ray.queries import ORACLE_SQL, QUERIES

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "the", "a",
          "of", "scan", "merge", "sort", "hash", "key", "row", "qq17x"]


def _write_corpus(tmp_path, seed: int) -> str:
    rs = np.random.RandomState(seed)
    n_docs = int(rs.randint(20, 220))
    n_sources = int(rs.randint(1, 7))
    texts, srcs = [], []
    for _ in range(n_docs):
        k = int(rs.randint(0, 300))  # long docs -> multiple chunks
        words = [_WORDS[i] for i in rs.randint(0, len(_WORDS), k)]
        texts.append(" ".join(words))
        srcs.append(f"s{int(rs.randint(0, n_sources))}")
    # force exact duplicates across the id range (novelty curve)
    for _ in range(n_docs // 4):
        i, j = rs.randint(0, n_docs, 2)
        texts[max(i, j)] = texts[min(i, j)]
    docs = pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts, "lang": "en",
        "source": np.asarray(srcs, object),
        "n_chars": np.int64([len(t) for t in texts])})
    n_ev = int(rs.randint(10, 400))
    events = pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "user_id": rs.randint(0, 9, n_ev).astype(np.int64),
        "event_type": [f"t{i}" for i in rs.randint(0, 4, n_ev)],
        "value": np.round(rs.rand(n_ev) * 10, 2),
        # tied timestamps on purpose (span-0 single-type corpora too)
        "ts": pd.to_datetime("2024-05-01")
        + pd.to_timedelta(rs.randint(0, 50, n_ev) * 1000, unit="us")})
    d = tmp_path / f"cur-{seed}"
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


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("name", ["mixture_weights", "novelty_curve",
                                  "chunk_plan", "hapax_stats",
                                  "interarrival_rate",
                                  "contamination_by_source",
                                  "dedup_cluster_sizes",
                                  "template_prefixes",
                                  "length_quality_grid",
                                  "token_budget_epochs"])
def test_curation_matches_oracle_on_random_corpus(ray_session, tmp_path,
                                                  seed, name):
    sf_dir = _write_corpus(tmp_path, seed)
    ray_df = QUERIES[name](sf_dir)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    _assert_equal(ray_df, _oracle(sf_dir, ORACLE_SQL[name]), name)


@pytest.mark.parametrize("seed", [0, 1])
def test_dup_canonical_matches_oracle(ray_session, tmp_path, seed):
    """dup_canonical rides the winnow graph + label propagation, the
    most expensive twin (recursive CTE) — 2 seeds keep the suite lean."""
    sf_dir = _write_corpus(tmp_path, seed)
    out = QUERIES["dup_canonical"](sf_dir)
    _assert_equal(out, _oracle(sf_dir, ORACLE_SQL["dup_canonical"]),
                  "dup_canonical")
    # the elected doc must belong to its component and the component
    # label is the min doc_id of the component, so doc_id >= component
    assert (out["doc_id"] >= out["component"]).all()


def test_template_threshold_and_epochs_null_edges(ray_session, tmp_path):
    """Hand-built edges: a prefix shared by exactly 3 docs is reported,
    one shared by 2 is not; a source whose docs are all empty text gets
    NULL epochs on both sides (and weight 0)."""
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["TEMPLATE: same lead-in here X tail-a",
                 "TEMPLATE: same lead-in here X tail-b",
                 "TEMPLATE: same lead-in here X tail-c",
                 "other lead-in pair shared by two",
                 "other lead-in pair shared by two!",
                 ""],
        "lang": "en",
        "source": ["s0", "s1", "s0", "s0", "s0", "szero"],
        "n_chars": np.int64([36, 36, 36, 32, 33, 0])})
    d = tmp_path / "tmpl-edge"
    os.makedirs(d, exist_ok=True)
    docs.to_parquet(d / "documents.parquet", index=False)
    tp = QUERIES["template_prefixes"](str(d))
    assert len(tp) == 1 and int(tp["n_docs"].iloc[0]) == 3 \
        and int(tp["n_sources"].iloc[0]) == 2
    _assert_equal(tp, _oracle(str(d), ORACLE_SQL["template_prefixes"]),
                  "template_prefixes_edge")
    ep = QUERIES["token_budget_epochs"](str(d))
    z = ep[ep["source"] == "szero"]
    assert len(z) == 1 and np.isnan(float(z["epochs"].iloc[0])) \
        and float(z["weight"].iloc[0]) == 0.0
    _assert_equal(ep, _oracle(str(d), ORACLE_SQL["token_budget_epochs"]),
                  "token_budget_epochs_edge")


def test_chunk_plan_boundaries_exact(ray_session, tmp_path):
    """Hand-checked boundary cases: n=0 -> no chunks; n=1 -> one chunk
    of 1; n=112 -> one chunk; n=113 -> two chunks (second is the
    17-token tail); n=128 -> two chunks (start 112, len 16)."""
    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["", "w", " ".join(["w"] * 112), " ".join(["w"] * 113),
                 " ".join(["w"] * 128)],
        "lang": "en", "source": "s", "n_chars": np.int64([0, 1, 1, 1, 1])})
    d = tmp_path / "edge"
    os.makedirs(d, exist_ok=True)
    docs.to_parquet(d / "documents.parquet", index=False)
    out = QUERIES["chunk_plan"](str(d))
    got = {int(i): g for i, g in out.groupby("doc_id")}
    assert 0 not in got
    assert len(got[1]) == 1 and got[1]["n_tok"].tolist() == [1]
    assert len(got[2]) == 1 and got[2]["n_tok"].tolist() == [112]
    assert got[3]["start_tok"].tolist() == [0, 112]
    assert got[3]["n_tok"].tolist() == [113, 1]
    assert got[4]["start_tok"].tolist() == [0, 112]
    assert got[4]["n_tok"].tolist() == [128, 16]
    _assert_equal(out, _oracle(str(d), ORACLE_SQL["chunk_plan"]),
                  "chunk_plan_edge")


def test_empty_input_parity_curation_r4b(ray_session, tmp_path):
    """Empty documents table: the six round-4b curation ops mirror the
    twin's zero-row shape (all are GROUP BYs over an empty relation)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "cur-empty"
    os.makedirs(d, exist_ok=True)
    # explicit Arrow schema: an empty pandas object column would land as
    # the parquet NULL type and break string functions in the twin
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string()), ("source", pa.string()),
                        ("n_chars", pa.int64())])
    pq.write_table(schema.empty_table(), d / "documents.parquet")
    for name in ("contamination_by_source", "dedup_cluster_sizes",
                 "template_prefixes", "length_quality_grid",
                 "token_budget_epochs", "dup_canonical"):
        out = QUERIES[name](str(d))
        assert len(out) == 0, name
        _assert_equal(out, _oracle(str(d), ORACLE_SQL[name]),
                      f"{name}_empty")


def test_mixture_weights_sum_to_one(ray_session, tmp_path):
    sf = _write_corpus(tmp_path, 9)
    w = QUERIES["mixture_weights"](sf)
    assert abs(float(w["weight"].sum()) - 1.0) < 1e-9
    # temperature flattens: max weight <= max share only when shares
    # are skewed; the invariant that always holds is ordering
    order_share = w.sort_values("share")["source"].tolist()
    order_weight = w.sort_values("weight")["source"].tolist()
    assert order_share == order_weight  # sqrt is monotone
