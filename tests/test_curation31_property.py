"""Round-4af family checks (`audience_overlap`,
`sentence_length_profile`): seeded random inputs plus forced shapes —
a zero-intersection type pair (the LEFT JOIN COALESCE twin path),
identical audiences (Jaccard exactly 1), users spanning many %64
buckets, fragment-only documents (no sentence terminator), trailing
terminators and empty segments — must match the DuckDB oracles
bit-for-bit."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_oxide_ray.queries import ORACLE_SQL, QUERIES


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "documents"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}')")
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
            av = a[c].to_numpy(np.float64)
            bv = b[c].to_numpy(np.float64)
            assert bool(np.all((np.isnan(av) & np.isnan(bv))
                               | (av == bv))), f"{name}.{c}"
        else:
            assert a[c].tolist() == b[c].tolist(), f"{name}.{c}"


def _write_events(d, user_ids, types):
    os.makedirs(d, exist_ok=True)
    n = len(user_ids)
    base = pd.Timestamp("2024-01-01").value // 1000
    pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(base + np.arange(n, dtype=np.int64)
                             * 1_000_000, unit="us")
        .astype("datetime64[us]"),
        "user_id": np.asarray(user_ids, dtype=np.int64),
        "event_type": pd.Series(types, dtype=object),
        "value": 1.0, "props": "{}",
    }).to_parquet(d / "events.parquet", index=False)
    return str(d)


def _write_docs(d, sources, texts):
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": pd.Series(texts, dtype=object),
        "lang": "en", "source": pd.Series(sources, dtype=object),
        "n_chars": pd.Series([len(t or "") for t in texts],
                             dtype="int64"),
    }).to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.mark.parametrize("seed", [0, 23])
def test_audience_overlap_random(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = 800
    d = _write_events(tmp_path / f"ao-{seed}",
                      rng.integers(0, 300, n),  # spans many %64 buckets
                      rng.choice(["view", "click", "buy", "churn"], n))
    mine = QUERIES["audience_overlap"](d)
    gold = _oracle(d, ORACLE_SQL["audience_overlap"])
    _assert_equal(mine, gold, "audience_overlap")
    assert len(mine) == 6  # 4 choose 2


def test_audience_overlap_forced(ray_session, tmp_path):
    """a and b share ALL users (Jaccard 1); c is disjoint from both
    (Jaccard 0 — must still be emitted)."""
    user = [1, 1, 2, 2, 3, 4]
    typ = ["a", "b", "a", "b", "c", "c"]
    d = _write_events(tmp_path / "ao-forced", user, typ)
    mine = QUERIES["audience_overlap"](d)
    gold = _oracle(d, ORACLE_SQL["audience_overlap"])
    _assert_equal(mine, gold, "audience_overlap-forced")
    m = mine.set_index(["type_a", "type_b"])
    assert m.loc[("a", "b"), "jaccard"] == 1.0
    assert m.loc[("a", "c"), "jaccard"] == 0.0
    assert int(m.loc[("a", "c"), "users_both"]) == 0
    assert len(mine) == 3


def test_audience_overlap_wide_domain(ray_session, tmp_path):
    """>63 distinct event types in one bucket: the single-int64 shift
    would silently wrap; the multi-word bitmask path must stay exact.
    All users share user_id%64, forcing every type into one bucket."""
    rng = np.random.default_rng(7)
    n_types = 70
    types_pool = [f"t{i:02d}" for i in range(n_types)]
    users = rng.integers(0, 50, 1200) * 64 + 5  # one %64 bucket
    typ = rng.choice(types_pool, 1200)
    # guarantee every type appears
    users = np.r_[users, np.arange(n_types, dtype=np.int64) * 64 + 5]
    typ = np.r_[typ, np.array(types_pool, dtype=object)]
    d = _write_events(tmp_path / "ao-wide", users, list(typ))
    mine = QUERIES["audience_overlap"](d)
    gold = _oracle(d, ORACLE_SQL["audience_overlap"])
    _assert_equal(mine, gold, "audience_overlap-wide")
    assert len(mine) == n_types * (n_types - 1) // 2


@pytest.mark.parametrize("seed", [3, 47])
def test_sentence_profile_random(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    pieces = ["the cat sat", "a dog ran far", "word", "x y z w v"]
    texts, srcs = [], []
    for s in ("s1", "s2"):
        for _ in range(100):
            k = rng.integers(1, 5)
            texts.append(". ".join(rng.choice(pieces, k)) + ".")
            srcs.append(s)
    d = _write_docs(tmp_path / f"sp-{seed}", srcs, texts)
    mine = QUERIES["sentence_length_profile"](d)
    gold = _oracle(d, ORACLE_SQL["sentence_length_profile"])
    _assert_equal(mine, gold, "sentence_length_profile")


def test_sentence_profile_forced(ray_session, tmp_path):
    """Fragments without terminators count as one sentence; '!?.'
    runs split once; empty segments (trailing dot, '..') drop."""
    texts = ["no terminator here",
             "one. two words!! three word sentence?",
             "...", "",
             "ends with dot."]
    d = _write_docs(tmp_path / "sp-forced", ["s0"] * 5, texts)
    mine = QUERIES["sentence_length_profile"](d)
    gold = _oracle(d, ORACLE_SQL["sentence_length_profile"])
    _assert_equal(mine, gold, "sentence_profile-forced")
    r = mine.iloc[0]
    # sentences: [no terminator here][one][two words][three word
    # sentence][ends with dot] = 5 sentences, 3+1+2+3+3=12 tokens
    assert int(r["n_sentences"]) == 5
    assert r["mean_sentence_tokens"] == 12.0 / 5.0
