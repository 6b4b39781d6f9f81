"""Round-4r family checks (`dup_transitivity_gap`,
`activity_tier_migration`, `user_acquisition_curve`): seeded random
inputs — dup families sized inside the detector's 16-doc hot-fp guard,
users straddling month boundaries and tier edges (exactly 2/3/9/10
events), multi-batch user splits — must match the DuckDB oracles
bit-for-bit; plus invariants and empty-input parity."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_oxide_ray.queries import ORACLE_SQL, QUERIES


def _write_docs(tmp_path, seed: int, n_docs: int) -> str:
    rs = np.random.RandomState(seed)
    words = np.array([f"w{i:03d}" for i in range(40)], dtype=object)
    texts = []
    for i in range(n_docs):
        k = rs.randint(30, 90)
        texts.append(" ".join(words[rs.randint(0, 40, k)]))
    # two dup families (sizes 8 and 5, inside the 16-doc hot-fp guard)
    for i in range(0, 8):
        texts[i * 13] = texts[0]
    for i in range(0, 5):
        texts[3 + i * 17] = texts[3]
    d = tmp_path / f"cur17d-{seed}-{n_docs}"
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": pd.Series(texts, dtype=object),
        "lang": "en",
        "source": pd.Series([f"s{i % 4}" for i in range(n_docs)],
                            dtype=object),
        "n_chars": pd.Series([len(t) for t in texts], dtype="int64"),
    }).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _write_events(tmp_path, seed: int, n_ev: int, n_users: int) -> str:
    rs = np.random.RandomState(seed)
    base = pd.Timestamp("2024-01-15").value // 1000  # us
    span = 150 * 86_400_000_000  # ~5 months
    ts = base + rs.randint(0, span, n_ev).astype(np.int64)
    uid = rs.randint(0, n_users, n_ev).astype(np.int64)
    # tier-edge users: exactly 2 / 3 / 9 / 10 events in one
    # epoch-anchored week (bursts pinned to a week START so they
    # never straddle the boundary), then a follow-up burst exactly
    # one week later so each edge user migrates
    week = 7 * 86_400_000_000
    w0 = (pd.Timestamp("2024-02-01").value // 1000 // week + 1) * week
    edge = []
    for j, cnt in enumerate((2, 3, 9, 10)):
        for k in range(cnt):
            edge.append((n_users + j, w0 + k * 3_600_000_000))
        for k in range(j + 1):
            edge.append((n_users + j,
                         w0 + week + k * 3_600_000_000))
    ev = pd.DataFrame({
        "event_id": np.arange(n_ev + len(edge), dtype=np.int64),
        "user_id": np.concatenate(
            [uid, np.array([e[0] for e in edge], dtype=np.int64)]),
        "event_type": "view",
        "value": 1.0,
        "props": "{}",
        "ts": pd.to_datetime(np.concatenate(
            [ts, np.array([e[1] for e in edge], dtype=np.int64)]),
            unit="us")})
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    d = tmp_path / f"cur17e-{seed}-{n_ev}"
    os.makedirs(d, exist_ok=True)
    ev.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "events"):
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
            both_nan = np.isnan(av) & np.isnan(bv)
            assert bool(np.all(both_nan | (av == bv))), f"{name}.{c}"
        elif a[c].dtype.kind == "M" or b[c].dtype.kind == "M":
            assert a[c].astype("datetime64[us]").tolist() \
                == b[c].astype("datetime64[us]").tolist(), f"{name}.{c}"
        else:
            assert a[c].tolist() == b[c].tolist(), f"{name}.{c}"


@pytest.mark.parametrize("seed", [0, 6])
def test_transitivity_gap_matches_oracle(ray_session, tmp_path, seed):
    d = _write_docs(tmp_path, seed, 130)
    mine = QUERIES["dup_transitivity_gap"](d)
    gold = _oracle(d, ORACLE_SQL["dup_transitivity_gap"])
    _assert_equal(mine, gold, "dup_transitivity_gap")
    assert len(mine) >= 2  # the two injected dup families
    # exact-copy families share every fp -> detector emits the clique
    assert (mine["completeness"] == 1.0).all()
    assert (mine["n_implied"]
            == mine["m"] * (mine["m"] - 1) // 2).all()


@pytest.mark.parametrize("seed", [1, 8])
def test_tier_migration_matches_oracle(ray_session, tmp_path, seed):
    d = _write_events(tmp_path, seed, 4000, 60)
    mine = QUERIES["activity_tier_migration"](d)
    gold = _oracle(d, ORACLE_SQL["activity_tier_migration"])
    _assert_equal(mine, gold, "activity_tier_migration")
    assert len(mine) > 0
    tiers = {"low", "mid", "high"}
    assert set(mine["tier_from"]) <= tiers
    assert set(mine["tier_to"]) <= tiers


@pytest.mark.parametrize("seed", [2, 9])
def test_acquisition_curve_matches_oracle(ray_session, tmp_path, seed):
    d = _write_events(tmp_path, seed, 3000, 80)
    mine = QUERIES["user_acquisition_curve"](d)
    gold = _oracle(d, ORACLE_SQL["user_acquisition_curve"])
    _assert_equal(mine, gold, "user_acquisition_curve")
    # every user acquired exactly once; curve is monotone
    assert int(mine["n_new"].sum()) == 80 + 4
    assert (np.diff(mine["cum_users"].to_numpy(np.int64)) > 0).all()
    assert int(mine["cum_users"].iloc[-1]) == 84


def test_empty_input_parity_curation_r4r(ray_session, tmp_path):
    d = tmp_path / "empty17"
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                  "text": pd.Series([], dtype="string"),
                  "lang": pd.Series([], dtype="string"),
                  "source": pd.Series([], dtype="string"),
                  "n_chars": pd.Series([], dtype="int64")}) \
        .to_parquet(d / "documents.parquet", index=False)
    pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                  "ts": pd.Series([], dtype="datetime64[us]"),
                  "user_id": pd.Series([], dtype="int64"),
                  "event_type": pd.Series([], dtype="string"),
                  "value": pd.Series([], dtype="float64"),
                  "props": pd.Series([], dtype="string")}) \
        .to_parquet(d / "events.parquet", index=False)
    for name in ("dup_transitivity_gap", "activity_tier_migration",
                 "user_acquisition_curve"):
        assert len(QUERIES[name](str(d))) == 0, name
