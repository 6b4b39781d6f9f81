"""Round-4ac family checks (`median_user_value_by_type`,
`revenue_drawdown`, `markov_entropy_rate`): seeded random inputs plus
forced shapes — even-count user groups (disc-rule lower pick),
negative values (half-away on negatives), a known dip (exact
drawdown), monotonic revenue (zero drawdown at the first day),
repeated peak values (earliest-day tie rule), a deterministic chain
(entropy rate exactly 0) and an empty event table (the twin's single
(0, NULL) aggregate row) — must match the DuckDB oracles
bit-for-bit."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_oxide_ray.queries import ORACLE_SQL, QUERIES


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "orders"):
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
        else:
            av = a[c]
            bv = b[c]
            if av.dtype.kind == "M" or bv.dtype.kind == "M":
                av = pd.to_datetime(av)
                bv = pd.to_datetime(bv)
            assert av.tolist() == bv.tolist(), f"{name}.{c}"


def _write_events(d, user_ids, types, values):
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
        "value": np.asarray(values, dtype=np.float64),
        "props": "{}",
    }).to_parquet(d / "events.parquet", index=False)
    return str(d)


def _write_orders(d, dates, prices):
    os.makedirs(d, exist_ok=True)
    n = len(dates)
    pd.DataFrame({
        "o_orderkey": np.arange(1, n + 1, dtype=np.int64),
        "o_custkey": np.arange(n, dtype=np.int64) % 7,
        "o_orderstatus": "O",
        "o_totalprice": np.asarray(prices, dtype=np.float64),
        "o_orderdate": pd.to_datetime(dates).astype("datetime64[us]"),
        "o_orderpriority": "1-URGENT",
    }).to_parquet(d / "orders.parquet", index=False)
    return str(d)


@pytest.mark.parametrize("seed", [0, 17])
def test_median_of_medians_random(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = 900
    d = _write_events(
        tmp_path / f"mm-{seed}",
        rng.integers(0, 200, n),       # users span many %64 buckets
        rng.choice(["view", "click", "buy"], n),
        np.round(rng.normal(0, 50, n), 2))  # negatives included
    mine = QUERIES["median_user_value_by_type"](d)
    gold = _oracle(d, ORACLE_SQL["median_user_value_by_type"])
    _assert_equal(mine, gold, "median_user_value_by_type")


def test_median_of_medians_even_groups(ray_session, tmp_path):
    """Even-sized groups at BOTH levels: user medians pick the lower
    middle (disc rule), and 4 users per type pick the 2nd-smallest
    user median."""
    user = [1, 1, 2, 2, 3, 3, 4, 4]
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    d = _write_events(tmp_path / "mm-even", user, ["t"] * 8, vals)
    mine = QUERIES["median_user_value_by_type"](d)
    gold = _oracle(d, ORACLE_SQL["median_user_value_by_type"])
    _assert_equal(mine, gold, "median_of_medians-even")
    # user medians: 1,3,5,7 -> median-of-medians = 3 (lower middle)
    assert mine["median_of_medians"].iloc[0] == 3.0
    assert int(mine["n_users"].iloc[0]) == 4


def test_revenue_drawdown_known_dip(ray_session, tmp_path):
    """Days: +100, +50, -120(refund-heavy day 30), +10, -45, +200.
    Cumulative: 100,150,30,40,-5,195 -> peak 150 on day 2, trough -5
    on day 5, max drawdown 155."""
    dates = [f"2024-01-{dd:02d}" for dd in (1, 2, 3, 4, 5, 6)]
    prices = [100.0, 50.0, -120.0, 10.0, -45.0, 200.0]
    d = _write_orders(tmp_path / "dd-dip", dates, prices)
    mine = QUERIES["revenue_drawdown"](d)
    gold = _oracle(d, ORACLE_SQL["revenue_drawdown"])
    _assert_equal(mine, gold, "revenue_drawdown-dip")
    r = mine.iloc[0]
    assert r["max_drawdown"] == 155.0
    assert pd.Timestamp(r["peak_day"]) == pd.Timestamp("2024-01-02")
    assert pd.Timestamp(r["trough_day"]) == pd.Timestamp("2024-01-05")


def test_revenue_drawdown_monotonic_and_ties(ray_session, tmp_path):
    # monotonic increase: drawdown 0, trough = first day
    d = _write_orders(tmp_path / "dd-mono",
                      ["2024-02-01", "2024-02-02", "2024-02-03"],
                      [10.0, 20.0, 30.0])
    mine = QUERIES["revenue_drawdown"](d)
    gold = _oracle(d, ORACLE_SQL["revenue_drawdown"])
    _assert_equal(mine, gold, "revenue_drawdown-mono")
    assert mine["max_drawdown"].iloc[0] == 0.0
    assert pd.Timestamp(mine["trough_day"].iloc[0]) \
        == pd.Timestamp("2024-02-01")
    # tied drawdowns (two equal dips) -> earliest trough day wins
    d2 = _write_orders(
        tmp_path / "dd-tie",
        ["2024-03-01", "2024-03-02", "2024-03-03",
         "2024-03-04", "2024-03-05"],
        [100.0, -40.0, 40.0, -40.0, 40.0])
    mine2 = QUERIES["revenue_drawdown"](d2)
    gold2 = _oracle(d2, ORACLE_SQL["revenue_drawdown"])
    _assert_equal(mine2, gold2, "revenue_drawdown-tie")
    assert pd.Timestamp(mine2["trough_day"].iloc[0]) \
        == pd.Timestamp("2024-03-02")


@pytest.mark.parametrize("seed", [3, 31])
def test_entropy_rate_random(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = 600
    d = _write_events(tmp_path / f"er-{seed}",
                      rng.integers(0, 30, n),
                      rng.choice(["a", "b", "c", "d"], n),
                      np.ones(n))
    mine = QUERIES["markov_entropy_rate"](d)
    gold = _oracle(d, ORACLE_SQL["markov_entropy_rate"])
    _assert_equal(mine, gold, "markov_entropy_rate")
    assert mine["entropy_rate"].iloc[0] > 0


def test_entropy_rate_deterministic_chain_and_empty(ray_session,
                                                    tmp_path):
    """A deterministic cycle a->b->c->a has p_ij = 1 everywhere ->
    entropy rate exactly 0. An empty event table returns the twin's
    single (0, NULL) aggregate row."""
    d = _write_events(tmp_path / "er-det", [7] * 9,
                      ["a", "b", "c"] * 3, np.ones(9))
    mine = QUERIES["markov_entropy_rate"](d)
    gold = _oracle(d, ORACLE_SQL["markov_entropy_rate"])
    _assert_equal(mine, gold, "markov_entropy_rate-det")
    assert mine["entropy_rate"].iloc[0] == 0.0
    d2 = _write_events(tmp_path / "er-empty", [], [], [])
    mine2 = QUERIES["markov_entropy_rate"](d2)
    gold2 = _oracle(d2, ORACLE_SQL["markov_entropy_rate"])
    _assert_equal(mine2, gold2, "markov_entropy_rate-empty")
    assert len(mine2) == 1 and int(mine2["n_states"].iloc[0]) == 0
