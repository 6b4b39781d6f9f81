"""Round-4u family checks (`theil_sen_daily_trend`,
`spearman_qty_price`): seeded random inputs — an outlier day the
Theil-Sen median must shrug off, heavy value ties for the average-rank
correction, a monotone-nonlinear relation Spearman must catch — must
match the DuckDB oracles bit-for-bit; plus a scipy-free brute-force
Spearman cross-check, the bigint path, and empty/degenerate parity."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_oxide_ray.queries import ORACLE_SQL, QUERIES


def _write_orders(tmp_path, seed: int, n: int, n_days: int,
                  tag: str = "") -> str:
    rs = np.random.RandomState(seed)
    day = rs.randint(0, n_days, n).astype(np.int64)
    base = pd.Timestamp("2024-01-01").value // 1000
    price = np.round(rs.rand(n) * 500 + 10 + day * 2.0, 2)
    price[day == n_days // 2] += 50_000.0  # outlier day
    df = pd.DataFrame({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_custkey": np.int64(1),
        "o_orderstatus": "O",
        "o_totalprice": price,
        "o_orderdate": pd.to_datetime(
            base + day * 86_400_000_000, unit="us"),
        "o_orderpriority": "1-URGENT", "o_clerk": "c",
        "o_shippriority": np.int32(0), "o_comment": "x"})
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
    d = tmp_path / f"cur20o-{tag}{seed}-{n}"
    os.makedirs(d, exist_ok=True)
    df.to_parquet(d / "orders.parquet", index=False)
    return str(d)


def _write_lineitem(tmp_path, seed: int, n: int) -> str:
    rs = np.random.RandomState(seed)
    # few distinct quantities (heavy ties); price monotone in quantity
    # with noise + its own ties
    q = rs.randint(1, 12, n).astype(np.float64)
    p = np.round(q ** 2 * 10 + rs.randint(0, 5, n), 2)
    li = pd.DataFrame({
        "l_orderkey": np.arange(n, dtype=np.int64),
        "l_partkey": np.int64(1), "l_suppkey": np.int64(1),
        "l_linenumber": np.int32(1),
        "l_quantity": q,
        "l_extendedprice": p,
        "l_discount": 0.0, "l_tax": 0.0,
        "l_returnflag": "N", "l_linestatus": "O",
        "l_shipdate": pd.Timestamp("2024-01-01")})
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")
    d = tmp_path / f"cur20l-{seed}-{n}"
    os.makedirs(d, exist_ok=True)
    li.to_parquet(d / "lineitem.parquet", index=False)
    return str(d)


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}')")
    return con.execute(sql).fetchdf()


def _assert_equal(a: pd.DataFrame, b: pd.DataFrame, name: str):
    cols = sorted(a.columns)
    a = a[cols].reset_index(drop=True)
    b = b[sorted(b.columns)].reset_index(drop=True)
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), name
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            av = a[c].to_numpy(np.float64)
            bv = b[c].to_numpy(np.float64)
            both_nan = np.isnan(av) & np.isnan(bv)
            assert bool(np.all(both_nan | (av == bv))), f"{name}.{c}"
        else:
            assert a[c].tolist() == b[c].tolist(), f"{name}.{c}"


@pytest.mark.parametrize("seed", [0, 6])
def test_theil_sen_matches_oracle(ray_session, tmp_path, seed):
    d = _write_orders(tmp_path, seed, 2500, 40)
    mine = QUERIES["theil_sen_daily_trend"](d)
    gold = _oracle(d, ORACLE_SQL["theil_sen_daily_trend"])
    _assert_equal(mine, gold, "theil_sen_daily_trend")
    assert int(mine["n_days"].iloc[0]) == 40
    assert int(mine["n_pairs"].iloc[0]) == 40 * 39 // 2
    # robustness: the spiked day cannot drag the median slope to the
    # OLS-scale distortion; the underlying drift is ~2 * n/n_days $/day
    assert abs(mine["slope_per_day"].iloc[0]) < 2000


def test_theil_sen_single_day(ray_session, tmp_path):
    d = _write_orders(tmp_path, 3, 50, 1, tag="one")
    mine = QUERIES["theil_sen_daily_trend"](d)
    gold = _oracle(d, ORACLE_SQL["theil_sen_daily_trend"])
    _assert_equal(mine, gold, "theil_sen-single-day")
    assert int(mine["n_pairs"].iloc[0]) == 0
    assert np.isnan(mine["slope_per_day"].iloc[0])


@pytest.mark.parametrize("seed", [1, 8])
def test_spearman_matches_oracle_and_bruteforce(ray_session, tmp_path,
                                                seed):
    d = _write_lineitem(tmp_path, seed, 3000)
    mine = QUERIES["spearman_qty_price"](d)
    gold = _oracle(d, ORACLE_SQL["spearman_qty_price"])
    _assert_equal(mine, gold, "spearman_qty_price")
    # brute force: average ranks via pandas, Pearson on ranks
    li = pd.read_parquet(os.path.join(d, "lineitem.parquet"))
    xr = pd.Series(np.round(li["l_quantity"] * 100)).rank()
    yr = pd.Series(np.round(li["l_extendedprice"] * 100)).rank()
    brute = float(np.corrcoef(xr, yr)[0, 1])
    assert abs(mine["rho"].iloc[0] - brute) < 1e-9
    assert mine["rho"].iloc[0] > 0.9  # monotone by construction


def test_spearman_bigint_path_matches_int64_path(ray_session,
                                                 tmp_path,
                                                 monkeypatch):
    """Force the Python-bigint branch and pin it to the int64 branch's
    answer on the same input."""
    import pdf_oxide_ray.queries_curation20 as c20

    d = _write_lineitem(tmp_path, 4, 1500)
    fast = QUERIES["spearman_qty_price"](d)
    monkeypatch.setattr(c20, "_SPEARMAN_INT64_GATE", 10)
    slow = c20.q_spearman_qty_price(d)
    _assert_equal(fast, slow, "spearman-bigint-vs-int64")


def test_degenerate_constant_column(ray_session, tmp_path):
    """All-equal quantity: den_x = 0 -> rho NULL on both engines."""
    rs = np.random.RandomState(5)
    li = pd.DataFrame({
        "l_orderkey": np.arange(100, dtype=np.int64),
        "l_quantity": np.float64(7.0),
        "l_extendedprice": np.round(rs.rand(100) * 100, 2),
        "l_returnflag": "N"})
    d = tmp_path / "cur20const"
    os.makedirs(d, exist_ok=True)
    li.to_parquet(d / "lineitem.parquet", index=False)
    mine = QUERIES["spearman_qty_price"](str(d))
    gold = _oracle(str(d), ORACLE_SQL["spearman_qty_price"])
    _assert_equal(mine, gold, "spearman-constant")
    assert np.isnan(mine["rho"].iloc[0])


def test_empty_input_parity_curation_r4u(ray_session, tmp_path):
    d = tmp_path / "empty20"
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                  "o_custkey": pd.Series([], dtype="int64"),
                  "o_totalprice": pd.Series([], dtype="float64"),
                  "o_orderdate": pd.Series([],
                                           dtype="datetime64[us]")}) \
        .to_parquet(d / "orders.parquet", index=False)
    pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                  "l_quantity": pd.Series([], dtype="float64"),
                  "l_extendedprice": pd.Series([], dtype="float64")}) \
        .to_parquet(d / "lineitem.parquet", index=False)
    for name in ("theil_sen_daily_trend", "spearman_qty_price"):
        mine = QUERIES[name](str(d))
        gold = _oracle(str(d), ORACLE_SQL[name])
        _assert_equal(mine, gold, f"{name}-empty")
        assert len(mine) == 1
