"""Randomized end-to-end equivalence for `event_burstiness`: seeded
random event logs with bursty and periodic types, timestamp ties,
single-event types, all-same-timestamp types (zero gaps -> NULL
burstiness) and corpora spanning many 4096-row batches (the boundary
stitch must fire) must match the DuckDB oracle bit-for-bit, plus
closed-form invariants and empty-input parity."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_oxide_ray.queries import ORACLE_SQL, QUERIES


def _write_events(tmp_path, seed: int, n_ev: int) -> str:
    rs = np.random.RandomState(seed)
    base = pd.Timestamp("2024-03-01").value // 1000  # us
    etype = np.array(["bursty", "periodic", "mixed"])[
        rs.randint(0, 3, n_ev)].astype(object)
    ts = np.empty(n_ev, dtype=np.int64)
    # bursty: exponential-ish clumps; periodic: fixed stride; mixed:
    # uniform. A few exact ties (same us) exercise the (ts, id) order.
    ts[:] = base + rs.randint(0, 10**9, n_ev)
    per = etype == "periodic"
    ts[per] = base + np.arange(per.sum(), dtype=np.int64) * 1_000_000
    ties = rs.randint(0, n_ev, max(2, n_ev // 50))
    ts[ties] = ts[ties[0]]
    # one single-event type and one all-same-timestamp type
    etype[0] = "lonely"
    same = slice(1, 5)
    etype[same] = "frozen"
    ts[same] = base + 77
    events = pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "user_id": rs.randint(0, 50, n_ev).astype(np.int64),
        "event_type": etype,
        "value": np.round(rs.rand(n_ev), 2),
        "ts": pd.to_datetime(ts, unit="us")})
    d = tmp_path / f"cur7-{seed}-{n_ev}"
    os.makedirs(d, exist_ok=True)
    events.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
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


# 9000 events -> 3+ batches of 4096: the cross-batch stitch MUST fire
@pytest.mark.parametrize("seed,n_ev", [(0, 400), (1, 9000), (2, 1500)])
def test_burstiness_matches_oracle_on_random_tables(ray_session,
                                                    tmp_path, seed,
                                                    n_ev):
    sf_dir = _write_events(tmp_path, seed, n_ev)
    _assert_equal(QUERIES["event_burstiness"](sf_dir),
                  _oracle(sf_dir, ORACLE_SQL["event_burstiness"]),
                  f"event_burstiness-{seed}")


def test_burstiness_invariants(ray_session, tmp_path):
    sf_dir = _write_events(tmp_path, 7, 3000)
    events = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    out = QUERIES["event_burstiness"](sf_dir).set_index("event_type")

    # gap count census: n_events - 1 per type with >= 1 event
    per = events.groupby("event_type").size()
    for t, n in per.items():
        assert int(out.loc[t, "n_gaps"]) == n - 1
    # the single-event type reports NULL stats
    assert math.isnan(out.loc["lonely", "burstiness"])
    # the all-same-timestamp type: zero gaps -> sigma+mu = 0 -> NULL
    assert out.loc["frozen", "n_gaps"] == 3
    assert math.isnan(out.loc["frozen", "burstiness"])
    # B in [-1, 1] wherever defined; periodic stride -> B near -1
    defined = out["burstiness"].dropna()
    assert ((defined >= -1) & (defined <= 1)).all()
    assert out.loc["periodic", "burstiness"] < -0.5
    # exact moment check vs pandas
    ev = events.sort_values(["event_type", "ts", "event_id"])
    g = ev.groupby("event_type")["ts"].diff().dropna()
    gus = (g.dt.total_seconds() * 1e6).round().astype(np.int64)
    grp = gus.groupby(ev.loc[gus.index, "event_type"])
    for t, s in grp:
        mu = s.sum() / len(s)
        assert out.loc[t, "mean_gap_us"] == pytest.approx(mu, rel=1e-12)


def test_burstiness_gap_guard(ray_session, tmp_path):
    """Gaps >= 2^45 us must raise the documented loud error, never
    wrap silently."""
    d = tmp_path / "huge-gap"
    os.makedirs(d, exist_ok=True)
    base = pd.Timestamp("2024-01-01").value // 1000
    pd.DataFrame({
        "event_id": np.arange(2, dtype=np.int64),
        "user_id": np.int64([1, 1]),
        "event_type": ["t", "t"],
        "value": [0.0, 0.0],
        "ts": pd.to_datetime(
            np.array([base, base + (1 << 45)], dtype=np.int64),
            unit="us")}).to_parquet(d / "events.parquet", index=False)
    with pytest.raises(Exception, match="2\\^45|hi/lo"):
        QUERIES["event_burstiness"](str(d))


def test_empty_input_parity_curation7(ray_session, tmp_path):
    d = tmp_path / "empty-cur7"
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                  "user_id": pd.Series([], dtype="int64"),
                  "event_type": pd.Series([], dtype="string"),
                  "value": pd.Series([], dtype="float64"),
                  "ts": pd.Series([], dtype="datetime64[us]")}) \
        .to_parquet(d / "events.parquet", index=False)
    sd = str(d)
    out = QUERIES["event_burstiness"](sd)
    assert len(out) == 0
    assert len(_oracle(sd, ORACLE_SQL["event_burstiness"])) == 0
