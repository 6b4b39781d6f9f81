"""Round-4m family checks (`geo_mean_by_type`, `bpe_train_steps`,
`kcenter_coreset`): random-input oracle equivalence for the geometric
mean (zero/negative values excluded on both sides), closed-form BPE
merge invariants (each merge shrinks the corpus symbol total by
exactly its occurrence count), k-center invariants (non-increasing
radii, distinct centers, deterministic start), and empty-input
parity."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_oxide_ray.queries import ORACLE_SQL, QUERIES


def _write_events(tmp_path, seed: int, n: int) -> str:
    rs = np.random.RandomState(seed)
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rs.randint(0, 10**6, n), unit="s"),
        "user_id": rs.randint(0, 50, n).astype(np.int64),
        "event_type": np.array(["view", "click", "buy"])[
            rs.randint(0, 3, n)].astype(object),
        # mix of positive, zero and negative values — only > 0 counts
        "value": np.round(rs.randn(n) * 5, 3),
        "props": "{}"})
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    d = tmp_path / f"cur12e-{seed}-{n}"
    os.makedirs(d, exist_ok=True)
    ev.to_parquet(d / "events.parquet", index=False)
    return str(d)


@pytest.mark.parametrize("seed", [0, 6])
def test_geo_mean_matches_oracle_random(ray_session, tmp_path, seed):
    d = _write_events(tmp_path, seed, 2500)
    mine = QUERIES["geo_mean_by_type"](d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    gold = con.execute(ORACLE_SQL["geo_mean_by_type"]).fetchdf()
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = gold[cols].sort_values(cols).reset_index(drop=True)
    assert a["event_type"].tolist() == b["event_type"].tolist()
    assert a["n"].tolist() == b["n"].tolist()
    assert (a["gmean"].to_numpy() == b["gmean"].to_numpy()).all()


def test_bpe_merge_invariants(ray_session):
    sf = "/root/testdata/sf0.001"
    out = QUERIES["bpe_train_steps"](sf)
    assert len(out) == 10
    assert out["step"].tolist() == list(range(1, 11))
    # each merge replaces pair_count 2-symbol occurrences with 1 symbol
    sym = out["corpus_symbols"].to_numpy(np.int64)
    cnt = out["pair_count"].to_numpy(np.int64)
    assert ((sym[:-1] - sym[1:]) == cnt[1:]).all()
    assert (cnt > 0).all()
    # merged tokens grow: later steps may merge earlier merges
    assert out["left"].str.len().max() >= 1


def test_kcenter_invariants(ray_session):
    sf = "/root/testdata/sf0.001"
    out = QUERIES["kcenter_coreset"](sf)
    assert len(out) == 20
    assert out["vec_id"].is_unique
    d = out["min_dist"].to_numpy(np.int64)
    assert d[0] == 0 and (d[1:] > 0).all()
    # greedy radii are non-increasing after the first pick
    assert (np.diff(d[1:]) <= 0).all()
    # deterministic start: the smallest vec_id in the table
    emb = pd.read_parquet(os.path.join(sf, "embeddings.parquet"),
                          columns=["vec_id"])
    assert int(out["vec_id"].iloc[0]) == int(emb["vec_id"].min())


def test_empty_input_parity_curation_r4m(ray_session, tmp_path):
    d = tmp_path / "empty12"
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                  "ts": pd.Series([], dtype="datetime64[us]"),
                  "user_id": pd.Series([], dtype="int64"),
                  "event_type": pd.Series([], dtype=object),
                  "value": pd.Series([], dtype="float64"),
                  "props": pd.Series([], dtype=object)}) \
        .to_parquet(d / "events.parquet", index=False)
    pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                  "text": pd.Series([], dtype=object),
                  "lang": pd.Series([], dtype=object),
                  "source": pd.Series([], dtype=object),
                  "n_chars": pd.Series([], dtype="int64")}) \
        .to_parquet(d / "documents.parquet", index=False)
    pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                  "embedding": pd.Series([], dtype=object),
                  "label": pd.Series([], dtype="int32")}) \
        .to_parquet(d / "embeddings.parquet", index=False)
    for name in ("geo_mean_by_type", "bpe_train_steps",
                 "kcenter_coreset"):
        assert len(QUERIES[name](str(d))) == 0, name
