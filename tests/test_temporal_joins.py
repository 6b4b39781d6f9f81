"""As-of and range-band joins (custom temporal operators) on known data."""

import pandas as pd
import ray.data as rd

from pdf_oxide_ray.stages.joins import asof_join, range_count_join


def _ts(s: str) -> pd.Timestamp:
    return pd.Timestamp(s)


def _events(rows):
    return rd.from_pandas(pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts"]))


def test_asof_join_picks_latest_preceding(ray_session):
    left = _events([(1, 100, _ts("2024-01-01 10:00")),
                    (1, 101, _ts("2024-01-01 12:00")),
                    (2, 200, _ts("2024-01-01 10:00"))])
    right = _events([(1, 900, _ts("2024-01-01 09:00")),
                     (1, 901, _ts("2024-01-01 11:00")),
                     (2, 950, _ts("2024-01-01 10:30"))])  # after left -> drop
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    left_cols=["event_id"], right_cols=["event_id"]) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    # user 2's only right row is later than its left row: inner drop
    assert out["event_id"].tolist() == [100, 101]
    assert out["event_id_right"].tolist() == [900, 901]
    assert out["ts_right"].tolist() == [_ts("2024-01-01 09:00"),
                                        _ts("2024-01-01 11:00")]


def test_asof_join_ties_take_equal_ts(ray_session):
    t = _ts("2024-01-01 10:00")
    left = _events([(1, 100, t)])
    right = _events([(1, 900, t)])
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    left_cols=["event_id"], right_cols=["event_id"]).to_pandas()
    assert out["event_id_right"].tolist() == [900]


def test_range_count_join(ray_session):
    left = _events([(1, 100, _ts("2024-01-01 10:00")),
                    (1, 101, _ts("2024-01-01 12:00"))])
    right = _events([(1, 0, _ts("2024-01-01 09:10")),   # within 1h of 10:00
                     (1, 0, _ts("2024-01-01 09:59")),   # within
                     (1, 0, _ts("2024-01-01 10:00")),   # == left ts: excluded
                     (1, 0, _ts("2024-01-01 11:30"))])  # within 1h of 12:00
    out = range_count_join(left, right, on="user_id", left_ts="ts",
                           right_ts="ts", left_id="event_id",
                           lower=-pd.Timedelta(hours=1),
                           upper=pd.Timedelta(0)) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert out["n_in_range"].tolist() == [2, 1]
