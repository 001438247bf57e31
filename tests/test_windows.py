"""Window operator tests (tumbling / sliding / session)."""

from datetime import datetime

import pandas as pd
import pyarrow as pa


def _events():
    # key 1: events at 00:10, 00:50, 02:30; key 2: events at 00:05, 03:05
    rows = [
        (1, datetime(2024, 1, 1, 0, 10), 1.0),
        (1, datetime(2024, 1, 1, 0, 50), 2.0),
        (1, datetime(2024, 1, 1, 2, 30), 4.0),
        (2, datetime(2024, 1, 1, 0, 5), 8.0),
        (2, datetime(2024, 1, 1, 3, 5), 16.0),
    ]
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "value": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )


def test_tumbling_window(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.windows import tumbling_window

    out = tumbling_window(rd.from_arrow(_events()), "user_id", "ts", "value", size_s=3600).to_pandas()
    out = out.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    k1 = out[out["user_id"] == 1]
    assert len(k1) == 2  # hour 0 (two events) and hour 2 (one)
    assert k1.iloc[0]["n_events"] == 2 and k1.iloc[0]["sum_value"] == 3.0
    assert k1.iloc[1]["sum_value"] == 4.0
    assert out[out["user_id"] == 2]["n_events"].tolist() == [1, 1]


def test_sliding_window_overlap(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.windows import sliding_window

    out = sliding_window(
        rd.from_arrow(_events()), "user_id", "ts", "value", size_s=7200, slide_s=3600
    ).to_pandas()
    k1 = out[out["user_id"] == 1].sort_values("window_start").reset_index(drop=True)
    # event at 00:10 lands in windows starting 23:00(prev day) and 00:00; etc.
    w0 = k1[k1["window_start"] == pd.Timestamp("2024-01-01 00:00")]
    assert w0["n_events"].iloc[0] == 2  # 00:10 + 00:50
    w2 = k1[k1["window_start"] == pd.Timestamp("2024-01-01 02:00")]
    assert w2["sum_value"].iloc[0] == 4.0
    w1 = k1[k1["window_start"] == pd.Timestamp("2024-01-01 01:00")]
    assert w1["sum_value"].iloc[0] == 4.0  # the 02:30 event covered by [01:00,03:00)


def test_session_window(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.windows import session_window

    out = session_window(
        rd.from_arrow(_events()), "user_id", "ts", "value", gap_s=3600
    ).to_pandas()
    k1 = out[out["user_id"] == 1].sort_values("session_start").reset_index(drop=True)
    # 00:10+00:50 in one session (40min gap), 02:30 alone (100min gap)
    assert len(k1) == 2
    assert k1.iloc[0]["n_events"] == 2 and k1.iloc[0]["sum_value"] == 3.0
    assert k1.iloc[1]["n_events"] == 1
    k2 = out[out["user_id"] == 2]
    assert len(k2) == 2  # 3h gap splits


def test_partitioned_rank_and_ties(ray_session):
    import numpy as np
    import ray.data as rd

    from entity_resolution_engine_ray.stages.windows import partitioned_rank

    # user 1 has a tie at value=5.0 -> RANK gaps (1,1,3), DENSE_RANK (1,1,2)
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
            "event_id": pa.array([10, 11, 12, 20], type=pa.int64()),
            "value": pa.array([5.0, 5.0, 3.0, 7.0], type=pa.float64()),
        }
    )
    for nparts in (1, 5):
        out = (
            partitioned_rank(rd.from_arrow(t), "user_id", "value", ["event_id"], num_partitions=nparts)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert out["rnk"].tolist() == [1, 1, 3, 1]
        assert out["drnk"].tolist() == [1, 1, 2, 1]
        assert out["rnk"].dtype == np.int64


def test_partitioned_lag_first_row_null(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.windows import partitioned_lag

    out = partitioned_lag(
        rd.from_arrow(_events()), "user_id", ["ts"], "value", out_col="prev_v"
    ).to_pandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    k1 = out[out["user_id"] == 1]["prev_v"].tolist()
    assert pd.isna(k1[0]) and k1[1:] == [1.0, 2.0]
    k2 = out[out["user_id"] == 2]["prev_v"].tolist()
    assert pd.isna(k2[0]) and k2[1] == 8.0


def test_rolling_frame_sum_partition_invariant(ray_session):
    import numpy as np
    import ray.data as rd

    from entity_resolution_engine_ray.stages.windows import rolling_frame_sum

    rng = np.random.default_rng(7)
    n = 400
    t = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 9, n), type=pa.int64()),
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "val_c": pa.array(rng.integers(0, 10_000, n), type=pa.int64()),
        }
    )
    # serial oracle: pandas rolling over the whole frame
    pdf = t.to_pandas().sort_values(["user_id", "event_id"]).reset_index(drop=True)
    exp = (
        pdf.groupby("user_id")["val_c"].rolling(4, min_periods=1).sum().reset_index(level=0, drop=True)
    ).astype(np.int64)
    pdf["exp"] = exp
    for nparts in (1, 7):
        out = rolling_frame_sum(
            rd.from_arrow(t), "user_id", ["event_id"], "val_c", frame_rows=4,
            out_col="mov_c", num_partitions=nparts,
        ).to_pandas()
        m = pdf.merge(out[["event_id", "mov_c"]], on="event_id")
        assert (m["exp"] == m["mov_c"]).all()


def test_partitioned_ntile_small_groups_and_split(ray_session):
    import numpy as np
    import ray.data as rd

    from entity_resolution_engine_ray.stages.windows import partitioned_ntile

    # key 1: 6 rows into 4 buckets -> sizes 2,2,1,1; key 2: 2 rows < 4 buckets
    t = pa.table(
        {
            "k": pa.array([1] * 6 + [2] * 2, type=pa.int64()),
            "i": pa.array(list(range(6)) + [0, 1], type=pa.int64()),
        }
    )
    for nparts in (1, 3):
        out = (
            partitioned_ntile(rd.from_arrow(t), "k", ["i"], 4, out_col="q", num_partitions=nparts)
            .to_pandas()
            .sort_values(["k", "i"])
            .reset_index(drop=True)
        )
        assert out[out["k"] == 1]["q"].tolist() == [1, 1, 2, 2, 3, 4]
        assert out[out["k"] == 2]["q"].tolist() == [1, 2]
        assert out["q"].dtype == np.int64


def test_grouped_topk_combiner_matches_serial(ray_session):
    import numpy as np
    import ray.data as rd

    from entity_resolution_engine_ray.stages.grouping import grouped_topk

    rng = np.random.default_rng(13)
    n = 500
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 12, n), type=pa.int64()),
            "id": pa.array(np.arange(n), type=pa.int64()),
            "v": pa.array(rng.integers(0, 40, n).astype(np.float64) / 2),  # forces ties
        }
    )
    pdf = t.to_pandas().sort_values(["k", "v", "id"], ascending=[True, False, True])
    exp = pdf.groupby("k").head(3).reset_index(drop=True)
    exp["rn"] = exp.groupby("k").cumcount() + 1
    for nparts in (1, 5):
        out = (
            grouped_topk(rd.from_arrow(t), "k", "v", 3, ["id"], num_partitions=nparts)
            .to_pandas()
            .sort_values(["k", "rn"])
            .reset_index(drop=True)
        )
        assert out["id"].tolist() == exp["id"].tolist()
        assert out["rn"].tolist() == exp["rn"].tolist()
