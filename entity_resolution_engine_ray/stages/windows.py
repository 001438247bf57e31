"""Event-time window operators over keyed, timestamped Datasets.

Ray Data is a batch/streaming-batch engine with no watermarks; windows are
implemented per the ray_guide streaming pattern: hash-partition by key,
sort by (key, ts) within the partition, vectorized window assignment.
Ordering assumption: results are exact for bounded (batch) inputs; for
incremental ingestion re-run over the union of old+new partitions (the
checkpoint layout makes that a partition-level re-run).

- tumbling_window:  fixed-size non-overlapping buckets (SQL: date_trunc /
  epoch bucketing — oracle-exact)
- sliding_window:   overlapping buckets emitted every ``slide`` (each event
  lands in ``size/slide`` buckets)
- session_window:   gap-based sessions per key
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from entity_resolution_engine_ray.stages.grouping import partition_map_groups


def _agg_spec(value_col: str) -> dict:
    return {
        "n_events": (value_col, "size"),
        "sum_value": (value_col, "sum"),
        "min_value": (value_col, "min"),
        "max_value": (value_col, "max"),
    }


def tumbling_window(ds, key_col: str, ts_col: str, value_col: str, size_s: int, num_partitions: int | None = None):
    """(key, window_start, n_events, sum_value, min_value, max_value)."""
    size_us = np.int64(size_s) * 1_000_000

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {key_col: pd.Series([], dtype=np.int64), "window_start": pd.Series([], dtype="datetime64[us]"),
                 "n_events": pd.Series([], dtype=np.int64), "sum_value": pd.Series([], dtype=np.float64),
                 "min_value": pd.Series([], dtype=np.float64), "max_value": pd.Series([], dtype=np.float64)}
            )
        ts = pdf[ts_col].astype("datetime64[us]").astype(np.int64)
        pdf = pdf.assign(window_start=((ts // size_us) * size_us).astype("datetime64[us]"))
        out = pdf.groupby([key_col, "window_start"], as_index=False).agg(**_agg_spec(value_col))
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return partition_map_groups(ds, [key_col], fn, num_partitions)


def sliding_window(
    ds, key_col: str, ts_col: str, value_col: str, size_s: int, slide_s: int, num_partitions: int | None = None
):
    """Overlapping windows: every event is assigned to each window whose
    [start, start+size) covers it; windows start on slide boundaries."""
    assert size_s % slide_s == 0, "size must be a multiple of slide"
    k = size_s // slide_s
    slide_us = np.int64(slide_s) * 1_000_000

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {key_col: pd.Series([], dtype=np.int64), "window_start": pd.Series([], dtype="datetime64[us]"),
                 "n_events": pd.Series([], dtype=np.int64), "sum_value": pd.Series([], dtype=np.float64),
                 "min_value": pd.Series([], dtype=np.float64), "max_value": pd.Series([], dtype=np.float64)}
            )
        ts = pdf[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        last = (ts // slide_us) * slide_us  # latest window containing the event
        reps = []
        for i in range(k):
            w = last - i * slide_us
            reps.append(pdf.assign(window_start=w.astype("datetime64[us]")))
        exploded = pd.concat(reps, ignore_index=True)
        out = exploded.groupby([key_col, "window_start"], as_index=False).agg(**_agg_spec(value_col))
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return partition_map_groups(ds, [key_col], fn, num_partitions)


def session_window(
    ds, key_col: str, ts_col: str, value_col: str, gap_s: int, order_col: str | None = None,
    num_partitions: int | None = None,
):
    """Gap-based sessions: (key, session_start, session_end, n_events,
    sum_value). A new session starts when the gap to the previous event of
    the same key exceeds ``gap_s`` (strictly)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {key_col: pd.Series([], dtype=np.int64),
                 "session_start": pd.Series([], dtype="datetime64[us]"),
                 "session_end": pd.Series([], dtype="datetime64[us]"),
                 "n_events": pd.Series([], dtype=np.int64),
                 "sum_value": pd.Series([], dtype=np.float64)}
            )
        sort_cols = [key_col, ts_col] + ([order_col] if order_col else [])
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        new_key = pdf[key_col].ne(pdf[key_col].shift())
        gap = pdf[ts_col].diff() > pd.Timedelta(seconds=gap_s)
        session_id = (new_key | gap).cumsum()
        out = pdf.assign(__sid=session_id).groupby([key_col, "__sid"], as_index=False).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(value_col, "size"),
            sum_value=(value_col, "sum"),
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        return out.drop(columns="__sid")

    return partition_map_groups(ds, [key_col], fn, num_partitions)
