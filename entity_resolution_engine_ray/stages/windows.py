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

SQL window functions (OVER (PARTITION BY key ORDER BY ...)) share the same
physical shape — ordering is only ever needed WITHIN a key, so ONE hash
exchange + an in-partition vectorized pass is the 100-TB plan (no global
sort shuffle). Partitioning assumption: one key's rows fit a worker.
- partitioned_rank:  RANK() / DENSE_RANK() per key (ties → min / dense)
- partitioned_lag:   LAG(value, 1) per key in (order_cols) order
- rolling_frame_sum: SUM() OVER (... ROWS BETWEEN n-1 PRECEDING AND
  CURRENT ROW) per key — pass an integer-cents column for order-invariant
  exact sums (see pipelines/queries.py money-lane discipline)
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


def partitioned_rank(
    ds,
    key_col: str,
    order_col: str,
    id_cols: list[str],
    descending: bool = True,
    num_partitions: int | None = None,
):
    """``RANK()`` / ``DENSE_RANK() OVER (PARTITION BY key ORDER BY order_col
    [DESC])`` — one hash exchange on the key, vectorized pandas ``rank``
    (method='min' == SQL RANK gaps, 'dense' == DENSE_RANK) inside each
    partition. No sort is needed at all: rank is a function of the value
    multiset per key. Emits (key, *id_cols, rnk, drnk), one row per input
    row. Reference analog: the argmax-per-left-key selection of
    matchers/teams_matcher.py:47-49 is the k=1 special case."""
    asc = not descending

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            cols = {key_col: pd.Series([], dtype=np.int64)}
            for c in id_cols:
                cols[c] = pd.Series([], dtype=np.int64)
            cols["rnk"] = pd.Series([], dtype=np.int64)
            cols["drnk"] = pd.Series([], dtype=np.int64)
            return pd.DataFrame(cols)
        g = pdf.groupby(key_col)[order_col]
        pdf = pdf.assign(
            rnk=g.rank(method="min", ascending=asc).astype(np.int64),
            drnk=g.rank(method="dense", ascending=asc).astype(np.int64),
        )
        return pdf[[key_col, *id_cols, "rnk", "drnk"]]

    return partition_map_groups(ds, [key_col], fn, num_partitions)


def partitioned_lag(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "prev",
    num_partitions: int | None = None,
):
    """``LAG(value, 1) OVER (PARTITION BY key ORDER BY order_cols)`` — hash
    exchange on the key, ONE in-partition mergesort, grouped ``shift(1)``.
    The first row of each key gets a null ``out_col`` (SQL semantics);
    callers filter or fill. Emits every input column plus ``out_col``."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            out = pdf.copy()
            out[out_col] = pd.Series([], dtype=object)
            return out
        pdf = pdf.sort_values([key_col, *order_cols], kind="mergesort")
        pdf[out_col] = pdf.groupby(key_col)[value_col].shift(1)
        return pdf

    return partition_map_groups(ds, [key_col], fn, num_partitions)


def partitioned_ntile(
    ds,
    key_col: str,
    order_cols: list[str],
    n_buckets: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
):
    """``NTILE(n) OVER (PARTITION BY key ORDER BY order_cols)`` — SQL bucket
    semantics: the first ``n_rows % n`` buckets hold ``ceil(n_rows/n)`` rows,
    the rest ``floor``; with fewer rows than buckets each row gets its own
    1-based bucket. Deterministic iff ``order_cols`` is a total order per
    key (include a unique tie-break column). One hash exchange + one
    in-partition sort, vectorized bucket arithmetic."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            out = pdf.copy()
            out[out_col] = pd.Series([], dtype=np.int64)
            return out
        pdf = pdf.sort_values([key_col, *order_cols], kind="mergesort").reset_index(drop=True)
        g = pdf.groupby(key_col, sort=False)
        pos = g.cumcount().to_numpy(np.int64)
        n = g[key_col].transform("size").to_numpy(np.int64)
        big = n % n_buckets  # first `big` buckets get one extra row
        size_small = n // n_buckets
        size_big = size_small + 1
        cut = big * size_big  # rows [0, cut) fall in the big buckets
        in_big = pos < cut
        # np.where evaluates both lanes: guard the small-bucket division for
        # groups with n < n_buckets (size_small == 0, in_big always true)
        safe_small = np.maximum(size_small, 1)
        bucket = np.where(in_big, pos // size_big, big + (pos - cut) // safe_small) + 1
        pdf[out_col] = bucket.astype(np.int64)
        return pdf

    return partition_map_groups(ds, [key_col], fn, num_partitions)


def rolling_frame_sum(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    frame_rows: int,
    out_col: str = "mov_sum",
    num_partitions: int | None = None,
):
    """``SUM(value) OVER (PARTITION BY key ORDER BY order_cols ROWS BETWEEN
    frame_rows-1 PRECEDING AND CURRENT ROW)`` — hash exchange + in-partition
    sort + grouped ``rolling(frame_rows, min_periods=1).sum()``. Pass an
    int64 (e.g. integer-cents) value column: the frame sum is then exact
    and order-invariant at any partition count."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            out = pdf.copy()
            out[out_col] = pd.Series([], dtype=np.int64)
            return out
        pdf = pdf.sort_values([key_col, *order_cols], kind="mergesort").reset_index(drop=True)
        mov = (
            pdf.groupby(key_col)[value_col]
            .rolling(frame_rows, min_periods=1)
            .sum()
            .reset_index(level=0, drop=True)
        )
        pdf[out_col] = mov.astype(np.int64)
        return pdf

    return partition_map_groups(ds, [key_col], fn, num_partitions)


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
