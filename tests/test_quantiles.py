"""Grouped exact quantiles (stages/quantiles) — DuckDB quantile_disc parity.

The operator contract: for every group, each requested quantile equals the
value at 0-based index ceil(q*n)-1 of the group's sorted values — DuckDB's
``quantile_disc`` — regardless of how rows were batched or partitioned.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from entity_resolution_engine_ray.stages.quantiles import (
    _select_quantiles,
    grouped_quantiles,
)

QS = {"p25": 0.25, "p50": 0.5, "p90": 0.9, "p99": 0.99}


def _oracle(pdf: pd.DataFrame) -> pd.DataFrame:
    q_cols = ", ".join(
        f"quantile_disc(v, {q}) AS {name}" for name, q in QS.items()
    )
    return (
        duckdb.sql(f"SELECT k, COUNT(*) AS n_rows, {q_cols} FROM pdf GROUP BY k")
        .df()
        .sort_values("k")
        .reset_index(drop=True)
    )


def _random_frame(seed: int, n: int, n_keys: int, dup_heavy: bool) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    k = rng.integers(0, n_keys, n)
    if dup_heavy:  # many repeated values → exercises the (key, value, cnt) runs
        v = rng.integers(0, 20, n).astype(np.float64)
    else:
        v = rng.normal(size=n)
    return pd.DataFrame({"k": k.astype(np.int64), "v": v})


def test_select_quantiles_single_partition_matches_duckdb():
    """Pure-function check: one partition holding compressed runs from
    'different batches' (duplicate (k, v) rows with separate counts)."""
    pdf = _random_frame(7, 5_000, 6, dup_heavy=True)
    runs = pdf.groupby(["k", "v"], as_index=False).size().rename(columns={"size": "cnt"})
    # split every run in two to mimic partials arriving from two batches
    a = runs.assign(cnt=runs["cnt"] // 2)
    b = runs.assign(cnt=runs["cnt"] - runs["cnt"] // 2)
    stacked = pd.concat([a[a.cnt > 0], b[b.cnt > 0]], ignore_index=True)
    got = (
        _select_quantiles(["k"], "v", QS)(stacked)
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = _oracle(pdf)
    pd.testing.assert_frame_equal(
        got.astype({"n_rows": np.int64}), want.astype({"n_rows": np.int64})
    )


def test_select_quantiles_empty():
    out = _select_quantiles(["k"], "v", QS)(pd.DataFrame({"k": [], "v": [], "cnt": []}))
    assert list(out.columns) == ["k", "n_rows", "p25", "p50", "p90", "p99"]
    assert len(out) == 0


@pytest.mark.parametrize("dup_heavy", [False, True])
def test_grouped_quantiles_matches_duckdb(ray_session, dup_heavy):
    pdf = _random_frame(11 + dup_heavy, 20_000, 9, dup_heavy)
    ds = rd.from_pandas(pdf).repartition(7)  # force multi-block batching
    got = (
        grouped_quantiles(ds, ["k"], "v", QS, num_partitions=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = _oracle(pdf)
    pd.testing.assert_frame_equal(
        got.astype({"n_rows": np.int64}), want.astype({"n_rows": np.int64})
    )


def test_grouped_quantiles_tiny_groups(ray_session):
    """n=1 and n=2 groups: ceil(q*n)-1 must clamp to a real index."""
    pdf = pd.DataFrame({"k": [1, 2, 2], "v": [5.0, 1.0, 9.0]})
    got = (
        grouped_quantiles(rd.from_pandas(pdf), ["k"], "v", QS, num_partitions=2)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = _oracle(pdf)
    pd.testing.assert_frame_equal(
        got.astype({"n_rows": np.int64}), want.astype({"n_rows": np.int64})
    )
