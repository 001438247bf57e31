"""Distributed as-of join vs a serial pandas merge_asof oracle.

The operator co-partitions both sides on hash(by) and runs merge_asof
per partition; with >1 partitions the result must still be row-identical
to the single-process merge_asof over the whole input, for backward and
forward directions and with exact matches disallowed."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _fixture(n_left=5_000, n_right=1_200, n_keys=97, seed=7):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "uid": rng.integers(0, n_keys, n_left).astype(np.int64),
            "t": rng.integers(0, 1_000_000, n_left).astype(np.int64),
            "lv": rng.normal(size=n_left),
        }
    )
    right = pd.DataFrame(
        {
            "uid": rng.integers(0, n_keys, n_right).astype(np.int64),
            "t": rng.integers(0, 1_000_000, n_right).astype(np.int64),
            "rv": rng.normal(size=n_right),
        }
    )
    # merge_asof needs unique (uid, t) on the right for a deterministic pick
    right = right.drop_duplicates(["uid", "t"], keep="last")
    return left, right


def _serial(left, right, direction, allow_exact):
    return pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort"),
        on="t",
        by="uid",
        direction=direction,
        allow_exact_matches=allow_exact,
    )


def _canon(df):
    return (
        df.sort_values(["uid", "t", "lv"], kind="mergesort")
        .reset_index(drop=True)
        .round(9)
    )


@pytest.mark.parametrize(
    "direction,allow_exact",
    [("backward", True), ("backward", False), ("forward", True)],
)
def test_asof_join_matches_serial_oracle(ray_session, direction, allow_exact):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.joins import asof_join

    left, right = _fixture()
    got = asof_join(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
        by="uid",
        on="t",
        direction=direction,
        num_partitions=8,
        allow_exact_matches=allow_exact,
    ).to_pandas()
    want = _serial(left, right, direction, allow_exact)
    pd.testing.assert_frame_equal(
        _canon(got)[sorted(got.columns)], _canon(want)[sorted(want.columns)]
    )


def test_asof_join_empty_right(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.joins import asof_join

    left, right = _fixture(n_left=500, n_right=40)
    empty_right = right.iloc[:0]
    got = asof_join(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(empty_right, preserve_index=False)),
        by="uid",
        on="t",
        num_partitions=4,
    ).to_pandas()
    assert len(got) == len(left)
    assert got["rv"].isna().all()


def _interval_fixture(n_left=4_000, n_right=600, n_keys=53, seed=11):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "uid": rng.integers(0, n_keys, n_left).astype(np.int64),
            "t": rng.integers(0, 100_000, n_left).astype(np.int64),
            "lv": np.arange(n_left, dtype=np.int64),
        }
    )
    start = rng.integers(0, 100_000, n_right).astype(np.int64)
    right = pd.DataFrame(
        {
            "uid": rng.integers(0, n_keys, n_right).astype(np.int64),
            "lo": start,
            # overlapping intervals on purpose — many windows can catch one row
            "hi": start + rng.integers(0, 5_000, n_right).astype(np.int64),
            "win_id": np.arange(n_right, dtype=np.int64),
        }
    )
    return left, right


def test_range_join_matches_serial_oracle(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.joins import range_join

    left, right = _interval_fixture()
    got = range_join(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
        by="uid",
        on="t",
        start="lo",
        end="hi",
        num_partitions=8,
    ).to_pandas()

    m = left.merge(right, on="uid", how="inner")
    want = m[(m["lo"] <= m["t"]) & (m["t"] <= m["hi"])]

    key = ["lv", "win_id"]
    got_s = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    want_s = want.sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s[sorted(got.columns)], want_s[sorted(want.columns)])


def test_range_join_empty_right_and_on_name_guard(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.joins import range_join

    left, right = _interval_fixture(n_left=300, n_right=20)
    got = range_join(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(right.iloc[:0], preserve_index=False)),
        by="uid",
        on="t",
        start="lo",
        end="hi",
        num_partitions=4,
    ).to_pandas()
    assert len(got) == 0

    with pytest.raises(ValueError):
        range_join(None, None, by="uid", on="lo", start="lo", end="hi")
