"""Distributed greedy 1:1 matching == the serial greedy scan, exactly."""

import numpy as np
import pandas as pd
import pytest


def _random_pairs(seed: int, n_left: int, n_right: int, n_pairs: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "left_id": rng.integers(0, n_left, n_pairs).astype(np.int64),
            "right_id": (rng.integers(0, n_right, n_pairs) + 1_000_000).astype(
                np.int64
            ),
            # small integer-valued scores force heavy ties -> the (left,
            # right) tie-break is actually exercised
            "score": rng.integers(0, 5, n_pairs).astype(np.float64),
        }
    ).drop_duplicates(["left_id", "right_id"])
    return df.reset_index(drop=True)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["left_id", "right_id"], kind="mergesort").reset_index(
        drop=True
    )


def test_distributed_rounds_equal_serial_greedy(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.matching import (
        one_to_one_match,
        serial_greedy_match,
    )

    df = _random_pairs(2, 120, 90, 800)
    # threshold 0 forces the pure distributed (mutual-best rounds) path
    got = _canon(
        one_to_one_match(
            rd.from_pandas(df).repartition(7), driver_finish_threshold=0
        ).to_pandas()
    )
    exp = _canon(serial_greedy_match(df))
    pd.testing.assert_frame_equal(got, exp)
    # it is a matching: endpoints unique
    assert got["left_id"].is_unique and got["right_id"].is_unique


def test_matching_partition_invariant_and_gate_equivalent(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.matching import one_to_one_match

    df = _random_pairs(9, 60, 60, 500)
    a = _canon(
        one_to_one_match(
            rd.from_pandas(df).repartition(1), driver_finish_threshold=0
        ).to_pandas()
    )
    b = _canon(
        one_to_one_match(
            rd.from_pandas(df).repartition(13), driver_finish_threshold=0
        ).to_pandas()
    )
    c = _canon(
        one_to_one_match(rd.from_pandas(df)).to_pandas()  # driver-finish gate
    )
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)


def test_matching_rank_chain_worst_case(ray_session):
    # scores strictly decreasing along a path: only the head pair is
    # mutual-best each round -> exercises multi-round convergence; greedy
    # accepts every other edge of the chain
    import ray.data as rd

    from entity_resolution_engine_ray.stages.matching import (
        one_to_one_match,
        serial_greedy_match,
    )

    n = 40
    df = pd.DataFrame(
        {
            "left_id": np.arange(n, dtype=np.int64),
            "right_id": np.arange(n, dtype=np.int64) + 1_000,
            "score": np.arange(n, 0, -1, dtype=np.float64),
        }
    )
    # chain: pair i also competes with pair i+1 via shared right endpoint
    chain = pd.DataFrame(
        {
            "left_id": np.arange(1, n, dtype=np.int64),
            "right_id": np.arange(n - 1, dtype=np.int64) + 1_000,
            "score": np.arange(n, 1, -1, dtype=np.float64) - 0.5,
        }
    )
    allp = pd.concat([df, chain], ignore_index=True)
    got = _canon(
        one_to_one_match(
            rd.from_pandas(allp).repartition(5), driver_finish_threshold=0
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, _canon(serial_greedy_match(allp)))


def test_matching_empty_and_nonconvergence_guard(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.matching import one_to_one_match

    empty = pd.DataFrame(
        {
            "left_id": pd.Series([], dtype="int64"),
            "right_id": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
        }
    )
    assert one_to_one_match(rd.from_pandas(empty)).count() == 0

    df = _random_pairs(4, 50, 50, 400)
    with pytest.raises(RuntimeError, match="did not converge"):
        one_to_one_match(
            rd.from_pandas(df), driver_finish_threshold=0, max_rounds=1
        )
