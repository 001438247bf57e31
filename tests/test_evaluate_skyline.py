"""Unit pins for the pair-set evaluation and skyline stages."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_engine_ray.stages.skyline import _skyline_mask


def _brute_skyline(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    n = len(x)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if i != j and x[j] <= x[i] and y[j] <= y[i] and (
                x[j] < x[i] or y[j] < y[i]
            ):
                keep[i] = False
                break
    return keep


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=0, max_size=40
    )
)
def test_skyline_mask_matches_brute_force(pts):
    x = np.array([p[0] for p in pts], dtype=np.float64)
    y = np.array([p[1] for p in pts], dtype=np.float64)
    np.testing.assert_array_equal(_skyline_mask(x, y), _brute_skyline(x, y))


def test_skyline_keeps_exact_duplicates():
    # identical points do not dominate each other — all survive
    x = np.array([1.0, 1.0, 2.0])
    y = np.array([1.0, 1.0, 0.5])
    assert _skyline_mask(x, y).tolist() == [True, True, True]


def test_skyline_stage_two_phase_equals_single_pass(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.skyline import skyline_stage

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "id": np.arange(3000, dtype=np.int64),
            "x": rng.integers(0, 50, 3000).astype(np.float64),
            "y": rng.integers(0, 50, 3000).astype(np.float64),
        }
    )
    # many blocks so cross-block dominance is actually exercised
    out = (
        skyline_stage(rd.from_pandas(df).repartition(16), "x", "y")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref = df[_brute_skyline(df["x"].to_numpy(), df["y"].to_numpy())].reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(out, ref)


def test_evaluate_pair_sets_counts(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import (
        blocking_eval_row,
        evaluate_pair_sets,
    )

    pred = pd.DataFrame({"left_id": [1, 2, 3, 7], "right_id": [2, 3, 4, 8]})
    truth = pd.DataFrame({"left_id": [1, 3, 5], "right_id": [2, 4, 6]})
    counts = evaluate_pair_sets(
        rd.from_pandas(pred).repartition(3), rd.from_pandas(truth).repartition(2)
    )
    assert counts == {"tp": 2, "fp": 2, "fn": 1}
    row = blocking_eval_row("s", counts)
    assert row["n_pred"] == 4 and row["n_truth"] == 3
    assert row["precision"] == 2 / 4 and row["recall"] == 2 / 3
    assert row["f1"] == pytest.approx(2 * 2 / 7)


def test_fs_pattern_counts_excludes_truth_only_pairs(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import fs_pattern_counts

    cand = pd.DataFrame(
        {
            "left_id": [1, 2, 3, 4],
            "right_id": [2, 3, 4, 5],
            "pattern": [3, 3, 0, 1],
        }
    )
    # (1,2) and (3,4) are matches; (8,9) was missed by blocking -> excluded
    truth = pd.DataFrame({"left_id": [1, 3, 8], "right_id": [2, 4, 9]})
    out = fs_pattern_counts(
        rd.from_pandas(cand).repartition(3), rd.from_pandas(truth).repartition(2)
    )
    assert out.to_dict("list") == {
        "pattern": [0, 1, 3],
        "n_match": [1, 0, 1],
        "n_nonmatch": [0, 1, 1],
    }


def test_block_pairs_payload_cols(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import block_pairs

    df = pd.DataFrame(
        {
            "doc_id": [3, 1, 2],
            "k": ["a", "a", "a"],
            "src": ["x", "y", "x"],
        }
    )
    out = (
        block_pairs(rd.from_pandas(df).repartition(2), "doc_id", "k",
                    payload_cols=["src"])
        .to_pandas()
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    assert out["left_id"].tolist() == [1, 1, 2]
    assert out["right_id"].tolist() == [2, 3, 3]
    assert out["left_src"].tolist() == ["y", "y", "x"]
    assert out["right_src"].tolist() == ["x", "x", "x"]


def test_block_pairs_emits_each_pair_once(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import block_pairs

    df = pd.DataFrame(
        {"doc_id": [5, 1, 3, 2, 9, 8], "k": ["a", "a", "a", "b", "b", "c"]}
    )
    out = (
        block_pairs(rd.from_pandas(df).repartition(4), "doc_id", "k")
        .to_pandas()
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {"left_id": [1, 1, 2, 3], "right_id": [3, 5, 9, 5]}
    ).sort_values(["left_id", "right_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp)
