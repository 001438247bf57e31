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


def test_sorted_neighborhood_matches_brute_force(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import sorted_neighborhood_pairs

    rng = np.random.default_rng(11)
    n, w = 500, 7
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64) * 3 + 1,  # non-contiguous ids
            "k": [f"key{v:03d}" for v in rng.integers(0, 80, n)],
        }
    )
    got = (
        sorted_neighborhood_pairs(
            rd.from_pandas(df).repartition(9), "id", "k", window=w
        )
        .to_pandas()
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    # brute force: global (k, id) order, all pairs with rank gap < w
    order = df.sort_values(["k", "id"], kind="mergesort")["id"].to_numpy()
    exp_l, exp_r, exp_g = [], [], []
    for g in range(1, w):
        exp_l.append(order[:-g])
        exp_r.append(order[g:])
        exp_g.append(np.full(n - g, g, dtype=np.int64))
    exp = (
        pd.DataFrame(
            {
                "left_id": np.concatenate(exp_l),
                "right_id": np.concatenate(exp_r),
                "gap": np.concatenate(exp_g),
            }
        )
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_sorted_neighborhood_window_edge_cases(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import sorted_neighborhood_pairs

    df = pd.DataFrame({"id": np.arange(5, dtype=np.int64), "k": list("aaaaa")})
    # window < 2 -> no pairs at all
    assert (
        sorted_neighborhood_pairs(rd.from_pandas(df), "id", "k", window=1).count() == 0
    )
    # window 2 over 5 rows -> exactly the 4 adjacent pairs
    got = (
        sorted_neighborhood_pairs(rd.from_pandas(df), "id", "k", window=2)
        .to_pandas()
        .sort_values("left_id")
        .reset_index(drop=True)
    )
    assert got["left_id"].tolist() == [0, 1, 2, 3]
    assert got["right_id"].tolist() == [1, 2, 3, 4]
    assert got["gap"].tolist() == [1, 1, 1, 1]


def test_meta_blocking_wep_weights_and_prune(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import meta_blocking_wep

    # docs 1,2 co-block in schemes A and B (weight 2); 1,3 and 2,3 only in A
    keyed = pd.DataFrame(
        {
            "id": [1, 2, 3, 1, 2, 3],
            "k": ["A|x", "A|x", "A|x", "B|y", "B|y", "B|z"],
        }
    )
    survivors, stats = meta_blocking_wep(
        rd.from_pandas(keyed).repartition(3), "id", "k", max_block_size=100
    )
    out = survivors.to_pandas().sort_values(["left_id", "right_id"])
    # weights: (1,2)=2, (1,3)=1, (2,3)=1 -> mean 4/3; only (1,2) survives
    assert stats == {"n_pairs": 3, "total_weight": 4, "mean_weight": 4 / 3}
    assert out["left_id"].tolist() == [1]
    assert out["right_id"].tolist() == [2]
    assert out["weight"].tolist() == [2]


def test_meta_blocking_purges_oversized_blocks(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import meta_blocking_wep

    # scheme A: one giant block (purged at max 3); scheme B: a pair twice
    rows = [{"id": i, "k": "A|big"} for i in range(10)]
    rows += [{"id": 0, "k": "B|s"}, {"id": 1, "k": "B|s"},
             {"id": 0, "k": "C|t"}, {"id": 1, "k": "C|t"}]
    survivors, stats = meta_blocking_wep(
        rd.from_pandas(pd.DataFrame(rows)), "id", "k", max_block_size=3
    )
    out = survivors.to_pandas()
    # the giant A-block contributes nothing; (0,1) has weight 2 > mean 2? no:
    # the only pair is (0,1) with weight 2, mean = 2, strict > fails -> empty
    assert stats["n_pairs"] == 1 and stats["total_weight"] == 2
    assert len(out) == 0


def test_fs_em_recovers_planted_mixture(ray_session):
    from entity_resolution_engine_ray.stages.evaluate import fs_em

    # plant a 3-feature mixture (k >= 3 is the classic Fellegi-Sunter
    # identifiability requirement: k=2 gives 5 params on 3 d.o.f.)
    lam = 0.2
    m = np.array([0.95, 0.9, 0.8])
    u = np.array([0.05, 0.2, 0.3])
    n_total = 1_000_000
    rows = []
    for p in range(8):
        bits = np.array([(p >> j) & 1 for j in range(3)], dtype=np.float64)
        pm = lam * np.prod(np.where(bits == 1, m, 1 - m))
        pu = (1 - lam) * np.prod(np.where(bits == 1, u, 1 - u))
        rows.append({"pattern": p, "n": int(round(n_total * (pm + pu)))})
    est = fs_em(pd.DataFrame(rows), n_features=3)
    assert abs(est["lam"] - lam) < 0.02
    np.testing.assert_allclose(est["m"], m, atol=0.02)
    np.testing.assert_allclose(est["u"], u, atol=0.02)
    # discriminative features: m above u on all three
    assert (est["m"] > est["u"]).all()


def test_candidate_pattern_counts_partition_invariant(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import candidate_pattern_counts

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"pattern": rng.integers(0, 4, 10_000).astype(np.int64)})
    a = candidate_pattern_counts(rd.from_pandas(df).repartition(1))
    b = candidate_pattern_counts(rd.from_pandas(df).repartition(13))
    pd.testing.assert_frame_equal(a, b)
    assert a["n"].sum() == 10_000


def test_clustering_agreement_stats_matches_brute_force(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import clustering_agreement_stats

    rng = np.random.default_rng(7)
    n = 2_000
    df = pd.DataFrame(
        {
            "pk": [f"p{v}" for v in rng.integers(0, 40, n)],
            "tk": [f"t{v}" for v in rng.integers(0, 25, n)],
        }
    )
    s = clustering_agreement_stats(rd.from_pandas(df).repartition(7), "pk", "tk")

    def c2(sizes):
        return int(sum(int(x) * (int(x) - 1) // 2 for x in sizes))

    cells = df.groupby(["pk", "tk"]).size()
    a = df.groupby("pk").size()
    b = df.groupby("tk").size()
    assert s == {
        "n": n,
        "pred_clusters": len(a),
        "truth_clusters": len(b),
        "cell_pairs": c2(cells),
        "pred_pairs": c2(a),
        "truth_pairs": c2(b),
    }
    # identical labelings: perfect agreement -> tp == pred_pairs == truth_pairs
    same = pd.DataFrame({"pk": df["pk"], "tk": df["pk"]})
    s2 = clustering_agreement_stats(rd.from_pandas(same).repartition(3), "pk", "tk")
    assert s2["cell_pairs"] == s2["pred_pairs"] == s2["truth_pairs"]


def test_block_filtering_matches_brute_force(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import block_filtering_pairs

    rng = np.random.default_rng(5)
    n = 300
    rows = []
    for i in range(n):
        # 3 scheme keys per record, some shared hot keys to exercise sizes
        for s in range(3):
            rows.append({"id": i, "k": f"{s}|{rng.integers(0, 12 if s else 4)}"})
    df = pd.DataFrame(rows)
    got = (
        block_filtering_pairs(
            rd.from_pandas(df).repartition(8), "id", "k", ratio_num=3, ratio_den=5
        )
        .to_pandas()
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    # brute force
    sizes = df.groupby("k").size()
    df2 = df.assign(c=df["k"].map(sizes))
    df2 = df2.sort_values(["id", "c", "k"], kind="mergesort")
    rank = df2.groupby("id").cumcount()
    cnt = df2.groupby("id")["k"].transform("size")
    kept = df2[rank < (3 * cnt + 4) // 5]
    from collections import Counter

    w = Counter()
    for _, grp in kept.groupby("k"):
        ids = sorted(grp["id"].tolist())
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                w[(ids[x], ids[y])] += 1
    exp = (
        pd.DataFrame(
            [(left, right, c) for (left, right), c in w.items()],
            columns=["left_id", "right_id", "weight"],
        )
        .astype(np.int64)
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # every record keeps ceil(0.6*3)=2 of its 3 blocks
    assert len(kept) == 2 * n


def test_block_filtering_validates_ratio(ray_session):
    import pytest
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import block_filtering_pairs

    ds = rd.from_pandas(pd.DataFrame({"id": [1], "k": ["a"]}))
    with pytest.raises(ValueError):
        block_filtering_pairs(ds, "id", "k", ratio_num=6, ratio_den=5)
    with pytest.raises(ValueError):
        block_filtering_pairs(ds, "id", "k", ratio_num=0, ratio_den=5)


def test_meta_blocking_and_cluster_stats_empty_inputs(ray_session):
    # 0-row Datasets skip lazy map_batches (the partial columns never
    # materialize) — both operators must degrade to zeros, not KeyError
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import (
        clustering_agreement_stats,
        meta_blocking_wep,
    )

    empty_kv = rd.from_pandas(
        pd.DataFrame({"id": pd.Series([], dtype="int64"),
                      "k": pd.Series([], dtype=object)})
    )
    survivors, stats = meta_blocking_wep(empty_kv, "id", "k")
    assert stats == {"n_pairs": 0, "total_weight": 0, "mean_weight": 0.0}
    assert survivors.count() == 0

    empty_pt = rd.from_pandas(
        pd.DataFrame({"pk": pd.Series([], dtype=object),
                      "tk": pd.Series([], dtype=object)})
    )
    s = clustering_agreement_stats(empty_pt, "pk", "tk")
    assert s == {"n": 0, "pred_clusters": 0, "truth_clusters": 0,
                 "cell_pairs": 0, "pred_pairs": 0, "truth_pairs": 0}


def test_sorted_neighborhood_property(ray_session):
    # hypothesis-style sweep without per-example Ray datasets being too
    # slow: a handful of adversarial shapes x windows, each vs brute force
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import sorted_neighborhood_pairs
    from entity_resolution_engine_ray.stages.exchange import typed_to_pandas

    rng = np.random.default_rng(21)
    shapes = [
        ("all_same_key", ["k"] * 60),
        ("all_distinct", [f"k{i:02d}" for i in range(60)]),
        ("two_hot", ["a"] * 30 + ["b"] * 30),
        ("random", [f"k{v}" for v in rng.integers(0, 7, 60)]),
        ("single", ["x"]),
    ]
    for w in (2, 3, 8, 61):
        for name, keys in shapes:
            n = len(keys)
            ids = (np.arange(n, dtype=np.int64) * 7 + 3) % (5 * n)  # shuffled-ish
            df = pd.DataFrame({"id": ids, "k": keys})
            got = (
                typed_to_pandas(
                    sorted_neighborhood_pairs(
                        rd.from_pandas(df).repartition(4), "id", "k", window=w
                    )
                )
                .sort_values(["left_id", "right_id"])
                .reset_index(drop=True)
            )
            order = df.sort_values(["k", "id"], kind="mergesort")["id"].to_numpy()
            el, er, eg = [], [], []
            for g in range(1, w):
                if g >= n:
                    break
                el.append(order[:-g]); er.append(order[g:])
                eg.append(np.full(n - g, g, dtype=np.int64))
            if el:
                exp = pd.DataFrame(
                    {"left_id": np.concatenate(el), "right_id": np.concatenate(er),
                     "gap": np.concatenate(eg)}
                ).sort_values(["left_id", "right_id"]).reset_index(drop=True)
            else:
                exp = pd.DataFrame(
                    {"left_id": pd.Series([], dtype="int64"),
                     "right_id": pd.Series([], dtype="int64"),
                     "gap": pd.Series([], dtype="int64")}
                )
            pd.testing.assert_frame_equal(got, exp, obj=f"{name} w={w}")


def test_block_filtering_ratio_sweep(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.evaluate import block_filtering_pairs

    rng = np.random.default_rng(31)
    rows = []
    for i in range(120):
        for s in range(4):
            rows.append({"id": i, "k": f"{s}|{rng.integers(0, 3 + 4 * s)}"})
    df = pd.DataFrame(rows)
    for num, den in ((1, 4), (1, 2), (3, 4), (1, 1)):
        got = (
            block_filtering_pairs(
                rd.from_pandas(df).repartition(6), "id", "k",
                ratio_num=num, ratio_den=den,
            )
            .to_pandas()
            .sort_values(["left_id", "right_id"])
            .reset_index(drop=True)
        )
        sizes = df.groupby("k").size()
        d2 = df.assign(c=df["k"].map(sizes)).sort_values(["id", "c", "k"], kind="mergesort")
        rank = d2.groupby("id").cumcount()
        cnt = d2.groupby("id")["k"].transform("size")
        kept = d2[rank < (num * cnt + den - 1) // den]
        from collections import Counter

        w = Counter()
        for _, grp in kept.groupby("k"):
            ids = sorted(grp["id"].tolist())
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    w[(ids[x], ids[y])] += 1
        exp = (
            pd.DataFrame(
                [(a, b, c) for (a, b), c in w.items()],
                columns=["left_id", "right_id", "weight"],
            ).astype(np.int64).sort_values(["left_id", "right_id"]).reset_index(drop=True)
            if w else
            pd.DataFrame({"left_id": pd.Series([], dtype="int64"),
                          "right_id": pd.Series([], dtype="int64"),
                          "weight": pd.Series([], dtype="int64")})
        )
        pd.testing.assert_frame_equal(got, exp, obj=f"ratio {num}/{den}")
