"""HyperLogLog grouped distinct: accuracy vs exact, merge-invariance.

p=14 gives ~1.04/sqrt(2^14) ≈ 0.8% standard error; the tests pin <2%
relative error (≈2.5 sigma) across cardinalities from 100 to 200k, and that
the estimate is independent of how rows are batched/partitioned (register
max is commutative — the property that makes the sketch mergeable at all).
"""

import numpy as np
import pandas as pd
import pytest

from entity_resolution_engine_ray.stages.sketch import _estimate, _registers, hll_count_distinct


def _estimate_serial(hashes: np.ndarray, p: int = 14) -> float:
    reg, rho = _registers(hashes, p)
    regs = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(regs, reg, rho)
    return _estimate(regs)


@pytest.mark.parametrize("true_n", [100, 5_000, 200_000])
def test_hll_serial_accuracy(true_n):
    rng = np.random.default_rng(42)
    # full 64-bit range: HLL needs uniform bits (a 63-bit draw zeroes the
    # top register bit and halves the effective register count)
    vals = rng.integers(0, 2**64, true_n, dtype=np.uint64)
    # duplicate every value 3x — distinct count must not move
    tripled = np.concatenate([vals, vals, vals])
    est = _estimate_serial(tripled)
    assert abs(est - true_n) / true_n < 0.02


def test_hll_distributed_matches_serial_and_exact(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 60_000
    langs = rng.choice(["en", "de", "fr", "ja"], n)
    # per-language value pools of very different cardinalities
    pool = {"en": 40_000, "de": 4_000, "fr": 300, "ja": 25}
    raw = np.array([rng.integers(0, pool[l]) for l in langs], dtype=np.int64)
    h = pd.util.hash_array(raw + pd.util.hash_array(langs).astype(np.int64), hash_key="0123456789abcdef")
    pdf = pd.DataFrame({"lang": langs, "h": h.astype(np.uint64)})

    exact = pdf.groupby("lang")["h"].nunique()

    out = (
        hll_count_distinct(rd.from_pandas(pdf).repartition(9), ["lang"], "h", p=14)
        .to_pandas()
        .set_index("lang")["approx_distinct"]
    )
    for lang in exact.index:
        rel = abs(out[lang] - exact[lang]) / exact[lang]
        assert rel < 0.02, (lang, out[lang], exact[lang])

    # merge-invariance: a different partitioning gives the SAME estimate
    out2 = (
        hll_count_distinct(rd.from_pandas(pdf).repartition(2), ["lang"], "h", p=14)
        .to_pandas()
        .set_index("lang")["approx_distinct"]
    )
    assert (out.sort_index() == out2.sort_index()).all()


def test_hll_empty(ray_session):
    import ray.data as rd

    pdf = pd.DataFrame(
        {"lang": pd.Series([], dtype=object), "h": pd.Series([], dtype=np.uint64)}
    )
    out = hll_count_distinct(rd.from_pandas(pdf), ["lang"], "h").to_pandas()
    assert len(out) == 0


def test_histogram_quantiles_error_bound_and_merge_invariance(ray_session):
    """Histogram quantile sketch: within one bin width of the exact
    quantile (the documented bound), identical across partitionings
    (merge is a vector add), and exact on constant columns."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from entity_resolution_engine_ray.stages.sketch import histogram_quantiles

    rng = np.random.default_rng(19)
    vals = np.concatenate(
        [rng.normal(50, 10, 20000), rng.exponential(5, 5000) + 90]
    )  # bimodal + heavy tail
    tbl = pa.table({"v": pa.array(vals)})
    qs = [0.1, 0.5, 0.9, 0.99]
    bins = 2048
    bound = (vals.max() - vals.min()) / bins

    got = histogram_quantiles(rd.from_arrow(tbl).repartition(9), "v", qs, bins=bins)
    exact = np.quantile(vals, qs)
    assert np.abs(got["value"].to_numpy() - exact).max() <= bound * 1.0001

    got2 = histogram_quantiles(rd.from_arrow(tbl).repartition(3), "v", qs, bins=bins)
    np.testing.assert_array_equal(got["value"].to_numpy(), got2["value"].to_numpy())

    const = histogram_quantiles(
        rd.from_arrow(pa.table({"v": pa.array(np.full(100, 7.5))})), "v", [0.25, 0.75]
    )
    assert (const["value"] == 7.5).all()


def test_heavy_hitters_certifies_exact_on_zipf(ray_session):
    """On skewed (zipf) data the sketch proves its top-k equals exact
    counting; on flat data it must flip exact=False rather than lie."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from entity_resolution_engine_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(29)
    zipf = np.minimum(rng.zipf(1.4, 60000), 5000)
    vals = pd.Series([f"tok{z}" for z in zipf])
    ds = rd.from_arrow(pa.table({"tok": pa.array(vals)})).repartition(11)

    k = 10
    got = heavy_hitters(ds, "tok", k)
    assert len(got) == k and got["exact"].all()
    exact = vals.value_counts().iloc[:k]
    assert list(got["tok"]) == list(exact.index)
    assert list(got["count_lo"]) == list(exact.to_numpy())      # certified ⇒ exact counts
    assert (got["count_hi"] >= got["count_lo"]).all()

    # flat data, tiny candidate budget: bounds can't separate top-k
    flat = pd.Series([f"u{v}" for v in rng.integers(0, 3000, 30000)])
    ds_flat = rd.from_arrow(pa.table({"tok": pa.array(flat)})).repartition(11)
    got_flat = heavy_hitters(ds_flat, "tok", 5, candidates_per_batch=8)
    assert not got_flat["exact"].any()
