"""Distributed grouped prefix-sum vs a serial pandas cumsum oracle.

The operator's driver state is a single (key, running-sum) carry, so the
tests target exactly what could break it: keys crossing block boundaries,
one hot key spanning MANY whole blocks, and the pure carry walk itself.
"""

import numpy as np
import pandas as pd
import pytest

from entity_resolution_engine_ray.stages.scan import _prefix_offsets, grouped_prefix_sum


def _serial(pdf: pd.DataFrame) -> pd.DataFrame:
    s = pdf.sort_values(["k", "o"], kind="mergesort").reset_index(drop=True)
    s["cum"] = s.groupby("k")["v"].cumsum()
    return s


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["k", "o"], kind="mergesort").reset_index(drop=True)[
        ["k", "o", "v", "cum"]
    ]


def _run(pdf: pd.DataFrame, n_blocks: int) -> pd.DataFrame:
    import ray.data as rd

    ds = rd.from_pandas(pdf).repartition(n_blocks)
    out = grouped_prefix_sum(ds, ["k"], ["o"], "v", "cum").to_pandas()
    return _canon(out)


@pytest.mark.parametrize("n_blocks", [1, 7])
def test_scan_matches_serial_oracle(ray_session, n_blocks):
    rng = np.random.default_rng(11)
    n = 20_000
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 50, n).astype(np.int64),
            "o": rng.permutation(n).astype(np.int64),
            "v": rng.integers(-5, 100, n).astype(np.int64),
        }
    )
    got = _run(pdf, n_blocks)
    want = _canon(_serial(pdf))
    pd.testing.assert_frame_equal(got, want)
    assert got["cum"].dtype == np.int64  # integers stay exact end-to-end


def test_scan_hot_key_spans_many_blocks(ray_session):
    """One key is 90% of the data — after the sort it fills several whole
    blocks, so the carry must accumulate through single-key blocks."""
    rng = np.random.default_rng(13)
    n = 30_000
    k = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 5, n)).astype(np.int64)
    pdf = pd.DataFrame(
        {"k": k, "o": np.arange(n, dtype=np.int64), "v": np.ones(n, dtype=np.int64)}
    )
    got = _run(pdf, 16)
    want = _canon(_serial(pdf))
    pd.testing.assert_frame_equal(got, want)
    # all-ones values: the hot key's max cum must equal its row count
    assert got.loc[got["k"] == 7, "cum"].max() == (k == 7).sum()


def test_scan_string_keys_and_floats(ray_session):
    rng = np.random.default_rng(17)
    n = 5_000
    pdf = pd.DataFrame(
        {
            "k": rng.choice(["en", "de", "fr"], n),
            "o": rng.permutation(n).astype(np.int64),
            "v": rng.normal(size=n),
        }
    )
    got = _run(pdf, 5)
    want = _canon(_serial(pdf))
    pd.testing.assert_frame_equal(got, want, atol=1e-9, rtol=0)


def test_prefix_offsets_carry_walk():
    """Pure driver walk: metas are (pos, first_key, last_key, last_key_sum).
    A hot key threading through whole blocks accumulates; a fresh key
    resets the carry."""
    metas = [
        ((0,), ("a",), ("a",), 3),   # all 'a', sum 3
        ((1,), ("a",), ("a",), 4),   # still all 'a'
        ((2,), ("a",), ("b",), 6),   # 'a' ends here, 'b' starts
        ((3,), ("b",), ("c",), 9),   # 'b' ends, 'c' starts
        ((4,), ("d",), ("d",), 8),   # fresh key after gap
    ]
    assert _prefix_offsets(metas) == [0, 3, 7, 6, 0]


def test_scan_null_keys_and_values(ray_session):
    """SQL window-SUM semantics under nulls: NULL keys form ONE partition
    (pandas' default groupby silently drops them) and NULL values are
    ignored by SUM, so the running total at a null-value row equals the
    previous row's total. Regression for the carry walk: a null boundary
    key used to zero its own boundary sum (== against null is all-False)."""
    rng = np.random.default_rng(23)
    n = 8_000
    k = rng.choice(["en", "de", None], n, p=[0.45, 0.45, 0.10])
    v = rng.normal(size=n)
    v[rng.random(n) < 0.1] = np.nan
    pdf = pd.DataFrame({"k": k, "o": np.arange(n, dtype=np.int64), "v": v})
    got = _run(pdf, 9)

    s = pdf.sort_values(["k", "o"], kind="mergesort", na_position="last").reset_index(
        drop=True
    )
    s["cum"] = s["v"].fillna(0).groupby(s["k"], dropna=False).cumsum()
    want = s.sort_values(["k", "o"], kind="mergesort", na_position="last").reset_index(
        drop=True
    )[["k", "o", "v", "cum"]]
    got = got.sort_values(["k", "o"], kind="mergesort", na_position="last").reset_index(
        drop=True
    )[["k", "o", "v", "cum"]]
    pd.testing.assert_frame_equal(got, want, atol=1e-9, rtol=0)


def test_scan_empty_input(ray_session):
    import ray.data as rd

    pdf = pd.DataFrame(
        {
            "k": pd.Series([], dtype=np.int64),
            "o": pd.Series([], dtype=np.int64),
            "v": pd.Series([], dtype=np.int64),
        }
    )
    out = grouped_prefix_sum(rd.from_pandas(pdf), ["k"], ["o"], "v", "cum")
    assert out.count() == 0
    # (to_pandas on an empty dataset drops columns — assert on the schema)
    assert out.schema().names == ["k", "o", "v", "cum"]
