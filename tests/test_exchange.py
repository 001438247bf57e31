"""Task-level hash exchange: the chained two-stage path must be
row-identical to two sequential exchanges (only scheduling differs), and
the side-task sum must match a driver-side column sum."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _stage1(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-key partial aggregate with a 'dropped'-style counter column."""
    if pdf.empty:
        return pd.DataFrame(
            {
                "k": pd.Series([], dtype=np.int64),
                "v": pd.Series([], dtype=np.int64),
                "extra": pd.Series([], dtype=np.int64),
            }
        )
    g = pdf.groupby("k", sort=False)["v"].sum().reset_index()
    g["extra"] = 0
    g.loc[g.index[:1], "extra"] = len(pdf)  # one marker per partition
    return g


def _stage2(pdf: pd.DataFrame) -> pd.DataFrame:
    if pdf.empty:
        return pdf
    return pdf.sort_values(["k", "v"], kind="mergesort").drop_duplicates("k", keep="first")


def test_chained_exchange_matches_sequential(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.exchange import (
        hash_exchange_chained,
        hash_exchange_map_groups,
    )

    rng = np.random.default_rng(19)
    n = 20_000
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 500, n), type=pa.int64()),
            "v": pa.array(rng.integers(0, 1000, n), type=pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl)

    chained, total = hash_exchange_chained(
        ds, ["k"], _stage1, 8, ["k"], _stage2, 8, sum_col="extra"
    )
    got = chained.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)

    mid = hash_exchange_map_groups(ds, ["k"], _stage1, 8)
    expected_total = int(mid.to_pandas()["extra"].sum())

    def _stage2_drop(pdf):
        return _stage2(pdf.drop(columns=["extra"]) if "extra" in pdf.columns else pdf)

    seq = hash_exchange_map_groups(mid, ["k"], _stage2_drop, 8)
    exp = seq.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(got, exp)
    assert total == expected_total == n


def test_chained_exchange_empty_input(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.exchange import hash_exchange_chained

    tbl = pa.table(
        {"k": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}
    )
    out, total = hash_exchange_chained(
        rd.from_arrow(tbl), ["k"], _stage1, 4, ["k"], _stage2, 4, sum_col="extra"
    )
    assert out.count() == 0
    assert total == 0
