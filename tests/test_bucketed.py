"""Bucketed-storage joins: zero-exchange bucket cogroup == a plain merge."""

import numpy as np
import pandas as pd
import pytest


def _empty(cols: dict) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})


def test_bucketed_join_matches_merge(ray_session, tmp_path):
    import ray.data as rd

    from entity_resolution_engine_ray.sources.bucketed import (
        bucketed_cogroup,
        write_bucketed_parquet,
    )

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 400).astype(np.int64),
            "v": rng.integers(0, 1000, 400).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 60, 300).astype(np.int64),
            "w": rng.integers(0, 1000, 300).astype(np.int64),
        }
    )
    ldir, rdir = str(tmp_path / "L"), str(tmp_path / "R")
    write_bucketed_parquet(rd.from_pandas(left).repartition(5), ldir, "k", 8)
    write_bucketed_parquet(rd.from_pandas(right).repartition(3), rdir, "k", 8)

    def join(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        if lp.empty or rp.empty:
            return _empty({"k": "int64", "v": "int64", "w": "int64"})
        return lp.merge(rp, on="k")[["k", "v", "w"]]

    got = (
        bucketed_cogroup(ldir, rdir, join)
        .to_pandas()
        .sort_values(["k", "v", "w"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, on="k")[["k", "v", "w"]]
        .sort_values(["k", "v", "w"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_bucketed_join_outer_sees_typed_empty_sides(ray_session, tmp_path):
    import ray.data as rd

    from entity_resolution_engine_ray.sources.bucketed import (
        bucketed_cogroup,
        write_bucketed_parquet,
    )

    # keys chosen so some buckets exist on only one side
    left = pd.DataFrame({"k": np.arange(4, dtype=np.int64), "v": np.ones(4, np.int64)})
    right = pd.DataFrame({"k": np.arange(100, 104, dtype=np.int64), "w": np.ones(4, np.int64)})
    ldir, rdir = str(tmp_path / "L"), str(tmp_path / "R")
    write_bucketed_parquet(rd.from_pandas(left), ldir, "k", 4)
    write_bucketed_parquet(rd.from_pandas(right), rdir, "k", 4)

    def anti(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        if lp.empty:
            return _empty({"k": "int64"})
        keep = lp[~lp["k"].isin(set(rp["k"].tolist()))] if len(rp) else lp
        return keep[["k"]]

    got = sorted(bucketed_cogroup(ldir, rdir, anti).to_pandas()["k"].tolist())
    assert got == [0, 1, 2, 3]  # nothing on the right matches


def test_bucketed_spec_mismatch_rejected(ray_session, tmp_path):
    import ray.data as rd

    from entity_resolution_engine_ray.sources.bucketed import (
        bucketed_cogroup,
        write_bucketed_parquet,
    )

    df = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    a, b = str(tmp_path / "A"), str(tmp_path / "B")
    write_bucketed_parquet(rd.from_pandas(df), a, "k", 4)
    write_bucketed_parquet(rd.from_pandas(df), b, "k", 8)
    with pytest.raises(ValueError, match="specs disagree"):
        bucketed_cogroup(a, b, lambda lp, rp: lp)
    # re-writing with a different spec into the same dir is rejected too
    with pytest.raises(ValueError, match="spec mismatch"):
        write_bucketed_parquet(rd.from_pandas(df), a, "k", 16)


def test_bucketed_write_resumes(ray_session, tmp_path):
    import ray.data as rd

    from entity_resolution_engine_ray.sources.bucketed import write_bucketed_parquet

    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64)})
    out = str(tmp_path / "T")
    r1 = write_bucketed_parquet(rd.from_pandas(df), out, "k", 4, params_hash="p")
    assert len(r1["written"]) == 4 and r1["skipped"] == []
    r2 = write_bucketed_parquet(rd.from_pandas(df), out, "k", 4, params_hash="p")
    assert r2["written"] == [] and len(r2["skipped"]) == 4
