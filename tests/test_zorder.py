"""Z-order layout: zone pruning bites on EVERY z-ordered column and the
pruned + exactly-filtered read equals the brute-force answer."""

import numpy as np
import pandas as pd


def _fixture(n: int = 4000) -> pd.DataFrame:
    rng = np.random.default_rng(11)
    return pd.DataFrame(
        {
            "x": rng.integers(0, 1000, n).astype(np.int64),
            "y": rng.integers(0, 1000, n).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )


def test_zorder_prunes_on_both_columns_and_loses_nothing(ray_session, tmp_path):
    import ray.data as rd

    from entity_resolution_engine_ray.sources.sink import (
        pruned_shard_paths,
        read_sharded_parquet,
    )
    from entity_resolution_engine_ray.sources.zorder import write_zordered_parquet

    pdf = _fixture()
    out = str(tmp_path / "Z")
    report = write_zordered_parquet(
        rd.from_pandas(pdf).repartition(6), out, ["x", "y"], bits=3
    )
    n_shards = len(report["written"])
    assert n_shards > 16  # 64-way morton grid over independent uniforms

    # a narrow range on EITHER column alone must skip shards — the z-order
    # property a single-column sort cannot give for the second column
    _, skip_x = pruned_shard_paths(out, {"x": (0, 99)})
    _, skip_y = pruned_shard_paths(out, {"y": (0, 99)})
    assert len(skip_x) >= n_shards // 2
    assert len(skip_y) >= n_shards // 2

    # pruned read + exact filter == brute force (zone maps only prune)
    got = read_sharded_parquet(out, {"x": (100, 399), "y": (600, 899)}).to_pandas()
    got = got[(got["x"].between(100, 399)) & (got["y"].between(600, 899))]
    want = pdf[(pdf["x"].between(100, 399)) & (pdf["y"].between(600, 899))]
    assert len(got) == len(want)
    assert int(got["v"].sum()) == int(want["v"].sum())

    # and the 2-D predicate must prune strictly more than either 1-D one
    _, skip_both = pruned_shard_paths(out, {"x": (100, 399), "y": (600, 899)})
    _, skip_x2 = pruned_shard_paths(out, {"x": (100, 399)})
    _, skip_y2 = pruned_shard_paths(out, {"y": (600, 899)})
    assert len(skip_both) > max(len(skip_x2), len(skip_y2))


def test_zorder_constant_column_and_resume(ray_session, tmp_path):
    import ray.data as rd

    from entity_resolution_engine_ray.sources.zorder import write_zordered_parquet

    pdf = _fixture(300)
    pdf["x"] = 7  # degenerate: all cuts equal — every row lands in bucket 0 of x
    out = str(tmp_path / "ZC")
    r1 = write_zordered_parquet(rd.from_pandas(pdf), out, ["x", "y"], bits=3,
                                params_hash="h1")
    assert len(r1["written"]) > 0 and not r1["skipped"]
    # re-run with the same params: every sealed shard skips
    r2 = write_zordered_parquet(rd.from_pandas(pdf), out, ["x", "y"], bits=3,
                                params_hash="h1")
    assert sorted(r2["skipped"]) == sorted(r1["written"]) and not r2["written"]
