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


def test_compact_shards_binpacks_and_loses_nothing(ray_session, tmp_path):
    import ray.data as rd

    from entity_resolution_engine_ray.sources.sink import (
        compact_shards,
        pruned_shard_paths,
        read_sharded_parquet,
        write_sharded_parquet,
    )

    pdf = _fixture(2000)
    pdf["shard"] = (pdf.index % 40).astype(np.int64)  # 40 tiny shards of 50 rows
    out = str(tmp_path / "C")
    write_sharded_parquet(
        rd.from_pandas(pdf).repartition(4), out, "shard", zone_cols=["x"]
    )
    before, _ = pruned_shard_paths(out)
    assert len(before) == 40

    rep = compact_shards(out, target_rows=300, zone_cols=["x"])
    assert rep["removed"] and rep["written"]
    after, _ = pruned_shard_paths(out)
    assert len(after) < len(before) // 4

    got = read_sharded_parquet(out).to_pandas().sort_values(["x", "y", "v"])
    want = pdf.sort_values(["x", "y", "v"])
    assert len(got) == len(want)
    for c in ("x", "y", "v"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all()

    # zone maps were recomputed: a narrow x-range still prunes and loses nothing
    sel = read_sharded_parquet(out, {"x": (0, 49)}).to_pandas()
    sel = sel[sel["x"] <= 49]
    assert len(sel) == int((pdf["x"] <= 49).sum())

    # re-running converges: everything is already >= target or solo
    rep2 = compact_shards(out, target_rows=300, zone_cols=["x"])
    assert not rep2["removed"]
