"""Distributed PageRank vs a serial dense oracle, plus the query pin."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _dense_pagerank(edges: pd.DataFrame, n_iters: int, damping: float) -> pd.DataFrame:
    """Serial oracle: same simplified formulation on a dense matrix."""
    e = edges.drop_duplicates()
    nodes = np.sort(pd.unique(pd.concat([e["src"], e["dst"]])))
    idx = {n: i for i, n in enumerate(nodes)}
    outdeg = e.groupby("src").size()
    r = np.ones(len(nodes), dtype=np.float64)
    for _ in range(n_iters):
        nxt = np.full(len(nodes), 1.0 - damping)
        contrib = r[[idx[s] for s in e["src"]]] / outdeg.loc[e["src"]].to_numpy(np.float64)
        np.add.at(nxt, [idx[d] for d in e["dst"]], damping * contrib)
        r = nxt
    return pd.DataFrame({"node": nodes, "r": r})


@pytest.mark.parametrize("n_iters", [1, 4])
def test_pagerank_matches_dense_oracle(ray_session, n_iters):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.pagerank import pagerank

    rng = np.random.default_rng(11)
    n_nodes, n_edges = 80, 600
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, n_nodes, n_edges).astype(np.int64),
            "dst": rng.integers(0, n_nodes, n_edges).astype(np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(edges, preserve_index=False)).repartition(7)
    got = pagerank(ds, n_iters=n_iters, damping=0.85, num_partitions=5)
    want = _dense_pagerank(edges, n_iters, 0.85)
    assert (got["node"].to_numpy() == want["node"].to_numpy()).all()
    np.testing.assert_allclose(got["r"].to_numpy(), want["r"].to_numpy(), atol=1e-9)


def test_pagerank_duplicate_edges_and_sinks(ray_session):
    """Duplicate edges collapse to one; pure-sink nodes keep receiving mass
    but contribute none; disconnected sources settle at 1-d."""
    import ray.data as rd

    from entity_resolution_engine_ray.stages.pagerank import pagerank

    edges = pd.DataFrame(
        {
            "src": np.array([1, 1, 1, 2, 3], dtype=np.int64),  # 1→2 duplicated
            "dst": np.array([2, 2, 3, 4, 4], dtype=np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(edges, preserve_index=False))
    got = pagerank(ds, n_iters=3, damping=0.85, num_partitions=3)
    want = _dense_pagerank(edges, 3, 0.85)
    assert (got["node"].to_numpy() == want["node"].to_numpy()).all()
    np.testing.assert_allclose(got["r"].to_numpy(), want["r"].to_numpy(), atol=1e-12)
    # node 1 has no in-edges: rank fixed at 1-d after the first round
    assert abs(got.loc[got["node"] == 1, "r"].iloc[0] - 0.15) < 1e-12
