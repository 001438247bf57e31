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


def test_supplier_triangles_sparse_graph(ray_session, tmp_path):
    """The fixture's co-occurrence graph is complete (every wedge closes),
    so pin triangle counting on a SPARSE synthetic graph too: orders chain
    suppliers into known triangles + open wedges, checked against DuckDB
    running the registered oracle on the same parquet."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from entity_resolution_engine_ray.pipelines.queries import ORACLE_SQL, QUERIES

    # edges need >= 5 co-occurring orders: {1,2,3} triangle and {5,6,7,8}
    # clique repeat 5x (edges), {3,4}+{4,5} open wedge repeats 5x, and
    # {1,9} co-occurs only 4x — below threshold, must NOT become an edge
    base = [
        (0, [1, 2, 3]),
        (1, [3, 4]),
        (2, [4, 5]),
        (3, [5, 6, 7, 8]),
    ]
    orders = [(100 + 10 * rep + ok, supps) for rep in range(5) for ok, supps in base]
    orders += [(900 + rep, [1, 9]) for rep in range(4)]
    rows = [(ok, s) for ok, supps in orders for s in supps]
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "l_suppkey": pa.array([r[1] for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))

    got = QUERIES["supplier_triangles"](str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{tmp_path}/lineitem.parquet')"
    )
    want = con.execute(ORACLE_SQL["supplier_triangles"]).df()
    con.close()
    # triangle(1,2,3) + C(4,3)=4 in the clique = 5
    assert int(got["n_triangles"][0]) == 5
    assert int(got["n_triangles"][0]) == int(want["n_triangles"][0])


def test_bfs_hops_matches_serial_bfs(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.pagerank import bfs_hops

    rng = np.random.default_rng(13)
    n, m = 400, 900
    s = rng.integers(0, n, m).astype(np.int64)
    t = rng.integers(0, n, m).astype(np.int64)
    keep = s != t
    s, t = s[keep], t[keep]
    edges = pd.DataFrame(
        {"s": np.concatenate([s, t]), "t": np.concatenate([t, s])}
    )
    got = (
        bfs_hops(rd.from_pandas(edges).repartition(7), source=0, max_hops=4)
        .sort_values("node")
        .reset_index(drop=True)
    )
    # serial layered BFS
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for a, b in zip(edges["s"], edges["t"]):
        adj[int(a)].append(int(b))
    dist = {0: 0}
    q = deque([0])
    while q:
        u = q.popleft()
        if dist[u] >= 4:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    exp = (
        pd.DataFrame(
            {"node": list(dist.keys()), "hops": list(dist.values())}
        )
        .astype(np.int64)
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_bfs_hops_isolated_source_and_cap(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.pagerank import bfs_hops

    # a path 1-2-3-4; source 99 is not in the edge set at all
    edges = pd.DataFrame({"s": [1, 2, 2, 3, 3, 4], "t": [2, 1, 3, 2, 4, 3]})
    out = bfs_hops(rd.from_pandas(edges), source=99, max_hops=3)
    assert out["node"].tolist() == [99] and out["hops"].tolist() == [0]
    # hop cap truncates the path
    capped = bfs_hops(rd.from_pandas(edges), source=1, max_hops=2)
    assert sorted(capped["node"].tolist()) == [1, 2, 3]


def test_kcore_matches_serial_peel(ray_session):
    """Distributed peel == serial peel on a graph with a planted dense core
    (K8 clique) plus a tree fringe that cascades away at k=3."""
    import ray.data as rd

    from entity_resolution_engine_ray.stages.pagerank import kcore_nodes

    rng = np.random.default_rng(5)
    edges = set()
    for i in range(8):          # K8 clique: the 7-core everyone keeps
        for j in range(i + 1, 8):
            edges.add((i, j))
    for n in range(8, 60):      # fringe: each new node hangs off 2 earlier ones
        for p in rng.choice(n, size=2, replace=False):
            edges.add((int(p), n))
    directed = [(s, t) for s, t in edges] + [(t, s) for s, t in edges]
    df = pd.DataFrame(directed, columns=["s", "t"]).astype(np.int64)

    def serial_kcore(pairs, k):
        from collections import defaultdict

        adj = defaultdict(set)
        for s, t in pairs:
            adj[s].add(t)
            adj[t].add(s)
        alive = set(adj)
        changed = True
        while changed:
            changed = False
            for n in list(alive):
                if len(adj[n] & alive) < k:
                    alive.discard(n)
                    changed = True
        return sorted(alive)

    for k in (3, 5, 7, 8):
        got = kcore_nodes(rd.from_pandas(df).repartition(5), k=k)["node"].tolist()
        assert got == serial_kcore(edges, k), f"k={k}"
    # k=7 keeps exactly the clique unless the fringe reinforces it
    assert set(kcore_nodes(rd.from_pandas(df).repartition(3), k=8)["node"]) == set()
