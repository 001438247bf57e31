"""Distributed PageRank over an edge list — the link-graph quality signal
web-corpus pipelines attach to documents before filtering/weighting.

Simplified fixed-iteration formulation (init r=1, no dangling-mass
redistribution): ``r'[n] = (1-d) + d * Σ_{(s,n)∈E} r[s] / outdeg[s]`` —
exactly expressible as K layered SQL CTEs, so the driver can hash-check it
against DuckDB (see pipelines/queries.q_pagerank_top20).

Scale shape (the labelprop-CC pattern, stages/cluster.py):
- edges are hash-partitioned by ``src`` ONCE (stationary across rounds);
  edge dedup and out-degree are computed partition-locally after that
  exchange — correct because every (src, *) lands in one partition.
- rank rows are partitioned by the SAME value hash, so the rank⋈edge join
  on src is partition-local every round; only per-dst contribution
  partials (pre-aggregated within the partition before the split) move
  between rounds — O(|V|) rows per round, never the edges.
- rounds are chained on object refs with NO driver sync inside the loop;
  the single ``ray.get`` happens when the final ranks are collected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from entity_resolution_engine_ray.stages.exchange import (
    _partition_hash,
    exchange_partition_refs,
)


@ray.remote
def _prep_edges(part: pa.Table, src_col: str, dst_col: str) -> pa.Table:
    """Partition-local edge dedup + out-degree (global-exact: the partition
    owns every out-edge of its src keys)."""
    pdf = part.to_pandas()[[src_col, dst_col]].drop_duplicates()
    if len(pdf):
        pdf["outdeg"] = pdf.groupby(src_col)[dst_col].transform("size").astype(np.int64)
    else:
        pdf["outdeg"] = pd.Series([], dtype=np.int64)
    pdf = pdf.rename(columns={src_col: "src", dst_col: "dst"})
    return pa.Table.from_pandas(pdf, preserve_index=False).replace_schema_metadata(None)


@ray.remote
def _init_ranks(part: pa.Table) -> pa.Table:
    nodes = pd.unique(part.to_pandas()["node"])
    return pa.table(
        {"node": pa.array(np.sort(nodes)), "r": pa.array(np.ones(len(nodes), dtype=np.float64))}
    )


def _contrib_impl(edge_part: pa.Table, rank_part: pa.Table, P: int):
    e = edge_part.to_pandas()
    r = rank_part.to_pandas()
    if len(e) == 0 or len(r) == 0:
        empty = pa.table(
            {"dst": pa.array([], type=pa.int64()), "c": pa.array([], type=pa.float64())}
        )
        return tuple([empty] * P) if P > 1 else empty
    m = e.merge(r, left_on="src", right_on="node", how="left")
    contrib = (
        pd.DataFrame(
            {"dst": m["dst"], "c": m["r"].to_numpy(np.float64) / m["outdeg"].to_numpy(np.float64)}
        )
        .groupby("dst", as_index=False)["c"]
        .sum()
    )
    tbl = pa.Table.from_pandas(contrib, preserve_index=False).replace_schema_metadata(None)
    pg = _partition_hash(tbl, ["dst"], P)
    order = np.argsort(pg, kind="stable")
    bounds = np.searchsorted(pg[order], np.arange(P + 1))
    out = [tbl.take(pa.array(order[bounds[p] : bounds[p + 1]])) for p in range(P)]
    return tuple(out) if P > 1 else out[0]


def _update_impl(rank_part: pa.Table, damping: float, *contribs: pa.Table) -> pa.Table:
    r = rank_part.to_pandas()
    parts = [c.to_pandas() for c in contribs if c.num_rows > 0]
    if parts:
        summed = pd.concat(parts).groupby("dst", as_index=False)["c"].sum()
        m = r.merge(summed, left_on="node", right_on="dst", how="left")
        total = m["c"].fillna(0.0).to_numpy(np.float64)
    else:
        total = np.zeros(len(r), dtype=np.float64)
    return pa.table(
        {"node": rank_part["node"], "r": pa.array((1.0 - damping) + damping * total)}
    )


def pagerank(
    edges_ds,
    n_iters: int = 3,
    damping: float = 0.85,
    num_partitions: int | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pd.DataFrame:
    """Run ``n_iters`` synchronous PageRank rounds over ``edges_ds``
    (directed, duplicates tolerated) and return (node, r) for every node.
    The returned frame is |V|-sized — callers at corpus scale should take a
    top-k or write it out instead of holding all ranks on the driver; the
    iteration itself never materializes edges or ranks driver-side."""
    from entity_resolution_engine_ray.stages.joins import default_join_partitions

    P = num_partitions or default_join_partitions()

    edge_parts = [
        _prep_edges.remote(p, src_col, dst_col)
        for p in exchange_partition_refs(edges_ds, [src_col], P)
    ]

    # node universe = src ∪ dst, partitioned by the same value hash
    import ray.data as rd

    def to_nodes(t: pa.Table) -> pa.Table:
        cols = [t[src_col], t[dst_col]]
        merged = pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols])
        return pa.table({"node": pa.array(np.unique(np.asarray(merged)))})

    nodes_ds = edges_ds.map_batches(to_nodes, batch_format="pyarrow")
    rank_parts = [_init_ranks.remote(p) for p in exchange_partition_refs(nodes_ds, ["node"], P)]

    contrib = ray.remote(_contrib_impl).options(num_returns=P if P > 1 else 1)
    update = ray.remote(_update_impl)
    for _ in range(n_iters):
        splits = [contrib.remote(edge_parts[p], rank_parts[p], P) for p in range(P)]
        rank_parts = [
            update.remote(
                rank_parts[q],
                damping,
                *([s[q] for s in splits] if P > 1 else splits),
            )
            for q in range(P)
        ]

    out = pd.concat([t.to_pandas() for t in ray.get(rank_parts)], ignore_index=True)
    return out.sort_values("node", kind="mergesort").reset_index(drop=True)


@ray.remote
def _bfs_expand(edge_part: pa.Table, frontier, visited) -> np.ndarray:
    """Unvisited neighbors of the frontier within one stationary edge
    partition: searchsorted membership test against the (sorted) broadcast
    frontier, then a sorted-visited exclusion — all numpy, no Python rows."""
    if edge_part.num_rows == 0 or len(frontier) == 0:
        return np.empty(0, dtype=np.int64)
    s = edge_part["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = edge_part["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    idx = np.searchsorted(frontier, s)
    idx[idx >= len(frontier)] = len(frontier) - 1
    hits = frontier[idx] == s
    cand = np.unique(t[hits])
    vi = np.searchsorted(visited, cand)
    vi[vi >= len(visited)] = len(visited) - 1
    return cand[visited[vi] != cand] if len(visited) else cand


def bfs_hops(edges_ds, source: int, max_hops: int, num_partitions: int | None = None) -> pd.DataFrame:
    """Breadth-first hop distances from ``source`` over a DIRECTED edge
    Dataset (s:int64, t:int64) — feed both directions for an undirected
    graph. Returns a pandas frame (node, hops) for every node reachable in
    ≤ ``max_hops`` hops (the source at 0). Layered BFS visits each node at
    its minimal hop count by construction, so the result equals the
    recursive-CTE MIN(d) oracle exactly.

    Scale shape: edges are hash-partitioned by src ONCE and stay
    STATIONARY (exchange_partition_refs — the pagerank/labelprop pattern);
    each round broadcasts only the current frontier + visited id arrays
    (``ray.put`` once per round, read by every partition task) and gets
    back per-partition unvisited-neighbor arrays. Frontier/visited are
    O(nodes) — the same order as this operator's OUTPUT, so node-scale
    driver state is inherent to the contract; the EDGE set (the web-scale
    side) never moves after the initial partition."""
    edges_refs = exchange_partition_refs(edges_ds, ["s"], num_partitions)

    visited = np.array([np.int64(source)], dtype=np.int64)
    frontier = visited
    nodes = [np.int64(source)]
    hops = [np.int64(0)]
    for d in range(1, int(max_hops) + 1):
        f_ref = ray.put(np.sort(frontier))
        v_ref = ray.put(np.sort(visited))
        parts = ray.get([_bfs_expand.remote(r, f_ref, v_ref) for r in edges_refs])
        new = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        if len(new) == 0:
            break
        nodes.append(new)
        hops.append(np.full(len(new), d, dtype=np.int64))
        visited = np.union1d(visited, new)
        frontier = new
    return pd.DataFrame(
        {
            "node": np.concatenate([np.atleast_1d(n) for n in nodes]).astype(np.int64),
            "hops": np.concatenate([np.atleast_1d(h) for h in hops]).astype(np.int64),
        }
    )


@ray.remote
def _kcore_degrees(edge_part: pa.Table, removed) -> pa.Table:
    """Per-node degree within one stationary src-partition, ignoring edges
    with a REMOVED endpoint. Src-partitioning makes the per-partition count
    a node's FULL degree (all (src, *) rows co-locate), so no degree merge
    across partitions is needed."""
    if edge_part.num_rows == 0:
        return pa.table({"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())})
    s = edge_part["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = edge_part["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(removed):
        def alive(a):
            i = np.searchsorted(removed, a)
            i[i >= len(removed)] = len(removed) - 1
            return removed[i] != a
        keep = alive(s) & alive(t)
        s, t = s[keep], t[keep]
    if len(s) == 0:
        return pa.table({"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())})
    nodes, deg = np.unique(s, return_counts=True)
    return pa.table({"node": pa.array(nodes), "deg": pa.array(deg.astype(np.int64))})


def kcore_nodes(edges_ds, k: int, num_partitions: int | None = None,
                max_rounds: int = 1000) -> pd.DataFrame:
    """Nodes of the k-core (the maximal subgraph where every node has
    degree ≥ k) of a DIRECTED edge Dataset (s:int64, t:int64) — feed both
    directions for an undirected graph. Classic iterative peel: drop every
    node with degree < k, recompute degrees, repeat to fixpoint; the
    result is order-independent (the k-core is unique), so the distributed
    peel equals the serial one exactly.

    Scale shape (the bfs_hops contract): edges hash-partition by src ONCE
    and stay stationary; each round broadcasts only the cumulative sorted
    removed-node array (``ray.put`` once per round) and gets back O(nodes)
    degree rows per partition — full degrees, not partials, because all of
    a src's edges co-locate. Driver state is O(nodes), the same order as
    the output; the edge set never moves after the initial partition.
    Returns a pandas frame (node,) sorted ascending. Raises if the peel
    does not converge within ``max_rounds`` (it converges in ≤ rounds =
    peel depth; the guard catches pathological inputs, not slow ones)."""
    edges_refs = exchange_partition_refs(edges_ds, ["s"], num_partitions)

    removed = np.empty(0, dtype=np.int64)
    for _ in range(int(max_rounds)):
        r_ref = ray.put(removed)
        parts = ray.get([_kcore_degrees.remote(r, r_ref) for r in edges_refs])
        nodes = np.concatenate([p["node"].to_numpy(zero_copy_only=False) for p in parts])
        deg = np.concatenate([p["deg"].to_numpy(zero_copy_only=False) for p in parts])
        drop = nodes[deg < k]
        if len(drop) == 0:
            return pd.DataFrame({"node": np.sort(nodes).astype(np.int64)})
        removed = np.sort(np.concatenate([removed, drop]))
    raise RuntimeError(f"k-core peel did not converge within {max_rounds} rounds")
