"""Stage 5 — transitive clustering: distributed connected components.

Iterative hash-partitioned min-label propagation over the approved-edge
Dataset (the north rule's "distributed union-find"; cf. PAPERS.md "BTS:
Load-Balanced Distributed Union-Find", ICDE 2024 — we use the simpler
label-propagation formulation, which converges in O(diameter) rounds; near-dup
clusters are dense, so typically 2-4 rounds):

    labels(v) ← min(labels(v), min_{(u,v) ∈ E∪Eᵀ} labels(u))   until fixpoint

Nodes are 64-bit stable hashes of urls (numeric min-aggregates shuffle far
cheaper than strings); the url↔hash mapping rides along and is re-joined at
the end. Entity ids downstream are content hashes of sorted member urls
(functions/ids.cluster_entity_id), so label internals never leak.

``cluster_edges(..., method=)``:
- ``"labelprop"`` — the distributed path (default in the pipeline).
- ``"local"``     — driver-side union-find; only valid when the edge list is
  provably small (it is bounded by candidate pairs, not input rows).
- ``"auto"``      — local below ``local_edge_threshold`` edges, else labelprop.

Each round is checkpoint-free but bounded: `max_iterations` guards
pathological chains, and convergence is detected with a changed-label count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min

from entity_resolution_engine_ray.functions.similarity import stable_hash64
from entity_resolution_engine_ray.oracle.serial import UnionFind


def _hash_urls_batch(batch: pa.Table) -> pa.Table:
    l = batch["left_url"].to_pylist()
    r = batch["right_url"].to_pylist()
    return pa.table(
        {
            "left_url": batch["left_url"],
            "right_url": batch["right_url"],
            "src": pa.array([stable_hash64(u) for u in l], type=pa.int64()),
            "dst": pa.array([stable_hash64(u) for u in r], type=pa.int64()),
        }
    )


def _swap(batch: pa.Table) -> pa.Table:
    return pa.table({"src": batch["dst"], "dst": batch["src"]})


def connected_components_labelprop(
    edges_ds, num_partitions=None, max_iterations: int = 12
):
    """edges (left_url, right_url) → labels (url, cluster_label:int64).

    Fully distributed min-label propagation built on the task-level hash
    exchange (stages/exchange): per iteration, a cogroup of (edges by src,
    labels by node) emits per-partition-min candidate labels, and a cogroup
    of (candidates by dst, labels by node) takes the elementwise min — two
    slim int-table exchanges per round, no sort, no join actors. Converges
    in O(component diameter) rounds with a changed-label count.

    Only urls that appear in an edge are labeled (singletons are handled by
    the merge stage)."""
    from entity_resolution_engine_ray.stages.exchange import (
        hash_exchange_cogroup,
        hash_exchange_map_groups,
    )

    P = num_partitions or 32
    hashed = edges_ds.map_batches(_hash_urls_batch, batch_format="pyarrow").materialize()

    # url ↔ hash mapping (deduped per partition — globally deduped because
    # equal urls hash to the same partition)
    url_pairs = hashed.map_batches(
        lambda t: pa.table(
            {
                "url": pa.concat_arrays(
                    [t["left_url"].combine_chunks(), t["right_url"].combine_chunks()]
                ),
                "node": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    url_map = hash_exchange_map_groups(
        url_pairs, ["node"], lambda pdf: pdf.drop_duplicates("url"), P
    ).materialize()

    directed = (
        hashed.select_columns(["src", "dst"])
        .union(hashed.select_columns(["src", "dst"]).map_batches(_swap, batch_format="pyarrow"))
        .materialize()
    )

    # init: label(v) = min(v, min neighbor) — partition-local mins suffice
    # because the global min is refined by the iterations
    def init_labels(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("dst", as_index=False)["src"].min()
        lab = np.minimum(g["dst"].to_numpy(), g["src"].to_numpy())
        return pd.DataFrame({"node": g["dst"].to_numpy(), "label": lab})

    labels = hash_exchange_map_groups(directed, ["dst"], init_labels, P).materialize()

    def propagate(edges_pdf: pd.DataFrame, labels_pdf: pd.DataFrame) -> pd.DataFrame:
        if edges_pdf.empty or labels_pdf.empty:
            return pd.DataFrame(
                {"dst": pd.Series([], dtype=np.int64), "cand": pd.Series([], dtype=np.int64)}
            )
        m = edges_pdf.merge(labels_pdf, left_on="src", right_on="node", how="inner")
        g = m.groupby("dst", as_index=False)["label"].min()
        return g.rename(columns={"label": "cand"})

    def refine(cand_pdf: pd.DataFrame, labels_pdf: pd.DataFrame) -> pd.DataFrame:
        if labels_pdf.empty:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=np.int64), "label": pd.Series([], dtype=np.int64),
                 "changed": pd.Series([], dtype=np.int64)}
            )
        cand = (
            cand_pdf.groupby("dst", as_index=False)["cand"].min()
            if not cand_pdf.empty
            else pd.DataFrame({"dst": pd.Series([], dtype=np.int64), "cand": pd.Series([], dtype=np.int64)})
        )
        m = labels_pdf.merge(cand, left_on="node", right_on="dst", how="left")
        old = m["label"].to_numpy(dtype=np.int64)
        cv = m["cand"].to_numpy()
        cv = np.where(pd.isna(cv), old, cv).astype(np.int64)
        new = np.minimum(old, cv)
        return pd.DataFrame(
            {"node": m["node"].to_numpy(dtype=np.int64), "label": new,
             "changed": (new != old).astype(np.int64)}
        )

    for _ in range(max_iterations):
        cand = hash_exchange_cogroup(directed, labels, ["src"], ["node"], propagate, P)
        # candidates are keyed by dst from the src-partitioned exchange —
        # re-partition them by dst against labels by node
        new_labels = hash_exchange_cogroup(cand, labels, ["dst"], ["node"], refine, P).materialize()
        changed = new_labels.sum("changed") or 0
        labels = new_labels.drop_columns(["changed"]).materialize()
        if changed == 0:
            break

    def emit(url_pdf: pd.DataFrame, labels_pdf: pd.DataFrame) -> pd.DataFrame:
        if url_pdf.empty:
            return pd.DataFrame(
                {"url": pd.Series([], dtype=object), "cluster_label": pd.Series([], dtype=np.int64)}
            )
        m = url_pdf.merge(labels_pdf, on="node", how="inner")
        return pd.DataFrame({"url": m["url"].to_numpy(), "cluster_label": m["label"].to_numpy(dtype=np.int64)})

    return hash_exchange_cogroup(url_map, labels, ["node"], ["node"], emit, P)


def _merge_labels(t: pa.Table) -> pa.Table:
    old = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    cand = t["cand"].to_numpy(zero_copy_only=False)
    cand = np.where(pd.isna(cand), old, cand).astype(np.int64)
    new = np.minimum(old, cand)
    return pa.table(
        {
            "node": t["node"],
            "label": pa.array(new, type=pa.int64()),
            "changed": pa.array((new != old).astype(np.int64), type=pa.int64()),
        }
    )


def _forest_partition(pdf: pd.DataFrame) -> pd.DataFrame:
    """Local union-find over one hash partition of (src, dst) edges → the
    partition's spanning forest as (node, root) pairs. The union of
    per-partition forests preserves global connectivity with ≤ Σ_p |V_p|
    edges — typically ≪ |E| for dense near-dup graphs."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        p = parent.setdefault(x, x)
        while p != x:
            parent[x] = p = parent.setdefault(p, p)
            x = p
            p = parent[x]
        return x

    for u, v in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    nodes = np.fromiter(parent.keys(), dtype=np.int64, count=len(parent))
    roots = np.fromiter((find(int(n)) for n in nodes), dtype=np.int64, count=len(nodes))
    keep = nodes != roots
    return pd.DataFrame({"src": nodes[keep], "dst": roots[keep]})


def cluster_label_map(edges_ds, num_partitions: int = 64, contraction_rounds: int = 2) -> dict[int, int]:
    """Distributed-contraction connected components → driver-side label map
    {node_hash: component_root_hash} (root = min member hash).

    Each round: hash-partition the edge list, run union-find LOCALLY per
    partition, keep only the spanning forest (≈|V| rows). One round
    typically shrinks web-dedup edge lists 10-30×; the final forest is
    unioned on the driver. The map's size is O(|V_connected|) — for inputs
    where that exceeds driver memory use ``connected_components_labelprop``
    (the fully-distributed path) instead."""
    from entity_resolution_engine_ray.stages.grouping import partition_map_groups

    def to_int_edges(t: pa.Table) -> pa.Table:
        # prefer the precomputed id columns (fused edges carry them);
        # fall back to hashing urls for arbitrary edge Datasets
        if "left_id" in t.schema.names:
            return pa.table({"src": t["left_id"], "dst": t["right_id"]})
        return pa.table(
            {
                "src": pa.array(
                    [stable_hash64(u) for u in t["left_url"].to_pylist()], type=pa.int64()
                ),
                "dst": pa.array(
                    [stable_hash64(u) for u in t["right_url"].to_pylist()], type=pa.int64()
                ),
            }
        )

    hashed = edges_ds.map_batches(to_int_edges, batch_format="pyarrow")
    forest = hashed
    for _ in range(contraction_rounds):
        forest = partition_map_groups(forest, ["src", "dst"], _forest_partition, num_partitions)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        p = parent.setdefault(x, x)
        while p != x:
            parent[x] = p = parent.setdefault(p, p)
            x = p
            p = parent[x]
        return x

    for batch in forest.iter_batches(batch_size=262144, batch_format="pyarrow"):
        for u, v in zip(batch["src"].to_numpy(), batch["dst"].to_numpy()):
            ru, rv = find(int(u)), find(int(v))
            if ru != rv:
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
    return {n: find(n) for n in list(parent)}


def connected_components_local(edges_ds):
    """Driver-side union-find fallback for provably-small edge sets."""
    uf = UnionFind()
    urls = set()
    for batch in edges_ds.select_columns(["left_url", "right_url"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for l, r in zip(batch["left_url"].to_pylist(), batch["right_url"].to_pylist()):
            uf.union(l, r)
            urls.add(l)
            urls.add(r)
    rows_url = sorted(urls)
    labels = [stable_hash64(uf.find(u)) for u in rows_url]
    # label = hash of component-min url — same label space as labelprop? No:
    # labelprop labels are min node hashes. Downstream only needs *grouping*,
    # and entity ids are content hashes of members, so the label value is
    # opaque either way.
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array(rows_url, type=pa.string()),
                "cluster_label": pa.array(labels, type=pa.int64()),
            }
        )
    )


def cluster_edges(
    edges_ds,
    method: str = "labelprop",
    num_partitions=None,
    max_iterations: int = 12,
    local_edge_threshold: int = 2_000_000,
):
    if method == "auto":
        method = "local" if edges_ds.count() <= local_edge_threshold else "labelprop"
    if method == "local":
        return connected_components_local(edges_ds)
    return connected_components_labelprop(
        edges_ds, num_partitions=num_partitions, max_iterations=max_iterations
    )
