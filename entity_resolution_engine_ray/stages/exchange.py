"""Task-based hash exchange — a map/reduce shuffle without sorting.

``Dataset.groupby`` implements exchange via a sort-based AllToAll: every
block is sorted, range-partitioned, and merged — O(n log n) work and two
full materializations for what hash partitioning does in O(n). This module
implements the classic two-stage MR exchange with raw Ray tasks (the one
place the Dataset API cannot express the physical plan we need —
hash-partition-without-sort; see the builder brief's escape hatch):

  stage 1 (one task per input block):   split the block into P sub-tables
                                        by key hash → P object refs
  stage 2 (one task per partition p):   concat the p-th sub-table of every
                                        block → apply the user's vectorized
                                        per-partition function

Results are identical to ``grouping.partition_map_groups`` for any
per-group-pure function (same partitioner hash). Deterministic: partition
assignment depends only on key values.

Scale notes (both matter at 100 TB and were measured locally):

- Sub-tables are materialized with per-partition ``take`` — NEVER
  ``Table.slice``. Pickling a slice serializes the slice's *parent*
  buffers in full (measured: a 1% slice of a 41 MB string table pickles to
  41 MB), so a slice-based split amplifies shuffle bytes ×P. ``take``
  produces compact, truncated buffers.
- Input blocks are coalesced into at most ``max_split_tasks`` split groups
  before partitioning, so the intermediate object count is
  O(split_tasks × P), not O(input_blocks × P) — checkpoint re-reads and
  fine-grained upstream stages would otherwise explode the object count
  (measured 3× wall-time at 172 input blocks vs 86 on identical data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

_FNV = np.uint64(1099511628211)
_NULL_HASH = np.uint64(0x9E3779B97F4A7C15)
_HASH_KEY = "0123456789abcdef"


def _key_hash_column(col, n_rows: int) -> np.ndarray:
    """Dtype-STABLE uint64 hash of one key column.

    A block's null pattern must never change where a VALUE hashes:
    ``to_numpy`` turns a nulled int/bool column into float64/object, and
    ``pd.util.hash_array(5.0) != hash_array(5)`` — the same key would land
    in different partitions depending on which block it shares with a null
    (verified: groups silently split). Integer/boolean columns therefore
    hash their int64 cast with nulls masked to a fixed constant; float,
    temporal and object columns keep a stable numpy dtype under nulls
    already (NaN/NaT/None hash deterministically)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type) or pa.types.is_boolean(col.type):
        vals = col.cast(pa.int64())
        if vals.null_count:
            mask = pc.is_null(vals).to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(
                vals.fill_null(0).to_numpy(zero_copy_only=False), hash_key=_HASH_KEY
            )
            h[mask] = _NULL_HASH
            return h
        return pd.util.hash_array(vals.to_numpy(zero_copy_only=False), hash_key=_HASH_KEY)
    return pd.util.hash_array(col.to_numpy(zero_copy_only=False), hash_key=_HASH_KEY)


def _partition_hash(tbl: pa.Table, key_cols: list[str], num_partitions: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = np.zeros(tbl.num_rows, dtype=np.uint64)
        for c in key_cols:
            h = h * _FNV + _key_hash_column(tbl[c], tbl.num_rows)
        return (h % np.uint64(num_partitions)).astype(np.int64)


def _arrow_refs(ds) -> list:
    """Arrow block refs of ``ds`` WITHOUT the schema probe.

    ``Dataset.to_arrow_refs()`` ends with ``schema(fetch_if_missing=True)``,
    which on a lazy (non-materialized) dataset launches a SECOND limit-1
    execution of the entire upstream plan — measured 33.6 s against a 38.2 s
    real pass at 1M pages (the limit-1 still runs whole upstream blocks).
    Every producer in this engine emits Arrow blocks (map_batches
    batch_format="pyarrow" / read_parquet / from_arrow_refs), so the
    zero-copy path is guaranteed and the probe is pure waste: flatten the
    ref bundles directly."""
    return _arrow_refs_counted(ds)[0]


def _arrow_refs_counted(ds) -> tuple[list, int | None]:
    """(block refs, total rows) in ONE bundle walk — the row count comes
    from block METADATA (RefBundle.num_rows), so auto-sizing the exchange
    width by actual input size costs nothing extra. Rows may be None when
    a bundle lacks metadata; callers fall back to the CPU-floor width."""
    refs: list = []
    total = 0
    for bundle in ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
        n = bundle.num_rows()
        if n is None:
            total = None
        if total is not None:
            total += n
    return refs, total


def _default_split_tasks() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(8, cpus)


def _coalesce_refs(refs: list, max_groups: int) -> list[list]:
    """Contiguous grouping of block refs into ≤ max_groups split tasks."""
    n = len(refs)
    g = min(n, max_groups)
    bounds = np.linspace(0, n, g + 1).astype(int)
    return [refs[bounds[i] : bounds[i + 1]] for i in range(g) if bounds[i] < bounds[i + 1]]


def _empty_block_like(ds) -> pa.Table:
    """Typed zero-row table matching ``ds``'s schema (a dataset with zero
    block refs is already fully executed, so the schema fetch is free);
    falls back to a column-less table when even the schema is unknown."""
    try:
        sch = ds.schema(fetch_if_missing=True)
        base = getattr(sch, "base_schema", sch)
        if isinstance(base, pa.Schema):
            return base.empty_table()
    except Exception:  # noqa: BLE001 - schema probe must never kill the exchange
        pass
    return pa.table({})


def _ensure_table(block) -> pa.Table:
    # blocks are Arrow throughout this engine, but two sources of pandas
    # blocks exist: from_pandas datasets, and the source blocks a 0-row
    # dataset surfaces when its lazy map_batches is skipped entirely
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block, preserve_index=False)


@ray.remote
def _split_block(key_cols: list[str], num_partitions: int, *tbls: pa.Table):
    tbls = [_ensure_table(t) for t in tbls]
    tbl = pa.concat_tables(tbls, promote_options="default") if len(tbls) > 1 else tbls[0]
    if tbl.num_rows == 0:
        # nothing to hash — a 0-row dataset's skipped lazy map can surface
        # zero-COLUMN source blocks that would KeyError on the key lookup
        return tuple([tbl] * num_partitions) if num_partitions > 1 else tbl
    pg = _partition_hash(tbl, key_cols, num_partitions)
    order = np.argsort(pg, kind="stable")
    sorted_pg = pg[order]
    bounds = np.searchsorted(sorted_pg, np.arange(num_partitions + 1))
    # per-partition take from the ORIGINAL table: each output owns compact
    # buffers (a slice of a sorted copy would pickle the whole block, ×P)
    out = []
    for p in range(num_partitions):
        out.append(tbl.take(pa.array(order[bounds[p] : bounds[p + 1]])))
    return tuple(out) if num_partitions > 1 else out[0]


@ray.remote
def _split_block_groups(key_cols: list[str], P: int, K: int, *tbls: pa.Table):
    """Hierarchical-exchange level 1: route rows to partition GROUPS.

    Partition identity stays ``hash % P`` (so rows land on the same owner
    as every single-level exchange over the same key); a group is K
    consecutive partitions, g = p // K, G = ceil(P / K) outputs."""
    tbls = [_ensure_table(t) for t in tbls]
    tbl = pa.concat_tables(tbls, promote_options="default") if len(tbls) > 1 else tbls[0]
    G = -(-P // K)
    if tbl.num_rows == 0:
        return tuple([tbl] * G) if G > 1 else tbl
    pg = _partition_hash(tbl, key_cols, P) // K
    order = np.argsort(pg, kind="stable")
    bounds = np.searchsorted(pg[order], np.arange(G + 1))
    out = [tbl.take(pa.array(order[bounds[g] : bounds[g + 1]])) for g in range(G)]
    return tuple(out) if G > 1 else out[0]


@ray.remote
def _split_group_members(key_cols: list[str], P: int, K: int, g: int, *tbls: pa.Table):
    """Hierarchical-exchange level 2: split ONE group's rows into its
    member partitions (g*K .. min(g*K+K, P)-1). Kg outputs, index i ↔
    partition g*K + i."""
    tbls = [_ensure_table(t) for t in tbls]
    tbl = pa.concat_tables(tbls, promote_options="default") if len(tbls) > 1 else tbls[0]
    Kg = min(K, P - g * K)
    if tbl.num_rows == 0:
        return tuple([tbl] * Kg) if Kg > 1 else tbl
    local = _partition_hash(tbl, key_cols, P) - g * K
    order = np.argsort(local, kind="stable")
    bounds = np.searchsorted(local[order], np.arange(Kg + 1))
    out = [tbl.take(pa.array(order[bounds[i] : bounds[i + 1]])) for i in range(Kg)]
    return tuple(out) if Kg > 1 else out[0]


@ray.remote(num_returns=2)
def _reduce_partition(fn, *subtables: pa.Table):
    parts = [t for t in subtables if t.num_rows > 0]
    merged = (
        pa.concat_tables(parts, promote_options="default")
        if parts
        else subtables[0]  # zero-row table, keeps the input schema
    )
    result = fn(merged.to_pandas())
    # strip pandas metadata (schema-identity noise downstream)
    out = pa.Table.from_pandas(result, preserve_index=False).replace_schema_metadata(None)
    return out, out.num_rows


@ray.remote(num_returns=2)
def _reduce_partition_arrow(fn, *subtables: pa.Table):
    """Arrow-native reduce: ``fn(pa.Table) -> pa.Table`` with NO pandas
    round-trip. ``_reduce_partition``'s ``to_pandas()`` explodes list
    columns into one numpy object per row and copies every string — on a
    fat (token_ids list) partition that conversion costs more than the
    actual kernel work; partition fns that can consume Arrow directly
    skip it entirely."""
    parts = [t for t in subtables if t.num_rows > 0]
    merged = (
        pa.concat_tables(parts, promote_options="default")
        if parts
        else subtables[0]  # zero-row table, keeps the input schema
    )
    out = fn(merged)
    return out.replace_schema_metadata(None), out.num_rows


@ray.remote(num_returns=2)
def _reduce_cogroup(fn, n_left: int, *subtables: pa.Table):
    lefts = [t for t in subtables[:n_left] if t.num_rows > 0]
    rights = [t for t in subtables[n_left:] if t.num_rows > 0]
    left = pa.concat_tables(lefts, promote_options="default") if lefts else subtables[0]
    right = (
        pa.concat_tables(rights, promote_options="default") if rights else subtables[n_left]
    )
    result = fn(left.to_pandas(), right.to_pandas())
    out = pa.Table.from_pandas(result, preserve_index=False).replace_schema_metadata(None)
    return out, out.num_rows


def hash_exchange_cogroup(
    left_ds,
    right_ds,
    left_keys: list[str],
    right_keys: list[str],
    fn,
    num_partitions: int | None = None,
):
    """Co-partitioned two-sided exchange: rows of both datasets with the
    same key hash meet in one partition; ``fn(left_pdf, right_pdf)`` runs
    once per partition (the task-level hash join / cogroup primitive —
    key semantics are up to ``fn``). ``num_partitions=None`` →
    ``grouping.auto_partitions(rows)`` sized by the LARGER side's actual
    row count (free — block metadata), CPU floor when metadata is absent."""
    l_refs, l_rows = _arrow_refs_counted(left_ds)
    r_refs, r_rows = _arrow_refs_counted(right_ds)
    # a zero-block side must still reach fn as a TYPED empty frame — with
    # no left sub-tables the reduce fallback would otherwise hand fn the
    # first RIGHT sub-table as its left argument (and an empty right side
    # would IndexError); synthesize one empty block from the side's schema
    if not l_refs:
        l_refs = [ray.put(_empty_block_like(left_ds))]
        l_rows = 0
    if not r_refs:
        r_refs = [ray.put(_empty_block_like(right_ds))]
        r_rows = 0
    if num_partitions is None:
        from entity_resolution_engine_ray.stages.grouping import auto_partitions

        # either side metadata-less → no hint (CPU floor): a known-small
        # side must not collapse the width under an unknown-LARGE one
        hint = None if (l_rows is None or r_rows is None) else max(l_rows, r_rows)
        num_partitions = auto_partitions(hint)
    max_groups = _default_split_tasks()
    l_splits = [
        _split_block.options(num_returns=num_partitions).remote(
            left_keys, num_partitions, *group
        )
        for group in _coalesce_refs(l_refs, max_groups)
    ]
    r_splits = [
        _split_block.options(num_returns=num_partitions).remote(
            right_keys, num_partitions, *group
        )
        for group in _coalesce_refs(r_refs, max_groups)
    ]
    reduced, counts = [], []
    for p in range(num_partitions):
        lsub = [s[p] for s in l_splits] if num_partitions > 1 else list(l_splits)
        rsub = [s[p] for s in r_splits] if num_partitions > 1 else list(r_splits)
        t_ref, c_ref = _reduce_cogroup.remote(fn, len(lsub), *(lsub + rsub))
        reduced.append(t_ref)
        counts.append(c_ref)
    n_rows = ray.get(counts)
    keep = [r for r, n in zip(reduced, n_rows) if n > 0]
    if not keep:
        keep = [reduced[0]]
    return rd.from_arrow_refs(keep)


def typed_to_pandas(ds) -> pd.DataFrame:
    """Schema-preserving driver collect. ``Dataset.to_pandas()`` on a
    fully-EMPTY dataset returns a column-less frame even when every block
    is a typed 0-row table (Ray 2.49 — verified with both Arrow and pandas
    blocks), so downstream ``df[col]`` access KeyErrors on legitimately
    empty results. Concatenating the materialized block tables directly
    keeps the schema; for non-empty datasets this is equivalent to (and no
    slower than) ``to_pandas``."""
    tbls = [_ensure_table(t) for t in ray.get(_arrow_refs(ds))]
    if not tbls:
        return pd.DataFrame()
    return pa.concat_tables(tbls, promote_options="default").to_pandas()


@ray.remote
def _concat_parts(*subtables: pa.Table) -> pa.Table:
    parts = [t for t in subtables if t.num_rows > 0]
    if not parts:
        return subtables[0]
    return pa.concat_tables(parts, promote_options="default")


def exchange_partition_refs(ds, key_cols: list[str], num_partitions: int | None = None) -> list:
    """Hash-partition ``ds`` ONCE and return the P partition tables as object
    refs (index p = partition p — alignment is guaranteed, empty partitions
    included). The building block for ITERATIVE algorithms where one side
    stays stationary across rounds (connected components: edges are
    partitioned once; only labels/candidates move per round).
    ``num_partitions=None`` → ``grouping.auto_partitions(rows)`` sized by
    the actual input row count (free — block metadata)."""
    refs, n_rows = _arrow_refs_counted(ds)
    if num_partitions is None:
        from entity_resolution_engine_ray.stages.grouping import auto_partitions

        num_partitions = auto_partitions(n_rows)
    if not refs:
        raise ValueError("exchange_partition_refs: empty dataset")
    splits = [
        _split_block.options(num_returns=num_partitions).remote(
            key_cols, num_partitions, *group
        )
        for group in _coalesce_refs(refs, _default_split_tasks())
    ]
    parts = []
    for p in range(num_partitions):
        subs = [s[p] for s in splits] if num_partitions > 1 else list(splits)
        parts.append(_concat_parts.remote(*subs))
    return parts


@ray.remote
def _col_sum(tbl: pa.Table, col: str) -> int:
    import pyarrow.compute as pc

    if col not in tbl.column_names or tbl.num_rows == 0:
        return 0
    return int(pc.sum(tbl[col]).as_py() or 0)


def hash_exchange_chained(
    ds,
    keys1: list[str],
    fn1,
    p1: int,
    keys2: list[str],
    fn2,
    p2: int,
    sum_col: str | None = None,
    arrow_fns: bool = False,
):
    """Two chained hash exchanges with NO driver barrier between them.

    ``hash_exchange_map_groups`` twice would block the driver on ALL of
    stage 1's reduce tasks (``ray.get(counts)``) before scheduling stage 2's
    splits — a straggler in one partition idles the whole cluster between
    waves. Here stage 2's split task for partition p is scheduled
    immediately on stage 1's reduce ref; Ray runs it the moment that single
    partition finishes, so the two shuffles overlap and only ONE barrier
    remains (the final row counts — by then all work is done anyway).

    ``sum_col``: optionally fold a per-row int column of stage 1's output
    into a driver-side total via tiny side tasks (the column is dropped
    before ``fn2`` sees the rows). Returns (Dataset, total) — total is 0
    when ``sum_col`` is None.

    ``arrow_fns``: both fns take and return ``pa.Table`` (no pandas
    round-trip — see ``_reduce_partition_arrow``).
    """
    if p1 < 1 or p2 < 1:
        raise ValueError(
            f"hash_exchange_chained: partition counts must be >= 1 (got p1={p1}, p2={p2})"
        )
    block_refs = _arrow_refs(ds)
    if not block_refs:
        return rd.from_items([]), 0
    splits1 = [
        _split_block.options(num_returns=p1).remote(keys1, p1, *group)
        for group in _coalesce_refs(block_refs, _default_split_tasks())
    ]
    drop_refs = []
    reduce_task = _reduce_partition_arrow if arrow_fns else _reduce_partition

    if arrow_fns:

        def _fn2_wrapped(tbl):
            if sum_col is not None and sum_col in tbl.column_names:
                tbl = tbl.drop_columns([sum_col])
            return fn2(tbl)

    else:

        def _fn2_wrapped(pdf):
            if sum_col is not None and sum_col in pdf.columns:
                pdf = pdf.drop(columns=[sum_col])
            return fn2(pdf)

    # stage-1 reduce → immediately a stage-2 split on the SAME ref: no
    # driver involvement between the waves
    splits2 = []
    for p in range(p1):
        subs = [s[p] for s in splits1] if p1 > 1 else list(splits1)
        t_ref, _c_ref = reduce_task.remote(fn1, *subs)
        if sum_col is not None:
            drop_refs.append(_col_sum.remote(t_ref, sum_col))
        splits2.append(_split_block.options(num_returns=p2).remote(keys2, p2, t_ref))
    reduced, counts = [], []
    for q in range(p2):
        subs = [s[q] for s in splits2] if p2 > 1 else list(splits2)
        t_ref, c_ref = reduce_task.remote(_fn2_wrapped, *subs)
        reduced.append(t_ref)
        counts.append(c_ref)
    n_rows = ray.get(counts)
    total = sum(ray.get(drop_refs)) if drop_refs else 0
    keep = [r for r, n in zip(reduced, n_rows) if n > 0]
    if not keep:
        keep = [reduced[0]]
    return rd.from_arrow_refs(keep), total


def hash_exchange_map_groups(
    ds, key_cols: list[str], fn, num_partitions: int | None = None, arrow_fns: bool = False
):
    """Raw-task hash exchange: apply ``fn(pdf)`` once per hash partition of
    ``key_cols``. ``fn`` must group by ``key_cols`` internally (vectorized),
    handle an empty input frame, and be per-group-pure — the same contract
    as grouping.partition_map_groups. ``arrow_fns=True``: ``fn`` takes and
    returns ``pa.Table`` (no pandas round-trip). ``num_partitions=None`` →
    ``grouping.auto_partitions(rows)`` sized by the actual input row count
    (free — block metadata)."""
    block_refs, n_rows = _arrow_refs_counted(ds)
    if num_partitions is None:
        from entity_resolution_engine_ray.stages.grouping import auto_partitions

        num_partitions = auto_partitions(n_rows)
    if not block_refs:
        return rd.from_items([])
    splits = [
        _split_block.options(num_returns=num_partitions).remote(
            key_cols, num_partitions, *group
        )
        for group in _coalesce_refs(block_refs, _default_split_tasks())
    ]
    reduce_task = _reduce_partition_arrow if arrow_fns else _reduce_partition
    # splits[b][p] = sub-table of block b for partition p
    reduced, counts = [], []
    for p in range(num_partitions):
        subs = [s[p] for s in splits] if num_partitions > 1 else list(splits)
        table_ref, count_ref = reduce_task.remote(fn, *subs)
        reduced.append(table_ref)
        counts.append(count_ref)
    # drop empty partitions (Ray's hash join mishandles some empty-block
    # layouts); only the tiny row counts round-trip to the driver — result
    # tables stay in the object store. Keep one empty block if ALL are
    # empty so the schema survives.
    n_rows = ray.get(counts)
    keep = [r for r, n in zip(reduced, n_rows) if n > 0]
    if not keep:
        keep = [reduced[0]]
    return rd.from_arrow_refs(keep)
