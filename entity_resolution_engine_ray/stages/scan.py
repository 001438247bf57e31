"""Distributed grouped prefix-sum (scan).

``SUM(v) OVER (PARTITION BY k ORDER BY o ROWS UNBOUNDED PRECEDING)`` needs a
global per-key running total — something no per-block or per-partition
transform can produce alone, and an operator Ray Data has no primitive for.
This is the classic two-phase scan:

  phase 0   ``Dataset.sort(key + order)`` — ONE range shuffle; afterwards
            blocks hold disjoint sorted ranges.
  phase 1   one tiny task per block emits boundary metadata only: the
            block's first/last key and the value sums of those two keys
            (≤ 2 key rows per block, never the block's full key set).
  driver    a single O(n_blocks) carry walk: because the data is sorted,
            a key's rows are contiguous, so the ONLY key in block *i* that
            can have mass in earlier blocks is its first key. The walk
            keeps one (key, running-sum) carry — constant driver memory,
            safe when keys number in the billions, and correct for a hot
            key spanning many whole blocks (the carry accumulates through
            single-key blocks).
  phase 2   one task per block: vectorized per-key cumsum inside the block
            plus the scalar carry added to the first key's rows.

Integer inputs stay integers end-to-end, so results hash-match a SQL
window-SUM oracle exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _key_tuple(tbl: pa.Table, key_cols: list[str], row: int) -> tuple:
    return tuple(tbl[c][row].as_py() for c in key_cols)


def _as_table(block) -> pa.Table:
    # blocks are Arrow throughout this engine, but from_pandas sources
    # (tests, ad-hoc callers) produce pandas blocks
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block, preserve_index=False)


@ray.remote
def _scan_block_meta(key_cols: list[str], order_cols: list[str], value_col: str, tbl: pa.Table):
    """(sort_position, first_key, first_key_sum, last_key, last_key_sum, n_rows)."""
    tbl = _as_table(tbl)
    n = tbl.num_rows
    if n == 0:
        return None
    first_key = _key_tuple(tbl, key_cols, 0)
    last_key = _key_tuple(tbl, key_cols, n - 1)
    pos = first_key + tuple(tbl[c][0].as_py() for c in order_cols)
    pdf = pd.DataFrame({c: tbl[c].to_numpy(zero_copy_only=False) for c in key_cols})
    vals = tbl[value_col].to_numpy(zero_copy_only=False)
    mask_first = np.ones(n, dtype=bool)
    for c, kv in zip(key_cols, first_key):
        mask_first &= pdf[c].to_numpy() == kv
    mask_last = np.ones(n, dtype=bool)
    for c, kv in zip(key_cols, last_key):
        mask_last &= pdf[c].to_numpy() == kv
    return (pos, first_key, vals[mask_first].sum(), last_key, vals[mask_last].sum(), n)


def _prefix_offsets(metas: list) -> list:
    """Driver carry walk over block metas IN SORTED ORDER: returns the
    scalar to add to each block's FIRST key's running sums. Pure function —
    unit-tested directly in tests/test_scan.py."""
    offsets = []
    carry_key, carry_sum = None, 0
    for (_, first_key, first_sum, last_key, last_sum, _) in metas:
        off = carry_sum if first_key == carry_key else 0
        offsets.append(off)
        if last_key == first_key:
            # single boundary key (possibly the whole block): extend the carry
            carry_key, carry_sum = last_key, off + last_sum
        else:
            carry_key, carry_sum = last_key, last_sum
    return offsets


@ray.remote
def _scan_block_apply(
    key_cols: list[str],
    value_col: str,
    out_col: str,
    first_key: tuple,
    offset,
    tbl: pa.Table,
) -> pa.Table:
    pdf = _as_table(tbl).to_pandas()
    cum = pdf.groupby(key_cols, sort=False)[value_col].cumsum()
    if offset:
        mask = np.ones(len(pdf), dtype=bool)
        for c, kv in zip(key_cols, first_key):
            mask &= pdf[c].to_numpy() == kv
        cum = cum + np.where(mask, offset, 0)
    pdf[out_col] = cum
    return pa.Table.from_pandas(pdf, preserve_index=False).replace_schema_metadata(None)


def grouped_prefix_sum(
    ds, key_cols: list[str], order_cols: list[str], value_col: str, out_col: str
):
    """All input columns + ``out_col`` = running per-key sum of ``value_col``
    in ``order_cols`` order (inclusive of the current row). ``order_cols``
    must be unique within a key for a deterministic result (window-SUM
    ROWS-frame semantics)."""
    from entity_resolution_engine_ray.stages.exchange import _arrow_refs

    sorted_ds = ds.sort(key_cols + order_cols).materialize()
    refs = _arrow_refs(sorted_ds)
    metas = ray.get(
        [_scan_block_meta.remote(key_cols, order_cols, value_col, r) for r in refs]
    )
    live = sorted([(m, r) for m, r in zip(metas, refs) if m is not None],
                  key=lambda x: x[0][0])
    if not live:
        # empty input: the sort emits a zero-COLUMN block, so recover the
        # schema from the pre-sort dataset instead
        bs = ds.schema().base_schema
        if isinstance(bs, pa.Schema):
            sch = bs
        else:  # PandasBlockSchema (from_pandas sources)
            def _pa_type(t):
                try:
                    return pa.from_numpy_dtype(t)
                except (pa.ArrowNotImplementedError, TypeError):
                    return pa.string()

            sch = pa.schema(
                [pa.field(n, _pa_type(t)) for n, t in zip(bs.names, bs.types)]
            )
        cols = {f.name: pa.array([], type=f.type) for f in sch}
        cols[out_col] = pa.array([], type=sch.field(value_col).type)
        return rd.from_arrow(pa.table(cols))
    offsets = _prefix_offsets([m for m, _ in live])
    out_refs = [
        _scan_block_apply.remote(key_cols, value_col, out_col, m[1], off, r)
        for (m, r), off in zip(live, offsets)
    ]
    return rd.from_arrow_refs(out_refs)
