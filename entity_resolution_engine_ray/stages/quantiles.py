"""Distributed exact grouped quantiles.

Ray Data has no quantile aggregate; the naive route (sort the whole column,
index into it) is a full global sort per group. This operator computes EXACT
discrete quantiles (DuckDB ``quantile_disc`` semantics: the value at 0-based
index ``ceil(q·n) − 1`` of the sorted group) in two passes with no sort
shuffle:

1. **Partial compression** (``map_batches``): each batch collapses to
   ``(keys…, value, cnt)`` rows — duplicate values within a batch compress
   to a count, so the shuffle moves at most one row per distinct
   ``(key, value)`` pair per batch, not one per input row.
2. **One hash exchange** on the group keys
   (``grouping.partition_map_groups``): each partition merges its compressed
   runs, sorts *within each group it owns* (bounded slice, numpy sort), and
   selects every requested quantile from the count-weighted cumulative sum.

Scale assumption (documented per the operator contract): the distinct
values of ONE group fit in one partition — the same co-location assumption
every exact-quantile implementation needs. For heavy-tailed value domains
where that breaks, compress further by pre-rounding values (exactness then
holds at the rounded resolution) or switch to a sketch; this module keeps
the exact path because quantile thresholds feeding dedup/quality gates
(e.g. "drop docs below the p10 quality score") need reproducible cutoffs.
"""

from __future__ import annotations


import numpy as np
import pandas as pd

from entity_resolution_engine_ray.stages.grouping import partition_map_groups


def _compress_batch(key_cols: list[str], value_col: str):
    """Per-batch partial: collapse to (keys…, value, cnt). Emits Arrow —
    the downstream hash exchange splits Arrow blocks zero-copy."""
    import pyarrow as pa

    def fn(pdf: pd.DataFrame) -> pa.Table:
        g = (
            pdf.groupby(key_cols + [value_col], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return fn


def _select_quantiles(
    key_cols: list[str], value_col: str, quantiles: dict[str, float]
):
    """Per-partition reduce: merge compressed runs, then pick each quantile
    from the count-weighted cumsum — vectorized across ALL groups in the
    partition (one sort + one crossing-mask per quantile, no per-group
    Python loop)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out_cols = key_cols + ["n_rows"] + list(quantiles)
        if pdf.empty:
            empty: dict = {c: pd.Series([], dtype=object) for c in key_cols}
            empty["n_rows"] = pd.Series([], dtype=np.int64)
            for name in quantiles:
                empty[name] = pd.Series([], dtype=np.float64)
            return pd.DataFrame(empty)[out_cols]
        # merge duplicate (key, value) runs arriving from different batches
        merged = pdf.groupby(key_cols + [value_col], as_index=False, sort=False)[
            "cnt"
        ].sum()
        merged = merged.sort_values(key_cols + [value_col], kind="mergesort").reset_index(
            drop=True
        )
        grp = merged.groupby(key_cols, sort=False)
        cum = grp["cnt"].cumsum().to_numpy()
        n = grp["cnt"].transform("sum").to_numpy()
        cnt = merged["cnt"].to_numpy()
        heads = grp.head(1).index  # first sorted row of each group
        result = merged.loc[heads, key_cols].reset_index(drop=True)
        result["n_rows"] = n[heads].astype(np.int64)
        values = merged[value_col].to_numpy()
        for name, q in quantiles.items():
            # quantile_disc: 0-based index ceil(q·n)−1 ⇒ the first sorted
            # row whose cumulative count reaches target = max(1, ceil(q·n)).
            target = np.maximum(np.ceil(q * n), 1.0)
            crossing = (cum >= target) & (cum - cnt < target)
            result[name] = values[crossing]
        return result

    return fn


def grouped_quantiles(
    ds,
    key_cols: list[str],
    value_col: str,
    quantiles: dict[str, float],
    num_partitions: int | None = None,
):
    """Exact discrete quantiles of ``value_col`` per ``key_cols`` group.

    ``quantiles`` maps output column name → q in (0, 1]. Returns a Dataset
    with ``key_cols + ["n_rows"] + list(quantiles)`` columns; quantile
    values are actual data values (never interpolated), so results
    hash-match a DuckDB ``quantile_disc`` oracle exactly.
    """
    compressed = ds.map_batches(
        _compress_batch(key_cols, value_col), batch_format="pandas"
    )
    return partition_map_groups(
        compressed,
        key_cols,
        _select_quantiles(key_cols, value_col, quantiles),
        num_partitions,
    )
