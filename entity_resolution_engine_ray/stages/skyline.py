"""Two-phase distributed skyline (Pareto-dominance filter, minimize both
dimensions).

A row is on the skyline iff no other row is <= on BOTH dimensions and < on
at least one. Dominance is transitive, so the classic two-phase plan is
exact: a per-block local skyline (map_batches, embarrassingly parallel)
discards everything dominated within its block — any GLOBAL skyline point
survives every local pass — then one final pass over the union of local
survivors removes cross-block dominance.

Scale notes: phase 1 streams; only local survivors are exchanged. The
survivor set is small whenever the two dimensions are positively or weakly
correlated (real price/size-like data); the adversarial worst case — a
perfectly anti-correlated staircase, where the skyline IS the dataset — is
inherent to the operator, not the plan (no algorithm can emit fewer rows
than the answer). The final pass runs in ONE task via repartition(1);
callers with an anti-correlated workload should tree-reduce instead
(repartition(k) -> local -> repartition(1) -> local), which this module
supports by simply composing skyline_stage twice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the non-dominated points (minimize x and y).

    Vectorized: sort by (x, y); within an equal-x group only the y-minima
    survive (ties on BOTH dims all survive — neither dominates the other),
    and a group's y-minimum survives iff it is strictly below the running
    y-minimum of every strictly-smaller-x group.
    """
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    grp_start = np.ones(n, dtype=bool)
    grp_start[1:] = xs[1:] != xs[:-1]
    grp_id = np.cumsum(grp_start) - 1
    # sorted by y within group -> group min is the value at the group start
    grp_min = ys[grp_start]
    # running min of group minima over all STRICTLY smaller x (exclusive)
    prev_best = np.empty(len(grp_min))
    prev_best[0] = np.inf
    if len(grp_min) > 1:
        np.minimum.accumulate(grp_min[:-1], out=prev_best[1:])
    keep_sorted = (ys == grp_min[grp_id]) & (ys < prev_best[grp_id])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def _local_skyline(x_col: str, y_col: str):
    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        mask = _skyline_mask(
            t[x_col].to_numpy(zero_copy_only=False).astype(np.float64),
            t[y_col].to_numpy(zero_copy_only=False).astype(np.float64),
        )
        return t.filter(pa.array(mask))

    return fn


def skyline_stage(ds, x_col: str, y_col: str):
    """Exact two-phase skyline over a Dataset; both dimensions minimized."""
    local = ds.map_batches(_local_skyline(x_col, y_col), batch_format="pyarrow")
    return local.repartition(1).map_batches(
        _local_skyline(x_col, y_col), batch_format="pyarrow", batch_size=None
    )
