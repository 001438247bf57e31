"""Mergeable sketches: HyperLogLog count-distinct, histogram quantiles,
self-certifying heavy hitters. Each trades bounded error for O(sketch)
instead of O(rows) shuffle traffic.

The exact grouped distinct (pipelines/queries.q_doc_distinct_by_lang) ships
one 8-byte content hash per ROW through the exchange — correct, but at
100 TB the shuffle is O(rows). The HLL sketch bounds per-(batch, key)
traffic at 2^p register rows and per-key state at 2^p bytes, for a relative
standard error of ~1.04/sqrt(2^p) (~0.8% at p=14): the classic
accuracy-for-traffic trade when distinct counts feed monitoring or quality
gates rather than billing.

Shape: per-batch vectorized register build (hash → top-p-bit register
index, rho = leading-zero rank of the rest) compressed to per-(key,
register) maxima; ONE hash exchange on the group key; a per-partition fold
maxes registers and applies the standard estimator (bias-corrected raw +
linear counting in the small range). Flajolet et al.'s published HLL — no
proprietary anything.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _registers(values: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes → (register index, rho). rho = 1 + count of leading
    zeros in the low (64-p) bits, capped at 64-p+1 when those bits are 0."""
    h = values.astype(np.uint64)
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # low bits moved to the top for a clz scan
    rho = np.full(len(h), 64 - p + 1, dtype=np.int64)
    found = np.zeros(len(h), dtype=bool)
    probe = rest
    for i in range(64 - p):
        hit = ~found & (probe >> np.uint64(63) == 1)
        rho[hit] = i + 1
        found |= hit
        if found.all():
            break
        probe = probe << np.uint64(1)
    return reg, rho


def _estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** (-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = float(np.count_nonzero(regs == 0))
        if zeros > 0:
            est = m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def hll_count_distinct(
    ds, key_cols: list[str], value_col: str, p: int = 14, num_partitions: int | None = None
):
    """→ one row per key: ``approx_distinct`` (int64 rounded estimate).
    ``value_col`` must already be a 64-bit hash column (pair with
    functions.similarity.stable_hash64 or pd.util.hash_array upstream so
    the hash choice is the caller's contract)."""
    from entity_resolution_engine_ray.stages.grouping import partition_map_groups

    def partial(pdf: pd.DataFrame) -> pa.Table:
        # emits an ARROW block: the downstream hash exchange splits Arrow
        if pdf.empty:
            out = {c: pdf[c] for c in key_cols}
            out["reg"] = pd.Series([], dtype=np.int64)
            out["rho"] = pd.Series([], dtype=np.int64)
            return pa.Table.from_pandas(pd.DataFrame(out), preserve_index=False)
        reg, rho = _registers(pdf[value_col].to_numpy(np.uint64), p)
        t = pdf[key_cols].copy()
        t["reg"] = reg
        t["rho"] = rho
        g = t.groupby(key_cols + ["reg"], as_index=False)["rho"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            # an all-empty input may arrive as a zero-column frame
            out = {
                c: (pdf[c] if c in pdf.columns else pd.Series([], dtype=object))
                for c in key_cols
            }
            out["approx_distinct"] = pd.Series([], dtype=np.int64)
            return pd.DataFrame(out)
        folded = pdf.groupby(key_cols + ["reg"], as_index=False)["rho"].max()
        rows = []
        for key, grp in folded.groupby(key_cols):
            regs = np.zeros(1 << p, dtype=np.int64)
            regs[grp["reg"].to_numpy()] = grp["rho"].to_numpy()
            key = key if isinstance(key, tuple) else (key,)
            rows.append(dict(zip(key_cols, key), approx_distinct=round(_estimate(regs))))
        out = pd.DataFrame(rows)
        out["approx_distinct"] = out["approx_distinct"].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    return partition_map_groups(partials, key_cols, finish, num_partitions)


def histogram_quantiles(
    ds, value_col: str, qs: list[float], bins: int = 4096
) -> pd.DataFrame:
    """Approximate quantiles via a fixed-width histogram sketch — the
    mergeable alternative to the exact sort-based ``stages/quantiles`` when
    the column is numeric and a bounded absolute error is acceptable.

    Two streaming passes, no sort, no row shuffle:
    1. global min/max (tiny aggregate);
    2. per-batch histogram partials (``np.histogram`` against the shared
       edges) — merge is a vector ADD, so any partitioning gives the same
       sketch — then a driver-side cumsum + linear interpolation.

    Error bound: within-bin interpolation cannot miss the true quantile by
    more than one bin width, ``(max - min) / bins`` — the guarantee the
    test pins. Returns a DataFrame (q, value)."""
    from ray.data.aggregate import Count, Max, Min

    stats = ds.aggregate(
        Min(value_col, alias_name="lo"), Max(value_col, alias_name="hi"),
        Count(value_col, alias_name="n"),
    )
    lo, hi, n_rows = float(stats["lo"]), float(stats["hi"]), int(stats["n"])
    if n_rows == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64), "value": np.nan})
    if hi == lo:
        return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64), "value": lo})
    edges = np.linspace(lo, hi, bins + 1)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bin": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())}
            )
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        counts, _ = np.histogram(v, bins=edges)
        nz = np.nonzero(counts)[0]
        return pa.table({"bin": pa.array(nz), "n": pa.array(counts[nz].astype(np.int64))})

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    hist = np.zeros(bins, dtype=np.int64)
    hist[agg["bin"].to_numpy(np.int64)] = agg["n"].to_numpy(np.int64)
    cum = np.cumsum(hist)
    total = cum[-1]
    out = []
    for q in qs:
        target = q * (total - 1) + 1  # rank in [1, total], linear-ish
        b = int(np.searchsorted(cum, target))
        b = min(b, bins - 1)
        prev = cum[b - 1] if b > 0 else 0
        inbin = hist[b]
        frac = (target - prev) / inbin if inbin > 0 else 0.0
        out.append(edges[b] + frac * (edges[b + 1] - edges[b]))
    return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64), "value": np.array(out)})


def heavy_hitters(
    ds, col: str, k: int, candidates_per_batch: int | None = None
) -> pd.DataFrame:
    """Approximate top-k frequent values with SELF-CERTIFYING bounds —
    the scale answer to ``doc_top_tokens``-style exact counting when the
    key universe (vocab, n-grams, urls) is too large to shuffle whole.

    Per batch: an exact local ``value_counts`` truncated to the top
    ``candidates_per_batch`` (default ``8k``) candidates; the count of the
    first DROPPED value is the batch's error bound ε_b (no surviving key
    can be undercounted by more, and no dropped key can exceed it).
    Partials merge by sum; a key absent from a batch may have had up to
    that batch's ε_b occurrences there, giving per-key lower/upper count
    bounds. The result is ordered by lower bound and carries ``exact``:
    True iff the k-th lower bound beats every excluded key's upper bound —
    i.e. the sketch PROVES its own top-k is the true top-k (typical for
    zipf-shaped data; flips False instead of lying on flat data)."""
    m = candidates_per_batch or 8 * k

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    col: pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "eps": pa.array([], type=pa.int64()),
                }
            )
        vc = (
            pd.Series(t[col].to_numpy(zero_copy_only=False))
            .dropna()  # null keys carry the per-batch ε marker (below)
            .value_counts()
        )
        eps = int(vc.iloc[m]) if len(vc) > m else 0
        top = vc.iloc[:m]
        # one null-key marker row per batch holds that batch's ε exactly
        # once — deterministic, no batch-id bookkeeping
        keys = np.concatenate([top.index.to_numpy(), [None]])
        return pa.table(
            {
                col: pa.array(keys, type=pa.string()),
                "n": pa.array(np.concatenate([top.to_numpy(np.int64), [0]])),
                "eps": pa.array(np.full(len(top) + 1, eps, dtype=np.int64)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty or col not in parts.columns:
        return pd.DataFrame(
            {col: [], "count_lo": [], "count_hi": [], "exact": pd.Series([], dtype=bool)}
        )
    total_eps = int(parts.loc[parts[col].isna(), "eps"].sum())
    g = parts.dropna(subset=[col]).groupby(col).agg(
        count_lo=("n", "sum"), present_eps=("eps", "sum")
    )
    # a key missing from a batch may have occurred up to that batch's eps
    g["count_hi"] = g["count_lo"] + (total_eps - g["present_eps"])
    g = g.reset_index().sort_values(
        ["count_lo", "count_hi", col], ascending=[False, False, True], kind="mergesort"
    ).set_index(col)
    top = g.iloc[:k]
    excluded_hi = int(g["count_hi"].iloc[k:].max()) if len(g) > k else 0
    exact = bool(len(top) and int(top["count_lo"].iloc[-1]) > excluded_hi)
    out = top.reset_index()[[col, "count_lo", "count_hi"]]
    out["exact"] = exact
    return out
