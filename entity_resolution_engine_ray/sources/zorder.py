"""Z-order (Morton-interleaved) multi-column layout over the sharded sink —
the Delta/Iceberg ``OPTIMIZE ZORDER BY`` idea: co-locate rows that are close
in SEVERAL columns at once so the per-shard zone maps
(``sources/sink.write_sharded_parquet(zone_cols=...)``) stay tight on EVERY
z-ordered column and a range predicate on ANY of them skips most shards
without opening a data file. A single-column sort gives file-skipping on one
column only; interleaving the bucket bits gives it on all of them, at the
cost of each zone being ~2^(bits·(k-1)) wider than a dedicated sort's.

Scale shape: one histogram-sketch pass per column for equi-depth cut points
(``stages/sketch.histogram_quantiles`` machinery — mergeable partials, no
sort), one broadcast of the tiny cut arrays, one vectorized ``map_batches``
to stamp the shard id, then the sealed resumable sharded sink. Equi-depth
(not min/max linear) bucketing is deliberate: a skewed column would
otherwise pile most rows into a few hot shards and the layout would neither
balance nor prune. Cut points are a LAYOUT choice, so the sketch's bounded
error never affects correctness — exactness comes from the zone maps (exact
per-shard min/max) plus the exact row filter composed on read.

Columns must be numeric and non-null (layout keys, like sort keys).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from entity_resolution_engine_ray.sources.sink import write_sharded_parquet

_SHARD_COL = "zshard"


def zorder_cutpoints(ds, cols: list[str], bits: int = 3, bins: int = 4096) -> dict:
    """Per-column equi-depth cut points (2^bits - 1 interior quantiles) from
    the mergeable histogram sketch — one streaming pass per column, no sort."""
    from entity_resolution_engine_ray.stages.sketch import histogram_quantiles

    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = {}
    for c in cols:
        qdf = histogram_quantiles(ds, c, qs, bins=bins)
        cuts[c] = np.asarray(qdf["value"].to_numpy(np.float64))
    return cuts


def _morton_codes(buckets: list[np.ndarray], bits: int) -> np.ndarray:
    code = np.zeros(len(buckets[0]), dtype=np.int64)
    k = len(buckets)
    for b in range(bits):
        for j, col_bucket in enumerate(buckets):
            code |= ((col_bucket >> b) & 1) << (b * k + j)
    return code


def add_zorder_shard(ds, cols: list[str], cuts: dict, bits: int = 3):
    """Stamp ``zshard`` = Morton interleave of each row's per-column
    equi-depth bucket. Cut arrays are tiny (2^bits - 1 floats per column),
    broadcast once via ``ray.put``; the stamp itself is one vectorized pass."""
    import ray

    cuts_ref = ray.put({c: np.asarray(v, dtype=np.float64) for c, v in cuts.items()})
    width = len(str((1 << (bits * len(cols))) - 1))

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(_SHARD_COL, pa.array([], type=pa.string()))
        cc = ray.get(cuts_ref)
        buckets = [
            np.searchsorted(cc[c], t[c].to_numpy(zero_copy_only=False).astype(np.float64),
                            side="right").astype(np.int64)
            for c in cols
        ]
        code = _morton_codes(buckets, bits)
        vals = np.char.add("z", np.char.zfill(code.astype(str), width))
        return t.append_column(_SHARD_COL, pa.array(vals, type=pa.string()))

    return ds.map_batches(stamp, batch_format="pyarrow")


def write_zordered_parquet(
    ds,
    out_dir: str,
    cols: list[str],
    bits: int = 3,
    params_hash: str = "",
    num_partitions: int | None = None,
    extra_zone_cols: list[str] | None = None,
) -> dict:
    """Z-order ``ds`` by ``cols`` into the sealed resumable sharded sink with
    zone maps on every z-ordered column (plus ``extra_zone_cols``). Read back
    with ``sources.sink.read_sharded_parquet(zone_filter=...)`` — a range on
    ANY z-ordered column prunes shards. Returns the sink's written/skipped
    report plus the cut points used (layout lineage)."""
    cuts = zorder_cutpoints(ds, cols, bits=bits)
    stamped = add_zorder_shard(ds, cols, cuts, bits=bits)
    report = write_sharded_parquet(
        stamped,
        out_dir,
        shard_col=_SHARD_COL,
        params_hash=params_hash,
        num_partitions=num_partitions,
        zone_cols=list(cols) + list(extra_zone_cols or []),
    )
    report["cutpoints"] = {c: v.tolist() for c, v in cuts.items()}
    return report
