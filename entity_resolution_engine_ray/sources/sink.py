"""Resumable partitioned Parquet export — the sink contract for 100 TB
runs: one DIRECTORY per shard, each sealed by a manifest, so a failed or
killed export re-run skips every finished shard instead of rewriting the
corpus (reference parity: the UES writers land whole tables; at web scale
the unit of atomicity must be the shard).

Layout:

    out_dir/
      shard=<value>/part-*.parquet
      shard=<value>/_MANIFEST.json   {"rows": n, "params_hash": h}

A shard is DONE iff its manifest exists and carries the caller's
``params_hash`` — changing pipeline params invalidates every shard without
touching the data files. Writes are atomic per shard (tmp dir + rename),
so a kill mid-shard leaves no manifest and the shard re-runs cleanly.

Atomicity contract: the tmp-dir + ``os.rename`` seal is atomic on a local
POSIX filesystem (the sandbox and any node-local staging disk). An
object-store backend (s3://...) has no atomic rename — there the manifest
write itself is the commit point, so route paths through ``pyarrow.fs``
and write the manifest LAST; the skip logic (manifest-or-nothing) already
assumes exactly that ordering.

Shard values become directory names, so they are validated: empty strings,
path separators, backslashes, NUL and ``..`` are rejected (a crafted value
must not corrupt the layout or escape ``out_dir``).
"""

from __future__ import annotations

import base64
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_MANIFEST = "_MANIFEST.json"
_BLOOM_FPP = 0.01


def _validate_shard_value(value: str) -> str:
    """Reject shard values that would corrupt the directory layout or
    escape ``out_dir`` (see module docstring)."""
    if value == "" or value == "." or value == "..":
        raise ValueError(f"invalid shard value {value!r}: empty or dot path")
    if "/" in value or "\\" in value or "\x00" in value:
        raise ValueError(f"invalid shard value {value!r}: contains a path separator or NUL")
    return value


def _shard_dir(out_dir: str, value) -> str:
    return os.path.join(out_dir, f"shard={_validate_shard_value(str(value))}")


def finished_shards(out_dir: str, params_hash: str = "") -> set:
    """Shard values whose manifest exists with a matching params_hash."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.startswith("shard="):
            continue
        mpath = os.path.join(out_dir, name, _MANIFEST)
        if os.path.isfile(mpath):
            with open(mpath) as f:
                m = json.load(f)
            if m.get("params_hash", "") == params_hash:
                done.add(name[len("shard="):])
    return done


def _zone_entry(col: pa.ChunkedArray | pa.Array):
    """JSON-serializable [min, max] of a shard column (ints/floats/strings;
    timestamps are stored as ISO strings so the manifest stays plain JSON)."""
    import pyarrow.compute as pc

    mm = pc.min_max(col)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()

    def enc(v):
        return v.isoformat() if hasattr(v, "isoformat") else v

    return [enc(lo), enc(hi)]


def _bloom_entry(col: pa.ChunkedArray | pa.Array) -> dict:
    """JSON-serializable per-shard Bloom filter over an int64 column
    (stages/bloom.BloomFilter geometry, bits base64-encoded). ~1.2 KB per
    1,000 distinct keys at 1% fpp — manifest-sized, never data-sized."""
    from entity_resolution_engine_ray.stages.bloom import BloomFilter

    vals = col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    bf = BloomFilter(max(1, len(vals)), _BLOOM_FPP)
    if len(vals):
        bf.add(vals)
    return {
        "m": bf.m,
        "k": bf.k,
        "bits": base64.b64encode(bf.bits.tobytes()).decode("ascii"),
    }


def _bloom_may_contain(entry: dict, values: list) -> bool:
    """True iff ANY of ``values`` may be present (no false negatives)."""
    from entity_resolution_engine_ray.stages.bloom import BloomFilter

    bf = BloomFilter.__new__(BloomFilter)
    bf.m, bf.k = int(entry["m"]), int(entry["k"])
    bf.bits = np.frombuffer(base64.b64decode(entry["bits"]), dtype=np.uint64).copy()
    return bool(bf.contains(np.asarray(values, dtype=np.int64)).any())


def write_sharded_parquet(
    ds,
    out_dir: str,
    shard_col: str,
    params_hash: str = "",
    num_partitions: int | None = None,
    zone_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> dict:
    """Write ``ds`` as one directory per distinct ``shard_col`` value,
    skipping shards already sealed by a matching manifest.

    Two passes, both streaming: (1) a map-side prune drops every row whose
    shard is already done — finished shards cost ZERO shuffle bytes on a
    resume; (2) a shard-keyed hash partition writes each shard's rows from
    exactly one task (same-shard rows always co-locate), tmp-dir + rename
    for atomicity. Returns {"written": [...], "skipped": [...]}.

    ``zone_cols``: record per-shard [min, max] ZONE MAPS for these columns
    in the manifest. A later ``read_sharded_parquet(zone_filter=...)``
    skips every shard whose range cannot intersect the predicate WITHOUT
    opening a single data file — the Iceberg/Delta file-skipping idea at
    shard granularity, and the difference between "scan 100 TB to answer a
    one-week query" and "open last week's shards".

    ``bloom_cols``: record a per-shard BLOOM FILTER for these int64 columns
    in the manifest — the skipping complement for EQUALITY lookups on
    high-cardinality columns where [min, max] zones never prune (ids hash-
    scattered across shards span the whole domain in every shard). A later
    ``read_sharded_parquet(point_filter={col: [v, ...]})`` opens only the
    shards whose filter may contain some looked-up value; false positives
    cost one extra shard read, false negatives cannot occur.
    """
    import ray

    from entity_resolution_engine_ray.stages.exchange import exchange_partition_refs

    os.makedirs(out_dir, exist_ok=True)
    done = finished_shards(out_dir, params_hash)
    skipped = sorted(done)
    done_ref = ray.put(done)
    zcols = list(zone_cols or [])
    bcols = list(bloom_cols or [])

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        d = ray.get(done_ref)
        if not d:
            return t
        vals = pd.Series(t[shard_col].to_pylist()).astype(str)
        return t.filter(pa.array((~vals.isin(d)).to_numpy()))

    pruned = ds.map_batches(prune, batch_format="pyarrow")

    @ray.remote
    def write_partition(tbl) -> list:
        tbl = tbl if isinstance(tbl, pa.Table) else pa.Table.from_pandas(tbl)
        if tbl.num_rows == 0:
            return []
        out = []
        vals = pd.Series(tbl[shard_col].to_pylist()).astype(str)
        for value in sorted(vals.unique()):
            sub = tbl.filter(pa.array((vals == value).to_numpy()))
            sdir = _shard_dir(out_dir, value)
            tmp = sdir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(sdir, ignore_errors=True)
            os.makedirs(tmp)
            pq.write_table(sub, os.path.join(tmp, "part-0.parquet"))
            manifest = {"rows": sub.num_rows, "params_hash": params_hash}
            if zcols:
                manifest["zones"] = {c: _zone_entry(sub[c]) for c in zcols}
            if bcols:
                manifest["blooms"] = {c: _bloom_entry(sub[c]) for c in bcols}
            with open(os.path.join(tmp, _MANIFEST), "w") as f:
                json.dump(manifest, f)
            os.rename(tmp, sdir)
            out.append(value)
        return out

    refs = exchange_partition_refs(pruned, [shard_col], num_partitions)
    written = sorted({v for part in ray.get([write_partition.remote(r) for r in refs]) for v in part})
    return {"written": written, "skipped": skipped}


def _zone_intersects(zones: dict, zone_filter: dict) -> bool:
    """True iff the shard's [min, max] ranges can intersect every predicate
    interval. A column missing from the manifest NEVER prunes (safe: zone
    maps are an optimization, absence must not drop data)."""
    for col, (lo, hi) in zone_filter.items():
        z = zones.get(col)
        if z is None:
            continue
        zmin, zmax = z
        if lo is not None and zmax is not None and zmax < lo:
            return False
        if hi is not None and zmin is not None and zmin > hi:
            return False
    return True


def pruned_shard_paths(
    out_dir: str, zone_filter: dict | None = None, point_filter: dict | None = None
) -> tuple:
    """(paths_to_read, shards_skipped). Only manifests are opened — pruning
    a shard never touches its data files. ``point_filter``: {col: [values]}
    equality lookups checked against the per-shard Bloom filters; a column
    with no recorded bloom NEVER prunes (same safety rule as zones)."""
    paths: list = []
    skipped: list = []
    for name in sorted(os.listdir(out_dir)):
        sdir = os.path.join(out_dir, name)
        mpath = os.path.join(sdir, _MANIFEST)
        if not (name.startswith("shard=") and os.path.isfile(mpath)):
            continue
        if zone_filter or point_filter:
            with open(mpath) as f:
                manifest = json.load(f)
            if zone_filter and not _zone_intersects(manifest.get("zones", {}), zone_filter):
                skipped.append(name)
                continue
            if point_filter:
                blooms = manifest.get("blooms", {})
                miss = any(
                    col in blooms and not _bloom_may_contain(blooms[col], vals)
                    for col, vals in point_filter.items()
                )
                if miss:
                    skipped.append(name)
                    continue
        paths.extend(
            os.path.join(sdir, f) for f in sorted(os.listdir(sdir)) if f.endswith(".parquet")
        )
    return paths, skipped


def read_sharded_parquet(
    out_dir: str, zone_filter: dict | None = None, point_filter: dict | None = None
):
    """Read sealed shards back as one Dataset (unsealed tmp dirs and
    manifest-less shards are ignored — they belong to an interrupted run).

    ``zone_filter``: {col: (lo, hi)} inclusive intervals (None = unbounded
    side). ``point_filter``: {col: [values]} equality lookups against the
    per-shard Bloom filters. Shards that cannot match are skipped WITHOUT
    opening any data file; rows inside surviving shards are NOT filtered
    here — compose with a normal ``map_batches``/``filter`` for exact
    semantics (both prune only, like Parquet row-group stats one level
    up; bloom survivors include ~fpp false-positive shards)."""
    import ray.data as rd

    paths, _ = pruned_shard_paths(out_dir, zone_filter, point_filter)
    if not paths:
        # everything pruned: keep the schema (from any sealed shard), 0 rows
        all_paths, _ = pruned_shard_paths(out_dir, None)
        if not all_paths:
            raise FileNotFoundError(f"no sealed shards under {out_dir}")
        return rd.read_parquet(all_paths).limit(0)
    return rd.read_parquet(paths)


def shard_manifests(out_dir: str) -> dict:
    """{shard_value: manifest dict} for every sealed shard — the metadata
    surface for manifest-only answers (row counts, zone ranges) that never
    open a data file."""
    out: dict = {}
    if not os.path.isdir(out_dir):
        return out
    for name in sorted(os.listdir(out_dir)):
        mpath = os.path.join(out_dir, name, _MANIFEST)
        if name.startswith("shard=") and os.path.isfile(mpath):
            with open(mpath) as f:
                out[name[len("shard="):]] = json.load(f)
    return out


def compact_shards(
    out_dir: str,
    target_rows: int,
    params_hash: str = "",
    zone_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction (the OPTIMIZE / bin-packing maintenance pass
    every long-lived table needs): greedily bin-packs ADJACENT sealed
    shards (sorted by shard value, preserving any z-order/sort locality)
    into new sealed shards of >= ``target_rows`` each, so a table that
    accumulated thousands of tiny incremental shards reads back with file
    counts proportional to data size, not to ingest history.

    Planning is manifest-only (row counts come from the manifests — no data
    file opens); each output bin is rewritten by ONE Ray task reading only
    its own input shards, so the pass is O(data) with no shuffle. Zone maps
    are recomputed per output shard (the union range stays exactly as tight
    as the inputs allow). Writes are atomic (tmp dir + rename) and land
    FIRST; the consumed input shards are removed only after every bin
    sealed — a kill mid-compaction leaves either the old shards or both
    (both readable copies are never half-deleted; re-running converges).
    Shards already >= target_rows pass through untouched. Returns
    {"written": [...], "removed": [...], "kept": [...]}.
    """
    import ray

    bins: list[list[tuple[str, int]]] = []
    cur: list[tuple[str, int]] = []
    cur_rows = 0
    kept = []
    for name in sorted(os.listdir(out_dir)):
        sdir = os.path.join(out_dir, name)
        mpath = os.path.join(sdir, _MANIFEST)
        if not (name.startswith("shard=") and os.path.isfile(mpath)):
            continue
        with open(mpath) as f:
            rows = int(json.load(f).get("rows", 0))
        value = name[len("shard="):]
        if rows >= target_rows:
            kept.append(value)
            continue
        cur.append((value, rows))
        cur_rows += rows
        if cur_rows >= target_rows:
            bins.append(cur)
            cur, cur_rows = [], 0
    if cur:
        bins.append(cur)
    # a 1-input bin is a rename-shaped no-op: rewriting it buys nothing
    solo = [b for b in bins if len(b) < 2]
    kept.extend(v for b in solo for v, _ in b)
    bins = [b for b in bins if len(b) >= 2]
    zcols = list(zone_cols or [])
    bcols = list(bloom_cols or [])

    @ray.remote
    def rewrite(bin_idx: int, values: list[str]) -> str:
        paths = []
        for v in values:
            sdir = _shard_dir(out_dir, v)
            paths.extend(
                os.path.join(sdir, f)
                for f in sorted(os.listdir(sdir))
                if f.endswith(".parquet")
            )
        tbl = pa.concat_tables([pq.read_table(p) for p in paths])
        value = f"c{bin_idx:06d}_{values[0]}"
        sdir = _shard_dir(out_dir, value)
        tmp = sdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(sdir, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(tbl, os.path.join(tmp, "part-0.parquet"))
        manifest = {"rows": tbl.num_rows, "params_hash": params_hash}
        if zcols:
            manifest["zones"] = {c: _zone_entry(tbl[c]) for c in zcols}
        if bcols:
            manifest["blooms"] = {c: _bloom_entry(tbl[c]) for c in bcols}
        with open(os.path.join(tmp, _MANIFEST), "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, sdir)
        return value

    written = ray.get(
        [rewrite.remote(i, [v for v, _ in b]) for i, b in enumerate(bins)]
    )
    removed = []
    for b in bins:
        for v, _ in b:
            shutil.rmtree(_shard_dir(out_dir, v), ignore_errors=True)
            removed.append(v)
    return {"written": sorted(written), "removed": sorted(removed), "kept": sorted(kept)}
