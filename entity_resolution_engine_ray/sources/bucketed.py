"""Bucketed table storage: hash-partition a table by a join key ONCE at
write time, then join any two same-bucketed tables with ZERO shuffle —
bucket i of A can only match bucket i of B, so the join is an embarrassing
per-bucket map over storage (the Hive/Spark bucketed-table idea, and the
pattern that amortizes a 100 TB fact table's exchange across every future
join instead of paying it per query).

Layout (reuses the resumable sharded sink — one sealed dir per bucket):

    out_dir/
      _BUCKETSPEC.json              {"key_col", "num_buckets", "hash": "v1"}
      shard=<bucket>/part-*.parquet
      shard=<bucket>/_MANIFEST.json

The bucket id is ``_key_hash_column(key) % num_buckets`` — the SAME
dtype-stable kernel the runtime exchange uses (stages/exchange), so a
bucketed table is exactly "one side of the exchange, persisted".
``bucketed_cogroup`` refuses to join tables whose spec disagrees
(different bucket count or hash version would silently mispair keys).

Scale notes: the write IS a full exchange (that is the point — paid once);
the join reads bucket pairs directly from storage, one task per bucket,
no driver materialization (tables flow back as Arrow refs into a
Dataset). Bucket count is the parallelism floor for every future join of
that table — size it like a partition count (auto_partitions of the
expected row count), not like a file count.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa

_SPEC = "_BUCKETSPEC.json"
_HASH_VERSION = "v1"


def write_bucketed_parquet(
    ds,
    out_dir: str,
    key_col: str,
    num_buckets: int,
    params_hash: str = "",
) -> dict:
    """Hash-bucket ``ds`` by ``key_col`` into ``num_buckets`` sealed shard
    dirs (resumable — finished buckets are skipped on re-run, see
    sources/sink). Returns the sink's {"written", "skipped"} dict."""
    from entity_resolution_engine_ray.sources.sink import write_sharded_parquet
    from entity_resolution_engine_ray.stages.exchange import _key_hash_column

    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")

    nb = int(num_buckets)

    def assign(t: pa.Table) -> pa.Table:
        h = _key_hash_column(t[key_col], t.num_rows)
        return t.append_column("_bucket", pa.array((h % nb).astype("int64")))

    os.makedirs(out_dir, exist_ok=True)
    spec = {"key_col": key_col, "num_buckets": nb, "hash": _HASH_VERSION}
    spec_path = os.path.join(out_dir, _SPEC)
    if os.path.exists(spec_path):
        with open(spec_path) as f:
            existing = json.load(f)
        if existing != spec:
            raise ValueError(
                f"bucket spec mismatch for {out_dir}: existing {existing} vs {spec}"
            )
    else:
        with open(spec_path, "w") as f:
            json.dump(spec, f)

    return write_sharded_parquet(
        ds.map_batches(assign, batch_format="pyarrow"),
        out_dir,
        "_bucket",
        params_hash=params_hash,
    )


def read_bucket_spec(out_dir: str) -> dict:
    with open(os.path.join(out_dir, _SPEC)) as f:
        return json.load(f)


def _bucket_paths(out_dir: str) -> dict:
    """bucket id -> list of sealed parquet paths (unsealed dirs ignored)."""
    out: dict = {}
    for name in sorted(os.listdir(out_dir)):
        sdir = os.path.join(out_dir, name)
        if not name.startswith("shard=") or not os.path.isfile(
            os.path.join(sdir, "_MANIFEST.json")
        ):
            continue
        b = int(name.split("=", 1)[1])
        out[b] = [
            os.path.join(sdir, f)
            for f in sorted(os.listdir(sdir))
            if f.endswith(".parquet")
        ]
    return out


def bucketed_cogroup(left_dir: str, right_dir: str, fn):
    """Join/cogroup two bucketed tables with NO exchange: one Ray task per
    bucket reads bucket i of both sides straight from storage and applies
    ``fn(left_pdf, right_pdf) -> pd.DataFrame``. A bucket missing on one
    side reaches ``fn`` as an empty (but typed) frame, so outer semantics
    are fn's choice. Returns a Dataset of fn's output rows."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    lspec, rspec = read_bucket_spec(left_dir), read_bucket_spec(right_dir)
    if (lspec["num_buckets"], lspec["hash"]) != (rspec["num_buckets"], rspec["hash"]):
        raise ValueError(
            f"cannot bucket-join: specs disagree ({lspec} vs {rspec}) — "
            "same num_buckets and hash version required"
        )

    lpaths, rpaths = _bucket_paths(left_dir), _bucket_paths(right_dir)

    def _schema(paths_by_bucket: dict):
        for ps in paths_by_bucket.values():
            if ps:
                return pq.read_schema(ps[0])
        return None

    lschema, rschema = _schema(lpaths), _schema(rpaths)

    @ray.remote
    def join_bucket(lp: list, rp: list) -> pa.Table:
        def load(paths, schema):
            if paths:
                return pa.concat_tables([pq.read_table(p) for p in paths]).to_pandas()
            if schema is not None:
                return schema.empty_table().to_pandas()
            return pd.DataFrame()

        out = fn(load(lp, lschema), load(rp, rschema))
        return pa.Table.from_pandas(out, preserve_index=False)

    buckets = sorted(set(lpaths) | set(rpaths))
    refs = [
        join_bucket.remote(lpaths.get(b, []), rpaths.get(b, [])) for b in buckets
    ]
    if not refs:
        raise FileNotFoundError(
            f"no sealed buckets under {left_dir} / {right_dir}"
        )
    return rd.from_arrow_refs(refs)
