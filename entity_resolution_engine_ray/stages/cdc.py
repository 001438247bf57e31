"""CDC merge (MERGE INTO / upsert-delete apply) — the lakehouse table-
maintenance primitive: a base table + a keyed changeset (upserts and
deletes with a sequence number for precedence) → the merged table.

Scale shape (100 TB base, small-relative changeset): the dominant cost of
a naive MERGE is shuffling the whole base into a key exchange. Here a
distributed Bloom filter over the changeset keys (stages/bloom — bit
arrays OR-merge on the driver, keys never collect) gates the base:
**misses pass through with ZERO shuffle** (they provably have no change —
Bloom false negatives cannot occur), and only probable hits (the
changeset-sized sliver plus fpp·|base| false positives, removed exactly by
the cogroup) ride one co-partitioned exchange with the changes. Same
composition as the cross-corpus exact-dedup path (pipelines/queries
cross_corpus_dedup), applied to mutation instead of subtraction.

Semantics (deterministic, oracle-checkable in SQL):
- per key, the change with the highest ``seq`` wins ((key, seq) must be
  unique — equal-seq precedence would be arbitrary on both engines);
- winning ``op == "upsert"`` → the change's payload row replaces the base
  row (or inserts it, if the key is new — same code path);
- winning ``op == "delete"`` → the key disappears;
- keys with no change keep their base row byte-identically.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray

from entity_resolution_engine_ray.stages.bloom import BloomFilter, build_bloom
from entity_resolution_engine_ray.stages.exchange import hash_exchange_cogroup


def cdc_merge(
    base_ds,
    changes_ds,
    key_col: str,
    payload_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    fpp: float = 0.01,
    num_partitions: int | None = None,
):
    """Apply ``changes_ds`` (``key, op ∈ {upsert, delete}, seq`` + payload
    columns, payload meaningful on upserts) to ``base_ds`` and return the
    merged Dataset with exactly ``payload_cols`` (which must include
    ``key_col``). Keys must be int64 (hash string keys to int64 first —
    ``functions.similarity.stable_hash64`` — as every slim exchange in this
    repo does)."""
    if key_col not in payload_cols:
        raise ValueError(f"payload_cols must include the key column {key_col!r}")
    changes = changes_ds.materialize()
    n_changes = changes.count()
    if n_changes == 0:
        return base_ds.map_batches(
            lambda t: t.select(payload_cols), batch_format="pyarrow"
        )

    bf = build_bloom(changes, key_col, n_expected=n_changes, fpp=fpp)
    bf_ref = ray.put(bf)

    def flag(t: pa.Table) -> pa.Table:
        f: BloomFilter = ray.get(bf_ref)
        keys = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.select(payload_cols).append_column("__hit", pa.array(f.contains(keys)))

    # one real pass computes the membership flag; the two selectors below
    # consume the SAME materialized blocks (no second probe pass). They are
    # map_batches with Arrow Table.filter — NOT Dataset.filter(expr) +
    # drop_columns, which emits SCHEMA-LESS empty blocks for all-miss /
    # all-hit inputs (observed on ray 2.49: `[]` schema + "new schema: ."
    # warning) and those poison the cogroup's typed-empty synthesis
    flagged = base_ds.map_batches(flag, batch_format="pyarrow").materialize()

    def side(want_hit: bool):
        def pick(t: pa.Table) -> pa.Table:
            mask = t["__hit"] if want_hit else pa.compute.invert(
                t["__hit"].combine_chunks()
            )
            return t.filter(mask).select(payload_cols)

        return pick

    misses = flagged.map_batches(side(False), batch_format="pyarrow")
    hits = flagged.map_batches(side(True), batch_format="pyarrow")

    def apply(base_pdf: pd.DataFrame, ch_pdf: pd.DataFrame) -> pd.DataFrame:
        if ch_pdf.empty:
            return base_pdf[payload_cols]
        # highest-seq change per key wins (stable sort + tail: max seq)
        latest = (
            ch_pdf.sort_values([key_col, seq_col], kind="mergesort")
            .groupby(key_col, as_index=False)
            .tail(1)
        )
        keep = base_pdf[~base_pdf[key_col].isin(latest[key_col])]
        ups = latest[latest[op_col] == "upsert"]
        return pd.concat([keep[payload_cols], ups[payload_cols]], ignore_index=True)

    applied = hash_exchange_cogroup(
        hits, changes, [key_col], [key_col], apply, num_partitions=num_partitions
    )

    # pandas-produced partitions and parquet-read blocks can disagree on
    # string width (utf8 vs large_utf8) — cast BOTH union sides to the
    # base flagged schema (metadata-only: flagged is materialized) so the
    # union is exact
    base_schema = flagged.schema().base_schema
    schema = pa.schema([(c, base_schema.field(c).type) for c in payload_cols])

    def canon(t: pa.Table) -> pa.Table:
        return t.select(payload_cols).cast(schema)

    return misses.map_batches(canon, batch_format="pyarrow").union(
        applied.map_batches(canon, batch_format="pyarrow")
    )
