"""Stage 6 — survivorship merge + lineage.

``groupby(cluster_label).map_groups(survivorship)`` canonicalizes each entity
cluster (the Ray generalization of the reference's per-entity mergers,
merger/players_merge.py:39-45 — deterministic field preference by source
priority then record key):

- representative member = min ``(warc_ts, url)``
- ``entity_id`` = content hash of the sorted member urls
  (functions/ids.cluster_entity_id — the N-way analog of generate_ues_id)
- ``lang`` = majority vote, ties broken lexicographically
- ``merge_confidence`` = mean score of the cluster's approved edges is NOT
  recomputed here (edges live in their own checkpoint); instead n_members and
  the representative are recorded — confidence joins on demand.

Singleton pages (no approved edge) become single-member entities via a left
outer join of all pages against the edge-derived labels.

The flat lineage table (url → entity_id, the reference's ``source_lineage``
explode, ues_writer/writer.py:56-67) is emitted by re-joining labels with the
entity mapping — a Dataset, never a driver dict (SURVEY.md §2.5).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from entity_resolution_engine_ray.functions.ids import cluster_entity_id
from entity_resolution_engine_ray.functions.similarity import stable_hash64
from entity_resolution_engine_ray.oracle.serial import normalize_domain


def _survivor_partition(pdf: pd.DataFrame) -> pd.DataFrame:
    """One hash partition of clusters → one canonical row per cluster.

    Vectorized: one sort, pandas groupby aggregates; the only per-cluster
    Python is the member-url content hash."""
    pdf = pdf.sort_values(["cluster_label", "warc_ts", "url"], kind="mergesort")
    g = pdf.groupby("cluster_label", sort=False)
    rep = g.head(1).set_index("cluster_label")  # min (warc_ts, url) member
    agg = g.agg(
        n_members=("url", "size"),
        first_seen=("warc_ts", "min"),
        last_seen=("warc_ts", "max"),
    )
    # majority lang, ties lexicographic
    lc = pdf.groupby(["cluster_label", "lang"], sort=False).size().reset_index(name="c")
    lc = lc.sort_values(["cluster_label", "c", "lang"], ascending=[True, False, True], kind="mergesort")
    lang_top = lc.drop_duplicates("cluster_label").set_index("cluster_label")["lang"]
    ids = g["url"].agg(lambda u: cluster_entity_id("PAGE", list(u)))
    out = pd.DataFrame(
        {
            "cluster_label": agg.index.to_numpy(dtype=np.int64),
            "entity_id": ids.reindex(agg.index).to_numpy(),
            "canonical_url": rep["url"].reindex(agg.index).to_numpy(),
            "canonical_title": rep["title_norm"].reindex(agg.index).to_numpy(),
            "domain": [normalize_domain(u) for u in rep["url"].reindex(agg.index)],
            "lang": lang_top.reindex(agg.index).to_numpy(),
            "n_members": agg["n_members"].to_numpy(dtype=np.int64),
            "first_seen": agg["first_seen"].to_numpy(),
            "last_seen": agg["last_seen"].to_numpy(),
        }
    )
    return out.reset_index(drop=True)


def merge_stage(features_ds, labels_ds, num_partitions=None):
    """features (url, warc_ts, lang, title_norm) + labels (url,
    cluster_label) → (entities_ds, lineage_ds)."""
    from entity_resolution_engine_ray.stages.joins import default_join_partitions, safe_join

    num_partitions = num_partitions or default_join_partitions()
    pages_meta = features_ds.select_columns(["url", "warc_ts", "lang", "title_norm"])
    joined = safe_join(
        pages_meta, labels_ds, join_type="left_outer", on=("url",), right_on=("url",),
        num_partitions=num_partitions,
    )

    def fill_singletons(batch: pd.DataFrame) -> pd.DataFrame:
        missing = batch["cluster_label"].isna()
        if missing.any():
            batch = batch.copy()
            batch.loc[missing, "cluster_label"] = [
                np.int64(stable_hash64(u)) for u in batch.loc[missing, "url"]
            ]
        batch["cluster_label"] = batch["cluster_label"].astype(np.int64)
        return batch

    from entity_resolution_engine_ray.stages.grouping import partition_map_groups

    labeled = joined.map_batches(fill_singletons, batch_format="pandas").materialize()
    entities = partition_map_groups(
        labeled, ["cluster_label"], _survivor_partition, num_partitions
    ).materialize()

    # flat lineage: url → entity_id (the source_lineage explode analog)
    lineage = (
        safe_join(
            labeled.select_columns(["url", "cluster_label"]),
            entities.select_columns(["cluster_label", "entity_id"]),
            on=("cluster_label",),
            right_on=("cluster_label",),
            num_partitions=num_partitions,
        )
        .map_batches(
            lambda b: b.assign(source_domain=[normalize_domain(u) for u in b["url"]]),
            batch_format="pandas",
        )
        .select_columns(["url", "entity_id", "source_domain"])
    )
    return entities, lineage
