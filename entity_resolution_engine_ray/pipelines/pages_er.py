"""Flagship pages ER pipeline: extract → block → pairs → score/gate →
cluster → merge, each stage checkpointed to Parquet with a ``_DONE``
manifest (resume from the last completed stage — north rule).

Lifecycle mirror of SURVEY.md §3.4. The reference's single-process
five-entity loop (cli/run_mapping.py:37-188) becomes a streaming Dataset
DAG; its driver-held dict "joins" become Dataset hash joins; its
``writer.reset()`` full-restart becomes checkpoint resume.

Usage::

    result = run_pages_er(pages_path, out_dir, cfg)
    # result: dict with entities/lineage/edges paths + run metrics
"""

from __future__ import annotations

import os
import time

import pyarrow as pa

from entity_resolution_engine_ray.config import PagesERConfig, config_hash
from entity_resolution_engine_ray.stages.block import feature_stage
from entity_resolution_engine_ray.stages.extract import extract_stage
from entity_resolution_engine_ray.stages.score import fused_edges_stage, gate_metrics
from entity_resolution_engine_ray.state.checkpoint import CheckpointStore

PIPELINE_VERSION = 4


def run_pages_er(
    pages,
    out_dir: str,
    cfg: PagesERConfig | None = None,
    resume: bool = True,
    num_partitions: int | None = None,  # None → scale with cluster CPUs
    pages_format: str = "parquet",
) -> dict:
    """Run the full pipeline.

    ``pages``: a path/dir (``pages_format``: parquet|jsonl|csv|warc, normalized
    to the input_hint schema by sources.pages.read_pages) or an existing
    Dataset with that schema (url, warc_ts, html, text, lang).
    """
    cfg = cfg or PagesERConfig()
    # the code version is part of the checkpoint identity: stage semantics /
    # schema changes must invalidate old checkpoints even when the config
    # dataclass is unchanged
    phash = f"{config_hash(cfg)}-v{PIPELINE_VERSION}"
    store = CheckpointStore(out_dir, enabled=True)
    timings: dict[str, float] = {}
    t_start = time.perf_counter()

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)

        return _T()

    # ---- stage 1+2: extract + features (checkpointed together: "block")
    if resume and store.is_done("features", phash):
        features = store.read("features")
    else:
        with timed("features"):
            if isinstance(pages, str):
                from entity_resolution_engine_ray.sources.pages import read_pages

                ds = read_pages(pages, format=pages_format)
            else:
                ds = pages
            extracted = extract_stage(ds)
            features = feature_stage(extracted, cfg)
            features = store.write(features, "features", phash)

    # ---- stage 3+4: candidate pairs + score + gate, fused into one
    # fat-block shuffle (stages/score.fused_edges_stage, ~4× less shuffle
    # traffic than the slim pairgen + join + PairScorer chain). Semantics
    # match the slim chain on every pinned fixture, with two documented
    # divergences at the margins: cap truncation orders members by url_HASH
    # (the chain orders by url string), so an over-cap sub-block may keep a
    # different first-`cap` pair set; and Jaccard runs over 32-bit hashed
    # token ids (exact parity with the serial oracle, which shares the
    # hash — but a token-string scorer would differ on hash collisions).
    if resume and store.is_done("edges", phash):
        edges = store.read("edges")
        dropped = store.manifest("edges").get("dropped_pairs", 0)
    else:
        with timed("edges"):
            with timed("edges_compute"):
                edges, dropped = fused_edges_stage(features, cfg, num_partitions=num_partitions)
            with timed("edges_write"):
                edges = store.write(edges, "edges", phash, extra={"dropped_pairs": dropped})

    # ---- optional stage 4b: distributed gray-zone validation (actor pool
    # over review-decision edges; stages/validate). Off by default.
    if cfg.enable_llm_validation:
        if resume and store.is_done("validated", phash):
            edges = store.read("validated")
        else:
            with timed("validated"):
                from entity_resolution_engine_ray.stages.validate import validate_gray_zone

                edges = store.write(validate_gray_zone(edges), "validated", phash)

    # ---- stage 5: cluster approved edges → fully-labeled pages checkpoint.
    # "auto"/"local": distributed contraction (partition-local union-find →
    # small spanning forest) + driver union + broadcast label map — zero
    # joins, one slim shuffle. "labelprop": fully-distributed min-label
    # propagation for inputs whose connected-node set exceeds driver memory.
    if resume and store.is_done("labeled", phash):
        labeled = store.read("labeled")
    else:
        with timed("labels"):
            import ray

            from entity_resolution_engine_ray.stages.cluster import cluster_label_map
            from entity_resolution_engine_ray.stages.merge import (
                build_labeled,
                label_features_broadcast,
            )

            # filter → ids-only project → materialize ONCE: the gate count
            # below and the clustering pass both consume the cached slim
            # blocks (un-materialized, the filter over the edges checkpoint
            # executed twice — once for count(), once inside the clusterer)
            approved = (
                edges.filter(
                    expr="decision == 'auto_approve' or decision == 'gray_approve'"
                    " or decision == 'llm_approve'"
                )
                .select_columns(["left_id", "right_id"])
                .materialize()
            )
            # size gate: the driver-side label map is only safe when the
            # connected-node set (bounded by 2×edges) fits driver memory —
            # "auto" counts approved edges (metadata-only on the
            # materialized slim table) and falls through to fully-distributed
            # labelprop above the threshold
            method = cfg.cluster_method
            if method == "auto":
                # edge count stays the gate: an HLL node-count second
                # chance was built and MEASURED at 1M pages (28M approved
                # edges, ~0.8M nodes — driver map trivially fits) and the
                # contraction path still LOST to labelprop, 34.3 s vs
                # 15.8 s: _forest_partition's per-edge Python union-find
                # costs more than labelprop's ~19 vectorized rounds. See
                # cluster.approx_connected_nodes for the sketch (kept —
                # it is the right gate for memory SAFETY, just not for
                # speed).
                method = (
                    "local"
                    if approved.count() <= cfg.local_cluster_edge_threshold
                    else "labelprop"
                )
            if method == "local":
                label_map = cluster_label_map(approved)
                labeled = label_features_broadcast(features, ray.put(label_map))
            else:
                # ids-only CC: edges carry int64 url hashes, labels come
                # back keyed by hash, urls rejoin from the features side
                from entity_resolution_engine_ray.stages.cluster import (
                    connected_components_labelprop_ids,
                )

                int_edges = approved.map_batches(
                    lambda t: pa.table({"src": t["left_id"], "dst": t["right_id"]}),
                    batch_format="pyarrow",
                )
                labels = connected_components_labelprop_ids(
                    int_edges,
                    num_partitions=num_partitions,
                    max_iterations=cfg.max_cc_iterations,
                )
                labeled = build_labeled(features, labels, num_partitions)
            labeled = store.write(labeled, "labeled", phash)

    # ---- stage 6: survivorship merge + lineage
    if resume and store.is_done("entities", phash) and store.is_done("lineage", phash):
        entities = store.read("entities")
        lineage = store.read("lineage")
    else:
        with timed("entities"):
            from entity_resolution_engine_ray.stages.merge import (
                entities_from_labeled,
                lineage_from_labeled,
            )

            labeled = labeled.materialize()
            entities = entities_from_labeled(labeled)
            entities = store.write(entities, "entities", phash)
            lineage = lineage_from_labeled(labeled)
            lineage = store.write(lineage, "lineage", phash)

    # ---- run metrics + anomaly detection + quality gates (driver-side,
    # tiny — reference pipeline_run_metrics / anomaly_events /
    # quality_gate_results lifecycle, cli/run_mapping.py:57-60,184-185)
    with timed("metrics"):
        import uuid

        from entity_resolution_engine_ray.state.metrics import (
            MetricsStore,
            detect_anomalies,
            evaluate_quality_gates,
            write_quality_gate_result,
        )

        run_id = str(uuid.uuid4())
        # decision-column-only scan of the edge checkpoint (the partial
        # counts need nothing else; unpruned, the fat id columns are read
        # off disk just to be dropped)
        metrics = gate_metrics(edges.select_columns(["decision"]))
        metrics.update(
            {
                "entity_type": "page",
                "dropped_pairs": dropped,
                "n_entities": entities.count(),
                "wall_s": round(time.perf_counter() - t_start, 3),
            }
        )
        mtbl = pa.table({k: [v] for k, v in metrics.items() if not isinstance(v, dict)})
        store.write_table(mtbl, "metrics", phash, extra={"timings": timings})

        mstore = MetricsStore(os.path.join(out_dir, "history"))
        mstore.append_run_metrics(run_id, [metrics])
        anomalies = detect_anomalies(mstore, run_id, "page")
        high = sum(1 for a in anomalies if a["severity"] == "HIGH")
        gate_result = evaluate_quality_gates([metrics], high_severity_count=high, run_id=run_id)
        write_quality_gate_result(os.path.join(out_dir, "history"), gate_result)

    return {
        "out_dir": out_dir,
        "run_id": run_id,
        "entities": entities,
        "lineage": lineage,
        "edges": edges,
        "metrics": metrics,
        "anomalies": anomalies,
        "quality_gate": gate_result,
        "timings": timings,
    }


def run_pages_er_incremental(
    prev_out_dir: str,
    new_pages,
    out_dir: str,
    cfg: PagesERConfig | None = None,
    num_partitions: int | None = None,
    pages_format: str = "parquet",
) -> dict:
    """Incremental resolution: fold a NEW batch of pages into a completed
    run without re-scoring the old corpus against itself.

    The pair-scoring stage is the pipeline's dominant cost and is block-
    local, so only blocks containing at least one new page can produce new
    or changed edges. This path:

    1. featurizes ONLY the new batch and unions it with the previous
       ``features`` checkpoint;
    2. re-runs fused pair-scoring restricted (``key_filter``) to block keys
       the new batch touches — old-old pairs inside a touched block rescore
       to byte-identical edges; untouched blocks never enter the shuffle;
    3. unions the new edges with the previous ``edges`` checkpoint and
       dedups on (left_id, right_id) — either copy of a rescored edge is
       identical, so keep-first is exact;
    4. writes both unions as COMPLETED checkpoints in ``out_dir`` and
       delegates to ``run_pages_er(resume=True)``, which skips straight to
       clustering/merge/metrics — the incremental path exercises the exact
       resume contract the kill/resume tests pin.

    Equality contract (pinned in tests/test_incremental.py): the result
    equals a full run over old ∪ new — same edges, same cluster partitions
    — while scoring only O(touched blocks) pairs. Assumes the new batch's
    urls are NEW (a re-crawled url would union two feature rows; dedup by
    url upstream if re-ingestion is possible). Cost at 100 TB: a small
    daily batch touches a small fraction of blocks, so step 2 is ~|new| ×
    avg-block-size pair scores instead of |corpus|²-shaped work; steps 3-5
    stay O(corpus) but shuffle-light (labels move O(|V|) rows)."""
    import numpy as np

    from entity_resolution_engine_ray.stages.grouping import partition_map_groups

    cfg = cfg or PagesERConfig()
    phash = f"{config_hash(cfg)}-v{PIPELINE_VERSION}"
    prev = CheckpointStore(prev_out_dir, enabled=True)
    if not (prev.is_done("features", phash) and prev.is_done("edges", phash)):
        raise ValueError(
            "previous run is incomplete or was produced by a different "
            "config/pipeline version — run the full pipeline instead"
        )
    features_prev = prev.read("features")
    edges_prev = prev.read("edges")

    store = CheckpointStore(out_dir, enabled=True)
    if not (store.is_done("features", phash) and store.is_done("edges", phash)):
        # ---- new-batch features + union checkpoint
        if isinstance(new_pages, str):
            from entity_resolution_engine_ray.sources.pages import read_pages

            new_ds = read_pages(new_pages, format=pages_format)
        else:
            new_ds = new_pages
        features_new = feature_stage(extract_stage(new_ds), cfg)
        features_new = features_new.materialize()

        # ---- touched block keys (small side: |new| × bands int64 keys)
        from entity_resolution_engine_ray.stages.block import block_keys_stage

        touched = np.unique(
            block_keys_stage(features_new).to_pandas()["block_key"].to_numpy(np.int64)
        )

        features = features_prev.union(features_new)
        features = store.write(features, "features", phash)

        # ---- rescore ONLY touched blocks over the unioned corpus
        edges_new, dropped_new = fused_edges_stage(
            features, cfg, num_partitions=num_partitions, key_filter=touched
        )

        # ---- edge union + exact dedup on the id pair
        def dedup_pairs(pdf):
            return pdf.drop_duplicates(["left_id", "right_id"], keep="first")

        edges = partition_map_groups(
            edges_prev.union(edges_new),
            ["left_id", "right_id"],
            dedup_pairs,
            num_partitions or 16,
        )
        # dropped-pair accounting accumulates ACROSS folds (keeping only
        # the new batch's would silently degrade the count over a chain of
        # folds). Upper bound: an over-cap block that is ALSO touched has
        # its drops counted in both terms — exact subtraction would need
        # per-block drop attribution, which the slim count doesn't carry.
        dropped_prev = int(prev.manifest("edges").get("dropped_pairs", 0) or 0)
        store.write(
            edges,
            "edges",
            phash,
            extra={
                "dropped_pairs": dropped_prev + dropped_new,
                "incremental_from": prev_out_dir,
                "touched_blocks": int(len(touched)),
            },
        )

    # ---- clustering / merge / metrics: the standard resume path
    return run_pages_er(
        new_pages, out_dir, cfg, resume=True, num_partitions=num_partitions,
        pages_format=pages_format,
    )
