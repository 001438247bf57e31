"""entity_resolution_engine_ray — a Ray-Data-native record-linkage / data-processing engine.

A from-scratch engine with the query and data-processing capabilities of the
reference ``bintu27/entity-resolution-engine`` (see /root/repo/SURVEY.md), built
idiomatically on ``ray.data.Dataset``: zero-copy Arrow ``map_batches`` stages,
actor pools for stateful scoring, salted groupby shuffles for candidate
generation, distributed connected components for transitive clustering, and
per-stage Parquet checkpoints with ``_DONE`` manifests for resume.

Layout
------
- ``functions/`` — pure scalar/vector kernels (normalizers, similarity scorers,
  sketches, text statistics). Semantics of the reference normalizers are
  preserved byte-for-byte (cited per function).
- ``sources/``   — deterministic fixture generators + parquet read helpers.
- ``stages/``    — Ray Data stage implementations (extract, block, pairs,
  score, gate, cluster, merge, dedup, knn, multimodal).
- ``pipelines/`` — end-to-end pipelines (pages ER flagship, relational ER
  parity with the reference's five entity types).
- ``state/``     — checkpoint manifests, run metrics, quality gates, anomaly
  detection.
- ``oracle/``    — serial single-process oracle used by parity tests.
"""

__version__ = "0.1.0"
