"""User extension surface (SURVEY.md §2.7).

The reference's extension points are YAML config files plus a hard-wired
matcher → router-adapter → merger triple per entity type. This engine makes
both explicit and registerable:

1. **Stage registry** — named batch transforms (pure fn or stateful callable
   class over Arrow batches) composable into a pipeline from plain config
   (the declarative analog of chaining ``map_batches``):

       @register_stage("lowercase_text")
       def lower(batch: pa.Table) -> pa.Table: ...

       ds = build_pipeline(ds, [
           {"stage": "extract"},
           {"stage": "lowercase_text"},
       ])

2. **Entity-spec registry** — per-entity-type (matcher, merger, gray zone,
   dependencies) specs driving the relational ER lifecycle; registering a
   new spec adds an entity type without touching the engine:

       register_entity_spec(EntitySpec("venue", match_venues, merge_venues,
                                       GrayZone(0.7, 0.9), deps=["team"]))
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from entity_resolution_engine_ray.config import GrayZone

# ---------------------------------------------------------------- stages

STAGES: dict[str, dict] = {}


def register_stage(name: str, **default_kwargs):
    """Decorator: register a batch transform (function → stateless tasks,
    class → actor pool) under a name for config-driven pipelines."""

    def deco(fn_or_cls):
        STAGES[name] = {"impl": fn_or_cls, "defaults": default_kwargs}
        return fn_or_cls

    return deco


def build_pipeline(ds, stage_configs: list[dict]):
    """Apply registered stages in order. Each config: {"stage": name,
    optional "batch_size", "concurrency", plus stage kwargs}."""
    for conf in stage_configs:
        conf = dict(conf)
        name = conf.pop("stage")
        if name not in STAGES:
            raise KeyError(f"unknown stage {name!r}; registered: {sorted(STAGES)}")
        entry = ST = STAGES[name]
        impl = entry["impl"]
        batch_size = conf.pop("batch_size", entry["defaults"].get("batch_size", 1024))
        concurrency = conf.pop("concurrency", entry["defaults"].get("concurrency"))
        kwargs = {**{k: v for k, v in entry["defaults"].items() if k not in ("batch_size", "concurrency")}, **conf}
        if isinstance(impl, type):  # stateful actor-pool stage
            from entity_resolution_engine_ray.stages.block import default_pool_size

            ds = ds.map_batches(
                impl,
                fn_constructor_kwargs=kwargs,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency or default_pool_size(),
            )
        else:
            ds = ds.map_batches(
                impl, fn_kwargs=kwargs, batch_format="pyarrow", batch_size=batch_size
            )
    return ds


# built-in stage registrations
def _register_builtins() -> None:
    from entity_resolution_engine_ray.config import PagesERConfig
    from entity_resolution_engine_ray.stages.block import featurize_batch
    from entity_resolution_engine_ray.stages.extract import extract_batch

    STAGES.setdefault("extract", {"impl": extract_batch, "defaults": {}})
    STAGES.setdefault(
        "features", {"impl": featurize_batch, "defaults": {"cfg": PagesERConfig()}}
    )


_register_builtins()

# ---------------------------------------------------------------- entities


@dataclass
class EntitySpec:
    """One entity type's linkage recipe: the reference's matcher →
    router-adapter → merger triple as data."""

    entity_type: str
    matcher: Callable[..., list[dict]]  # (alpha_tbl, beta_tbl, ctx) -> matches
    merger: Callable[..., Any]          # (approved, alpha_tbl, beta_tbl, ctx) -> (records, a_map, b_map)
    gray_zone: GrayZone = field(default_factory=lambda: GrayZone(0.7, 0.9))
    deps: tuple[str, ...] = ()          # entity types whose maps must exist in ctx


ENTITY_SPECS: dict[str, EntitySpec] = {}


def register_entity_spec(spec: EntitySpec) -> None:
    ENTITY_SPECS[spec.entity_type] = spec


def run_entity_specs(
    alpha: dict, beta: dict, specs: list[str] | None = None, validation_config=None, validator=None
) -> dict:
    """Generic registry-driven linkage lifecycle: topologically runs each
    spec's matcher → router gate → merger, threading cross-entity maps
    through ``ctx`` (the Dataset-scale analog keeps maps as Datasets; at
    driver scale they are dicts, like the reference)."""
    from entity_resolution_engine_ray.config import ValidationConfig
    from entity_resolution_engine_ray.state.router import route_matches

    vcfg = validation_config or ValidationConfig()
    order = specs or list(ENTITY_SPECS)
    ctx: dict[str, Any] = {"alpha": alpha, "beta": beta, "maps": {}}
    results: dict[str, Any] = {"entities": {}, "outcomes": {}, "metrics": []}
    done: set[str] = set()
    pending = [ENTITY_SPECS[s] for s in order]
    while pending:
        progressed = False
        for spec in list(pending):
            if not all(d in done for d in spec.deps):
                continue
            matches = spec.matcher(alpha, beta, ctx)
            zones = dict(vcfg.gray_zones)
            zones.setdefault(spec.entity_type, spec.gray_zone)
            cfg = ValidationConfig(
                enabled=vcfg.enabled,
                max_calls_per_entity_type_per_run=vcfg.max_calls_per_entity_type_per_run,
                circuit_breaker_window=vcfg.circuit_breaker_window,
                circuit_breaker_max_fail_rate=vcfg.circuit_breaker_max_fail_rate,
                circuit_breaker_max_invalid_json_rate=vcfg.circuit_breaker_max_invalid_json_rate,
                fallback_mode_when_llm_unhealthy=vcfg.fallback_mode_when_llm_unhealthy,
                gray_zones=zones,
            )
            outcome = route_matches(spec.entity_type, matches, cfg, validator)
            merged = spec.merger(outcome.approved, alpha, beta, ctx)
            results["entities"][spec.entity_type] = merged
            results["outcomes"][spec.entity_type] = outcome
            results["metrics"].append(outcome.metrics)
            done.add(spec.entity_type)
            pending.remove(spec)
            progressed = True
        if not progressed:
            raise ValueError(f"dependency cycle or missing dep among {[s.entity_type for s in pending]}")
    return results
