"""Extension-surface tests: stage registry + entity-spec registry."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from entity_resolution_engine_ray.config import GrayZone
from entity_resolution_engine_ray.registry import (
    ENTITY_SPECS,
    STAGES,
    EntitySpec,
    build_pipeline,
    register_entity_spec,
    register_stage,
    run_entity_specs,
)


def test_builtin_stages_registered():
    assert "extract" in STAGES and "features" in STAGES


def test_custom_stage_pipeline(ray_session):
    import ray.data as rd

    @register_stage("upper_text")
    def upper(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", pc.utf8_upper(batch["text"])
        )

    ds = rd.from_arrow(pa.table({"text": ["hello", "world"]}))
    out = build_pipeline(ds, [{"stage": "upper_text"}]).to_pandas()
    assert out["text"].tolist() == ["HELLO", "WORLD"]
    with pytest.raises(KeyError):
        build_pipeline(ds, [{"stage": "nope"}])


def test_entity_spec_registry_with_custom_entity():
    # a minimal custom entity type: exact-name venue matching
    def match_venues(alpha, beta, ctx):
        bmap = {r["name"]: r["id"] for r in beta["venues"].to_pylist()}
        out = []
        for r in alpha["venues"].to_pylist():
            if r["name"] in bmap:
                out.append({"alpha_id": r["venue_id"], "beta_id": bmap[r["name"]], "confidence": 1.0})
        return out

    def merge_venues(approved, alpha, beta, ctx):
        ctx["maps"]["venue"] = {m["alpha_id"]: m["beta_id"] for m in approved}
        return [{"ues_venue_id": f"V-{m['alpha_id']}-{m['beta_id']}"} for m in approved]

    # a dependent entity type that needs the venue map
    def match_rooms(alpha, beta, ctx):
        assert "venue" in ctx["maps"], "deps must run first"
        return []

    def merge_rooms(approved, alpha, beta, ctx):
        return []

    register_entity_spec(EntitySpec("room", match_rooms, merge_rooms, deps=("venue",)))
    register_entity_spec(EntitySpec("venue", match_venues, merge_venues, GrayZone(0.5, 0.9)))

    alpha = {"venues": pa.table({"venue_id": [1, 2], "name": ["Alpha Arena", "Beta Bowl"]})}
    beta = {"venues": pa.table({"id": [10, 11], "name": ["Alpha Arena", "Gamma Grounds"]})}
    # order given with the dependent FIRST — registry resolves deps
    res = run_entity_specs(alpha, beta, specs=["room", "venue"])
    assert res["entities"]["venue"] == [{"ues_venue_id": "V-1-10"}]
    assert res["metrics"][0]["entity_type"] == "venue"  # ran before room
    ENTITY_SPECS.clear()


def test_entity_spec_cycle_detection():
    register_entity_spec(EntitySpec("a", lambda *x: [], lambda *x: [], deps=("b",)))
    register_entity_spec(EntitySpec("b", lambda *x: [], lambda *x: [], deps=("a",)))
    with pytest.raises(ValueError):
        run_entity_specs({}, {}, specs=["a", "b"])
    ENTITY_SPECS.clear()
