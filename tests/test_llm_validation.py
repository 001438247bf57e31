"""LLM validation semantics without a network (reference
tests/test_llm_validation.py:10-84, validation/llm_client.py:15-139):
invalid-JSON retry, the three accepted response formats, error fallback to
REVIEW+llm_error, latency aggregation into router metrics, and the
monitoring-summary ``avg*count`` latency reconstruction."""

import json

import pytest

from entity_resolution_engine_ray.config import GrayZone, ValidationConfig
from entity_resolution_engine_ray.state.llm import (
    LLMClient,
    LLMValidatorAdapter,
    validate_pair,
)
from entity_resolution_engine_ray.state.metrics import monitoring_summary
from entity_resolution_engine_ray.state.router import route_matches


def _client(responses):
    """Client over a scripted transport (pops one response per call)."""
    calls = []

    def transport(payload, timeout_s):
        calls.append((payload, timeout_s))
        r = responses.pop(0)
        if isinstance(r, Exception):
            raise r
        return r

    c = LLMClient(transport)
    return c, calls


def test_llm_client_retries_invalid_json():
    c, calls = _client(
        [
            {"content": "not-json"},
            {"content": '{"decision":"MATCH","confidence":0.9,"reasons":[],"risk_flags":[]}'},
        ]
    )
    result = c.request_json("sys", "user")
    assert result["decision"] == "MATCH"
    assert len(calls) == 2
    assert c.last_invalid_json_retry is True
    # the retry prompt carries the literal preamble (llm_client.py:82-84)
    retry_user = calls[1][0]["messages"][1]["content"]
    assert retry_user.startswith("Return valid JSON only.")


def test_llm_client_no_retry_raises():
    c, _ = _client([{"content": "not-json"}])
    with pytest.raises(ValueError, match="Invalid JSON"):
        c.request_json("sys", "user", retry_on_invalid_json=False)


def test_llm_client_request_shape_and_timeout():
    c, calls = _client([{"content": "{}"}])
    c.request_json("SYS", "USER")
    payload, timeout_s = calls[0]
    assert timeout_s == 12.0  # reference llm_client.py:24 default
    assert payload["temperature"] == 0
    assert payload["messages"][0] == {"role": "system", "content": "SYS"}
    assert payload["messages"][1] == {"role": "user", "content": "USER"}


def test_llm_client_extracts_three_formats():
    assert (
        LLMClient._extract_content({"choices": [{"message": {"content": '{"d":1}'}}]})
        == '{"d":1}'
    )
    assert LLMClient._extract_content({"content": '{"d":2}'}) == '{"d":2}'
    assert LLMClient._extract_content({"choices": [{"text": '{"d":3}'}]}) == '{"d":3}'
    assert LLMClient._extract_content({"unexpected": True}) is None


def test_validate_pair_falls_back_on_llm_error():
    c, _ = _client([RuntimeError("boom")])
    result = validate_pair("team", {"id": "1"}, {"id": "2"}, 0.8, {"conflict_flags": []}, c)
    assert result.decision == "REVIEW"
    assert "llm_error" in result.risk_flags


def test_validate_pair_flags_invalid_json_retry():
    c, _ = _client(
        [
            {"content": "garbage"},
            {"content": '{"decision":"NO_MATCH","confidence":0.8,"reasons":["x"],"risk_flags":[]}'},
        ]
    )
    result = validate_pair("team", {"id": "1"}, {"id": "2"}, 0.8, {}, c)
    assert result.decision == "NO_MATCH"
    assert "llm_invalid_json_retry" in result.risk_flags


def test_router_aggregates_latency_and_summary_reconstructs():
    responses = [
        {"content": '{"decision":"MATCH","confidence":0.9,"reasons":[],"risk_flags":[]}'}
        for _ in range(4)
    ]
    c, _ = _client(responses)
    adapter = LLMValidatorAdapter(c, "team", id_keys=("alpha_team_id", "beta_team_id"))
    cfg = ValidationConfig(enabled=True, gray_zones={"team": GrayZone(0.7, 0.9)})
    matches = [
        {"alpha_team_id": i, "beta_team_id": 100 + i, "confidence": 0.8, "conflict_flags": []}
        for i in range(4)
    ]
    out = route_matches("team", matches, cfg, adapter)
    m = out.metrics
    assert m["llm_call_count"] == 4
    assert m["llm_match_count"] == 4
    assert m["llm_avg_latency_ms"] is not None and m["llm_avg_latency_ms"] >= 0.0

    # monitoring summary reconstructs total latency as avg*count per row
    rows = [dict(m), dict(m)]
    summary = monitoring_summary(rows, review_items=[{"status": "PENDING"}, {"status": "APPROVED"}])
    assert summary["totals"]["llm_call_count"] == 8
    assert summary["llm_health"]["llm_avg_latency_ms"] == pytest.approx(m["llm_avg_latency_ms"])
    assert summary["review_counts"] == {"PENDING": 1, "APPROVED": 1}
    assert summary["rates"]["gray_zone_rate"] == pytest.approx(8 / 8)


def test_triage_report_includes_review_samples(tmp_path):
    from entity_resolution_engine_ray.state.metrics import MetricsStore, generate_triage_report

    store = MetricsStore(str(tmp_path))
    items = [
        {
            "entity_type": "team",
            "candidate": {
                "alpha_team_id": i,
                "beta_team_id": 100 + i,
                "confidence": 0.8,
                "conflict_flags": ["country_mismatch"],
            },
            "status": "PENDING",
        }
        for i in range(25)
    ]
    report = generate_triage_report(store, "run-x", "team", review_items=items)
    assert len(report["review_samples"]) == 20  # capped (llm_triage.py:84 LIMIT 20)
    s = report["review_samples"][0]
    assert s["left_id"] == 0 and s["right_id"] == 100
    assert s["matcher_score"] == 0.8
    assert s["signals"]["conflict_flags"] == ["country_mismatch"]
    json.dumps(report)  # serializable
