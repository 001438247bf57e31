"""Match-validation router: three-way gate + optional external validator
with call caps and a circuit breaker.

Reference semantics (validation/router.py:97-256) preserved exactly:
- score < gray.low → reject
- score ≥ gray.high AND no conflict flags → auto-approve
- gray zone → external validator (when enabled+healthy) else fallback
  (``auto_approve`` default / ``review``)
- per-entity-type call cap (max_calls_per_entity_type_per_run); once hit,
  the remaining gray-zone candidates take the fallback path
  (disabled_reason="max_calls_exceeded")
- rolling-window circuit breaker: window of call outcomes; opens when
  fail-rate ≥ max_fail_rate or invalid-json-retry-rate ≥
  max_invalid_json_rate (disabled_reason="circuit_breaker_open")
- 15-field metrics row mirroring pipeline_run_metrics
  (db/ues_schema.sql:76-95)

The validator is a plain callable (candidate → ValidationResult); no network
dependency. In the distributed pages pipeline the same gate runs vectorized
inside the scorer (stages/score.py); this router is the reference-parity
driver-side path for the relational matchers and the harness around any
future LLM actor-pool stage.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable

from entity_resolution_engine_ray.config import ValidationConfig


@dataclass
class ValidationResult:
    decision: str  # MATCH | NO_MATCH | REVIEW
    confidence: float = 0.0
    reasons: list[str] = field(default_factory=list)
    risk_flags: list[str] = field(default_factory=list)


@dataclass
class RoutingOutcome:
    approved: list[dict]
    rejected: list[dict]
    review_items: list[dict]
    metrics: dict[str, Any]


def _fallback_decision(mode: str) -> ValidationResult:
    if mode == "review":
        return ValidationResult("REVIEW", 0.0, ["validator unavailable - fallback review"], ["llm_fallback"])
    return ValidationResult("MATCH", 0.0, ["validator unavailable - fallback auto-approved"], ["llm_fallback"])


def route_matches(
    entity_type: str,
    matches: list[dict],
    config: ValidationConfig | None = None,
    validator: Callable[[dict], ValidationResult] | None = None,
    score_key: str = "confidence",
    conflict_key: str = "conflict_flags",
) -> RoutingOutcome:
    """Route candidate matches through the three-way gate.

    ``matches``: dicts with a ``score_key`` float and optionally a
    ``conflict_key`` list (truthy → never auto-approved even above high)."""
    config = config or ValidationConfig()
    zone = config.threshold_for(entity_type)
    approved: list[dict] = []
    rejected: list[dict] = []
    review_items: list[dict] = []

    gray_sent = llm_match = llm_no_match = llm_review = 0
    call_count = error_count = invalid_retry_count = 0
    total_latency_ms = 0.0
    disabled_reason: str | None = None
    fallback = config.fallback_mode_when_llm_unhealthy
    window: deque[dict] = deque(maxlen=config.circuit_breaker_window)
    validator_on = config.enabled and validator is not None
    if not validator_on:
        disabled_reason = "llm_unavailable"

    def circuit_open() -> bool:
        if len(window) < config.circuit_breaker_window:
            return False
        fails = sum(1 for e in window if not e["success"])
        retries = sum(1 for e in window if e["invalid_json_retry"])
        return (
            fails / len(window) >= config.circuit_breaker_max_fail_rate
            or retries / len(window) >= config.circuit_breaker_max_invalid_json_rate
        )

    for m in matches:
        score = float(m[score_key])
        if score < zone.low:
            rejected.append(m)
            continue
        if score >= zone.high and not m.get(conflict_key):
            approved.append(m)
            continue

        if disabled_reason is None and call_count >= config.max_calls_per_entity_type_per_run:
            disabled_reason = "max_calls_exceeded"
        if disabled_reason is not None:
            result = _fallback_decision(fallback)
        else:
            gray_sent += 1
            call_count += 1
            try:
                result = validator(m)
            except Exception as exc:  # validator crash = llm_error REVIEW
                result = ValidationResult("REVIEW", 0.0, [str(exc)], ["llm_error"])
            error = "llm_error" in result.risk_flags
            retry = "llm_invalid_json_retry" in result.risk_flags
            error_count += int(error)
            invalid_retry_count += int(retry)
            # validators built on state/llm.LLMClient expose per-call latency
            # (reference router.py:224-226 — avg reconstructed in metrics)
            latency = getattr(validator, "last_latency_ms", None)
            if latency is not None:
                total_latency_ms += float(latency)
            window.append({"success": not error, "invalid_json_retry": retry})
            if circuit_open():
                disabled_reason = "circuit_breaker_open"

        if result.decision == "MATCH":
            approved.append(m)
            if "llm_fallback" not in result.risk_flags:
                llm_match += 1
        elif result.decision == "NO_MATCH":
            rejected.append(m)
            llm_no_match += 1
        else:
            llm_review += 1
            review_items.append(
                {
                    "entity_type": entity_type,
                    "candidate": m,
                    "decision": result.decision,
                    "confidence": result.confidence,
                    "reasons": result.reasons,
                    "risk_flags": result.risk_flags,
                    "status": "PENDING",
                }
            )

    metrics = {
        "entity_type": entity_type,
        "total_candidates": len(matches),
        "auto_match_count": len(approved) - llm_match,
        "auto_reject_count": len(rejected) - llm_no_match,
        "gray_zone_sent_count": gray_sent,
        "llm_match_count": llm_match,
        "llm_no_match_count": llm_no_match,
        "llm_review_count": llm_review,
        "llm_call_count": call_count,
        "llm_error_count": error_count,
        "llm_invalid_json_retry_count": invalid_retry_count,
        "llm_avg_latency_ms": (total_latency_ms / call_count) if call_count and total_latency_ms else None,
        "llm_fallback_mode": fallback,
        "llm_disabled_reason": disabled_reason,
    }
    return RoutingOutcome(approved, rejected, review_items, metrics)
