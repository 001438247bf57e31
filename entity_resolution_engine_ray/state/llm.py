"""LLM validation client — reference semantics, transport-injectable.

Mirrors ``validation/llm_client.py:15-139`` and ``llm_validator.py:20-80``
without any network dependency (none exists in this environment): the HTTP
POST becomes an injected ``transport(payload, timeout_s) -> response_dict``
callable. Everything around it is preserved exactly:

- request shape: ``{model, temperature: 0, messages: [system, user]}``
- default timeout 12 s (passed to the transport, which is responsible for
  honoring it — httpx did in the reference)
- three accepted response formats (llm_client.py:48-62):
  ``{"content": str}``, OpenAI ``{"choices":[{"message":{"content":str}}]}``,
  and ``{"choices":[{"text": str}]}``
- one retry on invalid JSON with the literal retry preamble
  (llm_client.py:80-90); latency ACCUMULATES across the retry; the
  ``last_invalid_json_retry`` flag feeds the router's circuit breaker
- per-call latency tracking (``last_latency_ms``) and request ids
- ``validate_pair``: JSON prompt with the response schema, REVIEW +
  ``llm_error`` on any failure (llm_validator.py:69-80)
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Any, Callable

from entity_resolution_engine_ray.state.router import ValidationResult

SYSTEM_PROMPT = (
    "You are a strict entity-resolution validator. "
    "Return JSON with decision MATCH, NO_MATCH, or REVIEW."
)

_RETRY_PREAMBLE = "Return valid JSON only. Do not include commentary or markdown."

# transport: (request_payload, timeout_s) -> response body dict
Transport = Callable[[dict, float], dict]


class LLMClient:
    def __init__(
        self,
        transport: Transport,
        model: str = "validator",
        timeout_s: float = 12.0,
    ) -> None:
        self.transport = transport
        self.model = model
        self.timeout_s = timeout_s
        self.last_invalid_json_retry = False
        self.last_latency_ms: float | None = None
        self.last_request_id: str | None = None

    @staticmethod
    def _extract_content(data: dict[str, Any]) -> str | None:
        if isinstance(data.get("content"), str):
            return data["content"]
        choices = data.get("choices")
        if isinstance(choices, list) and choices:
            first = choices[0]
            if isinstance(first, dict):
                message = first.get("message")
                if isinstance(message, dict) and isinstance(message.get("content"), str):
                    return message["content"]
                if isinstance(first.get("text"), str):
                    return first["text"]
        return None

    def _send_request(self, system_prompt: str, user_prompt: str, request_id: str) -> str:
        payload = {
            "model": self.model,
            "temperature": 0,
            "messages": [
                {"role": "system", "content": system_prompt},
                {"role": "user", "content": user_prompt},
            ],
        }
        start = time.monotonic()
        try:
            data = self.transport(payload, self.timeout_s)
        except Exception as exc:
            raise ValueError(f"LLM request failed request_id={request_id}") from exc
        finally:
            self.last_latency_ms = (time.monotonic() - start) * 1000
        content = self._extract_content(data) if isinstance(data, dict) else None
        if content is None:
            keys = sorted(data.keys()) if isinstance(data, dict) else []
            raise ValueError(
                f"Unexpected LLM response format request_id={request_id} keys={keys}"
            )
        return content

    def request_json(
        self, system_prompt: str, user_prompt: str, retry_on_invalid_json: bool = True
    ) -> dict[str, Any]:
        request_id = str(uuid.uuid4())
        self.last_request_id = request_id
        self.last_invalid_json_retry = False
        text = self._send_request(system_prompt, user_prompt, request_id)
        first_latency = self.last_latency_ms or 0.0
        try:
            return json.loads(text)
        except json.JSONDecodeError as exc:
            if not retry_on_invalid_json:
                raise ValueError(f"Invalid JSON response request_id={request_id}") from exc
            self.last_invalid_json_retry = True
            text = self._send_request(
                system_prompt, f"{_RETRY_PREAMBLE}\n\n{user_prompt}", request_id
            )
            self.last_latency_ms = first_latency + (self.last_latency_ms or 0.0)
            try:
                return json.loads(text)
            except json.JSONDecodeError as retry_exc:
                raise ValueError(
                    f"Invalid JSON response request_id={request_id}"
                ) from retry_exc


def _parse_result(data: dict[str, Any]) -> ValidationResult:
    decision = data.get("decision")
    if decision not in ("MATCH", "NO_MATCH", "REVIEW"):
        raise ValueError(f"invalid decision {decision!r}")
    return ValidationResult(
        decision=decision,
        confidence=float(data.get("confidence") or 0.0),
        reasons=list(data.get("reasons") or []),
        risk_flags=list(data.get("risk_flags") or []),
    )


def validate_pair(
    entity_type: str,
    left: dict[str, Any],
    right: dict[str, Any],
    matcher_score: float,
    signals: dict[str, Any],
    client: LLMClient,
) -> ValidationResult:
    """JSON-prompt validation of one candidate pair (llm_validator.py:20-80):
    REVIEW + ``llm_error`` on ANY failure; the invalid-JSON-retry flag is
    appended so the router's circuit breaker sees it."""
    payload = {
        "entity_type": entity_type,
        "matcher_score": matcher_score,
        "left": left,
        "right": right,
        "signals": signals,
        "response_schema": {
            "decision": "MATCH|NO_MATCH|REVIEW",
            "confidence": "0..1",
            "reasons": "list[str]",
            "risk_flags": "list[str]",
        },
    }
    user_prompt = json.dumps(payload, sort_keys=True, default=str)
    try:
        response = client.request_json(SYSTEM_PROMPT, user_prompt)
        result = _parse_result(response)
        if client.last_invalid_json_retry and "llm_invalid_json_retry" not in result.risk_flags:
            result.risk_flags.append("llm_invalid_json_retry")
        return result
    except Exception:
        return ValidationResult(
            decision="REVIEW",
            confidence=0.0,
            reasons=["LLM validation failed"],
            risk_flags=["llm_error"],
        )


class LLMValidatorAdapter:
    """Bridges ``state/router.route_matches`` (validator callable over match
    dicts) to ``validate_pair``. Exposes ``last_latency_ms`` so the router
    can aggregate ``llm_avg_latency_ms`` (reference router.py:224-226)."""

    def __init__(self, client: LLMClient, entity_type: str, id_keys: tuple[str, str] = ("left_id", "right_id")):
        self.client = client
        self.entity_type = entity_type
        self.id_keys = id_keys

    @property
    def last_latency_ms(self) -> float | None:
        return self.client.last_latency_ms

    def __call__(self, match: dict[str, Any]) -> ValidationResult:
        lk, rk = self.id_keys
        left = {"id": str(match.get(lk, ""))}
        right = {"id": str(match.get(rk, ""))}
        signals = {
            k: v
            for k, v in match.items()
            if k not in (lk, rk) and not isinstance(v, (dict, bytes))
        }
        return validate_pair(
            self.entity_type,
            left,
            right,
            float(match.get("confidence") or match.get("score") or 0.0),
            signals,
            self.client,
        )


def http_transport(url: str, api_key: str | None = None, extra_headers: dict | None = None) -> Transport:
    """OPTIONAL stdlib HTTP transport for an OpenAI-compatible chat endpoint
    (reference validation/llm_client.py:110-113 does the same POST via
    httpx). Never constructed by default — this sandbox has no network; wire
    it explicitly where an endpoint exists::

        client = LLMClient(http_transport("https://host/v1/chat/completions",
                                          api_key=os.environ["KEY"]))

    The client's 12 s budget is honored: ``timeout_s`` is passed straight to
    ``urlopen``. Raises on non-2xx / invalid-JSON bodies, which the client
    surfaces as the standard request-failure path."""
    import urllib.request

    def transport(payload: dict, timeout_s: float) -> dict:
        headers = {"Content-Type": "application/json"}
        if api_key:
            headers["Authorization"] = f"Bearer {api_key}"
        if extra_headers:
            headers.update(extra_headers)
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode("utf-8"), headers=headers, method="POST"
        )
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return json.loads(resp.read().decode("utf-8"))

    return transport
