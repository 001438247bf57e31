"""Live-wire LLM transport tests over a loopback HTTP server.

The injected-transport tests (test_llm_validation.py) pin the client's
semantics; these pin the REAL stdlib ``http_transport``
(state/llm.py:http_transport — the reference POSTs the same payload via
httpx, validation/llm_client.py:110-113) end-to-end over an actual socket:
request shape on the wire, all three response formats, the invalid-JSON
retry with the literal preamble, the 12 s-budget timeout, non-2xx → the
standard request-failure path, and validate_pair's REVIEW+llm_error
fallback when the server misbehaves.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from entity_resolution_engine_ray.state.llm import (
    _RETRY_PREAMBLE,
    LLMClient,
    http_transport,
    validate_pair,
)


class _Script:
    """Per-test response script + captured request payloads."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.requests: list[dict] = []
        self.lock = threading.Lock()


@pytest.fixture()
def llm_server():
    script = _Script([])

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            with script.lock:
                script.requests.append(
                    {"payload": json.loads(body), "headers": dict(self.headers)}
                )
                step = script.responses.pop(0) if script.responses else {"status": 500, "body": ""}
            if step.get("sleep"):
                time.sleep(step["sleep"])
            status = step.get("status", 200)
            data = step.get("body", "")
            if isinstance(data, dict):
                data = json.dumps(data)
            raw = data.encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def log_message(self, *a):  # quiet
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}/v1/chat/completions"
    try:
        yield script, url
    finally:
        server.shutdown()
        server.server_close()


def _content(decision="MATCH", conf=0.9):
    return json.dumps(
        {"decision": decision, "confidence": conf, "reasons": [], "risk_flags": []}
    )


def test_wire_request_shape_and_three_formats(llm_server):
    script, url = llm_server
    script.responses = [
        {"body": {"content": _content("MATCH")}},
        {"body": {"choices": [{"message": {"content": _content("NO_MATCH")}}]}},
        {"body": {"choices": [{"text": _content("REVIEW")}]}},
    ]
    client = LLMClient(http_transport(url, api_key="k-123"), model="validator")
    for want in ("MATCH", "NO_MATCH", "REVIEW"):
        assert client.request_json("sys", "user")["decision"] == want
        assert client.last_latency_ms is not None and client.last_latency_ms >= 0
    # on-the-wire payload shape (reference request contract) + auth header
    first = script.requests[0]
    assert first["payload"]["model"] == "validator"
    assert first["payload"]["temperature"] == 0
    assert [m["role"] for m in first["payload"]["messages"]] == ["system", "user"]
    assert first["headers"]["Authorization"] == "Bearer k-123"
    assert first["headers"]["Content-Type"] == "application/json"


def test_wire_invalid_json_retry_with_preamble(llm_server):
    script, url = llm_server
    script.responses = [
        {"body": {"content": "not json at all"}},
        {"body": {"content": _content("MATCH", 0.8)}},
    ]
    client = LLMClient(http_transport(url))
    out = client.request_json("sys", "user prompt")
    assert out["decision"] == "MATCH"
    assert client.last_invalid_json_retry is True
    assert len(script.requests) == 2
    retry_user = script.requests[1]["payload"]["messages"][1]["content"]
    assert retry_user.startswith(_RETRY_PREAMBLE)
    assert retry_user.endswith("user prompt")


def test_wire_timeout_budget_enforced(llm_server):
    script, url = llm_server
    script.responses = [{"sleep": 3.0, "body": {"content": _content()}}]
    client = LLMClient(http_transport(url), timeout_s=0.4)
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="LLM request failed"):
        client.request_json("sys", "user", retry_on_invalid_json=False)
    # the socket timeout fired well before the server's 3 s sleep finished
    assert time.monotonic() - t0 < 2.0


def test_wire_non_2xx_is_request_failure(llm_server):
    script, url = llm_server
    script.responses = [{"status": 503, "body": {"error": "overloaded"}}]
    client = LLMClient(http_transport(url))
    with pytest.raises(ValueError, match="LLM request failed"):
        client.request_json("sys", "user", retry_on_invalid_json=False)


def test_wire_validate_pair_fallback_review_on_server_error(llm_server):
    script, url = llm_server
    script.responses = [
        {"status": 500, "body": ""},
        {"status": 500, "body": ""},
    ]
    client = LLMClient(http_transport(url))
    result = validate_pair(
        "page",
        {"id": "a", "name": "alpha"},
        {"id": "b", "name": "beta"},
        0.8,
        {"conflict_flags": []},
        client,
    )
    assert result.decision == "REVIEW"
    assert "llm_error" in result.risk_flags


def test_wire_validate_pair_end_to_end(llm_server):
    script, url = llm_server
    script.responses = [{"body": {"content": _content("MATCH", 0.93)}}]
    client = LLMClient(http_transport(url))
    result = validate_pair(
        "page", {"id": "a"}, {"id": "b"}, 0.8, {"conflict_flags": []}, client
    )
    assert result.decision == "MATCH"
    assert result.confidence == pytest.approx(0.93)
    # the user prompt carried the pair JSON over the wire
    sent = script.requests[0]["payload"]["messages"][1]["content"]
    assert '"a"' in sent and '"b"' in sent
