"""API contract tests mirroring the reference's
tests/test_api_contract.py:7-42 (OpenAPI path/method/200 presence, /health
response shape) plus live auth + lookup round-trips over a real pipeline
output directory."""

import json
import shutil
import urllib.error
import urllib.request

import pytest

from entity_resolution_engine_ray.api import UESApiServer, openapi_schema


def test_openapi_contract_contains_expected_paths():
    schema = openapi_schema()
    assert schema["info"]["title"] == "Unified Entity Store API"
    paths = schema["paths"]
    expected = {
        "/health": {"get"},
        "/mapping/run": {"post"},
        "/ues/entity/{ues_id}": {"get"},
        "/lookup/entity/by-url": {"get"},
        "/ues/entity/{ues_id}/lineage": {"get"},
        "/validation/reviews": {"get"},
        "/monitoring/summary": {"get"},
        "/monitoring/gates": {"get"},
    }
    for path, methods in expected.items():
        assert path in paths
        for method in methods:
            assert method in paths[path]
            assert "200" in paths[path][method]["responses"]


def _get(url, key=None, method="GET"):
    req = urllib.request.Request(url, method=method)
    if key:
        req.add_header("X-Internal-API-Key", key)
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status, json.loads(resp.read())


@pytest.fixture(scope="module")
def api_server(ray_session, tmp_path_factory, monkeypatch_module):
    from entity_resolution_engine_ray.pipelines.pages_er import run_pages_er
    from entity_resolution_engine_ray.sources.pages import write_pages_fixture

    fix = write_pages_fixture("/tmp/er_api_fixture", 300, seed=42)
    out = "/tmp/er_api_out"
    shutil.rmtree(out, ignore_errors=True)
    res = run_pages_er(fix["pages"], out)
    monkeypatch_module.setenv("UES_INTERNAL_API_KEY", "sekrit")
    server = UESApiServer(out, pages_path=fix["pages"]).start()
    yield server, res
    server.stop()


@pytest.fixture(scope="module")
def monkeypatch_module():
    mp = pytest.MonkeyPatch()
    yield mp
    mp.undo()


def test_health_contract_response_shape(api_server):
    server, _ = api_server
    status, body = _get(f"http://127.0.0.1:{server.port}/health")
    assert status == 200
    assert body == {"status": "ok"}


def test_auth_required_and_entity_roundtrip(api_server):
    server, res = api_server
    base = f"http://127.0.0.1:{server.port}"
    ent = res["entities"].take(1)[0]

    # no key → 401
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(f"{base}/ues/entity/{ent['entity_id']}")
    assert exc.value.code == 401

    status, body = _get(f"{base}/ues/entity/{ent['entity_id']}", key="sekrit")
    assert status == 200 and body["canonical_url"] == ent["canonical_url"]

    from urllib.parse import quote

    status, via_url = _get(
        f"{base}/lookup/entity/by-url?url={quote(ent['canonical_url'], safe='')}",
        key="sekrit",
    )
    assert status == 200 and via_url["entity_id"] == ent["entity_id"]

    status, lineage = _get(f"{base}/ues/entity/{ent['entity_id']}/lineage", key="sekrit")
    assert status == 200 and len(lineage) == ent["n_members"]

    # unknown entity → 404
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(f"{base}/ues/entity/NOPE", key="sekrit")
    assert exc.value.code == 404


def test_review_queue_and_monitoring(api_server):
    server, res = api_server
    base = f"http://127.0.0.1:{server.port}"
    from entity_resolution_engine_ray.state.lookups import ReviewQueue

    ReviewQueue(server.out_dir).add("rv1", {"entity_type": "page"})
    status, items = _get(f"{base}/validation/reviews?status=PENDING", key="sekrit")
    assert status == 200 and items[0]["id"] == "rv1"
    status, body = _get(f"{base}/validation/reviews/rv1/approve", key="sekrit", method="POST")
    assert status == 200 and body["status"] == "APPROVED"
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(f"{base}/validation/reviews/nope/reject", key="sekrit", method="POST")
    assert exc.value.code == 404

    status, summary = _get(f"{base}/monitoring/summary?run_id={res['run_id']}", key="sekrit")
    assert status == 200
    assert summary["totals"]["total_candidates"] > 0
    assert summary["review_counts"].get("APPROVED") == 1

    status, gates = _get(f"{base}/monitoring/gates?run_id={res['run_id']}", key="sekrit")
    assert status == 200 and gates["status"] in ("PASS", "FAIL")
