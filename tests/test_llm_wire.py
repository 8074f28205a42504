"""Real-endpoint smoke for the LLM client factory (VERDICT r4 next #9):
exercise the non-fake OpenAI-compatible wire path end-to-end against a
local stdlib http.server stub — request construction, auth header, JSON
payload shape, and response parsing — with no network access."""

from __future__ import annotations

import json
import threading

import pytest


@pytest.fixture()
def stub_server():
    from http.server import BaseHTTPRequestHandler, HTTPServer

    captured: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (stdlib casing)
            body = json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            captured.append(
                {
                    "path": self.path,
                    "auth": self.headers.get("Authorization"),
                    "content_type": self.headers.get("Content-Type"),
                    "body": body,
                }
            )
            resp = json.dumps(
                {
                    "choices": [
                        {"message": {"content": f"stub summary of {body['model']}"}}
                    ]
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):  # silence per-request stderr lines
            pass

    try:
        srv = HTTPServer(("127.0.0.1", 0), Handler)
    except OSError:
        pytest.skip("sockets unavailable in this sandbox")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}/v1/chat/completions", captured
    finally:
        srv.shutdown()
        srv.server_close()


def test_openai_compatible_wire_roundtrip(stub_server, monkeypatch):
    url, captured = stub_server
    monkeypatch.setenv("GRAFT_LLM_API_KEY", "test-key-123")
    monkeypatch.setenv("GRAFT_LLM_API_URL", url)
    monkeypatch.setenv("GRAFT_LLM_MODEL", "stub-model")

    from clangd_to_neo4j_ray.functions.llm_client import get_llm_client

    client = get_llm_client("openai")
    out = client.summarize("page:x", None, "some document text")
    assert out == "stub summary of stub-model"

    # leaf prompt shape
    req = captured[-1]
    assert req["auth"] == "Bearer test-key-123"
    assert req["content_type"] == "application/json"
    assert req["body"]["model"] == "stub-model"
    msgs = req["body"]["messages"]
    assert msgs[0]["role"] == "user" and "some document text" in msgs[0]["content"]

    # rollup prompt shape (children joined sorted)
    out2 = client.summarize("domain:d", ["s-b", "s-a"], None)
    assert out2 == "stub summary of stub-model"
    assert "s-a\n- s-b" in captured[-1]["body"]["messages"][0]["content"]


def test_openai_client_requires_key(monkeypatch):
    monkeypatch.delenv("GRAFT_LLM_API_KEY", raising=False)
    from clangd_to_neo4j_ray.functions.llm_client import get_llm_client

    with pytest.raises(ValueError, match="GRAFT_LLM_API_KEY"):
        get_llm_client("openai")
