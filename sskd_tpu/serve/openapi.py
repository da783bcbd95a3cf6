"""OpenAPI 3.1 spec + human-readable /docs page.

The reference's FastAPI app auto-published ``/openapi.json`` and a Swagger
``/docs`` UI (reference: src/serve/app.py:152-157 — FastAPI(title=...,
version=...)); its middleware (and ours, serve/middleware.py) already
exempts both paths from auth and rate limiting. This module generates the
spec straight from the pydantic request/response models in
``serve/schemas.py`` and renders a dependency-free HTML page — no CDN
assets, this stack serves in zero-egress environments.
"""

from __future__ import annotations

import html
import json
from typing import Any

from pydantic.json_schema import models_json_schema

from sskd_tpu.serve.schemas import (
    EncodeRequest,
    EncodeResponse,
    ErrorResponse,
    HealthResponse,
    IndexLoadRequest,
    SearchRequest,
    SearchResponse,
)

_REF_TEMPLATE = "#/components/schemas/{model}"


def _ref(model: type) -> dict[str, str]:
    return {"$ref": _REF_TEMPLATE.format(model=model.__name__)}


def _json_body(model: type) -> dict[str, Any]:
    return {
        "required": True,
        "content": {"application/json": {"schema": _ref(model)}},
    }


def _response(description: str, model: type | None = None) -> dict[str, Any]:
    out: dict[str, Any] = {"description": description}
    if model is not None:
        out["content"] = {"application/json": {"schema": _ref(model)}}
    return out


_ERROR_RESPONSES = {
    "422": _response("validation error", ErrorResponse),
    "429": _response("rate limited", ErrorResponse),
    "503": _response("not ready / index not loaded", ErrorResponse),
}


def build_openapi(
    version: str,
    *,
    metrics_path: str | None = None,
    cache_flush: bool = False,
    auth_enabled: bool = False,
) -> dict[str, Any]:
    """Build the spec for the routes ``create_app`` actually registered —
    conditional routes (/metrics, /cache/flush) appear only when enabled,
    so the published contract matches the live route table."""
    models = [
        SearchRequest,
        SearchResponse,
        EncodeRequest,
        EncodeResponse,
        IndexLoadRequest,
        HealthResponse,
        ErrorResponse,
    ]
    _, defs = models_json_schema(
        [(m, "validation") for m in models], ref_template=_REF_TEMPLATE
    )
    paths: dict[str, Any] = {
        "/": {
            "get": {
                "summary": "Service info: version, environment, endpoint list",
                "responses": {"200": _response("service info")},
            }
        },
        "/health": {
            "get": {
                "summary": "Liveness + load state",
                "responses": {"200": _response("health", HealthResponse)},
            }
        },
        "/ready": {
            "get": {
                "summary": "Readiness gate (503 until the model is up)",
                "responses": {
                    "200": _response("ready"),
                    "503": _response("not ready", ErrorResponse),
                },
            }
        },
        "/live": {
            "get": {
                "summary": "Bare liveness probe",
                "responses": {"200": _response("alive")},
            }
        },
        "/search": {
            "post": {
                "summary": "Semantic top-k search (optional cross-encoder "
                "rerank, hybrid BM25 fusion, result cache)",
                "requestBody": _json_body(SearchRequest),
                "responses": {
                    "200": _response("ranked results", SearchResponse),
                    **_ERROR_RESPONSES,
                },
            }
        },
        "/encode": {
            "post": {
                "summary": "Embed texts with the student bi-encoder",
                "requestBody": _json_body(EncodeRequest),
                "responses": {
                    "200": _response("embeddings", EncodeResponse),
                    **_ERROR_RESPONSES,
                },
            }
        },
        "/index/load": {
            "post": {
                "summary": "Hot-swap the served index from a directory",
                "requestBody": _json_body(IndexLoadRequest),
                "responses": {
                    "200": _response("index loaded"),
                    "400": _response("bad index dir", ErrorResponse),
                    **_ERROR_RESPONSES,
                },
            }
        },
    }
    if metrics_path:
        paths[metrics_path] = {
            "get": {
                "summary": "Prometheus text exposition",
                "responses": {"200": {"description": "metrics text"}},
            }
        }
    if cache_flush:
        paths["/cache/flush"] = {
            "post": {
                "summary": "Flush the query-result and embedding caches",
                "responses": {"200": _response("flushed")},
            }
        }
    spec: dict[str, Any] = {
        "openapi": "3.1.0",
        "info": {
            "title": "Semantic Search API",
            "description": "Production-grade semantic search with "
            "knowledge distillation (TPU-native serving stack)",
            "version": version,
        },
        "paths": paths,
        "components": {"schemas": defs.get("$defs", defs)},
    }
    if auth_enabled:
        spec["components"]["securitySchemes"] = {
            "ApiKeyAuth": {"type": "apiKey", "in": "header", "name": "X-API-Key"}
        }
        spec["security"] = [{"ApiKeyAuth": []}]
    return spec


def render_docs_html(spec: dict[str, Any]) -> str:
    """Dependency-free API docs: endpoints with method badges, request /
    response schema tables, and the raw spec — all rendered server-side
    (Swagger UI's CDN assets are unavailable with zero egress)."""
    info = spec["info"]
    rows: list[str] = []
    for path, methods in spec["paths"].items():
        for method, op in methods.items():
            req = op.get("requestBody", {})
            req_ref = (
                req.get("content", {})
                .get("application/json", {})
                .get("schema", {})
                .get("$ref", "")
            )
            req_name = req_ref.rsplit("/", 1)[-1] if req_ref else "—"
            resps = ", ".join(sorted(op.get("responses", {}))) or "—"
            rows.append(
                f"<tr><td class='m {method}'>{method.upper()}</td>"
                f"<td><code>{html.escape(path)}</code></td>"
                f"<td>{html.escape(op.get('summary', ''))}</td>"
                f"<td>{html.escape(req_name)}</td>"
                f"<td>{html.escape(resps)}</td></tr>"
            )
    schemas = spec.get("components", {}).get("schemas", {})
    schema_blocks = "\n".join(
        f"<details><summary><code>{html.escape(name)}</code></summary>"
        f"<pre>{html.escape(json.dumps(body, indent=2))}</pre></details>"
        for name, body in sorted(schemas.items())
    )
    return f"""<!doctype html>
<html><head><meta charset="utf-8">
<title>{html.escape(info["title"])} — API docs</title>
<style>
 body {{ font: 15px/1.5 system-ui, sans-serif; margin: 2rem auto;
        max-width: 60rem; padding: 0 1rem; color: #1a1a1a; }}
 table {{ border-collapse: collapse; width: 100%; }}
 td, th {{ border-bottom: 1px solid #ddd; padding: .4rem .6rem;
          text-align: left; vertical-align: top; }}
 .m {{ font-weight: 700; }} .get {{ color: #0b7285; }}
 .post {{ color: #5f3dc4; }}
 pre {{ background: #f6f6f6; padding: .8rem; overflow-x: auto; }}
 details {{ margin: .4rem 0; }}
</style></head><body>
<h1>{html.escape(info["title"])}</h1>
<p>{html.escape(info.get("description", ""))} —
version {html.escape(info["version"])}.
Machine-readable spec: <a href="/openapi.json">/openapi.json</a></p>
<table><tr><th></th><th>path</th><th>summary</th><th>request body</th>
<th>responses</th></tr>
{chr(10).join(rows)}
</table>
<h2>Schemas</h2>
{schema_blocks}
</body></html>"""
