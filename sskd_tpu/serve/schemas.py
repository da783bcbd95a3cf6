"""API request/response schemas (reference: src/serve/schemas.py:8-135,
field-for-field including bounds)."""

from __future__ import annotations

from pydantic import BaseModel, Field


class SearchRequest(BaseModel):
    query: str = Field(min_length=1, max_length=1000)
    k: int = Field(default=10, ge=1, le=100)
    rerank: bool = False
    rerank_top_k: int = Field(default=50, ge=1, le=200)


class SearchResult(BaseModel):
    doc_id: str
    text: str | None = None
    score: float
    rank: int


class SearchResponse(BaseModel):
    query: str
    results: list[SearchResult]
    total_results: int
    reranked: bool
    hybrid: bool = False  # BM25+semantic fusion ran (TPU-build addition)
    latency_ms: float


class EncodeRequest(BaseModel):
    texts: list[str] = Field(min_length=1, max_length=100)
    normalize: bool = True


class EncodeResponse(BaseModel):
    embeddings: list[list[float]]
    dimension: int
    num_texts: int
    latency_ms: float


class IndexLoadRequest(BaseModel):
    index_dir: str = Field(min_length=1)


class HealthResponse(BaseModel):
    status: str
    model_loaded: bool
    index_loaded: bool
    index_size: int
    version: str


class ErrorResponse(BaseModel):
    error: str
    message: str
    details: dict = Field(default_factory=dict)
