"""API request/response schemas (reference: rag_service/api/models.py:4-10)."""

from pydantic import BaseModel, Field


class QueryRequest(BaseModel):
    query: str = Field(max_length=100_000)
    # k is clamped server-side to the engine's compiled max_k; validation here
    # rejects nonsense before it reaches the queue
    k: int = Field(default=2, ge=1, le=1024)
    # optional per-request generation budget; clamped server-side to the
    # engine's MAX_NEW_TOKENS cap (the compiled decode length). None = cap.
    max_new_tokens: int | None = Field(default=None, ge=1, le=1024)


class QueryResponse(BaseModel):
    query: str
    result: str
