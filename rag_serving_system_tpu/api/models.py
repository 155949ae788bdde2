"""API request/response schemas (reference: rag_service/api/models.py:4-10)."""

from pydantic import BaseModel


class QueryRequest(BaseModel):
    query: str
    k: int = 2


class QueryResponse(BaseModel):
    query: str
    result: str
