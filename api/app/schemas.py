"""Response schemas (analog of the reference's api/app/schemas.py pydantic models)."""

from pydantic import BaseModel, Field

__all__ = ["ClsCandidate", "Status"]


class ClsCandidate(BaseModel):
    """Classification result."""

    value: str = Field(..., json_schema_extra={"example": "church"})
    confidence: float = Field(..., ge=0, le=1)


class Status(BaseModel):
    """Healthcheck payload."""

    status: str
    project: str
    version: str
