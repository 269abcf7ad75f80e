"""Typed catalog error model.

Mirrors the reference's canonical error values 1:1 — same ``type`` strings,
messages and HTTP-style codes (reference api/handlers/errors.go:15-67). The
engine raises these as Python exceptions; a REST facade would serialize them
as ``{"error": {"message", "type", "code"}}`` (errors.go:5-13).
"""

from __future__ import annotations


class CatalogError(Exception):
    """Base: carries the wire-format (message, type, code) triple."""

    message = "Internal Server Error"
    type = "InternalServerError"
    code = 500

    def __init__(self, detail: str | None = None):
        self.detail = detail
        super().__init__(self.message if detail is None else f"{self.message}: {detail}")

    def to_dict(self) -> dict:
        return {"error": {"message": self.message, "type": self.type, "code": self.code}}


class InternalServerError(CatalogError):
    pass


class BadRequestException(CatalogError):
    message = "Malformed request"
    type = "BadRequestException"
    code = 400


class NoSuchNamespaceException(CatalogError):
    message = "The given namespace does not exist"
    type = "NoSuchNamespaceException"
    code = 404


class NoSuchTableException(CatalogError):
    message = "The given table does not exist"
    type = "NoSuchTableException"
    code = 404


class NamespaceAlreadyExistsException(CatalogError):
    message = "The given namespace already exists"
    type = "AlreadyExistsException"
    code = 409


class TableAlreadyExistsException(CatalogError):
    message = "The given table already exists"
    type = "AlreadyExistsException"
    code = 409


class NamespaceNotEmptyException(CatalogError):
    message = "The given namespace is not empty"
    type = "NamespaceNotEmptyException"
    code = 409


class UnprocessableEntityException(CatalogError):
    message = (
        "The request cannot be processed as there is a key present multiple times"
    )
    type = "UnprocessableEntityException"
    code = 422


class NotImplementedException(CatalogError):
    message = "Not Implemented"
    type = "NotImplementedException"
    code = 501


class CommitFailedException(CatalogError):
    """Optimistic-concurrency requirement failed (HTTP 409 family)."""

    message = "Requirement failed: concurrent update"
    type = "CommitFailedException"
    code = 409
