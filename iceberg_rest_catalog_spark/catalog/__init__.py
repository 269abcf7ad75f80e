"""Catalog surface: the reference's entire executed behavior (SURVEY §2.A).

Namespace/table CRUD, versioned table metadata, optimistic CAS commits and
the reference's exact typed error model, re-expressed as a library API over
a warehouse directory plus Spark DataFrames for the data plane.
"""

from . import errors
from .catalog import Catalog, Table
from .rest_client import RestCatalog
from .schema import NestedField, Schema
from .sql_catalog import SqlCatalog

__all__ = [
    "Catalog",
    "RestCatalog",
    "SqlCatalog",
    "Table",
    "Schema",
    "NestedField",
    "errors",
]
