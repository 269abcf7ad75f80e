import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from iceberg_rest_catalog_spark.session import get_spark

    return get_spark("tests", cpus=8)


@pytest.fixture(params=["fs", "sql"])
def catalog(tmp_path, request):
    """Every catalog-behavior test runs against BOTH metastore backends —
    the reference's own suite runs on its sql (sqlite) catalog
    (test/server_test.go:25-31). Backend-specific tests check
    ``catalog.backend``."""
    from iceberg_rest_catalog_spark.catalog import Catalog, SqlCatalog

    if request.param == "fs":
        return Catalog(str(tmp_path / "warehouse"))
    return SqlCatalog(str(tmp_path / "warehouse"), str(tmp_path / "catalog.db"))
