import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from iceberg_rest_catalog_spark.session import get_spark

    return get_spark("tests", cpus=8)


@pytest.fixture(params=["fs", "sql", "rest"])
def catalog(tmp_path, request):
    """Every catalog-behavior test runs against ALL metastore backends the
    reference registers (main.go:12-14: sql, rest; glue is AWS-gated) — its
    own suite runs on the sql (sqlite) catalog (test/server_test.go:25-31).
    The rest param spins up the real HTTP facade and drives every operation
    over the wire. Backend-specific tests check ``catalog.backend``."""
    from iceberg_rest_catalog_spark.catalog import Catalog, RestCatalog, SqlCatalog

    if request.param == "fs":
        yield Catalog(str(tmp_path / "warehouse"))
        return
    if request.param == "sql":
        yield SqlCatalog(str(tmp_path / "warehouse"), str(tmp_path / "catalog.db"))
        return
    from iceberg_rest_catalog_spark.catalog.rest import serve

    backing = Catalog(str(tmp_path / "warehouse"))
    srv, base = serve(backing)
    try:
        yield RestCatalog(base, str(tmp_path / "warehouse"))
    finally:
        srv.shutdown()
