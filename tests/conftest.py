import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from iceberg_rest_catalog_spark.session import get_spark

    return get_spark("tests", cpus=8)


def make_catalog(kind: str, tmp_path):
    """Yield a catalog for one backend kind (shared by the fixtures below).

    ``s3`` runs the fs catalog protocol against :class:`S3FileIO` over the
    in-memory S3 client — genuine object-store semantics (conditional-put
    create_exclusive, prefix listings, copy+delete rename) with no network;
    metadata-plane only, since Spark cannot read the fake s3:// URIs."""
    from iceberg_rest_catalog_spark.catalog import Catalog, RestCatalog, SqlCatalog

    if kind == "fs":
        yield Catalog(str(tmp_path / "warehouse"))
        return
    if kind == "sql":
        yield SqlCatalog(str(tmp_path / "warehouse"), str(tmp_path / "catalog.db"))
        return
    if kind == "s3":
        from iceberg_rest_catalog_spark.catalog.fileio import (
            InMemoryS3Client,
            S3FileIO,
        )

        yield Catalog(
            "s3://test-bucket/warehouse", fileio=S3FileIO(client=InMemoryS3Client())
        )
        return
    from iceberg_rest_catalog_spark.catalog.rest import serve

    backing = Catalog(str(tmp_path / "warehouse"))
    srv, base = serve(backing)
    try:
        yield RestCatalog(base, str(tmp_path / "warehouse"))
    finally:
        srv.shutdown()


@pytest.fixture(params=["fs", "sql", "rest"])
def catalog(tmp_path, request):
    """Every catalog-behavior test runs against ALL metastore backends the
    reference registers (main.go:12-14: sql, rest; glue is AWS-gated) — its
    own suite runs on the sql (sqlite) catalog (test/server_test.go:25-31).
    The rest param spins up the real HTTP facade and drives every operation
    over the wire. Backend-specific tests check ``catalog.backend``.
    tests/test_catalog.py overrides this fixture to ALSO run the whole
    metadata-plane suite over the s3 (object-store FileIO) backend."""
    yield from make_catalog(request.param, tmp_path)
