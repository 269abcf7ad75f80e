import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from iceberg_rest_catalog_spark.session import get_spark

    return get_spark("tests", cpus=8)


@pytest.fixture()
def catalog(tmp_path):
    from iceberg_rest_catalog_spark.catalog import Catalog

    return Catalog(str(tmp_path / "warehouse"))
