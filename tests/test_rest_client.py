"""RestCatalog-specific behavior not covered by the shared backend matrix.

The shared ``catalog`` fixture already drives every behavioral test through
a RestCatalog over a live facade; these tests pin down the client's own
contract: version parsing against a sql-backed server (uuid-suffixed
metadata filenames), optimistic-concurrency conflicts between two
independent clients of one server (the reference's CommitTable contract,
tables.go:150-227), and the backend registry entry (main.go:12-14).
"""

import pytest

from iceberg_rest_catalog_spark.catalog import (
    Catalog,
    NestedField,
    RestCatalog,
    Schema,
    SqlCatalog,
)
from iceberg_rest_catalog_spark.catalog import errors as E
from iceberg_rest_catalog_spark.catalog.rest import serve

SCHEMA = Schema(0, [NestedField(1, "id", "long", required=True)])


@pytest.fixture
def sql_server(tmp_path):
    backing = SqlCatalog(str(tmp_path / "wh"), str(tmp_path / "catalog.db"))
    srv, base = serve(backing)
    yield base, str(tmp_path / "wh")
    srv.shutdown()


def test_version_parse_against_sql_backend(sql_server):
    """sql-backed servers name metadata v{N}-{uuid8}.metadata.json; the
    client must still recover the numeric version for its Table handle."""
    base, wh = sql_server
    cat = RestCatalog(base, wh)
    cat.create_namespace(("db",))
    t = cat.create_table(("db", "t"), SCHEMA)
    assert t.version == 1
    t2 = cat.update_table(
        ("db", "t"), [], [{"action": "set-properties", "updates": {"k": "v"}}]
    )
    assert t2.version == 2 and t2.properties()["k"] == "v"
    assert "-" in t2.metadata_location.rsplit("/", 1)[-1]  # uuid suffix survives


def test_two_clients_cas_conflict(tmp_path):
    """Two independent REST clients race a commit on one server: the loser
    gets the reference's CommitFailedException, and a retry against fresh
    state succeeds (requirements re-validated server-side)."""
    backing = Catalog(str(tmp_path / "wh"))
    srv, base = serve(backing)
    try:
        a = RestCatalog(base, str(tmp_path / "wh"))
        b = RestCatalog(base, str(tmp_path / "wh"))
        a.create_namespace(("db",))
        a.create_table(("db", "t"), SCHEMA)
        uuid_ = a.load_table(("db", "t")).metadata["table-uuid"]
        req = [{"type": "assert-ref-snapshot-id", "snapshot-id": None}]
        upd = [{"action": "set-properties", "updates": {"who": "a"}}]
        a.update_table(("db", "t"), req, upd)
        # b's requirement was computed before a's commit: must now fail
        with pytest.raises(E.CommitFailedException):
            b.update_table(
                ("db", "t"),
                [{"type": "assert-table-uuid", "uuid": "not-" + uuid_}],
                [{"action": "set-properties", "updates": {"who": "b"}}],
            )
        # retry with re-read state converges
        t = b.update_table(
            ("db", "t"),
            [{"type": "assert-table-uuid", "uuid": uuid_}],
            [{"action": "set-properties", "updates": {"who": "b"}}],
        )
        assert t.properties()["who"] == "b" and t.version == 3
    finally:
        srv.shutdown()


def test_backend_registry_opens_rest(tmp_path):
    from iceberg_rest_catalog_spark.catalog.sql_catalog import open_catalog

    backing = Catalog(str(tmp_path / "wh"))
    srv, base = serve(backing)
    try:
        cat = open_catalog(
            {"type": "rest", "uri": base, "warehouse": str(tmp_path / "wh")}
        )
        assert cat.backend == "rest" and cat.health() == {"status": "ok"}
    finally:
        srv.shutdown()
    with pytest.raises(E.NotImplementedException):
        open_catalog({"type": "glue"})
