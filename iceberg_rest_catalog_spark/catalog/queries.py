"""Driver-visible catalog operators (SURVEY §2.A — one query per c_* id).

Catalog operations are behavioral, not relational, so each query executes a
scripted round-trip (mirroring the reference's end-to-end test sequences,
test/server_test.go:60-346) against a scratch warehouse and returns the
outcomes as deterministic (step, result) rows. The oracle is the expected
constant table — the driver's value-hash check then verifies the BEHAVIOR,
including the exact error-type strings of the reference's error model
(api/handlers/errors.go:15-67).
"""

from __future__ import annotations

import os
import shutil

from ..operators.common import scratch_dir
from ..registry import query
from . import errors as E
from .catalog import Catalog
from .schema import NestedField, Schema

_SCHEMA = Schema(
    0,
    [
        NestedField(1, "id", "long", required=True),
        NestedField(2, "name", "string", required=False),
        NestedField(3, "created_at", "timestamp", required=False),
    ],
)


def _fresh(sf_dir: str, name: str) -> Catalog:
    d = scratch_dir(sf_dir, "catalog", name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return Catalog(d)


def _df(spark, rows):
    return spark.createDataFrame(rows, "step string, result string")


def _oracle(rows) -> str:
    vals = " UNION ALL ".join(
        f"SELECT '{s}' AS step, '{r}' AS result" for s, r in rows
    )
    return vals


def _catch(fn) -> str:
    try:
        fn()
        return "ok"
    except E.CatalogError as err:
        return err.type


# ---- each operator: scripted behavior + expected constant oracle ----------

def _q(name: str, expected: list[tuple[str, str]], builder):
    def run(spark, sf_dir):
        cat = _fresh(sf_dir, name)
        return _df(spark, builder(cat))

    run.__name__ = name
    run.__doc__ = builder.__doc__
    query(name, oracle=_oracle(expected))(run)


_q(
    "c_get_config",
    [("defaults_nonempty", "true"), ("override_tz", "UTC"),
     ("override_nanos", "true")],
    lambda cat: [
        ("defaults_nonempty", str(bool(cat.config()["defaults"])).lower()),
        ("override_tz", cat.config()["overrides"]["spark.sql.session.timeZone"]),
        ("override_nanos",
         cat.config()["overrides"]["spark.sql.legacy.parquet.nanosAsLong"]),
    ],
)

_q(
    "c_health",
    [("health", "ok")],
    lambda cat: [("health", cat.health()["status"])],
)


def _create_ns(cat):
    """CreateNamespace: ok, then 409 AlreadyExistsException on dup
    (reference namespaces.go:61-66)."""
    return [
        ("create", _catch(lambda: cat.create_namespace(("ns1",), {"env": "t"}))),
        ("dup", _catch(lambda: cat.create_namespace(("ns1",)))),
    ]


_q("c_create_namespace", [("create", "ok"), ("dup", "AlreadyExistsException")], _create_ns)


def _list_ns(cat):
    """ListNamespaces incl. parent filtering + 404 on missing parent."""
    cat.create_namespace(("a",))
    cat.create_namespace(("b",))
    cat.create_namespace(("a", "child"))
    top = ",".join(".".join(n) for n in cat.list_namespaces())
    under_a = ",".join(".".join(n) for n in cat.list_namespaces(("a",)))
    missing = _catch(lambda: cat.list_namespaces(("nope",)))
    return [("top", top), ("under_a", under_a), ("missing_parent", missing)]


_q(
    "c_list_namespaces",
    [("top", "a,b"), ("under_a", "a.child"),
     ("missing_parent", "NoSuchNamespaceException")],
    _list_ns,
)


def _load_ns(cat):
    """LoadNamespaceMetadata returns properties; 404 when missing."""
    cat.create_namespace(("ns1",), {"owner": "icsb", "env": "dev"})
    props = cat.load_namespace(("ns1",))["properties"]
    return [
        ("props", ";".join(f"{k}={props[k]}" for k in sorted(props))),
        ("missing", _catch(lambda: cat.load_namespace(("nope",)))),
    ]


_q(
    "c_load_namespace",
    [("props", "env=dev;owner=icsb"), ("missing", "NoSuchNamespaceException")],
    _load_ns,
)


def _ns_exists(cat):
    cat.create_namespace(("ns1",))
    return [
        ("exists", str(cat.namespace_exists(("ns1",))).lower()),
        ("not_exists", str(cat.namespace_exists(("nope",))).lower()),
    ]


_q("c_namespace_exists", [("exists", "true"), ("not_exists", "false")], _ns_exists)


def _drop_ns(cat):
    """DropNamespace: RESTRICT — 409 NamespaceNotEmptyException while tables
    remain (reference namespaces.go:131-136), ok when empty, 404 after."""
    cat.create_namespace(("ns1",))
    cat.create_table(("ns1", "t"), _SCHEMA)
    not_empty = _catch(lambda: cat.drop_namespace(("ns1",)))
    cat.drop_table(("ns1", "t"))
    dropped = _catch(lambda: cat.drop_namespace(("ns1",)))
    gone = _catch(lambda: cat.drop_namespace(("ns1",)))
    return [("not_empty", not_empty), ("drop", dropped), ("gone", gone)]


_q(
    "c_drop_namespace",
    [("not_empty", "NamespaceNotEmptyException"), ("drop", "ok"),
     ("gone", "NoSuchNamespaceException")],
    _drop_ns,
)


def _update_ns_props(cat):
    """UpdateProperties: 3-way {updated,removed,missing} summary
    (namespaces.go:182-186) and 422 on overlapping key (159-166)."""
    cat.create_namespace(("ns1",), {"keep": "1", "drop": "2"})
    out = cat.update_namespace_properties(
        ("ns1",), removals=["drop", "ghost"], updates={"added": "3"}
    )
    overlap = _catch(
        lambda: cat.update_namespace_properties(("ns1",), ["k"], {"k": "v"})
    )
    return [
        ("updated", ",".join(out["updated"])),
        ("removed", ",".join(out["removed"])),
        ("missing", ",".join(out["missing"])),
        ("overlap", overlap),
    ]


_q(
    "c_update_ns_props",
    [("updated", "added"), ("removed", "drop"), ("missing", "ghost"),
     ("overlap", "UnprocessableEntityException")],
    _update_ns_props,
)


def _list_tables(cat):
    cat.create_namespace(("ns1",))
    cat.create_table(("ns1", "t1"), _SCHEMA)
    cat.create_table(("ns1", "t2"), _SCHEMA)
    names = ",".join(i[-1] for i in cat.list_tables(("ns1",)))
    missing = _catch(lambda: cat.list_tables(("nope",)))
    return [("tables", names), ("missing_ns", missing)]


_q(
    "c_list_tables",
    [("tables", "t1,t2"), ("missing_ns", "NoSuchNamespaceException")],
    _list_tables,
)


def _create_table(cat):
    """CreateTable: ok with schema+props; 404 no namespace; 409 dup;
    stage-create -> 501 (reference tables.go:78-148)."""
    cat.create_namespace(("ns1",))
    created = _catch(
        lambda: cat.create_table(("ns1", "t"), _SCHEMA, properties={"description": "Test table"})
    )
    t = cat.load_table(("ns1", "t"))
    fields = ",".join(f.name for f in t.schema().fields)
    no_ns = _catch(lambda: cat.create_table(("nope", "t"), _SCHEMA))
    dup = _catch(lambda: cat.create_table(("ns1", "t"), _SCHEMA))
    staged = _catch(lambda: cat.create_table(("ns1", "s"), _SCHEMA, stage_create=True))
    return [
        ("create", created), ("fields", fields), ("no_ns", no_ns),
        ("dup", dup), ("stage_create", staged),
    ]


_q(
    "c_create_table",
    [("create", "ok"), ("fields", "id,name,created_at"),
     ("no_ns", "NoSuchNamespaceException"), ("dup", "AlreadyExistsException"),
     ("stage_create", "NotImplementedException")],
    _create_table,
)


def _load_table(cat):
    """LoadTable: metadata round-trip + distinct 404s for ns vs table."""
    cat.create_namespace(("ns1",))
    cat.create_table(("ns1", "t"), _SCHEMA)
    t = cat.load_table(("ns1", "t"))
    return [
        ("schema_id", str(t.schema().schema_id)),
        ("version", str(t.version)),
        ("metadata_location", "v1.metadata.json"
         if t.metadata_location.endswith("v1.metadata.json") else "WRONG"),
        ("missing_table", _catch(lambda: cat.load_table(("ns1", "missing")))),
        ("missing_ns", _catch(lambda: cat.load_table(("nope", "t")))),
    ]


_q(
    "c_load_table",
    [("schema_id", "0"), ("version", "1"), ("metadata_location", "v1.metadata.json"),
     ("missing_table", "NoSuchTableException"), ("missing_ns", "NoSuchNamespaceException")],
    _load_table,
)


def _update_table(cat):
    """UpdateTable optimistic commit: passing requirements evolve the schema
    (server_test.go:210-225); failing requirements -> CommitFailedException."""
    cat.create_namespace(("ns1",))
    cat.create_table(("ns1", "t"), _SCHEMA)
    new_schema = Schema(
        1, _SCHEMA.fields + [NestedField(4, "updated_at", "timestamp", True)]
    )
    ok = _catch(
        lambda: cat.update_table(
            ("ns1", "t"),
            [{"type": "assert-current-schema-id", "current-schema-id": 0}],
            [
                {"action": "add-schema", "schema": new_schema.to_json()},
                {"action": "set-current-schema", "schema-id": 1},
            ],
        )
    )
    t = cat.load_table(("ns1", "t"))
    stale = _catch(
        lambda: cat.update_table(
            ("ns1", "t"),
            [{"type": "assert-current-schema-id", "current-schema-id": 0}],
            [],
        )
    )
    return [
        ("commit", ok),
        ("n_fields", str(len(t.schema().fields))),
        ("version", str(t.version)),
        ("schemas_kept", ",".join(str(s["schema-id"]) for s in t.metadata["schemas"])),
        ("stale_requirement", stale),
    ]


_q(
    "c_update_table",
    [("commit", "ok"), ("n_fields", "4"), ("version", "2"),
     ("schemas_kept", "0,1"), ("stale_requirement", "CommitFailedException")],
    _update_table,
)


def _drop_table(cat):
    """DropTable: metadata-only; purge -> NotImplemented (tables.go:288-295)."""
    cat.create_namespace(("ns1",))
    cat.create_table(("ns1", "t"), _SCHEMA)
    purge = _catch(lambda: cat.drop_table(("ns1", "t"), purge=True))
    drop = _catch(lambda: cat.drop_table(("ns1", "t")))
    gone = _catch(lambda: cat.drop_table(("ns1", "t")))
    return [("purge", purge), ("drop", drop), ("gone", gone)]


_q(
    "c_drop_table",
    [("purge", "NotImplementedException"), ("drop", "ok"),
     ("gone", "NoSuchTableException")],
    _drop_table,
)


def _table_exists(cat):
    cat.create_namespace(("ns1",))
    cat.create_table(("ns1", "t"), _SCHEMA)
    return [
        ("exists", str(cat.table_exists(("ns1", "t"))).lower()),
        ("not_exists", str(cat.table_exists(("ns1", "nope"))).lower()),
    ]


_q("c_table_exists", [("exists", "true"), ("not_exists", "false")], _table_exists)


def _rename_table(cat):
    """RenameTable incl. cross-namespace + rename-back
    (server_test.go:227-248)."""
    cat.create_namespace(("ns1",))
    cat.create_namespace(("ns2",))
    cat.create_table(("ns1", "t"), _SCHEMA)
    renamed = _catch(lambda: cat.rename_table(("ns1", "t"), ("ns2", "moved")))
    old_gone = str(not cat.table_exists(("ns1", "t"))).lower()
    new_there = str(cat.table_exists(("ns2", "moved"))).lower()
    back = _catch(lambda: cat.rename_table(("ns2", "moved"), ("ns1", "t")))
    return [
        ("rename", renamed), ("old_gone", old_gone),
        ("new_exists", new_there), ("rename_back", back),
    ]


_q(
    "c_rename_table",
    [("rename", "ok"), ("old_gone", "true"), ("new_exists", "true"),
     ("rename_back", "ok")],
    _rename_table,
)
