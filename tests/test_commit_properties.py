"""Property-based commit-protocol tests (SURVEY §5.2 item 5).

Hypothesis drives random commit sequences against the catalog and checks the
invariants the reference's optimistic-concurrency model promises but never
tests: versions advance linearly, the current schema always resolves, failed
requirements never mutate state, and property maps converge to the replayed
fold of the applied updates.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_rest_catalog_spark.catalog import Catalog, NestedField, Schema, SqlCatalog
from iceberg_rest_catalog_spark.catalog import errors as E

BASE = Schema(0, [NestedField(1, "id", "long", True)])

BACKENDS = ["fs", "sql", "s3"]


def _make_cat(base_dir, backend: str) -> Catalog:
    if backend == "fs":
        return Catalog(str(base_dir / "wh"))
    if backend == "s3":
        # fs commit protocol with claims arbitrated by S3 conditional puts:
        # the serialization invariants must hold identically on the store
        from iceberg_rest_catalog_spark.catalog.fileio import (
            InMemoryS3Client,
            S3FileIO,
        )

        return Catalog("s3://race-bucket/wh", fileio=S3FileIO(client=InMemoryS3Client()))
    return SqlCatalog(str(base_dir / "wh"), str(base_dir / "cat.db"))

# one step = set-props / remove-props / add-schema+set-current / bad-requirement
_step = st.one_of(
    st.tuples(
        st.just("set"),
        st.dictionaries(
            st.sampled_from(["a", "b", "c", "d"]),
            st.text(alphabet="xyz", min_size=1, max_size=3),
            min_size=1,
            max_size=3,
        ),
    ),
    st.tuples(st.just("remove"), st.lists(st.sampled_from(["a", "b", "c", "d"]), max_size=2)),
    st.tuples(st.just("evolve"), st.just(None)),
    st.tuples(st.just("bad-req"), st.just(None)),
)


@pytest.mark.parametrize("backend", BACKENDS)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(steps=st.lists(_step, max_size=12))
def test_commit_sequence_invariants(tmp_path_factory, backend, steps):
    cat = _make_cat(tmp_path_factory.mktemp("run"), backend)
    cat.create_namespace(("db",))
    cat.create_table(("db", "t"), BASE)

    expected_props: dict = {}
    expected_version = 1
    next_schema_id = 1

    for kind, arg in steps:
        if kind == "set":
            cat.update_table(
                ("db", "t"), [], [{"action": "set-properties", "updates": arg}]
            )
            expected_props.update(arg)
            expected_version += 1
        elif kind == "remove":
            cat.update_table(
                ("db", "t"), [], [{"action": "remove-properties", "removals": arg}]
            )
            for k in arg:
                expected_props.pop(k, None)
            expected_version += 1
        elif kind == "evolve":
            cur = cat.load_table(("db", "t"))
            sch = Schema(
                next_schema_id,
                cur.schema().fields
                + [NestedField(100 + next_schema_id, f"c{next_schema_id}", "string")],
            )
            cat.update_table(
                ("db", "t"),
                [
                    {
                        "type": "assert-current-schema-id",
                        "current-schema-id": cur.metadata["current-schema-id"],
                    }
                ],
                [
                    {"action": "add-schema", "schema": sch.to_json()},
                    {"action": "set-current-schema", "schema-id": next_schema_id},
                ],
            )
            next_schema_id += 1
            expected_version += 1
        else:  # bad-req: must raise and must NOT change any state
            with pytest.raises(E.CommitFailedException):
                cat.update_table(
                    ("db", "t"),
                    [{"type": "assert-current-schema-id", "current-schema-id": 999}],
                    [{"action": "set-properties", "updates": {"poison": "1"}}],
                )

        t = cat.load_table(("db", "t"))
        # invariant 1: versions are linear (one commit -> exactly +1)
        assert t.version == expected_version
        # invariant 2: current schema id always resolves
        assert t.schema().schema_id == t.metadata["current-schema-id"]
        # invariant 3: properties equal the fold of applied updates
        assert t.properties() == expected_props
        # invariant 4: failed commits leaked nothing
        assert "poison" not in t.properties()

    # invariant 5: full metadata history is retained on disk
    import os

    mdir = os.path.join(cat._table_dir(("db", "t")), "metadata")
    versions = sorted(
        # fs names v{N}.metadata.json; sql names v{N}-{uuid8}.metadata.json
        int(f[1:].split(".")[0].split("-")[0])
        for f in cat.fio.listdir(mdir)
        if f.endswith(".metadata.json")
    )
    assert versions == list(range(1, expected_version + 1))


# The rest backend adds the wire hop: a live facade over an fs-backed
# catalog, with the client's requirements re-validated server-side. The
# reference only exercises this race for rest (two httptest clients); here
# the SAME invariants run on all four backends.
BACKENDS4 = BACKENDS + ["rest"]


def _make_cat4(base_dir, backend):
    """Like _make_cat, plus the rest backend; returns (catalog, closer)."""
    if backend == "rest":
        from iceberg_rest_catalog_spark.catalog.rest import serve
        from iceberg_rest_catalog_spark.catalog.rest_client import RestCatalog

        wh = str(base_dir / "wh")
        srv, base = serve(Catalog(wh))
        return RestCatalog(base, wh), srv.shutdown
    return _make_cat(base_dir, backend), (lambda: None)


# one interleaved-writer op: reload the writer's view, commit properties
# from the (possibly stale) view, or evolve the schema from the view
_iop = st.one_of(
    st.tuples(st.just("load"), st.integers(0, 1)),
    st.tuples(
        st.just("set"),
        st.integers(0, 1),
        st.dictionaries(
            st.sampled_from(["a", "b", "c", "d"]),
            st.text(alphabet="xyz", min_size=1, max_size=2),
            min_size=1,
            max_size=2,
        ),
    ),
    st.tuples(st.just("evolve"), st.integers(0, 1)),
)


@pytest.mark.parametrize("backend", BACKENDS4)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(schedule=st.lists(_iop, max_size=14))
def test_interleaved_writers_cas_serializes(tmp_path_factory, backend, schedule):
    """Two writers interleave commits built from their own (possibly stale)
    snapshot of the table, every commit guarded by assert-current-schema-id
    from that snapshot — the optimistic-CAS shape of a real two-client race,
    made deterministic so hypothesis can shrink it. A commit must succeed
    iff its requirement holds against the CURRENT state at commit time;
    versions stay linear, the final state is exactly the fold of the
    successful commits in schedule order, failures leak nothing.
    """
    cat, closer = _make_cat4(tmp_path_factory.mktemp("run"), backend)
    try:
        cat.create_namespace(("db",))
        cat.create_table(("db", "t"), BASE)

        # each writer's cached view: the current-schema-id it last loaded
        views = {0: BASE.schema_id, 1: BASE.schema_id}
        cur_sid = BASE.schema_id
        expected_props: dict = {}
        expected_version = 1
        next_schema_id = 1

        for op in schedule:
            kind, w = op[0], op[1]
            if kind == "load":
                views[w] = cat.load_table(("db", "t")).metadata[
                    "current-schema-id"
                ]
                continue
            req = [
                {"type": "assert-current-schema-id", "current-schema-id": views[w]}
            ]
            if kind == "set":
                updates = [{"action": "set-properties", "updates": op[2]}]
            else:  # evolve
                sch = Schema(
                    next_schema_id,
                    BASE.fields
                    + [
                        NestedField(100 + next_schema_id, f"c{next_schema_id}", "string")
                    ],
                )
                updates = [
                    {"action": "add-schema", "schema": sch.to_json()},
                    {"action": "set-current-schema", "schema-id": next_schema_id},
                ]
            should_win = views[w] == cur_sid
            if should_win:
                cat.update_table(("db", "t"), req, updates)
                expected_version += 1
                if kind == "set":
                    expected_props.update(op[2])
                else:
                    cur_sid = next_schema_id
            else:  # stale view: the CAS must reject and mutate nothing
                with pytest.raises(E.CommitFailedException):
                    cat.update_table(("db", "t"), req, updates)
            if kind == "evolve":
                # ids are globally unique whether or not the commit won
                next_schema_id += 1

            t = cat.load_table(("db", "t"))
            assert t.version == expected_version
            assert t.metadata["current-schema-id"] == cur_sid
            assert t.properties() == expected_props
    finally:
        closer()


@pytest.mark.parametrize("backend", BACKENDS4)
def test_concurrent_writers_serialize_without_lost_updates(tmp_path, backend):
    """N threads race property commits; every successful commit must be
    present in the final state (no lost updates) and versions stay linear."""
    from concurrent.futures import ThreadPoolExecutor

    cat, _closer = _make_cat4(tmp_path, backend)
    try:  # finally-close: an assertion failure must not leak the rest server
        cat.create_namespace(("db",))
        cat.create_table(("db", "t"), BASE)

        def writer(i: int) -> int:
            wins = 0
            for j in range(10):
                try:
                    cat.update_table(
                        ("db", "t"),
                        [],
                        [{"action": "set-properties", "updates": {f"w{i}_{j}": "1"}}],
                    )
                    wins += 1
                except E.CommitFailedException:
                    pass  # lost the race; a real writer would reload and retry
            return wins

        with ThreadPoolExecutor(max_workers=8) as ex:
            wins = sum(ex.map(writer, range(8)))

        t = cat.load_table(("db", "t"))
        assert t.version == 1 + wins  # exactly one version per successful commit
        assert len(t.properties()) == wins  # every winning commit is visible
    finally:
        _closer()
