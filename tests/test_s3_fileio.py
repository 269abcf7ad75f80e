"""S3FileIO unit tests over the in-memory S3 client.

The behavioral matrix (tests/test_catalog.py, backend param "s3") already
drives the whole catalog protocol through this FileIO; these tests pin the
object-store semantics the protocol leans on — above all that
``create_exclusive`` really is arbitrated by the store's conditional put
(reference configs/.iceberg-go.yaml:7-10 points its warehouse at S3; the
module docstring in fileio.py documents the mapping).
"""

import threading

import pytest

from iceberg_rest_catalog_spark.catalog.fileio import (
    InMemoryS3Client,
    S3FileIO,
)


@pytest.fixture()
def fio():
    return S3FileIO(client=InMemoryS3Client())


def test_conditional_put_arbitrates_concurrent_claims(fio):
    """N threads race create_exclusive on one key: exactly one wins — the
    commit-claim safety property on S3 (If-None-Match: *)."""
    wins = []
    barrier = threading.Barrier(8)

    def claim(i):
        barrier.wait()
        if fio.create_exclusive("s3://b/wh/t/metadata/v2.metadata.json", f"w{i}"):
            wins.append(i)

    threads = [threading.Thread(target=claim, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    # the winner's payload is what readers observe
    assert fio.read_text("s3://b/wh/t/metadata/v2.metadata.json") == f"w{wins[0]}"


def test_atomic_write_and_read_round_trip(fio):
    fio.write_text_atomic("s3://b/wh/x.json", '{"v": 1}')
    fio.write_text_atomic("s3://b/wh/x.json", '{"v": 2}')  # replace allowed
    assert fio.read_text("s3://b/wh/x.json") == '{"v": 2}'
    assert fio.size("s3://b/wh/x.json") == 8
    assert fio.getmtime("s3://b/wh/x.json") > 0


def test_missing_key_parity_with_posix(fio):
    with pytest.raises(FileNotFoundError):
        fio.read_text("s3://b/nope")
    with pytest.raises(FileNotFoundError):
        fio.remove("s3://b/nope")
    with pytest.raises(FileNotFoundError):
        fio.rmtree("s3://b/nope")
    with pytest.raises(FileNotFoundError):
        fio.rename("s3://b/nope", "s3://b/also-nope")
    assert not fio.isfile("s3://b/nope")
    assert not fio.isdir("s3://b/nope")


def test_listdir_walk_and_implicit_dirs(fio):
    for k in ("a/1.txt", "a/b/2.txt", "a/b/3.txt", "c.txt"):
        fio.write_text_atomic(f"s3://b/wh/{k}", "x")
    assert sorted(fio.listdir("s3://b/wh")) == ["a", "c.txt"]
    assert sorted(fio.listdir("s3://b/wh/a")) == ["1.txt", "b"]
    assert fio.isdir("s3://b/wh/a/b") and not fio.isfile("s3://b/wh/a")
    walked = {d: (dn, fn) for d, dn, fn in fio.walk("s3://b/wh")}
    assert walked["s3://b/wh"] == (["a"], ["c.txt"])
    assert walked["s3://b/wh/a/b"] == ([], ["2.txt", "3.txt"])


def test_listing_pagination_is_followed(fio):
    """1000-key default pages: a 2500-object prefix must list completely."""
    for i in range(2500):
        fio.s3.put_object(Bucket="b", Key=f"wh/d/f{i:04d}", Body=b".")
    assert len(fio.listdir("s3://b/wh/d")) == 2500


def test_rename_moves_file_and_prefix(fio):
    fio.write_text_atomic("s3://b/wh/t1/metadata/v1.json", "m")
    fio.write_text_atomic("s3://b/wh/t1/data/p.parquet", "d")
    fio.rename("s3://b/wh/t1", "s3://b/wh/t2")  # table rename = prefix move
    assert not fio.isdir("s3://b/wh/t1")
    assert fio.read_text("s3://b/wh/t2/metadata/v1.json") == "m"
    assert fio.read_text("s3://b/wh/t2/data/p.parquet") == "d"
    fio.rename("s3://b/wh/t2/data/p.parquet", "s3://b/wh/t2/data/q.parquet")
    assert fio.read_text("s3://b/wh/t2/data/q.parquet") == "d"
    assert not fio.isfile("s3://b/wh/t2/data/p.parquet")


def test_rmtree_clears_prefix_only(fio):
    fio.write_text_atomic("s3://b/wh/ns/.namespace.json", "{}")
    fio.write_text_atomic("s3://b/wh/ns/t/metadata/v1.json", "m")
    fio.rmtree("s3://b/wh/ns/t")
    assert not fio.isdir("s3://b/wh/ns/t")
    assert fio.isfile("s3://b/wh/ns/.namespace.json")


def test_config_routes_s3_warehouse_to_s3_fileio(tmp_path, monkeypatch):
    """A `type: fs` catalog with an s3:// warehouse must construct S3FileIO
    and keep the URI warehouse verbatim (no abspath mangling). Touches no
    network: boto3 client construction is local and mkdirs is a no-op."""
    from iceberg_rest_catalog_spark.catalog.config import CONFIG_NAME, load_config

    (tmp_path / CONFIG_NAME).write_text(
        "default_catalog: prod\n"
        "catalogs:\n"
        "  prod: {type: fs, warehouse: 's3://prod-bucket/warehouse'}\n"
    )
    monkeypatch.setenv("ICSB_SPARK_HOME", str(tmp_path))
    cat = load_config().open_catalog()
    assert isinstance(cat.fio, S3FileIO)
    assert cat.warehouse == "s3://prod-bucket/warehouse"


# ---------------------------------------------------------------------------
# Property-based equivalence: under the catalog's usage contract (mkdirs
# before write, rename to fresh destinations, remove files / rmtree dirs),
# LocalFileIO and S3FileIO must be observationally identical — the property
# that makes the s3 backend a drop-in for every catalog code path.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_rest_catalog_spark.catalog.fileio import LocalFileIO

_NAMES = ("x", "y", "z")
_path = st.lists(st.sampled_from(_NAMES), min_size=1, max_size=3).map("/".join)
# no bare \r: POSIX text-mode reads apply universal-newline translation,
# which is irrelevant to the JSON metadata the catalog actually stores.
# No lone surrogates either: they cannot UTF-8-encode at all (both
# backends raise identically before any I/O), and the catalog only ever
# stores JSON — always valid-UTF-8 text.
_text = st.text(
    alphabet=st.characters(
        blacklist_characters="\r", blacklist_categories=("Cs",)
    ),
    max_size=8,
)
_op = st.one_of(
    st.tuples(st.just("write"), _path, _text),
    st.tuples(st.just("excl"), _path, _text),
    st.tuples(st.just("remove"), _path),
    st.tuples(st.just("rmtree"), _path),
    st.tuples(st.just("rename"), _path, _path),
)


def _file_map(fio, root):
    out = {}
    if not fio.isdir(root):
        return out
    for dp, _dn, fns in fio.walk(root):
        rel = dp[len(root):].strip("/")
        for fn in fns:
            p = f"{dp}/{fn}"
            out[f"{rel}/{fn}" if rel else fn] = fio.read_text(p)
    return out


@settings(max_examples=60, deadline=None)
@given(ops=st.lists(_op, max_size=12))
def test_local_and_s3_fileio_are_observationally_equivalent(tmp_path_factory, ops):
    """Both backends are driven by the same MODEL-derived decisions (the
    catalog's usage contract: mkdirs before write, never write under a
    file, rename to fresh destinations, remove files / rmtree dirs), so
    any divergence in resulting file trees or create_exclusive outcomes
    is a backend bug, not an environment-sensitivity of the test."""
    local = LocalFileIO()
    lroot = str(tmp_path_factory.mktemp("wh"))
    s3 = S3FileIO(client=InMemoryS3Client())
    sroot = "s3://b/wh"
    model: dict[str, str] = {}  # relpath -> content, the reference state
    # paths where a POSIX directory may linger after its files are gone
    # (empty dirs are unrepresentable on S3; the catalog's layout never
    # places a FILE at a path that has ever been a directory)
    residue: set[str] = set()

    def _ancestors(p):
        parts = p.split("/")
        return {"/".join(parts[:i]) for i in range(1, len(parts))}

    def m_isfile(p):
        return p in model

    def m_isdir(p):
        return any(k.startswith(p + "/") for k in model)

    def m_ancestor_is_file(p):
        return any(a in model for a in _ancestors(p))

    def apply(fio, root, op):
        kind, p, *rest = op
        fp = f"{root}/{p}"
        if kind == "write":
            fio.mkdirs(fp.rsplit("/", 1)[0])
            fio.write_text_atomic(fp, rest[0])
        elif kind == "excl":
            fio.mkdirs(fp.rsplit("/", 1)[0])
            return fio.create_exclusive(fp, rest[0])
        elif kind == "remove":
            fio.remove(fp)
        elif kind == "rmtree":
            fio.rmtree(fp)
        else:
            dst = f"{root}/{rest[0]}"
            fio.mkdirs(dst.rsplit("/", 1)[0])
            fio.rename(fp, dst)

    for op in ops:
        kind, p, *rest = op
        # decide from the model whether the catalog would issue this op
        if kind in ("write", "excl"):
            if m_isdir(p) or p in residue or m_ancestor_is_file(p):
                continue
        elif kind == "remove":
            if not m_isfile(p):
                continue
        elif kind == "rmtree":
            if not m_isdir(p):
                continue
        else:
            dst = rest[0]
            if not (m_isfile(p) or m_isdir(p)):
                continue
            if (
                m_isfile(dst)
                or m_isdir(dst)
                or dst in residue
                or dst == p
                or dst.startswith(p + "/")
                or m_ancestor_is_file(dst)
            ):
                continue
        got_l = apply(local, lroot, op)
        got_s = apply(s3, sroot, op)
        # update the model
        if kind == "write":
            model[p] = rest[0]
            residue |= _ancestors(p)
        elif kind == "excl":
            expected = p not in model
            assert got_l is expected and got_s is expected, (op, got_l, got_s)
            if expected:
                model[p] = rest[0]
                residue |= _ancestors(p)
        elif kind == "remove":
            del model[p]
        elif kind == "rmtree":
            for k in [k for k in model if k.startswith(p + "/")]:
                del model[k]
            residue -= {d for d in residue if d == p or d.startswith(p + "/")}
        else:
            dst = rest[0]
            if p in model:
                model[dst] = model.pop(p)
            else:
                for k in [k for k in model if k.startswith(p + "/")]:
                    model[dst + k[len(p):]] = model.pop(k)
                moved = {d for d in residue if d == p or d.startswith(p + "/")}
                residue -= moved
                residue |= {dst + d[len(p):] for d in moved}
            residue |= _ancestors(dst)
        assert _file_map(local, lroot) == model, op
        assert _file_map(s3, sroot) == model, op


def test_prefix_rename_survives_pagination(fio):
    """Round-5 review: rename must materialize the key list before
    mutating — deleting during a paginated listing loses keys past the
    first page (>1000 objects)."""
    for i in range(2500):
        fio.s3.put_object(Bucket="b", Key=f"wh/src/f{i:04d}", Body=b".")
    fio.rename("s3://b/wh/src", "s3://b/wh/dst")
    assert not fio.isdir("s3://b/wh/src")
    assert len(fio.listdir("s3://b/wh/dst")) == 2500


def test_walk_of_missing_prefix_is_empty(fio):
    assert list(fio.walk("s3://b/missing")) == []  # os.walk parity


def test_rmtree_on_file_raises(fio):
    fio.write_text_atomic("s3://b/wh/f.txt", "x")
    with pytest.raises(NotADirectoryError):
        fio.rmtree("s3://b/wh/f.txt")
    assert fio.isfile("s3://b/wh/f.txt")  # untouched


def test_conditional_conflict_is_retried_not_lost():
    """A transient 409 ConditionalRequestConflict (concurrent conditional
    put in flight on real S3) must be retried, not reported as 'claim
    already exists' — neither racer may have written yet."""
    from iceberg_rest_catalog_spark.catalog.fileio import _S3Error

    class Flaky(InMemoryS3Client):
        def __init__(self):
            super().__init__()
            self.conflicts = 2

        def put_object(self, *a, **kw):
            if kw.get("IfNoneMatch") == "*" and self.conflicts:
                self.conflicts -= 1
                raise _S3Error("ConditionalRequestConflict", 409)
            return super().put_object(*a, **kw)

    fio = S3FileIO(client=Flaky())
    assert fio.create_exclusive("s3://b/wh/v2.json", "m") is True
    assert fio.read_text("s3://b/wh/v2.json") == "m"
    # and a genuine 412 still reports the lost claim
    assert fio.create_exclusive("s3://b/wh/v2.json", "other") is False


def test_entrypoint_catalog_routes_s3_warehouse():
    """Catalog(warehouse='s3://...') with no explicit fileio must construct
    S3FileIO — not write metadata into a local 's3:' directory (the REST
    server entrypoint builds Catalog(args.warehouse) directly)."""
    from iceberg_rest_catalog_spark.catalog import Catalog

    cat = Catalog("s3://prod-bucket/warehouse")
    assert isinstance(cat.fio, S3FileIO)
