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
