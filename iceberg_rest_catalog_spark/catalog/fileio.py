"""FileIO seam — warehouse I/O behind a swappable interface.

The reference's sample config points its warehouse at S3
(``/root/reference/configs/.iceberg-go.yaml:7-13``); iceberg-go gets that
for free through its own FileIO abstraction. This module is the engine's
equivalent seam: :class:`Catalog` routes every metadata-plane filesystem
touch through a ``FileIO`` so an object-store implementation (same method
surface, s3:// paths) can drop in without touching catalog logic. The
DATA plane needs no seam — Spark reads/writes s3:// URIs natively.

``LocalFileIO`` is the bundled implementation. An S3 implementation would
map: write_text_atomic -> put-object (atomic by definition),
create_exclusive -> put-if-absent (conditional write), rename ->
server-side copy+delete, walk/listdir -> prefix listing. The one caveat is
``create_exclusive``: on stores without conditional puts the fs backend's
claim protocol is unsafe — use the sql backend's pointer CAS there
(sql_catalog.py), which only needs write_text_atomic.
"""

from __future__ import annotations

import os
import shutil
import uuid


class FileIO:
    """Interface: every method a catalog backend touches storage with."""

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_text_atomic(self, path: str, text: str) -> None:
        """All-or-nothing replace: readers never observe a partial write."""
        raise NotImplementedError

    def create_exclusive(self, path: str, text: str) -> bool:
        """Create iff absent (the fs commit claim). False = already exists."""
        raise NotImplementedError

    def isfile(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def walk(self, path: str, topdown: bool = True):
        raise NotImplementedError

    def mkdirs(self, path: str) -> None:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def rmdir(self, path: str) -> None:
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def getmtime(self, path: str) -> float:
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError


class LocalFileIO(FileIO):
    """POSIX filesystem implementation (the sandbox default)."""

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def create_exclusive(self, path: str, text: str) -> bool:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(text)
        return True

    def isfile(self, path: str) -> bool:
        return os.path.isfile(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def walk(self, path: str, topdown: bool = True):
        return os.walk(path, topdown=topdown)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmdir(self, path: str) -> None:
        os.rmdir(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def getmtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)


# ---------------------------------------------------------------------------
# S3 object-store implementation
# ---------------------------------------------------------------------------


class _S3Error(Exception):
    """Minimal stand-in for botocore's ClientError shape: carries the same
    ``response`` dict so S3FileIO can duck-type against either client."""

    def __init__(self, code: str, status: int, msg: str = ""):
        super().__init__(msg or code)
        self.response = {
            "Error": {"Code": code, "Message": msg},
            "ResponseMetadata": {"HTTPStatusCode": status},
        }


def _err_code(exc: Exception) -> tuple[str, int]:
    resp = getattr(exc, "response", None) or {}
    return (
        str(resp.get("Error", {}).get("Code", "")),
        int(resp.get("ResponseMetadata", {}).get("HTTPStatusCode", 0) or 0),
    )


class S3FileIO(FileIO):
    """FileIO over the S3 API (paths are ``s3://bucket/key``).

    Method mapping (module docstring's design, made concrete):

    - ``write_text_atomic`` -> PutObject (a PUT is atomic by definition:
      readers see the old object or the new one, never bytes of both);
    - ``create_exclusive``  -> conditional PutObject with ``If-None-Match:
      *`` (S3 conditional writes): the store itself arbitrates the commit
      claim, so the fs backend's optimistic-commit protocol is exactly as
      safe on S3 as on POSIX `O_EXCL`;
    - ``rename``            -> server-side CopyObject + DeleteObject (for a
      "directory", per-key copy of the prefix — O(objects), used only by
      the metadata-plane rename_table);
    - ``listdir``/``walk``/``isdir`` -> delimiter / recursive prefix
      listings (directories are implicit in S3; ``mkdirs``/``rmdir`` are
      no-ops).

    Takes any client exposing the boto3 S3 surface (get_object, put_object,
    head_object, delete_object, copy_object, list_objects_v2). With no
    client, boto3 is imported lazily — absent in this sandbox, so the
    bundled :class:`InMemoryS3Client` (same semantics, conditional puts
    included) backs the test matrix.
    """

    def __init__(self, client=None, region: str | None = None):
        if client is None:
            try:
                import boto3  # pragma: no cover - not installed in sandbox
            except ImportError as exc:  # pragma: no cover
                raise RuntimeError(
                    "S3FileIO needs boto3 (pip install boto3) or an explicit "
                    "client=... implementing the S3 API subset"
                ) from exc
            client = boto3.client("s3", region_name=region)  # pragma: no cover
        self.s3 = client

    # -- path plumbing ------------------------------------------------------
    @staticmethod
    def _bk(path: str) -> tuple[str, str]:
        if not path.startswith("s3://"):
            raise ValueError(f"S3FileIO paths must be s3://bucket/key, got {path!r}")
        rest = path[5:]
        bucket, _, key = rest.partition("/")
        return bucket, key.rstrip("/")

    def _list(self, bucket: str, prefix: str, delimiter: str = ""):
        """Yield (Contents, CommonPrefixes) pages, following pagination."""
        token = None
        while True:
            kw = {"Bucket": bucket, "Prefix": prefix}
            if delimiter:
                kw["Delimiter"] = delimiter
            if token:
                kw["ContinuationToken"] = token
            out = self.s3.list_objects_v2(**kw)
            yield out.get("Contents", []), out.get("CommonPrefixes", [])
            if not out.get("IsTruncated"):
                return
            token = out.get("NextContinuationToken")

    # -- FileIO surface -----------------------------------------------------
    def read_text(self, path: str) -> str:
        b, k = self._bk(path)
        try:
            out = self.s3.get_object(Bucket=b, Key=k)
        except Exception as exc:
            code, status = _err_code(exc)
            if code in ("NoSuchKey", "404") or status == 404:
                raise FileNotFoundError(path) from exc
            raise
        body = out["Body"]
        data = body.read() if hasattr(body, "read") else body
        return data.decode("utf-8")

    def write_text_atomic(self, path: str, text: str) -> None:
        b, k = self._bk(path)
        self.s3.put_object(Bucket=b, Key=k, Body=text.encode("utf-8"))

    def create_exclusive(self, path: str, text: str) -> bool:
        """Create iff absent via conditional put. 412 PreconditionFailed
        means the key exists -> claim lost (False). 409
        ConditionalRequestConflict means a CONCURRENT conditional put is in
        flight — the key may not exist at all, so folding it into False
        would fail both racers while neither wrote; S3's documented
        contract is to retry until the winner's object lands (then 412) or
        our put succeeds."""
        import time

        b, k = self._bk(path)
        for attempt in range(8):
            try:
                self.s3.put_object(
                    Bucket=b, Key=k, Body=text.encode("utf-8"), IfNoneMatch="*"
                )
                return True
            except Exception as exc:
                code, status = _err_code(exc)
                if code == "PreconditionFailed" or status == 412:
                    return False
                if code == "ConditionalRequestConflict" or status == 409:
                    time.sleep(0.05 * (attempt + 1))
                    continue
                raise
        raise RuntimeError(
            f"conditional put on {path} still conflicting after 8 retries"
        )

    def isfile(self, path: str) -> bool:
        b, k = self._bk(path)
        try:
            self.s3.head_object(Bucket=b, Key=k)
            return True
        except Exception as exc:
            code, status = _err_code(exc)
            if code in ("NoSuchKey", "404") or status == 404:
                return False
            raise

    def isdir(self, path: str) -> bool:
        b, k = self._bk(path)
        for contents, prefixes in self._list(b, k + "/" if k else ""):
            if contents or prefixes:
                return True
        return False

    def listdir(self, path: str) -> list[str]:
        b, k = self._bk(path)
        base = k + "/" if k else ""
        names: list[str] = []
        for contents, prefixes in self._list(b, base, delimiter="/"):
            names.extend(o["Key"][len(base):] for o in contents if o["Key"] != base)
            names.extend(p["Prefix"][len(base):].rstrip("/") for p in prefixes)
        return names

    def walk(self, path: str, topdown: bool = True):
        b, k = self._bk(path)
        base = k + "/" if k else ""
        # one recursive listing; rebuild the directory tree client-side
        dirs: dict[str, tuple[set, list]] = {}
        for contents, _ in self._list(b, base):
            for o in contents:
                rel = o["Key"][len(base):]
                parts = rel.split("/")
                parent = k
                for d in parts[:-1]:
                    dirs.setdefault(parent, (set(), []))[0].add(d)
                    parent = f"{parent}/{d}" if parent else d
                dirs.setdefault(parent, (set(), []))[1].append(parts[-1])
        if not dirs:
            return  # nonexistent prefix: os.walk parity is an empty iterator
        dirs.setdefault(k, (set(), []))
        order = sorted(dirs)
        if not topdown:
            order.reverse()
        for d in order:
            subdirs, files = dirs[d]
            yield (f"s3://{b}/{d}" if d else f"s3://{b}"), sorted(subdirs), sorted(files)

    def mkdirs(self, path: str) -> None:
        pass  # directories are implicit prefixes

    def remove(self, path: str) -> None:
        if not self.isfile(path):
            raise FileNotFoundError(path)  # parity with os.remove
        b, k = self._bk(path)
        self.s3.delete_object(Bucket=b, Key=k)

    def rmdir(self, path: str) -> None:
        pass  # an empty prefix already does not exist

    def rmtree(self, path: str) -> None:
        b, k = self._bk(path)
        keys = [
            o["Key"]
            for contents, _ in self._list(b, k + "/" if k else "")
            for o in contents
        ]
        if not keys:
            if self.isfile(path):
                # shutil.rmtree on a file raises; silently leaving the
                # object in place would be worse
                raise NotADirectoryError(path)
            raise FileNotFoundError(path)  # parity with shutil.rmtree
        for key in keys:
            self.s3.delete_object(Bucket=b, Key=key)

    def rename(self, src: str, dst: str) -> None:
        sb, sk = self._bk(src)
        db, dk = self._bk(dst)
        if self.isfile(src):
            self.s3.copy_object(
                Bucket=db, Key=dk, CopySource={"Bucket": sb, "Key": sk}
            )
            self.s3.delete_object(Bucket=sb, Key=sk)
            return
        # materialize the full key list BEFORE mutating: deleting while a
        # paginated listing is in flight can shift later pages and silently
        # skip keys (same discipline as rmtree)
        keys = [
            o["Key"] for contents, _ in self._list(sb, sk + "/") for o in contents
        ]
        if not keys:
            raise FileNotFoundError(src)
        for key in keys:
            rel = key[len(sk) + 1:]
            self.s3.copy_object(
                Bucket=db, Key=f"{dk}/{rel}", CopySource={"Bucket": sb, "Key": key}
            )
            self.s3.delete_object(Bucket=sb, Key=key)

    def getmtime(self, path: str) -> float:
        b, k = self._bk(path)
        try:
            out = self.s3.head_object(Bucket=b, Key=k)
        except Exception as exc:
            code, status = _err_code(exc)
            if code in ("NoSuchKey", "404") or status == 404:
                raise FileNotFoundError(path) from exc
            raise
        lm = out["LastModified"]
        return lm if isinstance(lm, (int, float)) else lm.timestamp()

    def size(self, path: str) -> int:
        b, k = self._bk(path)
        try:
            return int(self.s3.head_object(Bucket=b, Key=k)["ContentLength"])
        except Exception as exc:
            code, status = _err_code(exc)
            if code in ("NoSuchKey", "404") or status == 404:
                raise FileNotFoundError(path) from exc
            raise


class InMemoryS3Client:
    """In-process test double for the boto3 S3 client subset S3FileIO uses.

    Implements real S3 semantics — strong read-after-write consistency,
    conditional PutObject via ``If-None-Match: *`` (412 PreconditionFailed
    on existing key), paginated list_objects_v2 with Prefix/Delimiter —
    so the fs-backend commit protocol (create_exclusive claim files) is
    exercised against genuine object-store behavior, minus the network.
    Swap for a real boto3 client / MinIO endpoint with zero S3FileIO
    changes. Thread-safe: conditional puts arbitrate under one lock, which
    is precisely the store-side arbitration the protocol relies on.
    """

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._objects: dict[tuple[str, str], tuple[bytes, float]] = {}

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None, **_):
        import time

        data = Body if isinstance(Body, bytes) else Body.read()
        with self._lock:
            if IfNoneMatch == "*" and (Bucket, Key) in self._objects:
                raise _S3Error("PreconditionFailed", 412, Key)
            self._objects[(Bucket, Key)] = (data, time.time())
        return {"ETag": '"%d"' % len(data)}

    def get_object(self, Bucket, Key, **_):
        import io

        with self._lock:
            if (Bucket, Key) not in self._objects:
                raise _S3Error("NoSuchKey", 404, Key)
            data, _mt = self._objects[(Bucket, Key)]
        return {"Body": io.BytesIO(data)}

    def head_object(self, Bucket, Key, **_):
        with self._lock:
            if (Bucket, Key) not in self._objects:
                raise _S3Error("404", 404, Key)
            data, mt = self._objects[(Bucket, Key)]
        return {"ContentLength": len(data), "LastModified": mt}

    def delete_object(self, Bucket, Key, **_):
        with self._lock:
            self._objects.pop((Bucket, Key), None)  # idempotent, like S3
        return {}

    def copy_object(self, Bucket, Key, CopySource, **_):
        import time

        src = (CopySource["Bucket"], CopySource["Key"])
        with self._lock:
            if src not in self._objects:
                raise _S3Error("NoSuchKey", 404, CopySource["Key"])
            self._objects[(Bucket, Key)] = (self._objects[src][0], time.time())
        return {}

    def list_objects_v2(
        self,
        Bucket,
        Prefix="",
        Delimiter="",
        ContinuationToken=None,
        MaxKeys=1000,
        **_,
    ):
        # Marker-based pagination like real S3: the token is the last
        # emitted key/rolled-up prefix, and each page re-lists everything
        # AFTER it in UTF-8 order — so keys deleted between pages are
        # skipped the way S3 skips them, instead of shifting an index and
        # silently dropping survivors. Contents and CommonPrefixes
        # interleave in one lexicographic sequence, also like S3.
        with self._lock:
            keys = sorted(
                k for (b, k) in self._objects if b == Bucket and k.startswith(Prefix)
            )
        merged, seen = [], set()
        for k in keys:
            if Delimiter:
                rest = k[len(Prefix):]
                if Delimiter in rest:
                    p = Prefix + rest.split(Delimiter)[0] + Delimiter
                    if p not in seen:
                        seen.add(p)
                        merged.append(("p", p, {"Prefix": p}))
                    continue
            merged.append(("c", k, {"Key": k}))
        if ContinuationToken:
            merged = [e for e in merged if e[1] > ContinuationToken]
        page, rest = merged[:MaxKeys], merged[MaxKeys:]
        out = {
            "Contents": [v for t, _s, v in page if t == "c"],
            "CommonPrefixes": [v for t, _s, v in page if t == "p"],
            "IsTruncated": bool(rest),
        }
        if rest:
            out["NextContinuationToken"] = page[-1][1]
        return out
