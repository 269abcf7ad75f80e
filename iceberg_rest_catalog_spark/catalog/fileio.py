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
