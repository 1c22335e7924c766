"""Metadata store backends for icelite's commit protocol.

The single primitive a snapshot commit needs is an ATOMIC EXCLUSIVE
create of a fully-written object ("put-if-absent"): whoever lands
``snap-N.json`` first owns snapshot N, the loser gets a conflict and
re-plans. This is exactly Iceberg's catalog swap, and it maps onto

- POSIX: write a complete temp file, then ``os.link`` it into place —
  hard-link creation is atomic and fails with EEXIST, and the visible
  file is always complete (readers can never observe a half-written
  snapshot, unlike ``open(..., "x")`` + write);
- object stores: a conditional PUT (``If-None-Match: *`` on S3/GCS/
  Azure). No atomic rename exists there, which is why the commit
  point must be the exclusive create of the snapshot object itself,
  never a rename. Reference analog: the ObjectStore writer,
  src/io/store.rs:39-131.

``MemoryObjectStore`` implements the same contract in-memory with
conditional-PUT semantics for two-writer race tests; a real S3 backend
is this same class shape over boto3's ``put_object(IfNoneMatch="*")``.
"""

from __future__ import annotations

import fnmatch
import os
import threading
import uuid


class PosixStore:
    """Local-filesystem metadata store (the default)."""

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list(self, prefix_dir: str, pattern: str) -> list[str]:
        if not os.path.isdir(prefix_dir):
            return []
        return sorted(
            os.path.join(prefix_dir, n)
            for n in os.listdir(prefix_dir) if fnmatch.fnmatch(n, pattern))

    def delete(self, path: str) -> None:
        os.remove(path)

    def put(self, path: str, data: str) -> None:
        """Unconditional atomic replace (last writer wins) — only for
        advisory objects like the version hint, never the commit."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def put_if_absent(self, path: str, data: str) -> bool:
        """Atomic exclusive create of a COMPLETE object. True if this
        call created it; False if it already existed (conflict)."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)  # atomic; EEXIST if a winner beat us
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)


class MemoryObjectStore:
    """In-memory fake of an S3-style object store: no rename, PUTs are
    whole-object and atomic, ``put_if_absent`` = conditional PUT with
    If-None-Match. ``on_put`` (if set) is invoked inside the lock just
    before a conditional PUT decides — race tests use it to interleave
    a concurrent winner at the worst possible moment."""

    def __init__(self):
        self._objects: dict[str, str] = {}
        self._lock = threading.Lock()
        self.on_put = None

    def read_text(self, path: str) -> str:
        with self._lock:
            if path not in self._objects:
                raise FileNotFoundError(path)
            return self._objects[path]

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._objects

    def list(self, prefix_dir: str, pattern: str) -> list[str]:
        with self._lock:
            pre = prefix_dir.rstrip("/") + "/"
            return sorted(
                p for p in self._objects
                if p.startswith(pre)
                and fnmatch.fnmatch(p[len(pre):], pattern))

    def delete(self, path: str) -> None:
        with self._lock:
            if path not in self._objects:
                raise FileNotFoundError(path)
            del self._objects[path]

    def put(self, path: str, data: str) -> None:
        with self._lock:
            self._objects[path] = data

    def put_if_absent(self, path: str, data: str) -> bool:
        with self._lock:
            if self.on_put is not None:
                hook, self.on_put = self.on_put, None
                hook(self._objects)
            if path in self._objects:
                return False
            self._objects[path] = data
            return True
