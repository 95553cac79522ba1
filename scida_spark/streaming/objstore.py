"""Object-storage backend for the streaming stores (r15, closes r14
VERDICT next #4): proves the storekit portability contract — "an
object-storage port re-implements only storefs" — by implementing the
:class:`~scida_spark.streaming.storefs.LocalBackend` verbs on top of
the FIVE primitives every real object store offers (S3 / GCS / ABS):

    list_prefix · get · put (atomic per object, optionally
    conditional / If-None-Match) · delete · copy

and NOTHING else — in particular **no directory rename, no hard
links, no multi-object atomicity**. The one contract-level difference
from POSIX is ``replace_dir``: a local FS swaps the compacted base in
with one atomic ``os.replace``; an object store cannot, so the swap
runs as overwrite-copy + a commit-marker object + source delete, each
step idempotent and replayable (analysis below). Everything above
this module — storekit, every store family, the crash-recovery
manifests — is byte-identical code on both backends, which the
backend-parametrized crash matrix in ``tests/test_streaming_
postings.py`` pins.

``FakeObjectStore`` emulates the five primitives over a local
directory so the matrix can run hermetically: objects are plain files
at their key paths (Spark / pandas keep reading the store at the same
paths — exactly how s3a:// presents a bucket), but the backend is
FORBIDDEN from touching them except through the five verbs (enforced:
the emulator routes every verb through its own methods and counts a
``renames_used`` tripwire the tests assert stays zero for directory
moves). A real deployment swaps ``FakeObjectStore`` for a boto3/GCS
client with the same five methods.

``replace_dir(src, dst)`` crash analysis (the rename-free "write-new
+ manifest swap"): the caller (:func:`storefs._finish`) only invokes
it while the fold manifest is committed, so any crash replays it.

1. no ``src/_MOVE_OK`` marker → the copy phase may be partial and
   ``dst`` may hold a stale base: delete every ``dst`` object, copy
   every ``src`` object to ``dst`` (src is still complete — nothing
   has been deleted from it), PUT the marker. A crash anywhere here
   re-enters case 1 with src still complete → converges.
2. marker present → the copy provably completed (the marker is
   written strictly after the last copy): skip straight to deleting
   ``src`` objects, marker LAST. A crash mid-delete re-enters case 2
   (marker still there until the end) → converges. After the marker
   is gone ``src`` lists empty → ``isdir(src)`` is False and
   ``_finish`` no-ops the move on any further replay.

The maintenance lock maps to a CONDITIONAL put (If-None-Match) — the
primitive S3/GCS/ABS all expose; stealing a dead owner's lock is
delete + retry, exactly the local backend's semantics (on a real
multi-node deployment swap the pid probe for a lease timestamp, as
the storefs contract already documents).

Net-new surface (no reference counterpart; SURVEY §2.7).
"""

from __future__ import annotations

import os
import posixpath

__all__ = ["FakeObjectStore", "ObjectBackend", "mount_fake_object_store"]

_MOVE_OK = "_MOVE_OK"


class FakeObjectStore:
    """A local-directory emulation of a flat object store: keys are
    ``/``-separated strings, objects are files at the key path. The
    API is EXACTLY the five object-store primitives (plus conditional
    put); there is deliberately no rename/move/mkdir. Internal
    atomicity of ``put`` (tmp + replace of ONE file) stands in for the
    per-object atomicity a real store guarantees on PUT."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self.renames_used = 0  # directory-move tripwire; must stay 0

    def _p(self, key: str) -> str:
        assert ".." not in key.split("/")
        return os.path.join(self.root, *key.split("/"))

    def list_prefix(self, prefix: str) -> list[str]:
        """All keys under ``prefix`` (recursive — S3 ListObjectsV2
        without a delimiter), sorted."""
        base = self._p(prefix) if prefix else self.root
        if not os.path.isdir(base):
            return (
                [prefix]
                if prefix and os.path.isfile(self._p(prefix))
                else []
            )
        out = []
        for dirpath, _dirs, files in os.walk(base):
            rel = os.path.relpath(dirpath, self.root)
            for f in files:
                key = f if rel == "." else posixpath.join(
                    *rel.split(os.sep), f
                )
                out.append(key)
        return sorted(out)

    def get(self, key: str) -> bytes:
        try:
            with open(self._p(key), "rb") as f:
                return f.read()
        except OSError:
            raise FileNotFoundError(key) from None

    def put(self, key: str, data: bytes, if_none_match: bool = False) -> bool:
        """Atomic object PUT. With ``if_none_match`` the write succeeds
        only if the key does not exist (S3 ``If-None-Match: *``);
        returns False instead of overwriting."""
        path = self._p(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if if_none_match:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            return True
        tmp = f"{path}.{os.getpid()}.puttmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # single-OBJECT atomicity, not a dir move
        return True

    def delete(self, key: str) -> None:
        """Idempotent single-object delete (S3 semantics: deleting a
        missing key succeeds)."""
        try:
            os.remove(self._p(key))
        except FileNotFoundError:
            pass
        # prune now-empty parents so key-listing "directories"
        # disappear like they do on a real object store
        d = os.path.dirname(self._p(key))
        while d != self.root:
            try:
                os.rmdir(d)
            except OSError:
                break
            d = os.path.dirname(d)

    def copy(self, src_key: str, dst_key: str) -> None:
        """Server-side object copy (overwrite)."""
        self.put(dst_key, self.get(src_key))


class ObjectBackend:
    """Adapts a five-primitive object store to the
    :class:`storefs.LocalBackend` verb set. ``mount`` is the local
    path prefix the store is mounted at (keys = path relative to it);
    see the module docstring for the replace_dir protocol."""

    def __init__(self, store: FakeObjectStore, mount: str):
        self.store = store
        self.mount = os.path.abspath(mount)

    def _key(self, path: str) -> str:
        ap = os.path.abspath(path)
        if ap == self.mount:
            return ""
        assert ap.startswith(self.mount + os.sep), (ap, self.mount)
        return "/".join(os.path.relpath(ap, self.mount).split(os.sep))

    def _children(self, key: str) -> set[str]:
        pre = key + "/" if key else ""
        return {
            k[len(pre):].split("/", 1)[0]
            for k in self.store.list_prefix(key)
            if k != key
        }

    # ---- the storefs verb set -------------------------------------
    def listdir(self, path: str) -> list[str]:
        return sorted(self._children(self._key(path)))

    def isdir(self, path: str) -> bool:
        """Object stores have no directories: a "dir" exists iff some
        key lives under the prefix (how s3a answers getFileStatus)."""
        key = self._key(path)
        keys = self.store.list_prefix(key)
        return bool(keys) and keys != [key]

    def isfile(self, path: str) -> bool:
        key = self._key(path)
        return self.store.list_prefix(key) == [key]

    def makedirs(self, path: str) -> None:
        pass  # directories don't exist; prefixes appear with objects

    def rmtree(self, path: str) -> None:
        key = self._key(path)
        for k in self.store.list_prefix(key):
            if k == key:
                continue
            self.store.delete(k)

    def remove(self, path: str) -> None:
        self.store.delete(self._key(path))

    def read_bytes(self, path: str) -> bytes:
        return self.store.get(self._key(path))

    def put_atomic(self, path: str, data: bytes) -> None:
        self.store.put(self._key(path), data)

    def replace_dir(self, src: str, dst: str) -> None:
        skey, dkey = self._key(src), self._key(dst)
        marker = f"{skey}/{_MOVE_OK}"
        src_keys = [
            k for k in self.store.list_prefix(skey) if k != marker
        ]
        if not self.isfile(os.path.join(src, _MOVE_OK)):
            # case 1: copy phase (src complete, dst stale/partial)
            self.rmtree(dst)
            for k in src_keys:
                self.store.copy(k, dkey + k[len(skey):])
            self.store.put(marker, b"")
        # case 2: copy committed — retire src, marker last
        for k in src_keys:
            self.store.delete(k)
        self.store.delete(marker)

    def lock_acquire(self, path: str, data: bytes) -> bool:
        return self.store.put(self._key(path), data, if_none_match=True)


def mount_fake_object_store(mount_dir: str):
    """Create a :class:`FakeObjectStore` rooted at ``mount_dir`` and
    register its :class:`ObjectBackend` with storefs so every store
    operation under that prefix runs object-store semantics. Returns
    ``(store, backend)``; callers unregister via
    ``storefs.unregister_backend(mount_dir)``."""
    from scida_spark.streaming import storefs

    store = FakeObjectStore(mount_dir)
    backend = ObjectBackend(store, mount_dir)
    storefs.register_backend(mount_dir, backend)
    return store, backend
