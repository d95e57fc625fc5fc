"""Filesystem abstraction for the SnapTable metadata/commit layer.

Everything the table layer does OUTSIDE of Spark jobs — manifest log
reads, the atomic version publish, staged-file listings, GC sweeps —
goes through a :class:`TableFS`. Spark's own data-file reads/writes
(``spark.read/write.parquet``) already ride Hadoop's filesystem layer
and need nothing from here; this module covers the driver-side metadata
I/O that `os.*` used to own, which is exactly the part that breaks on
an object store (no atomic ``os.link``, no cheap ``listdir``, no empty
directories, LIST-per-prefix pricing).

Two implementations:

- :class:`LocalFS` — POSIX semantics, byte-for-byte the behavior the
  engine always had. The commit primitive is ``os.link`` (hard-link
  fails atomically with EEXIST → a racing writer loses loudly).
- :class:`ArrowFS` — any ``pyarrow.fs.FileSystem`` (S3, GCS, HDFS, or
  the in-memory mock used by tests). Object stores have no
  create-exclusive primitive in the pyarrow API, so the commit
  protocol is **write + read-back token verification**: the manifest
  carries a writer-unique ``commit_uuid``; after the PUT the publisher
  reads the object back and compares tokens — if another writer's PUT
  won, the token differs and the loser raises instead of proceeding.
  On S3 (strongly consistent read-after-write since 2020) this detects
  every lost race, though unlike conditional-PUT the LOSER's bytes may
  briefly have been visible. A production S3 deployment should swap
  ``publish_atomic`` for a conditional PUT (``If-None-Match: *``,
  which S3 supports natively since 2024 — pyarrow just doesn't expose
  it); HDFS deployments get real atomicity from rename-without-
  overwrite. The protocol note lives in BASELINE.md. The engine's
  single-writer assumption (snaptable module docstring) makes
  token-verify a belt-and-braces check, not the only line of defense.

Recursive listings are ONE ``FileSelector(recursive=True)`` call per
tree — on S3 that is one paginated LIST per prefix instead of a
request per directory level, which is the difference between O(files)
and O(files × depth) round trips on every merge commit.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator, List, Optional, Tuple


class PublishConflict(RuntimeError):
    """The manifest version was already committed by another writer."""


class TableFS:
    """Metadata-layer filesystem interface (driver-side only).

    Paths are plain strings; implementations own any URI handling.
    ``list_*`` methods treat a missing directory as empty rather than
    raising — callers decide whether absence is an error.
    """

    def list_names(self, dir_path: str) -> List[str]:
        """Immediate child names (files and dirs) of ``dir_path``."""
        raise NotImplementedError

    def list_files_recursive(self, dir_path: str) -> List[Tuple[str, int]]:
        """All files under ``dir_path`` as (path relative to it, size)."""
        raise NotImplementedError

    def walk_stats(self, dir_path: str) -> Iterator[Tuple[str, float]]:
        """All files under ``dir_path`` as (relative path, mtime-seconds)."""
        raise NotImplementedError

    def isfile(self, path: str) -> bool:
        raise NotImplementedError

    def size(self, path: str) -> int:
        """File size in bytes; raises OSError if missing."""
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def append_text(self, path: str, text: str) -> None:
        raise NotImplementedError

    def publish_atomic(self, content: str, final_path: str) -> None:
        """Create ``final_path`` with ``content`` iff it does not exist;
        raise :class:`PublishConflict` if another writer got there first.
        ``content`` must embed a writer-unique token (the manifest's
        ``commit_uuid``) for implementations that verify by read-back."""
        raise NotImplementedError

    def delete(self, path: str, missing_ok: bool = True) -> None:
        raise NotImplementedError

    def prune_empty_dirs(self, top: str, stop: str) -> None:
        """Remove empty directories bottom-up under ``top``; never remove
        ``stop`` itself. No-op where directories don't exist (S3/GCS)."""
        raise NotImplementedError

    def open_input(self, path: str):
        """Binary-readable file object (for pyarrow readers)."""
        raise NotImplementedError


class LocalFS(TableFS):
    """POSIX implementation — the engine's original semantics."""

    def list_names(self, dir_path: str) -> List[str]:
        if not os.path.isdir(dir_path):
            return []
        return sorted(os.listdir(dir_path))

    def list_files_recursive(self, dir_path: str) -> List[Tuple[str, int]]:
        out = []
        for root, _dirs, names in os.walk(dir_path):
            for name in names:
                full = os.path.join(root, name)
                out.append(
                    (os.path.relpath(full, dir_path), os.path.getsize(full))
                )
        return sorted(out)

    def walk_stats(self, dir_path: str) -> Iterator[Tuple[str, float]]:
        for root, _dirs, names in os.walk(dir_path):
            for name in names:
                full = os.path.join(root, name)
                yield os.path.relpath(full, dir_path), os.path.getmtime(full)

    def isfile(self, path: str) -> bool:
        return os.path.isfile(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def append_text(self, path: str, text: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "a") as f:
            f.write(text)

    def publish_atomic(self, content: str, final_path: str) -> None:
        # os.link fails atomically with EEXIST if the version was already
        # committed — no exists() pre-check TOCTOU window, so a racing
        # writer loses loudly instead of silently clobbering the manifest
        # (this is Iceberg's optimistic-concurrency commit primitive on a
        # POSIX store)
        d = os.path.dirname(final_path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            f.write(content)
        try:
            os.link(tmp, final_path)
        except FileExistsError:
            os.unlink(tmp)
            raise PublishConflict(f"already committed at {final_path}")
        except OSError:
            os.unlink(tmp)
            raise
        os.unlink(tmp)

    def delete(self, path: str, missing_ok: bool = True) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            if not missing_ok:
                raise
        except OSError:
            if not missing_ok:
                raise

    def prune_empty_dirs(self, top: str, stop: str) -> None:
        if not os.path.isdir(top):
            return
        for root, _dirs, _names in os.walk(top, topdown=False):
            if root != stop and not os.listdir(root):
                try:
                    os.rmdir(root)
                except OSError:
                    pass

    def open_input(self, path: str):
        return open(path, "rb")


class ArrowFS(TableFS):
    """``pyarrow.fs.FileSystem``-backed implementation (S3/GCS/HDFS/mock).

    ``fs`` is a pyarrow FileSystem; paths handed to this class are the
    FS-internal form (no scheme), e.g. ``bucket/table/_log`` for S3 —
    exactly what ``pyarrow.fs.FileSystem.from_uri`` returns alongside
    the filesystem. See the module docstring for the commit protocol.
    """

    def __init__(self, fs) -> None:
        self.fs = fs

    def _infos(self, dir_path: str, recursive: bool):
        from pyarrow.fs import FileSelector

        try:
            return self.fs.get_file_info(
                FileSelector(
                    dir_path, recursive=recursive, allow_not_found=True
                )
            )
        except (FileNotFoundError, OSError):
            return []

    def list_names(self, dir_path: str) -> List[str]:
        return sorted(
            info.path.rsplit("/", 1)[-1]
            for info in self._infos(dir_path, recursive=False)
        )

    def list_files_recursive(self, dir_path: str) -> List[Tuple[str, int]]:
        from pyarrow.fs import FileType

        base = dir_path.rstrip("/") + "/"
        out = []
        for info in self._infos(dir_path, recursive=True):
            if info.type == FileType.File:
                rel = info.path[len(base):] if info.path.startswith(base) else info.path
                out.append((rel, info.size))
        return sorted(out)

    def walk_stats(self, dir_path: str) -> Iterator[Tuple[str, float]]:
        from pyarrow.fs import FileType

        base = dir_path.rstrip("/") + "/"
        for info in self._infos(dir_path, recursive=True):
            if info.type == FileType.File:
                rel = info.path[len(base):] if info.path.startswith(base) else info.path
                mtime = info.mtime.timestamp() if info.mtime is not None else 0.0
                yield rel, mtime

    def isfile(self, path: str) -> bool:
        from pyarrow.fs import FileType

        return self.fs.get_file_info(path).type == FileType.File

    def size(self, path: str) -> int:
        from pyarrow.fs import FileType

        info = self.fs.get_file_info(path)
        if info.type != FileType.File:
            raise OSError(f"not a file: {path}")
        return info.size

    def read_text(self, path: str) -> str:
        with self.fs.open_input_stream(path) as f:
            return f.read().decode("utf-8")

    def append_text(self, path: str, text: str) -> None:
        # object stores cannot append: read-modify-write the whole object.
        # Fine for the epoch-offsets log this backs (one short line per
        # epoch, reread only on restart); anything high-volume belongs in
        # the manifest protocol, not an append log.
        from pyarrow.fs import FileType

        old = ""
        if self.fs.get_file_info(path).type == FileType.File:
            old = self.read_text(path)
        self._mkdirs(path.rsplit("/", 1)[0])
        with self.fs.open_output_stream(path) as f:
            f.write((old + text).encode("utf-8"))

    def _mkdirs(self, dir_path: str) -> None:
        try:
            self.fs.create_dir(dir_path, recursive=True)
        except OSError:
            pass

    def publish_atomic(self, content: str, final_path: str) -> None:
        # write + read-back token verification (module docstring). The
        # pre-PUT existence check catches the common already-committed
        # case cheaply; the read-back catches the true race window. Swap
        # for a conditional PUT (If-None-Match: *) on stores that offer
        # one — pyarrow's API doesn't surface it yet.
        from pyarrow.fs import FileType

        if self.fs.get_file_info(final_path).type != FileType.NotFound:
            raise PublishConflict(f"already committed at {final_path}")
        self._mkdirs(final_path.rsplit("/", 1)[0])
        with self.fs.open_output_stream(final_path) as f:
            f.write(content.encode("utf-8"))
        if self.read_text(final_path) != content:
            raise PublishConflict(
                f"lost commit race at {final_path}: read-back does not "
                "match this writer's manifest (commit_uuid differs)"
            )

    def delete(self, path: str, missing_ok: bool = True) -> None:
        try:
            self.fs.delete_file(path)
        except (FileNotFoundError, OSError):
            if not missing_ok:
                raise

    def prune_empty_dirs(self, top: str, stop: str) -> None:
        # S3/GCS have no real directories — nothing to prune; HDFS empty
        # dirs are harmless metadata. Deliberate no-op: a recursive
        # listing per merge commit just to delete placeholders would be
        # pure LIST cost at scale.
        return

    def open_input(self, path: str):
        return self.fs.open_input_file(path)


def fs_for_path(path: str) -> Tuple[TableFS, str]:
    """Resolve (filesystem, fs-internal path) for a table root.

    No scheme or ``file://`` → :class:`LocalFS` with the plain path;
    any other scheme (``s3://``, ``gs://``, ``hdfs://``, ``mock://``)
    → :class:`ArrowFS` via ``pyarrow.fs.FileSystem.from_uri``.
    """
    if "://" not in path:
        return LocalFS(), path
    scheme = path.split("://", 1)[0]
    if scheme == "file":
        return LocalFS(), path.split("://", 1)[1]
    from pyarrow.fs import FileSystem

    fs, inner = FileSystem.from_uri(path)
    return ArrowFS(fs), inner
