"""Metadata I/O seam for index/snapshot control files.

Every persisted artifact in the engine (ANN indexes, snapshot logs)
stores its DATA as parquet — which Spark already reads/writes through
any Hadoop-compatible filesystem — but its tiny CONTROL files
(meta.json, _log.json) were written with raw ``os``/``json``/
``shutil`` calls scattered across operators. This module is the single
seam those calls now go through, so a real deployment swaps ONE module
for an object-store client (S3/GCS/ABFS via fsspec or dbutils) without
touching operator code. In-container it is the local filesystem.

Writes are ATOMIC: JSON lands in a temp file in the same directory and
is ``os.replace``d onto the target, so a crash or concurrent reader
mid-write sees either the old complete file or the new complete file,
never a truncated one. (POSIX rename atomicity; object stores give the
same guarantee via single-PUT visibility.)
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any


def join(base: str, *parts: str) -> str:
    """Path join under the metadata base URI."""
    return os.path.join(base, *parts)


def artifacts_root() -> str:
    """THE repo-local artifact cache root (``.artifacts``). Review r7
    found four independent derivations of this directory across the
    registry modules (triple-dirname with and without abspath, an
    os.pardir variant) — paths that resolve to the same directory
    only by filesystem grace. Persisted-index sharing between modules
    (compare.py probing the index ann.py built) depends on the
    derivations agreeing, so there is exactly one now."""
    pkg = os.path.dirname(os.path.abspath(__file__))
    return os.path.abspath(os.path.join(os.path.dirname(pkg), ".artifacts"))


def exists(path: str) -> bool:
    return os.path.exists(path)


def is_dir(path: str) -> bool:
    return os.path.isdir(path)


def makedirs(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def remove_tree(path: str) -> None:
    """Remove a directory tree if present (no-op when missing)."""
    shutil.rmtree(path, ignore_errors=True)


def remove_file(path: str) -> None:
    """Remove a single control file if present (no-op when missing).
    Invalidating a completeness marker MUST go through the seam: on an
    object-store deployment a raw ``os.remove`` would silently no-op
    and revive the stale-meta-over-torn-data window the marker
    protocol exists to close (advice r6)."""
    try:
        os.remove(path)
    except FileNotFoundError:
        pass


def read_json(path: str) -> dict[str, Any] | None:
    """Load a JSON control file; None if absent. Absence is detected
    by the open() itself, not an exists() pre-check — a marker removed
    between check and open (``_begin_rebuild`` invalidating meta.json
    under a concurrent probe) must read as "absent", never crash the
    reader (review r8)."""
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


from contextlib import contextmanager


@contextmanager
def commit_lock(base: str, timeout_sec: float = 30.0):
    """Advisory inter-process lock for read-modify-write commits on a
    control file (the snapshot log's version-select → data-write →
    log-rewrite sequence). ``write_json`` makes each single write
    atomic, but two concurrent committers could both read versions=[1]
    and both commit v=2 — one committer's data silently vanishing from
    the log (review r8). O_CREAT|O_EXCL on ``_commit.lock`` is atomic
    on POSIX and maps to if-absent PUT preconditions on object stores.
    A crashed holder leaves the lock behind by design — commits then
    FAIL LOUDLY (with the lock's age in the message) instead of
    racing; remove the file after verifying the holder is gone."""
    os.makedirs(base, exist_ok=True)
    lock = os.path.join(base, "_commit.lock")
    import time

    deadline = time.monotonic() + timeout_sec
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            break
        except FileExistsError:
            if time.monotonic() >= deadline:
                try:
                    age = time.time() - os.path.getmtime(lock)
                except OSError:
                    age = float("nan")
                raise TimeoutError(
                    f"commit lock {lock!r} held for the whole "
                    f"{timeout_sec}s wait (lock age {age:.0f}s) — another "
                    "committer is active, or a crashed one left the lock; "
                    "verify and remove the file to recover"
                )
            time.sleep(0.05)
    try:
        yield
    finally:
        remove_file(lock)


def write_json(path: str, obj: Any, indent: int | None = None) -> None:
    """Atomically (re)write a JSON control file: temp file in the same
    directory + ``os.replace`` — readers never observe a partial
    write, which is the property commit logs depend on."""
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(prefix=".tmp_", suffix=".json", dir=d)
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=indent)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
