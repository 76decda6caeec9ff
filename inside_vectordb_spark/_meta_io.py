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
    """Load a JSON control file; None if absent."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


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
