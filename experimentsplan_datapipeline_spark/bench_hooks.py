"""Build-vs-query phase attribution for the bench harness (VERDICT r13
item 3).

The extended-bench entries that exercise the persisted-index operators
(`minhash_index_write`, `fingerprint_index_write`, `ann_index_write`)
construct their stage tables INSIDE the registered query body — that is
what a correctness oracle needs (the query must be self-contained), but
it means the timed number mixes Hive-catalog saveAsTable overhead
(measured ±20% between same-day quiet runs, BASELINE.md) with the query
path the bench exists to watch. A regression in the QUERY plan could
hide inside write-time noise.

This module is the zero-refactor split: the three top-level index
builders wrap their bodies in :func:`timed_build`, and bench.py brackets
each extended query with :func:`start_capture` / :func:`stop_capture` to
read back how much of the wall time was index construction. Outside a
capture window the hook is a no-op (two reads of a module global), so
the correctness gate, tests, and production callers pay nothing.

Deliberately NOT counted as build time: mid-stream epoch appends and
watermark-gated compactions — those are the live ingest path's actual
work, exactly what the bench should keep timing. Only the up-front
"stand up the stage index" builders report here.
"""

from __future__ import annotations

import contextlib
import functools
import time

_active: dict[str, float] | None = None


def start_capture() -> None:
    """Begin attributing index-build time; resets any prior window."""
    global _active
    _active = {"build_sec": 0.0, "builds": 0}


def stop_capture() -> dict[str, float]:
    """End the window; returns {'build_sec': total, 'builds': count}."""
    global _active
    out = _active if _active is not None else {"build_sec": 0.0, "builds": 0}
    _active = None
    out["build_sec"] = round(out["build_sec"], 3)
    return out


@contextlib.contextmanager
def timed_build():
    """Wrap an index-builder body; accumulates into the active window."""
    t0 = time.time()
    try:
        yield
    finally:
        if _active is not None:
            _active["build_sec"] += time.time() - t0
            _active["builds"] += 1


def build_timed(fn):
    """Decorator form of :func:`timed_build` for the index builders."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with timed_build():
            return fn(*args, **kwargs)

    return wrapper
