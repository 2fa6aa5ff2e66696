"""Deferred-unpersist lifecycle for operators that return a lazy
plan over a persisted frame.

Several registered queries persist an intermediate frame that feeds
multiple consumers in the returned plan (the minhash signature table,
the distinct session/type set). The returned DataFrame is LAZY — the
caller collects later — so the function cannot unpersist its own
frame on exit; the established lifecycle is "the NEXT invocation
releases the previous invocation's frames".

The round-5 advisor flagged the original module-global list form:
two threads (or two sessions in one JVM) interleaving invocations
could unpersist a frame the other thread's un-collected plan still
needs, and the lists were unguarded. This helper fixes both:

- **Thread-scoped slots.** Frames are keyed by (operator key, thread
  id), so invocation N+1 on thread A releases only thread A's
  previous frames — a concurrent evaluation on thread B is never
  touched. (unpersist is correctness-safe regardless — Spark would
  just recompute — but releasing a sibling's frame silently voids
  the optimization it paid for.)
- **A lock around slot mutation**, so the pop/persist/store sequence
  is atomic under concurrent calls.

The last frame per (operator, thread) stays pinned until that
thread's next invocation or session end — the unavoidable cost of
handing out a lazy plan over cached data; ``release_all()`` lets
tests and long-lived hosts drop everything deterministically.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_SLOTS: dict[tuple[str, int], list[DataFrame]] = {}
_LOCK = threading.Lock()


def _release_slot(key: str, fresh: bool) -> None:
    """Drop (and unpersist) the slot's previous frames if ``fresh``.

    Must run BEFORE the new frames are persisted: Spark's CacheManager
    keys entries by canonicalized plan, so when invocation N+1 builds
    a plan identical to invocation N (the common repeated-call case),
    persisting the new frame first would be a no-op on the already
    cached entry and the subsequent unpersist of the "previous" frame
    would evict that shared entry — silently voiding the caching this
    helper exists to provide (round-6 advisor finding)."""
    if not fresh:
        return
    slot = (key, threading.get_ident())
    with _LOCK:
        prev = _SLOTS.pop(slot, [])
    for f in prev:
        f.unpersist()


def _store(key: str, frames: tuple[DataFrame, ...], fresh: bool) -> None:
    slot = (key, threading.get_ident())
    with _LOCK:
        if fresh:
            _SLOTS[slot] = list(frames)
        else:
            _SLOTS.setdefault(slot, []).extend(frames)


def persist_scoped(key: str, *frames: DataFrame, fresh: bool = True) -> None:
    """Persist ``frames`` under the (key, current-thread) slot.
    ``fresh=True`` (one call per operator invocation) first releases
    whatever the same slot held from a previous invocation;
    ``fresh=False`` appends to the slot (multi-stage operators that
    pin several frames across one logical invocation, e.g. zip_seq's
    inner with_seq calls). Release happens before persist — see
    :func:`_release_slot` for why the order is load-bearing."""
    _release_slot(key, fresh)
    for f in frames:
        f.persist()
    _store(key, frames, fresh)


def track_scoped(key: str, *frames: DataFrame, fresh: bool = True) -> None:
    """Track already-materialized frames (e.g. localCheckpoint
    results, whose blocks must also outlive the returned lazy plan)
    for release on the slot's next fresh store — without calling
    ``persist`` on them."""
    _release_slot(key, fresh)
    _store(key, frames, fresh)


def release_scoped(key: str) -> None:
    """Release the (key, current-thread) slot now — for operators
    that pin several frames via ``fresh=False`` appends and need one
    explicit drain point up front (e.g. zip_seq)."""
    _release_slot(key, fresh=True)


def release_all() -> None:
    """Unpersist every frame held by every slot (tests, shutdown)."""
    with _LOCK:
        held = [f for frames in _SLOTS.values() for f in frames]
        _SLOTS.clear()
    for f in held:
        f.unpersist()
