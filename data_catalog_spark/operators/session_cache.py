"""Bounded per-session memo store for cached DataFrames.

A cached DataFrame strongly pins the SparkSession its plan is bound to,
so an unbounded ``dict`` keyed on ``id(spark)`` retains every
``newSession()`` sibling an application ever creates — sessions, their
temp-view catalogs, and their plans all leak (r9 ADVICE on
kmeans._MODEL_CACHE / similarity._CODED_CACHE; test_kmeans had to clean
its sibling's entries by hand).  ``weakref`` cannot help directly: the
entry itself is what keeps the session alive, so a WeakValueDictionary
would never fire.  Instead the store is an LRU over SESSIONS — at most
``max_sessions`` distinct sessions' entries are retained, and admitting
a new session evicts the least-recently-used session's entries
wholesale, releasing that session (and everything its plans pin) to the
collector.  Long-lived apps with one or two sessions never evict;
session-churning apps are bounded by construction.

Eviction semantics (r10 ADVICE): dropping the Python reference alone
frees a ``localCheckpoint``'d DataFrame's executor blocks only after
Python GC → py4j finalizer → JVM ContextCleaner, so eviction also
best-effort ``unpersist``s every evicted DataFrame (recursing into
tuples/lists/dicts of them).  ``unpersist`` on a localCheckpoint'd frame
releases its StorageLevel blocks immediately; the checkpointed RDD
itself still rides the GC chain — that residual dependency is
documented here rather than papered over.  All mutating entry points
take a lock: Spark drivers legitimately submit jobs from multiple
threads, and OrderedDict.move_to_end during concurrent iteration is a
crash, not just a race.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Any, Hashable


def _release(value: Any) -> None:
    """Best-effort immediate unpersist of a cached value (a DataFrame, or
    a tuple/list/dict containing DataFrames).  Failures are swallowed:
    the session may already be stopped, and GC remains the backstop."""
    if isinstance(value, dict):
        values = list(value.values())
    elif isinstance(value, (list, tuple)):
        values = list(value)
    else:
        values = [value]
    for v in values:
        unpersist = getattr(v, "unpersist", None)
        if callable(unpersist):
            try:
                unpersist(False)  # non-blocking
            except Exception:
                pass


class SessionLRU:
    """Entries are ``(session_id, key) -> value`` with all of one
    session's entries living and dying together (a value is only safe to
    reuse from the session whose catalog its plan resolves against)."""

    def __init__(self, max_sessions: int = 4):
        self._by_session: OrderedDict[int, dict[Hashable, Any]] = OrderedDict()
        self._max = max_sessions
        self._lock = threading.Lock()

    def get(self, session_id: int, key: Hashable):
        with self._lock:
            entries = self._by_session.get(session_id)
            if entries is None:
                return None
            self._by_session.move_to_end(session_id)
            return entries.get(key)

    def put(self, session_id: int, key: Hashable, value) -> None:
        evicted: list[dict[Hashable, Any]] = []
        with self._lock:
            entries = self._by_session.setdefault(session_id, {})
            self._by_session.move_to_end(session_id)
            entries[key] = value
            while len(self._by_session) > self._max:
                evicted.append(self._by_session.popitem(last=False)[1])
        # unpersist outside the lock: it is a JVM round-trip per frame
        for bundle in evicted:
            for v in bundle.values():
                _release(v)

    def drop_session(self, session_id: int) -> None:
        with self._lock:
            entries = self._by_session.pop(session_id, None)
        if entries:
            for v in entries.values():
                _release(v)

    def sessions(self) -> list[int]:
        with self._lock:
            return list(self._by_session)

    def clear(self) -> None:
        with self._lock:
            dropped = list(self._by_session.values())
            self._by_session.clear()
        for bundle in dropped:
            for v in bundle.values():
                _release(v)
