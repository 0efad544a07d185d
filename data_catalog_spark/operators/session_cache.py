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
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Hashable


class SessionLRU:
    """Entries are ``(session_id, key) -> value`` with all of one
    session's entries living and dying together (a value is only safe to
    reuse from the session whose catalog its plan resolves against)."""

    def __init__(self, max_sessions: int = 4):
        self._by_session: OrderedDict[int, dict[Hashable, Any]] = OrderedDict()
        self._max = max_sessions

    def get(self, session_id: int, key: Hashable):
        entries = self._by_session.get(session_id)
        if entries is None:
            return None
        self._by_session.move_to_end(session_id)
        return entries.get(key)

    def put(self, session_id: int, key: Hashable, value) -> None:
        entries = self._by_session.setdefault(session_id, {})
        self._by_session.move_to_end(session_id)
        entries[key] = value
        while len(self._by_session) > self._max:
            self._by_session.popitem(last=False)

    def drop_session(self, session_id: int) -> None:
        self._by_session.pop(session_id, None)

    def sessions(self) -> list[int]:
        return list(self._by_session)

    def clear(self) -> None:
        self._by_session.clear()
