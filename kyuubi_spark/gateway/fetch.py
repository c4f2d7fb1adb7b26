"""Fetch cursors for paged result retrieval.

Mirrors the reference's FetchIterator trio
(kyuubi-common/.../operation/FetchIterator.scala:23-128):

- `ArrayFetchIterator` — fully materialized results; supports FETCH_NEXT,
  FETCH_PRIOR and absolute repositioning.
- `IterableFetchIterator` — incremental results (e.g. toLocalIterator);
  forward-only. As in the reference (:121-128), absolute/prior fetches that
  would rewind are no-ops past the consumed prefix — documented limitation.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any


class FetchIterator:
    """Cursor over result rows with a fetch window.

    ``fetch_absolute(pos)`` positions the window start; ``take(n)`` returns
    the next n rows and advances. ``position`` is the start of the last
    returned window; ``fetch_start`` tracks it for PRIOR re-fetches.
    """

    def fetch_next(self) -> None:
        raise NotImplementedError

    def fetch_absolute(self, pos: int) -> None:
        raise NotImplementedError

    def fetch_prior(self, size: int) -> None:
        self.fetch_absolute(max(0, self.fetch_start - size))

    @property
    def fetch_start(self) -> int:
        raise NotImplementedError

    def take(self, n: int) -> list[Any]:
        raise NotImplementedError


class ArrayFetchIterator(FetchIterator):
    def __init__(self, rows: list[Any]):
        self._rows = rows
        self._start = 0  # start of the current fetch window
        self._pos = 0  # next row to serve

    @property
    def fetch_start(self) -> int:
        return self._start

    def fetch_next(self) -> None:
        self._start = self._pos

    def fetch_absolute(self, pos: int) -> None:
        pos = max(0, min(pos, len(self._rows)))
        self._start = pos
        self._pos = pos

    def take(self, n: int) -> list[Any]:
        self._start = self._pos
        out = self._rows[self._pos : self._pos + n]
        self._pos += len(out)
        return out


class IterableFetchIterator(FetchIterator):
    def __init__(self, iterable: Iterable[Any]):
        self._iter: Iterator[Any] = iter(iterable)
        self._start = 0
        self._pos = 0
        self._exhausted = False

    @property
    def fetch_start(self) -> int:
        return self._start

    def fetch_next(self) -> None:
        self._start = self._pos

    def fetch_absolute(self, pos: int) -> None:
        # Forward skips are honored; rewinds are no-ops (reference
        # FetchIterator.scala:121-128 — iterable cursors cannot go back).
        while self._pos < pos and not self._exhausted:
            try:
                next(self._iter)
                self._pos += 1
            except StopIteration:
                self._exhausted = True
        self._start = self._pos

    def take(self, n: int) -> list[Any]:
        self._start = self._pos
        out: list[Any] = []
        for _ in range(n):
            try:
                out.append(next(self._iter))
                self._pos += 1
            except StopIteration:
                self._exhausted = True
                break
        return out
