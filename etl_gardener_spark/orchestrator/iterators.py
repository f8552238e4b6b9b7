"""Date and job iterators — the dispatch side of the control plane.

Reference: job-service/iterators.go — DailyIterator (:34-85),
HistoricalIterator (:41-45, 114-128), JobIterator (:131-175). All iterators
persist their cursor before advancing (save-before-advance) so a crash never
skips or double-dispatches a date; clocks are injectable for tests (the
reference monkey-patches time in iterators_test.go:36-285).
"""

from __future__ import annotations

import time
from datetime import date as Date
from datetime import datetime, timedelta, timezone
from typing import Callable, Sequence

from etl_gardener_spark.orchestrator import persistence
from etl_gardener_spark.orchestrator.job import Job

DAY = 86400.0


def _utc_date(ts: float) -> Date:
    return datetime.fromtimestamp(ts, tz=timezone.utc).date()


class _Cursor:
    """Persisted date cursor (save-before-advance,
    job-service/iterators.go:60-71)."""

    def __init__(self, path: str | None, key: str, initial: Date):
        self._path = path
        self._key = key
        self.date = initial
        if path:
            data = persistence.load_json(path) or {}
            if key in data:
                self.date = Date.fromisoformat(data[key])

    def save(self, d: Date) -> None:
        if self._path:
            data = persistence.load_json(self._path) or {}
            data[self._key] = d.isoformat()
            persistence.save_json(self._path, data)
        self.date = d


class DailyIterator:
    """Emits yesterday's date once per day, gated until ``delay`` past UTC
    midnight (job-service/iterators.go:34-85; prod delay 10h30m,
    job-service/job-service.go:143 & README.md:13-15)."""

    def __init__(
        self,
        delay_sec: float = 10.5 * 3600,
        cursor_path: str | None = None,
        start: Date | None = None,
        clock: Callable[[], float] = time.time,
    ):
        self._delay = delay_sec
        self._clock = clock
        init = start if start is not None else _utc_date(clock())
        self._cursor = _Cursor(cursor_path, "daily", init)

    def next(self) -> Date | None:
        """The next unprocessed date, or None if it isn't ripe yet: date D is
        dispatchable once now >= D+1 day + delay."""
        d = self._cursor.date
        ripe_at = (
            datetime(d.year, d.month, d.day, tzinfo=timezone.utc).timestamp()
            + DAY
            + self._delay
        )
        if self._clock() < ripe_at:
            return None
        self._cursor.save(d + timedelta(days=1))  # save-before-return
        return d


class HistoricalIterator:
    """Sweeps start_date → (now - 36h), restarting at start_date when caught
    up — continuous reprocessing (job-service/iterators.go:41-45, 114-128)."""

    RESTART_GATE_SEC = 36 * 3600

    def __init__(
        self,
        start_date: Date,
        cursor_path: str | None = None,
        clock: Callable[[], float] = time.time,
    ):
        self._start = start_date
        self._clock = clock
        self._cursor = _Cursor(cursor_path, "historical", start_date)

    def next(self) -> Date:
        d = self._cursor.date
        gate = _utc_date(self._clock() - self.RESTART_GATE_SEC)
        if d >= gate:
            d = self._start  # caught up: restart the sweep
        self._cursor.save(d + timedelta(days=1))
        return d


class JobIterator:
    """Cross product dates × job specs: emits every configured spec for the
    current date (round-robin), then advances the date iterator
    (job-service/iterators.go:131-175)."""

    def __init__(self, date_iter, specs: Sequence[Job]):
        self._dates = date_iter
        self._specs = list(specs)
        self._pending: list[Job] = []

    def __len__(self) -> int:
        return len(self._specs)

    def next(self) -> Job | None:
        if not self._specs:
            return None
        if not self._pending:
            d = self._dates.next()
            if d is None:
                return None
            self._pending = [spec.with_date(d) for spec in self._specs]
        return self._pending.pop(0)
