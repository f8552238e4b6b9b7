"""Job service — priority merge of daily and historical work.

Reference: job-service/job-service.go — ``NextJob`` (:40-71): prefer the
daily iterator's job if one is ripe; otherwise take the next historical job,
skipping dates older than one year unless the spec is marked
``full_history`` (:50-66) and skipping source prefixes with no files
(:73-85, via Job.HasFiles = our sources.listing.has_files).
"""

from __future__ import annotations

import threading
import time
from datetime import timedelta
from typing import Callable

from etl_gardener_spark.orchestrator.iterators import JobIterator, _utc_date
from etl_gardener_spark.orchestrator.job import Job

YEAR_DAYS = 365


class JobService:
    def __init__(
        self,
        daily: JobIterator | None,
        historical: JobIterator | None,
        full_history: set[str] = frozenset(),
        has_files: Callable[[Job], bool] | None = None,
        clock: Callable[[], float] = time.time,
    ):
        """``full_history``: datatypes exempt from the 1-year cutoff.
        ``has_files``: probe for source data (None = assume present)."""
        self._daily = daily
        self._hist = historical
        self._full_history = set(full_history)
        self._has_files = has_files
        self._clock = clock
        self._lock = threading.Lock()

    def next_job(self) -> Job | None:
        with self._lock:
            if self._daily is not None:
                job = self._daily.next()
                if job is not None and self._admissible(job):
                    return job
            if self._hist is None:
                return None
            # Bounded scan: at most one full round of specs per call
            # (job-service/job-service.go:56-67).
            for _ in range(max(1, len(self._hist))):
                job = self._hist.next()
                if job is None:
                    return None
                if self._admissible(job):
                    return job
            return None

    def _admissible(self, job: Job) -> bool:
        last_year = _utc_date(self._clock()) - timedelta(days=YEAR_DAYS)
        if job.date < last_year and job.datatype not in self._full_history:
            return False
        if self._has_files is not None and not self._has_files(job):
            return False
        return True
