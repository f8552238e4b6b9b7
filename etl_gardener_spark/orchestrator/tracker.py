"""Tracker — the persistent job state machine (reference tracker/tracker.go).

Semantics ported 1:1:

* ``add_job`` registers a job in Init; re-adding is an error unless the
  existing entry is terminal (Complete/Failed), which allows reprocessing
  (tracker/tracker.go:221-246).
* ``set_status`` appends a StateInfo when the state changes, else updates
  the detail of the current state; terminal states detach the job from the
  active set (tracker/tracker.go:299-323).
* ``heartbeat`` bumps the liveness timestamp (tracker/tracker.go:326-333).
* ``set_job_error`` transitions to Failed with the error recorded
  (tracker/tracker.go:336-349).
* Expiration GC: jobs with no updates for ``expiration`` are purged; jobs
  in a terminal state are removed after ``cleanup_delay``
  (tracker/tracker.go:353-377; prod values 24h/3h,
  cmd/gardener/gardener.go:56-57).
* Periodic JSON snapshot with skip-if-unmodified, recovery on start
  (tracker/tracker.go:60-104, 174-204; persistence/persistence.go:25-44).

Thread-safety: one lock around the maps — same design as the reference
(tracker/tracker.go:26-31); contention is negligible at control-plane rates.
"""

from __future__ import annotations

import threading
import time
from typing import Callable

from etl_gardener_spark.orchestrator import metrics, persistence
from etl_gardener_spark.orchestrator.job import (
    COMPLETE,
    FAILED,
    INIT,
    PARSE_ERROR,
    Job,
    Status,
    new_status,
)


def _go_time_to_epoch(s: str | None) -> float:
    """RFC3339 (Go time.Time JSON) -> epoch seconds; Go's zero time
    (0001-01-01T00:00:00Z) maps to 0.0 like an unset heartbeat."""
    if not s:
        return 0.0
    from datetime import datetime as _dt

    t = _dt.fromisoformat(s.replace("Z", "+00:00"))
    if t.year <= 1:
        return 0.0
    return t.timestamp()


def _from_reference_v2(data: dict) -> tuple[dict[str, Job], dict[str, Status]]:
    """Convert the reference's saver-struct v2 snapshot (capitalized Go
    field names, RFC3339 times; tracker/tracker.go:60-104 and
    tracker/job.go:28-45, 208-245) into Job/Status maps. Jobs with no
    dataset names at all are dropped — the reference's own migration
    guard (cmd/gardener/gardener.go:188-202)."""
    from datetime import datetime as _dt

    from etl_gardener_spark.orchestrator.job import Datasets, StateInfo

    jobs: dict[str, Job] = {}
    for key, j in (data.get("Jobs") or {}).items():
        ds = j.get("Datasets") or {}
        datasets = Datasets(
            tmp=ds.get("Tmp", ""), raw=ds.get("Raw", ""), join=ds.get("Join", "")
        )
        if not (datasets.tmp or datasets.raw or datasets.join):
            continue
        day = _dt.fromisoformat(j["Date"].replace("Z", "+00:00")).date()
        jobs[key] = Job(
            bucket=j.get("Bucket", ""),
            experiment=j.get("Experiment", ""),
            datatype=j.get("Datatype", ""),
            date=day,
            filter=j.get("Filter", ""),
            datasets=datasets,
        )
    statuses: dict[str, Status] = {}
    for key, s in (data.get("Statuses") or {}).items():
        statuses[key] = Status(
            history=[
                StateInfo(
                    state=h.get("State", ""),
                    start=_go_time_to_epoch(h.get("Start")),
                    detail_time=_go_time_to_epoch(h.get("DetailTime")),
                    detail=h.get("Detail", ""),
                )
                for h in (s.get("History") or [])
            ],
            heartbeat_time=_go_time_to_epoch(s.get("HeartbeatTime")),
            update_count=int(s.get("UpdateCount", 0)),
        )
    return jobs, statuses


class JobExistsError(Exception):
    """Raised when adding a job whose key is already active
    (tracker/tracker.go:230-236)."""


class JobNotFoundError(Exception):
    """Raised for updates against an unknown job key
    (tracker/tracker.go:253-257)."""


class Tracker:
    def __init__(
        self,
        saver_path: str | None = None,
        expiration_sec: float = 24 * 3600.0,
        cleanup_delay_sec: float = 3 * 3600.0,
        clock: Callable[[], float] = time.time,
    ):
        self._lock = threading.Lock()
        self._jobs: dict[str, Job] = {}
        self._statuses: dict[str, Status] = {}
        self._saver_path = saver_path
        self._expiration = expiration_sec
        self._cleanup_delay = cleanup_delay_sec
        self._clock = clock
        self._dirty = False
        self._last_init_count = 0
        if saver_path:
            self._recover()

    # -- CRUD (tracker/tracker.go:221-349) --------------------------------

    def add_job(self, job: Job) -> None:
        with self._lock:
            key = job.key()
            old = self._statuses.get(key)
            if old is not None and not old.is_terminal():
                raise JobExistsError(key)
            self._jobs[key] = job
            self._statuses[key] = new_status(self._clock())
            self._dirty = True

    def set_status(self, key: str, state: str, detail: str = "") -> None:
        with self._lock:
            st = self._require(key)
            now = self._clock()
            changed = st.state != state
            if changed:
                st.new_state(state, now)
            if detail:
                st.set_detail(detail, now)
            st.heartbeat_time = now
            self._dirty = True
            job = self._jobs.get(key)
        if changed and job is not None:
            # gardener_state_date: per-state progress gauge — the date
            # (epoch sec) of the job most recently entering each state
            # (metrics/metrics.go:91-101)
            import calendar

            metrics.STATE_DATE.set(
                job.experiment,
                job.datatype,
                state,
                value=float(calendar.timegm(job.date.timetuple())),
            )

    def set_detail(self, key: str, detail: str) -> None:
        with self._lock:
            st = self._require(key)
            st.set_detail(detail, self._clock())
            self._dirty = True

    def heartbeat(self, key: str) -> None:
        with self._lock:
            st = self._require(key)
            st.heartbeat_time = self._clock()
            self._dirty = True

    def set_job_error(self, key: str, error: str, state: str = FAILED) -> None:
        """Record a failure; parsers report ParseError, pipeline actions
        report Failed (tracker/tracker.go:336-349, handler.go:83-107)."""
        with self._lock:
            st = self._require(key)
            st.new_state(state, self._clock())
            st.set_detail(error, self._clock())
            self._dirty = True

    def get_status(self, key: str) -> Status | None:
        with self._lock:
            return self._statuses.get(key)

    def get_state(self) -> dict[str, tuple[Job, Status]]:
        """Snapshot of all tracked jobs (tracker/tracker.go:380-389) —
        what the Monitor iterates each tick."""
        with self._lock:
            return {
                k: (self._jobs[k], self._statuses[k])
                for k in self._jobs
                if k in self._statuses
            }

    def job_count(self) -> int:
        with self._lock:
            return len(self._jobs)

    def _require(self, key: str) -> Status:
        st = self._statuses.get(key)
        if st is None:
            raise JobNotFoundError(key)
        return st

    # -- Expiration GC (tracker/tracker.go:353-377) ------------------------

    def cleanup(self) -> list[str]:
        """Purge stale jobs (no update for ``expiration``) and terminal jobs
        older than ``cleanup_delay``; returns removed keys."""
        removed = []
        now = self._clock()
        with self._lock:
            for key in list(self._statuses):
                st = self._statuses[key]
                age = now - st.updated()
                if st.is_terminal() and age > self._cleanup_delay:
                    removed.append(key)
                elif self._expiration and age > self._expiration:
                    removed.append(key)
            for key in removed:
                self._statuses.pop(key, None)
                self._jobs.pop(key, None)
            if removed:
                self._dirty = True
        return removed

    # -- Persistence (tracker/tracker.go:60-104, 174-204) ------------------

    def save(self, force: bool = False) -> bool:
        """JSON snapshot; skipped when unmodified since the last save
        (tracker/tracker.go:174-204). Returns True if written."""
        if not self._saver_path:
            return False
        with self._lock:
            if not self._dirty and not force:
                return False
            snapshot = {
                "save_time": self._clock(),
                "jobs": {k: j.to_dict() for k, j in self._jobs.items()},
                "statuses": {k: s.to_dict() for k, s in self._statuses.items()},
            }
            self._dirty = False
        persistence.save_json(self._saver_path, snapshot)
        return True

    def _recover(self) -> None:
        """Load-on-start; jobs lacking datasets are pruned like the
        reference's migration guard (cmd/gardener/gardener.go:188-202).

        Accepts BOTH this tracker's snake_case snapshots and the
        reference's persisted saver-struct v2 format
        (tracker/tracker.go:60-104; golden file
        tracker/testdata/saver-struct-v2.json), so a reference deployment
        can point this tracker at its existing state file and recover."""
        data = persistence.load_json(self._saver_path)
        if not data:
            return
        if "Jobs" in data or "Statuses" in data:
            jobs, statuses = _from_reference_v2(data)
        else:
            jobs = {k: Job.from_dict(j) for k, j in data.get("jobs", {}).items()}
            statuses = {
                k: Status.from_dict(s)
                for k, s in data.get("statuses", {}).items()
            }
        self._jobs = {k: j for k, j in jobs.items() if k in statuses}
        self._statuses = {k: s for k, s in statuses.items() if k in self._jobs}

    def save_every(self, period_sec: float, stop: threading.Event) -> threading.Thread:
        """Background snapshot loop (cmd/gardener/gardener.go:195: 1 min)."""

        def loop():
            while not stop.wait(period_sec):
                self.save()
            self.save(force=True)

        t = threading.Thread(target=loop, name="tracker-saver", daemon=True)
        t.start()
        return t
