"""Monitor — the polling state-machine engine that applies Actions to jobs.

Reference: ops/ops.go — Action struct (:75-85), claim/release mutex set
(:107-124), outcome handling (:127-166), tryApplyAction + goroutine dispatch
(:169-221), 2-minute retry sleep (:182-184); outcome taxonomy ops/errors.go
(:12-57). Poll period: 5 s in prod (cmd/gardener/gardener.go:280).

Python mapping: a thread-pool replaces goroutines; outcomes are exceptions —
``RetryError`` → stay in state and back off, any other exception → Failed,
normal return → advance to the action's next state.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Callable

from etl_gardener_spark.orchestrator import metrics
from etl_gardener_spark.orchestrator.job import COMPLETE, FAILED, Job, Status
from etl_gardener_spark.orchestrator.tracker import Tracker


class RetryError(Exception):
    """Transient failure: stay in the current state and retry after backoff
    (ops/errors.go:12-57; e.g. BigQuery streaming-buffer contention,
    ops/actions.go:101-110)."""


@dataclass(frozen=True)
class Action:
    """State-transition operator (ops/ops.go:75-85): applied to jobs in
    ``state``; if ``condition`` holds, run ``action`` and advance to
    ``next_state``. A None action is a pure transition
    (ops/actions.go:23-27)."""

    state: str
    next_state: str
    action: Callable[[Job], str] | None = None  # returns a detail string
    condition: Callable[[Job], bool] | None = None
    annotation: str = ""


class Monitor:
    def __init__(
        self,
        tracker: Tracker,
        actions: dict[str, Action] | None = None,
        retry_delay_sec: float = 120.0,  # ops/ops.go:182-184
        max_workers: int = 8,
        clock: Callable[[], float] = time.time,
    ):
        self._tracker = tracker
        self._actions: dict[str, Action] = dict(actions or {})
        self._retry_delay = retry_delay_sec
        self._clock = clock
        self._claimed: set[str] = set()  # ops/ops.go:107-124
        self._retry_until: dict[str, float] = {}
        self._lock = threading.Lock()
        self._pool = ThreadPoolExecutor(
            max_workers=max_workers, thread_name_prefix="monitor"
        )

    def add_action(self, action: Action) -> None:
        self._actions[action.state] = action

    def get_action(self, state: str) -> Action | None:
        """The action currently wired for ``state`` (None if none) — lets
        an extension chain rewire a transition's next_state while keeping
        its action/condition (curation.CurationActions.install)."""
        return self._actions.get(state)

    # -- claim/release (ops/ops.go:107-124) --------------------------------

    def _claim(self, key: str) -> bool:
        with self._lock:
            if key in self._claimed:
                return False
            until = self._retry_until.get(key, 0.0)
            if self._clock() < until:
                return False
            self._claimed.add(key)
            return True

    def _release(self, key: str) -> None:
        with self._lock:
            self._claimed.discard(key)

    # -- one tick (ops/ops.go:198-221) -------------------------------------

    def tick(self) -> int:
        """Apply actions to every eligible job; returns jobs dispatched."""
        dispatched = 0
        for key, (job, status) in self._tracker.get_state().items():
            action = self._actions.get(status.state)
            if action is None:
                continue
            if not self._claim(key):
                continue
            dispatched += 1
            self._pool.submit(self._apply, key, job, action)
        return dispatched

    def _apply(self, key: str, job: Job, action: Action) -> None:
        """Run one action; record the reference's observability signals
        (action duration by outcome, time-in-state, completion/failure
        counters, in-flight gauge — metrics/metrics.go:16-209,
        ops/ops.go:46-60)."""
        t0 = time.monotonic()
        entered = time.time()
        st = self._tracker.get_status(key)
        if st is not None and st.history:
            entered = st.history[-1].start
        outcome = "ok"
        metrics.TASKS_IN_FLIGHT.inc()
        try:
            if action.condition is not None and not action.condition(job):
                outcome = "waiting"
                return  # condition not met; stay in state, try next tick
            detail = ""
            if action.action is not None:
                detail = action.action(job) or ""
            metrics.STATE_TIME.observe(action.state, value=time.time() - entered)
            self._tracker.set_status(key, action.next_state, detail)
            if action.next_state == COMPLETE:
                metrics.COMPLETED.inc(job.experiment, job.datatype)
        except RetryError as e:
            # Stay in state; back off before the next attempt
            # (ops/ops.go:182-184: 2 min sleep on Retry).
            outcome = "retry"
            self._tracker.set_detail(key, f"retry: {e}")
            with self._lock:
                self._retry_until[key] = self._clock() + self._retry_delay
        except Exception as e:  # Failure outcome (ops/ops.go:158-165)
            outcome = "failure"
            metrics.FAILED.inc(job.experiment, job.datatype)
            self._tracker.set_job_error(key, f"{type(e).__name__}: {e}")
        finally:
            metrics.TASKS_IN_FLIGHT.dec()
            metrics.ACTION_DURATION.observe(
                action.state, outcome, value=time.monotonic() - t0
            )
            self._release(key)

    # -- watch loop (ops/ops.go:198-221; 5s prod period) --------------------

    def watch(self, stop: threading.Event, period_sec: float = 5.0) -> threading.Thread:
        def loop():
            while not stop.wait(period_sec):
                self.tick()

        t = threading.Thread(target=loop, name="monitor-watch", daemon=True)
        t.start()
        return t

    def drain(self, timeout_sec: float = 60.0) -> bool:
        """Tick until no job has an applicable action (test/CLI helper).
        Returns True if quiescent before the timeout. The deadline is
        wall-clock (monotonic), independent of the injected state clock."""
        deadline = time.monotonic() + timeout_sec
        while time.monotonic() < deadline:
            if self.tick() == 0:
                with self._lock:
                    busy = bool(self._claimed)
                if not busy:
                    # also nothing waiting on a retry window?
                    pending = any(
                        self._actions.get(st.state) is not None
                        for _, st in self._tracker.get_state().values()
                    )
                    if not pending:
                        return True
            time.sleep(0.01)
        return False

    def shutdown(self) -> None:
        self._pool.shutdown(wait=True)
