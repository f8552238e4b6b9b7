"""Observability — Prometheus-compatible metrics without prometheus_client.

Reference: metrics/metrics.go:16-209. The same metric families are exposed
(started/completed/failed/warning counters, jobs gauge, tasks in flight,
state-date gauge, state-time / files / bytes histograms, query cost), with
the reference's names, so existing dashboards would keep working. The
exposition format is the Prometheus text format v0.0.4 — what
``promhttp.Handler`` serves — implemented in ~100 lines because
prometheus_client isn't available in this environment.

Spark analogue of "slot seconds": executor-CPU-seconds from the
``QueryExecutionListener``-visible task metrics; recorded by callers via
``QUERY_COST.observe``.
"""

from __future__ import annotations

import threading
from bisect import bisect_left


class _Labeled:
    """Base: one child per label-value tuple."""

    def __init__(self, name: str, help_: str, labels: tuple[str, ...] = ()):
        self.name = name
        self.help = help_
        self.label_names = labels
        self._lock = threading.Lock()
        REGISTRY.register(self)

    def _key(self, label_values: tuple) -> tuple:
        if len(label_values) != len(self.label_names):
            raise ValueError(
                f"{self.name}: expected labels {self.label_names}, got {label_values}"
            )
        return tuple(str(v) for v in label_values)

    @staticmethod
    def _fmt_labels(names, values) -> str:
        if not names:
            return ""
        inner = ",".join(f'{n}="{v}"' for n, v in zip(names, values))
        return "{" + inner + "}"


class Counter(_Labeled):
    def __init__(self, name, help_, labels=()):
        super().__init__(name, help_, labels)
        self._values: dict[tuple, float] = {}

    def inc(self, *label_values, amount: float = 1.0) -> None:
        k = self._key(label_values)
        with self._lock:
            self._values[k] = self._values.get(k, 0.0) + amount

    def value(self, *label_values) -> float:
        return self._values.get(self._key(label_values), 0.0)

    def expose(self) -> list[str]:
        out = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} counter"]
        for k, v in sorted(self._values.items()):
            out.append(f"{self.name}{self._fmt_labels(self.label_names, k)} {v}")
        return out


class Gauge(Counter):
    def set(self, *label_values, value: float) -> None:
        with self._lock:
            self._values[self._key(label_values)] = value

    def dec(self, *label_values, amount: float = 1.0) -> None:
        self.inc(*label_values, amount=-amount)

    def expose(self) -> list[str]:
        out = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} gauge"]
        for k, v in sorted(self._values.items()):
            out.append(f"{self.name}{self._fmt_labels(self.label_names, k)} {v}")
        return out


class Histogram(_Labeled):
    def __init__(self, name, help_, buckets: list[float], labels=()):
        super().__init__(name, help_, labels)
        self.buckets = sorted(buckets)
        self._counts: dict[tuple, list[int]] = {}
        self._sums: dict[tuple, float] = {}
        self._totals: dict[tuple, int] = {}

    def observe(self, *label_values, value: float) -> None:
        k = self._key(label_values)
        with self._lock:
            counts = self._counts.setdefault(k, [0] * len(self.buckets))
            # cumulative buckets: value counts toward every le >= value
            for j in range(bisect_left(self.buckets, value), len(self.buckets)):
                counts[j] += 1
            self._sums[k] = self._sums.get(k, 0.0) + value
            self._totals[k] = self._totals.get(k, 0) + 1

    def expose(self) -> list[str]:
        out = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} histogram"]
        for k in sorted(self._totals):
            for b, c in zip(self.buckets, self._counts[k]):
                lbl = self._fmt_labels(self.label_names + ("le",), k + (repr(b),))
                out.append(f"{self.name}_bucket{lbl} {c}")
            inf = self._fmt_labels(self.label_names + ("le",), k + ("+Inf",))
            out.append(f"{self.name}_bucket{inf} {self._totals[k]}")
            out.append(
                f"{self.name}_sum{self._fmt_labels(self.label_names, k)} {self._sums[k]}"
            )
            out.append(
                f"{self.name}_count{self._fmt_labels(self.label_names, k)} {self._totals[k]}"
            )
        return out


class Registry:
    def __init__(self):
        self._metrics: list[_Labeled] = []
        self._lock = threading.Lock()

    def register(self, m: _Labeled) -> None:
        with self._lock:
            self._metrics.append(m)

    def expose_text(self) -> str:
        lines: list[str] = []
        with self._lock:
            for m in self._metrics:
                lines.extend(m.expose())
        return "\n".join(lines) + "\n"


REGISTRY = Registry()

# -- The reference's metric families (metrics/metrics.go:16-209) ------------

STARTED = Counter(
    "gardener_started_total", "Number of date tasks started.", ("experiment", "datatype")
)
COMPLETED = Counter(
    "gardener_completed_total", "Number of date tasks completed.", ("experiment", "datatype")
)
FAILED = Counter(
    "gardener_failed_total", "Number of date tasks failed.", ("experiment", "datatype")
)
WARNINGS = Counter(
    "gardener_warning_total", "Warnings logged.", ("experiment", "datatype", "type")
)
JOBS_TOTAL = Gauge("gardener_jobs_total", "Number of jobs currently tracked.")
TASKS_IN_FLIGHT = Gauge(
    "gardener_tasks_in_flight", "Actions currently executing."
)
STATE_DATE = Gauge(
    "gardener_state_date", "Date (epoch sec) of the job in each state.",
    ("experiment", "datatype", "state"),
)
# Bucket ranges follow metrics/metrics.go:130-209 / ops/ops.go:46-60.
STATE_TIME = Histogram(
    "gardener_state_time_histogram", "Time spent in each state (sec).",
    [0.1, 1, 10, 60, 600, 3600, 4 * 3600, 12 * 3600], ("state",)
)
ACTION_DURATION = Histogram(
    "gardener_action_duration", "Action duration (sec).",
    [0.1, 1, 10, 100, 1000, 10000, 72000], ("action", "outcome")
)
FILES_PER_DATE = Histogram(
    "gardener_files", "Input files per date.",
    [1, 10, 100, 1000, 10000, 100000, 900000], ("experiment", "datatype")
)
BYTES_PER_DATE = Histogram(
    "gardener_bytes", "Input bytes per date.",
    [1e5, 1e6, 1e7, 1e8, 1e9, 1e10, 8e10], ("experiment", "datatype")
)
QUERY_COST = Histogram(
    "gardener_query_cost_seconds",
    "Executor-CPU-seconds per query (slot-seconds analogue).",
    [1, 10, 100, 1000, 10000, 1e5, 1e6, 4.64e7], ("datatype", "query")
)


def spark_task_seconds(spark) -> float:
    """Cumulative executor task time (seconds) from Spark's status store —
    the slot-seconds analogue (the reference records BigQuery SlotMillis,
    ops/actions.go:150-170): task time is how long tasks occupied
    executor slots, which is exactly what a slot-second measures. Driver-
    side metadata read, no job triggered. Callers record per-query cost
    as the delta around an action.

    Summed from per-stage ``executorRunTime`` (the same source bench.py
    uses), NOT ``ExecutorSummary.totalDuration``: the executor-level
    field was measured behaving as executor UPTIME on local-mode
    sessions — it grew 1 s per idle second with zero jobs running and
    read ≈ wall (parallelism 1.0) around a job that consumed 51
    CPU-seconds in 3.9 s of wall — so every delta taken from it was
    really wall-between-reads, not slot-seconds (r10 remeasurement;
    SCALE.md "task-seconds metric" note).

    Caveats, unlike per-job SlotMillis: the counter is session-global,
    so deltas taken around CONCURRENT ops each include the others'
    overlapping task time — per-query observations are upper bounds
    that over-count under concurrency (and are exact when ops run
    serially). And the sum spans only stages still in the status store;
    when old stages are evicted (``spark.ui.retainedStages`` cap) the
    counter can DECREASE, and callers' ``max(delta, 0)`` clamp then
    records a 0-cost query. On long-lived sessions, accumulate task
    time via a SparkListener (``onTaskEnd`` durations) instead of this
    store read. Treat the histogram as a cost-magnitude signal, not an
    additive ledger.
    """
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    empty = jvm.java.util.ArrayList()
    quantiles = sc._gateway.new_array(jvm.double, 0)
    stages = store.stageList(empty, False, False, quantiles, empty)
    total_ms = 0
    for i in range(stages.size()):
        total_ms += stages.apply(i).executorRunTime()
    return total_ms / 1000.0
