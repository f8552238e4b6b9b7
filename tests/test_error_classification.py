"""Error classification (ops/actions.go:97-138 analogue) and the live
monitor watch loop."""

from __future__ import annotations

import threading
import time
from datetime import date as Date

from etl_gardener_spark.orchestrator import job as J
from etl_gardener_spark.orchestrator.actions import classify
from etl_gardener_spark.orchestrator.job import Datasets, Job
from etl_gardener_spark.orchestrator.monitor import Action, Monitor, RetryError
from etl_gardener_spark.orchestrator.tracker import Tracker


def test_classify_transient_vs_permanent():
    assert isinstance(classify(RuntimeError("FetchFailed: shuffle lost")), RetryError)
    assert isinstance(classify(OSError("Connection refused by peer")), RetryError)
    assert isinstance(classify(RuntimeError("Timeout waiting for task")), RetryError)
    perm = classify(ValueError("PATH_NOT_FOUND: /nope"))
    assert isinstance(perm, ValueError) and not isinstance(perm, RetryError)


def test_watch_loop_ticks_on_its_own():
    tr = Tracker()
    mon = Monitor(tr, retry_delay_sec=0.01)
    mon.add_action(Action(J.INIT, J.COMPLETE, lambda j: "done"))
    job = Job("b", "e", "d", Date(2024, 3, 1), datasets=Datasets("t", "r", "j"))
    stop = threading.Event()
    t = mon.watch(stop, period_sec=0.05)
    try:
        tr.add_job(job)  # added AFTER the loop starts; a tick must find it
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            st = tr.get_status(job.key())
            if st.state == J.COMPLETE:
                break
            time.sleep(0.02)
        assert tr.get_status(job.key()).state == J.COMPLETE
    finally:
        stop.set()
        t.join(timeout=5)
        mon.shutdown()
