"""Tracker thread-safety under concurrent writers — the port of the
reference's race suite (tracker/tracker_race_test.go:21-91: 20 goroutines
hammering updates while a saver snapshots)."""

from __future__ import annotations

import threading
from datetime import date as Date, timedelta

from etl_gardener_spark.orchestrator import job as J
from etl_gardener_spark.orchestrator.job import Datasets, Job
from etl_gardener_spark.orchestrator.tracker import Tracker

N_THREADS = 20
N_UPDATES = 50


def test_concurrent_updates_and_saves(tmp_path):
    tr = Tracker(saver_path=str(tmp_path / "state.json"))
    jobs = [
        Job("b", "exp", f"dt{i}", Date(2024, 3, 1) + timedelta(days=i),
            datasets=Datasets("t", "r", "j"))
        for i in range(N_THREADS)
    ]
    for j in jobs:
        tr.add_job(j)

    errors: list[Exception] = []

    def hammer(job: Job):
        try:
            key = job.key()
            for i in range(N_UPDATES):
                tr.set_status(key, J.PARSING, f"update {i}")
                tr.heartbeat(key)
                tr.set_detail(key, f"detail {i}")
            tr.set_status(key, J.COMPLETE)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def saver():
        try:
            for _ in range(30):
                tr.save()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=hammer, args=(j,)) for j in jobs]
    threads.append(threading.Thread(target=saver))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors

    for j in jobs:
        st = tr.get_status(j.key())
        assert st.state == J.COMPLETE
        # every update accounted for: 1 init + parsing + complete states,
        # update_count monotone and >= the writes we issued
        assert st.update_count >= 2 * N_UPDATES

    # final snapshot round-trips
    assert tr.save(force=True)
    tr2 = Tracker(saver_path=str(tmp_path / "state.json"))
    assert tr2.job_count() == N_THREADS
