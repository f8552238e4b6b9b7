"""Live HTTP round-trip: serve the Jobs API on a real port, drive it with
the parser-side JobsClient (reference client/v2/client_test.go:18-189)."""

from __future__ import annotations

import socket
import time
from datetime import date as Date
from datetime import datetime, timezone

import pytest

from etl_gardener_spark.orchestrator import job as J
from etl_gardener_spark.orchestrator.api import create_app, serve_background
from etl_gardener_spark.orchestrator.client import JobsClient
from etl_gardener_spark.orchestrator.iterators import HistoricalIterator, JobIterator
from etl_gardener_spark.orchestrator.job import Datasets, Job
from etl_gardener_spark.orchestrator.job_service import JobService
from etl_gardener_spark.orchestrator.tracker import Tracker


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture()
def served():
    clock = lambda: datetime(2024, 3, 10, tzinfo=timezone.utc).timestamp()
    tracker = Tracker(clock=clock)
    spec = Job(
        bucket="b",
        experiment="ndt",
        datatype="ndt7",
        date=Date(1970, 1, 1),
        datasets=Datasets("tmp_ndt", "raw_ndt", "ndt"),
    )
    svc = JobService(
        None,
        JobIterator(HistoricalIterator(Date(2024, 3, 5), clock=clock), [spec]),
        clock=clock,
    )
    port = _free_port()
    serve_background(create_app(tracker, svc), port)
    client = JobsClient(f"http://127.0.0.1:{port}")
    # wait for the server thread to accept
    for _ in range(100):
        try:
            client.heartbeat("warmup")
            break
        except Exception:
            time.sleep(0.05)
    return client, tracker


def test_client_full_lifecycle(served):
    client, tracker = served
    job, job_id = client.next_job()
    assert job is not None and job.date == Date(2024, 3, 5)
    assert job_id == job.key()
    assert job.datasets.raw == "raw_ndt"

    assert client.update(job_id, J.PARSING, "50%")
    assert client.heartbeat(job_id)
    assert client.update(job_id, J.PARSE_COMPLETE)
    st = tracker.get_status(job_id)
    assert st.state == J.PARSE_COMPLETE

    assert client.error(job_id, "tar truncated")
    assert tracker.get_status(job_id).state == J.PARSE_ERROR

    # unknown job id -> client surfaces failure (410 Gone)
    assert not client.update("nope/x/y/19700101", J.PARSING)
    assert not client.heartbeat("nope/x/y/19700101")
