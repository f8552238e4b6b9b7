"""Process assembly — the reference's ``main()`` (cmd/gardener/gardener.go:222-309).

``Gardener.start`` wires config → tracker (with recovery) → iterators → job
service → monitor (+ standard actions) → Jobs API, and ``stop`` shuts the
loops down cleanly (the reference's errgroup teardown, gardener.go:292-308).
In-flight jobs resume after a restart because no leases survive it
(ops/ops.go:33-40) and every pipeline stage is idempotent.
"""

from __future__ import annotations

import os
import threading
from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from etl_gardener_spark.orchestrator.actions import StandardActions
from etl_gardener_spark.orchestrator.api import create_app, serve_background
from etl_gardener_spark.orchestrator.config import GardenerConfig
from etl_gardener_spark.orchestrator.curation import (
    STAGE_ORDER as CURATION_STAGE_ORDER,
    CurationActions,
    spec_for_config,
)
from etl_gardener_spark.orchestrator.iterators import (
    DailyIterator,
    HistoricalIterator,
    JobIterator,
)
from etl_gardener_spark.orchestrator.job import Job
from etl_gardener_spark.orchestrator.job_service import JobService
from etl_gardener_spark.orchestrator.monitor import Monitor
from etl_gardener_spark.orchestrator.tracker import Tracker
from etl_gardener_spark.sources.listing import has_files
from etl_gardener_spark.warehouse import Warehouse, recover_staging


class Gardener:
    def __init__(
        self,
        spark: SparkSession,
        config: GardenerConfig,
        warehouse_root: str,
        landing_root: str,
        schema_for: Callable[[Job], T.StructType],
        state_dir: str,
        daily_delay_sec: float = 10.5 * 3600,
        poll_period_sec: float | None = None,
        retry_delay_sec: float = 120.0,
        job_expiration_sec: float = 24 * 3600.0,
        cleanup_delay_sec: float = 3 * 3600.0,
    ):
        self.spark = spark
        self.config = config
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        # expiration/cleanup mirror the reference's flags
        # (-job_expiration_time / -job_cleanup_delay, gardener.go:56-57)
        self.tracker = Tracker(
            saver_path=os.path.join(state_dir, "tracker-state-v2.json"),
            expiration_sec=job_expiration_sec,
            cleanup_delay_sec=cleanup_delay_sec,
        )
        cursor_path = os.path.join(state_dir, "date-cursors.json")

        specs = [s.job_spec() for s in config.sources]
        daily = JobIterator(
            DailyIterator(
                delay_sec=daily_delay_sec,
                cursor_path=cursor_path,
                start=config.start_date,
            ),
            specs,
        )
        hist_specs = [s.job_spec() for s in config.historical_sources]
        historical = JobIterator(
            HistoricalIterator(config.start_date, cursor_path=cursor_path),
            hist_specs,
        )
        full_history = {s.datatype for s in config.sources if s.full_history}

        def probe(job: Job) -> bool:
            return has_files(self.spark, f"{landing_root}/{job.prefix()}")

        self.job_service = JobService(
            daily, historical, full_history=full_history, has_files=probe
        )
        self.monitor = Monitor(self.tracker, retry_delay_sec=retry_delay_sec)
        self.warehouse_root = warehouse_root
        wh = Warehouse(warehouse_root)
        StandardActions(
            spark,
            wh,
            landing_root,
            schema_for,
            self.tracker,
        ).install(self.monitor)
        # Optional post-Join curation chain: installed only when some
        # source opts in, and only the union of configured stages gets a
        # state — sources without curation keep the reference's exact
        # Joining -> Complete shape (orchestrator/curation.py).
        configured = tuple(
            s
            for s in CURATION_STAGE_ORDER
            if any(s in src.curation for src in config.sources)
        )
        if configured:
            CurationActions(spark, wh, spec_for_config(config)).install(
                self.monitor, stages=configured
            )
        self.app = create_app(self.tracker, self.job_service)
        self._poll_period = (
            poll_period_sec
            if poll_period_sec is not None
            else config.polling_interval_sec
        )
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []

    def start(
        self, api_port: int | None = None, cleanup_period_sec: float = 300.0
    ) -> None:
        # Crash recovery BEFORE any reads or job claims: complete staged
        # swaps interrupted in the delete-to-rename window and abort
        # half-written staging dirs (warehouse.recover_staging). No
        # other op can be in flight yet, so the un-age-gated sweep is
        # safe here (and only here).
        recovered = recover_staging(self.spark, self.warehouse_root)
        if recovered.get("failed"):
            # A staged swap could not be completed (FileSystem.rename
            # returned false): the affected partitions' only copies are
            # still under _staging, so serving reads would silently miss
            # those days. Fail the boot loudly instead.
            raise RuntimeError(
                "recover_staging could not complete staged swaps; "
                f"partitions stranded in _staging: {recovered['failed']}"
            )
        self._threads.append(self.monitor.watch(self._stop, self._poll_period))
        self._threads.append(self.tracker.save_every(60.0, self._stop))
        self._threads.append(self._cleanup_every(cleanup_period_sec))
        if api_port is not None:
            self._threads.append(serve_background(self.app, api_port))

    def _cleanup_every(self, period_sec: float) -> threading.Thread:
        """Expiration GC loop: purge stale jobs (24h without updates) and
        terminal jobs past the cleanup delay (tracker/tracker.go:353-377,
        scheduled from main in the reference)."""

        def loop():
            while not self._stop.wait(period_sec):
                self.tracker.cleanup()

        t = threading.Thread(target=loop, name="tracker-gc", daemon=True)
        t.start()
        return t

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            if t.daemon:
                continue
            t.join(timeout=10)
        self.monitor.shutdown()
        self.tracker.save(force=True)
