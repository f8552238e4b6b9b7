"""Jobs HTTP API + status/health endpoints (Flask).

Reference routes and status codes reproduced exactly
(tracker/handler.go:32-159):

    POST /v2/job/next       → 200 + JobWithTarget JSON | 405 | 500 (no job /
                              job exists — body carries the reference's
                              message strings)
    POST /v2/job/update     → form id,state[,detail]; 405 / 400 / 422 (no
                              id) / 424 (no state) / 410 (unknown id) / 200
    POST /v2/job/heartbeat  → form id; 405 / 400 / 422 / 410 / 200
    POST /v2/job/error      → form id,error; errors put the job in
                              parseError state; 405 / 400 / 422 / 424 /
                              410 / 200

Plus the operational pages (cmd/gardener/gardener.go:129-186,
tracker/job.go:381-443): ``/`` HTML job table sorted by age, ``/alive``,
``/ready``, and ``/metrics`` (Prometheus text).
"""

from __future__ import annotations

import threading
from html import escape

from flask import Flask, Response, jsonify, request

from etl_gardener_spark.orchestrator import metrics
from etl_gardener_spark.orchestrator.job_service import JobService
from etl_gardener_spark.orchestrator.tracker import JobExistsError, Tracker

MSG_NO_JOB = "No job found. Try again."
MSG_JOB_EXISTS = "Job already exists. Try again."


def create_app(tracker: Tracker, job_service: JobService | None = None) -> Flask:
    app = Flask("etl_gardener_spark")

    def _form_id():
        return request.form.get("id", "")

    @app.post("/v2/job/next")
    def next_job():
        if job_service is None:
            return Response(MSG_NO_JOB, status=500)
        job = job_service.next_job()
        if job is None:
            return Response(MSG_NO_JOB, status=500)
        try:
            tracker.add_job(job)
        except JobExistsError:
            return Response(MSG_JOB_EXISTS, status=500)
        metrics.STARTED.inc(job.experiment, job.datatype)
        metrics.JOBS_TOTAL.set(value=tracker.job_count())
        return jsonify({"id": job.key(), **job.to_dict()})

    @app.post("/v2/job/update")
    def update():
        id_ = _form_id()
        if not id_:
            return Response(status=422)
        state = request.form.get("state", "")
        if not state:
            return Response(status=424)
        detail = request.form.get("detail", "")
        try:
            tracker.set_status(id_, state, detail)
        except Exception:
            return Response(status=410)
        return Response(status=200)

    @app.post("/v2/job/heartbeat")
    def heartbeat():
        id_ = _form_id()
        if not id_:
            return Response(status=422)
        try:
            tracker.heartbeat(id_)
        except Exception:
            return Response(status=410)
        return Response(status=200)

    @app.post("/v2/job/error")
    def error():
        id_ = _form_id()
        if not id_:
            return Response(status=422)
        job_err = request.form.get("error", "")
        if not job_err:
            return Response(status=424)
        try:
            # Parser-reported errors land in parseError (handler.go:103)
            tracker.set_status(id_, "parseError", job_err)
        except Exception:
            return Response(status=410)
        return Response(status=200)

    # Non-POST on the job routes → 405 (handler.go:33-35), which Flask's
    # method routing already produces.

    @app.get("/alive")
    def alive():
        return "ok"

    @app.get("/ready")
    def ready():
        return "ok"

    @app.get("/metrics")
    def metrics_endpoint():
        return Response(
            metrics.REGISTRY.expose_text(),
            mimetype="text/plain; version=0.0.4",
        )

    @app.get("/")
    def status_page():
        """HTML job table sorted by age (tracker/job.go:381-443)."""
        rows = []
        state = tracker.get_state()
        for key, (job, st) in sorted(
            state.items(), key=lambda kv: kv[1][1].started()
        ):
            rows.append(
                "<tr>"
                f"<td>{escape(key)}</td><td>{escape(st.state)}</td>"
                f"<td>{st.update_count}</td><td>{escape(st.detail)}</td>"
                "</tr>"
            )
        body = (
            "<html><body><h1>Jobs</h1>"
            "<table border=1><tr><th>Job</th><th>State</th>"
            "<th>Updates</th><th>Detail</th></tr>"
            + "".join(rows)
            + "</table></body></html>"
        )
        return Response(body, mimetype="text/html")

    return app


def serve_background(app: Flask, port: int) -> threading.Thread:
    """Run the API in a daemon thread (tests / local ops)."""
    t = threading.Thread(
        target=lambda: app.run(
            host="127.0.0.1", port=port, debug=False, use_reloader=False
        ),
        daemon=True,
    )
    t.start()
    return t
