"""Jobs-API client — what a parser process embeds (reference client/v2/client.go).

Same four calls, same form encoding, 1-minute timeout per request
(client/v2/client.go:29-81).
"""

from __future__ import annotations

import requests

from etl_gardener_spark.orchestrator.job import Job

TIMEOUT_SEC = 60.0


class JobsClient:
    def __init__(self, base_url: str):
        self.base = base_url.rstrip("/")

    def next_job(self) -> tuple[Job | None, str]:
        """Returns (job, job_id); (None, '') when no work is available."""
        r = requests.post(f"{self.base}/v2/job/next", timeout=TIMEOUT_SEC)
        if r.status_code != 200:
            return None, ""
        d = r.json()
        return Job.from_dict(d), d.get("id", "")

    def update(self, job_id: str, state: str, detail: str = "") -> bool:
        r = requests.post(
            f"{self.base}/v2/job/update",
            data={"id": job_id, "state": state, "detail": detail},
            timeout=TIMEOUT_SEC,
        )
        return r.status_code == 200

    def heartbeat(self, job_id: str) -> bool:
        r = requests.post(
            f"{self.base}/v2/job/heartbeat",
            data={"id": job_id},
            timeout=TIMEOUT_SEC,
        )
        return r.status_code == 200

    def error(self, job_id: str, error: str) -> bool:
        r = requests.post(
            f"{self.base}/v2/job/error",
            data={"id": job_id, "error": error},
            timeout=TIMEOUT_SEC,
        )
        return r.status_code == 200
