"""Atomic JSON snapshot persistence for orchestrator state.

Reference: persistence/persistence.go:25-44 (local/GCS saver abstraction) and
tracker/tracker.go:60-104 (snapshot format ``{SaveTime, Statuses, Jobs}``,
golden file tracker/testdata/saver-struct-v2.json). Writes are
write-temp-then-rename so a crash mid-save never corrupts the recovery file.
"""

from __future__ import annotations

import json
import os
import tempfile


def save_json(path: str, obj: dict) -> None:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".save_", suffix=".json")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, separators=(",", ":"))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_json(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
