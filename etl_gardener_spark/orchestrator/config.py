"""YAML config model (reference config/config.go:27-51).

Shape (config/testdata/config.yml; the example bucket name there is
archive-measurement-lab — config/testdata/config.yml:8):

    start_date: 2019-03-20
    tracker:
      timeout: 5h
    monitor:
      polling_interval: 5m
    sources:
      - bucket: archive-measurement-lab
        experiment: ndt
        datatype: ndt7
        filter: ""
        daily_only: false
        full_history: false
        target: tmp_ndt.ndt7
        datasets: {tmp: tmp_ndt, raw: raw_ndt, join: ndt}
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import date as Date

import yaml

from etl_gardener_spark.orchestrator.job import Datasets, Job

_DURATION_RE = re.compile(r"(\d+(?:\.\d+)?)\s*(h|m|s|ms)")
_UNIT_SEC = {"h": 3600.0, "m": 60.0, "s": 1.0, "ms": 0.001}


def parse_duration(text: str | float | int | None, default: float = 0.0) -> float:
    """Go-style duration string ('5m', '1h30m', '90s') → seconds."""
    if text is None:
        return default
    if isinstance(text, (int, float)):
        return float(text)
    total, matched = 0.0, False
    for num, unit in _DURATION_RE.findall(text):
        total += float(num) * _UNIT_SEC[unit]
        matched = True
    if not matched:
        raise ValueError(f"unparseable duration: {text!r}")
    return total


@dataclass(frozen=True)
class SourceConfig:
    """One configured (bucket, experiment, datatype) stream
    (config/config.go:33-47).

    ``curation`` / ``curation_params`` are a repo extension (no
    reference analogue): an ordered opt-in list of post-Join curation
    stages (orchestrator/curation.STAGE_ORDER) plus their parameters,
    run under the same monitor machinery as the parity chain."""

    bucket: str
    experiment: str
    datatype: str
    filter: str = ""
    daily_only: bool = False
    full_history: bool = False
    datasets: Datasets = field(default_factory=Datasets)
    curation: tuple[str, ...] = ()
    curation_params: tuple[tuple[str, object], ...] = ()

    def curation_spec(self):
        """CurationSpec for this source (None when no stages configured).
        Imported lazily: curation pulls operator modules the plain
        config model shouldn't load."""
        if not self.curation:
            return None
        from etl_gardener_spark.orchestrator.curation import CurationSpec

        return CurationSpec(
            stages=tuple(self.curation), **dict(self.curation_params)
        )

    def job_spec(self) -> Job:
        return Job(
            bucket=self.bucket,
            experiment=self.experiment,
            datatype=self.datatype,
            date=Date(1970, 1, 1),  # stamped by the JobIterator
            filter=self.filter,
            datasets=self.datasets,
        )


@dataclass(frozen=True)
class GardenerConfig:
    start_date: Date
    tracker_timeout_sec: float = 5 * 3600.0
    polling_interval_sec: float = 300.0
    sources: tuple[SourceConfig, ...] = ()

    @property
    def daily_sources(self) -> tuple[SourceConfig, ...]:
        return self.sources

    @property
    def historical_sources(self) -> tuple[SourceConfig, ...]:
        return tuple(s for s in self.sources if not s.daily_only)


def load_config(path: str) -> GardenerConfig:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    sources = []
    for s in raw.get("sources", []) or []:
        ds = s.get("datasets") or {}
        sources.append(
            SourceConfig(
                bucket=s["bucket"],
                experiment=s["experiment"],
                datatype=s["datatype"],
                filter=s.get("filter", "") or "",
                daily_only=bool(s.get("daily_only", False)),
                full_history=bool(s.get("full_history", False)),
                datasets=Datasets(
                    tmp=ds.get("tmp", ""),
                    raw=ds.get("raw", ""),
                    join=ds.get("join", ""),
                ),
                curation=tuple(s.get("curation") or ()),
                curation_params=tuple(
                    sorted((s.get("curation_params") or {}).items())
                ),
            )
        )
    sd = raw.get("start_date")
    if isinstance(sd, Date):
        start = sd
    elif sd:
        start = Date.fromisoformat(str(sd))
    else:
        raise ValueError("config missing start_date")
    return GardenerConfig(
        start_date=start,
        tracker_timeout_sec=parse_duration(
            (raw.get("tracker") or {}).get("timeout"), 5 * 3600.0
        ),
        polling_interval_sec=parse_duration(
            (raw.get("monitor") or {}).get("polling_interval"), 300.0
        ),
        sources=tuple(sources),
    )
