"""Orchestration layer — the reference's dataflow operators (SURVEY.md §2.3).

The reference (m-lab/etl-gardener) is a control plane: date iterators emit
(bucket, experiment, datatype, date) Jobs, a Tracker holds each job's state
history, a Monitor polls the tracker and applies per-state Actions that
drive the relational pipeline (Load → Dedup → Copy → Delete → Join), and an
HTTP Jobs API hands work to external parsers. This package re-creates that
control plane in Python around the Spark-backed
:class:`etl_gardener_spark.table_ops.TableOps`.

Scale note: the orchestrator is deliberately tiny (the reference runs on
1 CPU / 3 GiB — BASELINE.md). All heavy lifting happens inside Spark jobs;
the control plane only schedules one (datatype, day) at a time per job, so
a 100 TB backfill is just many independent Jobs fanned out over dates.
"""
