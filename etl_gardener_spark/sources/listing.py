"""Object listing probes — HasFiles / PrefixStats (T6/T7).

The reference gates job dispatch on whether the source prefix contains any
objects (``Job.HasFiles``, tracker/job.go:138-149, used by the job service at
job-service/job-service.go:73-85) and records per-prefix object counts/sizes
(``Job.PrefixStats``, tracker/job.go:124-135).

Spark-side: the Hadoop FileSystem API gives the same listing over any
supported store (local, HDFS, s3a/gs connectors). Listing is a driver-side
metadata operation — no Spark job, no executors — matching the reference's
direct GCS client usage. ``has_files`` short-circuits on the first object
found rather than materializing the full listing, because at 900k files/day
(metrics/metrics.go:152-165) a full list just to answer "any?" is wasteful.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class ObjectStat:
    """One listed object (name + size), like storage.ObjectAttrs
    (tracker/job.go:124-135)."""

    path: str
    size: int


def _fs_and_path(spark: SparkSession, prefix: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(prefix)
    return path.getFileSystem(hconf), path, jvm


def has_files(spark: SparkSession, prefix: str) -> bool:
    """True if any object exists under ``prefix`` (tracker/job.go:138-149).

    Short-circuits on the first file found.
    """
    fs, path, _ = _fs_and_path(spark, prefix)
    if not fs.exists(path):
        return False
    it = fs.listFiles(path, True)
    while it.hasNext():
        f = it.next()
        if f.isFile():
            return True
    return False


def prefix_stats(spark: SparkSession, prefix: str) -> tuple[list[ObjectStat], int]:
    """All objects + total byte count under ``prefix``
    (tracker/job.go:124-135)."""
    fs, path, _ = _fs_and_path(spark, prefix)
    if not fs.exists(path):
        return [], 0
    out: list[ObjectStat] = []
    total = 0
    it = fs.listFiles(path, True)
    while it.hasNext():
        f = it.next()
        if f.isFile():
            size = int(f.getLen())
            out.append(ObjectStat(path=f.getPath().toString(), size=size))
            total += size
    return out, total
