"""Scale-ladder runner: time the heavy query family at two scale dirs
and report per-query wall time plus the measured scaling exponent
alpha = log(t_big / t_small) / log(factor) — compared against each
operator's claimed O() behavior in SCALE.md.

Usage: python tools/scale_ladder.py <small_dir> <big_dir> <factor> [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import math

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_gardener_spark.plans import queries as Q
from etl_gardener_spark.session import get_spark

DEFAULT = [
    "doc_minhash_lsh_pairs",
    "doc_jaccard_pairs",
    "emb_near_dup_pairs",
    "doc_dup_clusters",
    "bucketed_cohort_join",
]

RUNS = 2


def time_query(spark, name: str, sf_dir: str) -> float:
    best = None
    for _ in range(RUNS):
        t0 = time.monotonic()
        df = Q.REGISTRY[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    small, big, factor = sys.argv[1], sys.argv[2], float(sys.argv[3])
    names = sys.argv[4:] or DEFAULT
    spark = get_spark(app_name="scale-ladder")
    spark.range(1000).count()  # warmup
    out = {}
    for name in names:
        t_small = time_query(spark, name, small)
        t_big = time_query(spark, name, big)
        alpha = math.log(t_big / t_small) / math.log(factor)
        out[name] = {
            "t_small": t_small,
            "t_big": t_big,
            "ratio": round(t_big / t_small, 2),
            "alpha": round(alpha, 2),
        }
        print(name, out[name], flush=True)
    print(json.dumps({"factor": factor, "queries": out}))


if __name__ == "__main__":
    main()
