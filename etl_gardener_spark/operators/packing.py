"""Sequence packing: batch documents into fixed-capacity training rows.

LLM training consumes fixed-length token sequences; feeding one short
document per sequence wastes the context window, so pipelines PACK
documents into bins of ``capacity`` tokens. This operator implements
deterministic next-fit packing: within each stratum, documents are taken
in id order and appended to the current bin until the next one would
overflow, which opens a new bin. Next-fit (vs first-fit-decreasing) is
chosen deliberately: it is single-pass, order-stable, and reproducible —
rerunning the job yields byte-identical bin assignments, the property
every other stage of this pipeline guarantees (no RNG anywhere).

Scale design: packing is inherently sequential *within* a bin stream, so
parallelism comes from the stratum axis — bins never cross strata. At
100 TB the stratum is something like (language, date, shard) where shard
is a deterministic hash of the doc id sized so one stratum fits one task;
the groupBy below shuffles each stratum to one task and packs it with a
single numpy pass. Driver never sees the data.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    stratum_cols: Sequence[str],
    capacity: int,
    id_type: str = "long",
) -> DataFrame:
    """Assign each row a bin id per stratum: output adds ``bin_id`` (0-based
    within the stratum) to (id, strata, weight).

    Semantics: rows ordered by ``id_col`` within each stratum; a row joins
    the current bin iff fill + weight <= capacity, else it opens the next
    bin (so a row heavier than ``capacity`` occupies a bin alone).

    ``id_type``: output DDL type of the id column ('long' default;
    'string' for warehouse tables with string ids — ordering within a
    stratum is then lexicographic, still deterministic).
    """
    out_fields = (
        [f"{id_col} {id_type}"]
        + [f"{c} string" for c in stratum_cols]
        + [f"{weight_col} long", "bin_id long"]
    )
    schema = ", ".join(out_fields)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        w = pdf[weight_col].to_numpy()
        bins = np.zeros(len(w), dtype="int64")
        b, fill = 0, int(w[0]) if len(w) else 0
        for i in range(1, len(w)):
            if fill + int(w[i]) > capacity:
                b, fill = b + 1, int(w[i])
            else:
                fill += int(w[i])
            bins[i] = b
        pdf["bin_id"] = bins
        return pdf[[id_col, *stratum_cols, weight_col, "bin_id"]]

    return (
        df.select(id_col, *stratum_cols, weight_col)
        .groupBy(*stratum_cols)
        .applyInPandas(pack, schema=schema)
    )
