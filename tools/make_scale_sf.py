"""Scale-ladder data generator: blow up a testdata sf dir by an integer
factor K for scaling measurements (round-3 verdict item 6).

Replication is structure-preserving, not naive duplication — the point
is that measured cost scale with N the way the operator's O() claim
says, so each copy must NOT collide with the others:

* documents — every token in copy c > 0 is suffixed ``~c``: the shingle
  sets of different copies are disjoint, so MinHash/Jaccard/SimHash
  near-dup PAIRS scale linearly (each copy reproduces the original
  intra-copy dup structure) instead of quadratically in K as verbatim
  copies would.
* embeddings — copies get fresh seeded-random vectors: block-pair GEMM
  cost (the thing measured) is O(n^2/B) regardless of matches, while
  match count stays O(original).
* facts (lineitem/orders/customer/events) — keys offset per copy so
  join fan-out per key is unchanged; dims are shared.

Usage: python tools/make_scale_sf.py <src_sf_dir> <dst_dir> <K>
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEY_OFF = 100_000_000


def _scaled(src: str, name: str, k: int, mutate) -> pa.Table:
    base = pq.read_table(os.path.join(src, f"{name}.parquet"))
    parts = [base]
    for c in range(1, k):
        parts.append(mutate(base, c))
    return pa.concat_tables(parts)


def main() -> None:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)

    for dim in ("region", "nation", "part", "supplier"):
        shutil.copy(
            os.path.join(src, f"{dim}.parquet"),
            os.path.join(dst, f"{dim}.parquet"),
        )

    def offset_cols(tbl: pa.Table, c: int, cols: dict[str, int]) -> pa.Table:
        out = tbl
        for col, off in cols.items():
            i = out.schema.get_field_index(col)
            arr = pa.compute.add(out.column(col), c * off)
            out = out.set_column(i, out.schema.field(col), arr)
        return out

    def mut_documents(tbl: pa.Table, c: int) -> pa.Table:
        import pandas as pd

        pdf = tbl.to_pandas()
        pdf["doc_id"] = pdf["doc_id"] + c * KEY_OFF
        suf = f"~{c}"
        # suffix EVERY whitespace token: shingles of copy c never match
        # any other copy's, so near-dup structure replicates, not squares
        pdf["text"] = (
            pdf["text"].str.replace(r"(\S+)", r"\1" + suf, regex=True)
        )
        pdf["n_chars"] = pdf["text"].str.len().astype("int64")
        return pa.Table.from_pandas(pdf, schema=tbl.schema, preserve_index=False)

    def mut_embeddings(tbl: pa.Table, c: int) -> pa.Table:
        n = tbl.num_rows
        dim = len(tbl.column("embedding")[0])
        rng = np.random.default_rng(1234 + c)
        mat = rng.standard_normal((n, dim)).astype(np.float32)
        vec = pa.array(list(mat), type=tbl.schema.field("embedding").type)
        out = offset_cols(tbl, c, {"vec_id": KEY_OFF})
        i = out.schema.get_field_index("embedding")
        return out.set_column(i, out.schema.field("embedding"), vec)

    writers = {
        "documents": mut_documents,
        "embeddings": mut_embeddings,
        "lineitem": lambda t, c: offset_cols(t, c, {"l_orderkey": KEY_OFF}),
        "orders": lambda t, c: offset_cols(
            t, c, {"o_orderkey": KEY_OFF, "o_custkey": KEY_OFF}
        ),
        "customer": lambda t, c: offset_cols(t, c, {"c_custkey": KEY_OFF}),
        "events": lambda t, c: offset_cols(
            t, c, {"event_id": KEY_OFF, "user_id": KEY_OFF}
        ),
    }
    for name, mutate in writers.items():
        tbl = _scaled(src, name, k, mutate)
        pq.write_table(tbl, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
