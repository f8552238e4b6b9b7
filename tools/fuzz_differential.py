"""Differential fuzzing: run registry queries against their DuckDB
oracles on RANDOMIZED adversarial fixtures, with the same strict
(type + bit-exact) comparator as certification.

The fixed testdata generator produces well-behaved tables; the sf1
sweep proved divergence hazards are DATA-dependent (the
ROUND(SUM(double)) midpoint incident surfaced only at the third scale
tried). This tool attacks from the other side: small corpora stuffed
with the shapes the generator never emits —

  * exact timestamp ties within a (user, ts) group (window tie-breaks),
  * NULL user_id / event_type / value / props (grouping + kernel nulls),
  * a hot user holding ~30% of events (skew paths),
  * negative / zero / 1e6-magnitude money values at <= 4 dp (the
    documented exactness contract is <= 6 dp),
  * empty-string and unicode document text, duplicated lines,
    single-token docs (tokenizer/shingle/line-dedup edges),
  * embeddings: an all-zero vector (undefined cosine), exact/near
    duplicate pairs, NULL labels,
  * TPC-H relational axis (customer/orders/lineitem regenerated against
    the base part/supplier/nation keys): exact price ties at top-k rank
    boundaries, predicate-literal boundary values (discount/quantity/
    the q1 date edge), orders with ZERO lineitems, orphan lineitems,
    customers without orders, negative/zero balances,
  * seed 0: EMPTY events/documents/embeddings (empty-input aggregates;
    relational tables stay base),
  * multimodal axis (``mm<seed>`` args): ASCII-only corpora honoring
    the mm stubs' documented code-point==byte contract, with NULL and
    empty payloads, decoder modulo-boundary lengths, midpoint-mean
    power-of-two lengths, and near-duplicate payloads — run against
    ONLY the five mm_* queries the unicode axis skips (see gen_docs_mm).

Every registry query with an oracle runs through
tools/compare_strict.compare_frames on the fixture.

Usage: python tools/fuzz_differential.py <seed> [name ...]
       python tools/fuzz_differential.py 1 2 3       # digits-only args = seeds
       python tools/fuzz_differential.py mm1 mm2     # multimodal axis seeds
Exit 1 on any strict mismatch (a real finding: triage, fix BOTH sides,
then add the shape to tests/test_representation_boundaries.py).
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.001"

EVENT_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)
DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta data spark oracle "
    "naïve café über 東京 données результат"
).split()


def gen_events(rng: random.Random, n: int) -> dict:
    t0 = datetime(2024, 1, 1)
    types = ["click", "view", "purchase", "error"]
    rows = {k: [] for k in ("event_id", "ts", "user_id", "event_type", "value", "props")}
    hot_user = 7
    for i in range(n):
        rows["event_id"].append(i)
        # ties: ~15% of rows reuse the previous timestamp exactly
        if i and rng.random() < 0.15:
            ts = rows["ts"][-1]
        else:
            # span the base testdata's full month: several registered
            # warehouse queries address specific mid-month day partitions
            ts = t0 + timedelta(
                seconds=rng.randint(0, 30 * 86400 - 1),
                microseconds=rng.choice([0, 1, 500000, 999999]),
            )
        rows["ts"].append(ts)
        rows["user_id"].append(
            # pool includes 37: forget_users' deterministic GDPR key set
            # is user_id % 37 == 0 and asserts it is non-empty
            None if rng.random() < 0.02
            else (hot_user if rng.random() < 0.3 else rng.randint(1, 40))
        )
        rows["event_type"].append(
            None if rng.random() < 0.02
            else (rng.choice(types) if rng.random() < 0.95 else "weird")
        )
        if rng.random() < 0.08:
            rows["value"].append(None)
        else:
            mag = rng.choice([1, 1, 1, 100, 10000, 1000000])
            v = round(rng.uniform(-2, 10) * mag, rng.randint(0, 4))
            rows["value"].append(float(v))
        rows["props"].append(
            None if rng.random() < 0.1
            else json.dumps(
                {k: rng.randint(0, 5) for k in rng.sample(["a", "b", "c", "d"], rng.randint(0, 3))},
                sort_keys=True,
            )
        )
    return rows


def gen_docs(rng: random.Random, n: int) -> dict:
    rows = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    for i in range(n):
        kind = rng.random()
        if kind < 0.05:
            text = ""
        elif kind < 0.1:
            text = rng.choice(WORDS)
        elif kind < 0.18 and rows["text"]:
            # cross-document near-dup: reuse an earlier doc's text
            # verbatim (Jaccard 1.0) or with one token appended (high
            # containment/Jaccard) — the capture shapes the pair
            # generators (minhash/jaccard/simhash/winnow/containment)
            # never see from purely random texts
            src = rng.choice(rows["text"])
            text = src if rng.random() < 0.5 else (src + " " + rng.choice(WORDS)).strip()
        else:
            lines = []
            for _ in range(rng.randint(1, 5)):
                line = " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 12)))
                lines.append(line)
                if rng.random() < 0.3:  # duplicated line, verbatim
                    lines.append(line)
            text = "\n".join(lines)
        rows["doc_id"].append(i)
        rows["text"].append(text)
        rows["lang"].append(rng.choice(["en", "de", "fr"]))
        rows["source"].append(rng.choice(["src0", "src1", "src2"]))
        rows["n_chars"].append(len(text))
    return rows


MM_NAMES = [
    "mm_image_features",
    "mm_frame_hashes",
    "mm_resize_images",
    "mm_audio_features",
    "mm_phash_near_pairs",
    "mm_phash_near_pairs_wide",
]

_ASCII = "".join(chr(b) for b in range(32, 127)) + "\n\t"


def gen_docs_mm(rng: random.Random, n: int) -> dict:
    """ASCII-only corpus HONORING the mm stubs' documented contract
    (code point == payload byte, substr == byte slice) while attacking
    the byte-level shapes the fixed generator never emits:

      * empty payloads and NULL payloads (decoder-robustness contract:
        NULL in -> NULL features out, no frames, no pairs),
      * byte lengths on the stub decoders' modulo boundaries
        (640/480 -> width/height 0; 16 -> exact frame fit; 3072+-1 ->
        the resize slice edge),
      * power-of-two lengths whose byte sums land means on exact 6-dp
        midpoints (the half-even vs half-up hazard class found at sf1),
      * verbatim duplicate and 1-byte-flip near-duplicate payloads
        (pHash hamming 0 / small),
      * one long multi-thousand-frame payload per corpus.
    """
    boundary_lens = [640, 1280, 480, 960, 3072, 3071, 3073, 15, 16, 17, 1]
    rows = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    texts: list[str] = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.04:
            text = None
        elif kind < 0.10:
            text = ""
        elif kind < 0.25:
            text = "".join(rng.choice(_ASCII) for _ in range(rng.choice(boundary_lens)))
        elif kind < 0.45:
            # power-of-two lengths: mean = sum / 2**k hits exact 6-dp
            # midpoints with positive probability (e.g. odd sum over 2)
            text = "".join(
                rng.choice(_ASCII) for _ in range(rng.choice([2, 4, 8, 16, 32, 64, 128]))
            )
        elif kind < 0.55 and texts:
            text = rng.choice(texts)  # verbatim duplicate payload
        elif kind < 0.62 and texts:
            base_t = rng.choice(texts)
            if base_t:
                j = rng.randrange(len(base_t))
                text = base_t[:j] + rng.choice(_ASCII) + base_t[j + 1 :]
            else:
                text = base_t
        elif kind < 0.64:
            text = "".join(rng.choice(_ASCII) for _ in range(rng.randint(5000, 20000)))
        else:
            text = "".join(rng.choice(_ASCII) for _ in range(rng.randint(1, 200)))
        if text is not None:
            texts.append(text)
        rows["doc_id"].append(i)
        rows["text"].append(text)
        rows["lang"].append(rng.choice(["en", "de", "fr"]))
        rows["source"].append(rng.choice(["src0", "src1", "src2"]))
        rows["n_chars"].append(len(text) if text is not None else None)
    return rows


def build_mm_fixture(seed: int) -> str:
    d = tempfile.mkdtemp(prefix=f"fuzz_mm_seed{seed}_")
    for f in os.listdir(BASE):
        shutil.copy(os.path.join(BASE, f), d)
    rng = random.Random(10_000 + seed)
    n = 0 if seed == 0 else rng.randint(120, 200)
    pq.write_table(
        pa.Table.from_pydict(gen_docs_mm(rng, n), schema=DOC_SCHEMA),
        os.path.join(d, "documents.parquet"),
    )
    return d


EMB_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ]
)


def gen_embeddings(rng: random.Random, n: int, dim: int = 64) -> dict:
    """Clustered vectors with the shapes the generator never emits: one
    all-zero vector (cosine /0 paths), an exact-duplicate pair, tight
    near-dup pairs, and a few NULL labels."""
    rows = {"vec_id": [], "embedding": [], "label": []}
    centers = [
        [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(6)
    ]
    prev = None
    for i in range(n):
        c = centers[i % len(centers)]
        if i == 5:
            v = [0.0] * dim  # zero vector: undefined cosine
        elif i == 9 and prev is not None:
            v = list(prev)  # exact duplicate of vec 8
        elif i % 17 == 0 and prev is not None:
            v = [x + rng.uniform(-1e-4, 1e-4) for x in prev]  # near-dup
        else:
            v = [x + rng.gauss(0, 0.15) for x in c]
        rows["vec_id"].append(i)
        rows["embedding"].append([float(x) for x in v])
        rows["label"].append(None if rng.random() < 0.02 else i % 10)
        prev = v
    return rows


ORDERS_SCHEMA = pa.schema(
    [
        ("o_orderkey", pa.int64()),
        ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()),
        ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")),
        ("o_orderpriority", pa.string()),
    ]
)
LINEITEM_SCHEMA = pa.schema(
    [
        ("l_orderkey", pa.int64()),
        ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()),
        ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()),
        ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()),
        ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()),
        ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ]
)
CUSTOMER_SCHEMA = pa.schema(
    [
        ("c_custkey", pa.int64()),
        ("c_name", pa.string()),
        ("c_nationkey", pa.int32()),
        ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ]
)

SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def gen_relational(rng: random.Random) -> tuple[dict, dict, dict]:
    """TPC-H-shaped customer/orders/lineitem with the adversarial
    structure the decision-support queries never see in the fixed data:
    EXACT price ties at top-k rank boundaries, predicate-literal
    boundary values (discount 0.05/0.07, quantity 1/50, the q1/q6 date
    edges), orders with ZERO lineitems (count-of-counts zero bucket,
    left-join spines), a few orphan lineitems (referential-integrity
    audits), customers without orders, and negative/zero balances
    around the q22 average threshold. part/supplier/nation/region stay
    base — generated keys reference their real ranges."""
    n_cust, n_ord = 150, 1500
    cust = {"c_custkey": [], "c_name": [], "c_nationkey": [], "c_acctbal": [], "c_mktsegment": []}
    for i in range(n_cust):
        cust["c_custkey"].append(i)
        cust["c_name"].append(f"Customer#{i:09d}")
        cust["c_nationkey"].append(rng.randint(0, 24))
        bal = rng.choice(
            [0.0, 0.0, -846.69, round(rng.uniform(-999, 9999), 2)]
        )
        cust["c_acctbal"].append(bal)
        cust["c_mktsegment"].append(rng.choice(SEGMENTS))

    o = {k: [] for k in ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")}
    d0 = datetime(1995, 1, 1)
    tie_price = 50000.00
    for i in range(n_ord):
        o["o_orderkey"].append(i)
        # ~1/3 of customers never order (q13/q22 spines)
        o["o_custkey"].append(rng.randint(0, (2 * n_cust) // 3))
        o["o_orderstatus"].append(rng.choice(["O", "F", "P"]))
        # exact ties: ~5% of orders share ONE price (rank-boundary ties)
        o["o_totalprice"].append(
            tie_price if rng.random() < 0.05
            else round(rng.uniform(900, 400000), 2)
        )
        o["o_orderdate"].append(
            d0 + timedelta(days=rng.randint(0, 2404))  # ..2001-08-01
        )
        o["o_orderpriority"].append(rng.choice(PRIORITIES))

    li = {k: [] for k in LINEITEM_SCHEMA.names}
    for i in range(n_ord):
        n_lines = rng.choice([0, 1, 1, 2, 2, 3, 4, 5, 6, 7])  # 0: no lines
        for ln in range(1, n_lines + 1):
            li["l_orderkey"].append(i)
            li["l_partkey"].append(rng.randint(0, 199))
            li["l_suppkey"].append(rng.randint(0, 9))
            li["l_linenumber"].append(ln)
            # boundary quantities hit q6/q17/q19 literals exactly
            li["l_quantity"].append(
                float(rng.choice([1, 24, 25, 50, rng.randint(1, 50)]))
            )
            li["l_extendedprice"].append(round(rng.uniform(900, 105000), 2))
            li["l_discount"].append(
                rng.choice([0.0, 0.04, 0.05, 0.06, 0.07, 0.1])
            )
            li["l_tax"].append(round(rng.choice([0, 2, 4, 6, 8]) / 100, 2))
            li["l_returnflag"].append(rng.choice(["R", "A", "N"]))
            li["l_linestatus"].append(rng.choice(["O", "F"]))
            ship = o["o_orderdate"][i] + timedelta(days=rng.randint(1, 121))
            if rng.random() < 0.02:
                ship = datetime(1998, 9, 2)  # the q1 boundary literal
            li["l_shipdate"].append(ship)
    # a few orphan lineitems (no such order) for the integrity audits
    for j in range(3):
        li["l_orderkey"].append(n_ord + 100 + j)
        li["l_partkey"].append(rng.randint(0, 199))
        li["l_suppkey"].append(rng.randint(0, 9))
        li["l_linenumber"].append(1)
        li["l_quantity"].append(5.0)
        li["l_extendedprice"].append(1000.00)
        li["l_discount"].append(0.05)
        li["l_tax"].append(0.04)
        li["l_returnflag"].append("N")
        li["l_linestatus"].append("O")
        li["l_shipdate"].append(datetime(1996, 6, 1))
    return cust, o, li


def build_fixture(seed: int) -> str:
    d = tempfile.mkdtemp(prefix=f"fuzz_seed{seed}_")
    for f in os.listdir(BASE):
        shutil.copy(os.path.join(BASE, f), d)
    rng = random.Random(seed)
    n_ev, n_doc = (0, 0) if seed == 0 else (rng.randint(1500, 2500), rng.randint(120, 200))
    n_emb = 0 if seed == 0 else rng.randint(250, 350)
    pq.write_table(
        pa.Table.from_pydict(gen_events(rng, n_ev), schema=EVENT_SCHEMA),
        os.path.join(d, "events.parquet"),
    )
    pq.write_table(
        pa.Table.from_pydict(gen_docs(rng, n_doc), schema=DOC_SCHEMA),
        os.path.join(d, "documents.parquet"),
    )
    pq.write_table(
        pa.Table.from_pydict(gen_embeddings(rng, n_emb), schema=EMB_SCHEMA),
        os.path.join(d, "embeddings.parquet"),
    )
    if seed != 0:  # seed 0 keeps base relational tables (empty-TPC-H
        # would mostly test empty-input paths the other tables already
        # cover, at the cost of 50+ trivially-empty results)
        cust, o, li = gen_relational(rng)
        pq.write_table(
            pa.Table.from_pydict(cust, schema=CUSTOMER_SCHEMA),
            os.path.join(d, "customer.parquet"),
        )
        pq.write_table(
            pa.Table.from_pydict(o, schema=ORDERS_SCHEMA),
            os.path.join(d, "orders.parquet"),
        )
        pq.write_table(
            pa.Table.from_pydict(li, schema=LINEITEM_SCHEMA),
            os.path.join(d, "lineitem.parquet"),
        )
    return d


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    seeds = [int(a) for a in args if a.isdigit()]
    # mm<seed> args run the multimodal axis: an ASCII-contract fixture
    # (gen_docs_mm) against ONLY the mm_* queries the unicode axis skips.
    mm_seeds = [
        int(a[2:]) for a in args if a.startswith("mm") and a[2:].isdigit()
    ]
    only = [
        a for a in args
        if not a.isdigit() and not (a.startswith("mm") and a[2:].isdigit())
    ]

    import __spark_entry__ as entrymod
    from etl_gardener_spark.session import get_spark
    from tests.conftest import TABLES
    from tools.compare_strict import PY_ORACLES, compare_frames

    spark = get_spark(app_name="fuzz-differential")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # mm_* stubs document an ASCII-corpus contract (the oracle unnests
    # code points as payload bytes; real corpora use real decoders) that
    # unicode fixtures violate by design — excluded rather than weakened.
    skip = {
        "mm_image_features", "mm_resize_images", "mm_frame_hashes",
        "mm_audio_features", "mm_phash_near_pairs",
        "mm_phash_near_pairs_wide",
    }
    names = only or [n for n in oracles if n not in skip]
    # The physical warehouse/stream round-trip exercises assert their
    # demonstration preconditions (a written partition exists, the forget
    # set is non-empty, compaction had files to merge) — on a fully EMPTY
    # fixture those asserts fire by design, so seed 0 exercises the
    # logical operators only.
    empty_skip = {
        "copy_partition", "delete_partition", "upsert_partition",
        "compact_partition", "cluster_partition", "forget_users",
        "refresh_rollup_days", "dq_quarantine_promotion",
        "stream_warehouse_sink", "stream_scrub_split",
    }
    total_fail = 0
    runs = [(f"seed={s}", build_fixture, s, names) for s in seeds] + [
        (f"mm_seed={s}", build_mm_fixture, s, only or MM_NAMES) for s in mm_seeds
    ]
    for label, builder, seed, run_names in runs:
        d = builder(seed)
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
        fails = []
        n_run = 0
        for name in run_names:
            if name not in oracles:
                continue
            if seed == 0 and builder is build_fixture and name in empty_skip:
                continue
            n_run += 1
            try:
                # PY_ORACLES: data-dependent oracles (auto-tuned banding
                # reads the fixture's doc count) and linear references —
                # same routing as the strict sweep
                problems, nrows = compare_frames(
                    qs[name](spark, d), con,
                    PY_ORACLES.get(name, oracles[name]),
                )
            except Exception as e:  # noqa: BLE001 - a crash IS a finding
                problems, nrows = [f"exception: {type(e).__name__}: {e}"[:300]], -1
            if problems:
                fails.append((name, problems))
                print(f"FAIL {label} {name}: {problems}")
            else:
                print(f"pass {label} {name}: {nrows} rows")
        con.close()
        shutil.rmtree(d, ignore_errors=True)
        print(f"{label}: {n_run - len(fails)}/{n_run} pass")
        total_fail += len(fails)
    return 1 if total_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
