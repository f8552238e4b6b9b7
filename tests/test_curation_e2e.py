"""End-to-end curation-chain test: the LLM-extension stages (scrub ->
quality gate -> exact dedup -> near dedup -> pack) configured per source
and driven by the SAME Monitor/tracker machinery as the parity chain
(reference chain ops/actions.go:68-91; extension orchestrator/curation.py).
Covers: full state history through curating:* states, per-stage metrics,
the skip path for a source without curation, and restart idempotence."""

from __future__ import annotations

import json
import os
from datetime import date as Date

import pytest
from pyspark.sql import types as T

from etl_gardener_spark.orchestrator import job as J
from etl_gardener_spark.orchestrator import metrics
from etl_gardener_spark.orchestrator.config import GardenerConfig, SourceConfig
from etl_gardener_spark.orchestrator.curation import state_for
from etl_gardener_spark.orchestrator.gardener import Gardener
from etl_gardener_spark.orchestrator.job import Datasets
from etl_gardener_spark.warehouse import Warehouse

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField(
            "parser", T.StructType([T.StructField("Time", T.TimestampType())])
        ),
        T.StructField("text", T.StringType()),
    ]
)

LONG_A = (
    "the quick brown fox jumps over the lazy dog near the river today "
    "while herons watch from shallow water banks waiting patiently"
)
LONG_A_NEAR = (
    "the quick brown fox jumps over the lazy cat near the river today "
    "while herons watch from shallow water banks waiting patiently"
)
LONG_B = (
    "completely different content about spark partitions shuffles and "
    "adaptive execution strategies for large scale analytical joins"
)


def _write_day(root: str, job_prefix: str, rows: list[dict]) -> None:
    d = os.path.join(root, job_prefix)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "part0.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def curation_gardener(spark, tmp_path):
    cfg = GardenerConfig(
        start_date=Date(2024, 3, 1),
        sources=(
            SourceConfig(
                bucket="b",
                experiment="corpus",
                datatype="webdocs",
                datasets=Datasets(tmp="tmp_c", raw="raw_c", join="c"),
                curation=(
                    "scrub",
                    "quality_gate",
                    "lm_outlier_gate",
                    "exact_dedup",
                    "near_dedup",
                    "pack",
                ),
                curation_params=(
                    ("jaccard_threshold", 0.5),
                    ("pack_capacity", 40),
                ),
            ),
            # parity-only source: same chain states, every stage skips
            SourceConfig(
                bucket="b",
                experiment="corpus",
                datatype="plain",
                datasets=Datasets(tmp="tmp_p", raw="raw_p", join="p"),
            ),
        ),
    )
    g = Gardener(
        spark,
        cfg,
        warehouse_root=str(tmp_path / "wh"),
        landing_root=str(tmp_path / "landing"),
        schema_for=lambda job: SCHEMA,
        state_dir=str(tmp_path / "state"),
        retry_delay_sec=0.1,
    )
    yield g, str(tmp_path / "landing"), str(tmp_path / "wh")
    g.monitor.shutdown()


def _run_job(g, landing, datatype, rows, day=Date(2024, 3, 1)):
    src = next(s for s in g.config.sources if s.datatype == datatype)
    job = src.job_spec().with_date(day)
    _write_day(landing, job.prefix(), rows)
    g.tracker.add_job(job)
    client = g.app.test_client()
    assert (
        client.post(
            "/v2/job/update", data={"id": job.key(), "state": J.PARSE_COMPLETE}
        ).status_code
        == 200
    )
    assert g.monitor.drain(timeout_sec=180.0)
    return job


def test_curation_chain_end_to_end(curation_gardener):
    g, landing, wh_root = curation_gardener
    t = "2024-03-01T01:00:00Z"
    rows = [
        # survives everything; email gets scrubbed
        {"id": "a", "parser": {"Time": t}, "text": LONG_A + " contact bob@example.com"},
        # strict subset of a's scrubbed text (jaccard 20/22) -> near_dedup
        {"id": "b", "parser": {"Time": t}, "text": LONG_A},
        # exact dup of d after whitespace/case normalization -> exact_dedup
        {"id": "d", "parser": {"Time": t}, "text": LONG_B},
        {"id": "e", "parser": {"Time": t}, "text": "  " + LONG_B.upper() + "  "},
        # repetitive symbol soup (score ~0.14) -> quality gate drops it
        {"id": "z", "parser": {"Time": t}, "text": "!!! !!! !!! !!! !!!"},
    ]
    job = _run_job(g, landing, "webdocs", rows)

    st = g.tracker.get_status(job.key())
    assert st.state == J.COMPLETE, [si.state for si in st.history]
    states = [si.state for si in st.history]
    for s in (
        J.LOADING,
        J.DEDUPLICATING,
        J.COPYING,
        J.DELETING,
        J.JOINING,
        state_for("scrub"),
        state_for("quality_gate"),
        state_for("exact_dedup"),
        state_for("near_dedup"),
        state_for("pack"),
    ):
        assert s in states, (s, states)

    wh = Warehouse(wh_root)
    joined = wh.read_partition(g.spark, "join", "corpus", "webdocs", job.date)
    got = {r.id: r.text for r in joined.collect()}
    # survivors: a (scrubbed) and d (min-id exact survivor)
    assert set(got) == {"a", "d"}
    assert "bob@example.com" not in got["a"]
    assert "<EMAIL>" in got["a"]

    packed = wh.read_partition(g.spark, "packed", "corpus", "webdocs", job.date)
    p = {r.id: (r.n_tokens, r.bin_id) for r in packed.collect()}
    assert set(p) == {"a", "d"}
    # capacity 40: a scrubbed = 24 tokens, d = 16; 24 + 16 = 40 <= 40 so
    # both land in bin 0 (greedy fill ordered by id)
    assert p["a"] == (24, 0) and p["d"] == (16, 0)

    # per-stage metrics recorded under the parity chain's histogram
    text = metrics.REGISTRY.expose_text()
    for stage in ("scrub", "quality_gate", "exact_dedup", "near_dedup", "pack"):
        assert (
            f'query="curate_{stage}"' in text
        ), f"missing curate_{stage} in metrics"


def test_uncurated_source_skips_stages(curation_gardener):
    g, landing, wh_root = curation_gardener
    t = "2024-03-01T01:00:00Z"
    rows = [
        {"id": "x", "parser": {"Time": t}, "text": LONG_A},
        {"id": "y", "parser": {"Time": t}, "text": "!!! ??? !!!"},
    ]
    job = _run_job(g, landing, "plain", rows)
    st = g.tracker.get_status(job.key())
    assert st.state == J.COMPLETE, [si.state for si in st.history]
    # walks the curation states (they are installed chain-wide) but every
    # stage skips: nothing is filtered, no packed tier appears
    wh = Warehouse(wh_root)
    joined = wh.read_partition(g.spark, "join", "corpus", "plain", job.date)
    assert {r.id for r in joined.collect()} == {"x", "y"}
    assert not wh.partition_exists(
        g.spark, "packed", "corpus", "plain", job.date
    )
    details = " | ".join(si.detail or "" for si in st.history)
    assert "skipped: not configured" in details


def test_curation_stage_idempotent_rerun(curation_gardener):
    """Restart safety: re-running a curation stage on an already-curated
    partition is a no-op (pure function of the partition + staged
    overwrite) — the reference's no-leases-survive-restart property
    extended to the new states."""
    from etl_gardener_spark.orchestrator.curation import (
        CurationActions,
        spec_for_config,
    )

    g, landing, wh_root = curation_gardener
    t = "2024-03-01T01:00:00Z"
    rows = [
        {"id": "a", "parser": {"Time": t}, "text": LONG_A},
        {"id": "b", "parser": {"Time": t}, "text": LONG_A_NEAR},
    ]
    job = _run_job(g, landing, "webdocs", rows)
    wh = Warehouse(wh_root)
    before = {
        r.id for r in wh.read_partition(
            g.spark, "join", "corpus", "webdocs", job.date
        ).collect()
    }
    ca = CurationActions(g.spark, wh, spec_for_config(g.config))
    for stage in ("scrub", "quality_gate", "exact_dedup", "near_dedup"):
        detail = ca._stage_action(stage)(job)
        assert "deleted=0" in detail or "rows_redacted': 0" in detail, detail
    after = {
        r.id for r in wh.read_partition(
            g.spark, "join", "corpus", "webdocs", job.date
        ).collect()
    }
    assert after == before


def test_lm_outlier_gate_drops_nll_tail(spark, tmp_path):
    """The self-corpus LM gate: four documents sharing most trigrams sit
    below the mean NLL; a rare-character document's trigrams appear only
    in itself, putting it far above mean + 1 sigma -> dropped. (For
    n <= 9 docs no point can exceed mean + 3*sigma_pop, so the default
    3.0 in the full-chain test above is exercised as a keep-everything
    pass; this test pins the drop path at sigmas = 1.0.)"""
    cfg = GardenerConfig(
        start_date=Date(2024, 3, 1),
        sources=(
            SourceConfig(
                bucket="b",
                experiment="corpus",
                datatype="lmgate",
                datasets=Datasets(tmp="tmp_l", raw="raw_l", join="l"),
                curation=("lm_outlier_gate",),
                curation_params=(("lm_nll_sigmas", 1.0),),
            ),
        ),
    )
    g = Gardener(
        spark,
        cfg,
        warehouse_root=str(tmp_path / "wh"),
        landing_root=str(tmp_path / "landing"),
        schema_for=lambda job: SCHEMA,
        state_dir=str(tmp_path / "state"),
        retry_delay_sec=0.1,
    )
    try:
        t = "2024-03-01T01:00:00Z"
        rows = [
            {"id": f"c{i}", "parser": {"Time": t}, "text": LONG_A + f" tail {i}"}
            for i in range(4)
        ] + [
            {"id": "odd", "parser": {"Time": t},
             "text": "qxv jzq vxk qzj kvx jqz xvq zjk"},
        ]
        job = _run_job(g, landing=str(tmp_path / "landing"),
                       datatype="lmgate", rows=rows)
        st = g.tracker.get_status(job.key())
        assert st.state == J.COMPLETE, [si.state for si in st.history]
        wh = Warehouse(str(tmp_path / "wh"))
        joined = wh.read_partition(g.spark, "join", "corpus", "lmgate", job.date)
        ids = {r.id for r in joined.collect()}
        assert ids == {"c0", "c1", "c2", "c3"}, ids
    finally:
        g.monitor.shutdown()


def test_quality_gate_rejects_all_rows_deletes_partition(spark, tmp_path):
    """All-rows-rejected day (ADVICE r9 item 1): dynamic partition
    overwrite is a no-op for an empty DataFrame, so _rewrite must DELETE
    the stale join partition explicitly; downstream stages short-circuit
    on the now-missing partition and pack clears any stale packed tier."""
    cfg = GardenerConfig(
        start_date=Date(2024, 3, 1),
        sources=(
            SourceConfig(
                bucket="b",
                experiment="corpus",
                datatype="allbad",
                datasets=Datasets(tmp="tmp_ab", raw="raw_ab", join="ab"),
                curation=("quality_gate", "exact_dedup", "near_dedup", "pack"),
                curation_params=(("min_quality", 0.25),),
            ),
        ),
    )
    g = Gardener(
        spark,
        cfg,
        warehouse_root=str(tmp_path / "wh"),
        landing_root=str(tmp_path / "landing"),
        schema_for=lambda job: SCHEMA,
        state_dir=str(tmp_path / "state"),
        retry_delay_sec=0.1,
    )
    try:
        t = "2024-03-01T01:00:00Z"
        # every row is symbol soup below the 0.25 quality floor
        rows = [
            {"id": f"g{i}", "parser": {"Time": t}, "text": "!!! ??? !!! ???"}
            for i in range(3)
        ]
        wh = Warehouse(str(tmp_path / "wh"))
        # pre-seed a stale packed partition from a "prior run" of the day:
        # the rerun must clear it, not leave it to be read as current
        stale = spark.createDataFrame(
            [("stale", 5, 0, Date(2024, 3, 1))],
            "id string, n_tokens long, bin_id long, date date",
        )
        wh.overwrite_partitions(stale, "packed", "corpus", "allbad")
        job = _run_job(g, landing=str(tmp_path / "landing"),
                       datatype="allbad", rows=rows)
        st = g.tracker.get_status(job.key())
        assert st.state == J.COMPLETE, [si.state for si in st.history]
        # the join partition is GONE (not stale-ungated), and so is the
        # stale packed partition
        assert not wh.partition_exists(
            g.spark, "join", "corpus", "allbad", job.date
        )
        assert not wh.partition_exists(
            g.spark, "packed", "corpus", "allbad", job.date
        )
        details = " | ".join(si.detail or "" for si in st.history)
        assert "quality_gate: rows_out=0 deleted=3" in details, details
        assert "skipped: empty partition" in details, details
    finally:
        g.monitor.shutdown()


def test_non_default_banding_through_chain(spark, tmp_path):
    """Curation banding knobs (r9 verdict item 4): bands pinned via
    curation_params drives minhash_lsh_pairs with that banding; the
    default (bands=None) derives banding from jaccard_threshold via
    lsh_tuning, so changing the threshold moves the candidate-recall
    lever."""
    from etl_gardener_spark.operators.neardup import lsh_tuning
    from etl_gardener_spark.orchestrator.curation import CurationSpec

    # resolution rule: explicit bands wins; else lsh_tuning decides
    assert CurationSpec(
        stages=("near_dedup",), num_hashes=12, bands=6
    ).banding() == (12, 6)
    tuned_bands, _rows = lsh_tuning(12, 0.5)
    assert CurationSpec(
        stages=("near_dedup",), jaccard_threshold=0.5
    ).banding() == (12, tuned_bands)
    with pytest.raises(ValueError):
        CurationSpec(stages=("near_dedup",), num_hashes=12, bands=5)

    cfg = GardenerConfig(
        start_date=Date(2024, 3, 1),
        sources=(
            SourceConfig(
                bucket="b",
                experiment="corpus",
                datatype="banded",
                datasets=Datasets(tmp="tmp_bd", raw="raw_bd", join="bd"),
                curation=("near_dedup",),
                # 12 hashes in 12 bands of 1 row: the most permissive
                # banding (any shared minhash -> candidate), so the
                # near-pair below is guaranteed a candidate regardless
                # of which hashes collide
                curation_params=(
                    ("jaccard_threshold", 0.5),
                    ("num_hashes", 12),
                    ("bands", 12),
                ),
            ),
        ),
    )
    g = Gardener(
        spark,
        cfg,
        warehouse_root=str(tmp_path / "wh"),
        landing_root=str(tmp_path / "landing"),
        schema_for=lambda job: SCHEMA,
        state_dir=str(tmp_path / "state"),
        retry_delay_sec=0.1,
    )
    try:
        t = "2024-03-01T01:00:00Z"
        rows = [
            {"id": "a", "parser": {"Time": t}, "text": LONG_A},
            {"id": "b", "parser": {"Time": t}, "text": LONG_A_NEAR},
            {"id": "c", "parser": {"Time": t}, "text": LONG_B},
        ]
        job = _run_job(g, landing=str(tmp_path / "landing"),
                       datatype="banded", rows=rows)
        st = g.tracker.get_status(job.key())
        assert st.state == J.COMPLETE, [si.state for si in st.history]
        wh = Warehouse(str(tmp_path / "wh"))
        joined = wh.read_partition(g.spark, "join", "corpus", "banded", job.date)
        # b (near-dup of a at jaccard ~0.9) drops; unrelated c survives
        assert {r.id for r in joined.collect()} == {"a", "c"}
    finally:
        g.monitor.shutdown()


def test_decontam_stage_drops_benchmark_overlap(spark, tmp_path):
    """Decontamination stage: docs sharing a distinct word-5-gram with
    the configured benchmark table drop at decontam_max_overlap=0.0;
    clean docs and docs too short to shingle (unscorable at the n-gram
    grain) are kept. Also pins the CurationSpec validation: the stage
    refuses to configure without a benchmark table triple."""
    from etl_gardener_spark.orchestrator.curation import CurationSpec

    with pytest.raises(ValueError, match="decontam_bench"):
        CurationSpec(stages=("decontam",))
    # YAML lists normalize to the tuple the dataclass documents
    assert CurationSpec(
        stages=("decontam",), decontam_bench=["bench", "eval", "suite"]
    ).decontam_bench == ("bench", "eval", "suite")

    cfg = GardenerConfig(
        start_date=Date(2024, 3, 1),
        sources=(
            SourceConfig(
                bucket="b",
                experiment="corpus",
                datatype="decon",
                datasets=Datasets(tmp="tmp_dc", raw="raw_dc", join="dc"),
                curation=("decontam",),
                curation_params=(
                    ("decontam_bench", ("bench", "eval", "suite")),
                    ("decontam_ngram", 5),
                    ("decontam_max_overlap", 0.0),
                ),
            ),
        ),
    )
    g = Gardener(
        spark,
        cfg,
        warehouse_root=str(tmp_path / "wh"),
        landing_root=str(tmp_path / "landing"),
        schema_for=lambda job: SCHEMA,
        state_dir=str(tmp_path / "state"),
        retry_delay_sec=0.1,
    )
    try:
        wh = Warehouse(str(tmp_path / "wh"))
        bench_passage = (
            "which element has the atomic number seventeen in the "
            "periodic table of elements"
        )
        bench = spark.createDataFrame(
            [("q1", bench_passage, Date(2024, 1, 1))],
            "id string, text string, date date",
        )
        wh.overwrite_partitions(bench, "bench", "eval", "suite")

        t = "2024-03-01T01:00:00Z"
        rows = [
            # clean doc, no benchmark n-gram
            {"id": "a", "parser": {"Time": t}, "text": LONG_A},
            # quotes a benchmark passage verbatim inside its own prose
            {"id": "leak", "parser": {"Time": t},
             "text": "students often ask " + bench_passage + " during exams"},
            # too short to shingle at n=5: unscorable, kept
            {"id": "tiny", "parser": {"Time": t}, "text": "four words only here"},
        ]
        job = _run_job(g, landing=str(tmp_path / "landing"),
                       datatype="decon", rows=rows)
        st = g.tracker.get_status(job.key())
        assert st.state == J.COMPLETE, [si.state for si in st.history]
        assert state_for("decontam") in [si.state for si in st.history]
        joined = wh.read_partition(g.spark, "join", "corpus", "decon", job.date)
        assert {r.id for r in joined.collect()} == {"a", "tiny"}
        details = " | ".join(si.detail or "" for si in st.history)
        assert "decontam: rows_out=2 deleted=1" in details, details
    finally:
        g.monitor.shutdown()


def test_semantic_dedup_stage(spark, tmp_path):
    """SemDeDup as a monitored chain stage (r10 verdict item 2), both
    centroid sources: (a) self-trained per-day kmeans_fit (seed=first_k,
    string-id safe); (b) a pinned warehouse centroid table routed via
    semdedup_centroids. A doc whose embedding has a smaller-id
    same-cluster neighbor at cosine >= semdedup_threshold drops; a
    dissimilar doc survives; a doc with NO embedding is unscorable at
    this grain and is kept. Also pins the spec validation."""
    from etl_gardener_spark.orchestrator.curation import CurationSpec

    with pytest.raises(ValueError, match="semdedup_centroids"):
        CurationSpec(stages=("semantic_dedup",), semdedup_centroids=("a", "b"))
    assert CurationSpec(
        stages=("semantic_dedup",), semdedup_centroids=["m", "sem", "cents"]
    ).semdedup_centroids == ("m", "sem", "cents")

    emb_schema = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("embedding", T.ArrayType(T.DoubleType()))]
    )
    t = "2024-03-01T01:00:00Z"
    rows = [
        {"id": "a", "parser": {"Time": t}, "text": LONG_A,
         "embedding": [1.0, 0.0, 0.0, 0.0]},
        # near-identical vector to a (cos ~0.99995) -> min-id survivor a
        {"id": "b", "parser": {"Time": t}, "text": LONG_B,
         "embedding": [0.99, 0.01, 0.0, 0.0]},
        # orthogonal to a/b -> survives at any clustering
        {"id": "c", "parser": {"Time": t}, "text": LONG_A_NEAR,
         "embedding": [0.0, 1.0, 0.0, 0.0]},
        # no embedding: unscorable-keep
        {"id": "n", "parser": {"Time": t}, "text": "four words only here",
         "embedding": None},
    ]

    for variant, params, seed_cents in (
        ("selftrain", (("semdedup_threshold", 0.9), ("semdedup_k", 2)), False),
        (
            "pinned",
            (
                ("semdedup_threshold", 0.9),
                ("semdedup_centroids", ("model", "sem", "cents")),
            ),
            True,
        ),
    ):
        cfg = GardenerConfig(
            start_date=Date(2024, 3, 1),
            sources=(
                SourceConfig(
                    bucket="b",
                    experiment="corpus",
                    datatype=f"sd_{variant}",
                    datasets=Datasets(
                        tmp=f"tmp_{variant}", raw=f"raw_{variant}",
                        join=f"j_{variant}",
                    ),
                    curation=("semantic_dedup",),
                    curation_params=params,
                ),
            ),
        )
        g = Gardener(
            spark,
            cfg,
            warehouse_root=str(tmp_path / f"wh_{variant}"),
            landing_root=str(tmp_path / f"landing_{variant}"),
            schema_for=lambda job: emb_schema,
            state_dir=str(tmp_path / f"state_{variant}"),
            retry_delay_sec=0.1,
        )
        try:
            wh = Warehouse(str(tmp_path / f"wh_{variant}"))
            if seed_cents:
                cents = spark.createDataFrame(
                    [(0, [1.0, 0.0, 0.0, 0.0], Date(2024, 1, 1)),
                     (1, [0.0, 1.0, 0.0, 0.0], Date(2024, 1, 1))],
                    "cid long, cvec array<double>, date date",
                )
                wh.overwrite_partitions(cents, "model", "sem", "cents")
            job = _run_job(g, landing=str(tmp_path / f"landing_{variant}"),
                           datatype=f"sd_{variant}", rows=rows)
            st = g.tracker.get_status(job.key())
            assert st.state == J.COMPLETE, [si.state for si in st.history]
            assert state_for("semantic_dedup") in [
                si.state for si in st.history
            ]
            joined = wh.read_partition(
                g.spark, "join", "corpus", f"sd_{variant}", job.date
            )
            ids = {r.id for r in joined.collect()}
            assert ids == {"a", "c", "n"}, (variant, ids)
            details = " | ".join(si.detail or "" for si in st.history)
            assert "semantic_dedup: rows_out=3 deleted=1" in details, details
        finally:
            g.monitor.shutdown()


def test_curation_resume_from_persisted_tracker(spark, tmp_path):
    """Restart recovery at test scale (the pytest twin of
    tools/curation_restart_run.py's sf1 hard-kill proof): drive the
    chain with a Monitor wired for only a PREFIX of the stages (the
    process 'dies' with the tracker persisted at curating:exact_dedup),
    then build a FRESH Tracker from the saved JSON and a fresh Monitor
    with the full chain — the resumed run must converge to exactly the
    same curated + packed content as an uninterrupted run, and the
    recovered tracker must resume from the persisted mid-chain state,
    not from the start (the reference's no-leases-survive-restart
    property: tracker/tracker.go recovery + the claim set rebuilt
    empty)."""
    from etl_gardener_spark.orchestrator.curation import (
        STAGE_ORDER,
        CurationActions,
        CurationSpec,
    )
    from etl_gardener_spark.orchestrator.monitor import Action, Monitor
    from etl_gardener_spark.orchestrator.tracker import Tracker

    day = Date(2024, 3, 1)
    chain = tuple(s for s in STAGE_ORDER if s != "semantic_dedup")
    spec = CurationSpec(
        stages=chain,
        min_quality=0.25,
        jaccard_threshold=0.5,
        pack_capacity=40,
        decontam_bench=("bench", "eval", "suite"),
    )
    job = J.Job(
        bucket="b", experiment="corpus", datatype="webdocs", date=day,
        datasets=Datasets(tmp="t", raw="r", join="c"),
    )
    rows = [
        ("a", LONG_A + " contact bob@example.com"),
        ("b", LONG_A),
        ("d", LONG_B),
        ("e", "  " + LONG_B.upper() + "  "),
        ("z", "!!! !!! !!! !!! !!!"),
    ]

    def build(root):
        wh = Warehouse(str(root / "wh"))
        docs = spark.createDataFrame(
            [(i, t, day) for i, t in rows], "id string, text string, date date"
        )
        wh.overwrite_partitions(docs, "join", "corpus", "webdocs")
        bench = spark.createDataFrame(
            [("q", "nothing matches this benchmark here", Date(2024, 1, 1))],
            "id string, text string, date date",
        )
        wh.overwrite_partitions(bench, "bench", "eval", "suite")
        return wh

    def wire(tracker, wh, stages):
        monitor = Monitor(tracker, retry_delay_sec=0.1)
        ca = CurationActions(spark, wh, lambda _j: spec)
        states = [state_for(s) for s in chain]
        nexts = states[1:] + [J.COMPLETE]
        for st, nxt, stage in zip(states, nexts, chain):
            if stage in stages:
                monitor.add_action(Action(st, nxt, ca._stage_action(stage)))
        return monitor

    def content(wh):
        j = wh.read_partition(spark, "join", "corpus", "webdocs", day)
        p = wh.read_partition(spark, "packed", "corpus", "webdocs", day)
        return (
            sorted((r.id, r.text) for r in j.collect()),
            sorted((r.id, r.n_tokens, r.bin_id) for r in p.collect()),
        )

    # uninterrupted reference run
    wh1 = build(tmp_path / "one")
    t1 = Tracker(saver_path=str(tmp_path / "one" / "tracker.json"))
    t1.add_job(job)
    t1.set_status(job.key(), state_for(chain[0]))
    m1 = wire(t1, wh1, set(chain))
    assert m1.drain(timeout_sec=300.0)
    assert t1.get_status(job.key()).state == J.COMPLETE
    expect = content(wh1)

    # interrupted run: the monitor only knows the prefix, so the chain
    # stalls with the tracker persisted at curating:exact_dedup
    prefix = ("scrub", "quality_gate", "lm_outlier_gate", "decontam")
    wh2 = build(tmp_path / "two")
    saver = str(tmp_path / "two" / "tracker.json")
    t2 = Tracker(saver_path=saver)
    t2.add_job(job)
    t2.set_status(job.key(), state_for(chain[0]))
    m2 = wire(t2, wh2, set(prefix))
    assert m2.drain(timeout_sec=300.0)
    assert t2.get_status(job.key()).state == state_for("exact_dedup")
    assert t2.save(force=True)

    # "restart": fresh tracker recovered from disk, full chain wired
    t3 = Tracker(saver_path=saver)
    st = t3.get_status(job.key())
    assert st is not None and st.state == state_for("exact_dedup")
    # full history survived the round-trip
    assert [si.state for si in st.history][: len(prefix) + 1] == [
        "init", *[state_for(s) for s in prefix]
    ]
    m3 = wire(t3, wh2, set(chain))
    assert m3.drain(timeout_sec=300.0)
    assert t3.get_status(job.key()).state == J.COMPLETE
    assert content(wh2) == expect
    m1.shutdown(), m2.shutdown(), m3.shutdown()
