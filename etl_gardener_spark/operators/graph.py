"""Distributed connected components over a pair relation.

The missing last step of every near-dup pipeline: pair queries (exact
fingerprint, MinHash-LSH, SimHash, embedding cosine) emit EDGES, but a
dedup decision needs per-document CLUSTER ids — transitive closure of the
pair relation — so one canonical survivor can be elected per cluster.
The reference has no graph ops at all (its dedup is single-key keep-best,
cloud/bq/ops.go:184-218); this is part of the LLM-pipeline extension
surface.

Algorithm: min-label propagation with pointer jumping ("hash-to-min" /
HCC family). Each round every vertex takes the min of (its label, its
neighbors' labels, its label's label). The neighbor step alone converges
in O(diameter) rounds; the label-of-label self-join halves pointer chains
each round, giving O(log n) worst-case rounds over chain graphs. Every
step is an equi-join + min-aggregate — shuffle-on-key, map-side combine,
no collect, no per-vertex driver state — so the same plan runs on a
1000-executor cluster: per-round cost is |E| + 2|V| shuffled rows.
Real dedup graphs are near-cliques (LSH buckets), so rounds ~ 2-3.

Lineage is cut with an eager localCheckpoint per round; without it the
iteration-N plan nests N copies of the join tree and planning time
explodes (on a cluster, `checkpoint()` to the shuffle-replicated store
serves the same purpose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Label every vertex with the minimum vertex id reachable from it.

    Returns (id, component) — component is the cluster's smallest id, so
    ``id == component`` marks the canonical representative. Vertices
    absent from ``edges`` come out as singleton clusters.
    """
    e = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    # both directions once, reused every round. Emitted by ONE explode
    # over the edge stream, not a self-union: union branches duplicate
    # the whole upstream pair-pipeline subtree (LSH joins, simhash aggs)
    # inside this materialization job — measured ~2x the edge-build wall
    # on the pagerank twin (guide §2.4); same multiset either way.
    nbr = e.select(
        F.explode(
            F.array(
                F.struct(F.col("u"), F.col("v")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
            )
        ).alias("__uv")
    ).select("__uv.u", "__uv.v").localCheckpoint(eager=True)

    labels = (
        vertices.select(F.col(id_col).cast("long").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )

    prev_sum = None
    for _ in range(max_iter):
        nmin = (
            nbr.join(labels.select(F.col("id").alias("v"), "comp"), "v")
            .groupBy("u")
            .agg(F.min("comp").alias("ncomp"))
            .select(F.col("u").alias("id"), "ncomp")
        )
        stepped = labels.join(nmin, "id", "left").select(
            "id", F.least("comp", F.coalesce("ncomp", F.col("comp"))).alias("comp")
        )
        # pointer jump: comp := min(comp, comp(comp)) — labels are always
        # vertex ids, so the self-join on comp==id resolves
        jump = stepped.select(F.col("id").alias("comp"), F.col("comp").alias("jcomp"))
        labels = (
            stepped.join(jump, "comp", "left")
            .select("id", F.least("comp", F.coalesce("jcomp", F.col("comp"))).alias("comp"))
            .localCheckpoint(eager=True)
        )
        # labels are monotone non-increasing: the sum is a fixpoint witness
        cur_sum = labels.agg(F.sum("comp")).first()[0]
        if cur_sum == prev_sum:
            return labels.select("id", F.col("comp").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    ckpt_every: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair relation.

    Centrality inside near-dup clusters: a document tied to many
    near-duplicates ranks high, which makes rank a useful survivor-election
    criterion (keep the most-connected exemplar) complementary to
    ``connected_components``'s min-id rule. Returns ``(id, rank)``; ranks
    of isolated vertices settle at the reset mass ``(1-damping)/N``.

    Each iteration is one equi-join of the (degree-annotated, checkpointed)
    edge list with the rank vector plus a dst-key sum — shuffle cost
    |E| + |V| rows per round, no driver-side state beyond the loop counter.
    Lineage is cut every ``ckpt_every`` rounds rather than every round:
    unlike ``connected_components`` there is no per-round action here, so
    a few nested join trees plan fine and each skipped eager checkpoint
    saves one full materialization of the rank vector (measured ~30% at
    iters=3); unbounded iteration counts stay safe because the cut still
    happens periodically. Dangling mass is not redistributed (isolated
    vertices keep reset mass), which matches the oracle's formulation.

    Determinism: each edge contribution ``rank/deg`` is quantized to an
    INTEGER in 1e-12 units before the dst-key sum, so the sum is exact
    integer addition — fold-order-free — and the evolving rank vector is
    bit-identical across partitionings, reruns, and engines. A raw
    double sum is reassociation-sensitive: at sf1 one vertex's
    accumulated ulp drift crossed an 8-dp display cell and diverged from
    the oracle. The 1e-12 quantum is 4 decimal digits below the 8-dp
    display contract.
    """
    und = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    # one explode, not a self-union: a union would nest the whole
    # upstream pair pipeline under BOTH branches of this materialization
    # (and again under deg + the join below) — measured 3.7 -> 2.7 s on
    # the sf0.1 simhash graph (guide §2.4); identical edge multiset.
    und = und.select(
        F.explode(
            F.array(
                F.struct(F.col("u"), F.col("v")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
            )
        ).alias("__uv")
    ).select("__uv.u", "__uv.v")
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    # degree rides along with each edge; built once, reused every round
    out_edges = und.join(deg, "u").localCheckpoint(eager=True)
    verts = (
        vertices.select(F.col(id_col).cast("long").alias("id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = float(verts.count())
    if n == 0:
        # empty graph: no vertices, no ranks — 1/N is undefined
        # (differential-fuzz finding, seed 0)
        return verts.select(
            "id", F.lit(None).cast("double").alias("rank")
        ).limit(0)
    r = verts.select("id", F.lit(1.0 / n).alias("rank"))
    for i in range(iters):
        contrib = (
            out_edges.join(r.select(F.col("id").alias("u"), "rank"), "u")
            .groupBy("v")
            .agg(
                (
                    F.sum(
                        F.floor(
                            (F.col("rank") / F.col("deg")) * 1e12 + 0.5
                        ).cast("long")
                    )
                    / 1e12
                ).alias("c")
            )
        )
        r = verts.join(contrib.select(F.col("v").alias("id"), "c"), "id", "left").select(
            "id",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce("c", F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % ckpt_every == 0 and i < iters - 1:
            r = r.localCheckpoint(eager=True)
    return r


def keep_best_by_score(
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "id",
    component_col: str = "component",
    score_col: str = "score",
) -> DataFrame:
    """Elect the highest-scoring member of each component as its
    survivor (id ascending as the deterministic tie-break) — the
    keep-BEST election of the reference's dedup template (cloud/bq/
    ops.go:184-218) applied to near-dup clusters instead of exact keys.

    ``components`` is connected_components' output shape
    (id, component); ``scores`` maps id -> score. Returns one row per
    member: (id, component, score, keep, dup_of) where dup_of is the
    elected survivor for non-survivors, NULL for the survivor itself.
    Members with no score row are kept (LEFT join) with a NULL score
    and sort after every scored member, so a sparse score table can
    never silently drop a member or flip the election away from the
    best *scored* candidate.

    One equi-join + one per-component window: component sizes are
    near-dup groups (bounded in practice), so the window never sees a
    giant partition; nothing here is O(corpus²).
    """
    from pyspark.sql import Window

    jn = components.select(id_col, component_col).join(
        scores.select(id_col, score_col), id_col, "left"
    )
    w = Window.partitionBy(component_col).orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col).asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = jn.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__keep_id", F.first(id_col).over(wf)
    )
    return ranked.select(
        id_col,
        component_col,
        score_col,
        (F.col("__rn") == 1).alias("keep"),
        F.when(F.col("__rn") > 1, F.col("__keep_id")).alias("dup_of"),
    )
