"""connected_components: correctness on adversarial shapes (long chains
exercise the pointer-jumping path; near-cliques are the LSH-bucket shape)
and a hypothesis property test against a union-find reference."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from etl_gardener_spark.operators.graph import connected_components


def _run(spark, n_vertices: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    v = spark.createDataFrame([(i,) for i in range(n_vertices)], "id: long")
    e = spark.createDataFrame(edges or [(0, 0)], "src: long, dst: long")
    out = connected_components(v, e, id_col="id", src="src", dst="dst")
    return {r["id"]: r["component"] for r in out.collect()}


def _union_find(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        if 0 <= u < n and 0 <= v < n:
            ru, rv = find(u), find(v)
            parent[max(ru, rv)] = min(ru, rv)
    # root = min id of component
    comp = {}
    for i in range(n):
        r = find(i)
        while parent[r] != r:
            r = parent[r]
        comp[i] = min(comp.get(r, r), r)
    roots = {i: find(i) for i in range(n)}
    mins: dict[int, int] = {}
    for i, r in roots.items():
        mins[r] = min(mins.get(r, i), i)
    return {i: mins[roots[i]] for i in range(n)}


def test_chain_converges_logarithmically(spark):
    # path graph 0-1-2-...-19: worst case for plain min-propagation
    # (diameter rounds); pointer jumping must still converge inside the cap
    edges = [(i, i + 1) for i in range(19)]
    got = _run(spark, 20, edges)
    assert got == {i: 0 for i in range(20)}


def test_singletons_and_two_cliques(spark):
    edges = [(1, 2), (2, 3), (1, 3), (7, 9), (9, 8)]
    got = _run(spark, 11, edges)
    assert got[1] == got[2] == got[3] == 1
    assert got[7] == got[8] == got[9] == 7
    for lone in (0, 4, 5, 6, 10):
        assert got[lone] == lone


def test_duplicate_and_reversed_edges(spark):
    edges = [(5, 2), (2, 5), (5, 2), (2, 2)]
    got = _run(spark, 6, edges)
    assert got[2] == got[5] == 2


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=24),
    edges=st.lists(
        st.tuples(st.integers(0, 23), st.integers(0, 23)), max_size=40
    ),
)
def test_matches_union_find(spark, n, edges):
    edges = [(u, v) for u, v in edges if u < n and v < n]
    got = _run(spark, n, edges)
    assert got == _union_find(n, edges)


def _pagerank_ref(n, edges, iters=3, damping=0.85):
    """Row-at-a-time python reference of operators/graph.pagerank."""
    und = []
    for u, v in edges:
        und.append((u, v))
        und.append((v, u))
    deg = {}
    for u, _ in und:
        deg[u] = deg.get(u, 0) + 1
    r = {i: 1.0 / n for i in range(n)}
    for _ in range(iters):
        contrib = {i: 0.0 for i in range(n)}
        for u, v in und:
            contrib[v] += r[u] / deg[u]
        r = {i: (1.0 - damping) / n + damping * contrib[i] for i in range(n)}
    return r


def test_pagerank_triangle_plus_isolate(spark):
    from etl_gardener_spark.operators.graph import pagerank

    n = 5
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]  # triangle + pendant + isolate 4
    verts = spark.createDataFrame([(i,) for i in range(n)], "id: long")
    e = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r["id"]: r["rank"] for r in pagerank(verts, e, iters=3).collect()}
    ref = _pagerank_ref(n, edges)
    assert set(got) == set(ref)
    for i in ref:
        assert abs(got[i] - ref[i]) < 1e-12, (i, got[i], ref[i])
    # isolate holds exactly the reset mass; hub 2 ranks highest
    assert abs(got[4] - 0.15 / n) < 1e-12
    assert got[2] == max(got.values())


@settings(max_examples=8, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=16),
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=30
    ),
)
def test_pagerank_matches_reference(spark, n, edges):
    from etl_gardener_spark.operators.graph import pagerank

    edges = [(u, v) for u, v in edges if u < n and v < n and u != v]
    if not edges:
        return
    verts = spark.createDataFrame([(i,) for i in range(n)], "id: long")
    e = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r["id"]: r["rank"] for r in pagerank(verts, e, iters=2).collect()}
    ref = _pagerank_ref(n, edges, iters=2)
    for i in ref:
        assert abs(got[i] - ref[i]) < 1e-9, (i, got[i], ref[i])
    # rank is a probability-ish mass: total <= 1 (dangling mass decays)
    assert sum(got.values()) <= 1.0 + 1e-9


def test_keep_best_by_score_elects_quality_over_min_id(spark):
    """The keep-best election must pick the HIGHEST-scoring member even
    when it has the largest id (where min-id election would differ),
    break score ties by ascending id, and leave singletons kept with
    NULL dup_of."""
    from etl_gardener_spark.operators.graph import keep_best_by_score

    comp = spark.createDataFrame(
        # cluster 1 = {1, 2, 9}; cluster 5 = {5, 7} (tie); 3 = singleton
        [(1, 1), (2, 1), (9, 1), (5, 5), (7, 5), (3, 3)],
        "id: long, component: long",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.5), (9, 0.9), (5, 0.4), (7, 0.4), (3, 0.1)],
        "id: long, score: double",
    )
    out = {
        r.id: (r.keep, r.dup_of)
        for r in keep_best_by_score(comp, scores).collect()
    }
    assert out[9] == (True, None)          # max score wins despite max id
    assert out[1] == (False, 9) and out[2] == (False, 9)
    assert out[5] == (True, None)          # tie -> smaller id
    assert out[7] == (False, 5)
    assert out[3] == (True, None)          # singleton


@settings(max_examples=10, deadline=None)
@given(
    comps=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 3)),
        min_size=1, max_size=20,
    ),
    scores=st.lists(st.sampled_from([0.1, 0.25, 0.5, 0.5, 0.9]), min_size=20, max_size=20),
)
def test_keep_best_by_score_matches_argmax(spark, comps, scores):
    """Property: the elected survivor per component is exactly the
    python argmax over (score DESC, id ASC), every member points at it,
    and exactly one keep per component — including score ties."""
    from etl_gardener_spark.operators.graph import keep_best_by_score

    uniq = {i: c for i, c in comps}
    rows = sorted(uniq.items())
    comp_df = spark.createDataFrame(rows, "id: long, component: long")
    score_rows = [(i, scores[i % len(scores)]) for i, _ in rows]
    score_df = spark.createDataFrame(score_rows, "id: long, score: double")
    got = {
        r.id: (r.keep, r.dup_of)
        for r in keep_best_by_score(comp_df, score_df).collect()
    }
    smap = dict(score_rows)
    by_comp = {}
    for i, c in rows:
        by_comp.setdefault(c, []).append(i)
    for c, members in by_comp.items():
        winner = min(members, key=lambda i: (-smap[i], i))
        for i in members:
            assert got[i] == ((True, None) if i == winner else (False, winner))


def test_keep_best_by_score_keeps_unscored_members(spark):
    """r8 ADVICE guard: a component member missing from the scores
    relation must NOT be dropped (LEFT join) — it sorts after every
    scored member (NULL score last) so it can neither win the election
    over a scored candidate nor vanish from the output. An all-unscored
    component falls back to the min-id survivor."""
    from etl_gardener_spark.operators.graph import keep_best_by_score

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], ["id", "component"]
    )
    # member 3 unscored; component 7 entirely unscored
    scores = spark.createDataFrame([(1, 0.2), (2, 0.9)], ["id", "score"])
    out = {
        r.id: (r.keep, r.dup_of, r.score)
        for r in keep_best_by_score(comp, scores).collect()
    }
    assert set(out) == {1, 2, 3, 7, 8}          # nobody dropped
    assert out[2] == (True, None, 0.9)           # best scored wins
    assert out[1] == (False, 2, 0.2)
    assert out[3] == (False, 2, None)            # unscored survives as dup
    assert out[7] == (True, None, None)          # min-id fallback
    assert out[8] == (False, 7, None)
