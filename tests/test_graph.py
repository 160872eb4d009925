"""Connected-components operator (stages/graph.py): transitive chains,
stars, isolated vertices, long-chain convergence (pointer jumping), and
plan hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fa_spark.stages.graph import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _clusters(df):
    return {r["id"]: (r["cluster_id"], r["is_canonical"]) for r in df.collect()}


def test_transitive_chain_one_cluster(spark):
    """a~b, b~c, c~d without a~c/a~d: all four must share cluster min(a)."""
    out = _clusters(connected_components(_edges(spark, [(2, 7), (7, 4), (4, 9)])))
    assert out == {2: (2, True), 7: (2, False), 4: (2, False), 9: (2, False)}


def test_two_components_and_isolated_vertices(spark):
    verts = spark.range(10).select(F.col("id"))
    out = _clusters(
        connected_components(_edges(spark, [(1, 3), (5, 6), (6, 8)]), vertices=verts)
    )
    assert out[1] == (1, True) and out[3] == (1, False)
    assert out[5] == (5, True) and out[6] == (5, False) and out[8] == (5, False)
    for iso in (0, 2, 4, 7, 9):
        assert out[iso] == (iso, True)
    assert len(out) == 10


def test_star_cluster_min_election(spark):
    out = _clusters(connected_components(_edges(spark, [(9, 3), (9, 5), (9, 7)])))
    assert out == {9: (3, False), 3: (3, True), 5: (3, False), 7: (3, False)}


def test_long_chain_converges_via_pointer_jumping(spark):
    """A 64-vertex path has diameter 63; pure min-propagation would need 63
    rounds. Pointer jumping must converge within the default max_iter=25
    (log-ish rounds), proving the contraction actually happens."""
    n = 64
    out = _clusters(connected_components(_edges(spark, [(i, i + 1) for i in range(n - 1)])))
    assert all(out[i] == (0, i == 0) for i in range(n))


def test_self_loops_and_duplicate_edges_ignored(spark):
    out = _clusters(
        connected_components(_edges(spark, [(1, 1), (1, 2), (2, 1), (1, 2)]))
    )
    assert out == {1: (1, True), 2: (1, False)}


def test_string_ids(spark):
    e = spark.createDataFrame(
        [("urlb", "urlc"), ("urla", "urlb")], "src string, dst string"
    )
    out = _clusters(connected_components(e, src="src", dst="dst"))
    assert out == {
        "urla": ("urla", True),
        "urlb": ("urla", False),
        "urlc": ("urla", False),
    }


def test_empty_edges_with_vertices(spark):
    verts = spark.range(3)
    out = _clusters(
        connected_components(
            spark.createDataFrame([], "src long, dst long"), vertices=verts
        )
    )
    assert out == {0: (0, True), 1: (1, True), 2: (2, True)}


def test_unconverged_raises(spark):
    with pytest.raises(RuntimeError, match="convergence"):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(40)]), max_iter=1
        )


def test_no_cartesian_in_plan(spark):
    plan = (
        connected_components(_edges(spark, [(1, 2), (2, 3)]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_pagerank_sums_to_one_and_ranks_hubs(spark):
    """Round 5: damped power iteration — ranks stay a distribution every
    iteration (dangling mass redistributed), and an in-degree hub
    outranks leaf vertices."""
    from fa_spark.stages.graph import pagerank

    # star into 0, plus a dangling vertex 9 (no out-edges)
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(0, 9)], "src long, dst long"
    )
    pr = {r["id"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    # 9 receives the hub's ENTIRE rank (0's only out-edge), the hub
    # receives the five leaves' shares, the leaves only the base term
    assert pr[9] > pr[0] > pr[1]
    assert all(abs(pr[i] - pr[1]) < 1e-12 for i in range(2, 6))


def test_pagerank_uniform_on_cycle(spark):
    """A directed cycle is rank-symmetric: every vertex gets exactly
    1/N at every iteration."""
    from fa_spark.stages.graph import pagerank

    n = 8
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    pr = pagerank(edges, iters=4)
    for r in pr.collect():
        assert abs(r["rank"] - 1.0 / n) < 1e-12


def test_pagerank_induced_subgraph_conserves_mass(spark):
    """Round-5 review: an edge to a vertex outside a caller-supplied
    vertex set must not leak rank mass — the graph is induced on the
    set, and a vertex whose only out-edge left the set goes dangling."""
    from fa_spark.stages.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2)], "src long, dst long"
    )
    verts = spark.createDataFrame([(0,), (1,)], "id long")
    pr = {r["id"]: r["rank"] for r in pagerank(edges, iters=4, vertices=verts).collect()}
    assert set(pr) == {0, 1}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
