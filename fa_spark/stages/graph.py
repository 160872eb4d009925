"""Distributed connected components — near-dup CLUSTER resolution.

The near-dup operators (minhash_band_pairs, simhash_near_dups, image
aHash) emit PAIR edges; corpus accounting needs transitive clusters:
a~b and b~c put a, b, c in ONE cluster even when a~c was never emitted.
(Reference parity: rdfind's duplicate *groups*, analyzer.py:315-364 —
the reference gets transitivity for free because exact-hash equality is
transitive; near-dup similarity is not, hence a real graph step here.)

Algorithm: iterative min-label propagation with pointer jumping (path
halving), the standard Spark-friendly CC formulation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public):

    label(v) ← min(label(v), min over neighbors' labels)   [one join+agg]
    label(v) ← label(label(v))                             [pointer jump]

Pure min-propagation needs O(diameter) rounds — a 1M-long chain would be
1M shuffles; the pointer-jump step contracts paths geometrically, giving
O(log n) rounds. Everything is DataFrame joins/aggregations — no
driver-side graph, no collect; each round shuffles only (id, label)
pairs, never payload columns. The driver-side loop is a handful of
iterations with one small count() action each for convergence detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """edges(src, dst) -> (id, cluster_id, is_canonical).

    cluster_id = the minimum vertex id reachable from ``id`` (undirected);
    is_canonical = (id == cluster_id) — the same min-election rule the
    exact-dedup window uses. ``vertices`` (single column ``id``) adds
    isolated vertices (clusters of one); when None, only endpoint vertices
    appear. Ids must be orderable (string/numeric). Raises RuntimeError if
    not converged after ``max_iter`` pointer-jumped rounds (~2^25-diameter
    coverage — unreachable for real inputs; a safety valve, not a cap).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).where(
        F.col("a") != F.col("b")
    )
    verts = sym.select(F.col("a").alias("id"))
    if vertices is not None:
        verts = verts.union(vertices.select(F.col(vertices.columns[0]).alias("id")))
    # localCheckpoint per iteration: an iterative plan that references the
    # previous iteration 3× grows the Catalyst tree ~6× per round —
    # persist() does NOT truncate logical plans, and by round ~8 analysis
    # alone OOMs the driver. Eager local checkpoints cut both the plan and
    # the RDD lineage each round (the GraphFrames AggregateMessages
    # pattern); blocks are freed by the ContextCleaner when the previous
    # iteration's DataFrame goes out of scope. Trade-off: a lost executor
    # fails the job instead of recomputing — acceptable for a short
    # O(log n)-round loop; a reliable checkpoint dir is the HA variant.
    sym = sym.localCheckpoint(eager=True)
    labels = (
        verts.distinct()
        .select("id", F.col("id").alias("lbl"))
        .localCheckpoint(eager=True)
    )

    converged = False
    for _ in range(max_iter):
        # 1) neighbor minimum (the propagation step)
        nbr = (
            sym.join(
                labels.select(F.col("id").alias("b"), F.col("lbl").alias("blbl")), "b"
            )
            .groupBy("a")
            .agg(F.min("blbl").alias("nlbl"))
            .select(F.col("a").alias("id"), "nlbl")
        )
        stepped = labels.join(nbr, "id", "left").select(
            "id", F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl")
        )
        # 2) pointer jump (path halving): lbl(v) <- lbl(lbl(v)); labels are
        # always existing vertex ids, so the self-join resolves every row
        jump = stepped.select(F.col("id").alias("lbl"), F.col("lbl").alias("lbl2"))
        new_labels = (
            stepped.join(jump, "lbl", "left")
            .select("id", F.least("lbl", F.coalesce("lbl2", "lbl")).alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.select("id", F.col("lbl").alias("old")), "id")
            .where(F.col("lbl") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    return labels.select(
        "id",
        F.col("lbl").alias("cluster_id"),
        (F.col("id") == F.col("lbl")).alias("is_canonical"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """Host-level PageRank (round 5 — the Common-Crawl web-graph
    centrality operator: CC publishes host-graph ranks computed over
    exactly this edge relation). Returns (id, rank) after ``iters``
    power iterations with the standard damping formulation:

        rank(v) <- (1-d)/N + d * (sum over in-edges rank(u)/outdeg(u)
                                  + dangling_mass/N)

    Scale shape: every iteration is ONE equi-join of the edge relation
    with the (id, rank) relation plus ONE partial-agg groupBy on dst —
    no window, no cartesian, no driver-side graph. Dangling mass (one
    tiny aggregate over the rank relation) is redistributed uniformly,
    so ranks sum to 1 every iteration. Plans are localCheckpointed per
    round like connected_components (iterative-plan growth lesson).
    N comes from one count() action on the vertex relation."""
    if vertices is None:
        vertices = (
            edges.select(F.col(src).alias("id"))
            .unionByName(edges.select(F.col(dst).alias("id")))
            .distinct()
        )
    else:
        vertices = vertices.select(F.col(vertices.columns[0]).alias("id"))
    vertices = vertices.localCheckpoint(eager=True)
    n = vertices.count()
    if n == 0:
        return vertices.withColumn("rank", F.lit(0.0))
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    # induced subgraph on `vertices` (round-5 review): an edge to a
    # vertex OUTSIDE the set would silently leak rank mass (the
    # contribution join drops it), breaking the sums-to-1 invariant.
    # Restricting both endpoints keeps mass conserved exactly; a vertex
    # whose every out-edge left the set becomes dangling and is handled
    # by the uniform redistribution below.
    e = (
        e.join(vertices.select(F.col("id").alias("_src")), "_src", "left_semi")
        .join(vertices.select(F.col("id").alias("_dst")), "_dst", "left_semi")
        .localCheckpoint(eager=True)
    )
    deg = (
        e.groupBy(F.col("_src").alias("id"))
        .agg(F.count("*").alias("_deg"))
        .localCheckpoint(eager=True)
    )
    ranks = vertices.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        with_deg = ranks.join(deg, "id", "left")
        # dangling vertices (no out-edges) leak their mass -> collect it
        # and spread uniformly (one scalar aggregate)
        dangling = (
            with_deg.where(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            e.join(
                with_deg.where(F.col("_deg").isNotNull()).select(
                    F.col("id").alias("_src"),
                    (F.col("rank") / F.col("_deg")).alias("_share"),
                ),
                "_src",
            )
            .groupBy(F.col("_dst").alias("id"))
            .agg(F.sum("_share").alias("_in"))
        )
        ranks = (
            vertices.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
