"""Graph analytics over relational edge lists: PageRank.

Web-corpus curation ranks domains by link authority (Common Crawl's
harmonic-centrality rankings, OPIC crawl ordering); the training-data
analog scores domains for mixing/sampling priors. The reference repo has
no graph surface (confirmed in SURVEY §2.7); together with
``operators/dedup.py::connected_components`` this module is the
beyond-reference graph story.

PageRank here is the classic damped power iteration (Page et al. 1999):

    rank'(v) = (1 - d)/N + d · Σ_{u→v} rank(u)/outdeg(u)

Each iteration is ONE shuffle: contributions flow along edges (join on
src), then a groupBy(dst) fold. Iteration count is fixed (power iteration
converges geometrically at rate d; 10-20 rounds suffice for ranking use).

Determinism (the point of this implementation): the per-destination sum
folds contributions in sorted src order with a 0.0 initial accumulator —
bit-identical to a SQL ``list_reduce(list(c ORDER BY src))`` — so the
whole iterative computation is exactly reproducible across engines and
cluster layouts, unlike a plain SUM() whose partial-aggregation order is
runtime-dependent. At web scale swap the sorted fold for plain SUM (and
accept last-ulp drift) once bit-reproducibility stops being worth the
collect_list memory: the shuffle shape is identical.

Dangling nodes (no out-edges) keep receiving rank but forward none; their
mass is dropped, not redistributed — the variant DuckDB can mirror without
a global rank-sum exchange per round. Lineage is cut per iteration with a
local checkpoint so the plan stays flat (the standard Spark iterative
pattern, same as connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 5, damping: float = 0.85,
             checkpoint: bool = True, seeds: DataFrame = None,
             seed_col: str = "node") -> DataFrame:
    """Ranks for every node appearing in ``edges`` → ``(node, rank)``.

    ``edges`` is a distinct directed edge list; duplicate edges should be
    deduped by the caller (each duplicate adds weight).

    ``seeds`` switches to PERSONALIZED PageRank (Haveliwala 2002): the
    teleport mass lands only on the seed set (uniformly), and the walk
    starts there — the crawl-frontier / related-items scoring where
    relevance means "close to these nodes", not globally central. Seeds
    are broadcast (a seed set is small by definition); ranks of nodes
    unreachable from the seeds converge to 0."""
    if checkpoint:
        # Materialize the edge list ONCE: `nodes`, `outdeg` and `e` all
        # re-derive from `edges`, and an expensive caller frame (e.g. a
        # multi-join edge build) would otherwise re-execute for each of
        # their checkpoints — `e`'s plan even contains the edges subtree
        # twice (self-join with outdeg). Everything below now derives
        # from the cached partitions; same rows, same results.
        edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()
    if seeds is not None:
        seed_nodes = seeds.select(F.col(seed_col).alias("node")).distinct()
        ns = seed_nodes.count()
        if ns == 0:
            raise ValueError("seeds is empty")
        nodes = nodes.join(
            F.broadcast(seed_nodes.withColumn("_is_seed", F.lit(True))),
            "node", "left",
        ).select("node", F.coalesce("_is_seed", F.lit(False)).alias("_is_seed"))
        if checkpoint:
            nodes = nodes.localCheckpoint(eager=True)
    outdeg = edges.groupBy(src).agg(F.count("*").alias("_outdeg"))
    # edges carry their src outdegree so each round is one join + one agg
    e = edges.join(outdeg, src).select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), "_outdeg"
    )
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    if seeds is None:
        base = F.lit((1.0 - damping) / n)
        ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    else:
        seed_mass = F.when(F.col("_is_seed"), F.lit(1.0 / ns)).otherwise(F.lit(0.0))
        base = F.when(F.col("_is_seed"),
                      F.lit((1.0 - damping) / ns)).otherwise(F.lit(0.0))
        ranks = nodes.select("node", seed_mass.alias("rank"))
    for _ in range(iters):
        contribs = e.join(
            ranks, e["_src"] == ranks["node"]
        ).select(
            "_src", "_dst", (F.col("rank") / F.col("_outdeg")).alias("_c")
        )
        summed = contribs.groupBy("_dst").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_src", "_c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_c"],
            ).alias("_in")
        )
        ranks = nodes.join(
            summed, nodes["node"] == summed["_dst"], "left"
        ).select(
            "node",
            (base + F.lit(damping) * F.coalesce("_in", F.lit(0.0))).alias("rank"),
        )  # base is per-node when personalized (seed columns ride `nodes`)
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Global and per-node triangle counts of the UNDIRECTED simple graph
    induced by ``edges`` (direction and duplicates are erased first; self
    loops dropped). Returns ``(node, n_triangles)`` — one row per node
    that participates in at least one triangle.

    Classic two-join formulation on canonically ordered edges (a<b):
    wedge (a<b<c from a's edge list) ⋈ closing edge (b,c) — every
    triangle is found exactly once, so the per-node count is one
    explode+groupBy over the closed wedges. Shuffle keys are node ids;
    the wedge join's skew follows the max degree — pre-filter supernodes
    or salt the wedge key on power-law graphs (the standard mitigation;
    see operators/skew.py)."""
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    e1 = canon.select(F.col("a"), F.col("b"))
    e2 = canon.select(F.col("a").alias("a2"), F.col("b").alias("c"))
    wedges = e1.join(e2, e1["a"] == e2["a2"]).filter(F.col("b") < F.col("c"))
    closed = wedges.join(
        canon.select(F.col("a").alias("b"), F.col("b").alias("c")),
        ["b", "c"],
    ).select("a", "b", "c")
    return (
        closed.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
