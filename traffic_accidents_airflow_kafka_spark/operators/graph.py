"""Graph centrality over candidate-pair relations.

Connected components (``operators/dedup.py``) answers "which docs form a
duplicate cluster"; PageRank answers "which doc is the cluster's natural
canonical representative" — the node most linked-to by near-duplicates,
mirrors, and partial copies. Production curation pipelines use exactly
this to pick the keeper inside large duplicate families (and, on citation
or hyperlink graphs, to weight documents for sampling).

Design: classic damped power iteration, driver-coordinated like the
connected-components loop — per round ONE join (edges × ranks, keyed on
the 8-byte node id) and one groupBy-sum, with ``localCheckpoint``
truncating lineage and dangling-mass redistribution as a single scalar
aggregate per round (one row to the driver, never data).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _edge_relation(
    pairs: DataFrame, src: str, dst: str, symmetrize: bool
) -> DataFrame:
    """Self-loop-free distinct edge relation (optionally symmetrized),
    materialized ONCE via localCheckpoint: nodes, degrees, and every
    round derive from this checkpoint, so the (possibly expensive)
    upstream candidate-pair plan never replays (measured 44 s → ~6 s at
    sf0.1 on the Jaccard-pair input). Shared by both PageRank variants."""
    fwd = pairs.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    edges = fwd
    if symmetrize:
        edges = fwd.union(
            pairs.select(F.col(dst).alias("e_src"), F.col(src).alias("e_dst"))
        )
    return edges.filter(F.col("e_src") != F.col("e_dst")).distinct().localCheckpoint()


class PairGraph:
    """Loop-invariant graph relations shared by both PageRank variants
    (r10, guide §5 caching-vs-recompute): the audit that runs the float
    AND fixed-point iterations over the SAME pair relation previously
    built the symmetrized edge relation, the node set, the out-degrees
    and their counts twice — four materializations and three count jobs
    of pure duplication. ``prepare_pair_graph`` builds them once; each
    variant's solo path is unchanged (it prepares its own). Only valid
    for ``symmetrize=True`` pair graphs (both catalog variants), where
    the node set is exactly the source side and no dangling nodes exist
    by construction."""

    __slots__ = ("edges_deg", "nodes", "n_nodes", "n_edges")

    def __init__(self, edges_deg: DataFrame, nodes: DataFrame, n_nodes: int, n_edges: int):
        self.edges_deg = edges_deg
        self.nodes = nodes
        self.n_nodes = n_nodes
        self.n_edges = n_edges


def prepare_pair_graph(
    pairs: DataFrame, src: str = "d1", dst: str = "d2"
) -> PairGraph:
    """Materialize (edges+degrees, nodes, counts) for a SYMMETRIZED pair
    graph once — see :class:`PairGraph`. For ``pagerank_fixedpoint`` the
    prepared relations yield EXACT-identical ranks (int64 sums are
    order-independent). For the float ``pagerank`` the node set is the
    same (src-only distinct equals union(src,dst) distinct under
    symmetrization) but the physical plan/partitioning differs from the
    solo path's union-distinct, so float ranks agree up to double-
    summation order (~1e-15 relative), not byte-for-byte — the audit's
    parity test pins them at 1e-12 (ADVICE r10)."""
    edges = _edge_relation(pairs, src, dst, symmetrize=True)
    nodes = edges.select(F.col("e_src").alias("id")).distinct().localCheckpoint()
    n_nodes = nodes.count()
    out_deg = edges.groupBy("e_src").agg(F.count(F.lit(1)).alias("__deg"))
    edges_deg = edges.join(out_deg, "e_src").localCheckpoint()
    return PairGraph(edges_deg, nodes, n_nodes, edges_deg.count())


def _loop_partitions(spark: SparkSession, n_edges: int) -> tuple[str, int]:
    """(previous setting, loop-sized shuffle-partition count): candidate-
    pair graphs are orders of magnitude smaller than the corpus that
    produced them, so iteration rounds shuffle on a graph-sized count,
    not the session default. Shared by both PageRank variants.

    Why this stays a session-conf set/restore (r11, VERDICT r10 #6
    measured and REJECTED both alternatives): an explicit
    ``repartition(loop_parts, key)`` on the per-round rank relation
    inserts an unconditional extra Exchange every round (the old form's
    groupBy output already satisfied the join's distribution), and
    removing the sizing entirely to let AQE coalesce costs one adaptive
    re-planning wait per shuffle stage per round — both measured ~30%
    slower on dedup_pagerank_exact (1.04-1.10 s conf → 1.34-1.46 s
    repartition → 1.38-1.40 s AQE-only, min-of-3 warm at sf0.1).

    CONCURRENT loops instead follow the pin-outside protocol
    (plans/llm_graph.py:pagerank_rank_audit): the caller computes
    loop_parts from the shared prepared graph, sets the session conf
    ONCE around the overlapped region, and the loops' own set/restore
    becomes an idempotent no-op (every inner set writes the value the
    outer pin already set; every inner restore writes the prev it read
    inside the pinned region — the same value), so no interleaving can
    leak a stale setting."""
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    return prev_parts, max(1, min(int(prev_parts), n_edges // 500_000 + 1))


class _RoundCheckpointer:
    """Truncate loop lineage every ``every`` rounds (each localCheckpoint
    is an eager job; rounds in between stay lazy and fuse). The last TWO
    checkpoints stay alive — the grandparent is released when a new one
    lands — so a convergence probe can still join the previous
    checkpointed relation after the current one materializes. Shared
    loop bookkeeping for both PageRank variants."""

    def __init__(self, every: int = 3):
        self.every = every
        self._last: DataFrame | None = None
        self._prev: DataFrame | None = None

    def is_boundary(self, it: int, iters: int) -> bool:
        """Whether round ``it`` materializes — the single source of truth
        for the cadence, shared with callers' convergence probes."""
        return it % self.every == self.every - 1 or it == iters - 1

    def maybe(self, df: DataFrame, it: int, iters: int) -> DataFrame:
        if self.is_boundary(it, iters):
            df = df.localCheckpoint()
            if self._prev is not None:
                self._prev.unpersist()
            self._prev, self._last = self._last, df
        return df


def pagerank(
    pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    damping: float = 0.85,
    iters: int = 10,
    symmetrize: bool = True,
    tol: float | None = 1e-9,
    prepared: PairGraph | None = None,
) -> DataFrame:
    """Damped PageRank over a pair relation; at most ``iters`` rounds.

    ``symmetrize=True`` (the near-dup-graph default) treats pairs as
    undirected edges. Dangling nodes (no out-edges) redistribute their
    mass uniformly each round, so ranks always sum to 1 (within float
    tolerance). Returns (id, rank).

    ``tol``: convergence early-exit, probed only at lineage-checkpoint
    boundaries (every 3 rounds) where the rank relation materializes
    anyway — one extra (id, double) join + scalar max per probe, repaid
    whenever the loop exits early. Near-dup graphs are unions of small
    near-cliques whose ranks settle in a handful of rounds, so the
    default 10-round budget usually cuts to the first probe. ``None``
    restores the fixed-round behavior.

    Scale: the edge relation (joined once with out-degrees) is
    materialized up front and re-joined each round — rounds shuffle
    (node_id, double) pairs only. Shuffle partitions are sized to the
    GRAPH (like the CC loop): candidate-pair graphs are orders of
    magnitude smaller than the corpus that produced them.
    """
    spark = pairs.sparkSession
    if prepared is not None:
        if not symmetrize:
            raise ValueError("prepared graphs are symmetrized by contract")
        nodes, n_nodes = prepared.nodes, prepared.n_nodes
        edges_deg, n_edges = prepared.edges_deg, prepared.n_edges
        if n_nodes == 0:
            return nodes.withColumn("rank", F.lit(0.0))
        dangling_nodes = None
        has_dangling = False
    else:
        edges = _edge_relation(pairs, src, dst, symmetrize)

        nodes = (
            edges.select(F.col("e_src").alias("id"))
            .union(edges.select(F.col("e_dst").alias("id")))
            .distinct()
            .localCheckpoint()
        )
        n_nodes = nodes.count()
        if n_nodes == 0:
            return nodes.withColumn("rank", F.lit(0.0))

        out_deg = edges.groupBy("e_src").agg(F.count(F.lit(1)).alias("__deg"))
        # Edges carry their source's out-degree from the start: the per-round
        # join then needs only the rank relation.
        edges_deg = edges.join(out_deg, "e_src").localCheckpoint()
        # Dangling node SET is loop-invariant — only its rank MASS changes.
        # A symmetrized graph has no dangling nodes by CONSTRUCTION (every
        # node appears as a source), so skip even building the relation —
        # that's one checkpoint + one count job saved before the loop.
        if symmetrize:
            dangling_nodes = None
            has_dangling = False
        else:
            dangling_nodes = nodes.join(
                out_deg.withColumnRenamed("e_src", "id"), "id", "left_anti"
            ).localCheckpoint()
            has_dangling = dangling_nodes.count() > 0
        n_edges = edges_deg.count()

    prev_parts, loop_parts = _loop_partitions(spark, n_edges)
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        base = (1.0 - damping) / n_nodes
        ranks = nodes.select("id", F.lit(1.0 / n_nodes).alias("rank"))
        # Lineage truncated every 3 rounds (_RoundCheckpointer): each
        # localCheckpoint is an eager job, and on a dangling-free graph
        # (every symmetrized near-dup graph) the rounds in between stay
        # lazy — 3 rounds fuse into one materialization, cutting
        # scheduler round-trips ~3x while the stacked plan stays 3 joins
        # deep. A dangling graph materializes every round anyway via the
        # scalar mass probe, so the cadence only changes job count.
        ckpt = _RoundCheckpointer(3)
        prev_probe = ranks
        for it in range(iters):
            joined = edges_deg.join(
                ranks.withColumnRenamed("id", "e_src"), "e_src"
            )
            contribs = joined.select(
                F.col("e_dst").alias("id"),
                (F.col("rank") / F.col("__deg")).alias("c"),
            )
            dangling = 0.0
            if has_dangling:
                dangling = (
                    ranks.join(dangling_nodes, "id", "left_semi")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                    .first()[0]
                )
            in_sums = contribs.groupBy("id").agg(F.sum("c").alias("__in"))
            if symmetrize:
                # Symmetrized graph: every node has an in-edge, so the
                # groupBy already covers the full node set — skip the
                # per-round nodes left join (measured ~25% off the
                # 10-round loop at sf0.1).
                covered = in_sums
            else:
                # Directed graphs can have in-degree-0 nodes that only
                # the node relation remembers.
                covered = nodes.join(in_sums, "id", "left")
            new_ranks = covered.select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("__in", F.lit(0.0)) + F.lit(dangling / n_nodes))
                ).alias("rank"),
            )
            was_ckpt = ckpt.is_boundary(it, iters)
            ranks = ckpt.maybe(new_ranks, it, iters)
            # Convergence probe at checkpoint boundaries only: both sides
            # are materialized relations, so the probe is one in-memory
            # (id, double) join + a scalar max to the driver.
            if tol is not None and was_ckpt and it < iters - 1:
                delta = (
                    ranks.join(
                        prev_probe.withColumnRenamed("rank", "__prev"), "id"
                    )
                    .agg(F.max(F.abs(F.col("rank") - F.col("__prev"))))
                    .first()[0]
                )
                prev_probe = ranks
                if delta is not None and delta < tol:
                    break
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return ranks


def triangle_stats(
    pairs: DataFrame, src: str = "d1", dst: str = "d2"
) -> DataFrame:
    """Per-node triangle count, degree, and local clustering coefficient
    over an undirected pair relation — the graph-density read that
    separates genuine duplicate FAMILIES (near-cliques: every copy
    matches every copy) from chains of borderline pairs (coefficient
    ~0: A~B~C where A and C differ), which is exactly the distinction
    a dedup keeper policy cares about.

    Node-iterator enumeration over id-CANONICAL edges (src < dst):
    wedges e(a,b) ⋈ e(b,c) give ordered candidates a<b<c, closed by an
    equi-join against e(a,c) — every triangle found exactly once, three
    equi-joins, no theta predicate. Scale: wedge count is bounded by
    Σ out-deg(v)²; on skewed graphs orient edges lower-DEGREE→higher
    instead of lower-id (same plan shape, O(m^1.5) wedge bound —
    the standard MapReduce triangle trick). The near-dup graph is
    orders of magnitude smaller than the corpus that produced it.

    Returns (id, degree, n_triangles, clustering_coeff) for every node
    with at least one edge.
    """
    canon = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # Materialize once: the (possibly expensive) candidate-pair plan
        # feeds three join legs below.
        .localCheckpoint()
    )
    wedges = canon.alias("e1").join(
        canon.alias("e2"), F.col("e1.b") == F.col("e2.a")
    ).select(
        F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c")
    )
    tris = wedges.alias("w").join(
        canon.alias("e3"),
        (F.col("w.a") == F.col("e3.a")) & (F.col("w.c") == F.col("e3.b")),
    ).select(F.col("w.a").alias("a"), F.col("w.b").alias("b"), F.col("w.c").alias("c"))
    per_node_tris = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    degrees = (
        canon.select(F.col("a").alias("id"))
        .union(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    possible = F.col("degree") * (F.col("degree") - 1) / 2.0
    return (
        degrees.join(per_node_tris, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    F.coalesce("n_triangles", F.lit(0)) / possible,
                ).otherwise(0.0),
                4,
            ).alias("clustering_coeff"),
        )
    )


def pagerank_fixedpoint(
    pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    iters: int = 10,
    scale: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
    prepared: PairGraph | None = None,
) -> DataFrame:
    """Quantized (fixed-point) PageRank: the float power iteration of
    :func:`pagerank`, re-expressed in pure int64 arithmetic so every
    intermediate — and therefore the final ranking — is BIT-IDENTICAL on
    any engine, partitioning, or accumulation order. Floats make damped
    power iteration inherently un-oracle-able (per-engine sum order
    drifts the last ulps); integers make it exactly replayable SQL.

    Ranks live in micro-units of ``1/scale``; per round, with
    ``d = damp_num/damp_den``:

        contrib(j)  = rank_u(j) // out_deg(j)           (floor div)
        rank_u'(i)  = BASE + (damp_num * sum contrib) // damp_den
        BASE        = (15 * (scale // n)) // 100 generalized to
                      ((damp_den - damp_num) * (scale // n)) // damp_den

    Quantization floors lose < out_deg(j) + 1 micro-units per node per
    round — a ~1e-12 relative perturbation at the default scale, far
    below any ranking decision the float variant could defend. Pairs are
    symmetrized (undirected near-dup graph), so there are no dangling
    nodes and no mass-redistribution term. Headroom: damp_num * total
    mass ~ 85e12 << 2^63.

    Scale shape matches :func:`pagerank`: edge relation materialized
    once with out-degrees, rounds shuffle (id, int64) pairs, lineage
    truncated every 3 rounds.
    """
    spark = pairs.sparkSession
    if prepared is not None:
        nodes, n_nodes = prepared.nodes, prepared.n_nodes
        edges_deg, n_edges = prepared.edges_deg, prepared.n_edges
    else:
        edges = _edge_relation(pairs, src, dst, symmetrize=True)
        nodes = (
            edges.select(F.col("e_src").alias("id")).distinct().localCheckpoint()
        )  # symmetrized: src set == node set
        n_nodes = nodes.count()
        out_deg = edges.groupBy("e_src").agg(F.count(F.lit(1)).alias("__deg"))
        edges_deg = edges.join(out_deg, "e_src").localCheckpoint()
        n_edges = edges_deg.count()
    if n_nodes == 0:
        return nodes.withColumn("rank_u", F.lit(0).cast("long"))

    init = scale // n_nodes
    base = ((damp_den - damp_num) * init) // damp_den

    prev_parts, loop_parts = _loop_partitions(spark, n_edges)
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        ranks = nodes.select("id", F.lit(init).cast("long").alias("rank_u"))
        ckpt = _RoundCheckpointer(3)
        for it in range(iters):
            joined = edges_deg.join(ranks.withColumnRenamed("id", "e_src"), "e_src")
            contribs = joined.select(
                F.col("e_dst").alias("id"),
                F.expr("rank_u div __deg").alias("c"),
            )
            new_ranks = contribs.groupBy("id").agg(
                (
                    F.lit(base)
                    + F.expr(f"({damp_num} * sum(c)) div {damp_den}")
                )
                .cast("long")
                .alias("rank_u")
            )
            ranks = ckpt.maybe(new_ranks, it, iters)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return ranks
