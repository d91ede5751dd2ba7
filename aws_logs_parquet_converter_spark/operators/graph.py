"""Iterative graph operators: connected components over the near-dup graph.

Near-dedup pipelines need one step the pair-producing operators (minhash /
simhash / ngram — dedup.py) don't give: grouping the pairs into duplicate
CLUSTERS and electing one survivor per cluster. That is connected components
— an inherently iterative algorithm, the one operator class here that a
single declarative query cannot express.

Implementation is min-label propagation as a driver-side loop of DataFrame
joins: each iteration pushes every node's current component label to its
neighbors and keeps the minimum. Iterations needed = graph diameter, which
for near-dup clusters is small (members of a cluster are all near each
other, so clusters are dense and shallow). Each iteration is ONE shuffle
(the groupBy-min; the propagate join reuses the edge partitioning), and
``localCheckpoint(eager=True)`` truncates lineage so the plan does not grow
with iteration count — the standard Spark iterative-algorithm pattern. At
100 TB-scale graphs with adversarial diameters, swap the propagation body
for the large-star/small-star rounds of Kiveris et al., "Connected
Components in MapReduce and Beyond" (SoCC'14) — same loop skeleton,
O(log n) rounds.

The reference has no graph surface (SURVEY.md §2.2); this is a §2.4
training-data-pipeline extension. Correctness is still oracle-checked: the
DuckDB twin computes the same closure with a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """(node, label) with label = min node id in the node's component.

    Only nodes that appear in ``edges`` are labeled (isolated rows never
    entered the pair graph and need no clustering).

    Min-label propagation needs DIAMETER rounds; hitting ``max_iters``
    without convergence raises (a silently-returned partial labeling
    splits real components — the caller should switch to
    :func:`connected_components_star`, whose round count is O(log n)
    regardless of diameter). ``stats``, if given, records
    ``rounds`` — the SCALE.md graph probe reads it.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)  # materialize once; the loop re-reads it
    )
    labels = (
        und.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint(eager=True)

    converged = False
    rounds = 0
    for rounds in range(1, max_iters + 1):
        msgs = und.join(labels, und["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("label")
        )
        new_labels = (
            labels.unionByName(msgs).groupBy("node").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise ValueError(
            f"connected_components did not converge in {max_iters} rounds "
            "— the graph's diameter exceeds the iteration cap; use "
            "connected_components_star (O(log n) rounds at any diameter)"
        )
    return labels


def duplicate_clusters(pairs: DataFrame) -> DataFrame:
    """Per-cluster summary of a dup-pair graph: survivor id + member count."""
    labels = connected_components(pairs)
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("n_members"))
        .select(F.col("label").alias("component"), "n_members")
    )


def _components_oracle() -> str:
    from .dedup import _SQL_BANDS, _SQL_CAND, _SQL_SHINGLES, _SQL_SIG

    return (
        "WITH RECURSIVE "
        + ",".join([_SQL_SHINGLES, _SQL_SIG, _SQL_BANDS, _SQL_CAND])
        + """,
        und AS (SELECT doc_a AS a, doc_b AS b FROM cand
                UNION SELECT doc_b, doc_a FROM cand),
        reach(node, label) AS (
            SELECT a, a FROM und
            UNION
            SELECT u.b, r.label FROM und u JOIN reach r ON r.node = u.a
        ),
        comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node)
        SELECT component, COUNT(*) AS n_members
        FROM comp GROUP BY component
        """
    )


@register(
    "dedup_components",
    oracle=_components_oracle(),
    doc="Connected components over the MinHash-LSH dup-pair graph: iterative "
    "min-label propagation (Spark) vs recursive-CTE closure (oracle).",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(load_table(spark, sf_dir, "documents")).select(
        "doc_a", "doc_b"
    )
    return duplicate_clusters(pairs)


def connected_components_star(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 40,
    stats: dict | None = None,
) -> DataFrame:
    """(node, label) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): O(log n) rounds regardless of graph DIAMETER, where
    min-label propagation needs diameter rounds (and raises past its
    iteration cap). Use this variant for adversarial/chain-shaped
    graphs; propagation remains cheapest for the shallow dense clusters
    near-dup graphs produce. ``stats``, if given, records ``rounds``.

    Each round is two hash aggregates + joins over the EDGE set, with
    ``localCheckpoint`` truncating lineage. Convergence = edge multiset
    fixed point (cheap count + hash check per round).
    """

    def sym(e: DataFrame) -> DataFrame:
        return (
            e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    nbrs = sym(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=True)

    def signature(e: DataFrame):
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    sig = signature(nbrs)
    converged = False
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        # large-star: each undirected edge, seen from its SMALLER endpoint
        # u, is REWIRED to (v, m(u)) with m(u) = min(N(u) ∪ {u}); the
        # round's graph is exactly these emissions (Kiveris et al.
        # Algorithm: the original edges are replaced, not kept — keeping
        # them doubles every degree per round, a 2^r edge blowup on
        # chain-shaped graphs that the decade probe caught as an OOM at
        # a mere 20k-node path)
        m = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            nbrs.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        nbrs = sym(large).localCheckpoint(eager=True)

        # small-star: each edge, seen from its LARGER endpoint u, is
        # rewired to (v, m) with m = the smallest of u's smaller
        # neighbors, plus the (u, m) edge itself — again emissions only
        low = nbrs.where(F.col("v") < F.col("u"))
        m2 = low.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            low.join(m2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .unionByName(m2.select("u", F.col("m").alias("v")))
        )
        nbrs = sym(small).localCheckpoint(eager=True)

        new_sig = signature(nbrs)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise ValueError(
            f"connected_components_star did not converge in {max_rounds} "
            "rounds — at 2 halvings/round that bounds components of "
            "~2^80 nodes, so this indicates a bug, not a big graph"
        )

    # converged: every node's smallest neighbor IS its component root
    labels = (
        nbrs.where(F.col("v") < F.col("u"))
        .groupBy("u")
        .agg(F.min("v").alias("label"))
        .select(F.col("u").alias("node"), "label")
    )
    roots = (
        nbrs.select("u")
        .distinct()
        .join(labels.select(F.col("node").alias("u")), "u", "left_anti")
        .select(F.col("u").alias("node"), F.col("u").alias("label"))
    )
    return labels.unionByName(roots)


# ---------------------------------------------------------------------------
# PageRank over the dup-pair graph
# ---------------------------------------------------------------------------

#: Rank unit: ranks are carried as integers in units of 1e-12 so every
#: iteration is EXACT (bigint sums are order-free; double sums would drift
#: with partition order and flip low bits between engines). Contributions
#: use floor integer division r DIV deg — deterministic in both engines.
PR_SCALE = 1_000_000_000_000
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio
PR_BASE = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN  # 0.15


def pagerank(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    n_iters: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair graph.

    The web-corpus curation signal (quality ∝ link centrality) run over
    the near-dup graph: heavily-duplicated template families concentrate
    rank mass at their hubs. Per iteration: one broadcast-free equi-join
    (edges x ranks on the source node — both sides shuffle-partitioned by
    node id, and AQE reuses the edge exchange across iterations), one
    hash aggregate (map-side partial sums of bigint contributions), and a
    left join back onto the node set for dangling-free rebasing.
    ``localCheckpoint`` truncates lineage per iteration (same skeleton as
    :func:`connected_components`). Nodes = nodes appearing in ``edges``;
    every node of the symmetrized graph has degree >= 1, so there are no
    dangling nodes by construction. Init rank = 1.0 per node (fixed
    iteration count, not run to convergence — the contract is N exact
    Jacobi steps, same as the oracle's unrolled CTEs).
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = und.groupBy("a").agg(F.count("*").alias("deg")).localCheckpoint(eager=True)
    ranks = deg.select(F.col("a").alias("node"), F.lit(PR_SCALE).alias("r"))
    for _ in range(n_iters):
        contrib = (
            und.join(deg, "a")
            .join(ranks, und["a"] == ranks["node"])
            .select(F.col("b").alias("node"), F.expr("r DIV deg").alias("c"))
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            deg.select(F.col("a").alias("node"))
            .join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(PR_BASE)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(s, CAST(0 AS BIGINT))) DIV {PR_DAMP_DEN}"
                    )
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("pr_e12"))


def _pagerank_oracle(n_iters: int = 3) -> str:
    from .dedup import _SQL_BANDS, _SQL_CAND, _SQL_SHINGLES, _SQL_SIG

    steps = []
    prev = "r0"
    for i in range(1, n_iters + 1):
        steps.append(
            f"""c{i} AS (
              SELECT u.b AS node, CAST(SUM({prev}.r // d.deg) AS BIGINT) AS s
              FROM und u JOIN {prev} ON {prev}.node = u.a
                         JOIN deg d ON d.node = u.a
              GROUP BY u.b),
            r{i} AS (
              SELECT d.node,
                     {PR_BASE} + ({PR_DAMP_NUM} * COALESCE(c{i}.s, 0)) // {PR_DAMP_DEN} AS r
              FROM deg d LEFT JOIN c{i} ON c{i}.node = d.node)"""
        )
        prev = f"r{i}"
    return (
        "WITH "
        + ",".join([_SQL_SHINGLES, _SQL_SIG, _SQL_BANDS, _SQL_CAND])
        + """,
        und AS (SELECT doc_a AS a, doc_b AS b FROM cand
                UNION SELECT doc_b, doc_a FROM cand),
        deg AS (SELECT a AS node, COUNT(*) AS deg FROM und GROUP BY a),
        r0 AS (SELECT node, CAST("""
        + str(PR_SCALE)
        + """ AS BIGINT) AS r FROM deg),
        """
        + ",".join(steps)
        + f"""
        SELECT node, CAST(r AS BIGINT) AS pr_e12 FROM {prev}
        """
    )


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc=(
        "3-iteration exact-integer PageRank over the MinHash-LSH dup-pair "
        "graph — the link-centrality quality signal for corpus curation; "
        "Spark iterative joins with localCheckpoint vs unrolled CTEs in "
        "the oracle."
    ),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(load_table(spark, sf_dir, "documents")).select(
        "doc_a", "doc_b"
    )
    return pagerank(pairs)


def triangle_count(edges: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """Per-node triangle counts over an undirected pair graph.

    Triangles measure cluster DENSITY: a near-dup component whose members
    are all mutually near (template family) is triangle-rich, while a
    chained component (A~B~C but A!~C — drift) has none, so the count
    separates the two survivorship regimes. Algorithm (Suri &
    Vassilvitskii, WWW'11 — the MapReduce triangle recipe): orient every
    edge from its LOWER-DEGREE endpoint to its higher-degree endpoint
    (ties broken by id), enumerate wedges by self-joining the oriented
    list on the shared source, then inner-join each wedge against its
    closing oriented edge. Each triangle is counted exactly once, rooted
    at its minimum-(degree, id) corner. The orientation is the whole
    point at scale: wedge volume is sum over nodes of C(out_deg, 2)
    where out-degrees are degree-ordered (bounded by O(sqrt(m)) on any
    graph), NOT C(deg, 2) at hubs — id-orientation lets a low-id hub of
    degree d keep all d edges outgoing and enumerate d^2/2 wedges, a
    quadratic blowup every real near-dup graph (template families = hub
    nodes) triggers. Measured: tools/scale_growth_graph.py, SCALE.md.
    Costs one extra degree aggregation + two degree-attach shuffles over
    the id-oriented variant — linear work that buys the d^2 -> m^1.5
    wedge bound.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = und.groupBy("a").agg(F.count("*").alias("deg"))
    # Attach both endpoint degrees, keep only min-(degree,id) -> max edges.
    withdeg = (
        und.join(deg, "a")
        .join(
            deg.select(F.col("a").alias("b"), F.col("deg").alias("degb")),
            "b",
        )
    )
    oriented = withdeg.where(
        (F.col("deg") < F.col("degb"))
        | ((F.col("deg") == F.col("degb")) & (F.col("a") < F.col("b")))
    ).select("a", "b", "degb")
    # Wedges at the shared low-rank source; order the two spokes by the
    # same (degree, id) rank so the closing edge's stored orientation
    # (min-rank -> max-rank) matches the wedge's (x, y) exactly.
    w1 = oriented.select(
        F.col("a").alias("lo"), F.col("b").alias("x"), F.col("degb").alias("dx")
    )
    w2 = oriented.select(
        F.col("a").alias("lo"), F.col("b").alias("y"), F.col("degb").alias("dy")
    )
    wedges = w1.join(w2, "lo").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tris = wedges.join(closing, ["x", "y"], "inner").select("lo", "x", "y")
    per_node = (
        tris.select(F.col("lo").alias("node"))
        .unionByName(tris.select(F.col("x").alias("node")))
        .unionByName(tris.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return per_node


def _triangles_oracle() -> str:
    from .dedup import _SQL_BANDS, _SQL_CAND, _SQL_SHINGLES, _SQL_SIG

    return (
        "WITH "
        + ",".join([_SQL_SHINGLES, _SQL_SIG, _SQL_BANDS, _SQL_CAND])
        + """,
        und AS (SELECT doc_a AS a, doc_b AS b FROM cand WHERE doc_a <> doc_b
                UNION SELECT doc_b, doc_a FROM cand WHERE doc_a <> doc_b),
        o AS (SELECT a, b FROM und WHERE a < b),
        tri AS (
          SELECT w1.a AS lo, w1.b AS x, w2.b AS y
          FROM o w1 JOIN o w2 ON w2.a = w1.a AND w1.b < w2.b
          JOIN o c ON c.a = w1.b AND c.b = w2.b),
        nodes AS (
          SELECT lo AS node FROM tri
          UNION ALL SELECT x FROM tri
          UNION ALL SELECT y FROM tri)
        SELECT node, COUNT(*) AS n_triangles FROM nodes GROUP BY node
        """
    )


@register(
    "graph_triangles",
    oracle=_triangles_oracle(),
    doc=(
        "Per-node triangle counts over the MinHash-LSH dup-pair graph — "
        "the cluster-density signal separating template families (dense, "
        "triangle-rich) from drift chains (A~B~C but A!~C, none). "
        "Degree-ordered wedge enumeration + closing-edge join."
    ),
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(load_table(spark, sf_dir, "documents")).select(
        "doc_a", "doc_b"
    )
    return triangle_count(pairs)


@register(
    "dedup_components_star",
    oracle=_components_oracle(),
    doc=(
        "Connected components via alternating large-star/small-star "
        "rounds (Kiveris et al., SoCC'14) — O(log n) rounds regardless "
        "of graph DIAMETER, where min-label propagation needs diameter "
        "rounds. Same dup-pair graph, same oracle as dedup_components: "
        "both algorithms must produce identical clusters, pinning the "
        "adversarial-diameter scale path end-to-end, not just as a "
        "library function."
    ),
)
def dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(load_table(spark, sf_dir, "documents")).select(
        "doc_a", "doc_b"
    )
    labels = connected_components_star(pairs)
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("n_members"))
        .select(F.col("label").alias("component"), "n_members")
    )
