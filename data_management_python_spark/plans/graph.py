"""Graph analytics over relational edge sets: fixed-iteration PageRank
and support-thresholded triangle counting.

Beyond-reference (the reference's only graph-shaped work is the
project↔sample↔experiment FK web it walks with single-row ORM hops);
these are the relationship-analytics primitives a curation pipeline
runs over similarity/co-occurrence graphs, expressed so every step is
a bounded equi-join:

- PageRank: the customer↔supplier transaction graph (edges
  symmetrized so no node dangles), power iteration unrolled to a
  FIXED count — each iteration is one |E|-bounded hash join plus a
  partial aggregate, the lineage stays 3 deep (no checkpoint
  needed), and the whole thing is SQL-expressible, so the oracle
  checks it exactly.  The open-ended-convergence variant is
  `d_dup_clusters`' loop (iterate + localCheckpoint); this is the
  bounded-cost form a scheduled 100 TB job actually runs.

- Triangle counting: co-purchase edges (parts sharing an order) with
  a SUPPORT THRESHOLD before the cubic step — the edge build is
  per-order (bounded fan-out), the threshold prunes the hot
  long-tail pairs, and the triangle join orders vertices p1<p2<p3 so
  each triangle is counted once and the join never explodes
  symmetric duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_python_spark.catalog import load_table
from data_management_python_spark.plans import Query

QUERIES: list[Query] = []


def _q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES.append(Query(name=name, fn=fn, oracle=oracle, doc=doc))
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-filtered co-purchase edge set: part pairs (p1 < p2)
    sharing >= 2 orders, materialized ONCE per (session, sf_dir) and
    shared by g_triangle_count / g_link_prediction
    (operators.session_cache).

    The build is the per-order bounded self-join of lineitem with the
    support threshold applied BEFORE any quadratic consumer; both
    graph queries previously re-derived it per run, which made the
    edge build (not the analytics) the dominant cost of the family.
    The checkpoint holds |E| narrow long-pairs (~10^5 rows at sf0.1 —
    KBs), so keeping it for the session is free.
    """
    from data_management_python_spark.operators.session_cache import (  # noqa: PLC0415
        session_cached,
    )

    def build() -> DataFrame:
        li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        a, b = li.alias("a"), li.alias("b")
        return (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(
                F.col("a.l_partkey").alias("p1"),
                F.col("b.l_partkey").alias("p2"),
            )
            .agg(F.count(F.lit(1)).alias("w"))
            .filter(F.col("w") >= 2)
            .select("p1", "p2")
        )

    return session_cached(spark, "copurchase_edges", sf_dir, build)


def pagerank_fixed(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    broadcast_hints: bool = True,
    deg: DataFrame | None = None,
    n_nodes: int | None = None,
) -> DataFrame:
    """PageRank with a fixed iteration count over symmetric ``edges``
    (columns ``src``/``dst``; pass both directions so no node
    dangles).  Returns (node, pr).

    Each iteration: contributions = edges ⋈ deg ⋈ ranks on src (deg
    and ranks are node-sized — both BROADCAST, so the edge set never
    shuffles), then a partial aggregate by dst: one |E|-bounded
    shuffle per iteration.  Callers should pass an already-materialized
    ``edges`` frame (localCheckpoint) — every iteration and the degree
    build branch from it, and without the cut each iteration would
    re-evaluate the whole edge-build lineage (measured 12.8s -> ~2s at
    sf0.1 on the customer-supplier graph).  The identical deg subplan
    repeats per iteration and Catalyst reuses its broadcast exchange.
    At rank cardinalities beyond broadcast range, pass
    ``broadcast_hints=False``: the hints drop and AQE picks the join
    strategy per iteration (sort-merge/shuffled-hash once ranks
    outgrow broadcast) — the iteration shape is unchanged, and the
    fixed point is identical up to float accumulation order (pinned
    by test at 6 dp; stress row in SCALE.md).

    The degree table is static across iterations, so it is
    materialized ONCE (eager localCheckpoint — node-sized narrow
    rows, disk-spillable) instead of re-aggregating the full edge
    set per iteration: the r12 plan audit showed the identical
    deg subtree planned per iteration (its Exchange is only
    runtime-reused within one execution, and the scan feeding it
    re-runs regardless).  Callers that already hold a materialized
    degree frame (same ``src``/``deg`` schema and grouping) pass it
    via ``deg``; ``n_nodes`` skips the node count when known.
    """
    hint = F.broadcast if broadcast_hints else (lambda df: df)
    if deg is None:
        deg = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint(eager=True)
        )
    nodes = deg.select(F.col("src").alias("node"))
    n = n_nodes if n_nodes is not None else deg.count()
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            edges.join(hint(deg), "src")
            .join(hint(ranks), F.col("src") == F.col("node"))
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("deg")).alias("c"),
            )
        )
        ranks = contrib.groupBy("node").agg(
            (F.lit(teleport) + F.lit(damping) * F.sum("c")).alias("pr")
        )
    return ranks


@_q(
    "g_pagerank",
    """
    WITH pairs AS (
      SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    n AS (SELECT COUNT(DISTINCT src) AS n FROM edges),
    r0 AS (SELECT src AS node, 1.0 / n.n AS pr FROM deg, n),
    r1 AS (
      SELECT e.dst AS node,
             0.15 / MIN(n.n) + 0.85 * SUM(r.pr / d.deg) AS pr
      FROM edges e JOIN r0 r ON e.src = r.node
                   JOIN deg d ON e.src = d.src, n
      GROUP BY e.dst
    ),
    r2 AS (
      SELECT e.dst AS node,
             0.15 / MIN(n.n) + 0.85 * SUM(r.pr / d.deg) AS pr
      FROM edges e JOIN r1 r ON e.src = r.node
                   JOIN deg d ON e.src = d.src, n
      GROUP BY e.dst
    ),
    r3 AS (
      SELECT e.dst AS node,
             0.15 / MIN(n.n) + 0.85 * SUM(r.pr / d.deg) AS pr
      FROM edges e JOIN r2 r ON e.src = r.node
                   JOIN deg d ON e.src = d.src, n
      GROUP BY e.dst
    ),
    scored AS (SELECT node, ROUND(pr * (SELECT n FROM n), 6) AS pr_scaled
               FROM r3)
    SELECT node, pr_scaled FROM scored
    ORDER BY pr_scaled DESC, node LIMIT 50
    """,
    doc="PageRank (3 power iterations, d=0.85) over the symmetrized "
    "customer-supplier transaction graph — per-iteration |E|-bounded "
    "join + partial agg, lineage depth 3, no driver state beyond the "
    "node count; top-50 by rank, scores scaled by N and rounded so "
    "the hash check is accumulation-order-safe",
)
def g_pagerank(spark, sf_dir):
    # Node ids stay LONG through the whole iteration (customer 2k,
    # supplier 2k+1) — distinct/join/agg on longs measured ~3x faster
    # than on 'c123'-style strings at sf0.1; the string labels the
    # oracle uses are applied only to the final top-50 projection.
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(
            pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        )
        # materialize once: n-count, degree build, and the per-iteration
        # joins all branch from this frame.  Partitioning is left as
        # produced (no key repartition): hash-partitioning by dst would
        # let each iteration's aggregate skip its shuffle, but on this
        # power-law graph (100 supplier hubs vs 2000 customers) it
        # concentrates the hub edges on a few tasks — measured 2x
        # SLOWER than paying the balanced per-iteration shuffle
        .localCheckpoint(eager=True)
    )
    # degree build shared with the iterations (pagerank_fixed would
    # otherwise derive its own) and the node count read from it —
    # one aggregate over the checkpointed edges serves deg, n, and
    # every iteration, instead of a distinct-count plus a per-
    # iteration re-aggregation (r12: 2 redundant full-edge aggs gone)
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    n = deg.count()
    ranks = pagerank_fixed(
        edges, iterations=3, damping=0.85, deg=deg, n_nodes=n
    )
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node") / 2).cast("long")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("long"))
    )
    return (
        ranks.select(
            label.alias("node"),
            F.round(F.col("pr") * n, 6).alias("pr_scaled"),
        )
        .orderBy(F.col("pr_scaled").desc(), "node")
        .limit(50)
    )


@_q(
    "g_triangle_count",
    """
    WITH e AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT 'n_edges' AS metric, COUNT(*) AS value FROM e
    UNION ALL
    SELECT 'n_triangles' AS metric, COUNT(*) AS value
    FROM e e1 JOIN e e2 ON e1.p2 = e2.p1
              JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
    """,
    doc="triangle count of the co-purchase graph (parts sharing an "
    "order, support >= 2): per-order bounded edge build, support "
    "threshold prunes hot pairs BEFORE the cubic step, p1<p2<p3 "
    "vertex ordering counts each triangle once — the "
    "candidate-prune-then-verify shape all the dedup ops use, applied "
    "to graph structure",
)
def g_triangle_count(spark, sf_dir):
    # shared per-session edge build (see copurchase_edges): the three
    # self-join arms all read the materialized checkpoint
    e = copurchase_edges(spark, sf_dir)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.p2") == F.col("e2.p1"))
        .join(
            e3,
            (F.col("e3.p1") == F.col("e1.p1"))
            & (F.col("e3.p2") == F.col("e2.p2")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    # tidy (metric, value) rows via UNION — a 1-row x 1-row join here
    # would plan as BroadcastNestedLoopJoin (constant keys fold away),
    # which the plan audit rightly refuses to whitelist
    n_edges = e.agg(F.count(F.lit(1)).alias("value")).select(
        F.lit("n_edges").alias("metric"), "value"
    )
    return n_edges.unionAll(
        tri.select(F.lit("n_triangles").alias("metric"),
                   F.col("n_triangles").alias("value"))
    )


@_q(
    "g_link_prediction",
    """
    WITH pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
    ),
    e AS (
      SELECT p1, p2 FROM pairs GROUP BY p1, p2 HAVING COUNT(*) >= 2
    ),
    sym AS (
      SELECT p1 AS a, p2 AS b FROM e
      UNION ALL SELECT p2, p1 FROM e
    ),
    rawdeg AS (SELECT a, COUNT(*) AS deg FROM sym GROUP BY a),
    -- hub cap: wedges through a center node cost deg^2, so common-
    -- neighbor evidence only counts through non-hub intermediaries
    -- (deg <= 32); capped degrees keep the Jaccard consistent
    symc AS (
      SELECT s.a, s.b FROM sym s JOIN rawdeg d ON d.a = s.b
      WHERE d.deg <= 32
    ),
    deg AS (SELECT a, COUNT(*) AS deg FROM symc GROUP BY a),
    cn AS (
      SELECT s1.a AS u, s2.a AS v, COUNT(*) AS common
      FROM symc s1 JOIN symc s2 ON s1.b = s2.b AND s1.a < s2.a
      GROUP BY s1.a, s2.a
    ),
    new_links AS (
      SELECT u, v, common FROM cn
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.p1 = cn.u AND e.p2 = cn.v)
    )
    SELECT u, v, CAST(common AS BIGINT) AS common_neighbors,
           ROUND(CAST(common AS DOUBLE) / (du.deg + dv.deg - common), 6)
             AS neighborhood_jaccard
    FROM new_links
    JOIN deg du ON du.a = u
    JOIN deg dv ON dv.a = v
    ORDER BY common_neighbors DESC, neighborhood_jaccard DESC, u, v
    LIMIT 15
    """,
    doc="link prediction on the co-purchase graph: for part pairs NOT "
    "yet connected (support >= 2 edges), score by common-neighbor "
    "count and neighborhood Jaccard — the classic "
    "recommend-what-co-purchasers-bought heuristic.  Same "
    "candidate-prune-then-score shape as the dedup family applied to "
    "graph structure: the support threshold prunes before the "
    "two-hop self-join (wedge enumeration, the triangle query's "
    "first half), existing edges drop via anti-join, degrees "
    "broadcast back.  Wedge centers are DEGREE-CAPPED (<=32, the "
    "same idf-style prune as d_ngram_jaccard's shingle df cap, "
    "mirrored in the oracle): wedges cost deg^2 per center and a "
    "super-hub's common-neighbor evidence is weak anyway; capped "
    "degrees keep the Jaccard consistent.  The cap never binds on "
    "the real graph at bench scales (max degree 10 at sf0.1) — it "
    "bounds the adversarial clone-replicated stress corpus "
    "(SCALE.md).  Edge frame materialized once per session and "
    "shared with g_triangle_count (copurchase_edges)",
)
def g_link_prediction(spark, sf_dir):
    e = copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("p1").alias("a"), F.col("p2").alias("b")).unionAll(
        e.select(F.col("p2").alias("a"), F.col("p1").alias("b"))
    )
    rawdeg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    symc = sym.join(
        F.broadcast(
            rawdeg.filter(F.col("deg") <= 32).select(F.col("a").alias("b"))
        ),
        "b",
        "left_semi",
    )
    deg = symc.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    s1, s2 = symc.alias("s1"), symc.alias("s2")
    cn = (
        s1.join(
            s2,
            (F.col("s1.b") == F.col("s2.b"))
            & (F.col("s1.a") < F.col("s2.a")),
        )
        .groupBy(F.col("s1.a").alias("u"), F.col("s2.a").alias("v"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    new_links = cn.join(
        e,
        (cn.u == e.p1) & (cn.v == e.p2),
        "left_anti",
    )
    du = deg.select(F.col("a").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("a").alias("v"), F.col("deg").alias("dv"))
    return (
        new_links.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            "u",
            "v",
            F.col("common").alias("common_neighbors"),
            F.round(
                F.col("common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("common")),
                6,
            ).alias("neighborhood_jaccard"),
        )
        .orderBy(
            F.col("common_neighbors").desc(),
            F.col("neighborhood_jaccard").desc(),
            "u",
            "v",
        )
        .limit(15)
    )


def _label_prop_oracle_sql(rounds: int = 6) -> str:
    """Fixed-round min-label propagation as chained CTEs: each round
    is exactly the Spark iteration (neighbor labels unioned with own,
    MIN per node), so labels match round-for-round."""
    # MATERIALIZED: without it DuckDB inlines the edge CTE into every
    # round's join and re-derives the lineitem self-join per round —
    # measured 158s vs ~2s at sf0.1 (Spark's localCheckpoint is the
    # same materialization decision on its side)
    ctes = ["""e AS MATERIALIZED (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )""", """sym AS MATERIALIZED (
      SELECT p1 AS a, p2 AS b FROM e
      UNION ALL SELECT p2, p1 FROM e
    )""", """l0 AS (
      SELECT DISTINCT a AS node, a AS label FROM sym
    )"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""l{i} AS MATERIALIZED (
      SELECT node, MIN(label) AS label FROM (
        SELECT s.a AS node, l.label
        FROM sym s JOIN l{i - 1} l ON l.node = s.b
        UNION ALL
        SELECT node, label FROM l{i - 1}
      ) GROUP BY node
    )""")
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT label AS component,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(node) AS min_node,
           MAX(node) AS max_node
    FROM l{rounds}
    GROUP BY label
    """
    )


@_q(
    "g_label_propagation",
    _label_prop_oracle_sql(6),
    doc="fixed-round min-label propagation over the co-purchase graph "
    "(6 rounds): each round joins neighbor labels across the edge set "
    "and takes the per-node MIN — the bounded-cost form of connected "
    "components, exactly as g_pagerank is the bounded-cost form of "
    "power iteration (the converge-until-done variant is "
    "llmdata.dedup.connected_components, pytest-verified; a FIXED "
    "round count makes this one SQL-expressible so the oracle checks "
    "labels round-for-round).  Per round: one |E|-bounded join with "
    "the node-sized label frame broadcast + a partial-agg MIN — "
    "shuffle volume O(V) per round, never edge-squared.  Labels "
    "checkpointed every 3 rounds to truncate lineage.  Edge set "
    "shared with the graph family via copurchase_edges "
    "(operators.session_cache).  Output is per-component rollup "
    "(size, min/max member), so result size is bounded by component "
    "count",
)
def g_label_propagation(spark, sf_dir, rounds: int = 6):
    e = copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("p1").alias("a"), F.col("p2").alias("b")).unionAll(
        e.select(F.col("p2").alias("a"), F.col("p1").alias("b"))
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        # the count gate below AND round 1 both consume the initial
        # label frame — pin it so the distinct over the edge set runs
        # once per call, not twice (r12, guide §2.4)
        .localCheckpoint(eager=True)
    )
    # broadcast of the node-sized label frame is forced only below a
    # measured node-count gate (~16 bytes/row -> well under executor
    # memory); on a large graph the O(V) frame must NOT bypass
    # autoBroadcastJoinThreshold — let AQE pick the join there (the
    # same forced-broadcast hazard incremental_near_dup documents).
    # One count against the pinned node frame, amortized over all
    # rounds.
    small_labels = labels.count() <= 4_000_000

    def _maybe_bcast(df):
        return F.broadcast(df) if small_labels else df

    for i in range(rounds):
        nbr = sym.join(
            _maybe_bcast(labels.select(F.col("node").alias("b"), "label")),
            "b",
        ).select(F.col("a").alias("node"), "label")
        labels = (
            nbr.unionAll(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if i % 3 == 2:
            labels = labels.localCheckpoint(eager=True)
    return labels.groupBy(F.col("label").alias("component")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )
