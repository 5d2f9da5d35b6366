"""Relational graph analytics: PageRank and HITS over edge tables.

A crawl corpus is also a graph (pages link pages, domains link
domains), and link authority is a quality prior every serious web
pipeline uses (the original use case — Page et al. 1999). The
engine's graph stance matches `llm.dedup.duplicate_clusters` (the
log-round connected-components star algorithm): a graph is an EDGE
TABLE, iterations are joins, and per-iteration driver state is one
double (the dangling mass), the same O(small-state) argument as
k-means' centroids.

`pagerank` runs power iteration relationally: each round is one
(rank ⋈ edges) contribution join + one ``groupBy(dst)`` sum — both
edge-partitioned, shuffles keyed on node id. Dangling mass (nodes
with no out-edges) is folded back uniformly each round, so ranks sum
to 1 exactly like the reference formulation. Two materialization
rules keep the iteration linear (both measured, not theoretical —
the naive lazy version re-executed the upstream edge-building joins
once per round, and a lazy-broadcast dangling variant went
quadratic inside the checkpoint window):

* the deduplicated edge table (and the node/out-degree tables
  derived from it) is persisted ONCE and reused every round;
* each round's rank table is materialized with
  ``localCheckpoint(eager=True)`` — persist alone is NOT enough:
  it caches blocks but leaves the logical plan nested, and by ~20
  rounds plan analysis itself OOMs the driver (measured). The
  checkpoint truncates the plan to a leaf, so lineage depth stays 1
  regardless of ``iterations``.

`hits` (Kleinberg 1999) is the two-score companion: hubs point at
good authorities, authorities are pointed at by good hubs. Each
round is two edge-keyed join+sum passes (hub→authority then
authority→hub) with L2 normalization; the norm is the per-round
one-double driver scalar.

At 100 TB: cost is iterations × (one edge-keyed shuffle), the known
floor for distributed PageRank without vertex-cut partitioning; the
per-round rank materialization is node-count-sized (≪ edges), spilled
via MEMORY_AND_DISK. For domain graphs (10⁷ nodes) the rank table
broadcasts and AQE turns the contribution join into a broadcast join
automatically.
"""

from __future__ import annotations

import math

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "hits",
    "k_core",
    "label_propagation",
    "pagerank",
    "shortest_paths",
    "triangle_count",
]


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """Power-iteration PageRank over a (src, dst) edge table.

    Parallel edges are collapsed (each distinct edge counts once);
    self-loops are dropped. Returns ``(node, rank)`` with ranks
    summing to 1, materialized (localCheckpoint) so downstream use
    doesn't re-run the iteration lineage. Fixed ``iterations`` rather
    than an epsilon stop: deterministic cost and deterministic
    output, which is what a reproducible corpus-prior wants (10
    iterations ranks a web-scale graph to ~1e-3; raise for tighter
    tails).
    """
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = (
        edges.select(
            F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
        )
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # out-degree joined onto the node table once: every iteration
    # reuses this cached (node, _deg) frame — _deg NULL marks dangling
    node_deg = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d")))
        .distinct()
        .join(
            e.groupBy(F.col("_s").alias("node")).agg(
                F.count("*").alias("_deg")
            ),
            on="node",
            how="left",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = node_deg.count()  # materializes both caches
    if n_nodes == 0:
        out = node_deg.select("node").withColumn("rank", F.lit(0.0))
        e.unpersist()
        node_deg.unpersist()
        return out
    base = (1.0 - damping) / n_nodes
    ranks = node_deg.withColumn(
        "rank", F.lit(1.0 / n_nodes)
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        # dangling nodes contribute their mass uniformly this round —
        # a one-double collect over the cached rank table
        dangling = (
            ranks.filter(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            ranks.filter(F.col("_deg").isNotNull())
            .join(e, ranks["node"] == e["_s"])
            .select(
                F.col("_d").alias("node"),
                (F.col("rank") / F.col("_deg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            node_deg.join(contribs, on="node", how="left")
            .select(
                "node",
                "_deg",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_in"), F.lit(0.0))
                        + F.lit(dangling / n_nodes)
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    out = ranks.select("node", "rank")
    node_deg.unpersist()
    e.unpersist()
    return out


def hits(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
) -> DataFrame:
    """Kleinberg HITS hub/authority scores over a (src, dst) edge table.

    Parallel edges are collapsed; self-loops are dropped. Per round:
    ``authority[j] = Σ hub[i] over edges (i→j)`` then L2-normalize,
    ``hub[i] = Σ authority[j] over edges (i→j)`` then L2-normalize —
    the textbook power iteration on EᵀE / EEᵀ. Returns
    ``(node, hub, authority)`` with each score vector at unit L2 norm
    (all-zero if the graph has no edges in that direction). Same
    materialization discipline as :func:`pagerank`: edges persisted
    once, scores localCheckpoint'ed per round so the logical plan
    never nests.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = (
        edges.select(
            F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
        )
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = nodes.count()  # materializes both caches
    if n_nodes == 0:
        out = nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )
        e.unpersist()
        nodes.unpersist()
        return out

    def _l2(df: DataFrame, col: str) -> float:
        s = df.agg(F.sum(F.col(col) * F.col(col))).collect()[0][0]
        return math.sqrt(s) if s else 1.0

    # two materializations per round: (hub, auth_raw) then
    # (auth, hub_raw); the final /hub-norm rides lazily on top of the
    # second checkpoint into the next round's join (plan depth 1)
    scores = nodes.select(
        "node", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        auth_raw = (
            scores.join(e, scores["node"] == e["_s"])
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum("hub").alias("_a"))
        )
        scores = (
            scores.drop("authority")
            .join(auth_raw, on="node", how="left")
            .select(
                "node",
                "hub",
                F.coalesce(F.col("_a"), F.lit(0.0)).alias("authority"),
            )
            .localCheckpoint(eager=True)
        )
        an = _l2(scores, "authority")
        # hub from RAW authority = an × (hub from normalized authority),
        # so dividing the summed contributions by an is exactly the
        # textbook update on the normalized vector
        hub_raw = (
            scores.join(e, scores["node"] == e["_d"])
            .groupBy(F.col("_s").alias("node"))
            .agg(F.sum("authority").alias("_h"))
        )
        scores = (
            scores.drop("hub")
            .join(hub_raw, on="node", how="left")
            .select(
                "node",
                (F.coalesce(F.col("_h"), F.lit(0.0)) / F.lit(an)).alias(
                    "hub"
                ),
                (F.col("authority") / F.lit(an)).alias("authority"),
            )
            .localCheckpoint(eager=True)
        )
        hn = _l2(scores, "hub")
        scores = scores.select(
            "node",
            (F.col("hub") / F.lit(hn)).alias("hub"),
            "authority",
        )
    out = scores.localCheckpoint(eager=True)
    nodes.unpersist()
    e.unpersist()
    return out


def connected_components(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    method: str = "star",
    max_iter: int = 50,
) -> DataFrame:
    """Weakly connected components over a (src, dst) edge table.

    General-graph alias of ``llm.dedup.duplicate_clusters`` (the
    log-round large-star/small-star algorithm by default, min-label
    propagation via ``method="label"``): returns ``(node, component)``
    with component = min node id in the component. Nodes only appear
    if they touch an edge — isolated vertices carry no edge rows.
    """
    out_df = edges.select(
        F.col(src_col).alias("id_a"), F.col(dst_col).alias("id_b")
    )
    from temporal_retriever_spark.llm.dedup import duplicate_clusters

    got = duplicate_clusters(out_df, max_iter=max_iter, method=method)
    return got.select(
        F.col("doc_id").alias("node"), F.col("cluster_id").alias("component")
    )


def label_propagation(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
) -> DataFrame:
    """Community detection by synchronous label propagation (LPA,
    Raghavan et al. 2007) over an undirected view of the edge table.

    Labels start as the node's own id; each round every node adopts
    the most frequent label among its neighbors PLUS its own current
    label (the self-vote — it breaks the classic two-node oscillation
    synchronous LPA suffers on bipartite structures), ties resolved
    to the LARGEST label (max-struct ordering — any fixed direction
    works; this one is a single ``max(struct(count, label))``
    aggregate, deterministic for numeric and string ids alike).

    Fixed ``iterations`` (LPA converges in a handful of rounds on
    modular graphs) keeps cost and output deterministic and the whole
    run oracle-replayable — the same contract as `pagerank`. Per
    round: ONE node-keyed join + ONE (node, label) count + ONE
    node-keyed argmax — all shuffles keyed on node id; per-round
    label tables are node-sized and ``localCheckpoint``'d so lineage
    depth stays 1 (see the module docstring for why persist alone is
    not enough). Returns ``(node, community)``; isolated vertices
    carry no edge rows and don't appear.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).filter(F.col("_s") != F.col("_d"))
    und = (
        e.union(e.select(F.col("_d"), F.col("_s")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # after symmetrization every node appears as _s
    labels = (
        und.select(F.col("_s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        nbr = und.join(labels, und["_d"] == labels["node"]).select(
            F.col("_s").alias("node"), "label"
        )
        votes = nbr.unionByName(labels.select("node", "label"))
        cnt = votes.groupBy("node", "label").agg(F.count("*").alias("_c"))
        labels = (
            cnt.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("_c").alias("c"), F.col("label").alias("l"))
                )["l"].alias("label")
            )
            .localCheckpoint(eager=True)
        )
    und.unpersist()
    return labels.select("node", F.col("label").alias("community"))


def k_core(
    edges: DataFrame,
    *,
    k: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node keeps degree ≥ k — the standard cohesion filter
    (Seidman 1983) that strips hairy periphery before community or
    influence analysis, and a robust spam screen on link graphs
    (low-core pages are the easily-manufactured ones).

    Iterative peeling as relational rounds: each round recomputes
    degrees INSIDE the surviving set (one edge-keyed join + one
    count) and drops nodes under k; stops at the fixed point (the
    survivor count is the per-round one-scalar driver state — the
    same O(small-state) contract as `pagerank`'s dangling mass).
    Peeling is monotone, so extra rounds past convergence are no-ops
    — the property that lets the oracle unroll a FIXED round count
    and still agree exactly. Survivor tables are node-sized and
    ``localCheckpoint``'d per round (lineage depth 1).

    Returns ``(node, core_degree)`` — the surviving nodes with their
    degree inside the k-core. Empty when no k-core exists.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1: {max_iter}")
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).filter(F.col("_s") != F.col("_d"))
    und = (
        e.union(e.select(F.col("_d"), F.col("_s")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    alive = und.select(F.col("_s").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    n_alive = alive.count()
    for _ in range(max_iter):
        if n_alive == 0:
            break
        deg = (
            und.join(alive.withColumnRenamed("node", "_s"), on="_s")
            .join(alive.withColumnRenamed("node", "_d"), on="_d")
            .groupBy(F.col("_s").alias("node"))
            .agg(F.count("*").cast("long").alias("core_degree"))
        )
        nxt = deg.filter(F.col("core_degree") >= int(k)).localCheckpoint(
            eager=True
        )
        n_next = nxt.count()
        alive = nxt.select("node")
        if n_next == n_alive:
            und.unpersist()
            return nxt.select("node", "core_degree")
        n_alive = n_next
    # converged to empty, or max_iter hit with the last survivor set:
    # recompute final degrees for the returned set
    deg = (
        und.join(alive.withColumnRenamed("node", "_s"), on="_s")
        .join(alive.withColumnRenamed("node", "_d"), on="_d")
        .groupBy(F.col("_s").alias("node"))
        .agg(F.count("*").cast("long").alias("core_degree"))
        .filter(F.col("core_degree") >= int(k))
    )
    und.unpersist()
    return deg


def triangle_count(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected view of the edges.

    The standard two-join MapReduce algorithm (Suri & Vassilvitskii
    2011) with DEGREE ORIENTATION: canonicalize each edge, then orient
    every edge from its lower-degree endpoint to the higher-degree one
    (ties by node id). Wedges are built only at each edge's low-degree
    end, so the wedge join fans out by min-degree — O(m^{3/2}) total
    wedges even on power-law graphs where a naive neighbor join
    explodes at the hubs. One wedge join + one closing semi-join +
    one explode/aggregate; returns ``(node, triangles)`` for every
    node that touches an edge (0 if it closes none).
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("_a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("_b"),
        )
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
    )
    deg = (
        und.select(F.col("_a").alias("node"))
        .union(und.select(F.col("_b")))
        .groupBy("node")
        .agg(F.count("*").alias("_deg"))
    )
    # orient low-degree -> high-degree (ties broken by id): every
    # wedge center has small out-degree by construction
    oriented = (
        und.join(deg.withColumnsRenamed({"node": "_a", "_deg": "_da"}), on="_a")
        .join(deg.withColumnsRenamed({"node": "_b", "_deg": "_db"}), on="_b")
        .select(
            F.when(
                (F.col("_da") < F.col("_db"))
                | ((F.col("_da") == F.col("_db")) & (F.col("_a") < F.col("_b"))),
                F.struct(F.col("_a").alias("u"), F.col("_b").alias("v")),
            )
            .otherwise(
                F.struct(F.col("_b").alias("u"), F.col("_a").alias("v"))
            )
            .alias("_e")
        )
        .select(F.col("_e.u").alias("_u"), F.col("_e.v").alias("_v"))
        .persist()
    )
    # wedges centered at u: (v, w) both out-neighbors of u
    left = oriented.select(F.col("_u").alias("_c"), F.col("_v").alias("_x"))
    right = oriented.select(F.col("_u").alias("_c"), F.col("_v").alias("_y"))
    wedges = left.join(right, on="_c").filter(F.col("_x") < F.col("_y"))
    # close the wedge against the canonical undirected edge list
    closed = wedges.join(
        und.select(F.col("_a").alias("_x"), F.col("_b").alias("_y")),
        on=["_x", "_y"],
        how="inner",
    )
    per_node = (
        closed.select(
            F.explode(F.array("_c", "_x", "_y")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    out = (
        deg.join(per_node, on="node", how="left")
        .select(
            "node",
            F.coalesce(F.col("triangles"), F.lit(0).cast("long")).alias(
                "triangles"
            ),
        )
    )
    result = out.localCheckpoint(eager=True)
    oriented.unpersist()
    return result


def shortest_paths(
    edges: DataFrame,
    landmarks: list,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = False,
    max_iterations: int = 20,
) -> DataFrame:
    """Unweighted shortest-path distances from every node to each
    landmark (the GraphX ShortestPaths counterpart): multi-source BFS
    as iterative relaxation — each round one (dist ⋈ edges) hop join
    + one min-aggregation, localCheckpoint'ed like :func:`pagerank`.
    Stops early when a round changes nothing (two driver scalars:
    row count + distance sum). Unreachable (node, landmark) pairs
    emit no row. Cost: diameter × (one edge-keyed shuffle) — the BFS
    floor.
    """
    if not landmarks:
        raise ValueError("landmarks must be non-empty")
    if max_iterations < 1:
        raise ValueError(
            f"max_iterations must be >= 1, got {max_iterations}"
        )
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).filter(F.col("_s") != F.col("_d"))
    if not directed:
        e = e.union(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
    e = e.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    spark = edges.sparkSession
    lm = spark.createDataFrame(
        [(v,) for v in landmarks], [src_col]
    ).select(F.col(src_col).alias("landmark"))
    dist = (
        lm.select(
            F.col("landmark").alias("node"),
            "landmark",
            F.lit(0).cast("long").alias("distance"),
        )
        .localCheckpoint(eager=True)
    )
    prev_sig = (dist.count(), 0)
    for _ in range(max_iterations):
        hops = (
            dist.join(e, dist["node"] == e["_s"])
            .select(
                F.col("_d").alias("node"),
                "landmark",
                (F.col("distance") + 1).alias("distance"),
            )
        )
        dist = (
            dist.union(hops)
            .groupBy("node", "landmark")
            .agg(F.min("distance").alias("distance"))
            .localCheckpoint(eager=True)
        )
        sig = tuple(
            dist.agg(
                F.count("*"), F.coalesce(F.sum("distance"), F.lit(0))
            ).collect()[0]
        )
        if sig == prev_sig:
            break
        prev_sig = sig
    e.unpersist()
    return dist
