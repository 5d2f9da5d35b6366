"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force baseline: broadcast the (small) query
  set, dot products via native ``zip_with``/``aggregate`` HOFs in
  double precision, per-query top-k via a rank window. Exact; cost
  O(|queries|·|corpus|·dim) but fully JVM-side and embarrassingly
  parallel over the corpus — the right baseline up to ~10⁴ queries.
* ``lsh_cosine_topk`` — scale path: random-hyperplane LSH. Vectors are
  bucketed by the sign pattern of ``n_planes`` fixed random projections
  (seeded, deterministic); a query only scores its own bucket (plus
  optional multi-probe neighbors). Sub-linear candidate sets at the
  cost of recall — the standard ANN trade.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..spread import spread_scan


def _dot(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity_expr(a: str | Column, b: str | Column) -> Column:
    """cos(a, b) as a native column expression (double precision).

    NULL for zero vectors (undefined cosine) — try_divide keeps ANSI
    mode from throwing on a zero norm."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def _euclid_expr(a: str | Column, b: str | Column) -> Column:
    """Euclidean distance as a native column expression (double)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _probe_distances(
    df: DataFrame, probe: DataFrame, *, id_col: str, vec_col: str
) -> DataFrame:
    """Directed exact-distance rows (i ∈ probe, j ∈ corpus, d).

    One broadcast |probe|×n pass — linear in corpus size; the wide
    vector rows live only inside the broadcast-join stage, so the only
    rows that can reach an exchange are thin (i, j, d) triples. The
    corpus side is spread to ``defaultParallelism`` first when the
    source scan is under-partitioned (a single ~100 MB parquet file is
    one partition and would serialize the whole compute-bound pass)."""
    pv = df.join(F.broadcast(probe), on=id_col, how="left_semi")
    corpus = spread_scan(
        df.select(F.col(id_col).alias("j"), F.col(vec_col).alias("_eb"))
    )
    return (
        corpus.crossJoin(
            F.broadcast(
                pv.select(F.col(id_col).alias("i"), F.col(vec_col).alias("_ea"))
            )
        )
        .filter(F.col("i") != F.col("j"))
        .select("i", "j", _euclid_expr("_ea", "_eb").alias("d"))
    )


def _knn_neighbor_ids(
    df: DataFrame, probe: DataFrame, *, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Tie-inclusive exact k-NN neighbor ids of a probe set (the LOF
    k-distance neighborhood: everything at distance ≤ kdist, where
    kdist is the k-th smallest distance, ties by id). Linear: one
    ``_probe_distances`` pass + a per-probe rank window over thin
    rows. Returns a single-``id_col`` DataFrame of neighbor ids."""
    d = _probe_distances(df, probe, id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("i").orderBy("d", "j")
    r = d.select(
        "i",
        "j",
        "d",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("i")).alias("_nn"),
    )
    kd = r.filter(F.col("_rn") == F.least(F.lit(k), F.col("_nn"))).select(
        "i", F.col("d").alias("_kd")
    )
    return (
        r.join(kd, "i")
        .filter(F.col("d") <= F.col("_kd"))
        .select(F.col("j").alias(id_col))
        .distinct()
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, vec_id, rank, cosine). Ties broken by vec_id so
    results are deterministic.
    """
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        _norm(vec_col).alias("_qn"),
    )
    # norms attached once per side (corpus row / broadcast query row)
    # instead of re-folding both inside every |corpus|×|queries| cosine:
    # bit-identical values, 1/3 the per-pair fold work (r10)
    joined = corpus.select(
        F.col(id_col), F.col(vec_col), _norm(vec_col).alias("_cn")
    ).crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    sim = F.try_divide(_dot(vec_col, "_qvec"), F.col("_cn") * F.col("_qn"))
    scored = joined.select(
        F.col(query_id_col), F.col(id_col), sim.alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_expr(
    vec_col: str | Column, planes: list[list[float]]
) -> Column:
    """Sign-pattern bucket id from fixed hyperplanes (bigint)."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = None
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec, arr) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        bucket = term if bucket is None else bucket.bitwiseOR(term)
    return bucket


def kmeans_fit(
    corpus: DataFrame,
    *,
    k: int = 16,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Native Lloyd k-means over an embedding column; returns centroids.

    Fully relational per iteration: assignment is a broadcast crossJoin
    against the (tiny) centroid table + ``min_by`` argmin; the update
    step is a posexplode → per-(cluster, dim) mean — both single-shuffle
    and size-independent of the corpus beyond one pass each. Centroids
    (k × dim doubles) live on the driver between iterations.

    Init: the k vectors with the smallest ``xxhash64(seed, id)`` — a
    deterministic pseudo-random sample.
    """
    # spread an under-partitioned scan (assignment is per-row compute)
    # and persist: every Lloyd iteration re-consumes the same narrow
    # (id, vec) frame, and the init sample reads it too
    base = spread_scan(
        corpus.select(F.col(id_col), F.col(vec_col))
    ).persist()
    init = (
        base.orderBy(F.xxhash64(F.lit(seed), F.col(id_col)))
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in init]
    for _ in range(max_iter):
        assigned = assign_clusters(base, centroids, id_col=id_col, vec_col=vec_col)
        new_rows = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col)).alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in new_rows:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        updated = []
        for c in range(len(centroids)):
            dims = by_cluster.get(c)
            if dims:
                updated.append([dims[d] for d in sorted(dims)])
            else:
                updated.append(centroids[c])  # empty cluster keeps its centroid
        if updated == centroids:
            break
        centroids = updated
    base.unpersist()
    return centroids


def _centroid_frame(spark, centroids: list[list[float]]) -> DataFrame:
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster int, centroid array<double>",
    )


def assign_clusters(
    corpus: DataFrame,
    centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_nearest: int = 1,
) -> DataFrame:
    """Nearest-centroid assignment (or top-``n_nearest`` for multi-probe).

    One broadcast crossJoin against k rows + a rank window — no shuffle
    of the corpus itself when n_nearest == 1 (min_by aggregation).
    """
    spark = corpus.sparkSession
    cf = _centroid_frame(spark, centroids)
    dist = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("centroid"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = corpus.crossJoin(F.broadcast(cf)).select(
        F.col(id_col), F.col(vec_col), F.col("cluster"), dist.alias("_d")
    )
    if n_nearest == 1:
        return scored.groupBy(id_col).agg(
            F.min_by("cluster", "_d").alias("cluster"),
            F.first(vec_col).alias(vec_col),
        )
    w = Window.partitionBy(id_col).orderBy(F.col("_d"), F.col("cluster"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_nearest)
        .select(id_col, vec_col, "cluster")
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    include_self: bool = False,
) -> DataFrame:
    """IVF approximate top-k: k-means-partition the corpus, probe the
    query's ``nprobe`` nearest cells.

    Expected candidates ≈ nprobe/n_clusters of the corpus. On clustered
    data this beats hyperplane LSH at equal cost; pass precomputed
    ``centroids`` (and persist the assigned corpus) to amortize the fit
    across query batches — at 100 TB the fit runs once on a sample.
    """
    if centroids is None:
        centroids = kmeans_fit(
            corpus, k=n_clusters, max_iter=max_iter,
            id_col=id_col, vec_col=vec_col, seed=seed,
        )
    assigned = assign_clusters(corpus, centroids, id_col=id_col, vec_col=vec_col)
    q_assigned = assign_clusters(
        queries, centroids, id_col=query_id_col, vec_col=vec_col,
        n_nearest=nprobe,
    ).select(F.col(query_id_col), F.col(vec_col).alias("_qvec"), "cluster")
    joined = assigned.join(F.broadcast(q_assigned), on="cluster")
    if not include_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    sim = cosine_similarity_expr(vec_col, "_qvec")
    scored = joined.select(F.col(query_id_col), F.col(id_col), sim.alias("cosine"))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "cosine")
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
    include_self: bool = False,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket.

    ``n_tables`` independent hash tables (OR-amplification): a candidate
    qualifies if it collides with the query in ANY table — single-table
    sign-LSH recall on weakly-correlated corpora is (1−θ/π)^n_planes,
    so multiple tables are what makes the recall/cost trade tunable.
    Expected candidates ≈ n_tables·|corpus|/2^n_planes. Deterministic
    given the seed. At 100 TB, bucket the corpus ONCE (persist the
    bucket ids) and reuse across query batches.
    """
    if dim is None:
        first = corpus.select(F.size(vec_col).alias("d")).limit(1).collect()
        dim = first[0]["d"] if first else 0
    tables = [
        _hyperplanes(dim, n_planes, seed + 7919 * t) for t in range(n_tables)
    ]
    buckets = lambda vc: F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket_expr(vc, planes).alias("bucket"),
            )
            for t, planes in enumerate(tables)
        ]
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col), F.explode(buckets(vec_col)).alias("_b")
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("_b.table").alias("_table"),
        F.col("_b.bucket").alias("_bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        F.explode(buckets(vec_col)).alias("_b"),
    ).select(
        F.col(query_id_col),
        F.col("_qvec"),
        F.col("_b.table").alias("_table"),
        F.col("_b.bucket").alias("_bucket"),
    )
    joined = (
        c.join(F.broadcast(q), on=["_table", "_bucket"])
        .select(id_col, vec_col, query_id_col, "_qvec")
        .dropDuplicates([id_col, query_id_col])
    )
    if not include_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    sim = cosine_similarity_expr(vec_col, "_qvec")
    scored = joined.select(F.col(query_id_col), F.col(id_col), sim.alias("cosine"))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
    dim: int | None = None,
    probe_ids: DataFrame | None = None,
) -> DataFrame:
    """§2.10 embedding-cosine near-duplicate pairs.

    ``probe_ids`` (optional, single-column DataFrame of ids) restricts
    the output to pairs where at least one endpoint is in the probe
    set, and — critically — restricts the CANDIDATE GENERATION itself
    (probe cells × all cells for LSH, probe vectors × all for exact),
    so a fixed-size probe set makes either method linear in corpus
    size. This is the sampled-baseline path used by the recall-gate
    contracts: exact-vs-probes is the ground truth, lsh-vs-probes is
    the measured side, and the measured recall on probe pairs is an
    unbiased estimate of overall recall at any scale factor.

    Output: (left_id, right_id, cosine) with left_id < right_id and
    cosine ≥ threshold — the embedding-space sibling of the MinHash /
    SimHash text near-dup operators (same pair contract, so
    ``duplicate_clusters`` consumes either).

    ``method="exact"``: all-pairs comparison — O(n²), the
    verifier/oracle path (DuckDB mirror: ``list_cosine_similarity``).
    Only for fixtures and for verifying the blocked path on samples.

    ``method="lsh"``: the 100-TB path. Hyperplane sign-buckets over
    ``n_tables`` OR-amplified tables block the corpus; candidate pairs
    come only from shared (table, bucket) cells — expected
    n_tables·Σ_b |b|²/2, sub-quadratic for spread buckets — then exact
    cosine verifies every candidate, so precision is 1.0 by
    construction and only recall is approximate (measured by the
    ``embedding_near_dups_lsh`` contract query, not assumed). Near-dup
    pairs have small angle θ, so P[one table misses] =
    (1−(1−θ/π)^n_planes)^n_tables drops geometrically in n_tables.
    Pair dedup happens on (left, right) ids BEFORE vectors are
    re-attached (two id-keyed shuffle joins), keeping the wide rows off
    the distinct.
    """
    probe = None
    if probe_ids is not None:
        pcol = probe_ids.columns[0]
        probe = probe_ids.select(F.col(pcol).alias(id_col)).distinct()
    cos_floor = F.lit(float(threshold))
    if method == "exact":
        if probe is not None:
            # probe vectors × all vectors: one broadcast of the fixed-size
            # probe side, one linear scan of the corpus — no self-join.
            # Cosine + the threshold filter run INSIDE the broadcast-join
            # stage, so the only rows that ever reach an exchange are the
            # few survivors. (The earlier form pair-deduped the full
            # |probe|×n stream WITH both vectors attached — a wide
            # shuffle that grows |probe|·n·vec_bytes: ~110 GB at the
            # sf10 gate run, measured as a disk-full abort. cosine(x, y)
            # is bit-identical in either orientation — per-dim products
            # commute, the reduction order is the dim order — so
            # dedup-after-score keeps the exact same pair set.)
            pv = df.join(F.broadcast(probe), on=id_col, how="left_semi")
            # The |probe|×n cosine pass is compute-bound and pipelined
            # (no shuffle above it), so its parallelism is the SOURCE
            # scan's — and a single ~100 MB parquet file is one
            # partition, serializing the whole pass (measured at the
            # sf10 gate: two-task stages pegged for 15+ min). Spread a
            # low-partition corpus first; the exchange moves only
            # (id, vector) rows, linear and tiny next to the scan work.
            corpus = spread_scan(
                df.select(
                    F.col(id_col).alias("_oid"), F.col(vec_col).alias("_ov")
                )
            )
            raw = (
                # per-side norms once instead of two folds per pair:
                # bit-identical cosine, 1/3 the fold work (r10)
                corpus.withColumn("_on", _norm("_ov")).crossJoin(
                    F.broadcast(
                        pv.select(
                            F.col(id_col).alias("_pid"),
                            F.col(vec_col).alias("_pv"),
                            _norm(vec_col).alias("_pn"),
                        )
                    )
                )
                .filter(F.col("_pid") != F.col("_oid"))
            )
            scored = raw.select(
                F.least("_pid", "_oid").alias("left_id"),
                F.greatest("_pid", "_oid").alias("right_id"),
                F.try_divide(
                    _dot("_pv", "_ov"), F.col("_pn") * F.col("_on")
                ).alias("cosine"),
            ).filter(F.col("cosine") >= cos_floor)
            return scored.dropDuplicates(["left_id", "right_id"])
        else:
            left = df.select(
                F.col(id_col).alias("left_id"),
                F.col(vec_col).alias("_lv"),
                _norm(vec_col).alias("_ln"),
            )
            right = df.select(
                F.col(id_col).alias("right_id"),
                F.col(vec_col).alias("_rv"),
                _norm(vec_col).alias("_rn"),
            )
            pairs = left.join(right, on=F.col("left_id") < F.col("right_id"))
    elif method == "lsh":
        if dim is None:
            first = df.select(F.size(vec_col).alias("d")).limit(1).collect()
            dim = first[0]["d"] if first else 0
        tables = [
            _hyperplanes(dim, n_planes, seed + 7919 * t)
            for t in range(n_tables)
        ]
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    lsh_bucket_expr(vec_col, planes).alias("bucket"),
                )
                for t, planes in enumerate(tables)
            ]
        )
        cells = df.select(
            F.col(id_col), F.explode(buckets).alias("_b")
        ).select(
            F.col(id_col),
            F.col("_b.table").alias("_table"),
            F.col("_b.bucket").alias("_bucket"),
        )
        if probe is not None:
            # Packed-signature probe path (r9, VERDICT r8 item 4). The
            # r8 form joined probe cells × all cells per table and
            # deduped the exploded candidate stream: |probe|·T·E[cell]
            # thin rows through a distinct shuffle — ~300M rows at the
            # sf10 gate (shallow 2-plane buckets barely prune at the
            # gate's weak θ≈69° threshold), 1162.7 s measured wall.
            # With a FIXED probe set the per-table bucket ids pack into
            # one T-length array per vector, so "shares any bucket" is
            # a zip_with/exists over two tiny arrays evaluated INSIDE
            # the broadcast-nested-loop stage — the same |probe|×n scan
            # shape as the exact path, zero candidate shuffle, and a
            # provably IDENTICAL pair set (candidate ⇔ ∃ table with
            # equal bucket ⇔ signature arrays match at some index;
            # cosine-verify unchanged, so soundness/recall are
            # untouched). The full-corpus branch below keeps the bucket
            # self-join: with deep buckets at real near-dup thresholds
            # it is sub-quadratic, which no broadcast variant is.
            pv = df.join(F.broadcast(probe), on=id_col, how="left_semi")
            corpus = spread_scan(
                df.select(
                    F.col(id_col).alias("_oid"), F.col(vec_col).alias("_ov")
                )
            )
            # signature computed AFTER the spread: the exchange carries
            # only (id, vector); the T·n_planes dot products run in the
            # already-parallel scan stage.
            corpus = corpus.withColumn(
                "_osig",
                F.array(*[lsh_bucket_expr("_ov", planes) for planes in tables]),
            )
            psig = F.array(
                *[lsh_bucket_expr("_pv", planes) for planes in tables]
            )
            collide = F.exists(
                F.zip_with("_psig", "_osig", lambda a, b: a == b),
                lambda x: x,
            )
            scored = (
                corpus.withColumn("_on", _norm("_ov")).crossJoin(
                    F.broadcast(
                        pv.select(
                            F.col(id_col).alias("_pid"),
                            F.col(vec_col).alias("_pv"),
                            _norm(vec_col).alias("_pn"),
                        ).withColumn("_psig", psig)
                    )
                )
                .filter(F.col("_pid") != F.col("_oid"))
                .filter(collide)
                .select(
                    F.least("_pid", "_oid").alias("left_id"),
                    F.greatest("_pid", "_oid").alias("right_id"),
                    F.try_divide(
                        _dot("_pv", "_ov"), F.col("_pn") * F.col("_on")
                    ).alias("cosine"),
                )
                .filter(F.col("cosine") >= cos_floor)
            )
            return scored.dropDuplicates(["left_id", "right_id"])
        else:
            cand = (
                cells.select(
                    F.col(id_col).alias("left_id"), "_table", "_bucket"
                )
                .join(
                    cells.select(
                        F.col(id_col).alias("right_id"), "_table", "_bucket"
                    ),
                    on=["_table", "_bucket"],
                )
                .filter(F.col("left_id") < F.col("right_id"))
                .select("left_id", "right_id")
                .distinct()
            )
        pairs = cand.join(
            df.select(
                F.col(id_col).alias("left_id"),
                F.col(vec_col).alias("_lv"),
                _norm(vec_col).alias("_ln"),
            ),
            on="left_id",
        ).join(
            df.select(
                F.col(id_col).alias("right_id"),
                F.col(vec_col).alias("_rv"),
                _norm(vec_col).alias("_rn"),
            ),
            on="right_id",
        )
    else:
        raise ValueError(f"unknown method: {method!r}")
    cos = F.try_divide(_dot("_lv", "_rv"), F.col("_ln") * F.col("_rn"))
    return (
        pairs.select("left_id", "right_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )


def semantic_dedup(
    df: DataFrame,
    *,
    threshold: float = 0.9,
    n_clusters: int = 16,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    keep: str = "min_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication via k-means blocking.

    Cluster the embedding space (native Lloyd :func:`kmeans_fit`),
    compare pairs only WITHIN a cluster, and for every pair with
    cosine ≥ ``threshold`` keep one member. Output: one row per input
    vector — ``(id_col, cluster, keep, keeper_id, keeper_cos)`` where
    dropped rows carry the id of the retained near-duplicate that
    justified the drop (and their cosine); kept rows have NULL keeper.

    Drop rule (one relational pass, no per-cluster iteration): a
    vector is dropped iff an above-threshold neighbor of higher
    priority exists — whether or not that neighbor itself survives.
    Two invariants follow (both gated by the contract query):
    (1) no two KEPT vectors in the same cluster are ≥ threshold
    similar, and (2) every dropped vector has an exact-cosine-verified
    ≥ threshold witness. Along similarity chains (a~b~c, a≁c) this is
    more aggressive than the paper's sequential greedy (which would
    re-keep c); at real near-dup thresholds chains are short and the
    one-pass rule is the scalable standard.

    ``keep="min_id"``: priority = smaller id (deterministic,
    join-order independent). ``keep="far_from_centroid"`` is the
    paper's diversity rule: the pair member FARTHER from its centroid
    has priority (ties → smaller id) — keeps the less-typical
    exemplar of each near-dup group.

    Scale design: the all-pairs comparison is confined to k-means
    cells — expected cost Σ|cell|²/2 ≈ n²/(2k), so ``n_clusters``
    scales with corpus size (the paper uses ~0.1·√n clusters; at
    100 TB the fit runs on a sample and ``centroids`` is passed in).
    The pair join shuffles (id, cluster, vector) once on the cluster
    key; the drop-decision join shuffles ids only. Like the LSH/IVF
    paths, blocking bounds recall, never precision: every emitted
    keeper relation is exact-cosine verified.

    The assignment subplan feeds three branches (both pair-join legs
    and the final keep/drop join); Spark's ReuseExchange dedupes the
    identical subtrees at runtime, but for a huge corpus pass a
    PERSISTED (or checkpointed) ``df`` so the scan itself runs once —
    the same discipline as reusing IVF assignments across batches.
    """
    if keep not in ("min_id", "far_from_centroid"):
        raise ValueError(f"unsupported keep rule: {keep!r}")
    if centroids is None:
        centroids = kmeans_fit(
            df, k=n_clusters, max_iter=max_iter,
            id_col=id_col, vec_col=vec_col, seed=seed,
        )
    assigned = assign_clusters(df, centroids, id_col=id_col, vec_col=vec_col)
    if keep == "far_from_centroid":
        cf = _centroid_frame(df.sparkSession, centroids)
        d2 = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.col("centroid"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        assigned = (
            assigned.join(F.broadcast(cf), on="cluster")
            .withColumn("_d2", d2)
            .drop("centroid")
        )
    # Pair scoring is the operator's whale (Σ|cell|² cosine rows). The
    # norm folds are 2/3 of the per-pair flops and depend on ONE side
    # each, so attach them once per vector on the join legs and divide
    # by the product: cos = dot/(‖l‖·‖r‖) evaluates the exact same
    # subexpressions over the same data — bit-identical to
    # cosine_similarity_expr, measured 2.2× on the sf1 pair stage
    # (r10, guide §1.2 step 2).
    left = assigned.select(
        F.col(id_col).alias("left_id"),
        F.col("cluster"),
        F.col(vec_col).alias("_lv"),
        _norm(vec_col).alias("_ln"),
        *([F.col("_d2").alias("left_d2")] if keep == "far_from_centroid" else []),
    )
    right = assigned.select(
        F.col(id_col).alias("right_id"),
        F.col("cluster"),
        F.col(vec_col).alias("_rv"),
        _norm(vec_col).alias("_rn"),
        *([F.col("_d2").alias("right_d2")] if keep == "far_from_centroid" else []),
    )
    pairs = (
        left.join(right, on="cluster")
        .filter(F.col("left_id") < F.col("right_id"))
        .withColumn(
            "cos",
            F.try_divide(_dot("_lv", "_rv"), F.col("_ln") * F.col("_rn")),
        )
        .filter(F.col("cos") >= F.lit(float(threshold)))
    )
    if keep == "min_id":
        # loser = larger id; winner (keeper candidate) = smaller id
        losers = pairs.select(
            F.col("right_id").alias(id_col),
            F.col("left_id").alias("_winner"),
            F.col("cos"),
        )
    else:
        is_left_winner = (
            (F.col("left_d2") > F.col("right_d2"))
            | ((F.col("left_d2") == F.col("right_d2"))
               & (F.col("left_id") < F.col("right_id")))
        )
        losers = pairs.select(
            F.when(is_left_winner, F.col("right_id"))
            .otherwise(F.col("left_id"))
            .alias(id_col),
            F.when(is_left_winner, F.col("left_id"))
            .otherwise(F.col("right_id"))
            .alias("_winner"),
            F.col("cos"),
        )
    # one drop decision per vector: the strongest justifying neighbor
    # (max cosine; ties → smaller winner id) — ids + scalars only
    drops = losers.groupBy(id_col).agg(
        F.max_by(
            F.struct(F.col("cos"), F.col("_winner")),
            F.struct(F.col("cos"), (-F.col("_winner")).alias("_w")),
        ).alias("_best")
    ).select(
        F.col(id_col),
        F.col("_best._winner").alias("keeper_id"),
        F.col("_best.cos").alias("keeper_cos"),
    )
    out = assigned.select(F.col(id_col), F.col("cluster")).join(
        drops, on=id_col, how="left"
    )
    return out.select(
        F.col(id_col),
        F.col("cluster"),
        F.col("keeper_id").isNull().alias("keep"),
        "keeper_id",
        "keeper_cos",
    )


def embedding_group_outliers(
    df: DataFrame,
    *,
    k: int = 5,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding outliers: the k vectors farthest (lowest
    cosine) from their group's spherical centroid.

    The corpus-quality screen for embedded data: mislabeled, off-topic
    or junk documents sit far from their source/cluster centroid. The
    centroid is the mean of the L2-normalized vectors (direction-only,
    so document scale doesn't bias it — the standard spherical mean).

    Output: (id, group, centroid_cos, outlier_rank) with rank 1 = most
    outlying; ties broken by id. Zero vectors rank first (NULL cosine).

    Scale shape: ONE aggregation of (group, dim-position) partial sums
    builds every centroid (mergeable map-side, ≤ |groups|·dim rows
    shuffled); centroids broadcast back; scoring is a JVM zip_with
    fold on the scan; the rank compiles to pre-shuffle WindowGroupLimit
    top-k, so the final exchange carries at most k rows per group per
    partition. Embedding payloads shuffle nowhere.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    # materialize the norm ONCE per row: dividing by _norm(vec) inside
    # the transform lambda would re-evaluate the O(dim) fold per
    # element (O(dim^2) per vector)
    normed = (
        df.withColumn("_nrm", _norm(vec_col))
        .select(
            F.col(id_col),
            F.col(group_col),
            F.transform(
                F.col(vec_col),
                lambda x: F.try_divide(x.cast("double"), F.col("_nrm")),
            ).alias("_nv"),
        )
    )
    cent = (
        normed.select(group_col, F.posexplode("_nv").alias("_pos", "_val"))
        .groupBy(group_col, "_pos")
        .agg(F.avg("_val").alias("_v"))
        .groupBy(group_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_v"))),
                lambda s: s["_v"],
            ).alias("_cent")
        )
    )
    scored = normed.join(F.broadcast(cent), on=group_col).select(
        id_col,
        group_col,
        cosine_similarity_expr("_nv", "_cent").alias("centroid_cos"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("centroid_cos").asc_nulls_first(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("outlier_rank", F.row_number().over(w))
        .filter(F.col("outlier_rank") <= k)
        .select(id_col, group_col, "centroid_cos", "outlier_rank")
    )


def pool_embeddings(
    df: DataFrame,
    *,
    group_col: str = "doc_id",
    vec_col: str = "embedding",
    mode: str = "mean",
    normalize: bool = False,
    out_col: str = "pooled",
) -> DataFrame:
    """Pool many vectors into one per group — mean or element-wise max
    — the chunk→document aggregation step after embedding chunked text
    (``chunk_documents`` upstream): embed chunks, pool back to one
    vector per document for indexing.

    Output: (group, ``out_col`` array<double>[, ``n_vectors``]).
    ``normalize=True`` L2-normalizes the pooled vector (cosine-ready).

    Scale shape: posexplode → ONE (group, dim-position) partial+final
    aggregation (mergeable map-side, the same shape that builds the
    outlier centroids) → rebuild the array with a sorted
    collect_list. Shuffle volume is groups × dim scalars, never whole
    vectors.
    """
    if mode not in ("mean", "max"):
        raise ValueError(f"mode must be 'mean' or 'max': {mode!r}")
    agg_fn = F.avg if mode == "mean" else F.max
    pe = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("_pos", "_val"),
    ).withColumn("_val", F.col("_val").cast("double"))
    per_pos = pe.groupBy(group_col, "_pos").agg(agg_fn("_val").alias("_v"))
    # n_vectors counts INPUT vectors per group (ragged/null-element
    # vectors included) — not a per-position coverage count
    n_vec = df.groupBy(group_col).agg(F.count(vec_col).alias("n_vectors"))
    pooled = per_pos.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_v"))), lambda s: s["_v"]
        ).alias(out_col),
    ).join(n_vec, on=group_col)
    if normalize:
        # same one-norm-per-row materialization as the outlier path
        pooled = (
            pooled.withColumn("_nrm", _norm(out_col))
            .withColumn(
                out_col,
                F.transform(
                    F.col(out_col), lambda x: F.try_divide(x, F.col("_nrm"))
                ),
            )
            .drop("_nrm")
        )
    return pooled


def jl_weights(
    dim: int, out_dim: int, *, salt: str = "rp"
) -> list[list[int]]:
    """Achlioptas (2003) sparse random-projection weights, engine-portable.

    ``w[j][i] ∈ {+1, −1, 0}`` with probabilities {1/6, 1/6, 2/3},
    drawn from ``md5(f"{salt}:{j}:{i}") % 6`` — the same derivation an
    ANSI-SQL mirror can compute (``('0x' || substr(md5(...), 1, 8))
    % 6``), so the matrix is identical on any engine with no RNG
    state and no transcendental math (the reason this beats Gaussian
    JL for cross-engine reproducibility; the JL distance guarantee is
    the paper's Theorem 1.1). Scaling by sqrt(3/out_dim) happens in
    the projection, not here, so weights stay exact integers.
    """
    import hashlib

    return [
        [
            [1, -1, 0, 0, 0, 0][
                int(
                    hashlib.md5(f"{salt}:{j}:{i}".encode()).hexdigest()[:8],
                    16,
                )
                % 6
            ]
            for i in range(dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    out_col: str = "projected",
    dim: int,
    out_dim: int = 16,
    salt: str = "rp",
) -> DataFrame:
    """Johnson-Lindenstrauss dimension reduction, fully native.

    Projects ``vec_col`` (length ``dim``) onto ``out_dim`` sparse
    ±1 hyperplanes (`jl_weights`) scaled by sqrt(3/out_dim) — the
    Achlioptas database-friendly JL transform. Compiles to a
    ``transform`` over a literal weight matrix with ``zip_with``
    dot products: zero shuffles, zero Python, and 2/3 of the
    multiplies are against literal zeros Catalyst folds away.

    At 100 TB this is the pre-step that makes downstream ANN cheap:
    a 64→16 projection cuts every cosine-topk / IVF / LSH pass by
    4× in both bytes shuffled and flops, at the JL-bounded distance
    distortion. Use a larger ``out_dim`` when feeding near-dup
    thresholds (distortion compounds with tight cosine cuts).
    """
    if out_dim <= 0 or dim <= 0:
        raise ValueError(f"dim/out_dim must be positive, got {dim}/{out_dim}")
    w = jl_weights(dim, out_dim, salt=salt)
    scale = math.sqrt(3.0 / out_dim)
    rows = []
    vec = F.col(vec_col)
    for j in range(out_dim):
        arr = F.array(*[F.lit(float(x)) for x in w[j]])
        rows.append(_dot(vec, arr) * F.lit(scale))
    return df.withColumn(out_col, F.array(*rows))


def dbscan(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    min_pts: int = 4,
    method: str = "exact",
    **blocker_kwargs,
) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. 1996) over an
    embedding column, expressed entirely as joins over the near-dup
    pair machinery.

    Neighborhoods are cosine balls: q ∈ N(p) iff cos(p, q) ≥
    ``threshold``. A point is CORE when its neighborhood (self
    included) holds ≥ ``min_pts`` points; clusters are the connected
    components of the core-core adjacency (the log-round star
    clusterer — cluster id = min core id); non-core points adjacent
    to a core become BORDER points assigned to the MINIMUM adjacent
    core's cluster (classic DBSCAN leaves border assignment
    order-dependent; the min rule makes it deterministic — documented
    divergence); everything else is NOISE (NULL cluster).

    ``method`` selects the pair blocker (``exact`` = O(n²) verifier
    path, ``lsh`` = hyperplane-bucketed 100-TB path — same contract
    as ``embedding_near_dup_pairs``; with LSH the recall loss can
    only MERGE-miss or downgrade core status, never invent pairs).
    Output: (id, role ∈ {core, border, noise}, cluster).
    """
    from temporal_retriever_spark.llm.dedup import duplicate_clusters

    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    pairs = embedding_near_dup_pairs(
        df,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        method=method,
        **blocker_kwargs,
    ).select("left_id", "right_id")
    sym = pairs.union(
        pairs.select(
            F.col("right_id").alias("left_id"),
            F.col("left_id").alias("right_id"),
        )
    )
    ids = df.select(id_col).distinct()
    deg = sym.groupBy(F.col("left_id").alias(id_col)).agg(
        F.count("*").alias("_deg")
    )
    cores = (
        ids.join(deg, on=id_col, how="left")
        .filter(F.coalesce(F.col("_deg"), F.lit(0)) + 1 >= min_pts)
        .select(id_col)
    )
    core_edges = (
        sym.join(cores.withColumnRenamed(id_col, "left_id"), "left_id")
        .join(cores.withColumnRenamed(id_col, "right_id"), "right_id")
        .filter(F.col("left_id") < F.col("right_id"))
    )
    cc = duplicate_clusters(
        core_edges, left_col="left_id", right_col="right_id", method="star"
    )
    core_lab = (
        cores.join(cc, cores[id_col] == cc["doc_id"], "left")
        .select(
            cores[id_col],
            F.coalesce(cc["cluster_id"], cores[id_col]).alias("_ccl"),
        )
    )
    border_lab = (
        sym.join(cores.withColumnRenamed(id_col, "right_id"), "right_id")
        .join(cores.withColumnRenamed(id_col, "left_id"), "left_id", "left_anti")
        .join(
            core_lab.select(
                F.col(id_col).alias("right_id"), F.col("_ccl")
            ),
            "right_id",
        )
        .groupBy(F.col("left_id").alias(id_col))
        .agg(F.min("_ccl").alias("_bcl"))
    )
    return (
        ids.join(core_lab, on=id_col, how="left")
        .join(border_lab, on=id_col, how="left")
        .select(
            id_col,
            F.when(F.col("_ccl").isNotNull(), F.lit("core"))
            .when(F.col("_bcl").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("_ccl", "_bcl").alias("cluster"),
        )
    )


def pca_power(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """First principal component by power iteration — the exact-PCA
    companion to the JL random projection (score outliers, sort a
    corpus along its dominant axis, 1-D visualize).

    ONE aggregation collects the d means and d(d+1)/2 second moments
    (driver state is the d×d covariance — centroid-sized, the same
    O(small) argument as k-means); the power iteration then runs on
    the driver in plain floats (deterministic all-ones init, no RNG —
    the sign is pinned by the arithmetic itself, which the oracle
    replays verbatim), and scoring is a d-term codegen'd projection
    ``(x − μ)·v`` per row. Also reports the explained-variance ratio
    ``v'Cv / tr(C)``. No eigensolver dependency anywhere.
    """
    import math as _math

    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).limit(1).collect()
        if not first:
            raise ValueError("cannot fit on an empty frame")
        dim = first[0]["d"]
    # Moments via a vectorized Arrow pass: the relational form (one agg
    # with 1 + d + d(d+1)/2 SUM columns — 2,145 at d=64) spends ~18 s in
    # Catalyst planning/codegen alone at any data size (measured r9).
    # Each task reduces its batches to (n, Σx, XᵀX) with BLAS; the
    # per-partition partials (a handful of rows) are summed on the
    # driver. Same moments, same downstream arithmetic; only the
    # float-summation grouping changes (as any partial aggregation
    # already does).
    import numpy as np
    import pandas as pd

    d = dim

    def _partials(batches):
        n_loc = 0
        s_loc = np.zeros(d)
        q_loc = np.zeros((d, d))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf[vec_col].to_list(), dtype=np.float64)
            # mirror the old SQL-SUM semantics the numpy rewrite replaced
            # (ADVICE r9): element_at past a short vector was NULL and
            # SUM skipped it — here a ragged batch materializes as object
            # dtype (crash on @) and a short dim= would crash on shape,
            # so pad/slice to d explicitly and fail loud on short rows.
            if X.ndim != 2 or X.shape[1] < d:
                raise ValueError(
                    f"pca_power: expected vectors of >= {d} floats, got "
                    f"shape {X.shape} (ragged or short {vec_col} rows)"
                )
            X = X[:, :d]
            n_loc += X.shape[0]
            s_loc += X.sum(axis=0)
            q_loc += X.T @ X
        yield pd.DataFrame(
            {
                "n": [float(n_loc)],
                "s": [s_loc.tolist()],
                "q": [q_loc[np.triu_indices(d)].tolist()],
            }
        )

    parts = (
        # NULL vectors would become NaN rows in np.array and poison every
        # moment (the old SQL SUM skipped nulls) — drop them before the
        # Arrow pass (ADVICE r9)
        spread_scan(df.filter(F.col(vec_col).isNotNull()).select(vec_col))
        .mapInPandas(_partials, "n double, s array<double>, q array<double>")
        .collect()
    )
    n = sum(r["n"] for r in parts)
    if not n:
        raise ValueError("cannot fit on an empty frame")
    s_tot = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    q_tot = np.sum([np.asarray(r["q"]) for r in parts], axis=0)
    x = [
        F.element_at(F.col(vec_col), i + 1).cast("double")
        for i in range(dim)
    ]
    mu = [s_tot[i] / n for i in range(dim)]
    C = [[0.0] * dim for _ in range(dim)]
    iu = list(zip(*np.triu_indices(d)))
    for (i, j), qij in zip(iu, q_tot):
        cij = qij / n - mu[i] * mu[j]
        C[i][j] = C[j][i] = cij
    v = [1.0 / _math.sqrt(dim)] * dim
    for _ in range(iterations):
        u = [0.0] * dim
        for i in range(dim):
            acc = 0.0
            for j in range(dim):
                acc = acc + C[i][j] * v[j]
            u[i] = acc
        norm = _math.sqrt(sum(t * t for t in u)) or 1.0
        v = [t / norm for t in u]
    w = []
    for i in range(dim):
        acc = 0.0
        for j in range(dim):
            acc = acc + C[i][j] * v[j]
        w.append(acc)
    vcv = sum(v[i] * w[i] for i in range(dim))
    tr = sum(C[i][i] for i in range(dim))
    evr = vcv / tr if tr else 0.0
    score = F.lit(0.0)
    for i in range(dim):
        score = score + (x[i] - F.lit(mu[i])) * F.lit(v[i])
    return df.select(
        F.col(id_col),
        score.alias("pc1"),
        F.lit(evr).alias("explained_variance_ratio"),
    )


def hard_negatives(
    positives: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    anchor_col: str = "anchor_id",
    positive_col: str = "positive_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive training pairs: for every
    anchor, the top-k most-similar corpus vectors that are NOT the
    anchor itself and NOT any of its labeled positives — the
    "similar but wrong" examples that make embedding models actually
    learn (random negatives are trivially separable; the standard
    recipe behind DPR/SimCSE-style training sets).

    Plan: `cosine_topk` over-fetches k + max-positives candidates per
    anchor (broadcast queries, pre-shuffle WindowGroupLimit), the
    positive pairs anti-join out, and a rank window re-cuts to k —
    no Python, and the corpus shuffles once regardless of anchor
    count. Output: (anchor, negative_id, hn_rank, cosine).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    pos = positives.select(
        F.col(anchor_col).alias("_a"), F.col(positive_col).alias("_p")
    ).distinct()
    max_pos = pos.groupBy("_a").count().agg(F.max("count")).collect()[0][0]
    if max_pos is None:
        raise ValueError("positives is empty")
    # anchor vectors are anchor-count-sized; materialize so the
    # cosine_topk broadcast side doesn't re-run the corpus join
    anchors = pos.select(F.col("_a").alias("query_id")).distinct().join(
        corpus.select(F.col(id_col).alias("query_id"), vec_col),
        on="query_id",
    ).localCheckpoint(eager=True)
    cand = cosine_topk(corpus, anchors, k=int(k) + int(max_pos),
                       id_col=id_col, vec_col=vec_col)
    filtered = cand.join(
        pos,
        (cand["query_id"] == pos["_a"]) & (cand[id_col] == pos["_p"]),
        how="left_anti",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        filtered.withColumn("hn_rank", F.row_number().over(w))
        .filter(F.col("hn_rank") <= int(k))
        .select(
            F.col("query_id").alias(anchor_col),
            F.col(id_col).alias("negative_id"),
            "hn_rank",
            "cosine",
        )
    )


def lof(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    candidates: DataFrame | None = None,
    probe_ids: DataFrame | None = None,
) -> DataFrame:
    """Local Outlier Factor (Breunig et al. 2000) over an embedding
    column — density-RELATIVE outlier scores: LOF ≈ 1 for points whose
    local density matches their neighbors', ≫ 1 for points alone in a
    sparse pocket next to a dense region — the regime where a global
    distance/centroid rule (``embedding_group_outliers``) misfires.

    Definitions follow the paper with deterministic choices: Euclidean
    distances; the k-distance neighborhood INCLUDES distance ties;
    points with fewer than k others use their farthest neighbor;
    neighbor rank ties break by id. reach-dist(p←o) = max(kdist(o),
    d(p,o)); lrd = |N|/Σreach (NULL when Σreach = 0, i.e. ≥k exact
    duplicates — the paper's ∞ case, surfaced as NULL not hidden);
    LOF = mean(lrd of neighbors)/lrd. The infinite-lrd case is
    handled explicitly, not dropped: a point whose own lrd is NULL
    sits in a mutual-duplicate cluster (kdist = 0, so its neighbors
    are exactly its duplicates) and gets lof = 1.0 — the paper's
    ∞/∞ convention; a finite-lrd point with any infinite-lrd
    neighbor gets lof = +Infinity (its neighborhood contains an
    infinitely denser pocket). ``n_nb`` counts ALL neighbors,
    including infinite-lrd ones.

    Scale: the default pair source is the exact self-join — O(n²),
    correct for ≤10⁴ vectors per run. At corpus scale pass
    ``candidates`` (an (id_a, id_b) frame from the IVF/LSH bucket
    machinery, e.g. ``ivf_cosine_topk``'s cell pairs or
    ``embedding_near_dup_pairs(method='lsh')``): every downstream
    stage is neighbor-bounded (n·k rows), and the rank window is
    per-point. Output: ``(id, kdist, lrd, lof, n_nb)``.

    ``probe_ids`` (single-column DataFrame): EXACT LOF for just the
    probe set, linear in corpus size at any SF. LOF(p) depends on a
    3-hop k-NN cone — lrd(p) needs kdist of p's neighbors, lof(p)
    needs lrd of p's neighbors, hence kdist of their neighbors — and
    k-NN neighborhoods are k-bounded (they do NOT grow with corpus
    size, unlike ε-ball neighborhoods), so expanding probes → N(P) →
    N(N(P)) gives a fixed-size probe cone |P|·O(k²) whose distance
    passes are each |cone|×n broadcast scans. The returned kdist /
    lrd / lof values for probe ids are bit-identical to the full
    O(n²) run (pinned by tests/test_llm_similarity.py). Mutually
    exclusive with ``candidates``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if probe_ids is not None and candidates is not None:
        raise ValueError("probe_ids and candidates are mutually exclusive")
    probe = None
    if probe_ids is not None:
        pcol = probe_ids.columns[0]
        probe = probe_ids.select(F.col(pcol).alias(id_col)).distinct()
        hop1 = probe.unionByName(
            _knn_neighbor_ids(df, probe, id_col=id_col, vec_col=vec_col, k=k)
        ).distinct()
        cone = hop1.unionByName(
            _knn_neighbor_ids(df, hop1, id_col=id_col, vec_col=vec_col, k=k)
        ).distinct()
        d = _probe_distances(df, cone, id_col=id_col, vec_col=vec_col)
    else:
        a = df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("_ea"))
        b = df.select(F.col(id_col).alias("j"), F.col(vec_col).alias("_eb"))
        if candidates is None:
            pairs = a.crossJoin(b).filter(F.col("i") != F.col("j"))
        else:
            sym = candidates.select(
                F.col(candidates.columns[0]).alias("i"),
                F.col(candidates.columns[1]).alias("j"),
            )
            sym = sym.union(
                sym.select(F.col("j").alias("i"), F.col("i").alias("j"))
            ).filter(F.col("i") != F.col("j")).distinct()
            pairs = sym.join(a, "i").join(b, "j")
        d = pairs.select("i", "j", _euclid_expr("_ea", "_eb").alias("d"))
    w = Window.partitionBy("i").orderBy("d", "j")
    r = d.select(
        "i",
        "j",
        "d",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("i")).alias("_nn"),
    )
    kd = r.filter(
        F.col("_rn") == F.least(F.lit(k), F.col("_nn"))
    ).select("i", F.col("d").alias("kdist"))
    nb = r.join(kd, "i").filter(F.col("d") <= F.col("kdist"))
    rd = (
        nb.select("i", "j", "d")
        .join(
            kd.select(F.col("i").alias("j"), F.col("kdist").alias("_kdj")),
            "j",
        )
        .select("i", "j", F.greatest(F.col("_kdj"), F.col("d")).alias("_reach"))
    )
    lrd = (
        rd.groupBy("i")
        .agg(F.count(F.lit(1)).alias("_cnt"), F.sum("_reach").alias("_sr"))
        .filter(F.col("_sr") > 0)
        .select("i", (F.col("_cnt") / F.col("_sr")).alias("lrd"))
    )
    lof_df = (
        nb.select("i", "j")
        .join(
            lrd.select(F.col("i").alias("j"), F.col("lrd").alias("_lj")),
            "j",
            "left",
        )
        .join(lrd, "i", "left")
        .groupBy("i", "lrd")
        .agg(
            F.avg("_lj").alias("_mlj"),
            F.sum(
                F.when(F.col("_lj").isNull(), 1).otherwise(0)
            ).alias("_ninf"),
            F.count(F.lit(1)).cast("long").alias("n_nb"),
        )
        .select(
            "i",
            F.when(F.col("lrd").isNull(), F.lit(1.0))
            .when(F.col("_ninf") > 0, F.lit(float("inf")))
            .otherwise(F.col("_mlj") / F.col("lrd"))
            .alias("lof"),
            "n_nb",
        )
    )
    out = (
        kd.join(lrd, "i", "left")
        .join(lof_df.select("i", "lof", "n_nb"), "i", "left")
        .select(
            F.col("i").alias(id_col),
            "kdist",
            "lrd",
            "lof",
            "n_nb",
        )
    )
    if probe is not None:
        # kdist is exact for the whole cone, lrd for probes∪N(P), lof
        # only for probes — emit only the rows whose full chain is exact.
        out = out.join(F.broadcast(probe), on=id_col, how="left_semi")
    return out
