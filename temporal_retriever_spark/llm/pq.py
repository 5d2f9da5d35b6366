"""Product quantization (PQ) for embedding compression + ANN search.

The 100-TB embedding story: a 64-dim float corpus is 256 bytes/vector;
PQ with m=8 subquantizers and 256 codes is 8 bytes/vector — a 32×
shrink that turns a 100 TB embedding store into ~3 TB of codes that
fit in cluster memory, scanned with table lookups instead of float
dot products. Method is Jégou/Douze/Schmid, "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011) — public literature.

Spark-first shape:

* ``pq_train`` — ONE Lloyd job per iteration trains ALL ``m``
  codebooks jointly: vectors explode into (sub, subvector) rows once,
  assignment is a broadcast join against the (m·n_codes)-row codebook
  + ``min_by`` argmin, the update is a single groupBy((sub, code,
  pos)) mean. Driver state is the codebook only (m·n_codes·dim/m
  doubles), exactly like ``kmeans_fit``'s centroid list.
* ``pq_encode`` — nearest-code-per-subspace; the corpus shuffles
  (id, sub, code) INTs only (never the float vectors), then one
  groupBy reassembles the length-``m`` code array. Optionally L2-
  normalizes first so inner-product ADC ranks by cosine.
* ``pq_topk`` — asymmetric distance computation (ADC): per-query
  lookup tables are built relationally from the tiny
  codebook ⨯ queries cross (m·n_codes rows per query), broadcast to
  the corpus codes, and the approximate score is a pure-HOF
  ``zip_with`` table-lookup fold — no per-row Python anywhere.
  Optional ``refine``: exact cosine re-rank of the top k·refine ADC
  candidates (an id-keyed join pulls only those vectors), the
  standard production recall knob.

The corpus codes DataFrame can be persisted/written once and reused
across query batches — at scale, train on a sample, encode once,
serve many.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.similarity import (
    cosine_similarity_expr,
    cosine_topk,
)
from temporal_retriever_spark.spread import spread_scan

Codebooks = list[list[list[float]]]  # [sub][code] -> centroid (dim/m floats)


def _check_dim(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subquantizers")
    return dim // m


def _subvector_rows(df: DataFrame, id_col: str, vec_col: str, m: int, sub_dim: int):
    """Explode each vector into m (id, sub, subvec) rows — one narrow pass."""
    subs = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(
                    F.transform(F.col(vec_col), lambda x: x.cast("double")),
                    s * sub_dim + 1,
                    sub_dim,
                ).alias("subvec"),
            )
            for s in range(m)
        ]
    )
    return df.select(F.col(id_col), F.explode(subs).alias("_s")).select(
        F.col(id_col), F.col("_s.sub").alias("sub"), F.col("_s.subvec").alias("subvec")
    )


def _codebook_frame(spark, codebooks: Codebooks) -> DataFrame:
    rows = [
        (s, c, [float(x) for x in cent])
        for s, book in enumerate(codebooks)
        for c, cent in enumerate(book)
    ]
    return spark.createDataFrame(rows, "sub int, code int, centroid array<double>")


def _l2() -> "F.Column":
    return F.aggregate(
        F.zip_with(
            F.col("subvec"), F.col("centroid"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_train(
    corpus: DataFrame,
    *,
    m: int = 8,
    n_codes: int = 16,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    normalize: bool = True,
    dim: int | None = None,
) -> Codebooks:
    """Train m product-quantizer codebooks of ``n_codes`` centroids each.

    All m subspaces train in the SAME Lloyd job per iteration (one
    assignment shuffle + one mean aggregation for the whole codebook),
    not m sequential k-means runs. Init is the deterministic
    ``xxhash64(seed, id)``-smallest sample, like ``kmeans_fit``.

    At 100 TB: run on a hash-sample of the corpus (the codebook is a
    model, not a per-row artifact); only m·n_codes·(dim/m) doubles ever
    reach the driver per iteration.
    """
    spark = corpus.sparkSession
    if dim is None:
        first = corpus.select(F.size(vec_col).alias("d")).limit(1).collect()
        if not first:
            raise ValueError("empty corpus")
        dim = first[0]["d"]
    sub_dim = _check_dim(dim, m)
    base = corpus.select(F.col(id_col), F.col(vec_col))
    if normalize:
        base = base.withColumn(vec_col, _unit_expr(vec_col, dim))
    init = (
        base.orderBy(F.xxhash64(F.lit(seed), F.col(id_col)))
        .limit(n_codes)
        .collect()
    )
    if len(init) < n_codes:
        raise ValueError(
            f"corpus has {len(init)} rows < n_codes={n_codes}; lower n_codes"
        )
    codebooks: Codebooks = [
        [
            [float(r[vec_col][s * sub_dim + j]) for j in range(sub_dim)]
            for r in init
        ]
        for s in range(m)
    ]
    # spread an under-partitioned scan (the explode/assign work below is
    # per-row compute) and persist: every Lloyd iteration re-consumes
    # the same subvector rows, and without the persist each iteration
    # re-reads + re-normalizes + re-explodes the corpus from scratch
    rows = _subvector_rows(
        spread_scan(base), id_col, vec_col, m, sub_dim
    ).persist()
    for _ in range(max_iter):
        cb = _codebook_frame(spark, codebooks)
        assigned = (
            rows.join(F.broadcast(cb), on="sub")
            .select(id_col, "sub", "code", "subvec", _l2().alias("_d"))
            .groupBy(id_col, "sub")
            .agg(
                F.min_by("code", F.struct("_d", "code")).alias("code"),
                F.first("subvec").alias("subvec"),
            )
        )
        means = (
            assigned.select(
                "sub", "code", F.posexplode("subvec").alias("pos", "val")
            )
            .groupBy("sub", "code", "pos")
            .agg(F.avg("val").alias("mval"))
            .collect()
        )
        by_key: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            by_key.setdefault((r["sub"], r["code"]), {})[r["pos"]] = r["mval"]
        updated: Codebooks = []
        for s in range(m):
            book = []
            for c in range(n_codes):
                got = by_key.get((s, c))
                if got:
                    book.append([got[p] for p in sorted(got)])
                else:  # empty code cell keeps its centroid
                    book.append(codebooks[s][c])
            updated.append(book)
        if updated == codebooks:
            break
        codebooks = updated
    rows.unpersist()
    return codebooks


def _unit_expr(vec_col: str, dim: int | None = None):
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(dv, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    if dim:
        # r10: referencing ``nrm`` inside the transform lambda re-inlines
        # the whole O(dim) norm fold PER ELEMENT — O(dim²) per row,
        # measured as the dominant cost of every corpus normalization
        # pass (same trap embedding_group_outliers documents). With the
        # dimension known, zip the vector against array_repeat(nrm, dim):
        # ArrayRepeat evaluates the norm ONCE per row and the division is
        # element-wise — identical values, O(dim) per row.
        return F.zip_with(
            dv, F.array_repeat(nrm, dim), lambda x, nn: F.try_divide(x, nn)
        )
    return F.transform(dv, lambda x: F.try_divide(x, nrm))


def pq_encode(
    corpus: DataFrame,
    codebooks: Codebooks,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Encode vectors to length-``m`` code arrays: (id, codes).

    Shuffle payload is (id, sub, code) ints — the float vectors stay in
    their scan partitions. ``normalize=True`` (the cosine contract)
    unit-normalizes before coding so inner-product ADC ranks cosine.
    """
    spark = corpus.sparkSession
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    base = corpus.select(F.col(id_col), F.col(vec_col))
    if normalize:
        base = base.withColumn(vec_col, _unit_expr(vec_col, m * sub_dim))
    rows = _subvector_rows(spread_scan(base), id_col, vec_col, m, sub_dim)
    cb = _codebook_frame(spark, codebooks)
    assigned = (
        rows.join(F.broadcast(cb), on="sub")
        .select(id_col, "sub", "code", _l2().alias("_d"))
        .groupBy(id_col, "sub")
        .agg(F.min_by("code", F.struct("_d", "code")).alias("code"))
    )
    return (
        assigned.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: Codebooks,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    codes: DataFrame | None = None,
    refine: int = 0,
    include_self: bool = False,
) -> DataFrame:
    """ADC top-k by approximate cosine: (query_id, vec_id, rank, score).

    ``score`` is the inner product of the unit query with the
    RECONSTRUCTED (quantized) unit corpus vector — i.e. approximate
    cosine. Per query the lookup table lut[sub][code] =
    dot(q_sub, centroid[sub][code]) is built relationally from
    queries ⨯ codebook (m·n_codes rows/query, all tiny) and broadcast;
    the corpus-side score is one ``zip_with`` table lookup over the
    8-byte codes — no floats move, no Python runs.

    ``refine=r`` re-ranks the top k·r ADC candidates with exact cosine
    (id-keyed join fetches only those vectors) and returns exact
    cosine as ``score`` — recall ≈ 1 for modest r at production scale.

    Pass ``codes`` (from :func:`pq_encode`, persisted) to skip
    re-encoding — the serve-many path.
    """
    spark = corpus.sparkSession
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    if codes is None:
        codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    q = queries.select(
        F.col(query_id_col), _unit_expr(vec_col, m * sub_dim).alias("_q")
    )
    qrows = _subvector_rows(q, query_id_col, "_q", m, sub_dim)
    cb = _codebook_frame(spark, codebooks)
    ip = F.aggregate(
        F.zip_with(F.col("subvec"), F.col("centroid"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # lut: (query_id, lut array<array<double>>) — lut[sub][code]
    lut = (
        qrows.join(F.broadcast(cb), on="sub")
        .select(query_id_col, "sub", "code", ip.alias("_ip"))
        .groupBy(query_id_col, "sub")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "_ip"))),
                lambda s: s["_ip"],
            ).alias("_row")
        )
        .groupBy(query_id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "_row"))),
                lambda s: s["_row"],
            ).alias("_lut")
        )
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("_lut"),
            lambda c, row: F.element_at(row, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = codes.crossJoin(F.broadcast(lut)).select(
        F.col(query_id_col), F.col(id_col), adc.alias("score")
    )
    if not include_self:
        scored = scored.filter(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    if refine and refine >= 1:
        cand = (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= k * refine)
            .select(query_id_col, id_col)
        )
        exact = cand.join(
            corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")), on=id_col
        ).join(
            F.broadcast(
                queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
            ),
            on=query_id_col,
        )
        rescored = exact.select(
            query_id_col,
            id_col,
            cosine_similarity_expr("_cv", "_qv").alias("score"),
        )
        w2 = Window.partitionBy(query_id_col).orderBy(
            F.col("score").desc(), F.col(id_col)
        )
        return (
            rescored.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select(query_id_col, id_col, "rank", "score")
        )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "score")
    )


def pq_reconstruction_error(
    corpus: DataFrame,
    codebooks: Codebooks,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Mean squared quantization error per vector: (id, mse).

    The training diagnostic: decode = concatenated centroids; MSE
    against the (unit) original via one HOF fold. Useful to pick
    (m, n_codes) on a sample before paying for the full encode.
    """
    spark = corpus.sparkSession
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    dim = m * sub_dim
    if codes is None:
        codes = pq_encode(
            corpus, codebooks, id_col=id_col, vec_col=vec_col, normalize=normalize
        )
    base = corpus.select(F.col(id_col), F.col(vec_col))
    if normalize:
        base = base.withColumn(vec_col, _unit_expr(vec_col, dim))
    cb = _codebook_frame(spark, codebooks)
    flat = (
        cb.select(
            "sub", "code", F.posexplode("centroid").alias("pos", "val")
        )
        .select(
            (F.col("sub") * sub_dim + F.col("pos")).alias("dim"),
            "sub",
            "code",
            "val",
        )
    )
    # decode relationally: join codes→centroid values on (sub, code)
    dec = (
        codes.select(id_col, F.posexplode("codes").alias("sub", "code"))
        .join(F.broadcast(flat), on=["sub", "code"])
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "val"))),
                lambda s: s["val"],
            ).alias("_dec")
        )
    )
    joined = base.join(dec, on=id_col)
    mse = (
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.col("_dec"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / F.lit(float(dim))
    )
    return joined.select(F.col(id_col), mse.alias("mse"))


def sq8_train(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    normalize: bool = False,
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) ranges for 8-bit scalar quantization.

    One posexplode + ONE (dim) aggregation — dim rows reach the
    driver. The SQ8 companion to PQ: 4× compression with exact,
    engine-mirrorable arithmetic (no k-means), the right first step
    before PQ's 16-32×.
    """
    base = corpus.select(F.col(vec_col))
    if normalize:
        base = base.select(_unit_expr(vec_col).alias(vec_col))
    rows = (
        base.select(F.posexplode(vec_col).alias("dim", "val"))
        .groupBy("dim")
        .agg(
            F.min(F.col("val").cast("double")).alias("lo"),
            F.max(F.col("val").cast("double")).alias("hi"),
        )
        .orderBy("dim")
        .collect()
    )
    return [(float(r["lo"]), float(r["hi"])) for r in rows]


def sq8_encode(
    corpus: DataFrame,
    ranges: list[tuple[float, float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = False,
) -> DataFrame:
    """Quantize each dimension to 0..255 over its range: (id, codes).

    code = round(255·(x − lo)/(hi − lo)), clamped — a pure zip_with
    expression over the broadcast range constants; zero shuffles, and
    exactly mirrorable in SQL (the contract check is value-exact, not
    recall-gated). Constant dimensions (hi == lo) code to 0.
    """
    base = corpus.select(F.col(id_col), F.col(vec_col))
    if normalize:
        base = base.withColumn(vec_col, _unit_expr(vec_col))
    lo = F.array(*[F.lit(l) for l, _ in ranges])
    width = F.array(*[F.lit(h - l) for l, h in ranges])
    scaled = F.zip_with(
        F.zip_with(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            lo,
            lambda x, l: x - l,
        ),
        width,
        lambda d, w: F.when(
            w > 0,
            F.greatest(
                F.lit(0),
                F.least(F.lit(255), F.round(d * F.lit(255.0) / w, 0).cast("int")),
            ),
        ).otherwise(F.lit(0)),
    )
    return base.select(F.col(id_col), scaled.alias("codes"))


def sq8_decode_expr(
    codes_col: str | "F.Column", ranges: list[tuple[float, float]]
) -> "F.Column":
    """Reconstruction expression: lo + code·width/255 per dimension."""
    col = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    lo = F.array(*[F.lit(l) for l, _ in ranges])
    width = F.array(*[F.lit(h - l) for l, h in ranges])
    return F.zip_with(
        F.zip_with(col, width, lambda c, w: c.cast("double") * w / F.lit(255.0)),
        lo,
        lambda v, l: v + l,
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    ranges: list[tuple[float, float]],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    codes: DataFrame | None = None,
    include_self: bool = False,
) -> DataFrame:
    """Approximate cosine top-k over SQ8-reconstructed vectors:
    (query_id, id, rank, score). Same broadcast shape as
    ``cosine_topk`` but the corpus side is the 4×-smaller code table;
    reconstruction happens in the expression, floats never stored."""
    from temporal_retriever_spark.llm.similarity import cosine_similarity_expr

    if codes is None:
        codes = sq8_encode(corpus, ranges, id_col=id_col, vec_col=vec_col)
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    joined = codes.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    sim = cosine_similarity_expr(sq8_decode_expr("codes", ranges), "_qvec")
    scored = joined.select(
        F.col(query_id_col), F.col(id_col), sim.alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "score")
    )


def ivfpq_train(
    corpus: DataFrame,
    *,
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 16,
    coarse_iter: int = 5,
    pq_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[list[list[float]], Codebooks]:
    """IVF-PQ (Jégou et al. 2011 §V, the FAISS composite): coarse
    k-means cells + product quantization of the RESIDUAL
    ``x − centroid(cell)``.

    Residual PQ is where PQ earns its keep on clustered data: the
    coarse quantizer absorbs the between-cluster structure, so the
    codebooks spend their bits on the within-cell detail a flat PQ
    wastes on separating clusters. Codebooks are shared across cells
    (the standard choice — per-cell books multiply model size ×cells).

    Returns (centroids, codebooks); both are models — train on a
    hash-sample at 100 TB, reuse across encodes and query batches.
    The corpus is unit-normalized internally (cosine contract).
    """
    from temporal_retriever_spark.llm.similarity import (
        assign_clusters,
        kmeans_fit,
    )

    unit = corpus.select(F.col(id_col), _unit_expr(vec_col).alias(vec_col))
    centroids = kmeans_fit(
        unit, k=n_cells, max_iter=coarse_iter, id_col=id_col,
        vec_col=vec_col, seed=seed,
    )
    assigned = assign_clusters(unit, centroids, id_col=id_col, vec_col=vec_col)
    spark = corpus.sparkSession
    cf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster int, _cent array<double>",
    )
    resid = assigned.join(F.broadcast(cf), on="cluster").select(
        F.col(id_col),
        F.zip_with(
            F.col(vec_col), F.col("_cent"), lambda a, b: a.cast("double") - b
        ).alias(vec_col),
    )
    books = pq_train(
        resid, m=m, n_codes=n_codes, max_iter=pq_iter, id_col=id_col,
        vec_col=vec_col, seed=seed + 1, normalize=False,
    )
    return centroids, books


def ivfpq_encode(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: Codebooks,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, codes): coarse cell + residual PQ codes — the whole
    index row is ~(4 + m) bytes/vector. Same int-only shuffle shape as
    ``pq_encode``."""
    from temporal_retriever_spark.llm.similarity import assign_clusters

    spark = corpus.sparkSession
    unit = corpus.select(
        F.col(id_col), _unit_expr(vec_col, len(centroids[0])).alias(vec_col)
    )
    assigned = assign_clusters(unit, centroids, id_col=id_col, vec_col=vec_col)
    cf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster int, _cent array<double>",
    )
    resid = assigned.join(F.broadcast(cf), on="cluster").select(
        F.col(id_col),
        F.col("cluster").alias("cell"),
        F.zip_with(
            F.col(vec_col), F.col("_cent"), lambda a, b: a.cast("double") - b
        ).alias(vec_col),
    )
    codes = pq_encode(
        resid, codebooks, id_col=id_col, vec_col=vec_col, normalize=False
    )
    return resid.select(id_col, "cell").join(codes, on=id_col)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: Codebooks,
    *,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    index: DataFrame | None = None,
    refine: int = 0,
    include_self: bool = False,
) -> DataFrame:
    """IVF-PQ search: probe ``nprobe`` cells, ADC-score residual codes.

    score(q, x) ≈ ⟨q̂, c_cell⟩ + Σ_sub LUT[sub][code] with
    LUT[sub][code] = ⟨q̂_sub, codebook[sub][code]⟩ — the decomposition
    ⟨q̂, x̂⟩ = ⟨q̂, c⟩ + ⟨q̂, r⟩. The LUT is CELL-INDEPENDENT (shared
    codebooks), built once per query from the tiny queries ⨯ codebook
    cross; the per-(query, cell) coarse dot products are a
    queries ⨯ centroids cross — both broadcast. Candidates are only
    the probed cells' rows (expected nprobe/n_cells of the corpus),
    scored without touching any stored float. ``refine`` re-ranks the
    ADC pool with exact cosine, as in :func:`pq_topk`.
    """
    from temporal_retriever_spark.llm.similarity import (
        assign_clusters,
        cosine_similarity_expr,
    )

    spark = corpus.sparkSession
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    if index is None:
        index = ivfpq_encode(
            corpus, centroids, codebooks, id_col=id_col, vec_col=vec_col
        )
    qunit = queries.select(
        F.col(query_id_col),
        _unit_expr(vec_col, len(centroids[0])).alias("_q"),
    )
    # probed cells + coarse dot per (query, cell)
    cf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, _cent array<double>",
    )
    qdots = qunit.crossJoin(F.broadcast(cf)).select(
        query_id_col,
        "cell",
        F.aggregate(
            F.zip_with(F.col("_q"), F.col("_cent"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("_qc"),
    )
    probed = assign_clusters(
        qunit, centroids, id_col=query_id_col, vec_col="_q",
        n_nearest=nprobe,
    ).select(query_id_col, F.col("cluster").alias("cell"))
    # per-query residual LUT (cell-independent, shared codebooks)
    qrows = _subvector_rows(qunit, query_id_col, "_q", m, sub_dim)
    cb = _codebook_frame(spark, codebooks)
    ip = F.aggregate(
        F.zip_with(F.col("subvec"), F.col("centroid"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    lut = (
        qrows.join(F.broadcast(cb), on="sub")
        .select(query_id_col, "sub", "code", ip.alias("_ip"))
        .groupBy(query_id_col, "sub")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "_ip"))),
                lambda s: s["_ip"],
            ).alias("_row")
        )
        .groupBy(query_id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "_row"))),
                lambda s: s["_row"],
            ).alias("_lut")
        )
    )
    probe_tbl = (
        probed.join(qdots, on=[query_id_col, "cell"])
        .join(lut, on=query_id_col)
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("_lut"),
            lambda c, row: F.element_at(row, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = index.join(F.broadcast(probe_tbl), on="cell").select(
        F.col(query_id_col),
        F.col(id_col),
        (F.col("_qc") + adc).alias("score"),
    )
    if not include_self:
        scored = scored.filter(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if refine and refine >= 1:
        cand = ranked.filter(F.col("rank") <= k * refine).select(
            query_id_col, id_col
        )
        exact = cand.join(
            corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")), on=id_col
        ).join(
            F.broadcast(
                queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
            ),
            on=query_id_col,
        )
        rescored = exact.select(
            query_id_col,
            id_col,
            cosine_similarity_expr("_cv", "_qv").alias("score"),
        )
        w2 = Window.partitionBy(query_id_col).orderBy(
            F.col("score").desc(), F.col(id_col)
        )
        return (
            rescored.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select(query_id_col, id_col, "rank", "score")
        )
    return ranked.filter(F.col("rank") <= k).select(
        query_id_col, id_col, "rank", "score"
    )
