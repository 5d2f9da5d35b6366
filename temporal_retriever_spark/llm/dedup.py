"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of these ops is the 100-TB corpus case):

* **exact**: one hash-groupBy shuffle on a 64/128-bit digest of the
  normalized text — never on the text itself (shuffling full documents
  is the classic mistake at scale).
* **MinHash**: k independent hash functions simulated as
  ``xxhash64(seed_i, shingle)``; signatures built in ONE aggregation
  over the exploded distinct shingles (k min-aggs, map-side partial).
* **LSH banding**: signatures sliced into b bands of r rows; a band
  hash collision is a candidate pair. Join cost is bounded by bucket
  sizes, not n² — the standard sub-quadratic near-dup path.
* **SimHash**: 64-bit signature from per-bit weighted sums of token
  hashes; pairs compared by hamming distance via ``bit_count(xor)``.
* **n-gram Jaccard**: exact set overlap via explode + join on shingle —
  quadratic in colliding docs, used to verify candidates, not to scan
  the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..spread import spread_scan


def _norm_text(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicate_groups(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of exact duplicates (normalized text), one row per digest.

    Output: fingerprint, n_docs, keep_id (min id), doc_ids (sorted).
    """
    fp = F.md5(_norm_text(F.col(text_col)))
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(id_col).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
    )


def exact_dedup(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one row (min id) per distinct normalized text.

    Implemented as a min-id window-free groupBy + semi join so only the
    digest shuffles, not the documents.
    """
    fp = F.md5(_norm_text(F.col(text_col))).alias("_fp")
    with_fp = df.withColumn("_fp", fp)
    keepers = with_fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return with_fp.join(keepers, on=["_fp", id_col], how="left_semi").drop("_fp")


def word_shingles(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Built natively with the ``transform``/``slice`` higher-order
    functions over the token array — no Python, no UDF.
    """
    tokens = F.split(_norm_text(F.col(text_col)), " ")
    shingles = F.expr(
        f"transform(sequence(1, greatest(size(_tokens) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(_tokens, i, {n})))"
    )
    # shingling + the min-hash / vote aggregations that consume it are
    # per-row compute: spread an under-partitioned scan or the whole
    # family (minhash/simhash/jaccard/containment) serializes on one task
    return (
        spread_scan(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), tokens.alias("_tokens"))
        .select(F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def minhash_signatures(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per document: (id, sig array<bigint>).

    One explode + one groupBy with ``num_hashes`` min-aggregations —
    a single shuffle regardless of k.

    ``shingled`` (optional): a precomputed ``word_shingles(df, ...)``
    table — pass ONE persisted shingle table when several dedup stages
    consume the same corpus (the r10 corpus-prep path), instead of
    re-normalizing/re-exploding the documents per stage. The caller
    owns its lifetime and must have built it with the same
    ``text_col``/``id_col``/``n``.
    """
    if shingled is None:
        shingled = word_shingles(df, text_col=text_col, id_col=id_col, n=n)
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    agg = shingled.groupBy(id_col).agg(*mins)
    return agg.select(
        F.col(id_col),
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    num_bands: int = 8,
    sig_len: int | None = None,
) -> DataFrame:
    """Banding: docs whose signature agrees on any full band.

    Output: (id_a, id_b) distinct with id_a < id_b. The self-join runs
    on (band index, band hash) — bucket-local, sub-quadratic.

    ``sig_len`` (= the num_hashes used to build the signatures) is
    required: signature length is a data property not present in the
    schema, and probing it would trigger an extra Spark action that
    re-executes the (possibly uncached) signature plan — a silent
    full-pipeline rerun at scale.
    """
    if sig_len is None:
        raise TypeError(
            "lsh_candidate_pairs: sig_len is required (the num_hashes used in "
            "minhash_signatures). It cannot be inferred from the schema, and "
            "probing the data would re-execute the signature plan."
        )
    if sig_len == 0 or sig_len % num_bands != 0:
        raise ValueError(f"signature length {sig_len} not divisible into {num_bands} bands")
    rows_per_band = sig_len // num_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(
                    F.lit(j),
                    F.concat_ws(
                        ",",
                        *[
                            F.col("sig")[j * rows_per_band + i].cast("string")
                            for i in range(rows_per_band)
                        ],
                    ),
                ).alias("bhash"),
            )
            for j in range(num_bands)
        ]
    )
    exploded = signatures.select(F.col(id_col), F.explode(bands).alias("b")).select(
        F.col(id_col), F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash")
    )
    left = exploded.select(
        F.col("band"), F.col("bhash"), F.col(id_col).alias("id_a")
    )
    right = exploded.select(
        F.col("band"), F.col("bhash"), F.col(id_col).alias("id_b")
    )
    return (
        left.join(right, on=["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def near_dup_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with estimated Jaccard.

    Pipeline: shingle → minhash → band → candidate pairs → estimate
    Jaccard as the fraction of agreeing signature positions → filter.
    Output: (id_a, id_b, est_jaccard).
    """
    sigs = minhash_signatures(
        df, text_col=text_col, id_col=id_col, n=n, num_hashes=num_hashes
    )
    candidates = lsh_candidate_pairs(
        sigs, id_col=id_col, num_bands=num_bands, sig_len=num_hashes
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("_sa"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("_sb"))
    est = F.expr(
        "aggregate(zip_with(_sa, _sb, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
    ) / F.lit(float(num_hashes))
    return (
        candidates.join(sa, on="id_a")
        .join(sb, on="id_b")
        .select("id_a", "id_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact word-n-gram Jaccard for pairs sharing ≥1 shingle.

    |A∩B| from a shingle self-join, |A∪B| = |A|+|B|−|A∩B| — integer
    arithmetic, so bit-exact against any SQL oracle. Quadratic in
    per-shingle doc frequency: use as the verifier behind LSH at scale
    (or on corpora bounded by a prior filter), not as a full-corpus scan.
    """
    shingled = word_shingles(df, text_col=text_col, id_col=id_col, n=n)
    sizes = shingled.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = shingled.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingled.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(F.broadcast(sa), on="id_a")
        .join(F.broadcast(sb), on="id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard computed ONLY for the given candidate pairs.

    The scale-safe composition: a sub-quadratic candidate generator
    (MinHash-LSH banding or SimHash blocking) proposes pairs; this
    verifier joins each candidate's shingle sets and computes the exact
    Jaccard — cost is bounded by |candidates|·|shingles per doc|, never
    by the corpus squared. Output: (id_a, id_b, jaccard ≥ threshold),
    identical to what ``ngram_jaccard_pairs`` would emit for those pairs.

    ``shingled``: optional precomputed/persisted shingle table (see
    :func:`minhash_signatures`), shared across dedup stages so the
    documents are not re-normalized/re-exploded per stage (r10).
    """
    if shingled is None:
        shingled = word_shingles(df, text_col=text_col, id_col=id_col, n=n)
    sizes = shingled.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    cand = candidates.select("id_a", "id_b")
    a = shingled.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingled.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand.join(a, on="id_a")
        .join(b, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(F.broadcast(sa), on="id_a")
        .join(F.broadcast(sb), on="id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def anchored_exact_pairs(
    df: DataFrame,
    anchor_ids: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs touching a fixed anchor set — the
    sampled ground-truth baseline for recall-gated approximate dedup.

    ``anchor_ids`` is a single-column DataFrame of document ids (any
    column name; the first column is used). Output: every (id_a, id_b,
    jaccard ≥ threshold) pair with id_a < id_b where AT LEAST ONE
    endpoint is an anchor — computed exactly via the shingle join, but
    with the left side restricted to anchor documents, so the cost is
    |anchor shingles| × per-shingle doc frequency: LINEAR in corpus
    size for a fixed anchor count, at any scale factor. This is what
    makes a recall contract scale-honest: the full exact pair set is
    quadratic, the anchored sample is not, and recall measured on the
    anchored sample is an unbiased estimate of overall recall.
    """
    aid = anchor_ids.columns[0]
    anchors = anchor_ids.select(F.col(aid).alias(id_col)).distinct()
    if shingled is None:
        shingled = word_shingles(df, text_col=text_col, id_col=id_col, n=n)
    anch_sh = shingled.join(F.broadcast(anchors), on=id_col, how="left_semi")
    # The anchor shingle side is bounded (|anchors|·shingles/doc) at any
    # SF — broadcast it EXPLICITLY so the corpus shingle stream never
    # shuffles on the shingle key. AQE picks broadcast at small SF on
    # its own, but the exploded subplan has no reliable size estimate,
    # and a silent SMJ flip at 100× would shuffle ~10⁸ (id, shingle)
    # rows.
    cand = (
        shingled.select(F.col(id_col).alias("_oid"), "shingle")
        .join(
            F.broadcast(anch_sh.select(F.col(id_col).alias("_aid"), "shingle")),
            on="shingle",
        )
        .filter(F.col("_aid") != F.col("_oid"))
        .select(
            F.least("_aid", "_oid").alias("id_a"),
            F.greatest("_aid", "_oid").alias("id_b"),
        )
        .distinct()
    )
    return jaccard_verify(
        df,
        cand,
        text_col=text_col,
        id_col=id_col,
        n=n,
        threshold=threshold,
        shingled=shingled,
    )


def near_dup_pairs_verified(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    threshold: float = 0.2,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact n-gram Jaccard.

    shingle → minhash → band → candidate pairs → exact-Jaccard verify.
    Unlike ``near_dup_pairs`` (which keeps the signature-estimated
    Jaccard), the output here carries the exact similarity, so given
    full candidate recall it equals the quadratic
    ``ngram_jaccard_pairs`` output at the same threshold — the property
    the driver oracle checks. Sub-quadratic end to end.
    """
    sigs = minhash_signatures(
        df,
        text_col=text_col,
        id_col=id_col,
        n=n,
        num_hashes=num_hashes,
        shingled=shingled,
    )
    candidates = lsh_candidate_pairs(
        sigs, id_col=id_col, num_bands=num_bands, sig_len=num_hashes
    )
    return jaccard_verify(
        df,
        candidates,
        text_col=text_col,
        id_col=id_col,
        n=n,
        threshold=threshold,
        shingled=shingled,
    )


def simhash_near_dups(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_hamming: int = 10,
    threshold: float = 0.2,
    feature: str = "token",
) -> DataFrame:
    """SimHash-blocked candidates verified with exact n-gram Jaccard.

    The pigeonhole blocking in ``simhash_pairs`` GUARANTEES every pair
    within ``max_hamming`` is a candidate (not probabilistic), so the
    output equals the exact pairs whose signatures are ≤ max_hamming
    apart and whose Jaccard ≥ threshold. Use ``feature="shingle"`` on
    short/template-heavy corpora — see ``simhash_signatures`` for the
    measured unigram degeneracy.
    """
    sigs = simhash_signatures(
        df, text_col=text_col, id_col=id_col, feature=feature, n=n
    )
    candidates = simhash_pairs(sigs, id_col=id_col, max_hamming=max_hamming)
    return jaccard_verify(
        df, candidates, text_col=text_col, id_col=id_col, n=n, threshold=threshold
    )


def duplicate_clusters(
    pairs: DataFrame,
    *,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iter: int = 50,
    method: str = "label",
) -> DataFrame:
    """Connected components over near-duplicate pairs → dup clusters.

    Output: (doc_id, cluster_id) where cluster_id = min doc id in the
    component — the canonical "keeper" per cluster.

    ``method="label"`` (default): iterative min-label propagation: each
    round every vertex takes the minimum label among itself and its
    neighbors; converges in O(component diameter) rounds (near-dup
    clusters are shallow — usually ≤3). Each round is one join + one
    aggregation; lineage is truncated per round with localCheckpoint so
    the plan stays flat.

    ``method="star"``: the large-star/small-star algorithm (Kiveris et
    al., "Connected Components in MapReduce and Beyond") — converges in
    O(log n) rounds regardless of diameter, the right choice when a
    100-TB corpus may contain deep duplicate chains.
    """
    if method == "star":
        return _star_components(
            pairs, left_col=left_col, right_col=right_col, max_iter=max_iter
        )
    if method != "label":
        raise ValueError(f"unknown connected-components method: {method!r}")
    edges = (
        pairs.select(F.col(left_col).alias("src"), F.col(right_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(right_col).alias("src"), F.col(left_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, on=edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, on=labels["id"] == neighbor_min["src"], how="left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def _canon_edges(pairs: DataFrame, left_col: str, right_col: str) -> DataFrame:
    """Distinct canonical (big, small) edges, self-loops dropped."""
    return (
        pairs.select(
            F.greatest(F.col(left_col), F.col(right_col)).alias("u"),
            F.least(F.col(left_col), F.col(right_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _star_components(
    pairs: DataFrame,
    *,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Large-star/small-star connected components (O(log n) rounds).

    Each round:

    * **large-star** — for every node u, connect each strictly larger
      neighbor v to m(u) = min(Γ(u) ∪ {u});
    * **small-star** — on canonical (big→small) edges, connect every
      smaller neighbor (and u itself) to the minimum neighbor.

    Both steps are one groupBy + one join; lineage is truncated per
    round. Converges when the canonical edge set is stable — checked
    here with an exact subtract (at 100 TB you'd compare a count +
    xor-checksum instead of materializing the difference).
    """
    nodes = (
        pairs.select(F.col(left_col).alias("id"))
        .unionByName(pairs.select(F.col(right_col).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = _canon_edges(pairs, left_col, right_col).localCheckpoint(eager=True)
    for _ in range(max_iter):
        # large-star over the undirected view
        undirected = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m_u = (
            undirected.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", "u").alias("m"))
        )
        ls = (
            undirected.join(m_u, on="u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over canonical (big → small) edges
        m_s = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(m_s, on="u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m_s.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = ss.subtract(edges).count() + edges.subtract(ss).count()
        edges = ss
        if changed == 0:
            break
    membership = edges.groupBy("u").agg(F.min("v").alias("label"))
    return (
        nodes.join(membership, on=nodes["id"] == membership["u"], how="left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce(F.col("label"), F.col("id")).alias("cluster_id"),
        )
    )


def simhash_signatures(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    feature: str = "token",
    n: int = 3,
) -> DataFrame:
    """64-bit SimHash per document: (id, simhash bigint).

    Classic Charikar construction: each feature votes ±1 on every bit
    of its 64-bit hash; signature bit j is the sign of the total. Built
    as ``bits`` conditional sums in one aggregation — native, one
    shuffle.

    ``feature`` picks the voting features: ``"token"`` (unigrams, the
    classic construction) or ``"shingle"`` (distinct word ``n``-grams,
    the same feature space the exact-Jaccard verifier uses). Unigram
    SimHash DEGENERATES on short template-heavy corpora — documents
    sharing the same frequent vocabulary converge to identical
    signatures regardless of content (measured on the 50k-doc sf1
    replica fixture: 12,129 distinct signatures, one group of 2,305
    docs with the SAME signature, 112M doc pairs within hamming 10 —
    which makes any hamming-radius blocking vacuous). Shingle features
    restore discrimination (49,782/50,000 distinct on the same corpus)
    and make hamming distance track shingle-set cosine, so prefer
    ``feature="shingle"`` when the downstream verifier is n-gram
    Jaccard.
    """
    if feature == "token":
        feats = F.explode(F.split(_norm_text(F.col(text_col)), " ")).alias("_f")
        hashed = (
            spread_scan(df.select(F.col(id_col), F.col(text_col)))
            .select(F.col(id_col), feats)
            .select(F.col(id_col), F.xxhash64("_f").alias("_h"))
        )
    elif feature == "shingle":
        hashed = word_shingles(df, text_col=text_col, id_col=id_col, n=n).select(
            F.col(id_col), F.xxhash64("shingle").alias("_h")
        )
    else:
        raise ValueError(f"unknown simhash feature: {feature!r}")
    votes = [
        F.sum(
            F.when(F.shiftright("_h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{j}")
        for j in range(bits)
    ]
    agg = hashed.groupBy(id_col).agg(*votes)
    sig = None
    for j in range(bits):
        bit = F.when(F.col(f"_v{j}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig.bitwiseOR(term)
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bucket_cap: int = 128,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance — EXACT recall within
    the radius, sub-quadratic on replica-heavy corpora.

    Three structural defenses against the r6-measured degeneracy
    (pigeonhole blocking went Σcnt² = 513M candidate rows on a
    replica-concentrated corpus):

    1. **Distinct-signature blocking.** The join runs over DISTINCT
       signatures, not documents: exact replicas (identical sigs —
       thousands per group on crawl-like corpora) collapse to one
       blocking row each. Identical-signature doc pairs are emitted
       directly at hamming 0; cross-signature pairs expand back to doc
       pairs only AFTER the hamming filter.
    2. **d+2 chunks.** Blocking uses ``max_hamming + 2`` chunks, so two
       signatures within hamming d agree on at least TWO chunks
       (pigeonhole: d differing bits can dirty at most d chunks).
    3. **Two-level split of oversized buckets.** First-level buckets
       with ≤ ``bucket_cap`` signatures self-join directly (guaranteed
       by agreement chunk #1). Oversized buckets sub-block their
       members on every OTHER chunk: a within-d pair in a big bucket
       shares a second agreeing chunk, so it meets in exactly that
       sub-bucket — recall stays EXACT (this is why d+2 chunks, not
       d+1), while a hot bucket's Σcnt² drops by the spread of the
       second chunk. Break-even: for a bucket of m members, level-1
       costs m² joined rows vs level-2's (n_chunks−1)·m²/2^chunk_bits
       + (n_chunks−1)·m explode rows, so level-2 wins for any m beyond
       a few × n_chunks — hence the small default cap.

    Hamming via ``bit_count(a XOR b)``. Scale note: the chunk key
    width is ``64 // (d+2)`` bits, so small radii (d ≤ 4 → ≥ 10-bit
    keys) block selectively at any corpus size; d ≈ 10 (5-bit keys) is
    an analysis-tier radius whose candidate rate is bounded by
    ~C(d+2,2)/2^(2·bits) of all pairs even in the uniform-signature
    worst case.
    """
    n_chunks = max_hamming + 2
    chunk_bits = 64 // n_chunks

    sig_groups = signatures.select("simhash").distinct()

    def _key(c: int):
        return (
            F.shiftright("simhash", c * chunk_bits)
            .bitwiseAND(F.lit((1 << chunk_bits) - 1))
        )

    chunks = F.array(
        *[
            F.struct(F.lit(c).alias("chunk"), _key(c).alias("key"))
            for c in range(n_chunks)
        ]
    )
    exploded = sig_groups.select(
        "simhash", F.explode(chunks).alias("c")
    ).select("simhash", F.col("c.chunk").alias("chunk"), F.col("c.key").alias("key"))

    bucket_sizes = exploded.groupBy("chunk", "key").agg(
        F.count("*").alias("_bsz")
    )
    sized = exploded.join(bucket_sizes, on=["chunk", "key"])
    small = sized.filter(F.col("_bsz") <= bucket_cap).select(
        "chunk", "key", "simhash"
    )
    big = sized.filter(F.col("_bsz") > bucket_cap).select(
        "chunk", "key", "simhash"
    )

    hamming = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    cand_small = (
        small.select("chunk", "key", F.col("simhash").alias("_sa"))
        .join(
            small.select("chunk", "key", F.col("simhash").alias("_sb")),
            on=["chunk", "key"],
        )
        .filter(F.col("_sa") < F.col("_sb"))
        .select("_sa", "_sb")
    )
    # second-level: members of an oversized bucket carry every OTHER
    # chunk's key; a within-d pair agrees on >= 2 chunks, so it shares
    # at least one (first-level, second-level) cell.
    sub = big.select(
        "chunk",
        "key",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c2).alias("chunk2"), _key(c2).alias("key2"))
                    for c2 in range(n_chunks)
                ]
            )
        ).alias("c2"),
    ).filter(F.col("c2.chunk2") != F.col("chunk")).select(
        "chunk",
        "key",
        F.col("c2.chunk2").alias("chunk2"),
        F.col("c2.key2").alias("key2"),
        "simhash",
    )
    cand_big = (
        sub.select("chunk", "key", "chunk2", "key2", F.col("simhash").alias("_sa"))
        .join(
            sub.select(
                "chunk", "key", "chunk2", "key2", F.col("simhash").alias("_sb")
            ),
            on=["chunk", "key", "chunk2", "key2"],
        )
        .filter(F.col("_sa") < F.col("_sb"))
        .select("_sa", "_sb")
    )
    # hamming filter BEFORE the dedup shuffle: bit_count is codegen-cheap
    # and runs streaming on the join output, so only radius survivors
    # (output-scale) reach the distinct.
    sig_pairs = (
        cand_small.unionByName(cand_big)
        .filter(hamming <= max_hamming)
        .distinct()
        .select("_sa", "_sb", hamming.alias("hamming"))
    )

    # expand cross-signature pairs back to doc pairs
    docs_a = signatures.select(
        F.col("simhash").alias("_sa"), F.col(id_col).alias("id_a")
    )
    docs_b = signatures.select(
        F.col("simhash").alias("_sb"), F.col(id_col).alias("id_b")
    )
    cross = (
        sig_pairs.join(docs_a, on="_sa")
        .join(docs_b, on="_sb")
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "hamming",
        )
    )
    # identical-signature groups: every within-group doc pair, hamming 0
    same_sig = (
        signatures.select(F.col("simhash"), F.col(id_col).alias("id_a"))
        .join(
            signatures.select(F.col("simhash"), F.col(id_col).alias("id_b")),
            on="simhash",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).cast("integer").alias("hamming"))
    )
    return cross.unionByName(same_sig).distinct()


def ngram_containment_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram containment for pairs sharing ≥1 shingle.

    Containment C(A→B) = |A∩B| / |A| — the asymmetric companion to
    Jaccard that catches a small document embedded inside a larger one
    (quotes, boilerplate wrappers, near-supersets), which Jaccard
    misses because the union is dominated by the big document. Emits
    (id_a < id_b) with both directions and keeps pairs where the MAX
    direction clears ``threshold`` (Broder's containment semantics).

    Integer arithmetic on distinct-shingle counts — bit-exact against
    any SQL oracle. Same cost model as ``ngram_jaccard_pairs``:
    quadratic in per-shingle doc frequency, so use as the verifier
    behind LSH blocking at corpus scale.
    """
    shingled = word_shingles(df, text_col=text_col, id_col=id_col, n=n)
    sizes = shingled.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = shingled.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingled.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    c_a = F.col("n_inter").cast("double") / F.col("n_a").cast("double")
    c_b = F.col("n_inter").cast("double") / F.col("n_b").cast("double")
    return (
        inter.join(F.broadcast(sa), on="id_a")
        .join(F.broadcast(sb), on="id_b")
        .select(
            "id_a",
            "id_b",
            c_a.alias("containment_a"),
            c_b.alias("containment_b"),
            F.greatest(c_a, c_b).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def verbatim_window_hashes(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 20,
    stride: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Distinct rolling token-window hashes per document:
    (id, whash) — the building block of exact-substring dedup.

    Every ``window_tokens``-token contiguous span (step ``stride``)
    is hashed; two documents sharing a hash share a verbatim
    ≥ window_tokens-token span (modulo hash collision, ~2⁻⁶⁴ for
    xxhash64). Native ``transform``/``slice`` HOFs over the token
    array — no Python; only (id, 8-byte hash) rows ever shuffle.

    ``hash_fn="md5"`` swaps the 64-bit hash for md5 — slower, but
    reproducible in any engine (the contract oracle's choice).
    Documents shorter than ``window_tokens`` yield a single
    whole-document window (they can still be verbatim-contained).
    """
    if window_tokens < 2:
        raise ValueError(f"window_tokens must be >= 2: {window_tokens}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1: {stride}")
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unsupported hash_fn: {hash_fn!r}")
    tokens = F.split(_norm_text(F.coalesce(F.col(text_col), F.lit(""))), " ")
    w, s = window_tokens, stride
    spans = F.expr(
        f"transform(sequence(1, greatest(size(_tokens) - {w - 1}, 1), {s}), "
        f"i -> concat_ws(' ', slice(_tokens, i, {w})))"
    )
    hashed = (
        F.transform(spans, lambda x: F.xxhash64(x))
        if hash_fn == "xxhash64"
        else F.transform(spans, lambda x: F.md5(x))
    )
    return (
        df.select(F.col(id_col), tokens.alias("_tokens"))
        .select(F.col(id_col), F.explode(F.array_distinct(hashed)).alias("whash"))
    )


def verbatim_span_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 20,
    stride: int = 1,
    max_df: int = 1000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exact-substring duplicate pairs (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): document pairs
    sharing ≥1 verbatim span of at least ``window_tokens`` tokens.

    The published method builds a corpus suffix array; the equivalent
    distributed formulation is rolling-window hashing — the same spans
    are detected (any shared substring of length ≥ w contains a shared
    w-token window) with a shuffle that carries (id, hash) pairs only.
    Output: (left_id, right_id, n_shared_windows), left < right —
    n_shared_windows lower-bounds the shared-span structure (w + n−1
    contiguous matches ⇔ a w+n−1-token verbatim run at stride 1).

    ``max_df`` drops windows appearing in more than that many
    documents BEFORE the pair join — the skew guard: boilerplate
    spans (licenses, headers) would otherwise contribute |df|² pairs.
    Dropped windows are boilerplate by definition (the operator
    targets pairwise verbatim reuse, not corpus-wide templates, which
    ``repetition_stats``/``exact_duplicate_groups`` cover).
    """
    hashes = verbatim_window_hashes(
        df,
        text_col=text_col,
        id_col=id_col,
        window_tokens=window_tokens,
        stride=stride,
        hash_fn=hash_fn,
    )
    if max_df is not None:
        ok = (
            hashes.groupBy("whash")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("whash")
        )
        hashes = hashes.join(ok, on="whash")
    a = hashes.select(F.col(id_col).alias("left_id"), "whash")
    b = hashes.select(F.col(id_col).alias("right_id"), "whash")
    return (
        a.join(b, on="whash")
        .filter(F.col("left_id") < F.col("right_id"))
        .groupBy("left_id", "right_id")
        .agg(F.count("*").alias("n_shared_windows"))
    )


def allpairs_jaccard(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT all-pairs Jaccard ≥ τ via prefix filtering — no LSH miss.

    Bayardo/Ma/Srikant 2007 ("Scaling Up All Pairs Similarity
    Search"): if J(A, B) ≥ τ then A and B must share a token inside
    each other's PREFIX — the first ``|d| − ⌈τ·|d|⌉ + 1`` tokens when
    every document orders its tokens by ascending global frequency
    (rarest first, the order that makes prefixes selective). So the
    candidate join runs on prefix tokens only, candidates are bounded
    by rare-token document frequencies instead of corpus², and — the
    property MinHash-LSH cannot offer — there are NO false negatives:
    the output is exactly every pair at or above the threshold.

    Plan shape: shingle explode → token-frequency aggregation →
    per-doc rank sort (one window keyed by doc) → prefix explode →
    token-keyed candidate self-join (the |B| ≥ τ·|A| length filter and
    the PPJoin positional bound ride the join) → hashed-array rough
    verify → exact string re-verify of the survivors. The rough verify
    attaches ONE compact xxhash64 array per candidate side and
    intersects in the JVM instead of re-exploding candidates onto
    (id, shingle) rows — the exploded verify was measured superlinear
    at a 10× corpus (36.7M candidates × ~75 shingles ⇒ billions of
    shuffled rows); hash collisions can only inflate an intersection,
    so the rough pass keeps a superset and exactness comes from the
    output-sized string re-verification.

    Use this when the threshold is high (τ ≥ ~0.5 keeps prefixes
    short) and recall must be exact — dataset-card dedup claims,
    eval-contamination sweeps. At lower thresholds prefixes approach
    whole documents; prefer `near_dup_pairs` (LSH) there.
    """
    from pyspark.sql import Window

    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    toks = word_shingles(df, text_col=text_col, id_col=id_col, n=n)
    # global document frequency per token -> rarest-first total order
    freq = toks.groupBy("shingle").agg(F.count("*").alias("_df"))
    ranked = toks.join(freq, on="shingle")
    w = Window.partitionBy(id_col).orderBy(
        F.col("_df").asc(), F.col("shingle").asc()
    )
    sized = ranked.select(
        F.col(id_col),
        "shingle",
        F.row_number().over(w).alias("_pos"),
        F.count("*").over(Window.partitionBy(id_col)).alias("_m"),
    )
    # prefix length m - ceil(tau*m) + 1
    plen = F.col("_m") - F.ceil(F.col("_m") * F.lit(threshold)) + 1
    prefix = sized.filter(F.col("_pos") <= plen).select(
        F.col(id_col), "shingle", "_pos", F.col("_m")
    )
    # positional filter (Xiao/Wang/Lin/Yu 2008, PPJoin): a matching
    # prefix token at positions (pa, pb) bounds the overlap by
    # 1 + min(|A|-pa, |B|-pb); if even the LOOSEST such bound over all
    # matching tokens is below the required overlap
    # alpha = ceil(tau/(1+tau)*(|A|+|B|)), the pair cannot reach tau.
    # Sound: a true pair's first common token yields a bound >= its
    # real overlap >= alpha. Rides the pair-dedup aggregation for free.
    a = prefix.select(
        F.col(id_col).alias("id_a"),
        "shingle",
        F.col("_pos").alias("_pa"),
        F.col("_m").alias("n_a"),
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"),
        "shingle",
        F.col("_pos").alias("_pb"),
        F.col("_m").alias("n_b"),
    )
    ubound = 1 + F.least(
        F.col("n_a") - F.col("_pa"), F.col("n_b") - F.col("_pb")
    )
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b"))
    )
    cands = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        # size filter: J >= tau forces tau <= |B|/|A| <= 1/tau
        .filter(
            (F.col("n_b") >= F.col("n_a") * F.lit(threshold))
            & (F.col("n_a") >= F.col("n_b") * F.lit(threshold))
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.max(ubound - alpha).alias("_slack"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
        .filter(F.col("_slack") >= 0)
        .select("id_a", "id_b", "n_a", "n_b")
    )
    # Verify WITHOUT exploding candidates back onto (id, shingle) rows:
    # the exploded join shuffles |cands| x |doc| rows — the measured
    # scale-killer (36.7M candidates x ~75 shingles = billions of rows
    # at a 10x corpus). Instead attach one compact 64-bit-hash array
    # per side and intersect in the JVM. Cross-document collisions only
    # INFLATE the intersection, but a WITHIN-document collision between
    # two shingles that are both shared with the other side DEFLATES it
    # (array_intersect dedups the colliding value) — probability
    # ~m²/2⁶⁴ per doc, but nonzero, so the rough pass compares against
    # a slightly relaxed threshold and lets the exact string re-verify
    # (output-sized work) make the final call. The relaxation keeps the
    # completeness guarantee deterministic instead of probabilistic.
    harr = toks.groupBy(id_col).agg(
        F.collect_list(F.xxhash64("shingle")).alias("_h")
    )
    inter_h = F.size(
        F.array_intersect(F.col("_ha"), F.col("_hb"))
    ).cast("double")
    jac_h = inter_h / (F.col("n_a") + F.col("n_b") - inter_h)
    rough = (
        cands.join(
            harr.select(F.col(id_col).alias("id_a"), F.col("_h").alias("_ha")),
            on="id_a",
        )
        .join(
            harr.select(F.col(id_col).alias("id_b"), F.col("_h").alias("_hb")),
            on="id_b",
        )
        .filter(jac_h >= threshold - 0.02)
        .select("id_a", "id_b", "n_a", "n_b")
    )
    ta = toks.select(F.col(id_col).alias("id_a"), "shingle")
    tb = toks.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        rough.join(ta, on="id_a")
        .join(tb, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("n_inter"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return inter.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )
