"""Text analysis operators: token counting, quality scoring, language id,
document fingerprinting.

All hot-path expressions are native ``pyspark.sql.functions`` (JVM,
whole-stage codegen); nothing here crosses into Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..spread import spread_scan

#: BPE-ish tokenizer regex: words, numbers, or single non-space symbols —
#: a practical token-count proxy when no real tokenizer is shipped.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: small multilingual stopword sets for the quality score
_STOPWORDS = (
    "the a an and or of to in is are was for on with as at by it this that "
    "der die das und oder ist sind für mit als ein eine "
    "el la los las y o de en es un una para con "
    "le la les et ou de en est un une pour avec"
).split()


def token_count_expr(col: Column | str, *, mode: str = "whitespace") -> Column:
    """Token count: ``whitespace`` split or ``bpe`` regex token count."""
    col = F.col(col) if isinstance(col, str) else col
    if mode == "whitespace":
        return F.size(F.split(F.trim(col), r"\s+"))
    if mode == "bpe":
        return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))
    raise ValueError(f"unsupported token mode: {mode!r}")


def quality_exprs(text_col: str = "text") -> dict[str, Column]:
    """Name → native expression for the per-document quality metrics.

    Exposed as expressions (not a materialized frame) so composite
    operators like ``corpus.prepare_corpus`` can gate on them in the
    SAME narrow pass over the documents — adding a metric never costs a
    self-join. ``text_stats`` materializes exactly these.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_expr(t, mode="whitespace")
    n_bpe = token_count_expr(t, mode="bpe")
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    n_digit = F.regexp_count(t, F.lit(r"[0-9]"))
    n_upper = F.regexp_count(t, F.lit(r"[A-Z]"))
    stop_pattern = r"(?i)\b(" + "|".join(_STOPWORDS) + r")\b"
    n_stop = F.regexp_count(t, F.lit(stop_pattern))
    nc = n_chars.cast("double")
    nt = n_tokens.cast("double")
    punct_ratio = F.when(n_chars > 0, n_punct / nc).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit / nc).otherwise(F.lit(0.0))
    upper_ratio = F.when(n_chars > 0, n_upper / nc).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / nt).otherwise(F.lit(0.0))
    avg_tok = F.when(n_tokens > 0, nc / nt).otherwise(F.lit(0.0))
    # bounded sub-scores multiplied: each in [0,1]
    len_score = F.least(nc / F.lit(200.0), F.lit(1.0))
    word_score = F.when((avg_tok >= 3) & (avg_tok <= 12), 1.0).otherwise(0.5)
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 4)
    digit_score = F.greatest(F.lit(0.0), F.lit(1.0) - digit_ratio * 4)
    quality = len_score * word_score * punct_score * digit_score
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_bpe_tokens": n_bpe,
        "avg_token_len": avg_tok,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "upper_ratio": upper_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": quality,
    }


#: metrics text_stats rounds for presentation/oracle stability
_ROUNDED_METRICS = (
    "avg_token_len",
    "punct_ratio",
    "digit_ratio",
    "upper_ratio",
    "stopword_ratio",
    "quality_score",
)


def text_stats(
    df: DataFrame, *, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Per-document quality metrics, all native expressions.

    n_chars / n_tokens / n_bpe_tokens / avg_token_len / punct_ratio /
    digit_ratio / upper_ratio / stopword_ratio / quality_score.

    quality_score is a deterministic [0,1] heuristic: long-enough docs
    with normal word length, low punctuation/digit density, and a sane
    stopword rate score high — the usual pre-training filter features.
    """
    exprs = quality_exprs(text_col)
    # boundary-guard offset (same value as the contract layer): the
    # ratios are small-denominator rationals that can land EXACTLY on a
    # rounding half-point (e.g. 41/640 = 0.0640625), where Spark's
    # HALF_UP and an oracle engine's half-even legitimately disagree —
    # the sf1 sweep caught 9 such documents. The nudge moves every
    # half-point off the boundary identically on both sides.
    guard = F.lit(1.234567e-07)
    df = spread_scan(df)
    return df.select(
        *id_cols,
        *[
            (F.round(e + guard, 6) if name in _ROUNDED_METRICS else e).alias(name)
            for name, e in exprs.items()
        ],
    )


#: language -> characteristic word/character markers for the n-gram
#: heuristic. Scores count distinct marker hits; highest score wins.
_LANG_MARKERS = {
    "en": ["the ", " and ", " of ", " is ", " to ", "ing ", " that "],
    "de": [" der ", " die ", " das ", " und ", " ist ", "sch", " nicht ", " mit "],
    "es": [" el ", " la ", " los ", " que ", " es ", "ción", " una ", " para "],
    "fr": [" le ", " la ", " les ", " est ", " une ", " avec ", " pour ", " qui "],
}


def language_expr(text_col: str = "text") -> Column:
    """The language-id decision as ONE native expression (same
    arithmetic as ``language_id``) — composable into a narrow pass.

    r10 shape: the scores are LET-BOUND twice (``transform`` over a
    one-element array binds the padded-lowercase text, then the score
    array) so each marker ``replace`` evaluates exactly once per row.
    The previous tree re-inlined every score into ``greatest`` AND each
    tie-break WHEN (147 replaces per row instead of ~37, measured in
    the collapsed corpus-gate filter plan), and the padded ``lower``
    once per replace — big enough that the generated filter method blew
    the 64 KB JVM limit and fell back to interpreted eval. Same doubles,
    same tie order (first language in marker order wins), bit-identical
    decision.
    """
    raw = F.col(text_col)
    t = F.concat(F.lit(" "), F.lower(raw), F.lit(" "))
    cjk = F.regexp_count(raw, F.lit(r"[一-鿿]"))
    langs = list(_LANG_MARKERS)

    def _scores(p: Column) -> Column:
        cols = []
        for markers in _LANG_MARKERS.values():
            score = None
            for m in markers:
                c = (
                    F.length(p) - F.length(F.replace(p, F.lit(m), F.lit("")))
                ) / F.lit(len(m))
                score = c if score is None else score + c
            cols.append(score)
        return F.array(*cols)

    def _decide(a: Column) -> Column:
        best = F.array_max(a)
        pick = None
        for i, lang in reversed(list(enumerate(langs))):
            expr = F.lit(lang)
            pick = (
                expr
                if pick is None
                else F.when(F.element_at(a, i + 1) == best, expr).otherwise(pick)
            )
        return F.when(best <= 0, F.lit("unknown")).otherwise(pick)

    decision = F.element_at(
        F.transform(
            F.array(t),
            lambda p: F.element_at(
                F.transform(F.array(_scores(p)), _decide), 1
            ),
        ),
        1,
    )
    return F.when(cjk * 4 > F.length(raw), F.lit("zh")).otherwise(decision)


def language_id(
    df: DataFrame, *, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Marker-n-gram language identification (en/de/es/fr/zh + unknown).

    CJK scripts are detected by character class; Latin languages by
    counting characteristic n-gram markers. Pure native expressions —
    a deterministic heuristic, not a trained model (the container has
    no langid/fasttext; swap in a real classifier via mapInPandas when
    available).
    """
    return spread_scan(df).select(
        *id_cols, language_expr(text_col).alias("lang_pred")
    )


def text_fingerprint(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    algorithm: str = "xxhash",
) -> DataFrame:
    """Whole-document fingerprint over normalized text.

    Normalization: lowercase, collapse whitespace runs, trim — so
    formatting-only variants collide. ``xxhash`` (64-bit, fast, engine
    native) for production; ``md5`` for cross-engine-checkable oracles.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    if algorithm == "xxhash":
        fp = F.xxhash64(norm)
    elif algorithm == "md5":
        fp = F.md5(norm)
    else:
        raise ValueError(f"unsupported fingerprint algorithm: {algorithm!r}")
    return df.select(*id_cols, fp.alias("fingerprint"))


def tfidf_topk(
    df: DataFrame,
    *,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = 1,
) -> DataFrame:
    """Top-k TF-IDF keywords per document.

    tf = in-document token count; idf = ln((N + 1)/(df_t + 1)) + 1
    (the smoothed sklearn-style variant — never zero, no divide-by-
    zero on corpus-wide tokens); score = tf · idf. Ties rank by token
    ascending, so results are deterministic and cross-engine stable.

    Plan shape: ONE explode feeds both aggregations — (doc, token)
    term counts and (token) document frequencies; the DF side joins
    back by token (shuffle join — vocabulary can exceed broadcast at
    corpus scale, and AQE broadcasts it when it doesn't); the corpus
    size N is a one-row broadcast cross join (never a driver action,
    so the operator stays composable/lazy). The final per-doc rank
    compiles to WindowGroupLimit: each map task ships only its local
    top-k candidates — the same distributed top-k plan as
    ``token_topk``/``cosine_topk``.

    Output: (id_col, token, tf, df_count, tfidf, rank), rank 1..k.
    """
    toks = F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("token")
    base = (
        df.select(F.col(id_col), toks)
        .filter(F.length("token") >= int(min_token_len))
    )
    tf = base.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = base.groupBy("token").agg(
        F.count_distinct(F.col(id_col)).alias("df_count")
    )
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).alias("_n_docs")
    )
    scored = (
        tf.join(dfreq, on="token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log((F.col("_n_docs") + 1) / (F.col("df_count") + 1))
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(id_col, "token", "tf", "df_count", "tfidf", "rank")
    )


def token_topk(
    df: DataFrame,
    *,
    k: int = 20,
    group_col: str | None = None,
    text_col: str = "text",
    lowercase: bool = True,
    min_token_len: int = 1,
) -> DataFrame:
    """Top-k most frequent tokens per group (vocabulary heavy hitters).

    Whitespace tokenization (the engine's token-count convention),
    optional lowercasing, exact counts. Ties broken by token
    ascending so the result is deterministic across engines.

    Plan shape: explode → partial+final count aggregation (one shuffle
    on (group, token)) → rank window on group. Spark inserts
    WindowGroupLimit BELOW the rank exchange, so each map task ships
    only its local top-k candidates per group — the same distributed
    top-k plan as ``similarity.cosine_topk``. At 100 TB the shuffle
    carries per-partition candidate sets, not the full vocabulary.
    Output: (group?, token, cnt, rank), rank 1..k.
    """
    keys = [group_col] if group_col else []
    tok = F.explode(
        F.split(F.trim(F.col(text_col)), r"\s+")
    ).alias("token")
    base = df.select(*keys, tok)
    # lowercase BEFORE the length filter: the oracle measures the
    # lowered token, and Unicode case-folding can change string length
    # (e.g. 'İ' -> 'i̇'), so filtering on the raw token would diverge
    if lowercase:
        base = base.withColumn("token", F.lower(F.col("token")))
    base = base.filter(F.length("token") >= min_token_len)
    counts = base.groupBy(*keys, "token").agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    ).orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )


def collocations_pmi(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    lowercase: bool = True,
) -> DataFrame:
    """Bigram collocation mining by pointwise mutual information.

    PMI = ln( P(w1,w2) / (P(w1) * P(w2)) ) over adjacent whitespace
    token pairs — the classic phrase detector (Church & Hanks 1990;
    the word2vec phrase-joining preprocessing step). A training-data
    pipeline runs this to find multiword expressions worth fusing
    before tokenizer training.

    Plan shape: ONE scan of the documents builds the token arrays;
    bigrams come from a JVM ``zip_with`` over two array slices (no
    Python, no self-join). Two count aggregations (bigrams, unigrams)
    each shuffle only (token-pair, count) partials — map-side combine
    makes the shuffle vocabulary-sized, not corpus-sized. The unigram
    table and the two scalar totals are vocabulary-/one-row-sized, so
    both probability joins are broadcasts: at 100 TB the heavy bigram
    table never reshuffles after its count aggregation.

    ``min_count`` prunes rare pairs BEFORE the joins (PMI is noisy at
    low counts and the filter shrinks the candidate set early);
    probabilities still use the unpruned totals.

    Output: (w1, w2, pair_cnt, pmi), one row per surviving bigram.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    if lowercase:
        toks = F.transform(toks, F.lower)
    arr = df.select(toks.alias("_t")).select(
        F.col("_t"),
        F.greatest(F.size("_t") - 1, F.lit(0)).alias("_nb"),
    )
    bigrams = arr.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("_t"), F.lit(1), F.col("_nb")),
                F.slice(F.col("_t"), F.lit(2), F.col("_nb")),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    uni = (
        arr.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pair = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_cnt"))
    tot_b = pair.agg(F.sum("pair_cnt").cast("double").alias("_nbi"))
    tot_u = uni.agg(F.sum("wc").cast("double").alias("_nun"))
    c1 = F.col("_w1c").cast("double")
    c2 = F.col("_w2c").cast("double")
    cp = F.col("pair_cnt").cast("double")
    pmi = F.log((cp / F.col("_nbi")) / ((c1 / F.col("_nun")) * (c2 / F.col("_nun"))))
    return (
        pair.filter(F.col("pair_cnt") >= int(min_count))
        .join(F.broadcast(uni.select(F.col("w").alias("w1"), F.col("wc").alias("_w1c"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"), F.col("wc").alias("_w2c"))), "w2")
        .crossJoin(F.broadcast(tot_b))
        .crossJoin(F.broadcast(tot_u))
        .select("w1", "w2", "pair_cnt", pmi.alias("pmi"))
    )


def readability(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document — the
    classic readability gates of corpus quality filtering (Flesch
    1948; Kincaid et al. 1975 — public formulas), entirely native
    regex counting:

    * words      = whitespace tokens,
    * sentences  = runs of ``[.!?]`` (floored at 1),
    * syllables  ≈ vowel-group count over the lowercased text — the
      standard cheap heuristic (one `[aeiouy]+` run per syllable);
      exact hyphenation dictionaries are out of honest scope, and
      the heuristic's error is stable across a corpus, which is all
      a filter threshold needs.

    FRE = 206.835 − 1.015·(words/sent) − 84.6·(syll/words);
    FKGL = 0.39·(words/sent) + 11.8·(syll/words) − 15.59.
    Zero-word docs emit NULL scores. One narrow projection — no
    shuffle, no Python.
    """
    t = F.col(text_col)
    words = token_count_expr(t, mode="whitespace").cast("double")
    sents = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("double")
    sylls = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")).cast("double")
    wps = words / sents
    spw = sylls / words
    fre = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    fkgl = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    nz = words > 0
    return df.select(
        *id_cols,
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        sylls.cast("long").alias("n_syllables"),
        F.when(nz, F.round(fre, 6)).alias("flesch_reading_ease"),
        F.when(nz, F.round(fkgl, 6)).alias("fk_grade"),
    )


def keyness(
    df: DataFrame,
    *,
    group_col: str,
    text_col: str = "text",
    k: int = 10,
    min_count: int = 5,
) -> DataFrame:
    """Corpus keyness: the tokens that CHARACTERIZE each slice, by
    Dunning's log-likelihood ratio (Dunning 1993) of the token's rate
    inside the slice vs the rest of the corpus — the standard
    corpus-linguistics keyword statistic (raw frequency finds "the";
    TF-IDF finds rarities; LLR finds what is genuinely
    over-represented):

        G² = 2·(a·ln(a/E_a) + b·ln(b/E_b))
        E_a = c·(a+b)/(c+d)   E_b = d·(a+b)/(c+d)

    with a/b the token's count in the slice / rest and c/d the slice
    / rest token totals (zero-count terms contribute 0). Only
    over-represented tokens (a/c > b/d) rank; ties break by token
    ascending. ``min_count`` drops unstable rare tokens.

    Plan: one (group, token) count aggregation off the token explode,
    token totals by two tiny reaggregations joined back (broadcast —
    vocabulary- and group-sized), arithmetic in the projection, and
    the per-group top-k rank window compiles to the pre-shuffle
    WindowGroupLimit like `token_topk`. Tokenization is the engine
    convention (whitespace, lowercased).

    Output: (group, token, n_in, n_out, llr, rank), rank 1..k.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1: {min_count}")
    tok = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")
    base = df.select(F.col(group_col).alias("grp"), tok).withColumn(
        "token", F.lower(F.col("token"))
    ).filter(F.length("token") >= 1)
    gt = base.groupBy("grp", "token").agg(
        F.count(F.lit(1)).cast("double").alias("_a")
    )
    tok_tot = gt.groupBy("token").agg(F.sum("_a").alias("_ab"))
    grp_tot = gt.groupBy("grp").agg(F.sum("_a").alias("_c"))
    all_tot = gt.agg(F.sum("_a").alias("_cd"))
    d = (
        gt.join(F.broadcast(tok_tot), on="token")
        .join(F.broadcast(grp_tot), on="grp")
        .crossJoin(F.broadcast(all_tot))
        .withColumn("_b", F.col("_ab") - F.col("_a"))
        .withColumn("_d", F.col("_cd") - F.col("_c"))
    )
    ea = F.col("_c") * F.col("_ab") / F.col("_cd")
    eb = F.col("_d") * F.col("_ab") / F.col("_cd")
    term_a = F.when(
        F.col("_a") > 0, F.col("_a") * F.log(F.col("_a") / ea)
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("_b") > 0, F.col("_b") * F.log(F.col("_b") / eb)
    ).otherwise(F.lit(0.0))
    llr = 2.0 * (term_a + term_b)
    over = F.col("_a") / F.col("_c") > F.col("_b") / F.col("_d")
    scored = (
        d.filter((F.col("_a") >= float(min_count)) & over)
        .withColumn("llr", llr)
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("llr").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            F.col("grp").alias(group_col),
            "token",
            F.col("_a").cast("long").alias("n_in"),
            F.col("_b").cast("long").alias("n_out"),
            "llr",
            "rank",
        )
    )


def zipf_fit(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_n: int = 200,
    lowercase: bool = True,
    min_token_len: int = 1,
) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS of ln(count) on
    ln(rank) for the ``top_n`` most frequent tokens. Natural corpora
    fit slope ≈ −1 with high R²; machine-generated or
    template-heavy text bends the curve — a one-number corpus-quality
    screen that complements the per-document `text_stats`.

    Same tokenization/tie conventions as `token_topk` (whitespace,
    lowercase, count-desc / token-asc ranks). One (token) count
    aggregation, one top-n rank window (pre-shuffle group-limited),
    one moment reduction. Output (one row): ``n_tokens, slope,
    intercept, r2`` — ``n_tokens`` = min(top_n, vocabulary)."""
    ranked = token_topk(
        df,
        k=top_n,
        group_col=None,
        text_col=text_col,
        lowercase=lowercase,
        min_token_len=min_token_len,
    ).select(
        F.log(F.col("rank").cast("double")).alias("_x"),
        F.log(F.col("cnt").cast("double")).alias("_y"),
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("_x"), F.sum("_y")
    sxx = F.sum(F.col("_x") * F.col("_x"))
    syy = F.sum(F.col("_y") * F.col("_y"))
    sxy = F.sum(F.col("_x") * F.col("_y"))
    agg = ranked.agg(
        n.alias("_n"), sx.alias("_sx"), sy.alias("_sy"),
        sxx.alias("_sxx"), syy.alias("_syy"), sxy.alias("_sxy"),
    )
    nn = F.col("_n")
    vx = F.col("_sxx") - F.col("_sx") * F.col("_sx") / nn
    vy = F.col("_syy") - F.col("_sy") * F.col("_sy") / nn
    cxy = F.col("_sxy") - F.col("_sx") * F.col("_sy") / nn
    slope = F.when(vx > 0, cxy / vx)
    return agg.select(
        nn.cast("long").alias("n_tokens"),
        slope.alias("slope"),
        ((F.col("_sy") - slope * F.col("_sx")) / nn).alias("intercept"),
        F.when((vx > 0) & (vy > 0), cxy * cxy / (vx * vy)).alias("r2"),
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    *,
    quotes_dashes: bool = True,
    strip_control: bool = True,
    collapse_whitespace: bool = True,
    lowercase: bool = False,
    nfkc: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """Canonical text cleanup — the step that runs BEFORE dedup,
    fingerprinting, and tokenization so that cosmetically-different
    bytes don't defeat exact/near matching.

    Native (JVM-expression) passes, applied in this order:

    * ``strip_control`` — drop C0/C1 control characters (keeping
      \\t \\n \\r for the whitespace pass to fold).
    * ``quotes_dashes`` — fold curly quotes/apostrophes to ASCII
      ``"``/``'``, en/em dashes to ``-``, ellipsis to ``...``,
      NBSP to space (the high-frequency Unicode cosmetics in web
      text; full compatibility folding is what ``nfkc`` is for).
    * ``collapse_whitespace`` — any whitespace run → one space, then
      trim.
    * ``lowercase`` — casefold via ``lower``.

    ``nfkc=True`` additionally applies true Unicode NFKC via an
    Arrow-batched ``mapInPandas`` (``unicodedata.normalize`` — ICU
    isn't in Spark's builtin surface); it runs FIRST so the native
    passes see compatibility-folded text. The native passes are
    SQL-mirrorable (the contract-row oracle replays them); the NFKC
    pass is pytest-verified against CPython's unicodedata.

    Output: ``out_col`` (default: ``text_col`` replaced in place).
    """
    out = out_col or text_col
    cur = spread_scan(df)
    col = F.col(text_col)
    if nfkc:
        import pandas as pd  # noqa: F401

        src_cols = cur.columns
        schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in cur.schema.fields
        )

        def run(batches):
            import unicodedata

            for pdf in batches:
                pdf = pdf.copy()
                pdf[text_col] = [
                    unicodedata.normalize("NFKC", t) if t is not None else None
                    for t in pdf[text_col]
                ]
                yield pdf

        cur = cur.mapInPandas(run, schema).select(*src_cols)
        col = F.col(text_col)
    if strip_control:
        col = F.regexp_replace(
            col, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""
        )
    if quotes_dashes:
        col = F.translate(
            col,
            "‘’‚“”„–— ",
            "'''\"\"\"-- ",
        )
        col = F.regexp_replace(col, "…", "...")
    if collapse_whitespace:
        col = F.trim(F.regexp_replace(col, "\\s+", " "))
    if lowercase:
        col = F.lower(col)
    return cur.withColumn(out, col)
