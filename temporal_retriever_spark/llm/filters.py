"""Pre-training corpus filters: repetition metrics, Gopher-style
quality rules, PII/URL scrubbing, and benchmark-contamination checks.

These are the document-level gates a large-scale training-data
pipeline runs between ingest and dedup (the published recipe:
Rae et al. 2021 "Scaling Language Models" appendix A1's quality
heuristics, and the n-gram-overlap decontamination used by GPT-3 /
PaLM-class corpus builds). The reference engine has no document
pipeline at all (it is a time-series service, app.py:96-98) — this
module is part of the corpus surface built on the same engine.

Scale design: every metric here is a NATIVE per-row expression
(regexp counts, array HOFs, aggregate folds) — zero shuffles, zero
Python, so the filters run inside the same narrow scan that feeds
dedup signatures. The only shuffling operator is ``contamination``,
which shuffles 64-bit n-gram hashes (never text) and broadcasts the
benchmark side when it is small (the common case: benchmarks are
thousands of documents, the corpus is billions).

Because the cost is per-row expression work, an under-partitioned
scan serializes it (one ~100 MB parquet file = one task); every
materializing entry point therefore spreads its input via
``spread_scan`` — a guarded no-op at real partition counts (r9,
measured 10× on ``repetition_stats`` at sf0.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..spread import spread_scan

__all__ = [
    "repetition_exprs",
    "repetition_stats",
    "gopher_rules",
    "gopher_filter",
    "scrub_text",
    "contamination",
    "c4_clean",
]


def _tokens(text_col: Column) -> Column:
    """Lowercased whitespace tokens — the module-wide tokenization."""
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def _word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams of a token array as space-joined strings.

    Guarded: fewer than ``n`` tokens yields an empty array (Spark's
    ``sequence(1, 0)`` would otherwise generate a DESCENDING range).
    """
    if n == 1:
        return toks
    count = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(count >= 1, grams).otherwise(F.array().cast("array<string>"))


def _mode_struct(sorted_arr: Column) -> Column:
    """(value, count) of the most frequent element of a SORTED string
    array, as one ``aggregate`` fold — ties resolve to the smallest
    value (first maximal run in sorted order), so the result is
    deterministic and SQL-mirrorable (ORDER BY cnt DESC, value ASC).
    """
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(None).cast("string").alias("best"),
        F.lit(0).alias("bestrun"),
    )

    def step(a: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(a["prev"]), a["run"] + 1).otherwise(F.lit(1))
        improved = run > a["bestrun"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(improved, x).otherwise(a["best"]).alias("best"),
            F.when(improved, run).otherwise(a["bestrun"]).alias("bestrun"),
        )

    return F.aggregate(
        sorted_arr,
        acc0,
        step,
        lambda a: F.struct(a["best"].alias("value"), a["bestrun"].alias("cnt")),
    )


def repetition_exprs(text_col: str = "text") -> dict[str, Column]:
    """Name → native expression for the Gopher repetition metrics.

    * ``dup_line_frac`` / ``dup_para_frac`` — surplus duplicate lines
      (paragraphs) over total: ``(n − n_distinct) / n``. Lines split on
      ``\\n``, paragraphs on blank-line runs.
    * ``top_{1,2,3}gram_char_frac`` — fraction of the document's
      characters covered by occurrences of its most frequent word
      n-gram: ``cnt · len(gram) / n_chars`` (gram length includes its
      single internal spaces; Rae et al. A1.1's "fraction of
      characters in the most frequent n-gram").

    All are per-row array/regexp arithmetic — no shuffle, no Python.
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")

    def dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(
            n > 0, (n - F.size(F.array_distinct(arr))).cast("double") / n
        ).otherwise(F.lit(0.0))

    lines = F.split(t, r"\n")
    paras = F.split(t, r"\n{2,}")
    toks = _tokens(t)
    out: dict[str, Column] = {
        "n_lines": F.size(lines),
        "dup_line_frac": dup_frac(lines),
        "dup_para_frac": dup_frac(paras),
    }
    for n in (1, 2, 3):
        mode = _mode_struct(F.array_sort(_word_ngrams(toks, n)))
        frac = F.when(
            (n_chars > 0) & (mode["cnt"] > 0),
            mode["cnt"] * F.length(mode["value"]) / n_chars,
        ).otherwise(F.lit(0.0))
        out[f"top_{n}gram_char_frac"] = frac
    return out


def _dup_frac(arr: Column) -> Column:
    """Surplus-duplicate fraction of an array: (n − n_distinct) / n."""
    n = F.size(arr)
    return F.when(
        n > 0, (n - F.size(F.array_distinct(arr))).cast("double") / n
    ).otherwise(F.lit(0.0))


def _mode_frac_from_struct(m: Column, n_chars: Column) -> Column:
    """top-n-gram char fraction from a materialized mode struct column."""
    return F.when(
        (n_chars > 0) & (m["cnt"] > 0),
        m["cnt"] * F.length(m["value"]) / n_chars,
    ).otherwise(F.lit(0.0))


def repetition_stats(
    df: DataFrame, *, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Materialized :func:`repetition_exprs` per document.

    Staged in two projections so each mode fold — the expensive
    interpreted ``aggregate`` HOF — is evaluated ONCE per (row, n):
    referencing ``mode["cnt"]`` / ``mode["value"]`` / the ``cnt > 0``
    guard from one inlined expression tree re-evaluates the whole fold
    per reference (3× per metric, 9 folds/row, visible as three copies
    of ``aggregate(array_sort(...))`` per output column in the r9
    before-plan). CollapseProject keeps the stage boundary because the
    struct columns are non-cheap and multiply-referenced.
    """
    df = spread_scan(df)
    t = F.col(text_col)
    toks = _tokens(t)
    staged = df.select(
        *id_cols,
        F.length(t).cast("double").alias("_nc"),
        F.size(F.split(t, r"\n")).alias("n_lines"),
        _dup_frac(F.split(t, r"\n")).alias("_dup_line"),
        _dup_frac(F.split(t, r"\n{2,}")).alias("_dup_para"),
        *[
            _mode_struct(F.array_sort(_word_ngrams(toks, n))).alias(f"_m{n}")
            for n in (1, 2, 3)
        ],
    )
    return staged.select(
        *id_cols,
        "n_lines",
        F.round("_dup_line", 6).alias("dup_line_frac"),
        F.round("_dup_para", 6).alias("dup_para_frac"),
        *[
            F.round(
                _mode_frac_from_struct(F.col(f"_m{n}"), F.col("_nc")), 6
            ).alias(f"top_{n}gram_char_frac")
            for n in (1, 2, 3)
        ],
    )


#: the Gopher "stop word" presence list (Rae et al. A1: a document must
#: contain >= 2 of these to pass the rule)
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    max_dup_line_frac: float = 0.3,
    max_top_2gram_char_frac: float = 0.2,
) -> dict[str, Column]:
    """Name → boolean expression for each Gopher-style quality rule
    (defaults are the published thresholds, Rae et al. 2021 A1).

    Rules (all native regexp/array arithmetic):

    * ``r_word_count``   — token count in [min_words, max_words]
    * ``r_mean_word_len``— mean token length in [3, 10]
    * ``r_symbol_ratio`` — (``#`` + ``...`` occurrences)/words ≤ 0.1
    * ``r_bullet_lines`` — ≤ 90% of lines start with a bullet
    * ``r_ellipsis_lines``— ≤ 30% of lines end with an ellipsis
    * ``r_alpha_words``  — ≥ 80% of words contain a letter
    * ``r_stopwords``    — ≥ 2 distinct Gopher stop words present
    * ``r_dup_lines`` / ``r_top_2gram`` — repetition gates
    * ``keep``           — conjunction of all rules
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_words = F.size(toks).cast("double")
    n_chars_in_words = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    ).cast("double")
    mean_word_len = F.when(n_words > 0, n_chars_in_words / n_words).otherwise(0.0)
    n_symbols = (
        F.regexp_count(t, F.lit(r"#")) + F.regexp_count(t, F.lit(r"\.\.\."))
    ).cast("double")
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words).otherwise(0.0)
    lines = F.split(t, r"\n")
    n_lines = F.size(lines).cast("double")
    n_bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•]|\d+[.)])\s"))
    ).cast("double")
    n_ellipsis = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))
    ).cast("double")
    n_alpha_words = F.size(
        F.filter(toks, lambda w: w.rlike(r"[a-z]"))
    ).cast("double")
    alpha_frac = F.when(n_words > 0, n_alpha_words / n_words).otherwise(0.0)
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS]),
        )
    )
    rep = repetition_exprs(text_col)
    rules = {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len),
        "r_symbol_ratio": symbol_ratio <= max_symbol_word_ratio,
        "r_bullet_lines": F.when(
            n_lines > 0, n_bullet / n_lines <= max_bullet_line_frac
        ).otherwise(F.lit(True)),
        "r_ellipsis_lines": F.when(
            n_lines > 0, n_ellipsis / n_lines <= max_ellipsis_line_frac
        ).otherwise(F.lit(True)),
        "r_alpha_words": alpha_frac >= min_alpha_word_frac,
        "r_stopwords": stop_hits >= min_stopword_hits,
        "r_dup_lines": rep["dup_line_frac"] <= max_dup_line_frac,
        "r_top_2gram": rep["top_2gram_char_frac"] <= max_top_2gram_char_frac,
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else keep & expr
    rules["keep"] = keep
    return rules


def gopher_filter(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    max_dup_line_frac: float = 0.3,
    max_top_2gram_char_frac: float = 0.2,
) -> DataFrame:
    """Per-document rule booleans + overall ``keep`` flag.

    Identical rule semantics to :func:`gopher_rules`, staged in three
    projections so the expensive per-row metrics (array-HOF folds and
    filters, the 2-gram mode fold) are computed ONCE each: the
    single-projection form re-evaluates every rule expression inside
    the ``keep`` conjunction (2× per rule) and every struct-field
    reference re-inlines its whole fold (r9 before-plan: the 2-gram
    ``aggregate(array_sort(...))`` appears 6×). Compose with
    ``corpus.prepare_corpus`` by filtering on ``keep`` before
    signatures are computed, so rejected documents never reach the
    dedup shuffle.
    """
    df = spread_scan(df)
    t = F.col(text_col)
    toks = _tokens(t)
    lines = F.split(t, r"\n")
    metrics = df.select(
        *id_cols,
        F.size(toks).cast("double").alias("_nw"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ).cast("double").alias("_ncw"),
        (
            F.regexp_count(t, F.lit(r"#")) + F.regexp_count(t, F.lit(r"\.\.\."))
        ).cast("double").alias("_nsym"),
        F.size(lines).cast("double").alias("_nlines"),
        F.size(
            F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•]|\d+[.)])\s"))
        ).cast("double").alias("_nbullet"),
        F.size(
            F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))
        ).cast("double").alias("_nellipsis"),
        F.size(F.filter(toks, lambda w: w.rlike(r"[a-z]"))).cast("double").alias(
            "_nalpha"
        ),
        F.size(
            F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS]),
            )
        ).alias("_stop"),
        _dup_frac(lines).alias("_dup_line"),
        _mode_struct(F.array_sort(_word_ngrams(toks, 2))).alias("_m2"),
        F.length(t).cast("double").alias("_nc"),
    )
    nw = F.col("_nw")
    mean_word_len = F.when(nw > 0, F.col("_ncw") / nw).otherwise(0.0)
    symbol_ratio = F.when(nw > 0, F.col("_nsym") / nw).otherwise(0.0)
    nlines = F.col("_nlines")
    alpha_frac = F.when(nw > 0, F.col("_nalpha") / nw).otherwise(0.0)
    top2 = _mode_frac_from_struct(F.col("_m2"), F.col("_nc"))
    ruled = metrics.select(
        *id_cols,
        (
            (nw >= min_words) & (nw <= max_words)
        ).alias("r_word_count"),
        (
            (mean_word_len >= min_mean_word_len)
            & (mean_word_len <= max_mean_word_len)
        ).alias("r_mean_word_len"),
        (symbol_ratio <= max_symbol_word_ratio).alias("r_symbol_ratio"),
        F.when(
            nlines > 0, F.col("_nbullet") / nlines <= max_bullet_line_frac
        ).otherwise(F.lit(True)).alias("r_bullet_lines"),
        F.when(
            nlines > 0, F.col("_nellipsis") / nlines <= max_ellipsis_line_frac
        ).otherwise(F.lit(True)).alias("r_ellipsis_lines"),
        (alpha_frac >= min_alpha_word_frac).alias("r_alpha_words"),
        (F.col("_stop") >= min_stopword_hits).alias("r_stopwords"),
        (F.col("_dup_line") <= max_dup_line_frac).alias("r_dup_lines"),
        (top2 <= max_top_2gram_char_frac).alias("r_top_2gram"),
    )
    rule_names = (
        "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
        "r_stopwords", "r_dup_lines", "r_top_2gram",
    )
    keep = None
    for name in rule_names:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return ruled.select(*id_cols, *rule_names, keep.alias("keep"))


#: scrub category -> (pattern, replacement token). Conservative RE2-safe
#: patterns (no lookaround) so any engine can mirror them.
_SCRUB_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "url": (r"https?://[^\s]+", "<URL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def scrub_text(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    categories: tuple[str, ...] = ("email", "url", "ipv4"),
    out_col: str = "scrubbed",
) -> DataFrame:
    """Redact PII-ish spans (emails, URLs, IPv4 addresses) with typed
    placeholder tokens and count the redactions per category.

    Order matters and is fixed: emails before URLs before IPs —
    conservative for PII, so an address embedded in a URL query string
    is redacted as an email first (and counted in BOTH categories; the
    remaining URL shell is then redacted as a URL).
    Pure ``regexp_replace``/``regexp_count`` chains — native,
    shuffle-free, and the patterns avoid lookaround so they mean the
    same thing in RE2-based engines (cross-engine scrubbing parity).
    """
    unknown = set(categories) - set(_SCRUB_PATTERNS)
    if unknown:
        raise ValueError(f"unknown scrub categories: {sorted(unknown)}")
    df = spread_scan(df)
    scrubbed = F.col(text_col)
    counts = []
    for cat in categories:
        pattern, token = _SCRUB_PATTERNS[cat]
        counts.append(F.regexp_count(scrubbed, F.lit(pattern)).alias(f"n_{cat}"))
        scrubbed = F.regexp_replace(scrubbed, pattern, token)
    return df.select(*id_cols, *counts, scrubbed.alias(out_col))


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per-document count and fraction of
    distinct word ``n``-grams that also appear anywhere in the
    benchmark corpus (the GPT-3/PaLM 13-gram-overlap recipe).

    Plan shape at 100 TB: both sides reduce to DISTINCT 64-bit xxhash
    n-gram digests *before* any join — the corpus side inside the same
    narrow projection as the other filters, so the join (broadcast by
    default: benchmark suites are tiny next to the corpus; set
    ``broadcast_benchmark=False`` to shuffle-join a huge one) carries
    hashes only, never text. Output: (id, n_ngrams, n_contaminated,
    contaminated_frac) — gate with ``contaminated_frac == 0`` or a
    small threshold.

    Documents shorter than ``n`` words have zero n-grams and report a
    0.0 fraction (nothing to leak).
    """
    bench_text_col = bench_text_col or text_col
    # spread the NARROW (id, text) projection, not the full frame: when
    # the exchange fires it would otherwise round-robin (and local-sort,
    # SPARK-23207) whole documents plus passenger columns (ADVICE r9)
    docs = spread_scan(docs.select(id_col, text_col))
    grams = F.array_distinct(_word_ngrams(_tokens(F.col(text_col)), n))
    # NULL grams (doc shorter than n words, kept by explode_outer so the
    # doc still reports a row) must hash to NULL: xxhash64(NULL) is the
    # SEED (a real value), which would both inflate n_ngrams and be
    # joinable — guard explicitly
    doc_grams = docs.select(
        F.col(id_col), F.explode_outer(grams).alias("_gram")
    ).select(
        id_col,
        F.when(F.col("_gram").isNotNull(), F.xxhash64("_gram")).alias("_gh"),
    )
    bench_grams = (
        benchmark.select(
            F.explode(
                F.array_distinct(_word_ngrams(_tokens(F.col(bench_text_col)), n))
            ).alias("_gram")
        )
        .select(F.xxhash64("_gram").alias("_gh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    joined = doc_grams.join(bench_grams, on="_gh", how="left")
    per_doc = joined.groupBy(id_col).agg(
        F.count("_gh").alias("n_ngrams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
    )
    return per_doc.select(
        id_col,
        "n_ngrams",
        "n_contaminated",
        F.when(
            F.col("n_ngrams") > 0,
            F.col("n_contaminated").cast("double") / F.col("n_ngrams"),
        )
        .otherwise(F.lit(0.0))
        .alias("contaminated_frac"),
    )


def c4_clean(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    require_terminal_punct: bool = True,
    min_line_words: int = 3,
    drop_javascript_lines: bool = True,
    min_sentences: int = 5,
    bad_phrases: tuple[str, ...] = ("lorem ipsum",),
    drop_curly_brace: bool = True,
    out_col: str = "text_clean",
) -> DataFrame:
    """C4-style line cleaning + page gates (Raffel et al. 2020 §2.2).

    The published recipe, line for line:

    * retain only lines ending in a terminal punctuation mark
      (``. ! ?`` or a closing quote) — ``require_terminal_punct``;
    * retain only lines with ≥ ``min_line_words`` words (paper: 3);
    * drop lines containing the word "javascript" (case-insensitive);
    * drop pages with fewer than ``min_sentences`` sentences (paper: 5;
      sentences ≈ terminal-punctuation marks in the cleaned text —
      the standard fast approximation);
    * drop pages containing any ``bad_phrases`` entry (paper: "lorem
      ipsum"; pass a blocklist to extend) or a curly brace.

    Everything is native array/regexp arithmetic on one narrow
    projection — zero shuffles, zero Python; the cleaned text feeds
    dedup/LM stages without re-scanning. Output keeps per-doc
    diagnostics: (ids…, out_col, n_lines, n_lines_kept, n_sentences,
    rule booleans, keep).
    """
    df = spread_scan(df)
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, r"\n")

    def line_ok(line):
        trimmed = F.trim(line)
        ok = F.lit(True)
        if require_terminal_punct:
            ok = ok & trimmed.rlike(r'[.!?]["”’]?$')
        if min_line_words > 0:
            n_words = F.size(
                F.filter(F.split(trimmed, r"\s+"), lambda w: F.length(w) > 0)
            )
            ok = ok & (n_words >= min_line_words)
        if drop_javascript_lines:
            ok = ok & ~F.lower(trimmed).rlike(r"\bjavascript\b")
        return ok

    kept = F.filter(lines, line_ok)
    clean = F.array_join(F.transform(kept, F.trim), "\n")
    n_sentences = F.regexp_count(clean, F.lit(r"[.!?]"))
    rules = {
        "r_min_sentences": n_sentences >= F.lit(min_sentences),
        "r_curly": (
            ~t.contains("{") if drop_curly_brace else F.lit(True)
        ),
    }
    phrase_ok = F.lit(True)
    for p in bad_phrases:
        phrase_ok = phrase_ok & ~F.lower(t).contains(p.lower())
    rules["r_bad_phrases"] = phrase_ok
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else keep & expr
    return df.select(
        *id_cols,
        clean.alias(out_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        n_sentences.alias("n_sentences"),
        *[e.alias(name) for name, e in rules.items()],
        keep.alias("keep"),
    )
