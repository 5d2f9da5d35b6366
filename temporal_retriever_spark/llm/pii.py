"""PII detection and redaction over text corpora, fully native.

Every serious LLM training-data pipeline (Dolma, FineWeb, RefinedWeb)
runs a PII pass before release: find emails / phone numbers / IP
addresses / SSNs / card numbers, then mask them with typed tokens.
The hot path here is pure JVM regex inside whole-stage codegen —
``regexp_extract_all`` to count, chained ``regexp_replace`` to
redact — so a 100 TB scan is exactly one pass over the text column
with zero shuffles and zero Python workers.

Card-number candidates get a native Luhn checksum (`luhn_valid_expr`)
built from ``aggregate(sequence(...))`` higher-order functions: the
digit-doubling sum runs element-wise in the JVM, never per-row
Python. Counting distinguishes ``card_candidates`` (13–16 digit runs)
from ``cards_valid`` (Luhn-passing); redaction masks *all* candidates
— the conservative choice every production pipeline makes, since a
missed true card is worse than an over-masked order id.

Patterns deliberately use only syntax shared by Java's regex engine
(Spark) and RE2 (DuckDB oracles): character classes, bounded repeats,
non-capturing groups, ``\\b`` word boundaries — no backreferences or
lookaround, so the same pattern string drives both engines and the
contract oracles are byte-identical mirrors.

Relation to ``llm.filters.scrub_text``: that is the in-pipeline
cleaning step (email/url/ipv4 placeholder substitution inside
``prepare_corpus``); this module is the dedicated PII *audit*
surface — typed per-category counts, SSN/phone/card patterns, and
checksum validation (Luhn) that a release review needs. The two
share the design rule (RE2-compatible patterns, fixed application
order) but not patterns or columns.

Reference parity: the reference engine has no PII surface
(``/root/reference/temporal_retriever/app.py`` is forecasting-only);
this extends the corpus-preparation family (``llm/filters.py``,
``llm/corpus.py``) with the scrubbing stage those pipelines require.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "luhn_valid_expr",
    "pii_counts",
    "pii_redact",
]

#: Detection patterns, applied in this order during redaction so that
#: more-specific shapes win (SSN's 3-2-4 grouping before the generic
#: phone 3-3-4; emails before bare hostnames would ever match).
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — the practical (not RFC-complete) form.
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 123-45-6789 (US Social Security Number grouping).
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    # (555) 867-5309 / 555-867-5309 / 555.867.5309 / 555 867 5309
    "phone": r"\(?\b[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b",
    # Dotted-quad IPv4 (no range check — scrubbing favors recall).
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    # 13–16 digit runs: card-number candidates, Luhn-checked below.
    "card": r"\b[0-9]{13,16}\b",
}

#: Replacement tokens, keyed like PII_PATTERNS.
PII_TOKENS: dict[str, str] = {
    "email": "[EMAIL]",
    "ssn": "[SSN]",
    "phone": "[PHONE]",
    "ipv4": "[IP]",
    "card": "[CARD]",
}


def luhn_valid_expr(digits: Column) -> Column:
    """Luhn checksum over a digit-only string column, natively.

    Doubles every second digit from the right, subtracts 9 from
    doubles above 9, and checks the sum mod 10 — the ISO/IEC 7812
    check every payment card satisfies. Compiles to ``aggregate``
    over ``sequence(1, length)`` so the whole check is one JVM
    expression; NULL/empty input yields false.
    """
    d = digits
    n = F.length(d)

    def _term(i: Column) -> Column:
        digit = F.substring(F.reverse(d), i, 1).cast("int")
        doubled = digit * 2
        return F.when(
            i % 2 == 0,
            # double, then collapse >9 by subtracting 9
            F.when(doubled > 9, doubled - 9).otherwise(doubled),
        ).otherwise(digit)

    # i runs 1..n over positions from the RIGHT; doubled when i even.
    summed = F.aggregate(
        F.sequence(F.lit(1), n), F.lit(0), lambda acc, i: acc + _term(i)
    )
    return F.coalesce((n > 0) & (summed % 10 == 0), F.lit(False))


def pii_counts(
    df: DataFrame, text_col: str = "text", prefix: str = "pii_"
) -> DataFrame:
    """Per-row PII hit counts: one codegen'd pass, no shuffle.

    Adds ``{prefix}{kind}`` int columns for every PII_PATTERNS kind,
    plus ``{prefix}cards_valid`` (Luhn-passing card candidates) and
    ``{prefix}total`` (all hits, valid-card counting — candidates
    that fail Luhn are excluded from the total as non-PII noise).
    """
    t = F.col(text_col)
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"{prefix}{kind}",
            F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))),
        )
    cards = F.regexp_extract_all(t, F.lit(PII_PATTERNS["card"]), F.lit(0))
    out = out.withColumn(
        f"{prefix}cards_valid",
        F.size(F.filter(cards, lambda c: luhn_valid_expr(c))),
    )
    total = (
        F.col(f"{prefix}email")
        + F.col(f"{prefix}ssn")
        + F.col(f"{prefix}phone")
        + F.col(f"{prefix}ipv4")
        + F.col(f"{prefix}cards_valid")
    )
    return out.withColumn(f"{prefix}total", total)


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: list[str] | None = None,
) -> DataFrame:
    """Mask every PII hit with its typed token, in pattern order.

    A chained ``regexp_replace`` — one generated-code pass over the
    text, zero shuffles. ``kinds`` restricts which patterns apply
    (default: all, in PII_PATTERNS declaration order, which puts
    specific shapes before generic ones). All card *candidates* are
    masked, Luhn-valid or not — see the module docstring.
    """
    use = list(PII_PATTERNS) if kinds is None else kinds
    unknown = set(use) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    expr = F.col(text_col)
    for kind in PII_PATTERNS:  # declaration order, filtered by `use`
        if kind in use:
            expr = F.regexp_replace(
                expr, F.lit(PII_PATTERNS[kind]), F.lit(PII_TOKENS[kind])
            )
    return df.withColumn(out_col or text_col, expr)
