"""HTML → text extraction, fully native — the step after WARC.

A crawl corpus is HTTP response bodies; training text wants the
rendered prose. Heavyweight extractors (trafilatura, jusText) are
boilerplate *classifiers*; this module is the deterministic
*structural* layer they all share — drop non-content subtrees
(script/style/head/comments), turn block boundaries into newlines,
strip tags, unescape the common entities, normalize whitespace — as
a chain of ``regexp_replace`` expressions that runs entirely inside
whole-stage codegen: zero shuffles, zero Python, one pass over 100 TB
of response bodies.

Every pattern uses RE2-compatible syntax (inline ``(?is)`` flags,
lazy quantifiers, no lookaround), so a SQL mirror computes
byte-identical text — the extraction is oracle-checkable, which is
exactly what you want before feeding a trillion tokens to a
tokenizer. Boilerplate *scoring* on top of this belongs to
``llm.filters`` (C4/Gopher rules) and ``llm.lm`` (perplexity
pruning), which consume this module's output.

Reference parity: no HTML surface in the reference
(``/root/reference/temporal_retriever/app.py``); this extends the
corpus-preparation family alongside ``sources/warc.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "html_links_expr",
    "html_title_expr",
    "html_to_text",
    "html_to_text_expr",
]

#: (pattern, replacement) chain — ORDER MATTERS and is part of the
#: contract (mirrored verbatim in SQL oracles). Non-content subtrees
#: go first (their inner text must never leak), then block tags
#: become newlines, remaining tags become spaces, entities unescape,
#: whitespace collapses.
HTML_RULES: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?is)<head[^>]*>.*?</head>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)</?(?:p|div|br|li|ul|ol|tr|table|h1|h2|h3|h4|h5|h6|blockquote|section|article)[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&#34;", "\""),
    (r"[ \t]+", " "),
    (r" ?\n[ \n]*", "\n"),
    (r"(?s)^\s+", ""),
    (r"(?s)\s+$", ""),
)


def html_to_text_expr(col: str | Column) -> Column:
    """The extraction chain as one codegen'd column expression."""
    expr = F.col(col) if isinstance(col, str) else col
    for pat, repl in HTML_RULES:
        expr = F.regexp_replace(expr, F.lit(pat), F.lit(repl))
    return expr


def html_title_expr(col: str | Column) -> Column:
    """``<title>`` contents (entity-unescaped), '' when absent."""
    expr = F.col(col) if isinstance(col, str) else col
    title = F.regexp_extract(
        expr, r"(?is)<title[^>]*>(.*?)</title>", 1
    )
    for pat, repl in HTML_RULES[6:13]:  # entity rules only
        title = F.regexp_replace(title, F.lit(pat), F.lit(repl))
    return F.trim(F.regexp_replace(title, F.lit(r"\s+"), F.lit(" ")))


def html_links_expr(col: str | Column) -> Column:
    """Array of href targets (the URL-graph / crawl-frontier column)."""
    expr = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(
        expr, F.lit(r"""(?i)href\s*=\s*["']([^"']+)["']"""), F.lit(1)
    )


def html_to_text(
    df: DataFrame,
    *,
    html_col: str = "html",
    text_col: str = "text",
    title_col: str | None = "title",
    links_col: str | None = None,
) -> DataFrame:
    """Add extracted text (and optionally title / link array) columns.

    One generated-code pass; drop the optional columns you don't need
    — unreferenced expressions are pruned, they cost nothing.
    """
    out = df.withColumn(text_col, html_to_text_expr(html_col))
    if title_col:
        out = out.withColumn(title_col, html_title_expr(html_col))
    if links_col:
        out = out.withColumn(links_col, html_links_expr(html_col))
    return out
