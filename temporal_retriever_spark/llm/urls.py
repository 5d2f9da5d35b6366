"""URL / domain analytics for crawl corpora, fully native.

Domain structure is the first control surface of a web-scale corpus:
per-domain document caps (no single site dominates the mixture),
domain blocklists, and per-domain quality attribution all key on a
normalized host. Everything here is ``regexp``/window expressions —
RE2-compatible patterns (no lookaround), so the SQL oracles mirror
the extraction byte-for-byte, and the hot path never leaves codegen.

``domain_cap`` is the scale-relevant operator: one window shuffle
keyed on the domain with a PRE-SHUFFLE partial top-k
(``WindowGroupLimit`` in the executed plan — each map task forwards
at most ``max_per_domain`` rows per domain it sees), so a domain
with 10M pages costs its cap, not its crawl size, in shuffle bytes.
The deterministic keep-order (hash of the doc id) makes the capped
subset reproducible across runs and engines.

Reference parity: no URL surface in the reference engine
(``/root/reference/temporal_retriever/app.py``); extends the corpus
family alongside ``sources/warc.py`` and ``llm/html.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "domain_cap",
    "domain_counts",
    "host_expr",
    "registrable_domain_expr",
]

#: scheme://[userinfo@]HOST[:port][/path...] — capture the host.
_HOST_PATTERN = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"

#: Multi-label public suffixes a 2-label heuristic would split wrong.
#: A deliberate compact subset of the Public Suffix List (the full
#: list is a data file, not logic; swap in via the ``suffixes`` arg).
_DEFAULT_TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


def host_expr(url: str | Column) -> Column:
    """Lower-cased host from a URL; NULL when there is no host."""
    u = F.col(url) if isinstance(url, str) else url
    h = F.lower(F.regexp_extract(u, _HOST_PATTERN, 1))
    return F.when(h != "", h)


def registrable_domain_expr(
    host: Column, *, suffixes: tuple[str, ...] = _DEFAULT_TWO_LABEL_SUFFIXES
) -> Column:
    """eTLD+1 heuristic: last 2 labels, or 3 when the tail is a known
    two-label public suffix (``news.bbc.co.uk`` → ``bbc.co.uk``).

    Native split/slice — no UDF. For exact PSL semantics pass the
    full suffix list; the operator shape doesn't change.
    """
    parts = F.split(host, r"\.")
    n = F.size(parts)
    # slice() rejects start=0, so clamp; the clamped value only fires
    # for n<=1 hosts, where the n>=2 guards ignore it anyway
    tail2 = F.concat_ws(".", F.slice(parts, F.greatest(n - 1, F.lit(1)), 2))
    take3 = tail2.isin(*suffixes) & (n >= 3)
    dom = F.when(
        take3,
        F.concat_ws(".", F.slice(parts, F.greatest(n - 2, F.lit(1)), 3)),
    ).otherwise(F.when(n >= 2, tail2).otherwise(host))
    return dom


def domain_counts(
    df: DataFrame,
    *,
    url_col: str = "url",
    registrable: bool = True,
) -> DataFrame:
    """Docs per domain, descending — the corpus concentration view."""
    h = host_expr(url_col)
    d = registrable_domain_expr(h) if registrable else h
    return (
        df.select(d.alias("domain"))
        .where(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "domain")
    )


def domain_cap(
    df: DataFrame,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_per_domain: int = 100,
    registrable: bool = True,
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``max_per_domain`` docs per domain (FineWeb-style).

    Keep-order is ``md5(salt:id)`` — a deterministic shuffle of each
    domain's docs, so the cap keeps a reproducible pseudo-random
    sample rather than crawl order (which is biased toward a site's
    front pages). Compiles to rank-over-window with the pre-shuffle
    ``WindowGroupLimit`` optimization; adds a ``domain`` column.
    """
    if max_per_domain <= 0:
        raise ValueError(f"max_per_domain must be > 0, got {max_per_domain}")
    h = host_expr(url_col)
    d = registrable_domain_expr(h) if registrable else h
    keyed = df.withColumn("domain", d)
    order = F.md5(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("domain").orderBy(order.asc(), F.col(id_col).asc())
    return (
        keyed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_per_domain)
        .drop("_rk")
    )
