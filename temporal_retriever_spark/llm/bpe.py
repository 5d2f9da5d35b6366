"""Byte-pair encoding: train a real merge table on a corpus, encode
documents with it, decode back.

This replaces the ``BPE_ISH_PATTERN`` regex *proxy* in ``llm.text``
with the actual algorithm (Sennrich et al. 2016): pre-tokenize into a
word-frequency table, then repeatedly merge the most frequent adjacent
symbol pair. The reference engine has no tokenizer at all — this is
part of the training-data surface (token budgeting in
``corpus.mixture_plan``, packing in ``chunking.pack_sequences``
consume the counts).

Scale design — the published one, made Spark-native:

* **Training never iterates over the corpus.** ONE narrow pass builds
  the (word, count) vocabulary table — the only corpus-sized step,
  and it is a single map-side-combined aggregation. All merge
  iterations run against that table, whose size is the corpus's
  distinct-word vocabulary, not its token count. 100 TB of text has
  a vocabulary in the millions — driver-collectable — so the default
  fast path collects it once and runs the classic merge loop in
  memory (`driver_threshold_rows`). Above the threshold the same
  loop runs distributed: per merge, one pair-count aggregation + a
  native ``aggregate``-fold rewrite of the symbol arrays, with an
  eager ``localCheckpoint`` per round to keep the plan flat (the
  same lineage-truncation discipline as ``duplicate_clusters``).
* **Encoding is an Arrow ``mapInPandas`` pass** with the merge table
  broadcast (it is ≤ vocab_size rows). Within a batch, distinct
  words are encoded once and memoized — Zipf makes that a large
  constant factor. No shuffle: tokens are appended to the scan.
* Determinism: pair-count ties break lexicographically on the pair,
  so driver and distributed training produce identical merge tables
  (asserted in tests), and re-runs are bit-stable.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..spread import spread_scan

__all__ = [
    "word_freq_table",
    "bpe_train",
    "bpe_encode",
    "bpe_decode_expr",
    "merges_to_frame",
]

#: end-of-word marker symbol (Sennrich-style)
EOW = "</w>"


def _normalize(text_col: Column) -> Column:
    """Same normalization as ``llm.lm``: lowercase, collapse
    whitespace, trim; null ⇒ empty."""
    return F.regexp_replace(
        F.lower(F.trim(F.coalesce(text_col, F.lit("")))), r"\s+", " "
    )


def word_freq_table(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) vocabulary of the normalized corpus — the ONE
    corpus-sized pass of BPE training (map-side combined count)."""
    norm = _normalize(F.col(text_col))
    docs = spread_scan(docs.select(text_col))
    words = docs.select(
        F.explode(
            F.when(F.length(norm) > 0, F.split(norm, " ")).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def _chars_expr(word: Column) -> Column:
    """word → symbol array: its characters plus the EOW marker."""
    return F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.substring(word, i, 1),
        ),
        F.array(F.lit(EOW)),
    )


def _merge_fold_expr(syms: Column, a: str, b: str) -> Column:
    """Left-fold application of one merge (a, b) → ab to a symbol
    array — the leftmost-first greedy rewrite, pure JVM HOF."""
    ab = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(ab)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Driver-side mirror of :func:`_merge_fold_expr` (identical
    greedy semantics — asserted equal in tests)."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _train_in_memory(
    vocab: list[tuple[list[str], int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over an in-memory (symbols, count)
    vocabulary. Ties break on the lexicographically smallest pair."""
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab:
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + cnt
        if not counts:
            break
        # max count; tie → lexicographically smallest pair
        top = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top)
        merges.append(best_pair)
        a, b = best_pair
        vocab = [(_merge_word(s, a, b), c) for s, c in vocab]
    return merges


def bpe_train(
    docs: DataFrame,
    *,
    num_merges: int = 100,
    text_col: str = "text",
    driver_threshold_rows: int = 1_000_000,
    checkpoint_every: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a corpus.

    Returns the ranked merge list (rank = list position). If the
    distinct-word vocabulary fits under ``driver_threshold_rows`` the
    merge loop runs in memory on the collected (word, cnt) table —
    the standard practice at any corpus scale, since the vocabulary
    is corpus-size-independent. Otherwise the identical loop runs
    distributed (one pair-count aggregation + one HOF rewrite per
    merge, ``localCheckpoint`` every ``checkpoint_every`` rounds).
    Both paths are deterministic and produce the same merges
    (tests/test_bpe.py asserts it).
    """
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0: {num_merges}")
    wf = word_freq_table(docs, text_col=text_col)
    n_vocab = wf.count()
    if n_vocab <= driver_threshold_rows:
        rows = wf.collect()
        vocab = [(list(r["word"]) + [EOW], int(r["cnt"])) for r in rows]
        return _train_in_memory(vocab, num_merges)

    words = wf.select(_chars_expr(F.col("word")).alias("syms"), "cnt")
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    pair_struct = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("a"),
                F.element_at(F.col("syms"), i + 1).alias("b"),
            ),
        )
    )
    for it in range(num_merges):
        top = (
            words.filter(F.size("syms") >= 2)
            .select(pair_struct.alias("p"), "cnt")
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.select(
            _merge_fold_expr(F.col("syms"), a, b).alias("syms"), "cnt"
        )
        if (it + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def merges_to_frame(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """Merge list → (rank, left, right) DataFrame (persistable as the
    tokenizer artifact; feed back via ``list(df.collect())``)."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string",
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word: repeatedly apply the best-ranked applicable
    merge (the classic priority loop)."""
    syms = list(word) + [EOW]
    while len(syms) >= 2:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: Iterable[tuple[str, str]],
    *,
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize documents with a trained merge table.

    Arrow ``mapInPandas`` with the (small) merge table closed over;
    distinct words are memoized per batch. Appends ``out_col``
    (array<string>) and ``n_{out_col}`` (int) to the input columns —
    no shuffle, the pass rides the scan.
    """
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    in_schema = docs.schema
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema)
        + f", `{out_col}` array<string>, `n_{out_col}` int"
    )
    cols = [f.name for f in in_schema]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        memo: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            if text is None:
                return []
            norm = re.sub(r"\s+", " ", str(text).lower().strip())
            if not norm:
                return []
            out: list[str] = []
            for w in norm.split(" "):
                toks = memo.get(w)
                if toks is None:
                    toks = _encode_word(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        for pdf in batches:
            toks = pdf[text_col].map(enc)
            res = pdf[cols].copy()
            res[out_col] = toks
            res[f"n_{out_col}"] = toks.map(len).astype("int32")
            yield res

    return spread_scan(docs).mapInPandas(run, schema=out_schema)


def bpe_decode_expr(tokens_col: Column | str) -> Column:
    """Native detokenization: concat tokens, EOW → space, trim.
    Lossless w.r.t. the normalized text (the round-trip contract
    query hash-checks this corpus-wide)."""
    col = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.trim(
        F.replace(F.array_join(col, ""), F.lit(EOW), F.lit(" "))
    )
