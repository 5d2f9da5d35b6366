"""Document chunking and sequence packing for training-data builds.

The two operators that turn a cleaned corpus into model-ready inputs:

* ``chunk_documents`` — split each document into overlapping
  fixed-size token windows (the RAG / embedding-index and
  long-doc-splitting primitive).
* ``pack_sequences`` — lay documents end-to-end into fixed-capacity
  training sequences (the pre-training batch-packing primitive), in
  either the GPT-style concatenate-and-cut semantic (documents may
  straddle sequence boundaries) or the whole-document next-fit
  semantic (documents never split; sequences may have slack).

Scale shape: chunking is a narrow explode — zero shuffles, chunk rows
are produced partition-locally from the parent document row, and the
token arrays never leave the row they came from. Packing shuffles one
small row per document (id + token count — never text) into hash
buckets; each bucket packs independently, so parallelism is the bucket
count and the cross-bucket boundary error is at most one partial
sequence per bucket — the standard sharded-packing trade every
distributed pipeline makes. Concat-mode packing is a pure window
cumsum (whole-stage codegen, no Python); whole-mode is a per-bucket
Arrow-batched pandas pass because next-fit's reset-at-capacity
recursion has no closed window form.

No reference analog (extension surface, SURVEY §2.10 north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["chunk_documents", "pack_sequences"]


def _token_array(text_col: str) -> F.Column:
    """Whitespace tokens as an array; empty/blank text -> empty array."""
    trimmed = F.trim(F.col(text_col))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def chunk_documents(
    df: DataFrame,
    *,
    chunk_tokens: int = 128,
    overlap: int = 0,
    min_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Overlapping fixed-size token-window chunks per document.

    Windows start every ``chunk_tokens - overlap`` tokens and span up
    to ``chunk_tokens``; the final window is short when the document
    doesn't divide evenly, and windows under ``min_tokens`` are
    dropped (a tail window fully covered by its predecessor carries no
    new signal). Output: ``id_col``, ``chunk_id`` (0-based),
    ``n_tokens``, ``chunk_text`` plus any ``keep_cols`` copied from
    the parent row.

    Plan shape: tokenize -> sequence of window starts -> posexplode ->
    slice + array_join, all native expressions on the parent row — a
    narrow explode with zero shuffles and no Python.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1: {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens): {overlap} vs {chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    toks = _token_array(text_col)
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        toks.alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    # window starts 0, stride, 2*stride, ... <= n-1 (empty docs -> no chunks)
    starts = F.when(F.col("_n") > 0, F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride)))
    chunked = (
        base.withColumn("_starts", starts)
        .select(
            id_col,
            *keep_cols,
            "_toks",
            F.posexplode("_starts").alias("chunk_id", "_start"),
        )
        .withColumn("_chunk", F.slice("_toks", F.col("_start") + 1, chunk_tokens))
        .withColumn("n_tokens", F.size("_chunk"))
        .filter(F.col("n_tokens") >= min_tokens)
        .withColumn("chunk_text", F.array_join("_chunk", " "))
    )
    return chunked.select(id_col, *keep_cols, "chunk_id", "n_tokens", "chunk_text")


def pack_sequences(
    df: DataFrame,
    *,
    capacity: int = 2048,
    buckets: int = 64,
    mode: str = "concat",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Assign documents to fixed-capacity training sequences.

    Documents are hash-sharded into ``buckets`` independent packing
    domains (md5 of the id — deterministic, engine-portable), then
    packed inside each bucket in ``id_col`` order:

    * ``mode="concat"`` (GPT-style): the bucket's token stream is laid
      end-to-end and cut every ``capacity`` tokens; a document may
      straddle a boundary. Output per document: ``bucket``,
      ``n_tokens``, ``start_seq``/``start_offset`` (sequence index and
      position where the document begins), ``end_seq``, and
      ``is_split`` (true when it crosses a cut). Closed-form: one
      window cumsum per bucket — a single hash-partition shuffle of
      (id, count) rows, whole-stage codegen, no Python.
    * ``mode="whole"``: next-fit packing — documents never split; a
      new sequence starts whenever the running total would exceed
      ``capacity``. Documents longer than ``capacity`` get a sequence
      of their own (truncation is the caller's policy, flagged via
      ``overflow``). Output: ``bucket``, ``n_tokens``, ``seq_id``,
      ``offset``, ``overflow``. The reset-at-capacity recursion has no
      closed window form, so each bucket runs one Arrow-batched pandas
      pass over (id, count) pairs — token counts only, never text.

    At 100 TB: the shuffle carries two longs per document; per-bucket
    state is the bucket's (id, count) list, bounded by choosing
    ``buckets`` so corpus_docs / buckets fits an executor — identical
    sizing model to the IVF cell scan. Packing quality loss vs a
    global pack is at most one partial sequence per bucket.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1: {capacity}")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1: {buckets}")
    if mode not in ("concat", "whole"):
        raise ValueError(f"mode must be 'concat' or 'whole': {mode!r}")

    if n_tokens_col is None:
        n = F.size(_token_array(text_col))
    else:
        n = F.col(n_tokens_col).cast("long")
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long"), F.lit(buckets)
    )
    slim = df.select(
        F.col(id_col),
        bucket.alias("bucket"),
        n.alias("n_tokens"),
    )

    if mode == "concat":
        w = (
            Window.partitionBy("bucket")
            .orderBy(F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = F.sum("n_tokens").over(w)
        out = slim.withColumn("_cum", cum).select(
            id_col,
            "bucket",
            "n_tokens",
            F.floor((F.col("_cum") - F.col("n_tokens")) / capacity).alias("start_seq"),
            F.pmod(F.col("_cum") - F.col("n_tokens"), F.lit(capacity)).alias(
                "start_offset"
            ),
            F.floor(
                F.greatest(F.col("_cum") - 1, F.col("_cum") - F.col("n_tokens"))
                / capacity
            ).alias("end_seq"),
        )
        return out.withColumn(
            "is_split", F.col("end_seq") > F.col("start_seq")
        )

    # mode == "whole": next-fit per bucket via one grouped pandas pass
    import pandas as pd

    # id field keeps the INPUT column's type (string UUIDs are as
    # common as numeric ids; hardcoding long would crash in Arrow)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, bucket long, n_tokens long, "
        "seq_id long, offset long, overflow boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        seq_ids, offsets, overflows = [], [], []
        seq, acc = 0, 0
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            if acc and acc + tok > capacity:
                seq += 1
                acc = 0
            seq_ids.append(seq)
            offsets.append(acc)
            overflows.append(tok > capacity)
            acc += tok
            if acc >= capacity:
                seq += 1
                acc = 0
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "bucket": pdf["bucket"].to_numpy(),
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "seq_id": seq_ids,
                "offset": offsets,
                "overflow": overflows,
            }
        )

    return slim.groupBy("bucket").applyInPandas(pack, out_schema)
