"""Chunking / sequence-packing / k-per-group sampling / split tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.chunking import chunk_documents, pack_sequences
from temporal_retriever_spark.llm.corpus import sample_k_per_group, train_test_split


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c d e f g h i j", "s1"),
        (2, "one two three", "s1"),
        (3, "", "s1"),
        (4, "   ", "s2"),
        (5, "x " * 50, "s2"),
        (6, "solo", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_chunk_windows_and_overlap(spark, docs):
    out = chunk_documents(docs, chunk_tokens=4, overlap=2).toPandas()
    d1 = out[out.doc_id == 1].sort_values("chunk_id")
    # 10 tokens, stride 2 -> starts 0,2,4,6,8 -> 5 chunks
    assert list(d1.chunk_id) == [0, 1, 2, 3, 4]
    assert list(d1.chunk_text)[:2] == ["a b c d", "c d e f"]
    # final window is short (tokens 8..9)
    assert list(d1.n_tokens) == [4, 4, 4, 4, 2]


def test_chunk_empty_and_blank_docs_dropped(spark, docs):
    out = chunk_documents(docs, chunk_tokens=4).toPandas()
    assert set(out.doc_id) == {1, 2, 5, 6}


def test_chunk_no_overlap_reconstructs(spark, docs):
    out = chunk_documents(docs, chunk_tokens=3, overlap=0)
    tot = out.agg(F.sum("n_tokens")).first()[0]
    want = (
        docs.filter(F.trim("text") != "")
        .select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert tot == want


def test_chunk_min_tokens_and_keep_cols(spark, docs):
    out = chunk_documents(
        docs, chunk_tokens=4, overlap=0, min_tokens=3, keep_cols=("source",)
    ).toPandas()
    assert (out.n_tokens >= 3).all()
    assert set(out.columns) == {"doc_id", "source", "chunk_id", "n_tokens", "chunk_text"}
    assert set(out[out.doc_id == 1].source) == {"s1"}


def test_chunk_validation(spark, docs):
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_pack_concat_contiguous_and_exact(spark, docs):
    cap = 8
    out = pack_sequences(docs, capacity=cap, buckets=2, mode="concat").toPandas()
    assert len(out) == 6
    for _, grp in out.groupby("bucket"):
        grp = grp.sort_values("doc_id")
        pos = 0
        for _, r in grp.iterrows():
            assert r.start_seq == pos // cap
            assert r.start_offset == pos % cap
            end = pos + max(r.n_tokens - 1, 0)
            assert r.end_seq == end // cap
            assert r.is_split == (r.end_seq > r.start_seq)
            pos += r.n_tokens


def test_pack_whole_next_fit_semantics(spark, docs):
    cap = 12
    out = pack_sequences(docs, capacity=cap, buckets=1, mode="whole").toPandas()
    out = out.sort_values("doc_id")
    # reference next-fit over doc_id order
    seq, acc = 0, 0
    for _, r in out.iterrows():
        n = int(r.n_tokens)
        if acc and acc + n > cap:
            seq, acc = seq + 1, 0
        assert (r.seq_id, r.offset) == (seq, acc)
        assert r.overflow == (n > cap)
        acc += n
        if acc >= cap:
            seq, acc = seq + 1, 0
    # no sequence exceeds capacity unless a single doc overflows
    grp = out.groupby("seq_id").agg(tot=("n_tokens", "sum"), ov=("overflow", "any"))
    assert ((grp.tot <= cap) | grp.ov).all()


def test_pack_n_tokens_col_override(spark, docs):
    pre = docs.withColumn("ntok", F.lit(5))
    out = pack_sequences(
        pre, capacity=10, buckets=1, mode="concat", n_tokens_col="ntok"
    ).toPandas()
    assert (out.n_tokens == 5).all()
    assert sorted(out.start_offset.unique()) == [0, 5]


def test_pack_validation(spark, docs):
    with pytest.raises(ValueError, match="mode"):
        pack_sequences(docs, mode="greedy")
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(docs, capacity=0)


def test_sample_k_exact_counts_and_determinism(spark, docs):
    out = sample_k_per_group(docs, 2, keep_rank=True).toPandas()
    counts = out.groupby("source").size()
    assert (counts == 2).all()
    again = sample_k_per_group(docs, 2, keep_rank=True).toPandas()
    assert sorted(out.doc_id) == sorted(again.doc_id)
    # k >= group size keeps everything
    assert len(sample_k_per_group(docs, 99).toPandas()) == 6
    with pytest.raises(ValueError, match="k"):
        sample_k_per_group(docs, 0)


def test_sample_k_append_only_stable(spark, docs):
    """Ids already in the top-k stay sampled when k grows."""
    k2 = set(sample_k_per_group(docs, 2).toPandas().doc_id)
    k3 = set(sample_k_per_group(docs, 3).toPandas().doc_id)
    assert k2 <= k3


def test_train_test_split_assignment(spark, docs):
    out = train_test_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).toPandas()
    assert set(out.split) <= {"train", "val", "test"}
    assert len(out) == 6
    # deterministic: same assignment on re-run and under repartition
    re = (
        train_test_split(
            docs.repartition(4), {"train": 0.8, "val": 0.1, "test": 0.1}
        )
        .toPandas()
        .set_index("doc_id")
        .split.sort_index()
    )
    assert (out.set_index("doc_id").split.sort_index() == re).all()
    with pytest.raises(ValueError, match="sum"):
        train_test_split(docs, {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError, match="non-empty"):
        train_test_split(docs, {})
