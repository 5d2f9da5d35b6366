"""Stream-static LM scoring: a stream of documents scored against a
batch-trained model equals the batch scorer row-for-row."""

from __future__ import annotations

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.lm import score_ngram_lm, train_ngram_lm
from temporal_retriever_spark.streaming import streaming_lm_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    train = _docs(
        spark,
        [(0, "the cat sat"), (1, "the cat ran"), (2, "a cat sat on the mat")],
    )
    score = _docs(
        spark,
        [
            (10, "the cat sat on the mat"),
            (11, "a dog ran"),
            (12, ""),
            (13, "zq xv unseen text"),
        ],
    )
    return train, score


def test_stream_equals_batch(spark, corpus):
    train, score = corpus
    model = train_ngram_lm(train, n=3)

    batch = {
        r["doc_id"]: r for r in score_ngram_lm(score, model, n=3, k=0.5).collect()
    }

    tmp = tempfile.mkdtemp(prefix="trs-lm-stream-")
    half_a, half_b = score.filter("doc_id < 12"), score.filter("doc_id >= 12")
    half_a.write.parquet(f"{tmp}/in/chunk=0")
    half_b.write.parquet(f"{tmp}/in/chunk=1")
    stream = (
        spark.readStream.schema(score.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in/chunk=*")
    )
    scored = streaming_lm_score(stream, model, n=3, k=0.5)
    qname = f"trs_lm_stream_{uuid.uuid4().hex[:8]}"
    q = (
        scored.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None
    got = {r["doc_id"]: r for r in spark.table(qname).collect()}

    assert set(got) == set(batch)
    for doc_id, row in got.items():
        want = batch[doc_id]
        assert row["n_grams"] == want["n_grams"], doc_id
        assert row["logprob_per_token"] == pytest.approx(
            want["logprob_per_token"], rel=1e-12
        ), doc_id
        assert row["perplexity"] == pytest.approx(
            want["perplexity"], rel=1e-12
        ), doc_id


def test_stream_static_join_is_really_streaming(spark, corpus):
    """The scored frame must be a streaming DataFrame (the model join
    must not collapse it to batch)."""
    train, score = corpus
    model = train_ngram_lm(train, n=3)
    tmp = tempfile.mkdtemp(prefix="trs-lm-stream2-")
    score.write.parquet(f"{tmp}/in")
    stream = spark.readStream.schema(score.schema).parquet(f"{tmp}/in")
    scored = streaming_lm_score(stream, model, n=3, k=0.5)
    assert scored.isStreaming
