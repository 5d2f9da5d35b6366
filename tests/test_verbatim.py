"""Exact-substring (verbatim span) dedup: rolling-window hashing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.dedup import (
    verbatim_span_pairs,
    verbatim_window_hashes,
)

SPAN = " ".join(f"tok{i}" for i in range(20))  # a 20-token span


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_span_detected_and_counted(spark):
    # doc 1 and 2 share a 22-token verbatim run (SPAN + 2 extra tokens)
    run = SPAN + " extra1 extra2"
    docs = _docs(
        spark,
        [
            (1, "intro words here " + run + " tail one"),
            (2, "different opening " + run + " other ending"),
            (3, "completely unrelated text with many different tokens"),
        ],
    )
    pairs = verbatim_span_pairs(docs, window_tokens=20).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["left_id"], p["right_id"]) == (1, 2)
    # 22-token run -> 22-20+1 = 3 shared windows at stride 1
    assert p["n_shared_windows"] == 3


def test_short_doc_contained_whole(spark):
    docs = _docs(
        spark,
        [
            (1, "long document starts " + SPAN + " and continues onward"),
            (2, SPAN),  # shorter than.. exactly 20 tokens
            (3, "tiny doc"),  # < window -> whole-doc window, no match
        ],
    )
    pairs = {
        (r["left_id"], r["right_id"])
        for r in verbatim_span_pairs(docs, window_tokens=20).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_max_df_drops_boilerplate(spark):
    rows = [(i, f"unique{i} " + SPAN) for i in range(5)]
    docs = _docs(spark, rows)
    all_pairs = verbatim_span_pairs(docs, window_tokens=20, max_df=1000)
    assert all_pairs.count() == 10  # 5 choose 2
    gated = verbatim_span_pairs(docs, window_tokens=20, max_df=4)
    assert gated.count() == 0  # the span appears in 5 > 4 docs


def test_stride_reduces_windows(spark):
    docs = _docs(spark, [(1, SPAN + " a b c d")])
    n1 = verbatim_window_hashes(docs, window_tokens=20, stride=1).count()
    n2 = verbatim_window_hashes(docs, window_tokens=20, stride=2).count()
    assert n1 == 5 and n2 == 3


def test_md5_and_xxhash_agree_on_pairs(spark):
    docs = _docs(
        spark,
        [(1, "x " + SPAN), (2, "y " + SPAN), (3, "z nothing shared here at all")],
    )
    a = {
        (r["left_id"], r["right_id"], r["n_shared_windows"])
        for r in verbatim_span_pairs(docs, window_tokens=20).collect()
    }
    b = {
        (r["left_id"], r["right_id"], r["n_shared_windows"])
        for r in verbatim_span_pairs(
            docs, window_tokens=20, hash_fn="md5"
        ).collect()
    }
    assert a == b and len(a) == 1


def test_normalization_case_and_whitespace(spark):
    docs = _docs(spark, [(1, SPAN.upper()), (2, "  " + SPAN.replace(" ", "   "))])
    assert verbatim_span_pairs(docs, window_tokens=20).count() == 1


def test_validation(spark):
    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        verbatim_window_hashes(docs, window_tokens=1)
    with pytest.raises(ValueError):
        verbatim_window_hashes(docs, stride=0)
    with pytest.raises(ValueError):
        verbatim_window_hashes(docs, hash_fn="sha1")
