"""Real BPE: hand-checked merges, driver==distributed training parity,
encode parity vs an independent reference, lossless round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.bpe import (
    EOW,
    bpe_decode_expr,
    bpe_encode,
    bpe_train,
    merges_to_frame,
    word_freq_table,
)

CORPUS = "low low low low low lower lower newest newest newest widest"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# -- independent naive reference (no module helpers) ------------------------

def _ref_train(texts, num_merges):
    vocab = {}
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    words = {w: list(w) + [EOW] for w in vocab}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + vocab[w]
        if not counts:
            break
        top = max(counts.values())
        pair = min(p for p, c in counts.items() if c == top)
        merges.append(pair)
        a, b = pair
        for w, syms in words.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            words[w] = out
    return merges


def _ref_encode(text, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    norm = " ".join((text or "").lower().split())
    out = []
    for w in norm.split(" ") if norm else []:
        syms = list(w) + [EOW]
        while len(syms) >= 2:
            cand = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not cand:
                break
            _, i = min(cand)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        out.extend(syms)
    return out


def test_train_matches_reference(spark):
    texts = [CORPUS, "new lower low"]
    got = bpe_train(_docs(spark, texts), num_merges=8)
    assert got == _ref_train(texts, 8)
    assert len(got) == 8


def test_first_merge_is_hand_checkable(spark):
    # "aa aa ab": pairs (a,a)x2+(a,EOW)... most frequent first merge
    # over words {aa:2, ab:1}: (a,a)->2, (a,</w>)->1(from aa? no:
    # aa = [a,a,</w>] pairs (a,a),(a,</w>) x2; ab adds (a,b),(b,</w>)
    # → (a,a)=2, (a,</w>)=2 tie → lexicographic min is (a,</w>)?
    # '<' (0x3c) sorts before 'a' → pair ("a","</w>") < ("a","a")
    got = bpe_train(_docs(spark, ["aa aa ab"]), num_merges=1)
    assert got == [("a", EOW)]


def test_distributed_equals_driver_path(spark):
    texts = [CORPUS, "wider new newest low"]
    fast = bpe_train(_docs(spark, texts), num_merges=6)
    dist = bpe_train(
        _docs(spark, texts), num_merges=6, driver_threshold_rows=0
    )
    assert fast == dist


def test_encode_matches_reference_and_counts(spark):
    texts = [CORPUS, "lowest newest low unknown zz", "", None]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(docs, num_merges=10)
    out = {
        r["doc_id"]: r for r in bpe_encode(docs, merges).collect()
    }
    for i, t in enumerate(texts):
        want = _ref_encode(t, merges)
        assert list(out[i]["tokens"]) == want, (i, t)
        assert out[i]["n_tokens"] == len(want)


def test_roundtrip_lossless(spark):
    texts = [CORPUS, "Mixed   CASE  And\nNewlines", "solo"]
    docs = _docs(spark, texts)
    merges = bpe_train(docs, num_merges=12)
    enc = bpe_encode(docs, merges)
    got = enc.select(
        "doc_id", bpe_decode_expr("tokens").alias("rt")
    ).collect()
    for r in got:
        norm = " ".join(texts[r["doc_id"]].lower().split())
        assert r["rt"] == norm


def test_zero_merges_yields_chars(spark):
    docs = _docs(spark, ["ab"])
    out = bpe_encode(docs, []).collect()[0]
    assert list(out["tokens"]) == ["a", "b", EOW]


def test_merges_frame_roundtrip(spark):
    merges = [("a", "b"), ("ab", EOW)]
    mf = merges_to_frame(spark, merges)
    back = [
        (r["left"], r["right"])
        for r in mf.orderBy("rank").collect()
    ]
    assert back == merges


def test_word_freq_table(spark):
    wf = {
        r["word"]: r["cnt"]
        for r in word_freq_table(_docs(spark, ["a b  a", "B a"])).collect()
    }
    assert wf == {"a": 3, "b": 2}


def test_validation(spark):
    with pytest.raises(ValueError):
        bpe_train(_docs(spark, ["x"]), num_merges=-1)
