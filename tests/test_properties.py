"""Property-based tests (hypothesis) for bucketing/parsing invariants."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st

from temporal_retriever_spark.grains import bucket_expr, normalize_grain

TS = st.datetimes(
    min_value=datetime.datetime(1980, 1, 5),
    max_value=datetime.datetime(2100, 12, 20),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(TS, min_size=1, max_size=30))
def test_bucket_label_invariants(spark, tss):
    df = spark.createDataFrame([(t,) for t in tss], "ts timestamp")
    rows = df.select(
        "ts",
        bucket_expr("ts", "D").alias("d"),
        bucket_expr("ts", "W").alias("w"),
        bucket_expr("ts", "M").alias("m"),
        bucket_expr("ts", "H").alias("h"),
        bucket_expr("ts", "min").alias("mi"),
    ).collect()
    for r in rows:
        ts, d, w, m = r["ts"], r["d"], r["w"], r["m"]
        assert d == ts.date()
        # W: Sunday on/after the date, within 6 days
        assert w.isoweekday() == 7
        assert 0 <= (w - ts.date()).days <= 6
        # M: last day of the same month
        assert m.month == ts.month and m.year == ts.year
        assert (m + datetime.timedelta(days=1)).day == 1
        # H/min: floors within grain width
        assert r["h"] <= ts and (ts - r["h"]).total_seconds() < 3600
        assert r["mi"] <= ts and (ts - r["mi"]).total_seconds() < 60


@settings(max_examples=5, deadline=None)
@given(st.lists(TS, min_size=1, max_size=20))
def test_parse_iso_roundtrip(spark, tss):
    from temporal_retriever_spark.timeparse import parse_timestamp

    tss = [t.replace(microsecond=0) for t in tss]
    df = spark.createDataFrame(
        [(t.strftime("%Y-%m-%dT%H:%M:%SZ"),) for t in tss], "s string"
    )
    got = [r[0] for r in df.select(parse_timestamp("s")).collect()]
    assert got == tss


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=8))
def test_normalize_grain_total(s):
    # every input either raises ValueError or returns a canonical grain
    try:
        out = normalize_grain(s)
        assert out in ("D", "W", "M", "H", "min")
    except ValueError:
        pass


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(TS, st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=2,
        max_size=40,
    )
)
def test_bucket_aggregate_conserves_sum(spark, rows):
    from temporal_retriever_spark.aggregate import bucket_aggregate

    df = spark.createDataFrame(rows, "ds timestamp, y double")
    total = sum(v for _, v in rows)
    for grain in ("D", "W", "M"):
        agged = bucket_aggregate(df, grain=grain, agg="sum")
        got = sum(r["y"] for r in agged.collect())
        assert abs(got - total) < 1e-6 * max(1.0, abs(total))


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab c"), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(2, 8),
    st.integers(0, 3),
)
def test_chunking_covers_every_token_exactly(spark, texts, chunk_tokens, overlap):
    """Non-overlap chunks partition the token stream; overlap chunks
    cover every token at least once and starts advance by the stride."""
    from temporal_retriever_spark.llm.chunking import chunk_documents

    overlap = min(overlap, chunk_tokens - 1)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = chunk_documents(
        df, chunk_tokens=chunk_tokens, overlap=overlap
    ).toPandas()
    import re

    for i, t in enumerate(texts):
        toks = re.split(r"\s+", t.strip()) if t.strip() else []
        chunks = out[out.doc_id == i].sort_values("chunk_id")
        if not toks:
            assert len(chunks) == 0
            continue
        stride = chunk_tokens - overlap
        # reconstruct: chunk j covers tokens [j*stride, j*stride+chunk_tokens)
        seen = set()
        for _, row in chunks.iterrows():
            start = row.chunk_id * stride
            got = row.chunk_text.split(" ") if row.chunk_text else []
            assert got == toks[start : start + chunk_tokens]
            seen.update(range(start, min(start + chunk_tokens, len(toks))))
        assert seen == set(range(len(toks)))


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=30),
    st.integers(1, 40),
    st.integers(1, 4),
)
def test_packing_concat_is_gapless(spark, lengths, capacity, buckets):
    """Concat packing lays tokens contiguously: within each bucket the
    next doc starts exactly where the previous ended."""
    from temporal_retriever_spark.llm.chunking import pack_sequences

    rows = [(i, "w " * n, n) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id long, text string, ntok long")
    out = pack_sequences(
        df, capacity=capacity, buckets=buckets, mode="concat", n_tokens_col="ntok"
    ).toPandas()
    assert len(out) == len(lengths)
    for _, grp in out.groupby("bucket"):
        pos = 0
        for _, r in grp.sort_values("doc_id").iterrows():
            assert r.start_seq * capacity + r.start_offset == pos
            end = pos + max(int(r.n_tokens) - 1, 0)
            assert r.end_seq == end // capacity
            pos += int(r.n_tokens)


@settings(max_examples=4, deadline=None)
@given(st.integers(min_value=2, max_value=5))
def test_hilbert_bijective_and_adjacent_any_order(spark, bits):
    """The Hilbert fold is a bijection on every 2^b × 2^b grid and
    consecutive indexes are Manhattan-adjacent — at ANY bit depth,
    not just the unit-tested one."""
    import pyspark.sql.functions as F

    from temporal_retriever_spark.sources.layout import hilbert_expr

    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    d = spark.createDataFrame(rows, "x long, y long").withColumn(
        "h", hilbert_expr(F.col("x"), F.col("y"), bits=bits)
    )
    got = {(r["x"], r["y"]): r["h"] for r in d.collect()}
    assert sorted(got.values()) == list(range(n * n))
    inv = {v: k for k, v in got.items()}
    assert all(
        abs(inv[i][0] - inv[i + 1][0]) + abs(inv[i][1] - inv[i + 1][1]) == 1
        for i in range(n * n - 1)
    )


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.sampled_from("abcde")),
        min_size=5,
        max_size=60,
    )
)
def test_association_rule_invariants(spark, rows):
    """Apriori laws hold on arbitrary baskets: pair support ≤ either
    member's support, confidence ∈ (0, 1], lift symmetric across the
    two orientations of a pair, and support consistent with counts."""
    import math

    from temporal_retriever_spark.basket import (
        association_rules,
        frequent_itemsets,
    )

    df = spark.createDataFrame(rows, "basket int, item string")
    sets = frequent_itemsets(
        df, basket_col="basket", item_col="item", min_support=0.05
    ).collect()
    singles = {
        r["item_a"]: r["support"] for r in sets if r["size"] == 1
    }
    for r in sets:
        if r["size"] == 2:
            assert r["support"] <= singles[r["item_a"]] + 1e-12
            assert r["support"] <= singles[r["item_b"]] + 1e-12
    rules = association_rules(
        df, basket_col="basket", item_col="item", min_support=0.05
    ).collect()
    lifts = {}
    for r in rules:
        assert 0.0 < r["confidence"] <= 1.0 + 1e-12
        key = tuple(sorted((r["antecedent"], r["consequent"])))
        lifts.setdefault(key, []).append(r["lift"])
    for key, ls in lifts.items():
        assert len(ls) == 2
        assert math.isclose(ls[0], ls[1], rel_tol=1e-9)
