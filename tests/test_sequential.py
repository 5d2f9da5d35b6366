"""Sequential pattern mining: hand-computed supports, strictness,
min_support threshold, frequent-item cap."""

from __future__ import annotations

import datetime as dt

import pytest

from temporal_retriever_spark.funnel import sequential_patterns


def _events(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (u, base + dt.timedelta(hours=h), it) for (u, h, it) in rows
    ]
    return spark.createDataFrame(data, ["user_id", "ts", "event_type"])


@pytest.fixture(scope="module")
def ev(spark):
    # u1: a@1 b@2 c@3 ; u2: b@1 a@2 c@3 ; u3: a@1 a@2
    return _events(
        spark,
        [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "c"),
            (2, 1, "b"), (2, 2, "a"), (2, 3, "c"),
            (3, 1, "a"), (3, 2, "a"),
        ],
    )


def _support(df):
    return {r.pattern: r.support_count for r in df.collect()}


def test_hand_computed_supports(spark, ev):
    got = _support(sequential_patterns(ev))
    assert got == {
        "a": 3, "b": 2, "c": 2,
        "a>b": 1, "b>a": 1, "a>c": 2, "b>c": 2, "a>a": 1,
        "a>b>c": 1, "b>a>c": 1,
    }


def test_strict_ordering_no_self_support(spark):
    # a single event never supports a>a; simultaneous a,b support neither
    df = _events(spark, [(1, 1, "a"), (2, 1, "a"), (2, 1, "b")])
    got = _support(sequential_patterns(df))
    assert got == {"a": 2, "b": 1}


def test_min_support_threshold(spark, ev):
    got = _support(sequential_patterns(ev, min_support=0.5))
    # n_users=3, threshold=ceil(1.5)=2
    assert got == {"a": 3, "b": 2, "c": 2, "a>c": 2, "b>c": 2}


def test_support_frac(spark, ev):
    rows = {r.pattern: r.support_frac for r in sequential_patterns(ev).collect()}
    assert rows["a"] == pytest.approx(1.0)
    assert rows["a>b>c"] == pytest.approx(1 / 3)


def test_max_items_cap(spark, ev):
    got = _support(sequential_patterns(ev, max_items=1))
    # 'a' has the highest user support (3) -> only a-patterns survive
    assert got == {"a": 3, "a>a": 1}


def test_max_len_and_validation(spark, ev):
    got = _support(sequential_patterns(ev, max_len=1))
    assert got == {"a": 3, "b": 2, "c": 2}
    with pytest.raises(ValueError):
        sequential_patterns(ev, max_len=4)
    with pytest.raises(ValueError):
        sequential_patterns(ev, max_items=0)
