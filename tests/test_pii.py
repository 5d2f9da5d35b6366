"""PII detection / redaction: hand-built fixtures, Luhn math, plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.pii import (
    PII_PATTERNS,
    PII_TOKENS,
    luhn_valid_expr,
    pii_counts,
    pii_redact,
)


def _luhn_ref(s: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return len(s) > 0 and total % 10 == 0


class TestLuhn:
    @pytest.mark.parametrize(
        "num",
        [
            "4532015112830366",  # valid Visa test number
            "4111111111111111",  # valid
            "1234567812345678",  # invalid
            "79927398713",  # the canonical Luhn example, valid
            "79927398710",  # same digits, bad check digit
            "0000000000000",  # valid (all zeros)
        ],
    )
    def test_matches_reference(self, spark, num):
        got = (
            spark.range(1)
            .select(luhn_valid_expr(F.lit(num)).alias("ok"))
            .collect()[0]["ok"]
        )
        assert got == _luhn_ref(num), num

    def test_null_and_empty_are_false(self, spark):
        row = spark.range(1).select(
            luhn_valid_expr(F.lit(None).cast("string")).alias("a"),
            luhn_valid_expr(F.lit("")).alias("b"),
        ).collect()[0]
        assert row["a"] is False and row["b"] is False


SAMPLE = (
    "Reach me at jane.doe+spam@example.co.uk or (555) 867-5309. "
    "Server 192.168.1.77 logged SSN 123-45-6789 and card "
    "4532015112830366; order id 1234567812345678 is not a card."
)


class TestCounts:
    def test_sample_counts(self, spark):
        df = spark.createDataFrame([(0, SAMPLE)], "id long, text string")
        row = pii_counts(df).collect()[0]
        assert row["pii_email"] == 1
        assert row["pii_phone"] == 1
        assert row["pii_ipv4"] == 1
        assert row["pii_ssn"] == 1
        assert row["pii_card"] == 2  # both 16-digit runs are candidates
        assert row["pii_cards_valid"] == 1  # only the Luhn-valid one
        # total counts valid cards, not candidates
        assert row["pii_total"] == 1 + 1 + 1 + 1 + 1

    def test_clean_text_is_all_zero(self, spark):
        df = spark.createDataFrame(
            [(0, "perfectly ordinary prose with numbers 12 345")],
            "id long, text string",
        )
        row = pii_counts(df).collect()[0]
        assert row["pii_total"] == 0
        assert all(
            row[f"pii_{k}"] == 0 for k in PII_PATTERNS
        ), row.asDict()

    def test_ssn_not_double_counted_as_phone(self, spark):
        # 3-2-4 grouping is an SSN, not a phone (3-3-4)
        df = spark.createDataFrame(
            [(0, "ssn 123-45-6789 only")], "id long, text string"
        )
        row = pii_counts(df).collect()[0]
        assert row["pii_ssn"] == 1 and row["pii_phone"] == 0


class TestRedact:
    def test_sample_redaction(self, spark):
        df = spark.createDataFrame([(0, SAMPLE)], "id long, text string")
        red = pii_redact(df, out_col="clean").collect()[0]["clean"]
        for token in PII_TOKENS.values():
            assert token in red, (token, red)
        assert "example.co.uk" not in red
        assert "867-5309" not in red
        assert "192.168.1.77" not in red
        assert "123-45-6789" not in red
        assert "4532015112830366" not in red
        # conservative: the Luhn-INVALID candidate is masked too
        assert "1234567812345678" not in red
        # surrounding prose survives
        assert "Reach me at" in red and "is not a card" in red

    def test_kind_subset(self, spark):
        df = spark.createDataFrame([(0, SAMPLE)], "id long, text string")
        red = pii_redact(df, out_col="clean", kinds=["email"]).collect()[0][
            "clean"
        ]
        assert "[EMAIL]" in red and "[PHONE]" not in red
        assert "867-5309" in red  # untouched kinds stay

    def test_unknown_kind_raises(self, spark):
        df = spark.createDataFrame([(0, "x")], "id long, text string")
        with pytest.raises(ValueError, match="unknown PII kinds"):
            pii_redact(df, kinds=["passport"])

    def test_idempotent(self, spark):
        df = spark.createDataFrame([(0, SAMPLE)], "id long, text string")
        once = pii_redact(df, out_col="clean")
        twice = pii_redact(once, text_col="clean", out_col="clean")
        a = once.collect()[0]["clean"]
        b = twice.collect()[0]["clean"]
        assert a == b


class TestPlan:
    def test_no_shuffle_no_python(self, spark):
        df = spark.createDataFrame([(0, SAMPLE)], "id long, text string")
        plan = (
            pii_redact(pii_counts(df), out_col="clean")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan and "ArrowEval" not in plan
