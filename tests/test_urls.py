"""URL/domain ops: extraction edges, eTLD+1, caps, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.urls import (
    domain_cap,
    domain_counts,
    host_expr,
    registrable_domain_expr,
)


def _hosts(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["h"] for r in df.select(host_expr("url").alias("h")).collect()]


class TestHost:
    def test_extraction_edges(self, spark):
        got = _hosts(
            spark,
            [
                "http://example.com/path",
                "https://Sub.Example.COM:8443/x?q=1",
                "https://user:pw@secret.example.org/p#frag",
                "ftp://files.example.net",
                "not a url",
                "/relative/path",
                "mailto:someone@example.com",
            ],
        )
        assert got == [
            "example.com",
            "sub.example.com",
            "secret.example.org",
            "files.example.net",
            None,
            None,
            None,  # mailto has no ://
        ]

    def test_registrable_domain(self, spark):
        cases = [
            ("www.example.com", "example.com"),
            ("a.b.c.example.com", "example.com"),
            ("news.bbc.co.uk", "bbc.co.uk"),
            ("bbc.co.uk", "bbc.co.uk"),
            ("co.uk", "co.uk"),  # bare suffix: nothing above it
            ("example.com.au", "example.com.au"),
            ("localhost", "localhost"),
        ]
        df = spark.createDataFrame(cases, "host string, want string")
        rows = df.select(
            registrable_domain_expr(F.col("host")).alias("got"), "want", "host"
        ).collect()
        for r in rows:
            assert r["got"] == r["want"], r["host"]


class TestCounts:
    def test_counts_group_by_registrable(self, spark):
        urls = [
            (1, "http://a.example.com/1"),
            (2, "http://b.example.com/2"),
            (3, "http://example.com/3"),
            (4, "http://other.org/4"),
            (5, "garbage"),
        ]
        df = spark.createDataFrame(urls, "doc_id long, url string")
        got = {r["domain"]: r["n_docs"] for r in domain_counts(df).collect()}
        assert got == {"example.com": 3, "other.org": 1}


class TestCap:
    @pytest.fixture()
    def crawl(self, spark):
        rows = [(i, f"http://big.example.com/p{i}") for i in range(50)] + [
            (100 + i, f"http://small.org/p{i}") for i in range(3)
        ]
        return spark.createDataFrame(rows, "doc_id long, url string")

    def test_cap_counts(self, spark, crawl):
        out = domain_cap(crawl, max_per_domain=10)
        got = (
            out.groupBy("domain").agg(F.count("*").alias("n")).collect()
        )
        counts = {r["domain"]: r["n"] for r in got}
        assert counts == {"example.com": 10, "small.org": 3}

    def test_deterministic_and_salt_sensitive(self, spark, crawl):
        a = {r["doc_id"] for r in domain_cap(crawl, max_per_domain=10).collect()}
        b = {r["doc_id"] for r in domain_cap(crawl, max_per_domain=10).collect()}
        c = {
            r["doc_id"]
            for r in domain_cap(crawl, max_per_domain=10, salt="v2").collect()
        }
        assert a == b
        assert a != c  # different salt, different kept sample
        # not simply the lowest ids (crawl-order bias would keep 0..9)
        assert a - set(range(10)) != set()

    def test_validation(self, spark, crawl):
        with pytest.raises(ValueError, match="max_per_domain"):
            domain_cap(crawl, max_per_domain=0)

    def test_pre_shuffle_window_group_limit(self, spark, crawl):
        plan = (
            domain_cap(crawl, max_per_domain=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan, plan
        assert "Python" not in plan
