"""HTML extraction: content fidelity, subtree drops, entities, plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from temporal_retriever_spark.llm.html import (
    html_links_expr,
    html_title_expr,
    html_to_text,
)

PAGE = (
    "<!DOCTYPE html><html><head><title>My &amp; Page</title>"
    "<style>body { color: red }</style></head>"
    "<body><SCRIPT type='text/javascript'>var x = '<p>not text</p>';</SCRIPT>"
    "<h1>Header</h1><p>First &lt;para&gt; with &quot;quotes&quot;.</p>"
    "<div>Second\tline</div>"
    "<ul><li>alpha</li><li>beta</li></ul>"
    "<!-- a comment with <p>markup</p> inside -->"
    "<p>Link to <a href=\"http://a.example/x\">a page</a> and "
    "<a href='http://b.example/y?q=1'>another</a>.</p></body></html>"
)


def _extract(spark, html):
    df = spark.createDataFrame([(0, html)], "id long, html string")
    return html_to_text(df, links_col="links").collect()[0]


class TestExtraction:
    def test_text_content(self, spark):
        row = _extract(spark, PAGE)
        lines = row["text"].split("\n")
        assert "Header" in lines
        assert 'First <para> with "quotes".' in lines
        assert "Second line" in lines
        assert "alpha" in lines and "beta" in lines
        # script/style/comment/head content never leaks
        assert "color" not in row["text"]
        assert "not text" not in row["text"]
        assert "comment" not in row["text"]
        assert "My & Page" not in row["text"]  # head dropped entirely

    def test_title_and_links(self, spark):
        row = _extract(spark, PAGE)
        assert row["title"] == "My & Page"
        assert row["links"] == [
            "http://a.example/x",
            "http://b.example/y?q=1",
        ]

    def test_no_title_no_links(self, spark):
        row = _extract(spark, "<p>just text</p>")
        assert row["text"] == "just text"
        assert row["title"] == ""
        assert row["links"] == []

    def test_plain_text_passthrough(self, spark):
        row = _extract(spark, "no markup at all")
        assert row["text"] == "no markup at all"

    def test_inline_tags_do_not_split_words(self, spark):
        row = _extract(spark, "<p>ab<b>cd</b>ef</p>")
        # inline tag -> space, never glued line-break
        assert row["text"] == "ab cd ef"

    def test_multiline_script(self, spark):
        html = "<p>keep</p><script>\nline1\nline2\n</script><p>also</p>"
        row = _extract(spark, html)
        assert "line1" not in row["text"]
        assert "keep" in row["text"] and "also" in row["text"]

    def test_whitespace_collapse(self, spark):
        row = _extract(spark, "<p>a   b</p>\n\n\n<p>c</p>")
        assert row["text"] == "a b\nc"


class TestPlan:
    def test_native_no_shuffle(self, spark):
        df = spark.createDataFrame([(0, PAGE)], "id long, html string")
        plan = (
            html_to_text(df, links_col="links")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan and "ArrowEval" not in plan

    def test_title_and_links_exprs_standalone(self, spark):
        df = spark.createDataFrame([(0, PAGE)], "id long, html string")
        row = df.select(
            html_title_expr("html").alias("t"),
            F.size(html_links_expr("html")).alias("n"),
        ).collect()[0]
        assert row["t"] == "My & Page" and row["n"] == 2
