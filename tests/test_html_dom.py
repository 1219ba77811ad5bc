"""DOM-parser upgrade seam for HTML extraction (VERDICT r10 ask #7).

``html_to_text`` (layered regex, whole-stage codegen, the t63 oracle
gate) and ``html_to_text_dom`` (stdlib html.parser via mapInPandas, the
wild-HTML quality path) must agree byte-for-byte on well-formed input —
and the DOM path must be the BETTER one on the malformed shapes the
regex provably mishandles."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.training.text import html_to_text, html_to_text_dom

from .conftest import SF_SMOKE


def _docs(spark, n=200):
    return (
        spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
        .select("doc_id", "text")
        .limit(n)
    )


def test_dom_matches_regex_on_corpus_scaffold(spark):
    """The t63 scaffold (head with style+script, headings, paragraphs,
    comment, the six common entities) over real corpus documents: both
    extractors must produce IDENTICAL text."""
    docs = _docs(spark)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.lit(
                "<html><head><style>p {color: red}</style>"
                "<script type='text/javascript'>var x = 1 < 2;</script></head><body>"
            ),
            F.lit("<h1>Title "),
            F.col("doc_id").cast("string"),
            F.lit("</h1><!-- hidden comment --><p>"),
            F.col("text"),
            F.lit("</p>"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("<ul><li>alpha &amp; beta</li><li>&quot;quoted&quot;</li></ul>"),
            ).otherwise(F.lit("<div>plain &lt;tail&gt; block</div>")),
            F.lit("<br/>footer&nbsp;line</body></html>"),
        ).alias("html"),
    )
    regex = html_to_text(aug).select("doc_id", F.col("text").alias("t_regex"))
    dom = html_to_text_dom(aug).select("doc_id", F.col("text").alias("t_dom"))
    diff = (
        regex.join(dom, "doc_id")
        .where(F.col("t_regex") != F.col("t_dom"))
    )
    rows = diff.limit(3).collect()
    assert not rows, f"extractors diverge on well-formed input: {rows}"


def test_dom_beats_regex_on_malformed_html(spark):
    """The documented wild-HTML cases: a '>' inside an attribute value
    truncates the regex's generic tag strip mid-tag and leaks the rest
    into the text; exotic entity references only decode on the DOM
    path. The seam exists exactly for these."""
    pages = spark.createDataFrame(
        [
            (1, '<p>click <a title="a>b" href="#">here</a> now</p>'),
            (2, "<p>caf&eacute; &hellip; done</p>"),
        ],
        "doc_id long, html string",
    ).repartition(1)
    dom = {r["doc_id"]: r["text"] for r in html_to_text_dom(pages).collect()}
    regex = {r["doc_id"]: r["text"] for r in html_to_text(pages).collect()}
    # both paths space-trim only, so block-boundary newlines remain
    assert dom[1].strip("\n") == "click here now"
    assert 'b"' in regex[1]  # the regex path leaks the attribute tail
    assert dom[2].strip("\n") == "café … done"
    assert "&eacute;" in regex[2]  # undecoded on the six-entity path


def test_dom_drops_script_style_and_comments(spark):
    pages = spark.createDataFrame(
        [(1, "<body><script>if (a<b) {x}</script>keep<style>h1{}</style>"
             "<!-- no -->also</body>")],
        "doc_id long, html string",
    ).repartition(1)
    out = html_to_text_dom(pages).collect()[0]["text"]
    assert out.strip("\n") == "keep also"
