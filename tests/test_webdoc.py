"""HTML -> text extraction and HTTP/WARC record parsing."""

from pyspark.sql import functions as F

from ontoweaver_spark.webdoc import html_title, html_to_text, parse_http_response


def _one(spark, html: str) -> dict:
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(
        html_to_text(F.col("h")).alias("t"), html_title(F.col("h")).alias("ti")
    ).collect()[0].asDict()


def test_html_strips_script_style_comments(spark):
    got = _one(
        spark,
        "<html><head><title>T</title><style>p {\n color: red }</style></head>"
        "<body><!-- note\nacross lines --><p>hello</p>"
        "<script type='x'>var a = '<p>not text</p>';\nif(a<2){}</script>"
        "world</body></html>",
    )
    assert got["t"] == "T hello world"
    assert got["ti"] == "T"


def test_html_entities_decode_after_tags(spark):
    # &lt;b&gt; is LITERAL text "<b>" — it must survive, not get stripped
    got = _one(spark, "<p>a &amp;&nbsp;b &lt;b&gt; &quot;c&#39;</p>")
    assert got["t"] == "a & b <b> \"c'"
    # &amp;lt; means the literal string "&lt;"
    assert _one(spark, "<p>&amp;lt;</p>")["t"] == "&lt;"


def test_html_tags_become_word_breaks(spark):
    assert _one(spark, "a<br>b<BR/>c")["t"] == "a b c"
    assert _one(spark, "<ul><li>x</li><li>y</li></ul>")["t"] == "x y"


def test_html_no_title_empty(spark):
    assert _one(spark, "<p>z</p>")["ti"] == ""


def test_parse_http_response_ok_and_garbage(spark):
    ok = "HTTP/1.1 200 OK\r\ncontent-type: text/plain\r\nX: 1\r\n\r\nbody text"
    redirect = "HTTP/1.0 301 Moved\r\nLocation: /x\r\n\r\n"
    garbage = "not an http record at all"
    df = spark.createDataFrame(
        [(1, ok.encode()), (2, redirect.encode()), (3, garbage.encode())],
        "id long, html binary",
    )
    got = {r["id"]: r for r in parse_http_response(df).collect()}
    assert got[1]["http_status"] == 200
    assert got[1]["content_type"] == "text/plain"  # case-insensitive header
    assert got[1]["body"] == "body text"
    assert got[2]["http_status"] == 301
    assert got[2]["content_type"] is None and got[2]["body"] == ""
    assert got[3]["http_status"] is None
    assert got[3]["body"] == garbage  # unparseable keeps full payload
