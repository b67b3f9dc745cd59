"""HTML → text extraction (operators/html_extract.py)."""

from dataingestion_spark.operators.html_extract import html_extract


def _extract(spark, html):
    df = spark.createDataFrame([(0, html)], ["doc_id", "html"])
    return html_extract(df).collect()[0]


def test_basic_blocks_and_entities(spark):
    r = _extract(
        spark,
        "<html><head><title>T</title><script>var x = '<p>fake</p>';</script>"
        "<style>.c{color:red}</style></head><body><h1>Head</h1>"
        "<p>Alpha &amp; beta &lt;tag&gt;</p><!-- hidden --><ul><li>one</li>"
        "<li>two</li></ul></body></html>",
    )
    assert r.text == "T\nHead\nAlpha & beta <tag>\none\ntwo"
    assert r.n_lines == 5
    assert r.n_links == 0
    assert r.n_scripts == 1
    assert 0 < r.text_ratio < 1


def test_links_density_and_br(spark):
    r = _extract(
        spark,
        '<body><p>Nav: <a href="/a">A</a> <a href="/b">B</a></p>'
        "<p>line one<br>line two<br/>line three</p></body>",
    )
    assert r.text == "Nav: A B\nline one\nline two\nline three"
    assert r.n_links == 2


def test_empty_and_tag_only(spark):
    r = _extract(spark, "<div><script>x</script></div>")
    assert r.text == "" and r.n_lines == 0 and r.n_chars == 0


def test_double_encoded_entity_not_double_decoded(spark):
    r = _extract(spark, "<p>&amp;lt;still-encoded&amp;gt;</p>")
    assert r.text == "&lt;still-encoded&gt;"


def test_multiline_script_and_comment(spark):
    r = _extract(
        spark,
        "<p>keep</p><script>\nline\nline\n</script><!--\nmulti\nline\n-->"
        "<p>also</p>",
    )
    assert r.text == "keep\nalso"
