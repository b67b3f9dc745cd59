"""URL curation operators (operators/urls.py)."""

from pyspark.sql import functions as F

from dataingestion_spark.operators.urls import url_signals


def _signals(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], ["doc_id", "url"]
    )
    rows = url_signals(df).orderBy("doc_id").collect()
    return rows


def test_normalize_case_port_fragment_tracking(spark):
    (r,) = _signals(
        spark,
        ["HTTPS://WWW.Example.COM:443/Path/Sub?utm_source=x&id=3&fbclid=z#frag"],
    )
    assert r.normalized_url == "https://www.example.com/Path/Sub?id=3"
    assert r.host == "www.example.com"
    assert r.registered_domain == "example.com"
    assert r.path_depth == 2
    assert r.n_query_params == 1
    assert not r.is_blocked


def test_public_suffix_and_blocklist(spark):
    rows = _signals(
        spark,
        [
            "http://news.bbc.co.uk/sport",
            "http://a.b.spam.example/x?y=1",
            "http://localhost/",
        ],
    )
    assert rows[0].registered_domain == "bbc.co.uk"
    assert rows[1].registered_domain == "spam.example"
    assert rows[1].is_blocked
    assert rows[2].registered_domain == "localhost"
    assert rows[2].path_depth == 0


def test_tracking_only_query_drops_question_mark(spark):
    rows = _signals(
        spark,
        [
            "http://e.com/a?utm_source=1&utm_medium=2",
            "http://user:pw@e.com:80/a",
            "http://e.com",
        ],
    )
    assert rows[0].normalized_url == "http://e.com/a"
    assert rows[1].normalized_url == "http://e.com/a"
    assert rows[1].host == "e.com"
    assert rows[2].normalized_url == "http://e.com"
    assert rows[2].n_query_params == 0


def test_url_dedup_by_normalized(spark):
    urls = [
        "https://E.com/x?utm_source=a",
        "https://e.COM:443/x?utm_campaign=b",
        "https://e.com/y",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], ["doc_id", "url"])
    n = (
        url_signals(df)
        .select("normalized_url")
        .distinct()
        .count()
    )
    assert n == 2
