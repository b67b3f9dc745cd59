"""Curation facade: deterministic keep decisions through the full funnel."""

from pyspark.sql import functions as F

from dataingestion_spark.curation import CurationConfig, curate, curation_funnel

GOOD = ("this is a perfectly reasonable english document with many common "
        "words that the quality heuristics and the language detector both like")


def _docs(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),                       # exact duplicate of 1
        (3, GOOD + " extra tail words"), # near duplicate of 1
        (4, "zz qq xx"),                 # fails quality + min_words
        (5, "le chat et le chien sont dans la maison avec le livre et la table"),  # fr
        (6, "another good english text with the usual words and it is long "
            "enough to pass the simple quality bar for this unit test case"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_keeps_canonicals_only(spark):
    kept = curate(_docs(spark))
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert ids == [1, 6]  # 2 exact-dup, 3 near-dup, 4 low quality, 5 non-en
    row = kept.filter(F.col("doc_id") == 1).first()
    assert row.detected_lang == "en" and row.quality >= 0.5
    assert row.content_hash and row.n_tokens_bpeish > 0


def test_funnel_counts_monotonic(spark):
    out = {r.stage: (r.docs_kept, r.words_kept)
           for r in curation_funnel(_docs(spark)).collect()}
    assert out["0_input"][0] == 6
    assert out["1_lang"][0] == 4       # drops fr AND the stopword-free junk ('und')
    assert out["2_quality"][0] == 4
    assert out["3_exact_dedup"][0] == 3
    assert out["4_neardup"][0] == 2
    docs = [out[k][0] for k in sorted(out)]
    words = [out[k][1] for k in sorted(out)]
    assert docs == sorted(docs, reverse=True)
    assert words == sorted(words, reverse=True)


def test_curate_no_neardup_config(spark):
    kept = curate(_docs(spark), config=CurationConfig(neardup=False))
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert ids == [1, 3, 6]  # near-dup 3 survives without the cluster pass
