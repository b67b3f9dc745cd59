"""T5-style span corruption (operators/augment.py): reconstruction and
determinism properties verified against a pure-Python re-derivation."""

import hashlib
import re

import pytest

from pyspark.sql import Row

from dataingestion_spark.operators.augment import _threshold_hex, span_corruption

TEXT = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon")


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def _local(doc_id, text, mask_rate=0.15, span_len=3, salt=""):
    toks = text.strip().split()
    thr = _threshold_hex(mask_rate / span_len)
    starts = [
        hashlib.md5(f"{salt}:{doc_id}:{i}".encode()).hexdigest()[:6] < thr
        for i in range(len(toks))
    ]
    masked = [any(starts[max(0, i - span_len + 1):i + 1])
              for i in range(len(toks))]
    inp, tgt, sid = [], [], 0
    for i, tok in enumerate(toks):
        run = masked[i] and (i == 0 or not masked[i - 1])
        if run:
            inp.append(f"<extra_id_{sid}>")
            tgt.append(f"<extra_id_{sid}> {tok}")
            sid += 1
        elif masked[i]:
            tgt.append(tok)
        else:
            inp.append(tok)
    target = " ".join(tgt) + (f" <extra_id_{sid}>" if sid else "")
    return " ".join(inp), target if sid else ""


@pytest.mark.parametrize("salt", ["", "s1"])
def test_matches_local_rederivation(spark, salt):
    texts = [TEXT, "one two three", TEXT.upper()]
    out = {r.doc_id: r for r in
           span_corruption(_df(spark, texts), salt=salt).collect()}
    for i, t in enumerate(texts):
        inp, tgt = _local(i, t, salt=salt)
        assert out[i].input_text == inp
        assert out[i].target_text == tgt


def test_masked_fraction_near_rate(spark):
    long_text = " ".join(f"tok{i}" for i in range(5000))
    r = span_corruption(_df(spark, [long_text]), mask_rate=0.15).collect()[0]
    assert 0.08 < r.n_masked / r.n_tokens < 0.25


def test_sentinels_are_consecutive_and_paired(spark):
    r = span_corruption(_df(spark, [TEXT]), mask_rate=0.5, salt="x").collect()[0]
    in_ids = [int(m) for m in re.findall(r"<extra_id_(\d+)>", r.input_text)]
    tgt_ids = [int(m) for m in re.findall(r"<extra_id_(\d+)>", r.target_text)]
    assert in_ids == list(range(r.n_spans))
    assert tgt_ids == list(range(r.n_spans + 1))  # closing sentinel


def test_reconstruction_roundtrip(spark):
    """Splicing each target span back over its sentinel restores the text."""
    r = span_corruption(_df(spark, [TEXT]), mask_rate=0.5, salt="y").collect()[0]
    spans = dict(re.findall(r"<extra_id_(\d+)> ((?:(?!<extra_id_)\S+ ?)*)",
                            r.target_text))
    rebuilt = re.sub(r"<extra_id_(\d+)>",
                     lambda m: spans.get(m.group(1), "").strip(),
                     r.input_text)
    assert " ".join(rebuilt.split()) == TEXT


def test_validation(spark):
    with pytest.raises(ValueError):
        span_corruption(_df(spark, [TEXT]), mask_rate=0.0)
    with pytest.raises(ValueError):
        span_corruption(_df(spark, [TEXT]), span_len=0)


def test_prefix_lm_split_properties(spark):
    from dataingestion_spark.operators.augment import prefix_lm_split

    texts = [TEXT, "a b", "single"]
    out = {r.doc_id: r for r in prefix_lm_split(_df(spark, texts)).collect()}
    # reconstruction: input + " " + target == original (when cut > 0)
    r = out[0]
    assert 0 < r.cut < r.n_tokens
    assert f"{r.input_text} {r.target_text}" == TEXT
    assert r.cut >= r.n_tokens * 0.5 - 1 and r.cut <= r.n_tokens * 0.9 + 1
    # two-token doc: the only valid cut is 1
    assert out[1].cut == 1 and out[1].input_text == "a" and out[1].target_text == "b"
    # single token: no valid prefix -> cut 0, everything is target
    assert out[2].cut == 0 and out[2].input_text == "" and out[2].target_text == "single"
    with pytest.raises(ValueError):
        prefix_lm_split(_df(spark, texts), min_frac=0.9, max_frac=0.5)
