"""SFT chat rendering + loss-mask offsets (operators/sft.py).

Offsets are verified against pure-Python re-rendering: build the full
conversation string locally, find each piece by construction, and check
that the distributed offsets index into it exactly.
"""

import pytest

from pyspark.sql import Row

from dataingestion_spark.operators.sft import (
    render_chat,
    render_messages,
    token_loss_mask,
)

MSGS = [
    ("c1", 0, "user", "hello there"),
    ("c1", 1, "assistant", "hi! how can I help?"),
    ("c1", 2, "user", "explain  spark\nwindows"),
    ("c1", 3, "assistant", "sure."),
    ("c2", 0, "system", "be terse"),
    ("c2", 1, "user", ""),
    ("c2", 2, "assistant", "ok"),
]


def _df(spark):
    return spark.createDataFrame(
        [Row(conv_id=c, pos=p, role=r, content=t) for c, p, r, t in MSGS]
    )


def _local_render(conv):
    """(text, [(role, start, end, content_start, content_end)]) built
    by straightforward string concatenation."""
    text, spans = "", []
    for _, _, role, content in conv:
        piece = f"<|{role}|>\n{content}<|end|>\n"
        start = len(text)
        cs = start + len(f"<|{role}|>\n")
        spans.append((role, start, start + len(piece), cs, cs + len(content)))
        text += piece
    return text, spans


@pytest.mark.parametrize("conv_id", ["c1", "c2"])
def test_offsets_match_local_rendering(spark, conv_id):
    conv = [m for m in MSGS if m[0] == conv_id]
    text, spans = _local_render(conv)
    rows = (render_messages(_df(spark)).filter(f"conv_id = '{conv_id}'")
            .orderBy("pos").collect())
    assert len(rows) == len(spans)
    for row, (role, s, e, cs, ce) in zip(rows, spans):
        assert (row.start_off, row.end_off) == (s, e)
        assert (row.content_start, row.content_end) == (cs, ce)
        assert text[row.start_off:row.end_off] == row.piece
        # the content span must slice the original content back out
        assert text[row.content_start:row.content_end] == row.content


def test_render_chat_text_and_mask_chars(spark):
    out = {r.conv_id: r for r in render_chat(render_messages(_df(spark))).collect()}
    for conv_id in ("c1", "c2"):
        conv = [m for m in MSGS if m[0] == conv_id]
        text, spans = _local_render(conv)
        r = out[conv_id]
        assert r.text == text
        assert r.n_msgs == len(conv)
        want_mask = sum(ce - cs for role, _, _, cs, ce in spans if role == "assistant")
        assert r.mask_chars == want_mask
        first = min((cs for role, _, _, cs, _ in spans if role == "assistant"),
                    default=None)
        assert r.first_mask_start == first


def test_token_mask_covers_exactly_assistant_content(spark):
    toks = token_loss_mask(render_messages(_df(spark))).collect()
    text = {c: _local_render([m for m in MSGS if m[0] == c])[0] for c in ("c1", "c2")}
    spans = {c: _local_render([m for m in MSGS if m[0] == c])[1] for c in ("c1", "c2")}
    assert toks, "token stream must not be empty"
    for t in toks:
        # offsets always index the rendered text exactly
        assert text[t.conv_id][t.tok_start:t.tok_end] == t.tok
        # in_loss iff the token overlaps an assistant content span
        overlap = any(
            role == "assistant" and t.tok_start < ce and cs < t.tok_end
            for role, _, _, cs, ce in spans[t.conv_id]
        )
        assert t.in_loss == overlap
    # sanity: both classes occur
    flags = {t.in_loss for t in toks}
    assert flags == {True, False}


def test_empty_content_message_keeps_zero_width_span(spark):
    rows = (render_messages(_df(spark))
            .filter("conv_id = 'c2' and pos = 1").collect())
    (r,) = rows
    assert r.content_start == r.content_end  # empty user turn
    assert r.end_off - r.start_off == len("<|user|>\n<|end|>\n")


def test_preference_pairs_margin_and_tiebreak(spark):
    from dataingestion_spark.operators.sft import preference_pairs

    rows = [
        ("p1", "good answer", 0.9), ("p1", "bad answer", 0.1),
        ("p1", "meh", 0.5),
        ("p2", "tie a", 0.7), ("p2", "tie z", 0.7),  # tied max AND min
        ("p3", "only one", 0.4),
    ]
    df = spark.createDataFrame(rows, "prompt_id string, completion string, score double")
    got = {r.prompt_id: r for r in preference_pairs(df).collect()}
    assert got["p1"].chosen == "good answer"
    assert got["p1"].rejected == "bad answer"
    assert got["p1"].chosen_score == 0.9 and got["p1"].rejected_score == 0.1
    # ties: lexicographically greatest wins among tied maxima, least loses
    # among tied minima -> gap 0 -> dropped at margin 0
    assert "p2" not in got
    assert "p3" not in got  # single completion: no pair
    # with a margin, small gaps drop too
    got2 = {r.prompt_id for r in preference_pairs(df, margin=0.9).collect()}
    assert got2 == set()


def test_best_of_n_rank_and_tiebreak(spark):
    from dataingestion_spark.operators.sft import best_of_n

    rows = [("p", "c", 0.5), ("p", "a", 0.9), ("p", "b", 0.9), ("q", "x", 0.1)]
    df = spark.createDataFrame(rows, "prompt_id string, completion string, score double")
    got = [(r.completion, r.rank) for r in
           best_of_n(df, n=2).filter("prompt_id = 'p'")
           .orderBy("rank").collect()]
    assert got == [("a", 1), ("b", 2)]  # tie broken asc by completion
    assert best_of_n(df, n=1).filter("prompt_id = 'q'").count() == 1
