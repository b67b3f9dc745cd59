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
