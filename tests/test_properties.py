"""Property-based tests (hypothesis) for the packing engine and tokenizer —
the invariants the reference pins informally across its golden tests."""

from hypothesis import given, settings, strategies as st

from dataingestion_spark.model import element_row
from dataingestion_spark.operators.chunkers import (
    ChunkBudgetError,
    ChunkerOptions,
    header_chunk_doc,
    pack_elements,
    token_chunk_doc,
)
from dataingestion_spark.tokenizer import WordTokenizer

TOK = WordTokenizer()

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1, max_size=8,
)
paragraphs = st.lists(words, min_size=1, max_size=40).map(" ".join)


def para_elems(texts):
    return [
        {"elem_type": "paragraph", "markdown": t, "text": t} for t in texts
    ]


@given(st.lists(paragraphs, min_size=1, max_size=8), st.integers(8, 64))
@settings(max_examples=60, deadline=None)
def test_packed_chunks_never_exceed_budget(texts, max_tokens):
    opts = ChunkerOptions(TOK, max_tokens)
    try:
        chunks = pack_elements("ctx", para_elems(texts), opts)
    except ChunkBudgetError:
        return  # an element genuinely could not fit — the documented contract
    for c in chunks:
        assert TOK.count(c["content"]) <= max_tokens
        assert c["content"].startswith("ctx")


@given(st.lists(paragraphs, min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_packing_preserves_all_content(texts):
    # With an ample budget, every paragraph lands in some chunk, in order.
    opts = ChunkerOptions(TOK, 100000)
    chunks = pack_elements("", para_elems(texts), opts)
    joined = "\n".join(c["content"] for c in chunks)
    pos = -1
    for t in texts:
        nxt = joined.find(t, pos + 1)
        assert nxt > pos
        pos = nxt


@given(paragraphs, st.integers(2, 50), st.integers(0, 10))
@settings(max_examples=60, deadline=None)
def test_token_windows_cover_text(text, max_tokens, overlap):
    if overlap >= max_tokens:
        return
    opts = ChunkerOptions(TOK, max_tokens, overlap)
    rows = [
        element_row("d", 0, [0], "section", markdown=text),
        element_row("d", 1, [0, 0], "paragraph", markdown=text),
    ]
    chunks = token_chunk_doc(rows, opts)
    if overlap == 0:
        assert "".join(c["content"] for c in chunks) == text
    # every window respects the budget
    for c in chunks:
        assert TOK.count(c["content"]) <= max_tokens


@given(st.text(max_size=200))
@settings(max_examples=80, deadline=None)
def test_tokenizer_roundtrip_and_counts(text):
    spans = TOK.encode(text)
    # spans partition the text from the first non-space character
    assert "".join(spans) == text[len(text) - len(text.lstrip()):]
    assert len(spans) == TOK.count(text)
    idx, n = TOK.index_by_token_count(text, 3)
    assert n <= 3
    assert TOK.count(text[:idx]) == n


@given(st.lists(st.tuples(st.integers(1, 3), paragraphs), min_size=1, max_size=12))
@settings(max_examples=40, deadline=None)
def test_header_chunker_contexts_are_header_paths(spec):
    rows = [element_row("d", 0, [0], "section", markdown="root")]
    headers = set()
    for i, (kind, text) in enumerate(spec):
        if kind == 1:
            rows.append(element_row("d", i + 1, [0, i], "header",
                                    markdown=text, header_level=(i % 3) + 1))
            headers.add(text)
        else:
            rows.append(element_row("d", i + 1, [0, i], "paragraph", markdown=text))
    chunks = header_chunk_doc(rows, ChunkerOptions(TOK, 100000))
    for c in chunks:
        for part in c["context"].split(" "):
            if part:
                # context is assembled exclusively from header markdowns
                assert any(part in h for h in headers) or c["context"] == ""


# --- WARC serializer/parser round trip -----------------------------------

warc_payloads = st.binary(min_size=0, max_size=400)
warc_uris = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                           whitelist_characters=":/._-"),
    min_size=1, max_size=60,
).map(lambda s: "http://h/" + s)


@given(st.lists(st.tuples(warc_uris, warc_payloads), min_size=1, max_size=8),
       st.booleans())
@settings(max_examples=60, deadline=None)
def test_warc_roundtrip_any_payload(recs, gz):
    """Serialize → parse recovers every record exactly, for ARBITRARY
    payload bytes (including bytes that look like WARC headers, CRLFs,
    and gzip magic) — Content-Length framing, never delimiter scanning."""
    import gzip as gz_mod

    from dataingestion_spark.sources.warc import parse_warc_bytes, wet_record_bytes

    blob = b"".join(wet_record_bytes(u, p) for u, p in recs)
    if gz:
        blob = gz_mod.compress(blob)
    parsed = parse_warc_bytes(blob)
    assert [(r[1], r[5]) for r in parsed] == recs
    assert all(r[4] == len(p) for r, (_, p) in zip(parsed, recs))


# --- tar closed-form size ------------------------------------------------


@given(st.lists(st.integers(0, 3000), min_size=1, max_size=20))
@settings(max_examples=40, deadline=None)
def test_tar_size_closed_form_matches_builder(sizes):
    from dataingestion_spark.sinks.webdataset import (
        build_tar_bytes,
        tar_size_closed_form,
    )

    members = [(f"m{i}.bin", b"x" * s) for i, s in enumerate(sizes)]
    assert len(build_tar_bytes(members)) == tar_size_closed_form(sizes)


# --- edit-distance blocking losslessness (pure local twin of the lemma) ----

def _lev(a, b):
    import functools

    @functools.lru_cache(None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                   d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
    return d(len(a), len(b))


@given(st.lists(st.text(alphabet="abcq ", min_size=9, max_size=16),
                min_size=2, max_size=6), st.integers(1, 2))
@settings(max_examples=60, deadline=None)
def test_qgram_occurrence_bound_never_prunes_true_pairs(strings, k):
    """The multiset q-gram bound used by edit_distance_pairs: any pair
    within k edits shares ≥ max_len − q + 1 − k·q gram OCCURRENCES."""
    from collections import Counter

    q = 3
    for i, s1 in enumerate(strings):
        for s2 in strings[i + 1:]:
            if len(s1) < q + k * q or len(s2) < q + k * q:
                continue  # short-string band handles these
            if _lev(s1, s2) <= k:
                g1 = Counter(s1[j:j + q] for j in range(len(s1) - q + 1))
                g2 = Counter(s2[j:j + q] for j in range(len(s2) - q + 1))
                shared = sum((g1 & g2).values())
                assert shared >= max(len(s1), len(s2)) - q + 1 - k * q


# --- video demux round trips -------------------------------------------------

_px = st.integers(min_value=0, max_value=255)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.binary(min_size=2, max_size=400), min_size=1, max_size=8),
    st.integers(min_value=1, max_value=60),
)
def test_avi_mux_demux_roundtrip_any_payload(frames, fps):
    """The AVI container round-trips arbitrary frame payloads verbatim
    with exact i*1000/fps timestamps (demux never inspects frame bytes)."""
    from dataingestion_spark.operators.video_demux import (
        demux_avi, encode_avi_mjpeg,
    )

    avi = encode_avi_mjpeg(frames, 16, 8, fps=fps)
    out = demux_avi(avi)
    assert [f for _, f in out] == frames
    assert [t for t, _ in out] == [i * 1000 // fps for i in range(len(frames))]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=4),
    st.lists(st.integers(min_value=0, max_value=5000), min_size=4, max_size=4),
)
def test_gif_animation_roundtrip_any_palette(frame_seeds, delays):
    """Multi-frame GIF round-trips every frame raster and its
    (centisecond-floored) delay through encode → iter_gif_frames."""
    from dataingestion_spark.operators.gif_codec import (
        encode_gif_animation, iter_gif_frames,
    )

    w, h = 6, 4
    frames = [bytes(b for i in range(w * h)
                    for b in ((s * 30) % 256, (i * 11) % 256, 5))
              for s in frame_seeds]
    ds = delays[:len(frames)] + [0] * max(0, len(frames) - len(delays))
    gif = encode_gif_animation(frames, w, h, 3, delays_ms=ds)
    got = list(iter_gif_frames(gif))
    assert [g[1] for g in got] == frames
    assert [g[0] for g in got] == [d // 10 * 10 for d in ds]
