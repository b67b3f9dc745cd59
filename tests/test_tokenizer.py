from dataingestion_spark.tokenizer import WordTokenizer


def test_encode_decode_lossless():
    t = WordTokenizer()
    text = "The quick  brown\nfox "
    assert t.decode_raw(t.encode(text)) == text


def test_count():
    t = WordTokenizer()
    assert t.count("The quick brown fox jumps over the lazy dog") == 9
    assert t.count("") == 0
    assert t.count("  one ") == 1


def test_index_by_token_count():
    t = WordTokenizer()
    text = "a bb ccc dddd"
    idx, n = t.index_by_token_count(text, 2)
    assert text[:idx] == "a bb "
    assert n == 2
    idx, n = t.index_by_token_count(text, 99)
    assert idx == len(text)
    assert n == 4
    assert t.index_by_token_count(text, 0) == (0, 0)


def test_windows_match_reference_shape():
    # Reference OverlapTokenChunkerTests: max=4 overlap=1 over the 9-word
    # sentence gives 3 windows starting at 0,3,6.
    t = WordTokenizer()
    spans = t.encode("The quick brown fox jumps over the lazy dog")
    windows = [t.decode(spans[i : i + 4]) for i in range(0, len(spans), 3)]
    assert windows == ["The quick brown fox", "fox jumps over the", "the lazy dog"]
