"""Native C++ WordPiece core parity vs the pure-Python implementation
(native/wordpiece.cc via ctypes; ASCII semantics must be bit-identical)."""

import os

import pytest

from sskd_tpu.tokenization import WordPieceTokenizer
from sskd_tpu.tokenization.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "semantic search with knowledge distillation",
    "punctuation, everywhere! right? (yes) [ok] {fine}",
    "numbers 123 456 and mixed a1b2c3",
]


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer.build_from_corpus(CORPUS, vocab_size=512)


def _python_path(tok, text):
    """Force the pure-python implementation."""
    saved, saved_tried = tok._native, tok._native_tried
    tok._native, tok._native_tried = None, True
    try:
        return tok.tokenize_with_offsets(text)
    finally:
        tok._native, tok._native_tried = saved, saved_tried


@pytest.mark.parametrize(
    "text",
    CORPUS
    + [
        "",
        "   ",
        "single",
        "UPPERCASE Words MiXeD",
        "trailing space ",
        " leading",
        "a.b.c!d",
        "unknownzzzwordzzz here",
        "x" * 300,  # exceeds max_input_chars_per_word -> UNK
    ],
)
def test_ascii_parity(tok, text):
    native_ids, native_offsets = tok.tokenize_with_offsets(text)
    py_ids, py_offsets = _python_path(tok, text)
    assert native_ids == py_ids, text
    assert native_offsets == py_offsets, text


def test_non_ascii_falls_back(tok):
    # must not crash, must produce python-path results
    ids, offsets = tok.tokenize_with_offsets("héllo wörld")
    py_ids, py_offsets = _python_path(tok, "héllo wörld")
    assert ids == py_ids and offsets == py_offsets


def test_kill_switch(monkeypatch):
    monkeypatch.setenv("SSKD_NATIVE_TOKENIZER", "0")
    t = WordPieceTokenizer.build_from_corpus(CORPUS, vocab_size=256)
    t.tokenize("anything works")
    assert t._native is None


def test_offsets_slice_source(tok):
    text = "greedy longest match wordpiece, tested!"
    ids, offsets = tok.tokenize_with_offsets(text)
    for (s, e), tid in zip(offsets, ids):
        assert 0 <= s < e <= len(text)
        piece = tok.inv_vocab[tid]
        if not piece.startswith("##") and piece not in ("[UNK]",):
            assert text[s:e].lower() == piece


def test_encode_batch_from_fresh_threads():
    """Thread-local scratch buffers: a thread's FIRST ids-only tokenize
    must allocate before indexing (regression: the buffer attribute was
    evaluated before the call that creates it); concurrent encodes from
    executor threads (the serving path) must not race."""
    import threading

    from sskd_tpu.tokenization import get_default_tokenizer

    tok = get_default_tokenizer()
    ref = tok.encode_batch(["alpha bravo charlie delta"], max_length=16, pad_to=16)
    out: dict[int, list] = {}
    errs: list[Exception] = []

    def worker(k):
        try:
            got = tok.encode_batch(
                ["alpha bravo charlie delta"], max_length=16, pad_to=16
            )
            out[k] = got["input_ids"][0].tolist()
        except Exception as e:  # pragma: no cover - the regression itself
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert all(v == ref["input_ids"][0].tolist() for v in out.values())


def _force_python_encode_batch(tok, *args, **kwargs):
    saved, saved_tried = tok._native, tok._native_tried
    tok._native, tok._native_tried = None, True
    try:
        return tok.encode_batch(*args, **kwargs)
    finally:
        tok._native, tok._native_tried = saved, saved_tried


def test_batch_matrix_parity_singles(tok):
    """The multithreaded wp_tokenize_batch path frames identically to the
    pure-Python encode_batch, across varied lengths incl. truncation."""
    import numpy as np

    rng = np.random.default_rng(5)
    words = ["the", "quick", "fox", "distillation", "a1b2c3", "zzz!", "(ok)"]
    texts = [
        " ".join(rng.choice(words, rng.integers(0, 60)))
        for _ in range(64)
    ]
    got = tok.encode_batch(texts, max_length=32, pad_to=32)
    ref = _force_python_encode_batch(tok, texts, max_length=32, pad_to=32)
    for key in ("input_ids", "attention_mask", "token_type_ids"):
        np.testing.assert_array_equal(got[key], ref[key], err_msg=key)


def test_batch_matrix_parity_pairs(tok):
    """Pair framing ([CLS] a [SEP] b [SEP] + type ids) with the balanced
    truncation must match pure Python bit-for-bit — including rows where
    one side is much longer than the budget (the capped-count regime)."""
    import numpy as np

    rng = np.random.default_rng(6)
    words = ["semantic", "search", "knowledge", "dog", "123", "right?"]
    texts = [" ".join(rng.choice(words, rng.integers(1, 40))) for _ in range(32)]
    pairs = [" ".join(rng.choice(words, rng.integers(1, 80))) for _ in range(32)]
    got = tok.encode_batch(texts, text_pairs=pairs, max_length=48, pad_to=48)
    ref = _force_python_encode_batch(
        tok, texts, text_pairs=pairs, max_length=48, pad_to=48
    )
    for key in ("input_ids", "attention_mask", "token_type_ids"):
        np.testing.assert_array_equal(got[key], ref[key], err_msg=key)


def test_batch_matrix_mixed_ascii_falls_back(tok):
    """A batch containing non-ASCII text must route through the per-text
    path and still agree with pure Python."""
    import numpy as np

    texts = ["plain ascii text", "unicode café latte", "the quick fox"]
    got = tok.encode_batch(texts, max_length=16, pad_to=16)
    ref = _force_python_encode_batch(tok, texts, max_length=16, pad_to=16)
    np.testing.assert_array_equal(got["input_ids"], ref["input_ids"])


def test_batch_matrix_forced_thread_pool(tok):
    """Force n_threads=4 regardless of host cores: the std::thread pool +
    atomic work index must produce byte-identical rows to the serial
    per-text path (this host reports 1 CPU, so without forcing, the
    threaded code would never execute in CI)."""
    import numpy as np

    rng = np.random.default_rng(7)
    words = ["the", "semantic", "fox", "a1b2c3", "x" * 120, "!"]
    texts = [" ".join(rng.choice(words, rng.integers(0, 50))) for _ in range(97)]
    native = tok._native_core()
    got_ids, got_cnt = native.tokenize_ids_matrix(texts, cap=64, n_threads=4)
    ref_ids, ref_cnt = native.tokenize_ids_matrix(texts, cap=64, n_threads=1)
    np.testing.assert_array_equal(got_cnt, ref_cnt)
    for i in range(len(texts)):
        np.testing.assert_array_equal(
            got_ids[i, : got_cnt[i]], ref_ids[i, : ref_cnt[i]], err_msg=str(i)
        )


def test_random_ascii_fuzz_parity(tok):
    """Seeded fuzz over random printable-ASCII strings: the C core and the
    pure-python path must agree on ids AND offsets for every input, and
    the C core must never crash on adversarial whitespace/punctuation
    soup or pathological word lengths."""
    import random
    import string

    rng = random.Random(42)
    alphabet = string.ascii_letters + string.digits + string.punctuation + "  \t"
    cases = []
    for _ in range(150):
        n = rng.randrange(0, 120)
        cases.append("".join(rng.choice(alphabet) for _ in range(n)))
    # pathological word lengths around max_input_chars_per_word
    for n in (1, 99, 100, 101, 250):
        cases.append("a" * n)
        cases.append(("b" * n + " ") * 3)
    # punctuation-only storms and whitespace runs
    cases += ["!!!???...", "-" * 80, " \t  \t ", ".a.b.c." * 20]
    for text in cases:
        native = tok.tokenize_with_offsets(text)
        python = _python_path(tok, text)
        assert native == python, repr(text[:60])


def test_random_unicode_fuzz_no_crash(tok):
    """Random multilingual/emoji soup: non-ASCII routes to the python
    fallback — parity holds and nothing crashes at the ctypes boundary."""
    import random

    rng = random.Random(43)
    pools = [
        "héllo wörld café naïve",
        "日本語のテキスト処理",
        "русский текст здесь",
        "🙂🚀🔥 emoji 🎉",
        "mixed ascii and 中文 words",
    ]
    for _ in range(40):
        parts = [rng.choice(pools) for _ in range(rng.randrange(1, 4))]
        text = " ".join(parts)
        assert tok.tokenize_with_offsets(text) == _python_path(tok, text)
