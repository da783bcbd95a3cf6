"""ctypes binding for the native WordPiece core (native/wordpiece.cc).

Replaces the reference's third-party Rust `tokenizers` dependency with
first-party native code on the host-side hot path (corpus preparation and
serving tokenize both funnel through here). The binding:

- builds ``libwordpiece.so`` on demand (``make -C native``) and caches it;
- routes ASCII text through the C++ core (bit-identical semantics, pinned by
  tests/test_native_tokenizer.py) and non-ASCII text to the pure-Python
  implementation, whose offsets are in code points;
- degrades silently to pure Python when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import threading
import subprocess
from pathlib import Path

import numpy as np

from sskd_tpu.utils.logging import get_logger

logger = get_logger("tokenization.native")

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libwordpiece.so"
_LIB: ctypes.CDLL | None = None
_LIB_FAILED = False


def _make(force: bool = False) -> None:
    cmd = ["make", "-C", str(_NATIVE_DIR)] + (["-B"] if force else [])
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    """Declare every exported symbol's signature. Raises AttributeError if
    the shared object predates a symbol (stale build cache)."""
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_tokenize.restype = ctypes.c_int
    lib.wp_tokenize.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.wp_tokenize_batch.restype = None
    lib.wp_tokenize_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    return lib


def _load_library() -> ctypes.CDLL | None:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    try:
        if not _LIB_PATH.exists():
            _make()
        try:
            _LIB = _bind(ctypes.CDLL(str(_LIB_PATH)))
        except AttributeError:
            # a cached .so from an older source revision lacks a symbol
            # (e.g. wp_tokenize_batch). Force-rebuild and load the fresh
            # binary through a temp copy: dlopen dedups by pathname/inode,
            # so reloading _LIB_PATH directly can hand back the stale
            # mapping that is already resident in this process.
            _make(force=True)
            import shutil
            import tempfile

            with tempfile.NamedTemporaryFile(
                suffix=".so", delete=False
            ) as tmp:
                shutil.copyfile(_LIB_PATH, tmp.name)
                fresh = tmp.name
            try:
                _LIB = _bind(ctypes.CDLL(fresh))
            finally:
                os.unlink(fresh)  # mapping stays valid after unlink
        logger.info(f"native wordpiece core loaded from {_LIB_PATH}")
    except (subprocess.SubprocessError, OSError, AttributeError) as e:
        logger.warning(f"native tokenizer unavailable ({e}); pure-python fallback")
        _LIB_FAILED = True
    return _LIB


class NativeWordPiece:
    """Handle on a C++ vocab. One instance per tokenizer."""

    def __init__(self, vocab: dict[str, int], unk_id: int, lowercase: bool):
        self._lib = _load_library()
        self._handle = None
        self.lowercase = lowercase
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        ordered = sorted(vocab.items(), key=lambda kv: kv[1])
        max_id = ordered[-1][1] if ordered else -1
        lines = [""] * (max_id + 1)
        for token, idx in ordered:
            lines[idx] = token
        blob = "\n".join(lines).encode("utf-8")
        self._handle = self._lib.wp_create(blob, len(blob), unk_id)
        # scratch buffers are THREAD-LOCAL: the serving path tokenizes from
        # asyncio.to_thread executor threads (serve/app.py, serve/batcher.py),
        # and a shared buffer would race
        self._tls = threading.local()

    def __del__(self):  # pragma: no cover - GC timing
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.wp_free(self._handle)
            self._handle = None

    def _buffers(self, cap: int):
        tls = self._tls
        if getattr(tls, "cap", 0) < cap:
            tls.cap = max(cap, 2048)
            tls.ids_buf = np.empty(tls.cap, dtype=np.int32)
            tls.off_buf = np.empty(2 * tls.cap, dtype=np.int32)
        return tls.ids_buf, tls.off_buf, tls.cap

    def _call(self, text: str) -> int:
        """Run the C tokenizer into this thread's reusable scratch buffers;
        returns the token count. Buffer contents are valid until the next
        call FROM THE SAME THREAD."""
        data = text.encode("ascii")
        ids_buf, off_buf, cap = self._buffers(max(16, 2 * len(data) + 8))
        n = self._lib.wp_tokenize(
            self._handle,
            data,
            len(data),
            1 if self.lowercase else 0,
            ids_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            off_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            cap,
        )
        if n < 0:  # pragma: no cover - cap is 2x input length
            raise RuntimeError("native tokenizer output buffer overflow")
        return n

    def tokenize_with_offsets(self, text: str):
        """ASCII-only fast path; caller guarantees ``text.isascii()``."""
        n = self._call(text)
        tls = self._tls
        pairs = tls.off_buf[: 2 * n].reshape(n, 2)
        return tls.ids_buf[:n].tolist(), [tuple(p) for p in pairs.tolist()]

    def tokenize_ids_view(self, text: str) -> np.ndarray:
        """Ids only, as an int32 VIEW into the reusable scratch buffer —
        valid until the next call on this instance. The encode_batch hot
        path copies it straight into the [B, L] output array; skipping the
        per-token list/tuple materialization measured 3x on whole-batch
        tokenization (list path: ~140 ms per 256x160-word docs; the C core
        itself is ~30 ms)."""
        n = self._call(text)  # allocates this thread's buffers first
        return self._tls.ids_buf[:n]

    def tokenize_ids_matrix(
        self, texts, cap: int, n_threads: int = 0
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batch ids: one C call over all texts, internally multithreaded
        (ctypes drops the GIL for the call, so the std::thread pool gives
        real multicore scaling — the per-text entry point serializes on
        re-entering Python between texts). Returns ``(ids [n, cap] int32,
        counts [n] int32)`` where row i holds ``counts[i]`` valid ids,
        capped at ``cap`` — callers frame to <= cap tokens anyway, so the
        cap loses nothing. Caller guarantees every text is ASCII.
        ``n_threads=0`` = ``SSKD_TOKENIZER_THREADS`` when set, else
        hardware concurrency (serving hosts set the env to keep host
        tokenization from oversubscribing cores the XLA runtime uses)."""
        n = len(texts)
        if n_threads == 0:
            import os

            try:
                n_threads = int(os.environ.get("SSKD_TOKENIZER_THREADS", "0"))
            except ValueError:  # malformed knob degrades to the default,
                n_threads = 0  # never a hot-path outage
        if n == 0:
            return (
                np.empty((0, cap), np.int32),
                np.empty((0,), np.int32),
            )
        blob = "".join(texts).encode("ascii")
        ends = np.cumsum(
            np.asarray([len(t) for t in texts], np.int64), dtype=np.int64
        )
        starts = np.concatenate(([0], ends[:-1])).astype(np.int64)
        out_ids = np.empty((n, cap), dtype=np.int32)
        out_counts = np.empty(n, dtype=np.int32)
        self._lib.wp_tokenize_batch(
            self._handle,
            blob,
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            ends.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            n,
            1 if self.lowercase else 0,
            cap,
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            int(n_threads),
        )
        return out_ids, out_counts


def native_available() -> bool:
    return _load_library() is not None
