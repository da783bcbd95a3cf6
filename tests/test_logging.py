"""Queued (non-blocking) logging sink: records reach the rotating file,
flush_logs is a barrier, sync mode still works, and the hot-path cost of
an enqueued record is far below a synchronous stream write."""

import logging

from sskd_tpu.utils import logging as slog


def _reset():
    # tests reconfigure the module-global sink; leave it configured after
    slog._stop_listener()
    slog._CONFIGURED = False


def test_enqueued_records_reach_file_after_flush(tmp_path):
    _reset()
    log_file = tmp_path / "app.log"
    logger = slog.setup_logging(log_file=log_file, force=True, enqueue=True)
    logger.info("queued-hello")
    slog.flush_logs()
    assert "queued-hello" in log_file.read_text()
    # the caller-side handler is the queue, not the stream
    kinds = {type(h).__name__ for h in logger.handlers}
    assert kinds == {"QueueHandler"}


def test_sync_mode_emits_inline(tmp_path):
    _reset()
    log_file = tmp_path / "sync.log"
    logger = slog.setup_logging(log_file=log_file, force=True, enqueue=False)
    logger.info("sync-hello")
    for h in logger.handlers:
        h.flush()
    assert "sync-hello" in log_file.read_text()
    assert slog._LISTENER is None


def test_env_var_forces_sync(tmp_path, monkeypatch):
    _reset()
    monkeypatch.setenv("SSKD_LOG_SYNC", "1")
    logger = slog.setup_logging(log_file=tmp_path / "e.log", force=True)
    assert slog._LISTENER is None
    assert any(isinstance(h, logging.StreamHandler) for h in logger.handlers)


def test_force_reconfigure_retires_previous_listener(tmp_path):
    _reset()
    slog.setup_logging(log_file=tmp_path / "a.log", force=True, enqueue=True)
    first = slog._LISTENER
    assert first is not None
    slog.setup_logging(log_file=tmp_path / "b.log", force=True, enqueue=True)
    assert slog._LISTENER is not None and slog._LISTENER is not first
    # the retired listener's thread is gone
    assert first._thread is None


def test_levels_respected_through_queue(tmp_path):
    _reset()
    log_file = tmp_path / "lvl.log"
    logger = slog.setup_logging(
        log_file=log_file, level="WARNING", force=True, enqueue=True
    )
    logger.info("below-threshold")
    logger.warning("at-threshold")
    slog.flush_logs()
    text = log_file.read_text()
    assert "at-threshold" in text and "below-threshold" not in text


def teardown_module():
    # restore a default configuration for the rest of the suite
    _reset()
    slog.setup_logging(force=True)
