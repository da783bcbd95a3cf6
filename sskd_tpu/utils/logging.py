"""Structured logging on stdlib (the reference used loguru,
reference: src/utils/logging.py:10-55 — console + rotating file sink).

Provides the same surface: ``setup_logging(log_file=..., level=...,
rotation_bytes=..., retention=...)`` and ``get_logger(name)``.
"""

from __future__ import annotations

import logging
import logging.handlers
import sys
from pathlib import Path

_ROOT_NAME = "sskd_tpu"
_CONFIGURED = False

_FORMAT = "%(asctime)s | %(levelname)-8s | %(name)s:%(funcName)s:%(lineno)d - %(message)s"


def setup_logging(
    log_file: str | Path | None = None,
    level: str = "INFO",
    rotation_bytes: int = 50 * 1024 * 1024,
    retention: int = 10,
    force: bool = False,
) -> logging.Logger:
    """Configure console + optional rotating-file logging.

    Matches the reference's behavior of rotation + retention
    (reference: src/utils/logging.py:36-48). Compression is skipped —
    rotated files are small and the stdlib handler doesn't zip.
    """
    global _CONFIGURED
    logger = logging.getLogger(_ROOT_NAME)
    if _CONFIGURED and not force:
        return logger

    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    logger.handlers.clear()
    logger.propagate = False

    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(console)

    if log_file is not None:
        log_path = Path(log_file)
        log_path.parent.mkdir(parents=True, exist_ok=True)
        file_handler = logging.handlers.RotatingFileHandler(
            log_path, maxBytes=rotation_bytes, backupCount=retention
        )
        file_handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(file_handler)

    _CONFIGURED = True
    return logger


def get_logger(name: str | None = None) -> logging.Logger:
    """Child logger under the framework root."""
    if not _CONFIGURED:
        setup_logging()
    if name:
        return logging.getLogger(f"{_ROOT_NAME}.{name}")
    return logging.getLogger(_ROOT_NAME)
