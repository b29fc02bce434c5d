"""Logging utilities.

Capability parity with the reference logger factory
(/root/reference/src/logger.py:7-63): a rotating-file DEBUG handler plus an
INFO console handler, deduplicated on repeat calls, and a 4-decimal float
array formatter.
"""

from __future__ import annotations

import logging
import sys
from logging.handlers import RotatingFileHandler
from pathlib import Path


def get_logger(name: str, log_path: str | None = None, console: bool = True) -> logging.Logger:
    """Return a logger configured for file and/or console output.

    Args:
        name: logger name; ``__main__`` is replaced by the script name.
        log_path: if set, attach a rotating file handler (10 MB, 1 backup, DEBUG).
        console: if True, attach a stream handler at INFO.
    """
    name = Path(sys.argv[0]).name if name == "__main__" else name
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    formatter = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")

    for handler in list(logger.handlers):
        logger.removeHandler(handler)

    if log_path:
        Path(log_path).parent.mkdir(parents=True, exist_ok=True)
        fh = RotatingFileHandler(log_path, maxBytes=10 * 2**20, backupCount=1)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(formatter)
        logger.addHandler(fh)

    if console:
        ch = logging.StreamHandler()
        ch.setLevel(logging.INFO)
        ch.setFormatter(formatter)
        logger.addHandler(ch)

    if not (log_path or console):
        logger.addHandler(logging.NullHandler())

    return logger


def float_array_string(arr) -> str:
    """Format an iterable of floats to 4 decimal places."""
    return "[" + ", ".join("{:.4f}".format(el) for el in arr) + "]"
