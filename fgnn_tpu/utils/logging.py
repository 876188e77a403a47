"""Leveled logging + machine-parseable result lines.

Analog of the reference's glog-style macros (samgraph/common/logging.{h,cc})
plus the app-level ``config:<k>=<v>`` / ``test_result:<k>=<v>`` line formats
(example/samgraph/multi_gpu/common_config.py:221-230,
train_gcn.py:200-201,411-412) that the exp/ parsers regex against. We keep
those exact formats so the experiment harness ports over unchanged.
"""
from __future__ import annotations

import logging
import os
import sys

from .. import constants

_LEVELS = {
    "TRACE": logging.DEBUG - 5,
    "DEBUG": logging.DEBUG,
    "INFO": logging.INFO,
    "WARNING": logging.WARNING,
    "ERROR": logging.ERROR,
}


def get_logger(name: str = "fgnn_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("[%(asctime)s %(levelname)s %(name)s] %(message)s")
        )
        logger.addHandler(handler)
        level = os.environ.get(constants.ENV_LOG_LEVEL, "INFO").upper()
        logger.setLevel(_LEVELS.get(level, logging.INFO))
        logger.propagate = False
    return logger


def log_config(key: str, value) -> None:
    """Emit a ``config:k=v`` line (common_config.py:221-230 format)."""
    print(f"config:{key}={value}", flush=True)


def log_test_result(key: str, value) -> None:
    """Emit a ``test_result:k=v`` line (train_gcn.py:411-412 format)."""
    print(f"test_result:{key}={value}", flush=True)
