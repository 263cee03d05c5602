"""Structured logging for the framework.

The reference's observability was bare ``print`` statements
(``amares.py:92,198,309``, ``bruker.py:204``).  Here a standard-library
logger namespace (``xmris_tpu.*``) with a concise structured format, off by
default (WARNING), switchable with one call.
"""

from __future__ import annotations

import logging

_FORMAT = "%(asctime)s %(levelname)-7s %(name)s :: %(message)s"


def get_logger(name: str = "xmris_tpu") -> logging.Logger:
    """Namespace logger; children inherit the configured handler/level."""
    return logging.getLogger(name)


def set_log_level(level: str | int = "info", verbose: bool = True) -> None:
    """Configure the framework logger (mirrors the pyAMARES-style gate the
    reference exposes: ``set_log_level("info"|"error")``)."""
    logger = get_logger()
    if isinstance(level, str):
        level = getattr(logging, level.upper())
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
    logger.setLevel(level)
    if verbose:
        logger.log(level, "log level set to %s", logging.getLevelName(level))
