"""Utilities: logging, timing, dense linear algebra, options/metadata
(TPU-native counterpart of ``src/Utilities/``)."""

from . import linalg, logger, options, timer

__all__ = ["linalg", "logger", "options", "timer"]
