"""Compute kernels (Pallas TPU native tier + XLA fallbacks)."""

from . import pallas

__all__ = ["pallas"]
