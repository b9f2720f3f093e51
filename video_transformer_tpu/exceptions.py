"""Framework exception types."""

from .utils.counter import APILimitExceeded

__all__ = ["APILimitExceeded", "KeyExhaustedError", "EngineError"]


class KeyExhaustedError(Exception):
    """An API key pool reports every key exhausted (optional cloud seam;
    declared for compatibility with the reference's src/exceptions.py)."""


class EngineError(RuntimeError):
    """The on-device inference engine failed irrecoverably."""
