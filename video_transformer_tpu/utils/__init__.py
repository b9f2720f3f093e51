"""Infrastructure: config, logging, budgets, progress, note post-processing."""

from .counter import APICounter, APILimitExceeded

__all__ = ["APICounter", "APILimitExceeded"]
