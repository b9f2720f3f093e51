"""Model-call budget counter.

In the reference this limited Gemini cloud calls (src/utils/counter.py). Here
it bounds on-device model generations per run — the semantics (soft max,
optional hard max, only the primary "gemini"-class service is limited) are
preserved so pipeline budget logic and tests carry over unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["APICounter", "APILimitExceeded", "BUDGETED_SERVICES"]


class APILimitExceeded(RuntimeError):
    """Raised when the budgeted generation count is exhausted."""


# Service names whose calls count against the budget. "gemini" is kept for
# backward compatibility; "local"/"tpu" are the native engine's names.
BUDGETED_SERVICES = frozenset({"gemini", "local", "tpu"})


@dataclass
class APICounter:
    """Counts budgeted model calls with a soft cap and an optional hard cap."""

    max_calls: int = 20
    current_count: int = 0
    hard_max_calls: int | None = None

    def _effective_max_calls(self) -> int:
        if self.hard_max_calls is None:
            return self.max_calls
        return min(self.max_calls, self.hard_max_calls)

    def set_max_calls(self, max_calls: int, hard_max_calls: int | None = None) -> int:
        """Raise/lower the soft cap, clamped to the hard cap. Returns the new cap."""
        if hard_max_calls is not None:
            self.hard_max_calls = hard_max_calls
        effective_hard = self.hard_max_calls
        if effective_hard is None:
            effective_hard = max_calls
        self.max_calls = min(max_calls, effective_hard)
        return self.max_calls

    def increase_max_calls(
        self, additional_calls: int, hard_max_calls: int | None = None
    ) -> int:
        return self.set_max_calls(self.max_calls + additional_calls, hard_max_calls)

    def increment(self, service: str) -> bool:
        """Count one call; raises APILimitExceeded when a budgeted service
        exceeds its cap. Non-budgeted services are never limited."""
        if service.lower() in BUDGETED_SERVICES:
            limit = self._effective_max_calls()
            if self.current_count >= limit:
                raise APILimitExceeded(
                    f"Model call limit reached: {self.current_count}/{limit}"
                )
            self.current_count += 1
            return True
        return True

    def can_call(self) -> bool:
        return self.current_count < self._effective_max_calls()

    def remaining(self) -> int:
        return max(self._effective_max_calls() - self.current_count, 0)

    def reset(self) -> None:
        self.current_count = 0
