"""Prompt template loading and rendering.

Templates live in config/prompts.yaml and use str.format ``{var}``
placeholders (same mechanism as reference src/analyzer/prompt_loader.py).
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Any

import yaml

__all__ = ["load_prompts", "render_prompt", "DEFAULT_PROMPTS_PATH"]

DEFAULT_PROMPTS_PATH = (
    Path(__file__).resolve().parents[2] / "config" / "prompts.yaml"
)


@functools.lru_cache(maxsize=8)
def load_prompts(path: str | Path = DEFAULT_PROMPTS_PATH) -> dict[str, str]:
    """Load the prompt-template mapping from YAML."""
    data = yaml.safe_load(Path(path).read_text(encoding="utf-8"))
    if not isinstance(data, dict):
        raise ValueError(f"Prompts file must be a mapping: {path}")
    return {str(k): str(v) for k, v in data.items()}


def render_prompt(
    name: str, variables: dict[str, Any] | None = None,
    path: str | Path = DEFAULT_PROMPTS_PATH,
) -> str:
    """Render one template with ``{var}`` substitution.

    Raises KeyError for an unknown template and for missing variables
    (fail-fast keeps template drift visible).
    """
    prompts = load_prompts(path)
    if name not in prompts:
        raise KeyError(f"Unknown prompt template: {name}")
    template = prompts[name]
    return template.format(**(variables or {}))
