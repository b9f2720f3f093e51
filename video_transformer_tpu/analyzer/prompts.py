"""Prompt template loading and rendering.

Templates live in config/prompts.yaml and use str.format ``{var}``
placeholders (same mechanism as reference src/analyzer/prompt_loader.py).
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Any

import yaml

__all__ = [
    "load_prompts",
    "render_prompt",
    "resolve_prompt_name",
    "DEFAULT_PROMPTS_PATH",
]

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


def resolve_prompt_name(
    name: str, profile: str = "spec",
    path: str | Path = DEFAULT_PROMPTS_PATH,
) -> str:
    """Map a template name through the prompt PROFILE.

    ``spec`` (default) serves the reference-parity behavioral spec — the
    full 18-principle instruction set a real instruction-following model
    (qwen2vl-7b with ported weights) consumes. ``compact`` serves the short
    templates the DISTILLED checkpoints were trained on: a distilled model
    is conditioned on its training prompt distribution, and swapping in the
    ~3.7k-token spec shifts every generation position out of distribution
    (measured: the shipped tiny checkpoint loses grounding entirely under
    the spec prompt). Profiles only apply where a ``{name}_compact``
    variant exists; other templates are shared.
    """
    if profile == "compact":
        compact = f"{name}_compact"
        if compact in load_prompts(path):
            return compact
    elif profile != "spec":
        raise ValueError(f"unknown prompt profile: {profile!r}")
    return name


def render_prompt(
    name: str, variables: dict[str, Any] | None = None,
    path: str | Path = DEFAULT_PROMPTS_PATH,
    profile: str = "spec",
) -> str:
    """Render one template with ``{var}`` substitution.

    Raises KeyError for an unknown template and for missing variables
    (fail-fast keeps template drift visible).
    """
    prompts = load_prompts(path)
    name = resolve_prompt_name(name, profile, path)
    if name not in prompts:
        raise KeyError(f"Unknown prompt template: {name}")
    template = prompts[name]
    return template.format(**(variables or {}))
