"""Parameter sharding rules (GSPMD partition specs by parameter path).

Megatron-style tensor parallelism: column-parallel q/k/v/gate/up (output dim
on the 'model' axis), row-parallel out/down (input dim on 'model'), so each
block needs exactly one all-reduce per sub-layer and XLA inserts it
automatically from these specs. Everything else (norms, embeddings) is
replicated — the byte vocab (512) is too small to be worth sharding.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = ["PARTITION_RULES", "param_shardings", "spec_for_path"]

# (path-substring match rules, applied in order; first hit wins).
PARTITION_RULES: list[tuple[tuple[str, ...], P]] = [
    # Column-parallel projections: [in, out] with out sharded.
    (("q", "kernel"), P(None, MODEL_AXIS)),
    (("k", "kernel"), P(None, MODEL_AXIS)),
    (("v", "kernel"), P(None, MODEL_AXIS)),
    (("gate", "kernel"), P(None, MODEL_AXIS)),
    (("up", "kernel"), P(None, MODEL_AXIS)),
    # Row-parallel projections: [in, out] with in sharded.
    (("out", "kernel"), P(MODEL_AXIS, None)),
    (("down", "kernel"), P(MODEL_AXIS, None)),
    # Column-parallel biases (Qwen2 q/k/v): one per output channel.
    (("q", "bias"), P(MODEL_AXIS)),
    (("k", "bias"), P(MODEL_AXIS)),
    (("v", "bias"), P(MODEL_AXIS)),
    # Untied logits head [V, H]: shard the (large, 152k) vocab dim; the
    # per-step [B, V] logits all-gather over 'model' is cheap on ICI.
    (("lm_head",), P(MODEL_AXIS, None)),
    # Projector between encoder and decoder.
    (("projector_up", "kernel"), P(None, MODEL_AXIS)),
    (("projector_down", "kernel"), P(MODEL_AXIS, None)),
    # Patch embedding: large input dim (tubelet pixels), shard output.
    (("patch_embed", "kernel"), P(None, MODEL_AXIS)),
    # int8 serving scales (models/quant.py): one per OUTPUT channel, so
    # column-parallel scales shard with the output dim; row-parallel
    # projections keep their output replicated and so do their scales.
    (("q", "scale"), P(MODEL_AXIS)),
    (("k", "scale"), P(MODEL_AXIS)),
    (("v", "scale"), P(MODEL_AXIS)),
    (("gate", "scale"), P(MODEL_AXIS)),
    (("up", "scale"), P(MODEL_AXIS)),
    (("out", "scale"), P()),
    (("down", "scale"), P()),
]


def spec_for_path(path: tuple[str, ...]) -> P:
    """Partition spec for one flax parameter path."""
    for needles, spec in PARTITION_RULES:
        # Match when the rule's names appear as the trailing path components.
        if len(path) >= len(needles) and tuple(path[-len(needles):]) == needles:
            return spec
    return P()  # replicated


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Build a NamedSharding pytree matching the parameter pytree."""

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = []
    for key_path, _ in flat:
        names = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in key_path
        )
        shardings.append(NamedSharding(mesh, spec_for_path(names)))
    return jax.tree_util.tree_unflatten(treedef, shardings)
