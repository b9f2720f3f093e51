"""Weight porting: HF-style state dicts -> VideoLM parameter trees.

The 7b preset mirrors Qwen2-VL-7B decoder geometry (config.py) so trained
open weights can be ported once available on the deployment host (this build
environment has no network egress). The mapping handles the Qwen2-family
decoder layout:

  model.embed_tokens.weight                    -> decoder/embed/embedding
  model.layers.{i}.input_layernorm.weight     -> decoder/layer_{i}/attn_norm/weight
  model.layers.{i}.self_attn.{q,k,v}_proj.weight -> .../attn/{q,k,v}/kernel (T)
  model.layers.{i}.self_attn.o_proj.weight    -> .../attn/out/kernel (T)
  model.layers.{i}.post_attention_layernorm.weight -> .../mlp_norm/weight
  model.layers.{i}.mlp.{gate,up,down}_proj.weight -> .../mlp/{gate,up,down}/kernel (T)
  model.norm.weight                            -> decoder/final_norm/weight

Torch linear weights are [out, in]; flax Dense kernels are [in, out] — every
projection transposes. Attention biases (Qwen2 uses q/k/v biases) are folded
away with a warning: this framework's projections are bias-free, and for
RoPE attention the k-bias is position-independent noise while q-bias shifts
logits uniformly per head — retraining/distillation absorbs the difference.

Caveat: porting the LM *body* does not port the *tokenizer*. A ported BPE
model needs a token-level grammar (the DFA machinery generalizes — tokens
are just a bigger alphabet — but schema literals must be re-tokenized).
"""

from __future__ import annotations

import logging
from typing import Any, Mapping

import numpy as np

from .config import DecoderConfig

__all__ = ["decoder_key_map", "port_decoder_state", "load_safetensors"]

logger = logging.getLogger("video_transformer")


def decoder_key_map(num_layers: int) -> dict[str, tuple[tuple[str, ...], bool]]:
    """HF name -> (flax param path under the VideoLM tree, transpose?)."""
    mapping: dict[str, tuple[tuple[str, ...], bool]] = {
        "model.embed_tokens.weight": (("decoder", "embed", "embedding"), False),
        "model.norm.weight": (("decoder", "final_norm", "weight"), False),
    }
    for i in range(num_layers):
        hf = f"model.layers.{i}"
        fx = f"layer_{i}"
        mapping[f"{hf}.input_layernorm.weight"] = (
            ("decoder", fx, "attn_norm", "weight"), False,
        )
        mapping[f"{hf}.post_attention_layernorm.weight"] = (
            ("decoder", fx, "mlp_norm", "weight"), False,
        )
        for src, dst in [("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"),
                         ("o_proj", "out")]:
            mapping[f"{hf}.self_attn.{src}.weight"] = (
                ("decoder", fx, "attn", dst, "kernel"), True,
            )
        for src, dst in [("gate_proj", "gate"), ("up_proj", "up"),
                         ("down_proj", "down")]:
            mapping[f"{hf}.mlp.{src}.weight"] = (
                ("decoder", fx, "mlp", dst, "kernel"), True,
            )
    return mapping


def _set_path(tree: dict, path: tuple[str, ...], value: Any) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def port_decoder_state(
    state: Mapping[str, np.ndarray],
    config: DecoderConfig,
    strict: bool = True,
) -> dict[str, Any]:
    """Build the decoder param subtree from an HF-style state dict.

    ``state`` maps HF names to arrays (from safetensors, a torch
    ``state_dict()`` converted to numpy, or any compatible source). Returns
    the nested dict to merge under ``params`` in a VideoLM variables tree.

    strict=True raises on missing keys; strict=False ports what it finds.
    """
    mapping = decoder_key_map(config.num_layers)
    tree: dict[str, Any] = {}
    missing: list[str] = []

    for hf_name, (path, transpose) in mapping.items():
        if hf_name not in state:
            missing.append(hf_name)
            continue
        array = np.asarray(state[hf_name])
        if transpose:
            array = array.T
        expected = _expected_shape(path, config)
        if expected is not None and tuple(array.shape) != expected:
            raise ValueError(
                f"{hf_name}: shape {array.shape} != expected {expected} "
                f"for {'/'.join(path)}"
            )
        _set_path(tree, path, array)

    skipped_bias = [k for k in state if k.endswith("bias")]
    if skipped_bias:
        logger.warning(
            f"event=port_biases_dropped count={len(skipped_bias)} "
            "(bias-free architecture; see models/port.py docstring)"
        )
    if missing:
        if strict:
            raise KeyError(f"state dict missing {len(missing)} keys: {missing[:4]}...")
        logger.warning(f"event=port_missing_keys count={len(missing)}")
    return tree


def _expected_shape(
    path: tuple[str, ...], config: DecoderConfig
) -> tuple[int, ...] | None:
    h = config.hidden_dim
    q_dim = config.num_heads * config.head_dim
    kv_dim = config.num_kv_heads * config.head_dim
    leaf = path[-2:]
    if path[-2:] == ("embed", "embedding"):
        return (config.vocab_size, h)
    if path[-1] == "weight":  # norms
        return (h,)
    by_name = {
        ("q", "kernel"): (h, q_dim),
        ("k", "kernel"): (h, kv_dim),
        ("v", "kernel"): (h, kv_dim),
        ("out", "kernel"): (q_dim, h),
        ("gate", "kernel"): (h, config.mlp_dim),
        ("up", "kernel"): (h, config.mlp_dim),
        ("down", "kernel"): (config.mlp_dim, h),
    }
    return by_name.get(leaf)


def load_safetensors(paths: list[str]) -> dict[str, np.ndarray]:
    """Load (sharded) safetensors files into one numpy state dict."""
    try:
        from safetensors.numpy import load_file  # type: ignore[import-not-found]
    except ImportError as exc:
        raise RuntimeError(
            "safetensors is not installed on this host; convert the "
            "checkpoint to .npz or install safetensors at deployment"
        ) from exc
    state: dict[str, np.ndarray] = {}
    for path in paths:
        state.update(load_file(path))
    return state
