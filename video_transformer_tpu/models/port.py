"""Weight porting: HF-style state dicts -> VideoLM parameter trees.

The 7b preset mirrors Qwen2-VL-7B decoder geometry (config.py) so trained
open weights can be ported once available on the deployment host (this build
environment has no network egress). The mapping handles the Qwen2-family
decoder layout:

  model.embed_tokens.weight                    -> decoder/embed/embedding
  model.layers.{i}.input_layernorm.weight     -> decoder/layer_{i}/attn_norm/weight
  model.layers.{i}.self_attn.{q,k,v}_proj.weight -> .../attn/{q,k,v}/kernel (T)
  model.layers.{i}.self_attn.{q,k,v}_proj.bias   -> .../attn/{q,k,v}/bias
  model.layers.{i}.self_attn.o_proj.weight    -> .../attn/out/kernel (T)
  model.layers.{i}.post_attention_layernorm.weight -> .../mlp_norm/weight
  model.layers.{i}.mlp.{gate,up,down}_proj.weight -> .../mlp/{gate,up,down}/kernel (T)
  model.norm.weight                            -> decoder/final_norm/weight
  lm_head.weight                               -> decoder/lm_head (untied, [V, H])

Torch linear weights are [out, in]; flax Dense kernels are [in, out] — every
projection transposes (biases and the [V, H] lm_head port verbatim). The
q/k/v biases are applied BEFORE RoPE exactly as HF does (the k-bias is
rotated per position, so it changes attention logits content-dependently and
cannot be dropped or folded); parity of the ported decoder against the HF
torch module is pinned by tests/test_qwen_port.py::TestDecoderPortParity.

The VISION tower maps onto models/qwen_vit.py (a faithful Qwen2-VL ViT):

  visual.patch_embed.proj.weight [D,3,Tp,P,P] -> patch_embed/kernel
      (conv3d with stride == kernel == one matmul: reshape(D,-1).T — the
      flatten order (c, t, h, w) matches qwen_patchify's patch layout)
  visual.blocks.{i}.norm{1,2}.{weight,bias} -> block_{i}/norm{1,2}_{scale,bias}
  visual.blocks.{i}.attn.qkv.{weight,bias} -> block_{i}/qkv (fused, T)
  visual.blocks.{i}.attn.proj.{weight,bias} -> block_{i}/proj (T)
  visual.blocks.{i}.mlp.fc{1,2}.{weight,bias} -> block_{i}/fc{1,2} (T)
  visual.merger.ln_q.{weight,bias} -> merger_ln_{scale,bias}
  visual.merger.mlp.{0,2}.{weight,bias} -> merger_fc{1,2} (T)

Numerical parity of the ported tower against the HF torch module is pinned
by tests/test_qwen_port.py (random-weight round trip — no downloads needed).

Tokenizer: a ported BPE vocab plugs into the engine via models/bpe.py and
decodes under the token-level grammar (ops/token_grammar.py).
"""

from __future__ import annotations

import logging
from typing import Any, Mapping

import numpy as np

from .config import DecoderConfig
from .qwen_vit import QwenVisionConfig

__all__ = [
    "decoder_key_map",
    "port_decoder_state",
    "vision_key_map",
    "port_vision_state",
    "normalize_qwen2vl_keys",
    "load_safetensors",
    "checkpoint_shard_paths",
    "load_qwen2vl_dir",
]

logger = logging.getLogger("video_transformer")


def normalize_qwen2vl_keys(state: Mapping[str, Any]) -> dict[str, Any]:
    """Rename transformers>=4.52 in-memory names to the hub checkpoint layout.

    Hub safetensors use ``model.embed_tokens...`` / ``visual...`` /
    ``lm_head.weight``; newer transformers state_dicts nest the text stack
    under ``model.language_model`` and the tower under ``model.visual``.
    Idempotent on hub-layout names.
    """
    out: dict[str, Any] = {}
    for key, value in state.items():
        if key.startswith("model.language_model."):
            key = "model." + key[len("model.language_model."):]
        elif key.startswith("model.visual."):
            key = key[len("model."):]
        out[key] = value
    return out


def decoder_key_map(
    num_layers: int,
    qkv_bias: bool = False,
    tied_embeddings: bool = True,
) -> dict[str, tuple[tuple[str, ...], bool]]:
    """HF name -> (flax param path under the VideoLM tree, transpose?)."""
    mapping: dict[str, tuple[tuple[str, ...], bool]] = {
        "model.embed_tokens.weight": (("decoder", "embed", "embedding"), False),
        "model.norm.weight": (("decoder", "final_norm", "weight"), False),
    }
    if not tied_embeddings:
        # Untied logits head; HF layout [V, H] is kept verbatim (lm.py reads
        # it with the same einsum as the tied embedding table).
        mapping["lm_head.weight"] = (("decoder", "lm_head"), False)
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
        if qkv_bias:
            for src, dst in [("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v")]:
                mapping[f"{hf}.self_attn.{src}.bias"] = (
                    ("decoder", fx, "attn", dst, "bias"), False,
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
    mapping = decoder_key_map(
        config.num_layers,
        qkv_bias=config.qkv_bias,
        tied_embeddings=config.tied_embeddings,
    )
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

    unmapped = [
        k for k in state
        if k not in mapping and not k.startswith("visual.")
    ]
    if unmapped:
        logger.warning(
            f"event=port_unmapped_keys count={len(unmapped)} "
            f"sample={unmapped[:4]} (config qkv_bias={config.qkv_bias} "
            f"tied_embeddings={config.tied_embeddings})"
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
    if path[-1] == "lm_head":
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
        ("q", "bias"): (q_dim,),
        ("k", "bias"): (kv_dim,),
        ("v", "bias"): (kv_dim,),
    }
    return by_name.get(leaf)


def vision_key_map(depth: int) -> dict[str, tuple[tuple[str, ...], bool]]:
    """HF vision name -> (flax path under QwenVisionEncoder, transpose?)."""
    mapping: dict[str, tuple[tuple[str, ...], bool]] = {
        "merger.ln_q.weight": (("merger_ln_scale",), False),
        "merger.ln_q.bias": (("merger_ln_bias",), False),
        "merger.mlp.0.weight": (("merger_fc1", "kernel"), True),
        "merger.mlp.0.bias": (("merger_fc1", "bias"), False),
        "merger.mlp.2.weight": (("merger_fc2", "kernel"), True),
        "merger.mlp.2.bias": (("merger_fc2", "bias"), False),
    }
    for i in range(depth):
        hf = f"blocks.{i}"
        fx = f"block_{i}"
        for norm in ("norm1", "norm2"):
            mapping[f"{hf}.{norm}.weight"] = ((fx, f"{norm}_scale"), False)
            mapping[f"{hf}.{norm}.bias"] = ((fx, f"{norm}_bias"), False)
        for src, dst in [("attn.qkv", "qkv"), ("attn.proj", "proj"),
                         ("mlp.fc1", "fc1"), ("mlp.fc2", "fc2")]:
            mapping[f"{hf}.{src}.weight"] = ((fx, dst, "kernel"), True)
            mapping[f"{hf}.{src}.bias"] = ((fx, dst, "bias"), False)
    return mapping


def port_vision_state(
    state: Mapping[str, np.ndarray],
    config: QwenVisionConfig,
    strict: bool = True,
) -> dict[str, Any]:
    """Build the QwenVisionEncoder param tree from an HF vision state dict.

    Accepts names with or without the ``visual.`` prefix (full-model vs
    tower-only state dicts).
    """
    state = {
        (k[len("visual."):] if k.startswith("visual.") else k): v
        for k, v in state.items()
    }
    tree: dict[str, Any] = {}
    missing: list[str] = []

    conv_key = "patch_embed.proj.weight"
    if conv_key in state:
        conv = np.asarray(state[conv_key])
        expected = (
            config.embed_dim, config.in_channels,
            config.temporal_patch_size, config.patch_size, config.patch_size,
        )
        if tuple(conv.shape) != expected:
            raise ValueError(
                f"{conv_key}: shape {conv.shape} != expected {expected}"
            )
        # stride == kernel conv3d == matmul; torch reshape(D, -1) flattens
        # (c, t, h, w) — exactly qwen_patchify's patch-vector layout.
        _set_path(tree, ("patch_embed", "kernel"), conv.reshape(conv.shape[0], -1).T)
    else:
        missing.append(conv_key)

    for hf_name, (path, transpose) in vision_key_map(config.depth).items():
        if hf_name not in state:
            missing.append(hf_name)
            continue
        array = np.asarray(state[hf_name])
        if transpose:
            array = array.T
        _set_path(tree, path, array)

    if missing:
        if strict:
            raise KeyError(
                f"vision state dict missing {len(missing)} keys: {missing[:4]}..."
            )
        logger.warning(f"event=port_vision_missing_keys count={len(missing)}")
    return tree


def load_safetensors(paths: list[str]) -> dict[str, np.ndarray]:
    """Load (sharded) safetensors files into one numpy state dict.

    bf16 tensors load natively (the numpy backend uses ml_dtypes.bfloat16,
    which the engine's serving cast consumes directly).
    """
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


def checkpoint_shard_paths(directory: str) -> list[str]:
    """Shard files of an HF checkpoint directory.

    Prefers ``model.safetensors.index.json``'s weight_map (the layout
    ``transformers`` writes for sharded checkpoints like Qwen2-VL-7B's
    5-shard split); falls back to globbing ``*.safetensors``.
    """
    import json
    from pathlib import Path

    d = Path(directory)
    index = d / "model.safetensors.index.json"
    if index.exists():
        weight_map = json.loads(index.read_text())["weight_map"]
        return sorted({str(d / shard) for shard in weight_map.values()})
    return sorted(str(p) for p in d.glob("*.safetensors"))


def load_qwen2vl_dir(directory: str, config, strict: bool = True) -> dict[str, Any]:
    """HF Qwen2-VL checkpoint directory -> VideoLM params subtree.

    The single deployment entry point: point it at a downloaded hub
    checkpoint (sharded safetensors + index.json, e.g. Qwen2-VL-7B-Instruct)
    and get back the ``{"visual": ..., "decoder": ...}`` tree that mounts
    under ``params`` of a VideoLM built from the matching preset
    (``get_preset("qwen2vl-7b")``). ``InferenceEngine.restore`` calls this
    automatically when its path contains safetensors files, so serving a
    real checkpoint is one config line:
    ``engine.checkpoint_dir: /path/to/Qwen2-VL-7B-Instruct``.

    ``config`` is the VLMConfig; its encoder must be a QwenVisionConfig
    (ported tower) — the native VideoEncoder has no HF counterpart.
    """
    from .config import EncoderConfig

    if isinstance(config.encoder, EncoderConfig):
        raise ValueError(
            "HF checkpoint load needs a ported-tower preset (QwenVisionConfig "
            "encoder, e.g. get_preset('qwen2vl-7b')); the native VideoEncoder "
            f"has no HF counterpart (config: {config.name})"
        )
    paths = checkpoint_shard_paths(directory)
    if not paths:
        raise FileNotFoundError(f"no .safetensors shards under {directory}")
    logger.info(
        f"event=hf_checkpoint_load dir={directory} shards={len(paths)}"
    )
    state = normalize_qwen2vl_keys(load_safetensors(paths))
    # port_decoder_state returns a tree already rooted at "decoder"; the
    # vision tree mounts beside it under the VLM's "visual" scope.
    tree = port_decoder_state(state, config.decoder, strict=strict)
    tree["visual"] = port_vision_state(state, config.encoder, strict=strict)
    return tree
