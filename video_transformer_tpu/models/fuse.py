"""Serve-time horizontal fusion of the decoder's projection matmuls.

Decode at small batch is dominated by per-op launch cost, not FLOPs: the
corrected roofline (docs/roofline.md) puts the base/int8 weight stream at
0.367 GB/step — a ~1,300 steps/s bandwidth floor — while the measured loop
runs ~300 steps/s, so most of each step is op overhead across the ~7 narrow
matmul dispatches per block (q, k, v, out, gate, up, down). Concatenating
q/k/v into one [H, q+2kv] kernel and gate/up into one [H, 2*mlp] kernel cuts
that to 5 wider dispatches per block with identical math: each output column
of a dense matmul is an independent dot product, so concatenation along the
OUTPUT axis changes neither values nor reduction order.

This is a pure serving transform, applied by the engine after checkpoint
restore/quantization (parallel/engine.py::_place) — checkpoints on disk,
training, and the tensor-parallel path keep the unfused layout (separate
q/k/v shard cleanly over the 'model' mesh axis; fused concat would not, so
the engine only fuses when that axis has size 1). lm.Attention / lm.SwiGLU
read the fused leaves when present and fall back to the per-projection
QDense modules otherwise.

Works on f32/bf16 kernels, int8 (+ per-output-channel scales in the
``quant`` collection), and nibble-packed int4 (uint8 [in//2, out] carriers
concat along the output axis like any other kernel).

The reference has no model/serving code to compare against (cloud API
calls); this is TPU-serving machinery in its own right.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["fuse_projections"]


def _concat_into(node: dict, names: tuple[str, ...], fused_prefix: str) -> None:
    """Pop ``names`` sub-dicts from ``node`` and install fused leaves.

    kernels concat along axis=1 (the output axis — valid for [in, out]
    float/int8 kernels AND packed-int4 [in//2, out] carriers), biases and
    scales along axis=0 (they are [out] vectors)."""
    parts = [node.pop(name) for name in names]
    node[f"{fused_prefix}_kernel"] = jnp.concatenate(
        [p["kernel"] for p in parts], axis=1
    )
    if all("bias" in p for p in parts):
        node[f"{fused_prefix}_bias"] = jnp.concatenate(
            [p["bias"] for p in parts], axis=0
        )


def fuse_projections(variables: dict[str, Any]) -> dict[str, Any]:
    """Return a NEW variables dict with per-block q/k/v -> qkv and
    gate/up -> gateup fused leaves (see module docstring). Idempotent:
    already-fused layers (no separate q/k/v) are left alone."""
    params = variables.get("params", {})
    decoder = params.get("decoder")
    if decoder is None:
        return dict(variables)

    # tree_map(identity) deep-copies the dict SKELETON (leaves shared), so
    # in-place edits below never alias the caller's tree.
    new_decoder = jax.tree_util.tree_map(lambda x: x, decoder)
    quant = variables.get("quant", {})
    quant_decoder = quant.get("decoder", {}) if isinstance(quant, dict) else {}
    new_qdec = jax.tree_util.tree_map(lambda x: x, quant_decoder)

    for lname, layer in new_decoder.items():
        if not (isinstance(layer, dict) and "attn" in layer and "mlp" in layer):
            continue
        qlayer = new_qdec.get(lname, {})
        attn = layer["attn"]
        if all(n in attn for n in ("q", "k", "v")):
            _concat_into(attn, ("q", "k", "v"), "qkv")
            qattn = qlayer.get("attn", {})
            if all(n in qattn for n in ("q", "k", "v")):
                qattn["qkv_scale"] = jnp.concatenate(
                    [qattn.pop(n)["scale"] for n in ("q", "k", "v")], axis=0
                )
        mlp = layer["mlp"]
        if all(n in mlp for n in ("gate", "up")):
            _concat_into(mlp, ("gate", "up"), "gateup")
            qmlp = qlayer.get("mlp", {})
            if all(n in qmlp for n in ("gate", "up")):
                qmlp["gateup_scale"] = jnp.concatenate(
                    [qmlp.pop(n)["scale"] for n in ("gate", "up")], axis=0
                )

    out = dict(variables, params=dict(params, decoder=new_decoder))
    if new_qdec:
        out["quant"] = dict(quant, decoder=new_qdec)
    return out
