"""int8 KV cache numerics (models/lm.py quant cache + decode_attention).

The KV stream is the decode step's dominant scaling term at serving note
lengths (tools/stream_bench.py, 2026-08-21: 3.4 us per prompt token at
b16); int8 K/V halves it. The scheme stores per-(layer, head) f32 scales
calibrated from the prefill block and factors them OUT of the kernels:
q pre-scaled by k_scale, output post-scaled by v_scale — so these tests
pin (a) the algebra against a dequantized oracle, (b) the Pallas split
path against the XLA reference, (c) a full engine decode under
kv_quant="int8".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_transformer_tpu.models.lm import init_kv_cache, quantize_kv
from video_transformer_tpu.ops.decode_attention import (
    decode_attention_reference,
    decode_attention_update,
    update_cache_rows,
)


def _setup(b=2, hq=4, hkv=2, w=8, d=32, s=1024, idx=(99, 800), seed=3):
    keys = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(keys[0], (b, hq, w, d), jnp.float32)
    k_cache = jax.random.normal(keys[1], (b, hkv, s, d), jnp.float32)
    v_cache = jax.random.normal(keys[2], (b, hkv, s, d), jnp.float32)
    k_new = jax.random.normal(keys[3], (b, hkv, w, d), jnp.float32)
    v_new = jax.random.normal(keys[4], (b, hkv, w, d), jnp.float32)
    index = jnp.asarray(idx, jnp.int32)
    return q, k_cache, v_cache, k_new, v_new, index


class TestQuantizedDecodeAttention:
    def _scales(self, k_cache, v_cache):
        ks = 1.5 * jnp.max(jnp.abs(k_cache), axis=(0, 2, 3)) / 127.0
        vs = 1.5 * jnp.max(jnp.abs(v_cache), axis=(0, 2, 3)) / 127.0
        return ks, vs

    def test_reference_path_matches_dequant_oracle(self):
        q, k_cache, v_cache, k_new, v_new, index = _setup()
        ks, vs = self._scales(k_cache, v_cache)
        k_q = quantize_kv(k_cache, ks)
        v_q = quantize_kv(v_cache, vs)

        out, k_out, v_out = decode_attention_update(
            q, k_q, v_q, k_new, v_new, index,
            force_reference=True, k_scale=ks, v_scale=vs,
        )
        # Oracle: dequantize the post-write caches, run exact attention.
        kd = k_out.astype(jnp.float32) * ks[None, :, None, None]
        vd = v_out.astype(jnp.float32) * vs[None, :, None, None]
        expected = decode_attention_reference(q, kd, vd, index + 1)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), atol=1e-5, rtol=1e-5
        )
        assert k_out.dtype == jnp.int8 and v_out.dtype == jnp.int8
        # And the quantization itself is faithful: dequantized cache within
        # one scale step of the original values.
        w = k_new.shape[2]
        for row, base in enumerate(np.asarray(index)):
            got = np.asarray(kd)[row, :, base : base + w]
            np.testing.assert_allclose(
                got, np.asarray(k_new)[row], atol=float(ks.max()) + 1e-6
            )

    def test_quantization_error_bounded(self):
        """End-to-end attention error vs the UNQUANTIZED oracle stays small
        relative to the output spread (int8 over a calibrated range)."""
        q, k_cache, v_cache, k_new, v_new, index = _setup()
        ks, vs = self._scales(k_cache, v_cache)
        out_q, _, _ = decode_attention_update(
            q, quantize_kv(k_cache, ks), quantize_kv(v_cache, vs),
            k_new, v_new, index,
            force_reference=True, k_scale=ks, v_scale=vs,
        )
        k_ref = update_cache_rows(k_cache, k_new, index)
        v_ref = update_cache_rows(v_cache, v_new, index)
        out_f = decode_attention_reference(q, k_ref, v_ref, index + 1)
        err = float(jnp.mean(jnp.abs(out_q - out_f)))
        spread = float(jnp.std(out_f))
        assert err < 0.05 * spread, (err, spread)

    def test_split_kernel_path_matches_reference_int8(self):
        """The Pallas split-write path (interpret mode) on int8 caches must
        match the XLA reference int8 path: same quantized rows, same
        scale-factored attention."""
        from video_transformer_tpu.ops.decode_attention import (
            _batch_row_write_pallas,
            _decode_attention_pallas,
        )

        q, k_cache, v_cache, k_new, v_new, index = _setup(w=13, idx=(5, 900))
        ks, vs = self._scales(k_cache, v_cache)
        k_q = quantize_kv(k_cache, ks)
        v_q = quantize_kv(v_cache, vs)

        ref_out, ref_k, ref_v = decode_attention_update(
            q, k_q, v_q, k_new, v_new, index,
            force_reference=True, k_scale=ks, v_scale=vs,
        )

        group = q.shape[1] // k_cache.shape[1]
        k_out, v_out = _batch_row_write_pallas(
            k_q, v_q, quantize_kv(k_new, ks), quantize_kv(v_new, vs),
            index, interpret=True,
        )
        # Valid region only: the write kernel zero-fills its aligned RMW
        # tail slack (never attended, rewritten by later steps).
        w = k_new.shape[2]
        for row, base in enumerate(np.asarray(index)):
            hi = int(base) + w
            np.testing.assert_array_equal(
                np.asarray(k_out)[row, :, :hi], np.asarray(ref_k)[row, :, :hi]
            )
            np.testing.assert_array_equal(
                np.asarray(v_out)[row, :, :hi], np.asarray(ref_v)[row, :, :hi]
            )

        ks_q = jnp.repeat(ks, group)
        vs_q = jnp.repeat(vs, group)
        out = _decode_attention_pallas(
            q * ks_q[None, :, None, None], k_out, v_out, index + 1,
            interpret=True,
        )
        out = out * vs_q[None, :, None, None]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_out), atol=3e-4, rtol=3e-4
        )


class TestEngineKvQuant:
    def test_cache_structure(self):
        from video_transformer_tpu.models.config import get_preset

        cfg = get_preset("tiny").decoder
        cache = init_kv_cache(cfg, 2, 256, jnp.bfloat16, quant=True)
        assert cache["k"][0].dtype == jnp.int8
        assert cache["k_scale"][0].shape == (cfg.num_kv_heads,)

    @pytest.mark.slow
    def test_tiny_engine_generates_under_kv_quant(self):
        """Full constrained decode with the int8 cache (CPU reference
        fallback): the note completes and is schema-valid JSON. Exact
        greedy equality with the bf16 cache is NOT asserted — random-init
        logits cluster tightly, so int8's sub-percent logit perturbation
        legitimately flips greedy ties; quality-neutrality on trained
        weights is gated on-chip (eval_grounding under VTX_KV_QUANT)."""
        import json

        import __graft_entry__

        from video_transformer_tpu.parallel.engine import InferenceEngine

        from video_transformer_tpu.ops.constrained import DfaBuilder

        dfa = (
            DfaBuilder()
            .literal('{"title": ')
            .free_string(2, 40)
            .literal(', "summary": ')
            .free_string(2, 60)
            .literal("}")
            .finish()
        )
        config = __graft_entry__._tiny_config()
        engine = InferenceEngine(
            config,
            dfa=dfa,
            max_new_tokens=256,
            temperature=0.7,
            structure_bias=1.5,
            seed=0,
            compilation_cache_dir=None,
            kv_quant="int8",
        )
        text, status = engine.generate_text(["分析要点"], return_status=True)
        assert status[0], f"note did not complete: {text[0][-80:]}"
        data = json.loads(text[0])
        assert "title" in data
