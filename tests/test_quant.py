"""int8 weight-only serving quantization (models/quant.py, lm.QDense).

Decode at small batch is weight-bandwidth bound; int8 kernels halve the
bytes streamed from HBM per step. These tests pin the numerics (per-channel
dequant error, logits agreement), the engine integration (generation under
the grammar, checkpoint restore, tensor-parallel sharding of the scales),
and that training paths are untouched (no quant collection -> plain dense).
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import __graft_entry__
from video_transformer_tpu.analyzer.schema import note_dfa
from video_transformer_tpu.models.quant import (
    QUANTIZED_DENSE_NAMES,
    quantize_decoder_int8,
)
from video_transformer_tpu.parallel.engine import InferenceEngine


class TestQuantizeTree:
    def test_kernels_become_int8_with_scales(self):
        config = __graft_entry__._tiny_config()
        from video_transformer_tpu.models.vlm import VideoLM

        model = VideoLM(config)
        variables = model.init_variables(jax.random.PRNGKey(0))
        quantized = quantize_decoder_int8(variables)

        layer = quantized["params"]["decoder"]["layer_0"]
        for group, names in (("attn", ("q", "k", "v", "out")),
                             ("mlp", ("gate", "up", "down"))):
            for name in names:
                assert layer[group][name]["kernel"].dtype == jnp.int8, name
        qlayer = quantized["quant"]["decoder"]["layer_0"]
        scale = qlayer["attn"]["q"]["scale"]
        kernel = variables["params"]["decoder"]["layer_0"]["attn"]["q"]["kernel"]
        assert scale.shape == (kernel.shape[1],)
        # Non-decoder parts stay f32.
        enc = quantized["params"]["encoder"]
        flat = jax.tree_util.tree_leaves(enc)
        assert all(leaf.dtype != jnp.int8 for leaf in flat)

    def test_dequant_error_bounded(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
        from video_transformer_tpu.models.quant import _quantize_kernel

        q, scale = _quantize_kernel(w)
        dequant = q.astype(jnp.float32) * scale[None, :]
        # Per-channel symmetric int8: max error is scale/2 per element.
        err = jnp.max(jnp.abs(dequant - w) / scale[None, :])
        assert float(err) <= 0.5 + 1e-3

    def test_idempotent(self):
        config = __graft_entry__._tiny_config()
        from video_transformer_tpu.models.vlm import VideoLM

        variables = VideoLM(config).init_variables(jax.random.PRNGKey(0))
        once = quantize_decoder_int8(variables)
        twice = quantize_decoder_int8(once)
        k1 = once["params"]["decoder"]["layer_0"]["mlp"]["gate"]["kernel"]
        k2 = twice["params"]["decoder"]["layer_0"]["mlp"]["gate"]["kernel"]
        assert k1.dtype == k2.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


class TestQuantizedForward:
    def test_logits_close_to_f32(self):
        """Weight-only per-channel int8 must track the f32 forward closely
        enough that the grammar-constrained argmax rarely flips."""
        config = __graft_entry__._tiny_config()
        from video_transformer_tpu.models.vlm import VideoLM

        model = VideoLM(config)
        variables = model.init_variables(jax.random.PRNGKey(0))
        quantized = quantize_decoder_int8(variables)

        rng = np.random.default_rng(1)
        patches = jnp.asarray(
            rng.standard_normal(
                (1, config.encoder.tokens_per_clip, config.encoder.patch_dim)
            ).astype(np.float32)
        )
        tokens = jnp.asarray(rng.integers(0, 255, (1, 16)), jnp.int32)
        lf = model.apply(variables, patches, tokens)
        lq = model.apply(quantized, patches, tokens)
        # Compare normalized logits (bf16 compute): the quantization error
        # should be small relative to the logit scale.
        denom = float(jnp.std(lf)) + 1e-6
        rel = float(jnp.max(jnp.abs(lf - lq))) / denom
        assert rel < 0.35, f"relative logit deviation {rel:.3f}"


def _compact_dfa():
    from video_transformer_tpu.ops.constrained import DfaBuilder

    return (
        DfaBuilder()
        .literal('{"title": ')
        .free_string(2, 40)
        .literal(', "summary": ')
        .free_string(2, 60)
        .literal("}")
        .finish()
    )


class TestQuantizedEngine:
    @pytest.fixture(scope="class")
    def engine(self):
        config = __graft_entry__._tiny_config()
        return InferenceEngine(
            config,
            dfa=_compact_dfa(),
            max_new_tokens=256,
            temperature=0.7,
            structure_bias=1.5,
            seed=0,
            compilation_cache_dir=None,
            quantize="int8",
        )

    def test_generates_valid_note_json(self, engine):
        frames = np.random.default_rng(0).integers(
            0, 255, (1, 4, 64, 64, 3), dtype=np.uint8
        )
        texts, complete = engine.generate(
            frames, ["分析视频"], prompt_len=16, return_status=True
        )
        assert complete == [True]
        data = json.loads(texts[0])  # grammar guarantees syntax
        assert "title" in data

    def test_sharded_quantized_engine(self):
        """dp x tp = 4 x 2: int8 kernels and their scales shard together."""
        from video_transformer_tpu.parallel.mesh import build_mesh

        config = __graft_entry__._tiny_config()
        engine = InferenceEngine(
            config,
            mesh=build_mesh({"data": 4, "model": 2}),
            dfa=_compact_dfa(),
            max_new_tokens=256,
            temperature=0.7,
            structure_bias=2.0,
            seed=0,
            compilation_cache_dir=None,
            quantize="int8",
        )
        frames = np.random.default_rng(0).integers(
            0, 255, (2, 4, 64, 64, 3), dtype=np.uint8
        )
        texts = engine.generate(frames, ["分析", "分析"], prompt_len=16)
        assert len(texts) == 2

    def test_restore_requantizes(self, engine, tmp_path):
        """Checkpoint restore goes through the f32 template then re-applies
        the int8 transform."""
        import orbax.checkpoint as ocp

        config = __graft_entry__._tiny_config()
        # The donor stands in for the trainer: checkpoints on disk carry the
        # UNFUSED f32 layout (projection fusion is a serve-time transform),
        # so the donor must not fuse or its saved tree would not match the
        # engine's restore template.
        donor = InferenceEngine(
            config, max_new_tokens=8, seed=5, compilation_cache_dir=None,
            fuse_projections=False,
        )
        ckpt = tmp_path / "params_1"
        with ocp.StandardCheckpointer() as checkpointer:
            checkpointer.save(str(ckpt), donor.params)

        engine.restore(str(tmp_path))
        # The serving engine re-applies its transforms on restore. When
        # projection fusion is active (engine.fuse_projections) the q
        # columns are the first q_dim of the fused qkv kernel; otherwise
        # the per-projection layout survives.
        attn = engine.params["params"]["decoder"]["layer_0"]["attn"]
        qattn = engine.params["quant"]["decoder"]["layer_0"]["attn"]
        q_dim = config.decoder.num_heads * config.decoder.head_dim
        if engine.fuse_projections:
            k = attn["qkv_kernel"][:, :q_dim]
            scale = qattn["qkv_scale"][:q_dim]
        else:
            k = attn["q"]["kernel"]
            scale = qattn["q"]["scale"]
        assert k.dtype == jnp.int8
        donor_k = donor.params["params"]["decoder"]["layer_0"]["attn"]["q"]["kernel"]
        dequant = np.asarray(k, np.float32) * np.asarray(scale)[None, :]
        np.testing.assert_allclose(
            dequant, np.asarray(donor_k, np.float32), atol=np.asarray(scale).max()
        )


class TestTrainingUntouched:
    def test_no_quant_collection_means_plain_dense(self):
        config = __graft_entry__._tiny_config()
        from video_transformer_tpu.models.vlm import VideoLM

        model = VideoLM(config)
        variables = model.init_variables(jax.random.PRNGKey(0))
        rng = np.random.default_rng(2)
        patches = jnp.asarray(
            rng.standard_normal(
                (1, config.encoder.tokens_per_clip, config.encoder.patch_dim)
            ).astype(np.float32)
        )
        tokens = jnp.asarray(rng.integers(0, 255, (1, 8)), jnp.int32)
        logits = model.apply(variables, patches, tokens)
        assert logits.dtype == jnp.float32
        assert np.isfinite(np.asarray(logits)).all()


class TestInt4:
    def test_kernels_become_int4_with_scales(self):
        config = __graft_entry__._tiny_config()
        from video_transformer_tpu.models.quant import quantize_decoder_int4
        from video_transformer_tpu.models.vlm import VideoLM

        model = VideoLM(config)
        variables = model.init_variables(jax.random.PRNGKey(0))
        quantized = quantize_decoder_int4(variables)
        layer = quantized["params"]["decoder"]["layer_0"]
        packed = layer["mlp"]["down"]["kernel"]
        full = variables["params"]["decoder"]["layer_0"]["mlp"]["down"]["kernel"]
        # Nibble-packed uint8 carrier: two input rows per byte.
        assert packed.dtype == jnp.uint8
        assert packed.shape == (full.shape[0] // 2, full.shape[1])
        scale = quantized["quant"]["decoder"]["layer_0"]["mlp"]["down"]["scale"]
        assert scale.shape == (packed.shape[1],)

    def test_int4_pack_unpack_roundtrip(self):
        from video_transformer_tpu.models.quant import pack_int4, unpack_int4

        rng = np.random.default_rng(11)
        q = jnp.asarray(rng.integers(-7, 8, (64, 24)), jnp.int8)
        even, odd = unpack_int4(pack_int4(q))
        np.testing.assert_array_equal(np.asarray(even), np.asarray(q[0::2]))
        np.testing.assert_array_equal(np.asarray(odd), np.asarray(q[1::2]))

    def test_int4_dequant_error_bounded(self):
        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
        from video_transformer_tpu.models.quant import _quantize_kernel

        q, scale = _quantize_kernel(w, jnp.int8, 7)
        dequant = q.astype(jnp.float32) * scale[None, :]
        err = jnp.max(jnp.abs(dequant - w) / scale[None, :])
        assert float(err) <= 0.5 + 1e-3

    def test_int4_engine_generates_valid_note_json(self):
        """The full constrained decode holds under int4 weights: the grammar
        carries structure regardless of weight resolution (the quality
        trade is content, which the bench/evals measure on hardware)."""
        config = __graft_entry__._tiny_config()
        engine = InferenceEngine(
            config,
            dfa=note_dfa(config.decoder.vocab_size, scale=0.25),
            max_new_tokens=512,
            temperature=1.0,
            structure_bias=2.0,
            quantize="int4",
            compilation_cache_dir=None,
        )
        frames = np.random.default_rng(0).integers(
            0, 255, (1, 4, 32, 32, 3), dtype=np.uint8
        )
        text, status = engine.generate(
            frames, ["分析"], prompt_len=32, return_status=True
        )
        if status[0]:
            parsed = json.loads(text[0])
            assert "title" in parsed

    def test_int4_int8_logits_corridor(self):
        """int4 logits stay within a bounded corridor of the f32 logits —
        wider than int8's but finite (sanity against catastrophic scale
        bugs; exact quality is measured by grounding evals)."""
        config = __graft_entry__._tiny_config()
        from video_transformer_tpu.models.quant import quantize_decoder
        from video_transformer_tpu.models.vlm import VideoLM

        model = VideoLM(config)
        variables = model.init_variables(jax.random.PRNGKey(1))
        tokens = jnp.asarray(
            np.random.default_rng(2).integers(
                0, config.decoder.vocab_size, (2, 16)
            ),
            jnp.int32,
        )

        # Use the decoder directly (text path) to compare quant levels.
        from video_transformer_tpu.models.lm import Decoder

        dec = Decoder(config.decoder)
        dec_vars = {"params": variables["params"]["decoder"]}
        f32, _ = dec.apply(dec_vars, tokens, dtype=jnp.float32)
        q8 = quantize_decoder(dec_vars, "int8")
        l8, _ = dec.apply(q8, tokens, dtype=jnp.float32)
        q4 = quantize_decoder(dec_vars, "int4")
        l4, _ = dec.apply(q4, tokens, dtype=jnp.float32)
        err8 = float(jnp.mean(jnp.abs(l8 - f32)))
        err4 = float(jnp.mean(jnp.abs(l4 - f32)))
        spread = float(jnp.std(f32))
        assert err8 < 0.2 * spread
        assert err4 < 0.6 * spread


class TestHostQuantPlacement:
    """Huge host trees are quantized on the HOST before placement.

    The fused-jit _place path stages the full-precision source on the chip
    next to its quantized result; at 7b geometry that is ~24 GB of HBM and
    dies with RESOURCE_EXHAUSTED on a 16 GB part (observed by the round-4
    on-chip 152k-grammar gate). models/quant.py therefore handles numpy
    leaves without touching the device, and InferenceEngine._place routes
    host trees above _HOST_QUANT_BYTES through it. These tests pin the two
    paths to IDENTICAL served parameters.
    """

    def _host_variables(self, config):
        from video_transformer_tpu.models.vlm import VideoLM

        variables = VideoLM(config).init_variables(jax.random.PRNGKey(0))
        return jax.tree_util.tree_map(np.asarray, variables)

    @pytest.mark.parametrize("mode", ["int8", "int4"])
    def test_host_numpy_quantize_matches_device(self, mode):
        from video_transformer_tpu.models.quant import quantize_decoder

        config = __graft_entry__._tiny_config()
        host = self._host_variables(config)
        device = jax.tree_util.tree_map(jnp.asarray, host)
        q_host = quantize_decoder(host, mode)
        q_dev = quantize_decoder(device, mode)
        flat_host, def_host = jax.tree_util.tree_flatten(q_host)
        flat_dev, def_dev = jax.tree_util.tree_flatten(q_dev)
        assert def_host == def_dev
        for a, b in zip(flat_host, flat_dev):
            # The host path must never create device arrays (that is the
            # whole point: no HBM is committed before placement).
            assert not isinstance(a, jax.Array)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_place_host_path_serves_identical_params(self, monkeypatch):
        import video_transformer_tpu.parallel.engine as engine_mod

        config = __graft_entry__._tiny_config()
        host = self._host_variables(config)

        def build():
            return InferenceEngine(
                config,
                dfa=_compact_dfa(),
                max_new_tokens=64,
                temperature=0.7,
                seed=0,
                compilation_cache_dir=None,
                quantize="int8",
                params=jax.tree_util.tree_map(np.copy, host),
            )

        jit_engine = build()
        monkeypatch.setattr(engine_mod, "_HOST_QUANT_BYTES", 0)
        host_engine = build()

        flat_jit, def_jit = jax.tree_util.tree_flatten(jit_engine.params)
        flat_host, def_host = jax.tree_util.tree_flatten(host_engine.params)
        assert def_jit == def_host
        for a, b in zip(flat_jit, flat_host):
            assert a.dtype == b.dtype
            if np.issubdtype(a.dtype, np.integer):
                # Quantized kernels must agree exactly.
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            else:
                # Scales may differ in the last float32 bit: XLA rewrites
                # the jitted /qmax into a reciprocal multiply.
                np.testing.assert_allclose(
                    np.asarray(a, np.float32),
                    np.asarray(b, np.float32),
                    rtol=2e-6,
                    atol=0,
                )

        # And the host-placed engine actually serves.
        frames = np.random.default_rng(0).integers(
            0, 255, (1, 4, 64, 64, 3), dtype=np.uint8
        )
        texts = host_engine.generate(frames, ["分析"], prompt_len=16)
        assert len(texts) == 1

    def test_orbax_restore_host_path_matches_device(self, monkeypatch, tmp_path):
        """Huge ORBAX restores must also route through host quantization.

        restore() built its template with device shardings, so a big
        checkpoint landed on-chip as full f32 BEFORE _place quantized —
        the 7b RESOURCE_EXHAUSTED class survived on the orbax path even
        after the HF-load fix (round-4 advisor). Above _HOST_QUANT_BYTES
        the template now targets the host CPU backend and the numpy leaves
        take the host-quantize branch; served params must be identical to
        the small-checkpoint device path.
        """
        import orbax.checkpoint as ocp

        import video_transformer_tpu.parallel.engine as engine_mod

        config = __graft_entry__._tiny_config()
        donor = InferenceEngine(
            config, max_new_tokens=8, seed=5, compilation_cache_dir=None,
            fuse_projections=False,
        )
        ckpt = tmp_path / "params_1"
        with ocp.StandardCheckpointer() as checkpointer:
            checkpointer.save(str(ckpt), donor.params)

        def build():
            return InferenceEngine(
                config,
                dfa=_compact_dfa(),
                max_new_tokens=64,
                temperature=0.7,
                seed=0,
                compilation_cache_dir=None,
                quantize="int8",
            )

        device_engine = build()
        device_engine.restore(str(tmp_path))

        monkeypatch.setattr(engine_mod, "_HOST_QUANT_BYTES", 0)
        host_engine = build()
        host_engine.restore(str(tmp_path))

        flat_dev, def_dev = jax.tree_util.tree_flatten(device_engine.params)
        flat_host, def_host = jax.tree_util.tree_flatten(host_engine.params)
        assert def_dev == def_host
        for a, b in zip(flat_dev, flat_host):
            assert a.dtype == b.dtype
            if np.issubdtype(a.dtype, np.integer):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            else:
                np.testing.assert_allclose(
                    np.asarray(a, np.float32),
                    np.asarray(b, np.float32),
                    rtol=2e-6,
                    atol=0,
                )

        texts = host_engine.generate_text(["分析要点"])
        assert len(texts) == 1
