"""Weight-porting tests: HF-layout state dict -> working VideoLM decoder."""

import numpy as np
import pytest

from video_transformer_tpu.models.config import DecoderConfig
from video_transformer_tpu.models.port import decoder_key_map, port_decoder_state


def micro_decoder():
    return DecoderConfig(
        vocab_size=512, hidden_dim=64, num_layers=2, num_heads=2,
        num_kv_heads=1, head_dim=32, mlp_dim=128, max_seq_len=256,
    )


def fake_hf_state(config: DecoderConfig, seed=0):
    """HF-shaped random state dict ([out, in] torch linear layout)."""
    rng = np.random.default_rng(seed)
    h = config.hidden_dim
    q = config.num_heads * config.head_dim
    kv = config.num_kv_heads * config.head_dim
    state = {
        "model.embed_tokens.weight": rng.standard_normal(
            (config.vocab_size, h), dtype=np.float32
        ),
        "model.norm.weight": np.ones((h,), np.float32),
    }
    for i in range(config.num_layers):
        p = f"model.layers.{i}"
        state[f"{p}.input_layernorm.weight"] = np.ones((h,), np.float32)
        state[f"{p}.post_attention_layernorm.weight"] = np.ones((h,), np.float32)
        state[f"{p}.self_attn.q_proj.weight"] = rng.standard_normal((q, h), dtype=np.float32)
        state[f"{p}.self_attn.k_proj.weight"] = rng.standard_normal((kv, h), dtype=np.float32)
        state[f"{p}.self_attn.v_proj.weight"] = rng.standard_normal((kv, h), dtype=np.float32)
        state[f"{p}.self_attn.o_proj.weight"] = rng.standard_normal((h, q), dtype=np.float32)
        state[f"{p}.self_attn.q_proj.bias"] = np.zeros((q,), np.float32)
        state[f"{p}.mlp.gate_proj.weight"] = rng.standard_normal((config.mlp_dim, h), dtype=np.float32)
        state[f"{p}.mlp.up_proj.weight"] = rng.standard_normal((config.mlp_dim, h), dtype=np.float32)
        state[f"{p}.mlp.down_proj.weight"] = rng.standard_normal((h, config.mlp_dim), dtype=np.float32)
    return state


class TestPort:
    def test_key_map_covers_all_params(self):
        mapping = decoder_key_map(2)
        assert len(mapping) == 2 + 2 * 9

    def test_ported_tree_runs_in_model(self):
        import jax
        import jax.numpy as jnp

        from video_transformer_tpu.models.config import EncoderConfig, VLMConfig
        from video_transformer_tpu.models.vlm import VideoLM

        dec = micro_decoder()
        config = VLMConfig(
            name="ported",
            encoder=EncoderConfig(
                hidden_dim=64, num_layers=1, num_heads=2, head_dim=32,
                mlp_dim=128, image_size=32, patch_size=16, tubelet_t=2,
                num_frames=4,
            ),
            decoder=dec,
            dtype="float32",
        )
        model = VideoLM(config)
        variables = model.init_variables(jax.random.PRNGKey(0))

        ported = port_decoder_state(fake_hf_state(dec), dec)
        # Merge the ported decoder over the initialized tree.
        params = jax.tree_util.tree_map(lambda x: x, variables)  # copy
        merged_decoder = params["params"]["decoder"]

        def deep_merge(dst, src):
            for key, value in src.items():
                if isinstance(value, dict):
                    deep_merge(dst[key], value)
                else:
                    assert dst[key].shape == value.shape, key
                    dst[key] = jnp.asarray(value)

        deep_merge(params["params"], ported)
        patches = jnp.zeros((1, config.video_tokens, config.encoder.patch_dim))
        tokens = jnp.zeros((1, 8), jnp.int32)
        logits = model.apply(params, patches, tokens)
        assert logits.shape == (1, config.video_tokens + 8, dec.vocab_size)
        assert bool(jnp.isfinite(logits).all())
        # Ported embedding actually landed (logits differ from init).
        init_logits = model.apply(variables, patches, tokens)
        assert not np.allclose(np.asarray(logits), np.asarray(init_logits))
        del merged_decoder

    def test_wrong_shape_raises(self):
        dec = micro_decoder()
        state = fake_hf_state(dec)
        state["model.embed_tokens.weight"] = np.zeros((7, 7), np.float32)
        with pytest.raises(ValueError, match="shape"):
            port_decoder_state(state, dec)

    def test_missing_key_strict(self):
        dec = micro_decoder()
        state = fake_hf_state(dec)
        del state["model.norm.weight"]
        with pytest.raises(KeyError):
            port_decoder_state(state, dec)
        tree = port_decoder_state(state, dec, strict=False)
        assert "final_norm" not in tree.get("decoder", {})
