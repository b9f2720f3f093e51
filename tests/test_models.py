"""Model stack tests: shapes, KV-cache consistency, constrained decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_transformer_tpu.models import ByteTokenizer, get_preset
from video_transformer_tpu.models.config import VLMConfig, DecoderConfig, EncoderConfig
from video_transformer_tpu.models.lm import init_kv_cache
from video_transformer_tpu.models.vlm import VideoLM
from video_transformer_tpu.models.vit import sincos_3d_positions, tubelet_patchify
from video_transformer_tpu.ops.constrained import (
    DfaBuilder,
    advance_state,
    constrain_logits,
)
from video_transformer_tpu.ops.preprocess import preprocess_frames, resize_weights


def micro_config() -> VLMConfig:
    """Sub-tiny config for fast CPU tests (head_dim 32 is fine off-TPU)."""
    return VLMConfig(
        name="micro",
        encoder=EncoderConfig(
            hidden_dim=64, num_layers=1, num_heads=2, head_dim=32, mlp_dim=128,
            image_size=32, patch_size=16, tubelet_t=2, num_frames=4,
        ),
        decoder=DecoderConfig(
            vocab_size=512, hidden_dim=64, num_layers=2, num_heads=2,
            num_kv_heads=1, head_dim=32, mlp_dim=128, max_seq_len=512,
        ),
        dtype="float32",
    )


class TestPresets:
    def test_all_presets_valid(self):
        for name in ["tiny", "base", "7b"]:
            cfg = get_preset(name)
            assert cfg.encoder.image_size % cfg.encoder.patch_size == 0
            assert cfg.encoder.num_frames % cfg.encoder.tubelet_t == 0
            assert cfg.decoder.num_heads % cfg.decoder.num_kv_heads == 0
            assert cfg.decoder.vocab_size % 128 == 0

    def test_unknown_preset(self):
        with pytest.raises(ValueError, match="Unknown model preset"):
            get_preset("huge")


class TestTokenizer:
    def test_roundtrip(self):
        tok = ByteTokenizer()
        text = "hello 世界"
        assert tok.decode(tok.encode(text)) == text

    def test_specials_stripped_on_decode(self):
        tok = ByteTokenizer()
        ids = tok.encode("ab", add_bos=True, add_eos=True)
        assert ids[0] == tok.BOS and ids[-1] == tok.EOS
        assert tok.decode(ids) == "ab"

    def test_fixed_length_array(self):
        tok = ByteTokenizer()
        arr = tok.encode_array("hi", 8, add_bos=True)
        assert arr.shape == (8,)
        assert arr[0] == tok.BOS
        assert arr[-1] == tok.PAD


class TestPreprocess:
    def test_resize_weights_partition_of_unity(self):
        w = resize_weights(48, 32)
        np.testing.assert_allclose(w.sum(axis=0), 1.0, atol=1e-6)

    def test_preprocess_shapes_and_range(self):
        cfg = micro_config().encoder
        frames = np.random.default_rng(0).integers(
            0, 255, (2, 4, 48, 64, 3), dtype=np.uint8
        )
        patches = preprocess_frames(jnp.asarray(frames), cfg, jnp.float32)
        assert patches.shape == (2, cfg.tokens_per_clip, cfg.patch_dim)
        assert float(jnp.max(jnp.abs(patches))) <= 1.001

    def test_tubelet_ordering_matches_positions(self):
        cfg = micro_config().encoder
        pos = sincos_3d_positions(cfg)
        assert pos.shape == (cfg.tokens_per_clip, cfg.hidden_dim)
        frames = jnp.arange(2 * 4 * 32 * 32 * 3, dtype=jnp.float32).reshape(
            2, 4, 32, 32, 3
        )
        patches = tubelet_patchify(frames, cfg.patch_size, cfg.tubelet_t)
        assert patches.shape == (2, cfg.tokens_per_clip, cfg.patch_dim)


class TestVideoLM:
    def test_training_forward_shape(self):
        cfg = micro_config()
        model = VideoLM(cfg)
        params = model.init_variables(jax.random.PRNGKey(0))
        patches = jnp.zeros((1, cfg.video_tokens, cfg.encoder.patch_dim))
        tokens = jnp.zeros((1, 16), jnp.int32)
        logits = model.apply(params, patches, tokens)
        assert logits.shape == (1, cfg.video_tokens + 16, cfg.decoder.vocab_size)

    def test_prefill_then_decode_matches_full_forward(self):
        """Incremental decode with KV cache must equal teacher forcing."""
        cfg = micro_config()
        model = VideoLM(cfg)
        params = model.init_variables(jax.random.PRNGKey(0))
        rng = jax.random.PRNGKey(1)
        patches = jax.random.normal(rng, (1, cfg.video_tokens, cfg.encoder.patch_dim))
        tokens = jnp.array([[65, 66, 67, 68]], jnp.int32)

        # Full teacher-forced logits.
        full_logits = model.apply(params, patches, tokens)

        # Prefill on first 2 tokens, decode the next 2 one at a time.
        cache = init_kv_cache(cfg.decoder, 1, 64, jnp.float32)
        last, cache = model.apply(
            params, patches, tokens[:, :2], cache, method=VideoLM.prefill
        )
        pos_prefill_last = cfg.video_tokens + 2 - 1
        np.testing.assert_allclose(
            last[0], full_logits[0, pos_prefill_last], atol=2e-4, rtol=2e-4
        )

        step_logits, cache = model.apply(
            params, tokens[:, 2:3], cache, method=VideoLM.decode_step
        )
        np.testing.assert_allclose(
            step_logits[0], full_logits[0, pos_prefill_last + 1], atol=2e-4, rtol=2e-4
        )
        step_logits, cache = model.apply(
            params, tokens[:, 3:4], cache, method=VideoLM.decode_step
        )
        np.testing.assert_allclose(
            step_logits[0], full_logits[0, pos_prefill_last + 2], atol=2e-4, rtol=2e-4
        )


class TestConstrainedDecoding:
    def test_literal_forcing(self):
        dfa = DfaBuilder().literal('{"a": ').free_string(1, 4).literal("}").finish()
        table = jnp.asarray(dfa.next_state)
        state = jnp.array([dfa.start])
        logits = jnp.zeros((1, 512))
        out = []
        key = jax.random.PRNGKey(0)
        for _ in range(40):
            masked = constrain_logits(logits, state, table)
            key, sub = jax.random.split(key)
            tok = jax.random.categorical(sub, masked, axis=-1)
            state = advance_state(state, tok, table)
            out.append(int(tok[0]))
            if int(state[0]) == dfa.accept:
                break
        text = ByteTokenizer().decode(out)
        import json

        parsed = json.loads(text)
        assert set(parsed.keys()) == {"a"}
        assert 1 <= len(parsed["a"]) <= 4

    def test_string_list_and_dict(self):
        import json

        dfa = (
            DfaBuilder()
            .literal('{"items": ')
            .string_list(1, 3)
            .literal(', "map": ')
            .string_dict(1, 3, 1, 3)
            .literal("}")
            .finish()
        )
        table = jnp.asarray(dfa.next_state)
        key = jax.random.PRNGKey(7)
        state = jnp.array([dfa.start])
        out = []
        for _ in range(400):
            key, sub = jax.random.split(key)
            masked = constrain_logits(jnp.zeros((1, 512)), state, table)
            tok = jax.random.categorical(sub, masked, axis=-1)
            state = advance_state(state, tok, table)
            out.append(int(tok[0]))
            if int(state[0]) == dfa.accept:
                break
        text = ByteTokenizer().decode(out)
        parsed = json.loads(text)
        assert isinstance(parsed["items"], list) and len(parsed["items"]) >= 1
        assert isinstance(parsed["map"], dict) and len(parsed["map"]) >= 1

    def test_forced_tables(self):
        dfa = (
            DfaBuilder()
            .literal('{"key": ')
            .free_string(1, 4)
            .literal("}")
            .finish()
        )
        forced_len, forced_tok, forced_end = dfa.forced_tables(max_run=16)
        # The start state forces the entire '{"key": "' literal (the opening
        # quote of the free string is also forced).
        run = bytes(
            int(t) for t in forced_tok[dfa.start, : forced_len[dfa.start]]
        ).decode()
        assert run == '{"key": "'
        # The end of the run is the free-text state (many allowed tokens).
        end_state = forced_end[dfa.start]
        assert (dfa.next_state[end_state] >= 0).sum() > 50
        # The accept state forces nothing (EOS is special).
        assert forced_len[dfa.accept] == 0

    def test_fast_forward_output_matches_slow_path(self):
        """Generation through the block decoder must be byte-identical to a
        token-at-a-time DFA walk with the same sampling decisions (greedy)."""
        import json

        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        dfa = (
            DfaBuilder()
            .literal('{"alpha": ')
            .free_string(1, 6)
            .literal(', "beta": ')
            .string_list(1, 4)
            .literal("}")
            .finish()
        )
        config = micro_config()
        mesh = build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1])
        engine = InferenceEngine(
            config, mesh=mesh, dfa=dfa, max_new_tokens=256,
            temperature=0.0, seed=0,
        )
        frames = np.zeros((1, 4, 32, 32, 3), np.uint8)
        text = engine.generate(frames, ["x"], prompt_len=8)[0]
        parsed = json.loads(text)
        assert set(parsed) == {"alpha", "beta"}

    def test_unicode_free_text_walks_are_valid_utf8(self):
        import json

        from video_transformer_tpu.train.data import sample_dfa_text

        dfa = (
            DfaBuilder(unicode_text=True)
            .literal('{"t": ')
            .free_string(2, 24)
            .literal("}")
            .finish()
        )
        rng = np.random.default_rng(0)
        saw_cjk = False
        for _ in range(20):
            text = sample_dfa_text(dfa, rng, max_tokens=64)
            parsed = json.loads(text)  # implies valid UTF-8 + JSON
            assert len(parsed["t"].encode("utf-8")) <= 24
            if any("䀀" <= ch <= "鿿" for ch in parsed["t"]):
                saw_cjk = True
        assert saw_cjk  # the CJK plane is actually reachable

    def test_unicode_respects_byte_budget_at_boundary(self):
        # max_len 4: a 3-byte char may start at byte 0 or 1, never at 2/3.
        dfa = DfaBuilder(unicode_text=True).free_string(1, 4).finish()
        # Walk the field's opening quote then two ASCII bytes; the resulting
        # state must not allow a 3-byte lead (needs 3 remaining, has 2).
        state = int(dfa.next_state[dfa.start, ord('"')])
        state = int(dfa.next_state[state, ord("a")])
        state_at_2 = int(dfa.next_state[state, ord("b")])
        assert dfa.next_state[state_at_2, 0xE4] == -1
        assert dfa.next_state[state_at_2, ord("c")] >= 0

    def test_timecode_field(self):
        import re

        dfa = DfaBuilder().literal('{"t": ').timecode().literal("}").finish()
        table = jnp.asarray(dfa.next_state)
        key = jax.random.PRNGKey(3)
        state = jnp.array([dfa.start])
        out = []
        for _ in range(30):
            key, sub = jax.random.split(key)
            masked = constrain_logits(jnp.zeros((1, 512)), state, table)
            tok = jax.random.categorical(sub, masked, axis=-1)
            state = advance_state(state, tok, table)
            out.append(int(tok[0]))
            if int(state[0]) == dfa.accept:
                break
        text = ByteTokenizer().decode(out)
        assert re.fullmatch(r'\{"t": "\d\d:\d\d"\}', text)
