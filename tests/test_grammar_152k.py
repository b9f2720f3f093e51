"""152k-vocab TokenGrammar: real-geometry constrained decoding.

The real-weight serving chain (ROADMAP: qwen2vl-7b + HF tokenizer) needs the
grammar machinery to hold at V=152,064: bitset precompute, model-axis bitset
sharding (engine._table_for), and the decode loop's full-vocab gather. No HF
tokenizer.json can be downloaded here (zero egress), so these tests run over
a synthetic vocabulary with the same scale and byte-length distribution
(models/synth_vocab.py) — the machinery under test depends on vocab geometry
and token byte contents, not on which corpus ranked the merges.

The CPU test exercises the sharded-bitset path on the virtual mesh with a
small grammar (cheap precompute); the opt-in TPU test
(tests/test_tpu_integration.py::test_152k_grammar_at_7b_geometry) drives the
full note grammar at qwen2vl-7b geometry on hardware.
"""

import json
from dataclasses import replace
from pathlib import Path

import numpy as np
import pytest

VOCAB = 152064


@pytest.fixture(scope="module")
def synth_tokenizer(tmp_path_factory):
    from video_transformer_tpu.models.hf_tokenizer import HfTokenizer
    from video_transformer_tpu.models.synth_vocab import write_synth_qwen_vocab

    path = tmp_path_factory.mktemp("vocab") / "tokenizer.json"
    write_synth_qwen_vocab(path, vocab_size=VOCAB)
    return HfTokenizer(path, vocab_size=VOCAB)


class TestSynthVocab:
    def test_full_scale_vocab_round_trips(self, synth_tokenizer):
        tok = synth_tokenizer
        assert tok.vocab_size == VOCAB
        text = '{"title": "梯度下降要点", "n": 12}'
        assert tok.decode(tok.encode(text)) == text
        # CJK single characters exist as 3-byte tokens (2 merges each).
        one = tok.encode_bytes("梯".encode())
        assert len(one) == 1
        assert tok.token_bytes(one[0]) == "梯".encode()

    def test_token_table_geometry(self, synth_tokenizer):
        cols, lens = synth_tokenizer.token_table(16)
        assert cols.shape == (VOCAB, 16)
        # Nearly the whole vocab is reachable byte content (specials are 0,
        # EOS maps to the canonical DFA column).
        assert int((lens > 0).sum()) > VOCAB - 16


class TestShardedBitsetDecode:
    def test_constrained_decode_with_model_sharded_bitset(self, synth_tokenizer):
        """A 152,064-wide grammar bitset sharded over the model axis drives
        a valid constrained decode on the virtual mesh (the per-step row
        gather all-gathers KBs; engine._table_for applies P(None, 'model')
        when the word axis divides)."""
        import jax
        from jax.sharding import PartitionSpec as P

        from video_transformer_tpu.models.config import get_preset
        from video_transformer_tpu.ops.constrained import DfaBuilder
        from video_transformer_tpu.ops.token_grammar import TokenGrammar
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        tok = synth_tokenizer
        config = get_preset("tiny")
        config = replace(
            config, decoder=replace(config.decoder, vocab_size=VOCAB)
        )
        # Small grammar: precompute cost scales with states x vocab; a
        # ~30-state schema keeps this test seconds while the bitset is
        # still full vocab width.
        dfa = (
            DfaBuilder()
            .literal('{"title": ')
            .free_string(2, 20)
            .literal(', "level": ')
            .choice(["1", "2", "3"])
            .literal("}")
            .finish()
        )
        engine = InferenceEngine(
            config,
            mesh=build_mesh({"data": 4, "model": 2}),
            dfa=None,
            tokenizer=tok,
            max_new_tokens=64,
            temperature=1.0,
            seed=3,
            compilation_cache_dir=None,
        )
        grammar = engine.wrap_grammar(dfa)
        words = grammar.allowed_bits.shape[1]
        assert words == VOCAB // 32

        tables = engine._table_for(grammar)
        spec = tables["bits"].sharding.spec
        assert tuple(spec) == (None, "model"), f"bits not sharded: {spec}"

        texts = engine.generate_text(
            ["写出要点"] * 4, prompt_len=128, dfa=grammar
        )
        for text in texts:
            data = json.loads(text)
            assert set(data) == {"title", "level"}
            assert data["level"] in (1, 2, 3)

    @pytest.mark.slow
    def test_note_grammar_accepts_under_close_bias(self, synth_tokenizer):
        """CPU mirror of the on-chip 7b test's failure mode (morning queue,
        round 3): with constant weights the sampler is uniform over the
        allowed set, and at V=152,064 the note only closes inside the token
        budget if close_bias_array lands on tokens whose LAST BYTE is a JSON
        closer — biasing raw byte codepoints as ids (the original bug) put
        the mass on 4 unrelated ids and the note never accepted."""
        import jax
        import jax.numpy as jnp
        import ml_dtypes

        from video_transformer_tpu.analyzer.schema import note_dfa
        from video_transformer_tpu.models.config import get_preset
        from video_transformer_tpu.models.vlm import VideoLM
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        tok = synth_tokenizer
        config = get_preset("tiny")
        config = replace(
            config, decoder=replace(config.decoder, vocab_size=VOCAB)
        )
        model = VideoLM(config)
        struct = jax.eval_shape(
            lambda: model.init_variables(jax.random.PRNGKey(0))
        )
        params = jax.tree_util.tree_map(
            lambda s: np.full(
                s.shape,
                0.01,
                ml_dtypes.bfloat16 if s.dtype == jnp.float32 else s.dtype,
            ),
            struct,
        )
        engine = InferenceEngine(
            config,
            mesh=build_mesh({"model": 1}),
            dfa=None,
            tokenizer=tok,
            max_new_tokens=1400,
            temperature=1.0,
            seed=0,
            params=params,
            structure_bias=9.5,
            compilation_cache_dir=None,
        )
        grammar = engine.wrap_grammar(note_dfa(512, scale=0.25))
        texts, status = engine.generate_text(
            ["生成本讲的结构化笔记"], prompt_len=128,
            return_status=True, dfa=grammar,
        )
        assert status[0], "note did not reach grammar accept within budget"
        data = json.loads(texts[0])
        assert {"title", "one_sentence_summary"} <= set(data)
