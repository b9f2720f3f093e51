"""BPE tokenizer + token-level grammar tests (CPU)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from video_transformer_tpu.analyzer.schema import note_dfa
from video_transformer_tpu.models.bpe import BpeTokenizer, train_bpe
from video_transformer_tpu.ops.token_grammar import TokenGrammar
from video_transformer_tpu.train.data import sample_dfa_text

SAMPLES = [
    "梯度下降是一种常用的优化方法",
    "反向传播 computes gradients layer by layer",
    '{"title": "attention is all you need", "key_takeaways": ["q k v"]}',
    "the quick brown fox jumps over the lazy dog",
]


def small_bpe(vocab=512):
    corpus = SAMPLES * 4 + [
        sample_dfa_text(note_dfa(512, scale=0.15), np.random.default_rng(i), 3000)
        for i in range(3)
    ]
    return train_bpe(corpus, vocab)


@pytest.fixture(scope="module")
def bpe():
    return small_bpe()


@pytest.fixture(scope="module")
def grammar(bpe):
    return TokenGrammar(note_dfa(512, scale=0.15), bpe, cache_dir=None)


class TestBpe:
    def test_round_trip(self, bpe):
        for text in SAMPLES + ["mixed 中文 and ASCII 123", ""]:
            assert bpe.decode(bpe.encode(text)) == text

    def test_compresses(self, bpe):
        for text in SAMPLES:
            n_tokens = len(bpe.encode(text))
            n_bytes = len(text.encode("utf-8"))
            assert n_tokens < n_bytes, text

    def test_layout(self, bpe):
        assert bpe.vocab_size % 128 == 0
        assert (bpe.PAD, bpe.BOS, bpe.EOS, bpe.VID) == (256, 257, 258, 259)
        # single-byte ids decode to their byte
        assert bpe.decode([65, 66]) == "AB"

    def test_encode_array_pads(self, bpe):
        arr = bpe.encode_array("hi", 8, add_bos=True)
        assert arr.shape == (8,) and arr[0] == bpe.BOS
        assert (arr[3:] == bpe.PAD).all()

    def test_save_load_round_trip(self, bpe, tmp_path):
        path = tmp_path / "bpe.json"
        bpe.save(path)
        loaded = BpeTokenizer.load(path)
        for text in SAMPLES:
            assert loaded.encode(text) == bpe.encode(text)


def brute_force_allowed(dfa, bpe, state, token):
    data = bpe.token_bytes(token)
    if token == bpe.EOS:
        return dfa.next_state[state, bpe.EOS] >= 0
    if not data or len(data) > 16:
        return False
    cur = state
    for byte in data:
        cur = int(dfa.next_state[cur, byte])
        if cur < 0:
            return False
    return True


class TestTokenGrammar:
    def test_mask_matches_brute_force(self, grammar, bpe):
        dfa = grammar.dfa
        rng = np.random.default_rng(0)
        bits = grammar.allowed_bits
        for state in rng.integers(0, dfa.num_states, 25):
            state = int(state)
            for token in rng.integers(0, bpe.vocab_size, 80):
                token = int(token)
                got = bool((bits[state, token // 32] >> (token % 32)) & 1)
                want = brute_force_allowed(dfa, bpe, state, token)
                assert got == want, (state, token, bpe.token_bytes(token))

    def test_device_constrain_and_advance(self, grammar, bpe):
        tables = grammar.device_table()
        state = jnp.asarray([grammar.start, grammar.start], jnp.int32)
        logits = jnp.zeros((2, bpe.vocab_size), jnp.float32)
        masked = TokenGrammar.constrain(logits, state, tables)
        allowed = np.asarray(masked[0] > -1e29).nonzero()[0]
        assert len(allowed) >= 1
        # the opening brace byte-token must be allowed at start
        assert ord("{") in allowed
        nxt = TokenGrammar.advance(
            state, jnp.asarray([ord("{"), ord("{")], jnp.int32), tables
        )
        assert int(nxt[0]) == int(grammar.dfa.next_state[grammar.start, ord("{")])

    def test_forced_tables_consistency(self, grammar):
        forced_len, forced_tok, forced_end = grammar.forced_tables(max_run=24)
        rng = np.random.default_rng(1)
        table = grammar.dfa.next_state
        for state in rng.integers(0, grammar.num_states, 100):
            state = int(state)
            cur = state
            for j in range(int(forced_len[state])):
                for byte in grammar.tokenizer.token_bytes(int(forced_tok[state, j])):
                    cur = int(table[cur, byte])
                    assert cur >= 0
            assert cur == int(forced_end[state])

    def test_encode_aligned_replays_through_grammar(self, grammar, bpe):
        """Aligned tokenization must be a valid token path ending at a state
        where EOS is allowed, with every token mask-allowed en route."""
        text = sample_dfa_text(grammar.dfa, np.random.default_rng(3), 4000)
        json.loads(text)  # sanity: sample is valid JSON
        ids = grammar.encode_aligned(text)
        bits = grammar.allowed_bits
        state = grammar.start
        for tok in ids:
            assert (bits[state, tok // 32] >> (tok % 32)) & 1, (state, tok)
            for byte in bpe.token_bytes(tok):
                state = int(grammar.dfa.next_state[state, byte])
        assert grammar.dfa.next_state[state, bpe.EOS] == grammar.accept

    def test_rejects_nonmatching_text(self, grammar):
        with pytest.raises(ValueError):
            grammar.encode_aligned("not json at all")

    def test_bits_cache_round_trip(self, bpe, tmp_path):
        g1 = TokenGrammar(note_dfa(512, scale=0.15), bpe, cache_dir=tmp_path)
        g2 = TokenGrammar(note_dfa(512, scale=0.15), bpe, cache_dir=tmp_path)
        np.testing.assert_array_equal(g1.allowed_bits, g2.allowed_bits)


class TestEngineWithTokenGrammar:
    def test_generate_text_valid_json(self, bpe, grammar):
        """Tiny engine decodes under the token grammar: output parses and
        carries all contract fields."""
        import __graft_entry__
        from video_transformer_tpu.parallel.engine import InferenceEngine

        config = __graft_entry__._tiny_config()
        engine = InferenceEngine(
            config,
            dfa=grammar,
            tokenizer=bpe,
            max_new_tokens=900,
            temperature=1.0,
            structure_bias=2.0,
            compilation_cache_dir=None,
        )
        text = engine.generate_text(["分析视频"], prompt_len=16)[0]
        data = json.loads(text)
        assert {
            "title", "one_sentence_summary", "key_takeaways",
            "deep_dive", "glossary", "visual_schemas",
        } <= data.keys()

    def test_bitset_shards_over_model_axis(self, bpe, grammar):
        """On a tensor-parallel mesh the grammar bitset's word axis shards
        over "model" (per-chip residency / tp — the 152k-vocab table is the
        one large grammar array); constrained decoding stays correct."""
        import __graft_entry__
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        config = __graft_entry__._tiny_config()
        engine = InferenceEngine(
            config,
            mesh=build_mesh({"data": 4, "model": 2}),
            dfa=grammar,
            tokenizer=bpe,
            max_new_tokens=900,
            temperature=1.0,
            structure_bias=2.0,
            compilation_cache_dir=None,
        )
        tables = engine._table_for(grammar)
        words = grammar.allowed_bits.shape[1]
        shard = tables["bits"].sharding.shard_shape(tables["bits"].shape)
        assert shard[1] == words // 2
        # Small tables stay replicated.
        bt = tables["byte_table"]
        assert bt.sharding.shard_shape(bt.shape) == bt.shape
        text = engine.generate_text(["分析视频"], prompt_len=16)[0]
        json.loads(text)
