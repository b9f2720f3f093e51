"""HF tokenizer.json adapter (models/hf_tokenizer.py).

Pins the byte-exact grammar primitives (token_bytes / encode_bytes /
token_table), the codec roundtrip through the ``tokenizers`` runtime, and
end-to-end constrained generation with a TokenGrammar over an HF-format
vocabulary — the real-checkpoint deployment path (Qwen2-VL vocab), here on
a synthetic GPT-2-style byte-level BPE vocabulary (no egress).
"""

import json

import numpy as np
import pytest

from video_transformer_tpu.models.hf_tokenizer import (
    HfTokenizer,
    _bytes_to_unicode,
)


@pytest.fixture(scope="module")
def tokenizer_path(tmp_path_factory):
    """Synthetic byte-level BPE tokenizer.json: 256 byte tokens, a few
    merges (ASCII word pieces + one CJK character), two added specials."""
    byte_char = _bytes_to_unicode()
    vocab = {byte_char[b]: b for b in range(256)}  # id == byte value

    def tok(data: bytes) -> str:
        return "".join(byte_char[b] for b in data)

    merges = []
    next_id = 256

    def add_merge(a: bytes, b: bytes):
        nonlocal next_id
        merges.append(f"{tok(a)} {tok(b)}")
        vocab[tok(a + b)] = next_id
        next_id += 1

    add_merge(b"t", b"h")        # 256 "th"
    add_merge(b"th", b"e")       # 257 "the"
    ti = "梯".encode("utf-8")     # 3 bytes
    add_merge(ti[:1], ti[1:2])   # 258
    add_merge(ti[:2], ti[2:])    # 259 full 梯
    add_merge(b" ", b"the")      # 260 " the"

    added = [
        {"content": "<|endoftext|>", "id": next_id, "special": True},
        {"content": "<|video_pad|>", "id": next_id + 1, "special": True},
    ]
    payload = {
        "version": "1.0",
        "added_tokens": added,
        "normalizer": None,
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False,
                          "trim_offsets": True, "use_regex": True},
        "decoder": {"type": "ByteLevel"},
        "model": {
            "type": "BPE",
            "vocab": vocab,
            "merges": merges,
        },
    }
    path = tmp_path_factory.mktemp("hf_tok") / "tokenizer.json"
    path.write_text(json.dumps(payload, ensure_ascii=False), encoding="utf-8")
    return path


class TestAdapterBasics:
    def test_vocab_rounds_to_128(self, tokenizer_path):
        tokenizer = HfTokenizer(tokenizer_path)
        assert tokenizer.vocab_size == 384  # 263 ids -> next multiple of 128

    def test_explicit_vocab_size(self, tokenizer_path):
        tokenizer = HfTokenizer(tokenizer_path, vocab_size=512)
        assert tokenizer.vocab_size == 512

    def test_specials_resolved(self, tokenizer_path):
        tokenizer = HfTokenizer(tokenizer_path)
        assert tokenizer.EOS == 261
        assert tokenizer.VID == 262
        # No BOS/PAD in the vocab: both alias EOS (GPT-2 convention).
        assert tokenizer.BOS == tokenizer.EOS
        assert tokenizer.PAD == tokenizer.EOS

    def test_token_bytes_exact(self, tokenizer_path):
        tokenizer = HfTokenizer(tokenizer_path)
        assert tokenizer.token_bytes(ord("a")) == b"a"
        assert tokenizer.token_bytes(257) == b"the"
        assert tokenizer.token_bytes(259) == "梯".encode("utf-8")
        assert tokenizer.token_bytes(tokenizer.EOS) == b""

    def test_roundtrip(self, tokenizer_path):
        tokenizer = HfTokenizer(tokenizer_path)
        for text in ("the theme", "梯度 the 梯", "mixed 梯 ascii"):
            ids = tokenizer.encode(text)
            assert tokenizer.decode(ids) == text

    def test_encode_bytes_applies_merges_in_rank_order(self, tokenizer_path):
        tokenizer = HfTokenizer(tokenizer_path)
        assert tokenizer.encode_bytes(b"the") == [257]
        assert tokenizer.encode_bytes("梯".encode("utf-8")) == [259]
        # Unmergeable bytes stay singletons.
        assert tokenizer.encode_bytes(b"xy") == [ord("x"), ord("y")]

    def test_encode_array_pads(self, tokenizer_path):
        tokenizer = HfTokenizer(tokenizer_path)
        arr = tokenizer.encode_array("the", 8, add_bos=True)
        assert arr.shape == (8,)
        assert arr[0] == tokenizer.BOS
        assert arr[1] == 257
        assert (arr[2:] == tokenizer.PAD).all()


class TestGrammarSurface:
    def test_token_table_eos_column(self, tokenizer_path):
        tokenizer = HfTokenizer(tokenizer_path)
        cols, lens = tokenizer.token_table(16)
        assert cols.shape == (tokenizer.vocab_size, 16)
        assert lens[257] == 3  # "the"
        assert list(cols[257, :3]) == [ord("t"), ord("h"), ord("e")]
        assert lens[tokenizer.EOS] == 1
        assert cols[tokenizer.EOS, 0] == 258  # canonical byte-DFA EOS column
        assert lens[tokenizer.VID] == 0  # unreachable under the grammar

    def test_token_grammar_constrained_generation(self, tokenizer_path):
        """Full engine decode under a TokenGrammar over the HF vocab."""
        import jax

        from video_transformer_tpu.models.config import (
            DecoderConfig,
            EncoderConfig,
            VLMConfig,
        )
        from video_transformer_tpu.ops.constrained import DfaBuilder
        from video_transformer_tpu.ops.token_grammar import TokenGrammar
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        tokenizer = HfTokenizer(tokenizer_path, vocab_size=512)
        dfa = (
            DfaBuilder()
            .literal('{"title": ')
            .free_string(1, 24)
            .literal("}")
            .finish()
        )
        config = VLMConfig(
            name="hf-micro",
            encoder=EncoderConfig(
                hidden_dim=64, num_layers=1, num_heads=2, head_dim=32,
                mlp_dim=128, image_size=32, patch_size=16, tubelet_t=2,
                num_frames=4,
            ),
            decoder=DecoderConfig(
                vocab_size=512, hidden_dim=64, num_layers=2, num_heads=2,
                num_kv_heads=2, head_dim=32, mlp_dim=128, max_seq_len=1024,
            ),
            dtype="float32",
        )
        engine = InferenceEngine(
            config,
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            max_new_tokens=96,
            temperature=1.0,
            seed=0,
            compilation_cache_dir=None,
            tokenizer=tokenizer,
        )
        assert engine.byte_vocab == 512  # subword path engaged
        grammar = engine.wrap_grammar(dfa)
        assert isinstance(grammar, TokenGrammar)
        frames = np.random.default_rng(0).integers(
            0, 255, (1, 4, 32, 32, 3), dtype=np.uint8
        )
        texts = engine.generate(frames, ["analyze"], prompt_len=16, dfa=grammar)
        parsed = json.loads(texts[0])
        assert "title" in parsed
