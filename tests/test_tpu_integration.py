"""Opt-in hardware integration tests (the reference's live-service analog).

The reference gates live Gemini/Kimi tests on local services being up
(test_analyzer_integration.py:28-45). Here the "live service" is the TPU:
these tests run only when the suite is pointed at real hardware —

    VTX_TEST_PLATFORM=axon python -m pytest tests/test_tpu_integration.py

Under the default CPU-forced test harness they skip.
"""

import json

import numpy as np
import pytest

import jax

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="real TPU required (VTX_TEST_PLATFORM)"
)


@requires_tpu
@pytest.mark.integration
class TestTPUEndToEnd:
    def test_tiny_engine_generates_valid_json_on_chip(self):
        from video_transformer_tpu.analyzer.schema import note_dfa
        from video_transformer_tpu.models.config import get_preset
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        engine = InferenceEngine(
            get_preset("tiny"),
            mesh=build_mesh({"model": 1}),
            dfa=note_dfa(512, scale=0.25),
            max_new_tokens=1400,
            temperature=1.0,
            structure_bias=2.5,
        )
        frames = np.random.default_rng(0).integers(
            0, 255, (1, 4, 64, 64, 3), dtype=np.uint8
        )
        # Warm up (first call compiles); measure the steady-state call.
        engine.generate(frames, ["analyze"], prompt_len=32)
        engine.stats.__init__()
        text = engine.generate(frames, ["analyze"], prompt_len=32)[0]
        parsed = json.loads(text)
        assert {"title", "deep_dive", "glossary"} <= parsed.keys()
        assert engine.stats.tokens_per_second > 100

    def test_session_continuation_completes_capped_note_on_chip(self):
        """Cache-reusing continuation on hardware: a token cap far below
        one note's length is closed by decode-only resume rounds, with
        zero prefill tokens after the first pass."""
        from video_transformer_tpu.analyzer.schema import note_dfa
        from video_transformer_tpu.models.config import get_preset
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        engine = InferenceEngine(
            get_preset("tiny"),
            mesh=build_mesh({"model": 1}),
            dfa=note_dfa(512, scale=0.25),
            max_new_tokens=256,
            temperature=1.0,
            structure_bias=2.5,
        )
        frames = np.random.default_rng(1).integers(
            0, 255, (1, 4, 64, 64, 3), dtype=np.uint8
        )
        _, complete, ids, session = engine.generate(
            frames, ["analyze"], prompt_len=32, return_status=True,
            return_tokens=True, session_rounds=16, return_session=True,
        )
        assert session is not None
        prefill_before = engine.stats.prefill_tokens
        all_ids = list(ids[0])
        while not complete[0] and session.rounds_left > 0:
            _, complete, more = engine.continue_session(session)
            all_ids += more[0]
        assert complete[0]
        assert engine.stats.prefill_tokens == prefill_before
        parsed = json.loads(engine.tokenizer.decode(all_ids))
        assert {"title", "deep_dive", "glossary"} <= parsed.keys()

    def test_grounded_bpe_engine_names_the_topic_on_chip(self):
        """The shipped BPE + grounded checkpoint, on hardware: the note must
        name the topic carried by the frames."""
        from dataclasses import replace
        from pathlib import Path

        from video_transformer_tpu.analyzer.schema import note_dfa
        from video_transformer_tpu.models.bpe import BpeTokenizer
        from video_transformer_tpu.models.config import get_preset
        from video_transformer_tpu.ops.token_grammar import TokenGrammar
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.train.grounded import (
            TOPIC_BANK,
            render_topic_clip,
        )
        from video_transformer_tpu.analyzer.prompts import render_prompt
        from video_transformer_tpu.contracts.timefmt import format_seconds

        repo = Path(__file__).resolve().parents[1]
        tok = BpeTokenizer.load(repo / "data/tokenizers/bpe-zh-2048.json")
        config = get_preset("tiny")
        config = replace(
            config, decoder=replace(config.decoder, vocab_size=tok.vocab_size)
        )
        engine = InferenceEngine(
            config,
            dfa=TokenGrammar(note_dfa(512), tok),
            tokenizer=tok,
            max_new_tokens=1024,
            temperature=0.7,
            seed=0,
        )
        engine.restore(str(repo / "data/checkpoints/tiny-zh-grounded"))
        rng = np.random.default_rng(12)
        ids = [1, 9, 20]
        frames = np.stack(
            [
                render_topic_clip(
                    i, config.encoder.num_frames, config.encoder.image_size, rng
                )
                for i in ids
            ]
        )
        prompt = render_prompt(
            "analysis", {"duration_label": format_seconds(120)},
            profile="compact",
        )
        texts = engine.generate(frames, [prompt] * len(ids))
        hits = 0
        for idx, text in zip(ids, texts):
            data = json.loads(text)
            blob = (
                data.get("title", "")
                + data.get("one_sentence_summary", "")
                + " ".join(data.get("key_takeaways", []))
            )
            hits += TOPIC_BANK[idx].name in blob
        assert hits >= 2, f"only {hits}/3 notes name their clip's topic"

    def test_paged_decode_kernel_at_engine_bucket_shape(self):
        """128-block path (cache_len not divisible by 512) on hardware."""
        import jax.numpy as jnp

        from video_transformer_tpu.ops.decode_attention import (
            _decode_attention_pallas,
            _pick_cache_block,
            decode_attention_reference,
        )

        s = 3456  # tiny preset + analyzer defaults round to this bucket
        assert _pick_cache_block(s) == 128
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(keys[0], (2, 2, 25, 128), jnp.bfloat16)
        k = jax.random.normal(keys[1], (2, 1, s, 128), jnp.bfloat16)
        v = jax.random.normal(keys[2], (2, 1, s, 128), jnp.bfloat16)
        lengths = jnp.array([3400, 77], jnp.int32)
        out = _decode_attention_pallas(q, k, v, lengths)
        ref = decode_attention_reference(q, k, v, lengths)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=5e-2, rtol=5e-2,
        )

    def test_flash_attention_matches_reference_on_chip(self):
        import jax.numpy as jnp

        from video_transformer_tpu.ops.attention import (
            _flash_attention_pallas,
            mha_reference,
        )

        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(keys[0], (1, 2, 256, 128), jnp.bfloat16)
        k = jax.random.normal(keys[1], (1, 1, 256, 128), jnp.bfloat16)
        v = jax.random.normal(keys[2], (1, 1, 256, 128), jnp.bfloat16)
        out = _flash_attention_pallas(q, k, v, causal=True)
        ref = mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=5e-2, rtol=5e-2,
        )

    def test_speculative_decode_runs_on_chip(self):
        """The speculative decode program compiles and runs on hardware:
        self-drafting (draft == target weights, ~full acceptance) must
        emit schema-valid JSON in far fewer loop cycles than tokens.
        Bit-exact parity with the plain engine is pinned on CPU only
        (tests/test_speculative.py): TPU f32 matmuls multiply in bf16, so
        two differently-compiled programs may break argmax ties
        differently over a long generation. Real-pair perf numbers come
        from tools/spec_eval.py."""
        from video_transformer_tpu.analyzer.schema import note_dfa
        from video_transformer_tpu.models.config import get_preset
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        engine = InferenceEngine(
            get_preset("tiny"),
            mesh=build_mesh({"model": 1}),
            dfa=note_dfa(512, scale=0.25),
            max_new_tokens=1400,
            temperature=0.0,
            structure_bias=2.5,
        )
        engine.attach_draft(
            get_preset("tiny"), spec_tokens=6, share_target_params=True
        )
        frames = np.random.default_rng(3).integers(
            0, 255, (2, 4, 64, 64, 3), dtype=np.uint8
        )
        texts, status = engine.generate(
            frames, ["analyze", "clip"], prompt_len=32, return_status=True
        )
        assert engine.stats.decode_steps > 0
        # Self-draft acceptance compresses the loop: far fewer verify
        # cycles than emitted tokens.
        assert engine.stats.tokens_generated > 2 * engine.stats.decode_steps
        for text, ok in zip(texts, status):
            if ok:
                parsed = json.loads(text)
                assert {"title", "deep_dive", "glossary"} <= parsed.keys()

    def test_152k_grammar_at_7b_geometry(self, tmp_path):
        """The full real-vocab serving chain on hardware (ROADMAP item):
        materialize the note-grammar TokenGrammar bitset at S x 152,064,
        load it through the engine, and drive one constrained decode at
        qwen2vl-7b geometry (int8 decoder on one chip). Weights are
        constant bf16 (zero egress — no checkpoint here): the grammar, not
        the model, is under test; the decode must still emit schema-valid
        JSON. Precompute wall time and bitset bytes are printed for the
        record."""
        import time
        from dataclasses import replace

        import jax.numpy as jnp

        from video_transformer_tpu.analyzer.schema import note_dfa
        from video_transformer_tpu.models.config import get_preset
        from video_transformer_tpu.models.hf_tokenizer import HfTokenizer
        from video_transformer_tpu.models.synth_vocab import (
            write_synth_qwen_vocab,
        )
        from video_transformer_tpu.models.vlm import VideoLM
        from video_transformer_tpu.ops.token_grammar import TokenGrammar
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        vocab_path = tmp_path / "tokenizer.json"
        write_synth_qwen_vocab(vocab_path, vocab_size=152064)
        tok = HfTokenizer(vocab_path, vocab_size=152064)

        t0 = time.perf_counter()
        grammar = TokenGrammar(
            note_dfa(512, scale=0.25), tok, cache_dir=str(tmp_path / "bits")
        )
        precompute_s = time.perf_counter() - t0
        bits_bytes = grammar.allowed_bits.nbytes
        print(
            f"\n152k bitset: states={grammar.num_states} "
            f"bytes={bits_bytes / 1e6:.1f}MB precompute={precompute_s:.1f}s"
        )
        assert grammar.allowed_bits.shape[1] == 152064 // 32

        config = get_preset("qwen2vl-7b")
        # Trim the cache budget: one chip serves the int8 decoder + a
        # short-sequence cache here (the preset's 32k max_seq_len would
        # reserve nothing extra — cache_len derives from prompt+max_new).
        model = VideoLM(config)
        import jax as _jax

        struct = _jax.eval_shape(
            lambda: model.init_variables(_jax.random.PRNGKey(0))
        )
        # Materialize constant host params with numpy (the axon plugin
        # exposes NO cpu backend, so jax.devices("cpu") raises here); the
        # engine device_puts them onto the mesh itself.
        import ml_dtypes
        import numpy as np

        params = _jax.tree_util.tree_map(
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
            dfa=grammar,
            tokenizer=tok,
            max_new_tokens=1400,
            temperature=1.0,
            seed=0,
            params=params,
            quantize="int8",
            # Constant weights make the sampler uniform over the allowed
            # set; at V=152,064 the 4 JSON-closing tokens then carry
            # ~4/152k probability per step and the note statistically
            # never closes within 1,400 tokens (morning queue: 19.5 min,
            # accept never reached). e^9.5 ~ 13k rebalances the close mass
            # to ~25%/step so the structural chain under test — bitset
            # gather, constrain, forced runs, accept — completes. Trained
            # weights don't need this (bench uses 2.5 for length control).
            structure_bias=9.5,
        )
        texts, status = engine.generate_text(
            ["生成本讲的结构化笔记"], prompt_len=128, return_status=True
        )
        assert status[0], "note did not reach grammar accept within budget"
        data = json.loads(texts[0])
        assert {"title", "one_sentence_summary"} <= set(data)
        tok_s = engine.stats.tokens_per_second
        print(f"7b constrained decode: {tok_s:.0f} tok/s complete={status[0]}")
