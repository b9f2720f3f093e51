"""Speculative decoding: draft-model blocks verified by one wide target forward.

Correctness bars (the perf claim is measured on-chip by tools/decode_bench):

- GREEDY EXACTNESS: with temperature 0, the speculative engine's output is
  token-for-token identical to the plain engine's, for ANY draft — a random
  draft just gets every proposal rejected. This is the speculative-decoding
  contract: the draft only accelerates, never changes, the target's output.
- Self-drafting (draft weights == target weights at the same geometry)
  accepts nearly everything, so the loop finishes in far fewer target
  forwards while producing the same text.
- Grammar integration: a grammar-constrained draft proposes forced-run
  tokens with probability 1 (single-support distributions), so constrained
  decodes stay schema-valid and the plain loop's forced fast-forward is
  subsumed.
- Sessions: cache-reusing continuation carries the draft cache alongside
  the target's; a resumed speculative generation equals one long budget.

Reference parity target: this accelerates the generation replacing the
reference's cloud call (/root/reference/src/analyzer/content_analyzer.py:1485).
"""

import dataclasses

import numpy as np
import pytest

from video_transformer_tpu.models.config import (
    DecoderConfig,
    EncoderConfig,
    VLMConfig,
)
from video_transformer_tpu.ops.constrained import DfaBuilder
from video_transformer_tpu.parallel.engine import InferenceEngine
from video_transformer_tpu.parallel.mesh import build_mesh

TARGET = VLMConfig(
    name="spec-target",
    encoder=EncoderConfig(
        hidden_dim=64, num_layers=1, num_heads=2, head_dim=32, mlp_dim=128,
        image_size=32, patch_size=16, tubelet_t=2, num_frames=4,
    ),
    decoder=DecoderConfig(
        vocab_size=512, hidden_dim=64, num_layers=2, num_heads=2,
        num_kv_heads=2, head_dim=32, mlp_dim=128, max_seq_len=1024,
    ),
    dtype="float32",
)

# A smaller draft with a DIFFERENT frame count/geometry (the deployment
# shape: tiny drafting for base).
DRAFT = VLMConfig(
    name="spec-draft",
    encoder=EncoderConfig(
        hidden_dim=32, num_layers=1, num_heads=1, head_dim=32, mlp_dim=64,
        image_size=32, patch_size=16, tubelet_t=2, num_frames=2,
    ),
    decoder=DecoderConfig(
        vocab_size=512, hidden_dim=32, num_layers=1, num_heads=1,
        num_kv_heads=1, head_dim=32, mlp_dim=64, max_seq_len=1024,
    ),
    dtype="float32",
)


def note_dfa():
    return (
        DfaBuilder()
        .literal('{"title": ')
        .free_string(1, 8)
        .literal(', "tags": ')
        .string_list(1, 6)
        .literal("}")
        .finish()
    )


def make_engine(draft: VLMConfig | None, temperature=0.0, max_new=48,
                spec_tokens=4, seed=0, **kw):
    engine = InferenceEngine(
        TARGET,
        mesh=build_mesh({"data": -1, "model": 1}),
        max_new_tokens=max_new,
        temperature=temperature,
        seed=seed,
        **kw,
    )
    if draft is not None:
        engine.attach_draft(draft, spec_tokens=spec_tokens)
    return engine


def clip(b=2, t=4, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(b, t, 32, 32, 3), dtype=np.uint8)


class TestGreedyExactness:
    """Speculative greedy output == plain greedy output, token for token."""

    def test_text_with_grammar(self):
        dfa = note_dfa()
        plain = make_engine(None, dfa=dfa, max_new=96)
        spec = make_engine(DRAFT, dfa=dfa, max_new=96)
        prompts = ["analyze the lecture", "second clip"]
        want, want_ok, want_ids = plain.generate_text(
            prompts, return_status=True, return_tokens=True
        )
        got, got_ok, got_ids = spec.generate_text(
            prompts, return_status=True, return_tokens=True
        )
        assert all(want_ok), "bar needs completed generations; raise max_new"
        assert got_ok == want_ok
        assert got_ids == want_ids
        assert got == want

    def test_capped_rows_are_prefixes_of_the_same_stream(self):
        """A token-capped row may cut at a slightly different point than the
        plain loop (each loop overshoots the cap by its own block), but both
        emit prefixes of the SAME greedy stream — the contract continuation
        relies on."""
        dfa = note_dfa()
        long = make_engine(None, dfa=dfa, max_new=192)
        stream = long.generate_text(["analyze"], return_tokens=True)[1][0]
        capped = make_engine(DRAFT, dfa=dfa, max_new=24)
        ids = capped.generate_text(["analyze"], return_tokens=True)[1][0]
        assert ids == stream[: len(ids)]

    def test_video_path(self):
        dfa = note_dfa()
        plain = make_engine(None, dfa=dfa, max_new=96)
        spec = make_engine(DRAFT, dfa=dfa, max_new=96)
        frames = clip()
        want = plain.generate(frames, ["a", "b"])
        got = spec.generate(frames, ["a", "b"])
        assert got == want

    def test_close_bias_applies(self):
        dfa = note_dfa()
        plain = make_engine(None, dfa=dfa, structure_bias=4.0, max_new=96)
        spec = make_engine(DRAFT, dfa=dfa, structure_bias=4.0, max_new=96)
        want = plain.generate_text(["x"])
        got = spec.generate_text(["x"])
        assert got == want


class TestSelfDraftAcceptance:
    """Draft == target weights: near-total acceptance, far fewer steps."""

    def test_fewer_target_forwards_same_text(self):
        dfa = note_dfa()
        plain = make_engine(None, dfa=dfa, max_new=64)
        # Plain decode steps: grammar fast-forward already compresses
        # forced runs, so count its loop iterations as the bar.
        want = plain.generate_text(["describe"], return_tokens=True)[1][0]
        plain_steps = plain.stats.decode_steps

        spec = make_engine(None, dfa=dfa, max_new=64)
        spec.attach_draft(TARGET, params=None, spec_tokens=6)
        # Same weights for draft and target -> every proposal accepted.
        spec.draft_params = spec.params
        got = spec.generate_text(["describe"], return_tokens=True)[1][0]
        # Random weights never complete within the cap, so the two loops
        # truncate the shared greedy stream at different points — compare
        # the common prefix and the step economics.
        n = min(len(got), len(want))
        assert got[:n] == want[:n] and n > 32
        assert spec.stats.decode_steps < plain_steps

    def test_random_draft_still_terminates(self):
        # Worst case: every content proposal rejected; advance >= 1/cycle.
        spec = make_engine(DRAFT, max_new=16)
        texts = spec.generate_text(["q"])
        assert isinstance(texts[0], str)
        assert spec.stats.decode_steps <= 16


class TestSampling:
    """temperature > 0 uses speculative rejection sampling: output stays
    grammar-valid and the engine remains deterministic per seed."""

    def test_grammar_valid_and_complete(self):
        import json

        dfa = note_dfa()
        spec = make_engine(DRAFT, dfa=dfa, temperature=0.9, max_new=64)
        texts, status = spec.generate_text(["a", "b"], return_status=True)
        for text, ok in zip(texts, status):
            if ok:
                doc = json.loads(text)
                assert set(doc) == {"title", "tags"}

    def test_seed_determinism(self):
        dfa = note_dfa()
        a = make_engine(DRAFT, dfa=dfa, temperature=0.8, seed=7)
        b = make_engine(DRAFT, dfa=dfa, temperature=0.8, seed=7)
        assert a.generate_text(["x"]) == b.generate_text(["x"])

    def test_residual_distribution_matches_target(self):
        """Statistical check of speculative sampling's exactness: with a
        DIFFERENT random draft, the first-token marginal over many seeded
        engines must match the plain engine's (chi-square-ish bound)."""
        import jax

        dfa = (
            DfaBuilder().literal('"').free_string(1, 1).literal('"').finish()
        )
        p = make_engine(None, dfa=dfa, temperature=1.0, max_new=8)
        s = make_engine(DRAFT, dfa=dfa, temperature=1.0, max_new=8)
        counts_plain: dict[str, int] = {}
        counts_spec: dict[str, int] = {}
        n = 60
        for seed in range(n):
            # Reseed in place: the compiled programs are reused across
            # trials (rebuilding engines would recompile 2n programs).
            p._rng = jax.random.PRNGKey(seed)
            s._rng = jax.random.PRNGKey(seed)
            tp = p.generate_text(["x"])[0]
            ts = s.generate_text(["x"])[0]
            counts_plain[tp] = counts_plain.get(tp, 0) + 1
            counts_spec[ts] = counts_spec.get(ts, 0) + 1
        # Same support and no wild frequency drift for common outcomes.
        common = set(counts_plain) | set(counts_spec)
        for key in common:
            a = counts_plain.get(key, 0) / n
            b = counts_spec.get(key, 0) / n
            assert abs(a - b) < 0.35, (key, counts_plain, counts_spec)


class TestSessions:
    def test_session_continuation_matches_long_budget(self):
        dfa = note_dfa()
        long = make_engine(DRAFT, dfa=dfa, max_new=96)
        want, want_ok = long.generate_text(["go"], return_status=True)

        short = make_engine(DRAFT, dfa=dfa, max_new=24)
        texts, status, ids, session = short.generate_text(
            ["go"], return_status=True, return_tokens=True,
            session_rounds=4, return_session=True,
        )
        assert session is not None and session.draft_cache is not None
        combined = texts[0]
        ok = status[0]
        while not ok and session.rounds_left > 0:
            tails, done, _ = short.continue_session(session)
            combined += tails[0]
            ok = done[0]
        assert ok == want_ok[0]
        assert combined == want[0]


class TestQuantizedSpec:
    def test_greedy_parity_with_int8_target(self):
        """tonight's on-chip spec stages serve int8 targets: the wide
        verify forward must run the QDense path and still match the plain
        int8 engine token-for-token (the draft itself stays bf16/f32)."""
        dfa = note_dfa()
        plain = make_engine(None, dfa=dfa, max_new=96, quantize="int8")
        spec = make_engine(DRAFT, dfa=dfa, max_new=96, quantize="int8")
        want, want_ok = plain.generate_text(["量化测试"], return_status=True)
        got, got_ok = spec.generate_text(["量化测试"], return_status=True)
        assert want_ok[0], "raise max_new: parity bar needs completion"
        assert got_ok == want_ok and got == want


class TestShardedSpec:
    def test_greedy_parity_on_tp_mesh(self):
        """Speculative decoding under tensor parallelism: draft params
        shard by the same partition rules (the tiny draft's 1 kv head
        falls back to data-only KV sharding) and greedy output still
        matches the plain engine on the same mesh."""
        dfa = note_dfa()

        def build(draft):
            engine = InferenceEngine(
                TARGET,
                mesh=build_mesh({"data": 4, "model": 2}),
                dfa=dfa,
                max_new_tokens=96,
                temperature=0.0,
                seed=0,
            )
            if draft:
                engine.attach_draft(DRAFT, spec_tokens=4)
            return engine

        want = build(False).generate_text(["总结要点", "第二段"])
        got = build(True).generate_text(["总结要点", "第二段"])
        assert got == want


class TestValidation:
    def test_vocab_mismatch_rejected(self):
        engine = make_engine(None)
        bad = dataclasses.replace(
            DRAFT, decoder=dataclasses.replace(DRAFT.decoder, vocab_size=640)
        )
        with pytest.raises(ValueError, match="vocab"):
            engine.attach_draft(bad)

    def test_spec_tokens_bounds(self):
        engine = make_engine(None)
        with pytest.raises(ValueError, match="spec_tokens"):
            engine.attach_draft(DRAFT, spec_tokens=1)

    def test_session_does_not_survive_attach_detach(self):
        """A live session's resume carry matches the engine's CURRENT
        draft state; attach_draft/detach_draft invalidate it loudly
        instead of feeding it to the wrong compiled program."""
        dfa = note_dfa()
        engine = make_engine(None, dfa=dfa, max_new=16)
        *_, session = engine.generate_text(
            ["go"], session_rounds=2, return_session=True
        )
        engine.attach_draft(DRAFT, spec_tokens=4)
        with pytest.raises(ValueError, match="attach_draft"):
            engine.continue_session(session)

        spec_engine = make_engine(DRAFT, dfa=dfa, max_new=16)
        *_, spec_session = spec_engine.generate_text(
            ["go"], session_rounds=2, return_session=True
        )
        spec_engine.detach_draft()
        with pytest.raises(ValueError, match="detach_draft"):
            spec_engine.continue_session(spec_session)

    def test_share_target_params_requires_same_geometry(self):
        engine = make_engine(None)
        with pytest.raises(ValueError, match="geometry"):
            engine.attach_draft(DRAFT, share_target_params=True)
