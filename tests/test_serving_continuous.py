"""Continuous batching: more requests than slots, mid-flight refills (CPU)."""

import json

import jax
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
from video_transformer_tpu.parallel.serving import (
    Completion,
    ContinuousBatcher,
    Request,
)


def micro_config() -> VLMConfig:
    return VLMConfig(
        name="micro",
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


def tiny_dfa():
    return (
        DfaBuilder()
        .literal('{"title": ')
        .free_string(1, 24)
        .literal("}")
        .finish()
    )


@pytest.fixture(scope="module")
def batcher():
    engine = InferenceEngine(
        micro_config(),
        mesh=build_mesh({"data": 4, "model": 2}),
        dfa=tiny_dfa(),
        max_new_tokens=96,
        temperature=1.0,
        seed=0,
        compilation_cache_dir=None,
    )
    return ContinuousBatcher(engine, slots=4, prompt_len=16, chunk_steps=8)


def make_requests(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        Request(
            request_id=i,
            frames=rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
            prompt=f"analyze {i}",
        )
        for i in range(n)
    ]


class TestContinuousBatching:
    def test_more_requests_than_slots_all_complete(self, batcher):
        """10 requests through 4 slots: every one returns valid JSON, so
        slots must have been refilled mid-flight."""
        for request in make_requests(10):
            batcher.submit(request)
        results = batcher.run()
        assert sorted(c.request_id for c in results) == list(range(10))
        for completion in results:
            assert completion.complete
            parsed = json.loads(completion.text)
            assert "title" in parsed

    def test_streaming_callback_fires_per_completion(self, batcher):
        seen: list[int] = []
        for request in make_requests(6, seed=3):
            batcher.submit(request)
        batcher.run(on_complete=lambda c: seen.append(c.request_id))
        assert sorted(seen) == list(range(6))

    def test_results_are_independent_per_request(self, batcher):
        """Different requests produce different sampled outputs (slots do not
        leak state between occupants)."""
        for request in make_requests(8, seed=9):
            batcher.submit(request)
        results = batcher.run()
        texts = {c.text for c in results}
        assert len(texts) > 1

    def test_empty_queue_run_returns_immediately(self, batcher):
        assert batcher.run() == []

    def test_priority_requests_claim_slots_first(self):
        """With one slot, submissions drain by priority (FIFO within level):
        a late high-priority request overtakes the earlier backlog."""
        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            dfa=tiny_dfa(),
            max_new_tokens=96,
            temperature=1.0,
            seed=0,
            compilation_cache_dir=None,
        )
        batcher = ContinuousBatcher(engine, slots=1, prompt_len=16, chunk_steps=8)
        requests = make_requests(4, seed=2)
        requests[3].priority = 5  # submitted last, claims the slot first
        for request in requests:
            batcher.submit(request)
        order: list[int] = []
        batcher.run(on_complete=lambda c: order.append(c.request_id))
        assert order == [3, 0, 1, 2]

    def test_adaptive_chunks_report_first_token_latency(self, batcher):
        """first_token_s is populated and short chunks engage while the
        queue is non-empty (the policy is host-side; we pin the surface)."""
        assert batcher._next_chunk_steps() == batcher.chunk_steps  # idle
        for request in make_requests(6, seed=4):
            batcher.submit(request)
        assert batcher._next_chunk_steps() == min(
            batcher.latency_steps, batcher.chunk_steps
        )
        results = batcher.run()
        assert all(c.first_token_s >= 0.0 for c in results)
        assert batcher._next_chunk_steps() == batcher.chunk_steps

    def test_prefill_uses_per_request_prompt_bucket(self):
        """Each slot's generation starts at video_tokens + the request's
        OWN round_up(tokens+1, 128) bucket — the train/serve prompt-block
        alignment (train/run.py::_pack_row == engine._assemble_inputs); a
        shared fixed width would shift positions for short prompts."""
        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 4, "model": 2}),
            dfa=tiny_dfa(),
            max_new_tokens=96,
            temperature=1.0,
            seed=0,
            compilation_cache_dir=None,
        )
        batcher = ContinuousBatcher(
            engine, slots=4, prompt_len=256, chunk_steps=8
        )
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
        batcher.submit(Request(0, frames, "短提示"))           # bucket 128
        batcher.submit(Request(1, frames, "长提示 " * 40))      # bucket 256
        batcher._fill_slots()
        video_tokens = engine.config.video_tokens
        index = np.asarray(batcher.cache["index"])
        assert index[0] == video_tokens + 128
        assert index[1] == video_tokens + 256
        # And both still decode to grammar-complete notes.
        results = {c.request_id: c for c in batcher.run()}
        assert results[0].complete and results[1].complete

    def test_host_driven_mode_still_works(self):
        """device_refill=False preserves the original host-loop scheduler
        (the parity oracle and the local-attached fast path)."""
        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 4, "model": 2}),
            dfa=tiny_dfa(),
            max_new_tokens=96,
            temperature=1.0,
            seed=0,
            compilation_cache_dir=None,
        )
        batcher = ContinuousBatcher(
            engine, slots=4, prompt_len=16, chunk_steps=8, device_refill=False
        )
        for request in make_requests(6, seed=11):
            batcher.submit(request)
        results = batcher.run()
        assert sorted(c.request_id for c in results) == list(range(6))
        assert all(json.loads(c.text).get("title") for c in results)

    def test_device_ring_overflow_stages_in_rounds(self):
        """More requests than the device ring holds: the host restages
        between chunks and every request still completes exactly once.
        (Single-device mesh: the slot pool's batch axis must divide the
        data axis, and this test wants a 2-slot pool.)"""
        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            dfa=tiny_dfa(),
            max_new_tokens=96,
            temperature=1.0,
            seed=0,
            compilation_cache_dir=None,
        )
        batcher = ContinuousBatcher(
            engine, slots=2, prompt_len=16, chunk_steps=8, queue_depth=3
        )
        for request in make_requests(9, seed=5):
            batcher.submit(request)
        results = batcher.run()
        ids = sorted(c.request_id for c in results)
        assert ids == list(range(9))
        for completion in results:
            assert completion.complete
            assert "title" in json.loads(completion.text)

    def test_greedy_batcher_matches_engine_token_for_token(self):
        """At temperature 0 the batcher's decode (parked prefill + slot
        pool + chunked loop) must reproduce the engine's run-to-completion
        output EXACTLY — pins prompt-block alignment, parked-KV adoption,
        and step semantics in one assertion."""
        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            dfa=tiny_dfa(),
            max_new_tokens=96,
            temperature=0.0,
            seed=0,
            compilation_cache_dir=None,
        )
        rng = np.random.default_rng(21)
        frames = rng.integers(0, 255, (2, 4, 32, 32, 3), dtype=np.uint8)
        prompts = ["分析第一段", "analyze the second clip in detail"]
        _, _, engine_ids = engine.generate(
            frames, prompts, return_status=True, return_tokens=True
        )

        batcher = ContinuousBatcher(
            engine, slots=2, prompt_len=256, chunk_steps=8
        )
        batcher.submit(Request(0, frames[0], prompts[0]))
        batcher.submit(Request(1, frames[1], prompts[1]))
        by_id = {c.request_id: c for c in batcher.run()}
        assert by_id[0].token_ids == engine_ids[0]
        assert by_id[1].token_ids == engine_ids[1]

    def test_completion_reports_token_budget_exhaustion(self):
        """A grammar that cannot finish within max_new yields complete=False
        (the scheduler's signal to continue or re-ask upstream)."""
        dfa = (
            DfaBuilder()
            .literal('{"long": ')
            .free_string(200, 400)
            .literal("}")
            .finish()
        )
        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 4, "model": 2}),
            dfa=dfa,
            max_new_tokens=32,
            temperature=1.0,
            seed=0,
            compilation_cache_dir=None,
        )
        batcher = ContinuousBatcher(engine, slots=4, prompt_len=16, chunk_steps=8)
        for request in make_requests(2, seed=1):
            batcher.submit(request)
        results = batcher.run()
        assert len(results) == 2
        assert all(not c.complete for c in results)


def micro_draft_config() -> VLMConfig:
    """A smaller drafting model with the SAME vocab but its own encoder
    geometry (2 frames -> fewer video tokens than the target's 4), so the
    draft pool's prefill indices genuinely differ from the target's."""
    return VLMConfig(
        name="micro-draft",
        encoder=EncoderConfig(
            hidden_dim=32, num_layers=1, num_heads=2, head_dim=16, mlp_dim=64,
            image_size=32, patch_size=16, tubelet_t=2, num_frames=2,
        ),
        decoder=DecoderConfig(
            vocab_size=512, hidden_dim=32, num_layers=1, num_heads=2,
            num_kv_heads=2, head_dim=16, mlp_dim=64, max_seq_len=1024,
        ),
        dtype="float32",
    )


class TestSpeculativeBatching:
    """Speculative decoding composed with continuous batching: the draft
    rides the same paged pools (own KV pool, shared rows table)."""

    def test_greedy_spec_batcher_matches_plain_engine(self):
        """Greedy speculative acceptance is exact, so the spec batcher must
        reproduce the PLAIN engine's run-to-completion output token for
        token — one assertion pins draft parking, dual-pool refill
        adoption, and the wide-verify step semantics. The random-init
        draft mispredicts nearly everything, so the rejection path (not
        the all-accept fast path) is what's being pinned."""
        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            dfa=tiny_dfa(),
            max_new_tokens=96,
            temperature=0.0,
            seed=0,
            compilation_cache_dir=None,
        )
        rng = np.random.default_rng(33)
        frames = rng.integers(0, 255, (2, 4, 32, 32, 3), dtype=np.uint8)
        prompts = ["分析第一段", "analyze the second clip in detail"]
        _, _, plain_ids = engine.generate(
            frames, prompts, return_status=True, return_tokens=True
        )

        engine.attach_draft(micro_draft_config(), spec_tokens=4)
        batcher = ContinuousBatcher(
            engine, slots=2, prompt_len=256, chunk_steps=8
        )
        batcher.submit(Request(0, frames[0], prompts[0]))
        batcher.submit(Request(1, frames[1], prompts[1]))
        by_id = {c.request_id: c for c in batcher.run()}
        assert by_id[0].token_ids == plain_ids[0]
        assert by_id[1].token_ids == plain_ids[1]

    def test_spec_refills_more_requests_than_slots(self):
        """6 requests through 2 slots with the draft attached: every
        completion parses, so ring refills adopted BOTH pools' state
        (a stale draft index would desync proposals and stall the
        grammar)."""
        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            dfa=tiny_dfa(),
            max_new_tokens=96,
            temperature=1.0,
            seed=0,
            compilation_cache_dir=None,
        )
        engine.attach_draft(micro_draft_config(), spec_tokens=4)
        batcher = ContinuousBatcher(
            engine, slots=2, prompt_len=16, chunk_steps=8
        )
        for request in make_requests(6, seed=5):
            batcher.submit(request)
        results = batcher.run()
        assert len(results) == 6
        assert {c.request_id for c in results} == set(range(6))
        for completion in results:
            assert completion.complete
            payload = json.loads(completion.text)
            assert set(payload) == {"title"}

    def test_spec_requires_device_refill(self):
        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            dfa=tiny_dfa(),
            max_new_tokens=16,
            temperature=0.0,
            seed=0,
            compilation_cache_dir=None,
        )
        engine.attach_draft(micro_draft_config(), spec_tokens=4)
        with pytest.raises(ValueError, match="device_refill"):
            ContinuousBatcher(
                engine, slots=2, prompt_len=16, device_refill=False
            )

    def test_spec_batcher_runs_sharded(self):
        """The composed program (draft scan + wide verify + dual-pool
        refill) must compile and produce valid completions under dp x tp
        GSPMD sharding — pools split over 'data', heads over 'model'."""
        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 4, "model": 2}),
            dfa=tiny_dfa(),
            max_new_tokens=64,
            temperature=0.7,
            seed=0,
            compilation_cache_dir=None,
        )
        engine.attach_draft(micro_draft_config(), spec_tokens=4)
        batcher = ContinuousBatcher(
            engine, slots=4, prompt_len=16, chunk_steps=8
        )
        for request in make_requests(6, seed=11):
            batcher.submit(request)
        results = batcher.run()
        assert len(results) == 6
        for completion in results:
            assert completion.complete
            assert set(json.loads(completion.text)) == {"title"}
