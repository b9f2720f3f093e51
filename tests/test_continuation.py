"""MAX_TOKENS continuation + note-length contract (CPU).

Round-1 gap (VERDICT Missing #3): the engine had a hard per-call token
ceiling and no continuation, so the 220-line note minimum
(utils/refiner_contract.py) was physically unreachable. These tests pin the
continuation mechanism (reference content_analyzer.py:1385-1464) and the
rendered-length contract.
"""

import json

import numpy as np
import pytest

import __graft_entry__
from video_transformer_tpu.analyzer.schema import note_dfa
from video_transformer_tpu.analyzer.segmentation import (
    merge_segment_outputs,
    offset_timestamps,
)
from video_transformer_tpu.contracts import AnalysisResult
from video_transformer_tpu.parallel.engine import InferenceEngine
from video_transformer_tpu.train.grounded import TOPIC_BANK, grounded_note
from video_transformer_tpu.utils.refiner_contract import (
    budget_for_duration,
    count_budget_lines,
)


@pytest.fixture(scope="module")
def capped_engine():
    """Tiny engine with a token budget far too small for one full note."""
    from dataclasses import replace

    config = __graft_entry__._tiny_config()
    config = replace(
        config, decoder=replace(config.decoder, max_seq_len=4096)
    )
    return InferenceEngine(
        config,
        dfa=note_dfa(512, scale=0.2),
        max_new_tokens=160,
        temperature=1.0,
        # High close bias keeps sampled free fields near their minimum
        # lengths: the continuation CONTRACTS under test are length-blind,
        # and shorter notes cut the CPU decode wall of every round loop.
        structure_bias=5.0,
        seed=3,
        compilation_cache_dir=None,
    )


class TestContinuation:
    def test_capped_generation_reports_incomplete(self, capped_engine):
        texts, complete = capped_engine.generate_text(
            ["分析视频"], prompt_len=16, return_status=True
        )
        # 160 byte-tokens cannot finish the scale-0.2 note grammar.
        assert complete == [False]
        with pytest.raises(json.JSONDecodeError):
            json.loads(texts[0])

    def test_continuation_rounds_complete_the_note(self, capped_engine):
        """Token-id continuation (the analyzer's path) finishes the note."""
        _, complete, ids = capped_engine.generate_text(
            ["分析视频"], prompt_len=16, return_status=True, return_tokens=True
        )
        all_ids = list(ids[0])
        rounds = 0
        while not complete[0] and rounds < 12:
            _, complete, more = capped_engine.generate_text(
                ["分析视频"], prompt_len=16, prefixes=[all_ids],
                return_status=True, return_tokens=True,
            )
            assert more[0]  # every round must make progress
            all_ids += more[0]
            rounds += 1
        assert complete[0], f"note incomplete after {rounds} continuations"
        data = json.loads(capped_engine.tokenizer.decode(all_ids))
        assert {"title", "deep_dive", "glossary"} <= data.keys()

    def test_prefix_resumes_grammar_not_restarts(self, capped_engine):
        """The continuation's new text may not re-open the JSON document."""
        texts, _ = capped_engine.generate_text(
            ["分析视频"], prompt_len=16, return_status=True
        )
        more, _ = capped_engine.generate_text(
            ["分析视频"], prompt_len=16, prefixes=[texts[0]],
            return_status=True,
        )
        assert not more[0].startswith('{"title"')

    def test_overlong_prefix_raises(self, capped_engine):
        huge = "x" * (capped_engine.config.decoder.max_seq_len * 2)
        with pytest.raises(ValueError, match="sequence budget"):
            capped_engine.generate_text(
                ["分析视频"], prompt_len=16, prefixes=[huge],
                return_status=True,
            )


class TestSessionContinuation:
    """Cache-reusing continuation: decode-only rounds, zero re-prefill."""

    def test_session_rounds_complete_the_note(self, capped_engine):
        _, complete, ids, session = capped_engine.generate_text(
            ["分析视频"], prompt_len=16, return_status=True,
            return_tokens=True, session_rounds=12, return_session=True,
        )
        assert session is not None and session.rounds_left > 0
        prefill_before = capped_engine.stats.prefill_tokens
        all_ids = list(ids[0])
        rounds = 0
        while not complete[0] and session.rounds_left > 0:
            _, complete, more = capped_engine.continue_session(session)
            assert more[0]  # every live round must make progress
            all_ids += more[0]
            rounds += 1
        assert complete[0], f"note incomplete after {rounds} session rounds"
        # The whole point: continuation rounds never re-prefilled.
        assert capped_engine.stats.prefill_tokens == prefill_before
        data = json.loads(capped_engine.tokenizer.decode(all_ids))
        assert {"title", "deep_dive", "glossary"} <= data.keys()

    def test_session_tail_does_not_restart_document(self, capped_engine):
        _, complete, _, session = capped_engine.generate_text(
            ["分析视频"], prompt_len=16, return_status=True,
            return_tokens=True, session_rounds=2, return_session=True,
        )
        assert complete == [False]
        tails, _, _ = capped_engine.continue_session(session)
        assert tails[0] and not tails[0].startswith('{"title"')

    def test_completed_rows_return_empty_tails(self, capped_engine):
        """A session resumed after acceptance leaves the row frozen."""
        _, complete, _, session = capped_engine.generate_text(
            ["分析视频"], prompt_len=16, return_status=True,
            return_tokens=True, session_rounds=12, return_session=True,
        )
        while not complete[0] and session.rounds_left > 1:
            _, complete, _ = capped_engine.continue_session(session)
        # The scale-0.2 note completes well inside the reserve; if this
        # precondition breaks, the contract below must fail loudly rather
        # than silently skip.
        assert complete[0] and session.rounds_left > 0, (
            f"note incomplete with rounds_left={session.rounds_left}"
        )
        tails, now_done, tail_ids = capped_engine.continue_session(session)
        assert tails[0] == ""
        assert tail_ids[0] == []
        assert now_done[0]

    def test_rounds_granted_fit_sequence_budget(self, capped_engine):
        """An oversized reserve degrades to what the cache can hold."""
        max_seq = capped_engine.config.decoder.max_seq_len
        per_round = capped_engine.max_new_tokens
        ceiling = max_seq // per_round  # loose upper bound on grantable rounds
        _, _, _, session = capped_engine.generate_text(
            ["分析视频"], prompt_len=16, return_status=True,
            return_tokens=True, session_rounds=10_000, return_session=True,
        )
        assert session is not None
        assert 0 < session.rounds_left <= ceiling

    def test_prompt_bucket_ceiling_fits_cache_formula(self, capped_engine):
        """A ceiling-bucket prompt must still satisfy the extra_rounds=0
        cache formula at the engine's worst-case block width (the ceiling
        once reserved a flat 128, which large max_forced_run overran)."""
        eng = capped_engine
        max_seq = eng.config.decoder.max_seq_len
        bw_max = 1 + eng.max_forced_run
        for with_video in (False, True):
            bucket = eng._prompt_bucket(["长" * 3 * max_seq], with_video)
            video = eng.config.video_tokens if with_video else 0
            total = video + bucket + eng.max_new_tokens + 2 * bw_max + 17
            cache_len = -(-total // 128) * 128
            assert cache_len <= max_seq, (with_video, bucket, cache_len)

    def test_granted_rounds_never_overflow_cache_formula(self, capped_engine):
        """The closed-form grant must satisfy the _build_generate cache
        formula (video + prompt + (1+r)*(max_new+bw) + 1 + bw + 16, rounded
        to 128) for every prompt width — the grant once omitted the tail
        slack and a maximal reserve overflowed max_seq_len at build time."""
        eng = capped_engine
        max_seq = eng.config.decoder.max_seq_len
        bw = eng._block_width(eng.dfa)
        per_round = eng.max_new_tokens + bw
        for prompt_width in range(128, 2049, 128):
            r = eng._max_session_rounds(prompt_width, False, 10_000, eng.dfa)
            total = prompt_width + (1 + r) * per_round + 1 + bw + 16
            cache_len = -(-total // 128) * 128
            assert cache_len <= max_seq, (prompt_width, r, cache_len)

    def test_unfittable_session_returns_none(self):
        """max_new at the sequence ceiling leaves no reserve -> None."""
        config = __graft_entry__._tiny_config()
        engine = InferenceEngine(
            config,
            dfa=note_dfa(512, scale=0.2),
            max_new_tokens=config.decoder.max_seq_len - 256,
            temperature=1.0,
            structure_bias=2.0,
            seed=3,
            compilation_cache_dir=None,
        )
        _, session = engine.generate_text(
            ["x"], prompt_len=16, session_rounds=3, return_session=True,
        )
        assert session is None

    def test_reserve_without_return_session_is_dropped(self, capped_engine):
        """session_rounds alone must not reserve cache (dead HBM + a dead
        compile bucket) — the session is the only consumer of the reserve."""
        before = set(capped_engine._generate_cache)
        capped_engine.generate_text(
            ["分析视频"], prompt_len=16, session_rounds=12,
        )
        new_keys = set(capped_engine._generate_cache) - before
        assert all(
            key[4] == 0 and key[5] is False
            for key in new_keys if key[0] != "resume"
        ), f"reserve leaked into compile buckets: {new_keys}"

    def test_batch_bucket_pads_to_fixed_program(self):
        """batch_bucket routes a ragged batch into the bucket's program
        (pad rows freeze at step 0; results cover only the real rows)."""
        import jax
        from dataclasses import replace

        from video_transformer_tpu.parallel.mesh import build_mesh

        config = __graft_entry__._tiny_config()
        config = replace(config, decoder=replace(config.decoder, max_seq_len=4096))
        engine = InferenceEngine(
            config,
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            dfa=note_dfa(512, scale=0.2),
            max_new_tokens=160,
            temperature=1.0,
            structure_bias=2.0,
            seed=3,
            compilation_cache_dir=None,
        )
        texts = engine.generate_text(
            ["分析视频", "分析音频"], prompt_len=16, batch_bucket=4,
        )
        assert len(texts) == 2
        assert any(
            k[0] == 4 for k in engine._generate_cache if k[0] != "resume"
        )

    def test_exhausted_session_raises(self, capped_engine):
        _, _, _, session = capped_engine.generate_text(
            ["分析视频"], prompt_len=16, return_status=True,
            return_tokens=True, session_rounds=1, return_session=True,
        )
        capped_engine.continue_session(session)
        with pytest.raises(ValueError, match="exhausted"):
            capped_engine.continue_session(session)


class TestAnalyzerContinuationLoop:
    @staticmethod
    def _tok():
        from video_transformer_tpu.models.tokenizer import ByteTokenizer

        return ByteTokenizer(512)

    def test_continues_until_complete(self):
        """_continue_incomplete drives rows to completion within the cap."""
        from video_transformer_tpu.analyzer.content_analyzer import ContentAnalyzer
        from video_transformer_tpu.utils.counter import APICounter

        tok = self._tok()

        class StubEngine:
            data_parallel = 1
            tokenizer = tok

            def __init__(self):
                self.calls = 0
                self.seen_prefixes = []

            def generate(self, frames, prompts, prefixes=None,
                         return_status=False, return_tokens=False):
                self.calls += 1
                self.seen_prefixes.append(prefixes)
                text = "部分" if self.calls < 2 else "结尾"
                done = self.calls >= 2
                ids = [tok.encode(text)] * len(prompts)
                return (
                    [text] * len(prompts),
                    [done] * len(prompts),
                    ids,
                )

        engine = StubEngine()
        analyzer = ContentAnalyzer(
            {"analyzer": {"max_continuations": 3}},
            APICounter(max_calls=50),
            engine=engine,
        )
        frames = np.zeros((2, 1, 4, 4, 3), np.uint8)
        texts = analyzer._continue_incomplete(
            frames, ["p", "p"], [tok.encode("开头"), tok.encode("开头")],
            [False, False],
        )
        assert texts == ["开头部分结尾", "开头部分结尾"]
        assert engine.calls == 2  # continuation rounds only
        # Continuation passes accumulated TOKEN IDS, not re-encoded text.
        assert engine.seen_prefixes[1] == [
            tok.encode("开头部分"), tok.encode("开头部分")
        ]

    def test_mid_utf8_cap_decodes_exactly(self):
        """A token cap splitting a CJK character must not corrupt the note.

        Text-based accumulation would decode each half to U+FFFD; id-based
        accumulation restores the character when the halves rejoin.
        """
        from video_transformer_tpu.analyzer.content_analyzer import ContentAnalyzer
        from video_transformer_tpu.utils.counter import APICounter

        tok = self._tok()
        char = "梯".encode("utf-8")  # 3 bytes
        head, tail = list(char[:2]), list(char[2:])

        class SplitEngine:
            data_parallel = 1
            tokenizer = tok

            def generate(self, frames, prompts, prefixes=None,
                         return_status=False, return_tokens=False):
                # Resumes exactly after the 2 dangling bytes.
                assert prefixes == [head]
                return ["�"], [True], [tail]

        analyzer = ContentAnalyzer(
            {"analyzer": {"max_continuations": 2}},
            APICounter(max_calls=50),
            engine=SplitEngine(),
        )
        frames = np.zeros((1, 1, 4, 4, 3), np.uint8)
        texts = analyzer._continue_incomplete(frames, ["p"], [head], [False])
        assert texts == ["梯"]

    def test_session_resume_preferred_over_reprefill(self):
        """With a live session, continuation rounds never call generate."""
        from video_transformer_tpu.analyzer.content_analyzer import ContentAnalyzer
        from video_transformer_tpu.utils.counter import APICounter

        tok = self._tok()

        class Session:
            rounds_left = 3

        class SessionEngine:
            data_parallel = 1
            tokenizer = tok

            def __init__(self):
                self.generate_calls = 0
                self.resume_calls = 0

            def generate(self, frames, prompts, prefixes=None,
                         return_status=False, return_tokens=False,
                         session_rounds=0, return_session=False):
                self.generate_calls += 1
                raise AssertionError("continuation must resume, not re-prefill")

            def continue_session(self, session):
                self.resume_calls += 1
                session.rounds_left -= 1
                done = self.resume_calls >= 2
                return ["尾"], [done], [tok.encode("尾")]

        engine = SessionEngine()
        analyzer = ContentAnalyzer(
            {"analyzer": {"max_continuations": 3}},
            APICounter(max_calls=50),
            engine=engine,
        )
        frames = np.zeros((1, 1, 4, 4, 3), np.uint8)
        texts = analyzer._continue_incomplete(
            frames, ["p"], [tok.encode("头")], [False], Session()
        )
        assert texts == ["头尾尾"]
        assert engine.resume_calls == 2
        assert engine.generate_calls == 0

    def test_budget_stops_continuation(self):
        from video_transformer_tpu.analyzer.content_analyzer import ContentAnalyzer
        from video_transformer_tpu.utils.counter import APICounter

        tok = self._tok()

        class NeverDone:
            data_parallel = 1
            tokenizer = tok

            def generate(self, frames, prompts, prefixes=None,
                         return_status=False, return_tokens=False):
                ids = [tok.encode("x")] * len(prompts)
                return ["x"] * len(prompts), [False] * len(prompts), ids

        counter = APICounter(max_calls=1)
        analyzer = ContentAnalyzer(
            {"analyzer": {"max_continuations": 5}}, counter, engine=NeverDone()
        )
        frames = np.zeros((2, 1, 4, 4, 3), np.uint8)
        texts = analyzer._continue_incomplete(
            frames, ["p", "p"], [tok.encode("a"), tok.encode("b")],
            [False, False],
        )
        assert texts == ["a", "b"]  # skipped: 2 rows > 1 remaining call


class TestNoteLengthContract:
    def test_hour_video_merge_renders_inside_budget(self):
        """8 segments of a 60-min video must render >= the 220-line floor
        (and at most the 900 cap) — the capacity the physical token ceiling
        previously made unreachable."""
        rng = np.random.default_rng(7)
        outputs = []
        for i in range(8):
            note = grounded_note(TOPIC_BANK[i], rng)
            outputs.append(
                {
                    "start": i * 450.0,
                    "end": (i + 1) * 450.0,
                    "data": offset_timestamps(note, i * 450.0),
                }
            )
        merged = merge_segment_outputs(outputs, [])
        result = AnalysisResult.from_api_response(
            "hour.npzv", merged, metadata={"duration": 3600.0}
        )
        markdown = result.knowledge_doc.to_markdown(self_check_mode="lecture")
        lines = count_budget_lines(markdown)
        floor = budget_for_duration(3600.0)  # target 400, clamp [220, 900]
        assert lines >= 220, f"rendered only {lines} lines (target {floor.target_lines})"
        assert lines <= 900
