"""Property-based fuzz tests: renderer robustness, grammar soundness,
engine determinism."""

import json

import numpy as np
import pytest

from video_transformer_tpu.contracts import AnalysisResult
from video_transformer_tpu.models.tokenizer import ByteTokenizer


def random_value(rng, depth=0):
    """Random JSON-ish value simulating model type drift."""
    choices = ["str", "int", "float", "list", "dict", "none"]
    kind = rng.choice(choices if depth < 2 else ["str", "int", "none"])
    if kind == "str":
        length = int(rng.integers(0, 30))
        return "".join(chr(int(c)) for c in rng.integers(0x4E00, 0x4E80, length))
    if kind == "int":
        return int(rng.integers(-1000, 100000))
    if kind == "float":
        return float(rng.normal() * 1000)
    if kind == "list":
        return [random_value(rng, depth + 1) for _ in range(int(rng.integers(0, 4)))]
    if kind == "dict":
        return {
            f"k{i}": random_value(rng, depth + 1)
            for i in range(int(rng.integers(0, 4)))
        }
    return None


def random_section(rng):
    section = {"topic": random_value(rng), "explanation": random_value(rng)}
    for key in ("example", "code", "connections", "common_mistakes",
                "self_check", "challenge", "timestamp", "start_time"):
        if rng.random() < 0.5:
            section[key] = random_value(rng)
    return section


def random_response(rng):
    deep_dive = []
    for _ in range(int(rng.integers(0, 4))):
        if rng.random() < 0.5:
            deep_dive.append(
                {
                    "chapter_title": random_value(rng),
                    "chapter_summary": random_value(rng),
                    "chapter_self_check": random_value(rng),
                    "sections": [random_section(rng) for _ in range(int(rng.integers(0, 3)))],
                }
            )
        else:
            deep_dive.append(random_section(rng))
    return {
        "title": random_value(rng),
        "one_sentence_summary": random_value(rng),
        "key_takeaways": random_value(rng) or [],
        "deep_dive": deep_dive,
        "glossary": random_value(rng),  # any type: gate must coerce
        "visual_schemas": random_value(rng),
    }


class TestRendererFuzz:
    @pytest.mark.parametrize("seed", range(30))
    def test_random_drifted_responses_render_all_modes(self, seed):
        """from_api_response + every render mode must never raise on
        type-drifted (but field-complete) responses."""
        rng = np.random.default_rng(seed)
        data = random_response(rng)
        result = AnalysisResult.from_api_response("v.npzv", data)
        for mode in ["static", "interactive", "questions_only", "default", "lecture"]:
            markdown = result.knowledge_doc.to_markdown(self_check_mode=mode)
            assert isinstance(markdown, str)
            assert markdown.startswith("# ")


class TestGrammarSoundness:
    @pytest.mark.parametrize("seed", range(10))
    def test_every_dfa_walk_parses(self, seed):
        """Any uniform random walk of the full note grammar is valid JSON
        with all contract fields."""
        from video_transformer_tpu.analyzer.schema import note_dfa
        from video_transformer_tpu.train.data import sample_dfa_text

        rng = np.random.default_rng(seed)
        dfa = note_dfa(512, scale=0.15)
        text = sample_dfa_text(dfa, rng, max_tokens=4000)
        parsed = json.loads(text)
        assert {
            "title", "one_sentence_summary", "key_takeaways",
            "deep_dive", "glossary", "visual_schemas",
        } <= parsed.keys()
        # Deep dive items always carry the full section schema.
        for chapter in parsed["deep_dive"]:
            for section in chapter["sections"]:
                assert {"topic", "timestamp", "explanation", "self_check"} <= (
                    section.keys()
                )

    def test_forced_tables_consistency(self):
        """forced_end must equal the state reached by walking forced_tokens."""
        from video_transformer_tpu.analyzer.schema import note_dfa

        dfa = note_dfa(512, scale=0.15)
        forced_len, forced_tok, forced_end = dfa.forced_tables(max_run=24)
        rng = np.random.default_rng(0)
        for state in rng.integers(0, dfa.num_states, 200):
            state = int(state)
            cur = state
            for j in range(int(forced_len[state])):
                cur = int(dfa.next_state[cur, int(forced_tok[state, j])])
                assert cur >= 0
            assert cur == int(forced_end[state])


class TestEngineDeterminism:
    def test_greedy_generation_reproducible(self):
        import jax

        from video_transformer_tpu.ops.constrained import DfaBuilder
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh
        from tests.test_engine import micro_config

        dfa = (
            DfaBuilder().literal('{"x": ').free_string(1, 6).literal("}").finish()
        )
        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            dfa=dfa, max_new_tokens=32, temperature=0.0, seed=7,
        )
        frames = np.zeros((1, 4, 32, 32, 3), np.uint8)
        first = engine.generate(frames, ["p"], prompt_len=8)[0]
        second = engine.generate(frames, ["p"], prompt_len=8)[0]
        assert first == second
        json.loads(first)
