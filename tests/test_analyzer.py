"""End-to-end analyzer tests: synthetic clip -> AnalysisResult, no network.

Mirrors the reference test strategy (tests/test_analyzer.py,
test_long_video_integration.py): real engine on tiny shapes for the short
path, and engine-level behavior for segmentation, merge, and resume.
"""

import json
import logging

import numpy as np
import pytest

from video_transformer_tpu.analyzer import ContentAnalyzer
from video_transformer_tpu.analyzer.json_repair import RepairError, repair_json
from video_transformer_tpu.analyzer.schema import audit_dfa, note_dfa, validator_dfa
from video_transformer_tpu.analyzer.segmentation import (
    accept_consolidation,
    merge_segment_outputs,
    offset_timestamps,
)
from video_transformer_tpu.models.config import (
    DecoderConfig,
    EncoderConfig,
    VLMConfig,
)
from video_transformer_tpu.parallel.engine import InferenceEngine
from video_transformer_tpu.parallel.mesh import build_mesh
from video_transformer_tpu.utils.counter import APICounter
from video_transformer_tpu.video.containers import write_npzv


def micro_config() -> VLMConfig:
    return VLMConfig(
        name="micro",
        encoder=EncoderConfig(
            hidden_dim=64, num_layers=1, num_heads=2, head_dim=32, mlp_dim=128,
            image_size=32, patch_size=16, tubelet_t=2, num_frames=4,
        ),
        decoder=DecoderConfig(
            vocab_size=512, hidden_dim=64, num_layers=2, num_heads=2,
            num_kv_heads=2, head_dim=32, mlp_dim=128, max_seq_len=4096,
        ),
        dtype="float32",
    )


@pytest.fixture(scope="module")
def engine():
    # Compact grammar (scale 0.25): untrained sampling tends to run fields to
    # their max length, so compact budgets keep decode under the token cap.
    return InferenceEngine(
        micro_config(),
        mesh=build_mesh({"data": 4, "model": 2}),
        dfa=note_dfa(512, scale=0.25),
        max_new_tokens=1400,
        temperature=1.0,
        structure_bias=2.5,
        seed=0,
    )


def make_config(tmp_path, **overrides):
    config = {
        "system": {
            "temp_dir": str(tmp_path / "temp"),
            "quality_gates": {"enabled": False, "max_extra_llm_calls": 1},
            "render": {"include_concept_index": True},
        },
        "analyzer": {
            "model": "vtx-local",
            "max_continuations": 0,
            "retry_times": 0,
            "long_video": {
                "enabled": True,
                "default_segment_seconds": 10,
                "overlap_seconds": 2,
                "min_segment_seconds": 4,
                "hard_max_api_calls": 50,
                "consolidate": False,
            },
        },
        "engine": {"model_preset": "tiny"},
    }
    config.update(overrides)
    return config


def write_clip(path, seconds=5, fps=4.0):
    frames = np.random.default_rng(0).integers(
        0, 255, (int(seconds * fps), 32, 32, 3), dtype=np.uint8
    )
    write_npzv(path, frames, fps=fps)
    return path


@pytest.mark.slow
class TestAnalyzeVideoEndToEnd:
    def test_short_video_single_pass(self, tmp_path, engine):
        clip = write_clip(tmp_path / "short.npzv", seconds=5)
        analyzer = ContentAnalyzer(
            make_config(tmp_path), APICounter(max_calls=10),
            logging.getLogger("t"), engine=engine,
        )
        result = analyzer.analyze_video(clip)
        assert result.title
        assert result.metadata["segments"] == 1
        assert result.knowledge_doc.deep_dive
        assert result.knowledge_doc.visual_schemas
        # Render in legacy mode (never raises) to prove the contract holds.
        markdown = result.knowledge_doc.to_markdown(self_check_mode="static")
        assert "## 🔍 深度解析 (Deep Dive)" in markdown

    def test_long_video_continuous_batching(self, tmp_path):
        """Enough segments to exceed the slot pool routes the sweep through
        the ContinuousBatcher (mid-flight refills); the result and the
        manifest must be indistinguishable from the batch path."""
        import jax

        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            dfa=note_dfa(512, scale=0.25),
            max_new_tokens=1400,
            temperature=1.0,
            structure_bias=2.5,
            seed=0,
        )
        clip = write_clip(tmp_path / "served.npzv", seconds=30)
        config = make_config(tmp_path)
        config["analyzer"]["long_video"]["serving_slots_per_chip"] = 2
        config["analyzer"]["long_video"]["continuous_batching"] = True
        # Token-capped slots hand off to the engine's exact continuation.
        config["analyzer"]["max_continuations"] = 4
        records: list[str] = []

        class Capture(logging.Handler):
            def emit(self, r):
                records.append(r.getMessage())

        logger = logging.getLogger("serving-e2e")
        logger.addHandler(Capture())
        logger.setLevel(logging.INFO)
        analyzer = ContentAnalyzer(
            config, APICounter(max_calls=50), logger, engine=engine,
        )
        result = analyzer.analyze_video(clip)
        assert any("event=segment_serving slots=2" in m for m in records)
        assert result.metadata["segments"] == 3
        assert result.metadata["segments_analyzed"] == 3
        manifest = json.loads(
            (tmp_path / "temp" / "segments" / "served" / "manifest.json").read_text()
        )
        assert all(s["status"] == "completed" for s in manifest["segments"])

    def test_long_video_continuous_batching_with_draft(self, tmp_path):
        """The PRODUCT composition of both serving levers: engine.draft
        attached + continuous_batching on. The sweep must route through the
        spec-composed batcher (segment_serving event) and produce the same
        manifest lifecycle as the plain paths."""
        import jax

        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            dfa=note_dfa(512, scale=0.25),
            max_new_tokens=1400,
            temperature=1.0,
            structure_bias=2.5,
            seed=0,
        )
        draft_cfg = micro_config()
        from dataclasses import replace as _replace

        draft_cfg = _replace(
            draft_cfg, name="micro-draft",
            decoder=_replace(draft_cfg.decoder, num_layers=1),
        )
        engine.attach_draft(draft_cfg, spec_tokens=4)
        clip = write_clip(tmp_path / "specserved.npzv", seconds=30)
        config = make_config(tmp_path)
        config["analyzer"]["long_video"]["serving_slots_per_chip"] = 2
        config["analyzer"]["long_video"]["continuous_batching"] = True
        config["analyzer"]["max_continuations"] = 4
        records: list[str] = []

        class Capture(logging.Handler):
            def emit(self, r):
                records.append(r.getMessage())

        logger = logging.getLogger("spec-serving-e2e")
        logger.addHandler(Capture())
        logger.setLevel(logging.INFO)
        analyzer = ContentAnalyzer(
            config, APICounter(max_calls=50), logger, engine=engine,
        )
        result = analyzer.analyze_video(clip)
        assert any("event=segment_serving slots=2" in m for m in records)
        assert result.metadata["segments"] == 3
        assert result.metadata["segments_analyzed"] == 3
        manifest = json.loads(
            (tmp_path / "temp" / "segments" / "specserved"
             / "manifest.json").read_text()
        )
        assert all(s["status"] == "completed" for s in manifest["segments"])

    def test_long_video_segmented(self, tmp_path, engine):
        clip = write_clip(tmp_path / "long.npzv", seconds=30)
        counter = APICounter(max_calls=50)
        analyzer = ContentAnalyzer(
            make_config(tmp_path), counter, logging.getLogger("t"), engine=engine
        )
        result = analyzer.analyze_video(clip)
        assert result.metadata["segments"] == 3  # 30s / 10s segments
        assert result.metadata["segments_analyzed"] == 3
        assert counter.current_count == 3
        # Manifest persisted with completed statuses.
        manifest_path = (
            tmp_path / "temp" / "segments" / "long" / "manifest.json"
        )
        manifest = json.loads(manifest_path.read_text())
        assert all(s["status"] == "completed" for s in manifest["segments"])

    def test_segment_resume_skips_completed(self, tmp_path, engine):
        clip = write_clip(tmp_path / "resume.npzv", seconds=30)
        counter = APICounter(max_calls=50)
        config = make_config(tmp_path)
        analyzer = ContentAnalyzer(
            config, counter, logging.getLogger("t"), engine=engine
        )
        analyzer.analyze_video(clip)
        first_count = counter.current_count

        # Second run resumes from the manifest: no new engine calls.
        analyzer2 = ContentAnalyzer(
            config, counter, logging.getLogger("t"), engine=engine
        )
        result = analyzer2.analyze_video(clip)
        assert counter.current_count == first_count
        assert result.metadata["segments_analyzed"] == 3

    def test_budget_exhaustion_produces_gap_notes(self, tmp_path, engine):
        """Resume against an existing 3-segment manifest with budget for 2:
        the third segment is skipped and recorded as a coverage gap."""
        from video_transformer_tpu.video import create_manifest

        clip = write_clip(tmp_path / "gaps.npzv", seconds=30)
        config = make_config(tmp_path)
        config["analyzer"]["long_video"]["hard_max_api_calls"] = 2
        config["analyzer"]["long_video"]["duration_threshold_seconds"] = 1
        create_manifest(
            video_id="gaps", duration=30, segment_seconds=10,
            overlap_seconds=2, temp_dir=tmp_path / "temp",
        )
        counter = APICounter(max_calls=2)
        analyzer = ContentAnalyzer(
            config, counter, logging.getLogger("t"), engine=engine
        )
        result = analyzer.analyze_video(clip)
        assert result.metadata["segments_analyzed"] == 2
        assert len(result.metadata["segment_gaps"]) == 1
        assert any(
            "未覆盖" in takeaway for takeaway in result.knowledge_doc.key_takeaways
        )


@pytest.mark.slow
class TestBatchAnalysis:
    def test_analyze_videos_shards_short_clips(self, tmp_path, engine):
        clips = [
            write_clip(tmp_path / f"clip{i}.npzv", seconds=4) for i in range(3)
        ]
        counter = APICounter(max_calls=20)
        analyzer = ContentAnalyzer(
            make_config(tmp_path), counter, logging.getLogger("t"), engine=engine
        )
        results = analyzer.analyze_videos(clips)
        assert len(results) == 3
        assert all(r.title for r in results)
        assert counter.current_count == 3
        # One engine.generate call batched all three (plus padding).
        assert all(r.metadata["segments"] == 1 for r in results)

    def test_analyze_videos_mixed_lengths(self, tmp_path, engine):
        short = write_clip(tmp_path / "s.npzv", seconds=4)
        long = write_clip(tmp_path / "l.npzv", seconds=25)
        analyzer = ContentAnalyzer(
            make_config(tmp_path), APICounter(max_calls=50),
            logging.getLogger("t"), engine=engine,
        )
        results = analyzer.analyze_videos([short, long])
        assert results[0].metadata["segments"] == 1
        assert results[1].metadata["segments"] == 3  # 25s / 10s segments


class TestSegmentationLogic:
    def out(self, start, end, title="T", topics=None, takeaways=None, glossary=None):
        sections = [
            {
                "topic": topic,
                "explanation": f"{topic} 的解释",
                "timestamp": {"start": start + i * 10, "end": start + i * 10 + 5},
            }
            for i, topic in enumerate(topics or ["A"])
        ]
        return {
            "start": start,
            "end": end,
            "data": {
                "title": title,
                "one_sentence_summary": "S",
                "key_takeaways": takeaways or ["k"],
                "deep_dive": [
                    {"chapter_title": "C", "chapter_summary": "", "sections": sections}
                ],
                "glossary": glossary or {},
            },
        }

    def test_merge_dedupes_takeaways(self):
        merged = merge_segment_outputs(
            [
                self.out(0, 10, takeaways=["结论一", "结论二"]),
                self.out(10, 20, topics=["B"], takeaways=["结论一!", "结论三"]),
            ],
            [],
        )
        assert merged["key_takeaways"] == ["结论一", "结论二", "结论三"]

    def test_merge_dedupes_glossary_first_wins(self):
        merged = merge_segment_outputs(
            [
                self.out(0, 10, glossary={"梯度": "定义1"}),
                self.out(10, 20, topics=["B"], glossary={"梯 度": "定义2"}),
            ],
            [],
        )
        assert merged["glossary"] == {"梯度": "定义1"}

    def test_merge_drops_time_overlapped_sections(self):
        first = self.out(0, 20, topics=["A", "B"])
        second = self.out(10, 30, topics=["C"])
        # C starts at 10, inside the frontier set by B (ends 15) -> dropped.
        merged = merge_segment_outputs([first, second], [])
        all_topics = [
            s["topic"]
            for ch in merged["deep_dive"]
            for s in ch["sections"]
        ]
        assert all_topics == ["A", "B"]

    def test_merge_appends_gap_notes(self):
        merged = merge_segment_outputs([self.out(0, 10)], ["00:00:10-00:00:20"])
        assert "未覆盖" in merged["key_takeaways"][-1]

    def test_offset_timestamps(self):
        data = self.out(0, 10)["data"]
        shifted = offset_timestamps(data, 100.0)
        ts = shifted["deep_dive"][0]["sections"][0]["timestamp"]
        assert ts == {"start": 100.0, "end": 105.0}

    def test_accept_consolidation_rules(self):
        base = {
            "visual_schemas": [{"type": "overview"}],
            "key_takeaways": ["一 的结论", "二 的结论", "相同 相 同"],
        }
        good = {
            "title": "t", "one_sentence_summary": "s", "key_takeaways": ["k"],
            "glossary": {},
            "deep_dive": [
                {"chapter_title": "一", "sections": []},
                {"chapter_title": "二", "sections": []},
            ],
        }
        accepted = accept_consolidation(good, base)
        assert accepted is not None
        assert accepted["visual_schemas"] == base["visual_schemas"]

        too_few = dict(good, deep_dive=[{"chapter_title": "一", "sections": []}])
        assert accept_consolidation(too_few, base) is None

        dup = dict(
            good,
            deep_dive=[
                {"chapter_title": "相同", "sections": []},
                {"chapter_title": "相 同", "sections": []},
            ],
        )
        assert accept_consolidation(dup, base) is None
        assert accept_consolidation("not a dict", base) is None

        # Grounding: chapters invented out of thin air are rejected even
        # when structurally valid.
        fabricated = dict(
            good,
            deep_dive=[
                {"chapter_title": "量子纠缠", "sections": []},
                {"chapter_title": "罗马帝国", "sections": []},
            ],
        )
        assert accept_consolidation(fabricated, base) is None


class TestJsonRepair:
    def test_direct(self):
        value, strategy = repair_json('{"a": 1}')
        assert value == {"a": 1} and strategy == "direct"

    def test_markdown_fences_stripped(self):
        value, _ = repair_json('```json\n{"a": 1}\n```')
        assert value == {"a": 1}

    def test_chatter_prefix_stripped(self):
        value, _ = repair_json('Sure! Here is the JSON:\n{"a": 1}')
        assert value == {"a": 1}

    def test_latex_escapes(self):
        # \a and \g are illegal JSON escapes -> doubled into literal LaTeX.
        # (\b would stay a legal backspace escape, matching the reference.)
        value, strategy = repair_json('{"f": "\\alpha + \\gamma"}')
        assert value["f"] == "\\alpha + \\gamma"
        assert strategy == "sanitize_escapes"

    def test_backtick_strings(self):
        value, _ = repair_json('{"code": `x = 1`}')
        assert value["code"] == "x = 1"

    def test_unquoted_keys(self):
        value, _ = repair_json('{title: "T", items: [1]}')
        assert value == {"title": "T", "items": [1]}

    def test_trailing_comma(self):
        value, _ = repair_json('{"a": [1, 2,], }')
        assert value == {"a": [1, 2]}

    def test_truncated_object_closed(self):
        value, _ = repair_json('{"a": "done", "b": {"c": [1, 2')
        assert value["a"] == "done"

    def test_truncated_mid_string(self):
        value, _ = repair_json('{"a": "done", "b": "cut off her')
        assert value["a"] == "done"

    def test_unrepairable_raises(self):
        with pytest.raises(RepairError):
            repair_json("no json here at all")


class StubRepairEngine:
    """Text-only stub for the model-assisted repair rung."""

    def __init__(self, reply):
        self.reply = reply
        self.prompts = []

    def generate_text(self, prompts, **kwargs):
        self.prompts.append(prompts[0])
        return [self.reply]


class TestModelAssistedRepair:
    """Reference parity: one LLM repair per video, then a raw payload dump
    (content_analyzer.py:1607-1646)."""

    def _analyzer(self, tmp_path, engine, budget=10):
        config = {
            "system": {
                "temp_dir": str(tmp_path / "temp"),
                "log_dir": str(tmp_path / "logs"),
            },
            "analyzer": {},
        }
        return ContentAnalyzer(config, APICounter(budget), engine=engine)

    def test_model_repair_rescues_ladder_failure(self, tmp_path):
        engine = StubRepairEngine('{"title": "修复后的笔记"}')
        analyzer = self._analyzer(tmp_path, engine)
        parsed = analyzer._parse_json("乱码 not json at all <<<>>>")
        assert parsed == {"title": "修复后的笔记"}
        assert len(engine.prompts) == 1
        assert "乱码 not json at all" in engine.prompts[0]

    def test_one_model_repair_per_video_then_dump(self, tmp_path):
        engine = StubRepairEngine('{"ok": true}')
        analyzer = self._analyzer(tmp_path, engine)
        assert analyzer._parse_json("broken one <<<")["ok"] is True
        # Allowance spent: the second failure dumps + raises, engine untouched.
        with pytest.raises(RepairError, match="dumped"):
            analyzer._parse_json("broken two <<<")
        assert len(engine.prompts) == 1
        dumps = list((tmp_path / "logs").glob("failed_json_*.txt"))
        assert len(dumps) == 1
        assert dumps[0].read_text(encoding="utf-8") == "broken two <<<"

    def test_model_repair_failure_dumps_payload(self, tmp_path):
        engine = StubRepairEngine("still not json <<<")
        analyzer = self._analyzer(tmp_path, engine)
        with pytest.raises(RepairError, match="dumped"):
            analyzer._parse_json("hopeless payload <<<")
        dumps = list((tmp_path / "logs").glob("failed_json_*.txt"))
        assert len(dumps) == 1
        assert dumps[0].read_text(encoding="utf-8") == "hopeless payload <<<"

    def test_model_repair_respects_budget(self, tmp_path):
        engine = StubRepairEngine('{"ok": true}')
        analyzer = self._analyzer(tmp_path, engine, budget=0)
        with pytest.raises(RepairError):
            analyzer._parse_json("broken <<<")
        assert engine.prompts == []  # no budget -> no model call


class TestSchemas:
    def test_note_dfa_size_reasonable(self):
        dfa = note_dfa(512)  # unicode grammar: ~3 extra states per free byte
        assert dfa.num_states < 10000  # table < 21MB (states * 512 * 4B)
        assert note_dfa(512, unicode_text=False).num_states < 4000

    def test_validator_and_audit_dfas_build(self):
        assert validator_dfa(512).num_states > 10
        assert audit_dfa(512).num_states > 10


class TestBehavioralPromptSpec:
    """The analysis prompt must carry the reference's behavioral spec
    (config/prompts.yaml:22-55,204-245 — re-expressed): 18 content
    principles, the textbook writing-style module, 5 layout archetypes,
    and a golden schema example. The DFA enforces STRUCTURE; these
    prompts encode the content-quality bar that matters once real
    weights load."""

    @pytest.fixture(scope="class")
    def analysis(self):
        from video_transformer_tpu.analyzer.prompts import render_prompt

        return render_prompt("analysis", {"duration_label": "12分30秒"})

    def test_all_principle_categories_present(self, analysis):
        markers = {
            "chinese_only": "简体中文",
            "full_coverage": "覆盖无死角",
            "plain_language": "平实的专业语言",
            "knowledge_network": "connections",
            "chaptering": "2-6 章",
            "self_contained_examples": "输入、关键步骤、输出",
            "code_extraction": "演示过的代码必须提取",
            "challenges": "challenge",
            "code_first": "code-first",
            "no_video_deixis": "讲者说",
            "question_quality": "是/否",
            "dedup": "去冗余",
            "tables": "表格",
            "latex": "LaTeX",
            "blacklist": "黑名单",
            "example_is_string": "不能是字典",
            "chapter_self_check": "chapter_self_check",
            "markdown_pdf": "HTML",
        }
        missing = [k for k, nee in markers.items() if nee not in analysis]
        assert not missing, f"principle categories missing: {missing}"

    def test_writing_style_module(self, analysis):
        assert "承上启下" in analysis or "承接上一章" in analysis
        assert "独特贡献" in analysis

    def test_five_layout_archetypes(self, analysis):
        for archetype in ("流水线", "循环迭代", "层级堆叠", "双流并行", "中心辐射"):
            assert archetype in analysis, archetype

    def test_golden_example_and_schema_markers(self, analysis):
        assert "---BEGIN PROMPT---" in analysis
        assert "---END PROMPT---" in analysis
        assert '"deep_dive"' in analysis  # golden example shows the fields
        assert '"visual_schemas"' in analysis

    def test_segment_prompt_carries_context_rules(self):
        from video_transformer_tpu.analyzer.prompts import render_prompt

        segment = render_prompt(
            "segment_analysis",
            {"segment_index": 2, "segment_total": 5,
             "start_label": "05:00", "end_label": "10:00"},
        )
        assert "本段之外" in segment  # no speculation past the boundary
        assert "承接上文" in segment  # truncated-opening handling
        assert "合并" in segment  # downstream consolidation exists

    def test_consolidate_prompt_carries_dedup_rules(self):
        from video_transformer_tpu.analyzer.prompts import render_prompt

        consolidate = render_prompt(
            "consolidate", {"segment_count": 3, "merged_json": "{}"}
        )
        assert "恰好出现一次" in consolidate
        assert "chapter_self_check" in consolidate


class TestEngineConfigPlumbing:
    def test_max_forced_run_reaches_engine(self, tmp_path):
        """engine.max_forced_run config narrows the fast-forward block
        (decode-step FLOPs scale with block width — tools/decode_bench.py)."""
        config = make_config(tmp_path)
        config["engine"]["max_forced_run"] = 3
        analyzer = ContentAnalyzer(config, api_counter=APICounter(10))
        engine = analyzer.engine
        assert engine.max_forced_run == 3
        assert engine._block_width(engine.dfa) == 4

    def test_auto_routes_multi_wave_only(self):
        route = ContentAnalyzer._route_to_batcher
        # Single wave fits the sharded batch: run-to-completion engine.
        assert not route(n_segments=10, chunk_size=16, slots=8, mode="auto")
        # Multi-wave sweep: refilling across the wave boundary wins.
        assert route(n_segments=40, chunk_size=16, slots=8, mode="auto")
        # Explicit pins override auto, but a sweep inside one slot pool
        # still has nothing to refill.
        assert not route(n_segments=40, chunk_size=16, slots=8, mode=False)
        assert route(n_segments=12, chunk_size=16, slots=8, mode=True)
        assert not route(n_segments=6, chunk_size=16, slots=8, mode=True)
