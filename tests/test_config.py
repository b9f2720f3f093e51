"""Config system tests: required sections, defaults, env overlay."""

from pathlib import Path

import pytest

from video_transformer_tpu.utils.config import (
    DEFAULT_CONFIG_PATH,
    load_config,
)

MINIMAL = """
system: {}
proxy: {}
downloader: {}
validator: {}
image_generator: {}
"""


def test_default_config_loads():
    config = load_config(DEFAULT_CONFIG_PATH)
    assert config["system"]["note_profile"] == "pdf"
    # The out-of-box checkpoint is the round-5 reversal-augmented rescue
    # base-r5 (16/16 single + 8/8 composite + 94/96 OOD on the 48-topic
    # harness); tiny remains the speculative draft.
    assert config["engine"]["model_preset"] == "base"
    assert "base-zh-grounded-r5" in config["engine"]["checkpoint_dir"]
    assert config["engine"]["mesh"]["model"] == 1
    assert config["analyzer"]["long_video"]["default_segment_seconds"] == 480
    # Serving defaults decided by the round-4 on-chip ablations
    # (docs/roofline.md): narrow grammar fast-forward blocks, speculative
    # draft off at batch serving, auto continuous batching.
    assert config["engine"]["max_forced_run"] == 2
    assert config["engine"]["draft"]["model_preset"] is None
    assert config["engine"]["draft"]["spec_tokens"] == 6
    assert config["analyzer"]["long_video"]["continuous_batching"] == "auto"


def test_production_note_style_defaults():
    """Production config asserts, mirroring reference
    tests/test_config_note_style.py: the note-rendering flag surface."""
    config = load_config(DEFAULT_CONFIG_PATH)
    system = config["system"]
    assert system["self_check_mode"] == "lecture"
    assert system["note_style"] == "core_appendix"
    assert system["question_scope"] == "chapter_only"
    assert system["answer_placement"] == "inline_after_questions"
    assert system["code_placement"] == "appendix_only"
    assert system["note_refine"]["enabled"] is True
    assert system["note_refine"]["lines_per_hour"] == 400
    assert system["quality_gates"]["enabled"] is True
    assert system["render"]["include_concept_index"] is False  # pdf profile
    assert config["engine"]["checkpoint_dir"] == (
        "./data/checkpoints/base-zh-grounded-r5-bf16"
    )
    assert config["engine"]["tokenizer"]["type"] == "bpe"


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_config(tmp_path / "nope.yaml")


def test_missing_sections_raise(tmp_path):
    path = tmp_path / "c.yaml"
    path.write_text("system: {}\n")
    with pytest.raises(ValueError, match="missing sections"):
        load_config(path)


def test_minimal_config_gets_defaults(tmp_path):
    path = tmp_path / "c.yaml"
    path.write_text(MINIMAL)
    config = load_config(path)
    system = config["system"]
    assert system["note_profile"] == "default"
    assert system["quality_gates"]["enabled"] is False
    assert system["render"]["include_concept_index"] is True
    assert config["engine"]["frames_per_segment"] == 8


def test_pdf_profile_defaults(tmp_path):
    path = tmp_path / "c.yaml"
    path.write_text(MINIMAL.replace("system: {}", "system: {note_profile: pdf}"))
    config = load_config(path)
    assert config["system"]["pdf_math"]["enable_display_math"] is True
    assert config["system"]["render"]["include_concept_index"] is False


def test_env_key_overlay(tmp_path, monkeypatch):
    monkeypatch.setenv("VT_GEMINI_API_KEY", "secret-key")
    path = tmp_path / "c.yaml"
    path.write_text(MINIMAL)
    config = load_config(path)
    assert config["api_keys"]["gemini"] == "secret-key"
