"""Shipped-checkpoint drift gate (round-4 advisor finding).

ContentAnalyzer falls back to random init with only a WARNING when
``engine.checkpoint_dir`` fails to restore (content_analyzer.py:176-188 —
deliberate: a missing checkpoint must not kill the pipeline). The flip
side: geometry/dtype drift between the shipped config and the shipped
checkpoint would silently ship a random-weight product. This test pins the
two together using orbax METADATA only — structure and shapes, no tensor
data — so it stays a cheap CPU smoke test.
"""

from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parents[1]
CONFIG = REPO / "config" / "config.yaml"


def _shipped_engine_cfg() -> dict:
    return yaml.safe_load(CONFIG.read_text())["engine"]


def _resolve_params_dir(path: Path) -> Path:
    if path.name.startswith("params_"):
        return path
    cands = sorted(
        (p for p in path.iterdir() if p.name.startswith("params_")),
        key=lambda p: int(p.name.split("_")[-1]),
    )
    assert cands, f"no params_N under {path}"
    return cands[-1]


@pytest.fixture(scope="module")
def shipped():
    cfg = _shipped_engine_cfg()
    ckpt = Path(cfg.get("checkpoint_dir") or "")
    if not ckpt.is_absolute():
        ckpt = (REPO / ckpt).resolve()
    if not ckpt.exists():
        pytest.skip(f"shipped checkpoint missing: {ckpt}")
    return cfg, _resolve_params_dir(ckpt)


def test_shipped_checkpoint_matches_default_engine_structure(shipped):
    """Every leaf of the default-config engine's parameter structure must
    exist in the shipped checkpoint with the same shape (and vice versa).

    Uses jax.eval_shape for the engine side (no weights materialized) and
    orbax metadata for the checkpoint side (no tensor data read).
    """
    import jax
    import orbax.checkpoint as ocp

    from video_transformer_tpu.models.bpe import BpeTokenizer
    from video_transformer_tpu.models.config import get_preset
    from video_transformer_tpu.models.vlm import VideoLM

    cfg, params_dir = shipped

    from dataclasses import replace

    preset = get_preset(cfg.get("model_preset", "tiny"))
    tok_cfg = cfg.get("tokenizer") or {}
    if tok_cfg.get("type") == "bpe":
        tok_path = Path(tok_cfg["path"])
        if not tok_path.is_absolute():
            tok_path = REPO / tok_path
        tok = BpeTokenizer.load(tok_path)
        preset = replace(
            preset, decoder=replace(preset.decoder, vocab_size=tok.vocab_size)
        )

    model = VideoLM(preset)
    struct = jax.eval_shape(
        lambda: model.init_variables(jax.random.PRNGKey(0))
    )
    want = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(struct)[0]
    }

    with ocp.StandardCheckpointer() as checkpointer:
        meta = checkpointer.metadata(str(params_dir))
    got = {
        "/".join(str(getattr(k, "key", k)) for k in path): tuple(leaf.shape)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            meta.item_metadata if hasattr(meta, "item_metadata") else meta
        )[0]
    }

    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"checkpoint/config structure drift: missing={missing[:5]} "
        f"extra={extra[:5]}"
    )
    wrong = {
        k: (want[k], got[k])
        for k in want
        if tuple(want[k]) != tuple(got[k])
    }
    assert not wrong, f"shape drift: {dict(list(wrong.items())[:5])}"
