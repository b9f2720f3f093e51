"""HF checkpoint-directory load chain, end-to-end on the real file formats.

The deployment story for real Qwen2-VL weights (README: "loads actual
checkpoints") has every link proven with zero egress: a random-weight HF
``Qwen2VLForConditionalGeneration`` is saved to disk exactly the way the hub
ships checkpoints — bf16 tensors in SHARDED ``*.safetensors`` files plus
``model.safetensors.index.json`` — then loaded back through
``models.port.load_qwen2vl_dir`` and ``InferenceEngine.restore`` and driven
through a decode. Reference parity target: the generation quality of
/root/reference/src/analyzer/content_analyzer.py:1485 hinges on serving
faithful real weights; this pins the mechanical chain that delivers them.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("safetensors")

from video_transformer_tpu.models.config import (
    DecoderConfig,
    VLMConfig,
)
from video_transformer_tpu.models.port import (
    checkpoint_shard_paths,
    load_qwen2vl_dir,
)
from video_transformer_tpu.models.qwen_vit import QwenVisionConfig

# Mirrors the hub checkpoint geometry at toy scale: qkv biases, untied
# lm_head, GQA, and a ported vision tower whose merger lands in the decoder
# width (hidden 256).
VIS = QwenVisionConfig(
    embed_dim=32,
    depth=1,
    num_heads=2,
    mlp_ratio=1.0,
    patch_size=14,
    temporal_patch_size=2,
    spatial_merge_size=2,
    hidden_size=256,
    image_size=56,
    num_frames=4,
)
DEC = DecoderConfig(
    vocab_size=512,
    hidden_dim=256,
    num_layers=2,
    num_heads=2,
    num_kv_heads=1,
    head_dim=128,
    mlp_dim=288,
    max_seq_len=512,
    rope_theta=10000.0,
    qkv_bias=True,
    tied_embeddings=False,
)
CONFIG = VLMConfig(name="qwen-hf-tiny", encoder=VIS, decoder=DEC, dtype="float32")


def _hf_model(seed: int = 0):
    from transformers.models.qwen2_vl.configuration_qwen2_vl import Qwen2VLConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VLForConditionalGeneration,
    )

    config = Qwen2VLConfig(
        vocab_size=DEC.vocab_size,
        hidden_size=DEC.hidden_dim,
        intermediate_size=DEC.mlp_dim,
        num_hidden_layers=DEC.num_layers,
        num_attention_heads=DEC.num_heads,
        num_key_value_heads=DEC.num_kv_heads,
        rope_theta=DEC.rope_theta,
        tie_word_embeddings=False,
        rms_norm_eps=1e-6,
        rope_scaling={"type": "mrope", "mrope_section": [16, 24, 24]},
        vision_config={
            "depth": VIS.depth,
            "embed_dim": VIS.embed_dim,
            "hidden_size": VIS.hidden_size,
            "num_heads": VIS.num_heads,
            "mlp_ratio": VIS.mlp_ratio,
        },
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    return Qwen2VLForConditionalGeneration._from_config(config).eval()


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    """A hub-layout checkpoint directory: bf16 tensors split across two
    safetensors shards with an index.json weight_map."""
    from safetensors.torch import save_file

    from video_transformer_tpu.models.port import normalize_qwen2vl_keys

    directory = tmp_path_factory.mktemp("qwen2vl_ckpt")
    # Hub shards carry hub-layout names (model.embed_tokens... / visual...);
    # newer transformers' in-memory state dicts nest differently — normalize
    # so the files on disk match what the hub actually ships.
    state = normalize_qwen2vl_keys(
        {
            k: v.detach().to(torch.bfloat16).contiguous()
            for k, v in _hf_model().state_dict().items()
        }
    )
    keys = sorted(state)
    shards = {
        "model-00001-of-00002.safetensors": keys[: len(keys) // 2],
        "model-00002-of-00002.safetensors": keys[len(keys) // 2 :],
    }
    weight_map = {}
    for filename, shard_keys in shards.items():
        save_file({k: state[k] for k in shard_keys}, str(directory / filename))
        weight_map.update({k: filename for k in shard_keys})
    (directory / "model.safetensors.index.json").write_text(
        json.dumps({"metadata": {}, "weight_map": weight_map})
    )
    return directory, state


class TestShardDiscovery:
    def test_index_json_drives_shard_list(self, hf_dir):
        directory, _ = hf_dir
        paths = checkpoint_shard_paths(str(directory))
        assert len(paths) == 2
        assert all(p.endswith(".safetensors") for p in paths)

    def test_glob_fallback_without_index(self, tmp_path):
        from safetensors.torch import save_file

        save_file({"a": torch.zeros(2)}, str(tmp_path / "only.safetensors"))
        assert checkpoint_shard_paths(str(tmp_path)) == [
            str(tmp_path / "only.safetensors")
        ]


class TestLoadQwen2VLDir:
    def test_tree_matches_vlm_init_structure(self, hf_dir):
        import jax
        import jax.tree_util as jtu

        from video_transformer_tpu.models.vlm import VideoLM

        directory, _ = hf_dir
        tree = load_qwen2vl_dir(str(directory), CONFIG)
        init = VideoLM(CONFIG).init_variables(jax.random.PRNGKey(0))["params"]
        assert jtu.tree_map(lambda a: a.shape, init) == jtu.tree_map(
            lambda a: tuple(a.shape), tree
        )

    def test_values_survive_the_disk_round_trip(self, hf_dir):
        directory, state = hf_dir
        tree = load_qwen2vl_dir(str(directory), CONFIG)
        embed = np.asarray(tree["decoder"]["embed"]["embedding"], np.float32)
        expected = state["model.embed_tokens.weight"].float().numpy()
        np.testing.assert_array_equal(embed, expected)
        # A transposed projection too (torch [out, in] -> flax [in, out]).
        q_kernel = np.asarray(
            tree["decoder"]["layer_0"]["attn"]["q"]["kernel"], np.float32
        )
        np.testing.assert_array_equal(
            q_kernel,
            state["model.layers.0.self_attn.q_proj.weight"].float().numpy().T,
        )

    def test_native_encoder_preset_is_rejected(self, hf_dir):
        from video_transformer_tpu.models.config import get_preset

        directory, _ = hf_dir
        with pytest.raises(ValueError, match="ported-tower"):
            load_qwen2vl_dir(str(directory), get_preset("tiny"))


class TestEngineRestoreHF:
    def test_restore_and_decode(self, hf_dir):
        """engine.restore(hub_dir) serves the ported weights: config line
        ``engine.checkpoint_dir: /path/to/Qwen2-VL-7B-Instruct`` is the whole
        deployment story."""
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        directory, state = hf_dir
        engine = InferenceEngine(
            CONFIG,
            mesh=build_mesh({"data": -1, "model": 1}),
            max_new_tokens=16,
            temperature=1.0,
            seed=0,
        )
        engine.restore(str(directory))

        served = np.asarray(
            engine.params["params"]["decoder"]["embed"]["embedding"], np.float32
        )
        np.testing.assert_array_equal(
            served, state["model.embed_tokens.weight"].float().numpy()
        )
        texts = engine.generate_text(["hello"])
        assert isinstance(texts, list) and len(texts) == 1

    def test_geometry_drift_raises(self, hf_dir):
        """A checkpoint whose shapes disagree with the preset fails loudly
        (here: wrong vocab width) instead of serving garbage."""
        import dataclasses

        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        directory, _ = hf_dir
        drifted = dataclasses.replace(
            CONFIG,
            decoder=dataclasses.replace(DEC, vocab_size=640),
        )
        engine = InferenceEngine(
            drifted,
            mesh=build_mesh({"data": -1, "model": 1}),
            max_new_tokens=8,
            seed=0,
        )
        with pytest.raises(ValueError, match="shape"):
            engine.restore(str(directory))
