"""7b-preset scale validation without allocating anything.

jax.eval_shape traces the full model abstractly: parameter counts, per-device
HBM footprints under tensor parallelism, and cache sizes are validated
against v5e-class budgets (16 GB/chip) — the shape math that decides whether
the flagship preset actually serves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_transformer_tpu.models.config import get_preset
from video_transformer_tpu.models.lm import init_kv_cache
from video_transformer_tpu.models.vlm import VideoLM
from video_transformer_tpu.parallel.sharding import spec_for_path

V5E_HBM_BYTES = 16 * 1024**3


@pytest.fixture(scope="module")
def abstract_params():
    config = get_preset("7b")
    model = VideoLM(config)

    def init():
        return model.init_variables(jax.random.PRNGKey(0))

    return config, jax.eval_shape(init)


def _param_bytes_per_device(params, tp: int, bytes_per_param: int) -> int:
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        spec = spec_for_path(names)
        size = int(np.prod(leaf.shape)) * bytes_per_param
        sharded = any(axis == "model" for axis in spec if axis is not None)
        total += size // tp if sharded else size
    return total


class Test7bScale:
    def test_parameter_count_in_7b_class(self, abstract_params):
        _, params = abstract_params
        count = sum(
            int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
        )
        assert 5e9 < count < 9e9, f"{count / 1e9:.2f}B params"

    def test_bf16_weights_fit_v5e_at_tp8(self, abstract_params):
        _, params = abstract_params
        per_device = _param_bytes_per_device(params, tp=8, bytes_per_param=2)
        # Weights must leave headroom for cache + activations.
        assert per_device < 0.5 * V5E_HBM_BYTES, f"{per_device / 1e9:.1f} GB"

    def test_bf16_weights_do_not_fit_single_chip(self, abstract_params):
        """Documents WHY tp is required: 7b bf16 exceeds half of one chip."""
        _, params = abstract_params
        single = _param_bytes_per_device(params, tp=1, bytes_per_param=2)
        assert single > 0.7 * V5E_HBM_BYTES

    def test_kv_cache_budget_at_serving_shapes(self, abstract_params):
        config, _ = abstract_params

        def cache():
            return init_kv_cache(config.decoder, 8, 8192, jnp.bfloat16)

        shapes = jax.eval_shape(cache)
        total = sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for l in jax.tree_util.tree_leaves(shapes)
        )
        # Sharded over data(8 rows)/model: per-device slice must be modest.
        per_device = total // 8
        assert per_device < 0.15 * V5E_HBM_BYTES, f"{per_device / 1e9:.2f} GB"

    def test_all_contractions_mxu_aligned(self, abstract_params):
        config, params = abstract_params
        assert config.decoder.head_dim == 128
        assert config.decoder.vocab_size % 128 == 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            if leaf.shape and leaf.shape[-1] >= 128 and len(leaf.shape) == 2:
                assert leaf.shape[-1] % 128 == 0 or leaf.shape[0] % 128 == 0, (
                    path, leaf.shape,
                )


class TestInt8SingleChip:
    def test_int8_decoder_fits_single_chip(self, abstract_params):
        """Weight-only int8 (models/quant.py) brings the 7b preset onto ONE
        v5e chip: decoder dense kernels at 1 byte/param, everything else
        bf16, with >= 40% HBM left for cache + activations."""
        from video_transformer_tpu.models.quant import QUANTIZED_DENSE_NAMES

        _, params = abstract_params
        total = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            names = tuple(
                getattr(k, "key", getattr(k, "name", str(k))) for k in path
            )
            quantized = (
                len(names) >= 2
                and names[-1] == "kernel"
                and names[-2] in QUANTIZED_DENSE_NAMES
                and "decoder" in names
            )
            per = 1 if quantized else 2
            total += int(np.prod(leaf.shape)) * per
            if quantized:  # f32 scale per output channel
                total += int(leaf.shape[-1]) * 4
        assert total < 0.6 * V5E_HBM_BYTES, f"{total / 1e9:.1f} GB"

    def test_quantize_abstract_structure(self, abstract_params):
        """quantize_decoder_int8 under eval_shape: int8 kernels + scales
        appear without materializing 7b of weights."""
        from video_transformer_tpu.models.quant import quantize_decoder_int8

        _, params = abstract_params

        quantized = jax.eval_shape(quantize_decoder_int8, params)
        layer = quantized["params"]["decoder"]["layer_0"]
        assert layer["attn"]["q"]["kernel"].dtype == jnp.int8
        scale = quantized["quant"]["decoder"]["layer_0"]["attn"]["q"]["scale"]
        assert scale.shape == (layer["attn"]["q"]["kernel"].shape[1],)

    def test_int4_weights_fit_single_chip_with_headroom(self, abstract_params):
        """int4 decoder residency (packed 2/byte) + bf16 heads/vision leaves
        >2x headroom for KV + activations on ONE chip — the quantization
        ladder's endpoint for single-chip 7b serving."""
        _, params = abstract_params
        from video_transformer_tpu.models.quant import QUANTIZED_DENSE_NAMES

        total = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            names = tuple(
                getattr(k, "key", getattr(k, "name", str(k))) for k in path
            )
            size = int(np.prod(leaf.shape))
            in_decoder_dense = (
                "decoder" in names
                and names[-1] == "kernel"
                and any(n in QUANTIZED_DENSE_NAMES for n in names)
            )
            if in_decoder_dense:
                total += size // 2  # uint8 carrier packs two nibbles/byte
            else:
                total += size * 2  # bf16
        assert total < 0.45 * V5E_HBM_BYTES, f"{total / 1e9:.1f} GB"
