"""Paged decode-attention kernel numerics (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_transformer_tpu.ops.decode_attention import (
    _decode_attention_pallas,
    decode_attention_reference,
)


def setup(b=2, hq=4, hkv=2, w=8, d=32, s=1024, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(keys[0], (b, hq, w, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, hkv, s, d), jnp.float32)
    return q, k, v


class TestPagedDecodeAttention:
    def test_matches_reference_varied_lengths(self):
        q, k, v = setup()
        lengths = jnp.array([100, 900], jnp.int32)
        expected = decode_attention_reference(q, k, v, lengths)
        got = _decode_attention_pallas(q, k, v, lengths, interpret=True)
        np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    def test_short_lengths_skip_blocks(self):
        """Output must be independent of cache content beyond each length."""
        q, k, v = setup(b=1, hq=2, hkv=1)
        lengths = jnp.array([40], jnp.int32)
        out1 = _decode_attention_pallas(q, k, v, lengths, interpret=True)
        # Poison everything beyond length + width.
        k2 = k.at[:, :, 64:, :].set(1e4)
        v2 = v.at[:, :, 64:, :].set(-1e4)
        out2 = _decode_attention_pallas(q, k2, v2, lengths, interpret=True)
        np.testing.assert_allclose(out1, out2, atol=1e-6)

    def test_in_block_causality(self):
        """Query row j sees exactly lengths + j positions."""
        q, k, v = setup(b=1, hq=1, hkv=1, w=4, s=512)
        lengths = jnp.array([10], jnp.int32)
        expected = decode_attention_reference(q, k, v, lengths)
        got = _decode_attention_pallas(q, k, v, lengths, interpret=True)
        np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    def test_bfloat16_cache(self):
        q, k, v = setup(b=1, hq=2, hkv=2, w=8, s=512)
        k = k.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
        lengths = jnp.array([300], jnp.int32)
        expected = decode_attention_reference(q, k, v, lengths)
        got = _decode_attention_pallas(q, k, v, lengths, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(expected, np.float32),
            atol=3e-2, rtol=3e-2,
        )

    def test_full_length(self):
        q, k, v = setup(b=1, hq=2, hkv=1, w=8, s=512)
        lengths = jnp.array([505], jnp.int32)  # 505 + 7 = 512 = S
        expected = decode_attention_reference(q, k, v, lengths)
        got = _decode_attention_pallas(q, k, v, lengths, interpret=True)
        np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


class TestFusedUpdateAttention:
    """decode_attention_update: in-kernel cache row write + attention."""

    def _run(self, b=2, hq=4, hkv=2, w=8, d=32, s=1024, idx=(99, 800)):
        from video_transformer_tpu.ops.decode_attention import (
            _decode_attention_update_pallas,
            update_cache_rows,
        )

        keys = jax.random.split(jax.random.PRNGKey(3), 5)
        q = jax.random.normal(keys[0], (b, hq, w, d), jnp.float32)
        k_cache = jax.random.normal(keys[1], (b, hkv, s, d), jnp.float32)
        v_cache = jax.random.normal(keys[2], (b, hkv, s, d), jnp.float32)
        k_new = jax.random.normal(keys[3], (b, hkv, w, d), jnp.float32)
        v_new = jax.random.normal(keys[4], (b, hkv, w, d), jnp.float32)
        index = jnp.asarray(idx, jnp.int32)

        k_ref = update_cache_rows(k_cache, k_new, index)
        v_ref = update_cache_rows(v_cache, v_new, index)
        expected = decode_attention_reference(q, k_ref, v_ref, index + 1)

        out, k_out, v_out = _decode_attention_update_pallas(
            q, k_cache, v_cache, k_new, v_new, index, interpret=True
        )
        return expected, out, k_ref, v_ref, k_out, v_out, index

    def test_matches_write_then_attend(self):
        expected, out, *_ = self._run()
        np.testing.assert_allclose(out, expected, atol=2e-5, rtol=2e-5)

    def test_cache_rows_written(self):
        """Valid region of the returned cache equals the scatter path's."""
        _, _, k_ref, v_ref, k_out, v_out, index = self._run()
        w = 8
        for row, base in enumerate(np.asarray(index)):
            hi = base + w
            np.testing.assert_allclose(
                np.asarray(k_out)[row, :, :hi], np.asarray(k_ref)[row, :, :hi]
            )
            np.testing.assert_allclose(
                np.asarray(v_out)[row, :, :hi], np.asarray(v_ref)[row, :, :hi]
            )

    def test_unaligned_width_13(self):
        """Grammar fast-forward block width (13) pads to 16 on write; the
        attended output must still match the scatter oracle."""
        expected, out, *_ = self._run(w=13, idx=(5, 1000))
        np.testing.assert_allclose(out, expected, atol=2e-5, rtol=2e-5)

    def test_width1_near_tail(self):
        """Width-1 write with index near the cache end stays in bounds
        (callers reserve >= 8 rows of slack)."""
        expected, out, *_ = self._run(w=1, idx=(1016 - 8, 3), s=1024)
        np.testing.assert_allclose(out, expected, atol=2e-5, rtol=2e-5)


class TestRowTable:
    """Paged row indirection: logical decode lanes address physical cache
    rows through an int32 table (serving.py's refill is a table update)."""

    def test_reference_rows_gather(self):
        q, k, v = setup(b=2, s=512)
        big_k = jnp.concatenate([jnp.zeros_like(k), k], axis=0)  # rows 2,3
        big_v = jnp.concatenate([jnp.zeros_like(v), v], axis=0)
        lengths = jnp.asarray([100, 400], jnp.int32)
        rows = jnp.asarray([2, 3], jnp.int32)
        got = decode_attention_reference(q, big_k, big_v, lengths, rows)
        want = decode_attention_reference(q, k, v, lengths)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_pallas_rows_matches_reference(self):
        q, k, v = setup(b=2, s=512)
        perm = jnp.asarray([3, 1], jnp.int32)
        big_k = jnp.concatenate([k, k[::-1]], axis=0)  # rows: k0 k1 k1 k0
        big_v = jnp.concatenate([v, v[::-1]], axis=0)
        lengths = jnp.asarray([256, 257], jnp.int32)
        got = _decode_attention_pallas(
            q, big_k, big_v, lengths, perm, interpret=True
        )
        want = decode_attention_reference(q, big_k, big_v, lengths, perm)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    def test_update_cache_rows_physical(self):
        from video_transformer_tpu.ops.decode_attention import (
            update_cache_rows,
        )

        k = jnp.zeros((4, 2, 64, 8), jnp.float32)
        new = jnp.ones((2, 2, 8, 8), jnp.float32)
        index = jnp.asarray([0, 16], jnp.int32)
        rows = jnp.asarray([3, 1], jnp.int32)
        out = np.asarray(update_cache_rows(k, new, index, rows))
        assert out[3, :, 0:8].sum() == 2 * 8 * 8
        assert out[1, :, 16:24].sum() == 2 * 8 * 8
        assert out[0].sum() == 0 and out[2].sum() == 0

    def test_adopt_rows_fallback_masks_pad_lanes(self):
        """Padded stage lanes (i >= count) must be no-ops even when their
        pad target index collides with a valid lane's row."""
        from video_transformer_tpu.ops.decode_attention import adopt_rows

        dst = jnp.zeros((5, 2, 32, 8), jnp.float32)
        src = jnp.stack(
            [jnp.full((2, 16, 8), i + 1.0) for i in range(3)]
        )  # 3 lanes, park_len 16
        rows = jnp.asarray([4, 2, 4], jnp.int32)  # lane 2 is a pad (count=2)
        out = np.asarray(adopt_rows(dst, src, rows, jnp.int32(2), 16))
        assert (out[4, :, :16] == 1.0).all()  # lane 0 landed
        assert (out[2, :, :16] == 2.0).all()  # lane 1 landed
        assert (out[4, :, 16:] == 0).all()  # past park region untouched
        assert out[0].sum() == 0 and out[1].sum() == 0 and out[3].sum() == 0

    def test_adopt_rows_pallas_interpret(self):
        from video_transformer_tpu.ops.decode_attention import (
            _adopt_rows_pallas,
        )

        dst = jnp.zeros((4, 2, 32, 8), jnp.float32)
        src = jnp.stack(
            [jnp.full((2, 32, 8), i + 1.0) for i in range(2)]
        )
        rows = jnp.asarray([1, 3], jnp.int32)
        out = np.asarray(
            _adopt_rows_pallas(dst, src, rows, jnp.int32(2), 32, interpret=True)
        )
        assert (out[1] == 1.0).all() and (out[3] == 2.0).all()
        assert out[0].sum() == 0 and out[2].sum() == 0


class TestBatchRowWrite:
    """_batch_row_write_pallas: the split-write ablation path must produce
    byte-identical caches to the scatter oracle and, chained with the
    read-only kernel, the same attention output as the fused kernel."""

    def _run(self, b=2, hq=4, hkv=2, w=8, d=32, s=1024, idx=(99, 800),
             rows=None):
        from video_transformer_tpu.ops.decode_attention import (
            _batch_row_write_pallas,
            update_cache_rows,
        )

        keys = jax.random.split(jax.random.PRNGKey(7), 5)
        q = jax.random.normal(keys[0], (b, hq, w, d), jnp.float32)
        r = b if rows is None else int(np.max(rows)) + 1
        k_cache = jax.random.normal(keys[1], (r, hkv, s, d), jnp.float32)
        v_cache = jax.random.normal(keys[2], (r, hkv, s, d), jnp.float32)
        k_new = jax.random.normal(keys[3], (b, hkv, w, d), jnp.float32)
        v_new = jax.random.normal(keys[4], (b, hkv, w, d), jnp.float32)
        index = jnp.asarray(idx, jnp.int32)
        rows_arr = None if rows is None else jnp.asarray(rows, jnp.int32)

        k_ref = update_cache_rows(k_cache, k_new, index, rows_arr)
        v_ref = update_cache_rows(v_cache, v_new, index, rows_arr)
        k_out, v_out = _batch_row_write_pallas(
            k_cache, v_cache, k_new, v_new, index, rows_arr, interpret=True
        )
        return q, index, rows_arr, k_ref, v_ref, k_out, v_out

    def test_written_regions_match_scatter(self):
        _, index, _, k_ref, v_ref, k_out, v_out = self._run()
        w = 8
        for row, base in enumerate(np.asarray(index)):
            hi = base + w
            np.testing.assert_allclose(
                np.asarray(k_out)[row, :, :hi], np.asarray(k_ref)[row, :, :hi]
            )
            np.testing.assert_allclose(
                np.asarray(v_out)[row, :, :hi], np.asarray(v_ref)[row, :, :hi]
            )

    def test_chained_attention_matches_fused(self):
        from video_transformer_tpu.ops.decode_attention import (
            _decode_attention_pallas,
        )

        q, index, rows_arr, k_ref, v_ref, k_out, v_out = self._run(
            w=13, idx=(5, 1000)
        )
        expected = decode_attention_reference(q, k_ref, v_ref, index + 1)
        got = _decode_attention_pallas(
            q, k_out, v_out, index + 1, interpret=True
        )
        np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    def test_paged_rows_and_odd_items(self):
        """3 logical rows over 5 physical rows: chunked item loop handles a
        non-multiple-of-chunk item count and the row table indirection."""
        _, index, rows_arr, k_ref, v_ref, k_out, v_out = self._run(
            b=3, idx=(17, 512, 900), rows=(4, 0, 2)
        )
        w = 8
        for logical, phys in enumerate(np.asarray(rows_arr)):
            hi = int(np.asarray(index)[logical]) + w
            np.testing.assert_allclose(
                np.asarray(k_out)[phys, :, :hi],
                np.asarray(k_ref)[phys, :, :hi],
            )

    def test_bfloat16_cache(self):
        from video_transformer_tpu.ops.decode_attention import (
            _batch_row_write_pallas,
            update_cache_rows,
        )

        keys = jax.random.split(jax.random.PRNGKey(9), 4)
        b, hkv, w, d, s = 2, 2, 8, 32, 1024
        k_cache = jax.random.normal(keys[0], (b, hkv, s, d), jnp.bfloat16)
        v_cache = jax.random.normal(keys[1], (b, hkv, s, d), jnp.bfloat16)
        k_new = jax.random.normal(keys[2], (b, hkv, w, d), jnp.float32)
        v_new = jax.random.normal(keys[3], (b, hkv, w, d), jnp.float32)
        index = jnp.asarray((99, 800), jnp.int32)
        k_ref = update_cache_rows(k_cache, k_new.astype(jnp.bfloat16), index)
        k_out, _ = _batch_row_write_pallas(
            k_cache, v_cache, k_new, v_new, index, interpret=True
        )
        for row, base in enumerate(np.asarray(index)):
            hi = base + w
            np.testing.assert_allclose(
                np.asarray(k_out, np.float32)[row, :, :hi],
                np.asarray(k_ref, np.float32)[row, :, :hi],
            )


class TestPipelinedKernel:
    """Cross-program block-0 prefetch (_kernel_pipelined) must be
    numerically identical to the plain kernel — the handoff only moves
    WHEN the first DMA starts, never what lands."""

    def test_matches_plain_varied_lengths(self):
        q, k, v = setup(b=3, s=1024)
        lengths = jnp.array([100, 900, 513], jnp.int32)
        plain = _decode_attention_pallas(q, k, v, lengths, interpret=True)
        piped = _decode_attention_pallas(
            q, k, v, lengths, interpret=True, pipelined=True
        )
        np.testing.assert_allclose(piped, plain, atol=0, rtol=0)

    def test_matches_reference_with_rows(self):
        q, _, _ = setup(b=3, s=1024)
        keys = jax.random.split(jax.random.PRNGKey(5), 2)
        big_k = jax.random.normal(keys[0], (5, 2, 1024, 32), jnp.float32)
        big_v = jax.random.normal(keys[1], (5, 2, 1024, 32), jnp.float32)
        lengths = jnp.array([64, 1000, 300], jnp.int32)
        perm = jnp.array([4, 0, 2], jnp.int32)
        expected = decode_attention_reference(q, big_k, big_v, lengths, perm)
        got = _decode_attention_pallas(
            q, big_k, big_v, lengths, perm, interpret=True, pipelined=True
        )
        np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    def test_single_program_grid(self):
        """b=1, hkv=1: no successor to prefetch for — the cold-start branch
        alone must carry the whole kernel."""
        q, k, v = setup(b=1, hq=2, hkv=1, s=1024)
        q, k, v = q[:1], k[:1, :1], v[:1, :1]
        lengths = jnp.array([777], jnp.int32)
        expected = decode_attention_reference(q, k, v, lengths)
        got = _decode_attention_pallas(
            q, k, v, lengths, interpret=True, pipelined=True
        )
        np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    def test_bfloat16_cache_pipelined(self):
        q, k, v = setup(b=2, s=1024)
        k = k.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
        lengths = jnp.array([300, 1020], jnp.int32)
        plain = _decode_attention_pallas(q, k, v, lengths, interpret=True)
        piped = _decode_attention_pallas(
            q, k, v, lengths, interpret=True, pipelined=True
        )
        np.testing.assert_allclose(piped, plain, atol=0, rtol=0)
