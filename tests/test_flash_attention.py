"""Flash-attention prefill kernel vs the einsum oracle (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpt_oss_vllm_tpu.ops.attention import attention_mask, mha_reference
from gpt_oss_vllm_tpu.ops.flash_attention import flash_attention


def _run_both(rng, B=2, T=64, n_q=4, n_kv=2, D=32, window=None, sinks=True, lens=None,
              block=32):
    q = jnp.asarray(rng.normal(size=(B, T, n_q, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, n_kv, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, n_kv, D)), dtype=jnp.float32)
    s = jnp.asarray(rng.normal(size=(n_q,)), dtype=jnp.float32) if sinks else None
    lens_arr = jnp.asarray(lens if lens is not None else [T] * B, dtype=jnp.int32)
    got = flash_attention(
        q, k, v, lens_arr, sinks=s, window=window, block_q=block, block_k=block,
        interpret=True,
    )
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    mask = attention_mask(pos, pos, window)
    mask = mask & (pos[:, None, :] < lens_arr[:, None, None]) & (
        pos[:, :, None] < lens_arr[:, None, None]
    )
    want = mha_reference(q, k, v, s, mask)
    return np.asarray(got), np.asarray(want), np.asarray(lens_arr)


@pytest.mark.parametrize("window,sinks", [(None, True), (16, True), (None, False), (16, False)])
def test_flash_matches_oracle(rng, window, sinks):
    got, want, lens = _run_both(rng, window=window, sinks=sinks)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_ragged_lengths(rng):
    got, want, lens = _run_both(rng, lens=[37, 64])
    for b, l in enumerate(lens):
        np.testing.assert_allclose(got[b, :l], want[b, :l], rtol=2e-4, atol=2e-4)


def test_flash_non_tile_multiple_seq(rng):
    got, want, _ = _run_both(rng, T=48, block=32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_chunked_prefill_offsets(rng):
    """q_offsets: a T-row chunk at absolute positions off..off+T-1 attending
    against a longer gathered context (the engine's chunked-prefill contract,
    engine/step.py) must match the oracle slice of full-sequence attention."""
    B, S, T, n_q, n_kv, D = 2, 96, 32, 4, 2, 32
    offs = [64, 40]  # row 1's context is shorter than the gathered buffer
    lens = [96, 72]
    q_full = jnp.asarray(rng.normal(size=(B, S, n_q, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, n_kv, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, n_kv, D)), dtype=jnp.float32)
    s = jnp.asarray(rng.normal(size=(n_q,)), dtype=jnp.float32)
    for window in (None, 24):
        # oracle: full-sequence attention, then slice each row's chunk
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
        lens_arr = jnp.asarray(lens, jnp.int32)
        mask = attention_mask(pos, pos, window)
        mask = mask & (pos[:, None, :] < lens_arr[:, None, None]) & (
            pos[:, :, None] < lens_arr[:, None, None]
        )
        want_full = np.asarray(mha_reference(q_full, k, v, s, mask))
        q_chunk = jnp.stack([q_full[b, offs[b] : offs[b] + T] for b in range(B)])
        got = np.asarray(
            flash_attention(
                q_chunk, k, v, lens_arr, sinks=s, window=window,
                q_offsets=jnp.asarray(offs, jnp.int32),
                block_q=16, block_k=32, interpret=True,
            )
        )
        for b in range(B):
            nvalid = min(T, lens[b] - offs[b])
            np.testing.assert_allclose(
                got[b, :nvalid],
                want_full[b, offs[b] : offs[b] + nvalid],
                rtol=2e-4, atol=2e-4,
                err_msg=f"window={window} row={b}",
            )
