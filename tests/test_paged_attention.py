"""Paged-attention decode kernel vs the XLA gather oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.ops.attention import mha_reference
from gpt_oss_vllm_tpu.ops.paged_attention import paged_attention_decode


def _oracle(q, k_cache, v_cache, block_tables, q_pos, sinks, window):
    """Gather pages logically, run the einsum reference."""
    B, n_q, D = q.shape
    NB, BS, KVD = k_cache.shape
    KV = KVD // D
    MB = block_tables.shape[1]
    tables = np.maximum(block_tables, 0)
    k = k_cache[tables].reshape(B, MB * BS, KV, D)
    v = v_cache[tables].reshape(B, MB * BS, KV, D)
    S = MB * BS
    k_pos = np.arange(S)[None, :]
    mask = (k_pos <= q_pos[:, None]) & (q_pos[:, None] >= 0)
    if window:
        mask &= q_pos[:, None] - k_pos < window
    out = mha_reference(
        jnp.asarray(q)[:, None],
        jnp.asarray(k),
        jnp.asarray(v),
        jnp.asarray(sinks) if sinks is not None else None,
        jnp.asarray(mask)[:, None, :],
    )
    return np.asarray(out[:, 0])


def _setup(rng, B=3, n_q=4, kv=2, D=32, BS=8, NB=16, MB=4, ctx=(5, 17, 29)):
    q = rng.normal(size=(B, n_q, D)).astype(np.float32)
    k_cache = rng.normal(size=(NB, BS, kv * D)).astype(np.float32)
    v_cache = rng.normal(size=(NB, BS, kv * D)).astype(np.float32)
    perm = rng.permutation(NB)[: B * MB].reshape(B, MB)
    bt = perm.astype(np.int32)
    q_pos = np.array([c - 1 for c in ctx], dtype=np.int32)
    return q, k_cache, v_cache, bt, q_pos


@pytest.mark.parametrize("window", [None, 8])
@pytest.mark.parametrize("use_sinks", [True, False])
def test_decode_kernel_matches_oracle(rng, window, use_sinks):
    q, kc, vc, bt, q_pos = _setup(rng)
    sinks = rng.normal(size=(4,)).astype(np.float32) if use_sinks else None
    got = np.asarray(
        paged_attention_decode(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(bt), jnp.asarray(q_pos),
            sinks=jnp.asarray(sinks) if sinks is not None else None,
            window=window, interpret=True,
        )
    )
    want = _oracle(q, kc, vc, bt, q_pos, sinks, window)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_decode_kernel_inactive_rows_zero(rng):
    q, kc, vc, bt, q_pos = _setup(rng)
    q_pos[1] = -1  # inactive slot
    got = np.asarray(
        paged_attention_decode(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(bt), jnp.asarray(q_pos), sinks=None, window=None, interpret=True,
        )
    )
    assert np.all(got[1] == 0)
    want = _oracle(q, kc, vc, bt, q_pos, None, None)
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[2], want[2], rtol=2e-4, atol=2e-4)


def test_decode_kernel_window_skips_pages(rng):
    """With a small window, far-past pages must not influence the output even
    if they contain garbage (here: NaNs in blocks outside the window)."""
    q, kc, vc, bt, q_pos = _setup(rng, ctx=(29, 29, 29))
    window = 8  # q_pos 28, BS 8 -> first needed page = 21 // 8 = 2
    kc = kc.copy()
    for b in range(3):
        kc[bt[b, 0]] = np.nan  # page 0 garbage: outside window
    got = np.asarray(
        paged_attention_decode(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(bt), jnp.asarray(q_pos), sinks=None, window=window, interpret=True,
        )
    )
    assert np.isfinite(got).all()
    want = _oracle(q, np.nan_to_num(kc), vc, bt, q_pos, None, window)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_paged_decode_head_pairing_path():
    """D=64, KV=4: HP=2 heads share a 128-lane program (the GPT-OSS shape
    class) — block-diagonal scoring must match the oracle per head."""
    import numpy as np
    import jax.numpy as jnp

    from gpt_oss_vllm_tpu.ops.attention import mha_reference
    from gpt_oss_vllm_tpu.ops.paged_attention import paged_attention_decode

    rng = np.random.default_rng(3)
    D, KV, G, BS, NB = 64, 4, 2, 8, 6
    n_q = KV * G
    ctx = 3 * BS + 5
    k_cache = jnp.asarray(rng.normal(size=(NB, BS, KV * D)) * 0.3, jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(NB, BS, KV * D)) * 0.3, jnp.float32)
    bt = jnp.asarray([[1, 4, 2, 5, -1, -1]], jnp.int32)
    q = jnp.asarray(rng.normal(size=(1, n_q, D)) * 0.3, jnp.float32)
    qpos = jnp.asarray([ctx - 1], jnp.int32)
    sinks = jnp.asarray(rng.normal(size=(n_q,)), jnp.float32)

    got = paged_attention_decode(
        q, k_cache, v_cache, bt, qpos, sinks=sinks, window=None, interpret=True
    )
    # oracle: gather logical context, grouped MHA
    pages = jnp.take(k_cache, jnp.maximum(bt[0], 0), axis=0)  # [MB, BS, KV*D]
    kc = pages.reshape(1, -1, KV, D)
    vc = jnp.take(v_cache, jnp.maximum(bt[0], 0), axis=0).reshape(1, -1, KV, D)
    S = kc.shape[1]
    mask = (jnp.arange(S)[None, None, :] <= qpos[:, None, None])
    # q arranged [B, T=1, n_q, D]; heads grouped per kv head (G per kv)
    ref = mha_reference(q[:, None], kc, vc, sinks, mask)[:, 0]
    np.testing.assert_allclose(
        np.asarray(got, np.float32).reshape(-1),
        np.asarray(ref, np.float32).reshape(-1),
        rtol=2e-2, atol=2e-3,
    )


@pytest.mark.parametrize("window", [None, 24])
def test_decode_kernel_multi_chunk_walk(rng, window):
    """Contexts spanning several PP-page chunks (incl. a partial tail chunk
    and clamped out-of-range page reads) must still match the oracle."""
    B, n_q, kv, D, BS, NB, MB = 2, 4, 2, 32, 8, 24, 12
    q = rng.normal(size=(B, n_q, D)).astype(np.float32)
    k_cache = rng.normal(size=(NB, BS, kv * D)).astype(np.float32)
    v_cache = rng.normal(size=(NB, BS, kv * D)).astype(np.float32)
    bt = rng.permutation(NB)[: B * MB].reshape(B, MB).astype(np.int32)
    q_pos = np.array([11 * BS + 3, 5 * BS + 1], dtype=np.int32)  # 12 / 6 pages
    sinks = rng.normal(size=(n_q,)).astype(np.float32)
    got = np.asarray(
        paged_attention_decode(
            jnp.asarray(q), jnp.asarray(k_cache), jnp.asarray(v_cache),
            jnp.asarray(bt), jnp.asarray(q_pos), sinks=jnp.asarray(sinks),
            window=window, interpret=True,
        )
    )
    want = _oracle(q, k_cache, v_cache, bt, q_pos, sinks, window)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
