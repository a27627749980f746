"""Fused NF4 matmul kernel vs the XLA dequant-then-matmul oracle
(interpret mode on CPU; the same kernel compiles for real on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.ops.nf4_matmul import nf4_matmul
from gpt_oss_vllm_tpu.quant.tensor import nf4_tensor_from_dense


def _oracle(x, w, b=None):
    wd = w.dequantize(x.dtype)
    y = jax.lax.dot_general(
        x, wd, (((x.ndim - 1,), (wd.ndim - 1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if b is not None:
        y = y + b
    return np.asarray(y.astype(x.dtype), dtype=np.float32)


@pytest.mark.parametrize("M,N,K", [(1, 256, 128), (16, 128, 256), (7, 384, 128)])
def test_kernel_matches_oracle(rng, M, N, K):
    w = nf4_tensor_from_dense(rng.normal(0, 0.05, size=(N, K)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1, size=(M, K)), dtype=jnp.bfloat16)
    got = np.asarray(
        nf4_matmul(x, w, block_n=128, interpret=True), dtype=np.float32
    )
    want = _oracle(x, w)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    # tight check in f32 activations
    x32 = x.astype(jnp.float32)
    got32 = np.asarray(nf4_matmul(x32, w, block_n=128, interpret=True), dtype=np.float32)
    want32 = _oracle(x32, w)
    np.testing.assert_allclose(got32, want32, rtol=2e-3, atol=2e-3)


def test_kernel_bias_and_batched_experts(rng):
    E, N, K, T = 3, 128, 128, 4
    w = nf4_tensor_from_dense(rng.normal(0, 0.05, size=(E, N, K)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(E, T, K)), dtype=jnp.float32)
    b = jnp.asarray(rng.normal(size=(N,)), dtype=jnp.float32)
    got = np.asarray(nf4_matmul(x, w, b=None, block_n=128, interpret=True), dtype=np.float32)
    for e in range(E):
        we = nf4_tensor_from_dense(np.asarray(w.dequantize(jnp.float32))[e])
        np.testing.assert_allclose(
            got[e], _oracle(x[e], we), rtol=3e-3, atol=3e-3
        )


def test_fallback_path_for_odd_shapes(rng):
    # in_features not tileable -> XLA fallback, still correct
    w = nf4_tensor_from_dense(rng.normal(0, 0.05, size=(32, 64)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(5, 64)), dtype=jnp.float32)
    got = np.asarray(nf4_matmul(x, w, interpret=True), dtype=np.float32)
    np.testing.assert_allclose(got, _oracle(x, w), rtol=3e-3, atol=3e-3)


def test_kernel_padded_weights_match_oracle(rng):
    """ensure_kernel_padded (packed-dim 128-multiple, zero pad scales) must
    be output-invariant through both the kernel and the fallback."""
    from gpt_oss_vllm_tpu.quant.tensor import ensure_kernel_padded

    w = nf4_tensor_from_dense(rng.normal(0, 0.05, size=(128, 192)).astype(np.float32))
    wp = ensure_kernel_padded(w)
    assert wp.kp_phys == 128 and wp.in_features == 192
    x = jnp.asarray(rng.normal(size=(4, 192)), dtype=jnp.float32)
    got = np.asarray(nf4_matmul(x, wp, block_n=128, interpret=True), dtype=np.float32)
    want = _oracle(x, w)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)
    # dequantize also slices padding away
    np.testing.assert_allclose(
        np.asarray(wp.dequantize(jnp.float32)), np.asarray(w.dequantize(jnp.float32))
    )


def test_lut_poly_matches_codebook_exactly():
    """The piecewise-polynomial codebook evaluation is numerically identical
    to the table (within f32 eps of the values) for all 16 indices."""
    import numpy as np
    import jax.numpy as jnp

    from gpt_oss_vllm_tpu.ops.nf4_matmul import _lut_nf4
    from gpt_oss_vllm_tpu.quant.nf4 import NF4_CODE

    got = np.asarray(_lut_nf4(jnp.arange(16, dtype=jnp.int32)))
    np.testing.assert_allclose(got, np.asarray(NF4_CODE, np.float32), atol=1e-6)
