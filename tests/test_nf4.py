"""Golden-value tests for the NF4 numerics core (SURVEY.md §7 stage 1 gate).

The "golden" here is an independent straight-line NumPy re-derivation of the
blockwise-NF4 + double-quant semantics the reference decodes
(``streaming_unsloth_bnb.py:101-230``), checked bit-for-bit against the
vectorized implementations in ``quant.nf4`` and the in-graph JAX dequant.
"""

import numpy as np
import pytest

from gpt_oss_vllm_tpu.quant import (
    NF4_CODE,
    dequantize_absmax_double,
    nf4_dequantize,
    nf4_quantize,
    pack_nibbles,
    quantize_absmax_double,
    unpack_nibbles,
)
from gpt_oss_vllm_tpu.quant.nf4 import dynamic_code_8bit, infer_blocksize, quantize_to_code
from gpt_oss_vllm_tpu.quant.tensor import nf4_tensor_from_dense


def _slow_nearest_code(x, code):
    # independent O(n*16) reference: true nearest codeword
    return np.array([int(np.argmin(np.abs(code - v))) for v in x], dtype=np.uint8)


def test_codebook_properties():
    assert NF4_CODE.shape == (16,)
    assert np.all(np.diff(NF4_CODE) > 0)  # sorted strictly
    assert NF4_CODE[0] == -1.0 and NF4_CODE[-1] == 1.0 and NF4_CODE[7] == 0.0


def test_quantize_to_code_matches_bruteforce(rng):
    x = rng.uniform(-1, 1, size=512).astype(np.float32)
    fast = quantize_to_code(x, NF4_CODE)
    slow = _slow_nearest_code(x, NF4_CODE)
    np.testing.assert_array_equal(fast, slow)


@pytest.mark.parametrize("order", ["low_first", "high_first"])
def test_nibble_roundtrip(rng, order):
    idx = rng.integers(0, 16, size=256).astype(np.uint8)
    packed = pack_nibbles(idx, order=order)
    assert packed.size == 128
    np.testing.assert_array_equal(unpack_nibbles(packed, order=order), idx)


def test_nibble_order_matches_reference_contract():
    # reference decode: low nibble = even flat index, high = odd
    # (streaming_unsloth_bnb.py:179-190)
    idx = np.array([3, 12], dtype=np.uint8)
    packed = pack_nibbles(idx, order="low_first")
    assert packed[0] == (3 | (12 << 4))


@pytest.mark.parametrize("blocksize", [64, 128])
def test_nf4_roundtrip_error_bounded(rng, blocksize):
    w = rng.normal(0, 0.02, size=(64, 256)).astype(np.float32)
    packed, absmax = nf4_quantize(w, blocksize=blocksize)
    assert packed.size == w.size // 2
    assert absmax.size == w.size // blocksize
    deq = nf4_dequantize(packed, absmax, w.shape, blocksize=blocksize)
    # blockwise NF4: worst-case error is half the widest code gap * block absmax
    max_gap = np.max(np.diff(NF4_CODE))
    per_block_bound = absmax.reshape(-1, 1) * (max_gap / 2 + 1e-6)
    err = np.abs((deq - w).reshape(-1, blocksize))
    assert np.all(err <= per_block_bound)
    # values exactly on codewords survive bit-exactly
    redeq = nf4_dequantize(*nf4_quantize(deq, blocksize=blocksize), deq.shape, blocksize=blocksize)
    np.testing.assert_array_equal(redeq, deq)


def test_blocksize_inference_prefers_exact_division():
    # reference rule at streaming_unsloth_bnb.py:197-218
    assert infer_blocksize(2880 * 5760, 2880 * 5760 // 64) == 64
    assert infer_blocksize(2880 * 2880, 2880 * 2880 // 128) == 128
    assert infer_blocksize(1000, 7) == 64  # fallback


def test_double_quant_roundtrip(rng):
    absmax = np.abs(rng.normal(0.02, 0.01, size=4096)).astype(np.float32)
    dq = quantize_absmax_double(absmax, nested_blocksize=256)
    assert dq.qabsmax.dtype == np.uint8 and dq.qabsmax.size == absmax.size
    rec = dequantize_absmax_double(
        dq.qabsmax, dq.nested_absmax, dq.code, offset=dq.offset, nested_blocksize=256
    )
    # 8-bit nested code on centered data: fine-grained recovery
    np.testing.assert_allclose(rec, absmax, rtol=0, atol=absmax.max() * 0.02)


def test_double_quant_reference_mode_no_offset(rng):
    """offset=0 mode mirrors the reference's dequant (which never adds an
    offset, unsloth_direct_loader.py:21-48)."""
    absmax = np.abs(rng.normal(0.05, 0.02, size=1024)).astype(np.float32)
    dq = quantize_absmax_double(absmax, use_offset=False)
    assert dq.offset == 0.0
    rec = dequantize_absmax_double(dq.qabsmax, dq.nested_absmax, dq.code)
    np.testing.assert_allclose(rec, absmax, atol=absmax.max() * 0.05)


def test_double_quant_scalar_and_elementwise_shapes():
    """The 3-way nested_absmax shape compatibility of the reference
    (streaming_unsloth_bnb.py:148-173)."""
    code = dynamic_code_8bit()
    q = np.array([10, 20, 30, 40], dtype=np.uint8)
    # scalar
    r1 = dequantize_absmax_double(q, np.array([2.0]), code)
    np.testing.assert_allclose(r1, code[q] * 2.0, rtol=1e-6)
    # elementwise
    na = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    r2 = dequantize_absmax_double(q, na, code)
    np.testing.assert_allclose(r2, code[q] * na, rtol=1e-6)
    # blockwise broadcast
    r3 = dequantize_absmax_double(q, np.array([1.0, 10.0]), code, nested_blocksize=2)
    np.testing.assert_allclose(r3, code[q] * np.array([1, 1, 10, 10]), rtol=1e-6)


def test_dynamic_code_properties():
    code = dynamic_code_8bit()
    assert code.shape == (256,)
    assert np.all(np.diff(code.astype(np.float64)) > 0)
    assert code.min() >= -1.0 and code.max() <= 1.0
    assert 0.0 in code


def test_nf4_tensor_jax_dequant_matches_numpy(rng):
    w = rng.normal(0, 0.02, size=(3, 32, 128)).astype(np.float32)  # expert dim
    t = nf4_tensor_from_dense(w, blocksize=64)
    assert t.qdata.shape == (3, 32, 64)
    assert t.scales.shape == (3, 2, 32)  # transposed [.., nb, out] layout
    jax_deq = np.asarray(t.dequantize(dtype=np.float32))
    for e in range(3):
        packed, absmax = nf4_quantize(w[e], blocksize=64)
        np_deq = nf4_dequantize(packed, absmax, (32, 128), blocksize=64)
        np.testing.assert_allclose(jax_deq[e], np_deq, rtol=0, atol=1e-6)
