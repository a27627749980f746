"""Native (C++) component tests: NF4 codec parity with NumPy, and the
prefix-sharing block allocator."""

import numpy as np
import pytest

from gpt_oss_vllm_tpu.native import (
    NativeBlockAllocator,
    load_blockalloc,
    load_nf4core,
    native_dequant,
    native_dequant_absmax,
    native_quant,
    native_swap_nibbles,
)
from gpt_oss_vllm_tpu.quant.nf4 import (
    NF4_CODE,
    dequantize_absmax_double,
    dynamic_code_8bit,
    nf4_dequantize,
    nf4_quantize,
    quantize_absmax_double,
)

pytestmark = pytest.mark.skipif(
    load_nf4core() is None, reason="native toolchain unavailable"
)


def test_native_quant_dequant_matches_numpy(rng):
    w = rng.normal(0, 0.02, size=(64 * 512,)).astype(np.float32)
    pq, ab = native_quant(w, NF4_CODE, 64)
    pq2, ab2 = nf4_quantize(w, 64)
    np.testing.assert_array_equal(ab, ab2)
    np.testing.assert_array_equal(pq, pq2)
    d1 = native_dequant(pq, ab, NF4_CODE, 64)
    d2 = nf4_dequantize(pq, ab, (w.size,), 64)
    np.testing.assert_array_equal(d1, d2)


def test_native_swap_and_absmax(rng):
    data = rng.integers(0, 255, 256).astype(np.uint8)
    s = native_swap_nibbles(data)
    np.testing.assert_array_equal(s, ((data & 0xF) << 4) | (data >> 4))
    absmax = np.abs(rng.normal(0.02, 0.01, 512)).astype(np.float32)
    dq = quantize_absmax_double(absmax, nested_blocksize=256)
    got = native_dequant_absmax(dq.qabsmax, dq.nested_absmax, dq.code, float(dq.offset), 256)
    want = dequantize_absmax_double(dq.qabsmax, dq.nested_absmax, dq.code, dq.offset, 256)
    # C++ may contract multiply-add into fma: allow 1-ulp-scale differences
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


@pytest.mark.skipif(load_blockalloc() is None, reason="blockalloc unavailable")
class TestNativeBlockAllocator:
    def test_alloc_free(self):
        a = NativeBlockAllocator(8)
        b = a.allocate(3)
        assert len(set(b)) == 3 and a.num_free == 5
        with pytest.raises(RuntimeError):
            a.allocate(6)
        a.free(b)
        assert a.num_free == 8

    def test_prefix_sharing(self):
        a = NativeBlockAllocator(8)
        toks = list(range(16))
        assert a.prefix_lookup(-1, toks) is None  # cold
        blk = a.allocate(1)[0]
        a.register_prefix(-1, toks, blk)
        hit = a.prefix_lookup(-1, toks)
        assert hit == blk
        assert a.num_free == 7  # shared, not double-allocated
        # chained prefix: second block keyed by parent
        toks2 = list(range(16, 32))
        assert a.prefix_lookup(blk, toks2) is None
        blk2 = a.allocate(1)[0]
        a.register_prefix(blk, toks2, blk2)
        assert a.prefix_lookup(blk, toks2) == blk2
        # different parent -> different chain, miss
        assert a.prefix_lookup(-1, toks2) is None
        stats = a.stats()
        assert stats["prefix_hits"] == 2 and stats["prefix_misses"] == 3

    def test_resurrection_from_free_list(self):
        a = NativeBlockAllocator(4)
        toks = list(range(16))
        blk = a.allocate(1)[0]
        a.register_prefix(-1, toks, blk)
        a.free([blk, blk])  # refcount 1 -> freed (extra release ignored)
        assert a.num_free == 4
        # content still valid until reallocation: lookup resurrects it
        hit = a.prefix_lookup(-1, toks)
        assert hit == blk and a.num_free == 3
        a.free([blk])
        # reallocate the block to new content -> stale entry must miss
        got = a.allocate(4)
        assert a.prefix_lookup(-1, toks) is None
        a.free(got)
