"""fp8 (float8_e4m3fn) KV cache: write/gather round trip, paged kernel vs
oracle on a quantized cache, and an engine-level greedy smoke.

The TPU-native analog of vLLM's ``--kv-cache-dtype fp8``: K/V are cast to
e4m3 on write (scalar scale 1.0) and upcast in-register on read — half the
KV memory and half the paged-attention HBM traffic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.config import CacheConfig, EngineConfig, ModelConfig, QuantConfig, SchedulerConfig
from gpt_oss_vllm_tpu.engine.kv_cache import KVCache, gather_kv, slot_mapping, write_kv
from gpt_oss_vllm_tpu.ops.paged_attention import paged_attention_decode
from tests.test_paged_attention import _oracle, _setup


def test_cache_create_fp8_dtype():
    cfg = ModelConfig.tiny()
    cc = CacheConfig(block_size=8, num_blocks=16, max_blocks_per_seq=4, dtype="fp8")
    cache = KVCache.create(cfg, cc)
    assert cache.k.dtype == jnp.float8_e4m3fn
    assert cache.nbytes() == 2 * cache.k.size  # 1 byte/value


def test_write_gather_roundtrip_fp8(rng):
    cfg = ModelConfig.tiny()
    cc = CacheConfig(block_size=8, num_blocks=16, max_blocks_per_seq=4, dtype="fp8")
    cache = KVCache.create(cfg, cc)
    B, T, KV, D = 2, 5, cfg.num_kv_heads, cfg.head_dim
    k = jnp.asarray(rng.normal(size=(B, T, KV, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, KV, D)), jnp.float32)
    bt = jnp.asarray([[0, 1, -1, -1], [2, 3, -1, -1]], jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    cache = write_kv(cache, 0, k, v, slot_mapping(bt, pos, cc.block_size))
    kg, vg = gather_kv(cache, 0, bt)
    # round trip == one e4m3 quantization of the source values
    want = np.asarray(k.astype(jnp.float8_e4m3fn).astype(jnp.float32))
    got = np.asarray(kg.astype(jnp.float32))[:, :T]
    np.testing.assert_array_equal(got, want)
    # e4m3: 3 mantissa bits (6.25% half-ulp for normals; absolute error in
    # the subnormal range below 2^-6)
    np.testing.assert_allclose(want, np.asarray(k), rtol=0.07, atol=2**-6)


@pytest.mark.parametrize("window", [None, 8])
def test_paged_kernel_fp8_matches_oracle(rng, window):
    q, kc, vc, bt, q_pos = _setup(rng)
    kc8 = jnp.asarray(kc).astype(jnp.float8_e4m3fn)
    vc8 = jnp.asarray(vc).astype(jnp.float8_e4m3fn)
    sinks = rng.normal(size=(4,)).astype(np.float32)
    got = np.asarray(
        paged_attention_decode(
            jnp.asarray(q), kc8, vc8, jnp.asarray(bt), jnp.asarray(q_pos),
            sinks=jnp.asarray(sinks), window=window, interpret=True,
        )
    )
    # oracle on the SAME quantized cache: kernel and oracle must agree
    want = _oracle(
        q,
        np.asarray(kc8.astype(jnp.float32)),
        np.asarray(vc8.astype(jnp.float32)),
        bt, q_pos, sinks, window,
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_engine_greedy_fp8_cache():
    """Engine runs end-to-end on an fp8 cache; tokens match a bf16-cache
    engine for a short greedy completion (quantization noise is far below
    the logit margins of a tiny random model)."""
    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.engine.request import SamplingParams
    from gpt_oss_vllm_tpu.models.params import random_params

    cfg = ModelConfig.tiny()
    quant = QuantConfig(method="none")
    params = random_params(cfg, quant, seed=0)
    prompt = list(range(2, 10))

    def run(dtype):
        config = EngineConfig(
            model=cfg,
            quant=quant,
            cache=CacheConfig(block_size=8, num_blocks=32, max_blocks_per_seq=8, dtype=dtype),
            scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=64),
        )
        eng = InferenceEngine(config, params)
        eng.add_request("r", list(prompt), SamplingParams(max_tokens=8, temperature=0.0))
        toks = []
        while eng.has_work():
            for out in eng.step():
                toks.append(out.token_id)
        return toks

    t8 = run("fp8")
    tb = run("bfloat16")
    assert len(t8) == 8
    assert t8 == tb
