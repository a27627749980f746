"""Fused MoE-FFN decode kernel + glu4 sectioned layout vs the gather oracle.

The glu4 layout (quant.tensor.section_glu4) is a bit-lossless row repack, so
the fused kernel must match the flat-layout oracle to kernel (bf16-cast)
tolerance, and dequantize() must invert the permutation exactly.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.config import ModelConfig
from gpt_oss_vllm_tpu.ops.moe import (
    expert_act,
    expert_act_glu4,
    glu_pair,
    moe_gather,
    route_topk,
)
from gpt_oss_vllm_tpu.ops.moe_gmm import moe_gmm_block
from gpt_oss_vllm_tpu.ops.moe_ffn_fused import moe_ffn_glu4_t1
from gpt_oss_vllm_tpu.quant.tensor import (
    q4_tensor_from_dense,
    section_glu4,
    section_glu4_bias,
)


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig.tiny(num_experts=8, experts_per_token=2)


def _weights(rng, cfg, codebook):
    E, H, FF = cfg.num_experts, cfg.hidden_size, cfg.intermediate_size
    kw = dict(blocksize=32, codebook="mxfp4") if codebook == "mxfp4" else {}
    wgu = q4_tensor_from_dense(
        rng.normal(0, 0.05, size=(E, 2 * FF, H)).astype(np.float32), **kw
    )
    wdn = q4_tensor_from_dense(
        rng.normal(0, 0.05, size=(E, H, FF)).astype(np.float32), **kw
    )
    bgu = jnp.asarray(rng.normal(size=(E, 2 * FF)) * 0.01, dtype=jnp.float32)
    bdn = jnp.asarray(rng.normal(size=(E, H)) * 0.01, dtype=jnp.float32)
    return wgu, wdn, bgu, bdn


def test_section_glu4_roundtrip(rng, cfg):
    wgu, _, bgu, _ = _weights(rng, cfg, "nf4")
    s = section_glu4(wgu)
    assert s.row_layout == "glu4"
    assert s.out_rows % 4 == 0 and s.section_rows % 128 == 0
    np.testing.assert_array_equal(
        np.asarray(s.dequantize(jnp.float32)), np.asarray(wgu.dequantize(jnp.float32))
    )


def test_expert_act_glu4_matches_flat(rng, cfg):
    FF = cfg.intermediate_size
    h_flat = jnp.asarray(rng.normal(size=(5, 2 * FF)), dtype=jnp.float32)
    a = np.asarray(expert_act(h_flat, cfg))
    # build the sectioned h by permuting columns the way glu4 permutes rows
    from gpt_oss_vllm_tpu.quant.tensor import _glu4_logical_of_phys, _glu4_sections

    half, sec = _glu4_sections(2 * FF)
    src = _glu4_logical_of_phys(2 * FF, sec)
    real = (np.arange(4 * sec) % sec) < half
    h_sec = jnp.where(
        jnp.asarray(real), jnp.take(h_flat, jnp.asarray(src), axis=-1), 0.0
    )
    ae, ao = expert_act_glu4(h_sec, cfg)
    # interleave (even, odd) back and compare against the flat activation
    got = np.stack([np.asarray(ae)[:, :half], np.asarray(ao)[:, :half]], axis=-1)
    np.testing.assert_allclose(got.reshape(5, FF), a, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("codebook", ["nf4", "mxfp4"])
@pytest.mark.parametrize("bias", [True, False])
def test_fused_ffn_t1_matches_gather(rng, cfg, codebook, bias):
    wgu, wdn, bgu, bdn = _weights(rng, cfg, codebook)
    H = cfg.hidden_size
    x = jnp.asarray(rng.normal(size=(1, H)) * 0.3, dtype=jnp.float32)
    rw = jnp.asarray(rng.normal(size=(cfg.num_experts, H)), dtype=jnp.float32)
    routing = route_topk(x, rw, None, cfg.experts_per_token)
    oracle = moe_gather(
        x, routing, wgu, bgu if bias else None, wdn, bdn if bias else None, cfg,
        backend="xla",
    )
    got = moe_ffn_glu4_t1(
        x,
        routing.weights,
        routing.indices,
        section_glu4(wgu),
        section_glu4_bias(bgu, 2 * cfg.intermediate_size) if bias else None,
        wdn,
        bdn if bias else None,
        functools.partial(glu_pair, cfg=cfg),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("T", [1, 5, 9])
def test_gmm_block_glu4_matches_gather(rng, cfg, T):
    """The general gmm path with sectioned gate_up (batched decode/prefill)."""
    wgu, wdn, bgu, bdn = _weights(rng, cfg, "nf4")
    H = cfg.hidden_size
    x = jnp.asarray(rng.normal(size=(T, H)) * 0.3, dtype=jnp.float32)
    rw = jnp.asarray(rng.normal(size=(cfg.num_experts, H)), dtype=jnp.float32)
    routing = route_topk(x, rw, None, cfg.experts_per_token)
    oracle = moe_gather(x, routing, wgu, bgu, wdn, bdn, cfg, backend="xla")
    got = moe_gmm_block(
        x,
        routing.weights,
        routing.indices,
        section_glu4(wgu),
        section_glu4_bias(bgu, 2 * cfg.intermediate_size),
        wdn,
        bdn,
        act_fn=functools.partial(expert_act, cfg=cfg),
        act_pair_fn=functools.partial(glu_pair, cfg=cfg),
        tm=4 if T > 1 else None,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), rtol=5e-3, atol=5e-3)


def test_section_glu_experts_params_transform(rng):
    """Params-level transform: sectioned engine params stay numerically
    identical through the XLA oracle (dequantize un-permutes)."""
    from gpt_oss_vllm_tpu.config import QuantConfig
    from gpt_oss_vllm_tpu.models.params import random_params, section_glu_experts

    cfg = ModelConfig.tiny(num_experts=4, experts_per_token=2)
    params = random_params(cfg, QuantConfig(method="nf4"), seed=3)
    base = np.asarray(params.layers[0].w_gate_up.dequantize(jnp.float32))
    params = section_glu_experts(params)
    l0 = params.layers[0]
    assert l0.w_gate_up.row_layout == "glu4"
    np.testing.assert_array_equal(
        np.asarray(l0.w_gate_up.dequantize(jnp.float32)), base
    )
    # idempotent
    params2 = section_glu_experts(params)
    assert params2.layers[0].w_gate_up.row_layout == "glu4"


def test_gmm_block_glu4_rowblocked_matches_gather(rng, cfg, monkeypatch):
    """glu4 sectioned weights through the ROW-BLOCKED grid — the 512-token
    prefill-chunk serving case (dispatch past GMM_RESIDENT_PAIR_CAP pairs
    with the fused-FFN expert layout)."""
    import gpt_oss_vllm_tpu.ops.moe_gmm as gmm_mod

    wgu, wdn, bgu, bdn = _weights(rng, cfg, "nf4")
    H = cfg.hidden_size
    T = 12
    x = jnp.asarray(rng.normal(size=(T, H)) * 0.3, dtype=jnp.float32)
    rw = jnp.asarray(rng.normal(size=(cfg.num_experts, H)), dtype=jnp.float32)
    routing = route_topk(x, rw, None, cfg.experts_per_token)
    oracle = moe_gather(x, routing, wgu, bgu, wdn, bdn, cfg, backend="xla")
    monkeypatch.setattr(gmm_mod, "GMM_RESIDENT_PAIR_CAP", 4)  # force row-blocked
    got = moe_gmm_block(
        x,
        routing.weights,
        routing.indices,
        section_glu4(wgu),
        section_glu4_bias(bgu, 2 * cfg.intermediate_size),
        wdn,
        bdn,
        act_fn=functools.partial(expert_act, cfg=cfg),
        act_pair_fn=functools.partial(glu_pair, cfg=cfg),
        tm=8,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), rtol=5e-3, atol=5e-3)
