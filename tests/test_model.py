"""Model-layer tests: attention (sinks/sliding-window) oracle, RoPE
properties, MoE strategy agreement, quantized-vs-dense forward parity, and
greedy decode (the ``smoke_test.py`` determinism idiom)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.config import ModelConfig, QuantConfig
from gpt_oss_vllm_tpu.models.gpt_oss import forward, greedy_decode
from gpt_oss_vllm_tpu.models.params import random_params
from gpt_oss_vllm_tpu.ops.attention import attention_mask, mha_reference
from gpt_oss_vllm_tpu.ops.moe import RouterOut, moe_all_experts, moe_gather, route_topk
from gpt_oss_vllm_tpu.ops.rope import apply_rope, yarn_rope_tables


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig.tiny()


@pytest.fixture(scope="module")
def dense_params(cfg):
    return random_params(cfg, QuantConfig(method="none"), seed=1)


def _loop_attention(q, k, v, sinks, mask, sm_scale):
    """O(everything) per-element oracle for grouped attention with sinks."""
    B, T, n_q, D = q.shape
    S, n_kv = k.shape[1], k.shape[2]
    G = n_q // n_kv
    out = np.zeros((B, T, n_q, D), dtype=np.float64)
    for b in range(B):
        for t in range(T):
            for h in range(n_q):
                kv_h = h // G
                logits = []
                for s in range(S):
                    if mask[b, t, s]:
                        logits.append((s, float(np.dot(q[b, t, h], k[b, s, kv_h])) * sm_scale))
                lv = np.array([x[1] for x in logits])
                m = max(lv.max(), sinks[h]) if sinks is not None else lv.max()
                p = np.exp(lv - m)
                denom = p.sum() + (np.exp(sinks[h] - m) if sinks is not None else 0.0)
                for (s, _), pi in zip(logits, p):
                    out[b, t, h] += (pi / denom) * v[b, s, kv_h]
    return out


def test_attention_matches_loop_oracle(rng):
    B, T, n_q, n_kv, D = 2, 5, 4, 2, 8
    q = rng.normal(size=(B, T, n_q, D)).astype(np.float32)
    k = rng.normal(size=(B, T, n_kv, D)).astype(np.float32)
    v = rng.normal(size=(B, T, n_kv, D)).astype(np.float32)
    sinks = rng.normal(size=(n_q,)).astype(np.float32)
    pos = np.broadcast_to(np.arange(T, dtype=np.int32), (B, T))
    mask = np.asarray(attention_mask(jnp.asarray(pos), jnp.asarray(pos), sliding_window=3))
    got = np.asarray(
        mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(sinks), jnp.asarray(mask))
    )
    want = _loop_attention(q, k, v, sinks, mask, D**-0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sinks_change_output_and_reduce_attention_mass(rng):
    B, T, n_q, n_kv, D = 1, 4, 2, 2, 8
    q = jnp.asarray(rng.normal(size=(B, T, n_q, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, n_kv, D)), dtype=jnp.float32)
    v = jnp.abs(jnp.asarray(rng.normal(size=(B, T, n_kv, D)), dtype=jnp.float32)) + 1.0
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    mask = attention_mask(pos, pos, None)
    no_sink = mha_reference(q, k, v, None, mask)
    big_sink = mha_reference(q, k, v, jnp.full((n_q,), 10.0), mask)
    # a huge sink logit absorbs probability mass -> output magnitude shrinks
    assert float(jnp.abs(big_sink).mean()) < 0.2 * float(jnp.abs(no_sink).mean())


def test_sliding_window_masks_old_keys():
    pos = jnp.arange(10, dtype=jnp.int32)[None]
    m = np.asarray(attention_mask(pos, pos, sliding_window=4))[0]
    assert m[9, 9] and m[9, 6]
    assert not m[9, 5]  # 9 - 5 = 4 >= window
    assert not m[3, 7]  # future
    full = np.asarray(attention_mask(pos, pos, None))[0]
    assert full[9, 0]


def test_rope_relative_position_property(cfg, rng):
    """q.k after RoPE depends only on relative offset (within fp tolerance)."""
    D = cfg.head_dim
    q = jnp.asarray(rng.normal(size=(1, 1, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1, D)), dtype=jnp.float32)

    def dot_at(p_q, p_k):
        cq, sq = yarn_rope_tables(cfg, jnp.array([p_q], dtype=jnp.int32))
        ck, sk = yarn_rope_tables(cfg, jnp.array([p_k], dtype=jnp.int32))
        qr = apply_rope(q[None], cq[None], sq[None])[0, 0, 0]
        kr = apply_rope(k[None], ck[None], sk[None])[0, 0, 0]
        return float(jnp.dot(qr, kr))

    d1 = dot_at(5, 3)
    d2 = dot_at(25, 23)
    assert abs(d1 - d2) < 1e-3
    assert abs(dot_at(5, 3) - dot_at(5, 0)) > 1e-4  # but not position-blind


def test_yarn_reduces_to_plain_rope_when_factor_1(cfg):
    import dataclasses

    plain = dataclasses.replace(cfg, rope_scaling_factor=1.0)
    pos = jnp.arange(4, dtype=jnp.int32)
    c, s = yarn_rope_tables(plain, pos)
    inv = 1.0 / (plain.rope_theta ** (2.0 * jnp.arange(cfg.head_dim // 2) / cfg.head_dim))
    np.testing.assert_allclose(np.asarray(c), np.cos(np.outer(pos, inv)), rtol=1e-5)


def test_moe_gather_equals_all_experts(cfg, rng):
    E, H, FF = cfg.num_experts, cfg.hidden_size, cfg.intermediate_size
    x = jnp.asarray(rng.normal(size=(3, H)) * 0.1, dtype=jnp.float32)
    rw = jnp.asarray(rng.normal(size=(E, H)), dtype=jnp.float32)
    wgu = jnp.asarray(rng.normal(size=(E, 2 * FF, H)) * 0.05, dtype=jnp.float32)
    wdn = jnp.asarray(rng.normal(size=(E, H, FF)) * 0.05, dtype=jnp.float32)
    bgu = jnp.asarray(rng.normal(size=(E, 2 * FF)) * 0.01, dtype=jnp.float32)
    bdn = jnp.asarray(rng.normal(size=(E, H)) * 0.01, dtype=jnp.float32)
    routing = route_topk(x, rw, None, cfg.experts_per_token)
    y1 = moe_gather(x, routing, wgu, bgu, wdn, bdn, cfg)
    y2 = moe_all_experts(x, routing, wgu, bgu, wdn, bdn, cfg)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-4, atol=2e-5)


def test_routing_softmax_over_topk(cfg, rng):
    x = jnp.asarray(rng.normal(size=(5, cfg.hidden_size)), dtype=jnp.float32)
    rw = jnp.asarray(rng.normal(size=(cfg.num_experts, cfg.hidden_size)), dtype=jnp.float32)
    r = route_topk(x, rw, None, cfg.experts_per_token)
    np.testing.assert_allclose(np.asarray(r.weights.sum(-1)), 1.0, rtol=1e-5)
    assert r.indices.shape == (5, cfg.experts_per_token)
    assert r.weights.dtype == jnp.float32


def test_forward_shapes_and_finite(cfg, dense_params):
    tokens = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], dtype=jnp.int32)
    logits = forward(dense_params, cfg, tokens)
    assert logits.shape == (1, 8, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_forward_quantized_close_to_dense(cfg):
    """NF4-quantizing the experts perturbs logits only mildly — and the
    top-1 greedy token stream stays coherent (the 4-bit PPL-delta contract
    is measured properly in bench/eval; this is the smoke version)."""
    qp = random_params(cfg, QuantConfig(method="nf4"), seed=3)
    # build the dense twin by dequantizing the same packed weights
    import dataclasses as dc

    dp_layers = []
    for l in qp.layers:
        dp_layers.append(
            dc.replace(
                l,
                w_gate_up=l.w_gate_up.dequantize(jnp.bfloat16),
                w_down=l.w_down.dequantize(jnp.bfloat16),
            )
        )
    dp = dc.replace(qp, layers=dp_layers)
    tokens = jnp.asarray([[10, 20, 30, 40]], dtype=jnp.int32)
    lq = forward(qp, cfg, tokens)
    ld = forward(dp, cfg, tokens)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(ld), rtol=0.05, atol=0.05)


def test_greedy_decode_deterministic(cfg, dense_params):
    prompt = jnp.asarray([[5, 9, 2]], dtype=jnp.int32)
    out1 = greedy_decode(dense_params, cfg, prompt, 4)
    out2 = greedy_decode(dense_params, cfg, prompt, 4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert out1.shape == (1, 4)
    assert int(out1.max()) < cfg.vocab_size


def test_moe_strategies_in_full_forward_agree(cfg, dense_params):
    tokens = jnp.asarray([[3, 1, 4, 1, 5]], dtype=jnp.int32)
    la = forward(dense_params, cfg, tokens, moe_strategy="all")
    lg = forward(dense_params, cfg, tokens, moe_strategy="gather")
    np.testing.assert_allclose(np.asarray(la), np.asarray(lg), rtol=2e-3, atol=2e-3)


def test_gpt_oss_120b_preset_structure():
    """The 120B stretch config (BASELINE config 5): 36 layers, 128 experts,
    same width — and a scaled-down-depth forward runs (same module graph)."""
    from gpt_oss_vllm_tpu.config import ModelConfig, QuantConfig
    from gpt_oss_vllm_tpu.models.gpt_oss import forward
    from gpt_oss_vllm_tpu.models.params import random_params

    big = ModelConfig.gpt_oss_120b()
    assert (big.num_layers, big.num_experts) == (36, 128)
    assert big.hidden_size == 2880 and big.experts_per_token == 4
    # structurally identical tiny variant: 128 experts, 2 layers
    small = ModelConfig.gpt_oss_120b(
        num_layers=2, hidden_size=128, intermediate_size=128, vocab_size=512,
        num_heads=4, num_kv_heads=2, head_dim=32, sliding_window=16,
    )
    params = random_params(small, QuantConfig(method="none"), seed=0)
    toks = jnp.ones((1, 8), jnp.int32)
    logits = forward(params, small, toks)
    assert logits.shape[-1] == 512
    assert bool(jnp.isfinite(logits).all())


def test_fuse_qkv_parity(cfg, dense_params):
    """Fused-qkv params produce identical logits (row-concat only changes
    which matmul computes each output row, not the contraction)."""
    from gpt_oss_vllm_tpu.models.gpt_oss import forward
    from gpt_oss_vllm_tpu.models.params import fuse_qkv

    toks = jnp.ones((1, 6), jnp.int32) * 3
    ref = forward(dense_params, cfg, toks)
    fused = fuse_qkv(dense_params)
    assert fused.layers[0].wqkv is not None and fused.layers[0].wq is None
    got = forward(fused, cfg, toks)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_prepare_serving_params_layout():
    """prepare_serving_params returns the final single-shard serving layout
    (fused qkv; glu4 sectioning is TPU-only so row order stays 'flat' on
    CPU) and the engine's own passes no-op on it."""
    from gpt_oss_vllm_tpu.config import ModelConfig, QuantConfig
    from gpt_oss_vllm_tpu.models.params import prepare_serving_params

    cfg = ModelConfig.tiny()
    p = prepare_serving_params(cfg, QuantConfig(method="nf4"), seed=3)
    assert p.layers[0].wqkv is not None and p.layers[0].wq is None
    assert p.layers[0].w_gate_up.row_layout == "flat"  # CPU: no glu4 repack
