"""GPT-OSS model forward — functional, cache-free form.

The transformer stack the reference serves through patched vLLM
(``patch_6_add_bnb_moe.py``, ``patch_8_unsloth_loader.py``), rebuilt as pure
functions over the :class:`~gpt_oss_vllm_tpu.models.params.ModelParams`
pytree: RMSNorm -> (RoPE-YaRN attention with sinks + alternating sliding
window) -> RMSNorm -> (router + top-k MoE). This module is the *semantic
oracle*: the cache-aware engine step functions (``engine.engine``) and all
Pallas kernels must agree with it on overlapping inputs.

Quantization partition per the reference contract: expert projections may be
NF4-packed; attention / router / embeddings / lm_head are bf16/f32
(``gpt_oss_moe_architecture.md:12-26``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.config import ModelConfig
from gpt_oss_vllm_tpu.models.params import LayerParams, ModelParams
from gpt_oss_vllm_tpu.ops.attention import attention_mask, mha_reference
from gpt_oss_vllm_tpu.ops.linear import dense_linear
from gpt_oss_vllm_tpu.ops.moe import moe_block
from gpt_oss_vllm_tpu.ops.rope import apply_rope, yarn_rope_tables


def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)).astype(x.dtype)


def attention_block(
    p: LayerParams,
    cfg: ModelConfig,
    layer_idx: int,
    x: jax.Array,  # [B, T, H]
    positions: jax.Array,  # [B, T] int32
    kv_override=None,  # optional (k, v, k_positions) for cache-aware callers
    moe_strategy: str = "auto",
) -> jax.Array:
    B, T, H = x.shape
    if p.wqkv is not None:
        qkv = dense_linear(x, p.wqkv, p.bqkv)
        q, k, v = jnp.split(qkv, [cfg.q_size, cfg.q_size + cfg.kv_size], axis=-1)
    else:
        q = dense_linear(x, p.wq, p.bq)
        k = dense_linear(x, p.wk, p.bk)
        v = dense_linear(x, p.wv, p.bv)
    q = q.reshape(B, T, cfg.num_heads, cfg.head_dim)
    k = k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    cos, sin = yarn_rope_tables(cfg, positions)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    window = cfg.sliding_window if cfg.layer_uses_sliding_window(layer_idx) else None
    if kv_override is not None:
        k, v, k_positions = kv_override
    else:
        k_positions = positions
    mask = attention_mask(positions, k_positions, window)
    out = mha_reference(q, k, v, p.sinks if cfg.use_sinks else None, mask)
    out = out.reshape(B, T, cfg.q_size)
    return dense_linear(out, p.wo, p.bo)


def transformer_layer(
    p: LayerParams,
    cfg: ModelConfig,
    layer_idx: int,
    x: jax.Array,  # [B, T, H]
    positions: jax.Array,
    moe_strategy: str = "auto",
    quant_backend: str = "xla",
) -> jax.Array:
    h = x + attention_block(p, cfg, layer_idx, rms_norm(x, p.attn_norm, cfg.rms_norm_eps), positions)
    B, T, H = h.shape
    flat = rms_norm(h, p.mlp_norm, cfg.rms_norm_eps).reshape(B * T, H)
    moe = moe_block(
        flat,
        p.router_w,
        p.router_b,
        p.w_gate_up,
        p.b_gate_up,
        p.w_down,
        p.b_down,
        cfg,
        strategy=moe_strategy,
        backend=quant_backend,
    )
    return h + moe.reshape(B, T, H)


def forward(
    params: ModelParams,
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, T] int32
    positions: Optional[jax.Array] = None,  # [B, T] int32; default arange
    moe_strategy: str = "auto",
    quant_backend: str = "xla",
) -> jax.Array:
    """Full no-cache forward; returns logits [B, T, vocab] (f32)."""
    B, T = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    from gpt_oss_vllm_tpu.quant.vocab8 import Int8Vocab, embed_rows

    if isinstance(params.embedding, Int8Vocab):
        x = embed_rows(params.embedding, tokens)
    else:
        x = jnp.take(params.embedding, tokens, axis=0)
    for li, layer in enumerate(params.layers):
        x = transformer_layer(
            layer, cfg, li, x, positions,
            moe_strategy=moe_strategy, quant_backend=quant_backend,
        )
    x = rms_norm(x, params.final_norm, cfg.rms_norm_eps)
    head = params.embedding if params.lm_head is None else params.lm_head
    if isinstance(head, Int8Vocab):
        from gpt_oss_vllm_tpu.quant.vocab8 import lm_head_logits_xla

        B2, T2, H2 = x.shape
        logits = lm_head_logits_xla(head, x.reshape(B2 * T2, H2))
        return logits[:, : cfg.vocab_size].reshape(B2, T2, -1)
    return dense_linear(x, head).astype(jnp.float32)


def greedy_decode(
    params: ModelParams,
    cfg: ModelConfig,
    prompt: jax.Array,  # [B, T0]
    num_tokens: int,
) -> jax.Array:
    """Naive no-cache greedy decode (test oracle for the cached engine —
    the ``smoke_test.py`` determinism idiom: temperature 0)."""
    tokens = prompt
    for _ in range(num_tokens):
        logits = forward(params, cfg, tokens)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(tokens.dtype)
        tokens = jnp.concatenate([tokens, nxt[:, None]], axis=1)
    return tokens[:, prompt.shape[1] :]
