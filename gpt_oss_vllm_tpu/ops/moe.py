"""Mixture-of-Experts execution strategies (XLA paths).

MoE math contract (the reference's in-repo spec,
``unsloth_to_vllm_converter.py:282-325`` / SURVEY.md §3.3): route with top-k
over router logits, softmax over the selected k logits, then per selected
expert ``y += weight_e * down_e(act(gate_up_e(x)))`` where gate/up are the
two halves of the fused [2FF, H] projection. The activation is configurable:
the upstream GPT-OSS clamped SwiGLU (default) or the reference's plain
``silu(gate) * up``.

Three execution strategies, auto-selected by static token count
(the Pallas grouped kernel in ``ops.moe_gmm`` supersedes these on TPU
for large token counts):

- ``gather``      — T*k small (decode, small batches): gather only the
                    selected experts' packed weights; HBM traffic ~= active
                    expert bytes, the decode optimum.
- ``all_experts`` — T moderate: run every expert on every token, mask+combine.
                    Reads each expert weight exactly once; on TPU decode this
                    is memory-bound-optimal once T*k >= E while keeping
                    static shapes and zero scatter.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.config import ModelConfig
from gpt_oss_vllm_tpu.ops.linear import quantized_linear
from gpt_oss_vllm_tpu.quant.tensor import NF4Tensor

ExpertWeight = Union[NF4Tensor, jax.Array]


class RouterOut(NamedTuple):
    weights: jax.Array  # [T, k] f32, softmaxed over the selected k
    indices: jax.Array  # [T, k] int32


def route_topk(
    x: jax.Array,  # [T, H]
    router_w: jax.Array,  # [E, H] f32
    router_b: Optional[jax.Array],
    top_k: int,
    fp32_logits: bool = True,
) -> RouterOut:
    """Top-k routing: top_k then softmax over the k selected logits
    (reference ``unsloth_to_vllm_converter.py:291-292``). Router compute is
    f32 — the stable-dtype fix for the reference's Half/BFloat16 matmul
    blocker (``monkey_patch_router_fp16.py``, ``STATUS.md:6``)."""
    xr = x.astype(jnp.float32) if fp32_logits else x
    logits = xr @ router_w.astype(xr.dtype).T
    if router_b is not None:
        logits = logits + router_b
    top_vals, top_idx = jax.lax.top_k(logits, top_k)
    weights = jax.nn.softmax(top_vals.astype(jnp.float32), axis=-1)
    return RouterOut(weights=weights, indices=top_idx.astype(jnp.int32))


def expert_act(gate_up: jax.Array, cfg: ModelConfig) -> jax.Array:
    """Split fused [.., 2FF] into gate/up and apply the configured GLU.

    Split convention: gate = rows [0, FF), up = rows [FF, 2FF) of the fused
    projection (reference ``streaming_unsloth_bnb.py:267-277``).
    """
    ff = gate_up.shape[-1] // 2
    gate, up = gate_up[..., :ff], gate_up[..., ff:]
    if cfg.activation == "silu_glu":
        return jax.nn.silu(gate) * up
    # upstream GPT-OSS clamped swiglu
    gate = jnp.clip(gate, max=cfg.swiglu_limit)
    up = jnp.clip(up, min=-cfg.swiglu_limit, max=cfg.swiglu_limit)
    glu = gate * jax.nn.sigmoid(cfg.swiglu_alpha * gate)
    return (up + 1.0) * glu


def _expert_tensors(w: ExpertWeight, idx: jax.Array) -> ExpertWeight:
    """Gather experts along the leading dim of a (possibly packed) weight."""
    if isinstance(w, NF4Tensor):
        return NF4Tensor(
            qdata=jnp.take(w.qdata, idx, axis=0),
            scales=jnp.take(w.scales, idx, axis=0),
            out_features=w.out_features,
            in_features=w.in_features,
            blocksize=w.blocksize,
        )
    return jnp.take(w, idx, axis=0)


def _dense(w: ExpertWeight, dtype) -> jax.Array:
    return w.dequantize(dtype) if isinstance(w, NF4Tensor) else w.astype(dtype)


def moe_gather(
    x: jax.Array,  # [T, H]
    routing: RouterOut,
    w_gate_up: ExpertWeight,  # [E, 2FF, H]
    b_gate_up: Optional[jax.Array],  # [E, 2FF]
    w_down: ExpertWeight,  # [E, H, FF]
    b_down: Optional[jax.Array],  # [E, H]
    cfg: ModelConfig,
) -> jax.Array:
    """Small-T path: pull the T*k selected experts' weights and batch-matmul.

    HBM reads scale with active experts only — for batch-1 decode that is
    k/E of the layer's expert bytes (4/32 for GPT-OSS-20B)."""
    T, H = x.shape
    k = routing.indices.shape[1]
    flat_idx = routing.indices.reshape(-1)  # [T*k]
    gu = _dense(_expert_tensors(w_gate_up, flat_idx), x.dtype)  # [T*k, 2FF, H]
    dn = _dense(_expert_tensors(w_down, flat_idx), x.dtype)  # [T*k, H, FF]
    xe = jnp.repeat(x, k, axis=0)  # [T*k, H]
    h = jnp.einsum("tfh,th->tf", gu.astype(jnp.float32), xe.astype(jnp.float32))
    if b_gate_up is not None:
        h = h + jnp.take(b_gate_up, flat_idx, axis=0)
    a = expert_act(h, cfg)
    y = jnp.einsum("thf,tf->th", dn.astype(jnp.float32), a)
    if b_down is not None:
        y = y + jnp.take(b_down, flat_idx, axis=0)
    y = y.reshape(T, k, H) * routing.weights[..., None]
    return jnp.sum(y, axis=1).astype(x.dtype)


def moe_all_experts(
    x: jax.Array,  # [T, H]
    routing: RouterOut,
    w_gate_up: ExpertWeight,
    b_gate_up: Optional[jax.Array],
    w_down: ExpertWeight,
    b_down: Optional[jax.Array],
    cfg: ModelConfig,
) -> jax.Array:
    """Every expert processes every token; combine masks the non-selected.

    Static shapes, no scatter/gather: ideal under jit for moderate T where
    all (or most) experts are active anyway."""
    T, H = x.shape
    E = cfg.num_experts
    gu = _dense(w_gate_up, x.dtype)  # [E, 2FF, H]
    dn = _dense(w_down, x.dtype)  # [E, H, FF]
    h = jnp.einsum("efh,th->etf", gu.astype(jnp.float32), x.astype(jnp.float32))
    if b_gate_up is not None:
        h = h + b_gate_up[:, None, :]
    a = expert_act(h, cfg)
    y = jnp.einsum("ehf,etf->eth", dn.astype(jnp.float32), a)
    if b_down is not None:
        y = y + b_down[:, None, :]
    # combine [T, E]: sum_k weight_k * one_hot(idx_k)
    combine = jnp.sum(
        jax.nn.one_hot(routing.indices, E, dtype=jnp.float32)
        * routing.weights[..., None],
        axis=1,
    )
    return jnp.einsum("te,eth->th", combine, y).astype(x.dtype)


def moe_block(
    x: jax.Array,  # [T, H]
    router_w: jax.Array,
    router_b: Optional[jax.Array],
    w_gate_up: ExpertWeight,
    b_gate_up: Optional[jax.Array],
    w_down: ExpertWeight,
    b_down: Optional[jax.Array],
    cfg: ModelConfig,
    strategy: str = "auto",
) -> jax.Array:
    routing = route_topk(
        x, router_w, router_b, cfg.experts_per_token, fp32_logits=cfg.router_logits_fp32
    )
    if strategy == "auto":
        # gather wins while selected-expert weight reads < all-expert reads
        strategy = (
            "gather" if x.shape[0] * cfg.experts_per_token < cfg.num_experts else "all"
        )
    fn = moe_gather if strategy == "gather" else moe_all_experts
    return fn(x, routing, w_gate_up, b_gate_up, w_down, b_down, cfg)
