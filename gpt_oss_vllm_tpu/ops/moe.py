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


def glu_pair(gate: jax.Array, up: jax.Array, cfg: ModelConfig) -> jax.Array:
    """The configured GLU on an aligned (gate, up) pair. Maps (0, 0) -> 0 in
    both variants, which is what makes zero-scale pad rows inert."""
    if cfg.activation == "silu_glu":
        return jax.nn.silu(gate) * up
    # upstream GPT-OSS clamped swiglu
    gate = jnp.clip(gate, max=cfg.swiglu_limit)
    up = jnp.clip(up, min=-cfg.swiglu_limit, max=cfg.swiglu_limit)
    glu = gate * jax.nn.sigmoid(cfg.swiglu_alpha * gate)
    return (up + 1.0) * glu


def expert_act(gate_up: jax.Array, cfg: ModelConfig) -> jax.Array:
    """Split fused [.., 2FF] into gate/up and apply the configured GLU.

    Split convention: gate = rows [0, FF), up = rows [FF, 2FF) of the fused
    projection (reference ``streaming_unsloth_bnb.py:267-277``).
    """
    ff = gate_up.shape[-1] // 2
    return glu_pair(gate_up[..., :ff], gate_up[..., ff:], cfg)


def expert_act_glu4(h: jax.Array, cfg: ModelConfig):
    """Activation for glu4-sectioned gate_up outputs (quant.tensor layout):
    ``h`` is [.., 4*sec] = [gateEven | gateOdd | upEven | upOdd]. Returns
    (a_even, a_odd), each [.., sec] — exactly the even/odd packed-column
    subspaces the down projection kernels contract against (sec equals the
    down weight's kernel-padded byte width; pad lanes are zero)."""
    sec = h.shape[-1] // 4
    ae = glu_pair(h[..., :sec], h[..., 2 * sec : 3 * sec], cfg)
    ao = glu_pair(h[..., sec : 2 * sec], h[..., 3 * sec :], cfg)
    return ae, ao


def _take_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather along dim 0 via a 2-D view. A 3-D gather makes XLA:TPU prefer a
    transposed operand layout, which inserts full-tensor relayout copies of
    every expert weight (measured +9 GB of HLO temps on GPT-OSS-20B); the 2-D
    row gather keeps the default layout."""
    E = x.shape[0]
    flat = x.reshape(E, -1)
    return jnp.take(flat, idx, axis=0).reshape(idx.shape[0], *x.shape[1:])


def _expert_tensors(w: ExpertWeight, idx: jax.Array) -> ExpertWeight:
    """Gather experts along the leading dim of a (possibly packed) weight."""
    if isinstance(w, NF4Tensor):
        import dataclasses

        return dataclasses.replace(
            w, qdata=_take_rows(w.qdata, idx), scales=_take_rows(w.scales, idx)
        )
    return _take_rows(w, idx)


def _dense(w: ExpertWeight, dtype) -> jax.Array:
    return w.dequantize(dtype) if isinstance(w, NF4Tensor) else w.astype(dtype)


def _batched_expert_matmul(
    x: jax.Array,  # [G, T, K] (G = expert groups)
    w: ExpertWeight,  # [G, N, K] (NF4-packed or dense)
    backend: str,
) -> jax.Array:
    """y[g] = x[g] @ W[g]^T in f32, fused NF4 kernel when available."""
    if isinstance(w, NF4Tensor) and backend == "pallas":
        from gpt_oss_vllm_tpu.ops.nf4_matmul import nf4_matmul

        return nf4_matmul(x, w).astype(jnp.float32)
    wd = _dense(w, x.dtype)
    return jax.lax.dot_general(
        x, wd, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def moe_gather(
    x: jax.Array,  # [T, H]
    routing: RouterOut,
    w_gate_up: ExpertWeight,  # [E, 2FF, H]
    b_gate_up: Optional[jax.Array],  # [E, 2FF]
    w_down: ExpertWeight,  # [E, H, FF]
    b_down: Optional[jax.Array],  # [E, H]
    cfg: ModelConfig,
    backend: str = "xla",
) -> jax.Array:
    """Small-T path: pull the T*k selected experts' weights and batch-matmul.

    HBM reads scale with active experts only — for batch-1 decode that is
    k/E of the layer's expert bytes (4/32 for GPT-OSS-20B)."""
    T, H = x.shape
    k = routing.indices.shape[1]
    flat_idx = routing.indices.reshape(-1)  # [T*k]
    gu = _expert_tensors(w_gate_up, flat_idx)  # [T*k, 2FF, H] (packed or dense)
    dn = _expert_tensors(w_down, flat_idx)  # [T*k, H, FF]
    xe = jnp.repeat(x, k, axis=0)[:, None, :]  # [T*k, 1, H]
    h = _batched_expert_matmul(xe, gu, backend)[:, 0]  # [T*k, 2FF] f32
    if b_gate_up is not None:
        h = h + jnp.take(b_gate_up, flat_idx, axis=0)
    a = expert_act(h, cfg)
    y = _batched_expert_matmul(a.astype(x.dtype)[:, None, :], dn, backend)[:, 0]
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
    backend: str = "xla",
) -> jax.Array:
    """Every expert processes every token; combine masks the non-selected.

    Static shapes, no scatter/gather: ideal under jit for moderate T where
    all (or most) experts are active anyway."""
    T, H = x.shape
    E = cfg.num_experts
    xb = jnp.broadcast_to(x[None], (E, T, H))
    h = _batched_expert_matmul(xb, w_gate_up, backend)  # [E, T, 2FF] f32
    if b_gate_up is not None:
        h = h + b_gate_up[:, None, :]
    a = expert_act(h, cfg)
    y = _batched_expert_matmul(a.astype(x.dtype), w_down, backend)  # [E, T, H]
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
    backend: str = "xla",
    return_indices: bool = False,
) -> jax.Array:
    # return_indices: also return the [T, k] routed expert ids (the bench's
    # routing-entropy census — batched random-weight throughput is only
    # interpretable alongside the distinct-expert count, CLAUDE.md)
    # "pallas_interpret" runs the kernel paths through the Pallas interpreter
    # (CPU tests of kernel-selection logic, incl. under shard_map meshes)
    interpret = backend == "pallas_interpret"
    if interpret:
        backend = "pallas"
    # Dispatches past ~1k pairs take the ROW-BLOCKED gmm grid inside
    # moe_gmm_block (ops.moe_gmm.GMM_RESIDENT_PAIR_CAP): bounded VMEM at any
    # chunk size and each activated expert read once per out-tile — this
    # replaced the r2 GMM_TOKEN_CAP slicing, whose slices re-read the expert
    # weights they activated (VERDICT r2 weak #3, measured 1.9x on chip).
    if backend == "pallas" and x.shape[0] <= 64 and cfg.num_experts <= 128:
        # fused logits+top-k+softmax kernel: the XLA chain is 3 tiny ops
        # whose fixed overhead dominates decode (~0.10 ms/layer measured)
        from gpt_oss_vllm_tpu.ops.router import router_topk_pallas

        weights, indices = router_topk_pallas(
            x, router_w, router_b, cfg.experts_per_token, interpret=interpret
        )
        routing = RouterOut(weights=weights, indices=indices)
    else:
        routing = route_topk(
            x, router_w, router_b, cfg.experts_per_token, fp32_logits=cfg.router_logits_fp32
        )
    glu4 = isinstance(w_gate_up, NF4Tensor) and w_gate_up.row_layout == "glu4"
    if strategy == "auto":
        small = x.shape[0] * cfg.experts_per_token < cfg.num_experts
        # gmm at ANY size on the Pallas path: small dispatches keep the
        # resident-x kernel, big ones (>GMM_RESIDENT_PAIR_CAP pairs) take the
        # row-blocked grid inside moe_gmm_block — no slicing, bounded VMEM
        if backend == "pallas" and isinstance(w_gate_up, NF4Tensor):
            # the ragged gmm kernel reads only the activated experts' bytes
            # straight from HBM (no gather copies)
            strategy = "gmm"
        else:
            # gather wins while selected-expert reads < all-expert reads
            strategy = "gather" if small else "all"
    if glu4 and strategy != "gmm":
        # the glu4 serving layout exists for the Pallas kernels; the XLA
        # strategies expect checkpoint row order (engines only section when
        # every token batch fits the gmm/fused path)
        raise ValueError(
            f"glu4-sectioned experts reached strategy={strategy!r} "
            f"(T={x.shape[0]}); keep token batches within the gmm bound"
        )
    if strategy == "gmm":
        import functools

        from gpt_oss_vllm_tpu.ops.moe_gmm import moe_gmm_block

        if not isinstance(w_gate_up, NF4Tensor):
            raise ValueError("gmm strategy requires NF4-packed expert weights")
        y = moe_gmm_block(
            x,
            routing.weights,
            routing.indices,
            w_gate_up,
            b_gate_up,
            w_down,
            b_down,
            act_fn=functools.partial(expert_act, cfg=cfg),
            act_pair_fn=functools.partial(glu_pair, cfg=cfg),
            interpret=interpret,
        )
        return (y, routing.indices) if return_indices else y
    fn = moe_gather if strategy == "gather" else moe_all_experts
    y = fn(x, routing, w_gate_up, b_gate_up, w_down, b_down, cfg, backend=backend)
    return (y, routing.indices) if return_indices else y
