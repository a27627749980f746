"""Expert-parallel MoE with all-to-all token dispatch (shard_map).

The production EP pattern promised in SURVEY.md §2.4 ("experts sharded
across chips; all-to-all token dispatch over ICI") and §2.3's NCCL row
(XLA collectives instead of a comm library): tokens AND experts are sharded
over the same mesh axis, so each device holds T/ep tokens and E/ep experts,
and routed pairs travel to their expert's device through
``jax.lax.all_to_all`` — activation bytes over ICI instead of weight bytes.

This differs from the implicit-GSPMD path (tokens replicated over the
expert axis, psum combine) that `parallel.sharding` + `ops.moe` provide:
that one is fine for small decode batches; this one is the memory- and
bandwidth-scalable form for large-batch prefill and multi-host serving,
and it gives explicit control of the dispatch (capacity, overflow drop).

Mechanics (classic capacity-bucketed dispatch):

1. route locally (router weights are replicated and tiny);
2. each pair's destination shard is ``expert_id // (E/ep)``; a stable
   cumulative count ranks pairs per destination; pairs ranked beyond the
   per-destination capacity C are dropped (contribute zero — standard MoE
   overflow semantics);
3. ``all_to_all`` ships `[ep, C, H]` send buffers (plus int metadata:
   local-expert id, valid flag);
4. each shard runs its local experts over the received rows (fused-NF4
   gmm kernel on TPU, XLA strategies elsewhere — same expert math as
   ``ops.moe``, reference semantics ``unsloth_to_vllm_converter.py:282-325``);
5. results ride ``all_to_all`` back to the source shard, which applies the
   routing weights and segment-sums per token.

Receivers never see routing weights; the source applies them after the
return trip, so dropped pairs are exact zeros and the combine matches the
single-device oracle bit-for-bit when capacity is not exceeded.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpt_oss_vllm_tpu.config import ModelConfig
from gpt_oss_vllm_tpu.ops.moe import (
    RouterOut,
    expert_act,
    moe_all_experts,
    moe_gather,
    route_topk,
)
from gpt_oss_vllm_tpu.quant.tensor import NF4Tensor


def ep_capacity(num_pairs_local: int, ep: int, capacity_factor: float) -> int:
    """Per-destination send capacity. factor >= ep means lossless."""
    even = -(-num_pairs_local // ep)
    return max(1, min(num_pairs_local, int(even * capacity_factor)))


def _apply_local_experts(
    x: jax.Array,  # [R, H]
    expert_ids: jax.Array,  # [R] int32 in [0, El)
    w_gate_up,
    b_gate_up: Optional[jax.Array],
    w_down,
    b_down: Optional[jax.Array],
    cfg: ModelConfig,
    backend: str,
) -> jax.Array:
    """Run each row through its (single) local expert; weights applied by the
    caller. Reuses the single-device strategies with a k=1 routing."""
    R = x.shape[0]
    El = w_gate_up.qdata.shape[0] if isinstance(w_gate_up, NF4Tensor) else w_gate_up.shape[0]
    routing = RouterOut(
        weights=jnp.ones((R, 1), jnp.float32), indices=expert_ids[:, None]
    )
    local_cfg = cfg  # num_experts only drives all_experts' one_hot width
    if backend.startswith("pallas") and isinstance(w_gate_up, NF4Tensor):
        from gpt_oss_vllm_tpu.ops.moe import glu_pair
        from gpt_oss_vllm_tpu.ops.moe_gmm import moe_gmm_block

        return moe_gmm_block(
            x,
            routing.weights,
            routing.indices,
            w_gate_up,
            b_gate_up,
            w_down,
            b_down,
            act_fn=functools.partial(expert_act, cfg=cfg),
            act_pair_fn=functools.partial(glu_pair, cfg=cfg),
            interpret=backend == "pallas_interpret",
        )
    if R < El:
        return moe_gather(x, routing, w_gate_up, b_gate_up, w_down, b_down, local_cfg, backend)
    import dataclasses

    local_cfg = dataclasses.replace(cfg, num_experts=El)
    return moe_all_experts(
        x, routing, w_gate_up, b_gate_up, w_down, b_down, local_cfg, backend
    )


def moe_block_ep(
    x: jax.Array,  # [T, H] tokens (any T; padded to the shard count inside)
    router_w: jax.Array,  # [E, H] f32, replicated
    router_b: Optional[jax.Array],
    w_gate_up,  # [E, 2FF, H] NF4Tensor or dense, expert-sharded over `axis`
    b_gate_up: Optional[jax.Array],
    w_down,  # [E, H, FF]
    b_down: Optional[jax.Array],
    cfg: ModelConfig,
    mesh: Mesh,
    axis=None,  # axis name or tuple; None = expert_shard_axes(mesh, E)
    capacity_factor: float = 0.0,  # <= 0 means LOSSLESS (factor = ep)
    backend: str = "xla",
) -> jax.Array:
    """EP MoE block over ``mesh[axis]``: all-to-all dispatch + return.

    Returns [T, H] with the same layout as ``x``. ``axis`` may be a tuple of
    mesh axes (the combined expert sharding of ``parallel.sharding`` — the
    all_to_all flattens them), so the ENGINE's expert-sharded params are
    consumed as-is with no resharding. This is the product path for
    ``ParallelConfig.moe_dispatch == 'a2a'`` (SURVEY.md §2.4: all-to-all
    token dispatch as the core of the multi-host config).
    """
    E = cfg.num_experts
    if axis is None:
        from gpt_oss_vllm_tpu.parallel.kernels import expert_shard_axes

        axis = expert_shard_axes(mesh, E)
        if not axis:
            raise ValueError(
                f"num_experts {E} not shardable over mesh {dict(mesh.shape)}"
            )
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    ep = 1
    for a in axes:
        ep *= mesh.shape[a]
    if E % ep:
        raise ValueError(f"num_experts {E} not divisible by ep {ep}")
    El = E // ep
    T0 = x.shape[0]
    pad = (-T0) % ep
    if pad:
        # zero rows route like real tokens (uniform logits) but their
        # outputs are sliced off below — exactness is unaffected
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    T = x.shape[0]
    k = cfg.experts_per_token
    P_local = (T // ep) * k
    if capacity_factor <= 0:
        capacity_factor = float(ep)  # every pair can go to one shard: lossless
    C = ep_capacity(P_local, ep, capacity_factor)

    def shard_fn(xl, rw, rb, wgu, bgu, wdn, bdn):
        Tl, H = xl.shape
        routing = route_topk(xl, rw, rb, k, fp32_logits=cfg.router_logits_fp32)
        flat_e = routing.indices.reshape(-1)  # [P] global expert ids
        flat_w = routing.weights.reshape(-1)  # [P]
        pair_tok = jnp.repeat(jnp.arange(Tl, dtype=jnp.int32), k)
        Pn = flat_e.shape[0]
        dest = flat_e // El  # destination shard
        local_e = flat_e % El  # expert id on that shard
        # stable per-destination rank -> capacity bucketing
        dest_oh = jax.nn.one_hot(dest, ep, dtype=jnp.int32)  # [P, ep]
        rank = jnp.take_along_axis(
            jnp.cumsum(dest_oh, axis=0), dest[:, None], axis=1
        )[:, 0] - 1
        keep = rank < C
        slot = jnp.where(keep, rank, C)  # C = spill row, sliced off below
        send_x = (
            jnp.zeros((ep, C + 1, H), xl.dtype).at[dest, slot].set(xl[pair_tok])
        )[:, :C]
        send_e = (
            jnp.zeros((ep, C + 1), jnp.int32).at[dest, slot].set(local_e)
        )[:, :C]
        # all-to-all: row block d goes to shard d; received row block s is
        # from shard s (XLA emits the ICI collective, SURVEY.md §2.3)
        recv_x = jax.lax.all_to_all(send_x, axes, 0, 0, tiled=False)
        recv_e = jax.lax.all_to_all(send_e, axes, 0, 0, tiled=False)
        y = _apply_local_experts(
            recv_x.reshape(ep * C, H),
            recv_e.reshape(ep * C),
            wgu, bgu, wdn, bdn, cfg, backend,
        ).reshape(ep, C, H)
        back = jax.lax.all_to_all(y.astype(jnp.float32), axes, 0, 0, tiled=False)
        # back[d, c] is the processed send[d, c]; gather each kept pair's row,
        # weight it, and segment-sum per local token
        flat_back = back.reshape(ep * C, H)
        pair_y = jnp.where(
            keep[:, None],
            jnp.take(flat_back, jnp.clip(dest * C + slot, 0, ep * C - 1), axis=0),
            0.0,
        )
        out = (
            jnp.zeros((Tl, H), jnp.float32)
            .at[pair_tok]
            .add(pair_y * flat_w[:, None])
        )
        return out.astype(xl.dtype)

    def wspec(w, parallel_dim=None):
        if isinstance(w, NF4Tensor):
            return NF4Tensor(
                qdata=P(axes, None, None),
                scales=P(axes, None, None),
                out_features=w.out_features,
                in_features=w.in_features,
                blocksize=w.blocksize,
                codebook=w.codebook,
                row_layout=w.row_layout,
            )
        return P(axes, None, None)

    def opt(v, spec):
        return spec if v is not None else None

    in_specs = (
        P(axes, None),  # x: token-sharded
        P(None, None),  # router_w replicated
        opt(router_b, P(None)),
        wspec(w_gate_up),
        opt(b_gate_up, P(axes, None)),
        wspec(w_down),
        opt(b_down, P(axes, None)),
    )
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(axes, None),
        check_vma=False,
    )
    out = fn(x, router_w, router_b, w_gate_up, b_gate_up, w_down, b_down)
    return out[:T0] if pad else out
