"""Mesh-capable Pallas kernel wrappers (shard_map).

``pallas_call`` is not GSPMD-partitionable, so under a mesh the engine used
to fall back to XLA gather attention and GSPMD MoE — correct but slow: the
sharded KV cache / packed expert weights get all-gathered to every shard.
These wrappers run the SAME kernels per shard on the local slice instead
(the multi-chip execution the NCCL row of SURVEY.md §2.3 promises, with XLA
collectives for the combines):

- paged attention: KV cache stays sharded over kv heads ('model'); each
  shard runs the decode kernel on its local head band. No collectives at
  all — attention is embarrassingly head-parallel.
- MoE gmm: packed expert weights stay sharded over the COMBINED
  ('expert','model') axes (experts are ~95%% of GPT-OSS bytes, so expert
  rows are the memory-scaling dimension); every shard routes identically on
  the replicated tokens, masks the pairs whose expert lives elsewhere
  (weight -> 0), runs the local fused-dequant gmm kernel, and a psum
  combines. For decode-sized token counts this replicated-compute form
  beats all-to-all dispatch (activations are tiny next to expert bytes);
  large-batch EP dispatch stays in ``ops.moe_ep``.

Masked pairs still occupy grid slots: their local expert id is clamped to
the smallest LOCAL id among kept pairs, so they merge into an already-loaded
group (the gmm pipeline elides repeated-id DMAs) and cost no extra HBM
traffic; their zero routing weight makes the combine exact.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gpt_oss_vllm_tpu.config import ModelConfig
from gpt_oss_vllm_tpu.quant.tensor import NF4Tensor


def expert_shard_axes(mesh: Mesh, num_experts: int) -> Tuple[str, ...]:
    """Mesh axes the expert dim shards over: ('expert','model') combined when
    the expert count divides their product, else 'expert' alone."""
    axes = tuple(a for a in ("expert", "model") if a in mesh.shape)
    if not axes:
        return ()
    prod = 1
    for a in axes:
        prod *= mesh.shape[a]
    if num_experts % prod == 0:
        return axes
    if "expert" in axes and num_experts % mesh.shape["expert"] == 0:
        return ("expert",)
    return ()


def paged_attention_decode_sharded(
    q: jax.Array,  # [B, n_q, D]
    k_cache: jax.Array,  # [NB, BS, KV*D], sharded over last dim ('model')
    v_cache: jax.Array,
    block_tables: jax.Array,  # [B, MB]
    q_positions: jax.Array,  # [B]
    mesh: Mesh,
    sinks: Optional[jax.Array] = None,  # [n_q]
    window: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Per-shard paged-attention decode on the local kv-head band.

    Heads shard contiguously over 'model', which preserves the GQA grouping
    (q head h reads kv head h // (n_q/KV)) whenever tp divides num_kv_heads
    — the same head alignment `parallel.sharding` imposes on wq/wk/wv.
    """
    from gpt_oss_vllm_tpu.ops.paged_attention import paged_attention_decode

    have_sinks = sinks is not None

    def shard_fn(ql, kl, vl, bt, pos, *sk):
        return paged_attention_decode(
            ql, kl, vl, bt, pos,
            sinks=sk[0] if have_sinks else None,
            window=window, interpret=interpret,
        )

    in_specs = [
        P(None, "model", None),  # q heads
        P(None, None, "model"),  # flat (head, dim) cache band
        P(None, None, "model"),
        P(None, None),
        P(None),
    ]
    args = [q, k_cache, v_cache, block_tables, q_positions]
    if have_sinks:
        in_specs.append(P("model"))
        args.append(sinks)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, "model", None),
        check_vma=False,
    )
    return fn(*args)


def flash_attention_prefill_sharded(
    q: jax.Array,  # [B, T, n_q, D]
    k_ctx: jax.Array,  # [B, S, KV, D] gathered logical context, head-sharded
    v_ctx: jax.Array,
    lens: jax.Array,  # [B] total context length
    q_offsets: jax.Array,  # [B] absolute position of q[:, 0]
    mesh: Mesh,
    sinks: Optional[jax.Array] = None,  # [n_q]
    window: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Per-shard flash prefill on the local head band (STATUS r2 known-gap:
    prefill under a mesh used to fall back to the XLA gather-einsum path).

    Heads shard contiguously over 'model' exactly like the decode kernel
    above, so the GQA grouping (q head h reads kv head h // G) survives the
    split whenever tp divides num_kv_heads. No collectives — prefill
    attention is head-parallel; the surrounding o-proj matmul reduces over
    the sharded head dim via GSPMD as before.
    """
    from gpt_oss_vllm_tpu.ops.flash_attention import flash_attention

    have_sinks = sinks is not None

    def shard_fn(ql, kl, vl, ln, qo, *sk):
        return flash_attention(
            ql, kl, vl, ln,
            sinks=sk[0] if have_sinks else None,
            window=window, q_offsets=qo, interpret=interpret,
        )

    in_specs = [
        P(None, None, "model", None),  # q heads
        P(None, None, "model", None),  # kv heads
        P(None, None, "model", None),
        P(None),
        P(None),
    ]
    args = [q, k_ctx, v_ctx, lens, q_offsets]
    if have_sinks:
        in_specs.append(P("model"))
        args.append(sinks)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, None, "model", None),
        check_vma=False,
    )
    return fn(*args)


def moe_block_gmm_sharded(
    x: jax.Array,  # [T, H] (replicated — decode-sized token counts)
    router_w: jax.Array,
    router_b: Optional[jax.Array],
    w_gate_up: NF4Tensor,  # [E, 2FF, H] packed, expert-sharded on dim 0
    b_gate_up: Optional[jax.Array],
    w_down: NF4Tensor,  # [E, H, FF]
    b_down: Optional[jax.Array],
    cfg: ModelConfig,
    mesh: Mesh,
    interpret: bool = False,
) -> jax.Array:
    """MoE block with the fused-dequant gmm kernel running per expert shard.

    Same MoE math as ``ops.moe.moe_block`` (reference semantics,
    ``unsloth_to_vllm_converter.py:282-325``); exact vs the single-device
    oracle because masked pairs carry zero routing weight into the psum.
    """
    from gpt_oss_vllm_tpu.ops.moe import expert_act, glu_pair, route_topk
    from gpt_oss_vllm_tpu.ops.moe_gmm import moe_gmm_block

    axes = expert_shard_axes(mesh, cfg.num_experts)
    if not axes:
        raise ValueError(
            f"num_experts {cfg.num_experts} not shardable over mesh {dict(mesh.shape)}"
        )
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    El = cfg.num_experts // n_shards
    k = cfg.experts_per_token

    def shard_fn(xl, rw, rb, wgu, bgu, wdn, bdn):
        routing = route_topk(xl, rw, rb, k, fp32_logits=cfg.router_logits_fp32)
        # combined shard index, major-to-minor per the PartitionSpec tuple
        idx = jnp.int32(0)
        for a in axes:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        lo = idx * El
        g = routing.indices  # [T, k] global expert ids (identical per shard)
        keep = (g >= lo) & (g < lo + El)
        lid = g - lo
        # clamp off-shard pairs onto the smallest kept LOCAL id so they join
        # an already-resident group (no extra weight DMA); El-1 if none kept
        fill = jnp.min(jnp.where(keep, lid, El - 1))
        local_idx = jnp.where(keep, lid, fill).astype(jnp.int32)
        w = routing.weights * keep.astype(routing.weights.dtype)
        y = moe_gmm_block(
            xl,
            w,
            local_idx,
            wgu,
            bgu,
            wdn,
            bdn,
            act_fn=functools.partial(expert_act, cfg=cfg),
            act_pair_fn=functools.partial(glu_pair, cfg=cfg),
            interpret=interpret,
        )
        return jax.lax.psum(y.astype(jnp.float32), axes).astype(xl.dtype)

    def wspec(wt: NF4Tensor):
        return NF4Tensor(
            qdata=P(axes, None, None),
            scales=P(axes, None, None),
            out_features=wt.out_features,
            in_features=wt.in_features,
            blocksize=wt.blocksize,
            codebook=wt.codebook,
            row_layout=wt.row_layout,
        )

    def opt(v, spec):
        return spec if v is not None else None

    in_specs = (
        P(None, None),  # x replicated
        P(None, None),  # router_w
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
        out_specs=P(None, None),
        check_vma=False,
    )
    return fn(x, router_w, router_b, w_gate_up, b_gate_up, w_down, b_down)
