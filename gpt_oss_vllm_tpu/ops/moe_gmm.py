"""Ragged grouped-expert matmul with fused NF4 dequant (megablocks-style gmm).

The production decode MoE path (SURVEY.md §2.3 "Pallas grouped/ragged expert
matmul fused with NF4 dequant; top-k dispatch via sort/segment ops"):

1. in-graph: sort the T*k (token, expert) pairs by expert, compute group
   offsets (tiny device ops — no host round-trip, decode stays a pure device
   chain);
2. kernel: each program DMAs its expert's packed weight tile straight from
   the full [E, out, in/2] HBM array (scalar-prefetched expert id — no
   gathered weight copies), dequants in-register, and matmuls against that
   group's token rows.

HBM traffic = bytes of the *distinct activated experts* only — the decode
optimum — and empty groups/chunks skip their DMAs entirely.

Grid order is (out-tile, group, chunk) with the output block index ignoring
(group, chunk): consecutive grid steps revisit the same resident VMEM output
block, the supported accumulation pattern.

Sized for decode (T*k up to ~1k pairs; x must fit VMEM). Prefill uses the
dense all-experts/einsum path where compute amortizes anyway.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpt_oss_vllm_tpu.ops.nf4_matmul import _lut_nf4
from gpt_oss_vllm_tpu.quant.tensor import NF4Tensor


class Grouping(NamedTuple):
    sorted_pair_to_row: jax.Array  # [P] int32: pair index sorted by expert
    group_expert: jax.Array  # [E] int32 expert id (-1 = empty group)
    group_start: jax.Array  # [E] int32 offset into sorted pairs
    group_size: jax.Array  # [E] int32


def build_grouping(expert_ids: jax.Array, num_experts: int) -> Grouping:
    """Sort T*k routed pairs by expert; one (possibly empty) group per expert."""
    order = jnp.argsort(expert_ids).astype(jnp.int32)
    sorted_ids = jnp.take(expert_ids, order)
    counts = jnp.zeros(num_experts, jnp.int32).at[sorted_ids].add(1)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    experts = jnp.where(counts > 0, jnp.arange(num_experts, dtype=jnp.int32), -1)
    return Grouping(order, experts, starts, counts)


def _gmm_kernel(
    # scalar prefetch
    expert_ref,  # [E] int32
    start_ref,  # [E]
    size_ref,  # [E]
    # tensors
    xe_ref,  # [P_pad, K//2] VMEM (even columns of sorted tokens)
    xo_ref,  # [P_pad, K//2] VMEM (odd columns)
    q_hbm,  # [E, N, K//2] HBM
    s_hbm,  # [E, nb, N] HBM
    o_ref,  # [P_pad, TN] VMEM (resident out-tile)
    # scratch
    q_buf,  # [TN, K//2]
    s_buf,  # [nb, TN]
    sems,
    *,
    tn: int,
    kp: int,
    nb: int,
    block_j: int,
    tm: int,
):
    jn = pl.program_id(0)
    g = pl.program_id(1)
    s = pl.program_id(2)
    e = expert_ref[g]
    size = size_ref[g]
    chunk_rows = size - s * tm  # rows this chunk still owns

    @pl.when(jnp.logical_and(g == 0, s == 0))
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(chunk_rows > 0)
    def _work():
        qd = pltpu.make_async_copy(q_hbm.at[e, pl.ds(jn * tn, tn), :], q_buf, sems.at[0])
        sd = pltpu.make_async_copy(s_hbm.at[e, :, pl.ds(jn * tn, tn)], s_buf, sems.at[1])
        qd.start()
        sd.start()
        qd.wait()
        sd.wait()
        q = q_buf[:].astype(jnp.int32)
        low = q & 0x0F
        high = (q >> 4) & 0x0F
        col_block = jax.lax.broadcasted_iota(jnp.int32, (nb, kp), 1) // block_j
        row_block = jax.lax.broadcasted_iota(jnp.int32, (nb, kp), 0)
        expand = (col_block == row_block).astype(jnp.float32)
        scales = jax.lax.dot_general(
            s_buf[:].astype(jnp.float32), expand, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, Kp]
        we = (_lut_nf4(low) * scales).astype(xe_ref.dtype)
        wo = (_lut_nf4(high) * scales).astype(xe_ref.dtype)
        row0 = start_ref[g] + s * tm
        xe = xe_ref[pl.ds(row0, tm), :]
        xo = xo_ref[pl.ds(row0, tm), :]
        acc = jax.lax.dot_general(
            xe, we, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc += jax.lax.dot_general(
            xo, wo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        rows = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
        valid = rows < chunk_rows
        cur = o_ref[pl.ds(row0, tm), :]
        o_ref[pl.ds(row0, tm), :] = jnp.where(valid, acc, cur)


def moe_gmm_nf4(
    xe_sorted: jax.Array,  # [P_pad, K//2]
    xo_sorted: jax.Array,  # [P_pad, K//2]
    w: NF4Tensor,  # [E, N, K] packed
    grouping: Grouping,
    tm: int,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    P_pad, Kp = xe_sorted.shape
    K = Kp * 2
    E, N = w.qdata.shape[0], w.out_features
    nb = K // w.blocksize
    G = grouping.group_expert.shape[0]
    tn = min(block_n, N)
    assert N % tn == 0, (N, tn)
    n_chunks = max(1, -(-(P_pad - tm) // tm)) if tm < P_pad else 1
    grid = (N // tn, G, n_chunks)
    kernel = functools.partial(_gmm_kernel, tn=tn, kp=Kp, nb=nb, block_j=Kp // nb, tm=tm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (P_pad, tn), lambda j, g, s, *_: (0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tn, Kp), w.qdata.dtype),
            pltpu.VMEM((nb, tn), w.scales.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P_pad, N), jnp.float32),
        interpret=interpret,
    )(
        grouping.group_expert,
        grouping.group_start,
        grouping.group_size,
        xe_sorted,
        xo_sorted,
        w.qdata,
        w.scales,
    )


def _deinterleave(x: jax.Array):
    xp = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    return xp[..., 0], xp[..., 1]


def moe_gmm_block(
    x: jax.Array,  # [T, H]
    routing_weights: jax.Array,  # [T, k] f32
    routing_indices: jax.Array,  # [T, k] int32
    w_gate_up: NF4Tensor,  # [E, 2FF, H]
    b_gate_up: Optional[jax.Array],
    w_down: NF4Tensor,  # [E, H, FF]
    b_down: Optional[jax.Array],
    act_fn,
    tm: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Full MoE block through the gmm kernel: dispatch -> gate_up -> act ->
    down -> weighted combine, all in-graph."""
    T, H = x.shape
    k = routing_indices.shape[1]
    E = w_gate_up.qdata.shape[0]
    P = T * k
    tm = min(tm, P)
    flat_ids = routing_indices.reshape(-1)
    grouping = build_grouping(flat_ids, E)
    token_of_pair = jnp.take(
        jnp.repeat(jnp.arange(T, dtype=jnp.int32), k), grouping.sorted_pair_to_row
    )
    sorted_experts = jnp.take(flat_ids, grouping.sorted_pair_to_row)
    P_pad = P + tm  # window overrun room
    x_sorted = jnp.zeros((P_pad, H), x.dtype).at[:P].set(jnp.take(x, token_of_pair, axis=0))
    xe, xo = _deinterleave(x_sorted)

    h = moe_gmm_nf4(xe, xo, w_gate_up, grouping, tm, interpret=interpret)[:P]
    if b_gate_up is not None:
        h = h + jnp.take(b_gate_up, sorted_experts, axis=0)
    a = act_fn(h).astype(x.dtype)
    a_pad = jnp.zeros((P_pad, a.shape[-1]), x.dtype).at[:P].set(a)
    ae, ao = _deinterleave(a_pad)
    y = moe_gmm_nf4(ae, ao, w_down, grouping, tm, interpret=interpret)[:P]
    if b_down is not None:
        y = y + jnp.take(b_down, sorted_experts, axis=0)
    wts = jnp.take(routing_weights.reshape(-1), grouping.sorted_pair_to_row)
    y = y * wts[:, None]
    return jnp.zeros((T, H), jnp.float32).at[token_of_pair].add(y).astype(x.dtype)
