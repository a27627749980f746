"""Pallas flash-attention kernel for prefill: causal + sliding window + sinks.

The prefill-side counterpart of ``ops.paged_attention`` (SURVEY.md §2.3 rows
1-2): online-softmax tiling over the key dimension, with

- causal block skipping (key tiles entirely in the future are never read),
- sliding-window block skipping (key tiles entirely below the window are
  never read — long-context prefill on windowed layers is O(T * window)),
- the per-head sink logit folded into the softmax denominator at the end.

Matches ``ops.attention.mha_reference`` bit-for-bit-ish (f32 accumulation)
on overlapping inputs; that einsum path remains the oracle and the
small-shape fallback.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    lens_ref,  # [B] int32 scalar prefetch: per-row total context length
    qoff_ref,  # [B] int32 scalar prefetch: absolute position of q row 0
    q_ref,  # [1, 1, TQ, D]
    k_ref,  # [1, 1, TK, D]
    v_ref,  # [1, 1, TK, D]
    sink_ref,  # [1, G]
    o_ref,  # [1, 1, TQ, D]
    acc_ref,  # [TQ, D] f32 scratch
    m_ref,  # [TQ, 128] f32 scratch
    l_ref,  # [TQ, 128] f32 scratch
    *,
    tq: int,
    tk: int,
    window: Optional[int],
    sm_scale: float,
    use_sink: bool,
    g: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    iq = pl.program_id(2)
    jk = pl.program_id(3)
    nk = pl.num_programs(3)
    seq_len = lens_ref[b]

    # chunked prefill: this q tile's rows sit at ABSOLUTE positions
    # qoff + iq*tq + (0..tq-1) inside a context of length seq_len; keys are
    # the gathered logical context at positions 0..seq_len-1
    q_start = qoff_ref[b] + iq * tq
    k_start = jk * tk

    @pl.when(jk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # tile-level skip: strictly-future tiles and tiles fully below the window
    in_causal = k_start <= q_start + tq - 1
    if window is not None:
        in_window = k_start + tk - 1 >= q_start - (window - 1)
        live = jnp.logical_and(in_causal, in_window)
    else:
        live = in_causal

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32) * sm_scale  # [TQ, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [TK, D]
        v = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [TQ, TK]
        q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        valid = (k_pos <= q_pos) & (k_pos < seq_len) & (q_pos < seq_len)
        if window is not None:
            valid &= q_pos - k_pos < window
        s = jnp.where(valid, s, NEG_INF)
        m_prev = m_ref[:, :1]  # [TQ, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(jk == nk - 1)
    def _finalize():
        m = m_ref[:, :1]
        l = l_ref[:, :1]
        if use_sink:
            # whole [n_q, 1] table lives in SMEM (Mosaic rejects sub-blocked
            # SMEM specs); pick this grid step's head scalar
            sink = sink_ref[h, 0][None, None].astype(jnp.float32)
            m_new = jnp.maximum(m, sink)
            l = l * jnp.exp(m - m_new) + jnp.exp(sink - m_new)
            acc = acc_ref[:] * jnp.exp(m - m_new)
        else:
            acc = acc_ref[:]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0, 0] = (acc / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("window", "sm_scale", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jax.Array,  # [B, T, n_q, D]
    k: jax.Array,  # [B, S, n_kv, D]
    v: jax.Array,  # [B, S, n_kv, D]
    lens: jax.Array,  # [B] int32 TOTAL context length (keys 0..len-1 valid)
    sinks: Optional[jax.Array] = None,  # [n_q]
    window: Optional[int] = None,
    sm_scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    q_offsets: Optional[jax.Array] = None,  # [B] absolute position of q[:, 0]
    interpret: bool = False,
) -> jax.Array:
    """q_offsets enables CHUNKED prefill: the T query rows of row b sit at
    absolute positions q_offsets[b]..q_offsets[b]+T-1 of a context of
    lens[b] keys (the engine's unified-step contract, engine/step.py). The
    default (None -> 0) is classic full-sequence prefill where lens is also
    the q length."""
    B, T, n_q, D = q.shape
    S, n_kv = k.shape[1], k.shape[2]
    G = n_q // n_kv
    if sm_scale is None:
        sm_scale = D**-0.5
    tq = min(block_q, T)
    tk = min(block_k, S)
    if T % tq != 0 or S % tk != 0:
        # pad to tile multiples; masking handles the tail
        Tp = -(-T // tq) * tq
        Sp = -(-S // tk) * tk
        q = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
    Tp, Sp = q.shape[1], k.shape[1]
    use_sink = sinks is not None
    sinks_h = (
        sinks.reshape(n_q, 1).astype(jnp.float32)
        if use_sink
        else jnp.zeros((n_q, 1), jnp.float32)
    )
    # layout: [B, H, T, D]
    qh = q.transpose(0, 2, 1, 3)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)

    grid = (B, n_q, Tp // tq, Sp // tk)
    kernel = functools.partial(
        _flash_kernel,
        tq=tq,
        tk=tk,
        window=window,
        sm_scale=sm_scale,
        use_sink=use_sink,
        g=G,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tq, D), lambda b, h, i, j, *_: (b, h, i, 0), memory_space=pltpu.VMEM),
            # GQA: q head h reads kv head h // G — no expansion, the index map
            # does the grouping
            pl.BlockSpec((1, 1, tk, D), lambda b, h, i, j, *_: (b, h // G, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, D), lambda b, h, i, j, *_: (b, h // G, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_q, 1), lambda b, h, i, j, *_: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tq, D), lambda b, h, i, j, *_: (b, h, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tq, D), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
        ],
    )
    qoff = (
        jnp.zeros((B,), jnp.int32)
        if q_offsets is None
        else q_offsets.astype(jnp.int32)
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_q, Tp, D), q.dtype),
        interpret=interpret,
    )(lens.astype(jnp.int32), qoff, qh, kh, vh, sinks_h)
    return out.transpose(0, 2, 1, 3)[:, :T]
