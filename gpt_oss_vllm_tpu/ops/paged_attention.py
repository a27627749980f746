"""Pallas paged-attention decode kernel (sinks + sliding window native).

TPU-native replacement for vLLM's paged-attention CUDA kernels (SURVEY.md
§2.3): K/V pages stay in HBM; each grid program (one sequence x one kv head)
walks its block table with double-buffered DMAs and an online-softmax
accumulator. Attention sinks enter as a denominator correction
(exp(sink - m) — see ``ops.attention``), and sliding-window layers skip
whole pages below the window start, so windowed layers read O(window) KV
regardless of context length — the feature the reference had to disable on
its hardware (``patch_3_disable_sinks.py``).

The XLA gather path in ``engine.step`` is the semantics oracle; this kernel
must match it on overlapping inputs (see tests/test_paged_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, MB] int32
    q_pos_ref,  # [B] int32 (query position; ctx_len - 1; -1 = inactive row)
    # inputs
    q_ref,  # [1, 1, G, D] VMEM (this seq, this kv head)
    sink_ref,  # [KV, G] f32 VMEM (full array — a (1, G) block would violate
    #            Mosaic's sublane-divisibility rule at KV=8, G=8; it is tiny)
    k_hbm,  # [NB, BS, KV*D] HBM (flat head-dim layout, see engine.kv_cache)
    v_hbm,  # [NB, BS, KV*D] HBM
    # output
    o_ref,  # [1, 1, G, D] VMEM
    # scratch
    k_buf,  # [2, BS, D]
    v_buf,  # [2, BS, D]
    sem,  # DMA semaphores [2, 2]
    *,
    bs: int,
    max_blocks: int,
    window: Optional[int],
    sm_scale: float,
    use_sink: bool,
    head_dim: int,
):
    D = head_dim
    b = pl.program_id(0)
    h = pl.program_id(1)
    q_pos = q_pos_ref[b]
    ctx_len = q_pos + 1
    n_pages = jnp.where(ctx_len > 0, pl.cdiv(ctx_len, bs), 0)
    if window is not None:
        first_page = jnp.maximum(q_pos - (window - 1), 0) // bs
    else:
        first_page = jnp.int32(0)

    q = q_ref[0, 0].astype(jnp.float32) * sm_scale  # [G, D]
    G = q.shape[0]

    def page_dma(slot, page_idx):
        blk = block_tables_ref[b, page_idx]
        hd = pl.multiple_of(h * D, D)
        kd = pltpu.make_async_copy(
            k_hbm.at[blk, :, pl.ds(hd, D)], k_buf.at[slot], sem.at[slot, 0]
        )
        vd = pltpu.make_async_copy(
            v_hbm.at[blk, :, pl.ds(hd, D)], v_buf.at[slot], sem.at[slot, 1]
        )
        return kd, vd

    @pl.when(n_pages > first_page)
    def _run():
        for d in page_dma(0, first_page):
            d.start()

        def body(p, carry):
            acc, m, l = carry  # [G, D], [G, 1], [G, 1]
            slot = jax.lax.rem(p - first_page, 2)
            nxt = jax.lax.rem(p - first_page + 1, 2)

            @pl.when(p + 1 < n_pages)
            def _():
                for d in page_dma(nxt, p + 1):
                    d.start()

            for d in page_dma(slot, p):
                d.wait()
            k = k_buf[slot].astype(jnp.float32)  # [BS, D]
            v = v_buf[slot].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [G, BS]
            k_pos = p * bs + jax.lax.broadcasted_iota(jnp.int32, (G, bs), 1)
            valid = k_pos <= q_pos
            if window is not None:
                valid &= q_pos - k_pos < window
            s = jnp.where(valid, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p_ = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p_, axis=1, keepdims=True)
            acc_new = acc * alpha + jax.lax.dot_general(
                p_, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return acc_new, m_new, l_new

        acc0 = jnp.zeros((G, D), jnp.float32)
        m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((G, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(first_page, n_pages, body, (acc0, m0, l0))
        if use_sink:
            sink = sink_ref[h][:, None].astype(jnp.float32)  # [G, 1]
            m_new = jnp.maximum(m, sink)
            l = l * jnp.exp(m - m_new) + jnp.exp(sink - m_new)
            acc = acc * jnp.exp(m - m_new)
        o_ref[0, 0] = (acc / l).astype(o_ref.dtype)

    @pl.when(jnp.logical_not(n_pages > first_page))
    def _empty():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])


@functools.partial(
    jax.jit,
    static_argnames=("window", "sm_scale", "use_sink", "interpret"),
)
def paged_attention_decode(
    q: jax.Array,  # [B, n_q, D]
    k_cache: jax.Array,  # [NB, BS, KV*D] (flat head-dim layout)
    v_cache: jax.Array,  # [NB, BS, KV*D]
    block_tables: jax.Array,  # [B, MB] int32
    q_positions: jax.Array,  # [B] int32 (ctx_len - 1; negative = inactive)
    sinks: Optional[jax.Array] = None,  # [n_q] f32
    window: Optional[int] = None,
    sm_scale: Optional[float] = None,
    use_sink: bool = True,
    interpret: bool = False,
) -> jax.Array:
    B, n_q, D = q.shape
    NB, BS, KVD = k_cache.shape
    KV = KVD // D
    MB = block_tables.shape[1]
    G = n_q // KV
    if sm_scale is None:
        sm_scale = D**-0.5
    use_sink = use_sink and sinks is not None
    qg = q.reshape(B, KV, G, D)
    if sinks is None:
        sinks_g = jnp.zeros((KV, G), jnp.float32)
    else:
        sinks_g = sinks.reshape(KV, G).astype(jnp.float32)
    # clamp negative table entries to 0 (inactive rows produce zeros anyway)
    bt = jnp.maximum(block_tables, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KV),
        in_specs=[
            pl.BlockSpec((1, 1, G, D), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KV, G), lambda b, h, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G, D), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BS, D), jnp.float32 if k_cache.dtype == jnp.float32 else k_cache.dtype),
            pltpu.VMEM((2, BS, D), jnp.float32 if v_cache.dtype == jnp.float32 else v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        bs=BS,
        max_blocks=MB,
        window=window,
        sm_scale=sm_scale,
        use_sink=use_sink,
        head_dim=D,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        interpret=interpret,
    )(bt, q_positions, qg, sinks_g, k_cache, v_cache)
    return out.reshape(B, n_q, D)
