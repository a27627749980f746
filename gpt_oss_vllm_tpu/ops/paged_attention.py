"""Pallas paged-attention decode kernel (sinks + sliding window native).

TPU-native replacement for vLLM's paged-attention CUDA kernels (SURVEY.md
§2.3): K/V pages stay in HBM; each grid program (one sequence x one kv-head
GROUP) walks its block table with double-buffered DMAs and an online-softmax
accumulator. Attention sinks enter as a denominator correction
(exp(sink - m) — see ``ops.attention``), and sliding-window layers skip
whole pages below the window start, so windowed layers read O(window) KV
regardless of context length — the feature the reference had to disable on
its hardware (``patch_3_disable_sinks.py``).

Head pairing: the cache is stored FLAT over (head, dim) — [NB, BS, KV*D] —
because a trailing D=64 would lane-pad 2x in HBM (see engine.kv_cache).
Mosaic requires HBM DMA slices lane-aligned to 128, so a single D=64 head
cannot be sliced out. Each program therefore owns HP = 128//D heads (an
aligned 128-lane band) and computes them in ONE matmul via block-diagonal
queries: q2[i*G + g, i*D:(i+1)*D] = q[head i, g]; zero padding kills the
cross-head terms in q2 @ k2^T. The p2 @ v2 product fills all HP bands per
row; the caller extracts each row-block's own band (cheap XLA gather).
MXU cost is identical — sub-128-lane matmuls pad to 128 anyway.

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
    q_ref,  # [1, 1, HP*G, HP*D] VMEM (block-diagonal over the head pair)
    sink_ref,  # [KVH, HP*G] f32 VMEM (full array; tiny)
    k_hbm,  # [NB, BS, KV*D] HBM (flat head-dim layout, see engine.kv_cache)
    v_hbm,  # [NB, BS, KV*D] HBM
    # output
    o_ref,  # [1, 1, HP*G, HP*D] VMEM
    # scratch
    k_buf,  # [NBUF, PP*BS, HP*D]
    v_buf,  # [NBUF, PP*BS, HP*D]
    sem,  # DMA semaphores [NBUF, 2, PP]
    *,
    bs: int,
    window: Optional[int],
    sm_scale: float,
    use_sink: bool,
    band: int,  # HP*D — the aligned lane band DMA'd per program
    nbuf: int,  # DMA ring depth (chunks in flight)
    pp: int,  # pages per chunk: a single page is a ~4 KB transfer and a
    #           [R, BS] score tile — far too little work per loop iteration
    #           (the walk becomes per-op-overhead-bound at long context).
    #           Chunking PP pages amortizes both; their token positions are
    #           contiguous, so masking stays a single iota window.
):
    b = pl.program_id(0)
    h = pl.program_id(1)  # kv-head-group index
    MB = block_tables_ref.shape[1]
    q_pos = q_pos_ref[b]
    ctx_len = q_pos + 1
    n_pages = jnp.where(ctx_len > 0, pl.cdiv(ctx_len, bs), 0)
    if window is not None:
        first_chunk = (jnp.maximum(q_pos - (window - 1), 0) // bs) // pp
    else:
        first_chunk = jnp.int32(0)
    n_chunks = pl.cdiv(n_pages, pp)

    q = q_ref[0, 0].astype(jnp.float32) * sm_scale  # [HP*G, HP*D]
    R = q.shape[0]

    def chunk_dma(slot, chunk_idx):
        hd = pl.multiple_of(h * band, band)
        copies = []
        for j in range(pp):
            # pages past the end re-read a clamped block; the causal mask
            # (k_pos <= q_pos) kills their scores
            page = jnp.minimum(chunk_idx * pp + j, MB - 1)
            blk = block_tables_ref[b, page]
            row0 = pl.multiple_of(j * bs, bs)
            copies.append(pltpu.make_async_copy(
                k_hbm.at[blk, :, pl.ds(hd, band)],
                k_buf.at[slot, pl.ds(row0, bs)], sem.at[slot, 0, j],
            ))
            copies.append(pltpu.make_async_copy(
                v_hbm.at[blk, :, pl.ds(hd, band)],
                v_buf.at[slot, pl.ds(row0, bs)], sem.at[slot, 1, j],
            ))
        return copies

    @pl.when(n_chunks > first_chunk)
    def _run():
        # prologue: fill the ring
        for j in range(nbuf - 1):
            @pl.when(first_chunk + j < n_chunks)
            def _(j=j):
                for d in chunk_dma(j, first_chunk + j):
                    d.start()

        def body(c, carry):
            acc, m, l = carry  # [R, HP*D], [R, 1], [R, 1]
            slot = jax.lax.rem(c - first_chunk, nbuf)
            nxt = jax.lax.rem(c - first_chunk + nbuf - 1, nbuf)

            @pl.when(c + nbuf - 1 < n_chunks)
            def _():
                for d in chunk_dma(nxt, c + nbuf - 1):
                    d.start()

            for d in chunk_dma(slot, c):
                d.wait()
            k = k_buf[slot].astype(jnp.float32)  # [PP*BS, HP*D]
            v = v_buf[slot].astype(jnp.float32)
            # block-diagonal q zeros the cross-head lane bands, so this one
            # matmul scores all HP heads at once
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [R, PP*BS]
            W = pp * bs
            k_pos = c * W + jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
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

        D2 = q.shape[1]
        acc0 = jnp.zeros((R, D2), jnp.float32)
        m0 = jnp.full((R, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((R, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(first_chunk, n_chunks, body, (acc0, m0, l0))
        if use_sink:
            sink = sink_ref[h][:, None].astype(jnp.float32)  # [R, 1]
            m_new = jnp.maximum(m, sink)
            l = l * jnp.exp(m - m_new) + jnp.exp(sink - m_new)
            acc = acc * jnp.exp(m - m_new)
        o_ref[0, 0] = (acc / l).astype(o_ref.dtype)

    @pl.when(jnp.logical_not(n_chunks > first_chunk))
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
    NBUF = 4  # DMA ring depth in chunks (see _decode_kernel)
    PP = 4  # pages per chunk
    KV = KVD // D
    G = n_q // KV
    if sm_scale is None:
        sm_scale = D**-0.5
    use_sink = use_sink and sinks is not None
    # heads per program: an aligned 128-lane band of the flat cache
    HP = max(1, 128 // D)
    if 128 % D != 0 or KV % HP != 0:
        HP = KV  # single group covering the whole flat page width
    KVH = KV // HP
    R = HP * G
    band = HP * D
    # Mosaic DMA slices of the HBM cache must be 128-lane tile-aligned. A
    # band below/off 128 (tiny/test shape classes only — production GPT-OSS
    # pages are KV*D = 512) gets zero-padded lanes; the pad contributes 0 to
    # q2 @ k2^T and is sliced off the output. Only the single-group fallback
    # can be unaligned, so offsets (h * band_phys) stay trivially aligned.
    lane_pad = (-band) % 128
    band_phys = band + lane_pad
    if lane_pad:
        assert KVH == 1, (KV, HP, D)
        pad_w = ((0, 0), (0, 0), (0, lane_pad))
        k_cache = jnp.pad(k_cache, pad_w)
        v_cache = jnp.pad(v_cache, pad_w)

    # block-diagonal queries: q2[b, hh, i*G + g, i*D:(i+1)*D] = q[head, g]
    q4 = q.reshape(B, KVH, HP, G, D)
    eye = jnp.eye(HP, dtype=q.dtype)  # [i, j]
    q2 = jnp.einsum("bhigd,ij->bhigjd", q4, eye).reshape(B, KVH, R, band)
    if lane_pad:
        q2 = jnp.pad(q2, ((0, 0), (0, 0), (0, 0), (0, lane_pad)))

    if sinks is None:
        sinks_g = jnp.zeros((KVH, R), jnp.float32)
    else:
        sinks_g = sinks.reshape(KVH, R).astype(jnp.float32)
    # clamp negative table entries to 0 (inactive rows produce zeros anyway)
    bt = jnp.maximum(block_tables, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KVH),
        in_specs=[
            pl.BlockSpec((1, 1, R, band_phys), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KVH, R), lambda b, h, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, R, band_phys), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF, PP * BS, band_phys), k_cache.dtype),
            pltpu.VMEM((NBUF, PP * BS, band_phys), v_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF, 2, PP)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        bs=BS,
        window=window,
        sm_scale=sm_scale,
        use_sink=use_sink,
        band=band_phys,
        nbuf=NBUF,
        pp=PP,
    )
    out2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, R, band_phys), q.dtype),
        interpret=interpret,
    )(bt, q_positions, q2, sinks_g, k_cache, v_cache)
    # each row-block i keeps only its own lane band i
    out4 = out2[..., :band].reshape(B, KVH, HP, G, HP, D)
    out = jnp.einsum("bhigjd,ij->bhigd", out4, eye.astype(out4.dtype))
    return out.reshape(B, n_q, D)
