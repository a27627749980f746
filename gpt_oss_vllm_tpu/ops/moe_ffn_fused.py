"""Fully-fused MoE FFN decode kernel: gate_up -> GLU -> down -> combine in
ONE Pallas program per layer.

At batch-1 decode the MoE block is op-overhead-bound, not FLOP-bound: the
two-kernel gmm path (ops.moe_gmm) plus its XLA dispatch glue costs ~0.15
ms/layer beyond the weight reads (tools/decomp_bench.py). This kernel removes
the glue entirely — the reference's per-expert Python loop semantics
(``unsloth_to_vllm_converter.py:282-325``) become a single 2-phase grid:

  grid = (k selected experts, 4 gate_up sections + N_down tiles)
    phase 1 (j < 4): one grid step per glu4 SECTION of the expert's gate_up
      weight — fused 4-bit dequant matmul, + bias, section -> VMEM scratch.
    phase boundary (j == 4): GLU on the aligned section pairs; the even/odd
      activation planes land in scratch ALREADY matching the down weight's
      packed-byte subspaces (that alignment is the point of the glu4 layout,
      quant.tensor.section_glu4).
    phase 2 (j >= 4): down out-row tiles — fused dequant matmul against the
      scratch activation planes, scaled by this expert's routing weight and
      accumulated straight into the resident output block.

Weights stream from HBM exactly once per activated expert (the decode
optimum); x, activations, and the output never leave VMEM.

Requires ``w_gate_up.row_layout == "glu4"``; ``w_down`` stays in the standard
flat/interleaved layout. T=1 only (top-k indices are distinct, so groups are
static singletons); batched decode and prefill use ops.moe_gmm.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpt_oss_vllm_tpu.ops.nf4_matmul import _lut, _scales_f32, _scales_mm_dtype
from gpt_oss_vllm_tpu.quant.tensor import NF4Tensor, ensure_kernel_padded, kernel_out_tile


def _ffn_kernel(
    # scalar prefetch
    ids_ref,  # [k] int32 selected expert ids (distinct by top-k construction)
    # inputs
    xe_ref,  # [8, kp_h] x even columns (broadcast rows)
    xo_ref,  # [8, kp_h]
    rw_ref,  # [1, k] f32 routing weights (SMEM)
    gu_q_ref,  # (1, sec, kp_h) u8 — one glu4 section of the expert's gate_up
    gu_s_ref,  # (1, nb_h, sec)
    d_q_ref,  # (1, tn2, kp_f) u8 — one out-row tile of the expert's down
    d_s_ref,  # (1, nb_f, tn2) — or (1, nb_f, Nd) when full_scales
    *refs,  # [b_gu_ref?], o_ref, h_scratch, a_scratch
    sec: int,
    kp_h: int,
    kp_f: int,
    nb_h: int,
    nb_f: int,
    tn1: int,
    tn2: int,
    n_down: int,
    has_bias: bool,
    full_scales: bool,
    codebook: str,
    act_pair,
):
    if has_bias:
        b_gu_ref, o_ref, h_scratch, a_scratch = refs
    else:
        b_gu_ref, (o_ref, h_scratch, a_scratch) = None, refs
    g = pl.program_id(0)
    j = pl.program_id(1)
    per = sec // tn1  # phase-1 sub-tiles per glu4 section
    nq1 = 4 * per

    def dequant(q_ref, s_ref, kp, nb, tile_cols, scale_sel_tile):
        q = q_ref[0].astype(jnp.int32)
        low = q & 0x0F
        high = q >> 4  # zero-extended u8: already in [0, 16), no mask needed
        mmdt = _scales_mm_dtype(s_ref.dtype)
        block_j = kp // nb
        col_block = jax.lax.broadcasted_iota(jnp.int32, (nb, kp), 1) // block_j
        row_block = jax.lax.broadcasted_iota(jnp.int32, (nb, kp), 0)
        expand = (col_block == row_block).astype(mmdt)
        if scale_sel_tile is None:
            # [nb, tile] -> [tile, kp]
            scales = jax.lax.dot_general(
                _scales_f32(s_ref[0]).astype(mmdt), expand, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # full_scales: the whole expert's [nb, Nd] scales are resident;
            # select this tile's columns with a one-hot matmul (lane slicing
            # at non-128 offsets is illegal, the MXU is not — the same trick
            # as ops.moe_gmm full_scales mode)
            j2, n_total = scale_sel_tile
            s_full = _scales_f32(s_ref[0]).astype(mmdt)  # [nb, Nd]
            col = jax.lax.broadcasted_iota(jnp.int32, (tile_cols, n_total), 1)
            want = j2 * tile_cols + jax.lax.broadcasted_iota(
                jnp.int32, (tile_cols, n_total), 0
            )
            sel = (col == want).astype(mmdt)
            s_sel = jax.lax.dot_general(
                sel, s_full, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [tile, nb] — exact: one nonzero per sel row
            scales = jax.lax.dot_general(
                s_sel.astype(mmdt), expand, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [tile, kp]
        # NO bf16 cast: at T=1 the matmuls are MXU-trivial, so the dequanted
        # weights feed the MXU in f32 — saving the pack op per value on the
        # VPU-bound dequant chain (x is upcast once, [8, kp] is nothing)
        we = _lut(low, codebook) * scales
        wo = _lut(high, codebook) * scales
        return we, wo

    @pl.when(j < nq1)
    def _phase1():
        we, wo = dequant(gu_q_ref, gu_s_ref, kp_h, nb_h, tn1, None)
        xe = xe_ref[:].astype(jnp.float32)
        xo = xo_ref[:].astype(jnp.float32)
        h = jax.lax.dot_general(
            xe, we, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        h += jax.lax.dot_general(
            xo, wo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if b_gu_ref is not None:
            h += b_gu_ref[0].astype(jnp.float32)  # [1, tn1] broadcast
        h_scratch[j] = h

    @pl.when(j == nq1)
    def _act():
        # glu4 sections: [gateEven | gateOdd | upEven | upOdd]; pad rows
        # carry zero scales and zero bias, so act(0, 0) = 0 lands exactly
        # the zeros the down weight's kernel-padded columns expect. Static
        # loop over sub-tiles: scratch slab indices and lane offsets stay
        # compile-time constants.
        for t in range(per):
            ae = act_pair(h_scratch[0 * per + t], h_scratch[2 * per + t])
            ao = act_pair(h_scratch[1 * per + t], h_scratch[3 * per + t])
            a_scratch[0, :, t * tn1 : (t + 1) * tn1] = ae.astype(a_scratch.dtype)
            a_scratch[1, :, t * tn1 : (t + 1) * tn1] = ao.astype(a_scratch.dtype)

    @pl.when(j >= nq1)
    def _phase2():
        j2 = j - nq1
        sel = (j2, n_down) if full_scales else None
        we, wo = dequant(d_q_ref, d_s_ref, kp_f, nb_f, tn2, sel)
        ae = a_scratch[0]  # f32 scratch feeds the f32 matmul directly
        ao = a_scratch[1]
        acc = jax.lax.dot_general(
            ae, we, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc += jax.lax.dot_general(
            ao, wo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        val = rw_ref[0, g] * acc

        @pl.when(g == 0)
        def _init():
            o_ref[j2] = val

        @pl.when(g > 0)
        def _accum():
            o_ref[j2] = o_ref[j2] + val


def moe_ffn_glu4_t1(
    x: jax.Array,  # [1, H]
    routing_weights: jax.Array,  # [1, k] f32
    routing_indices: jax.Array,  # [1, k] int32
    w_gate_up: NF4Tensor,  # glu4 layout, [E, 4*sec, H] packed
    b_gate_up: Optional[jax.Array],  # [E, 4*sec] (glu4-sectioned) or None
    w_down: NF4Tensor,  # flat layout, [E, Nd, FF] packed
    b_down: Optional[jax.Array],  # [E, Nd] or None
    act_pair,  # (gate, up) -> activation (ops.moe.glu_pair partial)
    interpret: bool = False,
    phase1_cap: int = 512,
    phase2_cap: int = 640,
) -> jax.Array:
    assert w_gate_up.row_layout == "glu4", "fused FFN kernel needs glu4 layout"
    w_down = ensure_kernel_padded(w_down)
    k = routing_indices.shape[1]
    H = x.shape[1]
    sec = w_gate_up.section_rows
    kp_h = w_gate_up.kp_phys
    kp_f = w_down.kp_phys
    assert kp_f == sec, (kp_f, sec)  # both are pad128(FF // 2)
    nb_h = w_gate_up.nb_phys
    nb_f = w_down.nb_phys
    Nd = w_down.out_rows  # == out_features (down is never row-padded)

    # phase-1 sub-tile: keep the [tn1, kp_h] dequant temporaries (int32
    # nibble planes + f32 lut/scales) within Mosaic's scoped-VMEM budget —
    # whole 1536-row sections OOM the 16 MB VMEM stack
    tn1 = kernel_out_tile(sec, phase1_cap)
    assert tn1 is not None and sec % tn1 == 0, (sec, tn1)
    nq1 = 4 * (sec // tn1)

    tn2 = kernel_out_tile(Nd, phase2_cap)
    full_scales = tn2 is None
    if full_scales:
        for t in range(8, min(phase2_cap, Nd) + 1, 8):
            if Nd % t == 0:
                tn2 = t
        if tn2 is None:
            raise ValueError(f"no valid down out tile for Nd={Nd}")
    nq2 = Nd // tn2
    grid = (k, nq1 + nq2)

    # x -> even/odd packed-column planes, broadcast to one sublane tile
    xp = x.reshape(H // 2, 2)
    xe = jnp.broadcast_to(xp[:, 0], (8, H // 2))
    xo = jnp.broadcast_to(xp[:, 1], (8, H // 2))
    pad = kp_h - H // 2
    if pad:
        xe = jnp.pad(xe, ((0, 0), (0, pad)))
        xo = jnp.pad(xo, ((0, 0), (0, pad)))

    ids = routing_indices[0].astype(jnp.int32)  # [k]
    rw = routing_weights.astype(jnp.float32).reshape(1, k)

    def gu_idx(g, j, ids_ref):
        return (ids_ref[g], jnp.minimum(j, nq1 - 1), 0)

    def d_idx(g, j, ids_ref):
        return (ids_ref[g], jnp.maximum(j - nq1, 0), 0)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # xe
        pl.BlockSpec(memory_space=pltpu.VMEM),  # xo
        pl.BlockSpec(memory_space=pltpu.SMEM),  # rw
        pl.BlockSpec((1, tn1, kp_h), gu_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, nb_h, tn1),
            lambda g, j, ids_ref: (ids_ref[g], 0, jnp.minimum(j, nq1 - 1)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, tn2, kp_f), d_idx, memory_space=pltpu.VMEM),
    ]
    if full_scales:
        in_specs.append(
            pl.BlockSpec(
                (1, nb_f, Nd),
                lambda g, j, ids_ref: (ids_ref[g], 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    else:
        in_specs.append(
            pl.BlockSpec(
                (1, nb_f, tn2),
                lambda g, j, ids_ref: (ids_ref[g], 0, jnp.maximum(j - nq1, 0)),
                memory_space=pltpu.VMEM,
            )
        )
    args = [xe, xo, rw, w_gate_up.qdata, w_gate_up.scales, w_down.qdata, w_down.scales]
    has_bias = b_gate_up is not None
    if has_bias:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, tn1),
                lambda g, j, ids_ref: (ids_ref[g], 0, jnp.minimum(j, nq1 - 1)),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(b_gate_up.astype(jnp.float32).reshape(-1, 1, 4 * sec))

    kernel = functools.partial(
        _ffn_kernel,
        sec=sec,
        kp_h=kp_h,
        kp_f=kp_f,
        nb_h=nb_h,
        nb_f=nb_f,
        tn1=tn1,
        tn2=tn2,
        n_down=Nd,
        has_bias=has_bias,
        full_scales=full_scales,
        codebook=w_gate_up.codebook,
        act_pair=act_pair,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (nq2, 8, tn2), lambda g, j, ids_ref: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((nq1, 8, tn1), jnp.float32),  # gate_up sub-tile outputs
            pltpu.VMEM((2, 8, sec), jnp.float32),  # activation even/odd planes
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq2, 8, tn2), jnp.float32),
        interpret=interpret,
    )(ids, *args)
    y = out[:, 0, :].reshape(1, Nd)  # row 0 of the broadcast sublane tile
    if b_down is not None:
        # combined bias term: sum_g rw_g * b_down[e_g] — two tiny XLA ops
        y = y + rw @ jnp.take(b_down, ids, axis=0).astype(jnp.float32)
    return y.astype(x.dtype)
