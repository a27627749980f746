"""Fused NF4-dequant matmul Pallas kernel.

TPU-native replacement for the bitsandbytes CUDA ``Linear4bit`` kernels the
reference leans on (SURVEY.md §2.3 row 3): packed INT4 + per-block scales
stay in HBM, dequantization happens in VMEM registers inside the matmul —
HBM traffic is ~K*N/2 bytes instead of 2*K*N, which is the whole game for
memory-bound decode.

Layout trick: bytes hold (even, odd) element pairs of each row
(low-nibble-first, the format contract from ``quant.tensor``). Rather than
re-interleaving nibbles in-kernel (an expensive relayout on the VPU), the
contraction is split into even/odd subspaces:

    y = x_even @ dequant(low_nibbles)^T + x_odd @ dequant(high_nibbles)^T

``x`` is deinterleaved once outside the kernel (cheap, fused by XLA), and
each scale block of 64 original columns becomes one aligned block of 32
packed columns in both subspaces — so scales broadcast with a single
``pltpu.repeat``. The 16-entry NF4 codebook lookup is a flat select chain on
the VPU (no gather).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpt_oss_vllm_tpu.quant.nf4 import NF4_CODE
from gpt_oss_vllm_tpu.quant.tensor import NF4Tensor


# Degree-7 interpolants of the two NF4 codebook halves at t = (idx&7) - 3.5,
# highest coefficient first. Exact interpolation through the 8 points: the
# f32 Horner evaluation lands within 6e-8 of the codebook values (below f32
# epsilon of the values themselves), so this is bit-equivalent to a table
# lookup after the bf16 cast that follows — at ~19 VPU ops per element
# instead of the ~31 of a 15-deep compare+select chain, with two independent
# Horner chains for ILP. The chain was the decode bottleneck: dequant VPU
# time ~0.9 ms per layer vs ~0.06 ms of HBM reads for the same weights.
_NF4_POLY_NEG = (
    8.6565415e-06, -3.8617916e-05, -5.6970475e-06, -4.200142e-06,
    0.0014435588, -0.0073917634, 0.11011544, -0.33783063,
)
_NF4_POLY_POS = (
    6.948697e-06, 3.1655214e-05, 1.2739122e-06, 3.4459834e-05,
    0.0013107844, 0.00725987, 0.1024667, 0.38749492,
)


def _horner_eo(cs, t: jax.Array, u: jax.Array) -> jax.Array:
    """Degree-7 polynomial via even/odd split: p(t) = E(t^2) + t*O(t^2).

    Same fma count as plain Horner but HALF the dependency depth (two
    independent degree-3 chains) — the plain chain is fma-latency-bound on
    the VPU (measured: the single-chain FP4 decode ran 2.4x slower per
    element than NF4's two parallel chains in the prefill gmm kernel).
    Evaluation-order change keeps f32 exactness: max |err| vs the codebook
    is 3e-8 (NF4) / 2.4e-7 (FP4 magnitudes), below the bf16 cast that
    follows."""
    e = jnp.full(t.shape, cs[1], jnp.float32)
    o = jnp.full(t.shape, cs[0], jnp.float32)
    for ce, co in zip((cs[3], cs[5], cs[7]), (cs[2], cs[4], cs[6])):
        e = e * u + jnp.float32(ce)
        o = o * u + jnp.float32(co)
    return e + t * o


def _lut_nf4_poly(idx: jax.Array) -> jax.Array:
    """Codebook 'lookup' via piecewise polynomial (superseded; kept for
    decomp_bench A/B): idx int32 in [0, 16)."""
    t = (idx & 7).astype(jnp.float32) - 3.5
    u = t * t
    return jnp.where(
        idx >= 8, _horner_eo(_NF4_POLY_POS, t, u), _horner_eo(_NF4_POLY_NEG, t, u)
    )


# The 16 NF4 codebook values as raw f32 bit patterns (select-tree leaves).
_NF4_BITS = tuple(int(v) for v in np.asarray(NF4_CODE, np.float32).view(np.int32))


def _select_tree(idx: jax.Array, bits_table) -> jax.Array:
    """16-entry codebook lookup via a binary select tree over raw f32 bit
    patterns: 15 selects + 4 compares, ALL on the int/select pipeline with
    no fma chain and no int multiply. Exact by construction (the leaves ARE
    the table's bits)."""
    b0 = (idx & 1) != 0
    lvl = [
        jnp.where(b0, jnp.int32(bits_table[2 * i + 1]), jnp.int32(bits_table[2 * i]))
        for i in range(8)
    ]
    for bit in (2, 4, 8):
        cond = (idx & bit) != 0
        lvl = [jnp.where(cond, lvl[2 * i + 1], lvl[2 * i]) for i in range(len(lvl) // 2)]
    return jax.lax.bitcast_convert_type(lvl[0], jnp.float32)


def _lut_nf4_onehot(idx: jax.Array) -> jax.Array:
    """One-hot codebook expansion WITHOUT the MXU: val = sum_c code[c] *
    (idx == c), 16 compares + 16 masked accumulates on the VPU.

    This is the honest form of the 'MXU codebook expansion' idea (VERDICT
    r1 next-1): routing the one-hot through the MXU needs the 16-wide code
    axis as a real matmul dimension, i.e. a [*, 16] lane-expanding layout
    of DATA-dependent indices — exactly the shape class Mosaic rejects on
    this chip (CLAUDE.md), and unlike the scale-expand matmul the one-hot
    cannot be built from compile-time iota. What remains is this
    compare-accumulate, ~2x the select tree's op count; kept for the
    measured A/B record (see docs/STATUS.md r2)."""
    acc = jnp.zeros(idx.shape, jnp.int32)
    for c in range(16):
        acc = acc | jnp.where(idx == c, jnp.int32(_NF4_BITS[c]), jnp.int32(0))
    return jax.lax.bitcast_convert_type(acc, jnp.float32)


def _lut_nf4(idx: jax.Array) -> jax.Array:
    """NF4 codebook lookup (select tree). Measured 18.5% faster end-to-end
    than the degree-7 two-half Horner at 8L/b8 batched decode (21.4 -> 18.1
    ms/step): integer ops schedule better against the MXU inside the gmm
    kernels than fma-chain polynomials."""
    return _select_tree(idx, _NF4_BITS)


# Degree-7 interpolant of the E2M1 magnitude table [0,.5,1,1.5,2,3,4,6] at
# t = (idx&7) - 3.5 — exact through the 8 points. Kept as documentation of
# the superseded decode; production uses the bit-assembly below (pure int
# pipeline, measured 33% faster end-to-end on batched mxfp4 decode at
# 8L/b8: 30.9 -> 23.3 ms/step — fma-chain LUTs schedule poorly against the
# MXU in the gmm kernels, int bit-ops don't).
_FP4_MAG_POLY = (
    0.0011904762359336019, 0.0013888889225199819, -0.02291666716337204,
    -0.0225694440305233, 0.13385416567325592, 0.17352430522441864,
    0.46795013546943665, 1.7080078125,
)


def _lut_fp4_bitasm(idx: jax.Array) -> jax.Array:
    """E2M1 value of a 4-bit sign|magnitude code; idx int32 in [0, 16).

    Pure-integer bit assembly, ~10 VPU int ops, no fma chain: E2M1 maps onto
    the f32 bit layout — for magnitude codes >= 2 the value is exactly
    bitcast((mag + 252) << 22) (mantissa bit lands at bit 22, exponent field
    (mag >> 1) + 126 rebias lands exactly); codes 0/1 are 0.0 / 0.5; the
    sign is bit 3 shifted to bit 31. Bit-exact vs FP4_CODE incl. -0.0.

    ``small`` reuses ``mag``: it is only selected when mag < 2, where
    mag == idx & 1 — one fewer VPU op on the batched-decode-dominating
    chain. Measured on-chip at 8L/b8 (r2 A/B): this form beat a
    select-instead-of-multiply variant and the select tree (33.0 ms/step);
    the nf4-vs-mxfp4 batched gap is routing-distribution, not decode
    (see docs/STATUS.md)."""
    mag = idx & 7
    normal = (mag + 252) << 22
    small = mag * 0x3F000000  # == (idx & 1) * 0.5f-bits whenever selected
    bits = jnp.where(mag < 2, small, normal) | ((idx & 8) << 28)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


_FP4_BITS = None  # lazily built from quant.mxfp4.FP4_CODE (import cycle)


def _lut_fp4_tree(idx: jax.Array) -> jax.Array:
    """E2M1 lookup via the same binary select tree as NF4 (A/B alternative:
    at batched decode the select tree schedules better against the MXU than
    shift-chains in some configs)."""
    global _FP4_BITS
    if _FP4_BITS is None:
        from gpt_oss_vllm_tpu.quant.mxfp4 import FP4_CODE

        _FP4_BITS = tuple(int(v) for v in np.asarray(FP4_CODE, np.float32).view(np.int32))
    return _select_tree(idx, _FP4_BITS)


def _lut_fp4(idx: jax.Array) -> jax.Array:
    return _lut_fp4_bitasm(idx)


def _scales_f32(s: jax.Array) -> jax.Array:
    """Scale tile as f32; uint8 tiles are E8M0 exponent bytes decoded with a
    shift+bitcast (exact 2^(u-127); u=0 pad blocks decode to exact 0)."""
    if s.dtype == jnp.uint8:
        return jax.lax.bitcast_convert_type(s.astype(jnp.int32) << 23, jnp.float32)
    return s.astype(jnp.float32)


def _scales_mm_dtype(s_dtype) -> jnp.dtype:
    """MXU dtype for the scale-expansion matmul.

    The expansion matrix is 0/1 with exactly one nonzero per output column,
    so each product has a single term — no accumulation rounding. When the
    stored scales are bf16 (NF4 default) or E8M0 exponent bytes (exact
    powers of two, bf16-representable), a bf16 matmul is therefore
    BIT-EXACT and runs at 4x the f32 MXU rate. f32-stored scales keep f32.
    """
    if s_dtype in (jnp.bfloat16, jnp.uint8):
        return jnp.bfloat16
    return jnp.float32


def _lut(idx: jax.Array, codebook: str) -> jax.Array:
    if codebook == "nf4":
        return _lut_nf4(idx)
    if codebook == "mxfp4":
        return _lut_fp4(idx)
    raise ValueError(f"unknown codebook: {codebook}")


def _nf4_matmul_kernel(xe_ref, xo_ref, q_ref, s_ref, o_ref, *, block_j: int,
                       codebook: str = "nf4"):
    # xe/xo: [M, Kp] ; q: [TN, Kp] u8 ; s: [nb, TN] (transposed) ; o: [M, TN]
    # int32 first: Mosaic cannot legalize shifts on 8-bit vectors (arith.shrui)
    q = q_ref[:].astype(jnp.int32)
    low = q & 0x0F
    high = q >> 4  # zero-extended u8: already in [0, 16), no mask needed
    # Expand per-block scales to per-column on the MXU: s^T expansion via
    # B[b, j] = (j // block_j == b). Lane-wise repeat via reshape is an
    # unsupported shape cast in Mosaic; this one extra small matmul is free
    # in the memory-bound regime.
    nb = s_ref.shape[0]
    Kp = q.shape[1]
    mmdt = _scales_mm_dtype(s_ref.dtype)
    col_block = jax.lax.broadcasted_iota(jnp.int32, (nb, Kp), 1) // block_j
    row_block = jax.lax.broadcasted_iota(jnp.int32, (nb, Kp), 0)
    expand = (col_block == row_block).astype(mmdt)
    scales = jax.lax.dot_general(
        _scales_f32(s_ref[:]).astype(mmdt), expand,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [TN, Kp]
    we = (_lut(low, codebook) * scales).astype(xe_ref.dtype)
    wo = (_lut(high, codebook) * scales).astype(xe_ref.dtype)
    acc = jax.lax.dot_general(
        xe_ref[:], we, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc += jax.lax.dot_general(
        xo_ref[:], wo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[:] = acc


def _pad_to(x: jax.Array, axis: int, mult: int) -> jax.Array:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret", "codebook"))
def _nf4_matmul_2d(
    x: jax.Array,  # [M, K]
    qdata: jax.Array,  # [N, K//2] uint8
    scales: jax.Array,  # [K//64, N] (transposed layout)
    block_n: int = 256,
    interpret: bool = False,
    codebook: str = "nf4",
) -> jax.Array:
    M, K = x.shape
    N = qdata.shape[0]
    Kp = qdata.shape[1]  # physical packed width (may be kernel-padded)
    block_j = Kp // scales.shape[0]  # 32 for blocksize 64
    # deinterleave x into even/odd column subspaces (fused by XLA); pad the
    # packed width to match kernel-padded weights (pad columns hit zero
    # scales, contributing exact zeros)
    xp = x.reshape(M, K // 2, 2)
    xe, xo = xp[:, :, 0], xp[:, :, 1]
    xe = _pad_to(xe, 1, Kp) if xe.shape[1] != Kp else xe
    xo = _pad_to(xo, 1, Kp) if xo.shape[1] != Kp else xo
    xe = _pad_to(xe, 0, 16)
    xo = _pad_to(xo, 0, 16)
    Mp = xe.shape[0]
    bn = min(block_n, N)
    qdata_p = _pad_to(qdata, 0, bn)
    scales_p = _pad_to(scales, 1, bn)
    Np = qdata_p.shape[0]
    nb = scales.shape[0]
    grid = (Np // bn,)
    out = pl.pallas_call(
        functools.partial(_nf4_matmul_kernel, block_j=block_j, codebook=codebook),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,
            bytes_accessed=Np * Kp + Np * (Kp // block_j) * 4 + Mp * K * 2 + Mp * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xe, xo, qdata_p, scales_p)
    return out[:M, :N]


def nf4_matmul(
    x: jax.Array,
    w: NF4Tensor,
    b: Optional[jax.Array] = None,
    block_n: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """y = x @ W^T (+ b) with W NF4-packed; batched over leading dims of W.

    x: [..., K] (or [E?, ..., K] matching W batch dims); returns f32->x.dtype.
    Falls back to the XLA dequant path for shapes the kernel can't tile
    (odd K / scale blocks straddling rows). Non-lane-aligned K (e.g. the
    GPT-OSS 2880) is fine — Mosaic pads the minor dim internally.
    """
    if w.in_features % w.blocksize != 0 or w.blocksize % 2 != 0:
        wd = w.dequantize(x.dtype)
        if w.qdata.ndim == 2:
            dnums = (((x.ndim - 1,), (1,)), ((), ()))
        else:
            # leading expert batch dim on both operands
            dnums = (((x.ndim - 1,), (2,)), ((0,), (0,)))
        y = jax.lax.dot_general(x, wd, dnums, preferred_element_type=jnp.float32)
        return (y + b if b is not None else y).astype(x.dtype)

    if w.qdata.ndim == 2:
        lead = x.shape[:-1]
        x2 = x.reshape(-1, w.in_features)
        y = _nf4_matmul_2d(x2, w.qdata, w.scales, block_n=block_n, interpret=interpret,
                           codebook=w.codebook)
        y = y[:, : w.out_features].reshape(*lead, w.out_features)
    elif w.qdata.ndim == 3 and x.ndim == 3 and x.shape[0] == w.qdata.shape[0]:
        # batched experts: vmap over the expert dim
        f = functools.partial(_nf4_matmul_2d, block_n=block_n, interpret=interpret,
                              codebook=w.codebook)
        y = jax.vmap(f)(x, w.qdata, w.scales)[..., : w.out_features]
    else:
        raise ValueError(f"nf4_matmul: incompatible shapes x={x.shape} w={w.shape}")
    if b is not None:
        y = y + b
    return y.astype(x.dtype)
