"""MXFP4 (OCP Microscaling FP4) blockwise quantization numerics — pure NumPy.

GPT-OSS checkpoints ship MXFP4-quantized experts natively; the reference
could not run that format on its SM 8.6 GPU and overrode it to bitsandbytes
NF4 instead (``patch_4_override_quant.py:26-41`` — "GPT-OSS ships
MXFP4-quantized; BnB is the Ampere substitute"). This module implements the
format first-class so the TPU engine can serve the upstream checkpoint
without requantization.

Format (OCP MX spec v1.0):

- Element: FP4 E2M1 — bits ``s e1 e0 m``; magnitudes
  ``{0, 0.5, 1, 1.5, 2, 3, 4, 6}``; value = (-1)^s * mag.
- Block: 32 consecutive elements share one E8M0 scale — an unsigned 8-bit
  biased exponent (scale = 2^(u - 127); u = 255 reserved for NaN).
- Packing: 2 elements/byte. The HF gpt-oss layout stores per-32-block rows
  of 16 bytes (``*_blocks`` uint8, ``*_scales`` uint8); both nibble orders
  are supported here, low-first by default (matching our NF4 contract in
  ``quant.nf4``; the converter normalizes source order either way).

The per-element decode is pure bit logic plus a sign flip, which is what
makes the fused kernel cheaper than NF4's two-polynomial codebook (see
``ops.nf4_matmul._lut_fp4``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from gpt_oss_vllm_tpu.quant.nf4 import pack_nibbles, unpack_nibbles

# E2M1 codebook indexed by the 4-bit code s|e1|e0|m.
FP4_MAGNITUDES = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], dtype=np.float32)
FP4_CODE = np.concatenate([FP4_MAGNITUDES, -FP4_MAGNITUDES]).astype(np.float32)

E8M0_BIAS = 127
E8M0_NAN = 255


def e8m0_encode(scale: np.ndarray) -> np.ndarray:
    """Nearest power-of-2 (round-to-even in log space is overkill; MX writers
    use floor or round — we round to nearest exponent) clamped to [0, 254]."""
    scale = np.asarray(scale, dtype=np.float64)
    exp = np.full(scale.shape, 0.0)
    pos = scale > 0
    exp[pos] = np.round(np.log2(scale[pos]))
    u = np.clip(exp + E8M0_BIAS, 0, 254).astype(np.uint8)
    # zero/negative scales map to the smallest exponent (decodes to 2^-127,
    # harmless for all-zero blocks whose elements quantize to code 0)
    u[~pos] = 0
    return u


def e8m0_decode(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u)
    vals = np.exp2(u.astype(np.float64) - E8M0_BIAS)
    return np.where(u == E8M0_NAN, np.nan, vals).astype(np.float32)


def quantize_to_fp4(x: np.ndarray) -> np.ndarray:
    """Nearest-value E2M1 codes (sign|magnitude layout) for ``x``."""
    x = np.asarray(x, dtype=np.float32)
    sign = (x < 0) | ((x == 0) & (np.signbit(x)))
    mag = np.abs(x)
    # midpoint thresholds between consecutive magnitudes; ties round to even
    # mantissa like IEEE — for the 8-entry table, ties-to-lower on the .25/.75
    # boundaries matches round-half-to-even at m granularity except 0.25
    # (0 vs 0.5 — even mantissa is 0). searchsorted(left) on strict midpoints
    # gives ties-to-lower, which equals ties-to-even at 0.25, 1.25, 2.5, 5.0.
    mids = (FP4_MAGNITUDES[1:] + FP4_MAGNITUDES[:-1]) / 2.0  # [.25 .75 1.25 1.75 2.5 3.5 5]
    idx = np.searchsorted(mids, mag, side="right").astype(np.uint8)
    # ties-to-even: exact midpoints with odd lower neighbour round down
    for k, m in enumerate(mids):
        tie = mag == m
        if not tie.any():
            continue
        lower_even = (k % 2) == 0  # magnitudes at even index have m-bit 0
        idx[tie] = k if lower_even else k + 1
    return (idx | (sign.astype(np.uint8) << 3)).astype(np.uint8)


def mxfp4_quantize(
    w: np.ndarray, blocksize: int = 32, order: str = "low_first"
) -> Tuple[np.ndarray, np.ndarray]:
    """Blockwise MXFP4 quantization over the row-major flattening of ``w``.

    Returns ``(packed, scales_u8)``: uint8 nibble pairs (w.size // 2) and the
    per-block E8M0 scale bytes (w.size // blocksize). The shared exponent is
    chosen so the block's absmax maps into the representable range:
    2^round(log2(absmax / 6)) — the standard MX recipe (largest element
    becomes the top code, 6).
    """
    flat = np.asarray(w, dtype=np.float32).reshape(-1)
    if flat.size % blocksize != 0:
        raise ValueError(f"size {flat.size} not divisible by blocksize {blocksize}")
    blocks = flat.reshape(-1, blocksize)
    absmax = np.abs(blocks).max(axis=1)
    scales_u8 = e8m0_encode(absmax / FP4_MAGNITUDES[-1])
    scale = e8m0_decode(scales_u8)
    normalized = blocks / scale[:, None]
    idx = quantize_to_fp4(normalized.reshape(-1))
    return pack_nibbles(idx, order=order), scales_u8


def mxfp4_dequantize(
    packed: np.ndarray,
    scales_u8: np.ndarray,
    out_shape: Tuple[int, ...],
    blocksize: int = 32,
    order: str = "low_first",
) -> np.ndarray:
    """Inverse of :func:`mxfp4_quantize` (up to codebook rounding)."""
    n = int(np.prod(out_shape))
    idx = unpack_nibbles(packed, n, order=order)
    vals = FP4_CODE[idx]
    scale = e8m0_decode(scales_u8).reshape(-1)
    if scale.size * blocksize != n:
        raise ValueError(f"scales {scale.size} * blocksize {blocksize} != {n}")
    vals = vals.reshape(-1, blocksize) * scale[:, None]
    return vals.reshape(out_shape).astype(np.float32)
