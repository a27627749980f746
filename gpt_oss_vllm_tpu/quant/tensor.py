"""NF4Tensor — the engine-facing packed 4-bit weight container (a JAX pytree).

Weights stay packed uint8 (2 values/byte) + per-block scales in HBM; dequant
happens in-graph (XLA path here) or in-register inside the fused Pallas
matmul kernels (``ops.nf4_matmul``). This is the TPU-native replacement for
bitsandbytes ``Params4bit``/``QuantState`` (reference
``unsloth_bnb_loader.py:65-180``).

Layout contract
---------------
For a weight of shape ``(out, in)`` (row-major, optionally with leading
expert/stack dims):

- ``qdata``  : uint8  ``(..., out, in // 2)`` — byte k of a row holds flat
  elements ``2k`` (low nibble) and ``2k+1`` (high nibble), i.e. the
  reference's decode order (``streaming_unsloth_bnb.py:179-190``). The
  converter normalizes any source nibble order into this one.
- ``scales`` : float ``(..., in // blocksize, out)`` — first-level absmax —
  or uint8 E8M0 exponent bytes for MXFP4 (decoded in-graph/in-register as
  ``bitcast_f32(u << 23)``: exact 2^(u-127) for u>=1 and exact 0.0 for the
  u=0 pad blocks, at half the scale-memory of bf16 — the margin that fits
  the 24-layer MXFP4 model on one chip). First-level absmax notes:
  already double-dequantized at conversion time (the nested level never
  reaches the device; SURVEY.md §5 "checkpoint/resume" design consequence).
  Stored TRANSPOSED (block dim before out dim) so the minor dimension is the
  large ``out`` — a ``(out, nb)`` layout lane-pads nb=45 up to 128 on TPU,
  a 2.8x memory tax measured at +3.4 GB on GPT-OSS-20B.
- ``blocksize`` must divide ``in`` so no block straddles a row
  (64 | 2880 for GPT-OSS-20B).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gpt_oss_vllm_tpu.quant.nf4 import NF4_CODE, nf4_quantize


def codebook_table(codebook: str) -> np.ndarray:
    """The 16-entry dequant table for a codebook name."""
    if codebook == "nf4":
        return NF4_CODE
    if codebook == "mxfp4":
        from gpt_oss_vllm_tpu.quant.mxfp4 import FP4_CODE

        return FP4_CODE
    raise ValueError(f"unknown codebook: {codebook}")


def decode_e8m0(u: jax.Array) -> jax.Array:
    """E8M0 byte -> f32 scale: bitcast(u << 23) — the exponent field is the
    byte itself, so u>=1 decodes to exactly 2^(u-127) and u=0 (pad blocks)
    to exactly 0.0. Pure int ops: legal inside Mosaic kernels too."""
    bits = u.astype(jnp.int32) << 23
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qdata", "scales"],
    meta_fields=["out_features", "in_features", "blocksize", "codebook", "row_layout"],
)
@dataclass
class NF4Tensor:
    qdata: jax.Array  # uint8 (..., out, in // 2)
    scales: jax.Array  # (..., in // blocksize, out)  [transposed; see above]
    out_features: int
    in_features: int
    blocksize: int = 64
    # "nf4" (bitsandbytes NormalFloat-4, the reference's format) or "mxfp4"
    # (OCP FP4-E2M1 + power-of-2 block scales, GPT-OSS's NATIVE checkpoint
    # format — the one the reference had to override away,
    # patch_4_override_quant.py:26-41). Scales here are always float (E8M0
    # bytes are decoded to float at load; the kernels never see them).
    codebook: str = "nf4"
    # Row ordering of the stored out dim:
    #   "flat" — checkpoint order (rows 0..out_features-1, pads at the end).
    #   "glu4" — fused-GLU serving layout for gate_up projections: four
    #   128-aligned sections [gateEven | gateOdd | upEven | upOdd], each
    #   out_features//4 real rows zero-scale-padded to a 128 multiple. The
    #   sectioning makes the activation pairing (gate_i, up_i) and the down
    #   projection's even/odd packed-column split plain aligned lane slices,
    #   which is what lets the whole MoE FFN run as ONE Pallas kernel at
    #   decode (ops.moe_ffn_fused). Applied at load by section_glu4().
    row_layout: str = "flat"

    @property
    def batch_shape(self):
        return self.qdata.shape[:-2]

    @property
    def shape(self):
        return (*self.batch_shape, self.out_features, self.in_features)

    @property
    def out_rows(self) -> int:
        """Physical row count; may exceed ``out_features`` when the tensor is
        stored kernel-padded (extra zero-scale rows so the out dim has a
        128-multiple tile — e.g. 2880 -> 3072). Logical results always slice
        to ``out_features``."""
        return self.qdata.shape[-2]

    @property
    def kp_phys(self) -> int:
        """Physical packed-byte count per row; may exceed in_features // 2
        when kernel-padded to a 128 multiple (1440 -> 1536). Pad bytes decode
        against zero scales, contributing exact zeros."""
        return self.qdata.shape[-1]

    @property
    def nb_phys(self) -> int:
        return self.scales.shape[-2]

    @property
    def section_rows(self) -> int:
        """Physical rows per section for the glu4 layout (128-aligned)."""
        assert self.row_layout == "glu4"
        return self.qdata.shape[-2] // 4

    @property
    def section_real(self) -> int:
        """Real (non-pad) rows per glu4 section = out_features // 4."""
        assert self.row_layout == "glu4"
        return self.out_features // 4

    @property
    def scales_f32(self) -> jax.Array:
        """Scales as f32, decoding E8M0 bytes when stored that way."""
        if self.scales.dtype == jnp.uint8:
            return decode_e8m0(self.scales)
        return self.scales.astype(jnp.float32)

    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        """In-graph XLA dequantization to a dense matrix (correctness path).
        Always returns LOGICAL checkpoint row order, un-permuting glu4."""
        if self.row_layout == "glu4":
            phys = _glu4_phys_of_logical(self.out_features, self.section_rows)
            flat = dataclasses.replace(
                self,
                qdata=jnp.take(self.qdata, phys, axis=-2),
                scales=jnp.take(self.scales, phys, axis=-1),
                row_layout="flat",
            )
            return flat.dequantize(dtype)
        code = jnp.asarray(codebook_table(self.codebook), dtype=jnp.float32)
        q = self.qdata
        kp_logical = self.in_features // 2
        if self.out_rows != self.out_features:
            q = q[..., : self.out_features, :]
        if self.kp_phys != kp_logical:
            q = q[..., :kp_logical]
        low = (q & 0x0F).astype(jnp.int32)
        high = ((q >> 4) & 0x0F).astype(jnp.int32)
        # interleave (low, high) pairs back into the flat row order
        idx = jnp.stack([low, high], axis=-1).reshape(*q.shape[:-1], self.in_features)
        vals = jnp.take(code, idx, axis=0)
        nblk = self.in_features // self.blocksize
        vals = vals.reshape(*q.shape[:-1], nblk, self.blocksize)
        scales_ob = jnp.swapaxes(self.scales_f32, -1, -2)  # (..., out_rows, nb_phys)
        if self.out_rows != self.out_features:
            scales_ob = scales_ob[..., : self.out_features, :]
        if self.nb_phys != nblk:
            scales_ob = scales_ob[..., :nblk]
        vals = vals * scales_ob.astype(jnp.float32)[..., None]
        return vals.reshape(*q.shape[:-1], self.in_features).astype(dtype)

    def nbytes(self) -> int:
        return self.qdata.size + self.scales.size * self.scales.dtype.itemsize


def kernel_out_tile(n: int, cap: int = 640):
    """Largest 128-multiple divisor of n up to cap (None if none exists)."""
    best = None
    for t in range(128, min(cap, n) + 1, 128):
        if n % t == 0:
            best = t
    return best


def ensure_kernel_padded(t: NF4Tensor, cap: int = 640) -> NF4Tensor:
    """Kernel-friendly storage padding, applied ONCE at parameter creation
    (padding inside a jitted step would copy the weights every call):

    packed minor dim padded to a 128 multiple (1440 -> 1536 bytes/row) with
    matching zero scale blocks, so the device layout is unpadded/compact —
    a lane-padded u8 layout forces XLA to relayout-copy the whole weight in
    front of every Pallas call (measured +1.75 ms per GPT-OSS-20B layer).

    Out rows are NOT padded: the grouped kernel handles non-128-tileable out
    dims with full-last-dim block shapes (see ops.moe_gmm full_scales mode).
    """
    pad_k = (-t.kp_phys) % 128
    if pad_k:
        widths_q = [(0, 0)] * t.qdata.ndim
        widths_q[-1] = (0, pad_k)
        pad_blocks = pad_k * 2 // t.blocksize
        widths_s = [(0, 0)] * t.scales.ndim
        widths_s[-2] = (0, pad_blocks)
        t = dataclasses.replace(
            t, qdata=jnp.pad(t.qdata, widths_q), scales=jnp.pad(t.scales, widths_s)
        )
    return t


def pad_out_rows(t: NF4Tensor, multiple: int = 512) -> NF4Tensor:
    """Kernel-pad the out dim with zero-scale rows up to a multiple of
    ``multiple`` (so grouped kernels get 128-aligned out tiles). Logical
    ``out_features`` is unchanged; padded rows decode to exact zeros."""
    rows = t.out_rows
    target = -(-rows // multiple) * multiple
    if target == rows:
        return t
    pad = target - rows
    widths_q = [(0, 0)] * t.qdata.ndim
    widths_q[-2] = (0, pad)
    widths_s = [(0, 0)] * t.scales.ndim
    widths_s[-1] = (0, pad)  # scales are [..., nb, out]
    return dataclasses.replace(
        t, qdata=jnp.pad(t.qdata, widths_q), scales=jnp.pad(t.scales, widths_s)
    )


def q4_tensor_from_dense(
    w: np.ndarray, blocksize: int = 64, scale_dtype=jnp.float32, codebook: str = "nf4"
) -> NF4Tensor:
    # scale_dtype "e8m0" (mxfp4 only): store the raw exponent bytes
    """Quantize a dense (..., out, in) array into a packed 4-bit tensor.

    Used for synthetic checkpoints / random-init benchmarking; the production
    path goes through ``checkpoint.convert`` which streams straight from the
    source safetensors without materializing dense weights.
    """
    w = np.asarray(w, dtype=np.float32)
    *batch, out_f, in_f = w.shape
    if in_f % 2 != 0 or in_f % blocksize != 0:
        raise ValueError(f"in_features {in_f} must be divisible by 2 and {blocksize}")
    flat = w.reshape(-1, out_f * in_f)
    qdatas, scaless = [], []
    for row in flat:
        if codebook == "nf4":
            packed, absmax = nf4_quantize(row, blocksize=blocksize)
        elif codebook == "mxfp4":
            from gpt_oss_vllm_tpu.quant.mxfp4 import e8m0_decode, mxfp4_quantize

            packed, scales_u8 = mxfp4_quantize(row, blocksize=blocksize)
            absmax = scales_u8 if scale_dtype == "e8m0" else e8m0_decode(scales_u8)
        else:
            raise ValueError(f"unknown codebook: {codebook}")
        qdatas.append(packed.reshape(out_f, in_f // 2))
        scaless.append(absmax.reshape(out_f, in_f // blocksize).T)
    qdata = np.stack(qdatas).reshape(*batch, out_f, in_f // 2)
    scales = np.stack(scaless).reshape(*batch, in_f // blocksize, out_f)
    if scale_dtype == "e8m0":
        scale_dtype = jnp.uint8
    return NF4Tensor(
        qdata=jnp.asarray(qdata),
        scales=jnp.asarray(scales, dtype=scale_dtype),
        out_features=out_f,
        in_features=in_f,
        blocksize=blocksize,
        codebook=codebook,
    )


def nf4_tensor_from_dense(
    w: np.ndarray, blocksize: int = 64, scale_dtype=jnp.float32
) -> NF4Tensor:
    return q4_tensor_from_dense(w, blocksize, scale_dtype, codebook="nf4")


def _glu4_sections(out_features: int):
    """(section_real, section_rows) for a fused [2FF] projection."""
    if out_features % 4 != 0:
        raise ValueError(f"glu4 needs out_features % 4 == 0, got {out_features}")
    half = out_features // 4  # rows per section: even (or odd) half of FF
    sec = -(-half // 128) * 128
    return half, sec


def _glu4_logical_of_phys(out_features: int, sec: int) -> np.ndarray:
    """Static gather indices: physical (sectioned) row -> logical source row.
    Pad rows point at row 0 (their scales are zeroed, so values are inert)."""
    half, _ = _glu4_sections(out_features)
    ff = out_features // 2
    src = np.zeros(4 * sec, dtype=np.int32)
    starts = [0, 1, ff, ff + 1]  # gateEven, gateOdd, upEven, upOdd
    for s, first in enumerate(starts):
        src[s * sec : s * sec + half] = first + 2 * np.arange(half)
    return src

def _glu4_phys_of_logical(out_features: int, sec: int) -> np.ndarray:
    """Static gather indices: logical row -> physical (sectioned) row."""
    half, _ = _glu4_sections(out_features)
    ff = out_features // 2
    r = np.arange(out_features)
    is_up = (r >= ff).astype(np.int64)
    i = r - is_up * ff
    section = 2 * is_up + (i % 2)
    return (section * sec + i // 2).astype(np.int32)


def section_glu4(t: NF4Tensor) -> NF4Tensor:
    """Re-store a fused gate_up projection in the glu4 serving layout (see
    the ``row_layout`` doc on :class:`NF4Tensor`). One-time at load; a pure
    row permutation of packed bytes + matching scale columns, bit-lossless.
    Pad rows carry zero scales (decode to exact 0, so act(0,0)=0 lands the
    zeros the down projection's kernel-padded columns expect)."""
    if t.row_layout == "glu4":
        return t
    t = ensure_kernel_padded(t)
    if t.out_rows != t.out_features:
        raise ValueError("section_glu4 expects flat tensors without row pads")
    half, sec = _glu4_sections(t.out_features)
    src = _glu4_logical_of_phys(t.out_features, sec)
    real = jnp.asarray(
        (np.arange(4 * sec) % sec) < half, dtype=jnp.bool_
    )
    qdata = jnp.take(t.qdata, jnp.asarray(src), axis=-2)
    scales = jnp.take(t.scales, jnp.asarray(src), axis=-1)
    scales = jnp.where(real, scales, jnp.zeros((), scales.dtype))
    return dataclasses.replace(t, qdata=qdata, scales=scales, row_layout="glu4")


def section_glu4_bias(b: jax.Array, out_features: int) -> jax.Array:
    """Section a [.., 2FF] expert bias to match a glu4 weight (pads = 0)."""
    half, sec = _glu4_sections(out_features)
    src = _glu4_logical_of_phys(out_features, sec)
    real = (np.arange(4 * sec) % sec) < half
    out = jnp.take(b, jnp.asarray(src), axis=-1)
    return jnp.where(jnp.asarray(real), out, jnp.zeros((), out.dtype))
