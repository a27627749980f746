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
    meta_fields=["out_features", "in_features", "blocksize", "codebook"],
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
    def scales_f32(self) -> jax.Array:
        """Scales as f32, decoding E8M0 bytes when stored that way."""
        if self.scales.dtype == jnp.uint8:
            return decode_e8m0(self.scales)
        return self.scales.astype(jnp.float32)

    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        """In-graph XLA dequantization to a dense matrix (correctness path)."""
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
