"""NF4 (NormalFloat-4) blockwise quantization numerics — pure NumPy, CPU-testable.

This module is the numerics contract for the whole framework (SURVEY.md §7
stage 1). It re-derives, from first principles, the format the reference
consumes via bitsandbytes:

- 16-entry NF4 codebook (the published NormalFloat constants; the reference
  hardcodes the same table, ``streaming_unsloth_bnb.py:101-106``).
- 2 values per byte. The reference unpacks the LOW nibble as the even flat
  index and the HIGH nibble as the odd (``streaming_unsloth_bnb.py:179-190``);
  upstream bitsandbytes packs the first element in the HIGH nibble. Both
  orders are supported; ``order="low_first"`` is the default to match the
  reference's decode contract.
- Blockwise absmax scaling over the row-major flattened weight, blocksize 64
  (``unsloth_direct_loader.py:129``; inference fallback 64/128 at
  ``streaming_unsloth_bnb.py:197-218``).
- Double quantization: absmax itself is stored uint8 against an 8-bit
  codebook (``nested_quant_map``) with a second-level blockwise scale
  (``nested_absmax``) and an optional mean offset
  (``unsloth_direct_loader.py:21-48`` — the reference omits the offset; real
  bitsandbytes subtracts the absmax mean before nesting, so the offset is
  optional here and defaults to 0 to honour the reference contract).

Everything here is NumPy (converter / test side). The in-graph JAX dequant
lives in ``quant.tensor`` and the fused kernels in ``ops.nf4_matmul``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

# The NormalFloat-4 codebook: 16 quantiles of N(0,1) normalized to [-1, 1]
# (QLoRA, Dettmers et al. 2023). Identical constants appear in the reference
# at streaming_unsloth_bnb.py:101-106.
NF4_CODE = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    dtype=np.float32,
)


def _code_midpoints(code: np.ndarray) -> np.ndarray:
    """Bucket boundaries for nearest-codeword quantization of a sorted code."""
    code = np.asarray(code, dtype=np.float64)
    return (code[1:] + code[:-1]) / 2.0


def quantize_to_code(x: np.ndarray, code: np.ndarray) -> np.ndarray:
    """Nearest-codeword indices of ``x`` in a *sorted* codebook."""
    return np.searchsorted(_code_midpoints(code), x.astype(np.float64)).astype(np.uint8)


def pack_nibbles(idx: np.ndarray, order: str = "low_first") -> np.ndarray:
    """Pack 4-bit indices (flat, even length) into bytes.

    ``low_first``: element 2k -> low nibble, 2k+1 -> high nibble (the decode
    order the reference uses). ``high_first``: upstream-bnb order.
    """
    idx = np.asarray(idx, dtype=np.uint8).reshape(-1)
    if idx.size % 2 != 0:
        raise ValueError("pack_nibbles requires an even number of elements")
    even, odd = idx[0::2], idx[1::2]
    if order == "low_first":
        return (even | (odd << 4)).astype(np.uint8)
    elif order == "high_first":
        return ((even << 4) | odd).astype(np.uint8)
    raise ValueError(f"unknown nibble order: {order}")


def unpack_nibbles(packed: np.ndarray, n: Optional[int] = None, order: str = "low_first") -> np.ndarray:
    """Inverse of :func:`pack_nibbles`; returns ``n`` (default 2*bytes) indices."""
    packed = np.asarray(packed, dtype=np.uint8).reshape(-1)
    low = packed & 0x0F
    high = (packed >> 4) & 0x0F
    out = np.empty(packed.size * 2, dtype=np.uint8)
    if order == "low_first":
        out[0::2], out[1::2] = low, high
    elif order == "high_first":
        out[0::2], out[1::2] = high, low
    else:
        raise ValueError(f"unknown nibble order: {order}")
    return out[:n] if n is not None else out


def nf4_quantize(
    w: np.ndarray,
    blocksize: int = 64,
    code: np.ndarray = NF4_CODE,
    order: str = "low_first",
) -> Tuple[np.ndarray, np.ndarray]:
    """Blockwise NF4 quantization of a dense matrix.

    Returns ``(packed, absmax)`` where ``packed`` is uint8 of shape
    ``(w.size // 2,)`` over the row-major flattening of ``w`` and ``absmax``
    is float32 of shape ``(w.size // blocksize,)``.
    """
    flat = np.asarray(w, dtype=np.float32).reshape(-1)
    if flat.size % blocksize != 0:
        raise ValueError(f"size {flat.size} not divisible by blocksize {blocksize}")
    blocks = flat.reshape(-1, blocksize)
    absmax = np.abs(blocks).max(axis=1).astype(np.float32)
    scale = np.where(absmax > 0, absmax, 1.0)
    normalized = blocks / scale[:, None]
    idx = quantize_to_code(normalized.reshape(-1), code)
    return pack_nibbles(idx, order=order), absmax


def nf4_dequantize(
    packed: np.ndarray,
    absmax: np.ndarray,
    out_shape: Tuple[int, ...],
    blocksize: int = 64,
    code: np.ndarray = NF4_CODE,
    order: str = "low_first",
) -> np.ndarray:
    """Inverse of :func:`nf4_quantize` (up to codebook rounding)."""
    n = int(np.prod(out_shape))
    idx = unpack_nibbles(packed, n, order=order)
    vals = np.asarray(code, dtype=np.float32)[idx]
    absmax = np.asarray(absmax, dtype=np.float32).reshape(-1)
    if absmax.size * blocksize != n:
        raise ValueError(
            f"absmax size {absmax.size} * blocksize {blocksize} != {n} elements"
        )
    vals = vals.reshape(-1, blocksize) * absmax[:, None]
    return vals.reshape(out_shape).astype(np.float32)


def infer_blocksize(total_params: int, absmax_numel: int) -> int:
    """Blocksize inference for checkpoints that do not state it.

    Mirrors the reference's rule (``streaming_unsloth_bnb.py:197-218``):
    prefer exact division, else try the common NF4 sizes 64 / 128, default 64.
    """
    if absmax_numel > 0 and total_params % absmax_numel == 0:
        return total_params // absmax_numel
    for candidate in (64, 128):
        if (total_params + candidate - 1) // candidate <= absmax_numel:
            return candidate
    return 64


# ---------------------------------------------------------------------------
# Double quantization of absmax (the "nested" level)
# ---------------------------------------------------------------------------


def dynamic_code_8bit() -> np.ndarray:
    """A 256-entry signed dynamic codebook for 8-bit absmax quantization.

    bitsandbytes ships a "dynamic map" with sign bit + dynamic exponent; its
    exact table travels *inside* the checkpoint as ``nested_quant_map``
    (``unsloth_bnb_loader.py:196-227``), so readers never assume this table.
    This generator (used by our writer and tests) spreads codewords over
    (-1, 1) with logarithmic density per decade — same design intent, fresh
    construction.
    """
    values = [0.0]
    # 7 decades of magnitudes, denser near 1.0
    per_decade = [2, 4, 8, 16, 31, 31, 35]  # sums to 127 magnitudes
    for decade, count in enumerate(per_decade):
        lo, hi = 10.0 ** (-(len(per_decade) - 1 - decade) - 1), 10.0 ** (
            -(len(per_decade) - 1 - decade)
        )
        mags = np.linspace(lo, hi, count, endpoint=(decade == len(per_decade) - 1))
        values.extend(mags.tolist())
    mags = np.array(values[1:], dtype=np.float64)
    full = np.concatenate([[0.0], mags, -mags])
    full = np.sort(full)
    assert full.size == 255
    # pad to 256 with an extra endpoint refinement
    full = np.sort(np.concatenate([full, [1.0 - 1e-3]]))
    return full.astype(np.float32)


class DoubleQuantAbsmax(NamedTuple):
    qabsmax: np.ndarray  # uint8 indices into `code`
    nested_absmax: np.ndarray  # float32, one scale per nested block
    code: np.ndarray  # float32 (256,) codebook ("nested_quant_map")
    offset: np.ndarray  # float32 scalar (mean of absmax); 0 in reference mode


def quantize_absmax_double(
    absmax: np.ndarray,
    nested_blocksize: int = 256,
    code: Optional[np.ndarray] = None,
    use_offset: bool = True,
) -> DoubleQuantAbsmax:
    """Quantize the first-level absmax to uint8 (blockwise, signed codebook)."""
    absmax = np.asarray(absmax, dtype=np.float32).reshape(-1)
    if code is None:
        code = dynamic_code_8bit()
    offset = np.float32(absmax.mean()) if use_offset else np.float32(0.0)
    centered = absmax - offset
    nblocks = -(-absmax.size // nested_blocksize)
    pad = nblocks * nested_blocksize - absmax.size
    padded = np.pad(centered, (0, pad)).reshape(nblocks, nested_blocksize)
    nested_absmax = np.abs(padded).max(axis=1).astype(np.float32)
    scale = np.where(nested_absmax > 0, nested_absmax, 1.0)
    normalized = padded / scale[:, None]
    idx = quantize_to_code(normalized.reshape(-1), code)[: absmax.size]
    return DoubleQuantAbsmax(
        qabsmax=idx.astype(np.uint8),
        nested_absmax=nested_absmax,
        code=np.asarray(code, dtype=np.float32),
        offset=offset,
    )


def dequantize_absmax_double(
    qabsmax: np.ndarray,
    nested_absmax: np.ndarray,
    code: np.ndarray,
    offset: float | np.ndarray = 0.0,
    nested_blocksize: Optional[int] = None,
) -> np.ndarray:
    """Recover float absmax from its double-quantized storage.

    Shape handling follows the reference's 3-way compatibility rule
    (``streaming_unsloth_bnb.py:148-173``): scalar nested_absmax,
    elementwise, or blockwise broadcast (the real bnb layout).
    """
    qabsmax = np.asarray(qabsmax, dtype=np.uint8).reshape(-1)
    code = np.asarray(code, dtype=np.float32).reshape(-1)
    nested_absmax = np.asarray(nested_absmax, dtype=np.float32).reshape(-1)
    vals = code[qabsmax]
    n = vals.size
    if nested_absmax.size == 1:
        vals = vals * nested_absmax[0]
    elif nested_absmax.size == n:
        vals = vals * nested_absmax
    else:
        if nested_blocksize is None:
            nested_blocksize = -(-n // nested_absmax.size)
        block_ids = np.arange(n) // nested_blocksize
        block_ids = np.minimum(block_ids, nested_absmax.size - 1)
        vals = vals * nested_absmax[block_ids]
    return (vals + np.float32(offset)).astype(np.float32)
