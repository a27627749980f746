"""Linear ops over dense or NF4-packed weights.

The XLA path dequantizes then matmuls (SURVEY.md §7 stage 3: "dequant can be
naive-XLA first"); the fused Pallas dequant-matmul (stage 4) is selected via
``QuantConfig.backend`` once the operand shapes qualify. Weights follow the
(out, in) convention throughout, so every matmul contracts the LAST dim of
both operands — this is MXU-friendly and transposition-free from checkpoint
to kernel.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.quant.tensor import NF4Tensor


def dense_linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ w.T + b with w [out, in]."""
    y = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (w.ndim - 1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def quantized_linear(
    x: jax.Array,
    w: Union[NF4Tensor, jax.Array],
    b: Optional[jax.Array] = None,
    backend: str = "xla",
) -> jax.Array:
    """Matmul against a possibly-NF4-packed weight.

    TPU-native replacement for bitsandbytes ``Linear4bit`` (reference
    ``bnb_moe_4bit.py:58-96``): packed INT4 + scales stay in HBM; dequant
    happens in-graph (XLA fuses it into the matmul's operand pipeline) or
    in-register in the Pallas kernel.
    """
    if isinstance(w, NF4Tensor):
        if backend == "pallas":
            from gpt_oss_vllm_tpu.ops.nf4_matmul import nf4_matmul

            return nf4_matmul(x, w, b)
        wd = w.dequantize(dtype=x.dtype)
        return dense_linear(x, wd, b)
    return dense_linear(x, w, b)
