from gpt_oss_vllm_tpu.quant.nf4 import (
    NF4_CODE,
    dequantize_absmax_double,
    nf4_dequantize,
    nf4_quantize,
    pack_nibbles,
    quantize_absmax_double,
    unpack_nibbles,
)
from gpt_oss_vllm_tpu.quant.tensor import (
    NF4Tensor,
    nf4_tensor_from_dense,
    q4_tensor_from_dense,
)

__all__ = [
    "NF4_CODE",
    "NF4Tensor",
    "nf4_tensor_from_dense",
    "q4_tensor_from_dense",
    "nf4_quantize",
    "nf4_dequantize",
    "pack_nibbles",
    "unpack_nibbles",
    "quantize_absmax_double",
    "dequantize_absmax_double",
]
